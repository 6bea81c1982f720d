"""Large-partition encode-path A/B: current code vs pre-round-5 encoder.

The scaling protocol's 64-partition layout (7.8k docs / ~1.2M tokens per
partition) keeps the old scatter-heavy varint encoder inside the CPU
cache, hiding its cost.  At 100 TB a partition is 64-128 MB of text
(tens of thousands of docs), where the old encoder's per-byte-slot
fancy-index scatters fall out of cache and dominate the kernel.  This
script builds the same 500k-doc corpus at ``--partitions 16`` (31k docs
/ ~4.7M tokens per partition — the realistic shape) with:

- ``old``: the package as of the commit before the round-5 encode work
  (``git archive <pre-commit> pim_lucene_spark`` → zip), and
- ``new``: the working tree (matrix-compress varint encode, precomputed
  byte lengths, prefix-sum row maps, packed token sort default,
  single-byte-fast-path decode),

alternating old/new per rep (the VM has ~2x run-to-run noise; the
back-to-back ratio is the signal).  Writes ``BENCH_ENCODE_AB.json``.

Env: ENCODE_AB_OLD_REF (default ``599f916``), ENCODE_AB_REPS (2),
ENCODE_AB_PARTITIONS (16), ENCODE_AB_CPUS (4); reuses the
``bench_scaling`` corpus (generates it if missing).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SCALE_DOCS", "500000")
import bench_scaling as bs  # noqa: E402

OLD_REF = os.environ.get("ENCODE_AB_OLD_REF", "599f916")
REPS = int(os.environ.get("ENCODE_AB_REPS", "2"))
PARTS = int(os.environ.get("ENCODE_AB_PARTITIONS", "16"))
CPUS = int(os.environ.get("ENCODE_AB_CPUS", "4"))
OLD_ZIP = f"{bs.WORK}/pim_encode_ab_old.zip"


def _old_zip() -> None:
    tmp = f"{bs.WORK}/encode_ab_oldsrc"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    tar = subprocess.run(["git", "archive", OLD_REF, "pim_lucene_spark"],
                         cwd=bs.REPO, check=True, capture_output=True)
    subprocess.run(["tar", "-x", "-C", tmp], input=tar.stdout, check=True)
    if os.path.exists(OLD_ZIP):
        os.remove(OLD_ZIP)
    subprocess.run(["zip", "-qr", OLD_ZIP, "pim_lucene_spark"],
                   cwd=tmp, check=True)


def _build(zip_path: str) -> dict:
    index_dir = f"{bs.WORK}/idx_encode_ab"
    shutil.rmtree(index_dir, ignore_errors=True)
    cmd = [
        bs.SPARK_SUBMIT,
        "--master", f"local[{CPUS}]",
        "--py-files", zip_path,
        "--conf", f"spark.sql.shuffle.partitions={PARTS}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=24g",
        "--conf", f"spark.local.dir={bs.WORK}/spark_local",
        os.path.join(bs.REPO, "scripts", "index_job.py"),
        "--input", bs.CORPUS,
        "--index-dir", index_dir,
        "--partitions", str(PARTS),
        "--segments", "8",
        "--chunks", "1",
        "--fresh",
    ]
    env = dict(os.environ,
               MALLOC_MMAP_THRESHOLD_="2147483647",
               MALLOC_TRIM_THRESHOLD_="2147483647")
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         env=env)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    return {"build_sec": d["build_sec"],
            "kernel_sec": d["phases"]["norms+postings"]}


def main() -> None:
    bs._make_zip()
    if not os.path.isdir(bs.CORPUS):
        bs._gen_corpus()
    _old_zip()
    runs = {"old": [], "new": []}
    for rep in range(REPS):
        for name, z in [("old", OLD_ZIP), ("new", bs.ZIP)]:
            r = _build(z)
            runs[name].append(r)
            print(f"# rep{rep} {name}: build {r['build_sec']}s "
                  f"kernel {r['kernel_sec']}s", flush=True)
    best = {name: min(rs, key=lambda r: r["kernel_sec"])
            for name, rs in runs.items()}
    out = {
        "docs": bs.NUM_DOCS,
        "partitions": PARTS,
        "cpus": CPUS,
        "reps": REPS,
        "old_ref": OLD_REF,
        "best": best,
        "runs": runs,
        "kernel_speedup_new_vs_old": round(
            best["old"]["kernel_sec"] / best["new"]["kernel_sec"], 3),
    }
    with open(os.path.join(bs.REPO, "BENCH_ENCODE_AB.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
