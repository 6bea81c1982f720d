"""A/B: packed single-key token sort vs 3-pass lexsort in the build
kernel (VERDICT r3 item 7), on the real 500k-doc protocol corpus.

Alternates the two modes rep-by-rep in fresh spark-submit processes
(this VM's documented ~2x noise demands it), reports best-of-N wall and
kernel-phase times per mode.  Writes ``BENCH_SORT_AB.json``.

Env: SORT_AB_DOCS (default 500000), SORT_AB_CPUS (8), SORT_AB_REPS (3).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SCALE_DOCS",
                      os.environ.get("SORT_AB_DOCS", "500000"))
import bench_scaling as bs  # noqa: E402

CPUS = int(os.environ.get("SORT_AB_CPUS", "8"))
REPS = int(os.environ.get("SORT_AB_REPS", "3"))


def _build(mode: str) -> dict:
    index_dir = f"{bs.WORK}/idx_sortab"
    shutil.rmtree(index_dir, ignore_errors=True)
    cmd = [
        bs.SPARK_SUBMIT,
        "--master", f"local[{CPUS}]",
        "--py-files", bs.ZIP,
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=24g",
        "--conf", f"spark.local.dir={bs.WORK}/spark_local",
        os.path.join(bs.REPO, "scripts", "index_job.py"),
        "--input", bs.CORPUS,
        "--index-dir", index_dir,
        "--partitions", "64",
        "--segments", "8",
        "--chunks", "1",
        "--fresh",
    ]
    env = dict(os.environ,
               PIM_TOKEN_SORT=mode,
               MALLOC_MMAP_THRESHOLD_="2147483647",
               MALLOC_TRIM_THRESHOLD_="2147483647")
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         env=env)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    bs._make_zip()
    bs._gen_corpus()
    best: dict[str, dict] = {}
    runs: dict[str, list] = {"packed": [], "lexsort": []}
    for rep in range(REPS):
        for mode in ("packed", "lexsort"):
            r = _build(mode)
            kern = r.get("phases", {}).get("norms+postings")
            runs[mode].append({"wall": r["build_sec"], "kernel": kern})
            cur = best.get(mode)
            if cur is None or kern < cur["kernel"]:
                best[mode] = {"wall": r["build_sec"], "kernel": kern}
            print(f"rep{rep} {mode}: wall {r['build_sec']}s "
                  f"kernel {kern}s", flush=True)
    win = best["lexsort"]["kernel"] / best["packed"]["kernel"]
    out = {
        "docs": int(os.environ["SPARK_GRAFT_SCALE_DOCS"]),
        "cpus": CPUS,
        "reps": REPS,
        "best": best,
        "runs": runs,
        "kernel_speedup_packed_vs_lexsort": round(win, 3),
    }
    with open(os.path.join(bs.REPO, "BENCH_SORT_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
