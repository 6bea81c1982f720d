#!/usr/bin/env python
"""Host capability probe backing BASELINE.md's scaling analysis.

Three micro-probes, printed as one JSON line:

- ``cpu``: pure-compute scaling (no memory traffic) at 8 vs 32 procs —
  distinguishes a CPU-quota cap from a memory-system cap.
- ``alloc``: allocation-heavy numpy loop (fresh 16 MB arrays per
  iteration) at 8 vs 32 procs — measures the shared page-fault /
  memory-bandwidth ceiling that bounds concurrent Arrow/numpy kernels.
- ``tmpfs``: concurrent tmpfs write throughput.

On a real multi-node cluster each added executor node brings its own
memory channels, so the ``alloc`` ceiling is a single-box artifact — this
probe is what justifies running the N vs 4N protocol below the box's
saturation point.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import time

import numpy as np


def _cpu_burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        for i in range(10000):
            x += i * i
    return x


def _alloc_burn(_):
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        a = np.arange(2_000_000, dtype=np.int64)
        b = a * 3
        n += int((b[a % 7 == 0]).size)
    return n


def _pool_run(fn, n):
    t0 = time.time()
    with mp.Pool(n) as p:
        res = p.map(fn, range(n))
    return time.time() - t0, sum(res)


def main() -> None:
    out: dict = {"nproc": os.cpu_count()}
    for name, fn in (("cpu", _cpu_burn), ("alloc", _alloc_burn)):
        per = {}
        for n in (8, 32):
            wall, total = _pool_run(fn, n)
            per[str(n)] = {"wall_sec": round(wall, 2),
                           "work_per_proc": round(total / n / 1e6, 2)}
        r = per["32"]["work_per_proc"] / max(per["8"]["work_per_proc"], 1e-9)
        per["per_proc_retention_8_to_32"] = round(r, 3)
        out[name] = per

    tmpdir = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    tw = {}
    for n in (1, 8):
        t0 = time.time()
        procs = [subprocess.Popen(
            ["dd", "if=/dev/zero", f"of={tmpdir}/probe_{i}", "bs=1M",
             "count=250"], stderr=subprocess.DEVNULL) for i in range(n)]
        for p in procs:
            p.wait()
        dt = time.time() - t0
        tw[str(n)] = round(250 * n / dt, 0)
        for i in range(n):
            os.remove(f"{tmpdir}/probe_{i}")
    out["tmpfs_mb_per_sec"] = tw
    print(json.dumps(out))


if __name__ == "__main__":
    main()
