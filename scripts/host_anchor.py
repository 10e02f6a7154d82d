#!/usr/bin/env python
"""Host-speed anchor: ~5 s of FIXED, code-independent CPU work whose
wall time moves only when the HOST moves (hypervisor scheduling, noisy
neighbors, thermal state) — the variance that guest load averages
cannot see.

Why: every round since r5 has re-litigated "is the bench drift host
band or code drift?" from per-query uniformity arguments alone (r5,
r9, r10, r11 all measured the same tree 1.2-1.3x apart hours apart).
This anchor turns that into arithmetic: run it next to every bench and
divide — if suite_wall/anchor is stable across rounds while both move
together, the drift is the host, definitionally (no Spark, no JVM, no
repo code in the loop).

Three fixed workloads, medians of 5:
- gemm_s: single-thread 768x768 float64 numpy GEMM (OPENBLAS/OMP
  pinned to 1 thread via env BEFORE numpy import) — FPU + cache;
- sha_s: sha256 over 256 MB in 1 MB strides — memory streaming + ALU;
- pyloop_s: 2M-iteration pure-Python arithmetic loop — interpreter
  dispatch, the closest proxy for parse-heavy Python paths;
- par32_s: the SAME pyloop run 32x in 32 concurrent processes (wall
  time; ~= pyloop_s on 32 free cores) — the leg that exposes
  hypervisor CPU steal / oversubscription, which single-thread legs
  cannot see and which is what actually slows a local[32] bench.

Prints ONE JSON line:
  {"anchor": {"gemm_s":..., "sha_s":..., "pyloop_s":..., "par32_s":...},
   "loadavg": [...], "nproc": N}

Usage: python scripts/host_anchor.py [--par32-only]

--par32-only (r14): run just the par32 leg (~2-3 s) and print the same
JSON shape with only par32_s in "anchor". bench.py interleaves these
between its timed passes so the anchor BRACKETS the suite window
instead of sampling one instant — r12/r13 both hit windows where a
single-instant anchor read "quiet" while the suite ran under load and
the normalized number produced phantom drift.
"""

from __future__ import annotations

import os

# pin BLAS to one thread before numpy import: the anchor must not
# contend with itself or vary with visible-CPU count
for var in (
    "OPENBLAS_NUM_THREADS",
    "OMP_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    os.environ[var] = "1"

import hashlib
import json
import statistics
import time

import numpy as np


def _pyloop():
    acc = 0
    for i in range(2_000_000):
        acc = (acc + i * 31) & 0xFFFFFFFF
    return acc


def _pyloop_arg(_i):  # picklable worker for the 32-process leg
    return _pyloop()


def _median_of(f, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def _par32_leg() -> float:
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(32) as pool:
        list(pool.map(_pyloop_arg, range(32)))  # warm the pool
        return _median_of(
            lambda: list(pool.map(_pyloop_arg, range(32))), n=3
        )


def main() -> None:
    import sys

    if "--par32-only" in sys.argv[1:]:
        print(
            json.dumps(
                {
                    "anchor": {"par32_s": _par32_leg()},
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                    "nproc": os.cpu_count(),
                }
            )
        )
        return

    rng = np.random.default_rng(7)
    a = rng.random((768, 768))
    b = rng.random((768, 768))
    gemm = _median_of(lambda: a @ b)

    blob = b"\xab" * (1 << 20)

    def sha():
        h = hashlib.sha256()
        for _ in range(256):
            h.update(blob)
        return h.digest()

    sha_s = _median_of(sha)

    pyloop_s = _median_of(_pyloop)

    par32_s = _par32_leg()

    print(
        json.dumps(
            {
                "anchor": {
                    "gemm_s": gemm,
                    "sha_s": sha_s,
                    "pyloop_s": pyloop_s,
                    "par32_s": par32_s,
                },
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "nproc": os.cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
