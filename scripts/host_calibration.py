#!/usr/bin/env python
"""Host CPU-delivery calibration for the scaling-efficiency report.

Runs the engine's actual per-series kernels (synthetic generation +
feature extraction) as N plain OS processes — no Spark, no JVM — at
N=8 and N=32, and reports effective cores at each level. On ideal
hardware effective cores == N; on an overcommitted VM the ratio
(eff32 / eff8) is the MAXIMUM speedup any 8→32 scale-up can achieve
on this box. BENCH_SCALING.json's engine speedup should be read
against this ceiling.

Usage: python scripts/host_calibration.py  →  one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORK = """
import sys; sys.path.insert(0, {repo!r})
import numpy as np, time
from fforma_spark.sources.synth import _gen_one
from fforma_spark.functions.kernels import feature_vector
t0 = time.time()
for i in range(int(sys.argv[1]), int(sys.argv[1]) + 1500):
    _, toks, _ = _gen_one(42, i)
    feature_vector(np.asarray(toks, dtype=np.float64), 1)
print(time.time() - t0)
"""


def measure(n: int, repo: str) -> dict:
    env = dict(os.environ, OMP_NUM_THREADS="1")
    code = WORK.format(repo=repo)
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(1500 * i)],
            stdout=subprocess.PIPE,
            env=env,
        )
        for i in range(n)
    ]
    work = sum(float(p.communicate()[0]) for p in procs)
    wall = time.time() - t0
    return {"procs": n, "wall_sec": round(wall, 2),
            "total_work_sec": round(work, 2),
            "effective_cores": round(work / wall, 2)}


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r8, r32 = measure(8, repo), measure(32, repo)
    out = {
        "local8": r8,
        "local32": r32,
        "host_max_speedup_8_to_32": round(
            r32["effective_cores"] / r8["effective_cores"], 3
        ),
        "host_max_efficiency": round(
            r32["effective_cores"] / r8["effective_cores"] / 4, 3
        ),
    }
    print(json.dumps(out))
