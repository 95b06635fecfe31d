#!/usr/bin/env python
"""Stage-isolated scaling probe for the per-series kernel.

Runs the bench-shaped kernel (TimeSeriesImputer fill + Gorilla encode on
a 5760-bucket 1m grid) over N_SERIES series in a process pool of size 1
and size 4 — the same payload bench.py's Python stage executes — and
prints per-level wall + the 1→4 efficiency. No Spark: this isolates the
NumPy kernel from scan/shuffle, which is how BENCH.md attributes the
pipeline's scaling to its dominant stage.

Usage: python scripts/kernel_scaling_probe.py [n_series] [reps]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def one_series(seed: int) -> int:
    import pandas as pd

    from datafiller_spark.kernels.codec import encode_points
    from datafiller_spark.kernels.timeseries import TimeSeriesImputer

    rng = np.random.RandomState(seed)
    n = 5760
    mask = rng.random(n) < 0.17
    vals = np.where(mask, 100 + 10 * np.sin(np.arange(n) / 60.0) + rng.normal(size=n), np.nan)
    idx = pd.date_range("2024-01-01", periods=n, freq="min")
    frame = pd.DataFrame({"avg_value": vals}, index=idx).asfreq("min")
    imputer = TimeSeriesImputer(
        lags=[1, 2, 3, -1, -2, -3], min_samples_train=20, interpolate_gaps_less_than=None
    )
    filled = imputer(frame)
    ts = filled.index.view("int64") // 10**9
    payload = encode_points(ts.astype(np.int64), filled["avg_value"].to_numpy())
    return len(payload)


def run_level(procs: int, n_series: int) -> float:
    from multiprocessing import Pool

    with Pool(procs) as pool:
        pool.map(one_series, range(8))  # warm imports/JIT-free but page caches
        t0 = time.time()
        pool.map(one_series, range(n_series), chunksize=max(1, n_series // (procs * 8)))
        return time.time() - t0


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sams = []
    for r in range(reps):
        t1 = run_level(1, n_series)
        t4 = run_level(4, n_series)
        eff = (t1 / t4) / 4
        sams.append(eff)
        print(f"rep {r}: n1 {t1:.2f}s  n4 {t4:.2f}s  efficiency {eff:.3f}", flush=True)
    sams.sort()
    mid = len(sams) // 2
    med = sams[mid] if len(sams) % 2 else (sams[mid - 1] + sams[mid]) / 2
    print(f"median efficiency {med:.3f}")


if __name__ == "__main__":
    main()
