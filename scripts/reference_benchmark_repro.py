#!/usr/bin/env python
"""The reference's own multivariate benchmark, reproduced same-box.

Reproduces the published PemsBay/MAR_0.10 row (reference scripts/
multivariate_benchmark.py:172-182,465-500: TimeSeriesImputer(lags=
(1,2,3,-1,-2,-3)), n_nearest_features=100, MAR 10% over observed
cells) on a synthetic frame in the same 8064×60 5-minute shape, and
times BOTH engines on this machine:

- the ENGINE's TimeSeriesImputer (kernels/timeseries.py), and
- the REFERENCE itself, running in-process through the test shim
  (tests/_reference_oracle.py; numba shimmed to pure Python — the
  published 41.85 s wall was numba-compiled, quoted alongside).

Prints one JSON line. No downloads: the real PEMS-BAY csv is
policy-excluded; shape, missingness, and config are what the published
wall depends on.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import pandas as pd


def pems_shaped_frame(n_rows: int = 8064, n_cols: int = 60, seed: int = 3) -> pd.DataFrame:
    """Correlated multi-sensor traffic-speed-like panel (5-min grid)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_rows)
    daily = np.sin(2 * np.pi * t / 288)  # 288 5-min buckets per day
    weekly = np.sin(2 * np.pi * t / (288 * 7))
    factors = np.stack([daily, weekly, rng.standard_normal(n_rows).cumsum() / 50])
    load = rng.uniform(-1, 1, size=(3, n_cols))
    base = factors.T @ load * 6.0
    noise = rng.standard_normal((n_rows, n_cols))
    idx = pd.date_range("2017-01-01", periods=n_rows, freq="5min", name="time")
    return pd.DataFrame(62.0 + base + noise, index=idx).rename_axis(columns="sensor_id")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=60)
    ap.add_argument("--rows", type=int, default=8064)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--jobs", type=int, default=None, help="n_jobs for per-column workers")
    ap.add_argument(
        "--pattern", choices=["mar", "blocks"], default="mar",
        help="published mask pattern: MAR_0.10 or Blocks_0.20x0.30",
    )
    args = ap.parse_args()
    from datafiller_spark.kernels import TimeSeriesImputer
    from datafiller_spark.sources import apply_mask, make_mar_mask

    LAGS = (1, 2, 3, -1, -2, -3)
    truth = pems_shaped_frame(n_rows=args.rows, n_cols=args.cols)
    from datafiller_spark.sources import make_block_mask

    # the reference masks only observed cells; the synthetic frame is
    # fully observed, so the protocol reduces to the plain mask
    if args.pattern == "blocks":
        mask = make_block_mask(truth.shape, 0.30, 0.20, np.random.default_rng(0))
        published = 0.334  # PemsBay Blocks_0.20x0.30 row
    else:
        mask = make_mar_mask(truth.shape, 0.10, np.random.default_rng(0))
        published = 41.85
    holed = apply_mask(truth, mask)
    masked_cells = int(mask.sum())

    t0 = time.time()
    ours = TimeSeriesImputer(lags=LAGS, n_jobs=args.jobs)(holed, n_nearest_features=100)
    wall_engine = time.time() - t0
    print(f"# engine: {wall_engine:.1f}s", file=sys.stderr, flush=True)

    if args.skip_reference:
        theirs, wall_ref = None, None
    else:
        from _reference_oracle import load_reference

        ref = load_reference()
        t0 = time.time()
        theirs = ref.TimeSeriesImputer(lags=LAGS, rng=0)(holed, n_nearest_features=100)
        wall_ref = time.time() - t0
        print(f"# reference(shimmed): {wall_ref:.1f}s", file=sys.stderr, flush=True)

    err_engine = float(np.sqrt(np.mean((ours.to_numpy()[mask] - truth.to_numpy()[mask]) ** 2)))
    err_ref = (
        None
        if theirs is None
        else float(np.sqrt(np.mean((theirs.to_numpy()[mask] - truth.to_numpy()[mask]) ** 2)))
    )
    print(
        json.dumps(
            {
                "shape": list(truth.shape),
                "masked_cells": masked_cells,
                "engine_n_jobs": args.jobs,
                "engine_wall_s": round(wall_engine, 3),
                "engine_pts_per_s": round(masked_cells / wall_engine, 1),
                "reference_shimmed_wall_s": None if wall_ref is None else round(wall_ref, 3),
                "reference_shimmed_pts_per_s": (
                    None if wall_ref is None else round(masked_cells / wall_ref, 1)
                ),
                "speedup_vs_shimmed_reference": (
                    None if wall_ref is None else round(wall_ref / wall_engine, 2)
                ),
                "pattern": args.pattern,
                "published_reference_wall_s": published,  # numba-compiled, unknown hw
                "rmse_engine": round(err_engine, 4),
                "rmse_reference": None if err_ref is None else round(err_ref, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
