"""Missing-data injectors (S3/S4) — library code, seeded and reproducible.

Pandas forms mirror the reference's generators
(reference src/datafiller/datasets/_misc.py:7-63) for kernel-level
fixtures; the Spark forms express the same patterns as column
expressions so benchmark masks can be injected cluster-side without
materializing anything on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..exceptions import EngineValueError


def add_mar(
    df: pd.DataFrame, nan_ratio: float, rng: int | np.random.Generator | None = None
) -> pd.DataFrame:
    """Missing-At-Random NaNs at ``nan_ratio`` (reference _misc.py:7-28)."""
    if not 0 <= nan_ratio <= 1:
        raise EngineValueError("nan_ratio must be between 0 and 1")
    gen = np.random.default_rng(rng)
    out = df.copy()
    out[gen.random(out.shape) < nan_ratio] = np.nan
    return out


def add_contiguous_missing(
    df: pd.DataFrame,
    frac_columns: float,
    length: int | float,
    rng: int | np.random.Generator | None = None,
) -> pd.DataFrame:
    """One contiguous NaN block in a random fraction of columns
    (int length = absolute rows, float = fraction of rows;
    reference _misc.py:31-63)."""
    if not 0 <= frac_columns <= 1:
        raise EngineValueError("frac_columns must be between 0 and 1")
    gen = np.random.default_rng(rng)
    out = df.copy()
    chosen = gen.choice(out.columns, size=int(len(out.columns) * frac_columns), replace=False)
    for col in chosen:
        n_rows = len(out)
        block = int(n_rows * length) if isinstance(length, float) else int(length)
        block = min(block, n_rows)
        start = gen.integers(0, n_rows - block + 1)
        out.loc[out.index[start : start + block], col] = np.nan
    return out


def inject_mar(df: DataFrame, value_col: str, nan_ratio: float, seed: int = 0) -> DataFrame:
    """Spark MAR injection: NULL out ``value_col`` at ``nan_ratio``.

    ``F.rand(seed)`` is deterministic per (seed, partition, row-offset),
    so the mask is reproducible for a fixed input partitioning."""
    if not 0 <= nan_ratio <= 1:
        raise EngineValueError("nan_ratio must be between 0 and 1")
    return df.withColumn(
        value_col,
        F.when(F.rand(seed) < nan_ratio, F.lit(None)).otherwise(F.col(value_col)),
    )


def inject_contiguous_gaps(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    gap_length: int,
    gap_every: int = 10,
    seed: int = 0,
) -> DataFrame:
    """Spark contiguous-gap injection: per key, NULL out runs of
    ``gap_length`` consecutive buckets, one run per ``gap_every``-bucket
    window whose (deterministic) hash selects it. Expresses the
    reference's block-mask benchmark pattern cluster-side."""
    if gap_length <= 0 or gap_every <= 0:
        raise EngineValueError("gap_length and gap_every must be positive")
    w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    pos = F.row_number().over(w) - 1
    window_id = F.floor(pos / gap_every)
    # start clamped so the run never truncates at the window boundary:
    # every full window loses exactly gap_length buckets
    start_span = max(gap_every - gap_length + 1, 1)
    start = F.pmod(F.xxhash64(*key_cols, window_id, F.lit(seed)), F.lit(start_span))
    offset = pos % gap_every
    in_gap = (offset >= start) & (offset < start + gap_length)
    return df.withColumn(
        value_col, F.when(in_gap, F.lit(None)).otherwise(F.col(value_col))
    )


def make_mar_mask(
    shape: tuple[int, int], missing_ratio: float, rng: int | np.random.Generator | None = None
) -> np.ndarray:
    """Boolean MAR benchmark mask (S5), draw-for-draw identical to the
    reference's (reference scripts/multivariate_benchmark.py:189-190)
    for the same Generator state — so engine and reference benchmarks
    hide the exact same cells."""
    if not 0 <= missing_ratio <= 1:
        raise EngineValueError("missing_ratio must be between 0 and 1")
    gen = rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
    return gen.random(shape) < missing_ratio


def make_block_mask(
    shape: tuple[int, int],
    frac_columns: float,
    block_length_ratio: float,
    rng: int | np.random.Generator | None = None,
) -> np.ndarray:
    """Boolean block benchmark mask (S5): one contiguous run of
    ``block_length_ratio``·rows in ``frac_columns``·cols, draw-for-draw
    identical to the reference's
    (reference scripts/multivariate_benchmark.py:193-207)."""
    if not 0 <= frac_columns <= 1:
        raise EngineValueError("frac_columns must be between 0 and 1")
    gen = rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
    n_rows, n_cols = shape
    mask = np.zeros((n_rows, n_cols), dtype=bool)
    n_cols_to_mask = max(1, int(n_cols * frac_columns))
    cols = gen.choice(np.arange(n_cols), size=n_cols_to_mask, replace=False)
    block_length = max(1, int(n_rows * block_length_ratio))
    for col in cols:
        start = gen.integers(0, max(1, n_rows - block_length + 1))
        mask[start : start + block_length, col] = True
    return mask


def apply_mask(df: pd.DataFrame, mask: np.ndarray) -> pd.DataFrame:
    """NaN out the masked cells (benchmark protocol: impute the masked
    frame, score only on masked cells against the held-out truth)."""
    out = df.copy()
    out[mask] = np.nan
    return out
