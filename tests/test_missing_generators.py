"""S3/S4 missing-data injectors as library code."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafiller_spark.exceptions import EngineValueError
from datafiller_spark.sources import (
    add_contiguous_missing,
    add_mar,
    inject_contiguous_gaps,
    inject_mar,
)


def test_add_mar_ratio_and_reproducibility():
    df = pd.DataFrame(np.ones((1000, 4)))
    out = add_mar(df, 0.2, rng=0)
    ratio = out.isna().mean().mean()
    assert 0.15 < ratio < 0.25
    pd.testing.assert_frame_equal(out, add_mar(df, 0.2, rng=0))
    with pytest.raises(EngineValueError):
        add_mar(df, 1.5)


def test_add_contiguous_missing_blocks():
    df = pd.DataFrame(np.ones((100, 10)))
    out = add_contiguous_missing(df, frac_columns=0.5, length=0.2, rng=1)
    touched = [c for c in out.columns if out[c].isna().any()]
    assert len(touched) == 5
    for c in touched:
        na = out[c].isna().to_numpy()
        runs = np.flatnonzero(np.diff(np.concatenate(([0], na.view(np.int8), [0]))))
        assert len(runs) == 2  # exactly one contiguous block
        assert runs[1] - runs[0] == 20


def test_inject_mar_spark(spark):
    df = spark.range(0, 2000, 1, 4).select(F.col("id"), F.lit(1.0).alias("v"))
    out = inject_mar(df, "v", 0.3, seed=7)
    nulls = out.where(F.col("v").isNull()).count()
    assert 450 < nulls < 750
    # deterministic for a fixed partitioning
    assert out.where(F.col("v").isNull()).count() == nulls


def test_inject_contiguous_gaps_spark(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base + datetime.timedelta(hours=i), 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, bucket timestamp, v double")
    out = inject_contiguous_gaps(df, ["key"], "bucket", "v", gap_length=3, gap_every=10)
    pdf = out.orderBy("bucket").toPandas()
    na = pdf["v"].isna().to_numpy()
    # one run of exactly 3 per 10-bucket window (runs at window edges may
    # merge with the next window's run, so check totals + max run length)
    assert na.sum() == 30
    runs = np.diff(np.flatnonzero(np.diff(np.concatenate(([0], na.view(np.int8), [0]))))
                   .reshape(-1, 2), axis=1)
    assert runs.max() <= 6  # at most two adjacent runs merged
