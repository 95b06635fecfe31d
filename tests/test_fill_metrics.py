"""Fill-method attribution: interp vs model vs fallback counts."""

import numpy as np
import pandas as pd

from datafiller_spark.kernels import TimeSeriesImputer
from datafiller_spark.operators import rollup
from datafiller_spark.operators.impute import gapfill_metrics
from datafiller_spark.sources import load_table, synth_sequences


def test_kernel_fill_counts_partition_the_gaps():
    idx = pd.date_range("2024-01-01", periods=200, freq="min")
    rng = np.random.default_rng(0)
    s = pd.Series(np.sin(np.arange(200) / 20) + 0.01 * rng.normal(size=200), index=idx)
    s.iloc[10] = np.nan          # short run → interp
    s.iloc[50:60] = np.nan       # long run → model
    df = pd.DataFrame({"v": s})
    imp = TimeSeriesImputer(lags=[1, 2, -1, -2], min_samples_train=20, interpolate_gaps_less_than=2)
    out = imp(df)
    counts = imp.fill_counts_
    assert counts["interp"] == 1
    assert counts["model"] == 10
    assert counts["fallback"] == 0
    assert not out.isna().any().any()
    assert counts["interp"] + counts["model"] + counts["fallback"] == 11


def test_fallback_counted_when_untrainable():
    idx = pd.date_range("2024-01-01", periods=10, freq="min")
    s = pd.Series(np.arange(10.0), index=idx)
    s.iloc[4] = np.nan
    imp = TimeSeriesImputer(lags=[1], min_samples_train=100)
    imp(pd.DataFrame({"v": s}))
    assert imp.fill_counts_ == {"interp": 0, "model": 0, "fallback": 1}


def test_gapfill_metrics_operator(spark):
    seqs = synth_sequences(spark, 20000, mean_tokens=16, span_minutes=720, n_sources=8)
    t1m = rollup(seqs, ["source"], "event_ts", "n_tok", "1m")
    m = gapfill_metrics(t1m, ["source"], "bucket", "avg_value", min_samples_train=20)
    rows = m.collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_grid >= r.n_observed
        gaps = r.n_grid - r.n_observed
        assert r.gaps_by_interp + r.gaps_by_model + r.gaps_by_fallback + r.gaps_unfilled == gaps
