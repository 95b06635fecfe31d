"""Natural cubic-spline gap fill: kernel properties + Spark operator."""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.kernels.spline import natural_cubic_eval, spline_interpolate


def test_passes_through_observed_points():
    x = np.array([0.0, 1.0, 2.5, 4.0, 7.0])
    y = np.array([1.0, -2.0, 0.5, 3.0, -1.0])
    np.testing.assert_allclose(natural_cubic_eval(x, y, x), y, atol=1e-12)


def test_exact_on_linear_data():
    x = np.arange(10, dtype="float64")
    y = 3.0 * x - 2.0
    xq = np.array([0.5, 3.25, 8.9])
    np.testing.assert_allclose(natural_cubic_eval(x, y, xq), 3.0 * xq - 2.0, atol=1e-10)


def test_two_points_is_linear():
    out = natural_cubic_eval(np.array([0.0, 10.0]), np.array([0.0, 5.0]), np.array([4.0]))
    np.testing.assert_allclose(out, [2.0])


def test_c2_continuity_at_knots():
    rng = np.random.default_rng(0)
    x = np.cumsum(rng.uniform(0.5, 2.0, size=12))
    y = rng.normal(size=12)
    eps = 1e-6
    for knot in x[1:-1]:
        around = np.array([knot - 2 * eps, knot - eps, knot, knot + eps, knot + 2 * eps])
        vals = natural_cubic_eval(x, y, around)
        second_left = (vals[0] - 2 * vals[1] + vals[2]) / eps**2
        second_right = (vals[2] - 2 * vals[3] + vals[4]) / eps**2
        assert abs(second_left - second_right) < 1e-2 * max(1.0, abs(second_left))


def test_spline_beats_linear_on_smooth_signal():
    t = np.arange(100, dtype="float64")
    truth = np.sin(2 * np.pi * t / 25)
    s = pd.Series(truth.copy())
    s.iloc[40:47] = np.nan
    filled = spline_interpolate(s)
    lin = pd.Series(truth.copy())
    lin.iloc[40:47] = np.nan
    lin = lin.interpolate()
    err_spline = np.abs(filled.iloc[40:47] - truth[40:47]).mean()
    err_linear = np.abs(lin.iloc[40:47] - truth[40:47]).mean()
    assert err_spline < err_linear


def test_interior_only_and_max_gap():
    s = pd.Series([np.nan, 1.0, np.nan, np.nan, 4.0, np.nan, np.nan, np.nan, 8.0, np.nan])
    out = spline_interpolate(s, max_gap=2)
    assert np.isnan(out.iloc[0]) and np.isnan(out.iloc[-1])  # no extrapolation
    assert out.iloc[2:4].notna().all()  # run of 2 filled
    assert out.iloc[5:8].isna().all()  # run of 3 > max_gap left alone
    # observed pass through bit-exactly
    obs = s.notna()
    assert (out[obs] == s[obs]).all()


def test_spline_query_matches_kernel_on_duckdb_grid(spark):
    """Cross-engine value check for the driver's gap_spline_1h query
    (which has no SQL oracle): DuckDB independently materializes the
    1h grid from the raw events parquet — same SQL the driver oracle
    uses for the linear fills — the engine's spline KERNEL runs on that
    grid in-process, and the Spark query must match value-for-value."""
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    grid = con.execute(
        f"""
WITH tier AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         sum(value) / count(value) AS avg_value
  FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM (SELECT event_type, min(bucket) lo, max(bucket) hi FROM tier GROUP BY 1)
)
SELECT g.event_type, g.bucket, t.avg_value
FROM grid g LEFT JOIN tier t USING (event_type, bucket)
ORDER BY 1, 2
"""
    ).fetchdf()

    expected = {}
    for key, part in grid.groupby("event_type"):
        part = part.sort_values("bucket").reset_index(drop=True)
        filled = spline_interpolate(part["avg_value"].astype("float64"), max_gap=6)
        expected.update(
            {
                (key, ts): round(v, 6)
                for ts, v in zip(part["bucket"], filled)
                if not np.isnan(v)
            }
        )

    got = entrymod.q_gap_spline_1h(spark, sf_dir).toPandas()
    got_map = {
        (r.event_type, r.bucket): r.filled for r in got.itertuples() if not pd.isna(r.filled)
    }
    assert len(got) == len(grid)  # full grid emitted
    assert set(got_map) == set(expected)
    mismatches = [k for k in expected if got_map[k] != expected[k]]
    assert not mismatches, f"{len(mismatches)} cells differ, e.g. {mismatches[:3]}"


def test_spark_spline_fill_matches_kernel(spark):
    import datetime

    from datafiller_spark.operators import spline_fill

    base = datetime.datetime(2024, 1, 1)
    rng = np.random.default_rng(3)
    rows = []
    frames = {}
    for key in ("a", "b"):
        vals = np.cumsum(rng.normal(size=60))
        vals[20:26] = np.nan
        vals[40] = np.nan
        frames[key] = pd.Series(vals.copy())
        for i, v in enumerate(vals):
            rows.append((key, base + datetime.timedelta(hours=i), None if np.isnan(v) else float(v)))
    df = spark.createDataFrame(rows, "key string, bucket timestamp, v double")
    out = spline_fill(df.repartition(5), ["key"], "bucket", "v").toPandas()
    for key in ("a", "b"):
        got = out[out["key"] == key].sort_values("bucket")["v"].reset_index(drop=True)
        expected = spline_interpolate(frames[key])
        pd.testing.assert_series_equal(got, expected, check_names=False)
