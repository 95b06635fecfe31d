"""S1/S2 dataset loaders — the reference's normalization on local files
(downloads are policy-excluded; everything after the fetch is mirrored
and pinned here against a fixture in the published datasets' shape)."""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.sources import (
    load_pems_bay,
    load_pems_bay_spark,
    load_titanic,
    load_titanic_spark,
)


@pytest.fixture()
def pems_csv(tmp_path):
    """A PEMS-BAY-shaped CSV: first column 5-min timestamps (with two
    missing rows), then one column per sensor id."""
    idx = pd.date_range("2017-01-01", periods=20, freq="5min")
    kept = idx.delete([7, 13])
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"400001": rng.uniform(50, 70, len(kept)).round(1),
         "400017": rng.uniform(50, 70, len(kept)).round(1)},
        index=kept,
    )
    path = str(tmp_path / "pems.csv")
    df.to_csv(path, index_label="")
    return path, df, idx


@pytest.fixture()
def titanic_csv(tmp_path):
    path = str(tmp_path / "titanic.csv")
    pd.DataFrame(
        {
            "survived": [0, 1, 1, 0],
            "pclass": [3, 1, 3, 2],
            "sex": ["male", "female", "female", None],
            "age": [22.0, 38.0, None, 27.0],
            "embarked": ["S", "C", "S", None],
        }
    ).to_csv(path, index=False)
    return path


def test_load_pems_bay_matches_reference_normalization(pems_csv):
    path, src, full_idx = pems_csv
    df = load_pems_bay(path)
    # the reference contract: DatetimeIndex named time, 5-min freq,
    # missing timestamps reinserted as NaN rows, columns = sensor_id
    assert df.index.name == "time"
    assert df.columns.name == "sensor_id"
    assert df.index.freqstr in ("5min", "5T")
    assert df.index.equals(full_idx)
    assert df.loc[full_idx[7]].isna().all() and df.loc[full_idx[13]].isna().all()
    np.testing.assert_array_equal(df.dropna().to_numpy(), src.to_numpy())


def test_load_pems_bay_spark_equals_pandas_cellwise(spark, pems_csv):
    path, _src, full_idx = pems_csv
    wide = load_pems_bay(path)
    long = load_pems_bay_spark(spark, path).collect()
    assert len(long) == wide.size
    for r in long:
        truth = wide.at[pd.Timestamp(r.time), r.sensor_id]
        assert (r.value is None and pd.isna(truth)) or r.value == truth


def test_load_titanic_mixed_dtypes_impute(titanic_csv, spark):
    pdf = load_titanic(titanic_csv)
    assert pdf.isna().sum().sum() > 0
    sdf = load_titanic_spark(spark, titanic_csv)
    assert sdf.count() == len(pdf)
    assert dict(sdf.dtypes)["age"] == "double"
    # the loaded frame feeds the mixed-dtype imputer (M16/M19 shape)
    from datafiller_spark.kernels import MultivariateImputer

    filled = MultivariateImputer(min_samples_train=2)(pdf)
    assert filled["age"].isna().sum() == 0
