"""Error-path pinning: every user-facing validation error has a test.

Reference analogue: tests/test_errors.py (module doc) — irregular and
unsorted indexes, inf rejection, bad selectors, invalid arguments.
"""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.exceptions import EngineError, EngineTypeError, EngineValueError
from datafiller_spark.kernels import (
    MultivariateImputer,
    TimeSeriesImputer,
    infer_frequency,
    interpolate_small_gaps,
    regularize_index,
)


def test_exception_hierarchy():
    assert issubclass(EngineValueError, EngineError)
    assert issubclass(EngineValueError, ValueError)
    assert issubclass(EngineTypeError, EngineError)
    assert issubclass(EngineTypeError, TypeError)


def test_duplicate_timestamps_raise():
    idx = pd.DatetimeIndex(["2021-01-01", "2021-01-01", "2021-01-02", "2021-01-05"])
    with pytest.raises(EngineValueError, match="duplicate"):
        infer_frequency(idx)


def test_non_datetime_index_raises():
    df = pd.DataFrame({"v": [1.0, 2.0]}, index=[0, 1])
    with pytest.raises(EngineTypeError, match="DatetimeIndex"):
        regularize_index(df)


def test_non_dataframe_input_raises():
    with pytest.raises(EngineTypeError):
        TimeSeriesImputer(lags=[1])(np.ones((5, 2)))


def test_bad_fallback_rejected():
    with pytest.raises(EngineValueError, match="fallback"):
        MultivariateImputer(fallback="bogus")


def test_out_of_range_selectors():
    x = np.ones((5, 3))
    x[0, 0] = np.nan
    with pytest.raises(EngineValueError, match="rows_to_impute"):
        MultivariateImputer()(x, rows_to_impute=[99])
    with pytest.raises(EngineValueError, match="cols_to_impute"):
        MultivariateImputer()(x, cols_to_impute=[7])


def test_bad_n_nearest_features():
    x = np.ones((30, 3))
    with pytest.raises(EngineValueError):
        MultivariateImputer()(x, n_nearest_features=0)
    with pytest.raises(EngineValueError):
        MultivariateImputer()(x, n_nearest_features=1.5)
    with pytest.raises(EngineValueError):
        MultivariateImputer()(x, n_nearest_features="many")


def test_bad_cols_entry_type():
    idx = pd.date_range("2021-01-01", periods=6, freq="D")
    df = pd.DataFrame({"v": np.arange(6.0)}, index=idx)
    with pytest.raises(EngineValueError, match="int or str"):
        TimeSeriesImputer(lags=[1])(df, cols_to_impute=[1.5])


def test_interp_gap_float_n_rejected():
    with pytest.raises(EngineTypeError):
        interpolate_small_gaps(pd.Series([1.0, np.nan, 2.0]), 2.0)


def test_root_api_mirrors_reference_exports():
    """A reference user switches packages 1:1: every name the reference
    exports at its root (reference src/datafiller/__init__.py:8-16) has
    an engine counterpart at datafiller_spark's root (its DataFiller*
    exception names map to Engine*)."""
    import datafiller_spark as d

    for name in ("MultivariateImputer", "TimeSeriesImputer", "FastRidge",
                 "ExtremeLearningMachine"):
        assert hasattr(d, name), name
        assert name in d.__all__
    assert issubclass(d.EngineValueError, d.EngineError)
    assert issubclass(d.EngineTypeError, d.EngineError)


def test_submodule_import_paths_mirror_reference():
    """datafiller.datasets / datafiller.estimators import paths work
    with the package name swapped."""
    from datafiller_spark.datasets import (  # noqa: F401
        add_contiguous_missing,
        add_mar,
        load_pems_bay,
        load_titanic,
    )
    from datafiller_spark.estimators import (  # noqa: F401
        ExtremeLearningMachine,
        FastRidge,
    )


def test_reference_constructor_surface_accepted():
    """The reference's full constructor surface works with the package
    name swapped: rng/verbose/scoring/classifier/time_column accepted,
    device rejected with a clear message (GPU path out of scope)."""
    import numpy as np
    import pandas as pd
    import pytest

    from datafiller_spark import MultivariateImputer, TimeSeriesImputer
    from datafiller_spark.exceptions import EngineValueError

    MultivariateImputer(rng=0, verbose=1, scoring="default")
    tsi = TimeSeriesImputer(lags=(1, -1), rng=0, verbose=1, time_column="time",
                            min_samples_train=5)
    idx = pd.date_range("2024-01-01", periods=40, freq="min")
    df = pd.DataFrame({"a": np.arange(40.0)}, index=idx)
    df.iloc[5:7] = np.nan
    assert tsi(df).isna().sum().sum() == 0

    with pytest.raises(EngineValueError, match="device"):
        MultivariateImputer(device="cuda")
    with pytest.raises(EngineValueError, match="scoring"):
        MultivariateImputer(scoring="custom")
    with pytest.raises(EngineValueError, match="time_column"):
        TimeSeriesImputer(time_column=7)
