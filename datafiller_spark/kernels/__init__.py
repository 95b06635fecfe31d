"""Pure NumPy/pandas ports of the reference imputation math.

Everything here runs *inside* Arrow-vectorized pandas UDFs on executors.
No Spark imports allowed in this package: the kernels must be testable
stand-alone and shippable via ``spark-submit --py-files``.

The reference (CyrilJl/datafiller) implements these as Numba kernels;
numba is not available in this environment, so the math is re-expressed
with vectorized NumPy. Floating-point recipes (dtypes, accumulation
orders, population-std, ridge normal equations) follow the reference
exactly so the gap-filled tiers are reproducible.
"""

from .ridge import FastRidge, ridge_from_gram
from .cart import DecisionTreeClassifier
from .elm import ExtremeLearningMachine
from .lags import build_lag_matrix, all_nan_columns, interpolate_small_gaps
from .timefeat import make_time_features
from .optimask import optimask
from .scoring import score_features
from .multivariate import MultivariateImputer
from .timeseries import TimeSeriesImputer, infer_frequency, regularize_index

__all__ = [
    "FastRidge",
    "ridge_from_gram",
    "DecisionTreeClassifier",
    "ExtremeLearningMachine",
    "build_lag_matrix",
    "all_nan_columns",
    "interpolate_small_gaps",
    "make_time_features",
    "optimask",
    "score_features",
    "MultivariateImputer",
    "TimeSeriesImputer",
    "infer_frequency",
    "regularize_index",
]
