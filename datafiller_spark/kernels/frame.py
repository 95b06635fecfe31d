"""Mixed-dtype DataFrame ⇄ numeric matrix codec (M19), sklearn-free.

Re-expression of the reference's ``_encode_dataframe`` /
``_decode_dataframe`` (reference src/datafiller/multivariate/
imputer.py:288-402): each categorical/string/bool column becomes one
float *code* column (NaN where missing) plus one-hot dummy columns
masked NaN where the source is missing; numeric columns pass through.
Decode restores the original schema — bool → pandas ``boolean``,
Categorical dtype and category order preserved, integer columns
rounded back, column order unchanged (pinned by the reference's own
round-trip tests, tests/test_multivariate_polars.py:19-26).

Categorical targets (M16) are imputed by the imputer's classifier — a
pure-NumPy depth-4 CART matching the reference's
``DecisionTreeClassifier(max_depth=4)`` semantics (kernels/cart.py) —
predicting integer codes directly; the mode fallback is the last step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pandas.api.types import (
    is_bool_dtype,
    is_integer_dtype,
    is_object_dtype,
    is_string_dtype,
)


def _is_categorical(series: pd.Series) -> bool:
    return (
        isinstance(series.dtype, pd.CategoricalDtype)
        or is_object_dtype(series.dtype)
        or is_string_dtype(series.dtype)
        or is_bool_dtype(series.dtype)
    )


@dataclass
class FrameCodec:
    """Everything needed to decode an imputed matrix back to the frame."""

    matrix: np.ndarray
    main_indices: np.ndarray  # encoded column of each original column
    feature_names: list[str]
    categories: dict[int, list] = field(default_factory=dict)  # main idx → labels
    dtypes: dict = field(default_factory=dict)
    index: pd.Index | None = None
    columns: pd.Index | None = None


def encode_dataframe(df: pd.DataFrame) -> FrameCodec:
    """Encode a mixed-dtype frame into a float32 matrix + codec metadata."""
    arrays: list[np.ndarray] = []
    names: list[str] = []
    main_indices: list[int] = []
    categories: dict[int, list] = {}

    for col in df.columns:
        series = df[col]
        main_idx = len(names)
        main_indices.append(main_idx)
        names.append(str(col))
        if _is_categorical(series):
            if isinstance(series.dtype, pd.CategoricalDtype):
                cats = series.cat.categories.tolist()
            else:
                cats = pd.Categorical(series.dropna()).categories.tolist()
            codes = pd.Categorical(series, categories=cats).codes.astype(np.float32)
            codes[codes == -1] = np.nan
            categories[main_idx] = cats
            arrays.append(codes.reshape(-1, 1))
            # one-hot features, masked NaN where the source is missing so
            # the imputer never trains on fabricated zeros
            dummies = pd.get_dummies(series, prefix=str(col), dummy_na=False)
            if len(dummies.columns):
                if series.isna().any():
                    dummies = dummies.mask(series.isna())
                names.extend(str(c) for c in dummies.columns)
                arrays.append(dummies.to_numpy(dtype=np.float32))
        else:
            arrays.append(series.to_numpy(dtype=np.float32).reshape(-1, 1))

    return FrameCodec(
        matrix=np.concatenate(arrays, axis=1).astype(np.float32, copy=False),
        main_indices=np.asarray(main_indices, dtype=np.int64),
        feature_names=names,
        categories=categories,
        dtypes=df.dtypes.to_dict(),
        index=df.index,
        columns=df.columns,
    )


def decode_dataframe(codec: FrameCodec, x_imputed: np.ndarray) -> pd.DataFrame:
    """Imputed matrix → frame with the original schema and dtypes."""
    data = {}
    for i, col in enumerate(codec.columns):
        main_idx = int(codec.main_indices[i])
        col_data = x_imputed[:, main_idx]
        dtype = codec.dtypes[col]
        if main_idx in codec.categories:
            cats = codec.categories[main_idx]
            mask = np.isnan(col_data)
            decoded = np.full(len(col_data), np.nan, dtype=object)
            if len(cats) and (~mask).any():
                # classifier outputs are exact integer codes; the
                # round+clip is a pure safety net for custom estimators
                snapped = np.clip(np.round(col_data[~mask]), 0, len(cats) - 1)
                decoded[~mask] = np.array(cats, dtype=object)[snapped.astype(np.int64)]
            if is_bool_dtype(dtype):
                series = pd.Series(decoded, index=codec.index, dtype="boolean")
            elif isinstance(dtype, pd.CategoricalDtype):
                series = pd.Series(
                    pd.Categorical(
                        decoded,
                        categories=dtype.categories if dtype.categories is not None else cats,
                        ordered=getattr(dtype, "ordered", False),
                    ),
                    index=codec.index,
                )
            elif isinstance(dtype, pd.StringDtype):
                # NOT is_string_dtype: that is also True for plain object
                # columns, whose labels may be non-string (e.g. shifted
                # bools) and must stay object
                series = pd.Series(decoded, index=codec.index, dtype="string")
            else:
                series = pd.Series(decoded, index=codec.index)
        else:
            series = pd.Series(col_data, index=codec.index)
            if is_integer_dtype(dtype):
                rounded = series.round()
                try:
                    series = rounded.astype(dtype)
                except (TypeError, ValueError):
                    series = rounded.astype(pd.Int64Dtype())
            else:
                series = series.astype(dtype)
        data[col] = series
    return pd.DataFrame(data, index=codec.index, columns=codec.columns)
