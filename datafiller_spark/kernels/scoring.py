"""Feature-selection scores from masked cross-moments.

Score(target c, feature j) = (fraction of rows where both observed)
× |Pearson correlation of the mean-pre-imputed columns|. Computed from
masked moments without materializing a pre-imputed copy — the chunked
BLAS formulation of the reference (src/datafiller/multivariate/
_scoring.py:80-110), which its own tests pin equal to the fused Numba
kernel (reference tests/test_multivariate.py:546-561).
"""

from __future__ import annotations

import numpy as np

_CHUNK_ROWS = 2048


def score_features(
    x: np.ndarray,
    cols_to_impute: np.ndarray,
    column_means: np.ndarray | None = None,
) -> np.ndarray:
    """Score matrix of shape ``(len(cols_to_impute), x.shape[1])``."""
    m, n = x.shape
    cols = np.asarray(cols_to_impute, dtype=np.int64).ravel()
    work_dtype = x.dtype if x.dtype == np.float32 else np.float64

    counts = np.zeros(n, dtype=np.int64)
    if column_means is None:
        sums = np.zeros(n, dtype=np.float64)
        for start in range(0, m, _CHUNK_ROWS):
            chunk = x[start : start + _CHUNK_ROWS]
            observed = ~np.isnan(chunk)
            counts += np.count_nonzero(observed, axis=0)
            sums += np.where(observed, chunk, 0).sum(axis=0, dtype=np.float64)
        column_means = np.where(counts == 0, 0.0, sums / counts)
    else:
        for start in range(0, m, _CHUNK_ROWS):
            counts += np.count_nonzero(~np.isnan(x[start : start + _CHUNK_ROWS]), axis=0)

    means = np.asarray(column_means, dtype=work_dtype)
    shared = np.zeros((len(cols), n), dtype=np.float64)
    cross = np.zeros((len(cols), n), dtype=np.float64)
    sumsq = np.zeros(n, dtype=np.float64)
    with np.errstate(all="ignore"):
        for start in range(0, m, _CHUNK_ROWS):
            chunk = x[start : start + _CHUNK_ROWS]
            observed = (~np.isnan(chunk)).astype(work_dtype)
            centered = np.where(observed != 0, chunk - means, 0).astype(work_dtype, copy=False)
            shared += observed[:, cols].T @ observed
            cross += centered[:, cols].T @ centered
            sumsq += np.einsum("ij,ij->j", centered, centered)

        # std of the mean-pre-imputed column; all-NaN columns score NaN
        std = np.sqrt(sumsq / m)
        std = np.where(counts == 0, np.nan, std)
        corr = (cross / m) / np.outer(std[cols], std)
        return (shared / m) * np.abs(corr)
