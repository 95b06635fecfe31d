"""Per-missingness-pattern ridge solves from shared Gram matrices.

The imputer trains one model per observed-feature pattern of the rows it
predicts, each on the training rows complete over that pattern's usable
columns. Those training sets overlap heavily — every fully-observed row
belongs to EVERY pattern's training set — so refitting per pattern
re-accumulates the same outer products over and over (the reference's
module doc quotes 3.1 GFLOP of outer products for 0.11 GFLOP of distinct
information; reference src/datafiller/multivariate/_gram.py:1-22).

This is the engine's re-expression of that idea (M12/M13) in vectorized
NumPy rather than Numba loops:

- one float64 Gram of the augmented matrix ``[X, y, 1]`` over the
  complete training rows, accumulated in 8192-row chunks (same chunking
  and float64 policy as the reference, _gram.py:107-118 — the intercept
  correction cancels magnitude, so float32 would lose digits);
- training rows holding NaNs are grouped by their exact NaN pattern;
  groups of ≥2 rows get ONE cached Gram each (NaN→0, exact because a
  group only serves patterns that exclude all its NaN columns), capped
  by the same 64 MB budget (_gram.py:29);
- each prediction pattern assembles its Gram as
  ``complete + admitted groups + leftover admitted rows`` where a row or
  group is admitted iff its NaN columns are a subset of the pattern's
  EXCLUDED columns — a boolean-matrix test here instead of the
  reference's bitmask/lowest-NaN-column index (that indexing is a Numba
  cache optimization; the admission semantics are identical);
- the ridge solve per pattern runs on the usable-column sub-Gram via
  :func:`datafiller_spark.kernels.ridge.ridge_from_gram`.

Patterns that gather fewer than ``min_samples_train`` rows are NOT
solved here — the caller falls back to its optimask branch, mirroring
the reference's control flow (_gram.py:244-414 returns solved flags).
"""

from __future__ import annotations

import numpy as np

from .optimask import unique_bool_rows
from .ridge import ridge_from_gram

#: cached per-group Gram memory ceiling (reference parity: _gram.py:29)
GRAM_CACHE_BUDGET_BYTES = 64_000_000

_CHUNK = 8192


def _complete_gram(z: np.ndarray, complete_rows: np.ndarray) -> np.ndarray:
    """float64 Gram of the fully observed rows, chunked accumulation."""
    width = z.shape[1]
    gram = np.zeros((width, width), dtype=np.float64)
    for start in range(0, len(complete_rows), _CHUNK):
        block = z[complete_rows[start : start + _CHUNK]].astype(np.float64)
        gram += block.T @ block
    return gram


class GramSolver:
    """Shared-Gram ridge solver for one target column.

    Args:
        local_train: standardized training feature matrix (m, k), NaNs
            where unobserved.
        local_target: training target values (m,), fully observed.
        budget_bytes: cache ceiling for per-group Grams.
    """

    def __init__(
        self,
        local_train: np.ndarray,
        local_target: np.ndarray,
        budget_bytes: int | None = None,
    ):
        if budget_bytes is None:
            budget_bytes = GRAM_CACHE_BUDGET_BYTES
        m, k = local_train.shape
        self.k = k
        width = k + 2
        # augmented [X, y, 1] in float32 working precision (reference
        # gather_augmented, _gram.py:59-77), Grams in float64
        z = np.empty((m, width), dtype=np.float32)
        z[:, :k] = local_train
        z[:, k] = local_target
        z[:, k + 1] = 1.0
        self._z = z
        self._mask = np.isnan(local_train)
        row_has_nan = self._mask.any(axis=1)
        complete = np.flatnonzero(~row_has_nan)
        self.n_complete = len(complete)
        self._gram_complete = _complete_gram(z, complete)

        nan_rows = np.flatnonzero(row_has_nan)
        if nan_rows.size:
            patterns, inverse = unique_bool_rows(self._mask[nan_rows])
            inverse = inverse.ravel()
            counts = np.bincount(inverse, minlength=len(patterns))
            # budget 0 truly disables the cache (all NaN rows accumulate
            # on demand per pattern instead)
            max_groups = budget_bytes // (width * width * 8)
            kept = np.flatnonzero(counts >= 2)
            if len(kept) > max_groups:
                kept = np.sort(kept[np.argsort(-counts[kept], kind="stable")[:max_groups]])
            remap = np.full(len(patterns), -1, dtype=np.int64)
            remap[kept] = np.arange(len(kept))
            group_of_row = remap[inverse]
            cached = group_of_row >= 0

            self._group_masks = patterns[kept]  # (G, k) bool: NaN columns
            self._group_counts = counts[kept]
            self._group_grams = np.zeros((len(kept), width, width), dtype=np.float64)
            for g in range(len(kept)):
                rows = nan_rows[group_of_row == g]
                zg = np.nan_to_num(z[rows].astype(np.float64), copy=False)
                self._group_grams[g] = zg.T @ zg
            self._loose_rows = nan_rows[~cached]
        else:
            self._group_masks = np.zeros((0, k), dtype=bool)
            self._group_counts = np.zeros(0, dtype=np.int64)
            self._group_grams = np.zeros((0, width, width), dtype=np.float64)
            self._loose_rows = np.zeros(0, dtype=np.int64)
        self._loose_masks = self._mask[self._loose_rows]

    def solve_pattern(
        self,
        usable: np.ndarray,
        min_samples_train: int,
        alpha: float,
        fit_intercept: bool,
    ) -> tuple[np.ndarray, float, int] | None:
        """Ridge coefficients for one observed-feature pattern.

        Returns ``(coef, intercept, n_samples)`` over the ``usable``
        feature columns, or None when fewer than ``min_samples_train``
        training rows are complete on them (caller falls back).
        """
        k = self.k
        usable_mask = np.zeros(k, dtype=bool)
        usable_mask[usable] = True
        # admitted ⟺ NaN columns ⊆ excluded ⟺ no NaN in a usable column
        g_admit = ~(self._group_masks[:, usable_mask].any(axis=1)) if len(self._group_masks) else np.zeros(0, bool)
        r_admit = ~(self._loose_masks[:, usable_mask].any(axis=1)) if len(self._loose_masks) else np.zeros(0, bool)
        n = self.n_complete + int(self._group_counts[g_admit].sum()) + int(r_admit.sum())
        if n < min_samples_train:
            return None

        gram = self._gram_complete.copy()
        if g_admit.any():
            gram += self._group_grams[g_admit].sum(axis=0)
        if r_admit.any():
            zl = np.nan_to_num(self._z[self._loose_rows[r_admit]].astype(np.float64), copy=False)
            gram += zl.T @ zl

        sub = np.concatenate([usable, [k, k + 1]])
        coef, intercept = ridge_from_gram(
            gram[np.ix_(sub, sub)], n, alpha=alpha, fit_intercept=fit_intercept
        )
        return coef, intercept, n
