"""Normal-equations ridge regressor.

Reproduces the floating-point recipe of the reference's ``FastRidge``
(reference: src/datafiller/estimators/ridge.py:42-111): inputs cast to
float32, Gram products accumulated by BLAS, intercept handled by
mean-centering the normal equations rather than augmenting X, ridge
``alpha`` added to the diagonal *after* centering. Matching the recipe —
not just the math — is what makes imputed tiers reproducible against the
reference (its own tests pin sklearn-equivalence only to rtol 1e-4).
"""

from __future__ import annotations

import numpy as np


def ridge_from_gram(
    gram: np.ndarray, n_samples: int, alpha: float, fit_intercept: bool
) -> tuple[np.ndarray, float]:
    """Solve ridge from the Gram of the augmented matrix ``[X, y, 1]``.

    Reference parity: src/datafiller/estimators/ridge.py:4-39.
    """
    k = gram.shape[0] - 2
    sxx = gram[:k, :k]
    sxy = gram[:k, k]
    if fit_intercept:
        sx = gram[:k, k + 1]
        sy = gram[k, k + 1]
        lhs = sxx - np.outer(sx, sx) / n_samples
        rhs = sxy - sx * (sy / n_samples)
    else:
        lhs = sxx.copy()
        rhs = sxy
    lhs.flat[:: k + 1] += alpha
    coef = np.linalg.solve(lhs, rhs)
    intercept = float(sy / n_samples - (sx / n_samples) @ coef) if fit_intercept else 0.0
    return coef, intercept


class FastRidge:
    """Ridge via explicit normal equations (float32 working precision).

    ``alpha`` defaults to 1e-2 and ``fit_intercept`` to True, matching
    the reference defaults (ridge.py:58).
    """

    def __init__(self, alpha: float = 1e-2, fit_intercept: bool = True):
        self.alpha = alpha
        self.fit_intercept = fit_intercept
        self.coef_: np.ndarray | None = None
        self.intercept_ = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "FastRidge":
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)
        n = X.shape[0]
        if self.fit_intercept:
            mx = X.mean(axis=0)
            my = y.mean()
            lhs = X.T @ X - np.float32(n) * np.outer(mx, mx)
            rhs = X.T @ y - np.float32(n) * mx * my
        else:
            mx = None
            my = np.float32(0.0)
            lhs = X.T @ X
            rhs = X.T @ y
        lhs.flat[:: lhs.shape[0] + 1] += self.alpha
        self.coef_ = np.linalg.solve(lhs, rhs)
        self.intercept_ = float(my - (mx @ self.coef_)) if self.fit_intercept else 0.0
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float32)
        return X @ self.coef_ + self.intercept_
