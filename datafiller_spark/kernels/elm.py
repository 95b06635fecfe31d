"""Extreme Learning Machine: random projection + ReLU + ridge.

Alternative regressor for the gap-fill kernel, reproducing the
reference's recipe (reference: src/datafiller/estimators/elm.py:10-204):
per-input-width cached fan-in-scaled Gaussian projections seeded by
``random_state`` (so refits across missingness patterns of varying
width stay reproducible), hidden width capped at
``n_samples // min_samples_per_feature``, and a chunked Gram
accumulation past 65 536 rows so the hidden matrix is never fully
materialized — the reference's own tests pin chunked == single-shot.
"""

from __future__ import annotations

import numpy as np

from .ridge import FastRidge, ridge_from_gram

_CHUNK_ROWS = 65536


class ExtremeLearningMachine:
    def __init__(
        self,
        n_features: int = 100,
        alpha: float = 1.0,
        random_state: int = 0,
        min_samples_per_feature: int = 5,
    ):
        self.n_features = n_features
        self.alpha = alpha
        self.random_state = random_state
        self.min_samples_per_feature = min_samples_per_feature
        self.ridge_ = FastRidge(alpha=alpha)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.n_features_used_: int | None = None

    def _weights(self, width: int) -> tuple[np.ndarray, np.ndarray]:
        pair = self._cache.get(width)
        if pair is None:
            rng = np.random.RandomState(self.random_state)
            scale = np.float32(1.0 / np.sqrt(width))
            pair = (
                rng.randn(width, self.n_features).astype(np.float32) * scale,
                rng.randn(self.n_features).astype(np.float32) * scale,
            )
            self._cache[width] = pair
        return pair

    def _hidden_width(self, n_samples: int) -> int:
        if self.min_samples_per_feature <= 0:
            return self.n_features
        return min(self.n_features, max(1, n_samples // self.min_samples_per_feature))

    @staticmethod
    def _activate(X, W, bias, out=None):
        h = np.matmul(X, W, out=out)
        h += bias
        np.maximum(h, 0.0, out=h)
        return h

    def fit(self, X: np.ndarray, y: np.ndarray) -> "ExtremeLearningMachine":
        X = np.ascontiguousarray(X, dtype=np.float32)
        n = X.shape[0]
        W, bias = self._weights(X.shape[1])
        k = self._hidden_width(n)
        self.n_features_used_ = k
        if k < self.n_features:
            W, bias = W[:, :k], bias[:k]

        if n <= _CHUNK_ROWS:
            self.ridge_.fit(self._activate(X, W, bias), y)
            return self

        y = np.asarray(y, dtype=np.float32)
        gram = np.zeros((k + 2, k + 2), dtype=np.float64)
        buf = np.empty((_CHUNK_ROWS, k + 2), dtype=np.float32)
        buf[:, k + 1] = 1.0
        for start in range(0, n, _CHUNK_ROWS):
            stop = min(start + _CHUNK_ROWS, n)
            z = buf[: stop - start]
            self._activate(X[start:stop], W, bias, out=z[:, :k])
            z[:, k] = y[start:stop]
            gram += z.T @ z
        coef, intercept = ridge_from_gram(gram, n, self.ridge_.alpha, self.ridge_.fit_intercept)
        self.ridge_.coef_ = coef.astype(np.float32)
        self.ridge_.intercept_ = np.float32(intercept)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.ascontiguousarray(X, dtype=np.float32)
        n = X.shape[0]
        W, bias = self._weights(X.shape[1])
        k = self.n_features_used_ if self.n_features_used_ is not None else self.n_features
        if k < self.n_features:
            W, bias = W[:, :k], bias[:k]
        if n <= _CHUNK_ROWS:
            return self.ridge_.predict(self._activate(X, W, bias))
        out = np.empty(n, dtype=np.float32)
        buf = np.empty((_CHUNK_ROWS, k), dtype=np.float32)
        for start in range(0, n, _CHUNK_ROWS):
            stop = min(start + _CHUNK_ROWS, n)
            h = self._activate(X[start:stop], W, bias, out=buf[: stop - start])
            out[start:stop] = self.ridge_.predict(h)
        return out
