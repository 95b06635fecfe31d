"""Pure-NumPy depth-limited CART classifier (M16).

The reference imputes categorical targets with sklearn's
``DecisionTreeClassifier(max_depth=4, random_state=rng)``
(reference: src/datafiller/multivariate/imputer.py:95-97, 206,
657-670). sklearn is not available in this environment, so this is a
from-scratch CART with the same contract:

- gini impurity, best-split over every feature, thresholds at midpoints
  of adjacent distinct values (sklearn's rule);
- depth-limited (default 4), ``min_samples_split`` guard;
- ``fit(X, y)`` / ``predict(X)`` / ``classes_`` surface, integer or
  float labels.

Parity is behavioral, not bit-level: sklearn permutes the feature scan
order with ``random_state`` purely for tie-breaking, which is not
reproducible without sklearn. This tree is instead FULLY deterministic
by construction — features scanned in index order, the first strictly
better (impurity, feature, threshold) wins — so the same data always
yields the same tree regardless of seed (``random_state`` is accepted
for API parity and recorded, nothing more). Per-node work is
vectorized: one argsort + one cumulative class-count matrix per
feature, no per-sample Python.
"""

from __future__ import annotations

import numpy as np

from ..exceptions import EngineValueError


class _Node:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, value: int, feature: int = -1, threshold: float = 0.0):
        self.feature = feature
        self.threshold = threshold
        self.left: _Node | None = None
        self.right: _Node | None = None
        self.value = value


class DecisionTreeClassifier:
    """Depth-limited CART with gini splits (see module docstring)."""

    def __init__(
        self,
        max_depth: int = 4,
        min_samples_split: int = 2,
        random_state=None,
    ):
        if max_depth < 1:
            raise EngineValueError("max_depth must be >= 1.")
        self.max_depth = int(max_depth)
        self.min_samples_split = int(min_samples_split)
        self.random_state = random_state
        self.classes_: np.ndarray | None = None
        self._root: _Node | None = None

    # -- fitting -----------------------------------------------------------

    def _best_split(self, x: np.ndarray, y: np.ndarray, n_classes: int):
        """(weighted_gini, feature, threshold) of the best split, or None.

        One pass per feature: sort once, build the cumulative class-count
        matrix, and evaluate every distinct-value boundary vectorized.
        Ties keep the FIRST (lowest feature index, lowest threshold)."""
        m, n_feat = x.shape
        total = np.bincount(y, minlength=n_classes).astype(np.float64)
        best = None
        best_imp = np.inf
        rows = np.arange(m)
        for f in range(n_feat):
            xv = x[:, f].astype(np.float64, copy=False)
            order = np.argsort(xv, kind="stable")
            xs = xv[order]
            ys = y[order]
            boundaries = np.flatnonzero(xs[1:] > xs[:-1])  # split AFTER index b
            if not boundaries.size:
                continue
            onehot = np.zeros((m, n_classes), dtype=np.float64)
            onehot[rows, ys] = 1.0
            cum = np.cumsum(onehot, axis=0)
            left = cum[boundaries]  # class counts of the left side
            n_left = (boundaries + 1).astype(np.float64)
            right = total - left
            n_right = m - n_left
            gini_left = 1.0 - (np.square(left) / np.square(n_left)[:, None]).sum(axis=1)
            gini_right = 1.0 - (np.square(right) / np.square(n_right)[:, None]).sum(axis=1)
            weighted = (n_left * gini_left + n_right * gini_right) / m
            j = int(np.argmin(weighted))  # argmin keeps the lowest threshold on ties
            if weighted[j] < best_imp:
                best_imp = float(weighted[j])
                thr = 0.5 * (xs[boundaries[j]] + xs[boundaries[j] + 1])
                best = (best_imp, f, float(thr))
        return best

    def _grow(self, x: np.ndarray, y: np.ndarray, depth: int, n_classes: int) -> _Node:
        counts = np.bincount(y, minlength=n_classes)
        majority = int(np.argmax(counts))  # ties → smallest class index
        node = _Node(value=majority)
        if (
            depth >= self.max_depth
            or len(y) < self.min_samples_split
            or counts.max() == len(y)  # pure node
        ):
            return node
        split = self._best_split(x, y, n_classes)
        if split is None:
            return node
        _, f, thr = split
        mask = x[:, f].astype(np.float64, copy=False) <= thr
        if not mask.any() or mask.all():  # degenerate threshold, keep the leaf
            return node
        node.feature = f
        node.threshold = thr
        node.left = self._grow(x[mask], y[mask], depth + 1, n_classes)
        node.right = self._grow(x[~mask], y[~mask], depth + 1, n_classes)
        return node

    def fit(self, X, y) -> "DecisionTreeClassifier":
        x = np.asarray(X)
        if x.ndim != 2:
            raise EngineValueError("X must be 2-D.")
        y = np.asarray(y)
        if len(y) != len(x):
            raise EngineValueError("X and y length mismatch.")
        if np.isnan(x.astype(np.float64, copy=False)).any():
            raise EngineValueError("CART training features cannot contain NaN.")
        self.classes_, y_enc = np.unique(y, return_inverse=True)
        self._root = self._grow(x, y_enc.astype(np.int64), 0, len(self.classes_))
        return self

    # -- prediction ----------------------------------------------------------

    def _route(self, node: _Node, x: np.ndarray, idx: np.ndarray, out: np.ndarray) -> None:
        if node.left is None:
            out[idx] = node.value
            return
        mask = x[idx, node.feature].astype(np.float64, copy=False) <= node.threshold
        self._route(node.left, x, idx[mask], out)
        self._route(node.right, x, idx[~mask], out)

    def predict(self, X) -> np.ndarray:
        if self._root is None or self.classes_ is None:
            raise EngineValueError("DecisionTreeClassifier is not fitted.")
        x = np.asarray(X)
        out = np.zeros(len(x), dtype=np.int64)
        self._route(self._root, x, np.arange(len(x)), out)
        return self.classes_[out]
