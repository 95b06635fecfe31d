"""Gram fast path (M12/M13): cross-path equality + the speedup it buys.

Mirrors the reference's own test strategy: Gram-path results equal the
materialized-refit path within a small fraction of each column's spread
(reference tests/test_multivariate.py:375-388), a zero cache budget
degrades gracefully to on-demand row accumulation with near-identical
results (:504-519), and the fast path is measurably faster on a
many-column impute (the point of M12: reference _gram.py module doc,
3.1 GFLOP → 0.11 GFLOP).
"""

import time

import numpy as np
import pytest

from datafiller_spark.kernels import MultivariateImputer
from datafiller_spark.kernels import gram as gram_mod


def _mar(seed=0, shape=(400, 12), ratio=0.15):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=shape)
    x = base @ rng.normal(size=(shape[1], shape[1])) * 0.4 + base
    x[rng.random(shape) < ratio] = np.nan
    return x


def _spread_close(a, b, bound=1e-4):
    spread = np.nanmax(b, axis=0) - np.nanmin(b, axis=0)
    spread[spread == 0] = 1.0
    rel = np.nanmax(np.abs(a - b) / spread)
    assert rel < bound, f"max rel-to-spread {rel:.2e}"


def test_gram_equals_materialized_within_spread():
    for seed in (0, 1, 2):
        x = _mar(seed=seed)
        got_gram = MultivariateImputer(use_gram=True)(x.copy())
        got_mat = MultivariateImputer(use_gram=False)(x.copy())
        # identical cells stay identical; imputed cells within the bound
        obs = ~np.isnan(x)
        np.testing.assert_array_equal(got_gram[obs], got_mat[obs])
        _spread_close(got_gram, got_mat)
        assert not np.isnan(got_gram).any()


def test_gram_with_feature_selection_matches():
    x = _mar(seed=3, shape=(300, 10))
    got_gram = MultivariateImputer(use_gram=True)(x.copy(), n_nearest_features=4)
    got_mat = MultivariateImputer(use_gram=False)(x.copy(), n_nearest_features=4)
    _spread_close(got_gram, got_mat)


def test_zero_cache_budget_degrades_gracefully(monkeypatch):
    """Budget 0 → no cached group Grams, every NaN row accumulated on
    demand; results equal the cached path up to float64 summation order."""
    x = _mar(seed=4)
    cached = MultivariateImputer(use_gram=True)(x.copy())
    monkeypatch.setattr(gram_mod, "GRAM_CACHE_BUDGET_BYTES", 0)
    uncached = MultivariateImputer(use_gram=True)(x.copy())
    np.testing.assert_allclose(uncached, cached, rtol=1e-9, atol=1e-9)

    # and the cache really is empty at budget 0 (no max(1, ...) floor)
    solver = gram_mod.GramSolver(x[:, 1:], np.nan_to_num(x[:, 0]), budget_bytes=0)
    assert len(solver._group_grams) == 0
    assert len(solver._loose_rows) == np.isnan(x[:, 1:]).any(axis=1).sum()


def test_use_gram_requires_stock_ridge():
    from datafiller_spark.exceptions import EngineValueError
    from datafiller_spark.kernels.ridge import FastRidge

    class Other(FastRidge):
        pass

    with pytest.raises(EngineValueError):
        MultivariateImputer(use_gram=True, regressor=Other())
    # auto rule: subclass → materialized
    assert MultivariateImputer(regressor=Other()).use_gram is False
    assert MultivariateImputer().use_gram is True


def test_gram_avoids_refits_on_many_columns():
    """The reason M12 exists: many patterns share training rows, and the
    fast path solves them from shared Grams instead of refitting the
    ridge per training group. Asserted via the ALGORITHMIC proxy (count
    of FastRidge.fit calls — zero on the fast path unless optimask
    fallback fires) rather than wall clock: this VM has ±20% run-to-run
    variance and throttles, so a timing ordering is flaky by
    construction. A loose 1.5x wall bound stays as a smoke guard.
    (Reference quotes ~28x FLOP reduction, _gram.py:1-22.)"""
    from unittest import mock

    from datafiller_spark.kernels.ridge import FastRidge

    x = _mar(seed=5, shape=(20000, 30), ratio=0.03)
    cols = list(range(4))

    fits = {"gram": 0, "mat": 0}
    real_fit = FastRidge.fit

    def counting_fit(self, X, y, _key=None):
        fits[_key] += 1
        return real_fit(self, X=X, y=y)

    with mock.patch.object(FastRidge, "fit", lambda self, X, y: counting_fit(self, X, y, "gram")):
        t0 = time.time()
        got_gram = MultivariateImputer(use_gram=True)(x.copy(), cols_to_impute=cols)
        t_gram = time.time() - t0
    with mock.patch.object(FastRidge, "fit", lambda self, X, y: counting_fit(self, X, y, "mat")):
        t0 = time.time()
        got_mat = MultivariateImputer(use_gram=False)(x.copy(), cols_to_impute=cols)
        t_mat = time.time() - t0

    # the materialized path refits once per training group; the fast path
    # solves those same groups from shared Grams (fit only on optimask
    # fallbacks, rare at 3% MAR with 20000 rows)
    assert fits["mat"] >= 4  # at least one refit per target column
    assert fits["gram"] <= fits["mat"] // 4

    # the materialized path Grams in float32 (FastRidge) while the fast
    # path accumulates float64; on a big ill-conditioned matrix the gap
    # reaches ~1e-3 — the reference's own cross-path tolerance
    # (tests/test_multivariate.py:388 uses rtol=1e-3, atol=1e-4)
    _spread_close(got_gram[:, cols], got_mat[:, cols], bound=1e-3)
    assert t_gram < 1.5 * t_mat, f"gram {t_gram:.2f}s vs materialized {t_mat:.2f}s"
