"""FastRidge parity tests (reference analogue: tests/test_estimators.py:16-41)."""

import numpy as np
import pytest

from datafiller_spark.kernels import FastRidge, ridge_from_gram


def _ridge_closed_form(X, y, alpha, fit_intercept):
    """Float64 textbook solution used as the oracle."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if fit_intercept:
        mx, my = X.mean(axis=0), y.mean()
        Xc, yc = X - mx, y - my
        A = Xc.T @ Xc + alpha * np.eye(X.shape[1])
        coef = np.linalg.solve(A, Xc.T @ yc)
        return coef, my - mx @ coef
    A = X.T @ X + alpha * np.eye(X.shape[1])
    return np.linalg.solve(A, X.T @ y), 0.0


@pytest.mark.parametrize("fit_intercept", [True, False])
def test_fastridge_matches_closed_form(fit_intercept):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 6))
    beta = rng.normal(size=6)
    y = X @ beta + 3.0 + 0.01 * rng.normal(size=200)

    model = FastRidge(alpha=1e-2, fit_intercept=fit_intercept).fit(X, y)
    coef, intercept = _ridge_closed_form(X, y, 1e-2, fit_intercept)
    np.testing.assert_allclose(model.coef_, coef, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(model.intercept_, intercept, rtol=1e-3, atol=1e-3)

    preds = model.predict(X[:10])
    np.testing.assert_allclose(preds, X[:10] @ coef + intercept, rtol=1e-3, atol=1e-3)


def test_gram_path_equals_materialized_fit():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(80, 4)).astype(np.float32)
    y = (X @ np.array([1.0, -2.0, 0.5, 3.0]) + 1.5).astype(np.float32)

    Z = np.column_stack([X, y, np.ones(len(X), dtype=np.float32)]).astype(np.float64)
    gram = Z.T @ Z
    coef_g, intercept_g = ridge_from_gram(gram, len(X), alpha=1e-2, fit_intercept=True)

    model = FastRidge(alpha=1e-2, fit_intercept=True).fit(X, y)
    np.testing.assert_allclose(coef_g, model.coef_, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(intercept_g, model.intercept_, rtol=1e-3, atol=1e-3)


def test_deterministic_refit():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(50, 3))
    y = rng.normal(size=50)
    a = FastRidge().fit(X, y)
    b = FastRidge().fit(X, y)
    np.testing.assert_array_equal(a.coef_, b.coef_)
    assert a.intercept_ == b.intercept_
