"""ELM estimator tests (reference analogue: tests/test_estimators.py:52-97)."""

import numpy as np

from datafiller_spark.kernels.elm import ExtremeLearningMachine
from datafiller_spark.kernels import MultivariateImputer


def _data(seed=0, n=400, d=5):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1] ** 2 + 0.1 * rng.normal(size=n)
    return X, y


def test_reproducible_across_instances():
    X, y = _data()
    a = ExtremeLearningMachine(random_state=0).fit(X, y).predict(X[:50])
    b = ExtremeLearningMachine(random_state=0).fit(X, y).predict(X[:50])
    np.testing.assert_array_equal(a, b)


def test_learns_nonlinear_signal():
    X, y = _data()
    model = ExtremeLearningMachine(n_features=100, alpha=1.0).fit(X, y)
    resid = y - model.predict(X)
    assert np.abs(resid).mean() < np.abs(y - y.mean()).mean() * 0.6


def test_chunked_equals_single_shot():
    X, y = _data(n=2_000)
    import datafiller_spark.kernels.elm as elm_mod

    single = ExtremeLearningMachine(random_state=1).fit(X, y).predict(X[:100])
    old = elm_mod._CHUNK_ROWS
    try:
        elm_mod._CHUNK_ROWS = 256  # force the Gram path
        chunked = ExtremeLearningMachine(random_state=1).fit(X, y).predict(X[:100])
    finally:
        elm_mod._CHUNK_ROWS = old
    np.testing.assert_allclose(chunked, single, rtol=1e-3, atol=1e-3)


def test_hidden_width_caps_at_samples():
    X, y = _data(n=30)
    model = ExtremeLearningMachine(n_features=100, min_samples_per_feature=5).fit(X, y)
    assert model.n_features_used_ == 6


def test_varying_input_width_cached_projection():
    model = ExtremeLearningMachine(random_state=2)
    X1, y1 = _data(d=4)
    X2, y2 = _data(d=7)
    model.fit(X1, y1)
    model.fit(X2, y2)  # refit with another width must not raise
    model.fit(X1, y1)
    assert set(model._cache) == {4, 7}


def test_as_imputer_regressor():
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=300)
    x = np.column_stack([x0, np.sin(x0) * 2 + 1, -x0])
    holes = rng.random(300) < 0.1
    x_nan = x.copy()
    x_nan[holes, 1] = np.nan
    imp = MultivariateImputer(regressor=ExtremeLearningMachine(n_features=50), min_samples_train=20)
    out = imp(x_nan)
    assert not np.isnan(out).any()
    assert np.abs(out[holes, 1] - x[holes, 1]).mean() < 0.3
