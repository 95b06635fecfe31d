"""Pure-NumPy depth-4 CART (M16): the reference's categorical-target
classifier semantics without sklearn (reference imputer.py:206,657-670;
parity is behavioral — see kernels/cart.py docstring)."""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.exceptions import EngineValueError
from datafiller_spark.kernels import DecisionTreeClassifier, MultivariateImputer


def test_cart_learns_axis_aligned_rule():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(400, 3))
    y = (x[:, 1] > 0.3).astype(np.int64)
    clf = DecisionTreeClassifier(max_depth=4).fit(x, y)
    assert (clf.predict(x) == y).mean() >= 0.98  # one split suffices


def test_cart_is_deterministic_and_seed_independent():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(300, 4)).astype(np.float32)
    y = ((x[:, 0] > 0) ^ (x[:, 2] > 0.5)).astype(np.int64)  # needs depth 2
    p1 = DecisionTreeClassifier(max_depth=4, random_state=0).fit(x, y).predict(x)
    p2 = DecisionTreeClassifier(max_depth=4, random_state=123).fit(x, y).predict(x)
    assert np.array_equal(p1, p2)  # splits are deterministic by construction
    assert (p1 == y).mean() >= 0.95


def test_cart_depth_limit_and_pure_leaf():
    x = np.arange(32, dtype=np.float64).reshape(-1, 1)
    y = (np.arange(32) % 2).astype(np.int64)  # alternating: inseparable at depth 1
    shallow = DecisionTreeClassifier(max_depth=1).fit(x, y)
    deep = DecisionTreeClassifier(max_depth=6).fit(x, y)
    assert (shallow.predict(x) == y).mean() <= 0.6  # depth truly capped

    pure = DecisionTreeClassifier(max_depth=4).fit(x, np.zeros(32, dtype=np.int64))
    assert (pure.predict(x) == 0).all()
    assert pure._root.left is None  # pure node never splits
    assert deep.classes_.tolist() == [0, 1]


def test_cart_preserves_label_values_and_validates():
    x = np.array([[0.0], [1.0], [2.0], [3.0]])
    y = np.array([10.0, 10.0, 30.0, 30.0])  # float labels (codes)
    clf = DecisionTreeClassifier(max_depth=2).fit(x, y)
    assert set(clf.predict(x)) <= {10.0, 30.0}
    with pytest.raises(EngineValueError):
        DecisionTreeClassifier(max_depth=0)
    with pytest.raises(EngineValueError):
        DecisionTreeClassifier().fit(np.array([[np.nan]]), np.array([0]))
    with pytest.raises(EngineValueError):
        DecisionTreeClassifier().predict(x)


def test_imputer_uses_classifier_for_categorical_targets():
    """Categorical fills must come from the decision tree: a non-ordinal
    3-class categorical whose label is an XOR-ish function of two
    features defeats the old snap-ridge-codes stand-in but is exactly
    what a depth-2 tree separates."""
    rng = np.random.default_rng(13)
    n = 400
    a = rng.normal(size=n)
    b = rng.normal(size=n)
    # non-ordinal label layout: codes 0/1/2 are NOT monotone in (a, b)
    label = np.where(a > 0, np.where(b > 0, "x", "z"), np.where(b > 0, "z", "y"))
    df = pd.DataFrame({"a": a, "b": b, "c": pd.Categorical(label, categories=["x", "y", "z"])})
    missing = rng.choice(n, size=80, replace=False)
    df.loc[missing, "c"] = np.nan
    truth = label[missing]

    out = MultivariateImputer(min_samples_train=10)(df)
    acc = (out.loc[missing, "c"].astype(str).to_numpy() == truth).mean()
    assert acc >= 0.9

    # single-class shortcut: constant observed labels fill with that label
    df2 = pd.DataFrame(
        {
            "a": rng.normal(size=60),
            "c": pd.Categorical(["only"] * 60, categories=["only", "other"]),
        }
    )
    df2.loc[5:12, "c"] = np.nan
    out2 = MultivariateImputer(min_samples_train=5)(df2)
    assert (out2["c"].astype(str) == "only").all()


def test_numeric_columns_standardize_categoricals_do_not():
    """Reference imputer.py:883-896: only numeric main columns are
    standardized in the frame path — code/dummy columns feed the models
    raw, so classifier training sees integer codes."""
    captured = {}

    class SpyTree(DecisionTreeClassifier):
        def fit(self, X, y):
            captured["y"] = np.asarray(y)
            return super().fit(X, y)

    rng = np.random.default_rng(3)
    a = rng.normal(size=200) * 50 + 7
    label = np.where(a > 7, "hi", "lo")
    df = pd.DataFrame({"a": a, "c": pd.Categorical(label, categories=["lo", "hi"])})
    df.loc[rng.choice(200, 30, replace=False), "c"] = np.nan
    MultivariateImputer(min_samples_train=10, classifier=SpyTree(max_depth=4))(df)
    assert set(np.unique(captured["y"])) <= {0, 1}  # raw codes, not standardized
