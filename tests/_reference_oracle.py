"""Import the reference ``datafiller`` library as an in-process oracle.

The reference (/root/reference, Apache-2.0) hard-imports numba, sklearn
and tqdm at module load; none are installed in this environment. numba
is only a JIT accelerator — every ``@njit`` function is valid pure
Python — so a ~40-line shim (njit → identity decorator, prange → range,
type objects → dummies) makes the whole library importable and
slow-but-correct at test-fixture sizes. sklearn supplies mixin base
classes plus the categorical-target classifier (which our numeric
parity fixtures never exercise), and tqdm is a progress bar.

This gives the engine a REAL oracle for the model-based gap-fill path:
parity tests run the same frame through the reference's
``TimeSeriesImputer`` / ``MultivariateImputer`` and the engine's
kernels and assert equality (see tests/test_reference_parity.py).
"""

from __future__ import annotations

import importlib.machinery as _machinery
import importlib.metadata as _im
import sys
import types as _types


def _shim_module(name: str) -> _types.ModuleType:
    """A registered fake module with a real ModuleSpec, so that
    ``importlib.util.find_spec`` (used e.g. by pyspark.testing to probe
    for sklearn) sees a well-formed module instead of raising."""
    mod = _types.ModuleType(name)
    mod.__spec__ = _machinery.ModuleSpec(name, loader=None)
    return mod

_REFERENCE_SRC = "/root/reference/src"


class _Sig:
    """A constructed numba signature — inert, never called by the shim."""


class _Type:
    """Stands in for numba dtype objects (uint32, bool_, ...).

    Supports the two things signatures do with them: slicing
    (``uint32[:]`` → array type) and calling (``bool_(uint32[:])`` →
    signature; ``UniTuple(t, 2)(...)`` → signature via a nested call).
    """

    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return _Type()


def _njit(*args, **kwargs):
    if len(args) == 1 and isinstance(args[0], _types.FunctionType):
        return args[0]

    def deco(fn):
        return fn

    return deco


def _install_numba_shim() -> None:
    numba = _shim_module("numba")
    numba.njit = _njit
    numba.prange = range
    numba.get_num_threads = lambda: 1
    numba.bool_ = _Type()
    numba.uint32 = _Type()
    numba.uint64 = _Type()
    numba.int64 = _Type()
    numba.float32 = _Type()
    numba.float64 = _Type()
    types_mod = _shim_module("numba.types")
    types_mod.UniTuple = _Type()
    numba.types = types_mod
    sys.modules["numba"] = numba
    sys.modules["numba.types"] = types_mod


def _install_sklearn_shim() -> None:
    sklearn = _shim_module("sklearn")
    base = _shim_module("sklearn.base")

    class BaseEstimator:
        def get_params(self, deep: bool = True) -> dict:
            return dict(vars(self))

        def set_params(self, **params):
            for key, value in params.items():
                setattr(self, key, value)
            return self

    class RegressorMixin:
        pass

    class ClassifierMixin:
        pass

    class TransformerMixin:
        pass

    base.BaseEstimator = BaseEstimator
    base.RegressorMixin = RegressorMixin
    base.ClassifierMixin = ClassifierMixin
    base.TransformerMixin = TransformerMixin

    tree = _shim_module("sklearn.tree")

    class DecisionTreeClassifier:
        """Constructible placeholder; our numeric parity fixtures never
        hit the categorical-target path, so fit/predict must not run."""

        def __init__(self, **kwargs):
            self.kwargs = kwargs

        def fit(self, *args, **kwargs):  # pragma: no cover - guard
            raise NotImplementedError("sklearn is not installed; categorical targets unsupported")

        predict = fit

    tree.DecisionTreeClassifier = DecisionTreeClassifier

    sklearn.base = base
    sklearn.tree = tree
    sys.modules["sklearn"] = sklearn
    sys.modules["sklearn.base"] = base
    sys.modules["sklearn.tree"] = tree


def _install_tqdm_shim() -> None:
    tqdm_mod = _shim_module("tqdm")
    auto = _shim_module("tqdm.auto")

    def tqdm(iterable=None, *args, **kwargs):
        return iterable

    auto.tqdm = tqdm
    tqdm_mod.tqdm = tqdm
    tqdm_mod.auto = auto
    sys.modules["tqdm"] = tqdm_mod
    sys.modules["tqdm.auto"] = auto


def _patch_version_lookup() -> None:
    real_version = _im.version

    def version(name, *args, **kwargs):
        if name == "datafiller":
            return "0.3.3"
        return real_version(name, *args, **kwargs)

    _im.version = version


_reference = None


def load_reference():
    """Import and cache the reference datafiller package (shimmed)."""
    global _reference
    if _reference is not None:
        return _reference
    for mod, installer in (
        ("numba", _install_numba_shim),
        ("sklearn", _install_sklearn_shim),
        ("tqdm", _install_tqdm_shim),
    ):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                installer()
    _patch_version_lookup()
    if _REFERENCE_SRC not in sys.path:
        sys.path.insert(0, _REFERENCE_SRC)
    import datafiller  # noqa: PLC0415 - deliberate lazy import

    _reference = datafiller
    return _reference
