"""1:1 import-path mirror of ``datafiller.estimators``
(reference src/datafiller/estimators.py): the models live in
``kernels``."""

from .kernels import ExtremeLearningMachine, FastRidge  # noqa: F401

__all__ = ["FastRidge", "ExtremeLearningMachine"]
