"""1:1 import-path mirror of ``datafiller.datasets``
(reference src/datafiller/datasets/__init__.py): the loaders live in
``sources`` (local paths only — downloads are policy-excluded) and the
missing-data generators in ``sources.missing``."""

from .sources import (  # noqa: F401
    add_contiguous_missing,
    add_mar,
    load_pems_bay,
    load_titanic,
)

__all__ = ["load_titanic", "load_pems_bay", "add_mar", "add_contiguous_missing"]
