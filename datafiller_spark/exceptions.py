"""Engine exception hierarchy.

Mirrors the reference's ``DataFillerError`` ⊃ {ValueError, TypeError}
shape (reference: src/datafiller/exceptions.py:18-27) so error-path tests
translate one-to-one.
"""


class EngineError(Exception):
    """Base class for all engine errors."""


class EngineValueError(EngineError, ValueError):
    """Invalid value passed to an engine API."""


class EngineTypeError(EngineError, TypeError):
    """Invalid type passed to an engine API."""
