"""Exception hierarchy mirroring vtzero's error taxonomy.

Reference: /root/reference/include/vtzero/exception.hpp:28-130. Trigger
conditions and messages are kept comparable so conformance tests can assert
on them (e.g. "count too large", "ClosePath command count is not 1").
"""

from __future__ import annotations


class VtzeroError(Exception):
    """Base class for all errors raised by the engine's MVT core.

    Mirrors ``vtzero::exception`` (exception.hpp:28-44).
    """


class FormatError(VtzeroError):
    """Vector tile encoding invalid per the spec (exception.hpp:50-66)."""


class GeometryError(FormatError):
    """Geometry encoding invalid per the spec (exception.hpp:72-88)."""


class TypeError_(VtzeroError):
    """Property value accessed using the wrong type (exception.hpp:94-103)."""

    def __init__(self, message: str = "wrong property value type") -> None:
        super().__init__(message)


class VersionError(VtzeroError):
    """Unknown layer version (exception.hpp:109-118)."""

    def __init__(self, version: int) -> None:
        super().__init__(f"unknown vector tile version: {version}")
        self.version = version


class OutOfRangeError(VtzeroError):
    """Key/value table index out of range (exception.hpp:124-133)."""

    def __init__(self, index: int) -> None:
        super().__init__(f"index out of range: {index}")
        self.index = index
