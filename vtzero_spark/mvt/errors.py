"""Typed error hierarchy mirroring vtzero's exceptions.

Reference parity: /root/reference/include/vtzero/exception.hpp:28-130.
In the distributed engine these are raised only inside the codec; the
Spark operators convert them to status columns (one malformed feature
must not kill a task), while unit tests assert the exact class, as the
reference's catch2 suite does.
"""

from __future__ import annotations


class MVTError(Exception):
    """Base class for all codec errors (vtzero's ``exception``)."""


class FormatError(MVTError):
    """Ill-formed protobuf / spec violation (vtzero ``format_exception``)."""


class GeometryError(MVTError):
    """Invalid geometry command stream (vtzero ``geometry_exception``)."""


class TypeError_(MVTError):
    """Typed property-value accessor mismatch (vtzero ``type_exception``)."""


class VersionError(MVTError):
    """Layer version other than 1 or 2 (vtzero ``version_exception``)."""

    def __init__(self, version: int) -> None:
        super().__init__(f"unknown vector tile version: {version}")
        self.version = version


class OutOfRangeError(MVTError):
    """Dictionary index beyond table size (vtzero ``out_of_range_exception``)."""
