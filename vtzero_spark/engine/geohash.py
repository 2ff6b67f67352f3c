"""Geohash — the base32 interleaved cell index, fourth of the cell
families here (quadkey `cells.py`, Hilbert `hilbert.py`, hex
`hexcells.py`).

The public standard (Niemeyer 2008; Elasticsearch/Redis/PostGIS all
serve it): a cell id is the bitwise interleave of the longitude and
latitude binary fractions — longitude takes the even bit positions
counting from the most significant — grouped into 5-bit digits of the
alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.  On this engine's
integer world grid the binary fractions are EXACT: a world coordinate
``w`` in [0, 2^wbits) IS the fraction ``w / 2^wbits``, so the first
``k`` geohash bits of an axis are just ``w >> (wbits - k)`` — no
floats, no rounding, and the law transfers verbatim to SQL.

Axis convention (documented, test-pinned): ``x`` is the longitude
fraction and ``y`` the latitude fraction of the world square, both
increasing — the same y-up convention the Web Mercator boundary
(``mercator.py``) uses before the tile-grid flip.

Scale shape: the encode is a fixed chain of shifts/masks/concat in
whole-stage codegen (precision <= 6 on the 16-bit world grid — 30
bits), zero Python, zero shuffle; the DuckDB twin is generated from
the SAME bit loop, so the cross-engine pin covers every bit position.
Prefix nesting (the property geohash exists for: the P-1-char prefix
names the parent cell) holds exactly and is pinned.

Reference analog: none — vtzero is the codec underneath (SURVEY §2);
geohash is the interchange cell id a feature-store speaks with
non-tile systems.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _check(precision: int, wbits: int) -> tuple[int, int, int]:
    if not 1 <= precision:
        raise ValueError(f"precision must be >= 1, got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    if max(lon_bits, lat_bits) > wbits:
        raise ValueError(
            f"precision {precision} needs {lon_bits} axis bits but the "
            f"world grid carries only {wbits}")
    return total, lon_bits, lat_bits


def _interleave_terms(x: str, y: str, precision: int,
                      wbits: int) -> list[str]:
    """The shared bit loop: SQL-syntax term per interleaved bit —
    consumed by BOTH the Spark column (F.expr) and the DuckDB twin,
    so the two engines cannot drift."""
    total, lon_bits, lat_bits = _check(precision, wbits)
    terms = []
    li = la = 0
    for k in range(total):
        if k % 2 == 0:  # even positions (from MSB): longitude
            src, bit = x, wbits - 1 - li
            li += 1
        else:
            src, bit = y, wbits - 1 - la
            la += 1
        shift = total - 1 - k
        terms.append(f"((({src} >> {bit}) & 1) << {shift})")
    return terms


def geohash_col(x_col: str, y_col: str, precision: int = 4,
                wbits: int = 16) -> Column:
    """Base32 geohash string of an integer world-grid point — one
    pure-JVM expression (shift/mask interleave + per-digit substr)."""
    total = _check(precision, wbits)[0]
    code = " + ".join(_interleave_terms(x_col, y_col, precision, wbits))
    digits = [
        f"substr('{BASE32}', CAST((({code}) >> {total - 5 * (i + 1)}) "
        f"& 31 AS INT) + 1, 1)"
        for i in range(precision)
    ]
    return F.expr("concat(" + ", ".join(digits) + ")")


def geohash_sql(x_col: str, y_col: str, precision: int = 4,
                wbits: int = 16) -> str:
    """DuckDB twin — generated from the SAME bit loop as the Spark
    column (``_interleave_terms``), digit extraction included."""
    total = _check(precision, wbits)[0]
    code = " + ".join(_interleave_terms(x_col, y_col, precision, wbits))
    digits = [
        f"substr('{BASE32}', CAST((({code}) >> {total - 5 * (i + 1)}) "
        f"& 31 AS INT) + 1, 1)"
        for i in range(precision)
    ]
    return "concat(" + ", ".join(digits) + ")"


def geohash_decode(gh: str, wbits: int = 16) -> tuple[int, int]:
    """Inverse (cell ANCHOR: the minimum world coordinate of the
    cell): base32 digits -> interleaved bits -> per-axis prefixes,
    left-shifted back to world scale.  Pure Python — the reference
    for the round-trip law."""
    total = 5 * len(gh)
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    if max(lon_bits, lat_bits) > wbits:
        raise ValueError(f"geohash '{gh}' is finer than the world grid")
    acc = 0
    for ch in gh:
        idx = BASE32.find(ch)
        if idx < 0:
            raise ValueError(f"invalid geohash character {ch!r}")
        acc = (acc << 5) | idx
    gx = gy = 0
    for k in range(total):
        bit = (acc >> (total - 1 - k)) & 1
        if k % 2 == 0:
            gx = (gx << 1) | bit
        else:
            gy = (gy << 1) | bit
    return gx << (wbits - lon_bits), gy << (wbits - lat_bits)
