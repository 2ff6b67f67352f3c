"""MVT geometry command-stream codec (numpy-vectorized).

Decode reproduces vtzero's ``detail::geometry_decoder`` exactly
(/root/reference/include/vtzero/geometry.hpp:176-381), including error
messages, the ``count <= geometry_bytes/2`` over-allocation guard, the
ClosePath count==1 rule, int64 accumulation with int32 truncation, and
outer/inner/invalid ring classification by signed shoelace area
(geometry.hpp:120-123,161-169,346-375).

Encode reproduces the feature builders byte-for-byte
(/root/reference/include/vtzero/builder.hpp:587-1141): cursor
continuity across parts (the cursor is NOT reset between parts and is
NOT advanced by a ring's closing point), zero-length-segment and
ring-closure rejection, and the 0 < count < 2^29 bounds.

Only per-command Python loops remain; every parameter run is decoded /
encoded as a vectorized numpy slice (zigzag via bit ops, delta via
cumsum / diff).
"""

from __future__ import annotations

import numpy as np

from .errors import GeometryError
from .pbf import zigzag32_decode, zigzag32_encode

GEOM_UNKNOWN = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

RING_OUTER = 0
RING_INNER = 1
RING_INVALID = 2

CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE_PATH = 7

MAX_POINTS = (1 << 29) - 1  # builder.hpp:377-381 / geometry.hpp:116-118

_I64 = np.int64
_U32MASK = np.int64(0xFFFFFFFF)


def _trunc_i32(v64: np.ndarray) -> np.ndarray:
    """int64 -> int32 with modulo-2^32 wrap (geometry.hpp:266-269).

    Also used on encode-side deltas: the builder subtracts cursor from
    point in int32 arithmetic (builder.hpp:617-618), so deltas wrap."""
    w = v64 & _U32MASK
    return np.where(w >= np.int64(1) << np.int64(31), w - (np.int64(1) << np.int64(32)), w)


class _Cursor:
    """Sequential command-stream reader mirroring geometry_decoder."""

    __slots__ = ("cmds", "pos", "x", "y", "max_count")

    def __init__(self, cmds: np.ndarray, max_count: int) -> None:
        self.cmds = cmds
        self.pos = 0
        self.x = 0
        self.y = 0
        self.max_count = max_count

    def done(self) -> bool:
        return self.pos >= self.cmds.size

    def next_command(self, expected: int) -> int | None:
        """Returns count (or None at end-of-stream); geometry.hpp:218-248."""
        if self.done():
            return None
        ci = int(self.cmds[self.pos])
        cmd = ci & 0x7
        if cmd != expected:
            raise GeometryError(f"expected command {expected} but got {cmd}")
        count = ci >> 3
        if expected == CMD_CLOSE_PATH:
            # spec 4.3.3.3 "A ClosePath command MUST have a command count of 1"
            if count != 1:
                raise GeometryError("ClosePath command count is not 1")
        elif count > self.max_count:
            raise GeometryError("count too large")
        self.pos += 1
        return count

    def next_points(self, count: int) -> np.ndarray:
        """Vectorized run of ``count`` points -> (count, 2) int64 array."""
        need = 2 * count
        if self.pos + need > self.cmds.size:
            raise GeometryError("too few points in geometry")
        params = self.cmds[self.pos:self.pos + need]
        self.pos += need
        deltas = zigzag32_decode(params).reshape(count, 2)
        abs64 = np.cumsum(deltas, axis=0, dtype=_I64)
        abs64[:, 0] += self.x
        abs64[:, 1] += self.y
        pts = _trunc_i32(abs64)
        self.x = int(pts[-1, 0])
        self.y = int(pts[-1, 1])
        return pts


def decode_geometry(
    geom_type: int,
    cmds: np.ndarray,
    geometry_nbytes: int | None = None,
) -> tuple[list[np.ndarray], list[int] | None]:
    """Decode one geometry.

    ``geometry_nbytes`` is the byte length of the packed geometry field
    (the decoder's over-allocation guard is bytes/2 per
    geometry.hpp:397,415,433,450); defaults to 2*len(cmds) when the
    original wire length is unknown (e.g. freshly built int streams).

    Returns (parts, ring_types): parts is a list of (n,2) int32-valued
    arrays; ring_types is per-ring outer/inner/invalid for polygons,
    None otherwise. Polygons include the re-emitted closing point
    (geometry.hpp:373).
    """
    cmds = np.ascontiguousarray(cmds, dtype=np.int64) & _U32MASK
    if geometry_nbytes is None:
        geometry_nbytes = 2 * cmds.size
    cur = _Cursor(cmds, geometry_nbytes // 2)

    if geom_type == GEOM_POINT:
        count = cur.next_command(CMD_MOVE_TO)
        if count is None:
            # spec 4.3.4.2 "MUST consist of a single MoveTo command"
            raise GeometryError("expected MoveTo command (spec 4.3.4.2)")
        if count == 0:
            raise GeometryError("MoveTo command count is zero (spec 4.3.4.2)")
        pts = cur.next_points(count)
        if not cur.done():
            raise GeometryError("additional data after end of geometry (spec 4.3.4.2)")
        return [pts], None

    if geom_type == GEOM_LINESTRING:
        parts: list[np.ndarray] = []
        while True:
            count = cur.next_command(CMD_MOVE_TO)
            if count is None:
                break
            if count != 1:
                raise GeometryError("MoveTo command count is not 1 (spec 4.3.4.3)")
            first = cur.next_points(1)
            count = cur.next_command(CMD_LINE_TO)
            if count is None:
                raise GeometryError("expected LineTo command (spec 4.3.4.3)")
            if count == 0:
                raise GeometryError("LineTo command count is zero (spec 4.3.4.3)")
            rest = cur.next_points(count)
            parts.append(np.concatenate([first, rest], axis=0))
        return parts, None

    if geom_type == GEOM_POLYGON:
        rings: list[np.ndarray] = []
        ring_types: list[int] = []
        while True:
            count = cur.next_command(CMD_MOVE_TO)
            if count is None:
                break
            if count != 1:
                raise GeometryError("MoveTo command count is not 1 (spec 4.3.4.4)")
            start = cur.next_points(1)
            count = cur.next_command(CMD_LINE_TO)
            if count is None:
                raise GeometryError("expected LineTo command (spec 4.3.4.4)")
            # NB: vtzero does NOT reject LineTo count == 0 for polygons.
            mid = cur.next_points(count) if count else np.empty((0, 2), dtype=_I64)
            if cur.next_command(CMD_CLOSE_PATH) is None:
                raise GeometryError("expected ClosePath command (spec 4.3.4.4)")
            ring = np.concatenate([start, mid, start], axis=0)
            # signed shoelace sum over consecutive pairs incl. the closing
            # segment (geometry.hpp:346-375); int64-exact.
            a = ring[:-1]
            b = ring[1:]
            s = int(np.sum(a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1], dtype=_I64))
            ring_types.append(RING_OUTER if s > 0 else RING_INNER if s < 0 else RING_INVALID)
            rings.append(ring)
        return rings, ring_types

    raise GeometryError("unknown geometry type")


def ring_signed_area2(ring: np.ndarray) -> int:
    """Twice the signed shoelace area of a closed ring (int64-exact)."""
    ring = np.asarray(ring, dtype=_I64)
    a = ring[:-1]
    b = ring[1:]
    return int(np.sum(a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1], dtype=_I64))


# ------------------------------------------------------------------ encode

def _check_count(n: int, low: int, what: str) -> None:
    if not (low < n < (1 << 29)):
        raise GeometryError(f"{what} must have {low} < count < 2^29, got {n}")


def encode_point(points: np.ndarray) -> np.ndarray:
    """(Multi)point -> uint32 command stream (builder.hpp:609-755).

    One MoveTo(count) with zigzag deltas; duplicate consecutive points
    are allowed for points (the builder only rejects them for
    linestrings and rings).
    """
    pts = np.ascontiguousarray(points, dtype=_I64)
    n = pts.shape[0]
    _check_count(n, 0, "multipoint")
    deltas = _trunc_i32(np.diff(pts, axis=0, prepend=np.zeros((1, 2), dtype=_I64)))
    out = np.empty(1 + 2 * n, dtype=_I64)
    out[0] = (CMD_MOVE_TO & 0x7) | (n << 3)
    out[1:] = zigzag32_encode(deltas).reshape(-1)
    return out


def encode_linestring(parts: list[np.ndarray]) -> np.ndarray:
    """(Multi)linestring -> command stream (builder.hpp:778-928).

    Cursor carries across parts. Zero-length segments within a part
    raise GeometryError exactly like linestring_feature_builder's
    set_point (builder.hpp:850-852).
    """
    chunks: list[np.ndarray] = []
    cx, cy = 0, 0
    for part in parts:
        pts = np.ascontiguousarray(part, dtype=_I64)
        n = pts.shape[0]
        _check_count(n, 1, "linestring")
        deltas = _trunc_i32(np.diff(pts, axis=0, prepend=np.array([[cx, cy]], dtype=_I64)))
        if bool(np.any((deltas[1:, 0] == 0) & (deltas[1:, 1] == 0))):
            raise GeometryError("Zero-length segments in linestrings are not allowed.")
        zz = zigzag32_encode(deltas)
        chunk = np.empty(2 + 2 * n, dtype=_I64)
        chunk[0] = (CMD_MOVE_TO & 0x7) | (1 << 3)
        chunk[1:3] = zz[0]
        chunk[3] = (CMD_LINE_TO & 0x7) | ((n - 1) << 3)
        chunk[4:] = zz[1:].reshape(-1)
        chunks.append(chunk)
        cx, cy = int(pts[-1, 0]), int(pts[-1, 1])
    return np.concatenate(chunks) if chunks else np.empty(0, dtype=_I64)


def encode_polygon(rings: list[np.ndarray]) -> np.ndarray:
    """(Multi)polygon -> command stream (builder.hpp:951-1141).

    Each ring must include the closing point (last == first, else
    GeometryError), have > 3 points, and no zero-length segments. The
    closing point is emitted as ClosePath and does NOT advance the
    cursor (polygon_feature_builder::set_point's closing branch).
    """
    chunks: list[np.ndarray] = []
    cx, cy = 0, 0
    for ring in rings:
        pts = np.ascontiguousarray(ring, dtype=_I64)
        n = pts.shape[0]
        _check_count(n, 3, "ring")
        if int(pts[-1, 0]) != int(pts[0, 0]) or int(pts[-1, 1]) != int(pts[0, 1]):
            raise GeometryError("Last point in a ring must be the same as the first point.")
        body = pts[:-1]  # closing point becomes ClosePath
        deltas = _trunc_i32(np.diff(body, axis=0, prepend=np.array([[cx, cy]], dtype=_I64)))
        if bool(np.any((deltas[1:, 0] == 0) & (deltas[1:, 1] == 0))):
            raise GeometryError("Zero-length segments in rings are not allowed.")
        zz = zigzag32_encode(deltas)
        m = body.shape[0]  # == n - 1
        chunk = np.empty(3 + 2 * m, dtype=_I64)
        chunk[0] = (CMD_MOVE_TO & 0x7) | (1 << 3)
        chunk[1:3] = zz[0]
        chunk[3] = (CMD_LINE_TO & 0x7) | ((m - 1) << 3)
        chunk[4:2 + 2 * m] = zz[1:].reshape(-1)
        chunk[2 + 2 * m] = (CMD_CLOSE_PATH & 0x7) | (1 << 3)
        chunks.append(chunk)
        cx, cy = int(body[-1, 0]), int(body[-1, 1])
    return np.concatenate(chunks) if chunks else np.empty(0, dtype=_I64)


def encode_geometry(geom_type: int, parts: list[np.ndarray]) -> np.ndarray:
    if geom_type == GEOM_POINT:
        if len(parts) != 1:
            raise GeometryError("point geometry must have exactly one part")
        return encode_point(parts[0])
    if geom_type == GEOM_LINESTRING:
        return encode_linestring(parts)
    if geom_type == GEOM_POLYGON:
        return encode_polygon(parts)
    raise GeometryError("unknown geometry type")
