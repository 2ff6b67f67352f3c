"""Geometry codec unit tests.

Command-stream vectors and expected decodes/errors come from the
reference's unit suite (/root/reference/test/t/test_geometry*.cpp) and
the spec examples; error messages must match vtzero's exactly.
"""

import numpy as np
import pytest

from vtzero_spark.mvt.errors import GeometryError
from vtzero_spark.mvt.geometry import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    GEOM_UNKNOWN,
    RING_INNER,
    RING_INVALID,
    RING_OUTER,
    decode_geometry,
    encode_geometry,
    encode_linestring,
    encode_point,
    encode_polygon,
    ring_signed_area2,
)


def pts(*pairs):
    return np.array(pairs, dtype=np.int64)


def as_lists(parts):
    return [[(int(x), int(y)) for x, y in p] for p in parts]


# ----------------------------------------------------------------- decode

def test_decode_point_basic():
    # test_geometry.cpp:24-49 — {9,50,34} -> (25,17)
    parts, rt = decode_geometry(GEOM_POINT, np.array([9, 50, 34]))
    assert as_lists(parts) == [[(25, 17)]]
    assert rt is None


def test_decode_multipoint():
    # test_geometry.cpp:73-89 — {17,10,14,3,9} -> (5,7),(3,2)
    parts, _ = decode_geometry(GEOM_POINT, np.array([17, 10, 14, 3, 9]))
    assert as_lists(parts) == [[(5, 7), (3, 2)]]


def test_decode_linestring():
    # {9,4,4,18,0,16,16,0} -> (2,2),(2,10),(10,10)
    parts, _ = decode_geometry(GEOM_LINESTRING, np.array([9, 4, 4, 18, 0, 16, 16, 0]))
    assert as_lists(parts) == [[(2, 2), (2, 10), (10, 10)]]


def test_decode_multilinestring():
    cmds = np.array([9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8])
    parts, _ = decode_geometry(GEOM_LINESTRING, cmds)
    assert as_lists(parts) == [[(2, 2), (2, 10), (10, 10)], [(1, 1), (3, 5)]]


def test_decode_polygon_closing_point_and_area():
    # spec 4.3.5.3 example: triangle (3,6),(8,12),(20,34) closed
    cmds = np.array([9, 6, 12, 18, 10, 12, 24, 44, 15])
    parts, rt = decode_geometry(GEOM_POLYGON, cmds)
    assert as_lists(parts) == [[(3, 6), (8, 12), (20, 34), (3, 6)]]
    assert rt == [RING_OUTER]


def test_decode_multipolygon_ring_types():
    # fixture 022 expected: outer+outer+inner rings
    outer1 = pts((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))
    outer2 = pts((11, 11), (20, 11), (20, 20), (11, 20), (11, 11))
    inner = pts((13, 13), (13, 17), (17, 17), (17, 13), (13, 13))
    cmds = encode_polygon([outer1, outer2, inner])
    parts, rt = decode_geometry(GEOM_POLYGON, cmds)
    assert as_lists(parts) == [
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        [(11, 11), (20, 11), (20, 20), (11, 20), (11, 11)],
        [(13, 13), (13, 17), (17, 17), (17, 13), (13, 13)],
    ]
    # shoelace sign convention: y-down tile coords, CW = positive = outer
    assert rt[2] != rt[0]
    assert rt[0] == rt[1]


def test_decode_zero_area_ring_invalid():
    # test_geometry_polygon.cpp:212 — degenerate ring
    ring = pts((0, 0), (4, 4), (0, 0), (4, 4), (0, 0))
    # encode manually: zero-length segments are rejected by the encoder,
    # so build the command stream by hand: MoveTo(1) (0,0), LineTo(3), ClosePath
    cmds = np.array([9, 0, 0, 26, 8, 8, 7, 7, 8, 8, 15])
    parts, rt = decode_geometry(GEOM_POLYGON, cmds)
    assert rt == [RING_INVALID]
    assert ring_signed_area2(parts[0]) == 0


@pytest.mark.parametrize(
    "gtype,cmds,msg",
    [
        (GEOM_POINT, [], "expected MoveTo command (spec 4.3.4.2)"),
        (GEOM_POINT, [1], "MoveTo command count is zero (spec 4.3.4.2)"),
        # fixture 045: MoveTo with half a coordinate
        (GEOM_POINT, [9, 50], "too few points in geometry"),
        (GEOM_POINT, [17, 10, 14, 3, 9, 9, 0, 0], "additional data after end of geometry (spec 4.3.4.2)"),
        (GEOM_POINT, [18, 0, 0], "expected command 1 but got 2"),
        # fixture 044: geometry begins with ClosePath
        (GEOM_POINT, [15], "expected command 1 but got 7"),
        (GEOM_LINESTRING, [17, 0, 0, 0, 0], "MoveTo command count is not 1 (spec 4.3.4.3)"),
        (GEOM_LINESTRING, [9, 4, 4], "expected LineTo command (spec 4.3.4.3)"),
        (GEOM_LINESTRING, [9, 4, 4, 2], "LineTo command count is zero (spec 4.3.4.3)"),
        (GEOM_LINESTRING, [9, 4, 4, 9, 4, 4], "expected command 2 but got 1"),
        (GEOM_POLYGON, [17, 0, 0, 0, 0], "MoveTo command count is not 1 (spec 4.3.4.4)"),
        (GEOM_POLYGON, [9, 6, 12], "expected LineTo command (spec 4.3.4.4)"),
        (GEOM_POLYGON, [9, 6, 12, 18, 10, 12, 24, 44], "expected ClosePath command (spec 4.3.4.4)"),
        (GEOM_POLYGON, [9, 6, 12, 18, 10, 12, 24, 44, 18, 0, 0], "expected command 7 but got 2"),
        # fixture 047/048: ClosePath count != 1
        (GEOM_POLYGON, [9, 6, 12, 18, 10, 12, 24, 44, 23], "ClosePath command count is not 1"),
        (GEOM_POLYGON, [9, 6, 12, 18, 10, 12, 24, 44, 7], "ClosePath command count is not 1"),
        (GEOM_UNKNOWN, [9, 50, 34], "unknown geometry type"),
    ],
)
def test_decode_errors(gtype, cmds, msg):
    with pytest.raises(GeometryError) as ei:
        decode_geometry(gtype, np.array(cmds, dtype=np.int64))
    assert str(ei.value) == msg


def test_decode_count_too_large():
    # fixtures 051/057/058: huge count guarded by bytes/2
    huge = (1 << 20) << 3 | 1  # MoveTo with count 2^20
    with pytest.raises(GeometryError, match="count too large"):
        decode_geometry(GEOM_POINT, np.array([huge, 0, 0]), geometry_nbytes=6)


def test_decode_int32_overflow_truncates():
    # fixtures 049/050: int32 overflow is defined as truncation
    int32_max, int32_min = 2**31 - 1, -(2**31)
    cmds = encode_linestring([pts((int32_max, 0), (int32_min, 1))])
    parts, _ = decode_geometry(GEOM_LINESTRING, cmds)
    assert as_lists(parts) == [[(int32_max, 0), (int32_min, 1)]]
    cmds = encode_linestring([pts((0, int32_min), (-1, int32_max))])
    parts, _ = decode_geometry(GEOM_LINESTRING, cmds)
    assert as_lists(parts) == [[(0, int32_min), (-1, int32_max)]]


def test_decode_duplicate_linestring_points_accepted():
    # fixture 046: decoding accepts zero-length segments
    cmds = np.array([9, 4, 4, 18, 0, 16, 0, 0])
    parts, _ = decode_geometry(GEOM_LINESTRING, cmds)
    assert as_lists(parts) == [[(2, 2), (2, 10), (2, 10)]]


def test_decode_polygon_lineto_count_zero_allowed():
    # vtzero's decode_polygon has no count-zero check for LineTo
    cmds = np.array([9, 6, 12, 2, 15])
    parts, rt = decode_geometry(GEOM_POLYGON, cmds)
    assert as_lists(parts) == [[(3, 6), (3, 6)]]
    assert rt == [RING_INVALID]


# ----------------------------------------------------------------- encode

def test_encode_point_matches_spec_example():
    assert encode_point(pts((25, 17))).tolist() == [9, 50, 34]


def test_encode_multipoint():
    assert encode_point(pts((5, 7), (3, 2))).tolist() == [17, 10, 14, 3, 9]


def test_encode_multipoint_duplicate_points_allowed():
    cmds = encode_point(pts((5, 7), (5, 7)))
    parts, _ = decode_geometry(GEOM_POINT, cmds)
    assert as_lists(parts) == [[(5, 7), (5, 7)]]


def test_encode_linestring():
    cmds = encode_linestring([pts((2, 2), (2, 10), (10, 10))])
    assert cmds.tolist() == [9, 4, 4, 18, 0, 16, 16, 0]


def test_encode_multilinestring_cursor_continuity():
    cmds = encode_linestring([pts((2, 2), (2, 10), (10, 10)), pts((1, 1), (3, 5))])
    assert cmds.tolist() == [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]


def test_encode_polygon_spec_example():
    cmds = encode_polygon([pts((3, 6), (8, 12), (20, 34), (3, 6))])
    assert cmds.tolist() == [9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_encode_zero_length_segment_rejected():
    # builder.hpp:850-852
    with pytest.raises(GeometryError) as ei:
        encode_linestring([pts((2, 2), (2, 2), (10, 10))])
    assert str(ei.value) == "Zero-length segments in linestrings are not allowed."
    with pytest.raises(GeometryError) as ei:
        encode_polygon([pts((0, 0), (4, 0), (4, 0), (4, 4), (0, 0))])
    assert str(ei.value) == "Zero-length segments in rings are not allowed."


def test_encode_unclosed_ring_rejected():
    # builder.hpp:1027-1032
    with pytest.raises(GeometryError) as ei:
        encode_polygon([pts((0, 0), (4, 0), (4, 4), (1, 1))])
    assert str(ei.value) == "Last point in a ring must be the same as the first point."


def test_encode_count_bounds():
    with pytest.raises(GeometryError):
        encode_point(np.empty((0, 2), dtype=np.int64))
    with pytest.raises(GeometryError):
        encode_linestring([pts((0, 0))])
    with pytest.raises(GeometryError):
        encode_polygon([pts((0, 0), (1, 1), (0, 0))])  # count 3 not > 3


def test_roundtrip_fixpoint():
    rng = np.random.RandomState(42)
    for _ in range(50):
        n = int(rng.randint(2, 40))
        coords = np.cumsum(rng.randint(1, 50, size=(n, 2)), axis=0)
        cmds = encode_linestring([coords])
        parts, _ = decode_geometry(GEOM_LINESTRING, cmds)
        assert np.array_equal(parts[0], coords)
        cmds2 = encode_geometry(GEOM_LINESTRING, parts)
        assert np.array_equal(cmds, cmds2)


def test_multipolygon_next_ring_moveto_relative_to_last_lineto_point():
    # the cursor is NOT advanced by the ClosePath (closing point)
    r1 = pts((0, 0), (10, 0), (10, 10), (0, 0))
    r2 = pts((20, 20), (30, 20), (30, 30), (20, 20))
    cmds = encode_polygon([r1, r2])
    # after ring1, cursor is (10,10); MoveTo delta of ring2 = (10,10)
    parts, _ = decode_geometry(GEOM_POLYGON, cmds)
    assert as_lists(parts)[1] == [(20, 20), (30, 20), (30, 30), (20, 20)]
