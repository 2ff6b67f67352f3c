"""The mapbox/mvt-fixtures corpus (58 numbered cases) reproduced as
pytest parametrizations, per BASELINE.json north_star.

The fixture submodule is not vendored in the reference checkout, so
each tile is synthesized here from the behavior documented in
/root/reference/test/fixture_tests.cpp:157-1020 (cited per case).
Case numbers 028/029/031 do not exist in the reference's suite (it
skips them too). Valid cases assert exact decoded geometry /
properties; invalid cases assert the exact error class the reference
asserts (format/geometry/version/out-of-range/type), mapped to our
error taxonomy in vtzero_spark.mvt.errors.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtzero_spark.mvt import geometry as G
from vtzero_spark.mvt import pbf
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V
from vtzero_spark.mvt.errors import (
    FormatError,
    GeometryError,
    OutOfRangeError,
    TypeError_,
    VersionError,
)


def _u64(vals) -> np.ndarray:
    return np.array(vals, dtype=np.uint64)


def feat(fid=None, gtype=None, geom=None, tags=None, extra=b"") -> bytes:
    parts = []
    if fid is not None:
        parts.append(pbf.varint_field(T.FEATURE_ID, fid))
    if tags is not None:
        payload = tags if isinstance(tags, bytes) else pbf.encode_varint_array(_u64(tags))
        parts.append(pbf.len_field(T.FEATURE_TAGS, payload))
    if gtype is not None:
        parts.append(pbf.varint_field(T.FEATURE_TYPE, gtype))
    if geom is not None:
        parts.append(pbf.len_field(T.FEATURE_GEOMETRY, pbf.encode_varint_array(_u64(geom))))
    return b"".join(parts) + extra


def layer(name=b"hello", version=2, extent=4096, feats=(), keys=(), values=(),
          extra=b"") -> bytes:
    parts = []
    if version is not None:
        parts.append(pbf.varint_field(T.LAYER_VERSION, version))
    if name is not None:
        parts.append(pbf.len_field(T.LAYER_NAME, name))
    if extent is not None:
        parts.append(pbf.varint_field(T.LAYER_EXTENT, extent))
    parts.extend(pbf.len_field(T.LAYER_FEATURES, f) for f in feats)
    parts.extend(pbf.len_field(T.LAYER_KEYS, k) for k in keys)
    parts.extend(pbf.len_field(T.LAYER_VALUES, v) for v in values)
    return b"".join(parts) + extra


def tile(*layers: bytes) -> bytes:
    return b"".join(pbf.len_field(T.TILE_LAYERS, lb) for lb in layers)


POINT_25_17 = [9, 50, 34]  # fixture 002/017 geometry
LINE_2_2 = [9, 4, 4, 18, 0, 16, 16, 0]  # fixture 018


def check_layer(buf: bytes) -> tuple[T.Layer, T.Feature]:
    """Mirror of the reference's check_layer (fixture_tests.cpp:40-52)."""
    layers = T.parse_tile(buf)
    assert len(layers) == 1
    ly = layers[0]
    assert ly.name == "hello"
    assert ly.version == 2
    assert ly.extent == 4096
    assert len(ly.features) == 1
    return ly, ly.features[0]


def decode(f: T.Feature):
    return G.decode_geometry(f.geom_type, f.geometry, f.geometry_nbytes)


# --------------------------------------------------------------- 001-016

def test_mvt_001_empty_tile():
    assert T.count_layers(b"") == 0
    assert T.parse_tile(b"") == []


def test_mvt_002_single_point_no_id():
    buf = tile(layer(feats=[feat(gtype=1, geom=POINT_25_17)]))
    _, f = check_layer(buf)
    assert f.id is None  # !has_id(); id() == 0 default
    assert f.geom_type == G.GEOM_POINT
    parts, _ = decode(f)
    assert parts[0].tolist() == [[25, 17]]


def test_mvt_003_missing_geometry_type():
    buf = tile(layer(feats=[feat(fid=1, geom=POINT_25_17)]))
    _, f = check_layer(buf)
    assert f.id == 1
    assert f.geom_type == G.GEOM_UNKNOWN


def test_mvt_004_missing_geometry():
    buf = tile(layer(feats=[feat(fid=1, gtype=1)]))
    with pytest.raises(FormatError):
        T.parse_tile(buf)


def test_mvt_005_broken_tags_array():
    buf = tile(layer(feats=[feat(gtype=1, geom=POINT_25_17, tags=[1, 2, 3])],
                     keys=[b"k"], values=[V.encode_value(V.VT_INT, 1)]))
    with pytest.raises(FormatError):
        T.parse_tile(buf)


def test_mvt_006_invalid_geomtype():
    buf = tile(layer(feats=[feat(gtype=4, geom=POINT_25_17)]))
    with pytest.raises(FormatError):
        T.parse_tile(buf)


def test_mvt_007_version_as_string():
    lb = pbf.len_field(T.LAYER_VERSION, b"2") + pbf.len_field(T.LAYER_NAME, b"hello")
    with pytest.raises(FormatError):
        T.parse_tile(tile(lb))


def test_mvt_008_extent_as_string():
    lb = (pbf.varint_field(T.LAYER_VERSION, 2)
          + pbf.len_field(T.LAYER_NAME, b"hello")
          + pbf.len_field(T.LAYER_EXTENT, b"4096"))
    with pytest.raises(FormatError):
        T.parse_tile(tile(lb))


def test_mvt_009_extent_missing_defaults_4096():
    buf = tile(layer(extent=None, feats=[feat(fid=1, gtype=1, geom=POINT_25_17)]))
    ly = T.parse_tile(buf)[0]
    assert ly.name == "hello" and ly.version == 2 and ly.extent == 4096
    assert ly.features[0].id == 1


def test_mvt_010_value_int_pretending_string():
    # value message: field 1 (string) with varint wire type
    bad = bytes([0x08]) + pbf.encode_varint(6)
    buf = tile(layer(feats=[feat(gtype=1, geom=POINT_25_17)], values=[bad]))
    ly = T.parse_tile(buf)[0]
    with pytest.raises(FormatError):
        V.value_type(ly.value(0))


def test_mvt_011_value_unknown_type():
    bad = bytes([(8 << 3) | 0, 1])  # field 8 varint
    buf = tile(layer(feats=[feat(gtype=1, geom=POINT_25_17)], values=[bad]))
    ly = T.parse_tile(buf)[0]
    with pytest.raises(FormatError):
        V.value_type(ly.value(0))


def test_mvt_012_unknown_layer_version():
    buf = tile(layer(version=3, feats=[feat(gtype=1, geom=POINT_25_17)]))
    with pytest.raises(VersionError):
        T.parse_tile(buf)


def test_mvt_013_key_encoded_as_int():
    lb = (pbf.varint_field(T.LAYER_VERSION, 2)
          + pbf.len_field(T.LAYER_NAME, b"hello")
          + pbf.varint_field(T.LAYER_KEYS, 77))
    with pytest.raises(FormatError):
        T.parse_tile(tile(lb))


def test_mvt_014_layer_without_name():
    buf = tile(layer(name=None, feats=[feat(gtype=1, geom=POINT_25_17)]))
    with pytest.raises(FormatError):
        T.parse_tile(buf)


def test_mvt_015_two_layers_same_name():
    lb = layer(feats=[feat(gtype=1, geom=POINT_25_17)])
    buf = tile(lb, lb)
    views = T.tile_layer_views(buf)
    assert len(views) == 2
    assert [T.layer_name_only(v) for v in views] == ["hello", "hello"]
    # get_layer_by_name: first match wins (vector_tile.hpp:214-271)
    first = next(v for v in views if T.layer_name_only(v) == "hello")
    assert first == views[0]


def test_mvt_016_valid_unknown_geometry():
    buf = tile(layer(feats=[feat(fid=1, gtype=0, geom=POINT_25_17)]))
    _, f = check_layer(buf)
    assert f.geom_type == G.GEOM_UNKNOWN
    with pytest.raises(GeometryError):
        decode(f)


# --------------------------------------------------------------- 017-022

def test_mvt_017_valid_point():
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17)]))
    _, f = check_layer(buf)
    assert f.id == 1
    parts, _ = decode(f)
    assert parts[0].tolist() == [[25, 17]]


def test_mvt_018_valid_linestring():
    buf = tile(layer(feats=[feat(fid=1, gtype=2, geom=LINE_2_2)]))
    _, f = check_layer(buf)
    parts, _ = decode(f)
    assert [p.tolist() for p in parts] == [[[2, 2], [2, 10], [10, 10]]]


def test_mvt_019_valid_polygon():
    buf = tile(layer(feats=[feat(fid=1, gtype=3,
                                 geom=[9, 6, 12, 18, 10, 12, 24, 44, 15])]))
    _, f = check_layer(buf)
    parts, rings = decode(f)
    assert [p.tolist() for p in parts] == [[[3, 6], [8, 12], [20, 34], [3, 6]]]
    assert rings is not None and len(rings) == 1


def test_mvt_020_valid_multipoint():
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=[17, 10, 14, 3, 9])]))
    _, f = check_layer(buf)
    parts, _ = decode(f)
    assert parts[0].tolist() == [[5, 7], [3, 2]]


def test_mvt_021_valid_multilinestring():
    geom = [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]
    buf = tile(layer(feats=[feat(fid=1, gtype=2, geom=geom)]))
    _, f = check_layer(buf)
    parts, _ = decode(f)
    assert [p.tolist() for p in parts] == [
        [[2, 2], [2, 10], [10, 10]], [[1, 1], [3, 5]]]


def test_mvt_022_valid_multipolygon():
    rings_in = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]),
        np.array([[11, 11], [20, 11], [20, 20], [11, 20], [11, 11]]),
        np.array([[13, 13], [13, 17], [17, 17], [17, 13], [13, 13]]),
    ]
    geom = G.encode_polygon(rings_in)
    buf = tile(layer(feats=[feat(fid=1, gtype=3, geom=geom)]))
    _, f = check_layer(buf)
    parts, ring_types = decode(f)
    assert [p.tolist() for p in parts] == [r.tolist() for r in rings_in]
    # rings 1-2 outer (+area), ring 3 inner (-area) per y-down shoelace
    assert ring_types == [G.RING_OUTER, G.RING_OUTER, G.RING_INNER]


# --------------------------------------------------------------- 023-031

def test_mvt_023_missing_layer_name():
    buf = tile(layer(name=None, feats=[feat(gtype=1, geom=POINT_25_17)]))
    with pytest.raises(FormatError):
        T.parse_tile(buf)
    with pytest.raises(FormatError):
        T.layer_name_only(T.tile_layer_views(buf)[0])


def test_mvt_024_missing_version_defaults_1():
    buf = tile(layer(version=None, feats=[feat(fid=1, gtype=1, geom=POINT_25_17)]))
    assert T.parse_tile(buf)[0].version == 1


def test_mvt_025_layer_without_features():
    buf = tile(layer())
    ly = T.parse_tile(buf)[0]
    assert ly.features == []


def test_mvt_026_extra_value_type():
    bad = bytes([(9 << 3) | 5]) + b"\x00\x00\x00\x00"  # field 9, fixed32
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17)], values=[bad]))
    ly = T.parse_tile(buf)[0]
    assert len(ly.features) == 1
    assert ly.features[0].num_properties == 0
    assert len(ly.values) == 1
    with pytest.raises(FormatError):
        V.value_type(ly.value(0))


def test_mvt_027_unused_bool_value():
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17)],
                     values=[V.encode_value(V.VT_BOOL, True)]))
    ly = T.parse_tile(buf)[0]
    assert ly.features[0].num_properties == 0
    assert V.typed_accessor(ly.value(0), V.VT_BOOL) is True


def test_mvt_030_two_geometry_fields():
    g = pbf.len_field(T.FEATURE_GEOMETRY, pbf.encode_varint_array(_u64(POINT_25_17)))
    fb = pbf.varint_field(T.FEATURE_TYPE, 1) + g + g
    buf = tile(layer(feats=[fb]))
    with pytest.raises(FormatError):
        T.parse_tile(buf)


# --------------------------------------------------------------- 032-043

def _single_prop_tile(value_bytes: bytes) -> bytes:
    return tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17, tags=[0, 0])],
                      keys=[b"key1"], values=[value_bytes]))


def test_mvt_032_string_property():
    buf = _single_prop_tile(V.encode_value(V.VT_STRING, "i am a string value"))
    ly, f = check_layer(buf)
    props = ly.properties(f)
    assert props == [(b"key1", V.encode_value(V.VT_STRING, "i am a string value"))]
    assert V.typed_accessor(props[0][1], V.VT_STRING) == "i am a string value"
    assert f.tags.tolist() == [0, 0]


def test_mvt_033_float_property():
    buf = _single_prop_tile(V.encode_value(V.VT_FLOAT, 3.1))
    ly, f = check_layer(buf)
    assert V.typed_accessor(ly.properties(f)[0][1], V.VT_FLOAT) == pytest.approx(3.1)


def test_mvt_034_double_property():
    buf = _single_prop_tile(V.encode_value(V.VT_DOUBLE, 1.23))
    ly, f = check_layer(buf)
    assert V.typed_accessor(ly.properties(f)[0][1], V.VT_DOUBLE) == pytest.approx(1.23)


def test_mvt_035_int_property():
    buf = _single_prop_tile(V.encode_value(V.VT_INT, 6))
    ly, f = check_layer(buf)
    assert V.typed_accessor(ly.properties(f)[0][1], V.VT_INT) == 6


def test_mvt_036_uint_property():
    buf = _single_prop_tile(V.encode_value(V.VT_UINT, 87948))
    ly, f = check_layer(buf)
    assert V.typed_accessor(ly.properties(f)[0][1], V.VT_UINT) == 87948


def test_mvt_037_sint_property():
    buf = _single_prop_tile(V.encode_value(V.VT_SINT, 87948))
    ly, f = check_layer(buf)
    assert V.typed_accessor(ly.properties(f)[0][1], V.VT_SINT) == 87948


def test_mvt_038_all_value_types():
    vals = [
        V.encode_value(V.VT_STRING, "ello"),
        V.encode_value(V.VT_BOOL, True),
        V.encode_value(V.VT_INT, 6),
        V.encode_value(V.VT_DOUBLE, 1.23),
        V.encode_value(V.VT_FLOAT, 3.1),
        V.encode_value(V.VT_SINT, -87948),
        V.encode_value(V.VT_UINT, 87948),
    ]
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17)], values=vals))
    ly = T.parse_tile(buf)[0]
    assert len(ly.values) == 7
    assert V.typed_accessor(ly.value(0), V.VT_STRING) == "ello"
    assert V.typed_accessor(ly.value(1), V.VT_BOOL) is True
    assert V.typed_accessor(ly.value(2), V.VT_INT) == 6
    assert V.typed_accessor(ly.value(3), V.VT_DOUBLE) == pytest.approx(1.23)
    assert V.typed_accessor(ly.value(4), V.VT_FLOAT) == pytest.approx(3.1)
    assert V.typed_accessor(ly.value(5), V.VT_SINT) == -87948
    assert V.typed_accessor(ly.value(6), V.VT_UINT) == 87948
    for want in (V.VT_BOOL, V.VT_INT, V.VT_DOUBLE, V.VT_FLOAT, V.VT_SINT, V.VT_UINT):
        with pytest.raises(TypeError_):
            V.typed_accessor(ly.value(0), want)
    with pytest.raises(TypeError_):
        V.typed_accessor(ly.value(1), V.VT_STRING)


def test_mvt_039_defaults_explicitly_encoded():
    buf = tile(layer(version=1, feats=[feat(fid=0, gtype=0, geom=POINT_25_17)]))
    ly = T.parse_tile(buf)[0]
    assert ly.version == 1 and ly.extent == 4096 and ly.name == "hello"
    f = ly.features[0]
    assert f.id == 0
    assert f.geom_type == G.GEOM_UNKNOWN
    assert f.num_properties == 0
    with pytest.raises(GeometryError):
        decode(f)


def test_mvt_040_dangling_key_index():
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17, tags=[1, 0])],
                     keys=[b"key1"], values=[V.encode_value(V.VT_STRING, "v")]))
    ly = T.parse_tile(buf)[0]
    f = ly.features[0]
    assert f.num_properties == 1
    with pytest.raises(OutOfRangeError):
        ly.properties(f)


def test_mvt_041_tags_encoded_as_floats():
    float_tags = struct.pack("<ff", 1.5, 1.5)  # decodes to 6 varints with huge indexes
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17, tags=float_tags)],
                     keys=[b"key1"], values=[V.encode_value(V.VT_STRING, "v")]))
    ly = T.parse_tile(buf)[0]
    with pytest.raises(OutOfRangeError):
        ly.properties(ly.features[0])


def test_mvt_042_dangling_value_index():
    buf = tile(layer(feats=[feat(fid=1, gtype=1, geom=POINT_25_17, tags=[0, 1])],
                     keys=[b"key1"], values=[V.encode_value(V.VT_STRING, "v")]))
    ly = T.parse_tile(buf)[0]
    f = ly.features[0]
    assert f.num_properties == 1
    with pytest.raises(OutOfRangeError):
        ly.properties(f)


def test_mvt_043_shared_key_unique_values():
    names = ["swing", "water_fountain", "slide", "bench", "tree", "fountain"]
    feats = [feat(fid=i + 1, gtype=1, geom=POINT_25_17, tags=[0, i])
             for i in range(6)]
    buf = tile(layer(feats=feats, keys=[b"poi"],
                     values=[V.encode_value(V.VT_STRING, s) for s in names]))
    ly = T.parse_tile(buf)[0]
    assert len(ly.features) == 6
    p0 = ly.properties(ly.features[0])[0]
    assert p0[0] == b"poi" and V.typed_accessor(p0[1], V.VT_STRING) == "swing"
    p1 = ly.properties(ly.features[1])[0]
    assert p1[0] == b"poi" and V.typed_accessor(p1[1], V.VT_STRING) == "water_fountain"


# --------------------------------------------------------------- 044-058

def _geom_case(gtype: int, geom: list[int]) -> T.Feature:
    buf = tile(layer(feats=[feat(fid=1, gtype=gtype, geom=geom)]))
    return T.parse_tile(buf)[0].features[0]


def test_mvt_044_geometry_starts_with_closepath():
    f = _geom_case(3, [15, 9, 6, 12])
    with pytest.raises(GeometryError):
        decode(f)


def test_mvt_045_point_with_half_coordinates():
    f = _geom_case(1, [9, 50])
    with pytest.raises(GeometryError, match="too few points in geometry"):
        decode(f)


def test_mvt_046_duplicate_linestring_points_decode_ok():
    f = _geom_case(2, [9, 4, 4, 18, 0, 16, 0, 0])
    parts, _ = decode(f)
    assert [p.tolist() for p in parts] == [[[2, 2], [2, 10], [2, 10]]]


def test_mvt_047_closepath_count_2():
    f = _geom_case(3, [9, 6, 12, 18, 10, 12, 24, 44, (2 << 3) | 7])
    with pytest.raises(GeometryError, match="ClosePath command count is not 1"):
        decode(f)


def test_mvt_048_closepath_count_0():
    f = _geom_case(3, [9, 6, 12, 18, 10, 12, 24, 44, 7])
    with pytest.raises(GeometryError, match="ClosePath command count is not 1"):
        decode(f)


def test_mvt_049_int32_overflow_x():
    zz = pbf.zigzag32_encode
    f = _geom_case(2, [9, zz(2**31 - 1), 0, 10, zz(1), zz(1)])
    parts, _ = decode(f)
    assert parts[0].tolist() == [[2**31 - 1, 0], [-(2**31), 1]]


def test_mvt_050_int32_overflow_y():
    zz = pbf.zigzag32_encode
    f = _geom_case(2, [9, 0, zz(-(2**31)), 10, zz(-1), zz(-1)])
    parts, _ = decode(f)
    assert parts[0].tolist() == [[0, -(2**31)], [-1, 2**31 - 1]]


def test_mvt_051_multipoint_huge_count():
    f = _geom_case(1, [(10000 << 3) | 1, 50, 34])
    with pytest.raises(GeometryError, match="count too large"):
        decode(f)


def test_mvt_052_multipoint_not_enough_points():
    f = _geom_case(1, [17, 10, 14])
    with pytest.raises(GeometryError):
        decode(f)


@pytest.mark.parametrize(
    "case,ring",
    [
        ("053_exact_extent", [[0, 0], [4096, 0], [4096, 4096], [0, 4096], [0, 0]]),
        ("054_one_unit_buffer", [[-1, -1], [4097, -1], [4097, 4097], [-1, 4097], [-1, -1]]),
        ("055_minus_one_unit", [[1, 1], [4095, 1], [4095, 4095], [1, 4095], [1, 1]]),
        ("056_large_buffer", [[-200, -200], [4296, -200], [4296, 4296], [-200, 4296], [-200, -200]]),
    ],
)
def test_mvt_053_to_056_clipped_squares(case, ring):
    geom = G.encode_polygon([np.array(ring, dtype=np.int64)])
    f = _geom_case(3, geom.tolist())
    parts, ring_types = decode(f)
    assert parts[0].tolist() == ring
    assert ring_types == [G.RING_OUTER]


def test_mvt_057_gigantic_moveto():
    f = _geom_case(1, [((1 << 29) - 1) << 3 | 1, 50, 34])
    with pytest.raises(GeometryError, match="count too large"):
        decode(f)


def test_mvt_058_gigantic_lineto():
    f = _geom_case(2, [9, 4, 4, (((1 << 29) - 1) << 3) | 2, 0, 16])
    with pytest.raises(GeometryError, match="count too large"):
        decode(f)
