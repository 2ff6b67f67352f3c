"""Tile/layer/feature parse + build tests.

Mirrors the reference's strictness tests (fixture cases 001-031, 039-043)
and the byte-exact round-trip of test_builder.cpp:34-55 on the real
Mapbox Streets tile shipped with the reference checkout.
"""

import os

import numpy as np
import pytest

from vtzero_spark.mvt.errors import FormatError, OutOfRangeError, VersionError
from vtzero_spark.mvt.geometry import GEOM_POINT, decode_geometry, encode_point
from vtzero_spark.mvt.tile import (
    assemble_layer,
    build_feature,
    build_layer,
    build_tile,
    count_layers,
    is_vector_tile,
    layer_name_only,
    parse_feature,
    parse_layer,
    parse_tile,
    tile_layer_views,
)
from vtzero_spark.mvt.values import VT_STRING, decode_value, encode_value
from vtzero_spark.mvt.pbf import len_field, varint_field

REAL_TILE = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"


def single_point_layer(name="hello", fid=1, props=None, version=2, extent=4096):
    cmds = encode_point(np.array([[25, 17]]))
    return assemble_layer(name, [(fid, GEOM_POINT, cmds, props or [])],
                          version=version, extent=extent)


# ----------------------------------------------------------------- basics

def test_empty_tile():
    # fixture 001
    assert count_layers(b"") == 0
    assert parse_tile(b"") == []
    assert not is_vector_tile(b"")


def test_single_point_feature():
    # fixture 002/017 shape: layer "hello" v2 extent 4096, one point (25,17)
    tile = build_tile([single_point_layer()])
    assert is_vector_tile(tile)
    assert count_layers(tile) == 1
    layers = parse_tile(tile)
    layer = layers[0]
    assert (layer.name, layer.version, layer.extent) == ("hello", 2, 4096)
    assert len(layer.features) == 1
    f = layer.features[0]
    assert f.id == 1 and f.geom_type == GEOM_POINT
    parts, _ = decode_geometry(f.geom_type, f.geometry, f.geometry_nbytes)
    assert parts[0].tolist() == [[25, 17]]


def test_feature_without_id():
    # fixture 002: no id field -> has_id() false, id() == 0
    cmds = encode_point(np.array([[25, 17]]))
    blob = build_feature(None, GEOM_POINT, cmds)
    f = parse_feature(blob)
    assert f.id is None


def test_layer_defaults():
    # fixtures 009/024: missing extent -> 4096, missing version -> 1
    raw = len_field(1, b"hello") + len_field(
        2, build_feature(1, GEOM_POINT, encode_point(np.array([[25, 17]])))
    )
    layer = parse_layer(raw)
    assert layer.version == 1 and layer.extent == 4096


def test_unknown_layer_version():
    # fixture 012
    lb = build_layer("hello", [], [], [], version=3)
    with pytest.raises(VersionError):
        parse_layer(lb)


def test_layer_missing_name():
    # fixtures 014/023
    raw = varint_field(15, 2) + varint_field(5, 4096)
    with pytest.raises(FormatError, match="missing name field in layer"):
        parse_layer(raw)
    with pytest.raises(FormatError):
        layer_name_only(raw)


def test_layer_version_as_string_rejected():
    # fixture 007: version with wrong wire type -> unknown field -> format
    raw = len_field(15, b"2") + len_field(1, b"hello")
    with pytest.raises(FormatError, match="unknown field in layer"):
        parse_layer(raw)


def test_layer_extent_as_string_rejected():
    # fixture 008
    raw = varint_field(15, 2) + len_field(1, b"hello") + len_field(5, b"4096")
    with pytest.raises(FormatError, match="unknown field in layer"):
        parse_layer(raw)


def test_key_as_int_rejected():
    # fixture 013: key table entry with varint wire type
    raw = varint_field(15, 2) + len_field(1, b"hello") + varint_field(3, 42)
    with pytest.raises(FormatError, match="unknown field in layer"):
        parse_layer(raw)


def test_two_layers_same_name():
    # fixture 015
    tile = build_tile([single_point_layer(), single_point_layer()])
    assert count_layers(tile) == 2
    assert [layer_name_only(v) for v in tile_layer_views(tile)] == ["hello", "hello"]


def test_feature_missing_geometry():
    # fixture 004
    blob = varint_field(3, 1) + varint_field(1, 1)
    with pytest.raises(FormatError, match="Missing geometry field"):
        parse_feature(blob)


def test_feature_invalid_geomtype():
    # fixture 006
    blob = varint_field(3, 8) + len_field(4, b"\x09\x32\x22")
    with pytest.raises(FormatError, match="Unknown geometry type"):
        parse_feature(blob)


def test_feature_two_geometry_fields():
    # fixture 030
    g = len_field(4, b"\x09\x32\x22")
    with pytest.raises(FormatError, match="more than one geometry"):
        parse_feature(varint_field(3, 1) + g + g)


def test_feature_unpaired_tags():
    # fixture 005 family: odd tag count
    blob = (varint_field(3, 1) + len_field(2, b"\x00\x01\x02")
            + len_field(4, b"\x09\x32\x22"))
    with pytest.raises(FormatError, match="unpaired property key/value indexes"):
        parse_feature(blob)


def test_dangling_key_and_value_indexes():
    # fixtures 040/042
    layer = single_point_layer(props=None)
    parsed = parse_layer(layer)
    f = parse_feature(
        build_feature(1, GEOM_POINT, encode_point(np.array([[25, 17]])), [10, 0])
    )
    with pytest.raises(OutOfRangeError):
        parsed.properties(f)
    f2 = parse_feature(
        build_feature(1, GEOM_POINT, encode_point(np.array([[25, 17]])), [0, 10])
    )
    parsed2 = parse_layer(
        build_layer("hello", [], [b"key1"], [encode_value(VT_STRING, "v")])
    )
    with pytest.raises(OutOfRangeError):
        parsed2.properties(f2)


def test_properties_roundtrip_first_appearance_dictionaries():
    # fixture 043 semantics: shared key, distinct values
    vals = ["swing", "water_fountain", "slide", "bench", "tree", "path"]
    feats = []
    for i, v in enumerate(vals):
        feats.append((i + 1, GEOM_POINT, encode_point(np.array([[i, i + 1]])),
                      [(b"poi", encode_value(VT_STRING, v))]))
    layer_bytes = assemble_layer("park_features", feats)
    layer = parse_layer(layer_bytes)
    assert layer.keys == [b"poi"]
    assert len(layer.values) == 6
    props = layer.properties(layer.features[0])
    assert props[0][0] == b"poi"
    assert decode_value(props[0][1]) == (VT_STRING, "swing")
    # dictionary order is first-appearance order
    assert decode_value(layer.values[1]) == (VT_STRING, "water_fountain")


def test_empty_layer_omitted_from_tile():
    # builder_impl.hpp:225-227
    lb = build_layer("empty", [], [], [])
    tile = build_tile([lb, single_point_layer()], num_features=[0, 1])
    assert count_layers(tile) == 1


# ----------------------------------------------------- real-tile round-trip

@pytest.mark.skipif(not os.path.exists(REAL_TILE), reason="reference tile absent")
def test_real_tile_passthrough_roundtrip():
    """test_builder.cpp:34-55: read all layers, re-add verbatim,
    serialize -> byte-identical tile."""
    with open(REAL_TILE, "rb") as fh:
        data = fh.read()
    assert is_vector_tile(data)
    views = tile_layer_views(data)
    assert len(views) > 0
    rebuilt = build_tile(views)
    assert rebuilt == data


@pytest.mark.skipif(not os.path.exists(REAL_TILE), reason="reference tile absent")
def test_real_tile_full_decode_reencode_fixpoint():
    """Decode every feature of the real tile and re-encode our way; the
    bytes differ from the third-party encoder only in field ordering, so
    assert the *decoded* fixpoint: decode(encode(decode(x))) == decode(x)."""
    with open(REAL_TILE, "rb") as fh:
        data = fh.read()
    layers = parse_tile(data)
    assert sum(len(ly.features) for ly in layers) > 100
    total_points = 0
    for ly in layers:
        feats = []
        for f in ly.features:
            parts, _ = decode_geometry(f.geom_type, f.geometry, f.geometry_nbytes)
            total_points += sum(p.shape[0] for p in parts)
            feats.append((f.id, f.geom_type, f.geometry, ly.properties(f)))
        re_bytes = assemble_layer(ly.name, feats, version=ly.version, extent=ly.extent)
        re_layer = parse_layer(re_bytes)
        assert re_layer.name == ly.name
        assert len(re_layer.features) == len(ly.features)
        for f1, f2 in zip(ly.features, re_layer.features):
            assert f1.id == f2.id and f1.geom_type == f2.geom_type
            assert np.array_equal(f1.geometry, f2.geometry)
            assert re_layer.properties(f2) == ly.properties(f1)
    assert total_points > 1000
