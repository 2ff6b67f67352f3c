"""Distributed property decode (decode_tiles(properties=True)):
parity with the local codec on the real reference tile, and
fixture-040/042/038 error semantics carried as decode_status DATA
through the Spark path (the reference throws out_of_range_exception /
format_exception at property access, layer.hpp:434-460,
fixture_tests.cpp:683-729)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import assemble
from vtzero_spark.mvt import pbf
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V

from test_mvt_fixtures import feat, layer, tile

REF_TILE = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"

POINT = [9, 50, 34]


def _decode_df(spark, tile_bytes: bytes):
    df = spark.createDataFrame(
        [(0, 0, 0, bytearray(tile_bytes))],
        "z long, x long, y long, tile_bytes binary")
    return assemble.decode_tiles(df, properties=True)


def test_real_tile_props_match_local(spark):
    data = open(REF_TILE, "rb").read()
    out = _decode_df(spark, data).toPandas()
    assert (out["decode_status"] == "ok").all()

    layers = T.parse_tile(data)
    assert len(out) == sum(len(ly.features) for ly in layers)

    # cross-check every property of every feature of a mid-size layer
    # against the local reference read path
    li = next(i for i, ly in enumerate(layers)
              if 0 < len(ly.features) < 300 and ly.keys)
    ly = layers[li]
    sub = out[out["layer_ordinal"] == li].sort_values("feature_ordinal")
    assert len(sub) == len(ly.features)
    checked_props = 0
    for fi, f in enumerate(ly.features):
        got = sub.iloc[fi]["properties"]
        want = ly.properties(f)
        # duplicate keys collapse in the map; reference tiles don't
        # carry duplicates, so sizes match
        assert len(got) == len(want)
        for kb, vb in want:
            k = kb.decode("utf-8")
            tag, pv = V.decode_value(bytes(vb))
            cell = got[k]
            assert cell["vtype"] == tag
            if tag == V.VT_STRING:
                assert cell["sval"] == pv
            elif tag in (V.VT_FLOAT, V.VT_DOUBLE):
                assert cell["dval"] == pytest.approx(float(pv))
            elif tag == V.VT_BOOL:
                assert cell["ival"] == int(bool(pv))
            else:
                assert cell["ival"] == int(pv)
            checked_props += 1
    assert checked_props > 0


def test_out_of_range_key_index_becomes_status_row(spark):
    # fixture 040-style: tags reference key index 1 but the key table
    # has a single entry; a second clean feature must stay ok
    bad = feat(fid=1, gtype=1, geom=POINT, tags=[1, 0])
    good = feat(fid=2, gtype=1, geom=POINT, tags=[0, 0])
    buf = tile(layer(feats=[bad, good], keys=[b"k"],
                     values=[V.encode_value(V.VT_STRING, "v")]))
    out = _decode_df(spark, buf).toPandas().sort_values("feature_id")
    assert len(out) == 2
    s_bad = out[out["feature_id"] == 1].iloc[0]
    s_good = out[out["feature_id"] == 2].iloc[0]
    assert s_bad["decode_status"].startswith("OutOfRangeError")
    assert s_bad["properties"] is None
    assert s_good["decode_status"] == "ok"
    assert s_good["properties"]["k"]["sval"] == "v"


def test_out_of_range_value_index_becomes_status_row(spark):
    # fixture 042-style: value index past the end of the value table
    bad = feat(fid=1, gtype=1, geom=POINT, tags=[0, 5])
    buf = tile(layer(feats=[bad], keys=[b"k"],
                     values=[V.encode_value(V.VT_STRING, "v")]))
    out = _decode_df(spark, buf).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["decode_status"].startswith("OutOfRangeError")


def test_invalid_value_poisons_only_referencing_features(spark):
    # fixture 038-style: value table entry with an illegal type tag;
    # only the feature whose tags reference it reports the error
    bad_value = pbf.varint_field(9, 1)  # tag 9: illegal property type
    ok_value = V.encode_value(V.VT_UINT, 7)
    f_ok = feat(fid=1, gtype=1, geom=POINT, tags=[0, 0])
    f_bad = feat(fid=2, gtype=1, geom=POINT, tags=[0, 1])
    buf = tile(layer(feats=[f_ok, f_bad], keys=[b"k"],
                     values=[ok_value, bad_value]))
    out = _decode_df(spark, buf).toPandas().sort_values("feature_id")
    s_ok = out[out["feature_id"] == 1].iloc[0]
    s_bad = out[out["feature_id"] == 2].iloc[0]
    assert s_ok["decode_status"] == "ok"
    assert s_ok["properties"]["k"]["ival"] == 7
    assert s_bad["decode_status"].startswith("FormatError")
    assert s_bad["properties"] is None


def test_all_seven_value_types_roundtrip_distributed(spark):
    """Encode features carrying every property value type through the
    generic distributed encoder, decode with properties=True, and
    compare typed values end to end (the 7-way union of values.py /
    property_value.hpp through real bytes on the Spark path)."""
    import math

    from vtzero_spark.engine import assemble

    cases = [
        ("s", V.VT_STRING, "héllo wörld", None, None),
        ("f", V.VT_FLOAT, None, 1.5, None),
        ("d", V.VT_DOUBLE, None, -2.25e10, None),
        ("i", V.VT_INT, None, None, -1234567890123),
        ("u", V.VT_UINT, None, None, 9876543210),
        ("si", V.VT_SINT, None, None, -42),
        ("b", V.VT_BOOL, None, None, 1),
    ]
    props = [{"key": k, "vtype": vt, "sval": s, "dval": d, "ival": i}
             for k, vt, s, d, i in cases]
    feats = spark.createDataFrame(
        [(0, 0, 0, "L", 0, 77, 1, 10, 20, props)],
        "z long, x long, y long, layer_name string, "
        "feature_ordinal long, feature_id long, geom_type int, "
        "loc_x long, loc_y long, props array<struct<key: string, "
        "vtype: int, sval: string, dval: double, ival: long>>")
    tiles = assemble.encode_tiles(assemble.encode_layers(feats))
    out = assemble.decode_tiles(tiles, properties=True).toPandas()
    assert len(out) == 1 and out.iloc[0]["decode_status"] == "ok"
    got = out.iloc[0]["properties"]
    assert len(got) == 7
    for k, vt, s, d, i in cases:
        cell = got[k]
        assert cell["vtype"] == vt, k
        if vt == V.VT_STRING:
            assert cell["sval"] == s
        elif vt == V.VT_FLOAT:
            assert math.isclose(cell["dval"], d, rel_tol=1e-6)
        elif vt == V.VT_DOUBLE:
            assert cell["dval"] == d
        else:
            assert cell["ival"] == i, k


def test_empty_tags_yield_empty_map_not_null(spark):
    f = feat(fid=1, gtype=1, geom=POINT)
    buf = tile(layer(feats=[f]))
    out = _decode_df(spark, buf).toPandas()
    assert out.iloc[0]["decode_status"] == "ok"
    assert out.iloc[0]["properties"] == {}
