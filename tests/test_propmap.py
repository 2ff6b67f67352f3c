"""Property projection (engine/propmap.py): tile-join -x/-R laws —
byte-verbatim identity, orphan-free dictionaries, keep == drop
complement, feature survival — on synth tiles and the real tile."""

from __future__ import annotations

import numpy as np
import pytest

from vtzero_spark.engine import propmap as P
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V

from test_mvt_fixtures import feat, layer, tile

REAL_TILE = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"
POINT = [9, 50, 34]


def _mini() -> bytes:
    roads = layer(
        name=b"roads",
        keys=[b"name", b"class", b"rank"],
        values=[V.encode_value(V.VT_STRING, "Main St"),
                V.encode_value(V.VT_STRING, "street"),
                V.encode_value(V.VT_INT, 3)],
        feats=[
            feat(fid=1, gtype=1, geom=POINT, tags=[0, 0, 1, 1, 2, 2]),
            feat(fid=2, gtype=1, geom=POINT, tags=[0, 0]),
            feat(fid=None, gtype=1, geom=POINT, tags=[]),
        ])
    poi = layer(
        name=b"poi",
        keys=[b"class"],
        values=[V.encode_value(V.VT_STRING, "cafe")],
        feats=[feat(fid=9, gtype=1, geom=POINT, tags=[0, 0])])
    return tile(roads, poi)


def _run(buf, **kw):
    keep_b, drop_b, ren_b = P._normalize(
        kw.get("keep"), kw.get("drop"), kw.get("rename"))
    return P.remap_tile_bytes(buf, keep_b, drop_b, ren_b,
                              kw.get("layer_sel"))


def _props(buf):
    out = []
    for ly in T.parse_tile(buf):
        for f in ly.features:
            out.append((ly.name, f.id, sorted(
                (k.decode(), V.decode_value(v)[1])
                for k, v in ly.properties(f))))
    return out


def _no_orphans(buf):
    for ly in T.parse_tile(buf):
        used_k, used_v = set(), set()
        for f in ly.features:
            used_k.update(int(i) for i in f.tags[0::2])
            used_v.update(int(i) for i in f.tags[1::2])
        assert used_k == set(range(len(ly.keys))), ly.name
        assert used_v == set(range(len(ly.values))), ly.name


def test_identity_is_byte_verbatim():
    buf = _mini()
    assert _run(buf) == buf
    real = open(REAL_TILE, "rb").read()
    assert _run(real) == real


def test_drop_strips_and_leaves_no_orphans():
    buf = _mini()
    out = _run(buf, drop=["name"])
    assert _props(out) == [
        ("roads", 1, [("class", "street"), ("rank", 3)]),
        ("roads", 2, []),               # feature survives with 0 tags
        ("roads", None, []),
        ("poi", 9, [("class", "cafe")]),
    ]
    _no_orphans(out)
    assert len(out) < len(buf)


def test_keep_is_drop_complement():
    buf = _mini()
    assert _run(buf, keep=["class", "rank"]) == _run(buf, drop=["name"])
    assert _run(buf, keep=["name"]) == _run(buf, drop=["class", "rank"])


def test_untouched_layer_passes_verbatim():
    buf = _mini()
    out = _run(buf, drop=["rank"])  # poi has no 'rank'
    views = T.tile_layer_views(buf)
    out_views = T.tile_layer_views(out)
    assert out_views[1] == views[1]          # poi byte-identical
    assert out_views[0] != views[0]


def test_rename():
    buf = _mini()
    out = _run(buf, rename={"class": "kind", "name": "label"})
    assert _props(out) == [
        ("roads", 1, [("kind", "street"), ("label", "Main St"),
                      ("rank", 3)]),
        ("roads", 2, [("label", "Main St")]),
        ("roads", None, []),
        ("poi", 9, [("kind", "cafe")]),
    ]
    _no_orphans(out)
    # rename after keep: dropped keys cannot resurrect via rename
    out2 = _run(buf, keep=["rank"], rename={"name": "label"})
    assert _props(out2)[0] == ("roads", 1, [("rank", 3)])


def test_rename_target_collision_rejected():
    with pytest.raises(ValueError):
        P._normalize(None, None, {"a": "x", "b": "x"})


def test_layer_selector_scopes_output():
    buf = _mini()
    out = _run(buf, drop=["class"], layer_sel="poi")
    lys = T.parse_tile(out)
    assert [ly.name for ly in lys] == ["poi"]
    assert _props(out) == [("poi", 9, [])]


def test_malformed_tile_degrades_to_empty():
    assert _run(b"\x1a\x05garb", drop=["x"]) == b""
    # tag pair referencing past the key table -> empty, not a crash
    bad = tile(layer(name=b"l", keys=[b"k"],
                     values=[V.encode_value(V.VT_STRING, "v")],
                     feats=[feat(fid=1, gtype=1, geom=POINT,
                                 tags=[5, 0])]))
    assert _run(bad, drop=["k"]) == b""


def test_real_tile_drop_name_shrinks_consistently():
    buf = open(REAL_TILE, "rb").read()
    out = _run(buf, drop=["name", "name_en"])
    assert len(out) < len(buf)
    _no_orphans(out)
    # feature counts unchanged, per layer
    a = [(ly.name, len(ly.features)) for ly in T.parse_tile(buf)]
    b = [(ly.name, len(ly.features)) for ly in T.parse_tile(out)]
    assert a == b
    # scalar oracle: decoded props == original props minus dropped keys
    for (n1, i1, p1), (n2, i2, p2) in zip(_props(buf), _props(out)):
        assert (n1, i1) == (n2, i2)
        assert p2 == [(k, v) for k, v in p1
                      if k not in ("name", "name_en")]


def test_spark_surface(spark):
    tiles = spark.createDataFrame(
        [(1, 2, 3, bytearray(_mini()))],
        "z long, x long, y long, tile_bytes binary")
    out = P.remap_properties(
        tiles, drop=["name"], rename={"class": "kind"}) \
        .toPandas().iloc[0]
    assert out["num_layers"] == 2
    got = _props(bytes(out["tile_bytes"]))
    assert got[0] == ("roads", 1, [("kind", "street"), ("rank", 3)])
    with pytest.raises(ValueError):
        P.remap_properties(tiles, rename={"a": "x", "b": "x"})
