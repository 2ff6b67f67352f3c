"""GL-legacy feature filters (engine/exprfilter.py): spec semantics
checked against an independent scalar evaluator over decoded property
dicts, byte parity with the wire-bytes rewrite kernel on the real
reference tile, and the distributed mapInPandas surface."""

from __future__ import annotations

import numbers

import pytest

from vtzero_spark.engine import exprfilter as X
from vtzero_spark.engine import rewrite
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V

from test_mvt_fixtures import feat, layer, tile

REAL_TILE = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"

POINT = [9, 50, 34]
LINE = [9, 4, 4, 18, 0, 16, 16, 0]


# ------------------------------------------------- independent reference

def _cat(x) -> str:
    if isinstance(x, bool):
        return "b"
    if isinstance(x, str):
        return "s"
    if isinstance(x, numbers.Real):
        return "n"
    return "?"


def ref_eval(filt, props: dict, geom_type: int, fid) -> bool:
    """Straight-from-the-spec scalar evaluator over a decoded property
    dict — shares no code with exprfilter."""
    op = filt[0]
    if op == "all":
        return all(ref_eval(f, props, geom_type, fid) for f in filt[1:])
    if op == "any":
        return any(ref_eval(f, props, geom_type, fid) for f in filt[1:])
    if op == "none":
        return not any(ref_eval(f, props, geom_type, fid) for f in filt[1:])
    key = filt[1]
    if key == "$type":
        names = {0: "Unknown", 1: "Point", 2: "LineString", 3: "Polygon"}
        pv = names[geom_type]
    elif key == "$id":
        pv = fid
    else:
        pv = props.get(key)
    if op == "has":
        return pv is not None or key == "$type"
    if op == "!has":
        return not (pv is not None or key == "$type")
    if op in ("in", "!in"):
        hit = pv is not None and any(
            _cat(pv) == _cat(lit) and pv == lit for lit in filt[2:])
        return hit if op == "in" else not hit
    lit = filt[2]
    if key == "$type":
        hit = pv == lit
        return hit if op == "==" else not hit
    if pv is None or _cat(pv) != _cat(lit):
        return op == "!="  # missing / cross-category: only != passes
    if op == "==":
        return pv == lit
    if op == "!=":
        return pv != lit
    if op == "<":
        return pv < lit
    if op == "<=":
        return pv <= lit
    if op == ">":
        return pv > lit
    return pv >= lit


# ---------------------------------------------------------- battery tile

def _battery_tile() -> bytes:
    vals = [
        V.encode_value(V.VT_STRING, "png"),     # 0
        V.encode_value(V.VT_STRING, "jpg"),     # 1
        V.encode_value(V.VT_INT, 7),            # 2
        V.encode_value(V.VT_SINT, -3),          # 3
        V.encode_value(V.VT_DOUBLE, 2.5),       # 4
        V.encode_value(V.VT_FLOAT, 1.5),        # 5
        V.encode_value(V.VT_BOOL, True),        # 6
        V.encode_value(V.VT_UINT, (1 << 63) + 5),  # 7
        V.encode_value(V.VT_STRING, "1"),       # 8
    ]
    roads = layer(
        name=b"roads",
        keys=[b"fmt", b"rank", b"score", b"flag"],
        values=vals,
        feats=[
            feat(fid=1, gtype=1, geom=POINT, tags=[0, 0, 1, 2]),
            feat(fid=2, gtype=2, geom=LINE, tags=[0, 1, 2, 4]),
            feat(fid=3, gtype=1, geom=POINT, tags=[1, 3, 3, 6]),
            feat(fid=4, gtype=3, geom=POINT, tags=[2, 5, 0, 8]),
            feat(fid=5, gtype=1, geom=POINT, tags=[1, 7]),
            feat(fid=6, gtype=2, geom=LINE, tags=[]),
        ],
    )
    water = layer(
        name=b"water",
        keys=[b"class"],
        values=[V.encode_value(V.VT_STRING, "river")],
        feats=[feat(fid=9, gtype=3, geom=POINT, tags=[0, 0])],
    )
    return tile(roads, water)


def _decoded_features(buf: bytes):
    """[(layer_name, fid, geom_type, props_dict)] in tile order."""
    out = []
    for ly in T.parse_tile(buf):
        for f in ly.features:
            props = {}
            for kb, vb in ly.properties(f):
                props[kb.decode()] = V.decode_value(vb)[1]
            out.append((ly.name, f.id, f.geom_type, props))
    return out


BATTERY = [
    ["has", "fmt"],
    ["!has", "fmt"],
    ["has", "class"],
    ["==", "fmt", "png"],
    ["!=", "fmt", "png"],
    ["==", "fmt", "nope"],
    ["==", "rank", 7],
    ["==", "rank", 7.0],          # int/double numeric domain
    ["==", "rank", -3],           # sint decode
    ["==", "score", 2.5],
    ["==", "score", 1.5],         # float wire width
    ["==", "flag", True],
    ["==", "flag", 1],            # bool is NOT number 1
    ["==", "flag", "1"],          # bool is NOT string "1"
    ["==", "fmt", 1],             # string "1"? no - fmt holds png/jpg
    ["==", "rank", (1 << 63) + 5],  # big uint exact (past int64)
    [">", "rank", 1 << 62],
    ["<", "rank", 0],
    ["<=", "rank", -3],
    [">", "rank", 6],
    [">=", "score", 1.5],
    ["<", "fmt", "png"],          # string ordering
    [">=", "fmt", "jpg"],
    ["in", "fmt", "png", "jpg"],
    ["!in", "fmt", "png", "jpg"],
    ["in", "rank", 7, -3, 99],
    ["in", "fmt"],                # empty in -> false
    ["!in", "fmt"],               # empty !in -> true
    ["==", "$type", "Point"],
    ["!=", "$type", "Point"],
    ["in", "$type", "LineString", "Polygon"],
    ["==", "$id", 3],
    ["!=", "$id", 3],
    ["in", "$id", 1, 5, 9],
    ["<", "$id", 4],
    [">=", "$id", 5],
    ["has", "$id"],
    ["all", ["has", "fmt"], ["==", "$type", "Point"]],
    ["any", ["==", "fmt", "png"], ["==", "class", "river"]],
    ["none", ["has", "fmt"], ["has", "class"]],
    ["all"],                      # empty all -> true
    ["any"],                      # empty any -> false
    ["all", ["any", ["==", "rank", 7], ["<", "score", 2.0]],
     ["!in", "$type", "Polygon"]],
]


@pytest.mark.parametrize("filt", BATTERY,
                         ids=[repr(f) for f in BATTERY])
def test_battery_matches_reference_evaluator(filt):
    buf = _battery_tile()
    expect = [(name, fid) for name, fid, gt, props in _decoded_features(buf)
              if ref_eval(filt, props, gt, fid)]
    out = X.filter_tile_bytes_expr(buf, X.compile_filter(filt))
    got = [(name, fid) for name, fid, gt, props in _decoded_features(out)]
    assert got == expect, f"{filt}: {got} != {expect}"


def test_missing_id_semantics():
    """A feature without an id fails positive $id tests and passes
    negated ones — the missing-property rule applied to $id."""
    buf = tile(layer(name=b"l", keys=[b"k"],
                     values=[V.encode_value(V.VT_STRING, "x")],
                     feats=[feat(fid=None, gtype=1, geom=POINT,
                                 tags=[0, 0]),
                            feat(fid=7, gtype=1, geom=POINT,
                                 tags=[0, 0])]))

    def kept(filt):
        out = X.filter_tile_bytes_expr(buf, X.compile_filter(filt))
        lys = T.parse_tile(out)
        return [f.id for ly in lys for f in ly.features]

    assert kept(["==", "$id", 7]) == [7]
    assert kept(["!=", "$id", 7]) == [None]
    assert kept(["has", "$id"]) == [7]
    assert kept(["!has", "$id"]) == [None]
    assert kept(["<", "$id", 99]) == [7]  # id-less never orders


def test_undecodable_value_matches_nothing():
    """A corrupt value-table entry is 'matches nothing', not a task
    failure — errors-as-data down to the dictionary slot."""
    buf = tile(layer(name=b"l", keys=[b"k"],
                     values=[b"\x15\x01",  # float, truncated payload
                             V.encode_value(V.VT_INT, 7)],
                     feats=[feat(fid=1, gtype=1, geom=POINT, tags=[0, 0]),
                            feat(fid=2, gtype=1, geom=POINT, tags=[0, 1])]))
    out = X.filter_tile_bytes_expr(buf, X.compile_filter(["==", "k", 7]))
    assert [f.id for ly in T.parse_tile(out) for f in ly.features] == [2]
    # but HAS still sees the key (no value decode needed)
    out = X.filter_tile_bytes_expr(buf, X.compile_filter(["has", "k"]))
    assert [f.id for ly in T.parse_tile(out) for f in ly.features] == [1, 2]


def test_compile_rejects_malformed():
    for bad in ([], ["=="], ["==", "k"], ["frob", "k", 1],
                ["has"], ["has", 3], ["==", "$type", "Blob"],
                ["<", "$type", "Point"], ["==", "$id", "x"],
                ["<", "k", True], ["==", "k", [1, 2]],
                "not-a-list", ["all", ["=="]]):
        with pytest.raises(ValueError):
            X.compile_filter(bad)


def test_layer_selector():
    buf = _battery_tile()
    ast = X.compile_filter(["has", "$id"])
    only_water = X.filter_tile_bytes_expr(buf, ast, layer_sel="water")
    assert [ly.name for ly in T.parse_tile(only_water)] == ["water"]
    by_ord = X.filter_tile_bytes_expr(buf, ast, layer_sel="1")
    assert T.tile_layer_views(by_ord) == T.tile_layer_views(only_water)
    assert X.filter_tile_bytes_expr(buf, ast, layer_sel="nope") == b""


def test_byte_parity_with_rewrite_real_tile():
    """On the overlapping predicate subset (string equality / IN /
    has-key) the expression path must be byte-identical to the
    wire-bytes rewrite kernel — same survivors, same first-appearance
    dictionary rebuild, same emission order."""
    buf = open(REAL_TILE, "rb").read()
    enc = lambda s: V.encode_value(V.VT_STRING, s)  # noqa: E731

    pairs = [
        (["==", "class", "street"], (None, b"class", [enc("street")])),
        (["in", "class", "street", "path"],
         (None, b"class", [enc("street"), enc("path")])),
        (["has", "class"], (None, b"class", None)),
        (["==", "type", "primary"], ("road", b"type", [enc("primary")])),
    ]
    for filt, (lsel, kb, vbs) in pairs:
        expr = X.filter_tile_bytes_expr(
            buf, X.compile_filter(filt), layer_sel=lsel)
        wire = rewrite.rewrite_tile_bytes(buf, lsel, kb, vbs)
        assert expr == wire, filt
    # sanity: the street filter actually selects something
    street = X.filter_tile_bytes_expr(
        buf, X.compile_filter(["==", "class", "street"]))
    assert sum(len(ly.features) for ly in T.parse_tile(street)) > 0


def test_spark_surface(spark):
    tiles = spark.createDataFrame(
        [(1, 2, 3, bytearray(_battery_tile())),
         (9, 9, 9, bytearray(b"\x1a\x05garb"))],
        "z long, x long, y long, tile_bytes binary")
    out = X.filter_tiles_expr(
        tiles, ["all", ["has", "fmt"], ["!=", "$type", "Polygon"]]) \
        .toPandas().set_index(["z", "x", "y"])
    row = out.loc[(1, 2, 3)]
    assert row["num_layers"] == 1
    lys = T.parse_tile(bytes(row["tile_bytes"]))
    # has-fmt = {1, 2, 4("1")}; dropping Polygons removes 4
    assert [f.id for ly in lys for f in ly.features] == [1, 2]
    # malformed tile -> empty tile row, not a task failure
    assert out.loc[(9, 9, 9)]["num_layers"] == 0
    # malformed FILTER fails on the driver at compile time
    with pytest.raises(ValueError):
        X.filter_tiles_expr(tiles, ["bogus", "k", 1])


def test_zoom_leaf(spark):
    """$zoom — tippecanoe's -j evaluation context: one filter tree
    expresses zoom-dependent dropping; the leaf is per-TILE scalar."""
    buf = _battery_tile()
    # scalar surface: explicit zoom argument
    ast = X.compile_filter([">=", "$zoom", 10])
    assert X.filter_tile_bytes_expr(buf, ast, zoom=9) == b""
    kept = X.filter_tile_bytes_expr(buf, ast, zoom=10)
    assert [ly.name for ly in T.parse_tile(kept)] == ["roads", "water"]
    # unknown zoom behaves as a missing property
    assert X.filter_tile_bytes_expr(buf, ast) == b""
    assert X.filter_tile_bytes_expr(
        buf, X.compile_filter(["!has", "$zoom"])) != b""

    # composed: low zooms keep only fmt=png, high zooms keep all
    filt = ["any", [">=", "$zoom", 10], ["==", "fmt", "png"]]
    tiles = spark.createDataFrame(
        [(4, 0, 0, bytearray(buf)), (10, 0, 0, bytearray(buf))],
        "z long, x long, y long, tile_bytes binary")
    out = X.filter_tiles_expr(tiles, filt).toPandas().set_index("z")
    low = T.parse_tile(bytes(out.loc[4]["tile_bytes"]))
    high = T.parse_tile(bytes(out.loc[10]["tile_bytes"]))
    assert [f.id for ly in low for f in ly.features] == [1]
    assert sum(len(ly.features) for ly in high) == 7

    # $zoom literal must be an integer
    with pytest.raises(ValueError):
        X.compile_filter(["==", "$zoom", "ten"])
