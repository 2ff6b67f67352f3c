"""Fused per-tile filter+rewrite (engine/rewrite.py): vtzero-streets
semantics (examples/vtzero-streets.cpp:22-78) with zero shuffles, and
byte parity with the distributed filter-then-encode pipeline."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from vtzero_spark.engine import assemble, rewrite, synth, tiling
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V

from test_mvt_fixtures import feat, layer, tile

POINT = [9, 50, 34]
POINT2 = [9, 4, 4]


def _mini_tile() -> bytes:
    """Two layers: 'roads' has three features (two tagged fmt=png, one
    fmt=jpg, one with no id), 'water' lacks the fmt key entirely."""
    kpng = V.encode_value(V.VT_STRING, "png")
    kjpg = V.encode_value(V.VT_STRING, "jpg")
    vnum = V.encode_value(V.VT_INT, 7)
    roads = layer(
        name=b"roads",
        keys=[b"fmt", b"rank"],
        values=[kpng, kjpg, vnum],
        feats=[
            feat(fid=1, gtype=1, geom=POINT, tags=[0, 0, 1, 2]),
            feat(fid=2, gtype=1, geom=POINT2, tags=[0, 1]),
            feat(fid=None, gtype=1, geom=POINT, tags=[1, 2, 0, 0]),
        ],
    )
    water = layer(
        name=b"water",
        keys=[b"class"],
        values=[kjpg],
        feats=[feat(fid=9, gtype=1, geom=POINT, tags=[0, 0])],
    )
    return tile(roads, water)


def test_local_rewrite_semantics(spark):
    tiles = spark.createDataFrame(
        [(1, 2, 3, bytearray(_mini_tile())),
         (9, 9, 9, bytearray(b"\x1a\x05garb"))],
        "z long, x long, y long, tile_bytes binary")
    out = rewrite.filter_tiles_by_property(tiles, "fmt", "png") \
        .toPandas().set_index(["z", "x", "y"])

    # the garbage tile becomes an EMPTY tile, not a task failure
    assert out.loc[(9, 9, 9)]["num_layers"] == 0
    assert bytes(out.loc[(9, 9, 9)]["tile_bytes"]) == b""

    # 'water' (no fmt key) is dropped; 'roads' keeps features 1 and the
    # id-less one, whose dictionaries rebuild in first-appearance order
    row = out.loc[(1, 2, 3)]
    assert row["num_layers"] == 1
    layers = T.parse_tile(bytes(row["tile_bytes"]))
    assert [l.name for l in layers] == ["roads"]
    l = layers[0]
    assert l.version == 2 and l.extent == 4096
    # survivor 1 tags were (fmt,png),(rank,7); survivor 3 (rank,7),(fmt,png)
    assert l.keys == [b"fmt", b"rank"]
    assert l.values == [V.encode_value(V.VT_STRING, "png"),
                        V.encode_value(V.VT_INT, 7)]
    assert [f.id for f in l.features] == [1, None]
    assert l.features[0].tags.tolist() == [0, 0, 1, 1]
    assert l.features[1].tags.tolist() == [1, 1, 0, 0]
    # geometry copied verbatim
    assert l.features[0].geometry.tolist() == POINT
    # second survivor carries the first feature's geometry (POINT)
    assert l.features[1].geometry.tolist() == POINT


def test_fused_rewrite_byte_parity_with_distributed_pipeline(spark, sf_dir):
    """filter_tiles_by_property(tiles, fmt, png) must produce
    byte-identical tiles to filtering the FEATURES plan-side and
    running the fused vectorized encoder — i.e. the zero-shuffle
    rewrite and the shuffle-based rebuild agree to the byte."""
    import __spark_entry__ as em

    img = synth.images(spark, sf_dir)
    assigned = tiling.assign_tiles(img, zoom=em.ZOOM, extent=em.EXTENT,
                                   buffer=0)
    feats = assigned.select(
        "z", "x", "y", "layer_name",
        F.col("iid").alias("feature_ordinal"),
        F.col("iid").alias("feature_id"),
        "loc_x", "loc_y", "phash", "fmt", "caption")
    tiles = assemble.encode_point_tiles(feats, prop_spec=em.PROP_SPEC)

    fused = rewrite.filter_tiles_by_property(tiles, "fmt", "png") \
        .toPandas().set_index(["z", "x", "y"])["tile_bytes"]
    want = assemble.encode_point_tiles(
        feats.where(F.col("fmt") == "png"), prop_spec=em.PROP_SPEC
    ).toPandas().set_index(["z", "x", "y"])["tile_bytes"]

    assert len(want) > 0
    # every tile with survivors matches byte-for-byte; tiles whose
    # features all filtered away come back empty from the fused pass
    for zxy, fb in fused.items():
        if zxy in want.index:
            assert bytes(fb) == bytes(want.loc[zxy]), zxy
        else:
            assert bytes(fb) == b""


def test_rewrite_roundtrips_through_decoder(spark):
    """The rewritten tile re-parses cleanly through decode_layers with
    the rebuilt dictionary sizes."""
    tiles = spark.createDataFrame(
        [(1, 2, 3, bytearray(_mini_tile()))],
        "z long, x long, y long, tile_bytes binary")
    out = rewrite.filter_tiles_by_property(tiles, "fmt", "png")
    stats = assemble.decode_layers(out).toPandas()
    ok = stats[stats["decode_status"] == "ok"]
    assert len(ok) == 1
    r = ok.iloc[0]
    assert r["layer_name"] == "roads"
    assert r["num_features"] == 2
    assert r["key_table_size"] == 2 and r["value_table_size"] == 2
