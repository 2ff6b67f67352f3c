"""Distributed layer passthrough (decode_layers -> encode_tiles) and
raw .mvt file ingestion.

The reference's add_existing_layer (builder.hpp:119-132) copies an
encoded layer into a new tile verbatim; vtzero-filter
(examples/vtzero-filter.cpp:66-100) is exactly layer-select +
passthrough + rebuild. These tests assert the distributed form is
byte-identical — full tile, selected layer, and MIXED (one layer
passthrough + others re-encoded from decoded features)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from vtzero_spark.engine import assemble, mvt_files
from vtzero_spark.mvt import pbf
from vtzero_spark.mvt import tile as T

REF_TILE = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"


def _ref_df(spark):
    data = open(REF_TILE, "rb").read()
    return data, spark.createDataFrame(
        [(14, 8714, 8017, bytearray(data))],
        "z long, x long, y long, tile_bytes binary")


def test_full_passthrough_reassembles_original_bytes(spark):
    """All 12 layers passthrough -> rebuilt tile == original file,
    byte for byte (the distributed add_existing_layer round trip;
    layer_ordinal preserves the source layer ORDER, which is not
    name-sorted in the real tile)."""
    data, tiles = _ref_df(spark)
    layers = assemble.decode_layers(tiles)
    out = assemble.encode_tiles(layers).toPandas()
    assert len(out) == 1
    assert bytes(out["tile_bytes"].iloc[0]) == data
    assert int(out["num_layers"].iloc[0]) == 12


def test_layer_select_passthrough_matches_local(spark):
    """vtzero-filter shape: keep one layer by name; output tile ==
    locally built tile of that layer's raw view."""
    data, tiles = _ref_df(spark)
    views = T.tile_layer_views(data)
    names = [T.layer_name_only(v) for v in views]
    pick = names[3]
    want = T.build_tile([bytes(v) for v, n in zip(views, names) if n == pick])

    layers = assemble.decode_layers(tiles)
    kept = layers.where(F.col("layer_name") == pick)
    out = assemble.encode_tiles(kept).toPandas()
    assert bytes(out["tile_bytes"].iloc[0]) == want


def test_mixed_passthrough_and_reencode_byte_identical(spark, sf_dir):
    """One layer travels as raw passthrough bytes, the others are
    decoded (including properties) and re-encoded; the assembled tiles
    equal the straight full re-encode byte for byte."""
    f = entry._features(spark, sf_dir).limit(3000)
    full = entry._encode_image_tiles(f) \
        .select("z", "x", "y", "tile_bytes").toPandas()

    tiles = entry._encode_image_tiles(f)
    layers = assemble.decode_layers(tiles)
    passthrough = layers.where(F.col("layer_name") == "L1").select(
        "z", "x", "y", "layer_name", "layer_ordinal",
        "num_features", "layer_bytes")

    dec = assemble.decode_tiles(tiles, properties=True)
    others = dec.where((F.col("decode_status") == "ok")
                       & (F.col("layer_name") != "L1"))
    pts = assemble.decoded_points(others)
    feats = pts.select(
        "z", "x", "y", "layer_name",
        F.col("feature_ordinal").cast("long").alias("feature_ordinal"),
        "feature_id",
        F.col("pt_x").cast("long").alias("loc_x"),
        F.col("pt_y").cast("long").alias("loc_y"),
        F.col("properties")["phash"]["ival"].alias("phash"),
        F.col("properties")["fmt"]["sval"].alias("fmt"),
        F.col("properties")["caption"]["sval"].alias("caption"),
    )
    reenc = assemble.encode_point_layers(feats, prop_spec=entry.PROP_SPEC) \
        .withColumn("layer_ordinal",
                    F.substring("layer_name", 2, 10).cast("int")) \
        .select("z", "x", "y", "layer_name", "layer_ordinal",
                "num_features", "layer_bytes")
    mixed = assemble.encode_tiles(passthrough.unionByName(reenc)).toPandas()

    a = full.set_index(["z", "x", "y"]).sort_index()
    b = mixed.set_index(["z", "x", "y"]).sort_index()
    assert len(a) == len(b) and len(a) > 0
    diff = a["tile_bytes"].map(bytes) != b["tile_bytes"].map(bytes)
    assert not diff.any(), f"{int(diff.sum())} tiles differ"


def test_mvt_file_ingest_stats_golden(spark):
    """binaryFile scan of the reference tile -> per-layer stats match
    the local parse (vtzero-stats semantics) including the hand-pinned
    first rows."""
    got = mvt_files.mvt_file_stats(spark, "/root/reference/test/data") \
        .toPandas().sort_values("layer_ordinal").reset_index(drop=True)
    assert (got["z"] == 14).all() and (got["x"] == 8714).all() \
        and (got["y"] == 8017).all()

    data = open(REF_TILE, "rb").read()
    local = T.parse_tile(data)
    assert len(got) == len(local) == 12
    for i, ly in enumerate(local):
        r = got.iloc[i]
        assert r["layer_name"] == ly.name
        assert int(r["num_features"]) == len(ly.features)
        assert int(r["key_table_size"]) == len(ly.keys)
        assert int(r["value_table_size"]) == len(ly.values)
    # hand-pinned: the streets tile's first layer
    assert got.iloc[0]["layer_name"] == "landuse"


def test_cli_layer_selector(spark):
    """utils.cpp:78-100 parity: digits -> by position, else by name;
    local and distributed forms agree."""
    data, tiles = _ref_df(spark)
    by_idx = T.get_layer(data, "3")
    by_name = T.get_layer(data, "building")
    assert by_idx is not None and by_idx.name == "barrier_line"
    assert by_name is not None and len(by_name.features) > 0
    assert T.get_layer(data, "99") is None
    assert T.get_layer(data, "no_such_layer") is None

    layers = assemble.decode_layers(tiles)
    d_idx = assemble.select_layer(layers, "3").toPandas()
    d_name = assemble.select_layer(layers, "building").toPandas()
    assert len(d_idx) == 1 and d_idx["layer_name"].iloc[0] == "barrier_line"
    assert len(d_name) == 1
    assert int(d_name["num_features"].iloc[0]) == len(by_name.features)
    assert len(assemble.select_layer(layers, "99").toPandas()) == 0


def test_select_layer_duplicate_names_first_match(spark):
    """get_layer_by_name semantics on duplicate layer names: the FIRST
    matching layer per tile wins (vector_tile.hpp:214-271)."""
    f = T.build_feature(1, 1, np.array([9, 2, 2], dtype=np.uint64))
    la = T.build_layer("dup", [f], [], [])
    lb = T.build_layer("dup", [f, f], [], [])
    buf = T.build_tile([la, lb])
    tiles = spark.createDataFrame(
        [(0, 0, 0, bytearray(buf))],
        "z long, x long, y long, tile_bytes binary")
    layers = assemble.decode_layers(tiles)
    first = assemble.select_layer(layers, "dup").toPandas()
    assert len(first) == 1 and int(first["layer_ordinal"].iloc[0]) == 0
    assert int(first["num_features"].iloc[0]) == 1
    both = assemble.select_layer(layers, "dup", first_match=False).toPandas()
    assert len(both) == 2
    # local form agrees
    assert len(T.get_layer(buf, "dup").features) == 1


def test_read_mvt_files_filename_zxy(spark, tmp_path):
    """z/x/y comes from the {z}-{x}-{y}.mvt convention; other names
    decode with address -1."""
    buf = T.build_tile([T.build_layer("l", [T.build_feature(
        1, 1, np.array([9, 2, 2], dtype=np.uint64))], [], [])])
    (tmp_path / "5-10-20.mvt").write_bytes(buf)
    (tmp_path / "noaddr.mvt").write_bytes(buf)
    (tmp_path / "ignored.txt").write_bytes(b"junk")
    df = mvt_files.read_mvt_files(spark, str(tmp_path)).toPandas()
    assert len(df) == 2
    byz = {int(r["z"]): r for _, r in df.iterrows()}
    assert 5 in byz and -1 in byz
    assert int(byz[5]["x"]) == 10 and int(byz[5]["y"]) == 20
    assert bytes(byz[5]["tile_bytes"]) == buf


def test_passthrough_unfiltered_error_rows_do_not_crash(spark):
    """decode_layers error rows (layer_bytes NULL) fed to encode_tiles
    UNFILTERED must be skipped, not crash the task — the passthrough
    analog of errors-as-data (a fully corrupt tile re-assembles as an
    empty tile)."""
    good = open(REF_TILE, "rb").read()
    df = spark.createDataFrame(
        [(0, 0, 0, bytearray(good)),
         (9, 9, 9, bytearray(b"\x1a\x05garb"))],
        "z long, x long, y long, tile_bytes binary")
    layers = assemble.decode_layers(df)
    out = assemble.encode_tiles(layers).toPandas().set_index(["z", "x", "y"])
    assert bytes(out.loc[(0, 0, 0)]["tile_bytes"]) == good
    assert out.loc[(9, 9, 9)]["num_layers"] == 0
    assert bytes(out.loc[(9, 9, 9)]["tile_bytes"]) == b""


def test_write_read_mvt_files_roundtrip(spark, tmp_path):
    """write_mvt_files -> read_mvt_files is a byte-exact round trip,
    with the z/x/y address carried through the filename."""
    from vtzero_spark.engine import mvt_files

    from test_mvt_fixtures import feat, layer, tile

    good = open(REF_TILE, "rb").read()
    small = tile(layer(feats=[feat(fid=1, gtype=1, geom=[9, 2, 2])]))
    tiles = spark.createDataFrame(
        [(14, 8714, 8017, bytearray(good)),
         (3, 1, 2, bytearray(small))],
        "z long, x long, y long, tile_bytes binary")
    out_dir = str(tmp_path / "tileset")
    manifest = mvt_files.write_mvt_files(tiles, out_dir).toPandas()
    assert len(manifest) == 2
    assert set(manifest["nbytes"]) == {len(good), len(small)}

    back = mvt_files.read_mvt_files(spark, out_dir).toPandas() \
        .set_index(["z", "x", "y"])
    assert bytes(back.loc[(14, 8714, 8017)]["tile_bytes"]) == good
    assert bytes(back.loc[(3, 1, 2)]["tile_bytes"]) == small
