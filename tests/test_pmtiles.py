"""PMTiles v3 archive (engine/pmtiles.py): tile-id math, directory
codec, dedup/run-length, leaf split, self-roundtrip invariants.
"""

import gzip

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import assemble, geomops, pmtiles, synth, tiling


def _tiles(spark, sf_dir):
    img = synth.images(spark, sf_dir)
    feats = geomops.rect_stream_features(tiling.assign_tiles(img))
    return assemble.encode_geom_tiles(feats)


def test_tileid_bijection_and_column_math(spark):
    # scalar bijection across zooms
    for z, x, y in [(0, 0, 0), (1, 1, 0), (4, 7, 11), (7, 100, 3),
                    (12, 4095, 17), (14, 8714, 8017)]:
        tid = pmtiles.zxy_to_tileid(z, x, y)
        assert pmtiles.tileid_to_zxy(tid) == (z, x, y)
    # zoom base offsets: first id of zoom z == sum 4^k, k<z
    assert pmtiles.zxy_to_tileid(1, 0, 0) in (1, 2, 3, 4)
    assert pmtiles.zxy_to_tileid(2, 0, 0) >= 5
    # column math == scalar walk on a grid
    g = spark.range(256).select(
        F.lit(4).alias("z"), (F.col("id") % 16).alias("x"),
        (F.col("id") / 16).cast("long").alias("y"),
        F.col("id").alias("tile_bytes"))  # dummy col unused
    got = {(r.x, r.y): r.tile_id
           for r in pmtiles.with_tileid(g.drop("tile_bytes")
                                        .withColumn("tile_bytes",
                                                    F.lit(b"")))
           .collect()}
    for (x, y), tid in got.items():
        assert tid == pmtiles.zxy_to_tileid(4, x, y)


def test_directory_codec_roundtrip():
    entries = [(0, 0, 10, 1), (5, 10, 7, 1), (6, 17, 7, 2),
               (100, 10, 7, 1), (101, 24, 3, 1)]
    buf = pmtiles._serialize_dir(entries)
    assert pmtiles._parse_dir(buf) == entries
    # offset 0 shorthand used when clustered: entry 101 follows 6's
    # blob chain (17+7=24) -> serialized offset byte is 0
    vals = buf  # structural: parse again after a gzip round trip
    assert pmtiles._parse_dir(bytes(vals)) == entries


def test_pmtiles_roundtrip(spark, sf_dir, tmp_path):
    tiles = _tiles(spark, sf_dir)
    out = str(tmp_path / "a.pmtiles")
    info = pmtiles.write_pmtiles(tiles, out, {"name": "synth"})
    orig = {(r.z, r.x, r.y): bytes(r.tile_bytes) for r in tiles.collect()}
    assert info["n_tiles"] == len(orig)
    back = {(r.z, r.x, r.y): bytes(r.tile_bytes)
            for r in pmtiles.read_pmtiles(spark, out).collect()}
    assert back == orig
    assert pmtiles.read_pmtiles_metadata(out) == {"name": "synth"}
    h = pmtiles._read_header(out)
    assert h["clustered"] and h["minzoom"] == h["maxzoom"] == 4


def test_pmtiles_structural_invariants(spark, sf_dir, tmp_path):
    tiles = _tiles(spark, sf_dir)
    out = str(tmp_path / "b.pmtiles")
    pmtiles.write_pmtiles(tiles, out, {})
    raw = open(out, "rb").read()
    assert raw[:7] == b"PMTiles" and raw[7] == 3
    h = pmtiles._read_header(out)
    entries = pmtiles._all_entries(out, h)
    ids = np.array([e[0] for e in entries])
    assert (np.diff(ids) > 0).all()  # strictly increasing
    # clustered: offsets are non-decreasing and chain through data
    offs = np.array([e[1] for e in entries])
    assert (np.diff(offs) >= 0).all()
    assert h["data_off"] + h["data_len"] == len(raw)
    # every blob decompresses
    for tid, o, ln, rl in entries[:50]:
        blob = raw[h["data_off"] + o: h["data_off"] + o + ln]
        gzip.decompress(blob)


def test_pmtiles_content_dedup_and_run_length(spark, tmp_path):
    """64 addresses, ONE distinct payload -> one stored blob; the
    consecutive-id entries collapse via run_length."""
    rows = [(3, x, y, bytearray(b"same-tile-bytes"))
            for x in range(8) for y in range(8)]
    tiles = spark.createDataFrame(
        rows, "z long, x long, y long, tile_bytes binary")
    out = str(tmp_path / "dedup.pmtiles")
    info = pmtiles.write_pmtiles(tiles, out, {})
    assert info["n_contents"] == 1
    assert info["n_tiles"] == 64
    assert info["n_entries"] < 64  # run-length collapsed
    back = pmtiles.read_pmtiles(spark, out).collect()
    assert len(back) == 64
    assert all(bytes(r.tile_bytes) == b"same-tile-bytes" for r in back)
    assert {(r.z, r.x, r.y) for r in back} == {
        (3, x, y) for x in range(8) for y in range(8)}


def test_pmtiles_leaf_directory_split(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setattr(pmtiles, "MAX_ROOT_ENTRIES", 100)
    tiles = _tiles(spark, sf_dir)  # 256 tiles at sf0.001
    out = str(tmp_path / "leaf.pmtiles")
    info = pmtiles.write_pmtiles(tiles, out, {})
    assert info["leaf_dirs"]
    orig = {(r.z, r.x, r.y): bytes(r.tile_bytes) for r in tiles.collect()}
    back = {(r.z, r.x, r.y): bytes(r.tile_bytes)
            for r in pmtiles.read_pmtiles(spark, out,
                                          entries_per_task=37).collect()}
    assert back == orig


def test_pmtiles_duplicate_addresses_raise(spark, tmp_path):
    dup = spark.createDataFrame(
        [(1, 0, 0, bytearray(b"a")), (1, 0, 0, bytearray(b"b"))],
        "z long, x long, y long, tile_bytes binary")
    with pytest.raises(ValueError, match="duplicate"):
        pmtiles.write_pmtiles(dup, str(tmp_path / "d.pmtiles"), {})


def test_pmtiles_multizoom_and_real_tile(spark, tmp_path):
    buf = open("/root/reference/test/data/"
               "mapbox-streets-v6-14-8714-8017.mvt", "rb").read()
    tiles = spark.createDataFrame(
        [(14, 8714, 8017, bytearray(buf)), (0, 0, 0, bytearray(b"root")),
         (1, 1, 1, bytearray(b"z1"))],
        "z long, x long, y long, tile_bytes binary")
    out = str(tmp_path / "mz.pmtiles")
    pmtiles.write_pmtiles(tiles, out, {"name": "streets"})
    h = pmtiles._read_header(out)
    assert (h["minzoom"], h["maxzoom"]) == (0, 14)
    back = {(r.z, r.x, r.y): bytes(r.tile_bytes)
            for r in pmtiles.read_pmtiles(spark, out).collect()}
    assert back[(14, 8714, 8017)] == buf
    assert back[(0, 0, 0)] == b"root" and back[(1, 1, 1)] == b"z1"


def test_pmtiles_not_a_file_rejected(tmp_path):
    p = tmp_path / "junk.pmtiles"
    p.write_bytes(b"Z" * 200)
    with pytest.raises(ValueError, match="not a PMTiles"):
        pmtiles._read_header(str(p))


def test_get_tile_two_read_lookup(spark, sf_dir, tmp_path, monkeypatch):
    """get_tile finds every stored tile (root-only AND leaf-split
    archives), answers run-length-spanned ids, and returns None for
    absent addresses."""
    tiles = _tiles(spark, sf_dir)
    orig = {(r.z, r.x, r.y): bytes(r.tile_bytes) for r in tiles.collect()}
    flat = str(tmp_path / "flat.pmtiles")
    pmtiles.write_pmtiles(tiles, flat, {})
    monkeypatch.setattr(pmtiles, "MAX_ROOT_ENTRIES", 64)
    leafy = str(tmp_path / "leafy.pmtiles")
    pmtiles.write_pmtiles(tiles, leafy, {})
    for path in (flat, leafy):
        for (z, x, y), want in list(orig.items())[::7]:
            assert pmtiles.get_tile(path, z, x, y) == want
        assert pmtiles.get_tile(path, 7, 1, 1) is None
        assert pmtiles.get_tile(path, 4, 100, 100) is None
    # run-length span: the dedup archive answers all 64 addresses
    rows = [(3, x, y, bytearray(b"same")) for x in range(8)
            for y in range(8)]
    dup = spark.createDataFrame(
        rows, "z long, x long, y long, tile_bytes binary")
    dpath = str(tmp_path / "dup.pmtiles")
    monkeypatch.setattr(pmtiles, "MAX_ROOT_ENTRIES", 16384)
    info = pmtiles.write_pmtiles(dup, dpath, {})
    assert info["n_entries"] < 64
    for x in range(8):
        for y in range(8):
            assert pmtiles.get_tile(dpath, 3, x, y) == b"same"
    assert pmtiles.get_tile(dpath, 3, 8, 0) is None


def test_directory_codec_hypothesis_roundtrip():
    """Property fuzz: any sorted entry list with positive lengths and
    arbitrary (clustered or not) offsets round-trips the column-varint
    directory codec exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    entry = st.tuples(
        st.integers(min_value=0, max_value=1 << 40),   # id gap
        st.integers(min_value=0, max_value=1 << 30),   # offset
        st.integers(min_value=1, max_value=1 << 20),   # length
        st.integers(min_value=1, max_value=100))       # run length

    @settings(max_examples=200, deadline=None)
    @given(st.lists(entry, min_size=1, max_size=60), st.randoms())
    def run(raw, rnd):
        tid = 0
        entries = []
        prev = None
        for gap, off, ln, rl in raw:
            tid += gap + 1
            if prev is not None and rnd.random() < 0.5:
                off = prev[1] + prev[2]  # exercise the 0-shorthand
            e = (tid, off, ln, rl)
            entries.append(e)
            prev = e
        buf = pmtiles._serialize_dir(entries)
        assert pmtiles._parse_dir(buf) == entries

    run()
