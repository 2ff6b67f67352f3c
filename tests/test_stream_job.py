"""End-to-end tests for the composed streaming tile pipeline
(engine/streaming.py stream_tile_pipeline — the job behind
tools/stream_job.py): file-fed micro-batch ingest -> assign -> encode
-> lint -> .mvt sink, checked stream==batch against the batch
operators, including on the REAL reference tile
(test/data/mapbox-streets-v6-14-8714-8017.mvt)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from vtzero_spark.engine import assemble, lint, streaming, synth, tiling

REF_TILE = "/root/reference/test/data/mapbox-streets-v6-14-8714-8017.mvt"


def test_stream_pipeline_tiles_mode_real_tile(spark, tmp_path):
    """The real 12-layer reference tile rides the composed stream
    (lint -> severity routing -> .mvt sink) BYTE-IDENTICAL into the
    tileset dir; a fatally-corrupt tile is quarantined, a warning-only
    tile (zero layers, severity 1) passes; stream findings equal the
    batch tile_lint of the same rows.

    fail_severity=3 (quarantine only unparseable tiles): the real
    streets tile carries severity-2 findings (1033 first_ring_not_outer
    + 20 duplicate_point_in_linestring — real-world tiles fail strict
    vtzero-check), so the strict default would quarantine it; a
    production sink passes lint-warned tiles through and keeps the
    findings as the QA side-channel, which is what this exercises."""
    data = open(REF_TILE, "rb").read()
    rows = [(14, 8714, 8017, bytearray(data)),
            (1, 0, 0, bytearray(b"\xff\xff not a tile")),  # fatal parse
            (2, 1, 1, bytearray(b""))]                     # zero layers: warn
    schema = "z long, x long, y long, tile_bytes binary"
    src = str(tmp_path / "tiles_in")
    # two source files -> two micro-batches at maxFilesPerTrigger=1
    spark.createDataFrame(rows[:1], schema).write.parquet(src + "/f1")
    spark.createDataFrame(rows[1:], schema).write.parquet(src + "/f2")

    out = str(tmp_path / "out")
    sdf = spark.readStream.schema(
        spark.read.parquet(src + "/*").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = streaming.stream_tile_pipeline(
        sdf, out, str(tmp_path / "ckpt"), source="tiles",
        fail_severity=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # sink: real tile byte-identical, warn tile present, corrupt absent
    sunk = sorted(os.listdir(f"{out}/tiles"))
    assert sunk == ["14-8714-8017.mvt", "2-1-1.mvt"]
    assert open(f"{out}/tiles/14-8714-8017.mvt", "rb").read() == data
    assert open(f"{out}/tiles/2-1-1.mvt", "rb").read() == b""

    # quarantine carries exactly the fatal tile, bytes intact
    qrows = spark.read.parquet(f"{out}/quarantine").collect()
    assert [(r["z"], r["x"], r["y"]) for r in qrows] == [(1, 0, 0)]
    assert bytes(qrows[0]["tile_bytes"]) == b"\xff\xff not a tile"

    # findings == batch tile_lint on the same rows
    got = sorted(
        (r["z"], r["x"], r["y"], r["check"], r["severity"], r["n"])
        for r in spark.read.parquet(f"{out}/findings")
        .select("z", "x", "y", "check", "severity", "n").collect())
    want = sorted(
        (r["z"], r["x"], r["y"], r["check"], r["severity"], r["n"])
        for r in lint.tile_lint(
            spark.createDataFrame(rows, schema)).collect())
    assert got == want and len(want) > 0

    # manifest covers exactly the sunk tiles with true sizes
    man = {(r["z"], r["x"], r["y"]): r["nbytes"]
           for r in spark.read.parquet(f"{out}/manifest").collect()}
    assert man == {(14, 8714, 8017): len(data), (2, 1, 1): 0}


def test_stream_pipeline_points_mode_matches_batch(spark, sf_dir, tmp_path):
    """points mode: the .mvt files produced by the composed stream
    decode to the same per-tile feature totals as the batch
    assign_tiles over the same input (the encode kernel itself is
    byte-identical to batch by construction — encode_point_tiles),
    and clean synth data yields zero quarantined tiles."""
    import __spark_entry__ as entry
    from vtzero_spark.engine.synth import EXTENT, ZOOM

    img = synth.images(spark, sf_dir).limit(2000)
    src = str(tmp_path / "pts_in")
    img.write.parquet(src)

    out = str(tmp_path / "out")
    sdf = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = streaming.stream_tile_pipeline(
        sdf, out, str(tmp_path / "ckpt"),
        prop_spec=entry.PROP_SPEC, source="points")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # collect every sunk tile across the per-batch subdirs
    got_rows = []
    tiles_root = f"{out}/tiles"
    for sub in sorted(os.listdir(tiles_root)):
        for fn in sorted(os.listdir(os.path.join(tiles_root, sub))):
            z, x, y = (int(s) for s in fn[:-4].split("-"))
            buf = open(os.path.join(tiles_root, sub, fn), "rb").read()
            got_rows.append((z, x, y, bytearray(buf)))
    assert got_rows, "stream sank no tiles"

    # decoded per-tile totals == batch assignment of the full input
    dec = assemble.decode_tiles(spark.createDataFrame(
        got_rows, "z long, x long, y long, tile_bytes binary"))
    got = dec.where(F.col("decode_status") == "ok") \
        .groupBy("z", "x", "y").count().toPandas() \
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    want = tiling.assign_tiles(spark.read.parquet(src), zoom=ZOOM,
                               extent=EXTENT, buffer=0) \
        .groupBy("z", "x", "y").count().toPandas() \
        .sort_values(["z", "x", "y"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ("z", "x", "y", "count"):
        assert (got[col].to_numpy(np.int64)
                == want[col].to_numpy(np.int64)).all(), col

    # no quarantined tiles on clean input; findings are warning-free
    assert spark.read.parquet(f"{out}/quarantine").count() == 0
    sev = spark.read.parquet(f"{out}/findings")
    assert sev.where(F.col("severity") >= 2).count() == 0
