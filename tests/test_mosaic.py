"""Browse-imagery mosaic tiles (engine/mosaic.py).

Correctness contract:
- the Spark operator equals a serial numpy/pandas reference byte-for-
  byte on the decoded mosaic pixels (winner rule, placement, empty
  cells) over the real synthetic corpus at sf0.001;
- per-tile thumbnail count <= grid^2 (select-then-decode means the
  composite can never see more);
- PNG output round-trips losslessly through the in-repo decoder;
- the result is independent of input partitioning;
- corrupt payloads become n_failed counts (black cells), never task
  failures;
- plan shape: exactly two hash exchanges (the narrow min(iid) argmin
  and the tile composite), a broadcast fetch join (the corpus never
  shuffles), and no payload bytes inside any aggregate.
"""

import numpy as np
import pandas as pd
import pytest

from vtzero_spark.engine import png as PNG
from vtzero_spark.engine import synth
from vtzero_spark.engine.mosaic import mosaic_tiles
from vtzero_spark.engine.payload import (decode_payload, encode_payload,
                                         thumbnail)

# zoom-2 view of the 65536-unit synthetic world: 4x4 tiles of 16384
# units; grid 8 -> 2048-unit cells, 128-px mosaics
ZOOM, EXTENT, THUMB, GRID = 2, 16384, 16, 8


def _reference(pdf: pd.DataFrame, zoom=ZOOM, extent=EXTENT,
               thumb=THUMB, grid=GRID) -> dict:
    """Serial mosaic: {(z,x,y): (canvas, n_images, n_failed)}."""
    size = grid * thumb
    tiles: dict = {}
    pdf = pdf.copy()
    pdf["x"] = pdf["wx"] // extent
    pdf["y"] = pdf["wy"] // extent
    pdf["cx"] = (pdf["wx"] % extent) * grid // extent
    pdf["cy"] = (pdf["wy"] % extent) * grid // extent
    win = (pdf.sort_values("iid")
           .groupby(["x", "y", "cx", "cy"], as_index=False).first())
    for (x, y), grp in win.groupby(["x", "y"]):
        canvas = np.zeros((size, size, 3), dtype=np.uint8)
        n_ok = n_fail = 0
        for r in grp.itertuples():
            try:
                px = decode_payload(r.bytes, r.fmt)
            except (ValueError, NotImplementedError):
                n_fail += 1
                continue
            tb = thumbnail(px, thumb)
            canvas[r.cy * thumb:(r.cy + 1) * thumb,
                   r.cx * thumb:(r.cx + 1) * thumb] = tb
            n_ok += 1
        tiles[(zoom, int(x), int(y))] = (canvas, n_ok, n_fail)
    return tiles


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    df = synth.images(spark, sf_dir, with_bytes=True).cache()
    yield df
    df.unpersist()


def test_matches_serial_reference(spark, corpus):
    out = mosaic_tiles(corpus, zoom=ZOOM, extent=EXTENT,
                       thumb=THUMB, grid=GRID).collect()
    ref = _reference(corpus.select("iid", "wx", "wy", "bytes", "fmt")
                     .toPandas())
    assert {(r["z"], r["x"], r["y"]) for r in out} == set(ref)
    for r in out:
        canvas, n_ok, n_fail = ref[(r["z"], r["x"], r["y"])]
        assert (r["n_images"], r["n_failed"]) == (n_ok, n_fail)
        assert r["n_images"] <= GRID * GRID
        assert (r["w"], r["h"]) == (GRID * THUMB, GRID * THUMB)
        got = PNG.decode_rgb8(bytes(r["png"]))
        assert np.array_equal(got, canvas), (r["z"], r["x"], r["y"])


def test_partitioning_invariant(spark, corpus):
    a = {(r["z"], r["x"], r["y"]): bytes(r["png"])
         for r in mosaic_tiles(corpus, zoom=ZOOM,
                               extent=EXTENT).collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["png"])
         for r in mosaic_tiles(corpus.repartition(13, "phash"),
                               zoom=ZOOM, extent=EXTENT).collect()}
    assert a == b


def test_corrupt_payloads_count_not_fail(spark, corpus):
    from pyspark.sql import functions as F

    poisoned = corpus.withColumn("bytes", F.lit(b"\xff\xd8garbage"))
    rows = mosaic_tiles(poisoned, zoom=0, extent=65536,
                        grid=16).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_images"] == 0
    assert 0 < r["n_failed"] <= 16 * 16
    got = PNG.decode_rgb8(bytes(r["png"]))   # still a valid PNG
    assert not got.any()                     # all cells stayed black


def _tiny_df(spark, n=40):
    pdf = pd.DataFrame({
        "iid": np.arange(1, n + 1, dtype=np.int64),
        "wx": (np.arange(n, dtype=np.int64) * 997) % 16384,
        "wy": (np.arange(n, dtype=np.int64) * 601) % 16384,
        "fmt": ["png"] * n,
    })
    pdf["bytes"] = [encode_payload(int(7 * i + 1), 16, 16, "png")
                    for i in pdf["iid"]]
    return spark.createDataFrame(pdf)


def test_plan_shape(spark):
    """One narrow hash exchange for the min(iid) argmin, a broadcast
    fetch join (the corpus side never shuffles), one hash exchange for
    the tile composite — and the payload column stays out of every
    aggregate."""
    df = mosaic_tiles(_tiny_df(spark), zoom=0, extent=16384)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan, plan[:3000]
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, \
        plan[:3000]
    assert "partial_min" in plan.lower(), plan[:3000]
    # the argmin aggregate sees only the key, never bytes
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines and all("bytes" not in ln for ln in agg_lines), \
        agg_lines


def test_argmin_winner_rule_pinned(spark):
    """Two images in the same cell: smaller iid wins the slot."""
    pdf = pd.DataFrame({
        "iid": [10, 3],
        "wx": [100, 101],          # same z0 tile, same cell
        "wy": [100, 101],
        "fmt": ["png", "png"],
    })
    pdf["bytes"] = [encode_payload(7 * i + 1, 16, 16, "png")
                    for i in pdf["iid"]]
    df = spark.createDataFrame(pdf)
    rows = mosaic_tiles(df, zoom=0, extent=16384, thumb=4,
                        grid=4).collect()
    assert len(rows) == 1 and rows[0]["n_images"] == 1
    got = PNG.decode_rgb8(bytes(rows[0]["png"]))
    want = thumbnail(decode_payload(pdf["bytes"][1], "png"), 4)
    assert np.array_equal(got[:4, :4], want)


def test_attach_hook_is_byte_identical(spark, sf_dir):
    """mosaic_tiles(attach=...) (payload attached to winners only)
    must reproduce the bytes-first path exactly."""
    from pyspark.sql import functions as F
    from vtzero_spark.engine.payload import with_image_bytes

    raw = synth.images(spark, sf_dir).where(F.col("iid") % 16 == 1)
    old = mosaic_tiles(with_image_bytes(raw), zoom=2,
                       extent=16384, thumb=16, grid=8)
    new = mosaic_tiles(raw, zoom=2, extent=16384, thumb=16,
                       grid=8, attach=with_image_bytes)
    cols = ["z", "x", "y", "n_images", "n_failed"]
    o = sorted(tuple(r) for r in old.select(
        *cols, F.md5("png").alias("h")).collect())
    n = sorted(tuple(r) for r in new.select(
        *cols, F.md5("png").alias("h")).collect())
    assert o == n and len(o) > 0
