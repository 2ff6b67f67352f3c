"""Geofence enter/exit transitions (engine/geofence.py): batch
semantics vs a pandas brute force, and the stateful streaming twin
pinned stream==batch including state carried across micro-batches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import geofence, synth


def _fences_pdf(spark, sf_dir) -> pd.DataFrame:
    return synth.polygons(spark, sf_dir) \
        .select("pid", "cx", "cy", "r").toPandas()


def _brute(positions: pd.DataFrame, fences: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for dev, g in positions.sort_values(["ts", "event_id"]).groupby("device_id"):
        cur: set = set()
        for r in g.itertuples():
            now = {
                int(f.pid) for f in fences.itertuples()
                if abs(r.wx - f.cx) + abs(r.wy - f.cy) <= f.r
            }
            for pid in sorted(now - cur):
                rows.append((dev, pid, r.ts, r.event_id, "enter"))
            for pid in sorted(cur - now):
                rows.append((dev, pid, r.ts, r.event_id, "exit"))
            cur = now
    return pd.DataFrame(
        rows, columns=["device_id", "pid", "ts", "event_id", "transition"])


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df.sort_values(["device_id", "pid", "ts", "event_id"]) \
        .reset_index(drop=True)


def test_batch_matches_brute_force(spark, sf_dir):
    pos = geofence.device_positions(spark, sf_dir)
    fences = synth.polygons(spark, sf_dir)
    got = geofence.geofence_transitions(pos, fences).toPandas()
    want = _brute(pos.toPandas(), _fences_pdf(spark, sf_dir))
    assert len(want) > 50, "synthetic corpus should produce transitions"
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_first_inside_position_is_enter(spark):
    """A device whose FIRST event is inside emits enter at that event;
    boundary (L1 distance == r) counts as inside."""
    pos = spark.createDataFrame(pd.DataFrame({
        "device_id": [1, 1, 1],
        "event_id": [10, 11, 12],
        "ts": pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:01",
                              "2026-01-01 00:00:02"]),
        "wx": [100, 100 + 50, 400],   # inside, on boundary, outside
        "wy": [100, 100, 100],
    }))
    fences = spark.createDataFrame(
        pd.DataFrame({"pid": [7], "cx": [100], "cy": [100], "r": [50]}))
    fences = fences.withColumn("ring", F.expr(
        "array(struct(cx AS x, cy - r AS y), struct(cx + r AS x, cy AS y),"
        "      struct(cx AS x, cy + r AS y), struct(cx - r AS x, cy AS y),"
        "      struct(cx AS x, cy - r AS y))"))
    got = geofence.geofence_transitions(pos, fences).toPandas()
    got = _norm(got)
    assert list(got["transition"]) == ["enter", "exit"]
    assert list(got["event_id"]) == [10, 12]  # boundary row 11 is no change


def test_stream_matches_batch_across_microbatches(spark, sf_dir, tmp_path):
    """Streaming transitions == batch transitions when the positions
    arrive split over multiple micro-batches (membership state must
    carry across triggers)."""
    pos = geofence.device_positions(spark, sf_dir)
    fences = synth.polygons(spark, sf_dir)
    want = _norm(geofence.geofence_transitions(pos, fences).toPandas())

    src = str(tmp_path / "pos_in")
    # several files + maxFilesPerTrigger=1 => several micro-batches;
    # ORDER the rows so each device's timeline splits across triggers
    # in ts order (streaming state assumes in-order arrival per the
    # module contract, matching the batch window's ordering)
    pos.orderBy("ts", "event_id").coalesce(1).write.parquet(src)
    import glob
    import os
    files = sorted(glob.glob(src + "/part-*"))
    assert files
    # re-split the single ordered file into 3 ordered parquet files
    one = pd.read_parquet(files[0]).sort_values(["ts", "event_id"])
    for f in files:
        os.remove(f)
    n = len(one)
    for i in range(3):
        one.iloc[i * n // 3:(i + 1) * n // 3].to_parquet(
            f"{src}/part-split-{i}.parquet", index=False)

    sdf = spark.readStream.schema(pos.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        geofence.geofence_stream(sdf, _fences_pdf(spark, sf_dir))
        .writeStream.format("memory").queryName("geofence_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # at least two micro-batches actually ran
        assert len(q.recentProgress) >= 2
        got = _norm(spark.table("geofence_out").toPandas())
    finally:
        q.stop()
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_stream_rejects_oversized_fence_set(spark, sf_dir):
    big = pd.DataFrame({
        "pid": range(64), "cx": [0] * 64, "cy": [0] * 64, "r": [1] * 64})
    pos = geofence.device_positions(spark, sf_dir)
    with pytest.raises(ValueError, match="bitmask"):
        geofence.geofence_stream(pos, big)
