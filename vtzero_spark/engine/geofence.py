"""Geofencing: enter/exit transition events for a stream of device
positions against a set of polygon fences.

The spatial axis of the streaming surface (streaming.py covers dedup,
payload gating, tile encode and lint; this adds the spatio-temporal
join). The reference has no streaming concept (SURVEY §2.10) — this is
engine-side surface over the same fence geometry pip_join uses.

Semantics (shared by batch and stream, pinned stream==batch in
tests/test_geofence.py): positions are processed per device in
(ts, event_id) order; a device ENTERS fence p at the first position
inside p whose previous position (or absence of one) was outside, and
EXITS p at the first position outside p while the previous was inside.
Membership is boundary-inclusive (same rule as pip_join's refine).

Scale shape:
- batch (`geofence_transitions`): memberships come from the broadcast
  pip join; the dense per-(device, fence) flag series is restricted to
  fences the device EVER hits (a distinct + re-join, not |events| x
  |fences|), and transitions are one lag window over that series.
- stream (`geofence_stream`): ONE applyInPandasWithState keyed by
  device; per-device state is the current membership set (bitmask over
  fence ids). The fence table rides in the closure — geofence sets are
  broadcast-sized by definition (same assumption as pip_join's
  broadcast tier); a fence set too large for that would shard devices
  by fence-cell region upstream.

Events synthesized from the TPC-H events table (wx/wy LCG-derived from
event_id — same discipline as synth.images).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType)

from . import synth
from .synth import WORLD

_GAX, _GBX = 40503, 19
_GAY, _GBY = 30269, 37


def device_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamped device positions from the events table: device =
    user_id, position LCG-derived from event_id (deterministic, SQL-
    reproducible)."""
    e = synth.load(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("device_id"),
        "event_id", "ts",
        ((F.col("event_id") * _GAX + _GBX) % WORLD).alias("wx"),
        ((F.col("event_id") * _GAY + _GBY) % WORLD).alias("wy"),
    )


TRANSITION_SCHEMA = StructType([
    StructField("device_id", LongType()),
    StructField("pid", LongType()),
    StructField("ts", TimestampType()),
    StructField("event_id", LongType()),
    StructField("transition", StringType()),
])


def geofence_transitions(positions: DataFrame, fences: DataFrame) -> DataFrame:
    """BATCH geofence: (device_id, pid, ts, event_id, transition) with
    transition in {'enter', 'exit'}.

    Plan: broadcast pip membership join -> distinct (device, fence)
    pairs ever hit -> dense flag series for those pairs only -> one
    lag window per (device, pid). An exit row carries the ts/event_id
    of the first OUTSIDE position (the event that made it an exit).
    """
    from .joins import pip_join

    hits = pip_join(positions, fences, point_id="event_id") \
        .select("device_id", "event_id", "pid") \
        .withColumn("_in", F.lit(1))
    pairs = hits.select("device_id", "pid").distinct()
    dense = positions.join(pairs, "device_id")
    flagged = dense.join(hits, ["device_id", "event_id", "pid"], "left") \
        .withColumn("_in", F.coalesce(F.col("_in"), F.lit(0)))
    w = Window.partitionBy("device_id", "pid").orderBy("ts", "event_id")
    t = flagged.withColumn("_prev", F.lag("_in", 1, 0).over(w))
    return t.where(F.col("_in") != F.col("_prev")).select(
        "device_id", "pid", "ts", "event_id",
        F.when(F.col("_in") == 1, F.lit("enter")).otherwise(F.lit("exit"))
        .alias("transition"),
    )


def geofence_stream(positions: DataFrame, fences_pdf: pd.DataFrame) -> DataFrame:
    """STREAMING geofence: same transition rows as
    geofence_transitions, one stateful operator keyed by device.

    ``fences_pdf``: pandas (pid, cx, cy, r) — diamond fences evaluated
    vectorized inside the state function (closure-shipped; broadcast-
    sized by assumption, see module docstring). State per device: the
    int64 bitmask of fences currently occupied (fence count <= 63
    enforced; a bigger set would shard upstream by fence region).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if len(fences_pdf) > 63:
        raise ValueError("geofence_stream holds membership as an int64 "
                         "bitmask: shard devices by fence region above "
                         "63 fences")
    pids = fences_pdf["pid"].to_numpy().astype(np.int64)
    cx = fences_pdf["cx"].to_numpy().astype(np.int64)
    cy = fences_pdf["cy"].to_numpy().astype(np.int64)
    rr = fences_pdf["r"].to_numpy().astype(np.int64)
    state_schema = StructType([StructField("mask", LongType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (device_id,) = key
        mask = state.get[0] if state.exists else 0
        chunks = list(pdfs)
        out_dev, out_pid, out_ts, out_eid, out_tr = [], [], [], [], []
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
            wx = pdf["wx"].to_numpy().astype(np.int64)
            wy = pdf["wy"].to_numpy().astype(np.int64)
            # membership matrix (n_events, n_fences), boundary inclusive
            inside = (np.abs(wx[:, None] - cx[None, :])
                      + np.abs(wy[:, None] - cy[None, :])) <= rr[None, :]
            masks = (inside.astype(np.int64)
                     << np.arange(len(pids), dtype=np.int64)[None, :]).sum(axis=1)
            ts_arr = pdf["ts"].to_numpy()
            eid = pdf["event_id"].to_numpy()
            # membership is memoryless, so the previous mask series is
            # just a shift — only rows whose mask CHANGED do any work
            prev = np.empty_like(masks)
            prev[0] = mask
            prev[1:] = masks[:-1]
            for i in np.flatnonzero(masks ^ prev):
                m, diff = int(masks[i]), int(masks[i] ^ prev[i])
                for j in range(len(pids)):
                    if diff >> j & 1:
                        out_dev.append(device_id)
                        out_pid.append(int(pids[j]))
                        out_ts.append(ts_arr[i])
                        out_eid.append(int(eid[i]))
                        out_tr.append("enter" if m >> j & 1 else "exit")
            if len(masks):
                mask = int(masks[-1])
        state.update((mask,))
        yield pd.DataFrame({
            "device_id": pd.Series(out_dev, dtype="int64"),
            "pid": pd.Series(out_pid, dtype="int64"),
            "ts": pd.Series(out_ts, dtype="datetime64[us]"),
            "event_id": pd.Series(out_eid, dtype="int64"),
            "transition": pd.Series(out_tr, dtype="object"),
        })

    return positions.groupBy("device_id").applyInPandasWithState(
        fn, TRANSITION_SCHEMA, state_schema, "append",
        GroupStateTimeout.NoTimeout)
