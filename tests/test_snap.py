"""Map matching (engine/snap.py): snap-to-nearest-segment exactness
vs a numpy brute force and the DuckDB SQL mirrors, the tie rule, the
covering-cell invariances, plan shape, and the streaming twin."""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import snap, synth, trajectory


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def segs(spark, sf_dir):
    return snap.roads(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    return trajectory.event_points(synth.load(spark, sf_dir, "events"))


# ------------------------------------------------------ road synthesis

def test_roads_uniform_length_and_in_world(segs):
    pdf = segs.toPandas()
    ab2 = (pdf.bx - pdf.ax) ** 2 + (pdf.by - pdf.ay) ** 2
    assert (ab2 == snap.LEN2).all()
    for c in ("ax", "ay", "bx", "by"):
        assert pdf[c].min() >= 0 and pdf[c].max() < synth.WORLD
    # polyline continuity: segment s ends where s+1 starts
    pdf = pdf.sort_values(["road_id", "seg"])
    nxt = pdf.groupby("road_id")[["ax", "ay"]].shift(-1).dropna()
    ends = pdf.groupby("road_id")[["bx", "by"]].apply(
        lambda g: g.iloc[:-1]).reset_index(drop=True)
    assert (nxt.reset_index(drop=True).values == ends.values).all()


# ------------------------------------------------- brute-force parity

def brute(pts_pdf: pd.DataFrame, segs_pdf: pd.DataFrame,
          radius: int = snap.RADIUS, len2: int = snap.LEN2,
          point_id: str = "event_id") -> pd.DataFrame:
    """Numpy spec: all pairs, exact integer key, argmin with the
    (d2xl, road_id, seg) tie rule, radius boundary inclusive."""
    P = pts_pdf[["wx", "wy"]].to_numpy(np.int64)
    A = segs_pdf[["ax", "ay"]].to_numpy(np.int64)
    B = segs_pdf[["bx", "by"]].to_numpy(np.int64)
    AB = B - A
    AP = P[:, None, :] - A[None, :, :]          # (n_pts, n_segs, 2)
    dot = (AP * AB[None, :, :]).sum(-1)
    tn = np.clip(dot, 0, len2)
    d2xl = (AP * AP).sum(-1) * len2 - 2 * tn * dot + tn * tn
    rid = segs_pdf.road_id.to_numpy(np.int64)
    seg = segs_pdf.seg.to_numpy(np.int64)
    rows = []
    for i in range(len(P)):
        k = np.lexsort((seg, rid, d2xl[i]))[0]
        if d2xl[i, k] <= radius * radius * len2:
            rows.append((pts_pdf[point_id].iat[i], rid[k], seg[k],
                         d2xl[i, k],
                         A[k, 0] * len2 + tn[i, k] * AB[k, 0],
                         A[k, 1] * len2 + tn[i, k] * AB[k, 1]))
    return pd.DataFrame(rows, columns=[point_id, "road_id", "seg",
                                       "d2xl", "sxn", "syn"]) \
        .astype("int64").sort_values(point_id).reset_index(drop=True)


def test_snap_matches_brute_force(spark, pts, segs):
    want = brute(pts.toPandas(), segs.toPandas())
    got = snap.snap_points(pts, segs).toPandas()[list(want.columns)] \
        .astype("int64").sort_values("event_id").reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_snap_engines_and_shuffle_tier_identical(spark, pts, segs):
    """pandas (vectorized, default), sql-broadcast, and sql-shuffle
    tiers are three executions of ONE contract — row-identical."""
    a = snap.snap_points(pts, segs).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    b = snap.snap_points(pts, segs, engine="sql").toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    c = snap.snap_points(pts, segs, engine="sql", broadcast=False) \
        .toPandas().sort_values("event_id").reset_index(drop=True)
    cols = list(a.columns)
    pd.testing.assert_frame_equal(a, b[cols], check_dtype=False)
    pd.testing.assert_frame_equal(a, c[cols], check_dtype=False)


def test_snap_cell_size_invariant(spark, pts, segs):
    """Any cell >= radius gives row-identical results (the covering
    proof does not depend on the cell size)."""
    a = snap.snap_points(pts, segs).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    b = snap.snap_points(pts, segs, cell=500).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_cell_below_radius_raises(spark, pts, segs):
    with pytest.raises(ValueError, match="cell must be >= radius"):
        snap.snap_points(pts, segs, radius=160, cell=100)


# ------------------------------------------- hand-built edge semantics

def _mini(spark, pts_rows, segs_rows):
    p = spark.createDataFrame(pts_rows, "event_id long, wx long, wy long")
    s = spark.createDataFrame(
        segs_rows, "road_id long, seg long, ax long, ay long, "
                   "bx long, by long")
    return p, s


def test_tie_breaks_to_smallest_road_then_seg(spark):
    # two identical-distance horizontal segments mirrored around y=100
    p, s = _mini(spark, [(1, 102, 100)],
                 [(7, 0, 100, 90, 105, 90),
                  (7, 1, 100, 110, 105, 110),
                  (3, 5, 100, 110, 105, 110)])
    out = snap.snap_points(p, s, radius=160, cell=160).collect()
    assert len(out) == 1
    assert (out[0].road_id, out[0].seg) == (3, 5)
    assert out[0].d2xl == 100 * snap.LEN2


def test_radius_boundary_inclusive(spark):
    # point exactly `radius` above the segment's interior
    p, s = _mini(spark, [(1, 102, 260), (2, 102, 261)],
                 [(7, 0, 100, 100, 105, 100)])
    out = {r.event_id: r for r in
           snap.snap_points(p, s, radius=160, cell=160).collect()}
    assert 1 in out and out[1].d2xl == 160 * 160 * snap.LEN2
    assert 2 not in out  # one unit past the boundary


def test_projection_clamps_to_endpoint(spark):
    # point beyond endpoint B: snapped position is B itself (tn=len2)
    p, s = _mini(spark, [(1, 120, 100)], [(7, 0, 100, 100, 105, 100)])
    r = snap.snap_points(p, s, radius=160, cell=160).collect()[0]
    assert (r.sxn, r.syn) == (105 * snap.LEN2, 100 * snap.LEN2)
    assert r.d2xl == 15 * 15 * snap.LEN2


def test_ragged_segment_raises(spark):
    p, s = _mini(spark, [(1, 102, 100)], [(7, 0, 100, 100, 107, 100)])
    with pytest.raises(Exception, match="densify"):
        snap.snap_points(p, s, radius=160, cell=160).collect()


# --------------------------------------------------- DuckDB SQL mirror

def test_sql_mirrors_match(spark, sf_dir, pts, segs):
    con = duckdb.connect()
    for t in ("supplier", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{sf_dir}/{t}.parquet'")
    base = (f"WITH {snap.roads_sql()}, "
            f"pts AS ({trajectory.event_points_sql('events')})")
    odf = con.sql(
        base + snap.snap_points_sql("pts", point_id="event_id")).df()
    got = snap.snap_points(pts, segs).toPandas()
    cols = ["event_id", "road_id", "seg", "d2xl", "sxn", "syn"]
    pd.testing.assert_frame_equal(
        got[cols].astype("int64").sort_values("event_id")
        .reset_index(drop=True),
        odf[cols].astype("int64").sort_values("event_id")
        .reset_index(drop=True))

    udf = con.sql(base + snap.road_usage_sql("pts")).df()
    ru = snap.road_usage(pts, segs).toPandas()
    pd.testing.assert_frame_equal(
        ru.astype("int64").sort_values("road_id").reset_index(drop=True),
        udf[list(ru.columns)].astype("int64").sort_values("road_id")
        .reset_index(drop=True))


# ---------------------------------------------------------- plan shape

def test_snap_pandas_plan_zero_shuffle_zero_join(spark, pts, segs):
    """The default tier: the point side is scan -> mapInPandas, full
    stop — no Exchange, no Join node of any kind."""
    p = plan(snap.snap_points(pts, segs))
    assert "MapInPandas" in p
    assert "Exchange" not in p
    assert "Join" not in p


def test_snap_sql_point_side_never_shuffles(spark, pts, segs):
    """The all-JVM twin: one broadcast hash join probe, zero
    Exchanges downstream of the point scan. The only Exchanges in the
    plan belong to the bounded dimension-side cell grouping."""
    p = plan(snap.snap_points(pts, segs, engine="sql"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # dimension prep: explode+groupBy -> at most its own exchanges;
    # the point side contributes none, so the broadcast subtree holds
    # every Exchange in the plan
    n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    seg_prep = plan(snap._seg_cells(segs, snap.RADIUS, snap.RADIUS))
    assert n_ex == len(re.findall(r"\(\d+\) Exchange", seg_prep))


def test_snap_shuffle_tier_plan(spark, pts, segs):
    p = plan(snap.snap_points(pts, segs, engine="sql", broadcast=False))
    assert "BroadcastHashJoin" not in p
    with pytest.raises(ValueError, match="broadcast tier"):
        snap.snap_points(pts, segs, broadcast=False)


# --------------------- retired window slots stay oracle-pinned here
# (round-5 session 13 swapped feature_lookup -> snap_points and
# tile_check -> road_usage; the retired queries keep their EXACT
# driver-style DuckDB gates below)

def _entry_duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem",):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_retired_feature_lookup_stays_oracle_green(spark, sf_dir):
    import __spark_entry__ as entry
    from vtzero_spark.engine import tiling

    con = _entry_duck(sf_dir)
    images = synth.images_sql("images")
    assigned = (f"assigned AS ({tiling.assign_tiles_sql('images', entry.ZOOM, entry.EXTENT, entry.BUFFER)})")
    odf = con.sql(f"""
WITH {images},
{assigned}
SELECT z, x, y, layer_name, min(iid) AS first_feature_id
FROM assigned GROUP BY z, x, y, layer_name""").df()
    got = entry.q_feature_lookup(spark, sf_dir).toPandas()
    key = ["z", "x", "y", "layer_name"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        odf[list(got.columns)].sort_values(key).reset_index(drop=True),
        check_dtype=False)


def test_retired_tile_check_stays_oracle_green(spark, sf_dir):
    import __spark_entry__ as entry
    from vtzero_spark.engine import tiling

    con = _entry_duck(sf_dir)
    images = synth.images_sql("images")
    assigned = (f"assigned AS ({tiling.assign_tiles_sql('images', entry.ZOOM, entry.EXTENT, entry.BUFFER)})")
    odf = con.sql(f"""
WITH {images},
{assigned}
SELECT z, x, y,
       CASE WHEN loc_x >= 0 AND loc_x < {entry.EXTENT}
             AND loc_y >= 0 AND loc_y < {entry.EXTENT}
            THEN 'ok' ELSE 'outside_extent' END AS check,
       count(*) AS n
FROM assigned GROUP BY 1, 2, 3, 4""").df()
    got = entry.q_tile_check(spark, sf_dir).toPandas()
    key = ["z", "x", "y", "check"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        odf[list(got.columns)].sort_values(key).reset_index(drop=True),
        check_dtype=False)


# ------------------------------------------------------- streaming twin

def test_snap_stream_matches_batch(spark, sf_dir, pts, segs, tmp_path):
    """snap_points is stateless per row, so the SAME function runs on
    a streaming frame (stream-static broadcast join) — two-file feed,
    append mode, rows identical to batch."""
    import os

    want = snap.snap_points(pts, segs).toPandas() \
        .sort_values("event_id").reset_index(drop=True)

    src = str(tmp_path / "snap_in")
    os.makedirs(src)
    med = pts.approxQuantile("event_id", [0.5], 0.0)[0]
    pts.where(F.col("event_id") <= med).coalesce(1).write.parquet(src + "/h1")
    pts.where(F.col("event_id") > med).coalesce(1).write.parquet(src + "/h2")
    schema = spark.read.parquet(src + "/h1").schema
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    q = (snap.snap_points(sdf, segs)
         .writeStream.format("memory").queryName("snap_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = spark.table("snap_out").toPandas() \
            .sort_values("event_id").reset_index(drop=True)
    finally:
        q.stop()
    pd.testing.assert_frame_equal(got[list(want.columns)], want,
                                  check_dtype=False)
