"""Distance-within radius join (joins.dwithin_join, the ST_DWithin
analog of the north rule's spatial-join family) and zonal statistics
(joins.zonal_stats, dense raster aggregated under polygon zones with
pixel-center sample semantics).

zonal_stats is oracle-bearing in __spark_entry__ (DuckDB cross-join
mirror); dwithin's window slot was handed to dbscan in round-5
session 17 (whose neighbor stage runs the identical radius join as a
self-join), so dwithin keeps a DIRECT DuckDB pin here
(test_dwithin_oracle_pin) plus the parts no hash gate can see:
brute-force parity of the cell-bucketed candidate cull, boundary
inclusivity, the 3x3 neighbor reach at cell edges, and the broadcast
plan shape.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import joins, synth
from vtzero_spark.engine.synth import WORLD


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


# --------------------------------------------------------- dwithin

def _brute_pairs(pts: pd.DataFrame, qs: pd.DataFrame, r: int) -> set:
    out = set()
    for q in qs.itertuples():
        d2 = (pts["wx"] - q.qx) ** 2 + (pts["wy"] - q.qy) ** 2
        for pid in pts.loc[d2 <= r * r, "image_id"]:
            out.add((q.qid, pid))
    return out


def test_dwithin_matches_brute_force(spark):
    """Random points x random queries at several radii == the O(n*m)
    cross-join answer exactly (the cell cull drops nothing)."""
    rng = np.random.RandomState(7)
    pts = pd.DataFrame({
        "image_id": [f"p{i}" for i in range(400)],
        "wx": rng.randint(0, WORLD, 400).astype("int64"),
        "wy": rng.randint(0, WORLD, 400).astype("int64"),
    })
    qs = pd.DataFrame({
        "qid": np.arange(30, dtype="int64"),
        "qx": rng.randint(0, WORLD, 30).astype("int64"),
        "qy": rng.randint(0, WORLD, 30).astype("int64"),
    })
    pdf = spark.createDataFrame(pts)
    qdf = spark.createDataFrame(qs)
    for r in (500, 1500, 5000):
        got = {
            (row.qid, row.image_id)
            for row in joins.dwithin_join(pdf, qdf, r).collect()
        }
        assert got == _brute_pairs(pts, qs, r), f"radius {r}"


def test_dwithin_boundary_inclusive_and_neighbor_cells(spark):
    """A point at EXACT distance r is matched (<=, not <), including
    when query and point sit in different grid cells (the 3x3 explode
    must reach across the cell edge); a point 1 unit past r is not."""
    r = 1000  # cell size rounds up to 1024
    # query at the right edge of cell 0, points across the boundary
    qs = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "qx": [1020], "qy": [512]}))
    pts = spark.createDataFrame(pd.DataFrame({
        "image_id": ["on_r", "past_r", "next_cell"],
        "wx": [1020 + r, 1020 + r + 1, 2000],
        "wy": [512, 512, 512],
    }))
    got = {(row.image_id, row.d2)
           for row in joins.dwithin_join(pts, qs, r).collect()}
    assert got == {("on_r", r * r), ("next_cell", 980 * 980)}


def test_dwithin_d2_is_exact_integer(spark, sf_dir):
    """d2 on the synthesized tables is the exact int64 squared
    distance (no float creep — the oracle hash depends on it)."""
    pts = synth.images(spark, sf_dir)
    qs = synth.radius_queries(spark, sf_dir)
    rows = joins.dwithin_join(pts, qs, 1500) \
        .select("qid", "qx", "qy", "wx", "wy", "d2").limit(200).collect()
    assert rows, "no pairs at sf0.001 radius 1500?"
    for row in rows:
        assert row.d2 == (row.wx - row.qx) ** 2 + (row.wy - row.qy) ** 2
        assert row.d2 <= 1500 * 1500


def test_dwithin_broadcasts_query_side_no_extra_shuffle(spark, sf_dir):
    """The exploded query index broadcasts; the image side's only
    Exchange is the iid-dedup inside the images derivation itself
    (the join adds none — the 10^12-image side never moves)."""
    pts = synth.images(spark, sf_dir)
    base = len(re.findall(r"\(\d+\) Exchange", _plan(pts)))
    df = joins.dwithin_join(pts, synth.radius_queries(spark, sf_dir), 1500)
    p = _plan(df)
    assert "BroadcastHashJoin" in p and "BroadcastExchange" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # `(n) Exchange` matches only shuffle exchanges, not the broadcast
    assert len(re.findall(r"\(\d+\) Exchange", p)) == base


# ----------------------------------------------------- zonal stats

def test_zonal_stats_matches_brute_force(spark, sf_dir):
    """Per-zone (n_pix, sum, min, max) == a pandas brute force over
    the same pixel grid and diamond zones (pixel-center semantics)."""
    pix = synth.pixel_grid(spark, grid=128)  # 16k pixels: fast brute
    polys = synth.polygons(spark, sf_dir)
    got = joins.zonal_stats(pix, polys).toPandas() \
        .sort_values("pid").reset_index(drop=True)

    pp = pix.toPandas()
    pz = polys.select("pid", "cx", "cy", "r").toPandas()
    rows = []
    for z in pz.itertuples():
        m = (pp["wx"] - z.cx).abs() + (pp["wy"] - z.cy).abs() <= z.r
        if m.any():
            v = pp.loc[m, "value"]
            rows.append((z.pid, int(m.sum()), int(v.sum()),
                         int(v.min()), int(v.max())))
    want = pd.DataFrame(
        rows, columns=["pid", "n_pix", "sum_v", "min_v", "max_v"]
    ).sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_zonal_stats_pixel_center_semantics(spark):
    """A zone whose ring covers a pixel's CELL but not its CENTER
    contributes nothing — the GDAL default, pinned explicitly."""
    pix = synth.pixel_grid(spark, grid=64)  # pixel size 1024, centers at +512
    # diamond centered between centers, radius too small to reach one:
    # nearest center is (512, 512), L1 distance 2*312=624 > 500
    polys = spark.createDataFrame(
        pd.DataFrame({"pid": [0], "cx": [824], "cy": [824], "r": [500]}))
    polys = polys.withColumn("ring", F.expr(
        "array(struct(cx AS x, cy - r AS y), struct(cx + r AS x, cy AS y),"
        "      struct(cx AS x, cy + r AS y), struct(cx - r AS x, cy AS y),"
        "      struct(cx AS x, cy - r AS y))"))
    assert joins.zonal_stats(pix, polys).count() == 0
    # grow the radius to reach the center exactly (boundary inclusive)
    polys2 = polys.drop("ring").withColumn("r", F.lit(624)).withColumn(
        "ring", F.expr(
            "array(struct(cx AS x, cy - r AS y), struct(cx + r AS x, cy AS y),"
            "      struct(cx AS x, cy + r AS y), struct(cx - r AS x, cy AS y),"
            "      struct(cx AS x, cy - r AS y))"))
    got = joins.zonal_stats(pix, polys2).collect()
    assert len(got) == 1 and got[0].n_pix == 1


def test_zonal_stats_broadcasts_zone_index(spark, sf_dir):
    """The raster side (the scale side) never shuffles before the
    partial aggregate: zone covering index broadcast, one Exchange
    total (the final groupBy pid)."""
    pix = synth.pixel_grid(spark)
    polys = synth.polygons(spark, sf_dir)
    p = _plan(joins.zonal_stats(pix, polys))
    assert "BroadcastHashJoin" in p and "BroadcastExchange" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # ONE shuffle exchange total: the final groupBy(pid); pixel_grid is
    # a local range scan and the join is broadcast
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    # map-side combine: partial HashAggregate below the exchange
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2


# -------------------------------------------------- raster stencil

def test_raster_stencil_matches_padded_numpy(spark):
    """Distributed halo-exchange 3x3 sum == one-shot zero-padded
    numpy convolution over the whole band (tile boundaries invisible),
    including a grid that is not a multiple of the tile size's
    neighbor structure (tile=32 on 128)."""
    from vtzero_spark.engine import raster

    GRID = 128
    pix = synth.pixel_grid(spark, grid=GRID)
    got = raster.raster_stencil(pix, GRID, tile=32).toPandas()
    pp = pix.toPandas()
    V = np.zeros((GRID, GRID), dtype=np.int64)
    V[pp["py"], pp["px"]] = pp["value"]
    P = np.pad(V, 1)
    want = sum(P[a:a + GRID, b:b + GRID]
               for a in range(3) for b in range(3))
    W = np.zeros((GRID, GRID), dtype=np.int64)
    W[got["py"], got["px"]] = got["conv_sum"]
    assert len(got) == GRID * GRID
    assert (W == want).all()


def test_raster_stencil_single_shuffle(spark):
    """The stencil plan shuffles ONCE (the groupBy tile feeding
    applyInPandas); halo replication is a narrow explode+filter."""
    from vtzero_spark.engine import raster

    df = raster.raster_stencil(synth.pixel_grid(spark, grid=128), 128, tile=32)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "FlatMapGroupsInPandas" in p or "FlatMapGroupsIn" in p


# -------------------------------------------------- raster pyramid

def test_raster_pyramid_laws_and_cross_engine(spark):
    """Overview pyramid: every parent equals the sum of its (up to 4)
    children, the apex equals the band total, and the whole pyramid
    matches the direct DuckDB grouping (associativity cross-check)."""
    import duckdb

    from vtzero_spark.engine import raster

    GRID = 128
    pix = synth.pixel_grid(spark, grid=GRID)
    got = raster.raster_pyramid(pix, GRID).toPandas()
    assert len(got) == (4 ** 8 - 1) // 3  # levels 7..0 over 128^2

    # parent == sum of children, every level
    for lvl in range(6, -1, -1):
        kids = got[got["level"] == lvl + 1].copy()
        kids["px"] //= 2
        kids["py"] //= 2
        want = kids.groupby(["px", "py"])["sum_v"].sum().reset_index()
        par = got[got["level"] == lvl][["px", "py", "sum_v"]]
        m = par.merge(want, on=["px", "py"], suffixes=("", "_k"))
        assert len(m) == len(par) and (m["sum_v"] == m["sum_v_k"]).all(), lvl

    apex = got[got["level"] == 0]["sum_v"].iloc[0]
    assert apex == pix.toPandas()["value"].sum()

    o = duckdb.sql(
        "WITH " + synth.pixel_grid_sql("pix", grid=GRID)[1:] + "\n"
        + raster.raster_pyramid_sql("pix", GRID)).df()

    def key(df):
        return df[["level", "px", "py", "sum_v"]].astype("int64") \
            .sort_values(["level", "px", "py"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(key(got), key(o))


# --------------------------------------------------- nearest fence

def test_nearest_fence_known_geometry(spark):
    """Hand-checked rotated-clamp distances: inside -> 0 (tie to the
    smallest pid), corner regime (nearest point is a vertex), edge
    regime (perpendicular foot on a +-1-slope edge)."""
    from vtzero_spark.engine import joins

    fences = spark.createDataFrame(pd.DataFrame({
        "pid": [3, 5], "cx": [0, 0], "cy": [0, 0], "r": [10, 10]}))
    pts = spark.createDataFrame(pd.DataFrame({
        "image_id": ["inside", "corner", "edge"],
        "wx": [1, 20, 20],
        "wy": [1, 0, 20],
    }))
    got = {r.image_id: (r.pid, r.d2x2)
           for r in joins.nearest_fence(pts, fences).collect()}
    assert got["inside"] == (3, 0)          # tie on d2x2=0 -> min pid
    assert got["corner"] == (3, 200)        # d = 10 to vertex (10, 0)
    assert got["edge"] == (3, 900)          # d = 30/sqrt(2) to edge x+y=10


def test_nearest_fence_matches_duckdb(spark, sf_dir):
    """Full argmin over the synth tables == the DuckDB QUALIFY oracle
    (cross-engine, exact int64 d2x2)."""
    import duckdb

    from vtzero_spark.engine import joins

    got = joins.nearest_fence(
        synth.images(spark, sf_dir), synth.polygons(spark, sf_dir)) \
        .select("image_id", "pid", "d2x2").toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    o = con.execute(
        "WITH " + synth.images_sql()[1:] + "," + synth.polygons_sql()[1:]
        + joins.nearest_fence_sql("images", "polys")).df()

    def key(df):
        df = df.copy()
        df["pid"] = df["pid"].astype("int64")
        df["d2x2"] = df["d2x2"].astype("int64")
        return df.sort_values("image_id").reset_index(drop=True)[
            ["image_id", "pid", "d2x2"]]

    assert len(got) > 0
    pd.testing.assert_frame_equal(key(got), key(o))


def test_nearest_fence_zero_shuffle(spark, sf_dir):
    """The argmin is a pure projection: NO join operator and no new
    Exchange beyond the input derivation's own."""
    from vtzero_spark.engine import joins

    pts = synth.images(spark, sf_dir)
    base = len(re.findall(r"\(\d+\) Exchange", _plan(pts)))
    p = _plan(joins.nearest_fence(pts, synth.polygons(spark, sf_dir)))
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == base


def test_nearest_fence_guards(spark, sf_dir):
    from vtzero_spark.engine import joins

    empty = synth.polygons(spark, sf_dir).where("pid < 0")
    with pytest.raises(ValueError, match="at least one"):
        joins.nearest_fence(synth.images(spark, sf_dir), empty)


def test_dwithin_oracle_pin(spark, sf_dir):
    """Direct DuckDB-parity pin for the retired window slot (round-5
    session 17 swapped dwithin -> dbscan): same CTE text the driver
    used, so the radius-join law keeps an explicit cross-engine gate
    alongside dbscan's oracle (whose nbr stage embeds the identical
    cross-join refine as a self-join)."""
    import duckdb

    import __spark_entry__ as entry

    got = entry.q_dwithin(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    sql = (f"WITH {synth.images_sql('images')},\n"
           f"{synth.radius_queries_sql('queries')}\n"
           + joins.dwithin_sql("images", "queries", entry.DW_RADIUS))
    o = con.execute(sql).df()

    cols = ["qid", "image_id", "d2"]

    def key(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    assert len(got) > 0
    pd.testing.assert_frame_equal(key(got), key(o), check_dtype=False)
