"""Zoom-level feature thinning with attribute accumulation.

The low-zoom half of a tiling pipeline: at small z a tile holds far
more features than it can render, so each tile keeps every ``step``-th
feature in a deterministic pseudo-random order and the dropped
features ACCUMULATE onto their kept representative — count, weight
sum, integer centroid — preserving tile-level totals exactly while
bounding features-per-tile.  This is the relational re-derivation of
the drop/cluster/accumulate family vtzero's ecosystem callers apply
before encoding (vtzero itself imposes no feature budget — the
encoder takes whatever it is handed, layer.hpp builders append
unconditionally); the existing ``tiling.feature_budget`` pyramid
keeps a TOP-k and drops the remainder's mass, whereas this operator
is mass-conserving: sum(weight_sum) over the output equals the input
weight total per tile, a law the DuckDB oracle checks hash-exactly.

Determinism: the "random" drop order is an LCG re-mix of the feature
id (Numerical Recipes constants 1664525 / 1013904223 — public-domain
integer math), so Spark and DuckDB order identically and the kept
representative is reproducible run to run — the property tippecanoe
gets from its feature-index ordering.

Plan shape (the 100 TB story): pure-column tile assignment (no
shuffle) -> ONE Exchange on hash(z, x, y) for the ROW_NUMBER window
-> HashAggregate grouped on (z, x, y, grp).  HashPartitioning(z,x,y)
satisfies ClusteredDistribution(z,x,y,grp), so Catalyst re-uses the
window's Exchange for the aggregate and the whole operator is ONE
shuffle regardless of corpus size (asserted in
tests/test_thin.py::test_thin_plan_single_exchange).  Per-task state
is the window sort of one tile's features — bounded by exactly the
quantity thinning shrinks, and the output row count is input/step,
so downstream encode cost falls with the same factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .synth import EXTENT, ZOOM
from .tiling import assign_tiles, assign_tiles_sql

# LCG re-mix for the deterministic drop order (Numerical Recipes
# constants; public domain). Mod 2^32 keeps iid*A+B inside int64 for
# any iid < ~5.5e12 — far above the amplified bench corpora.
_AT, _BT, _MT = 1664525, 1013904223, 1 << 32


def thin_accumulate(
    pts: DataFrame,
    step: int = 4,
    zoom: int = ZOOM,
    extent: int = EXTENT,
    weight: str = "weight",
) -> DataFrame:
    """Thin ``pts`` (iid, wx, wy, ``weight``) to one representative per
    ``step`` features per tile, accumulating the dropped features.

    Output: one row per kept representative —
      z, x, y, grp        tile address + within-tile group ordinal
      kept_iid            the representative (first of the group in
                          LCG order — deterministic)
      kept_loc_x/_y       its tile-local coordinates
      n_src               features accumulated (<= step)
      weight_sum          exact sum of the group's weights
      cx, cy              integer centroid of the group (tile-local)

    All integer math; hash-exact against thin_accumulate_sql().
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    t = assign_tiles(pts, zoom=zoom, extent=extent)
    t = t.withColumn("_rk", (F.col("iid") * _AT + _BT) % _MT)
    w = Window.partitionBy("z", "x", "y").orderBy("_rk", "iid")
    t = t.withColumn("_p", F.row_number().over(w))
    g = (
        t.groupBy(
            "z", "x", "y",
            F.expr(f"(_p - 1) div {step}").cast("long").alias("grp"),
        )
        .agg(
            F.min_by("iid", "_p").alias("kept_iid"),
            F.min_by("loc_x", "_p").alias("kept_loc_x"),
            F.min_by("loc_y", "_p").alias("kept_loc_y"),
            F.count(F.lit(1)).alias("n_src"),
            F.sum(weight).alias("weight_sum"),
            F.sum("loc_x").alias("_slx"),
            F.sum("loc_y").alias("_sly"),
        )
    )
    return g.select(
        "z", "x", "y", "grp", "kept_iid", "kept_loc_x", "kept_loc_y",
        "n_src", "weight_sum",
        F.expr("_slx div n_src").cast("int").alias("cx"),
        F.expr("_sly div n_src").cast("int").alias("cy"),
    )


def thin_pyramid(
    pts: DataFrame,
    zoom: int = ZOOM,
    extent: int = EXTENT,
    step: int = 4,
    weight: str = "weight",
) -> DataFrame:
    """The multi-zoom cluster pyramid (tippecanoe's --cluster-densest
    across zooms): level ``zoom`` keeps every feature as its own
    cluster; each coarser level re-thins the PREVIOUS level's
    representatives (weights ride along), so representative count
    decays ~``step`` x per level while every level's weight total
    equals the corpus total exactly — the zoom ladder a low-zoom map
    serves, mass-conserving at every z.

    Scale shape: one shuffle per level over a ~step-x-shrinking
    input (the compact_cells / raster_pyramid geometric-series
    discipline, total <= step/(step-1) of one pass), with a
    localCheckpoint per level keeping the plan linear. Laws pinned in
    tests/test_thin.py: per-level conservation, representative
    nesting (level z-1's kept ids are a subset of level z's), and
    level row counts monotonically non-increasing.
    """
    world = (1 << zoom) * extent
    levels = []
    cur = pts.select(
        "iid", "wx", "wy", F.col(weight).alias("weight"))
    for z in range(zoom, -1, -1):
        # at zoom z a tile is world/2^z units wide; loc coords are in
        # that level's native units (assign_tiles' world-model rule)
        tile_w = world >> z
        lv = thin_accumulate(
            cur, step=1 if z == zoom else step, zoom=z, extent=tile_w)
        lv = lv.localCheckpoint(eager=True)
        levels.append(lv)
        if z == 0:
            break
        # representatives carry their ORIGINAL world position and the
        # accumulated weight into the next-coarser level
        cur = lv.select(
            F.col("kept_iid").alias("iid"),
            (F.col("x") * tile_w + F.col("kept_loc_x")).alias("wx"),
            (F.col("y") * tile_w + F.col("kept_loc_y")).alias("wy"),
            F.col("weight_sum").alias("weight"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def thin_accumulate_sql(
    source_cte: str,
    step: int = 4,
    zoom: int = ZOOM,
    extent: int = EXTENT,
    weight: str = "weight",
) -> str:
    """DuckDB mirror of thin_accumulate over a CTE named
    ``source_cte`` carrying (iid, wx, wy, ``weight``)."""
    return f"""
  SELECT z, x, y, (_p - 1) // {step} AS grp,
         arg_min(iid, _p) AS kept_iid,
         arg_min(loc_x, _p) AS kept_loc_x,
         arg_min(loc_y, _p) AS kept_loc_y,
         COUNT(*) AS n_src,
         CAST(SUM({weight}) AS BIGINT) AS weight_sum,
         CAST(CAST(SUM(loc_x) AS BIGINT) // COUNT(*) AS INT) AS cx,
         CAST(CAST(SUM(loc_y) AS BIGINT) // COUNT(*) AS INT) AS cy
  FROM (
    SELECT t.*, (iid * {_AT} + {_BT}) % {_MT} AS _rk,
           ROW_NUMBER() OVER (
             PARTITION BY z, x, y ORDER BY (iid * {_AT} + {_BT}) % {_MT}, iid
           ) AS _p
    FROM ({assign_tiles_sql(source_cte, zoom, extent, 0)}) t
  ) p
  GROUP BY z, x, y, (_p - 1) // {step}"""
