"""Line label placement — the polyline counterpart to polylabel.

A road label goes at the half-length midpoint of the feature's
DOMINANT polyline (its longest part), rotated to the bearing of the
segment that contains that midpoint and normalized to reading
orientation (-90 <= angle < 90 — text is never upside down). That is
the standard cartographic placement (mapnik/MapLibre line placement
semantics), computed here ENTIRELY with Spark built-ins: posexplode,
lag, window sums, conditional aggregation — no Python in the plan, so
placement runs at whole-stage-codegen speed over any number of
features.

Plan shape: explode to vertices, then every window partitions by
(feature, part) or by feature — an explicit repartition on the
feature id lets HashPartitioning(fid) satisfy every window's
clustering, so the whole operator is ONE shuffle.

Edge cases: a part with a single vertex (or all-duplicate vertices)
has zero length; if the feature's longest part has zero length the
label sits on that part's first vertex at angle 0. Features with no
parts/vertices produce no row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["label_lines"]


def label_lines(features: DataFrame,
                id_col: str = "feature_id") -> DataFrame:
    """features(id_col, parts: array<array<struct<x,y>>>) -> one row
    per feature: (id_col, label_x, label_y, label_angle) at the
    half-length midpoint of the longest part."""
    fid = F.col(id_col)
    v = (features
         .repartition(id_col)
         .select(fid, F.posexplode("parts").alias("part", "_ring"))
         .select(fid, "part",
                 F.posexplode("_ring").alias("idx", "_pt"))
         .select(fid, "part", "idx",
                 F.col("_pt.x").cast("double").alias("px"),
                 F.col("_pt.y").cast("double").alias("py")))

    wp = Window.partitionBy(id_col, "part").orderBy("idx")
    seg = (v.withColumns({
        "x0": F.lag("px").over(wp), "y0": F.lag("py").over(wp)})
        .withColumns({
            "dx": F.col("px") - F.col("x0"),
            "dy": F.col("py") - F.col("y0")})
        .withColumn("seglen", F.sqrt(F.col("dx") ** 2 + F.col("dy") ** 2))
        .withColumn("cum", F.coalesce(
            F.sum("seglen").over(
                wp.rowsBetween(Window.unboundedPreceding, 0)),
            F.lit(0.0))))

    wtot = Window.partitionBy(id_col, "part")
    wfeat = Window.partitionBy(id_col).orderBy(
        F.desc("total"), F.asc("part"))
    parts = (seg.withColumn("total", F.max("cum").over(wtot))
             .withColumn("rank", F.dense_rank().over(wfeat))
             .where(F.col("rank") == 1))

    half = F.col("total") / 2
    # the first segment whose cumulative length reaches half; for a
    # zero-length longest part no segment qualifies and the fallback
    # below labels the part's first vertex
    cand = parts.where(F.col("seglen").isNotNull()
                       & (F.col("seglen") > 0)
                       & (F.col("cum") >= half))
    wpick = Window.partitionBy(id_col).orderBy("idx")
    hit = (cand.withColumn("pick", F.row_number().over(wpick))
           .where(F.col("pick") == 1)
           .withColumn("t", (half - (F.col("cum") - F.col("seglen")))
                       / F.col("seglen"))
           .select(
               fid,
               (F.col("x0") + F.col("t") * F.col("dx")).alias("label_x"),
               (F.col("y0") + F.col("t") * F.col("dy")).alias("label_y"),
               (F.pmod(F.degrees(F.atan2("dy", "dx")) + F.lit(90.0),
                       F.lit(180.0)) - F.lit(90.0)).alias("label_angle"),
           ))

    fallback = (parts.where(F.col("total") == 0)
                .where(F.col("idx") == 0)
                .select(fid, F.col("px").alias("label_x"),
                        F.col("py").alias("label_y"),
                        F.lit(0.0).alias("label_angle"))
                .join(hit.select(fid), on=id_col, how="anti"))
    return hit.unionByName(fallback)
