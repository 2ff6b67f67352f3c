"""spark-submit entry point: image corpus -> clustered marker map.

The serving-side capstone for the wavefront family: the marker layer
a slippy map actually draws at every zoom, with BOTH render decisions
made engine-side at corpus scale —

  1. **points**   — one marker per image (full-entropy positions;
                    in a deployment these are the Exif / assigned
                    coordinates the geotag job recovers) with an
                    integer engagement weight,
  2. **cluster**  — the supercluster pyramid (hierarchy edges kept;
                    the weight rides every cluster as the exact-sum
                    reduce accumulator),
  3. **place**    — the mapbox-gl collision pass per zoom over the
                    CLUSTER markers, priority = heavier cluster
                    first (mass encoded into the wavefront's visit
                    order — no window, no shuffle: a monotone int64
                    key), label boxes sized like the rendered badge
                    (width grows with the digit count of
                    point_count; screen pixels scaled to world units
                    per zoom),
  4. **serve**    — per-zoom MVT point tiles carrying point_count,
                    sum_v (engagement), and the placed flag as
                    properties — a consumer renders placed==1
                    directly and has the rest for interaction,
  5. **archive**  — one PMTiles v3 file; read back and counted for
                    the consistency line.

Prints ONE JSON summary line. Example:

    /opt/spark/bin/spark-submit --master local[32] \
        --py-files /tmp/vtzero_spark.zip \
        tools/marker_job.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/marker_out

At 10^12 images every stage is shuffle-bounded: clustering and
placement are the two-tier wavefront (distributed rounds while the
frontier is executor-sized, bounded-collect tail), the priority key
is pure column math, the encode shuffles once on (z,x,y), and the
archive is the existing distributed sink.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# rendered-badge collision box: BASE_W + DIGIT_W per point_count
# digit, BOX_H tall, in screen pixels; world units per screen pixel
# at zoom z on the 2^WBITS world grid with 256-px tiles is
# 2^(WBITS - 8 - z)
BASE_W, DIGIT_W, BOX_H = 24, 12, 22
_PRI_SPAN = 1 << 31  # mass capacity of the priority key (documented)


def marker_boxes(levels: DataFrame, zoom: int, wbits: int = 16) -> DataFrame:
    """Label frames for one pyramid level: (pr, cluster_id, px, py,
    w, h) — ``pr`` is the wavefront visit order (heavier cluster
    first, cluster id ascending on ties), a MONOTONE int64 encoding
    ``(capacity - mass) << 32 | cluster_id`` computed plan-side (no
    window, no shuffle).  Box extents are the rendered badge's screen
    pixels scaled to world units at this zoom."""
    px_scale = 1 << max(wbits - 8 - zoom, 0)
    digits = F.length(F.col("n_points").cast("string"))
    return (levels.where(F.col("zoom") == zoom)
            .select(
                ((_PRI_SPAN - F.col("n_points")) * F.lit(1 << 32)
                 + F.col("cluster_id")).alias("pr"),
                "cluster_id",
                F.col("cx").alias("px"), F.col("cy").alias("py"),
                ((BASE_W + DIGIT_W * digits) * px_scale).alias("w"),
                (F.lit(BOX_H) * px_scale).alias("h")))


def run(spark: SparkSession, sf_dir: str, out_dir: str,
        min_zoom: int = 0, max_zoom: int = 4,
        radius: int = 128) -> dict:
    from vtzero_spark.engine import assemble, placement, pmtiles, synth
    from vtzero_spark.engine import supercluster as sc
    from vtzero_spark.engine.synth import EXTENT, WORLD

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    img = synth.images(spark, sf_dir).select(
        F.col("iid").alias("pid"),
        (F.abs(F.xxhash64("iid")) % WORLD).alias("px"),
        (F.abs(F.xxhash64("iid", F.lit(1))) % WORLD).alias("py"),
        (1 + F.abs(F.xxhash64("iid", F.lit(2))) % 97).alias("weight"))
    n_points = img.count()

    levels, _edges = sc.supercluster_hierarchy(
        img, radius=radius, min_zoom=min_zoom, max_zoom=max_zoom,
        value_col="weight")
    levels = levels.localCheckpoint(eager=True)

    placed_parts = []
    zoom_stats = {}
    for z in range(min_zoom, max_zoom + 1):
        lab = placement.place_labels(marker_boxes(levels, z),
                                     point_id="pr")
        part = (marker_boxes(levels, z)
                .select("pr", "cluster_id")
                .join(lab.select(F.col("pid").alias("pr"), "placed"), "pr")
                .select(F.lit(z).cast("int").alias("zoom"),
                        "cluster_id", "placed")
                .localCheckpoint(eager=True))
        placed_parts.append(part)
        agg = part.agg(
            F.count("*").alias("n"),
            F.sum(F.col("placed").cast("long")).alias("p")).collect()[0]
        zoom_stats[z] = {"clusters": int(agg.n), "placed": int(agg.p),
                         "blocked": int(agg.n - agg.p)}
    placed = placed_parts[0]
    for part in placed_parts[1:]:
        placed = placed.unionByName(part)

    # serve: per-zoom point tiles with point_count / engagement /
    # placed properties through the shared Arrow encoder
    wbits = WORLD.bit_length() - 1
    feats = (levels.join(placed, ["zoom", "cluster_id"])
             .withColumn("_span", F.expr(
                 f"shiftleft(CAST(1 AS BIGINT), {wbits} - zoom)"))
             .select(
                 F.col("zoom").alias("z"),
                 F.expr("cx div _span").alias("x"),
                 F.expr("cy div _span").alias("y"),
                 F.lit("markers").alias("layer_name"),
                 F.col("cluster_id").alias("feature_ordinal"),
                 F.col("cluster_id").alias("feature_id"),
                 F.expr(f"((cx % _span) * {EXTENT}) div _span")
                 .alias("loc_x"),
                 F.expr(f"((cy % _span) * {EXTENT}) div _span")
                 .alias("loc_y"),
                 F.col("n_points").alias("point_count"),
                 F.col("sum_v").alias("engagement"),
                 F.col("placed").cast("long").alias("placed")))
    tiles = assemble.encode_point_tiles_arrow(
        feats, prop_spec=[("point_count", 5, "point_count"),
                          ("engagement", 5, "engagement"),
                          ("placed", 5, "placed")])

    pm_path = os.path.join(out_dir, "markers.pmtiles")
    info = pmtiles.write_pmtiles(tiles, pm_path, {
        "name": "markers", "format": "pbf",
        "minzoom": str(min_zoom), "maxzoom": str(max_zoom)})
    n_tiles_back = len(pmtiles._all_entries(
        pm_path, pmtiles._read_header(pm_path)))

    return {
        "job": "marker_map",
        "n_points": int(n_points),
        "zooms": zoom_stats,
        "n_tiles": int(info.get("n_tiles", -1)),
        "n_tiles_readback": int(n_tiles_back),
        "pmtiles_bytes": os.path.getsize(pm_path),
        "wall_sec": round(time.time() - t0, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="/tmp/marker_out")
    ap.add_argument("--min-zoom", type=int, default=0)
    ap.add_argument("--max-zoom", type=int, default=4)
    ap.add_argument("--radius", type=int, default=128)
    args = ap.parse_args()
    spark = (SparkSession.builder.appName("marker_job").getOrCreate())
    try:
        summary = run(spark, args.sf_dir, args.out,
                      args.min_zoom, args.max_zoom, args.radius)
    finally:
        spark.stop()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
