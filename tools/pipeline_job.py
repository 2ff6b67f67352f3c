"""spark-submit entry point for the full pipeline (north_rule contract).

Runs the flagship raster->vector pipeline — tile assignment + MVT
layer/tile encode — plus the two spatial joins, with per-partition
checkpoint/resume and lineage metrics, and prints ONE JSON summary
line. Designed to be submitted with the package shipped via
--py-files (no assumption that vtzero_spark is importable from the
driver's CWD):

    /opt/spark/bin/spark-submit \
        --master local[32] \
        --py-files /tmp/vtzero_spark.zip \
        tools/pipeline_job.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/pipeline_out --buckets 8

Resume: re-running with the same --out skips buckets already in the
manifest (kill it mid-run to exercise this). The same binary runs at
any parallelism level — the N-vs-4N scaling evidence in BENCH.md comes
from submitting this job at --master local[8] and local[32].
"""

from __future__ import annotations

import argparse
import json
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/vtzero_pipeline_out")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=1,
                    help="deterministic input amplification factor")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe --out first (no resume)")
    args = ap.parse_args()

    # Imports resolved via --py-files at executor AND driver side.
    from vtzero_spark.engine import assemble, checkpoint, joins, knn, synth, tiling
    from vtzero_spark.engine.synth import EXTENT, WORLD, ZOOM

    spark = SparkSession.builder.appName("vtzero-pipeline").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sc = spark.sparkContext
    cores = sc.defaultParallelism

    if args.fresh:
        shutil.rmtree(args.out, ignore_errors=True)

    t0 = time.time()
    img = synth.images(spark, args.sf_dir, repeat=args.repeat)
    n_images = img.count()

    # --- stage 1: tile pipeline under checkpoint/resume -----------------
    prop_spec = [("phash", 5, "phash"), ("fmt", 1, "fmt"), ("caption", 1, "caption")]

    def encode_pipeline(part):
        feats = tiling.assign_tiles(part, zoom=ZOOM, extent=EXTENT, buffer=64)
        feats = feats.select(
            "z", "x", "y", "layer_name",
            F.col("iid").alias("feature_ordinal"),
            F.col("iid").alias("feature_id"),
            "loc_x", "loc_y", "phash", "fmt", "caption",
        )
        return assemble.encode_point_tiles(feats, prop_spec=prop_spec)

    lineage = {
        "job": "tile-pipeline", "sf_dir": args.sf_dir,
        "zoom": ZOOM, "extent": EXTENT, "buffer": 64, "cores": cores,
    }
    summary = checkpoint.run_with_checkpoint(
        spark, img, encode_pipeline, f"{args.out}/tiles",
        bucket_col="image_id", n_buckets=args.buckets, lineage=lineage,
    )
    t_tiles = time.time() - t0

    # --- stage 2: spatial joins -----------------------------------------
    t1 = time.time()
    polys = synth.polygons(spark, args.sf_dir)
    n_pip = joins.pip_join(img, polys).count()
    queries = synth.knn_queries(spark, args.sf_dir, 20)
    # join on the long iid key (narrower shuffle than the image_id string)
    n_knn = knn.knn_join(spark, img, queries, k=5, world=WORLD,
                         point_id="iid").count()
    t_joins = time.time() - t1

    wall = time.time() - t0
    print(json.dumps({
        "job": "vtzero-pipeline",
        "cores": cores,
        "sf_dir": args.sf_dir,
        "n_images": n_images,
        "tiles": summary,
        "pip_rows": n_pip,
        "knn_rows": n_knn,
        "tile_pipeline_sec": round(t_tiles, 3),
        "joins_sec": round(t_joins, 3),
        "wall_sec": round(wall, 3),
        "images_per_sec": round(n_images / max(wall, 1e-9), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
