"""spark-submit entry point: geotagged image corpus -> tile archive.

The end-to-end graft story (BASELINE.json graft_cell: pyspark x image,
axes A+B): the ONLY location information in the input is what the
camera wrote into each payload's Exif segment. The job

  1. **ingest**   — parse every payload's Exif (engine/exif.py:
                    container walk, TIFF IFD parse, GPS DMS rationals
                    -> integer world grid); corrupt / GPS-less rows
                    are counted, not fatal (errors-as-data),
  2. **assign**   — zoom-Z tile from the recovered coordinate, one
                    point feature per image with orientation /
                    datetime / pixel-dims properties,
  3. **encode**   — fused per-tile MVT encode (one shuffle,
                    assemble.encode_point_tiles),
  4. **archive**  — PMTiles v3 (+ optional per-tile .mvt files),
  5. **scrub**    — the privacy leg: strip_exif over the same corpus
                    and verify NO payload still carries GPS (the
                    `exiftool -all=` discipline at corpus scale).

Prints ONE JSON summary line. Example:

    /opt/spark/bin/spark-submit --master local[32] \
        --py-files /tmp/vtzero_spark.zip \
        tools/geotag_job.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/geotag_out

At 10^12 images every stage is shuffle-bounded: ingest and scrub are
mapInPandas passes (no shuffle beyond the spread), assign is
plan-side arithmetic, encode shuffles once on (z,x,y), and the
archive writes are the existing distributed sinks.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run(spark: SparkSession, sf_dir: str, out_dir: str, zoom: int,
        write_mvt_dir: bool = False) -> dict:
    from vtzero_spark.engine import (
        assemble, enrich, exif, mvt_files, pmtiles, synth,
    )
    from vtzero_spark.engine.synth import EXTENT

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # the corpus: real JPEG/PNG payloads whose Exif is the only
    # carrier of position (attach_exif plants GPS from the synthesis
    # grid; a production run would read the parquet table directly)
    corpus = exif.attach_exif(
        synth.images(spark, sf_dir, with_bytes=True)
    ).localCheckpoint(eager=True)
    n_images = corpus.count()
    summary: dict = {"n_images": n_images,
                     "synth_s": round(time.time() - t0, 3)}

    # 1. ingest: position FROM THE BYTES
    t = time.time()
    idx = exif.exif_index(corpus)
    status_counts = {
        r["k"]: r["n"]
        for r in idx.groupBy(
            F.when(F.col("status") == "ok", "ok")
            .when(F.col("status").startswith("corrupt"), "corrupt")
            .otherwise(F.col("status")).alias("k")
        ).agg(F.count("*").alias("n")).collect()
    }
    ok = idx.filter(F.col("status") == "ok").localCheckpoint(eager=True)
    summary["ingest"] = {"status": status_counts,
                         "secs": round(time.time() - t, 3)}

    # 2+3. assign + encode (properties ride into the tile dictionary)
    t = time.time()
    shift = 16 - zoom  # world is 2^16 units; tile span 2^shift
    feats = ok.select(
        F.lit(zoom).cast("int").alias("z"),
        F.shiftright("wx", shift).cast("int").alias("x"),
        F.shiftright("wy", shift).cast("int").alias("y"),
        F.lit("images").alias("layer_name"),
        F.substring("image_id", 4, 12).cast("long").alias("feature_ordinal"),
        F.substring("image_id", 4, 12).cast("long").alias("feature_id"),
        # tile-local coordinates scaled to the MVT extent
        ((F.col("wx") % (1 << shift)) * EXTENT / (1 << shift))
        .cast("long").alias("loc_x"),
        ((F.col("wy") % (1 << shift)) * EXTENT / (1 << shift))
        .cast("long").alias("loc_y"),
        F.col("orientation").cast("long").alias("orientation"),
        F.col("dt"),
        F.col("px_w").cast("long").alias("px_w"),
        F.col("px_h").cast("long").alias("px_h"),
    )
    prop_spec = [("orientation", 5, "orientation"), ("dt", 1, "dt"),
                 ("px_w", 5, "px_w"), ("px_h", 5, "px_h")]
    tiles = assemble.encode_point_tiles(
        feats, prop_spec=prop_spec).localCheckpoint(eager=True)
    n_tiles = tiles.count()
    summary["encode"] = {"n_tiles": n_tiles,
                         "secs": round(time.time() - t, 3)}

    # 4. archive
    t = time.time()
    meta = enrich.tileset_metadata(tiles, name="geotag")
    info = pmtiles.write_pmtiles(
        tiles, os.path.join(out_dir, "geotag.pmtiles"), meta)
    summary["pmtiles"] = {"n_entries": info["n_entries"],
                          "nbytes": info["nbytes"],
                          "secs": round(time.time() - t, 3)}
    if write_mvt_dir:
        t = time.time()
        n = mvt_files.write_mvt_files(
            tiles, os.path.join(out_dir, "tiles")).count()
        summary["mvt_files"] = {"files": n,
                                "secs": round(time.time() - t, 3)}

    # 5. privacy scrub: strip all Exif, prove no GPS survives
    t = time.time()
    scrub_udf = F.udf(lambda b: exif.strip_exif(bytes(b)), "binary")
    scrubbed = corpus.withColumn("bytes", scrub_udf("bytes"))
    still = (exif.exif_index(scrubbed)
             .filter(F.col("wx").isNotNull()).count())
    summary["scrub"] = {"payloads_with_gps_after": still,
                        "secs": round(time.time() - t, 3)}

    summary["total_s"] = round(time.time() - t0, 3)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/vtzero_geotag_out")
    ap.add_argument("--zoom", type=int, default=4)
    ap.add_argument("--mvt-dir", action="store_true")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    if args.fresh:
        shutil.rmtree(args.out, ignore_errors=True)
    spark = SparkSession.builder.appName("vtzero-geotag").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    summary = run(spark, args.sf_dir, args.out, args.zoom,
                  write_mvt_dir=args.mvt_dir)
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
