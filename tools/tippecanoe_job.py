"""spark-submit entry point: GeoJSON text files -> tile archive.

The tippecanoe shape end to end, distributed: line-delimited GeoJSON
Feature files (``.geojsonl`` / ndjson) scan as a text source, parse
pure-JVM, fan out to their bbox's tiles, clip, encode (two Arrow
kernel passes, one shuffle — engine/geojson.geojson_to_tiles), and
land as MBTiles and/or PMTiles plus the TileJSON document.

    /opt/spark/bin/spark-submit --master local[32] \
        --py-files /tmp/vtzero_spark.zip \
        tools/tippecanoe_job.py --src '/data/*.geojsonl' \
        --out /tmp/tiles --zoom 4 --buffer 64

With --src omitted the job synthesizes the corpus's GeoJSON lines
from the deterministic images table (no external data in this
sandbox) — the same text the test suite pins against the scalar
clip oracle.
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


def synth_lines(spark: SparkSession, sf_dir: str):
    from vtzero_spark.engine import synth

    # a real .geojsonl source arrives in file splits; give the
    # synthesized twin the same width (AQE coalesces the iid-dedup
    # shuffle to 1-2 byte-small partitions otherwise, and every
    # downstream stage would inherit that width)
    img = synth.images(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism * 2)
    return img.select(F.format_string(
        '{"type":"Feature","id":%d,"properties":{},'
        '"geometry":{"type":"Polygon","coordinates":'
        '[[[%d,%d],[%d,%d],[%d,%d],[%d,%d],[%d,%d]]]}}',
        "iid", "wx", "wy",
        F.col("wx") + F.col("w"), "wy",
        F.col("wx") + F.col("w"), F.col("wy") + F.col("h"),
        "wx", F.col("wy") + F.col("h"), "wx", "wy").alias("geojson"))


def run(spark: SparkSession, lines, out_dir: str, zoom: int,
        buffer: int, formats: list[str]) -> dict:
    from vtzero_spark.engine import enrich, geojson, mbtiles, pmtiles
    from vtzero_spark.engine.synth import EXTENT

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    tiles = geojson.geojson_to_tiles(
        lines, zoom=zoom, extent=EXTENT, buffer=buffer) \
        .localCheckpoint(eager=True)
    n = tiles.count()
    meta = enrich.tileset_metadata(tiles, name="tippecanoe-job")
    summary: dict = {"n_tiles": n, "encode_s": round(time.time() - t0, 3),
                     "formats": {}}
    if "mbtiles" in formats:
        t = time.time()
        info = mbtiles.write_mbtiles(
            tiles, os.path.join(out_dir, "tileset.mbtiles"),
            {"name": meta["name"], "format": "pbf",
             "json": json.dumps({"vector_layers": meta["vector_layers"]},
                                sort_keys=True)})
        summary["formats"]["mbtiles"] = {
            "n_tiles": info["n_tiles"], "nbytes": info["nbytes"],
            "secs": round(time.time() - t, 3)}
    if "pmtiles" in formats:
        t = time.time()
        info = pmtiles.write_pmtiles(
            tiles, os.path.join(out_dir, "tileset.pmtiles"), meta)
        summary["formats"]["pmtiles"] = {
            "n_entries": info["n_entries"], "nbytes": info["nbytes"],
            "secs": round(time.time() - t, 3)}
    with open(os.path.join(out_dir, "tilejson.json"), "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    summary["total_s"] = round(time.time() - t0, 3)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=None,
                    help="glob of .geojsonl text files (one Feature "
                         "per line); omit to synthesize from --sf-dir")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/vtzero_tippecanoe_out")
    ap.add_argument("--zoom", type=int, default=4)
    ap.add_argument("--buffer", type=int, default=64)
    ap.add_argument("--formats", default="mbtiles,pmtiles")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    if args.fresh:
        shutil.rmtree(args.out, ignore_errors=True)
    spark = SparkSession.builder.appName("vtzero-tippecanoe").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    if args.src:
        lines = spark.read.text(args.src).select(
            F.col("value").alias("geojson"))
    else:
        lines = synth_lines(spark, args.sf_dir)
    summary = run(spark, lines, args.out, args.zoom, args.buffer,
                  args.formats.split(","))
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
