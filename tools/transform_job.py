"""spark-submit entry point: tileset transform — tile-join / vtzero-
filter as ONE distributed job over any archive form.

    read (mvt dir | MBTiles | PMTiles)
      -> GL-legacy feature filter        (--filter, engine/exprfilter)
      -> property keep/drop/rename       (--keep/--drop/--rename,
                                          engine/propmap)
      -> drop now-empty tiles            (unless --keep-empty)
      -> write (mvt dir | MBTiles | PMTiles)

Both transform stages are zero-shuffle tile rewrites, so the whole
job's data movement is the source scan and the sink write: at 100 TB
it runs at archive-read speed regardless of filter complexity. Prints
ONE JSON summary line. Examples:

    python tools/transform_job.py --in /data/tiles --out /tmp/out.mbtiles \\
        --filter '["==", "class", "street"]' --drop name,name_en

    /opt/spark/bin/spark-submit --master local[32] \\
        --py-files /tmp/vtzero_spark.zip tools/transform_job.py \\
        --in a.pmtiles --out b.pmtiles --rename class:kind
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _fmt(path: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    if path.endswith(".mbtiles"):
        return "mbtiles"
    if path.endswith(".pmtiles"):
        return "pmtiles"
    return "mvt"


def read_tiles(spark: SparkSession, path: str, fmt: str):
    from vtzero_spark.engine import mbtiles, mvt_files, pmtiles

    if fmt == "mbtiles":
        return mbtiles.read_mbtiles(spark, path)
    if fmt == "pmtiles":
        return pmtiles.read_pmtiles(spark, path)
    return mvt_files.read_mvt_files(spark, path).drop("path")


def write_tiles(tiles, path: str, fmt: str, name: str) -> None:
    from vtzero_spark.engine import mbtiles, mvt_files, pmtiles

    if fmt == "mbtiles":
        mbtiles.write_mbtiles(tiles, path, {"name": name, "format": "pbf"})
    elif fmt == "pmtiles":
        pmtiles.write_pmtiles(tiles, path, {"name": name})
    else:
        mvt_files.write_mvt_files(tiles, path).count()


def run(spark: SparkSession, args) -> dict:
    from vtzero_spark.engine import exprfilter, propmap

    t0 = time.time()
    tiles = read_tiles(spark, args.inp, _fmt(args.inp, args.in_format))
    stats_in = tiles.agg(
        F.count("*").alias("n"),
        F.sum(F.length("tile_bytes")).alias("b")).collect()[0]

    if args.filter:
        tiles = exprfilter.filter_tiles_expr(
            tiles, json.loads(args.filter), layer=args.layer)
    elif args.layer is not None:
        tiles = exprfilter.filter_tiles_expr(
            tiles, ["all"], layer=args.layer)
    keep = args.keep.split(",") if args.keep else None
    drop = args.drop.split(",") if args.drop else None
    rename = dict(p.split(":", 1) for p in args.rename.split(",")) \
        if args.rename else None
    if keep or drop or rename:
        tiles = propmap.remap_properties(
            tiles, keep=keep, drop=drop, rename=rename)
    if not args.keep_empty and (args.filter or args.layer is not None):
        tiles = tiles.where(F.col("num_layers") > 0)

    # one pass computes everything; the sink re-reads the checkpoint
    tiles = tiles.localCheckpoint(eager=True)
    stats_out = tiles.agg(
        F.count("*").alias("n"),
        F.sum(F.length("tile_bytes")).alias("b")).collect()[0]
    write_tiles(tiles, args.out, _fmt(args.out, args.out_format),
                args.name)
    return {
        "tiles_in": int(stats_in["n"]),
        "bytes_in": int(stats_in["b"] or 0),
        "tiles_out": int(stats_out["n"]),
        "bytes_out": int(stats_out["b"] or 0),
        "wall_s": round(time.time() - t0, 3),
        "out": args.out,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--in-format", choices=["mvt", "mbtiles", "pmtiles"])
    ap.add_argument("--out-format", choices=["mvt", "mbtiles", "pmtiles"])
    ap.add_argument("--filter", help="GL legacy filter JSON (-j)")
    ap.add_argument("--layer", help="layer selector (digits = ordinal)")
    ap.add_argument("--keep", help="comma list: only these keys survive")
    ap.add_argument("--drop", help="comma list: keys to remove (-x)")
    ap.add_argument("--rename", help="comma list of old:new (-R)")
    ap.add_argument("--keep-empty", action="store_true",
                    help="keep tiles the filter emptied")
    ap.add_argument("--name", default="transformed")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from vtzero_spark.engine.session import get_spark

    spark = get_spark("transform-job", cores=args.cores,
                      shuffle_partitions=2 * args.cores)
    try:
        print(json.dumps(run(spark, args)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
