"""spark-submit entry point: corpus -> every archive form in one job.

The packaging end of the pipeline: encode the corpus's tiles once,
then emit each serving artifact a tile stack actually ships —

  - ``tiles/``        one ``{z}-{x}-{y}.mvt`` file per tile
                      (engine/mvt_files.py, executor-side writes)
  - ``tileset.mbtiles``  MBTiles 1.3 (engine/mbtiles.py; distributed
                      shard write + single-writer merge, metadata
                      rows incl. TileJSON ``json`` per spec)
  - ``tileset.pmtiles``  PMTiles v3 (engine/pmtiles.py; Hilbert ids,
                      content dedup, range-servable directories)
  - ``tilejson.json`` TileJSON 3.0 document (engine/enrich.py)

The tile DataFrame is computed ONCE and localCheckpointed, so the
three archive writes share the encode work. Prints ONE JSON summary
line. Example:

    /opt/spark/bin/spark-submit --master local[32] \
        --py-files /tmp/vtzero_spark.zip \
        tools/archive_job.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/archive_out
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession

# importable under plain `python tools/archive_job.py` too (under
# spark-submit the package arrives via --py-files instead)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run(spark: SparkSession, sf_dir: str, out_dir: str,
        formats: list[str]) -> dict:
    from vtzero_spark.engine import (
        assemble, enrich, geomops, mbtiles, mvt_files, pmtiles, synth,
        tiling,
    )

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    img = synth.images(spark, sf_dir)
    feats = geomops.rect_stream_features(tiling.assign_tiles(img))
    tiles = assemble.encode_geom_tiles(feats).localCheckpoint(eager=True)
    n_tiles = tiles.count()
    meta = enrich.tileset_metadata(tiles, name="vtzero-spark-archive")
    summary: dict = {"n_tiles": n_tiles, "formats": {},
                     "encode_s": round(time.time() - t0, 3)}

    if "mvt" in formats:
        t = time.time()
        man = mvt_files.write_mvt_files(
            tiles, os.path.join(out_dir, "tiles"))
        n = man.count()
        summary["formats"]["mvt"] = {
            "files": n, "secs": round(time.time() - t, 3)}
    if "mbtiles" in formats:
        t = time.time()
        info = mbtiles.write_mbtiles(
            tiles, os.path.join(out_dir, "tileset.mbtiles"),
            {"name": meta["name"], "format": "pbf",
             "minzoom": str(meta["minzoom"]),
             "maxzoom": str(meta["maxzoom"]),
             "json": json.dumps(
                 {"vector_layers": meta["vector_layers"]},
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
            "n_contents": info["n_contents"],
            "secs": round(time.time() - t, 3)}
    with open(os.path.join(out_dir, "tilejson.json"), "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    summary["total_s"] = round(time.time() - t0, 3)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/vtzero_archive_out")
    ap.add_argument("--formats", default="mvt,mbtiles,pmtiles")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    if args.fresh:
        shutil.rmtree(args.out, ignore_errors=True)
    spark = SparkSession.builder.appName("vtzero-archive").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    summary = run(spark, args.sf_dir, args.out,
                  args.formats.split(","))
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
