"""spark-submit entry point for the CONTINUOUS tile pipeline.

The streaming twin of tools/pipeline_job.py: watch an input directory
for parquet files of point rows (or pre-encoded tile rows), and for
every micro-batch run the composed ingest -> assign -> encode -> lint
-> .mvt sink pipeline (engine/streaming.py stream_tile_pipeline).
Restart-safe: the structured-streaming checkpoint makes each batch
exactly-once (re-running with the same --checkpoint resumes where the
stream left off; replayed batches overwrite their own outputs
idempotently).

    /opt/spark/bin/spark-submit --master local[32] \
        --py-files /tmp/vtzero_spark.zip \
        tools/stream_job.py --in /data/landing --out /tmp/stream_out \
        --checkpoint /tmp/stream_ckpt

Run with --once to drain whatever is in the landing dir and exit
(micro-batch catch-up mode — what this sandbox's tests use); without
it the job runs until killed, picking up new files as they land.
The input schema is inferred from the files already in --in (at least
one file must exist at start; schema inference on a stream needs it).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True,
                    help="landing dir of parquet files (point or tile rows)")
    ap.add_argument("--out", required=True,
                    help="output root: tiles/, findings/, manifest/, quarantine/")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--source", choices=["points", "tiles"], default="points")
    ap.add_argument("--fail-severity", type=int, default=2,
                    help="quarantine tiles with findings at/above this severity")
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--once", action="store_true",
                    help="drain available input, then exit")
    ap.add_argument("--cores", type=int, default=0,
                    help="run on local[N] (0 = leave master to the "
                         "environment/spark-submit) — the N-vs-4N "
                         "scaling probe hook")
    args = ap.parse_args()

    # Imports resolved via --py-files at executor AND driver side;
    # for bare `python tools/stream_job.py` runs fall back to the
    # repo checkout the script lives in.
    try:
        from vtzero_spark.engine import streaming
        from vtzero_spark.engine.synth import EXTENT, ZOOM
    except ModuleNotFoundError:
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from vtzero_spark.engine import streaming
        from vtzero_spark.engine.synth import EXTENT, ZOOM

    builder = SparkSession.builder.appName("vtzero-stream-pipeline")
    if args.cores:
        builder = builder.master(f"local[{args.cores}]").config(
            "spark.sql.shuffle.partitions", str(max(args.cores * 2, 8))
        ).config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    schema = spark.read.parquet(args.in_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.in_dir)
    )

    prop_spec = None
    if args.source == "points":
        # property columns = whatever rides beyond the pipeline cols,
        # encoded as string values (type 1); richer specs come from
        # using the library API directly
        pipeline_cols = {"wx", "wy", "layer_name", "iid", "image_id",
                        "event_time", "ts"}
        prop_spec = [(f.name, 1, f.name) for f in schema.fields
                     if f.name not in pipeline_cols
                     and str(f.dataType) == "StringType()"]

    t0 = time.time()
    q = streaming.stream_tile_pipeline(
        sdf, args.out, args.checkpoint, prop_spec=prop_spec,
        zoom=ZOOM, extent=EXTENT, source=args.source,
        fail_severity=args.fail_severity,
    )
    if args.once:
        q.processAllAvailable()
        q.stop()
        n_tiles = spark.read.parquet(f"{args.out}/manifest").count()
        try:
            n_findings = spark.read.parquet(f"{args.out}/findings").count()
        except Exception:
            n_findings = 0
        print(json.dumps({
            "job": "vtzero-stream-pipeline", "source": args.source,
            "tiles_sunk": n_tiles, "lint_findings": n_findings,
            "wall_sec": round(time.time() - t0, 3),
        }))
        spark.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main()
