"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set covers the engine's four pillars: tile assignment +
full MVT encode pipeline (throughput metric, images/sec), the two
spatial joins (PIP broadcast + salted, kNN k-ring), and the pipeline
operators (dedup/jaccard, quantized ANN).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from vtzero_spark.engine.session import get_spark  # noqa: E402
from vtzero_spark.engine import synth  # noqa: E402

HEADLINE = [
    "tile_assign",
    "mvt_tiles",
    "polygon_roundtrip",
    "streets_filter",
    "streets_filter_decoded",
    "pip",
    "pip_salted",
    "pip_cells",
    "knn",
    "raster_vector",
    "dedup_exact",
    "dedup_hashed",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_neardup",
    "embed_neardup",
    "ann_topk",
    "ivf_topk",
]


def run_suite(sf_dir: str, cores: int) -> dict:
    spark = get_spark("bench", cores=cores, shuffle_partitions=max(2 * cores, 16))
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once (excluded from timings)
    synth.images(spark, sf_dir).count()
    n_images = synth.images(spark, sf_dir).count()
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # force full materialization of every column (not just count)
        n = df.select(F.xxhash64(*df.columns).alias("h")).agg(F.count("h")).collect()[0][0]
        timings[name] = round(time.time() - t0, 3)
        timings[f"{name}__rows"] = int(n)
    spark.stop()
    total = sum(v for k, v in timings.items() if not k.endswith("__rows"))
    pipeline_sec = timings["tile_assign"] + timings["mvt_tiles"]
    return {
        "timings": timings,
        "total_sec": round(total, 3),
        "n_images": int(n_images),
        "images_per_sec": round(n_images / max(pipeline_sec, 1e-9), 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    res = run_suite(sf_dir, cores)
    queries = {k: v for k, v in res["timings"].items() if not k.endswith("__rows")}
    out = {
        "metric": "headline suite wall time (tile pipeline + spatial joins + pipeline ops)",
        "value": res["total_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cores": cores,
        "n_images": res["n_images"],
        "images_per_sec_tile_pipeline": res["images_per_sec"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
