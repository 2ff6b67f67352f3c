"""Image-axis compute-dense scaling probe: real JPEG/PNG decode +
perceptual blockhash over an amplified image corpus — pure CPU work
(Huffman entropy decode, IDCT, DCT hashing) with no shuffle, the
regime where adding local cores is equivalent to adding cluster
executors (per-executor memory bandwidth stays unsaturated).

Usage: python tools/image_probe.py <cores> [amplify] [sf_dir]
Prints one JSON line {"cores": N, "images": D, "sec": S,
"images_per_sec": T}. Run at two core counts on the IDENTICAL input
to evidence the north_rule's two-cluster-size criterion on the IMAGE
side of the pipeline (the MinHash probe covers the text side).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vtzero_spark.engine import imagehash, synth  # noqa: E402
from vtzero_spark.engine.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    spark = get_spark("image-probe", cores=cores,
                      shuffle_partitions=max(2 * cores, 8))
    img = synth.images(spark, sf_dir, with_bytes=True) \
        .where(F.col("iid") % 5 == 0) \
        .select("image_id", "bytes", "fmt")
    amplified = img.select(
        F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("rep"),
        "image_id", "bytes", "fmt",
    ).select(
        F.concat("image_id", F.lit("-"), F.col("rep")).alias("image_id"),
        "bytes", "fmt",
    ).repartition(max(4 * cores, 16))

    # warm phase (excluded): JVM, parquet, and the ENCODE of the
    # corpus — the timed job measures decode+hash only
    amplified.persist().count()

    t0 = time.perf_counter()
    ph = imagehash.image_phash(amplified)
    row = ph.select(F.bit_xor("b0").alias("s"),
                    F.count("*").alias("n")).collect()[0]
    sec = time.perf_counter() - t0
    spark.stop()
    print(json.dumps({
        "cores": cores,
        "images": int(row["n"]),
        "sec": round(sec, 3),
        "images_per_sec": round(int(row["n"]) / sec, 1),
    }))


if __name__ == "__main__":
    main()
