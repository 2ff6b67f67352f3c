"""Compute-dense scaling probe: the vectorized MinHash signature job
(64 affine-mod lanes per shingle, ~60 integer ops per input byte) over
an amplified documents table — the engine's arithmetic-bound regime,
where adding local cores is equivalent to adding cluster executors
(per-executor memory bandwidth stays unsaturated; see BENCH.md
controls).

Usage: python tools/scaling_probe.py <cores> [amplify] [sf_dir]
Prints one JSON line {"cores": N, "docs": D, "sec": S, "docs_per_sec": T}.
Run at two core counts on the IDENTICAL input to evidence the
north_rule's two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vtzero_spark.engine import synth, textops  # noqa: E402
from vtzero_spark.engine.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("scaling-probe", cores=cores,
                      shuffle_partitions=max(2 * cores, 8))
    docs = synth.load(spark, sf_dir, "documents").select("doc_id", "text")
    # deterministic amplification: every replica is a distinct doc
    amplified = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("rep"),
        "doc_id", "text",
    ).select(
        (F.col("doc_id") * amplify + F.col("rep")).alias("doc_id"), "text"
    ).repartition(max(4 * cores, 16))

    amplified.persist().count()  # warm: JVM, parquet, cache (excluded)

    t0 = time.perf_counter()
    sig = textops.minhash_signatures(amplified)
    # cheap full-materialization sink: summing one lane forces every
    # signature row out of the UDF without row-wise JVM string work
    n = (sig.select(F.bit_xor(F.element_at("sig", 1)).alias("s"),
                    F.count("*").alias("n")).collect())
    sec = time.perf_counter() - t0
    ndocs = int(n[0]["n"])
    spark.stop()
    print(json.dumps({
        "cores": cores,
        "docs": ndocs,
        "sec": round(sec, 3),
        "docs_per_sec": round(ndocs / sec, 1),
    }))


if __name__ == "__main__":
    main()
