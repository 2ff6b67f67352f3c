"""Per-query isolation harness for optimization work (guide §1).

NOT the driver bench — bench.py stays frozen. This file exists so a
single query can be timed, re-timed, and have its physical plan
captured without paying for the whole suite.

Usage:
    python bench_extra.py time  q1 [q2 ...]   # N trials each, prints JSON
    python bench_extra.py plan  q1 [q2 ...]   # writes plans/r06/<q>_<tag>.txt
    python bench_extra.py noop  q1 [q2 ...]   # noop-sink timing (guide §1.4)

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_TRIALS,
PLAN_TAG (default "before") for the plan filename suffix.
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


def _registry():
    import bench as benchmod

    return {**entrymod.queries(), **benchmod.BENCH_ONLY}


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    tag = os.environ.get("PLAN_TAG", "before")
    spark = get_spark("bench_extra", cores=cores,
                      shuffle_partitions=max(2 * cores, 16))
    qs = _registry()
    synth.images(spark, sf_dir).count()  # warm JVM + parquet footers

    if mode == "plan":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            path = f"plans/r06/{name}_{tag}.txt"
            with open(path, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print(path)
        spark.stop()
        return

    out: dict[str, list[float]] = {}
    for _ in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.select(F.xxhash64(*df.columns).alias("h")) \
                    .agg(F.count("h")).collect()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({"sf": sf_dir, "cores": cores, "trials": out,
                      "min": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
