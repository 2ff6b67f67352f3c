"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for correctness-at-scale semantics first: AQE on (runtime
re-planning + skew-join splitting), Arrow transfer for all pandas UDFs,
shuffle partitions sized for the local harness but overridable for a
real cluster via SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "vtzero_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 8)
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # broadcast threshold: small dimension tables (polygon sets,
        # cell->polygon covering indexes) should always broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Catalyst constraint propagation spends O(plan size) driver
        # time inferring IsNotNull/equivalence predicates per action.
        # This engine's join keys are non-null BY CONSTRUCTION
        # (packed coordinates, synth ids, checkpointed projections),
        # so the inferred filters prune nothing here and planning is
        # pure overhead — measured ~9% of warm wall across the five
        # heaviest queries (plans differ only by the inferred Filter
        # nodes; results identical, full oracle gate re-run).  On a
        # cluster whose inputs DO carry null join keys the inferred
        # early filters can prune shuffle bytes — re-enable via
        # SPARK_GRAFT_CONSTRAINT_PROP=true.
        .config("spark.sql.constraintPropagation.enabled",
                os.environ.get("SPARK_GRAFT_CONSTRAINT_PROP", "false"))
    )
    # shuffle/spill on tmpfs when available: the sandbox's disk is the
    # noisiest shared resource; a real cluster would use local NVMe
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    return builder.getOrCreate()
