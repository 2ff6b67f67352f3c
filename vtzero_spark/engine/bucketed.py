"""Bucketed tile-keyed storage — the co-located-join pattern.

Every per-tile operator in this engine (tile_diff, join_attrs,
enrich, overlay, the encode itself) keys on the tile address. At
100 TB the dominant cost of joining two tile archives is the shuffle
that co-locates equal keys; Spark's bucketed tables remove it
ENTIRELY when both sides were written with the same bucket spec: the
reader exposes each side's hash-bucket layout as its output
partitioning, so SortMergeJoin plans with ZERO Exchange nodes
(`spark.sql.sources.bucketing.enabled`, on by default). bucketBy +
sortBy also pre-sorts within buckets, so steady-state re-joins skip
the sort.

Scale notes:
- One-time cost: writing bucketed IS a shuffle (into n_buckets
  files per partition writer — use a tile-keyed repartition first so
  each task writes few buckets). You pay it once per archive, then
  every downstream join/groupBy on the key is exchange-free —
  the right trade for serve-many archives (tile stores are).
- Pick n_buckets ~ cluster parallelism at the target SF; both sides
  MUST match (Spark joins bucketed x bucketed without shuffle only
  on equal bucket counts; a mismatch falls back to shuffling the
  smaller layout).
- The table registration here uses the session catalog with an
  EXPLICIT path (external table), so the parquet+bucket-spec survive
  on disk; a production deployment would register the same spec in a
  shared metastore or use Iceberg's bucket partition transform —
  semantics identical.

Reference analog: none — vtzero is a codec; storage layout is
engine-side (SURVEY.md §2.11 scale notes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "TILE_KEYS"]

TILE_KEYS = ("z", "x", "y")


def write_bucketed(df: DataFrame, name: str, path: str,
                   keys: Sequence[str] = TILE_KEYS,
                   n_buckets: int = 16) -> None:
    """Write ``df`` as a bucketed+sorted external parquet table.

    The pre-repartition on the bucket keys makes each write task emit
    rows for few buckets (without it, every task appends to every
    bucket file — n_tasks x n_buckets small files, the classic
    bucketed-write mistake)."""
    keys = list(keys)
    (df.repartition(n_buckets, *keys)
       .write.mode("overwrite")
       .bucketBy(n_buckets, keys[0], *keys[1:])
       .sortBy(keys[0], *keys[1:])
       .option("path", path)
       .format("parquet")
       .saveAsTable(name))


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a table written by write_bucketed. Must go through the
    catalog name (``spark.table``): a plain ``spark.read.parquet`` of
    the same path sees the files but NOT the bucket spec, and every
    join shuffles again."""
    return spark.table(name)
