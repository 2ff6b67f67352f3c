"""Per-partition checkpoint/resume with lineage + metrics.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". Pattern: the job is split into deterministic bucket waves
(bucket = hash(key) % n_buckets). Each wave writes its output under
out_dir/data/bucket=N/ and then atomically appends a manifest row
(bucket, rows, tiles, input path, wall time). On restart, completed
buckets are read from the manifest and skipped — an anti-join at the
plan level, so resume costs one scan of the manifest, not of the data.

This is the Iceberg-snapshot pattern expressed over plain parquet
(the container has no Iceberg runtime; the write/commit protocol is
identical: data first, manifest commit last).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _manifest_rows(out_dir: str) -> list[dict]:
    mpath = _manifest_path(out_dir)
    if not os.path.isdir(mpath):
        return []
    rows = []
    for fn in sorted(os.listdir(mpath)):
        if fn.endswith(".json") and not fn.startswith("."):
            with open(os.path.join(mpath, fn)) as fh:
                rows.append(json.load(fh))
    return rows


def _bucket_data_path(out_dir: str, row: dict) -> str:
    # pre-compaction manifests carry no path field
    return row.get("path") or os.path.join(
        out_dir, "data", f"bucket={row['bucket']}")


def completed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    return {r["bucket"] for r in _manifest_rows(out_dir)}


def run_with_checkpoint(
    spark: SparkSession,
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_dir: str,
    bucket_col: str,
    n_buckets: int = 8,
    lineage: dict | None = None,
) -> dict:
    """Run ``transform`` bucket-by-bucket with resume.

    Returns a summary dict {buckets_run, buckets_skipped, rows}.
    The bucket predicate is pushed into the source scan (partition /
    row-group pruning when the source is bucketed on the same key).
    """
    os.makedirs(_manifest_path(out_dir), exist_ok=True)
    done = completed_buckets(spark, out_dir)
    bucketed = source.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
    )
    # Materialize the bucketed source once so each bucket wave scans it
    # instead of recomputing the lineage n_buckets times. On a real
    # deployment the source is an Iceberg table partitioned on the
    # bucket key and this is partition pruning; in local mode a cache
    # plays that role.
    bucketed = bucketed.persist()
    ran, rows_total = 0, 0
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = bucketed.where(F.col("_bucket") == b).drop("_bucket")
        out = transform(part)
        path = os.path.join(out_dir, "data", f"bucket={b}")
        out.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        manifest_row = {
            "bucket": b,
            "rows": n,
            "path": path,
            "seconds": round(time.time() - t0, 3),
            "lineage": lineage or {},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        tmp = os.path.join(_manifest_path(out_dir), f".tmp-{b}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest_row, fh)
        os.replace(tmp, os.path.join(_manifest_path(out_dir), f"bucket-{b}.json"))
        ran += 1
        rows_total += n
    bucketed.unpersist()
    return {
        "buckets_run": ran,
        "buckets_skipped": len(done),
        "rows": rows_total,
    }


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Manifest-driven read (snapshot isolation in miniature): scan
    exactly the data paths the committed manifest references. A
    compaction that has written new files but not committed its
    manifest row is invisible; uncommitted/orphaned directories are
    never read.

    The ``bucket`` column is ALWAYS present and always derived from the
    manifest (a per-path literal), never from directory-name inference —
    so the schema is stable across the whole maintenance lifecycle
    (pristine ``bucket=N`` dirs and compacted ``bucket=N-cG`` dirs look
    identical to consumers). A filter on ``bucket`` still prunes whole
    buckets: the literal folds per union branch, so non-matching
    branches collapse to empty relations before any file is scanned."""
    rows = _manifest_rows(out_dir)
    base = os.path.join(out_dir, "data")
    if not rows:
        return spark.read.parquet(base)
    out = None
    for r in sorted(rows, key=lambda r: r["bucket"]):
        df = spark.read.parquet(_bucket_data_path(out_dir, r)) \
            .withColumn("bucket", F.lit(int(r["bucket"])))
        out = df if out is None else out.unionByName(df)
    return out


# --------------------------------------------------------- maintenance

def compact_bucket(spark: SparkSession, out_dir: str, bucket: int,
                   target_files: int = 1) -> dict:
    """Small-file compaction for one bucket, Iceberg-style: rewrite the
    bucket's (possibly many) parquet files into ``target_files``, into
    a NEW immutable directory, verify the row count, then atomically
    swap the manifest row's path. Readers see the old files until the
    manifest commit lands; the old directory is left for vacuum()."""
    mfile = os.path.join(_manifest_path(out_dir), f"bucket-{bucket}.json")
    with open(mfile) as fh:
        row = json.load(fh)
    src = _bucket_data_path(out_dir, row)
    gen = int(row.get("compaction_gen", 0)) + 1
    dst = os.path.join(out_dir, "data", f"bucket={bucket}-c{gen}")
    df = spark.read.parquet(src)
    df.coalesce(target_files).write.mode("overwrite").parquet(dst)
    n = spark.read.parquet(dst).count()
    if n != row["rows"]:
        raise RuntimeError(
            f"compaction row-count mismatch for bucket {bucket}: "
            f"{n} != {row['rows']}")
    row.update({"path": dst, "compaction_gen": gen,
                "compacted_from": src,
                "compacted_at": time.strftime("%Y-%m-%dT%H:%M:%S")})
    tmp = os.path.join(_manifest_path(out_dir), f".tmp-c{bucket}.json")
    with open(tmp, "w") as fh:
        json.dump(row, fh)
    os.replace(tmp, mfile)
    return row


def compact_all(spark: SparkSession, out_dir: str,
                target_files: int = 1,
                min_files: int = 2) -> dict:
    """Compact every committed bucket whose directory holds more than
    ``min_files`` parquet files. Returns {buckets_compacted, skipped}."""
    done = skipped = 0
    for row in _manifest_rows(out_dir):
        src = _bucket_data_path(out_dir, row)
        nfiles = sum(1 for f in os.listdir(src) if f.endswith(".parquet")) \
            if os.path.isdir(src) else 0
        if nfiles > min_files:
            compact_bucket(spark, out_dir, row["bucket"], target_files)
            done += 1
        else:
            skipped += 1
    return {"buckets_compacted": done, "skipped": skipped}


def vacuum(out_dir: str, grace_seconds: float = 3600.0) -> list[str]:
    """Remove data directories no committed manifest row references
    (superseded compaction inputs, aborted writes).

    Safe against READERS at any time (the manifest is their source of
    truth). Against concurrent WRITERS the protocol writes data before
    the manifest row, so a just-written, not-yet-committed bucket is
    unreferenced for a moment — Iceberg-style retention covers that
    window: directories modified within ``grace_seconds`` are kept.
    Pass 0 only when no write wave can be in flight."""
    import shutil

    data_dir = os.path.join(out_dir, "data")
    if not os.path.isdir(data_dir):
        return []
    referenced = {os.path.abspath(_bucket_data_path(out_dir, r))
                  for r in _manifest_rows(out_dir)}
    cutoff = time.time() - grace_seconds
    removed = []
    for d in sorted(os.listdir(data_dir)):
        full = os.path.abspath(os.path.join(data_dir, d))
        if not os.path.isdir(full) or full in referenced:
            continue
        try:
            if os.path.getmtime(full) > cutoff:
                continue  # possibly an in-flight write wave
        except OSError:
            continue
        shutil.rmtree(full)
        removed.append(full)
    return removed
