"""Versioned snapshot tables — the storage layer the north rule's
"Iceberg tables of image + caption pairs" sit on.

The container has no Iceberg runtime, so this implements the PUBLIC
Apache Iceberg table-spec ideas from scratch over plain parquet +
JSON metadata (no binary-format compatibility claimed):

- **Snapshot isolation**: every commit writes an immutable version
  file ``metadata/v%08d.json`` listing the table's data files; a
  reader resolves ONE version and sees that file list forever —
  concurrent appends never tear a scan.
- **Atomic commits with optimistic concurrency**: data files land
  first (parquet, executor-parallel), then the version file is
  created with O_EXCL — exactly one writer wins a version number;
  the loser re-reads the new head, re-merges its file list and
  retries, exactly the Iceberg commit loop.
- **Time travel**: ``read(spark, version=K)`` scans any retained
  snapshot.
- **Incremental reads**: ``read_incremental(A, B)`` returns only the
  files appended in (A, B] — the changelog scan a streaming backfill
  or a resumable pipeline consumes instead of re-reading the table.
- **File-skipping column stats**: ``append(stats_cols=[...])`` records
  per-file min/max in the snapshot (Iceberg's manifest column stats);
  ``read(where=[(col, op, val), ...])`` drops files the stats prove
  empty before Spark plans the scan — metadata pruning one tier above
  parquet footer/row-group pruning. At 100 TB this is the difference
  between listing 400k files and scanning the ~dozens a tile-range or
  time-range predicate actually touches.
- **Row-level deletes and upserts (copy-on-write)**: ``delete_where``
  and ``merge(df, key_col)`` rewrite ONLY the files that actually
  contain affected rows (stats prune → exact per-file probe), carry
  every other file into the new snapshot by reference, and commit
  atomically; conflicting concurrent rewrites of the same files fail
  with CommitConflict instead of resurrecting deleted rows.
- **Maintenance**: ``expire_snapshots`` retains the last N version
  files; ``remove_orphans`` deletes data files no retained snapshot
  references (with a grace window against in-flight commits, same
  discipline as engine/checkpoint.py's vacuum).

Relation to engine/checkpoint.py: that module is per-JOB resume (a
manifest of completed work buckets); this is the table abstraction
multiple jobs share. The pipeline shape is checkpoint-managed jobs
writing snapshot-table commits.

Scale note (honest bound): a version file holds the FULL data-file
list, so metadata is O(files) per snapshot — the reason real Iceberg
splits manifests. At 100 TB with ~256 MB files that is ~400k entries
(~40 MB JSON): driver-sized but not free; compact with
``compact_files`` (rewrite small files, one commit) before the list
grows pathological. Data-file paths are relative, so a table
directory is relocatable.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer won the version number (retried internally; this
    surfaces only when retries are exhausted)."""


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _version_file(path: str, v: int) -> str:
    return os.path.join(_meta_dir(path), f"v{v:08d}.json")


def _data_dir(path: str) -> str:
    return os.path.join(path, "data")


class SnapshotTable:
    """Handle to a snapshot table directory. Cheap to construct; all
    state lives on disk so any number of processes can hold handles."""

    def __init__(self, path: str):
        self.path = path

    # ------------------------------------------------------- lifecycle

    @classmethod
    def create(cls, path: str) -> "SnapshotTable":
        """Initialize an empty table (version 0, no files). Fails if a
        table already exists at ``path``."""
        os.makedirs(_meta_dir(path), exist_ok=True)
        os.makedirs(_data_dir(path), exist_ok=True)
        t = cls(path)
        snap = {"version": 0, "parent": None, "operation": "create",
                "ts": time.time(), "files": []}
        try:
            with open(_version_file(path, 0), "x") as f:
                json.dump(snap, f)
        except FileExistsError:
            raise ValueError(f"table already exists at {path}")
        return t

    def exists(self) -> bool:
        return os.path.exists(_version_file(self.path, 0))

    # ------------------------------------------------------- snapshots

    def current_version(self) -> int:
        """Head version by listing metadata/ — the directory listing is
        the source of truth (a version-hint file would just be a stale
        cache; Iceberg's catalogs exist to avoid this listing, a
        single-directory table doesn't need one)."""
        best = -1
        for name in os.listdir(_meta_dir(self.path)):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    continue
        if best < 0:
            raise ValueError(f"no table at {self.path}")
        return best

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        p = _version_file(self.path, v)
        if not os.path.exists(p):
            raise ValueError(
                f"version {v} not found (expired or never committed)")
        with open(p) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """Retained snapshots, oldest first (version/operation/ts/
        n_files) — the lineage record per table."""
        out = []
        for name in sorted(os.listdir(_meta_dir(self.path))):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(_meta_dir(self.path), name)) as f:
                    s = json.load(f)
                out.append({"version": s["version"],
                            "operation": s["operation"], "ts": s["ts"],
                            "n_files": len(s["files"]),
                            "n_rows": sum(fe["rows"] for fe in s["files"])})
        return out

    # --------------------------------------------------------- commits

    def _stage(self, df: DataFrame,
               stats_cols: list[str] | None = None) -> list[dict]:
        """Write df's partitions as parquet under data/<token>/ and
        return the file entries. Executor-parallel; nothing is visible
        to readers until the version file commits.

        ``stats_cols`` names numeric/string columns whose per-FILE
        min/max land in the metadata (Iceberg's manifest column stats)
        — the hook ``read(where=...)`` uses to skip whole files
        without opening a footer."""
        token = uuid.uuid4().hex[:12]
        stage_dir = os.path.join(_data_dir(self.path), token)
        df.write.mode("errorifexists").parquet(stage_dir)
        entries = []
        for name in sorted(os.listdir(stage_dir)):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(stage_dir, name)
            entries.append({
                "path": os.path.join("data", token, name),
                "bytes": os.path.getsize(full),
                "rows": -1,  # filled below
            })
        if not entries:
            return []  # empty micro-batch: nothing staged, no footer
        # per-file row counts + column min/max in ONE distributed
        # aggregate over the staged files, keyed by file name
        spark = df.sparkSession
        import pyspark.sql.functions as F
        aggs = [F.count(F.lit(1)).alias("count")]
        for c in stats_cols or []:
            aggs += [F.min(c).alias(f"min__{c}"),
                     F.max(c).alias(f"max__{c}")]
        stats = (spark.read.parquet(stage_dir)
                 .groupBy(F.input_file_name().alias("f"))
                 .agg(*aggs).collect())
        by_name = {os.path.basename(r["f"].split("?")[0]): r
                   for r in stats}
        for e in entries:
            r = by_name.get(os.path.basename(e["path"]))
            e["rows"] = int(r["count"]) if r is not None else 0
            if r is not None and stats_cols:
                e["stats"] = {c: [r[f"min__{c}"], r[f"max__{c}"]]
                              for c in stats_cols}
        return entries

    def _commit(self, new_files: list[dict], operation: str,
                replace: bool, removed_paths: set[str] | None = None,
                props: dict | None = None,
                max_retries: int = 20) -> int:
        """The optimistic-concurrency loop: merge against the current
        head, try to create head+1 with O_EXCL, re-merge on loss.

        ``removed_paths`` (copy-on-write rewrites: delete/merge) names
        data files the new files REPLACE. On a lost race the re-merge
        checks every removed path still exists in the new head — if a
        concurrent writer rewrote or dropped one of them, our staged
        files were derived from stale data and the commit must fail
        (Iceberg's serializable-conflict check), not silently resurrect
        deleted rows."""
        for _ in range(max_retries):
            head = self.current_version()
            parent = self.snapshot(head)
            if removed_paths:
                have = {e["path"] for e in parent["files"]}
                gone = removed_paths - have
                if gone:
                    raise CommitConflict(
                        f"concurrent rewrite of {sorted(gone)[:3]}... "
                        f"at {self.path}; retry the whole operation "
                        "against the new head")
                files = [e for e in parent["files"]
                         if e["path"] not in removed_paths] + list(new_files)
            elif replace:
                files = list(new_files)
            else:
                files = parent["files"] + list(new_files)
            snap = {"version": head + 1, "parent": head,
                    "operation": operation, "ts": time.time(),
                    "files": files}
            if removed_paths:
                snap["removed"] = sorted(removed_paths)
            if props:
                snap["props"] = props
            try:
                with open(_version_file(self.path, head + 1), "x") as f:
                    json.dump(snap, f)
                return head + 1
            except FileExistsError:
                continue  # lost the race; re-read head and retry
        raise CommitConflict(
            f"lost {max_retries} commit races at {self.path}")

    def append(self, df: DataFrame,
               stats_cols: list[str] | None = None,
               props: dict | None = None) -> int:
        """Stage df as new data files and commit them on top of the
        current head. Returns the committed version. ``stats_cols``
        records per-file min/max for those columns in the snapshot
        metadata (see ``_stage``), enabling ``read(where=...)`` to
        prune files without opening them. ``props`` lands verbatim in
        the snapshot (e.g. a streaming sink's batch-id marker)."""
        return self._commit(self._stage(df, stats_cols), "append",
                            replace=False, props=props)

    def last_stream_batch(self, query_name: str) -> int | None:
        """Newest committed stream_batch_id for ``query_name`` across
        retained snapshots — the replay-dedupe marker a foreachBatch
        sink checks before re-committing a micro-batch (Iceberg's
        spark.streaming query-id/batch-id snapshot properties).
        Returns None if no retained commit carries the marker; expired
        snapshots lose theirs, so keep_last must cover the restart
        horizon (documented in streaming.table_batch_sink)."""
        names = sorted(n for n in os.listdir(_meta_dir(self.path))
                       if n.startswith("v") and n.endswith(".json"))
        for name in reversed(names):  # newest first, one read each
            with open(os.path.join(_meta_dir(self.path), name)) as f:
                p = json.load(f).get("props") or {}
            if p.get("stream_query") == query_name:
                return int(p["stream_batch_id"])
        return None

    def overwrite(self, df: DataFrame,
                  stats_cols: list[str] | None = None) -> int:
        """Replace the table's contents with df in one atomic commit
        (previous snapshots remain readable until expired)."""
        return self._commit(self._stage(df, stats_cols), "overwrite",
                            replace=True)

    # ------------------------------------------- copy-on-write rewrites

    @staticmethod
    def _where_column(where: list[tuple]):
        """Conjunction of (col, op, value) predicates as a Column."""
        import pyspark.sql.functions as F
        _OPS = {"==": "__eq__", ">=": "__ge__", ">": "__gt__",
                "<=": "__le__", "<": "__lt__"}
        pred = F.lit(True)
        for (c, op, v) in where:
            if op not in _OPS:
                raise ValueError(f"unsupported where op {op!r} "
                                 "(use ==, <, <=, >, >=)")
            pred = pred & getattr(F.col(c), _OPS[op])(F.lit(v))
        return pred

    def _hit_files(self, spark: SparkSession, candidates: list[dict],
                   match_col) -> list[dict]:
        """Exact tier of the copy-on-write planner: of the
        stats-surviving candidate files, which actually CONTAIN a row
        where ``match_col`` is true? One aggregate keyed by
        input_file_name — so a conservatively-kept file with zero
        matches is carried over untouched instead of rewritten."""
        import pyspark.sql.functions as F
        rows = (spark.read.parquet(*self._resolve(candidates))
                .where(match_col)
                .groupBy(F.input_file_name().alias("f")).count()
                .collect())
        hit = {os.path.basename(r["f"].split("?")[0]) for r in rows}
        return [e for e in candidates
                if os.path.basename(e["path"]) in hit]

    @staticmethod
    def _carryover_stats_cols(files: list[dict]) -> list[str]:
        """stats_cols to re-derive on rewritten files: every column any
        affected file carried stats for (keeps file skipping alive
        across deletes/merges without the caller restating it)."""
        cols: set[str] = set()
        for e in files:
            cols |= set((e.get("stats") or {}).keys())
        return sorted(cols)

    def delete_where(self, spark: SparkSession,
                     where: list[tuple]) -> int:
        """Row-level DELETE as a copy-on-write rewrite (Iceberg's
        copy-on-write `DELETE FROM ... WHERE`): metadata stats prune
        the table to candidate files, an exact per-file probe narrows
        those to files that truly contain matching rows, and ONLY
        those are rewritten without the rows — every other data file
        rides into the new snapshot by reference. Returns the
        committed version (the current head unchanged if nothing
        matched). Commits fail with CommitConflict if a concurrent
        writer rewrote one of the same files."""
        import pyspark.sql.functions as F
        files = self.snapshot()["files"]
        cand = [e for e in files
                if all(self._file_may_match(e, c, op, v)
                       for (c, op, v) in where)]
        if not cand:
            return self.current_version()
        pred = self._where_column(where)
        affected = self._hit_files(spark, cand, pred)
        if not affected:
            return self.current_version()
        survivors = (spark.read.parquet(*self._resolve(affected))
                     # keep rows where pred is not TRUE (null-safe:
                     # a NULL predicate must not delete the row)
                     .where(~F.coalesce(pred, F.lit(False))))
        new = (self._stage(survivors, self._carryover_stats_cols(affected))
               if survivors.limit(1).count() else [])
        return self._commit(new, "delete", replace=False,
                            removed_paths={e["path"] for e in affected})

    def merge(self, spark: SparkSession, df: DataFrame, key_col: str,
              stats_cols: list[str] | None = None) -> int:
        """Upsert by key (copy-on-write `MERGE INTO ... WHEN MATCHED
        UPDATE WHEN NOT MATCHED INSERT`): rows of ``df`` replace
        same-key rows already in the table; new keys append. One
        atomic commit: files holding matched keys are rewritten
        without them, ``df`` lands as new files, everything else rides
        by reference. File planning is two-tier like delete_where —
        df's [min, max] key range prunes by stats, then an exact
        semi-probe keeps only files that truly hold a matched key.
        ``stats_cols`` applies to df's new files; rewritten files
        re-derive whatever stats they already carried."""
        import pyspark.sql.functions as F
        files = self.snapshot()["files"]
        lo, hi = df.agg(F.min(key_col), F.max(key_col)).first()
        if lo is None:
            raise ValueError("merge source has no non-null keys")
        cand = [e for e in files
                if self._file_may_match(e, key_col, ">=", lo)
                and self._file_may_match(e, key_col, "<=", hi)]
        keys = df.select(key_col).distinct()
        affected = []
        if cand:
            probe = (spark.read.parquet(*self._resolve(cand))
                     .join(F.broadcast(keys), key_col, "left_semi")
                     .groupBy(F.input_file_name().alias("f")).count()
                     .collect())
            hit = {os.path.basename(r["f"].split("?")[0]) for r in probe}
            affected = [e for e in cand
                        if os.path.basename(e["path"]) in hit]
        new = self._stage(df, stats_cols)
        if affected:
            survivors = (spark.read.parquet(*self._resolve(affected))
                         .join(F.broadcast(keys), key_col, "left_anti"))
            if survivors.limit(1).count():
                new = new + self._stage(
                    survivors, self._carryover_stats_cols(affected))
        return self._commit(new, "merge", replace=False,
                            removed_paths={e["path"] for e in affected}
                            if affected else None)

    # ----------------------------------------------------------- reads

    def _resolve(self, files: list[dict]) -> list[str]:
        return [os.path.join(self.path, e["path"]) for e in files]

    @staticmethod
    def _file_may_match(entry: dict, col: str, op: str, value) -> bool:
        """Conservative metadata prune: True unless the file's recorded
        [min, max] for ``col`` PROVES no row can satisfy the predicate.
        Files without stats for the column always survive."""
        stats = entry.get("stats") or {}
        if col not in stats:
            return True
        mn, mx = stats[col]
        if mn is None or mx is None:  # all-null file: keep; the
            return True               # residual row filter handles it
        if op == "==":
            return mn <= value <= mx
        if op == ">=":
            return mx >= value
        if op == ">":
            return mx > value
        if op == "<=":
            return mn <= value
        if op == "<":
            return mn < value
        raise ValueError(f"unsupported where op {op!r} "
                         "(use ==, <, <=, >, >=)")

    def read(self, spark: SparkSession,
             version: int | None = None,
             where: list[tuple] | None = None,
             merge_schema: bool = False) -> DataFrame:
        """Scan one snapshot (head by default). The file list is fixed
        at call time — snapshot isolation against concurrent commits.

        ``where`` is a conjunction of ``(col, op, value)`` predicates
        (ops ``== < <= > >=``). Files whose committed min/max stats
        (written by ``append(stats_cols=...)``) prove zero matching
        rows are dropped from the scan BEFORE Spark sees them —
        Iceberg's manifest-stats pruning, one tier above parquet
        footer/row-group pruning (which still applies to the files
        that survive). The same predicates are re-applied row-level,
        so the result is exact regardless of which files had stats.

        ``merge_schema=True`` unions the schemas across data files
        (additive schema evolution: appends may carry NEW nullable
        columns; older files read them as NULL). Off by default —
        schema merging reads every surviving file's footer up front."""
        snap = self.snapshot(version)
        files = snap["files"]
        if not files:
            raise ValueError(
                f"version {snap['version']} is empty; nothing to read")
        if where:
            kept = [e for e in files
                    if all(self._file_may_match(e, c, op, v)
                           for (c, op, v) in where)]
        else:
            kept = files
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        if not kept:
            # every file proved empty for the predicate: zero-row frame
            # with the table schema (footer reads only, no data pages;
            # all files under merge_schema so the union schema is right)
            empty_src = files if merge_schema else files[:1]
            df = reader.parquet(*self._resolve(empty_src)).limit(0)
        else:
            df = reader.parquet(*self._resolve(kept))
        if where:
            df = df.where(self._where_column(where))
        return df

    def read_incremental(self, spark: SparkSession, from_version: int,
                         to_version: int | None = None) -> DataFrame:
        """Rows appended AFTER from_version up to to_version (head by
        default) — the changelog read. Raises if any snapshot in the
        range is an overwrite (its delta is not append-only; a consumer
        must restart from a full scan, and silently pretending
        otherwise would drop retractions)."""
        to_v = self.current_version() if to_version is None else to_version
        if to_v < from_version:
            raise ValueError(f"to_version {to_v} < from_version "
                             f"{from_version}")
        base = {e["path"] for e in self.snapshot(from_version)["files"]}
        for v in range(from_version + 1, to_v + 1):
            op = self.snapshot(v)["operation"]
            if op in ("overwrite", "delete", "merge"):
                raise ValueError(
                    f"version {v} is a {op}; incremental read across "
                    "it is not append-only (rewritten survivor files "
                    "would double-count) — restart from a full scan")
        new = [e for e in self.snapshot(to_v)["files"]
               if e["path"] not in base]
        if not new:
            return None  # no delta; callers treat like an empty batch
        return spark.read.parquet(*self._resolve(new))

    # ----------------------------------------------------- maintenance

    def compact_files(self, spark: SparkSession, target_files: int,
                      stats_cols: list[str] | None = None,
                      cluster_col: str | None = None) -> int:
        """Rewrite the head snapshot into ``target_files`` files and
        commit as an overwrite — the small-file compaction that keeps
        the O(files) metadata bound honest. Pass ``stats_cols`` to
        re-derive file-skipping stats on the compacted files (stats do
        not carry over: the rewrite changes file boundaries).

        ``cluster_col`` RE-SORTS during compaction (repartitionByRange)
        instead of coalescing: plain coalesce merges whatever files sit
        next to each other, so after many interleaved commits each
        output file's [min, max] span widens until stats prune nothing
        — re-clustering restores disjoint spans and keeps the
        file-skipping path sharp. That is Iceberg's sorted
        rewrite_data_files, the maintenance half of Z-order serving."""
        df = self.read(spark)
        if cluster_col is not None:
            df = df.repartitionByRange(target_files, cluster_col)
            if stats_cols is None:
                stats_cols = [cluster_col]
        else:
            df = df.coalesce(target_files)
        return self.overwrite(df, stats_cols=stats_cols)

    def expire_snapshots(self, keep_last: int = 3) -> list[int]:
        """Drop version files beyond the newest ``keep_last`` (data
        files stay until remove_orphans). Version 0 may expire; the
        head never does."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = sorted(s["version"] for s in
                          (self.snapshot(h["version"])
                           for h in self.history()))
        drop = versions[:-keep_last]
        for v in drop:
            os.remove(_version_file(self.path, v))
        return drop

    def remove_orphans(self, grace_seconds: float = 3600.0) -> list[str]:
        """Delete data files no retained snapshot references and older
        than ``grace_seconds`` — the grace window protects files staged
        by a commit that has not yet won its version race."""
        live: set[str] = set()
        for h in self.history():
            for e in self.snapshot(h["version"])["files"]:
                live.add(e["path"])
        cutoff = time.time() - grace_seconds
        removed = []
        dd = _data_dir(self.path)
        for token in os.listdir(dd):
            tdir = os.path.join(dd, token)
            if not os.path.isdir(tdir):
                continue
            for name in os.listdir(tdir):
                rel = os.path.join("data", token, name)
                full = os.path.join(tdir, name)
                if rel in live or not name.endswith(".parquet"):
                    continue
                if os.path.getmtime(full) > cutoff:
                    continue
                os.remove(full)
                removed.append(rel)
            if not os.listdir(tdir):
                os.rmdir(tdir)
        return removed
