"""spark-submit entry point for snapshot-table-fed INCREMENTAL tiling.

The batch job (tools/pipeline_job.py) re-reads its whole input every
run; this job is the production shape for a continuously-ingested
image+caption table (engine/table.py): each `process` run consumes
only the snapshots committed since the consumer's last run, tiles
them, and advances its cursor — so steady-state cost tracks the
ingest rate, not the table size.

    # producer: commit one batch (slice k of m) into the table
    spark-submit --py-files vtzero_spark.zip tools/incremental_job.py \
        ingest --table /tmp/imgs --sf-dir /root/testdata/sf0.01 --slice 0/2

    # consumer: tile everything committed since the last run
    spark-submit --py-files vtzero_spark.zip tools/incremental_job.py \
        process --table /tmp/imgs --out /tmp/tiles_inc

Exactly-once discipline: outputs land under out/delta_vA_vB/ (one
directory per consumed version range, overwritten if re-run), and the
consumer cursor (out/consumer_state.json) is committed only AFTER the
delta's outputs are fully written — a crash between the two re-runs
the same closed range into the same directory, which is idempotent.
Per-delta metrics (row count, tile count, version range, wall) are
persisted next to the outputs as lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession, functions as F


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "consumer_state.json")


def load_cursor(out_dir: str) -> int:
    try:
        with open(_state_path(out_dir)) as f:
            return int(json.load(f)["processed_version"])
    except (OSError, ValueError, KeyError):
        return 0


def _commit_cursor(out_dir: str, version: int, meta: dict) -> None:
    tmp = _state_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"processed_version": version, **meta}, f)
    os.replace(tmp, _state_path(out_dir))  # atomic on POSIX


def ingest(spark: SparkSession, table_path: str, sf_dir: str,
           slice_spec: str = "0/1", repeat: int = 1,
           cluster_level: int | None = None,
           cluster_files: int = 8, order: str = "zorder") -> dict:
    """Producer: append one deterministic slice of the synth
    image+caption table as a snapshot commit.

    ``cluster_level`` turns on Z-ORDER CLUSTERING: each commit's rows
    are range-partitioned by their level-``cluster_level`` quadkey
    cell id before writing, and the per-file cell min/max lands in
    the snapshot metadata (``stats_cols``). Because a Z-order sort
    makes spatially-near rows file-near, any tile/viewport query
    becomes one contiguous cell range that skips every non-overlapping
    file at the METADATA level (see serve_tile). This is the Iceberg
    `ALTER TABLE ... WRITE ORDERED BY zorder(...)` discipline, load
    side of the 100 TB read path."""
    from vtzero_spark.engine import cells, synth
    from vtzero_spark.engine.synth import WORLD
    from vtzero_spark.engine.table import SnapshotTable

    k, m = (int(s) for s in slice_spec.split("/"))
    t = (SnapshotTable(table_path) if SnapshotTable(table_path).exists()
         else SnapshotTable.create(table_path))
    img = synth.images(spark, sf_dir, repeat=repeat)
    if m > 1:
        img = img.where(F.col("iid") % m == k)
    if cluster_level is None:
        version = t.append(img)
    elif order == "zorder":
        clustered = (cells.point_cells(img, cluster_level, WORLD)
                     .repartitionByRange(cluster_files, "cell"))
        version = t.append(clustered, stats_cols=["cell"])
    elif order == "hilbert":
        # Hilbert clustering: same plan shape, same stats machinery —
        # only the sort key changes; bbox serves touch fewer files
        # (engine/hilbert.py run-count law, measured in
        # test_incremental_job.py::test_serve_bbox_hilbert_beats_zorder)
        from vtzero_spark.engine import hilbert

        cell_w = WORLD >> cluster_level
        withc = img.withColumns({
            "_ccx": F.expr(f"wx div {cell_w}"),
            "_ccy": F.expr(f"wy div {cell_w}")})
        clustered = (hilbert.with_hilbert(
            withc, "_ccx", "_ccy", cluster_level, out="cell")
            .drop("_ccx", "_ccy")
            .repartitionByRange(cluster_files, "cell"))
        version = t.append(clustered, stats_cols=["cell"])
    else:
        raise ValueError(f"unknown order {order!r}")
    return {"op": "ingest", "table": table_path, "version": version,
            "slice": slice_spec, "cluster_level": cluster_level,
            "order": order if cluster_level is not None else None}


def serve_tile(spark: SparkSession, table_path: str, z: int, x: int,
               y: int, cluster_level: int, order: str = "zorder"):
    """Read ONE tile's features from a cell-clustered table without
    scanning it: tile (z, x, y)'s subtree at the clustering level is a
    single contiguous cell range (cells.subtree_range), so the
    snapshot's per-file min/max stats drop every file whose span
    misses the range before Spark plans the scan. Returns
    (DataFrame, {files_scanned, files_total}) — the serving path a
    tile server or viewport query takes against the 100 TB table."""
    from vtzero_spark.engine import cells
    from vtzero_spark.engine.table import SnapshotTable

    t = SnapshotTable(table_path)
    if order == "zorder":
        lo, hi = cells.subtree_range(z, x, y, cluster_level)
    elif order == "hilbert":
        from vtzero_spark.engine import hilbert

        lo, hi = hilbert.hilbert_subtree_range(z, x, y, cluster_level)
    else:
        raise ValueError(f"unknown order {order!r}")
    df = t.read(spark, where=[("cell", ">=", lo), ("cell", "<", hi)])
    return df, {"files_scanned": len(df.inputFiles()),
                "files_total": len(t.snapshot()["files"])}


def serve_bbox(spark: SparkSession, table_path: str,
               wx0: int, wy0: int, wx1: int, wy1: int,
               cluster_level: int, order: str = "zorder"):
    """Viewport read over a cell-clustered table: the bbox's covering
    cells merge into contiguous id INTERVALS (driver-side, bounded by
    the covering size — use a coarser level for continent-scale
    boxes), each interval reads through SnapshotTable.read (stats
    prune + delete awareness intact), results union + exact row
    filter. Fewer intervals -> fewer surviving files; Hilbert
    clustering yields measurably fewer of both than Z-order on the
    same data (the Moon-et-al run-count law, pinned in
    test_incremental_job.py). Returns (DataFrame, metrics)."""
    from vtzero_spark.engine import cells as _c
    from vtzero_spark.engine import hilbert as _h
    from vtzero_spark.engine.synth import WORLD
    from vtzero_spark.engine.table import SnapshotTable

    if not (0 <= wx0 < wx1 <= WORLD and 0 <= wy0 < wy1 <= WORLD):
        raise ValueError("bbox must be a non-empty [wx0,wx1)x[wy0,wy1) "
                         f"inside [0,{WORLD})")
    t = SnapshotTable(table_path)
    cw = WORLD >> cluster_level
    cxs = range(wx0 // cw, (wx1 - 1) // cw + 1)
    cys = range(wy0 // cw, (wy1 - 1) // cw + 1)
    if order == "zorder":
        marker = 1 << (2 * cluster_level)
        ids = sorted(
            marker | _morton_scalar(cx, cy, cluster_level)
            for cx in cxs for cy in cys)
    elif order == "hilbert":
        ids = sorted(_h.hilbert_xy2d(cx, cy, cluster_level)
                     for cx in cxs for cy in cys)
    else:
        raise ValueError(f"unknown order {order!r}")
    intervals: list[list[int]] = []
    for i in ids:
        if intervals and i == intervals[-1][1]:
            intervals[-1][1] = i + 1
        else:
            intervals.append([i, i + 1])
    df = None
    files: set[str] = set()
    for lo, hi in intervals:
        part = t.read(spark, where=[("cell", ">=", lo),
                                    ("cell", "<", hi)])
        files.update(part.inputFiles())
        df = part if df is None else df.unionByName(part)
    df = df.where((F.col("wx") >= wx0) & (F.col("wx") < wx1)
                  & (F.col("wy") >= wy0) & (F.col("wy") < wy1))
    return df, {"files_scanned": len(files),
                "files_total": len(t.snapshot()["files"]),
                "n_intervals": len(intervals), "order": order}


def _morton_scalar(x: int, y: int, level: int) -> int:
    m = 0
    for i in range(level):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return m


def process(spark: SparkSession, table_path: str, out_dir: str) -> dict:
    """Consumer: tile the delta since the last processed version and
    advance the cursor.  No new snapshots -> no work, cursor moves to
    head (an empty range is a valid, cheap run)."""
    from vtzero_spark.engine import assemble, tiling
    from vtzero_spark.engine.synth import EXTENT, ZOOM
    from vtzero_spark.engine.table import SnapshotTable

    os.makedirs(out_dir, exist_ok=True)
    t = SnapshotTable(table_path)
    from_v = load_cursor(out_dir)
    head = t.current_version()
    t0 = time.time()
    if head <= from_v:
        return {"op": "process", "from_version": from_v,
                "to_version": head, "rows": 0, "tiles": 0,
                "skipped": "no new snapshots"}
    delta = t.read_incremental(spark, from_v, to_version=head)
    if delta is None:
        _commit_cursor(out_dir, head, {"empty_range": True})
        return {"op": "process", "from_version": from_v,
                "to_version": head, "rows": 0, "tiles": 0}

    prop_spec = [("phash", 5, "phash"), ("fmt", 1, "fmt"),
                 ("caption", 1, "caption")]
    feats = tiling.assign_tiles(delta, zoom=ZOOM, extent=EXTENT,
                                buffer=64)
    feats = feats.select(
        "z", "x", "y", "layer_name",
        F.col("iid").alias("feature_ordinal"),
        F.col("iid").alias("feature_id"),
        "loc_x", "loc_y", "phash", "fmt", "caption")
    tiles = assemble.encode_point_tiles(feats, prop_spec=prop_spec)
    dest = os.path.join(out_dir, f"delta_v{from_v}_v{head}")
    tiles.write.mode("overwrite").parquet(dest)

    done = spark.read.parquet(dest)
    n_tiles = done.count()
    n_rows = delta.count()
    meta = {
        "op": "process", "from_version": from_v, "to_version": head,
        "rows": n_rows, "tiles": n_tiles, "output": dest,
        "wall_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(dest, "_lineage.json"), "w") as f:
        json.dump(meta, f)
    _commit_cursor(out_dir, head, {"last_delta": dest})
    return meta


def read_all_tiles(spark: SparkSession, out_dir: str):
    """Union of every processed delta — what a consumer of the tiled
    output reads.  Tile keys never straddle deltas only if producers
    shard by iid; otherwise downstream re-aggregates by (z,x,y)."""
    dirs = [os.path.join(out_dir, d) for d in sorted(os.listdir(out_dir))
            if d.startswith("delta_v")]
    if not dirs:
        raise ValueError(f"no processed deltas under {out_dir}")
    return spark.read.parquet(*dirs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["ingest", "process", "serve"])
    ap.add_argument("--table", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/vtzero_incremental_out")
    ap.add_argument("--slice", default="0/1")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--cluster-level", type=int, default=None,
                    help="Z-order-cluster commits by this cell level "
                         "and record per-file cell stats")
    ap.add_argument("--cluster-files", type=int, default=8)
    ap.add_argument("--tile", default="4/0/0",
                    help="serve: z/x/y tile to read via file skipping")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("vtzero-incremental").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    if args.cmd == "ingest":
        out = ingest(spark, args.table, args.sf_dir, args.slice,
                     args.repeat, cluster_level=args.cluster_level,
                     cluster_files=args.cluster_files)
    elif args.cmd == "serve":
        if args.cluster_level is None:
            ap.error("serve requires --cluster-level (the level the "
                     "table was ingested with)")
        z, x, y = (int(s) for s in args.tile.split("/"))
        df, stats = serve_tile(spark, args.table, z, x, y,
                               args.cluster_level)
        out = {"op": "serve", "tile": args.tile, "rows": df.count(),
               **stats}
    else:
        out = process(spark, args.table, args.out)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
