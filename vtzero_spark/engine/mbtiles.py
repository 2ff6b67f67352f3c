"""MBTiles archive source + sink (SQLite, stdlib ``sqlite3``).

The MBTiles 1.3 spec (public, mapbox/mbtiles-spec) is the on-disk
archive tippecanoe emits and tileservers mount: one SQLite database
with ``metadata(name, value)`` and ``tiles(zoom_level, tile_column,
tile_row, tile_data)``, a UNIQUE index on the address, TMS row order
(tile_row = 2^z - 1 - y — flipped vs the XYZ addresses every other
operator here uses), and gzip-compressed PBF tile payloads.

Spark-first decomposition — SQLite is a single-writer format, so the
sink is two stages with the parallel work in stage one:

1. SHARD WRITE (distributed): each task writes its partition's tiles
   into its own ``*.shard-N.mbtiles`` (schema + index + gzip all
   executor-side; gzip mtime pinned to 0 so shard bytes are
   deterministic). At 100 TB the shard SET is the deliverable — a
   tile server routes (z,x,y) -> shard exactly like any bucketed
   table, and every shard is itself a valid MBTiles file.
2. MERGE (single writer, optional): ATTACH each shard and
   ``INSERT INTO tiles SELECT`` — one sequential I/O-bound pass, the
   same single-writer cost tippecanoe itself pays to produce one
   ``.mbtiles``; the UNIQUE address index makes duplicate addresses
   fail loudly rather than last-writer-win.

The source direction parallelizes by (file, rowid range): rowid is
SQLite's physical key, so ranges partition the table without an
index scan; each task opens the file read-only, decompresses its
rows, and un-flips TMS. Reading a shard DIRECTORY is therefore fully
parallel even though each file is serial.
"""

from __future__ import annotations

import gzip
import os
import sqlite3
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SCHEMA_SQL = (
    "CREATE TABLE metadata (name text, value text);",
    "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
    "tile_row integer, tile_data blob);",
    "CREATE UNIQUE INDEX tile_index ON tiles "
    "(zoom_level, tile_column, tile_row);",
)

TILES_SCHEMA = "z long, x long, y long, tile_bytes binary"
MANIFEST_SCHEMA = "shard string, n_tiles long, nbytes long"


def _create_db(path: str) -> sqlite3.Connection:
    con = sqlite3.connect(path)
    for stmt in _SCHEMA_SQL:
        con.execute(stmt)
    return con


def _tms(z: int, y: int) -> int:
    return (1 << z) - 1 - y


def write_mbtiles_shards(tiles: DataFrame, out_dir: str) -> DataFrame:
    """Stage 1: distributed shard write. Returns the shard manifest
    (shard path, n_tiles, nbytes) — acting on it materializes the
    writes. Tile payloads are gzip'd here, in parallel, with mtime=0
    (deterministic bytes; spec 1.3 requires gzip for pbf data)."""
    os.makedirs(out_dir, exist_ok=True)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.mbtiles")
        con = None
        n = 0
        for pdf in batches:
            if con is None:
                if os.path.exists(path):
                    os.remove(path)  # task retry: start clean
                con = _create_db(path)
            rows = [
                (int(z), int(x), _tms(int(z), int(y)),
                 gzip.compress(bytes(b), 6, mtime=0))
                for z, x, y, b in zip(
                    pdf["z"], pdf["x"], pdf["y"], pdf["tile_bytes"])
            ]
            con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", rows)
            n += len(rows)
        if con is None:
            yield pd.DataFrame(columns=["shard", "n_tiles", "nbytes"])
            return
        con.commit()
        con.close()
        yield pd.DataFrame([{
            "shard": path, "n_tiles": n,
            "nbytes": os.path.getsize(path)}])

    return tiles.select("z", "x", "y", "tile_bytes").mapInPandas(
        fn, schema=MANIFEST_SCHEMA)


def merge_mbtiles(shards: list[str], out_path: str,
                  metadata: dict[str, str]) -> dict:
    """Stage 2: single-writer merge (the archive-export edge).
    Duplicate addresses across shards violate the spec's UNIQUE index
    and raise sqlite3.IntegrityError — loud, not last-writer-wins.
    ``metadata`` rows land in the metadata table; 'name' and 'format'
    are required by the spec (format must be 'pbf' for vector
    tiles)."""
    for req in ("name", "format"):
        if req not in metadata:
            raise ValueError(f"MBTiles metadata requires '{req}'")
    if os.path.exists(out_path):
        os.remove(out_path)
    con = _create_db(out_path)
    con.executemany("INSERT INTO metadata VALUES (?,?)",
                    sorted(metadata.items()))
    total = 0
    for i, sh in enumerate(shards):
        con.execute(f"ATTACH DATABASE ? AS sh{i}", (sh,))
        cur = con.execute(
            f"INSERT INTO tiles SELECT * FROM sh{i}.tiles")
        total += cur.rowcount
        con.commit()
        con.execute(f"DETACH DATABASE sh{i}")
    con.commit()
    con.close()
    return {"path": out_path, "n_tiles": total,
            "nbytes": os.path.getsize(out_path)}


def write_mbtiles(tiles: DataFrame, out_path: str,
                  metadata: dict[str, str]) -> dict:
    """Shard write + merge in one call: the single-file convenience
    form (small/medium archives; at scale keep the shard directory
    from write_mbtiles_shards and serve it directly)."""
    shard_dir = out_path + ".shards"
    manifest = write_mbtiles_shards(tiles, shard_dir).collect()
    shards = sorted(r.shard for r in manifest)
    info = merge_mbtiles(shards, out_path, metadata)
    for sh in shards:
        os.remove(sh)
    os.rmdir(shard_dir)
    return info


def read_mbtiles_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def _rowid_ranges(path: str, rows_per_task: int) -> list[tuple[str, int, int]]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            "SELECT min(rowid), max(rowid) FROM tiles").fetchone()
    finally:
        con.close()
    if lo is None:
        return []
    return [(path, a, min(a + rows_per_task - 1, hi))
            for a in range(lo, hi + 1, rows_per_task)]


def read_mbtiles(spark: SparkSession, path: str,
                 rows_per_task: int = 50_000) -> DataFrame:
    """MBTiles file or shard DIRECTORY -> tiles(z, x, y, tile_bytes).

    Parallelism = one task per (file, rowid range); listing and range
    probing are driver-side but touch only min/max rowid per file
    (O(files), not O(tiles)). Payloads are un-gzip'd (magic-sniffed:
    foreign files may legally store uncompressed non-pbf data) and
    tile_row un-flips TMS -> XYZ."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".mbtiles"))
    else:
        files = [path]
    ranges = [r for f in files for r in _rowid_ranges(f, rows_per_task)]
    if not ranges:
        return spark.createDataFrame([], TILES_SCHEMA)
    rdf = spark.createDataFrame(ranges, "path string, lo long, hi long")
    # one range per task: parallelism is the range list, not the
    # source partitioning of a 3-column driver-local frame
    rdf = rdf.repartition(len(ranges))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, lo, hi in zip(pdf["path"], pdf["lo"], pdf["hi"]):
                con = sqlite3.connect(f"file:{path_}?mode=ro", uri=True)
                try:
                    rows = con.execute(
                        "SELECT zoom_level, tile_column, tile_row, "
                        "tile_data FROM tiles WHERE rowid BETWEEN ? AND ?",
                        (int(lo), int(hi))).fetchall()
                finally:
                    con.close()
                out = []
                for z, x, ty, blob in rows:
                    data = bytes(blob)
                    if data[:2] == b"\x1f\x8b":
                        data = gzip.decompress(data)
                    out.append({"z": z, "x": x, "y": _tms(z, ty),
                                "tile_bytes": data})
                yield pd.DataFrame(
                    out, columns=["z", "x", "y", "tile_bytes"])

    return rdf.mapInPandas(fn, schema=TILES_SCHEMA)
