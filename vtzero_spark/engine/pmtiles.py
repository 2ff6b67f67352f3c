"""PMTiles v3 archive sink + source (single-file, range-servable).

PMTiles (public spec: protomaps/PMTiles, v3) is the successor archive
to MBTiles for static hosting: one file whose 127-byte header +
Hilbert-ordered directories let a client fetch any tile with at most
two HTTP range reads and no server-side database. Layout:

    [header 127B][root dir][json metadata][leaf dirs][tile data]

- tile ids are cumulative-per-zoom Hilbert positions:
  ``tile_id = sum_{z'<z} 4^z' + hilbert_d(z, x, y)`` — exactly
  engine/hilbert.py's walk, which is what makes the sink a
  DataFrame sort on a column the engine can already compute;
- directories are column-wise varint blocks (delta tile ids, run
  lengths, byte lengths, offset+1 with 0 = "previous offset+length"),
  gzip'd; entries above the root-size budget spill into leaf
  directories addressed by a root whose run_length=0 entries point at
  leaves (the two-range-read guarantee);
- tile payloads are gzip'd MVT, deduplicated by content: identical
  tiles share one data blob via run-length entries on consecutive
  ids and shared offsets otherwise — both forms emitted here.

Spark-first decomposition: the parallel work — gzip, content hashing,
Hilbert ids — happens in a DataFrame; the final assembly is a
single-writer pass over the SORTED, already-compressed iterator
(tippecanoe pays the same; at 100 TB serve the MBTiles shard set or
the snapshot table and emit PMTiles per region/zoom slab at the
edge). The source direction reads the directories driver-side (KBs)
and parallelizes payload fetches by entry ranges.

Interop caveat (honest scope): no PMTiles reader exists in this
container, so conformance is pinned by self-roundtrip + structural
invariants (magic/version/clustered flags, sorted strictly-increasing
ids, delta>0, offset chain, two-read depth bound), not by a foreign
implementation.
"""

from __future__ import annotations

import gzip
import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mvt import pbf
from . import hilbert

HEADER_LEN = 127
_MAGIC = b"PMTiles"
_COMPRESSION_GZIP = 2
_TILETYPE_MVT = 1
MAX_ROOT_ENTRIES = 16384  # spec guidance: root dir stays ~16k entries


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """Cumulative-per-zoom Hilbert position (spec 'tile id')."""
    base = ((1 << (2 * z)) - 1) // 3  # sum of 4^k for k < z
    if z == 0:
        return 0
    # xy2d at level z via the shared scalar walk's inverse-free form:
    # reuse hilbert_xy's forward twin by running the column algorithm
    # scalar-side (kept tiny: directory building is driver-side).
    rx = ry = 0
    d = 0
    cx, cy = x, y
    s = 1 << (z - 1)
    while s > 0:
        rx = 1 if (cx & s) > 0 else 0
        ry = 1 if (cy & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                cx, cy = s - 1 - cx, s - 1 - cy
            cx, cy = cy, cx
        s >>= 1
    return base + d


def tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    z = 0
    while tid >= (1 << (2 * z)):
        tid -= 1 << (2 * z)
        z += 1
    x, y = hilbert.hilbert_xy(tid, z) if z else (0, 0)
    return z, x, y


def with_tileid(tiles: DataFrame) -> DataFrame:
    """Append the PMTiles tile_id column — pure column math per zoom
    (the per-zoom Hilbert walk plus the cumulative base)."""
    zs = [r.z for r in tiles.select("z").distinct().collect()]
    out = None
    for z in sorted(zs):
        part = tiles.where(F.col("z") == z)
        base = ((1 << (2 * z)) - 1) // 3
        if z == 0:
            part = part.withColumn("tile_id", F.lit(0).cast("long"))
        else:
            part = hilbert.with_hilbert(part, "x", "y", z, out="_hd") \
                .withColumn("tile_id", (F.lit(base) + F.col("_hd"))
                            .cast("long")).drop("_hd")
        out = part if out is None else out.unionByName(part)
    return out


# ------------------------------------------------- directory codec

def _serialize_dir(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length), sorted by id.
    Column-wise varints per spec: n, id deltas, run_lengths, lengths,
    offsets (offset+1; 0 = previous offset + previous length)."""
    out = [pbf.encode_varint(len(entries))]
    ids = np.array([e[0] for e in entries], dtype=np.uint64)
    deltas = np.diff(ids, prepend=np.uint64(0))
    out.append(pbf.encode_varint_array(deltas.astype(np.int64)))
    out.append(pbf.encode_varint_array(
        np.array([e[3] for e in entries], dtype=np.int64)))
    out.append(pbf.encode_varint_array(
        np.array([e[2] for e in entries], dtype=np.int64)))
    off = []
    for i, (tid, o, ln, rl) in enumerate(entries):
        if i and o == entries[i - 1][1] + entries[i - 1][2]:
            off.append(0)
        else:
            off.append(o + 1)
    out.append(pbf.encode_varint_array(np.array(off, dtype=np.int64)))
    return b"".join(out)


def _parse_dir(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = pbf.decode_varint(buf, 0)
    vals = pbf.decode_varint_array(np.frombuffer(buf[pos:], dtype=np.uint8))
    assert len(vals) == 4 * n, "directory column count mismatch"
    deltas, runs, lens, offs = (vals[:n], vals[n:2 * n],
                                vals[2 * n:3 * n], vals[3 * n:])
    ids = np.cumsum(deltas)
    entries = []
    for i in range(n):
        if offs[i] == 0:
            o = entries[i - 1][1] + entries[i - 1][2]
        else:
            o = int(offs[i]) - 1
        entries.append((int(ids[i]), o, int(lens[i]), int(runs[i])))
    return entries


# ------------------------------------------------------------ sink

def write_pmtiles(tiles: DataFrame, out_path: str,
                  metadata: dict | None = None) -> dict:
    """tiles(z,x,y,tile_bytes) -> one PMTiles v3 file.

    Parallel stage: tile_id + gzip + content hash in the DataFrame.
    Serial stage: sorted iterator -> data section (content-dedup:
    consecutive equal ids would violate uniqueness, so dedup is by
    content hash — equal payloads share one blob), directories,
    header. Raises on duplicate (z,x,y)."""
    rows = (with_tileid(tiles)
            .select("tile_id",
                    F.xxhash64("tile_bytes").alias("chash"),
                    "tile_bytes")
            .sortWithinPartitions("tile_id"))
    # gzip executor-side, keep rows ordered by tile_id at the driver
    def gz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "tile_id": pdf["tile_id"],
                "chash": pdf["chash"],
                "gz": [gzip.compress(bytes(b), 6, mtime=0)
                       for b in pdf["tile_bytes"]],
            })

    collected = sorted(
        rows.mapInPandas(gz, "tile_id long, chash long, gz binary")
        .collect(), key=lambda r: r.tile_id)
    ids = [r.tile_id for r in collected]
    if len(set(ids)) != len(ids):
        raise ValueError("duplicate tile addresses in PMTiles input")

    data = bytearray()
    entries: list[tuple[int, int, int, int]] = []
    seen: dict[tuple[int, bytes], tuple[int, int]] = {}
    n_contents = 0
    for r in collected:
        blob = bytes(r.gz)
        key = (r.chash, blob)
        if key in seen:
            o, ln = seen[key]
            # run-length extend when ids are consecutive and the
            # previous entry points at the same blob
            if entries and entries[-1][0] + entries[-1][3] == r.tile_id \
                    and entries[-1][1] == o:
                tid0, o0, l0, rl0 = entries[-1]
                entries[-1] = (tid0, o0, l0, rl0 + 1)
            else:
                entries.append((r.tile_id, o, ln, 1))
        else:
            o = len(data)
            data.extend(blob)
            seen[key] = (o, len(blob))
            entries.append((r.tile_id, o, len(blob), 1))
            n_contents += 1

    # directories: root only when small, else leaves + pointer root
    root_entries = entries
    leaves = b""
    if len(entries) > MAX_ROOT_ENTRIES:
        root_entries = []
        chunks: list[bytes] = []
        leaf_off = 0
        for i in range(0, len(entries), MAX_ROOT_ENTRIES):
            chunk = entries[i:i + MAX_ROOT_ENTRIES]
            ser = gzip.compress(_serialize_dir(chunk), 6, mtime=0)
            # run_length=0 marks a leaf pointer per spec
            root_entries.append((chunk[0][0], leaf_off, len(ser), 0))
            chunks.append(ser)
            leaf_off += len(ser)
        leaves = b"".join(chunks)
    root = gzip.compress(_serialize_dir(root_entries), 6, mtime=0)
    meta = gzip.compress(json.dumps(
        metadata or {}, sort_keys=True).encode(), 6, mtime=0)

    zs = sorted({tileid_to_zxy(e[0])[0] for e in entries}) or [0]
    hdr = bytearray(HEADER_LEN)
    hdr[0:7] = _MAGIC
    hdr[7] = 3
    pos = HEADER_LEN
    sections = []
    for sec in (root, meta, leaves):
        sections.append((pos, len(sec)))
        pos += len(sec)
    data_off = pos
    for i, (o, ln) in enumerate(sections):
        hdr[8 + 16 * i:16 + 16 * i] = o.to_bytes(8, "little")
        hdr[16 + 16 * i:24 + 16 * i] = ln.to_bytes(8, "little")
    hdr[56:64] = data_off.to_bytes(8, "little")
    hdr[64:72] = len(data).to_bytes(8, "little")
    n_addressed = sum(e[3] for e in entries if e[3] > 0)
    hdr[72:80] = n_addressed.to_bytes(8, "little")
    hdr[80:88] = len(entries).to_bytes(8, "little")
    hdr[88:96] = n_contents.to_bytes(8, "little")
    hdr[96] = 1  # clustered: data written in id order
    hdr[97] = _COMPRESSION_GZIP  # internal (dirs + metadata)
    hdr[98] = _COMPRESSION_GZIP  # tile data
    hdr[99] = _TILETYPE_MVT
    hdr[100] = zs[0]
    hdr[101] = zs[-1]

    with open(out_path, "wb") as fh:
        fh.write(hdr)
        fh.write(root)
        fh.write(meta)
        fh.write(leaves)
        fh.write(data)
    return {"path": out_path, "n_entries": len(entries),
            "n_tiles": n_addressed, "n_contents": n_contents,
            "nbytes": os.path.getsize(out_path),
            "leaf_dirs": len(leaves) > 0}


# ---------------------------------------------------------- source

def _read_header(path: str) -> dict:
    with open(path, "rb") as fh:
        hdr = fh.read(HEADER_LEN)
    if hdr[0:7] != _MAGIC or hdr[7] != 3:
        raise ValueError("not a PMTiles v3 file")
    g = lambda o: int.from_bytes(hdr[o:o + 8], "little")
    return {
        "root_off": g(8), "root_len": g(16),
        "meta_off": g(24), "meta_len": g(32),
        "leaf_off": g(40), "leaf_len": g(48),
        "data_off": g(56), "data_len": g(64),
        "n_tiles": g(72), "n_entries": g(80), "n_contents": g(88),
        "clustered": hdr[96] == 1,
        "minzoom": hdr[100], "maxzoom": hdr[101],
    }


def read_pmtiles_metadata(path: str) -> dict:
    h = _read_header(path)
    with open(path, "rb") as fh:
        fh.seek(h["meta_off"])
        return json.loads(gzip.decompress(fh.read(h["meta_len"])))


def _all_entries(path: str, h: dict) -> list[tuple[int, int, int, int]]:
    with open(path, "rb") as fh:
        fh.seek(h["root_off"])
        root = _parse_dir(gzip.decompress(fh.read(h["root_len"])))
        out = []
        for tid, o, ln, rl in root:
            if rl == 0:  # leaf pointer (two-range-read depth bound)
                fh.seek(h["leaf_off"] + o)
                out.extend(_parse_dir(gzip.decompress(fh.read(ln))))
            else:
                out.append((tid, o, ln, rl))
    return out


def read_pmtiles(spark: SparkSession, path: str,
                 entries_per_task: int = 20_000) -> DataFrame:
    """PMTiles file -> tiles(z,x,y,tile_bytes). Directories parse
    driver-side (KBs); payload reads parallelize by entry ranges."""
    h = _read_header(path)
    entries = _all_entries(path, h)
    if not entries:
        return spark.createDataFrame(
            [], "z long, x long, y long, tile_bytes binary")
    chunks = [(path, h["data_off"], i, min(i + entries_per_task,
                                           len(entries)))
              for i in range(0, len(entries), entries_per_task)]
    bc = spark.sparkContext.broadcast(entries)
    rdf = spark.createDataFrame(
        chunks, "path string, data_off long, lo int, hi int")
    rdf = rdf.repartition(len(chunks))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ent = bc.value
        for pdf in batches:
            for path_, doff, lo, hi in zip(
                    pdf["path"], pdf["data_off"], pdf["lo"], pdf["hi"]):
                rows = []
                with open(path_, "rb") as fh:
                    for tid, o, ln, rl in ent[int(lo):int(hi)]:
                        fh.seek(int(doff) + o)
                        blob = gzip.decompress(fh.read(ln))
                        for k in range(rl):
                            z, x, y = tileid_to_zxy(tid + k)
                            rows.append({"z": z, "x": x, "y": y,
                                         "tile_bytes": blob})
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "tile_bytes"])

    return rdf.mapInPandas(
        fn, schema="z long, x long, y long, tile_bytes binary")


def get_tile(path: str, z: int, x: int, y: int) -> bytes | None:
    """Single-tile lookup, the client read path the format exists
    for: header -> root directory -> (leaf directory) -> payload, at
    most two directory reads before the data fetch regardless of
    archive size. Binary search over the sorted entries; run-length
    entries answer every id they span. Returns decompressed tile
    bytes, or None when the id is absent."""
    import bisect

    if z < 0 or not (0 <= x < (1 << z)) or not (0 <= y < (1 << z)):
        return None  # outside the zoom's grid (the walk would alias)
    h = _read_header(path)
    tid = zxy_to_tileid(z, x, y)
    with open(path, "rb") as fh:
        fh.seek(h["root_off"])
        entries = _parse_dir(gzip.decompress(fh.read(h["root_len"])))
        for _depth in range(2):  # root, then at most one leaf hop
            ids = [e[0] for e in entries]
            i = bisect.bisect_right(ids, tid) - 1
            if i < 0:
                return None
            e_tid, off, ln, rl = entries[i]
            if rl == 0:  # leaf pointer
                fh.seek(h["leaf_off"] + off)
                entries = _parse_dir(gzip.decompress(fh.read(ln)))
                continue
            if tid >= e_tid + rl:
                return None
            fh.seek(h["data_off"] + off)
            return gzip.decompress(fh.read(ln))
    return None
