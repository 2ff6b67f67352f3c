"""OGC WKB / WKT geometry interchange over the parts representation.

The engine's native geometry is tile-local integer `parts:
array<array<struct<x:long, y:long>>>` (clip.py's Arrow layout). The
rest of the geo ecosystem speaks OGC Simple Features: GeoParquet
carries WKB columns, PostGIS/Sedona/DuckDB-spatial exchange WKB/WKT.
This module is that boundary, from the public OGC 06-103r4 spec,
pure numpy + stdlib:

* encode: parts -> WKB (little-endian). Geometry class is derived the
  way the MVT spec implies: point rows with one part are Point, many
  parts MultiPoint; linestring rows LineString/MultiLineString;
  polygon rows group rings into polygons by shoelace sign (positive
  area in y-down space = outer ring, geometry.hpp:161-169) —
  one outer -> Polygon (with holes), several -> MultiPolygon.
* decode: WKB -> (geom_type, parts), BOTH byte orders (the spec allows
  per-geometry endianness, including mixed nesting inside multis),
  bounds-checked, ValueError('corrupt WKB: ...') on anything
  structurally invalid — errors-as-data at the operator level.
* WKT: a pure-JVM export (`wkt_expr`) built entirely from
  pyspark.sql.functions over the parts column — no Python in the
  plan at all, so the text form is free at any scale.

Scale notes: the encoder is VECTORIZED for the dominant single-part
shape (one buffer per Arrow batch: per-row lengths -> offsets ->
bulk float64 coordinate scatter, the pbf.py segment-scatter pattern);
multi-part rows take a per-row fallback (same policy as
geomops.py's non-uniform fallback — the uniform fast path carries the
volume). Integer grid coordinates are exact in float64 (|v| < 2^53).

Round-trip law: decode(encode(parts)) == parts exactly, golden-pinned
against spec example bytes in tests/test_wkb.py.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON = 4, 5, 6


# ------------------------------------------------------------- encode

def _ring_areas2(o2: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Twice the signed shoelace area per ring (closed rings: last
    point repeats the first, so the wrap term is free)."""
    cross = x * np.roll(y, -1) - np.roll(x, -1) * y
    # zero the wrap contribution that crosses ring boundaries, then
    # segment-sum: each ring's last point pairs with the next ring's
    # first — but for CLOSED rings last==first, so dropping the last
    # term of each ring loses nothing.
    cs = np.concatenate([[0], np.cumsum(cross)])
    a, b = o2[:-1], o2[1:]
    return np.where(b - a >= 2, cs[np.maximum(b - 1, a)] - cs[a], 0)


def encode_wkb_scalar(geom_type: int, parts: list[list[tuple[int, int]]]) -> bytes:
    """Reference scalar encoder (the batch path is pinned identical)."""
    def pts(ring):
        return struct.pack(f"<{2 * len(ring)}d",
                           *[c for p in ring for c in p])

    def ring_blk(ring):
        return struct.pack("<I", len(ring)) + pts(ring)

    if geom_type == _POINT:
        if len(parts) == 1:
            return b"\x01" + struct.pack("<I", _POINT) + pts(parts[0])
        body = b"".join(b"\x01" + struct.pack("<I", _POINT) + pts(p)
                        for p in parts)
        return (b"\x01" + struct.pack("<II", _MULTIPOINT, len(parts)) + body)
    if geom_type == _LINESTRING:
        if len(parts) == 1:
            return (b"\x01" + struct.pack("<II", _LINESTRING, len(parts[0]))
                    + pts(parts[0]))
        body = b"".join(
            b"\x01" + struct.pack("<II", _LINESTRING, len(p)) + pts(p)
            for p in parts)
        return (b"\x01" + struct.pack("<II", _MULTILINESTRING, len(parts))
                + body)
    if geom_type == _POLYGON:
        def area2(ring):
            s = 0
            for (ax, ay), (bx, by) in zip(ring, ring[1:]):
                s += ax * by - bx * ay
            return s

        polys: list[list] = []
        for ring in parts:
            if area2(ring) >= 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        def poly_blk(rings):
            return (struct.pack("<I", len(rings))
                    + b"".join(ring_blk(r) for r in rings))
        if len(polys) == 1:
            return (b"\x01" + struct.pack("<I", _POLYGON)
                    + poly_blk(polys[0]))
        body = b"".join(b"\x01" + struct.pack("<I", _POLYGON) + poly_blk(p)
                        for p in polys)
        return (b"\x01" + struct.pack("<II", _MULTIPOLYGON, len(polys))
                + body)
    raise ValueError(f"corrupt WKB: unknown geom_type {geom_type}")


def encode_wkb_batch(o1: np.ndarray, o2: np.ndarray, x: np.ndarray,
                     y: np.ndarray, geom_type: np.ndarray) -> list[bytes]:
    """Batch encode over the flat parts view (clip._flat_parts layout).

    Fast path — rows whose WKB is a SINGLE flat block (Point,
    LineString, Polygon-with-N-rings): per-row byte lengths ->
    prefix-sum offsets -> one uint8 buffer, coordinates written as one
    bulk float64 scatter. Multi-part points/lines and multi-outer
    polygons fall back to the scalar encoder per row (the non-uniform
    tail, geomops.py's policy)."""
    n = len(geom_type)
    nparts = o1[1:] - o1[:-1]
    ring_len = o2[1:] - o2[:-1]
    # per-row point counts
    pt_of_row = o2[o1[1:]] - o2[o1[:-1]]

    areas = _ring_areas2(o2, x, y)
    outer = areas >= 0
    # count of outer rings per row (polygon grouping)
    outer_cs = np.concatenate([[0], np.cumsum(outer)])
    outers_per_row = outer_cs[o1[1:]] - outer_cs[o1[:-1]]

    is_pt = geom_type == _POINT
    is_ln = geom_type == _LINESTRING
    is_pg = geom_type == _POLYGON
    fast = ((is_pt & (nparts == 1) & (pt_of_row == 1))
            | (is_ln & (nparts == 1))
            | (is_pg & (outers_per_row <= 1)))

    lens = np.zeros(n, dtype=np.int64)
    lens[is_pt] = 21
    lens[is_ln] = 9 + 16 * pt_of_row[is_ln]
    lens[is_pg] = 9 + 4 * nparts[is_pg] + 16 * pt_of_row[is_pg]
    lens[~fast] = 0
    offs = np.concatenate([[0], np.cumsum(lens)])
    buf = np.zeros(offs[-1], dtype=np.uint8)

    rows = np.arange(n)
    f_rows = rows[fast]
    # headers: byte order + type (+ counts)
    buf[offs[f_rows]] = 1
    tcode = np.where(is_pt[fast], _POINT,
                     np.where(is_ln[fast], _LINESTRING, _POLYGON))
    b32 = buf.view(np.uint8)

    def put_u32(pos: np.ndarray, vals: np.ndarray):
        v = vals.astype(np.uint32)
        for b in range(4):
            b32[pos + b] = ((v >> (8 * b)) & 0xFF).astype(np.uint8)

    put_u32(offs[f_rows] + 1, tcode)
    ln_rows = rows[fast & is_ln]
    put_u32(offs[ln_rows] + 5, pt_of_row[ln_rows])
    pg_rows = rows[fast & is_pg]
    put_u32(offs[pg_rows] + 5, nparts[pg_rows])

    # ring headers + coordinate scatter positions
    # per-point byte position: row base + header + ring headers before
    # this point's ring (+ its own 4B count for polygons) + 16*index
    # within the flattened row point order
    hdr = np.where(is_pg, 9, np.where(is_ln, 9, 5))
    row_of_ring = np.repeat(np.arange(len(nparts)), nparts)
    ring_idx_in_row = np.arange(len(ring_len)) - o1[:-1][row_of_ring]
    pts_before_ring = o2[:-1] - o2[o1[:-1]][row_of_ring]
    ring_fast = fast[row_of_ring]
    rr = np.arange(len(ring_len))[ring_fast]
    ring_base = (offs[row_of_ring[rr]] + hdr[row_of_ring[rr]]
                 + np.where(is_pg[row_of_ring[rr]],
                            4 * ring_idx_in_row[rr], 0)
                 + 16 * pts_before_ring[rr])
    # polygon ring count headers (rings of fast polygon rows)
    pg_ring = rr[is_pg[row_of_ring[rr]]]
    if len(pg_ring):
        pg_base = (offs[row_of_ring[pg_ring]] + 9
                   + 4 * ring_idx_in_row[pg_ring]
                   + 16 * pts_before_ring[pg_ring])
        put_u32(pg_base, ring_len[pg_ring])
    coord_start = ring_base + np.where(is_pg[row_of_ring[rr]], 4, 0)

    # bulk coordinate scatter: positions for every point of fast rings
    if len(rr):
        reps = ring_len[rr]
        pt_base = np.repeat(coord_start, reps)
        within = (np.arange(int(reps.sum()))
                  - np.repeat(np.concatenate([[0], np.cumsum(reps)])[:-1],
                              reps))
        px = pt_base + 16 * within
        src = np.repeat(o2[rr], reps) + within
        xb = x[src].astype(np.float64).tobytes()
        yb = y[src].astype(np.float64).tobytes()
        xm = np.frombuffer(xb, np.uint8).reshape(-1, 8)
        ym = np.frombuffer(yb, np.uint8).reshape(-1, 8)
        for b in range(8):
            b32[px + b] = xm[:, b]
            b32[px + 8 + b] = ym[:, b]

    raw = buf.tobytes()
    out: list[bytes] = [b""] * n
    for i in range(n):
        if fast[i]:
            out[i] = raw[offs[i]:offs[i + 1]]
        else:
            parts = [
                [(int(x[p]), int(y[p])) for p in range(o2[k], o2[k + 1])]
                for k in range(o1[i], o1[i + 1])
            ]
            out[i] = encode_wkb_scalar(int(geom_type[i]), parts)
    return out


# ------------------------------------------------------------- decode

def _rd(buf: bytes, pos: int, fmt: str):
    size = struct.calcsize(fmt)
    if pos + size > len(buf):
        raise ValueError("corrupt WKB: truncated buffer")
    return struct.unpack_from(fmt, buf, pos), pos + size


_MAX_COUNT = 1 << 28  # sanity bound: reject absurd counts before allocating


def _decode_geom(buf: bytes, pos: int):
    (bo,), pos = _rd(buf, pos, "B")
    if bo not in (0, 1):
        raise ValueError(f"corrupt WKB: bad byte-order flag {bo}")
    e = "<" if bo == 1 else ">"
    (t,), pos = _rd(buf, pos, e + "I")

    def rd_count():
        nonlocal pos
        (c,), p2 = _rd(buf, pos, e + "I")
        if c > _MAX_COUNT:
            raise ValueError(f"corrupt WKB: count {c} exceeds sanity bound")
        pos = p2
        return c

    def rd_pts(cnt):
        nonlocal pos
        vals, pos2 = _rd(buf, pos, e + f"{2 * cnt}d")
        pos = pos2
        return [(vals[2 * k], vals[2 * k + 1]) for k in range(cnt)]

    if t == _POINT:
        return (_POINT, [rd_pts(1)]), pos
    if t == _LINESTRING:
        return (_LINESTRING, [rd_pts(rd_count())]), pos
    if t == _POLYGON:
        nrings = rd_count()
        return (_POLYGON, [rd_pts(rd_count()) for _ in range(nrings)]), pos
    if t in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON):
        cnt = rd_count()
        child_t = {_MULTIPOINT: _POINT, _MULTILINESTRING: _LINESTRING,
                   _MULTIPOLYGON: _POLYGON}[t]
        parts = []
        for _ in range(cnt):
            (ct, ps), pos = _decode_geom(buf, pos)
            if ct != child_t:
                raise ValueError(
                    f"corrupt WKB: multi type {t} holds child type {ct}")
            parts.extend(ps)
        return (child_t, parts), pos
    raise ValueError(f"corrupt WKB: unknown geometry type {t}")


def decode_wkb(buf: bytes) -> tuple[int, list[list[tuple[float, float]]]]:
    """WKB -> (geom_type in MVT terms, parts). Multis flatten back to
    the parts list (the native representation carries multiplicity as
    parts; polygon grouping is re-derivable from winding, which encode
    preserves). ValueError('corrupt WKB: ...') on malformed input;
    trailing garbage after the geometry is rejected."""
    (gt, parts), pos = _decode_geom(bytes(buf), 0)
    if pos != len(buf):
        raise ValueError("corrupt WKB: trailing bytes after geometry")
    return gt, parts


# ------------------------------------------------------- Spark operators

_PARTS_T = "array<array<struct<x:bigint,y:bigint>>>"


def to_wkb(df: DataFrame, parts_col: str = "parts",
           geom_type_col: str = "geom_type",
           out_col: str = "wkb") -> DataFrame:
    """parts -> WKB binary column (mapInArrow: flat offsets view in,
    one scatter-built buffer per batch out)."""
    import pyarrow as pa

    from .clip import _flat_parts

    names = df.columns

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            tbl = pa.table(rb)
            col = tbl.column(parts_col).combine_chunks()
            gt = tbl.column(geom_type_col).combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(gt) == 0:
                yield pa.record_batch(
                    list(rb.columns) + [pa.array([], pa.binary())],
                    names=names + [out_col])
                continue
            o1, o2, x, y = _flat_parts(col)
            blobs = encode_wkb_batch(o1, o2, x, y, gt)
            yield pa.record_batch(
                list(rb.columns) + [pa.array(blobs, pa.binary())],
                names=names + [out_col])

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInArrow(fn, schema=f"{fields}, {out_col} binary")


def from_wkb(df: DataFrame, wkb_col: str = "wkb",
             parts_col: str = "parts",
             geom_type_col: str = "geom_type") -> DataFrame:
    """WKB binary -> (geom_type, parts), errors as a status column
    ('ok' / 'corrupt: ...') — one bad blob must not fail the job.
    Output coordinates are cast back to the integer grid (the engine's
    native space); genuinely fractional WKB would need a quantize step
    first, which is the caller's projection decision, not a codec
    default."""
    import pyarrow as pa

    names = [c for c in df.columns if c != wkb_col]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            tbl = pa.table(rb)
            blobs = tbl.column(wkb_col).combine_chunks()
            gts, parts_rows, status = [], [], []
            for v in blobs:
                b = v.as_py()
                try:
                    gt, parts = decode_wkb(b)
                    gts.append(gt)
                    parts_rows.append(
                        [[{"x": int(px), "y": int(py)} for px, py in ring]
                         for ring in parts])
                    status.append("ok")
                except ValueError as exc:
                    gts.append(0)
                    parts_rows.append([])
                    status.append(f"corrupt: {exc}")
            arrs = [tbl.column(c).combine_chunks() for c in names]
            parts_t = pa.list_(pa.list_(pa.struct(
                [("x", pa.int64()), ("y", pa.int64())])))
            yield pa.record_batch(
                arrs + [pa.array(gts, pa.int32()),
                        pa.array(parts_rows, parts_t),
                        pa.array(status, pa.string())],
                names=names + [geom_type_col, parts_col, "wkb_status"])

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != wkb_col)
    return df.mapInArrow(
        fn, schema=(f"{fields}, {geom_type_col} int, "
                    f"{parts_col} {_PARTS_T}, wkb_status string"))


def wkt_expr(parts_col: str = "parts",
             geom_type_col: str = "geom_type") -> Column:
    """WKT text, pure JVM (no Python anywhere in the plan): built with
    transform/concat_ws over the parts column. Polygon rings render in
    parts order (outer first, per the encoder's winding convention);
    a multi-outer polygon row renders as one POLYGON of all its rings
    — use to_wkb for the grouped MULTIPOLYGON form."""
    ring_txt = lambda r: F.concat(  # noqa: E731
        F.lit("("),
        F.concat_ws(", ", F.transform(
            r, lambda p: F.concat_ws(" ", p["x"].cast("string"),
                                     p["y"].cast("string")))),
        F.lit(")"))
    rings = F.concat_ws(", ", F.transform(F.col(parts_col), ring_txt))
    gt = F.col(geom_type_col)
    single_pt = (F.size(parts_col) == 1)
    return (
        F.when(gt == _POINT,
               F.when(single_pt,
                      F.concat(F.lit("POINT "),
                               ring_txt(F.col(parts_col)[0])))
               .otherwise(F.concat(F.lit("MULTIPOINT ("), rings, F.lit(")"))))
        .when(gt == _LINESTRING,
              F.when(single_pt,
                     F.concat(F.lit("LINESTRING "),
                              ring_txt(F.col(parts_col)[0])))
              .otherwise(F.concat(F.lit("MULTILINESTRING ("), rings,
                                  F.lit(")"))))
        .when(gt == _POLYGON,
              F.concat(F.lit("POLYGON ("), rings, F.lit(")")))
        .otherwise(F.lit(None).cast("string"))
    )
