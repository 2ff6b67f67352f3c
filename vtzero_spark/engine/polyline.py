"""Encoded Polyline Algorithm Format — the Google Maps / mapbox
polyline interchange codec (precision 5 and 6), from the published
algorithm: scale to 1e-precision degrees, delta against the previous
point, zigzag (left shift, invert on negative), emit 5-bit chunks
LSB-first OR'd with 0x20 while more chunks remain, add 63.

The codec's native domain here is INTEGER scaled coordinates (E5/E6),
so encode->decode is an exact identity law at any magnitude — floats
only appear in the float convenience wrappers, which round exactly as
the published algorithm specifies. This is the third interchange
boundary next to WKB/WKT (engine/wkb.py) and GeoJSON
(engine/geojson.py): GPS traces leave the engine as strings any
mapping SDK ingests directly.

Scale shape: ``encode_tracks`` is one mapInPandas pass over the
per-user track rows (zero shuffle — track assembly upstream already
grouped per user); the delta/zigzag stage is vectorized numpy, only
the chunked byte emission walks values (bounded by output size).
Reference analog: none in vtzero (codec scope, SURVEY §2.9 covers the
MVT wire format); polyline is the companion wire format for the
trajectory surface (engine/trajectory.py tracks).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)


# ------------------------------------------------------------ scalar

def encode_e(vals: np.ndarray) -> str:
    """Encode an (n, 2) int array of SCALED coordinates (E5/E6 pairs,
    lat first — the published convention) to the polyline string."""
    v = np.asarray(vals, dtype=np.int64).reshape(-1, 2)
    if v.size == 0:
        return ""
    d = v.copy()
    d[1:] -= v[:-1]
    flat = d.ravel()
    zz = (flat << 1) ^ (flat >> 63)          # zigzag, arithmetic shift
    out = bytearray()
    for u in zz.tolist():
        while u >= 0x20:
            out.append((0x20 | (u & 0x1F)) + 63)
            u >>= 5
        out.append(u + 63)
    return out.decode("ascii")


def decode_e(s: str) -> np.ndarray:
    """Inverse of encode_e: polyline string -> (n, 2) int64 scaled
    coordinate pairs. Raises ValueError on a truncated or out-of-band
    stream (errors-as-data at the operator layer)."""
    vals = []
    acc = 0
    shift = 0
    for ch in s.encode("ascii"):
        c = ch - 63
        if c < 0 or c > 0x3F:
            raise ValueError(f"polyline byte out of range: {ch}")
        acc |= (c & 0x1F) << shift
        if c & 0x20:
            shift += 5
        else:
            vals.append((acc >> 1) ^ -(acc & 1))
            acc = 0
            shift = 0
    if shift != 0:
        raise ValueError("truncated polyline chunk")
    if len(vals) % 2:
        raise ValueError("odd value count in polyline")
    d = np.array(vals, dtype=np.int64).reshape(-1, 2)
    return np.cumsum(d, axis=0)


def encode_polyline(coords, precision: int = 5) -> str:
    """Float convenience wrapper: sequence of (lat, lng) pairs."""
    scale = 10 ** precision
    v = np.asarray([(round(la * scale), round(ln * scale))
                    for la, ln in coords], dtype=np.int64)
    return encode_e(v.reshape(-1, 2))


def decode_polyline(s: str, precision: int = 5):
    scale = float(10 ** precision)
    return [(a / scale, b / scale) for a, b in decode_e(s)]


# ---------------------------------------------------------- Spark op

def encode_tracks(tracks: DataFrame, precision: int = 5,
                  world: int | None = None,
                  id_col: str = "fid") -> DataFrame:
    """Per-user GPS tracks (the ``trajectory.tracks`` layout:
    id + ``parts`` holding one [[x, y], ...] linestring in WORLD
    integer coordinates) -> encoded polyline strings plus the vertex
    count. World coordinates map to (lat, lng) through the Web
    Mercator inverse (engine/mercator) and scale to E-precision ints
    — the codec itself stays in the exact integer domain. One
    mapInPandas pass, no shuffle."""
    from . import mercator as M
    from .synth import WORLD

    wrld = world or WORLD
    scale = 10 ** precision
    out_schema = StructType([
        StructField("track_id", LongType(), False),
        StructField("n_vertices", LongType(), False),
        StructField("polyline", StringType(), False),
    ])

    def fn(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            rows = []
            for k in range(len(pdf)):
                line = np.asarray(
                    [(p[0], p[1]) for p in pdf["parts"].iloc[k][0]],
                    dtype=np.int64)
                lon, lat = M.world_to_lonlat_np(
                    line[:, 0], line[:, 1], wrld)
                e = np.empty_like(line)
                e[:, 0] = np.rint(lat * scale).astype(np.int64)
                e[:, 1] = np.rint(lon * scale).astype(np.int64)
                rows.append({"track_id": int(ids[k]),
                             "n_vertices": int(line.shape[0]),
                             "polyline": encode_e(e)})
            yield pd.DataFrame(rows,
                               columns=["track_id", "n_vertices",
                                        "polyline"])

    return tracks.mapInPandas(fn, out_schema)
