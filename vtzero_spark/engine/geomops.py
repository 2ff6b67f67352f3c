"""Polygon / linestring footprints and the distributed geometry decoder.

vtzero's decoder is a push-based visitor over one geometry at a time
(/root/reference/include/vtzero/geometry.hpp:176-381); the distributed
analog is an Arrow-batched `mapInPandas` over decoded feature rows that
materializes per-feature geometry statistics (point counts, coordinate
sums, signed ring areas per geometry.hpp:120-123,161-169). Footprint
construction itself is pure column math (no UDF): each image's
rectangle / polyline is assembled with `F.array`/`F.struct`, so
Catalyst keeps the whole build inside whole-stage codegen and the only
Python crossing is the MVT codec itself.

Ring orientation: vtzero classifies a ring by the sign of the shoelace
sum (outer > 0 in its y-down integer space, geometry.hpp:161-169); the
rectangle ring below is emitted in the +area order, so every footprint
is a single outer ring.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..mvt import geometry as G
from ..mvt.errors import MVTError

GEOM_STATS_SCHEMA = (
    "z long, x long, y long, layer_name string, feature_id long, "
    "geom_type int, n_parts int, n_points long, sum_x long, sum_y long, "
    "area2 long, decode_status string"
)


def _pt(xe, ye):
    return F.struct(xe.cast("long").alias("x"), ye.cast("long").alias("y"))


def rect_ring(x0, y0, w, h):
    """Closed rectangle ring with positive (outer) shoelace area in
    vtzero's y-down convention: (x0,y0) -> (x0+w,y0) -> (x0+w,y0+h)
    -> (x0,y0+h) -> close."""
    return F.array(
        _pt(x0, y0),
        _pt(x0 + w, y0),
        _pt(x0 + w, y0 + h),
        _pt(x0, y0 + h),
        _pt(x0, y0),
    )


def rect_footprint_features(assigned: DataFrame) -> DataFrame:
    """Tile-assigned images -> polygon features: each image covers the
    rectangle (loc_x, loc_y) .. (loc_x + w, loc_y + h) in tile-local
    units (corners may exceed the extent; vtzero round-trips such
    coordinates untouched, fixtures 053-056)."""
    x0, y0 = F.col("loc_x").cast("long"), F.col("loc_y").cast("long")
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    return assigned.select(
        "z", "x", "y", "layer_name",
        F.col("iid").alias("feature_ordinal"),
        F.col("iid").alias("feature_id"),
        F.lit(G.GEOM_POLYGON).alias("geom_type"),
        F.array(rect_ring(x0, y0, w, h)).alias("parts"),
    )


def path_features(assigned: DataFrame) -> DataFrame:
    """Tile-assigned images -> 3-point polyline features:
    (x0,y0) -> (x0+w, y0+h) -> (x0+2w, y0). w,h >= 16 in the synthetic
    table, so no zero-length segments (builder.hpp:850-852 would
    reject them)."""
    x0, y0 = F.col("loc_x").cast("long"), F.col("loc_y").cast("long")
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    line = F.array(_pt(x0, y0), _pt(x0 + w, y0 + h), _pt(x0 + 2 * w, y0))
    return assigned.select(
        "z", "x", "y", "layer_name",
        F.col("iid").alias("feature_ordinal"),
        F.col("iid").alias("feature_id"),
        F.lit(G.GEOM_LINESTRING).alias("geom_type"),
        F.array(line).alias("parts"),
    )


def _geom_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for _, r in pdf.iterrows():
            base = {
                "z": int(r["z"]), "x": int(r["x"]), "y": int(r["y"]),
                "layer_name": r["layer_name"],
                "feature_id": None if pd.isna(r["feature_id"]) else int(r["feature_id"]),
                "geom_type": int(r["geom_type"]),
            }
            try:
                cmds = np.asarray(r["geometry"], dtype=np.int64)
                nbytes = int(r["geometry_nbytes"]) if "geometry_nbytes" in pdf.columns else None
                parts, ring_types = G.decode_geometry(int(r["geom_type"]), cmds, nbytes)
                pts = np.concatenate(parts, axis=0) if parts else np.empty((0, 2), np.int64)
                area2 = 0
                if ring_types is not None:
                    area2 = sum(G.ring_signed_area2(ring) for ring in parts)
                rows.append({
                    **base,
                    "n_parts": len(parts),
                    "n_points": int(pts.shape[0]),
                    "sum_x": int(pts[:, 0].sum()) if pts.size else 0,
                    "sum_y": int(pts[:, 1].sum()) if pts.size else 0,
                    "area2": int(area2),
                    "decode_status": "ok",
                })
            except MVTError as e:
                rows.append({
                    **base, "n_parts": 0, "n_points": 0, "sum_x": 0,
                    "sum_y": 0, "area2": 0,
                    "decode_status": f"{type(e).__name__}: {e}",
                })
        yield pd.DataFrame(
            rows,
            columns=["z", "x", "y", "layer_name", "feature_id", "geom_type",
                     "n_parts", "n_points", "sum_x", "sum_y", "area2",
                     "decode_status"],
        )


def geometry_stats(features: DataFrame) -> DataFrame:
    """Decoded feature rows (geometry = raw command ints) -> per-feature
    geometry statistics via the exact vtzero decode semantics; malformed
    geometry becomes a decode_status row, never a task failure."""
    cols = ["z", "x", "y", "layer_name", "feature_id", "geom_type", "geometry"]
    if "geometry_nbytes" in features.columns:
        cols.append("geometry_nbytes")
    return features.select(*cols).mapInPandas(
        _geom_stats_batch, schema=GEOM_STATS_SCHEMA
    )
