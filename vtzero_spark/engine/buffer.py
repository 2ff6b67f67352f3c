"""Geometry buffer (ST_Buffer) — grow or shrink features by a radius,
per (tile, layer[, props]) group, at raster resolution.

The missing member of the geometry-ops family (clip / simplify /
dissolve / repair / overlay / merge all live here already): buffer a
polygon outward (safety margins, coverage areas), inward (setbacks,
core areas), turn a linestring into a corridor polygon (the classic
"roads within 50 m" prep), or a point into a disc. Exact vector-domain
buffering is an arc-insertion offset kernel with degenerate-case
explosion; at tile resolution the buffer only has to be right per
PIXEL, so — exactly like ``dissolve.py`` — this operator composes the
repo's proven kernels with one new, exactly-testable step:

    rasterize_tile  ->  disc dilation / erosion  ->  vectorize_mask

The morphology step is EXACT Euclidean, not an approximation: a pixel
is set in ``dilate_disc(M, R)`` iff some foreground pixel center of
``M`` lies within Euclidean distance R of its center. It runs as a
row-distance pass (one column sweep, vectorized across all rows)
followed by one vertical offset loop of ``2*floor(R)+1`` whole-image
boolean ops — O(size^2 * R) with numpy-wide inner steps, no per-pixel
Python. Erosion is its De Morgan dual ``M & ~dilate(~M, R)`` with the
OUTSIDE of the tile treated as foreground, so a polygon clipped at the
tile seam does not erode inward from the cut edge.

Laws (pinned in tests/test_buffer.py):
- exactness: dilate/erode match the brute-force per-pixel Euclidean
  check on random masks, integer and fractional radii;
- conservation: rasterize(buffer_tiles(X, r)) ==
  buffer_mask(rasterize(X), r), pixel-exact (the vectorize round-trip
  theorem ``rasterize(vectorize(M)) == M`` carries it);
- monotonicity: r1 <= r2  =>  buffer(X, r1) subset buffer(X, r2);
- identity: buffer(X, 0) == dissolve(X) ring-exact;
- duality: erode(dilate(X, r), r) contains X (closing).

Semantics notes (PostGIS-aligned): radius is in TILE UNITS (the
geometry's own coordinate space; extent/size units per pixel).
radius >= 0 buffers every geometry type into polygons (point -> disc,
line -> corridor); radius < 0 shrinks polygons and annihilates lines
and points (a degenerate shape has no interior to shrink). Buffered
geometry is cut at the tile boundary — compose with a clip buffer
>= radius upstream (clip.py) so neighbor-tile geometry within reach
is present and seams agree.

Spark shape: ONE groupBy shuffle on the caller's keys — the same
(z,x,y,layer_name) partitioning the encode consumes. Per-task state is
one size^2 mask + one group's rings: bounded, independent of feature
count. Like dissolve, the operator SHRINKS data (one feature per
group, O(boundary) vertices out).

Reference parity note: vtzero itself has no buffer (it is a codec);
this is brief-side — the tiling engine's prep-step family
(tippecanoe/PostGIS user expectations).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..mvt import geometry as G
from .raster import rasterize_tile, vectorize_mask

__all__ = ["dilate_disc", "erode_disc", "buffer_mask",
           "buffer_group_parts", "buffer_tiles"]

_BIG = np.int32(1 << 20)  # > any in-tile distance; +1 never overflows


def _row_dist(fg: np.ndarray) -> np.ndarray:
    """Per-pixel horizontal distance (pixels) to the nearest foreground
    pixel in the SAME row; _BIG-ish where the row is empty. One sweep
    per direction, each column step vectorized across all rows."""
    nr, nc = fg.shape
    d = np.empty((nr, nc), np.int32)
    cur = np.full(nr, _BIG, np.int32)
    for c in range(nc):
        cur = np.where(fg[:, c], np.int32(0), cur + np.int32(1))
        d[:, c] = cur
    cur = np.full(nr, _BIG, np.int32)
    for c in range(nc - 1, -1, -1):
        cur = np.where(fg[:, c], np.int32(0), cur + np.int32(1))
        np.minimum(d[:, c], cur, out=d[:, c])
    return d


def dilate_disc(mask: np.ndarray, radius_px: float) -> np.ndarray:
    """Exact Euclidean disc dilation of a 0/1 mask: out[r,c] = 1 iff
    some foreground pixel center lies within ``radius_px`` of pixel
    (r,c)'s center. Out-of-image pixels contribute nothing."""
    if radius_px < 0:
        raise ValueError("dilate_disc radius must be >= 0")
    fg = mask.astype(bool)
    if not fg.any():
        return np.zeros_like(fg, dtype=np.uint8)
    d = _row_dist(fg)
    out = np.zeros_like(fg)
    nr = fg.shape[0]
    r2 = float(radius_px) * float(radius_px)
    rmax = min(int(math.floor(radius_px)), nr - 1)
    for dr in range(-rmax, rmax + 1):
        # horizontal reach at this vertical offset; |dc| is an integer,
        # so |dc| <= sqrt(r2-dr^2)  <=>  |dc| <= floor(sqrt(...)): exact
        h = int(math.floor(math.sqrt(r2 - dr * dr)))
        if dr >= 0:
            out[:nr - dr] |= d[dr:] <= h
        else:
            out[-dr:] |= d[:dr] <= h
    return out.astype(np.uint8)


def erode_disc(mask: np.ndarray, radius_px: float) -> np.ndarray:
    """Exact Euclidean disc erosion: keep a pixel iff NO in-image
    background pixel center lies within ``radius_px`` — i.e. the
    OUTSIDE of the image is treated as foreground, so geometry clipped
    at the tile seam does not erode inward from the cut edge."""
    if radius_px < 0:
        raise ValueError("erode_disc radius must be >= 0")
    fg = mask.astype(bool)
    near_bg = dilate_disc((~fg).astype(np.uint8), radius_px).astype(bool)
    return (fg & ~near_bg).astype(np.uint8)


def buffer_mask(mask: np.ndarray, radius_px: float) -> np.ndarray:
    """Signed-radius morphology: dilate for radius_px >= 0, erode by
    |radius_px| otherwise."""
    if radius_px >= 0:
        return dilate_disc(mask, radius_px)
    return erode_disc(mask, -radius_px)


def buffer_group_parts(parts_per_feature: list[list[np.ndarray]],
                       gtype_per_feature: list[int],
                       radius: float, size: int, extent: int,
                       ) -> list[np.ndarray]:
    """Core: one group's geometry (part lists + each feature's
    geom_type) -> boundary rings of the buffered pixel region (outers
    CW, holes CCW, coords back in tile units). ``radius`` is in tile
    units; negative radius admits only polygon coverage (a line or
    point has no interior to shrink)."""
    rings, gts = [], []
    for gt, parts in zip(gtype_per_feature, parts_per_feature):
        if radius < 0 and gt != G.GEOM_POLYGON:
            continue
        minlen = 3 if gt == G.GEOM_POLYGON else 1
        for r in parts:
            arr = np.asarray(r, dtype=np.int64).reshape(-1, 2)
            if len(arr) >= minlen:
                rings.append(arr)
                gts.append(gt)
    if not rings:
        return []
    roff = np.zeros(len(rings) + 1, np.int64)
    np.cumsum([len(r) for r in rings], out=roff[1:])
    px = np.concatenate([r[:, 0] for r in rings]).astype(np.float64)
    py = np.concatenate([r[:, 1] for r in rings]).astype(np.float64)
    mask = rasterize_tile(px, py, roff, np.asarray(gts, np.int64),
                          size, extent)
    scale = extent // size
    out = buffer_mask(mask, radius / scale)
    return [np.asarray(ring, dtype=np.int64)
            for ring in vectorize_mask(out, scale=scale)]


def buffer_tiles(features: DataFrame,
                 radius: float,
                 size: int = 256,
                 extent: int = 4096,
                 keys: Sequence[str] = ("z", "x", "y", "layer_name"),
                 accumulate: dict | None = None,
                 ) -> DataFrame:
    """Buffer every feature of a group and union the result into ONE
    polygon feature per group, at raster resolution.

    Input/output: the pre-encode features table
    (z,x,y,layer_name,feature_ordinal,feature_id,geom_type,parts).
    ``radius`` is in tile units (extent space); radius >= 0 turns
    points/lines/polygons alike into buffered polygon coverage,
    radius < 0 shrinks polygons (lines/points vanish — no interior).
    The merged feature carries min(feature_ordinal) / min non-null
    feature_id; property columns named in ``keys`` survive and scope
    the buffer (features with different attributes never merge);
    ``accumulate`` maps other columns to sum/min/max/count, exactly as
    in dissolve/linemerge."""
    from .linemerge import _accumulated, _check_accumulate

    if extent % size:
        raise ValueError(f"extent {extent} must be a multiple of "
                         f"size {size} (integer grid snap)")
    keys = list(keys)
    cols = list(features.columns)
    acc = _check_accumulate(accumulate, cols, keys)
    out_schema = features.schema

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("feature_ordinal", kind="stable")
        per_feat = [[np.array([[pt["x"], pt["y"]] for pt in part],
                              dtype=np.int64).reshape(-1, 2)
                     for part in row_parts]
                    for row_parts in pdf["parts"]]
        rings = buffer_group_parts(
            per_feat, [int(g) for g in pdf["geom_type"]],
            radius, size, extent)
        if not rings:
            return pd.DataFrame(columns=cols).astype(
                {c: pdf[c].dtype for c in cols if c in pdf})
        ids = pdf["feature_id"]
        row = {k: pdf.iloc[0][k] for k in keys}
        row["feature_ordinal"] = pdf["feature_ordinal"].min()
        row["feature_id"] = int(ids.dropna().min()) \
            if ids.notna().any() else None
        row["geom_type"] = G.GEOM_POLYGON
        row["parts"] = [[{"x": int(x), "y": int(y)} for x, y in ring]
                        for ring in rings]
        row.update(_accumulated(pdf, acc))
        for c in cols:
            if c not in row:
                row[c] = pdf.iloc[0][c]
        return pd.DataFrame([row], columns=cols)

    return features.groupBy(*keys).applyInPandas(fn, schema=out_schema)
