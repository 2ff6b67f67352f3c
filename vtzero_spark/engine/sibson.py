"""Natural-neighbor (Sibson) interpolation — smooth fields from
scattered per-image values, with a per-query EXACT self-check.

Sibson's estimator (R. Sibson 1981, "A brief description of natural
neighbour interpolation" — the standard scattered-data method in GIS)
evaluates a query point q by virtually INSERTING it into the Voronoi
diagram: each existing site s loses the part of its cell now closer
to q, and q's value is the stolen-area-weighted mean

    v(q) = sum_s  area(cell_old(s) ∩ closer-to-q) * v(s)  /  sum_s (...)

Where ``heatmap.py`` renders density and ``knn.py`` answers discrete
lookups, this interpolates a measured per-image quantity (quality
score, capture time, anything numeric) into a CONTINUOUS field over
the tile — the classic use of the Voronoi dual, and the reason
d3-delaunay ships alongside delaunator.

Everything geometric is exact (the ``voronoi.py`` machinery: integer
bisector half-planes, homogeneous-integer clipping, rational areas),
which buys two guarantees no float implementation has:

- the identity  sum of stolen areas == area(cell_new(q))  is checked
  RATIONALLY for every query (both sides computed independently) and
  rides the output as ``law_ok``;
- the same identity DETECTS an insufficient candidate neighborhood:
  stolen areas are exact per site, so a missing true natural
  neighbor makes the sum fall short of the (over-large) new-cell
  area, and the kernel widens the candidate hop radius and retries —
  candidate search is a performance heuristic, never a correctness
  assumption.

Sibson's signature property — EXACT reproduction of linear fields at
interior queries (where q's new cell does not touch the clip rect) —
therefore holds to the last bit and is pinned rationally in
tests/test_sibson.py; the ``interior`` flag in the output marks where
it applies.

Scale shape: identical to the rest of the family — pure-column tile
assign, ONE Exchange on hash(tx, ty), per-task state one tile's sites
plus its grid queries. Per-query cost is bounded by the natural-
neighbor count (avg ~6 of the candidate ~2-hop ~19), never by n; the
nearest-site seed is one vectorized numpy distance sweep per tile.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

from .synth import EXTENT
from .voronoi import _area2, _clip_halfplane, site_cells


def sibson_weights(px: list, py: list, polys, nbrs,
                   qx: int, qy: int, s0: int, rect):
    """Exact Sibson weights of query (qx, qy) given the diagram from
    ``voronoi.site_cells`` and a seed site ``s0`` (any site whose
    cell contains q — the nearest site qualifies).

    Returns ``(weights, target, interior)``: ``weights`` maps site ->
    exact stolen area2 (Fraction, > 0), ``target`` the exact area2 of
    q's inserted cell (== sum of weights, verified), ``interior``
    True when the inserted cell stays strictly inside the rect (the
    linear-reproduction regime)."""
    q2 = qx * qx + qy * qy

    def _closer_to_q(poly, sx, sy):
        # keep the part of poly closer to q than to site (sx, sy)
        return _clip_halfplane(poly, 2 * (sx - qx), 2 * (sy - qy),
                               q2 - (sx * sx + sy * sy))

    # 1-hop start: the law check below turns candidate hops into a
    # pure performance knob (a missing natural neighbor is DETECTED
    # as sum-of-stolen < new-cell area, and the set widens) — so
    # start at the smallest set that usually suffices
    cand = {s0} | nbrs[s0]
    n = len(px)
    while True:
        live = [s for s in sorted(cand) if polys[s] is not None]
        # q's inserted cell, from candidate bisectors
        poly = rect
        for s in live:
            poly = _clip_halfplane(
                poly, 2 * (px[s] - qx), 2 * (py[s] - qy),
                q2 - (px[s] * px[s] + py[s] * py[s]))
            if not poly:
                break
        target = _area2(poly) if poly else Fraction(0)
        weights = {}
        total = Fraction(0)
        for s in live:
            stolen = _closer_to_q(polys[s], px[s], py[s])
            if stolen:
                a = _area2(stolen)
                if a > 0:
                    weights[s] = a
                    total += a
        if total == target:
            interior = bool(poly) and all(
                0 < X and X < W * (rect[2][0]) and
                0 < Y and Y < W * (rect[2][1])
                for (X, Y, W) in poly)
            return weights, target, interior
        if len(cand) >= n:
            raise AssertionError(
                "sibson: stolen-area sum != inserted-cell area with "
                "ALL sites as candidates — exact invariant broken")
        cand = cand | {t for s in cand for t in nbrs[s]}
        if len(cand) == len(live):  # no growth: fall back to all
            cand = set(range(n))


_SIB_SCHEMA = StructType([
    StructField("tx", IntegerType()),
    StructField("ty", IntegerType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("value", DoubleType()),
    StructField("n_nbrs", IntegerType()),
    StructField("interior", BooleanType()),
    StructField("law_ok", BooleanType()),
])


def sibson_tiles(points: DataFrame, value_col: str, grid: int = 32,
                 x_col: str = "wx", y_col: str = "wy",
                 extent: int = EXTENT,
                 partitions: int | None = None) -> DataFrame:
    """Per-tile Sibson interpolation of ``value_col`` onto a
    ``grid x grid`` lattice of cell-center queries (extent divisible
    by grid keeps the queries integer). One output row per grid cell:
    the interpolated value, the natural-neighbor count, the interior
    flag, and the exact-law verdict. Duplicate positions collapse to
    the smallest-id site — the VALUE taken is that surviving row's,
    the same ownership rule as voronoi_tiles."""
    if extent % grid:
        raise ValueError(f"grid {grid} must divide extent {extent}")
    step = extent // grid
    xs = F.col(x_col).cast("long")
    ys = F.col(y_col).cast("long")
    src = points.select(
        F.floor(xs / extent).cast("int").alias("tx"),
        F.floor(ys / extent).cast("int").alias("ty"),
        (xs - F.floor(xs / extent) * extent).cast("long").alias("lx"),
        (ys - F.floor(ys / extent) * extent).cast("long").alias("ly"),
        F.col(value_col).cast("double").alias("val"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    if partitions:
        src = src.repartition(partitions, "tx", "ty")

    rect = [(0, 0, 1), (extent, 0, 1), (extent, extent, 1),
            (0, extent, 1)]

    def _tile(pdf):
        import pandas as pd

        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        pdf = pdf.sort_values(["lx", "ly", "_mid"], kind="mergesort") \
            .drop_duplicates(subset=["lx", "ly"], keep="first")
        pxl = [int(v) for v in pdf["lx"]]
        pyl = [int(v) for v in pdf["ly"]]
        vals = pdf["val"].to_numpy()
        polys, nbrs, skipped = site_cells(pxl, pyl, 0, 0,
                                          extent, extent)
        sx = np.asarray(pxl, dtype=np.float64)
        sy = np.asarray(pyl, dtype=np.float64)
        alive = np.array([p is not None for p in polys])
        rows = []
        for gy in range(grid):
            qy = gy * step + step // 2
            # vectorized nearest-site seed for the whole grid row
            qxs = np.arange(grid, dtype=np.float64) * step + step // 2
            d = (sx[None, :] - qxs[:, None]) ** 2 \
                + (sy[None, :] - qy) ** 2
            d[:, ~alive] = np.inf
            seeds = d.argmin(axis=1)
            for gx in range(grid):
                qx = gx * step + step // 2
                w, target, interior = sibson_weights(
                    pxl, pyl, polys, nbrs, qx, qy,
                    int(seeds[gx]), rect)
                tot = sum(w.values(), Fraction(0))
                if tot > 0:
                    # Fraction(float) is the exact binary value, so
                    # the weighted mean itself is exact; only the
                    # final output rounds
                    num = sum((ws * Fraction(float(vals[s]))
                               for s, ws in w.items()), Fraction(0))
                    value = float(num / tot)
                else:
                    value = float("nan")
                rows.append({
                    "tx": tx, "ty": ty, "gx": gx, "gy": gy,
                    "value": value,
                    "n_nbrs": len(w),
                    "interior": interior,
                    "law_ok": tot == target,
                })
        return pd.DataFrame(rows, columns=[f.name for f in _SIB_SCHEMA])

    return src.groupBy("tx", "ty").applyInPandas(_tile, _SIB_SCHEMA)
