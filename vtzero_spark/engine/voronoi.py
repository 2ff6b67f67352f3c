"""Voronoi tessellation — exact nearest-site cells per tile, the dual
of ``delaunay.py``'s TIN.

The nearest-site diagram is the geometric answer to "which image owns
this pixel / which site serves this location" — d3-delaunay builds it
from delaunator's mesh for exactly this reason. This module computes
it EXACTLY: site s's cell is the tile rectangle clipped against the
perpendicular-bisector half-plane of each of s's Delaunay neighbors

    2*(tx - sx)*X + 2*(ty - sy)*Y + (|s|^2 - |t|^2)*W  <=  0

whose coefficients are INTEGERS for integer sites. Clipping runs in
homogeneous integer coordinates (X, Y, W), W > 0 — every inside/
outside decision is an exact integer sign and every intersection
vertex an exact rational point — so the defining partition law

    sum of cell areas over a tile  ==  extent^2,  EXACTLY

is checked per tile in rational arithmetic and carried in the output
(``law_ok``), not asserted within float tolerance. Clipping against
Delaunay neighbors only (instead of all n sites) is the classical
identity that makes the cell computation O(avg degree) per site; the
cocircular-degenerate case keeps it valid because the omitted
diagonal's bisector is tangent to the cell at a single Voronoi
vertex. Collinear tiles (no triangles) still tessellate: the chain's
consecutive sites are the needed neighbors and the cells are exact
slabs.

The reference codec has no spatial analysis surface (vtzero encodes
features; SURVEY §2.11's joins/kNN are engine-side) — this operator
extends the same family: where ``knn.py`` answers "nearest sites to a
query point", the Voronoi diagram PRECOMPUTES nearest-site ownership
for every point of the tile at once, and its cells are polygon
features any MVT sink in this repo can encode.

Scale shape: identical to ``tin_tiles`` — pure-column tile
assignment, ONE Exchange on hash(tx, ty), per-task state one tile's
sites; output one row per SITE (cell polygon vertices + exact-law
flag), so row count equals the deduped site count. Homogeneous-int
vertex magnitudes stay small via per-vertex gcd normalization; the
per-site cost is bounded by Delaunay degree (avg 6), never by n.
"""

from __future__ import annotations

from fractions import Fraction
from math import gcd

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType,
                               IntegerType, LongType, StructField,
                               StructType)

from .delaunay import triangulate_points
from .synth import EXTENT


# ---------------------------------------------------- homogeneous clip

def _clip_halfplane(poly, a, b, c):
    """Sutherland–Hodgman clip of a convex polygon (homogeneous int
    vertices, W > 0) against a*X + b*Y + c*W <= 0. Exact."""
    if not poly:
        return poly
    sides = [a * X + b * Y + c * W for (X, Y, W) in poly]
    if all(s <= 0 for s in sides):
        return poly
    out = []
    m = len(poly)
    for i in range(m):
        j = (i + 1) % m
        sc, sn = sides[i], sides[j]
        if sc <= 0:
            out.append(poly[i])
            if sn > 0:
                out.append(_isect(poly[i], poly[j], sc, sn))
        elif sn < 0:
            out.append(_isect(poly[i], poly[j], sc, sn))
    return out if len(out) >= 3 else []


def _isect(p1, p2, s1, s2):
    """Exact intersection of segment p1p2 with the clip line, given
    the (opposite-sign) line evaluations s1, s2. Homogeneous:
    P = s2*p1 - s1*p2, then gcd-normalized with W > 0."""
    X = s2 * p1[0] - s1 * p2[0]
    Y = s2 * p1[1] - s1 * p2[1]
    W = s2 * p1[2] - s1 * p2[2]
    if W < 0:
        X, Y, W = -X, -Y, -W
    g = gcd(gcd(abs(X), abs(Y)), W)
    if g > 1:
        X //= g
        Y //= g
        W //= g
    return (X, Y, W)


def _area2(poly) -> Fraction:
    """Exact doubled signed area of a homogeneous polygon. The sum
    accumulates as a raw (num, den) pair — one gcd at the end instead
    of a Fraction reduction per vertex pair (~3x on the kernel's
    area share; exactness unchanged, ints are arbitrary precision)."""
    num, den = 0, 1
    m = len(poly)
    for i in range(m):
        X1, Y1, W1 = poly[i]
        X2, Y2, W2 = poly[(i + 1) % m]
        n2 = X1 * Y2 - X2 * Y1
        d2 = W1 * W2
        num = num * d2 + n2 * den
        den *= d2
    return Fraction(num, den)


# ------------------------------------------------------------ the kernel

def site_cells(px: list, py: list, x0: int, y0: int,
               x1: int, y1: int):
    """Homogeneous-coordinate form of the diagram: returns
    ``(polys, nbrs, skipped)`` where ``polys[i]`` is site i's cell as
    a CCW list of (X, Y, W) integer triples (None for skipped sites)
    and ``nbrs[i]`` its Delaunay neighbor set. The reusable core of
    ``voronoi_cells`` — Sibson interpolation clips these cells
    further, so it wants them before the Fraction projection."""
    n = len(px)
    px = [int(v) for v in px]
    py = [int(v) for v in py]
    if n == 0:
        return [], [], []

    tris, hull, skipped = triangulate_points(px, py)
    nbrs: list[set] = [set() for _ in range(n)]
    if tris:
        for t in range(0, len(tris), 3):
            a, b, c = tris[t], tris[t + 1], tris[t + 2]
            nbrs[a].add(b)
            nbrs[a].add(c)
            nbrs[b].add(a)
            nbrs[b].add(c)
            nbrs[c].add(a)
            nbrs[c].add(b)
        # hull neighbors are already triangle edges; skipped sites
        # are not in the mesh — their cells are not derivable from
        # neighbor sets, so they are excluded and reported.
    else:
        # collinear chain (or n < 3): consecutive chain sites are
        # exactly the bisectors that matter — the cells are slabs
        for k in range(len(hull) - 1):
            a, b = hull[k], hull[k + 1]
            nbrs[a].add(b)
            nbrs[b].add(a)

    skipset = set(skipped)
    rect = [(x0, y0, 1), (x1, y0, 1), (x1, y1, 1), (x0, y1, 1)]
    polys = []
    for s in range(n):
        if s in skipset:
            polys.append(None)
            continue
        poly = rect
        sx, sy = px[s], py[s]
        s2 = sx * sx + sy * sy
        for t in sorted(nbrs[s]):
            a = 2 * (px[t] - sx)
            b = 2 * (py[t] - sy)
            c = s2 - (px[t] * px[t] + py[t] * py[t])
            poly = _clip_halfplane(poly, a, b, c)
            if not poly:
                break
        polys.append(poly)
    return polys, nbrs, skipped


def voronoi_cells(px: list, py: list, x0: int, y0: int,
                  x1: int, y1: int):
    """Exact Voronoi cells of DISTINCT int sites, clipped to the
    rectangle [x0, x1] x [y0, y1].

    Returns ``(cells, skipped)``: ``cells[i]`` is ``None`` for
    skipped sites, else ``(verts, area2)`` with ``verts`` a CCW list
    of exact rational (Fraction x, Fraction y) pairs and ``area2``
    the exact doubled area. ``sum(area2) == 2*(x1-x0)*(y1-y0)`` holds
    identically whenever ``skipped`` is empty (the partition law).
    """
    polys, _, skipped = site_cells(px, py, x0, y0, x1, y1)
    cells = []
    for poly in polys:
        if poly is None:
            cells.append(None)
            continue
        verts = [(Fraction(X, W), Fraction(Y, W)) for (X, Y, W) in poly]
        cells.append((verts, _area2(poly)))
    return cells, skipped


# ---------------------------------------------------------- Spark surface

_VOR_SCHEMA = StructType([
    StructField("tx", IntegerType()),
    StructField("ty", IntegerType()),
    StructField("pid", LongType()),
    StructField("site_x", LongType()),
    StructField("site_y", LongType()),
    StructField("n_verts", IntegerType()),
    StructField("cell", ArrayType(DoubleType())),
    StructField("area", DoubleType()),
    StructField("n_sites", LongType()),
    StructField("n_skipped", IntegerType()),
    StructField("law_ok", BooleanType()),
])


def voronoi_tiles(points: DataFrame, x_col: str = "wx",
                  y_col: str = "wy", id_col: str = "iid",
                  extent: int = EXTENT,
                  partitions: int | None = None) -> DataFrame:
    """Per-tile exact Voronoi tessellation over world-positioned
    points: one row per site with its cell polygon (flattened
    [x0, y0, x1, y1, ...] doubles — the float projection of the exact
    rational vertices), its cell area, and the tile's EXACT partition
    verdict ``law_ok`` (rational sum-of-areas == extent^2, evaluated
    kernel-side before the float projection). Duplicate positions
    collapse to the smallest-id site; frontier-skipped sites are
    excluded and counted (``law_ok`` is only claimed when none were
    skipped). Plan shape and the ``partitions`` knob are identical to
    ``delaunay.tin_tiles``.
    """
    xs = F.col(x_col).cast("long")
    ys = F.col(y_col).cast("long")
    src = points.select(
        F.floor(xs / extent).cast("int").alias("tx"),
        F.floor(ys / extent).cast("int").alias("ty"),
        (xs - F.floor(xs / extent) * extent).cast("long").alias("lx"),
        (ys - F.floor(ys / extent) * extent).cast("long").alias("ly"),
        F.col(id_col).cast("long").alias("pid"),
    )
    if partitions:
        src = src.repartition(partitions, "tx", "ty")

    law2 = 2 * extent * extent

    def _tile(pdf):
        import pandas as pd

        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        pdf = pdf.sort_values(["lx", "ly", "pid"], kind="mergesort")
        lx = pdf["lx"].to_numpy()
        ly = pdf["ly"].to_numpy()
        pid = pdf["pid"].to_numpy()
        keep = np.ones(len(pdf), dtype=bool)
        if len(pdf) > 1:
            keep[1:] = (lx[1:] != lx[:-1]) | (ly[1:] != ly[:-1])
        lx, ly, pid = lx[keep], ly[keep], pid[keep]
        pxl = [int(v) for v in lx]
        pyl = [int(v) for v in ly]
        cells, skipped = voronoi_cells(pxl, pyl, 0, 0, extent, extent)
        total = sum((c[1] for c in cells if c is not None), Fraction(0))
        law_ok = (not skipped) and total == law2
        rows = []
        for i, cell in enumerate(cells):
            if cell is None:
                continue
            verts, area2 = cell
            flat = []
            for (fx, fy) in verts:
                flat.append(float(fx))
                flat.append(float(fy))
            rows.append({
                "tx": tx, "ty": ty,
                "pid": int(pid[i]),
                "site_x": pxl[i], "site_y": pyl[i],
                "n_verts": len(verts),
                "cell": flat,
                "area": float(area2) / 2.0,
                "n_sites": len(pxl),
                "n_skipped": len(skipped),
                "law_ok": law_ok,
            })
        return pd.DataFrame(rows, columns=[f.name for f in _VOR_SCHEMA])

    return src.groupBy("tx", "ty").applyInPandas(_tile, _VOR_SCHEMA)


def voronoi_mvt_tiles(points: DataFrame, zoom: int,
                      extent: int = EXTENT, layer: str = "voronoi",
                      x_col: str = "wx", y_col: str = "wy",
                      id_col: str = "iid",
                      partitions: int | None = None) -> DataFrame:
    """The servable form: each Voronoi cell as an MVT polygon feature
    through the SAME world-features ingest tail every other ingest
    runs (geojson.world_features_to_tiles: bbox fan-out -> localize ->
    clip -> vectorized encode), like hull_tiles / contour_tiles.

    The exact rational cell vertices quantize to integer world
    coordinates here (each vertex moves <= 0.5 unit — the inherent
    MVT grid snap); consecutive duplicates collapse, an again-closed
    endpoint drops, and rings whose ROUNDED shoelace is no longer
    positive (sliver cells thinner than the grid) are filtered out
    rather than encoded with flipped winding — all in JVM expressions,
    so the only Python stage remains the Voronoi kernel itself. Cells
    never cross their own tile boundary by construction, so the fan-
    out assigns each feature exactly one tile address.
    """
    cells = voronoi_tiles(points, x_col=x_col, y_col=y_col,
                          id_col=id_col, extent=extent,
                          partitions=partitions)
    half = (F.size("cell") / 2).cast("int")
    ring = F.transform(
        F.sequence(F.lit(1), half),
        lambda i: F.array(
            F.round(F.element_at("cell", 2 * i - 1)
                    + F.col("tx").cast("long") * extent).cast("long"),
            F.round(F.element_at("cell", 2 * i)
                    + F.col("ty").cast("long") * extent).cast("long")))
    c = cells.withColumn("_ring", ring)
    dedup = F.filter(
        "_ring",
        lambda v, i: (i == 0) | ~(v == F.element_at("_ring", i)))
    c = c.withColumn("_d", dedup)
    c = c.withColumn(
        "_d",
        F.when((F.size("_d") > 1) &
               (F.element_at("_d", -1) == F.element_at("_d", 1)),
               F.slice("_d", 1, F.size("_d") - 1)).otherwise(F.col("_d")))
    closed = F.concat("_d", F.slice("_d", 1, 1))
    c = c.withColumn("_closed", closed).where(F.size("_d") >= 3)
    area2 = F.aggregate(
        F.sequence(F.lit(1), F.size("_d")),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.element_at("_closed", i).getItem(0)
        * F.element_at("_closed", i + 1).getItem(1)
        - F.element_at("_closed", i + 1).getItem(0)
        * F.element_at("_closed", i).getItem(1))
    p = c.withColumn("_a2", area2).where(F.col("_a2") > 0).select(
        F.col("pid").alias("fid"),
        F.lit("Polygon").alias("gj_type"),
        F.array("_closed").alias("parts"))

    from . import geojson as _geojson

    return _geojson.world_features_to_tiles(p, zoom, extent,
                                            layer=layer)
