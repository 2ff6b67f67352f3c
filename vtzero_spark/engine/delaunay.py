"""Delaunay triangulation (mapbox/delaunator re-derived) — per-tile
TINs from scattered points, on EXACT integer predicates.

The point-set counterpart to the repo's two other mesh producers:
``earcut.py`` triangulates polygon INTERIORS (constrained by rings)
and ``terrain.py`` triangulates height GRIDS (RTIN); this module
triangulates an unstructured point cloud — the classic TIN, the dual
of the Voronoi diagram, and the substrate for natural-neighbor
interpolation / nearest-site analysis over image positions. The
reference codec itself carries no triangulation (vtzero encodes what
it is handed — geometry.hpp decodes POINT features as bare vertex
runs, vt_geometry_type enum at vector_tile.hpp); TIN construction is
the engine-side step between a point layer and a renderable mesh,
exactly like earcut's relationship to POLYGON features.

Algorithm: the published delaunator sweep (https://github.com/mapbox/
delaunator — incremental insertion in order of distance from the seed
triangle's circumcenter, an advancing convex-hull front hashed by
pseudo-angle, halfedge legalization by in-circle flips), re-derived
from its public description with every geometric decision made by an
EXACT predicate:

- orientation is an integer cross product (arbitrary-precision Python
  ints, so world-scale coordinates cannot overflow), and
- the in-circle test is the exact 3x3 integer determinant — no
  epsilons, no robustness fallbacks.

Floats appear only where they cannot affect correctness: the seed
pick (smallest float circumradius — any non-collinear seed is valid),
the insertion-order sort key and the hull hash (both only heuristics
for where the front walk starts; the walk itself is exact). Ties in
the insertion order break on the coordinate pair, never on input
position, so for points in general position the output mesh is a
pure FUNCTION OF THE POINT SET — permutation invariance is pinned in
tests/test_delaunay.py alongside the exact laws:

    sum of triangle area2  ==  convex hull area2      (exact cover)
    every triangle CCW, area2 > 0                     (no overlap)
    no input point strictly inside any circumcircle   (Delaunay)
    T = 2*n - 2 - h on generic sets                   (Euler)

Degenerate contract (errors-as-data, the repo discipline): exact
duplicate points collapse to their smallest-id site; fully collinear
tiles yield zero triangles and the line chain as the hull; a point
that lands exactly ON a hull edge of the frontier at its insertion
moment (only possible for cocircular-with-the-sweep configurations)
is skipped and COUNTED in ``n_skipped`` — delaunator's documented
behavior, surfaced as data instead of silently vanishing.

Scale shape: tile assignment is pure column math (no shuffle), then
ONE Exchange on hash(tx, ty) feeds ``applyInPandas`` — per-task state
is one tile's points, bounded by tile footprint density exactly like
``earcut.triangulate`` is bounded by feature size. Output is one row
per tile carrying triangle vertex ids (delaunator's flat-triple
contract) — renderers upload the tile's points once and draw
``tri_ids``; nothing is quadratic in anything but per-tile point
count, and the kernel is O(n log n) expected via the hashed front.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                               StructField, StructType)

from .synth import EXTENT


# ------------------------------------------------------- exact predicates

def _orient(ax, ay, bx, by, cx, cy) -> int:
    """z of (b-a) x (c-a): > 0 iff (a,b,c) turns counter-clockwise.
    Python-int exact at any magnitude."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _in_circle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """True iff p lies STRICTLY inside the circumcircle of the CCW
    triangle (a, b, c). Exact integer 3x3 determinant."""
    adx = ax - px
    ady = ay - py
    bdx = bx - px
    bdy = by - py
    cdx = cx - px
    cdy = cy - py
    return (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    ) > 0


def _circumcenter(ax, ay, bx, by, cx, cy):
    """Float circumcenter of (a, b, c); caller guarantees non-collinear.
    Only used for the insertion-order sort key and the hull hash."""
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = 0.5 / (dx * ey - dy * ex)
    return ax + (ey * bl - dy * cl) * d, ay + (dx * cl - ex * bl) * d


def _circumradius2(ax, ay, bx, by, cx, cy) -> float:
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    den = dx * ey - dy * ex
    if den == 0:
        return math.inf
    d = 0.5 / den
    x = (ey * bl - dy * cl) * d
    y = (dx * cl - ex * bl) * d
    return x * x + y * y


# ------------------------------------------------------------ the kernel

def triangulate_points(px: list, py: list):
    """Exact Delaunay triangulation of DISTINCT int points.

    Returns ``(triangles, hull, skipped)``: ``triangles`` is a flat
    list of vertex indices (3 per CCW triangle, delaunator's
    contract), ``hull`` the convex hull indices in CCW order, and
    ``skipped`` the indices excluded by the on-frontier-edge
    degenerate rule (see module docstring). Collinear inputs yield
    ``([], chain, [])`` with the chain sorted along the line.
    """
    n = len(px)
    px = [int(v) for v in px]
    py = [int(v) for v in py]
    if n == 0:
        return [], [], []
    if n < 3:
        order = sorted(range(n), key=lambda i: (px[i], py[i]))
        return [], order, []

    # --- seed triangle: center-most point, its nearest neighbor, and
    # the third point minimizing the circumradius (delaunator's pick)
    minx, maxx = min(px), max(px)
    miny, maxy = min(py), max(py)
    cx2, cy2 = minx + maxx, miny + maxy  # doubled center, exact

    def d2center(i):
        dx = 2 * px[i] - cx2
        dy = 2 * py[i] - cy2
        return dx * dx + dy * dy

    i0 = min(range(n), key=lambda i: (d2center(i), px[i], py[i]))

    def d2(i, j):
        dx = px[i] - px[j]
        dy = py[i] - py[j]
        return dx * dx + dy * dy

    i1 = min((i for i in range(n) if i != i0),
             key=lambda i: (d2(i, i0), px[i], py[i]))

    i2 = -1
    best = (math.inf, 0, 0)
    for i in range(n):
        if i == i0 or i == i1:
            continue
        r = _circumradius2(px[i0], py[i0], px[i1], py[i1], px[i], py[i])
        # coordinate tie-break: the seed (hence the whole mesh) is a
        # pure function of the point SET, not its input order
        key = (r, px[i], py[i])
        if key < best:
            best = key
            i2 = i
    best_r = best[0]

    if i2 == -1 or not math.isfinite(best_r):
        # every point collinear: hull is the sorted chain
        order = sorted(range(n), key=lambda i: (px[i], py[i]))
        return [], order, []

    if _orient(px[i0], py[i0], px[i1], py[i1], px[i2], py[i2]) < 0:
        i1, i2 = i2, i1

    ccx, ccy = _circumcenter(px[i0], py[i0], px[i1], py[i1],
                             px[i2], py[i2])

    order = sorted(
        (i for i in range(n) if i != i0 and i != i1 and i != i2),
        key=lambda i: ((px[i] - ccx) ** 2 + (py[i] - ccy) ** 2,
                       px[i], py[i]))

    # --- halfedge mesh + advancing hull front
    triangles: list[int] = []
    halfedges: list[int] = []
    hull_prev = [0] * n
    hull_next = [0] * n
    hull_tri = [0] * n
    hash_size = max(1, math.ceil(math.sqrt(n)))
    hull_hash = [-1] * hash_size

    def _hash_key(x, y):
        dx = x - ccx
        dy = y - ccy
        denom = abs(dx) + abs(dy)
        p = dx / denom if denom else 0.0
        ang = (3 - p if dy > 0 else 1 + p) / 4  # [0, 1)
        return int(hash_size * ang) % hash_size

    def _link(a, b):
        halfedges[a] = b
        if b != -1:
            halfedges[b] = a

    def _add_triangle(a, b, c, ha, hb, hc):
        t = len(triangles)
        triangles.extend((a, b, c))
        halfedges.extend((-1, -1, -1))
        _link(t, ha)
        _link(t + 1, hb)
        _link(t + 2, hc)
        return t

    hull_start = i0
    hull_next[i0] = hull_prev[i2] = i1
    hull_next[i1] = hull_prev[i0] = i2
    hull_next[i2] = hull_prev[i1] = i0
    hull_tri[i0] = 0
    hull_tri[i1] = 1
    hull_tri[i2] = 2
    hull_hash[_hash_key(px[i0], py[i0])] = i0
    hull_hash[_hash_key(px[i1], py[i1])] = i1
    hull_hash[_hash_key(px[i2], py[i2])] = i2

    _add_triangle(i0, i1, i2, -1, -1, -1)

    stack: list[int] = []

    def _legalize(a):
        ar = 0
        while True:
            b = halfedges[a]
            a0 = a - a % 3
            ar = a0 + (a + 2) % 3
            if b == -1:
                if stack:
                    a = stack.pop()
                    continue
                break
            b0 = b - b % 3
            al = a0 + (a + 1) % 3
            bl = b0 + (b + 2) % 3
            p0 = triangles[ar]
            pr = triangles[a]
            pl = triangles[al]
            p1 = triangles[bl]
            if _in_circle(px[p0], py[p0], px[pr], py[pr],
                          px[pl], py[pl], px[p1], py[p1]):
                triangles[a] = p1
                triangles[b] = p0
                hbl = halfedges[bl]
                if hbl == -1:
                    # the flipped-away edge was on the hull front:
                    # repoint the front's triangle reference
                    e = hull_start
                    while True:
                        if hull_tri[e] == bl:
                            hull_tri[e] = a
                            break
                        e = hull_prev[e]
                        if e == hull_start:
                            break
                _link(a, hbl)
                _link(b, halfedges[ar])
                _link(ar, bl)
                stack.append(b0 + (b + 1) % 3)
            else:
                if stack:
                    a = stack.pop()
                    continue
                break
        return ar

    skipped: list[int] = []
    for i in order:
        x, y = px[i], py[i]

        # locate a starting hull vertex near the point's pseudo-angle
        start = -1
        key = _hash_key(x, y)
        for j in range(hash_size):
            start = hull_hash[(key + j) % hash_size]
            if start != -1 and start != hull_next[start]:
                break
        start = hull_prev[start]

        # walk the front to the first VISIBLE edge (point strictly
        # right of the CCW directed edge e -> next(e))
        e = start
        while True:
            q = hull_next[e]
            if _orient(px[e], py[e], px[q], py[q], x, y) < 0:
                break
            e = q
            if e == start:
                e = -1
                break
        if e == -1:
            skipped.append(i)  # exactly on the frontier boundary
            continue

        # first triangle from the visible edge
        t = _add_triangle(e, i, hull_next[e], -1, -1, hull_tri[e])
        hull_tri[i] = _legalize(t + 2)
        hull_tri[e] = t

        # walk forward while subsequent edges are visible
        nxt = hull_next[e]
        while True:
            q = hull_next[nxt]
            if not _orient(px[nxt], py[nxt], px[q], py[q], x, y) < 0:
                break
            t = _add_triangle(nxt, i, q, hull_tri[i], -1, hull_tri[nxt])
            hull_tri[i] = _legalize(t + 2)
            hull_next[nxt] = nxt  # removed from the front
            nxt = q

        # walk backward (only reachable when e was the walk start)
        if e == start:
            while True:
                q = hull_prev[e]
                if not _orient(px[q], py[q], px[e], py[e], x, y) < 0:
                    break
                t = _add_triangle(q, i, e, -1, hull_tri[e], hull_tri[q])
                _legalize(t + 2)
                hull_tri[q] = t
                hull_next[e] = e  # removed from the front
                e = q

        # splice the new point into the front between e and nxt
        hull_start = e
        hull_prev[i] = e
        hull_next[e] = i
        hull_prev[nxt] = i
        hull_next[i] = nxt
        hull_hash[_hash_key(x, y)] = i
        hull_hash[_hash_key(px[e], py[e])] = e

    # materialize the hull ring (CCW)
    hull = []
    e = hull_start
    while True:
        hull.append(e)
        e = hull_next[e]
        if e == hull_start:
            break

    return triangles, hull, skipped


def canonical_triangles(triangles: list) -> list:
    """Rotate each CCW triple so its smallest vertex leads, then sort
    the triple list — a canonical form independent of construction
    order (rotation preserves orientation)."""
    out = []
    for t in range(0, len(triangles), 3):
        a, b, c = triangles[t], triangles[t + 1], triangles[t + 2]
        if b <= a and b <= c:
            a, b, c = b, c, a
        elif c <= a and c <= b:
            a, b, c = c, a, b
        out.append((a, b, c))
    out.sort()
    return [v for tri in out for v in tri]


def _area2(px, py, ids) -> int:
    """Integer shoelace doubled area of the ring given by ``ids``."""
    s = 0
    m = len(ids)
    for k in range(m):
        i, j = ids[k], ids[(k + 1) % m]
        s += px[i] * py[j] - px[j] * py[i]
    return s


# ---------------------------------------------------------- Spark surface

_TIN_SCHEMA = StructType([
    StructField("tx", IntegerType()),
    StructField("ty", IntegerType()),
    StructField("n_points", LongType()),
    StructField("n_sites", LongType()),
    StructField("n_skipped", IntegerType()),
    StructField("n_triangles", LongType()),
    StructField("n_hull", IntegerType()),
    StructField("hull_area2", LongType()),
    StructField("tri_area2", LongType()),
    StructField("tri_ids", ArrayType(LongType())),
    StructField("hull_ids", ArrayType(LongType())),
])


def tin_tiles(points: DataFrame, x_col: str = "wx", y_col: str = "wy",
              id_col: str = "iid", extent: int = EXTENT,
              partitions: int | None = None) -> DataFrame:
    """Per-tile Delaunay TIN over world-positioned points.

    One row per non-empty tile: mesh triangle ids (flat triples of
    the input ``id_col``, delaunator's contract), CCW hull ids, and
    the exact-law columns ``tri_area2``/``hull_area2`` (equal by
    construction — rides along as a cross-check any consumer can
    assert). Exact duplicate positions collapse to the smallest-id
    site (``n_sites`` <= ``n_points``); frontier-degenerate skips are
    counted. ONE Exchange (hash on the tile key); per-task state is
    one tile's point set.

    ``partitions`` pins the kernel stage's task count: the shuffled
    rows are three longs each, so AQE coalesces the Exchange far below
    the tile count while the per-tile PYTHON cost (~26 us/site) is
    what actually bounds the stage — the standard starved-kernel
    shape (BENCH.md sessions 8/17). An explicit repartition on the
    group key satisfies the applyInPandas distribution requirement,
    so it replaces (not precedes) the groupBy Exchange.
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

    def _tile(pdf):
        import pandas as pd

        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        n_points = len(pdf)
        # deterministic site set: smallest pid owns each exact position
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
        tris, hull, skipped = triangulate_points(pxl, pyl)
        tris = canonical_triangles(tris)
        tri_area2 = 0
        for t in range(0, len(tris), 3):
            a, b, c = tris[t], tris[t + 1], tris[t + 2]
            tri_area2 += _orient(pxl[a], pyl[a], pxl[b], pyl[b],
                                 pxl[c], pyl[c])
        hull_area2 = _area2(pxl, pyl, hull) if len(hull) >= 3 else 0
        # rotate the CCW hull to lead with its smallest site id
        if hull:
            k = min(range(len(hull)), key=lambda j: pid[hull[j]])
            hull = hull[k:] + hull[:k]
        return pd.DataFrame([{
            "tx": tx, "ty": ty,
            "n_points": n_points,
            "n_sites": len(pxl),
            "n_skipped": len(skipped),
            "n_triangles": len(tris) // 3,
            "n_hull": len(hull),
            "hull_area2": hull_area2,
            "tri_area2": tri_area2,
            "tri_ids": [int(pid[i]) for i in tris],
            "hull_ids": [int(pid[i]) for i in hull],
        }])

    return src.groupBy("tx", "ty").applyInPandas(_tile, _TIN_SCHEMA)
