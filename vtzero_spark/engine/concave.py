"""Chi-shape concave hulls — characteristic footprint polygons per
group, carved from the exact Delaunay triangulation.

The convex hull (``hull.py``) over-covers concave activity regions: a
user whose GPS track follows an L-shaped street network gets the full
wedge between the arms. The chi-shape (Duckham, Kulik, Worboys &
Galton 2008, "Efficient generation of simple polygons for
characterizing the shape of a set of points in the plane" — the
published algorithm behind most "concave hull" implementations)
carves the hull inward: starting from the Delaunay triangulation's
boundary, repeatedly remove the LONGEST boundary edge whose squared
length exceeds lambda^2, provided the removal is REGULAR (the exposed
opposite vertex is not already on the boundary — this keeps the
boundary a simple polygon and every site inside or on it). The result
interpolates between the convex hull (lambda = inf) and a tight
footprint, and because the underlying triangulation and every length
comparison are exact integers, two laws hold identically:

    ring shoelace area2 == sum of remaining triangle area2   (exact)
    lambda = inf        => ring == convex hull, vertex for vertex

Tie-breaking (equal squared lengths) is by the undirected edge's
sorted coordinate pairs, so the carve order — hence the shape — is a
pure function of the point set and lambda.

Scale shape: identical to ``hull.py``'s final stage — ONE Exchange on
the group key into applyInPandas, per-task state one group's points.
Unlike the convex hull, the chi-shape is NOT a monoid (carving does
not distribute over union), so there is no map-side partial tier; the
per-group point count is the state bound, exactly as for dbscan's
per-cell contraction. Degenerate groups (< 3 sites, collinear) yield
no polygon and are reported with n_verts = 0, errors-as-data.
"""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                               StructField, StructType)

from .delaunay import _orient, triangulate_points


def chi_shape(px: list, py: list, lam2: int | None):
    """Chi-shape of DISTINCT int points with squared length threshold
    ``lam2`` (None = no carving: the convex hull).

    Returns ``(ring, area2, n_removed)``: ``ring`` the CCW boundary
    vertex indices (open, each vertex once), ``area2`` the exact
    doubled area (== sum of surviving triangle area2), ``n_removed``
    the number of carved triangles. Degenerate inputs (< 3 sites or
    collinear) return ``([], 0, 0)``.
    """
    n = len(px)
    px = [int(v) for v in px]
    py = [int(v) for v in py]
    tris, hull, skipped = triangulate_points(px, py)
    if not tris:
        return [], 0, 0

    # halfedge-free adjacency: directed edge (a, b) -> triangle index
    ntri = len(tris) // 3
    edge_tri: dict = {}
    alive = [True] * ntri
    for t in range(ntri):
        a, b, c = tris[3 * t], tris[3 * t + 1], tris[3 * t + 2]
        edge_tri[(a, b)] = t
        edge_tri[(b, c)] = t
        edge_tri[(c, a)] = t

    def _sq(a, b):
        dx = px[a] - px[b]
        dy = py[a] - py[b]
        return dx * dx + dy * dy

    def _ekey(a, b):
        # deterministic tie-break: the undirected edge's sorted
        # coordinate pairs (never input order)
        pa = (px[a], py[a])
        pb = (px[b], py[b])
        return (pa, pb) if pa <= pb else (pb, pa)

    # boundary = hull edges, directed so the interior is on the LEFT
    # (hull is CCW). next/prev maps keep the ring walkable.
    nxt = {}
    boundary_vertex = set(hull)
    heap = []
    for k in range(len(hull)):
        a, b = hull[k], hull[(k + 1) % len(hull)]
        nxt[a] = b
        if lam2 is not None:
            sq = _sq(a, b)
            if sq > lam2:
                heapq.heappush(heap, (-sq, _ekey(a, b), a, b))

    n_removed = 0
    while heap:
        negsq, _, a, b = heapq.heappop(heap)
        if nxt.get(a) != b:
            continue  # stale: edge already replaced
        if -negsq <= lam2:
            break
        # the interior triangle adjacent to boundary edge a->b has the
        # SAME orientation (interior on the left): directed edge (a,b)
        t = edge_tri.get((a, b))
        if t is None or not alive[t]:
            continue
        # opposite vertex
        va, vb, vc = tris[3 * t], tris[3 * t + 1], tris[3 * t + 2]
        if va == a:
            c = vc if vb == b else vb
        elif vb == a:
            c = va if vc == b else vc
        else:
            c = vb if va == b else va
        if c in boundary_vertex:
            continue  # irregular removal: would pinch the polygon
        # carve: a->b becomes a->c->b
        alive[t] = False
        n_removed += 1
        nxt[a] = c
        nxt[c] = b
        boundary_vertex.add(c)
        if lam2 is not None:
            for (u, v) in ((a, c), (c, b)):
                sq = _sq(u, v)
                if sq > lam2:
                    heapq.heappush(heap, (-sq, _ekey(u, v), u, v))

    # materialize the ring from the start-most hull vertex
    start = hull[0]
    ring = [start]
    v = nxt[start]
    while v != start:
        ring.append(v)
        v = nxt[v]

    area2 = 0
    for t in range(ntri):
        if alive[t]:
            a, b, c = tris[3 * t], tris[3 * t + 1], tris[3 * t + 2]
            area2 += _orient(px[a], py[a], px[b], py[b], px[c], py[c])
    return ring, area2, n_removed


_CHI_SCHEMA = StructType([
    StructField("group_id", LongType()),
    StructField("n_points", LongType()),
    StructField("n_sites", LongType()),
    StructField("n_verts", IntegerType()),
    StructField("n_removed", IntegerType()),
    StructField("area2", LongType()),
    StructField("ring", ArrayType(ArrayType(LongType()))),
])


def chi_shapes(points: DataFrame, lam: int | None,
               group_col: str = "user_id", x_col: str = "wx",
               y_col: str = "wy",
               partitions: int | None = None) -> DataFrame:
    """Per-group chi-shape: one row per group with the CCW boundary
    ring ([x, y] pairs, open), its exact doubled area, and carve
    accounting. ``lam`` is the edge-length threshold in world units
    (None = convex hull). ONE Exchange on the group key; the
    ``partitions`` pin replaces it for the starved-kernel regime,
    exactly as in delaunay.tin_tiles."""
    lam2 = None if lam is None else int(lam) * int(lam)
    src = points.select(
        F.col(group_col).cast("long").alias("group_id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    if partitions:
        src = src.repartition(partitions, "group_id")

    def _grp(pdf):
        import pandas as pd

        gid = int(pdf["group_id"].iloc[0])
        n_points = len(pdf)
        pdf = pdf.sort_values(["x", "y"], kind="mergesort") \
            .drop_duplicates(subset=["x", "y"], keep="first")
        pxl = [int(v) for v in pdf["x"]]
        pyl = [int(v) for v in pdf["y"]]
        ring, area2, n_removed = chi_shape(pxl, pyl, lam2)
        return pd.DataFrame([{
            "group_id": gid,
            "n_points": n_points,
            "n_sites": len(pxl),
            "n_verts": len(ring),
            "n_removed": n_removed,
            "area2": area2,
            "ring": [[pxl[i], pyl[i]] for i in ring],
        }])

    return src.groupBy("group_id").applyInPandas(_grp, _CHI_SCHEMA)


def chi_tiles(points: DataFrame, lam: int | None, zoom: int,
              extent: int = 4096, layer: str = "footprints",
              group_col: str = "user_id", x_col: str = "wx",
              y_col: str = "wy",
              partitions: int | None = None) -> DataFrame:
    """The servable form: each group's chi-shape as an MVT polygon
    through the shared world-features ingest tail (the hull_tiles
    pattern — rings arrive CCW-positive and are closed here)."""
    from . import geojson as _geojson

    shapes = chi_shapes(points, lam, group_col, x_col, y_col,
                        partitions=partitions)
    ring = F.col("ring")
    closed = F.concat(ring, F.slice(ring, 1, 1))
    p = shapes.where(F.col("n_verts") >= 3).select(
        F.col("group_id").alias("fid"),
        F.lit("Polygon").alias("gj_type"),
        F.array(closed).alias("parts"))
    return _geojson.world_features_to_tiles(p, zoom, extent,
                                            layer=layer)
