"""Distributed per-group convex hull (ST_ConvexHull aggregate).

The region a user's GPS track covers: for each group, the convex hull
of its planted integer points, reduced DISTRIBUTED-FIRST — hull is a
monoid (hull(A ∪ B) = hull(hull(A) ∪ hull(B))), so a salted
local-hull pass bounds every task to a FRAGMENT of a group before the
per-group pass ever sees it:

    dedupe (group, x, y)                    ->  shuffle 1 (exact)
    groupBy (group, salt) local chain hull  ->  reuses shuffle 1's
                                                partitioning (salt is
                                                a subset-compatible
                                                derivation, see below)
    groupBy (group) final chain hull        ->  shuffle 2, but inputs
                                                are LOCAL HULLS (tiny)

At 10^12 points a hot group's raw points never congregate: the salt
splits it S ways and only each fragment's hull vertices (O(N^(1/3))
expected for integer point clouds) shuffle again. The two-level law —
salted == unsalted, any S — is pinned in tests/test_hull.py.

Hull discipline: Andrew's monotone chain with STRICT turns — collinear
boundary points are never vertices, a fully-collinear group reduces to
its two endpoints, a single distinct point to itself. All coordinates
stay int64; the cross products are exact.

Oracle (hull_stats_sql): the maximal-edge characterization. Over the
group's DISTINCT points, a directed edge (p, q) is a CCW hull edge iff
every other point r is strictly left (cross(q-p, r-p) > 0) or collinear
and strictly BETWEEN p and q — a collinear r beyond either endpoint
disqualifies, so collinear chains collapse to their maximal edge,
exactly matching the strict chain hull. Hull vertices are the distinct
edge starts; area2 is the signed shoelace sum of cross(p, q) over the
directed hull edges (each vertex starts exactly one CCW edge). O(n^2)
candidate edges x O(n) refutation per group — pure SQL, exact, feasible
because per-group n is bounded (~67 points at every sf).

Reference analog: none in vtzero (SURVEY §2 is codec-side); this is
north_star spatial-aggregate surface over the same world model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chain_hull", "hull_vertices", "hull_stats", "hull_stats_sql"]

DEFAULT_SALT = 16


def chain_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over int64 points -> CCW hull ring (no
    repeated closing point), strict turns only. Degenerate inputs:
    one distinct point -> itself; collinear set -> its two endpoints.
    Input need not be deduplicated (np.unique handles it).

    Domain guard: coordinates must fit 30 bits so every cross product
    AND the ring's area sum stay exact int64 (|area2| <= 2^62 for a
    2^30-bounded bbox). The engine's world grid is 2^16, far inside;
    an import of raw planet-scale int64s fails loudly instead of
    silently wrapping."""
    pts = np.asarray(pts, dtype=np.int64)
    if pts.size and int(np.abs(pts).max()) >= (1 << 30):
        raise ValueError("chain_hull requires |coordinates| < 2^30 "
                         "for exact int64 shoelace arithmetic")
    pts = np.unique(pts, axis=0)  # sorts lexicographically
    n = len(pts)
    if n <= 2:
        return pts

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) \
                        - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    if len(ring) < 2:        # fully collinear: endpoints only
        return np.array([pts[0], pts[-1]], dtype=np.int64)
    arr = np.array(ring, dtype=np.int64)
    # the cross test above builds a counter-clockwise walk in standard
    # math orientation; assert-normalize to positive shoelace so the
    # emitted ring order is a contract, not a convention
    return arr if _ring_area2(arr) >= 0 else arr[::-1]


def _ring_area2(ring: np.ndarray) -> int:
    if len(ring) < 3:
        return 0
    xs, ys = ring[:, 0].astype(np.int64), ring[:, 1].astype(np.int64)
    return int(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def _dedup(points: DataFrame, group_col: str, x_col: str,
           y_col: str) -> DataFrame:
    return points.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    ).distinct()


def _two_level(pts: DataFrame, salt: int) -> DataFrame:
    """Salted local hulls -> per-group point set bounded by S * local
    hull sizes. The salt derives from the POINT (xxhash64), never from
    partition ids, so re-runs are bit-identical. Every vertex row
    carries its fragment's DISTINCT point count (_fn) and fragment id
    (_s); since the salt partitions the deduped point set, summing _fn
    over distinct fragments downstream recovers the group's n_points
    without a second scan of the raw points."""

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        ring = chain_hull(pdf[["px", "py"]].to_numpy())
        return pd.DataFrame({"g": pdf["g"].iloc[0],
                             "px": ring[:, 0], "py": ring[:, 1],
                             "_s": int(pdf["_s"].iloc[0]),
                             "_fn": len(pdf)})

    salted = pts.withColumn(
        "_s", F.pmod(F.xxhash64("px", "py"), F.lit(salt)))
    return salted.groupBy("g", "_s").applyInPandas(
        local, schema="g long, px long, py long, _s long, _fn long")


def hull_vertices(points: DataFrame, group_col: str = "user_id",
                  x_col: str = "wx", y_col: str = "wy",
                  salt: int = DEFAULT_SALT) -> DataFrame:
    """(group, x, y) -> one row per hull vertex with its CCW ring
    position: (group, ord, hx, hy)."""
    pts = _dedup(points, group_col, x_col, y_col)
    if salt > 1:
        pts = _two_level(pts, salt).select("g", "px", "py")

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        ring = chain_hull(pdf[["px", "py"]].to_numpy())
        return pd.DataFrame({"g": pdf["g"].iloc[0],
                             "ord": np.arange(len(ring), dtype=np.int64),
                             "hx": ring[:, 0], "hy": ring[:, 1]})

    return pts.groupBy("g").applyInPandas(
        final, schema="g long, ord long, hx long, hy long") \
        .withColumnRenamed("g", group_col)


def hull_stats(points: DataFrame, group_col: str = "user_id",
               x_col: str = "wx", y_col: str = "wy",
               salt: int = DEFAULT_SALT) -> DataFrame:
    """Per-group hull summary, every column exact int64: distinct
    point count, hull vertex count, hull-vertex coordinate sums, and
    hull area2 (shoelace; 0 for degenerate point/segment hulls).
    THREE shuffles total, no join: the dedupe, the salted local-hull
    group, and the final group — n_points rides the fragment rows as
    per-fragment counts (the salt partitions the deduped set, so
    summing one count per distinct fragment is exact)."""
    pts = _dedup(points, group_col, x_col, y_col)
    if salt > 1:
        reduced = _two_level(pts, salt)
    else:
        reduced = pts.withColumn("_s", F.lit(0)) \
            .withColumn("_fn", F.lit(None).cast("long"))

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        ring = chain_hull(pdf[["px", "py"]].to_numpy())
        if pdf["_fn"].isna().any():          # salt<=1: raw deduped rows
            n_points = len(pdf)
        else:
            n_points = int(pdf.drop_duplicates("_s")["_fn"].sum())
        return pd.DataFrame([{
            "g": int(pdf["g"].iloc[0]),
            "n_points": n_points,
            "n_hull": len(ring),
            "sum_hx": int(ring[:, 0].sum()),
            "sum_hy": int(ring[:, 1].sum()),
            "area2": _ring_area2(ring),
        }])

    return reduced.groupBy("g").applyInPandas(
        final,
        schema=("g long, n_points long, n_hull long, sum_hx long, "
                "sum_hy long, area2 long")
    ).withColumnRenamed("g", group_col)


def hull_tiles(points: DataFrame, zoom: int, extent: int = 4096,
               buffer: int = 0, layer: str = "hulls",
               group_col: str = "user_id", x_col: str = "wx",
               y_col: str = "wy", salt: int = DEFAULT_SALT) -> DataFrame:
    """The servable form: each group's hull as an MVT polygon, through
    the SAME world-features ingest tail every other ingest runs
    (geojson.world_features_to_tiles: bbox fan-out -> localize ->
    clip -> vectorized encode). Hull rings arrive CCW-positive from
    chain_hull — the outer-ring winding the encoder expects — and are
    closed here (GeoJSON ring convention, first == last). Degenerate
    hulls (< 3 vertices) drop: a point or segment has no polygon."""
    from . import geojson as _geojson

    verts = hull_vertices(points, group_col, x_col, y_col, salt)
    t = verts.groupBy(group_col).agg(
        F.array_sort(F.collect_list(
            F.struct("ord", "hx", "hy"))).alias("_vs"))
    ring = F.transform("_vs", lambda v: F.array(v["hx"], v["hy"]))
    closed = F.concat(ring, F.slice(ring, 1, 1))
    p = t.select(
        F.col(group_col).cast("long").alias("fid"),
        F.lit("Polygon").alias("gj_type"),
        F.array(closed).alias("parts"),
        F.size("_vs").alias("_n"),
    ).where(F.col("_n") >= 3).drop("_n")
    return _geojson.world_features_to_tiles(p, zoom, extent,
                                            buffer=buffer, layer=layer)


def hull_stats_sql(points_cte: str = "pts",
                   group_col: str = "user_id", pre: str = "") -> str:
    """DuckDB mirror via the maximal-edge characterization (module
    docstring). Same columns as hull_stats. cross(q-p, r-p) < 0 or a
    collinear r outside segment [p, q] refutes the edge. ``pre``
    injects caller CTEs (the points synthesis) into the WITH list."""
    pre = pre.rstrip().rstrip(",") + ",\n" if pre.strip() else ""
    return f"""
WITH {pre}dpts AS (
  SELECT DISTINCT {group_col} AS g, px, py FROM {points_cte}
),
counts AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_points,
         CAST(min(px) AS BIGINT) AS only_x,
         CAST(min(py) AS BIGINT) AS only_y
  FROM dpts GROUP BY g
),
hull_edges AS (
  SELECT p.g, p.px AS ex, p.py AS ey, q.px AS qx, q.py AS qy
  FROM dpts p JOIN dpts q
    ON p.g = q.g AND (p.px != q.px OR p.py != q.py)
  WHERE NOT EXISTS (
    SELECT 1 FROM dpts r
    WHERE r.g = p.g
      AND NOT (r.px = p.px AND r.py = p.py)
      AND NOT (r.px = q.px AND r.py = q.py)
      AND (
        (q.px - p.px) * (r.py - p.py)
          - (q.py - p.py) * (r.px - p.px) < 0
        OR (
          (q.px - p.px) * (r.py - p.py)
            - (q.py - p.py) * (r.px - p.px) = 0
          AND (
            (q.px - p.px) * (r.px - p.px)
              + (q.py - p.py) * (r.py - p.py) < 0
            OR (q.px - p.px) * (r.px - p.px)
              + (q.py - p.py) * (r.py - p.py)
              > (q.px - p.px) * (q.px - p.px)
              + (q.py - p.py) * (q.py - p.py)
          )
        )
      )
  )
),
hverts AS (
  SELECT DISTINCT g, ex, ey FROM hull_edges
),
hagg AS (
  SELECT v.g, v.n_hull, v.sum_hx, v.sum_hy, e.area2
  FROM (
    SELECT g, CAST(count(*) AS BIGINT) AS n_hull,
           CAST(sum(ex) AS BIGINT) AS sum_hx,
           CAST(sum(ey) AS BIGINT) AS sum_hy
    FROM hverts GROUP BY g
  ) v
  JOIN (
    SELECT g, CAST(sum(ex * qy - qx * ey) AS BIGINT) AS area2
    FROM hull_edges GROUP BY g
  ) e ON e.g = v.g
)
SELECT c.g AS {group_col}, c.n_points,
       CASE WHEN c.n_points = 1 THEN 1 ELSE h.n_hull END AS n_hull,
       CASE WHEN c.n_points = 1 THEN c.only_x ELSE h.sum_hx END AS sum_hx,
       CASE WHEN c.n_points = 1 THEN c.only_y ELSE h.sum_hy END AS sum_hy,
       CASE WHEN c.n_points = 1 THEN CAST(0 AS BIGINT)
            ELSE h.area2 END AS area2
FROM counts c LEFT JOIN hagg h ON h.g = c.g
"""
