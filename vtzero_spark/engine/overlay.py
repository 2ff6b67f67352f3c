"""Polygon-overlay intersection join: convex polygon sets A x B ->
one row per pair with strictly positive intersection area, plus the
EXACT doubled area (``area2 = 2 * area``).

The missing member of the engine's spatial-join family (pip_join is
point x polygon; this is polygon x polygon). Same scale skeleton as
pip_join (joins.py): both sides explode their bbox into covering
cells, the small B index **broadcasts**, candidate pairs come out of
one hash join on the cell key (deduped on the pair key), and only the
surviving pairs reach the geometry kernel — nothing is all-pairs.

The refine is a batch-vectorized Sutherland–Hodgman clip of ring A
against ring B's half-planes (the general-half-plane extension of
clip.clip_rings, which clips against axis-aligned rect edges:
geometry convention per vtzero geometry.hpp:161-169, outer ring CW in
y-down space = positive shoelace) followed by one shoelace pass.
The kernel handles arbitrary convex rings of mixed vertex counts
(pairs grouped by B edge count inside each Arrow batch).

Exactness: area2 is rounded from the float64 shoelace. For rings
whose edge intersections land on the half-integer lattice (e.g. the
synth diamond corpus, all +-1 slopes, coords < 2^17) every
intermediate is exactly representable in float64, so area2 is EXACT —
that is what lets the overlay query hash-match a closed-form DuckDB
oracle (diamond ∩ diamond under u=x+y, v=x-y is an axis-aligned
rectangle intersection; area2 = overlap_u * overlap_v).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import polygon_cell_index
from .synth import EXTENT


# ------------------------------------------------------ numpy kernel

def _halfplanes(bx: np.ndarray, by: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-edge half-plane coefficients (a, b, c) with the ring
    interior satisfying a*x + b*y <= c, for a batch of CLOSED convex
    rings stacked as (P, V) arrays (same vertex count V per row)."""
    a = by[:, 1:] - by[:, :-1]
    b = bx[:, :-1] - bx[:, 1:]
    c = a * bx[:, :-1] + b * by[:, :-1]
    # orient toward the interior: the centroid of the open ring must
    # satisfy every inequality (convexity makes the centroid interior)
    gx = bx[:, :-1].mean(axis=1, keepdims=True)
    gy = by[:, :-1].mean(axis=1, keepdims=True)
    flip = a * gx + b * gy > c
    a = np.where(flip, -a, a)
    b = np.where(flip, -b, b)
    c = np.where(flip, -c, c)
    return a, b, c


def clip_rings_halfplanes(
    px: np.ndarray,
    py: np.ndarray,
    roff: np.ndarray,
    A: np.ndarray,
    B: np.ndarray,
    C: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sutherland–Hodgman clip of a batch of OPEN rings against
    PER-RING convex half-plane sets.

    px/py: flat float64 coords, roff: int64 ring offsets (R+1).
    A/B/C: (R, E) per-ring coefficients, interior = a*x + b*y <= c.
    Returns (qx, qy, qoff) with rings keeping their slot (possibly
    empty) — the per-ring generalization of clip.clip_rings, same
    single-pass cumsum scatter per half-plane.
    """
    R, E = A.shape
    for j in range(E):
        n = px.size
        if n == 0:
            break
        counts = np.diff(roff)
        ring_id = np.repeat(np.arange(R), counts)
        idx = np.arange(n)
        nxt = idx + 1
        last = roff[1:] - 1
        last = last[counts > 0]
        nxt[last] = roff[:-1][counts > 0]
        s = A[ring_id, j] * px + B[ring_id, j] * py
        bound = C[ring_id, j]
        inside = s <= bound
        cross = inside != inside[nxt]
        cnt = inside.astype(np.int64) + cross
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        total = starts[-1] + cnt[-1] if n else 0
        ci = np.flatnonzero(cross)
        qx = np.empty(total, dtype=np.float64)
        qy = np.empty(total, dtype=np.float64)
        if ci.size:
            t = (bound[ci] - s[ci]) / (s[nxt[ci]] - s[ci])
            ix = px[ci] + t * (px[nxt[ci]] - px[ci])
            iy = py[ci] + t * (py[nxt[ci]] - py[ci])
            IX = np.empty(n, dtype=np.float64)
            IY = np.empty(n, dtype=np.float64)
            IX[ci] = ix
            IY[ci] = iy
            fp = np.flatnonzero(inside)
            qx[starts[fp]] = px[fp]
            qy[starts[fp]] = py[fp]
            fc = np.flatnonzero(cross & ~inside)
            qx[starts[fc]] = IX[fc]
            qy[starts[fc]] = IY[fc]
            sc = np.flatnonzero(cross & inside)
            qx[starts[sc] + 1] = IX[sc]
            qy[starts[sc] + 1] = IY[sc]
        else:
            fp = np.flatnonzero(inside)
            qx[starts[fp]] = px[fp]
            qy[starts[fp]] = py[fp]
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=csum[1:])
        roff = csum[roff]
        px, py = qx, qy
    return px, py, roff


def _shoelace2(px: np.ndarray, py: np.ndarray, roff: np.ndarray) -> np.ndarray:
    """|2 * area| per OPEN ring (closing edge implied), one pass."""
    n = px.size
    R = roff.size - 1
    if n == 0:
        return np.zeros(R, dtype=np.float64)
    counts = np.diff(roff)
    idx = np.arange(n)
    nxt = idx + 1
    last = roff[1:] - 1
    last = last[counts > 0]
    nxt[last] = roff[:-1][counts > 0]
    terms = px * py[nxt] - px[nxt] * py
    out = np.zeros(R, dtype=np.float64)
    np.add.reduceat(np.append(terms, 0.0), np.minimum(roff[:-1], n))
    # reduceat needs nonempty segments; do it with a guarded cumsum
    cs = np.concatenate(([0.0], np.cumsum(terms)))
    out = cs[roff[1:]] - cs[roff[:-1]]
    return np.abs(out)


def convex_intersection_area2(
    ax_rings: pd.Series, bx_rings: pd.Series
) -> np.ndarray:
    """area2 of A ∩ B per pair; each Series element is a list of
    (x, y) structs as pandas dicts/rows from an MVT-style CLOSED ring.
    Pairs are grouped by (len_a, len_b) so each group runs the
    vectorized kernel on rectangular stacks."""
    P = len(ax_rings)
    out = np.zeros(P, dtype=np.float64)
    la = ax_rings.map(len).to_numpy()
    lb = bx_rings.map(len).to_numpy()
    for (na, nb) in set(zip(la.tolist(), lb.tolist())):
        sel = np.flatnonzero((la == na) & (lb == nb))
        g = sel.size
        axv = np.empty((g, na)); ayv = np.empty((g, na))
        bxv = np.empty((g, nb)); byv = np.empty((g, nb))
        for i, k in enumerate(sel):
            ra = ax_rings.iloc[k]
            rb = bx_rings.iloc[k]
            axv[i] = [p["x"] for p in ra]
            ayv[i] = [p["y"] for p in ra]
            bxv[i] = [p["x"] for p in rb]
            byv[i] = [p["y"] for p in rb]
        A, Bc, C = _halfplanes(bxv, byv)
        # open ring A (drop the closing duplicate) flattened
        px = axv[:, :-1].ravel()
        py = ayv[:, :-1].ravel()
        roff = np.arange(g + 1, dtype=np.int64) * (na - 1)
        qx, qy, qoff = clip_rings_halfplanes(px, py, roff, A, Bc, C)
        out[sel] = _shoelace2(qx, qy, qoff)
    return out


# ------------------------------------------------------ Spark operator

def overlay_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    cell: int = EXTENT,
) -> DataFrame:
    """Intersection-area join of two convex polygon sets.

    Input: both sides shaped like synth.polygons (pid, cx, cy, r,
    ring) — cx/cy/r is the L-inf bbox used ONLY for candidate culling,
    ring is the exact geometry. Output: (pid_a, pid_b, area2), one row
    per pair with area2 > 0 (touching boundaries excluded).

    Plan shape (PLANS.md): covering-cell hash join with the B index
    broadcast, dedup on the pair key, bbox prefilter as column math,
    then ONE Arrow batch kernel (grouped SH clip + shoelace) over the
    surviving candidates only.
    """
    idx_a = polygon_cell_index(polys_a, cell).select(
        "cell_x", "cell_y",
        F.col("pid").alias("pid_a"), F.col("ring").alias("ring_a"),
        F.col("cx").alias("cx_a"), F.col("cy").alias("cy_a"),
        F.col("r").alias("r_a"),
    )
    idx_b = polygon_cell_index(polys_b, cell).select(
        "cell_x", "cell_y",
        F.col("pid").alias("pid_b"), F.col("ring").alias("ring_b"),
        F.col("cx").alias("cx_b"), F.col("cy").alias("cy_b"),
        F.col("r").alias("r_b"),
    )
    cand = (
        idx_a.join(F.broadcast(idx_b), ["cell_x", "cell_y"])
        .dropDuplicates(["pid_a", "pid_b"])
        # bbox prefilter (strict: boxes must OVERLAP, not touch —
        # touching rings have zero intersection area anyway)
        .where(
            (F.abs(F.col("cx_a") - F.col("cx_b")) < F.col("r_a") + F.col("r_b"))
            & (F.abs(F.col("cy_a") - F.col("cy_b")) < F.col("r_a") + F.col("r_b"))
        )
        .select("pid_a", "pid_b", "ring_a", "ring_b")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            a2 = convex_intersection_area2(pdf["ring_a"], pdf["ring_b"])
            a2i = np.rint(a2).astype(np.int64)
            keep = a2i > 0
            yield pd.DataFrame({
                "pid_a": pdf["pid_a"].to_numpy()[keep],
                "pid_b": pdf["pid_b"].to_numpy()[keep],
                "area2": a2i[keep],
            })

    return cand.mapInPandas(kernel, "pid_a long, pid_b long, area2 long")


def overlay_sql(a_cte: str = "polys", b_cte: str = "polys_b") -> str:
    """DuckDB closed-form mirror for DIAMOND rings: under u = x + y,
    v = x - y an L1 ball becomes the axis-aligned square
    |u - (cx+cy)| <= r, |v - (cx-cy)| <= r, and du dv = 2 dx dy, so
    area2 = 2 * area_xy = overlap_u * overlap_v exactly."""
    ou = (f"(LEAST(a.cx + a.cy + a.r, b.cx + b.cy + b.r)"
          f" - GREATEST(a.cx + a.cy - a.r, b.cx + b.cy - b.r))")
    ov = (f"(LEAST(a.cx - a.cy + a.r, b.cx - b.cy + b.r)"
          f" - GREATEST(a.cx - a.cy - a.r, b.cx - b.cy - b.r))")
    return f"""
  SELECT a.pid AS pid_a, b.pid AS pid_b,
         CAST({ou} * {ov} AS BIGINT) AS area2
  FROM {a_cte} a, {b_cte} b
  WHERE {ou} > 0 AND {ov} > 0"""
