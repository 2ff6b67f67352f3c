"""Chi-shape concave hulls (engine/concave.py) — law coverage.

- lambda = None reproduces the convex hull vertex-for-vertex, and its
  exact area equals hull.py's chain_hull area (cross-module law)
- exact area law: ring shoelace == sum of surviving triangle area2
- containment: every site on or inside the ring, at every lambda
- monotonicity: area non-increasing as lambda decreases
- simplicity + permutation invariance
- Spark: chi_shapes == serial kernel per group; chi_tiles lints
  clean through the shared ingest tail; ONE Exchange.
"""

import random
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine.concave import chi_shape, chi_shapes, chi_tiles
from vtzero_spark.engine.delaunay import _area2, triangulate_points


def _rand(rng, n, r):
    pts = set()
    while len(pts) < n:
        pts.add((rng.randint(0, r), rng.randint(0, r)))
    pts = sorted(pts)
    return [p[0] for p in pts], [p[1] for p in pts]


def _on_or_in(ring, px, py, qx, qy):
    m = len(ring)
    wn = 0
    for i in range(m):
        a, b = ring[i], ring[(i + 1) % m]
        ax, ay, bx, by = px[a], py[a], px[b], py[b]
        cr = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        if cr == 0 and min(ax, bx) <= qx <= max(ax, bx) \
                and min(ay, by) <= qy <= max(ay, by):
            return True
        if ay <= qy:
            if by > qy and cr > 0:
                wn += 1
        elif by <= qy and cr < 0:
            wn -= 1
    return wn != 0


def test_chi_lambda_inf_is_convex_hull():
    rng = random.Random(31)
    from vtzero_spark.engine.hull import chain_hull

    for _ in range(15):
        px, py = _rand(rng, rng.randint(5, 50), 4096)
        tris, hull, _ = triangulate_points(px, py)
        if not tris:
            continue
        ring, a2, nrem = chi_shape(px, py, None)
        assert nrem == 0 and ring == hull
        assert a2 == _area2(px, py, hull)
        # cross-module: same exact area as hull.py's monotone chain
        ch = chain_hull(np.array(list(zip(px, py)), dtype=np.int64))
        sh = 0
        for k in range(len(ch)):
            x1, y1 = ch[k]
            x2, y2 = ch[(k + 1) % len(ch)]
            sh += int(x1) * int(y2) - int(x2) * int(y1)
        assert a2 == sh


def test_chi_laws_across_lambda():
    rng = random.Random(13)
    for _ in range(25):
        n = rng.randint(6, 60)
        r = rng.choice([100, 4096])
        px, py = _rand(rng, n, r)
        tris, hull, sk = triangulate_points(px, py)
        if not tris:
            continue
        prev = None
        for lam in (r, r // 2, r // 4, r // 8):
            ring, a2, _ = chi_shape(px, py, lam * lam)
            assert _area2(px, py, ring) == a2  # exact area law
            assert len(set(ring)) == len(ring)  # simple
            for i in range(n):
                if i in sk:
                    continue
                assert _on_or_in(ring, px, py, px[i], py[i])
            if prev is not None:
                assert a2 <= prev  # monotone carve
            prev = a2


def test_chi_permutation_invariance():
    rng = random.Random(4)
    for _ in range(15):
        n = rng.randint(6, 40)
        px, py = _rand(rng, n, 50)
        r1, a1, _ = chi_shape(px, py, 100)
        if not r1:
            continue
        perm = list(range(n))
        rng.shuffle(perm)
        qx = [px[i] for i in perm]
        qy = [py[i] for i in perm]
        r2, a2, _ = chi_shape(qx, qy, 100)
        c1 = [(px[i], py[i]) for i in r1]
        c2 = [(qx[j], qy[j]) for j in r2]
        k1, k2 = c1.index(min(c1)), c2.index(min(c2))
        assert c1[k1:] + c1[:k1] == c2[k2:] + c2[:k2]
        assert a1 == a2


def test_chi_carves_the_elbow():
    """A thick L of points: the convex hull spans the empty wedge
    between the arms; a tight lambda carves the hypotenuse back to the
    L, strictly shrinking the area while keeping every site. (A THIN
    L — all sites on the hull boundary — must NOT carve at all: the
    regularity rule forbids exposing boundary vertices, also pinned.)"""
    pts = set()
    for x in range(0, 101, 10):
        for y in (0, 10):
            pts.add((x, y))
    for y in range(0, 101, 10):
        for x in (0, 10):
            pts.add((x, y))
    pts = sorted(pts)
    px = [p[0] for p in pts]
    py = [p[1] for p in pts]
    ring_cv, a_cv, _ = chi_shape(px, py, None)
    ring, a, nrem = chi_shape(px, py, 15 * 15)
    assert nrem > 0 and a < a_cv
    for i in range(len(px)):
        assert _on_or_in(ring, px, py, px[i], py[i])
    # the carved footprint is (close to) the L itself: both arms'
    # area, far below the hull that includes the wedge
    assert a <= 2 * (2 * 100 * 10)
    # thin L: every site on the hull boundary -> regularity blocks
    tx = [k * 10 for k in range(11)] + [0] * 10
    ty = [0] * 11 + [k * 10 for k in range(1, 11)]
    _, a_thin, nrem_thin = chi_shape(tx, ty, 15 * 15)
    assert nrem_thin == 0
    _, a_cv_thin, _ = chi_shape(tx, ty, None)
    assert a_thin == a_cv_thin


def test_chi_degenerate_groups():
    assert chi_shape([], [], None) == ([], 0, 0)
    assert chi_shape([1, 2], [1, 2], 100) == ([], 0, 0)
    assert chi_shape([0, 5, 9], [0, 5, 9], 100) == ([], 0, 0)  # line


# ------------------------------------------------------------ Spark

def _pts(spark, n=600, groups=7):
    return spark.range(n).select(
        (F.col("id") % groups).alias("user_id"),
        (F.abs(F.xxhash64("id")) % 4096).alias("wx"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 4096).alias("wy"))


def test_chi_shapes_matches_serial(spark):
    pts = _pts(spark)
    rows = {r["group_id"]: r
            for r in chi_shapes(pts, lam=500).collect()}
    pdf = pts.toPandas()
    assert rows
    for gid, r in rows.items():
        sub = pdf[pdf.user_id == gid] \
            .sort_values(["wx", "wy"], kind="mergesort") \
            .drop_duplicates(subset=["wx", "wy"], keep="first")
        px = [int(v) for v in sub.wx]
        py = [int(v) for v in sub.wy]
        ring, a2, nrem = chi_shape(px, py, 500 * 500)
        assert r["n_points"] == (pdf.user_id == gid).sum()
        assert r["n_sites"] == len(px)
        assert r["n_verts"] == len(ring)
        assert r["n_removed"] == nrem
        assert r["area2"] == a2
        assert [list(v) for v in r["ring"]] == \
            [[px[i], py[i]] for i in ring]


def test_chi_tiles_lint_clean(spark):
    from vtzero_spark.engine.lint import lint_tile_bytes

    tiles = chi_tiles(_pts(spark), lam=500, zoom=4).collect()
    assert tiles
    for r in tiles:
        assert not lint_tile_bytes(bytes(r["tile_bytes"]))


def test_chi_shapes_single_exchange(spark):
    plan = chi_shapes(_pts(spark), lam=500) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    plan = chi_shapes(_pts(spark), lam=500, partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "REPARTITION_BY_NUM" in plan