"""Delaunay TIN (engine/delaunay.py) — exact-law, degenerate-contract
and Spark-parity coverage.

The kernel is exact by construction (integer orientation + in-circle
determinants), so the tests pin LAWS, not goldens:

- strict Delaunay: no input point strictly inside any circumcircle
  (the defining property, brute-checked with the same exact predicate)
- exact cover: all triangles CCW with positive area2 summing to the
  convex hull's shoelace area2 (together: a non-overlapping exact
  tessellation of the hull)
- Euler count on generic sets: T = 2n - 2 - h
- permutation invariance: the canonical mesh is a pure function of
  the point SET, including under heavy cocircularity
- degenerate contract: collinear chains, duplicates, n < 3,
  frontier-skip accounting
- Spark: tin_tiles == serial kernel per tile, exact-law columns hold,
  ONE Exchange in the plan.
"""

import random
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine.delaunay import (_area2, _in_circle, _orient,
                                          canonical_triangles, tin_tiles,
                                          triangulate_points)


def _rand_points(rng, n, r):
    pts = set()
    while len(pts) < n:
        pts.add((rng.randint(0, r), rng.randint(0, r)))
    pts = sorted(pts)
    return [p[0] for p in pts], [p[1] for p in pts]


def _check_laws(px, py, tris, hull, skipped):
    """Brute-check every law; returns the triangle count."""
    n = len(px)
    area_sum = 0
    for t in range(0, len(tris), 3):
        a, b, c = tris[t], tris[t + 1], tris[t + 2]
        o = _orient(px[a], py[a], px[b], py[b], px[c], py[c])
        assert o > 0, f"triangle {(a, b, c)} not CCW (area2={o})"
        area_sum += o
        for p in range(n):
            if p in (a, b, c):
                continue
            assert not _in_circle(px[a], py[a], px[b], py[b],
                                  px[c], py[c], px[p], py[p]), \
                f"point {p} strictly inside circumcircle of {(a, b, c)}"
    if len(hull) >= 3:
        ha = _area2(px, py, hull)
        assert ha > 0, "hull not CCW"
        assert area_sum == ha, f"cover law: {area_sum} != hull {ha}"
    if tris:
        missing = set(range(n)) - set(tris) - set(skipped) - set(hull)
        assert not missing, f"points vanished: {missing}"
    return len(tris) // 3


def test_delaunay_laws_random():
    rng = random.Random(1234)
    for _ in range(60):
        n = rng.randint(3, 60)
        px, py = _rand_points(rng, n, rng.choice([50, 4096, 10 ** 6]))
        tris, hull, skipped = triangulate_points(px, py)
        _check_laws(px, py, tris, hull, skipped)


def test_delaunay_euler_count_generic():
    """T = 2n - 2 - h on generic (large-range) sets, where no skips
    and no collinear hull runs occur at these seeds."""
    rng = random.Random(99)
    for _ in range(20):
        n = rng.randint(10, 80)
        px, py = _rand_points(rng, n, 10 ** 6)
        tris, hull, skipped = triangulate_points(px, py)
        assert not skipped
        assert len(tris) // 3 == 2 * n - 2 - len(hull)


def test_delaunay_permutation_invariance():
    """Canonical mesh is a pure function of the point set — including
    on a dense small grid where cocircular quadruples are everywhere
    (the case that breaks order-dependent tie-breaking)."""
    rng = random.Random(7)
    for _ in range(40):
        n = rng.randint(4, 50)
        px, py = _rand_points(rng, n, rng.choice([10, 40, 10 ** 5]))
        tris, hull, skipped = triangulate_points(px, py)
        perm = list(range(n))
        rng.shuffle(perm)
        t2, h2, s2 = triangulate_points([px[i] for i in perm],
                                        [py[i] for i in perm])
        assert canonical_triangles(list(tris)) == \
            canonical_triangles([perm[i] for i in t2])
        assert sorted(skipped) == sorted(perm[i] for i in s2)


def test_delaunay_big_coordinates_exact():
    """World-scale coordinates: the int predicates cannot overflow, so
    the laws hold verbatim at 2^40-scale coords (float predicates
    would misclassify these)."""
    rng = random.Random(5)
    base = 1 << 40
    px, py = [], []
    seen = set()
    while len(px) < 40:
        p = (base + rng.randint(0, 1000), base + rng.randint(0, 1000))
        if p not in seen:
            seen.add(p)
            px.append(p[0])
            py.append(p[1])
    tris, hull, skipped = triangulate_points(px, py)
    _check_laws(px, py, tris, hull, skipped)
    assert len(tris) >= 3


def test_delaunay_adversarial_degeneracy():
    """The classic killers, exact laws verbatim: a perfect integer
    grid (cocircular quadruples everywhere), a full circle (every
    quadruple cocircular), and a parabola (each insertion sees the
    whole hull). Euler counts are closed-form for all three."""
    import math

    # 16x16 grid
    px = [64 * (k % 16) for k in range(256)]
    py = [64 * (k // 16) for k in range(256)]
    tris, hull, sk = triangulate_points(px, py)
    assert not sk and len(hull) == 60
    assert len(tris) // 3 == 2 * 256 - 2 - 60
    _check_laws(px, py, tris, hull, sk)

    # circle
    pts = sorted({(round(10 ** 7 * (1 + math.cos(2 * math.pi * k / 200))),
                   round(10 ** 7 * (1 + math.sin(2 * math.pi * k / 200))))
                  for k in range(200)})
    px = [p[0] for p in pts]
    py = [p[1] for p in pts]
    tris, hull, sk = triangulate_points(px, py)
    assert not sk and len(hull) == len(px)
    assert len(tris) // 3 == 2 * len(px) - 2 - len(hull)
    _check_laws(px, py, tris, hull, sk)

    # parabola
    px = list(range(300))
    py = [k * k for k in range(300)]
    tris, hull, sk = triangulate_points(px, py)
    assert not sk and len(hull) == 300
    assert len(tris) // 3 == 298
    _check_laws(px, py, tris, hull, sk)


def test_delaunay_collinear_chain():
    tris, hull, skipped = triangulate_points(
        [0, 10, 20, 30, 40], [0, 5, 10, 15, 20])
    assert tris == [] and skipped == []
    assert hull == [0, 1, 2, 3, 4]  # sorted along the line


def test_delaunay_small_inputs():
    assert triangulate_points([], []) == ([], [], [])
    assert triangulate_points([7], [9]) == ([], [0], [])
    tris, hull, _ = triangulate_points([5, 1], [5, 1])
    assert tris == [] and hull == [1, 0]  # (1,1) before (5,5)


def test_delaunay_square_with_center():
    """Unit square + center: 4 triangles, all 4 corners on the hull,
    center interior — the textbook fan."""
    px = [0, 100, 100, 0, 50]
    py = [0, 0, 100, 100, 50]
    tris, hull, skipped = triangulate_points(px, py)
    assert len(tris) // 3 == 4
    assert sorted(hull) == [0, 1, 2, 3]
    assert not skipped
    _check_laws(px, py, tris, hull, skipped)


def test_delaunay_cocircular_square():
    """Exactly cocircular square: both diagonals are legal — the
    output must still satisfy the strict-Delaunay law and cover the
    square exactly."""
    px = [0, 100, 100, 0]
    py = [0, 0, 100, 100]
    tris, hull, skipped = triangulate_points(px, py)
    assert len(tris) // 3 == 2
    assert _check_laws(px, py, tris, hull, skipped) == 2


# ------------------------------------------------------------ Spark

def _spark_points(spark, n=900, tiles=(0, 1)):
    """Deterministic LCG point cloud across a couple of tiles."""
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("iid"),
        ((F.col("id") * 48271 + 11) % 8192).alias("wx"),
        ((F.col("id") * 69621 + 7) % 4096).alias("wy"),
    )


def test_tin_tiles_matches_serial(spark):
    pts = _spark_points(spark)
    rows = {(r["tx"], r["ty"]): r
            for r in tin_tiles(pts, extent=4096).collect()}
    pdf = pts.toPandas()
    assert rows, "no tiles out"
    for (tx, ty), r in rows.items():
        sub = pdf[(pdf.wx // 4096 == tx) & (pdf.wy // 4096 == ty)]
        sub = sub.sort_values(["wx", "wy", "iid"], kind="mergesort")
        dedup = sub.drop_duplicates(subset=["wx", "wy"], keep="first")
        px = [int(v) % 4096 for v in dedup.wx]
        py = [int(v) % 4096 for v in dedup.wy]
        tris, hull, skipped = triangulate_points(px, py)
        tris = canonical_triangles(tris)
        pid = dedup.iid.to_numpy()
        assert r["n_points"] == len(sub)
        assert r["n_sites"] == len(dedup)
        assert r["n_skipped"] == len(skipped)
        assert r["n_triangles"] == len(tris) // 3
        assert list(r["tri_ids"]) == [int(pid[i]) for i in tris]
        assert r["tri_area2"] == r["hull_area2"] > 0
        # hull ids match as a cycle
        hull_ids = [int(pid[i]) for i in hull]
        k = hull_ids.index(min(hull_ids))
        assert list(r["hull_ids"]) == hull_ids[k:] + hull_ids[:k]


def test_tin_tiles_duplicate_and_collinear(spark):
    import pandas as pd

    pdf = pd.DataFrame({
        # tile (0,0): collinear chain with one duplicated position
        # tile (1,0): three distinct points -> one triangle
        "iid": [1, 2, 3, 4, 10, 11, 12],
        "wx": [0, 10, 20, 10, 4096 + 0, 4096 + 50, 4096 + 0],
        "wy": [0, 10, 20, 10, 0, 0, 50],
    })
    out = {(r["tx"], r["ty"]): r
           for r in tin_tiles(spark.createDataFrame(pdf),
                              extent=4096).collect()}
    r0 = out[(0, 0)]
    assert r0["n_points"] == 4 and r0["n_sites"] == 3
    assert r0["n_triangles"] == 0 and list(r0["hull_ids"]) == [1, 2, 3]
    r1 = out[(1, 0)]
    assert r1["n_triangles"] == 1 and r1["tri_area2"] == r1["hull_area2"]
    assert r1["tri_area2"] == 50 * 50  # right triangle legs 50


def test_tin_tiles_single_exchange(spark):
    """Tile assignment is pure column math; the operator's only
    shuffle is the hash Exchange feeding applyInPandas."""
    plan = tin_tiles(_spark_points(spark),
                     extent=4096)._jdf.queryExecution().executedPlan() \
        .toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    # an explicit partition pin REPLACES the groupBy Exchange (the
    # repartition's hash partitioning satisfies the applyInPandas
    # distribution requirement) — still exactly one shuffle
    plan = tin_tiles(_spark_points(spark), extent=4096, partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "REPARTITION_BY_NUM" in plan
