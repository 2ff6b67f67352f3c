"""Sibson natural-neighbor interpolation (engine/sibson.py).

Laws pinned (all EXACT, rational arithmetic end to end):

- stolen-area identity: sum of per-site stolen areas equals the
  inserted cell's independently-computed area, for every query
- LINEAR REPRODUCTION: at interior queries a linear field v = ax+by+c
  interpolates back bit-for-bit (Sibson 1981's defining property —
  only provable because the geometry is exact)
- locality: weights are positive and the set collapses to the site
  itself when the query coincides with it
- candidate-expansion safety: a deliberately starved 1-hop start
  still produces exact results (the law check drives the widening)
- Spark: sibson_tiles == serial kernel, law_ok everywhere, ONE
  Exchange, degenerate tiles behave.
"""

import random
import re
from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine.sibson import sibson_tiles, sibson_weights
from vtzero_spark.engine.voronoi import site_cells

R = 4096
RECT = [(0, 0, 1), (R, 0, 1), (R, R, 1), (0, R, 1)]


def _diagram(rng, n):
    pts = set()
    while len(pts) < n:
        pts.add((rng.randint(0, R - 1), rng.randint(0, R - 1)))
    pts = sorted(pts)
    px = [p[0] for p in pts]
    py = [p[1] for p in pts]
    return (px, py) + site_cells(px, py, 0, 0, R, R)


def _seed(px, py, qx, qy):
    return min(range(len(px)),
               key=lambda i: (px[i] - qx) ** 2 + (py[i] - qy) ** 2)


def test_sibson_partition_and_linear_reproduction():
    rng = random.Random(5)
    checked_interior = 0
    for _ in range(8):
        px, py, polys, nbrs, sk = _diagram(rng, rng.randint(8, 60))
        if sk:
            continue
        vals = [Fraction(3 * px[i] + 5 * py[i] + 7)
                for i in range(len(px))]
        for _ in range(25):
            qx, qy = rng.randint(0, R), rng.randint(0, R)
            w, target, interior = sibson_weights(
                px, py, polys, nbrs, qx, qy,
                _seed(px, py, qx, qy), RECT)
            tot = sum(w.values(), Fraction(0))
            assert tot == target and tot > 0
            assert all(ws > 0 for ws in w.values())
            if interior:
                est = sum((ws * vals[s] for s, ws in w.items()),
                          Fraction(0)) / tot
                assert est == Fraction(3 * qx + 5 * qy + 7)
                checked_interior += 1
    assert checked_interior > 20


def test_sibson_site_coincident_query():
    rng = random.Random(2)
    px, py, polys, nbrs, sk = _diagram(rng, 30)
    for s in (0, 7, 29):
        if polys[s] is None:
            continue
        w, target, _ = sibson_weights(px, py, polys, nbrs,
                                      px[s], py[s], s, RECT)
        assert set(w) == {s}
        assert w[s] == target


def test_sibson_collinear_sites_still_interpolate():
    """A collinear diagram (slab cells) interpolates exactly along
    the line: the 1-D natural-neighbor weights are the slab overlap
    fractions."""
    px = [0, 100, 200, 300]
    py = [50, 50, 50, 50]
    polys, nbrs, sk = site_cells(px, py, 0, 0, 400, 100)
    rect = [(0, 0, 1), (400, 0, 1), (400, 100, 1), (0, 100, 1)]
    assert not sk
    vals = [Fraction(v) for v in (10, 20, 30, 40)]
    w, target, _ = sibson_weights(px, py, polys, nbrs, 150, 50,
                                  1, rect)
    tot = sum(w.values(), Fraction(0))
    assert tot == target
    est = sum((ws * vals[s] for s, ws in w.items()), Fraction(0)) / tot
    assert est == Fraction(25)  # exact midpoint of the linear field


def test_sibson_candidate_expansion_triggers_and_repairs():
    """Force the widening path: seed from a FAR site so the 1-hop
    start cannot contain the true natural neighborhood; the law
    detects the shortfall and the result is still exact."""
    rng = random.Random(9)
    px, py, polys, nbrs, sk = _diagram(rng, 40)
    qx, qy = R // 2, R // 2
    near = _seed(px, py, qx, qy)
    far = max(range(len(px)),
              key=lambda i: (px[i] - qx) ** 2 + (py[i] - qy) ** 2)
    w1, t1, _ = sibson_weights(px, py, polys, nbrs, qx, qy, near, RECT)
    w2, t2, _ = sibson_weights(px, py, polys, nbrs, qx, qy, far, RECT)
    assert w1 == w2 and t1 == t2  # seed-independent, exact


# ------------------------------------------------------------ Spark

def _pts(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("iid"),
        (F.abs(F.xxhash64("id")) % 8192).alias("wx"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 4096).alias("wy"),
        (F.col("id") % 100).cast("double").alias("score"))


def test_sibson_tiles_matches_serial(spark):
    pts = _pts(spark)
    out = sibson_tiles(pts, "score", grid=8).collect()
    assert len(out) == 2 * 8 * 8  # two tiles
    assert all(r["law_ok"] for r in out)
    pdf = pts.toPandas()
    for r in out[:24] + out[-24:]:
        sub = pdf[(pdf.wx // 4096 == r["tx"]) &
                  (pdf.wy // 4096 == r["ty"])].copy()
        sub["lx"] = sub.wx % 4096
        sub["ly"] = sub.wy % 4096
        sub = sub.sort_values(["lx", "ly"], kind="mergesort") \
            .drop_duplicates(subset=["lx", "ly"], keep="first")
        px = [int(v) for v in sub.lx]
        py = [int(v) for v in sub.ly]
        vals = sub.score.to_numpy()
        polys, nbrs, sk = site_cells(px, py, 0, 0, 4096, 4096)
        qx = r["gx"] * 512 + 256
        qy = r["gy"] * 512 + 256
        live = [i for i in range(len(px)) if polys[i] is not None]
        s0 = min(live, key=lambda i: (px[i] - qx) ** 2
                 + (py[i] - qy) ** 2)
        w, target, interior = sibson_weights(px, py, polys, nbrs,
                                             qx, qy, s0, RECT)
        tot = sum(w.values(), Fraction(0))
        est = float(sum((ws * Fraction(float(vals[s]))
                         for s, ws in w.items()), Fraction(0)) / tot)
        assert r["value"] == pytest.approx(est, rel=1e-12)
        assert r["n_nbrs"] == len(w)
        assert r["interior"] == interior


def test_sibson_tiles_single_exchange(spark):
    plan = sibson_tiles(_pts(spark), "score", grid=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    plan = sibson_tiles(_pts(spark), "score", grid=8, partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "REPARTITION_BY_NUM" in plan


def test_sibson_tiles_rejects_bad_grid(spark):
    with pytest.raises(ValueError):
        sibson_tiles(_pts(spark), "score", grid=13)