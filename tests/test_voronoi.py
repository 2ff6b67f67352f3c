"""Voronoi tessellation (engine/voronoi.py) — exact-law and
Spark-parity coverage.

The kernel is exact (integer half-plane clipping in homogeneous
coordinates), so the tests pin LAWS:

- EXACT partition: rational cell areas sum to the clip rectangle's
  area identically — no tolerance
- nearest-site semantics: sampled points (with unique nearest site)
  land inside that site's cell; every site is inside its own cell
- duality: a site's cell-edge count relates to its Delaunay
  neighborhood (every clipped bisector belongs to a mesh neighbor)
- degenerate contract: collinear slabs, n in {0, 1, 2}, duplicates
- Spark: voronoi_tiles == serial kernel, law_ok rides the rows,
  ONE Exchange.
"""

import random
import re
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine.voronoi import voronoi_cells, voronoi_tiles


def _rand_sites(rng, n, r):
    pts = set()
    while len(pts) < n:
        pts.add((rng.randint(0, r - 1), rng.randint(0, r - 1)))
    pts = sorted(pts)
    return [p[0] for p in pts], [p[1] for p in pts]


def _in_cell(verts, qx, qy):
    m = len(verts)
    for i in range(m):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % m]
        if (x2 - x1) * (Fraction(qy) - y1) \
                - (y2 - y1) * (Fraction(qx) - x1) < 0:
            return False
    return True


def test_voronoi_exact_partition_law():
    rng = random.Random(21)
    for _ in range(25):
        n = rng.randint(1, 50)
        r = rng.choice([16, 256, 4096])
        px, py = _rand_sites(rng, n, r)
        cells, skipped = voronoi_cells(px, py, 0, 0, r, r)
        if skipped:
            continue  # cocircular frontier skip: law not claimed
        assert sum(c[1] for c in cells) == 2 * r * r
        for i, (verts, a2) in enumerate(cells):
            assert a2 > 0
            assert _in_cell(verts, px[i], py[i])


def test_voronoi_nearest_site_semantics():
    rng = random.Random(8)
    for _ in range(10):
        n = rng.randint(2, 40)
        r = 512
        px, py = _rand_sites(rng, n, r)
        cells, skipped = voronoi_cells(px, py, 0, 0, r, r)
        if skipped:
            continue
        for _ in range(40):
            qx, qy = rng.randint(0, r), rng.randint(0, r)
            d = [(px[i] - qx) ** 2 + (py[i] - qy) ** 2
                 for i in range(n)]
            best = min(range(n), key=lambda i: d[i])
            if sum(1 for v in d if v == d[best]) > 1:
                continue  # equidistant: boundary point, either owner
            assert _in_cell(cells[best][0], qx, qy)


def test_voronoi_collinear_slabs():
    cells, skipped = voronoi_cells([10, 20, 30], [0, 0, 0], 0, 0, 40, 40)
    assert not skipped
    assert [c[1] for c in cells] == [2 * 600, 2 * 400, 2 * 600]


def test_voronoi_tiny_inputs():
    assert voronoi_cells([], [], 0, 0, 10, 10) == ([], [])
    cells, _ = voronoi_cells([7], [9], 0, 0, 100, 100)
    assert cells[0][1] == 2 * 100 * 100  # whole rect
    cells, _ = voronoi_cells([0, 100], [0, 100], 0, 0, 100, 100)
    assert cells[0][1] == cells[1][1] == 100 * 100  # diagonal split


def test_voronoi_two_sites_bisector():
    """Vertical bisector at x = 30 for sites (10, y) and (50, y)."""
    cells, _ = voronoi_cells([10, 50], [32, 32], 0, 0, 64, 64)
    assert cells[0][1] == 2 * 30 * 64
    assert cells[1][1] == 2 * 34 * 64


def test_voronoi_cocircular_square_still_partitions():
    """Exactly cocircular sites: either Delaunay diagonal yields the
    same (unique) Voronoi diagram — the omitted diagonal's bisector
    is tangent at the shared vertex."""
    cells, skipped = voronoi_cells([0, 100, 100, 0], [0, 0, 100, 100],
                                   0, 0, 100, 100)
    assert not skipped
    areas = sorted(c[1] for c in cells)
    assert areas == [2 * 2500] * 4
    assert sum(areas) == 2 * 100 * 100


# ------------------------------------------------------------ Spark

def _spark_points(spark, n=700):
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("iid"),
        (F.abs(F.xxhash64("id")) % 8192).alias("wx"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 4096).alias("wy"),
    )


def test_voronoi_tiles_matches_serial(spark):
    pts = _spark_points(spark)
    out = voronoi_tiles(pts, extent=4096).collect()
    assert out
    pdf = pts.toPandas()
    by_tile = {}
    for r in out:
        by_tile.setdefault((r["tx"], r["ty"]), []).append(r)
    for (tx, ty), rows in by_tile.items():
        sub = pdf[(pdf.wx // 4096 == tx) & (pdf.wy // 4096 == ty)]
        sub = sub.sort_values(["wx", "wy", "iid"], kind="mergesort") \
            .drop_duplicates(subset=["wx", "wy"], keep="first")
        px = [int(v) % 4096 for v in sub.wx]
        py = [int(v) % 4096 for v in sub.wy]
        cells, skipped = voronoi_cells(px, py, 0, 0, 4096, 4096)
        pid = sub.iid.to_numpy()
        want = {int(pid[i]): c for i, c in enumerate(cells)
                if c is not None}
        assert {r["pid"] for r in rows} == set(want)
        law = (not skipped) and \
            sum(c[1] for c in cells if c) == 2 * 4096 * 4096
        for r in rows:
            verts, a2 = want[r["pid"]]
            assert r["n_verts"] == len(verts)
            assert r["area"] == pytest.approx(float(a2) / 2, rel=1e-12)
            assert r["law_ok"] == law
            flat = [float(v) for xy in verts for v in xy]
            assert list(r["cell"]) == pytest.approx(flat, rel=1e-12)


def test_voronoi_tiles_law_holds_everywhere(spark):
    rows = voronoi_tiles(_spark_points(spark, 900),
                         extent=4096).collect()
    assert rows and all(r["law_ok"] for r in rows)
    # per-tile area totals reassemble the tile exactly (floats of
    # exact rationals: sum is within float-summation noise only)
    tiles = {}
    for r in rows:
        tiles.setdefault((r["tx"], r["ty"]), 0.0)
        tiles[(r["tx"], r["ty"])] += r["area"]
    for v in tiles.values():
        assert v == pytest.approx(4096.0 * 4096.0, rel=1e-9)


def test_voronoi_tiles_single_exchange(spark):
    plan = voronoi_tiles(_spark_points(spark), extent=4096) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "CartesianProduct" not in plan
    plan = voronoi_tiles(_spark_points(spark), extent=4096,
                         partitions=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "REPARTITION_BY_NUM" in plan
