"""Hexagonal cell index (engine/hexcells.py): integer-exact cube
rounding, cross-engine identity with DuckDB, k-ring combinatorics,
and hex-bucketed PIP join parity with the quadkey/broadcast joins."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import hexcells as H
from vtzero_spark.engine import joins, synth

W, HH = 4096, 3584  # w even; h/w = 7/8 (~1% off regular hexes)


def _with_ring(polys):
    """Closed CW diamond ring from (cx, cy, r) — the synth.polygons
    shape the exact PIP refine reads."""
    ring = F.array(
        F.struct(F.col("cx").alias("x"), (F.col("cy") - F.col("r")).alias("y")),
        F.struct((F.col("cx") + F.col("r")).alias("x"), F.col("cy").alias("y")),
        F.struct(F.col("cx").alias("x"), (F.col("cy") + F.col("r")).alias("y")),
        F.struct((F.col("cx") - F.col("r")).alias("x"), F.col("cy").alias("y")),
        F.struct(F.col("cx").alias("x"), (F.col("cy") - F.col("r")).alias("y")),
    )
    return polys.withColumn("ring", ring)


def test_hex_cell_cross_engine_identity(spark, sf_dir):
    """The oracle-grade check: Spark's column pipeline and DuckDB
    running hex_cell_sql assign the SAME cell to every image point —
    bit-identical integer cube rounding across engines."""
    img = synth.images(spark, sf_dir).select("iid", "wx", "wy")
    got = (H.point_hex_cells(img, W, HH).select("iid", "hex")
           .toPandas().sort_values("iid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pts", img.toPandas())
    sql = H.hex_cell_sql("wx", "wy", W, HH)
    want = con.execute(
        f"SELECT iid, {sql} AS hex FROM pts ORDER BY iid").df()
    assert len(got) == len(want) > 4000
    assert (got["hex"].to_numpy() == want["hex"].to_numpy()).all()


def test_hex_assignment_is_nearest_center(spark):
    """Each point's assigned cell minimizes the scaled cube-space L-inf
    distance over the 5x5 axial neighborhood (ties permitted — the
    deterministic fix order resolves them identically everywhere)."""
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 1 << 16, 500)
    ys = rng.integers(0, 1 << 16, 500)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "wx long, wy long")
    rows = H.point_hex_cells(df, W, HH).collect()
    d = 2 * W * HH

    def cube_dist(x, y, q, r):
        nq = 2 * HH * x - W * y
        nr = 2 * W * y
        ns = -nq - nr
        s = -q - r
        return max(abs(nq - q * d), abs(nr - r * d), abs(ns - s * d))

    for row in rows:
        cell = row["hex"]
        q = cell // H._SPAN - H._OFF
        r = cell % H._SPAN - H._OFF
        mine = cube_dist(row["wx"], row["wy"], q, r)
        for dq in range(-2, 3):
            for dr in range(-2, 3):
                assert mine <= cube_dist(row["wx"], row["wy"],
                                         q + dq, r + dr)


def test_hex_partition_is_total_and_stable(spark):
    """Every integer point gets exactly one cell (the op is a pure
    function), and jittering a point within a tiny radius around a
    cell center never changes the cell."""
    centers = [(q * W + r * (W // 2), r * HH)
               for q in range(2, 5) for r in range(2, 5)]
    jitter = [(-100, 0), (100, 0), (0, -100), (0, 100), (0, 0)]
    pts = [(cx + dx, cy + dy) for cx, cy in centers for dx, dy in jitter]
    df = spark.createDataFrame(pts, "wx long, wy long")
    out = H.point_hex_cells(df, W, HH).collect()
    by_center = {}
    for (cx, cy), chunk in zip(
            centers, [out[i:i + 5] for i in range(0, len(out), 5)]):
        cells = {r["hex"] for r in chunk}
        assert len(cells) == 1
        by_center[(cx, cy)] = cells.pop()
    # distinct centers -> distinct cells
    assert len(set(by_center.values())) == len(centers)


def test_hex_kring_sizes_and_distance(spark):
    df = spark.createDataFrame([(32768, 32768)], "wx long, wy long")
    base = H.point_hex_cells(df, W, HH)
    for k in (0, 1, 2, 3):
        n = H.hex_kring(base, k).count()
        assert n == 1 + 3 * k * (k + 1)
    # ring k cells sit at hex distance exactly <= k, and the disk
    # boundary at exactly k
    kr = H.hex_kring(base, 2, out="nbr")
    q0, r0 = H.hex_qr(F.col("hex"))
    q1, r1 = H.hex_qr(F.col("nbr"))
    dists = [r["d"] for r in
             kr.select(H.hex_distance(q0, r0, q1, r1).alias("d")).collect()]
    assert max(dists) == 2 and min(dists) == 0
    assert sorted(dists).count(2) == 12  # ring 2 has 6k = 12 cells


def test_pip_join_hex_matches_broadcast_join(spark, sf_dir):
    """Row parity: the hex-bucketed PIP join returns exactly the rows
    of the reference broadcast join (same bbox prefilter + exact
    integer refine, different bucketing)."""
    img = synth.images(spark, sf_dir)
    polys = synth.polygons(spark, sf_dir)
    want = {(r["iid"], r["pid"]) for r in
            joins.pip_join(img, polys).select("iid", "pid").collect()}
    got = {(r["iid"], r["pid"]) for r in
           H.pip_join_hex(img, polys, W, HH)
           .select("iid", "pid").collect()}
    assert got == want
    assert len(want) > 1000


def test_hex_covering_superset_of_member_cells(spark, sf_dir):
    """Every point-in-polygon pair's point cell appears in that
    polygon's covering — the covering is a true superset index."""
    img = synth.images(spark, sf_dir)
    polys = synth.polygons(spark, sf_dir)
    pairs = joins.pip_join(img, polys).select("iid", "pid", "wx", "wy")
    pts = H.point_hex_cells(pairs, W, HH).select("pid", "hex").distinct()
    cover = (H.hex_covering(polys, W, HH)
             .select("pid", "hex").distinct())
    missing = pts.join(cover, ["pid", "hex"], "left_anti").count()
    assert missing == 0


def test_hex_covering_row_fringe_regression(spark):
    """The h/2-strip trap: cube rounding's fix step can pull a point
    at dy = +0.61h DOWN a row, so cells reach 2h/3 past their center
    row. This exact constellation (from sf0.1) slipped through a
    covering that expanded rows by only h/2; it must be joined."""
    pts = spark.createDataFrame(
        [(1, 18471, 27275)], "iid long, wx long, wy long")
    polys = _with_ring(spark.createDataFrame(
        [(9, 18334, 40946, 14000)], "pid long, cx long, cy long, r long"))
    got = H.pip_join_hex(pts, polys, W, HH).select("iid", "pid").collect()
    assert [(r["iid"], r["pid"]) for r in got] == [(1, 9)]


def test_pip_join_hex_parity_dense(spark):
    """Broader parity sweep on a dense deterministic grid that sweeps
    points through every row-fringe band of several polygons."""
    import itertools
    pts = [(i, x, y) for i, (x, y) in enumerate(
        itertools.product(range(4000, 36000, 257),
                          range(4000, 36000, 509)))]
    ptdf = spark.createDataFrame(pts, "iid long, wx long, wy long")
    polys = [(0, 12000, 12000, 7000), (1, 20000, 26000, 9000),
             (2, 30000, 8000, 3500), (3, 18000, 18000, 14000)]
    podf = _with_ring(spark.createDataFrame(
        polys, "pid long, cx long, cy long, r long"))
    want = {(r["iid"], r["pid"]) for r in
            joins.pip_join(ptdf, podf).select("iid", "pid").collect()}
    got = {(r["iid"], r["pid"]) for r in
           H.pip_join_hex(ptdf, podf, W, HH).select("iid", "pid").collect()}
    assert got == want
    assert len(want) > 3000


def test_hex_cell_rejects_odd_w():
    with pytest.raises(ValueError, match="even"):
        H.hex_axial(F.lit(0), F.lit(0), 4095, 3584)
