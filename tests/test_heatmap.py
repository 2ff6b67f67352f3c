"""Heatmap density tiles (engine/heatmap.py): per-pixel numpy oracle,
cross-tile seamlessness, DuckDB twin parity, PNG render round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import heatmap, synth

RADIUS = 4
SIZE = 256
ZOOM = synth.ZOOM
PSHIFT = 16 - ZOOM - 8  # world 2^16, zoom 4, 256-px tiles -> 4


def _brute_grid(pts, radius, npx, weights=None):
    """Per-point per-offset reference accumulation."""
    grid = {}
    for i, (gx, gy) in enumerate(pts):
        w = 1 if weights is None else weights[i]
        for dr in range(-radius, radius + 1):
            for dc in range(-radius, radius + 1):
                k = radius * radius - dr * dr - dc * dc
                if k <= 0:
                    continue
                px, py = gx + dc, gy + dr
                if 0 <= px < npx and 0 <= py < npx:
                    grid[(px, py)] = grid.get((px, py), 0) + w * k
    return grid


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return synth.images(spark, sf_dir).orderBy("iid").limit(300) \
        .select("iid", "wx", "wy", "w").localCheckpoint(eager=True)


def test_pixels_match_brute_force(spark, points):
    pdf = points.toPandas()
    pts = list(zip(pdf["wx"].to_numpy() >> PSHIFT,
               pdf["wy"].to_numpy() >> PSHIFT))
    want = _brute_grid(pts, RADIUS, 4096)
    got = {(r["px"], r["py"]): r["density"]
           for r in heatmap.heatmap_pixels(
               points, radius=RADIUS).collect()}
    assert got == want


def test_weighted_pixels_match_brute_force(spark, points):
    pdf = points.toPandas()
    pts = list(zip(pdf["wx"].to_numpy() >> PSHIFT,
               pdf["wy"].to_numpy() >> PSHIFT))
    want = _brute_grid(pts, RADIUS, 4096, weights=list(pdf["w"]))
    got = {(r["px"], r["py"]): r["density"]
           for r in heatmap.heatmap_pixels(
               points, radius=RADIUS, weight_col="w").collect()}
    assert got == want


def test_seamless_across_tile_edge(spark):
    """A point 1 px left of a tile boundary splats into BOTH tiles:
    ownership derives from the scattered pixel, not the point."""
    wx = (SIZE - 1) << PSHIFT  # gx = 255, last pixel column of tile 0
    df = spark.createDataFrame([(wx, 8 << PSHIFT)], "wx long, wy long")
    tiles = {(r["x"], r["y"]): r for r in
             heatmap.heatmap_tiles(df, radius=RADIUS).collect()}
    assert set(tiles) == {(0, 0), (1, 0)}
    # peak (the point's own pixel, k = R^2) lives in tile 0
    assert tiles[(0, 0)]["peak_density"] == RADIUS * RADIUS
    assert tiles[(0, 0)]["peak_px"] == SIZE - 1
    # mass splits exactly: total over both tiles == full kernel sum
    ksum = sum(max(0, RADIUS * RADIUS - dr * dr - dc * dc)
               for dr in range(-RADIUS, RADIUS + 1)
               for dc in range(-RADIUS, RADIUS + 1))
    assert (tiles[(0, 0)]["total_mass"]
            + tiles[(1, 0)]["total_mass"]) == ksum


def test_world_edge_clipped_not_wrapped(spark):
    df = spark.createDataFrame([(0, 0)], "wx long, wy long")
    pix = heatmap.heatmap_pixels(df, radius=RADIUS).collect()
    assert all(r["px"] >= 0 and r["py"] >= 0 for r in pix)
    full = sum(1 for dr in range(-RADIUS, RADIUS + 1)
               for dc in range(-RADIUS, RADIUS + 1)
               if dr * dr + dc * dc < RADIUS * RADIUS)
    assert len(pix) < full  # the off-world quadrants are gone


def test_duckdb_twin_matches(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem",):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    sql = (f"WITH {synth.images_sql()}, "
           + heatmap.heatmap_tiles_sql("images", radius=RADIUS,
                                       weight_col="w")
           + "SELECT * FROM hm_tiles ORDER BY x, y")
    want = con.sql(sql).fetchall()
    got = [tuple(r) for r in
           heatmap.heatmap_tiles(synth.images(spark, sf_dir),
                                 radius=RADIUS, weight_col="w")
           .orderBy("x", "y").collect()]
    assert got == [tuple(r) for r in want]


def test_png_render_round_trip(spark, points):
    from vtzero_spark.engine import png

    tiles = heatmap.heatmap_png_tiles(points, radius=RADIUS).collect()
    assert tiles
    pix = heatmap.heatmap_pixels(points, radius=RADIUS).toPandas()
    t = tiles[0]
    sub = pix[(pix["px"] // SIZE == t["x"]) & (pix["py"] // SIZE == t["y"])]
    img = np.zeros((SIZE, SIZE), np.int64)
    img[sub["py"].to_numpy() % SIZE, sub["px"].to_numpy() % SIZE] = \
        sub["density"].to_numpy()
    want = (img * 255 // img.max()).astype(np.uint8)
    got, _ctype = png.decode(bytes(t["png"]))
    got = np.asarray(got)
    if got.ndim == 3:
        got = got[:, :, 0]
    np.testing.assert_array_equal(got, want)


def test_plan_is_jvm_only_and_join_free(spark, points):
    """The kernel scatter is a Generate over a literal array — no join
    node of any kind (the earlier broadcast-crossJoin form planned as
    BroadcastNestedLoopJoin and tripped the headline no-cartesian
    gate) and no Python in the plan."""
    plan = heatmap.heatmap_tiles(points, radius=RADIUS) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "Join",
                "ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas",
                "MapInPandas"):
        assert bad not in plan
