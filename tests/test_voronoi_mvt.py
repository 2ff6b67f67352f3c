"""voronoi_mvt_tiles — the composed servable form (Voronoi cells ->
shared world-features ingest tail -> MVT polygon tiles).

Laws pinned here:
- every emitted tile parses, lints clean, and carries exactly the
  cells that survived quantization for that tile address (fid == pid)
- decoded rings reproduce the ROUNDED cell polygons coordinate-for-
  coordinate (tile-local), outer winding, closed
- the decoded per-tile area total re-covers the tile within the
  quantization budget (each vertex moved <= 0.5 unit)
- determinism: two runs emit identical bytes.
"""

import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine.lint import lint_tile_bytes
from vtzero_spark.engine.voronoi import voronoi_mvt_tiles, voronoi_tiles
from vtzero_spark.mvt import geometry as G
from vtzero_spark.mvt import tile as T

EXT = 4096
ZOOM = 4


def _pts(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("iid"),
        (F.abs(F.xxhash64("id")) % (EXT * 16)).alias("wx"),
        (F.abs(F.xxhash64("id", F.lit(1))) % (EXT * 16)).alias("wy"))


@pytest.fixture(scope="module")
def voronoi_run(spark):
    pts = _pts(spark)
    tiles = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
             for r in voronoi_mvt_tiles(pts, zoom=ZOOM).collect()}
    cells = voronoi_tiles(pts).collect()
    return pts, tiles, cells


def test_voronoi_mvt_lints_clean_and_carries_every_cell(voronoi_run):
    pts, tiles, cells = voronoi_run
    assert tiles
    by_tile = {}
    for r in cells:
        by_tile.setdefault((ZOOM, r["tx"], r["ty"]), {})[r["pid"]] = r
    n_quant_dropped = 0
    for addr, buf in tiles.items():
        assert not lint_tile_bytes(buf), f"lint findings at {addr}"
        layers = T.parse_tile(buf)
        assert [l.name for l in layers] == ["voronoi"]
        feats = layers[0].features
        want = by_tile[addr]
        got_ids = {f.id for f in feats}
        assert got_ids <= set(want)
        n_quant_dropped += len(want) - len(got_ids)
        for f in feats:
            cell = want[f.id]
            parts, ring_types = G.decode_geometry(f.geom_type,
                                                  f.geometry,
                                                  f.geometry_nbytes)
            assert ring_types == [0]  # single outer ring
            ring = parts[0]
            # closed, and every vertex is the rounded rational vertex
            assert (ring[0] == ring[-1]).all()
            flat = list(cell["cell"])
            rounded = [(round(flat[i] + 0.0), round(flat[i + 1] + 0.0))
                       for i in range(0, len(flat), 2)]
            # consecutive-dup collapse + re-closure mirror the op
            dd = [rounded[0]]
            for v in rounded[1:]:
                if v != dd[-1]:
                    dd.append(v)
            if len(dd) > 1 and dd[-1] == dd[0]:
                dd.pop()
            got = [tuple(v) for v in ring[:-1].tolist()]
            assert got == dd, (addr, f.id)
    # quantization may drop sliver cells, but only ever a tiny tail
    assert n_quant_dropped <= max(2, len(cells) // 100)


def test_voronoi_mvt_recovers_tile_area(voronoi_run):
    """Σ decoded cell areas per tile == extent^2 within the
    quantization budget (each vertex moved <= 0.5 => each cell's area
    shifts by <= perimeter/2 + O(1))."""
    _, tiles, _ = voronoi_run
    for addr, buf in tiles.items():
        total, budget = 0, 0
        for f in T.parse_tile(buf)[0].features:
            parts, _ = G.decode_geometry(f.geom_type, f.geometry,
                                         f.geometry_nbytes)
            ring = parts[0]
            total += G.ring_signed_area2(ring)
            per = abs(ring[1:] - ring[:-1]).sum()
            budget += per + 8
        assert abs(total - 2 * EXT * EXT) <= budget, addr


def test_voronoi_mvt_deterministic(spark):
    pts = _pts(spark, 150)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in voronoi_mvt_tiles(pts, zoom=ZOOM).collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in voronoi_mvt_tiles(pts, zoom=ZOOM).collect()}
    assert a == b and a
