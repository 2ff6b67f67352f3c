"""Dissolve-by-attribute (engine/dissolve.py): pixel-union laws —
conservation through re-rasterization, ring-exact idempotence, winding
validity / area accounting — plus the Spark surface and key scoping."""

from __future__ import annotations

import numpy as np

from vtzero_spark.engine import dissolve as D
from vtzero_spark.engine import raster as R
from vtzero_spark.mvt import geometry as G

SIZE, EXTENT = 32, 128  # scale 4


def _rect(x0, y0, x1, y1, cw=True):
    """Closed rectangle ring; CW in y-down screen space by default."""
    ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    if not cw:
        ring = ring[::-1]
    return np.array(ring, dtype=np.int64)


def _mask_of(parts_per_feature, size=SIZE, extent=EXTENT):
    rings = [r for parts in parts_per_feature for r in parts]
    roff = np.zeros(len(rings) + 1, np.int64)
    np.cumsum([len(r) for r in rings], out=roff[1:])
    px = np.concatenate([r[:, 0] for r in rings]).astype(np.float64)
    py = np.concatenate([r[:, 1] for r in rings]).astype(np.float64)
    gt = np.full(len(rings), G.GEOM_POLYGON, np.int64)
    return R.rasterize_tile(px, py, roff, gt, size, extent)


def _signed_area2(ring: np.ndarray) -> int:
    x, y = ring[:, 0], ring[:, 1]
    return int(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


FEATS = [
    [_rect(8, 8, 60, 60), _rect(20, 20, 44, 44, cw=False)],  # holed rect
    [_rect(40, 40, 100, 88)],                                # overlaps it
    [_rect(24, 24, 32, 32)],         # island INSIDE the first one's hole
]


def test_conservation_pixel_exact():
    merged = D.dissolve_group_parts(FEATS, SIZE, EXTENT)
    assert merged, "dissolve produced no rings"
    before = _mask_of(FEATS)
    after = _mask_of([merged])
    assert np.array_equal(before, after)


def test_idempotence_ring_exact():
    once = D.dissolve_group_parts(FEATS, SIZE, EXTENT)
    twice = D.dissolve_group_parts([once], SIZE, EXTENT)
    assert len(once) == len(twice)
    for a, b in zip(once, twice):
        assert np.array_equal(a, b)


def test_winding_validity_and_area_accounting():
    rings = D.dissolve_group_parts(FEATS, SIZE, EXTENT)
    mask = _mask_of(FEATS)
    cell = (EXTENT // SIZE) ** 2
    # y-down shoelace: CW outers positive, CCW holes negative;
    # their sum must equal the covered-pixel area exactly
    areas = [_signed_area2(r) for r in rings]
    assert sum(areas) == 2 * cell * int(mask.sum())
    assert any(a > 0 for a in areas)          # at least one outer
    assert any(a < 0 for a in areas)          # the hole survives
    # every ring is explicitly closed
    for r in rings:
        assert (r[0] == r[-1]).all()


def test_interior_boundary_erased():
    # two touching rectangles -> ONE outer ring, no seam
    feats = [[_rect(0, 0, 64, 64)], [_rect(64, 0, 128, 64)]]
    rings = D.dissolve_group_parts(feats, SIZE, EXTENT)
    assert len(rings) == 1
    assert _signed_area2(rings[0]) == 2 * 128 * 64


def test_empty_and_degenerate():
    assert D.dissolve_group_parts([], SIZE, EXTENT) == []
    # sub-pixel sliver: rasterizes to nothing -> no rings
    assert D.dissolve_group_parts(
        [[_rect(0, 0, 1, 1)]], SIZE, EXTENT) == []


def test_spark_surface_and_key_scoping(spark):
    rows = [
        (1, 0, 0, "admin", 0, 10, 3,
         [[{"x": int(x), "y": int(y)} for x, y in _rect(8, 8, 60, 60)]],
         "a"),
        (1, 0, 0, "admin", 1, 11, 3,
         [[{"x": int(x), "y": int(y)} for x, y in _rect(40, 40, 100, 88)]],
         "a"),
        (1, 0, 0, "admin", 2, 12, 3,
         [[{"x": int(x), "y": int(y)} for x, y in _rect(0, 96, 24, 120)]],
         "b"),                                   # different attribute
        (1, 0, 0, "admin", 3, 13, 2,
         [[{"x": 0, "y": 0}, {"x": 9, "y": 9}]], "a"),  # line passthrough
    ]
    schema = ("z long, x long, y long, layer_name string, "
              "feature_ordinal long, feature_id long, geom_type int, "
              "parts array<array<struct<x: long, y: long>>>, cls string")
    feats = spark.createDataFrame(rows, schema)
    out = D.dissolve_tiles(
        feats, size=SIZE, extent=EXTENT,
        keys=("z", "x", "y", "layer_name", "cls")).toPandas()

    polys = out[out.geom_type == 3].sort_values("cls")
    assert list(polys.cls) == ["a", "b"]
    a = polys.iloc[0]
    assert a.feature_id == 10 and a.feature_ordinal == 0
    # the two 'a' rectangles overlap -> single outer ring
    assert len(a.parts) == 1
    lines = out[out.geom_type == 2]
    assert len(lines) == 1 and lines.iloc[0].feature_id == 13

    # conservation through the Spark path for group 'a'
    merged = [np.array([[p["x"], p["y"]] for p in part], dtype=np.int64)
              for part in a.parts]
    orig = [[_rect(8, 8, 60, 60)], [_rect(40, 40, 100, 88)]]
    assert np.array_equal(_mask_of(orig), _mask_of([merged]))


def test_extent_grid_guard(spark):
    import pytest

    feats = spark.createDataFrame(
        [], "z long, x long, y long, layer_name string, "
            "feature_ordinal long, feature_id long, geom_type int, "
            "parts array<array<struct<x: long, y: long>>>")
    with pytest.raises(ValueError):
        D.dissolve_tiles(feats, size=48, extent=100)


def test_accumulate_attributes(spark):
    r1 = _rect(8, 8, 60, 60)
    r2 = _rect(40, 40, 100, 88)
    rows = [
        (1, 0, 0, "admin", 0, 1, 3,
         [[{"x": int(x), "y": int(y)} for x, y in r1]], 1000),
        (1, 0, 0, "admin", 1, 2, 3,
         [[{"x": int(x), "y": int(y)} for x, y in r2]], 250),
    ]
    schema = ("z long, x long, y long, layer_name string, "
              "feature_ordinal long, feature_id long, geom_type int, "
              "parts array<array<struct<x: long, y: long>>>, pop long")
    feats = spark.createDataFrame(rows, schema)
    out = D.dissolve_tiles(feats, size=SIZE, extent=EXTENT,
                           accumulate={"pop": "sum"}).toPandas()
    assert len(out) == 1 and out.iloc[0]["pop"] == 1250
