"""Winding / ring-order repair (engine/repair.py): spec 4.3.3.3
properties restored, identity on valid input, idempotence, refusal on
degenerate rings, and lint-clean composition through the encoder."""

from __future__ import annotations

import numpy as np

from vtzero_spark.engine import repair as REP
from vtzero_spark.mvt.geometry import ring_signed_area2


def _ring(*coords, close=True):
    r = np.array(coords, dtype=np.int64).reshape(-1, 2)
    return np.vstack([r, r[:1]]) if close else r


# CW (positive, y-down) square and CCW hole inside it
OUTER = _ring(0, 0, 100, 0, 100, 100, 0, 100)            # CW
HOLE = _ring(20, 20, 20, 80, 80, 80, 80, 20)             # CCW
ISLAND = _ring(40, 40, 60, 40, 60, 60, 40, 60)           # CW, inside HOLE
ISLAND_HOLE = _ring(45, 45, 45, 55, 55, 55, 55, 45)      # CCW, in ISLAND


def _areas(rings):
    return [ring_signed_area2(r) for r in rings]


def test_valid_feature_is_unchanged():
    rings = [OUTER, HOLE, ISLAND, ISLAND_HOLE]
    out = REP.repair_rings(rings)
    assert len(out) == 4
    for a, b in zip(out, rings):
        assert (a == b).all()


def test_flipped_windings_fixed():
    rings = [OUTER[::-1].copy(), HOLE[::-1].copy()]
    out = REP.repair_rings(rings)
    assert _areas(out) == _areas([OUTER, HOLE])
    assert (out[0] == OUTER[::-1][::-1]).all()  # pure reversal


def test_ring_order_restored():
    # hole first, island-hole before island, outer last
    rings = [ISLAND_HOLE, HOLE, ISLAND, OUTER]
    out = REP.repair_rings(rings)
    # DFS nesting order: outer, hole, island, island-hole
    expect = [OUTER, HOLE, ISLAND, ISLAND_HOLE]
    assert [r.tolist() for r in out] == [r.tolist() for r in expect]


def test_order_and_winding_both_broken():
    rings = [HOLE[::-1].copy(), ISLAND[::-1].copy(), OUTER[::-1].copy()]
    out = REP.repair_rings(rings)
    expect = [OUTER, HOLE, ISLAND]
    assert [r.tolist() for r in out] == [r.tolist() for r in expect]


def test_idempotent():
    rings = [ISLAND_HOLE[::-1].copy(), HOLE, OUTER[::-1].copy(), ISLAND]
    once = REP.repair_rings(rings)
    twice = REP.repair_rings(once)
    assert [r.tolist() for r in twice] == [r.tolist() for r in once]


def test_two_disjoint_outers_with_holes():
    o2 = _ring(200, 0, 300, 0, 300, 100, 200, 100)
    h2 = _ring(220, 20, 220, 80, 280, 80, 280, 20)
    rings = [HOLE, h2, OUTER, o2]
    out = REP.repair_rings(rings)
    # roots keep input ring order: OUTER before o2, each hole follows
    expect = [OUTER, HOLE, o2, h2]
    assert [r.tolist() for r in out] == [r.tolist() for r in expect]


def test_zero_area_ring_refuses():
    sliver = _ring(0, 0, 10, 0, 0, 0)
    assert REP.repair_rings([OUTER, sliver]) is None
    assert REP.repair_rings([]) == []


def test_single_ring_fast_path():
    out = REP.repair_rings([OUTER[::-1].copy()])
    assert (out[0] == OUTER[::-1][::-1]).all()


def test_spark_surface_and_lint_composition(spark):
    from vtzero_spark.engine import assemble, geomops, lint

    def pts(r):
        return [{"x": int(x), "y": int(y)} for x, y in r]

    rows = [
        # broken: OGC winding + hole-first order
        (1, 0, 0, "admin", 0, 1, 3,
         [pts(HOLE[::-1]), pts(OUTER[::-1])]),
        # already valid
        (1, 0, 0, "admin", 1, 2, 3, [pts(OUTER), pts(HOLE)]),
        # refused: zero-area ring rides along unchanged
        (1, 0, 0, "admin", 2, 3, 3,
         [pts(OUTER), pts(_ring(0, 0, 10, 0, 0, 0))]),
        # line passthrough
        (1, 0, 0, "admin", 3, 4, 2, [pts(_ring(0, 0, 9, 9, close=False))]),
    ]
    schema = ("z long, x long, y long, layer_name string, "
              "feature_ordinal long, feature_id long, geom_type int, "
              "parts array<array<struct<x: long, y: long>>>")
    feats = spark.createDataFrame(rows, schema)
    # collect(), not toPandas(): ragged nested arrays trip Spark's
    # pandas conversion (see memory note / test_engine_spark pattern)
    out = sorted(REP.repair_features(feats).collect(),
                 key=lambda r: r.feature_ordinal)
    assert [r.repaired for r in out] == [True, False, False, False]
    assert [r.repair_refused for r in out] == [False, False, True, False]
    fixed = out[0].parts
    assert [[(p["x"], p["y"]) for p in part] for part in fixed] == \
        [[tuple(q) for q in OUTER], [tuple(q) for q in HOLE]]

    # composition law: encode the repaired (non-refused) polygons and
    # lint them — no first_ring_not_outer complaints survive repair
    good = REP.repair_features(feats) \
        .where("geom_type = 3 AND NOT repair_refused") \
        .drop("repaired", "repair_refused")
    tiles = assemble.encode_geom_tiles(geomops.cmds_from_parts(good))
    lint_rows = lint.tile_lint(tiles).toPandas()
    bad = lint_rows[lint_rows.check == lint.FIRST_RING_NOT_OUTER]
    assert bad.empty, lint_rows
