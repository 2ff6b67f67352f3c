"""Line label placement (engine/linelabel.py): half-length midpoint of
the longest part, reading-orientation angle — numpy oracle + plan-side
invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest

from vtzero_spark.engine import linelabel as LL

SCHEMA = ("feature_id long, "
          "parts array<array<struct<x: long, y: long>>>")


def _pts(*coords):
    it = iter(coords)
    return [{"x": int(x), "y": int(y)} for x, y in zip(it, it)]


def _oracle(parts):
    """Midpoint + angle of the longest part, straight numpy."""
    best, best_len = None, -1.0
    for p in parts:
        arr = np.array([[q["x"], q["y"]] for q in p], dtype=float)
        seg = np.sqrt((np.diff(arr, axis=0) ** 2).sum(axis=1)) \
            if len(arr) > 1 else np.zeros(0)
        if seg.sum() > best_len:
            best, best_len = arr, float(seg.sum())
    if best_len <= 0:
        return float(best[0][0]), float(best[0][1]), 0.0
    seg = np.sqrt((np.diff(best, axis=0) ** 2).sum(axis=1))
    cum = np.cumsum(seg)
    half = best_len / 2
    i = int(np.searchsorted(cum, half))
    t = (half - (cum[i] - seg[i])) / seg[i]
    x = best[i][0] + t * (best[i + 1][0] - best[i][0])
    y = best[i][1] + t * (best[i + 1][1] - best[i][1])
    ang = math.degrees(math.atan2(best[i + 1][1] - best[i][1],
                                  best[i + 1][0] - best[i][0]))
    ang = (ang + 90.0) % 180.0 - 90.0
    return float(x), float(y), ang


CASES = [
    [_pts(0, 0, 10, 0)],                            # straight horizontal
    [_pts(0, 0, 10, 0, 10, 10)],                    # L: half falls on leg 1
    [_pts(0, 0, 0, 8)],                             # vertical -> -90
    [_pts(0, 0, 3, 4, 6, 0)],                       # tent
    [_pts(0, 0, 1, 0), _pts(0, 10, 40, 10, 80, 10)],  # longest part wins
    [_pts(5, 5)],                                   # single vertex
    [_pts(7, 7, 7, 7, 7, 7)],                       # zero-length part
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_matches_numpy_oracle(spark, i):
    parts = CASES[i]
    df = spark.createDataFrame([(1, parts)], SCHEMA)
    row = LL.label_lines(df).collect()
    assert len(row) == 1
    x, y, a = _oracle(parts)
    assert row[0].label_x == pytest.approx(x, abs=1e-9)
    assert row[0].label_y == pytest.approx(y, abs=1e-9)
    assert row[0].label_angle == pytest.approx(a, abs=1e-9)
    assert -90.0 <= row[0].label_angle < 90.0


def test_direction_invariant(spark):
    """Reversing the polyline moves nothing: same midpoint, same
    reading-orientation angle (mod-180 normalization)."""
    fwd = _pts(0, 0, 10, 2, 20, 8, 31, 9)
    rev = list(reversed(fwd))
    df = spark.createDataFrame([(1, [fwd]), (2, [rev])], SCHEMA)
    rows = {r.feature_id: r for r in LL.label_lines(df).collect()}
    assert rows[1].label_x == pytest.approx(rows[2].label_x, abs=1e-9)
    assert rows[1].label_y == pytest.approx(rows[2].label_y, abs=1e-9)
    assert rows[1].label_angle == pytest.approx(
        rows[2].label_angle, abs=1e-9)


def test_many_features_and_jvm_only_plan(spark):
    rows = [(i, [_pts(*(v for k in range(4)
                        for v in (10 * k + i, (i * k) % 7)))])
            for i in range(50)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = LL.label_lines(df)
    got = {r.feature_id: r for r in out.collect()}
    assert len(got) == 50
    for i, parts in rows:
        x, y, a = _oracle(parts)
        assert got[i].label_x == pytest.approx(x, abs=1e-9), i
        assert got[i].label_angle == pytest.approx(a, abs=1e-9), i
    # placement stays JVM-side: no Python eval nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
