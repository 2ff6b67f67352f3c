"""Polygon-overlay intersection join (engine/overlay.py): the
general-half-plane Sutherland–Hodgman kernel, its exactness against
the closed-form diamond oracle (45-degree rotation), and the Spark
operator's plan shape (broadcast covering-cell candidates, nothing
all-pairs)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from vtzero_spark.engine import overlay, synth


def _diamond(cx, cy, r):
    return [{"x": cx, "y": cy - r}, {"x": cx + r, "y": cy},
            {"x": cx, "y": cy + r}, {"x": cx - r, "y": cy},
            {"x": cx, "y": cy - r}]


def _closed_form(a, b):
    (cxa, cya, ra), (cxb, cyb, rb) = a, b
    ou = min(cxa + cya + ra, cxb + cyb + rb) - max(cxa + cya - ra, cxb + cyb - rb)
    ov = min(cxa - cya + ra, cxb - cyb + rb) - max(cxa - cya - ra, cxb - cyb - rb)
    return ou * ov if ou > 0 and ov > 0 else 0


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_kernel_exact_on_random_diamonds():
    """500 random diamond pairs: SH clip + shoelace == the rotated
    closed form EXACTLY (half-integer lattice intermediates are
    float64-exact at these magnitudes)."""
    rng = np.random.RandomState(42)
    pairs = []
    for _ in range(500):
        a = (int(rng.randint(0, 60000)), int(rng.randint(0, 60000)),
             int(rng.randint(500, 20000)))
        b = (a[0] + int(rng.randint(-25000, 25000)),
             a[1] + int(rng.randint(-25000, 25000)),
             int(rng.randint(500, 20000)))
        pairs.append((a, b))
    got = np.rint(overlay.convex_intersection_area2(
        pd.Series([_diamond(*a) for a, _ in pairs]),
        pd.Series([_diamond(*b) for _, b in pairs]))).astype(np.int64)
    want = np.array([_closed_form(a, b) for a, b in pairs])
    assert (want > 0).sum() > 100  # the corpus actually exercises overlap
    assert (got == want).all()


def test_kernel_containment_disjoint_touching_mixed():
    """Degenerate regimes: A inside B, B inside A, disjoint, touching
    at a vertex (area 0), and mixed vertex counts (box vs diamond)."""
    box = [{"x": 10, "y": 10}, {"x": 20, "y": 10}, {"x": 20, "y": 20},
           {"x": 10, "y": 20}, {"x": 10, "y": 10}]
    cases = [
        (box, _diamond(15, 15, 100), 200),            # A inside B -> 2*area(A)
        (_diamond(15, 15, 100), box, 200),            # B inside A
        (_diamond(0, 0, 5), _diamond(100, 100, 5), 0),  # disjoint
        (_diamond(0, 0, 5), _diamond(10, 0, 5), 0),   # touch at a vertex
        (_diamond(0, 0, 4), _diamond(4, 4, 4), 0),    # touch along edge pt
    ]
    got = np.rint(overlay.convex_intersection_area2(
        pd.Series([a for a, _, _ in cases]),
        pd.Series([b for _, b, _ in cases]))).astype(np.int64)
    assert got.tolist() == [w for _, _, w in cases]


def test_overlay_join_matches_brute_force(spark, sf_dir):
    """Spark operator == pandas brute force over ALL pairs at
    sf0.001: the covering-cell candidate step drops nothing."""
    a = synth.polygons(spark, sf_dir)
    b = synth.polygons_b(spark, sf_dir)
    got = overlay.overlay_join(a, b).toPandas() \
        .sort_values(["pid_a", "pid_b"]).reset_index(drop=True)

    pa = a.select("pid", "cx", "cy", "r").toPandas()
    pb = b.select("pid", "cx", "cy", "r").toPandas()
    rows = []
    for ra in pa.itertuples():
        for rb in pb.itertuples():
            a2 = _closed_form((ra.cx, ra.cy, ra.r), (rb.cx, rb.cy, rb.r))
            if a2 > 0:
                rows.append((ra.pid, rb.pid, a2))
    want = pd.DataFrame(rows, columns=["pid_a", "pid_b", "area2"]) \
        .sort_values(["pid_a", "pid_b"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_overlay_plan_broadcasts_b_index(spark, sf_dir):
    """The B covering index broadcasts; no SortMergeJoin, no
    CartesianProduct — candidates come from ONE cell-key hash join."""
    df = overlay.overlay_join(synth.polygons(spark, sf_dir),
                              synth.polygons_b(spark, sf_dir))
    p = _plan(df)
    assert "BroadcastHashJoin" in p and "BroadcastExchange" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "MapInPandas" in p or "mapInPandas" in p.lower()
