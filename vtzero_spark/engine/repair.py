"""Polygon winding / ring-order repair — the fixer for what
``lint.py`` flags.

MVT spec 4.3.3.3 (mirrored by vtzero's decoder classification,
geometry.hpp ring winding): exterior rings are CW in screen space
(positive signed shoelace, y-down), interior rings CCW (negative),
and each exterior ring precedes its own interior rings. Tiles built
from GIS sources that follow OGC winding (CCW outers) — or that
simply lost ring order in a pipeline — decode as
``first_ring_not_outer`` / inverted-hole geometry. This module
repairs both properties at the parts level:

1. signed area per ring (int64-exact shoelace);
2. nesting depth per ring by point-in-ring winding count against
   every other ring (even depth = exterior, odd = hole — the
   standard even-odd nesting rule);
3. reorient: exterior -> CW (positive), hole -> CCW;
4. re-emit in DFS nesting order (outer, its holes, then any island
   inside a hole as a new outer, recursively; children in original
   ring order) — exactly the sequence the spec's decoder expects.

Honesty rule: a feature containing any ZERO-AREA ring passes through
UNCHANGED — orientation is undefined for a degenerate ring, and
guessing would mask the upstream bug lint exists to surface. The
repair is idempotent and a no-op on already-valid features (pinned
byte-exactly through the encoder in tests/test_repair.py).

Spark shape: pure per-row mapInPandas, ZERO shuffles; per-task cost
O(rings^2) point-in-ring tests per feature (rings per feature is
single digits in practice) + one vectorized shoelace per ring.
"""

from __future__ import annotations

import numpy as np


from pyspark.sql import DataFrame

from ..mvt.geometry import GEOM_POLYGON, ring_signed_area2

__all__ = ["repair_rings", "repair_features"]


def _contains(ring: np.ndarray, pt: np.ndarray) -> bool:
    """Nonzero-winding containment of ``pt`` in ``ring`` (closed or
    open representation; the wrap edge is included). Same crossing
    convention as the rasterizer: half-open in y, strict in x."""
    x, y = float(pt[0]), float(pt[1])
    x0 = ring[:, 0].astype(np.float64)
    y0 = ring[:, 1].astype(np.float64)
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    dy = y1 - y0
    crosses = ((y0 <= y) & (y < y1)) | ((y1 <= y) & (y < y0))
    with np.errstate(divide="ignore", invalid="ignore"):
        xc = x0 + (y - y0) * (x1 - x0) / dy
    hit = crosses & (x >= xc)
    return int(np.sum(np.where(hit, np.sign(dy), 0))) != 0


def repair_rings(rings: list[np.ndarray]) -> list[np.ndarray] | None:
    """One polygon feature's rings -> repaired ring list, or None when
    repair must refuse (a zero-area ring present). Rings are (n, 2)
    int arrays, closed (first == last) or open — emitted in the input
    representation."""
    n = len(rings)
    if n == 0:
        return []
    areas = []
    for r in rings:
        closed = len(r) >= 2 and (r[0] == r[-1]).all()
        rc = r if closed else np.vstack([r, r[:1]])
        areas.append(ring_signed_area2(np.asarray(rc, dtype=np.int64)))
    if any(a == 0 for a in areas):
        return None
    if n == 1:
        return [rings[0] if areas[0] > 0 else rings[0][::-1].copy()]

    # nesting depth: how many OTHER rings contain this ring's first
    # vertex (even = exterior, odd = hole)
    depth = np.zeros(n, np.int64)
    for i in range(n):
        pt = rings[i][0]
        for j in range(n):
            if j != i and _contains(rings[j], pt):
                depth[i] += 1

    # immediate parent: the containing ring one level up with the
    # smallest |area| (tightest enclosure); children keep input order
    children: list[list[int]] = [[] for _ in range(n)]
    roots: list[int] = []
    for i in range(n):
        if depth[i] == 0:
            roots.append(i)
            continue
        cands = [j for j in range(n)
                 if depth[j] == depth[i] - 1 and j != i
                 and _contains(rings[j], rings[i][0])]
        parent = min(cands, key=lambda j: abs(areas[j]))
        children[parent].append(i)

    out: list[np.ndarray] = []

    def emit(i: int) -> None:
        want_pos = depth[i] % 2 == 0
        r = rings[i]
        if (areas[i] > 0) != want_pos:
            r = r[::-1].copy()
        out.append(r)
        for c in children[i]:
            emit(c)

    for i in roots:
        emit(i)
    return out


def repair_features(features: DataFrame) -> DataFrame:
    """Repair winding + ring order of every polygon feature in the
    pre-encode features table (non-polygon rows and refused rows pass
    through untouched); adds ``repaired`` (bool: geometry was changed)
    and ``repair_refused`` (bool: zero-area ring present). Zero
    shuffles — one mapInArrow pass (the ragged nested parts column
    rides Arrow end to end, the clip-kernel pattern)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in features.schema.fields
    ) + ", repaired boolean, repair_refused boolean"

    def fn(batches):
        import pyarrow as pa

        from .clip import _flat_parts, _rebuild_parts

        for rb in batches:
            tbl = pa.Table.from_batches([rb]).combine_chunks()
            n = tbl.num_rows
            if n == 0:
                continue
            gts = tbl.column("geom_type").to_numpy(zero_copy_only=False)
            col = tbl.column("parts").combine_chunks()
            o1, o2, x, y = _flat_parts(col)

            repaired = np.zeros(n, bool)
            refused = np.zeros(n, bool)
            fx: list[np.ndarray] = []
            fy: list[np.ndarray] = []
            point_off = [0]
            ring_off = [0]
            tot_pts = 0
            for i in range(n):
                rings = [np.stack([x[o2[r]:o2[r + 1]],
                                   y[o2[r]:o2[r + 1]]], axis=1)
                         for r in range(o1[i], o1[i + 1])]
                if gts[i] == GEOM_POLYGON and rings:
                    fixed = repair_rings(rings)
                    if fixed is None:
                        refused[i] = True
                    else:
                        repaired[i] = len(fixed) != len(rings) or any(
                            a.shape != b.shape or not (a == b).all()
                            for a, b in zip(fixed, rings))
                        rings = fixed
                for r in rings:
                    fx.append(r[:, 0])
                    fy.append(r[:, 1])
                    tot_pts += len(r)
                    point_off.append(tot_pts)
                ring_off.append(len(point_off) - 1)

            parts = _rebuild_parts(
                np.concatenate(fx) if fx else np.zeros(0, np.int64),
                np.concatenate(fy) if fy else np.zeros(0, np.int64),
                point_off, ring_off, pa)
            arrays = []
            for name in tbl.column_names:
                arrays.append(parts if name == "parts"
                              else tbl.column(name).combine_chunks())
            arrays.append(pa.array(repaired))
            arrays.append(pa.array(refused))
            yield pa.RecordBatch.from_arrays(
                arrays, tbl.column_names + ["repaired", "repair_refused"])

    return features.mapInArrow(fn, schema=out_schema)
