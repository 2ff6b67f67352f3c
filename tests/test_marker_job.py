"""marker_job — the composed marker-map capstone (points ->
supercluster pyramid -> priority placement per zoom -> PMTiles).

Laws pinned here:
- the archive round-trips: every (z, x, y) written reads back, tiles
  parse + lint clean, and the per-zoom feature sets are EXACTLY the
  pyramid's cluster sets (ids and point_count);
- the placed flag is a valid priority-greedy placement at every
  zoom: no two placed badges overlap, and every blocked badge
  overlaps a placed one of HIGHER priority (heavier, or equal-mass
  lower id) — recomputed from the job's own box law;
- engagement (the reduce accumulator) conserves through every zoom
  and equals the base weights' total;
- summary counts agree with the archive contents.
"""

import json
import os

from pyspark.sql import functions as F

from tools.marker_job import marker_boxes, run
from vtzero_spark.engine import pmtiles
from vtzero_spark.engine.lint import lint_tile_bytes
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V

WBITS = 16


def _boxes_overlap(a, b):
    return (abs(2 * a["px"] - 2 * b["px"]) <= a["w"] + b["w"]
            and abs(2 * a["py"] - 2 * b["py"]) <= a["h"] + b["h"])


def test_marker_job_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "marker_out")
    summary = run(spark, sf_dir, out, min_zoom=0, max_zoom=4, radius=128)
    assert summary["n_points"] > 0
    assert summary["n_tiles"] == summary["n_tiles_readback"] > 0
    pm = os.path.join(out, "markers.pmtiles")

    # re-derive the pyramid + boxes exactly as the job does
    from vtzero_spark.engine import supercluster as sc
    from vtzero_spark.engine import synth
    from vtzero_spark.engine.synth import WORLD

    img = synth.images(spark, sf_dir).select(
        F.col("iid").alias("pid"),
        (F.abs(F.xxhash64("iid")) % WORLD).alias("px"),
        (F.abs(F.xxhash64("iid", F.lit(1))) % WORLD).alias("py"),
        (1 + F.abs(F.xxhash64("iid", F.lit(2))) % 97).alias("weight"))
    total_weight = img.agg(F.sum("weight")).collect()[0][0]
    levels = sc.supercluster_levels(img, radius=128, min_zoom=0,
                                    max_zoom=4, value_col="weight")
    lvp = levels.toPandas()

    # walk the archive: parse, lint, collect per-zoom features
    hdr = pmtiles._read_header(pm)
    seen = {}  # zoom -> {cluster_id: props}
    for tid, *_ in pmtiles._all_entries(pm, hdr):
        z, x, y = pmtiles.tileid_to_zxy(tid)
        buf = pmtiles.get_tile(pm, z, x, y)
        assert buf is not None
        assert not lint_tile_bytes(buf), (z, x, y)
        layers = T.parse_tile(buf)
        assert [l.name for l in layers] == ["markers"]
        lyr = layers[0]
        for f in lyr.features:
            props = {k.decode(): V.decode_value(v)[1]
                     for k, v in lyr.properties(f)}
            assert f.id not in seen.setdefault(z, {})
            seen[z][f.id] = props

    eng_by_zoom = {}
    for z, g in lvp.groupby("zoom"):
        got = seen[int(z)]
        assert set(got) == set(g["cluster_id"])  # exactly the pyramid
        want_n = dict(zip(g["cluster_id"], g["n_points"]))
        want_v = dict(zip(g["cluster_id"], g["sum_v"]))
        for cid, props in got.items():
            assert props["point_count"] == want_n[cid]
            assert props["engagement"] == want_v[cid]
        eng_by_zoom[int(z)] = sum(p["engagement"] for p in got.values())
    assert all(v == total_weight for v in eng_by_zoom.values())

    # the placement law, from the job's own box formula
    for z in range(0, 5):
        boxes = {r.cluster_id:
                 {"px": r.px, "py": r.py, "w": r.w, "h": r.h, "pr": r.pr}
                 for r in marker_boxes(levels, z).collect()}
        placed = {c for c, p in seen[z].items() if p["placed"] == 1}
        blocked = set(seen[z]) - placed
        ps = sorted(placed)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                assert not _boxes_overlap(boxes[a], boxes[b]), (z, a, b)
        for c in blocked:
            assert any(_boxes_overlap(boxes[c], boxes[p])
                       and boxes[p]["pr"] < boxes[c]["pr"]
                       for p in placed), (z, c)
        stats = summary["zooms"][z]
        assert stats["clusters"] == len(seen[z])
        assert stats["placed"] == len(placed)
        assert stats["blocked"] == len(blocked)
    # at the coarsest zoom badges are huge relative to the world:
    # the collision pass must actually reject something
    assert summary["zooms"][0]["blocked"] > 0
    assert summary["zooms"][4]["placed"] > 0
    print(json.dumps(summary))
