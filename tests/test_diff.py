"""Tileset version diff (engine/diff.py) + the images_v2 corpus.

Correctness contract:
- images_v2 equals its DuckDB twin row-for-row (every mutation class);
- tile_diff equals a brute-force pandas full-outer classification at
  sf0.001 over the real corpus pair;
- status taxonomy pinned on hand-built rows: added / removed /
  within-tile move / retag / moved-takes-precedence / cross-boundary
  move becomes removed+added / unchanged dropped;
- plan: full-outer SortMergeJoin, no broadcast, no cartesian;
- the summary rollup equals a pandas pivot.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from vtzero_spark.engine import synth
from vtzero_spark.engine.diff import tile_diff, tile_diff_summary

ZOOM, EXTENT = synth.ZOOM, synth.EXTENT


def test_images_v2_matches_duckdb_twin(spark, sf_dir):
    got = synth.images_v2(spark, sf_dir).toPandas() \
        .sort_values("iid").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
    want = con.execute(
        f"WITH {synth.images_sql('images')}, "
        f"{synth.images_v2_sql('v2')} SELECT * FROM v2 ORDER BY iid"
    ).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert (a == b).all(), c
    # every mutation class is present in the corpus
    iid = got["iid"].to_numpy()
    assert (iid % 8 == 0).any()                        # additions
    # no surviving ORIGINAL id is %23 (those were dropped); only
    # added ids (which are == 0 mod 8) may be
    assert ((iid % 8 != 0) & (iid % synth._V2_DROP == 0)).sum() == 0
    assert (iid % synth._V2_MOVE == 0).any()
    assert got["caption"].str.endswith(" v2").any()


def _brute(old: pd.DataFrame, new: pd.DataFrame) -> set:
    def keyed(pdf):
        pdf = pdf.copy()
        pdf["x"] = pdf["wx"] // EXTENT
        pdf["y"] = pdf["wy"] // EXTENT
        pdf["loc_x"] = pdf["wx"] % EXTENT
        pdf["loc_y"] = pdf["wy"] % EXTENT
        return {(ZOOM, r.x, r.y, r.iid): (r.loc_x, r.loc_y, r.caption)
                for r in pdf.itertuples()}

    o, n = keyed(old), keyed(new)
    out = set()
    for k in o.keys() | n.keys():
        if k not in o:
            out.add((*k, "added"))
        elif k not in n:
            out.add((*k, "removed"))
        elif o[k][:2] != n[k][:2]:
            out.add((*k, "moved"))
        elif o[k][2] != n[k][2]:
            out.add((*k, "retagged"))
    return out


def test_matches_brute_force(spark, sf_dir):
    old = synth.images(spark, sf_dir)
    new = synth.images_v2(spark, sf_dir)
    got = {(r["z"], r["x"], r["y"], r["iid"], r["status"])
           for r in tile_diff(old, new, ZOOM, EXTENT).collect()}
    want = _brute(old.toPandas(), new.toPandas())
    assert got == want
    # sparse and non-trivial: every class occurs, most rows unchanged
    statuses = {s for *_, s in got}
    assert statuses == {"added", "removed", "moved", "retagged"}
    assert 0 < len(got) < old.count() // 2


def test_status_taxonomy_pinned(spark):
    cols = ["iid", "wx", "wy", "caption"]
    old = pd.DataFrame([
        (1, 100, 100, "a"),        # unchanged -> dropped
        (2, 200, 200, "b"),        # removed
        (3, 300, 300, "c"),        # within-tile move
        (4, 400, 400, "d"),        # retag
        (5, 500, 500, "e"),        # move AND retag -> moved
        (6, 4095, 600, "f"),       # cross-boundary move
    ], columns=cols)
    new = pd.DataFrame([
        (1, 100, 100, "a"),
        (3, 301, 300, "c"),
        (4, 400, 400, "D"),
        (5, 501, 500, "E"),
        (6, 4096, 600, "f"),       # now in tile x=1
        (7, 700, 700, "g"),        # added
    ], columns=cols)
    got = {(r["x"], r["iid"], r["status"])
           for r in tile_diff(spark.createDataFrame(old),
                              spark.createDataFrame(new),
                              zoom=4, extent=4096).collect()}
    assert got == {
        (0, 2, "removed"),
        (0, 3, "moved"),
        (0, 4, "retagged"),
        (0, 5, "moved"),
        (0, 6, "removed"),
        (1, 6, "added"),
        (0, 7, "added"),
    }


def test_summary_matches_pandas(spark, sf_dir):
    d = tile_diff(synth.images(spark, sf_dir),
                  synth.images_v2(spark, sf_dir), ZOOM, EXTENT)
    pdf = d.toPandas()
    got = {(r["x"], r["y"]): (r["n_added"], r["n_removed"],
                              r["n_moved"], r["n_retagged"])
           for r in tile_diff_summary(d).collect()}
    for (x, y), grp in pdf.groupby(["x", "y"]):
        vc = grp["status"].value_counts()
        assert got[(x, y)] == tuple(
            int(vc.get(s, 0))
            for s in ("added", "removed", "moved", "retagged"))


def test_plan_full_outer_smj_no_broadcast(spark, sf_dir):
    d = tile_diff(synth.images(spark, sf_dir),
                  synth.images_v2(spark, sf_dir), ZOOM, EXTENT)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "FullOuter" in plan, plan[:2000]


def test_patch_law_v1_plus_diff_equals_v2(spark, sf_dir):
    """The diff is a SUFFICIENT re-encode work list: patching v1's
    tile set on exactly the diff's (z,x,y) tiles reproduces the full
    v2 encode byte-for-byte — every tile OUTSIDE the diff is already
    byte-identical between versions (completeness: no byte-affecting
    change escapes the classifier), and every tile INSIDE it differs
    (tile-granularity soundness). Uses the production buffered
    assignment, so edge-copy ownership is part of the law."""
    import __spark_entry__ as em

    old = synth.images(spark, sf_dir)
    new = synth.images_v2(spark, sf_dir)

    def tiles(img):
        enc = em._encode_image_tiles(em._features(spark, sf_dir, img=img))
        return {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
                for r in enc.collect()}

    t1, t2 = tiles(old), tiles(new)
    changed = {(r["z"], r["x"], r["y"])
               for r in tile_diff(old, new, ZOOM, EXTENT,
                                  buffer=em.BUFFER)
               .select("z", "x", "y").distinct().collect()}
    unchanged = (t1.keys() | t2.keys()) - changed
    assert unchanged, "corpus mutation touched every tile; law vacuous"
    for k in t1.keys() | t2.keys():
        if k in changed:
            assert t1.get(k) != t2.get(k), (k, "flagged but identical")
        else:
            assert t1[k] == t2[k], (k, "changed but not flagged")
