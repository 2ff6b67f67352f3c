"""thin_accumulate: deterministic per-tile thinning + accumulation.

Laws pinned here:
- mass conservation: sum(weight_sum) == input weight total and
  sum(n_src) == input row count, per tile and overall;
- step=1 is the identity partition (every feature its own group,
  kept_iid == iid, centroid == own location);
- group size never exceeds step; only the LAST group of a tile may be
  smaller;
- the kept representative is the LCG-order minimum of its group
  (determinism — re-running yields the same representatives);
- plan audit: the operator contributes exactly ONE Exchange (the
  window's hash on the tile key), which the grouped aggregate reuses.
"""

import re

import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import synth, thin


def _pts(spark, sf_dir):
    return synth.images(spark, sf_dir).select(
        "iid", "wx", "wy", (F.col("iid") % 97 + 1).alias("weight"))


def test_thin_mass_conservation(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    out = thin.thin_accumulate(pts, step=4).toPandas()
    w_in = pts.agg(F.sum("weight")).collect()[0][0]
    assert int(out.weight_sum.sum()) == w_in
    assert int(out.n_src.sum()) == pts.count()
    # per-tile totals too: compare against a plain per-tile rollup
    per_tile = (thin.thin_accumulate(pts, step=4)
                .groupBy("x", "y").agg(F.sum("weight_sum").alias("w"))
                .toPandas().set_index(["x", "y"]).w.to_dict())
    from vtzero_spark.engine.tiling import assign_tiles
    truth = (assign_tiles(pts).groupBy("x", "y")
             .agg(F.sum("weight").alias("w"))
             .toPandas().set_index(["x", "y"]).w.to_dict())
    assert per_tile == truth


def test_thin_group_sizes_and_determinism(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    a = thin.thin_accumulate(pts, step=5).toPandas()
    assert a.n_src.max() <= 5
    # only the last group of each tile may be short
    short = a[a.n_src < 5].groupby(["x", "y"]).size()
    assert (short <= 1).all()
    last = a.groupby(["x", "y"]).grp.max()
    for (x, y), g in a[a.n_src < 5].set_index(["x", "y"]).grp.items():
        assert g == last[(x, y)]
    # deterministic: a second run is row-identical
    b = thin.thin_accumulate(pts, step=5).toPandas()
    key = ["x", "y", "grp"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_thin_step1_identity(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    out = thin.thin_accumulate(pts, step=1).toPandas()
    assert len(out) == pts.count()
    assert (out.n_src == 1).all()
    assert (out.cx == out.kept_loc_x).all()
    assert (out.cy == out.kept_loc_y).all()
    w = dict(zip(out.kept_iid, out.weight_sum))
    src = pts.toPandas()
    assert w == dict(zip(src.iid, src.weight))


def test_thin_representative_is_lcg_min(spark, sf_dir):
    """The kept feature is the first of its group in LCG order —
    recompute the order locally and check every representative."""
    pts = _pts(spark, sf_dir)
    from vtzero_spark.engine.tiling import assign_tiles
    t = assign_tiles(pts).toPandas()
    t["rk"] = (t.iid * thin._AT + thin._BT) % thin._MT
    t = t.sort_values(["x", "y", "rk", "iid"]).reset_index(drop=True)
    t["p"] = t.groupby(["x", "y"]).cumcount()
    t["grp"] = t.p // 3
    want = t[t.p % 3 == 0].set_index(["x", "y", "grp"]).iid.to_dict()
    got = (thin.thin_accumulate(pts, step=3).toPandas()
           .set_index(["x", "y", "grp"]).kept_iid.to_dict())
    assert got == want


def test_thin_plan_single_exchange(spark):
    """Over a shuffle-free source the whole operator is ONE Exchange:
    the window's hash on the tile key, reused by the aggregate."""
    pts = spark.range(10000).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 48271 + 11) % synth.WORLD).alias("wx"),
        ((F.col("id") * 69621 + 23) % synth.WORLD).alias("wy"),
        (F.col("id") % 97 + 1).alias("weight"))
    plan = thin.thin_accumulate(pts, step=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1


def test_thin_step_validation(spark, sf_dir):
    with pytest.raises(ValueError):
        thin.thin_accumulate(_pts(spark, sf_dir), step=0)


def _duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _parity(spark, sf_dir, name):
    import pandas as pd

    import __spark_entry__ as em

    sdf = em.queries()[name](spark, sf_dir).toPandas()
    odf = _duck(sf_dir).execute(em.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_thin_cluster_matches_duckdb_oracle(spark, sf_dir):
    _parity(spark, sf_dir, "thin_cluster")


def test_quality_oracle_pin(spark, sf_dir):
    """quality left the 50-entry window in round-5 session 8 (its
    scoring expressions stay under the driver gate inside curation's
    oracle); this pin keeps the standalone query DuckDB-parity-tested."""
    import pandas as pd

    import __spark_entry__ as em
    from vtzero_spark.engine import textops

    sdf = em.q_quality(spark, sf_dir).toPandas()
    odf = _duck(sf_dir).execute(textops.QUALITY_SCORE_SQL).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_thin_pyramid_laws(spark, sf_dir):
    """The multi-zoom cluster pyramid: EVERY level's weight total
    equals the corpus total (mass conservation through the ladder),
    representatives nest (level z-1's kept ids come from level z's),
    and level row counts shrink monotonically down to z=0 where the
    single world tile holds ceil(n_z1 / step)-ish clusters."""
    import pandas as pd

    pts = _pts(spark, sf_dir)
    total_w = pts.agg(F.sum("weight")).collect()[0][0]
    n = pts.count()
    pyr = thin.thin_pyramid(pts, step=4).toPandas()
    by_z = dict(tuple(pyr.groupby("z").__iter__()))
    zs = sorted(by_z, reverse=True)
    assert zs[0] == synth.ZOOM and zs[-1] == 0
    prev_count = None
    prev_kept = None
    for z in zs:
        lv = by_z[z]
        assert int(lv.weight_sum.sum()) == total_w, z
        if prev_count is not None:
            assert len(lv) <= prev_count
            assert set(lv.kept_iid) <= prev_kept, z
        prev_count, prev_kept = len(lv), set(lv.kept_iid)
    assert len(by_z[synth.ZOOM]) == n          # finest level: identity
    assert (by_z[synth.ZOOM].n_src == 1).all()
    # z=0: one tile, every cluster in it, bounded by step decay
    z0 = by_z[0]
    assert (z0.x == 0).all() and (z0.y == 0).all()
    assert len(z0) < len(by_z[1])
