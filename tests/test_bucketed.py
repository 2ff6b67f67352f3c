"""Bucketed tile archives (engine/bucketed.py): two archives written
with the same tile-keyed bucket spec join with ZERO Exchange nodes —
the co-located-join pattern — and the join result matches the plain
shuffled join exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import bucketed, synth, tiling


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the plan shows (or omits) the exchange —
    a broadcast join would hide the bucketing effect entirely."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _tile_tables(spark, sf_dir, tmp_path):
    pts = tiling.assign_tiles(synth.images(spark, sf_dir))
    a = pts.groupBy("z", "x", "y").agg(
        F.count("*").alias("n"), F.sum("w").alias("wsum"))
    b = pts.groupBy("z", "x", "y").agg(
        F.max("w").alias("wmax"), F.min("iid").alias("first_iid"))
    bucketed.write_bucketed(a, "bk_a", str(tmp_path / "a"))
    bucketed.write_bucketed(b, "bk_b", str(tmp_path / "b"))
    return a, b


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path,
                                        no_broadcast):
    a, b = _tile_tables(spark, sf_dir, tmp_path)
    ra = bucketed.read_bucketed(spark, "bk_a")
    rb = bucketed.read_bucketed(spark, "bk_b")
    j = ra.join(rb, ["z", "x", "y"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the shuffled twin DOES exchange — the assert above is
    # meaningful, not vacuous
    j0 = a.join(b, ["z", "x", "y"])
    plan0 = j0._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan0

    # value identity vs the plain join
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(j.collect()) == key(j0.collect())
    assert j.count() > 0


def test_bucketed_groupby_reuses_layout(spark, sf_dir, tmp_path):
    """An aggregation on the bucket keys over a bucketed read also
    plans without an exchange: the layout pays for every downstream
    tile-keyed operator, not just joins."""
    a, _ = _tile_tables(spark, sf_dir, tmp_path)
    ra = bucketed.read_bucketed(spark, "bk_a")
    g = ra.groupBy("z", "x", "y").agg(F.sum("n").alias("t"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {(r["z"], r["x"], r["y"]): r["t"] for r in g.collect()}
    want = {(r["z"], r["x"], r["y"]): r["n"] for r in a.collect()}
    assert got == want


def test_path_read_loses_bucket_spec(spark, sf_dir, tmp_path,
                                     no_broadcast):
    """Reading the SAME files by path (not through the catalog) drops
    the bucket spec and the join shuffles again — pinned so nobody
    'simplifies' read_bucketed into spark.read.parquet."""
    _tile_tables(spark, sf_dir, tmp_path)
    pa = spark.read.parquet(str(tmp_path / "a"))
    pb = spark.read.parquet(str(tmp_path / "b"))
    plan = pa.join(pb, ["z", "x", "y"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
