"""Physical-plan assertions: the properties that matter at 100 TB must
be visible in `explain` output — broadcast joins where the small side
is small, filter pushdown into the parquet scan, whole-stage codegen
on the column-math paths, and exactly ONE shuffle for the fused tile
encode."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

import __spark_entry__ as entry

from vtzero_spark.engine import assemble, cells, joins, synth, tiling
from vtzero_spark.engine.synth import EXTENT, WORLD, ZOOM


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pip_join_broadcasts_covering_index(spark, sf_dir):
    pts = synth.images(spark, sf_dir)
    polys = synth.polygons(spark, sf_dir)
    p = plan(joins.pip_join(pts, polys))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pip_cells_broadcasts(spark, sf_dir):
    pts = synth.images(spark, sf_dir)
    polys = synth.polygons(spark, sf_dir)
    p = plan(cells.pip_join_cells(pts, polys, 4, WORLD))
    assert "BroadcastHashJoin" in p


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = synth.load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") == 42)
    p = plan(li.select("l_orderkey", "l_linenumber"))
    assert "PushedFilters" in p and "l_orderkey" in p.split("PushedFilters", 1)[1][:200]
    # column pruning: ReadSchema must not include unused wide columns
    rs = p.split("ReadSchema", 1)[1][:300]
    assert "l_comment" not in rs


def test_tile_assign_adds_no_shuffle(spark, sf_dir):
    """Tile assignment is pure column math: the only Exchange in the
    plan is the narrow iid-dedup inside the images derivation (8-byte
    keys); assignment itself adds none."""
    img = synth.images(spark, sf_dir)
    base_exchanges = len(re.findall(r"\(\d+\) Exchange", plan(img)))
    assigned = tiling.assign_tiles(img, zoom=ZOOM, extent=EXTENT, buffer=0)
    p = plan(assigned)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == base_exchanges
    # the dedup shuffle moves only the 8-byte key
    assert re.search(r"hashpartitioning\(iid", p) is not None


def test_fused_tile_encode_has_single_encode_shuffle(spark, sf_dir):
    feats = entry._features(spark, sf_dir).select(*entry.POINT_COLS)
    base_exchanges = len(re.findall(r"hashpartitioning\(", plan(feats)))
    tiles = assemble.encode_point_tiles(feats, prop_spec=entry.PROP_SPEC)
    p = plan(tiles)
    # exactly ONE additional Exchange: the groupBy(z,x,y) feeding the
    # fused grouped-map encode (no second layer->tile shuffle)
    assert len(re.findall(r"hashpartitioning\(", p)) == base_exchanges + 1
    assert "FlatMapGroupsInPandas" in p or "FlatMapGroupsInArrow" in p
