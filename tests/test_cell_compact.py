"""Quadkey cell compaction (cells.compact_cells — H3 compactCells
analog) and the polyfill+compact window query, plus the cross-path
layer-stats parity pin that covers layer_stats' retired window slot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

import __spark_entry__ as entry

from vtzero_spark.engine import cells, joins, synth
from vtzero_spark.engine.synth import WORLD


def _expand(cell: int, lvl: int, level: int) -> set:
    d = level - lvl
    base = cell << (2 * d)
    return {base + k for k in range(1 << (2 * d))}


def test_compact_complete_grid_collapses_to_root(spark):
    """A complete level-3 grid (64 cells) compacts to the single
    level-0 root cell (id 1)."""
    df = spark.range(64).select((F.lit(64) + F.col("id")).alias("cell"))
    got = cells.compact_cells(df, 3).collect()
    assert [r.cell for r in got] == [1]


def test_compact_partial_quartets_and_stragglers(spark):
    """One full quartet promotes (64..67 -> 16), stragglers stay; a
    second level of promotion needs all four level-2 siblings."""
    df = spark.createDataFrame(
        pd.DataFrame({"cell": [64, 65, 66, 67, 69, 80]}))
    got = sorted(r.cell for r in cells.compact_cells(df, 3).collect())
    assert got == [16, 69, 80]


def test_compact_expansion_is_exact_partition(spark, sf_dir):
    """Law: expanding every compacted cell back to leaves reproduces
    the input set EXACTLY (disjoint subtrees, nothing added/lost) —
    on the real polyfill of the diamond zones."""
    LEVEL = 8
    pix = synth.pixel_grid(spark, grid=256)
    hits = joins.pip_join(pix, synth.polygons(spark, sf_dir))
    c0 = hits.select(cells.cell_id(F.col("px"), F.col("py"), LEVEL).alias("cell"))
    inp = {r.cell for r in c0.distinct().collect()}
    comp = cells.compact_cells(c0, LEVEL).withColumn(
        "level", cells.cell_level(F.col("cell"))).collect()
    leaves: set = set()
    for r in comp:
        sub = _expand(r.cell, r.level, LEVEL)
        assert not (leaves & sub), "overlapping subtrees"
        leaves |= sub
    assert leaves == inp


def test_compact_is_minimal(spark, sf_dir):
    """No four siblings survive together in the output (otherwise the
    cover wouldn't be minimal)."""
    pix = synth.pixel_grid(spark, grid=128)
    hits = joins.pip_join(pix, synth.polygons(spark, sf_dir))
    c0 = hits.select(cells.cell_id(F.col("px"), F.col("py"), 7).alias("cell"))
    comp = cells.compact_cells(c0, 7)
    quads = (comp.groupBy(cells.parent_cell(F.col("cell")).alias("p"))
             .agg(F.count("*").alias("n")).where(F.col("n") >= 4))
    assert quads.count() == 0


def test_compact_idempotent_on_mixed_levels(spark, sf_dir):
    """compact(compact(x)) == compact(x) row-for-row (the output has
    no promotable quartet left, so a second pass is identity)."""
    pix = synth.pixel_grid(spark, grid=128)
    hits = joins.pip_join(pix, synth.polygons(spark, sf_dir))
    c0 = hits.select(cells.cell_id(F.col("px"), F.col("py"), 7).alias("cell"))
    once = cells.compact_cells(c0, 7)
    twice = cells.compact_cells(once, 7)
    a = sorted(r.cell for r in once.collect())
    b = sorted(r.cell for r in twice.collect())
    assert a == b


def test_layer_stats_paths_agree(spark, sf_dir):
    """The plan-side rollup (q_layer_stats, retired from the driver
    window in r5s4) and the encoded-bytes dictionary path
    (q_mvt_layer_stats, still window-checked) produce identical rows —
    the cross-path pin that replaces the redundant window slot."""
    a = entry.q_layer_stats(spark, sf_dir).toPandas()
    b = entry.q_mvt_layer_stats(spark, sf_dir).toPandas()
    key = ["z", "x", "y", "layer_name"]
    a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
