"""Tileset version diffing: what changed between two corpus versions.

A production tile pipeline republishes continuously; the operator
every publisher runs between version A and version B is the SEMANTIC
DIFF — per (tile, feature): was the feature added, removed, moved
(geometry changed), or retagged (attributes changed)? The reference
codec has no analog (vtzero encodes one tile at a time); this is the
engine-side operator that decides WHICH tiles tools/incremental_job.py
must re-encode and what a per-tile patch contains.

Diff semantics are per-TILE, the publishing unit: a feature that
moves across a tile boundary is `removed` from its old tile and
`added` to its new one (both tiles need re-encoding); a within-tile
geometry change is `moved`; `moved` takes precedence over `retagged`
when both changed (one patch class per feature); unchanged features
are dropped (the output is sparse — the whole point of diffing).

Scale shape: one hash shuffle per side on (z, x, y, key) feeding a
full-outer sort-merge join — no broadcast (both sides are
corpus-sized), no skew amplification (the join key includes the
feature key, so a hot tile spreads over its features). On bucketed /
snapshot-table storage partitioned by tile the exchanges vanish
entirely. Comparison columns ride the shuffle once and are compared
in whole-stage codegen (null-safe <=>); nothing leaves the JVM.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tiling import EXTENT, ZOOM, assign_tiles


def tile_diff(old: DataFrame, new: DataFrame, zoom: int = ZOOM,
              extent: int = EXTENT, key: str = "iid",
              geom: tuple = ("loc_x", "loc_y"),
              tags: tuple = ("caption",), buffer: int = 0) -> DataFrame:
    """Per-(tile, ``key``) change classification between two corpus
    versions carrying (key, wx, wy, *tags). Returns sparse rows
    (z, x, y, key, status) with status in {'added', 'removed',
    'moved', 'retagged'}; unchanged features are omitted.

    ``geom`` names tile-local columns produced by assign_tiles to
    compare for 'moved' (default: the local coordinates); ``tags``
    names attribute columns to compare for 'retagged'. Pass the
    ENCODER'S ``buffer`` to diff buffered assignments: a change then
    flags every owning tile including buffered edge copies, which is
    exactly the re-encode work list (the patch law — v1 tiles patched
    on the diff's tile set == full v2 encode byte-for-byte — is pinned
    in tests/test_diff.py).
    """
    keycols = ["z", "x", "y", key]
    cmp_cols = [*geom, *tags]

    def side(df: DataFrame, pfx: str) -> DataFrame:
        a = assign_tiles(df.select(key, "wx", "wy", *tags),
                         zoom=zoom, extent=extent, buffer=buffer)
        return a.select(
            *keycols,
            *[F.col(c).alias(pfx + c) for c in cmp_cols],
            F.lit(True).alias(pfx + "present"),
        )

    j = side(old, "o_").join(side(new, "n_"), keycols, "full_outer")
    moved = reduce(or_, [~F.col("o_" + c).eqNullSafe(F.col("n_" + c))
                         for c in geom])
    retag = reduce(or_, [~F.col("o_" + c).eqNullSafe(F.col("n_" + c))
                         for c in tags])
    status = (
        F.when(F.col("o_present").isNull(), F.lit("added"))
        .when(F.col("n_present").isNull(), F.lit("removed"))
        .when(moved, F.lit("moved"))
        .when(retag, F.lit("retagged"))
        .otherwise(F.lit("unchanged"))
    )
    return (j.select(*keycols, status.alias("status"))
            .where(F.col("status") != "unchanged"))


def tile_diff_summary(diff: DataFrame) -> DataFrame:
    """Per-tile patch sizes from tile_diff output: the re-encode
    work list (one map-side-combined aggregation)."""
    return diff.groupBy("z", "x", "y").agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
        .alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
        .alias("n_removed"),
        F.sum(F.when(F.col("status") == "moved", 1).otherwise(0))
        .alias("n_moved"),
        F.sum(F.when(F.col("status") == "retagged", 1).otherwise(0))
        .alias("n_retagged"),
    )
