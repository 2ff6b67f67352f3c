"""Hilbert curve ordering (engine/hilbert.py).

Laws pinned here:
- bijection: over the full 2^L x 2^L grid the d values are exactly a
  permutation of [0, 4^L);
- THE Hilbert property: consecutive d values are 4-adjacent cells
  (unit Manhattan step) — Z-order provably fails this, measured here;
- subtree contiguity: every quadrant at every ancestor level maps to
  one contiguous d interval (the file-skipping property, shared with
  Z-order);
- Spark column walk == scalar d2xy inverse == DuckDB CTE twin;
- locality: mean |Δd| over 4-neighbors is strictly better than
  Z-order's on the same grid.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import cells, hilbert

L = 5  # 32x32 = 1024 cells — full-grid laws stay fast
N = 1 << L


@pytest.fixture(scope="module")
def grid_hd(spark):
    g = spark.range(N * N).select(
        (F.col("id") % N).alias("cx"),
        (F.col("id") / N).cast("long").alias("cy"))
    pdf = hilbert.with_hilbert(g, "cx", "cy", L).toPandas()
    return pdf.sort_values("hd").reset_index(drop=True)


def test_hilbert_bijection_and_inverse(grid_hd):
    assert (grid_hd.hd.to_numpy() == np.arange(N * N)).all()
    # forward == scalar inverse at every cell
    for d in range(0, N * N, 7):
        row = grid_hd.iloc[d]
        assert hilbert.hilbert_xy(d, L) == (row.cx, row.cy)


def test_hilbert_unit_steps_zorder_does_not(grid_hd, spark):
    dx = grid_hd.cx.diff().abs().to_numpy()[1:]
    dy = grid_hd.cy.diff().abs().to_numpy()[1:]
    assert ((dx + dy) == 1).all()  # every consecutive pair adjacent
    # Z-order on the same grid: sort by morton, measure steps
    g = spark.range(N * N).select(
        (F.col("id") % N).alias("cx"),
        (F.col("id") / N).cast("long").alias("cy"))
    mz = g.select("cx", "cy", cells.morton(
        F.col("cx"), F.col("cy"), L).alias("m")).toPandas() \
        .sort_values("m").reset_index(drop=True)
    zsteps = (mz.cx.diff().abs() + mz.cy.diff().abs()).to_numpy()[1:]
    assert (zsteps > 1).any()  # Z-order tears at seams
    assert zsteps.max() >= N  # ... by a whole stripe


def test_hilbert_subtree_contiguity(grid_hd):
    """Every level-k quadrant holds one contiguous d interval of
    length 4^(L-k) — range-serving carries over from Z-order."""
    for k in (1, 2, 3):
        span = 1 << (L - k)  # cells per quadrant side
        g = grid_hd.copy()
        g["qx"], g["qy"] = g.cx // span, g.cy // span
        sizes = g.groupby(["qx", "qy"]).hd.agg(["min", "max", "count"])
        assert (sizes["count"] == span * span).all()
        assert ((sizes["max"] - sizes["min"] + 1) == span * span).all()


def test_hilbert_bbox_run_count_beats_zorder(grid_hd, spark):
    """The metric that pays at scale (Moon et al., clustering
    properties of the Hilbert curve): a bbox range query over
    Hilbert-ordered ids decomposes into FEWER contiguous runs than
    over Z-order — fewer runs = fewer file-range seeks per viewport.
    (Mean neighbor |Δd| is the wrong metric: Z-order wins it while
    losing the query-relevant one — measured here so nobody
    re-attempts that assertion.)"""
    h = grid_hd.set_index(["cx", "cy"]).hd.unstack().to_numpy()
    g = spark.range(N * N).select(
        (F.col("id") % N).alias("cx"),
        (F.col("id") / N).cast("long").alias("cy"))
    mz = g.select("cx", "cy", cells.morton(
        F.col("cx"), F.col("cy"), L).alias("m")).toPandas()
    z = mz.set_index(["cx", "cy"]).m.unstack().to_numpy()

    def mean_runs(grid, w):
        tot = cnt = 0
        for x0 in range(0, N - w + 1, 2):
            for y0 in range(0, N - w + 1, 2):
                ids = np.sort(grid[x0:x0 + w, y0:y0 + w].ravel())
                tot += 1 + int((np.diff(ids) > 1).sum())
                cnt += 1
        return tot / cnt

    for w in (3, 4, 5, 8):
        assert mean_runs(h, w) < mean_runs(z, w)


def test_hilbert_matches_duckdb_ctes(spark):
    import duckdb

    g = spark.range(N * N).select(
        F.col("id").alias("i"),
        (F.col("id") % N).alias("cx"),
        (F.col("id") / N).cast("long").alias("cy"))
    sdf = hilbert.with_hilbert(g, "cx", "cy", L) \
        .orderBy("i").toPandas()
    con = duckdb.connect()
    sql = f"""WITH src AS (
  SELECT i, i % {N} AS cx, i // {N} AS cy FROM range({N * N}) t(i)
),
{hilbert.hilbert_sql_ctes('src', 'cx', 'cy', L)}
SELECT i, cx, cy, hd FROM hfin ORDER BY i"""
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        sdf[["i", "cx", "cy", "hd"]].astype("int64"),
        odf[["i", "cx", "cy", "hd"]].astype("int64"))


def test_hilbert_level_validation(spark):
    g = spark.range(4).select(F.col("id").alias("cx"),
                              F.col("id").alias("cy"))
    with pytest.raises(ValueError):
        hilbert.with_hilbert(g, "cx", "cy", 0)


def test_hilbert_index_query_oracle(spark, sf_dir):
    import duckdb

    import __spark_entry__ as em

    sdf = em.queries()["hilbert_index"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in ("lineitem",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    odf = con.execute(em.oracle_sql()["hilbert_index"]).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_fingerprint_oracle_pin(spark, sf_dir):
    """fingerprint left the 50-entry window in round-5 session 8 (its
    fp expressions stay under the driver gate inside curation's
    output); this pin keeps the standalone query DuckDB-parity-tested."""
    import duckdb

    import __spark_entry__ as em
    from vtzero_spark.engine import textops

    sdf = em.q_fingerprint(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    odf = con.execute(textops.FINGERPRINT_SQL).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hilbert_subtree_range_law(grid_hd):
    """hilbert_subtree_range == the grid-derived [min, max+1] of every
    quadrant's ds, at every ancestor zoom — interval POSITION is
    determined by the quadrant's own level-z d alone."""
    for z in (1, 2, 3):
        span = 1 << (L - z)
        g = grid_hd.copy()
        g["qx"], g["qy"] = g.cx // span, g.cy // span
        mm = g.groupby(["qx", "qy"]).hd.agg(["min", "max"])
        for (qx, qy), row in mm.iterrows():
            lo, hi = hilbert.hilbert_subtree_range(z, qx, qy, L)
            assert (lo, hi) == (row["min"], row["max"] + 1)
    # forward scalar == column walk (shared basis of the range math)
    for d in range(0, N * N, 11):
        row = grid_hd.iloc[d]
        assert hilbert.hilbert_xy2d(int(row.cx), int(row.cy), L) == d
