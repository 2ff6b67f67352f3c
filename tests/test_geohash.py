"""Geohash cell index — base32 interleave on the exact integer world
grid.

Laws pinned here:
- parity with an independent from-the-spec Python reference encoder
  (fraction-halving binary search, the textbook formulation) on LCG
  fuzz at precisions 1..6;
- round trip: decode(encode(p)) is the cell anchor and the point lies
  inside the cell (anchor <= p < anchor + cell span), and
  encode(decode(g)) == g for every fuzzed cell id;
- prefix nesting: the P-1-char prefix of a P-char geohash is the
  parent cell's geohash;
- known-answer goldens derived from the published lat/lon alphabet
  mapping (corners and center of the world square);
- Spark == DuckDB on the shared generated expression;
- precision-vs-grid and alphabet error contracts.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import geohash as GH

WBITS = 16
WORLD = 1 << WBITS


def ref_encode(xfrac, yfrac, precision):
    """Textbook geohash: interval halving per interleaved bit,
    longitude (x) first.  Fractions in [0, 1)."""
    out = []
    xlo, xhi, ylo, yhi = 0.0, 1.0, 0.0, 1.0
    even = True
    bits = 0
    ch = 0
    while len(out) < precision:
        if even:
            mid = (xlo + xhi) / 2
            if xfrac >= mid:
                ch = (ch << 1) | 1
                xlo = mid
            else:
                ch <<= 1
                xhi = mid
        else:
            mid = (ylo + yhi) / 2
            if yfrac >= mid:
                ch = (ch << 1) | 1
                ylo = mid
            else:
                ch <<= 1
                yhi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GH.BASE32[ch])
            bits = ch = 0
    return "".join(out)


def _lcg(n, seed=17):
    x, m = seed, (1 << 31) - 1
    for _ in range(n):
        x = (x * 48271) % m
        a = x % WORLD
        x = (x * 48271) % m
        yield a, x % WORLD


def test_matches_reference_encoder_all_precisions(spark):
    pts = list(_lcg(200))
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "i long, wx long, wy long")
    for p in (1, 2, 3, 4, 5, 6):
        got = {r.i: r.gh for r in df.select(
            "i", GH.geohash_col("wx", "wy", p).alias("gh")).collect()}
        for i, (x, y) in enumerate(pts):
            assert got[i] == ref_encode(x / WORLD, y / WORLD, p), (p, x, y)


def test_round_trip_anchor_and_containment():
    for x, y in _lcg(300, seed=5):
        for p in (2, 4, 6):
            gh = ref_encode(x / WORLD, y / WORLD, p)
            ax, ay = GH.geohash_decode(gh)
            lon_bits = (5 * p + 1) // 2
            lat_bits = 5 * p // 2
            assert ax <= x < ax + (1 << (WBITS - lon_bits))
            assert ay <= y < ay + (1 << (WBITS - lat_bits))
            assert ref_encode(ax / WORLD, ay / WORLD, p) == gh


def test_prefix_nesting():
    for x, y in _lcg(100, seed=23):
        g6 = ref_encode(x / WORLD, y / WORLD, 6)
        for p in (1, 2, 3, 4, 5):
            assert ref_encode(x / WORLD, y / WORLD, p) == g6[:p]


def test_known_answers():
    # world corners and center at precision 2: pure alphabet math.
    # x=y=0 -> all-zero bits -> '00'; center (0.5, 0.5) -> bits
    # 11000_00000 = 24,0 -> 's0' (the real-world geohash at lat/lon
    # (0,0) indeed starts with 's'); x max,y max -> all ones -> 'zz'
    assert ref_encode(0, 0, 2) == "00"
    assert GH.geohash_decode("00") == (0, 0)
    assert ref_encode(0.5, 0.5, 2) == "s0"
    mx = (WORLD - 1) / WORLD
    assert ref_encode(mx, mx, 2) == "zz"
    # and the engine column agrees on these exact rows (checked via
    # the reference in the fuzz test; here pin decode of the goldens)
    assert GH.geohash_decode("zz")[0] == WORLD - (1 << (WBITS - 5))


def test_spark_equals_duckdb(spark):
    pts = [(i, x, y) for i, (x, y) in enumerate(_lcg(250, seed=41))]
    df = spark.createDataFrame(pts, "i long, wx long, wy long")
    sdf = df.select("i", GH.geohash_col("wx", "wy", 5).alias("gh")) \
        .toPandas().sort_values("i").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, wx BIGINT, wy BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", pts)
    odf = con.execute(
        f"SELECT i, {GH.geohash_sql('wx', 'wy', 5)} AS gh "
        "FROM t ORDER BY i").df()
    assert list(sdf["gh"]) == list(odf["gh"])


def test_error_contracts():
    with pytest.raises(ValueError, match="finer than"):
        GH.geohash_decode("0000000")  # 7 chars -> 18 lon bits > 16
    with pytest.raises(ValueError, match="invalid geohash"):
        GH.geohash_decode("a1")  # 'a' is not in the geohash alphabet
    with pytest.raises(ValueError, match="needs"):
        GH.geohash_col("x", "y", 7)
    with pytest.raises(ValueError, match=">= 1"):
        GH.geohash_col("x", "y", 0)
