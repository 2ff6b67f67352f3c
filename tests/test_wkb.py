"""WKB/WKT interchange: spec golden bytes, batch==scalar, round-trip
law, corrupt-input contract, Spark operators end-to-end."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtzero_spark.engine import synth, wkb

OUTER = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]       # area2 > 0
INNER = [(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)]           # area2 < 0
OUTER2 = [(100, 100), (110, 100), (110, 110), (100, 110), (100, 100)]


def test_golden_point_le():
    g = wkb.encode_wkb_scalar(1, [[(1, 2)]])
    assert g.hex() == ("0101000000"
                       + struct.pack("<d", 1.0).hex()
                       + struct.pack("<d", 2.0).hex())


def test_golden_headers():
    assert wkb.encode_wkb_scalar(3, [OUTER, INNER])[:9].hex() == \
        "010300000002000000"
    assert wkb.encode_wkb_scalar(3, [OUTER, INNER, OUTER2])[:9].hex() == \
        "010600000002000000"  # MultiPolygon, 2 polys
    assert wkb.encode_wkb_scalar(2, [[(0, 0), (1, 1)], [(2, 2), (3, 3)]]
                                 )[:9].hex() == "010500000002000000"
    assert wkb.encode_wkb_scalar(1, [[(7, 8)], [(9, 10)]])[:9].hex() == \
        "010400000002000000"


def test_big_endian_and_mixed_nesting_decode():
    be_pt = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    assert wkb.decode_wkb(be_pt) == (1, [[(1.0, 2.0)]])
    # LE multi wrapping a BE child — legal per spec (per-geometry flag)
    le_hdr = b"\x01" + struct.pack("<II", 4, 1)
    assert wkb.decode_wkb(le_hdr + be_pt) == (1, [[(1.0, 2.0)]])


ROWS = [
    (1, [[(5, 6)]]),
    (2, [[(0, 0), (100, 200), (300, 65535)]]),
    (3, [OUTER, INNER]),
    (3, [OUTER, INNER, OUTER2]),
    (1, [[(7, 8)], [(9, 10)]]),
    (2, [[(0, 0), (1, 1)], [(2, 2), (3, 3)]]),
    (3, [OUTER2]),
]


def _flat(rows):
    o1, o2, xs, ys, gts = [0], [0], [], [], []
    for gt, parts in rows:
        gts.append(gt)
        for ring in parts:
            xs.extend(p[0] for p in ring)
            ys.extend(p[1] for p in ring)
            o2.append(len(xs))
        o1.append(len(o2) - 1)
    return (np.array(o1), np.array(o2), np.array(xs, np.int64),
            np.array(ys, np.int64), np.array(gts))


def test_batch_equals_scalar_and_roundtrips():
    batch = wkb.encode_wkb_batch(*_flat(ROWS))
    for k, (gt, parts) in enumerate(ROWS):
        assert batch[k] == wkb.encode_wkb_scalar(gt, parts)
        dgt, dparts = wkb.decode_wkb(batch[k])
        assert dgt == gt
        assert dparts == [[(float(a), float(b)) for a, b in r]
                          for r in parts]


def test_corrupt_wkb_valueerror_only():
    good = wkb.encode_wkb_scalar(3, [OUTER, INNER])
    for bad in [b"", b"\x02", good[:-1], good + b"\x00",
                b"\x01\x63\x00\x00\x00",
                b"\x01" + struct.pack("<II", 4, 1 << 30)]:
        with pytest.raises(ValueError):
            wkb.decode_wkb(bad)
    rng = np.random.default_rng(7)
    for _ in range(300):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            wkb.decode_wkb(bytes(b))
        except ValueError:
            pass  # the only permitted failure mode


def test_spark_wkb_roundtrip_and_wkt(spark, sf_dir):
    polys = synth.polygons(spark, sf_dir).select(
        "pid", "cx", "cy", "r",
        F.array("ring").alias("parts"),
        F.lit(3).cast("int").alias("geom_type"))
    enc = wkb.to_wkb(polys)
    dec = wkb.from_wkb(enc.select("pid", "cx", "cy", "r", "wkb"))
    rows = dec.select("pid", "cx", "cy", "r", "geom_type", "parts",
                      "wkb_status").collect()
    assert all(row.wkb_status == "ok" for row in rows)
    for row in rows:
        assert row.geom_type == 3 and len(row.parts) == 1
        ring = [(p.x, p.y) for p in row.parts[0]]
        cx, cy, r = row.cx, row.cy, row.r
        assert ring == [(cx, cy - r), (cx + r, cy), (cx, cy + r),
                        (cx - r, cy), (cx, cy - r)]
    # WKB byte length is closed-form for the diamond: 9+4+5*16 = 93
    lens = enc.select(F.length("wkb").alias("n")).distinct().collect()
    assert [row.n for row in lens] == [93]
    # WKT export, pure JVM — no Python stage in this plan
    wkt = polys.select("pid", "cx", "cy", "r",
                       wkb.wkt_expr().alias("wkt"))
    assert "BatchEvalPython" not in wkt._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in wkt._jdf.queryExecution().executedPlan().toString()
    got = {row.pid: row for row in wkt.collect()}
    for pid, row in got.items():
        cx, cy, r = row.cx, row.cy, row.r
        exp = (f"POLYGON (({cx} {cy - r}, {cx + r} {cy}, {cx} {cy + r}, "
               f"{cx - r} {cy}, {cx} {cy - r}))")
        assert row.wkt == exp, (row.wkt, exp)


def test_spark_from_wkb_corrupt_rows_are_data(spark):
    good = wkb.encode_wkb_scalar(3, [OUTER])
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(good[:-3])),
         (2, bytearray(b"\x05\x00"))],
        "id int, wkb binary")
    out = {row.id: row for row in wkb.from_wkb(df).collect()}
    assert out[0].wkb_status == "ok" and out[0].geom_type == 3
    assert out[1].wkb_status.startswith("corrupt:")
    assert out[2].wkb_status.startswith("corrupt:")
    assert out[1].parts == [] and out[2].parts == []
