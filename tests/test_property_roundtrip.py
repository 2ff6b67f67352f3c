"""Property-based round-trips (hypothesis): encode -> decode identity
for every geometry type, varint/zigzag codecs, property values, and
the vectorized dictionary/section builders vs their scalar mirrors."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from vtzero_spark.mvt import geometry as G
from vtzero_spark.mvt import pbf
from vtzero_spark.mvt import tile as T
from vtzero_spark.mvt import values as V

COORD = st.integers(min_value=-(1 << 20), max_value=1 << 20)


def _pt_list(min_size, max_size):
    return st.lists(st.tuples(COORD, COORD), min_size=min_size, max_size=max_size)


@settings(max_examples=150, deadline=None)
@given(_pt_list(1, 40))
def test_point_roundtrip(pts):
    arr = np.array(pts, dtype=np.int64)
    cmds = G.encode_point(arr)
    parts, rt = G.decode_geometry(G.GEOM_POINT, cmds)
    assert rt is None
    assert np.array_equal(parts[0], arr)


@settings(max_examples=150, deadline=None)
@given(st.lists(_pt_list(2, 20), min_size=1, max_size=5))
def test_linestring_roundtrip(parts_in):
    # drop zero-length segments (builder rejects them)
    cleaned = []
    for part in parts_in:
        out = [part[0]]
        for p in part[1:]:
            if p != out[-1]:
                out.append(p)
        if len(out) >= 2:
            cleaned.append(np.array(out, dtype=np.int64))
    if not cleaned:
        return
    cmds = G.encode_linestring(cleaned)
    parts, rt = G.decode_geometry(G.GEOM_LINESTRING, cmds)
    assert rt is None
    assert len(parts) == len(cleaned)
    for got, want in zip(parts, cleaned):
        assert np.array_equal(got, want)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(COORD, COORD, st.integers(1, 500),
                          st.integers(1, 500)), min_size=1, max_size=4))
def test_polygon_rect_rings_roundtrip(rects):
    rings = []
    for x0, y0, w, h in rects:
        rings.append(np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.int64))
    cmds = G.encode_polygon(rings)
    parts, rt = G.decode_geometry(G.GEOM_POLYGON, cmds)
    assert len(parts) == len(rings)
    assert all(t == G.RING_OUTER for t in rt)
    for got, want in zip(parts, rings):
        assert np.array_equal(got, want)
        assert G.ring_signed_area2(got) == 2 * \
            (got[1][0] - got[0][0]) * (got[2][1] - got[1][1])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=0, max_size=200))
def test_varint_array_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = pbf.encode_varint_array(arr)
    got = pbf.decode_varint_array(buf)
    assert np.array_equal(got, arr)
    # scalar mirror agrees
    assert buf == b"".join(pbf.encode_varint(int(v)) for v in vals)


@settings(max_examples=200, deadline=None)
@given(st.integers(-(1 << 31), (1 << 31) - 1))
def test_zigzag32_roundtrip(v):
    assert pbf.zigzag32_decode(pbf.zigzag32_encode(v)) == v


@settings(max_examples=150, deadline=None)
@given(st.one_of(
    st.tuples(st.just(V.VT_STRING), st.text(max_size=60)),
    st.tuples(st.just(V.VT_INT), st.integers(-(1 << 63), (1 << 63) - 1)),
    st.tuples(st.just(V.VT_UINT), st.integers(0, (1 << 64) - 1)),
    st.tuples(st.just(V.VT_SINT), st.integers(-(1 << 63), (1 << 63) - 1)),
    st.tuples(st.just(V.VT_BOOL), st.booleans()),
    st.tuples(st.just(V.VT_DOUBLE), st.floats(allow_nan=False)),
))
def test_value_roundtrip(tv):
    vtype, val = tv
    enc = V.encode_value(vtype, val)
    t, got = V.decode_value(enc)
    assert t == vtype
    if vtype == V.VT_INT and val < 0:
        pass  # stored as two's-complement varint; decode returns signed
    assert got == val


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.integers(0, (1 << 40)),  # id
    st.tuples(COORD, COORD),    # point
    st.text(max_size=12),       # string prop value
), min_size=1, max_size=25))
def test_layer_assemble_parse_fixpoint(feats):
    rows = []
    for fid, (x, y), sval in feats:
        cmds = G.encode_point(np.array([[x, y]], dtype=np.int64))
        rows.append((fid, G.GEOM_POINT, cmds,
                     [(b"k", V.encode_value(V.VT_STRING, sval))]))
    layer_bytes = T.assemble_layer("hello", rows)
    ly = T.parse_layer(layer_bytes)
    assert ly.name == "hello" and len(ly.features) == len(rows)
    # dictionary: 1 key, first-appearance-deduped values
    uniq = []
    for _, _, _, props in rows:
        if props[0][1] not in uniq:
            uniq.append(props[0][1])
    assert ly.keys == [b"k"]
    assert ly.values == uniq
    # serialize -> parse -> serialize is a fixpoint
    rebuilt = T.build_layer(
        "hello",
        [T.build_feature(f.id, f.geom_type, f.geometry, f.tags)
         for f in ly.features],
        ly.keys, ly.values)
    assert rebuilt == layer_bytes
