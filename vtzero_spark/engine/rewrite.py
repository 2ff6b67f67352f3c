"""Fused per-tile filter + rewrite — the reference CLI's execution
model made data-parallel.

vtzero-streets (examples/vtzero-streets.cpp:22-78) processes ONE tile
in-process: iterate features, keep those whose decoded property
matches, copy them into a fresh layer whose dictionaries rebuild in
first-appearance order. This module is that exact flow as a Spark
operator: one mapInPandas pass over tiles, ZERO shuffles — each task
decodes, filters, and re-encodes its tiles independently. At 100 TB
this is the plan you want for tile rewriting: embarrassingly parallel,
no data movement beyond the scan, output bytes identical to running
the CLI per tile (and byte-identical to the distributed
filter-then-encode pipeline — pinned in tests/test_rewrite.py).

The property match happens on WIRE BYTES, not decoded values: a layer
value table deduplicates by encoded bytes (types.hpp:141-186 identity),
so "property == literal" is one bytes equality against the value table
plus an integer scan of the tag pairs — features never decode their
values at all. That is the same trick vtzero's property_value
comparison enables (property_value.hpp operator==).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..mvt import tile as T
from ..mvt import values as V
from ..mvt.errors import MVTError
from ..mvt.pbf import (
    copy_segments, encode_varint_array, len_field, varint_field,
    varint_len_array,
)

TILE_SCHEMA = "z long, x long, y long, num_layers int, tile_bytes binary"


def _vartag_features_bytes(ids: np.ndarray, has_id: np.ndarray,
                           gtypes: np.ndarray,
                           gflat: np.ndarray, goffsets: np.ndarray,
                           tflat: np.ndarray, toffsets: np.ndarray) -> bytes:
    """Features-section bytes for VARIABLE-length tag streams (the
    general rewrite case — features keep however many properties they
    had). Same vtzero emission order as build_feature (type, id,
    geometry, tags; builder.hpp:596-599,429-436), assembled as one flat
    varint scatter with optional id / tags fields per feature."""
    n = len(gtypes)
    if not n:
        return b""
    glens = np.diff(goffsets)
    tlens = np.diff(toffsets)
    gvals = np.ascontiguousarray(gflat, dtype=np.uint64)
    tvals = np.ascontiguousarray(tflat, dtype=np.uint64)

    def seg_len(vals: np.ndarray, offs: np.ndarray, lens: np.ndarray):
        nb = varint_len_array(vals)
        tot = np.add.reduceat(np.append(nb, 0), offs[:-1]) if n else \
            np.zeros(0, np.int64)
        return np.where(lens == 0, 0, tot)

    geom_len = seg_len(gvals, goffsets, glens)
    tags_len = seg_len(tvals, toffsets, tlens)
    has_tags = tlens > 0

    TYPE_T = np.uint64((T.FEATURE_TYPE << 3) | 0)
    ID_T = np.uint64((T.FEATURE_ID << 3) | 0)
    GEOM_T = np.uint64((T.FEATURE_GEOMETRY << 3) | 2)
    TAGS_T = np.uint64((T.FEATURE_TAGS << 3) | 2)
    FEAT_T = np.uint64((T.LAYER_FEATURES << 3) | 2)

    ids_u = ids.astype(np.uint64)
    gtypes_u = gtypes.astype(np.uint64)
    gl_u = geom_len.astype(np.uint64)
    tl_u = tags_len.astype(np.uint64)

    # body length (everything inside the feature message)
    feat_len = (
        1 + varint_len_array(gtypes_u)                      # type
        + np.where(has_id, 1 + varint_len_array(ids_u), 0)  # id
        + 1 + varint_len_array(gl_u) + geom_len             # geometry
        + np.where(has_tags, 1 + varint_len_array(tl_u) + tags_len, 0)
    )
    fl_u = feat_len.astype(np.uint64)

    per_feat = (2 + 2 + 2 * has_id.astype(np.int64) + 2 + glens
                + np.where(has_tags, 2, 0) + tlens)
    ends = np.cumsum(per_feat)
    starts = ends - per_feat
    flat = np.empty(int(ends[-1]), dtype=np.uint64)

    pos = starts
    flat[pos] = FEAT_T
    flat[pos + 1] = fl_u
    flat[pos + 2] = TYPE_T
    flat[pos + 3] = gtypes_u
    pos = pos + 4
    idp = pos[has_id]
    flat[idp] = ID_T
    flat[idp + 1] = ids_u[has_id]
    pos = pos + 2 * has_id.astype(np.int64)
    flat[pos] = GEOM_T
    flat[pos + 1] = gl_u
    copy_segments(gvals, goffsets[:-1], glens, flat, pos + 2)
    pos = pos + 2 + glens
    tp = pos[has_tags]
    flat[tp] = TAGS_T
    flat[tp + 1] = tl_u[has_tags]
    copy_segments(tvals, toffsets[:-1], tlens,
                  flat, pos + np.where(has_tags, 2, 0))
    return encode_varint_array(flat)


def feature_tag_streams(
        fs: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a layer's per-feature tag arrays into one stream:
    (tlens, toff, tflat) with toff the element offsets (pairs are
    tflat[0::2] keys / tflat[1::2] values, per-feature pair offsets
    toff[:-1] // 2)."""
    nf = len(fs)
    tlens = np.fromiter((f.tags.size for f in fs), np.int64, nf)
    toff = np.zeros(nf + 1, np.int64)
    np.cumsum(tlens, out=toff[1:])
    tflat = (np.concatenate([f.tags for f in fs]).astype(np.int64)
             if toff[-1] else np.zeros(0, np.int64))
    return tlens, toff, tflat


def seg_any(pair_bool: np.ndarray, toff: np.ndarray,
            tlens: np.ndarray) -> np.ndarray:
    """Per-feature ANY over a boolean evaluated on the flat tag-pair
    stream. Empty segments (tag-less features) are masked out rather
    than trusting reduceat's repeated-index value."""
    poff = toff[:-1] // 2
    hits = np.add.reduceat(
        np.append(pair_bool, False).astype(np.int64), poff)
    return (hits > 0) & (tlens > 0)


def _rewrite_layer(layer: T.Layer, kidx: int,
                   vidxs: np.ndarray) -> bytes | None:
    """One layer's vtzero-streets pass: keep features carrying a tag
    pair (kidx, v) for any v in ``vidxs``, rebuild both dictionaries
    in first-appearance order over the survivors
    (property_mapper.hpp:31-99 semantics), emit the rebuilt layer
    bytes. None when no feature survives (the CLI's tile_builder drops
    empty layers, builder_impl.hpp:225-227)."""
    fs = layer.features
    if not fs:
        return None
    tlens, toff, tflat = feature_tag_streams(fs)
    pair_hit = (tflat[0::2] == kidx) & np.isin(tflat[1::2], vidxs)
    keep = seg_any(pair_hit, toff, tlens)
    return rebuild_layer(layer, np.flatnonzero(keep))


def rebuild_layer(layer: T.Layer, sel: np.ndarray) -> bytes | None:
    """Rebuild a layer keeping exactly the feature ordinals in ``sel``
    (any predicate's survivor set): both dictionaries rebuilt in
    first-appearance order over the survivors (property_mapper.hpp
    semantics), None when empty (tile_builder drops empty layers)."""
    fs = layer.features
    if not sel.size:
        return None
    tlens, _, _ = feature_tag_streams(fs)

    # survivor tag streams, feature-major — factorize IS the
    # first-appearance rebuild a sequential add_property loop performs
    s_tlens = tlens[sel]
    s_toff = np.zeros(sel.size + 1, np.int64)
    np.cumsum(s_tlens, out=s_toff[1:])
    stflat = np.concatenate([fs[i].tags for i in sel]).astype(np.int64)
    k_codes, k_uniq = pd.factorize(stflat[0::2])
    v_codes, v_uniq = pd.factorize(stflat[1::2])
    new_tags = np.empty(stflat.size, np.uint64)
    new_tags[0::2] = k_codes.astype(np.uint64)
    new_tags[1::2] = v_codes.astype(np.uint64)
    keys_tab = [layer.keys[int(i)] for i in k_uniq]
    vals_tab = [layer.values[int(i)] for i in v_uniq]

    has_id = np.fromiter((fs[i].id is not None for i in sel), bool, sel.size)
    ids = np.fromiter((fs[i].id or 0 for i in sel), np.int64, sel.size)
    gtypes = np.fromiter((fs[i].geom_type for i in sel), np.int64, sel.size)
    glens = np.fromiter((fs[i].geometry.size for i in sel), np.int64,
                        sel.size)
    goff = np.zeros(sel.size + 1, np.int64)
    np.cumsum(glens, out=goff[1:])
    gflat = (np.concatenate([fs[i].geometry for i in sel])
             .astype(np.uint64) if goff[-1] else np.zeros(0, np.uint64))

    features_bytes = _vartag_features_bytes(
        ids, has_id, gtypes, gflat, goff, new_tags, s_toff)
    header = (
        varint_field(T.LAYER_VERSION, layer.version)
        + len_field(T.LAYER_NAME, layer.name.encode("utf-8"))
        + varint_field(T.LAYER_EXTENT, layer.extent)
    )
    return b"".join([
        header,
        features_bytes,
        b"".join(len_field(T.LAYER_KEYS, k) for k in keys_tab),
        b"".join(len_field(T.LAYER_VALUES, v) for v in vals_tab),
    ])


def filter_tile_bytes(buf: bytes, key_b: bytes,
                      val_bs: bytes | list[bytes]) -> bytes:
    """One tile's vtzero-streets pass (the per-task core of
    filter_tiles_by_property): keep features whose tag pairs reference
    ``key_b`` with ANY of the ``val_bs`` wire values in the layer
    dictionaries, rebuild, drop empty layers. Malformed input -> empty
    tile. Thin wrapper over the generalized rewrite_tile_bytes."""
    if isinstance(val_bs, bytes):
        val_bs = [val_bs]
    return rewrite_tile_bytes(buf, None, key_b, list(val_bs))


def rewrite_tile_bytes(buf: bytes, layer_sel: str | None,
                       key_b: bytes | None,
                       val_bs: list[bytes] | None) -> bytes:
    """One tile's generalized rewrite pass, composing the reference
    CLIs' selection semantics in a single scan:

    - ``layer_sel``: vtzero-filter's layer selector (digits -> by
      ordinal, else by name; examples/vtzero-filter.cpp parity with
      get_layer) — None keeps every layer;
    - ``key_b`` None: no property predicate — selected layers pass
      through BYTE-VERBATIM (no parse beyond the name field, the
      add_existing_layer fast path);
    - ``key_b`` set, ``val_bs`` None: HAS-KEY — keep features carrying
      the key with ANY value (one index lookup, no value decode);
    - ``key_b`` + ``val_bs``: equality / IN-set on wire value bytes
      (vtzero-streets semantics, dictionaries rebuilt
      first-appearance).

    Malformed input -> empty tile (errors-as-data)."""
    val_set = set(val_bs) if val_bs is not None else None
    by_ordinal = layer_sel is not None and layer_sel.isdigit()
    want_ord = int(layer_sel) if by_ordinal else -1
    blobs: list[bytes] = []
    try:
        for ordinal, lv in enumerate(T.tile_layer_views(buf)):
            if layer_sel is not None:
                if by_ordinal:
                    if ordinal != want_ord:
                        continue
                elif T.layer_name_only(lv) != layer_sel:
                    continue
            if key_b is None:
                blobs.append(bytes(lv))        # verbatim passthrough
                continue
            layer = T.parse_layer(lv)
            try:
                kidx = layer.keys.index(key_b)
            except ValueError:
                continue
            if val_set is None:
                vidxs = np.arange(len(layer.values), dtype=np.int64)
            else:
                vidxs = np.fromiter(
                    (i for i, v in enumerate(layer.values)
                     if v in val_set), np.int64)
                if not vidxs.size:
                    continue
            lb = _rewrite_layer(layer, kidx, vidxs)
            if lb is not None:
                blobs.append(lb)
    except MVTError:
        blobs = []
    return T.build_tile(blobs)


def rewrite_tiles(
    tiles: DataFrame,
    layer: str | int | None = None,
    key: str | None = None,
    value=None,
    vtype: int = V.VT_STRING,
) -> DataFrame:
    """Generalized fused tile rewrite: compose vtzero-filter's layer
    selection with vtzero-streets' property predicate in ONE
    zero-shuffle mapInPandas pass (see rewrite_tile_bytes for the
    predicate matrix). ``value=None`` with a key means HAS-KEY;
    ``layer`` accepts a name or an ordinal (CLI selector semantics).
    Same task-granularity caveat as filter_tiles_by_property."""
    layer_sel = None if layer is None else str(layer)
    key_b = None if key is None else key.encode("utf-8")
    if value is None:
        val_bs = None
    else:
        vals = value if isinstance(value, (list, tuple)) else [value]
        val_bs = [V.encode_value(vtype, v) for v in vals]

    def fn(batches):
        for pdf in batches:
            outs = [rewrite_tile_bytes(bytes(b), layer_sel, key_b, val_bs)
                    for b in pdf["tile_bytes"].to_numpy()]
            yield pd.DataFrame({
                "z": pdf["z"].to_numpy(),
                "x": pdf["x"].to_numpy(),
                "y": pdf["y"].to_numpy(),
                "num_layers": [T.count_layers(o) for o in outs],
                "tile_bytes": outs,
            }, columns=["z", "x", "y", "num_layers", "tile_bytes"])

    return tiles.mapInPandas(fn, schema=TILE_SCHEMA)


def filter_tiles_by_property(
    tiles: DataFrame,
    key: str,
    value,
    vtype: int = V.VT_STRING,
) -> DataFrame:
    """tiles(z,x,y,tile_bytes) -> tiles with only the features whose
    property ``key`` equals ``value`` (a scalar, or a list/tuple for
    an IN-set match — e.g. several road classes) — vtzero-streets
    (examples/vtzero-streets.cpp:22-78) fused into one per-tile pass,
    zero shuffles. Layers left with no features are dropped; malformed
    tiles become empty tiles (errors-as-data). The match compares
    ENCODED value bytes against the layer's value table, so no value
    ever decodes.

    Task granularity is one tile (the CLI's own unit): a pathological
    hot tile makes one heavy task — apply the hot-tile disciplines
    upstream (tiling.feature_budget or the chunked encoder) if tiles
    can grow unbounded."""
    key_b = key.encode("utf-8")
    vals = value if isinstance(value, (list, tuple)) else [value]
    val_bs = [V.encode_value(vtype, v) for v in vals]

    def fn(batches):
        for pdf in batches:
            outs = [filter_tile_bytes(bytes(b), key_b, val_bs)
                    for b in pdf["tile_bytes"].to_numpy()]
            yield pd.DataFrame({
                "z": pdf["z"].to_numpy(),
                "x": pdf["x"].to_numpy(),
                "y": pdf["y"].to_numpy(),
                "num_layers": [T.count_layers(o) for o in outs],
                "tile_bytes": outs,
            }, columns=["z", "x", "y", "num_layers", "tile_bytes"])

    return tiles.mapInPandas(fn, schema=TILE_SCHEMA)
