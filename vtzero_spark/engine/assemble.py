"""Tile/layer/feature assembly and disassembly on Spark.

Write path (SURVEY §3.2): features DataFrame -> groupBy(z,x,y,layer)
applyInPandas(encode_layer) -> groupBy(z,x,y) applyInPandas(encode_tile)
-> tile_bytes. Ordering discipline (SURVEY §2.8): Spark gives no
intra-group order guarantees, so every group is explicitly sorted by
``feature_ordinal`` (and tiles assemble layers in ``layer_name``
order) before encoding — dictionary first-appearance order and feature
order then match a sequential vtzero builder run exactly.

Read path (SURVEY §3.1): tiles -> mapInPandas decode -> one row per
feature, geometry kept as raw command ints (decode elision: coordinates
are only materialized by the geometry codec when a query needs them —
the analog of vtzero's set_geometry passthrough, builder.hpp:1241-1248).

Codec errors never kill a task: malformed features surface in a
``decode_status`` column (SURVEY §7.3 "error semantics as data").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..mvt import geometry as G
from ..mvt import tile as T
from ..mvt import values as V
from ..mvt.errors import MVTError

LAYER_SCHEMA = (
    "z long, x long, y long, layer_name string, num_features long, "
    "key_table_size int, value_table_size int, layer_bytes binary"
)

TILE_SCHEMA = "z long, x long, y long, num_layers int, tile_bytes binary"

FEATURE_SCHEMA = (
    "z long, x long, y long, layer_ordinal int, layer_name string, "
    "version int, extent int, feature_ordinal int, feature_id long, "
    "geom_type int, geometry array<long>, geometry_nbytes int, "
    "num_properties int, decode_status string"
)


def _encode_props(row) -> list[tuple[bytes, bytes]]:
    """props column: array<struct<key, vtype, sval, dval, ival>> ->
    [(key_bytes, encoded_value_bytes)] honoring the 7-type identity."""
    props = row.get("props")
    if props is None or (isinstance(props, float) and pd.isna(props)):
        return []
    out = []
    for p in props:
        vtype = int(p["vtype"])
        if vtype == V.VT_STRING:
            val = V.encode_value(vtype, p["sval"])
        elif vtype in (V.VT_FLOAT, V.VT_DOUBLE):
            val = V.encode_value(vtype, p["dval"])
        elif vtype == V.VT_BOOL:
            val = V.encode_value(vtype, bool(p["ival"]))
        else:
            val = V.encode_value(vtype, int(p["ival"]))
        out.append((p["key"].encode("utf-8"), val))
    return out


def _encode_layer_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (z,x,y,layer_name) group -> one encoded layer row."""
    pdf = pdf.sort_values("feature_ordinal", kind="stable")
    z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
    name = pdf["layer_name"].iloc[0]
    has_parts = "parts" in pdf.columns
    has_props = "props" in pdf.columns

    kd = T.DictBuilder()
    vd = T.DictBuilder()
    blobs: list[bytes] = []
    ids = pdf["feature_id"].to_numpy()
    gtypes = pdf["geom_type"].to_numpy()
    if not has_parts:
        # vectorized single-point fast path
        zzx = np.asarray(
            ((pdf["loc_x"].to_numpy(np.int64) << 1)
             ^ (pdf["loc_x"].to_numpy(np.int64) >> 63)) & 0xFFFFFFFF)
        zzy = np.asarray(
            ((pdf["loc_y"].to_numpy(np.int64) << 1)
             ^ (pdf["loc_y"].to_numpy(np.int64) >> 63)) & 0xFFFFFFFF)
    for i in range(len(pdf)):
        fid = None if pd.isna(ids[i]) else int(ids[i])
        gtype = int(gtypes[i])
        if has_parts:
            parts = [np.array([[p["x"], p["y"]] for p in part], dtype=np.int64)
                     for part in pdf["parts"].iloc[i]]
            cmds = G.encode_geometry(gtype, parts)
        else:
            cmds = np.array([9, zzx[i], zzy[i]], dtype=np.int64)
        tags: list[int] = []
        if has_props:
            for k, v in _encode_props(pdf.iloc[i]):
                tags.append(kd.add(k))
                tags.append(vd.add(v))
        blobs.append(T.build_feature(fid, gtype, cmds, tags))
    layer_bytes = T.build_layer(name, blobs, kd.table, vd.table)
    return pd.DataFrame(
        [{
            "z": z, "x": x, "y": y, "layer_name": name,
            "num_features": len(blobs),
            "key_table_size": len(kd.table),
            "value_table_size": len(vd.table),
            "layer_bytes": layer_bytes,
        }]
    )


def encode_layers(features: DataFrame) -> DataFrame:
    """features(z,x,y,layer_name,feature_ordinal,feature_id,geom_type,
    loc_x,loc_y[,parts][,props]) -> one row per encoded layer.

    The groupBy is the single shuffle of the write path; inside each
    group the dictionary build mirrors vtzero add_key/add_value
    first-appearance semantics over the ordinal-sorted features.
    """
    return features.groupBy("z", "x", "y", "layer_name").applyInPandas(
        _encode_layer_group, schema=LAYER_SCHEMA
    )


# ------------------------------------------------- vectorized point path

def _encode_point_layer_group(pdf: pd.DataFrame, prop_spec) -> pd.DataFrame:
    """Fully vectorized single-point layer encode.

    The entire features section of a layer message is a concatenation
    of varints (field keys, lengths, ids, command ints, tag indexes), so
    one (n_features x K) uint64 matrix flattened through
    encode_varint_array produces the whole section in a single
    vectorized pass — no per-feature Python. Dictionary semantics are
    byte-identical to vtzero's add_value first-appearance order
    (builder_impl.hpp:104-147): per-column factorize, cross-column
    byte-dedup, then rank by first appearance in the interleaved
    (feature-major) value stream — exactly the order sequential
    add_property calls would produce.

    prop_spec: list of (key_name, vtype, column) with non-null columns;
    feature ids must be non-null (the generic path handles the rest).
    """
    from ..mvt.pbf import encode_varint_array, len_field, varint_field, varint_len_array

    pdf = pdf.sort_values("feature_ordinal", kind="stable")
    n = len(pdf)
    z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
    name = pdf["layer_name"].iloc[0]

    lx = pdf["loc_x"].to_numpy(np.int64)
    ly = pdf["loc_y"].to_numpy(np.int64)
    zzx = ((lx << 1) ^ (lx >> 63)) & 0xFFFFFFFF
    zzy = ((ly << 1) ^ (ly >> 63)) & 0xFFFFFFFF
    ids = pdf["feature_id"].to_numpy(np.int64)

    key_table: list[bytes] = []
    value_table: list[bytes] = []
    final_codes = None
    if prop_spec:
        key_table = [k.encode("utf-8") for k, _, _ in prop_spec]
        col_codes = []
        unique_bytes: list[bytes] = []
        offset = 0
        for _, vtype, col in prop_spec:
            codes, uniques = pd.factorize(pdf[col], use_na_sentinel=False)
            col_codes.append(codes.astype(np.int64) + offset)
            unique_bytes.extend(V.encode_value(vtype, u) for u in uniques)
            offset += len(uniques)
        # cross-column raw-bytes dedup (value identity is its encoding,
        # property_value.hpp:232-260)
        seen: dict[bytes, int] = {}
        canon_bytes: list[bytes] = []
        canon_of = np.empty(len(unique_bytes), dtype=np.int64)
        for i, b in enumerate(unique_bytes):
            j = seen.get(b)
            if j is None:
                j = len(canon_bytes)
                seen[b] = j
                canon_bytes.append(b)
            canon_of[i] = j
        stream = canon_of[np.stack(col_codes, axis=1)]  # (n, nprops)
        flat = stream.reshape(-1)
        first_pos = np.full(len(canon_bytes), np.iinfo(np.int64).max)
        np.minimum.at(first_pos, flat, np.arange(flat.size))
        order = np.argsort(first_pos, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        final_codes = rank[stream]
        value_table = [canon_bytes[c] for c in order]

    # varint matrix: [18, feat_len | 24, gtype, 8, id, 34, geom_len,
    #                 MoveTo(1)=9, zzx, zzy | 18, tags_len, k0,v0,...]
    nprops = len(prop_spec) if prop_spec else 0
    k_body = 9 + (2 + 2 * nprops if nprops else 0)
    M = np.empty((n, 2 + k_body), dtype=np.uint64)
    M[:, 2] = 24  # key(FEATURE_TYPE=3, varint)
    M[:, 3] = G.GEOM_POINT
    M[:, 4] = 8  # key(FEATURE_ID=1, varint)
    M[:, 5] = ids.astype(np.uint64)
    M[:, 6] = 34  # key(FEATURE_GEOMETRY=4, len)
    M[:, 8] = 9  # MoveTo(count=1)
    M[:, 9] = zzx.astype(np.uint64)
    M[:, 10] = zzy.astype(np.uint64)
    geom_len = varint_len_array(M[:, 8:11]).sum(axis=1)
    M[:, 7] = geom_len.astype(np.uint64)
    if nprops:
        M[:, 11] = 18  # key(FEATURE_TAGS=2, len)
        for c in range(nprops):
            M[:, 13 + 2 * c] = c  # key index
            M[:, 14 + 2 * c] = final_codes[:, c].astype(np.uint64)
        tags_len = varint_len_array(M[:, 13:]).sum(axis=1)
        M[:, 12] = tags_len.astype(np.uint64)
    feat_len = varint_len_array(M[:, 2:]).sum(axis=1)
    M[:, 0] = 18  # key(LAYER_FEATURES=2, len)
    M[:, 1] = feat_len.astype(np.uint64)

    header = (
        varint_field(T.LAYER_VERSION, 2)
        + len_field(T.LAYER_NAME, name.encode("utf-8"))
        + varint_field(T.LAYER_EXTENT, 4096)
    )
    layer_bytes = b"".join([
        header,
        encode_varint_array(M.reshape(-1)),
        b"".join(len_field(T.LAYER_KEYS, k) for k in key_table),
        b"".join(len_field(T.LAYER_VALUES, v) for v in value_table),
    ])
    return pd.DataFrame(
        [{
            "z": z, "x": x, "y": y, "layer_name": name,
            "num_features": n,
            "key_table_size": len(key_table),
            "value_table_size": len(value_table),
            "layer_bytes": layer_bytes,
        }]
    )


def encode_point_layers(features: DataFrame, prop_spec=None) -> DataFrame:
    """Vectorized encode for single-point features with a fixed property
    schema (the 10^12-image hot path). Byte-identical to encode_layers
    on the same input (asserted in tests); use encode_layers for
    multi-part geometries, null ids, or per-row property shapes."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_point_layer_group(pdf, prop_spec)

    return features.groupBy("z", "x", "y", "layer_name").applyInPandas(
        fn, schema=LAYER_SCHEMA
    )


def _encode_tile_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("layer_name", kind="stable")
    z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
    blobs = [bytes(b) for b in pdf["layer_bytes"]]
    counts = [int(n) for n in pdf["num_features"]]
    tile_bytes = T.build_tile(blobs, num_features=counts)
    return pd.DataFrame(
        [{"z": z, "x": x, "y": y,
          "num_layers": sum(1 for c in counts if c > 0),
          "tile_bytes": tile_bytes}]
    )


def encode_tiles(layers: DataFrame) -> DataFrame:
    """Layer rows -> one MVT blob per tile; layers concatenated in
    layer_name order (deterministic ordinal, SURVEY §2.8); zero-feature
    layers omitted (builder_impl.hpp:225-227)."""
    return layers.groupBy("z", "x", "y").applyInPandas(
        _encode_tile_group, schema=TILE_SCHEMA
    )


def _decode_tile_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for _, r in pdf.iterrows():
            z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
            try:
                views = T.tile_layer_views(bytes(r["tile_bytes"]))
            except MVTError as e:
                rows.append({
                    "z": z, "x": x, "y": y, "layer_ordinal": -1,
                    "layer_name": None, "version": None, "extent": None,
                    "feature_ordinal": -1, "feature_id": None,
                    "geom_type": None, "geometry": None,
                    "geometry_nbytes": None, "num_properties": None,
                    "decode_status": f"{type(e).__name__}: {e}",
                })
                continue
            for li, lv in enumerate(views):
                try:
                    layer = T.parse_layer(lv)
                except MVTError as e:
                    rows.append({
                        "z": z, "x": x, "y": y, "layer_ordinal": li,
                        "layer_name": None, "version": None, "extent": None,
                        "feature_ordinal": -1, "feature_id": None,
                        "geom_type": None, "geometry": None,
                        "geometry_nbytes": None, "num_properties": None,
                        "decode_status": f"{type(e).__name__}: {e}",
                    })
                    continue
                for fi, f in enumerate(layer.features):
                    rows.append({
                        "z": z, "x": x, "y": y, "layer_ordinal": li,
                        "layer_name": layer.name, "version": layer.version,
                        "extent": layer.extent, "feature_ordinal": fi,
                        "feature_id": f.id, "geom_type": f.geom_type,
                        "geometry": f.geometry.astype(np.int64).tolist(),
                        "geometry_nbytes": f.geometry_nbytes,
                        "num_properties": f.num_properties,
                        "decode_status": "ok",
                    })
        yield pd.DataFrame(
            rows,
            columns=["z", "x", "y", "layer_ordinal", "layer_name", "version",
                     "extent", "feature_ordinal", "feature_id", "geom_type",
                     "geometry", "geometry_nbytes", "num_properties",
                     "decode_status"],
        )


def decode_tiles(tiles: DataFrame) -> DataFrame:
    """tiles(z,x,y,tile_bytes) -> one row per feature (Arrow-batched;
    malformed content becomes decode_status rows, not task failures)."""
    return tiles.mapInPandas(_decode_tile_batch, schema=FEATURE_SCHEMA)


def decoded_points(features: DataFrame) -> DataFrame:
    """Expand decoded single-MoveTo point geometries to coordinates with
    pure column math (zigzag via bit ops) — no Python for the common
    case. geometry = [MoveTo(1..n), zz(dx1), zz(dy1), ...]; first point
    = zigzag_decode(geometry[1]), zigzag_decode(geometry[2])."""
    def zzdec(v: str) -> str:
        m = f"(CAST({v} AS BIGINT) % 4294967296)"
        return f"(CASE WHEN {m} % 2 = 0 THEN {m} div 2 ELSE -({m} div 2) - 1 END)"

    return features.where(F.col("geom_type") == G.GEOM_POINT).withColumn(
        "pt_x", F.expr(zzdec("geometry[1]")).cast("int")
    ).withColumn("pt_y", F.expr(zzdec("geometry[2]")).cast("int"))
