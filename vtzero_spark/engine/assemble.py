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
