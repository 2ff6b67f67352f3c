"""Chunked hot-tile encode: byte-identical to the single-group fused
encoder, including when chunks are tiny (maximal parallel split)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

from vtzero_spark.engine import assemble, geomops, synth, tiling
from vtzero_spark.engine.hot_tiles import (
    encode_geom_tiles_chunked, encode_point_tiles_chunked,
)
from vtzero_spark.engine.synth import EXTENT, ZOOM


@pytest.mark.parametrize("chunk_rows", [7, 100_000])
def test_chunked_encode_byte_parity(spark, sf_dir, chunk_rows):
    feats = entry._features(spark, sf_dir).select(*entry.POINT_COLS)
    single = assemble.encode_point_tiles(feats, prop_spec=entry.PROP_SPEC) \
        .select("z", "x", "y", "num_layers", "tile_bytes").toPandas()
    chunked = encode_point_tiles_chunked(feats, entry.PROP_SPEC,
                                         chunk_rows=chunk_rows) \
        .select("z", "x", "y", "num_layers", "tile_bytes").toPandas()
    key = ["z", "x", "y"]
    a = single.set_index(key).sort_index()
    b = chunked.set_index(key).sort_index()
    assert len(a) == len(b) and len(a) > 0
    assert (a["num_layers"] == b["num_layers"]).all()
    mismatch = a["tile_bytes"].map(bytes) != b["tile_bytes"].map(bytes)
    assert not mismatch.any(), f"{int(mismatch.sum())} tiles differ"


@pytest.mark.parametrize("ordinals", [
    "dense",      # 0..n-1 per layer
    "sparse",     # global ids spread across layers (the bench shape)
    "clustered",  # bursts with huge gaps — worst case for span math
])
def test_chunked_parity_under_ordinal_distributions(spark, ordinals):
    """Adaptive chunk spans must stay byte-identical to the
    single-group encoder for ANY monotone unique ordinal layout."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    for li, lname in enumerate(("L0", "L1")):
        n = 120
        if ordinals == "dense":
            ords = np.arange(n)
        elif ordinals == "sparse":
            ords = np.arange(n) * 997 + li
        else:
            gaps = np.where(np.arange(n) % 17 == 0, 100_003, 1)
            ords = np.cumsum(gaps) + li
        for i in range(n):
            rows.append((2, 1, 1, lname, int(ords[i]), int(ords[i]),
                         int(rng.randint(0, 4096)), int(rng.randint(0, 4096)),
                         int(rng.randint(0, 1 << 30)),
                         ["png", "jpeg"][i % 2], f"c{i % 9}"))
    feats = spark.createDataFrame(
        rows, "z long, x long, y long, layer_name string, "
              "feature_ordinal long, feature_id long, loc_x long, "
              "loc_y long, phash long, fmt string, caption string")
    single = assemble.encode_point_tiles(feats, prop_spec=entry.PROP_SPEC) \
        .select("tile_bytes").toPandas()
    chunked = encode_point_tiles_chunked(feats, entry.PROP_SPEC,
                                         chunk_rows=13) \
        .select("tile_bytes").toPandas()
    assert len(single) == len(chunked) == 1
    assert bytes(single["tile_bytes"].iloc[0]) == \
        bytes(chunked["tile_bytes"].iloc[0])


@pytest.mark.parametrize("chunk_rows", [5, 100_000])
def test_chunked_geom_encode_byte_parity(spark, sf_dir, chunk_rows):
    """Skew-safe geometry-stream encode == single-group encoder, byte
    for byte (polygon command streams, no props)."""
    img = synth.images(spark, sf_dir)
    assigned = tiling.assign_tiles(img, zoom=ZOOM, extent=EXTENT, buffer=0)
    feats = geomops.rect_stream_features(assigned)
    single = assemble.encode_geom_tiles(feats) \
        .select("z", "x", "y", "num_layers", "tile_bytes").toPandas()
    chunked = encode_geom_tiles_chunked(feats, chunk_rows=chunk_rows) \
        .select("z", "x", "y", "num_layers", "tile_bytes").toPandas()
    key = ["z", "x", "y"]
    a = single.set_index(key).sort_index()
    b = chunked.set_index(key).sort_index()
    assert len(a) == len(b) and len(a) > 0
    assert (a["num_layers"] == b["num_layers"]).all()
    mismatch = a["tile_bytes"].map(bytes) != b["tile_bytes"].map(bytes)
    assert not mismatch.any(), f"{int(mismatch.sum())} tiles differ"
