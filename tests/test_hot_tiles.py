"""Chunked hot-tile encode: byte-identical to the single-group fused
encoder, including when chunks are tiny (maximal parallel split)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

from vtzero_spark.engine import assemble
from vtzero_spark.engine.hot_tiles import encode_point_tiles_chunked


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
