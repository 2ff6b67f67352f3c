"""Raw .mvt file ingestion — the reference's actual entry point
(examples/utils.cpp:26-44 reads a tile file into a string;
vtzero-stats/vtzero-filter all start there). Spark-first form:
``spark.read.format("binaryFile")`` scans any file glob in parallel
(splittable listing, columnar content), the z/x/y address is parsed
from the {z}-{x}-{y}.mvt filename convention, and the bytes feed the
same decode_tiles / decode_layers operators as in-pipeline tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# matches e.g. mapbox-streets-v6-14-8714-8017.mvt -> z=14 x=8714 y=8017
_ZXY_RE = r"(\d+)-(\d+)-(\d+)\.mvt$"


def read_mvt_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Binary-file scan -> tiles(z,x,y,tile_bytes[,path]). Files whose
    name does not carry a z-x-y suffix get z=x=y=-1 (still decodable;
    address-less tiles are legal inputs to every decode operator).

    Caveat: Spark's binaryFile source SKIPS zero-length files, so an
    empty tile (zero layers — legal MVT) written as a 0-byte file will
    not appear in the scan."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mvt")
        .load(path_glob)
    )
    zxy = [
        F.regexp_extract(F.col("path"), _ZXY_RE, i).alias(c)
        for i, c in ((1, "zs"), (2, "xs"), (3, "ys"))
    ]
    return raw.select("path", "content", *zxy).select(
        F.when(F.col("zs") == "", -1).otherwise(F.col("zs").cast("long"))
        .alias("z"),
        F.when(F.col("xs") == "", -1).otherwise(F.col("xs").cast("long"))
        .alias("x"),
        F.when(F.col("ys") == "", -1).otherwise(F.col("ys").cast("long"))
        .alias("y"),
        F.col("content").alias("tile_bytes"),
        "path",
    )


def mvt_file_stats(spark: SparkSession, path_glob: str) -> DataFrame:
    """vtzero-stats over tile FILES (examples/vtzero-stats.cpp:20-54):
    per-layer feature count and key/value dictionary sizes, computed
    without parsing any feature body (decode_layers keeps feature
    messages as raw views)."""
    from . import assemble

    tiles = read_mvt_files(spark, path_glob).select(
        "z", "x", "y", "tile_bytes")
    layers = assemble.decode_layers(tiles)
    return layers.where(F.col("decode_status") == "ok").select(
        "z", "x", "y", "layer_ordinal", "layer_name", "num_features",
        "key_table_size", "value_table_size",
        F.octet_length("layer_bytes").alias("layer_size"),
    )


def write_mvt_files(tiles: DataFrame, out_dir: str) -> DataFrame:
    """The inverse of read_mvt_files: write each tile row as an
    individual ``{z}-{x}-{y}.mvt`` file — the reference's on-disk form
    (examples/utils.cpp:46-56 write_data_to_file). Executor-side
    writes (each task writes its own partition's tiles, no driver
    collect); returns the manifest (z, x, y, path, nbytes), which
    materializes the writes when acted on. Addresses must be unique
    per tile, as in any tileset directory — duplicates are NOT
    detected here (two tasks writing the same address race,
    last-writer-wins); run a ``groupBy(z, x, y).count`` assertion
    first when the input is untrusted. Paths are plain filesystem
    paths (local/NFS); for object stores write tiles as a parquet
    binary column instead and export at the edge."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def fn(batches):
        for pdf in batches:
            zs = pdf["z"].to_numpy()
            xs = pdf["x"].to_numpy()
            ys = pdf["y"].to_numpy()
            bufs = pdf["tile_bytes"].to_numpy()
            rows = []
            for i in range(len(pdf)):
                path = os.path.join(
                    out_dir, f"{int(zs[i])}-{int(xs[i])}-{int(ys[i])}.mvt")
                data = bytes(bufs[i])
                with open(path, "wb") as fh:
                    fh.write(data)
                rows.append({"z": int(zs[i]), "x": int(xs[i]),
                             "y": int(ys[i]), "path": path,
                             "nbytes": len(data)})
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "path", "nbytes"])

    return tiles.select("z", "x", "y", "tile_bytes").mapInPandas(
        fn, schema="z long, x long, y long, path string, nbytes long")
