"""vtzero_spark — PySpark-native spatial-join + tiling engine.

A from-scratch engine with the data-processing capabilities of
mapbox/vtzero (MVT codec semantics) re-expressed Spark-first:
DataFrame/SQL plans for tiling, cell-indexed spatial joins, kNN, and
training-data pipeline operators; numpy-vectorized MVT codec inside
Arrow-batched UDFs for the geometry/tile encode-decode paths.
"""

__version__ = "0.1.0"
