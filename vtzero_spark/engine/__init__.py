"""Spark-side engine: tiling, spatial joins, kNN, assembly, pipeline ops."""
