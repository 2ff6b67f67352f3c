"""Geometry-kernel scaling probe: the earcut donut-mesh job (exact
integer ear clipping, the engine's Python-kernel compute-dense regime
on the geometry axis — the analog of tools/image_probe.py's JPEG
decode regime on the image axis) over the amplified image-footprint
table.

Usage: python tools/mesh_probe.py <cores> [amplify] [sf_dir]
Prints one JSON line {"cores": N, "features": D, "sec": S,
"features_per_sec": T}. Run at two core counts on the IDENTICAL input
to evidence the north_rule's two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vtzero_spark.engine import earcut, synth  # noqa: E402
from vtzero_spark.engine.geomops import _pt, rect_ring  # noqa: E402
from vtzero_spark.engine.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("mesh-probe", cores=cores,
                      shuffle_partitions=max(2 * cores, 8))
    img = synth.images(spark, sf_dir).select("iid", "wx", "wy", "w", "h")
    amp = img.select(
        F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("rep"),
        "iid", "wx", "wy", "w", "h",
    ).select((F.col("iid") * amplify + F.col("rep")).alias("iid"),
             # shift replicas so every donut is distinct geometry
             (F.col("wx") + F.col("rep") * 7).alias("wx"),
             "wy", "w", "h").repartition(max(4 * cores, 16))
    amp.persist().count()  # warm: JVM, parquet, cache (excluded)

    x0, y0 = F.col("wx").cast("long"), F.col("wy").cast("long")
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    qw, qh = w / 4, h / 4
    hx0, hy0 = (x0 + qw).cast("long"), (y0 + qh).cast("long")
    hx1, hy1 = (x0 + 3 * qw).cast("long"), (y0 + 3 * qh).cast("long")
    hole = F.array(_pt(hx0, hy0), _pt(hx0, hy1), _pt(hx1, hy1),
                   _pt(hx1, hy0), _pt(hx0, hy0))
    feats = amp.select(
        F.col("iid").alias("feature_id"), F.lit(3).alias("geom_type"),
        F.array(rect_ring(x0, y0, w, h), hole).alias("parts"))

    t0 = time.perf_counter()
    n = earcut.triangulate(feats).agg(
        F.sum("n_tris").alias("t"), F.count("*").alias("n")).collect()[0]
    sec = time.perf_counter() - t0
    print(json.dumps({"cores": cores, "features": int(n["n"]),
                      "tris": int(n["t"]), "sec": round(sec, 3),
                      "features_per_sec": round(n["n"] / sec, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
