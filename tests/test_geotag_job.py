"""End-to-end geotag job: Exif-only positions -> PMTiles archive,
properties round-tripped, privacy scrub verified."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import geotag_job  # noqa: E402


@pytest.fixture(scope="module")
def summary_and_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("geotag"))
    return geotag_job.run(spark, sf_dir, out, zoom=4), out


def test_job_summary(summary_and_dir):
    summary, _ = summary_and_dir
    assert summary["n_images"] > 0
    # every synthesized payload parses: no corrupt, no missing GPS
    assert summary["ingest"]["status"] == {"ok": summary["n_images"]}
    assert summary["encode"]["n_tiles"] > 0
    assert summary["pmtiles"]["n_entries"] > 0
    # the privacy leg: zero payloads still carry GPS after the scrub
    assert summary["scrub"]["payloads_with_gps_after"] == 0


def test_archive_round_trips_positions_and_props(spark, sf_dir,
                                                 summary_and_dir):
    from vtzero_spark.engine import assemble, pmtiles, synth
    from vtzero_spark.engine.synth import EXTENT

    _, out = summary_and_dir
    tiles = pmtiles.read_pmtiles(spark, f"{out}/geotag.pmtiles")
    feats = assemble.decode_tiles(tiles, properties=True)
    rows = feats.select(
        "z", "x", "y", "feature_id", "properties").collect()
    base = {
        r["iid"]: r
        for r in synth.images(spark, sf_dir)
        .select("iid", "wx", "wy").collect()
    }
    assert len(rows) == len(base)
    for r in rows:
        b = base[r.feature_id]
        assert r.x == b.wx // EXTENT and r.y == b.wy // EXTENT
        p = r.properties
        assert p["orientation"].ival == r.feature_id % 8 + 1
        assert p["dt"].sval.startswith("2024:01:")
        assert p["px_w"].ival in (16, 32, 64, 256)
