"""Video frame-sampling and audio feature operators (engine/media.py):
deterministic stub codecs, real distributed plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import media
from vtzero_spark.engine.payload import color_features, synth_pixels


def test_video_stub_roundtrip_and_random_access():
    buf = media.encode_video_stub(12345, 16, 8, 5, fps=30)
    w, h, n, fps = media.video_meta(buf)
    assert (w, h, n, fps) == (16, 8, 5, 30)
    for f in (0, 2, 4):
        px = media.decode_video_frame(buf, f)
        assert px.shape == (8, 16, 3)
        assert (px == synth_pixels(12345 + f, 16, 8)).all()
    with pytest.raises(ValueError):
        media.decode_video_frame(buf, 5)
    with pytest.raises(NotImplementedError):
        media.video_meta(b"REALMP4\x00" + buf)


def test_frame_sample_distributed(spark, sf_dir):
    vids = media.synth_videos(spark, sf_dir, n_videos=12)
    meta = vids.select("video_id", "n_frames").toPandas() \
        .set_index("video_id")["n_frames"]
    out = media.frame_sample(vids, n_samples=4).toPandas()
    assert (out["status"] == "ok").all()
    for vid, grp in out.groupby("video_id"):
        n = int(meta[vid])
        want = sorted({int(i) for i in np.linspace(0, n - 1, min(4, n))})
        assert grp.sort_values("frame_idx")["frame_idx"].tolist() == want
        assert (grp["ts_ms"] == grp["frame_idx"] * 1000 // 24).all()
    # features match a local recompute for one sampled frame
    r = out.iloc[0]
    vrow = vids.where(F.col("video_id") == r["video_id"]) \
        .select("bytes").first()
    px = media.decode_video_frame(vrow["bytes"], int(r["frame_idx"]))
    assert np.allclose(np.array(r["features"]), color_features(px))


def test_frame_sample_bad_payload_is_status_row(spark):
    rows = [("v0", bytearray(media.encode_video_stub(7, 8, 8, 3))),
            ("v1", bytearray(b"NOTVIDEO-----"))]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = media.frame_sample(df, n_samples=2).toPandas()
    ok = out[out["video_id"] == "v0"]
    bad = out[out["video_id"] == "v1"]
    assert (ok["status"] == "ok").all() and len(ok) == 2
    assert len(bad) == 1
    assert bad["status"].iloc[0].startswith("NotImplementedError")


def test_audio_features_match_numpy(spark, sf_dir):
    clips = media.synth_audio(spark, sf_dir, n_clips=6)
    out = media.audio_features(clips, window=1024).toPandas()
    assert (out["status"] == "ok").all()
    crow = clips.first()
    pcm, rate = media.decode_audio(crow["bytes"])
    assert rate == 16_000
    sub = out[out["clip_id"] == crow["clip_id"]].sort_values("win")
    nw = len(pcm) // 1024
    assert len(sub) == nw
    m = pcm[:nw * 1024].astype(np.float64).reshape(nw, 1024)
    want_rms = (np.sqrt((m * m).mean(axis=1)) * 1e6).astype(np.int64)
    assert (sub["rms_x1e6"].to_numpy() == want_rms).all()
    # two-tone signal: zero crossings are plentiful and window-stable
    assert (sub["zero_crossings"] > 10).all()
