"""Real media containers (engine/wav.py RIFF/WAVE PCM, engine/avi.py
Motion-JPEG AVI) and their dispatch through the media operators.

The round-5 upgrade: video/audio payloads are no longer stub-only —
even phashes in the synth tables are honest WAV / MJPEG-AVI bytes, and
the operators must treat real, stub, and foreign containers uniformly
(decode, decode, status-row)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtzero_spark.engine import avi, media, wav
from vtzero_spark.engine.jpeg import encode_jpeg
from vtzero_spark.engine.payload import synth_pixels


# ------------------------------------------------------------------ WAV

def test_wav_roundtrip_mono_exact():
    pcm = media.synth_pcm(424242, 4321)
    buf = wav.encode_wav(pcm, 16_000)
    assert wav.is_wav(buf)
    out, rate = wav.decode_wav(buf)
    assert rate == 16_000
    assert out.dtype == np.int16 and out.shape == (4321,)
    assert (out == pcm).all()


def test_wav_roundtrip_stereo_exact():
    a = media.synth_pcm(7, 1000)
    st = np.stack([a, a[::-1]], axis=1)
    out, rate = wav.decode_wav(wav.encode_wav(st, 44_100))
    assert rate == 44_100 and out.shape == (1000, 2)
    assert (out == st).all()


def test_wav_8bit_pcm_decodes():
    # hand-built 8-bit unsigned PCM file: 0..255 ramp
    u = bytes(range(256))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(u)) + u)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = wav.decode_wav(buf)
    assert rate == 8000
    want = (np.arange(256, dtype=np.int16) - 128) << 8
    assert (out == want).all()


def test_wav_skips_foreign_chunks_any_order():
    """Real writers put LIST/INFO chunks before or after data and the
    spec allows any chunk order; the decoder must walk, not assume."""
    pcm = media.synth_pcm(3, 100)
    canonical = wav.encode_wav(pcm, 16_000)
    fmt_chunk = canonical[12:12 + 8 + 16]
    data_chunk = canonical[12 + 8 + 16:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    body = b"WAVE" + junk + data_chunk + fmt_chunk  # data BEFORE fmt
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = wav.decode_wav(buf)
    assert rate == 16_000 and (out == pcm).all()


def test_wav_corrupt_and_unimplemented_contract():
    pcm = media.synth_pcm(5, 64)
    buf = bytearray(wav.encode_wav(pcm, 16_000))
    with pytest.raises(ValueError):
        wav.decode_wav(bytes(buf[:30]))  # truncated mid-chunk
    with pytest.raises(ValueError):
        wav.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # no chunks
    float_fmt = struct.pack("<HHIIHH", 3, 1, 16_000, 64_000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + float_fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        wav.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# ------------------------------------------------------------------ AVI

def _frames(seed: int, n: int, w: int = 48, h: int = 32):
    return [synth_pixels(seed + f, w, h) for f in range(n)]


def test_avi_meta_and_random_access_psnr():
    frames = _frames(900, 6)
    buf = avi.encode_frames(frames, fps=30, quality=92)
    assert avi.is_avi(buf)
    assert avi.avi_meta(buf) == (48, 32, 6, 30)
    for i in (0, 3, 5):
        px = avi.decode_avi_frame(buf, i)
        assert px.shape == (32, 48, 3)
        mse = ((px.astype(np.float64) - frames[i]) ** 2).mean()
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr >= 40.0, (i, psnr)
    with pytest.raises(ValueError):
        avi.decode_avi_frame(buf, 6)


def test_avi_idx1_missing_falls_back_to_movi_scan():
    """AVIF_HASINDEX is optional; a reader must scan movi when idx1
    is absent. Strip idx1 and re-decode — identical pixels."""
    frames = _frames(17, 4)
    buf = avi.encode_frames(frames, fps=24)
    p = avi._parse(buf)
    off, ln = p["idx1"]
    stripped = bytearray(buf[:off - 8])  # drop idx1 chunk entirely
    stripped[4:8] = struct.pack("<I", len(stripped) - 8)
    out = bytes(stripped)
    assert avi._parse(out)["idx1"] is None
    for i in range(4):
        assert (avi.decode_avi_frame(out, i)
                == avi.decode_avi_frame(buf, i)).all()


def test_avi_corrupt_and_unimplemented_contract():
    frames = _frames(5, 2)
    buf = bytearray(avi.encode_frames(frames))
    with pytest.raises(ValueError):
        avi.avi_meta(bytes(buf[:40]))  # truncated header walk
    # non-MJPG handler in strh -> NotImplementedError
    h = bytes(buf).find(b"MJPG", 0)
    other = bytes(buf[:h]) + b"H264" + bytes(buf[h + 4:])
    with pytest.raises(NotImplementedError):
        avi.avi_meta(other)


def test_avi_frames_are_plain_jpegs():
    """Frame chunks must be standalone baseline JPEGs — the property
    that makes every frame independently decodable (the distributed
    sampling contract)."""
    jpgs = [encode_jpeg(f, quality=90) for f in _frames(33, 3)]
    buf = avi.encode_mjpeg_avi(jpgs, 48, 32, fps=24)
    p = avi._parse(buf)
    table = avi._frame_table(buf, p)
    assert len(table) == 3
    for (off, ln), jb in zip(table, jpgs):
        assert bytes(buf[off:off + ln]) == jb


# ------------------------------------------------ operator integration

def test_media_dispatch_video(spark, sf_dir):
    """synth_videos mixes real MJPEG-AVI (even phashes) and stub
    containers; frame_sample must decode BOTH with ok status and
    matching per-frame features."""
    vids = media.synth_videos(spark, sf_dir, n_videos=64)
    n_vids = vids.count()
    fmts = {r["fmt"] for r in vids.select("fmt").distinct().collect()}
    assert fmts == {"mjpeg-avi", "vidstub"}
    out = media.frame_sample(vids, n_samples=3).toPandas()
    assert (out["status"] == "ok").all()
    assert out["video_id"].nunique() == n_vids


def test_media_dispatch_audio_same_windows_both_containers(spark, sf_dir):
    """Both audio containers carry the same waveform, so per-window
    features must be identical across the container split for the
    same seed; and real-WAV clips must decode at all."""
    clips = media.synth_audio(spark, sf_dir, n_clips=64)
    n_clips = clips.count()
    fmts = {r["fmt"] for r in clips.select("fmt").distinct().collect()}
    assert fmts == {"wav", "audstub"}
    out = media.audio_features(clips, window=1024).toPandas()
    assert (out["status"] == "ok").all()
    # every clip produced windows
    assert out["clip_id"].nunique() == n_clips
    # cross-container determinism: a real-WAV clip's decoded samples
    # must equal the shared waveform synth for its seed, exactly
    from vtzero_spark.engine import synth

    row = clips.where("fmt = 'wav'").select("clip_id", "bytes").first()
    iid = int(row["clip_id"][3:])
    seed = int(synth.images(spark, sf_dir).where(f"iid = {iid}")
               .select("phash").first()["phash"])
    pcm_wav, rate = media.decode_audio(row["bytes"])
    assert rate == 16_000 and pcm_wav.dtype == np.int16
    want = media.synth_pcm(seed, len(pcm_wav))
    assert (pcm_wav == want).all()
