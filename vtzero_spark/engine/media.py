"""Video / audio payload operators — the remaining multimodal columns
of the training-data pipeline (images live in engine/payload.py).

Payloads are opaque BINARY columns with typed metadata.  Round 5 made
both container paths REAL: video dispatches RIFF/AVI bytes to the
Motion-JPEG demuxer (engine/avi.py, frames decoded by our own ITU-T
T.81 codec) and audio dispatches RIFF/WAVE bytes to the PCM WAV codec
(engine/wav.py).  The original deterministic stand-ins (VIDSTUB zlib
frame blocks / AUDSTUB synthesized PCM) remain as a second container
per modality, so every operator is exercised against BOTH a real and
a foreign container — an unknown codec tag still raises
NotImplementedError, which the operators surface as a status row.
The Spark-side plumbing — binary in, frame-exploded rows out, Arrow
batch shapes, vectorized per-window math — is identical either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import avi as avimod
from . import synth
from . import wav as wavmod
from .payload import synth_pixels, thumbnail, color_features

_VID_MAGIC = b"VIDSTUB1"
_AUD_MAGIC = b"AUDSTUB1"


# ------------------------------------------------------------- video stub

def encode_video_stub(seed: int, w: int, h: int, n_frames: int,
                      fps: int = 24) -> bytes:
    """STUB video container: header + one zlib block per frame of
    deterministic RGB pixels (frame f uses seed+f). NOT a real codec —
    swap a real demuxer/decoder behind decode_video_frame()."""
    parts = [_VID_MAGIC, struct.pack(">IIII", w, h, n_frames, fps)]
    for f in range(n_frames):
        raw = synth_pixels(seed + f, w, h).tobytes()
        blk = zlib.compress(raw, 1)
        parts.append(struct.pack(">I", len(blk)))
        parts.append(blk)
    return b"".join(parts)


def video_meta(data: bytes) -> tuple[int, int, int, int]:
    """(w, h, n_frames, fps) from the header without decoding frames.
    Dispatch: RIFF/AVI -> the real MJPEG demuxer; VIDSTUB -> stub;
    anything else -> NotImplementedError (status row upstream)."""
    if avimod.is_avi(data):
        return avimod.avi_meta(data)
    if bytes(data[:8]) != _VID_MAGIC:
        raise NotImplementedError(
            "video demuxer for this container not available here")
    return struct.unpack(">IIII", bytes(data[8:24]))


def _video_frame_offsets(data: bytes) -> list[tuple[int, int]]:
    w, h, n, _ = video_meta(data)
    offs = []
    pos = 24
    for _ in range(n):
        (ln,) = struct.unpack(">I", bytes(data[pos:pos + 4]))
        offs.append((pos + 4, ln))
        pos += 4 + ln
    return offs


def decode_video_frame(data: bytes, idx: int) -> np.ndarray:
    """Random-access single-frame decode (seek-to-keyframe shape):
    only the requested frame's block leaves the container.  RIFF/AVI
    payloads seek via idx1 and decode ONE real JPEG; the stub seeks
    its offset table and inflates one zlib block."""
    if avimod.is_avi(data):
        return avimod.decode_avi_frame(data, idx)
    w, h, n, _ = video_meta(data)
    if not 0 <= idx < n:
        raise ValueError(f"frame {idx} out of range 0..{n - 1}")
    off, ln = _video_frame_offsets(data)[idx]
    raw = zlib.decompress(bytes(data[off:off + ln]))
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def synth_videos(spark: SparkSession, sf_dir: str,
                 n_videos: int = 64) -> DataFrame:
    """Deterministic video table derived from the images table (seed =
    phash; no external data): video_id, n_frames, w, h, fps, fmt,
    bytes.  Even phashes are REAL Motion-JPEG AVIs (frames encoded by
    engine/jpeg.py, muxed by engine/avi.py); odd phashes keep the stub
    container — phash parity because the synth iids are sparse, so a
    uniform per-row key is what guarantees a container mix."""
    img = synth.images(spark, sf_dir).where(F.col("iid") < n_videos) \
        .select("iid", "phash")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                seed = int(r.phash)
                nf = 8 + (seed % 9)  # 8..16 frames
                if seed % 2 == 0:
                    fmt = "mjpeg-avi"
                    buf = avimod.encode_frames(
                        [synth_pixels(seed + f, 48, 32)
                         for f in range(nf)], fps=24)
                else:
                    fmt = "vidstub"
                    buf = encode_video_stub(seed, 48, 32, nf)
                rows.append({
                    "video_id": f"vid{int(r.iid):08d}",
                    "n_frames": nf, "w": 48, "h": 32, "fps": 24,
                    "fmt": fmt, "bytes": buf,
                })
            yield pd.DataFrame(rows, columns=[
                "video_id", "n_frames", "w", "h", "fps", "fmt", "bytes"])

    return img.mapInPandas(gen, schema=(
        "video_id string, n_frames int, w int, h int, fps int, "
        "fmt string, bytes binary"))


def frame_sample(videos: DataFrame, n_samples: int = 4,
                 thumb: int = 8) -> DataFrame:
    """Uniform frame sampling: each video emits ``n_samples`` frames
    (evenly spaced, dedup'd for short clips) with a thumbnail and the
    12-dim color feature vector — one output row per sampled frame
    (binary in, exploded typed rows out). Undecodable payloads become
    status rows, never task failures."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    w, h, n, fps = video_meta(r.bytes)
                    idxs = sorted({int(i) for i in np.linspace(
                        0, n - 1, min(n_samples, n))})
                    for fi in idxs:
                        px = decode_video_frame(r.bytes, fi)
                        th = thumbnail(px, thumb)
                        rows.append({
                            "video_id": r.video_id, "frame_idx": fi,
                            "ts_ms": int(fi * 1000 / fps),
                            "thumb_w": th.shape[1], "thumb_h": th.shape[0],
                            "thumbnail": th.tobytes(),
                            "features": color_features(px).tolist(),
                            "status": "ok",
                        })
                except (ValueError, NotImplementedError) as e:
                    rows.append({
                        "video_id": r.video_id, "frame_idx": -1, "ts_ms": -1,
                        "thumb_w": 0, "thumb_h": 0, "thumbnail": b"",
                        "features": [],
                        "status": f"{type(e).__name__}: {e}",
                    })
            yield pd.DataFrame(rows, columns=[
                "video_id", "frame_idx", "ts_ms", "thumb_w", "thumb_h",
                "thumbnail", "features", "status"])

    return videos.select("video_id", "bytes").mapInPandas(gen, schema=(
        "video_id string, frame_idx int, ts_ms int, thumb_w int, "
        "thumb_h int, thumbnail binary, features array<double>, "
        "status string"))


# ------------------------------------------------------------- audio stub

def synth_pcm(seed: int, n_samples: int, rate: int = 16_000) -> np.ndarray:
    """Deterministic two-tone + noise int16 waveform — the shared
    signal both audio containers (real WAV / stub) carry, so decoded
    samples are container-independent."""
    t = np.arange(n_samples, dtype=np.float64)
    f1 = 110.0 + (seed % 700)
    f2 = 220.0 + ((seed >> 8) % 1400)
    rng_phase = (seed % 6283) / 1000.0
    wave = (0.5 * np.sin(2 * np.pi * f1 * t / rate + rng_phase)
            + 0.3 * np.sin(2 * np.pi * f2 * t / rate))
    noise = (((seed + 1) * (t + 7.0)) % 1.0 - 0.5) * 0.05
    return np.clip((wave + noise) * 32767.0, -32768, 32767).astype("<i2")


def encode_audio_stub(seed: int, n_samples: int, rate: int = 16_000) -> bytes:
    """STUB audio payload: header + zlib'd int16 PCM of the shared
    deterministic waveform. NOT a real codec (the real path is
    engine/wav.py)."""
    pcm = synth_pcm(seed, n_samples, rate)
    return (_AUD_MAGIC + struct.pack(">IQ", rate, n_samples)
            + zlib.compress(pcm.tobytes(), 1))


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples 1-D, rate).  Dispatch: RIFF/WAVE -> the real PCM
    codec (multi-channel returns channel 0 — the window features are
    single-channel by contract); AUDSTUB -> stub; anything else ->
    NotImplementedError (status row upstream)."""
    if wavmod.is_wav(data):
        pcm, rate = wavmod.decode_wav(data)
        return (pcm[:, 0] if pcm.ndim == 2 else pcm), rate
    if bytes(data[:8]) != _AUD_MAGIC:
        raise NotImplementedError(
            "audio decoder for this container not available here")
    rate, n = struct.unpack(">IQ", bytes(data[8:20]))
    pcm = np.frombuffer(zlib.decompress(bytes(data[20:])), dtype="<i2")
    return pcm[:n], rate


def synth_audio(spark: SparkSession, sf_dir: str,
                n_clips: int = 64) -> DataFrame:
    """Deterministic audio table derived from the images table.  Even
    phashes are REAL 16-bit PCM WAVs (engine/wav.py); odd phashes
    keep the stub container (uniform per-row key — synth iids are
    sparse).  Both carry the SAME waveform (synth_pcm), so the
    container split changes bytes, never decoded samples."""
    img = synth.images(spark, sf_dir).where(F.col("iid") < n_clips) \
        .select("iid", "phash")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                seed = int(r.phash)
                n = 8000 + (seed % 8000)
                if seed % 2 == 0:
                    fmt = "wav"
                    buf = wavmod.encode_wav(synth_pcm(seed, n), 16_000)
                else:
                    fmt = "audstub"
                    buf = encode_audio_stub(seed, n)
                rows.append({
                    "clip_id": f"aud{int(r.iid):08d}",
                    "rate": 16_000, "n_samples": n,
                    "fmt": fmt, "bytes": buf,
                })
            yield pd.DataFrame(rows, columns=[
                "clip_id", "rate", "n_samples", "fmt", "bytes"])

    return img.mapInPandas(gen, schema=(
        "clip_id string, rate int, n_samples long, fmt string, "
        "bytes binary"))


def audio_features(clips: DataFrame, window: int = 1024) -> DataFrame:
    """Per-window audio features (RMS x1e6, zero-crossing count) — one
    row per window, fully vectorized numpy per clip (reshape + axis
    reductions, no per-sample Python)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    pcm, rate = decode_audio(r.bytes)
                except (ValueError, NotImplementedError) as e:
                    rows.append({
                        "clip_id": r.clip_id, "win": -1, "rms_x1e6": -1,
                        "zero_crossings": -1,
                        "status": f"{type(e).__name__}: {e}"})
                    continue
                nw = len(pcm) // window
                if nw == 0:
                    continue
                m = pcm[:nw * window].astype(np.float64).reshape(nw, window)
                rms = np.sqrt((m * m).mean(axis=1))
                sgn = m >= 0
                zc = (sgn[:, 1:] != sgn[:, :-1]).sum(axis=1)
                for wi in range(nw):
                    rows.append({
                        "clip_id": r.clip_id, "win": wi,
                        "rms_x1e6": int(rms[wi] * 1e6),
                        "zero_crossings": int(zc[wi]),
                        "status": "ok"})
            yield pd.DataFrame(rows, columns=[
                "clip_id", "win", "rms_x1e6", "zero_crossings", "status"])

    return clips.select("clip_id", "bytes").mapInPandas(gen, schema=(
        "clip_id string, win int, rms_x1e6 long, zero_crossings long, "
        "status string"))
