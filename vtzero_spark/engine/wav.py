"""Real RIFF/WAVE PCM codec (public Microsoft/IBM RIFF spec, 1991;
the multimedia-registration numbers are in RFC 2361).

This replaces the AUDSTUB container as the REAL audio path of the
multimodal pipeline: `media.decode_audio` dispatches RIFF/WAVE bytes
here, so `audio_features` / the `audio_windows` query run over actual
WAV files, not a private stand-in.  Pure stdlib ``struct`` + numpy —
no media libraries in the container, none needed: PCM WAV is a
header + raw interleaved samples.

Contract (mirrors engine/jpeg.py's): malformed/truncated bytes raise
``ValueError``; well-formed WAVs whose sample format this decoder
does not implement (IEEE float, ADPCM, extensible) raise
``NotImplementedError`` — operators surface both as status rows.

Reference parity note: vtzero has no audio surface; this module is
brief-side (multimodal columns over opaque binary payloads).
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """int16 samples -> canonical 16-bit PCM WAV bytes.

    ``pcm`` is (n,) mono or (n, ch) interleaved-on-write; little-endian
    throughout, chunks word-aligned per the RIFF rule (data is always
    even-sized at 16 bits, so no pad byte in practice)."""
    a = np.asarray(pcm)
    if a.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[1] < 1:
        raise ValueError(f"bad sample shape {a.shape}")
    n, ch = a.shape
    block_align = ch * 2
    data = a.astype("<i2").tobytes()  # row-major == interleaved frames
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, rate,
                      rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) walking word-aligned
    RIFF sub-chunks; truncation raises ValueError."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("corrupt WAV: truncated chunk header")
        cc = bytes(data[pos:pos + 4])
        (ln,) = struct.unpack("<I", bytes(data[pos + 4:pos + 8]))
        if pos + 8 + ln > end:
            raise ValueError(f"corrupt WAV: chunk {cc!r} overruns file")
        yield cc, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, rate).  Mono returns shape (n,);
    multi-channel returns (n, ch).  8-bit PCM (unsigned per spec) is
    widened to int16; any other sample format raises
    NotImplementedError.  Chunk order is free and unknown chunks
    (LIST/INFO/fact/...) are skipped, as real WAV writers require."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    if len(data) < 12:
        raise ValueError("corrupt WAV: truncated RIFF header")
    (riff_len,) = struct.unpack("<I", bytes(data[4:8]))
    end = min(len(data), 8 + riff_len)
    fmt = None
    pcm_raw = None
    for cc, off, ln in _chunks(data, 12, end):
        if cc == b"fmt " and fmt is None:
            if ln < 16:
                raise ValueError("corrupt WAV: fmt chunk under 16 bytes")
            fmt = struct.unpack("<HHIIHH", bytes(data[off:off + 16]))
        elif cc == b"data" and pcm_raw is None:
            pcm_raw = bytes(data[off:off + ln])
    if fmt is None:
        raise ValueError("corrupt WAV: no fmt chunk")
    if pcm_raw is None:
        raise ValueError("corrupt WAV: no data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if ch < 1:
        raise ValueError("corrupt WAV: zero channels")
    if audio_format in (_FMT_IEEE_FLOAT, _FMT_EXTENSIBLE):
        raise NotImplementedError(
            f"WAV sample format {audio_format:#x} not implemented here "
            "(PCM 8/16-bit only)")
    if audio_format != _FMT_PCM:
        raise NotImplementedError(
            f"non-PCM WAV format tag {audio_format} not implemented")
    if bits == 16:
        frame = ch * 2
        n = len(pcm_raw) // frame
        a = np.frombuffer(pcm_raw[:n * frame], dtype="<i2")
        a = a.reshape(n, ch).astype(np.int16)
    elif bits == 8:
        # 8-bit PCM is UNSIGNED (RIFF spec); widen to int16 full-scale
        n = len(pcm_raw) // ch
        u = np.frombuffer(pcm_raw[:n * ch], dtype=np.uint8)
        a = ((u.astype(np.int16) - 128) << 8).reshape(n, ch)
    else:
        raise NotImplementedError(f"{bits}-bit PCM WAV not implemented")
    return (a[:, 0] if ch == 1 else a), int(rate)
