"""Real Motion-JPEG AVI container (public Microsoft RIFF-AVI spec,
"AVI RIFF File Reference"; fourcc registrations in RFC 2361).

This replaces the VIDSTUB container as the REAL video path of the
multimodal pipeline: frames are honest baseline JPEGs produced and
consumed by our own ITU-T T.81 codec (engine/jpeg.py), wrapped in a
spec-shaped AVI (hdrl: avih + strl[strh 'vids'/'MJPG' + strf
BITMAPINFOHEADER], movi: '00dc' chunks, idx1 index).  Random frame
access reads idx1 and decodes ONE '00dc' chunk — the keyframe-seek
shape real demuxers have and the distributed frame sampler needs:
every MJPEG frame is independently decodable, so a 100 TB frame-
sampling job touches O(samples) bytes per clip, not O(clip).

Contract (mirrors engine/jpeg.py's): malformed/truncated bytes raise
``ValueError``; well-formed AVIs whose stream this demuxer does not
implement (non-MJPG video handlers) raise ``NotImplementedError`` —
operators surface both as status rows.  If idx1 is absent (legal:
AVIF_HASINDEX unset), frame lookup falls back to a sequential movi
scan, as the spec requires of readers.

Reference parity note: vtzero has no video surface; this module is
brief-side (multimodal columns over opaque binary payloads).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010
_USEC = 1_000_000


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(frames: list[bytes], w: int, h: int,
                     fps: int = 24) -> bytes:
    """JPEG frame streams -> AVI bytes (one 'vids'/'MJPG' stream,
    idx1 present, AVIF_HASINDEX set).  Frames are stored as given —
    the caller encodes them with jpeg.encode_jpeg, so fidelity knobs
    (quality, subsampling, restarts) stay the JPEG codec's."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    if fps <= 0:
        raise ValueError(f"bad fps {fps}")
    n = len(frames)
    max_len = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I",
        _USEC // fps,           # dwMicroSecPerFrame
        max_len * fps,          # dwMaxBytesPerSec (upper bound)
        0,                      # dwPaddingGranularity
        _AVIF_HASINDEX,         # dwFlags
        n,                      # dwTotalFrames
        0,                      # dwInitialFrames
        1,                      # dwStreams
        max_len,                # dwSuggestedBufferSize
        w, h) + b"\x00" * 16    # 4 reserved DWORDs
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                          1,        # dwScale
                          fps,      # dwRate (rate/scale = fps)
                          0,        # dwStart
                          n,        # dwLength (frames)
                          max_len,  # dwSuggestedBufferSize
                          0xFFFFFFFF,  # dwQuality (default)
                          0)        # dwSampleSize (0: varying)
            + struct.pack("<4H", 0, 0, w, h))  # rcFrame
    strf = struct.pack("<IiiHH4sIiiII",
                       40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    # movi: chunk offsets in idx1 are relative to the position of the
    # 'movi' fourcc (the dominant writer convention; our reader also
    # accepts absolute offsets, see _resolve_idx_base)
    movi_payload = b"movi"
    idx_entries = []
    for fb in frames:
        idx_entries.append((len(movi_payload), len(fb)))
        movi_payload += _chunk(b"00dc", fb)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, ln)
        for off, ln in idx_entries)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"AVI "


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, payload_len)
    over word-aligned chunks; truncation raises ValueError."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("corrupt AVI: truncated chunk header")
        cc = bytes(data[pos:pos + 4])
        (ln,) = struct.unpack("<I", bytes(data[pos + 4:pos + 8]))
        if pos + 8 + ln > end:
            raise ValueError(f"corrupt AVI: chunk {cc!r} overruns file")
        if cc == b"LIST":
            if ln < 4:
                raise ValueError("corrupt AVI: LIST under 4 bytes")
            yield cc, bytes(data[pos + 8:pos + 12]), pos + 12, ln - 4
        else:
            yield cc, None, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def _parse(data: bytes) -> dict:
    """One header pass: avih/strh/strf fields, movi span, idx1 span.
    Nothing frame-sized is touched."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    (riff_len,) = struct.unpack("<I", bytes(data[4:8]))
    end = min(len(data), 8 + riff_len)
    p: dict = {"movi": None, "idx1": None, "avih": None,
               "strh": None, "strf": None}
    for cc, lt, off, ln in _walk(data, 12, end):
        if cc == b"LIST" and lt == b"hdrl":
            for c2, l2, o2, n2 in _walk(data, off, off + ln):
                if c2 == b"avih":
                    if n2 < 40:
                        raise ValueError("corrupt AVI: short avih")
                    p["avih"] = struct.unpack(
                        "<10I", bytes(data[o2:o2 + 40]))
                elif c2 == b"LIST" and l2 == b"strl" and p["strh"] is None:
                    for c3, _l3, o3, n3 in _walk(data, o2, o2 + n2):
                        if c3 == b"strh":
                            if n3 < 48:
                                raise ValueError("corrupt AVI: short strh")
                            p["strh"] = (bytes(data[o3:o3 + 4]),
                                         bytes(data[o3 + 4:o3 + 8]),
                                         struct.unpack(
                                             "<IHHIIIIIIII",
                                             bytes(data[o3 + 8:o3 + 48])))
                        elif c3 == b"strf":
                            p["strf"] = (o3, n3)
        elif cc == b"LIST" and lt == b"movi":
            # span includes the fourcc position for idx1-relative offsets
            p["movi"] = (off - 4, off + ln)
        elif cc == b"idx1":
            p["idx1"] = (off, ln)
    if p["avih"] is None or p["strh"] is None:
        raise ValueError("corrupt AVI: missing avih/strh")
    if p["movi"] is None:
        raise ValueError("corrupt AVI: missing movi list")
    fcc_type, fcc_handler, _ = p["strh"]
    if fcc_type != b"vids":
        raise NotImplementedError(
            f"AVI stream type {fcc_type!r} not implemented (vids only)")
    if fcc_handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video handler {fcc_handler!r} not implemented "
            "(Motion-JPEG only)")
    return p


def avi_meta(data: bytes) -> tuple[int, int, int, int]:
    """(w, h, n_frames, fps) from the headers without touching frames."""
    p = _parse(data)
    usec, _, _, _, n_frames, _, _, _, w, h = p["avih"]
    _, _, sh = p["strh"]
    scale, rate = sh[4], sh[5]
    fps = (rate // scale) if scale else (_USEC // usec if usec else 0)
    return int(w), int(h), int(n_frames), int(fps)


def _frame_table(data: bytes, p: dict) -> list[tuple[int, int]]:
    """[(payload_off, payload_len)] per video frame — from idx1 when
    present (O(1)-per-frame seek), else a sequential movi scan."""
    movi_start, movi_end = p["movi"]
    if p["idx1"] is not None:
        off, ln = p["idx1"]
        out = []
        base = movi_start  # offsets relative to the 'movi' fourcc
        for e in range(off, off + ln - 15, 16):
            ckid = bytes(data[e:e + 4])
            _flags, coff, clen = struct.unpack(
                "<III", bytes(data[e + 4:e + 16]))
            if ckid[2:4] not in (b"dc", b"db"):
                continue  # non-video entries (audio, rec lists)
            pos = base + coff
            if not (bytes(data[pos:pos + 4]) == ckid):
                # some writers store absolute file offsets instead
                pos = coff
                if bytes(data[pos:pos + 4]) != ckid:
                    raise ValueError("corrupt AVI: idx1 offset points "
                                     "at no chunk header")
            out.append((pos + 8, clen))
        if out:
            return out
    out = []
    for cc, _lt, off, ln in _walk(data, movi_start + 4, movi_end):
        if cc[2:4] in (b"dc", b"db"):
            out.append((off, ln))
    return out


def decode_avi_frame(data: bytes, idx: int) -> np.ndarray:
    """Random-access single-frame decode -> uint8 RGB (h, w, 3); only
    the requested frame's JPEG bytes leave the container."""
    p = _parse(data)
    table = _frame_table(data, p)
    if not 0 <= idx < len(table):
        raise ValueError(f"frame {idx} out of range 0..{len(table) - 1}")
    off, ln = table[idx]
    return decode_jpeg(bytes(data[off:off + ln]))


def encode_frames(pixel_frames: list[np.ndarray], fps: int = 24,
                  quality: int = 90, subsampling: str = "444") -> bytes:
    """Convenience: RGB arrays -> MJPEG AVI via our JPEG encoder."""
    if not pixel_frames:
        raise ValueError("AVI needs at least one frame")
    h, w = pixel_frames[0].shape[:2]
    jpgs = [encode_jpeg(f, quality=quality, subsampling=subsampling)
            for f in pixel_frames]
    return encode_mjpeg_avi(jpgs, w, h, fps)
