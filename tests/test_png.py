"""Full-PNG-codec tests (engine/png.py, round 5).

The decoder is exercised with FOREIGN streams this repo's encoder
cannot produce — hand-built via an independent scanline filterer in
this file (palette, sub-byte gray, forced Average/Paeth rows, Adam7
interlace, tRNS) — so decode coverage does not depend on encode
choices.  Exception contract mirrors test_jpeg.py's: decode either
returns or raises ValueError, never IndexError/struct.error."""

import struct
import zlib

import numpy as np
import pytest

from vtzero_spark.engine import png


def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _ref_filter_row(row, prior, bpp, ftype):
    """Independent (scalar, spec-literal) forward filter."""
    out = bytearray()
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0
        b = prior[x]
        c = prior[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = row[x]
        elif ftype == 1:
            v = row[x] - a
        elif ftype == 2:
            v = row[x] - b
        elif ftype == 3:
            v = row[x] - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            v = row[x] - pred
        out.append(v & 0xFF)
    return bytes(out)


def _build_png(scanlines, w, h, depth, ctype, filters, extra=b"",
               interlace=0):
    """scanlines: list of h raw byte rows; filters: per-row types."""
    body = b"".join(
        bytes([ft]) + _ref_filter_row(
            row, scanlines[i - 1] if i else bytes(len(row)),
            max(1, (depth * png._CHANNELS[ctype]) // 8), ft)
        for i, (row, ft) in enumerate(zip(scanlines, filters)))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (png.SIGNATURE + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(body, 6)) + _chunk(b"IEND", b""))


def test_all_five_filters_decode_exactly():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    rows = [img[y].tobytes() for y in range(5)]
    data = _build_png(rows, 7, 5, 8, 2, filters=[0, 1, 2, 3, 4])
    out, ctype = png.decode(data)
    assert ctype == 2 and (out == img).all()


def test_paeth_and_average_across_wide_rows():
    # wide rows so the sequential unfilter paths get real runs
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (4, 301, 4), dtype=np.uint8)
    rows = [img[y].tobytes() for y in range(4)]
    data = _build_png(rows, 301, 4, 8, 6, filters=[4, 3, 4, 3])
    out, _ = png.decode(data)
    assert (out == img).all()


def test_palette_png_resolves_to_rgb_and_rgba():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    rows = [idx[y].tobytes() for y in range(2)]
    plte = _chunk(b"PLTE", pal.tobytes())
    data = _build_png(rows, 4, 2, 8, 3, [0, 1], extra=plte)
    out, ctype = png.decode(data)
    assert ctype == 3 and out.shape == (2, 4, 3)
    assert (out == pal[idx]).all()
    # with tRNS -> RGBA, short table pads alpha=255
    trns = _chunk(b"tRNS", bytes([10, 200]))
    data = _build_png(rows, 4, 2, 8, 3, [0, 1], extra=plte + trns)
    out, _ = png.decode(data)
    assert out.shape == (2, 4, 4)
    assert (out[..., :3] == pal[idx]).all()
    assert (out[..., 3] == np.array([[10, 200, 255, 255],
                                     [255, 255, 200, 10]])).all()


def test_subbyte_gray_depths_scale_to_8bit():
    # depth 4: two pixels per byte, 0x0F -> 255, 0x08 -> 136
    rows = [bytes([0x0F, 0x80]), bytes([0x37, 0xC1])]
    data = _build_png(rows, 3, 2, 4, 0, [0, 0])  # w=3: low nibble of
    out, ctype = png.decode(data)                 # 2nd byte is padding
    assert ctype == 0 and out.shape == (2, 3, 1)
    assert (out[..., 0] == np.array(
        [[0, 15 * 17, 8 * 17], [3 * 17, 7 * 17, 12 * 17]])).all()
    # depth 1: bit-packed, left-replicated to 0/255
    rows = [bytes([0b10110000])]
    data = _build_png(rows, 4, 1, 1, 0, [0])
    out, _ = png.decode(data)
    assert (out[..., 0] == np.array([[255, 0, 255, 255]])).all()


def test_adam7_interlace_matches_progressive_layout():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (10, 9, 3), dtype=np.uint8)
    passes = []
    for (x0, y0, dx, dy) in png._ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        prior = bytes(sub.shape[1] * 3)
        for y in range(sub.shape[0]):
            row = sub[y].tobytes()
            passes.append(b"\x01" + _ref_filter_row(row, prior, 3, 1))
            prior = row
    ihdr = struct.pack(">IIBBBBB", 9, 10, 8, 2, 0, 0, 1)
    data = (png.SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(passes), 6))
            + _chunk(b"IEND", b""))
    out, _ = png.decode(data)
    assert (out == img).all()


def test_multi_idat_streams_concatenate():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    body = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    z = zlib.compress(body, 6)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    data = (png.SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", z[:5]) + _chunk(b"IDAT", z[5:])
            + _chunk(b"IEND", b""))
    out, _ = png.decode(data)
    assert (out == img).all()


def test_crc_corruption_and_truncation_raise_valueerror():
    data = png.encode(np.zeros((6, 6, 3), dtype=np.uint8))
    bad = bytearray(data)
    bad[40] ^= 0xFF  # inside IDAT payload -> CRC mismatch
    with pytest.raises(ValueError):
        png.decode(bytes(bad))
    for cut in (4, 12, 30, len(data) - 3):
        with pytest.raises(ValueError):
            png.decode(data[:cut])


def test_decoder_exception_contract_under_bitflips():
    """4000-trial bit-flip fuzz: decode returns or raises ValueError —
    the contract the jpeg decoder was held to in ADVICE r4."""
    rng = np.random.RandomState(11)
    base = png.encode(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8))
    for _ in range(4000):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(8, len(buf))] ^= 1 << rng.randint(8)
        try:
            png.decode(bytes(buf))
        except ValueError:
            pass


def test_encode_adaptive_beats_filter0_on_gradients():
    g = (np.add.outer(np.arange(128), np.arange(128)) % 256).astype(
        np.uint8)
    img = np.repeat(g[..., None], 3, axis=2)
    adaptive = png.encode(img)
    body = b"".join(b"\x00" + img[y].tobytes() for y in range(128))
    filter0 = len(zlib.compress(body, 6))
    assert len(adaptive) < filter0 // 2


def test_roundtrip_all_encoder_shapes():
    rng = np.random.RandomState(9)
    for shape, dtype in [((5, 5), np.uint8), ((5, 5, 1), np.uint8),
                         ((7, 3, 3), np.uint8), ((3, 7, 4), np.uint8),
                         ((4, 4), np.uint16), ((4, 4, 3), np.uint16),
                         ((2, 2, 4), np.uint16), ((1, 1, 3), np.uint8)]:
        hi = 256 if dtype == np.uint8 else 65536
        a = rng.randint(0, hi, shape, dtype=dtype)
        out, _ = png.decode(png.encode(a))
        exp = a if a.ndim == 3 else a[..., None]
        assert out.dtype == exp.dtype and (out == exp).all(), shape


def test_decode_rgb8_normalizations():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert (png.decode_rgb8(png.encode(g))
            == np.repeat(g[..., None], 3, axis=2)).all()
    rgba = np.dstack([g, g + 50, g + 100, np.full((4, 4), 7, np.uint8)])
    assert (png.decode_rgb8(png.encode(rgba)) == rgba[..., :3]).all()
    w16 = (np.arange(16, dtype=np.uint16).reshape(4, 4, 1)
           * 4096).astype(np.uint16)
    out = png.decode_rgb8(png.encode(np.repeat(w16, 3, axis=2)))
    assert (out == (np.repeat(w16, 3, axis=2) >> 8).astype(np.uint8)).all()


def test_legacy_filter0_payloads_still_decode():
    """Old rounds' fixtures were filter-0/RGB; byte layout unchanged."""
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    body = b"".join(b"\x00" + img[y].tobytes() for y in range(3))
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    legacy = (png.SIGNATURE + _chunk(b"IHDR", ihdr)
              + _chunk(b"IDAT", zlib.compress(body, 6))
              + _chunk(b"IEND", b""))
    from vtzero_spark.engine.payload import decode_png
    assert (decode_png(legacy) == img).all()
