"""Image payload codec tests (PNG real, JPEG stub) + PSNR gate."""

import numpy as np
import pytest

from vtzero_spark.engine.payload import (
    decode_jpeg_stub,
    decode_payload,
    decode_png,
    encode_jpeg_stub,
    encode_payload,
    encode_png,
    psnr,
    synth_pixels,
)


def test_synth_pixels_deterministic():
    a = synth_pixels(123456789, 32, 16)
    b = synth_pixels(123456789, 32, 16)
    assert a.shape == (16, 32, 3)
    assert np.array_equal(a, b)
    c = synth_pixels(123456790, 32, 16)
    assert not np.array_equal(a, c)


def test_png_roundtrip_lossless():
    px = synth_pixels(42, 64, 64)
    data = encode_png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(data)
    assert np.array_equal(px, out)
    assert psnr(px, out) == 99.0


def test_jpeg_stub_lossy_psnr_above_40():
    px = synth_pixels(7, 256, 64)
    data = encode_jpeg_stub(px)
    out = decode_jpeg_stub(data)
    p = psnr(px, out)
    assert 40.0 <= p < 99.0  # lossy but above the input_hint gate


def test_encode_payload_dispatch():
    assert decode_payload(encode_payload(1, 16, 16, "png"), "png").shape == (16, 16, 3)
    assert decode_payload(encode_payload(1, 16, 16, "jpeg"), "jpeg").shape == (16, 16, 3)
    with pytest.raises(ValueError):
        encode_payload(1, 16, 16, "webp")
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "webp")


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
