"""Perceptual image hashing + image near-dup dedup (engine/imagehash.py).

Pins the measured contract: JPEG re-encode moves the blockhash
distance by at most ~12 (with the 16-band blocking EXACT for <= 15,
so every true dup is a candidate), while unrelated corpus images stay
above the default threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from vtzero_spark.engine import imagehash, jpeg
from vtzero_spark.engine.payload import encode_payload, synth_pixels

SIZES = [(16, 16), (16, 32), (16, 64), (64, 32), (256, 64)]


def _ham64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _dist(x, y) -> int:
    d = sum(_ham64(a, b) for a, b in zip(x[:4], y[:4]))
    return d + 4 * bin(x[4] ^ y[4]).count("1")


def test_phash64_deterministic_and_dc_free():
    px = synth_pixels(42, 64, 32)
    assert imagehash.phash64(px) == imagehash.phash64(px)
    # brightness-only shift leaves the DCT structure bits mostly alone
    brighter = np.clip(px.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    assert _ham64(imagehash.phash64(px), imagehash.phash64(brighter)) <= 8


def test_blockhash_requant_band_and_separation():
    """JPEG q75 re-encode: D <= 12 for every corpus size; unrelated
    pairs stay above the default threshold (the measured contract the
    module docstring states)."""
    hashes = []
    for seed in range(60):
        w, h = SIZES[seed % len(SIZES)]
        px = synth_pixels(seed * 104729 + 3, w, h)
        x = imagehash.blockhash(px)
        hashes.append(x)
        redec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=75))
        assert _dist(x, imagehash.blockhash(redec)) <= 12
    worst = min(
        _dist(hashes[i], hashes[j])
        for i in range(len(hashes)) for j in range(i + 1, len(hashes)))
    assert worst > imagehash.DEFAULT_MAX_D


def test_blockhash_cross_resolution_not_claimed():
    """The module's dup class is same-dimension re-encoding; a 2x
    re-render of the same scene lands CLOSER than a typical unrelated
    pair (structure is shared) but is not guaranteed inside the dup
    band — pinned here so the contract stays explicit."""
    ds = [
        _dist(imagehash.blockhash(synth_pixels(seed, 64, 32)),
              imagehash.blockhash(synth_pixels(seed, 128, 64)))
        for seed in range(12)
    ]
    assert sum(ds) / len(ds) < 80  # unrelated pairs center near ~128


def _corpus(spark, n: int, plant_every: int = 4):
    """n originals (+ a q75 JPEG re-encode of every plant_every-th,
    id suffixed '~d' so the original is always the min id)."""
    rows = []
    for i in range(n):
        w, h = SIZES[i % len(SIZES)]
        fmt = "jpeg" if i % 2 else "png"
        data = encode_payload(i * 31337 + 5, w, h, fmt)
        rows.append((f"img{i:06d}", data, fmt))
        if i % plant_every == 0:
            px = synth_pixels(i * 31337 + 5, w, h)
            rows.append((f"img{i:06d}~d",
                         jpeg.encode_jpeg(px, quality=75), "jpeg"))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])
    return spark.createDataFrame(pdf), n, sum(
        1 for i in range(n) if i % plant_every == 0)


def test_dedup_phash_distributed_planted(spark):
    imgs, n_orig, n_planted = _corpus(spark, 48)
    ph = imagehash.image_phash(imgs)
    assert ph.where(F.col("status") != "ok").count() == 0
    pairs = imagehash.phash_neardup_pairs(ph).toPandas()
    # every planted dup pairs with its original
    planted = {f"img{i:06d}" for i in range(48) if i % 4 == 0}
    got_pairs = set(zip(pairs["image_id"], pairs["other_id"]))
    for orig in planted:
        assert (orig, orig + "~d") in got_pairs, f"missed dup of {orig}"
    kept = imagehash.dedup_phash(imgs).select("image_id").toPandas()
    kept_ids = set(kept["image_id"])
    # all originals kept, all planted dups removed
    assert {f"img{i:06d}" for i in range(48)} <= kept_ids
    assert not any(k.endswith("~d") for k in kept_ids)
    assert len(kept_ids) == n_orig


def test_image_phash_errors_as_data(spark):
    from vtzero_spark.engine.payload import decode_payload

    good_bytes = encode_payload(7, 16, 16, "png")
    pdf = pd.DataFrame(
        [("good", good_bytes, "png"),
         ("bad", b"\xFF\xD8garbage", "jpeg")],
        columns=["image_id", "bytes", "fmt"])
    out = {r["image_id"]: r for r in imagehash.image_phash(
        spark.createDataFrame(pdf).coalesce(1)).collect()}
    assert out["good"]["status"] == "ok"
    assert out["bad"]["status"] != "ok"
    assert out["bad"]["b0"] is None
    # PRECISION pin: the good row's 63-bit hashes must be EXACT even
    # when its Arrow batch contains a NULL-hash row — a float64
    # coercion inside the UDF would silently round them past the
    # 53-bit float mantissa (the bug this test caught; readback is via
    # collect() because toPandas() itself floats nullable longs)
    want = imagehash.blockhash(decode_payload(good_bytes, "png"))
    got = tuple(out["good"][c] for c in ("b0", "b1", "b2", "b3", "ctag"))
    assert got == want


def test_phash_pairs_respect_threshold(spark):
    imgs, _, _ = _corpus(spark, 24)
    ph = imagehash.image_phash(imgs)
    with_d = imagehash.phash_neardup_pairs(ph, max_d=12).toPandas()
    assert (with_d["d"] <= 12).all()
    tight = imagehash.phash_neardup_pairs(ph, max_d=0).toPandas()
    assert (tight["d"] == 0).all()
