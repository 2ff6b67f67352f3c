"""Perceptual image hashing + corpus-scale image near-dup dedup.

The image-side analog of SimHash for a training-data pipeline: two
images that differ only by re-encoding (JPEG quality change, PNG vs
JPEG) hash to nearly-identical fingerprints, so image dedup becomes
the same band-join + bit_count + connected-components shape as text
near-dup. Public algorithms only (pHash / blockhash family).

Two hashes:

- ``phash64`` — the classic 64-bit DCT pHash (bilinear 32x32
  luminance, 2-D DCT-II via the same orthonormal machinery as the
  baseline JPEG codec, top-left 8x8 block, bit = coef > median, DC
  excluded). Kept for API parity and cross-tool comparability;
  measured on the synthetic corpus it re-encodes at mean ~3 / max ~12
  bits but its near-zero high-index coefficients make lookalike
  collisions possible on smooth content.
- ``blockhash`` — the dedup workhorse: 256-bit 16x16-mean blockhash
  (bit = cell mean > median, packed into 4 longs) PLUS a 12-bit
  Gray-coded mean-color tag (re-encoding moves channel means <1 unit,
  so the tag is stable on true dups and splits same-structure
  different-color lookalikes). Distance D = hamming(256-bit) +
  4 * hamming(color tag). Measured at JPEG q75 re-encode: dup D mean
  3.2 / max 12; unrelated corpus pairs min D 12, zero pairs below 12
  in a 44,850-pair sample — default threshold 10 gives ~99% recall at
  zero sampled false merges.

Scale shape: one Arrow-batched decode+hash pass (the only Python
stage); candidate generation is 16-way 16-bit band blocking over the
256-bit hash — pigeonhole-EXACT for hamming <= 15, which covers the
entire measured dup band, so recall is structural, not probabilistic;
the refine is JVM bit_count over xor (no Python in the join);
clustering reuses textops.neardup_components (distributed min-label
propagation + pointer jumping). Nothing all-pairs, nothing
driver-sized.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_D = 10


def _dct_matrix_n(n: int) -> np.ndarray:
    k = np.arange(n).reshape(n, 1)
    m = np.arange(n).reshape(1, n)
    D = np.sqrt(2.0 / n) * np.cos((2 * m + 1) * k * np.pi / (2 * n))
    D[0, :] /= np.sqrt(2.0)
    return D


_DCT32 = _dct_matrix_n(32)
_BITPOS = np.arange(64, dtype=np.uint64)


def _resize32(lum: np.ndarray) -> np.ndarray:
    """Bilinear resize of a (h, w) float array to 32x32 (any h, w).

    Point-sampled bilinear, deliberately: an area-averaging (box
    prefilter) variant was measured WORSE on this corpus — requant
    distances grew (max 12 -> 14) and unrelated separation shrank
    (min 12 -> 10), because averaging pulls many 16x16 cells onto the
    median contour where the sign bit is unstable. Cross-RESOLUTION
    dup detection is not claimed by this module either way (the
    hash's dup class is re-encoding at the same dimensions)."""
    h, w = lum.shape

    def coords(n_src: int):
        c = (np.arange(32) + 0.5) * n_src / 32.0 - 0.5
        c = np.clip(c, 0.0, n_src - 1.0)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, n_src - 1)
        return lo, hi, c - lo

    ylo, yhi, fy = coords(h)
    xlo, xhi, fx = coords(w)
    top = lum[ylo][:, xlo] * (1 - fx) + lum[ylo][:, xhi] * fx
    bot = lum[yhi][:, xlo] * (1 - fx) + lum[yhi][:, xhi] * fx
    return top * (1 - fy[:, None]) + bot * fy[:, None]


def _luminance(arr: np.ndarray) -> np.ndarray:
    f = arr.astype(np.float64)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def _signed64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def phash64(arr: np.ndarray) -> int:
    """Classic 64-bit DCT perceptual hash of one uint8 RGB image,
    returned as a SIGNED 64-bit int (Spark long semantics)."""
    small = _resize32(_luminance(arr))
    coef = (_DCT32 @ small @ _DCT32.T)[:8, :8].ravel()
    med = np.median(coef[1:])
    bits = (coef > med).astype(np.uint64)
    bits[0] = 0  # DC carries only global brightness
    return _signed64(int((bits << _BITPOS).sum(dtype=np.uint64)))


def _gray4(v: int) -> int:
    v &= 15
    return v ^ (v >> 1)


def blockhash(arr: np.ndarray) -> tuple[int, int, int, int, int]:
    """(b0, b1, b2, b3, ctag): 256-bit 16x16-mean blockhash as four
    signed longs (b0 = most-significant 64 bits) + the 12-bit
    Gray-coded mean-color tag."""
    s16 = _resize32(_luminance(arr)).reshape(16, 2, 16, 2) \
        .mean(axis=(1, 3)).ravel()
    med = np.median(s16)
    packed = np.packbits(s16 > med).tobytes()   # 32 bytes, big-endian
    parts = tuple(
        _signed64(int.from_bytes(packed[i:i + 8], "big"))
        for i in range(0, 32, 8))
    f = arr.astype(np.float64)
    ctag = 0
    for ch in range(3):
        ctag |= _gray4(int(f[..., ch].mean()) >> 4) << (4 * ch)
    return parts + (ctag,)


_HASH_SCHEMA = "b0 long, b1 long, b2 long, b3 long, ctag long"
_HASH_COLS = ["b0", "b1", "b2", "b3", "ctag"]


def image_phash(df: DataFrame, id_col: str = "image_id",
                passthrough: tuple[str, ...] = (),
                upright: bool = False) -> DataFrame:
    """(id, [passthrough...], bytes, fmt) -> (id, [passthrough...],
    b0..b3, ctag, phash64, status). Errors-as-data: an undecodable
    payload yields NULL hashes + the error status instead of failing
    the job (corpus discipline — a 100 TB scan always contains garbage
    rows). ``passthrough`` columns ride through verbatim (types from
    the input schema) — e.g. an event-time column for the streaming
    near-dup operator; mapInPandas is stateless so the operator also
    attaches to streaming DataFrames unchanged. ``upright=True``
    normalizes pixels to display orientation per the Exif Orientation
    tag before hashing (exif.upright_pixels), making the hash
    invariant to the whole D4 rotation/mirror group — corrupt
    metadata routes to the same errors-as-data status path."""
    from .exif import upright_pixels
    from .payload import decode_payload
    from .textops import _spread

    lead = [id_col, *passthrough]
    lead_types = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in lead)
    if not df.isStreaming:
        df = _spread(df)

    hash_cols = _HASH_COLS + ["phash64"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = lead + hash_cols + ["status"]
        for pdf in batches:
            lead_vals = [pdf[c].to_numpy() for c in lead]
            bufs = pdf["bytes"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            hvals: dict[str, list] = {c: [] for c in hash_cols}
            status = []
            for i in range(len(pdf)):
                try:
                    if upright:
                        px = upright_pixels(bytes(bufs[i]), fmts[i])
                    else:
                        px = decode_payload(bufs[i], fmts[i])
                    b0, b1, b2, b3, ctag = blockhash(px)
                    for c, v in zip(hash_cols,
                                    (b0, b1, b2, b3, ctag, phash64(px))):
                        hvals[c].append(v)
                    status.append("ok")
                except (ValueError, NotImplementedError) as e:
                    for c in hash_cols:
                        hvals[c].append(None)
                    status.append(f"{type(e).__name__}: {e}")
            out = {c: lead_vals[j] for j, c in enumerate(lead)}
            # CRITICAL: nullable Int64, NOT a dict->DataFrame object
            # column — with any None in the batch, pandas would coerce
            # these to float64 and silently ROUND 63-bit hashes past
            # the 53-bit float mantissa, corrupting every OTHER row's
            # hash in the batch (one garbage payload would break its
            # neighbors' dedup)
            for c in hash_cols:
                out[c] = pd.array(hvals[c], dtype="Int64")
            out["status"] = status
            yield pd.DataFrame(out, columns=cols)

    return df.select(*lead, "bytes", "fmt").mapInPandas(
        gen, schema=(f"{lead_types}, {_HASH_SCHEMA}, "
                     "phash64 long, status string"))


def _distance_expr():
    d = None
    for col in ("b0", "b1", "b2", "b3"):
        t = F.bit_count(F.col(f"a_{col}").bitwiseXOR(F.col(f"b_{col}")))
        d = t if d is None else d + t
    return d + F.bit_count(
        F.col("a_ctag").bitwiseXOR(F.col("b_ctag"))) * 4


def phash_neardup_pairs(ph: DataFrame, max_d: int = DEFAULT_MAX_D,
                        id_col: str = "image_id") -> DataFrame:
    """Near-dup image pairs by blockhash distance. Candidates from
    16-way 16-bit band blocking over the 256-bit hash — pigeonhole:
    hamming <= 15 guarantees a shared band, and max_d <= 15 implies
    hash hamming <= 15, so candidate recall is EXACT for any
    max_d <= 15 (the default 10 included). Refine is JVM bit_count
    over xor. Input: image_phash output (NULL hashes dropped)."""
    good = ph.where(F.col("b0").isNotNull())
    bands = good.select(
        id_col, *_HASH_COLS,
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr("shiftrightunsigned("
               "  element_at(array(b0, b1, b2, b3),"
               "             cast(band div 4 as int) + 1),"
               "  cast((band % 4) * 16 as int)) & 65535"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias(id_col),
            F.col(f"b.{id_col}").alias("other_id"),
            *[F.col(f"a.{c}").alias(f"a_{c}") for c in _HASH_COLS],
            *[F.col(f"b.{c}").alias(f"b_{c}") for c in _HASH_COLS],
        )
        .dropDuplicates([id_col, "other_id"])
    )
    return (
        cand.withColumn("d", _distance_expr())
        .where(F.col("d") <= max_d)
        .select(id_col, "other_id", "d")
    )


# 5-way banding of the 64-bit DCT pHash: widths 13,13,13,13,12.
# Pigeonhole: hamming <= 4 guarantees one clean band.
_MR_OFFS = (0, 13, 26, 39, 52)
_MR_BITS = (13, 13, 13, 13, 12)


def multires_neardup_pairs(ph: DataFrame, max_d: int = 6,
                           id_col: str = "image_id") -> DataFrame:
    """CROSS-RESOLUTION near-dup pairs over the 64-bit DCT pHash —
    the tier covering what the 256-bit blockhash measurably misses.
    Measured division of labor (pinned in test_imagehash): box 2x
    thumbnails are NOT a blockhash gap (16x16 cell means are invariant
    under box downsampling; >=90% blockhash-covered) — the r4 "gap"
    was re-renders, not resamples. The real blockhash tail is DEEP
    downsamples (box 4x: D to 14, ~10% past threshold) and NON-BOX
    resamplers (nearest-neighbor 2x: D to 22, ~30% past); the DCT
    pHash catches 100% of both at hamming <= 6 because the 32x32
    downsample + low-frequency DCT discards exactly what those
    resamplers perturb. Unrelated pairs: >= 18 on 64x64 content,
    from 10 on small non-square images — max_d=6 keeps false-merge
    margin everywhere at the cost of a small-image 7-8 tail (recall
    floors pinned in tests).

    Candidates: 5-way banding (13/13/13/13/12 bits) — pigeonhole-EXACT
    for hamming <= 4; pairs at 5..6 need one clean band out of five
    (measured recall pinned in tests, not claimed structural). Refine
    is JVM bit_count over xor.

    Scale note: a 64-bit hash carries less entropy than the 256-bit
    blockhash, so 13-bit band buckets run HOTTER (corpus/8k rows per
    bucket per band). Run this tier after exact + same-resolution
    dedup has shrunk the corpus, and leave AQE skew-join on (the
    engine default) for the residual hot buckets."""
    good = ph.where(F.col("phash64").isNotNull())
    bands = good.select(
        id_col, "phash64",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftrightunsigned(phash64,"
               f" element_at(array{_MR_OFFS}, band + 1))"
               f" & (shiftleft(1L,"
               f" element_at(array{_MR_BITS}, band + 1)) - 1)"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias(id_col),
            F.col(f"b.{id_col}").alias("other_id"),
            F.col("a.phash64").alias("a_p"),
            F.col("b.phash64").alias("b_p"),
        )
        .dropDuplicates([id_col, "other_id"])
    )
    return (
        cand.withColumn(
            "d", F.bit_count(F.col("a_p").bitwiseXOR(F.col("b_p"))))
        .where(F.col("d") <= max_d)
        .select(id_col, "other_id", "d")
    )


def dedup_phash_multires(images: DataFrame,
                         max_d: int = DEFAULT_MAX_D,
                         max_d_mr: int = 6,
                         id_col: str = "image_id") -> DataFrame:
    """Two-tier perceptual dedup: same-resolution re-encode pairs from
    the 256-bit blockhash tier UNION cross-resolution pairs from the
    64-bit pHash tier, one connected-components pass over the merged
    edge list, min-id representative kept. One decode+hash pass (the
    hash table carries both hashes)."""
    from .textops import neardup_components

    ph = image_phash(images, id_col=id_col).persist()
    try:
        pairs = phash_neardup_pairs(ph, max_d, id_col=id_col) \
            .unionByName(
                multires_neardup_pairs(ph, max_d_mr, id_col=id_col))
        comp = neardup_components(pairs, a_col=id_col, b_col="other_id")
        losers = comp.where(F.col("component") != F.col("doc_id")) \
            .select(F.col("doc_id").alias(id_col))
        return images.join(losers, id_col, "left_anti")
    finally:
        ph.unpersist(blocking=False)


def dedup_phash(images: DataFrame, max_d: int = DEFAULT_MAX_D,
                id_col: str = "image_id") -> DataFrame:
    """Corpus image dedup: keep ONE representative (min id) per
    connected component of the perceptual near-dup graph; images in no
    pair survive untouched. decode+hash -> band pairs -> components ->
    anti-join — the image twin of textops.dedup_neardup."""
    from .textops import neardup_components

    # persist the (small: 6 longs/row) hash table — the decode+hash
    # pass over the binary payloads must run ONCE, not once per side
    # of the band self-join and once per component round
    ph = image_phash(images, id_col=id_col).persist()
    try:
        pairs = phash_neardup_pairs(ph, max_d, id_col=id_col)
        # neardup_components materializes its edge list eagerly
        # (localCheckpoint), after which ph is no longer needed
        comp = neardup_components(pairs, a_col=id_col, b_col="other_id")
        losers = comp.where(F.col("component") != F.col("doc_id")) \
            .select(F.col("doc_id").alias(id_col))
        return images.join(losers, id_col, "left_anti")
    finally:
        ph.unpersist(blocking=False)
