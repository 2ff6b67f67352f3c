"""Image payload handling: synth, encode/decode, PSNR verification.

Per BASELINE.json input_hint, every decoded payload must satisfy pixel
allclose (PSNR >= 40 dB for lossy formats) and exact caption equality
versus the reference. The container has no image libraries, so both
codecs are implemented here from public specs:

- "png" is a REAL minimal PNG codec (stdlib zlib, 8-bit RGB, filter 0)
  — lossless, so decoded pixels are exact;
- "jpeg" is a REAL baseline JPEG codec (engine/jpeg.py: ITU-T T.81
  sequential DCT, Annex K tables, JFIF 4:4:4, canonical Huffman) at
  quality 90 — PSNR 43+ dB on the synthetic corpus, ~10:1 compression,
  so the >=40 dB gate exercises an actual transform codec. The
  rounds-1..3 quantize+zlib stand-in remains as encode_jpeg_stub /
  decode_jpeg_stub (legacy fixtures only; no fmt routes to it).

Pixels are synthesized deterministically from (phash, w, h) — no
external data. The field is smooth (low-frequency cosines + faint
dither): full-spectrum noise is unverifiable through ANY real lossy
transform codec (measured 26-36 dB at q85-95), so photographic-like
content is a correctness requirement of the gate, not a convenience.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from . import png as pngcodec


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit RGB truecolor PNG via the full adaptive-filter codec
    (engine/png.py; round 5 — was filter-0-only).  Same signature and
    sig bytes; old filter-0 payloads remain decodable (subset)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return pngcodec.encode(arr)


def decode_png(data: bytes) -> np.ndarray:
    """Decode any supported PNG to (h, w, 3) uint8 RGB — all five
    filters, gray/palette/alpha/16-bit normalized by
    engine/png.decode_rgb8; ValueError on malformed streams."""
    return pngcodec.decode_rgb8(data)


_JPEG_STUB_MAGIC = b"JPGSTUB1"


def encode_jpeg_stub(arr: np.ndarray) -> bytes:
    """LEGACY stub lossy codec (rounds 1-3): quantize channels to
    multiples of 8 then zlib. NOT a real JPEG; no fmt routes here any
    more — fmt="jpeg" uses the real baseline codec in engine/jpeg.py.
    Kept only so old fixtures/tests remain decodable."""
    h, w, _ = arr.shape
    q = (arr.astype(np.int32) // 8 * 8 + 4).clip(0, 255).astype(np.uint8)
    return (_JPEG_STUB_MAGIC + struct.pack(">II", w, h)
            + zlib.compress(q.tobytes(), 6))


def decode_jpeg_stub(data: bytes) -> np.ndarray:
    if data[:8] != _JPEG_STUB_MAGIC:
        raise ValueError("not a jpeg-stub payload")
    w, h = struct.unpack(">II", data[8:16])
    return np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8).reshape(h, w, 3)


def synth_pixels(phash: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixels from phash: a smooth low-frequency field
    (per-channel cosine modes + gradient) plus a faint +/-2 LCG dither.

    Photographic-like spectrum by design: the rounds-1..3 white-noise
    pixels were unverifiable through any REAL transform codec (no
    quality level of an 8x8 DCT codec reaches 40 dB on full-spectrum
    noise — measured 26-36 dB at q85-95), so with the real baseline
    JPEG the input_hint PSNR gate needs content whose energy lives
    where images put it: low frequencies. Fully vectorized; still
    unique per phash (the determinism contract is unchanged)."""
    mask = (1 << 64) - 1
    a, c = 6364136223846793005, 1442695040888963407

    def p(i: int) -> int:
        return (((phash | 1) * a + i * c) & mask) >> 16

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    two_pi = 2.0 * np.pi

    # One SHARED structure field for all channels (this is the photo
    # statistic that matters: JPEG quantizes chroma far harder than
    # luma, so three independent RGB fields put full-amplitude detail
    # into Cb/Cr and sink the 40 dB gate at small sizes; real images
    # carry structure in luminance and keep chroma smooth). Per
    # channel: a distinct DC level (color) + a small low-freq delta.
    #
    # Mode design: three near-equal-amplitude incommensurate modes +
    # a mid-scale texture mode + gradient, with wavelengths
    # PROPORTIONAL to the image dimensions (0.4..1.3 x per axis):
    # every size shows 0.8-2.5 cycles of structure per mode, so (a)
    # an 8x8 perceptual summary is pattern-rich at EVERY size — a
    # fixed pixel wavelength leaves 16x16 images monotone and
    # collision-prone under perceptual hashing; (b) per-block spatial
    # frequency stays low at every size (codec-friendly); (c) the
    # same phash renders an approximately-scaled version of the same
    # scene at any resolution. Floors keep the smallest images out of
    # the harshly-quantized mid-frequency bins.
    amps = [14.0 + (p(2 + i) % 14) for i in range(3)]
    a4 = 8.0 + (p(13) % 8)

    def lam(i: int, dim: int) -> float:
        return max(10.0, dim * (0.4 + (p(5 + i) % 900) / 1000.0))

    lx = [lam(i, w) for i in (0, 2, 4)]
    ly = [lam(i, h) for i in (1, 3, 5)]
    ltx = max(9.0, w * (0.2 + (p(14) % 150) / 1000.0))
    lty = max(9.0, h * (0.2 + (p(15) % 150) / 1000.0))
    phs = [(p(16 + i) % 628) / 100.0 for i in range(4)]
    grad = (p(11) % 41) - 20.0
    shared = (
        amps[0] * np.cos(two_pi * (xx / lx[0] + yy / ly[0]) + phs[0])
        + amps[1] * np.cos(two_pi * (xx / lx[1] - yy / ly[1]) + phs[1])
        + amps[2] * np.cos(two_pi * (xx / lx[2] + yy / ly[2]) + phs[2])
        + a4 * np.cos(two_pi * (xx / ltx + yy / lty) + phs[3])
        + grad * (xx / max(w, 1) + yy / max(h, 1)) * 0.5
    )

    out = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        base = 70.0 + (p(97 * ch + 1) % 116)
        da = 3.0 + (p(97 * ch + 2) % 5)
        dlx = max(12.0, w * (0.5 + (p(97 * ch + 3) % 700) / 1000.0))
        dly = max(12.0, h * (0.5 + (p(97 * ch + 4) % 700) / 1000.0))
        dph = (p(97 * ch + 5) % 628) / 100.0
        delta = da * np.cos(two_pi * (xx / dlx + yy / dly) + dph)
        # faint dither so every pixel still depends on phash
        idx = (yy * w + xx) * 3 + ch
        x = ((np.uint64(phash | 1) * (idx.astype(np.uint64) + np.uint64(1))
              * np.uint64(a)) + np.uint64(c))
        dither = ((x >> np.uint64(33)) & np.uint64(3)).astype(np.float64) - 1.5
        out[..., ch] = np.clip(
            np.round(base + shared + delta + dither), 0, 255).astype(np.uint8)
    return out


_JPEG_QUALITY = 90  # 43+ dB worst-case on the synthetic corpus


def encode_payload(phash: int, w: int, h: int, fmt: str) -> bytes:
    from . import jpeg

    px = synth_pixels(phash, w, h)
    if fmt == "png":
        return encode_png(px)
    if fmt == "jpeg":
        return jpeg.encode_jpeg(px, quality=_JPEG_QUALITY)
    raise ValueError(f"unknown fmt {fmt}")


def decode_payload(data: bytes, fmt: str) -> np.ndarray:
    from . import jpeg

    if fmt == "png":
        return decode_png(bytes(data))
    if fmt == "jpeg":
        return jpeg.decode_jpeg(bytes(data))
    raise NotImplementedError(f"decoder for fmt={fmt} not available in this container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def decode_jpeg_distributed(spark, data: bytes,
                            band_mcu_rows: int = 4) -> np.ndarray:
    """Intra-image parallel decode of ONE restart-interval JPEG: the
    entropy segments (the inherently-serial part of JPEG decode) fan
    out as DataFrame rows, each task decodes its segments against a
    broadcast of the stream and keys the coefficient blocks by
    MCU-ROW BAND; a second stage groups by band and runs the full
    dequant + IDCT + upsample + color-convert assembly EXECUTOR-SIDE
    (jpeg._assemble_band — band assembly is byte-identical to the
    whole-image pass because every per-pixel step is band-local).
    This is the scale path for GIANT images (satellite scenes,
    stitched mosaics) where one image exceeds a single core's decode
    budget — restart markers are exactly the format feature that makes
    the split safe (byte-aligned segments, fresh DC predictors).

    Driver materialization is exactly the OUTPUT array (uint8 pixel
    strips, concatenated once): the int64 coefficient volume — 8x the
    pixels, the r4 bottleneck — now moves executor-to-executor in the
    band shuffle and never lands on the driver. A pipeline that wants
    the strips in storage instead of an array writes the stage-2
    DataFrame (band, y0, nrows, strip) to parquet and skips the
    collect entirely."""
    from . import jpeg as J
    from . import jpeg_progressive as JP

    if JP.is_progressive(data):
        # progressive scans refine each other sequentially — no
        # independent entropy segments to fan out; decode serially
        return JP.decode_progressive(data)
    p = J._parse_jpeg(data)
    nseg = len(p["segments"])
    if nseg == 1:
        return J.decode_jpeg(data)
    sc = spark.sparkContext
    bc = sc.broadcast(data)
    # stage-2 metadata: the decode plan minus the entropy payload
    # (headers + tables only — small no matter how giant the image)
    meta = {k: p[k] for k in ("h", "w", "nc", "hmax", "vmax", "mcux",
                              "mcuy", "ri", "qt_by_comp", "sampf",
                              "grids")}
    bc_meta = sc.broadcast(meta)
    mcuy = p["mcuy"]
    nband = -(-mcuy // band_mcu_rows)

    def decode_segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed = None
        for pdf in batches:
            rows = []
            for si in pdf["si"]:
                if parsed is None:
                    parsed = J._parse_jpeg(bc.value)
                for ci, idx, mat in J._decode_segment(parsed, int(si)):
                    if not idx.size:
                        continue
                    bw = parsed["grids"][ci][1]
                    vi = parsed["sampf"][ci][1]
                    band = (idx // bw) // vi // band_mcu_rows
                    for b in np.unique(band):
                        m = band == b
                        rows.append({
                            "band": int(b), "ci": int(ci),
                            "n": int(m.sum()),
                            "idx": idx[m].tobytes(),
                            "coefs": mat[m].tobytes()})
            yield pd.DataFrame(
                rows, columns=["band", "ci", "n", "idx", "coefs"])

    def assemble_band(pdf: pd.DataFrame) -> pd.DataFrame:
        m = bc_meta.value
        band = int(pdf["band"].iloc[0])
        m0 = band * band_mcu_rows
        m1 = min(m0 + band_mcu_rows, m["mcuy"])
        vals = []
        for ci in range(m["nc"]):
            bh, bw = m["grids"][ci]
            vi = m["sampf"][ci][1]
            r0, r1 = m0 * vi, min(m1 * vi, bh)
            vals.append(np.zeros(((r1 - r0) * bw, 64), dtype=np.int64))
        for row in pdf.itertuples(index=False):
            ci = int(row.ci)
            bw = m["grids"][ci][1]
            vi = m["sampf"][ci][1]
            idx = np.frombuffer(row.idx, dtype=np.int64)
            mat = np.frombuffer(row.coefs, dtype=np.int64) \
                .reshape(int(row.n), 64)
            vals[ci][idx - m0 * vi * bw] = mat
        strip = J._assemble_band(m, vals, m0, m1)
        return pd.DataFrame([{
            "band": band, "y0": m0 * 8 * m["vmax"],
            "nrows": strip.shape[0], "strip": strip.tobytes()}])

    from pyspark.sql import functions as F

    segs = spark.range(nseg).select(F.col("id").cast("int").alias("si"))
    try:
        strips = (
            segs.repartition(min(nseg, 64))
            .mapInPandas(decode_segs,
                         schema="band int, ci int, n long, "
                                "idx binary, coefs binary")
            .groupBy("band")
            .applyInPandas(assemble_band,
                           schema="band int, y0 long, nrows long, "
                                  "strip binary")
            .collect()
        )
    finally:
        bc.unpersist(blocking=False)      # one-shot broadcasts,
        bc_meta.unpersist(blocking=False)  # don't leak
    if len(strips) != nband:
        raise ValueError(
            f"band assembly returned {len(strips)} of {nband} strips")
    w = p["w"]
    out = np.empty((p["h"], w, 3), dtype=np.uint8)
    for r in strips:
        block = np.frombuffer(r["strip"], dtype=np.uint8) \
            .reshape(r["nrows"], w, 3)
        out[r["y0"]:r["y0"] + r["nrows"]] = block
    return out


# ------------------------------------------------------------ Spark side

def with_image_bytes(df: DataFrame) -> DataFrame:
    """Attach the binary payload column (Arrow-batched generation).

    The input is spread to the session parallelism first: a single
    small parquet file scans as ONE partition, which would serialize
    the whole encode pass into one task holding one giant Arrow batch
    (with the real JPEG encoder that is both slow and a JVM-memory
    cliff). No-op on already-parallel scans."""
    from .textops import _spread

    df = _spread(df)
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["bytes"] = [
                encode_payload(int(p), int(w), int(h), f)
                for p, w, h, f in zip(pdf["phash"], pdf["w"], pdf["h"], pdf["fmt"])
            ]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen, schema=schema + ", bytes binary")


def thumbnail(arr: np.ndarray, t: int = 8) -> np.ndarray:
    """Box-downsample to a t x t RGB thumbnail (pure numpy; w,h are
    multiples of t in the synthetic table)."""
    h, w, c = arr.shape
    bh, bw = max(h // t, 1), max(w // t, 1)
    hh, ww = bh * t if h >= t else h, bw * t if w >= t else w
    a = arr[:hh, :ww].reshape(min(t, h), bh, min(t, w), bw, c)
    return a.mean(axis=(1, 3)).astype(np.uint8)


def color_features(arr: np.ndarray) -> np.ndarray:
    """12-dim feature vector: per-channel mean/std + 6-bin luminance
    histogram (normalized). Deterministic, numpy-only."""
    f = arr.astype(np.float64)
    mean = f.mean(axis=(0, 1))
    std = f.std(axis=(0, 1))
    lum = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=6, range=(0.0, 256.0))
    hist = hist / max(lum.size, 1)
    return np.concatenate([mean, std, hist])


# ------------------------------------------------- batched kernels
# Same-size images stack into (N, h, w, 3) and every per-pixel kernel
# runs ONCE over the stack (the per-image Python is only the decode,
# which is inherently per-stream). Means of integer pixels are exact
# in float64 regardless of summation order, so the batched thumbnail
# is byte-identical to the scalar one; float reductions (std,
# sharpness) agree to ULP. Histograms stay per-image np.histogram
# calls (C-speed on contiguous slices) so binning is bit-identical.
#
# Stacks are processed in CHUNKS (_STACK_CHUNK images): an unbounded
# stack turns the float64 temporaries into DRAM-streaming traffic —
# measured 2x SLOWER than the per-image loop on this class of
# hardware (memory bandwidth, not compute, is the binding resource;
# same lesson as the cache-blocked MinHash kernel in textops). A
# bounded chunk keeps the working set cache-resident while still
# amortizing the per-call numpy overhead across images.
_STACK_CHUNK = 64

def thumbnail_batch(stack: np.ndarray, t: int = 8) -> np.ndarray:
    """(N, h, w, 3) -> (N, th, tw, 3); per image == thumbnail()."""
    n, h, w, c = stack.shape
    bh, bw = max(h // t, 1), max(w // t, 1)
    hh, ww = bh * t if h >= t else h, bw * t if w >= t else w
    a = stack[:, :hh, :ww].reshape(
        n, min(t, h), bh, min(t, w), bw, c)
    return a.mean(axis=(2, 4)).astype(np.uint8)


def color_features_batch(stack: np.ndarray) -> np.ndarray:
    """(N, h, w, 3) -> (N, 12); per image == color_features()."""
    f = stack.astype(np.float64)
    mean = f.mean(axis=(1, 2))
    std = f.std(axis=(1, 2))
    lum = f @ np.array([0.299, 0.587, 0.114])
    npx = lum[0].size
    hists = np.stack([
        np.histogram(lum[i], bins=6, range=(0.0, 256.0))[0]
        for i in range(len(f))]) / max(npx, 1)
    return np.concatenate([mean, std, hists], axis=1)


def quality_metrics_batch(stack: np.ndarray) -> dict:
    """(N, h, w, 3) -> dict of (N,) metric arrays; per image ==
    quality_metrics()."""
    f = stack.astype(np.float64)
    lum = (f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114)
    n, h, w = lum.shape
    if min(h, w) >= 3:
        lap = (
            -4.0 * lum[:, 1:-1, 1:-1]
            + lum[:, :-2, 1:-1] + lum[:, 2:, 1:-1]
            + lum[:, 1:-1, :-2] + lum[:, 1:-1, 2:]
        )
        sharp = np.abs(lap).mean(axis=(1, 2))
    else:
        sharp = np.zeros(n)
    p = np.stack([
        np.histogram(lum[i], bins=32, range=(0.0, 256.0))[0]
        for i in range(n)]) / max(h * w, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(p > 0, p * np.log2(np.where(p > 0, p, 1.0)),
                        0.0).sum(axis=1)
    rg = f[..., 0] - f[..., 1]
    yb = 0.5 * (f[..., 0] + f[..., 1]) - f[..., 2]
    colorfulness = (
        np.hypot(rg.std(axis=(1, 2)), yb.std(axis=(1, 2)))
        + 0.3 * np.hypot(np.abs(rg.mean(axis=(1, 2))),
                         np.abs(yb.mean(axis=(1, 2)))))
    return {
        "lum_mean": lum.mean(axis=(1, 2)), "lum_std": lum.std(axis=(1, 2)),
        "sharpness": sharp, "entropy": ent, "colorfulness": colorfulness,
    }


def _decode_and_group(pdf: pd.DataFrame):
    """Decode every payload of one Arrow batch, then group the decoded
    arrays by shape for stacked kernels. Returns (pixel list indexed
    like pdf with None for failures, status list, {shape: [row
    positions]})."""
    pxs: list = []
    statuses: list = []
    groups: dict = {}
    a_bytes = pdf["bytes"].to_numpy(object)
    a_fmt = pdf["fmt"].to_numpy(object)
    for i in range(len(pdf)):
        try:
            px = decode_payload(a_bytes[i], a_fmt[i])
            pxs.append(px)
            statuses.append("ok")
            groups.setdefault(px.shape, []).append(i)
        except (ValueError, NotImplementedError) as e:
            pxs.append(None)
            statuses.append(f"{type(e).__name__}: {e}")
    return pxs, statuses, groups


def image_features(df: DataFrame, thumb: int = 8) -> DataFrame:
    """Multimodal feature-extraction operator: decode the binary
    payload per fmt, emit a thumbnail (raw RGB bytes) and a
    12-dim float feature vector. Arrow-batched mapInPandas — the
    Spark-side plumbing (binary in, binary+array out, batch shape)
    is the 100 TB-real part; the codecs are the container-local
    stand-ins documented above."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            pxs, statuses, groups = _decode_and_group(pdf)
            thumbs = [b""] * n
            tws = np.zeros(n, dtype=np.int64)
            ths = np.zeros(n, dtype=np.int64)
            feats: list = [[]] * n
            # one stacked kernel pass per distinct decoded shape,
            # cache-chunked (ragged corpora degrade gracefully to
            # per-image stacks)
            for shape, idxs in groups.items():
                for c0 in range(0, len(idxs), _STACK_CHUNK):
                    part = idxs[c0:c0 + _STACK_CHUNK]
                    stack = np.stack([pxs[i] for i in part])
                    tb = thumbnail_batch(stack, thumb)
                    fb = color_features_batch(stack)
                    for j, i in enumerate(part):
                        thumbs[i] = tb[j].tobytes()
                        tws[i], ths[i] = tb.shape[2], tb.shape[1]
                        feats[i] = fb[j].tolist()
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(object),
                "thumb_w": tws, "thumb_h": ths,
                "thumbnail": thumbs, "features": feats,
                "status": statuses,
            }, columns=["image_id", "thumb_w", "thumb_h",
                        "thumbnail", "features", "status"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        gen,
        schema=("image_id string, thumb_w int, thumb_h int, "
                "thumbnail binary, features array<double>, status string"),
    )


def quality_metrics(arr: np.ndarray) -> dict:
    """Deterministic per-image quality signals (numpy-only, the
    standard curation heuristics): luminance mean/std, gradient
    sharpness (mean |Laplacian|), 32-bin luminance entropy, and
    colorfulness (Hasler-Suesstrunk rg/yb statistic)."""
    f = arr.astype(np.float64)
    lum = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    lap = (
        -4.0 * lum[1:-1, 1:-1]
        + lum[:-2, 1:-1] + lum[2:, 1:-1]
        + lum[1:-1, :-2] + lum[1:-1, 2:]
    ) if min(lum.shape) >= 3 else np.zeros((1, 1))
    hist, _ = np.histogram(lum, bins=32, range=(0.0, 256.0))
    p = hist / max(lum.size, 1)
    nz = p[p > 0]
    rg = f[..., 0] - f[..., 1]
    yb = 0.5 * (f[..., 0] + f[..., 1]) - f[..., 2]
    colorfulness = float(
        np.hypot(rg.std(), yb.std())
        + 0.3 * np.hypot(abs(rg.mean()), abs(yb.mean())))
    return {
        "lum_mean": float(lum.mean()),
        "lum_std": float(lum.std()),
        "sharpness": float(np.abs(lap).mean()),
        "entropy": float(-(nz * np.log2(nz)).sum()),
        "colorfulness": colorfulness,
    }


_IQ_COLS = ["lum_mean", "lum_std", "sharpness", "entropy", "colorfulness"]


def image_quality(df: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) -> per-image quality signals + pass/fail
    flags (too dark/bright, too flat, too blurry) — the image twin of
    textops.quality_score for curation gating. Arrow-batched;
    errors-as-data (undecodable -> status + NULL metrics)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["image_id"] + _IQ_COLS + ["status"]
        for pdf in batches:
            n = len(pdf)
            pxs, statuses, groups = _decode_and_group(pdf)
            out = {c: np.full(n, np.nan) for c in _IQ_COLS}
            for shape, idxs in groups.items():
                for c0 in range(0, len(idxs), _STACK_CHUNK):
                    part = idxs[c0:c0 + _STACK_CHUNK]
                    m = quality_metrics_batch(
                        np.stack([pxs[i] for i in part]))
                    for c in _IQ_COLS:
                        out[c][part] = m[c]
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(object),
                # nullable Float64: decode failures carry NaN here and
                # must surface as SQL NULL, not NaN
                **{c: pd.array(v, dtype="Float64")
                   for c, v in out.items()},
                "status": statuses,
            }, columns=cols)

    from .textops import _spread

    out = _spread(df.select("image_id", "bytes", "fmt")).mapInPandas(
        gen, schema=("image_id string, lum_mean double, lum_std double, "
                     "sharpness double, entropy double, "
                     "colorfulness double, status string"))
    from pyspark.sql import functions as F
    return out.select(
        "*",
        ((F.col("status") == "ok")
         & F.col("lum_mean").between(16.0, 240.0)
         & (F.col("lum_std") >= 4.0)
         & (F.col("sharpness") >= 0.5)
         & (F.col("entropy") >= 1.0)).alias("quality_ok"))


def curate_images(df: DataFrame, max_d: int = 10) -> DataFrame:
    """Composed image-curation pipeline — the image twin of
    textops.curation_pipeline: payload verification (PSNR + caption
    gate) -> quality gating -> perceptual near-dup dedup, one
    declarative plan. Input: rows with (image_id, bytes, fmt, phash,
    w, h, caption). Output: surviving rows + the per-stage verdicts
    (verified, quality_ok) for lineage/debugging. Each stage is the
    already-tested operator; the composition adds two broadcast-able
    id joins and the dedup anti-join.

    Cost note: composing the stock operators decodes each payload
    once per stage (verify, quality, hash) — three decode passes. At
    100 TB you would fuse them into one decode pass emitting all
    three verdict column sets (the operators share decode_payload, so
    the fusion is mechanical); the composition here optimizes for
    operator reuse and per-stage testability."""
    from pyspark.sql import functions as F

    from .imagehash import dedup_phash

    verdicts = verify_payloads(df).select(
        "image_id",
        (F.col("pixels_ok") & F.col("caption_ok")).alias("verified"))
    quality = image_quality(df).select("image_id", "quality_ok")
    good = (
        df.join(verdicts, "image_id")
        .join(quality, "image_id")
        .where(F.col("verified") & F.col("quality_ok"))
    )
    return dedup_phash(good, max_d=max_d)


_CURATION_FACTS_SCHEMA = ("image_id string, verified boolean, "
                          "quality_ok boolean, b0 long, b1 long, "
                          "b2 long, b3 long, ctag long")


def _curation_facts_gen(batches: "Iterator[pd.DataFrame]"):
    """ONE decode per image emitting all three verdict sets: the
    verification gate (PSNR + caption), the quality gate, and the
    perceptual hash. Shared by curation_facts / curate_images_fused /
    curate_images_checkpointed phase 1."""
    from .imagehash import _HASH_COLS, blockhash

    cols = ["image_id", "verified", "quality_ok"] + _HASH_COLS
    for pdf in batches:
        ids, ver_l, q_l = [], [], []
        hvals: dict[str, list] = {c: [] for c in _HASH_COLS}
        for r in pdf.itertuples():
            ids.append(r.image_id)
            try:
                px = decode_payload(r.bytes, r.fmt)
                ref = synth_pixels(int(r.phash), int(r.w), int(r.h))
                p = psnr(ref, px)
                ver = p >= (40.0 if r.fmt == "jpeg" else 99.0)
                try:
                    ver = ver and (
                        r.caption == f"cap {int(r.image_id[3:])}")
                except (ValueError, TypeError):
                    ver = False
                m = quality_metrics(px)
                q_ok = (16.0 <= m["lum_mean"] <= 240.0
                        and m["lum_std"] >= 4.0
                        and m["sharpness"] >= 0.5
                        and m["entropy"] >= 1.0)
                for c, v in zip(_HASH_COLS, blockhash(px)):
                    hvals[c].append(v)
                ver_l.append(bool(ver))
                q_l.append(bool(q_ok))
            except (ValueError, NotImplementedError):
                for c in _HASH_COLS:
                    hvals[c].append(None)
                ver_l.append(False)
                q_l.append(False)
        out = {"image_id": ids, "verified": ver_l, "quality_ok": q_l}
        # nullable Int64: a float64 coercion (any None in the batch)
        # would round 63-bit hashes (see image_phash)
        for c in _HASH_COLS:
            out[c] = pd.array(hvals[c], dtype="Int64")
        yield pd.DataFrame(out, columns=cols)


def curation_facts(df: DataFrame) -> DataFrame:
    """The fused per-image fact table: (image_id, verified,
    quality_ok, b0..b3, ctag) from ONE decode pass."""
    from .textops import _spread

    return _spread(df.select(
        "image_id", "bytes", "fmt", "phash", "w", "h", "caption"
    )).mapInPandas(_curation_facts_gen, schema=_CURATION_FACTS_SCHEMA)


def curate_images_fused(df: DataFrame, max_d: int = 10) -> DataFrame:
    """curate_images with the decode fused: the composed form decodes
    every payload once per stage (verify, quality, hash — three
    passes, the docstring's 100 TB note); this one runs the shared
    one-pass kernel and composes the gates + dedup over the SMALL fact
    table (8 columns/row). Returns exactly the rows and verdict
    columns of curate_images (equality pinned in test_payload)."""
    from pyspark.sql import functions as F

    from .imagehash import phash_neardup_pairs
    from .textops import neardup_components

    # eager localCheckpoint: the decode pass runs exactly ONCE and the
    # materialized fact table (8 cols/row, orders of magnitude smaller
    # than the payloads) feeds both the pair join and the final gate —
    # a plain persist would be dropped before the lazy result runs
    good = curation_facts(df) \
        .where(F.col("verified") & F.col("quality_ok")) \
        .localCheckpoint(eager=True)
    pairs = phash_neardup_pairs(good, max_d=max_d)
    comp = neardup_components(pairs, a_col="image_id",
                              b_col="other_id")
    losers = comp.where(F.col("component") != F.col("doc_id")) \
        .select(F.col("doc_id").alias("image_id"))
    keep = good.select("image_id", "verified", "quality_ok") \
        .join(losers, "image_id", "left_anti")
    return df.join(keep, "image_id")


def curate_images_checkpointed(spark, images: DataFrame, out_dir: str,
                               n_buckets: int = 8,
                               max_d: int = 10) -> DataFrame:
    """Resumable image curation — the north-rule checkpoint discipline
    applied to the image pipeline, in two phases:

    PHASE 1 (expensive, row-local, CHECKPOINTED): one decode pass per
    bucket wave computes the verification verdict, the quality gate,
    and the perceptual hash per image; each bucket commits a manifest
    row (rows, wall time, lineage), so a killed job resumes at the
    first uncommitted bucket and never re-decodes finished work. All
    phase-1 columns are per-row facts — bucket-independent by
    construction, safe to compute in any wave order.

    PHASE 2 (cheap, graph-shaped, RE-RUN ON RESUME): near-dup
    components over the checkpointed HASH TABLE (6 longs/row — orders
    of magnitude smaller than the payloads) and the min-id
    representative anti-join. Re-running phase 2 after a resume is
    deliberate: the pair graph spans buckets, so it must see the
    complete hash table; its cost is proportional to the hash table,
    not the corpus bytes.

    Returns the curated id set (image_id of survivors)."""
    from pyspark.sql import functions as F

    from . import checkpoint as cp
    from .imagehash import phash_neardup_pairs
    from .textops import neardup_components

    def phase1(part: DataFrame) -> DataFrame:
        # the shared fused kernel (_curation_facts_gen): one decode
        # per image -> verification + quality + perceptual hash
        return part.select(
            "image_id", "bytes", "fmt", "phash", "w", "h", "caption"
        ).mapInPandas(_curation_facts_gen, schema=_CURATION_FACTS_SCHEMA)

    cp.run_with_checkpoint(
        spark, images, phase1, out_dir, bucket_col="image_id",
        n_buckets=n_buckets, lineage={"stage": "image-curation-phase1"})
    facts = cp.read_checkpointed(spark, out_dir)
    good = facts.where(F.col("verified") & F.col("quality_ok"))
    pairs = phash_neardup_pairs(good, max_d=max_d)
    comp = neardup_components(pairs, a_col="image_id", b_col="other_id")
    losers = comp.where(F.col("component") != F.col("doc_id")) \
        .select(F.col("doc_id").alias("image_id"))
    return good.select("image_id").join(losers, "image_id", "left_anti")


def verify_payloads(df: DataFrame) -> DataFrame:
    """Per-row invariant check vs the reference pixels: psnr_db and
    caption_ok columns (input_hint contract). Vectorized per Arrow
    batch; PSNR >= 40 dB required for lossy fmt, exact for png."""

    def chk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                ref = synth_pixels(int(r.phash), int(r.w), int(r.h))
                try:
                    got = decode_payload(r.bytes, r.fmt)
                    p = psnr(ref, got)
                    ok = p >= (40.0 if r.fmt == "jpeg" else 99.0)
                except (ValueError, NotImplementedError) as e:
                    p, ok = -1.0, False
                # exact caption equality vs the reference derivation
                # (caption of image img%012d is "cap <iid>"); a
                # malformed id is a failed check, not a task failure
                try:
                    cap_ok = r.caption == f"cap {int(r.image_id[3:])}"
                except (ValueError, TypeError):
                    cap_ok = False
                out.append({"image_id": r.image_id, "psnr_db": p,
                            "pixels_ok": bool(ok), "caption_ok": bool(cap_ok)})
            yield pd.DataFrame(out, columns=["image_id", "psnr_db", "pixels_ok", "caption_ok"])

    return df.select("image_id", "bytes", "phash", "w", "h", "fmt", "caption").mapInPandas(
        chk, schema="image_id string, psnr_db double, pixels_ok boolean, caption_ok boolean"
    )
