"""Progressive JPEG (SOF2) — decode and encode, pure numpy + stdlib.

Implements ITU-T T.81 Annex G progressive DCT: spectral selection
(per-scan Ss..Se coefficient bands) and successive approximation
(per-scan Ah/Al bit-plane splits), DC scans interleaved or not, AC
scans single-component over the component's own (non-interleaved)
block grid, EOB-run coding, refinement correction bits, restart
intervals, tables redefinable between scans. Public-knowledge
implementation (T.81 Annex G; the scan-script shape follows the
widely-published libjpeg default progression).

Decoding accumulates quantized coefficients across scans and then
reuses the baseline module's vectorized assembly (jpeg._assemble_planes
— progressive reorders the entropy stream, the coefficient data is
identical), so a progressive stream decodes to EXACTLY the pixels of
a baseline stream with the same quantized coefficients; the round-trip
tests pin that equality.

The encoder exists to exercise every decoder path without external
fixtures (this container has no image libraries): it emits the
standard 10-scan script (DC first Al=1, spectral-split AC first scans,
AC refinement chain, DC refinement) — or any caller-supplied scan
script — over 4:4:4, 4:2:2, 4:2:0 or grayscale, optionally with
restart intervals. Scan entropy uses simple COMPLETE canonical
Huffman tables carried in DHT (the Annex K tables lack the EOBn
symbols progressive needs); tables travel in the stream, so the
decoder exercises its real DHT path.

Entry points raise ValueError (only) on malformed streams, matching
engine/jpeg.py's errors-as-data contract.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    ZIGZAG, _BitReader, _BitWriter, _decode_lut, _quantized_zigzag,
    _rgb_to_ycbcr, _seg, _valueerror_on_corruption, quality_tables,
)
from . import jpeg as J

# ------------------------------------------------------------- parser


def _destuff(data: bytes, lo: int, hi: int) -> bytes:
    raw = np.frombuffer(data[lo:hi], dtype=np.uint8)
    stuffed = np.flatnonzero((raw[:-1] == 0xFF) & (raw[1:] == 0x00)) + 1
    return (np.delete(raw, stuffed).tobytes()
            if len(stuffed) else raw.tobytes())


def is_progressive(data: bytes) -> bool:
    """Light marker walk to the first SOFn: True for SOF2. False for
    anything else (including streams with no SOF — the full parsers
    produce the real error)."""
    pos, n = 2, len(data)
    if data[:2] != b"\xFF\xD8":
        return False
    while pos < n - 1:
        if data[pos] != 0xFF:
            return False
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos >= n:
            return False
        marker = data[pos]
        pos += 1
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return marker == 0xC2
        if marker == 0xDA:        # SOS before SOF: malformed
            return False
        if pos + 2 > n:
            return False
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        pos += ln
    return False


@_valueerror_on_corruption
def parse_progressive(data: bytes) -> dict:
    """SOF2 stream -> frame metadata + ordered scan list. Each scan
    snapshot carries its own Huffman LUTs, restart interval, and
    RST-split entropy segments (tables and DRI are redefinable between
    scans, T.81 B.2.4)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[list, list]] = {}
    dims = None
    comps: list = []          # (cid, tq, hi, vi) in frame order
    scans: list[dict] = []
    restart_ri = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos < n and data[pos] == 0xFF:
            pos += 1
        marker = data[pos]
        pos += 1
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(
                    seg[sp + 1:sp + 65], dtype=np.uint8
                ).astype(np.float64)
                sp += 65
        elif marker == 0xC4:
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + nv])
                htabs[(cls, tid)] = _decode_lut(bits, vals)
                sp += 17 + nv
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hi}x{vi} unsupported")
                comps.append((cid, tq, hi, vi))
            dims = (h, w)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "not a progressive stream (non-SOF2 frame marker)")
        elif marker == 0xDD:
            (restart_ri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if dims is None:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                scid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next((j for j, c in enumerate(comps)
                           if c[0] == scid), None)
                if ci is None:
                    raise ValueError("scan references unknown component")
                scomps.append((ci, tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not (0 <= ss <= se <= 63):
                raise ValueError("bad spectral selection")
            if (ss == 0) != (se == 0):
                raise ValueError("DC scan must have Ss=Se=0")
            if ss > 0 and ns != 1:
                raise ValueError("AC scans must be single-component")
            # snapshot the LUTs this scan uses (DC-refine scans carry
            # raw bits and need no table)
            luts = []
            for ci, dct, act in scomps:
                dc_lut = ac_lut = None
                if ss == 0 and ah == 0:
                    if (0, dct) not in htabs:
                        raise ValueError("missing DC Huffman table")
                    dc_lut = htabs[(0, dct)]
                if ss > 0:
                    if (1, act) not in htabs:
                        raise ValueError("missing AC Huffman table")
                    ac_lut = htabs[(1, act)]
                luts.append((dc_lut, ac_lut))
            segments = []
            start = end = pos
            while end < n - 1:
                if data[end] == 0xFF and data[end + 1] != 0x00:
                    if 0xD0 <= data[end + 1] <= 0xD7:
                        segments.append(_destuff(data, start, end))
                        start = end = end + 2
                        continue
                    break
                end += 1
            segments.append(_destuff(data, start, end))
            pos = end
            scans.append({
                "comps": scomps, "ss": ss, "se": se, "ah": ah, "al": al,
                "ri": restart_ri, "luts": luts, "segments": segments,
            })
    if dims is None or not scans:
        raise ValueError("incomplete progressive JPEG stream")

    h, w = dims
    nc = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt_by_comp, sampf, grids, ni_grids = [], [], [], []
    for cid, tq, hi, vi in comps:
        if tq not in qtabs:
            raise ValueError("missing quantization table")
        qt_by_comp.append(qtabs[tq])
        sampf.append((hi, vi))
        grids.append((mcuy * vi, mcux * hi))
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        ni_grids.append((-(-ch // 8), -(-cw // 8)))
    return {
        "h": h, "w": w, "nc": nc, "hmax": hmax, "vmax": vmax,
        "mcux": mcux, "mcuy": mcuy, "qt_by_comp": qt_by_comp,
        "sampf": sampf, "grids": grids, "ni_grids": ni_grids,
        "scans": scans,
    }


# ------------------------------------------------------------- decoder

def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _scan_blocks(p: dict, scan: dict):
    """Yield the scan's block sequence as (ci, interleaved block
    index) in coded order; one MCU per yield group. Interleaved scans
    (multi-component DC) walk the MCU grid; single-component scans
    walk the component's own non-interleaved grid, one block per MCU
    (T.81 A.2.2/A.2.3)."""
    if len(scan["comps"]) > 1:
        mcux, mcuy = p["mcux"], p["mcuy"]
        for mi in range(mcux * mcuy):
            my, mx = divmod(mi, mcux)
            group = []
            for ci, _, _ in scan["comps"]:
                hi, vi = p["sampf"][ci]
                bw = p["grids"][ci][1]
                for by in range(vi):
                    for bx in range(hi):
                        group.append(
                            (ci, (my * vi + by) * bw + (mx * hi + bx)))
            yield group
    else:
        ci = scan["comps"][0][0]
        bh_ni, bw_ni = p["ni_grids"][ci]
        bw = p["grids"][ci][1]
        for r in range(bh_ni):
            for c in range(bw_ni):
                yield [(ci, r * bw + c)]


def _decode_scan(p: dict, scan: dict, coefs: list) -> None:
    """Apply ONE scan's entropy data to the coefficient accumulators
    (coefs[ci]: (bh*bw, 64) int64, zigzag-ordered rows)."""
    ss, se = scan["ss"], scan["se"]
    ah, al = scan["ah"], scan["al"]
    ri = scan["ri"]
    segments = scan["segments"]
    lut_by_ci = {ci: scan["luts"][j]
                 for j, (ci, _, _) in enumerate(scan["comps"])}

    if ss == 0:
        # phantom-MCU guard (the progressive analog of the baseline
        # parser's entropy-budget check): every DC-coded block costs
        # >= 1 bit (first scans: one Huffman symbol; refinements:
        # exactly one raw bit), so corrupt SOF dimensions that declare
        # millions of blocks against a tiny scan are rejected before
        # the walk grinds through them. AC scans have no such bound
        # (one EOB run can legally cover 32767 blocks).
        nblocks = 0
        for ci, _, _ in scan["comps"]:
            if len(scan["comps"]) > 1:
                bh, bw = p["grids"][ci]
            else:
                bh, bw = p["ni_grids"][ci]
            nblocks += bh * bw
        if nblocks > max(sum(len(s) for s in segments) * 8, 1):
            raise ValueError(
                "DC scan entropy too short for the declared dimensions")

    seg_i = 0
    rd = _BitReader(segments[0])
    pred = {ci: 0 for ci, _, _ in scan["comps"]}
    eobrun = 0
    nmcu = 0

    for group in _scan_blocks(p, scan):
        if ri and nmcu and nmcu % ri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing restart segment")
            rd = _BitReader(segments[seg_i])
            pred = {ci: 0 for ci in pred}
            eobrun = 0
        nmcu += 1
        for ci, bi in group:
            block = coefs[ci][bi]
            if ss == 0 and ah == 0:           # DC first
                dc_lut = lut_by_ci[ci][0]
                pk = rd.peek16()
                length = dc_lut[1][pk]
                if length == 0:
                    raise ValueError("bad DC Huffman code")
                rd.skip(length)
                s = dc_lut[0][pk]
                diff = _extend(rd.get(s), s) if s else 0
                pred[ci] += diff
                block[0] = pred[ci] << al
            elif ss == 0:                     # DC refine: 1 raw bit
                if rd.get(1):
                    block[0] |= (1 << al)
            elif ah == 0:                     # AC first
                if eobrun > 0:
                    eobrun -= 1
                    continue
                ac_sym, ac_len = lut_by_ci[ci][1]
                k = ss
                while k <= se:
                    pk = rd.peek16()
                    length = ac_len[pk]
                    if length == 0:
                        raise ValueError("bad AC Huffman code")
                    rd.skip(length)
                    sym = ac_sym[pk]
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.get(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past spectral end")
                    block[k] = _extend(rd.get(s), s) << al
                    k += 1
            else:                             # AC refine (G.1.2.3)
                p1, m1 = 1 << al, -1 << al
                k = ss
                if eobrun == 0:
                    ac_sym, ac_len = lut_by_ci[ci][1]
                    while k <= se:
                        pk = rd.peek16()
                        length = ac_len[pk]
                        if length == 0:
                            raise ValueError("bad AC Huffman code")
                        rd.skip(length)
                        sym = ac_sym[pk]
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += rd.get(r)
                                break
                            val = 0          # ZRL: 16 zero-history
                        elif s == 1:
                            val = p1 if rd.get(1) else m1
                        else:
                            raise ValueError(
                                "refinement symbol with size > 1")
                        while k <= se:
                            if block[k] != 0:
                                if rd.get(1) and (block[k] & p1) == 0:
                                    block[k] += p1 if block[k] >= 0 \
                                        else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val != 0 and k <= se:
                            block[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if block[k] != 0:
                            if rd.get(1) and (block[k] & p1) == 0:
                                block[k] += p1 if block[k] >= 0 else m1
                        k += 1
                    eobrun -= 1


@_valueerror_on_corruption
def decode_progressive(data: bytes) -> np.ndarray:
    """SOF2 JFIF bytes -> uint8 RGB (h, w, 3). Coefficients accumulate
    across scans; assembly is the baseline module's vectorized
    dequant + IDCT + upsample + color convert."""
    p = parse_progressive(data)
    # int64 object rows would be slow; per-block python lists are the
    # hot structure, so accumulate in a numpy array and index rows
    coefs = [np.zeros((bh * bw, 64), dtype=np.int64)
             for bh, bw in p["grids"]]
    for scan in p["scans"]:
        _decode_scan(p, scan, coefs)
    return J._assemble_planes(p, coefs)


# ------------------------------------------------------------- encoder

# Simple COMPLETE canonical tables (progressive needs EOBn symbols the
# Annex K tables lack): DC sizes 0..15 at 5 bits; AC symbols 0..254 at
# 9 bits + symbol 255 at 10 (a DHT BITS entry is one byte, so one
# length can hold at most 255 codes). Kraft sums ~0.5 — legal
# incomplete trees, no all-ones code.
_P_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_P_DC_VALS = list(range(16))
_P_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_P_AC_VALS = list(range(256))
_P_DC_TAB = J._encode_table(_P_DC_BITS, _P_DC_VALS)
_P_AC_TAB = J._encode_table(_P_AC_BITS, _P_AC_VALS)

# the libjpeg default progression (published scan script): DC first at
# Al=1, luma AC split 1-5 / 6-63 at Al=2, chroma AC at Al=1, then the
# refinement chain down to Al=0
_DEFAULT_SCANS_3 = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
]
_DEFAULT_SCANS_1 = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


class _ScanWriter:
    """Entropy writer for one scan: wraps _BitWriter with EOB-run and
    correction-bit buffering (T.81 G.1.2.2-3) and restart emission."""

    def __init__(self) -> None:
        self.wr = _BitWriter()
        self.eobrun = 0
        self.be: list[int] = []   # buffered correction bits

    def sym(self, tab: dict, s: int) -> None:
        code, length = tab[s]
        self.wr.write(code, length)

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(_P_AC_TAB, nbits << 4)
            if nbits:
                self.wr.write(self.eobrun, nbits)
            self.eobrun = 0
        for b in self.be:
            self.wr.write(b, 1)
        self.be = []

    def restart(self, idx: int) -> None:
        self.emit_eobrun()
        self.wr.align()
        self.wr.raw_marker(0xD0 + (idx % 8))

    def finish(self) -> bytes:
        self.emit_eobrun()
        return self.wr.finish()


def _enc_ac_first(sw: _ScanWriter, zz, ss: int, se: int, al: int) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = zz[k]
        mag = (v if v >= 0 else -v) >> al
        if mag == 0:
            r += 1
            continue
        sw.emit_eobrun()
        while r > 15:
            sw.sym(_P_AC_TAB, 0xF0)
            r -= 16
        s = mag.bit_length()
        sw.sym(_P_AC_TAB, (r << 4) | s)
        sw.wr.write(mag if v >= 0 else -mag + (1 << s) - 1, s)
        r = 0
    if r > 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.emit_eobrun()


def _enc_ac_refine(sw: _ScanWriter, zz, ss: int, se: int, al: int) -> None:
    mags = [((v if v >= 0 else -v) >> al) for v in zz[ss:se + 1]]
    eob = 0                        # k past the last NEWLY significant
    for j, m in enumerate(mags):
        if m == 1:
            eob = j + 1
    r = 0
    br: list[int] = []
    for j, m in enumerate(mags):
        if m == 0:
            r += 1
            continue
        while r > 15 and j < eob:
            sw.emit_eobrun()
            sw.sym(_P_AC_TAB, 0xF0)
            r -= 16
            for b in br:
                sw.wr.write(b, 1)
            br = []
        if m > 1:                  # already significant: correction bit
            br.append(m & 1)
            continue
        sw.emit_eobrun()           # newly significant
        sw.sym(_P_AC_TAB, (r << 4) | 1)
        sw.wr.write(1 if zz[ss + j] >= 0 else 0, 1)
        for b in br:
            sw.wr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        sw.eobrun += 1
        sw.be.extend(br)
        if sw.eobrun == 0x7FFF or len(sw.be) > 900:
            sw.emit_eobrun()


def encode_progressive(arr: np.ndarray, quality: int = 90,
                       subsampling: str = "444",
                       restart_interval: int = 0,
                       scans=None) -> bytes:
    """8-bit RGB (h, w, 3) or grayscale (h, w) -> progressive (SOF2)
    JFIF bytes, default 10-scan script. Decodes (here and in any
    conformant decoder) to EXACTLY the pixels of the baseline encode
    at the same quality/subsampling — progressive reorders the entropy
    stream, the quantized coefficients are identical."""
    gray = arr.ndim == 2
    if gray:
        h, w = arr.shape
        ql, _ = quality_tables(quality)
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        plane = np.pad(arr.astype(np.float64),
                       ((0, hp - h), (0, wp - w)), mode="edge")
        zz = [_quantized_zigzag(plane, ql)]
        samp = (0x11,)
        qts = (ql,)
        comp_ids = (1,)
        tq_ids = (0,)
        scans = scans or _DEFAULT_SCANS_1
    else:
        h, w, c = arr.shape
        assert c == 3 and arr.dtype == np.uint8
        if subsampling not in ("444", "422", "420"):
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        ql, qc = quality_tables(quality)
        ycc = _rgb_to_ycbcr(arr)
        if subsampling == "444":
            hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
            ycc = np.pad(ycc, ((0, hp - h), (0, wp - w), (0, 0)),
                         mode="edge")
            zz = [_quantized_zigzag(ycc[..., ci], (ql, qc, qc)[ci])
                  for ci in range(3)]
            samp = (0x11, 0x11, 0x11)
        elif subsampling == "422":
            hp, wp = -(-h // 8) * 8, -(-w // 16) * 16
            ycc = np.pad(ycc, ((0, hp - h), (0, wp - w), (0, 0)),
                         mode="edge")
            cb = ycc[..., 1].reshape(hp, wp // 2, 2).mean(axis=2)
            cr = ycc[..., 2].reshape(hp, wp // 2, 2).mean(axis=2)
            zz = [_quantized_zigzag(ycc[..., 0], ql),
                  _quantized_zigzag(cb, qc), _quantized_zigzag(cr, qc)]
            samp = (0x21, 0x11, 0x11)
        else:
            hp, wp = -(-h // 16) * 16, -(-w // 16) * 16
            ycc = np.pad(ycc, ((0, hp - h), (0, wp - w), (0, 0)),
                         mode="edge")
            cb = ycc[..., 1].reshape(
                hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            cr = ycc[..., 2].reshape(
                hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            zz = [_quantized_zigzag(ycc[..., 0], ql),
                  _quantized_zigzag(cb, qc), _quantized_zigzag(cr, qc)]
            samp = (0x22, 0x11, 0x11)
        qts = (ql, qc)
        comp_ids = (1, 2, 3)
        tq_ids = (0, 1, 1)
        scans = scans or _DEFAULT_SCANS_3

    nc = len(comp_ids)
    hmax = max(s >> 4 for s in samp)
    vmax = max(s & 0x0F for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    sampf = [(s >> 4, s & 0x0F) for s in samp]
    grids = [(mcuy * vi, mcux * hi) for hi, vi in sampf]
    ni_grids = []
    for hi, vi in sampf:
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        ni_grids.append((-(-ch // 8), -(-cw // 8)))
    p = {"mcux": mcux, "mcuy": mcuy, "sampf": sampf, "grids": grids,
         "ni_grids": ni_grids}
    ri = int(restart_interval)

    def scan_entropy(comps, ss, se, ah, al) -> bytes:
        sw = _ScanWriter()
        pred = {ci: 0 for ci in comps}
        scan = {"comps": [(ci, 0, 0) for ci in comps]}
        nmcu = 0
        for group in _scan_blocks(p, scan):
            if ri and nmcu and nmcu % ri == 0:
                sw.restart(nmcu // ri - 1)
                pred = {ci: 0 for ci in pred}
            nmcu += 1
            for ci, bi in group:
                blk = zz[ci][bi]
                if ss == 0 and ah == 0:       # DC first
                    dcv = blk[0] >> al        # arithmetic shift
                    diff = dcv - pred[ci]
                    pred[ci] = dcv
                    s = diff.bit_length() if diff >= 0 \
                        else (-diff).bit_length()
                    sw.sym(_P_DC_TAB, s)
                    if s:
                        sw.wr.write(
                            diff if diff >= 0 else diff + (1 << s) - 1,
                            s)
                elif ss == 0:                 # DC refine
                    sw.wr.write((blk[0] >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(sw, blk, ss, se, al)
                else:
                    _enc_ac_refine(sw, blk, ss, se, al)
        return sw.finish()

    out = bytearray(b"\xFF\xD8")
    out += _seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0])
                + struct.pack(">HHBB", 1, 1, 0, 0))
    for tid, qt in enumerate(qts):
        out += _seg(0xFFDB, bytes([tid])
                    + bytes(qt.astype(np.uint8)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([comp_ids[i], samp[i], tq_ids[i]])
    out += _seg(0xFFC2, sof)                       # SOF2 progressive
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_P_DC_BITS)
                + bytes(_P_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_P_AC_BITS)
                + bytes(_P_AC_VALS))
    if ri:
        out += _seg(0xFFDD, struct.pack(">H", ri))
    for comps, ss, se, ah, al in scans:
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([comp_ids[ci], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        out += scan_entropy(comps, ss, se, ah, al)
    out += b"\xFF\xD9"
    return bytes(out)
