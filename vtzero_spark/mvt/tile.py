"""MVT tile/layer/feature parse and build.

Parse strictness mirrors vtzero:
- layer: unknown field or known field with wrong wire type -> FormatError
  (/root/reference/include/vtzero/layer.hpp:107-151); version must be
  1 or 2 -> VersionError (layer.hpp:142-145); name required ->
  FormatError (layer.hpp:147-150); defaults version=1, extent=4096.
- feature: duplicate tags/geometry fields, invalid GeomType enum,
  missing geometry, unpaired tags -> FormatError
  (/root/reference/include/vtzero/feature.hpp:66-116); unknown fields
  are skipped.
- dictionary lookups out of range -> OutOfRangeError
  (layer.hpp:434-460).

Build byte-order parity: feature = [type][id][geometry][tags]
(type written by the feature_builder constructor, builder.hpp:596-599;
id/geometry/tags appended in protocol order); layer = [version][name]
[extent][features...][keys...][values...] (builder_impl.hpp:157-166,
253-258); layers with zero features are omitted from the tile
(builder_impl.hpp:225-227); key/value dictionaries are in
first-appearance order (builder_impl.hpp:104-107,180-183).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .errors import FormatError, OutOfRangeError, VersionError
from .pbf import (
    WT_LEN,
    WT_VARINT,
    decode_varint,
    decode_varint_array,
    encode_varint,
    encode_varint_array,
    len_field,
    scan_fields,
    varint_field,
)

# pbf field numbers (types.hpp:92-110)
TILE_LAYERS = 3
LAYER_NAME = 1
LAYER_FEATURES = 2
LAYER_KEYS = 3
LAYER_VALUES = 4
LAYER_EXTENT = 5
LAYER_VERSION = 15
FEATURE_ID = 1
FEATURE_TAGS = 2
FEATURE_TYPE = 3
FEATURE_GEOMETRY = 4


def is_vector_tile(buf: bytes) -> bool:
    """First-byte sniff (vector_tile.hpp:284-286)."""
    return len(buf) > 0 and buf[0] == 0x1A


@dataclass
class Feature:
    id: int | None  # None <=> !has_id()
    geom_type: int
    geometry: np.ndarray  # uint32 command ints
    geometry_nbytes: int  # wire length of the packed field (decode guard)
    tags: np.ndarray  # flat uint32 (key_idx, val_idx, ...) pairs

    @property
    def num_properties(self) -> int:
        return self.tags.size // 2


@dataclass
class Layer:
    name: str
    version: int = 1
    extent: int = 4096
    keys: list[bytes] = field(default_factory=list)
    values: list[bytes] = field(default_factory=list)  # raw Value bytes
    features: list[Feature] = field(default_factory=list)
    raw: bytes = b""

    def key(self, idx: int) -> bytes:
        if idx >= len(self.keys):
            raise OutOfRangeError(f"key index {idx} out of range")
        return self.keys[idx]

    def value(self, idx: int) -> bytes:
        if idx >= len(self.values):
            raise OutOfRangeError(f"value index {idx} out of range")
        return self.values[idx]

    def properties(self, feat: Feature) -> list[tuple[bytes, bytes]]:
        out = []
        t = feat.tags
        for i in range(0, t.size, 2):
            out.append((self.key(int(t[i])), self.value(int(t[i + 1]))))
        return out


# -------------------------------------------------------------------- parse

def tile_layer_views(buf: bytes) -> list[bytes]:
    """All layer message views in order; non-layer fields are skipped
    (vector_tile.hpp:134-149)."""
    out = []
    for f, w, v in scan_fields(buf):
        if f == TILE_LAYERS and w == WT_LEN:
            out.append(v)
    return out


def count_layers(buf: bytes) -> int:
    """Count without parsing layer bodies (vector_tile.hpp:111-122)."""
    return len(tile_layer_views(buf))


def layer_name_only(layer_buf: bytes) -> str:
    """Read just the name field, as get_layer_by_name does
    (vector_tile.hpp:214-271); missing name -> FormatError."""
    for f, w, v in scan_fields(layer_buf):
        if f == LAYER_NAME and w == WT_LEN:
            # vtzero keeps the raw bytes (data_view) without utf-8
            # validation; surrogateescape preserves them losslessly
            return v.decode("utf-8", errors="surrogateescape")
    raise FormatError("missing name field in layer (spec 4.1)")


def parse_feature(buf: bytes) -> Feature:
    fid: int | None = None
    geom_type = 0
    geometry: np.ndarray | None = None
    geometry_nbytes = 0
    tags: np.ndarray | None = None
    for f, w, v in scan_fields(buf):
        if f == FEATURE_ID and w == WT_VARINT:
            fid = v
        elif f == FEATURE_TAGS and w == WT_LEN:
            if tags is not None:
                raise FormatError("Feature has more than one tags field")
            tags = decode_varint_array(v)
        elif f == FEATURE_TYPE and w == WT_VARINT:
            if v > 3:
                raise FormatError("Unknown geometry type (spec 4.3.4)")
            geom_type = v
        elif f == FEATURE_GEOMETRY and w == WT_LEN:
            if geometry is not None and geometry.size > 0:
                raise FormatError("Feature has more than one geometry field")
            geometry = decode_varint_array(v)
            geometry_nbytes = len(v)
        # unknown fields / wrong wire types are skipped (feature.hpp:102)
    if geometry is None or geometry.size == 0:
        raise FormatError("Missing geometry field in feature (spec 4.2)")
    if tags is None:
        tags = np.empty(0, dtype=np.uint64)
    if tags.size % 2 != 0:
        raise FormatError("unpaired property key/value indexes (spec 4.4)")
    return Feature(fid, int(geom_type), geometry, geometry_nbytes, tags)


def _parse_features_fast(views: list[bytes]) -> list[Feature] | None:
    """Vectorized feature parse: a feature message contains only
    varint and LEN-of-varints fields, so the concatenation of all
    feature views is (normally) one contiguous varint stream — decode
    it once, then walk each feature over pre-decoded integers. Any
    alignment anomaly (fixed-wire field, payload ending mid-varint,
    truncation) falls back to the exact scalar parser for that feature
    (or the whole batch), so error semantics are identical.

    Returns None when the batch can't be globally decoded."""
    if not views:
        return []
    buf = b"".join(bytes(v) for v in views)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return [parse_feature(v) for v in views]
    is_end = (raw & 0x80) == 0
    lens = np.fromiter((len(v) for v in views), dtype=np.int64, count=len(views))
    offs = np.zeros(len(views) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    nonempty = offs[1:][lens > 0]
    if nonempty.size and not is_end[nonempty - 1].all():
        return None
    try:
        vals = decode_varint_array(raw)
    except FormatError:
        return None
    cnt_before = np.zeros(raw.size + 1, dtype=np.int64)
    np.cumsum(is_end, out=cnt_before[1:])
    ends = np.flatnonzero(is_end)
    starts_g = np.empty(ends.size, dtype=np.int64)
    if ends.size:
        starts_g[0] = 0
        starts_g[1:] = ends[:-1] + 1

    feats: list[Feature] = []
    for j in range(len(views)):
        b0, b1 = int(offs[j]), int(offs[j + 1])
        i, i_end = int(cnt_before[b0]), int(cnt_before[b1])
        fid: int | None = None
        gtype = 0
        geometry: np.ndarray | None = None
        gnb = 0
        tags: np.ndarray | None = None
        ok = True
        while i < i_end:
            key = int(vals[i])
            fld, wt = key >> 3, key & 0x7
            if fld == 0:
                raise FormatError("invalid field number 0")
            if wt == WT_VARINT:
                if i + 1 >= i_end:
                    ok = False
                    break
                v = int(vals[i + 1])
                i += 2
                if fld == FEATURE_ID:
                    fid = v
                elif fld == FEATURE_TYPE:
                    if v > 3:
                        raise FormatError("Unknown geometry type (spec 4.3.4)")
                    gtype = v
            elif wt == WT_LEN:
                if i + 1 >= i_end:
                    ok = False
                    break
                ln = int(vals[i + 1])
                if ln == 0:
                    cnt = 0
                else:
                    if i + 2 >= starts_g.size:
                        ok = False
                        break
                    ps = int(starts_g[i + 2])
                    pe = ps + ln
                    if pe > b1 or not is_end[pe - 1]:
                        ok = False
                        break
                    cnt = int(cnt_before[pe]) - int(cnt_before[ps])
                pv = vals[i + 2:i + 2 + cnt]
                i += 2 + cnt
                if fld == FEATURE_TAGS:
                    if tags is not None:
                        raise FormatError("Feature has more than one tags field")
                    tags = pv.astype(np.uint64)
                elif fld == FEATURE_GEOMETRY:
                    if geometry is not None and geometry.size > 0:
                        raise FormatError("Feature has more than one geometry field")
                    geometry = pv.astype(np.uint64)
                    gnb = ln
            else:
                ok = False  # fixed/unknown wire type: exact scalar semantics
                break
        if not ok:
            feats.append(parse_feature(views[j]))
            continue
        if geometry is None or geometry.size == 0:
            raise FormatError("Missing geometry field in feature (spec 4.2)")
        if tags is None:
            tags = np.empty(0, dtype=np.uint64)
        if tags.size % 2 != 0:
            raise FormatError("unpaired property key/value indexes (spec 4.4)")
        feats.append(Feature(fid, int(gtype), geometry, gnb, tags))
    return feats


def parse_features_block(views: list[bytes]):
    """COLUMNAR feature parse for the common emission pattern: every
    feature laid out as ``[type][id?][geometry][tags?]`` (the order
    build_feature and every encoder here emits, and what real tiles
    overwhelmingly carry).  The whole batch pre-decodes as one varint
    stream (the _parse_features_fast trick), then ids / geometry
    offsets / tag offsets come out as pure array gathers — ZERO
    per-feature Python objects.  Returns a dict of arrays
    (ids, has_id, gtypes, gflat, goff, gnb, tflat, toff) or None when
    any feature deviates from the pattern (unknown fields, fixed wire
    types, structural errors) — the caller then falls back to the
    per-feature parsers, which reproduce exact error semantics."""
    nf = len(views)
    empty = {
        "ids": np.empty(0, np.int64), "has_id": np.empty(0, bool),
        "gtypes": np.empty(0, np.int64),
        "gflat": np.empty(0, np.uint64), "goff": np.zeros(1, np.int64),
        "gnb": np.empty(0, np.int64),
        "tflat": np.empty(0, np.uint64), "toff": np.zeros(1, np.int64),
    }
    if nf == 0:
        return empty
    buf = b"".join(bytes(v) for v in views)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return None
    is_end = (raw & 0x80) == 0
    lens = np.fromiter((len(v) for v in views), dtype=np.int64, count=nf)
    offs = np.zeros(nf + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    nonempty = offs[1:][lens > 0]
    if nonempty.size and not is_end[nonempty - 1].all():
        return None
    try:
        vals = decode_varint_array(raw)
    except FormatError:
        return None
    cnt_before = np.zeros(raw.size + 1, dtype=np.int64)
    np.cumsum(is_end, out=cnt_before[1:])
    ends = np.flatnonzero(is_end)
    starts_g = np.empty(ends.size, dtype=np.int64)
    if ends.size:
        starts_g[0] = 0
        starts_g[1:] = ends[:-1] + 1
    nvals = vals.size
    i0 = cnt_before[offs[:-1]]
    iN = cnt_before[offs[1:]]
    # head: [24, gtype] then optionally [8, id]
    if (iN - i0 < 4).any():
        return None
    if not (vals[i0] == 24).all():
        return None
    gtypes = vals[i0 + 1].astype(np.int64)
    if (gtypes > 3).any():
        return None
    has_id = vals[i0 + 2] == 8
    idpos = i0 + 2 + np.where(has_id, 1, 0)
    if (idpos >= np.minimum(iN, nvals)).any():
        return None
    ids_u = np.where(has_id, vals[np.minimum(idpos, nvals - 1)],
                     np.uint64(0))
    if (ids_u >= np.uint64(1) << np.uint64(63)).any():
        return None
    ids = ids_u.astype(np.int64)
    gk = i0 + 2 + 2 * has_id          # geometry key position
    if (gk + 1 >= iN).any():
        return None
    if not (vals[gk] == 34).all():
        return None
    gnb = vals[gk + 1].astype(np.int64)
    if (gnb <= 0).any():
        return None
    gp0 = gk + 2                       # first geometry varint index
    if (gp0 >= starts_g.size).any():
        return None
    ps = starts_g[gp0]
    pe = ps + gnb
    if (pe > offs[1:]).any() or not is_end[pe - 1].all():
        return None
    cnt_g = cnt_before[pe] - cnt_before[ps]
    j = gp0 + cnt_g                    # position after geometry
    has_tags = j < iN
    cnt_t = np.zeros(nf, np.int64)
    tp0 = np.zeros(nf, np.int64)
    if has_tags.any():
        jt = j[has_tags]
        if (jt + 1 >= iN[has_tags]).any():
            return None
        if not (vals[jt] == 18).all():
            return None
        tnb = vals[jt + 1].astype(np.int64)
        nonz = tnb > 0
        ct = np.zeros(jt.size, np.int64)
        if nonz.any():
            jtz = jt[nonz] + 2
            if (jtz >= starts_g.size).any():
                return None
            ts = starts_g[jtz]
            te = ts + tnb[nonz]
            if (te > offs[1:][has_tags][nonz]).any() \
                    or not is_end[te - 1].all():
                return None
            ct[nonz] = cnt_before[te] - cnt_before[ts]
        if ((jt + 2 + ct) != iN[has_tags]).any():
            return None
        if (ct % 2 != 0).any():
            return None
        cnt_t[has_tags] = ct
        tp0[has_tags] = jt + 2
    if ((~has_tags) & (j != iN)).any():
        return None

    def _gather(p0: np.ndarray, cnt: np.ndarray) -> np.ndarray:
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, np.uint64)
        starts = np.cumsum(cnt) - cnt
        gi = np.arange(total) - np.repeat(starts, cnt) \
            + np.repeat(p0, cnt)
        return vals[gi]

    goff = np.zeros(nf + 1, np.int64)
    np.cumsum(cnt_g, out=goff[1:])
    toff = np.zeros(nf + 1, np.int64)
    np.cumsum(cnt_t, out=toff[1:])
    return {
        "ids": ids, "has_id": has_id, "gtypes": gtypes,
        "gflat": _gather(gp0, cnt_g), "goff": goff, "gnb": gnb,
        "tflat": _gather(tp0, cnt_t), "toff": toff,
    }


def parse_layer(buf: bytes, *, parse_features: bool = True) -> Layer:
    version: int | None = None
    name: bytes | None = None
    extent: int | None = None
    keys: list[bytes] = []
    values: list[bytes] = []
    feature_views: list[bytes] = []
    for f, w, v in scan_fields(buf):
        if f == LAYER_VERSION and w == WT_VARINT:
            version = v
        elif f == LAYER_NAME and w == WT_LEN:
            name = v
        elif f == LAYER_FEATURES and w == WT_LEN:
            feature_views.append(v)
        elif f == LAYER_KEYS and w == WT_LEN:
            keys.append(v)
        elif f == LAYER_VALUES and w == WT_LEN:
            values.append(v)
        elif f == LAYER_EXTENT and w == WT_VARINT:
            extent = v
        else:
            raise FormatError(f"unknown field in layer (tag={f}, type={w})")
    version = 1 if version is None else version
    if version < 1 or version > 2:
        raise VersionError(version)
    if name is None:
        raise FormatError("missing name field in layer (spec 4.1)")
    layer = Layer(
        name=name.decode("utf-8", errors="surrogateescape"),
        version=version,
        extent=4096 if extent is None else extent,
        keys=keys,
        values=values,
        raw=buf,
    )
    if parse_features:
        fast = _parse_features_fast(feature_views)
        layer.features = fast if fast is not None \
            else [parse_feature(fv) for fv in feature_views]
    else:
        layer.features = []
        layer.num_feature_views = len(feature_views)  # type: ignore[attr-defined]
        layer.feature_views = feature_views  # type: ignore[attr-defined]
    return layer


def parse_tile(buf: bytes, *, parse_features: bool = True) -> list[Layer]:
    return [parse_layer(lv, parse_features=parse_features) for lv in tile_layer_views(buf)]


def get_layer(buf: bytes, selector: str) -> Layer | None:
    """CLI layer selector (examples/utils.cpp:78-100): an all-digits
    selector picks the layer by zero-based position, anything else by
    name (first match, like get_layer_by_name); None when absent."""
    views = tile_layer_views(buf)
    if selector.isdigit():
        idx = int(selector)
        return parse_layer(views[idx]) if idx < len(views) else None
    for v in views:
        if layer_name_only(v) == selector:
            return parse_layer(v)
    return None


# -------------------------------------------------------------------- build

def build_feature(
    fid: int | None,
    geom_type: int,
    geometry: np.ndarray,
    tags: np.ndarray | list[int] | None = None,
) -> bytes:
    """Feature message bytes in vtzero's emission order:
    type, id, geometry, tags (builder.hpp:596-599,429-436; tags last via
    prepare_to_add_property, builder.hpp:384-394)."""
    parts = [varint_field(FEATURE_TYPE, int(geom_type))]
    if fid is not None:
        parts.append(varint_field(FEATURE_ID, int(fid)))
    geom_bytes = encode_varint_array(
        np.ascontiguousarray(geometry, dtype=np.int64).astype(np.uint64)
    )
    parts.append(len_field(FEATURE_GEOMETRY, geom_bytes))
    if tags is not None:
        tag_arr = np.ascontiguousarray(tags, dtype=np.uint64)
        if tag_arr.size:
            parts.append(len_field(FEATURE_TAGS, encode_varint_array(tag_arr)))
    return b"".join(parts)


def build_layer(
    name: str | bytes,
    feature_blobs: list[bytes],
    keys: list[bytes],
    values: list[bytes],
    version: int = 2,
    extent: int = 4096,
) -> bytes:
    """Layer message bytes: version, name, extent up front
    (builder_impl.hpp:157-166), then features, keys, values
    (builder_impl.hpp:253-258)."""
    name_b = name.encode("utf-8") if isinstance(name, str) else bytes(name)
    out = [
        varint_field(LAYER_VERSION, version),
        len_field(LAYER_NAME, name_b),
        varint_field(LAYER_EXTENT, extent),
    ]
    out.extend(len_field(LAYER_FEATURES, fb) for fb in feature_blobs)
    out.extend(len_field(LAYER_KEYS, k) for k in keys)
    out.extend(len_field(LAYER_VALUES, v) for v in values)
    return b"".join(out)


def build_tile(layer_blobs: list[bytes], *, num_features: list[int] | None = None) -> bytes:
    """Tile bytes from encoded layer messages, in order. When
    ``num_features`` is given, layers with zero features are omitted
    (builder_impl.hpp:225-227,253-258); passthrough layers (existing
    encoded bytes, add_existing_layer) should be passed without counts
    and are emitted verbatim."""
    parts = []
    for i, lb in enumerate(layer_blobs):
        if num_features is not None and num_features[i] == 0:
            continue
        parts.append(len_field(TILE_LAYERS, lb))
    return b"".join(parts)


class DictBuilder:
    """First-appearance key/value dictionary, mirroring
    layer_builder::add_key/add_value dedup semantics
    (builder_impl.hpp:104-147,180-207): the first insertion wins and
    indexes are insertion-ordered."""

    def __init__(self) -> None:
        self._index: dict[bytes, int] = {}
        self.table: list[bytes] = []

    def add(self, item: bytes) -> int:
        idx = self._index.get(item)
        if idx is None:
            idx = len(self.table)
            self._index[item] = idx
            self.table.append(item)
        return idx


def assemble_layer(
    name: str,
    features: list[tuple[int | None, int, np.ndarray, list[tuple[bytes, bytes]]]],
    version: int = 2,
    extent: int = 4096,
) -> bytes:
    """Encode features (id, geom_type, geometry_cmds, [(key, value_bytes)])
    into a complete layer, building the dictionaries in first-appearance
    order exactly like repeated add_property calls would."""
    kd = DictBuilder()
    vd = DictBuilder()
    blobs = []
    for fid, gtype, cmds, props in features:
        tags: list[int] = []
        for k, v in props:
            tags.append(kd.add(k))
            tags.append(vd.add(v))
        blobs.append(build_feature(fid, gtype, cmds, tags))
    return build_layer(name, blobs, kd.table, vd.table, version=version, extent=extent)
