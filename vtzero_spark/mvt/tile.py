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
        layer.features = [parse_feature(fv) for fv in feature_views]
    else:
        layer.features = []
        layer.num_feature_views = len(feature_views)  # type: ignore[attr-defined]
    return layer


def parse_tile(buf: bytes, *, parse_features: bool = True) -> list[Layer]:
    return [parse_layer(lv, parse_features=parse_features) for lv in tile_layer_views(buf)]


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
