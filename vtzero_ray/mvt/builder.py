"""Tile/layer/feature builders replicating vtzero's builder semantics.

What is preserved from the reference (cited per item):

- Layer header byte order: version(15), name(1), extent(5), then feature
  submessages, with keys/values tables in separate buffers concatenated at
  serialize (/root/reference/include/vtzero/builder_impl.hpp:43-53,157-166,
  244-259).
- Feature wire order: type(3) written at construction, then optional id(1),
  then packed geometry(4), then packed tags(2)
  (/root/reference/include/vtzero/builder.hpp:587-600 and
  feature_builder_impl.hpp:65-68,105-118).
- Interning: first-occurrence-wins dedup with stable index assignment,
  plus ``*_without_dup_check`` append paths
  (/root/reference/include/vtzero/builder_impl.hpp:104-207). A plain Python
  dict reproduces the reference's flat-scan→hash two-phase lookup results
  exactly for the dup-checking path.
- Rollback discards the feature message but NOT table entries interned via
  add_property — the reference appends to the key/value buffers eagerly and
  only truncates the feature buffer (feature_builder_impl.hpp:113-118).
- Empty layers (0 features) are dropped at serialize; existing-layer copies
  are emitted verbatim (/root/reference/include/vtzero/builder_impl.hpp:244-259).
"""

from __future__ import annotations

import numpy as np

from ..exceptions import GeometryError
from . import values as _values
from .codec import (
    CMD_CLOSE_PATH,
    CMD_LINE_TO,
    CMD_MOVE_TO,
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    command_integer,
)
from .pbf import (
    encode_varint,
    encode_varints_np,
    field_bytes,
    field_varint,
    zigzag_encode32,
)

# pbf field numbers (types.hpp:92-114)
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


class LayerBuilder:
    """Builds one layer; owns the interning tables (T2 in SURVEY.md §2.3)."""

    __slots__ = (
        "name", "version", "extent",
        "_header", "_features", "_keys_data", "_values_data",
        "_keys_index", "_values_index",
        "num_features", "num_keys", "num_values",
    )

    def __init__(self, name: str | bytes, version: int = 2, extent: int = 4096) -> None:
        if isinstance(name, str):
            name = name.encode("utf-8")
        self.name = name
        self.version = version
        self.extent = extent
        # header order: version, name, extent (builder_impl.hpp:157-166)
        self._header = (
            field_varint(LAYER_VERSION, version)
            + field_bytes(LAYER_NAME, name)
            + field_varint(LAYER_EXTENT, extent)
        )
        self._features: list[bytes] = []
        self._keys_data = bytearray()
        self._values_data = bytearray()
        self._keys_index: dict[bytes, int] = {}
        self._values_index: dict[bytes, int] = {}
        self.num_features = 0
        self.num_keys = 0
        self.num_values = 0

    # -- interning (builder_impl.hpp:104-207) -------------------------------

    def add_key_without_dup_check(self, key: bytes) -> int:
        self._keys_data += field_bytes(LAYER_KEYS, key)
        idx = self.num_keys
        self.num_keys += 1
        return idx

    def add_key(self, key: str | bytes) -> int:
        if isinstance(key, str):
            key = key.encode("utf-8")
        idx = self._keys_index.get(key)
        if idx is None:
            idx = self.add_key_without_dup_check(key)
            self._keys_index[key] = idx
        return idx

    def add_value_without_dup_check(self, blob: bytes) -> int:
        self._values_data += field_bytes(LAYER_VALUES, blob)
        idx = self.num_values
        self.num_values += 1
        return idx

    def add_value(self, blob: bytes) -> int:
        idx = self._values_index.get(blob)
        if idx is None:
            idx = self.add_value_without_dup_check(blob)
            self._values_index[blob] = idx
        return idx

    # -- feature append ------------------------------------------------------

    def add_feature_encoded(
        self,
        geom_type: int,
        cmds: np.ndarray | None,
        feature_id: int | None = None,
        props: list[tuple] | None = None,
        geom_payload: bytes | None = None,
    ) -> None:
        """Append a complete feature from pre-encoded geometry commands.

        ``props`` is a list of (key, value) where key is str/bytes (interned
        here) or int (pre-resolved index) and value is an encoded value blob
        (bytes) or int index. ``geom_payload`` lets a vectorized caller pass
        the varint-encoded geometry bytes directly (computed in one batch
        pass, see stages/encode_lines.py) instead of per-feature ``cmds``.
        This is the vectorizable fast path used by the tile-encoder stage;
        byte output is identical to the scalar builders.
        """
        body = bytearray()
        body += field_varint(FEATURE_TYPE, geom_type)
        if feature_id is not None:
            body += field_varint(FEATURE_ID, feature_id)
        if geom_payload is None:
            geom_payload = encode_varints_np(np.asarray(cmds, dtype=np.uint32))
        body += field_bytes(FEATURE_GEOMETRY, geom_payload)
        if props:
            tag_ids = []
            for key, value in props:
                tag_ids.append(key if isinstance(key, int) else self.add_key(key))
                tag_ids.append(value if isinstance(value, int) else self.add_value(value))
            body += field_bytes(
                FEATURE_TAGS,
                encode_varints_np(np.asarray(tag_ids, dtype=np.uint64)),
            )
        self._features.append(field_bytes(LAYER_FEATURES, bytes(body)))
        self.num_features += 1

    def _append_raw_feature(self, body: bytes) -> None:
        self._features.append(field_bytes(LAYER_FEATURES, body))
        self.num_features += 1

    def copy_feature(self, feature) -> int:
        """Copy a decoded feature wholesale (layer_builder::add_feature,
        builder.hpp:1350-1361): geometry blob passes through undecoded,
        properties re-interned by value."""
        fb = GeometryFeatureBuilder(self)
        if feature.has_id:
            fb.set_id(feature.id)
        fb.set_geometry(feature.geom_type, feature.geometry_data)
        for key, blob in feature.properties_raw():
            fb.add_property(key, raw=blob)
        fb.commit()
        return 1

    # -- serialize -----------------------------------------------------------

    def payload(self) -> bytes:
        """layer message = header + features + keys + values
        (builder_impl.hpp:244-259: add_bytes_vectored of the 3 buffers)."""
        return self._header + b"".join(self._features) + bytes(self._keys_data) + bytes(self._values_data)

    def estimated_size(self) -> int:
        """Serialized-size estimate incl. 8-byte pbf overhead
        (builder_impl.hpp:229-242) — drives skew splitting (A4)."""
        return (len(self._header) + sum(len(f) for f in self._features)
                + len(self._keys_data) + len(self._values_data) + 8)


class _ExistingLayer:
    __slots__ = ("data",)

    def __init__(self, data: bytes) -> None:
        self.data = data


class TileBuilder:
    """Assembles layers into one tile (builder.hpp:53-171)."""

    def __init__(self) -> None:
        self._layers: list[LayerBuilder | _ExistingLayer] = []

    def add_layer(self, name: str | bytes, version: int = 2, extent: int = 4096) -> LayerBuilder:
        lb = LayerBuilder(name, version, extent)
        self._layers.append(lb)
        return lb

    def add_layer_from(self, layer) -> LayerBuilder:
        """New empty layer with an existing layer's name/version/extent
        (builder.hpp:66-70)."""
        return self.add_layer(layer.name, layer.version, layer.extent)

    def add_existing_layer(self, data: bytes) -> None:
        """Existing serialized layer passes through verbatim
        (builder.hpp:119-132) — the load-bearing merge primitive for salted
        hot-tile splitting (SURVEY.md §4)."""
        self._layers.append(_ExistingLayer(bytes(data)))

    def estimated_size(self) -> int:
        """Sum of per-layer estimates (builder.hpp:145-147)."""
        return sum(
            len(l.data) + 8 if isinstance(l, _ExistingLayer) else l.estimated_size()
            for l in self._layers
        )

    def serialize(self) -> bytes:
        out = bytearray()
        for layer in self._layers:
            if isinstance(layer, _ExistingLayer):
                out += field_bytes(TILE_LAYERS, layer.data)
            elif layer.num_features > 0:
                # empty layers dropped (builder_impl.hpp:252-258)
                out += field_bytes(TILE_LAYERS, layer.payload())
        return bytes(out)


# ---------------------------------------------------------------------------
# Scalar feature builders (state-machine parity with builder.hpp:310-1348)
# ---------------------------------------------------------------------------


class _FeatureBuilderBase:
    """Shared state machine: id → geometry → properties → commit/rollback."""

    geom_type: int = 0

    def __init__(self, layer: LayerBuilder) -> None:
        self._layer = layer
        self._head = bytearray(field_varint(FEATURE_TYPE, self.geom_type))
        self._geom: list[int] = []          # command stream (u32s)
        self._tags: list[int] = []
        self._geom_open = False
        self._geom_done = False
        self._tags_open = False
        self._done = False
        self._num_points = 0
        self._cursor = (0, 0)

    # -- id -------------------------------------------------------------

    def set_id(self, feature_id: int) -> None:
        assert not self._done, "Can not call set_id() after commit() or rollback()"
        assert not self._geom_open and not self._geom_done and not self._tags_open, \
            "Call set_id() before setting the geometry or adding properties"
        self._head += field_varint(FEATURE_ID, feature_id)

    def copy_id(self, feature) -> None:
        if feature.has_id:
            self.set_id(feature.id)

    # -- properties -------------------------------------------------------

    def _prepare_to_add_property(self) -> None:
        if self._geom_open:
            assert self._num_points == 0, "not enough calls to set_point()"
            self._geom_open = False
            self._geom_done = True
        self._tags_open = True

    def add_property(self, key, value=None, *, raw: bytes | None = None, type_hint: int | None = None) -> None:
        assert not self._done, "Can not call add_property() after commit() or rollback()"
        self._prepare_to_add_property()
        # interning happens EAGERLY, surviving rollback (see module docstring)
        kidx = key if isinstance(key, int) else self._layer.add_key(key)
        if raw is not None:
            vidx = self._layer.add_value(bytes(raw))
        else:
            vidx = self._layer.add_value(_values.encode_value(value, type_hint))
        self._tags.append(kidx)
        self._tags.append(vidx)

    def add_property_indexes(self, kidx: int, vidx: int) -> None:
        """Add a property from pre-resolved table indexes (index_value_pair)."""
        assert not self._done, "Can not call add_property() after commit() or rollback()"
        self._prepare_to_add_property()
        self._tags.append(kidx)
        self._tags.append(vidx)

    def copy_properties(self, feature, mapper=None) -> None:
        if mapper is not None:
            for kidx, vidx in feature.tag_pairs():
                nk, nv = mapper.map(kidx, vidx)
                self._prepare_to_add_property()
                self._tags.append(nk)
                self._tags.append(nv)
            return
        for key, blob in feature.properties_raw():
            self.add_property(key, raw=blob)

    # -- commit / rollback --------------------------------------------------

    def commit(self) -> None:
        if self._done:
            return
        assert self._geom_open or self._geom_done or self._tags_open, \
            "Can not call commit before geometry was added"
        if self._geom_open:
            assert self._num_points == 0, "not enough calls to set_point()"
        body = bytes(self._head)
        if self._geom:
            body += field_bytes(FEATURE_GEOMETRY, encode_varints_np(np.asarray(self._geom, dtype=np.uint32)))
        if self._tags:
            # protozero erases empty packed fields on commit, so an empty
            # tags field produces no bytes
            body += field_bytes(FEATURE_TAGS, encode_varints_np(np.asarray(self._tags, dtype=np.uint64)))
        self._layer._append_raw_feature(body)
        self._done = True

    def rollback(self) -> None:
        self._done = True

    # -- geometry emit helpers ------------------------------------------

    def _emit_point(self, x: int, y: int) -> None:
        cx, cy = self._cursor
        self._geom.append(zigzag_encode32(x - cx))
        self._geom.append(zigzag_encode32(y - cy))
        self._cursor = (x, y)


def _check_num_points(n: int) -> int:
    if n >= (1 << 29):
        raise GeometryError("Maximum of 2^29 - 1 points allowed in geometry")
    return n


class PointFeatureBuilder(_FeatureBuilderBase):
    """builder.hpp:587-755."""

    geom_type = GEOM_POINT

    def add_point(self, x: int, y: int) -> None:
        assert not self._done, "Can not add geometry after commit() or rollback()"
        assert not self._geom_open and not self._geom_done and not self._tags_open, \
            "add_point() can only be called once"
        self._geom_open = True
        self._geom.append(command_integer(CMD_MOVE_TO, 1))
        self._emit_point(x, y)

    def add_points(self, count: int) -> None:
        assert not self._done, "Can not add geometry after commit() or rollback()"
        assert not self._geom_open and not self._geom_done, \
            "can not call add_points() twice or mix with add_point()"
        assert not self._tags_open, "add_points() has to be called before properties are added"
        assert 0 < count < (1 << 29), "add_points() must be called with 0 < count < 2^29"
        self._num_points = count
        self._geom_open = True
        self._geom.append(command_integer(CMD_MOVE_TO, count))

    def set_point(self, x: int, y: int) -> None:
        assert self._geom_open, "call add_points() before set_point()"
        assert not self._tags_open, "set_point() has to be called before properties are added"
        assert self._num_points > 0, "too many calls to set_point()"
        self._num_points -= 1
        self._emit_point(x, y)

    def add_points_from_container(self, points) -> None:
        self.add_points(_check_num_points(len(points)))
        for x, y in points:
            self.set_point(x, y)


class LinestringFeatureBuilder(_FeatureBuilderBase):
    """builder.hpp:778-928."""

    geom_type = GEOM_LINESTRING

    def __init__(self, layer: LayerBuilder) -> None:
        super().__init__(layer)
        self._start_line = False

    def add_linestring(self, count: int) -> None:
        assert not self._done, "Can not add geometry after commit() or rollback()"
        assert not self._tags_open, "add_linestring() has to be called before properties are added"
        assert 1 < count < (1 << 29), "add_linestring() must be called with 1 < count < 2^29"
        assert self._num_points == 0, "not enough calls to set_point()"
        self._geom_open = True
        self._num_points = count
        self._start_line = True

    def set_point(self, x: int, y: int) -> None:
        assert self._geom_open, "call add_linestring() before set_point()"
        assert not self._tags_open, "set_point() has to be called before properties are added"
        assert self._num_points > 0, "too many calls to set_point()"
        self._num_points -= 1
        if self._start_line:
            self._geom.append(command_integer(CMD_MOVE_TO, 1))
            self._emit_point(x, y)
            self._geom.append(command_integer(CMD_LINE_TO, self._num_points))
            self._start_line = False
        else:
            if (x, y) == self._cursor:
                raise GeometryError("Zero-length segments in linestrings are not allowed.")
            self._emit_point(x, y)

    def add_linestring_from_container(self, points) -> None:
        self.add_linestring(_check_num_points(len(points)))
        for x, y in points:
            self.set_point(x, y)


class PolygonFeatureBuilder(_FeatureBuilderBase):
    """builder.hpp:951-1141."""

    geom_type = GEOM_POLYGON

    def __init__(self, layer: LayerBuilder) -> None:
        super().__init__(layer)
        self._start_ring = False
        self._first_point = (0, 0)

    def add_ring(self, count: int) -> None:
        assert not self._done, "Can not add geometry after commit() or rollback()"
        assert not self._tags_open, "add_ring() has to be called before properties are added"
        assert 3 < count < (1 << 29), "add_ring() must be called with 3 < count < 2^29"
        assert self._num_points == 0, "not enough calls to set_point()"
        self._geom_open = True
        self._num_points = count
        self._start_ring = True

    def set_point(self, x: int, y: int) -> None:
        assert self._geom_open, "call add_ring() before set_point()"
        assert not self._tags_open, "set_point() has to be called before properties are added"
        assert self._num_points > 0, "too many calls to set_point()"
        self._num_points -= 1
        if self._start_ring:
            self._first_point = (x, y)
            self._geom.append(command_integer(CMD_MOVE_TO, 1))
            self._emit_point(x, y)
            self._geom.append(command_integer(CMD_LINE_TO, self._num_points - 1))
            self._start_ring = False
        elif self._num_points == 0:
            if (x, y) != self._first_point:
                raise GeometryError("Last point in a ring must be the same as the first point.")
            # cursor intentionally NOT moved (builder.hpp:1041-1047)
            self._geom.append(command_integer(CMD_CLOSE_PATH, 1))
        else:
            if (x, y) == self._cursor:
                raise GeometryError("Zero-length segments in rings are not allowed.")
            self._emit_point(x, y)

    def close_ring(self) -> None:
        assert self._geom_open, "Call add_ring() before you can call close_ring()"
        assert self._num_points == 1, "wrong number of points in ring"
        self._geom.append(command_integer(CMD_CLOSE_PATH, 1))
        self._num_points -= 1

    def add_ring_from_container(self, points) -> None:
        self.add_ring(_check_num_points(len(points)))
        for x, y in points:
            self.set_point(x, y)


class GeometryFeatureBuilder(_FeatureBuilderBase):
    """Re-attach an already-encoded geometry (builder.hpp:1163-1348, T7).

    Wire order differs from the typed builders: optional id(1) first, then
    type(3) + geometry(4) together in set_geometry (builder.hpp:1208-1249),
    then tags(2).
    """

    def __init__(self, layer: LayerBuilder) -> None:
        super().__init__(layer)
        self._head = bytearray()  # id goes first; type written by set_geometry
        self._geom_payload: bytes | None = None

    def set_id(self, feature_id: int) -> None:
        assert not self._done, "Can not call set_id() after commit() or rollback()"
        assert self._geom_payload is None and not self._tags_open, \
            "Call set_id() before set_geometry()"
        self._head += field_varint(FEATURE_ID, feature_id)

    def set_geometry(self, geom_type: int, geometry_payload: bytes) -> None:
        """geometry_payload is the raw packed-field bytes, passed through
        without decoding (opaque `geometry_cmds` passthrough, SURVEY §2.3 T7)."""
        assert not self._done, "Can not add geometry after commit() or rollback()"
        assert not self._tags_open
        self._head += field_varint(FEATURE_TYPE, geom_type)
        self._head += field_bytes(FEATURE_GEOMETRY, bytes(geometry_payload))
        self._geom_payload = bytes(geometry_payload)
        self._geom_done = True

    def commit(self) -> None:
        if self._done:
            return
        assert self._geom_payload is not None, "Can not call commit before geometry was added"
        body = bytes(self._head)
        if self._tags:
            body += field_bytes(FEATURE_TAGS, encode_varints_np(np.asarray(self._tags, dtype=np.uint64)))
        self._layer._append_raw_feature(body)
        self._done = True


class PropertyMapper:
    """Old-table-index → new-table-index memo (property_mapper.hpp:31-99)."""

    def __init__(self, src_layer, dst_builder: LayerBuilder) -> None:
        self._src = src_layer
        self._dst = dst_builder
        self._keys: list[int | None] = [None] * len(src_layer.key_table())
        self._values: list[int | None] = [None] * len(src_layer.value_table())

    def map_key(self, idx: int) -> int:
        k = self._keys[idx]
        if k is None:
            k = self._dst.add_key_without_dup_check(self._src.key_table()[idx])
            self._keys[idx] = k
        return k

    def map_value(self, idx: int) -> int:
        v = self._values[idx]
        if v is None:
            v = self._dst.add_value_without_dup_check(self._src.value_table()[idx])
            self._values[idx] = v
        return v

    def map(self, kidx: int, vidx: int) -> tuple[int, int]:
        return self.map_key(kidx), self.map_value(vidx)
