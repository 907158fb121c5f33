"""The 7-variant MVT property value codec.

Values are stored pre-encoded as protobuf blobs, exactly like the
reference's encoded_property_value
(/root/reference/include/vtzero/encoded_property_value.hpp:33-187) so the
interning tables can dedup on raw bytes (the canonical byte-identical
strategy, see value_index_internal at
/root/reference/include/vtzero/index.hpp:224-260).

Value message tag layout (types.hpp:70-78):
string=1(len), float=2(fixed32), double=3(fixed64), int=4(varint int64),
uint=5(varint), sint=6(zigzag varint), bool=7(varint).
"""

from __future__ import annotations

import struct

from ..exceptions import FormatError, TypeError_
from .pbf import (
    WT_FIXED32,
    WT_FIXED64,
    WT_LEN,
    WT_VARINT,
    encode_varint,
    iter_fields,
    zigzag_decode64,
    zigzag_encode64,
)

VT_STRING = 1
VT_FLOAT = 2
VT_DOUBLE = 3
VT_INT = 4
VT_UINT = 5
VT_SINT = 6
VT_BOOL = 7

TYPE_NAMES = ("", "string", "float", "double", "int", "uint", "sint", "bool")

_WIRE_FOR_TYPE = {
    VT_STRING: WT_LEN,
    VT_FLOAT: WT_FIXED32,
    VT_DOUBLE: WT_FIXED64,
    VT_INT: WT_VARINT,
    VT_UINT: WT_VARINT,
    VT_SINT: WT_VARINT,
    VT_BOOL: WT_VARINT,
}

_U64 = (1 << 64) - 1


def encode_string(value: str | bytes) -> bytes:
    if isinstance(value, str):
        value = value.encode("utf-8")
    return b"\x0a" + encode_varint(len(value)) + value


def encode_float(value: float) -> bytes:
    return b"\x15" + struct.pack("<f", value)


def encode_double(value: float) -> bytes:
    return b"\x19" + struct.pack("<d", value)


def encode_int(value: int) -> bytes:
    # protozero add_int64: negative values use the 10-byte two's complement
    return b"\x20" + encode_varint(value & _U64)


def encode_uint(value: int) -> bytes:
    if value < 0:
        raise ValueError("uint value must be non-negative")
    return b"\x28" + encode_varint(value)


def encode_sint(value: int) -> bytes:
    return b"\x30" + encode_varint(zigzag_encode64(value))


def encode_bool(value: bool) -> bytes:
    return b"\x38" + (b"\x01" if value else b"\x00")


def encode_value(value, type_hint: int | None = None) -> bytes:
    """Encode a Python value into an MVT value blob.

    Default mapping mirrors encoded_property_value's overloads: str/bytes →
    string, float → double (Python floats are doubles), int → int, bool →
    bool. Pass ``type_hint`` for float/uint/sint.
    """
    if type_hint is not None:
        return _ENCODERS[type_hint](value)
    if isinstance(value, bool):
        return encode_bool(value)
    if isinstance(value, (str, bytes)):
        return encode_string(value)
    if isinstance(value, float):
        return encode_double(value)
    if isinstance(value, int):
        return encode_int(value)
    raise ValueError(f"cannot encode property value of type {type(value)!r}")


_ENCODERS = {
    VT_STRING: encode_string,
    VT_FLOAT: encode_float,
    VT_DOUBLE: encode_double,
    VT_INT: encode_int,
    VT_UINT: encode_uint,
    VT_SINT: encode_sint,
    VT_BOOL: lambda v: encode_bool(bool(v)),
}


def value_type(blob: bytes) -> int:
    """Return the type of an encoded value blob.

    Mirrors property_value::type() (property_value.hpp:132-146): looks at
    the FIRST field only; illegal tag/wire combination → format error.
    """
    for field, wt, _ in iter_fields(blob):
        if field < VT_STRING or field > VT_BOOL or _WIRE_FOR_TYPE[field] != wt:
            raise FormatError("illegal property value type")
        return field
    raise FormatError("missing tag value")


def decode_value(blob: bytes, expected_type: int | None = None):
    """Decode a value blob → (type, python value).

    Last-field-wins on repeated fields of the matching type, like
    property_value::get_value (property_value.hpp:86-103). If
    ``expected_type`` is given and no field of that type+wire exists, raises
    TypeError_ ("wrong property value type").
    """
    if expected_type is not None:
        want_wire = _WIRE_FOR_TYPE[expected_type]
        result = None
        found = False
        for field, wt, raw in iter_fields(blob):
            if field == expected_type and wt == want_wire:
                result = _decode_one(field, raw)
                found = True
        if not found:
            raise TypeError_()
        return expected_type, result
    vt = value_type(blob)
    return decode_value(blob, vt)


def apply_visitor(visitor, blob: bytes):
    """Runtime-type dispatch to a visitor (property_value.hpp:270-288, M9).

    ``visitor`` exposes visit_string/visit_float/visit_double/visit_int/
    visit_uint/visit_sint/visit_bool (missing methods fall back to
    ``visit_default`` if present); returns the visit method's result.
    """
    vt, val = decode_value(blob)
    name = "visit_" + TYPE_NAMES[vt]
    fn = getattr(visitor, name, None) or getattr(visitor, "visit_default", None)
    if fn is None:
        raise AttributeError(f"visitor has no {name} or visit_default")
    return fn(val)


def convert_value(blob: bytes, mapping: dict | None = None):
    """Convert an encoded value via a type→converter mapping
    (convert_property_value + property_value_mapping,
    property_value.hpp:329-394). Unmapped types pass through."""
    vt, val = decode_value(blob)
    if mapping and vt in mapping:
        return mapping[vt](val)
    return val


def _decode_one(field: int, raw):
    if field == VT_STRING:
        return bytes(raw)
    if field == VT_FLOAT:
        return struct.unpack("<f", raw)[0]
    if field == VT_DOUBLE:
        return struct.unpack("<d", raw)[0]
    if field == VT_INT:
        v = raw
        return v - (1 << 64) if v >= (1 << 63) else v
    if field == VT_UINT:
        return raw
    if field == VT_SINT:
        return zigzag_decode64(raw)
    if field == VT_BOOL:
        return bool(raw)
    raise FormatError("illegal property value type")
