"""MySQL binary JSON codec.

Decodes MySQL's binary JSON column format (type byte 0-15, offset
tables for objects/arrays, inline small values, opaque typed values)
into JSON text, with output formatting matching the reference connector
(reference: src/json_decoder.zig:193-702; format doc:
https://dev.mysql.com/doc/dev/mysql-server/latest/json__binary_8h.html).

Notable reference behaviors preserved:
- MariaDB passthrough: first byte > 0x0f ⇒ payload is already UTF-8 JSON text;
- object/array output uses ``", "`` element separators and ``": "`` after keys;
- opaque DECIMAL decodes via the decimal codec; opaque DATE/TIME fall back to
  hex strings; unknown opaque types render ``"<type-N:hex>"``.

The encoder exists for the synthetic binlog writer (fixtures) and emits
the "small" format (2-byte counts/offsets).
"""

from __future__ import annotations

import struct
from typing import Any

from .decimal_codec import decode_decimal, encode_decimal

J_SMALL_OBJECT = 0
J_LARGE_OBJECT = 1
J_SMALL_ARRAY = 2
J_LARGE_ARRAY = 3
J_LITERAL = 4
J_INT16 = 5
J_UINT16 = 6
J_INT32 = 7
J_UINT32 = 8
J_INT64 = 9
J_UINT64 = 10
J_DOUBLE = 11
J_STRING = 12
J_OPAQUE = 15

_ESCAPES = {
    ord('"'): '\\"',
    ord("\\"): "\\\\",
    ord("\n"): "\\n",
    ord("\r"): "\\r",
    ord("\t"): "\\t",
}


def _fmt_double(v: float) -> str:
    """Shortest decimal form, integral doubles without a trailing .0."""
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _escape_json_bytes(raw: bytes, out: list[str]) -> None:
    # decode UTF-8 first (the reference emits raw bytes into a byte
    # buffer — decoding, not byte-wise chr(), is the str equivalent),
    # then escape with the C json escaper (same rules: \" \\ \n \r \t,
    # \u00XX for other control chars).
    from json.encoder import encode_basestring

    out.append(encode_basestring(raw.decode("utf-8", "replace")))


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    """JSON-format varint: 7 data bits per byte, MSB = continuation."""
    length = 0
    for i in range(5):
        if pos >= len(data):
            raise ValueError("invalid json varint")
        b = data[pos]
        pos += 1
        length |= (b & 0x7F) << (7 * i)
        if (b & 0x80) == 0:
            return length, pos
    raise ValueError("invalid json varint")


def decode_json(data: bytes) -> str:
    """MySQL binary JSON → JSON text."""
    if len(data) == 0:
        return "null"
    if data[0] > 0x0F:
        # MariaDB stores JSON as plain UTF-8 text
        return data.decode("utf-8", errors="replace")
    out: list[str] = []
    _decode_value(data, data[0], 1, out)
    return "".join(out)


def _decode_value(data: bytes, jtype: int, pos: int, out: list[str]) -> None:
    if jtype == J_SMALL_OBJECT:
        _decode_container(data, pos, out, small=True, is_array=False)
    elif jtype == J_LARGE_OBJECT:
        _decode_container(data, pos, out, small=False, is_array=False)
    elif jtype == J_SMALL_ARRAY:
        _decode_container(data, pos, out, small=True, is_array=True)
    elif jtype == J_LARGE_ARRAY:
        _decode_container(data, pos, out, small=False, is_array=True)
    elif jtype == J_LITERAL:
        out.append(("null", "true", "false")[data[pos]])
    elif jtype == J_INT16:
        out.append(str(struct.unpack_from("<h", data, pos)[0]))
    elif jtype == J_UINT16:
        out.append(str(struct.unpack_from("<H", data, pos)[0]))
    elif jtype == J_INT32:
        out.append(str(struct.unpack_from("<i", data, pos)[0]))
    elif jtype == J_UINT32:
        out.append(str(struct.unpack_from("<I", data, pos)[0]))
    elif jtype == J_INT64:
        out.append(str(struct.unpack_from("<q", data, pos)[0]))
    elif jtype == J_UINT64:
        out.append(str(struct.unpack_from("<Q", data, pos)[0]))
    elif jtype == J_DOUBLE:
        out.append(_fmt_double(struct.unpack_from("<d", data, pos)[0]))
    elif jtype == J_STRING:
        slen, pos = _read_varint(data, pos)
        _escape_json_bytes(data[pos : pos + slen], out)
    elif jtype == J_OPAQUE:
        _decode_opaque(data, pos, out)
    else:
        out.append('"<unknown>"')


def _decode_container(data: bytes, pos: int, out: list[str], *, small: bool, is_array: bool) -> None:
    origin = pos  # offsets in entries are relative to here
    w = 2 if small else 4
    uint = "<H" if small else "<I"

    count = struct.unpack_from(uint, data, pos)[0]
    pos += w
    pos += w  # total size — unused for decoding

    keys: list[tuple[int, int]] = []
    if not is_array:
        for _ in range(count):
            koff = struct.unpack_from(uint, data, pos)[0]
            pos += w
            klen = struct.unpack_from("<H", data, pos)[0]
            pos += 2
            keys.append((koff, klen))

    # value entries: type byte + w bytes (inline value or offset)
    entries: list[tuple[int, Any, bool]] = []  # (jtype, inline_str_or_offset, inline?)
    for _ in range(count):
        jt = data[pos]
        pos += 1
        if jt == J_LITERAL:
            entries.append((jt, ("null", "true", "false")[data[pos]], True))
        elif jt == J_INT16:
            entries.append((jt, str(struct.unpack_from("<h", data, pos)[0]), True))
        elif jt == J_UINT16:
            entries.append((jt, str(struct.unpack_from("<H", data, pos)[0]), True))
        elif jt == J_INT32 and not small:
            entries.append((jt, str(struct.unpack_from("<i", data, pos)[0]), True))
        elif jt == J_UINT32 and not small:
            entries.append((jt, str(struct.unpack_from("<I", data, pos)[0]), True))
        else:
            entries.append((jt, struct.unpack_from(uint, data, pos)[0], True is False))
        pos += w

    out.append("[" if is_array else "{")
    for i in range(count):
        if i:
            out.append(", ")
        if not is_array:
            from json.encoder import encode_basestring

            koff, klen = keys[i]
            kpos = origin + koff
            # NOTE: the reference emits keys unescaped (src/json_decoder.zig:666-669);
            # we escape so output is always valid JSON — differs only for
            # pathological keys containing quotes/control characters.
            out.append(encode_basestring(data[kpos : kpos + klen].decode("utf-8", errors="replace")))
            out.append(": ")
        jt, val, inline = entries[i]
        if inline:
            out.append(val)
        else:
            _decode_value(data, jt, origin + val, out)
    out.append("]" if is_array else "}")


def _decode_opaque(data: bytes, pos: int, out: list[str]) -> None:
    type_code = data[pos]
    pos += 1
    length, pos = _read_varint(data, pos)
    payload = data[pos : pos + length]

    if type_code in (0, 246):  # DECIMAL / NEWDECIMAL: precision, scale, packed bytes
        if length < 2:
            out.append('"<invalid-decimal>"')
            return
        precision, scale = payload[0], payload[1]
        try:
            out.append(decode_decimal(payload[2:], precision, scale))
        except Exception:
            hexs = payload[2:].hex()
            out.append(f'"<decimal-parse-error:p{precision}s{scale}:{hexs}>"')
    elif type_code in (7, 12, 17, 18):  # TIMESTAMP / DATETIME variants, bit-packed i64
        if length != 8:
            out.append(f'"<dt-len-{length}:{payload.hex()}>"')
            return
        raw = struct.unpack("<q", payload)[0] & 0xFFFFFFFFFFFFFFFF
        value = raw >> 24
        year_month = (value >> 22) & ((1 << 17) - 1)
        year, month = year_month // 13, year_month % 13
        day = (value >> 17) & 0x1F
        hour = (value >> 12) & 0x1F
        minute = (value >> 6) & 0x3F
        second = value & 0x3F
        micro = raw & ((1 << 24) - 1)
        if year > 9999 or month > 12 or month == 0 or day > 31 or day == 0 or hour > 23 or minute > 59 or second > 59:
            out.append(f'"<invalid-dt:{year}-{month}-{day} {hour}:{minute}:{second}>"')
            return
        if micro:
            out.append(f'"{year}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}.{micro:06d}"')
        else:
            out.append(f'"{year}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}"')
    elif type_code in (10, 11, 19):  # DATE / TIME: hex fallback, as the reference does
        out.append(f'"{payload.hex()}"')
    elif type_code == 5:  # DOUBLE
        if length != 8:
            out.append(f'"{payload.hex()}"')
            return
        out.append(_fmt_double(struct.unpack("<d", payload)[0]))
    else:
        out.append(f'"<type-{type_code}:{payload.hex()}>"')


# ---------------------------------------------------------------------------
# Encoder (fixtures only): Python JSON value → MySQL binary JSON (small format)
# ---------------------------------------------------------------------------


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_scalar(value: Any) -> tuple[int, bytes]:
    """Return (jtype, payload-without-type-byte)."""
    if value is None:
        return J_LITERAL, b"\x00"
    if value is True:
        return J_LITERAL, b"\x01"
    if value is False:
        return J_LITERAL, b"\x02"
    if isinstance(value, int):
        if -(2**15) <= value < 2**15:
            return J_INT16, struct.pack("<h", value)
        if -(2**31) <= value < 2**31:
            return J_INT32, struct.pack("<i", value)
        return J_INT64, struct.pack("<q", value)
    if isinstance(value, float):
        return J_DOUBLE, struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return J_STRING, _write_varint(len(raw)) + raw
    if isinstance(value, (dict, list)):
        return _encode_container(value)
    raise TypeError(f"cannot encode {type(value)} as MySQL binary JSON")


def _encode_container(value: Any) -> tuple[int, bytes]:
    is_array = isinstance(value, list)
    items = list(value.items()) if not is_array else [(None, v) for v in value]
    count = len(items)
    w = 2

    encoded = [_encode_scalar(v) for _, v in items]
    key_bytes = [] if is_array else [str(k).encode("utf-8") for k, _ in items]

    header = 2 * w  # count + size
    key_entries = 0 if is_array else count * (w + 2)
    value_entries = count * (1 + w)
    fixed = header + key_entries + value_entries

    # key strings come first, then non-inline value payloads
    tail = bytearray()
    key_offsets = []
    for kb in key_bytes:
        key_offsets.append(fixed + len(tail))
        tail += kb

    entry_slots: list[bytes] = []
    for jt, payload in encoded:
        inline = jt == J_LITERAL or jt == J_INT16 or jt == J_UINT16
        if inline:
            slot = payload + b"\x00" * (w - len(payload))
            entry_slots.append(bytes([jt]) + slot[:w])
        else:
            off = fixed + len(tail)
            tail += payload
            entry_slots.append(bytes([jt]) + struct.pack("<H", off))

    total = fixed + len(tail)
    if total > 0xFFFF:
        raise ValueError("json value too large for small format encoder")

    buf = bytearray()
    buf += struct.pack("<H", count)
    buf += struct.pack("<H", total)
    for koff, kb in zip(key_offsets, key_bytes):
        buf += struct.pack("<H", koff)
        buf += struct.pack("<H", len(kb))
    for slot in entry_slots:
        buf += slot
    buf += tail
    return (J_SMALL_ARRAY if is_array else J_SMALL_OBJECT), bytes(buf)


def encode_json(value: Any) -> bytes:
    """Python value → MySQL binary JSON blob (type byte + payload)."""
    jtype, payload = _encode_scalar(value)
    return bytes([jtype]) + payload


def encode_opaque_decimal(value: str, precision: int, scale: int) -> bytes:
    """Opaque DECIMAL JSON value (type 15, column type 246)."""
    packed = bytes([precision, scale]) + encode_decimal(value, precision, scale)
    return bytes([J_OPAQUE, 246]) + _write_varint(len(packed)) + packed
