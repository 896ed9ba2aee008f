"""Synthetic binlog segment writer (test/bench fixture source).

Encodes events byte-compatible with the MySQL binlog v4 layouts that
the decode kernel (and the reference connector) parse: 19-byte LE
common header + CRC32 suffix, FORMAT_DESCRIPTION, TABLE_MAP (typed
column metadata words), WRITE/UPDATE/DELETE_ROWS v2, GTID (commit
ordinal carrier), QUERY (DDL), ROTATE.

Each produced segment is **self-contained**: it begins with a
FORMAT_DESCRIPTION event, re-emits TABLE_MAP before row events, and
ends with ROTATE — mirroring MySQL's per-file behavior, and the
property that makes segment-parallel decode safe (SURVEY.md §7.4).

This is the *encoder* inverse of kernel.event_codec; round-trip tests
pin the two against each other.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from .constants import BINLOG_MAGIC, ColumnType, EventType
from .decimal_codec import encode_decimal
from .json_codec import encode_json

_FIXED_SID = bytes(range(16))  # deterministic fake server UUID
_SERVER_VERSION = b"8.0.99-graft-synthetic"

# post_header_len array for our FORMAT_DESCRIPTION (indexed by type-1).
_POST_HEADER_LEN = bytearray(40)
_POST_HEADER_LEN[EventType.QUERY_EVENT - 1] = 13
_POST_HEADER_LEN[EventType.ROTATE_EVENT - 1] = 8
_POST_HEADER_LEN[EventType.FORMAT_DESCRIPTION_EVENT - 1] = 84
_POST_HEADER_LEN[EventType.TABLE_MAP_EVENT - 1] = 8
_POST_HEADER_LEN[EventType.WRITE_ROWS_EVENT - 1] = 10
_POST_HEADER_LEN[EventType.UPDATE_ROWS_EVENT - 1] = 10
_POST_HEADER_LEN[EventType.DELETE_ROWS_EVENT - 1] = 10
_POST_HEADER_LEN[EventType.GTID_EVENT - 1] = 42
_POST_HEADER_LEN[EventType.XID_EVENT - 1] = 0


@dataclass(frozen=True)
class ColumnSpec:
    col_type: int
    meta: int = 0


def c_tiny() -> ColumnSpec:
    return ColumnSpec(ColumnType.TINY)


def c_short() -> ColumnSpec:
    return ColumnSpec(ColumnType.SHORT)


def c_int24() -> ColumnSpec:
    return ColumnSpec(ColumnType.INT24)


def c_long() -> ColumnSpec:
    return ColumnSpec(ColumnType.LONG)


def c_longlong() -> ColumnSpec:
    return ColumnSpec(ColumnType.LONGLONG)


def c_float() -> ColumnSpec:
    return ColumnSpec(ColumnType.FLOAT, 4)


def c_double() -> ColumnSpec:
    return ColumnSpec(ColumnType.DOUBLE, 8)


def c_year() -> ColumnSpec:
    return ColumnSpec(ColumnType.YEAR)


def c_date() -> ColumnSpec:
    return ColumnSpec(ColumnType.DATE)


def c_datetime2(fsp: int = 0) -> ColumnSpec:
    return ColumnSpec(ColumnType.DATETIME2, fsp)


def c_timestamp2(fsp: int = 0) -> ColumnSpec:
    return ColumnSpec(ColumnType.TIMESTAMP2, fsp)


def c_time2(fsp: int = 0) -> ColumnSpec:
    return ColumnSpec(ColumnType.TIME2, fsp)


def c_varchar(max_len: int) -> ColumnSpec:
    return ColumnSpec(ColumnType.VARCHAR, max_len)


def c_char(length: int) -> ColumnSpec:
    # STRING metadata word (big-endian on the wire): the reference's
    # decode is real_type = byte0|0x30 when (byte0 & 0x30) != 0x30.
    # For CHAR (type 254 = 0xFE) with length ≤ 255 we encode
    # byte0 = 0xFE ^ ((length & 0x300) >> 4), byte1 = length & 0xFF.
    byte0 = (ColumnType.STRING ^ ((length & 0x300) >> 4)) & 0xFF
    return ColumnSpec(ColumnType.STRING, (byte0 << 8) | (length & 0xFF))


def c_enum(num_values: int = 10) -> ColumnSpec:
    width = 1 if num_values < 256 else 2
    return ColumnSpec(ColumnType.STRING, (ColumnType.ENUM << 8) | width)


def c_set(width_bytes: int = 1) -> ColumnSpec:
    return ColumnSpec(ColumnType.STRING, (ColumnType.SET << 8) | width_bytes)


def c_bit(bits: int) -> ColumnSpec:
    return ColumnSpec(ColumnType.BIT, ((bits // 8) << 8) | (bits % 8))


def c_blob(len_bytes: int = 2) -> ColumnSpec:
    return ColumnSpec(ColumnType.BLOB, len_bytes)


def c_decimal(precision: int, scale: int) -> ColumnSpec:
    return ColumnSpec(ColumnType.NEWDECIMAL, (scale << 8) | precision)


def c_json(len_bytes: int = 4) -> ColumnSpec:
    return ColumnSpec(ColumnType.JSON, len_bytes)


@dataclass
class TableSpec:
    schema: str
    table: str
    table_id: int
    columns: list[ColumnSpec]
    column_names: list[str] = field(default_factory=list)


def _encode_fraction(micros: int, fsp: int) -> bytes:
    fsp = 0 if fsp > 6 else fsp
    length = (fsp + 1) // 2
    if length == 0:
        return b""
    scale = {1: 10_000, 2: 100, 3: 1}[length]
    return (micros // scale).to_bytes(length, "big")


def encode_value(value: Any, spec: ColumnSpec) -> bytes:
    """One non-NULL column value → its binlog byte representation."""
    t = spec.col_type
    meta = spec.meta
    if t == ColumnType.TINY:
        return struct.pack("<b", value)
    if t == ColumnType.SHORT:
        return struct.pack("<h", value)
    if t == ColumnType.INT24:
        return (value & 0xFFFFFF).to_bytes(3, "little")
    if t == ColumnType.LONG:
        return struct.pack("<i", value)
    if t == ColumnType.LONGLONG:
        return struct.pack("<q", value)
    if t == ColumnType.FLOAT:
        return struct.pack("<f", value)
    if t == ColumnType.DOUBLE:
        return struct.pack("<d", value)
    if t == ColumnType.YEAR:
        return bytes([value - 1900 if value >= 1900 else value])
    if t == ColumnType.DATE:
        if isinstance(value, tuple):  # ("dt", y, mo, d, ...)
            _, y, mo, d = value[:4]
        else:
            y, mo, d = value
        return ((y << 9) | (mo << 5) | d).to_bytes(3, "little")
    if t == ColumnType.DATETIME2:
        _, y, mo, d, h, mi, s, us = value
        ym = y * 13 + mo
        packed = 0x8000000000 + ((((ym << 5) | d) << 17) | (h << 12) | (mi << 6) | s)
        return packed.to_bytes(5, "big") + _encode_fraction(us, meta)
    if t == ColumnType.TIMESTAMP2:
        micros = value[1] if isinstance(value, tuple) else value
        seconds, us = divmod(micros, 1_000_000)
        return seconds.to_bytes(4, "big") + _encode_fraction(us, meta)
    if t == ColumnType.TIME2:
        _, neg, _days, h, mi, s, us = value
        frac_bytes = (meta + 1) // 2
        nbytes = 3 + frac_bytes
        bits = nbytes * 8
        frac = 0
        if frac_bytes > 0:
            frac = us * (100 ** (frac_bytes - 1)) // 10_000
        val = (1 << (bits - 1)) | (h << (bits - 12)) | (mi << (bits - 18)) | (s << (bits - 24)) | frac
        if neg:
            val = (~val + 1) & ((1 << bits) - 1)
        return val.to_bytes(nbytes, "big")
    if t in (ColumnType.VARCHAR, ColumnType.VAR_STRING):
        raw = value.encode("utf-8") if isinstance(value, str) else (value[1] if isinstance(value, tuple) else value)
        if meta < 256:
            return bytes([len(raw)]) + raw
        return struct.pack("<H", len(raw)) + raw
    if t == ColumnType.STRING:
        byte0 = meta >> 8
        if byte0 == ColumnType.ENUM:
            width = meta & 0xFF
            return value.to_bytes(width, "little")
        if byte0 == ColumnType.SET:
            width = meta & 0xFF
            return value.to_bytes(width, "little")
        # CHAR/BINARY: decode field_length the same way the parser does
        field_length = meta
        if meta >= 256 and (byte0 & 0x30) != 0x30:
            field_length = (meta & 0xFF) | (((byte0 & 0x30) ^ 0x30) << 4)
        elif meta >= 256:
            field_length = meta & 0xFF
        raw = value.encode("utf-8") if isinstance(value, str) else (value[1] if isinstance(value, tuple) else value)
        if field_length > 255:
            return struct.pack("<H", len(raw)) + raw
        return bytes([len(raw)]) + raw
    if t in (ColumnType.BLOB, ColumnType.TINY_BLOB, ColumnType.MEDIUM_BLOB, ColumnType.LONG_BLOB, ColumnType.GEOMETRY):
        raw = value[1] if isinstance(value, tuple) else value
        len_bytes = meta & 0xFF
        return len(raw).to_bytes(len_bytes, "little") + raw
    if t == ColumnType.JSON:
        if isinstance(value, tuple) and value[0] == "json":
            import json as _json

            value = _json.loads(value[1])
        raw = value if isinstance(value, bytes) else encode_json(value)
        len_bytes = meta & 0xFF
        return len(raw).to_bytes(len_bytes, "little") + raw
    if t == ColumnType.BIT:
        raw = value[1] if isinstance(value, tuple) else value
        return raw
    if t in (ColumnType.DECIMAL, ColumnType.NEWDECIMAL):
        precision = meta & 0xFF
        scale = (meta >> 8) & 0xFF
        s = value[1] if isinstance(value, tuple) else value
        return encode_decimal(str(s), precision, scale)
    raise TypeError(f"cannot encode column type {t}")


def _encode_row_image(row: Sequence[Any], columns: list[ColumnSpec]) -> bytes:
    n = len(columns)
    bitmap = bytearray((n + 7) // 8)
    payload = bytearray()
    for i, (v, spec) in enumerate(zip(row, columns)):
        if v is None:
            bitmap[i >> 3] |= 1 << (i & 7)
        else:
            payload += encode_value(v, spec)
    return bytes(bitmap) + bytes(payload)


class SegmentWriter:
    """Builds one self-contained binlog segment in memory."""

    def __init__(self, server_id: int = 1, base_timestamp: int = 1_700_000_000):
        self._buf = bytearray(BINLOG_MAGIC)
        self.server_id = server_id
        self.base_timestamp = base_timestamp
        self._wrote_fde = False

    @property
    def position(self) -> int:
        return len(self._buf)

    def _emit(self, event_type: int, payload: bytes, timestamp: Optional[int] = None) -> None:
        ts = self.base_timestamp if timestamp is None else timestamp
        event_size = 19 + len(payload) + 4
        log_pos = len(self._buf) + event_size  # MySQL: position after this event
        header = struct.pack("<IBIIIH", ts, event_type, self.server_id, event_size, log_pos & 0xFFFFFFFF, 0)
        body = header + payload
        crc = zlib.crc32(body) & 0xFFFFFFFF
        self._buf += body + struct.pack("<I", crc)

    def format_description(self) -> None:
        payload = (
            struct.pack("<H", 4)
            + _SERVER_VERSION.ljust(50, b"\x00")
            + struct.pack("<I", self.base_timestamp)
            + bytes([19])
            + bytes(_POST_HEADER_LEN)
        )
        self._emit(EventType.FORMAT_DESCRIPTION_EVENT, payload)
        self._wrote_fde = True

    def gtid(self, ordinal: int, timestamp: Optional[int] = None) -> None:
        payload = bytes([1]) + _FIXED_SID + struct.pack("<q", ordinal)
        self._emit(EventType.GTID_EVENT, payload, timestamp)

    def query(self, schema: str, sql: str, timestamp: Optional[int] = None) -> None:
        schema_b = schema.encode("utf-8")
        payload = (
            struct.pack("<II", 1, 0)
            + bytes([len(schema_b)])
            + struct.pack("<H", 0)  # error_code
            + struct.pack("<H", 0)  # status_vars_len
            + schema_b
            + b"\x00"
            + sql.encode("utf-8")
        )
        self._emit(EventType.QUERY_EVENT, payload, timestamp)

    def table_map(self, spec: TableSpec, timestamp: Optional[int] = None) -> None:
        n = len(spec.columns)
        meta = bytearray()
        for col in spec.columns:
            t = col.col_type
            if t in (ColumnType.STRING, ColumnType.ENUM, ColumnType.SET):
                meta += struct.pack(">H", col.meta)
            elif t in (
                ColumnType.VARCHAR,
                ColumnType.VAR_STRING,
                ColumnType.DECIMAL,
                ColumnType.NEWDECIMAL,
                ColumnType.BIT,
            ):
                meta += struct.pack("<H", col.meta)
            elif t in (
                ColumnType.BLOB,
                ColumnType.TINY_BLOB,
                ColumnType.MEDIUM_BLOB,
                ColumnType.LONG_BLOB,
                ColumnType.FLOAT,
                ColumnType.DOUBLE,
                ColumnType.GEOMETRY,
                ColumnType.JSON,
                ColumnType.DATETIME2,
                ColumnType.TIMESTAMP2,
                ColumnType.TIME2,
            ):
                meta += bytes([col.meta])
        schema_b = spec.schema.encode("utf-8")
        table_b = spec.table.encode("utf-8")
        payload = (
            spec.table_id.to_bytes(6, "little")
            + struct.pack("<H", 1)  # flags
            + bytes([len(schema_b)])
            + schema_b
            + b"\x00"
            + bytes([len(table_b)])
            + table_b
            + b"\x00"
            + _lenc(n)
            + bytes(spec.columns[i].col_type for i in range(n))
            + _lenc(len(meta))
            + bytes(meta)
            + b"\xff" * ((n + 7) // 8)  # null-allowed bitmap (ignored by decode)
        )
        self._emit(EventType.TABLE_MAP_EVENT, payload, timestamp)

    def _rows_event(
        self,
        event_type: int,
        spec: TableSpec,
        images: list[bytes],
        num_bitmaps: int,
        timestamp: Optional[int],
    ) -> None:
        n = len(spec.columns)
        bitmap = b"\xff" * ((n + 7) // 8)
        payload = (
            spec.table_id.to_bytes(6, "little")
            + struct.pack("<H", 1)  # flags
            + struct.pack("<H", 2)  # v2 var_header_len (no extra data)
            + _lenc(n)
            + bitmap * num_bitmaps
            + b"".join(images)
        )
        self._emit(event_type, payload, timestamp)

    def write_rows(self, spec: TableSpec, rows: list[Sequence[Any]], timestamp: Optional[int] = None) -> None:
        images = [_encode_row_image(r, spec.columns) for r in rows]
        self._rows_event(EventType.WRITE_ROWS_EVENT, spec, images, 1, timestamp)

    def delete_rows(self, spec: TableSpec, rows: list[Sequence[Any]], timestamp: Optional[int] = None) -> None:
        images = [_encode_row_image(r, spec.columns) for r in rows]
        self._rows_event(EventType.DELETE_ROWS_EVENT, spec, images, 1, timestamp)

    def update_rows(
        self,
        spec: TableSpec,
        pairs: list[tuple[Sequence[Any], Sequence[Any]]],
        timestamp: Optional[int] = None,
    ) -> None:
        images = []
        for before, after in pairs:
            images.append(_encode_row_image(before, spec.columns) + _encode_row_image(after, spec.columns))
        self._rows_event(EventType.UPDATE_ROWS_EVENT, spec, images, 2, timestamp)

    def rotate(self, next_file: str, next_position: int = 4) -> None:
        payload = struct.pack("<Q", next_position) + next_file.encode("utf-8")
        self._emit(EventType.ROTATE_EVENT, payload)

    def getvalue(self) -> bytes:
        return bytes(self._buf)


def _lenc(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + struct.pack("<Q", n)
