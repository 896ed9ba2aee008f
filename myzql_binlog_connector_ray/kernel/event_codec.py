"""Binlog event decoding: header framing, TABLE_MAP, row events, GTID, QUERY.

Implements the MySQL binlog v4 event formats from the public protocol
documentation
(https://dev.mysql.com/doc/dev/mysql-server/latest/page_protocol_replication_binlog_event.html),
with decode semantics matching the reference connector:

- 19-byte little-endian common header, 4-byte CRC suffix stripped per
  event (reference: src/event_parser.zig:1191-1251);
- TABLE_MAP metadata word endianness varies by type — STRING/ENUM/SET
  big-endian, VARCHAR/DECIMAL/BIT little-endian, 1-byte for blob/float/
  temporal types (reference: src/event_parser.zig:1416-1446);
- row events V2 (post_header_len == 10) carry a var-header and repeat
  before/after images with per-image null bitmaps sized by *present*
  columns (reference: src/event_parser.zig:1479-1647);
- per-column parse errors degrade to NULL instead of aborting
  (reference: src/event_parser.zig:1125-1128).

Values are plain Python objects; non-obvious types are tagged tuples so
the JSON serializer can reproduce the reference's formatting exactly:

    None                                    NULL
    int / float                             numeric (incl. YEAR+1900, ENUM index, SET mask)
    ("dt", y, mo, d, h, mi, s, us)          DATE/DATETIME/DATETIME2
    ("ts", micros_since_epoch)              TIMESTAMP/TIMESTAMP2
    ("dur", neg, days, h, mi, s, us)        TIME/TIME2
    ("str", bytes)                          VARCHAR/CHAR
    ("blob", bytes)                         BLOB/BIT/GEOMETRY
    ("dec", str)                            DECIMAL (exact decimal string)
    ("json", str)                           JSON (decoded to JSON text)
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator, Optional

from .constants import (
    BINLOG_MAGIC,
    CRC_LEN,
    EVENT_HEADER_LEN,
    ColumnType,
    EventType,
)
from .decimal_codec import decimal_binary_size, decode_decimal
from .json_codec import decode_json

_FRACTION_SCALE = {1: 10_000, 2: 100, 3: 1}


@dataclass(frozen=True)
class RawEvent:
    event_type: int
    timestamp: int
    server_id: int
    log_pos: int
    flags: int
    data: bytes  # payload with header and CRC stripped


@dataclass
class TableMetadata:
    table_id: int
    database_name: str
    table_name: str
    column_types: list[int]
    column_meta: list[int]

    @property
    def column_count(self) -> int:
        return len(self.column_types)


@dataclass(frozen=True)
class RowImagePair:
    """One changed row: INSERT has only after, DELETE only before."""

    before: Optional[list]
    after: Optional[list]


def parse_event_header(buf: bytes, offset: int = 0) -> tuple[int, int, int, int, int, int]:
    """19-byte header → (type, timestamp, server_id, event_size, log_pos, flags)."""
    timestamp, = struct.unpack_from("<I", buf, offset)
    event_type = buf[offset + 4]
    server_id, event_size, log_pos, flags = struct.unpack_from("<IIIH", buf, offset + 5)
    return event_type, timestamp, server_id, event_size, log_pos, flags


def iter_events(segment: bytes) -> Iterator[RawEvent]:
    """Frame a binlog segment byte string into events.

    Uses the event_size header field for framing; strips the 4-byte
    trailing CRC from each payload (not verified, as in the reference).
    Skips the 4-byte binlog magic if present.
    """
    pos = 4 if segment[:4] == BINLOG_MAGIC else 0
    n = len(segment)
    while pos + EVENT_HEADER_LEN <= n:
        event_type, timestamp, server_id, event_size, log_pos, flags = parse_event_header(segment, pos)
        if event_size < EVENT_HEADER_LEN or pos + event_size > n:
            break  # truncated tail — stop cleanly
        data_end = pos + event_size - CRC_LEN
        if data_end < pos + EVENT_HEADER_LEN:
            data_end = pos + event_size
        yield RawEvent(
            event_type=event_type,
            timestamp=timestamp,
            server_id=server_id,
            log_pos=log_pos,
            flags=flags,
            data=segment[pos + EVENT_HEADER_LEN : data_end],
        )
        pos += event_size


def read_lenc_int(data: bytes, pos: int) -> tuple[int, int]:
    """MySQL length-encoded integer → (value, new_pos)."""
    first = data[pos]
    pos += 1
    if first < 251:
        return first, pos
    if first == 252:
        return struct.unpack_from("<H", data, pos)[0], pos + 2
    if first == 253:
        return int.from_bytes(data[pos : pos + 3], "little"), pos + 3
    if first == 254:
        return struct.unpack_from("<Q", data, pos)[0], pos + 8
    raise ValueError("invalid length-encoded integer")


def parse_format_description(data: bytes) -> dict:
    """FORMAT_DESCRIPTION_EVENT → {binlog_version, server_version, post_header_len}."""
    if len(data) < 57:
        raise ValueError("invalid FORMAT_DESCRIPTION event")
    binlog_version = struct.unpack_from("<H", data, 0)[0]
    server_version = bytes(data[2:52]).split(b"\x00", 1)[0].decode("utf-8", "replace")
    post_header_len = bytes(data[57:])
    return {
        "binlog_version": binlog_version,
        "server_version": server_version,
        "post_header_len": post_header_len,
    }


def parse_rotate(data: bytes) -> tuple[str, int]:
    """ROTATE_EVENT → (next_binlog_file, next_position)."""
    if len(data) < 8:
        raise ValueError("invalid ROTATE event")
    next_position = struct.unpack_from("<Q", data, 0)[0]
    return bytes(data[8:]).decode("utf-8", "replace"), next_position


def parse_gtid(data: bytes) -> int:
    """GTID_EVENT → commit ordinal (the GNO).

    Layout prefix: flags(1) + SID/UUID(16) + GNO(8, LE). The engine uses
    the GNO as the global commit ordinal for last-writer-wins ordering
    (north rule; the reference enumerates but skips GTID events,
    reference: src/event_parser.zig:74-76,1155-1171).
    """
    if len(data) < 25:
        raise ValueError("invalid GTID event")
    return struct.unpack_from("<q", data, 17)[0]


def parse_query(data: bytes) -> tuple[str, str]:
    """QUERY_EVENT → (schema, sql_text). Drives DDL schema evolution."""
    if len(data) < 13:
        raise ValueError("invalid QUERY event")
    schema_len = data[8]
    status_len = struct.unpack_from("<H", data, 11)[0]
    pos = 13 + status_len
    schema = bytes(data[pos : pos + schema_len]).decode("utf-8", "replace")
    pos += schema_len + 1  # skip 0x00
    return schema, bytes(data[pos:]).decode("utf-8", "replace")


# metadata word widths per column type, for TABLE_MAP parsing
_META_BE2 = {ColumnType.STRING, ColumnType.ENUM, ColumnType.SET}
_META_LE2 = {
    ColumnType.VARCHAR,
    ColumnType.VAR_STRING,
    ColumnType.DECIMAL,
    ColumnType.NEWDECIMAL,
    ColumnType.BIT,
}
_META_1 = {
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
}


def parse_table_map(data: bytes) -> TableMetadata:
    """TABLE_MAP_EVENT → TableMetadata (positional schema, no column names)."""
    table_id = int.from_bytes(data[0:6], "little")
    pos = 8  # skip table_id(6) + flags(2)
    schema_len = data[pos]
    pos += 1
    schema = bytes(data[pos : pos + schema_len]).decode("utf-8", "replace")
    pos += schema_len + 1
    table_len = data[pos]
    pos += 1
    table = bytes(data[pos : pos + table_len]).decode("utf-8", "replace")
    pos += table_len + 1
    col_count, pos = read_lenc_int(data, pos)
    column_types = list(data[pos : pos + col_count])
    pos += col_count
    _meta_len, pos = read_lenc_int(data, pos)

    column_meta = [0] * col_count
    for i, ct in enumerate(column_types):
        if ct in _META_BE2:
            column_meta[i] = (data[pos] << 8) | data[pos + 1]
            pos += 2
        elif ct in _META_LE2:
            column_meta[i] = data[pos] | (data[pos + 1] << 8)
            pos += 2
        elif ct in _META_1:
            column_meta[i] = data[pos]
            pos += 1
    return TableMetadata(
        table_id=table_id,
        database_name=schema,
        table_name=table,
        column_types=column_types,
        column_meta=column_meta,
    )


# ---------------------------------------------------------------------------
# Column value decoding
# ---------------------------------------------------------------------------


def _parse_fraction(data: bytes, pos: int, fsp: int) -> tuple[int, int]:
    fsp = 0 if fsp > 6 else fsp
    length = (fsp + 1) // 2
    if length == 0:
        return 0, pos
    frac = int.from_bytes(data[pos : pos + length], "big")
    return frac * _FRACTION_SCALE[length], pos + length


def _parse_datetime2(data: bytes, pos: int, meta: int):
    packed = int.from_bytes(data[pos : pos + 5], "big")
    pos += 5
    micros, pos = _parse_fraction(data, pos, meta & 0xFF)
    if packed == 0 or packed < 0x8000000000:
        return ("dt", 0, 0, 0, 0, 0, 0, 0), pos
    val = packed - 0x8000000000
    d_val = val >> 17
    year_month = d_val >> 5
    year, month = year_month // 13, year_month % 13
    if year > 9999 or month > 12 or month == 0:
        return ("dt", 0, 0, 0, 0, 0, 0, 0), pos
    day = d_val & 0x1F
    hour = (val >> 12) & 0x1F
    minute = (val >> 6) & 0x3F
    second = val & 0x3F
    return ("dt", year, month, day, hour, minute, second, micros), pos


def _parse_time2(data: bytes, pos: int, meta: int):
    frac_bytes = (meta + 1) // 2
    nbytes = 3 + frac_bytes
    val = int.from_bytes(data[pos : pos + nbytes], "big")
    pos += nbytes
    bits = nbytes * 8
    negative = (val >> (bits - 1)) == 0
    if negative:
        val = (~val + 1) & ((1 << bits) - 1)
    hour = (val >> (bits - 12)) & 0x3FF
    minute = (val >> (bits - 18)) & 0x3F
    second = (val >> (bits - 24)) & 0x3F
    micros = 0
    if frac_bytes > 0:
        frac = val & ((1 << (frac_bytes * 8)) - 1)
        micros = frac * 10_000 // (100 ** (frac_bytes - 1))
    return ("dur", 1 if negative else 0, 0, hour, minute, second, micros), pos


def _parse_string_meta(meta: int) -> tuple[int, int]:
    """STRING metadata → (real_type, field_length).

    CHAR/BINARY/ENUM/SET all arrive as MYSQL_TYPE_STRING; the real type
    is packed into the metadata word (MySQL Field_string::unpack).
    """
    real_type = ColumnType.STRING
    length = meta
    if meta >= 256:
        byte0 = meta >> 8
        byte1 = meta & 0xFF
        if (byte0 & 0x30) != 0x30:
            real_type = byte0 | 0x30
            length = byte1 | (((byte0 & 0x30) ^ 0x30) << 4)
        else:
            if byte0 in (ColumnType.ENUM, ColumnType.SET):
                real_type = byte0
            length = byte1
    return real_type, length


def parse_column_value(data: bytes, pos: int, col_type: int, meta: int):
    """Decode one non-NULL column value; returns (value, new_pos)."""
    t = col_type
    if t == ColumnType.TINY:
        v = data[pos]
        return (v - 256 if v >= 128 else v), pos + 1
    if t == ColumnType.SHORT:
        return struct.unpack_from("<h", data, pos)[0], pos + 2
    if t == ColumnType.INT24:
        v = int.from_bytes(data[pos : pos + 3], "little")
        if v & 0x800000:
            v -= 1 << 24
        return v, pos + 3
    if t == ColumnType.LONG:
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if t == ColumnType.LONGLONG:
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    if t == ColumnType.FLOAT:
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if t == ColumnType.DOUBLE:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if t == ColumnType.YEAR:
        return data[pos] + 1900, pos + 1
    if t == ColumnType.DATE:
        val = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        if val == 0:
            return ("dt", 0, 0, 0, 0, 0, 0, 0), pos
        return ("dt", val >> 9, (val >> 5) & 15, val & 31, 0, 0, 0, 0), pos
    if t == ColumnType.DATETIME:
        val = struct.unpack_from("<Q", data, pos)[0]
        pos += 8
        if val == 0:
            return ("dt", 0, 0, 0, 0, 0, 0, 0), pos
        date_val, time_val = val // 1_000_000, val % 1_000_000
        return (
            "dt",
            date_val // 10_000,
            (date_val // 100) % 100,
            date_val % 100,
            time_val // 10_000,
            (time_val // 100) % 100,
            time_val % 100,
            0,
        ), pos
    if t == ColumnType.DATETIME2:
        return _parse_datetime2(data, pos, meta)
    if t == ColumnType.TIMESTAMP:
        seconds = struct.unpack_from("<I", data, pos)[0]
        return ("ts", seconds * 1_000_000), pos + 4
    if t == ColumnType.TIMESTAMP2:
        seconds = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
        micros, pos = _parse_fraction(data, pos, meta & 0xFF)
        return ("ts", seconds * 1_000_000 + micros), pos
    if t == ColumnType.TIME:
        val = int.from_bytes(data[pos : pos + 3], "little")
        return ("dur", 0, 0, (val // 100) // 100, (val // 100) % 100, val % 100, 0), pos + 3
    if t == ColumnType.TIME2:
        return _parse_time2(data, pos, meta)
    if t in (ColumnType.VARCHAR, ColumnType.VAR_STRING):
        if meta < 256:
            length = data[pos]
            pos += 1
        else:
            length = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        return ("str", bytes(data[pos : pos + length])), pos + length
    if t == ColumnType.STRING:
        real_type, field_length = _parse_string_meta(meta)
        if real_type == ColumnType.ENUM:
            if field_length == 1:
                return data[pos], pos + 1
            return struct.unpack_from("<H", data, pos)[0], pos + 2
        if real_type == ColumnType.SET:
            val = int.from_bytes(data[pos : pos + field_length], "little")
            return val, pos + field_length
        if field_length > 255:
            length = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:
            length = data[pos]
            pos += 1
        return ("str", bytes(data[pos : pos + length])), pos + length
    if t in (ColumnType.BLOB, ColumnType.TINY_BLOB, ColumnType.MEDIUM_BLOB, ColumnType.LONG_BLOB, ColumnType.GEOMETRY):
        len_bytes = meta & 0xFF
        if len_bytes == 0 or len_bytes > 4:
            return ("blob", b""), pos
        length = int.from_bytes(data[pos : pos + len_bytes], "little")
        pos += len_bytes
        return ("blob", bytes(data[pos : pos + length])), pos + length
    if t == ColumnType.JSON:
        len_bytes = meta & 0xFF
        length = int.from_bytes(data[pos : pos + len_bytes], "little")
        pos += len_bytes
        raw = bytes(data[pos : pos + length])
        pos += length
        try:
            return ("json", decode_json(raw)), pos
        except Exception:
            return ("blob", raw), pos
    if t == ColumnType.ENUM:
        if meta == 1:
            return data[pos], pos + 1
        return struct.unpack_from("<H", data, pos)[0], pos + 2
    if t == ColumnType.SET:
        nbytes = meta & 0xFF
        return int.from_bytes(data[pos : pos + nbytes], "little"), pos + nbytes
    if t == ColumnType.BIT:
        bits_last = meta & 0xFF
        full_bytes = meta >> 8
        total = full_bytes + (1 if bits_last else 0)
        return ("blob", bytes(data[pos : pos + total])), pos + total
    if t in (ColumnType.DECIMAL, ColumnType.NEWDECIMAL):
        precision = meta & 0xFF
        scale = (meta >> 8) & 0xFF
        nbytes = decimal_binary_size(precision, scale)
        raw = bytes(data[pos : pos + nbytes])
        pos += nbytes
        try:
            return ("dec", decode_decimal(raw, precision, scale)), pos
        except Exception:
            return ("blob", raw), pos
    # unknown type: emit empty blob, consume nothing (reference logs + empty blob)
    return ("blob", b""), pos


def parse_row_image(
    data: bytes,
    pos: int,
    column_types: list[int],
    column_meta: list[int],
    columns_present: list[bool],
) -> tuple[list, int]:
    """One row image: null bitmap over *present* columns, then values."""
    present_count = sum(columns_present)
    bitmap_len = (present_count + 7) // 8
    if len(data) - pos < bitmap_len:
        raise ValueError("truncated row image")
    null_bitmap = data[pos : pos + bitmap_len]
    pos += bitmap_len

    values: list = [None] * len(column_types)
    present_idx = 0
    for i, ct in enumerate(column_types):
        if not columns_present[i]:
            continue
        is_null = (null_bitmap[present_idx >> 3] >> (present_idx & 7)) & 1
        present_idx += 1
        if is_null:
            continue
        try:
            values[i], pos = parse_column_value(data, pos, ct, column_meta[i])
        except Exception:
            # per-column degrade-to-NULL, as the reference does
            values[i] = None
    return values, pos


def parse_row_event(
    event_type: int,
    data: bytes,
    table_meta: TableMetadata,
    post_header_len: bytes | None,
) -> list[RowImagePair]:
    """WRITE/UPDATE/DELETE_ROWS event payload → list of row image pairs."""
    pos = 8  # table_id(6) + flags(2)

    is_v2 = False
    if post_header_len is not None and 0 < event_type <= len(post_header_len):
        is_v2 = post_header_len[event_type - 1] == 10
    if is_v2:
        var_header_len = struct.unpack_from("<H", data, pos)[0]
        pos += max(var_header_len, 2)

    col_count = table_meta.column_count
    if is_v2:
        declared_cols, pos = read_lenc_int(data, pos)
    bitmap_len = (col_count + 7) // 8

    def read_bitmap(p: int) -> tuple[list[bool], int]:
        bm = data[p : p + bitmap_len]
        return [bool((bm[i >> 3] >> (i & 7)) & 1) for i in range(col_count)], p + bitmap_len

    if event_type in (EventType.WRITE_ROWS_EVENT, EventType.WRITE_ROWS_EVENT_V0):
        dml = "INSERT"
    elif event_type in (EventType.DELETE_ROWS_EVENT, EventType.DELETE_ROWS_EVENT_V0):
        dml = "DELETE"
    else:
        dml = "UPDATE"

    columns_present, pos = read_bitmap(pos)
    columns_present_after = columns_present
    if dml == "UPDATE":
        columns_present_after, pos = read_bitmap(pos)

    rows: list[RowImagePair] = []
    n = len(data)
    while pos < n:
        try:
            if dml == "INSERT":
                after, pos = parse_row_image(data, pos, table_meta.column_types, table_meta.column_meta, columns_present)
                rows.append(RowImagePair(before=None, after=after))
            elif dml == "DELETE":
                before, pos = parse_row_image(data, pos, table_meta.column_types, table_meta.column_meta, columns_present)
                rows.append(RowImagePair(before=before, after=None))
            else:
                before, pos = parse_row_image(data, pos, table_meta.column_types, table_meta.column_meta, columns_present)
                after, pos = parse_row_image(data, pos, table_meta.column_types, table_meta.column_meta, columns_present_after)
                rows.append(RowImagePair(before=before, after=after))
        except Exception:
            break  # partial trailing data: stop like the reference
    return rows
