"""Compiled per-table row decoders (the decode hot path).

``parse_column_value`` (event_codec) dispatches through a long type
if-chain per value — correct but ~4µs/value. For row events the column
layout is fixed per TABLE_MAP, so we compile a list of per-column
closures once per (table_id, types, meta) and reuse it for every row:
specialized fast bodies for the hot types (VARCHAR/ints/floats), a
generic fallback wrapping parse_column_value for the long tail.

Two value modes:
- ``tagged``: identical output to event_codec (envelope parity);
- ``plain``: typed-path values (str/int/float/bytes — no tag tuples,
  no post-hoc untag pass).

Equality of fast vs generic decode is pinned by tests
(tests/test_fast_decode.py).
"""

from __future__ import annotations

import struct
from typing import Callable

from .constants import ColumnType, EventType
from .event_codec import (
    TableMetadata,
    parse_column_value,
    read_lenc_int,
)

_unpack_h = struct.Struct("<h").unpack_from
_unpack_i = struct.Struct("<i").unpack_from
_unpack_q = struct.Struct("<q").unpack_from
_unpack_f = struct.Struct("<f").unpack_from
_unpack_d = struct.Struct("<d").unpack_from
_unpack_H = struct.Struct("<H").unpack_from

Decoder = Callable[[bytes, int], tuple[object, int]]


def _make_varchar(meta: int, plain: bool) -> Decoder:
    if meta < 256:
        if plain:
            def f(data, pos):
                ln = data[pos]
                pos += 1
                end = pos + ln
                return data[pos:end].decode("utf-8", "replace"), end
        else:
            def f(data, pos):
                ln = data[pos]
                pos += 1
                end = pos + ln
                return ("str", bytes(data[pos:end])), end
    else:
        if plain:
            def f(data, pos):
                ln = data[pos] | (data[pos + 1] << 8)
                pos += 2
                end = pos + ln
                return data[pos:end].decode("utf-8", "replace"), end
        else:
            def f(data, pos):
                ln = data[pos] | (data[pos + 1] << 8)
                pos += 2
                end = pos + ln
                return ("str", bytes(data[pos:end])), end
    return f


def _plainify(v):
    """Tagged value → plain value (mirrors stages.decode._untag)."""
    if v is None or isinstance(v, (int, float)):
        return v
    tag = v[0]
    if tag in ("str",):
        return v[1].decode("utf-8", "replace")
    if tag in ("blob",):
        return v[1]
    if tag in ("dec", "json"):
        return v[1]
    if tag == "ts":
        return v[1]
    if tag == "dt":
        _, y, mo, d, h, mi, s, us = v
        if us:
            return f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}.{us:06d}"
        return f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
    if tag == "dur":
        _, neg, _days, h, mi, s, us = v
        sign = "-" if neg else ""
        return f"{sign}{h:02d}:{mi:02d}:{s:02d}.{us:06d}" if us else f"{sign}{h:02d}:{mi:02d}:{s:02d}"
    return v[1]


def make_column_decoder(col_type: int, meta: int, plain: bool) -> Decoder:
    t = col_type
    if t in (ColumnType.VARCHAR, ColumnType.VAR_STRING):
        return _make_varchar(meta, plain)
    if t == ColumnType.LONG:
        def f(data, pos):
            return _unpack_i(data, pos)[0], pos + 4
        return f
    if t == ColumnType.LONGLONG:
        def f(data, pos):
            return _unpack_q(data, pos)[0], pos + 8
        return f
    if t == ColumnType.SHORT:
        def f(data, pos):
            return _unpack_h(data, pos)[0], pos + 2
        return f
    if t == ColumnType.TINY:
        def f(data, pos):
            v = data[pos]
            return (v - 256 if v >= 128 else v), pos + 1
        return f
    if t == ColumnType.FLOAT:
        def f(data, pos):
            return _unpack_f(data, pos)[0], pos + 4
        return f
    if t == ColumnType.DOUBLE:
        def f(data, pos):
            return _unpack_d(data, pos)[0], pos + 8
        return f

    # long tail: wrap the generic decoder (optionally plainified)
    if plain:
        def f(data, pos, _t=t, _m=meta):
            v, pos = parse_column_value(data, pos, _t, _m)
            return _plainify(v), pos
    else:
        def f(data, pos, _t=t, _m=meta):
            return parse_column_value(data, pos, _t, _m)
    return f


def _codegen_parse_image(column_types, column_meta, plain, fallback_decoders):
    """exec-codegen one flat image decoder per table layout.

    The per-column closure path allocates a ``(value, pos)`` tuple per
    value; with ~6 values/row that tuple churn is measurable at binlog
    scale. The generated function inlines the hot types (VARCHAR and
    fixed-width numerics) as straight-line code with per-column null
    checks; long-tail types call the prebuilt closure for that column.
    Equality with the closure path is pinned by tests/test_fast_decode.
    """
    n = len(column_types)
    bl = (n + 7) // 8
    ns = {
        "_uh": _unpack_h,
        "_ui": _unpack_i,
        "_uq": _unpack_q,
        "_uf": _unpack_f,
        "_ud": _unpack_d,
    }
    lines = ["def parse_image(data, pos):"]
    if bl == 1:
        lines.append("    nb = data[pos]; pos += 1")
    else:
        lines.append(f"    nb = int.from_bytes(data[pos:pos+{bl}], 'little'); pos += {bl}")
    for k, (t, m) in enumerate(zip(column_types, column_meta)):
        lines.append(f"    if nb & {1 << k}:")
        lines.append(f"        v{k} = None")
        lines.append("    else:")
        if t in (ColumnType.VARCHAR, ColumnType.VAR_STRING):
            if m < 256:
                pre = "        _l = data[pos]; pos += 1; _e = pos + _l"
            else:
                pre = "        _l = data[pos] | (data[pos+1] << 8); pos += 2; _e = pos + _l"
            if plain:
                body = pre + f"\n        v{k} = data[pos:_e].decode('utf-8','replace'); pos = _e"
            else:
                body = pre + f"\n        v{k} = ('str', bytes(data[pos:_e])); pos = _e"
        elif t == ColumnType.LONG:
            body = f"        v{k} = _ui(data, pos)[0]; pos += 4"
        elif t == ColumnType.LONGLONG:
            body = f"        v{k} = _uq(data, pos)[0]; pos += 8"
        elif t == ColumnType.SHORT:
            body = f"        v{k} = _uh(data, pos)[0]; pos += 2"
        elif t == ColumnType.TINY:
            body = f"        v{k} = data[pos]; pos += 1\n        if v{k} >= 128: v{k} -= 256"
        elif t == ColumnType.FLOAT:
            body = f"        v{k} = _uf(data, pos)[0]; pos += 4"
        elif t == ColumnType.DOUBLE:
            body = f"        v{k} = _ud(data, pos)[0]; pos += 8"
        else:
            ns[f"_d{k}"] = fallback_decoders[k]
            body = f"        v{k}, pos = _d{k}(data, pos)"
        lines.append(body)
    vals = ", ".join(f"v{k}" for k in range(n))
    lines.append(f"    return [{vals}], pos")
    exec("\n".join(lines), ns)
    return ns["parse_image"]


class CompiledTableDecoder:
    """Per-(types, meta) compiled row-event decoder."""

    def __init__(self, column_types: list[int], column_meta: list[int], plain: bool):
        self.decoders = [make_column_decoder(t, m, plain) for t, m in zip(column_types, column_meta)]
        self.ncols = len(self.decoders)
        self.parse_image = _codegen_parse_image(column_types, column_meta, plain, self.decoders)


def parse_row_event_fast(
    event_type: int,
    data: bytes,
    table_meta: TableMetadata,
    post_header_len: bytes | None,
    compiled: CompiledTableDecoder,
) -> list[tuple]:
    """Row event → [(before, after), ...] using the compiled decoder.

    Falls back to requiring all columns present (bitmap all-ones) — the
    layout MySQL row events use with full row images (binlog_row_image
    = FULL, and our fixtures). Partial-presence events raise so callers
    can retry with the generic path.
    """
    pos = 8  # table_id(6) + flags(2)
    is_v2 = False
    if post_header_len is not None and 0 < event_type <= len(post_header_len):
        is_v2 = post_header_len[event_type - 1] == 10
    if is_v2:
        var_header_len = _unpack_H(data, pos)[0]
        pos += max(var_header_len, 2)
        _, pos = read_lenc_int(data, pos)

    n = table_meta.column_count
    bitmap_len = (n + 7) // 8
    full_mask = (1 << n) - 1

    present = int.from_bytes(data[pos : pos + bitmap_len], "little") & full_mask
    pos += bitmap_len
    if event_type in (EventType.UPDATE_ROWS_EVENT, EventType.UPDATE_ROWS_EVENT_V0, EventType.PARTIAL_UPDATE_ROWS_EVENT):
        dml = 1
        present_after = int.from_bytes(data[pos : pos + bitmap_len], "little") & full_mask
        pos += bitmap_len
        if present_after != full_mask:
            raise ValueError("partial column presence: use generic decoder")
    elif event_type in (EventType.DELETE_ROWS_EVENT, EventType.DELETE_ROWS_EVENT_V0):
        dml = 2
    else:
        dml = 0
    if present != full_mask:
        raise ValueError("partial column presence: use generic decoder")

    parse_image = compiled.parse_image
    rows: list[tuple] = []
    append = rows.append
    end = len(data)
    if dml == 0:  # INSERT
        while pos < end:
            after, pos = parse_image(data, pos)
            append((None, after))
    elif dml == 2:  # DELETE
        while pos < end:
            before, pos = parse_image(data, pos)
            append((before, None))
    else:  # UPDATE
        while pos < end:
            before, pos = parse_image(data, pos)
            after, pos = parse_image(data, pos)
            append((before, after))
    return rows
