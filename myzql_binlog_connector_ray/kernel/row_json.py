"""Row values → positional-key JSON object strings.

Reproduces the reference's row serializer byte-for-byte for the
9-column Parquet envelope: keys are positional (``"c0"``, ``"c1"``, …)
because the binlog carries no column names
(reference: src/row_json_serializer.zig:38-235).

Formatting rules preserved:
- datetime: ``"YYYY-MM-DD HH:MM:SS[.ffffff]"`` (micros only when nonzero)
- timestamp: ISO-8601 UTC ``"YYYY-MM-DDTHH:MM:SS[.ffffff]Z"``
- duration: ``"[-]HH:MM:SS[.ffffff]"`` (days never printed in JSON)
- blob: ``"0x<hex>"``; decimal: quoted; json: raw passthrough
- strings: control chars escaped, valid UTF-8 passed through, invalid
  bytes escaped as ``\\u00XX``
"""

from __future__ import annotations

from datetime import datetime, timezone
from json.encoder import encode_basestring as _encode_basestring

_ESCAPES = {
    ord('"'): '\\"',
    ord("\\"): "\\\\",
    ord("\n"): "\\n",
    ord("\r"): "\\r",
    ord("\t"): "\\t",
}


def _fmt_number(v) -> str:
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        return repr(v)
    return str(v)


def escape_json_string(raw: bytes) -> str:
    """JSON-escape raw bytes, validating UTF-8 sequences as the reference does.

    Fast path: strictly-valid UTF-8 goes through ``json.dumps`` (C
    speed), whose escaping rules match the reference for valid text
    (\\" \\\\ \\n \\r \\t, \\u00XX for other control chars, multi-byte
    passthrough). Invalid bytes fall back to the byte-at-a-time escape.
    """
    try:
        return _encode_basestring(raw.decode("utf-8", "strict"))
    except UnicodeDecodeError:
        return _escape_json_bytes_slow(raw)


def _escape_json_bytes_slow(raw: bytes) -> str:
    out = ['"']
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        esc = _ESCAPES.get(c)
        if esc is not None:
            out.append(esc)
            i += 1
        elif c < 0x20:
            out.append(f"\\u{c:04x}")
            i += 1
        elif c < 0x80:
            out.append(chr(c))
            i += 1
        else:
            if 0xF0 <= c <= 0xF4:
                seq_len = 4
            elif c >= 0xE0:
                seq_len = 3
            elif c >= 0xC2:
                seq_len = 2
            else:
                seq_len = 0
            if seq_len >= 2 and i + seq_len <= n and all((raw[i + j] & 0xC0) == 0x80 for j in range(1, seq_len)):
                out.append(raw[i : i + seq_len].decode("utf-8", "replace"))
                i += seq_len
            else:
                out.append(f"\\u00{c:02x}")
                i += 1
    out.append('"')
    return "".join(out)


def format_value(v) -> str:
    """One tagged row value → its JSON representation."""
    if v is None:
        return "null"
    if isinstance(v, (int, float)):
        return _fmt_number(v)
    tag = v[0]
    if tag == "str":
        return escape_json_string(v[1])
    if tag == "dt":
        _, y, mo, d, h, mi, s, us = v
        if us:
            return f'"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}.{us:06d}"'
        return f'"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"'
    if tag == "ts":
        micros = v[1]
        seconds, us = divmod(micros, 1_000_000)
        dt = datetime.fromtimestamp(seconds, tz=timezone.utc)
        if us:
            return f'"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}.{us:06d}Z"'
        return f'"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}Z"'
    if tag == "dur":
        _, neg, _days, h, mi, s, us = v
        sign = "-" if neg else ""
        if us:
            return f'"{sign}{h:02d}:{mi:02d}:{s:02d}.{us:06d}"'
        return f'"{sign}{h:02d}:{mi:02d}:{s:02d}"'
    if tag == "blob":
        return '"0x' + v[1].hex() + '"'
    if tag == "dec":
        return '"' + v[1] + '"'
    if tag == "json":
        return v[1]
    raise TypeError(f"unknown value tag {tag!r}")


def serialize_row(values: list) -> str:
    """Values → ``{"c0":…,"c1":…}`` with positional keys."""
    parts = []
    append = parts.append
    for i, v in enumerate(values):
        # inline the hot cases (NULL, int, tagged str); rest dispatch
        if v is None:
            append(f'"c{i}":null')
        elif type(v) is int:
            append(f'"c{i}":{v}')
        elif type(v) is tuple and v[0] == "str":
            append(f'"c{i}":{escape_json_string(v[1])}')
        else:
            append(f'"c{i}":{format_value(v)}')
    return "{" + ",".join(parts) + "}"
