"""Human-readable event/row formatting (the reference's stdout mode).

Formatting rules follow the reference's printer
(reference: src/output.zig:25-203): UTC timestamps, per-row dml +
table header lines, and the blob preview rule — blobs ≤256 bytes print
as full hex, larger ones as ``<blob N bytes: 0x…(32 bytes)…>``
(reference: src/event_parser.zig:354-373).
"""

from __future__ import annotations

from datetime import datetime, timezone


def format_blob(data: bytes) -> str:
    if len(data) <= 256:
        return "0x" + data.hex()
    return f"<blob {len(data)} bytes: 0x{data[:32].hex()}...>"


def format_scalar(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, bytes):
        return format_blob(v)
    if isinstance(v, tuple):
        tag = v[0]
        if tag == "str":
            return '"' + v[1].decode("utf-8", "replace") + '"'
        if tag == "blob":
            return format_blob(v[1])
        if tag in ("dec",):
            return '"' + v[1] + '"'
        if tag == "json":
            return v[1]
        if tag == "dt":
            _, y, mo, d, h, mi, s, us = v
            base = f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
            return base + (f".{us:06d}" if us else "")
        if tag == "ts":
            micros = v[1]
            sec, us = divmod(micros, 1_000_000)
            dt = datetime.fromtimestamp(sec, tz=timezone.utc)
            base = dt.strftime("%Y-%m-%dT%H:%M:%S")
            return base + (f".{us:06d}Z" if us else "Z")
        if tag == "dur":
            _, neg, _days, h, mi, s, us = v
            sign = "-" if neg else ""
            return f"{sign}{h:02d}:{mi:02d}:{s:02d}" + (f".{us:06d}" if us else "")
    return str(v)


def format_change_row(
    timestamp: int,
    database: str,
    table: str,
    dml: str,
    before: list | None,
    after: list | None,
) -> str:
    """One decoded change → a stdout-mode text block."""
    ts = datetime.fromtimestamp(timestamp, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S UTC")
    lines = [f"[{ts}] {dml} {database}.{table}"]
    if before is not None:
        lines.append("  before: " + ", ".join(f"c{i}={format_scalar(v)}" for i, v in enumerate(before)))
    if after is not None:
        lines.append("  after:  " + ", ".join(f"c{i}={format_scalar(v)}" for i, v in enumerate(after)))
    return "\n".join(lines)
