"""GTID sets: the MySQL global-transaction-ID interval-set type.

Text form (``SELECT @@gtid_executed``)::

    3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5:11:47-49,
    2C256447-3F0D-431B-95C4-8BDBCE3C5CE1:1-17

Binary form (COM_BINLOG_DUMP_GTID payload; little-endian, public wire
format from the MySQL source / dev.mysql.com):

    n_sids(8) then per sid: sid(16 raw bytes) + n_intervals(8) +
    per interval: start(8, inclusive) + end(8, EXCLUSIVE)

The engine uses GTID sets for tailer resume (auto-positioning by what
the segment archive already holds rather than by file/pos — survives a
failover to a server with different binlog file names). The reference
enumerates GTID event types but has no set type or GTID dump
(reference: src/event_parser.zig:74-76); the GTID event payload layout
it parses is the one this module's callers use (flags(1) + SID(16) +
GNO(8 LE), kernel.event_codec.parse_gtid).
"""

from __future__ import annotations

import struct
import uuid as _uuid


def _canon_sid(sid: str) -> str:
    return str(_uuid.UUID(sid)).lower()


def _merge(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Normalize [start, end) intervals: sorted, non-overlapping,
    non-adjacent."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(intervals):
        if e <= s:
            continue
        if out and s <= out[-1][1]:
            if e > out[-1][1]:
                out[-1] = (out[-1][0], e)
        else:
            out.append((s, e))
    return out


class GtidSet:
    """Mapping of server UUID → merged [start, end) GNO intervals."""

    def __init__(self, sids: dict[str, list[tuple[int, int]]] | None = None):
        self.sids: dict[str, list[tuple[int, int]]] = {}
        for sid, ivals in (sids or {}).items():
            m = _merge(list(ivals))
            if m:
                self.sids[_canon_sid(sid)] = m

    # -- construction ------------------------------------------------

    @classmethod
    def from_text(cls, text: str) -> "GtidSet":
        """Parse the @@gtid_executed / CHANGE MASTER text form."""
        out: dict[str, list[tuple[int, int]]] = {}
        text = "".join(text.split())  # the server inserts \n after commas
        if not text:
            return cls()
        for chunk in text.split(","):
            parts = chunk.split(":")
            sid = _canon_sid(parts[0])
            ivals = out.setdefault(sid, [])
            for rng in parts[1:]:
                if "-" in rng:
                    lo, hi = rng.split("-", 1)
                    ivals.append((int(lo), int(hi) + 1))
                else:
                    g = int(rng)
                    ivals.append((g, g + 1))
        return cls(out)

    @classmethod
    def from_binary(cls, data: bytes) -> "GtidSet":
        n_sids = struct.unpack_from("<Q", data, 0)[0]
        pos = 8
        out: dict[str, list[tuple[int, int]]] = {}
        for _ in range(n_sids):
            sid = str(_uuid.UUID(bytes=bytes(data[pos : pos + 16])))
            pos += 16
            n_iv = struct.unpack_from("<Q", data, pos)[0]
            pos += 8
            ivals = []
            for _ in range(n_iv):
                s, e = struct.unpack_from("<QQ", data, pos)
                pos += 16
                ivals.append((s, e))
            out[sid] = ivals
        return cls(out)

    # -- serialization -----------------------------------------------

    def to_text(self) -> str:
        chunks = []
        for sid in sorted(self.sids):
            rngs = [
                f"{s}-{e - 1}" if e - s > 1 else f"{s}" for s, e in self.sids[sid]
            ]
            chunks.append(":".join([sid] + rngs))
        return ",".join(chunks)

    def to_binary(self) -> bytes:
        out = bytearray(struct.pack("<Q", len(self.sids)))
        for sid in sorted(self.sids):
            out += _uuid.UUID(sid).bytes
            ivals = self.sids[sid]
            out += struct.pack("<Q", len(ivals))
            for s, e in ivals:
                out += struct.pack("<QQ", s, e)
        return bytes(out)

    # -- set operations ----------------------------------------------

    def contains(self, sid: str | bytes, gno: int) -> bool:
        if isinstance(sid, (bytes, bytearray)):
            sid = str(_uuid.UUID(bytes=bytes(sid)))
        ivals = self.sids.get(_canon_sid(sid))
        if not ivals:
            return False
        import bisect

        i = bisect.bisect_right(ivals, (gno, float("inf"))) - 1
        return i >= 0 and ivals[i][0] <= gno < ivals[i][1]

    def add(self, sid: str | bytes, gno: int) -> None:
        if isinstance(sid, (bytes, bytearray)):
            sid = str(_uuid.UUID(bytes=bytes(sid)))
        sid = _canon_sid(sid)
        self.sids[sid] = _merge(self.sids.get(sid, []) + [(gno, gno + 1)])

    def union(self, other: "GtidSet") -> "GtidSet":
        out = {sid: list(ivals) for sid, ivals in self.sids.items()}
        for sid, ivals in other.sids.items():
            out[sid] = out.get(sid, []) + list(ivals)
        return GtidSet(out)

    def is_subset_of(self, other: "GtidSet") -> bool:
        for sid, ivals in self.sids.items():
            for s, e in ivals:
                for g in (s, e - 1):
                    if not other.contains(sid, g):
                        return False
                # interval containment: every covered point must be in
                # ONE of other's merged intervals — endpoints suffice
                # only if other has no hole inside; check via overlap
                o = other.sids.get(sid, [])
                covered = sum(max(0, min(e, oe) - max(s, os_)) for os_, oe in o)
                if covered < e - s:
                    return False
        return True

    def __eq__(self, other) -> bool:
        return isinstance(other, GtidSet) and self.sids == other.sids

    def __bool__(self) -> bool:
        return bool(self.sids)

    def __repr__(self) -> str:
        return f"GtidSet({self.to_text()!r})"
