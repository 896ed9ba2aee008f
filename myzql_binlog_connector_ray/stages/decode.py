"""Segment decode stage: binary binlog segments → Arrow change batches.

Used as a callable class in ``map_batches(SegmentDecoder, concurrency=N,
batch_format="pyarrow")`` — an actor pool so the per-actor state
(table filter, schema registry, metrics counters) is built once per
actor, mirroring the reference's single reader thread state (TABLE_MAP
cache, format description; reference: src/binlog_reader.zig:52-55).

Per-*segment* decode state (FORMAT_DESCRIPTION post-header lengths, the
TABLE_MAP cache, the current GTID ordinal) is scoped to one segment's
bytes: segments are self-contained (each replays its own TABLE_MAPs,
as MySQL does per binlog file), which is exactly what makes
segment-parallel decode across tasks/actors safe (SURVEY.md §7.4).

Two output modes:

- ``envelope``: the reference's 9-column Parquet envelope
  (reference: src/parquet_writer.zig:124-134) with positional-key JSON
  row images, plus engine provenance columns (segment, ordinal).
- ``typed``: named, typed Arrow columns for ONE target table (via the
  schema registry) — the zero-JSON fast path the upsert apply consumes.

The table filter is applied at TABLE_MAP time so excluded tables skip
all row parsing (earliest-point filtering, as in the reference,
src/binlog_reader.zig:406-417).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..kernel.constants import (
    DELETE_EVENTS,
    INSERT_EVENTS,
    ROW_EVENT_TYPES,
    EventType,
    segment_sort_key,
)
from ..kernel.event_codec import (
    iter_events,
    parse_format_description,
    parse_gtid,
    parse_query,
    parse_row_event,
    parse_table_map,
)
from ..kernel.fast_decode import CompiledTableDecoder, parse_row_event_fast
from ..kernel.row_json import serialize_row
from ..kernel.table_filter import TableFilter

class SchemaEvolutionError(ValueError):
    """A mid-stream schema change the positional binlog decode cannot
    represent losslessly: a TABLE_MAP column-count decrease with no
    preceding DROP COLUMN DDL, or a lossy (narrowing / family-change)
    column type replacement. Fail loudly — silently misaligned or
    truncated decodes corrupt the lake."""


# int binlog types by width: evolution may only move right (widen)
_INT_WIDTH_RANK = {1: 1, 2: 2, 9: 3, 3: 4, 8: 5}  # TINY, SHORT, INT24, LONG, LONGLONG

# types whose metadata word is a max length: evolution may grow it,
# never shrink it (VARCHAR/VAR_STRING = max bytes, BLOB = length-size)
_LENGTH_META_TYPES = {15, 253}  # VARCHAR, VAR_STRING


def _type_evolution_ok(old: tuple[int, int], new: tuple[int, int]) -> bool:
    """May a column's (binlog type, metadata) evolve old → new without
    loss? Same type with non-shrinking length, or an integer widening."""
    (oct_, ometa), (nct, nmeta) = old, new
    if oct_ == nct:
        if oct_ in _LENGTH_META_TYPES:
            return nmeta >= ometa
        return True
    if oct_ in _INT_WIDTH_RANK and nct in _INT_WIDTH_RANK:
        return _INT_WIDTH_RANK[nct] >= _INT_WIDTH_RANK[oct_]
    return False


def _parse_drop_columns(schema: str, sql: str):
    """``ALTER TABLE [db.]tbl DROP [COLUMN] col[, DROP COLUMN ...]`` →
    ((db, tbl), [cols]) or None. The binlog carries no ALTER semantics
    beyond the SQL text, so drops are recognized from the QUERY event
    (add/widen need no DDL — the TABLE_MAP replacement carries them)."""
    import re

    m = re.match(
        r"(?is)^\s*ALTER\s+TABLE\s+(?:`?(\w+)`?\s*\.\s*)?`?(\w+)`?\s+(.*)$", sql.strip()
    )
    if not m:
        return None
    db = m.group(1) or schema
    _NOT_COLS = {"PRIMARY", "FOREIGN", "INDEX", "KEY", "CONSTRAINT", "CHECK", "PARTITION"}
    cols = [
        c
        for c in re.findall(r"(?i)\bDROP\s+(?:COLUMN\s+)?`?(\w+)`?", m.group(3))
        if c.upper() not in _NOT_COLS
    ]
    if not cols:
        return None
    return (db, m.group(2)), cols


ENVELOPE_FIELDS = [
    ("timestamp", pa.int64()),
    ("server_id", pa.int32()),
    ("log_pos", pa.int64()),
    ("event_row_index", pa.int64()),
    ("database", pa.string()),
    ("table_name", pa.string()),
    ("dml_type", pa.string()),
    ("before_values", pa.string()),
    ("after_values", pa.string()),
]
PROVENANCE_FIELDS = [("segment", pa.string()), ("ordinal", pa.int64())]
ENVELOPE_SCHEMA = pa.schema(ENVELOPE_FIELDS + PROVENANCE_FIELDS)


def _dml_name(event_type: int) -> str:
    if event_type in INSERT_EVENTS:
        return "INSERT"
    if event_type in DELETE_EVENTS:
        return "DELETE"
    return "UPDATE"


def _untag(v):
    """Tagged kernel value → plain Python value for typed Arrow columns."""
    if v is None or isinstance(v, (int, float)):
        return v
    tag = v[0]
    if tag == "str":
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


class SegmentDecoder:
    """Actor-pool decode: batches of {path, bytes} → change-row batches."""

    def __init__(
        self,
        mode: str = "envelope",
        include: Optional[list[str]] = None,
        exclude: Optional[list[str]] = None,
        registry: Optional[dict[tuple[str, str], list[str]]] = None,
        target_table: Optional[tuple[str, str]] = None,
        min_ordinal: Optional[int] = None,
        max_ordinal: Optional[int] = None,
        typed_types: Optional[dict[str, pa.DataType]] = None,
        dedup_keys: Optional[list[str]] = None,
        num_partitions: Optional[int] = None,
        target_tables: Optional[list[tuple[str, str]]] = None,
        typed_types_by_table: Optional[dict[tuple, dict]] = None,
        dedup_keys_by_table: Optional[dict[tuple, list[str]]] = None,
        num_partitions_by_table: Optional[dict[tuple, int]] = None,
        from_file: Optional[str] = None,
        from_position: Optional[int] = None,
        to_file: Optional[str] = None,
        to_position: Optional[int] = None,
        envelope_out_dir: Optional[str] = None,
        staging_dir: Optional[str] = None,
        staging_format: str = "ipc",
    ):
        assert mode in ("envelope", "typed")
        self.mode = mode
        self.filter = TableFilter(include, exclude) if (include or exclude) else None
        self.registry = registry or {}
        self.target_table = target_table
        # multi-table typed decode: ONE pass over the segment bytes
        # emits a per-table change stream for EVERY listed table (a real
        # CDC deployment replicates its whole filter set, not one
        # table). Requires the staged exchange (staging_dir +
        # num_partitions + dedup_keys_by_table) so the map_batches
        # output schema stays uniform: tiny manifest rows
        # (table_ns, part, rows, path).
        self.target_tables = target_tables
        self.typed_types_by_table = typed_types_by_table or {}
        self.dedup_keys_by_table = dedup_keys_by_table or {}
        # per-table partition counts: a quiet side table should not pay
        # a busy table's partition fan-out (apply cost is one task per
        # (table, partition)); falls back to the shared num_partitions
        self.num_partitions_by_table = num_partitions_by_table or {}
        if target_tables is not None:
            self._targets = frozenset(target_tables)
        elif target_table is not None:
            self._targets = frozenset([target_table])
        else:
            self._targets = None
        self.min_ordinal = min_ordinal
        self.max_ordinal = max_ordinal
        self.typed_types = typed_types or {}
        # typed-mode fused LWW pre-dedup: events are scanned in ordinal
        # order within a segment, so a dict overwrite keyed on the key
        # columns keeps exactly the latest change per key per batch —
        # the shuffle then ships ≤1 row/key/segment (incl. DELETE
        # tombstones) instead of every event.
        self.dedup_keys = dedup_keys
        self.num_partitions = num_partitions
        # (file, position) range predicate — the reference's stop/start
        # checks (src/binlog_reader.zig:284-305). In a file-based engine
        # this is pushdown: whole segments outside [from_file, to_file]
        # are skipped before any event parsing; boundary segments mask
        # rows by log_pos (log_pos = event end position).
        self.from_file = from_file
        self.from_position = from_position
        self.to_file = to_file
        self.to_position = to_position
        # file-per-binlog sink (reference rotation policy: one parquet
        # file per binlog file, overwrite-idempotent; src/pipeline.zig:470-479)
        self.envelope_out_dir = envelope_out_dir
        # typed-mode staged exchange: instead of returning wide change
        # rows into the object store for a sort shuffle, write them
        # part-bucketed to ``staging_dir/part=P/<segments>.parquet``
        # (atomic rename, overwrite-idempotent → resumable) and return
        # only tiny manifest rows. This is the map side of a filesystem
        # exchange — on a multi-node cluster the staging dir is shared
        # storage and the exchange is network-parallel file I/O, not an
        # object-store all-to-all.
        self.staging_dir = staging_dir
        # "ipc" (Arrow feather, near-zero encode/decode cost — right for
        # a node-local or fast shared FS) or "parquet" (lz4; smaller
        # bytes — right when the staging dir is remote object storage)
        self.staging_format = staging_format
        # per-actor metrics (reference: src/metrics.zig:25-46)
        self.metrics = {"events": 0, "rows": 0, "filtered_tables": 0, "segments": 0}
        # compiled row decoders, cached per column layout (survives the
        # TABLE_MAP-per-transaction re-emission MySQL does)
        self._compiled: dict[tuple, CompiledTableDecoder] = {}

    def _compiled_for(self, tm) -> CompiledTableDecoder:
        key = (tuple(tm.column_types), tuple(tm.column_meta))
        dec = self._compiled.get(key)
        if dec is None:
            dec = CompiledTableDecoder(tm.column_types, tm.column_meta, plain=(self.mode == "typed"))
            self._compiled[key] = dec
        return dec

    # -- per-segment decode ------------------------------------------------

    def _segment_in_range(self, seg: str) -> bool:
        k = segment_sort_key(seg)
        if self.from_file is not None and k < segment_sort_key(self.from_file):
            return False
        if self.to_file is not None and k > segment_sort_key(self.to_file):
            return False
        return True

    def _event_in_range(self, seg: str, log_pos: int) -> bool:
        if self.from_file is not None and self.from_position is not None and seg == self.from_file:
            if log_pos <= self.from_position:
                return False
        if self.to_file is not None and self.to_position is not None and seg == self.to_file:
            if log_pos > self.to_position:
                return False
        return True

    def _validate_evolution(
        self,
        tt: tuple,
        tm,
        reg: list[str],
        live_cols: dict,
        col_types: dict,
        image_maps: dict,
    ) -> None:
        """Reconcile a (new or replaced) TABLE_MAP layout against this
        segment's evolution state. Semantics (round-5):

        - column ADD: count grows → extend with the registry names not
          yet live, registry order (the existing pad-at-end behavior).
        - column DROP: only via a preceding DROP COLUMN QUERY event; a
          count decrease without one raises (positional decode would
          silently misalign every later column). Dropped registry
          columns null-fill downstream (`_finalize_arrow`).
        - type NARROWING / family change: raises — a lossy re-decode
          would corrupt the lake (int widths may only grow, VARCHAR max
          lengths may only grow; widening is the one tested direction,
          reference analogue: replace-on-rewrite src/binlog_reader.zig:419-423).
        """
        n = tm.column_count
        cols = live_cols.get(tt)
        if cols is None:
            cols = list(reg[:n])
            if len(cols) < n:
                raise SchemaEvolutionError(
                    f"{tt[0]}.{tt[1]}: TABLE_MAP describes {n} columns but the registry "
                    f"only names {len(reg)} — register the full schema before ingesting"
                )
            live_cols[tt] = cols
        elif n > len(cols):
            for name in reg:
                if len(cols) >= n:
                    break
                if name not in cols:
                    cols.append(name)
            if len(cols) < n:
                raise SchemaEvolutionError(
                    f"{tt[0]}.{tt[1]}: TABLE_MAP grew to {n} columns but the registry "
                    f"only names {len(reg)} — register the added column(s) first"
                )
        elif n < len(cols):
            raise SchemaEvolutionError(
                f"{tt[0]}.{tt[1]}: TABLE_MAP column count fell {len(cols)} → {n} with no "
                "preceding DROP COLUMN DDL — positional decode would misalign every "
                "column after the dropped one; rejecting this stream"
            )
        prev_types = col_types.get(tt, {})
        new_types = {}
        for i, name in enumerate(cols):
            ct_meta = (tm.column_types[i], tm.column_meta[i])
            old = prev_types.get(name)
            if old is not None and not _type_evolution_ok(old, ct_meta):
                raise SchemaEvolutionError(
                    f"{tt[0]}.{tt[1]}: column '{name}' changed binlog type "
                    f"{old[0]}(meta {old[1]}) → {ct_meta[0]}(meta {ct_meta[1]}) mid-stream — "
                    "narrowing/family changes are lossy for already-decoded rows; "
                    "re-bootstrap the table instead"
                )
            new_types[name] = ct_meta
        col_types[tt] = new_types
        if cols == list(reg[: len(cols)]):
            image_maps.pop(tt, None)
        else:
            image_maps[tt] = [reg.index(c) for c in cols]

    def _decode_segment(self, name: str, blob: bytes, sink) -> None:
        import os as _os

        seg = _os.path.basename(name)
        if not self._segment_in_range(seg):
            return
        check_pos = (self.from_file == seg and self.from_position is not None) or (
            self.to_file == seg and self.to_position is not None
        )
        post_header_len: bytes | None = None
        table_maps: dict[int, object] = {}
        filtered_ids: set[int] = set()
        ordinal = -1
        self.metrics["segments"] += 1
        # schema-evolution state, segment-scoped like the TABLE_MAP
        # cache (segments are self-contained; CROSS-segment drops are
        # the operator's registry-update contract — a later segment's
        # narrower TABLE_MAP alone is indistinguishable from a pre-add
        # schema, so positional decode pads at the end as before):
        #   live_cols: registry names currently present, in image order
        #   col_types: per live column, (binlog type, metadata)
        #   image_maps: image position → registry index, only when a
        #     drop made the mapping non-identity-prefix
        live_cols: dict[tuple, list[str]] = {}
        col_types: dict[tuple, dict[str, tuple[int, int]]] = {}
        image_maps: dict[tuple, list[int]] = {}
        validated: dict[tuple, tuple] = {}  # tt → last validated layout

        for ev in iter_events(blob):
            et = ev.event_type
            self.metrics["events"] += 1
            if et == EventType.FORMAT_DESCRIPTION_EVENT:
                post_header_len = parse_format_description(ev.data)["post_header_len"]
            elif et == EventType.GTID_EVENT:
                ordinal = parse_gtid(ev.data)
            elif et == EventType.QUERY_EVENT:
                # DDL: add/widen ride on the TABLE_MAP replacement that
                # follows; DROP COLUMN must come from the SQL text (the
                # narrower TABLE_MAP alone can't say WHICH column left)
                schema, sql = parse_query(ev.data)
                drop = _parse_drop_columns(schema, sql)
                if drop is not None and drop[0] in self.registry:
                    tt = drop[0]
                    cols = live_cols.get(tt)
                    if cols is None:
                        cols = list(self.registry[tt])
                    live_cols[tt] = [c for c in cols if c not in set(drop[1])]
                    types = col_types.get(tt)
                    if types:
                        for c in drop[1]:
                            types.pop(c, None)
                    validated.pop(tt, None)
            elif et == EventType.TABLE_MAP_EVENT:
                tm = parse_table_map(ev.data)
                if self.filter is not None and not self.filter.should_include(tm.database_name, tm.table_name):
                    filtered_ids.add(tm.table_id)
                    table_maps.pop(tm.table_id, None)
                    self.metrics["filtered_tables"] += 1
                else:
                    filtered_ids.discard(tm.table_id)
                    table_maps[tm.table_id] = tm  # replace-on-rewrite = schema evolution
                    tt = (tm.database_name, tm.table_name)
                    reg = self.registry.get(tt)
                    if reg:
                        layout = (len(tm.column_types), tuple(tm.column_types), tuple(tm.column_meta))
                        if validated.get(tt) != layout:  # skip per-transaction re-emissions
                            self._validate_evolution(
                                tt, tm, list(reg), live_cols, col_types, image_maps
                            )
                            validated[tt] = layout
            elif et in ROW_EVENT_TYPES:
                if self.min_ordinal is not None and ordinal < self.min_ordinal:
                    continue
                if self.max_ordinal is not None and ordinal > self.max_ordinal:
                    continue
                if check_pos and not self._event_in_range(seg, ev.log_pos):
                    continue
                table_id = int.from_bytes(ev.data[0:6], "little")
                if table_id in filtered_ids:
                    continue
                tm = table_maps.get(table_id)
                if tm is None:
                    continue
                if self._targets is not None and (tm.database_name, tm.table_name) not in self._targets:
                    continue
                try:
                    rows = parse_row_event_fast(
                        et, ev.data, tm, post_header_len, self._compiled_for(tm)
                    )
                except ValueError:
                    # partial column presence → generic decoder
                    pairs = parse_row_event(et, ev.data, tm, post_header_len)
                    if self.mode == "typed":
                        rows = [
                            (
                                None if p.before is None else [_untag(v) for v in p.before],
                                None if p.after is None else [_untag(v) for v in p.after],
                            )
                            for p in pairs
                        ]
                    else:
                        rows = [(p.before, p.after) for p in pairs]
                self.metrics["rows"] += len(rows)
                im = image_maps.get((tm.database_name, tm.table_name))
                if im is not None:
                    # a DROP COLUMN made the positional mapping
                    # non-identity: place each image value under its
                    # registry column; dropped registry columns stay
                    # None (→ null-filled in the lake)
                    ncols_t = len(self.registry[(tm.database_name, tm.table_name)])

                    def _remap(img):
                        if img is None:
                            return None
                        out = [None] * ncols_t
                        for pos, ridx in enumerate(im):
                            if pos < len(img):
                                out[ridx] = img[pos]
                        return out

                    rows = [(_remap(b), _remap(a)) for b, a in rows]
                sink(name, ev, ordinal, tm, _dml_name(et), rows)

    # -- batch entry points ------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch["path"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        if self.mode == "envelope":
            return self._envelope_batch(names, blobs)
        if self.target_tables is not None:
            return self._typed_batch_multi(names, blobs)
        return self._typed_batch(names, blobs)

    def _write_segment_files(self, table: pa.Table) -> pa.Table:
        """Split the envelope batch by segment and atomically write one
        ``<segment>.parquet`` per binlog file; returns summary rows."""
        import os
        import uuid

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        os.makedirs(self.envelope_out_dir, exist_ok=True)
        out = {"segment": [], "rows": [], "bytes": [], "path": []}
        for seg in pc.unique(table["segment"]).to_pylist():
            part = table.filter(pc.equal(table["segment"], seg))
            dest = os.path.join(self.envelope_out_dir, f"{seg}.parquet")
            tmp = dest + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(part, tmp, compression="zstd", row_group_size=8192)
            os.replace(tmp, dest)  # re-runs overwrite: idempotent per segment
            out["segment"].append(seg)
            out["rows"].append(part.num_rows)
            out["bytes"].append(os.path.getsize(dest))
            out["path"].append(dest)
        return pa.table(
            {
                "segment": pa.array(out["segment"], pa.string()),
                "rows": pa.array(out["rows"], pa.int64()),
                "bytes": pa.array(out["bytes"], pa.int64()),
                "path": pa.array(out["path"], pa.string()),
            }
        )

    def _envelope_batch(self, names, blobs) -> pa.Table:
        cols = {name: [] for name, _ in ENVELOPE_FIELDS}
        cols["segment"] = []
        cols["ordinal"] = []

        def sink(name, ev, ordinal, tm, dml, rows):
            import os

            seg = os.path.basename(name)
            for idx, (before, after) in enumerate(rows):
                cols["timestamp"].append(ev.timestamp)
                cols["server_id"].append(ev.server_id)
                cols["log_pos"].append(ev.log_pos)
                cols["event_row_index"].append(idx + 1)
                cols["database"].append(tm.database_name)
                cols["table_name"].append(tm.table_name)
                cols["dml_type"].append(dml)
                cols["before_values"].append(None if before is None else serialize_row(before))
                cols["after_values"].append(None if after is None else serialize_row(after))
                cols["segment"].append(seg)
                cols["ordinal"].append(ordinal)

        for name, blob in zip(names, blobs):
            self._decode_segment(name, blob, sink)
        table = pa.table(
            {name: pa.array(cols[name], type=typ) for name, typ in ENVELOPE_FIELDS + PROVENANCE_FIELDS}
        )
        if self.envelope_out_dir is not None:
            return self._write_segment_files(table)
        return table

    def _typed_batch(self, names, blobs) -> pa.Table:
        """Typed change rows for the target table, schema-evolution aware.

        Output: segment, ordinal, event_row_index, dml + one column per
        registry name (max width seen in the registry); UPDATE/INSERT
        take the after image, DELETE the before image (key columns).
        """
        assert self.target_table is not None, "typed mode requires target_table"
        col_names = list(self.registry.get(self.target_table, []))
        ncols = len(col_names)

        if self.dedup_keys:
            rows_out = self._typed_collect_dedup(names, blobs, col_names, ncols)
        else:
            rows_out = self._typed_collect_all(names, blobs, col_names, ncols)

        seg_l, ord_l, eri_l, dml_l, col_lists = rows_out
        out = {
            "segment": pa.array(seg_l, pa.string()),
            "ordinal": pa.array(ord_l, pa.int64()),
            "event_row_index": pa.array(eri_l, pa.int64()),
            "dml": pa.array(dml_l, pa.string()),
        }
        for i, c in enumerate(col_names):
            out[c] = pa.array(col_lists[i], type=self.typed_types.get(c))
        table = pa.table(out)
        if self.num_partitions is not None and "repo" in out and "path" in out:
            from .apply import add_partition

            table = add_partition(table, self.num_partitions)
        if self.staging_dir is not None:
            return self._write_staged(table, names)
        return table

    def _typed_batch_multi(self, names, blobs) -> pa.Table:
        """Multi-table typed decode: one pass over the segment bytes →
        one staged change stream PER target table (its own dedup keys,
        types, and hash partitioning), with uniform manifest-row output
        ``(table_ns, part, rows, path)``. The per-table LWW pre-dedup
        is the same dict-overwrite fused combiner as the single-table
        path (segments scanned in commit order)."""
        assert self.staging_dir is not None and self.num_partitions is not None, (
            "multi-table typed decode requires the staged exchange"
        )
        from .apply import partition_of_cols

        col_names = {tt: list(self.registry[tt]) for tt in self.target_tables}
        accs: dict[tuple, dict] = {
            tt: {
                "ncols": len(col_names[tt]),
                "key_idx": [col_names[tt].index(k) for k in self.dedup_keys_by_table[tt]],
                "store": {},
            }
            for tt in self.target_tables
        }

        def sink(name, ev, ordinal, tm, dml, rows):
            import os as _os

            tt = (tm.database_name, tm.table_name)
            a = accs.get(tt)
            if a is None or not rows:
                return
            seg = _os.path.basename(name)
            b0, a0 = rows[0]
            first = a0 if a0 is not None else b0
            ncols = a["ncols"]
            pad = [None] * (ncols - len(first)) if len(first) < ncols else []
            key_idx, store = a["key_idx"], a["store"]
            for idx, (before, after) in enumerate(rows):
                image = after if after is not None else before
                if pad:
                    image = image + pad
                store[tuple(image[i] for i in key_idx)] = (seg, ordinal, idx + 1, dml, image)

        for name, blob in sorted(zip(names, blobs), key=lambda nb: segment_sort_key(nb[0])):
            self._decode_segment(name, blob, sink)

        import os as _os

        outs = []
        for tt in self.target_tables:
            a = accs[tt]
            if not a["store"]:
                continue
            vals = a["store"].values()
            cols = {
                "segment": pa.array([v[0] for v in vals], pa.string()),
                "ordinal": pa.array([v[1] for v in vals], pa.int64()),
                "event_row_index": pa.array([v[2] for v in vals], pa.int64()),
                "dml": pa.array([v[3] for v in vals], pa.string()),
            }
            types = self.typed_types_by_table.get(tt, {})
            col_lists = self._pivot_images([v[4] for v in vals], a["ncols"])
            for i, c in enumerate(col_names[tt]):
                cols[c] = pa.array(col_lists[i], type=types.get(c))
            table = pa.table(cols)
            n_parts = self.num_partitions_by_table.get(tt, self.num_partitions)
            part = partition_of_cols(table, self.dedup_keys_by_table[tt], n_parts)
            table = table.append_column("part", pa.array(part, pa.int32()))
            ns = f"{tt[0]}.{tt[1]}"
            staged = self._write_staged(
                table, names, staging_dir=_os.path.join(self.staging_dir, ns)
            )
            outs.append(
                staged.add_column(0, "table_ns", pa.array([ns] * len(staged), pa.string()))
            )
        if not outs:
            return pa.table(
                {
                    "table_ns": pa.array([], pa.string()),
                    "part": pa.array([], pa.int32()),
                    "rows": pa.array([], pa.int64()),
                    "path": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(outs)

    def _write_staged(self, table: pa.Table, names, staging_dir: Optional[str] = None) -> pa.Table:
        """Map side of the staged exchange: split this batch's rows by
        ``part`` and write one parquet per partition bucket. File name
        derives from the batch's segment names, so re-running the same
        segment overwrites its own files (idempotent / resumable)."""
        import hashlib as _hashlib
        import os
        import uuid

        import numpy as np
        import pyarrow.parquet as pq

        staging_dir = staging_dir or self.staging_dir
        tag = _hashlib.blake2b(
            "\x00".join(sorted(os.path.basename(n) for n in names)).encode(), digest_size=8
        ).hexdigest()
        part_np = table["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(part_np, kind="stable")
        sorted_parts = part_np[order]
        bounds = np.flatnonzero(np.diff(sorted_parts)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sorted_parts)]))
        ordered = table.take(pa.array(order)) if len(order) else table
        out = {"part": [], "rows": [], "path": []}
        for s, e in zip(starts.tolist(), ends.tolist()):
            if s == e:
                continue
            p = int(sorted_parts[s])
            pdir = os.path.join(staging_dir, f"part={p}")
            os.makedirs(pdir, exist_ok=True)
            dest = os.path.join(pdir, f"{tag}.{self.staging_format}")
            tmp = dest + f".tmp-{uuid.uuid4().hex}"
            # the staging round-trip must not cost more than the shuffle
            # it replaces: IPC ≈ memcpy; parquet uses cheap lz4
            if self.staging_format == "ipc":
                import pyarrow.feather as feather

                feather.write_feather(ordered.slice(s, e - s), tmp, compression="uncompressed")
            else:
                pq.write_table(ordered.slice(s, e - s), tmp, compression="lz4")
            os.replace(tmp, dest)
            out["part"].append(p)
            out["rows"].append(e - s)
            out["path"].append(dest)
        return pa.table(
            {
                "part": pa.array(out["part"], pa.int32()),
                "rows": pa.array(out["rows"], pa.int64()),
                "path": pa.array(out["path"], pa.string()),
            }
        )

    @staticmethod
    def _pivot_images(images, ncols):
        """Row-major image lists → ncols column lists.

        ``zip(*images)`` transposes at C speed when every image is full
        width (the overwhelmingly common case); mixed widths (schema
        evolution inside one batch) pad with None in the slow path.
        """
        if not images:
            return [[] for _ in range(ncols)]
        if all(len(img) == ncols for img in images):
            return list(zip(*images))
        return [
            [img[i] if i < len(img) else None for img in images] for i in range(ncols)
        ]

    def _typed_collect_all(self, names, blobs, col_names, ncols):
        import os

        seg_l: list = []
        ord_l: list = []
        eri_l: list = []
        dml_l: list = []
        images: list = []

        def sink(name, ev, ordinal, tm, dml, rows):
            seg = os.path.basename(name)
            if not rows:
                return
            f0 = rows[0][1] if rows[0][1] is not None else rows[0][0]
            # pad pre-evolution (narrow) images once per event so the
            # pivot always takes the C-speed zip transpose
            pad = [None] * (ncols - len(f0)) if len(f0) < ncols else None
            idx = 0
            for before, after in rows:
                idx += 1
                seg_l.append(seg)
                ord_l.append(ordinal)
                eri_l.append(idx)
                dml_l.append(dml)
                image = after if after is not None else before
                images.append(image if pad is None else image + pad)

        for name, blob in zip(names, blobs):
            self._decode_segment(name, blob, sink)
        return seg_l, ord_l, eri_l, dml_l, self._pivot_images(images, ncols)

    def _typed_collect_dedup(self, names, blobs, col_names, ncols):
        """Latest change per key via dict overwrite (fused LWW combiner).

        Segments are decoded in file-name order; binlog file names are
        monotone in commit ordinal (a later file holds later
        transactions), events within a segment arrive in ordinal order
        and rows within an event in row order — so plain dict
        assignment IS last-writer-wins, with no per-row ordinal
        compare. Short images (pre-evolution schema narrower than the
        key columns) take the padded slow path.
        """
        key_idx = [col_names.index(k) for k in self.dedup_keys]
        max_key = max(key_idx)
        k0 = key_idx[0]
        k1 = key_idx[1] if len(key_idx) == 2 else None
        store: dict = {}

        def sink(name, ev, ordinal, tm, dml, rows):
            import os

            seg = os.path.basename(name)
            if not rows:
                return
            b0, a0 = rows[0]
            first = a0 if a0 is not None else b0
            w = len(first)
            if w == ncols and k1 is not None:
                # hot path: full-width image, two key columns
                idx = 0
                for before, after in rows:
                    image = after if after is not None else before
                    idx += 1
                    store[(image[k0], image[k1])] = (seg, ordinal, idx, dml, image)
                return
            # pre-evolution (narrow) image or generic key shape: pad once
            # per event so the pivot always zip-transposes
            pad = [None] * (ncols - w) if w < ncols else []
            for idx, (before, after) in enumerate(rows):
                image = after if after is not None else before
                if pad:
                    image = image + pad
                key = tuple(image[i] for i in key_idx)
                store[key] = (seg, ordinal, idx + 1, dml, image)

        for name, blob in sorted(zip(names, blobs), key=lambda nb: segment_sort_key(nb[0])):
            self._decode_segment(name, blob, sink)

        vals = store.values()
        seg_l = [v[0] for v in vals]
        ord_l = [v[1] for v in vals]
        eri_l = [v[2] for v in vals]
        dml_l = [v[3] for v in vals]
        images = [v[4] for v in vals]
        return seg_l, ord_l, eri_l, dml_l, self._pivot_images(images, ncols)
