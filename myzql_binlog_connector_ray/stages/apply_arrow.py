"""Arrow-native LWW apply (the hot path of the upsert pipeline).

Same semantics as stages.apply._lww_fold / ApplyPartition, but the fold
runs entirely in pyarrow compute kernels — the wide ``content`` strings
never round-trip through pandas object arrays:

- sort change rows by the two int order columns (C radix-ish sort);
- ``group_by(key).aggregate([... 'last'])`` (single-threaded hash agg,
  so "last" follows the sorted order) keeps the latest change per key;
- concat base-first + one more last-per-key group collapses base rows
  under their superseding change;
- null-dml (base) rows are kept, DELETE rows dropped.

Equality with the pandas fold is pinned by tests/test_apply_arrow.py.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..state.manifest import commit_delta, commit_partition, read_manifest
from .apply import KEY_COLS, ORDER_COLS, sha256_hex

_ORDER_KEYS = [("ordinal", "ascending"), ("event_row_index", "ascending")]


def _last_per_key(t: pa.Table, key_cols: Optional[list[str]] = None) -> pa.Table:
    keys = key_cols or KEY_COLS
    agg_cols = [c for c in t.column_names if c not in keys]
    # skip_nulls=False: "last" must take the last ROW's value even when
    # it is null — otherwise an updated key keeps stale base-row values
    # for columns the change row left null (e.g. content_sha256)
    opts = pc.ScalarAggregateOptions(skip_nulls=False)
    out = t.group_by(keys, use_threads=False).aggregate([(c, "last", opts) for c in agg_cols])
    # rebuild by name — aggregate's output column order is an implementation detail
    return pa.table({**{k: out[k] for k in keys}, **{c: out[f"{c}_last"] for c in agg_cols}})


def lww_fold_arrow(
    base: Optional[pa.Table], changes: pa.Table, key_cols: Optional[list[str]] = None
) -> pa.Table:
    changes = changes.take(pc.sort_indices(changes, sort_keys=_ORDER_KEYS))
    reduced = _last_per_key(changes, key_cols)
    if base is not None and base.num_rows:
        merged = pa.concat_tables([base, reduced], promote_options="permissive")
        merged = _last_per_key_ordered(merged, key_cols)
    else:
        merged = reduced
    if "dml" in merged.column_names:
        dml = pc.fill_null(merged["dml"], "BASE")
        merged = merged.filter(pc.not_equal(dml, "DELETE"))
    return merged


def _last_per_key_ordered(t: pa.Table, key_cols: Optional[list[str]] = None) -> pa.Table:
    """last-per-key where input row order (base first, changes after)
    decides the winner — combine chunks so order is well-defined."""
    return _last_per_key(t.combine_chunks(), key_cols)


def _finalize_arrow(
    t: pa.Table,
    final_columns: Optional[list[str]],
    final_types: Optional[dict] = None,
) -> pa.Table:
    drop = [c for c in ("ordinal", "event_row_index", "dml", "segment", "part") if c in t.column_names]
    out = t.drop_columns(drop)
    if "content" not in out.column_names:
        # content-free table (multi-table ingest namespaces without a
        # document body): no sha lineage column to maintain
        if final_columns:
            types = final_types or {}
            for c in final_columns:
                if c not in out.column_names:
                    out = out.append_column(c, pa.nulls(out.num_rows, types.get(c, pa.string())))
            out = out.select(final_columns)
        return out
    if "content_sha256" in out.column_names:
        sha = out["content_sha256"]
        need_mask = pc.is_null(sha)
        if pc.any(need_mask).as_py():
            contents = out["content"].to_pylist()
            shas = sha.to_pylist()
            for i, missing in enumerate(need_mask.to_pylist()):
                if missing:
                    c = contents[i]
                    shas[i] = hashlib.sha256(c.encode()).hexdigest() if isinstance(c, str) else None
            out = out.set_column(
                out.schema.get_field_index("content_sha256"), "content_sha256", pa.array(shas, pa.string())
            )
    else:
        out = out.append_column("content_sha256", pa.array(sha256_hex(out["content"].to_pylist()), pa.string()))
    if final_columns:
        types = final_types or {}
        for c in final_columns:
            if c not in out.column_names:
                out = out.append_column(c, pa.nulls(out.num_rows, types.get(c, pa.string())))
        out = out.select(final_columns)
    return out


def _state_sha(final: pa.Table) -> str:
    """Deterministic per-partition state digest for the manifest: the
    content sha chain when the table carries one, else sha256 over the
    Arrow IPC stream bytes of the schema-ordered, metadata-stripped,
    single-chunk table. The IPC encoding is a specified public format,
    so the committed digest is not coupled to pandas/numpy hashing or
    dtype-conversion behavior (round-4 ADVICE: a library upgrade must
    not make verify_lake flag healthy partitions)."""
    if "content_sha256" in final.column_names:
        sha_col = pc.fill_null(final["content_sha256"], "").to_pylist()
        return hashlib.sha256("\n".join(sha_col).encode()).hexdigest()
    import pyarrow.ipc as ipc

    t = final.select(sorted(final.column_names)).combine_chunks()
    t = t.replace_schema_metadata(None)
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return hashlib.sha256(sink.getvalue().to_pybytes()).hexdigest()


class ApplyPartitionArrow:
    """pyarrow map_groups body — see stages.apply.ApplyPartition for the
    manifest/exactly-once contract (identical here)."""

    def __init__(
        self,
        lake_dir: Optional[str] = None,
        write: bool = False,
        final_columns: Optional[list[str]] = None,
        final_types: Optional[dict] = None,
        key_cols: Optional[list[str]] = None,
        sink_mode: str = "rewrite",
        compact_every: Optional[int] = None,
    ):
        assert sink_mode in ("rewrite", "delta")
        self.lake_dir = lake_dir
        self.write = write
        self.final_columns = final_columns
        self.final_types = final_types
        self.key_cols = key_cols or KEY_COLS
        # delta sink: fold a partition back to a single base file as
        # soon as it accumulates this many delta files — bounds read
        # amplification inline (single-writer context, so the fold is
        # safe here) without waiting for an external compaction job
        self.compact_every = compact_every
        # "rewrite": fold changes into the base and rewrite the
        # partition file (read-optimal). "delta": append the reduced
        # change rows as a delta file and defer the fold to compaction /
        # fold-on-read — bounded write amplification for small frequent
        # batches (the LWW fold is associative, so base ∘ (d1+d2) ==
        # (base ∘ d1) ∘ d2; property-pinned in tests).
        self.sink_mode = sink_mode

    def _read_base(self, part: int) -> Optional[pa.Table]:
        """Folded on-disk state: base file(s) + any live delta files
        (delta-aware, so rewrite mode and reads compose with a
        delta-mode history)."""
        if self.lake_dir is None:
            return None
        import glob

        import pyarrow.parquet as pq

        from ..state.manifest import list_delta_files, partition_dir, read_manifest

        files = sorted(glob.glob(partition_dir(self.lake_dir, part) + "/*.parquet"))
        base_files = [f for f in files if not f.rsplit("/", 1)[-1].startswith("delta-")]
        base = (
            pa.concat_tables([pq.read_table(f) for f in base_files], promote_options="permissive")
            if base_files
            else None
        )
        manifest = read_manifest(self.lake_dir, part)
        compacted_through = int((manifest or {}).get("compacted_through", -1))
        deltas = list_delta_files(self.lake_dir, part, compacted_through)
        if not deltas:
            return base
        dt = pa.concat_tables([pq.read_table(f) for f in deltas], promote_options="permissive")
        return lww_fold_arrow(base, dt, self.key_cols)

    def _summary(self, part: int, rows: int, watermark: int, skipped: bool) -> pa.Table:
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "rows": pa.array([rows], pa.int64()),
                "watermark": pa.array([watermark], pa.int64()),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        watermark = int(pc.max(group["ordinal"]).as_py())

        if not self.write:
            base = self._read_base(part)
            return _finalize_arrow(
                lww_fold_arrow(base, group, self.key_cols), self.final_columns, self.final_types
            )
        # the whole read-fold-commit section holds the partition lease:
        # a compaction (or another writer) racing this wave on the same
        # partition serializes instead of interleaving between the
        # manifest read and the atomic replace
        from ..state.manifest import partition_lease

        with partition_lease(self.lake_dir, part):
            return self._apply_leased(group, part, watermark)

    def _apply_leased(self, group: pa.Table, part: int, watermark: int) -> pa.Table:
        manifest = read_manifest(self.lake_dir, part)
        if manifest is not None:
            if manifest["watermark"] >= watermark:
                return self._summary(part, manifest["rows"], manifest["watermark"], True)
            group = group.filter(pc.greater(group["ordinal"], manifest["watermark"]))
            if group.num_rows == 0:
                return self._summary(part, manifest["rows"], manifest["watermark"], True)

        if self.sink_mode == "delta":
            # append-only sink: LWW-reduce this batch per key (still
            # carrying ordinal/event_row_index/dml) and commit it as one
            # delta file — no base read, no rewrite
            reduced = _last_per_key(
                group.take(pc.sort_indices(group, sort_keys=_ORDER_KEYS)).combine_chunks(),
                self.key_cols,
            )
            if "part" in reduced.column_names:
                reduced = reduced.drop_columns(["part"])
            manifest = commit_delta(
                self.lake_dir, part, reduced, watermark, key_cols=self.key_cols
            )
            if self.compact_every and manifest["deltas"] >= self.compact_every:
                c = compact_partition(
                    self.lake_dir,
                    part,
                    key_cols=self.key_cols,
                    final_columns=self.final_columns,
                    final_types=self.final_types,
                )
                return self._summary(part, c["rows"], c["watermark"], False)
            return self._summary(part, manifest["rows"], manifest["watermark"], False)

        base = self._read_base(part)
        final = _finalize_arrow(
            lww_fold_arrow(base, group, self.key_cols), self.final_columns, self.final_types
        )
        final = final.take(
            pc.sort_indices(final, sort_keys=[(k, "ascending") for k in self.key_cols])
        )
        manifest = commit_partition(
            self.lake_dir, part, final, watermark, _state_sha(final), key_cols=self.key_cols
        )
        # a rewrite over a delta-mode history folded the live delta
        # files into the new base (_read_base); they are now ≤
        # compacted_through, i.e. stale. Unlink them with the same
        # crash-safe ordering as compact_partition (commit first, then
        # cleanup) — otherwise read_lake() over this "plain rewrite"
        # lake would still scan them and return duplicate keys
        # (round-4 ADVICE, medium).
        _unlink_stale_deltas(self.lake_dir, part, int(manifest["compacted_through"]))
        return self._summary(part, manifest["rows"], manifest["watermark"], False)


def _unlink_stale_deltas(lake_dir: str, part: int, compacted_through: int) -> None:
    """Remove delta files already folded into the committed base
    (watermark ≤ compacted_through). Always safe AFTER a successful
    commit_partition: a crash mid-cleanup only leaves stale files,
    which list_delta_files ignores and the next pass removes."""
    import glob
    import os

    from ..state.manifest import delta_watermark_of, partition_dir

    for f in glob.glob(os.path.join(partition_dir(lake_dir, part), "delta-*.parquet")):
        if delta_watermark_of(f) <= compacted_through:
            try:
                os.unlink(f)
            except OSError:
                pass


def compact_partition(
    lake_dir: str,
    part: int,
    *,
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
    retain_after: Optional[int] = None,
) -> dict:
    """Fold a partition's live delta files into its base and rewrite it
    as one ``data.parquet`` (the read-optimal form), then remove the
    folded + any stale delta files. With ``retain_after`` set, fold
    only windows at or below that horizon and keep later ones live
    (retention-aware compaction: time travel above the horizon
    survives).

    Crash-safe ordering: ``commit_partition`` lands the new base AND
    ``compacted_through=watermark`` atomically BEFORE any delta file is
    unlinked — a crash in between only leaves stale delta files, which
    every reader (``list_delta_files``) and the next compaction ignore.

    ``key_cols``/``final_columns`` default to the partition's OWN
    manifest metadata (every commit records its key columns), so
    compaction runs correctly on any lake — including non-repos
    namespaces — without a table config (the CLI ``compact`` mode).
    """
    from ..state.manifest import partition_lease

    with partition_lease(lake_dir, part):
        return _compact_partition_leased(
            lake_dir, part, key_cols=key_cols, final_columns=final_columns,
            final_types=final_types, retain_after=retain_after,
        )


def _compact_partition_leased(
    lake_dir: str,
    part: int,
    *,
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
    retain_after: Optional[int] = None,
) -> dict:
    import glob
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import (
        commit_partition as _commit,
        delta_watermark_of,
        list_delta_files,
        partition_dir,
        read_manifest,
    )

    from ..state.manifest import commit_base_rewrite

    manifest = read_manifest(lake_dir, part) or {}
    keys = key_cols or manifest.get("key_cols") or KEY_COLS
    compacted_through = int(manifest.get("compacted_through", -1))
    all_deltas = sorted(glob.glob(os.path.join(partition_dir(lake_dir, part), "delta-*.parquet")))
    live = list_delta_files(lake_dir, part, compacted_through)
    stale = [f for f in all_deltas if f not in set(live)]
    # retention horizon: fold only deltas at or below it; later commit
    # windows stay live so time travel above the horizon survives
    if retain_after is not None:
        fold_files = [f for f in live if delta_watermark_of(f) <= retain_after]
        keep_files = [f for f in live if delta_watermark_of(f) > retain_after]
    else:
        fold_files, keep_files = live, []
    if not fold_files:
        for f in stale:  # lazy cleanup of a crashed earlier compaction
            try:
                os.unlink(f)
            except OSError:
                pass
        return {
            "part": part,
            "rows": int(manifest.get("rows", -1)),
            "watermark": int(manifest.get("watermark", -1)),
            "skipped": True,
            "retained": len(keep_files),
        }

    base_files = [
        f
        for f in sorted(glob.glob(os.path.join(partition_dir(lake_dir, part), "*.parquet")))
        if not os.path.basename(f).startswith("delta-")
    ]
    base = (
        pa.concat_tables([pq.read_table(f) for f in base_files], promote_options="permissive")
        if base_files
        else None
    )
    changes = pa.concat_tables([pq.read_table(f) for f in fold_files], promote_options="permissive")
    final = _finalize_arrow(lww_fold_arrow(base, changes, keys), final_columns, final_types)
    final = final.take(pc.sort_indices(final, sort_keys=[(k, "ascending") for k in keys]))
    watermark = max(
        int(manifest.get("watermark", -1)), max(delta_watermark_of(f) for f in live)
    )
    if keep_files:
        # partial (retention-aware) compaction: base absorbs the folded
        # prefix, manifest stays a delta commit (sha sealed at the next
        # FULL compaction), compacted_through advances only to the last
        # folded window so asof/changelog above it keep working
        new_ct = max(delta_watermark_of(f) for f in fold_files)
        out = commit_base_rewrite(
            lake_dir, part, final, watermark, new_ct, len(keep_files), key_cols=keys
        )
        for f in fold_files + stale:
            try:
                os.unlink(f)
            except OSError:
                pass
        return {
            "part": part,
            "rows": final.num_rows,
            "watermark": out["watermark"],
            "skipped": False,
            "retained": len(keep_files),
        }
    out = _commit(lake_dir, part, final, watermark, _state_sha(final), key_cols=keys)
    for f in live + stale:
        try:
            os.unlink(f)
        except OSError:
            pass
    return {"part": part, "rows": out["rows"], "watermark": out["watermark"], "skipped": False, "retained": 0}


def compact_parts(
    batch: pa.Table,
    lake_dir: str = "",
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
    retain_after: Optional[int] = None,
) -> pa.Table:
    """map_batches body for the distributed compaction job: one
    ``compact_partition`` per input row {"part"}."""
    rows = [
        compact_partition(
            lake_dir, int(p), key_cols=key_cols, final_columns=final_columns,
            final_types=final_types, retain_after=retain_after,
        )
        for p in batch["part"].to_pylist()
    ]
    return pa.table(
        {
            "part": pa.array([r["part"] for r in rows], pa.int32()),
            "rows": pa.array([r["rows"] for r in rows], pa.int64()),
            "watermark": pa.array([r["watermark"] for r in rows], pa.int64()),
            "skipped": pa.array([r["skipped"] for r in rows], pa.bool_()),
            "retained": pa.array([r.get("retained", 0) for r in rows], pa.int64()),
        }
    )


def verify_parts(batch: pa.Table, lake_dir: str = "") -> pa.Table:
    """Lineage-integrity audit body: recompute each partition's state
    digest (and row count) from its on-disk base and compare against
    the committed manifest — bit rot, a torn write, or out-of-band
    edits all surface as a mismatch. Partitions whose manifest is a
    delta commit (state_sha == "", rows == -1) are reported as
    ``unverifiable`` until the next compaction folds them."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import partition_dir, read_manifest

    parts, oks, reasons = [], [], []
    for p in batch["part"].to_pylist():
        p = int(p)
        manifest = read_manifest(lake_dir, p)
        parts.append(p)
        if manifest is None:
            oks.append(False)
            reasons.append("missing manifest")
            continue
        if not manifest.get("state_sha256"):
            oks.append(True)
            reasons.append("unverifiable (delta commit; compact to seal)")
            continue
        base_files = [
            f
            for f in sorted(glob.glob(os.path.join(partition_dir(lake_dir, p), "*.parquet")))
            if not os.path.basename(f).startswith("delta-")
        ]
        if not base_files:
            oks.append(False)
            reasons.append("manifest present but no base data file")
            continue
        t = pa.concat_tables([pq.read_table(f) for f in base_files], promote_options="permissive")
        if t.num_rows != manifest["rows"]:
            oks.append(False)
            reasons.append(f"rows {t.num_rows} != manifest {manifest['rows']}")
            continue
        got = _state_sha(t)
        if got != manifest["state_sha256"]:
            oks.append(False)
            reasons.append("state sha mismatch")
            continue
        # the manifest chain hashes the content_sha256 column — also
        # re-derive that column from the content itself, or a content
        # edit that leaves the sha column intact would slip through
        if "content" in t.column_names and "content_sha256" in t.column_names:
            want = sha256_hex(t["content"].to_pylist())
            have = t["content_sha256"].to_pylist()
            n_bad = sum(1 for w, h in zip(want, have) if w != h)
            if n_bad:
                oks.append(False)
                reasons.append(f"content/sha binding violated on {n_bad} rows")
                continue
        oks.append(True)
        reasons.append("ok")
    return pa.table(
        {
            "part": pa.array(parts, pa.int32()),
            "ok": pa.array(oks, pa.bool_()),
            "detail": pa.array(reasons, pa.string()),
        }
    )


def read_state_parts(
    batch: pa.Table,
    lake_dir: str = "",
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
) -> pa.Table:
    """Fold-on-read map_batches body: each input row {"part"} yields
    that partition's FINAL state (base + live deltas folded) — the
    correct way to read a delta-mode lake without compacting it."""
    inner = ApplyPartitionArrow(
        lake_dir=lake_dir, key_cols=key_cols, final_columns=final_columns, final_types=final_types
    )
    outs = []
    for p in batch["part"].to_pylist():
        t = inner._read_base(int(p))
        if t is None or not t.num_rows:
            continue
        outs.append(_finalize_arrow(t, final_columns, final_types))
    if not outs:
        types = final_types or {}
        return pa.table(
            {c: pa.array([], types.get(c, pa.string())) for c in (final_columns or ["part"])}
        )
    return pa.concat_tables(outs, promote_options="permissive")


class SnapshotUnavailable(Exception):
    """The requested point-in-time watermark predates this partition's
    compaction horizon — the delta history needed to reconstruct it has
    been folded into the base and unlinked (retention limit)."""


def read_asof_parts(
    batch: pa.Table,
    lake_dir: str = "",
    watermark: int = 0,
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
) -> pa.Table:
    """Point-in-time (time-travel) fold: each input row {"part"} yields
    that partition's state AS OF ``watermark`` — base + delta rows with
    ``ordinal <= watermark`` folded LWW, finalized like a normal read.

    Exactness contract: a snapshot at any delta-commit boundary is
    exact (every retained change at or below it is present, every later
    one excluded). Inside a straddling delta window the per-window LWW
    reduce has already collapsed per-key history, so mid-window
    watermarks are exact only when each key changes at most once per
    window — commit windows aligned with transaction boundaries give
    that for free. Reads below a partition's ``compacted_through``
    raise :class:`SnapshotUnavailable` (the history is gone — the
    retention limit every delta lake has).

    Scale: one task per partition; the per-file ``ordinal`` filter is a
    parquet row-group predicate, so delta files entirely above the
    watermark are skipped from their footer stats alone.
    """
    import glob
    import os as _os

    import pyarrow.parquet as pq

    from ..state.manifest import list_delta_files, partition_dir, read_manifest

    outs = []
    for p in batch["part"].to_pylist():
        p = int(p)
        manifest = read_manifest(lake_dir, p)
        compacted_through = int((manifest or {}).get("compacted_through", -1))
        if compacted_through > watermark:
            raise SnapshotUnavailable(
                f"part={p}: asof watermark {watermark} < compacted_through "
                f"{compacted_through}; the delta history below the compaction "
                f"horizon is gone"
            )
        files = sorted(glob.glob(partition_dir(lake_dir, p) + "/*.parquet"))
        base_files = [f for f in files if not _os.path.basename(f).startswith("delta-")]
        t = (
            pa.concat_tables([pq.read_table(f) for f in base_files], promote_options="permissive")
            if base_files
            else None
        )
        deltas = list_delta_files(lake_dir, p, compacted_through)
        if deltas:
            dt = pa.concat_tables(
                [pq.read_table(f, filters=[("ordinal", "<=", watermark)]) for f in deltas],
                promote_options="permissive",
            )
            if dt.num_rows:
                t = lww_fold_arrow(t, dt, key_cols)
        if t is None or not t.num_rows:
            continue
        outs.append(_finalize_arrow(t, final_columns, final_types))
    if not outs:
        types = final_types or {}
        return pa.table(
            {c: pa.array([], types.get(c, pa.string())) for c in (final_columns or ["part"])}
        )
    return pa.concat_tables(outs, promote_options="permissive")


def read_changelog_parts(
    batch: pa.Table,
    lake_dir: str = "",
    lo: int = -1,
    hi: Optional[int] = None,
) -> pa.Table:
    """CDC-out: each input row {"part"} yields that partition's retained
    change rows with ``lo < ordinal <= hi`` from the live delta history
    — keys, dml, ordinal and payload columns exactly as committed, so a
    downstream consumer can re-apply or audit the window. Rows are the
    per-window LWW-reduced survivors (same exactness contract as
    :func:`read_asof_parts`: windows aligned with transaction
    boundaries retain every change). Raises
    :class:`SnapshotUnavailable` when ``lo`` predates the compaction
    horizon."""
    import pyarrow.parquet as pq

    from ..state.manifest import list_delta_files, read_manifest

    filters = [("ordinal", ">", lo)]
    if hi is not None:
        filters.append(("ordinal", "<=", hi))
    outs = []
    for p in batch["part"].to_pylist():
        p = int(p)
        manifest = read_manifest(lake_dir, p)
        compacted_through = int((manifest or {}).get("compacted_through", -1))
        if compacted_through > lo:
            raise SnapshotUnavailable(
                f"part={p}: changelog lower bound {lo} < compacted_through "
                f"{compacted_through}; changes at or below the compaction "
                f"horizon are folded away"
            )
        for f in list_delta_files(lake_dir, p, compacted_through):
            t = pq.read_table(f, filters=filters)
            if t.num_rows:
                outs.append(t)
    # generator contract: a partition slice with no changes in the
    # window yields NOTHING (never a schema-less placeholder block —
    # zero-column bundles break downstream schema unification)
    if outs:
        yield pa.concat_tables(outs, promote_options="permissive")


class ApplyStagedPartition:
    """Reduce side of the staged exchange: one call per batch of
    partition ids; reads that partition's staged change files from the
    shared staging dir and runs the identical Arrow LWW fold + atomic
    manifest commit as the groupby path (equality pinned by tests).

    Input rows: {"part": int32}. Output: one summary row per part.
    """

    def __init__(
        self,
        staging_dir: str,
        lake_dir: Optional[str] = None,
        write: bool = False,
        final_columns: Optional[list[str]] = None,
        final_types: Optional[dict] = None,
        key_cols: Optional[list[str]] = None,
        sink_mode: str = "rewrite",
        compact_every: Optional[int] = None,
    ):
        self.staging_dir = staging_dir
        self.inner = ApplyPartitionArrow(
            lake_dir=lake_dir,
            write=write,
            final_columns=final_columns,
            final_types=final_types,
            key_cols=key_cols,
            sink_mode=sink_mode,
            compact_every=compact_every,
        )

    def _read_staged(self, part: int) -> Optional[pa.Table]:
        import glob
        import os

        import pyarrow.feather as feather
        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(self.staging_dir, f"part={part}", "*.ipc"))) + sorted(
            glob.glob(os.path.join(self.staging_dir, f"part={part}", "*.parquet"))
        )
        if not files:
            return None
        return pa.concat_tables(
            [
                feather.read_table(f, memory_map=True) if f.endswith(".ipc") else pq.read_table(f)
                for f in files
            ],
            promote_options="permissive",
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part in batch["part"].to_pylist():
            changes = self._read_staged(int(part))
            if changes is None or changes.num_rows == 0:
                continue
            outs.append(self.inner(changes))
        if not outs:
            return self.inner._summary(-1, 0, -1, True).slice(0, 0)
        return pa.concat_tables(outs, promote_options="permissive")


def apply_partition_group_arrow(
    group: pa.Table,
    lake_dir: Optional[str] = None,
    write: bool = False,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
    sink_mode: str = "rewrite",
    compact_every: Optional[int] = None,
) -> pa.Table:
    return ApplyPartitionArrow(
        lake_dir=lake_dir,
        write=write,
        final_columns=final_columns,
        final_types=final_types,
        sink_mode=sink_mode,
        compact_every=compact_every,
    )(group)


def apply_staged_parts_multi(
    batch: pa.Table,
    staging_root: str = "",
    lake_root: str = "",
    table_cfgs: Optional[dict] = None,
    write: bool = True,
    sink_mode: str = "rewrite",
) -> pa.Table:
    """Reduce side of the MULTI-table staged exchange. Input rows:
    ``(table_ns, part)``; each row's staged change files live under
    ``staging_root/<table_ns>/part=P/`` and apply into the namespaced
    lake ``lake_root/<table_ns>/`` with that table's own key columns,
    final schema, and per-partition manifest (so exactly-once
    watermarks are independent per table). Output: one summary row per
    (table_ns, part)."""
    import os

    outs = []
    empty = None
    for ns, part in zip(batch["table_ns"].to_pylist(), batch["part"].to_pylist()):
        cfg = table_cfgs[ns]
        stage = ApplyStagedPartition(
            os.path.join(staging_root, ns),
            lake_dir=os.path.join(lake_root, ns),
            write=write,
            final_columns=cfg.get("final_columns"),
            final_types=cfg.get("types"),
            key_cols=cfg.get("keys"),
            sink_mode=sink_mode,
        )
        empty = stage.inner._summary(-1, 0, -1, True).slice(0, 0)
        changes = stage._read_staged(int(part))
        if changes is None or changes.num_rows == 0:
            continue
        s = stage.inner(changes)
        outs.append(s.add_column(0, "table_ns", pa.array([ns] * len(s), pa.string())))
    if not outs:
        if empty is None:
            empty = ApplyPartitionArrow()._summary(-1, 0, -1, True).slice(0, 0)
        return empty.add_column(0, "table_ns", pa.array([], pa.string()))
    return pa.concat_tables(outs, promote_options="permissive")


def apply_staged_parts(
    batch: pa.Table,
    staging_dir: str = "",
    lake_dir: Optional[str] = None,
    write: bool = False,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
    sink_mode: str = "rewrite",
    compact_every: Optional[int] = None,
) -> pa.Table:
    """Function form for stateless-task scheduling (construction is a
    couple of attribute assignments; tasks interleave with decode)."""
    return ApplyStagedPartition(
        staging_dir,
        lake_dir=lake_dir,
        write=write,
        final_columns=final_columns,
        final_types=final_types,
        sink_mode=sink_mode,
        compact_every=compact_every,
    )(batch)
