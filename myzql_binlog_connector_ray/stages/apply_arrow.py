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

from ..state.manifest import commit_partition, read_manifest
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
    ):
        self.lake_dir = lake_dir
        self.write = write
        self.final_columns = final_columns
        self.final_types = final_types
        self.key_cols = key_cols or KEY_COLS

    def _read_base(self, part: int) -> Optional[pa.Table]:
        if self.lake_dir is None:
            return None
        import glob

        import pyarrow.parquet as pq

        from ..state.manifest import partition_dir

        files = sorted(glob.glob(partition_dir(self.lake_dir, part) + "/*.parquet"))
        if not files:
            return None
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")

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

        if self.write:
            manifest = read_manifest(self.lake_dir, part)
            if manifest is not None:
                if manifest["watermark"] >= watermark:
                    return self._summary(part, manifest["rows"], manifest["watermark"], True)
                group = group.filter(pc.greater(group["ordinal"], manifest["watermark"]))
                if group.num_rows == 0:
                    return self._summary(part, manifest["rows"], manifest["watermark"], True)

        base = self._read_base(part)
        final = _finalize_arrow(
            lww_fold_arrow(base, group, self.key_cols), self.final_columns, self.final_types
        )

        if not self.write:
            return final

        final = final.take(
            pc.sort_indices(final, sort_keys=[(k, "ascending") for k in self.key_cols])
        )
        if "content_sha256" in final.column_names:
            sha_col = pc.fill_null(final["content_sha256"], "").to_pylist()
            state_sha = hashlib.sha256("\n".join(sha_col).encode()).hexdigest()
        else:
            # content-free table: deterministic vectorized state digest
            # over every column's value hash (fixed-key siphash)
            import numpy as np
            import pandas as pd

            h = np.zeros(final.num_rows, dtype=np.uint64)
            for c in final.column_names:
                col = final[c].to_numpy(zero_copy_only=False)
                h = h * np.uint64(1000003) + pd.util.hash_array(col, categorize=False)
            state_sha = hashlib.sha256(h.tobytes()).hexdigest()
        manifest = commit_partition(self.lake_dir, part, final, watermark, state_sha)
        return self._summary(part, manifest["rows"], manifest["watermark"], False)


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
    ):
        self.staging_dir = staging_dir
        self.inner = ApplyPartitionArrow(
            lake_dir=lake_dir,
            write=write,
            final_columns=final_columns,
            final_types=final_types,
            key_cols=key_cols,
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
) -> pa.Table:
    return ApplyPartitionArrow(
        lake_dir=lake_dir, write=write, final_columns=final_columns, final_types=final_types
    )(group)


def apply_staged_parts_multi(
    batch: pa.Table,
    staging_root: str = "",
    lake_root: str = "",
    table_cfgs: Optional[dict] = None,
    write: bool = True,
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
) -> pa.Table:
    """Function form for stateless-task scheduling (construction is a
    couple of attribute assignments; tasks interleave with decode)."""
    return ApplyStagedPartition(
        staging_dir,
        lake_dir=lake_dir,
        write=write,
        final_columns=final_columns,
        final_types=final_types,
    )(batch)
