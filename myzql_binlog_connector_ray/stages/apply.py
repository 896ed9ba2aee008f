"""Key-partitioned last-writer-wins upsert apply.

The reference emits an ordered change log and never applies it; the
north rule adds the apply step. The central semantic transform of the
re-architecture (SURVEY.md §4.1 "ordering"): the reference gets total
order for free from its single TCP stream, while here order is
*reconstructed per key* — every change row carries
``(ordinal, event_row_index)`` and apply sorts within each
``(repo, path)`` group, so only a per-key sort (cheap, inside groups)
is needed, never a global sort.

Pipeline shape (the engine's only shuffle)::

    changes → map_batches(add_partition)          # hash(repo,path) % P
            → map_batches(lww_combine)            # per-batch pre-reduce: shuffle
                                                  #   only the latest change per key
            → groupby("part").map_groups(ApplyPartition)
                                                  # merge with the lake partition,
                                                  #   LWW fold, drop DELETEs

Skew note: partitioning by hash of the *(repo, path)* pair spreads a
hot repo across partitions (paths differ). A single hot key cannot be
split without breaking per-key ordering, but the lww_combine stage
collapses each key to ≤1 row per input block before the shuffle, so a
hot key contributes at most #blocks rows to the exchange — the salted
repartition degenerate case is already handled by the combiner.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import commit_partition, read_manifest

KEY_COLS = ["repo", "path"]
ORDER_COLS = ["ordinal", "event_row_index"]


def partition_of(repo_arr, path_arr, num_partitions: int) -> np.ndarray:
    """Deterministic partition id from (repo, path) — stable across processes.

    Accepts Arrow arrays (fast path: C-speed key join, no per-row
    Python string build) or plain Python sequences. pandas' siphash of
    a str equals the siphash of its utf-8 bytes, so both paths produce
    identical partition ids (pinned by test).
    """
    import pyarrow.compute as pc

    if isinstance(repo_arr, (pa.Array, pa.ChunkedArray)):
        joined = pc.binary_join_element_wise(
            pc.cast(repo_arr, pa.binary()), pc.cast(path_arr, pa.binary()), b"\x00"
        )
        keys = joined.to_numpy(zero_copy_only=False)
    else:
        keys = np.asarray([f"{r}\x00{p}" for r, p in zip(repo_arr, path_arr)], dtype=object)
    # categorize=False: with the default categorize=True, pandas hashes via a
    # Categorical and arrays containing duplicates come back with different
    # hashes than standalone values — which silently splits a key from its
    # lake partition. Value-based siphash (fixed key) is process-stable.
    return (pd.util.hash_array(keys, categorize=False) % num_partitions).astype(np.int32)


def add_partition(batch: pa.Table, num_partitions: int) -> pa.Table:
    """map_batches stage (stateless task): append part = hash(repo, path) % P."""
    part = partition_of(batch["repo"], batch["path"], num_partitions)
    return batch.append_column("part", pa.array(part, pa.int32()))


def partition_of_cols(table: pa.Table, key_cols: list[str], num_partitions: int) -> np.ndarray:
    """``partition_of`` generalized to any primary-key column list (the
    multi-table ingest path): every key column is cast to string then
    binary and joined with ``\\x00``. For the ``(repo, path)`` string
    pair this is byte-identical to ``partition_of`` (string→string cast
    is a no-op), so repos lakes built by either path interoperate."""
    import pyarrow.compute as pc

    arrs = [pc.cast(pc.cast(table[k], pa.string()), pa.binary()) for k in key_cols]
    joined = arrs[0] if len(arrs) == 1 else pc.binary_join_element_wise(*arrs, b"\x00")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    keys = joined.to_numpy(zero_copy_only=False)
    return (pd.util.hash_array(keys, categorize=False) % num_partitions).astype(np.int32)


def lww_combine(batch: pa.Table, key_cols: Optional[list[str]] = None) -> pa.Table:
    """Per-batch combiner: keep only the latest change per key
    (default ``(repo, path)``).

    Associative pre-reduce of the LWW fold — run before the groupby so
    the all-to-all exchange ships at most one row per key per block.
    Pure pyarrow (sort over the two int order columns + hash group_by
    'last'): the wide ``content`` strings never round-trip through
    pandas object arrays.
    """
    import pyarrow.compute as pc

    from .apply_arrow import _last_per_key

    ordered = batch.take(
        pc.sort_indices(batch, sort_keys=[(c, "ascending") for c in ORDER_COLS])
    )
    return _last_per_key(ordered.combine_chunks(), key_cols=key_cols).select(batch.column_names)


def sha256_hex(values) -> list[str]:
    return [hashlib.sha256(v.encode("utf-8")).hexdigest() if isinstance(v, str) else None for v in values]


def _lww_fold(base: Optional[pd.DataFrame], changes: pd.DataFrame) -> pd.DataFrame:
    """Merge base partition rows with change rows; last writer (by
    ordinal, event_row_index) wins; DELETE drops the key.

    Sorts touch only the int order columns: changes reduce to one row
    per key (sort by ordinal → hash-dedup keep last), then base rows
    are concatenated *first* so a second keep-last dedup lets any
    change row supersede its base row. No string-key sort anywhere.
    """
    changes = changes.sort_values(ORDER_COLS, kind="stable").drop_duplicates(KEY_COLS, keep="last")
    if base is not None and len(base):
        base = base.copy()
        base["ordinal"] = -1
        base["event_row_index"] = -1
        base["dml"] = "BASE"
        # schema evolution: unify columns (new columns → NA on old rows)
        merged = pd.concat([base, changes], ignore_index=True, sort=False)
        merged = merged.drop_duplicates(KEY_COLS, keep="last")
    else:
        merged = changes
    merged = merged[merged["dml"] != "DELETE"]
    return merged


class ApplyPartition:
    """map_groups stage: one hash partition → final upserted state.

    With ``lake_dir`` set and ``write=True`` this is the transactional
    sink: it merges into the on-disk partition, commits atomically with
    a watermark manifest, and emits a one-row summary. With
    ``write=False`` it returns the full final partition rows (used by
    the SQL-checked queries).
    """

    def __init__(
        self,
        lake_dir: Optional[str] = None,
        write: bool = False,
        final_columns: Optional[list[str]] = None,
    ):
        self.lake_dir = lake_dir
        self.write = write
        self.final_columns = final_columns

    def _read_base(self, part: int) -> Optional[pd.DataFrame]:
        if self.lake_dir is None:
            return None
        import glob

        import pyarrow.parquet as pq

        from ..state.manifest import partition_dir

        files = sorted(glob.glob(partition_dir(self.lake_dir, part) + "/*.parquet"))
        if not files:
            return None
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive").to_pandas()

    def _finalize(self, df: pd.DataFrame) -> pd.DataFrame:
        drop = [c for c in ("ordinal", "event_row_index", "dml", "segment", "part") if c in df.columns]
        out = df.drop(columns=drop)
        # hash only rows that don't already carry a sha (base lake rows do;
        # at scale most of a partition is unchanged — never re-hash it)
        if "content_sha256" in out.columns:
            need = out["content_sha256"].isna()
            if need.any():
                out.loc[need, "content_sha256"] = sha256_hex(out.loc[need, "content"].tolist())
        else:
            out["content_sha256"] = sha256_hex(out["content"].tolist())
        if self.final_columns:
            for c in self.final_columns:
                if c not in out.columns:
                    out[c] = pd.NA
            out = out[self.final_columns]
        return out

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["part"].iloc[0])
        watermark = int(group["ordinal"].max())

        if self.write:
            manifest = read_manifest(self.lake_dir, part)
            if manifest is not None:
                if manifest["watermark"] >= watermark:
                    # exactly-once: this partition already covers the range
                    return pd.DataFrame(
                        [{"part": part, "rows": manifest["rows"], "watermark": manifest["watermark"], "skipped": True}]
                    )
                # drop already-applied changes so replay cannot resurrect deletes
                group = group[group["ordinal"] > manifest["watermark"]]
                if not len(group):
                    return pd.DataFrame(
                        [{"part": part, "rows": manifest["rows"], "watermark": manifest["watermark"], "skipped": True}]
                    )

        base = self._read_base(part)
        final = self._finalize(_lww_fold(base, group))

        if not self.write:
            return final

        final = final.sort_values(KEY_COLS, kind="stable")
        state_sha = hashlib.sha256(
            "\n".join(final["content_sha256"].fillna("").tolist()).encode()
        ).hexdigest()
        table = pa.Table.from_pandas(final, preserve_index=False)
        manifest = commit_partition(self.lake_dir, part, table, watermark, state_sha)
        return pd.DataFrame(
            [{"part": part, "rows": manifest["rows"], "watermark": manifest["watermark"], "skipped": False}]
        )


def apply_partition_group(
    group: pd.DataFrame,
    lake_dir: Optional[str] = None,
    write: bool = False,
    final_columns: Optional[list[str]] = None,
) -> pd.DataFrame:
    """Function form for ``groupby(...).map_groups`` (needs a __name__);
    ApplyPartition holds no cross-group state so per-group construction
    is free."""
    return ApplyPartition(lake_dir=lake_dir, write=write, final_columns=final_columns)(group)
