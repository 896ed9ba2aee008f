"""Relational operators the reference lacks, built Ray-Data-first.

- broadcast join: small side shipped once via ``ray.put``, probed per
  batch with a pandas merge — no shuffle of the big side.
- partitioned hash join: both sides large → add ``bucket = hash(key) %
  B`` to each, union with a side tag, ``groupby(bucket)`` co-locates
  matching keys, join inside ``map_groups``. One shuffle, B-way
  parallel.
- as-of join: lives in ``api.asof_last_event_per_order`` — coarse key
  partitions + one lexsort + a running-maximum scan over the unioned
  sides (Arrow/numpy; no pandas ``merge_asof``).
- windowed aggregates / sessionization over an ordered event log:
  ``groupby(key).map_groups`` with the window logic over the sorted
  group (Ray Data has no event-time watermarks; the ordering
  assumption is: all events for a key fit one group, sorted here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_bucket(values, num_buckets: int) -> np.ndarray:
    """Value-stable bucket id from a column of any dtype — vectorized
    (one canonical Arrow cast, then one ``hash_array`` call).

    The key is canonicalized BEFORE hashing so two join sides bucket
    identically even when their physical types differ: any integer /
    boolean / temporal key casts to int64, floats to float64, and
    everything else (strings, decimals, binary) to string — so int32 −1
    and int64 −1, or an int column that picked up nulls (whose plain
    ``to_numpy`` would degrade to float64/NaN), land in the same
    bucket. Nulls hash as a fixed sentinel (they never match in a join,
    the bucket just has to be deterministic)."""
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        arr = np.asarray(values)
        if arr.dtype.kind in "iub" and not pd.isna(arr).any():
            np_vals = arr.astype(np.int64, copy=False)
            return (pd.util.hash_array(np_vals, categorize=False) % num_buckets).astype(np.int32)
        values = pa.array(values)
    t = values.type
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        np_vals = pc.fill_null(pc.cast(values, pa.int64()), 0).to_numpy(zero_copy_only=False)
    elif pa.types.is_floating(t):
        np_vals = pc.cast(values, pa.float64()).to_numpy(zero_copy_only=False)
    elif pa.types.is_temporal(t):
        # date/timestamp canonicalize through timestamp[us] → int64;
        # the odd ones (time32/time64/duration) go through string below
        try:
            as_ts = pc.cast(values, pa.timestamp("us"), safe=False)
            np_vals = pc.fill_null(pc.cast(as_ts, pa.int64()), 0).to_numpy(zero_copy_only=False)
        except pa.ArrowNotImplementedError:
            np_vals = pc.fill_null(pc.cast(values, pa.string()), "").to_numpy(zero_copy_only=False)
    else:
        np_vals = pc.fill_null(pc.cast(values, pa.string()), "").to_numpy(zero_copy_only=False)
    return (pd.util.hash_array(np_vals, categorize=False) % num_buckets).astype(np.int32)


class BroadcastJoiner:
    """map_batches stage: join the batch against a broadcast table.

    ``small_ref`` is a ``ray.ObjectRef`` (put once on the driver) to the
    small side — a pandas DataFrame or pyarrow Table; resolved once per
    actor in ``__init__``. Works in both batch formats; keep the stage
    ``batch_format="pyarrow"`` where possible — pandas OUTPUT blocks
    poison any downstream sort/aggregate (Ray's sort-based aggregate
    over object-dtype pandas blocks measured ~10x slower than over the
    same rows as Arrow blocks)."""

    def __init__(self, small_ref, on: str, how: str = "inner"):
        try:
            import ray

            if isinstance(small_ref, ray.ObjectRef):
                small_ref = ray.get(small_ref)
        except Exception:
            pass
        # keep ONE canonical copy; convert lazily per batch format so an
        # arrow-only (or pandas-only) pipeline never holds both copies
        self._small = small_ref
        self._small_arrow: pa.Table | None = small_ref if isinstance(small_ref, pa.Table) else None
        self._small_pandas: pd.DataFrame | None = (
            small_ref if isinstance(small_ref, pd.DataFrame) else None
        )
        self.on = on
        self.how = how

    @property
    def small_arrow(self) -> pa.Table:
        if self._small_arrow is None:
            self._small_arrow = pa.Table.from_pandas(self._small, preserve_index=False)
        return self._small_arrow

    @property
    def small_pandas(self) -> pd.DataFrame:
        if self._small_pandas is None:
            self._small_pandas = self._small.to_pandas()
        return self._small_pandas

    def __call__(self, batch):
        if isinstance(batch, pa.Table):
            how = {"inner": "inner", "left": "left outer"}.get(self.how, self.how)
            return batch.join(self.small_arrow, keys=self.on, join_type=how)
        return batch.merge(self.small_pandas, on=self.on, how=self.how)


def tag_and_bucket(batch: pa.Table, side: str, key: str, num_buckets: int) -> pa.Table:
    """Prepare one side of a partitioned hash join."""
    b = hash_bucket(batch[key], num_buckets)
    out = batch.append_column("bucket", pa.array(b, pa.int32()))
    return out.append_column("side", pa.array([side] * len(b), pa.string()))


def bucket_join_groups(
    group: pa.Table,
    key: str,
    left_side: str = "l",
    right_side: str = "r",
    suffixes=("_l", "_r"),
) -> pa.Table:
    """One bucket group (both sides unioned) → inner-joined rows.

    Arrow end to end: each side's padding columns (all-null by
    construction) are dropped, then the join is an in-partition Acero
    hash join (``pa.Table.join``) — no pandas round-trip, so int64
    never leaks to float64 (the round-1 ``order_priority_revenue``
    hash mismatch) and no padded-null dtype repair is needed.
    """
    import pyarrow.compute as pc

    mask = pc.equal(group["side"], left_side)
    left_t = group.filter(mask).drop_columns(["side", "bucket"])
    right_t = group.filter(pc.invert(mask)).drop_columns(["side", "bucket"])
    if not len(left_t) or not len(right_t):
        # inner join with an empty side: no rows; schema = key + both
        # sides' non-key columns (padding unknown here, so just the key —
        # callers aggregate the output, and Ray drops empty blocks).
        return pa.table({key: pa.array([], group.schema.field(key).type)})
    left_t = left_t.drop_columns(
        [c for c in left_t.column_names if c != key and left_t[c].null_count == len(left_t)]
    )
    right_t = right_t.drop_columns(
        [c for c in right_t.column_names if c != key and right_t[c].null_count == len(right_t)]
    )
    return left_t.join(
        right_t.combine_chunks(),
        keys=key,
        join_type="inner",
        left_suffix=suffixes[0],
        right_suffix=suffixes[1],
    )


def bucket_lookup_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    value_col: str,
    out_col: str,
    value_type: pa.DataType,
    num_buckets: int = 16,
):
    """Attach ``right[value_col]`` to every left row matching on key —
    a bucketed hash join built from groupby (one shuffle, B-way
    parallel). Exists because Ray's native ``Dataset.join`` (Acero
    underneath) rejects list-typed non-key columns, which is exactly
    what the dedup verify needs to carry (gram-hash sets). Inner join:
    left rows without a match are dropped.
    """
    import pyarrow.compute as pc

    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))

    def prep_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_names}
        cols[out_col] = pa.nulls(len(t), value_type)
        out = pa.table(cols)
        b = hash_bucket(t[left_key], num_buckets)
        return out.append_column("bucket", pa.array(b, pa.int32())).append_column(
            "side", pa.array(np.zeros(len(t), dtype=np.int8))
        )

    def prep_right(t: pa.Table) -> pa.Table:
        key_cast = pc.cast(t[right_key], left_types[left_key])
        cols = {}
        for name in left_names:
            if name == left_key:
                cols[name] = key_cast
            else:
                cols[name] = pa.nulls(len(t), left_types[name])
        cols[out_col] = pc.cast(t[value_col], value_type)
        out = pa.table(cols)
        # hash the CASTED key so both sides bucket identically
        b = hash_bucket(key_cast, num_buckets)
        return out.append_column("bucket", pa.array(b, pa.int32())).append_column(
            "side", pa.array(np.ones(len(t), dtype=np.int8))
        )

    def join_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        rkeys = rt[left_key]
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        # vectorized probe: position of each left key in the right side
        # (first match wins — right keys are unique per the lookup
        # contract), then one take() of the value column, which handles
        # list-typed values (Acero can't) without any Python loop.
        pos = pc.index_in(lt[left_key], value_set=rkeys)
        keep = pos.is_valid()
        lt = lt.filter(keep)
        pos = pc.filter(pos, keep)
        vals = rt[out_col].take(pos)
        out = lt.drop_columns(["bucket", "side", out_col])
        return out.append_column(out_col, pc.cast(vals, value_type))

    both = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )
    return both.groupby("bucket").map_groups(join_group, batch_format="pyarrow")


def tumbling_window_agg(
    group: pd.DataFrame,
    time_col: str,
    window_sec: int,
    value_col: str,
    key_col: str,
) -> pd.DataFrame:
    """Per-key tumbling windows over the sorted group: count + sum."""
    g = group.sort_values(time_col, kind="stable")
    epoch = g[time_col].astype("int64") // 1_000_000  # us → s
    win = (epoch // window_sec) * window_sec
    agg = g.assign(window_start=win).groupby("window_start", sort=True).agg(
        n_events=(value_col, "size"), total_value=(value_col, "sum")
    )
    agg = agg.reset_index()
    agg.insert(0, key_col, g[key_col].iloc[0])
    return agg


_SESSIONS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_start", pa.int64()),
        ("session_end", pa.int64()),
        ("n_events", pa.int64()),
        ("duration_sec", pa.int64()),
    ]
)


def sessions_scan(uid: np.ndarray, epoch_sec: np.ndarray, gap_sec: int) -> pa.Table:
    """Vectorized sessionization over MANY users at once: lexsort by
    (user, time), find session boundaries (user change OR gap >
    gap_sec) with one diff pass, and emit one row per session via
    boundary indexing — no per-user loop, no per-key shuffle. The
    caller partitions by hash(user) so every user's events land in one
    call (the same coarse-partition contract as functions/agg.py)."""
    if len(uid) == 0:
        return _SESSIONS_SCHEMA.empty_table()
    uid = np.asarray(uid, dtype=np.int64)
    epoch = np.asarray(epoch_sec, dtype=np.int64)
    order = np.lexsort((epoch, uid))
    uid, epoch = uid[order], epoch[order]
    new_s = np.empty(len(uid), dtype=bool)
    new_s[0] = True
    new_s[1:] = (uid[1:] != uid[:-1]) | (epoch[1:] - epoch[:-1] > gap_sec)
    starts = np.flatnonzero(new_s)
    ends = np.r_[starts[1:], len(uid)]
    s0, s1 = epoch[starts], epoch[ends - 1]
    return pa.table(
        {
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_start": pa.array(s0, pa.int64()),
            "session_end": pa.array(s1, pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "duration_sec": pa.array(s1 - s0, pa.int64()),
        }
    )


def sessionize_group(
    group: pd.DataFrame,
    time_col: str,
    gap_sec: int,
    key_col: str,
) -> pd.DataFrame:
    """Per-key sessions: a new session starts when the gap to the
    previous event exceeds ``gap_sec``. Emits one row per session."""
    g = group.sort_values(time_col, kind="stable")
    epoch = g[time_col].astype("int64") // 1_000_000
    new_session = (epoch.diff().fillna(gap_sec + 1) > gap_sec).astype("int64")
    session_id = new_session.cumsum()
    out = g.assign(_sid=session_id.values, _epoch=epoch.values).groupby("_sid").agg(
        session_start=("_epoch", "min"),
        session_end=("_epoch", "max"),
        n_events=(time_col, "size"),
    )
    out = out.reset_index(drop=True)
    out.insert(0, key_col, g[key_col].iloc[0])
    out["duration_sec"] = out["session_end"] - out["session_start"]
    return out
