"""Pipelined streaming ingest: segments stage the moment they close.

The batch pipeline (``pipelines.ingest.run_ingest``) is one Dataset job
per wave — correct, but a live tail that closes segments every few
hundred ms pays the per-job floor (executor spin-up + two ``take_all``
barriers) 16× per stream, which is why round-4's streaming bench
measured 102 k ev/s against 565–612 k batch.

This module keeps the SAME decode and apply bodies (SegmentDecoder's
staged exchange, ApplyPartitionArrow's leased exactly-once commit) but
drives them as raw Ray tasks, which is the one place the Dataset API
genuinely can't express the semantics: a continuously-arriving input
whose unit of work (a closed segment) must start the moment it exists,
overlapped with the apply of earlier segments.

Shape:

- ``submit(segment_path)`` — immediately launches a decode+stage task
  (one per segment, staged into its own ``seg-<name>/part=P`` dir).
  Decode overlaps the tail AND the apply of earlier segments.
- per-partition apply windows — each ``(table_ns, part)`` advances
  through its own staged windows independently: whenever a partition
  has pending staged segments and a task slot is free, its pending
  window (every staged-but-unapplied segment, in submission order)
  applies as one leased exactly-once commit. A straggler partition
  (hot key, skew, slow node) never stalls the other partitions'
  applies — the property a global wave barrier would lose at cluster
  scale. At most one apply per partition is in flight, so each
  partition's windows commit in stream order.
- ``drain()`` — blocks until everything staged + applied; optional
  compaction folds the delta history to read-optimal form (each
  partition's final apply runs in rewrite mode where possible).

Correctness invariant (same as the batch path): an apply over
partition P at watermark W must include every staged change with
ordinal ≤ W for P — guaranteed per partition: P's windows launch in
submission order (= stream order = ordinal order), covering every
staged segment that contains P, and never overlap in flight.

At multi-node scale the staging dirs live on shared storage; the
tailer is one lightweight process per MySQL server and stage/apply
tasks schedule anywhere (reference's analogue is the single-threaded
reader loop, src/binlog_reader.zig:149-305 — this is the same contract
with the cluster doing the heavy part).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Optional

import pyarrow as pa
import ray

from ..fixtures.change_stream import SCHEMA_REGISTRY
from .ingest import FINAL_COLUMNS, REPOS_TYPED_TYPES


@ray.remote
def _warmup_task() -> bool:
    """Pre-import the decode/apply modules on an idle worker so the
    first real stage task doesn't pay the cold-import cost serially
    after the tail ends (a long-lived cluster's workers are warm; a
    fresh local session's are not)."""
    from ..stages import apply_arrow, decode  # noqa: F401

    return True


@ray.remote
def _compact_parts_task(
    pairs: list,
    lake_root: str,
    cfg_by_ns: dict,
) -> int:
    from ..stages.apply_arrow import compact_partition

    n = 0
    for ns, p in pairs:
        cfg = cfg_by_ns[ns]
        out = compact_partition(
            os.path.join(lake_root, ns) if ns else lake_root,
            p,
            key_cols=cfg.get("keys"),
            final_columns=cfg.get("final_columns"),
            final_types=cfg.get("types"),
        )
        n += 0 if out.get("skipped") else 1
    return n


@ray.remote
def _stage_segment_task(path: str, staging_dir: str, cfg: dict) -> dict:
    """Decode one closed segment and stage its change rows
    part-bucketed under ``staging_dir`` (the map side of the exchange).
    Returns the dirty ``(table_ns, part)`` pairs — ``table_ns`` is ""
    in single-table mode, where the decoder stages directly under
    ``staging_dir/part=P`` (multi-table mode namespaces a
    ``<schema>.<table>/`` level in between) — plus the segment's max
    staged ordinal (the ingestor's per-window frontier watermark;
    column-only read-back of the just-written local staged files)."""
    import pyarrow.compute as pc
    import pyarrow.feather as feather
    import pyarrow.parquet as pq

    from ..stages.decode import SegmentDecoder

    with open(path, "rb") as f:
        blob = f.read()
    batch = pa.table(
        {"bytes": pa.array([blob], pa.binary()), "path": pa.array([path], pa.string())}
    )
    out = SegmentDecoder(staging_dir=staging_dir, **cfg)(batch)
    max_ordinal = -1
    for fpath in out["path"].to_pylist() if "path" in out.column_names else []:
        if fpath.endswith(".ipc"):
            t = feather.read_table(fpath, columns=["ordinal"], memory_map=True)
        else:
            t = pq.read_table(fpath, columns=["ordinal"])
        if t.num_rows:
            max_ordinal = max(max_ordinal, int(pc.max(t["ordinal"]).as_py()))
    parts = [int(x) for x in out["part"].to_pylist()]
    if "table_ns" in out.column_names:
        pairs = sorted(set(zip(out["table_ns"].to_pylist(), parts)))
    else:
        pairs = sorted({("", p) for p in parts})
    return {"pairs": pairs, "max_ordinal": max_ordinal}


@ray.remote
def _apply_parts_task(
    items: list,
    lake_root: str,
    cfg_by_ns: dict,
    sink_mode: str,
    compact_every: Optional[int],
) -> list[dict]:
    """Apply staged changes for a slice of ``(table_ns, part,
    seg_dirs)`` items — the reduce side, same leased exactly-once
    commit as the batch path (each table's own keys/schema/lake
    namespace). Each item's ``seg_dirs`` is THAT partition's pending
    window, in stream order — partitions advance independently."""
    import glob

    import pyarrow.feather as feather

    from ..stages.apply_arrow import ApplyPartitionArrow

    appliers: dict[str, ApplyPartitionArrow] = {}
    summaries = []
    for ns, part, seg_dirs in items:
        inner = appliers.get(ns)
        if inner is None:
            cfg = cfg_by_ns[ns]
            inner = appliers[ns] = ApplyPartitionArrow(
                lake_dir=os.path.join(lake_root, ns) if ns else lake_root,
                write=True,
                final_columns=cfg.get("final_columns"),
                final_types=cfg.get("types"),
                key_cols=cfg.get("keys"),
                sink_mode=sink_mode,
                compact_every=compact_every,
            )
        tables = []
        for d in seg_dirs:
            pdir = os.path.join(d, ns, f"part={part}") if ns else os.path.join(d, f"part={part}")
            for fpath in sorted(glob.glob(os.path.join(pdir, "*.ipc"))) + sorted(
                glob.glob(os.path.join(pdir, "*.parquet"))
            ):
                if fpath.endswith(".ipc"):
                    tables.append(feather.read_table(fpath, memory_map=True))
                else:
                    import pyarrow.parquet as pq

                    tables.append(pq.read_table(fpath))
        if not tables:
            continue
        changes = pa.concat_tables(tables, promote_options="permissive")
        s = inner(changes)
        rec = {c: s[c][0].as_py() for c in s.column_names}
        rec["table_ns"] = ns
        summaries.append(rec)
    return summaries


def gc_stale_staging(lake_dir: str) -> list[str]:
    """Reclaim staging roots left by ingestors that died mid-stream.

    Each live ingestor holds an exclusive ``flock`` on its root's
    ``.lease`` file; the kernel releases it on process death. A root
    whose lease can be acquired (or which has none) is dead weight —
    its staged-but-unapplied windows are safe to drop because the
    manifest watermark makes the restarted tailer's replay of those
    segments idempotent. Returns the removed roots."""
    import fcntl

    removed = []
    try:
        names = os.listdir(lake_dir)
    except FileNotFoundError:
        return removed
    for name in names:
        if not name.startswith("_stream_staging-"):
            continue
        root = os.path.join(lake_dir, name)
        lease = os.path.join(root, ".lease")
        try:
            fd = os.open(lease, os.O_RDWR)
        except FileNotFoundError:
            # pre-lease root or partially-created: reclaim
            shutil.rmtree(root, ignore_errors=True)
            removed.append(root)
            continue
        except OSError:
            continue
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)  # owner alive — leave it be
            continue
        os.close(fd)
        shutil.rmtree(root, ignore_errors=True)
        removed.append(root)
    return removed


class StreamingIngestor:
    """Incremental segment → lake ingest with decode/apply pipelining.

    Usage::

        ing = StreamingIngestor(lake_dir, num_partitions=64, sink="delta")
        while tailing:
            for seg in newly_closed_segments:
                ing.submit(seg)
            ing.poll()          # cheap; advances apply waves
        summaries = ing.drain() # blocks; everything staged + applied
    """

    def __init__(
        self,
        lake_dir: str,
        *,
        num_partitions: int = 32,
        target_table: tuple[str, str] = ("app", "repos"),
        registry: Optional[dict] = None,
        typed_types: Optional[dict] = None,
        dedup_keys: Optional[list[str]] = None,
        final_columns: Optional[list[str]] = None,
        tables: Optional[list[tuple[str, str]]] = None,
        table_configs: Optional[dict] = None,
        sink: str = "delta",
        compact_every: Optional[int] = None,
        apply_parallelism: Optional[int] = None,
    ):
        """``tables`` switches on MULTI-table mode (the live analogue of
        ``run_ingest_multi``): one decode pass per segment stages every
        listed table's typed stream under ``seg_dir/<schema>.<table>/``
        and ``lake_dir`` becomes the lake ROOT with one namespace
        directory per table, each with its own keys/schema/partition
        count and independent per-(table, partition) watermarks.
        ``table_configs`` defaults to ``pipelines.ingest.TABLE_CONFIGS``."""
        self.lake_dir = lake_dir
        self.sink = sink
        self.compact_every = compact_every
        self.key_cols = dedup_keys or ["repo", "path"]
        self.final_columns = final_columns or FINAL_COLUMNS
        self.typed_types = typed_types or REPOS_TYPED_TYPES
        if tables is not None:
            from .ingest import TABLE_CONFIGS, table_ns

            tables = [tuple(t) for t in tables]
            cfgs = table_configs or TABLE_CONFIGS
            self.cfg_by_ns = {table_ns(tt): dict(cfgs[tt]) for tt in tables}
            self.decode_cfg = dict(
                mode="typed",
                registry=registry or SCHEMA_REGISTRY,
                target_tables=tables,
                typed_types_by_table={tt: cfgs[tt]["types"] for tt in tables},
                dedup_keys_by_table={tt: cfgs[tt]["keys"] for tt in tables},
                num_partitions_by_table={
                    tt: cfgs[tt].get("num_partitions", num_partitions) for tt in tables
                },
                num_partitions=num_partitions,
            )
        else:
            self.cfg_by_ns = {
                "": dict(
                    keys=self.key_cols,
                    types=self.typed_types,
                    final_columns=self.final_columns,
                )
            }
            self.decode_cfg = dict(
                mode="typed",
                registry=registry or SCHEMA_REGISTRY,
                target_table=target_table,
                typed_types=self.typed_types,
                dedup_keys=self.key_cols,
                num_partitions=num_partitions,
            )
        if apply_parallelism is None:
            try:
                apply_parallelism = max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)
            except Exception:
                apply_parallelism = 8
        self.apply_parallelism = apply_parallelism
        # fresh staging root per run (a crashed run's stale staged rows
        # must not leak into this stream's watermarked windows)
        self.staging_root = os.path.join(lake_dir, f"_stream_staging-{uuid.uuid4().hex[:8]}")
        shutil.rmtree(self.staging_root, ignore_errors=True)
        os.makedirs(self.staging_root, exist_ok=True)
        # liveness lease on this staging root: held (flock) for the
        # ingestor's lifetime, released by the kernel on process death —
        # gc_stale_staging() on a later run reclaims exactly the roots
        # whose owner died mid-stream (crash-resume leaves no litter,
        # and a concurrently LIVE ingestor's staging is never touched)
        self._lease_fd = os.open(os.path.join(self.staging_root, ".lease"), os.O_CREAT | os.O_RDWR)
        import fcntl

        fcntl.flock(self._lease_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        gc_stale_staging(lake_dir)
        # submission order == stream order == ordinal order
        self._seg_dirs: list[str] = []
        self._stage_refs: list[ray.ObjectRef] = []
        self._staged_through = 0  # contiguous prefix of resolved stage tasks
        # per-(table_ns, part) scheduling state: partitions advance
        # through their own staged windows independently — a straggler
        # partition (hot key / skew) never stalls the others' applies,
        # which is what a global wave barrier would do at cluster scale
        self._key_pending: dict = {}  # key → staged window idxs not yet launched
        self._key_inflight: set = set()
        self._inflight_tasks: list = []  # (ref, [(key, window_idxs)])
        self._window_remaining: dict = {}  # idx → keys with unapplied data
        self._folded: set = set()  # keys whose LAST apply ran in rewrite mode
        # mid-stream commit frontier: a window is done when every
        # partition with data in it has applied; the frontier advances
        # through the CONTIGUOUS done prefix only (windows complete out
        # of order — publishing a later window's watermark early would
        # claim unapplied earlier ordinals as committed)
        self._window_done: set = set()
        self._window_wm: dict = {}  # idx → max staged ordinal of that segment
        self._frontier_next = 0  # first window not yet folded into the frontier
        self._frontier_wm = -1
        self.summaries: list[dict] = []
        # fire-and-forget worker warmup, overlapped with the tail
        self._warmup = [_warmup_task.remote() for _ in range(min(self.apply_parallelism, 16))]

    # -- producer side ------------------------------------------------

    def submit(self, segment_path: str) -> None:
        """Register one closed segment; its decode+stage task launches
        immediately and overlaps everything else."""
        seg_dir = os.path.join(
            self.staging_root, f"seg-{len(self._seg_dirs):06d}-{os.path.basename(segment_path)}"
        )
        self._seg_dirs.append(seg_dir)
        self._stage_refs.append(
            _stage_segment_task.remote(segment_path, seg_dir, self.decode_cfg)
        )

    # -- progress -----------------------------------------------------

    def _advance_staged(self) -> None:
        while self._staged_through < len(self._stage_refs):
            idx = self._staged_through
            ref = self._stage_refs[idx]
            ready, _ = ray.wait([ref], timeout=0)
            if not ready:
                break
            res = ray.get(ref)
            pairs = [tuple(p) for p in res["pairs"]]
            self._window_wm[idx] = int(res.get("max_ordinal", -1))
            self._staged_through += 1
            if not pairs:
                shutil.rmtree(self._seg_dirs[idx], ignore_errors=True)
                self._window_done.add(idx)
                self._maybe_publish_frontier()
                continue
            self._window_remaining[idx] = set(pairs)
            for key in pairs:
                self._key_pending.setdefault(key, []).append(idx)

    def _maybe_publish_frontier(self) -> None:
        """Advance the lake-level commit frontier through the contiguous
        prefix of fully-applied windows (what follow_changelog tails —
        live, not just at drain)."""
        advanced = False
        while self._frontier_next in self._window_done:
            w = self._window_wm.get(self._frontier_next, -1)
            if w > self._frontier_wm:
                self._frontier_wm = w
            self._window_done.discard(self._frontier_next)
            self._frontier_next += 1
            advanced = True
        if advanced and self._frontier_wm >= 0:
            from ..state.manifest import publish_frontier

            for ns in self.cfg_by_ns:
                publish_frontier(
                    os.path.join(self.lake_dir, ns) if ns else self.lake_dir,
                    self._frontier_wm,
                )

    def _maybe_launch_apply(self, sink_override: Optional[str] = None) -> None:
        slots = self.apply_parallelism - len(self._inflight_tasks)
        if slots <= 0:
            return
        ready = sorted(
            k for k, pend in self._key_pending.items() if pend and k not in self._key_inflight
        )
        if not ready:
            return
        sink = sink_override or self.sink
        n_tasks = min(len(ready), slots)
        for chunk in (ready[i::n_tasks] for i in range(n_tasks)):
            items, keywins = [], []
            for key in chunk:
                wins = self._key_pending[key]
                self._key_pending[key] = []
                self._key_inflight.add(key)
                items.append((key[0], key[1], [self._seg_dirs[i] for i in wins]))
                keywins.append((key, wins))
            ref = _apply_parts_task.remote(
                items, self.lake_dir, self.cfg_by_ns, sink, self.compact_every
            )
            self._inflight_tasks.append((ref, keywins))
            # track which keys' LATEST apply folded to base form, so
            # drain() only compacts partitions still carrying deltas
            if sink == "rewrite":
                self._folded.update(k for k, _ in keywins)
            else:
                self._folded.difference_update(k for k, _ in keywins)

    def _reap_apply(self, block: bool = False) -> None:
        if not self._inflight_tasks:
            return
        refs = [r for r, _ in self._inflight_tasks]
        done, _ = ray.wait(
            refs, num_returns=1 if block else len(refs), timeout=None if block else 0
        )
        done_set = set(done)
        still = []
        for ref, keywins in self._inflight_tasks:
            if ref not in done_set:
                still.append((ref, keywins))
                continue
            self.summaries.extend(ray.get(ref))
            for key, wins in keywins:
                self._key_inflight.discard(key)
                for w in wins:
                    rem = self._window_remaining.get(w)
                    if rem is None:
                        continue
                    rem.discard(key)
                    if not rem:
                        # every partition with data in this window has
                        # applied it — its staging dir is dead weight
                        shutil.rmtree(self._seg_dirs[w], ignore_errors=True)
                        del self._window_remaining[w]
                        self._window_done.add(w)
        self._inflight_tasks = still
        self._maybe_publish_frontier()

    def poll(self) -> None:
        """Cheap, non-blocking progress: reap finished applies, advance
        the staged prefix, launch applies for partitions with pending
        windows and a free slot."""
        self._reap_apply(block=False)
        self._advance_staged()
        self._maybe_launch_apply()

    # -- completion ---------------------------------------------------

    def drain(self, compact: Optional[bool] = None) -> list[dict]:
        """Block until every submitted segment is staged and applied.
        ``compact`` (default: True for the delta sink) leaves the lake
        in read-optimal single-file-per-partition form: each
        partition's FINAL apply runs in rewrite mode (one leased commit
        folds base + live deltas + pending windows and unlinks the
        superseded delta files), and only partitions with no pending
        windows at drain time go through an explicit compaction task."""
        if compact is None:
            compact = self.sink == "delta"
        # stage barrier — applies keep flowing while staging finishes
        while self._staged_through < len(self._stage_refs):
            ray.wait([self._stage_refs[self._staged_through]], timeout=1.0)
            self.poll()
        final_sink = "rewrite" if compact else self.sink
        while self._inflight_tasks or any(self._key_pending.values()):
            self._maybe_launch_apply(sink_override=final_sink)
            if self._inflight_tasks:
                self._reap_apply(block=True)
        try:
            os.close(self._lease_fd)  # release the liveness lease
        except OSError:
            pass
        shutil.rmtree(self.staging_root, ignore_errors=True)
        if compact:
            dirty = {
                (s.get("table_ns", ""), int(s["part"]))
                for s in self.summaries
                if s.get("part", -1) >= 0
            }
            remaining = sorted(pr for pr in dirty if pr not in self._folded)
            if remaining:
                # raw-task compaction (skips the Dataset-job floor of
                # compact_lake) over whatever still carries deltas
                n_tasks = min(len(remaining), self.apply_parallelism)
                chunks = [remaining[i::n_tasks] for i in range(n_tasks)]
                ray.get(
                    [
                        _compact_parts_task.remote(c, self.lake_dir, self.cfg_by_ns)
                        for c in chunks
                    ]
                )
        # every submitted segment is now committed across every
        # partition → advance each namespace's commit frontier (the
        # changelog-follower surface; mid-stream followers ride the
        # batch path's per-wave frontier instead, because streaming
        # windows complete per PARTITION, not per global ordinal)
        if self.summaries:
            from ..state.manifest import publish_frontier

            by_ns: dict = {}
            for s in self.summaries:
                ns = s.get("table_ns", "")
                w = int(s.get("watermark", -1))
                if w > by_ns.get(ns, -1):
                    by_ns[ns] = w
            for ns, w in by_ns.items():
                publish_frontier(os.path.join(self.lake_dir, ns) if ns else self.lake_dir, w)
        return self.summaries
