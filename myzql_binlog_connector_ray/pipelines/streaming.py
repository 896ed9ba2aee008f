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
- apply waves — whenever a contiguous prefix of submitted segments has
  finished staging and no apply is in flight, the dirty partitions of
  that window are applied by a fan-out of raw tasks (each holds the
  partition lease; the manifest watermark keeps it exactly-once).
  Waves are serialized with each other: ordinals are monotone along
  the stream, and applying window k+1 before window k would drop
  window k behind the watermark.
- ``drain()`` — blocks until everything staged + applied; optional
  compaction folds the delta history to read-optimal form.

Correctness invariant (same as the batch path): an apply over
partition P at watermark W must include every staged change with
ordinal ≤ W for P — guaranteed by only applying contiguous prefixes of
the submission order, which is the stream order.

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
def _stage_segment_task(path: str, staging_dir: str, cfg: dict) -> list:
    """Decode one closed segment and stage its change rows
    part-bucketed under ``staging_dir`` (the map side of the exchange).
    Returns the dirty ``(table_ns, part)`` pairs — ``table_ns`` is ""
    in single-table mode, where the decoder stages directly under
    ``staging_dir/part=P`` (multi-table mode namespaces a
    ``<schema>.<table>/`` level in between)."""
    from ..stages.decode import SegmentDecoder

    with open(path, "rb") as f:
        blob = f.read()
    batch = pa.table(
        {"bytes": pa.array([blob], pa.binary()), "path": pa.array([path], pa.string())}
    )
    out = SegmentDecoder(staging_dir=staging_dir, **cfg)(batch)
    parts = [int(x) for x in out["part"].to_pylist()]
    if "table_ns" in out.column_names:
        return sorted(set(zip(out["table_ns"].to_pylist(), parts)))
    return sorted({("", p) for p in parts})


@ray.remote
def _apply_parts_task(
    pairs: list,
    seg_dirs: list[str],
    lake_root: str,
    cfg_by_ns: dict,
    sink_mode: str,
    compact_every: Optional[int],
) -> list[dict]:
    """Apply one window's staged changes for a slice of ``(table_ns,
    part)`` pairs — the reduce side, same leased exactly-once commit as
    the batch path (each table's own keys/schema/lake namespace)."""
    import glob

    import pyarrow.feather as feather

    from ..stages.apply_arrow import ApplyPartitionArrow

    appliers: dict[str, ApplyPartitionArrow] = {}
    summaries = []
    for ns, part in pairs:
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
        # submission order == stream order == ordinal order
        self._seg_dirs: list[str] = []
        self._stage_refs: list[ray.ObjectRef] = []
        self._stage_parts: dict[int, list] = {}  # idx → dirty (ns, part) pairs
        self._staged_through = 0  # contiguous prefix of resolved stage tasks
        self._applied_through = 0  # prefix already covered by completed applies
        self._inflight: Optional[tuple[list[ray.ObjectRef], int]] = None  # (refs, window_end)
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
            ref = self._stage_refs[self._staged_through]
            ready, _ = ray.wait([ref], timeout=0)
            if not ready:
                break
            self._stage_parts[self._staged_through] = ray.get(ref)
            self._staged_through += 1

    def _maybe_launch_apply(self, sink_override: Optional[str] = None) -> None:
        if self._inflight is not None or self._staged_through <= self._applied_through:
            return
        lo, hi = self._applied_through, self._staged_through
        dirty = sorted({p for i in range(lo, hi) for p in self._stage_parts[i]})
        if not dirty:
            self._applied_through = hi
            return
        seg_dirs = self._seg_dirs[lo:hi]
        n_tasks = min(len(dirty), self.apply_parallelism)
        chunks = [dirty[i::n_tasks] for i in range(n_tasks)]
        refs = [
            _apply_parts_task.remote(
                chunk,
                seg_dirs,
                self.lake_dir,
                self.cfg_by_ns,
                sink_override or self.sink,
                self.compact_every,
            )
            for chunk in chunks
        ]
        self._inflight = (refs, hi)
        self._last_wave_parts = dirty
        self._last_wave_sink = sink_override or self.sink

    def _reap_apply(self, block: bool = False) -> None:
        if self._inflight is None:
            return
        refs, hi = self._inflight
        if not block:
            _, pending = ray.wait(refs, num_returns=len(refs), timeout=0)
            if pending:
                return
        for batch in ray.get(refs):
            self.summaries.extend(batch)
        lo = self._applied_through
        self._applied_through = hi
        self._inflight = None
        # consumed windows' staging dirs are dead weight — drop them
        for d in self._seg_dirs[lo:hi]:
            shutil.rmtree(d, ignore_errors=True)

    def poll(self) -> None:
        """Cheap, non-blocking progress: advance the staged prefix, reap
        a finished apply wave, launch the next one."""
        self._reap_apply(block=False)
        self._advance_staged()
        self._maybe_launch_apply()

    # -- completion ---------------------------------------------------

    def drain(self, compact: Optional[bool] = None) -> list[dict]:
        """Block until every submitted segment is staged and applied.
        ``compact`` (default: True for the delta sink) leaves the lake
        in read-optimal single-file-per-partition form: the FINAL apply
        wave runs in rewrite mode (one leased commit folds base + live
        deltas + window and unlinks the superseded delta files), and
        only partitions the final wave did not touch go through an
        explicit compaction task."""
        if compact is None:
            compact = self.sink == "delta"
        # stage barrier: once everything is staged, the next launched
        # wave is the final window — fold it straight to base form
        while self._stage_refs and self._staged_through < len(self._stage_refs):
            ray.wait([self._stage_refs[self._staged_through]], timeout=1.0)
            self.poll()
        final_sink = "rewrite" if compact else self.sink
        while self._inflight is not None or self._applied_through < self._staged_through:
            self._reap_apply(block=True)
            self._maybe_launch_apply(sink_override=final_sink)
        shutil.rmtree(self.staging_root, ignore_errors=True)
        if compact:
            dirty = sorted(
                {
                    (s.get("table_ns", ""), int(s["part"]))
                    for s in self.summaries
                    if s.get("part", -1) >= 0
                }
            )
            folded = (
                set(self._last_wave_parts)
                if getattr(self, "_last_wave_sink", None) == "rewrite"
                else set()
            )
            remaining = [pr for pr in dirty if pr not in folded]
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
        return self.summaries
