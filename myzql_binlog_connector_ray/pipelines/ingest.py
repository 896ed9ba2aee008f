"""The flagship pipelines: segments → envelope log, and segments → lake upsert.

Pure ``ray.data.Dataset`` composition (no raw tasks/actors):

    read_binary_files(segments)                       # 1 block per segment
      → map_batches(SegmentDecoder, concurrency=…)    # actor pool, stateful decode
      → [envelope path]  write_parquet / return
      → [apply path]     map_batches(AddPartition)    # hash(repo,path) % P
                       → map_batches(lww_combine)     # pre-shuffle combiner
                       → groupby("part")              # the only shuffle
                       → map_groups(ApplyPartition)   # LWW merge + atomic commit

Never calls ``ray.init`` — the caller owns the session.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from ..fixtures.change_stream import SCHEMA_REGISTRY
from functools import partial

from ..stages.apply import add_partition, apply_partition_group, lww_combine, partition_of, sha256_hex
from ..stages.decode import SegmentDecoder

REPOS_TYPED_TYPES = {
    "repo": pa.string(),
    "path": pa.string(),
    "commit": pa.string(),
    "lang": pa.string(),
    "content": pa.string(),
    "stars": pa.int64(),
}
FINAL_COLUMNS = ["repo", "path", "commit", "lang", "content", "stars", "content_sha256"]

#: per-table apply configuration for the multi-table ingest path —
#: (schema, table) → primary-key columns, typed Arrow schema, final lake
#: columns. A deployment registers every table its filter replicates.
TABLE_CONFIGS: dict[tuple[str, str], dict] = {
    ("app", "repos"): dict(
        keys=["repo", "path"],
        types=REPOS_TYPED_TYPES,
        final_columns=FINAL_COLUMNS,
    ),
    ("metrics", "counters"): dict(
        keys=["id"],
        types={"id": pa.int64(), "val": pa.int64()},
        final_columns=["id", "val"],
        # content-free table: the value itself is the version marker
        # (CLI history mode) and the diff digest falls back to the
        # non-key-column composite
        version_col="val",
        # low-traffic side table: its own (small) partition count — the
        # apply cost is one task per (table, partition)
        num_partitions=8,
    ),
}


def table_ns(tt: tuple[str, str]) -> str:
    return f"{tt[0]}.{tt[1]}"


def auto_concurrency(concurrency=None):
    """Actor-pool sizing that cannot starve the read/shuffle stages.

    An exact pool of size == cluster CPUs deadlocks the pipeline (the
    pool reserves every CPU, the upstream read task never schedules).
    Returns an autoscaling (1, max) pool bounded at cluster CPUs − 2.
    """
    if concurrency is not None:
        return concurrency
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus - 2))


def read_segments(segment_paths: list[str]) -> ray.data.Dataset:
    """One input row (and exactly one block) per self-contained segment
    file — over-provisioned block counts yield empty schema-less blocks
    that trip the executor's schema-mismatch warning."""
    return ray.data.read_binary_files(
        segment_paths, include_paths=True, override_num_blocks=len(segment_paths)
    )


def decode_segment_batch(batch, **cfg):
    """Stateless-task decode body: construct the decoder per segment.

    Construction cost is a few dicts (the compiled row decoders rebuild
    per segment, which is microseconds); correctness relies on segments
    being self-contained — each replays its own FORMAT_DESCRIPTION and
    TABLE_MAPs, as MySQL does per binlog file."""
    return SegmentDecoder(**cfg)(batch)


def _dispatch_decode(
    segments: ray.data.Dataset, cfg: dict, concurrency, scheduling: str = "auto"
) -> ray.data.Dataset:
    """Decode-stage scheduling shared by the envelope and typed paths:
    stateless tasks on ≥8 CPUs (decoder construction is microseconds;
    tasks interleave with reads and skip actor-pool ramp-up — measured
    ~20 % faster end-to-end: 5.7 s → 2.6–4.4 s for the sf0.1 envelope
    export at 32 CPUs), an autoscaling actor pool otherwise (pinning a
    CPU share wins on small clusters). ``concurrency`` only sizes the
    actor pool; in "auto" it does NOT force the actors path — pass
    ``scheduling="actors"`` to pin one explicitly."""
    if scheduling == "auto":
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        if cpus >= 8:
            scheduling = "tasks"
        else:
            scheduling = "actors"
            if concurrency is None:
                concurrency = max(2, (cpus * 3) // 4)
    if scheduling == "tasks":
        return segments.map_batches(
            decode_segment_batch,
            fn_kwargs=cfg,
            batch_size=1,  # one segment per call: the segment is the decode unit
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return segments.map_batches(
        SegmentDecoder,
        fn_constructor_kwargs=cfg,
        batch_size=1,
        batch_format="pyarrow",
        concurrency=auto_concurrency(concurrency),
        zero_copy_batch=True,
    )


def decode_envelope(
    segments: ray.data.Dataset,
    *,
    include: Optional[list[str]] = None,
    exclude: Optional[list[str]] = None,
    min_ordinal: Optional[int] = None,
    max_ordinal: Optional[int] = None,
    concurrency=None,
    scheduling: str = "auto",
) -> ray.data.Dataset:
    """Segments → the reference's 9-column envelope (+ segment, ordinal)."""
    return _dispatch_decode(
        segments,
        dict(
            mode="envelope",
            include=include,
            exclude=exclude,
            min_ordinal=min_ordinal,
            max_ordinal=max_ordinal,
        ),
        concurrency,
        scheduling,
    )


def decode_typed(
    segments: ray.data.Dataset,
    target_table: tuple[str, str] = ("app", "repos"),
    *,
    registry: Optional[dict] = None,
    typed_types: Optional[dict] = None,
    min_ordinal: Optional[int] = None,
    max_ordinal: Optional[int] = None,
    concurrency=None,
    dedup_keys: Optional[list[str]] = None,
    num_partitions: Optional[int] = None,
    scheduling: str = "auto",
    staging_dir: Optional[str] = None,
) -> ray.data.Dataset:
    """Segments → typed change rows for one table (no JSON detour).

    With ``dedup_keys``/``num_partitions`` set, the decoder also runs
    the fused LWW combiner (latest change per key per segment) and
    stamps the hash-partition column — one pass, no extra stage.

    ``scheduling``:
    - "tasks": construct the decoder per segment on warm pooled
      workers — valid because segments are self-contained (SURVEY.md
      §4.2); decode tasks interleave freely with read tasks, measured
      ~20% faster end-to-end on ≥8 CPUs.
    - "actors": fixed/autoscaling actor pool — pins a CPU share for
      decode, which wins on small clusters where the executor's
      per-operator reservations otherwise starve the decode stage.
    - "auto" (default): tasks when the cluster has ≥8 CPUs, else an
      actor pool sized 3/4 of the CPUs (both measured, see BASELINE.md).
    """
    cfg = dict(
        mode="typed",
        registry=registry or SCHEMA_REGISTRY,
        target_table=target_table,
        typed_types=typed_types or REPOS_TYPED_TYPES,
        min_ordinal=min_ordinal,
        max_ordinal=max_ordinal,
        dedup_keys=dedup_keys,
        num_partitions=num_partitions,
        staging_dir=staging_dir,
    )
    return _dispatch_decode(segments, cfg, concurrency, scheduling)


def export_envelope(
    segments: ray.data.Dataset,
    out_dir: str,
    *,
    include: Optional[list[str]] = None,
    exclude: Optional[list[str]] = None,
    concurrency=None,
    scheduling: str = "auto",
) -> list[dict]:
    """Reference parquet mode with the rotation sink policy: one
    ``<binlog_file>.parquet`` per segment (src/pipeline.zig:342-360),
    written atomically inside the decode worker — re-runs overwrite,
    making the export idempotent per segment. Returns per-segment
    manifest rows."""
    ds = _dispatch_decode(
        segments,
        dict(
            mode="envelope",
            include=include,
            exclude=exclude,
            envelope_out_dir=out_dir,
        ),
        concurrency,
        scheduling,
    )
    return ds.take_all()  # small: one row per segment


def init_lake(base_table: pa.Table, lake_dir: str, num_partitions: int) -> None:
    """Materialize a base lake hash-partitioned the same way apply shuffles.

    Driver-side (the base table is small fixture state); the scale
    path — a 100 TB snapshot bootstrap — is ``init_lake_distributed``,
    which runs the same stamping + partitioned write as a Dataset job
    (byte-equivalent lakes; equality test-pinned).
    """
    import pyarrow.parquet as pq

    from ..state.manifest import partition_dir

    # an empty base is a legitimate bootstrap (CDC from scratch): the
    # lake root must exist so later delta commits / reads find it
    os.makedirs(lake_dir, exist_ok=True)
    part = partition_of(base_table["repo"].to_pylist(), base_table["path"].to_pylist(), num_partitions)
    df = base_table.to_pandas()
    df["content_sha256"] = sha256_hex(df["content"].tolist())
    for p, g in df.groupby(part):
        pdir = partition_dir(lake_dir, int(p))
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g.drop(columns=[]), preserve_index=False),
            os.path.join(pdir, "data.parquet"),
            compression="zstd",
        )


def init_lake_distributed(
    base: ray.data.Dataset, lake_dir: str, num_partitions: int
) -> list[dict]:
    """Snapshot bootstrap as a Dataset job — the CDC engine's initial
    load at scale: stamp sha256 lineage + the apply hash partition in
    ``map_batches``, co-locate each partition with one shuffle, and
    write every ``part=NNNN/data.parquet`` atomically inside its task
    (tmp + ``os.replace``, overwrite-idempotent → a failed bootstrap
    re-runs safely). The driver sees one summary row per partition.
    Produces the same lake layout as the driver-side ``init_lake``
    (single sorted data file per partition), so ``run_ingest`` applies
    on top of either interchangeably."""
    import uuid as _uuid

    import pyarrow.parquet as pq

    from ..state.manifest import partition_dir

    def stamp(t: pa.Table) -> pa.Table:
        part = partition_of(t["repo"].to_pylist(), t["path"].to_pylist(), num_partitions)
        t = t.append_column("content_sha256", pa.array(sha256_hex(t["content"].to_pylist()), pa.string()))
        return t.append_column("part", pa.array(part, pa.int32()))

    def write_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = int(g["part"][0].as_py())
        out = g.drop_columns(["part"])
        # deterministic row order inside the file, like the pandas
        # groupby path (stable within the partition by (repo, path))
        out = out.take(pc.sort_indices(out, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
        pdir = partition_dir(lake_dir, p)
        os.makedirs(pdir, exist_ok=True)
        dest = os.path.join(pdir, "data.parquet")
        tmp = dest + f".tmp-{_uuid.uuid4().hex}"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, dest)
        return pa.table({"part": pa.array([p], pa.int64()), "rows": pa.array([len(out)], pa.int64())})

    stamped = base.map_batches(stamp, batch_format="pyarrow")
    summaries = stamped.groupby("part").map_groups(write_part, batch_format="pyarrow")
    return summaries.take_all()  # small: one row per partition


def apply_changes(
    changes: ray.data.Dataset,
    *,
    lake_dir: Optional[str],
    num_partitions: int = 32,
    write: bool = False,
    final_columns: Optional[list[str]] = None,
    pre_partitioned: bool = False,
    engine: str = "arrow",
    sink: str = "rewrite",
    compact_every: Optional[int] = None,
) -> ray.data.Dataset:
    """Typed change rows → final lake state (or commit summaries if write=True).

    ``pre_partitioned=True`` means the decoder already deduped per key
    and stamped ``part`` (decode_typed dedup_keys/num_partitions) — the
    standalone combiner stages are skipped. ``engine`` picks the apply
    implementation: "arrow" (default; the LWW fold stays in pyarrow
    kernels) or "pandas" (reference implementation, kept for tests).
    """
    if pre_partitioned:
        ds = changes
    else:
        ds = changes.map_batches(
            add_partition,
            fn_kwargs=dict(num_partitions=num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.map_batches(lww_combine, batch_format="pyarrow")
    if engine == "arrow":
        from ..stages.apply_arrow import apply_partition_group_arrow

        return ds.groupby("part").map_groups(
            partial(
                apply_partition_group_arrow,
                lake_dir=lake_dir,
                write=write,
                final_columns=final_columns or FINAL_COLUMNS,
                final_types=REPOS_TYPED_TYPES,
                sink_mode=sink,
                compact_every=compact_every,
            ),
            batch_format="pyarrow",
        )
    if sink != "rewrite":
        raise ValueError("sink='delta' requires the arrow engine")
    return ds.groupby("part").map_groups(
        partial(
            apply_partition_group,
            lake_dir=lake_dir,
            write=write,
            final_columns=final_columns or FINAL_COLUMNS,
        ),
        batch_format="pandas",
    )


def run_ingest(
    segment_paths: list[str],
    lake_dir: str,
    *,
    num_partitions: int = 32,
    target_table: tuple[str, str] = ("app", "repos"),
    concurrency=None,
    min_ordinal: Optional[int] = None,
    max_ordinal: Optional[int] = None,
    exchange: str = "staged",
    sink: str = "rewrite",
    compact_every: Optional[int] = None,
) -> list[dict]:
    """Transactional ingest: decode → upsert *into* lake_dir, exactly-once.

    ``sink="delta"`` appends each batch's reduced change rows as
    per-partition delta files instead of folding + rewriting the base
    (bounded write amplification for small frequent batches); read the
    result via ``read_lake_state`` or fold it back to single-file
    partitions with ``compact_lake``; ``compact_every=N`` folds a
    partition back inline as soon as it accumulates N delta files
    (bounded read amplification with no external job). The LWW fold is
    associative, so all sink variants produce the identical final state
    (test-pinned).

    Returns per-partition commit summaries. Re-running with the same
    (or a prefix of the same) stream is a no-op per partition thanks to
    the manifest watermark check.

    ``exchange`` picks how wide change rows travel from decode to apply:

    - "staged" (default): decoders write part-bucketed parquet to a
      staging dir (map-side exchange files); apply tasks read their
      partition's files. The object store carries only tiny manifests —
      on a multi-node cluster the staging dir is shared storage and the
      exchange is embarrassingly parallel file I/O; on one node it
      sidesteps the plasma all-to-all (measured: see BASELINE.md).
    - "groupby": pure Dataset composition — the wide rows go through
      Ray Data's sort shuffle via groupby("part").map_groups.
      Both paths produce identical lakes (tests pin equality).
    """
    segments = read_segments(segment_paths)
    if exchange == "staged":
        import shutil as _shutil

        staging_dir = os.path.join(lake_dir, "_staging")
        # a crashed earlier run may have staged segments not in THIS
        # run's input; stale files must not leak into the apply
        _shutil.rmtree(staging_dir, ignore_errors=True)
        manifests = decode_typed(
            segments,
            target_table,
            concurrency=concurrency,
            min_ordinal=min_ordinal,
            max_ordinal=max_ordinal,
            dedup_keys=["repo", "path"],
            num_partitions=num_partitions,
            staging_dir=staging_dir,
        )
        # the (semantically required) barrier: every segment staged.
        # The collected table is tiny — ≤ #segments × #partitions rows.
        parts = sorted({r["part"] for r in manifests.take_all()})
        from functools import partial as _partial

        from ..stages.apply_arrow import apply_staged_parts

        summaries = ray.data.from_items(
            [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
        ).map_batches(
            _partial(
                apply_staged_parts,
                staging_dir=staging_dir,
                lake_dir=lake_dir,
                write=True,
                final_columns=FINAL_COLUMNS,
                final_types=REPOS_TYPED_TYPES,
                sink_mode=sink,
                compact_every=compact_every,
            ),
            batch_format="pyarrow",
        )
        rows = summaries.take_all()  # small: one row per partition
        _shutil.rmtree(staging_dir, ignore_errors=True)  # transient exchange files
    else:
        changes = decode_typed(
            segments,
            target_table,
            concurrency=concurrency,
            min_ordinal=min_ordinal,
            max_ordinal=max_ordinal,
            dedup_keys=["repo", "path"],
            num_partitions=num_partitions,
        )
        summaries = apply_changes(
            changes,
            lake_dir=lake_dir,
            num_partitions=num_partitions,
            write=True,
            pre_partitioned=True,
            sink=sink,
            compact_every=compact_every,
        )
        rows = summaries.take_all()  # small: one row per partition
    from ..logging_config import get_logger

    log = get_logger("pipeline")
    committed = sum(1 for s in rows if not s.get("skipped"))
    log.debug(
        "ingest: %d segments → %d/%d partitions committed (%d rows)",
        len(segment_paths), committed, len(rows), sum(s.get("rows", 0) for s in rows),
    )
    if rows:
        # wave fully committed across every touched partition → advance
        # the lake-level commit frontier (what changelog followers tail)
        from ..state.manifest import publish_frontier

        publish_frontier(lake_dir, max(int(s.get("watermark", -1)) for s in rows))
    return rows


def run_ingest_multi(
    segment_paths: list[str],
    lake_root: str,
    *,
    tables: tuple[tuple[str, str], ...] = (("app", "repos"), ("metrics", "counters")),
    num_partitions: int = 32,
    concurrency=None,
    table_configs: Optional[dict] = None,
    registry: Optional[dict] = None,
    min_ordinal: Optional[int] = None,
    max_ordinal: Optional[int] = None,
    sink: str = "rewrite",
) -> list[dict]:
    """Multi-table transactional ingest: ONE decode pass over the
    segment bytes emits a per-table typed change stream for EVERY
    listed table (the reference's envelope mode is inherently
    multi-table — src/parquet_writer.zig:124-134 — and a real CDC
    deployment replicates its whole filter set), applied into
    namespaced lakes ``lake_root/<schema>.<table>/`` in one Dataset
    job. Per-(table, partition) watermark manifests keep exactly-once
    semantics independent per table; re-running is a no-op.

    Uses the staged exchange unconditionally: the decoder writes
    part-bucketed change files under ``staging/<ns>/part=P/`` and
    returns tiny uniform manifest rows, so heterogeneous table schemas
    never meet in one Dataset block."""
    import shutil as _shutil
    from functools import partial as _partial

    from ..stages.apply_arrow import apply_staged_parts_multi

    cfgs = table_configs or TABLE_CONFIGS
    tables = [tuple(t) for t in tables]
    cfg_by_ns = {table_ns(tt): cfgs[tt] for tt in tables}

    staging_dir = os.path.join(lake_root, "_staging")
    _shutil.rmtree(staging_dir, ignore_errors=True)  # stale stage files must not leak in

    segments = read_segments(segment_paths)
    manifests = _dispatch_decode(
        segments,
        dict(
            mode="typed",
            registry=registry or SCHEMA_REGISTRY,
            target_tables=tables,
            typed_types_by_table={tt: cfgs[tt]["types"] for tt in tables},
            dedup_keys_by_table={tt: cfgs[tt]["keys"] for tt in tables},
            num_partitions_by_table={
                tt: cfgs[tt].get("num_partitions", num_partitions) for tt in tables
            },
            num_partitions=num_partitions,
            staging_dir=staging_dir,
            min_ordinal=min_ordinal,
            max_ordinal=max_ordinal,
        ),
        concurrency,
    )
    # the (semantically required) barrier: every segment staged. Tiny —
    # ≤ #segments × #tables × #partitions manifest rows.
    pairs = sorted({(r["table_ns"], r["part"]) for r in manifests.take_all()})
    summaries = ray.data.from_items(
        [{"table_ns": ns, "part": p} for ns, p in pairs],
        override_num_blocks=max(1, len(pairs)),
    ).map_batches(
        _partial(
            apply_staged_parts_multi,
            staging_root=staging_dir,
            lake_root=lake_root,
            table_cfgs=cfg_by_ns,
            write=True,
            sink_mode=sink,
        ),
        batch_format="pyarrow",
    )
    rows = summaries.take_all()  # small: one row per (table, partition)
    _shutil.rmtree(staging_dir, ignore_errors=True)
    from ..logging_config import get_logger

    get_logger("pipeline").debug(
        "multi-ingest: %d segments → %d tables, %d (table, partition) commits",
        len(segment_paths), len(tables), sum(1 for s in rows if not s.get("skipped")),
    )
    if rows:
        # per-namespace commit frontier (changelog followers tail it)
        from ..state.manifest import publish_frontier

        by_ns: dict = {}
        for s in rows:
            ns = s.get("table_ns", "")
            w = int(s.get("watermark", -1))
            if w > by_ns.get(ns, -1):
                by_ns[ns] = w
        for ns, w in by_ns.items():
            publish_frontier(os.path.join(lake_root, ns) if ns else lake_root, w)
    return rows


def read_lake(lake_dir: str) -> ray.data.Dataset:
    """The committed lake state as a Dataset (partition dirs → blocks).
    Valid for rewrite-mode / compacted lakes; a lake with live delta
    files must go through ``read_lake_state`` (fold-on-read)."""
    return ray.data.read_parquet(lake_dir)


def _lake_parts(lake_dir: str) -> list[int]:
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(lake_dir)
        if d.startswith("part=") and os.path.isdir(os.path.join(lake_dir, d))
    )


def read_lake_state(
    lake_dir: str,
    *,
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
) -> ray.data.Dataset:
    """Delta-aware lake read: one task per partition folds base + live
    delta files into the FINAL state (correct whether or not the lake
    has been compacted)."""
    from functools import partial as _partial

    from ..stages.apply_arrow import read_state_parts

    parts = _lake_parts(lake_dir)
    return ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(
        _partial(
            read_state_parts,
            lake_dir=lake_dir,
            key_cols=key_cols,
            final_columns=final_columns or FINAL_COLUMNS,
            final_types=final_types or REPOS_TYPED_TYPES,
        ),
        batch_format="pyarrow",
    )


def read_lake_asof(
    lake_dir: str,
    watermark: int,
    *,
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
) -> ray.data.Dataset:
    """Point-in-time (time-travel) lake read: one task per partition
    folds base + delta rows with ``ordinal <= watermark`` into the
    state AS OF that watermark. Exact at delta-commit boundaries;
    raises ``SnapshotUnavailable`` below the compaction horizon (see
    ``stages.apply_arrow.read_asof_parts`` for the full contract)."""
    from functools import partial as _partial

    from ..stages.apply_arrow import read_asof_parts

    parts = _lake_parts(lake_dir)
    return ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(
        _partial(
            read_asof_parts,
            lake_dir=lake_dir,
            watermark=watermark,
            key_cols=key_cols,
            final_columns=final_columns or FINAL_COLUMNS,
            final_types=final_types or REPOS_TYPED_TYPES,
        ),
        batch_format="pyarrow",
    )


def read_lake_changelog(
    lake_dir: str, lo: int = -1, hi: Optional[int] = None
) -> ray.data.Dataset:
    """CDC-out feed: the retained change rows with ``lo < ordinal <=
    hi`` from the lake's delta history, one task per partition — keys,
    dml, ordinal and payloads as committed, for downstream re-apply or
    audit."""
    from functools import partial as _partial

    from ..stages.apply_arrow import read_changelog_parts

    parts = _lake_parts(lake_dir)
    return ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(
        _partial(read_changelog_parts, lake_dir=lake_dir, lo=lo, hi=hi),
        batch_format="pyarrow",
    )


def lake_diff(
    lake_dir: str,
    lo: int,
    hi: int,
    *,
    key_cols: Optional[list[str]] = None,
    sha_col: str = "content_sha256",
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
) -> ray.data.Dataset:
    """Semantic diff between two snapshots: per-key net change from the
    state AS OF ``lo`` to the state AS OF ``hi``, classified INSERT /
    UPDATE / DELETE (keys whose content digest is unchanged emit no
    row). This is what a downstream sync actually wants from time
    travel — "what changed between yesterday's snapshot and now" as
    upsert/delete instructions, with intermediate churn folded away
    (a key updated five times then restored to its ``lo`` content
    disappears from the diff; the changelog keeps the churn).

    Tables without a ``sha_col`` lineage column (content-free side
    tables) are compared on a composite digest of their non-key
    columns cast to string; the output column is still named
    ``sha_col`` (pass e.g. ``sha_col="digest"`` for those).
    ``final_columns`` / ``final_types`` forward to the per-partition
    asof fold for non-default table schemas.

    Scale shape: both folds are PARTITION-ALIGNED — base and delta
    files live per partition, so one task per partition folds its own
    slice at ``lo`` and at ``hi`` (ordinal filters are parquet
    row-group predicates) and diffs the two locally with vectorized
    ``index_in`` on the key — zero shuffle, output bounded by changed
    keys. Both watermarks obey ``read_asof_parts``'s exactness and
    retention contract."""
    from functools import partial as _partial

    import pyarrow.compute as pc

    from ..stages.apply_arrow import read_asof_parts

    keys = key_cols or TABLE_CONFIGS[("app", "repos")]["keys"]
    key_types = final_types or TABLE_CONFIGS[("app", "repos")]["types"]

    def _arr(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def _composite(t: pa.Table):
        parts = [_arr(t[k]) for k in keys]
        if len(parts) == 1:
            return parts[0]
        return pc.binary_join_element_wise(*parts, "\x00")

    def _digest(t: pa.Table):
        """Per-row comparison digest: the sha lineage column when the
        table maintains one, else a composite of non-key columns."""
        if sha_col in t.column_names:
            return pc.cast(_arr(t[sha_col]), pa.string())
        payload = sorted(c for c in t.column_names if c not in keys)
        if not payload:
            return pa.nulls(t.num_rows, pa.string())
        arrs = [pc.cast(_arr(t[c]), pa.string()) for c in payload]
        if len(arrs) == 1:
            return pc.fill_null(arrs[0], "\x00null")
        return pc.binary_join_element_wise(
            *arrs, "\x01", null_handling="replace", null_replacement="\x00null"
        )

    empty = pa.table(
        {
            **{k: pa.array([], key_types.get(k, pa.string())) for k in keys},
            "change": pa.array([], pa.string()),
            sha_col: pa.array([], pa.string()),
        }
    )

    def diff_part(batch: pa.Table) -> pa.Table:
        lo_t = read_asof_parts(
            batch, lake_dir=lake_dir, watermark=lo,
            key_cols=keys, final_columns=final_columns, final_types=final_types,
        )
        hi_t = read_asof_parts(
            batch, lake_dir=lake_dir, watermark=hi,
            key_cols=keys, final_columns=final_columns, final_types=final_types,
        )
        if not lo_t.num_rows and not hi_t.num_rows:
            return empty

        def out(t: pa.Table, change: str, shas) -> pa.Table:
            return pa.table(
                {
                    **{k: t[k] for k in keys},
                    "change": pa.array([change] * t.num_rows, pa.string()),
                    sha_col: shas,
                }
            )

        if not lo_t.num_rows:
            return out(hi_t, "INSERT", _digest(hi_t))
        if not hi_t.num_rows:
            return out(lo_t, "DELETE", pa.nulls(lo_t.num_rows, pa.string()))
        lo_k, hi_k = _composite(lo_t), _composite(hi_t)
        pos_hi = pc.index_in(hi_k, value_set=lo_k)  # hi row → its lo row
        pos_lo = pc.index_in(lo_k, value_set=hi_k)  # lo row → its hi row
        ins = hi_t.filter(pc.is_null(pos_hi))
        dels = lo_t.filter(pc.is_null(pos_lo))
        matched_mask = pc.is_valid(pos_hi)
        both_hi = hi_t.filter(matched_mask)
        lo_dig = pc.take(_digest(lo_t), pc.filter(pos_hi, matched_mask))
        hi_dig = pc.filter(_digest(hi_t), matched_mask)
        upd = both_hi.filter(pc.not_equal(hi_dig, lo_dig))
        return pa.concat_tables(
            [
                out(ins, "INSERT", _digest(ins)),
                out(upd, "UPDATE", _digest(upd)),
                out(dels, "DELETE", pa.nulls(dels.num_rows, pa.string())),
            ]
        )

    parts = _lake_parts(lake_dir)
    return ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(_partial(diff_part), batch_format="pyarrow")


def lake_history(
    lake_dir: str,
    *,
    key_cols: Optional[list[str]] = None,
    version_col: str = "commit",
    with_lineage: bool = False,
) -> ray.data.Dataset:
    """SCD-type-2 history materialization: every version a key ever had
    as an interval row ``(keys…, version_col, valid_from, valid_to)`` —
    ``valid_from`` is the ordinal that created the version (the
    compaction horizon, −1 on an uncompacted lake, for rows already in
    the base), ``valid_to`` the ordinal of the change that superseded
    it (a later version or a DELETE), NULL while current. The classic
    warehouse "history table" derived straight from the lake's own
    delta log — no second CDC consumer needed.

    Scale shape: partition-aligned like the asof/changelog reads — one
    task per partition reads its own base + delta files, lexsorts by
    (key…, ordinal) once, and computes ``valid_to`` with a vectorized
    next-row shift; DELETE rows close the preceding interval and emit
    nothing. Zero shuffle; output bounded by total retained versions.
    History below a partition's compaction horizon is folded into its
    base row (the retention limit every delta lake has).

    ``with_lineage=True`` appends ``prev_<version_col>`` /
    ``prev_valid_from``: the version each row superseded, computed in
    the SAME per-partition pass (so a key's chain can never straddle a
    downstream batch boundary). A delete gap breaks lineage — a
    reinserted generation superseded nothing and gets NULLs."""
    import glob as _glob
    from functools import partial as _partial

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from ..state.manifest import list_delta_files, partition_dir, read_manifest

    keys = key_cols or TABLE_CONFIGS[("app", "repos")]["keys"]

    def empty() -> pa.Table:
        cols = {k: pa.array([], pa.string()) for k in keys}
        cols[version_col] = pa.array([], pa.string())
        cols["valid_from"] = pa.array([], pa.int64())
        cols["valid_to"] = pa.array([], pa.int64())
        if with_lineage:
            cols["prev_" + version_col] = pa.array([], pa.string())
            cols["prev_valid_from"] = pa.array([], pa.int64())
        return pa.table(cols)

    def history_part(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["part"].to_pylist():
            p = int(p)
            manifest = read_manifest(lake_dir, p)
            compacted_through = int((manifest or {}).get("compacted_through", -1))
            pieces = []
            files = sorted(_glob.glob(partition_dir(lake_dir, p) + "/*.parquet"))
            base_files = [
                f for f in files if not os.path.basename(f).startswith("delta-")
            ]
            for f in base_files:
                t = _pq.read_table(f, columns=keys + [version_col])
                if t.num_rows:
                    pieces.append(
                        pa.table(
                            {
                                **{k: t[k] for k in keys},
                                version_col: pc.cast(t[version_col], pa.string()),
                                "ordinal": pa.array(
                                    np.full(t.num_rows, compacted_through, np.int64)
                                ),
                                "dml": pa.array(["BASE"] * t.num_rows, pa.string()),
                            }
                        )
                    )
            for f in list_delta_files(lake_dir, p, compacted_through):
                t = _pq.read_table(f, columns=keys + [version_col, "ordinal", "dml"])
                if t.num_rows:
                    pieces.append(
                        pa.table(
                            {
                                **{k: t[k] for k in keys},
                                version_col: pc.cast(t[version_col], pa.string()),
                                "ordinal": pc.cast(t["ordinal"], pa.int64()),
                                "dml": t["dml"],
                            }
                        )
                    )
            if not pieces:
                continue
            t = pa.concat_tables(pieces).combine_chunks()
            idx = pc.sort_indices(
                t,
                sort_keys=[(k, "ascending") for k in keys] + [("ordinal", "ascending")],
            )
            t = t.take(idx)
            comp = t[keys[0]].combine_chunks() if isinstance(t[keys[0]], pa.ChunkedArray) else t[keys[0]]
            if len(keys) > 1:
                comp = pc.binary_join_element_wise(
                    *[t[k].combine_chunks() if isinstance(t[k], pa.ChunkedArray) else t[k] for k in keys],
                    "\x00",
                )
            kb = comp.to_numpy(zero_copy_only=False)
            ords = t["ordinal"].to_numpy(zero_copy_only=False)
            same_next = np.empty(len(kb), dtype=bool)
            same_next[:-1] = kb[1:] == kb[:-1]
            same_next[-1] = False
            valid_to = np.where(same_next, np.roll(ords, -1), -1)
            keep = pc.not_equal(t["dml"], pa.scalar("DELETE")).to_numpy(
                zero_copy_only=False
            )
            cols = {k: t[k].filter(pa.array(keep)) for k in keys}
            cols[version_col] = t[version_col].filter(pa.array(keep))
            cols["valid_from"] = pa.array(ords[keep], pa.int64())
            vt = valid_to[keep]
            cols["valid_to"] = pa.array(vt, pa.int64(), mask=vt < 0)
            if with_lineage:
                # predecessor within the kept chain (same key AND
                # contiguous — a delete gap breaks lineage: the next
                # generation superseded nothing). Computed here, in the
                # per-partition task, so a key's rows can never straddle
                # a downstream batch boundary.
                kb_k = kb[keep]
                vf_k = ords[keep]
                ver_np = (
                    cols[version_col].combine_chunks()
                    if isinstance(cols[version_col], pa.ChunkedArray)
                    else cols[version_col]
                ).to_numpy(zero_copy_only=False)
                n_k = len(kb_k)
                prev_ok = np.zeros(n_k, dtype=bool)
                if n_k > 1:
                    prev_ok[1:] = (kb_k[1:] == kb_k[:-1]) & (vt[:-1] == vf_k[1:])
                prev_ver = np.roll(ver_np, 1)
                prev_vf = np.roll(vf_k, 1)
                cols["prev_" + version_col] = pa.array(
                    prev_ver, pa.string(), mask=~prev_ok
                )
                cols["prev_valid_from"] = pa.array(
                    prev_vf, pa.int64(), mask=~prev_ok
                )
            outs.append(pa.table(cols))
        if not outs:
            return empty()
        return pa.concat_tables(outs)

    parts = _lake_parts(lake_dir)
    return ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(_partial(history_part), batch_format="pyarrow")


def snapshot_points(lake_dir: str) -> list[int]:
    """The lake's valid time-travel boundaries: every live delta
    commit's watermark (ascending, deduplicated across partitions).
    ``read_lake_asof`` at any of these is exact. Driver-side directory
    walk over the manifests/partition dirs — O(#files), no data read."""
    import glob

    from ..state.manifest import delta_watermark_of, partition_dir, read_manifest

    points = set()
    for p in _lake_parts(lake_dir):
        manifest = read_manifest(lake_dir, p)
        compacted_through = int((manifest or {}).get("compacted_through", -1))
        for f in glob.glob(os.path.join(partition_dir(lake_dir, p), "delta-*.parquet")):
            w = delta_watermark_of(f)
            if w > compacted_through:
                points.add(w)
    return sorted(points)


def follow_changelog(
    lake_dir: str,
    from_watermark: int = -1,
    *,
    poll_interval: float = 0.2,
    until: Optional[int] = None,
    timeout: Optional[float] = None,
):
    """Live CDC-out follower over a delta-sink lake: a generator that
    tails the lake's commit frontier (``state.manifest.read_frontier``,
    published by ``run_ingest`` once per fully-committed wave) and
    yields ``(lo, hi, Dataset)`` for each new window — the retained
    change rows with ``lo < ordinal <= hi``, complete across every
    partition. This is the downstream-consumer surface: re-apply each
    window in order and you reconstruct the lake.

    The frontier — not the per-partition manifests — is the completeness
    guarantee: partitions commit independently within a wave, so a
    follower reading manifests directly could advance past a partition
    whose commit is still in flight and silently drop its changes.

    Retention: run compaction with ``retain_after <= `` the follower's
    cursor. A compaction that overruns the cursor surfaces as
    ``SnapshotUnavailable`` on the window's first read — loud, never
    silent loss.

    Terminates when ``until`` is reached (cursor >= until) or after
    ``timeout`` seconds without progress; with neither, follows forever.
    """
    import time as _time

    from ..state.manifest import read_frontier

    cursor = int(from_watermark)
    deadline = (_time.monotonic() + timeout) if timeout is not None else None
    while True:
        frontier = read_frontier(lake_dir)
        if frontier > cursor:
            yield cursor, frontier, read_lake_changelog(lake_dir, lo=cursor, hi=frontier)
            cursor = frontier
            if deadline is not None:
                deadline = _time.monotonic() + timeout  # progress resets the idle clock
        if until is not None and cursor >= until:
            return
        if frontier <= cursor:
            if deadline is not None and _time.monotonic() >= deadline:
                return
            _time.sleep(poll_interval)


def verify_lake(lake_dir: str) -> list[dict]:
    """Distributed lineage-integrity audit: one task per partition
    recomputes the state digest + row count from the on-disk base and
    compares them to the committed manifest (north-rule lineage: the
    manifest sha chain is only useful if it can be re-checked). Returns
    one {part, ok, detail} row per partition."""
    from functools import partial as _partial

    from ..stages.apply_arrow import verify_parts

    parts = _lake_parts(lake_dir)
    if not parts:
        return []
    return (
        ray.data.from_items(
            [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
        )
        .map_batches(_partial(verify_parts, lake_dir=lake_dir), batch_format="pyarrow")
        .take_all()
    )


def compact_lake(
    lake_dir: str,
    *,
    key_cols: Optional[list[str]] = None,
    final_columns: Optional[list[str]] = None,
    final_types: Optional[dict] = None,
    retain_after: Optional[int] = None,
) -> list[dict]:
    """Distributed compaction job: fold every partition's delta files
    back into single-file bases (one task per partition, atomic per
    partition, idempotent — partitions without live deltas are
    skipped). Run it on whatever cadence bounds read amplification.
    Key columns default to each partition's OWN manifest metadata, so
    this works on any lake namespace without a table config (the CLI
    ``compact`` mode).

    ``retain_after``: retention horizon — fold only delta windows with
    watermark ``<= retain_after`` into the base and keep later ones
    live, so ``read_lake_asof``/``read_lake_changelog`` above the
    horizon keep working (the shape every production delta lake runs:
    compaction bounded by the time-travel retention policy). Partitions
    with retained windows stay delta commits (sha sealed at the next
    full compaction)."""
    from functools import partial as _partial

    from ..stages.apply_arrow import compact_parts

    parts = _lake_parts(lake_dir)
    if not parts:
        return []
    summaries = ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(
        _partial(
            compact_parts,
            lake_dir=lake_dir,
            key_cols=key_cols,
            final_columns=final_columns,
            final_types=final_types,
            retain_after=retain_after,
        ),
        batch_format="pyarrow",
    )
    return summaries.take_all()  # small: one row per partition
