"""Query-level API: one function per operator/pipeline, each taking an
``sf_dir`` and returning a Dataset / DataFrame / Arrow table.

These are the entries exposed through ``__ray_entry__.queries()`` and
cross-checked against ``oracle_sql()`` by the driver at sf0.01. CDC
queries run over binlog segments synthesized deterministically from
``documents.parquet`` (fixtures.change_stream), so DuckDB can recompute
the same results closed-form. Ray is assumed to be initialised by the
caller.
"""

from __future__ import annotations

import os
import tempfile
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .fixtures.change_stream import WAVE, materialize
from .functions.ann import BruteForceTopK, LshBucketer, list_col_to_matrix, merge_topk
from .functions.dedup import (
    GramSetter,
    MinHasher,
    SimHasher,
    add_content_hash,
    jaccard_from_sets,
)
from .functions.multimodal import DecodeStub, payload_stats, text_to_media_batch
from .functions.text import LanguageId, QualityScorer, add_fingerprint, token_count_batch
from .pipelines.ingest import (
    FINAL_COLUMNS,
    apply_changes,
    decode_envelope,
    decode_typed,
    init_lake,
    read_segments,
)

WORK_DIR = os.environ.get("GRAFT_WORK_DIR", os.path.join(tempfile.gettempdir(), "graft_cdc_work"))


def _fixtures(sf_dir: str, replicate: int = 1, rows_per_event: int = 200, num_segments: int = 4) -> dict:
    os.makedirs(WORK_DIR, exist_ok=True)
    return materialize(sf_dir, WORK_DIR, num_segments=num_segments, rows_per_event=rows_per_event, replicate=replicate)


def _fresh_lake(fx: dict, num_partitions: int) -> str:
    """Hash-partitioned base lake for this fixture set (cached)."""
    lake_dir = os.path.join(fx["root"], f"base_lake_p{num_partitions}")
    done = os.path.join(lake_dir, "_LAKE_DONE")
    if not os.path.exists(done):
        init_lake(pq.read_table(fx["base_lake"]), lake_dir, num_partitions)
        with open(done, "w") as f:
            f.write("ok")
    return lake_dir


# --------------------------------------------------------------------------
# CDC queries (SURVEY.md §2 operators, SQL-checked)
# --------------------------------------------------------------------------


def lake_upsert_lww(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Flagship: decode segments → LWW upsert apply over the base lake."""
    fx = _fixtures(sf_dir)
    lake_dir = _fresh_lake(fx, num_partitions)
    changes = decode_typed(read_segments(fx["segment_paths"]), concurrency=concurrency)
    return apply_changes(
        changes, lake_dir=lake_dir, num_partitions=num_partitions, final_columns=FINAL_COLUMNS
    )


def _multi_lake(sf_dir: str, num_partitions: int, concurrency=None) -> str:
    """Namespaced multi-table lake for this fixture set: repos base
    snapshot + ONE multi-table ingest pass (decode once, apply every
    registered table). Re-invocations replay the same stream and the
    per-(table, partition) watermark manifests make that a no-op — so
    both multi queries share one ingest regardless of call order."""
    from .pipelines.ingest import run_ingest_multi

    fx = _fixtures(sf_dir)
    lake_root = os.path.join(fx["root"], f"multi_lake_p{num_partitions}")
    done = os.path.join(lake_root, "_BASE_DONE")
    if not os.path.exists(done):
        init_lake(pq.read_table(fx["base_lake"]), os.path.join(lake_root, "app.repos"), num_partitions)
        with open(done, "w") as f:
            f.write("ok")
    run_ingest_multi(
        fx["segment_paths"], lake_root, num_partitions=num_partitions, concurrency=concurrency
    )
    return lake_root


def lake_upsert_lww_multi(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Multi-table typed ingest (round-4 headline): ONE decode pass over
    the segments emits typed change streams for BOTH fixture tables
    (app.repos + metrics.counters), each applied into its own lake
    namespace with its own keys/schema/watermarks. Returns the repos
    namespace's final state — the oracle is the same closed-form LWW
    SQL as the single-table flagship, so routing rows to the wrong
    table, losing a table, or cross-table watermark interference all
    fail the value check."""
    from .pipelines.ingest import read_lake

    root = _multi_lake(sf_dir, num_partitions, concurrency)
    return read_lake(os.path.join(root, "app.repos")).map_batches(
        lambda t: t.select(FINAL_COLUMNS).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def lake_counters_multi(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """The second table out of the SAME one-pass multi-table ingest
    (shares the lake with lake_upsert_lww_multi): metrics.counters
    final state, keyed on ``id`` — single-column int primary key, no
    content column, no base snapshot."""
    from .pipelines.ingest import read_lake

    root = _multi_lake(sf_dir, num_partitions, concurrency)
    return read_lake(os.path.join(root, "metrics.counters")).map_batches(
        lambda t: t.select(["id", "val"]).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def lake_upsert_lww_delta(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Delta-sink ingest + fold-on-read (round-4 write-amplification
    refinement): the stream replays as THREE sequential waves, each
    appended as per-partition delta files (no base rewrite), and the
    final state is read with the delta-aware fold — value-checked
    against the same closed-form LWW oracle as the rewrite-sink
    flagship, so the associative-fold machinery (delta commit,
    compacted_through bookkeeping, fold-on-read) is in the driver's
    correctness gate."""
    import shutil

    from .pipelines.ingest import read_lake_state, run_ingest

    fx = _fixtures(sf_dir)
    lake_dir = os.path.join(fx["root"], f"delta_lake_p{num_partitions}")
    done = os.path.join(lake_dir, "_DELTA_DONE")
    if not os.path.exists(done):
        shutil.rmtree(lake_dir, ignore_errors=True)
        init_lake(pq.read_table(fx["base_lake"]), lake_dir, num_partitions)
        segs = fx["segment_paths"]
        waves = [segs[:1], segs[1:2], segs[2:]]
        for w in waves:
            if w:
                run_ingest(w, lake_dir, num_partitions=num_partitions, concurrency=concurrency, sink="delta")
        with open(done, "w") as f:
            f.write("ok")
    return read_lake_state(lake_dir).map_batches(
        lambda t: t.select(FINAL_COLUMNS).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def _asof_lake(sf_dir: str, num_partitions: int = 16, concurrency=None) -> str:
    """Delta lake whose commit windows align with the fixture's DML
    waves (one ``run_ingest`` pass per wave boundary via the ordinal
    pushdown): wave 1+2, wave 3, wave 4 — so every delta window holds
    at most one change per key and both the AS-OF and changelog reads
    are exact at every window. The manifest watermark makes each later
    pass skip what earlier passes committed, so replays are no-ops."""
    import shutil

    from .pipelines.ingest import run_ingest

    fx = _fixtures(sf_dir)
    lake_dir = os.path.join(fx["root"], f"asof_lake_p{num_partitions}")
    done = os.path.join(lake_dir, "_ASOF_DONE")
    if not os.path.exists(done):
        shutil.rmtree(lake_dir, ignore_errors=True)
        init_lake(pq.read_table(fx["base_lake"]), lake_dir, num_partitions)
        segs = fx["segment_paths"]
        for cutoff in (3 * WAVE - 1, 4 * WAVE - 1, None):
            run_ingest(
                segs,
                lake_dir,
                num_partitions=num_partitions,
                concurrency=concurrency,
                sink="delta",
                max_ordinal=cutoff,
            )
        with open(done, "w") as f:
            f.write("ok")
    return lake_dir


def lake_snapshot_asof(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Point-in-time (time-travel) lake read: the repos table AS OF the
    wave-2 boundary — before the schema-evolution wave added ``stars``
    and before the delete wave — reconstructed from base + delta
    history with the ordinal-bounded fold (``read_lake_asof``). The
    oracle recomputes that intermediate state closed-form, so reading
    one wave too many (v3 content / stars present), one too few (no v2
    rows), or leaking the deletes all fail the value check."""
    from .pipelines.ingest import read_lake_asof

    lake_dir = _asof_lake(sf_dir, num_partitions, concurrency)
    return read_lake_asof(lake_dir, 3 * WAVE - 1).map_batches(
        lambda t: t.select(FINAL_COLUMNS).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def lake_changelog_tail(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """CDC-out: the retained change feed AFTER the wave-2 boundary —
    wave-3 updates + wave-4 deletes — read from the delta history
    (``read_lake_changelog``), as (repo, path, dml) rows a downstream
    consumer would re-apply. Keys hit by both waves must appear twice
    (window-aligned commits retain both changes); emitting only the
    final survivor, or folding deletes away, fails the row count."""
    from .pipelines.ingest import read_lake_changelog

    lake_dir = _asof_lake(sf_dir, num_partitions, concurrency)
    empty = pa.table({c: pa.array([], pa.string()) for c in ("repo", "path", "dml")})

    def project(t: pa.Table) -> pa.Table:
        if not t.num_rows:  # partition with no changes in the window
            return empty
        return t.select(["repo", "path", "dml"]).replace_schema_metadata(None)

    return read_lake_changelog(lake_dir, lo=3 * WAVE - 1).map_batches(
        project, batch_format="pyarrow"
    )


def lake_snapshot_diff(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Semantic snapshot-to-snapshot diff: the net per-key change from
    the pre-wave base snapshot to the final state, classified
    INSERT / UPDATE / DELETE with the final content digest (NULL on
    deletes) — "what changed between these two points" as upsert/delete
    instructions with intermediate churn folded away (``pipelines.
    ingest.lake_diff``; the changelog keeps the churn). Zero shuffle:
    base and delta files are partition-aligned, so each partition folds
    both snapshots locally and diffs them with vectorized ``index_in``.
    The oracle classifies the fixture's key space closed-form: %4
    inserts surviving the %5 deletes, %3 content updates, %5 deletes of
    pre-existing keys — a diff that leaks unchanged keys, misclassifies
    an insert-then-delete, or reports churn a restore cancelled fails
    the value check."""
    from .pipelines.ingest import lake_diff

    lake_dir = _asof_lake(sf_dir, num_partitions, concurrency)
    return lake_diff(lake_dir, WAVE - 1, 5 * WAVE)


def lake_history_scd2(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """SCD-type-2 history table from the delta lake's own log
    (``pipelines.ingest.lake_history``): one interval row per version a
    key ever had, with validity boundaries reported in commit-WAVE
    units (each fixture wave touches a key at most once, so wave units
    are exact and the oracle recomputes the whole chain closed-form:
    base v1 from wave 0, %4 inserts from wave 1, %3→v2 from wave 2,
    %9→v3 from wave 3, %5 deletes closing at wave 4; open intervals are
    NULL). Emitting delete rows, missing the base generation, or
    mis-ordering a key's chain all fail the value check."""
    import pyarrow.compute as pc

    from .pipelines.ingest import lake_history

    lake_dir = _asof_lake(sf_dir, num_partitions, concurrency)

    def to_waves(t: pa.Table) -> pa.Table:
        vf = t["valid_from"].to_numpy(zero_copy_only=False)
        vf_w = np.where(vf < 0, 0, vf // WAVE).astype(np.int64)
        vt = t["valid_to"]
        if isinstance(vt, pa.ChunkedArray):
            vt = vt.combine_chunks()
        vt_w = pc.if_else(
            pc.is_valid(vt),
            pc.divide(pc.cast(vt, pa.int64()), pa.scalar(WAVE, pa.int64())),
            pa.scalar(None, pa.int64()),
        )
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "valid_from_wave": pa.array(vf_w, pa.int64()),
                "valid_to_wave": vt_w,
            }
        )

    return lake_history(lake_dir).map_batches(to_waves, batch_format="pyarrow")


def lake_version_lineage(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Version lineage from the SCD2 history: every retained version
    with the commit it SUPERSEDED and how long (in commit waves) that
    predecessor lived — the audit question "what replaced what, and how
    stale was it" answered straight from the lake's delta log.
    Zero-shuffle: lineage is computed inside the same per-partition
    history pass (``lake_history(with_lineage=True)``), so a key's
    chain never straddles a batch boundary. First generations (base
    rows, fresh inserts) have NULL predecessors; the oracle recomputes
    the chains with ``lag()`` under the same wave-1+2 window-collapse
    rule as ``lake_history_scd2``."""
    import pyarrow.compute as pc

    from .pipelines.ingest import lake_history

    lake_dir = _asof_lake(sf_dir, num_partitions, concurrency)

    def to_waves(t: pa.Table) -> pa.Table:
        vf = t["valid_from"].to_numpy(zero_copy_only=False)
        vf_w = np.where(vf < 0, 0, vf // WAVE).astype(np.int64)
        pvf = t["prev_valid_from"]
        if isinstance(pvf, pa.ChunkedArray):
            pvf = pvf.combine_chunks()
        pvf_w = pc.if_else(
            pc.is_valid(pvf),
            pc.max_element_wise(
                pc.divide(pc.cast(pvf, pa.int64()), pa.scalar(WAVE, pa.int64())),
                pa.scalar(0, pa.int64()),
            ),
            pa.scalar(None, pa.int64()),
        )
        lifetime = pc.subtract(pa.array(vf_w, pa.int64()), pvf_w)
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "prev_commit": t["prev_commit"],
                "prev_lifetime_waves": lifetime,
            }
        )

    return lake_history(lake_dir, with_lineage=True).map_batches(
        to_waves, batch_format="pyarrow"
    )


def lake_changelog_follow(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Live CDC-out follower end-to-end: three ingest waves land in a
    fresh delta lake, each publishing the lake-level commit frontier;
    ``follow_changelog`` yields one contiguous ``(lo, hi]`` window per
    frontier advance, and the result is every window's retained change
    rows tagged with its window number. The oracle recomputes the
    per-window survivors closed-form — waves 1+2 share a commit window,
    so a key inserted (%4) AND updated (%3) there retains only the
    UPDATE (per-window LWW), while the %9 updates and %5 deletes arrive
    as their own windows. Missing a window, double-reading one, or
    leaking a later wave into an earlier window all fail the check."""
    import shutil
    import tempfile

    from .pipelines.ingest import follow_changelog, run_ingest

    fx = _fixtures(sf_dir)
    work = tempfile.mkdtemp(prefix="follow_lake_")
    try:
        lake = os.path.join(work, "lake")
        init_lake(pq.read_table(fx["base_lake"]), lake, num_partitions)
        gen = follow_changelog(lake, poll_interval=0.05, until=4 * WAVE, timeout=60)
        outs = []
        for win_no, cutoff in enumerate((3 * WAVE - 1, 4 * WAVE - 1, None), start=1):
            run_ingest(
                fx["segment_paths"],
                lake,
                num_partitions=num_partitions,
                concurrency=concurrency,
                sink="delta",
                max_ordinal=cutoff,
            )
            _lo, _hi, ds = next(gen)
            # windows are small (change rows only) — materialize per block
            for blk in ray.get(ds.to_arrow_refs()):
                if blk.num_rows:
                    outs.append(
                        blk.select(["repo", "path", "dml"]).append_column(
                            "window_no", pa.array([win_no] * blk.num_rows, pa.int64())
                        )
                    )
        return pa.concat_tables(outs).replace_schema_metadata(None)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def lake_replicate_follow(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """CDC replication loop, closed end-to-end: a SOURCE delta lake
    ingests three waves (each publishing the commit frontier); a
    follower tails the frontier and re-applies every complete ``(lo,
    hi]`` window, in order, onto an independent REPLICA lake through
    the same LWW upsert path. Returns the replica's final state, which
    must equal the flagship oracle value-for-value — a dropped window,
    an out-of-order apply, or a frontier published before every
    partition committed all surface as missing or stale rows."""
    import shutil
    import tempfile

    from .pipelines.ingest import (
        apply_changes,
        follow_changelog,
        read_lake_state,
        run_ingest,
    )

    fx = _fixtures(sf_dir)
    work = tempfile.mkdtemp(prefix="replica_lake_")
    try:
        src = os.path.join(work, "src")
        rep = os.path.join(work, "rep")
        base = pq.read_table(fx["base_lake"])
        init_lake(base, src, num_partitions)
        init_lake(base, rep, num_partitions)
        gen = follow_changelog(src, poll_interval=0.05, until=4 * WAVE, timeout=60)
        for cutoff in (3 * WAVE - 1, 4 * WAVE - 1, None):
            run_ingest(
                fx["segment_paths"],
                src,
                num_partitions=num_partitions,
                concurrency=concurrency,
                sink="delta",
                max_ordinal=cutoff,
            )
            _lo, _hi, ds = next(gen)
            blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
            if not blocks:
                continue
            win = pa.concat_tables(blocks, promote_options="permissive")
            apply_changes(
                ray.data.from_arrow(win),
                lake_dir=rep,
                num_partitions=num_partitions,
                write=True,
            ).materialize()
        # materialize the replica state before the tempdir is removed
        state = pa.concat_tables(
            [b for b in ray.get(read_lake_state(rep).to_arrow_refs()) if b.num_rows],
            promote_options="permissive",
        )
        return state.select(FINAL_COLUMNS).replace_schema_metadata(None)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def lake_upsert_lww_streaming(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Pipelined streaming ingest (round-5): segments feed a
    StreamingIngestor one at a time — each decode+stage task launches
    on submit, apply waves cover contiguous staged prefixes as raw
    tasks, the final wave folds to base form. Value-checked against the
    same closed-form LWW oracle as the batch flagship, so the
    stage-on-close / windowed-watermark machinery is in the driver's
    correctness gate (pipelines/streaming.py)."""
    from .pipelines.ingest import read_lake
    from .pipelines.streaming import StreamingIngestor

    fx = _fixtures(sf_dir)
    lake_dir = os.path.join(fx["root"], f"stream_query_lake_p{num_partitions}")
    done = os.path.join(lake_dir, "_STREAM_DONE")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(lake_dir, ignore_errors=True)
        init_lake(pq.read_table(fx["base_lake"]), lake_dir, num_partitions)
        ing = StreamingIngestor(lake_dir, num_partitions=num_partitions, sink="delta")
        for p in fx["segment_paths"]:
            ing.submit(p)
            ing.poll()
        ing.drain()
        with open(done, "w") as f:
            f.write("ok")
    return read_lake(lake_dir).map_batches(
        lambda t: t.select(FINAL_COLUMNS).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def lake_counters_multi_streaming(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """MULTI-table pipelined streaming ingest (round-5): the segments
    feed ONE StreamingIngestor in ``tables=`` mode — each stage-on-close
    decode task emits BOTH fixture tables' typed streams into namespaced
    per-segment staging, and apply waves commit each ``(table, part)``
    with its own keys/schema/watermarks. Returns the SECOND table's
    (metrics.counters) final state, value-checked against the same
    closed-form oracle as the batch multi-table ingest — so routing rows
    to the wrong namespace live, losing the side table in a wave window,
    or cross-table watermark interference all fail the driver's gate.
    (The repos namespace of this same lake is covered by the batch-multi
    and single-table-streaming LWW oracles.)"""
    from .pipelines.ingest import read_lake
    from .pipelines.streaming import StreamingIngestor

    fx = _fixtures(sf_dir)
    lake_root = os.path.join(fx["root"], f"stream_multi_lake_p{num_partitions}")
    done = os.path.join(lake_root, "_STREAM_MULTI_DONE")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(lake_root, ignore_errors=True)
        init_lake(
            pq.read_table(fx["base_lake"]), os.path.join(lake_root, "app.repos"), num_partitions
        )
        ing = StreamingIngestor(
            lake_root,
            num_partitions=num_partitions,
            sink="delta",
            tables=[("app", "repos"), ("metrics", "counters")],
        )
        for p in fx["segment_paths"]:
            ing.submit(p)
            ing.poll()
        ing.drain()
        with open(done, "w") as f:
            f.write("ok")
    return read_lake(os.path.join(lake_root, "metrics.counters")).map_batches(
        lambda t: t.select(["id", "val"]).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def changes_count_by_dml(sf_dir: str, *, concurrency=None):
    fx = _fixtures(sf_dir)
    ds = decode_envelope(read_segments(fx["segment_paths"]), concurrency=concurrency)
    return ds.groupby(["database", "table_name", "dml_type"]).aggregate(Count(alias_name="n"))


def table_filter_app_only(sf_dir: str, *, concurrency=None):
    """Include-filter ``app.*`` applied at TABLE_MAP time inside decode."""
    fx = _fixtures(sf_dir)
    ds = decode_envelope(read_segments(fx["segment_paths"]), include=["app.*"], concurrency=concurrency)
    return ds.groupby(["table_name", "dml_type"]).aggregate(Count(alias_name="n"))


def ordinal_range_waves12(sf_dir: str, *, concurrency=None):
    """Position-range predicate: stop at the wave-2/3 boundary."""
    fx = _fixtures(sf_dir)
    ds = decode_envelope(
        read_segments(fx["segment_paths"]), max_ordinal=3 * WAVE - 1, concurrency=concurrency
    )
    return ds.groupby("dml_type").aggregate(Count(alias_name="n"))


def envelope_counters_inserts(sf_dir: str, *, concurrency=None):
    """Envelope JSON row images for the metrics.counters table."""
    fx = _fixtures(sf_dir)
    ds = decode_envelope(
        read_segments(fx["segment_paths"]), include=["metrics.counters"], concurrency=concurrency
    )
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["dml_type"], "INSERT")).select(
            ["database", "table_name", "after_values"]
        ),
        batch_format="pyarrow",
    )
    return ds


# --------------------------------------------------------------------------
# Training-data operators over documents / embeddings (SQL-checked)
# --------------------------------------------------------------------------



def _task_stage(cls, **kwargs):
    """Stateless-task form of a callable-class stage: construct per
    batch on warm pooled workers. Right when the per-actor state is
    trivial to rebuild (hash constants, tiny caches) — tasks interleave
    with upstream reads and skip actor-pool ramp-up, measured ~2x on
    small/medium inputs. Heavy-state stages (media decoders, models)
    stay actor pools."""

    def fn(batch):
        return cls(**kwargs)(batch)

    fn.__name__ = cls.__name__
    return fn


def _read_parquet(path: str, columns=None):
    """``ray.data.read_parquet`` with hashable (metadata-free) schemas.

    Parquet written via pandas embeds a ``b'pandas'`` schema-metadata
    blob; a schema carrying it is UNHASHABLE (``hash(schema)`` raises
    on the inner dict), which defeats Ray's schema-deduplication fast
    path in block concat and spams 'Failed to hash the schemas'
    warnings from every read/reduce worker. Passing an explicit
    stripped schema (pruned to ``columns``, in request order — read
    batches follow the projection order) fixes the blocks at the
    source — inside the read task itself.

    Also right-sizes the block count: Ray's default read parallelism
    (~200) hands a fixture-scale table out as hundreds of KB-sized
    blocks, and every downstream stage then pays per-block scheduling
    + sort overhead that dwarfs the work (measured 1.7× on the minhash
    pipeline). Rule: ``max(ceil(uncompressed/32MB), cluster CPUs)``
    capped at one row per block — at 100 TB the bytes term dominates
    (32 MB blocks), at test scale it degenerates to one block per
    core."""
    pf = pq.ParquetFile(path)
    full = pf.schema_arrow.remove_metadata()
    schema = pa.schema([full.field(n) for n in columns]) if columns is not None else full
    meta = pf.metadata
    est_bytes = sum(meta.row_group(i).total_byte_size for i in range(meta.num_row_groups))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    blocks = max(est_bytes // (32 << 20) + 1, cpus)
    blocks = max(1, min(blocks, meta.num_rows or 1))
    return ray.data.read_parquet(
        path, columns=columns, schema=schema, override_num_blocks=blocks
    )


def _docs_ds(sf_dir: str, columns=None):
    return _read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def lake_reconcile_diff(sf_dir: str, *, num_parts: int = 16, num_partitions: int = 16):
    """Replication reconciliation / drift detection — the operational
    check a CDC deployment runs between a source snapshot and the
    replayed lake: a per-key full-outer compare emitting the drift set
    (``added`` keys only in the replayed state, ``removed`` keys only
    in the snapshot, ``changed`` keys whose content differs; unchanged
    keys are omitted so the output is bounded by drift, not lake size).

    Scale shape: both states meet in ONE key-hash co-partition exchange
    shipping (repo, path, content_sha256) triples — the sha LINEAGE
    column both states already maintain stands in for the content, so
    the document bodies never leave their partitions (at 100 TB the
    content-carrying variant would shuffle the whole corpus twice);
    each partition classifies every key with two vectorized
    ``index_in`` probes over the composite key and one arrow
    string-equality kernel — no sort, no pandas, no per-row Python."""
    import pyarrow.compute as pc

    from .functions.agg import hash_part

    fx = _fixtures(sf_dir)
    # the partitioned base lake (not the raw snapshot parquet): it
    # carries the stored content_sha256 lineage column
    from .pipelines.ingest import read_lake

    base = read_lake(_fresh_lake(fx, num_partitions)).map_batches(
        lambda t: t.select(["repo", "path", "content_sha256"]), batch_format="pyarrow"
    )
    final = lake_upsert_lww(sf_dir, num_partitions=num_partitions).map_batches(
        lambda t: t.select(["repo", "path", "content_sha256"]), batch_format="pyarrow"
    )

    def tag(t: pa.Table, side: int) -> pa.Table:
        out = pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "content": t["content_sha256"],  # sha stands in for content
                "side": pa.array(np.full(len(t), side, dtype=np.int8)),
            }
        )
        part = hash_part(out, ["repo", "path"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def _keys(t: pa.Table) -> pa.Array:
        k = pc.binary_join_element_wise(
            pc.cast(t["repo"], pa.binary()), pc.cast(t["path"], pa.binary()), b"\x00"
        )
        return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k

    def diff_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        b = g.filter(pa.array(side == 0))
        f = g.filter(pa.array(side == 1))
        bk, fk = _keys(b), _keys(f)
        pos_f = pc.index_in(fk, value_set=bk)  # final key → base row
        pos_b = pc.index_in(bk, value_set=fk)  # base key → final row
        added = f.filter(pc.is_null(pos_f))
        removed = b.filter(pc.is_null(pos_b))
        both_mask = pos_f.is_valid()
        fb = f.filter(both_mask)
        bmatch = b.take(pc.filter(pos_f, both_mask))
        changed = fb.filter(pc.not_equal(fb["content"], bmatch["content"]))
        out = []
        for status, t in (("added", added), ("removed", removed), ("changed", changed)):
            out.append(
                pa.table(
                    {
                        "status": pa.array([status] * len(t), pa.string()),
                        "repo": t["repo"],
                        "path": t["path"],
                    }
                )
            )
        return pa.concat_tables(out)

    both = base.map_batches(partial(tag, side=0), batch_format="pyarrow").union(
        final.map_batches(partial(tag, side=1), batch_format="pyarrow")
    )
    return both.groupby("_part").map_groups(diff_part, batch_format="pyarrow")


def lake_repo_stats_incremental(sf_dir: str, *, concurrency=None):
    """Incremental view maintenance over the CDC stream: per-repo
    (file count, content chars) maintained WITHOUT reading the final
    lake — base-snapshot aggregates plus pure stream-delta algebra:
    INSERT +1/+len(after), DELETE −1/−len(before), UPDATE
    len(after)−len(before), folded per repo with the combiner tree and
    added to the snapshot aggregate. Requires full row images (the
    binlog default; DELETE/UPDATE before-images carry the old row),
    and each event applied exactly once — both properties the engine
    already guarantees. The oracle recomputes the FINAL lake stats
    closed-form, so any drift between the view algebra and the actual
    replay (a missed delete, a double-applied update, an inconsistent
    before-image) fails the value check."""
    import json as _json

    from .functions.agg import combiner_aggregate

    fx = _fixtures(sf_dir)

    base = _read_parquet(fx["base_lake"], columns=["repo", "content"])

    def base_stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "repo": t["repo"],
                "d_files": pa.array(np.ones(len(t), dtype=np.int64)),
                "d_chars": pc.cast(pc.utf8_length(t["content"]), pa.int64()),
            }
        )

    changes = decode_envelope(
        read_segments(fx["segment_paths"]), include=["app.repos"], concurrency=concurrency
    )

    def deltas(t: pa.Table) -> pa.Table:
        loads = _json.loads
        repo_out: list[str] = []
        files_out: list[int] = []
        chars_out: list[int] = []
        for dml, bv, av in zip(
            t["dml_type"].to_pylist(),
            t["before_values"].to_pylist(),
            t["after_values"].to_pylist(),
        ):
            if dml == "INSERT":
                row = loads(av)
                repo_out.append(row["c0"])
                files_out.append(1)
                chars_out.append(len(row["c4"]))
            elif dml == "DELETE":
                row = loads(bv)
                repo_out.append(row["c0"])
                files_out.append(-1)
                chars_out.append(-len(row["c4"]))
            else:  # UPDATE: content length delta, file count unchanged
                b, a = loads(bv), loads(av)
                repo_out.append(a["c0"])
                files_out.append(0)
                chars_out.append(len(a["c4"]) - len(b["c4"]))
        return pa.table(
            {
                "repo": pa.array(repo_out, pa.string()),
                "d_files": pa.array(files_out, pa.int64()),
                "d_chars": pa.array(chars_out, pa.int64()),
            }
        )

    combined = base.map_batches(base_stats, batch_format="pyarrow").union(
        changes.map_batches(deltas, batch_format="pyarrow")
    )
    view = combiner_aggregate(
        combined,
        ["repo"],
        [("d_files", "sum", "n_files"), ("d_chars", "sum", "content_chars")],
        num_parts=16,
    )
    return view.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n_files"], 0)), batch_format="pyarrow"
    )


def dedup_exact(sf_dir: str):
    """Exact dedup: documents ∪ (shifted copy) → hash-group → keep min id.

    The text column is dropped before the groupby so the shuffle ships
    only (hash, doc_id) pairs.
    """
    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    dup = ds.map_batches(
        lambda t: t.set_column(0, "doc_id", pa.compute.add(t["doc_id"], 1_000_000)),
        batch_format="pyarrow",
    )
    both = ds.union(dup)
    hashed = both.map_batches(add_content_hash, batch_format="pyarrow").select_columns(
        ["doc_id", "content_hash"]
    )
    kept = combiner_aggregate(hashed, ["content_hash"], [("doc_id", "min", "doc_id")])
    return kept.select_columns(["doc_id"])


def token_count_by_lang(sf_dir: str):
    ds = _docs_ds(sf_dir, ["doc_id", "text", "lang"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return ds.groupby("lang").aggregate(
        Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs")
    )


def quality_stats_by_source(sf_dir: str, *, concurrency=None):
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text", "source"])
    ds = ds.map_batches(_task_stage(QualityScorer), batch_format="pyarrow")
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("q_chars", alias_name="total_chars"),
        Sum("q_tokens", alias_name="total_tokens"),
    )


def lang_distribution(sf_dir: str):
    return _docs_ds(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))


def _parquet_head(path: str, columns: list[str], n: int) -> pa.Table:
    """First ``n`` rows only — streams the leading pages of row group 0
    instead of loading the whole table on the driver (a driver OOM at
    100 TB). The embeddings table is written in vec_id order (all sf
    dirs), so the head IS the global ``ORDER BY vec_id LIMIT n``."""
    pf = pq.ParquetFile(path)
    batch = next(pf.iter_batches(batch_size=n, columns=columns))
    return pa.Table.from_batches([batch]).sort_by(columns[0])


def ann_topk_bruteforce(sf_dir: str, *, k: int = 10, num_queries: int = 5):
    """Brute-force cosine top-k: queries broadcast once via ray.put,
    per-batch float64 matmul partials, tiny driver-side merge."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _parquet_head(path, ["vec_id", "embedding"], num_queries)
    q = list_col_to_matrix(head["embedding"])
    qids = head["vec_id"].to_pylist()
    q_ref = ray.put(q)

    ds = _read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=q_ref, query_ids=qids, k=k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    )
    merged = merge_topk(partials.to_pandas(), k=k)  # ≤ (k+1)·#blocks·nq rows
    merged = merged.rename(columns={"rank": "rk"})
    return merged


def binary_payload_stats(sf_dir: str):
    """Multimodal metadata pipeline: opaque payloads → per-kind size stats."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    media = ds.map_batches(text_to_media_batch, batch_format="pyarrow")
    stats = media.map_batches(payload_stats, batch_format="pyarrow")
    return stats.groupby("kind").aggregate(
        Count(alias_name="n"), Sum("payload_bytes", alias_name="total_bytes")
    )


# --------------------------------------------------------------------------
# Non-SQL-expressible operators (rows-only driver check)
# --------------------------------------------------------------------------


def _dup_corpus(sf_dir: str):
    """documents ∪ a near-identical copy (id+1M, text + ' tail') — the
    planted ground truth the minhash oracle SQL reconstructs closed-form."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    near = ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.compute.add(t["doc_id"], 1_000_000),
                "text": pa.compute.binary_join_element_wise(t["text"], pa.scalar(" tail"), ""),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.union(near)


def _expand_bucket_pairs(t: pa.Table, max_bucket_ids: int) -> pa.Table:
    """LSH bucket id-lists → candidate pairs (a < b). Size-2 buckets —
    the common case — emit (min, max); ≥3 emit all pairs, degrading to
    star pairs through the bucket's min-id representative past
    ``max_bucket_ids`` so a degenerate bucket costs O(n), not O(n²)."""
    a_out: list[int] = []
    b_out: list[int] = []
    for ids in t["ids"].to_pylist():
        if len(ids) < 2:
            continue
        ids = sorted(ids)
        if len(ids) == 2:
            a_out.append(ids[0])
            b_out.append(ids[1])
        elif len(ids) > max_bucket_ids:
            rep = ids[0]
            a_out.extend([rep] * (len(ids) - 1))
            b_out.extend(ids[1:])
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
    return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})


def _minhash_pairs(corpus, concurrency=None, max_bucket_ids: int = 4096):
    """Banded-LSH candidate pairs, deduped inside the Dataset (no driver
    collect of the pair set).

    Exactly TWO shuffles, no mid-pipeline materialization:
      1. ``combiner_collect_distinct`` buckets docs per LSH key and
         carries each bucket's id list (block-local distinct, coarse
         ``_part`` exchange, vectorized per-partition re-distinct —
         see functions/agg.py);
      2. a vectorized expansion emits the bucket's pairs (size-2 — the
         common case — is (min, max); ≥3 is all-pairs, degrading to
         star pairs via the bucket's min-id representative past
         ``max_bucket_ids`` so a degenerate bucket emits O(n), not
         O(n²)); then ``groupby(a, b)`` dedups pairs across bands.
    Round 1 ran map_groups over every bucket (~16k tiny pandas groups);
    round 2's first cut used 4 barriers + a driver collect of hot keys —
    both dominated by fixed per-stage latency at small scale."""
    from .functions.agg import combiner_collect_distinct

    bands = corpus.map_batches(_task_stage(MinHasher), batch_format="pyarrow")
    buckets = combiner_collect_distinct(bands, ["band", "band_hash"], "doc_id", "ids")

    def expand_pairs(t: pa.Table) -> pa.Table:
        return _expand_bucket_pairs(t, max_bucket_ids)

    from .functions.agg import combiner_aggregate

    pairs = buckets.map_batches(expand_pairs, batch_format="pyarrow")
    deduped = combiner_aggregate(pairs, ["a", "b"], [(None, "count", "_nbands")])
    return deduped.select_columns(["a", "b"])


_DEDUP_MEMO: dict = {}


def _dedup_memo_key(sf_dir: str, kind: str, params: tuple = ()):
    """Memo key scoped to (input dir, Ray session): a fresh ``ray.init``
    gets a fresh job id, so cached materialized Datasets (whose object
    refs die with the session) are never reused across sessions."""
    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    return (os.path.realpath(sf_dir), job, kind, params)


def _minhash_pairs_for(sf_dir: str, concurrency=None):
    """Materialized LSH candidate pairs, memoized per (sf_dir, session).

    A curation pipeline chains candidates → verify → clusters → survivor
    selection; before round 5 each step re-ran the banding + bucket
    exchange from scratch (dedup_keep_best paid it twice — the round-4
    verdict's one perf-weak item). The pair set is two int64 columns —
    tiny next to the corpus — so keeping it materialized in the object
    store for the session is the right trade at any scale."""
    key = _dedup_memo_key(sf_dir, "pairs")
    ds = _DEDUP_MEMO.get(key)
    if ds is None:
        ds = _minhash_pairs(_dup_corpus(sf_dir), concurrency).materialize()
        _DEDUP_MEMO[key] = ds
    return ds


def minhash_dup_candidates(sf_dir: str, *, concurrency=None):
    """MinHash-LSH near-dup candidates over documents ∪ near-identical
    copy. SQL-checked: the md5/polynomial minhash spec (functions/dedup)
    is recomputed exactly by the DuckDB oracle."""
    return _minhash_pairs_for(sf_dir, concurrency)


def _base_band_index_for(sf_dir: str, concurrency=None):
    """Materialized LSH bucket index over the BASE corpus (documents
    alone, no near-copies), memoized per (sf_dir, session): one row per
    (band, band_hash) with the bucket's distinct doc-id list. This is
    the persisted corpus-fingerprint index a CDC-fed curation pipeline
    maintains — at 100 TB it lives sharded on storage and is extended
    per wave, never rebuilt."""
    from .functions.agg import combiner_collect_distinct
    from .functions.dedup import MinHasher

    key = _dedup_memo_key(sf_dir, "base_band_index")
    ds = _DEDUP_MEMO.get(key)
    if ds is None:
        base = _docs_ds(sf_dir, ["doc_id", "text"])
        bands = base.map_batches(_task_stage(MinHasher), batch_format="pyarrow")
        ds = combiner_collect_distinct(
            bands, ["band", "band_hash"], "doc_id", "ids"
        ).materialize()
        _DEDUP_MEMO[key] = ds
    return ds


def _incremental_pairs_for(sf_dir: str, concurrency=None):
    """Materialized incremental candidate pairs, memoized per
    (sf_dir, session) — candidates → verify chains reuse one probe."""
    key = _dedup_memo_key(sf_dir, "inc_pairs")
    ds = _DEDUP_MEMO.get(key)
    if ds is None:
        ds = _build_incremental_pairs(sf_dir, concurrency=concurrency).materialize()
        _DEDUP_MEMO[key] = ds
    return ds


def dedup_incremental_candidates(sf_dir: str, *, concurrency=None):
    """Incremental near-dup candidates (see ``_build_incremental_pairs``
    for the scale shape); memoized per session like the batch path."""
    return _incremental_pairs_for(sf_dir, concurrency)


def dedup_incremental_verified(sf_dir: str, *, threshold: float = 0.5, concurrency=None):
    """Incremental candidates verified with exact n-gram Jaccard — the
    full wave-vs-corpus dedup decision: probe the persisted base index
    (no base re-fingerprint), then verify only the surviving pairs with
    the same budgeted broadcast/bucket-join machinery as the batch
    verifier. At 100 TB the verify cost is bounded by the wave's pair
    count, never the corpus."""
    return minhash_dup_verified(
        sf_dir,
        threshold=threshold,
        concurrency=concurrency,
        pairs=_incremental_pairs_for(sf_dir, concurrency),
    )


def _build_incremental_pairs(sf_dir: str, *, concurrency=None, max_bucket_ids: int = 4096):
    """Incremental near-dup detection — the CDC-native dedup shape: a
    wave of INCOMING documents (here the fixture's planted near-copies,
    doc_id ≥ 1M) is checked against an already-fingerprinted base corpus
    WITHOUT re-fingerprinting the base. Output: candidate pairs (a, b)
    with at least one incoming member — i.e. the full-corpus LSH pair
    set minus its base×base pairs (the closed form the oracle computes).

    Scale shape: the base's LSH bucket index (``_base_band_index_for``)
    is built once per session — at 100 TB it is the persisted index a
    curation pipeline maintains across waves. The wave's band keys are
    minhashed distributed, collected (a wave is broadcast-size by
    definition — the budget every incremental design assumes), and
    ``ray.put`` once; the probe is then an embarrassingly-parallel scan
    of the index: a vectorized ``is_in`` band-hash prefilter drops
    unmatched buckets (at scale almost all of them) before a bounded
    Python expansion over the hits. In-wave pairs reuse the standard
    bucket expansion over the wave's own (tiny) buckets. One combiner
    dedup merges the two pair sources; no all-to-all over the base
    corpus anywhere. A bucket past ``max_bucket_ids`` degrades to star
    pairs through its min-id representative, same policy as the batch
    path."""
    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate, combiner_collect_distinct
    from .functions.dedup import MinHasher

    incoming = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.compute.add(t["doc_id"], 1_000_000),
                "text": pa.compute.binary_join_element_wise(t["text"], pa.scalar(" tail"), ""),
            }
        ),
        batch_format="pyarrow",
    )
    inc_bands = incoming.map_batches(_task_stage(MinHasher), batch_format="pyarrow")
    inc_buckets = combiner_collect_distinct(
        inc_bands, ["band", "band_hash"], "doc_id", "ids"
    ).materialize()

    # wave-side lookup: {(band, band_hash): sorted incoming ids}
    inc_blocks = [b for b in ray.get(inc_buckets.to_arrow_refs()) if b.num_rows]
    inc_map: dict = {}
    for blk in inc_blocks:
        bands_np = blk["band"].to_numpy(zero_copy_only=False)
        hashes_np = blk["band_hash"].to_numpy(zero_copy_only=False)
        ids_list = blk["ids"].to_pylist()
        for bd, bh, ids in zip(bands_np, hashes_np, ids_list):
            inc_map[(int(bd), int(bh))] = sorted(ids)
    map_ref = ray.put(inc_map)
    hash_set = pa.array(sorted({k[1] for k in inc_map}), pa.int64())

    def probe_base(t: pa.Table) -> pa.Table:
        # vectorized prefilter: only buckets whose band_hash appears in
        # the wave survive to the Python expansion
        t = t.filter(pc.is_in(t["band_hash"], value_set=hash_set))
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        m = ray.get(map_ref)
        a_out: list[int] = []
        b_out: list[int] = []
        bands_np = t["band"].to_numpy(zero_copy_only=False)
        hashes_np = t["band_hash"].to_numpy(zero_copy_only=False)
        for bd, bh, base_ids in zip(bands_np, hashes_np, t["ids"].to_pylist()):
            inc_ids = m.get((int(bd), int(bh)))
            if not inc_ids:
                continue
            base_ids = sorted(base_ids)
            if len(base_ids) > max_bucket_ids:
                base_ids = [base_ids[0]]  # star through the representative
            for a in base_ids:  # base ids < 1M < incoming ids: (a, b) ordered
                a_out.extend([a] * len(inc_ids))
                b_out.extend(inc_ids)
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    cross = _base_band_index_for(sf_dir, concurrency).map_batches(
        probe_base, batch_format="pyarrow"
    )
    within = inc_buckets.map_batches(
        lambda t: _expand_bucket_pairs(t, max_bucket_ids), batch_format="pyarrow"
    )
    deduped = combiner_aggregate(
        cross.union(within), ["a", "b"], [(None, "count", "_nbands")]
    )
    return deduped.select_columns(["a", "b"])


def simhash_fingerprints(sf_dir: str):
    """60-bit SimHash per doc (SQL-checked against the md5 word-hash spec)."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    fp = ds.map_batches(_task_stage(SimHasher), batch_format="pyarrow")
    return fp.select_columns(["doc_id", "simhash"])


def language_id_predictions(sf_dir: str, *, concurrency=None):
    ds = _docs_ds(sf_dir, ["doc_id", "text", "lang"])
    ds = ds.map_batches(_task_stage(LanguageId), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lang", "lang_pred"])


def doc_fingerprints(sf_dir: str):
    """Per-doc winnowing sketch summary — value-bearing (min/max/sum of
    the kept hashes) so the DuckDB oracle checks the hash VALUES, not
    just the counts."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    fp = ds.map_batches(add_fingerprint, batch_format="pyarrow")

    def summarize(t: pa.Table) -> pa.Table:
        fps = t["fingerprint"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array([len(x) for x in fps], pa.int64()),
                "fp_min": pa.array([min(x) for x in fps], pa.int64()),
                "fp_max": pa.array([max(x) for x in fps], pa.int64()),
                "fp_sum": pa.array([sum(x) for x in fps], pa.int64()),
            }
        )

    return fp.map_batches(summarize, batch_format="pyarrow")


def ann_topk_lsh(sf_dir: str, *, k: int = 10, num_queries: int = 5, bits: int = 4):
    """LSH-bucketed ANN (scale path): search only the query's bucket
    plus its Hamming-distance-1 neighbors (multiprobe) — recall ~2x the
    single-bucket probe at the cost of bits+1 buckets scanned."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _parquet_head(path, ["vec_id", "embedding"], num_queries)
    q = list_col_to_matrix(head["embedding"])
    qids = head["vec_id"].to_pylist()
    dim = q.shape[1]
    bucketer = LshBucketer(dim=dim, bits=bits)
    q_buckets = bucketer.bucket_of(q)

    ds = _read_parquet(path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        LshBucketer, fn_constructor_kwargs=dict(dim=dim, bits=bits), batch_format="pyarrow", concurrency=(1, 2)
    )
    wanted = set()
    for b in q_buckets:
        wanted.add(int(b))
        for i in range(bits):  # multiprobe: flip each hyperplane bit
            wanted.add(int(b) ^ (1 << i))
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["bucket"], value_set=pa.array(sorted(wanted), pa.int64()))),
        batch_format="pyarrow",
    )
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=ray.put(q), query_ids=qids, k=k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    merged = merge_topk(partials.to_pandas(), k=k).rename(columns={"rank": "rk"})
    return merged


def multimodal_decode_fake(sf_dir: str, *, concurrency=(1, 2)):
    """Media decode plumbing with the deterministic fake kernel."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    media = ds.map_batches(text_to_media_batch, batch_format="pyarrow")
    feats = media.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(dim=16, fake=True),
        batch_format="pyarrow",
        batch_size=256,  # payload-width-aware batch sizing
        concurrency=concurrency,
    )
    return feats.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "feat_dim": pc.cast(pc.list_value_length(t["features"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def multimodal_decode(sf_dir: str, *, concurrency=(1, 4)):
    """REAL media decode: closed-form BMP / WAV / y4m payloads →
    actor-pool container decode → structural facts + logical checksum.
    The oracle recomputes every output field from media_id alone, so a
    decode bug (padding, endianness, chunk walk) fails the check."""
    from .functions.multimodal import MediaDecoder, synth_media_batch

    ds = _docs_ds(sf_dir, ["doc_id"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=256,  # payload-width-aware batch sizing
        concurrency=concurrency,
    )


def ingest_exactly_once(sf_dir: str, *, num_partitions: int = 16, concurrency=None):
    """Transactional ingest run TWICE over the same stream; asserts the
    second replay is a per-partition no-op (watermark manifests all
    report skipped) and returns the FINAL LAKE STATE — which the
    driver oracles against the same SQL as ``lake_upsert_lww``. The
    exactly-once evidence is therefore value-checked end to end: a
    double replay must yield the byte-identical single-replay lake
    (round 2 returned only the skip summaries, a rows-only check)."""
    import shutil

    from .pipelines.ingest import read_lake, run_ingest

    fx = _fixtures(sf_dir)
    lake_dir = os.path.join(fx["root"], "lake_e1")
    if os.path.exists(lake_dir):
        shutil.rmtree(lake_dir)

    src = _fresh_lake(fx, num_partitions)
    shutil.copytree(src, lake_dir)
    run_ingest(fx["segment_paths"], lake_dir, num_partitions=num_partitions, concurrency=concurrency)
    summaries = run_ingest(
        fx["segment_paths"], lake_dir, num_partitions=num_partitions, concurrency=concurrency
    )
    not_skipped = [s["part"] for s in summaries if not s.get("skipped")]
    if not_skipped:
        raise AssertionError(
            f"exactly-once violated: second replay committed partitions {not_skipped}"
        )
    return read_lake(lake_dir).map_batches(
        lambda t: t.select(FINAL_COLUMNS).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Relational operators (joins, windows) — SQL-checked
# --------------------------------------------------------------------------


def _cents(batch: pa.Table, src: str, dst: str, factor: str | None = None) -> pa.Table:
    """Exact integer cents from a 2-decimal double (float-sum-order-proof).

    Uses floor(x*100 + 0.5) so the per-row rounding is bit-identical to
    the DuckDB oracle expression (pyarrow's round() uses a different
    half-way rule than DuckDB's)."""
    import pyarrow.compute as pc

    v = batch[src]
    if factor is not None:
        v = pc.multiply(v, pc.subtract(pa.scalar(1.0), batch[factor]))
    cents = pc.cast(pc.floor(pc.add(pc.multiply(v, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
    return batch.append_column(dst, cents)


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (cents-exact aggregates)."""
    ds = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    ds = ds.map_batches(
        lambda t: _cents(_cents(t, "l_extendedprice", "base_cents"), "l_extendedprice", "disc_cents", "l_discount"),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        lambda t: t.append_column("qty", pa.compute.cast(t["l_quantity"], pa.int64())),
        batch_format="pyarrow",
    )
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("base_cents", alias_name="sum_base_cents"),
        Sum("disc_cents", alias_name="sum_disc_cents"),
        Count(alias_name="n"),
    )


def revenue_by_brand(sf_dir: str, *, concurrency=(1, 4)):
    """Broadcast join: part (small side, ray.put once as an Arrow table)
    probed per batch with a zero-shuffle Acero hash join, then a
    per-batch partial aggregate so the only exchange ships ≤ |brands|
    rows per block (the 100 TB combiner shape)."""
    from .functions.relational import BroadcastJoiner

    part_t = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    ).rename_columns(["l_partkey", "p_brand"])
    ref = ray.put(part_t)

    ds = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    ds = ds.map_batches(
        lambda t: _cents(t, "l_extendedprice", "rev_cents", "l_discount"), batch_format="pyarrow"
    )
    joined = ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(small_ref=ref, on="l_partkey"),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def partial_agg(t: pa.Table) -> pa.Table:
        g = t.group_by("p_brand").aggregate([("rev_cents", "sum"), ("rev_cents", "count")])
        return g.rename_columns(["p_brand", "rev_p", "n_p"])

    partials = joined.map_batches(partial_agg, batch_format="pyarrow")
    return partials.groupby("p_brand").aggregate(
        Sum("rev_p", alias_name="revenue_cents"), Sum("n_p", alias_name="n_items")
    )


def order_priority_revenue(sf_dir: str, *, num_buckets: int = 16):
    """Partitioned hash join (both sides large): orders ⋈ lineitem on
    orderkey via Ray Data's native hash join, then revenue by order
    priority. The join ships only pruned columns (key + priority on one
    side, key + pre-computed cents on the other) through the shuffle,
    and Arrow-native partitions preserve int64 exactly (round-1's
    null-padded-union variant leaked int64 → float64 through pandas)."""
    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    lineitem = lineitem.map_batches(
        lambda t: _cents(t, "l_extendedprice", "rev_cents", "l_discount").select(
            ["l_orderkey", "rev_cents"]
        ),
        batch_format="pyarrow",
    )
    joined = orders.join(
        lineitem,
        join_type="inner",
        num_partitions=num_buckets,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return joined.groupby("o_orderpriority").aggregate(
        Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_items")
    )


def asof_last_event_per_order(sf_dir: str, *, num_parts: int = 32):
    """As-of LEFT join: latest event (by ts ≤ o_orderdate) per order,
    matched on customer key — Arrow/numpy end to end (round-3 verdict
    killed the pandas ``merge_asof`` + padded-null dtype-repair fold).

    Scale shape (same as ``events_user_trailing_window``): hash(key) →
    coarse ``_part`` (ONE exchange, task count bounded by ``num_parts``
    regardless of key cardinality), then per partition one lexsort of
    the unioned rows by (key, ts, side) with events sorting BEFORE
    orders at ts ties (backward-inclusive as-of), a running maximum
    over event positions (``np.maximum.accumulate``) giving every order
    row the latest event at-or-before it, and a key-equality gather to
    null out hits that leaked across a key boundary. No composite-int
    arithmetic, so nothing can overflow."""
    import pyarrow.compute as pc

    from .functions.agg import hash_part

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    events = _read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )

    def _prep(t: pa.Table, key_col: str, ts_col: str, okey, eid, side_val: int) -> pa.Table:
        out = pa.table(
            {
                "k": pc.cast(t[key_col], pa.int64()),
                "ts": pc.cast(t[ts_col], pa.int64()),
                "o_orderkey": okey(t),
                "event_id": eid(t),
                "side": pa.array(np.full(len(t), side_val, dtype=np.int8)),
            }
        )
        part = hash_part(out, ["k"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def prep_orders(t: pa.Table) -> pa.Table:
        return _prep(
            t, "o_custkey", "o_orderdate",
            lambda x: pc.cast(x["o_orderkey"], pa.int64()),
            lambda x: pa.nulls(len(x), pa.int64()), 1,
        )

    def prep_events(t: pa.Table) -> pa.Table:
        return _prep(
            t, "user_id", "ts",
            lambda x: pa.nulls(len(x), pa.int64()),
            lambda x: pc.cast(x["event_id"], pa.int64()), 0,
        )

    def asof_part(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        okey = pc.fill_null(g["o_orderkey"], -1).to_numpy(zero_copy_only=False).astype(np.int64)
        eid = pc.fill_null(g["event_id"], -1).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((side, ts, k))  # events (side=0) before orders at equal ts
        k, ts, side, okey, eid = k[order], ts[order], side[order], okey[order], eid[order]
        n = len(k)
        marker = np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
        last_ev = np.maximum.accumulate(marker)
        om = side == 1
        le = last_ev[om]
        safe = np.maximum(le, 0)
        valid = (le >= 0) & (k[safe] == k[om])
        if not om.any():
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()), "event_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "o_orderkey": pa.array(okey[om], pa.int64()),
                "event_id": pa.array(eid[safe], pa.int64(), mask=~valid),
            }
        )

    both = orders.map_batches(prep_orders, batch_format="pyarrow").union(
        events.map_batches(prep_events, batch_format="pyarrow")
    )
    return both.groupby("_part").map_groups(asof_part, batch_format="pyarrow")


def events_tumbling_window(sf_dir: str, *, window_sec: int = 3600):
    """Per-user tumbling windows over the events stream (count + cents
    sum). A tumbling count/sum is an associative aggregate on
    (user, window), so the scale shape is window-stamp + block-local
    combine (events arrive roughly time-clustered, so a block holds few
    distinct windows) + one small groupby — never a per-user
    ``map_groups`` that assumes a user's whole history fits one task
    (the generic ordered-window operator for non-associative logic
    remains ``functions.relational.tumbling_window_agg``)."""

    from .functions.agg import combiner_aggregate

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"])

    def stamp(t: pa.Table) -> pa.Table:
        sec = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        win = (sec // window_sec) * window_sec
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": pa.array(win, pa.int64()),
                "value_cents": pa.array(cents, pa.int64()),
            }
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    return combiner_aggregate(
        stamped,
        ["user_id", "window_start"],
        [(None, "count", "n_events"), ("value_cents", "sum", "total_value")],
    )


def events_sessionize(sf_dir: str, *, gap_sec: int = 1800, num_parts: int = 32):
    """Per-user sessions (gap > gap_sec starts a new session).

    Scale shape: hash(user) → coarse ``_part`` (task count bounded by
    ``num_parts`` regardless of user cardinality), each partition
    lexsorted once by (user, ts) and scanned with a fully vectorized
    session-boundary kernel — never per-key ``map_groups``, which hits
    Ray's per-key sort-aggregate pathology at high user counts (see
    functions/agg.py; the generic per-key operator survives as
    ``functions.relational.sessionize_group`` for non-vectorizable
    session logic). Equality with the per-key path is test-pinned at a
    10×-user fixture (tests/test_ray_pipeline.py)."""
    from .functions.agg import hash_part
    from .functions.relational import sessions_scan

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_part(t, ["user_id"], num_parts)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def sessions_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        epoch = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        return sessions_scan(uid, epoch, gap_sec)

    parts = ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("_part").map_groups(sessions_part, batch_format="pyarrow")


def top_revenue_orders(sf_dir: str, *, k: int = 10):
    """Sort/top-k: block-local combine (lineitem is clustered by
    orderkey, so per-block partial sums shrink the exchange ~4x), a
    small per-order aggregate, then per-block top-k candidates so the
    final sort ranks ≤ k·#blocks rows instead of every order."""
    ds = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    ds = ds.map_batches(lambda t: _cents(t, "l_extendedprice", "rev_cents", "l_discount"), batch_format="pyarrow")

    from .functions.agg import combiner_aggregate

    per_order = combiner_aggregate(
        ds, ["l_orderkey"], [("rev_cents", "sum", "revenue_cents")]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t, sort_keys=[("revenue_cents", "descending"), ("l_orderkey", "ascending")]
        )
        return t.take(idx.slice(0, k))

    cand = per_order.map_batches(local_topk, batch_format="pyarrow")
    # orderkey tiebreak keeps the top-k deterministic under revenue ties
    top = cand.sort(["revenue_cents", "l_orderkey"], descending=[True, False]).limit(k).to_pandas()
    top = top.rename(columns={"l_orderkey": "o_orderkey"})
    top["rk"] = range(1, len(top) + 1)
    return top[["rk", "o_orderkey", "revenue_cents"]]


def embedding_near_dup_pairs(
    sf_dir: str,
    *,
    bits: int | None = None,
    threshold: float = 0.95,
    num_parts: int = 32,
    max_bucket_ids: int = 4096,
    target_occupancy: int = 16,
):
    """Embedding-cosine near-dup: LSH bucket → exact cosine verify within
    buckets, over embeddings ∪ planted ground truth:

    - exact copies  (vec_id + 1M): cosine 1.0 — identical vectors land in
      identical buckets deterministically, so every (v, v+1M) pair MUST
      appear (the oracle SQL enumerates exactly these);
    - decoys        (vec_id + 2M): e + |e|·û with û ⊥ e → cosine ≈ 0.707,
      well under the 0.95 threshold — present to prove the verify step
      filters, never emitted (fixture max natural cosine ≈ 0.6).

    Round 1 planted nothing and returned 0 rows — a vacuous check.

    Scale shape (round 3): ``bits`` scales with the corpus (parquet
    row-count metadata → constant expected bucket occupancy, instead of
    round 2's fixed 2^10 buckets whose occupancy — and the in-bucket
    O(n²) ``triu`` — grew with N); buckets are walked inside coarse
    ``_part`` partitions with one lexsort + boundary scan (the
    ``simhash_dup_pairs`` pattern) instead of a per-bucket pandas
    ``map_groups``; and a bucket past ``max_bucket_ids`` degrades to
    star pairs against its min-id representative — O(n) rows and
    O(n·dim) work, the same cap ``_minhash_pairs`` uses. Identical
    vectors always share a bucket, so the star cap still links every
    exact-copy cluster through its representative."""
    from .functions.ann import LshBucketer

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_planted = 3 * pq.ParquetFile(path).metadata.num_rows
    if bits is None:
        bits = max(10, int(np.ceil(np.log2(max(2.0, n_planted / target_occupancy)))))
    dim = len(_parquet_head(path, ["vec_id", "embedding"], 1)["embedding"][0].as_py())
    ds = _read_parquet(path, columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mat = list_col_to_matrix(t["embedding"])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        r = np.roll(mat, 1, axis=1)
        unit = mat / np.where(norms == 0, 1, norms)
        orth = r - (r * unit).sum(axis=1, keepdims=True) * unit
        onorm = np.linalg.norm(orth, axis=1, keepdims=True)
        decoy = mat + norms * orth / np.where(onorm == 0, 1, onorm)
        out_ids = np.concatenate([ids, ids + 1_000_000, ids + 2_000_000])
        out_mat = np.ascontiguousarray(np.vstack([mat, mat, decoy]))
        n_out, d = out_mat.shape
        offsets = pa.array(np.arange(0, (n_out + 1) * d, d, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(out_mat.ravel(), pa.float64()))
        return pa.table({"vec_id": pa.array(out_ids, pa.int64()), "embedding": emb})

    planted = ds.map_batches(plant, batch_format="pyarrow")
    planted = planted.map_batches(
        LshBucketer, fn_constructor_kwargs=dict(dim=dim, bits=bits), batch_format="pyarrow", concurrency=(1, 2)
    )

    from .functions.agg import combiner_aggregate, hash_part

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_part(t, ["bucket"], num_parts)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def verify_part(g: pa.Table) -> pa.Table:
        """One coarse partition: lexsort by (bucket, vec_id), walk
        bucket boundaries, exact-cosine verify inside each bucket
        (vectorized matmul; star-capped past max_bucket_ids)."""
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if len(g) < 2:
            return empty
        ids = np.asarray(g["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mat = list_col_to_matrix(g["embedding"])
        bucket = g["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bucket))
        ids, bucket, mat = ids[order], bucket[order], mat[order]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mat = mat / norms
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.r_[starts[1:], len(bucket)]
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            sub_ids, sub = ids[s:e], mat[s:e]
            if n > max_bucket_ids:
                # star pairs vs the bucket's min-id representative (row 0
                # after the id-lexsort): O(n·dim), never an n×n matrix
                sims = sub[1:] @ sub[0]
                hit = np.flatnonzero(sims >= threshold)
                if len(hit):
                    a_parts.append(np.full(len(hit), sub_ids[0]))
                    b_parts.append(sub_ids[1:][hit])
                continue
            sims = sub @ sub.T
            ii, jj = np.triu_indices(n, k=1)
            mask = sims[ii, jj] >= threshold
            if mask.any():
                a_parts.append(sub_ids[ii][mask])
                b_parts.append(sub_ids[jj][mask])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        return pa.table(
            {"a": pa.array(np.minimum(a, b), pa.int64()), "b": pa.array(np.maximum(a, b), pa.int64())}
        )

    cand = planted.map_batches(add_part, batch_format="pyarrow")
    pairs = cand.groupby("_part").map_groups(verify_part, batch_format="pyarrow")
    # a pair can verify in at most one bucket (bucket id is a function of
    # the vector), so no cross-bucket dedup is needed; still reduce to be
    # robust to future multi-table LSH variants.
    return combiner_aggregate(pairs, ["a", "b"], [(None, "count", "_n")], num_parts=8).select_columns(
        ["a", "b"]
    )


def minhash_dup_verified(
    sf_dir: str,
    *,
    threshold: float = 0.5,
    concurrency=None,
    num_partitions: int = 8,
    strategy: str = "auto",
    broadcast_budget: int = 1_000_000,
    pairs=None,
):
    """MinHash-LSH candidates verified with exact n-gram Jaccard — fully
    distributed; no driver-side text map or per-pair loop (round 1
    verified pairs serially on the driver).

    ``strategy``:
    - "auto" (default): counts the candidate pairs (metadata-cheap on
      the materialized candidate Dataset) and picks "broadcast" only
      while the pair set fits ``broadcast_budget``; beyond it —
      the 100 TB crawl-corpus regime where near-dup pairs grow with
      the corpus — it switches to "bucket_join", so the default path
      never materializes an unbounded pair set on the driver.
    - "broadcast": candidate pairs broadcast once via ``ray.put``; the
      per-doc gram sets stream through a tagging ``map_batches`` (no
      shuffle) and ONE coarse exchange on ``_part = pair % P`` reunites
      both members of every pair in a single partition task, where
      Jaccard is computed over the whole partition at once (sorting by
      a small int beats Ray's per-key aggregate machinery at high pair
      cardinality). Text never crosses the exchange; only candidate
      members' gram sets do.
    - "bucket_join": fully shuffle-based — two bucketed hash joins
      (functions.relational.bucket_lookup_join) attach the gram sets;
      Jaccard runs in map_batches. No driver-side pair state at all.
    """
    corpus = _dup_corpus(sf_dir)
    if pairs is None:
        pairs = _minhash_pairs_for(sf_dir, concurrency)
    gsets = corpus.map_batches(_task_stage(GramSetter), batch_format="pyarrow")
    if strategy == "auto":
        strategy = "broadcast" if pairs.count() <= broadcast_budget else "bucket_join"
    if strategy == "bucket_join":
        return _verified_bucket_join(pairs, gsets.materialize(), threshold, num_partitions)

    prows = pairs.take_all()  # bounded: ≤ broadcast_budget candidate pairs
    if not prows:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "jaccard": pa.array([], pa.float64())}
        )
    a_ids = [r["a"] for r in prows]
    b_ids = [r["b"] for r in prows]
    # flat membership arrays (doc, pair index, role) — the tag stage
    # gathers with ONE vectorized index_in per batch, no Python loop
    # (round-4 advice: same gather shape as bucket_lookup_join)
    n_pairs = len(a_ids)
    mem_doc = np.concatenate([np.asarray(a_ids, np.int64), np.asarray(b_ids, np.int64)])
    mem_pair = np.concatenate([np.arange(n_pairs, dtype=np.int64)] * 2)
    mem_role = np.concatenate(
        [np.zeros(n_pairs, np.int32), np.ones(n_pairs, np.int32)]
    )
    memb_ref = ray.put((mem_doc, mem_pair, mem_role))

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        docs, pair_idx, roles = ray.get(memb_ref)
        batch_ids = t["doc_id"]
        if isinstance(batch_ids, pa.ChunkedArray):
            batch_ids = batch_ids.combine_chunks()
        pos = pc.index_in(pa.array(docs, pa.int64()), value_set=batch_ids)
        keep = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        sel = pos.to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "pair": pa.array(pair_idx[keep], pa.int64()),
                "role": pa.array(roles[keep], pa.int32()),
                "gram_set": t["gram_set"].take(pa.array(sel, pa.int64())),
            }
        )

    a_arr, b_arr = a_ids, b_ids
    num_parts = 32

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["pair"].to_numpy(zero_copy_only=False) % num_parts).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def jac_part(g: pa.Table) -> pa.Table:
        acc: dict[int, dict[int, list[int]]] = {}
        for p, r, s in zip(
            g["pair"].to_pylist(), g["role"].to_pylist(), g["gram_set"].to_pylist()
        ):
            acc.setdefault(p, {})[r] = s
        out_a, out_b, out_j = [], [], []
        for p, d in acc.items():
            if len(d) != 2:
                continue
            j = jaccard_from_sets(d[0], d[1])
            if j >= threshold:
                out_a.append(a_arr[p])
                out_b.append(b_arr[p])
                out_j.append(round(j, 6))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    tagged = gsets.map_batches(tag, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    return tagged.groupby("_part").map_groups(jac_part, batch_format="pyarrow")


def _verified_bucket_join(pairs, gsets, threshold: float, num_partitions: int):
    """Shuffle-only verify path (see minhash_dup_verified docstring)."""
    from .functions.relational import bucket_lookup_join

    ltype = pa.list_(pa.int64())
    j1 = bucket_lookup_join(
        pairs, gsets, left_key="a", right_key="doc_id",
        value_col="gram_set", out_col="gs_a", value_type=ltype, num_buckets=num_partitions,
    )
    j2 = bucket_lookup_join(
        j1, gsets, left_key="b", right_key="doc_id",
        value_col="gram_set", out_col="gs_b", value_type=ltype, num_buckets=num_partitions,
    )

    def _jaccard_batch(t: pa.Table) -> pa.Table:
        ga, gb = t["gs_a"].to_pylist(), t["gs_b"].to_pylist()
        js = [jaccard_from_sets(x, y) for x, y in zip(ga, gb)]
        keep = [i for i, j in enumerate(js) if j >= threshold]
        return pa.table(
            {
                "a": t["a"].take(keep),
                "b": t["b"].take(keep),
                "jaccard": pa.array([round(js[i], 6) for i in keep], pa.float64()),
            }
        )

    return j2.map_batches(_jaccard_batch, batch_format="pyarrow")


def ann_topk_ivf(sf_dir: str, *, k: int = 10, num_queries: int = 5, n_lists: int = 8, nprobe: int = 3):
    """IVF ANN: cosine-k-means-style lists trained on a driver-side
    sample (the SQL-reproducible one-pass spec — seeds are the first
    ``n_lists`` vec_id-ordered sample rows, one cosine assignment, raw
    elementwise-mean centroids; see IvfIndex.train_one_pass), centroids
    broadcast; queries probe nprobe lists only. The DuckDB oracle
    recomputes training, assignment, probing, and ranking closed-form,
    so list routing itself is value-checked (rows-only in round 2)."""
    from .functions.ann import BruteForceTopK, IvfIndex

    path = os.path.join(sf_dir, "embeddings.parquet")
    train_head = _parquet_head(path, ["vec_id", "embedding"], 256)
    sample = list_col_to_matrix(train_head["embedding"])
    centroids = IvfIndex.train_one_pass(sample, n_lists=n_lists)
    head = train_head.slice(0, num_queries)
    q = list_col_to_matrix(head["embedding"])
    qids = head["vec_id"].to_pylist()
    index = IvfIndex(centroids)
    probe_lists = set(int(l) for lists in index.probe(q, nprobe) for l in lists)

    ds = _read_parquet(path, columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        IvfIndex, fn_constructor_kwargs=dict(centroids=ray.put(centroids)),
        batch_format="pyarrow", concurrency=(1, 2),
    )
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["ivf_list"], value_set=pa.array(sorted(probe_lists), pa.int64()))),
        batch_format="pyarrow",
    )
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=ray.put(q), query_ids=qids, k=k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    from .functions.ann import merge_topk

    return merge_topk(partials.to_pandas(), k=k).rename(columns={"rank": "rk"})


def dedup_clusters(
    sf_dir: str,
    *,
    max_iters: int = 12,
    strategy: str = "auto",
    driver_budget: int = 2_000_000,
    pairs=None,
):
    """Connected-components dedup clustering — the step after candidate
    generation in a real curation pipeline: union near-dup pairs into
    clusters and label every doc with its cluster representative (min
    doc_id), so downstream keeps exactly one doc per cluster. The
    DuckDB oracle recomputes the fixpoint with a recursive CTE.

    ``strategy`` (the same auto-switch shape as minhash_dup_verified):
    - "auto": count the candidate EDGES (metadata-cheap, materialized)
      — while they fit ``driver_budget``, a driver union-find labels
      the edge-touched nodes in one pass and the mapping broadcasts
      via ``ray.put`` (singleton docs never leave the cluster); past
      the budget, distributed min-label propagation takes over.
    - "unionfind": path-compressed union-find over the collected pairs
      (O(E α(E)) on the driver), roots normalized to each component's
      min id; corpus labeling is one broadcast-lookup map stage.
    - "propagate": iterative min-label propagation — per round, a
      bucketed hash join attaches each edge source's current label and
      a combiner-tree min folds it per node; the driver sees ONE
      scalar per round (the monotone label sum) for convergence.
      Rounds = cluster diameter. The unbounded-graph scale path.

    ``pairs``: optionally a precomputed candidate-pairs Dataset (columns
    ``a``, ``b``); defaults to the session-memoized minhash pairs so a
    chained curation pipeline never re-runs the banding. The resulting
    labels Dataset is itself memoized per (sf_dir, args, session) —
    ``dedup_keep_best`` consumes it without a second clustering pass.
    """
    from .functions.agg import combiner_aggregate
    from .functions.relational import bucket_lookup_join

    memo_key = None
    if pairs is None:
        memo_key = _dedup_memo_key(
            sf_dir, "labels", (max_iters, strategy, driver_budget)
        )
        cached = _DEDUP_MEMO.get(memo_key)
        if cached is not None:
            return cached
        pairs = _minhash_pairs_for(sf_dir)

    corpus = _dup_corpus(sf_dir)

    if strategy == "auto":
        strategy = "unionfind" if pairs.count() <= driver_budget else "propagate"

    if strategy == "unionfind":
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in pairs.take_all():  # bounded by driver_budget
            a, b = row["a"], row["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        rep: dict[int, int] = {}
        for x in parent:
            r = find(x)
            rep[r] = min(rep.get(r, x), x)
        mapping = {x: rep[find(x)] for x in parent}
        map_ref = ray.put(mapping)

        def label_batch(t: pa.Table) -> pa.Table:
            m = ray.get(map_ref)
            ids = t["doc_id"].to_pylist()
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "cluster": pa.array([m.get(i, i) for i in ids], pa.int64()),
                }
            )

        out = corpus.select_columns(["doc_id"]).map_batches(
            label_batch, batch_format="pyarrow"
        )
        if memo_key is not None:
            out = out.materialize()
            _DEDUP_MEMO[memo_key] = out
        return out

    # -- distributed min-label propagation (unbounded-graph path) ------

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    labels = corpus.map_batches(
        lambda t: pa.table({"node": t["doc_id"], "label": t["doc_id"]}),
        batch_format="pyarrow",
    ).materialize()

    from ray.data.aggregate import Sum as _Sum

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        cand = bucket_lookup_join(
            edges, labels, left_key="src", right_key="node",
            value_col="label", out_col="lbl", value_type=pa.int64(), num_buckets=16,
        )
        prop = cand.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["lbl"]}), batch_format="pyarrow"
        )
        labels = combiner_aggregate(
            labels.union(prop), ["node"], [("label", "min", "label")], num_parts=16
        ).materialize()
        s = labels.aggregate(_Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # a component with diameter > max_iters would return unconverged
        # (wrong) labels silently — refuse instead (round-3 advice)
        raise RuntimeError(
            f"dedup_clusters label propagation did not converge within {max_iters} "
            "rounds (a cluster's diameter exceeds max_iters); raise max_iters"
        )

    out = labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster": t["label"]}),
        batch_format="pyarrow",
    )
    if memo_key is not None:
        out = out.materialize()
        _DEDUP_MEMO[memo_key] = out
    return out


def dedup_keep_best(
    sf_dir: str, *, num_parts: int = 16, labels=None, broadcast_budget: int = 5_000_000
):
    """Near-dup survivor selection — the step after clustering in a real
    curation pipeline: within every near-dup cluster keep the
    best-quality document (here: most whitespace tokens, ties broken by
    min doc_id — a deterministic, SQL-recomputable quality proxy).
    Output: one row per cluster with the survivor, its token count, and
    the cluster size.

    Scale shape: cluster labels come in via ``labels=`` or from the
    session-memoized ``dedup_clusters`` (budgeted auto-switch) — either
    way the minhash banding/clustering runs ONCE per pipeline, not once
    per downstream consumer (round-4 verdict's perf item). Token counts
    are computed where the text lives (never shuffled), and the
    per-cluster argmax is an ASSOCIATIVE max over the composite
    ``n_tokens·2³² + (2³²−1−doc_id)`` folded through the combiner tree —
    so a hot cluster ships ≤1 partial row per block, never its member
    list. The doc→cluster map itself auto-switches on size: at or below
    ``broadcast_budget`` label rows it is broadcast once (``ray.put``,
    fetched zero-copy per actor) and joined inside the token
    ``map_batches`` with a per-batch partial argmax — the only exchange
    ships ≤ |clusters-in-block| partial rows (no co-partition shuffle at
    all); above budget the two sides meet in ONE doc_id-hash
    co-partition exchange (vectorized ``index_in`` gather)."""
    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate, hash_part

    if labels is None:
        labels = dedup_clusters(sf_dir)
    corpus = _dup_corpus(sf_dir)

    def tok_side(t: pa.Table) -> pa.Table:
        out = token_count_batch(t).select(["doc_id", "n_tokens"])
        out = pa.table(
            {
                "doc_id": out["doc_id"],
                "n_tokens": pc.cast(out["n_tokens"], pa.int64()),
                "cluster": pa.nulls(len(out), pa.int64()),
                "side": pa.array(np.zeros(len(out), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["doc_id"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def label_side(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.nulls(len(t), pa.int64()),
                "cluster": pc.cast(t["cluster"], pa.int64()),
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["doc_id"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    STRIDE = np.int64(1) << np.int64(32)

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        toks = g.filter(pa.array(side == 0))
        labs = g.filter(pa.array(side == 1))
        keys = toks["doc_id"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        pos = pc.index_in(labs["doc_id"], value_set=keys)
        ntok = pc.cast(toks["n_tokens"], pa.int64()).take(pos).to_numpy(zero_copy_only=False)
        did = labs["doc_id"].to_numpy(zero_copy_only=False)
        if len(did) and (
            did.min() < 0 or did.max() >= int(STRIDE) - 1 or ntok.max() >= (1 << 31)
        ):
            # same guard discipline as events_user_trailing_window: the
            # composite argmax only encodes 0 ≤ doc_id < 2^32−1 and
            # n_tokens < 2^31 in one int64
            raise ValueError(
                "dedup_keep_best composite requires 0 <= doc_id < 2^32-1 and "
                f"n_tokens < 2^31; saw doc_id [{did.min()}, {did.max()}], "
                f"max tokens {ntok.max()}"
            )
        comp = ntok.astype(np.int64) * STRIDE + (STRIDE - 1 - did)
        return pa.table(
            {
                "cluster": labs["cluster"],
                "comp": pa.array(comp, pa.int64()),
            }
        )

    n_labels = labels.count()
    if n_labels <= broadcast_budget:
        # broadcast path: the doc→cluster map fits worker memory, so
        # ship it ONCE (ray.put → zero-copy per-actor fetch) and fold
        # the per-batch argmax where the text lives — no co-partition
        # shuffle of the corpus at all
        lab_blocks = [b for b in ray.get(labels.to_arrow_refs()) if b.num_rows]
        lab_t = (
            pa.concat_tables([b.select(["doc_id", "cluster"]) for b in lab_blocks])
            if lab_blocks
            else pa.table(
                {"doc_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        )
        ref = ray.put(lab_t)

        def tag_argmax(t: pa.Table) -> pa.Table:
            # stateless task: the only per-task state is the broadcast
            # label table — a zero-copy local object-store read (the
            # pii_redaction_stats lesson: don't pay actor-pool spin-up
            # for ~KB of state)
            lab = ray.get(ref)
            keys = pc.cast(lab["doc_id"], pa.int64()).combine_chunks()
            clusters = pc.cast(lab["cluster"], pa.int64()).combine_chunks()
            out = token_count_batch(t).select(["doc_id", "n_tokens"])
            pos = pc.index_in(pc.cast(out["doc_id"], pa.int64()), value_set=keys)
            mask = pc.is_valid(pos)
            out = out.filter(mask)
            clu = pc.take(clusters, pos.filter(mask))
            did = pc.cast(out["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
            ntok = pc.cast(out["n_tokens"], pa.int64()).to_numpy(zero_copy_only=False)
            if len(did) and (
                did.min() < 0 or did.max() >= int(STRIDE) - 1 or ntok.max() >= (1 << 31)
            ):
                raise ValueError(
                    "dedup_keep_best composite requires 0 <= doc_id < 2^32-1 "
                    f"and n_tokens < 2^31; saw doc_id [{did.min()}, {did.max()}], "
                    f"max tokens {ntok.max()}"
                )
            comp = ntok.astype(np.int64) * STRIDE + (STRIDE - 1 - did)
            part = pa.table(
                {
                    "cluster": clu,
                    "comp": pa.array(comp, pa.int64()),
                    "one": pa.array(np.ones(len(comp), dtype=np.int64)),
                }
            )
            g = part.group_by("cluster").aggregate([("comp", "max"), ("one", "sum")])
            return g.rename_columns(["cluster", "comp_max_p", "n_p"])

        partials = corpus.map_batches(tag_argmax, batch_format="pyarrow")
        agg = combiner_aggregate(
            partials,
            ["cluster"],
            [("comp_max_p", "max", "comp_max"), ("n_p", "sum", "n_members")],
            num_parts=num_parts,
        )
    else:
        joined = corpus.map_batches(tok_side, batch_format="pyarrow").union(
            labels.map_batches(label_side, batch_format="pyarrow")
        ).groupby("_part").map_groups(join_part, batch_format="pyarrow")

        agg = combiner_aggregate(
            joined,
            ["cluster"],
            [("comp", "max", "comp_max"), (None, "count", "n_members")],
            num_parts=num_parts,
        )

    def decode(t: pa.Table) -> pa.Table:
        comp = t["comp_max"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cluster": t["cluster"],
                "survivor_doc_id": pa.array(
                    (np.int64(STRIDE) - 1 - (comp % STRIDE)).astype(np.int64), pa.int64()
                ),
                "survivor_tokens": pa.array((comp // STRIDE).astype(np.int64), pa.int64()),
                "n_members": t["n_members"],
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def quality_gopher_by_lang(
    sf_dir: str,
    *,
    min_words: int = 40,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 4.5,
    min_stop_ratio: float = 0.06,
    min_uniq_ratio: float = 0.5,
):
    """Gopher-style repetition/quality gates (Rae et al. 2021 §A1.1, the
    public heuristics): word-count bounds, mean-word-length band,
    stopword-ratio floor, distinct-token-fraction floor — per-language pass
    counts. All rules are integer/double arithmetic DuckDB recomputes
    exactly. Scale shape: one vectorized map stage (segmented numpy
    reductions over the token stream), then a |langs|-row aggregate."""
    from .functions.text import _LANG_PROFILES

    stops = _LANG_PROFILES["en"]

    def gates(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        tok_lists = [s.split() for s in texts]
        n_words = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
        flat = [w for tl in tok_lists for w in tl]
        tok_len = np.fromiter(map(len, flat), dtype=np.int64, count=len(flat))
        is_stop = np.fromiter((w in stops for w in flat), dtype=np.int64, count=len(flat))
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(n_words[:-1], out=offsets[1:])
        nz = n_words > 0
        sum_len = np.zeros(len(texts), dtype=np.int64)
        n_stop = np.zeros(len(texts), dtype=np.int64)
        if nz.any() and len(flat):
            red_offsets = offsets[nz]
            sum_len[nz] = np.add.reduceat(tok_len, red_offsets)
            n_stop[nz] = np.add.reduceat(is_stop, red_offsets)
        denom = np.maximum(n_words, 1)
        mean_len = sum_len / denom
        stop_ratio = n_stop / denom
        n_uniq = np.array([len(set(tl)) for tl in tok_lists], dtype=np.int64)
        uniq_ratio = n_uniq / denom
        ok_words = (n_words >= min_words) & (n_words <= max_words)
        ok_mean = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
        ok_stop = stop_ratio >= min_stop_ratio
        # Gopher's repetition gate: low distinct-token fraction = boilerplate
        ok_uniq = uniq_ratio >= min_uniq_ratio
        return pa.table(
            {
                "lang": t["lang"],
                "ok_words": pa.array(ok_words.astype(np.int64), pa.int64()),
                "ok_mean": pa.array(ok_mean.astype(np.int64), pa.int64()),
                "ok_stop": pa.array(ok_stop.astype(np.int64), pa.int64()),
                "ok_uniq": pa.array(ok_uniq.astype(np.int64), pa.int64()),
                "ok_all": pa.array(
                    (ok_words & ok_mean & ok_stop & ok_uniq).astype(np.int64), pa.int64()
                ),
            }
        )

    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["text", "lang"])
    gated = ds.map_batches(gates, batch_format="pyarrow")
    return combiner_aggregate(
        gated,
        ["lang"],
        [
            (None, "count", "n_docs"),
            ("ok_words", "sum", "n_ok_words"),
            ("ok_mean", "sum", "n_ok_mean_len"),
            ("ok_stop", "sum", "n_ok_stop_ratio"),
            ("ok_uniq", "sum", "n_ok_uniq"),
            ("ok_all", "sum", "n_pass_all"),
        ],
        num_parts=8,
    )


def documents_stratified_sample(sf_dir: str, *, en_percent: int = 10, other_percent: int = 30):
    """Stratified deterministic sampling: per-language rates from ONE
    md5(doc_id) hashing pass (downsample the dominant language, keep
    more of the tail — the standard data-mix rebalancing primitive).
    Same reproducibility story as documents_hash_sample: no RNG state,
    identical rows at any cluster size."""

    ds = _docs_ds(sf_dir, ["doc_id", "lang"])

    def sample(t: pa.Table) -> pa.Table:
        import hashlib as _h

        dec = np.char.mod("%d", t["doc_id"].to_numpy(zero_copy_only=False))
        md5 = _h.md5
        bucket = np.fromiter(
            (int.from_bytes(md5(s.encode()).digest()[:4], "big") % 100 for s in dec),
            dtype=np.int64,
            count=len(dec),
        )
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        rate = np.where(langs == "en", en_percent, other_percent)
        return t.filter(pa.array(bucket < rate))

    return ds.map_batches(sample, batch_format="pyarrow")


def token_count_bpe_by_lang(sf_dir: str, *, concurrency=(1, 2)):
    """BPE-ish token counts (GPT-2-style pre-tokenizer regex), per lang."""
    from .functions.text import BpeishTokenCounter

    ds = _docs_ds(sf_dir, ["text", "lang"])
    ds = ds.map_batches(BpeishTokenCounter, batch_format="pyarrow", concurrency=concurrency)
    return ds.groupby("lang").aggregate(
        Sum("n_bpe_tokens", alias_name="total_bpe_tokens"), Count(alias_name="n_docs")
    )


def unigram_logprob_by_lang(sf_dir: str, *, vocab_cap: int = 65536):
    """CCNet-style unigram LM quality scoring: per-doc mean negative
    log-probability under a corpus-trained unigram model with Laplace
    smoothing, averaged per language (the cheap stand-in for the KenLM
    perplexity filter real curation pipelines run).

    Two passes, both scale-safe:
    1. global token counts via the combiner tree (the exchange is
       bounded by vocabulary, not token count), capped at ``vocab_cap``
       by (count desc, token asc) before the driver collects — tokens
       past the cap score as OOV;
    2. the log-prob table broadcasts once via ``ray.put``; scoring is a
       map stage; per-language means come from one |langs|-row
       combine. Scores round to 6 decimals so libm ulp differences
       between numpy and DuckDB ``ln`` can't flip the value hash."""
    import math

    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["doc_id", "text", "lang"])

    def tokenize_count(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n_p": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = combiner_aggregate(
        ds.map_batches(tokenize_count, batch_format="pyarrow"), ["token"], [("n_p", "sum", "n")]
    )
    total = counts.aggregate(Sum("n", alias_name="s"))["s"]
    vocab_rows = (
        counts.sort(["n", "token"], descending=[True, False]).limit(vocab_cap).take_all()
    )  # ≤ vocab_cap rows on the driver
    v = len(vocab_rows)
    denom = float(total + v + 1)
    logp = {r["token"]: math.log((r["n"] + 1) / denom) for r in vocab_rows}
    oov = math.log(1.0 / denom)
    logp_ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = ray.get(logp_ref)
        out = []
        for s in t["text"].to_pylist():
            toks = s.lower().split()
            if not toks:
                out.append(0.0)
                continue
            out.append(-sum(lp.get(w, oov) for w in toks) / len(toks))
        return pa.table({"lang": t["lang"], "nll": pa.array(out, pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    agg = combiner_aggregate(
        scored, ["lang"], [(None, "count", "n_docs"), ("nll", "sum", "_s")], num_parts=8
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "avg_nll": pa.array(
                    np.round(
                        t["_s"].to_numpy(zero_copy_only=False)
                        / t["n_docs"].to_numpy(zero_copy_only=False),
                        6,
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def corpus_curation_stats(sf_dir: str, *, min_tokens: int = 30):
    """Composite training-data curation pipeline — language ID →
    token-count quality gate → exact dedup → per-language corpus stats,
    all SQL-checked end to end. The corpus is documents ∪ an exact
    copy (doc_id + 1M) so the dedup stage provably halves the kept set.

    Scale shape: three vectorized map stages, then the only shuffles
    are on (content_hash) — shipping 4 small columns, never text — and
    on the tiny lang_pred aggregate.
    """
    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    dup = ds.map_batches(
        lambda t: t.set_column(0, "doc_id", pa.compute.add(t["doc_id"], 1_000_000)),
        batch_format="pyarrow",
    )
    corpus = ds.union(dup)
    corpus = corpus.map_batches(_task_stage(LanguageId), batch_format="pyarrow")
    corpus = corpus.map_batches(token_count_batch, batch_format="pyarrow")
    kept = corpus.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n_tokens"], min_tokens)),
        batch_format="pyarrow",
    )
    hashed = kept.map_batches(add_content_hash, batch_format="pyarrow").select_columns(
        ["doc_id", "content_hash", "lang_pred", "n_tokens"]
    )
    uniq = combiner_aggregate(
        hashed,
        ["content_hash"],
        [
            ("doc_id", "min", "doc_id"),
            ("lang_pred", "min", "lang_pred"),
            ("n_tokens", "min", "n_tokens"),
        ],
    )
    return uniq.groupby("lang_pred").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )


def curated_export_summary(sf_dir: str, *, min_tokens: int = 30, num_parts: int = 16):
    """The WRITE side of curation: language-ID → quality gate → exact
    dedup (keeping each cluster's min-id doc WITH its text) → training
    shards written as lang-partitioned parquet — then read BACK and
    aggregated, so the oracle validates the bytes on disk, not an
    in-flight Dataset.

    Scale shape: the dedup here must carry text (the export needs it),
    so text crosses exactly ONE hash exchange — partitioned by
    content_hash, each partition keeps its min-id row per hash with a
    vectorized lexsort + boundary take (no per-key map_groups) — and
    the shard write is Ray's native partitioned ``write_parquet``
    (one directory per language → resumable, re-runnable per
    partition)."""
    import shutil as _shutil

    from .functions.agg import combiner_aggregate, hash_part

    out_dir = os.path.join(WORK_DIR, f"curated_{os.path.basename(os.path.normpath(sf_dir))}")
    _shutil.rmtree(out_dir, ignore_errors=True)

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    dup = ds.map_batches(
        lambda t: t.set_column(0, "doc_id", pa.compute.add(t["doc_id"], 1_000_000)),
        batch_format="pyarrow",
    )
    corpus = ds.union(dup)
    corpus = corpus.map_batches(_task_stage(LanguageId), batch_format="pyarrow")
    corpus = corpus.map_batches(token_count_batch, batch_format="pyarrow")
    kept = corpus.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n_tokens"], min_tokens)),
        batch_format="pyarrow",
    )
    hashed = kept.map_batches(add_content_hash, batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_part(t, ["content_hash"], num_parts)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def keep_min_per_hash(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not len(g):
            return g.drop_columns(["_part"])
        idx = pc.sort_indices(
            g, sort_keys=[("content_hash", "ascending"), ("doc_id", "ascending")]
        )
        s = g.take(idx)
        h = np.asarray(s["content_hash"].to_pylist(), dtype=object)
        first = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        return s.take(pa.array(first)).drop_columns(["_part"])

    uniq = hashed.map_batches(add_part, batch_format="pyarrow").groupby("_part").map_groups(
        keep_min_per_hash, batch_format="pyarrow"
    )
    uniq.write_parquet(out_dir, partition_cols=["lang_pred"])

    shards = ray.data.read_parquet(out_dir)
    return combiner_aggregate(
        shards.map_batches(
            lambda t: pa.table(
                {
                    "lang_pred": pa.compute.cast(t["lang_pred"], pa.string()),
                    "n_tokens": t["n_tokens"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["lang_pred"],
        [(None, "count", "n_docs"), ("n_tokens", "sum", "total_tokens")],
        num_parts=4,
    )


def simhash_dup_pairs(
    sf_dir: str,
    *,
    bands: int = 6,
    band_bits: int = 10,
    max_hamming: int = 6,
    max_bucket_ids: int = 4096,
):
    """SimHash near-dup pairs: banded Hamming-LSH over the 60-bit
    fingerprint (6 bands × 10 bits — pigeonhole guarantees any pair
    within Hamming ≤ 5 collides on some band), then exact popcount
    verification ≤ ``max_hamming`` inside the group. Corpus is
    documents ∪ near-identical ' tail' copies (planted ground truth:
    measured Hamming 0–11 for the copies vs ≥ 8 for unrelated pairs).

    Scale shape: the only shuffles move (band, key, doc_id, simhash) —
    16 B/doc/band — and the tiny verified pair set. Buckets are walked
    inside coarse ``_part`` partitions (vectorized lexsort + boundary
    scan), never via per-key ``map_groups`` — Ray's per-key machinery
    degrades with the ~#docs×bands bucket cardinality (see
    functions/agg.py).
    """
    corpus = _dup_corpus(sf_dir)
    hashed = corpus.map_batches(_task_stage(SimHasher), batch_format="pyarrow").select_columns(
        ["doc_id", "simhash"]
    )

    def band_rows(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(h)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "key": pa.array(
                    np.concatenate(
                        [(h >> (band_bits * b)) & ((1 << band_bits) - 1) for b in range(bands)]
                    ),
                    pa.int64(),
                ),
                "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
                "simhash": pa.array(np.tile(h, bands), pa.int64()),
            }
        )

    from .functions.dedup import popcount64

    def emit_pairs_part(g: pa.Table) -> pa.Table:
        """One coarse partition: lexsort by (band, key), walk bucket
        boundaries, emit verified pairs per bucket — vectorized xor +
        popcount per bucket, star-capped past ``max_bucket_ids`` (a
        degenerate corpus, e.g. empty docs all fingerprinting to 0,
        would otherwise make one bucket O(n²); star pairs still link
        the cluster through its min-id representative, logged because
        they under-report vs the all-pairs oracle)."""
        band = g["band"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hs = g["simhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key, band))
        band, key, ids, hs = band[order], key[order], ids[order], hs[order]
        starts = np.flatnonzero(np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])])
        ends = np.r_[starts[1:], len(band)]
        a_parts, b_parts, d_parts = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            # a doc appears once per band, so rows in a bucket are
            # distinct docs already (sorted by id: row s holds min id)
            if n > max_bucket_ids:
                from .logging_config import get_logger

                get_logger("dedup").warning(
                    "simhash bucket of %d ids star-capped at %d", n, max_bucket_ids
                )
                d = popcount64(np.bitwise_xor(hs[s], hs[s + 1 : e]))
                hit = np.flatnonzero(d <= max_hamming)
                if len(hit):
                    a_parts.append(np.full(len(hit), ids[s]))
                    b_parts.append(ids[s + 1 : e][hit])
                    d_parts.append(d[hit])
                continue
            ii, jj = np.triu_indices(n, k=1)
            d = popcount64(np.bitwise_xor(hs[s:e][ii], hs[s:e][jj]))
            mask = d <= max_hamming
            if mask.any():
                a_parts.append(ids[s:e][ii][mask])
                b_parts.append(ids[s:e][jj][mask])
                d_parts.append(d[mask])
        if not a_parts:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), pa.int64()),
                "b": pa.array(np.concatenate(b_parts), pa.int64()),
                "hamming": pa.array(np.concatenate(d_parts), pa.int64()),
            }
        )

    from .functions.agg import combiner_aggregate, hash_part

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_part(t, ["band", "key"], 32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    cand = hashed.map_batches(band_rows, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    pairs = cand.groupby("_part").map_groups(emit_pairs_part, batch_format="pyarrow")
    return combiner_aggregate(pairs, ["a", "b"], [("hamming", "min", "hamming")])


def events_order_value_range_join(sf_dir: str):
    """Range (interval) join — inequality-only predicate, no equality
    key: pair every event with orders whose scaled price interval
    covers the event's value (``r - 1.0 <= value < r`` with
    ``r = o_totalprice / 1000.0``), counted per order priority.

    Distributed shape: the classic binned interval join — both sides
    hash-bucket by unit-width value bins (an interval lands in every
    bin it overlaps, an event in exactly one), so each candidate pair
    co-locates in exactly one bin group; inside the group the count is
    two vectorized ``searchsorted`` passes, never a per-pair loop. The
    shuffle ships 2–3 small numeric columns per row. Float boundary
    arithmetic (r - 1.0) matches the SQL oracle's expression exactly.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice", "o_orderpriority"]
    )
    events = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def prep_orders(t: pa.Table) -> pa.Table:
        # each interval lands in every unit bin it overlaps — expanded
        # with np.repeat (counts per row), never a per-row Python loop
        r = t["o_totalprice"].to_numpy(zero_copy_only=False) / 1000.0
        lo = r - 1.0
        lo_f = np.floor(lo).astype(np.int64)
        counts = np.floor(r).astype(np.int64) - lo_f + 1
        idx = np.repeat(np.arange(len(r)), counts)
        offs = np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
        prio = t["o_orderpriority"]
        if isinstance(prio, pa.ChunkedArray):
            prio = prio.combine_chunks()
        return pa.table(
            {
                "bin": pa.array(lo_f[idx] + offs, pa.int64()),
                "side": pa.array(np.full(len(idx), "o"), pa.string()),
                "r": pa.array(r[idx], pa.float64()),
                "lo": pa.array(lo[idx], pa.float64()),
                "priority": prio.take(pa.array(idx)),
            }
        )

    def prep_events(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": pa.array(np.floor(v).astype(np.int64), pa.int64()),
                "side": pa.array(["e"] * len(v), pa.string()),
                "r": pa.array(v, pa.float64()),  # event value rides in r
                "lo": pa.array(np.zeros(len(v)), pa.float64()),
                "priority": pa.array([""] * len(v), pa.string()),
            }
        )

    both = orders.map_batches(prep_orders, batch_format="pyarrow").union(
        events.map_batches(prep_events, batch_format="pyarrow")
    )

    def count_group(g: pa.Table) -> pa.Table:
        side = np.asarray(g["side"].to_pylist())
        vals = g["r"].to_numpy(zero_copy_only=False)
        los = g["lo"].to_numpy(zero_copy_only=False)
        prio = np.asarray(g["priority"].to_pylist())
        ev = np.sort(vals[side == "e"])
        out_p, out_n = [], []
        if len(ev):
            omask = side == "o"
            for p in np.unique(prio[omask]):
                sel = omask & (prio == p)
                r_sorted = np.sort(vals[sel])
                lo_sorted = np.sort(los[sel])
                # pairs: lo <= v < r  ⇔  #(lo <= v) − #(r <= v) summed over events
                n = int(
                    np.searchsorted(lo_sorted, ev, side="right").sum()
                    - np.searchsorted(r_sorted, ev, side="right").sum()
                )
                if n:
                    out_p.append(str(p))
                    out_n.append(n)
        return pa.table(
            {
                "o_orderpriority": pa.array(out_p, pa.string()),
                "n_pairs": pa.array(out_n, pa.int64()),
            }
        )

    partial = both.groupby("bin").map_groups(count_group, batch_format="pyarrow")
    return partial.groupby("o_orderpriority").aggregate(_Sum("n_pairs", alias_name="n_pairs"))


def events_hopping_window(sf_dir: str, *, window_sec: int = 3600, hop_sec: int = 1800):
    """Hopping (sliding) windows: size 1 h, hop 30 min — every event
    belongs to ``window_sec // hop_sec`` overlapping windows. The
    flat-map fan-out happens inside ``map_batches`` (vectorized repeat)
    before a single (user, window) aggregate; no per-event Python."""
    overlap = window_sec // hop_sec
    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"])

    def fan_out(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sec = ts_us // 1_000_000
        base = (sec // hop_sec) * hop_sec
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        starts = np.concatenate([base - i * hop_sec for i in range(overlap)])
        return pa.table(
            {
                "user_id": pa.array(np.tile(uid, overlap), pa.int64()),
                "window_start": pa.array(starts, pa.int64()),
                "value_cents": pa.array(np.tile(cents, overlap), pa.int64()),
            }
        )

    from .functions.agg import combiner_aggregate

    fanned = ds.map_batches(fan_out, batch_format="pyarrow")
    return combiner_aggregate(
        fanned,
        ["user_id", "window_start"],
        [(None, "count", "n_events"), ("value_cents", "sum", "total_value")],
    )


def events_value_percentiles(sf_dir: str, *, qs=(0.5, 0.9, 0.99), bin_width: float = 0.25):
    """EXACT distributed percentiles over a numeric column — the
    two-pass histogram shape that holds at 10^10 rows:

    pass 1: bin every value (``floor(v / bin_width)``) and count per
    bin via the combiner tree — the exchange ships one (bin, count)
    partial per block-bin; the driver sees only the histogram (bounded
    by the value domain / bin_width, never by row count). Cumulative
    counts locate, for each q, the bin holding ascending rank
    ``ceil(q·n) − 1`` (DuckDB quantile_disc's rule) and the in-bin
    offset.

    pass 2: re-scan only the few target bins (a ``1/#bins`` sliver;
    with a skewed domain, recurse by re-binning the sliver — not needed
    at fixture scale, asserted instead) and select each offset from
    the bin's sorted values.
    """
    import math

    from .functions.agg import combiner_aggregate

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def binify(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"bin": pa.array(np.floor(v / bin_width).astype(np.int64), pa.int64())})

    hist = (
        combiner_aggregate(ds.map_batches(binify, batch_format="pyarrow"), ["bin"], [(None, "count", "n")])
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    total = int(hist["n"].sum())
    cum_before = hist["n"].cumsum().shift(fill_value=0).to_numpy()
    bins = hist["bin"].to_numpy()
    targets = {}  # bin -> [(q, offset_within_bin)]
    for q in qs:
        rank = math.ceil(q * total) - 1  # 0-based ascending
        i = int(np.searchsorted(cum_before, rank, side="right")) - 1
        targets.setdefault(int(bins[i]), []).append((q, rank - int(cum_before[i])))

    wanted = pa.array(sorted(targets), pa.int64())

    def keep_wanted(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        mask = pa.compute.is_in(pa.array(b, pa.int64()), value_set=wanted)
        return pa.table(
            {"bin": pa.array(b, pa.int64()).filter(mask), "value": t["value"].filter(mask)}
        )

    sliver = ds.map_batches(keep_wanted, batch_format="pyarrow").to_pandas()
    out_q, out_v = [], []
    for b, picks in targets.items():
        vals = np.sort(sliver.loc[sliver["bin"] == b, "value"].to_numpy())
        for q, off in picks:
            out_q.append(q)
            out_v.append(float(vals[off]))
    return pa.table({"pct": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())})


def top_orders_per_priority(sf_dir: str, *, k: int = 3, num_parts: int = 16):
    """Grouped top-k (windowed ranking): the k highest-revenue orders
    within each order priority. Scale shape — ONE exchange: lineitem
    blocks collapse to per-key revenue partials (combiner), both sides
    tag + co-partition by order-key hash, and each partition merges
    partials, attaches the priority with an in-partition Acero hash
    join, and forwards ≤ k·|priorities| head-k candidates to a tiny
    final per-priority rank. (The previous shape — combiner exchange +
    Ray JoinOperator — paid a second all-to-all plus the join
    operator's per-partition actor overhead; measured 4.9 s → this at
    sf0.1/32 CPUs, same green oracle.)"""
    import pyarrow.compute as pc

    from .functions.agg import hash_part

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        t = _cents(t, "l_extendedprice", "rev_cents", "l_discount")
        g = (
            t.select(["l_orderkey", "rev_cents"])
            .group_by(["l_orderkey"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["key", "rev_p"])
        )
        out = pa.table(
            {
                "key": g["key"],
                "rev_p": g["rev_p"],
                "o_orderpriority": pa.nulls(len(g), pa.string()),
                "side": pa.array(np.zeros(len(g), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["key"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def ord_side(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "key": t["o_orderkey"],
                "rev_p": pa.nulls(len(t), pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["key"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def join_topk_part(g: pa.Table) -> pa.Table:
        """Per co-partition: merge revenue partials, attach priority
        (all rows of a key co-locate by the shared hash), keep the
        head-k per priority via one sort + vectorized boundary scan —
        arrow-only (no pandas round-trip: an empty pandas block would
        null-type its string column and trip the executor's schema
        check)."""
        side = g["side"].to_numpy(zero_copy_only=False)
        rev = (
            g.filter(pa.array(side == 0))
            .select(["key", "rev_p"])
            .group_by(["key"])
            .aggregate([("rev_p", "sum")])
            .rename_columns(["o_orderkey", "revenue_cents"])
        )
        od = g.filter(pa.array(side == 1)).select(["key", "o_orderpriority"])
        s = rev.join(od.rename_columns(["o_orderkey", "o_orderpriority"]),
                     keys=["o_orderkey"], join_type="inner")
        s = s.select(["o_orderpriority", "o_orderkey", "revenue_cents"])
        if not len(s):
            return s
        idx = pc.sort_indices(
            s,
            sort_keys=[
                ("o_orderpriority", "ascending"),
                ("revenue_cents", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        s = s.take(idx)
        prio = np.asarray(s["o_orderpriority"].to_pylist(), dtype=object)
        grp_start = np.flatnonzero(np.r_[True, prio[1:] != prio[:-1]])
        sizes = np.diff(np.r_[grp_start, len(prio)])
        pos = np.arange(len(prio)) - np.repeat(grp_start, sizes)
        return s.filter(pa.array(pos < k))

    def rank_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("revenue_cents", "descending"), ("o_orderkey", "ascending")]
        )
        top = g.take(idx.slice(0, k))
        return top.append_column("rk", pa.array(np.arange(1, len(top) + 1), pa.int64()))

    tagged = lineitem.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(ord_side, batch_format="pyarrow")
    )
    cand = tagged.groupby("_part").map_groups(join_topk_part, batch_format="pyarrow")
    ranked = cand.groupby("o_orderpriority").map_groups(rank_group, batch_format="pyarrow")
    return ranked.select_columns(["o_orderpriority", "rk", "o_orderkey", "revenue_cents"])


def top_tokens(sf_dir: str, *, k: int = 20):
    """Distributed word count + global top-k (the canonical vocabulary
    build): lowercase whitespace tokens, per-block arrow value_counts
    (the combiner — a block ships one partial per distinct token, so
    the exchange is bounded by vocabulary size, not token count), a
    coarse-part reduce, block-local top-k candidates, tiny final sort."""
    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["text"])

    def tokenize_count(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+")
        flat = pc.list_flatten(toks)
        vc = flat.combine_chunks().value_counts() if isinstance(flat, pa.ChunkedArray) else flat.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "n_p": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = combiner_aggregate(
        ds.map_batches(tokenize_count, batch_format="pyarrow"),
        ["token"],
        [("n_p", "sum", "n")],
    )

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"), ("token", "ascending")])
        return t.take(idx.slice(0, k))

    top = (
        counts.map_batches(local_topk, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top.insert(0, "rk", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[["rk", "token", "n"]]


def distinct_users_per_day(sf_dir: str):
    """Exact distributed COUNT(DISTINCT): unique active users per UTC
    day over the events stream. Scale shape: block-local (day, user)
    dedup is the combiner (a block ships each pair once), the coarse
    exchange dedups pairs globally, then a per-day count — the classic
    two-level distinct that never collects a user set anywhere."""
    from .functions.agg import combiner_aggregate

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def day_pairs(t: pa.Table) -> pa.Table:
        sec = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        day = (sec // 86400) * 86400
        pairs = pa.table(
            {"day": pa.array(day, pa.int64()), "user_id": t["user_id"]}
        )
        g = pairs.group_by(["day", "user_id"]).aggregate([])
        return g

    uniq = combiner_aggregate(
        ds.map_batches(day_pairs, batch_format="pyarrow"),
        ["day", "user_id"],
        [(None, "count", "_n")],
    )
    per_day = combiner_aggregate(uniq, ["day"], [(None, "count", "n_users")], num_parts=8)
    return per_day


def approx_distinct_users_hll(sf_dir: str, *, b: int = 6):
    """Approximate COUNT(DISTINCT) per day via a deterministic
    HyperLogLog sketch — the mergeable-sketch primitive exact distinct
    can't match at 10^10 rows: per-day state is m = 2^b registers
    (64 here) regardless of user cardinality, and register merge is an
    associative max, so the combiner tree applies unchanged and the
    exchange ships ≤ days·m register rows per block (vs one row per
    distinct (day, user) pair for the exact operator).

    Spec (oracle-mirrored, integer-only rank arithmetic — no libm):
      h      = first 12 hex digits of md5(str(user_id))    (48 bits)
      bucket = h %  m       (low b bits)
      w      = h // m       (the remaining 48−b bits)
      rho    = (48−b) + 1 − bit_length(w)                  (w=0 → 49−b)
      M[day, bucket] = max rho
      raw    = α·m² / (Σ_present 2^−M + (m − n_present)),
      est    = m·ln(m/(m−n_present))  if raw ≤ 2.5m and n_present < m
               (Flajolet et al. 2007 linear-counting small-range
               correction)  else raw,
    α = 0.7213/(1 + 1.079/m). No large-range correction (48-bit hash
    space makes it moot). The one float reduction (Σ 2^−M) sums
    dyadic rationals spanning < 53 bits, so it is EXACT in any
    accumulation order — safe under Ray's nondeterministic block
    order AND bit-identical to DuckDB's sum; the correction's ln has
    only 63 possible inputs (n_present ∈ 1..63) and numpy/DuckDB
    agree on all of them at the 6-decimal rounding (verified).

    bit_length is np.frexp's exponent (exact for ints < 2^53) on the
    Ray side and length(bin(w)) on the DuckDB side — no log2 rounding
    anywhere."""
    import hashlib as _h

    from .functions.agg import combiner_aggregate

    m = 1 << b
    wbits = 48 - b
    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def sketch(t: pa.Table) -> pa.Table:
        sec = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        day = (sec // 86400) * 86400
        pairs = pa.table(
            {"day": pa.array(day, pa.int64()), "user_id": t["user_id"]}
        )
        # block-local (day, user) dedup: md5 is the per-row spec cost,
        # pay it once per distinct pair in the block
        g = pairs.group_by(["day", "user_id"]).aggregate([])
        guid = g["user_id"].to_numpy(zero_copy_only=False)
        md5 = _h.md5
        h = np.fromiter(
            (int(md5(str(u).encode()).hexdigest()[:12], 16) for u in guid),
            dtype=np.int64,
            count=len(guid),
        )
        w = h >> b
        _, bl = np.frexp(w.astype(np.float64))  # bit_length; exact < 2^53
        rho = (wbits + 1) - bl.astype(np.int64)
        reg = (
            pa.table(
                {
                    "day": g["day"],
                    "bucket": pa.array(h % m, pa.int64()),
                    "rho": pa.array(rho, pa.int64()),
                }
            )
            .group_by(["day", "bucket"])
            .aggregate([("rho", "max")])
        )
        return reg.rename_columns(["day", "bucket", "rho"])

    partials = ds.map_batches(sketch, batch_format="pyarrow")
    regs = combiner_aggregate(partials, ["day", "bucket"], [("rho", "max", "M")], num_parts=8)

    def pow_stage(t: pa.Table) -> pa.Table:
        mv = t["M"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"day": t["day"], "pow": pa.array(np.ldexp(1.0, -mv), pa.float64())}
        )

    per_day = combiner_aggregate(
        regs.map_batches(pow_stage, batch_format="pyarrow"),
        ["day"],
        [(None, "count", "n_regs"), ("pow", "sum", "_s")],
        num_parts=4,
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * (m * m)

    def finalize(t: pa.Table) -> pa.Table:
        s = t["_s"].to_numpy(zero_copy_only=False)
        n = t["n_regs"].to_numpy(zero_copy_only=False)
        raw = num / (s + (m - n))
        # linear counting where empty registers exist and raw ≤ 2.5m
        # (guard the ln argument: where() still evaluates both arms)
        lc = m * np.log(m / np.maximum(m - n, 1).astype(np.float64))
        est = np.round(np.where((raw <= 2.5 * m) & (n < m), lc, raw), 6)
        return pa.table(
            {
                "day": t["day"],
                "n_regs": pa.array(n, pa.int64()),
                "approx_users": pa.array(est, pa.float64()),
            }
        )

    return per_day.map_batches(finalize, batch_format="pyarrow")


def documents_hash_sample(sf_dir: str, *, percent: int = 10, outer_percent: int = 50):
    """Deterministic hash sampling — the reproducible-at-scale sampling
    primitive (same rows on every run / cluster size, no RNG state to
    coordinate): keep rows where md5(doc_id) mod 100 < outer_percent
    (the 50 % `half` sample), and flag the nested `tenth`
    (bucket < percent ⊂ bucket < outer_percent) so downstream can use
    either rate from ONE hashing pass — the observable nesting round 2
    lacked (in_half was constant True on the 10 % survivors)."""

    ds = _docs_ds(sf_dir, ["doc_id", "lang"])

    def sample(t: pa.Table) -> pa.Table:
        import hashlib as _h

        # bulk-build the decimal-string bytes (vectorized np.char), md5
        # per row is the spec (mirrored by the oracle SQL)
        dec = np.char.mod("%d", t["doc_id"].to_numpy(zero_copy_only=False))
        md5 = _h.md5
        bucket = np.fromiter(
            (int.from_bytes(md5(s.encode()).digest()[:4], "big") % 100 for s in dec),
            dtype=np.int64,
            count=len(dec),
        )
        keep = bucket < outer_percent
        out = t.filter(pa.array(keep))
        return out.append_column("in_tenth", pa.array(bucket[keep] < percent, pa.bool_()))

    return ds.map_batches(sample, batch_format="pyarrow")


# --------------------------------------------------------------------------
# PII redaction + benchmark decontamination (training-data hygiene stages)
# --------------------------------------------------------------------------

# (name, pattern, replacement) — patterns restricted to constructs whose
# match semantics are identical under Python re and RE2/DuckDB (no
# alternation whose leftmost-first vs leftmost-longest diverge, no
# backreferences), so the oracle recomputes counts and redacted lengths
# exactly. Replacement order is part of the spec (email → ip → phone).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}(?:\.\d{1,3}){3}\b", "[IP]"),
    ("phone", r"\+1 \d{3}-\d{4}", "[PHONE]"),
]


def _pii_corpus(sf_dir: str):
    """documents ∪ PII-injected copies (id+3M, doc_id % 5 == 0): planted
    ground truth — the fixture text is PII-free word salad, so the
    injected contact lines are what makes every count column
    value-bearing (the oracle rebuilds the same corpus closed-form).
    The per-row f-string below is plant construction for the test
    corpus, not part of the scan path."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = t.filter(pa.array(ids % 5 == 0))
        sid = sel["doc_id"].to_numpy(zero_copy_only=False)
        suffix = [
            f" contact user{u}@example.com ip 10.{u % 256}.0.1 tel +1 555-{u % 10000:04d}"
            for u in sid
        ]
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], 3_000_000),
                "text": pc.binary_join_element_wise(sel["text"], pa.array(suffix), ""),
            }
        )

    return ds.union(ds.map_batches(inject, batch_format="pyarrow"))


class PiiRedactor:
    """Actor-pool PII scrubber — fully vectorized (round-4: the per-row
    Python ``findall``/``sub`` loops became Arrow RE2 kernels, valid
    precisely because PII_PATTERNS is restricted to the re/RE2-agreeing
    subset): per category one ``count_substring_regex`` over the
    original text and one ``replace_substring_regex`` folded over the
    running redaction, then a codepoint-length diff. Output: per-doc
    match counts per category and the redaction char delta. Equality
    with the Python-re reference implementation is test-pinned."""

    def __init__(self):
        self.pats = list(PII_PATTERNS)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t["text"]
        out = {"doc_id": t["doc_id"]}
        redacted = col
        for name, pat, repl in self.pats:
            out[f"n_{name}"] = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
            redacted = pc.replace_substring_regex(redacted, pat, repl)
        out["chars_removed"] = pc.cast(
            pc.subtract(pc.utf8_length(col), pc.utf8_length(redacted)), pa.int64()
        )
        return pa.table(out)


def pii_redaction_stats(sf_dir: str, *, concurrency=None):
    """PII redaction over the (planted) corpus: per-doc email/ip/phone
    match counts + chars removed by the three-pass substitution. Scale
    shape: one map_batches, no shuffle, text never leaves the stage —
    and since round-4 the stage is stateless Arrow-RE2 kernels, it runs
    as uncapped tasks (the old 8-actor pool ceiling cost ~25% at 32
    CPUs) unless an explicit actor concurrency is requested."""
    if concurrency is not None:
        return _pii_corpus(sf_dir).map_batches(
            PiiRedactor, batch_format="pyarrow", concurrency=concurrency
        )
    return _pii_corpus(sf_dir).map_batches(_task_stage(PiiRedactor), batch_format="pyarrow")


def benchmark_decontamination(sf_dir: str, *, n: int = 8, num_parts: int = 32):
    """Benchmark (test-set) decontamination — the standard pre-training
    hygiene pass: flag every training doc sharing any word ``n``-gram
    with a held-out benchmark set.

    Benchmark = docs with ``doc_id % 7 == 0``; eval corpus = the other
    docs ∪ planted contaminated copies (id+2M for ``doc_id % 14 == 0``:
    'zzz pad ' + the benchmark doc's first 10 words + ' qqq pad' — 3
    genuinely shared 8-grams each, so `contaminated` discriminates).

    Gram key: 60-bit md5 prefix of the space-joined n words (the
    simhash word-hash spec, SQL-reproducible). Scale shape — fully
    distributed, NO driver-side set and NO broadcast of the benchmark
    side (at 100 TB the benchmark can itself be huge):
      1. one map_batches emits (gh, doc_id) grams for both sides
         (bench rows tagged doc_id = -1) plus a zero-weight sentinel
         per eval doc so gram-less docs still appear;
      2. gh-partitioned walk (`groupby(_part).map_groups`, coarse
         num_parts groups — the simhash_dup_pairs pattern): per
         partition, vectorized np.isin of the distinct eval grams
         against the partition's bench-gram set. A (doc_id, gh) pair
         lives in exactly one partition, so per-partition distinct is
         globally distinct;
      3. combiner-tree sum per doc_id (functions/agg.py).
    """
    docs = _docs_ds(sf_dir, ["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = t.filter(pa.array(ids % 7 == 0))
        return _gram_rows(sel["text"].to_pylist(), None, n)

    def eval_grams(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ev = t.filter(pa.array(ids % 7 != 0))
        parts = [_gram_rows(ev["text"].to_pylist(), ev["doc_id"].to_numpy(zero_copy_only=False), n)]
        planted = t.filter(pa.array(ids % 14 == 0))
        if planted.num_rows:
            ptexts = [
                "zzz pad " + " ".join(s.strip().split()[:10]) + " qqq pad"
                for s in planted["text"].to_pylist()
            ]
            pids = _pc.add(planted["doc_id"], 2_000_000).to_numpy(zero_copy_only=False)
            parts.append(_gram_rows(ptexts, pids, n))
        return pa.concat_tables(parts)

    all_grams = docs.map_batches(bench_grams, batch_format="pyarrow").union(
        docs.map_batches(eval_grams, batch_format="pyarrow")
    )

    def add_part(t: pa.Table) -> pa.Table:
        gh = t["gh"].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array((gh % num_parts).astype(np.int64), pa.int64()))

    def walk_part(t: pa.Table) -> pa.Table:
        gh = t["gh"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        bench_set = np.unique(gh[did < 0])
        emask = did >= 0
        e_gh, e_id = gh[emask], did[emask]
        if not len(e_id):
            return pa.table({"doc_id": pa.array([], pa.int64()), "hits": pa.array([], pa.int64())})
        # distinct (doc_id, gh) then per-doc hit sum — all vectorized
        order = np.lexsort((e_gh, e_id))
        e_gh, e_id = e_gh[order], e_id[order]
        keep = np.ones(len(e_id), dtype=bool)
        keep[1:] = (e_id[1:] != e_id[:-1]) | (e_gh[1:] != e_gh[:-1])
        e_gh, e_id = e_gh[keep], e_id[keep]
        hit = np.isin(e_gh, bench_set).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, e_id[1:] != e_id[:-1]])
        sums = np.add.reduceat(hit, starts) if len(hit) else np.array([], dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(e_id[starts], pa.int64()), "hits": pa.array(sums, pa.int64())}
        )

    from .functions.agg import combiner_aggregate

    partials = (
        all_grams.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(walk_part, batch_format="pyarrow")
    )
    per_doc = combiner_aggregate(
        partials, ["doc_id"], [("hits", "sum", "n_contaminated_grams")], num_parts=16
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nh = t["n_contaminated_grams"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_contaminated_grams": nh,
                "contaminated": pc.greater(nh, 0),
            }
        )

    return per_doc.map_batches(finalize, batch_format="pyarrow")


def _gram_rows(texts: list, ids, n: int) -> pa.Table:
    """(gh, doc_id) gram rows for a batch of texts; ids=None tags the
    benchmark side (doc_id = -1). Every eval doc also emits ONE
    sentinel row (gh = -1, never a real 60-bit md5 value) so docs with
    fewer than n words still surface with zero hits. md5-per-gram is
    the spec the oracle mirrors (as with the minhash word hashes)."""
    import hashlib as _h

    md5 = _h.md5
    gh_l: list = []
    id_l: list = []
    for row_i, s in enumerate(texts):
        words = s.strip().split()
        doc = -1 if ids is None else int(ids[row_i])
        if ids is not None:
            gh_l.append(-1)
            id_l.append(doc)
        for i in range(len(words) - n + 1):
            g = " ".join(words[i : i + n])
            gh_l.append(int(md5(g.encode()).hexdigest()[:15], 16))
            id_l.append(doc)
    return pa.table({"gh": pa.array(gh_l, pa.int64()), "doc_id": pa.array(id_l, pa.int64())})


def intradoc_repetition_removal(sf_dir: str, *, para_words: int = 15):
    """Intra-document repetition removal (Dolma/RefinedWeb-style
    boilerplate stripping): drop repeated paragraphs within each doc,
    keeping the first occurrence, and report the size delta.

    Corpus: each doc's text chunked into ``para_words``-word
    paragraphs; docs with ``doc_id % 3 == 0`` get their FIRST paragraph
    replanted at the end (the repeated-boilerplate ground truth the
    oracle reconstructs closed-form). Scale shape: one map_batches, no
    shuffle — repetition removal is per-document by construction."""

    ds = _docs_ds(sf_dir, ["doc_id", "text"])

    def dedup_paras(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        n_paras: list = []
        n_uniq: list = []
        before: list = []
        after: list = []
        for did, s in zip(ids, texts):
            words = s.strip().split()
            paras = [
                " ".join(words[i : i + para_words]) for i in range(0, len(words), para_words)
            ]
            if did % 3 == 0 and paras:
                paras.append(paras[0])
            seen: set = set()
            kept = []
            for p in paras:
                if p not in seen:
                    seen.add(p)
                    kept.append(p)
            n_paras.append(len(paras))
            n_uniq.append(len(kept))
            before.append(len("\n".join(paras)))
            after.append(len("\n".join(kept)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_paras": pa.array(n_paras, pa.int64()),
                "n_unique_paras": pa.array(n_uniq, pa.int64()),
                "chars_before": pa.array(before, pa.int64()),
                "chars_after": pa.array(after, pa.int64()),
            }
        )

    return ds.map_batches(dedup_paras, batch_format="pyarrow")


def events_user_running(sf_dir: str, *, num_parts: int = 32):
    """Row-window functions (running SUM, ROW_NUMBER, LAG) over a keyed
    ordered stream — per-user running spend, event rank, and
    inter-event gap — without per-key ``map_groups``:

    hash(user) → coarse ``_part`` (task count bounded by ``num_parts``
    regardless of user cardinality), each partition lexsorted ONCE by
    (user, ts, event_id) — event_id is unique so the order (and every
    window result) is deterministic — then one vectorized segmented
    scan: ``rn`` from a running segment-start index, the running sum
    from one ``np.cumsum`` minus its value at each segment start, and
    the LAG gap from a shifted diff masked at segment boundaries
    (first row per user → -1 sentinel, keeping the column int64).

    Money is integer cents (``floor(v*100 + 0.5)``, the repo-standard
    oracle-identical rounding) so the running sum is exact integer
    arithmetic — immune to float accumulation-order differences
    between numpy's sequential cumsum and DuckDB's window segment
    tree."""
    from .functions.agg import hash_part

    ds = _read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_part(t: pa.Table) -> pa.Table:
        t = _cents(t, "value", "cents").drop_columns(["value"])
        part = hash_part(t, ["user_id"], num_parts)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def run_part(g: pa.Table) -> pa.Table:
        n = len(g)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsus = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsus, uid))
        uid, tsus, eid, cents = uid[order], tsus[order], eid[order], cents[order]
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = uid[1:] != uid[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_seg, idx, 0))
        rn = idx - seg_start + 1
        cs = np.cumsum(cents)
        run = cs - np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0)
        gap = np.full(n, -1, dtype=np.int64)
        if n > 1:
            gap[1:] = np.where(new_seg[1:], -1, tsus[1:] - tsus[:-1])
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                "run_cents": pa.array(run, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    parts = ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("_part").map_groups(run_part, batch_format="pyarrow")


def customers_without_events(sf_dir: str, *, num_parts: int = 32):
    """Distributed ANTI-JOIN: customers with zero event activity (the
    churn/inactivity query). Scale shape — both sides large, neither
    broadcast:

    1. the probe side collapses block-locally to its DISTINCT keys
       (a block ships each user_id once — the anti-join's combiner);
    2. both sides are tagged and hash-co-partitioned on the key into
       ``num_parts`` coarse partitions (one exchange, bounded by
       distinct keys + customer rows, never by event count);
    3. each partition filters its customer rows with one vectorized
       ``is_in`` against the probe keys present in that partition —
       correctness needs only that equal keys co-locate, which the
       shared hash guarantees.

    Degenerate-skew note: a hot user_id contributes ONE key per block
    to the exchange, so partition sizes are bounded by distinct-key
    counts — no star-cap needed."""
    from .functions.agg import hash_part

    cust = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
    )
    events = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])

    def probe_keys(t: pa.Table) -> pa.Table:
        keys = pa.table({"key": t["user_id"]}).group_by(["key"]).aggregate([])
        out = pa.table(
            {
                "key": keys["key"],
                "c_name": pa.nulls(len(keys), pa.string()),
                "c_acctbal": pa.nulls(len(keys), pa.float64()),
                "side": pa.array(np.ones(len(keys), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["key"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def build_side(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "key": t["c_custkey"],
                "c_name": t["c_name"],
                "c_acctbal": t["c_acctbal"],
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["key"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def anti_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g["side"].to_numpy(zero_copy_only=False)
        present = g["key"].filter(pa.array(side == 1))
        left = g.filter(pa.array(side == 0))
        hit = pc.is_in(left["key"], value_set=present.combine_chunks().unique())
        keep = left.filter(pc.invert(hit))
        return pa.table(
            {
                "c_custkey": keep["key"],
                "c_name": keep["c_name"],
                "c_acctbal": keep["c_acctbal"],
            }
        )

    tagged = cust.map_batches(build_side, batch_format="pyarrow").union(
        events.map_batches(probe_keys, batch_format="pyarrow")
    )
    return tagged.groupby("_part").map_groups(anti_part, batch_format="pyarrow")


def tfidf_top_terms_by_lang(sf_dir: str, *, k: int = 10, num_buckets: int = 16):
    """TF-IDF salient-term extraction per language — the classic
    corpus-analysis primitive (what words characterize each slice).

    Spec (oracle-mirrored; rational IDF — ``n_docs / df`` with NO
    logarithm, a deliberate libm-free choice so DuckDB reproduces the
    score bit-for-bit):
      token        = lowercase whitespace token (top_tokens' spec)
      tf(lang, t)  = total occurrences of t in lang
      df(t)        = number of DOCUMENTS containing t (corpus-wide)
      score        = round(tf · (n_docs / df), 6)
    Top-k per lang by (score DESC, token ASC).

    Scale shape — ONE exchange: a block ships one tf partial per
    distinct (lang, token) and one df partial per distinct token
    (both bounded by vocabulary, not token count; df's block partial
    dedups tokens WITHIN each doc first, so a doc counts once), both
    partial kinds tag + co-partition by token hash, and each
    partition merges its partials, joins tf↔df with an in-partition
    Acero hash join (all rows of a token co-locate), scores
    vectorized, and forwards ≤ k·|langs| head-k candidates to a tiny
    final per-lang rank. (The previous shape fed Ray's JoinOperator
    from two combiner trees — a second exchange, and the sort
    groupby's occasional 0-column empty bundles sporadically crashed
    the join's Acero finalize with 'No match for FieldRef token'.)"""
    import pyarrow.compute as pc

    from .functions.agg import hash_part

    ds = _docs_ds(sf_dir, ["text", "lang"])
    n_docs = ds.count()

    def partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+"
        )
        flat = pc.list_flatten(toks)
        doc = pc.list_parent_indices(toks)
        lang = t["lang"].take(doc)
        tf = (
            pa.table({"lang": lang, "token": flat})
            .group_by(["lang", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "token", "cnt"])
        )
        per_doc = (
            pa.table({"d": doc, "token": flat}).group_by(["d", "token"]).aggregate([])
        )
        vc_src = per_doc["token"]
        if isinstance(vc_src, pa.ChunkedArray):
            vc_src = vc_src.combine_chunks()
        vc = vc_src.value_counts()
        both = pa.table(
            {
                "token": pa.concat_arrays(
                    [tf["token"].combine_chunks(), vc.field("values")]
                ),
                "lang": pa.concat_arrays(
                    [
                        tf["lang"].combine_chunks(),
                        pa.nulls(len(vc), pa.string()),
                    ]
                ),
                "cnt": pa.concat_arrays(
                    [
                        tf["cnt"].cast(pa.int64()).combine_chunks(),
                        pc.cast(vc.field("counts"), pa.int64()),
                    ]
                ),
                "side": pa.array(
                    np.r_[
                        np.zeros(len(tf), dtype=np.int8),
                        np.ones(len(vc), dtype=np.int8),
                    ]
                ),
            }
        )
        part = hash_part(both, ["token"], num_buckets)
        return both.append_column("_part", pa.array(part, pa.int32()))

    def score_topk_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        tf = (
            g.filter(pa.array(side == 0))
            .select(["lang", "token", "cnt"])
            .group_by(["lang", "token"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["lang", "token", "tf"])
        )
        df = (
            g.filter(pa.array(side == 1))
            .select(["token", "cnt"])
            .group_by(["token"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["token", "df"])
        )
        t = tf.join(df, keys=["token"], join_type="inner")
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.round(tfv * (np.float64(n_docs) / dfv), 6)
        t = pa.table(
            {
                "lang": t["lang"],
                "token": t["token"],
                "tf": t["tf"],
                "df": t["df"],
                "score": pa.array(s, pa.float64()),
            }
        )
        if not len(t):
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("lang", "ascending"),
                ("score", "descending"),
                ("token", "ascending"),
            ],
        )
        t = t.take(idx)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        new = np.ones(len(t), dtype=bool)
        new[1:] = lang[1:] != lang[:-1]
        pos = np.arange(len(t)) - np.maximum.accumulate(
            np.where(new, np.arange(len(t)), 0)
        )
        return t.filter(pa.array(pos < k))

    def rank_lang(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("score", "descending"), ("token", "ascending")]
        )
        g = g.take(idx.slice(0, k))
        return g.append_column("rk", pa.array(np.arange(1, len(g) + 1), pa.int64()))

    cand = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(score_topk_part, batch_format="pyarrow")
    )
    out = cand.groupby("lang").map_groups(rank_lang, batch_format="pyarrow")
    return out.select_columns(["lang", "rk", "token", "tf", "df", "score"])


def events_value_quantile_sketch(
    sf_dir: str, *, qs=(0.5, 0.9, 0.99), bin_width: float = 0.25
):
    """GROUPED approximate quantiles in ONE pass — the mergeable
    histogram sketch (per-group state bounded by the value domain /
    bin_width, merge = integer count addition). The exact operator
    (``events_value_percentiles``) needs a second targeted scan and is
    global-only; this is the per-group scale path: quantiles of
    ``value`` per event_type with error ≤ bin_width, no per-group sort
    anywhere, one combiner-tree exchange shipping (type, bin, count)
    partials.

    Estimate spec (oracle-mirrored, float-op-identical):
      bin     = floor(v / bin_width)                (single IEEE div)
      rank    = ceil(q·n)          (1-based, per group)
      target  = first bin with cumulative count ≥ rank
      est     = bin·w + w·(rank − cum_before) / n_bin
    i.e. linear interpolation of the rank's offset inside its bin; the
    expression is evaluated with the same operation order on both
    sides, and the driver-side finalize touches only the histogram —
    bounded by domain/bin_width · #groups, independent of row count."""
    import math

    from .functions.agg import combiner_aggregate

    w = bin_width
    ds = _read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def binify(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "bin": pa.array(np.floor(v / w).astype(np.int64), pa.int64()),
            }
        )

    hist = (
        combiner_aggregate(
            ds.map_batches(binify, batch_format="pyarrow"),
            ["event_type", "bin"],
            [(None, "count", "n")],
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["event_type", "bin"])
        .reset_index(drop=True)
    )

    out_t, out_q, out_v = [], [], []
    for etype, g in hist.groupby("event_type", sort=True):
        bins = g["bin"].to_numpy()
        counts = g["n"].to_numpy()
        total = int(counts.sum())
        cum = np.cumsum(counts)
        cum_before = cum - counts
        for q in qs:
            rank = math.ceil(q * total)
            i = int(np.searchsorted(cum, rank, side="left"))
            est = bins[i] * w + w * float(rank - cum_before[i]) / float(counts[i])
            out_t.append(etype)
            out_q.append(q)
            out_v.append(est)
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "pct": pa.array(out_q, pa.float64()),
            "approx_value": pa.array(out_v, pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Round 3 (cont.): sequence mining, deterministic sampling, chunking,
# vector aggregation, bloom-accelerated semi-join
# --------------------------------------------------------------------------


def event_transition_counts(sf_dir: str, *, num_parts: int = 32):
    """Event-sequence mining: the per-user transition (Markov bigram)
    matrix — how often event B follows event A in a user's ordered
    stream. The per-key-sequential shape is the same as sessionize /
    the window functions, so it reuses the scale pattern:

    hash(user) → coarse ``_part`` (task count bounded by ``num_parts``,
    never user cardinality), one lexsort per partition by
    (user, ts, event_id) — event_id unique ⇒ deterministic order —
    then one vectorized shift: consecutive row pairs within the same
    user are transitions. Each partition collapses its pairs to
    (prev, cur, count) partials via arrow group_by (≤ |types|² rows
    per partition), and a tiny combiner exchange sums them — the
    final shuffle is bounded by the transition-type vocabulary, not
    the event count."""
    from .functions.agg import combiner_aggregate, hash_part

    ds = _read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_part(t, ["user_id"], num_parts)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def trans_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(g)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsus = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsus, uid))
        etype = g["event_type"].take(pa.array(order)).combine_chunks()
        uid = uid[order]
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = uid[1:] == uid[:-1]
        cur_idx = np.nonzero(same)[0]
        pairs = pa.table(
            {
                "prev_type": etype.take(pa.array(cur_idx - 1)),
                "cur_type": etype.take(pa.array(cur_idx)),
            }
        )
        out = pairs.group_by(["prev_type", "cur_type"]).aggregate([([], "count_all")])
        return out.rename_columns(["prev_type", "cur_type", "n_p"])

    parts = ds.map_batches(add_part, batch_format="pyarrow")
    partials = parts.groupby("_part").map_groups(trans_part, batch_format="pyarrow")
    return combiner_aggregate(
        partials, ["prev_type", "cur_type"], [("n_p", "sum", "n")], num_parts=4
    )


def reservoir_sample_per_group(sf_dir: str, *, k: int = 8):
    """Deterministic per-group uniform sample (the distributed
    "reservoir"): the k docs per language with the SMALLEST
    md5(doc_id) rank — same rows on every run and every cluster
    size, no RNG state to coordinate, and mergeable: block-local
    per-group head-k candidates (a block ships ≤ k rows per group,
    so the final exchange is bounded by k · groups · blocks, never
    corpus size), then one tiny per-group rank.

    Rank spec (oracle-mirrored, same md5-prefix integer as
    ``documents_hash_sample``): hkey = int(md5(str(doc_id))[:4]),
    ties broken by doc_id (md5 collisions at 32 bits are possible at
    scale, never ambiguous)."""
    import pyarrow.compute as pc

    ds = _docs_ds(sf_dir, ["doc_id", "lang"])

    def add_hkey(t: pa.Table) -> pa.Table:
        import hashlib as _h

        dec = np.char.mod("%d", t["doc_id"].to_numpy(zero_copy_only=False))
        md5 = _h.md5
        hkey = np.fromiter(
            (int.from_bytes(md5(s.encode()).digest()[:4], "big") for s in dec),
            dtype=np.int64,
            count=len(dec),
        )
        return t.append_column("hkey", pa.array(hkey, pa.int64()))

    def local_headk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("lang", "ascending"),
                ("hkey", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(idx)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        new = np.ones(len(t), dtype=bool)
        new[1:] = lang[1:] != lang[:-1]
        idxs = np.arange(len(t))
        pos = idxs - np.maximum.accumulate(np.where(new, idxs, 0))
        return t.filter(pa.array(pos < k))

    def rank_lang(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("hkey", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(idx.slice(0, k))
        return g.append_column("rk", pa.array(np.arange(1, len(g) + 1), pa.int64()))

    cand = ds.map_batches(add_hkey, batch_format="pyarrow").map_batches(
        local_headk, batch_format="pyarrow"
    )
    out = cand.groupby("lang").map_groups(rank_lang, batch_format="pyarrow")
    return out.select_columns(["lang", "rk", "doc_id", "hkey"])


def doc_chunking_stats(sf_dir: str, *, size: int = 64, stride: int = 48):
    """Training-sample chunking: split each document into overlapping
    ``size``-token windows every ``stride`` tokens (the standard
    pretraining packing step) — fully vectorized, and the chunk TEXT
    is never materialized: per-chunk char length comes from a prefix
    sum over flat token lengths (chars(s..e) = cum[e] − cum[s] − 1,
    with cum over len(token)+1 — exactly
    ``length(array_to_string(tokens[s+1:e], ' '))``).

    Token spec (oracle-mirrored, same as ``top_tokens`` minus the
    lowercasing): whitespace split of trim(text); chunk starts at
    0, stride, 2·stride, … while start < n_tokens. Per-doc work is a
    pure flat_map expansion — embarrassingly parallel, no shuffle at
    all; a real exporter would emit the chunk text/token ids with the
    same indices into ``write_parquet``."""
    import pyarrow.compute as pc

    ds = _docs_ds(sf_dir, ["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_len = (
            pc.utf8_length(pc.list_flatten(toks))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # prefix sum over (len(tok) + 1): joined chars of tokens s..e
        # (e exclusive) = cum[e] - cum[s] - 1
        cum = np.zeros(len(flat_len) + 1, dtype=np.int64)
        np.cumsum(flat_len + 1, out=cum[1:])
        offs = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offs[1:])
        # chunk fan-out: doc d emits ceil(n_tok/stride) starts (n_tok >= 1
        # always: a regex split yields at least one element)
        n_chunks = (n_tok - 1) // stride + 1
        doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_chunks)
        chunk_starts = np.zeros(len(n_chunks) + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=chunk_starts[1:])
        chunk_id = np.arange(len(doc_idx), dtype=np.int64) - chunk_starts[doc_idx]
        s = chunk_id * stride
        e = np.minimum(s + size, n_tok[doc_idx])
        gs, ge = offs[doc_idx] + s, offs[doc_idx] + e
        n_chars = cum[ge] - cum[gs] - 1
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "n_tokens": pa.array(e - s, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def embedding_kmeans_step(sf_dir: str, *, k: int = 4, num_parts: int = 8):
    """One deterministic Lloyd (k-means) iteration over the embedding
    corpus — the building block of mini-batch k-means, the scalable
    clustering a curation pipeline runs for topic balancing and
    coverage audits. Seeds are the ``k`` smallest-``vec_id`` vectors
    (the same deterministic head the ANN queries use); each vector is
    assigned to its max-cosine seed (ties → smallest seed index, which
    is ``np.argmax``'s first-max rule and the oracle's ``ORDER BY sim
    DESC, cid`` rank-1), and the new centroids are per-(cluster, dim)
    means under the repo-standard integer-millionths quantization — so
    the sums are associative integer arithmetic through the combiner
    tree and the mean is ONE double division on both sides.

    Scale shape: the seed matrix broadcasts once (``ray.put``); a block
    collapses to ≤ k·dim partial rows (cosine argmax is one float64
    matmul against the unit-normalized seeds — the vector's own norm
    can't change its argmax — then ``np.add.reduceat`` over the
    cluster-sorted quantized matrix); the exchange ships only partials
    and the output is k·dim rows, independent of corpus size. Empty
    clusters emit nothing (both sides)."""
    from .functions.agg import combiner_aggregate
    from .functions.ann import list_col_to_matrix

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = _parquet_head(path, ["vec_id", "embedding"], k)
    seeds = list_col_to_matrix(head["embedding"]).astype(np.float64)
    seeds_unit = seeds / np.linalg.norm(seeds, axis=1, keepdims=True)
    ref = ray.put(seeds_unit)

    ds = _read_parquet(path, columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        su = ray.get(ref)
        mat = list_col_to_matrix(t["embedding"]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ su.T  # (n, k)
        cl = np.argmax(sims, axis=1).astype(np.int64)  # first max = smallest cid
        q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        dim = q.shape[1]
        order = np.argsort(cl, kind="stable")
        cl_s = cl[order]
        starts = np.nonzero(np.r_[True, cl_s[1:] != cl_s[:-1]])[0]
        sums = np.add.reduceat(q[order], starts, axis=0)
        counts = np.diff(np.r_[starts, len(cl_s)])
        g = len(starts)
        return pa.table(
            {
                "cluster": pa.array(np.repeat(cl_s[starts], dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), g), pa.int64()),
                "q_p": pa.array(sums.ravel(), pa.int64()),
                "n_p": pa.array(np.repeat(counts.astype(np.int64), dim), pa.int64()),
            }
        )

    agg = combiner_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cluster", "dim"],
        [("q_p", "sum", "q"), ("n_p", "sum", "n")],
        num_parts=num_parts,
    )

    def finalize(t: pa.Table) -> pa.Table:
        q = t["q"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "cluster": t["cluster"],
                "dim": t["dim"],
                "centroid": pa.array(q / (n * 1e6), pa.float64()),
                "n_members": t["n"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def embedding_centroids_by_label(sf_dir: str, *, num_parts: int = 8):
    """Per-group vector mean (the embedding-centroid primitive behind
    k-means init, class prototypes, and cluster quality checks) as a
    combiner tree over ``list<float>`` columns.

    Exactness spec: each float32 component is quantized to exact
    integer millionths — q = floor(float64(v)·1e6 + 0.5), the
    repo-standard oracle-identical rounding — so the vector sums are
    associative integer arithmetic (immune to float accumulation
    order), and the centroid is ONE deterministic double division
    sum_q / (n · 1e6) on both sides.

    Scale shape: a block collapses to |labels| · dim partial rows
    (np.add.reduceat over the label-sorted matrix — one pass, no
    per-label loop), the exchange ships only those partials, and the
    output is |labels| · dim rows — independent of corpus size."""
    from .functions.agg import combiner_aggregate

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = _read_parquet(path, columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0]) if len(emb) else 0
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = np.floor(flat * 1e6 + 0.5).astype(np.int64).reshape(len(t), dim)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.nonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])[0]
        sums = np.add.reduceat(mat[order], starts, axis=0)  # (groups, dim)
        counts = np.diff(np.r_[starts, len(lab_s)])
        g = len(starts)
        return pa.table(
            {
                "label": pa.array(np.repeat(lab_s[starts], dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), g), pa.int64()),
                "q_p": pa.array(sums.ravel(), pa.int64()),
                "n_p": pa.array(np.repeat(counts.astype(np.int64), dim), pa.int64()),
            }
        )

    agg = combiner_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("q_p", "sum", "q"), ("n_p", "sum", "n")],
        num_parts=num_parts,
    )

    def finalize(t: pa.Table) -> pa.Table:
        q = t["q"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "label": t["label"],
                "dim": t["dim"],
                "n": t["n"],
                "centroid": pa.array(q / (n * 1e6), pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def lineitem_semijoin_bloom(
    sf_dir: str,
    *,
    threshold: float = 450_000.0,
    m_bits: int = 1 << 17,
    num_parts: int = 32,
):
    """Bloom-accelerated SEMI-JOIN: revenue of lineitems whose order
    exceeds a price threshold — the "filter a huge fact table by a
    selective dimension predicate" shape where shipping the whole
    fact table into a shuffle join is the classic waste.

    Plan (exact result; the bloom is pure acceleration and its false
    positives are removed, so the oracle is plain SQL):

    1. build side: qualifying o_orderkey → 2 bloom bit indices per
       key, block-local DISTINCT (≤ 2·keys/block rows ship);
    2. the distinct bit set (≤ ``m_bits`` rows — bounded by the
       filter size, independent of data scale) folds into one bitmap
       on the driver and broadcasts via ``ray.put`` — every probe
       task reads the same object-store copy;
    3. probe side: one vectorized bit-test per lineitem batch drops
       ~(1−sel) of rows BEFORE the exchange — the bloom pays for
       itself by shrinking the co-partition shuffle, not the scan;
    4. exactness: survivors + qualifying keys co-partition by key
       hash; one ``is_in`` per partition removes bloom false
       positives (same partition-local correctness argument as
       ``customers_without_events``);
    5. revenue cents per returnflag via the combiner tree.
    """
    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate, hash_part

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )
    qual = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(threshold))).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
    ).materialize()  # small (keys only, ~selectivity × orders); consumed twice
    # (bitmap build + exact-verify side) — materializing avoids a second
    # orders scan; the blocks stay in the object store, never the driver

    def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = pd.util.hash_array(keys, categorize=False)
        h2 = h * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        return (h % np.uint64(m_bits)).astype(np.int64), (
            h2 % np.uint64(m_bits)
        ).astype(np.int64)

    def emit_bits(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        b1, b2 = _bloom_hashes(keys)
        bits = np.unique(np.concatenate([b1, b2]))
        return pa.table({"bit": pa.array(bits, pa.int64())})

    # ≤ m_bits rows reach the driver regardless of order count
    bit_rows = combiner_aggregate(
        qual.map_batches(emit_bits, batch_format="pyarrow"),
        ["bit"],
        [(None, "count", "_n")],
        num_parts=4,
    ).select_columns(["bit"])
    bitmap = np.zeros(m_bits, dtype=bool)
    for batch in bit_rows.iter_batches(batch_format="pyarrow"):
        bitmap[batch["bit"].to_numpy(zero_copy_only=False)] = True
    bitmap_ref = ray.put(bitmap)

    lineitem = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    class BloomPrefilter:
        def __init__(self, bitmap_ref):
            self.bitmap = ray.get(bitmap_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
            b1, b2 = _bloom_hashes(keys)
            keep = self.bitmap[b1] & self.bitmap[b2]
            t = t.filter(pa.array(keep))
            t = _cents(t, "l_extendedprice", "cents", factor="l_discount")
            out = t.select(["l_orderkey", "l_returnflag", "cents"])
            part = hash_part(out, ["l_orderkey"], num_parts)
            return out.append_column(
                "side", pa.array(np.zeros(len(out), dtype=np.int8))
            ).append_column("_part", pa.array(part, pa.int32()))

    def key_side(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "l_returnflag": pa.nulls(len(t), pa.string()),
                "cents": pa.nulls(len(t), pa.int64()),
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["l_orderkey"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    # stateless-task dispatch (the pii_redaction_stats lesson): the
    # per-task state is one ray.get of a ~m_bits/8 KB bitmap from the
    # local object store, so the old 8-actor pool ceiling only cost
    # probe parallelism at 32 CPUs
    survivors = lineitem.map_batches(
        _task_stage(BloomPrefilter, bitmap_ref=bitmap_ref),
        batch_format="pyarrow",
    )
    tagged = survivors.union(qual.map_batches(key_side, batch_format="pyarrow"))

    def semi_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        present = g["l_orderkey"].filter(pa.array(side == 1)).combine_chunks().unique()
        left = g.filter(pa.array(side == 0))
        hit = pc.is_in(left["l_orderkey"], value_set=present)
        keep = left.filter(hit)
        return keep.select(["l_returnflag", "cents"])

    exact = tagged.groupby("_part").map_groups(semi_part, batch_format="pyarrow")
    return combiner_aggregate(
        exact,
        ["l_returnflag"],
        [(None, "count", "n"), ("cents", "sum", "revenue_cents")],
        num_parts=2,
    )


# URL pattern shared between the Ray kernel and the DuckDB oracle.
# Group 1 is the domain. Restricted (like PII_PATTERNS) to constructs
# whose match semantics are identical under Python re and RE2/DuckDB:
# greedy character classes, one optional group, no alternation whose
# leftmost-first vs leftmost-longest diverge.
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)(/[^ ]*)?"


def _url_corpus(sf_dir: str):
    """documents ∪ URL-injected copies (id+4M, doc_id % 4 == 0): the
    fixture word salad contains no URLs, so the planted links are the
    ground truth the oracle rebuilds closed-form (two URLs per planted
    doc across 50 + 7 rotating domains)."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = t.filter(pa.array(ids % 4 == 0))
        sid = sel["doc_id"].to_numpy(zero_copy_only=False)
        suffix = [
            f" see https://site{u % 50}.example.org/p/{u} and http://cdn{u % 7}.example.net/img"
            for u in sid
        ]
        return pa.table(
            {
                "doc_id": pc.add(sel["doc_id"], 4_000_000),
                "text": pc.binary_join_element_wise(sel["text"], pa.array(suffix), ""),
            }
        )

    return ds.union(ds.map_batches(inject, batch_format="pyarrow"))


class UrlExtractor:
    """URL/domain extractor stage: emits per-block
    (domain, n_urls_p, n_docs_p) partials — a block ships one row per
    distinct domain, so the exchange is bounded by the domain
    vocabulary, never the corpus. n_docs sums correctly across blocks
    because a document lives in exactly one block. Extraction is fully
    vectorized Arrow RE2 (split-on-scheme + anchored domain extract);
    the stage is stateless, so it runs as plain tasks."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized findall (round-4: Arrow RE2 has no multi-match
        # extract, so split on the scheme token and anchor-extract the
        # domain from every following fragment). This equals the
        # URL_PATTERN findall scan EXCEPT when one match's consumption
        # can reach the next scheme token (a scheme inside another
        # URL's space-free path, or abutting a domain) — only possible
        # when some non-final post-scheme fragment contains no space,
        # so those rare docs take an exact Python-re fallback and
        # everything else stays vectorized. Parity is test-pinned
        # including the redirect-style nested-URL cases.
        parts = pc.split_pattern_regex(t["text"], r"https?://")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        n = len(parent)
        first = np.ones(n, dtype=bool)  # first fragment per doc = pre-URL text
        first[1:] = parent[1:] != parent[:-1]
        last = np.ones(n, dtype=bool)
        last[:-1] = parent[:-1] != parent[1:]
        has_space = pc.greater_equal(
            pc.find_substring(flat, " "), 0
        ).to_numpy(zero_copy_only=False)
        # pathological: a non-first, non-last fragment with no space —
        # the preceding match could consume the next scheme token
        patho_frag = ~first & ~last & ~has_space
        patho_docs = np.unique(parent[patho_frag])
        keep = ~first & ~np.isin(parent, patho_docs)
        frag = flat.filter(pa.array(keep))
        par = parent[keep]
        ext = pc.extract_regex(frag, r"^(?P<domain>[A-Za-z0-9.-]+)")
        valid = ext.is_valid()
        dom = pc.struct_field(ext, "domain").filter(valid)
        par = par[valid.to_numpy(zero_copy_only=False)]
        pairs = pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"].take(pa.array(par)), pa.int64()),
                "domain": dom,
            }
        )
        if len(patho_docs):
            import re

            pat = re.compile(URL_PATTERN)
            sel = t.take(pa.array(patho_docs))
            ids, doms = [], []
            for did, text in zip(sel["doc_id"].to_pylist(), sel["text"].to_pylist()):
                for groups in pat.findall(text):
                    ids.append(did)
                    doms.append(groups[0])
            pairs = pa.concat_tables(
                [
                    pairs,
                    pa.table(
                        {"doc_id": pa.array(ids, pa.int64()), "domain": pa.array(doms, pa.string())}
                    ),
                ]
            )
        urls = pairs.group_by(["domain"]).aggregate([([], "count_all")])
        urls = urls.rename_columns(["domain", "n_urls_p"])
        docs = (
            pairs.group_by(["doc_id", "domain"])
            .aggregate([])
            .group_by(["domain"])
            .aggregate([([], "count_all")])
            .rename_columns(["domain", "n_docs_p"])
        )
        return urls.join(docs, keys=["domain"], join_type="inner")


def url_domain_stats(sf_dir: str, *, concurrency=None):
    """Per-domain link statistics over the (planted) corpus — the
    web-crawl curation primitive behind domain allow/block lists and
    source-mix dashboards: URLs per domain and distinct documents
    citing the domain. Scale shape: one actor-pool map_batches (text
    never leaves the stage), then a combiner exchange over domain
    partials — output is |domains| rows. Stateless Arrow-RE2 stage →
    uncapped tasks by default (see pii_redaction_stats)."""
    from .functions.agg import combiner_aggregate

    if concurrency is not None:
        partials = _url_corpus(sf_dir).map_batches(
            UrlExtractor, batch_format="pyarrow", concurrency=concurrency
        )
    else:
        partials = _url_corpus(sf_dir).map_batches(
            _task_stage(UrlExtractor), batch_format="pyarrow"
        )
    return combiner_aggregate(
        partials,
        ["domain"],
        [("n_urls_p", "sum", "n_urls"), ("n_docs_p", "sum", "n_docs")],
        num_parts=4,
    )


def corpus_mixture_weights(sf_dir: str, *, alpha: float = 0.3):
    """Temperature-based corpus mixture reweighting (the mT5/XLM-R
    recipe): per-language token shares ``p`` are flattened to sampling
    weights ``q ∝ p^alpha``, and ``boost = q/p`` is the per-language
    up/down-sampling factor a mixing dataloader applies. Everything
    after the grouped token count is closed-form arithmetic over
    |langs| rows, so the DuckDB oracle recomputes it exactly (floats
    rounded to 6).

    Scale shape: ONE combiner-tree grouped aggregate over (lang) —
    blocks collapse to ≤|langs| partial rows each — then driver-side
    arithmetic on the |langs|-row result (bounded by the language
    vocabulary, never the corpus)."""
    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        out = token_count_batch(t)
        return pa.table({"lang": out["lang"], "n_tokens": out["n_tokens"]})

    agg = combiner_aggregate(
        ds.map_batches(tok, batch_format="pyarrow"),
        ["lang"],
        [(None, "count", "n_docs"), ("n_tokens", "sum", "total_tokens")],
        num_parts=4,
    ).to_pandas()  # |langs| rows — bounded by the language vocabulary

    agg = agg.sort_values("lang").reset_index(drop=True)
    tot = float(agg["total_tokens"].sum())
    p = agg["total_tokens"].to_numpy(dtype=np.float64) / tot
    q = p**alpha
    q = q / q.sum()
    return pa.table(
        {
            "lang": pa.array(agg["lang"], pa.string()),
            "n_docs": pa.array(agg["n_docs"].to_numpy(), pa.int64()),
            "total_tokens": pa.array(agg["total_tokens"].to_numpy(), pa.int64()),
            "p": pa.array(np.round(p, 6), pa.float64()),
            "q": pa.array(np.round(q, 6), pa.float64()),
            "boost": pa.array(np.round(q / p, 6), pa.float64()),
        }
    )


def training_shuffle_shards(sf_dir: str, *, num_shards: int = 16, seed: int = 17):
    """Deterministic seeded global shuffle + shard assignment — the
    training-loader step after curation: every document gets a stable
    pseudo-random position ``(shard, pos)`` so N data-loader workers
    each read one shard in a reproducible shuffled order. The key is
    ``md5(seed:doc_id)`` (48 bits), shard = key mod num_shards, pos =
    rank within shard by (key, doc_id).

    Scale shape: this replaces ``Dataset.random_shuffle`` (a full
    materializing all-to-all with no determinism across runs) with ONE
    hash exchange on the shard id followed by a per-shard vectorized
    lexsort — shards are independent, so at 100 TB each shard sorts its
    own slice (bounded by corpus/num_shards) and writes its own
    resumable output; re-runs produce byte-identical order."""
    import hashlib as _h

    ds = _docs_ds(sf_dir, ["doc_id"])

    def key_shard(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        md5 = _h.md5
        k = np.fromiter(
            (int(md5(f"{seed}:{i}".encode()).hexdigest()[:12], 16) for i in ids),
            dtype=np.int64,
            count=len(ids),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "shard": pa.array(k % num_shards, pa.int64()),
            }
        )

    def rank_shard(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "shard": g["shard"],
                "pos": pa.array(pos, pa.int64()),
            }
        )

    keyed = ds.map_batches(key_shard, batch_format="pyarrow")
    return keyed.groupby("shard").map_groups(rank_shard, batch_format="pyarrow")


def sequence_packing_stats(sf_dir: str, *, budget: int = 512, num_parts: int = 8):
    """Sequence packing for pretraining — pack documents into
    fixed-token-budget training sequences per language and report
    per-sequence stats (the step between chunking and batch export in
    a real LLM data pipeline). Deterministic contiguous-greedy spec the
    DuckDB oracle recomputes with one window function: docs pack in
    doc_id order within their lang, and a doc belongs to the sequence
    where its prefix starts — ``seq_id = (cumsum(tokens) − tokens) //
    budget`` (an over-budget doc straddles sequences and counts where
    it starts, standard contiguous-packing overflow).

    Scale shape: token counts are computed where the text lives (one
    ``map_batches``; text never shuffles), the exchange ships only
    (lang, doc_id, n_tokens) triples hash-partitioned by lang (the
    packing key), and each partition does one lexsort + a vectorized
    per-segment prefix sum + one arrow group_by. Output is one row per
    (lang, sequence)."""
    from .functions.agg import hash_part

    ds = _docs_ds(sf_dir, ["doc_id", "lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        out = token_count_batch(t).select(["doc_id", "lang", "n_tokens"])
        part = hash_part(out, ["lang"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def pack_part(g: pa.Table) -> pa.Table:
        n = len(g)
        if not n:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "seq_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "seq_tokens": pa.array([], pa.int64()),
                }
            )
        lang = g["lang"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        ntok = g["n_tokens"].to_numpy(zero_copy_only=False)
        _, codes = np.unique(lang, return_inverse=True)
        order = np.lexsort((did, codes))
        lang, ntok, codes = lang[order], ntok[order], codes[order]
        cum = np.cumsum(ntok)
        start = cum - ntok  # global prefix before each doc
        # per-lang-segment prefix: subtract the segment head's global prefix
        new = np.ones(n, dtype=bool)
        new[1:] = codes[1:] != codes[:-1]
        head_idx = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        prefix = start - start[head_idx]
        seq = (prefix // budget).astype(np.int64)
        out = (
            pa.table(
                {
                    "lang": pa.array(lang, pa.string()),
                    "seq_id": pa.array(seq, pa.int64()),
                    "n_tokens": pa.array(ntok.astype(np.int64), pa.int64()),
                }
            )
            .group_by(["lang", "seq_id"])
            .aggregate([([], "count_all"), ("n_tokens", "sum")])
        )
        # rebuild by name — aggregate output column order is an
        # implementation detail (same guard as functions/agg.py)
        return pa.table(
            {
                "lang": out["lang"],
                "seq_id": out["seq_id"],
                "n_docs": pa.compute.cast(out["count_all"], pa.int64()),
                "seq_tokens": pa.compute.cast(out["n_tokens_sum"], pa.int64()),
            }
        )

    parts = ds.map_batches(tok, batch_format="pyarrow")
    return parts.groupby("_part").map_groups(pack_part, batch_format="pyarrow")


def lineitem_profile(sf_dir: str):
    """Table profiling — the data-quality primitive behind schema
    dashboards and ingestion gates: one pass over every column of
    ``lineitem`` emitting row count, null count, and min/max. Numeric
    and timestamp columns report values (timestamps as epoch-µs);
    string columns report codepoint-length extrema. min/max are
    order-independent and n/n_null are integer sums, so every output
    cell is deterministic — vmin/vmax are exact in double for values
    < 2^53 (true for every fixture and any sane fact table's keys).

    Scale shape: a block collapses to |columns| partial rows
    (vectorized ``pc.min_max`` + null_count per column — no row
    iteration), and the combiner exchange ships only those partials;
    output is |columns| rows regardless of table size."""
    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate

    path = os.path.join(sf_dir, "lineitem.parquet")
    ds = _read_parquet(path)

    def profile_block(t: pa.Table) -> pa.Table:
        cols, ns, nulls, vmins, vmaxs = [], [], [], [], []
        for name in t.column_names:
            col = t[name]
            typ = col.type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                vals = pc.cast(pc.utf8_length(col), pa.float64())
            elif pa.types.is_timestamp(typ):
                vals = pc.cast(col.cast(pa.int64()), pa.float64())
            else:
                vals = pc.cast(col, pa.float64())
            mm = pc.min_max(vals)
            cols.append(name)
            ns.append(len(col))
            nulls.append(col.null_count)
            vmins.append(mm["min"].as_py())
            vmaxs.append(mm["max"].as_py())
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "n_p": pa.array(ns, pa.int64()),
                "null_p": pa.array(nulls, pa.int64()),
                "min_p": pa.array(vmins, pa.float64()),
                "max_p": pa.array(vmaxs, pa.float64()),
            }
        )

    return combiner_aggregate(
        ds.map_batches(profile_block, batch_format="pyarrow"),
        ["col"],
        [
            ("n_p", "sum", "n"),
            ("null_p", "sum", "n_null"),
            ("min_p", "min", "vmin"),
            ("max_p", "max", "vmax"),
        ],
        num_parts=2,
    )


def events_value_percentiles_by_type(
    sf_dir: str, *, qs=(0.5, 0.9, 0.99), bin_width: float = 0.25
):
    """EXACT distributed percentiles PER GROUP — completes the
    percentile matrix (global-exact: ``events_value_percentiles``;
    grouped-approx: ``events_value_quantile_sketch``) with the same
    two-pass histogram shape, keyed:

    pass 1: (group, bin) counts via the combiner tree — the driver
    sees one histogram per group (bounded by groups · domain/bin_width,
    never row count) and locates each q's target bin + in-bin offset
    (rank ``ceil(q·n)−1``, DuckDB quantile_disc's rule).

    pass 2: re-scan only rows in target (group, bin) cells — matched
    with ONE vectorized ``is_in`` over a composite int64 key
    (``type_id·2³² + bin``; type ids from a broadcast ``pc.index_in``
    against the histogram's group list, no per-row string building) —
    and select each offset from the cell's sorted values. The sliver
    is a ~1/#bins fraction per group; a skewed domain would recurse by
    re-binning the sliver (not needed at fixture scale)."""
    import math

    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate

    ds = _read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def binify(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "bin": pa.array(np.floor(v / bin_width).astype(np.int64), pa.int64()),
            }
        )

    hist = (
        combiner_aggregate(
            ds.map_batches(binify, batch_format="pyarrow"),
            ["event_type", "bin"],
            [(None, "count", "n")],
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["event_type", "bin"])
        .reset_index(drop=True)
    )
    types = sorted(hist["event_type"].unique().tolist())
    type_id = {t: i for i, t in enumerate(types)}
    OFFSET = np.int64(2**31)  # keep composite keys positive for any bin
    targets: dict[int, list] = {}  # composite key -> [(etype, q, offset)]
    for etype, g in hist.groupby("event_type", sort=True):
        bins = g["bin"].to_numpy()
        counts = g["n"].to_numpy()
        total = int(counts.sum())
        cum_before = np.cumsum(counts) - counts
        for q in qs:
            rank = math.ceil(q * total) - 1  # 0-based ascending within group
            i = int(np.searchsorted(cum_before, rank, side="right")) - 1
            key = int(np.int64(type_id[etype]) * np.int64(2**32) + bins[i] + OFFSET)
            targets.setdefault(key, []).append((etype, q, rank - int(cum_before[i])))

    wanted = pa.array(sorted(targets), pa.int64())
    types_arr = pa.array(types, pa.string())

    def keep_wanted(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        tid = pc.index_in(t["event_type"], value_set=types_arr)
        tid = tid.to_numpy(zero_copy_only=False).astype(np.int64)
        comp = pa.array(tid * np.int64(2**32) + b + OFFSET, pa.int64())
        mask = pc.is_in(comp, value_set=wanted)
        return pa.table({"key": comp.filter(mask), "value": t["value"].filter(mask)})

    sliver = ds.map_batches(keep_wanted, batch_format="pyarrow").to_pandas()
    out_t, out_q, out_v = [], [], []
    for key, picks in targets.items():
        vals = np.sort(sliver.loc[sliver["key"] == key, "value"].to_numpy())
        for etype, q, off in picks:
            out_t.append(etype)
            out_q.append(q)
            out_v.append(float(vals[off]))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "pct": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


def customer_event_counts(sf_dir: str, *, num_parts: int = 32):
    """LEFT OUTER grouped aggregate — every customer with their event
    count, zeros included (the activity-report shape; completes the
    join matrix: inner/broadcast/as-of/range/semi/anti all exist).
    Scale shape is the anti-join's (``customers_without_events``) with
    a count payload: events collapse block-locally to (key, n_p)
    partials — the exchange is bounded by distinct keys per block,
    never event count — both sides co-partition by key hash, and each
    partition sums its partials and attaches them to its customer rows
    with one vectorized ``index_in`` gather (missing → 0)."""
    import pyarrow.compute as pc

    from .functions.agg import hash_part

    cust = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    events = _read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])

    def ev_partial(t: pa.Table) -> pa.Table:
        vc_src = t["user_id"]
        if isinstance(vc_src, pa.ChunkedArray):
            vc_src = vc_src.combine_chunks()
        vc = vc_src.value_counts()
        out = pa.table(
            {
                "key": vc.field("values"),
                "n_p": pc.cast(vc.field("counts"), pa.int64()),
                "c_name": pa.nulls(len(vc), pa.string()),
                "side": pa.array(np.ones(len(vc), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["key"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def cust_side(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "key": t["c_custkey"],
                "n_p": pa.nulls(len(t), pa.int64()),
                "c_name": t["c_name"],
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
            }
        )
        part = hash_part(out, ["key"], num_parts)
        return out.append_column("_part", pa.array(part, pa.int32()))

    def outer_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ev = (
            g.filter(pa.array(side == 1))
            .select(["key", "n_p"])
            .group_by(["key"])
            .aggregate([("n_p", "sum")])
            .rename_columns(["key", "n"])
        )
        left = g.filter(pa.array(side == 0))
        keys = ev["key"].combine_chunks() if isinstance(ev["key"], pa.ChunkedArray) else ev["key"]
        pos = pc.index_in(left["key"], value_set=keys)  # null = no events
        valid = pos.is_valid().to_numpy(zero_copy_only=False)
        pos_filled = pos.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        nvals = ev["n"].to_numpy(zero_copy_only=False)
        gathered = nvals[pos_filled] if len(nvals) else np.zeros(len(left), dtype=np.int64)
        n_out = np.where(valid, gathered, 0).astype(np.int64)
        return pa.table(
            {
                "c_custkey": left["key"],
                "c_name": left["c_name"],
                "n_events": pa.array(n_out, pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        events.map_batches(ev_partial, batch_format="pyarrow")
    )
    return tagged.groupby("_part").map_groups(outer_part, batch_format="pyarrow")


def events_user_trailing_window(sf_dir: str, *, window_sec: int = 3600, num_parts: int = 32):
    """RANGE-frame trailing window — per-user 1-hour trailing spend and
    event count at every event (the sliding-aggregate primitive; the
    row-frame functions are ``events_user_running``, the fixed grids
    are the tumbling/hopping windows). Semantics mirror SQL
    ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``: the frame is
    [ts−w, ts] and includes ALL peers tied on ts.

    Fully vectorized, no per-key loop: hash(user) → coarse ``_part``,
    one lexsort per partition by (user, ts), then BOTH frame bounds
    come from two ``np.searchsorted`` calls over a composite key
    ``rank·stride + (ts − ts_min)`` where ``rank`` is the user's DENSE
    per-partition rank (so arbitrary uid values can't overflow int64 —
    round-3 advice: raw ``uid·2⁴⁵`` silently wrapped past uid ≥ 2¹⁸)
    and ``stride > ts span`` (so a bound can never cross into another
    user's run); the sums are prefix-sum differences — integer cents,
    so accumulation order is irrelevant. ``ranks·stride`` fitting int64
    is asserted: it holds up to ~3.5 M users/partition at a month-scale
    µs span; raise ``num_parts`` past that."""
    from .functions.agg import hash_part

    ds = _read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    w_us = np.int64(window_sec) * np.int64(1_000_000)

    def add_part(t: pa.Table) -> pa.Table:
        t = _cents(t, "value", "cents").drop_columns(["value"])
        part = hash_part(t, ["user_id"], num_parts)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def trail_part(g: pa.Table) -> pa.Table:
        n = len(g)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tsus = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tsus, uid))
        uid, tsus, eid, cents = uid[order], tsus[order], eid[order], cents[order]
        ts_norm = tsus - tsus.min() if n else tsus
        # dense per-partition user ranks (uid is sorted, so a boundary
        # diff is the factorization) — composite stays monotone for ANY
        # uid value, unlike a raw uid stride
        ranks = (
            np.concatenate(([0], np.cumsum(uid[1:] != uid[:-1]))).astype(np.int64)
            if n
            else np.zeros(0, dtype=np.int64)
        )
        stride = np.int64(int(ts_norm.max()) + 1) if n else np.int64(1)
        if n and (int(ranks[-1]) + 1) * int(stride) >= 2**63:
            raise ValueError(
                "trailing-window composite would overflow int64: "
                f"{int(ranks[-1]) + 1} users x {int(stride)} us span in one "
                "partition; raise num_parts"
            )
        comp = ranks * stride + ts_norm
        lo = np.searchsorted(comp, ranks * stride + np.maximum(ts_norm - w_us, 0), side="left")
        hi = np.searchsorted(comp, comp, side="right")  # include ts peers
        pref = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cents, out=pref[1:])
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "trail_cents": pa.array(pref[hi] - pref[lo], pa.int64()),
                "n_win": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("_part").map_groups(trail_part, batch_format="pyarrow")


def token_counts_cms(sf_dir: str, *, w: int = 1024, d: int = 2, k: int = 20):
    """Count-min sketch — completes the classic mergeable-sketch trio
    (HLL = cardinality, histogram = quantiles, CMS = frequency): token
    frequency estimates from a fixed d×w counter matrix, reported for
    the true top-k tokens next to their exact counts (est ≥ true by
    construction; equality when a token's buckets are collision-free).

    Determinism spec (oracle-mirrored): bucket_j(token) =
    int(md5(f"{j}:{token}")[:4 bytes]) mod w — the repo-standard
    md5-prefix integer. The sketch is associative integer addition, so
    the combiner tree merges partials in any order; a block ships ≤
    d·distinct-tokens rows (vocabulary-bounded), the driver sees only
    the d·w counter matrix, and the probe set is recomputed closed-form
    on both sides (true counts via the same combiner as top_tokens)."""
    import hashlib as _h

    import pyarrow.compute as pc

    from .functions.agg import combiner_aggregate

    ds = _docs_ds(sf_dir, ["text"])

    def _buckets(tokens: list, j: int) -> np.ndarray:
        md5 = _h.md5
        pre = f"{j}:"
        return np.fromiter(
            (
                int.from_bytes(md5((pre + t).encode()).digest()[:4], "big") % w
                for t in tokens
            ),
            dtype=np.int64,
            count=len(tokens),
        )

    def tokenize_count(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), r"\s+"
        )
        flat = pc.list_flatten(toks)
        vc = flat.combine_chunks().value_counts() if isinstance(flat, pa.ChunkedArray) else flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n_p": pc.cast(vc.field("counts"), pa.int64())}
        )

    counted = ds.map_batches(tokenize_count, batch_format="pyarrow")

    def cms_partial(t: pa.Table) -> pa.Table:
        tokens = t["token"].to_pylist()
        cnt = t["n_p"].to_numpy(zero_copy_only=False)
        js, buckets, cs = [], [], []
        for j in range(d):
            js.append(np.full(len(tokens), j, dtype=np.int64))
            buckets.append(_buckets(tokens, j))
            cs.append(cnt)
        g = (
            pa.table(
                {
                    "j": pa.array(np.concatenate(js), pa.int64()),
                    "bucket": pa.array(np.concatenate(buckets), pa.int64()),
                    "c_p": pa.array(np.concatenate(cs).astype(np.int64), pa.int64()),
                }
            )
            .group_by(["j", "bucket"])
            .aggregate([("c_p", "sum")])
        )
        return g.rename_columns(["j", "bucket", "c_p"])

    cms = (
        combiner_aggregate(
            counted.map_batches(cms_partial, batch_format="pyarrow"),
            ["j", "bucket"],
            [("c_p", "sum", "c")],
            num_parts=2,
        )
        .to_pandas()  # the d·w counter matrix — bounded, never row count
    )
    cms_mat = np.zeros((d, w), dtype=np.int64)
    cms_mat[cms["j"].to_numpy(), cms["bucket"].to_numpy()] = cms["c"].to_numpy()

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"), ("token", "ascending")])
        return t.take(idx.slice(0, k))

    # block-local candidates (≤ k rows per partition block reach the
    # driver — never the vocabulary)
    top = (
        combiner_aggregate(counted, ["token"], [("n_p", "sum", "n")], num_parts=4)
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True])
        .head(k)
    )

    tokens = top["token"].tolist()
    est = np.min(
        np.stack([cms_mat[j, _buckets(tokens, j)] for j in range(d)]), axis=0
    )
    return pa.table(
        {
            "rk": pa.array(np.arange(1, len(tokens) + 1), pa.int64()),
            "token": pa.array(tokens, pa.string()),
            "true_n": pa.array(top["n"].to_numpy(), pa.int64()),
            "est_n": pa.array(est, pa.int64()),
        }
    )
