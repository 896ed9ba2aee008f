#!/usr/bin/env python
"""Benchmark harness: headline CDC ingest throughput + per-query timings.

Prints ONE JSON line:
    {"metric": "ingest_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "change_events": N,
     "events_per_sec": N}

- input: $GRAFT_SF_DIR (default /root/testdata/sf0.1)
- cpus:  $RAY_GRAFT_CPUS (default 32)
- --scaling: runs the headline job in fresh subprocesses at two
  parallelism levels (default 4 vs 16 CPUs, best-of-2 per level;
  override GRAFT_SCALING_LO/HI) on the same input and reports both
  throughputs + scaling efficiency (the sandbox proxy for the N vs 4N
  node criterion in BASELINE.md; 4v16 leaves headroom for Ray system
  threads — see BASELINE.md for the 8v32 whole-host caveat).

The headline pipeline is the flagship: binlog segments → actor-pool
decode → hash-partitioned LWW upsert apply with transactional commits.
Segment fixtures are replicated (documents × REPLICATE) so the stream
is large enough to measure; generation is cached across runs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def host_load_marker() -> dict:
    """Contamination guard: this host swings same-code wall-times 2-4x
    under concurrent load (BASELINE.md), so every BENCH JSON records the
    1m/5m load average before+after the run. A reading whose load
    markers exceed the bench's own parallelism is machine-flaggable as
    noise, not a regression."""
    try:
        la1, la5, _ = os.getloadavg()
    except OSError:
        return {"load_1m": None, "load_5m": None, "host_cpus": os.cpu_count()}
    return {"load_1m": round(la1, 2), "load_5m": round(la5, 2), "host_cpus": os.cpu_count()}
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "400"))
NUM_SEGMENTS = int(os.environ.get("GRAFT_BENCH_SEGMENTS", "32"))
# partitions should scale with DATA (bounded keys per apply task), not
# stay fixed: at the 16M-key scale 64 partitions left the apply
# straggler-bound in 2 coarse waves (25-45s); 128 rebalanced it to ~10s
NUM_PARTITIONS = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "128"))


def run_bench() -> dict:
    import ray

    load_before = host_load_marker()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    from myzql_binlog_connector_ray.logging_config import quiet_empty_partition_warnings

    quiet_empty_partition_warnings()
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # exchange implementation for the groupby("part") apply shuffle:
    #   sort-pull (Ray default) | sort-push | hash (streaming hash-
    #   partition aggregators — overlaps the exchange with decode)
    strategy = os.environ.get("GRAFT_SHUFFLE")
    if strategy:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = {
            "sort-pull": ShuffleStrategy.SORT_SHUFFLE_PULL_BASED,
            "sort-push": ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED,
            "hash": ShuffleStrategy.HASH_SHUFFLE,
        }[strategy]
    blk = os.environ.get("GRAFT_TARGET_BLOCK_MB")
    if blk:
        ctx.target_max_block_size = int(blk) * 1024 * 1024

    from myzql_binlog_connector_ray import api
    from myzql_binlog_connector_ray.fixtures.change_stream import materialize
    from myzql_binlog_connector_ray.pipelines.ingest import run_ingest

    t0 = time.perf_counter()
    fx = materialize(
        SF_DIR, api.WORK_DIR, num_segments=NUM_SEGMENTS, rows_per_event=200, replicate=REPLICATE
    )
    fixture_sec = time.perf_counter() - t0

    # count change events once (cached)
    meta_path = os.path.join(fx["root"], "_bench_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    else:
        from myzql_binlog_connector_ray.fixtures.change_stream import build_transactions, load_docs

        txns = build_transactions(load_docs(SF_DIR, REPLICATE), 200)
        n_events = sum(len(t["rows"]) for t in txns)
        seg_bytes = sum(os.path.getsize(p) for p in fx["segment_paths"])
        meta = {"change_events": n_events, "segment_bytes": seg_bytes}
        json.dump(meta, open(meta_path, "w"))

    # warm page cache (untimed) so we measure compute+shuffle, not first disk read
    for p in fx["segment_paths"]:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass

    exchange = os.environ.get("GRAFT_EXCHANGE", "staged")
    lake_src = api._fresh_lake(fx, NUM_PARTITIONS)
    # proportional pool sizing (same fraction at every CPU level so the
    # scaling comparison is honest); remainder serves read/shuffle/apply
    concurrency = max(2, (NUM_CPUS * 3) // 4)

    # warm-up: a 2-segment ingest into a throwaway lake spins up the
    # worker pool and pays import costs outside the timed section
    warm_lake = os.path.join(fx["root"], f"warm_lake_{NUM_CPUS}")
    shutil.rmtree(warm_lake, ignore_errors=True)
    shutil.copytree(lake_src, warm_lake)
    run_ingest(fx["segment_paths"][:2], warm_lake, num_partitions=NUM_PARTITIONS, concurrency=concurrency, exchange=exchange)
    shutil.rmtree(warm_lake, ignore_errors=True)

    # best of 2 runs: the sandbox host shows heavy CPU-steal variance;
    # the faster run is the truer measure of the pipeline itself
    ingest_sec = float("inf")
    for attempt in range(2):
        lake_dir = os.path.join(fx["root"], f"bench_lake_{NUM_CPUS}")
        if os.path.exists(lake_dir):
            shutil.rmtree(lake_dir)
        shutil.copytree(lake_src, lake_dir)
        t0 = time.perf_counter()
        run_ingest(
            fx["segment_paths"],
            lake_dir,
            num_partitions=NUM_PARTITIONS,
            concurrency=concurrency,
            exchange=exchange,
        )
        ingest_sec = min(ingest_sec, time.perf_counter() - t0)

    scaling_child = os.environ.get("GRAFT_BENCH_SCALING_CHILD") == "1"

    envelope_sec = None
    if not scaling_child:
        # reference-parity pipeline: decode → 9-column envelope parquet
        # (the reference's "parquet mode" — its published 594k rows/s number)
        from myzql_binlog_connector_ray.pipelines.ingest import decode_envelope, read_segments

        env_out = os.path.join(fx["root"], f"bench_envelope_{NUM_CPUS}")
        shutil.rmtree(env_out, ignore_errors=True)
        t0 = time.perf_counter()
        decode_envelope(read_segments(fx["segment_paths"]), concurrency=concurrency).write_parquet(env_out)
        envelope_sec = time.perf_counter() - t0

    # secondary queries at the plain sf scale
    queries: dict[str, float] = {}

    def timed(name, fn):
        t = time.perf_counter()
        res = fn(SF_DIR)
        # consume Datasets fully
        try:
            import ray.data

            if isinstance(res, ray.data.Dataset):
                res.count()
        except Exception:
            pass
        queries[name] = round(time.perf_counter() - t, 4)

    if not scaling_child:
        timed("changes_count_by_dml", api.changes_count_by_dml)
        timed("dedup_exact", api.dedup_exact)
        timed("token_count_by_lang", api.token_count_by_lang)
        timed("ann_topk_bruteforce", api.ann_topk_bruteforce)
        timed("minhash_dup_candidates", api.minhash_dup_candidates)
        timed("minhash_dup_verified", api.minhash_dup_verified)
        timed("multimodal_decode", api.multimodal_decode)
        timed("events_sessionize", api.events_sessionize)
        timed("corpus_curation_stats", api.corpus_curation_stats)
        timed("simhash_dup_pairs", api.simhash_dup_pairs)
        timed("events_value_percentiles", api.events_value_percentiles)
        timed("top_orders_per_priority", api.top_orders_per_priority)
        timed("dedup_clusters", api.dedup_clusters)
        timed("quality_gopher_by_lang", api.quality_gopher_by_lang)
        timed("pii_redaction_stats", api.pii_redaction_stats)
        timed("benchmark_decontamination", api.benchmark_decontamination)
        timed("events_user_running", api.events_user_running)
        timed("customers_without_events", api.customers_without_events)
        timed("tfidf_top_terms_by_lang", api.tfidf_top_terms_by_lang)
        timed("events_value_quantile_sketch", api.events_value_quantile_sketch)
        timed("approx_distinct_users_hll", api.approx_distinct_users_hll)
        timed("event_transition_counts", api.event_transition_counts)
        timed("reservoir_sample_per_group", api.reservoir_sample_per_group)
        timed("doc_chunking_stats", api.doc_chunking_stats)
        timed("embedding_centroids_by_label", api.embedding_centroids_by_label)
        timed("embedding_kmeans_step", api.embedding_kmeans_step)
        timed("lineitem_semijoin_bloom", api.lineitem_semijoin_bloom)
        timed("url_domain_stats", api.url_domain_stats)
        timed("lineitem_profile", api.lineitem_profile)
        timed("events_value_percentiles_by_type", api.events_value_percentiles_by_type)
        timed("customer_event_counts", api.customer_event_counts)
        timed("events_user_trailing_window", api.events_user_trailing_window)
        timed("token_counts_cms", api.token_counts_cms)
        timed("asof_last_event_per_order", api.asof_last_event_per_order)
        timed("sequence_packing_stats", api.sequence_packing_stats)
        timed("dedup_keep_best", api.dedup_keep_best)
        timed("lake_reconcile_diff", api.lake_reconcile_diff)
        timed("corpus_mixture_weights", api.corpus_mixture_weights)
        timed("lake_snapshot_asof", api.lake_snapshot_asof)
        timed("lake_changelog_tail", api.lake_changelog_tail)
        timed("lake_changelog_follow", api.lake_changelog_follow)
        timed("lake_replicate_follow", api.lake_replicate_follow)
        timed("lake_snapshot_diff", api.lake_snapshot_diff)
        timed("lake_history_scd2", api.lake_history_scd2)
        timed("lake_version_lineage", api.lake_version_lineage)
        timed("dedup_incremental_candidates", api.dedup_incremental_candidates)
        timed("dedup_incremental_verified", api.dedup_incremental_verified)
        timed("training_shuffle_shards", api.training_shuffle_shards)

        # round-4 pipelines over the bench-scale fixture stream:
        from myzql_binlog_connector_ray.pipelines.ingest import compact_lake, run_ingest_multi

        # multi-table ingest: ONE decode pass applying app.repos (over
        # the same base lake as the flagship) AND metrics.counters
        multi_root = os.path.join(fx["root"], f"bench_multilake_{NUM_CPUS}")
        shutil.rmtree(multi_root, ignore_errors=True)
        os.makedirs(multi_root)
        shutil.copytree(lake_src, os.path.join(multi_root, "app.repos"))
        t0 = time.perf_counter()
        run_ingest_multi(
            fx["segment_paths"], multi_root, num_partitions=NUM_PARTITIONS, concurrency=concurrency
        )
        queries["ingest_multi"] = round(time.perf_counter() - t0, 4)

        # delta-sink ingest + compaction (write-amplification path)
        delta_lake = os.path.join(fx["root"], f"bench_deltalake_{NUM_CPUS}")
        shutil.rmtree(delta_lake, ignore_errors=True)
        shutil.copytree(lake_src, delta_lake)
        t0 = time.perf_counter()
        run_ingest(
            fx["segment_paths"], delta_lake, num_partitions=NUM_PARTITIONS,
            concurrency=concurrency, exchange=exchange, sink="delta",
        )
        queries["ingest_delta"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        compact_lake(delta_lake)
        queries["compaction"] = round(time.perf_counter() - t0, 4)

    queries["ingest"] = round(ingest_sec, 4)
    if envelope_sec is not None:
        queries["envelope_export"] = round(envelope_sec, 4)
    result = {
        "metric": "ingest_wall_sec",
        "value": round(ingest_sec, 4),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "change_events": meta["change_events"],
        "segment_bytes": meta["segment_bytes"],
        "events_per_sec": round(meta["change_events"] / ingest_sec, 1),
        "fixture_sec": round(fixture_sec, 4),
        "host_load_before": load_before,
        "host_load_after": host_load_marker(),
    }
    if envelope_sec is not None:
        result["envelope_rows_per_sec"] = round(meta["change_events"] / envelope_sec, 1)
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def settle(limit: float = 2.0, timeout: float = 180.0) -> None:
        """Wait for the previous child's Ray teardown / host steal to
        drain before measuring the next level — round-5's load markers
        showed back-to-back children contaminating each other (a 16-CPU
        child starting at load 11 measured 0.62 'efficiency' on code
        whose quiet-host band is 0.96-1.02)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if os.getloadavg()[0] <= limit:
                    return
            except OSError:
                return
            time.sleep(5)

    def sub(ncpu: int) -> dict:
        settle()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_SCALING_CHILD="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def best(ncpu: int) -> dict:
        # the sandbox host shows heavy CPU steal; best-of-2 fresh
        # processes per level is the fairest steady-state estimate
        a, b = sub(ncpu), sub(ncpu)
        return a if a["value"] <= b["value"] else b

    # N vs 4N evidence runs at 4 vs 16 CPUs over a 4x-replicated stream:
    # per-level work (≫ the fixed executor/actor-startup floor) is what
    # makes the efficiency ratio measure compute scaling, not overhead
    lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
    os.environ.setdefault("GRAFT_BENCH_REPLICATE", "1600")
    os.environ.setdefault("GRAFT_BENCH_SEGMENTS", "64")
    load_before = host_load_marker()
    r_lo, r_hi = best(lo), best(hi)
    tput_lo = r_lo["events_per_sec"]
    tput_hi = r_hi["events_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "events_per_sec_lo": tput_lo,
        "events_per_sec_hi": tput_hi,
        "change_events": r_lo["change_events"],
        "sf": SF_DIR,
        "host_load_before": load_before,
        "host_load_after": host_load_marker(),
        # each child run also carries its own markers
        "host_load_children": {
            "lo": {k: r_lo.get(k) for k in ("host_load_before", "host_load_after")},
            "hi": {k: r_hi.get(k) for k in ("host_load_before", "host_load_after")},
        },
    }


def run_streaming() -> dict:
    """End-to-end STREAMING measurement: a live replication tail (real
    localhost socket against the in-process replay server, wire auth +
    SHOW MASTER STATUS auto-positioning) closes segments while a
    concurrent incremental ingest applies each one as it lands —
    sustained events/s from first byte to last transactional commit."""
    import threading
    import time as _time

    import ray

    load_before = host_load_marker()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    from myzql_binlog_connector_ray import api
    from myzql_binlog_connector_ray.fixtures.change_stream import (
        build_transactions,
        load_docs,
        materialize,
    )
    from myzql_binlog_connector_ray.logging_config import quiet_empty_partition_warnings
    from myzql_binlog_connector_ray.sources.binlog_tail import tail_binlog_to_segments
    from myzql_binlog_connector_ray.sources.replay_server import ReplayServer

    quiet_empty_partition_warnings()
    DataContext.get_current().enable_progress_bars = False

    replicate = int(os.environ.get("GRAFT_STREAM_REPLICATE", "100"))
    # 32 segments (vs the batch bench's coarser 16): segment close is
    # the streaming pipeline's overlap granularity — the last segment's
    # decode can only start at tail end, so its size bounds the
    # non-overlappable tail-after work (a real deployment picks the
    # binlog max_size the same way)
    n_segments = int(os.environ.get("GRAFT_STREAM_SEGMENTS", "32"))
    n_parts = int(os.environ.get("GRAFT_STREAM_PARTITIONS", "64"))
    fx = materialize(SF_DIR, api.WORK_DIR, num_segments=n_segments, rows_per_event=200, replicate=replicate)
    n_events = sum(len(t["rows"]) for t in build_transactions(load_docs(SF_DIR, replicate), 200))

    lake_src = api._fresh_lake(fx, n_parts)
    lake_dir = os.path.join(fx["root"], f"stream_lake_{NUM_CPUS}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.copytree(lake_src, lake_dir)
    out_dir = os.path.join(fx["root"], f"stream_segments_{NUM_CPUS}")
    shutil.rmtree(out_dir, ignore_errors=True)
    originals = {os.path.basename(p) for p in fx["segment_paths"]}

    def closed() -> list[str]:
        if not os.path.isdir(out_dir):
            return []
        return sorted(
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.startswith("binlog.") and f in originals
        )

    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor

    del ReplayServer  # the in-process rig would share the tailer's GIL
    # replay server OUT of process: the serial tailer must not compete
    # with the rig it measures for one interpreter lock
    srv_proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "myzql_binlog_connector_ray.sources.replay_server",
            os.path.dirname(fx["segment_paths"][0]),
        ],
        stdout=subprocess.PIPE,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    port = int(srv_proc.stdout.readline().split()[1])
    try:
        t0 = _time.perf_counter()
        tail_sec = [None]

        def _tail():
            # start_file=None → SHOW MASTER STATUS auto-positioning
            tail_binlog_to_segments(
                out_dir, port=port, user="repl", password="secret", start_file=None
            )
            tail_sec[0] = _time.perf_counter() - t0

        th = threading.Thread(target=_tail)
        th.start()
        consumed: set[str] = set()
        # pipelined incremental ingest (pipelines.streaming): each
        # closed segment's decode+stage task launches immediately and
        # overlaps the tail; apply waves cover contiguous staged
        # prefixes as raw per-partition tasks — no per-wave Dataset-job
        # floor (round-4's 102 k ev/s bottleneck). Deltas by default;
        # the final compaction (inside drain) is in the timed window.
        sink = os.environ.get("GRAFT_STREAM_SINK", "delta")
        ing = StreamingIngestor(lake_dir, num_partitions=n_parts, sink=sink)
        while True:
            new = [p for p in closed() if p not in consumed]
            for p in new:
                ing.submit(p)
                consumed.add(p)
            ing.poll()
            if not new and not th.is_alive():
                break
            _time.sleep(0.02)
        th.join()
        ti = _time.perf_counter()
        ing.drain()  # blocks: staged + applied + (delta) compacted
        drain_sec = _time.perf_counter() - ti
        e2e_sec = _time.perf_counter() - t0
    finally:
        srv_proc.terminate()
        srv_proc.wait(timeout=10)
    assert {os.path.basename(p) for p in consumed} == originals, "stream incomplete"
    ray.shutdown()
    return {
        "metric": "streaming_e2e_events_per_sec",
        "value": round(n_events / e2e_sec, 1),
        "unit": "events/sec",
        "e2e_sec": round(e2e_sec, 4),
        "tail_sec": round(tail_sec[0], 4) if tail_sec[0] else None,
        "drain_sec": round(drain_sec, 4),
        "pipelined": True,
        "sink": sink,
        "change_events": n_events,
        "segments": len(originals),
        "num_cpus": NUM_CPUS,
        "sf": SF_DIR,
        "host_load_before": load_before,
        "host_load_after": host_load_marker(),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--streaming" in sys.argv:
        print(json.dumps(run_streaming()))
    else:
        print(json.dumps(run_bench()))
