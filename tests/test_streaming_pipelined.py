"""Pipelined streaming ingest (pipelines.streaming.StreamingIngestor):
equality with the batch pipeline, incremental waves, replay no-op."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow.parquet as pq


def _read_sorted(lake_dir):
    from myzql_binlog_connector_ray.pipelines.ingest import read_lake

    return (
        read_lake(lake_dir)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
        .reindex(sorted(["repo", "path", "commit", "lang", "content", "stars", "content_sha256"]), axis=1)
    )


def test_streaming_ingestor_equals_batch(ray_session, fixture_paths, tmp_path):
    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, run_ingest
    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor

    n_parts = 8
    base = pq.read_table(fixture_paths["base_lake"])

    # reference: batch ingest of all segments at once
    ref_lake = str(tmp_path / "ref_lake")
    init_lake(base, ref_lake, n_parts)
    run_ingest(fixture_paths["segment_paths"], ref_lake, num_partitions=n_parts, concurrency=2)

    # streaming: segments submitted one at a time, polled between
    stream_lake = str(tmp_path / "stream_lake")
    init_lake(base, stream_lake, n_parts)
    ing = StreamingIngestor(stream_lake, num_partitions=n_parts, sink="delta")
    for p in fixture_paths["segment_paths"]:
        ing.submit(p)
        ing.poll()
    summaries = ing.drain()
    assert summaries, "no partitions committed"
    assert not os.path.isdir(ing.staging_root)

    pd.testing.assert_frame_equal(_read_sorted(stream_lake), _read_sorted(ref_lake))


def test_streaming_ingestor_rewrite_sink(ray_session, fixture_paths, tmp_path):
    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, run_ingest
    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor

    n_parts = 4
    base = pq.read_table(fixture_paths["base_lake"])
    ref_lake = str(tmp_path / "ref_lake")
    init_lake(base, ref_lake, n_parts)
    run_ingest(fixture_paths["segment_paths"], ref_lake, num_partitions=n_parts, concurrency=2)

    stream_lake = str(tmp_path / "stream_lake")
    init_lake(base, stream_lake, n_parts)
    ing = StreamingIngestor(stream_lake, num_partitions=n_parts, sink="rewrite")
    for p in fixture_paths["segment_paths"]:
        ing.submit(p)
    ing.drain()
    pd.testing.assert_frame_equal(_read_sorted(stream_lake), _read_sorted(ref_lake))


def test_streaming_ingestor_replay_noop(ray_session, fixture_paths, tmp_path):
    """Re-streaming the same segments over a committed lake is a no-op:
    the per-partition watermark drops every replayed change."""
    from myzql_binlog_connector_ray.pipelines.ingest import init_lake
    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor

    n_parts = 4
    lake = str(tmp_path / "lake")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake, n_parts)

    ing = StreamingIngestor(lake, num_partitions=n_parts, sink="delta")
    for p in fixture_paths["segment_paths"]:
        ing.submit(p)
    ing.drain()
    want = _read_sorted(lake)

    replay = StreamingIngestor(lake, num_partitions=n_parts, sink="delta")
    for p in fixture_paths["segment_paths"]:
        replay.submit(p)
    summaries = replay.drain()
    assert all(s["skipped"] for s in summaries)
    pd.testing.assert_frame_equal(_read_sorted(lake), want)


def test_streaming_ingestor_multi_equals_batch(ray_session, fixture_paths, tmp_path):
    """Multi-table streaming (tables= mode): one stage-on-close decode
    pass per segment feeds BOTH namespaced lakes live; each table's
    final state equals the batch run_ingest_multi result."""
    from myzql_binlog_connector_ray.pipelines.ingest import (
        init_lake,
        read_lake,
        run_ingest_multi,
    )
    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor

    n_parts = 8
    base = pq.read_table(fixture_paths["base_lake"])
    ref_root = str(tmp_path / "ref_root")
    init_lake(base, os.path.join(ref_root, "app.repos"), n_parts)
    run_ingest_multi(fixture_paths["segment_paths"], ref_root, num_partitions=n_parts)

    stream_root = str(tmp_path / "stream_root")
    init_lake(base, os.path.join(stream_root, "app.repos"), n_parts)
    ing = StreamingIngestor(
        stream_root,
        num_partitions=n_parts,
        sink="delta",
        tables=[("app", "repos"), ("metrics", "counters")],
    )
    for p in fixture_paths["segment_paths"]:
        ing.submit(p)
        ing.poll()
    summaries = ing.drain()
    assert {s["table_ns"] for s in summaries} == {"app.repos", "metrics.counters"}
    assert not os.path.isdir(ing.staging_root)

    pd.testing.assert_frame_equal(
        _read_sorted(os.path.join(stream_root, "app.repos")),
        _read_sorted(os.path.join(ref_root, "app.repos")),
    )
    got = (
        read_lake(os.path.join(stream_root, "metrics.counters"))
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        read_lake(os.path.join(ref_root, "metrics.counters"))
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1), want.reindex(sorted(want.columns), axis=1)
    )


def test_streaming_ingestor_single_slot_accumulates_windows(
    ray_session, fixture_paths, tmp_path
):
    """apply_parallelism=1 starves the scheduler: partitions accumulate
    multi-segment pending windows and launch in large uneven batches —
    per-partition window ordering must still reproduce the batch lake."""
    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, run_ingest
    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor

    n_parts = 16
    base = pq.read_table(fixture_paths["base_lake"])
    ref_lake = str(tmp_path / "ref_lake")
    init_lake(base, ref_lake, n_parts)
    run_ingest(fixture_paths["segment_paths"], ref_lake, num_partitions=n_parts, concurrency=2)

    stream_lake = str(tmp_path / "stream_lake")
    init_lake(base, stream_lake, n_parts)
    ing = StreamingIngestor(
        stream_lake, num_partitions=n_parts, sink="delta", apply_parallelism=1
    )
    for p in fixture_paths["segment_paths"]:
        ing.submit(p)
        ing.poll()
    ing.drain()
    assert not os.path.isdir(ing.staging_root)
    pd.testing.assert_frame_equal(_read_sorted(stream_lake), _read_sorted(ref_lake))


def test_streaming_ingestor_crash_resume(ray_session, fixture_paths, tmp_path):
    """An ingestor that dies mid-stream (some windows applied, some
    only staged) leaves a lake a fresh ingestor resumes correctly: the
    per-partition watermarks drop every already-applied change on
    replay, and gc_stale_staging reclaims the dead run's staging root
    (but never a live one's)."""
    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, run_ingest
    from myzql_binlog_connector_ray.pipelines.streaming import (
        StreamingIngestor,
        gc_stale_staging,
    )

    n_parts = 8
    base = pq.read_table(fixture_paths["base_lake"])
    ref_lake = str(tmp_path / "ref_lake")
    init_lake(base, ref_lake, n_parts)
    run_ingest(fixture_paths["segment_paths"], ref_lake, num_partitions=n_parts, concurrency=2)

    lake = str(tmp_path / "lake")
    init_lake(base, lake, n_parts)

    # first ingestor: submit a prefix, let some applies land, then "die"
    import ray as _ray

    crashed = StreamingIngestor(lake, num_partitions=n_parts, sink="delta")
    prefix = fixture_paths["segment_paths"][:2]
    for p in prefix:
        crashed.submit(p)
    _ray.get(crashed._stage_refs)  # everything staged
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        crashed.poll()
        if crashed.summaries and not crashed._inflight_tasks:
            break
        time.sleep(0.05)
    assert crashed.summaries, "crash scenario needs at least one applied window"
    dead_root = crashed.staging_root
    os.close(crashed._lease_fd)  # simulate process death (kernel drops flock)

    # live-lease safety: a second LIVE ingestor's root must survive GC
    live = StreamingIngestor(lake, num_partitions=n_parts, sink="delta")
    assert os.path.isdir(live.staging_root)
    assert not os.path.isdir(dead_root), "dead root reclaimed by the new ingestor's GC"
    removed = gc_stale_staging(lake)
    assert live.staging_root not in removed and os.path.isdir(live.staging_root)

    # resume: replay the WHOLE stream through the live ingestor —
    # watermarks drop the already-applied prefix changes
    for p in fixture_paths["segment_paths"]:
        live.submit(p)
        live.poll()
    live.drain()
    pd.testing.assert_frame_equal(_read_sorted(lake), _read_sorted(ref_lake))
