"""Time-travel (AS-OF) reads + changelog (CDC-out) over the delta lake.

Snapshot semantics: ``read_lake_asof(W)`` folds base + delta rows with
ordinal <= W; exact at delta-commit boundaries; raises
SnapshotUnavailable below the compaction horizon (retention). The
changelog read returns the retained change rows in an ordinal window.
The lake here commits one delta window per fixture DML wave (the same
wave-aligned construction as api._asof_lake), so every boundary is
exact.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from myzql_binlog_connector_ray.fixtures.change_stream import WAVE
from myzql_binlog_connector_ray.pipelines.ingest import (
    FINAL_COLUMNS,
    compact_lake,
    init_lake,
    read_lake_asof,
    read_lake_changelog,
    read_lake_state,
    run_ingest,
    snapshot_points,
)
W2 = 3 * WAVE - 1  # end of wave 2 (v2 updates applied; no stars, no deletes)
W3 = 4 * WAVE - 1  # end of wave 3 (schema evolution wave applied)


@pytest.fixture(scope="module")
def asof_lake(ray_session, fixture_paths, tmp_path_factory):
    """Delta lake with one commit window per fixture wave (ordinal
    pushdown per pass), so AS-OF and changelog are exact everywhere."""
    lake = str(tmp_path_factory.mktemp("asoflake"))
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake, 8)
    for cutoff in (W2, W3, None):
        run_ingest(
            fixture_paths["segment_paths"], lake, num_partitions=8, sink="delta", max_ordinal=cutoff
        )
    return lake


def _df(ds):
    return ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)


def test_asof_at_head_equals_state(asof_lake):
    head = _df(read_lake_asof(asof_lake, 10**15))[FINAL_COLUMNS]
    state = _df(read_lake_state(asof_lake))[FINAL_COLUMNS]
    assert head.equals(state)


def test_asof_wave2_snapshot_semantics(asof_lake):
    snap = _df(read_lake_asof(asof_lake, W2))
    final = _df(read_lake_state(asof_lake))
    # deletes (wave 4) not applied yet: snapshot strictly larger
    assert len(snap) > len(final)
    # schema-evolution wave (3) not applied: stars all-null, no v3 text
    assert snap["stars"].isna().all()
    assert not snap["content"].str.endswith("[v3]").any()
    # wave 2 IS applied: v2 updates visible
    assert snap["content"].str.endswith("[v2]").any()
    # keys gone from final (deleted) still exist in the snapshot
    snap_keys = set(zip(snap["repo"], snap["path"]))
    final_keys = set(zip(final["repo"], final["path"]))
    assert final_keys < snap_keys


def test_snapshot_points_are_readable_boundaries(asof_lake):
    pts = snapshot_points(asof_lake)
    assert pts == sorted(pts) and len(pts) >= 3  # >= one window per wave group
    # every advertised boundary must be exactly readable
    sizes = [read_lake_asof(asof_lake, w).count() for w in (pts[0], pts[-1])]
    assert all(s > 0 for s in sizes)


def test_changelog_windows_partition_the_stream(asof_lake):
    tail = read_lake_changelog(asof_lake, lo=W2).to_pandas()
    # wave 3 updates + wave 4 deletes, both retained (window-aligned)
    assert set(tail["dml"]) == {"UPDATE", "DELETE"}
    assert (tail["ordinal"] > W2).all()
    head = read_lake_changelog(asof_lake, lo=-1, hi=W2).to_pandas()
    assert (head["ordinal"] <= W2).all()
    full = read_lake_changelog(asof_lake, lo=-1).to_pandas()
    assert len(head) + len(tail) == len(full)
    # a key updated in wave 3 AND deleted in wave 4 appears twice
    dup = tail.groupby(["repo", "path"]).size()
    assert (dup == 2).any()


def test_retention_horizon_raises(asof_lake, tmp_path):
    import shutil

    lake = str(tmp_path / "compacted")
    shutil.copytree(asof_lake, lake)
    compact_lake(lake)
    assert not glob.glob(os.path.join(lake, "part=*", "delta-*.parquet"))
    # Ray Data wraps task exceptions (RayTaskError/UserCodeException);
    # match on the surfaced error text instead of the class
    with pytest.raises(Exception, match="SnapshotUnavailable|compacted_through"):
        read_lake_asof(lake, W2).materialize()
    with pytest.raises(Exception, match="SnapshotUnavailable|compacted_through"):
        read_lake_changelog(lake, lo=W2).materialize()
    # the head snapshot is still fine (asof >= compacted_through)
    assert read_lake_asof(lake, 10**15).count() > 0
    assert snapshot_points(lake) == []


def _run_cli(*args):
    import subprocess
    import sys as _sys

    return subprocess.run(
        [_sys.executable, "-m", "myzql_binlog_connector_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_cli_asof_and_changelog_modes(asof_lake, tmp_path):
    """CLI surface: `asof` lists boundaries / writes a point-in-time
    snapshot; `changelog` writes the CDC-out window; a below-retention
    read exits 2 with a clean message (no raw Ray traceback contract)."""
    import json
    import shutil

    import pandas as pd

    cfg = {"segments_dir": "/tmp", "output_dir": str(tmp_path / "out"), "lake_dir": asof_lake}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    # no --watermark: lists the valid snapshot boundaries
    r = _run_cli("asof", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    # boundaries are the deltas' ACTUAL max ordinals (not requested
    # cutoffs) — at least one commit window per wave group
    assert "snapshot boundaries" in r.stdout
    assert r.stdout.count("watermark=") >= 3

    # point-in-time snapshot written as parquet
    r = _run_cli("asof", str(cfg_path), "--watermark", str(W2))
    assert r.returncode == 0, r.stderr[-2000:]
    out = os.path.join(cfg["output_dir"], f"asof-{W2}")
    snap = pd.read_parquet(out)
    assert len(snap) > 0 and snap["stars"].isna().all()

    # CDC-out window after the wave-2 boundary
    r = _run_cli("changelog", str(cfg_path), "--lo", str(W2))
    assert r.returncode == 0, r.stderr[-2000:]
    out = os.path.join(cfg["output_dir"], f"changelog-{W2}-head")
    tail = pd.read_parquet(out)
    assert set(tail["dml"]) == {"UPDATE", "DELETE"} and (tail["ordinal"] > W2).all()

    # below the compaction horizon: clean exit 2, no stacktrace contract
    lake2 = str(tmp_path / "compacted")
    shutil.copytree(asof_lake, lake2)
    compact_lake(lake2)
    cfg2_path = tmp_path / "cfg2.json"
    cfg2_path.write_text(json.dumps(dict(cfg, lake_dir=lake2)))
    r = _run_cli("asof", str(cfg2_path), "--watermark", str(W2))
    assert r.returncode == 2, (r.returncode, r.stderr[-2000:])
    assert "compaction horizon" in r.stderr


def test_cli_asof_changelog_multi_table_root(fixture_paths, tmp_path):
    """Multi-table lake root: one watermark over every namespace is a
    cross-table CONSISTENT snapshot (the ordinal is the global commit
    ordinal); changelog descends per namespace too."""
    import json

    import pandas as pd

    work = tmp_path / "multi"
    work.mkdir()
    cfg = {
        "segments_dir": fixture_paths["segments_dir"],
        "output_dir": str(work / "out"),
        "lake_dir": str(work / "lake"),
        "num_partitions": 4,
        "sink": "delta",
        "tables": ["app.repos", "metrics.counters"],
    }
    cfg_path = work / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    r = _run_cli("apply-multi", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]

    # boundary listing prints every namespace
    r = _run_cli("asof", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "app.repos" in r.stdout and "metrics.counters" in r.stdout

    # head snapshot: per-namespace parquet, both non-empty
    r = _run_cli("asof", str(cfg_path), "--watermark", str(10**15))
    assert r.returncode == 0, r.stderr[-2000:]
    for ns in ("app.repos", "metrics.counters"):
        df = pd.read_parquet(os.path.join(cfg["output_dir"], f"asof-{10**15}", ns))
        assert len(df) > 0
    # the repos snapshot carries the finalized schema, not raw deltas
    repos = pd.read_parquet(os.path.join(cfg["output_dir"], f"asof-{10**15}", "app.repos"))
    assert "content_sha256" in repos.columns and "dml" not in repos.columns

    # changelog window over the root: raw committed change rows per ns
    r = _run_cli("changelog", str(cfg_path), "--lo", "-1")
    assert r.returncode == 0, r.stderr[-2000:]
    ch = pd.read_parquet(os.path.join(cfg["output_dir"], "changelog--1-head", "app.repos"))
    assert "ordinal" in ch.columns and len(ch) > 0

    # diff over the root: repos uses the sha lineage, counters (no sha)
    # falls back to the non-key-column digest
    r = _run_cli("diff", str(cfg_path), "--lo", "-1")
    assert r.returncode == 0, r.stderr[-2000:]
    dr = pd.read_parquet(os.path.join(cfg["output_dir"], "diff--1-head", "app.repos"))
    assert "content_sha256" in dr.columns and len(dr) > 0
    dc = pd.read_parquet(os.path.join(cfg["output_dir"], "diff--1-head", "metrics.counters"))
    assert "digest" in dc.columns and set(dc["change"]) <= {"INSERT", "UPDATE", "DELETE"}

    # history over the root: counters versions come from the val column
    r = _run_cli("history", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    hc = pd.read_parquet(os.path.join(cfg["output_dir"], "history", "metrics.counters"))
    assert {"id", "val", "valid_from", "valid_to"} <= set(hc.columns)
    assert len(hc) > 0


def test_retention_aware_compaction(asof_lake, tmp_path):
    """compact_lake(retain_after=W2): windows at or below the horizon
    fold into the base, later windows stay LIVE — time travel above the
    horizon survives compaction (the production shape: compaction
    bounded by the retention policy), below it raises, the final state
    is unchanged, and a later full compaction still seals."""
    import json
    import shutil

    from myzql_binlog_connector_ray.state.manifest import delta_watermark_of

    lake = str(tmp_path / "partial")
    shutil.copytree(asof_lake, lake)
    before_state = _df(read_lake_state(asof_lake))
    before_w3 = _df(read_lake_asof(asof_lake, W3))
    tail_before = read_lake_changelog(asof_lake, lo=W2).to_pandas()

    summaries = compact_lake(lake, retain_after=W2)
    assert any(not s["skipped"] for s in summaries)
    assert sum(int(s["retained"]) for s in summaries) > 0
    # only windows above the horizon remain on disk
    remaining = glob.glob(os.path.join(lake, "part=*", "delta-*.parquet"))
    assert remaining and all(delta_watermark_of(f) > W2 for f in remaining)

    # final state and above-horizon time travel are value-identical
    assert _df(read_lake_state(lake)).equals(before_state)
    assert _df(read_lake_asof(lake, W3)).equals(before_w3)
    tail_after = read_lake_changelog(lake, lo=W2).to_pandas()
    assert len(tail_after) == len(tail_before)
    # below the horizon the history is gone — loud, not wrong
    with pytest.raises(Exception, match="SnapshotUnavailable|compacted_through"):
        read_lake_asof(lake, W2 - WAVE).materialize()

    # idempotent at the same horizon: nothing left to fold
    assert all(s["skipped"] for s in compact_lake(lake, retain_after=W2))

    # a later FULL compaction seals (sha verifiable, zero deltas)
    compact_lake(lake)
    assert not glob.glob(os.path.join(lake, "part=*", "delta-*.parquet"))
    assert _df(read_lake_state(lake)).equals(before_state)

    # CLI surface: --retain-after reports retained windows
    lake2 = str(tmp_path / "partial_cli")
    shutil.copytree(asof_lake, lake2)
    cfg_path = tmp_path / "rc.json"
    cfg_path.write_text(
        json.dumps({"segments_dir": "/tmp", "output_dir": str(tmp_path / "o"), "lake_dir": lake2})
    )
    r = _run_cli("compact", str(cfg_path), "--retain-after", str(W2))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "delta windows retained" in r.stdout
    remaining2 = glob.glob(os.path.join(lake2, "part=*", "delta-*.parquet"))
    assert remaining2 and all(delta_watermark_of(f) > W2 for f in remaining2)


def test_follow_changelog_tails_commit_frontier(ray_session, fixture_paths, tmp_path):
    """CDC-out follower: run_ingest publishes the lake-level commit
    frontier once per fully-committed wave; follow_changelog yields one
    contiguous (lo, hi] window per frontier advance, the union of the
    windows is exactly the full changelog, and a replayed wave (no
    frontier motion) yields nothing."""
    import pandas as pd

    from myzql_binlog_connector_ray.pipelines.ingest import follow_changelog
    from myzql_binlog_connector_ray.state.manifest import read_frontier

    lake = str(tmp_path / "followed")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake, 8)
    assert read_frontier(lake) == -1

    gen = follow_changelog(lake, poll_interval=0.05, until=4 * WAVE, timeout=10)
    windows = []
    for cutoff in (W2, W3, None):
        run_ingest(
            fixture_paths["segment_paths"], lake, num_partitions=8, sink="delta",
            max_ordinal=cutoff,
        )
        lo, hi, ds = next(gen)
        windows.append((lo, hi, ds.to_pandas()))
    # cursor reached the final frontier >= until → generator is done
    with pytest.raises(StopIteration):
        next(gen)

    # one window per wave, contiguous, ordinal-bounded
    assert len(windows) == 3
    assert windows[0][0] == -1
    for (l1, h1, _), (l2, h2, _) in zip(windows, windows[1:]):
        assert l2 == h1
    for lo, hi, df in windows:
        assert (df["ordinal"] > lo).all() and (df["ordinal"] <= hi).all()
    # wave semantics: window 2 = schema-evolution updates, 3 = deletes
    assert set(windows[1][2]["dml"]) == {"UPDATE"}
    assert set(windows[2][2]["dml"]) == {"DELETE"}

    # union of windows == the full changelog, value-for-value keys
    acc = pd.concat([df for _, _, df in windows])
    full = read_lake_changelog(lake, lo=-1).to_pandas()
    assert len(acc) == len(full)
    key = lambda d: sorted(zip(d["repo"], d["path"], d["ordinal"]))  # noqa: E731
    assert key(acc) == key(full)

    # replaying a wave moves nothing: frontier is monotonic, follower
    # sees no progress and times out cleanly
    f_before = read_frontier(lake)
    run_ingest(fixture_paths["segment_paths"], lake, num_partitions=8, sink="delta")
    assert read_frontier(lake) == f_before
    assert list(follow_changelog(lake, from_watermark=f_before, poll_interval=0.05, timeout=0.5)) == []

    # retention interplay: compacting at or below the follower cursor
    # keeps a restarted follower's window readable
    compact_lake(lake, retain_after=windows[0][1])
    lo, hi, ds = next(follow_changelog(lake, from_watermark=windows[0][1], timeout=5))
    assert ds.count() == len(windows[1][2]) + len(windows[2][2])


def test_streaming_midstream_frontier(ray_session, fixture_paths, tmp_path):
    """The StreamingIngestor publishes the commit frontier MID-STREAM
    (contiguous prefix of fully-applied windows) — a follower reaches
    the head without waiting for drain(), and the windows it read add
    up to exactly the full changelog."""
    import time

    import pandas as pd

    from myzql_binlog_connector_ray.pipelines.streaming import StreamingIngestor
    from myzql_binlog_connector_ray.state.manifest import read_frontier

    lake = str(tmp_path / "livelake")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake, 8)
    ing = StreamingIngestor(lake, num_partitions=8, sink="delta", apply_parallelism=4)
    for p in fixture_paths["segment_paths"]:
        ing.submit(p)

    windows, cursor = [], -1
    deadline = time.monotonic() + 120
    # tail the frontier while the ingestor works — NO drain() yet
    while read_frontier(lake) < 4 * WAVE:
        assert time.monotonic() < deadline, "frontier never reached the head mid-stream"
        ing.poll()
        f = read_frontier(lake)
        if f > cursor:
            windows.append((cursor, f, read_lake_changelog(lake, lo=cursor, hi=f).to_pandas()))
            cursor = f
        time.sleep(0.02)
    f = read_frontier(lake)
    if f > cursor:
        windows.append((cursor, f, read_lake_changelog(lake, lo=cursor, hi=f).to_pandas()))
        cursor = f

    # windows are contiguous and their union is the complete changelog
    for (l1, h1, _), (l2, h2, _) in zip(windows, windows[1:]):
        assert l2 == h1
    acc = pd.concat([df for _, _, df in windows])
    ing.drain(compact=False)
    full = read_lake_changelog(lake, lo=-1).to_pandas()
    assert len(acc) == len(full)
    key = lambda d: sorted(zip(d["repo"], d["path"], d["ordinal"]))  # noqa: E731
    assert key(acc) == key(full)
    # drain must not regress the frontier
    assert read_frontier(lake) == cursor


def test_cli_follow_mode(asof_lake, tmp_path):
    """CLI follow: tails the commit frontier from --lo, writes each
    complete window as parquet, exits cleanly after the idle timeout."""
    import json

    import pandas as pd

    cfg = {"segments_dir": "/tmp", "output_dir": str(tmp_path / "out"), "lake_dir": asof_lake}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    # frontier already at head (fixture built by run_ingest): one
    # window (-1, frontier], then idle-timeout exit
    r = _run_cli("follow", str(cfg_path), "--lo", "-1", "--idle-timeout", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "followed 1 windows" in r.stdout
    import glob as _glob

    (win_dir,) = _glob.glob(os.path.join(cfg["output_dir"], "changelog-*"))
    df = pd.read_parquet(win_dir)
    full = read_lake_changelog(asof_lake, lo=-1).to_pandas()
    assert len(df) == len(full)
    # resuming from the head yields nothing and still exits 0
    r = _run_cli("follow", str(cfg_path), "--lo", win_dir.rsplit("-", 1)[1], "--idle-timeout", "1")
    assert r.returncode == 0 and "followed 0 windows" in r.stdout


def test_follower_replication_equals_source(ray_session, fixture_paths, tmp_path):
    """Source → frontier follower → replica: re-applying each complete
    window in order through the same LWW upsert path reproduces the
    source lake value-for-value (the CDC replication loop, closed)."""
    import pyarrow as pa
    import ray

    from myzql_binlog_connector_ray.fixtures.change_stream import WAVE as _W
    from myzql_binlog_connector_ray.pipelines.ingest import apply_changes, follow_changelog

    src, rep = str(tmp_path / "src"), str(tmp_path / "rep")
    base = pq.read_table(fixture_paths["base_lake"])
    init_lake(base, src, 8)
    init_lake(base, rep, 8)
    gen = follow_changelog(src, poll_interval=0.05, until=4 * _W, timeout=30)
    for cutoff in (3 * _W - 1, 4 * _W - 1, None):
        run_ingest(fixture_paths["segment_paths"], src, num_partitions=8, sink="delta", max_ordinal=cutoff)
        _lo, _hi, ds = next(gen)
        blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
        win = pa.concat_tables(blocks, promote_options="permissive")
        apply_changes(ray.data.from_arrow(win), lake_dir=rep, num_partitions=8, write=True).materialize()
    assert _df(read_lake_state(rep)).equals(_df(read_lake_state(src)))


def test_lake_diff_intermediate_window(asof_lake):
    """Diff between the wave-2 and wave-3 boundaries must contain exactly
    the %9 content updates — no inserts, no deletes, no unchanged keys."""
    from myzql_binlog_connector_ray.pipelines.ingest import lake_diff

    d = lake_diff(asof_lake, W2, W3).to_pandas()
    assert set(d["change"]) == {"UPDATE"}
    # every %9 doc appears once; path encodes the doc_id
    ids = sorted(int(p.split("/f")[1].split(".")[0]) for p in d["path"])
    assert all(i % 9 == 0 for i in ids)
    assert len(ids) == len(set(ids))
    assert d["content_sha256"].notna().all()


def test_lake_diff_full_span_classes(asof_lake):
    """Base→head diff: inserts surviving deletes, updates, deletes of
    pre-existing keys; insert-then-delete keys emit nothing."""
    from myzql_binlog_connector_ray.fixtures.change_stream import WAVE as _W
    from myzql_binlog_connector_ray.pipelines.ingest import lake_diff

    d = lake_diff(asof_lake, _W - 1, 10**15).to_pandas()
    ids = d["path"].str.extract(r"/f(\d+)\.")[0].astype(int)
    for i, ch in zip(ids, d["change"]):
        if ch == "INSERT":
            assert i % 4 == 0 and i % 5 != 0
        elif ch == "DELETE":
            assert i % 5 == 0 and i % 4 != 0
        else:
            assert i % 3 == 0 and i % 4 != 0 and i % 5 != 0
    # deletes carry no digest; inserts/updates do
    assert d.loc[d["change"] == "DELETE", "content_sha256"].isna().all()
    assert d.loc[d["change"] != "DELETE", "content_sha256"].notna().all()


def test_lake_history_chain_invariants(asof_lake):
    """Per-key interval chains must tile: sorted by valid_from, each
    interval's valid_to equals the next valid_from; exactly one open
    interval per live key, none for deleted keys."""
    from myzql_binlog_connector_ray.pipelines.ingest import lake_history, read_lake_state

    h = lake_history(asof_lake).to_pandas()
    live = set(map(tuple, read_lake_state(asof_lake).to_pandas()[["repo", "path"]].values))
    for (repo, path), g in h.groupby(["repo", "path"]):
        g = g.sort_values("valid_from")
        vt = g["valid_to"].values
        vf = g["valid_from"].values
        assert (vt[:-1] == vf[1:]).all(), (repo, path)
        open_n = g["valid_to"].isna().sum()
        assert open_n == (1 if (repo, path) in live else 0), (repo, path)


def test_cli_diff_and_history_modes(asof_lake, tmp_path):
    """CLI surface: `diff` writes the semantic per-key diff between two
    snapshots; `history` writes the SCD2 interval table."""
    import json

    import pandas as pd

    cfg = {"segments_dir": "/tmp", "output_dir": str(tmp_path / "out"), "lake_dir": asof_lake}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    # diff between the wave-2 and wave-3 boundaries: only %9 updates
    r = _run_cli("diff", str(cfg_path), "--lo", str(W2), "--hi", str(W3))
    assert r.returncode == 0, r.stderr[-2000:]
    d = pd.read_parquet(os.path.join(cfg["output_dir"], f"diff-{W2}-{W3}"))
    assert set(d["change"]) == {"UPDATE"}
    assert d["content_sha256"].notna().all()

    # full-span diff to head includes all three classes
    r = _run_cli("diff", str(cfg_path), "--lo", str(WAVE - 1))
    assert r.returncode == 0, r.stderr[-2000:]
    d = pd.read_parquet(os.path.join(cfg["output_dir"], f"diff-{WAVE - 1}-head"))
    assert set(d["change"]) == {"INSERT", "UPDATE", "DELETE"}

    # history: interval rows, open intervals NULL, no DELETE rows
    r = _run_cli("history", str(cfg_path))
    assert r.returncode == 0, r.stderr[-2000:]
    h = pd.read_parquet(os.path.join(cfg["output_dir"], "history"))
    assert {"repo", "path", "commit", "valid_from", "valid_to"} <= set(h.columns)
    assert h["valid_to"].isna().any() and len(h) > 0


def test_lake_diff_and_history_reinsert_and_restore(ray_session, tmp_path):
    """Edge cases the fixture stream never produces: a key deleted then
    REINSERTED (span diff must show UPDATE, window diff INSERT; history
    must carry two chains) and a key updated then RESTORED to its
    original content (span diff must fold it away entirely)."""
    import pandas as pd
    import pyarrow as pa

    from myzql_binlog_connector_ray.pipelines.ingest import (
        init_lake,
        lake_diff,
        lake_history,
    )
    from myzql_binlog_connector_ray.state.manifest import commit_delta

    lake = str(tmp_path / "minilake")
    base = pa.table(
        {
            "repo": pa.array(["r", "r", "r"]),
            "path": pa.array(["A", "B", "D"]),
            "content": pa.array(["a1", "b1", "d1"]),
        }
    )
    init_lake(base, lake, 1)

    def window(rows, w):
        t = pa.table(
            {
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "content": pa.array([r[2] for r in rows], pa.string()),
                "dml": pa.array([r[3] for r in rows], pa.string()),
                "ordinal": pa.array([w] * len(rows), pa.int64()),
                "event_row_index": pa.array(list(range(len(rows))), pa.int64()),
            }
        )
        commit_delta(lake, 0, t, w, key_cols=["repo", "path"])

    window([("r", "A", "a2", "UPDATE"), ("r", "B", "b1", "DELETE"), ("r", "D", "d2", "UPDATE")], 10)
    window([("r", "B", "b2", "INSERT"), ("r", "D", "d1", "UPDATE")], 20)  # B reinserted, D restored
    window([("r", "A", "a2", "DELETE"), ("r", "C", "c1", "INSERT")], 30)

    fc = ["repo", "path", "content"]
    ft = {"repo": pa.string(), "path": pa.string(), "content": pa.string()}

    # span diff base->head: A deleted; B present both ends with changed
    # content (the reinsert) -> UPDATE; C inserted; D restored -> NO row
    d = (
        lake_diff(lake, -1, 10**15, sha_col="digest", final_columns=fc, final_types=ft)
        .to_pandas()
        .set_index("path")
    )
    assert d.loc["A", "change"] == "DELETE"
    assert d.loc["B", "change"] == "UPDATE"
    assert d.loc["C", "change"] == "INSERT"
    assert "D" not in d.index

    # window diff (10, 20]: the reinsert shows as INSERT, the restore as UPDATE
    d2 = (
        lake_diff(lake, 10, 20, sha_col="digest", final_columns=fc, final_types=ft)
        .to_pandas()
        .set_index("path")
    )
    assert d2.loc["B", "change"] == "INSERT"
    assert d2.loc["D", "change"] == "UPDATE"
    assert "A" not in d2.index

    # history: B has two chains (closed at the delete, reopened by the
    # reinsert); D three versions with only the last open; A fully closed
    h = lake_history(lake, version_col="content").to_pandas()
    hb = h[h["path"] == "B"].sort_values("valid_from")
    assert list(hb["content"]) == ["b1", "b2"]
    assert hb["valid_to"].tolist()[0] == 10 and pd.isna(hb["valid_to"].tolist()[1])
    hd = h[h["path"] == "D"].sort_values("valid_from")
    assert list(hd["content"]) == ["d1", "d2", "d1"]
    assert pd.isna(hd["valid_to"].iloc[-1]) and (hd["valid_to"].iloc[:-1] == [10, 20]).all()
    ha = h[h["path"] == "A"].sort_values("valid_from")
    assert ha["valid_to"].notna().all() and ha["valid_to"].iloc[-1] == 30


def test_lake_history_lineage_gap_rule(ray_session, tmp_path):
    """with_lineage: contiguous chains carry their predecessor; a delete
    gap yields NULL lineage for the reinserted generation."""
    import pandas as pd
    import pyarrow as pa

    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, lake_history
    from myzql_binlog_connector_ray.state.manifest import commit_delta

    lake = str(tmp_path / "linlake")
    init_lake(
        pa.table({"repo": pa.array(["r", "r"]), "path": pa.array(["A", "B"]),
                  "content": pa.array(["a1", "b1"])}),
        lake, 1,
    )

    def win(rows, w):
        commit_delta(lake, 0, pa.table({
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "content": pa.array([r[2] for r in rows], pa.string()),
            "dml": pa.array([r[3] for r in rows], pa.string()),
            "ordinal": pa.array([w] * len(rows), pa.int64()),
            "event_row_index": pa.array(list(range(len(rows))), pa.int64()),
        }), w, key_cols=["repo", "path"])

    win([("r", "A", "a2", "UPDATE"), ("r", "B", "b1", "DELETE")], 10)
    win([("r", "B", "b2", "INSERT")], 20)

    h = lake_history(lake, version_col="content", with_lineage=True).to_pandas()
    a2 = h[(h["path"] == "A") & (h["content"] == "a2")].iloc[0]
    assert a2["prev_content"] == "a1" and a2["prev_valid_from"] == -1  # contiguous
    b2 = h[(h["path"] == "B") & (h["content"] == "b2")].iloc[0]
    assert pd.isna(b2["prev_content"]) and pd.isna(b2["prev_valid_from"])  # gap
