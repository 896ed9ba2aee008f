"""Delta-apply sink + compaction: associative LWW fold, three-wave delta
ingest equal to the rewrite sink, crash-safe stale-delta handling.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from myzql_binlog_connector_ray.pipelines.ingest import (
    FINAL_COLUMNS,
    compact_lake,
    init_lake,
    read_lake,
    read_lake_state,
    run_ingest,
)
from myzql_binlog_connector_ray.stages.apply_arrow import lww_fold_arrow


def _changes(rows):
    """rows: (repo, path, content, dml, ordinal)"""
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "content": pa.array([r[2] for r in rows], pa.string()),
            "dml": pa.array([r[3] for r in rows], pa.string()),
            "ordinal": pa.array([r[4] for r in rows], pa.int64()),
            "event_row_index": pa.array([1] * len(rows), pa.int64()),
        }
    )


def _norm(t: pa.Table):
    import pyarrow.compute as pc

    t = t.select(sorted(t.column_names))
    return t.take(pc.sort_indices(t, sort_keys=[("repo", "ascending"), ("path", "ascending")]))


def test_lww_fold_associative():
    """base ∘ (a + b) == (base ∘ a) ∘ b for time-ordered batches — the
    property that makes the delta sink + deferred compaction correct."""
    base = pa.table(
        {
            "repo": pa.array(["r1", "r2", "r3"]),
            "path": pa.array(["p", "p", "p"]),
            "content": pa.array(["v0", "v0", "v0"]),
        }
    )
    a = _changes(
        [("r1", "p", "v1", "UPDATE", 10), ("r4", "p", "new", "INSERT", 11), ("r2", "p", None, "DELETE", 12)]
    )
    b = _changes(
        [("r1", "p", "v2", "UPDATE", 20), ("r2", "p", "back", "INSERT", 21), ("r3", "p", None, "DELETE", 22)]
    )
    both = pa.concat_tables([a, b])
    left = _norm(lww_fold_arrow(base, both)).select(["repo", "path", "content"])
    right = _norm(lww_fold_arrow(lww_fold_arrow(base, a), b)).select(["repo", "path", "content"])
    assert left.equals(right)
    got = dict(zip(left["repo"].to_pylist(), left["content"].to_pylist()))
    assert got == {"r1": "v2", "r2": "back", "r4": "new"}  # r3 deleted


@pytest.fixture(scope="module")
def delta_lakes(ray_session, fixture_paths, tmp_path_factory):
    """Three sequential delta-sink ingest waves vs one rewrite-sink run."""
    base = pq.read_table(fixture_paths["base_lake"])
    segs = fixture_paths["segment_paths"]

    delta_dir = str(tmp_path_factory.mktemp("deltalake"))
    init_lake(base, delta_dir, 8)
    waves = [segs[:1], segs[1:2], segs[2:]]
    for w in waves:
        run_ingest(w, delta_dir, num_partitions=8, sink="delta")

    rewrite_dir = str(tmp_path_factory.mktemp("rewritelake"))
    init_lake(base, rewrite_dir, 8)
    run_ingest(segs, rewrite_dir, num_partitions=8)
    return delta_dir, rewrite_dir


def _state(ds):
    df = ds.to_pandas()[FINAL_COLUMNS]
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_delta_waves_write_deltas_and_fold_on_read(delta_lakes):
    delta_dir, rewrite_dir = delta_lakes
    deltas = glob.glob(os.path.join(delta_dir, "part=*", "delta-*.parquet"))
    assert deltas, "delta sink wrote no delta files"
    # fold-on-read over the delta lake == the rewrite lake, value-exact
    a = _state(read_lake_state(delta_dir))
    b = _state(read_lake(rewrite_dir))
    assert a.equals(b)


def test_delta_replay_is_noop(delta_lakes, fixture_paths):
    delta_dir, _ = delta_lakes
    before = sorted(glob.glob(os.path.join(delta_dir, "part=*", "delta-*.parquet")))
    rows = run_ingest(fixture_paths["segment_paths"][:1], delta_dir, num_partitions=8, sink="delta")
    assert all(r["skipped"] for r in rows)
    after = sorted(glob.glob(os.path.join(delta_dir, "part=*", "delta-*.parquet")))
    assert before == after  # no duplicate delta files


def test_compaction_restores_single_file_partitions(delta_lakes):
    delta_dir, rewrite_dir = delta_lakes
    want = _state(read_lake(rewrite_dir))

    summaries = compact_lake(delta_dir)
    assert any(not s["skipped"] for s in summaries)
    assert not glob.glob(os.path.join(delta_dir, "part=*", "delta-*.parquet"))
    for pdir in glob.glob(os.path.join(delta_dir, "part=*")):
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        assert len(files) == 1 and files[0].endswith("data.parquet")
    # plain read now equals the rewrite lake; fold-on-read still agrees
    assert _state(read_lake(delta_dir)).equals(want)
    assert _state(read_lake_state(delta_dir)).equals(want)

    # second compaction: nothing live, all skipped
    assert all(s["skipped"] for s in compact_lake(delta_dir))


def test_stale_delta_ignored_after_crash(ray_session, tmp_path):
    """A compaction that crashed after the base rewrite but before
    cleanup leaves delta files at/below compacted_through — readers and
    the next compaction must ignore (then remove) them instead of
    re-applying stale values over the newer base."""
    from myzql_binlog_connector_ray.state.manifest import (
        delta_path,
        list_delta_files,
        read_manifest,
    )
    from myzql_binlog_connector_ray.stages.apply import add_partition

    lake = str(tmp_path / "lake")
    base = pa.table(
        {"repo": pa.array(["r1"]), "path": pa.array(["p"]), "content": pa.array(["v9"])}
    )
    init_lake(base, lake, 2)
    # every partition needs a manifest for compacted_through bookkeeping;
    # simulate one committed rewrite at watermark 100
    t = add_partition(_changes([("r1", "p", "v9", "UPDATE", 100)]), 2)
    part = int(t["part"][0].as_py())
    from myzql_binlog_connector_ray.stages.apply_arrow import ApplyPartitionArrow

    ApplyPartitionArrow(lake_dir=lake, write=True, final_columns=FINAL_COLUMNS)(t)
    m = read_manifest(lake, part)
    assert m["watermark"] == 100 and m["compacted_through"] == 100

    # stale delta (watermark 50 <= compacted_through) left by a crash:
    # would regress content to v5 if applied
    stale = delta_path(lake, part, 50)
    pq.write_table(_changes([("r1", "p", "v5", "UPDATE", 50)]), stale)
    assert list_delta_files(lake, part, m["compacted_through"]) == []

    got = _state(read_lake_state(lake))
    assert got.loc[got["repo"] == "r1", "content"].iloc[0] == "v9"
    compact_lake(lake)
    assert not os.path.exists(stale)  # lazily cleaned


def test_verify_lake_detects_tampering(ray_session, fixture_paths, tmp_path):
    """Lineage audit: a clean committed lake verifies; an out-of-band
    edit to one partition file is detected; delta commits report
    unverifiable until compaction seals them."""
    from myzql_binlog_connector_ray.pipelines.ingest import run_ingest, verify_lake

    lake = str(tmp_path / "vlake")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake, 4)
    run_ingest(fixture_paths["segment_paths"], lake, num_partitions=4)
    rows = verify_lake(lake)
    assert rows and all(r["ok"] for r in rows)

    # tamper: rewrite one partition's data file with a row dropped
    victim = glob.glob(os.path.join(lake, "part=*", "data.parquet"))[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(1), victim)
    bad = [r for r in verify_lake(lake) if not r["ok"]]
    assert len(bad) == 1 and "rows" in bad[0]["detail"]

    # same-rows value tamper → sha mismatch
    t2 = t.set_column(
        t.schema.get_field_index("content"), "content",
        pa.array(["tampered"] * t.num_rows, pa.string()),
    )
    pq.write_table(t2, victim)
    bad = [r for r in verify_lake(lake) if not r["ok"]]
    assert len(bad) == 1 and "binding violated" in bad[0]["detail"]

    # delta commits are honest about being unverifiable
    lake2 = str(tmp_path / "vlake_delta")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake2, 4)
    run_ingest(fixture_paths["segment_paths"], lake2, num_partitions=4, sink="delta")
    rows = verify_lake(lake2)
    assert all(r["ok"] for r in rows)
    assert any("unverifiable" in r["detail"] for r in rows)
    from myzql_binlog_connector_ray.pipelines.ingest import compact_lake

    compact_lake(lake2)
    rows = verify_lake(lake2)
    assert all(r["ok"] and r["detail"] == "ok" for r in rows)


def test_delta_compact_every_inline(ray_session, fixture_paths, tmp_path):
    """compact_every=2: after every second delta commit the partition
    folds itself — deltas never accumulate past the threshold and the
    final state matches a plain rewrite ingest."""
    base = pq.read_table(fixture_paths["base_lake"])
    segs = fixture_paths["segment_paths"]

    lake = str(tmp_path / "autocompact")
    init_lake(base, lake, 8)
    for w in ([segs[0]], [segs[1]], [segs[2]], [segs[3]]):
        run_ingest(w, lake, num_partitions=8, sink="delta", compact_every=2)
        live = glob.glob(os.path.join(lake, "part=*", "delta-*.parquet"))
        # per partition at most compact_every-1 live deltas survive
        per_part = {}
        for f in live:
            per_part.setdefault(os.path.dirname(f), []).append(f)
        assert all(len(v) < 2 for v in per_part.values()), per_part

    ref = str(tmp_path / "ref")
    init_lake(base, ref, 8)
    run_ingest(segs, ref, num_partitions=8)
    a = _state(read_lake_state(lake))
    b = _state(read_lake(ref))
    assert a.equals(b)
