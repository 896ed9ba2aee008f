"""End-to-end Ray Data pipeline tests: decode → envelope, decode → apply,
exactly-once commits, checkpoint/resume, table filter pushdown."""

import glob
import json
import os

import pandas as pd
import pytest

from myzql_binlog_connector_ray.fixtures.change_stream import WAVE, base_lake_table, load_docs
from myzql_binlog_connector_ray.pipelines.ingest import (
    apply_changes,
    decode_envelope,
    decode_typed,
    init_lake,
    read_lake,
    read_segments,
    run_ingest,
)
from myzql_binlog_connector_ray.state.manifest import read_all_manifests

N_PARTS = 8


@pytest.fixture()
def lake(fixture_paths, tmp_path, sf_dir):
    """Fresh hash-partitioned base lake per test."""
    import pyarrow.parquet as pq

    lake_dir = str(tmp_path / "lake")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake_dir, N_PARTS)
    return lake_dir


def _expected_final(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    return con.sql(
        """
        WITH d AS (
          SELECT doc_id, text, lang,
            CASE WHEN doc_id % 7 = 0 THEN 'org0/hotrepo'
                 ELSE 'org' || (doc_id % 10) || '/repo' || (doc_id % 50) END AS repo,
            'src/f' || doc_id || '.' || lang AS path,
            CASE WHEN doc_id % 9 = 0 THEN 3 WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS v
          FROM documents
        )
        SELECT repo, path,
               sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
        FROM d WHERE doc_id % 5 <> 0 ORDER BY repo, path
        """
    ).df()


def test_envelope_pipeline(ray_session, fixture_paths):
    ds = decode_envelope(read_segments(fixture_paths["segment_paths"]), concurrency=2)
    df = ds.to_pandas()
    # reference envelope columns, in order (src/parquet_writer.zig:124-134)
    assert list(df.columns)[:9] == [
        "timestamp",
        "server_id",
        "log_pos",
        "event_row_index",
        "database",
        "table_name",
        "dml_type",
        "before_values",
        "after_values",
    ]
    assert set(df["dml_type"].unique()) == {"INSERT", "UPDATE", "DELETE"}
    ins = df[df["dml_type"] == "INSERT"]
    assert ins["before_values"].isna().all() and ins["after_values"].notna().all()
    dele = df[df["dml_type"] == "DELETE"]
    assert dele["after_values"].isna().all() and dele["before_values"].notna().all()
    # JSON images parse and use positional keys
    obj = json.loads(ins["after_values"].iloc[0])
    assert "c0" in obj
    # event_row_index is 1-based within each multi-row event
    assert df["event_row_index"].min() == 1


def test_envelope_table_filter(ray_session, fixture_paths):
    ds = decode_envelope(
        read_segments(fixture_paths["segment_paths"]),
        include=["app.*"],
        concurrency=2,
    )
    df = ds.to_pandas()
    assert set(df["database"].unique()) == {"app"}
    ds2 = decode_envelope(
        read_segments(fixture_paths["segment_paths"]),
        exclude=["app.repos"],
        concurrency=2,
    )
    df2 = ds2.to_pandas()
    assert set(df2["table_name"].unique()) == {"counters"}


def test_envelope_ordinal_range(ray_session, fixture_paths):
    # position-range predicate: waves 1-2 only (F3 analogue over ordinals)
    ds = decode_envelope(
        read_segments(fixture_paths["segment_paths"]),
        max_ordinal=3 * WAVE - 1,
        concurrency=2,
    )
    df = ds.to_pandas()
    assert df["ordinal"].max() < 3 * WAVE
    assert set(df["dml_type"].unique()) == {"INSERT", "UPDATE"}


def test_apply_pipeline_matches_oracle(ray_session, fixture_paths, lake, sf_dir):
    changes = decode_typed(read_segments(fixture_paths["segment_paths"]), concurrency=2)
    final = apply_changes(changes, lake_dir=lake, num_partitions=N_PARTS).to_pandas()
    want = _expected_final(sf_dir)
    got = final.sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["content_sha256"], want["content_sha256"], check_names=False
    )


def test_transactional_ingest_and_exactly_once(ray_session, fixture_paths, lake, sf_dir):
    summaries = run_ingest(
        fixture_paths["segment_paths"], lake, num_partitions=N_PARTS, concurrency=2
    )
    assert all(not s["skipped"] for s in summaries)
    want = _expected_final(sf_dir)
    got = read_lake(lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    # read_parquet over the lake dir also picks up partition dirs
    got = got[["repo", "path", "content_sha256"]]
    pd.testing.assert_series_equal(got["content_sha256"], want["content_sha256"], check_names=False)

    manifests = read_all_manifests(lake)
    assert len(manifests) == len(summaries)
    assert sum(m["rows"] for m in manifests) == len(want)

    # replay the identical stream: every partition must be skipped
    summaries2 = run_ingest(
        fixture_paths["segment_paths"], lake, num_partitions=N_PARTS, concurrency=2
    )
    assert all(s["skipped"] for s in summaries2)
    got2 = read_lake(lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got2["content_sha256"], want["content_sha256"], check_names=False
    )


def test_staged_exchange_matches_groupby(ray_session, fixture_paths, tmp_path, sf_dir):
    """Both exchange implementations must commit identical lakes."""
    import pyarrow.parquet as pq

    base = pq.read_table(fixture_paths["base_lake"])
    lakes = {}
    for exchange in ("staged", "groupby"):
        lake_dir = str(tmp_path / f"lake_{exchange}")
        init_lake(base, lake_dir, N_PARTS)
        summaries = run_ingest(
            fixture_paths["segment_paths"],
            lake_dir,
            num_partitions=N_PARTS,
            concurrency=2,
            exchange=exchange,
        )
        assert all(not s["skipped"] for s in summaries)
        lakes[exchange] = (
            read_lake(lake_dir).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
        )
        # staging files are transient: removed after a successful run
        assert not os.path.exists(os.path.join(lake_dir, "_staging"))
    pd.testing.assert_frame_equal(
        lakes["staged"][sorted(lakes["staged"].columns)],
        lakes["groupby"][sorted(lakes["groupby"].columns)],
    )


def test_checkpoint_resume_mid_stream(ray_session, fixture_paths, lake, sf_dir):
    paths = fixture_paths["segment_paths"]
    # first run: only the first two segments (simulated interruption)
    run_ingest(paths[:2], lake, num_partitions=N_PARTS, concurrency=2)
    # resume: full stream (prefix replays are dropped by the watermark check)
    run_ingest(paths, lake, num_partitions=N_PARTS, concurrency=2)
    want = _expected_final(sf_dir)
    got = read_lake(lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got[["repo", "path", "content_sha256"]]["content_sha256"],
        want["content_sha256"],
        check_names=False,
    )


def test_schema_evolution_in_lake(ray_session, fixture_paths, lake):
    run_ingest(fixture_paths["segment_paths"], lake, num_partitions=N_PARTS, concurrency=2)
    df = read_lake(lake).to_pandas()
    # stars exists, set exactly on wave-3 (doc_id % 9 == 0) surviving keys
    assert "stars" in df.columns
    starred = df[df["stars"].notna()]
    assert len(starred) > 0
    assert starred["commit"].notna().all()


def test_staged_exchange_clears_stale_staging(ray_session, fixture_paths, tmp_path, sf_dir):
    """A crashed run's staged files for segments NOT in the current
    input must not leak into the apply."""
    import pyarrow as pa
    import pyarrow.feather as feather
    import pyarrow.parquet as pq

    base = pq.read_table(fixture_paths["base_lake"])
    lake_dir = str(tmp_path / "lake_stale")
    init_lake(base, lake_dir, N_PARTS)
    # plant a stale staged file claiming a absurdly-late change for a key
    stale_dir = os.path.join(lake_dir, "_staging", "part=0")
    os.makedirs(stale_dir)
    stale = pa.table(
        {
            "segment": pa.array(["binlog.999999"]),
            "ordinal": pa.array([10**9], pa.int64()),
            "event_row_index": pa.array([1], pa.int64()),
            "dml": pa.array(["UPDATE"]),
            "repo": pa.array(["org1/repo1"]),
            "path": pa.array(["src/f1.en"]),
            "commit": pa.array(["deadbeef"]),
            "lang": pa.array(["en"]),
            "content": pa.array(["STALE CONTENT MUST NOT APPEAR"]),
            "stars": pa.array([None], pa.int64()),
            "part": pa.array([0], pa.int32()),
        }
    )
    feather.write_feather(stale, os.path.join(stale_dir, "stale.ipc"), compression="uncompressed")

    run_ingest(fixture_paths["segment_paths"], lake_dir, num_partitions=N_PARTS, concurrency=2)
    got = read_lake(lake_dir).to_pandas()
    assert not (got["content"] == "STALE CONTENT MUST NOT APPEAR").any()


def test_init_lake_distributed_matches_driver(ray_session, fixture_paths, tmp_path, sf_dir):
    """Distributed snapshot bootstrap == driver-side init_lake, and
    run_ingest applies on top of it to the same final state."""
    import pyarrow.parquet as pq
    import ray.data

    from myzql_binlog_connector_ray.pipelines.ingest import init_lake_distributed

    base = pq.read_table(fixture_paths["base_lake"])
    lake_a = str(tmp_path / "lake_driver")
    lake_b = str(tmp_path / "lake_dist")
    init_lake(base, lake_a, N_PARTS)
    summaries = init_lake_distributed(
        ray.data.from_arrow(base), lake_b, N_PARTS
    )
    assert sum(s["rows"] for s in summaries) == len(base)

    def snap(lake):
        return (
            read_lake(lake)
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
            .reindex(sorted(["repo", "path", "commit", "lang", "content", "stars", "content_sha256"]), axis=1)
        )

    pd.testing.assert_frame_equal(snap(lake_a), snap(lake_b))

    # ingest applies identically on the distributed bootstrap
    run_ingest(fixture_paths["segment_paths"], lake_b, num_partitions=N_PARTS, concurrency=2)
    want = _expected_final(sf_dir)
    got = snap(lake_b)
    pd.testing.assert_series_equal(
        got["content_sha256"], want["content_sha256"], check_names=False
    )
