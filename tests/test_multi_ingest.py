"""Multi-table typed ingest: one decode pass → per-table namespaced
lakes, independent exactly-once watermarks, per-table schema evolution.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from myzql_binlog_connector_ray.kernel import binlog_writer as bw
from myzql_binlog_connector_ray.pipelines.ingest import (
    TABLE_CONFIGS,
    init_lake,
    read_lake,
    run_ingest_multi,
)


def test_partition_of_cols_matches_partition_of():
    """The generalized key hash must route (repo, path) exactly like the
    original, so repos lakes from either path interoperate."""
    from myzql_binlog_connector_ray.stages.apply import partition_of, partition_of_cols

    t = pa.table(
        {
            "repo": pa.array(["org0/hot", "org1/r1", "org2/r2"] * 5),
            "path": pa.array([f"src/f{i}.py" for i in range(15)]),
        }
    )
    a = partition_of(t["repo"], t["path"], 16)
    b = partition_of_cols(t, ["repo", "path"], 16)
    assert (a == b).all()


@pytest.fixture(scope="module")
def multi_lake(ray_session, fixture_paths, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("multilake"))
    init_lake(pq.read_table(fixture_paths["base_lake"]), os.path.join(root, "app.repos"), 8)
    rows = run_ingest_multi(fixture_paths["segment_paths"], root, num_partitions=8)
    return root, rows


def test_multi_ingest_both_tables_committed(multi_lake, fixture_paths):
    root, rows = multi_lake
    by_ns = {}
    for r in rows:
        by_ns.setdefault(r["table_ns"], []).append(r)
    assert set(by_ns) == {"app.repos", "metrics.counters"}
    assert all(not r["skipped"] for r in rows)

    # counters final state == the wave-1b insert set from documents
    docs = pq.read_table(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"), columns=["doc_id", "text"]
    )
    want = {
        int(d): len(t) for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if d % 11 == 0
    }
    got = read_lake(os.path.join(root, "metrics.counters")).to_pandas()
    assert dict(zip(got["id"], got["val"])) == want
    # on-disk file columns are exactly the final schema ("part" in the
    # frame above is ray's hive-partition dir parse, not file data)
    import glob

    f = glob.glob(os.path.join(root, "metrics.counters", "part=*", "*.parquet"))[0]
    assert pq.read_schema(f).names == ["id", "val"]


def test_multi_ingest_repos_matches_single_table(multi_lake, fixture_paths, tmp_path_factory):
    """The repos namespace out of the one-pass two-table replay must be
    value-identical to the single-table flagship ingest."""
    from myzql_binlog_connector_ray.pipelines.ingest import FINAL_COLUMNS, run_ingest

    root, _ = multi_lake
    single = str(tmp_path_factory.mktemp("single"))
    init_lake(pq.read_table(fixture_paths["base_lake"]), single, 8)
    run_ingest(fixture_paths["segment_paths"], single, num_partitions=8)

    norm = lambda df: (
        df[FINAL_COLUMNS].sort_values(["repo", "path"]).reset_index(drop=True)
    )
    a = norm(read_lake(os.path.join(root, "app.repos")).to_pandas())
    b = norm(read_lake(single).to_pandas())
    assert a.equals(b)


def test_multi_ingest_exactly_once_replay(multi_lake, fixture_paths):
    root, _ = multi_lake
    rows = run_ingest_multi(fixture_paths["segment_paths"], root, num_partitions=8)
    not_skipped = [(r["table_ns"], r["part"]) for r in rows if not r["skipped"]]
    assert not_skipped == []


def test_multi_ingest_schema_evolution_per_table(ray_session, tmp_path):
    """BOTH tables evolve mid-stream in one segment: repos gains lang,
    counters gains note — each namespace unifies its own schema."""
    repos_v1 = bw.TableSpec(
        "app", "repos", 101,
        [bw.c_varchar(100), bw.c_varchar(100), bw.c_varchar(1000)],
        ["repo", "path", "content"],
    )
    repos_v2 = bw.TableSpec(
        "app", "repos", 101,
        repos_v1.columns + [bw.c_varchar(20)],
        ["repo", "path", "content", "lang"],
    )
    ctr_v1 = bw.TableSpec(
        "metrics", "counters", 202, [bw.c_longlong(), bw.c_longlong()], ["id", "val"]
    )
    ctr_v2 = bw.TableSpec(
        "metrics", "counters", 202,
        ctr_v1.columns + [bw.c_varchar(40)],
        ["id", "val", "note"],
    )
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(repos_v1)
    w.write_rows(repos_v1, [["r1", "p1", "c-old"]])
    w.gtid(2)
    w.table_map(ctr_v1)
    w.write_rows(ctr_v1, [[7, 70]])
    w.gtid(3)
    w.table_map(repos_v2)  # repos evolves
    w.write_rows(repos_v2, [["r2", "p2", "c-new", "py"]])
    w.gtid(4)
    w.table_map(ctr_v2)  # counters evolves
    w.write_rows(ctr_v2, [[8, 80, "n8"]])
    w.update_rows(ctr_v2, [([7, 70, None], [7, 71, "bumped"])])
    w.rotate("binlog.000002")
    seg = tmp_path / "binlog.000001"
    seg.write_bytes(w.getvalue())

    registry = {
        ("app", "repos"): ["repo", "path", "content", "lang"],
        ("metrics", "counters"): ["id", "val", "note"],
    }
    cfgs = {
        ("app", "repos"): dict(
            keys=["repo", "path"],
            types={"repo": pa.string(), "path": pa.string(), "content": pa.string(), "lang": pa.string()},
            final_columns=["repo", "path", "content", "lang", "content_sha256"],
        ),
        ("metrics", "counters"): dict(
            keys=["id"],
            types={"id": pa.int64(), "val": pa.int64(), "note": pa.string()},
            final_columns=["id", "val", "note"],
        ),
    }
    root = str(tmp_path / "lake")
    rows = run_ingest_multi(
        [str(seg)], root, num_partitions=4, table_configs=cfgs, registry=registry
    )
    assert {r["table_ns"] for r in rows} == {"app.repos", "metrics.counters"}

    repos = read_lake(os.path.join(root, "app.repos")).to_pandas().set_index("repo")
    assert repos.loc["r1", "lang"] is None or repos.loc["r1"].isna()["lang"]
    assert repos.loc["r2", "lang"] == "py"
    import hashlib

    assert repos.loc["r2", "content_sha256"] == hashlib.sha256(b"c-new").hexdigest()

    ctr = read_lake(os.path.join(root, "metrics.counters")).to_pandas().set_index("id")
    assert ctr.loc[7, "val"] == 71 and ctr.loc[7, "note"] == "bumped"  # LWW across evolution
    assert ctr.loc[8, "note"] == "n8"


def test_multi_ingest_delta_sink_matches_rewrite(ray_session, fixture_paths, multi_lake, tmp_path_factory):
    """Multi-table ingest with the delta sink + per-namespace compaction
    equals the rewrite-sink multi lake for both tables."""
    from myzql_binlog_connector_ray.pipelines.ingest import FINAL_COLUMNS, compact_lake

    rewrite_root, _ = multi_lake
    root = str(tmp_path_factory.mktemp("multidelta"))
    init_lake(pq.read_table(fixture_paths["base_lake"]), os.path.join(root, "app.repos"), 8)
    rows = run_ingest_multi(fixture_paths["segment_paths"], root, num_partitions=8, sink="delta")
    assert {r["table_ns"] for r in rows} == {"app.repos", "metrics.counters"}
    import glob

    assert glob.glob(os.path.join(root, "*", "part=*", "delta-*.parquet"))
    # no table config: key columns come from each partition's manifest
    compact_lake(os.path.join(root, "app.repos"))
    compact_lake(os.path.join(root, "metrics.counters"))

    for ns, cols, keys in (
        ("app.repos", FINAL_COLUMNS, ["repo", "path"]),
        ("metrics.counters", ["id", "val"], ["id"]),
    ):
        a = read_lake(os.path.join(root, ns)).to_pandas()[cols].sort_values(keys).reset_index(drop=True)
        b = read_lake(os.path.join(rewrite_root, ns)).to_pandas()[cols].sort_values(keys).reset_index(drop=True)
        assert a.equals(b), ns
