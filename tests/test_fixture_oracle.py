"""Fixture sanity: the generated change stream matches its closed-form oracle.

Decodes the synthetic segments with a single-threaded Python loop (no
Ray) and cross-checks counts and final LWW state against DuckDB SQL
over the same ``documents`` table — the same equivalence the driver's
correctness gate exercises at sf0.01.
"""

import duckdb
import pandas as pd
import pytest

from myzql_binlog_connector_ray.fixtures.change_stream import (
    SCHEMA_REGISTRY,
    load_docs,
)
from myzql_binlog_connector_ray.stages.apply import _lww_fold, sha256_hex
from myzql_binlog_connector_ray.stages.decode import SegmentDecoder


def _decode_all_typed(paths):
    import pyarrow as pa

    dec = SegmentDecoder(
        mode="typed",
        registry=SCHEMA_REGISTRY,
        target_table=("app", "repos"),
        typed_types={
            "repo": pa.string(),
            "path": pa.string(),
            "commit": pa.string(),
            "lang": pa.string(),
            "content": pa.string(),
            "stars": pa.int64(),
        },
    )
    tables = []
    for p in paths:
        with open(p, "rb") as f:
            blob = f.read()
        tables.append(dec(pa.table({"path": [p], "bytes": [blob]})))
    return pa.concat_tables(tables)


@pytest.fixture(scope="module")
def typed_changes(fixture_paths):
    return _decode_all_typed(fixture_paths["segment_paths"])


def test_change_counts_match_oracle(sf_dir, typed_changes):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    expected = con.sql(
        """
        SELECT
          count(*) FILTER (doc_id % 4 = 0) AS n_insert,
          count(*) FILTER (doc_id % 3 = 0) + count(*) FILTER (doc_id % 9 = 0) AS n_update,
          count(*) FILTER (doc_id % 5 = 0) AS n_delete
        FROM documents
        """
    ).fetchone()
    df = typed_changes.to_pandas()
    got = (
        (df["dml"] == "INSERT").sum(),
        (df["dml"] == "UPDATE").sum(),
        (df["dml"] == "DELETE").sum(),
    )
    assert tuple(int(x) for x in got) == tuple(int(x) for x in expected)


def test_ordinals_strictly_ordered_per_key(typed_changes):
    df = typed_changes.to_pandas()
    g = df.sort_values(["ordinal", "event_row_index"]).groupby(["repo", "path"])["ordinal"]
    assert (g.apply(lambda s: s.is_monotonic_increasing)).all()
    # each key at most once per wave
    df["wave"] = df["ordinal"] // 10_000_000
    assert not df.duplicated(["repo", "path", "wave"]).any()


def test_final_state_matches_sql_oracle(sf_dir, fixture_paths, typed_changes):
    import pyarrow.parquet as pq

    base = pq.read_table(fixture_paths["base_lake"]).to_pandas()
    changes = typed_changes.to_pandas()
    final = _lww_fold(base, changes)
    final = final.drop(columns=[c for c in ("ordinal", "event_row_index", "dml", "segment") if c in final.columns])
    final["content_sha256"] = sha256_hex(final["content"].tolist())

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    oracle = con.sql(
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
               md5(repo || ':' || path || ':v' || v) AS commit,
               lang,
               CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END AS content,
               CASE WHEN doc_id % 9 = 0 THEN doc_id % 1000 END AS stars,
               sha256(CASE WHEN v = 1 THEN text ELSE text || ' [v' || v || ']' END) AS content_sha256
        FROM d
        WHERE doc_id % 5 <> 0
        ORDER BY repo, path
        """
    ).df()

    final = final.sort_values(["repo", "path"]).reset_index(drop=True)
    oracle = oracle.sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(final) == len(oracle)
    pd.testing.assert_series_equal(final["content_sha256"].reset_index(drop=True), oracle["content_sha256"], check_names=False)
    pd.testing.assert_series_equal(final["commit"].reset_index(drop=True), oracle["commit"], check_names=False)
    # schema evolution: stars present only on wave-3 rows
    got_stars = final["stars"].astype("Int64").reset_index(drop=True)
    want_stars = oracle["stars"].astype("Int64").reset_index(drop=True)
    pd.testing.assert_series_equal(got_stars, want_stars, check_names=False)


def test_lww_idempotence(fixture_paths, typed_changes):
    import pyarrow.parquet as pq

    base = pq.read_table(fixture_paths["base_lake"]).to_pandas()
    changes = typed_changes.to_pandas()
    once = _lww_fold(base, changes)
    # replaying the whole stream over the already-applied state is a no-op
    replay_base = once.drop(columns=[c for c in ("ordinal", "event_row_index", "dml", "segment") if c in once.columns])
    twice = _lww_fold(replay_base, changes)
    a = once.sort_values(["repo", "path"])["content"].reset_index(drop=True)
    b = twice.sort_values(["repo", "path"])["content"].reset_index(drop=True)
    pd.testing.assert_series_equal(a, b)
