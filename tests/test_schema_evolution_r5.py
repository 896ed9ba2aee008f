"""Round-5 schema-evolution semantics: column DROP (DDL-driven remap +
null-fill of the retained lake column) and type NARROWING / family
change (loud rejection), including the multi-table ingest path.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from myzql_binlog_connector_ray.kernel import binlog_writer as bw
from myzql_binlog_connector_ray.stages.decode import (
    SchemaEvolutionError,
    SegmentDecoder,
    _parse_drop_columns,
)

REG = ["repo", "path", "stars", "lang"]
FULL = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_long(), bw.c_varchar(50)],
    REG,
)
# post-"DROP COLUMN stars" layout: lang shifts left one position
DROPPED = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_varchar(50)],
    ["repo", "path", "lang"],
)
STARS_BIG = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_longlong(), bw.c_varchar(50)],
    REG,
)
STARS_STR = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_varchar(20), bw.c_varchar(50)],
    REG,
)


def _decode(segment, registry_cols=REG):
    dec = SegmentDecoder(
        mode="typed",
        registry={("app", "repos"): registry_cols},
        target_table=("app", "repos"),
    )
    return dec(pa.table({"path": ["binlog.000001"], "bytes": [segment]})).to_pandas()


def test_parse_drop_columns():
    assert _parse_drop_columns("app", "ALTER TABLE repos DROP COLUMN stars") == (
        ("app", "repos"), ["stars"],
    )
    assert _parse_drop_columns("x", "alter table app.`repos` drop `stars`, drop column lang") == (
        ("app", "repos"), ["stars", "lang"],
    )
    # not column drops
    assert _parse_drop_columns("app", "ALTER TABLE repos DROP PRIMARY KEY") is None
    assert _parse_drop_columns("app", "ALTER TABLE repos ADD COLUMN x INT") is None
    assert _parse_drop_columns("app", "INSERT INTO repos VALUES (1)") is None


def test_drop_column_mid_stream_remaps_and_nullfills():
    """After DROP COLUMN stars, 'lang' moves left one image position:
    the decode must put it back under 'lang', with 'stars' null — NOT
    silently misalign lang's value into stars (the pre-round-5 pad-at-
    end behavior would have)."""
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(FULL)
    w.write_rows(FULL, [["r1", "p1", 7, "py"]])
    w.query("app", "ALTER TABLE repos DROP COLUMN stars")
    w.gtid(2)
    w.table_map(DROPPED)
    w.write_rows(DROPPED, [["r2", "p2", "go"]])
    w.rotate("x")
    df = _decode(w.getvalue()).set_index("repo")
    assert df.loc["r1", "stars"] == 7 and df.loc["r1", "lang"] == "py"
    assert df.loc["r2", "lang"] == "go"
    import pandas as pd

    assert pd.isna(df.loc["r2", "stars"])


def test_count_decrease_without_ddl_rejected():
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(FULL)
    w.write_rows(FULL, [["r1", "p1", 7, "py"]])
    w.gtid(2)
    w.table_map(DROPPED)  # narrower, but no DROP COLUMN DDL
    w.write_rows(DROPPED, [["r2", "p2", "go"]])
    w.rotate("x")
    with pytest.raises(SchemaEvolutionError, match="no\\s+preceding DROP COLUMN"):
        _decode(w.getvalue())


def test_int_narrowing_rejected():
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(STARS_BIG)
    w.write_rows(STARS_BIG, [["r1", "p1", 2**40, "py"]])
    w.gtid(2)
    w.table_map(FULL)  # stars LONGLONG → LONG: lossy
    w.write_rows(FULL, [["r2", "p2", 5, "go"]])
    w.rotate("x")
    with pytest.raises(SchemaEvolutionError, match="stars.*narrow|narrowing"):
        _decode(w.getvalue())


def test_type_family_change_rejected():
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(FULL)
    w.write_rows(FULL, [["r1", "p1", 7, "py"]])
    w.gtid(2)
    w.table_map(STARS_STR)  # stars LONG → VARCHAR
    w.write_rows(STARS_STR, [["r2", "p2", "many", "go"]])
    w.rotate("x")
    with pytest.raises(SchemaEvolutionError):
        _decode(w.getvalue())


def test_widening_still_accepted():
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(FULL)
    w.write_rows(FULL, [["r1", "p1", 7, "py"]])
    w.gtid(2)
    w.table_map(STARS_BIG)  # LONG → LONGLONG: lossless
    w.write_rows(STARS_BIG, [["r2", "p2", 2**40, "go"]])
    w.rotate("x")
    df = _decode(w.getvalue()).set_index("repo")
    assert df.loc["r2", "stars"] == 2**40


def test_drop_and_narrow_in_multi_table_path(ray_session, tmp_path):
    """The VERDICT done-bar: evolution semantics per table in the
    MULTI-table ingest. One decode pass applies app.repos (with a
    mid-stream DROP COLUMN) and metrics.counters; the dropped column is
    null-filled in the lake for post-drop rows; a narrowing stream on
    counters fails loudly."""
    import pyarrow.parquet as pq

    from myzql_binlog_connector_ray.pipelines.ingest import read_lake, run_ingest_multi

    counters = bw.TableSpec("metrics", "counters", 202, [bw.c_longlong(), bw.c_longlong()], ["id", "val"])

    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(FULL)
    w.write_rows(FULL, [["r1", "p1", 7, "py"]])
    w.gtid(2)
    w.table_map(counters)
    w.write_rows(counters, [[1, 100]])
    w.query("app", "ALTER TABLE repos DROP COLUMN stars")
    w.gtid(3)
    w.table_map(DROPPED)
    w.write_rows(DROPPED, [["r2", "p2", "go"]])
    w.rotate("binlog.000002")
    seg = tmp_path / "binlog.000001"
    seg.write_bytes(w.getvalue())

    registry = {("app", "repos"): REG, ("metrics", "counters"): ["id", "val"]}
    cfgs = {
        ("app", "repos"): dict(
            keys=["repo", "path"],
            types={"repo": pa.string(), "path": pa.string(), "stars": pa.int64(), "lang": pa.string()},
            final_columns=["repo", "path", "stars", "lang"],
        ),
        ("metrics", "counters"): dict(
            keys=["id"], types={"id": pa.int64(), "val": pa.int64()}, final_columns=["id", "val"],
        ),
    }
    root = str(tmp_path / "lake")
    rows = run_ingest_multi(
        [str(seg)], root,
        tables=(("app", "repos"), ("metrics", "counters")),
        num_partitions=4, table_configs=cfgs, registry=registry,
    )
    assert {r["table_ns"] for r in rows} == {"app.repos", "metrics.counters"}
    repos = read_lake(os.path.join(root, "app.repos")).to_pandas().set_index("repo")
    assert repos.loc["r1", "stars"] == 7 and repos.loc["r1", "lang"] == "py"
    assert repos.loc["r2", "lang"] == "go"
    import pandas as pd

    assert pd.isna(repos.loc["r2", "stars"])
    counters_df = read_lake(os.path.join(root, "metrics.counters")).to_pandas()
    assert dict(zip(counters_df["id"], counters_df["val"])) == {1: 100}

    # a narrowing stream on counters is rejected loudly end to end
    w2 = bw.SegmentWriter()
    w2.format_description()
    w2.gtid(10)
    w2.table_map(counters)
    w2.write_rows(counters, [[2, 200]])
    counters_narrow = bw.TableSpec("metrics", "counters", 202, [bw.c_longlong(), bw.c_long()], ["id", "val"])
    w2.gtid(11)
    w2.table_map(counters_narrow)
    w2.write_rows(counters_narrow, [[3, 300]])
    w2.rotate("binlog.000003")
    seg2 = tmp_path / "binlog.000002"
    seg2.write_bytes(w2.getvalue())
    with pytest.raises((SchemaEvolutionError, Exception), match="narrow"):
        run_ingest_multi(
            [str(seg2)], root,
            tables=(("app", "repos"), ("metrics", "counters")),
            num_partitions=4, table_configs=cfgs, registry=registry,
        )
