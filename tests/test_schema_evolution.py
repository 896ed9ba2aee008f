"""Schema evolution beyond column-add: type widening + replace-on-rewrite.

The binlog carries no ALTER semantics — a later TABLE_MAP for the same
table_id simply describes the new layout and replaces the cached one
(reference: src/binlog_reader.zig:419-423). These tests pin decode +
LWW-merge behavior for column-add and INT→BIGINT widening.
"""

import pandas as pd
import pyarrow as pa

from myzql_binlog_connector_ray.kernel import binlog_writer as bw
from myzql_binlog_connector_ray.stages.apply import _lww_fold
from myzql_binlog_connector_ray.stages.decode import SegmentDecoder

NARROW = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_long()],
    ["repo", "path", "stars"],
)
WIDE = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_longlong()],
    ["repo", "path", "stars"],
)
ADDED = bw.TableSpec(
    "app", "repos", 101,
    [bw.c_varchar(100), bw.c_varchar(100), bw.c_long(), bw.c_varchar(50)],
    ["repo", "path", "stars", "lang"],
)


def _decode(segment, registry_cols):
    dec = SegmentDecoder(
        mode="typed",
        registry={("app", "repos"): registry_cols},
        target_table=("app", "repos"),
    )
    return dec(pa.table({"path": ["binlog.000001"], "bytes": [segment]})).to_pandas()


def test_int_widening_mid_stream():
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(NARROW)
    w.write_rows(NARROW, [["r1", "p1", 100]])
    w.query("app", "ALTER TABLE repos MODIFY stars BIGINT")
    w.gtid(2)
    w.table_map(WIDE)  # replaces the cached map: stars now 8 bytes
    w.write_rows(WIDE, [["r2", "p2", 2**40]])
    w.rotate("x")
    df = _decode(w.getvalue(), ["repo", "path", "stars"])
    assert len(df) == 2
    by_repo = df.set_index("repo")["stars"]
    assert by_repo["r1"] == 100
    assert by_repo["r2"] == 2**40  # would be garbage if the old 4-byte decode were reused


def test_column_add_mid_stream_and_merge():
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(NARROW)
    w.write_rows(NARROW, [["r1", "p1", 1]])
    w.gtid(2)
    w.table_map(ADDED)
    w.write_rows(ADDED, [["r2", "p2", 2, "py"]])
    w.rotate("x")
    df = _decode(w.getvalue(), ["repo", "path", "stars", "lang"])
    assert df.set_index("repo")["lang"].isna()["r1"]
    assert df.set_index("repo")["lang"]["r2"] == "py"

    # LWW merge with a base that predates the new column
    base = pd.DataFrame({"repo": ["r0"], "path": ["p0"], "stars": [0]})
    df["content"] = "x"
    base["content"] = "y"
    merged = _lww_fold(base, df)
    assert set(merged["repo"]) == {"r0", "r1", "r2"}
    assert pd.isna(merged.set_index("repo")["lang"]["r0"])
