"""Config validation rules, metrics merge, stdout formatter, position range.

Config rules mirror the reference (src/config.zig:97-269); metrics
merge mirrors src/metrics.zig:73-94; formatter preview rule mirrors
src/event_parser.zig:354-373.
"""

import pyarrow as pa
import pytest

from myzql_binlog_connector_ray.config import ConfigError, JobConfig, binlog_file_number
from myzql_binlog_connector_ray.kernel.table_filter import ConflictingPattern, InvalidPattern
from myzql_binlog_connector_ray.metrics import Metrics
from myzql_binlog_connector_ray.output import format_blob, format_change_row, format_scalar


def test_file_number_extraction():
    assert binlog_file_number("binlog.000002") == 2
    assert binlog_file_number("mysql-bin.000123") == 123
    assert binlog_file_number("nodigits") is None


def test_config_defaults_valid():
    JobConfig(segments_dir="/tmp/x").validate()


def test_from_position_minimum():
    with pytest.raises(ConfigError):
        JobConfig(from_binlog_position=3).validate()
    JobConfig(from_binlog_position=4).validate()


def test_range_file_ordering():
    with pytest.raises(ConfigError):
        JobConfig(from_binlog_file="binlog.000005", to_binlog_file="binlog.000002").validate()
    JobConfig(from_binlog_file="binlog.000002", to_binlog_file="binlog.000005").validate()


def test_range_same_file_position_ordering():
    with pytest.raises(ConfigError):
        JobConfig(
            from_binlog_file="binlog.000002",
            from_binlog_position=1000,
            to_binlog_file="binlog.000002",
            to_binlog_position=500,
        ).validate()
    JobConfig(
        from_binlog_file="binlog.000002",
        from_binlog_position=1000,
        to_binlog_file="binlog.000002",
        to_binlog_position=2000,
    ).validate()


def test_config_filter_validation():
    with pytest.raises(InvalidPattern):
        JobConfig(include_tables=["*.*"]).validate()
    with pytest.raises(ConflictingPattern):
        JobConfig(include_tables=["a.b"], exclude_tables=["a.b"]).validate()


def test_config_from_dict_ignores_unknown():
    cfg = JobConfig.from_dict({"segments_dir": "/x", "unknown_key": 1, "host": "db", "port": 3307})
    assert cfg.segments_dir == "/x" and cfg.port == 3307


def test_metrics_merge():
    a = Metrics(events_processed=10, rows_processed=100, bytes_read=5, decode_ns=2_000_000_000)
    b = Metrics(events_processed=5, rows_processed=50, parse_errors=1, decode_ns=1_000_000_000)
    m = a.merge(b)
    assert m.events_processed == 15 and m.rows_processed == 150
    assert m.parse_errors == 1 and m.bytes_read == 5
    assert m.rows_per_sec() == pytest.approx(50.0)
    assert "rows=150" in m.summary()


def test_blob_preview_rule():
    assert format_blob(b"\x0a\xbc") == "0x0abc"
    big = bytes(range(256)) * 2  # 512 bytes
    s = format_blob(big)
    assert s.startswith("<blob 512 bytes: 0x") and s.endswith("...>")
    assert len(bytes.fromhex(s.split("0x")[1].split(".")[0])) == 32


def test_format_scalars():
    assert format_scalar(None) == "NULL"
    assert format_scalar(("dt", 2024, 1, 2, 3, 4, 5, 0)) == "2024-01-02 03:04:05"
    assert format_scalar(("ts", 1_700_000_000 * 1_000_000)) == "2023-11-14T22:13:20Z"
    assert format_scalar(("dur", 1, 0, 1, 2, 3, 0)) == "-01:02:03"
    assert format_scalar(("str", b"hi")) == '"hi"'
    assert format_scalar(("dec", "1.50")) == '"1.50"'


def test_format_change_row():
    text = format_change_row(1_700_000_000, "app", "repos", "UPDATE", [1], [2])
    assert "UPDATE app.repos" in text
    assert "before: c0=1" in text and "after:  c0=2" in text


def test_position_range_predicate_in_decoder():
    """F3: (file, log_pos) pushdown — boundary segments mask rows by
    log_pos, out-of-range segments are skipped entirely."""
    from myzql_binlog_connector_ray.stages.decode import SegmentDecoder
    from tests.test_kernel_roundtrip import TYPED_SPEC, ROW, _build_segment

    seg = _build_segment(rows=[ROW] * 5)
    dec_all = SegmentDecoder(mode="envelope")
    n_all = dec_all(pa.table({"path": ["binlog.000001"], "bytes": [seg]})).num_rows
    assert n_all == 5

    # skip segments entirely outside the range
    dec_skip = SegmentDecoder(mode="envelope", from_file="binlog.000002")
    assert dec_skip(pa.table({"path": ["binlog.000001"], "bytes": [seg]})).num_rows == 0
    dec_skip2 = SegmentDecoder(mode="envelope", to_file="binlog.000000")
    assert dec_skip2(pa.table({"path": ["binlog.000001"], "bytes": [seg]})).num_rows == 0

    # position bound inside the boundary file: to_position below the row
    # event's end position drops its rows
    dec_pos = SegmentDecoder(mode="envelope", to_file="binlog.000001", to_position=50)
    assert dec_pos(pa.table({"path": ["binlog.000001"], "bytes": [seg]})).num_rows == 0
    dec_pos2 = SegmentDecoder(mode="envelope", to_file="binlog.000001", to_position=10_000_000)
    assert dec_pos2(pa.table({"path": ["binlog.000001"], "bytes": [seg]})).num_rows == 5
