"""File-per-binlog envelope export: rotation sink policy + idempotence."""

import glob
import os

import pyarrow.parquet as pq

from myzql_binlog_connector_ray.pipelines.ingest import export_envelope, read_segments


def test_export_one_file_per_segment(ray_session, fixture_paths, tmp_path):
    out = str(tmp_path / "changes")
    rows = export_envelope(read_segments(fixture_paths["segment_paths"]), out)
    files = sorted(glob.glob(out + "/binlog.*.parquet"))
    assert len(files) == len(fixture_paths["segment_paths"])
    assert {os.path.basename(r["path"]) for r in rows} == {os.path.basename(f) for f in files}
    # envelope schema (reference src/parquet_writer.zig:124-134) + provenance
    schema = pq.read_schema(files[0])
    assert schema.names[:9] == [
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
    total = sum(r["rows"] for r in rows)
    assert total == sum(pq.read_metadata(f).num_rows for f in files)

    # re-export overwrites in place (idempotent by segment)
    rows2 = export_envelope(read_segments(fixture_paths["segment_paths"]), out)
    assert sum(r["rows"] for r in rows2) == total
    assert len(glob.glob(out + "/binlog.*.parquet")) == len(files)
    assert not glob.glob(out + "/*.tmp-*")
