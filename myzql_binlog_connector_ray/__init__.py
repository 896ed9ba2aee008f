"""myzql_binlog_connector_ray — a Ray-Data-native CDC ingest engine.

A brand-new engine with the query/data-processing capabilities of the
Shimongb/myzql-binlog-connector reference (a Zig MySQL binlog → Parquet
connector), re-expressed Ray-Data-first:

- binlog *segment files* (self-contained, byte-compatible with MySQL's
  binlog event layouts) are the source instead of a live socket;
- decode runs as ``map_batches`` over an actor pool holding the
  TABLE_MAP cache / format-description state per segment;
- the reference's 9-column Parquet envelope is reproduced exactly;
- beyond the reference, changes are *applied* as key-partitioned
  last-writer-wins upserts into a Parquet lake (hash partition on
  ``(repo, path)``, sorted-merge by GTID commit ordinal), with schema
  evolution, exactly-once manifest commits and checkpoint/resume.

Nothing here calls ``ray.init`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"
