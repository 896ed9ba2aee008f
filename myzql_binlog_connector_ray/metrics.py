"""Pipeline metrics: per-worker counters with merge.

Shape follows the reference's metrics (events/rows/batches/bytes plus
worker-attributed timings, merged at join; reference:
src/metrics.zig:25-94). In the Ray engine each decode actor keeps a
``Metrics``; per-stage wall times come from ``Dataset.stats()``, and
partition manifests carry the per-partition row counts/watermarks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Metrics:
    events_processed: int = 0
    rows_processed: int = 0
    batches_emitted: int = 0
    bytes_read: int = 0
    segments_processed: int = 0
    tables_filtered: int = 0
    parse_errors: int = 0
    decode_ns: int = 0

    def merge(self, other: "Metrics") -> "Metrics":
        return Metrics(
            events_processed=self.events_processed + other.events_processed,
            rows_processed=self.rows_processed + other.rows_processed,
            batches_emitted=self.batches_emitted + other.batches_emitted,
            bytes_read=self.bytes_read + other.bytes_read,
            segments_processed=self.segments_processed + other.segments_processed,
            tables_filtered=self.tables_filtered + other.tables_filtered,
            parse_errors=self.parse_errors + other.parse_errors,
            decode_ns=self.decode_ns + other.decode_ns,
        )

    def rows_per_sec(self) -> float:
        if self.decode_ns == 0:
            return 0.0
        return self.rows_processed / (self.decode_ns / 1e9)

    def summary(self) -> str:
        return (
            f"events={self.events_processed} rows={self.rows_processed} "
            f"batches={self.batches_emitted} bytes={self.bytes_read} "
            f"segments={self.segments_processed} filtered_tables={self.tables_filtered} "
            f"errors={self.parse_errors} rows/sec={self.rows_per_sec():.0f}"
        )
