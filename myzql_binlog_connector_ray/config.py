"""Job configuration: JSON loader + validation.

Mirrors the reference's config semantics and validation rules
(reference: src/config.zig:97-269):

- ``from_binlog_position >= 4`` (first event after the magic);
- from/to range ordering, including binlog file-number extraction
  (``binlog.000002`` → 2; reference: src/config.zig:76-94): the end
  file must not precede the start file, and within the same file the
  end position must exceed the start position;
- table filter patterns validated (and conflict-checked) via
  kernel.table_filter.

Connectivity fields (host/port/credentials) from the reference are
accepted but ignored — this engine reads binlog *segment files*, not a
live socket (SURVEY.md §2.1 S2/S3: out of scope).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Optional

from .kernel.table_filter import TableFilter


class ConfigError(ValueError):
    pass


_FILE_NUM_RE = re.compile(r"(\d+)$")


def binlog_file_number(name: str) -> Optional[int]:
    """Trailing-digit file ordinal: 'binlog.000002' → 2; None if absent."""
    m = _FILE_NUM_RE.search(name)
    return int(m.group(1)) if m else None


@dataclass
class JobConfig:
    segments_dir: str = ""
    output_dir: str = "output"
    lake_dir: Optional[str] = None
    base_snapshot: Optional[str] = None  # bootstrap mode: parquet of the initial table state

    from_binlog_file: Optional[str] = None
    from_binlog_position: int = 4
    to_binlog_file: Optional[str] = None
    to_binlog_position: Optional[int] = None

    include_tables: list[str] = field(default_factory=list)
    exclude_tables: list[str] = field(default_factory=list)

    parquet_batch_size: int = 8192
    num_partitions: int = 64
    concurrency: Optional[int] = None

    # apply-mode sink: "rewrite" (fold + rewrite each touched partition)
    # or "delta" (append LWW-reduced delta files; compact later)
    sink: str = "rewrite"
    # apply-multi mode: tables to replicate, as "schema.table" strings;
    # each must be registered in pipelines.ingest.TABLE_CONFIGS (or a
    # caller-supplied config when used via the API)
    tables: list[str] = field(default_factory=list)

    # accepted-but-ignored socket-mode fields (reference compatibility)
    host: Optional[str] = None
    port: int = 3306
    user: Optional[str] = None
    password: Optional[str] = None

    def validate(self) -> None:
        if self.from_binlog_position < 4:
            raise ConfigError("from_binlog_position must be >= 4 (binlog magic is 4 bytes)")
        if self.parquet_batch_size <= 0:
            raise ConfigError("parquet_batch_size must be positive")
        if self.num_partitions <= 0:
            raise ConfigError("num_partitions must be positive")
        if self.sink not in ("rewrite", "delta"):
            raise ConfigError(f"sink must be 'rewrite' or 'delta', got {self.sink!r}")
        for t in self.tables:
            if t.count(".") != 1 or not all(t.split(".")):
                raise ConfigError(f"tables entries must be 'schema.table', got {t!r}")

        if self.to_binlog_file is not None and self.from_binlog_file is not None:
            fn_from = binlog_file_number(self.from_binlog_file)
            fn_to = binlog_file_number(self.to_binlog_file)
            if fn_from is not None and fn_to is not None:
                if fn_to < fn_from:
                    raise ConfigError(
                        f"to_binlog_file {self.to_binlog_file} precedes from_binlog_file {self.from_binlog_file}"
                    )
                if fn_to == fn_from and self.to_binlog_position is not None:
                    if self.to_binlog_position <= self.from_binlog_position:
                        raise ConfigError("to_binlog_position must exceed from_binlog_position in the same file")
        # raises InvalidPattern / ConflictingPattern on bad filters
        TableFilter(self.include_tables, self.exclude_tables)

    @classmethod
    def from_dict(cls, d: dict) -> "JobConfig":
        known = {f for f in cls.__dataclass_fields__}
        cfg = cls(**{k: v for k, v in d.items() if k in known})
        cfg.validate()
        return cfg

    @classmethod
    def load(cls, path: str) -> "JobConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))
