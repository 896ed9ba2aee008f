"""Schema/table include-exclude filter with specificity-ordered evaluation.

Semantics match the reference connector's filter
(reference: src/table_filter.zig:29-291):

- patterns are ``schema.table``, ``schema.*`` or ``*.table``;
- evaluation order (most specific wins): exact > ``*.table`` >
  ``schema.*`` > default;
- default is *exclude* when any include rule exists (whitelist mode),
  else *include* (blacklist mode);
- pattern validation: exactly one dot, non-empty parts, no ``*.*``, no
  embedded wildcards;
- a pattern appearing in both include and exclude is a conflict error.

Applied inside the decode stage at TABLE_MAP time, so filtered tables
skip all row parsing — the earliest-point-filter optimization the
reference uses (reference: src/binlog_reader.zig:406-417).
"""

from __future__ import annotations

from typing import Iterable, Optional


class FilterError(ValueError):
    pass


class InvalidPattern(FilterError):
    pass


class ConflictingPattern(FilterError):
    pass


def _parse_pattern(pattern: str) -> tuple[str, str]:
    """Validate and split → (kind, key) where kind ∈ {exact, ws, wt}."""
    dot = pattern.find(".")
    if dot < 0 or pattern.find(".", dot + 1) >= 0:
        raise InvalidPattern(pattern)
    schema, table = pattern[:dot], pattern[dot + 1 :]
    if not schema or not table:
        raise InvalidPattern(pattern)
    schema_wild = schema == "*"
    table_wild = table == "*"
    if schema_wild and table_wild:
        raise InvalidPattern(pattern)
    if not schema_wild and "*" in schema:
        raise InvalidPattern(pattern)
    if not table_wild and "*" in table:
        raise InvalidPattern(pattern)
    if schema_wild:
        return "ws", table  # *.table
    if table_wild:
        return "wt", schema  # schema.*
    return "exact", pattern


class TableFilter:
    """O(1) include/exclude evaluation over (schema, table)."""

    def __init__(
        self,
        include: Optional[Iterable[str]] = None,
        exclude: Optional[Iterable[str]] = None,
    ):
        self.include_exact: set[str] = set()
        self.exclude_exact: set[str] = set()
        self.include_ws: set[str] = set()  # *.table → table names
        self.exclude_ws: set[str] = set()
        self.include_wt: set[str] = set()  # schema.* → schema names
        self.exclude_wt: set[str] = set()
        self.rule_count = 0

        include = list(include or [])
        exclude = list(exclude or [])
        for pattern in include:
            kind, key = _parse_pattern(pattern)
            getattr(self, f"include_{'exact' if kind == 'exact' else kind}").add(key)
            self.rule_count += 1
        for pattern in exclude:
            kind, key = _parse_pattern(pattern)
            getattr(self, f"exclude_{'exact' if kind == 'exact' else kind}").add(key)
            self.rule_count += 1
        self.has_include_rules = len(include) > 0

        if (
            self.include_exact & self.exclude_exact
            or self.include_ws & self.exclude_ws
            or self.include_wt & self.exclude_wt
        ):
            raise ConflictingPattern("pattern present in both include and exclude")

    def should_include(self, schema: str, table: str) -> bool:
        fqn = f"{schema}.{table}"
        if fqn in self.include_exact:
            return True
        if fqn in self.exclude_exact:
            return False
        if table in self.include_ws:
            return True
        if table in self.exclude_ws:
            return False
        if schema in self.include_wt:
            return True
        if schema in self.exclude_wt:
            return False
        return not self.has_include_rules

    @property
    def is_active(self) -> bool:
        return self.rule_count > 0
