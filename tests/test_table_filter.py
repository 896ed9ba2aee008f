"""Table filter specificity truth table.

Ported from the reference's 21 filter tests
(reference: src/table_filter.zig:297-500).
"""

import pytest

from myzql_binlog_connector_ray.kernel.table_filter import (
    ConflictingPattern,
    InvalidPattern,
    TableFilter,
)


def test_no_filters_include_everything():
    f = TableFilter()
    assert f.should_include("anydb", "anytable")
    assert not f.is_active


def test_exact_include_whitelist():
    f = TableFilter(include=["mydb.users"])
    assert f.should_include("mydb", "users")
    assert not f.should_include("mydb", "orders")
    assert not f.should_include("otherdb", "users")


def test_exact_exclude_blacklist():
    f = TableFilter(exclude=["mydb.logs"])
    assert not f.should_include("mydb", "logs")
    assert f.should_include("mydb", "users")
    assert f.should_include("otherdb", "logs")


def test_wildcard_schema_include():
    f = TableFilter(include=["*.users"])
    assert f.should_include("db1", "users")
    assert f.should_include("db2", "users")
    assert not f.should_include("db1", "orders")


def test_wildcard_schema_exclude():
    f = TableFilter(exclude=["*.tmp"])
    assert not f.should_include("any", "tmp")
    assert f.should_include("any", "real")


def test_wildcard_table_include():
    f = TableFilter(include=["mydb.*"])
    assert f.should_include("mydb", "anything")
    assert not f.should_include("otherdb", "anything")


def test_wildcard_table_exclude():
    f = TableFilter(exclude=["staging.*"])
    assert not f.should_include("staging", "users")
    assert f.should_include("prod", "users")


def test_exact_overrides_wildcard_schema():
    # include mydb.users exactly while excluding *.users
    f = TableFilter(include=["mydb.users"], exclude=["*.users"])
    assert f.should_include("mydb", "users")
    assert not f.should_include("otherdb", "users")


def test_exact_exclude_overrides_wildcard_include():
    f = TableFilter(include=["mydb.*"], exclude=["mydb.secrets"])
    assert not f.should_include("mydb", "secrets")
    assert f.should_include("mydb", "users")


def test_wildcard_schema_overrides_wildcard_table():
    # *.users is more specific than staging.*
    f = TableFilter(include=["*.users"], exclude=["staging.*"])
    assert f.should_include("staging", "users")
    assert not f.should_include("staging", "other")


def test_whitelist_mode_default_exclude():
    f = TableFilter(include=["a.b"])
    assert not f.should_include("x", "y")


def test_blacklist_mode_default_include():
    f = TableFilter(exclude=["a.b"])
    assert f.should_include("x", "y")


def test_mixed_include_exclude():
    f = TableFilter(include=["app.*"], exclude=["app.cache", "*.tmp"])
    assert f.should_include("app", "users")
    assert not f.should_include("app", "cache")
    assert not f.should_include("app", "tmp")  # *.tmp beats app.*
    assert not f.should_include("other", "users")  # whitelist default


@pytest.mark.parametrize(
    "bad",
    [
        "nodot",
        "a.b.c",
        ".table",
        "schema.",
        "*.*",
        "my*db.table",
        "schema.tab*",
        ".",
        "",
    ],
)
def test_invalid_patterns(bad):
    with pytest.raises(InvalidPattern):
        TableFilter(include=[bad])


@pytest.mark.parametrize(
    "pattern",
    ["mydb.users", "*.users", "mydb.*"],
)
def test_conflicting_patterns(pattern):
    with pytest.raises(ConflictingPattern):
        TableFilter(include=[pattern], exclude=[pattern])


def test_conflict_only_same_specificity():
    # same key at different specificity levels is NOT a conflict
    f = TableFilter(include=["mydb.users"], exclude=["mydb.*"])
    assert f.should_include("mydb", "users")
    assert not f.should_include("mydb", "other")
