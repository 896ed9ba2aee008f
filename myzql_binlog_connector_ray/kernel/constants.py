"""MySQL binlog event and column type constants.

Values are from the public MySQL protocol documentation
(https://dev.mysql.com/doc/dev/mysql-server/latest/); the subset chosen
matches what the reference connector recognizes
(reference: src/event_parser.zig:40-171).
"""

from __future__ import annotations

from enum import IntEnum


class EventType(IntEnum):
    UNKNOWN_EVENT = 0
    START_EVENT_V3 = 1
    QUERY_EVENT = 2
    STOP_EVENT = 3
    ROTATE_EVENT = 4
    INTVAR_EVENT = 5
    SLAVE_EVENT = 7
    APPEND_BLOCK_EVENT = 9
    DELETE_FILE_EVENT = 11
    RAND_EVENT = 13
    USER_VAR_EVENT = 14
    FORMAT_DESCRIPTION_EVENT = 15
    XID_EVENT = 16
    BEGIN_LOAD_QUERY_EVENT = 17
    EXECUTE_LOAD_QUERY_EVENT = 18
    TABLE_MAP_EVENT = 19
    WRITE_ROWS_EVENT_V0 = 23
    UPDATE_ROWS_EVENT_V0 = 24
    DELETE_ROWS_EVENT_V0 = 25
    INCIDENT_EVENT = 26
    HEARTBEAT_EVENT = 27
    IGNORABLE_EVENT = 28
    ROWS_QUERY_EVENT = 29
    WRITE_ROWS_EVENT = 30
    UPDATE_ROWS_EVENT = 31
    DELETE_ROWS_EVENT = 32
    GTID_EVENT = 36
    ANONYMOUS_GTID_EVENT = 37
    PREVIOUS_GTIDS_EVENT = 38
    PARTIAL_UPDATE_ROWS_EVENT = 39


class ColumnType(IntEnum):
    DECIMAL = 0
    TINY = 1
    SHORT = 2
    LONG = 3
    FLOAT = 4
    DOUBLE = 5
    NULL = 6
    TIMESTAMP = 7
    LONGLONG = 8
    INT24 = 9
    DATE = 10
    TIME = 11
    DATETIME = 12
    YEAR = 13
    NEWDATE = 14
    VARCHAR = 15
    BIT = 16
    TIMESTAMP2 = 17
    DATETIME2 = 18
    TIME2 = 19
    JSON = 245
    NEWDECIMAL = 246
    ENUM = 247
    SET = 248
    TINY_BLOB = 249
    MEDIUM_BLOB = 250
    LONG_BLOB = 251
    BLOB = 252
    VAR_STRING = 253
    STRING = 254
    GEOMETRY = 255


#: Row events whose payload the engine decodes into change rows
#: (reference: src/event_parser.zig:1155-1171 plus GTID/QUERY which the
#: north rule adds as first-class: ordinal + DDL schema evolution).
PROCESSED_EVENT_TYPES = frozenset(
    {
        EventType.ROTATE_EVENT,
        EventType.FORMAT_DESCRIPTION_EVENT,
        EventType.TABLE_MAP_EVENT,
        EventType.WRITE_ROWS_EVENT_V0,
        EventType.WRITE_ROWS_EVENT,
        EventType.UPDATE_ROWS_EVENT_V0,
        EventType.UPDATE_ROWS_EVENT,
        EventType.DELETE_ROWS_EVENT_V0,
        EventType.DELETE_ROWS_EVENT,
        EventType.PARTIAL_UPDATE_ROWS_EVENT,
    }
)

ROW_EVENT_TYPES = frozenset(
    {
        EventType.WRITE_ROWS_EVENT_V0,
        EventType.WRITE_ROWS_EVENT,
        EventType.UPDATE_ROWS_EVENT_V0,
        EventType.UPDATE_ROWS_EVENT,
        EventType.DELETE_ROWS_EVENT_V0,
        EventType.DELETE_ROWS_EVENT,
        EventType.PARTIAL_UPDATE_ROWS_EVENT,
    }
)

INSERT_EVENTS = frozenset({EventType.WRITE_ROWS_EVENT_V0, EventType.WRITE_ROWS_EVENT})
UPDATE_EVENTS = frozenset(
    {
        EventType.UPDATE_ROWS_EVENT_V0,
        EventType.UPDATE_ROWS_EVENT,
        EventType.PARTIAL_UPDATE_ROWS_EVENT,
    }
)
DELETE_EVENTS = frozenset({EventType.DELETE_ROWS_EVENT_V0, EventType.DELETE_ROWS_EVENT})

EVENT_HEADER_LEN = 19
CRC_LEN = 4
BINLOG_MAGIC = b"\xfebin"


def segment_sort_key(name: str) -> tuple:
    """Commit-order sort key for binlog file names.

    MySQL widens the numeric suffix past ``.999999`` (``binlog.1000000``),
    so a plain string sort misorders a long-lived stream
    (``binlog.1000000`` < ``binlog.999999`` lexicographically — it would
    silently pick the wrong LWW winner). Sort by ``(stem, int(suffix))``
    when the suffix is numeric; otherwise plain string order.
    """
    import os as _os

    base = _os.path.basename(name)
    stem, _, suf = base.rpartition(".")
    if suf.isdigit():
        return (stem, int(suf), base)
    return (base, -1, base)
