"""Encoder↔decoder round-trip over every column-type decode branch.

The synthetic writer (kernel.binlog_writer) frames events byte-exactly
to the MySQL layouts; the decode kernel must recover the original
values (FIXTURES.md §F3 coverage table; decode branches at
reference: src/event_parser.zig:867-1039).
"""

import json

from myzql_binlog_connector_ray.kernel import binlog_writer as bw
from myzql_binlog_connector_ray.kernel.constants import EventType
from myzql_binlog_connector_ray.kernel.event_codec import (
    iter_events,
    parse_format_description,
    parse_gtid,
    parse_query,
    parse_rotate,
    parse_row_event,
    parse_table_map,
)
from myzql_binlog_connector_ray.kernel.row_json import serialize_row

TYPED_SPEC = bw.TableSpec(
    schema="app",
    table="typed_rows",
    table_id=7,
    columns=[
        bw.c_tiny(),
        bw.c_short(),
        bw.c_int24(),
        bw.c_long(),
        bw.c_longlong(),
        bw.c_float(),
        bw.c_double(),
        bw.c_year(),
        bw.c_date(),
        bw.c_datetime2(0),
        bw.c_datetime2(6),
        bw.c_timestamp2(0),
        bw.c_timestamp2(6),
        bw.c_time2(3),
        bw.c_varchar(300),
        bw.c_char(10),
        bw.c_enum(),
        bw.c_set(),
        bw.c_bit(12),
        bw.c_blob(),
        bw.c_decimal(5, 2),
        bw.c_decimal(65, 30),
        bw.c_json(),
    ],
)

ROW = [
    -5,
    1234,
    -100000,
    2**31 - 1,
    -(2**62),
    1.5,
    3.25,
    2024,
    ("dt", 2024, 2, 29, 0, 0, 0, 0),
    ("dt", 2023, 12, 31, 23, 59, 59, 0),
    ("dt", 2023, 1, 2, 3, 4, 5, 123456),
    ("ts", 1_700_000_000 * 1_000_000),
    ("ts", 1_700_000_000 * 1_000_000 + 654_321),
    ("dur", 0, 0, 13, 14, 15, 250_000),
    ("str", "héllo wörld".encode("utf-8")),
    ("str", b"fixed"),
    3,
    0b101,
    ("blob", bytes([0x0A, 0xBC])),
    ("blob", b"\x00\x01\x02binary"),
    ("dec", "-123.45"),
    ("dec", "12345678901234567890.123456789012345678901234567890"),
    ("json", '{"a": 1, "b": "x"}'),
]


def _build_segment(rows=None, with_nulls=False):
    w = bw.SegmentWriter()
    w.format_description()
    w.gtid(1)
    w.table_map(TYPED_SPEC)
    w.write_rows(TYPED_SPEC, rows or [ROW])
    if with_nulls:
        w.gtid(2)
        null_row = [None] * len(TYPED_SPEC.columns)
        w.table_map(TYPED_SPEC)
        w.write_rows(TYPED_SPEC, [null_row])
    w.rotate("binlog.000002")
    return w.getvalue()


def _decode_all(segment):
    fde = None
    tmap = None
    decoded = []
    for ev in iter_events(segment):
        if ev.event_type == EventType.FORMAT_DESCRIPTION_EVENT:
            fde = parse_format_description(ev.data)
        elif ev.event_type == EventType.TABLE_MAP_EVENT:
            tmap = parse_table_map(ev.data)
        elif ev.event_type in (
            EventType.WRITE_ROWS_EVENT,
            EventType.UPDATE_ROWS_EVENT,
            EventType.DELETE_ROWS_EVENT,
        ):
            decoded.extend(parse_row_event(ev.event_type, ev.data, tmap, fde["post_header_len"]))
    return decoded


def test_event_framing_and_header():
    segment = _build_segment()
    events = list(iter_events(segment))
    types = [e.event_type for e in events]
    assert types == [
        EventType.FORMAT_DESCRIPTION_EVENT,
        EventType.GTID_EVENT,
        EventType.TABLE_MAP_EVENT,
        EventType.WRITE_ROWS_EVENT,
        EventType.ROTATE_EVENT,
    ]
    # log_pos is the byte position *after* each event
    pos = 4
    for e in events:
        assert e.log_pos > pos
        pos = e.log_pos
    assert pos == len(segment)


def test_format_description_roundtrip():
    segment = _build_segment()
    ev = next(iter_events(segment))
    fde = parse_format_description(ev.data)
    assert fde["binlog_version"] == 4
    assert fde["server_version"].startswith("8.0.99")
    assert fde["post_header_len"][EventType.WRITE_ROWS_EVENT - 1] == 10


def test_gtid_and_rotate_roundtrip():
    segment = _build_segment()
    events = list(iter_events(segment))
    assert parse_gtid(events[1].data) == 1
    name, pos = parse_rotate(events[-1].data)
    assert (name, pos) == ("binlog.000002", 4)


def test_table_map_roundtrip():
    segment = _build_segment()
    events = list(iter_events(segment))
    tm = parse_table_map(events[2].data)
    assert (tm.database_name, tm.table_name, tm.table_id) == ("app", "typed_rows", 7)
    assert tm.column_types == [c.col_type for c in TYPED_SPEC.columns]
    assert tm.column_meta == [c.meta for c in TYPED_SPEC.columns]


def test_all_column_types_roundtrip():
    decoded = _decode_all(_build_segment())
    assert len(decoded) == 1
    got = decoded[0].after
    assert decoded[0].before is None
    for i, (want, have) in enumerate(zip(ROW, got)):
        if isinstance(want, float):
            assert abs(want - have) < 1e-6, i
        else:
            assert want == have, (i, want, have)


def test_null_row_roundtrip():
    decoded = _decode_all(_build_segment(with_nulls=True))
    assert len(decoded) == 2
    assert decoded[1].after == [None] * len(TYPED_SPEC.columns)


def test_update_and_delete_roundtrip():
    w = bw.SegmentWriter()
    w.format_description()
    w.table_map(TYPED_SPEC)
    row2 = list(ROW)
    row2[3] = 777
    w.update_rows(TYPED_SPEC, [(ROW, row2)])
    w.table_map(TYPED_SPEC)
    w.delete_rows(TYPED_SPEC, [row2])
    w.rotate("binlog.000099")
    decoded = _decode_all(w.getvalue())
    assert len(decoded) == 2
    assert decoded[0].before[3] == 2**31 - 1 and decoded[0].after[3] == 777
    assert decoded[1].after is None and decoded[1].before[3] == 777


def test_multi_row_event():
    rows = []
    for k in range(50):
        r = list(ROW)
        r[3] = k
        rows.append(r)
    decoded = _decode_all(_build_segment(rows=rows))
    assert [r.after[3] for r in decoded] == list(range(50))


def test_query_event_roundtrip():
    w = bw.SegmentWriter()
    w.format_description()
    w.query("app", "ALTER TABLE repos ADD COLUMN stars INT")
    w.rotate("x")
    events = list(iter_events(w.getvalue()))
    schema, sql = parse_query(events[1].data)
    assert schema == "app"
    assert sql == "ALTER TABLE repos ADD COLUMN stars INT"


def test_row_json_serializer_golden():
    # reference: src/row_json_serializer.zig:238-280
    assert serialize_row([None]) == '{"c0":null}'
    assert serialize_row([42, -100, 9999999]) == '{"c0":42,"c1":-100,"c2":9999999}'
    assert serialize_row([("str", b'hello "world"\n')]) == '{"c0":"hello \\"world\\"\\n"}'
    assert serialize_row([("json", '{"key":true}')]) == '{"c0":{"key":true}}'


def test_row_json_full_row_is_valid_json():
    decoded = _decode_all(_build_segment())
    text = serialize_row(decoded[0].after)
    obj = json.loads(text)
    assert obj["c0"] == -5
    assert obj["c14"] == "héllo wörld"
    assert obj["c18"] == "0x0abc"
    assert obj["c20"] == "-123.45"
    assert obj["c9"] == "2023-12-31 23:59:59"
    assert obj["c12"].endswith(".654321Z")


def test_truncated_segment_decodes_clean_prefix():
    """A segment cut mid-event (crash during tail/copy) must decode its
    complete prefix and stop cleanly — no exception, no partial row."""
    from myzql_binlog_connector_ray.kernel.event_codec import iter_events
    from myzql_binlog_connector_ray.kernel.binlog_writer import (
        SegmentWriter,
        TableSpec,
        c_long,
        c_varchar,
    )

    w = SegmentWriter()
    w.format_description()
    spec = TableSpec(schema="d", table="t", table_id=7, columns=[c_long(), c_varchar(40)])
    for i in range(5):
        w.gtid(i)
        w.table_map(spec)
        w.write_rows(spec, [[i, f"row{i}"]])
    blob = w.getvalue()
    full = list(iter_events(blob))
    for cut in (len(blob) - 1, len(blob) - 10, len(blob) // 2, 30):
        got = list(iter_events(blob[:cut]))
        assert len(got) < len(full)
        # every yielded event is byte-complete and matches the full parse
        for a, b in zip(got, full):
            assert a == b
