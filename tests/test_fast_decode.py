"""Fast (compiled) decode path ≡ generic decode path, value for value."""

import pyarrow as pa

from myzql_binlog_connector_ray.kernel.constants import EventType
from myzql_binlog_connector_ray.kernel.event_codec import (
    iter_events,
    parse_format_description,
    parse_row_event,
    parse_table_map,
)
from myzql_binlog_connector_ray.kernel.fast_decode import (
    CompiledTableDecoder,
    parse_row_event_fast,
)
from tests.test_kernel_roundtrip import ROW, TYPED_SPEC, _build_segment


def test_fast_equals_generic_all_types():
    segment = _build_segment(with_nulls=True)
    fde = None
    tmap = None
    for ev in iter_events(segment):
        if ev.event_type == EventType.FORMAT_DESCRIPTION_EVENT:
            fde = parse_format_description(ev.data)
        elif ev.event_type == EventType.TABLE_MAP_EVENT:
            tmap = parse_table_map(ev.data)
        elif ev.event_type == EventType.WRITE_ROWS_EVENT:
            generic = parse_row_event(ev.event_type, ev.data, tmap, fde["post_header_len"])
            compiled = CompiledTableDecoder(tmap.column_types, tmap.column_meta, plain=False)
            fast = parse_row_event_fast(
                ev.event_type, ev.data, tmap, fde["post_header_len"], compiled
            )
            assert len(generic) == len(fast)
            for g, f in zip(generic, fast):
                assert g.before == f[0]
                assert g.after == f[1]


def test_fast_update_delete_paths():
    from myzql_binlog_connector_ray.kernel import binlog_writer as bw

    w = bw.SegmentWriter()
    w.format_description()
    w.table_map(TYPED_SPEC)
    row2 = list(ROW)
    row2[3] = 42
    w.update_rows(TYPED_SPEC, [(ROW, row2)])
    w.table_map(TYPED_SPEC)
    w.delete_rows(TYPED_SPEC, [row2])
    w.rotate("x")

    fde = tmap = None
    out = []
    for ev in iter_events(w.getvalue()):
        if ev.event_type == EventType.FORMAT_DESCRIPTION_EVENT:
            fde = parse_format_description(ev.data)
        elif ev.event_type == EventType.TABLE_MAP_EVENT:
            tmap = parse_table_map(ev.data)
        elif ev.event_type in (EventType.UPDATE_ROWS_EVENT, EventType.DELETE_ROWS_EVENT):
            compiled = CompiledTableDecoder(tmap.column_types, tmap.column_meta, plain=False)
            fast = parse_row_event_fast(ev.event_type, ev.data, tmap, fde["post_header_len"], compiled)
            generic = parse_row_event(ev.event_type, ev.data, tmap, fde["post_header_len"])
            for g, f in zip(generic, fast):
                assert g.before == f[0] and g.after == f[1]
            out.append(fast)
    assert len(out) == 2


def test_plain_mode_values():
    segment = _build_segment()
    fde = tmap = None
    for ev in iter_events(segment):
        if ev.event_type == EventType.FORMAT_DESCRIPTION_EVENT:
            fde = parse_format_description(ev.data)
        elif ev.event_type == EventType.TABLE_MAP_EVENT:
            tmap = parse_table_map(ev.data)
        elif ev.event_type == EventType.WRITE_ROWS_EVENT:
            compiled = CompiledTableDecoder(tmap.column_types, tmap.column_meta, plain=True)
            fast = parse_row_event_fast(ev.event_type, ev.data, tmap, fde["post_header_len"], compiled)
            after = fast[0][1]
            assert after[14] == "héllo wörld"  # plain str, not tagged bytes
            assert after[20] == "-123.45"  # decimal as plain string
            assert isinstance(after[19], bytes)  # blob stays bytes
