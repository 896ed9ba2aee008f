"""Property-based tests (hypothesis): codec round-trips and LWW laws.

SURVEY.md §5.3: random DML sequences per key ⇒ LWW result equals the
last event by ordinal; replay-twice ⇒ identical state (idempotence).
"""

import json

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from myzql_binlog_connector_ray.kernel import binlog_writer as bw
from myzql_binlog_connector_ray.kernel.decimal_codec import (
    decimal_binary_size,
    decode_decimal,
    encode_decimal,
)
from myzql_binlog_connector_ray.kernel.json_codec import decode_json, encode_json
from myzql_binlog_connector_ray.kernel.row_json import escape_json_string
from myzql_binlog_connector_ray.stages.apply import _lww_fold


@st.composite
def decimal_values(draw):
    precision = draw(st.integers(1, 65))
    scale = draw(st.integers(0, min(30, precision)))
    int_digits = precision - scale
    int_part = draw(st.integers(0, 10**int_digits - 1)) if int_digits else 0
    frac_part = draw(st.integers(0, 10**scale - 1)) if scale else 0
    neg = draw(st.booleans()) and (int_part or frac_part)
    s = f"{int_part}"
    if scale:
        s += f".{frac_part:0{scale}d}"
    if neg:
        s = "-" + s
    return s, precision, scale


@given(decimal_values())
@settings(max_examples=200, deadline=None)
def test_decimal_roundtrip_property(v):
    s, p, sc = v
    enc = encode_decimal(s, p, sc)
    assert len(enc) == decimal_binary_size(p, sc)
    assert decode_decimal(enc, p, sc) == s


json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**62), 2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(min_size=1, max_size=10), inner, max_size=5),
    ),
    max_leaves=12,
)


@given(json_values)
@settings(max_examples=150, deadline=None)
def test_json_binary_roundtrip_property(value):
    try:
        blob = encode_json(value)
    except ValueError:
        return  # larger than the small-format encoder supports
    decoded = json.loads(decode_json(blob))
    assert decoded == value


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_escape_json_string_always_valid_json(raw):
    out = escape_json_string(raw)
    parsed = json.loads(out)
    assert isinstance(parsed, str)
    # valid UTF-8 input must round-trip exactly
    try:
        s = raw.decode("utf-8", "strict")
        assert parsed == s
    except UnicodeDecodeError:
        pass


@given(st.text(max_size=200), st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_varchar_roundtrip_property(a, b):
    spec = bw.TableSpec("s", "t", 1, [bw.c_varchar(60000), bw.c_varchar(100)], ["a", "b"])
    from myzql_binlog_connector_ray.kernel.constants import EventType
    from myzql_binlog_connector_ray.kernel.event_codec import (
        iter_events,
        parse_format_description,
        parse_row_event,
        parse_table_map,
    )

    w = bw.SegmentWriter()
    w.format_description()
    w.table_map(spec)
    w.write_rows(spec, [[a, b]])
    w.rotate("x")
    fde = tmap = None
    for ev in iter_events(w.getvalue()):
        if ev.event_type == EventType.FORMAT_DESCRIPTION_EVENT:
            fde = parse_format_description(ev.data)
        elif ev.event_type == EventType.TABLE_MAP_EVENT:
            tmap = parse_table_map(ev.data)
        elif ev.event_type == EventType.WRITE_ROWS_EVENT:
            rows = parse_row_event(ev.event_type, ev.data, tmap, fde["post_header_len"])
            got_a = rows[0].after[0][1].decode("utf-8")
            got_b = rows[0].after[1][1].decode("utf-8")
            assert got_a == a and got_b == b


@st.composite
def dml_sequences(draw):
    n_keys = draw(st.integers(1, 6))
    n_events = draw(st.integers(1, 30))
    events = []
    for i in range(n_events):
        key = draw(st.integers(0, n_keys - 1))
        dml = draw(st.sampled_from(["INSERT", "UPDATE", "DELETE"]))
        events.append(
            {
                "repo": f"r{key}",
                "path": "p",
                "ordinal": i,
                "event_row_index": 1,
                "dml": dml,
                "commit": f"c{i}",
                "lang": "py",
                "content": f"content-{i}",
            }
        )
    return events


@given(dml_sequences())
@settings(max_examples=100, deadline=None)
def test_lww_equals_last_event_by_ordinal(events):
    df = pd.DataFrame(events)
    result = _lww_fold(None, df)
    # oracle: replay sequentially
    state = {}
    for e in events:
        k = (e["repo"], e["path"])
        if e["dml"] == "DELETE":
            state.pop(k, None)
            state[k] = None  # tombstone semantics: key deleted
        else:
            state[k] = e["content"]
    # keys whose LAST event was a delete are absent from result
    expect = {k: v for k, v in state.items() if v is not None}
    got = {(r.repo, r.path): r.content for r in result.itertuples()}
    assert got == expect


@given(dml_sequences())
@settings(max_examples=50, deadline=None)
def test_lww_replay_idempotent(events):
    df = pd.DataFrame(events)
    once = _lww_fold(None, df)
    base = once.drop(columns=["ordinal", "event_row_index", "dml"])
    twice = _lww_fold(base, df)
    a = once.sort_values(["repo", "path"])[["repo", "path", "content"]].reset_index(drop=True)
    b = twice.sort_values(["repo", "path"])[["repo", "path", "content"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
