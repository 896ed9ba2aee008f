"""Golden-vector tests for the decimal and JSON codecs.

Vectors ported from the reference's unit tests
(reference: src/decimal_parser.zig:276-396, src/json_decoder.zig:705-769).
"""

from myzql_binlog_connector_ray.kernel.decimal_codec import (
    decimal_binary_size,
    decode_decimal,
    digits_to_bytes,
    encode_decimal,
)
from myzql_binlog_connector_ray.kernel.json_codec import decode_json, encode_json


def test_digits_to_bytes():
    assert [digits_to_bytes(n) for n in range(10)] == [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def test_decimal_positive_simple():
    assert decode_decimal(bytes([0x80, 0x7B, 0x2D]), 5, 2) == "123.45"


def test_decimal_real_world_21_4():
    binary = bytes([0x80, 0x00, 0x00, 0x00, 0x00, 0x00, 0x05, 0x3C, 0x0F, 0xA0])
    assert decode_decimal(binary, 21, 4) == "1340.4000"


def test_decimal_zero():
    assert decode_decimal(bytes([0x80, 0x00, 0x00, 0x00, 0x00]), 10, 2) == "0.00"


def test_decimal_negative():
    assert decode_decimal(bytes([0x7F, 0x84, 0xD2]), 5, 2) == "-123.45"


def test_decimal_no_fraction():
    assert decode_decimal(bytes([0x80, 0x00, 0x0F, 0x42, 0x40]), 10, 0) == "1000000"


def test_decimal_small_fraction():
    assert decode_decimal(bytes([0x80, 0x00, 0x00, 0x00, 0x01]), 10, 4) == "0.0001"


def test_decimal_empty():
    assert decode_decimal(b"", 10, 2) == "0"


def test_decimal_roundtrip():
    cases = [
        ("123.45", 5, 2),
        ("-123.45", 5, 2),
        ("0.00", 10, 2),
        ("1340.4000", 21, 4),
        ("1000000", 10, 0),
        ("0.0001", 10, 4),
        ("-99999999999999999999999999999999999.999999999999999999999999999999", 65, 30),
        ("123456789012345678901234567890.5", 35, 1),
    ]
    for s, p, sc in cases:
        enc = encode_decimal(s, p, sc)
        assert len(enc) == decimal_binary_size(p, sc)
        assert decode_decimal(enc, p, sc) == s, (s, p, sc)


def test_json_literals():
    assert decode_json(bytes([4, 0])) == "null"
    assert decode_json(bytes([4, 1])) == "true"
    assert decode_json(bytes([4, 2])) == "false"


def test_json_int16():
    assert decode_json(bytes([5, 42, 0])) == "42"


def test_json_string():
    assert decode_json(bytes([12, 5]) + b"hello") == '"hello"'


def test_json_mariadb_passthrough():
    assert decode_json(b"plain json string") == "plain json string"


def test_json_empty():
    assert decode_json(b"") == "null"


def test_json_object_roundtrip():
    import json

    value = {
        "id": 42,
        "name": "alice",
        "ok": True,
        "missing": None,
        "score": 3.5,
        "big": 5_000_000_000,
        "tags": ["a", "b", 7],
        "nested": {"x": 1, "y": "z"},
    }
    text = decode_json(encode_json(value))
    assert json.loads(text) == value


def test_json_array_roundtrip():
    import json

    value = [1, "two", None, False, {"k": "v"}, [3, 4]]
    assert json.loads(decode_json(encode_json(value))) == value


def test_json_object_format_spacing():
    # reference emits ", " between elements and ": " after keys
    assert decode_json(encode_json({"a": 1, "b": 2})) == '{"a": 1, "b": 2}'
    assert decode_json(encode_json([1, 2])) == "[1, 2]"
