"""MySQL packed DECIMAL codec.

MySQL stores DECIMAL(p, s) in a packed big-endian format: digits are
grouped in 9s (4 bytes per full group, 0/1/2/3/4-byte partial groups),
the sign lives in the MSB of the first byte (set = positive) and a
negative value has *all* bytes inverted.

Decoding behavior matches the reference connector
(reference: src/decimal_parser.zig:240-270; format doc:
https://dev.mysql.com/doc/refman/8.0/en/precision-math-decimal-characteristics.html).
The encoder exists for the synthetic binlog writer (test fixtures).
"""

from __future__ import annotations

# bytes needed to store n (< 9) decimal digits
_DIGITS_TO_BYTES = (0, 1, 1, 2, 2, 3, 3, 4, 4, 4)


def digits_to_bytes(n: int) -> int:
    return _DIGITS_TO_BYTES[n] if 0 <= n <= 9 else 0


def decimal_binary_size(precision: int, scale: int) -> int:
    """Total packed bytes for DECIMAL(precision, scale)."""
    integral = precision - scale
    return (
        digits_to_bytes(integral % 9)
        + (integral // 9) * 4
        + (scale // 9) * 4
        + digits_to_bytes(scale % 9)
    )


def decode_decimal(data: bytes, precision: int, scale: int) -> str:
    """Packed decimal bytes → exact decimal string (e.g. ``"-123.45"``).

    Mirrors the reference's string-assembly rules: no leading zeros on
    the integral part (bare ``0`` when empty), fractional part padded to
    exactly ``scale`` digits.
    """
    if len(data) == 0:
        return "0"

    positive = (data[0] & 0x80) != 0
    buf = bytearray(data)
    if not positive:
        for i in range(len(buf)):
            buf[i] = ~buf[i] & 0xFF
    buf[0] &= 0x7F

    integral = precision - scale
    int_groups, int_lead = divmod(integral, 9)
    frac_groups, frac_tail = divmod(scale, 9)

    pos = 0
    parts: list[int] = []  # integral digit groups in order

    lead_val = 0
    if int_lead:
        n = digits_to_bytes(int_lead)
        lead_val = int.from_bytes(buf[pos : pos + n], "big")
        pos += n

    for _ in range(int_groups):
        parts.append(int.from_bytes(buf[pos : pos + 4], "big"))
        pos += 4

    frac_parts: list[int] = []
    for _ in range(frac_groups):
        frac_parts.append(int.from_bytes(buf[pos : pos + 4], "big"))
        pos += 4

    tail_val = 0
    if frac_tail:
        n = digits_to_bytes(frac_tail)
        tail_val = int.from_bytes(buf[pos : pos + n], "big")
        pos += n

    out: list[str] = []
    if not positive:
        out.append("-")

    has_integral = False
    if int_lead and lead_val > 0:
        out.append(str(lead_val))
        has_integral = True
    for g in parts:
        if has_integral:
            out.append(f"{g:09d}")
        elif g > 0:
            out.append(str(g))
            has_integral = True
    if not has_integral:
        out.append("0")

    if scale > 0:
        out.append(".")
        for g in frac_parts:
            out.append(f"{g:09d}")
        if frac_tail:
            out.append(f"{tail_val:0{frac_tail}d}")

    return "".join(out)


def encode_decimal(value: str, precision: int, scale: int) -> bytes:
    """Decimal string → MySQL packed bytes (fixture writer).

    Round-trips with :func:`decode_decimal` for any value that fits
    DECIMAL(precision, scale).
    """
    s = value.strip()
    negative = s.startswith("-")
    s = s.lstrip("+-")
    if "." in s:
        int_part, frac_part = s.split(".", 1)
    else:
        int_part, frac_part = s, ""
    int_part = int_part.lstrip("0") or "0"
    frac_part = (frac_part + "0" * scale)[:scale]

    integral = precision - scale
    if len(int_part.lstrip("0") or "") > integral:
        raise ValueError(f"value {value} does not fit DECIMAL({precision},{scale})")

    int_digits = int_part.rjust(integral, "0")
    frac_digits = frac_part.ljust(scale, "0")

    int_groups, int_lead = divmod(integral, 9)
    frac_groups, frac_tail = divmod(scale, 9)

    buf = bytearray()
    idx = 0
    if int_lead:
        n = digits_to_bytes(int_lead)
        buf += int(int_digits[idx : idx + int_lead] or "0").to_bytes(n, "big")
        idx += int_lead
    for _ in range(int_groups):
        buf += int(int_digits[idx : idx + 9] or "0").to_bytes(4, "big")
        idx += 9

    idx = 0
    for _ in range(frac_groups):
        buf += int(frac_digits[idx : idx + 9] or "0").to_bytes(4, "big")
        idx += 9
    if frac_tail:
        n = digits_to_bytes(frac_tail)
        buf += int(frac_digits[idx : idx + frac_tail] or "0").to_bytes(n, "big")

    # sign: MSB of first byte set for positive; negative inverts everything
    buf[0] |= 0x80
    if negative:
        for i in range(len(buf)):
            buf[i] = ~buf[i] & 0xFF
    return bytes(buf)
