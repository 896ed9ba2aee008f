"""Pure-stdlib RSA-OAEP(SHA-1) for MySQL caching_sha2 full auth.

When caching_sha2_password has no cached entry and the channel is NOT
TLS, the server offers an RSA key exchange: the client requests the
server public key (0x02), receives it as PEM, XORs the NUL-terminated
password with the 20-byte handshake nonce (repeating), and sends the
RSA-OAEP ciphertext (OpenSSL ``RSA_PKCS1_OAEP_PADDING`` defaults:
SHA-1 digest + MGF1-SHA-1, empty label). Mirrors the reference client
(src/mysql/auth.zig:134-175, conn.zig:121-131) — round 2 rejected this
path for want of an RSA library; RFC 8017 EME-OAEP is ~80 lines of
hashlib/int arithmetic, so the dependency was never needed.

Only PUBLIC-key operations are required by the client; decrypt exists
for the in-process replay server (tests) and key-pair roundtrips.
"""

from __future__ import annotations

import base64
import hashlib
import os

_H_LEN = 20  # SHA-1


# -- DER / PEM ----------------------------------------------------------------

_RSA_OID = bytes.fromhex("06092a864886f70d010101")  # 1.2.840.113549.1.1.1


def _der_read(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One TLV: returns (tag, content, next_pos); long-form lengths ok."""
    tag = buf[pos]
    length = buf[pos + 1]
    pos += 2
    if length & 0x80:
        nbytes = length & 0x7F
        length = int.from_bytes(buf[pos : pos + nbytes], "big")
        pos += nbytes
    return tag, buf[pos : pos + length], pos + length


def _der_int(content: bytes) -> int:
    return int.from_bytes(content, "big")


def _der_encode_len(length: int) -> bytes:
    if length < 0x80:
        return bytes([length])
    raw = length.to_bytes((length.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(raw)]) + raw


def _der_tlv(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _der_encode_len(len(content)) + content


def _der_encode_int(x: int) -> bytes:
    raw = x.to_bytes((x.bit_length() + 7) // 8 or 1, "big")
    if raw[0] & 0x80:
        raw = b"\x00" + raw  # keep it non-negative
    return _der_tlv(0x02, raw)


def parse_public_key_pem(pem: bytes | str) -> tuple[int, int]:
    """PEM → (n, e). Accepts SubjectPublicKeyInfo ('BEGIN PUBLIC KEY',
    what MySQL sends) and PKCS#1 ('BEGIN RSA PUBLIC KEY')."""
    if isinstance(pem, bytes):
        pem = pem.decode("ascii", "ignore")
    b64 = "".join(
        line.strip() for line in pem.splitlines() if line and not line.startswith("-----")
    )
    der = base64.b64decode(b64)
    tag, outer, _ = _der_read(der, 0)
    if tag != 0x30:
        raise ValueError("not a DER SEQUENCE")
    t1, first, nxt = _der_read(outer, 0)
    if t1 == 0x30:  # SPKI: SEQ( SEQ(alg), BITSTRING(PKCS#1) )
        tb, bits, _ = _der_read(outer, nxt)
        if tb != 0x03:
            raise ValueError("expected BIT STRING in SubjectPublicKeyInfo")
        _, inner, _ = _der_read(bits[1:], 0)  # skip unused-bits octet
        ti, n_raw, p2 = _der_read(inner, 0)
        te, e_raw, _ = _der_read(inner, p2)
    else:  # PKCS#1: SEQ(INT n, INT e)
        ti, n_raw = t1, first
        te, e_raw, _ = _der_read(outer, nxt)
    if ti != 0x02 or te != 0x02:
        raise ValueError("expected INTEGER modulus/exponent")
    return _der_int(n_raw), _der_int(e_raw)


def encode_public_key_pem(n: int, e: int) -> bytes:
    """(n, e) → SubjectPublicKeyInfo PEM (the format MySQL servers send)."""
    pkcs1 = _der_tlv(0x30, _der_encode_int(n) + _der_encode_int(e))
    alg = _der_tlv(0x30, _RSA_OID + _der_tlv(0x05, b""))  # rsaEncryption, NULL
    spki = _der_tlv(0x30, alg + _der_tlv(0x03, b"\x00" + pkcs1))
    b64 = base64.b64encode(spki).decode()
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return ("-----BEGIN PUBLIC KEY-----\n" + "\n".join(lines) + "\n-----END PUBLIC KEY-----\n").encode()


# -- RFC 8017 EME-OAEP (SHA-1) ------------------------------------------------


def _mgf1(seed: bytes, length: int) -> bytes:
    out = b""
    for counter in range((length + _H_LEN - 1) // _H_LEN):
        out += hashlib.sha1(seed + counter.to_bytes(4, "big")).digest()
    return out[:length]


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def oaep_encrypt(message: bytes, n: int, e: int, rand=os.urandom) -> bytes:
    k = (n.bit_length() + 7) // 8
    if len(message) > k - 2 * _H_LEN - 2:
        raise ValueError("message too long for RSA-OAEP with this key")
    lhash = hashlib.sha1(b"").digest()
    ps = b"\x00" * (k - len(message) - 2 * _H_LEN - 2)
    db = lhash + ps + b"\x01" + message
    seed = rand(_H_LEN)
    masked_db = _xor(db, _mgf1(seed, k - _H_LEN - 1))
    masked_seed = _xor(seed, _mgf1(masked_db, _H_LEN))
    em = b"\x00" + masked_seed + masked_db
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def oaep_decrypt(ciphertext: bytes, n: int, d: int) -> bytes:
    k = (n.bit_length() + 7) // 8
    if len(ciphertext) != k:
        raise ValueError("ciphertext length != modulus length")
    em = pow(int.from_bytes(ciphertext, "big"), d, n).to_bytes(k, "big")
    masked_seed, masked_db = em[1 : 1 + _H_LEN], em[1 + _H_LEN :]
    seed = _xor(masked_seed, _mgf1(masked_db, _H_LEN))
    db = _xor(masked_db, _mgf1(seed, k - _H_LEN - 1))
    lhash = hashlib.sha1(b"").digest()
    if em[0] != 0 or db[:_H_LEN] != lhash:
        raise ValueError("OAEP decoding error")
    sep = db.index(b"\x01", _H_LEN)
    if any(db[_H_LEN:sep]):
        raise ValueError("OAEP decoding error")
    return db[sep + 1 :]


def xor_with_seed(data: bytes, seed: bytes) -> bytes:
    """MySQL's password obfuscation before the RSA encrypt: XOR with
    the handshake nonce, repeating (sha256_password/caching_sha2)."""
    return bytes(b ^ seed[i % len(seed)] for i, b in enumerate(data))
