"""Minimal stdlib DNS A-record resolver (reference: src/dns.zig:1-587).

Resolution order mirrors the reference's ``resolveHostToIpv4``:
dotted-quad literal → /etc/hosts → one UDP A query to the first
``nameserver`` in /etc/resolv.conf. Only IPv4/A records — exactly the
reference's surface (it performs no AAAA/CNAME chasing either; CNAMEs
are handled implicitly because the answer walk skips non-A records,
and compressed names are skipped per RFC 1035 §4.1.4).

The file paths and nameserver are injectable so tests can exercise the
wire format against an in-process UDP server without touching real
system state.
"""

from __future__ import annotations

import os
import socket
import struct
from typing import Optional

MAX_NAME_JUMPS = 32  # pointer-loop guard (reference skipName caps hops)


class DnsError(Exception):
    pass


def parse_ipv4(host: str) -> Optional[bytes]:
    """Dotted-quad literal → 4 bytes, else None (no inet_aton shortcuts
    like octal/single-int forms — the reference accepts only a.b.c.d)."""
    parts = host.split(".")
    if len(parts) != 4:
        return None
    out = bytearray()
    for p in parts:
        if not p.isdigit() or len(p) > 3:
            return None
        v = int(p)
        if v > 255:
            return None
        out.append(v)
    return bytes(out)


def lookup_hosts(hostname: str, hosts_path: str = "/etc/hosts") -> Optional[bytes]:
    """First IPv4 mapping for ``hostname`` in an /etc/hosts-format file
    (comments stripped, any alias column matches)."""
    try:
        with open(hosts_path, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                fields = line.split()
                if len(fields) < 2:
                    continue
                ip = parse_ipv4(fields[0])
                if ip is not None and hostname in fields[1:]:
                    return ip
    except OSError:
        return None
    return None


def find_nameserver(resolv_path: str = "/etc/resolv.conf") -> Optional[bytes]:
    """First ``nameserver`` line of resolv.conf as 4 bytes (IPv4 only)."""
    try:
        with open(resolv_path, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                fields = line.split()
                if len(fields) >= 2 and fields[0] == "nameserver":
                    ip = parse_ipv4(fields[1])
                    if ip is not None:
                        return ip
    except OSError:
        return None
    return None


def build_a_query(hostname: str, query_id: int) -> bytes:
    """One-question A/IN query, RD set (reference buildAQuery)."""
    if not hostname or len(hostname) > 253:
        raise DnsError(f"invalid hostname: {hostname!r}")
    pkt = struct.pack(">HHHHHH", query_id & 0xFFFF, 0x0100, 1, 0, 0, 0)
    for label in hostname.rstrip(".").split("."):
        raw = label.encode("ascii")
        if not 1 <= len(raw) <= 63:
            raise DnsError(f"invalid label in hostname: {label!r}")
        pkt += bytes([len(raw)]) + raw
    return pkt + b"\x00" + struct.pack(">HH", 1, 1)  # QTYPE=A, QCLASS=IN


def _skip_name(pkt: bytes, pos: int) -> int:
    """Advance past a (possibly compressed) domain name."""
    jumps = 0
    while True:
        if pos >= len(pkt):
            raise DnsError("truncated name")
        b = pkt[pos]
        if b == 0:
            return pos + 1
        if b & 0xC0 == 0xC0:  # compression pointer: 2 bytes, name ends here
            return pos + 2
        pos += 1 + b
        jumps += 1
        if jumps > MAX_NAME_JUMPS:
            raise DnsError("name label loop")


def parse_a_response(resp: bytes, query_id: int) -> bytes:
    """First A record's 4 address bytes (reference parseAResponse:
    id + QR checks, RCODE, skip questions, walk answers skipping
    non-A / wrong-width records)."""
    if len(resp) < 12:
        raise DnsError("short response")
    rid, flags, qdcount, ancount = struct.unpack_from(">HHHH", resp, 0)
    if rid != (query_id & 0xFFFF):
        raise DnsError("response id mismatch")
    if not flags & 0x8000:
        raise DnsError("not a response")
    if flags & 0x0200:
        # TC: answer section is truncated — parsing it as final could
        # return a wrong/partial record; callers should retry over TCP
        # (not implemented; reference is UDP-only)
        raise DnsError("truncated response (TC bit set)")
    rcode = flags & 0x000F
    if rcode != 0:
        raise DnsError(f"server returned rcode {rcode}")
    pos = 12
    for _ in range(qdcount):
        pos = _skip_name(resp, pos) + 4  # QTYPE + QCLASS
    for _ in range(ancount):
        pos = _skip_name(resp, pos)
        if pos + 10 > len(resp):
            raise DnsError("truncated answer")
        rtype, rclass, _ttl, rdlength = struct.unpack_from(">HHIH", resp, pos)
        pos += 10
        if rtype == 1 and rclass == 1 and rdlength == 4:
            return resp[pos : pos + 4]
        pos += rdlength
    raise DnsError("no A record in response")


def dns_lookup_a(
    hostname: str,
    *,
    nameserver: Optional[bytes] = None,
    port: int = 53,
    resolv_path: str = "/etc/resolv.conf",
    timeout: float = 3.0,
) -> bytes:
    """One UDP A query/response exchange (reference dnsLookupA)."""
    if nameserver is None:
        nameserver = find_nameserver(resolv_path)
        if nameserver is None:
            raise DnsError("no usable nameserver in resolv.conf")
    query_id = int.from_bytes(os.urandom(2), "big")
    query = build_a_query(hostname, query_id)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        sock.settimeout(timeout)
        # connect() the UDP socket so the kernel drops datagrams from any
        # other source — an off-path spoof then needs the 16-bit id AND
        # the (unknowable to it) local ephemeral port
        sock.connect((socket.inet_ntoa(nameserver), port))
        sock.send(query)
        resp = sock.recv(2048)
    except OSError as e:
        raise DnsError(f"udp exchange failed: {e}") from e
    finally:
        sock.close()
    return parse_a_response(resp, query_id)


def resolve_host_to_ipv4(
    host: str,
    *,
    hosts_path: str = "/etc/hosts",
    resolv_path: str = "/etc/resolv.conf",
    nameserver: Optional[bytes] = None,
    port: int = 53,
    timeout: float = 3.0,
) -> str:
    """Literal → hosts file → DNS, returned as dotted-quad text
    (reference resolveHostToIpv4's exact order)."""
    ip = parse_ipv4(host)
    if ip is None:
        ip = lookup_hosts(host, hosts_path)
    if ip is None:
        ip = dns_lookup_a(
            host, nameserver=nameserver, port=port, resolv_path=resolv_path, timeout=timeout
        )
    return socket.inet_ntoa(ip)
