"""Stdlib DNS resolver (sources/dns.py) vs an in-process UDP server —
the reference's resolution order (literal → hosts → DNS A query),
wire format, and failure modes (src/dns.zig)."""

import socket
import struct
import threading

import pytest

from myzql_binlog_connector_ray.sources.dns import (
    DnsError,
    build_a_query,
    dns_lookup_a,
    find_nameserver,
    lookup_hosts,
    parse_a_response,
    parse_ipv4,
    resolve_host_to_ipv4,
)


def test_parse_ipv4_literals():
    assert parse_ipv4("10.0.200.1") == bytes([10, 0, 200, 1])
    assert parse_ipv4("255.255.255.255") == b"\xff\xff\xff\xff"
    for bad in ("256.0.0.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1..2.3", "01x.2.3.4", ""):
        assert parse_ipv4(bad) is None


def test_hosts_file_lookup(tmp_path):
    hosts = tmp_path / "hosts"
    hosts.write_text(
        "# comment line\n"
        "127.0.0.1 localhost\n"
        "10.1.2.3  db-primary db-primary.internal  # trailing comment\n"
        "bogus-line\n"
        "999.1.1.1 broken\n"
    )
    assert lookup_hosts("localhost", str(hosts)) == bytes([127, 0, 0, 1])
    assert lookup_hosts("db-primary", str(hosts)) == bytes([10, 1, 2, 3])
    assert lookup_hosts("db-primary.internal", str(hosts)) == bytes([10, 1, 2, 3])
    assert lookup_hosts("missing", str(hosts)) is None
    assert lookup_hosts("broken", str(hosts)) is None  # invalid IP skipped
    assert lookup_hosts("x", str(tmp_path / "absent")) is None


def test_find_nameserver(tmp_path):
    rc = tmp_path / "resolv.conf"
    rc.write_text("search example.com\n# note\nnameserver 9.9.9.9\nnameserver 1.1.1.1\n")
    assert find_nameserver(str(rc)) == bytes([9, 9, 9, 9])
    assert find_nameserver(str(tmp_path / "absent")) is None


def _answer_for(query: bytes, ip: bytes, *, rcode: int = 0, extra_cname: bool = False) -> bytes:
    """Minimal DNS response echoing the question, with one compressed-name
    A answer (plus an optional CNAME before it to exercise record skipping)."""
    qid = query[:2]
    question = query[12:]
    n_ans = (2 if extra_cname else 1) if rcode == 0 else 0
    hdr = qid + struct.pack(">HHHHH", 0x8180 | rcode, 1, n_ans, 0, 0)
    resp = hdr + question
    if rcode == 0:
        if extra_cname:
            # CNAME record (type 5) pointing at a dummy name, then the A record
            resp += b"\xc0\x0c" + struct.pack(">HHIH", 5, 1, 60, 2) + b"\xc0\x0c"[:2]
        resp += b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 60, 4) + ip
    return resp


class _UdpDns:
    def __init__(self, ip: bytes, rcode: int = 0, extra_cname: bool = False):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.ip = ip
        self.rcode = rcode
        self.extra_cname = extra_cname
        self.queries: list[bytes] = []
        self.thread = threading.Thread(target=self._serve, daemon=True)

    def _serve(self):
        try:
            query, addr = self.sock.recvfrom(2048)
        except OSError:
            return
        self.queries.append(query)
        self.sock.sendto(_answer_for(query, self.ip, rcode=self.rcode, extra_cname=self.extra_cname), addr)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.sock.close()
        self.thread.join(timeout=2)


def test_dns_a_query_roundtrip():
    with _UdpDns(bytes([10, 20, 30, 40])) as srv:
        ip = dns_lookup_a("db.example.com", nameserver=bytes([127, 0, 0, 1]), port=srv.port)
    assert ip == bytes([10, 20, 30, 40])
    # wire format: QNAME labels + QTYPE=A QCLASS=IN, RD set
    q = srv.queries[0]
    assert q[2:4] == b"\x01\x00"
    assert q[12:] == b"\x02db\x07example\x03com\x00\x00\x01\x00\x01"


def test_dns_skips_non_a_records():
    with _UdpDns(bytes([1, 2, 3, 4]), extra_cname=True) as srv:
        ip = dns_lookup_a("x.test", nameserver=bytes([127, 0, 0, 1]), port=srv.port)
    assert ip == bytes([1, 2, 3, 4])


def test_dns_nxdomain_raises():
    with _UdpDns(b"\x00\x00\x00\x00", rcode=3) as srv:
        with pytest.raises(DnsError, match="rcode 3"):
            dns_lookup_a("nx.test", nameserver=bytes([127, 0, 0, 1]), port=srv.port)


def test_response_id_mismatch_rejected():
    q = build_a_query("a.b", 0x1234)
    resp = _answer_for(q, bytes([1, 1, 1, 1]))
    assert parse_a_response(resp, 0x1234) == bytes([1, 1, 1, 1])
    with pytest.raises(DnsError, match="id mismatch"):
        parse_a_response(resp, 0x4321)


def test_resolve_order_literal_hosts_dns(tmp_path):
    hosts = tmp_path / "hosts"
    hosts.write_text("10.0.0.7 fromhosts\n")
    # literal wins without touching files or network
    assert resolve_host_to_ipv4("192.168.1.5", hosts_path="/nonexistent") == "192.168.1.5"
    # hosts file next
    assert resolve_host_to_ipv4("fromhosts", hosts_path=str(hosts)) == "10.0.0.7"
    # DNS last
    with _UdpDns(bytes([8, 8, 4, 4])) as srv:
        got = resolve_host_to_ipv4(
            "only-in-dns.test",
            hosts_path=str(hosts),
            nameserver=bytes([127, 0, 0, 1]),
            port=srv.port,
        )
    assert got == "8.8.4.4"
