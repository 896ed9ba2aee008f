"""Wire client: unit vectors + live end-to-end against the in-process
replay server (real localhost sockets, no external network)."""

import os

import pytest

from myzql_binlog_connector_ray.sources.binlog_tail import BinlogTailer, tail_binlog_to_segments
from myzql_binlog_connector_ray.sources.mysql_wire import (
    MysqlConnection,
    MysqlError,
    build_handshake_response,
    parse_handshake_v10,
    scramble_caching_sha2,
    scramble_native_password,
)

from replay_server import SEED, ReplayServer


def test_native_password_scramble_vector():
    # independently computed with hashlib per the public algorithm:
    # SHA1(pwd) XOR SHA1(seed + SHA1(SHA1(pwd)))
    import hashlib

    seed = bytes(range(20))
    pwd = "secret"
    h1 = hashlib.sha1(b"secret").digest()
    want = bytes(
        a ^ b for a, b in zip(h1, hashlib.sha1(seed + hashlib.sha1(h1).digest()).digest())
    )
    assert scramble_native_password(pwd, seed) == want
    assert scramble_native_password("", seed) == b""
    assert len(scramble_caching_sha2(pwd, seed)) == 32


def test_handshake_roundtrip_parse():
    srv = ReplayServer.__new__(ReplayServer)
    srv.user, srv.password = "u", "p"
    srv.tls_cert = srv.tls_key = None
    srv.auth_plugin = "mysql_native_password"
    payload = ReplayServer._handshake_v10(srv)
    hs = parse_handshake_v10(payload)
    assert hs.protocol_version == 10
    assert hs.server_version == "8.0.0-replay"
    assert hs.seed == SEED
    assert hs.auth_plugin == "mysql_native_password"
    resp = build_handshake_response(
        hs.capabilities, "u", scramble_native_password("p", hs.seed), None, hs.auth_plugin
    )
    assert ReplayServer._check_auth(srv, resp)


@pytest.fixture()
def replay(fixture_paths):
    seg_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    with ReplayServer(seg_dir) as srv:
        yield srv
    assert srv.errors == []


def test_connect_auth_and_query(replay):
    conn = MysqlConnection(port=replay.port, user="repl", password="secret").connect()
    conn.query("SET @master_binlog_checksum='CRC32'")
    assert conn.ping()
    conn.close()


def test_bad_password_rejected(replay):
    with pytest.raises(MysqlError) as ei:
        MysqlConnection(port=replay.port, user="repl", password="wrong").connect()
    assert ei.value.code == 1045


def test_tail_stream_reproduces_segments(replay, fixture_paths, tmp_path, ray_session):
    """Live tail → segment files → Ray decode must equal decoding the
    original fixture segments directly."""
    out_dir = str(tmp_path / "tailed")
    manifests = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret", start_file="binlog.000001"
    )
    originals = {os.path.basename(p) for p in fixture_paths["segment_paths"]}
    tailed = {m.segment for m in manifests}
    assert originals <= tailed  # trailing rotate may open one extra empty name
    # byte-identical segments: the tailer writes exactly the frames the
    # server replayed from disk
    for m in manifests:
        if m.segment in originals:
            src = os.path.join(os.path.dirname(fixture_paths["segment_paths"][0]), m.segment)
            with open(src, "rb") as a, open(m.path, "rb") as b:
                assert a.read() == b.read(), m.segment

    from myzql_binlog_connector_ray.pipelines.ingest import decode_envelope, read_segments

    got = decode_envelope(read_segments(sorted(m.path for m in manifests))).to_pandas()
    want = decode_envelope(read_segments(fixture_paths["segment_paths"])).to_pandas()
    cols = ["segment", "ordinal", "event_row_index", "table_name", "dml_type"]
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)
    assert got.equals(want)


def test_tail_stop_position(replay, fixture_paths, tmp_path):
    """stop_file/stop_position bound the tail (reference stop check,
    src/binlog_reader.zig:284-305)."""
    out_dir = str(tmp_path / "tailed_stop")
    manifests = tail_binlog_to_segments(
        out_dir,
        port=replay.port,
        user="repl",
        password="secret",
        start_file="binlog.000001",
        stop_file="binlog.000001",
        stop_position=1,  # stop after the first event at/after position 1
    )
    assert [m.segment for m in manifests] == ["binlog.000001"]
    assert manifests[0].events >= 1


def test_tail_stop_file_past_rotation(replay, fixture_paths, tmp_path):
    """Once the stream rotates PAST stop_file, the tailer stops
    unconditionally — log_pos resets per file, so a large stop_position
    must not make it overshoot into later files (reference semantics,
    src/binlog_reader.zig:284-297)."""
    out_dir = str(tmp_path / "tailed_past")
    manifests = tail_binlog_to_segments(
        out_dir,
        port=replay.port,
        user="repl",
        password="secret",
        start_file="binlog.000001",
        stop_file="binlog.000001",
        stop_position=1 << 40,  # beyond any position in stop_file
    )
    # stops at the first event of the file AFTER stop_file: at most one
    # segment beyond stop_file may be opened, never tailed to its end
    names = [m.segment for m in manifests]
    assert names[0] == "binlog.000001"
    assert all(n <= "binlog.000002" for n in names)


def test_tail_stop_position_without_file(replay, fixture_paths, tmp_path):
    """A bare stop_position (no stop_file) applies to the current file
    instead of being ignored."""
    out_dir = str(tmp_path / "tailed_barepos")
    manifests = tail_binlog_to_segments(
        out_dir,
        port=replay.port,
        user="repl",
        password="secret",
        start_file="binlog.000001",
        stop_position=1,
    )
    assert [m.segment for m in manifests] == ["binlog.000001"]
    assert manifests[0].events >= 1


def test_packet_framing_16mb_continuation():
    """Payloads ≥ 16 MB split into 0xFFFFFF chunks + terminator; exact
    16 MB needs a trailing empty packet (protocol edge case)."""
    import socket
    import threading

    from myzql_binlog_connector_ray.sources.mysql_wire import MAX_PACKET, PacketIO

    for size in (0, 5, MAX_PACKET - 1, MAX_PACKET, MAX_PACKET + 7):
        a, b = socket.socketpair()
        payload = bytes(i & 0xFF for i in range(size % 251)) * (size // max(1, size % 251) + 1)
        payload = payload[:size]
        sender, receiver = PacketIO(a), PacketIO(b)
        t = threading.Thread(target=sender.write_packet, args=(payload,))
        t.start()
        got = receiver.read_packet()
        t.join(timeout=10)
        assert got == payload, f"size {size}"
        a.close(); b.close()


def test_iter_packets_mixed_sizes_and_continuations():
    """The buffered bulk iterator (round-5 hot path) must reassemble
    16 MB continuations and interleave with small packets, byte-equal
    to read_packet, including via write_packets_bulk."""
    import socket
    import threading

    from myzql_binlog_connector_ray.sources.mysql_wire import MAX_PACKET, PacketIO

    payloads = [
        b"",
        b"\x00small",
        bytes(range(251)) * 100,
        (bytes(range(251)) * ((MAX_PACKET // 251) + 2))[: MAX_PACKET + 13],  # continuation
        b"tail",
    ]
    a, b = socket.socketpair()
    sender, receiver = PacketIO(a), PacketIO(b)

    def send():
        # small ones through the bulk writer, the big one through
        # write_packet (bulk falls back to it for >=16MB internally too)
        sender.write_packets_bulk(payloads[:3])
        sender.write_packet(payloads[3])
        sender.write_packets_bulk(payloads[4:])
        a.shutdown(socket.SHUT_WR)

    t = threading.Thread(target=send)
    t.start()
    got = []
    it = receiver.iter_packets()
    try:
        for _ in range(len(payloads)):
            got.append(next(it))
    finally:
        t.join(timeout=10)
    assert got == payloads
    a.close(); b.close()


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    import subprocess

    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key, "-out", cert,
         "-days", "1", "-nodes", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    return cert, key


def test_tls_upgrade_and_caching_sha2_full_auth(fixture_paths, tls_cert, tmp_path):
    """SSLRequest upgrade + caching_sha2 full authentication (plaintext
    password over the TLS channel) + a tailed stream over TLS."""
    cert, key = tls_cert
    seg_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    with ReplayServer(
        seg_dir, tls_cert=cert, tls_key=key, auth_plugin="caching_sha2_password"
    ) as srv:
        out = str(tmp_path / "tls_tailed")
        manifests = tail_binlog_to_segments(
            out, port=srv.port, user="repl", password="secret",
            use_tls=True, start_file="binlog.000001",
        )
        assert {m.segment for m in manifests} >= {
            os.path.basename(p) for p in fixture_paths["segment_paths"]
        }
    assert srv.errors == []


def test_caching_sha2_rsa_full_auth_without_tls(fixture_paths, tmp_path):
    """Full caching_sha2 authentication over a CLEARTEXT channel via
    the RSA public-key exchange (reference src/mysql/auth.zig:134-175):
    client requests the server key (0x02), receives PEM, sends
    OAEP(password+NUL XOR nonce); the replay server decrypts with its
    private key and verifies. Then tails a stream over the same
    connection path."""
    seg_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    with ReplayServer(seg_dir, auth_plugin="caching_sha2_password") as srv:
        conn = MysqlConnection(port=srv.port, user="repl", password="secret").connect()
        conn.query("SELECT 1")
        conn.close()
        with pytest.raises(MysqlError, match="Access denied"):
            MysqlConnection(port=srv.port, user="repl", password="wrong").connect()
        out = str(tmp_path / "rsa_tailed")
        manifests = tail_binlog_to_segments(
            out, port=srv.port, user="repl", password="secret",
            start_file="binlog.000001",
        )
        assert {m.segment for m in manifests} >= {
            os.path.basename(p) for p in fixture_paths["segment_paths"]
        }
    assert srv.errors == []


def test_rsa_oaep_roundtrip_and_pem():
    """OAEP encrypt/decrypt roundtrip + PEM/DER parse of both SPKI and
    PKCS#1 forms + XOR obfuscation involution."""
    from tests.replay_server import _rsa_key
    from myzql_binlog_connector_ray.sources.rsa_oaep import (
        encode_public_key_pem,
        oaep_decrypt,
        oaep_encrypt,
        parse_public_key_pem,
        xor_with_seed,
    )

    n, e, d = _rsa_key()
    pem = encode_public_key_pem(n, e)
    assert pem.startswith(b"-----BEGIN PUBLIC KEY-----")
    assert parse_public_key_pem(pem) == (n, e)
    for msg in (b"", b"secret\x00", bytes(range(60))):
        assert oaep_decrypt(oaep_encrypt(msg, n, e), n, d) == msg
    # tampered ciphertext must not decode
    ct = bytearray(oaep_encrypt(b"secret\x00", n, e))
    ct[-1] ^= 0xFF
    with pytest.raises(ValueError):
        oaep_decrypt(bytes(ct), n, d)
    seed = bytes(range(20))
    data = b"hunter2\x00"
    assert xor_with_seed(xor_with_seed(data, seed), seed) == data


def test_tail_resume_after_interrupt(replay, fixture_paths, tmp_path):
    """A restarted tailer with resume=True re-tails a PARTIAL last
    segment from its start, and continues from the rotate target when
    the last segment is complete."""
    from myzql_binlog_connector_ray.sources.binlog_tail import resume_point

    out_dir = str(tmp_path / "resumed")
    # phase 1: stop mid-segment-1 (partial segment on disk)
    m1 = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret",
        start_file="binlog.000001", stop_file="binlog.000001", stop_position=None,
    )
    assert [m.segment for m in m1] == ["binlog.000001"]
    src = os.path.join(os.path.dirname(fixture_paths["segment_paths"][0]), "binlog.000001")
    assert os.path.getsize(m1[0].path) < os.path.getsize(src)  # partial
    # partial last segment → re-dump the same file from its start
    assert resume_point(out_dir) == ("binlog.000001", 4)
    # phase 2: resume re-tails 000001 fully (atomic overwrite) + the rest
    m2 = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret", resume=True,
    )
    assert m2[0].segment == "binlog.000001"
    originals = {os.path.basename(p) for p in fixture_paths["segment_paths"]}
    assert originals <= set(os.listdir(out_dir))
    with open(src, "rb") as a, open(os.path.join(out_dir, "binlog.000001"), "rb") as b:
        assert a.read() == b.read()  # the partial file was healed
    # complete last segment (ends in ROTATE) → resume from its target
    nxt, pos = resume_point(out_dir)
    assert pos == 4 and nxt > sorted(os.listdir(out_dir))[-1]


def test_tail_to_ingest_streaming_handoff(replay, fixture_paths, tmp_path, ray_session):
    """The deployment shape end to end (sources/binlog_tail.py:1-15): a
    LIVE tailer closes segments while a concurrent ingest consumes
    them. The mid-stream ingest commits whatever has closed; the final
    ingest over the full closed set is incremental (per-partition
    watermarks skip the replayed prefix); the resulting lake equals a
    direct ingest of the fixture segments."""
    import threading
    import time

    import pandas as pd
    import pyarrow.parquet as pq

    from myzql_binlog_connector_ray.pipelines.ingest import init_lake, read_lake, run_ingest

    out_dir = str(tmp_path / "handoff_segments")
    t = threading.Thread(
        target=tail_binlog_to_segments,
        args=(out_dir,),
        kwargs=dict(port=replay.port, user="repl", password="secret", start_file="binlog.000001"),
    )
    t.start()

    n_parts = 8
    lake_dir = str(tmp_path / "handoff_lake")
    init_lake(pq.read_table(fixture_paths["base_lake"]), lake_dir, n_parts)

    originals = {os.path.basename(p) for p in fixture_paths["segment_paths"]}

    def closed_segments():
        if not os.path.isdir(out_dir):
            return []
        return sorted(
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.startswith("binlog.") and f in originals
        )

    # consume mid-stream: ingest as soon as the first segment closes
    deadline = time.time() + 30
    while time.time() < deadline and not closed_segments():
        time.sleep(0.01)
    first_batch = closed_segments()
    assert first_batch, "tailer closed no segments in time"
    run_ingest(first_batch, lake_dir, num_partitions=n_parts, concurrency=2)

    t.join(timeout=30)
    assert not t.is_alive()
    final_set = closed_segments()
    assert {os.path.basename(p) for p in final_set} == originals
    run_ingest(final_set, lake_dir, num_partitions=n_parts, concurrency=2)

    # ground truth: direct ingest of the fixture segments
    ref_lake = str(tmp_path / "ref_lake")
    init_lake(pq.read_table(fixture_paths["base_lake"]), ref_lake, n_parts)
    run_ingest(fixture_paths["segment_paths"], ref_lake, num_partitions=n_parts, concurrency=2)

    got = read_lake(lake_dir).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = read_lake(ref_lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_query_rows_master_status(replay, fixture_paths):
    """Text-protocol result-set parsing (column defs + lenc rows) via
    SHOW MASTER STATUS against the replay server."""
    conn = MysqlConnection(port=replay.port, user="repl", password="secret").connect()
    try:
        names, rows = conn.query_rows("SHOW MASTER STATUS")
        assert names == ["File", "Position"]
        assert rows == [["binlog.000001", "4"]]
        status = conn.master_status()
        assert status == ("binlog.000001", 4)
        # OK-only statements still return empty
        assert conn.query_rows("SET @x=1") == ([], [])
    finally:
        conn.close()


def test_tail_auto_positioning(replay, fixture_paths, tmp_path):
    """start_file=None → the tailer discovers (file, position) itself
    via SHOW MASTER STATUS and tails the full stream."""
    out_dir = str(tmp_path / "tailed_auto")
    manifests = tail_binlog_to_segments(
        out_dir, port=replay.port, user="repl", password="secret", start_file=None
    )
    originals = {os.path.basename(p) for p in fixture_paths["segment_paths"]}
    assert originals <= {m.segment for m in manifests}


def test_sha256_password_rsa_full_auth_without_tls(fixture_paths, tmp_path):
    """sha256_password plugin over a cleartext channel: 0x01 public-key
    request → AuthMoreData PEM → OAEP(password ⊕ seed)."""
    seg_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    with ReplayServer(seg_dir, auth_plugin="sha256_password") as srv:
        conn = MysqlConnection(port=srv.port, user="repl", password="secret").connect()
        assert conn.ping()
        conn.close()
        with pytest.raises(MysqlError) as ei:
            MysqlConnection(port=srv.port, user="repl", password="wrong").connect()
        assert ei.value.code == 1045
    assert srv.errors == []


def test_tail_skips_heartbeat_frames(fixture_paths, tmp_path):
    """Server heartbeats (idle-connection keepalives) must not be
    written into segment files — they are not part of on-disk binlogs."""
    import struct
    import zlib

    from myzql_binlog_connector_ray.kernel.constants import EventType
    from myzql_binlog_connector_ray.sources.replay_server import ReplayServer

    class HeartbeatServer(ReplayServer):
        def _stream_binlogs(self, io, start_file):
            from myzql_binlog_connector_ray.sources.replay_server import (
                EOF as _EOF,
                fake_rotate_frame,
                iter_raw_frames,
            )

            io.write_packet(b"\x00" + fake_rotate_frame(start_file))
            # interleave a heartbeat before the real frames
            payload = start_file.encode()
            size = 19 + len(payload) + 4
            hdr = struct.pack("<IBIIIH", 0, EventType.HEARTBEAT_EVENT, 1, size, 0, 0)
            body = hdr + payload
            io.write_packet(b"\x00" + body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF))
            with open(os.path.join(self.segment_dir, start_file), "rb") as f:
                blob = f.read()
            for frame in iter_raw_frames(blob):
                io.write_packet(b"\x00" + frame)
            io.write_packet(_EOF)

    seg_dir = os.path.dirname(fixture_paths["segment_paths"][0])
    with HeartbeatServer(seg_dir) as srv:
        out = str(tmp_path / "hb")
        manifests = tail_binlog_to_segments(
            out, port=srv.port, user="repl", password="secret", start_file="binlog.000001"
        )
    assert srv.errors == []
    first = [m for m in manifests if m.segment == "binlog.000001"]
    assert first
    src = os.path.join(seg_dir, "binlog.000001")
    with open(src, "rb") as a, open(first[0].path, "rb") as b:
        assert a.read() == b.read()  # byte-identical despite the heartbeat


def test_pump_event_frames_matches_iter_event_frames():
    """The bulk pump (tailer hot path) must produce byte-identical
    ordinary-frame output and the same special-frame yields as the
    per-frame iterator, across small frames, a >16MB continuation
    frame, heartbeats, rotates, and EOF."""
    import socket
    import struct
    import threading

    from myzql_binlog_connector_ray.kernel.constants import EventType
    from myzql_binlog_connector_ray.sources.mysql_wire import MAX_PACKET, PacketIO

    def frame(event_type: int, payload: bytes) -> bytes:
        size = 19 + len(payload)
        return struct.pack("<IBIIIH", 7, event_type, 1, size, 0, 0) + payload

    frames = [
        frame(EventType.WRITE_ROWS_EVENT, b"a" * 40),
        frame(EventType.HEARTBEAT_EVENT, b""),
        frame(EventType.WRITE_ROWS_EVENT, b"b" * 5),
        frame(EventType.ROTATE_EVENT, struct.pack("<Q", 4) + b"binlog.000002"),
        frame(EventType.WRITE_ROWS_EVENT, b"c" * (MAX_PACKET + 100)),  # continuation
        frame(EventType.UPDATE_ROWS_EVENT, b"d" * 64),
    ]
    eof = b"\xfe\x00\x00\x00\x00"

    def run_one(use_pump: bool):
        a, b = socket.socketpair()
        sender, receiver = PacketIO(a), PacketIO(b)

        def send():
            sender.write_packets_bulk([b"\x00" + f for f in frames])
            sender.write_packets_bulk([eof])
            a.shutdown(socket.SHUT_WR)

        t = threading.Thread(target=send)
        t.start()
        written = bytearray()
        specials = []
        special = frozenset(
            {int(EventType.HEARTBEAT_EVENT), int(EventType.ROTATE_EVENT)}
        )
        if use_pump:
            for et, fr in receiver.pump_event_frames(
                lambda d, n: written.extend(d), special
            ):
                specials.append((int(et), fr))
        else:
            for payload in receiver.iter_packets():
                if not payload:
                    break
                if payload[0] == 0xFE and len(payload) < 9:
                    break
                fr = payload[1:]
                if fr[4] in special:
                    specials.append((int(fr[4]), fr))
                else:
                    written.extend(fr)
        t.join(timeout=10)
        a.close()
        b.close()
        return bytes(written), specials

    got = run_one(True)
    want = run_one(False)
    assert got == want
    assert len(got[1]) == 2  # heartbeat + rotate escaped
