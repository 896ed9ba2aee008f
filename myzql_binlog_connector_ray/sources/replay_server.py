"""In-process MySQL replication replay server (test double / bench rig).

Speaks just enough of the server side of the wire protocol to exercise
the client end-to-end over a real localhost socket: HandshakeV10,
native-password auth verification, OK/ERR, COM_QUERY, COM_BINLOG_DUMP,
and the 0x00-prefixed event stream — replaying events from on-disk
segment files (the same fixtures the file pipelines consume), with a
fake ROTATE at stream start and the segments' own real ROTATEs in
between, then an EOF packet.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import zlib

from ..kernel.constants import BINLOG_MAGIC, EventType, segment_sort_key
from ..kernel.event_codec import parse_event_header
from .mysql_wire import (
    CLIENT_LONG_PASSWORD,
    CLIENT_PLUGIN_AUTH,
    CLIENT_PROTOCOL_41,
    CLIENT_SECURE_CONNECTION,
    CLIENT_SSL,
    COM_BINLOG_DUMP,
    COM_PING,
    COM_QUERY,
    PacketIO,
    scramble_caching_sha2,
    scramble_native_password,
)

SEED = bytes(range(1, 21))  # fixed 20-byte scramble seed
OK = b"\x00\x00\x00\x02\x00\x00\x00"
EOF = b"\xfe\x00\x00\x02\x00"


def _err(code: int, msg: str) -> bytes:
    return b"\xff" + struct.pack("<H", code) + b"#HY000" + msg.encode()


def iter_raw_frames(segment_bytes: bytes):
    """Raw event frames (header+payload+CRC) from a segment file."""
    pos = 4 if segment_bytes[:4] == BINLOG_MAGIC else 0
    n = len(segment_bytes)
    while pos + 19 <= n:
        _t, _ts, _sid, size, _lp, _fl = parse_event_header(segment_bytes, pos)
        if size < 19 or pos + size > n:
            break
        yield segment_bytes[pos : pos + size]
        pos += size


def fake_rotate_frame(binlog_file: str, position: int = 4) -> bytes:
    """ROTATE with timestamp=0 — the stream-start marker MySQL sends."""
    payload = struct.pack("<Q", position) + binlog_file.encode()
    size = 19 + len(payload) + 4
    header = struct.pack("<IBIIIH", 0, EventType.ROTATE_EVENT, 1, size, 0, 0x20)
    body = header + payload
    return body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)


def _miller_rabin(n: int, rng, rounds: int = 40) -> bool:
    if n < 4:
        return n in (2, 3)
    if n % 2 == 0:
        return False
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_rsa_keypair(bits: int = 1024, seed: int = 1213):
    """Deterministic TEST keypair (seeded PRNG — never for real use)."""
    import random

    rng = random.Random(seed)
    e = 65537

    def gen_prime(b: int) -> int:
        while True:
            p = rng.getrandbits(b) | (1 << (b - 1)) | 1
            if p % e != 1 and _miller_rabin(p, rng):
                return p

    while True:
        p, q = gen_prime(bits // 2), gen_prime(bits // 2)
        phi = (p - 1) * (q - 1)
        try:
            d = pow(e, -1, phi)
        except ValueError:
            continue
        return p * q, e, d


_RSA_KEY = None  # lazily generated, shared across server instances


def _rsa_key():
    global _RSA_KEY
    if _RSA_KEY is None:
        _RSA_KEY = _gen_rsa_keypair()
    return _RSA_KEY


class ReplayServer:
    """Serves segment files from ``segment_dir`` to one client at a time."""

    def __init__(
        self,
        segment_dir: str,
        user: str = "repl",
        password: str = "secret",
        tls_cert: str | None = None,
        tls_key: str | None = None,
        auth_plugin: str = "mysql_native_password",
    ):
        self.segment_dir = segment_dir
        self.user = user
        self.password = password
        self.tls_cert = tls_cert
        self.tls_key = tls_key
        self.auth_plugin = auth_plugin
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(2)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.errors: list[str] = []

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.sock.close()
        self.thread.join(timeout=5)

    # -- protocol ---------------------------------------------------

    def _caps(self) -> int:
        caps = (
            CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
        )
        if self.tls_cert:
            caps |= CLIENT_SSL
        return caps

    def _handshake_v10(self) -> bytes:
        caps = self._caps()
        return (
            bytes([10])
            + b"8.0.0-replay\x00"
            + struct.pack("<I", 7)  # thread id
            + SEED[:8]
            + b"\x00"
            + struct.pack("<H", caps & 0xFFFF)
            + bytes([45])  # charset
            + struct.pack("<H", 2)  # status
            + struct.pack("<H", caps >> 16)
            + bytes([21])  # auth data len
            + b"\x00" * 10
            + SEED[8:]
            + b"\x00"
            + getattr(self, "auth_plugin", "mysql_native_password").encode()
            + b"\x00"
        )

    def _parse_auth(self, payload: bytes) -> tuple[str, bytes]:
        pos = 32  # caps(4) + max_packet(4) + charset(1) + 23 reserved
        end = payload.index(0, pos)
        username = payload[pos:end].decode()
        pos = end + 1
        alen = payload[pos]
        return username, payload[pos + 1 : pos + 1 + alen]

    def _check_auth(self, payload: bytes) -> bool:
        username, auth = self._parse_auth(payload)
        if getattr(self, "auth_plugin", "mysql_native_password") == "caching_sha2_password":
            want = scramble_caching_sha2(self.password, SEED)
        else:
            want = scramble_native_password(self.password, SEED)
        return username == self.user and auth == want

    def _serve(self) -> None:
        try:
            while True:
                try:
                    conn, _ = self.sock.accept()
                except OSError:
                    return  # listener closed
                try:
                    self._serve_one(conn)
                finally:
                    conn.close()
        except Exception as e:  # surfaced by the test via self.errors
            self.errors.append(repr(e))

    def _serve_one(self, conn: socket.socket) -> None:
        io = PacketIO(conn)
        io.write_packet(self._handshake_v10())
        resp = io.read_packet()
        if len(resp) == 32 and struct.unpack_from("<I", resp, 0)[0] & CLIENT_SSL:
            # SSLRequest: upgrade the transport, then expect the real
            # handshake response over TLS
            import ssl

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(self.tls_cert, self.tls_key)
            io.sock = ctx.wrap_socket(conn, server_side=True)
            resp = io.read_packet()
        plugin = getattr(self, "auth_plugin", "mysql_native_password")
        if plugin == "sha256_password":
            # reference flow (src/mysql/auth.zig:14,28-29): the client's
            # initial response is 0x01 = "send me your public key" on a
            # cleartext channel (or the cleartext password over TLS)
            username, auth = self._parse_auth(resp)
            if username != self.user:
                io.write_packet(_err(1045, "Access denied"))
                return
            if auth == b"\x01":
                from .rsa_oaep import (
                    encode_public_key_pem,
                    oaep_decrypt,
                    xor_with_seed,
                )

                n, e, d = _rsa_key()
                io.write_packet(b"\x01" + encode_public_key_pem(n, e))
                ct = io.read_packet()
                try:
                    plain = xor_with_seed(oaep_decrypt(ct, n, d), SEED)
                except ValueError:
                    io.write_packet(_err(1045, "Access denied (bad OAEP)"))
                    return
                if plain != self.password.encode() + b"\x00":
                    io.write_packet(_err(1045, "Access denied (sha256 full auth)"))
                    return
            elif auth.rstrip(b"\x00").decode() != self.password:  # TLS cleartext
                io.write_packet(_err(1045, "Access denied (sha256 cleartext)"))
                return
            io.write_packet(OK)
            self._command_loop(io)
            return
        if not self._check_auth(resp):
            io.write_packet(_err(1045, "Access denied"))
            return
        if plugin == "caching_sha2_password":
            # pretend no cached entry: request full authentication
            io.write_packet(b"\x01\x04")
            full = io.read_packet()
            if full == b"\x02":
                # cleartext channel: client requests the server RSA key,
                # then sends OAEP(password+NUL XOR nonce) — the MySQL
                # sha256/caching_sha2 public-key exchange
                from .rsa_oaep import (
                    encode_public_key_pem,
                    oaep_decrypt,
                    xor_with_seed,
                )

                n, e, d = _rsa_key()
                io.write_packet(b"\x01" + encode_public_key_pem(n, e))
                ct = io.read_packet()
                try:
                    plain = xor_with_seed(oaep_decrypt(ct, n, d), SEED)
                except ValueError:
                    io.write_packet(_err(1045, "Access denied (bad OAEP)"))
                    return
                if plain != self.password.encode() + b"\x00":
                    io.write_packet(_err(1045, "Access denied (full auth)"))
                    return
            elif full.rstrip(b"\x00").decode() != self.password:
                io.write_packet(_err(1045, "Access denied (full auth)"))
                return
        io.write_packet(OK)
        self._command_loop(io)

    def _command_loop(self, io: PacketIO) -> None:
        from .mysql_wire import COM_BINLOG_DUMP_GTID

        while True:
            try:
                cmd = io.read_packet()
            except ConnectionError:
                return
            if not cmd:
                return
            if cmd[0] == COM_QUERY:
                sql = cmd[1:].decode("utf-8", "replace").strip().upper()
                if sql in ("SHOW MASTER STATUS", "SHOW BINARY LOG STATUS"):
                    self._send_master_status(io)
                elif sql == "SELECT @@GTID_EXECUTED":
                    self._send_gtid_executed(io)
                else:
                    io.write_packet(OK)
            elif cmd[0] == COM_PING:
                io.write_packet(OK)
            elif cmd[0] == COM_BINLOG_DUMP:
                _pos, _flags, _sid = struct.unpack_from("<IHI", cmd, 1)
                start_file = cmd[11:].decode()
                self._stream_binlogs(io, start_file)
                return
            elif cmd[0] == COM_BINLOG_DUMP_GTID:
                # flags(2) + server_id(4) + name_len(4)+name + pos(8) +
                # data_len(4) + binary GTID set
                from ..kernel.gtid import GtidSet

                name_len = struct.unpack_from("<I", cmd, 7)[0]
                p = 11 + name_len + 8
                dlen = struct.unpack_from("<I", cmd, p)[0]
                gset = GtidSet.from_binary(bytes(cmd[p + 4 : p + 4 + dlen]))
                self._stream_binlogs_gtid(io, gset)
                return
            else:
                io.write_packet(_err(1047, f"unknown command {cmd[0]}"))

    @staticmethod
    def _lenc(data: bytes) -> bytes:
        assert len(data) < 251
        return bytes([len(data)]) + data

    def _coldef(self, name: str) -> bytes:
        """Minimal ColumnDefinition41 (type VAR_STRING)."""
        L = self._lenc
        return (
            L(b"def") + L(b"") + L(b"") + L(b"")  # catalog/schema/table/org_table
            + L(name.encode()) + L(name.encode())  # name/org_name
            + b"\x0c" + struct.pack("<HIBHB", 33, 255, 0xFD, 0, 0) + b"\x00\x00"
        )

    def _send_master_status(self, io: PacketIO) -> None:
        """Text result set: the first on-disk segment at position 4 (a
        replay server's 'head' is the start of its recorded stream)."""
        files = sorted(
            (f for f in os.listdir(self.segment_dir) if f.startswith("binlog.")),
            key=segment_sort_key,
        )
        io.write_packet(b"\x02")  # column count
        io.write_packet(self._coldef("File"))
        io.write_packet(self._coldef("Position"))
        io.write_packet(EOF)
        if files:
            io.write_packet(self._lenc(files[0].encode()) + self._lenc(b"4"))
        io.write_packet(EOF)

    def _segment_files(self) -> list[str]:
        return sorted(
            (f for f in os.listdir(self.segment_dir) if f.startswith("binlog.")),
            key=segment_sort_key,
        )

    def _file_gtids(self, name: str):
        """(sid_bytes, gno) of every GTID event in one segment file."""
        with open(os.path.join(self.segment_dir, name), "rb") as f:
            blob = f.read()
        out = []
        for frame in iter_raw_frames(blob):
            if frame[4] == EventType.GTID_EVENT:
                out.append((bytes(frame[20:36]), struct.unpack_from("<q", frame, 36)[0]))
        return out

    def _send_gtid_executed(self, io: PacketIO) -> None:
        """Text result for ``SELECT @@gtid_executed``: the union of all
        GTIDs in the recorded stream (what a server that executed this
        stream would report)."""
        from ..kernel.gtid import GtidSet

        gset = GtidSet()
        for name in self._segment_files():
            for sid, gno in self._file_gtids(name):
                gset.add(sid, gno)
        io.write_packet(b"\x01")
        io.write_packet(self._coldef("@@gtid_executed"))
        io.write_packet(EOF)
        text = gset.to_text().encode()
        # result values can exceed the 1-byte lenc form
        if len(text) < 251:
            io.write_packet(self._lenc(text))
        else:
            io.write_packet(b"\xfc" + struct.pack("<H", len(text)) + text)
        io.write_packet(EOF)

    def _stream_binlogs_gtid(self, io: PacketIO, gset) -> None:
        """GTID auto-positioned dump: start at the first file containing
        a transaction NOT in ``gset`` (files whose GTIDs are all
        contained are skipped whole, like MySQL's Previous_gtids
        check), then stream frame-by-frame skipping contained
        transactions; housekeeping frames (FORMAT_DESCRIPTION, ROTATE,
        PREVIOUS_GTIDS) always pass so segment naming and checksum
        setup survive."""
        files = self._segment_files()
        start_idx = len(files)
        for i, name in enumerate(files):
            if any(not gset.contains(sid, gno) for sid, gno in self._file_gtids(name)):
                start_idx = i
                break
        files = files[start_idx:]
        if not files:
            io.write_packet(EOF)
            return

        HOUSEKEEPING = (
            EventType.FORMAT_DESCRIPTION_EVENT,
            EventType.ROTATE_EVENT,
            EventType.PREVIOUS_GTIDS_EVENT,
        )

        def frames():
            yield b"\x00" + fake_rotate_frame(files[0])
            for name in files:
                with open(os.path.join(self.segment_dir, name), "rb") as f:
                    blob = f.read()
                skip_tx = False
                for frame in iter_raw_frames(blob):
                    et = frame[4]
                    if et == EventType.GTID_EVENT:
                        sid = bytes(frame[20:36])
                        gno = struct.unpack_from("<q", frame, 36)[0]
                        skip_tx = gset.contains(sid, gno)
                        if skip_tx:
                            continue
                    elif et in HOUSEKEEPING:
                        skip_tx = False
                    elif skip_tx:
                        continue
                    yield b"\x00" + frame

        io.write_packets_bulk(frames())
        io.write_packet(EOF)

    def _stream_binlogs(self, io: PacketIO, start_file: str) -> None:
        start_key = segment_sort_key(start_file)
        files = sorted(
            (
                f
                for f in os.listdir(self.segment_dir)
                if f.startswith("binlog.") and segment_sort_key(f) >= start_key
            ),
            key=segment_sort_key,
        )
        def frames():
            yield b"\x00" + fake_rotate_frame(start_file)
            for name in files:
                with open(os.path.join(self.segment_dir, name), "rb") as f:
                    blob = f.read()
                for frame in iter_raw_frames(blob):
                    yield b"\x00" + frame

        # one sendall per ~256 KB instead of per event — the replay rig
        # must not be the bottleneck of what it measures
        io.write_packets_bulk(frames())
        io.write_packet(EOF)


def main(argv=None) -> int:
    """Standalone entry: serve segment files from a directory until
    killed. Prints ``PORT <n>`` on stdout once listening — the bench
    runs the replay rig OUT of process so the serial tailer doesn't
    share a GIL with the server it measures."""
    import argparse
    import sys

    parser = argparse.ArgumentParser(prog="replay-server")
    parser.add_argument("segment_dir")
    parser.add_argument("--user", default="repl")
    parser.add_argument("--password", default="secret")
    parser.add_argument("--auth-plugin", default="mysql_native_password")
    args = parser.parse_args(argv)
    srv = ReplayServer(
        args.segment_dir, user=args.user, password=args.password, auth_plugin=args.auth_plugin
    )
    with srv:
        print(f"PORT {srv.port}", flush=True)
        try:
            srv.thread.join()
        except KeyboardInterrupt:
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
