"""MySQL client/server wire protocol: framing, handshake, auth, binlog dump.

Implements the public MySQL client/server protocol
(https://dev.mysql.com/doc/dev/mysql-server/latest/PAGE_PROTOCOL.html)
far enough to act as a replication client, with the same capability
surface as the reference connector (reference: src/mysql/conn.zig:44-500,
src/mysql/auth.zig, src/binlog_reader.zig:100-146):

- packet framing (3-byte LE length + sequence id, 16 MB continuation)
- HandshakeV10 parse / HandshakeResponse41 build
- auth: mysql_native_password and caching_sha2_password (fast path +
  full auth: cleartext password over TLS, or the RSA-OAEP public-key
  exchange on an insecure channel — rsa_oaep.py, stdlib-only),
  AuthSwitchRequest handling
- optional TLS via SSLRequest + stdlib ssl wrap
- COM_QUERY (OK or skipped result set), COM_BINLOG_DUMP
- binlog event stream framing (0x00-prefixed packets; EOF / ERR)

Pure stdlib (socket/ssl/hashlib/struct) — no driver dependency.
"""

from __future__ import annotations

import hashlib
import socket
import ssl as ssl_mod
import struct
from dataclasses import dataclass
from typing import Iterator, Optional

CLIENT_LONG_PASSWORD = 0x1
CLIENT_LONG_FLAG = 0x4
CLIENT_CONNECT_WITH_DB = 0x8
CLIENT_PROTOCOL_41 = 0x200
CLIENT_SSL = 0x800
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000
CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA = 0x200000

COM_QUERY = 0x03
COM_PING = 0x0E
COM_BINLOG_DUMP = 0x12
COM_BINLOG_DUMP_GTID = 0x1E
BINLOG_DUMP_NON_BLOCK = 0x01
BINLOG_THROUGH_GTID = 0x04

MAX_PACKET = 0xFFFFFF


class MysqlError(Exception):
    """Server ERR packet or protocol violation."""

    def __init__(self, code: int, message: str):
        super().__init__(f"[{code}] {message}")
        self.code = code
        self.message = message


# ------------------------------------------------------------- framing


class PacketIO:
    """Length-prefixed MySQL packet reader/writer over a socket.

    Reads are buffered: the binlog stream delivers hundreds of
    thousands of small packets, and two recv() syscalls per event (4B
    header + payload) was the tailer's throughput ceiling — one big
    recv per ~256 KB amortizes the syscall + GIL round across ~1000
    events. Safe across protocol phase switches (auth, TLS upgrade):
    MySQL is strictly request/response outside the dump stream, so the
    buffer is empty whenever the transport changes hands."""

    RECV_CHUNK = 1 << 18

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.seq = 0
        self._buf = bytearray()
        self._pos = 0

    def _read_exact(self, n: int) -> bytes:
        buf = self._buf
        while len(buf) - self._pos < n:
            if self._pos:
                del buf[: self._pos]
                self._pos = 0
            chunk = self.sock.recv(self.RECV_CHUNK)
            if not chunk:
                raise ConnectionError("server closed connection mid-packet")
            buf.extend(chunk)
        pos = self._pos
        out = bytes(buf[pos : pos + n])
        self._pos = pos + n
        if self._pos >= (1 << 20):  # bound the dead prefix
            del buf[: self._pos]
            self._pos = 0
        return out

    def read_packet(self) -> bytes:
        """One logical packet (reassembles 16 MB continuations)."""
        payload = bytearray()
        while True:
            header = self._read_exact(4)
            length = header[0] | (header[1] << 8) | (header[2] << 16)
            self.seq = (header[3] + 1) & 0xFF
            payload.extend(self._read_exact(length))
            if length < MAX_PACKET:
                return bytes(payload)

    def iter_packets(self):
        """Generator over logical packet payloads with per-packet
        overhead folded into one tight loop (the dump stream is
        hundreds of thousands of small packets; read_packet's two
        function calls per event were measurable). Continuation
        (16 MB) packets are reassembled inline."""
        buf = self._buf
        pos = self._pos
        recv = self.sock.recv
        chunk_sz = self.RECV_CHUNK
        frag: list[bytes] = []
        while True:
            while len(buf) - pos < 4:
                if pos:
                    del buf[:pos]
                    pos = 0
                chunk = recv(chunk_sz)
                if not chunk:
                    raise ConnectionError("server closed connection mid-packet")
                buf.extend(chunk)
            length = buf[pos] | (buf[pos + 1] << 8) | (buf[pos + 2] << 16)
            self.seq = (buf[pos + 3] + 1) & 0xFF
            end = pos + 4 + length
            while len(buf) < end:
                if pos:
                    del buf[:pos]
                    end -= pos
                    pos = 0
                chunk = recv(chunk_sz)
                if not chunk:
                    raise ConnectionError("server closed connection mid-packet")
                buf.extend(chunk)
            payload = bytes(buf[pos + 4 : end])
            pos = end
            if pos >= (1 << 20):
                del buf[:pos]
                pos = 0
            if length == MAX_PACKET:  # continuation follows
                frag.append(payload)
                continue
            if frag:
                frag.append(payload)
                payload = b"".join(frag)
                frag = []
            self._pos = pos
            yield payload

    def pump_event_frames(self, write, special: frozenset):
        """Bulk-consume a binlog dump stream: ordinary event frames
        (19 B header + payload + CRC; i.e. the packet minus its 0x00 OK
        marker) accumulate into a pending buffer inside ONE loop and
        flush via ``write(buf, n_frames)`` per ~1 MB — the per-event
        generator round-trips and bytes-object churn of
        ``iter_packets`` → ``iter_event_frames`` are the serial
        tailer's throughput ceiling. Frames whose event-type byte is in
        ``special`` (ROTATE / HEARTBEAT) are yielded as ``(event_type,
        frame)`` AFTER flushing pending, so bulk writes always land in
        the pre-rotation segment. Returns on EOF; raises MysqlError on
        ERR (pending frames before the error are flushed — they are
        valid). 16 MB continuations and tiny packets take the
        reassembling slow path."""
        buf = self._buf
        pos = self._pos
        recv = self.sock.recv
        chunk_sz = self.RECV_CHUNK
        pending = bytearray()
        npend = 0
        FLUSH = 1 << 20
        while True:
            while len(buf) - pos < 4:
                if pos:
                    del buf[:pos]
                    pos = 0
                chunk = recv(chunk_sz)
                if not chunk:
                    raise ConnectionError("server closed connection mid-packet")
                buf.extend(chunk)
            length = buf[pos] | (buf[pos + 1] << 8) | (buf[pos + 2] << 16)
            self.seq = (buf[pos + 3] + 1) & 0xFF
            end = pos + 4 + length
            while len(buf) < end:
                if pos:
                    del buf[:pos]
                    end -= pos
                    pos = 0
                chunk = recv(chunk_sz)
                if not chunk:
                    raise ConnectionError("server closed connection mid-packet")
                buf.extend(chunk)
            marker = buf[pos + 4]
            if marker == 0x00 and 10 < length < MAX_PACKET:
                et = buf[pos + 9]  # event type: marker(1) + header byte 4
                if et not in special:
                    with memoryview(buf) as mv:
                        pending += mv[pos + 5 : end]
                    npend += 1
                    pos = end
                    if pos >= FLUSH:
                        del buf[:pos]
                        pos = 0
                    if len(pending) >= FLUSH:
                        write(pending, npend)
                        pending = bytearray()
                        npend = 0
                    continue
                frame = bytes(buf[pos + 5 : end])
                pos = end
                self._pos = pos
                if npend:
                    write(pending, npend)
                    pending = bytearray()
                    npend = 0
                yield et, frame
                continue
            # slow path: reassemble the full logical packet (16 MB
            # continuations, tiny frames, EOF, ERR)
            payload = bytes(buf[pos + 4 : end])
            self._pos = pos = end
            if length == MAX_PACKET:
                frags = [payload]
                while length == MAX_PACKET:
                    header = self._read_exact(4)
                    length = header[0] | (header[1] << 8) | (header[2] << 16)
                    self.seq = (header[3] + 1) & 0xFF
                    frags.append(self._read_exact(length))
                payload = b"".join(frags)
                pos = self._pos
            if npend:
                write(pending, npend)
                pending = bytearray()
                npend = 0
            if not payload:
                return
            marker = payload[0]
            if marker == 0x00:
                frame = payload[1:]
                et = frame[4] if len(frame) > 4 else -1
                if et in special:
                    yield et, frame
                else:
                    write(frame, 1)
                continue
            if marker == 0xFF:
                code, msg = parse_err(payload)
                raise MysqlError(code, msg)
            if is_eof(payload):
                return
            raise MysqlError(-1, f"unexpected stream packet 0x{marker:02x}")

    def write_packets_bulk(self, payloads, flush_bytes: int = 1 << 18) -> None:
        """Send many small packets with one sendall per ~flush_bytes —
        the server side of the dump stream's syscall amortization."""
        out = bytearray()
        for p in payloads:
            if len(p) >= MAX_PACKET:  # rare giant event: the slow path
                if out:
                    self.sock.sendall(out)
                    out = bytearray()
                self.write_packet(p)
                continue
            out += struct.pack("<I", len(p))[:3]
            out.append(self.seq)
            self.seq = (self.seq + 1) & 0xFF
            out += p
            if len(out) >= flush_bytes:
                self.sock.sendall(out)
                out = bytearray()
        if out:
            self.sock.sendall(out)

    def write_packet(self, payload: bytes, reset_seq: bool = False) -> None:
        if reset_seq:
            self.seq = 0
        pos = 0
        while True:
            chunk = payload[pos : pos + MAX_PACKET]
            header = struct.pack("<I", len(chunk))[:3] + bytes([self.seq])
            self.seq = (self.seq + 1) & 0xFF
            self.sock.sendall(header + chunk)
            pos += len(chunk)
            # a payload of exactly n*16MB needs a trailing empty packet
            if pos >= len(payload) and len(chunk) < MAX_PACKET:
                return


def _nul_str(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.index(0, pos)
    return data[pos:end], end + 1


def read_lenc_int(data: bytes, pos: int) -> tuple[Optional[int], int]:
    """Length-encoded integer; 0xFB decodes to None (NULL in text rows)."""
    b = data[pos]
    if b < 0xFB:
        return b, pos + 1
    if b == 0xFB:
        return None, pos + 1
    if b == 0xFC:
        return struct.unpack_from("<H", data, pos + 1)[0], pos + 3
    if b == 0xFD:
        v = data[pos + 1] | (data[pos + 2] << 8) | (data[pos + 3] << 16)
        return v, pos + 4
    return struct.unpack_from("<Q", data, pos + 1)[0], pos + 9


def read_lenc_str(data: bytes, pos: int) -> tuple[Optional[bytes], int]:
    n, pos = read_lenc_int(data, pos)
    if n is None:
        return None, pos
    return data[pos : pos + n], pos + n


# ------------------------------------------------------------ handshake


@dataclass
class Handshake:
    protocol_version: int
    server_version: str
    thread_id: int
    seed: bytes  # 20-byte auth plugin data
    capabilities: int
    charset: int
    status: int
    auth_plugin: str


def parse_handshake_v10(payload: bytes) -> Handshake:
    if payload and payload[0] == 0xFF:
        code, msg = parse_err(payload)
        raise MysqlError(code, msg)
    proto = payload[0]
    if proto != 10:
        raise MysqlError(-1, f"unsupported handshake protocol {proto}")
    server_version, pos = _nul_str(payload, 1)
    thread_id = struct.unpack_from("<I", payload, pos)[0]
    pos += 4
    seed1 = payload[pos : pos + 8]
    pos += 8 + 1  # filler
    cap_lo = struct.unpack_from("<H", payload, pos)[0]
    pos += 2
    charset = payload[pos]
    pos += 1
    status = struct.unpack_from("<H", payload, pos)[0]
    pos += 2
    cap_hi = struct.unpack_from("<H", payload, pos)[0]
    pos += 2
    caps = cap_lo | (cap_hi << 16)
    auth_len = payload[pos]
    pos += 1 + 10  # reserved
    seed2 = b""
    if caps & CLIENT_SECURE_CONNECTION:
        n2 = max(13, auth_len - 8)
        seed2 = payload[pos : pos + n2].rstrip(b"\x00")
        pos += n2
    plugin = ""
    if caps & CLIENT_PLUGIN_AUTH and pos < len(payload):
        raw, pos = _nul_str(payload + b"\x00", pos)
        plugin = raw.decode()
    return Handshake(
        protocol_version=proto,
        server_version=server_version.decode(),
        thread_id=thread_id,
        seed=(seed1 + seed2)[:20],
        capabilities=caps,
        charset=charset,
        status=status,
        auth_plugin=plugin or "mysql_native_password",
    )


# ----------------------------------------------------------------- auth


def scramble_native_password(password: str, seed: bytes) -> bytes:
    """mysql_native_password: SHA1(pwd) XOR SHA1(seed + SHA1(SHA1(pwd)))
    (reference: src/mysql/auth.zig scramblePassword)."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(seed + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def scramble_caching_sha2(password: str, seed: bytes) -> bytes:
    """caching_sha2_password fast path:
    XOR(SHA256(pwd), SHA256(SHA256(SHA256(pwd)) + seed))."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + seed).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def compute_auth_response(plugin: str, password: str, seed: bytes, use_tls: bool = False) -> bytes:
    if plugin == "mysql_native_password":
        return scramble_native_password(password, seed)
    if plugin == "caching_sha2_password":
        return scramble_caching_sha2(password, seed)
    if plugin == "sha256_password":
        # reference: src/mysql/auth.zig:14,28-29 — over TLS the protocol
        # is the cleartext password; on an insecure channel the client
        # sends 0x01 to request the server RSA key and answers the
        # AuthMoreData key packet with OAEP(password ⊕ seed)
        if not password:
            return b""
        return password.encode() + b"\x00" if use_tls else b"\x01"
    raise MysqlError(-1, f"unsupported auth plugin {plugin!r}")


def build_handshake_response(
    caps: int,
    username: str,
    auth_response: bytes,
    database: Optional[str],
    plugin: str,
    charset: int = 45,  # utf8mb4_general_ci
) -> bytes:
    out = bytearray()
    out += struct.pack("<IIB", caps, 1 << 24, charset)
    out += b"\x00" * 23
    out += username.encode() + b"\x00"
    if caps & CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA:
        out += bytes([len(auth_response)]) + auth_response  # lenc (<251)
    else:
        out += bytes([len(auth_response)]) + auth_response
    if caps & CLIENT_CONNECT_WITH_DB and database:
        out += database.encode() + b"\x00"
    if caps & CLIENT_PLUGIN_AUTH:
        out += plugin.encode() + b"\x00"
    return bytes(out)


def parse_err(payload: bytes) -> tuple[int, str]:
    code = struct.unpack_from("<H", payload, 1)[0]
    msg = payload[3:]
    if msg[:1] == b"#":  # SQL-state marker
        msg = msg[6:]
    return code, msg.decode("utf-8", "replace")


def is_ok(payload: bytes) -> bool:
    return bool(payload) and payload[0] == 0x00


def is_eof(payload: bytes) -> bool:
    return bool(payload) and payload[0] == 0xFE and len(payload) < 9


# --------------------------------------------------- text result sets


@dataclass
class ColumnDefinition:
    """ColumnDefinition41 (reference: protocol/column_definition.zig)."""

    schema: str
    table: str
    name: str
    org_name: str
    charset: int
    column_length: int
    column_type: int
    flags: int
    decimals: int


def parse_column_definition(payload: bytes) -> ColumnDefinition:
    _catalog, pos = read_lenc_str(payload, 0)  # always "def"
    schema, pos = read_lenc_str(payload, pos)
    table, pos = read_lenc_str(payload, pos)
    _org_table, pos = read_lenc_str(payload, pos)
    name, pos = read_lenc_str(payload, pos)
    org_name, pos = read_lenc_str(payload, pos)
    _fixed_len, pos = read_lenc_int(payload, pos)  # always 0x0c
    charset, column_length = struct.unpack_from("<HI", payload, pos)
    pos += 6
    column_type = payload[pos]
    flags, = struct.unpack_from("<H", payload, pos + 1)
    decimals = payload[pos + 3]
    return ColumnDefinition(
        schema=(schema or b"").decode(),
        table=(table or b"").decode(),
        name=(name or b"").decode(),
        org_name=(org_name or b"").decode(),
        charset=charset,
        column_length=column_length,
        column_type=column_type,
        flags=flags,
        decimals=decimals,
    )


# ----------------------------------------------------------- connection


class MysqlConnection:
    """Minimal replication-grade client connection.

    ``connect()`` performs handshake + auth (+ optional TLS). Then
    ``query()`` for session setup and ``binlog_dump()`` to switch the
    connection into an event stream consumed via ``iter_event_frames``.
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 3306,
        user: str = "root",
        password: str = "",
        database: Optional[str] = None,
        use_tls: bool = False,
        connect_timeout: float = 10.0,
    ):
        self.host = host
        self.port = port
        self.user = user
        self.password = password
        self.database = database
        self.use_tls = use_tls
        self.connect_timeout = connect_timeout
        self.io: Optional[PacketIO] = None
        self.handshake: Optional[Handshake] = None

    # -- lifecycle --------------------------------------------------

    def connect(self) -> "MysqlConnection":
        # resolve with the reference's own order (literal → hosts → DNS
        # A query, sources/dns.py mirroring src/dns.zig); fall back to
        # the OS resolver if that fails so exotic setups still connect
        try:
            from .dns import resolve_host_to_ipv4

            addr = resolve_host_to_ipv4(self.host)
        except Exception:
            addr = self.host
        sock = socket.create_connection((addr, self.port), timeout=self.connect_timeout)
        sock.settimeout(self.connect_timeout)
        self.io = PacketIO(sock)
        hs = parse_handshake_v10(self.io.read_packet())
        self.handshake = hs

        caps = (
            CLIENT_LONG_PASSWORD
            | CLIENT_LONG_FLAG
            | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION
            | CLIENT_PLUGIN_AUTH
        )
        if self.database:
            caps |= CLIENT_CONNECT_WITH_DB
        caps &= hs.capabilities | CLIENT_CONNECT_WITH_DB

        if self.use_tls:
            if not hs.capabilities & CLIENT_SSL:
                raise MysqlError(-1, "server does not support TLS")
            caps |= CLIENT_SSL
            ssl_req = struct.pack("<IIB", caps, 1 << 24, 45) + b"\x00" * 23
            self.io.write_packet(ssl_req)
            ctx = ssl_mod.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl_mod.CERT_NONE  # parity: reference skips CA verify by default
            self.io.sock = ctx.wrap_socket(sock, server_hostname=self.host)

        plugin = hs.auth_plugin
        auth = compute_auth_response(plugin, self.password, hs.seed, self.use_tls)
        self.io.write_packet(
            build_handshake_response(caps, self.user, auth, self.database, plugin)
        )
        self._finish_auth(plugin, hs.seed)
        return self

    def _finish_auth(self, plugin: str, seed: bytes) -> None:
        assert self.io is not None
        while True:
            payload = self.io.read_packet()
            if is_ok(payload):
                return
            if payload and payload[0] == 0xFF:
                code, msg = parse_err(payload)
                raise MysqlError(code, msg)
            if payload and payload[0] == 0xFE:  # AuthSwitchRequest
                name, pos = _nul_str(payload, 1)
                seed = payload[pos:].rstrip(b"\x00")[:20]
                plugin = name.decode()
                self.io.write_packet(
                    compute_auth_response(plugin, self.password, seed, self.use_tls)
                )
                continue
            if payload and payload[0] == 0x01 and plugin == "sha256_password":
                # AuthMoreData carrying the server RSA public key (the
                # answer to our 0x01 request): OAEP(password ⊕ seed).
                # Reference: src/mysql/auth.zig public-key request flow.
                from .rsa_oaep import oaep_encrypt, parse_public_key_pem, xor_with_seed

                n, e = parse_public_key_pem(payload[1:])
                plain = xor_with_seed(self.password.encode() + b"\x00", seed)
                self.io.write_packet(oaep_encrypt(plain, n, e))
                continue
            if payload and payload[0] == 0x01:  # caching_sha2 extra data
                if payload[1:2] == b"\x03":  # fast auth success → OK follows
                    continue
                if payload[1:2] == b"\x04":  # full authentication request
                    if self.use_tls:
                        # over TLS the cleartext password is the protocol
                        self.io.write_packet(self.password.encode() + b"\x00")
                        continue
                    # cleartext channel: RSA key exchange, like the
                    # reference (src/mysql/auth.zig:134-175) — request
                    # the server public key, then send OAEP(password ⊕
                    # nonce). Round 2 rejected this path; rsa_oaep.py
                    # implements it stdlib-only.
                    from .rsa_oaep import oaep_encrypt, parse_public_key_pem, xor_with_seed

                    self.io.write_packet(b"\x02")  # public key request
                    more = self.io.read_packet()
                    if not more or more[0] != 0x01:
                        raise MysqlError(
                            -1, f"expected server RSA key, got 0x{more[:1].hex()}"
                        )
                    n, e = parse_public_key_pem(more[1:])
                    plain = xor_with_seed(self.password.encode() + b"\x00", seed)
                    self.io.write_packet(oaep_encrypt(plain, n, e))
                    continue
                raise MysqlError(-1, f"unexpected caching_sha2 state 0x{payload[1:2].hex()}")
            raise MysqlError(-1, f"unexpected auth packet 0x{payload[:1].hex()}")

    def close(self) -> None:
        if self.io is not None:
            try:
                self.io.sock.close()
            finally:
                self.io = None

    # -- commands ---------------------------------------------------

    def ping(self) -> bool:
        """COM_PING liveness check (reference: src/mysql/conn.zig ping)."""
        assert self.io is not None, "not connected"
        self.io.write_packet(bytes([COM_PING]), reset_seq=True)
        return is_ok(self.io.read_packet())

    def query(self, sql: str) -> None:
        """Execute a statement; any result set is parsed and discarded
        (session-setup statements only need the OK/ERR outcome)."""
        self.query_rows(sql)

    def query_rows(self, sql: str) -> tuple[list[str], list[list[Optional[str]]]]:
        """COM_QUERY with text-protocol result-set parsing (reference:
        src/mysql/result.zig:1-28, protocol/column_definition.zig:1-47):
        column-count lenc int → N column definitions → EOF → text rows
        (lenc strings, 0xFB = NULL) → EOF. Returns (column names, rows
        as text values); an OK-only statement returns ([], [])."""
        assert self.io is not None, "not connected"
        self.io.write_packet(bytes([COM_QUERY]) + sql.encode(), reset_seq=True)
        payload = self.io.read_packet()
        if is_ok(payload):
            return [], []
        if payload and payload[0] == 0xFF:
            code, msg = parse_err(payload)
            raise MysqlError(code, msg)
        ncols, _ = read_lenc_int(payload, 0)
        names: list[str] = []
        for _ in range(ncols):
            names.append(parse_column_definition(self.io.read_packet()).name)
        p = self.io.read_packet()
        if not is_eof(p):  # CLIENT_DEPRECATE_EOF servers skip this EOF
            raise MysqlError(-1, f"expected EOF after column definitions, got 0x{p[:1].hex()}")
        rows: list[list[Optional[str]]] = []
        while True:
            p = self.io.read_packet()
            if is_eof(p):
                return names, rows
            if p and p[0] == 0xFF:
                code, msg = parse_err(p)
                raise MysqlError(code, msg)
            row: list[Optional[str]] = []
            pos = 0
            for _ in range(ncols):
                v, pos = read_lenc_str(p, pos)
                row.append(None if v is None else v.decode("utf-8", "replace"))
            rows.append(row)

    def master_status(self) -> Optional[tuple[str, int]]:
        """Current (binlog file, position) at the server — lets the
        tailer auto-discover its start point instead of requiring a
        hand-supplied from_binlog_file/position. Tries the pre-8.0.22
        statement first, then the renamed one; returns None when binary
        logging is off (empty result set)."""
        for stmt in ("SHOW MASTER STATUS", "SHOW BINARY LOG STATUS"):
            try:
                names, rows = self.query_rows(stmt)
            except MysqlError:
                continue
            if not names:
                continue
            if not rows:
                return None
            f, p = rows[0][0], rows[0][1]
            if f is None or p is None:
                return None  # binary logging effectively off / hidden
            try:
                return f, int(p)
            except ValueError:
                return None
        return None

    def binlog_dump(
        self, binlog_file: str, binlog_position: int, server_id: int = 1, non_block: bool = False
    ) -> None:
        """COM_BINLOG_DUMP (reference: src/binlog_reader.zig:114-146)."""
        assert self.io is not None, "not connected"
        flags = BINLOG_DUMP_NON_BLOCK if non_block else 0
        payload = (
            bytes([COM_BINLOG_DUMP])
            + struct.pack("<IHI", binlog_position, flags, server_id)
            + binlog_file.encode()
        )
        self.io.write_packet(payload, reset_seq=True)

    def gtid_executed(self):
        """``SELECT @@gtid_executed`` → GtidSet (empty when GTIDs are
        off). The text result-set path the round-4 build added is what
        makes this and GTID auto-positioning possible."""
        from ..kernel.gtid import GtidSet

        _, rows = self.query_rows("SELECT @@gtid_executed")
        if not rows or not rows[0] or rows[0][0] is None:
            return GtidSet()
        return GtidSet.from_text(rows[0][0])

    def binlog_dump_gtid(self, gtid_set, server_id: int = 1, non_block: bool = False) -> None:
        """COM_BINLOG_DUMP_GTID: request the replication stream for
        every transaction NOT in ``gtid_set`` (auto-positioning — no
        file/pos needed, survives failover to a server with different
        binlog file names). Wire layout (public format): flags(2) +
        server_id(4) + name_len(4)+name + pos(8) + data_len(4) +
        binary GTID set."""
        assert self.io is not None, "not connected"
        flags = BINLOG_THROUGH_GTID | (BINLOG_DUMP_NON_BLOCK if non_block else 0)
        data = gtid_set.to_binary()
        payload = (
            bytes([COM_BINLOG_DUMP_GTID])
            + struct.pack("<HI", flags, server_id)
            + struct.pack("<I", 0)  # empty binlog name: position by GTID only
            + struct.pack("<Q", 4)
            + struct.pack("<I", len(data))
            + data
        )
        self.io.write_packet(payload, reset_seq=True)

    def iter_event_frames(self) -> Iterator[bytes]:
        """Raw binlog event frames (19-byte header + payload + CRC) from
        the post-dump stream; stops at EOF, raises on ERR."""
        assert self.io is not None, "not connected"
        for payload in self.io.iter_packets():
            if not payload:
                return
            marker = payload[0]
            if marker == 0x00:
                yield payload[1:]
            elif marker == 0xFF:
                code, msg = parse_err(payload)
                raise MysqlError(code, msg)
            elif is_eof(payload):
                return
            else:
                raise MysqlError(-1, f"unexpected stream packet 0x{marker:02x}")
