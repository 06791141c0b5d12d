"""Test-side fake MySQL/MariaDB replication SERVER — an INDEPENDENT
implementation of the server half of the public client/server protocol
(written from the protocol spec, not from the client under test):
v10 greeting, mysql_native_password verification, OK/ERR packets,
COM_QUERY / COM_REGISTER_SLAVE acks, and COM_BINLOG_DUMP streaming raw
events out of fixture binlog FILES (following ROTATE chains like a real
server's dump thread)."""

from __future__ import annotations

import hashlib
import os
import re
import socket
import struct
import threading

HEADER_LEN = 19
_CONNECT_STATE = re.compile(
    r"SET\s+@slave_connect_state\s*=\s*'([^']*)'", re.IGNORECASE
)
ROTATE_EVENT = 4
FDE_EVENT = 15


def _expected_token(password: str, scramble: bytes) -> bytes:
    if not password:
        return b""
    sha_pw = hashlib.sha1(password.encode()).digest()
    mix = hashlib.sha1(scramble + hashlib.sha1(sha_pw).digest()).digest()
    return bytes(a ^ b for a, b in zip(sha_pw, mix))


def _expected_sha2_token(password: str, scramble: bytes) -> bytes:
    """caching_sha2_password fast-auth token, computed independently from
    the published algorithm: XOR(SHA256(pw), SHA256(SHA256(SHA256(pw)) +
    nonce))."""
    if not password:
        return b""
    p1 = hashlib.sha256(password.encode()).digest()
    p2 = hashlib.sha256(hashlib.sha256(p1).digest() + scramble).digest()
    return bytes(a ^ b for a, b in zip(p1, p2))


_TOKEN_FNS = {
    "mysql_native_password": _expected_token,
    "caching_sha2_password": _expected_sha2_token,
}


def _send(conn: socket.socket, payload: bytes, seq: int) -> int:
    conn.sendall(len(payload).to_bytes(3, "little") + bytes([seq & 0xFF]) + payload)
    return (seq + 1) & 0xFF


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


def _recv_packet(conn: socket.socket) -> tuple[bytes, int]:
    hdr = _recv_exact(conn, 4)
    return _recv_exact(conn, int.from_bytes(hdr[:3], "little")), hdr[3]


_OK = b"\x00\x00\x00\x02\x00\x00\x00"  # OK, 0 affected, 0 insert-id, status, warnings


def _err(code: int, msg: str) -> bytes:
    return b"\xff" + struct.pack("<H", code) + b"#HY000" + msg.encode()


def _file_events(path: str):
    """Yield raw events of one binlog file (past the 4-byte magic)."""
    with open(path, "rb") as f:
        blob = f.read()
    pos = 4
    while pos + HEADER_LEN <= len(blob):
        esize = struct.unpack_from("<I", blob, pos + 9)[0]
        if esize < HEADER_LEN or pos + esize > len(blob):
            break
        yield pos, blob[pos : pos + esize]
        pos += esize


class FakeMySQLServer:
    """One-connection-at-a-time fake server streaming fixture binlogs."""

    def __init__(
        self,
        binlog_dir: str,
        user: str,
        password: str,
        auth_plugin: str = "mysql_native_password",
        switch_to: str | None = None,
    ) -> None:
        """``auth_plugin``: the server default advertised in the greeting
        (``caching_sha2_password`` = a MySQL 8 server). ``switch_to``:
        always answer the HandshakeResponse with an AuthSwitchRequest to
        this plugin and a FRESH scramble (the account-uses-a-different-
        plugin path every real server exercises)."""
        self.dir = binlog_dir
        self.user, self.password = user, password
        self.auth_plugin = auth_plugin
        self.switch_to = switch_to
        self.queries: list[str] = []
        self.registered: list[int] = []
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            try:
                self._handle(conn)
            except (ConnectionError, OSError):
                pass
            finally:
                conn.close()

    def _handle(self, conn: socket.socket) -> None:
        # Real MySQL/MariaDB servers never put NUL bytes in the scramble
        # (the greeting's auth2 part is NUL-terminated, so a trailing 0x00
        # in the scramble itself would be ambiguous to clients).
        scramble = bytes(1 + b % 255 for b in os.urandom(20))
        # v10 greeting: proto, version, thread id, auth1(8), filler,
        # caps-low, charset, status, caps-high, auth-len, reserved(10),
        # auth2(12 + NUL), plugin name
        greeting = (
            b"\x0a" + b"10.11.6-MariaDB-fake\x00"
            + struct.pack("<I", 42)
            + scramble[:8] + b"\x00"
            + struct.pack("<H", 0xFFFF) + b"\x21" + struct.pack("<H", 2)
            + struct.pack("<H", 0x000F)
            + bytes([21])  # auth data length (20 + NUL)
            + b"\x00" * 10
            + scramble[8:20] + b"\x00"
            + self.auth_plugin.encode() + b"\x00"
        )
        seq = _send(conn, greeting, 0)
        resp, seq_in = _recv_packet(conn)
        seq = (seq_in + 1) & 0xFF
        # HandshakeResponse41: caps(4) maxpkt(4) charset(1) zeros(23) user\0
        pos = 4 + 4 + 1 + 23
        end = resp.index(b"\x00", pos)
        user = resp[pos:end].decode()
        pos = end + 1
        alen = resp[pos]
        token = resp[pos + 1 : pos + 1 + alen]
        pos += 1 + alen
        client_plugin = "mysql_native_password"
        if pos < len(resp):
            nul = resp.find(b"\x00", pos)
            name = resp[pos : nul if nul != -1 else len(resp)]
            if name:
                client_plugin = name.decode()
        # the ACCOUNT's plugin: switch_to overrides the server default
        account_plugin = self.switch_to or self.auth_plugin
        cur_scramble = scramble
        if self.switch_to is not None or client_plugin != account_plugin:
            # AuthSwitchRequest with a FRESH scramble (real-server behavior)
            cur_scramble = bytes(1 + b % 255 for b in os.urandom(20))
            seq = _send(
                conn,
                b"\xfe" + account_plugin.encode() + b"\x00"
                + cur_scramble + b"\x00",
                seq,
            )
            token, seq_in = _recv_packet(conn)
            seq = (seq_in + 1) & 0xFF
        expected = _TOKEN_FNS[account_plugin](self.password, cur_scramble)
        if user != self.user or token != expected:
            _send(conn, _err(1045, f"Access denied for user '{user}'"), seq)
            return
        if account_plugin == "caching_sha2_password":
            # fast-auth success marker, then OK (the MySQL 8 cached path)
            seq = _send(conn, b"\x01\x03", seq)
        _send(conn, _OK, seq)
        connect_state: str | None = None
        wants_checksum = False
        while True:
            payload, _ = _recv_packet(conn)
            cmd = payload[0]
            if cmd == 0x03:  # COM_QUERY
                sql = payload[1:].decode()
                self.queries.append(sql)
                m = _CONNECT_STATE.match(sql)
                if m:
                    connect_state = m.group(1)
                if "master_binlog_checksum" in sql and "CRC32" in sql:
                    wants_checksum = True
                _send(conn, _OK, 1)
            elif cmd == 0x15:  # COM_REGISTER_SLAVE
                self.registered.append(struct.unpack_from("<I", payload, 1)[0])
                _send(conn, _OK, 1)
            elif cmd == 0x12:  # COM_BINLOG_DUMP
                start_pos, _flags, _sid = struct.unpack_from("<IHI", payload, 1)
                fname = payload[11:].decode()
                if not fname and connect_state is not None:
                    # MariaDB GTID positioning: empty file name + the
                    # @slave_connect_state session variable — locate the
                    # first event group AFTER that GTID
                    fname, start_pos = self._gtid_start(connect_state)
                self._stream_dump(conn, fname, start_pos, wants_checksum)
                return
            elif cmd == 0x1E:  # COM_BINLOG_DUMP_GTID (MySQL flavor)
                # flags(2) server_id(4) fname_len(4) fname pos(8)
                # data_len(4) sid-block
                pos = 1
                _flags, _sid = struct.unpack_from("<HI", payload, pos)
                pos += 6
                (flen,) = struct.unpack_from("<I", payload, pos)
                pos += 4 + flen
                pos += 8  # binlog pos
                (_dlen,) = struct.unpack_from("<I", payload, pos)
                pos += 4
                (n_sids,) = struct.unpack_from("<Q", payload, pos)
                pos += 8
                executed: dict[bytes, list[tuple[int, int]]] = {}
                for _ in range(n_sids):
                    sid = payload[pos : pos + 16]
                    pos += 16
                    (n_iv,) = struct.unpack_from("<Q", payload, pos)
                    pos += 8
                    ivs = []
                    for _ in range(n_iv):
                        lo, hi = struct.unpack_from("<qq", payload, pos)
                        pos += 16
                        ivs.append((lo, hi))  # [lo, hi) end-exclusive
                    executed[sid] = ivs
                fname, start_pos = self._gtid_start_mysql(executed)
                self._stream_dump(conn, fname, start_pos, wants_checksum)
                return
            else:
                _send(conn, _err(1047, f"unknown command {cmd}"), 1)

    def _gtid_start(self, gtid: str) -> tuple[str, int]:
        """(file, offset) of the first MariaDB GTID event STRICTLY AFTER
        the given ``domain-server-seq`` position, scanning the chain in
        name order like a real dump thread walks its index. Nothing newer
        -> the last file with an offset past EOF (FDE replays, then EOF)."""
        domain, _server, seq = (int(x) for x in gtid.split("-"))
        files = sorted(
            f for f in os.listdir(self.dir) if not f.startswith(".")
        )
        for fname in files:
            for off, ev in _file_events(os.path.join(self.dir, fname)):
                if ev[4] == 162:  # MariaDB GTID_EVENT
                    s = struct.unpack_from("<Q", ev, HEADER_LEN)[0]
                    d = struct.unpack_from("<I", ev, HEADER_LEN + 8)[0]
                    if d == domain and s > seq:
                        return fname, off
        return files[-1], 1 << 60

    def _gtid_start_mysql(
        self, executed: dict[bytes, list[tuple[int, int]]]
    ) -> tuple[str, int]:
        """(file, offset) of the first MySQL GTID_LOG_EVENT (33) whose
        (sid, gno) falls OUTSIDE the client's executed set — the
        COM_BINLOG_DUMP_GTID contract."""
        files = sorted(
            f for f in os.listdir(self.dir) if not f.startswith(".")
        )
        for fname in files:
            for off, ev in _file_events(os.path.join(self.dir, fname)):
                if ev[4] == 33:  # GTID_LOG_EVENT: flags(1) sid(16) gno(8)
                    sid = ev[HEADER_LEN + 1 : HEADER_LEN + 17]
                    (gno,) = struct.unpack_from("<q", ev, HEADER_LEN + 17)
                    ivs = executed.get(sid, [])
                    if not any(lo <= gno < hi for lo, hi in ivs):
                        return fname, off
        return files[-1], 1 << 60

    def _stream_dump(
        self, conn: socket.socket, fname: str, start: int,
        wants_checksum: bool = False,
    ) -> None:
        import zlib

        seq = 1
        # dump-start pseudo-rotate (timestamp 0) restating the file name —
        # what a real dump thread sends first; carries a CRC-32 trailer
        # iff the client negotiated @master_binlog_checksum (real-server
        # behavior — the trailer bytes can be printable, so clients must
        # strip by negotiation, not by guessing)
        trailer = 4 if wants_checksum else 0
        fake_rot = (
            struct.pack("<IBIIIH", 0, ROTATE_EVENT, 1,
                        HEADER_LEN + 8 + len(fname) + trailer, 0, 0)
            + struct.pack("<Q", start) + fname.encode()
        )
        if wants_checksum:
            fake_rot += struct.pack("<I", zlib.crc32(fake_rot) & 0xFFFFFFFF)
        seq = _send(conn, b"\x00" + fake_rot, seq)
        current = fname
        first = True
        while current:
            path = os.path.join(self.dir, current)
            nxt = None
            checksum = 0
            for off, ev in _file_events(path):
                etype = ev[4]
                if etype == FDE_EVENT:
                    checksum = 4 if ev[-5] == 1 else 0
                if etype == ROTATE_EVENT:
                    nxt = ev[HEADER_LEN + 8 : len(ev) - checksum].decode()
                # first file: skip events before the requested offset,
                # except the FDE which every dump replays (clients need the
                # checksum algorithm no matter where they resume)
                if first and off < start and etype != FDE_EVENT:
                    continue
                seq = _send(conn, b"\x00" + ev, seq)
            current, first = nxt, False
        _send(conn, b"\xfe\x00\x00\x02\x00", seq)  # EOF
