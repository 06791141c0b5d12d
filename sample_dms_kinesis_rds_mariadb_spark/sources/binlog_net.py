"""Binlog over TCP — a spec-derived MySQL/MariaDB client-protocol
replication client (the reference's actual CDC transport: DMS connects to
the MariaDB endpoint and streams ROW binlog events over the wire,
dms_sample/stack.py:354-376).

Implements the client side of the public MySQL client/server protocol:
packet framing (3-byte LE length + sequence id), the v10 initial
handshake, HandshakeResponse41 with ``mysql_native_password``
authentication (SHA1(pw) XOR SHA1(scramble·SHA1(SHA1(pw)))), COM_QUERY
for the checksum-handshake session variable, COM_REGISTER_SLAVE, and
COM_BINLOG_DUMP — after which the server streams raw binlog events (each
packet: 0x00 OK byte + the 19-byte-header event), terminated by EOF/ERR.

Architecture: the client SPOOLS the stream to local binlog files
(``BinlogSpool``) — magic + events, switching files on ROTATE — exactly
the ``mysqlbinlog --read-from-remote-server --raw`` shape. The existing
file machinery (``decode_binlog`` / ``BinlogTail``) then consumes the
spool unchanged: one decoder, two transports, and the spool doubles as a
replayable local archive of the replication stream (resume offsets stay
meaningful across restarts).

Tested against an in-process fake server that implements the SERVER side
of the same spec independently (tests/test_binlog_net.py) — handshake,
auth verification, dump streaming from fixture binlogs. A live MariaDB
cannot run in this container; the protocol bytes are the public contract
either way.
"""

from __future__ import annotations

import hashlib
import os
import socket
import struct

from sample_dms_kinesis_rds_mariadb_spark.sources.binlog import (
    BINLOG_MAGIC,
    HEADER_LEN,
)

ROTATE_EVENT = 4
FORMAT_DESCRIPTION_EVENT = 15

# capability flags (public protocol constants)
CLIENT_LONG_PASSWORD = 0x1
CLIENT_PROTOCOL_41 = 0x200
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000

COM_QUERY = 0x03
COM_BINLOG_DUMP = 0x12
COM_REGISTER_SLAVE = 0x15
COM_BINLOG_DUMP_GTID = 0x1E
BINLOG_THROUGH_GTID = 0x04  # COM_BINLOG_DUMP_GTID flags


def native_password_scramble(password: str, scramble: bytes) -> bytes:
    """``mysql_native_password``: SHA1(pw) XOR SHA1(scramble + SHA1(SHA1(pw))).
    Empty password → empty auth response (the protocol's convention)."""
    if not password:
        return b""
    sha_pw = hashlib.sha1(password.encode("utf-8")).digest()
    sha_sha_pw = hashlib.sha1(sha_pw).digest()
    mix = hashlib.sha1(scramble + sha_sha_pw).digest()
    return bytes(a ^ b for a, b in zip(sha_pw, mix))


def sha2_password_scramble(password: str, scramble: bytes) -> bytes:
    """``caching_sha2_password`` (MySQL 8 default): XOR(SHA256(pw),
    SHA256(SHA256(SHA256(pw)) + nonce)) — the published fast-auth token.
    Empty password → empty response."""
    if not password:
        return b""
    p1 = hashlib.sha256(password.encode("utf-8")).digest()
    p2 = hashlib.sha256(hashlib.sha256(p1).digest() + scramble).digest()
    return bytes(a ^ b for a, b in zip(p1, p2))


_AUTH_PLUGINS = {
    "mysql_native_password": native_password_scramble,
    "caching_sha2_password": sha2_password_scramble,
}


class ProtocolError(RuntimeError):
    pass


class ServerError(RuntimeError):
    """An ERR packet from the server (code + message)."""

    def __init__(self, code: int, message: str) -> None:
        super().__init__(f"server error {code}: {message}")
        self.code = code
        self.message = message


def _parse_err(payload: bytes) -> ServerError:
    code = struct.unpack_from("<H", payload, 1)[0]
    msg = payload[3:]
    if msg[:1] == b"#":  # SQL-state marker: '#' + 5 chars
        msg = msg[6:]
    return ServerError(code, msg.decode("utf-8", "replace"))


class BinlogDumpClient:
    """Client side of the replication protocol. Use as::

        with BinlogDumpClient(host, port, user, password) as c:
            c.connect()
            for event in c.dump("mysql-bin.000001", 4):
                ...raw 19-byte-header event bytes...

    or spool to files with :class:`BinlogSpool`.
    """

    def __init__(
        self,
        host: str,
        port: int,
        user: str,
        password: str = "",
        server_id: int = 1234,
        timeout: float = 30.0,
    ) -> None:
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.server_id = server_id
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._seq = 0

    # -- framing ------------------------------------------------------------
    def _recv_exact(self, n: int) -> bytes:
        assert self._sock is not None
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ProtocolError("connection closed mid-packet")
            buf += chunk
        return buf

    def _read_packet(self) -> bytes:
        hdr = self._recv_exact(4)
        length = int.from_bytes(hdr[:3], "little")
        self._seq = (hdr[3] + 1) & 0xFF
        return self._recv_exact(length)

    def _send_packet(self, payload: bytes) -> None:
        assert self._sock is not None
        if len(payload) >= 0xFFFFFF:
            raise ProtocolError("multi-packet payloads not supported")
        self._sock.sendall(
            len(payload).to_bytes(3, "little") + bytes([self._seq]) + payload
        )
        self._seq = (self._seq + 1) & 0xFF

    # -- handshake ----------------------------------------------------------
    def connect(self) -> None:
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )
        greeting = self._read_packet()
        if greeting[:1] == b"\xff":
            raise _parse_err(greeting)
        if greeting[0] != 0x0A:
            raise ProtocolError(f"unsupported protocol version {greeting[0]}")
        pos = 1
        end = greeting.index(b"\x00", pos)  # server version string
        pos = end + 1
        pos += 4  # thread id
        auth1 = greeting[pos : pos + 8]
        pos += 8 + 1  # scramble part 1 + filler
        pos += 2 + 1 + 2 + 2  # caps-low, charset, status, caps-high
        auth_len = greeting[pos]
        pos += 1 + 10  # auth data len + reserved
        # part 2: max(13, auth_len - 8) bytes, NUL-terminated inside
        part2_len = max(13, auth_len - 8)
        part2 = greeting[pos : pos + part2_len]
        pos += part2_len
        auth2 = part2.rstrip(b"\x00")
        scramble = auth1 + auth2
        # the server announces its default auth plugin after the scramble;
        # answer in kind (MariaDB: mysql_native_password; MySQL 8:
        # caching_sha2_password) and let an auth-switch correct us if the
        # ACCOUNT uses a different plugin than the server default
        plugin = "mysql_native_password"
        if pos < len(greeting):
            end = greeting.find(b"\x00", pos)
            name = greeting[pos : end if end != -1 else len(greeting)]
            if name:
                plugin = name.decode("utf-8", "replace")
        scramble_fn = _AUTH_PLUGINS.get(plugin)
        if scramble_fn is None:
            # unknown server plugin: offer native and rely on auth-switch
            plugin, scramble_fn = (
                "mysql_native_password", native_password_scramble,
            )
        caps = (
            CLIENT_LONG_PASSWORD
            | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION
            | CLIENT_PLUGIN_AUTH
        )
        auth_resp = scramble_fn(self.password, scramble)
        payload = (
            struct.pack("<IIB", caps, 1 << 24, 33)  # caps, max packet, utf8
            + b"\x00" * 23
            + self.user.encode("utf-8")
            + b"\x00"
            + bytes([len(auth_resp)])
            + auth_resp
            + plugin.encode("utf-8")
            + b"\x00"
        )
        self._send_packet(payload)
        self._finish_auth()

    def _finish_auth(self) -> None:
        """Drive the post-HandshakeResponse auth conversation to OK/ERR:
        AuthSwitchRequest (0xFE + plugin + NUL + new scramble — the
        account's plugin differs from what we offered: recompute and send
        the raw token) and caching_sha2's AuthMoreData (0x01 0x03 =
        fast-auth success, an OK follows; 0x01 0x04 = full auth, which
        needs TLS or server-RSA key exchange — an honest boundary here)."""
        for _ in range(4):  # auth conversations are short; never loop forever
            reply = self._read_packet()
            first = reply[:1]
            if first == b"\xff":
                raise _parse_err(reply)
            if first == b"\x00":
                return
            if first == b"\xfe":
                # AuthSwitchRequest: plugin name NUL, then the new scramble
                # (trailing NUL per the protocol)
                end = reply.index(b"\x00", 1)
                plugin = reply[1:end].decode("utf-8", "replace")
                new_scramble = reply[end + 1 :].rstrip(b"\x00")
                fn = _AUTH_PLUGINS.get(plugin)
                if fn is None:
                    raise ProtocolError(
                        f"server requested unsupported auth plugin {plugin!r}"
                    )
                self._send_packet(fn(self.password, new_scramble))
                continue
            if first == b"\x01":
                marker = reply[1] if len(reply) > 1 else -1
                if marker == 0x03:  # caching_sha2 fast-auth success
                    continue  # the OK packet follows
                if marker == 0x04:
                    raise ProtocolError(
                        "caching_sha2_password full authentication requires "
                        "TLS or RSA key exchange — connect over TLS, or "
                        "prime the server's auth cache first"
                    )
            raise ProtocolError(f"unexpected auth reply {first!r}")
        raise ProtocolError("authentication conversation did not converge")

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def __enter__(self) -> BinlogDumpClient:
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- commands -----------------------------------------------------------
    def _command(self, payload: bytes) -> bytes:
        """Send a command packet (sequence resets to 0) and return the first
        response packet."""
        self._seq = 0
        self._send_packet(payload)
        reply = self._read_packet()
        if reply[:1] == b"\xff":
            raise _parse_err(reply)
        return reply

    def query_ok(self, sql: str) -> None:
        """COM_QUERY for statements that answer with OK (SET ...). Result
        sets are out of scope for a replication client — loudly so."""
        reply = self._command(bytes([COM_QUERY]) + sql.encode("utf-8"))
        if reply[:1] != b"\x00":
            raise ProtocolError(
                "query_ok() is for OK-answering statements; got a result set"
            )

    def register_slave(self) -> None:
        """COM_REGISTER_SLAVE — how a replica announces itself (hostname/
        user/password fields empty: the common client behavior)."""
        payload = bytes([COM_REGISTER_SLAVE]) + struct.pack("<I", self.server_id)
        payload += b"\x00" * 3  # empty hostname/user/password (lenenc 0 each)
        payload += struct.pack("<HII", 0, 0, 0)  # port, rank, master id
        self._command(payload)

    def start_dump(self, filename: str, pos: int = 4) -> None:
        """Send COM_BINLOG_DUMP; events then arrive via :meth:`next_event`.
        The checksum handshake (``@master_binlog_checksum``) rides in
        ``query_ok`` before this — servers refuse the dump otherwise when
        checksums are on."""
        if pos < 4:
            pos = 4
        self._seq = 0
        payload = bytes([COM_BINLOG_DUMP]) + struct.pack(
            "<IHI", pos, 0, self.server_id
        ) + filename.encode("utf-8")
        self._send_packet(payload)

    def start_dump_gtid(self, gtid: str, flavor: str = "mariadb") -> None:
        """Start a dump positioned by GTID instead of (file, offset) — what
        failover needs: file+offset is meaningless on a promoted replica,
        the GTID is not.

        ``flavor="mariadb"``: the client ships its GTID position
        (``domain-server-seq``) in the ``@slave_connect_state`` session
        variable, then sends a regular COM_BINLOG_DUMP with an EMPTY file
        name; the server locates the first event group AFTER that GTID
        (its dump-start pseudo-rotate names the actual file).

        ``flavor="mysql"``: COM_BINLOG_DUMP_GTID (0x1E) carrying the
        EXECUTED gtid set built from the ``uuid:gno`` high-water — the
        SID block encodes {sid: [1, gno+1)} (end-exclusive interval), and
        the server streams every transaction OUTSIDE that set.
        """
        if flavor == "mariadb":
            if "'" in gtid or "\\" in gtid:
                raise ValueError(f"malformed GTID {gtid!r}")
            self.query_ok(f"SET @slave_connect_state='{gtid}'")
            self.start_dump("", 4)
            return
        if flavor != "mysql":
            raise ValueError(f"unknown GTID flavor {flavor!r}")
        uuid_part, _, gno_part = gtid.rpartition(":")
        sid = bytes.fromhex(uuid_part.replace("-", ""))
        if len(sid) != 16:
            raise ValueError(f"malformed MySQL GTID {gtid!r}")
        gno = int(gno_part)
        sid_block = (
            struct.pack("<Q", 1)  # one sid
            + sid
            + struct.pack("<Q", 1)  # one interval
            + struct.pack("<qq", 1, gno + 1)  # [1, gno+1) executed
        )
        fname = b""
        payload = (
            bytes([COM_BINLOG_DUMP_GTID])
            + struct.pack("<HI", BINLOG_THROUGH_GTID, self.server_id)
            + struct.pack("<I", len(fname)) + fname
            + struct.pack("<Q", 4)
            + struct.pack("<I", len(sid_block)) + sid_block
        )
        self._seq = 0
        self._send_packet(payload)

    def next_event(self, wait: float | None = None) -> bytes | None:
        """One raw binlog event from an open dump (19-byte header + body,
        exactly the file framing).

        ``wait``: maximum seconds to wait AT A PACKET BOUNDARY for the
        next packet — returns None when it elapses with nothing in flight
        (the dump stays open). Once a packet's first byte arrives the rest
        is read under the normal socket timeout, so a boundary timeout can
        never desynchronize the framing. ``wait=None`` blocks. Raises
        ``EOFError`` when the server ends the stream, ``ServerError`` on
        an ERR packet."""
        assert self._sock is not None
        if wait is not None:
            self._sock.settimeout(wait)
            try:
                first = self._sock.recv(1)
            except (TimeoutError, socket.timeout):
                return None
            finally:
                self._sock.settimeout(self.timeout)
            if not first:
                raise ProtocolError("connection closed between packets")
            hdr = first + self._recv_exact(3)
        else:
            hdr = self._recv_exact(4)
        length = int.from_bytes(hdr[:3], "little")
        self._seq = (hdr[3] + 1) & 0xFF
        packet = self._recv_exact(length)
        marker = packet[:1]
        if marker == b"\xff":
            raise _parse_err(packet)
        if marker == b"\xfe" and len(packet) < 9:
            raise EOFError("server ended the binlog dump")
        if marker != b"\x00":
            raise ProtocolError(f"unexpected dump packet marker {marker!r}")
        event = packet[1:]
        if len(event) < HEADER_LEN:
            raise ProtocolError("short binlog event in dump stream")
        return event

    def dump(self, filename: str, pos: int = 4):
        """Generator convenience over :meth:`start_dump`/:meth:`next_event`:
        yield events until server EOF."""
        self.start_dump(filename, pos)
        while True:
            try:
                event = self.next_event(None)
            except EOFError:
                return
            yield event


class BinlogSpool:
    """Spool a replication stream to local binlog FILES the existing
    ``decode_binlog`` / ``BinlogTail`` machinery consumes unchanged.

    Files are byte-faithful to the server's own logs: magic + every event
    as received, a ROTATE event both closes the current file (it is the
    file's last event, as on the server) and names its successor. The
    initial "fake rotate" a server may send at dump start (timestamp 0,
    before any FDE) selects the first file name instead of closing one.
    """

    def __init__(self, spool_dir: str) -> None:
        self.dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._fh = None
        self._current: str | None = None
        # CRC32 trailer width, learned from the FDE exactly like the file
        # decoder does — needed to slice the successor name out of ROTATE
        # events (the 4 trailer bytes can be printable; guessing is wrong)
        self._checksum = 0

    def _open(self, name: str) -> None:
        self._close()
        self._current = name
        self._fh = open(os.path.join(self.dir, name), "ab")
        if self._fh.tell() == 0:
            self._fh.write(BINLOG_MAGIC)

    def _close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def feed(self, event: bytes) -> None:
        """Append one raw event; switches files on ROTATE."""
        etype = event[4]
        ts = struct.unpack_from("<I", event, 0)[0]
        if etype == FORMAT_DESCRIPTION_EVENT:
            # alg byte sits 5 bytes from the end (alg + the FDE's own CRC
            # slot) whether or not checksums are on — the file decoder's rule
            self._checksum = 4 if event[-5] == 1 else 0
        if etype == ROTATE_EVENT:
            if ts == 0:
                # dump-start pseudo-rotate: restates the current file name,
                # never written to disk (it is not part of any log file)
                return
            name_end = len(event) - self._checksum
            next_name = event[HEADER_LEN + 8 : name_end].decode("utf-8")
            if self._fh is not None:
                self._fh.write(event)
            self._open(next_name)
            return
        if self._fh is None:
            raise ProtocolError(
                "event before the spool file was named — BinlogSpool.run "
                "opens the start file explicitly"
            )
        self._fh.write(event)
        self._fh.flush()

    def open_file(self, name: str) -> None:
        """Open (or append to) a spool file explicitly — the dump's start
        file; later files open themselves on ROTATE."""
        self._open(name)

    def learn_checksum(self, fde_event: bytes) -> None:
        """Take the checksum algorithm from a replayed FDE WITHOUT writing
        it (mid-file resume: the server re-sends the FDE, but the spool
        file already contains its copy)."""
        self._checksum = 4 if fde_event[-5] == 1 else 0

    def run(
        self,
        client: BinlogDumpClient,
        filename: str,
        pos: int = 4,
        max_events: int | None = None,
    ) -> int:
        """Drive a connected client's dump into the spool. Returns the
        number of events spooled. ``max_events`` bounds the pump for
        tests/backfills; None = until the server ends the stream."""
        self._open(filename)
        n = 0
        for event in client.dump(filename, pos):
            self.feed(event)
            n += 1
            if max_events is not None and n >= max_events:
                break
        self._close()
        return n

    def close(self) -> None:
        self._close()


def _pseudo_rotate_name(event: bytes, checksummed: bool) -> str:
    """File name out of a dump-start pseudo-rotate. The FDE (which says
    whether events carry CRC-32 trailers) only arrives LATER, so the
    caller passes what it negotiated: a client that set
    ``@master_binlog_checksum`` gets a checksummed pseudo-rotate (strip
    the 4 trailer bytes FIRST — ~2% of CRCs are all-printable and would
    otherwise decode into a wrong name with 4 junk characters), a client
    that didn't gets the bare name."""
    raw = event[HEADER_LEN + 8 :]
    order = (raw[:-4], raw) if checksummed else (raw, raw[:-4])
    for candidate in order:
        try:
            name = candidate.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if name and all(32 <= ord(c) < 127 for c in name):
            return name
    raise ProtocolError(f"unparseable dump-start rotate name {raw!r}")


class NetworkBinlogCapture:
    """Live network CDC as a first-class capture agent: the duck-typed
    ``pump(feed) -> int`` contract :class:`PollingReplicationTask`
    consumes, backed by the replication socket.

    Each pump (1) window-reads the open dump — waiting at most
    ``read_window`` seconds at a packet boundary, so a quiet server costs
    one bounded wait, and an active one drains whatever is in flight —
    appending events to the :class:`BinlogSpool`; then (2) replays
    newly-committed records out of the spool through the EXISTING
    :class:`~.binlog.BinlogTail` (rotation chains, txn holdback, resume
    offsets all unchanged).

    Restart/reconnect: the resume point is DERIVED FROM THE SPOOL (last
    file, its byte size — always an event boundary since only whole
    events are written); a server that ends or drops the stream is
    re-dialed on the next pump from that point, and the FDE the server
    replays on a mid-file resume is consumed for its checksum algorithm
    but not re-written (the spool file already has its copy). Unreachable
    server ⇒ pump returns 0 and retries later — capture agents must
    degrade to "no new data", not kill the task, on transient network
    failure.
    """

    def __init__(
        self,
        host: str,
        port: int,
        user: str,
        password: str,
        spool_dir: str,
        first_file: str,
        state_path: str | None = None,
        column_names: dict | None = None,
        server_id: int = 1234,
        read_window: float = 0.25,
        checksum_stmt: str = "SET @master_binlog_checksum= 'CRC32'",
        resume_gtid: str | None = None,
        gtid_flavor: str = "mariadb",
    ) -> None:
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.spool_dir = spool_dir
        self.first_file = first_file
        self.state_path = state_path
        self.column_names = column_names
        self.server_id = server_id
        self.read_window = read_window
        self.checksum_stmt = checksum_stmt
        # failover coordinate: when the spool is EMPTY (fresh host, lost
        # disk, promoted-replica cutover) and a GTID high-water survives
        # (BinlogTail state carries it), connect by GTID — the server
        # names the start file via its dump-start pseudo-rotate, and the
        # fresh spool file begins exactly at the first un-shipped txn.
        # A non-empty spool always resumes by (file, offset) as before.
        self.resume_gtid = resume_gtid
        self.gtid_flavor = gtid_flavor
        self._spool = BinlogSpool(spool_dir)
        self._client: BinlogDumpClient | None = None
        self._tail = None
        self._skip_fde = False
        self._awaiting_name = False

    def _resume_point(self) -> tuple[str, int]:
        files = sorted(
            f for f in os.listdir(self.spool_dir) if not f.startswith(".")
        )
        if not files:
            return self.first_file, 4
        last = files[-1]
        return last, max(os.path.getsize(os.path.join(self.spool_dir, last)), 4)

    def _connect(self) -> None:
        client = BinlogDumpClient(
            self.host, self.port, self.user, self.password,
            server_id=self.server_id,
        )
        client.connect()
        if self.checksum_stmt:
            client.query_ok(self.checksum_stmt)
        client.register_slave()
        spooled = [
            f for f in os.listdir(self.spool_dir) if not f.startswith(".")
        ]
        if not spooled and self.resume_gtid:
            # GTID failover invalidates every FILE coordinate by
            # definition (the fresh spool file shares a name with the old
            # primary's log but not its bytes): drop the stale tail state
            # so BinlogTail starts the new spool from its beginning — the
            # server already positioned the stream past shipped txns
            if self.state_path and os.path.exists(self.state_path):
                os.remove(self.state_path)
            self._awaiting_name = True
            self._skip_fde = False  # fresh spool file needs the FDE copy
            client.start_dump_gtid(self.resume_gtid, flavor=self.gtid_flavor)
        else:
            fname, pos = self._resume_point()
            self._spool.open_file(fname)
            self._skip_fde = pos > 4
            client.start_dump(fname, pos)
        self._client = client

    def _disconnect(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = None
        self._spool.close()

    def pump(self, feed) -> int:
        import time as _time

        if self._client is None:
            try:
                self._connect()
            except OSError:
                return 0  # transient: unreachable server, retry next pump
        end = _time.monotonic() + self.read_window
        try:
            while True:
                wait = end - _time.monotonic()
                if wait <= 0:
                    break
                event = self._client.next_event(wait)
                if event is None:
                    break
                if self._awaiting_name:
                    if event[4] == ROTATE_EVENT:
                        # GTID dump: the server's pseudo-rotate names the
                        # file the resume landed in — open the fresh spool
                        # file under that name (not written: it is not part
                        # of any log file). Checksummed iff we negotiated
                        # CRC32 on this connection (a truthy stmt setting
                        # 'NONE' must NOT strip 4 real name characters).
                        self.first_file = _pseudo_rotate_name(
                            event,
                            checksummed="CRC32"
                            in (self.checksum_stmt or "").upper(),
                        )
                        self._spool.open_file(self.first_file)
                        self._awaiting_name = False
                        continue
                    raise ProtocolError(
                        "GTID dump did not start with the naming rotate"
                    )
                if event[4] == FORMAT_DESCRIPTION_EVENT and self._skip_fde:
                    self._spool.learn_checksum(event)
                    self._skip_fde = False
                    continue
                self._spool.feed(event)
        except (EOFError, ProtocolError, OSError):
            # stream ended or broke: spool keeps everything already read;
            # next pump re-dials from the spool's high-water mark
            self._disconnect()
        from sample_dms_kinesis_rds_mariadb_spark.sources.binlog import (
            BinlogTail,
        )

        first_path = os.path.join(self.spool_dir, self.first_file)
        if self._tail is None and os.path.exists(first_path):
            self._tail = BinlogTail(
                first_path,
                column_names=self.column_names,
                state_path=self.state_path,
            )
        return self._tail.pump(feed) if self._tail is not None else 0

    def close(self) -> None:
        self._disconnect()
