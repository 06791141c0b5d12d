"""Test-side fake Kafka BROKER — an INDEPENDENT implementation of the
server half of the public Kafka protocol (written from the protocol
spec, not from the client under test): request framing + header v1,
ApiVersions v0, Metadata v1, Produce v3, Fetch v4, ListOffsets v1, and
its OWN record-batch v2 codec (own CRC-32C table, own varint coder).

Incoming batches are fully re-decoded here (CRC verified) into
(key, value) rows, offsets assigned, and fetches re-ENCODE fresh batches
with this module's builder — so every byte crosses two independent
implementations in each direction."""

from __future__ import annotations

import socket
import struct
import threading


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
    return crc ^ 0xFFFFFFFF


def _wvarint(n: int) -> bytes:
    u = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        if u >= 0x80:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        else:
            out.append(u)
            return bytes(out)


def _rvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1), pos
        shift += 7


def _decode_batch(data: bytes) -> list[tuple[bytes | None, bytes | None]]:
    """One v2 batch → (key, value) rows; CRC verified independently."""
    if len(data) < 61:
        raise ValueError("short record batch")
    magic = data[16]
    if magic != 2:
        raise ValueError(f"magic {magic}")
    (crc_stored,) = struct.unpack_from(">I", data, 17)
    body = data[21:]
    if _crc32c(body) != crc_stored:
        raise ValueError("bad batch CRC")
    (count,) = struct.unpack_from(">i", body, 36)
    rows = []
    p = 40
    for _ in range(count):
        ln, p = _rvarint(body, p)
        end = p + ln
        p += 1
        _tsd, p = _rvarint(body, p)
        _offd, p = _rvarint(body, p)
        kl, p = _rvarint(body, p)
        key = None if kl < 0 else body[p : p + kl]
        p += max(kl, 0)
        vl, p = _rvarint(body, p)
        val = None if vl < 0 else body[p : p + vl]
        p += max(vl, 0)
        nh, p = _rvarint(body, p)
        for _ in range(nh):
            hk, p = _rvarint(body, p)
            p += max(hk, 0)
            hv, p = _rvarint(body, p)
            p += max(hv, 0)
        if p != end:
            raise ValueError("record length mismatch")
        rows.append((key, val))
    return rows


def _encode_batch(
    rows: list[tuple[bytes | None, bytes | None]], base_offset: int
) -> bytes:
    recs = bytearray()
    for i, (k, v) in enumerate(rows):
        b = bytearray(b"\x00")
        b += _wvarint(0) + _wvarint(i)
        b += _wvarint(-1) if k is None else _wvarint(len(k)) + k
        b += _wvarint(-1) if v is None else _wvarint(len(v)) + v
        b += _wvarint(0)
        recs += _wvarint(len(b)) + b
    tail = struct.pack(
        ">hiqqqhii", 0, len(rows) - 1, 0, 0, -1, -1, -1, len(rows)
    ) + bytes(recs)
    after = struct.pack(">ib", -1, 2) + struct.pack(">I", _crc32c(tail)) + tail
    return struct.pack(">qi", base_offset, len(after)) + after


def _s(v: str | None) -> bytes:
    if v is None:
        return struct.pack(">h", -1)
    raw = v.encode()
    return struct.pack(">h", len(raw)) + raw


def _rs(data: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", data, pos)
    pos += 2
    if n < 0:
        return None, pos
    return data[pos : pos + n].decode(), pos + n


class FakeKafkaBroker:
    """Single-node broker: topics auto-create with one partition; the log
    is an in-memory list of (key, value) rows per (topic, partition)."""

    def __init__(self) -> None:
        self.logs: dict[tuple[str, int], list] = {}
        self.produced_batches = 0
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
            t = threading.Thread(target=self._handle, args=(conn,), daemon=True)
            t.start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            while True:
                hdr = self._recv(conn, 4)
                (n,) = struct.unpack(">i", hdr)
                req = self._recv(conn, n)
                api, ver, corr = struct.unpack_from(">hhi", req, 0)
                pos = 8
                _cid, pos = _rs(req, pos)
                body = req[pos:]
                resp = self._dispatch(api, ver, body)
                payload = struct.pack(">i", corr) + resp
                conn.sendall(struct.pack(">i", len(payload)) + payload)
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            conn.close()

    @staticmethod
    def _recv(conn: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return buf

    def _dispatch(self, api: int, ver: int, body: bytes) -> bytes:
        if api == 18:  # ApiVersions v0
            apis = [(0, 0, 3), (1, 0, 4), (2, 0, 1), (3, 0, 1), (18, 0, 0)]
            out = struct.pack(">hi", 0, len(apis))
            for k, lo, hi in apis:
                out += struct.pack(">hhh", k, lo, hi)
            return out
        if api == 3:  # Metadata v1
            (nt,) = struct.unpack_from(">i", body, 0)
            pos = 4
            topics = []
            for _ in range(nt):
                t, pos = _rs(body, pos)
                topics.append(t)
            out = struct.pack(">i", 1)  # one broker
            out += struct.pack(">i", 0) + _s("127.0.0.1") + struct.pack(
                ">i", self.port
            ) + _s(None)
            out += struct.pack(">i", 0)  # controller id
            out += struct.pack(">i", len(topics))
            for t in topics:
                self.logs.setdefault((t, 0), [])
                out += struct.pack(">h", 0) + _s(t) + b"\x00"
                out += struct.pack(">i", 1)  # one partition
                out += struct.pack(">hii", 0, 0, 0)  # err, pid, leader
                out += struct.pack(">ii", 1, 0)  # replicas [0]
                out += struct.pack(">ii", 1, 0)  # isr [0]
            return out
        if api == 0 and ver == 3:  # Produce v3
            pos = 0
            _txid, pos = _rs(body, pos)
            _acks, _timeout = struct.unpack_from(">hi", body, pos)
            pos += 6
            (ntop,) = struct.unpack_from(">i", body, pos)
            pos += 4
            resp_topics = b""
            for _ in range(ntop):
                t, pos = _rs(body, pos)
                (nparts,) = struct.unpack_from(">i", body, pos)
                pos += 4
                parts = b""
                for _ in range(nparts):
                    (pid,) = struct.unpack_from(">i", body, pos)
                    pos += 4
                    (blen,) = struct.unpack_from(">i", body, pos)
                    pos += 4
                    batch = body[pos : pos + blen]
                    pos += blen
                    log = self.logs.setdefault((t, pid), [])
                    base = len(log)
                    try:
                        rows = _decode_batch(batch)
                        log.extend(rows)
                        self.produced_batches += 1
                        parts += struct.pack(">ihqq", pid, 0, base, -1)
                    except ValueError:
                        parts += struct.pack(">ihqq", pid, 2, -1, -1)  # CRC err
                resp_topics += _s(t) + struct.pack(">i", nparts) + parts
            return struct.pack(">i", ntop) + resp_topics + struct.pack(">i", 0)
        if api == 1 and ver == 4:  # Fetch v4
            pos = 13  # replica, max_wait, min_bytes, max_bytes(4) ...
            (_replica, _mw, _mb, _maxb) = struct.unpack_from(">iiii", body, 0)
            pos = 16 + 1  # + isolation level
            (ntop,) = struct.unpack_from(">i", body, pos)
            pos += 4
            out = struct.pack(">i", 0)  # throttle
            out += struct.pack(">i", ntop)
            for _ in range(ntop):
                t, pos = _rs(body, pos)
                (nparts,) = struct.unpack_from(">i", body, pos)
                pos += 4
                out += _s(t) + struct.pack(">i", nparts)
                for _ in range(nparts):
                    pid, off, _pmax = struct.unpack_from(">iqi", body, pos)
                    pos += 16
                    log = self.logs.get((t, pid), [])
                    hw = len(log)
                    out += struct.pack(">ihqq", pid, 0, hw, hw)
                    out += struct.pack(">i", 0)  # no aborted txns
                    if off < hw:
                        rs = _encode_batch(log[off:], off)
                        out += struct.pack(">i", len(rs)) + rs
                    else:
                        out += struct.pack(">i", -1)  # null record set
            return out
        if api == 2 and ver == 1:  # ListOffsets v1
            pos = 4  # replica id
            (ntop,) = struct.unpack_from(">i", body, pos)
            pos += 4
            out = struct.pack(">i", ntop)
            for _ in range(ntop):
                t, pos = _rs(body, pos)
                (nparts,) = struct.unpack_from(">i", body, pos)
                pos += 4
                out += _s(t) + struct.pack(">i", nparts)
                for _ in range(nparts):
                    pid, ts = struct.unpack_from(">iq", body, pos)
                    pos += 12
                    log = self.logs.get((t, pid), [])
                    off = 0 if ts == -2 else len(log)
                    out += struct.pack(">ihqq", pid, 0, -1, off)
            return out
        # unknown api: error code 35 (UNSUPPORTED_VERSION) best effort
        return struct.pack(">hi", 35, 0)
