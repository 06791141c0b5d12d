"""Kafka wire protocol — a spec-derived client for the one reference
transport with no live analog (the reference streams CDC envelopes into a
managed queue, ``dms_sample/stack.py:354-360``; Kafka is the
self-managed dual every DMS deployment targets via its Kafka endpoint).

Implements, from the PUBLIC Kafka protocol specification (KIP-98 record
batch format v2 and the classic request encodings — no vendor code):

- **Record batch v2** encode/decode: the magic-2 layout (base offset,
  partition leader epoch, CRC-32C over attributes..end, zigzag-varint
  record framing with timestamp/offset deltas, keys, values, headers).
  CRC-32C (Castagnoli) is implemented table-based in pure Python.
- **Request/response framing**: 4-byte length prefix, request header v1
  (api key, version, correlation id, client id).
- **ApiVersions (18) v0**, **Metadata (3) v1**, **Produce (0) v3**,
  **Fetch (1) v4**, **ListOffsets (2) v1** — the classic (non-flexible)
  encodings, which every broker still serves.

``KafkaClient`` is the transport: connect, discover partitions, produce
record batches, fetch them back. ``produce_events``/``consume_events``
adapt the engine's JSON envelope dicts onto it (partition key → Kafka
message key — the same key-ordering contract as the stream store).

Tested against an INDEPENDENT fake broker (tests/fake_kafka_broker.py —
the server half written from the same public spec: it re-decodes
incoming batches with its own parser and re-encodes fetched batches with
its own builder, so every byte crosses two independent implementations).

Scale shape: a capture/delivery agent path (driver-side, trickle-sized),
like ``sources/binlog_net.py`` — the corpus never routes through here;
the distributed data plane stays parquet/StreamStore.
"""

from __future__ import annotations

import json
import socket
import struct

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected


def _crc32c_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ _CRC32C_POLY if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C = _crc32c_table()


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli) — the record-batch checksum (plain CRC-32
    would pass self-tests and fail against every real broker)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_varint(n: int) -> bytes:
    """Zigzag varint (the record-framing integer encoding)."""
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def encode_record_batch(
    records: list[tuple[bytes | None, bytes | None]],
    base_offset: int = 0,
    base_timestamp: int = 0,
) -> bytes:
    """Record batch v2 (magic 2): zigzag-varint record framing, CRC-32C
    over attributes..end. ``records``: (key, value) pairs (None = null).
    Uncompressed (attributes 0), non-transactional, no producer id."""
    if not records:
        raise ValueError("a record batch needs at least one record")
    recs = bytearray()
    for i, (key, value) in enumerate(records):
        body = bytearray()
        body += b"\x00"  # record attributes
        body += write_varint(0)  # timestamp delta
        body += write_varint(i)  # offset delta
        if key is None:
            body += write_varint(-1)
        else:
            body += write_varint(len(key)) + key
        if value is None:
            body += write_varint(-1)
        else:
            body += write_varint(len(value)) + value
        body += write_varint(0)  # header count
        recs += write_varint(len(body)) + body
    n = len(records)
    # attributes..records — the CRC's span
    tail = (
        struct.pack(">hiqqqhii", 0, n - 1, base_timestamp, base_timestamp,
                    -1, -1, -1, n)
        + bytes(recs)
    )
    crc = crc32c(tail)
    # batchLength counts from partitionLeaderEpoch (i.e. everything after
    # baseOffset+batchLength themselves)
    after_len = struct.pack(">ib", -1, 2) + struct.pack(">I", crc) + tail
    return struct.pack(">qi", base_offset, len(after_len)) + after_len


def decode_record_batches(
    data: bytes,
) -> list[tuple[int, bytes | None, bytes | None]]:
    """Decode a record-set (one or more concatenated v2 batches) into
    (offset, key, value) triples; CRC-32C verified per batch."""
    out: list[tuple[int, bytes | None, bytes | None]] = []
    pos = 0
    while pos + 12 <= len(data):
        base_offset, batch_len = struct.unpack_from(">qi", data, pos)
        end = pos + 12 + batch_len
        if end > len(data):
            break  # partial trailing batch (brokers may truncate) — stop
        magic = data[pos + 16]
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        crc_stored = struct.unpack_from(">I", data, pos + 17)[0]
        body = data[pos + 21 : end]
        if crc32c(body) != crc_stored:
            raise ValueError("record batch CRC-32C mismatch")
        n = struct.unpack_from(">i", body, 36)[0]
        p = 40
        for _ in range(n):
            rec_len, p = read_varint(body, p)
            rec_end = p + rec_len
            p += 1  # record attributes
            _ts_delta, p = read_varint(body, p)
            off_delta, p = read_varint(body, p)
            klen, p = read_varint(body, p)
            key = None if klen < 0 else body[p : p + klen]
            p += max(klen, 0)
            vlen, p = read_varint(body, p)
            value = None if vlen < 0 else body[p : p + vlen]
            p += max(vlen, 0)
            n_hdr, p = read_varint(body, p)
            for _h in range(n_hdr):
                hk, p = read_varint(body, p)
                p += max(hk, 0)
                hv, p = read_varint(body, p)
                p += max(hv, 0)
            if p != rec_end:
                raise ValueError("record framing mismatch")
            out.append((base_offset + off_delta, key, value))
        pos = end
    return out


# -- classic (non-flexible) primitive encodings ------------------------------


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    raw = s.encode("utf-8")
    return struct.pack(">h", len(raw)) + raw


def _read_str(data: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", data, pos)
    pos += 2
    if n < 0:
        return None, pos
    return data[pos : pos + n].decode("utf-8"), pos + n


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _read_bytes(data: bytes, pos: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", data, pos)
    pos += 4
    if n < 0:
        return None, pos
    return data[pos : pos + n], pos + n


class KafkaProtocolError(RuntimeError):
    def __init__(self, api: str, code: int) -> None:
        super().__init__(f"{api} failed with error code {code}")
        self.code = code


class KafkaClient:
    """Minimal spec-derived Kafka client: metadata discovery, produce
    (record batch v2, acks=-1), fetch, list offsets. One broker, classic
    encodings — the protocol subset every Kafka-compatible system serves."""

    def __init__(
        self, host: str, port: int, client_id: str = "spark-engine",
        timeout: float = 30.0,
    ) -> None:
        self.host, self.port = host, port
        self.client_id = client_id
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._corr = 0

    # -- framing --------------------------------------------------------
    def connect(self) -> None:
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def __enter__(self) -> "KafkaClient":
        self.connect()
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recv_exact(self, n: int) -> bytes:
        assert self._sock is not None
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("broker closed mid-response")
            buf += chunk
        return buf

    def _request(self, api_key: int, api_version: int, body: bytes) -> bytes:
        assert self._sock is not None, "call connect() first"
        self._corr += 1
        header = (
            struct.pack(">hhi", api_key, api_version, self._corr)
            + _str(self.client_id)
        )
        payload = header + body
        self._sock.sendall(struct.pack(">i", len(payload)) + payload)
        (resp_len,) = struct.unpack(">i", self._recv_exact(4))
        resp = self._recv_exact(resp_len)
        (corr,) = struct.unpack_from(">i", resp, 0)
        if corr != self._corr:
            raise ValueError(f"correlation id mismatch {corr} != {self._corr}")
        return resp[4:]

    # -- apis -----------------------------------------------------------
    def api_versions(self) -> dict[int, tuple[int, int]]:
        """ApiVersions v0 → {api_key: (min, max)}."""
        resp = self._request(API_VERSIONS, 0, b"")
        (err, n) = struct.unpack_from(">hi", resp, 0)
        if err:
            raise KafkaProtocolError("ApiVersions", err)
        out = {}
        pos = 6
        for _ in range(n):
            k, lo, hi = struct.unpack_from(">hhh", resp, pos)
            out[k] = (lo, hi)
            pos += 6
        return out

    def metadata(self, topics: list[str]) -> dict[str, list[int]]:
        """Metadata v1 → {topic: [partition ids]}; raises on topic errors."""
        body = struct.pack(">i", len(topics)) + b"".join(
            _str(t) for t in topics
        )
        resp = self._request(API_METADATA, 1, body)
        pos = 0
        (n_brokers,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_brokers):
            pos += 4  # node id
            _host, pos = _read_str(resp, pos)
            pos += 4  # port
            _rack, pos = _read_str(resp, pos)
        pos += 4  # controller id
        (n_topics,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        out: dict[str, list[int]] = {}
        for _ in range(n_topics):
            (terr,) = struct.unpack_from(">h", resp, pos)
            pos += 2
            name, pos = _read_str(resp, pos)
            pos += 1  # is_internal
            if terr:
                raise KafkaProtocolError(f"Metadata[{name}]", terr)
            (n_parts,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            parts = []
            for _ in range(n_parts):
                perr, pid, _leader = struct.unpack_from(">hii", resp, pos)
                pos += 10
                if perr:
                    raise KafkaProtocolError(f"Metadata[{name}/{pid}]", perr)
                (n_rep,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n_rep
                (n_isr,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n_isr
                parts.append(pid)
            out[name or ""] = sorted(parts)
        return out

    def produce(
        self,
        topic: str,
        partition: int,
        records: list[tuple[bytes | None, bytes | None]],
        timeout_ms: int = 10_000,
    ) -> int:
        """Produce v3 (acks=-1): returns the batch's base offset."""
        batch = encode_record_batch(records)
        body = (
            _str(None)  # transactional id
            + struct.pack(">hi", -1, timeout_ms)  # acks=-1, timeout
            + struct.pack(">i", 1)
            + _str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">i", partition)
            + _bytes(batch)
        )
        resp = self._request(API_PRODUCE, 3, body)
        pos = 0
        (n_topics,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        base = -1
        for _ in range(n_topics):
            _name, pos = _read_str(resp, pos)
            (n_parts,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            for _ in range(n_parts):
                pid, err, off, _ts = struct.unpack_from(">ihqq", resp, pos)
                pos += 22
                if err:
                    raise KafkaProtocolError(f"Produce[{pid}]", err)
                base = off
        return base

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 1 << 20,
        max_wait_ms: int = 100,
    ) -> list[tuple[int, bytes | None, bytes | None]]:
        """Fetch v4 from ``offset`` → [(offset, key, value)]."""
        body = (
            struct.pack(">iiii", -1, max_wait_ms, 0, max_bytes)
            + struct.pack(">b", 0)  # isolation level: read uncommitted
            + struct.pack(">i", 1)
            + _str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        resp = self._request(API_FETCH, 4, body)
        pos = 4  # throttle_time_ms
        (n_topics,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        out: list[tuple[int, bytes | None, bytes | None]] = []
        for _ in range(n_topics):
            _name, pos = _read_str(resp, pos)
            (n_parts,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            for _ in range(n_parts):
                pid, err, _hw, _lso = struct.unpack_from(">ihqq", resp, pos)
                pos += 22
                (n_aborted,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 16 * max(n_aborted, 0)
                record_set, pos = _read_bytes(resp, pos)
                if err:
                    raise KafkaProtocolError(f"Fetch[{pid}]", err)
                if record_set:
                    out.extend(
                        r for r in decode_record_batches(record_set)
                        if r[0] >= offset
                    )
        return out

    def list_offsets(self, topic: str, partition: int, ts: int = -1) -> int:
        """ListOffsets v1: ts=-1 → log-end offset, ts=-2 → earliest."""
        body = (
            struct.pack(">i", -1)  # replica id
            + struct.pack(">i", 1)
            + _str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iq", partition, ts)
        )
        resp = self._request(API_LIST_OFFSETS, 1, body)
        pos = 0
        (n_topics,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_topics):
            _name, pos = _read_str(resp, pos)
            (n_parts,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            for _ in range(n_parts):
                pid, err, _ts, off = struct.unpack_from(">ihqq", resp, pos)
                pos += 22
                if err:
                    raise KafkaProtocolError(f"ListOffsets[{pid}]", err)
                return off
        raise KafkaProtocolError("ListOffsets", -1)


class KafkaRelay:
    """Incremental StreamStore → Kafka delivery agent — the self-managed
    analog of pointing the replication task's target endpoint at Kafka
    instead of the managed stream: each :meth:`pump` pages every shard's
    UNREAD suffix through a :class:`~.stream_sink.ShardIterator` cursor
    and produces one record batch per page (message key = partition key,
    store shard → topic partition, so per-key ordering carries over).
    The per-shard sequence high-water persists to ``state_path`` AFTER
    EVERY PRODUCED PAGE, so a restarted relay resumes from the exact
    sequence after the last persisted page — delivery is at-least-once
    with re-delivery bounded to ONE page (a crash between produce and
    persist re-sends that page; Kafka consumers dedup on the envelope's
    sequence/partition key as usual).

    Scale shape: a driver-side trickle agent like the capture agents —
    the iterator's sequence predicate prunes consumed files at the
    parquet-footer level, so each pump costs O(unread suffix)."""

    def __init__(
        self,
        store,
        client: KafkaClient,
        topic: str,
        state_path: str | None = None,
    ) -> None:
        import os

        self.store = store
        self.client = client
        self.topic = topic
        self.state_path = state_path
        self._next_seq: dict[int, int] = {}
        if state_path and os.path.exists(state_path):
            with open(state_path) as f:
                saved = json.load(f)
            self._next_seq = {int(k): int(v) for k, v in saved.items()}
        parts = client.metadata([topic])[topic]
        if not parts:
            raise ValueError(f"topic {topic!r} has no partitions")
        self._n_parts = len(parts)

    def _iterator(self, shard: int):
        if shard in self._next_seq:
            return self.store.get_shard_iterator(
                shard, "AT_SEQUENCE_NUMBER",
                starting_sequence_number=self._next_seq[shard],
            )
        return self.store.get_shard_iterator(shard, "TRIM_HORIZON")

    def _persist(self) -> None:
        import os

        if not self.state_path:
            return
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in self._next_seq.items()}, f)
        os.replace(tmp, self.state_path)

    def pump(self, page: int = 200) -> int:
        """Relay every unread record; returns how many were delivered.
        State persists per produced page — a mid-pump failure re-delivers
        at most the in-flight page on restart, never earlier pages."""
        total = 0
        for shard in range(self.store.shards):
            it = self._iterator(shard)
            while True:
                recs = it.get_records(limit=page)
                if not recs:
                    break
                produce_events(
                    self.client, self.topic,
                    [r["Data"] for r in recs],
                    partition=shard % self._n_parts,
                )
                self._next_seq[shard] = recs[-1]["SequenceNumber"] + 1
                self._persist()
                total += len(recs)
        return total


# -- envelope adapters --------------------------------------------------------


def produce_events(
    client: KafkaClient, topic: str, events: list[dict], partition: int = 0
) -> int:
    """Engine JSON envelopes → one produced record batch. The message key
    is the envelope's partition-key string (the stream store's key-order
    contract: same key ⇒ same partition ⇒ ordered delivery). Returns the
    base offset."""
    records = []
    for e in events:
        key = (e.get("partition_key") or "").encode("utf-8") or None
        records.append(
            (key, json.dumps(e, sort_keys=True).encode("utf-8"))
        )
    return client.produce(topic, partition, records)


def consume_events(
    client: KafkaClient, topic: str, offset: int = 0, partition: int = 0
) -> list[dict]:
    """Decode EVERY JSON envelope from ``offset`` to the log end, in
    offset order. A single Fetch is capped at ``max_bytes`` (the broker
    truncates, and the batch decoder drops the cut trailing batch), so
    this loops fetches until no forward progress — a topic larger than
    one fetch window is drained, never silently truncated."""
    out: list[tuple[int, bytes]] = []
    next_off = offset
    while True:
        rows = client.fetch(topic, partition, next_off)
        if not rows:
            break
        out.extend((o, v) for o, _k, v in rows)
        new_next = max(o for o, _k, _v in rows) + 1
        if new_next <= next_off:
            break  # no forward progress: defensive stop
        next_off = new_next
    return [
        json.loads(v.decode("utf-8"))
        for _off, v in sorted(out, key=lambda r: r[0])
    ]
