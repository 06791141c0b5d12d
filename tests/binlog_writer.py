"""Test-side binlog v4 FILE writer — an INDEPENDENT encoder of the public
binlog format (written from the format spec, not from the decoder) used to
synthesize fixture binlogs for tests/test_binlog.py. Deliberately mirrors
what a MariaDB/MySQL server writes: magic, FORMAT_DESCRIPTION with
checksum-algorithm suffix, TABLE_MAP (optionally with the
binlog_row_metadata=FULL column-name TLV), WRITE/UPDATE/DELETE_ROWS in v1
(MariaDB) or v2 (MySQL 5.6+) framing, QUERY (BEGIN/COMMIT/DDL), XID."""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\xfebin"

# column type codes (public spec)
TINY, SHORT, LONG, FLOAT, DOUBLE = 1, 2, 3, 4, 5
LONGLONG, INT24, DATE, DATETIME2, TIMESTAMP2 = 8, 9, 10, 18, 17
TIME2 = 19
YEAR, VARCHAR, BLOB, NEWDECIMAL, STRING = 13, 15, 252, 246, 254
ENUM = 247


class Col:
    """One column: name, binlog type code, and type metadata.

    meta per type: VARCHAR -> (max_len,); NEWDECIMAL -> (precision, scale);
    BLOB -> (len_prefix_bytes,); DATETIME2/TIMESTAMP2 -> (fsp,);
    others -> ()."""

    def __init__(self, name: str, ctype: int, meta: tuple = ()):  # noqa: D401
        self.name, self.ctype, self.meta = name, ctype, meta


class BinlogWriter:
    def __init__(self, path: str, checksum: bool = True, v2: bool = False,
                 with_names: bool = True, server_id: int = 1):
        self.path = path
        self.checksum = checksum
        self.v2 = v2
        self.with_names = with_names
        self.server_id = server_id
        self.pos = 4
        self._buf = [MAGIC]
        self._tids: dict[tuple, int] = {}
        self._xid = 0
        self._write_fde()

    # -- low-level ----------------------------------------------------------
    def _event(self, etype: int, body: bytes, ts: int = 1_700_000_000) -> None:
        size = 19 + len(body) + (4 if self.checksum else 0)
        log_pos = self.pos + size
        ev = struct.pack("<IBIIIH", ts, etype, self.server_id, size, log_pos, 0)
        ev += body
        if self.checksum:
            ev += struct.pack("<I", zlib.crc32(ev) & 0xFFFFFFFF)
        self._buf.append(ev)
        self.pos = log_pos

    def _write_fde(self) -> None:
        body = struct.pack("<H", 4)                      # binlog version
        body += b"10.11.6-MariaDB-test".ljust(50, b"\x00")
        body += struct.pack("<I", 1_700_000_000)         # create ts
        body += bytes([19])                              # header length
        body += bytes([0] * 40)                          # post-header lens
        body += bytes([1 if self.checksum else 0])       # checksum alg
        # FDE carries its own 4-byte CRC slot even when alg=0
        if self.checksum:
            size = 19 + len(body) + 4
            log_pos = self.pos + size
            ev = struct.pack("<IBIIIH", 1_700_000_000, 15, self.server_id,
                             size, log_pos, 0) + body
            ev += struct.pack("<I", zlib.crc32(ev) & 0xFFFFFFFF)
        else:
            body += b"\x00\x00\x00\x00"
            size = 19 + len(body)
            log_pos = self.pos + size
            ev = struct.pack("<IBIIIH", 1_700_000_000, 15, self.server_id,
                             size, log_pos, 0) + body
        self._buf.append(ev)
        self.pos = log_pos

    @staticmethod
    def _lenenc(n: int) -> bytes:
        if n < 0xFB:
            return bytes([n])
        if n < 1 << 16:
            return b"\xfc" + struct.pack("<H", n)
        if n < 1 << 24:
            return b"\xfd" + n.to_bytes(3, "little")
        return b"\xfe" + struct.pack("<Q", n)

    # -- events -------------------------------------------------------------
    def query(self, schema: str, sql: str, ts: int = 1_700_000_000) -> None:
        body = struct.pack("<IIBHH", 7, 0, len(schema.encode()), 0, 0)
        body += schema.encode() + b"\x00" + sql.encode()
        self._event(2, body, ts)

    def begin(self, schema: str = "") -> None:
        self.query(schema, "BEGIN")

    def rotate(self, next_name: str) -> None:
        """ROTATE event: position u64 (successor start = 4, past the
        magic) + successor file name — the last event of a finished log."""
        self._event(4, struct.pack("<Q", 4) + next_name.encode())

    def gtid(self, domain: int, seq_no: int, standalone: bool = False) -> None:
        """MariaDB GTID_EVENT (162): seq_no u64, domain u32, flags2 u8.
        FL_STANDALONE (0x01) marks a non-transactional event group (DDL);
        otherwise the GTID event opens the transaction (MariaDB writes it
        instead of BEGIN)."""
        body = struct.pack("<QIB", seq_no, domain, 0x01 if standalone else 0)
        self._event(162, body)

    def gtid_mysql(self, sid: bytes, gno: int) -> None:
        """MySQL GTID_LOG_EVENT (33): flags u8, sid (16-byte uuid), gno
        u64 LE — MySQL still writes BEGIN after it."""
        if len(sid) != 16:
            raise ValueError("sid must be 16 bytes")
        self._event(33, bytes([1]) + sid + struct.pack("<q", gno))

    def xid(self) -> int:
        self._xid += 1
        self._event(16, struct.pack("<Q", self._xid))
        return self._xid

    def table_map(self, schema: str, table: str, cols: list[Col]) -> int:
        tid = self._tids.setdefault((schema, table), 100 + len(self._tids))
        body = tid.to_bytes(6, "little") + struct.pack("<H", 1)
        body += bytes([len(schema.encode())]) + schema.encode() + b"\x00"
        body += bytes([len(table.encode())]) + table.encode() + b"\x00"
        body += self._lenenc(len(cols))
        # ENUM transports with column type byte STRING; the real type rides
        # in the metadata pair (format spec)
        body += bytes(STRING if c.ctype == ENUM else c.ctype for c in cols)
        meta = b""
        for c in cols:
            if c.ctype == VARCHAR:
                meta += struct.pack("<H", c.meta[0])
            elif c.ctype == NEWDECIMAL:
                meta += bytes([c.meta[0], c.meta[1]])
            elif c.ctype == BLOB:
                meta += bytes([c.meta[0]])
            elif c.ctype in (DATETIME2, TIMESTAMP2, TIME2):
                meta += bytes([c.meta[0]])
            elif c.ctype in (FLOAT, DOUBLE):
                meta += bytes([4 if c.ctype == FLOAT else 8])
            elif c.ctype == STRING:
                # CHAR(n): byte0 = real type with the two high length bits
                # folded (inverted) into bits 4-5, byte1 = low length byte
                max_len = c.meta[0]
                meta += bytes(
                    [STRING ^ (((max_len >> 8) & 0x03) << 4), max_len & 0xFF]
                )
            elif c.ctype == ENUM:
                # transported as STRING with real_type=ENUM + pack size
                meta += bytes([ENUM, c.meta[0]])
        body += self._lenenc(len(meta)) + meta
        body += bytes((len(cols) + 7) // 8)              # nullability bitmap
        if self.with_names:
            # optional metadata: an unknown TLV first (signedness, type 1)
            # to exercise skip-by-length, then COLUMN_NAME (type 4)
            sig = bytes((len(cols) + 7) // 8)
            body += bytes([1]) + self._lenenc(len(sig)) + sig
            names = b"".join(
                self._lenenc(len(c.name.encode())) + c.name.encode()
                for c in cols
            )
            body += bytes([4]) + self._lenenc(len(names)) + names
        self._event(19, body)
        return tid

    # -- value encoders -------------------------------------------------------
    def _encode_value(self, c: Col, v) -> bytes:
        t = c.ctype
        if t == TINY:
            return struct.pack("<b", v)
        if t == SHORT:
            return struct.pack("<h", v)
        if t == INT24:
            return (v & 0xFFFFFF).to_bytes(3, "little")
        if t == LONG:
            return struct.pack("<i", v)
        if t == LONGLONG:
            return struct.pack("<q", v)
        if t == FLOAT:
            return struct.pack("<f", v)
        if t == DOUBLE:
            return struct.pack("<d", v)
        if t == YEAR:
            return bytes([0 if v == 0 else v - 1900])
        if t == DATE:
            y, m, d = v  # (year, month, day)
            return ((y << 9) | (m << 5) | d).to_bytes(3, "little")
        if t == DATETIME2:
            y, mo, d, h, mi, s, *rest = v
            micros = rest[0] if rest else 0
            packed = (1 << 39) | ((y * 13 + mo) << 22) | (d << 17) \
                | (h << 12) | (mi << 6) | s
            out = packed.to_bytes(5, "big")
            fsp = c.meta[0] if c.meta else 0
            nb = (fsp + 1) // 2
            if nb:
                out += (micros // 10 ** (6 - 2 * nb)).to_bytes(nb, "big")
            return out
        if t == TIMESTAMP2:
            secs, *rest = v if isinstance(v, tuple) else (v,)
            micros = rest[0] if rest else 0
            out = secs.to_bytes(4, "big")
            fsp = c.meta[0] if c.meta else 0
            nb = (fsp + 1) // 2
            if nb:
                out += (micros // 10 ** (6 - 2 * nb)).to_bytes(nb, "big")
            return out
        if t == TIME2:
            # tuple (h, m, s[, micros]) for non-negative times, or a signed
            # int of total microseconds (covers negative times, including
            # -0:00:00.x which a signed hour cannot express)
            fsp = c.meta[0] if c.meta else 0
            nb = (fsp + 1) // 2
            if isinstance(v, int):
                sign = -1 if v < 0 else 1
                secs, micros = divmod(abs(v), 1_000_000)
                h, m, sec = secs // 3600, secs // 60 % 60, secs % 60
            else:
                h, m, sec, *rest = v
                micros = rest[0] if rest else 0
                sign = 1
            hms = (h << 12) | (m << 6) | sec
            if nb == 3:  # fsp 5-6: one 6-byte quantity, micros included
                packed = sign * ((hms << 24) + micros)
                return (packed + 0x800000000000).to_bytes(6, "big")
            scaled = micros // 10 ** (6 - 2 * nb) if nb else 0
            # server encoding (my_time.c): int part stored as floor of the
            # signed packed value >> 24, fraction as the signed remainder's
            # two's-complement byte(s) — negative-with-fraction borrows
            if sign < 0 and scaled:
                intpart = -hms - 1
                fbytes = (0x100**nb) - scaled
            else:
                intpart = sign * hms
                fbytes = scaled
            out = (intpart + 0x800000).to_bytes(3, "big")
            if nb:
                out += fbytes.to_bytes(nb, "big")
            return out
        if t == VARCHAR:
            raw = v.encode("utf-8")
            pre = (bytes([len(raw)]) if c.meta[0] < 256
                   else struct.pack("<H", len(raw)))
            return pre + raw
        if t == BLOB:
            raw = v if isinstance(v, bytes) else v.encode("utf-8")
            return len(raw).to_bytes(c.meta[0], "little") + raw
        if t == NEWDECIMAL:
            return self._encode_decimal(v, *c.meta)
        if t == STRING:  # CHAR(n): same length-prefix rule as VARCHAR
            raw = v.encode("utf-8")
            pre = (bytes([len(raw)]) if c.meta[0] < 256
                   else struct.pack("<H", len(raw)))
            return pre + raw
        if t == ENUM:  # packed index, little-endian, meta[0] bytes
            return int(v).to_bytes(c.meta[0], "little")
        raise NotImplementedError(f"writer does not encode type {t}")

    @staticmethod
    def _encode_decimal(text: str, precision: int, scale: int) -> bytes:
        dig_bytes = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
        neg = text.startswith("-")
        text = text.lstrip("-")
        if "." in text:
            ip, fp = text.split(".")
        else:
            ip, fp = text, ""
        ip = ip.zfill(precision - scale)
        fp = fp.ljust(scale, "0")
        out = bytearray()
        int_full, int_rest = divmod(precision - scale, 9)
        if int_rest:
            out += int(ip[:int_rest] or "0").to_bytes(dig_bytes[int_rest], "big")
            ip = ip[int_rest:]
        for i in range(int_full):
            out += int(ip[i * 9 : i * 9 + 9]).to_bytes(4, "big")
        frac_full, frac_rest = divmod(scale, 9)
        for i in range(frac_full):
            out += int(fp[i * 9 : i * 9 + 9]).to_bytes(4, "big")
        if frac_rest:
            out += int(fp[frac_full * 9 :]).to_bytes(dig_bytes[frac_rest], "big")
        out[0] ^= 0x80
        if neg:
            for i in range(len(out)):
                out[i] ^= 0xFF
        return bytes(out)

    def _row_image(self, cols: list[Col], row: dict) -> bytes:
        nb = bytearray((len(cols) + 7) // 8)
        vals = b""
        for i, c in enumerate(cols):
            v = row.get(c.name)
            if v is None:
                nb[i // 8] |= 1 << (i % 8)
            else:
                vals += self._encode_value(c, v)
        return bytes(nb) + vals

    def _rows_event(self, etype_v1: int, tid: int, cols: list[Col],
                    images: list[bytes], n_bitmaps: int) -> None:
        etype = etype_v1 + (7 if self.v2 else 0)  # 23->30, 24->31, 25->32
        body = tid.to_bytes(6, "little") + struct.pack("<H", 1)
        if self.v2:
            body += struct.pack("<H", 2)  # extra data: just its own length
        body += self._lenenc(len(cols))
        present = bytearray((len(cols) + 7) // 8)
        for i in range(len(cols)):
            present[i // 8] |= 1 << (i % 8)
        body += bytes(present) * n_bitmaps
        body += b"".join(images)
        self._event(etype, body)

    def write_rows(self, schema, table, cols, rows: list[dict]) -> None:
        tid = self.table_map(schema, table, cols)
        self._rows_event(23, tid, cols,
                         [self._row_image(cols, r) for r in rows], 1)

    def delete_rows(self, schema, table, cols, rows: list[dict]) -> None:
        tid = self.table_map(schema, table, cols)
        self._rows_event(25, tid, cols,
                         [self._row_image(cols, r) for r in rows], 1)

    def update_rows(self, schema, table, cols,
                    pairs: list[tuple[dict, dict]]) -> None:
        tid = self.table_map(schema, table, cols)
        images = []
        for before, after in pairs:
            images.append(self._row_image(cols, before)
                          + self._row_image(cols, after))
        self._rows_event(24, tid, cols, images, 2)

    def flush(self) -> str:
        with open(self.path, "wb") as f:
            f.write(b"".join(self._buf))
        return self.path
