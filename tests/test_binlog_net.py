"""Binlog over TCP: the replication-protocol client (sources/binlog_net)
against an INDEPENDENT fake server (tests/fake_mysql_server — the server
half of the public protocol, written from the spec, streaming fixture
binlogs produced by the independent file writer). Round-trip contract:
the spooled files are BYTE-IDENTICAL to the server's own logs, so one
decoder serves both transports."""

from __future__ import annotations

import os

import pytest

from sample_dms_kinesis_rds_mariadb_spark.sources.binlog import (
    BinlogTail,
    decode_binlog,
)
from sample_dms_kinesis_rds_mariadb_spark.sources.binlog_net import (
    BinlogDumpClient,
    BinlogSpool,
    ServerError,
    native_password_scramble,
)
from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import ChangeFeed
from tests.binlog_writer import LONG, VARCHAR, BinlogWriter, Col

COLS = [Col("id", LONG), Col("v", VARCHAR, (40,))]


def _write_chain(srv_dir, checksum=True):
    """Two-file rotated chain: 3 committed txns spanning the rotation."""
    os.makedirs(srv_dir, exist_ok=True)
    f1 = os.path.join(srv_dir, "bin.000001")
    f2 = os.path.join(srv_dir, "bin.000002")
    w1 = BinlogWriter(f1, checksum=checksum)
    w1.begin("db")
    w1.write_rows("db", "t", COLS, [{"id": 1, "v": "one"}])
    w1.xid()
    w1.begin("db")
    w1.update_rows("db", "t", COLS,
                   [({"id": 1, "v": "one"}, {"id": 1, "v": "uno"})])
    w1.xid()
    w1.rotate("bin.000002")
    w1.flush()
    w2 = BinlogWriter(f2, checksum=checksum)
    w2.begin("db")
    w2.write_rows("db", "t", COLS, [{"id": 2, "v": "two"}, {"id": 3, "v": "three"}])
    w2.xid()
    w2.flush()
    return f1, f2


@pytest.fixture
def server(tmp_path):
    from tests.fake_mysql_server import FakeMySQLServer

    srv_dir = str(tmp_path / "server-binlogs")
    _write_chain(srv_dir)
    srv = FakeMySQLServer(srv_dir, user="repl", password="s3cret")
    yield srv, srv_dir
    srv.close()


def test_scramble_is_the_published_formula():
    """mysql_native_password against a hand-computed vector."""
    import hashlib

    scramble = bytes(range(20))
    pw = "s3cret"
    sha_pw = hashlib.sha1(pw.encode()).digest()
    want = bytes(
        a ^ b
        for a, b in zip(
            sha_pw,
            hashlib.sha1(scramble + hashlib.sha1(sha_pw).digest()).digest(),
        )
    )
    assert native_password_scramble(pw, scramble) == want
    assert native_password_scramble("", scramble) == b""


def test_dump_spools_byte_identical_files(server, tmp_path):
    srv, srv_dir = server
    spool_dir = str(tmp_path / "spool")
    with BinlogDumpClient("127.0.0.1", srv.port, "repl", "s3cret") as c:
        c.connect()
        c.query_ok("SET @master_binlog_checksum= 'CRC32'")
        c.register_slave()
        n = BinlogSpool(spool_dir).run(c, "bin.000001", 4)
    assert n > 0
    assert srv.queries == ["SET @master_binlog_checksum= 'CRC32'"]
    assert srv.registered == [1234]
    for fname in ("bin.000001", "bin.000002"):
        with open(os.path.join(srv_dir, fname), "rb") as f:
            want = f.read()
        with open(os.path.join(spool_dir, fname), "rb") as f:
            got = f.read()
        assert got == want, f"{fname} not byte-identical"
    # one decoder, two transports: records identical
    recs, _ = decode_binlog(os.path.join(spool_dir, "bin.000001"))
    assert [r["op"] for r in recs] == ["insert", "update"]
    recs2, _ = decode_binlog(os.path.join(spool_dir, "bin.000002"))
    assert [r["data"]["id"] for r in recs2] == ["2", "3"]


def test_spooled_chain_drives_binlog_tail(server, tmp_path, spark):
    """End-to-end: network dump → spool → the EXISTING BinlogTail file
    machinery replays the chain into a ChangeFeed across the rotation."""
    srv, _srv_dir = server
    spool_dir = str(tmp_path / "spool")
    with BinlogDumpClient("127.0.0.1", srv.port, "repl", "s3cret") as c:
        c.connect()
        BinlogSpool(spool_dir).run(c, "bin.000001", 4)
    feed = ChangeFeed(spark, str(tmp_path / "feed"))
    tail = BinlogTail(
        os.path.join(spool_dir, "bin.000001"),
        state_path=str(tmp_path / "tail.state"),
    )
    total = 0
    for _ in range(4):
        total += tail.pump(feed)
    assert total == 4  # insert + update + 2 inserts, across the rotate
    rows = feed.read_batch().collect()
    assert sorted(r["data"]["id"] for r in rows if r["op"] == "insert") == [
        "1", "2", "3",
    ]
    upd = [r for r in rows if r["op"] == "update"]
    assert len(upd) == 1 and upd[0]["before"]["v"] == "one"


def test_mid_file_resume_over_the_wire(server, tmp_path):
    """Dump from a committed mid-file offset: the server replays the FDE
    (checksum algorithm) then events >= pos; the spooled tail file decodes
    to exactly the remaining records."""
    srv, srv_dir = server
    orig = os.path.join(srv_dir, "bin.000001")
    # resume offset: the second transaction's BEGIN event (QUERY body:
    # 13 fixed bytes, zero status vars, schema, NUL, sql)
    from tests.fake_mysql_server import _file_events

    begins = [
        off for off, ev in _file_events(orig)
        if ev[4] == 2 and ev[19 + 13 :].split(b"\x00", 1)[1][:5] == b"BEGIN"
    ]
    resume = begins[1]
    spool_dir = str(tmp_path / "spool-resume")
    with BinlogDumpClient("127.0.0.1", srv.port, "repl", "s3cret") as c:
        c.connect()
        BinlogSpool(spool_dir).run(c, "bin.000001", resume)
    recs, _ = decode_binlog(os.path.join(spool_dir, "bin.000001"))
    assert [r["op"] for r in recs] == ["update"]
    assert recs[0]["before"] == {"id": "1", "v": "one"}


def test_wrong_password_rejected(server, tmp_path):
    srv, _ = server
    with BinlogDumpClient("127.0.0.1", srv.port, "repl", "wrong") as c:
        with pytest.raises(ServerError, match="Access denied"):
            c.connect()


def test_checksumless_chain_round_trips(tmp_path):
    from tests.fake_mysql_server import FakeMySQLServer

    srv_dir = str(tmp_path / "nockshum")
    _write_chain(srv_dir, checksum=False)
    srv = FakeMySQLServer(srv_dir, user="repl", password="")
    try:
        spool_dir = str(tmp_path / "spool")
        with BinlogDumpClient("127.0.0.1", srv.port, "repl", "") as c:
            c.connect()
            BinlogSpool(spool_dir).run(c, "bin.000001", 4)
        for fname in ("bin.000001", "bin.000002"):
            with open(os.path.join(srv_dir, fname), "rb") as f:
                want = f.read()
            with open(os.path.join(spool_dir, fname), "rb") as f:
                assert f.read() == want, fname
    finally:
        srv.close()
