"""SCD2 history builder: interval correctness, delete semantics, and the
equivalence contract with the as-of join over the same raw history."""

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.joins import asof_join
from sample_dms_kinesis_rds_mariadb_spark.operators.scd import (
    scd2_history,
    snapshot_at,
)


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def account_changes(spark):
    rows = [
        # account 7: insert -> update -> update
        (7, 100, "insert", "2024-01-01 00:00:00", 1),
        (7, 250, "update", "2024-01-03 00:00:00", 2),
        (7, 50, "update", "2024-01-05 00:00:00", 3),
        # account 8: insert -> delete -> re-insert (gap between intervals)
        (8, 900, "insert", "2024-01-02 00:00:00", 4),
        (8, None, "delete", "2024-01-04 00:00:00", 5),
        (8, 111, "insert", "2024-01-06 00:00:00", 6),
    ]
    return spark.createDataFrame(
        [(a, b, op, _ts(t), s) for a, b, op, t, s in rows],
        "account_id int, balance int, op string, ts timestamp, seq long",
    )


def test_scd2_intervals_and_deletes(account_changes):
    hist = scd2_history(
        account_changes, "account_id", ts_col="ts", op_col="op", seq_col="seq"
    )
    got = {
        (r["account_id"], r["valid_from"]): (
            r["balance"],
            r["valid_to"],
            r["is_current"],
        )
        for r in hist.collect()
    }
    assert len(got) == 5  # delete closes an interval, emits no version
    assert got[(7, _ts("2024-01-01 00:00:00"))] == (
        100, _ts("2024-01-03 00:00:00"), False,
    )
    assert got[(7, _ts("2024-01-03 00:00:00"))] == (
        250, _ts("2024-01-05 00:00:00"), False,
    )
    assert got[(7, _ts("2024-01-05 00:00:00"))] == (50, None, True)
    # delete at 01-04 closes the first account-8 interval; the re-insert
    # opens a NEW chain — the 01-04..01-06 gap has no version at all
    assert got[(8, _ts("2024-01-02 00:00:00"))] == (
        900, _ts("2024-01-04 00:00:00"), False,
    )
    assert got[(8, _ts("2024-01-06 00:00:00"))] == (111, None, True)


def test_scd2_snapshot_semantics(account_changes):
    hist = scd2_history(
        account_changes, "account_id", ts_col="ts", op_col="op", seq_col="seq"
    )
    def snap(t):
        return {
            r["account_id"]: r["balance"]
            for r in snapshot_at(hist, _ts(t)).collect()
        }
    assert snap("2024-01-02 12:00:00") == {7: 100, 8: 900}
    assert snap("2024-01-03 00:00:00") == {7: 250, 8: 900}  # boundary: >=
    assert snap("2024-01-04 12:00:00") == {7: 250}          # 8 deleted
    assert snap("2024-01-07 00:00:00") == {7: 50, 8: 111}
    assert snap("2023-12-31 00:00:00") == {}


def test_scd2_matches_asof_over_raw_history(spark, account_changes):
    """Contract: probing the SCD2 table by interval membership must agree
    with the backward as-of join over the raw (non-deleted) history — the
    two time-travel paths the engine offers answer identically wherever a
    version exists."""
    hist = scd2_history(
        account_changes, "account_id", ts_col="ts", op_col="op", seq_col="seq"
    )
    raw = account_changes.filter(F.col("op") != "delete").select(
        "account_id", F.col("ts").alias("valid_from"), "balance"
    )
    probes = spark.createDataFrame(
        [
            (i, acct, _ts(t))
            for i, (acct, t) in enumerate(
                [
                    (7, "2024-01-02 00:00:00"),
                    (7, "2024-01-05 00:00:00"),
                    (8, "2024-01-03 00:00:00"),
                    (8, "2024-01-07 00:00:00"),
                    (9, "2024-01-03 00:00:00"),  # unknown key
                ]
            )
        ],
        "pid int, account_id int, ts timestamp",
    )
    via_asof = {
        r["pid"]: r["asof"]["balance"] if r["asof"] else None
        for r in asof_join(
            probes, raw, on="account_id", ts="ts", build_ts="valid_from"
        ).collect()
    }
    via_scd2 = {
        r["pid"]: r["balance"]
        for r in probes.join(
            hist,
            on=[
                probes["account_id"] == hist["account_id"],
                hist["valid_from"] <= probes["ts"],
                hist["valid_to"].isNull() | (hist["valid_to"] > probes["ts"]),
            ],
            how="left",
        ).collect()
    }
    # where SCD2 has no covering interval (delete gap / unknown key) the
    # as-of differs by design ONLY on the delete gap: as-of over raw history
    # has no delete knowledge. Compare on the covered probes.
    assert via_scd2[0] == via_asof[0] == 100
    assert via_scd2[1] == via_asof[1] == 50  # boundary probe: inclusive
    assert via_scd2[2] == via_asof[2] == 900
    assert via_scd2[3] == via_asof[3] == 111
    assert via_scd2[4] is None and via_asof[4] is None


def test_scd2_single_shuffle_plan(account_changes):
    plan = _plan_of(
        scd2_history(
            account_changes, "account_id", ts_col="ts", op_col="op", seq_col="seq"
        )
    )
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) == 1


def test_scd2_column_collision_raises(spark, account_changes):
    bad = account_changes.withColumn("valid_to", F.lit(1))
    with pytest.raises(ValueError, match="collision"):
        scd2_history(bad, "account_id", ts_col="ts")


def test_scd2_tie_break_zero_length_interval(spark):
    """Two changes at the same instant: the later sequence wins the instant;
    the earlier tied row's interval is zero-length and never selected."""
    changes = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00"), 1),
            (1, 20, _ts("2024-01-01 00:00:00"), 2),
        ],
        "k int, v int, ts timestamp, seq long",
    )
    hist = scd2_history(changes, "k", ts_col="ts", seq_col="seq")
    rows = {r["v"]: r for r in hist.collect()}
    assert rows[10]["valid_to"] == _ts("2024-01-01 00:00:00")  # zero-length
    assert rows[20]["valid_to"] is None and rows[20]["is_current"]
    got = snapshot_at(hist, _ts("2024-01-01 00:00:00")).collect()
    assert [r["v"] for r in got] == [20]


def test_scd2_randomized_matches_python_reference(spark):
    """Randomized parity: SCD2 over random change streams must equal an
    independent per-key Python fold (sort by (ts, seq); valid_to = next
    change's ts; deletes close without emitting)."""
    import random

    rng = random.Random(20240814)
    rows = []
    for seq in range(300):
        k = rng.randrange(12)
        ts = _ts("2024-01-01 00:00:00").replace(
            day=1 + rng.randrange(28), hour=rng.randrange(24)
        )
        op = rng.choice(["insert", "update", "update", "delete"])
        v = None if op == "delete" else rng.randrange(1000)
        rows.append((k, v, op, ts, seq))

    expected = set()
    by_key = {}
    for k, v, op, ts, seq in rows:
        by_key.setdefault(k, []).append((ts, seq, op, v))
    for k, evs in by_key.items():
        evs.sort()
        for i, (ts, seq, op, v) in enumerate(evs):
            if op == "delete":
                continue
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            expected.add((k, v, ts, nxt, nxt is None))

    df = spark.createDataFrame(
        rows, "k int, v int, op string, ts timestamp, seq long"
    )
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, "k", ts_col="ts", op_col="op", seq_col="seq").collect()
    }
    assert got == expected


def test_scd2_join_covers_open_and_closed_intervals(spark, account_changes):
    """The fact-to-dimension join: CURRENT versions (open intervals) must
    match — feeding the SCD2 table to range_join directly would silently
    drop them via the NULL-bound rule."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.scd import scd2_join

    hist = scd2_history(
        account_changes, "account_id", ts_col="ts", op_col="op", seq_col="seq"
    )
    probes = spark.createDataFrame(
        [
            (0, 7, _ts("2024-01-02 00:00:00")),  # closed interval -> 100
            (1, 7, _ts("2024-01-06 00:00:00")),  # OPEN interval -> 50
            (2, 8, _ts("2024-01-05 00:00:00")),  # delete gap -> no row
            (3, 8, _ts("2024-01-07 00:00:00")),  # open after re-insert -> 111
            (4, 9, _ts("2024-01-07 00:00:00")),  # unknown key -> no row
        ],
        "pid int, account_id int, ts timestamp",
    )
    out = scd2_join(probes, hist, on="account_id", ts="ts")
    got = {r["pid"]: r["balance"] for r in out.collect()}
    assert got == {0: 100, 1: 50, 3: 111}


def test_scd2_join_randomized_matches_snapshot(spark):
    """Property: for every probe, scd2_join's match equals the
    snapshot_at interval lookup at that instant."""
    import random

    from sample_dms_kinesis_rds_mariadb_spark.operators.scd import (
        scd2_join,
        snapshot_at,
    )

    rng = random.Random(99)
    changes = []
    for seq in range(120):
        changes.append(
            (
                rng.randrange(6),
                rng.randrange(1000),
                rng.choice(["insert", "update", "update", "delete"]),
                _ts("2024-01-01 00:00:00").replace(
                    day=1 + rng.randrange(28), hour=rng.randrange(24)
                ),
                seq,
            )
        )
    df = spark.createDataFrame(
        [(k, None if op == "delete" else v, op, t, s) for k, v, op, t, s in changes],
        "k int, v int, op string, ts timestamp, seq long",
    )
    hist = scd2_history(df, "k", ts_col="ts", op_col="op", seq_col="seq")
    probes = [
        (i, rng.randrange(7),
         _ts("2024-01-01 00:00:00").replace(
             day=1 + rng.randrange(28), hour=rng.randrange(24)))
        for i in range(40)
    ]
    pdf = spark.createDataFrame(probes, "pid int, k int, ts timestamp")
    got = {
        r["pid"]: r["v"]
        for r in scd2_join(pdf, hist, on="k", ts="ts", bucket_seconds=3600).collect()
    }
    for pid, k, t in probes:
        want = {r["k"]: r["v"] for r in snapshot_at(hist, t).collect()}.get(k)
        assert got.get(pid) == want, (pid, k, t, got.get(pid), want)


def test_scd2_null_op_is_upsert_not_silent_drop(spark):
    """A NULL op must emit a version (upsert semantics) — a bare NOT-isin
    filter would drop it while lead() still closed the prior interval,
    leaving a hole where a live version belongs."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.scd import (
        scd2_history,
        snapshot_at,
    )

    rows = [
        (1, "a", 100, "insert"),
        (1, "b", 200, None),      # glitched/sparse op column
        (1, "c", 300, "update"),
    ]
    df = spark.createDataFrame(rows, "k int, v string, ts long, op string")
    hist = scd2_history(df, "k", "ts", op_col="op").collect()
    assert len(hist) == 3
    by_from = {r["valid_from"]: r for r in hist}
    assert by_from[100]["valid_to"] == 200
    assert by_from[200]["v"] == "b" and by_from[200]["valid_to"] == 300
    snap = snapshot_at(
        scd2_history(df, "k", "ts", op_col="op"), 250
    ).collect()
    assert [r["v"] for r in snap] == ["b"]
