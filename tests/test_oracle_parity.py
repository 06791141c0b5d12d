"""Local replica of the driver's correctness gate: run every catalog query on
Spark AND its oracle SQL on DuckDB over the same parquet, compare row count,
column names, and order-insensitive values (normalized)."""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

QUERY_NAMES = sorted(entry_mod.queries().keys())
ORACLES = entry_mod.oracle_sql()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entry_mod._q.TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    if name not in ORACLES:
        # rows-only contract: runs and returns a stable schema
        assert len(srows) >= 0
        assert scols
        return

    rel = ddb.sql(ORACLES[name])
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    sset = sorted((tuple(_norm(r[i]) for i in sidx) for r in srows), key=key)
    dset = sorted((tuple(_norm(r[i]) for i in didx) for r in drows), key=key)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
