"""Local replica of the driver's correctness gate: run every catalog query on
Spark AND its oracle SQL on DuckDB over the same parquet, compare row count,
column names, and order-insensitive values.

Round-1 lesson: the driver's value hash canonicalizes DECIMAL rendering
differently per engine (trailing zeros), so this replica (a) compares floats
EXACTLY (repr, no rounding) and (b) rejects DECIMAL output columns outright —
every catalog query must render numeric results as DOUBLE/BIGINT/strings."""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

# default matches conftest.SF_ORACLE and the driver's own gate (sf0.01)
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

# catalog entries (the driver's 50-cap correctness gate) PLUS extra
# oracle-checked queries displaced from the cap (plans.queries.EXTRA_QUERIES)
# — the parity contract is identical for both
_ALL_QUERIES = dict(entry_mod.queries())
_ALL_ORACLES = dict(entry_mod.oracle_sql())
for _name, _spec in entry_mod._q.EXTRA_QUERIES.items():
    _ALL_QUERIES[_name] = _spec.spark_fn
    if _spec.oracle:
        _ALL_ORACLES[_name] = _spec.oracle
QUERY_NAMES = sorted(_ALL_QUERIES)
ORACLES = _ALL_ORACLES


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
        # exact: both engines must produce identical float64 bits
        return repr(v)
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


def test_no_decimal_output_columns(spark):
    """DECIMAL result columns hash differently per engine in the driver gate
    (round-1: 12 queries failed on exactly this) — forbid them repo-wide."""
    from pyspark.sql.types import DecimalType

    bad = []
    for name, fn in _ALL_QUERIES.items():
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, DecimalType):
                bad.append(f"{name}.{f.name}")
    assert not bad, f"DECIMAL output columns (driver hash hazard): {bad}"


def test_catalog_fits_driver_cap():
    """The driver records at most 50 correctness entries in registration
    order; every catalog query must land inside the cap."""
    assert len(entry_mod.queries()) <= 50


def test_oracle_queries_register_before_rows_only():
    names = list(entry_mod.queries())
    has_oracle = [n in ORACLES for n in names]
    first_rows_only = has_oracle.index(False) if False in has_oracle else len(names)
    assert all(not h for h in has_oracle[first_rows_only:]), (
        "oracle-bearing queries must register before rows-only ones"
    )


def test_no_hugeint_oracle_columns(ddb):
    """DuckDB SUM(INTEGER/BIGINT) returns HUGEINT (int128), which the driver's
    value hasher renders differently from Spark's BIGINT even when the values
    are equal (round-2: token_counts/text_quality failed on exactly this).
    The local fetchall() path hides it (Python ints compare equal), so check
    the declared oracle result types directly."""
    bad = []
    for name, sql in ORACLES.items():
        rel = ddb.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper() or "INT128" in str(typ).upper():
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, f"HUGEINT oracle columns (driver hash hazard): {bad}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    sdf = _ALL_QUERIES[name](spark, SF_DIR)
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
