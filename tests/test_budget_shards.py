"""Token-budget shard packing and per-group caps: row-exact parity with
pure-Python references plus the packing invariants a loader relies on."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
    budget_shard_column,
    write_budget_shards,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import cap_per_group


def _docs(spark, n=500, seed=11):
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 400)) for i in range(n)]
    # scrambled input order: the packer must sort by order_col itself
    rng.shuffle(rows)
    return rows, spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(7)


def _reference_shards(rows, budget):
    want, acc = {}, 0
    for doc_id, size in sorted(rows):
        want[doc_id] = acc // budget
        acc += size
    return want


@pytest.mark.parametrize("budget", [1000, 137])
def test_budget_shards_match_python_reference(spark, budget):
    rows, df = _docs(spark)
    got = {
        r["doc_id"]: r["shard"]
        for r in budget_shard_column(
            df, "n_tokens", budget, "doc_id", n_partitions=5
        ).collect()
    }
    assert got == _reference_shards(rows, budget)


def test_budget_shards_invariants(spark):
    rows, df = _docs(spark, n=300, seed=3)
    budget = 777
    out = budget_shard_column(df, "n_tokens", budget, "doc_id", n_partitions=4)
    data = sorted((r["doc_id"], r["n_tokens"], r["shard"]) for r in out.collect())
    # shard ids non-decreasing in order_col order
    shards = [s for _, _, s in data]
    assert shards == sorted(shards)
    # a shard never exceeds budget + its last row's size
    totals, last_size = {}, {}
    for _, size, s in data:
        totals[s] = totals.get(s, 0) + size
        last_size[s] = size
    for s, t in totals.items():
        assert t <= budget + last_size[s]
    # no row is wider than the budget here, so ids are gap-free and the
    # shard count is exactly ceil(total/budget)
    total = sum(sz for _, sz, _ in data)
    assert sorted(totals) == list(range(math.ceil(total / budget)))


def test_budget_shards_oversized_row_owns_shard(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 5000), (3, 10), (4, 10)], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in budget_shard_column(df, "n_tokens", 100, "doc_id").collect()
    }
    assert got == _reference_shards([(1, 10), (2, 5000), (3, 10), (4, 10)], 100)
    # the giant doc stays whole in the shard where it starts; numbering then
    # jumps past the ids its width covers (gap: shards 1..49 don't exist)
    assert got[2] == 0 and got[3] == 50


def test_budget_shards_null_sizes_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 60), (3, None), (4, 60)], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in budget_shard_column(df, "n_tokens", 100, "doc_id").collect()
    }
    # NULLs count as 0: cumulative before doc 4 is 60 < 100, one shard total
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}
    with pytest.raises(ValueError):
        budget_shard_column(df, "n_tokens", 0, "doc_id")


def test_write_budget_shards_manifest(spark, tmp_path):
    rows, df = _docs(spark, n=200, seed=5)
    path = str(tmp_path / "packed")
    budget = 2000
    manifest = write_budget_shards(df, path, "n_tokens", budget, "doc_id")
    want = _reference_shards(rows, budget)
    sizes = dict(rows)
    want_rows, want_tok = {}, {}
    for doc_id, s in want.items():
        want_rows[str(s)] = want_rows.get(str(s), 0) + 1
        want_tok[str(s)] = want_tok.get(str(s), 0) + sizes[doc_id]
    assert manifest["shard_rows"] == want_rows
    assert manifest["shard_sizes"] == want_tok
    assert manifest["total_rows"] == len(rows)
    assert manifest["total_size"] == sum(sizes.values())
    back = spark.read.parquet(path)
    assert back.count() == len(rows)
    # shard dirs hold the assigned rows
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == want


def _ref_cap_rank(key: str, salt: str) -> tuple[int, str]:
    hx = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
    return int(hx[:8], 16) % 1_000_000, key


def test_cap_per_group_matches_python_reference(spark):
    rng = random.Random(9)
    rows = [(f"d{i}", f"src{rng.randint(0, 4)}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    n = 30
    got = sorted(
        (r["doc_id"], r["source"])
        for r in cap_per_group(df, "doc_id", "source", n).collect()
    )
    by_src: dict[str, list[str]] = {}
    for k, s in rows:
        by_src.setdefault(s, []).append(k)
    want = sorted(
        (k, s)
        for s, keys in by_src.items()
        for k in sorted(keys, key=lambda k: _ref_cap_rank(k, "cap"))[:n]
    )
    assert got == want
    # groups under the cap keep everything
    small = cap_per_group(df, "doc_id", "source", 10_000)
    assert small.count() == len(rows)


def test_cap_per_group_deterministic_and_validated(spark):
    rows = [(f"d{i}", "s") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(r["doc_id"] for r in cap_per_group(df, "doc_id", "source", 7).collect())
    b = sorted(r["doc_id"] for r in cap_per_group(df, "doc_id", "source", 7).collect())
    assert a == b and len(a) == 7
    with pytest.raises(ValueError):
        cap_per_group(df, "doc_id", "source", -1)
