"""Deterministic synthetic-testdata generator (TPC-H-ish star schema +
events/documents/embeddings), structurally matching the tables described in
TESTDATA.md so the test suite and bench can run on any machine (CI included).

    python tools/make_testdata.py --sf 0.001 --out testdata/sf0.001

Schemas and row-count formulas mirror the driver-generated data (seed=42,
sf0.001 -> customer 150, orders 1500, lineitem ~6000, events 1000,
documents 500, embeddings 500); values are NOT byte-identical to the
driver's files — correctness tests compare Spark vs DuckDB on the *same*
parquet, so only shape and distributions matter. Pure pyarrow/numpy: no
Spark needed to generate.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURN_FLAGS = ["A", "N", "R"]
LINE_STATUSES = ["F", "O"]
PART_SIZES = ["small", "large", "cold", "hot", "big"]
PART_NOUNS = ["widget", "bolt", "gear", "pin", "valve"]
PART_TYPES = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_WEIGHTS = [0.38, 0.17, 0.16, 0.14, 0.15]
VOCAB = (
    "the a spark table scan join order sort merge hash key row column data "
    "value filter group agg window batch stream query part line customer "
    "small big fast slow vector dup"
).split()

DAY_NS = 86_400_000_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def make_dims(out: str) -> None:
    _write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )


def make_customer(rng, out: str, n: int) -> None:
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
                "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n), 2),
                "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n)],
            }
        ),
    )


def make_supplier(rng, out: str, n: int) -> None:
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n), 2),
            }
        ),
    )


def make_part(rng, out: str, n: int) -> None:
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n), pa.int64()),
                "p_name": [
                    f"{PART_SIZES[a]} {PART_NOUNS[b]}"
                    for a, b in zip(rng.integers(0, 5, n), rng.integers(0, 5, n))
                ],
                "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n)],
                "p_type": [PART_TYPES[i] for i in rng.integers(0, 5, n)],
                "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n), 2),
            }
        ),
    )


def make_orders_lineitem(rng, out: str, n_orders: int, n_cust: int, n_part: int, n_supp: int) -> None:
    base = np.datetime64("2022-01-01", "ns").astype(np.int64)
    o_date_ns = base + rng.integers(0, 365 * 3, n_orders) * DAY_NS
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(n_orders), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
            "o_orderstatus": [STATUSES[i] for i in rng.choice(3, n_orders, p=[0.48, 0.48, 0.04])],
            "o_totalprice": np.round(rng.uniform(1000.0, 400000.0, n_orders), 2),
            "o_orderdate": pa.array(o_date_ns // 1000, pa.timestamp("us")),
            "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)],
        }
    )
    _write(out, "orders", orders)

    lines_per = rng.integers(1, 8, n_orders)  # mean ~4 lines/order
    okeys = np.repeat(np.arange(n_orders), lines_per)
    n_li = len(okeys)
    lineno = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    ship_ns = np.repeat(o_date_ns, lines_per) + rng.integers(1, 120, n_li) * DAY_NS
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2)
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(lineno, pa.int32()),
                "l_quantity": qty,
                "l_extendedprice": price,
                "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
                "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
                "l_returnflag": [RETURN_FLAGS[i] for i in rng.integers(0, 3, n_li)],
                "l_linestatus": [LINE_STATUSES[i] for i in rng.integers(0, 2, n_li)],
                "l_shipdate": pa.array(ship_ns // 1000, pa.timestamp("us")),
            }
        ),
    )


def make_events(rng, out: str, n: int) -> None:
    base = np.datetime64("2024-01-01", "ns").astype(np.int64)
    ts_ns = base + np.sort(rng.integers(0, 30 * DAY_NS, n))
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                # TIMESTAMP(NANOS) on purpose: the driver's events table is
                # ns-precision, which exercises load_table's ns->µs path
                "ts": pa.array(ts_ns, pa.timestamp("ns")),
                "user_id": pa.array(rng.integers(0, max(1, n // 10), n), pa.int64()),
                "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n)],
                "value": np.round(rng.uniform(0.0, 100.0, n), 4),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)],
            }
        ),
    )


def make_documents(rng, out: str, n: int) -> None:
    texts: list[str] = []
    for _ in range(n):
        k = int(rng.integers(15, 120))
        texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), k)))
    # dedup structure: ~8% exact duplicates, ~8% near-duplicates (one token
    # substituted) so exact/MinHash/SimHash pipelines have positives to find
    for i in range(n):
        r = rng.random()
        if i and r < 0.08:
            texts[i] = texts[int(rng.integers(0, i))]
        elif i and r < 0.16:
            toks = texts[int(rng.integers(0, i))].split()
            toks[int(rng.integers(0, len(toks)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts[i] = " ".join(toks)
    langs = [LANGS[i] for i in rng.choice(5, n, p=LANG_WEIGHTS)]
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": [f"src{int(i)}" for i in rng.integers(0, 20, n)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )


def make_embeddings(rng, out: str, n: int, dim: int = 64) -> None:
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    # near-dup structure: ~10% of vectors are small perturbations of an
    # earlier one, so ANN/near-dup queries have true neighbors
    for i in range(1, n):
        if rng.random() < 0.1:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, n), pa.int32()),
            }
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    sf = args.sf

    n_cust = max(1, int(150_000 * sf))
    n_supp = max(1, int(10_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_orders = max(1, int(1_500_000 * sf))

    make_dims(args.out)
    make_customer(rng, args.out, n_cust)
    make_supplier(rng, args.out, n_supp)
    make_part(rng, args.out, n_part)
    make_orders_lineitem(rng, args.out, n_orders, n_cust, n_part, n_supp)
    make_events(rng, args.out, max(1, int(1_000_000 * sf)))
    make_documents(rng, args.out, max(1, int(500_000 * sf)))
    make_embeddings(rng, args.out, max(1, int(500_000 * sf)))


if __name__ == "__main__":
    main()
