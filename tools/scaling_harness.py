"""Scaling-curve harness (VERDICT r12 item 8): measure candidate-pair
counts and wall time for the bucketed dedup/ANN family at three corpus
scales — sf0.01, sf0.1, and a synthetic sf1 (sf0.1 widened 10x) — so
the family's sub-quadratic claims are measured curves rather than
bucketing arithmetic. Writes ``scaling_record.json`` at the repo root;
bench.py embeds the committed record into bench_full.json's
``scaling`` block each run.

Why the synthetic sf1 is a fair scale-up and not a degenerate one:
naive replication makes every replica of a document an exact/near
duplicate of its siblings, so candidate pairs grow quadratically in
the replication factor — a replication ARTIFACT, not corpus growth.
Each replica k therefore decorrelates from the others while keeping
its internal near-dup structure identical to the base corpus:

* text replicas suffix every whitespace token with ``_k`` — the
  within-replica shingle relationships are exactly those of sf0.1,
  while cross-replica shingle sets are disjoint;
* embedding replicas circularly rotate each vector by 7k dimensions —
  within-replica cosine geometry is EXACTLY preserved (rotation is an
  isometry applied uniformly), cross-replica cosines are those of
  unrelated vectors;
* MIH fingerprints re-run the bench's planted-duplicate generator at
  10x rows (the generator's duplicate density is row-count-invariant).

Expected shape if the operators are sub-quadratic: pairs and seconds
grow ~linearly with rows (10x per step), against the 100x-per-step
quadratic reference. The record stores both so the verdict is
readable off the artifact.

Usage: python tools/scaling_harness.py  (quiet box recommended)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sample_dms_kinesis_rds_mariadb_spark.operators import (  # noqa: E402
    image_dedup,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidate_pairs,
    simhash_near_pairs,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (  # noqa: E402,E501
    semantic_dedup_pairs,
)
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import (  # noqa: E402
    load_table,
)
from sample_dms_kinesis_rds_mariadb_spark.session import (  # noqa: E402
    get_session,
    widen_small_input,
)

REPLICAS = 10
EMB_DIM = 64


def _widen_docs(docs: DataFrame, max_id: int) -> DataFrame:
    """sf0.1 documents x10, replica-decorrelated text (see module doc)."""
    parts = [docs]
    for k in range(1, REPLICAS):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x, k=k: F.concat(x, F.lit(f"_{k}")),
            ),
            " ",
        )
        parts.append(docs.select(
            (F.col("doc_id") + (max_id + 1) * k).alias("doc_id"),
            suffixed.alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        ).select(docs.columns))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32)


def _widen_embeddings(emb: DataFrame, max_id: int) -> DataFrame:
    """sf0.1 embeddings x10, each replica circularly rotated 7k dims."""
    parts = [emb]
    for k in range(1, REPLICAS):
        rot = (7 * k) % EMB_DIM
        rotated = F.concat(
            F.slice(F.col("embedding"), rot + 1, EMB_DIM - rot),
            F.slice(F.col("embedding"), 1, rot),
        )
        parts.append(emb.select(
            (F.col("vec_id") + (max_id + 1) * k).alias("vec_id"),
            rotated.alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        ).select(emb.columns))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32)


def _mih_fps(spark, n: int) -> DataFrame:
    """The bench leg's planted-duplicate fingerprint generator at n rows
    (groups of 8: seven exact dups + one hamming-1 neighbor)."""
    base_fp = F.conv(
        F.substring(F.md5((F.col("id") / 8).cast("long").cast("string")),
                    1, 15), 16, 10,
    ).cast("long")
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.when(
                F.col("id") % 8 == 0,
                base_fp.bitwiseXOR(
                    F.expr("shiftleft(1L, cast(id % 61 AS INT))")
                ),
            ).otherwise(base_fp).alias("dhash"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def _measure(fn) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = fn()
    return n, round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_session(app_name="scaling-harness")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm up

    record: dict = {
        "replicas": REPLICAS,
        "note": (
            "synthetic sf1 = sf0.1 x10 with replica-decorrelated "
            "text/embeddings; quadratic reference = n*(n-1)/2"
        ),
        "loadavg_start": list(os.getloadavg()),
        "git_head": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip(),
        "operators": {},
    }

    # --- corpora ---------------------------------------------------------
    corpora: dict[str, DataFrame] = {}
    for sf in ("0.01", "0.1"):
        corpora[f"sf{sf}"] = widen_small_input(
            load_table(spark, f"/root/testdata/sf{sf}", "documents")
        ).select("doc_id", "text").localCheckpoint(eager=True)
    base = corpora["sf0.1"]
    max_id = base.agg(F.max("doc_id")).collect()[0][0]
    corpora["sf1-synth"] = _widen_docs(
        base, max_id
    ).localCheckpoint(eager=True)

    embs: dict[str, DataFrame] = {}
    for sf in ("0.01", "0.1"):
        embs[f"sf{sf}"] = widen_small_input(
            load_table(spark, f"/root/testdata/sf{sf}", "embeddings")
        ).localCheckpoint(eager=True)
    emb_max = embs["sf0.1"].agg(F.max("vec_id")).collect()[0][0]
    embs["sf1-synth"] = _widen_embeddings(
        embs["sf0.1"], emb_max
    ).localCheckpoint(eager=True)

    # --- text dedup curves ----------------------------------------------
    for name, fn in (
        ("minhash_lsh", lambda df: minhash_lsh_candidate_pairs(
            df, "doc_id", "text").count()),
        ("simhash", lambda df: simhash_near_pairs(
            df, "doc_id", "text").count()),
    ):
        points = []
        for scale, df in corpora.items():
            n_docs = df.count()
            pairs, sec = _measure(lambda df=df, fn=fn: fn(df))
            points.append({
                "scale": scale, "rows": n_docs, "pairs": pairs,
                "sec": sec, "quadratic_pairs": n_docs * (n_docs - 1) // 2,
            })
            print(f"{name} {scale}: rows={n_docs} pairs={pairs} "
                  f"sec={sec}", file=sys.stderr)
        record["operators"][name] = points

    # --- semantic (SemDeDup buckets) -------------------------------------
    # threshold 0.4 matches the catalog's testdata calibration; n_lists
    # scales with rows to hold per-list occupancy ~constant — the
    # documented 100 TB posture (a FIXED list count makes the per-list
    # quadratic grow with n², which is an operating error, not an
    # operator property; the curve below measures the operated shape)
    points = []
    for scale, df in embs.items():
        n_rows = df.count()
        n_lists = max(16, n_rows // 125)
        pairs, sec = _measure(
            lambda df=df, nl=n_lists: semantic_dedup_pairs(
                df, threshold=0.4, n_lists=nl).count()
        )
        points.append({
            "scale": scale, "rows": n_rows, "pairs": pairs, "sec": sec,
            "quadratic_pairs": n_rows * (n_rows - 1) // 2,
        })
        print(f"semantic {scale}: rows={n_rows} pairs={pairs} sec={sec}",
              file=sys.stderr)
    record["operators"]["semantic_dedup"] = points

    # --- MIH hamming self-join -------------------------------------------
    points = []
    for scale, n in (("sf0.01-like", 5_000), ("sf0.1-like", 50_000),
                     ("sf1-like", 500_000)):
        fps = _mih_fps(spark, n)
        pairs, sec = _measure(
            lambda fps=fps: image_dedup.banded_hamming_pairs(
                fps, max_hamming=7).count()
        )
        points.append({
            "scale": scale, "rows": n, "pairs": pairs, "sec": sec,
            "quadratic_pairs": n * (n - 1) // 2,
        })
        print(f"mih {scale}: rows={n} pairs={pairs} sec={sec}",
              file=sys.stderr)
    record["operators"]["mih_hamming"] = points

    record["loadavg_end"] = list(os.getloadavg())
    # growth summary: rows step is ~10x; sub-quadratic operators should
    # show sec/pairs growth far below the 100x quadratic reference
    for name, points in record["operators"].items():
        growth = []
        for a, b in zip(points, points[1:]):
            growth.append({
                "rows_x": round(b["rows"] / max(a["rows"], 1), 1),
                "pairs_x": round(b["pairs"] / max(a["pairs"], 1), 1),
                "sec_x": round(b["sec"] / max(a["sec"], 1e-9), 1),
            })
        record["operators"][name] = {"points": points, "growth": growth}

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaling_record.json",
    )
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["operators"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
