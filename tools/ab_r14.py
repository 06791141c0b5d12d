"""Interleaved toggle-A/B probe for the r14 optimization round.

One Spark session; each sweep runs every requested leg under BOTH arms
(toggle on/off) back-to-back with alternating order, so a host phase
hits the arms equally — the r13 interleave protocol applied to
module-toggle dispatches (COSINE_ARROW etc.) instead of checkouts.
Plans are rebuilt per run, so each arm pays its own Catalyst
analysis/codegen cost (part of what the kernels remove).

Usage: python tools/ab_r14.py <toggle> <leg> [leg ...]
  toggle: cosine | gopher_staged
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_AB_SWEEPS (default 3)
Appends one JSON line to plans/r14/ab_r14.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    toggle = sys.argv[1]
    want = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sweeps = int(os.environ.get("SPARK_GRAFT_AB_SWEEPS", "3"))

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions import (
        vectors as _vec,
    )
    from sample_dms_kinesis_rds_mariadb_spark.functions import text as _text
    from sample_dms_kinesis_rds_mariadb_spark.plans import (  # noqa: F401
        llm_queries as _llm,
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q
    from sample_dms_kinesis_rds_mariadb_spark.session import (
        get_session,
        widen_small_input,
    )

    spark = get_session(app_name="ab-r14")
    loadavg = list(os.getloadavg())
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)

    _docs = widen_small_input(_q.load_table(spark, sf_dir, "documents"))
    _emb = _q.load_table(spark, sf_dir, "embeddings")
    _probe = [float(x) for x in _emb.limit(1).collect()[0]["embedding"]]

    def _noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def leg_quantized_topk_rerank() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
            quantize_embeddings,
            quantized_topk_rerank,
        )

        q8 = quantize_embeddings(_emb)
        _noop(quantized_topk_rerank(q8, _probe, k=20, id_col="vec_id"))

    def leg_hard_negatives() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
            hard_negatives,
        )

        _noop(
            hard_negatives(
                _emb.withColumn("label", (F.col("vec_id") % 2).cast("int")),
                k=5,
                id_col="vec_id",
            )
        )

    def leg_knn_join_b32() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
            knn_join,
        )

        probes = _emb.limit(32).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        _noop(knn_join(_emb, probes, k=10))

    # long-document corpus: every documents row replicated to ~20x token
    # length (fixture synthesis untimed — pinned before the timed region)
    _longdocs = None

    def _get_longdocs():
        nonlocal _longdocs
        if _longdocs is None:
            _longdocs = (
                _docs.select(
                    "doc_id",
                    F.concat_ws(
                        "\n", F.array_repeat(F.col("text"), 20)
                    ).alias("text"),
                )
                .localCheckpoint(eager=True)
            )
        return _longdocs

    def leg_gopher_repetition_flags() -> None:
        rep = _text.gopher_repetition_flags(F.col("text"))
        _noop(_docs.select("doc_id", *[c.alias(k) for k, c in rep.items()]))

    def leg_gopher_repetition_staged() -> None:
        rep_keys = list(_text.gopher_repetition_flags(F.lit("x")).keys())
        _noop(
            _text.with_gopher_repetition_flags(_docs, "text").select(
                "doc_id", *rep_keys
            )
        )

    def leg_gopher_repetition_long_inline() -> None:
        rep = _text.gopher_repetition_flags(F.col("text"))
        _noop(
            _get_longdocs().select(
                "doc_id", *[c.alias(k) for k, c in rep.items()]
            )
        )

    def leg_gopher_repetition_long_staged() -> None:
        rep_keys = list(_text.gopher_repetition_flags(F.lit("x")).keys())
        _noop(
            _text.with_gopher_repetition_flags(
                _get_longdocs(), "text"
            ).select("doc_id", *rep_keys)
        )

    # 16x-replicated embeddings (deterministic per-replica perturbation,
    # untimed fixture synthesis): the shape where per-row fold CPU
    # dominates per-job overhead — the at-scale question
    _emb_xl = None

    def _get_emb_xl():
        nonlocal _emb_xl
        if _emb_xl is None:
            _emb_xl = (
                _emb.select(
                    "vec_id",
                    "embedding",
                    F.explode(F.sequence(F.lit(0), F.lit(15))).alias("_r"),
                )
                .select(
                    (F.col("vec_id") * 16 + F.col("_r")).alias("vec_id"),
                    F.transform(
                        F.col("embedding").cast("array<double>"),
                        lambda x: x
                        * (F.lit(1.0) + F.col("_r") * F.lit(1e-6)),
                    ).alias("embedding"),
                )
                .repartition(spark.sparkContext.defaultParallelism)
                .localCheckpoint(eager=True)
            )
        return _emb_xl

    def leg_topk_xl() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
            brute_force_topk,
        )

        _noop(brute_force_topk(_get_emb_xl(), _probe, k=20))

    def leg_semantic_pairs_xl() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
            medoid_centroids,
            semantic_dedup_pairs,
        )

        cents = medoid_centroids(_emb, list(range(0, 320, 10)))
        _noop(
            semantic_dedup_pairs(
                _get_emb_xl(), threshold=0.4, centroids=cents
            )
        )

    def leg_knn_join_xl() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import (
            knn_join,
        )

        probes = _emb.limit(32).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        _noop(knn_join(_get_emb_xl(), probes, k=10))

    library = {
        "quantized_topk_rerank": leg_quantized_topk_rerank,
        "hard_negatives": leg_hard_negatives,
        "knn_join_b32": leg_knn_join_b32,
        "topk_xl": leg_topk_xl,
        "semantic_pairs_xl": leg_semantic_pairs_xl,
        "knn_join_xl": leg_knn_join_xl,
        "gopher_repetition_flags": leg_gopher_repetition_flags,
        "gopher_repetition_staged": leg_gopher_repetition_staged,
        "gopher_repetition_long_inline": leg_gopher_repetition_long_inline,
        "gopher_repetition_long_staged": leg_gopher_repetition_long_staged,
    }

    def resolve(name):
        if name in library:
            return library[name]
        if name in _q.QUERIES:
            spec = _q.QUERIES[name]
            return lambda spec=spec: _noop(spec.spark_fn(spark, sf_dir))
        raise SystemExit(f"unknown leg: {name}")

    def set_arm(on: bool) -> None:
        if toggle == "cosine":
            _vec.COSINE_ARROW = on
            # the PAIR kernels are measured-off by default
            # (PAIR_ARROW_MIN_DIM disabled); the "on" arm of this
            # instrument forces them so the A/B keeps measuring
            # kernel-vs-fold, not fold-vs-fold
            _vec.PAIR_ARROW_MIN_DIM = 0 if on else 1 << 30
        elif toggle == "gopher_staged":
            pass  # arm is expressed by the leg pair, not a module toggle
        else:
            raise SystemExit(f"unknown toggle: {toggle}")

    results: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in want
    }
    for sweep in range(sweeps):
        arms = ("on", "off") if sweep % 2 == 0 else ("off", "on")
        if toggle == "gopher_staged":
            # the arm pair is expressed as two LEG variants (inline vs
            # staged legs run interleaved in the same sweep) — one arm here
            arms = ("on",)
        for name in want:
            fn = resolve(name)
            for arm in arms:
                set_arm(arm == "on")
                spark.sparkContext.setJobDescription(
                    f"ab:{toggle}:{name}:{arm}:{sweep}"
                )
                t0 = time.perf_counter()
                fn()
                results[name][arm].append(
                    round(time.perf_counter() - t0, 3)
                )
                spark.sparkContext.setJobDescription(None)
    set_arm(True)

    rec = {
        "toggle": toggle,
        "sf_dir": sf_dir,
        "calibration_sec": calibration_sec,
        "loadavg": loadavg,
        "sweeps": sweeps,
        "results": results,
    }
    line = json.dumps(rec)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14", "ab_r14.jsonl",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
