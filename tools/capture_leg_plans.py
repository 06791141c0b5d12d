"""Capture ``.explain("formatted")`` for the LIBRARY bench legs (the
operators bench.py times that are not declared catalog queries) into
``plans/<tag>/<leg>.txt`` — the companion to tools/capture_plans.py for
the optimization rounds' before/after plan evidence.

For multi-job legs (decontaminate_bloom's bloom build + flag + verify,
lm training's aggregate + scoring) the captured plan is the leg's FINAL
returned frame; driver-paced sub-jobs are described in
OPTIMIZATION_r13.md with stage-profile numbers instead.

Usage: python tools/capture_leg_plans.py <repo_dir> <tag> [leg ...]
"""

from __future__ import annotations

import os
import sys
import traceback


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    tag = sys.argv[2]
    want = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, repo)

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q
    from sample_dms_kinesis_rds_mariadb_spark.session import (
        get_session,
        widen_small_input,
    )

    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name=f"capture-leg-plans-{tag}")

    _docs = widen_small_input(_q.load_table(spark, sf_dir, "documents"))
    _bench_docs = _docs.select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
    ).limit(64)

    def frame_bm25_batch_search():
        from sample_dms_kinesis_rds_mariadb_spark.operators.search import (
            bm25_batch_search,
        )

        qs = {f"q{i}": f"data {w} table" for i, w in enumerate("query scan join".split())}
        return bm25_batch_search(_docs, "doc_id", "text", qs, k=10)

    def frame_decontaminate_bloom():
        from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
            decontaminate_bloom,
        )

        return decontaminate_bloom(
            _docs, _bench_docs, "doc_id", "text",
            bench_id_col="bench_id", bench_text_col="btext",
        )

    def frame_contamination_scores():
        from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
            contamination_scores,
        )

        return contamination_scores(
            _docs, _bench_docs, "doc_id", "text",
            bench_id_col="bench_id", bench_text_col="btext",
        )

    def frame_lm_perplexity_scoring():
        from sample_dms_kinesis_rds_mariadb_spark.functions.lm import (
            doc_tokens_column,
            make_perplexity_scorer,
            train_ngram_counts,
        )

        model = train_ngram_counts(_docs, "text", vocab_size=32_768)
        scorer = make_perplexity_scorer(spark, model)
        return _docs.select(
            "doc_id", scorer(doc_tokens_column(F.col("text"))).alias("bpt")
        )

    def frame_simhash_fingerprints():
        from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import (
            simhash60_md5,
        )

        return simhash60_md5(_docs, "doc_id", "text")

    def frame_routed_intake():
        from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
            route_document_texts,
        )

        mixed = _docs.select(
            "doc_id",
            F.encode(
                F.concat(F.lit("<html><body><p>"), F.substring("text", 1, 400),
                         F.lit("</p></body></html>")),
                "UTF-8",
            ).alias("content"),
        )
        return route_document_texts(mixed)

    frames = {
        "bm25_batch_search": frame_bm25_batch_search,
        "decontaminate_bloom": frame_decontaminate_bloom,
        "contamination_scores": frame_contamination_scores,
        "lm_perplexity_scoring": frame_lm_perplexity_scoring,
        "simhash_fingerprints": frame_simhash_fingerprints,
        "routed_intake_front_door": frame_routed_intake,
    }
    for name, builder in frames.items():
        if want and name not in want:
            continue
        path = os.path.join(out_dir, f"{name}.txt")
        try:
            df = builder()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
