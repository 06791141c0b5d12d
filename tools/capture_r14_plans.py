"""Capture .explain('formatted') before/after plans for every leg the
r14 optimization round touches.

"before" = every kernel dispatch forced to its interpreted JVM form
(COSINE_ARROW off, ASSIGN_ARROW_MIN_WORK/BROADCAST_DIM raised past any
real dim, SparkSession.getActiveSession patched to None so pq_encode
takes its fold branch) — the r13-and-earlier plan shape. "after" = the
shipped dispatch state. This also delivers VERDICT r13 item 8: plan
pairs for the centroid-assign / PQ-encode / classifier-margin kernels
that actually SHOW the fold→ArrowEvalPython transition (the r13 capture
pinned frames above the kernels and showed no diff).

Usage: python tools/capture_r14_plans.py [outdir]  (default plans/r14)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
from contextlib import contextmanager
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "plans", "r14"
    )
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions import (
        classify as _classify,
    )
    from sample_dms_kinesis_rds_mariadb_spark.functions import text as _text
    from sample_dms_kinesis_rds_mariadb_spark.functions import (
        vectors as _vec,
    )
    from sample_dms_kinesis_rds_mariadb_spark.operators import (
        similarity as _sim,
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans import (  # noqa: F401
        llm_queries as _llm,
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q
    from sample_dms_kinesis_rds_mariadb_spark.session import (
        get_session,
        widen_small_input,
    )

    spark = get_session(app_name="capture-r14")
    _docs = widen_small_input(_q.load_table(spark, sf_dir, "documents"))
    _emb = _q.load_table(spark, sf_dir, "embeddings")
    _probe = [float(x) for x in _emb.limit(1).collect()[0]["embedding"]]

    @contextmanager
    def before_state():
        saved = (
            _vec.COSINE_ARROW,
            _sim.ASSIGN_ARROW_MIN_WORK,
            _classify.BROADCAST_DIM,
        )
        _vec.COSINE_ARROW = False
        _sim.ASSIGN_ARROW_MIN_WORK = 1 << 60
        _classify.BROADCAST_DIM = 1 << 60
        patcher = mock.patch.object(
            SparkSession, "getActiveSession", return_value=None
        )
        patcher.start()
        try:
            yield
        finally:
            patcher.stop()
            (
                _vec.COSINE_ARROW,
                _sim.ASSIGN_ARROW_MIN_WORK,
                _classify.BROADCAST_DIM,
            ) = saved

    def leg_quantized_topk_rerank():
        q8 = _sim.quantize_embeddings(_emb)
        return _sim.quantized_topk_rerank(q8, _probe, k=20, id_col="vec_id")

    def leg_hard_negatives():
        return _sim.hard_negatives(
            _emb.withColumn("label", (F.col("vec_id") % 2).cast("int")),
            k=5,
            id_col="vec_id",
        )

    def leg_knn_join_b32():
        probes = _emb.limit(32).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return _sim.knn_join(_emb, probes, k=10)

    _w4k = [((i * 37) % 101 - 50) / 100.0 for i in range(4096)]

    def leg_classifier_inference():
        return _docs.select(
            "doc_id",
            _classify.classifier_probability(
                F.col("text"), _w4k, 0.125
            ).alias("p"),
        )

    def leg_pq_adc_rerank():
        from sample_dms_kinesis_rds_mariadb_spark.operators import pq as _pqm

        n_emb = _emb.count()
        medoids = [(i * max(n_emb // 16, 1) + 7) % n_emb for i in range(16)]
        books = _pqm.medoid_pq_codebooks(_emb, medoids, m=8)
        return _pqm.pq_topk_rerank(_emb, books, _probe, k=20, coarse_factor=4)

    _longdocs = _docs.select(
        "doc_id",
        F.concat_ws("\n", F.array_repeat(F.col("text"), 20)).alias("text"),
    ).localCheckpoint(eager=True)
    _rep_keys = list(_text.gopher_repetition_flags(F.lit("x")).keys())

    def leg_gopher_rep_longdoc_after():
        return _text.with_gopher_repetition_flags(_longdocs, "text").select(
            "doc_id", *_rep_keys
        )

    def leg_gopher_rep_longdoc_before():
        rep = _text.gopher_repetition_flags(F.col("text"))
        return _longdocs.select(
            "doc_id", *[c.alias(k) for k, c in rep.items()]
        )

    legs = {
        "embedding_topk_cosine": lambda: _q.QUERIES[
            "embedding_topk_cosine"
        ].spark_fn(spark, sf_dir),
        "embedding_ann_lsh": lambda: _q.QUERIES[
            "embedding_ann_lsh"
        ].spark_fn(spark, sf_dir),
        "embedding_ann_ivf": lambda: _q.QUERIES[
            "embedding_ann_ivf"
        ].spark_fn(spark, sf_dir),
        "semantic_dedup": lambda: _q.QUERIES["semantic_dedup"].spark_fn(
            spark, sf_dir
        ),
        "quantized_topk_rerank": leg_quantized_topk_rerank,
        "hard_negatives": leg_hard_negatives,
        "knn_join_b32": leg_knn_join_b32,
        "classifier_inference": leg_classifier_inference,
        "pq_adc_rerank": leg_pq_adc_rerank,
        # UNPINNED assign frame (the r13 captures put a localCheckpoint
        # above the kernel, so the before/after files showed no diff —
        # VERDICT r13 item 8); this one shows the dispatch itself
        "centroid_assign": lambda: _emb.select(
            "vec_id",
            _sim.assign_to_centroids(
                F.col("embedding"),
                _sim.medoid_centroids(_emb, list(range(0, 320, 10))),
            ).alias("ivf_list"),
        ),
    }

    def capture(df, path: str) -> None:
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")

    for name, build in legs.items():
        with before_state():
            capture(build(), os.path.join(outdir, f"{name}_before.txt"))
        capture(build(), os.path.join(outdir, f"{name}_after.txt"))

    # the gopher long-doc gate: before = the inline per-rule form, after =
    # the staged form the new bench leg ships
    capture(
        leg_gopher_rep_longdoc_before(),
        os.path.join(outdir, "gopher_rep_longdoc_before.txt"),
    )
    capture(
        leg_gopher_rep_longdoc_after(),
        os.path.join(outdir, "gopher_rep_longdoc_after.txt"),
    )
    spark.stop()


if __name__ == "__main__":
    main()
