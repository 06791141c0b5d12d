"""Targeted per-leg probe for the r13 optimization round: time a chosen
set of bench legs (catalog queries AND library operators, same fixtures
and noop-sink methodology as bench.py) against the repo checkout given
as argv[1], print one JSON line per invocation.

The orchestrating shell alternates checkouts (HEAD worktree vs the
working tree) so host drift hits both arms equally — the r11/r13 A/B
protocol applied at per-change granularity. Each leg runs
``SPARK_GRAFT_PROBE_RUNS`` times (default 3: 1 cold + 2 warm) and all
samples are reported.

Usage: python tools/leg_probe.py <repo_dir> <leg> [leg ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_PROBE_RUNS
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    want = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    sys.path.insert(0, repo)

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.plans import (  # noqa: F401
        llm_queries as _llm,
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q
    from sample_dms_kinesis_rds_mariadb_spark.session import (
        get_session,
        widen_small_input,
    )

    spark = get_session(app_name="leg-probe")
    loadavg = list(os.getloadavg())
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)

    _docs = widen_small_input(_q.load_table(spark, sf_dir, "documents"))
    _bench_docs = _docs.select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
    ).limit(64)

    def _noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # library legs exactly as bench.py builds them
    def leg_bm25_batch_search() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.search import (
            bm25_batch_search,
        )

        qs = {
            f"q{i}": f"data {w} table"
            for i, w in enumerate(
                "query scan join filter group sort window stream merge part "
                "fast slow small large key row order customer line spark "
                "index hash range bucket shard batch event state plan code "
                "read write".split()
            )
        }
        _noop(bm25_batch_search(_docs, "doc_id", "text", qs, k=10))

    def leg_contamination_scores() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
            contamination_scores,
        )

        _noop(
            contamination_scores(
                _docs, _bench_docs, "doc_id", "text",
                bench_id_col="bench_id", bench_text_col="btext",
            )
        )

    def leg_decontaminate_bloom() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
            decontaminate_bloom,
        )

        _noop(
            decontaminate_bloom(
                _docs, _bench_docs, "doc_id", "text",
                bench_id_col="bench_id", bench_text_col="btext",
            )
        )

    def leg_lm_perplexity_scoring() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.functions.lm import (
            doc_tokens_column,
            make_perplexity_scorer,
            train_ngram_counts,
        )

        model = train_ngram_counts(_docs, "text", vocab_size=32_768)
        scorer = make_perplexity_scorer(spark, model)
        _noop(
            _docs.select(
                "doc_id", scorer(doc_tokens_column(F.col("text"))).alias("bpt")
            )
        )

    def leg_lm_train_only() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.functions.lm import (
            train_ngram_counts,
        )

        train_ngram_counts(_docs, "text", vocab_size=32_768)

    def leg_simhash_fingerprints_only() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import (
            simhash60_md5,
        )

        _noop(simhash60_md5(_docs, "doc_id", "text"))

    def leg_connected_components_minhash() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
            connected_components,
            minhash_lsh_candidate_pairs,
        )

        _noop(
            connected_components(
                minhash_lsh_candidate_pairs(_docs, "doc_id", "text")
            )
        )

    def leg_repeated_span_removal() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
            remove_repeated_spans,
        )

        _noop(remove_repeated_spans(_docs, "doc_id", "text", span=8))

    def leg_boilerplate_removal() -> None:
        from sample_dms_kinesis_rds_mariadb_spark.operators.boilerplate import (
            remove_boilerplate_lines,
        )

        _noop(remove_boilerplate_lines(_docs, "text", "source"))

    library = {
        "bm25_batch_search": leg_bm25_batch_search,
        "contamination_scores": leg_contamination_scores,
        "decontaminate_bloom": leg_decontaminate_bloom,
        "lm_perplexity_scoring": leg_lm_perplexity_scoring,
        "lm_train_only": leg_lm_train_only,
        "simhash_fingerprints_only": leg_simhash_fingerprints_only,
        "connected_components_minhash": leg_connected_components_minhash,
        "repeated_span_removal": leg_repeated_span_removal,
        "boilerplate_removal": leg_boilerplate_removal,
    }

    samples: dict[str, list[float]] = {}
    for name in want:
        if name in library:
            fn = library[name]
        elif name in _q.QUERIES:
            spec = _q.QUERIES[name]

            def fn(spec=spec):
                _noop(spec.spark_fn(spark, sf_dir))

        else:
            raise SystemExit(f"unknown leg: {name}")
        samples[name] = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"probe:{name}:{r}")
            t0 = time.perf_counter()
            fn()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    print(
        json.dumps(
            {
                "repo": repo,
                "calibration_sec": calibration_sec,
                "loadavg": loadavg,
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
