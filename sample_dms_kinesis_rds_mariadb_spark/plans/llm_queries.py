"""LLM training-data pipeline queries: dedup / similarity / text analysis /
multimodal, registered in the same catalog as the relational queries.

Cross-engine strategy (see plans/queries.py header): md5 is the shared hash
primitive — MinHash bands, fingerprints, and exact-dedup keys are therefore
bit-identical in Spark and DuckDB, making even the *hash-based* dedup
operators oracle-checkable, not just row-count-checkable. The LSH ANN
operators are ALSO fully oracle-checked: the seeded hyperplanes inline into
the SQL as DOUBLE[] literals and both engines fold dot products
sequentially, so bucket membership is bit-identical; SimHash near-dup pairs
check via 60-bit md5 fingerprints + bit_count(xor) hamming; even the
multimodal decode oracle rebuilds the identical PPM blob in SQL and
sha256-matches it. Only IVF's KMeans clustering is genuinely beyond SQL's
reach — its query stays rows-only, registered last, covered by unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    doc_fingerprint,
    langid_heuristic,
    quality_columns,
    token_count,
)
from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import shingles
from sample_dms_kinesis_rds_mariadb_spark.operators import dedup, multimodal, similarity
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table, register
from sample_dms_kinesis_rds_mariadb_spark.session import widen_small_input

# normalized text in DuckDB SQL — must mirror functions.text.normalize_text
_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


@register(
    "dedup_exact",
    "Exact dedup: lowest doc_id per content fingerprint (hash-groupBy; "
    "north-star dedup family #1)",
    oracle=f"""
        SELECT md5({_NORM_SQL}) AS fingerprint,
               MIN(doc_id) AS doc_id,
               COUNT(*) AS n_duplicates
        FROM documents
        GROUP BY fingerprint
        ORDER BY doc_id
    """,
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "dedup_minhash_lsh",
    "MinHash+LSH near-dup candidate pairs: shingle → banded md5-minhash → "
    "bucket join (north-star dedup family #2; md5 keeps both engines "
    "bit-identical)",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array({_NORM_SQL}, '\\s+') AS t
          FROM documents
        ),
        shingled AS (
          SELECT DISTINCT doc_id,
                 md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS h
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS i
          )
        ),
        wide AS (
          SELECT doc_id,
                 MIN(substr(h, 1, 8)) AS b0, MIN(substr(h, 9, 8)) AS b1,
                 MIN(substr(h, 17, 8)) AS b2, MIN(substr(h, 25, 8)) AS b3
          FROM shingled GROUP BY doc_id
        ),
        sigs AS (
          SELECT doc_id, 0 AS band, b0 AS signature FROM wide
          UNION ALL SELECT doc_id, 1, b1 FROM wide
          UNION ALL SELECT doc_id, 2, b2 FROM wide
          UNION ALL SELECT doc_id, 3, b3 FROM wide
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.band = b.band AND a.signature = b.signature
         AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """,
    tags=("dedup",),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the shingle+minhash map stage is the cost center and testdata
    # arrives as one single-row-group file (see session.widen_small_input)
    docs = widen_small_input(load_table(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_candidate_pairs(docs, "doc_id", "text").orderBy(
        "id_a", "id_b"
    )


@register(
    "embedding_topk_cosine",
    "Similarity search baseline: exact brute-force cosine top-20 vs the "
    "vec_id=0 embedding (north-star similarity op; TakeOrdered, no global "
    "sort)",
    oracle="""
        WITH probe AS (
          SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0
        )
        SELECT e.vec_id,
               CAST(CAST(ROUND(
                 list_inner_product(CAST(e.embedding AS DOUBLE[]), p.p)
                 / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(p.p, p.p))), 6) AS DECIMAL(18,6)) AS DOUBLE) AS cosine_sim
        FROM embeddings e, probe p
        ORDER BY cosine_sim DESC, e.vec_id
        LIMIT 20
    """,
    tags=("similarity",),
)
def q_embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = similarity.brute_force_topk(emb, probe, k=20)
    return out.select(
        "vec_id",
        # decimal normalization then DOUBLE output: identical float64 bits on
        # both engines (see plans/queries.py q1 note)
        F.round(F.col("cosine_sim"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("cosine_sim"),
    ).orderBy(F.col("cosine_sim").desc(), "vec_id")


@register(
    "lang_id",
    "Language-ID heuristic: marker-word scores with deterministic tiebreak "
    "(north-star text-analysis op)",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, lang,
                 (CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'and') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'of') THEN 1 ELSE 0 END) AS s_en,
                 (CASE WHEN list_contains(t, 'el') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'la') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'los') THEN 1 ELSE 0 END) AS s_es,
                 (CASE WHEN list_contains(t, 'der') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'und') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'die') THEN 1 ELSE 0 END) AS s_de,
                 (CASE WHEN list_contains(t, 'le') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'et') THEN 1 ELSE 0 END
                  + CASE WHEN list_contains(t, 'les') THEN 1 ELSE 0 END) AS s_fr
          FROM (SELECT doc_id, lang,
                       list_distinct(regexp_split_to_array({_NORM_SQL}, '\\s+')) AS t
                FROM documents)
        )
        SELECT guessed_lang, COUNT(*) AS n_docs
        FROM (
          SELECT doc_id,
                 CASE
                   WHEN GREATEST(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                   WHEN s_de = GREATEST(s_en, s_es, s_de, s_fr) THEN 'de'
                   WHEN s_en = GREATEST(s_en, s_es, s_de, s_fr) THEN 'en'
                   WHEN s_es = GREATEST(s_en, s_es, s_de, s_fr) THEN 'es'
                   WHEN s_fr = GREATEST(s_en, s_es, s_de, s_fr) THEN 'fr'
                 END AS guessed_lang
          FROM scored
        )
        GROUP BY guessed_lang ORDER BY guessed_lang
    """,
    tags=("text",),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(langid_heuristic(F.col("text")).alias("guessed_lang"))
        .groupBy("guessed_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("guessed_lang")
    )


@register(
    "text_quality",
    "Quality scoring: per-language acceptance counts from integer-exact "
    "features (lengths, token/punct/digit counts; north-star text op)",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE is_quality) AS n_quality,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM (
          SELECT lang,
                 length(text) AS n_chars,
                 (CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS n_tokens,
                 length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS n_punct,
                 length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                 (length(text) >= 50
                  AND (CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) >= 10
                  AND (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))) * 5 <= length(text)
                  AND (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 2 <= length(text)) AS is_quality
          FROM documents
        )
        GROUP BY lang ORDER BY lang
    """,
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qc = quality_columns(F.col("text"))
    return (
        docs.select(
            "lang", qc["n_tokens"].alias("n_tokens"), qc["is_quality"].alias("is_quality")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("is_quality"), 1)).alias("n_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "token_counts",
    "Token counting: whitespace tokenization, totals per source "
    "(north-star text op)",
    oracle="""
        SELECT source,
               CAST(SUM((CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)) AS BIGINT) AS total_tokens,
               MIN((CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)) AS min_tokens,
               MAX((CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)) AS max_tokens
        FROM documents GROUP BY source ORDER BY source
    """,
    tags=("text",),
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = token_count(F.col("text")).cast("long")
    return (
        docs.select("source", tc.alias("tc"))
        .groupBy("source")
        .agg(
            F.sum("tc").alias("total_tokens"),
            F.min("tc").alias("min_tokens"),
            F.max("tc").alias("max_tokens"),
        )
        .orderBy("source")
    )


@register(
    "doc_fingerprints",
    "Document fingerprinting: md5 of normalized text, distinct fingerprints "
    "per source (north-star text op)",
    oracle=f"""
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT md5({_NORM_SQL})) AS distinct_fingerprints
        FROM documents GROUP BY source ORDER BY source
    """,
    tags=("text",),
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("distinct_fingerprints"),
        )
        .orderBy("source")
    )


@register(
    "embedding_knn_join",
    "kNN join: top-3 neighbors for EACH probe vector (probes broadcast, one "
    "scan of the corpus per batch of probes — the batched form of similarity "
    "search; window per probe, no global sort). EXTRA: displaced from the "
    "50-cap catalog by semantic_dedup (its mechanism — broadcast probes + "
    "cosine + per-probe window — stays covered by embedding_topk_cosine and "
    "this pytest-parity entry)",
    oracle="""
        WITH probes AS (
          SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS p
          FROM embeddings WHERE vec_id < 5
        ),
        scored AS (
          SELECT p.probe_id, e.vec_id,
                 list_inner_product(CAST(e.embedding AS DOUBLE[]), p.p)
                 / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(p.p, p.p))) AS sim
          FROM embeddings e CROSS JOIN probes p
          WHERE e.vec_id >= 5
        )
        SELECT probe_id, vec_id,
               CAST(CAST(ROUND(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cosine_sim
        FROM (
          SELECT probe_id, vec_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                                    ORDER BY sim DESC, vec_id) AS rn
          FROM scored
        ) WHERE rn <= 3
        ORDER BY probe_id, cosine_sim DESC, vec_id
    """,
    tags=("similarity", "join"),
    extra=True,
)
def q_embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sample_dms_kinesis_rds_mariadb_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), to_double_array(F.col("embedding")).alias("p")
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        cosine_similarity(F.col("v"), F.col("p")).alias("sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "probe_id",
            "vec_id",
            F.round(F.col("sim"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cosine_sim"),
        )
        .orderBy("probe_id", F.col("cosine_sim").desc(), "vec_id")
    )


def _lsh_oracle_sql(n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    """Generate the DuckDB oracle for LSH-bucketed ANN by embedding the
    seeded hyperplanes as SQL array literals (the same floats the Spark side
    derives from the seed — repr round-trips float64 exactly in both
    engines). Bucket bits come from the SIGN of a sequential-fold dot
    product on both sides (Spark F.aggregate fold == DuckDB
    list_inner_product), so bucket membership is bit-identical; testdata
    embeddings are 64-dim at every SF."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    lits = ["[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes]
    bucket_expr = "\n         + ".join(
        f"CASE WHEN list_inner_product(v, {lits[i]}) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(n_planes)
    )
    multiprobe = "\n          ".join(
        f"UNION ALL SELECT xor(pb, {1 << i}) FROM probe" for i in range(n_planes)
    )
    return f"""
        WITH bucketed AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 {bucket_expr} AS bucket
          FROM embeddings
        ),
        probe AS (SELECT v AS p, bucket AS pb FROM bucketed WHERE vec_id = 0),
        allowed AS (
          SELECT pb AS b FROM probe
          {multiprobe}
        )
        SELECT b.vec_id,
               CAST(CAST(ROUND(
                 list_inner_product(b.v, p.p)
                 / (sqrt(list_inner_product(b.v, b.v))
                    * sqrt(list_inner_product(p.p, p.p))), 6) AS DECIMAL(18,6)) AS DOUBLE) AS cosine_sim
        FROM bucketed b, probe p
        WHERE b.bucket IN (SELECT b FROM allowed)
        ORDER BY cosine_sim DESC, b.vec_id
        LIMIT 20
    """


def _bucket_expr_sql(n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    """The LSH bucket id as a DuckDB expression over a DOUBLE[] column ``v``,
    with the seeded hyperplanes inlined as array literals."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    lits = ["[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes]
    return "\n         + ".join(
        f"CASE WHEN list_inner_product(v, {lits[i]}) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(n_planes)
    )


@register(
    "embedding_ann_lsh",
    "Approximate NN: seeded random-hyperplane LSH bucketing + multiprobe "
    "in-bucket scan (north-star similarity scale path) — FULLY oracle-checked"
    " by embedding the hyperplanes as SQL literals; bucket membership is "
    "bit-identical because both engines fold the dot product sequentially",
    oracle=_lsh_oracle_sql(),
    tags=("similarity",),
)
def q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = similarity.lsh_bucketed_topk(emb, probe, k=20)
    return out.select(
        "vec_id",
        F.round(F.col("cosine_sim"), 6).cast("decimal(18,6)").cast("double").alias("cosine_sim"),
    ).orderBy(F.col("cosine_sim").desc(), "vec_id")


_SIMHASH60_BIT_SUMS = ",\n                 ".join(
    f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(60)
)
_SIMHASH60_REASSEMBLE = "\n               + ".join(
    f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(60)
)
_SIMHASH60_BANDS = "\n          ".join(
    f"UNION ALL SELECT doc_id, f, {i} AS band, (f >> {i * 15}) & 32767 AS key FROM fp"
    for i in range(1, 4)
)


@register(
    "simhash_dedup",
    "SimHash fingerprints + near-dup pairs: 60-bit md5-derived fingerprints "
    "(the fingerprint computation itself is inside this oracle's CTEs), "
    "15-bit-band pigeonhole bucketing, hamming ≤ 3 (north-star dedup family "
    "#3 — FULLY oracle-checked: md5 bits + bit_count(xor) reproduce in SQL)",
    oracle=f"""
        WITH toks AS (
          SELECT DISTINCT doc_id,
                 unnest(list_distinct(regexp_split_to_array({_NORM_SQL}, '\\s+'))) AS tok
          FROM documents
        ),
        h AS (
          SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
        ),
        bits AS (
          SELECT doc_id,
                 {_SIMHASH60_BIT_SUMS}
          FROM h GROUP BY doc_id
        ),
        fp AS (
          SELECT doc_id,
               {_SIMHASH60_REASSEMBLE} AS f
          FROM bits
        ),
        banded AS (
          SELECT doc_id, f, 0 AS band, f & 32767 AS key FROM fp
          {_SIMHASH60_BANDS}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.f, b.f)) <= 3
        ORDER BY id_a, id_b
    """,
    tags=("dedup",),
)
def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_small_input(load_table(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs_md5(docs, "doc_id", "text", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "dedup_pipeline_verified",
    "The full near-dup pipeline: MinHash-LSH candidate generation → exact "
    "n-gram-Jaccard verification (numerator/denominator ints, threshold "
    "2/3) — candidates bound the quadratic stage, verification is exact",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array({_NORM_SQL}, '\\s+') AS t
          FROM documents
        ),
        shingled AS (
          SELECT DISTINCT doc_id,
                 t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS i
          )
        ),
        hashed AS (SELECT doc_id, md5(shingle) AS h, shingle FROM shingled),
        wide AS (
          SELECT doc_id,
                 MIN(substr(h, 1, 8)) AS b0, MIN(substr(h, 9, 8)) AS b1,
                 MIN(substr(h, 17, 8)) AS b2, MIN(substr(h, 25, 8)) AS b3
          FROM hashed GROUP BY doc_id
        ),
        sigs AS (
          SELECT doc_id, 0 AS band, b0 AS signature FROM wide
          UNION ALL SELECT doc_id, 1, b1 FROM wide
          UNION ALL SELECT doc_id, 2, b2 FROM wide
          UNION ALL SELECT doc_id, 3, b3 FROM wide
        ),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sigs a JOIN sigs b
            ON a.band = b.band AND a.signature = b.signature
           AND a.doc_id < b.doc_id
        ),
        sets AS (
          SELECT doc_id, list(DISTINCT shingle) AS sh FROM shingled GROUP BY doc_id
        )
        SELECT c.id_a, c.id_b,
               len(list_intersect(sa.sh, sb.sh)) AS n_common,
               len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS n_union
        FROM cands c
        JOIN sets sa ON sa.doc_id = c.id_a
        JOIN sets sb ON sb.doc_id = c.id_b
        WHERE len(list_intersect(sa.sh, sb.sh)) * 3
              >= (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) * 2
        ORDER BY id_a, id_b
    """,
    tags=("dedup",),
)
def q_dedup_pipeline_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_small_input(load_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_candidate_pairs(docs, "doc_id", "text")
    sets = docs.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size("sa") + F.size("sb") - inter
    return (
        pairs.join(
            sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa")), "id_a"
        )
        .join(
            sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb")), "id_b"
        )
        .select("id_a", "id_b", inter.alias("n_common"), union.alias("n_union"))
        .filter(F.col("n_common") * 3 >= F.col("n_union") * 2)
        .orderBy("id_a", "id_b")
    )


# Winnowing catalog parameters: md5_32 hash (cross-engine; production
# default stays crc32), deterministic doc subset (limit() order is undefined
# on a parquet scan), df-cap + min_shared bound the bucket joins.
_WINNOW_K, _WINNOW_W, _WINNOW_MIN_SHARED, _WINNOW_MAX_DF = 5, 4, 5, 100
_WINNOW_DOCS = 300


@register(
    "winnowing_near_dups",
    "Winnowing (MOSS) local-overlap near-dup pairs: k-gram rolling hashes, "
    "array-space sliding window minima (narrow no-shuffle selection), "
    "df-capped bucket join on shared fingerprints (north-star dedup family "
    "#5 — FULLY oracle-checked: md5_32 hashes + the (hash|pos) string-min "
    "trick reproduce the leftmost-min tie rule in SQL)",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, lower(text) AS s FROM documents
          WHERE doc_id < {_WINNOW_DOCS}
        ),
        g AS (
          SELECT doc_id, i,
                 substr(md5(substr(s, i, {_WINNOW_K})), 1, 8)
                   || '|' || lpad(CAST(i AS VARCHAR), 10, '0') AS hp,
                 GREATEST(len(s) - {_WINNOW_K - 1}, 0) AS n
          FROM t, LATERAL (
            SELECT unnest(generate_series(
              1, GREATEST(len(s) - {_WINNOW_K - 1}, 0))) AS i
          )
        ),
        win AS (
          SELECT doc_id, i, n,
                 min(hp) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING
                 ) AS sel
          FROM g
        ),
        fps AS (
          SELECT DISTINCT doc_id, substr(sel, 1, 8) AS h
          FROM win WHERE i <= GREATEST(n - {_WINNOW_W}, 0) + 1
        ),
        capped AS (
          SELECT doc_id, h FROM fps
          QUALIFY count(*) OVER (PARTITION BY h) <= {_WINNOW_MAX_DF}
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
        FROM capped a JOIN capped b USING (h)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
        ORDER BY id_a, id_b
    """,
    tags=("dedup",),
)
def q_winnowing_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_small_input(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < _WINNOW_DOCS)
    )
    return dedup.winnowing_near_dups(
        docs,
        "doc_id",
        "text",
        k=_WINNOW_K,
        window=_WINNOW_W,
        min_shared=_WINNOW_MIN_SHARED,
        max_df=_WINNOW_MAX_DF,
        hash_fn="md5_32",
    ).orderBy("id_a", "id_b")


@register(
    "multimodal_features",
    "Multimodal pipeline: VALID binary PPM images synthesized from the text "
    "column (md5-derived ASCII pixel buffer), REAL header decode (no image "
    "library) via Arrow-batched mapInPandas — FULLY oracle-checked: the "
    "oracle rebuilds the identical blob in SQL and sha256-matches it",
    oracle="""
        WITH base AS (
          SELECT doc_id,
                 CAST(FLOOR((length(text) + 48) / 48) AS INT) AS h,
                 md5(text) AS m
          FROM documents WHERE doc_id < 200
        ),
        built AS (
          SELECT doc_id, h,
                 'P6' || chr(10) || '16 ' || CAST(h AS VARCHAR) || chr(10)
                 || '255' || chr(10)
                 || substr(repeat(m, CAST(CEIL(h * 48.0 / 32) AS INT)), 1, h * 48)
                   AS content
          FROM base
        )
        SELECT doc_id AS media_id,
               strlen(content) AS n_bytes,
               16 AS width,
               h AS height,
               3 AS channels,
               'ppm' AS format,
               sha256(content) AS sha256,
               CAST(NULL AS INT) AS orientation,
               FALSE AS has_icc_profile
        FROM built ORDER BY media_id
    """,
    tags=("multimodal",),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic subset (limit() order is undefined on a parquet scan)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.attach_ppm_column(docs, "text", "doc_id")
    return multimodal.extract_image_features(media, fake_decode=False).orderBy(
        "media_id"
    )


# Seed-medoid centroids for the ORACLE-CHECKED IVF catalog entry: the
# embeddings of these FIXED vec_ids (all exist at every SF; 0 is the probe,
# so it is excluded). Because each centroid is a corpus row, DuckDB rebuilds
# the identical index assignment from the same parquet — no clustering to
# reproduce. The KMeans path (IvfIndex.build without centroids) remains the
# production API and is covered by tests/test_operators.py.
_IVF_MEDOID_IDS = [7, 61, 127, 199, 263, 331, 401, 467]


def _ivf_oracle_sql(medoid_ids: list[int], n_probe: int = 3, k: int = 20) -> str:
    """DuckDB oracle for medoid-centroid IVF ANN. Assignment distance is
    d2 = <v,v> - 2<v,c> + <c,c> — every dot a sequential left fold
    (list_inner_product == Spark's F.aggregate fold), so d2 is bit-identical
    and the argmin (ties → lowest cid, via ORDER BY d2, cid) matches
    operators.similarity.assign_to_centroids exactly. Probe-list selection
    and the final top-k cut order by the UNROUNDED double."""
    values = ", ".join(f"({cid}, {mid})" for cid, mid in enumerate(medoid_ids))
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
          SELECT m.cid, v.v AS c
          FROM (VALUES {values}) AS m(cid, mid)
          JOIN v ON v.vec_id = m.mid
        ),
        assigned AS (
          SELECT vec_id, v, cid FROM (
            SELECT v.vec_id, v.v, c.cid,
                   row_number() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY list_inner_product(v.v, v.v)
                              - 2 * list_inner_product(v.v, c.c)
                              + list_inner_product(c.c, c.c),
                              c.cid
                   ) AS rn
            FROM v CROSS JOIN cents c
          ) WHERE rn = 1
        ),
        probe AS (SELECT v AS p FROM v WHERE vec_id = 0),
        plists AS (
          SELECT c.cid
          FROM cents c CROSS JOIN probe p
          ORDER BY list_inner_product(p.p, p.p)
                   - 2 * list_inner_product(p.p, c.c)
                   + list_inner_product(c.c, c.c),
                   c.cid
          LIMIT {n_probe}
        ),
        scored AS (
          SELECT a.vec_id,
                 list_inner_product(a.v, p.p)
                 / (sqrt(list_inner_product(a.v, a.v))
                    * sqrt(list_inner_product(p.p, p.p))) AS sim
          FROM assigned a CROSS JOIN probe p
          WHERE a.cid IN (SELECT cid FROM plists)
        )
        SELECT vec_id,
               CAST(CAST(ROUND(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cosine_sim
        FROM scored
        ORDER BY sim DESC, vec_id
        LIMIT {k}
    """


@register(
    "embedding_ann_ivf",
    "Approximate NN via a PREBUILT IVF index: seed-medoid centroid lists "
    "written partitioned-by-list, probe = partition-pruned scan of the 3 "
    "nearest lists + TakeOrdered — no clustering in the probe path (the ANN "
    "scale path) — FULLY oracle-checked: centroids are fixed corpus rows, so "
    "DuckDB reproduces assignment, probe lists, and the top-k cut bit-exactly",
    oracle=_ivf_oracle_sql(_IVF_MEDOID_IDS),
    tags=("similarity",),
)
def q_embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # build-once: the index lives keyed by dataset IDENTITY (path + source
    # mtime/size) AND the centroid scheme, so later calls and later sessions
    # only probe it, while a regenerated source file or a scheme change
    # triggers a fresh build instead of probing a stale index
    import os as _os

    src = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = _os.stat(src)
        ident = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}|medoid8"
    except OSError:
        ident = f"{sf_dir}|medoid8"
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/spark-graft-ivf-{tag}"
    if similarity.IvfIndex.exists(path):
        index = similarity.IvfIndex.load(spark, path)
    else:
        centroids = similarity.medoid_centroids(emb, _IVF_MEDOID_IDS)
        index = similarity.IvfIndex.build(emb, path, centroids=centroids)
    out = index.probe(probe, k=20, n_probe=3)
    return out.select(
        "vec_id",
        F.round(F.col("cosine_sim"), 6).cast("decimal(18,6)").cast("double").alias("cosine_sim"),
    )


_SEMDEDUP_THRESHOLD = 0.4  # testdata embeddings are near-orthogonal; 0.4
# yields a realistic within-cluster duplicate rate at the sf0.01 gate

# SemDeDup gets its OWN centroid list, wider than the IVF query's 8: the
# quadratic inside each cluster is the whole cost, so cluster count is the
# scale knob (SemDeDup's ~100k clusters at web scale). 32 seed-medoid ids,
# all < 500 so they exist at every SF.
_SEMDEDUP_MEDOID_IDS = [
    3, 17, 29, 43, 59, 71, 89, 101, 113, 131, 149, 163, 179, 193, 211, 227,
    241, 257, 271, 283, 307, 317, 337, 353, 367, 383, 397, 413, 433, 449,
    463, 479,
]


def _semdedup_oracle_sql(medoid_ids: list[int], threshold: float) -> str:
    """DuckDB oracle for SemDeDup survivors over seed-medoid clusters.

    Assignment reproduces ``assign_to_centroids`` bit-exactly (fold dots,
    argmin ties to lowest cid); the within-cluster pair predicate compares
    the UNROUNDED cosine against the threshold — both engines compute the
    identical float64, so the >= cut agrees bit-for-bit. Survivor rule is
    ``semantic_dedup``'s one-hop lowest-id keeper: drop every id appearing
    as the GREATER member of a qualifying pair."""
    values = ", ".join(f"({cid}, {mid})" for cid, mid in enumerate(medoid_ids))
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
          SELECT m.cid, v.v AS c
          FROM (VALUES {values}) AS m(cid, mid)
          JOIN v ON v.vec_id = m.mid
        ),
        assigned AS (
          SELECT vec_id, v, cid FROM (
            SELECT v.vec_id, v.v, c.cid,
                   row_number() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY list_inner_product(v.v, v.v)
                              - 2 * list_inner_product(v.v, c.c)
                              + list_inner_product(c.c, c.c),
                              c.cid
                   ) AS rn
            FROM v CROSS JOIN cents c
          ) WHERE rn = 1
        ),
        losers AS (
          SELECT DISTINCT b.vec_id
          FROM assigned a JOIN assigned b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE list_inner_product(a.v, b.v)
                / (sqrt(list_inner_product(a.v, a.v))
                   * sqrt(list_inner_product(b.v, b.v))) >= {threshold!r}
        )
        SELECT a.vec_id, CAST(a.cid AS INT) AS ivf_list
        FROM assigned a
        WHERE a.vec_id NOT IN (SELECT vec_id FROM losers)
        ORDER BY a.vec_id
    """


@register(
    "semantic_dedup",
    "SemDeDup semantic deduplication (Abbas et al. 2023): cluster the "
    "embedding space (seed-medoid centroids here, so DuckDB reproduces the "
    "assignment bit-exactly; KMeans is the production path), compare cosine "
    "ONLY within a cluster, drop every vector with cosine >= threshold to a "
    "lower-id cluster-mate. Quadratic work is local to each list — the "
    "100 TB shape is n_lists scaled to bound per-list occupancy",
    oracle=_semdedup_oracle_sql(_SEMDEDUP_MEDOID_IDS, _SEMDEDUP_THRESHOLD),
    tags=("similarity", "dedup"),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.medoid_centroids(emb, _SEMDEDUP_MEDOID_IDS)
    # testdata embeddings land in ONE parquet split, which would serialize
    # the per-row assignment folds on a single task (widen_small_input
    # no-ops on real many-split corpora); assignment — the expensive half
    # at 32 centroids — runs ONCE into a pinned frame that both the pair
    # stage (list_col passthrough) and the output columns reuse
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import _pin

    wide = widen_small_input(emb)
    assigned = _pin(
        wide.select(
            "vec_id",
            "embedding",
            similarity.assign_to_centroids(F.col("embedding"), cents)
            .cast("int")
            .alias("ivf_list"),
        ),
        True,
    )
    pairs = similarity.semantic_dedup_pairs(
        assigned, threshold=_SEMDEDUP_THRESHOLD, list_col="ivf_list"
    )
    losers = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        assigned.join(losers, "vec_id", "left_anti")
        .select("vec_id", "ivf_list")
        .orderBy("vec_id")
    )


@register(
    "semantic_dedup_incremental",
    "The r13 SemanticDedupIndex under the cross-engine hash gate: the "
    "embeddings table arrives as TWO id-ordered batches through the "
    "incremental store (build with the same seed-medoid centroids, "
    "dedup_batch per batch — store probe with pruned list scans + "
    "in-batch lowest-id + append). Because batches arrive in id order, "
    "arrival-order precedence composes to exactly the one-shot "
    "lowest-id façade, so the oracle is the SAME DuckDB SemDeDup SQL "
    "as the batch entry — a drift between the incremental and batch "
    "paths (probe miss, replay leak, wrong precedence) hash-mismatches",
    oracle=_semdedup_oracle_sql(_SEMDEDUP_MEDOID_IDS, _SEMDEDUP_THRESHOLD),
    tags=("dedup",),
    extra=True,
)
def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = widen_small_input(load_table(spark, sf_dir, "embeddings"))
    cents = similarity.medoid_centroids(emb, _SEMDEDUP_MEDOID_IDS)
    path = tempfile.mkdtemp(prefix="semdedup-idx-") + "/store"
    idx = similarity.SemanticDedupIndex.build(
        emb.limit(0), path, threshold=_SEMDEDUP_THRESHOLD, centroids=cents
    )
    cut = emb.agg(F.max("vec_id")).collect()[0][0] // 2  # bounded driver agg
    parts = []
    for batch in (
        emb.filter(F.col("vec_id") <= cut),
        emb.filter(F.col("vec_id") > cut),
    ):
        parts.append(idx.dedup_batch(batch))
    out = parts[0].unionByName(parts[1])
    return (
        out.select(
            "vec_id",
            similarity.assign_to_centroids(F.col("embedding"), cents)
            .cast("int")
            .alias("ivf_list"),
        )
        .orderBy("vec_id")
    )


@register(
    "corpus_split",
    "Deterministic train/heldout split (operators/sampling.py "
    "split_column): a doc lands on exactly one side as a pure function of "
    "md5('split|doc_id') — reproducible across engines and re-runs, no "
    "Bernoulli drift. Single-pass label column (ONE corpus scan; the "
    "two-frame split_train_heldout union would scan twice). Summarized "
    "per (source, split)",
    oracle="""
        WITH b AS (
            SELECT source, n_chars,
                   ('0x' || substr(md5('split' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 1000000 AS bucket
            FROM documents
        )
        SELECT source,
               CASE WHEN bucket < 100000 THEN 'heldout' ELSE 'train' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM b
        GROUP BY source, split
        ORDER BY source, split
    """,
    tags=("llm", "sampling"),
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        split_column,
    )

    d = load_table(spark, sf_dir, "documents")
    both = split_column(d, "doc_id", heldout_frac=0.1)
    return (
        both.groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


_SPAN = 8  # testdata docs repeat 8-token templates across documents


@register(
    "repeated_span_positions",
    "ExactSubstr detection (Lee et al. 2022): (doc_id, pos) of every "
    "8-token window recurring in >= 2 distinct documents — shuffle carries "
    "ids+md5+ints only. EXTRA: oracle-checked by the pytest parity harness "
    "outside the 50-cap catalog",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array({_NORM_SQL}, '\\s+') AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id, i - 1 AS pos,
                 md5(array_to_string(t[i:i+{_SPAN - 1}], ' ')) AS h
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, GREATEST(len(t) - {_SPAN} + 1, 0))) AS i
          )
        ),
        dup AS (
          SELECT h FROM (
            SELECT h, COUNT(DISTINCT doc_id) AS d FROM grams GROUP BY h
          ) WHERE d >= 2 AND d <= 10000
        )
        SELECT g.doc_id, CAST(g.pos AS INT) AS pos
        FROM grams g JOIN dup USING (h)
        ORDER BY g.doc_id, pos
    """,
    tags=("dedup",),
    extra=True,
)
def q_repeated_span_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_small_input(load_table(spark, sf_dir, "documents"))
    return (
        dedup.repeated_span_positions(docs, "doc_id", "text", span=_SPAN)
        .select("doc_id", F.col("pos").cast("int").alias("pos"))
        .orderBy("doc_id", "pos")
    )


@register(
    "contamination_scores",
    "Graded benchmark contamination: per-doc fraction of distinct 13-grams "
    "found anywhere in the benchmark (docs 0-4 stand in as the eval set). "
    "EXTRA: oracle-checked by the pytest parity harness outside the 50-cap "
    "catalog",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array({_NORM_SQL}, '\\s+') AS t
          FROM documents
        ),
        gr AS (
          SELECT doc_id, md5(array_to_string(t[i:i+12], ' ')) AS h
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, GREATEST(len(t) - 12, 0))) AS i
          )
        ),
        gset AS (SELECT DISTINCT doc_id, h FROM gr),
        totals AS (
          SELECT doc_id, CAST(COUNT(*) AS INT) AS n_grams
          FROM gset GROUP BY doc_id
        ),
        bench AS (SELECT DISTINCT h FROM gset WHERE doc_id < 5),
        matched AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched
          FROM gset JOIN bench USING (h) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(t.n_grams, 0) AS INT) AS n_grams,
               CAST(COALESCE(m.n_matched, 0) AS BIGINT) AS n_matched,
               CASE WHEN COALESCE(t.n_grams, 0) > 0
                    THEN CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / t.n_grams
                    ELSE 0.0 END AS score
        FROM documents d
        LEFT JOIN totals t USING (doc_id)
        LEFT JOIN matched m USING (doc_id)
        ORDER BY d.doc_id
    """,
    tags=("dedup", "text"),
    extra=True,
)
def q_contamination_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_small_input(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    return (
        dedup.contamination_scores(
            docs, bench, "doc_id", "text",
            bench_id_col="bid", bench_text_col="btext", n=13,
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("n_matched").cast("bigint").alias("n_matched"),
            "score",
        )
        .orderBy("doc_id")
    )


def _lsh_knn_join_oracle_sql(n_planes: int = 8, k: int = 5) -> str:
    """DuckDB oracle for the batched LSH kNN join: both sides bucket with
    the same inlined hyperplanes (bit-identical fold dots — the proven
    `_lsh_oracle_sql` machinery), probes expand to their bucket + hamming-1
    neighbors, and a pair can meet in at most one bucket, so the SQL needs
    no dedup either."""
    multiprobe = "\n          ".join(
        f"UNION ALL SELECT probe_id, p, xor(b, {1 << i}) AS b FROM probes"
        for i in range(n_planes)
    )
    return f"""
        WITH bucketed AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 {_bucket_expr_sql(n_planes)} AS bucket
          FROM embeddings
        ),
        probes AS (
          SELECT vec_id AS probe_id, v AS p, bucket AS b
          FROM bucketed WHERE vec_id < 5
        ),
        expanded AS (
          SELECT probe_id, p, b FROM probes
          {multiprobe}
        ),
        scored AS (
          SELECT e.probe_id, c.vec_id,
                 list_inner_product(c.v, e.p)
                 / (sqrt(list_inner_product(c.v, c.v))
                    * sqrt(list_inner_product(e.p, e.p))) AS sim
          FROM bucketed c JOIN expanded e ON c.bucket = e.b
          WHERE c.vec_id >= 5
        )
        SELECT probe_id, vec_id,
               CAST(CAST(ROUND(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cosine_sim,
               CAST(rn AS INT) AS rank
        FROM (
          SELECT probe_id, vec_id, sim,
                 ROW_NUMBER() OVER (
                   PARTITION BY probe_id ORDER BY sim DESC, vec_id
                 ) AS rn
          FROM scored
        ) WHERE rn <= {k}
        ORDER BY probe_id, rank
    """


@register(
    "lsh_knn_join",
    "Batched approximate kNN join: probes expand to their sign-LSH bucket "
    "+ hamming-1 neighbors, scoring only inside the bucket equi-join — the "
    "scale form of the exact kNN join. EXTRA: oracle-checked by the pytest "
    "parity harness outside the 50-cap catalog (hyperplanes inlined as SQL "
    "literals, bucket membership bit-identical)",
    oracle=_lsh_knn_join_oracle_sql(),
    tags=("similarity", "join"),
    extra=True,
)
def q_lsh_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    out = similarity.lsh_knn_join(
        corpus, probes, k=5, n_planes=8, seed=42, multiprobe=True, dim=64
    )
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("cosine_sim"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("cosine_sim"),
        "rank",
    ).orderBy("probe_id", "rank")


def _ivf_knn_join_oracle_sql(
    medoid_ids: list[int], n_probe: int = 2, k: int = 5
) -> str:
    """DuckDB oracle for the batched IVF kNN join: seed-medoid assignment
    (bit-identical d2 folds, ties to lowest cid — the `_ivf_oracle_sql`
    machinery), per-probe nearest-list expansion via the same ranking, and
    scoring only where the corpus row's list is among the probe's lists."""
    values = ", ".join(f"({cid}, {mid})" for cid, mid in enumerate(medoid_ids))
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
          SELECT m.cid, v.v AS c
          FROM (VALUES {values}) AS m(cid, mid)
          JOIN v ON v.vec_id = m.mid
        ),
        ranked AS (
          SELECT v.vec_id, v.v, c.cid,
                 row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_inner_product(v.v, v.v)
                            - 2 * list_inner_product(v.v, c.c)
                            + list_inner_product(c.c, c.c),
                            c.cid
                 ) AS rn
          FROM v CROSS JOIN cents c
        ),
        assigned AS (SELECT vec_id, v, cid FROM ranked WHERE rn = 1),
        plists AS (
          SELECT vec_id AS probe_id, v AS p, cid
          FROM ranked WHERE vec_id < 5 AND rn <= {n_probe}
        ),
        scored AS (
          SELECT e.probe_id, a.vec_id,
                 list_inner_product(a.v, e.p)
                 / (sqrt(list_inner_product(a.v, a.v))
                    * sqrt(list_inner_product(e.p, e.p))) AS sim
          FROM assigned a JOIN plists e ON a.cid = e.cid
          WHERE a.vec_id >= 5
        )
        SELECT probe_id, vec_id,
               CAST(CAST(ROUND(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cosine_sim,
               CAST(rn AS INT) AS rank
        FROM (
          SELECT probe_id, vec_id, sim,
                 ROW_NUMBER() OVER (
                   PARTITION BY probe_id ORDER BY sim DESC, vec_id
                 ) AS rn
          FROM scored
        ) WHERE rn <= {k}
        ORDER BY probe_id, rank
    """


@register(
    "ivf_knn_join",
    "Batched approximate kNN join over LEARNED partitions: corpus assigned "
    "to nearest seed-medoid lists, probes expand to their 2 nearest lists "
    "— the IVF dual of lsh_knn_join, completing the batch-ANN oracle trio. "
    "EXTRA: oracle-checked by the pytest parity harness outside the 50-cap "
    "catalog",
    oracle=_ivf_knn_join_oracle_sql(_IVF_MEDOID_IDS),
    tags=("similarity", "join"),
    extra=True,
)
def q_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.medoid_centroids(emb, _IVF_MEDOID_IDS)
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    out = similarity.ivf_knn_join(corpus, probes, cents, k=5, n_probe=2)
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("cosine_sim"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("cosine_sim"),
        "rank",
    ).orderBy("probe_id", "rank")


@register(
    "char_entropy_signal",
    "Character-entropy quality signal (functions/text.py char_entropy): "
    "Shannon bits/char as a PURE-CODEGEN sorted-run fold (no UDF, no "
    "explode — run lengths from adjacent-difference over sorted-array "
    "boundaries), oracled against the straightforward per-char unnest + "
    "histogram SQL; ROUND(,6) absorbs the summation-order difference. "
    "EXTRA: oracle-checked by the pytest parity harness outside the "
    "50-cap catalog",
    oracle="""
        WITH t AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id < 300 AND length(text) > 0
        ),
        ch AS (
          SELECT doc_id, substr(text, i, 1) AS c, length(text) AS n
          FROM t, LATERAL (
            SELECT unnest(generate_series(1, length(text))) AS i
          )
        ),
        h AS (
          SELECT doc_id, n, COUNT(*) AS cnt
          FROM ch GROUP BY doc_id, c, n
        )
        SELECT doc_id,
               CAST(CAST(ROUND(
                 -SUM((cnt * 1.0 / n) * log2(cnt * 1.0 / n)), 6)
                 AS DECIMAL(18,6)) AS DOUBLE) AS entropy
        FROM h
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("text", "quality"),
    extra=True,
)
def q_char_entropy_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        char_entropy,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 300) & (F.length("text") > 0)
    )
    return docs.select(
        "doc_id",
        F.round(char_entropy(F.col("text")), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("entropy"),
    ).orderBy("doc_id")


@register(
    "scd2_user_history",
    "SCD2 version table from a change feed (operators/scd.py "
    "scd2_history): one hash exchange + lead window (never the corpus² "
    "next-version self-join), delete ops ('error' events here) close "
    "intervals without emitting versions — interval bounds, tie-broken "
    "ordering and is_current all hash-checked against the equivalent SQL "
    "window. EXTRA: oracle-checked by the pytest parity harness outside "
    "the 50-cap catalog",
    oracle="""
        WITH v AS (
          SELECT user_id, value, ts, event_type,
                 lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS valid_to
          FROM events
        )
        SELECT user_id, value, ts AS valid_from, valid_to,
               (valid_to IS NULL) AS is_current
        FROM v
        WHERE COALESCE(event_type <> 'error', TRUE)
        ORDER BY user_id, valid_from
    """,
    tags=("scd", "temporal"),
    extra=True,
)
def q_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.scd import scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_id", "event_type"
    )
    hist = scd2_history(
        ev, "user_id", "ts", op_col="event_type", seq_col="event_id",
        delete_ops=("error",),
    )
    return hist.select(
        "user_id", "value", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from")


@register(
    "ccnet_perplexity_buckets",
    "CCNet head/middle/tail bucketing (functions/lm.py perplexity_buckets): "
    "thresholds from ONE exact percentile aggregate (never a global "
    "NTILE/sort), assignment a narrow CASE — oracled against DuckDB's "
    "quantile_cont with the same linear-interpolation definition (the "
    "score is an integer length so interpolated thresholds are "
    "bit-stable cross-engine). EXTRA: oracle-checked by the pytest "
    "parity harness outside the 50-cap catalog",
    oracle="""
        WITH s AS (
          SELECT doc_id, CAST(length(text) AS DOUBLE) AS score
          FROM documents
        ),
        t AS (
          SELECT quantile_cont(score, [1.0/3, 2.0/3]) AS th FROM s
        )
        SELECT doc_id, score,
               CASE WHEN score <= th[1] THEN 'head'
                    WHEN score <= th[2] THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM s CROSS JOIN t
        ORDER BY doc_id
    """,
    tags=("lm", "sampling"),
    extra=True,
)
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.lm import (
        perplexity_buckets,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("double").alias("score")
    )
    return perplexity_buckets(docs, "score").orderBy("doc_id")


@register(
    "sampled_frames",
    "Video frame-sampling plumbing (operators/multimodal.py "
    "sample_frames): one row per 64-byte offset of each payload via "
    "posexplode over a computed sequence — pure Spark, no Python in the "
    "hot path; the oracle reproduces the offset grid with "
    "generate_series over the same utf-8 payload lengths. EXTRA: "
    "oracle-checked by the pytest parity harness outside the 50-cap "
    "catalog",
    oracle="""
        WITH t AS (
          SELECT doc_id, octet_length(encode(text)) AS n
          FROM documents WHERE doc_id < 300
        ),
        s AS (
          SELECT doc_id,
                 unnest(generate_series(
                   0, GREATEST(CAST(FLOOR(n / 64.0) AS INT) - 1, 0))) AS step
          FROM t
        )
        SELECT doc_id AS media_id,
               CAST(step AS INT) AS frame_no,
               CAST(step * 64 AS INT) AS byte_offset
        FROM s
        ORDER BY media_id, frame_no
    """,
    tags=("multimodal",),
    extra=True,
)
def q_sampled_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = multimodal.attach_binary_column(docs, "text", "doc_id")
    return multimodal.sample_frames(media, every_n_bytes=64).orderBy(
        "media_id", "frame_no"
    )


@register(
    "pii_redaction",
    "PII redaction + audit counts (operators/chunking.py redact_pii / "
    "pii_counts): the codegen regexp_replace chain (emails→IPv4→phones→"
    "SSNs, order-sensitive) and per-kind match counts, oracled against "
    "DuckDB's RE2 with the same patterns — the fixture text embeds every "
    "PII kind via md5-derived digits so the corpus genuinely exercises "
    "each rule. EXTRA: oracle-checked by the pytest parity harness "
    "outside the 50-cap catalog",
    oracle=r"""
        WITH t AS (
          SELECT doc_id,
                 text || ' contact u' || substr(md5(text), 1, 4)
                   || '@ex' || substr(md5(text), 5, 2) || '.com or call '
                   || CAST(100 + CAST(('0x' || substr(md5(text), 9, 2))::BIGINT
                           AS INT) % 900 AS VARCHAR)
                   || '-555-'
                   || lpad(CAST(CAST(('0x' || substr(md5(text), 11, 3))::BIGINT
                           AS INT) % 10000 AS VARCHAR), 4, '0')
                   || ' ip 10.0.'
                   || CAST(CAST(('0x' || substr(md5(text), 14, 2))::BIGINT
                           AS INT) % 256 AS VARCHAR)
                   || '.7 ssn 123-45-6789' AS s
          FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(s,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                     '\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b',
                     '<IP>', 'g'),
                   '(?:\+?[0-9]{1,3}[-. ]?)?(?:\([0-9]{3}\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b',
                   '<PHONE>', 'g'),
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g')
                 AS redacted,
               CAST(len(regexp_extract_all(s,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
                 AS n_email,
               CAST(len(regexp_extract_all(s,
                 '\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b')) AS INT)
                 AS n_ipv4,
               CAST(len(regexp_extract_all(s,
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssn
        FROM t
        ORDER BY doc_id
    """,
    tags=("chunking", "pii"),
    extra=True,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.chunking import (
        pii_counts,
        redact_pii,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    md5 = F.md5(F.col("text"))
    s = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.substring(md5, 1, 4),
        F.lit("@ex"), F.substring(md5, 5, 2), F.lit(".com or call "),
        (
            F.lit(100)
            + F.conv(F.substring(md5, 9, 2), 16, 10).cast("int") % 900
        ).cast("string"),
        F.lit("-555-"),
        F.lpad(
            (F.conv(F.substring(md5, 11, 3), 16, 10).cast("int") % 10000)
            .cast("string"),
            4,
            "0",
        ),
        F.lit(" ip 10.0."),
        (F.conv(F.substring(md5, 14, 2), 16, 10).cast("int") % 256).cast(
            "string"
        ),
        F.lit(".7 ssn 123-45-6789"),
    )
    counts = pii_counts(s)
    return docs.select(
        "doc_id",
        redact_pii(s).alias("redacted"),
        counts["email"].cast("int").alias("n_email"),
        counts["ipv4"].cast("int").alias("n_ipv4"),
        counts["ssn"].cast("int").alias("n_ssn"),
    ).orderBy("doc_id")


@register(
    "chunked_documents",
    "Token-window chunking (operators/chunking.py chunk_by_tokens): "
    "max_tokens=40 / overlap=10 sliding windows as pure JVM array algebra "
    "(sequence → slice → posexplode, one narrow no-shuffle projection), "
    "oracled against the equivalent generate_series + list_slice SQL — "
    "start grid, tail rule (no overlap-only tail chunk), chunk ids and "
    "reassembled text all hash-checked. EXTRA: oracle-checked by the "
    "pytest parity harness outside the 50-cap catalog",
    oracle=r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(
                   str_split(
                     lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
                   x -> x <> '') AS toks
          FROM documents WHERE doc_id < 300
        ),
        s AS (
          SELECT doc_id, toks,
                 unnest(generate_series(1, GREATEST(len(toks) - 10, 1), 30))
                   AS st
          FROM t WHERE len(toks) > 0
        ),
        c AS (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY st) - 1 AS INT) AS chunk_id,
                 list_slice(toks, st, st + 39) AS ctoks
          FROM s
        )
        SELECT doc_id, chunk_id,
               array_to_string(ctoks, ' ') AS chunk_text,
               CAST(len(ctoks) AS INT) AS n_tokens
        FROM c
        ORDER BY doc_id, chunk_id
    """,
    tags=("chunking",),
    extra=True,
)
def q_chunked_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.chunking import (
        chunk_by_tokens,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return chunk_by_tokens(
        docs, "doc_id", "text", max_tokens=40, overlap=10
    ).orderBy("doc_id", "chunk_id")


@register(
    "budget_shards",
    "Token-budget shard assignment (operators/export.py "
    "budget_shard_column): the two-pass DISTRIBUTED prefix sum (range "
    "exchange pinned, per-partition totals collected as control-plane "
    "offsets, within-partition window) must equal the textbook global "
    "running-sum window the oracle runs — floor(cumulative-start / budget). "
    "EXTRA: oracle-checked by the pytest parity harness outside the 50-cap "
    "catalog",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS sz,
               CAST(FLOOR(
                 (SUM(length(text)) OVER (
                    ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                  - length(text)) / 10000.0
               ) AS INT) AS shard
        FROM documents
        ORDER BY doc_id
    """,
    tags=("export",),
    extra=True,
)
def q_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.export import (
        budget_shard_column,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("sz"), "text"
    )
    return (
        budget_shard_column(docs, "sz", budget=10_000, order_col="doc_id")
        .select("doc_id", "sz", "shard")
        .orderBy("doc_id")
    )


# PQ: 8-entry seed-medoid codebooks over m=4 subspaces of the 64-dim
# embeddings (dsub=16) — same SQL-reconstructable-medoid trick as IVF
_PQ_MEDOID_IDS = [7, 61, 127, 199, 263, 331, 401, 467]
_PQ_M = 4
_PQ_DSUB = 16


def _pq_adc_oracle_sql(medoid_ids: list[int], k: int = 10) -> str:
    """DuckDB oracle for PQ ADC top-k: rebuild the seed-medoid codebooks by
    slicing the SAME parquet rows, encode every corpus vector per subspace
    with the bit-identical d2 argmin (ties to lowest cid — the IVF oracle's
    machinery), then score by ADC cosine: Σ_j <p_j, c_j> over
    sqrt(<p,p>)·sqrt(Σ_j <c_j,c_j>) — exactly the distance to the
    reconstruction. ROUND(,6) absorbs the j-summation-order difference
    between Spark's fixed left-to-right add chain and SQL SUM."""
    values = ", ".join(f"({cid}, {mid})" for cid, mid in enumerate(medoid_ids))
    subs = ", ".join(f"({j})" for j in range(1, _PQ_M + 1))
    d = _PQ_DSUB
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        probe AS (SELECT v AS p FROM v WHERE vec_id = 0),
        subs AS (SELECT j FROM (VALUES {subs}) AS s(j)),
        med AS (
          SELECT m.cid, v.v FROM (VALUES {values}) AS m(cid, mid)
          JOIN v ON v.vec_id = m.mid
        ),
        books AS (
          SELECT s.j, med.cid,
                 list_slice(med.v, (s.j-1)*{d}+1, s.j*{d}) AS c
          FROM subs s CROSS JOIN med
        ),
        slices AS (
          SELECT c.vec_id, s.j,
                 list_slice(c.v, (s.j-1)*{d}+1, s.j*{d}) AS sub
          FROM (SELECT vec_id, v FROM v WHERE vec_id >= 5) c
          CROSS JOIN subs s
        ),
        encoded AS (
          SELECT vec_id, j, cid, c FROM (
            SELECT sl.vec_id, sl.j, b.cid, b.c,
                   row_number() OVER (
                     PARTITION BY sl.vec_id, sl.j
                     ORDER BY list_inner_product(sl.sub, sl.sub)
                              - 2 * list_inner_product(sl.sub, b.c)
                              + list_inner_product(b.c, b.c),
                              b.cid
                   ) AS rn
            FROM slices sl JOIN books b ON b.j = sl.j
          ) WHERE rn = 1
        ),
        scored AS (
          SELECT e.vec_id,
                 SUM(list_inner_product(
                       list_slice(p.p, (e.j-1)*{d}+1, e.j*{d}), e.c)) AS ip,
                 SUM(list_inner_product(e.c, e.c)) AS cc
          FROM encoded e CROSS JOIN probe p
          GROUP BY e.vec_id
        ),
        final AS (
          SELECT s.vec_id,
                 s.ip / (sqrt(list_inner_product(p.p, p.p)) * sqrt(s.cc))
                   AS cosv
          FROM scored s CROSS JOIN probe p
        )
        SELECT vec_id,
               CAST(CAST(ROUND(cosv, 6) AS DECIMAL(18,6)) AS DOUBLE)
                 AS adc_cosine,
               CAST(rn AS INT) AS rank
        FROM (
          SELECT vec_id, cosv,
                 ROW_NUMBER() OVER (ORDER BY cosv DESC, vec_id) AS rn
          FROM final
        ) WHERE rn <= {k}
        ORDER BY rank
    """


@register(
    "pq_adc_topk",
    "Product-quantization ANN (operators/pq.py): seed-medoid codebooks over "
    "4 subspaces, pure-JVM per-subspace encode (no UDF), asymmetric-distance "
    "cosine top-k where a row's score is EXACTLY the probe-to-reconstruction "
    "cosine — codes are 4 bytes vs 512, and the embedding column is never "
    "read at probe time. EXTRA: oracle-checked by the pytest parity harness "
    "outside the 50-cap catalog",
    oracle=_pq_adc_oracle_sql(_PQ_MEDOID_IDS),
    tags=("similarity",),
    extra=True,
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sample_dms_kinesis_rds_mariadb_spark.functions.vectors import (
        to_double_array,
    )
    from sample_dms_kinesis_rds_mariadb_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.medoid_pq_codebooks(emb, _PQ_MEDOID_IDS, m=_PQ_M)
    probe = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select(to_double_array(F.col("embedding")))
        .first()[0]
    ]
    codes = pq.pq_encode(emb.filter(F.col("vec_id") >= 5), books)
    out = pq.pq_adc_topk(codes, books, probe, k=10, metric="cosine")
    w = F.row_number().over(
        Window.orderBy(F.col("adc_cosine").desc(), F.col("vec_id"))
    )
    return (
        out.withColumn("rank", w)
        .select(
            "vec_id",
            F.round(F.col("adc_cosine"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("adc_cosine"),
            "rank",
        )
        .orderBy("rank")
    )


def _pq_adc_batch_oracle_sql(
    medoid_ids: list[int], n_probes: int = 4, k: int = 10
) -> str:
    """DuckDB oracle for BATCH PQ ADC: the single-probe oracle generalized
    to a probe SET (vec_id < n_probes) with a per-probe ranking window —
    every (probe, corpus row) ADC cosine is the probe-to-reconstruction
    cosine, top-k per probe. ROUND(,6) absorbs the j-summation-order
    difference as in the single-probe entry."""
    values = ", ".join(f"({cid}, {mid})" for cid, mid in enumerate(medoid_ids))
    subs = ", ".join(f"({j})" for j in range(1, _PQ_M + 1))
    d = _PQ_DSUB
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        probes AS (
          SELECT CAST(vec_id AS VARCHAR) AS probe_id, v AS p
          FROM v WHERE vec_id < {n_probes}
        ),
        subs AS (SELECT j FROM (VALUES {subs}) AS s(j)),
        med AS (
          SELECT m.cid, v.v FROM (VALUES {values}) AS m(cid, mid)
          JOIN v ON v.vec_id = m.mid
        ),
        books AS (
          SELECT s.j, med.cid,
                 list_slice(med.v, (s.j-1)*{d}+1, s.j*{d}) AS c
          FROM subs s CROSS JOIN med
        ),
        slices AS (
          SELECT c.vec_id, s.j,
                 list_slice(c.v, (s.j-1)*{d}+1, s.j*{d}) AS sub
          FROM (SELECT vec_id, v FROM v WHERE vec_id >= 5) c
          CROSS JOIN subs s
        ),
        encoded AS (
          SELECT vec_id, j, cid, c FROM (
            SELECT sl.vec_id, sl.j, b.cid, b.c,
                   row_number() OVER (
                     PARTITION BY sl.vec_id, sl.j
                     ORDER BY list_inner_product(sl.sub, sl.sub)
                              - 2 * list_inner_product(sl.sub, b.c)
                              + list_inner_product(b.c, b.c),
                              b.cid
                   ) AS rn
            FROM slices sl JOIN books b ON b.j = sl.j
          ) WHERE rn = 1
        ),
        scored AS (
          SELECT pr.probe_id, e.vec_id,
                 SUM(list_inner_product(
                       list_slice(pr.p, (e.j-1)*{d}+1, e.j*{d}), e.c)) AS ip,
                 SUM(list_inner_product(e.c, e.c)) AS cc,
                 ANY_VALUE(list_inner_product(pr.p, pr.p)) AS pp
          FROM encoded e CROSS JOIN probes pr
          GROUP BY pr.probe_id, e.vec_id
        ),
        final AS (
          SELECT probe_id, vec_id, ip / (sqrt(pp) * sqrt(cc)) AS cosv
          FROM scored
        )
        -- rank on the ROUNDED score: near-equal sums can order differently
        -- across engines (summation-order float noise); at 6 decimals both
        -- see identical values and the vec_id tie-break is deterministic
        SELECT probe_id, vec_id, adc_cosine, CAST(rn AS INT) AS rank
        FROM (
          SELECT probe_id, vec_id,
                 CAST(CAST(ROUND(cosv, 6) AS DECIMAL(18,6)) AS DOUBLE)
                   AS adc_cosine,
                 ROW_NUMBER() OVER (
                   PARTITION BY probe_id
                   ORDER BY CAST(CAST(ROUND(cosv, 6) AS DECIMAL(18,6))
                                 AS DOUBLE) DESC, vec_id
                 ) AS rn
          FROM final
        ) WHERE rn <= {k}
        ORDER BY probe_id, rank
    """


@register(
    "pq_adc_batch_topk",
    "BATCH product-quantization ANN (operators/pq.py pq_adc_batch_topk): a "
    "4-probe eval set answered in ONE codes scan + ONE plan compile — LUTs "
    "travel as a broadcast (probe_id, lut, pp) frame instead of plan "
    "literals, per-probe top-k via a map-side WindowGroupLimit window. The "
    "batch dual that kills the per-probe Catalyst-compile bottleneck. "
    "EXTRA: oracle-checked by the pytest parity harness outside the 50-cap "
    "catalog",
    oracle=_pq_adc_batch_oracle_sql(_PQ_MEDOID_IDS),
    tags=("similarity",),
    extra=True,
)
def q_pq_adc_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.vectors import (
        to_double_array,
    )
    from sample_dms_kinesis_rds_mariadb_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.medoid_pq_codebooks(emb, _PQ_MEDOID_IDS, m=_PQ_M)
    probes = {
        int(r["_id"]): [float(x) for x in r["_v"]]
        for r in emb.filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("_id"),
            to_double_array(F.col("embedding")).alias("_v"),
        )
        .collect()
    }
    codes = pq.pq_encode(emb.filter(F.col("vec_id") >= 5), books)
    # over-fetch, then re-rank on the ROUNDED score: near-equal ADC sums
    # can order differently across engines (summation-order float noise);
    # at 6 decimals both engines see identical values and the vec_id
    # tie-break is deterministic
    from pyspark.sql import Window

    out = pq.pq_adc_batch_topk(codes, books, probes, k=30, metric="cosine")
    rounded = out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("adc_cosine"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("adc_cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc_cosine").desc(), F.col("vec_id")
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("probe_id", "rank")
    )


_DHASH_ROWS = ", ".join(f"({i})" for i in range(8))
_DHASH_COLS = ", ".join(f"({j})" for j in range(9))


@register(
    "image_dhash_fingerprints",
    "Perceptual image fingerprints (operators/image_dedup.py): VALID binary "
    "PPM images synthesized from the text column, REAL pixel decode + "
    "nearest-neighbor 9x8 resize + integer BT.601 luma + difference-hash "
    "bit-pack, all via Arrow mapInPandas — FULLY oracle-checked: the oracle "
    "rebuilds the identical pixel bytes in SQL and replays the whole "
    "decode->resize->luma->bit chain (floor index map, weighted-sum "
    "comparisons, per-32-bit-half packing). EXTRA: oracle-checked by the "
    "pytest parity harness outside the 50-cap catalog",
    oracle=f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(FLOOR((length(text) + 48) / 48) AS INT) AS h,
                 md5(text) AS m
          FROM documents WHERE doc_id < 300
        ),
        px AS (
          SELECT doc_id, h,
                 substr(repeat(m, CAST(CEIL(h * 48.0 / 32) AS INT)),
                        1, h * 48) AS pixels
          FROM base
        ),
        ri AS (SELECT i FROM (VALUES {_DHASH_ROWS}) AS r(i)),
        cj AS (SELECT j FROM (VALUES {_DHASH_COLS}) AS c(j)),
        -- integer luma at each of the 8x9 resized positions: source pixel
        -- (i*h)//8, (j*16)//9 of the 16-wide RGB buffer, no division
        lum AS (
          SELECT p.doc_id, ri.i, cj.j,
                 299 * ascii(substr(p.pixels,
                       ((ri.i * p.h) // 8) * 48 + ((cj.j * 16) // 9) * 3 + 1, 1))
               + 587 * ascii(substr(p.pixels,
                       ((ri.i * p.h) // 8) * 48 + ((cj.j * 16) // 9) * 3 + 2, 1))
               + 114 * ascii(substr(p.pixels,
                       ((ri.i * p.h) // 8) * 48 + ((cj.j * 16) // 9) * 3 + 3, 1))
                 AS w
          FROM px p CROSS JOIN ri CROSS JOIN cj
        ),
        bits AS (
          SELECT a.doc_id, a.i, a.j,
                 CASE WHEN a.w > b.w THEN 1 ELSE 0 END AS bit
          FROM lum a JOIN lum b
            ON a.doc_id = b.doc_id AND a.i = b.i AND b.j = a.j + 1
          WHERE a.j < 8
        )
        SELECT doc_id AS media_id,
               CAST(SUM(CASE WHEN i * 8 + j >= 32
                    THEN bit * (CAST(1 AS BIGINT) << (i * 8 + j - 32))
                    ELSE 0 END) AS BIGINT) AS dhash_hi,
               CAST(SUM(CASE WHEN i * 8 + j < 32
                    THEN bit * (CAST(1 AS BIGINT) << (i * 8 + j))
                    ELSE 0 END) AS BIGINT) AS dhash_lo
        FROM bits GROUP BY doc_id ORDER BY media_id
    """,
    tags=("multimodal", "dedup"),
    extra=True,
)
def q_image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators import image_dedup

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = multimodal.attach_ppm_column(docs, "text", "doc_id")
    fps = image_dedup.image_fingerprints(
        media, fake_decode=False, methods=("dhash",)
    )
    # split the signed-64 fingerprint into two unsigned 32-bit halves so
    # the SQL oracle never needs 64-bit overflow arithmetic
    return fps.select(
        "media_id",
        F.shiftrightunsigned(F.col("dhash"), 32).alias("dhash_hi"),
        F.col("dhash").bitwiseAND(F.lit(0xFFFFFFFF)).alias("dhash_lo"),
    ).orderBy("media_id")


@register(
    "mih_hamming_near_pairs",
    "Multi-index-hashing hamming self-join (operators/image_dedup.py "
    "banded_hamming_pairs, r10): synthetic 60-bit fingerprints derived "
    "from md5 (SQL-rebuildable, a planted 1-bit near-dup every 8th row) "
    "joined at max_hamming=7 through the MIH default (4 wide 16-bit "
    "bands x 17-mask radius ball) must reproduce the brute-force "
    "all-pairs SQL EXACTLY — the generalized-pigeonhole exactness "
    "guarantee, proven against the oracle. EXTRA: oracle-checked by the "
    "pytest parity harness outside the 50-cap catalog",
    oracle="""
        WITH fp AS (
          SELECT doc_id,
                 xor(('0x' || substr(md5(CAST(doc_id // 8 AS VARCHAR)),
                                     1, 15))::BIGINT,
                     CASE WHEN doc_id % 8 = 0
                          THEN (CAST(1 AS BIGINT)
                                << CAST(doc_id % 61 AS INT))
                          ELSE CAST(0 AS BIGINT) END) AS f
          FROM documents WHERE doc_id < 1500
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.f, b.f)) <= 7
        ORDER BY id_a, id_b
    """,
    tags=("dedup", "multimodal"),
    extra=True,
)
def q_mih_hamming_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        banded_hamming_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 1500
    )
    base = F.conv(
        F.substring(
            F.md5(F.floor(F.col("doc_id") / 8).cast("long").cast("string")),
            1, 15,
        ), 16, 10,
    ).cast("long")
    fps = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(
            F.col("doc_id") % 8 == 0,
            base.bitwiseXOR(
                F.expr("shiftleft(1L, cast(doc_id % 61 AS INT))")
            ),
        ).otherwise(base).alias("dhash"),
    )
    return (
        banded_hamming_pairs(fps, max_hamming=7)  # MIH default banding
        .select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            F.col("hamming").cast("bigint").alias("hamming"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "sequence_alignment_near_dups",
    "Frame-sequence near-dup matching engine (operators/image_dedup.py "
    "sequence_near_pairs — the shared core behind video AND audio "
    "perceptual dedup): synthetic 32-bit frame fingerprints derived from "
    "md5 (SQL-rebuildable) with planted shared-frame structure; the "
    "pigeonhole-banded candidate join + exact hamming verify + "
    "temporal-alignment aggregate must reproduce the brute-force all-pairs "
    "SQL exactly. EXTRA: oracle-checked by the pytest parity harness "
    "outside the 50-cap catalog",
    oracle="""
        WITH frames AS (
          SELECT doc_id % 20 AS media_id,
                 CAST(doc_id // 20 AS INT) AS frame_no,
                 ('0x' || substr(md5(
                    CASE WHEN doc_id % 20 >= 10 AND doc_id // 20 < 15
                         THEN 'f' || CAST(doc_id % 20 - 10 AS VARCHAR)
                              || '|' || CAST(doc_id // 20 AS VARCHAR)
                         ELSE 'f' || CAST(doc_id % 20 AS VARCHAR)
                              || '|' || CAST(doc_id // 20 AS VARCHAR)
                    END), 1, 8))::BIGINT AS fp
          FROM documents WHERE doc_id < 400
        ),
        n AS (
          SELECT media_id, COUNT(*) AS n_frames FROM frames GROUP BY 1
        ),
        hits AS (
          SELECT a.media_id AS id_a, a.frame_no AS frame_a,
                 b.media_id AS id_b, b.frame_no AS frame_b
          FROM frames a JOIN frames b ON a.media_id < b.media_id
          WHERE bit_count(xor(a.fp, b.fp)) <= 3
        ),
        per_off AS (
          SELECT id_a, id_b, frame_b - frame_a AS off,
                 COUNT(DISTINCT frame_a) AS n
          FROM hits GROUP BY 1, 2, 3
        ),
        agg AS (
          SELECT h.id_a, h.id_b,
                 COUNT(DISTINCT h.frame_a) AS matched_frames,
                 (SELECT MAX(n) FROM per_off p
                  WHERE p.id_a = h.id_a AND p.id_b = h.id_b)
                   AS aligned_matches
          FROM hits h GROUP BY 1, 2
        )
        SELECT agg.id_a, agg.id_b,
               CAST(matched_frames AS BIGINT) AS matched_frames,
               CAST(aligned_matches AS BIGINT) AS aligned_matches,
               CAST(CAST(ROUND(
                 aligned_matches * 1.0 / LEAST(na.n_frames, nb.n_frames), 6)
                 AS DECIMAL(18,6)) AS DOUBLE) AS match_frac
        FROM agg
        JOIN n na ON na.media_id = agg.id_a
        JOIN n nb ON nb.media_id = agg.id_b
        WHERE aligned_matches * 1.0 / LEAST(na.n_frames, nb.n_frames) >= 0.5
        ORDER BY id_a, id_b
    """,
    tags=("multimodal", "dedup"),
    extra=True,
)
def q_sequence_alignment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        sequence_near_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    media_id = (F.col("doc_id") % 20).alias("media_id")
    frame_no = F.floor(F.col("doc_id") / 20).cast("int").alias("frame_no")
    # videos 10..19 share frames 0..14 with video v-10 (identical keys →
    # identical fingerprints); every other frame is md5-random
    key = F.when(
        (F.col("doc_id") % 20 >= 10) & (F.floor(F.col("doc_id") / 20) < 15),
        F.concat(
            F.lit("f"), (F.col("doc_id") % 20 - 10).cast("string"),
            F.lit("|"), F.floor(F.col("doc_id") / 20).cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("f"), (F.col("doc_id") % 20).cast("string"),
            F.lit("|"), F.floor(F.col("doc_id") / 20).cast("string"),
        )
    )
    fp = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long").alias("fp")
    frames = docs.select(media_id, frame_no, fp)
    out = sequence_near_pairs(
        frames, "fp", fp_bits=32, max_hamming=3, bands=4, min_frac=0.5
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("matched_frames").cast("bigint").alias("matched_frames"),
        F.col("aligned_matches").cast("bigint").alias("aligned_matches"),
        F.round(F.col("match_frac"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("match_frac"),
    ).orderBy("id_a", "id_b")


@register(
    "cap_per_group_sources",
    "Per-source document cap (operators/sampling.py cap_per_group) run "
    "through the prethin=True two-stage path: hot groups are map-side "
    "thinned on the cap's own md5 priority before the window, and the "
    "kept-set must still hash-match the plain SQL top-n — the prethin "
    "exactness guarantee, proven against the oracle. EXTRA: oracle-checked "
    "by the pytest parity harness outside the 50-cap catalog",
    oracle="""
        WITH ranked AS (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY ('0x' || substr(md5('cap' || '|' ||
                             CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                            % 1000000,
                            doc_id
                 ) AS rn
          FROM documents
        )
        SELECT doc_id, source FROM ranked
        WHERE rn <= 50
        ORDER BY source, doc_id
    """,
    tags=("sampling",),
    extra=True,
)
def q_cap_per_group_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        cap_per_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        cap_per_group(
            docs, "doc_id", "source", 50,
            prethin=True, prethin_factor=3.0,
        )
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@register(
    "decontaminate_bloom",
    "Bloom-prefiltered benchmark decontamination (docs 0-4 as the eval "
    "set): distributed-built Bloom flags candidates, exact verify on the "
    "flagged slice — survivors must hash-match plain SQL's exact 13-gram "
    "rule, proving the two-stage path drops nothing extra and misses "
    "nothing. EXTRA: oracle-checked by the pytest parity harness outside "
    "the 50-cap catalog",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array({_NORM_SQL}, '\\s+') AS t
          FROM documents
        ),
        gr AS (
          SELECT doc_id, md5(array_to_string(t[i:i+12], ' ')) AS h
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, GREATEST(len(t) - 12, 0))) AS i
          )
        ),
        gset AS (SELECT DISTINCT doc_id, h FROM gr),
        bench AS (SELECT DISTINCT h FROM gset WHERE doc_id < 5),
        dirty AS (SELECT DISTINCT doc_id FROM gset JOIN bench USING (h))
        SELECT d.doc_id, d.source
        FROM documents d LEFT JOIN dirty USING (doc_id)
        WHERE dirty.doc_id IS NULL
        ORDER BY d.doc_id
    """,
    tags=("dedup", "text"),
    extra=True,
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_small_input(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    return (
        dedup.decontaminate_bloom(
            docs, bench, "doc_id", "text",
            bench_id_col="bid", bench_text_col="btext", n=13,
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "url_domain_counts",
    "URL canonicalization + eTLD+1 extraction (functions/url.py) over "
    "URLs synthesized from the documents table (scheme/www/port/tracking-"
    "param/fragment noise injected): per-registered-domain doc counts and "
    "the lexicographically-first canonical URL must hash-match the oracle's "
    "directly-constructed expectations — proving scheme lowering, www/port/"
    "fragment stripping, tracking-param removal, param sorting, and the "
    "multi-label-suffix domain rule in one query. EXTRA: oracle-checked by "
    "the pytest parity harness outside the 50-cap catalog",
    oracle="""
        SELECT lower(source) || '.co.uk' AS domain,
               COUNT(*) AS n_docs,
               'http://' || lower(source) || '.co.uk/docs/' ||
                   lpad(CAST(MIN(doc_id) AS VARCHAR), 8, '0') || '?a=1&b=2'
                   AS sample_url
        FROM documents
        GROUP BY source
        ORDER BY domain
    """,
    tags=("text",),
    extra=True,
)
def q_url_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.url import (
        canonical_url,
        url_registered_domain,
    )

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTP://WWW."),
        F.col("source"),
        F.lit(".CO.UK:80/docs/"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0"),
        F.lit("?utm_source=x&b=2&a=1#frag"),
    )
    return (
        docs.select(
            canonical_url(url).alias("canon"),
            url_registered_domain(url).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("canon").alias("sample_url"),
        )
        .orderBy("domain")
    )


@register(
    "psl_registered_domain",
    "Full Public Suffix List algorithm (functions/url.py, psl= mode) over "
    "hosts synthesized from the documents table to hit every rule class — "
    "exact multi-depth (com / co.uk), *.ck wildcard, !www.ck exception, "
    "private-section suffix (blogspot.com), implicit * default — against "
    "an oracle that constructs the expected registrable domain directly "
    "per rule class. EXTRA: oracle-checked by the pytest parity harness "
    "outside the 50-cap catalog",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN 'h' || doc_id || '.sub.example.com'
                 WHEN 1 THEN 'h' || doc_id || '.shop.co.uk'
                 WHEN 2 THEN 'h' || doc_id || '.foo.ck'
                 WHEN 3 THEN 'h' || doc_id || '.www.ck'
                 WHEN 4 THEN 'h' || doc_id || '.something.zz'
                 ELSE 'me' || doc_id || '.blogspot.com'
               END AS host,
               CASE doc_id % 6
                 WHEN 0 THEN 'example.com'
                 WHEN 1 THEN 'shop.co.uk'
                 WHEN 2 THEN 'h' || doc_id || '.foo.ck'
                 WHEN 3 THEN 'www.ck'
                 WHEN 4 THEN 'something.zz'
                 ELSE 'me' || doc_id || '.blogspot.com'
               END AS domain
        FROM documents
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_psl_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.url import (
        parse_psl,
        url_registered_domain,
    )

    psl = parse_psl(
        ["com", "uk", "co.uk", "*.ck", "!www.ck", "blogspot.com", "zz"]
    )
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    host = (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.lit("h"), did, F.lit(".sub.example.com")),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(F.lit("h"), did, F.lit(".shop.co.uk")),
        )
        .when(
            F.col("doc_id") % 6 == 2,
            F.concat(F.lit("h"), did, F.lit(".foo.ck")),
        )
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(F.lit("h"), did, F.lit(".www.ck")),
        )
        .when(
            F.col("doc_id") % 6 == 4,
            F.concat(F.lit("h"), did, F.lit(".something.zz")),
        )
        .otherwise(F.concat(F.lit("me"), did, F.lit(".blogspot.com")))
    )
    return docs.select(
        "doc_id",
        host.alias("host"),
        url_registered_domain(host, is_host=True, psl=psl).alias("domain"),
    ).orderBy("doc_id")


@register(
    "gopher_quality_flags",
    "The published Gopher document-quality rule set (Rae et al. 2021 App. "
    "A) as per-doc boolean verdicts — word count, mean word length, symbol "
    "ratio, bullet/ellipsis line fractions, alphabetic-word fraction, "
    "required words, and the conjunction — integer cross-multiplication "
    "thresholds so both engines produce bit-identical booleans. EXTRA: "
    "oracle-checked by the pytest parity harness outside the 50-cap catalog",
    oracle="""
        WITH base AS (
          SELECT doc_id, text,
                 list_filter(
                   regexp_split_to_array(
                     lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                     '\\s+'),
                   x -> x <> '') AS t,
                 COALESCE(list_filter(
                   regexp_split_to_array(text, '\r?\n'),
                   l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g') <> ''), []) AS lines
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 COALESCE(len(t), 0) AS n_words,
                 COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS n_chars,
                 COALESCE(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))), 0) AS alpha,
                 COALESCE(len(list_filter(list_distinct(t),
                   x -> x IN ('the','be','to','of','and','that','have','with'))), 0) AS req,
                 COALESCE(length(text) - length(replace(text, '#', '')), 0) AS n_hash,
                 COALESCE((length(text) - length(replace(text, '...', ''))) // 3, 0)
                   + COALESCE(length(text) - length(replace(text, chr(8230), '')), 0) AS n_ell,
                 COALESCE(len(lines), 0) AS n_lines,
                 COALESCE(len(list_filter(lines,
                   l -> regexp_matches(regexp_replace(l, '^\\s+|\\s+$', '', 'g'), '^(' || chr(8226) || '|' || chr(8227) || '|' || chr(9642) || '|' || chr(9679) || '|\\*|-)'))), 0) AS bullets,
                 COALESCE(len(list_filter(lines,
                   l -> regexp_matches(regexp_replace(l, '^\\s+|\\s+$', '', 'g'), '(\\.\\.\\.|' || chr(8230) || ')$'))), 0) AS ells
          FROM base
        )
        SELECT doc_id,
               n_words BETWEEN 50 AND 100000 AS ok_word_count,
               n_words > 0 AND n_chars BETWEEN 3 * n_words AND 10 * n_words AS ok_mean_word_len,
               n_words > 0 AND n_hash * 10 <= n_words
                 AND n_ell * 10 <= n_words AS ok_symbol_ratio,
               n_lines = 0 OR bullets * 10 <= n_lines * 9 AS ok_bullet_lines,
               n_lines = 0 OR ells * 10 <= n_lines * 3 AS ok_ellipsis_lines,
               n_words > 0 AND alpha * 10 >= n_words * 8 AS ok_alpha_words,
               req >= 2 AS ok_required_words,
               (n_words BETWEEN 50 AND 100000)
                 AND (n_words > 0 AND n_chars BETWEEN 3 * n_words AND 10 * n_words)
                 AND (n_words > 0 AND n_hash * 10 <= n_words
                      AND n_ell * 10 <= n_words)
                 AND (n_lines = 0 OR bullets * 10 <= n_lines * 9)
                 AND (n_lines = 0 OR ells * 10 <= n_lines * 3)
                 AND (n_words > 0 AND alpha * 10 >= n_words * 8)
                 AND (req >= 2) AS gopher_pass
        FROM m
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        gopher_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags(F.col("text"))
    cols = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_required_words", "gopher_pass",
    ]
    return docs.select(
        "doc_id", *[flags[c].alias(c) for c in cols]
    ).orderBy("doc_id")


# shared kept-lines CTE for the two C4 legs: mirror of functions.text's
# c4_kept_lines (trim all whitespace, terminal-punct-not-ellipsis ending,
# >= 5 whitespace words, no javascript / policy boilerplate)
_C4_KEPT_SQL = """
          SELECT doc_id,
                 COALESCE(text, '') AS t,
                 list_filter(
                   list_transform(
                     regexp_split_to_array(COALESCE(text, ''), '\\r?\\n'),
                     l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')),
                   l -> l <> ''
                     AND regexp_matches(l, '[.!?"]$')
                     AND NOT regexp_matches(l, '\\.\\.\\.$')
                     AND len(list_filter(regexp_split_to_array(l, '\\s+'),
                                         w -> w <> '')) >= 5
                     AND NOT contains(lower(l), 'javascript')
                     AND NOT contains(lower(l), 'terms of use')
                     AND NOT contains(lower(l), 'privacy policy')
                     AND NOT contains(lower(l), 'cookie policy')
                     AND NOT contains(lower(l), 'uses cookies')
                     AND NOT contains(lower(l), 'use of cookies')
                     AND NOT contains(lower(l), 'use cookies')
                 ) AS kept
          FROM documents
"""


@register(
    "c4_line_cleaning",
    "The C4 line-level transform (Raffel et al. 2020 §2.2): per document, "
    "the count of lines the line rules keep and the newline-joined cleaned "
    "page — terminal-punctuation ending, >= 5 words, no javascript/policy "
    "boilerplate. EXTRA: oracle-checked by the pytest parity harness "
    "outside the 50-cap catalog",
    oracle="""
        WITH base AS (""" + _C4_KEPT_SQL + """
        )
        SELECT doc_id,
               COALESCE(len(kept), 0) AS n_kept_lines,
               COALESCE(array_to_string(kept, chr(10)), '') AS cleaned
        FROM base
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_c4_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        c4_clean_text,
        c4_kept_lines,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.coalesce(F.size(c4_kept_lines(F.col("text"))), F.lit(0))
        .cast("long")
        .alias("n_kept_lines"),
        F.coalesce(c4_clean_text(F.col("text")), F.lit("")).alias("cleaned"),
    ).orderBy("doc_id")


@register(
    "c4_quality_flags",
    "The published C4 page rules (Raffel et al. 2020 §2.2) as per-doc "
    "boolean verdicts — no lorem ipsum, no curly bracket, sentence count "
    "over the kept lines, and the conjunction — alongside the Gopher gate. "
    "EXTRA: oracle-checked by the pytest parity harness outside the 50-cap "
    "catalog",
    oracle="""
        WITH base AS (""" + _C4_KEPT_SQL + """
        ),
        m AS (
          SELECT doc_id,
                 NOT contains(lower(t), 'lorem ipsum') AS no_lorem_ipsum,
                 NOT contains(t, '{') AS no_curly_brace,
                 COALESCE(list_sum(list_transform(kept,
                   l -> length(l) - length(regexp_replace(l, '[.!?]', '', 'g')))),
                   0) AS n_sentences
          FROM base
        )
        SELECT doc_id,
               no_lorem_ipsum,
               no_curly_brace,
               n_sentences >= 5 AS ok_sentence_count,
               no_lorem_ipsum AND no_curly_brace
                 AND n_sentences >= 5 AS c4_pass
        FROM m
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_c4_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        c4_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = c4_quality_flags(F.col("text"))
    cols = [
        "no_lorem_ipsum", "no_curly_brace", "ok_sentence_count", "c4_pass",
    ]
    return docs.select(
        "doc_id", *[flags[c].alias(c) for c in cols]
    ).orderBy("doc_id")


# long-form gram table for the repetition oracle: n=0 marks lines, n=1
# paragraphs, n>=2 word n-grams (mirror of functions.text's clean_tokens /
# word_ngrams and gopher_repetition_flags' unit splitting)
_REP_BASE_SQL = """
          SELECT doc_id,
                 COALESCE(length(text), 0) AS n_len,
                 list_filter(
                   regexp_split_to_array(
                     lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))),
                     '\\s+'),
                   x -> x <> '') AS t,
                 list_filter(
                   list_transform(
                     regexp_split_to_array(COALESCE(text, ''), '\\r?\\n'),
                     l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')),
                   l -> l <> '') AS lines,
                 list_filter(
                   list_transform(
                     regexp_split_to_array(COALESCE(text, ''), '(\\r?\\n){2,}'),
                     l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')),
                   l -> l <> '') AS paras
          FROM documents
"""

_REP_GRAMS_SQL = "\n UNION ALL ".join(
    f"""SELECT doc_id, {n} AS n,
            unnest(list_transform(range(1, greatest(len(t) - {n} + 1, 0) + 1),
                                  i -> array_to_string(t[i:i + {n - 1}], ' '))) AS gram
        FROM base"""
    for n in range(2, 11)
)


@register(
    "gopher_repetition_flags",
    "The FULL published Gopher repetition rule set (Rae et al. 2021 Table "
    "A1) as per-doc boolean verdicts — duplicate line/paragraph fractions "
    "and character fractions, top 2/3/4-gram character coverage, duplicate "
    "5..10-gram character fractions, and the conjunction; integer "
    "cross-multiplication thresholds for bit-identical cross-engine "
    "booleans. EXTRA: oracle-checked by the pytest parity harness outside "
    "the 50-cap catalog",
    oracle="""
        WITH base AS (""" + _REP_BASE_SQL + """
        ),
        long AS (
          SELECT doc_id, 0 AS n, unnest(lines) AS gram FROM base
          UNION ALL
          SELECT doc_id, 1 AS n, unnest(paras) AS gram FROM base
          UNION ALL
          """ + _REP_GRAMS_SQL + """
        ),
        cnt AS (
          SELECT doc_id, n, gram, count(*) AS c FROM long GROUP BY ALL
        ),
        agg AS (
          SELECT doc_id, n, max(c) AS mc,
                 COALESCE(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS dcount,
                 COALESCE(sum(CASE WHEN c > 1 THEN (c - 1) * length(gram) END), 0) AS dchars
          FROM cnt GROUP BY ALL
        ),
        ml AS (
          SELECT cnt.doc_id, cnt.n, max(length(cnt.gram)) AS ml
          FROM cnt
          JOIN agg ON cnt.doc_id = agg.doc_id AND cnt.n = agg.n AND cnt.c = agg.mc
          GROUP BY ALL
        ),
        per AS (
          SELECT a.doc_id, a.n, a.mc, a.dcount, a.dchars, m.ml
          FROM agg a JOIN ml m ON a.doc_id = m.doc_id AND a.n = m.n
        ),
        piv AS (
          SELECT b.doc_id, b.n_len,
                 COALESCE(len(b.lines), 0) AS n_lines,
                 COALESCE(len(b.paras), 0) AS n_paras,
                 COALESCE(max(CASE WHEN p.n = 0 THEN p.dcount END), 0) AS dup_lines,
                 COALESCE(max(CASE WHEN p.n = 0 THEN p.dchars END), 0) AS dup_line_chars,
                 COALESCE(max(CASE WHEN p.n = 1 THEN p.dcount END), 0) AS dup_paras,
                 COALESCE(max(CASE WHEN p.n = 1 THEN p.dchars END), 0) AS dup_para_chars,
                 COALESCE(max(CASE WHEN p.n = 2 AND p.mc >= 2 THEN p.mc * p.ml END), 0) AS top2,
                 COALESCE(max(CASE WHEN p.n = 3 AND p.mc >= 2 THEN p.mc * p.ml END), 0) AS top3,
                 COALESCE(max(CASE WHEN p.n = 4 AND p.mc >= 2 THEN p.mc * p.ml END), 0) AS top4,
                 COALESCE(max(CASE WHEN p.n = 5 THEN p.dchars END), 0) AS d5,
                 COALESCE(max(CASE WHEN p.n = 6 THEN p.dchars END), 0) AS d6,
                 COALESCE(max(CASE WHEN p.n = 7 THEN p.dchars END), 0) AS d7,
                 COALESCE(max(CASE WHEN p.n = 8 THEN p.dchars END), 0) AS d8,
                 COALESCE(max(CASE WHEN p.n = 9 THEN p.dchars END), 0) AS d9,
                 COALESCE(max(CASE WHEN p.n = 10 THEN p.dchars END), 0) AS d10
          FROM base b LEFT JOIN per p ON b.doc_id = p.doc_id
          GROUP BY ALL
        )
        SELECT doc_id,
               dup_lines * 10 <= n_lines * 3 AS ok_dup_line_frac,
               dup_paras * 10 <= n_paras * 3 AS ok_dup_para_frac,
               dup_line_chars * 10 <= n_len * 2 AS ok_dup_line_char_frac,
               dup_para_chars * 10 <= n_len * 2 AS ok_dup_para_char_frac,
               top2 * 100 <= n_len * 20 AS ok_top_2gram_chars,
               top3 * 100 <= n_len * 18 AS ok_top_3gram_chars,
               top4 * 100 <= n_len * 16 AS ok_top_4gram_chars,
               d5 * 100 <= n_len * 15 AS ok_dup_5gram_chars,
               d6 * 100 <= n_len * 14 AS ok_dup_6gram_chars,
               d7 * 100 <= n_len * 13 AS ok_dup_7gram_chars,
               d8 * 100 <= n_len * 12 AS ok_dup_8gram_chars,
               d9 * 100 <= n_len * 11 AS ok_dup_9gram_chars,
               d10 * 100 <= n_len * 10 AS ok_dup_10gram_chars,
               (dup_lines * 10 <= n_lines * 3)
                 AND (dup_paras * 10 <= n_paras * 3)
                 AND (dup_line_chars * 10 <= n_len * 2)
                 AND (dup_para_chars * 10 <= n_len * 2)
                 AND (top2 * 100 <= n_len * 20)
                 AND (top3 * 100 <= n_len * 18)
                 AND (top4 * 100 <= n_len * 16)
                 AND (d5 * 100 <= n_len * 15)
                 AND (d6 * 100 <= n_len * 14)
                 AND (d7 * 100 <= n_len * 13)
                 AND (d8 * 100 <= n_len * 12)
                 AND (d9 * 100 <= n_len * 11)
                 AND (d10 * 100 <= n_len * 10) AS repetition_pass
        FROM piv
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        gopher_repetition_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_repetition_flags(F.col("text"))
    cols = [
        "ok_dup_line_frac", "ok_dup_para_frac", "ok_dup_line_char_frac",
        "ok_dup_para_char_frac", "ok_top_2gram_chars", "ok_top_3gram_chars",
        "ok_top_4gram_chars", "ok_dup_5gram_chars", "ok_dup_6gram_chars",
        "ok_dup_7gram_chars", "ok_dup_8gram_chars", "ok_dup_9gram_chars",
        "ok_dup_10gram_chars", "repetition_pass",
    ]
    return docs.select(
        "doc_id", *[flags[c].alias(c) for c in cols]
    ).orderBy("doc_id")


def _duck_html_chain(expr: str) -> str:
    """Fold the published HTML extraction rule list into nested DuckDB
    regexp_replace calls — the oracle executes the IDENTICAL patterns
    (RE2 and Java agree on every construct the rules use), so the
    html_text_extract hash comparison verifies the full chain."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
        _EDGE_WS,
        HTML_ENTITY_RULES,
        HTML_TEXT_RULES,
    )

    out = expr
    for pat, rep in tuple(HTML_TEXT_RULES) + tuple(HTML_ENTITY_RULES):
        pat_sql = pat.replace("'", "''")
        rep_sql = "chr(10)" if rep == "\n" else "'" + rep.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{pat_sql}', {rep_sql}, 'g')"
    return f"regexp_replace({out}, '{_EDGE_WS}', '', 'g')"


_HTML_ORACLE_EXPR = _duck_html_chain(
    "'<html><head><title>t</title><style>p '\n"
    "            || '{ color: red }</style><script>var x = \"<b>no</b>\";'\n"
    "            || '</script></head><body><!-- hidden --><h1>' || source\n"
    "            || '</h1><p>' || text || ' &amp; tail</p><div>doc<br>'\n"
    "            || CAST(doc_id AS VARCHAR) || '</div></body></html>'"
)


@register(
    "html_text_extract",
    "HTML→text extraction (functions/html.py::html_to_text) over HTML "
    "synthesized from the documents table (script/style/comment blocks, "
    "entities, block tags wrapped around real document text): the oracle "
    "folds the IDENTICAL published rule chain into DuckDB regexp_replace "
    "calls, so the value hash proves the whole extraction contract — "
    "script/style content removal, block-structure newlines, tag "
    "stripping, entity decoding, whitespace collapse — across engines. "
    "EXTRA: oracle-checked by the pytest parity harness outside the "
    "50-cap catalog",
    oracle=f"""
        SELECT doc_id,
               {_HTML_ORACLE_EXPR} AS text
        FROM documents
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.html import html_to_text

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><title>t</title><style>p { color: red }</style>'
              '<script>var x = "<b>no</b>";</script></head><body>'
              "<!-- hidden --><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp; tail</p><div>doc<br>"),
        F.col("doc_id").cast("string"),
        F.lit("</div></body></html>"),
    )
    return docs.select(
        "doc_id", html_to_text(html).alias("text")
    ).orderBy("doc_id")


@register(
    "nfc_normalized_texts",
    "Unicode NFC normalization (functions/unicode.py, Arrow-batched "
    "unicodedata) over document text with a DECOMPOSED suffix appended "
    "in-query (e + combining acute, a + combining ring) so the "
    "normalizer has real composition work: the oracle runs DuckDB's "
    "utf8proc-backed nfc_normalize on the identical strings — value "
    "hashes prove the two independent Unicode implementations agree. "
    "EXTRA: oracle-checked by the pytest parity harness outside the "
    "50-cap catalog",
    oracle="""
        SELECT doc_id,
               nfc_normalize(
                   text || ' e' || chr(769) || ' a' || chr(778) || ' fin'
               ) AS norm_text
        FROM documents
        ORDER BY doc_id
    """,
    tags=("text",),
    extra=True,
)
def q_nfc_normalized_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.unicode import (
        make_unicode_normalizer,
    )

    docs = load_table(spark, sf_dir, "documents")
    # DECOMPOSED on the Spark side (combining marks) — the
    # normalizer must do real composition work for the hashes
    # to meet the oracle
    suffix = " e\u0301 a\u030a fin"
    norm = make_unicode_normalizer("NFC")
    return docs.select(
        "doc_id",
        norm(F.concat(F.col("text"), F.lit(suffix))).alias("norm_text"),
    ).orderBy("doc_id")


@register(
    "extracted_links",
    "Anchor-href extraction (functions/html.py::html_links — both quote "
    "styles, pure codegen regexp_extract_all) over HTML synthesized from "
    "the documents table (one double-quoted and one single-quoted link "
    "per doc, plus an href-less anchor as a negative): exploded (doc_id, "
    "href) rows hash-match the oracle running the IDENTICAL patterns "
    "through DuckDB's RE2 regexp_extract_all. EXTRA: oracle-checked by "
    "the pytest parity harness outside the 50-cap catalog",
    oracle="""
        WITH pages AS (
            SELECT doc_id,
                   '<p>pre</p><a href="https://' || lower(source)
                   || '.example/d/' || doc_id || '">t</a>'
                   || '<a name=skip>no href</a>'
                   || '<a class=''z'' href=''https://m.' || lower(source)
                   || '.example/m/' || doc_id || '''><b>m</b></a>' AS html
            FROM documents
        )
        SELECT doc_id, UNNEST(list_concat(
            regexp_extract_all(html,
                '(?is)<a\\s[^>]*?href\\s*=\\s*"([^"<>]*)"', 1),
            regexp_extract_all(html,
                '(?is)<a\\s[^>]*?href\\s*=\\s*''([^''<>]*)''', 1)
        )) AS href
        FROM pages
        ORDER BY doc_id, href
    """,
    tags=("text",),
    extra=True,
)
def q_extracted_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.html import html_links

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<p>pre</p><a href="https://'),
        F.lower(F.col("source")),
        F.lit(".example/d/"),
        F.col("doc_id").cast("string"),
        F.lit('">t</a><a name=skip>no href</a>'
              "<a class='z' href='https://m."),
        F.lower(F.col("source")),
        F.lit(".example/m/"),
        F.col("doc_id").cast("string"),
        F.lit("'><b>m</b></a>"),
    )
    return (
        docs.select(
            "doc_id", F.explode(html_links(html)).alias("href")
        )
        .orderBy("doc_id", "href")
    )


@register(
    "pdf_text_extraction",
    "Document front door: VALID single-page PDFs synthesized from the text "
    "column (pure string ops — the reader's broken-xref object-scan "
    "fallback makes offset tables unnecessary), text pulled back through "
    "the REAL ISO 32000 reader (sources/pdf.py) via Arrow mapInPandas — "
    "FULLY oracle-checked: the oracle computes the identical sanitized "
    "text straight from the source column",
    oracle="""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[\\()]|[^ -~]', ' ', 'g'),
                        1, 120) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id,
               'pdf' AS format,
               t AS text,
               CAST(length(t) AS INT) AS n_chars
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_pdf_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    # ASCII-only, PDF-string-safe slice: the blob builds in codegen and
    # the char count equals the byte count (the /Length field)
    safe = F.substring(
        F.regexp_replace(F.col("text"), "[\\\\()]|[^ -~]", " "), 1, 120
    )
    content = F.concat(safe, F.lit(") Tj ET"))
    blob = F.concat(
        F.lit("%PDF-1.5\n"
              "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
              "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
              "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
              "endobj\n"
              "4 0 obj\n<< /Length "),
        (F.length(content) + F.lit(4)).cast("string"),
        F.lit(" >>\nstream\nBT ("),
        content,
        F.lit("\nendstream\nendobj\n%%EOF"),
    ).cast("binary")
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "rtf_text_extraction",
    "Document front door #2 under the cross-engine hash gate: RTF payloads "
    "synthesized from the text column in pure codegen string ops, text "
    "pulled back through the REAL control-word parser "
    "(sources/docformats.rtf_text) via Arrow mapInPandas — the oracle "
    "computes the identical expected text (incl. the \\par newline and "
    "\\tab) straight from the source column",
    oracle="""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[\\{}]|[^ -~]', ' ', 'g'),
                        1, 120) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id,
               'rtf' AS format,
               t || chr(10) || 'tail' || chr(9) || 'end' AS text,
               CAST(length(t) + 9 AS INT) AS n_chars
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_rtf_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    # ASCII-only, RTF-safe slice (no backslashes or braces); the tail
    # exercises \par -> newline, \tab -> tab, and the one-space
    # control-word delimiter rule
    safe = F.substring(
        F.regexp_replace(F.col("text"), "[\\\\{}]|[^ -~]", " "), 1, 120
    )
    blob = F.concat(
        F.lit("{\\rtf1\\ansi "), safe, F.lit("\\par tail\\tab end}")
    ).cast("binary")
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "docx_text_extraction",
    "Document front door #3 under the cross-engine hash gate: VALID "
    "stored (uncompressed) OOXML zips built per row in pure codegen — "
    "F.crc32 supplies the zip CRC, byte-swapped to little-endian via "
    "hex/unhex; fixed-width text keeps every offset constant — read back "
    "through the REAL zipfile+XML reader (sources/docformats.docx_text) "
    "via Arrow mapInPandas; the oracle computes the identical padded "
    "text straight from the source column",
    oracle="""
        SELECT doc_id,
               'docx' AS format,
               rpad(substr(regexp_replace(text, '[&<>]|[^ -~]', ' ', 'g'),
                           1, 120), 120, ' ') AS text,
               120 AS n_chars
        FROM documents WHERE doc_id < 150 ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_docx_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    NAME = b"word/document.xml"
    PRE = (b'<?xml version="1.0"?><w:document xmlns:w='
           b'"http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
           b'<w:body><w:p><w:r><w:t xml:space="preserve">')
    SUF = b"</w:t></w:r></w:p></w:body></w:document>"
    TLEN = 120
    clen = len(PRE) + TLEN + len(SUF)
    # zip record skeletons (PKWARE APPNOTE): store method, zero
    # timestamps, sizes constant because the text is padded fixed-width
    lfh_pre = b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
    lfh_post = struct.pack("<IIHH", clen, clen, len(NAME), 0) + NAME
    cd_pre = b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
    cd_post = (
        struct.pack("<IIHHHHHII", clen, clen, len(NAME), 0, 0, 0, 0, 0, 0)
        + NAME
    )
    cd_off = 30 + len(NAME) + clen
    cd_size = 46 + len(NAME)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, cd_size, cd_off, 0
    )

    def le32(col):
        h = F.lpad(F.hex(col), 8, "0")
        return F.unhex(F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    t = F.rpad(
        F.substring(F.regexp_replace(F.col("text"), "[&<>]|[^ -~]", " "),
                    1, TLEN),
        TLEN, " ",
    )
    content = F.concat(F.lit(PRE), F.encode(t, "UTF-8"), F.lit(SUF))
    crc = le32(F.crc32(content))
    blob = F.concat(
        F.lit(lfh_pre), crc, F.lit(lfh_post),
        content,
        F.lit(cd_pre), crc, F.lit(cd_post),
        F.lit(eocd),
    )
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "epub_text_extraction",
    "Document front door #4 under the cross-engine hash gate: VALID "
    "stored EPUB containers (mimetype + OCF container.xml + OPF spine + "
    "one XHTML chapter) built per row in pure codegen — constant members "
    "carry precomputed CRCs, the chapter's CRC/sizes/EOCD offset are "
    "per-row columns via F.crc32 + hex/unhex little-endian byte swaps — "
    "read back through the REAL OCF/OPF/XHTML chain "
    "(sources/docformats.epub_text -> py_html_to_text); the oracle folds "
    "the IDENTICAL html_to_text rule list over the same chapter markup",
    oracle=f"""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[&<>]|[^ -~]', ' ', 'g'),
                        1, 120) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id,
               'epub' AS format,
               {_duck_html_chain(
                   "'<html><body><p>' || t || '</p></body></html>'"
               )} AS text
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_epub_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    import zlib as _zlib

    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    def lfh(name: bytes, data: bytes) -> bytes:
        return (b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
                + struct.pack("<IIIHH", _zlib.crc32(data), len(data),
                              len(data), len(name), 0)
                + name + data)

    def cde(name: bytes, data: bytes, off: int) -> bytes:
        return (b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
                + struct.pack("<IIIHHHHHII", _zlib.crc32(data), len(data),
                              len(data), len(name), 0, 0, 0, 0, 0, off)
                + name)

    container = (
        b'<container xmlns='
        b'"urn:oasis:names:tc:opendocument:xmlns:container">'
        b'<rootfiles><rootfile full-path="content.opf" '
        b'media-type="application/oebps-package+xml"/></rootfiles>'
        b"</container>"
    )
    opf = (
        b'<package xmlns="http://www.idpf.org/2007/opf"><manifest>'
        b'<item id="c0" href="c0.xhtml" '
        b'media-type="application/xhtml+xml"/></manifest>'
        b'<spine><itemref idref="c0"/></spine></package>'
    )
    members = [
        (b"mimetype", b"application/epub+zip"),
        (b"META-INF/container.xml", container),
        (b"content.opf", opf),
    ]
    head = bytearray()
    offs = []
    for name, data in members:
        offs.append(len(head))
        head += lfh(name, data)
    # chapter member: everything before the variable fields is constant
    NAME4 = b"c0.xhtml"
    PRE = b"<html><body><p>"
    SUF = b"</p></body></html>"
    off4 = len(head)
    lfh4_pre = (bytes(head) + b"PK\x03\x04"
                + struct.pack("<HHHHH", 20, 0, 0, 0, 0))
    cd_fixed = b"".join(cde(n, d, o) for (n, d), o in zip(members, offs))
    cd4_pre = b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
    cd4_post = (struct.pack("<HHHHH", len(NAME4), 0, 0, 0, 0)
                + struct.pack("<II", 0, off4) + NAME4)
    cd_size = len(cd_fixed) + 46 + len(NAME4)
    eocd_pre = b"PK\x05\x06" + struct.pack("<HHHHI", 0, 0, 4, 4, cd_size)

    def le32(col):
        h = F.lpad(F.hex(col), 8, "0")
        return F.unhex(F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    t = F.substring(
        F.regexp_replace(F.col("text"), "[&<>]|[^ -~]", " "), 1, 120
    )
    data4 = F.concat(F.lit(PRE), F.encode(t, "UTF-8"), F.lit(SUF))
    l4 = F.length(data4).cast("bigint")
    crc4 = le32(F.crc32(data4))
    size4 = le32(l4)
    cd_off = le32(l4 + F.lit(off4 + 30 + len(NAME4)))
    blob = F.concat(
        F.lit(lfh4_pre), crc4, size4, size4,
        F.lit(struct.pack("<HH", len(NAME4), 0) + NAME4),
        data4,
        F.lit(cd_fixed),
        F.lit(cd4_pre), crc4, size4, size4, F.lit(cd4_post),
        F.lit(eocd_pre), cd_off, F.lit(struct.pack("<H", 0)),
    )
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text")
        .orderBy("doc_id")
    )


@register(
    "odt_text_extraction",
    "Document front door #5 under the cross-engine hash gate — the "
    "reader QUINTET complete: VALID stored OpenDocument Text containers "
    "(the ODF 'mimetype first member' rule + one content.xml paragraph) "
    "built per row in pure codegen — the constant mimetype member "
    "carries a precomputed CRC, content.xml's CRC/sizes/EOCD offset are "
    "per-row columns via F.crc32 + hex/unhex little-endian byte swaps — "
    "read back through the REAL zipfile+ElementTree ODF reader "
    "(sources/docformats.odt_text, text:p paragraph walk) via Arrow "
    "mapInPandas; the oracle computes the identical sanitized text "
    "straight from the source column",
    oracle="""
        SELECT doc_id,
               'odt' AS format,
               substr(regexp_replace(text, '[&<>]|[^ -~]', ' ', 'g'),
                      1, 120) AS text,
               length(substr(regexp_replace(text, '[&<>]|[^ -~]', ' ',
                                            'g'), 1, 120)) AS n_chars
        FROM documents WHERE doc_id < 150 ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_odt_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    import zlib as _zlib

    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    # member 1 (constant): the ODF flavor marker — MUST be the first,
    # stored member per ODF 1.2 §3.3; its CRC is a compile-time constant
    MIME = b"application/vnd.oasis.opendocument.text"
    lfh1 = (b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
            + struct.pack("<IIIHH", _zlib.crc32(MIME), len(MIME),
                          len(MIME), len(b"mimetype"), 0)
            + b"mimetype" + MIME)
    # member 2 (per-row): content.xml with ONE text:p paragraph
    NAME2 = b"content.xml"
    PRE = (b'<?xml version="1.0"?><office:document-content xmlns:office='
           b'"urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text='
           b'"urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
           b"<office:body><office:text><text:p>")
    SUF = b"</text:p></office:text></office:body></office:document-content>"
    off2 = len(lfh1)
    lfh2_pre = (lfh1 + b"PK\x03\x04"
                + struct.pack("<HHHHH", 20, 0, 0, 0, 0))
    cd1 = (b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
           + struct.pack("<IIIHHHHHII", _zlib.crc32(MIME), len(MIME),
                         len(MIME), len(b"mimetype"), 0, 0, 0, 0, 0, 0)
           + b"mimetype")
    cd2_pre = b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
    cd2_post = (struct.pack("<HHHHH", len(NAME2), 0, 0, 0, 0)
                + struct.pack("<II", 0, off2) + NAME2)
    cd_size = len(cd1) + 46 + len(NAME2)
    eocd_pre = b"PK\x05\x06" + struct.pack("<HHHHI", 0, 0, 2, 2, cd_size)

    def le32(col):
        h = F.lpad(F.hex(col), 8, "0")
        return F.unhex(F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    t = F.substring(
        F.regexp_replace(F.col("text"), "[&<>]|[^ -~]", " "), 1, 120
    )
    data2 = F.concat(F.lit(PRE), F.encode(t, "UTF-8"), F.lit(SUF))
    l2 = F.length(data2).cast("bigint")
    crc2 = le32(F.crc32(data2))
    size2 = le32(l2)
    cd_off = le32(l2 + F.lit(off2 + 30 + len(NAME2)))
    blob = F.concat(
        F.lit(lfh2_pre), crc2, size2, size2,
        F.lit(struct.pack("<HH", len(NAME2), 0) + NAME2),
        data2,
        F.lit(cd1),
        F.lit(cd2_pre), crc2, size2, size2, F.lit(cd2_post),
        F.lit(eocd_pre), cd_off, F.lit(struct.pack("<H", 0)),
    )
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "cjk_pdf_text_extraction",
    "The r12 predefined-CMap policy under the cross-engine hash gate: "
    "single-page PDFs with a Type0 /UniGB-UCS2-H font and NO /ToUnicode "
    "built per row in pure codegen — the show string is the UTF-16BE "
    "hex of the sanitized text plus a fixed CJK suffix (F.hex over "
    "F.encode(..., 'UTF-16BE')) — read back through the REAL ISO 32000 "
    "reader, whose Uni*-CMap policy decodes the code values AS Unicode; "
    "the oracle computes the identical text straight from the source "
    "column (Latin-1 mojibake of the 2-byte codes would hash-mismatch "
    "immediately)",
    oracle="""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[^ -~]', ' ', 'g'),
                        1, 100) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id,
               'pdf' AS format,
               t || '中文测试' AS text,
               CAST(length(t) + 4 AS INT) AS n_chars
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_cjk_pdf_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    safe = F.substring(
        F.regexp_replace(F.col("text"), "[^ -~]", " "), 1, 100
    )
    shown = F.concat(safe, F.lit("中文测试"))
    hexstr = F.concat(F.lit("<"), F.hex(F.encode(shown, "UTF-16BE")),
                      F.lit(">"))
    content = F.concat(F.lit("BT /F1 12 Tf "), hexstr, F.lit(" Tj ET"))
    blob = F.concat(
        F.lit("%PDF-1.5\n"
              "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
              "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
              "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
              "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
              "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
              "/Encoding /UniGB-UCS2-H >>\nendobj\n"
              "4 0 obj\n<< /Length "),
        F.length(content).cast("string"),
        F.lit(" >>\nstream\n"),
        content,
        F.lit("\nendstream\nendobj\n%%EOF"),
    ).cast("binary")
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "legacy_cjk_pdf_text_extraction",
    "The LEGACY half of the predefined-CMap registry under the "
    "cross-engine hash gate (r13; the r12 entry covers the Uni* half): "
    "single-page PDFs with a Type0 /GBK-EUC-H font and NO /ToUnicode "
    "built per row in pure codegen. The show string is GBK bytes — "
    "ASCII code points are single-byte-identical in GBK, so the hex is "
    "F.hex(F.encode(ascii_text, 'UTF-8')) concatenated with the FIXED "
    "precomputed GBK hex of the CJK suffix (D6D0CEC4B2E2CAD4 = "
    "中文测试) — read back through the REAL ISO 32000 "
    "reader, whose legacy-CMap policy decodes the code space as the "
    "named national charset via the stdlib codec; a Latin-1 or UTF-16 "
    "misdecode of the two-byte GBK codes would hash-mismatch "
    "immediately",
    oracle="""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[^ -~]', ' ', 'g'),
                        1, 100) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id,
               'pdf' AS format,
               t || '中文测试' AS text,
               CAST(length(t) + 4 AS INT) AS n_chars
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_legacy_cjk_pdf_text_extraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    safe = F.substring(
        F.regexp_replace(F.col("text"), "[^ -~]", " "), 1, 100
    )
    # ASCII is byte-identical in GBK; the CJK suffix's GBK bytes are a
    # fixed literal — together an EXACT GBK encoding in pure codegen
    hexstr = F.concat(F.lit("<"), F.hex(F.encode(safe, "UTF-8")),
                      F.lit("D6D0CEC4B2E2CAD4"), F.lit(">"))
    content = F.concat(F.lit("BT /F1 12 Tf "), hexstr, F.lit(" Tj ET"))
    blob = F.concat(
        F.lit("%PDF-1.5\n"
              "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
              "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
              "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
              "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
              "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
              "/Encoding /GBK-EUC-H >>\nendobj\n"
              "4 0 obj\n<< /Length "),
        F.length(content).cast("string"),
        F.lit(" >>\nstream\n"),
        content,
        F.lit("\nendstream\nendobj\n%%EOF"),
    ).cast("binary")
    media = docs.select("doc_id", blob.alias("content"))
    return (
        extract_document_texts(media)
        .select("doc_id", "format", "text", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "routed_intake_mixed",
    "The r11 binary-intake ROUTER itself under the cross-engine hash "
    "gate: a mixed corpus built per row in pure codegen — doc_id%3 "
    "picks HTML markup (stays on the pure-codegen html_to_text JVM "
    "path), an RTF payload (Arrow control-word parser), or a VALID "
    "stored OOXML zip (Arrow zipfile+XML reader, F.crc32 zip CRC) — "
    "pushed through route_document_texts (the exact front door "
    "curate() uses: codegen 64-byte magic sniff, per-branch scans, "
    "partition-local union); the oracle reproduces each branch's text "
    "with a CASE over the same three rules, so a sniff misroute, a "
    "branch regression, or a union column drift hash-mismatches",
    oracle=f"""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[&<>{{}}\\\\()]|[^ -~]',
                                       ' ', 'g'), 1, 100) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'html'
                               WHEN 1 THEN 'rtf' ELSE 'docx' END
                   AS format,
               CASE doc_id % 3
                 WHEN 0 THEN {_duck_html_chain(
                     "'<html><body><p>' || t || '</p></body></html>'")}
                 WHEN 1 THEN t || chr(10) || 'tail' || chr(9) || 'end'
                 ELSE rpad(t, 100, ' ')
               END AS text
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_routed_intake_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    import zlib as _zlib

    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        route_document_texts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    # one sanitization across all three branches: no markup/RTF/paren
    # metacharacters, ASCII only, fixed 100-char slice
    t = F.substring(
        F.regexp_replace(F.col("text"), "[&<>{}\\\\()]|[^ -~]", " "),
        1, 100,
    )

    html_blob = F.encode(
        F.concat(F.lit("<html><body><p>"), t, F.lit("</p></body></html>")),
        "UTF-8",
    )
    rtf_blob = F.encode(
        F.concat(F.lit("{\\rtf1\\ansi "), t, F.lit("\\par tail\\tab end}")),
        "UTF-8",
    )

    # stored OOXML zip, fixed-width text keeps every offset constant
    # (the q_docx_text_extraction skeleton at TLEN=100)
    NAME = b"word/document.xml"
    PRE = (b'<?xml version="1.0"?><w:document xmlns:w='
           b'"http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
           b'<w:body><w:p><w:r><w:t xml:space="preserve">')
    SUF = b"</w:t></w:r></w:p></w:body></w:document>"
    TLEN = 100
    clen = len(PRE) + TLEN + len(SUF)
    lfh_pre = b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
    lfh_post = struct.pack("<IIHH", clen, clen, len(NAME), 0) + NAME
    cd_pre = b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
    cd_post = (
        struct.pack("<IIHHHHHII", clen, clen, len(NAME), 0, 0, 0, 0, 0, 0)
        + NAME
    )
    cd_off = 30 + len(NAME) + clen
    cd_size = 46 + len(NAME)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, cd_size, cd_off, 0
    )

    def le32(col):
        h = F.lpad(F.hex(col), 8, "0")
        return F.unhex(F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ))

    padded = F.rpad(t, TLEN, " ")
    xml = F.concat(F.lit(PRE), F.encode(padded, "UTF-8"), F.lit(SUF))
    crc = le32(F.crc32(xml))
    docx_blob = F.concat(
        F.lit(lfh_pre), crc, F.lit(lfh_post), xml,
        F.lit(cd_pre), crc, F.lit(cd_post), F.lit(eocd),
    )

    blob = (
        F.when(F.col("doc_id") % 3 == 0, html_blob)
        .when(F.col("doc_id") % 3 == 1, rtf_blob)
        .otherwise(docx_blob)
    ).cast("binary")
    media = docs.select("doc_id", blob.alias("content"))
    return (
        route_document_texts(media)
        .select("doc_id", "format", "text")
        .orderBy("doc_id")
    )


@register(
    "archive_member_expansion",
    "The r12 archive front door under the cross-engine hash gate: "
    "VALID stored two-member zips (a constant meta.txt + a per-row "
    "fixed-width doc.txt whose CRC rides F.crc32 + the hex/unhex "
    "little-endian swap) built per document row in pure codegen, "
    "expanded through the REAL sources/archives.expand_archives Arrow "
    "pass (stdlib zipfile behind the three-cap bomb posture) into one "
    "row per member; the oracle emits the two expected member rows per "
    "document straight from the source column — a wrong member name, "
    "order, byte count, or payload hash-mismatches immediately",
    oracle="""
        WITH safe AS (
          SELECT doc_id,
                 rpad(substr(regexp_replace(text, '[^ -~]', ' ', 'g'),
                             1, 120), 120, ' ') AS t
          FROM documents WHERE doc_id < 200
        )
        SELECT * FROM (
          SELECT doc_id, 'zip' AS archive_format, 'doc.txt' AS member_name,
                 CAST(120 AS BIGINT) AS n_bytes, t AS member_text
          FROM safe
          UNION ALL
          SELECT doc_id, 'zip', 'meta.txt', CAST(4 AS BIGINT), 'meta'
          FROM safe
        ) ORDER BY doc_id, member_name
    """,
    tags=("documents",),
    extra=True,
)
def q_archive_member_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    import zlib as _zlib

    from sample_dms_kinesis_rds_mariadb_spark.sources.archives import (
        expand_archives,
    )

    # member 1 (constant): meta.txt -> b"meta"; CRC is compile-time
    NAME1, DATA1 = b"meta.txt", b"meta"
    lfh1 = (b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
            + struct.pack("<IIIHH", _zlib.crc32(DATA1), len(DATA1),
                          len(DATA1), len(NAME1), 0)
            + NAME1 + DATA1)
    # member 2 (per-row): doc.txt, fixed 120-byte payload so every
    # offset in the container is a constant
    NAME2, TLEN = b"doc.txt", 120
    off2 = len(lfh1)
    lfh2_pre = (lfh1 + b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0))
    lfh2_post = struct.pack("<IIHH", TLEN, TLEN, len(NAME2), 0) + NAME2
    cd1 = (b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
           + struct.pack("<IIIHHHHHII", _zlib.crc32(DATA1), len(DATA1),
                         len(DATA1), len(NAME1), 0, 0, 0, 0, 0, 0)
           + NAME1)
    cd2_pre = b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
    cd2_post = (struct.pack("<IIHHHHHII", TLEN, TLEN, len(NAME2),
                            0, 0, 0, 0, 0, off2) + NAME2)
    cd_off = off2 + 30 + len(NAME2) + TLEN
    cd_size = len(cd1) + 46 + len(NAME2)
    eocd = b"PK\x05\x06" + struct.pack("<HHHHIIH", 0, 0, 2, 2,
                                       cd_size, cd_off, 0)

    def le32(col):
        h = F.lpad(F.hex(col), 8, "0")
        return F.unhex(F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = F.rpad(
        F.substring(F.regexp_replace(F.col("text"), "[^ -~]", " "), 1, TLEN),
        TLEN, " ",
    )
    data2 = F.encode(t, "UTF-8")
    crc2 = le32(F.crc32(data2))
    blob = F.concat(
        F.lit(lfh2_pre), crc2, F.lit(lfh2_post), data2,
        F.lit(cd1), F.lit(cd2_pre), crc2, F.lit(cd2_post), F.lit(eocd),
    )
    media = docs.select("doc_id", blob.alias("content"))
    return (
        expand_archives(media)
        .select(
            "doc_id", "archive_format", "member_name", "n_bytes",
            F.decode(F.col("member_bytes"), "UTF-8").alias("member_text"),
        )
        .orderBy("doc_id", "member_name")
    )


@register(
    "archive_document_extraction",
    "The COMPOSED archive→member→document chain under the cross-engine "
    "hash gate (r13; the r12 entries prove each stage alone): per row a "
    "VALID stored OUTER zip whose two members are themselves full "
    "codegen binary documents — report.docx (the fixed-width stored "
    "OOXML container) and notes.odt (the variable-length ODF container, "
    "mimetype member first) — built entirely in pure codegen: inner "
    "CRCs ride F.crc32 over the member XML, OUTER member CRCs ride "
    "F.crc32 over the complete inner zip bytes, and the outer central "
    "directory offset is a per-row column because the ODT member's "
    "length varies. Expanded through the REAL expand_archives Arrow "
    "pass, then each member routed through the REAL "
    "route_document_texts front door (PK magic → zipfile reader → "
    "docx/odt dispatch); the oracle emits both expected member texts "
    "straight from the source column — a wrong member boundary, CRC, "
    "route, or reader regression at EITHER level hash-mismatches",
    oracle="""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[&<>]|[^ -~]', ' ', 'g'),
                        1, 100) AS t
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id, member_name, format, text FROM (
          SELECT doc_id, 'report.docx' AS member_name, 'docx' AS format,
                 rpad(t, 100, ' ') AS text
          FROM safe
          UNION ALL
          SELECT doc_id, 'notes.odt', 'odt', t FROM safe
        ) ORDER BY doc_id, member_name
    """,
    tags=("documents",),
    extra=True,
)
def q_archive_document_extraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import struct
    import zlib as _zlib

    from sample_dms_kinesis_rds_mariadb_spark.sources.archives import (
        expand_archives,
    )
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        route_document_texts,
    )

    def le32(col):
        h = F.lpad(F.hex(col), 8, "0")
        return F.unhex(F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    t = F.substring(
        F.regexp_replace(F.col("text"), "[&<>]|[^ -~]", " "), 1, 100
    )

    # ----- inner member 1: report.docx (fixed width => fixed length)
    NAME_D = b"word/document.xml"
    PRE_D = (b'<?xml version="1.0"?><w:document xmlns:w='
             b'"http://schemas.openxmlformats.org/wordprocessingml/2006/'
             b'main"><w:body><w:p><w:r><w:t xml:space="preserve">')
    SUF_D = b"</w:t></w:r></w:p></w:body></w:document>"
    TLEN = 100
    clen = len(PRE_D) + TLEN + len(SUF_D)
    xml_d = F.concat(
        F.lit(PRE_D), F.encode(F.rpad(t, TLEN, " "), "UTF-8"), F.lit(SUF_D)
    )
    crc_d = le32(F.crc32(xml_d))
    d_cd_off = 30 + len(NAME_D) + clen
    d_cd_size = 46 + len(NAME_D)
    docx_blob = F.concat(
        F.lit(b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)),
        crc_d,
        F.lit(struct.pack("<IIHH", clen, clen, len(NAME_D), 0) + NAME_D),
        xml_d,
        F.lit(b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)),
        crc_d,
        F.lit(struct.pack("<IIHHHHHII", clen, clen, len(NAME_D),
                          0, 0, 0, 0, 0, 0) + NAME_D),
        F.lit(b"PK\x05\x06" + struct.pack("<HHHHIIH", 0, 0, 1, 1,
                                          d_cd_size, d_cd_off, 0)),
    )
    docx_len = d_cd_off + d_cd_size + 22

    # ----- inner member 2: notes.odt (variable length — q_odt shape)
    MIME = b"application/vnd.oasis.opendocument.text"
    o_lfh1 = (b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
              + struct.pack("<IIIHH", _zlib.crc32(MIME), len(MIME),
                            len(MIME), len(b"mimetype"), 0)
              + b"mimetype" + MIME)
    NAME_O = b"content.xml"
    PRE_O = (b'<?xml version="1.0"?><office:document-content xmlns:office='
             b'"urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
             b'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
             b"<office:body><office:text><text:p>")
    SUF_O = (b"</text:p></office:text></office:body>"
             b"</office:document-content>")
    o_off2 = len(o_lfh1)
    o_cd1 = (b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
             + struct.pack("<IIIHHHHHII", _zlib.crc32(MIME), len(MIME),
                           len(MIME), len(b"mimetype"), 0, 0, 0, 0, 0, 0)
             + b"mimetype")
    o_cd_size = len(o_cd1) + 46 + len(NAME_O)
    data_o = F.concat(F.lit(PRE_O), F.encode(t, "UTF-8"), F.lit(SUF_O))
    lo = F.length(data_o).cast("bigint")
    crc_o = le32(F.crc32(data_o))
    size_o = le32(lo)
    odt_blob = F.concat(
        F.lit(o_lfh1
              + b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)),
        crc_o, size_o, size_o,
        F.lit(struct.pack("<HH", len(NAME_O), 0) + NAME_O),
        data_o,
        F.lit(o_cd1),
        F.lit(b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)),
        crc_o, size_o, size_o,
        F.lit(struct.pack("<HHHHH", len(NAME_O), 0, 0, 0, 0)
              + struct.pack("<II", 0, o_off2) + NAME_O),
        F.lit(b"PK\x05\x06" + struct.pack("<HHHHI", 0, 0, 2, 2,
                                          o_cd_size)),
        le32(lo + F.lit(o_off2 + 30 + len(NAME_O))),
        F.lit(struct.pack("<H", 0)),
    )

    # ----- outer stored zip: the two inner containers as members
    M1, M2 = b"report.docx", b"notes.odt"
    crc_m1 = le32(F.crc32(docx_blob))
    crc_m2 = le32(F.crc32(odt_blob))
    l_odt = F.length(odt_blob).cast("bigint")
    size_m2 = le32(l_odt)
    off2_out = 30 + len(M1) + docx_len
    out_cd_size = (46 + len(M1)) + (46 + len(M2))
    outer = F.concat(
        # LFH 1 + docx bytes (fixed sizes)
        F.lit(b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)),
        crc_m1,
        F.lit(struct.pack("<IIHH", docx_len, docx_len, len(M1), 0) + M1),
        docx_blob,
        # LFH 2 + odt bytes (per-row sizes)
        F.lit(b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)),
        crc_m2, size_m2, size_m2,
        F.lit(struct.pack("<HH", len(M2), 0) + M2),
        odt_blob,
        # central directory
        F.lit(b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)),
        crc_m1,
        F.lit(struct.pack("<IIHHHHHII", docx_len, docx_len, len(M1),
                          0, 0, 0, 0, 0, 0) + M1),
        F.lit(b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)),
        crc_m2, size_m2, size_m2,
        F.lit(struct.pack("<HHHHH", len(M2), 0, 0, 0, 0)
              + struct.pack("<II", 0, off2_out) + M2),
        # EOCD: the CD offset is a per-row column (odt length varies)
        F.lit(b"PK\x05\x06" + struct.pack("<HHHHI", 0, 0, 2, 2,
                                          out_cd_size)),
        le32(l_odt + F.lit(off2_out + 30 + len(M2))),
        F.lit(struct.pack("<H", 0)),
    )

    media = docs.select("doc_id", outer.cast("binary").alias("content"))
    members = expand_archives(media).filter(F.col("error").isNull())
    routed = route_document_texts(
        members.select(
            "doc_id", "member_name",
            F.col("member_bytes").alias("content"),
        )
    )
    return (
        routed.select("doc_id", "member_name", "format", "text")
        .orderBy("doc_id", "member_name")
    )


@register(
    "sitemap_loc_extraction",
    "Sitemap XML parsing under the cross-engine hash gate: urlset AND "
    "sitemapindex documents synthesized per documents row in pure "
    "codegen (one loc carrying an &amp; entity plus whitespace padding, "
    "one plain), parsed back through the REAL pure-codegen operator "
    "(operators/robots.sitemap_locs — regexp_extract_all + the XML "
    "named-entity unescape chain, &amp; last — and is_sitemap_index); "
    "the oracle computes the expected URLs directly from the source "
    "columns, so a wrong trim, a missed entity, or a double-decode "
    "hash-mismatches immediately",
    oracle="""
        SELECT doc_id,
               (doc_id % 10 = 0) AS is_index,
               UNNEST([
                 'https://' || lower(source) || '.example/p/' || doc_id
                   || '?a=1&b=2',
                 'https://' || lower(source) || '.example/q/' || doc_id
               ]) AS loc
        FROM documents
        ORDER BY doc_id, loc
    """,
    tags=("documents",),
    extra=True,
)
def q_sitemap_loc_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.robots import (
        is_sitemap_index,
        sitemap_locs,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = F.when(F.col("doc_id") % 10 == 0, F.lit("sitemapindex")).otherwise(
        F.lit("urlset")
    )
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><'), root,
        F.lit(' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>\n  https://"),
        F.lower("source"),
        F.lit(".example/p/"), F.col("doc_id").cast("string"),
        F.lit("?a=1&amp;b=2  </loc><lastmod>2024-01-01</lastmod></url>"
              "<url><loc>https://"),
        F.lower("source"),
        F.lit(".example/q/"), F.col("doc_id").cast("string"),
        F.lit("</loc></url></"), root, F.lit(">"),
    )
    return (
        docs.select(
            "doc_id",
            is_sitemap_index(xml).alias("is_index"),
            F.explode(sitemap_locs(xml)).alias("loc"),
        )
        .orderBy("doc_id", "loc")
    )


@register(
    "html_page_meta",
    "Page-metadata extraction under the cross-engine hash gate: HTML "
    "heads synthesized per documents row in pure codegen exercising "
    "BOTH meta attribute orders (name-then-content AND content-then-"
    "name), both quote styles, an entity-bearing title, a canonical "
    "link, html@lang, robots, and a JSON-LD block; parsed back through "
    "the REAL pure-codegen extractor (functions/html.py::"
    "html_page_metadata + jsonld_blocks); the oracle computes every "
    "expected field directly from the source columns — a missed "
    "attribute order, quote style, or entity decode hash-mismatches",
    oracle="""
        WITH safe AS (
          SELECT doc_id, lower(source) AS src,
                 substr(regexp_replace(text, '[&<>"'']|[^ -~]', ' ', 'g'),
                        1, 60) AS t
          FROM documents
        )
        SELECT doc_id,
               trim(t || ' & co') AS title,
               trim('desc ' || t) AS description,
               trim('og ' || t) AS og_title,
               'https://' || src || '.example/c/' || doc_id AS canonical,
               CASE WHEN doc_id % 3 = 0 THEN 'en' ELSE 'de-DE' END AS lang,
               'noindex' AS robots_meta,
               1 AS n_jsonld,
               '{"@type":"Article","id":' || doc_id || '}' AS jsonld
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_html_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
        html_page_metadata,
        jsonld_blocks,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = F.substring(
        F.regexp_replace(F.col("text"), "[&<>\"']|[^ -~]", " "), 1, 60
    )
    lang = F.when(F.col("doc_id") % 3 == 0, F.lit("en")).otherwise(
        F.lit("de-DE")
    )
    html = F.concat(
        F.lit("<html lang=\""), lang, F.lit("\"><head><title> "),
        t, F.lit(" &amp; co </title>"
                 # reversed order, single-quoted content
                 "<meta content='desc "), t,
        F.lit("' name=\"description\">"
              # normal order, double-quoted
              "<meta property=\"og:title\" content=\"og "), t,
        F.lit("\"/><meta name=\"robots\" content=\"noindex\">"
              "<link rel=\"canonical\" href=\"https://"),
        F.lower("source"),
        F.lit(".example/c/"), F.col("doc_id").cast("string"),
        F.lit("\"/><script type=\"application/ld+json\"> "
              "{\"@type\":\"Article\",\"id\":"),
        F.col("doc_id").cast("string"),
        F.lit("} </script></head><body><p>body</p></body></html>"),
    )
    meta = html_page_metadata(html)
    blocks = jsonld_blocks(html)
    return (
        docs.select(
            "doc_id",
            meta["title"].alias("title"),
            meta["description"].alias("description"),
            meta["og_title"].alias("og_title"),
            meta["canonical"].alias("canonical"),
            meta["lang"].alias("lang"),
            meta["robots_meta"].alias("robots_meta"),
            F.size(blocks).alias("n_jsonld"),
            F.element_at(blocks, 1).alias("jsonld"),
        )
        .orderBy("doc_id")
    )


def _duck_subtitle_chain(expr: str) -> str:
    """Fold the published subtitle rule list into nested DuckDB
    regexp_replace calls — identical patterns cross-engine (pinned by
    the hypothesis RE2-vs-Python property in tests/test_subtitles.py)."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.subtitles import (
        SUBTITLE_RULES,
    )

    out = expr
    for pat, rep in SUBTITLE_RULES:
        pat_sql = pat.replace("'", "''")
        rep_sql = "'" + rep.replace("\\", "\\\\").replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{pat_sql}', {rep_sql}, 'g')"
    return out


_SRT_ORACLE_EXPR = _duck_subtitle_chain(
    "'1' || chr(10) || '00:00:01,000 --> 00:00:04,000' || chr(10)\n"
    "            || t || chr(10) || chr(10) || '2' || chr(10)\n"
    "            || '00:00:05,000 --> 00:00:06,500' || chr(10)\n"
    "            || '<i>' || t || '</i> tail'"
)


@register(
    "subtitle_text_extract",
    "Subtitle extraction under the cross-engine hash gate: two-cue SRT "
    "documents synthesized per documents row in pure codegen (counter "
    "lines, comma-millisecond timestamps, an inline <i> tag), cleaned "
    "through the REAL published rule chain "
    "(functions/subtitles.subtitle_text); the oracle folds the "
    "IDENTICAL rule list through DuckDB's RE2 — the hypothesis "
    "property in tests/test_subtitles.py pins RE2 to the Python "
    "mirror, and this entry pins the Java side at corpus scale",
    oracle=f"""
        WITH safe AS (
          SELECT doc_id,
                 substr(regexp_replace(text, '[<>&{{\\\\]|[^ -~]', ' ', 'g'),
                        1, 80) AS t
          FROM documents WHERE doc_id < 300
        )
        SELECT doc_id,
               {_SRT_ORACLE_EXPR} AS text
        FROM safe ORDER BY doc_id
    """,
    tags=("documents",),
    extra=True,
)
def q_subtitle_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.subtitles import (
        subtitle_text,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = F.substring(
        F.regexp_replace(F.col("text"), "[<>&{\\\\]|[^ -~]", " "), 1, 80
    )
    srt = F.concat(
        F.lit("1\n00:00:01,000 --> 00:00:04,000\n"), t,
        F.lit("\n\n2\n00:00:05,000 --> 00:00:06,500\n<i>"), t,
        F.lit("</i> tail"),
    )
    return docs.select(
        "doc_id", subtitle_text(srt).alias("text")
    ).orderBy("doc_id")


@register(
    "feed_entry_extraction",
    "RSS parsing under the cross-engine hash gate: two-item RSS "
    "channels synthesized per documents row in pure codegen (item one "
    "carries a CDATA title — literal, never entity-decoded — and an "
    "&amp;-escaped link; item two is plain with no pubDate), exploded "
    "through the REAL functions/feeds.feed_entries pass; the oracle "
    "emits the expected entry rows computed directly from the source "
    "columns",
    oracle="""
        WITH safe AS (
          SELECT doc_id, lower(source) AS src,
                 substr(regexp_replace(text, '[<>&]|[^ -~]', ' ', 'g'),
                        1, 60) AS t
          FROM documents WHERE doc_id < 300
        )
        SELECT doc_id, kind, title, link, published
        FROM (
          SELECT doc_id, 'rss' AS kind,
                 trim(t) || ' [cdata]' AS title,
                 'https://' || src || '.example/a/' || doc_id
                   || '?x=1&y=2' AS link,
                 'Mon, 01 Jan 2024 10:00:00 GMT' AS published,
                 0 AS ord
          FROM safe
          UNION ALL
          SELECT doc_id, 'rss', trim('plain ' || t),
                 'https://' || src || '.example/b/' || doc_id,
                 NULL, 1
          FROM safe
        ) ORDER BY doc_id, link
    """,
    tags=("documents",),
    extra=True,
)
def q_feed_entry_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.functions.feeds import (
        feed_entries,
        feed_kind,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = F.substring(
        F.regexp_replace(F.col("text"), "[<>&]|[^ -~]", " "), 1, 60
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel>'
              "<title>chan</title><item><title><![CDATA["),
        F.trim(t), F.lit(" [cdata]]]></title><link>https://"),
        F.lower("source"),
        F.lit(".example/a/"), F.col("doc_id").cast("string"),
        F.lit("?x=1&amp;y=2</link>"
              "<pubDate>Mon, 01 Jan 2024 10:00:00 GMT</pubDate></item>"
              "<item><title>plain "),
        t, F.lit("</title><link>https://"), F.lower("source"),
        F.lit(".example/b/"), F.col("doc_id").cast("string"),
        F.lit("</link></item></channel></rss>"),
    )
    entry = F.explode(feed_entries(xml)).alias("e")
    return (
        docs.select("doc_id", feed_kind(xml).alias("kind"), entry)
        .select(
            "doc_id", "kind",
            F.col("e.title").alias("title"),
            F.col("e.link").alias("link"),
            F.col("e.published").alias("published"),
        )
        .orderBy("doc_id", "link")
    )
