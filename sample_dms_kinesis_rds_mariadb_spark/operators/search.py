"""BM25 keyword search over the document corpus — the lexical retrieval
companion to the embedding ANN operators (`operators/similarity.py`).

Retrieval over a corpus at rest is a query-time operator, so the design
splits like the index operators do:

- corpus statistics (N, average document length) — ONE aggregate, a
  single row to the driver (control-plane);
- per-term document frequencies — docs emit only the query terms they
  contain (``array_intersect`` against the literal term list BEFORE the
  explode), so the shuffle carries at most |terms| rows per matching doc
  and the aggregate is |terms| rows total;
- scoring — a narrow codegen expression over one corpus scan: per-term
  term frequencies via ``F.filter`` counts, IDF weights inlined as plan
  literals from the (tiny) stats, ``orderBy().limit(k)`` so Spark plans
  TakeOrderedAndProject (per-partition heaps, no global sort).

Nothing corpus-sized ever reaches the driver and no stage shuffles
document text; at 100 TB the cost is two stat scans + one scoring scan,
all of which prune to (id, tokens) columns. BM25 per Robertson/Spärck
Jones with the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` idf variant.

The reference has no search surface (its consumer reads CDC events,
reference run.py:175-188); this extends the engine's north-star
LLM-pipeline set (corpus triage, eval-set retrieval, "what leaked into
the corpus" forensics).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    clean_tokens as _toks,
    py_clean_tokens,
)


def _query_terms(query: str | list[str]) -> list[str]:
    terms = query.split() if isinstance(query, str) else list(query)
    out, seen = [], set()
    for t in terms:
        t = t.strip().lower()
        if t and t not in seen:
            seen.add(t)
            out.append(t)
    return out


def corpus_stats(df: DataFrame, text_col: str) -> tuple[int, float]:
    """(document count, average token length) in one aggregate."""
    row = df.agg(
        F.count("*").alias("n"),
        F.avg(F.size(_toks(F.col(text_col)))).alias("avgdl"),
    ).first()
    return int(row["n"]), float(row["avgdl"] or 0.0)


def term_document_frequencies(
    df: DataFrame, text_col: str, terms: list[str]
) -> dict[str, int]:
    """Document frequency of each query term. The intersect-then-explode
    order matters: each doc emits at most |terms| rows (its matching
    terms), never its full token array."""
    if not terms:
        return {}
    hits = df.select(
        F.explode(
            F.array_intersect(
                F.array_distinct(_toks(F.col(text_col))),
                F.lit(terms),
            )
        ).alias("term")
    )
    rows = hits.groupBy("term").agg(F.count("*").alias("df")).collect()
    return {r["term"]: int(r["df"]) for r in rows}


def bm25_scores(
    df: DataFrame,
    text_col: str,
    query: str | list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Append a ``bm25`` column scoring every document against ``query``
    (0.0 for documents matching no term). Two control-plane stat jobs,
    then one narrow scoring expression — no shuffle, no UDF."""
    terms = _query_terms(query)
    n_docs, avgdl = corpus_stats(df, text_col)
    dfs = term_document_frequencies(df, text_col, terms)
    # BIND the token array to a column once: referencing the raw expression
    # per term would re-run normalize+tokenize |terms|+1 times per row (the
    # re-evaluation class the winnowing rewrite measured at 20x)
    bound = df.withColumn("_bm25_toks", _toks(F.col(text_col)))
    toks = F.col("_bm25_toks")
    dl = F.size(toks)
    score = F.lit(0.0)
    for t in terms:
        df_t = dfs.get(t, 0)
        if df_t == 0 or n_docs == 0:
            continue  # absent terms contribute nothing to any document
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        # NB: plain closure over t — a second lambda parameter would be
        # interpreted by Spark as the element INDEX; eager evaluation inside
        # the loop makes the capture safe
        term = t
        tf = F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / F.lit(avgdl)
        )
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / denom
    return bound.withColumn("bm25", score).drop("_bm25_toks")


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str | list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` as (id, bm25), best first.
    ``orderBy().limit(k)`` plans TakeOrderedAndProject — per-partition
    heaps merged on the driver, never a global sort."""
    scored = bm25_scores(df, text_col, query, k1=k1, b=b)
    return (
        scored.filter(F.col("bm25") > 0.0)
        .select(id_col, "bm25")
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def bm25_batch_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[object, str | list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for EVERY query in one pass — eval-set retrieval
    ("which corpus docs answer these 10k benchmark questions") where
    looping :func:`bm25_search` would scan the corpus once per query.

    Returns (query_id, id_col, bm25, rank), rank 1 = best; ``query_id`` is
    stringified (dict keys of any type come back as their ``str`` form).

    Scale shape: corpus stats + document frequencies for the UNION of all
    query terms are the same control-plane aggregates as the single-query
    path. Then ONE corpus scan emits a (doc, term, tf) row per *matching*
    term only (``array_intersect`` before the explode — never the full
    token array), the tiny (query_id, term, idf) table broadcast-joins
    onto it, contributions sum per (query_id, doc), and a per-query window
    takes top-``k``. The shuffles carry matching (doc, term) pairs and
    (query, doc) partials — both bounded by hit counts, never corpus ×
    queries.
    """
    qterms = {qid: _query_terms(q) for qid, q in queries.items()}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    n_docs, avgdl = corpus_stats(df, text_col)
    dfs = term_document_frequencies(df, text_col, all_terms)
    spark = df.sparkSession
    qrows = [
        (qid, t, math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)))
        for qid, ts in qterms.items()
        for t in ts
        if dfs.get(t, 0) > 0 and n_docs > 0
    ]
    if not qrows:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", T.StringType()),
                    T.StructField(id_col, df.schema[id_col].dataType),
                    T.StructField("bm25", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    qdf = spark.createDataFrame(
        [(str(qid), t, idf) for qid, t, idf in qrows],
        "query_id string, term string, idf double",
    )
    toks = _toks(F.col(text_col))
    # one row per token OCCURRENCE (an array_intersect would dedup and
    # flatten tf to 1), membership-tested by a broadcast hash join against
    # the distinct term set — a hash probe per token (an array_contains
    # scan over a big literal term list would be O(|terms|) per token for
    # 10k-query batches). Non-matching tokens die map-side inside the
    # broadcast join; the groupBy shuffle carries only the hits.
    hits = (
        df.select(
            F.col(id_col),
            F.size(toks).alias("_dl"),
            F.explode(toks).alias("term"),
        )
        .join(F.broadcast(qdf.select("term").distinct()), "term")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("_tf"), F.first("_dl").alias("_dl"))
    )
    tf = F.col("_tf").cast("double")
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl").cast("double") / F.lit(avgdl)
    )
    contrib = F.col("idf") * tf * F.lit(k1 + 1.0) / denom
    scored = (
        hits.join(F.broadcast(qdf), "term")
        .withColumn("_c", contrib)
        .groupBy("query_id", id_col)
        .agg(F.sum("_c").alias("bm25"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select("query_id", id_col, "bm25", "rank")
    )


def reference_bm25(
    docs: dict, query: str | list[str], k1: float = 1.2, b: float = 0.75
) -> dict:
    """Independent pure-Python BM25 (same normalization/idf/order of
    operations) — the parity oracle for tests. ``docs`` maps id → text;
    returns id → score."""
    terms = _query_terms(query)
    tokenized = {i: py_clean_tokens(t) for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in tokenized.values()) / n if n else 0.0
    dfs = {
        t: sum(1 for v in tokenized.values() if t in v) for t in terms
    }
    out = {}
    for i, v in tokenized.items():
        score = 0.0
        for t in terms:
            df_t = dfs.get(t, 0)
            if df_t == 0 or n == 0:
                continue
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            tf = float(v.count(t))
            denom = tf + k1 * ((1.0 - b) + b * float(len(v)) / avgdl)
            score = score + idf * tf * (k1 + 1.0) / denom
        out[i] = score
    return out
