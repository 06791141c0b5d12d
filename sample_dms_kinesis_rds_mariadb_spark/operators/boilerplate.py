"""Cross-document boilerplate removal — strip lines that repeat across
many documents of the same source (nav menus, cookie banners, footers,
license headers), the CCNet/RefinedWeb-style line-level dedup that
complements the WITHIN-doc repetition ratios in ``functions/text.py``.

A line is boilerplate in group ``g`` (e.g. ``source`` or domain) when it
appears in at least ``min_docs`` documents AND at least ``min_doc_frac``
of ``g``'s documents. Two stages, both bounded:

1. **stats** — one explode of per-doc DISTINCT line hashes (md5 of the
   trimmed line, never line text) shuffled on (group, hash): the shuffle
   carries ids+hashes; a doc repeating a line internally still counts
   once. Group sizes ride the same aggregate family.
2. **removal** — the qualifying hashes collapse to ONE row per group
   (``collect_set``), broadcast, and each document filters its line
   array in codegen (``F.filter`` + ``array_contains``) — a narrow map,
   no per-line shuffle of the corpus.

Scale boundary (documented, like the multiprobe/centroid bounds): the
broadcast carries groups × their boilerplate hashes. With a sane
``min_doc_frac`` that is nav-chrome-sized per group; a pathological
threshold (``min_doc_frac=0``, ``min_docs=1``) would broadcast every
distinct line — ``max_lines_per_group`` guards the build loudly instead
of letting the driver OOM at 100 TB.

The reference has no text-curation surface (its consumer counts CDC
events, reference run.py:175-188); this extends the engine's LLM-pipeline
operator set alongside the dedup families in ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINE_SEP = "\n"


def _line_hashes_distinct(text_col) -> object:
    """Per-doc DISTINCT md5 hashes of non-empty trimmed lines."""
    lines = F.split(text_col, _LINE_SEP)
    return F.array_distinct(
        F.transform(
            F.filter(lines, lambda l: F.trim(l) != F.lit("")),
            lambda l: F.md5(F.trim(l)),
        )
    )


def boilerplate_line_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_docs: int = 2,
    min_doc_frac: float = 0.5,
) -> DataFrame:
    """(group, line_hash, n_docs, doc_frac, is_boilerplate) for every
    distinct non-empty line — the audit view behind
    :func:`remove_boilerplate_lines` (which reuses this frame). Lines are
    reported as hashes, not text: the stats stay PII-free and the shuffle
    stays narrow."""
    per_doc = df.select(
        F.col(group_col).alias("group"),
        F.explode(_line_hashes_distinct(F.col(text_col))).alias("line_hash"),
    )
    counts = per_doc.groupBy("group", "line_hash").agg(
        F.count("*").alias("n_docs")
    )
    sizes = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("_group_docs")
    )
    # null-safe join: groupBy keyed the NULL group, so its counts must
    # meet its size row (a plain equi-join would silently drop the whole
    # NULL group from the stats)
    sizes = sizes.withColumnRenamed("group", "_sz_group")
    return (
        counts.join(
            F.broadcast(sizes),
            F.col("group").eqNullSafe(F.col("_sz_group")),
        )
        .drop("_sz_group")
        .withColumn("doc_frac", F.col("n_docs") / F.col("_group_docs"))
        .withColumn(
            "is_boilerplate",
            (F.col("n_docs") >= F.lit(int(min_docs)))
            & (F.col("doc_frac") >= F.lit(float(min_doc_frac))),
        )
        .drop("_group_docs")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_docs: int = 2,
    min_doc_frac: float = 0.5,
    out_col: str | None = None,
    max_lines_per_group: int = 100_000,
) -> DataFrame:
    """Rewrite ``text_col`` (or append ``out_col``) with the group's
    boilerplate lines removed; every other column passes through. Empty
    or whitespace-only lines are never counted OR removed — they are
    formatting, not boilerplate. ALL occurrences of a qualifying line go
    (a doc that repeats its own footer loses every copy).

    ``max_lines_per_group``: hard guard on the broadcast — if any group
    qualifies more distinct lines than this, raise instead of silently
    building a driver-sized plan (loosen thresholds or raise the cap
    deliberately).
    """
    out = out_col or text_col
    stats = boilerplate_line_stats(
        df, text_col, group_col, min_docs=min_docs, min_doc_frac=min_doc_frac
    )
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import _pin

    # the guard job below and the filter-back join would each re-evaluate
    # the full stats pipeline (corpus explode + two shuffles) — pin the
    # tiny per-group hash-set frame so the stats run once; the internal
    # ``_bp_group`` alias keeps a caller's own column literally named
    # "group" intact after the join (drop("group") would take both)
    bp = _pin(
        stats.filter(F.col("is_boilerplate"))
        .groupBy("group")
        .agg(F.collect_set("line_hash").alias("_bp_hashes"))
        .select(F.col("group").alias("_bp_group"), "_bp_hashes"),
        True,
    )
    worst = bp.agg(F.max(F.size("_bp_hashes")).alias("m")).first()["m"]
    if worst is not None and worst > max_lines_per_group:
        raise ValueError(
            f"a group qualifies {worst} boilerplate lines "
            f"(max_lines_per_group={max_lines_per_group}): thresholds "
            "min_docs/min_doc_frac are too loose to broadcast safely"
        )
    # null-safe: a NULL group is still a group (groupBy keyed it), so its
    # docs must see their own boilerplate set; <=> keeps the BHJ equi-join
    joined = df.join(
        F.broadcast(bp), df[group_col].eqNullSafe(bp["_bp_group"]), "left"
    ).drop("_bp_group")
    kept = F.filter(
        F.split(F.col(text_col), _LINE_SEP),
        lambda l: (F.trim(l) == F.lit(""))
        | ~F.coalesce(
            F.array_contains(F.col("_bp_hashes"), F.md5(F.trim(l))),
            F.lit(False),
        ),
    )
    return joined.withColumn(out, F.array_join(kept, _LINE_SEP)).drop(
        "_bp_hashes"
    )


def reference_remove_boilerplate(
    docs: dict[object, tuple[str, str]],
    min_docs: int = 2,
    min_doc_frac: float = 0.5,
) -> dict[object, str]:
    """Pure-Python mirror for parity tests. ``docs`` maps id ->
    (group, text); returns id -> cleaned text."""
    from collections import Counter, defaultdict

    by_group: dict[str, list[object]] = defaultdict(list)
    for i, (g, _t) in docs.items():
        by_group[g].append(i)
    bp: dict[str, set[str]] = {}
    for g, ids in by_group.items():
        c: Counter = Counter()
        for i in ids:
            seen = {
                ln.strip()
                for ln in docs[i][1].split(_LINE_SEP)
                if ln.strip() != ""
            }
            c.update(seen)
        n = len(ids)
        bp[g] = {
            ln
            for ln, k in c.items()
            if k >= min_docs and k / n >= min_doc_frac
        }
    out = {}
    for i, (g, t) in docs.items():
        kept = [
            ln
            for ln in t.split(_LINE_SEP)
            if ln.strip() == "" or ln.strip() not in bp[g]
        ]
        out[i] = _LINE_SEP.join(kept)
    return out
