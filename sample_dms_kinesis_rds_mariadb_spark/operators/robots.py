"""robots.txt (RFC 9309) compliance for crawl curation — enforcement as
a JOIN, not a UDF.

A responsible crawl pipeline filters its URL frontier through each
site's robots rules. The Spark-first shape: PARSE robots.txt files once
(driver/executor-side Python over the robots corpus — control-plane
sized: one small file per domain) into RULE ROWS ``(domain, allow,
pattern, precedence, regex)``, then evaluate any number of URLs with a
domain-keyed equi-join + ``rlike`` + a longest-match aggregate — all
JVM-side, shuffling only (url, domain, path) and rule rows, never
payloads. At 100 TB of frontier the rules side is tiny per domain and
broadcastable.

Semantics (RFC 9309): groups of ``User-agent`` lines followed by
``Allow``/``Disallow`` rules; every group matching our agent token
combines (falling back to the ``*`` groups); empty ``Disallow:`` means
no rule;
patterns are byte-prefix matches with ``*`` wildcards and an optional
``$`` end anchor; among matching rules the LONGEST pattern wins, and on
a length tie ``Allow`` wins; a URL matching no rule is allowed.
Verified against an independent straightforward Python matcher and the
RFC's own examples in ``tests/test_robots.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def robots_pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored Java/RE2-safe regex: literal
    chars escaped, ``*`` → ``.*``, trailing ``$`` → end anchor."""
    anchor_end = pattern.endswith("$")
    body = pattern[:-1] if anchor_end else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchor_end else "")


def parse_robots(content: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse one robots.txt into the rule list applying to ``agent``:
    ``[(allow, pattern), ...]``. Group selection per RFC 9309 §2.2.1:
    ALL groups whose ``User-agent`` tokens equal ``agent``
    (case-insensitive) COMBINE into one rule set; otherwise all ``*``
    groups combine; otherwise no rules (everything allowed).
    Comments (``#``) strip to end of line; unknown directives and
    ``Sitemap``/``Crawl-delay`` lines are ignored for matching."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_header = True
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_header:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_header = True
            cur_agents.append(value.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # rules before any user-agent line: ignored
            in_header = False
            if value == "":
                continue  # empty pattern = no rule (RFC 9309 §2.2.2)
            cur_rules.append((key == "allow", value))
        # sitemap / crawl-delay / unknown: ignored for matching
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent = agent.lower()
    # RFC 9309 §2.2.1: ALL groups matching the agent combine into one
    specific = [r for agents, rules in groups if agent in agents for r in rules]
    if agent != "*" and specific:
        return specific
    return [r for agents, rules in groups if "*" in agents for r in rules]


ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("precedence", T.IntegerType(), False),
        T.StructField("regex", T.StringType(), False),
    ]
)


def compile_robots_rules(
    spark, robots: list[tuple[str, str]], agent: str = "*"
) -> DataFrame:
    """(domain, robots_txt) pairs → the rule-row DataFrame
    :func:`robots_filter` joins against. Parsing cost is per robots FILE
    (control-plane sized); at larger scale run the same compile inside
    ``mapInPandas`` over a robots corpus table."""
    rows = []
    for domain, content in robots:
        for allow, pattern in parse_robots(content, agent=agent):
            rows.append(
                (
                    domain,
                    allow,
                    pattern,
                    len(pattern),
                    robots_pattern_regex(pattern),
                )
            )
    return spark.createDataFrame(rows, ROBOTS_RULES_SCHEMA)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Append an ``allowed`` verdict to each URL row: domain-keyed join
    to the rule rows, ``rlike`` match, then the RFC's longest-match
    resolution as one aggregate — ``max_by`` over (precedence, allow)
    makes Allow win length ties; rows matching no rule are allowed.
    Everything JVM-side; broadcast the rules when they fit."""
    r = rules.select(
        F.col("domain").alias("_r_domain"),
        "allow",
        "precedence",
        F.col("regex").alias("_r_regex"),
    )
    matched = (
        urls.select(domain_col, path_col)
        .distinct()
        .join(r, F.col(domain_col) == F.col("_r_domain"), "inner")
        # column-valued pattern: RLIKE the SQL operator (the per-row
        # pattern compile is bounded by rules-per-domain; pre-group by
        # pattern if a single domain carries pathological rule counts)
        .where(F.expr(f"`{path_col}` RLIKE _r_regex"))
        .groupBy(domain_col, path_col)
        .agg(
            F.max_by(
                "allow",
                F.struct(
                    F.col("precedence"),
                    F.col("allow").cast("int").alias("a"),
                ),
            ).alias("_verdict")
        )
    )
    return urls.join(matched, [domain_col, path_col], "left").withColumn(
        "allowed", F.coalesce(F.col("_verdict"), F.lit(True))
    ).drop("_verdict")


def parse_sitemaps(content: str) -> list[str]:
    """``Sitemap:`` directive URLs from a robots.txt — sitemap lines are
    group-independent per RFC 9309 §2.2.4 (they apply file-wide)."""
    out = []
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if line.lower().startswith("sitemap:"):
            v = line.partition(":")[2].strip()
            if v:
                out.append(v)
    return out


def sitemap_locs(col):
    """``<loc>`` URLs from a sitemaps.org XML document (urlset OR
    sitemapindex — the caller tells them apart with
    :func:`is_sitemap_index`) as an ARRAY<STRING> column. The ONE
    sitemap-parsing implementation (``functions/html.py::sitemap_urls``
    delegates here): plain and ``<![CDATA[...]]>``-wrapped values,
    attribute-bearing ``<loc>`` tags, trimming, and the XML
    named-entity unescape chain the sitemap spec REQUIRES for URLs
    (``&amp;`` replaced LAST so double-escaped text never
    double-decodes; CDATA values are literal and skip the unescape).
    Numeric character references pass through — the spec requires only
    the five named entities. Pure codegen: no Python, no shuffle — at
    100 TB this is a scan."""
    raw = F.regexp_extract_all(
        col,
        F.lit(r"(?is)<loc(?:\s[^>]*)?>\s*(<!\[CDATA\[.*?\]\]>|[^<]*?)\s*</loc\s*>"),
        1,
    )

    def _clean(u):
        # the (?i) pattern matched the wrapper case-insensitively, so
        # the unwrap check must be case-insensitive too
        is_cdata = F.lower(u).startswith("<![cdata[")
        literal = F.trim(u.substr(F.lit(10), F.length(u) - F.lit(12)))
        unescaped = u
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&apos;", "'"), ("&amp;", "&")):
            unescaped = F.replace(unescaped, F.lit(ent), F.lit(ch))
        return F.when(is_cdata, literal).otherwise(unescaped)

    return F.filter(F.transform(raw, _clean), lambda u: u != "")


def is_sitemap_index(col):
    """True when the document is a sitemap INDEX (its locs are more
    sitemaps to fetch, not page URLs)."""
    return col.rlike("(?is)<\\s*sitemapindex[\\s>]")


def parse_crawl_delay(content: str, agent: str = "*") -> float | None:
    """``Crawl-delay`` seconds for ``agent`` (de-facto extension; not in
    RFC 9309 but honored by most crawlers): same group selection as
    :func:`parse_robots`; the MAXIMUM across combined groups wins
    (politest interpretation). None when absent or malformed."""
    groups: list[tuple[list[str], list[float]]] = []
    cur_agents: list[str] = []
    cur_delays: list[float] = []
    in_header = True
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_header:
                groups.append((cur_agents, cur_delays))
                cur_agents, cur_delays = [], []
                in_header = True
            cur_agents.append(value.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            if not cur_agents:
                continue
            in_header = False
            if key == "crawl-delay":
                try:
                    cur_delays.append(float(value))
                except ValueError:
                    pass
    if cur_agents:
        groups.append((cur_agents, cur_delays))
    agent = agent.lower()
    specific = [d for agents, ds in groups if agent in agents for d in ds]
    if agent == "*" or not specific:
        specific = [d for agents, ds in groups if "*" in agents for d in ds]
    return max(specific) if specific else None


def robots_rules_from_corpus(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Distributed rule compilation over a robots CORPUS table (one row
    per domain, e.g. Common Crawl's robotstxt responses routed through
    ``sources/warc.py``): the same parse as :func:`compile_robots_rules`
    running inside Arrow-batched ``mapInPandas`` — partition-parallel,
    nothing collected, output schema identical so :func:`robots_filter`
    consumes either."""
    import pandas as pd

    def _compile(batches):
        for pdf in batches:
            rows = []
            for domain, content in zip(pdf[domain_col], pdf[text_col]):
                if content is None:
                    continue
                for allow, pattern in parse_robots(content, agent=agent):
                    rows.append(
                        {
                            "domain": domain,
                            "allow": allow,
                            "pattern": pattern,
                            "precedence": len(pattern),
                            "regex": robots_pattern_regex(pattern),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROBOTS_RULES_SCHEMA.fields]
            )

    return df.select(domain_col, text_col).mapInPandas(
        _compile, schema=ROBOTS_RULES_SCHEMA
    )
