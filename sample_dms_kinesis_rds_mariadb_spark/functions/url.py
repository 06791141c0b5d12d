"""URL normalization for crawl-corpus curation — pure column expressions.

Per-domain caps (`operators/sampling.py::cap_per_group`), URL-level exact
dedup, and domain mixing all need a STABLE key from messy crawl URLs:
`HTTPS://WWW.Example.COM:443/a/?utm_source=x&b=2&a=1#frag` and
`https://example.com/a?a=1&b=2` must collide. Everything here is built
from `lower` / `regexp_extract` / `split` / `array_sort` / higher-order
`filter` — whole-stage codegen, no UDFs, NULL-propagating — so the keys
compute at scan speed over 100 TB of crawl metadata.

The reference has no URL surface (its sources are relational tables);
this extends the engine's LLM-pipeline operator set the way `text.py`
extends it for quality gating.

Canonicalization contract (documented here, asserted in tests/test_url.py
against an independent Python reference):

- missing scheme ⇒ ``http://`` assumed; protocol-relative ``//host/x``
  treated as scheme-relative (``http`` assumed); scheme lowercased
- host: lowercased, userinfo (``user:pass@``) stripped, trailing dot
  stripped, leading ``www.`` stripped, default ports (http:80, https:443)
  stripped NUMERICALLY (``:0080`` is the default too), other ports kept
  in numeric form (``:0900`` ⇒ ``:900``); non-numeric ports are out of
  contract and dropped
- path: empty ⇒ ``/``; trailing slashes stripped except on the root
- query: tracking params dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_eid``, ``igshid``, ``ref``, ``ref_src``, ``spm``),
  the rest SORTED by their full ``k=v`` text; empty query dropped
- fragment: dropped
- bracketed IPv6 authorities: the whole ``[...]`` passes through as an
  opaque host (colons inside brackets are address separators); only a
  ``:<digits>`` after the closing bracket is treated as a port

`url_registered_domain` is the eTLD+1 heuristic over a built-in set of
common multi-label public suffixes (``co.uk``-style). Where precision
matters, pass ``extra_suffixes`` to extend the set — or load the FULL
Public Suffix List (user-supplied file; external data this environment
cannot fetch itself) with :func:`load_psl` and pass it as ``psl=``:
the complete algorithm (exact rules at any depth, ``*.ck`` wildcards,
``!www.ck`` exceptions, longest-match, implicit ``*`` default) compiles
to the same codegen shape — per-depth ``isin`` membership tests, which
Catalyst converts to hash-set ``InSet`` lookups above the conversion
threshold, so even the ~9k-rule real PSL costs O(1) set probes per row,
never a literal comparison chain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# common multi-label public suffixes; extend per-call via extra_suffixes
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "co.kr", "co.nz", "co.id", "co.th",
    "com.my", "com.ph", "com.vn", "com.eg", "com.sa", "com.pk",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
)

_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src|spm)(=.*)?$"


def _with_scheme(url: Column) -> Column:
    # protocol-relative '//host/path' is scheme-relative, not path: prefix
    # only 'http:' or the host would parse as an empty authority
    return (
        F.when(url.contains("://"), url)
        .when(url.startswith("//"), F.concat(F.lit("http:"), url))
        .otherwise(F.concat(F.lit("http://"), url))
    )


def url_scheme(url: Column) -> Column:
    """Lowercased scheme (``http`` assumed when absent)."""
    return F.lower(
        F.regexp_extract(_with_scheme(url), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )


def _host_port(url: Column) -> Column:
    rest = F.regexp_replace(_with_scheme(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    # userinfo strip: everything after the LAST @ in the authority
    return F.element_at(F.split(authority, "@"), -1)

def url_host(url: Column) -> Column:
    """Canonical host: lowercased, userinfo/port/trailing-dot stripped,
    leading ``www.`` stripped. A bracketed IPv6 authority keeps its whole
    ``[...]`` content as the host (colons inside brackets are address
    separators, not a port delimiter). NULL in ⇒ NULL out."""
    hp = _host_port(url)
    host = F.when(
        hp.startswith("["),
        F.regexp_extract(hp, r"^(\[[^\]]*\]?)", 1),
    ).otherwise(F.regexp_extract(hp, r"^([^:]*)", 1))
    host = F.lower(host)
    host = F.regexp_replace(host, r"\.$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_port(url: Column) -> Column:
    """Explicit port as a string, '' when absent. For a bracketed IPv6
    authority only a ``:<digits>`` AFTER the closing bracket is a port."""
    hp = _host_port(url)
    return F.when(
        hp.startswith("["),
        F.regexp_extract(hp, r"^\[[^\]]*\]:(\d+)$", 1),
    ).otherwise(F.regexp_extract(hp, r":(\d+)$", 1))


def url_path(url: Column) -> Column:
    """Canonical path: '' ⇒ '/', trailing slashes stripped off non-root."""
    rest = F.regexp_replace(_with_scheme(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query_canonical(url: Column) -> Column:
    """Query with tracking params dropped and the rest sorted by their
    full ``k=v`` text; '' when nothing survives."""
    # query must come BEFORE any '#': a '?' inside the fragment is part of
    # the fragment and drops with it (the documented contract)
    qs = F.regexp_extract(_with_scheme(url), r"^[^#]*?\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    return F.concat_ws("&", F.array_sort(params))


def canonical_url(url: Column) -> Column:
    """The full canonical form (module-docstring contract) — the stable
    URL-dedup key. NULL in ⇒ NULL out."""
    scheme = url_scheme(url)
    host = url_host(url)
    # numeric comparison + numeric rendering: ':0080' is the default http
    # port and ':0900' canonicalizes to ':900' (string comparison missed
    # both); a NULL cast (no port) renders nothing
    # try_cast: '' (no port) and malformed ports become NULL, never an
    # ANSI cast error mid-scan
    port_num = url_port(url).try_cast("int")
    default_port = ((scheme == "http") & (port_num == 80)) | (
        (scheme == "https") & (port_num == 443)
    )
    port_part = F.when(
        port_num.isNull() | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port_num.cast("string")))
    q = url_query_canonical(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_part, url_path(url), q_part)


def url_dedup_key(url: Column) -> Column:
    """md5 of the canonical form — the compact equi-join/groupBy key for
    URL-level exact dedup (same cross-engine-hash discipline as the text
    dedup family)."""
    return F.md5(canonical_url(url))


class PublicSuffixList:
    """Compiled Public Suffix List rules, bucketed by label depth for the
    per-depth ``isin`` membership tests :func:`url_registered_domain`
    emits. Build via :func:`parse_psl` / :func:`load_psl`."""

    def __init__(
        self,
        exact: dict[int, list[str]],
        wildcards: dict[int, list[str]],
        exceptions: dict[int, list[str]],
    ) -> None:
        self.exact = exact          # depth -> exact suffix rules
        self.wildcards = wildcards  # parent depth -> wildcard parents
        self.exceptions = exceptions  # depth -> exception rule domains

    @property
    def n_rules(self) -> int:
        return sum(
            len(v)
            for d in (self.exact, self.wildcards, self.exceptions)
            for v in d.values()
        )


def parse_psl(lines) -> PublicSuffixList:
    """Parse PSL-format lines (publicsuffix.org/list/ syntax): one rule
    per line up to the first whitespace, ``//`` comments and blanks
    skipped, ``*.`` prefix = wildcard (matches exactly one extra label),
    ``!`` prefix = exception (the domain itself is registrable). Rules
    are lowercased; hosts must be supplied in matching (punycode or
    unicode) form."""
    exact: dict[int, list[str]] = {}
    wildcards: dict[int, list[str]] = {}
    exceptions: dict[int, list[str]] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            dom = rule[1:]
            exceptions.setdefault(dom.count(".") + 1, []).append(dom)
        elif rule.startswith("*."):
            parent = rule[2:]
            wildcards.setdefault(parent.count(".") + 1, []).append(parent)
        else:
            exact.setdefault(rule.count(".") + 1, []).append(rule)
    return PublicSuffixList(exact, wildcards, exceptions)


def load_psl(path: str) -> PublicSuffixList:
    """Load a user-supplied PSL file (see module docstring)."""
    with open(path, encoding="utf-8") as f:
        return parse_psl(f)


def url_registered_domain(
    url_or_host: Column,
    extra_suffixes: tuple[str, ...] = (),
    is_host: bool = False,
    psl: PublicSuffixList | None = None,
) -> Column:
    """eTLD+1 (the per-domain cap / mixing key).

    Default mode: the last two host labels, or three when the last two
    are a known multi-label public suffix (``co.uk``-style built-in set
    + ``extra_suffixes``). With ``psl=`` (a :func:`load_psl` result) the
    COMPLETE PSL algorithm runs instead: among all matching rules the
    longest wins, ``*.parent`` wildcards match exactly one extra label,
    ``!domain`` exceptions override (the exception domain itself is the
    registrable domain), and the implicit ``*`` default makes every bare
    TLD a suffix. A host that IS a public suffix returns unchanged (same
    contract as the default mode's single-label fallthrough). Pass
    ``is_host=True`` when the column already holds bare hosts."""
    # hostnames are case-insensitive (RFC 4343): lower even when the
    # caller passes bare hosts, or mixed-case input would miss the suffix
    # set and split one site across cap groups
    host = F.lower(url_or_host) if is_host else url_host(url_or_host)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    if psl is None:
        last2 = F.concat_ws(
            ".", F.element_at(parts, -2), F.element_at(parts, -1)
        )
        suffixes = tuple(MULTI_SUFFIXES) + tuple(extra_suffixes)
        is_multi = last2.isin(*suffixes)
        return (
            F.when(
                (n >= 3) & is_multi,
                F.concat_ws(".", F.element_at(parts, -3), last2),
            )
            .when(n >= 2, last2)
            .otherwise(host)
        )

    def lastk(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(parts, -i) for i in range(k, 0, -1)]
        )

    # suffix length = longest matching rule (implicit '*' default = 1);
    # each depth is ONE isin (InSet hash probe) over that depth's rules
    cands = [F.lit(1)]
    for k, vals in sorted(psl.exact.items()):
        cands.append(
            F.when((n >= k) & lastk(k).isin(*vals), F.lit(k)).otherwise(0)
        )
    for m, parents in sorted(psl.wildcards.items()):
        # '*.parent': one extra label must exist in the wildcard slot
        cands.append(
            F.when(
                (n >= m + 1) & lastk(m).isin(*parents), F.lit(m + 1)
            ).otherwise(0)
        )
    suffix_len = F.greatest(*cands) if len(cands) > 1 else cands[0]
    # exceptions override everything: the rule domain is registrable,
    # so the public suffix is the rule minus its leftmost label
    for k, vals in sorted(psl.exceptions.items()):
        suffix_len = F.when(
            (n >= k) & lastk(k).isin(*vals), F.lit(k - 1)
        ).otherwise(suffix_len)
    reg_len = F.least(suffix_len + 1, n)
    start = n - reg_len + 1
    # NULL guard: concat_ws renders all-NULL as '' — NULL in, NULL out
    return F.when(
        host.isNotNull(), F.concat_ws(".", F.slice(parts, start, reg_len))
    )
