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
common multi-label public suffixes (``co.uk``-style). The full Public
Suffix List is external data this environment cannot fetch; pass
``extra_suffixes`` to extend the set where precision matters.
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


def url_registered_domain(
    url_or_host: Column,
    extra_suffixes: tuple[str, ...] = (),
    is_host: bool = False,
) -> Column:
    """eTLD+1 (the per-domain cap / mixing key): the last two host labels,
    or three when the last two are a known multi-label public suffix
    (``co.uk``-style; see module docstring for the PSL caveat). Pass
    ``is_host=True`` when the column already holds bare hosts."""
    # hostnames are case-insensitive (RFC 4343): lower even when the
    # caller passes bare hosts, or mixed-case input would miss the suffix
    # set and split one site across cap groups
    host = F.lower(url_or_host) if is_host else url_host(url_or_host)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
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
