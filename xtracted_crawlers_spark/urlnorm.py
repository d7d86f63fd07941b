"""URL canonicalization and identity — SURVEY.md §2 C1 / B4 / D1.

Reference semantics (studied, not copied):
- canonical identity ``url_id`` is the ASIN ``(B0|BT)[A-Z0-9]{8}`` parsed
  from the ``/dp/`` segment of the URL *path*; the query string is ignored
  for identity but preserved for fetching
  (/root/reference/tests/integration/amazon_server.py:8 pins the pattern,
  /root/reference/xtracted/crawlers/extractor_factory.py:18-20 matches on
  ``url.path``, /root/reference/tests/integration/test_pg_crawl_job_syncer.py:84-89
  pins query-insensitivity: same ASIN + ``?something=different`` ⇒ duplicate).
- URL-type routing: a URL whose path matches is ``amazon_product``; anything
  else routes to no extractor and is dropped
  (extractor_factory.py:15-28 returns None).
- ``root_url`` is ``scheme://netloc`` when the scheme starts with ``http``,
  else None (amazon_async_product.py:21-26).

Everything here is a JVM-side column expression (regexp / parse_url /
xxhash64) — no Python on the hot path. The pure-Python mirrors at the bottom
exist only for the parity simulator and golden tests.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urlparse

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASIN pattern, applied to the URL *path* only (query string excluded).
ASIN_PATH_RE = r"/dp/((?:B0|BT)[A-Z0-9]{8})"
AMAZON_PRODUCT = "amazon_product"


def url_path(url: Column | str) -> Column:
    """Path component of the URL (query excluded)."""
    return F.try_parse_url(url, F.lit("PATH"))


def url_id(url: Column | str) -> Column:
    """Canonical identity: ASIN from the /dp/ path segment; '' if no match."""
    return F.regexp_extract(url_path(url), ASIN_PATH_RE, 1)


def url_type(url: Column | str) -> Column:
    """Extractor routing: 'amazon_product' when the path carries an ASIN,
    NULL otherwise (NULL rows are dropped, mirroring the factory's None)."""
    return F.when(url_id(url) != "", F.lit(AMAZON_PRODUCT)).otherwise(F.lit(None))


# netloc per RFC 3986 authority: everything between '://' and the next
# '/?#'. Spark's parse_url(HOST) strips the port; the reference's
# urlparse().netloc keeps it (test URLs are http://localhost:{port}/dp/...),
# so we extract the authority with a regexp instead.
_NETLOC_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def netloc(url: Column | str) -> Column:
    """Authority component incl. port, mirroring urlparse().netloc."""
    return F.regexp_extract(url, _NETLOC_RE, 1)


def host(url: Column | str) -> Column:
    """Scheduler partition key: lowercased netloc (host incl. port)."""
    return F.lower(netloc(url))


# Multi-label public suffixes for registrable-domain extraction. The
# full Mozilla Public Suffix List is ~10k entries and version-churns;
# politeness grouping needs only the high-traffic multi-label country
# suffixes — a host under an UNLISTED multi-label suffix degrades to a
# *finer* grouping (more domains, politer), never a coarser one, so the
# subset errs on the safe side. Single-label TLDs need no list: the
# default rule (registrable = last two labels) covers them.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "co.nz", "net.nz", "org.nz", "co.za", "org.za",
    "com.pl", "com.ru", "com.ua", "co.il", "co.th", "co.id",
    "example.test",  # the synthetic corpus' own 2-label suffix
)


def registrable_domain(host_col: Column | str) -> Column:
    """eTLD+1 of a (lowercased) host — the "per-domain" in per-domain
    politeness: shard1.example.co.uk and shard2.example.co.uk are ONE
    crawl target (one robots scope, one token bucket), so budgets keyed
    on raw host would over-crawl multi-subdomain sites. Rule: last two
    labels, or last three when the last two are a listed multi-label
    public suffix (MULTI_SUFFIXES); hosts with too few labels and IPv4
    literals pass through unchanged. Pure split/slice expressions —
    codegen, no UDF; the port (never part of the PSL) is stripped."""
    h = F.lower(F.col(host_col) if isinstance(host_col, str) else host_col)
    h = F.split(h, ":")[0]  # strip port
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_ipv4 = h.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return (
        F.when(is_ipv4 | (n <= 2), h)
        .when(last2.isin(*MULTI_SUFFIXES), F.when(n >= 3, last3).otherwise(h))
        .otherwise(last2)
    )


def root_url(url: Column | str) -> Column:
    """scheme://netloc when scheme startswith http, else NULL."""
    proto = F.try_parse_url(url, F.lit("PROTOCOL"))
    return F.when(
        proto.startswith("http"),
        F.concat(proto, F.lit("://"), netloc(url)),
    ).otherwise(F.lit(None))


# path+query (fragment excluded): everything between the authority and
# '#'. Shared by the JVM surt_key and its DuckDB oracle mirror.
PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def surt_key(url: Column | str) -> Column:
    """SURT-canonical sort key (the Common-Crawl/OpenWayback CDX 'urlkey'
    convention, documented subset): lowercased, scheme dropped, host
    labels reversed and comma-joined with a leading 'www.' stripped,
    port kept after the reversed host, then ')' + path?query ('' → '/').
    com,example)/dp/b0xy?v=2 sorts all of a domain's URLs — and all of
    its subdomains' — contiguously, which is what makes a sorted CDX
    index range-scannable per domain. Pure JVM exprs; py_surt_key is the
    fuzz-tested twin."""
    n = F.lower(netloc(url))
    hostonly = F.substring_index(n, ":", 1)
    port = F.when(
        n.contains(":"), F.concat(F.lit(":"), F.substring_index(n, ":", -1))
    ).otherwise(F.lit(""))
    rev = F.array_join(
        F.reverse(F.split(F.regexp_replace(hostonly, r"^www\.", ""), r"\.")), ","
    )
    pq = F.lower(F.regexp_extract(url, PATHQ_RE, 1))
    pq = F.when(pq == "", F.lit("/")).otherwise(pq)
    return F.concat(rev, port, F.lit(")"), pq)


def seen_key(user_id: Column | str, job_id: Column | str, uid: Column | str) -> Column:
    """64-bit hashed dedup key over the composite identity
    (user_id, job_id, url_id) — the bloom/seen-set key (north_rule:
    canonicalized + hashed)."""
    return F.xxhash64(user_id, job_id, uid)


def salted_host(host_col: Column | str, seq_col: Column | str, salt_n: int = 16) -> Column:
    """Skew-mitigation partition key: hot hosts are spread over ``salt_n``
    sub-keys so one domain can't pin a whole partition."""
    return F.concat_ws("#", host_col, F.pmod(F.xxhash64(seq_col), F.lit(salt_n)).cast("string"))


# ---------------------------------------------------------------------------
# Pure-Python mirrors — parity simulator / golden tests ONLY (not hot path).
# ---------------------------------------------------------------------------

import re as _re

_ASIN_PY_RE = _re.compile(r"/dp/((?:B0|BT)[A-Z0-9]{8})")


def py_url_id(url: str) -> Optional[str]:
    m = _ASIN_PY_RE.search(urlparse(url).path)
    return m.group(1) if m else None


def py_url_type(url: str) -> Optional[str]:
    return AMAZON_PRODUCT if py_url_id(url) else None


def py_host(url: str) -> str:
    return urlparse(url).netloc.lower()


def py_registrable_domain(host: str) -> str:
    """Twin of registrable_domain (tests/fuzz only)."""
    import re

    h = host.lower().split(":")[0]
    if re.fullmatch(r"\d+\.\d+\.\d+\.\d+", h):
        return h
    labels = h.split(".")
    if len(labels) <= 2:
        return h
    if ".".join(labels[-2:]) in MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def py_surt_key(url: str) -> str:
    """Twin of surt_key (tests/fuzz only)."""
    p = urlparse(url)
    n = p.netloc.lower()
    hostonly, _, port = n.partition(":")
    if hostonly.startswith("www."):
        hostonly = hostonly[4:]
    rev = ",".join(reversed(hostonly.split(".")))
    path = p.path + (";" + p.params if p.params else "")
    pq = (path + ("?" + p.query if p.query else "")).lower() or "/"
    return f"{rev}{':' + port if port else ''}){pq}"


# Fast path for py_root_url: plain `scheme://netloc...` URLs, which is
# every URL the crawler ever synthesizes or fetches. The netloc charset
# excludes whitespace (urlparse strips \t\r\n pre-parse) and brackets
# (urlparse validates IPv6 and can raise) so anything the fast path
# accepts parses EXACTLY like urlparse; everything else falls back.
# Why it exists: urlparse is ~14% of the whole extraction kernel
# (profiled round 3 — extract_payload calls py_root_url per page).
_FAST_ROOT_RE = _re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#\s\[\]\\]*)(?=[/?#]|$)")


def py_root_url(url: str) -> Optional[str]:
    m = _FAST_ROOT_RE.match(url)
    if m is not None:
        scheme = m.group(1).lower()
        if scheme.startswith("http"):
            return f"{scheme}://{m.group(2)}"
        return None
    p = urlparse(url)
    if p.scheme.startswith("http"):
        return f"{p.scheme}://{p.netloc}"
    return None
