"""URL canonicalization — vectorized Arrow/pandas UDFs.

Two modes:

* ``compat`` — reproduces the reference's ``normalize_url`` exactly
  (reference: ``crawler/discovery.py:79-89``): rebuild
  ``scheme://netloc/path`` and append ``?query`` verbatim when present;
  the fragment is dropped. Host case, default ports and query-param
  order are all preserved. This mode is what the seen-set / crawl
  ordering equivalence tests pin against.

* ``full`` — the scale-up canonicalizer (BASELINE.json north_star):
  compat plus lowercase scheme+host, strip default ports (http:80 /
  https:443), and sort query parameters (stable sort on the raw
  ``k=v`` tokens, preserving duplicate keys' relative order).

Also provides URL classification predicates as native Column
expressions (reference: ``crawler/discovery.py:69-76``) and host/path
helpers used by partitioning, robots filtering and politeness.

No per-row Python UDFs: canonicalization runs inside Arrow-batched
pandas UDFs; classification/hashing are pure JVM expressions.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

DEFAULT_PORTS = {"http": "80", "https": "443"}


# ---------------------------------------------------------------- pure fns


def canonicalize_url(url: str, mode: str = "compat") -> str:
    """Canonicalize one URL. See module docstring for mode semantics."""
    parsed = urlparse(url)
    scheme, netloc = parsed.scheme, parsed.netloc
    if mode == "full":
        scheme = scheme.lower()
        netloc = netloc.lower()
        if ":" in netloc:
            host, _, port = netloc.rpartition(":")
            if DEFAULT_PORTS.get(scheme) == port:
                netloc = host
    out = f"{scheme}://{netloc}{parsed.path}"
    if parsed.query:
        query = parsed.query
        if mode == "full":
            query = "&".join(sorted(query.split("&")))
        out += f"?{query}"
    return out


def url_host(url: str) -> str:
    """Lowercased host (no port) — the partitioning/politeness key."""
    netloc = urlparse(url).netloc.lower()
    host, _, port = netloc.rpartition(":")
    return host if host else netloc


def resolve_url(base: str, href: str) -> str:
    """Absolutize a link against its page URL (stdlib urljoin)."""
    return urljoin(base, href)


# ------------------------------------------------------------- pandas UDFs


@pandas_udf(StringType())
def canonicalize_compat_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u, "compat"))


@pandas_udf(StringType())
def canonicalize_full_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u, "full"))


@pandas_udf(StringType())
def url_host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(url_host)


def canonicalize_col(url: Column, mode: str = "compat") -> Column:
    return canonicalize_compat_udf(url) if mode == "compat" else canonicalize_full_udf(url)


# ----------------------------------------------------- native-Column exprs


def url_path(url: Column) -> Column:
    """Path component as a native expression (for robots prefix checks).

    ``scheme://netloc<path>[?query][#frag]`` → ``<path>`` (may be '').
    """
    after_host = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    return F.regexp_extract(after_host, r"^([^?#]*)", 1)


def is_navigation_url(url: Column) -> Column:
    """Reference nav-page predicate (``crawler/discovery.py:69-71``)."""
    return url.contains("/calregs/Browse/") | url.endswith("/calregs/Index")


def is_section_url(url: Column) -> Column:
    """Reference section-page predicate (``crawler/discovery.py:74-76``)."""
    return url.contains("/calregs/Document/")


def url_hash64(url: Column) -> Column:
    """64-bit xxhash of the canonical URL — seen-set / Bloom key."""
    return F.xxhash64(url)


def host_bucket(host: Column, n_buckets: int) -> Column:
    """Host-hash salted bucket (north_rule skew clause)."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")
