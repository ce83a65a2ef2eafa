"""Link extraction — reference ``extract_links_from_html``
(``crawler/discovery.py:92-120``) re-expressed on htmlx.

Reference semantics: every ``<a href>`` in document order, absolutized
via ``urljoin(base, href)``, kept only when the *absolute* URL contains
the scope substring (``'/calregs/'``), then normalized, then
deduplicated per page.

One deliberate, documented deviation: the reference dedupes with
``list(set(links))`` whose order is nondeterministic
(``crawler/discovery.py:120``); we define the deterministic spec as
*first occurrence in document order*, which is the order the BFS oracle
(tests/test_crawl_equivalence.py) also uses.
"""

from __future__ import annotations

from ccr_web_crawler_spark.functions.htmlx.dom import parse_html
from ccr_web_crawler_spark.functions.htmlx.select import select
from ccr_web_crawler_spark.functions.urlnorm import canonicalize_url, resolve_url

SCOPE_SUBSTRING = "/calregs/"


def extract_links(
    html: str,
    base_url: str,
    scope_substring: str = SCOPE_SUBSTRING,
    mode: str = "compat",
) -> list[str]:
    """Absolute, in-scope, canonicalized, first-occurrence-deduped links."""
    root = parse_html(html)
    seen: set[str] = set()
    links: list[str] = []
    for a in select(root, "a[href]"):
        href = a.get("href")
        if href is None:
            continue
        absolute = resolve_url(base_url, href)
        if scope_substring in absolute:
            normalized = canonicalize_url(absolute, mode)
            if normalized not in seen:
                seen.add(normalized)
                links.append(normalized)
    return links
