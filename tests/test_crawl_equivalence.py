"""Crawl-equivalence: the engine's final URL-seen set AND discovered
ordering must match a pure-Python single-threaded BFS oracle that
implements the reference's exact semantics
(``crawler/discovery.py:275-299`` with MAX_CONCURRENT=1, document link
order) over the same synthetic site, same seed list (north_rule)."""

from collections import deque

import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.htmlx.links import extract_links
from ccr_web_crawler_spark.functions.urlnorm import canonicalize_url
from ccr_web_crawler_spark.plans.driver import crawl
from ccr_web_crawler_spark.plans.round import RoundConfig
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
from ccr_web_crawler_spark.sources.tableio import SnapshotStore


def _is_nav(url: str) -> bool:  # crawler/discovery.py:69-71
    return "/calregs/Browse/" in url or url.endswith("/calregs/Index")


def _is_sec(url: str) -> bool:  # crawler/discovery.py:74-76
    return "/calregs/Document/" in url


def bfs_oracle(pages: dict[str, bytes], seed_url: str):
    """Reference crawl loop, MAX_CONCURRENT=1."""
    queue = deque([canonicalize_url(seed_url)])
    visited: set[str] = set()
    discovered: list[str] = []
    while queue:
        url = queue.popleft()
        if url in visited:
            continue
        visited.add(url)
        html = pages.get(url)
        if html is None:
            continue  # fetch failure: visited, no links (ref :250-251)
        for link in extract_links(html.decode("utf-8"), url):
            if _is_nav(link):
                queue.append(link)
            elif _is_sec(link):
                if link not in discovered:
                    discovered.append(link)
    return visited, discovered


@pytest.fixture(scope="module")
def site(spark):
    pages = synth_pages(spark, n_pages=300, n_hosts=4).cache()
    page_map = {
        r.url: bytes(r.html) for r in pages.select("url", "html").collect()
    }
    return pages, page_map


def _run_engine(spark, pages, tmp_path, use_bloom=True):
    store = SnapshotStore(tmp_path / "db")
    cfg = RoundConfig(use_bloom=use_bloom, extract=False)
    summary = crawl(spark, pages, synth_seeds(spark), store, cfg)
    seen = {r.url_canon for r in store.read(spark, "seen").collect()}
    disc = [
        r.url_canon
        for r in store.read(spark, "discovered").orderBy("seq").collect()
    ]
    return summary, seen, disc


def test_engine_matches_bfs_oracle(spark, site, tmp_path):
    pages, page_map = site
    summary, seen, disc = _run_engine(spark, pages, tmp_path)
    o_visited, o_discovered = bfs_oracle(page_map, "https://host0.example/calregs/Index")
    assert seen == o_visited
    assert disc == o_discovered  # full ordering, not just the set
    assert summary.queue_remaining == 0  # queue drains (ref end state)
    # all four hosts reached through cross-host edges
    assert len({u.split("/")[2] for u in seen}) == 4


def test_bloom_and_exact_paths_agree(spark, site, tmp_path):
    pages, _ = site
    _, seen_b, disc_b = _run_engine(spark, pages, tmp_path / "b", use_bloom=True)
    _, seen_e, disc_e = _run_engine(spark, pages, tmp_path / "e", use_bloom=False)
    assert seen_b == seen_e
    assert disc_b == disc_e


def test_politeness_budget_preserves_seen_set(spark, site, tmp_path):
    """Budgeted rounds defer (never drop): same final seen set and
    discovered SET; ordering is the budget-respecting schedule."""
    pages, page_map = site
    store = SnapshotStore(tmp_path / "p")
    cfg = RoundConfig(extract=False, round_seconds=12.0)
    crawl(spark, pages, synth_seeds(spark), store, cfg, max_rounds=50)
    seen = {r.url_canon for r in store.read(spark, "seen").collect()}
    o_visited, o_discovered = bfs_oracle(page_map, "https://host0.example/calregs/Index")
    assert seen == o_visited
    disc = {r.url_canon for r in store.read(spark, "discovered").collect()}
    assert disc == set(o_discovered)
