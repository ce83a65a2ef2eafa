"""Deterministic synthetic web — the sandbox stand-in for the live site.

Generates an Iceberg-style ``pages`` table with the authoritative shape
from BASELINE.json input_hint: ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` where ``text`` is the golden
expected ``text_plain`` for the page. The page graph mirrors the
reference site's topology (``crawler/discovery.py:32,69-76``): per-host
``/calregs/Index`` roots, a b-ary tree of ``/calregs/Browse/`` nav pages,
``/calregs/Document/`` section pages hanging off navs, plus cross-host
edges from the hot host so a single seed reaches everything.

Skew by construction (north_rule): host0 holds ``hot_share`` of all
pages. Page statuses are planted deterministically: every
``parse_failure_every``-th doc has no text containers
(→ ``parse_failure``) and every ``external_every``-th carries a
dgs.ca.gov link (→ ``external_redirect``), matching the reference's
observed failure taxonomy (``data/sample_extraction.json``,
``crawler/extraction.py:140-149``).

Planning is driver-side (lightweight tuples: O(n) small strings);
HTML rendering runs distributed in ``mapInPandas`` so the heavy bytes
are produced on executors — the same split you'd use to synthesize a
100TB corpus.

Everything is a pure function of (n_pages, n_hosts, seed): no
wall-clock, no Python ``random`` on executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = (
    "regulation section compliance filing permit standard agency board "
    "review notice requirement procedure application fee schedule record "
    "hearing license division article chapter clause amendment repeal "
    "adopted effective operative statute authority cited register"
).split()


@dataclass
class PagePlan:
    url: str
    host: str
    kind: str  # 'nav' | 'doc'
    page_no: int
    status: str = "success"  # 'success' | 'parse_failure' | 'external_redirect'
    hrefs: list[str] = field(default_factory=list)
    n_paras: int = 2


def _det(seed: int, *parts) -> int:
    h = hashlib.sha256(("|".join(map(str, parts)) + f"|{seed}").encode()).digest()
    return int.from_bytes(h[:8], "big")


def host_name(i: int) -> str:
    return f"host{i}.example"


def plan_site(
    n_pages: int = 1000,
    n_hosts: int = 8,
    seed: int = 42,
    hot_share: float = 0.5,
    branching: int = 4,
    nav_fraction: float = 0.2,
    parse_failure_every: int = 50,
    external_every: int = 97,
    doc_paras: tuple[int, int] = (1, 4),
) -> list[PagePlan]:
    """Deterministic site plan. host0 is the hot host (skew)."""
    assert n_hosts >= 1
    counts = [max(3, int(n_pages * hot_share))]
    rest = max(0, n_pages - counts[0])
    for i in range(1, n_hosts):
        share = rest // (n_hosts - 1) if n_hosts > 1 else 0
        counts.append(max(3, share))
    plans: list[PagePlan] = []
    page_no = 0
    for h in range(n_hosts):
        host = host_name(h)
        base = f"https://{host}"
        n_h = counts[h]
        n_nav = max(1, int(n_h * nav_fraction))
        n_doc = n_h - n_nav

        def nav_url(j: int) -> str:
            if j == 0:
                return f"{base}/calregs/Index"
            return f"{base}/calregs/Browse/N{h}x{j}?guid=GB{h}x{j}&b=2&a=1"

        def doc_url(d: int) -> str:
            return f"{base}/calregs/Document/ID{h}x{d}?guid=GD{h}x{d}&b=2&a=1"

        nav_children: dict[int, list[str]] = {j: [] for j in range(n_nav)}
        for j in range(1, n_nav):
            nav_children[(j - 1) // branching].append(nav_url(j))
        for d in range(n_doc):
            nav_children[d % n_nav].append(doc_url(d))

        for j in range(n_nav):
            hrefs = list(nav_children[j])
            # messy variants exercising canonicalization: fragments and
            # relative links (both normalize back to table keys in compat
            # mode) plus an out-of-scope decoy.
            if j % 3 == 1 and hrefs:
                hrefs[0] = hrefs[0] + "#frag"
            if j % 4 == 2 and hrefs:
                # relative form of an absolute sibling link
                hrefs.append(hrefs[-1].replace(base, ""))
            hrefs.append("https://ads.example/outside/banner")
            if h == 0 and j == 0:
                hrefs.extend(f"https://{host_name(o)}/calregs/Index" for o in range(1, n_hosts))
            plans.append(PagePlan(nav_url(j), host, "nav", page_no, "success", hrefs, 0))
            page_no += 1

        for d in range(n_doc):
            status = "success"
            if d > 0 and d % parse_failure_every == 0:
                status = "parse_failure"
            elif d > 0 and d % external_every == 0:
                status = "external_redirect"
            lo, hi = doc_paras
            n_paras = lo + _det(seed, h, d, "np") % max(1, hi - lo + 1)
            plans.append(PagePlan(doc_url(d), host, "doc", page_no, status, [], n_paras))
            page_no += 1
    return plans


# ------------------------------------------------------------- rendering


def _para_text(seed: int, host: str, page_no: int, p: int, para_words: int = 12) -> str:
    # one digest seeds a cheap LCG for the whole paragraph (a sha256 per
    # word made synthesis itself the bottleneck at bench page weights)
    state = _det(seed, host, page_no, p, "nw")
    n_words = (para_words * 2) // 3 + state % max(1, para_words)
    words = []
    for _ in range(n_words):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(VOCAB[(state >> 33) % len(VOCAB)])
    return f"Section {page_no}.{p} " + " ".join(words) + "."


def render_page(plan_row: dict, seed: int, para_words: int = 12) -> tuple[bytes, str]:
    """→ (html bytes, golden text_plain). Pure function of the plan.
    ``para_words`` scales paragraph length (page weight) — bench uses
    Common-Crawl-like page sizes; tests use the light default."""
    host, kind, page_no = plan_row["host"], plan_row["kind"], plan_row["page_no"]
    links = "\n".join(f'<a href="{h}">link</a>' for h in plan_row["hrefs"])
    if kind == "nav":
        html = (
            f"<html><head><title>Browse {page_no}</title></head><body>"
            f'<div class="co_browseTable">\n{links}\n</div></body></html>'
        )
        return html.encode("utf-8"), ""
    status = plan_row["status"]
    title_no = f"§ {page_no}.1. Topic {page_no}."
    head = (
        f'<input type="hidden" name="documentGuid" value="IG{page_no}"/>'
        f'<div id="co_docHeaderTitle"><h1 id="co_docHeaderTitleLine">'
        f'<span id="title">{title_no}</span></h1>'
        f'<ul id="co_docHeaderCitation"><li id="titleDesc">{(page_no % 28) + 1} CA ADC § {page_no}.1</li></ul></div>'
        f'<div id="co_prelimContainer">'
        f'<div class="co_contentBlock co_prelimHead">Title {(page_no % 28) + 1}. Synthetic Regulations'
        f'<div class="co_contentBlock co_prelimHead"> Division {(page_no % 9) + 1}. Generated Matter'
        f'<div class="co_contentBlock co_prelimHead"> Chapter {(page_no % 7) + 1}. Unit Testing</div></div></div></div>'
        f'<div class="co_title">{title_no}</div>'
    )
    if status == "external_redirect":
        body = '<p>See <a href="https://www.dgs.ca.gov/BSC">Building Standards</a>.</p>'
        expected = ""
    elif status == "parse_failure":
        body = "<p>Placeholder page without content blocks.</p>"
        expected = ""
    else:
        paras = [_para_text(seed, host, page_no, p, para_words) for p in range(plan_row["n_paras"])]
        body = '<div class="co_contentBlock co_body">' + "".join(
            f'<div class="co_paragraph"><div class="co_paragraphText">{t}</div></div>' for t in paras
        ) + "</div>"
        expected = "\n\n".join(paras)
    notice = '<div class="co_currencyNotice">Current through Register 2026, No. 1.</div>'
    html = f"<html><head><title>{title_no}</title></head><body>{head}{body}{notice}</body></html>"
    return html.encode("utf-8"), expected


PLAN_SCHEMA = (
    "url string, host string, kind string, page_no long, status string, "
    "hrefs array<string>, n_paras int"
)
PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "host string, kind string"
)


def synth_pages(
    spark: SparkSession,
    n_pages: int = 1000,
    n_hosts: int = 8,
    seed: int = 42,
    partitions: int | None = None,
    para_words: int = 12,
    **plan_kwargs,
) -> DataFrame:
    """The ``pages`` table (+ helper cols host/kind, droppable)."""
    plans = plan_site(n_pages, n_hosts, seed, **plan_kwargs)
    rows = [
        (p.url, p.host, p.kind, p.page_no, p.status, p.hrefs, p.n_paras) for p in plans
    ]
    plan_df = spark.createDataFrame(rows, PLAN_SCHEMA)
    if partitions:
        plan_df = plan_df.repartition(partitions, "url")

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                html, expected = render_page(row, seed, para_words)
                out.append(
                    {
                        "url": row["url"],
                        "html": html,
                        "text": expected,
                        "lang": "es" if row["page_no"] % 37 == 0 else "en",
                        "host": row["host"],
                        "kind": row["kind"],
                        "page_no": row["page_no"],
                    }
                )
            yield pd.DataFrame(out)

    rendered = plan_df.mapInPandas(
        _render,
        schema="url string, html binary, text string, lang string, host string, kind string, page_no long",
    )
    return rendered.withColumn(
        "warc_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=F.col("page_no")),
    ).select("url", "warc_ts", "html", "text", "lang", "host", "kind")


def synth_robots(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    """robots dim (FIXTURES.md §3): hot host slower, one disallow rule."""
    rows = [
        (
            host_name(i),
            ["/calregs/Browse/Nprivate"] if i == 1 else [],
            1.5 if i == 0 else 1.0,
        )
        for i in range(n_hosts)
    ]
    return spark.createDataFrame(
        rows, "host string, disallow_prefixes array<string>, crawl_delay double"
    )


def synth_seeds(spark: SparkSession, hosts: list[int] | None = None) -> DataFrame:
    hosts = hosts if hosts is not None else [0]
    rows = [(f"https://{host_name(i)}/calregs/Index", 0) for i in hosts]
    return spark.createDataFrame(rows, "url string, priority int")
