"""Golden extraction tests over the REAL saved reference pages
(``reference/samples/*.htm`` — actual Westlaw HTML with browser
attribute orderings, entities and nested markup, not synth-modeled
fixtures). Closes VERDICT r4 ask #2: the byte-identical invariant for
``extract_sections`` (reference ``crawler/extraction.py:48-185``) is
pinned against the on-disk sample pages via checked-in goldens
(``tests/goldens/real_samples.json``), timestamps excluded (the record
has none).

Reference-behavior notes verified against ``crawler/extraction.py``:

* guid — the saved pages carry no ``input[name=documentGuid]``, so both
  extractors fall back to the ``Document/<guid>?`` URL segment
  (``extraction.py:53-61``);
* currency_notice — the real pages mark currency with
  ``co_includeCurrencyBlock``; the reference selects only
  ``.co_currencyNotice`` (``extraction.py:136-138``) and therefore
  returns None on these pages, as do we;
* the Title 24 page is the external-redirect case
  (``extraction.py:156-166``).

If ``/root/reference/samples`` is not present (standalone checkout),
the suite skips — the goldens still document the expected outputs.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from ccr_web_crawler_spark.functions.htmlx.sections import extract_record

SAMPLES_DIR = "/root/reference/samples"
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "real_samples.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES_DIR), reason="reference samples not available"
)


def _url_for(name: str) -> str:
    slug = "".join(ch if ch.isalnum() else "-" for ch in name)[:40].strip("-").upper()
    return f"https://govt.westlaw.com/calregs/Document/{slug}?viewType=FullText"


def _golden() -> dict:
    with open(GOLDEN_PATH, encoding="utf-8") as f:
        return json.load(f)


def _sample_files() -> list[str]:
    return sorted(glob.glob(os.path.join(SAMPLES_DIR, "*.htm")))


def test_all_sample_pages_covered_by_goldens():
    golden = _golden()
    names = {os.path.basename(p) for p in _sample_files()}
    assert names == set(golden), "goldens out of sync with reference/samples"
    assert len(names) == 5


@pytest.mark.parametrize("path", _sample_files(), ids=lambda p: os.path.basename(p)[:30])
def test_real_page_record_matches_golden(path):
    """Every field of the record — all 14, byte-identical."""
    golden = _golden()[os.path.basename(path)]
    with open(path, encoding="utf-8", errors="replace") as f:
        html = f.read()
    rec = extract_record(html, _url_for(os.path.basename(path)))
    assert set(rec) == set(golden)
    for field in sorted(golden):
        assert rec[field] == golden[field], f"field {field} diverged from golden"


def test_patents_structural_counts():
    """SURVEY §5's structural facts about the Patents sample: 4
    co_paragraphText paragraphs (all present in text_html, nested
    markup preserved), 3-level prelim hierarchy, success status."""
    rec = _golden()["§ 100405. Patents..htm"]
    assert rec["extraction_status"] == "success"
    assert rec["text_html"].count('<div class="co_paragraphText">') == 4
    assert '<span class="co_smallCaps">Note:</span>' in rec["text_html"]
    assert rec["section_number"] == "§ 100405"
    assert rec["section_title"] == "Patents."
    assert rec["citation_short"] == "17 CA ADC § 100405"
    hier = rec["hierarchy"]
    assert hier["title"] == "Title 17. Public Health"
    assert hier["division"].startswith("Division 4. California Institute")
    assert hier["chapter"].startswith("Chapter 4. Intellectual Property")


def test_title24_external_redirect():
    rec = _golden()[
        "CALIFORNIA CODE OF REGULATIONS TITLE 24 - 2025 CALIFORNIA "
        "ADMINISTRATIVE CODE, TITLE 24, PART 1.htm"
    ]
    assert rec["extraction_status"] == "external_redirect"
    assert rec["external_url"] == "https://codes.iccsafe.org/codes/i-codes"
    assert rec["text_html"] is None and rec["text_plain"] is None


def test_currency_notice_matches_reference_selector_semantics():
    """Real pages use co_includeCurrencyBlock; the reference's
    ``.co_currencyNotice`` selector misses it → None on every sample.
    Pinned so a future 'fix' that diverges from reference behavior is
    caught."""
    for rec in _golden().values():
        assert rec["currency_notice"] is None
