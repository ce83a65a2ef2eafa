"""Golden extraction tests — byte-identical field targets for the
section extractor (reference ``crawler/extraction.py:48-185``), covering
all three statuses and every fallback chain (FIXTURES.md §4)."""

from ccr_web_crawler_spark.functions.htmlx.sections import extract_record, failure_record

SUCCESS_URL = "https://govt.westlaw.com/calregs/Document/I193D21605A2111EC8227000D3A7C4BC3?viewType=FullText"

SUCCESS_HTML = """<!DOCTYPE html>
<html><head><title>&#167; 1031.12. Priority of Legal Requirements.</title></head>
<body>
<input type="hidden" name="documentGuid" value="I193D21605A2111EC8227000D3A7C4BC3"/>
<div class="co_genericWhiteBox">
<div id="co_docHeaderTitle"><h1 id="co_docHeaderTitleLine" title="§ 1031.12. Priority of Legal Requirements." lang="EN"><span id="title">§ 1031.12. Priority of Legal Requirements.</span></h1><ul id="co_docHeaderCitation"><li id="titleDesc">15 CA ADC § 1031.12</li><li id="codeSetName">Barclays Official California Code of Regulations</li></ul></div>
<div class="co_contentBlock co_prelimBlock co_headtext">Barclays California Code of Regulations <div id="co_prelimContainer"><div class="co_contentBlock co_prelimHead co_headtext">Title 15. Crime Prevention and Corrections<div class="co_contentBlock co_prelimHead co_headtext"> Division 1. Adult Institutions (Refs &amp; Annos)<div class="co_contentBlock co_prelimHead co_headtext"> Chapter 1. Rules and Regulations<div class="co_contentBlock co_prelimHead co_headtext"> Subchapter 4. General Institution Regulations<div class="co_contentBlock co_prelimHead co_headtext"> Article 1. Rules and Regulations of Adult Institutions</div></div></div></div></div></div></div>
<div class="co_contentBlock co_section"><div class="co_contentBlock co_body"><div class="co_paragraph"><div class="co_paragraphText">In case of  conflict, statutes &amp; regulations shall prevail.</div></div><div class="co_paragraph"><div class="co_paragraphText">Second   paragraph with <em>emphasis</em> and a§ mark.</div></div></div></div>
<div class="co_title">§ 1031.12. Priority of Legal Requirements.</div>
<div class="co_currencyNotice">This database is current through 1/1/26 Register 2026, No. 1.</div>
</div>
</body></html>"""


class TestSuccessRecord:
    def setup_method(self):
        self.rec = extract_record(SUCCESS_HTML, SUCCESS_URL)

    def test_status(self):
        assert self.rec["extraction_status"] == "success"
        assert self.rec["extraction_note"] is None
        assert self.rec["external_url"] is None

    def test_guid_from_input(self):
        assert self.rec["guid"] == "I193D21605A2111EC8227000D3A7C4BC3"

    def test_section_number_split_at_first_dot(self):
        # ref :67-68 — split('.')[0] of the .co_title text
        assert self.rec["section_number"] == "§ 1031"

    def test_section_title_after_first_dot(self):
        # ref :80-82 — split('.', 1)[1].strip() of '#title' text
        assert self.rec["section_title"] == "12. Priority of Legal Requirements."

    def test_citation(self):
        assert self.rec["citation_short"] == "15 CA ADC § 1031.12"
        assert self.rec["citation_canonical"] == "15 CA ADC § 1031.12"

    def test_hierarchy_all_levels_and_paren_cut(self):
        assert self.rec["hierarchy"] == {
            "title": "Title 15. Crime Prevention and Corrections",
            "division": "Division 1. Adult Institutions",  # '(' cut, ref :118
            "chapter": "Chapter 1. Rules and Regulations",
            "subchapter": "Subchapter 4. General Institution Regulations",
            "article": "Article 1. Rules and Regulations of Adult Institutions",
        }

    def test_text_html_byte_identical(self):
        assert self.rec["text_html"] == (
            '<div class="co_paragraphText">In case of  conflict, statutes '
            "&amp; regulations shall prevail.</div>\n"
            '<div class="co_paragraphText">Second   paragraph with '
            "<em>emphasis</em> and a§ mark.</div>"
        )

    def test_text_plain_byte_identical(self):
        assert self.rec["text_plain"] == (
            "In case of  conflict, statutes & regulations shall prevail."
            "\n\n"
            "Second   paragraph with emphasis and a§ mark."
        )

    def test_currency_notice(self):
        assert (
            self.rec["currency_notice"]
            == "This database is current through 1/1/26 Register 2026, No. 1."
        )


FALLBACK_URL = "https://govt.westlaw.com/calregs/Document/IABC123?x=1"

FALLBACK_HTML = """<html><body>
<div id="co_prelimContainer"><div class="co_prelimHead">Title 17. Public Health<div class="co_prelimHead"> Division 4. California Institute for Regenerative Medicine</div></div></div>
<div class="co_title">§ 100405. Patents.</div>
<div class="co_contentBlock co_body"><div class="co_paragraph"><div class="note">A Grantee shall bear costs.</div></div></div>
</body></html>"""


class TestFallbackPaths:
    def setup_method(self):
        self.rec = extract_record(FALLBACK_HTML, FALLBACK_URL)

    def test_guid_from_url(self):
        # ref :57-61 — substring after Document/, cut at '?'
        assert self.rec["guid"] == "IABC123"

    def test_title_via_co_title(self):
        assert self.rec["section_title"] == "Patents."
        assert self.rec["section_number"] == "§ 100405"

    def test_citation_synthesized(self):
        # ref :99-104 — "{title_num} CCR {section_number}"
        assert self.rec["citation_short"] == "17 CCR § 100405"

    def test_text_via_body_fallback(self):
        # ref :128-131 — single .co_contentBlock.co_body element
        assert self.rec["text_html"] == (
            '<div class="co_contentBlock co_body"><div class="co_paragraph">'
            '<div class="note">A Grantee shall bear costs.</div></div></div>'
        )
        assert self.rec["text_plain"] == "A Grantee shall bear costs."
        assert self.rec["extraction_status"] == "success"

    def test_partial_hierarchy(self):
        assert self.rec["hierarchy"]["title"] == "Title 17. Public Health"
        assert (
            self.rec["hierarchy"]["division"]
            == "Division 4. California Institute for Regenerative Medicine"
        )
        assert self.rec["hierarchy"]["chapter"] is None


PARSE_FAIL_HTML = """<html><body>
<div class="co_title">§ 99. Empty.</div>
<div id="co_prelimContainer"><div class="co_prelimHead">Title 9. Nothing</div></div>
</body></html>"""


def test_parse_failure_record():
    rec = extract_record(PARSE_FAIL_HTML, "https://h.example/calregs/Document/I9")
    assert rec["extraction_status"] == "parse_failure"
    assert rec["extraction_note"] == "Could not extract document text content"
    assert rec["text_html"] is None and rec["text_plain"] is None
    assert rec["citation_short"] is None  # nulled on failure branch, ref :164
    assert rec["section_number"] == "§ 99"  # base fields still extracted
    assert rec["guid"] == "I9"


EXTERNAL_LINK_HTML = """<html><body>
<div class="co_title">§ 24. Building Standards.</div>
<p>See <a href="https://www.dgs.ca.gov/BSC/Title24">the BSC site</a>.</p>
<div class="co_paragraphText">Body text present but ignored.</div>
</body></html>"""

EXTERNAL_KEYWORD_HTML = """<html><body>
<div class="co_title">§ 25. Codes.</div>
<p>This content Redirects To an external publisher.</p>
<div class="co_paragraphText">Body.</div>
</body></html>"""


class TestExternalRedirect:
    def test_link_variant(self):
        rec = extract_record(EXTERNAL_LINK_HTML, "https://h.example/calregs/Document/I24")
        assert rec["extraction_status"] == "external_redirect"
        assert rec["extraction_note"] == "Title 24 redirects"
        assert rec["external_url"] == "https://www.dgs.ca.gov/BSC/Title24"
        assert rec["text_html"] is None  # redirect branch nulls text, ref :156

    def test_keyword_variant_default_url(self):
        # case-insensitive keyword match, ref :143-144; default external
        # URL literal, ref :149
        rec = extract_record(EXTERNAL_KEYWORD_HTML, "https://h.example/calregs/Document/I25")
        assert rec["extraction_status"] == "external_redirect"
        assert rec["external_url"] == "https://www.dgs.ca.gov/BSC"


TORTURE_HTML = """<html><body>
<div class="co_paragraphText">  Fees &amp; charges: see &#167; 10 <span>  </span><b>bold</b>
</div>
</body></html>"""


def test_entity_whitespace_torture():
    rec = extract_record(TORTURE_HTML, "https://h.example/calregs/Document/IT")
    assert rec["text_plain"] == "Fees & charges: see § 10 bold"
    assert rec["text_html"] == (
        '<div class="co_paragraphText">  Fees &amp; charges: see § 10 '
        "<span>  </span><b>bold</b>\n</div>"
    )


def test_failure_record_shape():
    rec = failure_record("u", "boom")
    assert rec["extraction_status"] == "parse_failure"
    assert rec["extraction_note"] == "Extraction error: boom"
    assert set(rec["hierarchy"]) == {"title", "division", "chapter", "subchapter", "article"}
