"""DOM + selector engine tests — pins the bs4-compatible subset
(reference behaviors: ``crawler/extraction.py:126-144``)."""

from ccr_web_crawler_spark.functions.htmlx.dom import parse_html, serialize
from ccr_web_crawler_spark.functions.htmlx.select import select, select_one


def test_basic_tree_and_get_text():
    root = parse_html("<div><p>Hello <b>world</b>!</p></div>")
    p = select_one(root, "p")
    assert p.get_text() == "Hello world!"
    assert p.get_text(separator=" ", strip=True) == "Hello world !"


def test_get_text_strip_drops_whitespace_nodes():
    root = parse_html("<div>  a  <span>   </span> b </div>")
    div = select_one(root, "div")
    # bs4 get_text(separator=' ', strip=True): per-node strip, drop empties
    assert div.get_text(separator=" ", strip=True) == "a b"


def test_entities_decoded_on_parse_reencoded_minimal():
    root = parse_html('<div class="t">Fees &amp; tax &#167; 10 &lt;x&gt;</div>')
    div = select_one(root, ".t")
    assert div.get_text() == "Fees & tax § 10 <x>"
    assert serialize(div) == '<div class="t">Fees &amp; tax § 10 &lt;x&gt;</div>'


def test_serialize_roundtrip_nested_and_void():
    html = '<div id="a" class="x y"><em>hi</em><br/><input name="g" value="v"/></div>'
    root = parse_html(html)
    assert serialize(select_one(root, "#a")) == html


def test_serialize_attr_with_quote_uses_single_quotes():
    root = parse_html("<div title='say \"hi\"'>x</div>")
    assert serialize(select_one(root, "div")) == "<div title='say \"hi\"'>x</div>"


def test_class_attr_whitespace_collapsed():
    root = parse_html('<div class="a   b">x</div>')
    assert serialize(select_one(root, "div")) == '<div class="a b">x</div>'


def test_unclosed_tags_tolerated():
    root = parse_html("<div><p>one<p>two</div>after")
    # html.parser keeps nesting as-written; both paragraphs findable
    assert [p.get_text() for p in select(root, "p")] == ["onetwo", "two"]


class TestSelectors:
    HTML = """
    <body>
      <div id="co_docHeaderTitleLine"><span id="title">T</span></div>
      <div class="co_contentBlock co_body"><div class="co_paragraphText">p1</div></div>
      <div class="co_contentBlock">not-body</div>
      <div class="co_paragraphText">p2</div>
      <input type="hidden" name="documentGuid" value="IGUID"/>
      <a href="https://www.dgs.ca.gov/BSC">ext</a>
      <a href="/calregs/Document/I1">doc</a>
    </body>
    """

    def test_id_descendant(self):
        root = parse_html(self.HTML)
        assert select_one(root, "#co_docHeaderTitleLine #title").get_text() == "T"

    def test_compound_class(self):
        root = parse_html(self.HTML)
        hits = select(root, ".co_contentBlock.co_body")
        assert len(hits) == 1
        assert hits[0].get("class") == "co_contentBlock co_body"

    def test_class_document_order(self):
        root = parse_html(self.HTML)
        assert [e.get_text() for e in select(root, ".co_paragraphText")] == ["p1", "p2"]

    def test_attr_equals(self):
        root = parse_html(self.HTML)
        assert select_one(root, 'input[name="documentGuid"]').get("value") == "IGUID"

    def test_attr_contains_and_lists(self):
        root = parse_html(self.HTML)
        sel = 'a[href*="dgs.ca.gov"], a[href*="iccsafe.org"], a[href*="nfpa.org"]'
        hits = select(root, sel)
        assert len(hits) == 1
        assert hits[0].get("href") == "https://www.dgs.ca.gov/BSC"

    def test_attr_presence(self):
        root = parse_html(self.HTML)
        assert len(select(root, "a[href]")) == 2

    def test_no_match_returns_none(self):
        root = parse_html(self.HTML)
        assert select_one(root, ".co_currencyNotice") is None
