"""Link extraction tests (reference ``crawler/discovery.py:92-120``)."""

from hypothesis import given
from hypothesis import strategies as st

from ccr_web_crawler_spark.functions.htmlx.links import extract_links

BASE = "https://govt.westlaw.com/calregs/Browse/Home"

HTML = """
<html><body>
<a href="/calregs/Document/I1?b=2&amp;a=1#frag">doc one</a>
<a href="https://govt.westlaw.com/calregs/Browse/Home?guid=G2">nav</a>
<a href="Detail?guid=G3">relative</a>
<a href="https://other.example/outside">out of scope</a>
<a href="/calregs/Document/I1?b=2&amp;a=1">duplicate of one</a>
<a name="anchor-no-href">skip me</a>
</body></html>
"""


def test_extract_links_scope_absolutize_normalize_dedup():
    links = extract_links(HTML, BASE)
    assert links == [
        "https://govt.westlaw.com/calregs/Document/I1?b=2&a=1",  # frag dropped
        "https://govt.westlaw.com/calregs/Browse/Home?guid=G2",
        "https://govt.westlaw.com/calregs/Browse/Detail?guid=G3",  # urljoin
    ]


def test_first_occurrence_order_is_deterministic():
    html = '<a href="/calregs/B">b</a><a href="/calregs/A">a</a><a href="/calregs/B">b2</a>'
    assert extract_links(html, "https://h.example/") == [
        "https://h.example/calregs/B",
        "https://h.example/calregs/A",
    ]


def test_scope_checked_on_absolute_url():
    # relative href without the scope substring still matches after join
    html = '<a href="Doc1">x</a>'
    assert extract_links(html, "https://h.example/calregs/Browse/") == [
        "https://h.example/calregs/Browse/Doc1"
    ]


def test_empty_and_linkless_html():
    assert extract_links("", BASE) == []
    assert extract_links("<p>no links</p>", BASE) == []


@given(
    paths=st.lists(
        st.text(alphabet="abcXYZ019", min_size=1, max_size=8), min_size=0, max_size=8
    )
)
def test_all_outputs_absolute_in_scope_unique(paths):
    html = "".join(f'<a href="/calregs/Document/{p}">x</a>' for p in paths)
    links = extract_links(html, BASE)
    assert len(links) == len(set(links))
    for link in links:
        assert link.startswith("https://")
        assert "/calregs/" in link
