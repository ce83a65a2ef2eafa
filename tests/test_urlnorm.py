"""URL canonicalization tests (reference ``crawler/discovery.py:79-89``)."""

from hypothesis import given
from hypothesis import strategies as st

from ccr_web_crawler_spark.functions.urlnorm import canonicalize_url, url_host


class TestCompatMode:
    """compat == the reference ``normalize_url`` byte-for-byte."""

    def test_drops_fragment(self):
        assert (
            canonicalize_url("https://govt.westlaw.com/calregs/Index#top")
            == "https://govt.westlaw.com/calregs/Index"
        )

    def test_keeps_query_verbatim(self):
        u = "https://govt.westlaw.com/calregs/Document/IABC?b=2&a=1"
        assert canonicalize_url(u) == u

    def test_keeps_host_case_and_default_port(self):
        # stdlib urlparse (used by the reference too) lowercases the
        # scheme but preserves host case and ports.
        u = "HTTPS://Govt.Westlaw.Com:443/calregs/Index"
        assert canonicalize_url(u) == "https://Govt.Westlaw.Com:443/calregs/Index"

    def test_no_query_no_trailing_question(self):
        assert (
            canonicalize_url("https://x.example/path?")
            == "https://x.example/path"
        )

    def test_reference_worked_example(self):
        # Mirrors the transformation the reference applies to real URLs:
        # scheme://netloc/path + ?query, fragment dropped.
        u = "https://govt.westlaw.com/calregs/Browse/Home?guid=G1&t=2#I123"
        assert (
            canonicalize_url(u)
            == "https://govt.westlaw.com/calregs/Browse/Home?guid=G1&t=2"
        )


class TestFullMode:
    def test_lowercases_scheme_host(self):
        assert (
            canonicalize_url("HTTPS://Host3.Example/Path?x=1", "full")
            == "https://host3.example/Path?x=1"
        )

    def test_strips_default_ports(self):
        assert canonicalize_url("https://h.example:443/a", "full") == "https://h.example/a"
        assert canonicalize_url("http://h.example:80/a", "full") == "http://h.example/a"
        assert (
            canonicalize_url("http://h.example:8080/a", "full")
            == "http://h.example:8080/a"
        )

    def test_sorts_query_params(self):
        assert (
            canonicalize_url("https://h.example/p?b=2&a=1&a=0", "full")
            == "https://h.example/p?a=0&a=1&b=2"
        )


URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEF0123456789/-_.", min_size=0, max_size=20
)


@given(
    host=st.sampled_from(["a.example", "B.Example:443", "c.example:8080"]),
    path=URL_CHARS,
    query=st.sampled_from(["", "a=1", "b=2&a=1", "z=9&y=8&z=1"]),
    frag=st.sampled_from(["", "#f", "#frag/2"]),
    mode=st.sampled_from(["compat", "full"]),
)
def test_idempotent_and_fragmentless(host, path, query, frag, mode):
    url = f"https://{host}/{path}" + (f"?{query}" if query else "") + frag
    once = canonicalize_url(url, mode)
    assert canonicalize_url(once, mode) == once  # idempotence
    assert "#" not in once.replace(path, "")  # fragment gone


def test_url_host():
    assert url_host("https://Govt.Westlaw.Com:443/x") == "govt.westlaw.com"
    assert url_host("http://h5.example/a/b?c=1") == "h5.example"
