"""Section extraction — the reference ``SectionExtractor``
(``crawler/extraction.py:48-185``) re-expressed as a pure function on
htmlx. Field-for-field semantics, including every fallback chain and
the three-way status logic; the extracted ``text_plain``/``text_html``
must be byte-identical to what bs4 would produce on the same markup
(pinned by golden tests).

Record schema (14 fields; ``extracted_at`` is stamped Spark-side with
``current_timestamp()`` since the reference's per-record wall-clock
stamp — ``crawler/extraction.py:158,167,175`` — is nondeterministic and
excluded from invariants).
"""

from __future__ import annotations

from ccr_web_crawler_spark.functions.htmlx.dom import Node, parse_html, serialize
from ccr_web_crawler_spark.functions.htmlx.select import select, select_one

EXTERNAL_HOST_SELECTOR = (
    'a[href*="dgs.ca.gov"], a[href*="iccsafe.org"], a[href*="nfpa.org"]'
)
REDIRECT_KEYWORDS = ("redirects to", "external site", "building standards commission")
DEFAULT_EXTERNAL_URL = "https://www.dgs.ca.gov/BSC"

HIERARCHY_KEYS = ("title", "division", "chapter", "subchapter", "article")


def _extract_guid(root: Node, url: str) -> str | None:
    """Reference ``extract_guid`` (``crawler/extraction.py:53-61``)."""
    guid_input = select_one(root, 'input[name="documentGuid"]')
    if guid_input is not None and guid_input.get("value"):
        return guid_input.get("value")
    if "Document/" in url:
        parts = url.split("Document/")
        if len(parts) > 1:
            return parts[1].split("?")[0]
    return None


def _extract_section_number(root: Node) -> str | None:
    """Reference ``extract_section_number`` (``crawler/extraction.py:63-74``)."""
    title_elem = select_one(root, ".co_title")
    if title_elem is None:
        return None
    title_text = title_elem.get_text(strip=True)
    if "§" in title_text and "." in title_text:
        return title_text.split(".")[0].strip()
    if "§" in title_text:
        words = title_text.split()
        for i, word in enumerate(words):
            if "§" in word and i + 1 < len(words):
                return f"{word} {words[i + 1]}"
    return None


def _title_after_section(title_text: str) -> str:
    if "§" in title_text and "." in title_text:
        parts = title_text.split(".", 1)
        if len(parts) > 1:
            return parts[1].strip()
    return title_text


def _extract_section_title(root: Node) -> str | None:
    """Reference ``extract_section_title`` (``crawler/extraction.py:76-90``)."""
    title_elem = select_one(root, "#co_docHeaderTitleLine #title")
    if title_elem is not None:
        return _title_after_section(title_elem.get_text(strip=True))
    title_elem = select_one(root, ".co_title")
    if title_elem is None:
        return None
    return _title_after_section(title_elem.get_text(strip=True))


def _extract_hierarchy(root: Node) -> dict[str, str | None]:
    """Reference ``extract_hierarchy`` (``crawler/extraction.py:110-124``).

    ``header.contents[0]`` is the *first child node*: its ``str()`` is
    the decoded text for a text node, or the serialized HTML for an
    element node — replicated exactly.
    """
    hierarchy: dict[str, str | None] = {k: None for k in HIERARCHY_KEYS}
    prelim = select_one(root, "#co_prelimContainer")
    if prelim is None:
        return hierarchy
    for header in select(prelim, ".co_prelimHead"):
        if not header.children:
            continue
        first = header.children[0]
        text = (serialize(first) if isinstance(first, Node) else str(first)).strip()
        if "(" in text:
            text = text.split("(")[0].strip()
        if text.startswith("Title"):
            hierarchy["title"] = text
        elif "Division" in text:
            hierarchy["division"] = text
        elif "Chapter" in text:
            hierarchy["chapter"] = text
        elif "Subchapter" in text:
            hierarchy["subchapter"] = text
        elif "Article" in text:
            hierarchy["article"] = text
    return hierarchy


def _extract_citation_short(root: Node) -> str | None:
    """Reference ``extract_citation_short`` (``crawler/extraction.py:92-105``)."""
    cite = select_one(root, "#co_docHeaderCitation #titleDesc")
    if cite is not None:
        return cite.get_text(strip=True)
    cite = select_one(root, ".co_cmdExpandedcite")
    if cite is not None:
        return cite.get_text(strip=True).split(",")[0]
    cite = select_one(root, ".co_citeString")
    if cite is not None:
        return cite.get_text(strip=True)
    section_num = _extract_section_number(root)
    if section_num:
        hierarchy = _extract_hierarchy(root)
        if hierarchy.get("title"):
            title_num = hierarchy["title"].split(".")[0].replace("Title", "").strip()
            return f"{title_num} CCR {section_num}"
    return None


def _extract_text(root: Node) -> tuple[str | None, str | None]:
    """Reference ``extract_text`` (``crawler/extraction.py:126-134``) —
    THE byte-identical invariant. bs4 semantics: ``str(elem)`` join by
    ``"\\n"``; ``get_text(separator=' ', strip=True)`` join by ``"\\n\\n"``.
    """
    text_elems = select(root, ".co_paragraphText")
    if not text_elems:
        body = select_one(root, ".co_contentBlock.co_body")
        if body is not None:
            text_elems = [body]
        else:
            return None, None
    text_html = "\n".join(serialize(e) for e in text_elems)
    text_plain = "\n\n".join(e.get_text(separator=" ", strip=True) for e in text_elems)
    return text_html, text_plain


def _extract_currency_notice(root: Node) -> str | None:
    notice = select_one(root, ".co_currencyNotice")
    return notice.get_text(strip=True) if notice is not None else None


def _is_external_redirect(root: Node) -> bool:
    """Reference ``is_external_redirect`` (``crawler/extraction.py:140-144``)."""
    if select(root, EXTERNAL_HOST_SELECTOR):
        return True
    page_text = root.get_text().lower()
    return any(kw in page_text for kw in REDIRECT_KEYWORDS)


def _detect_external_url(root: Node) -> str | None:
    external = select(root, EXTERNAL_HOST_SELECTOR)
    if external:
        return external[0].get("href")
    return DEFAULT_EXTERNAL_URL


def extract_record(html: str, url: str) -> dict:
    """Full 14-field record — reference ``extract_all``
    (``crawler/extraction.py:151-176``): three-way status
    ``external_redirect`` / ``parse_failure`` / ``success``.
    """
    root = parse_html(html)
    base = {
        "url": url,
        "guid": _extract_guid(root, url),
        "section_number": _extract_section_number(root),
        "section_title": _extract_section_title(root),
        "hierarchy": _extract_hierarchy(root),
    }
    if _is_external_redirect(root):
        return {
            **base,
            "citation_short": None,
            "citation_canonical": None,
            "text_html": None,
            "text_plain": None,
            "currency_notice": None,
            "extraction_status": "external_redirect",
            "extraction_note": "Title 24 redirects",
            "external_url": _detect_external_url(root),
        }
    text_html, text_plain = _extract_text(root)
    if not text_plain:
        return {
            **base,
            "citation_short": None,
            "citation_canonical": None,
            "text_html": None,
            "text_plain": None,
            "currency_notice": None,
            "extraction_status": "parse_failure",
            "extraction_note": "Could not extract document text content",
            "external_url": None,
        }
    citation = _extract_citation_short(root)
    return {
        **base,
        "citation_short": citation,
        "citation_canonical": citation,  # alias (``crawler/extraction.py:107-108``)
        "text_html": text_html,
        "text_plain": text_plain,
        "currency_notice": _extract_currency_notice(root),
        "extraction_status": "success",
        "extraction_note": None,
        "external_url": None,
    }


def failure_record(url: str, error_message: str) -> dict:
    """Reference ``create_failure_record`` (``crawler/extraction.py:178-185``)."""
    return {
        "url": url,
        "guid": None,
        "section_number": None,
        "section_title": None,
        "citation_short": None,
        "citation_canonical": None,
        "hierarchy": {k: None for k in HIERARCHY_KEYS},
        "text_html": None,
        "text_plain": None,
        "currency_notice": None,
        "extraction_status": "parse_failure",
        "extraction_note": f"Extraction error: {error_message}",
        "external_url": None,
    }
