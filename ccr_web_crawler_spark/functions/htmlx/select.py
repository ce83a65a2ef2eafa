"""Tiny CSS selector engine — exactly the selector grammar the reference
extractor uses (``crawler/extraction.py:54,64,77,84,93,95,97,112,114,127,
129,137,141,147`` and ``crawler/discovery.py:109``):

* type selectors              ``a``, ``input``
* id selectors                ``#co_prelimContainer``
* class selectors             ``.co_title``
* compound selectors          ``.co_contentBlock.co_body``
* attribute selectors         ``[name="documentGuid"]``, ``[href*="x"]``
* descendant combinator       ``#co_docHeaderTitleLine #title``
* selector lists (commas)     ``a[href*="a.com"], a[href*="b.org"]``

Matching returns elements in document order; compound matching is
right-to-left with ancestor checks (standard CSS semantics, same results
as soupsieve for this grammar).
"""

from __future__ import annotations

import re

from ccr_web_crawler_spark.functions.htmlx.dom import Node

_SIMPLE_TOKEN = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*)
    | \#(?P<id>[\w-]+)
    | \.(?P<cls>[\w-]+)
    | \[(?P<attr>[\w-]+)(?:(?P<op>[*^$]?=)(?P<q>["']?)(?P<val>[^"'\]]*)(?P=q))?\]
    """,
    re.VERBOSE,
)


class SimpleSelector:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self) -> None:
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str, str | None]] = []  # (name, op, value)

    def matches(self, node: Node) -> bool:
        if self.tag is not None and node.tag != self.tag:
            return False
        if self.id is not None and node.id != self.id:
            return False
        if self.classes:
            node_classes = node.classes
            if any(c not in node_classes for c in self.classes):
                return False
        for name, op, val in self.attrs:
            actual = node.get(name)
            if actual is None:
                return False
            if op == "" or val is None:
                continue  # presence check, e.g. a[href]
            if op == "=" and actual != val:
                return False
            if op == "*=" and val not in actual:
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
        return True


def _parse_compound(token: str) -> SimpleSelector:
    sel = SimpleSelector()
    pos = 0
    while pos < len(token):
        m = _SIMPLE_TOKEN.match(token, pos)
        if not m:
            raise ValueError(f"unsupported selector syntax: {token!r} at {pos}")
        if m.group("tag"):
            sel.tag = m.group("tag").lower()
        elif m.group("id"):
            sel.id = m.group("id")
        elif m.group("cls"):
            sel.classes.append(m.group("cls"))
        elif m.group("attr"):
            sel.attrs.append((m.group("attr"), m.group("op") or "", m.group("val")))
        pos = m.end()
    return sel


def _parse_selector(selector: str) -> list[list[SimpleSelector]]:
    """→ list of alternatives; each alternative is a descendant chain."""
    alternatives = []
    for alt in selector.split(","):
        chain = [_parse_compound(tok) for tok in alt.split()]
        if not chain:
            raise ValueError(f"empty selector in {selector!r}")
        alternatives.append(chain)
    return alternatives


def _chain_matches(chain: list[SimpleSelector], node: Node) -> bool:
    if not chain[-1].matches(node):
        return False
    remaining = chain[:-1]
    current = node
    for sel in reversed(remaining):
        for anc in current.ancestors():
            if sel.matches(anc):
                current = anc
                break
        else:
            return False
    return True


def select(root: Node, selector: str) -> list[Node]:
    """All matching descendant elements of *root*, document order."""
    alternatives = _parse_selector(selector)
    out = []
    for node in root.iter_elements():
        if any(_chain_matches(chain, node) for chain in alternatives):
            out.append(node)
    return out


def select_one(root: Node, selector: str) -> Node | None:
    alternatives = _parse_selector(selector)
    for node in root.iter_elements():
        if any(_chain_matches(chain, node) for chain in alternatives):
            return node
    return None
