"""Minimal DOM on stdlib ``html.parser`` with bs4-compatible output.

The reference relies on three BeautifulSoup behaviors
(``crawler/extraction.py:117,132-133,143``):

1. ``elem.get_text(separator, strip)`` — descendant text nodes in
   document order; with ``strip=True`` each node is stripped and
   whitespace-only nodes are dropped; nodes are joined by ``separator``.
2. ``str(elem)`` — HTML re-serialization with minimal entity escaping
   (``& < >`` in text; ``& < >`` in attribute values, double-quoted,
   falling back to single quotes when the value contains ``"``);
   multi-valued ``class`` attributes re-join on single spaces; void
   elements serialize as ``<br/>``.
3. ``elem.contents[0]`` — the first child node; ``str()`` of a text
   node is its decoded text.

Character references are decoded at parse time
(``convert_charrefs=True`` matches bs4+lxml) and re-encoded minimally
at serialization.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# html.parser treats these as CDATA; their raw text is kept as a child
# text node (matching bs4's tree shape).
_MULTI_VALUED = frozenset(("class", "rel", "rev", "accept-charset", "headers"))


class Node:
    """An element node. Text children are plain ``str`` objects."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: list[tuple[str, str | None]]):
        self.tag = tag
        self.attrs = attrs  # source order preserved
        self.children: list[Node | str] = []
        self.parent: Node | None = None

    # -- attribute access -------------------------------------------------
    def get(self, name: str) -> str | None:
        for k, v in self.attrs:
            if k == name:
                return v if v is not None else ""
        return None

    @property
    def classes(self) -> list[str]:
        v = self.get("class")
        return v.split() if v else []

    @property
    def id(self) -> str | None:
        return self.get("id")

    # -- traversal ---------------------------------------------------------
    def iter_elements(self):
        """All descendant elements, document order, self excluded."""
        for child in self.children:
            if isinstance(child, Node):
                yield child
                yield from child.iter_elements()

    def iter_strings(self):
        """All descendant text nodes, document order."""
        for child in self.children:
            if isinstance(child, Node):
                yield from child.iter_strings()
            else:
                yield child

    def ancestors(self):
        node = self.parent
        while node is not None:
            yield node
            node = node.parent

    # -- bs4-compatible API -------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            parts = [s.strip() for s in self.iter_strings()]
            parts = [p for p in parts if p]
        else:
            parts = list(self.iter_strings())
        return separator.join(parts)

    def __str__(self) -> str:
        return serialize(self)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Node {self.tag} {dict(self.attrs)!r} children={len(self.children)}>"


# ---------------------------------------------------------------- escaping


def escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _attr_value(v: str) -> str:
    v = v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if '"' in v:
        return f"'{v}'"
    return f'"{v}"'


def serialize(node: Node | str) -> str:
    """bs4 ``str(elem)``-compatible HTML serialization."""
    if not isinstance(node, Node):
        return escape_text(node)
    parts = ["<", node.tag]
    for k, v in node.attrs:
        if v is None:
            parts.append(f" {k}")
            continue
        if k in _MULTI_VALUED:
            v = " ".join(v.split())
        parts.append(f" {k}={_attr_value(v)}")
    if node.tag in VOID_ELEMENTS:
        parts.append("/>")
        return "".join(parts)
    parts.append(">")
    for child in node.children:
        parts.append(serialize(child))
    parts.append(f"</{node.tag}>")
    return "".join(parts)


# ------------------------------------------------------------------ parser


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", [])
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, list(attrs))
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, list(attrs))
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # Tolerant close: pop up to the nearest matching open tag.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Stray end tag: ignored (html.parser / bs4 behavior).

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / doctype / processing instructions are dropped, matching
    # what the reference extractor ever observes through get_text/select.


def parse_html(html: str) -> Node:
    """Parse an HTML document, returning the document root node."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
