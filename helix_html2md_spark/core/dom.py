"""Lenient HTML -> element-tree parser (hast equivalent).

Re-implements the parse stage of the reference pipeline
(rehype-parse, /root/reference/package-lock.json:16036) on top of the
stdlib ``html.parser``.  Produces a minimal hast-like node model:

    Element(tag, attrs, children)
    Text(value)

Void elements, implied closes for <p>/<li>/<tr>/<td> etc., and character
references are handled so that fixture-grade HTML (unclosed <br>, entities
like &#x26;) parses into the same tree shape rehype-parse would emit.
"""

from __future__ import annotations

import re
from collections import deque
from html.parser import HTMLParser


class Text:
    __slots__ = ("value",)

    def __init__(self, value: str):
        self.value = value

    def __repr__(self):  # pragma: no cover
        return f"Text({self.value!r})"


class Element:
    # no parent backrefs: keeps the tree acyclic so refcounting frees it
    # without cyclic-GC walks (matters in long-lived python workers)
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list = []

    # -- tree helpers -------------------------------------------------
    def append(self, node):
        self.children.append(node)

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def find_all(self, tag: str):
        # BFS (deque keeps popleft O(1)); order is part of the contract —
        # find() takes the first BFS match
        out = []
        queue = deque((self,))
        popleft = queue.popleft
        append = queue.append
        while queue:
            n = popleft()
            for c in n.children:
                if isinstance(c, Element):
                    if c.tag == tag:
                        out.append(c)
                    append(c)
        return out

    def find(self, tag: str):
        all_ = self.find_all(tag)
        return all_[0] if all_ else None

    def text_content(self) -> str:
        # DFS pre-order = DOCUMENT order: a BFS here moved nested-
        # element text after sibling text ('<code>foo<b>bar</b>baz'
        # read back as 'foobazbar'), scrambling inline-code and
        # metadata harvesting
        parts = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Text):
                parts.append(c.value)
            else:
                stack.extend(reversed(c.children))
        return "".join(parts)

    def __repr__(self):  # pragma: no cover
        return f"Element({self.tag}, {self.attrs}, {len(self.children)} kids)"


VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# tags whose open implicitly closes a set of currently-open tags
_IMPLIED_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"tr", "td", "th"},
    "tbody": {"thead", "tr", "td", "th"},
    "tfoot": {"tbody", "tr", "td", "th"},
    "option": {"option"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}

# inline formatting tags an implied close may scan through
_FORMATTING = {
    "a", "b", "i", "em", "strong", "u", "s", "small", "span", "code",
    "sub", "sup", "font", "mark",
}

# block-ish tags that implicitly close an open <p>
_P_CLOSERS = {
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "main", "nav", "ol", "pre", "section", "table", "ul",
}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack: list[Element] = [self.root]

    # -- helpers ------------------------------------------------------
    def _cur(self) -> Element:
        return self.stack[-1]

    def _close_implied(self, tag: str):
        # close <p> when a block tag opens
        if tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
                if self.stack[i].tag in ("td", "th", "li", "caption"):
                    break
        closes = _IMPLIED_CLOSE.get(tag)
        if closes:
            # scan THROUGH open formatting elements (an unclosed <b>
            # inside a cell must not defeat the implied td/tr/li close —
            # browsers close the cell regardless); anything non-
            # formatting is a scope boundary and blocks the close
            while True:
                i = len(self.stack) - 1
                while i > 0 and self.stack[i].tag in _FORMATTING:
                    i -= 1
                if i > 0 and self.stack[i].tag in closes:
                    del self.stack[i:]
                    continue
                break

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        self._close_implied(tag)
        el = Element(tag, attrs)
        self._cur().append(el)
        if tag not in VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        self._close_implied(tag)
        self._cur().append(Element(tag, attrs))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray close tag: ignore

    def handle_data(self, data):
        if data:
            self._cur().append(Text(data))


def parse_html_stdlib(html: str) -> Element:
    """Reference tree builder on stdlib html.parser (slow path / oracle)."""
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


# ---------------------------------------------------------------------------
# fast regex tokenizer (same tree shape; ~2x the stdlib parser's speed).
# Differentially tested against parse_html_stdlib (tests/test_fast_parser.py)
# and falls back to it on any internal error.
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(
    # comment alternatives: '>' / '->' first — HTML5's abruptly-closed
    # empty comments ('<!-->', '<!--->'); a lazy .*? alone would fail to
    # find '-->' and fall through to $, eating the document to EOF.
    # attrs: after quoted/unquoted items, tolerate ONE trailing
    # unterminated quote run (stdlib html.parser ends the tag at '>'
    # for a typo'd quote instead of dropping the whole tag)
    r"<(?:"
    r"!--(?P<comment>>|->|.*?(?:-->|$))"
    r"|!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|$)"
    r"|(?P<decl>![^>]*)>"
    r"|\?(?P<pi>[^>]*)>"
    r"|(?P<close>/)?(?P<name>[a-zA-Z][^\t\n\r\f />]*)"
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^\"'>])*(?:\"[^\">]*|'[^'>]*)?)>"
    r")",
    re.S,
)
_ATTR_RE = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
# raw-text elements: content is NOT entity-decoded, ends at the literal
# closing tag (matches html.parser CDATA_CONTENT_ELEMENTS).  The close
# scan is case-INsensitive and requires a delimiter after the name:
# '</SCRIPT>' must close (html.parser matches CDATA end tags
# case-insensitively) and '</scripty' must NOT (longer tag names stay
# inside the raw text)
_RAWTEXT = ("script", "style")
_RAWTEXT_END = {
    t: re.compile(rf"</{t}(?=[\t\n\r\f />])", re.I) for t in _RAWTEXT
}


def _fast_parse(html: str) -> Element:
    import html as H

    unescape = H.unescape
    builder = _TreeBuilder()
    root = builder.root
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data = html[pos:]
            if data:
                builder.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            builder.handle_data(unescape(data) if "&" in data else data)
        m = _TAG_RE.match(html, lt)
        if not m:
            # stray '<' treated as text (lenient)
            builder.handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        name = m.group("name")
        if not name:
            continue  # comment/decl/pi dropped
        name = name.lower()
        if m.group("close"):
            builder.handle_endtag(name)
            continue
        raw_attrs = m.group("attrs") or ""
        attrs = []
        last_end = 0
        if raw_attrs:
            for am in _ATTR_RE.finditer(raw_attrs):
                key = am.group(1).lower()
                val = am.group(3)
                if val is None:
                    val = am.group(4)
                if val is None:
                    val = am.group(5)
                if val is not None and "&" in val:
                    val = unescape(val)
                attrs.append((key, val))
                last_end = am.end()
        # self-closing ONLY when a '/' sits immediately before '>' AND is
        # not part of an unquoted attribute value (html.parser: the value
        # pattern consumes '/', the name pattern does not; '/ >' is NOT
        # self-closing) — so check what's left AFTER attribute parsing,
        # e.g. <a href=http://x/> is a plain start tag with the '/'
        # inside the value
        self_closing = raw_attrs.endswith("/") and last_end < len(raw_attrs)
        if self_closing:
            builder.handle_startendtag(name, attrs)
            continue
        builder.handle_starttag(name, attrs)
        if name in _RAWTEXT:
            em = _RAWTEXT_END[name].search(html, pos)
            if em is None:
                builder.handle_data(html[pos:])
                pos = n
            else:
                end = em.start()
                builder.handle_data(html[pos:end])
                gt = html.find(">", end)
                builder.handle_endtag(name)
                pos = (gt + 1) if gt >= 0 else n
    return root


def parse_html(html: str) -> Element:
    """Parse an HTML string into an element tree; returns the root."""
    try:
        return _fast_parse(html)
    except Exception:  # pragma: no cover - safety net
        return parse_html_stdlib(html)
