"""mdast -> markdown serializer (GFM flavour + gridtables).

Re-implements the serialization stage of the reference pipeline
(remark-stringify 11 + remark-gfm 4 + @adobe/remark-gridtables, see
/root/reference/package-lock.json:16051-16085,578-603) with the escaping
behaviour pinned by the golden fixtures
(/root/reference/test/fixtures/*.md), e.g. ``\\_``, ``\\|`` in cells,
``\\:`` after http/https, ``www\\.`` (meta-tags.md:14-18,
multiple-sections.md:88,98, blocks.md:173).
"""

from __future__ import annotations

import re


class Ctx:
    """Serialization context flags."""

    __slots__ = ("in_cell", "in_label")

    def __init__(self, in_cell=False, in_label=False):
        self.in_cell = in_cell
        self.in_label = in_label

    def clone(self, **kw):
        c = Ctx(self.in_cell, self.in_label)
        for k, v in kw.items():
            setattr(c, k, v)
        return c


_ENTITY_RE = re.compile(r"&(?=[A-Za-z][A-Za-z0-9]*;|#)")

# anything that could possibly need escaping; most text hits none of these
_MAYBE_SPECIAL_RE = re.compile(r"[*_\[\]`\\&<|]|://|www\.")
_BLOCK_START_RE = re.compile(
    r"^(?:[>=]|[#+](?:\s|$)|-(?:[\s\-:|]|$)|\d+[.)](?:\s|$))"
)


def escape_text(value: str, ctx: Ctx, at_break: bool) -> str:
    if not _MAYBE_SPECIAL_RE.search(value) and not (
        at_break and _BLOCK_START_RE.match(value)
    ):
        return value
    return _escape_text_slow(value, ctx, at_break)


def _escape_text_slow(value: str, ctx: Ctx, at_break: bool) -> str:
    """Escape a text-node value for phrasing context.

    ``at_break`` means the value starts at the beginning of a block/line
    (construct characters like '#', '-' must be escaped there).
    """
    out = []
    n = len(value)
    for i, ch in enumerate(value):
        prev = value[i - 1] if i > 0 else ""
        nxt = value[i + 1] if i + 1 < n else ""
        esc = False
        if ch in ("*", "_", "[", "]", "`", "\\"):
            esc = True
        elif ch == "&" and _ENTITY_RE.match(value, i):
            esc = True
        elif ch == "<" and (nxt.isalpha() or (nxt and nxt in "!/?")):
            esc = True
        elif ch == "|" and ctx.in_cell:
            esc = True
        elif (
            ch == ":"
            and not ctx.in_label
            and prev in ("p", "s")
            and nxt == "/"
            and value[i + 1 : i + 3] == "//"
        ):
            # GFM autolink-literal defusal: http\:// https\://
            esc = True
        elif (
            ch == "."
            and not ctx.in_label
            and value[max(0, i - 3) : i].lower() == "www"
            and (i < 4 or not (value[i - 4].isalnum() or value[i - 4] in "-._"))
            and (nxt.isalnum() or nxt == "-")
        ):
            # GFM autolink-literal defusal: www\.
            esc = True
        out.append("\\" + ch if esc else ch)
    s = "".join(out)
    if at_break:
        s = re.sub(r"^([>=])", r"\\\1", s)
        s = re.sub(r"^([#+])(?=\s|$)", r"\\\1", s)
        s = re.sub(r"^(-)(?=[\s\-:|]|$)", r"\\\1", s)
        s = re.sub(r"^(\d+)([.)])(?=\s|$)", r"\1\\\2", s)
    return s


def inline_code(value: str) -> str:
    ticks = 1
    for m in re.finditer(r"`+", value):
        ticks = max(ticks, len(m.group(0)) + 1)
    fence = "`" * ticks
    pad = ""
    if value.startswith("`") or value.endswith("`") or (
        value.startswith(" ") and value.endswith(" ") and value.strip()
    ):
        pad = " "
    return f"{fence}{pad}{value}{pad}{fence}"


def phrasing(nodes, ctx: Ctx, at_break=True) -> str:
    """Serialize a list of phrasing nodes to a markdown string."""
    parts = []
    line_start = at_break  # true at block start AND after a hard break
    for node in nodes:
        t = node["type"]
        ab = line_start
        if t == "text":
            parts.append(escape_text(node["value"], ctx, ab))
        elif t == "strong":
            parts.append("**" + phrasing(node["children"], ctx, False) + "**")
        elif t == "emphasis":
            parts.append("*" + phrasing(node["children"], ctx, False) + "*")
        elif t == "inlineCode":
            parts.append(inline_code(node["value"]))
        elif t == "html":
            parts.append(node["value"])
        elif t == "break":
            parts.append("\\\n")
        elif t == "link":
            url = node.get("url", "")
            title = node.get("title")
            kids = node.get("children", [])
            if (
                title is None
                and len(kids) == 1
                and kids[0]["type"] == "text"
                and kids[0]["value"] == url
                and re.match(r"^[a-z][a-z0-9+.-]*:", url)
                and not re.search(r"[ <>]", url)
            ):
                parts.append(f"<{url}>")
            else:
                label = phrasing(kids, ctx.clone(in_label=True), False)
                parts.append(f"[{label}]({_url(url)}{_title(title)})")
        elif t == "image":
            alt = node.get("alt") or ""
            title = node.get("title")
            parts.append(f"![{_alt(alt, ctx)}]({_url(node.get('url', ''))}{_title(title)})")
        elif t == "imageReference":
            alt = node.get("alt") or ""
            parts.append(f"![{_alt(alt, ctx)}][{node['identifier']}]")
        else:  # pragma: no cover - unknown phrasing
            parts.append(phrasing(node.get("children", []), ctx, ab))
        # construct chars need escaping at the start of every OUTPUT
        # line: the node after a hard break starts one
        line_start = t == "break"
    return "".join(parts)


def _alt(alt: str, ctx: Ctx) -> str:
    return escape_text(alt, ctx.clone(in_label=True), False)


def _url(url: str) -> str:
    if url == "":
        return ""
    if re.search(r"[ ()]", url):
        enc = url.replace("(", "%28").replace(")", "%29").replace(" ", "%20")
        return enc
    return url


def _title(title) -> str:
    if title is None or title == "":
        return ""
    # backslashes first: a title ending in '\' would otherwise escape
    # the closing quote and un-terminate the whole link title
    t = title.replace("\\", "\\\\").replace('"', '\\"')
    return f' "{t}"'


# ---------------------------------------------------------------------------
# block-level serialization: each block -> list[str] lines; blocks joined by
# one blank line
# ---------------------------------------------------------------------------


def render_blocks(nodes, ctx: Ctx, gridtable_renderer) -> list[str]:
    """Render a list of block nodes; returns lines (no trailing blank)."""
    chunks: list[list[str]] = []
    for node in nodes:
        lines = render_block(node, ctx, gridtable_renderer)
        if lines is None:
            continue
        chunks.append(lines)
    out: list[str] = []
    for i, c in enumerate(chunks):
        if i:
            out.append("")
        out.extend(c)
    return out


def render_block(node, ctx: Ctx, gridtable_renderer) -> list[str] | None:
    t = node["type"]
    if t == "paragraph":
        s = phrasing(node["children"], ctx, at_break=True)
        return s.split("\n")
    if t == "heading":
        depth = node.get("depth", 1)
        s = phrasing(node["children"], ctx, at_break=False)
        return [("#" * depth + " " + s).rstrip()]
    if t == "thematicBreak":
        return ["---"]
    if t == "code":
        value = node.get("value", "")
        lang = node.get("lang") or ""
        ticks = 3
        for m in re.finditer(r"`+", value):
            ticks = max(ticks, len(m.group(0)) + 1)
        fence = "`" * ticks
        body = value.split("\n") if value != "" else []
        return [fence + lang] + body + [fence]
    if t == "blockquote":
        inner = render_blocks(node["children"], ctx, gridtable_renderer)
        return [("> " + l).rstrip() if l else ">" for l in inner]
    if t == "list":
        return _render_list(node, ctx, gridtable_renderer)
    if t == "gridTable":
        return gridtable_renderer(node, ctx)
    if t == "definition":
        return [f"[{node['identifier']}]: {_url(node['url'])}"]
    if t == "html":
        return node["value"].split("\n")
    # unknown block: treat children as blocks
    if node.get("children"):
        return render_blocks(node["children"], ctx, gridtable_renderer)
    return None


def _render_list(node, ctx: Ctx, gridtable_renderer) -> list[str]:
    ordered = node.get("ordered", False)
    spread = node.get("spread", False)
    start = node.get("start", 1)
    out: list[str] = []
    items = node.get("children", [])
    for idx, item in enumerate(items):
        if idx and spread:
            out.append("")
        marker = f"{start + idx}." if ordered else "-"
        indent = " " * (len(marker) + 1)
        item_spread = item.get("spread", False)
        inner_chunks: list[list[str]] = []
        for bi, block in enumerate(item.get("children", [])):
            lines = render_block(block, ctx, gridtable_renderer)
            if lines is None:
                continue
            inner_chunks.append(lines)
        inner: list[str] = []
        for bi, c in enumerate(inner_chunks):
            if bi and item_spread:
                inner.append("")
            inner.extend(c)
        if not inner:
            inner = [""]
        first = True
        for l in inner:
            if first:
                out.append((marker + " " + l).rstrip())
                first = False
            else:
                out.append((indent + l).rstrip())
    return out
