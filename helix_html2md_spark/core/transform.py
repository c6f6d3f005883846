"""Element tree -> mdast transform.

Re-implements the hast->mdast stage of the reference pipeline
(hast-util-to-mdast 10.1.2 with the helix custom handlers,
/root/reference/package-lock.json:9448) as pinned by the golden fixtures:

* main-content selection: only <main> serializes (no-main.html -> empty)
* sections: main > div, joined with thematicBreak (multiple-sections.md)
* block detection: class-div whose children are row-divs of cell-divs
  (or empty) -> gridTable with Title-Cased name header
  (blocks.md, no-blocks.md, empty-block.md)
* <table> -> gridTable with gtHeader for <thead> (tables.md)
* metadata harvest from <head> + html@lang (meta-tags*.md, json-ld.md)
"""

from __future__ import annotations

import json
import re

from .dom import Element, Text

# ---------------------------------------------------------------------------
# whitespace handling (rehype-minify-whitespace semantics)
# ---------------------------------------------------------------------------

_WS_RE = re.compile(r"[ \t\r\n\f]+")



def _int_attr(el: Element, name: str, default: int = 1) -> int:
    """HTML-style numeric attribute: non-numeric values (colspan="all",
    start="x" — common in real markup) fall back to the default instead
    of raising out of the error taxonomy."""
    raw = el.get(name)
    try:
        return int(raw) if raw is not None and str(raw).strip() else default
    except (TypeError, ValueError):
        return default

# collapse is a no-op unless the text has a non-space ws char or a
# double space — skip the allocating sub for the typical value
_WS_NEEDED_RE = re.compile(r"[\t\r\n\f]|  ")


def collapse_ws(s: str) -> str:
    if _WS_NEEDED_RE.search(s) is None:
        return s
    return _WS_RE.sub(" ", s)


# ---------------------------------------------------------------------------
# mdast helpers
# ---------------------------------------------------------------------------


def t(value):
    return {"type": "text", "value": value}


class ConstraintsError(Exception):
    pass


class Transformer:
    """One document transform: element tree -> mdast root."""

    def __init__(self, config=None):
        self.config = config or {}

    # -- phrasing ------------------------------------------------------

    def phrasing_children(self, el: Element) -> list:
        out = []
        for c in el.children:
            out.extend(self.phrasing_node(c))
        return out

    def phrasing_node(self, node) -> list:
        if isinstance(node, Text):
            v = collapse_ws(node.value)
            return [t(v)] if v else []
        tag = node.tag
        if tag in ("em", "i"):
            kids = self.phrasing_children(node)
            return [{"type": "emphasis", "children": kids}] if kids else []
        if tag in ("strong", "b"):
            kids = self.phrasing_children(node)
            return [{"type": "strong", "children": kids}] if kids else []
        if tag == "code":
            return [{"type": "inlineCode", "value": node.text_content()}]
        if tag == "br":
            return [{"type": "break"}]
        if tag == "a":
            kids = self.phrasing_children(node)
            url = node.get("href") or ""  # valueless <a href> parses as None
            title = node.get("title")
            if not kids and not url:
                return []
            return [{"type": "link", "url": url, "title": title, "children": kids}]
        if tag in ("sub", "sup", "u"):
            # formatting children are hoisted outside the raw wrapper:
            # <u><em>x</em></u> -> *<u>x</u>* (sub-sup-u.md:11)
            elem_kids = node.element_children()
            if (
                len(elem_kids) == 1
                and elem_kids[0].tag in ("em", "i", "strong", "b")
                and node.text_content().strip()
                == elem_kids[0].text_content().strip()
            ):
                inner = elem_kids[0]
                fmt = "emphasis" if inner.tag in ("em", "i") else "strong"
                kids = self.phrasing_children(inner)
                wrapped = (
                    [{"type": "html", "value": f"<{tag}>"}]
                    + kids
                    + [{"type": "html", "value": f"</{tag}>"}]
                )
                return [{"type": fmt, "children": wrapped}]
            kids = self.phrasing_children(node)
            return (
                [{"type": "html", "value": f"<{tag}>"}]
                + kids
                + [{"type": "html", "value": f"</{tag}>"}]
            )
        if tag == "span" and "icon" in node.classes:
            name = next(
                (c[5:] for c in node.classes if c.startswith("icon-")), None
            )
            if name:
                return [t(f":{name}:")]
            return self.phrasing_children(node)
        if tag in ("img",):
            img = self.image_node(node)
            return [img] if img else []
        if tag == "picture":
            img = node.find("img")
            if img is not None:
                n = self.image_node(img)
                return [n] if n else []
            return []
        if tag in ("script", "style", "template", "source", "track"):
            return []
        # unknown inline: unwrap
        return self.phrasing_children(node)

    def image_node(self, el: Element):
        src = el.get("src") or ""
        alt = collapse_ws(el.get("alt") or "").strip()
        title = el.get("title")
        return {
            "type": "image",
            "url": src,
            "alt": alt,
            "title": title,
        }

    # -- blocks --------------------------------------------------------

    def block_children(self, el: Element) -> list:
        """Transform children of a flow container into block nodes."""
        blocks: list = []
        pending: list = []  # phrasing run -> implicit paragraph

        def flush():
            nonlocal pending
            kids = sanitize_phrasing(pending)
            if kids:
                blocks.append({"type": "paragraph", "children": kids})
            pending = []

        for c in el.children:
            if isinstance(c, Text):
                v = collapse_ws(c.value)
                if v.strip():
                    pending.append(t(v))
                elif pending and v:
                    pending.append(t(v))
                continue
            tag = c.tag
            if tag in _BLOCK_TAGS:
                flush()
                blocks.extend(self.block_node(c))
            elif tag in ("picture", "img"):
                # flow-level images become their own paragraph
                # (external-assets.md:3-9)
                flush()
                kids = sanitize_phrasing(self.phrasing_node(c))
                if kids:
                    blocks.append({"type": "paragraph", "children": kids})
            else:
                pending.extend(self.phrasing_node(c))
        flush()
        return blocks

    def block_node(self, el: Element) -> list:
        tag = el.tag
        if tag == "p":
            kids = sanitize_phrasing(self.phrasing_children(el))
            return [{"type": "paragraph", "children": kids}] if kids else []
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            kids = sanitize_phrasing(
                self.phrasing_children(el), in_heading=True
            )
            kids = _trim_phrasing(kids)
            return [{"type": "heading", "depth": int(tag[1]), "children": kids}]
        if tag == "hr":
            return [{"type": "thematicBreak"}]
        if tag == "pre":
            return [self.code_block(el)]
        if tag == "blockquote":
            kids = self.block_children(el)
            return [{"type": "blockquote", "children": kids}] if kids else []
        if tag in ("ul", "ol"):
            return [self.list_node(el)]
        if tag == "table":
            return [self.table_node(el)]
        if tag == "div":
            return self.div_node(el)
        if tag in ("script", "style", "head", "header", "footer", "nav", "template"):
            return []
        if tag in ("picture", "img"):
            kids = sanitize_phrasing(self.phrasing_node(el))
            return [{"type": "paragraph", "children": kids}] if kids else []
        # generic flow container (section, article, aside, figure, ...)
        return self.block_children(el)

    # -- code ------------------------------------------------------------

    def code_block(self, el: Element):
        code = el.find("code") or el
        lang = None
        for cls in code.classes:
            if cls.startswith("language-"):
                lang = cls[9:]
                break
        value = code.text_content()
        value = detab(value)
        # drop exactly one trailing newline; keep a leading blank line and
        # trailing whitespace-only lines (block-with-table.md:21-25)
        if value.endswith("\n"):
            value = value[:-1]
        return {"type": "code", "lang": lang, "value": value}

    # -- lists -----------------------------------------------------------

    def list_node(self, el: Element):
        ordered = el.tag == "ol"
        items = []
        any_spread = False
        for li in el.element_children():
            if li.tag != "li":
                continue
            blocks = self.block_children(li)
            spread = len(blocks) > 1 or any(
                isinstance(c, Element) and c.tag == "p" for c in li.children
            )
            if self.config.get("unspread_lists"):
                spread = False
            any_spread = any_spread or spread
            items.append({"type": "listItem", "spread": spread, "children": blocks})
        if self.config.get("unspread_lists"):
            any_spread = False
        return {
            "type": "list",
            "ordered": ordered,
            "start": _int_attr(el, "start"),
            "spread": any_spread,
            "children": items,
        }

    # -- tables ------------------------------------------------------------

    def table_node(self, el: Element):
        header_rows = []
        body_rows = []
        for part in el.element_children():
            if part.tag == "thead":
                header_rows.extend(self.table_rows(part))
            elif part.tag in ("tbody", "tfoot"):
                body_rows.extend(self.table_rows(part))
            elif part.tag == "tr":
                body_rows.append(self.table_row(part))
        children = []
        if header_rows:
            children.append({"type": "gtHeader", "children": header_rows})
        if body_rows:
            children.append({"type": "gtBody", "children": body_rows})
        return {"type": "gridTable", "children": children}

    def table_rows(self, el: Element):
        return [self.table_row(r) for r in el.element_children() if r.tag == "tr"]

    def table_row(self, el: Element):
        cells = []
        for c in el.element_children():
            if c.tag not in ("td", "th"):
                continue
            kids = self.block_children(c)
            cells.append(
                {
                    "type": "gtCell",
                    "colSpan": _int_attr(c, "colspan"),
                    "rowSpan": _int_attr(c, "rowspan"),
                    "align": c.get("data-align"),
                    "valign": c.get("data-valign"),
                    "children": kids,
                }
            )
        return {"type": "gtRow", "children": cells}

    # -- helix block divs ----------------------------------------------------

    def div_node(self, el: Element) -> list:
        classes = el.classes
        if classes and self.is_block(el):
            return [self.block_table(el)]
        # plain div (or non-block class div): unwrap as flow
        return self.block_children(el)

    @staticmethod
    def is_block(el: Element) -> bool:
        rows = el.element_children()
        texts_ok = all(
            not isinstance(c, Text) or not c.value.strip() for c in el.children
        )
        if not texts_ok:
            return False
        if not rows:
            return True  # empty block (empty-block.html)
        for row in rows:
            if row.tag != "div":
                return False
            cells = row.element_children()
            if not cells:
                return False
            if any(c.tag != "div" for c in cells):
                return False
            if any(
                isinstance(c, Text) and c.value.strip() for c in row.children
            ):
                return False
        return True

    def block_name(self, classes: list[str]) -> str:
        first = classes[0]
        name = " ".join(w.capitalize() for w in first.split("-") if w)
        if classes[0] == "section-metadata":
            name = "Section Metadata"
        variants = classes[1:]
        if variants:
            name += " (" + ", ".join(variants) + ")"
        return name

    def block_table(self, el: Element):
        classes = el.classes
        name = self.block_name(classes)
        rows_el = el.element_children()
        rows = []
        ncols = 1
        for row in rows_el:
            cells = row.element_children()
            ncols = max(ncols, len(cells))
        header_cell = {
            "type": "gtCell",
            "colSpan": ncols,
            "rowSpan": 1,
            "align": None,
            "valign": None,
            "children": [{"type": "paragraph", "children": [t(name)]}],
        }
        rows.append({"type": "gtRow", "children": [header_cell]})
        if not rows_el:
            rows.append(
                {
                    "type": "gtRow",
                    "children": [
                        {
                            "type": "gtCell",
                            "colSpan": ncols,
                            "rowSpan": 1,
                            "align": None,
                            "valign": None,
                            "children": [],
                        }
                    ],
                }
            )
        for row in rows_el:
            cells = []
            row_cells = row.element_children()
            for idx, c in enumerate(row_cells):
                span = 1
                if idx == len(row_cells) - 1 and len(row_cells) < ncols:
                    span = ncols - len(row_cells) + 1
                cells.append(
                    {
                        "type": "gtCell",
                        "colSpan": span,
                        "rowSpan": 1,
                        "align": c.get("data-align"),
                        "valign": c.get("data-valign"),
                        "children": self.block_children(c),
                    }
                )
            rows.append({"type": "gtRow", "children": cells})
        return {"type": "gridTable", "children": [{"type": "gtBody", "children": rows}]}

    # -- document ---------------------------------------------------------

    def sections(self, main: Element) -> list:
        """main > div sections joined with thematicBreak.

        Non-div content (loose elements AND bare text) between/outside
        the section divs forms ONE implicit section per contiguous run:
        one-section-per-element would insert spurious ``---`` between
        adjacent paragraphs, and bare text directly under <main> would
        otherwise vanish entirely."""
        section_blocks: list[list] = []
        pending: list = []  # contiguous non-div children

        def flush_pending():
            if not pending:
                return
            holder = Element("div")
            holder.children = list(pending)
            pending.clear()
            blocks = self.block_children(holder)
            if blocks:
                section_blocks.append(blocks)

        for c in main.children:
            if isinstance(c, Element) and c.tag == "div":
                flush_pending()
                blocks = self.block_children(c)
                if blocks:
                    section_blocks.append(blocks)
            elif isinstance(c, Element):
                pending.append(c)
            elif isinstance(c, Text) and c.value.strip():
                pending.append(c)
        flush_pending()
        out: list = []
        for i, blocks in enumerate(section_blocks):
            if i:
                out.append({"type": "thematicBreak"})
            out.extend(blocks)
        return out

    # -- metadata ---------------------------------------------------------

    _IMAGE_KEY_RE = re.compile(r"(^|:)image$|image:secure_url$")

    def metadata_entries(self, root: Element) -> list:
        """Harvest ordered (key, value-node) pairs from <head> + html@lang."""
        entries: list = []
        head = root.find("head")
        html_el = next(
            (c for c in root.children if isinstance(c, Element) and c.tag == "html"),
            None,
        )
        if head is not None:
            for el in head.element_children():
                if el.tag == "title":
                    v = collapse_ws(el.text_content()).strip()
                    if v:
                        entries.append(("title", t(v)))
                elif el.tag == "meta":
                    name = el.get("name")
                    prop = el.get("property")
                    content = el.get("content") or ""
                    key = None
                    if name:
                        if name.lower() in _META_DENYLIST:
                            continue
                        key = name
                    elif prop:
                        if ":" not in prop:
                            continue
                        key = prop
                    else:
                        continue
                    if self._IMAGE_KEY_RE.search(key):
                        entries.append(
                            (key, {"type": "image", "url": content, "alt": "",
                                   "title": None})
                        )
                    else:
                        entries.append((key, t(content)))
                elif el.tag == "link":
                    rel = (el.get("rel") or "").lower()
                    hreflang = el.get("hreflang")
                    if rel == "alternate" and hreflang:
                        entries.append(
                            (f"hreflang-{hreflang}", t(el.get("href") or ""))
                        )
                elif el.tag == "script":
                    if (el.get("type") or "").lower() == "application/ld+json":
                        raw = el.text_content()
                        if len(raw) > 128 * 1024:
                            # json-ld-too-large.html (237 KB) has no golden
                            raise ConstraintsError("json-ld too large")
                        try:
                            data = json.loads(raw)
                        except ValueError as e:
                            raise ConstraintsError("invalid json-ld") from e
                        pretty = json.dumps(data, indent=2, ensure_ascii=False)
                        entries.append(("json-ld", t(pretty)))
        lang = html_el.get("lang") if html_el is not None else None
        if lang:
            entries.append(("html-lang", t(lang)))
        return entries

    def metadata_table(self, entries: list):
        rows = [
            {
                "type": "gtRow",
                "children": [
                    {
                        "type": "gtCell", "colSpan": 2, "rowSpan": 1,
                        "align": None, "valign": None,
                        "children": [{"type": "paragraph", "children": [t("Metadata")]}],
                    }
                ],
            }
        ]
        for key, value in entries:
            rows.append(
                {
                    "type": "gtRow",
                    "children": [
                        {
                            "type": "gtCell", "colSpan": 1, "rowSpan": 1,
                            "align": None, "valign": None,
                            "children": [{"type": "paragraph", "children": [t(key)]}],
                        },
                        {
                            "type": "gtCell", "colSpan": 1, "rowSpan": 1,
                            "align": None, "valign": None,
                            "children": [{"type": "paragraph", "children": [value]}]
                            if value.get("value") != "" or value["type"] != "text"
                            else [],
                        },
                    ],
                }
            )
        return {
            "type": "gridTable",
            "children": [{"type": "gtBody", "children": rows}],
        }


_META_DENYLIST = {"viewport", "generator", "theme-color", "google-site-verification"}

_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "div", "ul", "ol", "table",
    "pre", "blockquote", "hr", "section", "article", "aside", "figure",
    "header", "footer", "nav", "main", "form", "fieldset", "script",
    "style", "template", "dl",
}


# ---------------------------------------------------------------------------
# phrasing sanitation (helix-markdown-support sanitizeTextAndFormats)
# ---------------------------------------------------------------------------


def _trim_phrasing(kids: list) -> list:
    """Trim leading/trailing whitespace of a phrasing run (block edges)."""
    if not kids:
        return kids
    # leading
    while kids:
        k = kids[0]
        if k["type"] == "text":
            k["value"] = k["value"].lstrip()
            if not k["value"]:
                kids.pop(0)
                continue
        elif k["type"] in ("strong", "emphasis"):
            k["children"] = _ltrim_inner(k["children"])
            if not k["children"]:
                kids.pop(0)
                continue
        break
    while kids:
        k = kids[-1]
        if k["type"] == "text":
            k["value"] = k["value"].rstrip()
            if not k["value"]:
                kids.pop()
                continue
        elif k["type"] == "break":
            kids.pop()
            continue
        elif k["type"] in ("strong", "emphasis"):
            k["children"] = _rtrim_inner(k["children"])
            if not k["children"]:
                kids.pop()
                continue
        break
    return kids


def _ltrim_inner(kids):
    while kids and kids[0]["type"] == "text":
        kids[0]["value"] = kids[0]["value"].lstrip()
        if kids[0]["value"]:
            break
        kids.pop(0)
    return kids


def _rtrim_inner(kids):
    while kids and kids[-1]["type"] == "text":
        kids[-1]["value"] = kids[-1]["value"].rstrip()
        if kids[-1]["value"]:
            break
        kids.pop()
    return kids


def sanitize_phrasing(kids: list, in_heading=False) -> list:
    """Merge adjacent texts, prune empties, trim block edges."""
    out: list = []
    for k in kids:
        if k["type"] == "text":
            if k["value"] == "":
                continue
            if out and out[-1]["type"] == "text":
                out[-1] = t(out[-1]["value"] + k["value"])
                continue
        if k["type"] in ("strong", "emphasis"):
            k["children"] = sanitize_phrasing(k["children"])
            if not k["children"]:
                continue
        if k["type"] == "break":
            # spaces adjacent to a hard break are dropped
            # (block-with-table.md:27-28)
            if out and out[-1]["type"] == "text":
                out[-1] = t(out[-1]["value"].rstrip())
                if not out[-1]["value"]:
                    out.pop()
            k["_strip_next"] = True
        if (
            out
            and out[-1].get("_strip_next")
            and k["type"] == "text"
        ):
            k = t(k["value"].lstrip())
            if not k["value"]:
                continue
        if in_heading and k["type"] == "break":
            # carry the marker: the replacement html node must still
            # lstrip the following text, or whitespace after a heading
            # <br> survives while whitespace before it is stripped
            k = {"type": "html", "value": "<br>", "_strip_next": True}
        out.append(k)
    out = _trim_phrasing(out)
    # collapse whitespace-only text between two blocks? (already collapsed)
    return out


# ---------------------------------------------------------------------------
# detab (tab -> spaces at 4-char stops, hast-util-to-mdast code handler)
# ---------------------------------------------------------------------------


def detab(value: str, size: int = 4) -> str:
    """Tab stops at columns == 1 (mod size), matching the reference's
    rendering of codeblock.html tabs (codeblock.md:17-27: ``\\t    `` -> 5
    spaces, ``    \\t\\t    `` -> 13 spaces)."""
    if "\t" not in value:
        return value  # split/join below is the identity without tabs
    out_lines = []
    for line in value.split("\n"):
        res = []
        col = 0
        for ch in line:
            if ch == "\t":
                add = (1 - col) % size or size
                res.append(" " * add)
                col += add
            else:
                res.append(ch)
                col += 1
        out_lines.append("".join(res))
    return "\n".join(out_lines)
