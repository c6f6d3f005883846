"""HTML boilerplate stripping: pick the main-content subtree heuristically.

The north rule's pipeline names "HTML boilerplate strip" explicitly; the
reference covers only the structural `<main>` selection
(/root/reference/src/index.js via @adobe/helix-html2md — S4 in SURVEY
§2A).  Real web pages frequently have no `<main>`: this module adds the
standard content-extraction heuristic for that case, implemented from
the published Arc90 readability algorithm family (also the basis of
boilerpipe's density features):

1. drop noise subtrees (script/style/nav/header/footer/aside/form and
   elements whose class/id smells like navigation, ads, or comments)
2. score every paragraph by length and comma count; add its points to
   its parent container and half to its grandparent
3. the candidate with the highest accumulated score, corrected by
   (1 - link_density), is the content root; ties break on document
   order (first wins) so the result is deterministic

Pure function of the HTML string — no RNG, no wall clock (north-rule
determinism for resumable re-runs).
"""

from __future__ import annotations

import re

from .dom import Element, Text, parse_html

__all__ = ["strip_boilerplate", "select_content"]

_NOISE_TAGS = {
    "script", "style", "noscript", "template", "nav", "header", "footer",
    "aside", "form", "iframe", "button",
}
# 'ad'/'ads'/'nav' are anchored: as bare substrings they delete innocent
# subtrees ('downloads', 'roads', 'navy', 'canvas').  Readability.js's
# published unlikelyCandidates list likewise carries '-ad-'/'ad-break'
# with delimiters and no bare 'nav' (the <nav> TAG is dropped above).
_NOISE_HINT = re.compile(
    r"menu|sidebar|footer|header|banner|advert|comment|"
    r"share|social|promo|cookie|breadcrumb|"
    r"(?:^|[^a-z])(?:ads?|nav(?:bar|igation)?)(?:[^a-z]|$)",
    re.I,
)
_CANDIDATE_TAGS = {"div", "article", "section", "main", "td", "body"}
_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


# phrasing-content tags whose boundaries must NOT break a word: a word
# split by <b>/<a>/<span> mid-word ("re<b>mark</b>able") concatenates
# verbatim; every other element gets a space boundary so adjacent blocks
# written without inter-tag whitespace ("<p>a</p><p>b</p>") stay apart
_INLINE_TAGS = {
    "a", "abbr", "b", "bdi", "bdo", "cite", "code", "data", "dfn", "em",
    "i", "kbd", "mark", "q", "s", "samp", "small", "span", "strong",
    "sub", "sup", "time", "u", "var", "wbr",
}


def _text(el: Element) -> str:
    """Subtree text, spaces injected only at BLOCK-element boundaries,
    normalized.  Inline (phrasing) elements concatenate verbatim —
    joining every text node with a space corrupts words split by inline
    tags (the parser keeps whitespace-only text nodes, so real
    inter-block whitespace survives on its own)."""
    parts: list[str] = []
    # document order, iterative; plain-str stack entries are boundary
    # markers emitted around non-inline elements
    stack: list = list(reversed(el.children))
    while stack:
        c = stack.pop()
        if isinstance(c, str):
            parts.append(c)
        elif isinstance(c, Text):
            parts.append(c.value)
        elif c.tag in _INLINE_TAGS:
            stack.extend(reversed(c.children))
        else:
            stack.append(" ")  # popped AFTER the children
            stack.extend(reversed(c.children))
            stack.append(" ")  # popped first: boundary BEFORE
    return _norm("".join(parts))


_CAMEL_SPLIT = re.compile(r"(?<=[a-z])(?=[A-Z])")


def _is_noise(el: Element) -> bool:
    if el.tag in _NOISE_TAGS:
        return True
    hint = f"{el.attrs.get('class') or ''} {el.attrs.get('id') or ''}"
    if not hint.strip():
        return False
    # camelCase word boundaries become spaces BEFORE matching: the
    # anchored alternatives ('ads?'/'nav...') delimit on non-letters,
    # and under re.I the [^a-z] class excludes uppercase too — without
    # the split, 'topNav'/'mainNav'/'adSense' (very common real-world
    # classes) would never anchor-match
    return bool(_NOISE_HINT.search(_CAMEL_SPLIT.sub(" ", hint)))


def _clean(el: Element) -> None:
    # iterative: the lenient parser builds unbounded-depth trees from
    # unclosed tags, and per-level recursion would RecursionError on
    # them (the parser itself handles that input fine)
    stack = [el]
    while stack:
        node = stack.pop()
        node.children = [
            c
            for c in node.children
            if not (isinstance(c, Element) and _is_noise(c))
        ]
        stack.extend(node.element_children())


def _link_text_len(el: Element) -> int:
    total = 0
    stack = [(el, el.tag == "a")]
    while stack:
        node, in_link = stack.pop()
        for c in node.children:
            if isinstance(c, Text):
                if in_link:
                    total += len(_norm(c.value))
            else:
                stack.append((c, in_link or c.tag == "a"))
    return total


# (normalized length, raw-starts-with-ws, raw-ends-with-ws) summaries:
# enough to compute len(_norm(concat(pieces))) WITHOUT building strings —
# the per-candidate re-walk they replace made scoring O(depth^2) on
# nested-chain pages (measured: 25s of CPU for a 310KB page of 4000
# nested divs, far under the operators' byte gates), a crafted document
# stalling an executor core with nothing raising
_VACUOUS = (0, False, False)
_WS_MARKER = (0, True, True)


def _text_summary(value: str) -> tuple[int, bool, bool]:
    if not value:
        return _VACUOUS
    # edge test uses the SAME \s definition _norm collapses with
    # (str.isspace() diverges from re \s on some codepoints)
    return (
        len(_norm(value)),
        bool(_WS.match(value[0])),
        bool(_WS.match(value[-1])),
    )


def _comb(a: tuple, b: tuple) -> tuple:
    """Summary of concat(raw_a, raw_b): a whitespace junction between
    two non-empty normalized sides collapses to exactly one space."""
    al, alead, atrail = a
    bl, blead, btrail = b
    if al == 0 and not alead and not atrail:
        return b
    if bl == 0 and not blead and not btrail:
        return a
    sep = 1 if (al > 0 and bl > 0 and (atrail or blead)) else 0
    lead = alead if (al > 0 or alead or atrail) else blead
    trail = btrail if (bl > 0 or blead or btrail) else atrail
    return (al + bl + sep, lead, trail)


def _subtree_stats(
    seq: list[Element],
) -> tuple[dict[int, int], dict[int, int], dict[int, int]]:
    """ONE post-order pass over a pre-order element sequence, yielding
    per element: ``tlen`` — len(_text(el)) (block-boundary-aware
    normalized subtree text length), ``tsum`` — sum of per-text-node
    normalized lengths (the unit _link_text_len counts in), and
    ``link`` — link-text length (tsum of every <a> descendant subtree).
    Reversed pre-order visits children before parents, so each element
    folds its children's summaries in O(len(children))."""
    summ: dict[int, tuple] = {}
    tsum: dict[int, int] = {}
    link: dict[int, int] = {}
    for el in reversed(seq):
        acc = _VACUOUS
        s = 0
        lk = 0
        for c in el.children:
            if isinstance(c, Text):
                acc = _comb(acc, _text_summary(c.value))
                s += len(_norm(c.value))
            else:
                cid = id(c)
                s += tsum.get(cid, 0)
                lk += tsum.get(cid, 0) if c.tag == "a" else link.get(cid, 0)
                if c.tag in _INLINE_TAGS:
                    # _text FLATTENS inline children (no boundary), and
                    # the child summary already carries its own internal
                    # boundaries — identical by construction
                    acc = _comb(acc, summ.get(cid, _VACUOUS))
                else:
                    acc = _comb(acc, _WS_MARKER)
                    acc = _comb(acc, summ.get(cid, _VACUOUS))
                    acc = _comb(acc, _WS_MARKER)
        summ[id(el)] = acc
        tsum[id(el)] = s
        link[id(el)] = s if el.tag == "a" else lk
    return {k: v[0] for k, v in summ.items()}, tsum, link


def select_content(root: Element, min_para_len: int = 25) -> Element | None:
    """Clean + score a parsed tree, return the Arc90-winner element.

    Shared core of :func:`strip_boilerplate`, exposed so the extraction
    pipeline (core/html2md.py) can fall back to the heuristic winner
    when a page has no ``<main>``.  MUTATES the tree (noise subtrees are
    dropped).  Returns ``None`` when no paragraph scores.
    """
    got = _best_candidate(root, min_para_len)
    return got[0] if got else None


def _best_candidate(
    root: Element, min_para_len: int
) -> tuple[Element, tuple, dict[int, int], str, int] | None:
    """(winner element, its (-final, order) key, per-candidate paragraph
    counts, winner's normalized text, winner's link-text length) — or
    None when nothing scores."""
    body = root.find("body") or root
    _clean(body)

    # DOCUMENT-order (DFS pre-order) candidate index for deterministic
    # tie-breaking — a BFS index would rank a later sibling ahead of an
    # earlier nested element, contradicting the documented 'document
    # order, first wins' contract
    order: dict[int, int] = {}
    parent_of: dict[int, Element] = {}
    seq: list[Element] = []
    stack = [body]
    while stack:
        el = stack.pop()
        order[id(el)] = len(seq)
        seq.append(el)
        kids = el.element_children()
        for c in kids:
            parent_of[id(c)] = el
        stack.extend(reversed(kids))

    scores: dict[int, float] = {}
    para_counts: dict[int, int] = {}
    for p in [body] if body.tag == "p" else body.find_all("p"):
        text = _text(p)
        if len(text) < min_para_len:
            continue
        pts = 1.0 + text.count(",") + min(len(text) // 100, 3)
        parent = parent_of.get(id(p))
        while parent is not None and parent.tag not in _CANDIDATE_TAGS:
            parent = parent_of.get(id(parent))
        if parent is None:
            parent = body
        scores[id(parent)] = scores.get(id(parent), 0.0) + pts
        para_counts[id(parent)] = para_counts.get(id(parent), 0) + 1
        gp = parent_of.get(id(parent))
        while gp is not None and gp.tag not in _CANDIDATE_TAGS:
            gp = parent_of.get(id(gp))
        if gp is not None:
            scores[id(gp)] = scores.get(id(gp), 0.0) + pts / 2.0
            # the paragraph is INSIDE the grandparent too: without this
            # a winner that scored only via half-points reported
            # n_paras=0 and looked content-free to downstream filters
            para_counts[id(gp)] = para_counts.get(id(gp), 0) + 1

    if not scores:
        return None

    # all candidate text/link lengths come from ONE post-order pass
    # (_subtree_stats); walking each candidate's subtree here was
    # O(depth^2) on nested-chain pages — only the single winner's text
    # STRING is assembled, once, below
    tlen, _tsum, tlink = _subtree_stats(seq)
    by_id = {id(el): el for el in seq}
    best_el, best_final, best_link = None, None, 0
    for el_id, raw in scores.items():
        el = by_id.get(el_id)
        if el is None:
            continue
        text_len = tlen.get(el_id, 0)
        link_len = tlink.get(el_id, 0)
        density = (link_len / text_len) if text_len else 1.0
        final = raw * (1.0 - density)
        key = (-final, order.get(el_id, 1 << 30))
        if best_final is None or key < best_final:
            best_final, best_el = key, el
            best_link = link_len
    best_text = _text(best_el) if best_el is not None else ""
    return best_el, best_final, para_counts, best_text, best_link


def strip_boilerplate(html: str, min_para_len: int = 25) -> dict:
    """Return the heuristically-selected main content of an HTML page.

    Output keys: ``status`` ("ok" / "no_content"), ``content_tag``,
    ``content_text`` (whitespace-normalized), ``text_len``,
    ``link_density`` (4dp), ``n_paras`` (scoring paragraphs inside the
    winner), ``score`` (rounded int).
    """
    got = _best_candidate(parse_html(html), min_para_len)
    if got is None:
        return {
            "status": "no_content", "content_tag": None,
            "content_text": "", "text_len": 0, "link_density": 0.0,
            "n_paras": 0, "score": 0,
        }
    el, best_final, para_counts, text, link_len = got
    text_len = len(text)
    density = round((link_len / text_len) if text_len else 1.0, 4)
    return {
        "status": "ok",
        "content_tag": el.tag,
        "content_text": text,
        "text_len": text_len,
        "link_density": density,
        "n_paras": para_counts.get(id(el), 0),
        "score": int(round(-best_final[0])),
    }
