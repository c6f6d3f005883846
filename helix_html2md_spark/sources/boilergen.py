"""Deterministic boilerplate-page generator for tests and fixtures.

Builds HTML pages with realistic chrome (header, nav, sidebar, link
farm, comments, footer) around one known content container, and
constructs the EXPECTED strip_boilerplate outcome arithmetically
alongside the bytes — the stripper under test has no hand in the
expectation (same independence pattern as sources/pdfgen.synth_pdf).

Pure function of ``seed``: regenerating a corpus yields identical bytes
and identical expectations.
"""

from __future__ import annotations

__all__ = ["synth_boiler_page"]

_WORDS = (
    "signal content reader dense column stream engine corpus page rank "
    "shuffle block spark filter scan broadcast join window batch order"
).split()


def _para(seed: int, idx: int, n_words: int) -> str:
    words = [
        _WORDS[(seed * 11 + idx * 7 + w * 3) % len(_WORDS)]
        for w in range(n_words)
    ]
    # one comma at a deterministic split point (commas feed the score)
    cut = 1 + (seed + idx) % (n_words - 2)
    return " ".join(words[:cut]) + ", " + " ".join(words[cut:])


def synth_boiler_page(seed: int) -> tuple[str, dict]:
    """Return (html, expected) for one synthetic page.

    ``expected`` carries the fields strip_boilerplate must produce:
    status/content_tag/content_text/text_len/link_density/n_paras/score.
    """
    n_paras = 2 + seed % 4
    tag = "article" if seed % 3 == 0 else "div"
    title = f"Story {seed}"
    paras = [
        _para(seed, i, 12 + (seed + i) % 9) for i in range(n_paras)
    ]

    chrome_links = "".join(
        f'<a href="/s{j}">section {j}</a> ' for j in range(5)
    )
    linkfarm = "".join(
        f'<p><a href="/r{j}">related article number {seed}-{j}, '
        f"with a long teaser text</a></p>"
        for j in range(3)
    )
    content = f"<h1>{title}</h1>\n" + "\n".join(
        f"<p>{p}</p>" for p in paras
    )
    html = f"""<!DOCTYPE html>
<html><head><title>{title} — Example Site</title>
<style>body {{ margin: 0 }}</style>
<script>var tracker = 1;</script></head>
<body>
<header><a href="/">Example Site</a> {chrome_links}</header>
<nav><ul><li><a href="/a">archive</a></li><li><a href="/b">about</a></li></ul></nav>
<div class="sidebar">{chrome_links}</div>
<{tag} id="content">
{content}
</{tag}>
<div class="related">{linkfarm}</div>
<div class="comments"><p>first!, a comment that is long enough to score</p></div>
<footer><a href="/imprint">imprint</a> copyright</footer>
</body></html>"""

    # expected score: paragraphs are direct children of the content
    # container, so its raw score is the plain sum of paragraph points
    # (1 + commas + min(len//100, 3)); it has no links, so the
    # link-density correction is a no-op.  NOTE: the "related" link farm
    # SURVIVES cleaning (no _NOISE_HINT pattern matches 'related') and
    # is scored as a candidate — it loses on the (1 - link_density)
    # correction, whose density is ~1.0 for an all-link container.
    raw = 0.0
    for p in paras:
        assert len(p) >= 25
        raw += 1.0 + p.count(",") + min(len(p) // 100, 3)
    text = " ".join([title] + paras)
    expected = {
        "status": "ok",
        "content_tag": tag,
        "content_text": text,
        "text_len": len(text),
        "link_density": 0.0,
        "n_paras": n_paras,
        "score": int(round(raw)),
    }
    return html, expected
