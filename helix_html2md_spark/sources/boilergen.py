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

__all__ = ["synth_boiler_page", "synth_content_page"]

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


def synth_content_page(
    seed: int, with_main: bool = False
) -> tuple[str, str]:
    """(html, expected_markdown) for the COMPOSED extraction path
    (``boilerplate_fallback=True`` in core/html2md.py).

    The page has realistic chrome but NO ``<main>`` (unless
    ``with_main``), and its ``<head>`` carries no harvestable metadata
    (no title/meta/json-ld), so the expected markdown is arithmetic in
    the construction: heading + paragraphs of the Arc90-winning content
    container, one section, no metadata gridtable.  ``with_main=True``
    pins precedence: a present ``<main>`` wins and the fallback never
    runs, so the expectation is the main transform's output.
    """
    n_paras = 2 + seed % 4
    tag = "article" if seed % 3 == 0 else "div"
    title = f"Fallback {seed}"
    paras = [
        _para(seed * 13 + 5, i, 12 + (seed + i) % 9)
        for i in range(n_paras)
    ]
    content = f"<h1>{title}</h1>\n" + "\n".join(
        f"<p>{p}</p>" for p in paras
    )
    chrome_links = "".join(
        f'<a href="/s{j}">section {j}</a> ' for j in range(5)
    )
    main_html = ""
    if with_main:
        main_html = (
            f"<main><div><h2>Official {seed}</h2>"
            f"<p>{paras[0]}</p></div></main>\n"
        )
    html = f"""<!DOCTYPE html>
<html><head><style>body {{ margin: 0 }}</style>
<script>var tracker = 1;</script></head>
<body>
<header><a href="/">Example Site</a> {chrome_links}</header>
<nav><ul><li><a href="/a">archive</a></li><li><a href="/b">about</a></li></ul></nav>
<div class="sidebar">{chrome_links}</div>
{main_html}<{tag} id="content">
{content}
</{tag}>
<div class="comments"><p>first!, a comment that is long enough to score</p></div>
<footer><a href="/imprint">imprint</a> copyright</footer>
</body></html>"""
    if with_main:
        expected_md = f"## Official {seed}\n\n{paras[0]}"
    else:
        expected_md = f"# {title}\n\n" + "\n\n".join(paras)
    return html, expected_md
