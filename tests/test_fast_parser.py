"""Fast regex HTML tokenizer vs the stdlib oracle: tree-identical on all
fixtures and the synthetic corpus; output-identical on structured random
HTML."""

import random
import string
from pathlib import Path

from helix_html2md_spark.core.dom import Element, Text, _fast_parse, parse_html_stdlib

FIX = Path("/root/reference/test/fixtures")


def dump(node):
    out = []
    stack = [(node, 0)]
    while stack:
        n, d = stack.pop()
        if isinstance(n, Text):
            out.append(("T", d, n.value))
        else:
            out.append(("E", d, n.tag, tuple(sorted(n.attrs.items()))))
            for c in reversed(n.children):
                stack.append((c, d + 1))
    return out


def test_fixtures_tree_identical():
    for p in sorted(FIX.glob("*.html")):
        h = p.read_text()
        assert dump(parse_html_stdlib(h)) == dump(_fast_parse(h)), p.stem


def test_synthetic_tree_identical():
    from helix_html2md_spark.operators.extract import assemble_html
    from helix_html2md_spark.sources.synthetic import gen_doc

    for i in range(40):
        h = assemble_html(gen_doc(42, i)["spans"])
        assert dump(parse_html_stdlib(h)) == dump(_fast_parse(h)), i


def test_structured_random_output_identical():
    import helix_html2md_spark.core.html2md as H
    from helix_html2md_spark.core.transform import ConstraintsError

    rng = random.Random(11)
    alpha = string.ascii_letters + ' ="&;#x-'
    tags = ["div", "p", "ul", "li", "em", "strong", "pre", "code", "br",
            'a href="#"', 'img src="a.png"']

    def md(parser, h):
        orig = H.parse_html
        H.parse_html = parser
        try:
            return H.html2md(h, {})
        except ConstraintsError as e:
            return f"CE:{e}"
        finally:
            H.parse_html = orig

    for _ in range(120):
        parts = []
        for _ in range(rng.randint(1, 6)):
            tag = rng.choice(tags)
            body = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25)))
            close = f"</{tag.split()[0]}>" if rng.random() < 0.8 else ""
            parts.append(f"<{tag}>{body}{close}")
        h = "<main><div>" + "".join(parts) + "</div></main>"
        assert md(parse_html_stdlib, h) == md(_fast_parse, h), h
