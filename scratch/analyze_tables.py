"""Measure gridtable column widths in reference fixture .md files.

For each table found, print: fixture, ncols, content widths per column,
and the longest line per column (to study wrap behavior).
"""
import re
import sys
from pathlib import Path

FIX = Path("/root/reference/test/fixtures")


def tables(lines):
    """Yield (start, end) line ranges of top-level gridtables."""
    i = 0
    while i < len(lines):
        if re.match(r"^\+[-=:][-=:+xv ]*\+$", lines[i] or "") and set(lines[i]) <= set("+-=:xv"):
            j = i
            while j < len(lines) and lines[j].startswith(("+", "|")):
                j += 1
            yield i, j
            i = j
        else:
            i += 1


def analyze(name):
    text = (FIX / f"{name}.md").read_text()
    lines = text.split("\n")
    for s, e in tables(lines):
        tbl = lines[s:e]
        # column boundaries: positions of '+' in the most-segmented border line
        best = max((l for l in tbl if l.startswith("+")), key=lambda l: l.count("+"))
        cuts = [m.start() for m in re.finditer(r"\+", best)]
        widths = [cuts[k + 1] - cuts[k] - 1 for k in range(len(cuts) - 1)]
        contents = [w - 2 for w in widths]
        total = len(best)
        print(f"{name}: total={total} ncols={len(contents)} content_widths={contents}")
        # longest actual line per column (only for rows matching full segmentation)
        longest = [""] * len(contents)
        for l in tbl:
            if not l.startswith("|"):
                continue
            ok = all(c < len(l) and l[c] in "|" for c in cuts)
            if not ok:
                continue
            for k in range(len(cuts) - 1):
                seg = l[cuts[k] + 2 : cuts[k + 1] - 1]
                st = seg.rstrip()
                if len(st) > len(longest[k]):
                    longest[k] = st
        for k, t in enumerate(longest):
            print(f"   col{k}: maxline={len(t)} {t[:80]!r}")


if __name__ == "__main__":
    names = sys.argv[1:] or [p.stem for p in sorted(FIX.glob("*.md"))]
    for n in names:
        analyze(n)
        print()
