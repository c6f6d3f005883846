"""TDD driver: run html2md over all reference fixtures, diff vs golden."""
import difflib
import sys
import traceback
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from fixture_config import CONFIGS, ERROR_FIXTURES  # noqa: E402
from helix_html2md_spark.core.html2md import html2md  # noqa: E402

FIX = Path("/root/reference/test/fixtures")

ORDER = [
    "no-main", "simple", "empty-block", "breaks-in-headings", "icons",
    "no-blocks", "json-ld", "meta-tags-hreflang", "meta-tags",
    "meta-tags-htmllang", "sub-sup-u", "blocks-with-colspan", "unspread",
    "external-assets", "self-closing-breaks", "blocks-with-alignment",
    "tables", "codeblock", "block-with-table", "images", "image-large",
    "multiple-sections", "default-content", "blocks",
    "json-ld-invalid", "json-ld-too-large", "images-large",
]


def main(names):
    passed, failed = [], []
    for name in names:
        html = (FIX / f"{name}.html").read_text()
        cfg = CONFIGS.get(name, {})
        md_path = FIX / f"{name}.md"
        if name in ERROR_FIXTURES:
            etype, emsg = ERROR_FIXTURES[name]
            try:
                html2md(html, cfg)
                failed.append((name, f"expected {etype}, got success"))
            except Exception as e:  # noqa: BLE001
                if type(e).__name__ == etype and (emsg is None or str(e) == emsg):
                    passed.append(name)
                else:
                    failed.append((name, f"expected {etype}({emsg}), got {type(e).__name__}({e})"))
            continue
        expected = md_path.read_text().strip()
        try:
            got = html2md(html, cfg).strip()
        except Exception:  # noqa: BLE001
            failed.append((name, traceback.format_exc()))
            continue
        if got == expected:
            passed.append(name)
        else:
            diff = "\n".join(
                difflib.unified_diff(
                    expected.split("\n"), got.split("\n"),
                    "expected", "got", lineterm="", n=2,
                )
            )
            failed.append((name, diff))
    print(f"PASS {len(passed)}/{len(passed) + len(failed)}: {' '.join(passed)}")
    for name, msg in failed:
        print(f"\n=== FAIL {name} ===")
        print(msg[:4000])
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ORDER))
