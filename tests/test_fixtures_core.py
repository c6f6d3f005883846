"""Tier-1 golden tests: pure-Python html2md vs all 26 reference fixture
pairs (byte equality after trim, like /root/reference/test/index.test.js:
130-135) plus the error-only fixtures."""

from pathlib import Path

import pytest

from helix_html2md_spark.core.html2md import html2md

from .fixture_config import CONFIGS, ERROR_FIXTURES

FIX = Path("/root/reference/test/fixtures")

GOLDEN = sorted(p.stem for p in FIX.glob("*.md"))
ERRORS = sorted(ERROR_FIXTURES)


@pytest.mark.parametrize("name", GOLDEN)
def test_fixture_golden(name):
    html = (FIX / f"{name}.html").read_text()
    expected = (FIX / f"{name}.md").read_text().strip()
    got = html2md(html, CONFIGS.get(name, {})).strip()
    assert got == expected


@pytest.mark.parametrize("name", ERRORS)
def test_fixture_errors(name):
    html = (FIX / f"{name}.html").read_text()
    etype, emsg = ERROR_FIXTURES[name]
    with pytest.raises(Exception) as ei:
        html2md(html, CONFIGS.get(name, {}))
    assert type(ei.value).__name__ == etype
    if emsg is not None:
        assert str(ei.value) == emsg
