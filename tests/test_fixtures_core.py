"""Tier-1 golden tests: pure-Python html2md vs all 24 reference fixture
.md pairs (byte equality after trim, like
/root/reference/test/index.test.js:130-135) plus the 3 error-only
fixtures."""

from pathlib import Path

import pytest

from helix_html2md_spark.core.html2md import html2md

from .fixture_config import CONFIGS, ERROR_FIXTURES

FIX = Path("/root/reference/test/fixtures")

GOLDEN = sorted(p.stem for p in FIX.glob("*.md"))
ERRORS = sorted(ERROR_FIXTURES)
# glob-derived: pin the count so a shrunken reference checkout fails
# loudly instead of silently running fewer golden cases
assert len(GOLDEN) == 24, GOLDEN
assert len(ERRORS) == 3, ERRORS


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


def test_fixture_config_registries_agree():
    """tests/fixture_config.py (tier-1 callable lookups) and
    helix_html2md_spark/sources/fixtures.py (Spark span refs) are two
    views of the SAME reference harness pin; shared scalar options must
    match or the two tiers silently validate different contracts."""
    from helix_html2md_spark.sources import fixtures as pkg

    from . import fixture_config as t1

    names = set(t1.CONFIGS) | set(pkg.CONFIGS)
    for name in sorted(names):
        a, b = t1.CONFIGS.get(name, {}), pkg.CONFIGS.get(name, {})
        for key in (
            "media_enabled", "source_url", "org", "site",
            "max_image_size", "unspread_lists", "max_images",
            "max_html_size",
        ):
            assert a.get(key) == b.get(key), (name, key, a.get(key), b.get(key))
        # tier-1 carries a list, the Spark config column a comma-string
        ep_a = a.get("external_prefixes")
        ep_b = b.get("external_prefixes")
        ep_a = ",".join(ep_a) if isinstance(ep_a, list) else ep_a
        assert ep_a == ep_b, (name, ep_a, ep_b)
