"""Composed extraction path: Arc90 boilerplate strip as the no-<main>
fallback inside extract_documents (``boilerplate_fallback`` flag).

Three independent derivations must agree (the golden_parquet pattern):

1. the committed data/golden_fallback.parquet (construction-time
   markdown from synth_content_page — the transform never ran there)
2. a re-derivation here from the same expectations
3. the live pipeline: html2md with the flag, and the full Spark driver
   query q_extract_fallback

Plus the byte-exact pin that flag OFF keeps the reference's no-main
semantics (empty markdown, test/fixtures/no-main.md).
"""

import hashlib
import os

import pyarrow.parquet as pq

from helix_html2md_spark.core.html2md import html2md
from helix_html2md_spark.sources.boilergen import synth_content_page

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")
N_FALLBACK = 24
N_WITH_MAIN = 6


def _golden():
    t = pq.read_table(os.path.join(DATA, "golden_fallback.parquet"))
    return {r["doc_id"]: r for r in t.to_pylist()}


def _variants():
    out = [
        (f"fb-{s:04d}",) + synth_content_page(s) for s in range(N_FALLBACK)
    ]
    out += [
        (f"fb-main-{s:04d}",) + synth_content_page(s, with_main=True)
        for s in range(N_WITH_MAIN)
    ]
    return out


def test_golden_matches_construction_expectations():
    golden = _golden()
    assert len(golden) == N_FALLBACK + N_WITH_MAIN + 2
    for doc_id, _, expected_md in _variants():
        row = golden[doc_id]
        assert row["status"] == "ok"
        assert row["n_chars"] == len(expected_md)
        assert row["md_md5"] == hashlib.md5(
            expected_md.encode("utf-8")
        ).hexdigest()
    for doc_id in ("fb-empty", "fb-links-only"):
        assert golden[doc_id]["n_chars"] == 0


def test_fallback_transform_matches_expectations():
    for doc_id, html, expected_md in _variants():
        got = html2md(html, {"boilerplate_fallback": True}).strip()
        assert got == expected_md, doc_id


def test_flag_off_preserves_reference_no_main_semantics():
    # fallback pages have no <main>: flag off -> empty markdown, the
    # reference behavior pinned by test/fixtures/no-main.md
    for s in range(N_FALLBACK):
        html, _ = synth_content_page(s)
        assert html2md(html, {}) == "", s
    # and the reference fixture itself stays empty even WITH the flag
    # when nothing scores — but with scorable content the fixture pin is
    # the flag default, exercised by the full fixture suite elsewhere


def test_driver_query_matches_golden(spark):
    import __spark_entry__ as E

    golden = _golden()
    out = E.q_extract_fallback(spark, "unused").collect()
    assert len(out) == len(golden)
    for r in out:
        g = golden[r["doc_id"]]
        assert (r["status"], r["n_chars"], r["md_md5"]) == (
            g["status"], g["n_chars"], g["md_md5"]
        ), r["doc_id"]


def test_fallback_mutation_resilience():
    """Hostile-input property: byte-mutated chrome pages through the
    composed fallback path never raise unexpected exception types (the
    operator catches per-row, but the library surface itself should
    only ever raise the documented constraint taxonomy)."""
    from helix_html2md_spark.core.html2md import (
        SizeTooLargeError, TooManyImagesError,
    )
    from helix_html2md_spark.core.transform import ConstraintsError

    base, _ = synth_content_page(7)
    for pos_seed in range(40):
        data = list(base)
        pos = (pos_seed * 2654435761) % len(data)
        data[pos] = chr((ord(data[pos]) + 1 + pos_seed) % 128)
        try:
            out = html2md("".join(data), {"boilerplate_fallback": True})
        except (ConstraintsError, TooManyImagesError, SizeTooLargeError):
            continue
        assert isinstance(out, str)
