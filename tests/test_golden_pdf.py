"""Golden-parquet binding for the PDF layout-parse driver query.

Three independent derivations must agree:

1. the committed data/golden_pdf_spans.parquet (written by
   scratch/gen_golden_pdf.py from synth_pdf construction-time
   expectations — the parser never touches it)
2. a re-derivation here from the same expectations (guards against a
   stale or hand-edited committed file)
3. the live pipeline: parse_pdf over the committed pdfs.parquet bytes,
   and the full Spark driver query q_pdf_extract
"""

import hashlib
import os

import pyarrow.parquet as pq

from helix_html2md_spark.core.pdfparse import parse_pdf
from helix_html2md_spark.sources.pdfgen import (
    synth_cid_pdf, synth_inline_pdf, synth_link_pdf, synth_pdf,
    synth_rotated_pdf, synth_table_pdf, synth_two_column_pdf,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")
RS, FS = "\x1e", "\x1f"
N_SEEDS = 32
N_OBJSTM = 8
N_CMAP = 8
N_MODERN = 6
N_NESTED = 6
N_INDLEN = 6
N_TWOCOL = 6
N_LINKS = 6
N_ROT = 5
N_DESC = 5
N_CID = 5
N_INLINE = 5
N_TABLE = 6


def _md5_of(expected):
    parts = []
    for kind, val in expected:
        text = val if kind not in ("image", "link") else ""
        media = val if kind in ("image", "link") else ""
        parts.append(f"{kind}{FS}{text}{FS}{media}")
    return hashlib.md5(RS.join(parts).encode("utf-8")).hexdigest()


def _golden():
    t = pq.read_table(os.path.join(DATA, "golden_pdf_spans.parquet"))
    return {r["doc_id"]: r for r in t.to_pylist()}


def test_golden_matches_construction_expectations():
    golden = _golden()
    assert len(golden) == (
        N_SEEDS + N_OBJSTM + N_CMAP
        + N_MODERN + N_NESTED + N_INDLEN + N_TWOCOL + N_LINKS
        + N_ROT + N_DESC + N_CID + N_INLINE + N_TABLE + 2
    )
    variants = (
        [(s, {}, f"pdf-{s:04d}") for s in range(N_SEEDS)]
        + [(s, {"objstm": True}, f"pdf-objstm-{s:04d}")
           for s in range(N_OBJSTM)]
        + [(s, {"cmap_fonts": True}, f"pdf-cmap-{s:04d}")
           for s in range(N_CMAP)]
        + [(s, {"objstm": True, "xref_stream": True},
            f"pdf-modern-{s:04d}") for s in range(N_MODERN)]
        + [(s, {"nested_pages": True}, f"pdf-nested-{s:04d}")
           for s in range(N_NESTED)]
        + [(s, {"indirect_length": True}, f"pdf-indlen-{s:04d}")
           for s in range(N_INDLEN)]
        + [(s, {"two_column": True}, f"pdf-twocol-{s:04d}")
           for s in range(N_TWOCOL)]
        + [(s, {"links": True}, f"pdf-links-{s:04d}")
           for s in range(N_LINKS)]
        + [(s, {"rotated": True}, f"pdf-rot-{s:04d}")
           for s in range(N_ROT)]
        + [(s, {"descriptor_font": True}, f"pdf-desc-{s:04d}")
           for s in range(N_DESC)]
        + [(s, {"cid": True}, f"pdf-cid-{s:04d}") for s in range(N_CID)]
        + [(s, {"inline": True}, f"pdf-inline-{s:04d}")
           for s in range(N_INLINE)]
        + [(s, {"table": True}, f"pdf-table-{s:04d}")
           for s in range(N_TABLE)]
    )
    for seed, kwargs, doc_id in variants:
        if kwargs.pop("two_column", False):
            _, expected = synth_two_column_pdf(seed)
        elif kwargs.pop("links", False):
            _, expected = synth_link_pdf(seed)
        elif kwargs.pop("rotated", False):
            _, expected = synth_rotated_pdf(seed)
        elif kwargs.pop("cid", False):
            _, expected = synth_cid_pdf(seed)
        elif kwargs.pop("inline", False):
            _, expected = synth_inline_pdf(seed)
        elif kwargs.pop("table", False):
            _, expected = synth_table_pdf(seed)
        else:
            _, expected = synth_pdf(seed, **kwargs)
        row = golden[doc_id]
        assert row["status"] == "ok"
        assert row["spans_md5"] == _md5_of(expected)
        assert row["n_headings"] == sum(
            1 for k, _ in expected if k == "heading"
        )
        assert row["n_text"] == sum(1 for k, _ in expected if k == "text")
        assert row["n_images"] == sum(
            1 for k, _ in expected if k == "image"
        )
        assert row["n_chars"] == sum(
            len(v) for k, v in expected if k not in ("image", "link")
        )
    assert golden["pdf-not-a-pdf"]["status"] == "constraint_error"
    assert golden["pdf-corrupt"]["status"] == "parse_error"
    assert golden["pdf-corrupt"]["spans_md5"] == _md5_of([])


def test_committed_pdf_bytes_parse_to_golden():
    golden = _golden()
    inputs = pq.read_table(os.path.join(DATA, "pdfs.parquet")).to_pylist()
    for row in inputs:
        if golden[row["doc_id"]]["status"] != "ok":
            continue
        spans = parse_pdf(row["payload"])
        expected = [
            (
                s["kind"],
                s["text"]
                if s["kind"] not in ("image", "link")
                else s["media_ref"],
            )
            for s in spans
        ]
        assert _md5_of(expected) == golden[row["doc_id"]]["spans_md5"]


def test_driver_query_matches_golden(spark):
    import __spark_entry__ as E

    golden = _golden()
    out = E.q_pdf_extract(spark, "unused").collect()
    assert len(out) == len(golden)
    for r in out:
        g = golden[r["doc_id"]]
        assert (
            r["status"], r["error"], r["n_headings"], r["n_text"],
            r["n_images"], r["n_chars"], r["spans_md5"],
        ) == (
            g["status"], g["error"], g["n_headings"], g["n_text"],
            g["n_images"], g["n_chars"], g["spans_md5"],
        ), r["doc_id"]
