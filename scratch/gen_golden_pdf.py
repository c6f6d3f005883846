"""Generate the committed PDF-extraction fixtures:

* data/pdfs.parquet            — deterministic input table of PDF bytes
  (sources/pdfgen.synth_pdf seeds 0..31 + two poison rows)
* data/golden_pdf_spans.parquet — expected parse_pdf_documents output

Independence axis: the expected span sequences come from synth_pdf's
CONSTRUCTION-TIME expectation list (built arithmetically alongside the
bytes), never from running the parser — the parser under test has no
hand in the golden.  The generator<->parser agreement itself is pinned
by the handwritten literal cases in tests/test_pdfparse.py (TJ kerning,
escapes, hex strings, page order), and tests/test_golden_pdf.py
re-derives every golden row a third time.

Rerun after any intentional change to pdfgen or the span contract:
    python scratch/gen_golden_pdf.py
"""

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
DATA = os.path.join(ROOT, "data")
N_SEEDS = 32
N_OBJSTM = 8
N_CMAP = 8
N_MODERN = 6   # ObjStm + xref-stream (full PDF 1.5 producer layout)
N_NESTED = 6   # balanced /Pages tree (intermediate nodes)
N_INDLEN = 6   # /Length as an indirect reference
N_TWOCOL = 6   # two-column pages, column-major expected order
N_LINKS = 6    # /Annots URI link annotations -> 'link' spans
N_ROT = 5      # rotated (Tm-matrix) margin columns, 90/270deg
N_DESC = 5     # TrueType + FontDescriptor /MissingWidth metrics
N_CID = 5      # Type0/CID fonts with /W + /DW width metrics
N_INLINE = 5   # BI/ID/EI inline images; even seeds ASCII85-armored
N_TABLE = 6    # ruled tables (re + m/l grids) -> 'table' spans

from helix_html2md_spark.sources.pdfgen import (  # noqa: E402
    synth_cid_pdf, synth_inline_pdf, synth_link_pdf, synth_pdf,
    synth_rotated_pdf, synth_table_pdf, synth_two_column_pdf,
)

RS, FS = "\x1e", "\x1f"  # record / field separators for the span md5


def spans_md5(expected) -> str:
    parts = []
    for kind, val in expected:
        # image hashes and link URIs ride in media_ref; text otherwise
        text = val if kind not in ("image", "link") else ""
        media = val if kind in ("image", "link") else ""
        parts.append(f"{kind}{FS}{text}{FS}{media}")
    return hashlib.md5(RS.join(parts).encode("utf-8")).hexdigest()


def main():
    inputs = {"doc_id": [], "payload": []}
    golden = {
        "doc_id": [], "status": [], "error": [], "n_headings": [],
        "n_text": [], "n_images": [], "n_chars": [], "spans_md5": [],
    }

    def grow(doc_id, status, error, expected):
        golden["doc_id"].append(doc_id)
        golden["status"].append(status)
        golden["error"].append(error)
        golden["n_headings"].append(
            sum(1 for k, _ in expected if k == "heading")
        )
        golden["n_text"].append(sum(1 for k, _ in expected if k == "text"))
        golden["n_images"].append(
            sum(1 for k, _ in expected if k == "image")
        )
        golden["n_chars"].append(
            sum(len(v) for k, v in expected if k not in ("image", "link"))
        )
        golden["spans_md5"].append(spans_md5(expected))

    for seed in range(N_SEEDS):
        data, expected = synth_pdf(seed)
        doc_id = f"pdf-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # PDF 1.5 object-stream layout (page dicts packed in an ObjStm):
    # same construction-time expectations, different physical layout
    for seed in range(N_OBJSTM):
        data, expected = synth_pdf(seed, objstm=True)
        doc_id = f"pdf-objstm-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # subset-font layout (2-byte glyph codes + /ToUnicode CMap):
    # same construction-time expectations, different text encoding
    for seed in range(N_CMAP):
        data, expected = synth_pdf(seed, cmap_fonts=True)
        doc_id = f"pdf-cmap-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # round-4 layout variants: same construction-time expectations,
    # different physical file layouts (modern = ObjStm + xref stream;
    # nested page tree; indirect /Length), plus two-column pages whose
    # expected order is column-major by construction
    for seed in range(N_MODERN):
        data, expected = synth_pdf(seed, objstm=True, xref_stream=True)
        doc_id = f"pdf-modern-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    for seed in range(N_NESTED):
        data, expected = synth_pdf(seed, nested_pages=True)
        doc_id = f"pdf-nested-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    for seed in range(N_INDLEN):
        data, expected = synth_pdf(seed, indirect_length=True)
        doc_id = f"pdf-indlen-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    for seed in range(N_TWOCOL):
        data, expected = synth_two_column_pdf(seed)
        doc_id = f"pdf-twocol-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    for seed in range(N_LINKS):
        data, expected = synth_link_pdf(seed)
        doc_id = f"pdf-links-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # round-5 layout variants: rotated margin columns (full Tm matrix)
    # and descriptor-font metrics — same construction-time expectation
    # discipline
    for seed in range(N_ROT):
        data, expected = synth_rotated_pdf(seed)
        doc_id = f"pdf-rot-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    for seed in range(N_DESC):
        data, expected = synth_pdf(seed, descriptor_font=True)
        doc_id = f"pdf-desc-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # Type0/CID composite-font metrics: per-word runs whose inter-word
    # gaps are classified by the /W advances (last code falls to /DW)
    for seed in range(N_CID):
        data, expected = synth_cid_pdf(seed)
        doc_id = f"pdf-cid-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # BI/ID/EI inline images (even seeds also armor the content
    # stream as /Filter [/ASCII85Decode /FlateDecode]): sample bytes
    # live raw in the content stream and must never tokenize as text
    for seed in range(N_INLINE):
        data, expected = synth_inline_pdf(seed)
        doc_id = f"pdf-inline-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # ruled tables: grids drawn with both path forms (re border, m/l
    # inner rules); the expected 'table' span text is construction-time
    for seed in range(N_TABLE):
        data, expected = synth_table_pdf(seed)
        doc_id = f"pdf-table-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["payload"].append(data)
        grow(doc_id, "ok", "", expected)

    # poison rows: per-row degradation is part of the contract
    inputs["doc_id"].append("pdf-not-a-pdf")
    inputs["payload"].append(b"GIF89a not a pdf at all")
    grow(
        "pdf-not-a-pdf", "constraint_error",
        "not a PDF (missing %PDF- magic)", [],
    )
    inputs["doc_id"].append("pdf-corrupt")
    inputs["payload"].append(b"%PDF-1.4\nno objects here, just noise\n")
    grow("pdf-corrupt", "parse_error", "no objects", [])

    pq.write_table(
        pa.table(inputs, schema=pa.schema(
            [("doc_id", pa.string()), ("payload", pa.binary())]
        )),
        os.path.join(DATA, "pdfs.parquet"),
    )
    pq.write_table(
        pa.table(golden, schema=pa.schema([
            ("doc_id", pa.string()), ("status", pa.string()),
            ("error", pa.string()), ("n_headings", pa.int32()),
            ("n_text", pa.int32()), ("n_images", pa.int32()),
            ("n_chars", pa.int32()), ("spans_md5", pa.string()),
        ])),
        os.path.join(DATA, "golden_pdf_spans.parquet"),
    )
    print(f"pdfs.parquet: {len(inputs['doc_id'])} rows")
    print(f"golden_pdf_spans.parquet: {len(golden['doc_id'])} rows")


if __name__ == "__main__":
    main()
