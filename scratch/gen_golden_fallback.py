"""Generate the committed composed-extraction fixtures (boilerplate
fallback wired INTO the extraction pipeline, north rule: "HTML
boilerplate strip" as part of the pipeline):

* data/fallback_pages.parquet — deterministic (doc_id, spans) documents
  in the extraction input shape (single html span), pages WITHOUT
  <main> (sources/boilergen.synth_content_page seeds 0..23), pages WITH
  <main> pinning precedence (seeds 0..5), and two no-content poison rows
* data/golden_fallback.parquet — expected extract_documents output under
  boilerplate_fallback=True: (doc_id, status, n_chars, md_md5), all from
  synth_content_page's CONSTRUCTION-TIME markdown — the transform never
  runs here (same independence pattern as gen_golden_boiler/pdf)

Rerun after any intentional change to boilergen or the fallback spec:
    python scratch/gen_golden_fallback.py
"""

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
DATA = os.path.join(ROOT, "data")
N_FALLBACK = 24
N_WITH_MAIN = 6

from helix_html2md_spark.sources.boilergen import synth_content_page  # noqa: E402

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


def main():
    inputs = {"doc_id": [], "spans": []}
    golden = {"doc_id": [], "status": [], "n_chars": [], "md_md5": []}

    def grow(doc_id, html, expected_md):
        inputs["doc_id"].append(doc_id)
        inputs["spans"].append(
            [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]
        )
        golden["doc_id"].append(doc_id)
        golden["status"].append("ok")
        golden["n_chars"].append(len(expected_md))
        golden["md_md5"].append(
            hashlib.md5(expected_md.encode("utf-8")).hexdigest()
        )

    for seed in range(N_FALLBACK):
        html, exp = synth_content_page(seed)
        grow(f"fb-{seed:04d}", html, exp)
    for seed in range(N_WITH_MAIN):
        html, exp = synth_content_page(seed, with_main=True)
        grow(f"fb-main-{seed:04d}", html, exp)
    # no scorable content anywhere: fallback finds nothing -> empty md
    grow("fb-empty", "", "")
    grow(
        "fb-links-only",
        "<html><body><div>"
        + "".join(f'<a href="/x{j}">link {j}</a>' for j in range(20))
        + "</div></body></html>",
        "",
    )

    pq.write_table(
        pa.table(inputs, schema=pa.schema(
            [("doc_id", pa.string()), ("spans", SPAN_TYPE)]
        )),
        os.path.join(DATA, "fallback_pages.parquet"),
    )
    pq.write_table(
        pa.table(golden, schema=pa.schema([
            ("doc_id", pa.string()), ("status", pa.string()),
            ("n_chars", pa.int32()), ("md_md5", pa.string()),
        ])),
        os.path.join(DATA, "golden_fallback.parquet"),
    )
    print(f"fallback_pages.parquet: {len(inputs['doc_id'])} rows")
    print(f"golden_fallback.parquet: {len(golden['doc_id'])} rows")


if __name__ == "__main__":
    main()
