"""Generate the committed boilerplate-strip fixtures:

* data/boiler_pages.parquet  — deterministic (doc_id, html) pages
  (sources/boilergen.synth_boiler_page seeds 0..31 + poison rows)
* data/golden_boiler.parquet — expected strip_boilerplate_documents
  output (construction-time expectations; the stripper never runs here)

Rerun after any intentional change to boilergen or the scoring spec:
    python scratch/gen_golden_boiler.py
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

from helix_html2md_spark.sources.boilergen import synth_boiler_page  # noqa: E402


def main():
    inputs = {"doc_id": [], "html": []}
    golden = {
        "doc_id": [], "status": [], "error": [], "content_tag": [],
        "text_len": [], "link_density": [], "n_paras": [], "score": [],
        "content_md5": [],
    }

    def grow(doc_id, status, error, exp):
        golden["doc_id"].append(doc_id)
        golden["status"].append(status)
        golden["error"].append(error)
        golden["content_tag"].append(exp.get("content_tag"))
        golden["text_len"].append(exp.get("text_len", 0))
        golden["link_density"].append(exp.get("link_density", 0.0))
        golden["n_paras"].append(exp.get("n_paras", 0))
        golden["score"].append(exp.get("score", 0))
        golden["content_md5"].append(
            hashlib.md5(
                exp.get("content_text", "").encode("utf-8")
            ).hexdigest()
        )

    for seed in range(N_SEEDS):
        html, exp = synth_boiler_page(seed)
        doc_id = f"page-{seed:04d}"
        inputs["doc_id"].append(doc_id)
        inputs["html"].append(html)
        grow(doc_id, "ok", "", exp)

    # poison rows: pages with no scorable content
    inputs["doc_id"].append("page-empty")
    inputs["html"].append("")
    grow("page-empty", "no_content", "", {})
    inputs["doc_id"].append("page-links-only")
    inputs["html"].append(
        "<html><body><div>"
        + "".join(f'<a href="/x{j}">link {j}</a>' for j in range(20))
        + "</div></body></html>"
    )
    grow("page-links-only", "no_content", "", {})

    pq.write_table(
        pa.table(inputs, schema=pa.schema(
            [("doc_id", pa.string()), ("html", pa.string())]
        )),
        os.path.join(DATA, "boiler_pages.parquet"),
    )
    pq.write_table(
        pa.table(golden, schema=pa.schema([
            ("doc_id", pa.string()), ("status", pa.string()),
            ("error", pa.string()), ("content_tag", pa.string()),
            ("text_len", pa.int32()), ("link_density", pa.float64()),
            ("n_paras", pa.int32()), ("score", pa.int32()),
            ("content_md5", pa.string()),
        ])),
        os.path.join(DATA, "golden_boiler.parquet"),
    )
    print(f"boiler_pages.parquet: {len(inputs['doc_id'])} rows")
    print(f"golden_boiler.parquet: {len(golden['doc_id'])} rows")


if __name__ == "__main__":
    main()
