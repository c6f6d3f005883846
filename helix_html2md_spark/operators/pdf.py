"""PDF layout-parse operator: (doc_id, payload) -> layout spans.

The north rule's pipeline is "HTML boilerplate strip, PDF/layout parse,
DOM heuristics"; the reference service covers only the HTML leg
(/root/reference/src/index.js), so this operator extends the same span
contract (operators/extract.py SPAN_TYPE) to PDF inputs using the pure
parser in core/pdfparse.py.

Spark-first shape — the same plan discipline as the HTML extraction
operator:

* JVM admission gate BEFORE the Python stage, single-pass (no Union):
  byte-size cap and ``%PDF-`` magic check are native expressions; a
  rejected row's payload is blanked so oversized/non-PDF bytes never
  cross the Arrow boundary
* exactly one ``mapInPandas`` (Arrow-batched; no per-row Python UDF)
* per-row error capture into status/error — a malformed PDF degrades
  that row, never the job
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ..core.pdfparse import PdfError, parse_pdf
from .gate import apply_gate, gate_errors

PDF_SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),
    ]
)

PDF_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(PDF_SPAN_TYPE)),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("n_headings", IntegerType()),
        StructField("n_text", IntegerType()),
        StructField("n_images", IntegerType()),
        StructField("n_chars", IntegerType()),
    ]
)

_MAGIC = "255044462D"  # b"%PDF-"


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in PDF_SCHEMA.fields}
        gate_errs = gate_errors(pdf)
        for rownum, (doc_id, payload) in enumerate(
            zip(pdf["doc_id"], pdf["payload"])
        ):
            gate_err = gate_errs[rownum]
            spans: list[dict] = []
            if gate_err is not None:
                status, error = "constraint_error", gate_err
            else:
                try:
                    spans = parse_pdf(bytes(payload))
                    status, error = "ok", ""
                except PdfError as e:
                    status, error = "parse_error", str(e)
                except Exception as e:  # noqa: BLE001 - row-level resilience
                    status, error = (
                        "parse_error", f"{type(e).__name__}: {e}",
                    )
            out["doc_id"].append(doc_id)
            out["spans"].append(spans)
            out["status"].append(status)
            out["error"].append(error)
            out["n_headings"].append(
                sum(1 for s in spans if s["kind"] == "heading")
            )
            out["n_text"].append(sum(1 for s in spans if s["kind"] == "text"))
            out["n_images"].append(
                sum(1 for s in spans if s["kind"] == "image")
            )
            out["n_chars"].append(
                sum(len(s["text"] or "") for s in spans)
            )
        yield pd.DataFrame(out)


def parse_pdf_documents(
    pdfs: DataFrame,
    *,
    max_pdf_size: int = 16 * 1024 * 1024,
    num_partitions: int | None = None,
) -> DataFrame:
    """Parse a (doc_id, payload binary) table into layout spans.

    Single-pass JVM gate (size + magic) -> one mapInPandas.  At 100 TB
    the gate matters twice: Catalyst cannot push predicates through the
    Python stage, and blanking rejected payloads JVM-side keeps dead
    bytes off the Arrow channel entirely.
    """
    magic_ok = F.expr(f"substring(payload, 1, 5) = X'{_MAGIC}'")
    too_big = F.length("payload") > F.lit(max_pdf_size)
    # a NULL payload must be gated EXPLICITLY and FIRST: the other
    # predicates evaluate to NULL for it (skipped branches), so without
    # this condition it slipped through un-blanked and surfaced as a
    # misleading Python-side parse_error
    is_null = F.col("payload").isNull()
    gated = apply_gate(
        pdfs.select("doc_id", "payload"),  # prune before Arrow
        [
            (is_null, "payload missing"),
            (
                too_big,
                F.concat(
                    F.lit("pdf larger than "),
                    F.lit(max_pdf_size).cast("string"),
                    F.lit(" bytes"),
                ),
            ),
            (~magic_ok, "not a PDF (missing %PDF- magic)"),
        ],
        {"payload": F.lit(b"")},
    )
    if num_partitions:
        gated = gated.repartition(num_partitions, "doc_id")
    return gated.mapInPandas(_parse_batches, PDF_SCHEMA)
