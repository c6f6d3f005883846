"""Boilerplate-strip operator: (doc_id, html) -> main-content selection.

Wraps core/boilerplate.strip_boilerplate (Arc90-readability-style
text/link-density scoring) in the same Spark shape as the HTML and PDF
extraction operators: a single-pass JVM admission gate below one
Arrow-batched mapInPandas, with per-row error capture.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

from ..core.boilerplate import strip_boilerplate
from .gate import apply_gate, gate_errors

BOILER_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("content_tag", StringType()),
        StructField("content_text", StringType()),
        StructField("text_len", IntegerType()),
        StructField("link_density", DoubleType()),
        StructField("n_paras", IntegerType()),
        StructField("score", IntegerType()),
    ]
)


def _strip_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in BOILER_SCHEMA.fields}
        gate_errs = gate_errors(pdf)
        for rownum, (doc_id, html) in enumerate(
            zip(pdf["doc_id"], pdf["html"])
        ):
            gate_err = gate_errs[rownum]
            if gate_err is not None:
                row = {
                    "status": "constraint_error", "error": gate_err,
                    "content_tag": None, "content_text": "",
                    "text_len": 0, "link_density": 0.0, "n_paras": 0,
                    "score": 0,
                }
            else:
                try:
                    row = strip_boilerplate(html or "")
                    row["error"] = ""
                except Exception as e:  # noqa: BLE001 - row resilience
                    row = {
                        "status": "parse_error",
                        "error": f"{type(e).__name__}: {e}",
                        "content_tag": None, "content_text": "",
                        "text_len": 0, "link_density": 0.0, "n_paras": 0,
                        "score": 0,
                    }
            out["doc_id"].append(doc_id)
            for k in (
                "status", "error", "content_tag", "content_text",
                "text_len", "link_density", "n_paras", "score",
            ):
                out[k].append(row[k])
        yield pd.DataFrame(out)


def strip_boilerplate_documents(
    docs: DataFrame,
    *,
    max_html_size: int = 4 * 1024 * 1024,
    num_partitions: int | None = None,
) -> DataFrame:
    """Strip boilerplate from a (doc_id, html) table.

    Single-pass JVM size gate (oversized html is blanked before the
    Arrow crossing) -> one mapInPandas.
    """
    # octet_length: the budget bounds Python-worker/Arrow batch MEMORY,
    # so it is a byte limit (F.length counts characters — a multibyte
    # CJK page would cross at up to 4x the stated budget)
    too_big = F.octet_length("html") > F.lit(max_html_size)
    gated = apply_gate(
        docs.select("doc_id", "html"),  # prune before the Arrow crossing
        [(
            too_big,
            F.concat(
                F.lit("html larger than "),
                F.lit(max_html_size).cast("string"),
                F.lit(" bytes"),
            ),
        )],
        {"html": F.lit("")},
    )
    if num_partitions:
        gated = gated.repartition(num_partitions, "doc_id")
    return gated.mapInPandas(_strip_batches, BOILER_SCHEMA)
