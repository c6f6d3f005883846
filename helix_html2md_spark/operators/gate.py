"""Shared JVM admission-gate plumbing.

Every Arrow-crossing operator (HTML extraction, PDF parse, boilerplate
strip) fronts its mapInPandas with the same two-sided pattern:

* JVM side — a chained ``when`` builds ``_gate_error`` (first matching
  rejection message wins) and the payload columns are BLANKED for
  rejected rows, so dead bytes never reach the Arrow channel and
  Catalyst keeps the whole gate inside codegen;
* batch side — the Python worker reads ``_gate_error`` back per row
  (absent column = ungated input; pandas may widen the all-NULL case
  to NaN) and emits the operator's constraint_error row instead of
  parsing.

This module is the ONE home of both halves ("one guard to maintain,
not two" — functions/text.py); the per-operator parts that genuinely
differ (conditions, messages, error-row schema) stay at the call sites.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def apply_gate(
    df: DataFrame,
    conditions: Iterable[tuple[Column, Column | str]],
    blank: dict[str, Column],
) -> DataFrame:
    """Stamp ``_gate_error`` and blank payload columns on rejection.

    ``conditions`` is an ORDERED list of (predicate, message): the first
    predicate that evaluates true supplies the row's message (a NULL
    predicate — e.g. ``length(NULL) > n`` — skips to the next branch,
    so a catch-the-NULL condition must come first if NULL payloads are
    to be gated explicitly).  ``blank`` maps each payload column to its
    blank value; blanking keys off ``_gate_error IS NOT NULL`` so the
    two sides can never disagree about which rows were rejected.
    """
    err = None
    for cond, msg in conditions:
        msg_col = F.lit(msg) if isinstance(msg, str) else msg
        err = F.when(cond, msg_col) if err is None else err.when(cond, msg_col)
    if err is None:
        raise ValueError("apply_gate needs at least one condition")
    df = df.withColumn("_gate_error", err)
    rejected = F.col("_gate_error").isNotNull()
    for name, blank_val in blank.items():
        df = df.withColumn(
            name, F.when(rejected, blank_val).otherwise(F.col(name))
        )
    return df


def gate_errors(pdf: pd.DataFrame) -> list:
    """Batch-side reader: one Optional[str] per row of ``pdf``.

    Handles the three shapes the gate column arrives in: absent
    entirely (operator fed an ungated frame — e.g. unit tests calling
    the batch fn directly), None, and NaN (pandas widens an all-NULL
    Arrow column to float64).  Read positionally, never via
    ``itertuples`` — it name-mangles leading-underscore columns.
    """
    if "_gate_error" not in pdf.columns:
        return [None] * len(pdf)
    out = []
    for e in pdf["_gate_error"].tolist():
        if e is None or (isinstance(e, float) and e != e):  # NaN
            out.append(None)
        else:
            out.append(str(e))
    return out
