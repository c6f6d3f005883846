"""PII detection/redaction (functions/pii.py).

The cross-engine differential feeds the IDENTICAL pattern strings to
DuckDB (RE2) and Spark (java.util.regex) — the module's whole contract
is that its patterns live in the intersection of the two engines, so
counts and redacted text must agree byte-for-byte.  DuckDB's
regexp_replace needs the explicit 'g' flag (Spark is global by
default) — a transcription that forgets it masks only the first match.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from helix_html2md_spark.functions.pii import (
    _PASSES,
    pii_stats,
    redact_pii,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

CASES = [
    ("email", "contact me at john.doe+spam@example.co.uk today", 1, 0, 0,
     "contact me at <EMAIL> today"),
    ("ip", "server at 192.168.0.1 and 999.999.999.999 responded", 0, 2, 0,
     "server at <IP> and <IP> responded"),
    ("phone_plain", "call 555-123-4567 now", 0, 0, 1,
     "call <PHONE> now"),
    ("phone_paren", "call (555) 123-4567 now", 0, 0, 1,
     "call <PHONE> now"),
    ("phone_intl", "call +1 (555) 123.4567 now", 0, 0, 1,
     "call <PHONE> now"),
    # ISO dates and year ranges must NOT be masked (4-2-2 / 4-4 shapes)
    ("date", "released 2024-01-15 and 1999-2024 era", 0, 0, 0,
     "released 2024-01-15 and 1999-2024 era"),
    # a longer digit run cannot anchor a phone match mid-way through
    ("longrun", "id 9876543-123-4567 is not a phone", 0, 0, 0,
     "id 9876543-123-4567 is not a phone"),
    ("mixed", "a@b.io or 10.0.0.7 or 555-123-4567", 1, 1, 1,
     "<EMAIL> or <IP> or <PHONE>"),
    ("clean", "no personal data in this sentence", 0, 0, 0,
     "no personal data in this sentence"),
    ("empty", "", 0, 0, 0, ""),
]


def test_construction_expectations(spark):
    df = spark.createDataFrame(
        [(n, t) for n, t, *_ in CASES], ["doc_id", "text"]
    )
    stats = {r["doc_id"]: r.asDict() for r in pii_stats(df).collect()}
    red = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    for name, _, ne, ni, np_, want in CASES:
        got = stats[name]
        assert (got["n_emails"], got["n_ipv4"], got["n_phones"]) == (
            ne, ni, np_), (name, got)
        assert got["has_pii"] == int(ne + ni + np_ > 0), name
        assert red[name] == want, (name, red[name])


def _duck_differential(con, table_expr):
    """Transcribe the progressive count+redact passes in DuckDB SQL
    using the module's own pattern strings."""
    cur = "text"
    count_cols = []
    for pattern, token, name in _PASSES:
        p = pattern.replace("'", "''")
        count_cols.append(
            f"len(regexp_extract_all({cur}, '{p}')) AS {name}"
        )
        cur = f"regexp_replace({cur}, '{p}', '{token}', 'g')"
    sql = f"""
        SELECT doc_id, {', '.join(count_cols)},
               md5({cur}) AS red_md5
        FROM {table_expr} ORDER BY doc_id
    """
    return {r[0]: r[1:] for r in con.execute(sql).fetchall()}


def _spark_rows(spark, df):
    from pyspark.sql import functions as F

    stats = pii_stats(df)
    red = redact_pii(df).select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("red_md5")
    )
    joined = stats.join(red, "doc_id")
    return {
        r["doc_id"]: (
            r["n_emails"], r["n_ipv4"], r["n_phones"], r["red_md5"]
        )
        for r in joined.collect()
    }


def test_duckdb_differential_constructed(spark):
    pdf = pd.DataFrame(
        [(n, t) for n, t, *_ in CASES], columns=["doc_id", "text"]
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = _duck_differential(con, "docs")
    got = _spark_rows(spark, spark.createDataFrame(pdf))
    assert len(got) == len(want) == len(CASES)
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])


def test_duckdb_differential_sf(spark):
    """Engine-parity over the real corpus text: even where counts are
    zero, the redacted-text md5 must agree on every row (a pattern that
    behaves differently in RE2 vs java.util.regex shows up here)."""
    path = os.path.join(SF_DIR, "documents.parquet")
    con = duckdb.connect()
    want = _duck_differential(
        con, f"(SELECT doc_id, text FROM read_parquet('{path}'))"
    )
    got = _spark_rows(
        spark, spark.read.parquet(path).select("doc_id", "text")
    )
    assert len(got) == len(want) == 500
    mism = [k for k in got if got[k] != want[k]]
    assert not mism, mism[:5]


def test_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([("d", "a@b.io")], ["doc_id", "text"])
    for out in (pii_stats(df), redact_pii(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # row-local: no shuffle at all


def test_null_text_counts_are_zero(spark):
    # size(regexp_extract_all(NULL)) is NULL — without the coalesce a
    # NULL-text row got NULL counts and a NULL has_pii, invisible to
    # both has_pii = 0 and has_pii = 1 filters
    df = spark.createDataFrame(
        [("a", None), ("b", "mail x@y.io")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (
        rows["a"]["n_emails"], rows["a"]["n_ipv4"],
        rows["a"]["n_phones"], rows["a"]["has_pii"],
    ) == (0, 0, 0, 0)
    assert rows["b"]["has_pii"] == 1
    # redaction keeps NULL text NULL (no fabricated empty string)
    red = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    assert red["a"] is None and red["b"] == "mail <EMAIL>"


def test_pii_stats_rejects_clashing_input_columns(spark):
    import pytest

    from helix_html2md_spark.functions.pii import pii_stats

    docs = spark.createDataFrame(
        [(1, "x", 0)], "doc_id long, text string, n_emails int"
    )
    with pytest.raises(ValueError, match="n_emails"):
        pii_stats(docs)
    # Spark resolves names case-insensitively by default: a
    # case-variant column collides at analysis time all the same
    docs2 = spark.createDataFrame(
        [(1, "x", 0)], "doc_id long, text string, N_Emails int"
    )
    with pytest.raises(ValueError, match="N_Emails"):
        pii_stats(docs2)
