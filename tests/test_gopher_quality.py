"""Gopher/MassiveText repetition + quality rules (operators/corpus.py).

Three layers, per the repo's oracle discipline:
* construction-time expectations — metrics computed by hand arithmetic
  on tiny documents, never derived from the operator;
* a full DuckDB differential at sf0.001 (500 docs) — the Spark output
  must match a from-scratch SQL transcription row-for-row (everything
  is integer, so equality is exact, no rounding protocol needed);
* plan shape — no Python in the plan (pure JVM expressions only).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from helix_html2md_spark.functions.text import SQL_TOKENS, STOPWORDS
from helix_html2md_spark.operators.corpus import (
    GOPHER_DUP5_MAX_PPM,
    GOPHER_MEAN_LEN_MILLI,
    GOPHER_MIN_STOP_DISTINCT,
    GOPHER_MIN_TOKENS,
    GOPHER_TOP2_MAX_PPM,
    gopher_filter,
    repetition_stats,
)
from helix_html2md_spark.operators.dedup import release_persisted

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _gram_sql(n: int) -> str:
    """DuckDB n-gram pipeline mirroring _ngrams + coverage()."""
    toks = SQL_TOKENS.format(c="text")
    return f"""
    WITH t AS (SELECT doc_id, {toks} toks, length(text) n_chars FROM docs),
    g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= {n}
           THEN list_transform(range(1, len(toks)-{n}+2),
                               i -> array_to_string(toks[i:i+{n}-1], ' '))
           ELSE []::VARCHAR[] END) gram FROM t),
    c AS (SELECT doc_id, gram, count(*) cnt FROM g GROUP BY 1, 2),
    a AS (SELECT doc_id,
           max(struct_pack(cnt := cnt, cov := cnt*length(gram))) top_s,
           sum(CASE WHEN cnt >= 2 THEN cnt*length(gram) ELSE 0 END) dup
          FROM c GROUP BY 1)
    SELECT t.doc_id,
           len(t.toks) AS n_tokens,
           t.n_chars,
           least(1000000,
                 (1000000 * coalesce((a.top_s).cov, 0))
                 // greatest(t.n_chars, 1)) AS top_gram_ppm,
           least(1000000,
                 (1000000 * coalesce(a.dup, 0))
                 // greatest(t.n_chars, 1)) AS dup_gram_ppm
    FROM t LEFT JOIN a USING (doc_id)
    """


def test_repetition_stats_construction_expectations(spark):
    rows = [
        ("d1", "a b a b a b a b"),
        ("d2", "the quick brown fox jumps over it"),
        ("d3", ""),
        ("d4", "x"),
        ("d5", "one two three four five one two three four five"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    try:
        r = {x["doc_id"]: x.asDict() for x in repetition_stats(df).collect()}
    finally:
        release_persisted()
    # d1: 8 toks, 15 chars; 2-grams 'a b' x4 (cov 12), 'b a' x3 (cov 9)
    assert r["d1"]["top_gram_ppm"] == (1_000_000 * 12) // 15
    # d1 5-grams: 4 grams, 'a b a b a'(9) x2? -> grams: positions 0..3:
    # 'a b a b a' x2 (cov 18), 'b a b a b' x2 (cov 18) -> dup 36/15 -> clamp
    assert r["d1"]["dup_gram_ppm"] == 1_000_000
    # d5: 47 chars; dup 5-gram 'one two three four five' x2 -> 46 chars
    assert r["d5"]["dup_gram_ppm"] == (1_000_000 * 46) // 47
    # d5 top 2-gram tie (cnt=2): max coverage wins -> 'three four' cov 20
    assert r["d5"]["top_gram_ppm"] == (1_000_000 * 20) // 47
    # short/empty docs: zero metrics, never negative-index grams
    assert r["d3"]["top_gram_ppm"] == 0 and r["d3"]["n_tokens"] == 0
    assert r["d4"]["top_gram_ppm"] == 0 and r["d4"]["dup_gram_ppm"] == 0
    assert r["d2"]["dup_gram_ppm"] == 0  # no repeated 5-gram


def test_repetition_stats_duckdb_differential(spark):
    """Row-for-row integer equality against a from-scratch DuckDB
    transcription over the real sf0.001 documents table."""
    path = os.path.join(SF_DIR, "documents.parquet")
    docs = spark.read.parquet(path).select("doc_id", "text")
    try:
        got = {
            x["doc_id"]: x.asDict()
            for x in repetition_stats(docs).collect()
        }
    finally:
        release_persisted()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT doc_id, text FROM read_parquet('{path}')"
    )
    top = {r[0]: r for r in con.execute(_gram_sql(2)).fetchall()}
    dup = {r[0]: r for r in con.execute(_gram_sql(5)).fetchall()}
    assert len(got) == len(top) == 500
    for doc_id, g in got.items():
        t, d = top[doc_id], dup[doc_id]
        assert (g["n_tokens"], g["n_chars"]) == (t[1], t[2]), doc_id
        assert g["top_gram_ppm"] == t[3], doc_id
        assert g["dup_gram_ppm"] == d[4], doc_id


def test_gopher_filter_duckdb_differential(spark):
    """keep/reason verdicts match a DuckDB transcription of the same
    integer rules (priority order included)."""
    path = os.path.join(SF_DIR, "documents.parquet")
    docs = spark.read.parquet(path).select("doc_id", "text")
    try:
        got = {
            x["doc_id"]: (x["keep"], x["reason"])
            for x in gopher_filter(docs).collect()
        }
    finally:
        release_persisted()

    toks = SQL_TOKENS.format(c="text")
    stop_list = "['" + "','".join(STOPWORDS) + "']"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT doc_id, text FROM read_parquet('{path}')"
    )
    verdict_sql = f"""
    WITH rep2 AS ({_gram_sql(2)}), rep5 AS ({_gram_sql(5)}),
    m AS (SELECT doc_id, {toks} toks FROM docs),
    q AS (SELECT doc_id,
            len(toks) n_tokens,
            (1000 * coalesce(list_sum(list_transform(toks, x -> length(x))), 0))
              // greatest(len(toks), 1) AS mean_len_milli,
            len(list_distinct(list_filter(toks,
              x -> list_contains({stop_list}, x)))) AS n_stop
          FROM m)
    SELECT q.doc_id,
      CASE
        WHEN q.n_tokens < {GOPHER_MIN_TOKENS} THEN 'too_few_tokens'
        WHEN q.n_tokens > 100000 THEN 'too_many_tokens'
        WHEN q.mean_len_milli < {GOPHER_MEAN_LEN_MILLI[0]}
          OR q.mean_len_milli > {GOPHER_MEAN_LEN_MILLI[1]}
          THEN 'mean_len_out_of_range'
        WHEN q.n_stop < {GOPHER_MIN_STOP_DISTINCT} THEN 'too_few_stopwords'
        WHEN rep2.top_gram_ppm > {GOPHER_TOP2_MAX_PPM}
          THEN 'top_ngram_repetition'
        WHEN rep5.dup_gram_ppm > {GOPHER_DUP5_MAX_PPM}
          THEN 'dup_ngram_repetition'
        ELSE '' END AS reason
    FROM q JOIN rep2 USING (doc_id) JOIN rep5 USING (doc_id)
    """
    want = {r[0]: r[1] for r in con.execute(verdict_sql).fetchall()}
    assert len(got) == len(want) == 500
    mismatches = [
        (d, got[d], want[d]) for d in got
        if got[d] != (want[d] == "", want[d])
    ]
    assert not mismatches, mismatches[:5]
    # the corpus must exercise BOTH outcomes or the differential is weak
    kept = sum(1 for k, _ in got.values() if k)
    assert 0 < kept < len(got), kept


def test_gopher_filter_rule_priority(spark):
    """A document failing several rules reports the FIRST in priority
    order; a clean long document is kept with reason ''."""
    # all-distinct words: > 40 tokens, stopwords present, mean length in
    # range, and NO repeated n-gram (a repeated block would rightly trip
    # the dup-5-gram rule — Gopher rejects templated text)
    good = ("the quick brown fox jumps over a lazy dog while many other "
            "animals watch from nearby fields and wonder about this "
            "strange daily ritual that has been repeating since early "
            "spring when farmers first noticed unusual patterns among "
            "local wildlife gathering near those old wooden fences "
            "every single morning before sunrise")
    rows = [
        ("short", "tiny doc"),                       # too_few_tokens first
        ("good", good),
        ("repeat", ("spam " * 60).strip()),          # passes count, fails
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    try:
        got = {
            x["doc_id"]: x.asDict() for x in gopher_filter(df).collect()
        }
    finally:
        release_persisted()
    assert got["short"]["reason"] == "too_few_tokens"
    assert got["good"]["keep"] and got["good"]["reason"] == ""
    # 'spam' x60: no stopwords at all -> that rule outranks repetition
    assert got["repeat"]["reason"] == "too_few_stopwords"
    assert not got["repeat"]["keep"]


def test_gopher_null_text_is_judged(spark):
    """NULL text (a failed extraction) must be DROPPED as
    too_few_tokens with zero metrics, not waved through: every rule
    condition on NULL metrics is NULL, F.when() falls through, and the
    pre-fix filter returned keep=true/reason='' for exactly the
    garbage doc it exists to drop.  repetition_stats shares the zeros
    contract."""
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    try:
        got = {
            r["doc_id"]: (r["keep"], r["reason"], r["n_tokens"])
            for r in gopher_filter(docs).collect()
        }
        rep = {
            r["doc_id"]: r["n_tokens"]
            for r in repetition_stats(docs).collect()
        }
    finally:
        release_persisted()
    assert got[1] == (False, "too_few_tokens", 0)
    assert got[2] == (False, "too_few_tokens", 0)
    assert rep == {1: 0, 2: 0}


def test_repetition_plan_is_pure_jvm(spark):
    """No Python evaluation in the plan: the metrics are built-in
    expressions only (ArrowEval/BatchEval nodes would mean a UDF
    sneaked in)."""
    docs = spark.createDataFrame(
        [("d", "a b c a b c")], ["doc_id", "text"]
    )
    try:
        plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    finally:
        release_persisted()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize("n", [1, 2, 5])
def test_ngrams_short_doc_guard(spark, n):
    """size < n must yield an empty gram array, not a descending
    sequence with negative slice indices."""
    from helix_html2md_spark.operators.corpus import _ngrams

    df = spark.createDataFrame([("s", "only two")], ["doc_id", "text"])
    from helix_html2md_spark.functions.text import tokens

    out = df.select(
        F.size(_ngrams(tokens(F.col("text")), n)).alias("k")
    ).collect()[0]["k"]
    assert out == max(0, 2 - n + 1)
