"""Rank-based unigram familiarity score (operators/corpus.py).

Three layers, per the repo's oracle discipline:
* construction-time expectations — ranks and integer metrics computed
  by hand on tiny documents, never derived from the operator;
* a full DuckDB differential at sf0.001 (500 docs) — all-integer
  output, so equality is exact row-for-row;
* plan shape — vocab joins as a broadcast, no Python in the plan.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from helix_html2md_spark.functions.text import SQL_TOKENS
from helix_html2md_spark.operators.corpus import (
    token_vocab, unigram_rank_stats,
)
from helix_html2md_spark.operators.dedup import release_persisted

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_vocab_ranks_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "b b b a a c"),
            (2, "a d"),
        ],
        "doc_id long, text string",
    )
    v = {r["token"]: (r["n"], r["rank"]) for r in token_vocab(docs).collect()}
    # counts: a=3 b=3 c=1 d=1; ties break token-ascending
    assert v == {"a": (3, 1), "b": (3, 2), "c": (1, 3), "d": (1, 4)}
    # k cuts AFTER ordering
    top2 = {r["token"]: r["rank"] for r in token_vocab(docs, k=2).collect()}
    assert top2 == {"a": 1, "b": 2}
    with pytest.raises(ValueError):
        token_vocab(docs, k=0)


def test_unigram_rank_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "b b b a a c"),
            (2, "a d"),
            (3, ""),          # token-less: zeros, row preserved
            (4, None),        # null text: zeros, row preserved
        ],
        "doc_id long, text string",
    )
    # vocab_size=2 -> vocab {a:1, b:2}; OOV rank = 3
    out = {
        r["doc_id"]: (
            r["n_tokens"], r["n_oov"], r["oov_ppm"], r["mean_rank_milli"]
        )
        for r in unigram_rank_stats(docs, vocab_size=2).collect()
    }
    release_persisted()
    # doc 1: tokens b,b,b,a,a,c -> ranks 2,2,2,1,1,3 sum=11, oov=1
    #   oov_ppm = 1000000*1 div 6 = 166666; mean = 1000*11 div 6 = 1833
    assert out[1] == (6, 1, 166666, 1833)
    # doc 2: a(1), d(OOV,3) sum=4 -> oov 500000, mean 2000
    assert out[2] == (2, 1, 500000, 2000)
    assert out[3] == (0, 0, 0, 0)
    assert out[4] == (0, 0, 0, 0)
    assert set(out) == {1, 2, 3, 4}  # one row per input doc


def test_unigram_rank_stats_vs_duckdb(spark):
    """Row-for-row differential against a from-scratch DuckDB
    transcription over the real sf0.001 corpus."""
    k = 256
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # dict-keyed (suite convention): the operator has no orderBy, so
    # an ordered-list compare would ride on scan order surviving the
    # joins — any plan change (AQE, SMJ fallback) would break a correct
    # operator
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_oov"], r["oov_ppm"], r["mean_rank_milli"]
        )
        for r in unigram_rank_stats(docs, vocab_size=k).collect()
    }
    release_persisted()
    toks = SQL_TOKENS.format(c="text")
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH d AS (SELECT doc_id, text
                   FROM read_parquet('{SF_DIR}/documents.parquet')),
        t AS (SELECT doc_id, {toks} toks FROM d),
        tok AS (SELECT doc_id, unnest(toks) token FROM t),
        c AS (SELECT token, count(*) n FROM tok GROUP BY 1),
        v AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) rank
              FROM c ORDER BY n DESC, token LIMIT {k}),
        p AS (SELECT doc_id,
                     count(*) AS n_tokens,
                     cast(sum(CASE WHEN v.rank IS NULL THEN 1 ELSE 0 END)
                          AS bigint) AS n_oov,
                     cast(sum(coalesce(v.rank, {k} + 1)) AS bigint)
                         AS sum_rank
              FROM tok LEFT JOIN v USING (token) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.n_oov, 0) AS n_oov,
               CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0
                    ELSE (1000000 * p.n_oov) // p.n_tokens END AS oov_ppm,
               CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0
                    ELSE (1000 * p.sum_rank) // p.n_tokens
               END AS mean_rank_milli
        FROM d LEFT JOIN p USING (doc_id)
        ORDER BY doc_id
        """
    ).fetchall()
    assert got == {r[0]: tuple(r[1:]) for r in want}
    assert len(got) == docs.count()


def test_unigram_rank_plan_shape(spark):
    """Vocab lands as a broadcast join; scoring is pure JVM."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = unigram_rank_stats(docs, vocab_size=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_unigram_rank_prebuilt_vocab(spark):
    """Serving mode: a pre-built vocabulary scores a DIFFERENT corpus
    (no vocab rebuild, no persist registration)."""
    ref = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the lazy dog the")],
        "doc_id long, text string",
    )
    vocab = token_vocab(ref, k=3)  # the(3):1, brown(1):2, dog(1):3
    target = spark.createDataFrame(
        [(7, "the zebra")], "doc_id long, text string"
    )
    row = unigram_rank_stats(target, vocab_size=3, vocab=vocab).collect()[0]
    # the -> rank 1; zebra OOV -> 4; mean = 1000*5 div 2 = 2500
    assert (row["n_tokens"], row["n_oov"], row["mean_rank_milli"]) == (
        2, 1, 2500,
    )
