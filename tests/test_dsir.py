"""DSIR importance scoring (operators/dsir.py).

Layers: an INDEPENDENT Python re-derivation of buckets/histograms/
scores (hashlib md5, no Spark expressions), a row-for-row DuckDB
differential at sf0.001 feeding both engines the same quantized ratio
literals, select semantics, and the zero-shuffle/zero-Python plan
assertion."""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from helix_html2md_spark.functions.text import SQL_TOKENS
from helix_html2md_spark.operators.dsir import (
    dsir_log_ratios, dsir_scores, dsir_select, ngram_bucket_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
B = 64


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _py_grams(text: str, n: int = 2) -> list[str]:
    toks = text.split()
    return [
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    ]


RAW = [
    (1, "the cat sat on the mat"),
    (2, "dogs bark loudly at night"),
    (3, "the cat ran"),
    (4, ""),
    (5, None),
]
TGT = [(10, "the cat sat"), (11, "the cat ran fast")]


def _py_hist(rows, n=2):
    h: dict[int, int] = {}
    for _id, t in rows:
        for g in _py_grams(t or "", n):
            b = _py_bucket(g)
            h[b] = h.get(b, 0) + 1
    return h, sum(h.values())


def _py_ratios(n=2):
    rh, rtot = _py_hist(RAW, n)
    th, ttot = _py_hist(TGT, n)
    return [
        round(1000.0 * (math.log((th.get(b, 0) + 1) / (ttot + B))
                        - math.log((rh.get(b, 0) + 1) / (rtot + B))))
        for b in range(B)
    ]


def test_histogram_vs_python(spark):
    docs = spark.createDataFrame(RAW, "doc_id long, text string")
    got = {
        r["bucket"]: r["cnt"]
        for r in ngram_bucket_counts(docs, n=2, buckets=B).collect()
    }
    want, _tot = _py_hist(RAW)
    assert got == want and sum(got.values()) > 0


def test_ratios_and_scores_vs_python(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    ratios = dsir_log_ratios(raw, tgt, n=2, buckets=B)
    assert ratios == _py_ratios()
    got = {
        r["doc_id"]: (r["n_grams"], r["score_milli"], r["avg_milli"])
        for r in dsir_scores(raw, ratios, n=2).collect()
    }
    for doc_id, text in RAW:
        grams = _py_grams(text or "")
        s = sum(ratios[_py_bucket(g)] for g in grams)
        # Spark's `div` (and DuckDB's `//`) truncate toward zero on
        # bigints; Python's // floors — mirror truncation explicitly
        q = abs(s) // len(grams) if grams else 0
        a = q if s >= 0 else -q
        assert got[doc_id] == (len(grams), s, a), (doc_id, got[doc_id])
    assert set(got) == {1, 2, 3, 4, 5}
    # target-like docs outscore off-target docs per gram
    assert got[1][2] > got[2][2] and got[3][2] > got[2][2]
    with pytest.raises(ValueError):
        dsir_scores(raw, [])


def test_dsir_select(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    ratios = dsir_log_ratios(raw, tgt, n=2, buckets=B)
    # hand-derived avg_milli: doc1 -332, doc2 -610, doc3 +83, 4/5 = 0
    kept = dsir_select(raw, ratios, min_avg_milli=-500)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5]     # only the most off-target doc drops
    assert kept.columns == raw.columns
    tight = dsir_select(raw, ratios, min_avg_milli=1)
    assert sorted(r["doc_id"] for r in tight.collect()) == [3]
    # gramless docs (0) drop once the threshold is positive ^
    # threshold <= 0 keeps gramless docs by contract
    all_kept = dsir_select(raw, ratios, min_avg_milli=-10**9)
    assert all_kept.count() == len(RAW)


def test_dsir_select_frac(spark):
    from helix_html2md_spark.operators.dedup import release_persisted
    from helix_html2md_spark.operators.dsir import dsir_select_frac

    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    ratios = dsir_log_ratios(raw, tgt, n=2, buckets=B)
    # avg_milli by doc: 1 -> -332, 2 -> -610, 3 -> 83, 4/5 -> 0.
    # nearest-rank: frac .2 of 5 -> k=1 -> threshold 83 -> {3};
    # frac .6 -> k=3 -> third-largest is 0, TIED with doc 5 -> both
    # zeros kept -> {3,4,5}; frac 1.0 keeps everything.
    try:
        got1 = sorted(
            r["doc_id"]
            for r in dsir_select_frac(raw, ratios, 0.2).collect()
        )
        got3 = sorted(
            r["doc_id"]
            for r in dsir_select_frac(raw, ratios, 0.6).collect()
        )
        gotall = dsir_select_frac(raw, ratios, 1.0).count()
    finally:
        release_persisted()
    assert got1 == [3]
    assert got3 == [3, 4, 5]
    assert gotall == 5
    with pytest.raises(ValueError):
        dsir_select_frac(raw, ratios, 0.0)


def test_ceil_frac_exact():
    from helix_html2md_spark.operators.dsir import _ceil_frac

    # 0.07 * 100 = 7.000000000000001 in doubles — float ceil gives 8;
    # the exact integer rank must be 7
    assert _ceil_frac(0.07, 100) == 7
    assert _ceil_frac(0.2, 5) == 1
    assert _ceil_frac(0.6, 5) == 3
    assert _ceil_frac(1.0, 1234) == 1234
    assert _ceil_frac(0.001, 1) == 1
    assert _ceil_frac(1 / 3, 3) == 1
    # the OTHER float direction: a round-to-1e-9 snap overshoots
    # non-terminating fractions (2/3*1e9 rounds up), giving one extra
    # rank — the truncating snap must keep ceil(2/3 of 3) at 2
    assert _ceil_frac(2 / 3, 3) == 2
    assert _ceil_frac(0.3, 10) == 3
    assert _ceil_frac(0.25, 9) == 3  # genuine ceil: 2.25 -> 3


def test_dsir_scores_validates_n(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_scores(raw, [1] * B, n=0)


def test_dsir_vs_duckdb(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    tgt = docs.filter("doc_id < 20")
    ratios = dsir_log_ratios(docs, tgt, n=2, buckets=256)
    got = {
        r["doc_id"]: (r["n_grams"], r["score_milli"], r["avg_milli"])
        for r in dsir_scores(docs, ratios, n=2).collect()
    }
    toks = SQL_TOKENS.format(c="text")
    lut = "list_value(" + ", ".join(str(v) for v in ratios) + ")"
    con = duckdb.connect()
    sql = f"""
    WITH t AS (
      SELECT doc_id, {toks} AS toks
      FROM read_parquet('{SF_DIR}/documents.parquet')),
    g AS (
      SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        THEN list_transform(range(1, len(toks)),
             i -> array_to_string(toks[i:i+1], ' '))
        ELSE [] END) AS gram FROM t),
    s AS (
      SELECT doc_id, count(*) AS n_grams,
             sum({lut}[
               (('0x' || substr(md5(gram), 1, 8))::bigint % 256) + 1
             ]) AS score
      FROM g GROUP BY doc_id)
    SELECT t.doc_id, coalesce(s.n_grams, 0),
           cast(coalesce(s.score, 0) AS bigint),
           CASE WHEN coalesce(s.n_grams, 0) = 0 THEN 0
                ELSE cast(coalesce(s.score, 0) AS bigint)
                     // s.n_grams END
    FROM t LEFT JOIN s USING (doc_id)
    """
    # DuckDB's // truncates toward zero on integers exactly like
    # Spark's div (both checked on -7/2), so compare verbatim
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == want
    assert len(got) == 500


def test_dsir_plan_zero_shuffle(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = (
        dsir_scores(docs, [1] * 64, n=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan       # scoring is a pure per-row fold
    assert "PythonEval" not in plan and "MapInPandas" not in plan


def test_dsir_scores_streaming(spark, tmp_path):
    """The scoring fold is stateless per-row, so the same expression
    runs unchanged under Structured Streaming (availableNow file
    source -> score -> filter -> parquet sink) and produces row-for-row
    the batch result — the 'score an arriving shard' serving shape."""
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    ratios = dsir_log_ratios(raw, tgt, n=2, buckets=B)
    batch = {
        r["doc_id"]: (r["n_grams"], r["score_milli"], r["avg_milli"])
        for r in dsir_scores(raw, ratios, n=2).collect()
    }
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    raw.write.mode("append").parquet(inp)
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(inp)
    q = (
        dsir_scores(stream, ratios, n=2)
        .filter(F.col("avg_milli") >= -500)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_grams"], r["score_milli"], r["avg_milli"])
        for r in spark.read.parquet(out).collect()
    }
    want = {k: v for k, v in batch.items() if v[2] >= -500}
    assert got == want and sorted(got) == [1, 3, 4, 5]
