"""Benchmark decontamination (operators/dedup.py::contamination_stats /
decontaminate).

Layers per the repo's oracle discipline: hand-computed interval unions
on constructed docs, a row-for-row DuckDB differential at sf0.001 with
a bench table cut from real document substrings, drop semantics, and
the plan-shape assertion (bench side broadcasts; no Python)."""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from helix_html2md_spark.functions.text import SQL_TOKENS
from helix_html2md_spark.operators.dedup import (
    contamination_stats, decontaminate, release_persisted,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_contamination_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # exactly ONE hit: bench gram "a b c" at pos 2 -> 3
            # contaminated tokens of 7 (pos0 'a b a' and pos1 'b a b'
            # do NOT collide)
            (1, "a b a b c x y"),
            (2, "clean text with no overlap at all"),
            (3, "a b"),   # shorter than n: no window, kept clean
            (4, ""),      # token-less
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "z z a b c q")], "doc_id long, text string"
    )
    try:
        out = {
            r["doc_id"]: (
                r["n_tokens"], r["contam_windows"],
                r["contam_tokens"], r["contam_ppm"],
            )
            for r in contamination_stats(docs, bench, n=3).collect()
        }
    finally:
        release_persisted()
    # doc 1 tokens: a b a b c x y -> 3-grams at pos0 'a b a', pos1
    # 'b a b', pos2 'a b c'(HIT), pos3 'b c x', pos4 'c x y'.
    # bench 3-grams include 'a b c' only as a hit candidate.
    assert out[1] == (7, 1, 3, 428571)  # (1e6*3) div 7
    assert out[2] == (7, 0, 0, 0)
    assert out[3] == (2, 0, 0, 0)
    assert out[4] == (0, 0, 0, 0)
    assert set(out) == {1, 2, 3, 4}


def test_contamination_overlap_union(spark):
    """Two overlapping hits must union, not double-count."""
    docs = spark.createDataFrame(
        [(1, "p q r s t u")], "doc_id long, text string"
    )
    # bench contains 'p q r' and 'r s t': hits at pos 0 and pos 2,
    # union [0,3) + [2,5) = 5 tokens
    bench = spark.createDataFrame(
        [(9, "p q r"), (10, "r s t")], "doc_id long, text string"
    )
    try:
        row = contamination_stats(docs, bench, n=3).collect()[0]
    finally:
        release_persisted()
    assert (row["contam_windows"], row["contam_tokens"]) == (2, 5)


def test_decontaminate_drop_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated content that stays in"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(7, "eval set contains quick brown fox jumps exactly")],
        "doc_id long, text string",
    )
    try:
        kept = {
            r["doc_id"] for r in decontaminate(docs, bench, n=4).collect()
        }
    finally:
        release_persisted()
    assert kept == {2}
    # full input row survives the semi-join
    try:
        cols = decontaminate(docs, bench, n=4).columns
    finally:
        release_persisted()
    assert cols == docs.columns


def test_contamination_vs_duckdb_and_plan(spark):
    """Differential over real sf0.001 text: the bench table is cut
    from substrings of a handful of documents, so both hit and miss
    outcomes are exercised."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    N = 8
    # bench = token windows lifted from 5 real docs (construction-time,
    # independent of the operator): tokens 10..30 of each
    sample = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select(
            "doc_id",
            F.array_join(
                F.slice(F.split(F.trim("text"), r"\s+"), 10, 21), " "
            ).alias("text"),
        )
        .limit(5)
    )
    bench = sample.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    bench_rows = bench.collect()
    assert any(len(r["text"].split()) >= N for r in bench_rows)

    out = contamination_stats(docs, bench, n=N)
    plan = out._jdf.queryExecution().executedPlan().toString()
    try:
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["contam_windows"],
                r["contam_tokens"], r["contam_ppm"],
            )
            for r in out.collect()
        }
    finally:
        release_persisted()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "Python" not in plan

    toks = SQL_TOKENS.format(c="text")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute("CREATE TABLE bench (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO bench VALUES (?, ?)",
        [(r["doc_id"], r["text"]) for r in bench_rows],
    )
    sql = f"""
    WITH t AS (SELECT doc_id, {toks} toks FROM docs),
    w AS (SELECT doc_id, (u).pos AS pos, (u).h AS h FROM (
       SELECT doc_id, unnest(CASE WHEN len(toks) >= {N}
         THEN list_transform(range(1, len(toks)-{N}+2),
              i -> struct_pack(pos := i-1,
                    h := md5(array_to_string(toks[i:i+{N}-1], ' '))))
         ELSE [] END) AS u FROM t)),
    bt AS (SELECT {toks} toks FROM bench),
    bh AS (SELECT DISTINCT unnest(CASE WHEN len(toks) >= {N}
             THEN list_transform(range(1, len(toks)-{N}+2),
                  i -> md5(array_to_string(toks[i:i+{N}-1], ' ')))
             ELSE [] END) AS h FROM bt),
    d AS (SELECT w.doc_id, w.pos FROM w JOIN bh USING (h)),
    u AS (SELECT doc_id, greatest(0, pos + {N} - greatest(coalesce(
            max(pos + {N}) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            pos), pos)) AS contrib
          FROM d),
    a AS (SELECT doc_id, count(*) AS cw,
            cast(sum(contrib) AS bigint) AS ct
          FROM u GROUP BY doc_id)
    SELECT t.doc_id, len(t.toks) AS n_tokens,
           coalesce(a.cw, 0), coalesce(a.ct, 0),
           (1000000 * coalesce(a.ct, 0)) // greatest(len(t.toks), 1)
    FROM t LEFT JOIN a USING (doc_id)
    """
    want = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert len(got) == len(want) == 500
    assert got == want
    hit = sum(1 for g in got.values() if g[1] > 0)
    assert 0 < hit < len(got), hit
