"""CCNet-style bigram-LM quality scoring: hand-computed expectations,
full-stack DuckDB differential, selection semantics, plan checks."""

import math

import duckdb
import pytest

from helix_html2md_spark.functions.text import SQL_TOKENS
from helix_html2md_spark.operators.dedup import release_persisted
from helix_html2md_spark.operators.lm import (
    BigramLM, logprob_scores, select_by_logprob, train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_and_score_hand_computed(spark):
    ref = _docs(spark, [(1, "a b a"), (2, "b a")])
    lm = train_bigram_lm(ref)
    assert lm.vocab_size == 2
    big = {(r["prev"], r["w"]): r["c_bi"] for r in lm.bigrams.collect()}
    assert big == {("a", "b"): 1, ("b", "a"): 2}
    pre = {r["prev"]: r["c_prev"] for r in lm.prefixes.collect()}
    assert pre == {"a": 3, "b": 2}

    pool = _docs(
        spark,
        [(10, "a b a a"), (11, "z z"), (12, "a"), (13, None)],
    )
    out = {r["doc_id"]: r for r in logprob_scores(pool, lm).collect()}
    release_persisted()
    # milli-nats, Python's one ln + round: p(b|a)=2/5, p(a|b)=3/4,
    # p(a|a)=1/5, p(z|z)=1/2
    m = lambda p: round(1000.0 * math.log(p))
    assert out[10]["n_bigrams"] == 3
    assert out[10]["sum_logp_milli"] == m(0.4) + m(0.75) + m(0.2) == -2813
    assert out[10]["avg_logp_milli"] == -937  # -2813 div 3, trunc to zero
    assert out[11]["n_bigrams"] == 1
    assert out[11]["avg_logp_milli"] == m(0.5) == -693
    # single-token and NULL docs: one row each, unscoreable
    for d in (12, 13):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["avg_logp_milli"] is None
    assert len(out) == 4


def test_select_by_logprob_drops_tail_and_unscoreable(spark):
    ref = _docs(spark, [(1, "a b a"), (2, "b a")])
    lm = train_bigram_lm(ref)
    pool = _docs(spark, [(10, "a b a a"), (11, "z z"), (12, "a")])
    scores = logprob_scores(pool, lm)
    kept = {
        r["doc_id"]
        for r in select_by_logprob(pool, scores, -800).collect()
    }
    release_persisted()
    assert kept == {11}  # -693 clears; -937 and NULL do not


def test_validation(spark):
    ref = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="min_count"):
        train_bigram_lm(ref, min_count=0)
    lm = train_bigram_lm(ref)
    with pytest.raises(ValueError, match="alpha"):
        logprob_scores(_docs(spark, [(2, "a b")]), lm, alpha=0.0)
    with pytest.raises(ValueError, match="vocabulary"):
        logprob_scores(
            _docs(spark, [(2, "a b")]),
            BigramLM(lm.bigrams, lm.prefixes, 0),
        )


def test_duckdb_differential_full_stack(spark):
    """Train on one source's documents, score the whole sf0.001 table;
    DuckDB rebuilds the counts FROM SCRATCH (SQL_TOKENS bigrams, prefix
    counts, V) and scores with the same Python-built milli lookup — a
    count disagreement surfaces as a lookup miss (inner join) and a
    row/value mismatch."""
    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    ref = docs.filter("source = 'src0'")
    lm = train_bigram_lm(ref)
    scores = logprob_scores(docs, lm, alpha=1.0)
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["sum_logp_milli"], r["avg_logp_milli"]
        )
        for r in scores.collect()
    }
    release_persisted()

    # rebuild the identical lookup the Spark side used
    con = duckdb.connect()
    toks = SQL_TOKENS.format(c="text")
    con.sql(
        f"""
        CREATE TEMP TABLE ref_b AS
        WITH t AS (SELECT doc_id, {toks} AS toks FROM '{path}'
                   WHERE source = 'src0'),
        b AS (SELECT toks[i] AS prev, toks[i+1] AS w
              FROM t, unnest(range(1, len(toks))) AS u(i))
        SELECT prev, w, count(*)::bigint AS c_bi FROM b GROUP BY prev, w
        """
    )
    con.sql(
        f"""
        CREATE TEMP TABLE ref_p AS
        WITH t AS (SELECT {toks} AS toks FROM '{path}'
                   WHERE source = 'src0')
        SELECT tok AS prev, count(*)::bigint AS c_prev
        FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
        """
    )
    v = con.sql("SELECT count(*) FROM ref_p").fetchone()[0]
    assert v == lm.vocab_size
    import pandas as pd

    pairs = con.sql(
        f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM '{path}'),
        b AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS w
              FROM t, unnest(range(1, len(toks))) AS u(i))
        SELECT DISTINCT coalesce(c_bi, 0) AS cb, coalesce(c_prev, 0) AS cp
        FROM b LEFT JOIN ref_b USING (prev, w) LEFT JOIN ref_p USING (prev)
        """
    ).fetchall()
    lut = pd.DataFrame(
        [
            (cb, cp, round(1000.0 * math.log((cb + 1.0) / (cp + 1.0 * v))))
            for cb, cp in pairs
        ],
        columns=["cb", "cp", "milli"],
    )
    con.register("lut", lut)
    want_rows = con.sql(
        f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM '{path}'),
        b AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS w
              FROM t, unnest(range(1, len(toks))) AS u(i)),
        sc AS (SELECT doc_id, coalesce(c_bi, 0) AS cb,
                      coalesce(c_prev, 0) AS cp
               FROM b LEFT JOIN ref_b USING (prev, w)
                      LEFT JOIN ref_p USING (prev)),
        ag AS (SELECT doc_id, count(*)::bigint AS n,
                      sum(milli)::bigint AS s
               FROM sc JOIN lut USING (cb, cp) GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n, 0), s, s // n
        FROM (SELECT DISTINCT doc_id FROM '{path}') d
        LEFT JOIN ag USING (doc_id)
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in want_rows}
    assert got == want
    # sanity: the reference source scores best on average
    by_src = {}
    for r in spark.read.parquet(path).select("doc_id", "source").collect():
        a = got[r["doc_id"]][2]
        if a is not None:
            by_src.setdefault(r["source"], []).append(a)
    means = {s: sum(v) / len(v) for s, v in by_src.items()}
    assert max(means, key=means.get) == "src0"


def test_plan_stays_jvm_side(spark):
    ref = _docs(spark, [(1, "a b a")])
    lm = train_bigram_lm(ref)
    df = logprob_scores(_docs(spark, [(2, "a b")]), lm)
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # lut + LM ride broadcasts


def test_lm_save_load_scores_identically(spark, tmp_path):
    ref = _docs(spark, [(1, "a b a c a b"), (2, "b a c")])
    pool = _docs(spark, [(10, "a b a a"), (11, "c c b")])
    lm = train_bigram_lm(ref)
    lm_dir = str(tmp_path / "lm")
    from helix_html2md_spark.operators.lm import (
        load_bigram_lm, save_bigram_lm,
    )

    save_bigram_lm(lm, lm_dir)
    lm2 = load_bigram_lm(spark, lm_dir)
    assert lm2.vocab_size == lm.vocab_size
    a = {r["doc_id"]: tuple(r)[1:] for r in logprob_scores(pool, lm).collect()}
    release_persisted()
    b = {r["doc_id"]: tuple(r)[1:] for r in logprob_scores(pool, lm2).collect()}
    release_persisted()
    assert a == b


def test_logprob_buckets_head_middle_tail(spark):
    """Nearest-rank thresholds, ties bucket UP, NULL stays NULL; the
    reference-trained scores put reference-like docs in the head."""
    from helix_html2md_spark.operators.lm import logprob_buckets

    ref = _docs(spark, [(1, "a b a b a b c"), (2, "a b c a b")])
    pool = _docs(
        spark,
        [
            (10, "a b a b a b"),   # very reference-like
            (11, "a b c"),         # middling
            (12, "z z z z"),       # unseen everything
            (13, "x"),             # unscoreable
        ],
    )
    lm = train_bigram_lm(ref)
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in logprob_buckets(
            logprob_scores(pool, lm), cuts=(1 / 3, 2 / 3)
        ).collect()
    }
    release_persisted()
    assert out[10] == "head"
    assert out[11] == "middle"
    assert out[12] == "tail"
    assert out[13] is None
    # validation
    import pytest

    with pytest.raises(ValueError, match="cuts"):
        logprob_buckets(logprob_scores(pool, lm), cuts=(0.5, 0.4))
    release_persisted()


def test_logprob_buckets_matches_python_reference(spark):
    """Seeded sweep: bucket assignment must equal a brute-force
    nearest-rank reference (sort desc, head = first ceil(c0*n) ranks
    WITH ties bucketed up, middle through ceil(c1*n), tail the rest)
    across duplicate-heavy score sets and cut choices."""
    import math as _m
    import random

    from helix_html2md_spark.operators.lm import logprob_buckets

    rng = random.Random(3)
    for trial in range(6):
        n = rng.randint(1, 40)
        scores = [rng.choice([-3000, -1500, -900, -900, -400, -100])
                  for _ in range(n)]
        rows = [(i, 2, -1, a) for i, a in enumerate(scores)]
        rows.append((9999, 0, None, None))  # unscoreable rider
        df = spark.createDataFrame(
            rows,
            "doc_id long, n_bigrams long, sum_logp_milli long, "
            "avg_logp_milli long",
        )
        cuts = rng.choice([(1 / 3, 2 / 3), (0.25, 0.75), (0.5, 0.9)])
        got = {
            r["doc_id"]: r["ppl_bucket"]
            for r in logprob_buckets(df, cuts=cuts).collect()
        }
        from helix_html2md_spark.operators.dedup import release_persisted

        release_persisted()
        # python reference: thresholds are the scores at nearest ranks
        desc = sorted(scores, reverse=True)
        k0 = _m.ceil(round(cuts[0] * len(desc), 9))
        k1 = _m.ceil(round(cuts[1] * len(desc), 9))
        t_head, t_mid = desc[k0 - 1], desc[k1 - 1]
        for i, a in enumerate(scores):
            want = ("head" if a >= t_head
                    else "middle" if a >= t_mid else "tail")
            assert got[i] == want, (trial, cuts, a, t_head, t_mid)
        assert got[9999] is None
