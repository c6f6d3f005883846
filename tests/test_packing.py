"""Sequence packing + context-window chunking operator tests."""

from pyspark.sql import functions as F

from helix_html2md_spark.operators.packing import (
    chunk_documents, pack_sequences,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )


def test_pack_sequences_greedy_cumsum(spark):
    # 3 docs of 4, 5, 8 tokens; seq_len=8 -> starts 0, 4, 9
    docs = _docs(spark, ["a b c d", "e f g h i", "j k l m n o p q"])
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, seq_len=8).collect()
    }
    assert (out["d000"]["pack_id"], out["d000"]["offset_in_pack"]) == (0, 0)
    assert (out["d001"]["pack_id"], out["d001"]["offset_in_pack"]) == (0, 4)
    assert (out["d002"]["pack_id"], out["d002"]["offset_in_pack"]) == (1, 1)
    assert out["d002"]["n_tokens"] == 8


def test_pack_sequences_duplicate_doc_ids_get_disjoint_slots(spark):
    """The cumsum windows pin a ROWS frame: under the default RANGE
    frame, rows sharing a doc_id are peers and each receives the full
    peer sum — both duplicates would start at the same offset while
    their first slot went unfilled."""
    from helix_html2md_spark.operators.dedup import release_persisted

    docs = spark.createDataFrame(
        [("d", "a b"), ("d", "c d"), ("e", "x")],
        "doc_id string, text string",
    )
    for kwargs in ({}, {"partition_by_shard": True, "n_shards": 1}):
        rows = pack_sequences(docs, seq_len=8, **kwargs).collect()
        release_persisted()
        slots = sorted(
            (r["pack_id"], r["offset_in_pack"])
            for r in rows
            if r["doc_id"] == "d"
        )
        assert slots == [(0, 0), (0, 2)], kwargs


def test_chunk_documents_contained_tail_not_emitted(spark):
    """A tail shorter than the overlap is a strict subset of the
    previous chunk and must not emit — but a tail that reaches past the
    previous chunk's end must."""
    # chunk 4, overlap 2, stride 2
    out = chunk_documents(
        _docs(spark, [" ".join(f"t{i}" for i in range(5))]),
        chunk_tokens=4,
        overlap=2,
    ).collect()
    # n=5: chunk at 2 covers [2,5) which adds token 4 -> emitted
    assert sorted((r["start_tok"], r["end_tok"]) for r in out) == [
        (0, 4), (2, 5),
    ]
    # n=4: chunk at 2 would cover [2,4) ⊂ [0,4) -> suppressed
    out4 = chunk_documents(
        _docs(spark, ["t0 t1 t2 t3"]), chunk_tokens=4, overlap=2
    ).collect()
    assert [(r["start_tok"], r["end_tok"]) for r in out4] == [(0, 4)]


def test_chunk_documents_rejects_negative_overlap(spark):
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, ["a b"]), chunk_tokens=4, overlap=-1)


def test_pack_sequences_sharded_is_deterministic(spark):
    docs = _docs(spark, ["w x y z"] * 20)
    a = pack_sequences(docs, seq_len=8, partition_by_shard=True).collect()
    b = pack_sequences(docs, seq_len=8, partition_by_shard=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every doc is packed exactly once
    assert len(a) == 20


def test_chunk_documents_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = _docs(spark, [text])
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 2: starts 0,2,4,6 — a start at 8 would chunk [8,10), a
    # strict subset of [6,10), so the contained tail must not emit
    assert [(r["start_tok"], r["end_tok"]) for r in out] == [
        (0, 4), (2, 6), (4, 8), (6, 10),
    ]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[-1]["chunk_text"] == "t6 t7 t8 t9"
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]


def test_chunk_documents_short_and_empty(spark):
    docs = _docs(spark, ["only two", "   "])
    out = chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    assert len(out) == 1  # empty doc emits no chunks
    assert out[0]["chunk_text"] == "only two"
    assert (out[0]["start_tok"], out[0]["end_tok"]) == (0, 2)


def test_plans_are_pure_jvm(spark):
    """Both operators must stay inside codegen: no Python eval nodes,
    and packing has exactly one window exchange."""
    docs = _docs(spark, ["a b c"] * 4)
    for df in (
        pack_sequences(docs, seq_len=8),
        chunk_documents(docs, chunk_tokens=4, overlap=1),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "MapInPandas" not in plan


def test_pack_sequences_null_text_docs(spark):
    """Null-text docs (failed extraction) take 0-token slots instead of
    nulling their pack assignment or crashing the offset fold when a
    whole range partition is null-text."""
    from helix_html2md_spark.operators.dedup import release_persisted
    from helix_html2md_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [("d0", None), ("d1", None), ("d2", "one two three")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    release_persisted()
    assert len(rows) == 3
    assert rows["d0"]["n_tokens"] == 0 and rows["d0"]["pack_id"] == 0
    assert rows["d2"]["pack_id"] == 0 and rows["d2"]["offset_in_pack"] == 0


def test_pack_sequences_validates_params(spark):
    """seq_len<=0 must fail at call time with ValueError, not mid-job
    as DIVIDE_BY_ZERO (ANSI on) or all-NULL packs (ANSI off)."""
    import pytest

    docs = _docs(spark, ["a b c"])
    for kwargs in (
        {"seq_len": 0},
        {"seq_len": -3},
        {"seq_len": 8, "partition_by_shard": True, "n_shards": 0},
        {"seq_len": 8, "num_partitions": 0},
    ):
        with pytest.raises(ValueError):
            pack_sequences(docs, **kwargs)


def test_chunk_and_pack_coverage_invariants(spark):
    """Seeded-random property sweep (one Spark job per parameter set,
    differential-fuzz style):

    chunk_documents — per doc: contiguous chunk_idx, start = idx*stride,
    end = min(start+chunk, n), strictly increasing ends (no contained
    chunks), and exact token coverage (union of [start,end) == [0,n)).

    pack_sequences — global contiguity: ordered by (pack_id, offset),
    every document starts exactly where the previous one's tokens end
    (pack_id*seq_len + offset is the exact running token sum)."""
    import random

    from helix_html2md_spark.operators.dedup import release_persisted

    rng = random.Random(7)
    docs = [
        (f"d{i:04d}", " ".join(f"w{j}" for j in range(rng.randint(0, 50))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    n_by_doc = {d: len(t.split()) for d, t in docs}

    for chunk, ov in [(4, 2), (5, 0), (8, 7), (16, 4)]:
        stride = chunk - ov
        rows = chunk_documents(df, chunk_tokens=chunk, overlap=ov).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for d, n in n_by_doc.items():
            got = sorted(by_doc.get(d, []), key=lambda r: r["chunk_idx"])
            if n == 0:
                assert not got, d
                continue
            assert [r["chunk_idx"] for r in got] == list(range(len(got)))
            prev_end = 0
            for r in got:
                assert r["start_tok"] == r["chunk_idx"] * stride
                assert r["end_tok"] == min(r["start_tok"] + chunk, n)
                assert r["start_tok"] <= prev_end  # no coverage gap
                assert r["end_tok"] > prev_end  # no contained chunk
                prev_end = r["end_tok"]
            assert prev_end == n, (d, chunk, ov)  # full coverage

    for seq_len in (1, 8, 64):
        rows = pack_sequences(df, seq_len=seq_len).collect()
        release_persisted()
        assert len(rows) == len(docs)
        ordered = sorted(
            rows, key=lambda r: (r["pack_id"], r["offset_in_pack"], r["doc_id"])
        )
        acc = 0
        for r in ordered:
            assert r["pack_id"] * seq_len + r["offset_in_pack"] == acc, (
                seq_len, r,
            )
            acc += r["n_tokens"]
        assert acc == sum(n_by_doc.values())
