"""End-to-end training-data pipeline composition at sf0.001:

    language gate (langid) -> quality gate (gopher) ->
    exact-substring window dedup -> benchmark decontamination ->
    LM-perplexity gate (CCNet bigram) -> DSIR selection toward a
    target -> BPE tokenize to ids -> sequence packing.

Each stage is individually oracled elsewhere; this test pins that the
stages COMPOSE — schemas line up, every stage's monotone-shrink
invariant holds, the final pack assignment covers exactly the
surviving documents, and the whole chain stays inside the engine
(one collect at the very end)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from helix_html2md_spark.functions.langid import filter_language
from helix_html2md_spark.operators.corpus import gopher_filter
from helix_html2md_spark.operators.lm import (
    logprob_scores, select_by_logprob, train_bigram_lm,
)
from helix_html2md_spark.operators.dedup import (
    decontaminate, drop_dup_window_docs, release_persisted,
)
from helix_html2md_spark.operators.dsir import (
    dsir_log_ratios, dsir_select_frac,
)
from helix_html2md_spark.operators.packing import pack_sequences
from helix_html2md_spark.operators.tokenizer import (
    bpe_encode, bpe_vocab, corpus_alphabet, train_bpe,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_full_training_pipeline(spark):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # salt the pool with non-English docs the language gate must drop
    foreign = spark.createDataFrame(
        [
            (90001, "le chat est dans la maison des voisins pour la "
                    "nuit et les enfants ne sont pas dans le jardin",
             "fr", "srcX", 0),
            (90002, "这是一个中文文档用来测试语言识别的门槛", "zh", "srcX", 0),
        ],
        base.schema,
    )
    pool = base.unionByName(foreign)
    n0 = pool.count()
    try:
        # 0. language gate: monolingual corpus — keep en (plus 'und'
        # for marker-less soup docs the later gates judge on merit).
        # localCheckpoint = the macro-stage boundary a real pipeline
        # puts here anyway: eight more stages compose on top, and
        # without truncating the lineage the accumulated plan TEXT
        # (rendered by AQE on every update) grows past the driver heap
        docs = filter_language(pool, keep=("en", "und")).localCheckpoint()
        n_lang = docs.count()
        assert n_lang == n0 - 2  # exactly the salted foreign docs drop

        # 1. quality gate
        verdicts = gopher_filter(docs)
        kept_ids = verdicts.filter("keep").select("doc_id")
        stage1 = docs.join(kept_ids, "doc_id", "left_semi")
        n1 = stage1.count()
        assert 0 < n1 <= n_lang

        # 2. exact-substring window dedup (w=20, drop heavy overlap)
        stage2 = drop_dup_window_docs(stage1, window=20, max_dup_ppm=500_000)
        n2 = stage2.count()
        assert 0 < n2 <= n1

        # 3. decontaminate against a "benchmark" cut from held-out docs
        bench = docs.filter("doc_id >= 490").selectExpr(
            "doc_id", "substr(text, 1, 120) AS text"
        )
        # precondition: contaminated docs actually reached this stage
        # (otherwise the zero-survivors check below passes vacuously
        # even when decontaminate is a no-op)
        assert stage2.filter("doc_id >= 490").count() > 0
        stage3 = decontaminate(stage2, bench, n=13)
        n3 = stage3.count()
        assert 0 < n3 <= n2
        # the self-contaminated held-out docs that survived stages 1-2
        # must be gone now
        assert stage3.filter("doc_id >= 490").count() == 0

        # 3b. LM-perplexity gate (CCNet shape): score against a
        # reference LM trained on src0 and keep the head
        lm = train_bigram_lm(docs.filter("source = 'src0'"))
        scores = logprob_scores(stage3, lm)
        thresh = scores.agg(
            F.expr("percentile_approx(avg_logp_milli, 0.25)")
        ).collect()[0][0]
        stage3b = select_by_logprob(stage3, scores, int(thresh))
        n3b = stage3b.count()
        assert 0 < n3b <= n3

        # 4. DSIR: keep the half most src0-like
        ratios = dsir_log_ratios(
            stage3b, docs.filter("source = 'src0'"), n=2, buckets=512
        )
        stage4 = dsir_select_frac(stage3b, ratios, keep_frac=0.5)
        n4 = stage4.count()
        assert 0 < n4 <= n3b

        # 5. tokenize to trainer ids
        merges = train_bpe(stage4, num_merges=128)
        vocab = bpe_vocab(corpus_alphabet(stage4), merges)
        toks = bpe_encode(stage4, merges, vocab=vocab)
        tok_rows = toks.count()
        assert tok_rows == n4
        # training-corpus vocabulary closure: zero unknown ids
        assert toks.agg(F.sum("n_unk")).collect()[0][0] == 0

        # 6. pack into 512-token sequences (whitespace token budget —
        # pack_sequences' own unit; the ids stream rides along by id)
        packed = pack_sequences(stage4, seq_len=512)
        rows = packed.select(
            "doc_id", "pack_id", "offset_in_pack"
        ).collect()  # materialize BEFORE release (lifetime contract)
        assert len(rows) == n4
        assert {r["doc_id"] for r in rows} == {
            r["doc_id"] for r in stage4.select("doc_id").collect()
        }
        assert all(
            0 <= r["offset_in_pack"] < 512 and r["pack_id"] >= 0
            for r in rows
        )
    finally:
        release_persisted()
