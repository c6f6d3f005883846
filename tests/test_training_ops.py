"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "en", "b"),  # exact dup
        (3, "the quick brown fox leaps over the lazy dog", "en", "a"),  # near dup
        (4, "completely different content about spark tables", "en", "b"),
        (5, "", "de", "a"),
    ]
    return spark.createDataFrame(
        [
            {"doc_id": i, "text": t, "lang": lg, "source": s, "n_chars": len(t)}
            for i, t, lg, s in rows
        ]
    )


def test_exact_dedup(spark, docs):
    from helix_html2md_spark.operators.dedup import exact_dup_stats

    stats = {r["source"]: r for r in exact_dup_stats(docs).collect()}
    assert stats["a"]["n_docs"] == 3 and stats["a"]["n_unique"] == 3
    assert stats["b"]["n_docs"] == 2 and stats["b"]["n_unique"] == 2


def test_minhash_groups_exact_dups(spark, docs):
    from helix_html2md_spark.operators.dedup import minhash_dup_groups

    groups = minhash_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2  # docs 1 and 2 share all bands


def test_minhash_candidate_pairs(spark, docs):
    from helix_html2md_spark.operators.dedup import minhash_candidate_pairs

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs).collect()
    }
    assert (1, 2) in pairs  # exact dup always a candidate
    assert all(a < b for a, b in pairs)


def test_simhash_near_dups_close(spark, docs):
    from helix_html2md_spark.operators.dedup import simhash

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[1] == fp[2]
    d_near = bin((fp[1] ^ fp[3]) & (2**64 - 1)).count("1")
    d_far = bin((fp[1] ^ fp[4]) & (2**64 - 1)).count("1")
    assert d_near < d_far


def test_simhash_near_dup_pairs(spark, docs):
    """Hamming-join finds the exact/near dups, not the unrelated doc."""
    from helix_html2md_spark.operators.dedup import simhash_near_dup_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_distance=16).collect()
    }
    assert pairs[(1, 2)] == 0  # identical docs
    assert (1, 3) in pairs  # one-word edit within distance
    assert (1, 4) not in pairs and (4, 1) not in pairs


def test_candidate_pairs_heavy_bucket_capped(spark):
    """1k identical docs must produce O(n) star pairs, not O(n^2)."""
    from helix_html2md_spark.operators.dedup import minhash_candidate_pairs

    n = 1000
    dupes = spark.createDataFrame(
        [{"doc_id": i, "text": "same boilerplate text everywhere"} for i in range(n)]
    )
    pairs = minhash_candidate_pairs(dupes, max_bucket_size=64).collect()
    assert len(pairs) == n - 1  # star around min doc_id
    assert all(r["doc_a"] == 0 for r in pairs)


def test_jaccard_verified_pairs(spark, docs):
    from helix_html2md_spark.operators.dedup import jaccard_verified_pairs

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verified_pairs(docs, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0  # exact dup
    assert got[(1, 3)] == pytest.approx(7 / 9, abs=1e-6)  # one-word edit
    assert (1, 4) not in got


def test_dup_components_transitive(spark):
    from helix_html2md_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    comp = {r["doc_id"]: r["component"] for r in dup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_bpe_tokens_lossless(spark, docs):
    from helix_html2md_spark.functions.text import bpe_tokens
    from pyspark.sql import functions as F

    out = docs.select(
        "doc_id",
        "text",
        F.array_join(bpe_tokens(F.col("text")), "").alias("rejoined"),
        bpe_tokens(F.col("text")).alias("segs"),
    ).collect()
    for r in out:
        assert r["rejoined"] == r["text"], r["doc_id"]  # lossless segmentation
    one = spark.createDataFrame([("it's 42 foo-bar!",)], "text string")
    segs = one.select(bpe_tokens(F.col("text")).alias("s")).head()["s"]
    assert segs == ["it", "'s", " 42", " foo", "-", "bar", "!"]


def test_clean_corpus_gates_and_dedup(spark):
    from helix_html2md_spark.operators.pipeline import clean_corpus

    good = "the cat sat on the mat and it was a good day in the sun"
    rows = [
        (1, good),                      # keeper
        (2, good),                      # exact dup of 1 -> dropped
        (3, "short text"),              # too few tokens
        (4, " ".join(["uniqueword"] * 40)),  # unique_ratio too low, no stopwords
        (5, good + " extra words of the same flavor to stay distinct"),
    ]
    docs = spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in rows]
    )
    kept = sorted(r["doc_id"] for r in clean_corpus(docs).collect())
    assert kept == [1, 5]


def test_cosine_topk(spark):
    from helix_html2md_spark.operators.similarity import bucketed_topk, cosine_topk

    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0], "label": 0},
        {"vec_id": 1, "embedding": [0.9, 0.1, 0.0], "label": 0},
        {"vec_id": 2, "embedding": [0.0, 1.0, 0.0], "label": 1},
        {"vec_id": 3, "embedding": [-1.0, 0.0, 0.0], "label": 2},
    ]
    emb = spark.createDataFrame(rows)
    top = cosine_topk(emb.filter("vec_id != 0"), [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert top[0]["cosine"] > 0.99

    planes = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    btop = bucketed_topk(emb.filter("vec_id != 0"), [1.0, 0.0, 0.0], planes, k=2).collect()
    assert btop[0]["vec_id"] == 1  # same bucket as the query


def test_cosine_neardup_pairs(spark):
    from helix_html2md_spark.operators.similarity import (
        cosine_neardup_pairs, rademacher_planes,
    )

    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.01, 0.0], "label": 0},
        {"vec_id": 2, "embedding": [0.99, 0.01, 0.0, 0.0], "label": 0},  # ~dup of 1
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0, 0.0], "label": 1},  # orthogonal
        {"vec_id": 4, "embedding": [-1.0, 0.0, 0.0, 0.01], "label": 2},  # opposite
    ]
    emb = spark.createDataFrame(rows)
    # brute (no planes): exactly the >= threshold pairs
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] > 0.99
    # bucketed: near-dups share all sign bits, so (1,2) survives; the
    # opposite vector can never share a bucket with 1
    planes = rademacher_planes(2, 4)
    got_b = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs(emb, threshold=0.9, planes=planes).collect()
    }
    assert got_b == {(1, 2)}


def test_quality_features(spark, docs):
    from helix_html2md_spark.functions.text import quality_features

    q = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert q[1]["n_tokens"] == 9
    assert q[1]["stopword_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    assert q[5]["n_tokens"] == 0  # empty doc is safe


def test_multimodal_features(spark):
    from helix_html2md_spark.operators.multimodal import (
        extract_features, media_stats, synthetic_media,
    )

    media = synthetic_media(spark, 30)
    stats = {r["kind"]: r["n_items"] for r in media_stats(media).collect()}
    # kinds cycle i%3 — exact classification, not just a row-count sum
    assert stats == {"image": 10, "audio": 10, "video": 10}
    feats = extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id["m000000"]["feature"]) == 16
    # deterministic: same payload -> same feature
    feats2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert feats2 == {k: v["feature"] for k, v in by_id.items()}


def test_frame_sampling_deterministic(spark):
    from helix_html2md_spark.operators.multimodal import (
        sample_frames, synthetic_media,
    )

    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_ms=1000, max_frames=5).collect()
    videos = {r["media_id"] for r in frames}
    # kind cycles i%3 -> exactly 10 videos, each with duration
    # 1000 + i%9000 in [1002, 1029] ms -> exactly 2 sampled frames
    assert len(videos) == 10
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == [0, 1], (mid, idxs)
        assert len(rows) <= 5  # max_frames cap
        assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    # deterministic: same input -> same frame hashes
    again = {
        (r["media_id"], r["frame_idx"]): r["frame_sha1"]
        for r in sample_frames(media, every_ms=1000, max_frames=5).collect()
    }
    assert again == {
        (r["media_id"], r["frame_idx"]): r["frame_sha1"] for r in frames
    }


def test_resize_images(spark):
    from helix_html2md_spark.operators.multimodal import (
        resize_images, synthetic_media,
    )

    media = synthetic_media(spark, 30)
    resized = resize_images(media, out_w=8, out_h=8).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(resized) == n_images
    for r in resized:
        assert r["out_width"] == 8 and r["out_height"] == 8
        assert len(r["resized"]) == 64  # 8x8 uint8
    # deterministic
    again = {
        r["media_id"]: r["resized_sha1"]
        for r in resize_images(media, out_w=8, out_h=8).collect()
    }
    assert again == {r["media_id"]: r["resized_sha1"] for r in resized}


def test_resize_images_rgb_decoder_keeps_channels(spark):
    """An injected real-codec-shaped decoder — 3-D (h, w, 3) uint8 —
    must resample channel-planes intact (the old reshape(h, -1) fed
    interleaved R/G/B components to the sampler as if they were
    pixels) and normalize [0, 255] instead of wrapping modulo 256."""
    import numpy as np

    from helix_html2md_spark.operators.multimodal import (
        resize_images, synthetic_media,
    )

    def rgb_decoder(payload: bytes) -> np.ndarray:
        img = np.zeros((20, 24, 3), dtype=np.uint8)
        img[..., 0] = 10
        img[..., 1] = 128
        img[..., 2] = 250
        return img

    media = synthetic_media(spark, 12).filter("kind = 'image'")
    rows = resize_images(media, 4, 4, decoder=rgb_decoder).collect()
    assert rows and all(r["error"] is None for r in rows)
    for r in rows:
        px = np.frombuffer(r["resized"], dtype=np.uint8).reshape(4, 4, 3)
        assert (px[..., 0] == 10).all()
        assert (px[..., 1] == 128).all()
        assert (px[..., 2] == 250).all()


def test_audio_chunks_cap_and_negative_duration(spark):
    from helix_html2md_spark.operators.multimodal import audio_chunks

    media = spark.createDataFrame(
        [
            ("m1", "d1", "audio", b"", None, None, 2_147_483_647),
            ("m2", "d2", "audio", b"", None, None, -5),
            ("m3", "d3", "audio", b"", None, None, 7000),
        ],
        "media_id string, doc_id string, kind string, payload binary, "
        "width int, height int, duration_ms long",
    )
    rows = audio_chunks(media, chunk_ms=5000, max_chunks=16).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # corrupt 2^31-1 ms duration: fan-out bounded, not ~429k rows
    assert len(by_media["m1"]) == 16
    # negative duration = unmeasured: dropped, never end_ms < start_ms
    assert "m2" not in by_media
    assert len(by_media["m3"]) == 2


def test_audio_chunks(spark):
    from helix_html2md_spark.operators.multimodal import (
        audio_chunks, synthetic_media,
    )

    media = synthetic_media(spark, 30)
    chunks = audio_chunks(media, chunk_ms=3000).collect()
    assert chunks
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'audio'").collect()
    }
    by_media = {}
    for r in chunks:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        assert rows[0]["start_ms"] == 0
        assert rows[-1]["end_ms"] == durations[mid]  # covers full duration
        for a, b in zip(rows, rows[1:]):
            assert b["start_ms"] == a["end_ms"] == a["start_ms"] + 3000


def test_multimodal_decode_slots():
    from helix_html2md_spark.operators.multimodal import (
        decode_frame, decode_image,
    )

    # decode_image is REAL for PNG/BMP/WAV now (core/codecs.py); a
    # truncated PNG raises ValueError (row-resilience contract), and
    # the video frame slot stays an injectable stub
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")  # signature fragment, not a PNG
    with pytest.raises(NotImplementedError):
        decode_frame(b"\x00\x00\x00\x18ftyp", 0)


def test_ivf_topk_recall(spark):
    """IVF-Flat probes a subset of cells yet recovers most of the exact
    top-10 on the clustered driver embeddings."""
    from helix_html2md_spark.operators.similarity import (
        cosine_topk, ivf_topk, train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").head()["embedding"])
    rest = emb.filter("vec_id != 0")
    exact = {r["vec_id"] for r in cosine_topk(rest, qv, k=10).collect()}
    cents = train_centroids(emb, k=8)
    approx = {r["vec_id"] for r in ivf_topk(rest, qv, cents, k=10, nprobe=3).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, (recall, exact, approx)


def test_dup_components_long_chain(spark):
    """A 40-hop path graph converges within the default iteration budget:
    pointer jumping halves label distances per round (O(log diameter)),
    where plain neighbor-min propagation would need 40 rounds."""
    from helix_html2md_spark.operators.dedup import dup_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    comp = {
        r["doc_id"]: r["component"] for r in dup_components(pairs).collect()
    }
    assert comp == {i: 0 for i in range(n + 1)}


def test_dup_components_nonconvergence_warns(spark):
    """Exhausting max_iter with labels still changing must WARN, not
    silently return wrong components."""
    import warnings

    from helix_html2md_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dup_components(pairs, max_iter=1).collect()
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "did not converge" in str(w.message)
        for w in caught
    )


def test_simhash_pigeonhole_invariant():
    """n_blocks <= max_distance silently loses recall -> must raise unless
    the caller opts into the approximate regime; derived block layouts
    always cover all 64 bits."""
    from helix_html2md_spark.operators.dedup import (
        simhash_blocks, simhash_near_dup_pairs,
    )

    with pytest.raises(ValueError, match="probabilistically"):
        simhash_near_dup_pairs(None, max_distance=8, n_blocks=4)
    for n_blocks in (2, 3, 4, 7, 9, 17, 64):
        blocks = simhash_blocks(n_blocks)
        assert len(blocks) == n_blocks
        assert sum(w for _, w in blocks) == 64
        assert blocks[0][0] == 0
        for (off_a, w_a), (off_b, _) in zip(blocks, blocks[1:]):
            assert off_b == off_a + w_a  # contiguous, non-overlapping


def test_release_persisted(spark, docs):
    """Pair generation caches fingerprint tables at diamond points;
    release_persisted() must free them all."""
    from helix_html2md_spark.operators.dedup import (
        _PERSISTED, jaccard_verified_pairs, release_persisted,
    )

    release_persisted()
    jaccard_verified_pairs(docs, threshold=0.5).collect()
    assert len(_PERSISTED) >= 2  # bucket table + pair table
    handles = list(_PERSISTED)
    release_persisted()
    assert not _PERSISTED
    assert all(not h.is_cached for h in handles)


def test_dedup_segments_drops_cross_doc_repeats(spark):
    from helix_html2md_spark.operators.dedup import dedup_segments

    shared = " ".join(f"s{i}" for i in range(16))  # one full segment
    docs = spark.createDataFrame(
        [
            ("a", shared + " " + " ".join(f"a{i}" for i in range(16))),
            ("b", shared + " " + " ".join(f"b{i}" for i in range(16))),
            ("c", " ".join(f"c{i}" for i in range(20))),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_segments(docs, segment_tokens=16, max_df=1).collect()
    }
    # the shared 16-token segment appears in 2 docs -> dropped everywhere
    assert (out["a"]["n_segments"], out["a"]["n_kept"]) == (2, 1)
    assert (out["b"]["n_segments"], out["b"]["n_kept"]) == (2, 1)
    # doc c: 20 tokens -> 2 segments (16 + 4), both unique -> kept
    assert (out["c"]["n_segments"], out["c"]["n_kept"]) == (2, 2)
    import hashlib

    a_kept = " ".join(f"a{i}" for i in range(16))
    assert out["a"]["kept_md5"] == hashlib.md5(a_kept.encode()).hexdigest()


def test_dedup_segments_all_dropped_and_order(spark):
    from helix_html2md_spark.operators.dedup import dedup_segments

    same = " ".join(f"x{i}" for i in range(32))  # two identical-per-doc segs
    docs = spark.createDataFrame(
        [("a", same), ("b", same)], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: r
        for r in dedup_segments(docs, segment_tokens=16, max_df=1).collect()
    }
    assert out["a"]["n_kept"] == 0
    assert out["a"]["kept_len"] == 0  # empty reassembly, not NULL
    # order preservation: unique doc keeps its segments in original order
    solo = spark.createDataFrame(
        [("s", " ".join(f"w{i}" for i in range(40)))],
        "doc_id string, text string",
    )
    r = dedup_segments(solo, segment_tokens=16, max_df=1).collect()[0]
    import hashlib

    toks = [f"w{i}" for i in range(40)]
    expect = " ".join(
        " ".join(toks[s : s + 16]) for s in range(0, 40, 16)
    )
    assert r["kept_md5"] == hashlib.md5(expect.encode()).hexdigest()


# --- round-4 review-fix edge cases ------------------------------------------


def test_simhash_exact_mode_distance_zero(spark):
    """max_distance=0 -> one 64-bit block: the full-width block must not
    build a (1<<64)-1 mask literal (JVM long overflow, round-4 review)."""
    from helix_html2md_spark.operators.dedup import simhash_near_dup_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta common words here"),
            (2, "alpha beta gamma delta common words here"),
            (3, "entirely different content in this one"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_near_dup_pairs(docs, max_distance=0).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [
        (1, 2, 0)
    ]


def test_empty_docs_never_pair_in_lsh(spark):
    """Empty/whitespace docs have no shingles -> null bucket keys; they
    must produce NO candidate pairs on either the light or heavy path
    (recall must not depend on bucket occupancy — round-4 review)."""
    from helix_html2md_spark.operators.dedup import minhash_candidate_pairs

    rows = [(1, "   "), (2, ""), (3, "real content words in here four")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for cap in (256, 1):  # light path and forced heavy/star path
        pairs = minhash_candidate_pairs(
            docs, max_bucket_size=cap
        ).collect()
        assert pairs == [], f"cap={cap}: {pairs}"


def test_dup_components_rejects_zero_iters(spark):
    from helix_html2md_spark.operators.dedup import dup_components
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(1, 2)], "doc_a long, doc_b long"
    )
    with _pytest.raises(ValueError):
        dup_components(pairs, max_iter=0)


def test_dedup_segments_keeps_empty_docs(spark):
    from helix_html2md_spark.operators.dedup import dedup_segments
    import hashlib

    docs = spark.createDataFrame(
        [
            (1, "tok " * 20),
            (2, "   "),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_segments(docs).collect()}
    assert set(out) == {1, 2, 3}
    for d in (2, 3):
        assert out[d]["n_segments"] == 0
        assert out[d]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_exact_dup_stats_counts_null_text(spark):
    from helix_html2md_spark.operators.dedup import exact_dup_stats

    docs = spark.createDataFrame(
        [(1, None, "s"), (2, None, "s"), (3, "same", "s"), (4, "same", "s")],
        "doc_id long, text string, source string",
    )
    row = exact_dup_stats(docs).collect()[0]
    assert row["n_docs"] == 4
    assert row["n_unique"] == 2  # null-text class + the 'same' class


def test_simhash_rejects_other_widths(spark):
    from helix_html2md_spark.operators.dedup import simhash
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        simhash(docs, bits=32)


def test_cosine_zero_vector_never_tops(spark):
    """Zero-norm vectors rank NULL-last instead of diverging across
    engines (Spark NULL vs DuckDB NaN-sorts-first — round-4 review)."""
    from helix_html2md_spark.operators.similarity import (
        cosine_neardup_pairs, cosine_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 0.0], 0),  # zero vector
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = cosine_topk(emb, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in rows] == [0, 1, 2]
    assert rows[-1]["cosine"] is None
    pairs = cosine_neardup_pairs(emb, threshold=0.5).collect()
    assert all(2 not in (r["vec_a"], r["vec_b"]) for r in pairs)
    assert any({r["vec_a"], r["vec_b"]} == {0, 1} for r in pairs)


def test_exact_mode_is_truly_all_pairs(spark):
    """planes=None must NOT be silently skew-capped: every qualifying
    pair appears even when the corpus exceeds max_bucket_size."""
    from helix_html2md_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    n = 40
    emb = spark.createDataFrame(
        [(i, [1.0, 0.001 * i], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    pairs = cosine_neardup_pairs(
        emb, threshold=0.99, planes=None, max_bucket_size=8
    ).collect()
    # all vectors are near-parallel: every unordered pair qualifies
    assert len(pairs) == n * (n - 1) // 2


def test_rademacher_planes_distinct_any_count():
    from helix_html2md_spark.operators.similarity import (
        rademacher_planes,
    )

    planes = rademacher_planes(10, 64)  # 10 > log2(64): old bug zone
    as_tuples = {tuple(p) for p in planes}
    assert len(as_tuples) == 10  # all distinct
    assert all(any(v > 0 for v in p) for p in planes)  # none constant
    # deterministic
    assert rademacher_planes(10, 64) == planes


def test_bucketed_topk_python_jvm_bucket_agreement(spark):
    """The query's bucket (Python) and corpus buckets (JVM) share one
    sign convention: reusing the corpus operator on the query row must
    land it in the bucket the Python loop computes."""
    from helix_html2md_spark.operators.similarity import (
        hyperplane_buckets, rademacher_planes,
    )

    planes = rademacher_planes(4, 8)
    vecs = [
        [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]
        for i in range(12)
    ]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    jvm = {
        r["vec_id"]: r["bucket"]
        for r in hyperplane_buckets(df, planes).collect()
    }
    for i, v in enumerate(vecs):
        qbits = 0
        for pi, p in enumerate(planes):
            if sum(float(a) * float(b) for a, b in zip(v, p)) >= 0:
                qbits |= 1 << pi
        assert jvm[i] == qbits, i


def test_dedup_segments_whitespace_only_doc_survives(spark):
    """A document whose text is only non-space whitespace ("\\t\\n") is
    token-less and must still emit its one-row-per-input-document row
    (n_segments=0) - F.trim strips only ASCII spaces, so a trim-based
    re-derive predicate loses it (ADVICE r4)."""
    import hashlib

    from helix_html2md_spark.operators.dedup import dedup_segments

    docs = spark.createDataFrame(
        [("a", "\t\n"), ("b", "hello world"), ("c", None), ("d", "  ")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_segments(docs, segment_tokens=16, max_df=1).collect()
    }
    assert set(out) == {"a", "b", "c", "d"}
    empty_md5 = hashlib.md5(b"").hexdigest()
    for did in ("a", "c", "d"):
        assert out[did]["n_segments"] == 0
        assert out[did]["kept_md5"] == empty_md5
    assert out["b"]["n_kept"] == 1


def test_quality_features_single_tokenization(spark):
    """quality_features computes all features from ONE materialized
    token column: exactly one split() in the physical plan (the
    per-helper form inlined seven).  Null-text rows report NULL
    features (and token_count is nullif-guarded so ANSI-off clusters
    can't turn that into -1 — session.py also pins ansi.enabled)."""
    import re

    from helix_html2md_spark.functions.text import (
        quality_features, token_ngrams,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a b the")], "doc_id long, text string"
    )
    plan = (
        quality_features(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"split\(", plan)) == 1
    rows = {
        r["doc_id"]: (r["n_tokens"], r["stopword_ratio"])
        for r in quality_features(docs).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2][0] == 3
    with pytest.raises(ValueError):
        token_ngrams(None, 0)
    with pytest.raises(ValueError):
        token_ngrams(None, -3)
