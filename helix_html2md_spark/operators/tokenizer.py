"""BPE tokenizer training and encoding over a document corpus.

The byte-pair-encoding recipe of Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units") in its GPT-2 practical
form: pre-tokenize with ``functions.text.bpe_tokens`` (space-glued
letter/digit/punctuation runs — merges never cross a pre-token
boundary, so no end-of-word marker is needed), learn merges greedily by
pair frequency, and encode by replaying the merges in rank order.

Scale shape — the part that matters at 100 TB:

* **Training** reduces the corpus to a WORD-COUNT table first: one
  map-side-combinable ``groupBy(word)`` (Zipf head words collapse
  executor-side), capped to the top ``max_words`` distinct words by
  (count desc, word asc) via TakeOrderedAndProject.  Only that bounded
  table crosses to the driver; the merge loop itself runs driver-side
  over word COUNTS, never documents — exactly how production BPE
  trainers work (the corpus contributes nothing beyond its word
  histogram).
* **Encoding** applies the merge table to the DISTINCT pre-token table
  (the only Python crossing — cost is per distinct word, not per
  occurrence; a trillion-token corpus has a few hundred million
  distinct pre-tokens, orders of magnitude fewer than occurrences),
  then joins the pieces back onto the pre-token stream and reassembles
  per document JVM-side.  The corpus-sized side never enters Python.

Determinism: pair-count ties break on the lexicographically smallest
pair; the word cap ties break on the word string; the merge loop is
pure integer arithmetic over exact counts — two builds on the same
table produce byte-identical merge lists.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from ..functions.text import WS_CLASS, bpe_tokens


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) histogram of non-whitespace BPE pre-tokens.  One
    explode + one map-side-combinable groupBy; whitespace runs are
    dropped JVM-side (they segment, but a tokenizer never merges
    them)."""
    return (
        docs.select(
            F.explode(bpe_tokens(F.col(text_col))).alias("word")
        )
        .filter(~F.col("word").rlike("^" + WS_CLASS + "+$"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    num_merges: int = 256,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
    max_word_len: int = 1024,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus.

    Spark does one bounded job (word histogram, top-``max_words`` by
    (count desc, word asc)); the greedy loop runs driver-side on the
    histogram.  Stops early when no pair reaches ``min_pair_count``
    (merging a pair seen once memorizes noise).  Pre-tokens longer
    than ``max_word_len`` are excluded from learning — a 100k-char
    letter/punctuation run is corpus pathology, and its O(len) pair
    scan per merge round would dominate the loop (the encoder passes
    such runs through whole for the same reason).  Returns the ordered
    merge list — rank = position, the encoder contract."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    if max_words < 1:
        raise ValueError("max_words must be >= 1")
    rows = (
        word_counts(docs, text_col)
        .filter(F.length("word") <= max_word_len)
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    merges, _ = _train_from_counts(
        [(r["word"], r["n"]) for r in rows], num_merges, min_pair_count
    )
    return merges


def _train_from_counts(
    counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int,
) -> tuple[list[tuple[str, str]], list[list]]:
    """The driver-side merge loop over a (word, count) histogram.
    Returns (merges, the trainer's working [symbols, count] word list
    in its FINAL state) — the second element is the list the loop
    already owns (no extra materialization on the production path) and
    exists so tests can pin the trainer/encoder consistency invariant:
    replaying the merge list through ``_encode_word`` reproduces the
    trainer's own final segmentation for every training word.

    Incremental: pair counts and a pair -> word-ids index are built
    once; each merge touches ONLY the words that contain the merged
    pair (per-round cost proportional to affected words, not the whole
    vocab — a naive full-rescan loop is
    O(num_merges x max_words x word_len) driver-side and takes tens
    of minutes at the advertised defaults)."""
    words: list[list] = []  # [symbols tuple, count]
    for word, n in counts:
        words.append([tuple(word), n])
    pair_counts: Counter[tuple[str, str]] = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for i, (sym, n) in enumerate(words):
        for p in zip(sym, sym[1:]):
            pair_counts[p] += n
            where.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, ties to the lexicographically smallest pair —
        # deterministic across dict orders, runs, and engines
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        for i in sorted(where.get(pair, ())):
            sym, n = words[i]
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                w = where.get(p)
                if w is not None:
                    w.discard(i)
                    if not w:
                        del where[p]
            new = _merge_word(sym, pair)
            words[i][0] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += n
                where.setdefault(p, set()).add(i)
    return merges, words


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge replay (the GPT-2 encoder loop):
    repeatedly merge the present pair with the smallest training rank
    until none of the word's pairs were learned."""
    sym = list(word)
    while len(sym) > 1:
        pairs = [(ranks.get((a, b)), i)
                 for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def corpus_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct characters of the corpus's non-whitespace
    pre-tokens — the base vocabulary under the merges.  Output is
    charset-bounded (one distinct over exploded chars), deterministic
    by the sort."""
    rows = (
        word_counts(docs, text_col)
        .select(F.explode(F.split("word", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    return sorted(r["ch"] for r in rows)


def bpe_vocab(
    alphabet: list[str], merges: list[tuple[str, str]]
) -> dict[str, int]:
    """piece -> id table in the standard BPE layout: base alphabet
    first (sorted order = id order), then one id per merge in rank
    order (merge i's concatenated piece gets id ``len(alphabet)+i``).
    Two merges can build the same string via different splits (e.g.
    (a,bc) and (ab,c) both yield 'abc'); the FIRST rank keeps the id —
    a piece string is one vocabulary entry regardless of derivation."""
    vocab: dict[str, int] = {}
    for i, ch in enumerate(sorted(set(alphabet))):
        vocab[ch] = i
    base = len(vocab)
    for i, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, base + i)
    return vocab


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    max_word_len: int = 1024,
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """Encode each document with a trained merge list.

    Output: ``(doc_id, n_pieces, pieces array<string>)`` — pieces in
    document order, whitespace pre-token runs excluded (same units as
    ``word_counts``); empty/null-text docs report ``n_pieces = 0``.
    With a ``vocab`` (see :func:`bpe_vocab`) the output additionally
    carries ``ids array<int>`` (aligned with pieces; unknown pieces —
    a char outside the training alphabet, or an over-length
    passthrough run — get id -1) and ``n_unk`` — the trainer-ready
    token-id stream.

    The ONLY Python crossing is over the DISTINCT word table (encode
    once per distinct word — Zipf means the join fans each encoded word
    back out to its many occurrences; ids are assigned inside the same
    crossing, also per distinct word); the pre-token stream, the
    join-back, and the per-document reassembly (sort-by-position
    array aggregation + flatten) are all JVM-side.  Words longer than
    ``max_word_len`` pass through as a single piece (still lossless) —
    the greedy merge replay is O(len²) worst case and must not hang an
    executor on a pathological megabyte run."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    with_ids = vocab is not None

    pretok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                bpe_tokens(F.col(text_col)),
                lambda t: ~t.rlike("^" + WS_CLASS + "+$"),
            )
        ).alias("pos", "word"),
    )
    # pretok feeds TWO consumers (the distinct-word crossing and the
    # join-back): without a persist the corpus-wide regex pretokenize +
    # posexplode — the dominant scan cost — executes twice.  Same
    # diamond pattern as dsir/corpus/search; released per battery query
    # via dedup.release_persisted().
    from .dedup import _PERSISTED

    pretok = pretok.persist()
    _PERSISTED.append(pretok)

    def encode_batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            pieces = [
                [w] if len(w) > max_word_len else _encode_word(w, ranks)
                for w in pdf["word"]
            ]
            cols = {"word": pdf["word"], "pieces": pieces}
            if with_ids:
                cols["ids"] = [
                    [vocab.get(p, -1) for p in ps] for ps in pieces
                ]
            yield pd.DataFrame(cols)

    schema = "word string, pieces array<string>"
    agg_fields = ["pos", "pieces"]
    if with_ids:
        schema += ", ids array<int>"
        agg_fields.append("ids")
    pieces = pretok.select("word").distinct().mapInPandas(
        encode_batches, schema
    )
    joined = pretok.join(pieces, "word")
    sorted_structs = F.array_sort(
        F.collect_list(F.struct(*agg_fields))
    )
    aggs = [F.flatten(sorted_structs.getField("pieces")).alias("pieces")]
    if with_ids:
        aggs.append(F.flatten(sorted_structs.getField("ids")).alias("ids"))
    per_doc = joined.groupBy("doc_id").agg(*aggs)
    # size() runs on the COALESCED array: under an ANSI-off session
    # (every 3.x default) size(NULL) is -1, not NULL, so
    # coalesce(size(pieces), 0) leaked n_pieces = -1 for token-less
    # docs — the n_unk column below always had it right
    pieces_arr = F.coalesce("pieces", F.array().cast("array<string>"))
    out_cols = [
        "doc_id",
        F.size(pieces_arr).alias("n_pieces"),
        pieces_arr.alias("pieces"),
    ]
    if with_ids:
        out_cols += [
            F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
            F.size(
                F.filter(
                    F.coalesce("ids", F.array().cast("array<int>")),
                    lambda x: x < 0,
                )
            ).alias("n_unk"),
        ]
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        *out_cols
    )


def _merges_fingerprint(merges: list[tuple[str, str]]) -> str:
    import hashlib

    blob = "\x00".join(f"{a}\x01{b}" for a, b in merges)
    return hashlib.md5(blob.encode()).hexdigest()


def save_bpe(
    spark,
    path: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int] | None = None,
) -> None:
    """Persist a trained tokenizer as parquet so one training job's
    merges (and optional id table) serve every later encode job —
    retraining per pipeline run would silently shift ids under models
    already trained on the old segmentation.

    Layout: ``<path>/merges`` with (rank, a, b) — rank IS the merge
    order, the entire encoder contract — and ``<path>/vocab`` with
    (piece, id, merges_fp).  The vocab subdir is ALWAYS (re)written
    (empty table = no vocab): a conditional write would leave a
    previous save's vocab next to new merges.  Each vocab row carries
    the MERGES FINGERPRINT, so even the non-atomic two-directory
    write cannot mis-pair silently — a crash between the two
    overwrites leaves a stale vocab whose fingerprint no longer
    matches, and load_bpe fails LOUDLY instead of shifting ids."""
    fp = _merges_fingerprint(merges)
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    spark.createDataFrame(
        [(p, i, fp) for p, i in vocab.items()] if vocab else [],
        "piece string, id int, merges_fp string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab")


def load_bpe(
    spark, path: str
) -> tuple[list[tuple[str, str]], dict[str, int] | None]:
    """Load (merges, vocab) written by :func:`save_bpe`; vocab is None
    when the tokenizer was saved without one (an EMPTY — incl. an
    explicitly-empty dict — vocab table, or, for artifacts from before
    the always-write layout, a missing subdir).  Merge order is
    restored from the explicit rank column — never from file/row
    order, which parquet does not guarantee.  Detection goes through
    the Spark reader, not os.path (the artifact may live on any Hadoop
    filesystem — a driver-local isdir probe would silently drop the
    vocab of an s3:// or hdfs:// tokenizer), keyed on the stable error
    CLASS with a message fallback for pre-error-class artifacts."""
    from pyspark.errors import AnalysisException

    rows = spark.read.parquet(f"{path}/merges").collect()
    merges = [
        (r["a"], r["b"]) for r in sorted(rows, key=lambda r: r["rank"])
    ]
    try:
        vrows = spark.read.parquet(f"{path}/vocab").collect()
    except AnalysisException as e:
        cls = getattr(e, "getErrorClass", lambda: None)()
        if cls == "PATH_NOT_FOUND" or "Path does not exist" in str(e):
            return merges, None  # pre-always-write legacy artifact
        raise
    if not vrows:
        return merges, None
    fp = _merges_fingerprint(merges)
    stale = {r["merges_fp"] for r in vrows if "merges_fp" in r.asDict()}
    if stale and stale != {fp}:
        raise ValueError(
            f"BPE artifact at {path!r} is inconsistent: the vocab was "
            "saved against a different merge list (partial re-save?) — "
            "re-run save_bpe with both"
        )
    return merges, {r["piece"]: r["id"] for r in vrows}
