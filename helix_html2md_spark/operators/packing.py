"""Training-sequence assembly: pack documents into fixed token budgets
and split long documents into overlapping context windows.

Both are standard LLM training-data-pipeline steps downstream of
extraction + dedup, and both are expressed ENTIRELY in native Spark SQL
(window cumsum / sequence+explode) — zero Python in the plan, exactly
oracle-able in ANSI SQL.

Scale shape:

* ``pack_sequences`` — the classic greedy offline packing: order
  documents deterministically, run a cumulative token sum, and assign
  pack_id = floor((cumsum - n_tokens) / seq_len).  The global cumsum is
  a TWO-PHASE EXACT PREFIX SUM, not a single-partition window:
  ``repartitionByRange(doc_id)`` -> per-partition window cumsum ->
  collect the P per-partition token totals (P rows, bytes) -> broadcast
  the cumulative offsets back and add.  Integer arithmetic makes the
  result bit-identical to a global total order for ANY range-ordered
  partitioning, so reproducibility costs nothing: every partition
  cumsums in parallel and the only driver traffic is P longs.  For
  shard-local packing semantics (ragged tail per shard, zero collect),
  pass ``partition_by_shard=True``.
* ``chunk_documents`` — per-row ``sequence`` + ``posexplode``; embar-
  rassingly parallel, fan-out bounded by ceil(n_tokens / stride).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import token_count, tokens


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    *,
    partition_by_shard: bool = False,
    n_shards: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a training pack of ``seq_len`` tokens.

    Greedy in deterministic doc_id order: a document starts in the pack
    where its first token lands; ``offset_in_pack`` is its start
    position within that pack (documents longer than the remaining
    room simply flow into subsequent packs — standard concat-and-chunk
    packing, where pack boundaries may split documents).

    LIFETIME CONTRACT (default path): the returned plan joins offsets
    that were collected from the PERSISTED phase-1 table.  Materialize
    the result before calling ``dedup.release_persisted()``: a
    re-materialization after release re-executes the range exchange,
    whose freshly sampled bounds need not match the bounds the offsets
    were collected under (within one action the exchange is shared, so
    a single materialization is always self-consistent).
    """
    if seq_len <= 0:
        # fail at call time, not as a mid-job DIVIDE_BY_ZERO (ANSI on)
        # or an all-NULL pack assignment (ANSI off)
        raise ValueError("seq_len must be positive")
    if partition_by_shard and n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if num_partitions is not None and num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    # null text (failed extraction) = 0 tokens: tokens(NULL) is NULL and
    # a NULL n_tokens would both null out this doc's pack assignment and
    # crash the driver-side offset fold when a whole range partition is
    # null-text (max(_cum) NULL -> int(None)); zero keeps the documented
    # one-row-per-input-document contract with a deterministic slot
    # (token_count is the one oracle-shared token-count definition)
    n_tok = F.coalesce(token_count(F.col("text")), F.lit(0))
    base = docs.select("doc_id", n_tok.alias("n_tokens"))

    def emit(df: DataFrame, start) -> DataFrame:
        # pack_id via integer `div`, not floor(double-division): the
        # double quotient loses exactness past ~2^41*seq_len cumulative
        # tokens, which the stated 10^12-doc scale can reach
        df = df.withColumn("_start", start.cast("long"))
        return df.select(
            "doc_id",
            "n_tokens",
            "shard",
            F.expr(f"_start div {int(seq_len)}").cast("long").alias(
                "pack_id"
            ),
            F.pmod("_start", F.lit(seq_len)).cast("long").alias(
                "offset_in_pack"
            ),
        )

    # every cumsum window below pins a ROWS frame: the default RANGE
    # frame treats all rows sharing a doc_id as PEERS and hands each the
    # full peer sum — two duplicate doc_ids would both start at the
    # same offset (overlapping slots) while their first slot goes
    # unfilled.  With ROWS, duplicates get disjoint slots (in an
    # arbitrary but non-overlapping order); unique doc_ids — the normal
    # contract — are identical under either frame.
    rows_cum = (Window.unboundedPreceding, Window.currentRow)

    if partition_by_shard:
        shard = F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
        sharded = base.withColumn("shard", shard)
        w = (
            Window.partitionBy("shard")
            .orderBy("doc_id")
            .rowsBetween(*rows_cum)
        )
        return emit(sharded, F.sum("n_tokens").over(w) - F.col("n_tokens"))

    # ---- two-phase exact global prefix sum (no single-partition window)
    # Phase 1: range-partition by doc_id, cumsum WITHIN each partition
    # (the window's partition key is the materialized physical partition
    # id, so every partition windows in parallel).  Phase 2: the P
    # per-partition totals (max of a nondecreasing cumsum) come back to
    # the driver as P longs; their running sum is each partition's
    # global offset, broadcast-joined back.  Integer token counts make
    # offset + local_cum bit-identical to the global-order cumsum
    # regardless of where the sampled range bounds fell.
    from .dedup import _PERSISTED

    spark = docs.sparkSession
    # prefix-sum parallelism tracks the INPUT's split count (floor 2 so
    # the plan never degenerates to a single partition): at corpus scale
    # the scan has thousands of splits and the cumsum spreads with them;
    # on a toy input, 32 range partitions of 5k rows are pure task
    # overhead.  Output values are partition-count-independent either
    # way (exact integer offsets), so p is purely a throughput knob.
    p = num_partitions or max(
        2,
        min(
            spark.sparkContext.defaultParallelism,
            docs.rdd.getNumPartitions(),
        ),
    )
    # persist the 16-byte-per-doc counter table BEFORE the range
    # exchange: RangePartitioning runs a sampling pass over its child,
    # which would otherwise re-tokenize the whole corpus a second time
    # (measured 5x on the battery).  At 10^12 docs this cache is the
    # standard materialize-the-keys step of a distributed prefix sum —
    # MEMORY_AND_DISK, ~25 B/row, far smaller than the text it replaces.
    base = base.persist()
    _PERSISTED.append(base)
    local = (
        base.repartitionByRange(p, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("shard", F.lit(0))
    )
    w = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(*rows_cum)
    wp = Window.partitionBy("_pid")  # whole-partition frame, same stage
    local = local.withColumn(
        "_cum", F.sum("n_tokens").over(w).cast("long")
    ).withColumn(
        # per-partition fingerprint (total tokens + row count), computed
        # in the SAME stage as _cum and persisted with it: if the cache
        # is lost and the range exchange re-executes with fresh sample
        # bounds, the recomputed fingerprints shift with the bounds and
        # the equality check below catches it — a pid-presence check
        # alone cannot (a re-executed exchange reproduces the same pid
        # universe 0..p-1, so every pid would still "find" a stale
        # offset and silently mispack)
        "_ptot", F.max("_cum").over(wp).cast("long")
    ).withColumn(
        "_pcnt", F.count("*").over(wp).cast("long")
    )
    local = local.persist()
    _PERSISTED.append(local)
    totals = sorted(
        local.groupBy("_pid")
        .agg(
            F.max("_cum").alias("_t"),
            F.count("*").alias("_c"),
        )
        .collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((int(r["_pid"]), acc, int(r["_t"]), int(r["_c"])))
        acc += int(r["_t"])
    off = spark.createDataFrame(
        offsets, "_pid int, _off long, _tot long, _cnt long"
    )
    joined = local.join(F.broadcast(off), "_pid", "left")
    # stale-offset guard: offsets were collected from the persisted
    # phase-1 table; a missing pid OR a fingerprint mismatch means the
    # exchange re-executed after the cache was lost (released before
    # materialization) — fail LOUDLY rather than mispacking
    fresh = (
        F.col("_off").isNotNull()
        & (F.col("_ptot") == F.col("_tot"))
        & (F.col("_pcnt") == F.col("_cnt"))
    )
    off_checked = F.when(fresh, F.col("_off")).otherwise(
        F.raise_error(
            F.lit(
                "pack_sequences: collected offsets do not match the "
                "live phase-1 partitions — the range exchange "
                "re-executed after the phase-1 cache was lost; "
                "materialize the result before "
                "dedup.release_persisted()"
            )
        ).cast("long")
    )
    start = off_checked + F.col("_cum") - F.col("n_tokens")
    return emit(joined, start)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into overlapping context windows.

    Emits (doc_id, chunk_idx, start_tok, end_tok, chunk_text) where
    chunks start every ``chunk_tokens - overlap`` tokens.  Chunk text is
    re-assembled from the token array with ``slice`` + ``array_join``
    (whitespace-normalized by construction).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    if overlap < 0:
        # a negative overlap silently widens the stride past the chunk
        # width and leaves unsampled token holes between chunks
        raise ValueError("overlap must be >= 0")
    stride = chunk_tokens - overlap
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    # chunk start offsets: 0, stride, 2*stride, ... while the chunk
    # still contributes NEW tokens.  A chunk at start s>0 is fully
    # contained in its predecessor (which ends at min(s+overlap, n))
    # exactly when n <= s + overlap, so the last start is the largest
    # stride multiple < n - overlap — a tail shorter than the overlap
    # must NOT emit (it would duplicate training text the dedup stages
    # exist to remove).  Empty docs -> no rows.
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            ((F.col("_n") - overlap - 1) / stride).cast("int") * stride,
            F.lit(0),
        ),
        F.lit(stride),
    )
    exploded = base.filter(F.col("_n") > 0).select(
        "doc_id",
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    end_tok = F.least(F.col("start_tok") + chunk_tokens, F.col("_n"))
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.col("start_tok").cast("int").alias("start_tok"),
        end_tok.cast("int").alias("end_tok"),
        F.array_join(
            F.slice(
                "_toks",
                F.col("start_tok") + 1,
                end_tok - F.col("start_tok"),
            ),
            " ",
        ).alias("chunk_text"),
    )
