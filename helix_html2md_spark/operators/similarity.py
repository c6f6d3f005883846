"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k: JVM-side zip_with/aggregate dot products —
  the scale baseline (one scan, no shuffle for a broadcast query vector)
* LSH-bucketed variant: random-hyperplane signs bucket the vectors, then
  brute-force within buckets — the 100 TB path (candidate set shrinks by
  2^n_planes; same plan shape as the MinHash bucket-join)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against a constant query vector.

    Zero-norm corpus vectors have undefined cosine: they rank as NULL
    (sorted last, never in the top-k) instead of producing a silent
    divide-by-zero NULL in Spark vs NaN in a SQL engine — NaN compares
    GREATER than everything in DuckDB, so an unguarded expression
    diverges across engines on exactly those rows."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5 or 1.0
    e = F.col("embedding").cast("array<double>")
    en = _norm(e)
    cos = F.when(en == 0, F.lit(None)).otherwise(
        _dot(e, q) / (en * F.lit(qn))
    )
    return (
        emb.select(
            "vec_id",
            "label",
            F.round(cos, 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def hyperplane_buckets(
    emb: DataFrame, planes: list[list[float]]
) -> DataFrame:
    """Sign-of-dot-product LSH bucket id per vector."""
    if not planes:
        raise ValueError("planes must be non-empty")
    e = F.col("embedding").cast("array<double>")
    bits = []
    for i, p in enumerate(planes):
        pv = F.array(*[F.lit(float(v)) for v in p])
        bits.append(
            F.when(_dot(e, pv) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.withColumn("bucket", bucket.cast("int"))


def ivf_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """IVF coarse quantization: nearest-centroid cell id per vector.

    All JVM-side: K dot products per row inside codegen; no shuffle.
    Scores are rounded to 6 decimals before the argmax (first maximal
    index wins ties) so a SQL oracle recomputing the same doubles
    assigns identical cells — near-ties can't flip on last-bit float
    differences between engines.
    """
    e = F.col("embedding").cast("array<double>")
    scores = F.array(
        *[
            F.round(
                _dot(e, F.array(*[F.lit(float(v)) for v in c]))
                / F.lit(sum(v * v for v in c) ** 0.5 or 1.0),
                6,
            )
            for c in centroids
        ]
    )
    cell = F.array_position(scores, F.array_max(scores)) - 1
    return emb.withColumn("cell", cell.cast("int"))


def train_centroids(
    emb: DataFrame, k: int = 16, iters: int = 1
) -> list[list[float]]:
    """Deterministic coarse centroids: Lloyd refinement after seeding
    with the k lowest vec_ids — spherical k-means (cosine assignment
    via ``ivf_assign``'s 6dp-rounded scores, per-cell MEAN update), so
    two builds on the same table produce byte-identical centroids.
    ``iters`` Lloyd passes (default 1 — the historical kmeans-lite);
    a cell that loses all members keeps its previous centroid.  Null
    embeddings are excluded from both seeding and the refinement.

    Scale shape per pass: assignment is K dot products per row inside
    codegen (no shuffle), the update is ONE map-side-combinable
    groupBy over k cells, and only k×dim floats cross to the driver —
    the classic Spark k-means loop, bounded collects only."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # the filter creates a fresh (never-cached) DataFrame, so the
    # persist/unpersist below can't release a cache the CALLER owns;
    # without it the emb lineage re-executes once per Lloyd pass plus
    # once for the seeds collect
    emb = emb.filter(F.col("embedding").isNotNull()).persist()
    try:
        seeds = [
            list(r["embedding"])
            for r in emb.orderBy("vec_id").limit(k).collect()
        ]
        if not seeds:
            raise ValueError("train_centroids: no non-null embeddings")
        dim = len(seeds[0])
        cents = list(seeds)
        for _ in range(iters):
            assigned = ivf_assign(emb, cents)
            means = (
                assigned.groupBy("cell")
                .agg(
                    *[
                        F.avg(F.col("embedding").getItem(i)).alias(f"d{i}")
                        for i in range(dim)
                    ]
                )
                .collect()
            )
            out = list(cents)
            for r in means:
                if r["cell"] is None:
                    continue  # degenerate (defensive; nulls filtered above)
                vals = [r[f"d{i}"] for i in range(dim)]
                if any(v is None for v in vals):
                    continue
                out[r["cell"]] = [float(v) for v in vals]
            cents = out
        return cents
    finally:
        emb.unpersist()


def _probe_cells(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The query's ``nprobe`` best cells by centroid cosine — ONE
    implementation shared by the in-memory and persisted-index paths,
    which are contractually bit-identical (same oracle)."""
    qn = sum(v * v for v in query_vec) ** 0.5 or 1.0
    scored = sorted(
        range(len(centroids)),
        key=lambda ci: -(
            sum(a * b for a, b in zip(query_vec, centroids[ci]))
            / ((sum(v * v for v in centroids[ci]) ** 0.5 or 1.0) * qn)
        ),
    )
    return scored[:nprobe]


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-Flat ANN: probe the query's ``nprobe`` nearest cells, exact
    cosine within.

    NOTE on scale: this IN-MEMORY variant computes all K centroid
    scores for every row and only then filters — strictly more work per
    query than brute force (the repo's own bench shows it; assignment
    cost amortizes only over many queries).  The actually-pruned path
    is :func:`ivf_topk_from_index`, where assignment is paid ONCE at
    build time and each query reads only its probed cells' files."""
    probe = _probe_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(emb, centroids)
    return cosine_topk(
        assigned.filter(F.col("cell").isin(probe)).drop("cell"),
        query_vec,
        k,
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    planes: list[list[float]] | None = None,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Scale path: random-hyperplane LSH buckets the vectors (cosine-similar
    vectors agree on sign bits with high probability), candidate pairs
    form ONLY within a bucket (skew-capped like the MinHash LSH), then
    exact cosine verifies each candidate.  The embeddings ride through
    the pair generation as payload columns, so verification never joins
    back into the bucketing pipeline.  With ``planes=None`` every vector
    lands in one bucket — exact all-pairs, for small/oracle runs only.

    Scale note: the bucket key has 2^len(planes) distinct values, which
    bounds the self-join's shuffle parallelism AND the per-bucket pair
    count — size len(planes) so that corpus_size / 2^planes stays well
    under max_bucket_size times the recall you can afford (more planes =
    more parallelism + fewer candidates, lower recall per table; use
    multiple plane TABLES or band rotations to recover recall, exactly
    like MinHash banding).
    """
    if planes:
        src = hyperplane_buckets(emb, planes)
        cap = max_bucket_size
    else:
        # exact mode is all-pairs BY REQUEST: the skew cap would
        # silently star-pair any corpus larger than max_bucket_size and
        # drop most genuine pairs — O(n^2) is the contract here
        src = emb.withColumn("bucket", F.lit(0))
        cap = 1 << 62
    return _bucketed_cosine_pairs(src, cap).filter(
        F.col("cosine") >= threshold
    )


def _bucketed_cosine_pairs(src: DataFrame, cap: int) -> DataFrame:
    """Exact-cosine pairs within buckets — the shared kernel under
    ``cosine_neardup_pairs`` (hyperplane buckets) and
    ``semantic_dedup`` (k-means cells).  ``src`` carries
    (vec_id, bucket, embedding); pairs form ONLY within a bucket via
    the skew-capped self-join, and the cosine is 6dp-rounded (NULL
    when either norm is zero).  Returns (vec_a, vec_b, cosine)
    UNFILTERED — callers apply their threshold."""
    from .dedup import _capped_bucket_pairs

    e = F.col("embedding").cast("array<double>")
    # norm computed ONCE per vector and carried through the pairing:
    # recomputing it per candidate pair costs ~bucket_size x more
    # O(d) folds in pair-heavy buckets
    buckets = src.select(
        F.col("vec_id").alias("doc_id"),
        "bucket",
        F.struct(e.alias("v"), _norm(e).alias("n")).alias("vec"),
    )
    pairs = _capped_bucket_pairs(
        buckets, ["bucket"], cap, payload="vec", dedup=False
    )
    na, nb = F.col("vec_a.n"), F.col("vec_b.n")
    cos = F.when((na == 0) | (nb == 0), F.lit(None)).otherwise(
        _dot(F.col("vec_a.v"), F.col("vec_b.v")) / (na * nb)
    )
    return pairs.select(
        F.col("doc_a").alias("vec_a"),
        F.col("doc_b").alias("vec_b"),
        F.round(cos, 6).alias("cosine"),
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
    k: int = 16,
    iters: int = 2,
    max_cell_size: int = 4096,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop embedding-level semantic
    near-duplicates by clustering first and comparing pairwise ONLY
    within a cluster — the paper's exact trick for making pairwise
    cosine feasible at corpus scale (k-means shards the O(n²) into k
    independent O((n/k)²) cells; cross-cell near-dups are the accepted
    recall loss).  Returns the SURVIVING rows of ``emb`` with all
    input columns.

    Keep policy, deterministic: within any pair at ``cosine >=
    threshold`` the LARGER vec_id drops, so the minimum id of a
    near-dup clique always survives (chains a~b~c drop both b and c —
    greedy errs toward more dedup, like the paper's
    one-representative-per-epsilon-ball).  Vectors with NULL
    embeddings can't be compared and are kept.

    Scale shape: assignment is K dots/row in codegen (no shuffle);
    pairs form via ONE shuffle on the cell key through the shared
    skew-capped kernel (a cell larger than ``max_cell_size``
    star-pairs against its min id — bounded output, reduced in-cell
    recall, same discipline as the MinHash LSH); embeddings+norms ride
    as payload so verification never re-joins upstream; the drop set
    applies as a broadcast-friendly left_anti on vec_id."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [0, 1]")
    if centroids is None:
        centroids = train_centroids(emb, k=k, iters=iters)
    assigned = ivf_assign(
        emb.filter(F.col("embedding").isNotNull()), centroids
    )
    src = assigned.select(
        "vec_id", F.col("cell").alias("bucket"), "embedding"
    )
    pairs = _bucketed_cosine_pairs(src, max_cell_size).filter(
        F.col("cosine") >= threshold
    )
    drops = pairs.select(
        F.greatest("vec_a", "vec_b").alias("vec_id")
    ).distinct()
    return emb.join(drops, "vec_id", "left_anti")


def rademacher_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: component j of plane i takes its
    sign from one md5 bit of "i:j".

    The plane VALUES are what cross into the SQL oracle (as literals),
    so any pure-Python construction stays engine-identical.  The md5
    source keeps every plane distinct and non-constant for ANY
    n_planes — the previous bit-i-of-j construction emitted duplicate
    all(-1) planes once i >= log2(dim), silently collapsing the
    advertised 2^n_planes bucket diversity (and those constant planes'
    bits were frozen for non-negative post-ReLU embeddings)."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{i}:{j}".encode()).digest()[0] & 1
            else -1.0
            for j in range(dim)
        ]
        for i in range(n_planes)
    ]


def bucketed_topk(
    emb: DataFrame, query_vec: list[float], planes: list[list[float]], k: int = 10
) -> DataFrame:
    """ANN: restrict brute-force search to the query's hyperplane bucket."""
    qbits = 0
    for i, p in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if d >= 0:
            qbits |= 1 << i
    bucketed = hyperplane_buckets(emb, planes)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbits).drop("bucket"),
        query_vec,
        k,
    )


def _sq_kernel(emb: DataFrame):
    """Shared int8 min-max quantization kernel: returns (base_df, codes
    column).  ONE implementation feeds both the contract surface
    (quantize_embeddings) and the persisted SQ index, so codes can
    never drift between them.

    Float32 storage -> double arithmetic: both engines quantize in
    float64, so subtraction/division round identically.  vmin/vmax
    MUST be materialized as columns before the transform: an
    array_min(x) expression referenced inside the lambda is inlined
    and re-evaluated PER ELEMENT (O(d^2) per row — measured 5s
    instead of 0.7s on 2000x64 vectors)."""
    base = (
        emb.withColumn(
            "_x",
            F.transform(F.col("embedding"), lambda v: v.cast("double")),
        )
        .withColumn("_vmin", F.array_min("_x"))
        .withColumn("_vmax", F.array_max("_x"))
    )
    span = F.col("_vmax") - F.col("_vmin")
    code = F.transform(
        "_x",
        lambda v: F.when(span == 0, F.lit(0)).otherwise(
            F.round((v - F.col("_vmin")) / (span / F.lit(255.0)), 0)
        ).cast("int"),
    )
    return base, code


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Per-vector int8 (0..255) min-max quantization — the standard
    vector-store compression step (4x over float32, 8x over float64)
    ahead of ANN serving.

    Pure JVM array arithmetic, embarrassingly parallel, zero shuffle.
    Cross-engine exactness: codes use only IEEE subtraction/division +
    round-half-away (Spark HALF_UP == DuckDB round for the non-negative
    operands here), so any engine derives identical codes; constant
    vectors (span 0) map to all-zero codes.  Emits the quantization
    params and an md5 over the joined codes (arrays never cross the
    driver contract raw).
    """
    base, code = _sq_kernel(emb)
    return base.select(
        "vec_id",
        "label",
        F.size("_x").alias("n_dims"),
        F.round("_vmin", 6).alias("q_min"),
        F.round("_vmax", 6).alias("q_max"),
        F.md5(
            F.array_join(F.transform(code, lambda c: c.cast("string")), ",")
        ).alias("codes_md5"),
    )


def build_ivf_index(
    emb: DataFrame, path: str, centroids: list[list[float]]
) -> None:
    """Persist an IVF-Flat index: vectors partitioned ON DISK by their
    coarse cell + a small centroids table.

    ``partitionBy("cell")`` is the on-disk analog of the nprobe scan
    prune: a probing query's ``cell IN (...)`` filter becomes a
    PARTITION filter, so only nprobe/K of the files are ever opened —
    at corpus scale the index read is O(corpus * nprobe / K) bytes with
    zero shuffle.  Build cost: one assignment pass + one write.
    """
    spark = emb.sparkSession
    # repartition on the partition column first: without it every task
    # writes into every cell directory (tasks x cells small files)
    ivf_assign(emb, centroids).repartition("cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(f"{path}/vectors")
    spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_from_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k served FROM a persisted index (build_ivf_index):
    identical results to the in-memory ivf_topk, but the corpus scan
    prunes to the probed cells' partitions at the FILE level."""
    cents = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cell"],
    )
    centroids = [list(r["centroid"]) for r in cents]
    probe = _probe_cells(query_vec, centroids, nprobe)
    vecs = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probe)
    )
    return cosine_topk(vecs.drop("cell"), query_vec, k)


def build_ivf_sq_index(
    emb: DataFrame, path: str, centroids: list[list[float]]
) -> None:
    """Persist an IVF index with int8 scalar-quantized storage (the
    FAISS ``IVF,SQ8`` layout): per-vector (q_min, q_max) + 0..255 codes
    instead of raw float64 arrays — ~8x less index I/O per probe, which
    at 100 TB is the difference between an index read that fits the
    probe budget and one that doesn't.

    Same on-disk shape as :func:`build_ivf_index` otherwise: vectors
    ``partitionBy("cell")`` so the probe's ``cell IN (...)`` predicate
    is a FILE-level partition filter; repartition-on-cell before the
    write keeps it one file per cell, not tasks x cells.
    """
    spark = emb.sparkSession
    base, code = _sq_kernel(ivf_assign(emb, centroids))
    rows = base.select(
        "vec_id",
        "label",
        "cell",
        F.col("_vmin").alias("q_min"),
        F.col("_vmax").alias("q_max"),
        code.alias("codes"),
    )
    rows.repartition("cell").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(f"{path}/vectors")
    spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_sq_topk_from_index(
    spark,
    path: str,
    exact_emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rescore: int | None = None,
) -> DataFrame:
    """ANN top-k served from a persisted IVF-SQ index
    (:func:`build_ivf_sq_index`): approximate cosine from the int8
    codes selects ``rescore`` candidates (default 4k), then ONLY those
    rows are exact-rescored against the full-precision base table —
    the standard two-stage SQ serving plan (probe-pruned code read,
    tiny broadcast join, exact top-k over <= rescore rows).

    Determinism: codes are integer-exact cross-engine (see
    quantize_embeddings); reconstruction q_min + code * span/255 and
    the dot fold are order-fixed float64, rounded to 6dp before the
    candidate cutoff so the rescore boundary can't flip on last-bit
    differences.  Zero-span vectors reconstruct to constant q_min
    arrays; zero-norm reconstructions rank NULL (never candidates),
    matching cosine_topk's zero-norm contract.
    """
    rescore = rescore or 4 * k
    cents = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cell"],
    )
    centroids = [list(r["centroid"]) for r in cents]
    probe = _probe_cells(query_vec, centroids, nprobe)
    vecs = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probe)
    )
    # reconstruct inside codegen; `step` is scalar per row (constant
    # work per element — the O(d^2) inlining pitfall applies only to
    # per-array aggregates referenced in the lambda)
    step = (F.col("q_max") - F.col("q_min")) / F.lit(255.0)
    recon = F.transform(
        "codes", lambda c: F.col("q_min") + c.cast("double") * step
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5 or 1.0
    rn = _norm(recon)
    approx = F.when(rn == 0, F.lit(None)).otherwise(
        _dot(recon, q) / (rn * F.lit(qn))
    )
    cands = (
        vecs.select("vec_id", F.round(approx, 6).alias("approx"))
        .orderBy(F.desc("approx"), "vec_id")
        .limit(rescore)
    )
    # exact rescore: candidates are <= rescore rows — broadcast them
    # into the base table (never the other way round)
    survivors = exact_emb.join(
        F.broadcast(cands.select("vec_id")), "vec_id"
    )
    return cosine_topk(survivors, query_vec, k)


def train_pq_codebooks(
    emb: DataFrame, m: int = 8, ksub: int = 16, sample: int = 2048
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``m`` subspaces of
    ``dim/m`` components, ``ksub`` codewords each (the FAISS ``PQm``
    trainer shape).

    Training runs on a DETERMINISTIC driver-side sample (the ``sample``
    lowest vec_ids): codebook quality needs only a representative
    sample, so train cost is O(sample * ksub) regardless of corpus
    size — at 100 TB the sample read is a LIMIT-pushed scan of a few
    thousand rows, not a corpus pass.  Seeding (first ``ksub`` distinct
    sub-vectors in vec_id order) + one Lloyd refinement pass mirror
    :func:`train_centroids`'s kmeans-lite: every step is deterministic,
    so two builds over the same corpus emit byte-identical codebooks.
    """
    if m <= 0 or ksub <= 0:
        raise ValueError("m and ksub must be positive")
    rows = (
        emb.filter(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(sample)
        .select("embedding")
        .collect()
    )
    if not rows:
        raise ValueError("train_pq_codebooks: no non-null embeddings")
    dim = len(rows[0]["embedding"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    vecs = [
        [float(v) for v in r["embedding"]]
        for r in rows
        if len(r["embedding"]) == dim
    ]
    books: list[list[list[float]]] = []
    for i in range(m):
        subs = [v[i * dsub : (i + 1) * dsub] for v in vecs]
        seeds: list[list[float]] = []
        for s in subs:  # first ksub DISTINCT sub-vectors, vec_id order
            if s not in seeds:
                seeds.append(s)
            if len(seeds) == ksub:
                break
        while len(seeds) < ksub:  # degenerate corpus: pad (dup codewords
            seeds.append(list(seeds[-1]))  # are harmless — argmin ties
        # one Lloyd pass: assign to nearest seed (first wins ties), move
        # each codeword to its members' mean
        sums = [[0.0] * dsub for _ in range(ksub)]
        counts = [0] * ksub
        for s in subs:
            best, bd = 0, None
            for ci, c in enumerate(seeds):
                d = sum((a - b) * (a - b) for a, b in zip(s, c))
                if bd is None or d < bd:
                    best, bd = ci, d
            counts[best] += 1
            for j, a in enumerate(s):
                sums[best][j] += a
        book = [
            [x / counts[ci] for x in sums[ci]] if counts[ci] else seeds[ci]
            for ci in range(ksub)
        ]
        books.append(book)
    return books


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Adds ``codes``: per-subspace nearest-codeword index (array<int>
    of length m, values in [0, ksub)).

    Pure JVM: m*ksub squared-L2 folds per row inside codegen, zero
    shuffle.  Each subspace slice is materialized as a column FIRST —
    referenced directly inside the ksub distance expressions it would
    be inlined and re-sliced per codeword (the O(d^2) inlining
    pitfall).  Distances round to 6dp before the argmin (first minimal
    index wins) so near-ties can't flip on last-bit float differences
    — the same cross-engine contract as :func:`ivf_assign`.
    """
    if not codebooks or not codebooks[0]:
        raise ValueError("codebooks must be non-empty")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out = emb.withColumn(
        "_x", F.transform("embedding", lambda v: v.cast("double"))
    )
    for i in range(m):
        out = out.withColumn(
            f"_s{i}", F.slice("_x", i * dsub + 1, dsub)
        )
    codes = []
    for i, book in enumerate(codebooks):
        sub = F.col(f"_s{i}")
        dists = F.array(
            *[
                F.round(
                    F.aggregate(
                        F.zip_with(
                            sub,
                            F.array(*[F.lit(float(v)) for v in c]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ),
                    6,
                )
                for c in book
            ]
        )
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return out.withColumn("codes", F.array(*codes)).drop(
        "_x", *[f"_s{i}" for i in range(m)]
    )


def build_ivf_pq_index(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
) -> None:
    """Persist an IVF index with product-quantized storage (the FAISS
    ``IVF,PQm`` layout): m uint8 codes per vector — for d=64/m=8 that is
    8 bytes/vector vs SQ8's 64+16, another ~8x less probe I/O, the
    layout that keeps a 10^12-vector index memory-mappable.

    Same on-disk shape as the Flat/SQ builders: ``partitionBy("cell")``
    makes the probe's ``cell IN (...)`` a FILE-level partition filter;
    repartition-on-cell first keeps one file per cell.  The codebooks
    persist beside the centroids — serving reads BOTH tiny tables, so
    an index is self-contained (no out-of-band codebook handoff that
    could drift from the codes)."""
    spark = emb.sparkSession
    rows = pq_encode(ivf_assign(emb, centroids), codebooks).select(
        "vec_id", "label", "cell", "codes"
    )
    rows.repartition("cell").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(f"{path}/vectors")
    spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (i, ci, [float(v) for v in c])
            for i, book in enumerate(codebooks)
            for ci, c in enumerate(book)
        ],
        "sub int, code int, codeword array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivf_pq_topk_from_index(
    spark,
    path: str,
    exact_emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rescore: int | None = None,
) -> DataFrame:
    """ANN top-k served from a persisted IVF-PQ index via asymmetric
    distance computation (ADC): the query is NOT quantized — per
    subspace, dot(query_sub, codeword) and ||codeword||^2 are
    precomputed driver-side into m*ksub lookup tables, so scoring a
    vector is m table lookups + adds (no per-row vector math at all).

    approx cosine = sum_i LUT_dot[i][code_i]
                    / (sqrt(sum_i LUT_n2[i][code_i]) * ||q||)
    — the codeword-reconstruction cosine, exactly what scoring the
    reconstructed vector would give, at 1/dsub the flops.  The LUTs
    ride into the plan as literal arrays indexed by ``i*ksub + code``
    (zip_with over (codes, 0..m-1) + element_at): pure JVM, zero
    shuffle, probe-pruned scan.  Top ``rescore`` candidates (default
    4k, 6dp-rounded cutoff like the SQ server) broadcast into the
    full-precision base table for the exact final top-k."""
    rescore = rescore or 4 * k
    cents = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cell"],
    )
    centroids = [list(r["centroid"]) for r in cents]
    probe = _probe_cells(query_vec, centroids, nprobe)
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r["sub"] for r in cb_rows) + 1
    ksub = max(r["code"] for r in cb_rows) + 1
    books: list[list[list[float]]] = [
        [None] * ksub for _ in range(m)  # type: ignore[list-item]
    ]
    for r in cb_rows:
        books[r["sub"]][r["code"]] = list(r["codeword"])
    dsub = len(books[0][0])
    lut_dot, lut_n2 = [], []
    for i in range(m):
        qs = query_vec[i * dsub : (i + 1) * dsub]
        for c in books[i]:
            lut_dot.append(sum(float(a) * float(b) for a, b in zip(qs, c)))
            lut_n2.append(sum(float(v) * float(v) for v in c))
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5 or 1.0
    dot_flat = F.array(*[F.lit(v) for v in lut_dot])
    n2_flat = F.array(*[F.lit(v) for v in lut_n2])
    idx = F.zip_with(
        "codes",
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, i: i * F.lit(ksub) + c + 1,
    )
    adot = F.aggregate(
        idx, F.lit(0.0), lambda acc, j: acc + F.element_at(dot_flat, j)
    )
    an2 = F.aggregate(
        idx, F.lit(0.0), lambda acc, j: acc + F.element_at(n2_flat, j)
    )
    approx = F.when(an2 == 0, F.lit(None)).otherwise(
        adot / (F.sqrt(an2) * F.lit(qn))
    )
    vecs = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probe)
    )
    cands = (
        vecs.select("vec_id", F.round(approx, 6).alias("approx"))
        .orderBy(F.desc("approx"), "vec_id")
        .limit(rescore)
    )
    survivors = exact_emb.join(
        F.broadcast(cands.select("vec_id")), "vec_id"
    )
    return cosine_topk(survivors, query_vec, k)
