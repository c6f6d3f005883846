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
    """Brute-force cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5
    e = F.col("embedding").cast("array<double>")
    cos = _dot(e, q) / (_norm(e) * F.lit(qn))
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
