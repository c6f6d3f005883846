"""Prototype: simhash bit-count strategies, timed at a given sf.

v0: current (64 interpreted size(filter) passes over decoded longs)
v1: per-position digit strings + translate bit-counts (codegen string ops)
v2: explode + codegen CASE sums + groupBy(doc_id)

All three must produce identical (doc_id, simhash) rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F

from helix_html2md_spark.functions.text import tokens
from helix_html2md_spark.session import build_session

# hex digits whose nibble-bit k is set
_BIT_SETS = {
    0: "13579bdf",
    1: "2367abef",
    2: "4567cdef",
    3: "89abcdef",
}


def simhash_v1(docs: DataFrame) -> DataFrame:
    t = docs.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("_toks")
    )
    h = t.select(
        "doc_id",
        F.size("_toks").alias("_n"),
        F.transform(
            F.col("_toks"), lambda w: F.substring(F.md5(w), 1, 16)
        ).alias("_hs"),
    )
    # one string per hex-digit position: the p-th char of every token hash
    pos_cols = [
        F.array_join(
            F.transform(F.col("_hs"), lambda s: F.substring(s, p, 1)), ""
        ).alias(f"_p{p}")
        for p in range(1, 17)
    ]
    v = h.select("doc_id", "_n", *pos_cols)

    n = F.col("_n")

    def bit_term(b: int) -> Column:
        p = 16 - b // 4
        k = b % 4
        sp = F.col(f"_p{p}")
        ones = F.length(sp) - F.length(F.translate(sp, _BIT_SETS[k], ""))
        weight = -(1 << 63) if b == 63 else (1 << b)
        return F.when(ones * 2 > n, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    fp = bit_term(63)
    for b in range(63):
        fp = fp + bit_term(b)
    return v.select("doc_id", fp.alias("simhash"))


def simhash_v2(docs: DataFrame) -> DataFrame:
    t = docs.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("_toks")
    )
    ex = t.select(
        "doc_id",
        F.size("_toks").alias("_n"),
        F.explode_outer("_toks").alias("_w"),
    )
    hs = F.substring(F.md5("_w"), 1, 16)
    ex = ex.select(
        "doc_id",
        "_n",
        F.conv(F.substring(hs, 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring(hs, 9, 8), 16, 10).cast("long").alias("_lo"),
    )
    aggs = []
    for b in range(64):
        src = F.col("_lo") if b < 32 else F.col("_hi")
        mask = 1 << (b % 32)
        aggs.append(
            F.sum(
                F.when(src.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(0)
            ).alias(f"_o{b}")
        )
    g = ex.groupBy("doc_id").agg(F.first("_n").alias("_n"), *aggs)
    n = F.col("_n")

    def bit_term(b: int) -> Column:
        weight = -(1 << 63) if b == 63 else (1 << b)
        return F.when(
            F.col(f"_o{b}") * 2 > n, F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    fp = bit_term(63)
    for b in range(63):
        fp = fp + bit_term(b)
    return g.select("doc_id", fp.alias("simhash"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["v0", "v1", "v2"]
    from helix_html2md_spark.operators.dedup import simhash as simhash_v0

    spark = build_session("proto-simhash", master="local[32]",
                          shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    impls = {"v0": simhash_v0, "v1": simhash_v1, "v2": simhash_v2}

    outs = {}
    for name in which:
        fn = impls[name]
        spark.sparkContext.setJobDescription(f"simhash {name}")
        t0 = time.perf_counter()
        rows = fn(docs).orderBy("doc_id").collect()
        wall = time.perf_counter() - t0
        outs[name] = [(r["doc_id"], r["simhash"]) for r in rows]
        print(f"{name}: {wall:.3f}s  ({len(rows)} rows)", flush=True)
    base = outs.get("v0")
    if base is not None:
        for name, rows in outs.items():
            if name != "v0":
                print(f"{name} == v0: {rows == base}")
    spark.stop()


if __name__ == "__main__":
    main()
