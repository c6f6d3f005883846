"""Prototype: lang_id strategies.

v0: current (8 regexp_replace script counts + tokenized stopword filters)
v1: regexp_count script counts + padded lookaround regexp_count stopword
    hits (no token array at all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F

from helix_html2md_spark.functions.langid import (
    _LATIN_KEEP, LATIN_STOPWORDS, SCRIPT_RANGES, _decide,
)
from helix_html2md_spark.session import build_session


def _count_class_v1(col, body: str) -> Column:
    return F.regexp_count(col, F.lit("[" + body + "]"))


def lang_stats_v1(df: DataFrame, text_col: str = "text", keep=()) -> DataFrame:
    c = F.col(text_col)
    cleaned = F.regexp_replace(F.lower(c), "[^" + _LATIN_KEEP + "]+", " ")
    staged = df.withColumn(
        "_sc",
        F.struct(
            *[
                _count_class_v1(c, body).alias(name)
                for name, body in SCRIPT_RANGES.items()
            ]
        ),
    ).withColumn("_pad", F.concat(F.lit(" "), cleaned, F.lit(" ")))
    hit_cols = {}
    for code in sorted(LATIN_STOPWORDS):
        alt = "|".join(LATIN_STOPWORDS[code])
        hit_cols[code] = F.regexp_count(
            F.col("_pad"), F.lit(f"(?<= )(?:{alt})(?= )")
        )
    entries = [
        F.struct((-hit_cols[code]).alias("nh"), F.lit(code).alias("lg"))
        for code in sorted(LATIN_STOPWORDS)
    ]
    best = F.element_at(F.array_sort(F.array(*entries)), 1)
    staged = staged.withColumn("_best", best)
    s = {name: F.col("_sc")[name] for name in SCRIPT_RANGES}
    vote = F.when(
        F.col("_best")["nh"] < 0, F.col("_best")["lg"]
    ).otherwise(F.lit("und"))
    return staged.select("doc_id", *keep, _decide(s, vote).alias("lang_pred"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from helix_html2md_spark.functions.langid import lang_stats as v0

    spark = build_session("proto-langid", master="local[32]",
                          shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    outs = {}
    for name, fn in [("v0", v0), ("v1", lang_stats_v1)]:
        spark.sparkContext.setJobDescription(f"langid {name}")
        t0 = time.perf_counter()
        rows = fn(docs, keep=("lang",)).orderBy("doc_id").collect()
        wall = time.perf_counter() - t0
        outs[name] = [tuple(r) for r in rows]
        print(f"{name}: {wall:.3f}s  ({len(rows)} rows)", flush=True)
    print("v1 == v0:", outs["v1"] == outs["v0"])
    if outs["v1"] != outs["v0"]:
        for a, b in zip(outs["v0"], outs["v1"]):
            if a != b:
                print("first diff:", a, b)
                break
    spark.stop()


if __name__ == "__main__":
    main()
