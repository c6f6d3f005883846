"""Full lang_stats v2 (regexp_count scripts + extract_all stopvote) vs v0."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from helix_html2md_spark.functions.langid import (
    _LATIN_KEEP, LATIN_STOPWORDS, SCRIPT_RANGES, _decide,
)
from helix_html2md_spark.session import build_session

_ALL_STOP = sorted({w for ws in LATIN_STOPWORDS.values() for w in ws})


def lang_stats_v2(df: DataFrame, text_col: str = "text", keep=()) -> DataFrame:
    c = F.col(text_col)
    cleaned = F.regexp_replace(F.lower(c), "[^" + _LATIN_KEEP + "]+", " ")
    pad = F.concat(F.lit(" "), cleaned, F.lit(" "))
    hits = F.regexp_extract_all(
        pad, F.lit("(?<= )(?:" + "|".join(_ALL_STOP) + ")(?= )"), 0
    )
    staged = df.withColumn(
        "_sc",
        F.struct(
            *[
                F.regexp_count(c, F.lit("[" + body + "]")).alias(name)
                for name, body in SCRIPT_RANGES.items()
            ]
        ),
    ).withColumn("_h", hits)
    entries = []
    for code in sorted(LATIN_STOPWORDS):
        stop = F.array(*[F.lit(w) for w in LATIN_STOPWORDS[code]])
        nh = -F.size(
            F.filter(F.col("_h"), lambda w: F.array_contains(stop, w))
        )
        entries.append(F.struct(nh.alias("nh"), F.lit(code).alias("lg")))
    staged = staged.withColumn(
        "_best", F.element_at(F.array_sort(F.array(*entries)), 1)
    )
    s = {name: F.col("_sc")[name] for name in SCRIPT_RANGES}
    vote = F.when(
        F.col("_best")["nh"] < 0, F.col("_best")["lg"]
    ).otherwise(F.lit("und"))
    return staged.select("doc_id", *keep, _decide(s, vote).alias("lang_pred"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    from helix_html2md_spark.functions.langid import lang_stats as v0

    spark = build_session("proto-langid3", master="local[32]",
                          shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    outs = {}
    for name, fn in [("v0", v0), ("v2", lang_stats_v2)]:
        spark.sparkContext.setJobDescription(f"langid {name}")
        t0 = time.perf_counter()
        rows = fn(docs, keep=("lang",)).orderBy("doc_id").collect()
        wall = time.perf_counter() - t0
        outs[name] = [tuple(r) for r in rows]
        print(f"{name}: {wall:.3f}s  ({len(rows)} rows)", flush=True)
    print("v2 == v0:", outs["v2"] == outs["v0"])
    if outs["v2"] != outs["v0"]:
        n = 0
        for a, b in zip(outs["v0"], outs["v2"]):
            if a != b:
                print("diff:", a, b)
                n += 1
                if n > 5:
                    break
    spark.stop()


if __name__ == "__main__":
    main()
