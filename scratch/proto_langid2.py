"""Component breakdown for lang_id at a given sf."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from helix_html2md_spark.functions.langid import (
    _LATIN_KEEP, LATIN_STOPWORDS, SCRIPT_RANGES, _latin_tokens, _best_vote,
)
from helix_html2md_spark.session import build_session


def t(name, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{name}: {time.perf_counter() - t0:.3f}s", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = build_session("proto-langid2", master="local[32]",
                          shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = F.col("text")

    print(docs.agg(F.count("*"), F.sum(F.length("text")),
                   F.avg(F.length("text"))).collect())

    t("baseline scan+len", docs.select("doc_id", F.length(c).alias("x")))

    sc0 = [
        (F.length(c) - F.length(F.regexp_replace(c, "[" + b + "]+", "")))
        .alias(n)
        for n, b in SCRIPT_RANGES.items()
    ]
    t("scripts v0 (replace)", docs.select("doc_id", *sc0))

    sc1 = [F.regexp_count(c, F.lit("[" + b + "]")).alias(n)
           for n, b in SCRIPT_RANGES.items()]
    t("scripts v1 (count)", docs.select("doc_id", *sc1))

    nonlatin = "".join(b for n, b in SCRIPT_RANGES.items() if n != "latin")
    probe = c.rlike("[" + nonlatin + "]")
    lat = F.regexp_count(c, F.lit("[" + SCRIPT_RANGES["latin"] + "]"))
    sc2 = F.when(
        probe,
        F.struct(*[
            F.regexp_count(c, F.lit("[" + b + "]")).alias(n)
            for n, b in SCRIPT_RANGES.items()
        ]),
    ).otherwise(
        F.struct(
            lat.alias("latin"),
            *[F.lit(0).alias(n) for n in SCRIPT_RANGES if n != "latin"],
        )
    )
    t("scripts v2 (probe+branch)", docs.select("doc_id", sc2.alias("s")))

    cleaned = F.regexp_replace(F.lower(c), "[^" + _LATIN_KEEP + "]+", " ")
    t("cleaned build", docs.select("doc_id", F.length(cleaned).alias("x")))

    t("latin tokens (split)", docs.select(
        "doc_id", F.size(_latin_tokens(c)).alias("x")))

    st = docs.select("doc_id", _latin_tokens(c).alias("_lt")).select(
        "doc_id", _best_vote(F.col("_lt")).alias("b"))
    t("stopvote v0 (tokens+7 filters)", st)

    pad = F.concat(F.lit(" "), cleaned, F.lit(" "))
    alts = [F.regexp_count(
        pad, F.lit("(?<= )(?:" + "|".join(LATIN_STOPWORDS[code]) + ")(?= )"))
        for code in sorted(LATIN_STOPWORDS)]
    t("stopvote v1 (7 regexp_count)",
      docs.select("doc_id", sum(alts).alias("x")))

    allw = sorted({w for ws in LATIN_STOPWORDS.values() for w in ws})
    hits = F.regexp_extract_all(
        pad, F.lit("(?<= )(?:" + "|".join(allw) + ")(?= )"), 0)
    t("stopvote v2a (1 extract_all)",
      docs.select("doc_id", F.size(hits).alias("x")))

    h = docs.select("doc_id", hits.alias("_h"))
    vote_cols = []
    for code in sorted(LATIN_STOPWORDS):
        stop = F.array(*[F.lit(w) for w in LATIN_STOPWORDS[code]])
        vote_cols.append(F.size(F.filter(
            F.col("_h"), lambda w: F.array_contains(stop, w))).alias(code))
    t("stopvote v2 (extract_all + 7 small filters)",
      h.select("doc_id", *vote_cols))

    spark.stop()


if __name__ == "__main__":
    main()
