"""M4: resumability — kill between partitions -> rerun -> identical final
table, no reprocessing of done doc_ids (FIXTURES.md §3)."""

import pytest

from helix_html2md_spark.plans.job import remaining_documents, run_extract_job
from helix_html2md_spark.sources.synthetic import synthetic_documents


@pytest.fixture()
def corpus(spark, tmp_path):
    path = str(tmp_path / "docs")
    synthetic_documents(spark, 40, seed=7, partitions=4).write.parquet(path)
    return path


def test_resume_skips_done_docs(spark, corpus, tmp_path):
    out = str(tmp_path / "extracted")

    from pyspark.sql import functions as F

    from helix_html2md_spark.operators.extract import extract_documents

    docs = spark.read.parquet(corpus)
    # simulate a run killed halfway: only half the docs got committed
    first_half = docs.filter("doc_id < 'synth:00000020'")
    extract_documents(first_half, None, num_partitions=2).withColumn(
        "partition_id", F.spark_partition_id()
    ).write.mode("overwrite").parquet(out)

    todo = remaining_documents(docs, out)
    assert todo.count() == 20
    done_ids = {r["doc_id"] for r in todo.select("doc_id").collect()}
    assert all(d >= "synth:00000020" for d in done_ids)

    # resume run completes the table exactly once per doc
    m2 = run_extract_job(spark, corpus, out, run_id="r2", num_partitions=2)
    assert m2["docs"] == 20
    final = spark.read.parquet(out)
    assert final.count() == 40
    assert final.select("doc_id").distinct().count() == 40

    # a third run is a no-op
    m3 = run_extract_job(spark, corpus, out, run_id="r3", num_partitions=2)
    assert m3["docs"] == 0
    assert spark.read.parquet(out).count() == 40

    # lineage + metrics tables exist
    lineage = spark.read.parquet(out + "_lineage")
    assert lineage.filter("run_id = 'r2'").count() > 0
    metrics = spark.read.parquet(out + "_metrics")
    assert {r["run_id"] for r in metrics.collect()} >= {"r2", "r3"}


def test_deterministic_rerun(spark, corpus, tmp_path):
    """Same input -> byte-identical extraction (R5: no wall clock, no RNG)."""
    from helix_html2md_spark.operators.extract import extract_documents

    docs = spark.read.parquet(corpus)
    a = {
        r["doc_id"]: r["md"]
        for r in extract_documents(docs, None, num_partitions=4).collect()
    }
    b = {
        r["doc_id"]: r["md"]
        for r in extract_documents(docs, None, num_partitions=2).collect()
    }
    assert a == b
