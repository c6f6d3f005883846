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
    todo_ids = {r["doc_id"] for r in todo.select("doc_id").collect()}
    assert all(d >= "synth:00000020" for d in todo_ids)

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


def test_resume_with_same_run_id_does_not_double_count(spark, corpus, tmp_path):
    """The documented resume flow reruns the IDENTICAL command — same
    run_id.  Each call's lineage must cover only the rows that call
    wrote (attempt-scoped), never re-count the prior attempt's."""
    out = str(tmp_path / "same_rid")
    # a PARTIAL first attempt (half the corpus behind a separate input
    # path), then the documented resume: the identical command over the
    # full corpus with the SAME run_id — both attempts write rows, so
    # the attempt-isolation claim is actually observable in lineage
    partial_in = str(tmp_path / "partial_in")
    docs = spark.read.parquet(corpus)
    docs.filter("doc_id < 'synth:00000020'").write.parquet(partial_in)
    m1 = run_extract_job(spark, partial_in, out, run_id="rX",
                         num_partitions=2)
    n1 = m1["docs"]
    assert n1 == 20
    m2 = run_extract_job(spark, corpus, out, run_id="rX", num_partitions=2)
    assert m2["docs"] == 20  # only the un-extracted half
    lineage = spark.read.parquet(out + "_lineage").filter("run_id = 'rX'")
    rows = lineage.collect()
    # two attempts, two disjoint attempt scopes: total doc_ids_done over
    # the run_id is 20 + 20, NOT double-counted
    assert sum(r["doc_ids_done"] for r in rows) == 40
    # the isolation claim itself: two calls, two DISTINCT attempt ids
    # (a shared id is the exact collision attempt-scoping prevents)
    assert lineage.select("attempt_id").distinct().count() == 2
    # and a third, nothing-to-do call records 0 docs and 0 lineage rows
    m3 = run_extract_job(spark, corpus, out, run_id="rX", num_partitions=2)
    assert m3["docs"] == 0


def test_resume_recovers_from_uncommitted_output_dir(spark, corpus, tmp_path):
    """An output dir holding only _temporary/ (driver died mid-first-
    write) has zero committed rows: the next run must treat it as a
    first run instead of raising UNABLE_TO_INFER_SCHEMA forever."""
    import os

    out = str(tmp_path / "wedged")
    os.makedirs(os.path.join(out, "_temporary", "0"))
    m = run_extract_job(spark, corpus, out, run_id="rW", num_partitions=2)
    assert m["docs"] > 0
    assert spark.read.parquet(out).count() == m["docs"]
