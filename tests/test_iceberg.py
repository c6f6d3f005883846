"""Iceberg round-trip (skip-if-no-jars: the sandbox ships no Iceberg
runtime; on a deployment with the jar this exercises the REAL
writeTo(...).append() + snapshot-resume semantics promised in
plans/job.py, via an isolated session with a local Hadoop catalog)."""

import glob
import os

import pytest

_JARS = glob.glob(
    os.path.join(
        os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
        "jars",
        "iceberg-spark-runtime*",
    )
) + glob.glob("/opt/spark/jars/iceberg-spark-runtime*")

pytestmark = pytest.mark.skipif(
    not _JARS, reason="Iceberg runtime jar not on the classpath"
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    from helix_html2md_spark.plans.iceberg import iceberg_session_conf

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    b = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-test")
        .config("spark.sql.shuffle.partitions", "4")
    )
    for k, v in iceberg_session_conf(wh).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    yield spark
    spark.stop()


def test_iceberg_append_resume_roundtrip(iceberg_spark, tmp_path):
    from pyspark.sql import functions as F

    from helix_html2md_spark.plans.iceberg import (
        current_snapshot_id, has_iceberg, run_extract_job_iceberg,
    )
    from helix_html2md_spark.sources.synthetic import synthetic_documents

    assert has_iceberg(iceberg_spark)
    docs = synthetic_documents(iceberg_spark, 8, seed=3, partitions=2)
    inp = str(tmp_path / "in")
    docs.write.parquet(inp)
    table = "graft.db.extracted_test"

    m1 = run_extract_job_iceberg(
        iceberg_spark, inp, table, run_id="r1", num_partitions=2
    )
    out1 = iceberg_spark.read.format("iceberg").load(table)
    assert out1.count() == 8
    snap1 = current_snapshot_id(iceberg_spark, table)
    assert m1["snapshot_id"] == snap1

    # resume: nothing left to do -> appends an empty snapshot, rows stable
    run_extract_job_iceberg(
        iceberg_spark, inp, table, run_id="r2", num_partitions=2
    )
    out2 = iceberg_spark.read.format("iceberg").load(table)
    assert out2.count() == 8
    assert out2.filter(F.col("status") == "ok").count() == 8
