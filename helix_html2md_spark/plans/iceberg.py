"""Iceberg-native source/sink for the extraction job (SURVEY.md §1.3).

The sandbox has no Iceberg runtime jar, so `plans/job.py` ships an
append-only-parquet stand-in; THIS module is the real table path — the
exact `writeTo(...).append()` / snapshot-resume plumbing a deployment
uses, exercised by `tests/test_iceberg.py` whenever the runtime jar is
on the classpath (skip-if-no-jars otherwise).

Scale notes (north_rule: 10^12-doc interleaved corpus):
* the table is partitioned by `bucket(N, doc_id)` so writes spread
  evenly and the resume anti-join can be planned bucket-local;
* resume uses the CURRENT SNAPSHOT's doc_ids via a left_anti join —
  Iceberg's snapshot isolation makes the read side a consistent cut,
  so a crashed run never double-extracts;
* `snapshot_id` is recorded in the lineage table, giving per-partition
  provenance (which snapshot a row landed in) and time-travel debugging
  (`VERSION AS OF`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


def iceberg_session_conf(warehouse: str, catalog: str = "graft") -> dict:
    """SparkSession config for a local Hadoop-catalog Iceberg warehouse.

    On a cluster deployment the catalog impl/uri change (e.g. REST or
    Glue) but every reader/writer below is catalog-agnostic.
    """
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def has_iceberg(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the session classpath."""
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:  # noqa: BLE001
        return False


def create_extracted_table(
    spark: SparkSession, table: str, n_buckets: int = 256
) -> None:
    """Create the output table, bucket-partitioned on doc_id."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
            doc_id string,
            spans array<struct<kind:string,text:string,media_ref:string,order:int>>,
            md string,
            status string,
            error string,
            n_images int,
            n_blocks int,
            n_chars int,
            partition_id int
        ) USING iceberg
        PARTITIONED BY (bucket({n_buckets}, doc_id))
        """
    )


def append_extracted(df: DataFrame, table: str) -> None:
    """Append one run's output as a single Iceberg snapshot (atomic)."""
    df.writeTo(table).append()


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    row = (
        spark.sql(f"SELECT snapshot_id FROM {table}.snapshots "
                  "ORDER BY committed_at DESC LIMIT 1")
        .collect()
    )
    return int(row[0][0]) if row else None


def remaining_documents_iceberg(
    docs: DataFrame, table: str
) -> DataFrame:
    """Snapshot-consistent resume: anti-join against the doc_ids already
    committed to the table's current snapshot."""
    spark = docs.sparkSession
    try:
        done = spark.read.format("iceberg").load(table).select("doc_id")
    except Exception:  # noqa: BLE001 - table absent: first run
        return docs
    return docs.join(F.broadcast(done), "doc_id", "left_anti")


def run_extract_job_iceberg(
    spark: SparkSession,
    input_path: str,
    table: str,
    *,
    run_id: str,
    config: DataFrame | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Iceberg-native twin of plans.job.run_extract_job: resume from the
    current snapshot, append atomically, record lineage + snapshot_id."""
    import time

    from ..operators.extract import extract_documents

    create_extracted_table(spark, table)
    docs = spark.read.parquet(input_path)
    todo = remaining_documents_iceberg(docs, table)

    extracted = extract_documents(
        todo, config, num_partitions=num_partitions
    ).withColumn("partition_id", F.spark_partition_id())

    t0 = time.perf_counter()
    append_extracted(extracted, table)
    wall = time.perf_counter() - t0
    snap = current_snapshot_id(spark, table)

    lineage = (
        spark.read.format("iceberg")
        .load(table)
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_ids_done"),
            F.sum(
                F.when(F.col("status") != "ok", 1).otherwise(0)
            ).alias("docs_failed"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("snapshot_id", F.lit(snap))
    )
    lineage.writeTo(f"{table}_lineage").createOrReplace()
    return {"run_id": run_id, "snapshot_id": snap, "wall_sec": round(wall, 3)}
