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
    """True when the Iceberg runtime is on the session classpath.

    Must actually LOAD the class: py4j resolves a missing class to a
    JavaPackage object without raising (it only errors when called), so
    a bare attribute probe returns True on every session.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 - ClassNotFound via py4j
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
            partition_id int,
            run_id string,
            attempt_id string
        ) USING iceberg
        PARTITIONED BY (bucket({n_buckets}, doc_id))
        """
    )


def append_extracted(
    df: DataFrame, table: str, attempt_id: str | None = None
) -> None:
    """Append one run's output as a single Iceberg snapshot (atomic).

    ``attempt_id`` is stamped into the commit's snapshot summary
    (Iceberg's ``snapshot-property.`` write-option prefix), so the
    snapshot this exact append created can be looked up by value —
    see :func:`snapshot_id_for_attempt`."""
    w = df.writeTo(table)
    if attempt_id is not None:
        w = w.option("snapshot-property.attempt_id", attempt_id)
    w.append()


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    # snapshot_id DESC tie-break: committed_at has millisecond grain, so
    # two snapshots in the same millisecond (routine in tests/small
    # runs) would otherwise pick arbitrarily and corrupt lineage
    # provenance
    row = (
        spark.sql(f"SELECT snapshot_id FROM {table}.snapshots "
                  "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1")
        .collect()
    )
    return int(row[0][0]) if row else None


def snapshot_id_for_attempt(
    spark: SparkSession, table: str, attempt_id: str
) -> int | None:
    """The snapshot a specific append committed, matched by the
    attempt_id stamped into its summary.

    'Read the current snapshot after my append' misattributes lineage
    under concurrency: another writer committing between our append and
    the read makes THEIR snapshot the current one, and our lineage rows
    would permanently record it (the exact provenance the module
    promises).  The summary match is immune — one attempt_id, one
    commit."""
    quoted = attempt_id.replace("'", "''")  # public API: escape literals
    rows = spark.sql(
        f"SELECT snapshot_id FROM {table}.snapshots "
        f"WHERE summary['attempt_id'] = '{quoted}' "
        "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
    ).collect()
    return int(rows[0][0]) if rows else None


def remaining_documents_iceberg(
    docs: DataFrame, table: str
) -> DataFrame:
    """Snapshot-consistent resume: anti-join against the doc_ids already
    committed to the table's current snapshot.

    Only a MISSING table disables resume (first run); any other read
    failure propagates — swallowing a transient catalog/storage error
    would silently re-extract everything and append duplicates (same
    invariant as plans/job.remaining_documents).
    """
    from pyspark.errors import AnalysisException

    from .job import _BROADCAST_DONE_MAX_ROWS

    spark = docs.sparkSession
    try:
        done = spark.read.format("iceberg").load(table).select("doc_id")
        n_done = done.count()  # manifest-metadata count — cheap
    except AnalysisException as e:
        msg = str(e)
        if (
            "TABLE_OR_VIEW_NOT_FOUND" in msg
            or "NoSuchTableException" in msg
            or "Table or view not found" in msg
        ):
            return docs  # first run: table not created yet
        raise
    # broadcast only while the done-set plausibly fits every executor;
    # at the documented 10^12-doc scale the committed set is billions of
    # rows and an unconditional broadcast OOMs exactly when resume
    # matters most — the shuffled anti-join can be planned bucket-local
    # (both sides bucketed by doc_id)
    if n_done <= _BROADCAST_DONE_MAX_ROWS:
        done = F.broadcast(done)
    return docs.join(done, "doc_id", "left_anti")


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
    import uuid

    from ..operators.extract import extract_documents

    create_extracted_table(spark, table)
    docs = spark.read.parquet(input_path)
    todo = remaining_documents_iceberg(docs, table)

    # attempt_id scopes the lineage read-back to the rows THIS call
    # wrote: run_id repeats across a crashed run and its resume (the
    # documented flow is "rerun the identical command"), and aggregating
    # the whole table would double-count prior runs' rows under this
    # run_id with colliding partition_ids (same invariant as plans/job)
    attempt_id = uuid.uuid4().hex
    extracted = (
        extract_documents(todo, config, num_partitions=num_partitions)
        .withColumn("partition_id", F.spark_partition_id())
        .withColumn("run_id", F.lit(run_id))
        .withColumn("attempt_id", F.lit(attempt_id))
    )

    # localCheckpoint (NOT a plain persist) so the lineage aggregate
    # and the append share ONE truncated-lineage materialization.  Two
    # reasons over re-reading the table filtered on attempt_id: (1)
    # cost — the table is partitioned by bucket(doc_id), so the filter
    # prunes nothing and each resume re-reads ALL committed history
    # just to aggregate rows it wrote seconds ago; (2) correctness
    # under recompute — a persist's cache can drop between the two
    # actions, and the recompute re-plans the resume anti-join against
    # the THEN-CURRENT snapshot (a concurrent commit in the gap would
    # shrink the todo set, silently de-syncing lineage from the rows
    # actually appended).  Checkpointing severs the plan: either both
    # actions read the same stored blocks, or a lost executor fails
    # LOUDLY instead of diverging.  (On a long-lived cluster session,
    # prefer a reliable checkpoint dir for executor-loss tolerance.)
    extracted = extracted.localCheckpoint(eager=True)
    lineage = (
        extracted.groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_ids_done"),
            F.sum(
                F.when(F.col("status") != "ok", 1).otherwise(0)
            ).alias("docs_failed"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("attempt_id", F.lit(attempt_id))
    )
    lineage_rows = lineage.collect()
    t0 = time.perf_counter()
    append_extracted(extracted, table, attempt_id)
    wall = time.perf_counter() - t0
    # snapshot provenance: match OUR commit by its stamped attempt_id
    # (the post-append "current" snapshot may already be a concurrent
    # writer's); fall back to current for catalogs that drop custom
    # summary properties
    snap = snapshot_id_for_attempt(spark, table, attempt_id)
    if snap is None:
        snap = current_snapshot_id(spark, table)

    # append per run (createOrReplace would drop prior runs' lineage)
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table}_lineage (
            partition_id int,
            doc_ids_done bigint,
            docs_failed bigint,
            run_id string,
            attempt_id string,
            snapshot_id bigint
        ) USING iceberg
        """
    )
    spark.createDataFrame(lineage_rows, lineage.schema).withColumn(
        "snapshot_id", F.lit(snap).cast("long")
    ).writeTo(f"{table}_lineage").append()
    return {"run_id": run_id, "snapshot_id": snap, "wall_sec": round(wall, 3)}
