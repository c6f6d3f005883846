"""Resumable batch extraction job (SURVEY.md §3.4, M4).

Snapshot-checkpoint semantics without requiring Iceberg jars in the
sandbox: the output table is an append-only parquet dataset whose
committed files ARE the snapshot; resume = ``left_anti`` join of the
input against already-extracted doc_ids (broadcast when small).  On a
real deployment the same plan runs against Iceberg
(``spark.read.format("iceberg")`` / ``writeTo(...).append()``) — the
anti-join resume and lineage logic is storage-agnostic.

Per-partition lineage rows + ``observe()`` run metrics (docs/sec, parse
failures, span counts) land next to the output
(FIXTURES.md §3: checkpoint_lineage / run_metrics).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..operators.extract import extract_documents


# broadcast the done-set only while it plausibly fits every executor;
# past this row count, fall back to a shuffled anti-join (AQE picks the
# strategy) — an unconditional broadcast would OOM the driver / hit the
# 8GB broadcast cap exactly when resume matters most
_BROADCAST_DONE_MAX_ROWS = 10_000_000


def remaining_documents(docs: DataFrame, output_path: str) -> DataFrame:
    """Anti-join resume: drop doc_ids already present in the output.

    Only a MISSING output disables resume (first run).  Any other read
    failure — transient storage error, corrupt footer, wrong schema —
    must PROPAGATE: swallowing it would silently reprocess everything
    and append duplicate rows, breaking the exactly-once-per-doc
    invariant."""
    from pyspark.errors import AnalysisException

    spark = docs.sparkSession
    try:
        done = spark.read.parquet(output_path).select("doc_id")
        n_done = done.count()  # parquet metadata count — cheap
    except AnalysisException as e:
        msg = str(e)
        # UNABLE_TO_INFER_SCHEMA: the dir exists but holds no committed
        # data files (a first run whose driver died mid-write leaves
        # only _temporary/) — zero committed rows is semantically a
        # first run, and treating it as fatal wedges resume until the
        # directory is deleted by hand
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return docs  # first run: no (committed) output yet
        raise
    if n_done <= _BROADCAST_DONE_MAX_ROWS:
        done = F.broadcast(done)
    return docs.join(done, "doc_id", "left_anti")


def run_extract_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    *,
    run_id: str,
    config: DataFrame | None = None,
    num_partitions: int | None = None,
    defaults: dict | None = None,
) -> dict:
    """Extract all unprocessed documents; append output + lineage.

    Returns the run-metrics dict (also written to
    ``{output_path}_metrics``).
    """
    docs = spark.read.parquet(input_path)
    todo = remaining_documents(docs, output_path)

    obs = Observation("extract")
    extracted = extract_documents(
        todo, config, num_partitions=num_partitions, defaults=defaults
    ).observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum(
            F.when(F.col("status") != "ok", 1).otherwise(0)
        ).alias("failures"),
        F.sum(F.size("spans")).alias("span_count"),
    )
    # attempt_id is generated PER CALL: the documented resume flow is
    # "rerun the identical command", so run_id repeats across a crashed
    # run and its resume — filtering the lineage read-back on run_id
    # alone would fold the prior attempt's committed rows into this
    # attempt's lineage (double-counted doc_ids_done, colliding
    # partition_ids).  run_id stays the user-facing key; attempt_id
    # scopes the read-back to the rows THIS call wrote.
    import uuid

    attempt_id = uuid.uuid4().hex
    extracted = (
        extracted.withColumn("partition_id", F.spark_partition_id())
        .withColumn("run_id", F.lit(run_id))
        .withColumn("attempt_id", F.lit(attempt_id))
    )

    t0 = time.perf_counter()
    extracted.write.mode("append").parquet(output_path)
    wall = time.perf_counter() - t0
    stats = obs.get

    # per-partition lineage over THIS ATTEMPT'S rows only.  The read
    # uses an EXPLICIT schema, not mergeSchema: schema merging reads
    # every file footer in the output history on every run (O(total
    # files) and growing), while a fixed schema is O(1) — files written
    # by older versions (or seeded outside this job) lack run_id /
    # attempt_id, read those columns as null, and are correctly
    # excluded by the filter.
    out = (
        spark.read.schema(extracted.schema)
        .parquet(output_path)
        .filter(F.col("attempt_id") == attempt_id)
    )
    lineage = (
        out.groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_ids_done"),
            F.sum(
                F.when(F.col("status") != "ok", 1).otherwise(0)
            ).alias("docs_failed"),
            F.sum("n_chars").alias("chars_out"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("attempt_id", F.lit(attempt_id))
    )
    lineage.write.mode("append").parquet(f"{output_path}_lineage")

    docs_n = int(stats.get("docs") or 0)
    metrics = {
        "run_id": run_id,
        "docs": docs_n,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(docs_n / wall, 2) if wall > 0 else 0.0,
        "parse_failures": int(stats.get("failures") or 0),
        "span_count": int(stats.get("span_count") or 0),
    }
    spark.createDataFrame([metrics]).write.mode("append").parquet(
        f"{output_path}_metrics"
    )
    return metrics
