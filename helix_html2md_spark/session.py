"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "helix-html2md-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 64,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create/get a session.

    * Arrow batches are capped small (64 rows) because a batch of 1 MB
      documents must fit in the Python worker (SURVEY.md §4.2).
    * AQE on: runtime coalescing + skew-join handling for the relational
      side-queries.
    """
    explicit = master is not None
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and not explicit and (
        master == "local" or master.startswith("local[")
    ):
        # env parallelism applies only when the caller didn't pin a
        # master, and only to single-JVM local[N] masters: a bare
        # startswith("local") also matches 'local-cluster[2,2,1024]'
        # and would silently rewrite a distributed-test master into one
        # JVM (no cross-executor serialization, no real shuffles)
        master = f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records)
        )
        .config("spark.sql.session.timeZone", "UTC")
        # pinned: the engine's null/overflow contracts are written and
        # oracled under ANSI semantics (size(NULL) = NULL, overflow
        # raises); a cluster-level ansi.enabled=false override would
        # silently turn null-text token counts into -1
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # deployment knobs the defaults can't know (catalog confs, executor
    # env like PYTHONPATH for multi-JVM masters, memory overrides) —
    # applied LAST so a deployment can override any default above
    for k, v in (extra_conf or {}).items():
        b = b.config(k, str(v))
    return b.getOrCreate()
