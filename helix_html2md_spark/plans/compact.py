"""Small-file compaction for parquet outputs.

A long-running extraction pipeline appends per-microbatch /
per-partition files; thousands of kilobyte files degrade every later
scan (footer-per-file metadata reads, task-per-file scheduling).  This
is the filesystem-level compactor — Iceberg's rewrite_data_files is the
transactional equivalent when the runtime jar is present
(plans/iceberg.py); this fallback targets plain parquet directories.

Scale shape: the driver only LISTS files (no data through the driver);
the rewrite is one read -> repartition(n) -> write of the data itself,
sized so each output file lands near ``target_mb``.  The swap is
rename-based and therefore not transactional — concurrent readers can
observe the `.compacting` window; run it from the single writer, or use
the Iceberg path for true snapshot isolation.
"""

from __future__ import annotations

import math
import os
import shutil
from urllib.parse import unquote


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a parquet directory."""
    n = total = 0
    for _root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(_root, f))
    return n, total


def _leaf_partition_bytes(path: str) -> dict[str, int]:
    """Bytes of data files per leaf directory, keyed by the relpath
    from ``path`` ('' for data files at the root)."""
    leaves: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        b = sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
        if b:
            rel = os.path.relpath(root, path)
            leaves[("" if rel == "." else rel)] = b
    return leaves


def _partition_columns(path: str) -> list[str]:
    """Hive-style partition columns of a parquet directory, in
    directory order ('bucket=a3/cell=7' -> ['bucket', 'cell'])."""
    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d
            for d in os.listdir(cur)
            if os.path.isdir(os.path.join(cur, d)) and "=" in d
        ]
        if not subdirs:
            return cols
        key = subdirs[0].split("=", 1)[0]
        cols.append(key)
        cur = os.path.join(cur, subdirs[0])


def _read_schema(spark, path: str, pcols: list[str]):
    """Explicit read schema: the data columns from ONE data file's own
    footer plus every partition column as STRING.

    This is how the rewrite avoids partition-column type inference
    WITHOUT touching the session conf (a session-global toggle would
    silently flip partition types for every concurrent reader in the
    same SparkSession): directory values are read back as the strings
    they are on disk, so the re-emitted directory names are
    byte-identical ('day=07' never becomes 'day=7')."""
    from pyspark.sql.types import StringType, StructField, StructType

    probe = None
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                probe = os.path.join(root, f)
                break
        if probe:
            break
    data_schema = spark.read.parquet(probe).schema
    return StructType(
        list(data_schema.fields)
        + [StructField(c, StringType()) for c in pcols]
    )


def compact_parquet(
    spark,
    path: str,
    *,
    target_mb: int = 256,
    min_files_to_compact: int = 8,
) -> dict:
    """Rewrite ``path`` into ceil(bytes / target_mb) files.

    Returns a metrics dict; a no-op (too few files, or already at/below
    the target count) reports ``compacted=False`` and touches nothing.
    """
    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".precompact"
    # recover from a prior crashed run BEFORE measuring anything: a
    # crash between the two swap renames leaves the dataset parked at
    # .precompact with no <path> (restore it); stale .compacting /
    # .precompact left alongside a live <path> are dead temp state
    # (remove, or the renames below raise on the next run)
    if os.path.isdir(old) and not os.path.isdir(path.rstrip("/")):
        os.rename(old, path.rstrip("/"))
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    if not os.path.isdir(path.rstrip("/")):
        # fail loudly: os.walk yields NOTHING for a missing path or a
        # remote URI (s3a://, hdfs://), which would otherwise report a
        # {compacted: False, n_files: 0} no-op indistinguishable from
        # "already compact" while the small-file problem persists (the
        # rename swap below is local-only anyway — use Iceberg's
        # rewrite_data_files for object stores)
        raise ValueError(
            f"compact_parquet needs an existing driver-local directory, "
            f"got {path!r}"
        )
    n_files, total = parquet_file_stats(path)
    n_target = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if n_files < min_files_to_compact or n_files <= n_target:
        return {
            "compacted": False, "n_files": n_files,
            "total_bytes": total, "n_target": n_target,
        }
    # a hive-partitioned layout (this engine's own bucketed indexes,
    # partitionBy sinks) must SURVIVE compaction — flattening it would
    # silently destroy the partition-pruned reads built on top of it
    pcols = _partition_columns(path)
    schema = _read_schema(spark, path, pcols)
    df = spark.read.schema(schema).parquet(path)
    before = df.count()
    # deterministic FILE sizing independent of task placement:
    # rows-per-target-file from the measured bytes/row ratio.  A task
    # holding more than one file's worth of rows (hot partition value,
    # salt-hash collision) splits its output at this bound instead of
    # emitting one arbitrarily large file.
    rows_per_file = max(
        1, math.ceil(before * target_mb * 1024 * 1024 / max(total, 1))
    )
    if pcols:
        from pyspark.sql import functions as F

        # repartitioning on the partition columns ALONE collapses each
        # partition value into one task (straggler/OOM on the hot
        # value).  The salt bound is PER VALUE, proportional to that
        # value's byte share: a uniform n_target/n_values bound would
        # hash-spread a tiny value across many tasks and re-create the
        # small files this tool exists to remove.
        target_bytes = target_mb * 1024 * 1024
        bounds = []
        for rel, b in _leaf_partition_bytes(path).items():
            vals = [unquote(seg.split("=", 1)[1])
                    for seg in rel.split(os.sep) if "=" in seg]
            if len(vals) == len(pcols):
                bounds.append((*vals, max(1, math.ceil(b / target_bytes))))
        data_cols = [
            F.col(f.name) for f in schema.fields if f.name not in pcols
        ]
        bdf = spark.createDataFrame(
            bounds,
            ", ".join(f"{c} string" for c in pcols) + ", _nf int",
        )
        salted = df.join(F.broadcast(bdf), pcols, "left").withColumn(
            "_salt",
            F.pmod(F.xxhash64(*data_cols), F.coalesce("_nf", F.lit(1))),
        )
        (
            salted.repartition(max(n_target, 1), *pcols, "_salt")
            .drop("_nf", "_salt")
            .write.option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*pcols)
            .mode("overwrite")
            .parquet(tmp)
        )
    else:
        (
            df.repartition(n_target)
            .write.option("maxRecordsPerFile", rows_per_file)
            .mode("overwrite")
            .parquet(tmp)
        )
    # verify BEFORE the swap: a rewrite that lost rows must never
    # replace the original (tmp read uses the same explicit schema —
    # no inference there either)
    after = spark.read.schema(schema).parquet(tmp).count()
    if before != after:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch: {before} -> {after}"
        )
    os.rename(path.rstrip("/"), old)
    try:
        os.rename(tmp, path.rstrip("/"))
    except BaseException:
        # failed mid-swap: put the original back so <path> never
        # disappears (the entry-time recovery above also handles the
        # hard-crash case where even this restore didn't run)
        os.rename(old, path.rstrip("/"))
        raise
    shutil.rmtree(old, ignore_errors=True)
    new_files, new_total = parquet_file_stats(path)
    return {
        "compacted": True,
        "n_files": n_files,
        "new_n_files": new_files,
        "n_target": n_target,
        "total_bytes": total,
        "new_total_bytes": new_total,
        "rows": before,
    }
