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


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a parquet directory."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


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
    n_files, total = parquet_file_stats(path)
    n_target = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if n_files < min_files_to_compact or n_files <= n_target:
        return {
            "compacted": False, "n_files": n_files,
            "total_bytes": total, "n_target": n_target,
        }
    df = spark.read.parquet(path)
    # a hive-partitioned layout (this engine's own bucketed indexes,
    # partitionBy sinks) must SURVIVE compaction — flattening it would
    # silently destroy the partition-pruned reads built on top of it
    pcols = _partition_columns(path)
    if pcols:
        (
            df.repartition(max(n_target, 1), *pcols)
            .write.partitionBy(*pcols)
            .mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    # verify BEFORE the swap: a rewrite that lost rows must never
    # replace the original
    before = df.count()
    after = spark.read.parquet(tmp).count()
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
        "total_bytes": total,
        "new_total_bytes": new_total,
        "rows": before,
    }
