"""Parquet small-file compaction (plans/compact.py)."""

from pyspark.sql import functions as F

from helix_html2md_spark.plans.compact import (
    compact_parquet, parquet_file_stats,
)


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 2000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(64).write.parquet(path)
    n0, _ = parquet_file_stats(path)
    assert n0 >= 64
    before = {
        (r["id"], r["payload"])
        for r in spark.read.parquet(path).collect()
    }
    m = compact_parquet(spark, path, target_mb=256)
    assert m["compacted"] and m["rows"] == 2000
    n1, _ = parquet_file_stats(path)
    assert n1 < n0 and n1 <= m["new_n_files"]
    after = {
        (r["id"], r["payload"])
        for r in spark.read.parquet(path).collect()
    }
    assert after == before
    # idempotent: second call is a no-op (already at the target count)
    m2 = compact_parquet(spark, path)
    assert m2["compacted"] is False


def test_compact_noop_below_threshold(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(0, 10).repartition(2).write.parquet(path)
    m = compact_parquet(spark, path)
    assert m["compacted"] is False
    assert spark.read.parquet(path).count() == 10


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a partitionBy-written dataset must keep the layout:
    flattening it would silently destroy partition-pruned reads."""
    path = str(tmp_path / "part")
    spark.range(0, 1000).withColumn(
        "bucket", (F.col("id") % 4).cast("string")
    ).repartition(16).write.partitionBy("bucket").parquet(path)
    n0, _ = parquet_file_stats(path)
    m = compact_parquet(spark, path, target_mb=256)
    assert m["compacted"]
    n1, _ = parquet_file_stats(path)
    assert n1 < n0
    import os

    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    )
    assert dirs == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    df = spark.read.parquet(path).filter(F.col("bucket") == "2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() == 250


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames parks the dataset at
    .precompact with no <path>; the next call must restore it (and
    clear stale temp dirs) instead of raising."""
    import os
    import shutil

    path = str(tmp_path / "t")
    spark.range(0, 2000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(64).write.parquet(path)
    # simulate: crashed after rename(path -> .precompact), plus a stale
    # half-written .compacting from the same run
    os.rename(path, path + ".precompact")
    os.makedirs(path + ".compacting")
    m = compact_parquet(spark, path, target_mb=256)
    assert m["compacted"] and m["rows"] == 2000
    assert not os.path.exists(path + ".precompact")
    assert not os.path.exists(path + ".compacting")
    assert spark.read.parquet(path).count() == 2000


def test_compact_clears_stale_temp_next_to_live_path(spark, tmp_path):
    """Stale .precompact/.compacting alongside a LIVE <path> (crash
    before the first rename) are dead temp state - removed, run
    proceeds."""
    import os

    path = str(tmp_path / "t2")
    spark.range(0, 2000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(64).write.parquet(path)
    os.makedirs(path + ".precompact")
    os.makedirs(path + ".compacting")
    m = compact_parquet(spark, path, target_mb=256)
    assert m["compacted"] and m["rows"] == 2000
    assert not os.path.exists(path + ".precompact")
    assert not os.path.exists(path + ".compacting")


def test_compact_partitioned_honors_target_and_types(spark, tmp_path):
    """(1) Repartitioning on the partition columns ALONE collapses each
    value into ONE output file regardless of n_target — the salt must
    spread a hot value across ~n_target/n_values tasks.  (2) The
    rewrite must not round-trip partition values through type
    inference: 'day=07' re-emitted as 'day=7' renames directories under
    every consumer."""
    import os

    path = str(tmp_path / "p2")
    # leading-zero string partition values; 2 values, enough rows that
    # a tiny target_mb wants many files
    spark.range(0, 150_000).withColumn(
        "day", F.when(F.col("id") % 2 == 0, "07").otherwise("12")
    ).withColumn("payload", F.sha2(F.col("id").cast("string"), 256)) \
        .repartition(16).write.partitionBy("day").parquet(path)
    m = compact_parquet(spark, path, target_mb=1)
    assert m["compacted"]
    # well clear of the target so the per-value assertions below are
    # unconditional (a codec change must not silently skip them)
    assert m["n_target"] >= 6, m
    # directory names preserved verbatim (no 07 -> 7 rename)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert dirs == ["day=07", "day=12"]
    # values intact under an inference-off read (the type a LATER
    # reader sees is that reader's inference setting, not compaction's
    # concern — the invariant here is that the bytes/dirs didn't move)
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    spark.conf.set(infer_key, "false")
    try:
        vals = sorted(
            r["day"]
            for r in spark.read.parquet(path).select("day").distinct().collect()
        )
        assert vals == ["07", "12"]
    finally:
        spark.conf.set(infer_key, "true")
    # more than one file per partition value (byte share >> target)
    for d in dirs:
        n_files = sum(
            1
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        )
        assert n_files > 1, (d, n_files, m)


def test_compact_rejects_missing_or_remote_paths(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="driver-local"):
        compact_parquet(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="driver-local"):
        compact_parquet(spark, "s3a://bucket/extracted")


def test_compact_byte_skewed_partitions_keep_small_values_compact(
    spark, tmp_path
):
    """The salt bound is PER VALUE by byte share: a tiny partition
    value must land in ONE file even when the layout's total asks for
    many (a uniform n_target/n_values bound would hash-spread it and
    re-create the small files compaction removes)."""
    import os

    path = str(tmp_path / "skew")
    big = spark.range(0, 200_000).withColumn("part", F.lit("big"))
    small = spark.range(0, 50).withColumn("part", F.lit("small"))
    big.unionByName(small).withColumn(
        "payload", F.sha2(F.col("id").cast("string"), 256)
    ).repartition(16).write.partitionBy("part").parquet(path)
    m = compact_parquet(spark, path, target_mb=1)
    assert m["compacted"] and m["n_target"] >= 6, m
    n_small = sum(
        1
        for f in os.listdir(os.path.join(path, "part=small"))
        if f.endswith(".parquet")
    )
    n_big = sum(
        1
        for f in os.listdir(os.path.join(path, "part=big"))
        if f.endswith(".parquet")
    )
    assert n_small == 1, (n_small, m)
    assert n_big > 1, (n_big, m)
