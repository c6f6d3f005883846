"""Custom stateful streaming operator (applyInPandasWithState)."""

import time


def test_stateful_sessionize_closes_on_gap(spark, tmp_path):
    from pyspark.sql import functions as F

    from helix_html2md_spark.streaming.stream import stateful_sessionize

    src = str(tmp_path / "events")
    rows = [
        # user 1: two sessions separated by a 2h gap
        {"event_id": 1, "ts": "2026-01-01 00:00:00", "user_id": 1, "value": 1.0},
        {"event_id": 2, "ts": "2026-01-01 00:10:00", "user_id": 1, "value": 2.0},
        {"event_id": 3, "ts": "2026-01-01 02:30:00", "user_id": 1, "value": 5.0},
        # user 2: one session (stays open -> not emitted in this batch)
        {"event_id": 4, "ts": "2026-01-01 00:00:00", "user_id": 2, "value": 7.0},
    ]
    spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts")
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .parquet(src)
    )
    out = stateful_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(1)
    got = {
        (r["user_id"], r["n_events"]): r["sum_value"]
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # user 1's first session (2 events, value 3.0) closed by the gap —
    # and NOTHING else: user 2's still-open session and user 1's open
    # tail must not emit in this batch (that is the flush helper's job)
    assert got == {(1, 2): 3.0}


def test_open_sessions_flush_completes_bounded_replay(spark, tmp_path):
    """availableNow + use_timeout=False can never close each user's
    FINAL session (no later gap, no timeout after input ends); the
    state-reader flush emits exactly those, completing the replay."""
    from pyspark.sql import functions as F

    from helix_html2md_spark.streaming.stream import (
        open_sessions_from_checkpoint, stateful_sessionize,
    )

    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")
    rows = [
        # user 1: gap-closed session (2 ev, 3.0) + open tail (1 ev, 5.0)
        {"event_id": 1, "ts": "2026-01-01 00:00:00", "user_id": 1, "value": 1.0},
        {"event_id": 2, "ts": "2026-01-01 00:10:00", "user_id": 1, "value": 2.0},
        {"event_id": 3, "ts": "2026-01-01 02:30:00", "user_id": 1, "value": 5.0},
        # user 2: exactly one session -> zero streamed rows without flush
        {"event_id": 4, "ts": "2026-01-01 00:00:00", "user_id": 2, "value": 7.0},
    ]
    spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts")
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(src)
    q = (
        stateful_sessionize(stream, gap_minutes=30, use_timeout=False)
        .writeStream.format("memory")
        .queryName("flush_probe")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM flush_probe").collect()
    flushed = open_sessions_from_checkpoint(spark, ckpt).collect()
    assert flushed and streamed
    # schemas align for a plain UNION
    assert [f.name for f in open_sessions_from_checkpoint(spark, ckpt).schema] \
        == [f.name for f in spark.sql("SELECT * FROM flush_probe").schema]
    full = {
        (r["user_id"], r["n_events"], r["closed_by"]): r["sum_value"]
        for r in list(streamed) + list(flushed)
    }
    assert full[(1, 2, "gap")] == 3.0   # closed in-stream
    assert full[(1, 1, "eof")] == 5.0   # user 1's open tail
    assert full[(2, 1, "eof")] == 7.0   # user 2's only session
    assert len(full) == 3
