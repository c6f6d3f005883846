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
    # user 1's first session (2 events, value 3.0) closed by the gap
    assert got.get((1, 2)) == 3.0
