"""Watermarked append-mode session streaming (stream_session_watermarked).

Pins the two behaviors the registered oracle encodes:
1. emission boundary: a session is emitted iff its END (last event +
   5-min gap) <= watermark (end == watermark EMITS);
2. late data: a row at or behind the watermark is DROPPED — it must not
   extend or recreate an already-emitted session.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _write_batch(spark, path: str, rows: list[tuple], mtime: float) -> None:
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def test_late_row_behind_watermark_is_dropped(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1). Batch 0 raises the
    eviction watermark to 12:30 — but Spark filters LATE EVENTS with
    the PREVIOUS batch's watermark (one batch behind eviction, pinned
    here: a 12:01 row in batch 1 was still accepted with
    numRowsDroppedByWatermark=0), so the late row goes in batch 2. It
    would have joined the already-emitted 12:00 session; the sink must
    show that session with n_events=1 and the drop counter must tick."""
    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    _write_batch(
        spark,
        os.path.join(d, "b1"),
        [
            (1, 1, T0),  # session A: 12:00, closes at 12:05
            (2, 1, T0 + timedelta(minutes=20)),  # session B: 12:20
            (3, 1, T0 + timedelta(minutes=21)),  # session B: 12:21, closes 12:26
            (4, 2, T0 + timedelta(minutes=40)),  # raises watermark to 12:30
        ],
        mtime=1_700_000_000.0,
    )
    _write_batch(
        spark,
        os.path.join(d, "b2"),
        [
            (5, 2, T0 + timedelta(minutes=50)),  # advances the filter wm
        ],
        mtime=1_700_000_100.0,
    )
    _write_batch(
        spark,
        os.path.join(d, "b3"),
        [
            (6, 1, T0 + timedelta(minutes=1)),  # LATE: 12:01 < filter wm 12:30
            (7, 2, T0 + timedelta(minutes=55)),  # fresh: merges with 12:50
        ],
        mtime=1_700_000_200.0,
    )
    schema = spark.read.parquet(os.path.join(d, "b1")).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
    name = "wm_late_drop_sink"
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
            active.awaitTermination()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.user_id, r.session_start): r.n_events for r in spark.table(name).collect()
    }
    # the late 12:01 row did NOT extend session A (n_events stays 1) and
    # did not spawn a session of its own; user 2's 12:40 session (end
    # 12:45 == final watermark 12:45) is emitted — the <= boundary —
    # while the open 12:50-12:55 session is not
    assert rows == {
        (1, "2024-03-01 12:00:00"): 1,
        (1, "2024-03-01 12:20:00"): 2,
        (2, "2024-03-01 12:40:00"): 1,
    }
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1, f"late row not counted as dropped (dropped={dropped})"


def test_watermarked_equals_batch_restricted_to_closed_sessions(spark, sf_dir):
    """On the driver fixture the append-mode sink must equal the batch
    session plan restricted to sessions with end <= max(ts) - 10 min —
    the exact restriction the registered oracle encodes."""
    from magictables_spark.plans.queries import REGISTRY

    streamed = REGISTRY["stream_session_watermarked"].fn(spark, sf_dir)
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    batch = (
        events.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(
            F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
    got = {(r.user_id, r.session_start, r.n_events) for r in streamed.collect()}
    want = {(r.user_id, r.session_start, r.n_events) for r in batch.collect()}
    assert got == want and got, f"diff: {got ^ want}"
