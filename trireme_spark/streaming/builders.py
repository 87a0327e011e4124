"""Streaming builders — shared between batch queries (driver-oracled) and
streaming replays (pytest).

State-store scale notes (100 TB / unbounded streams):
* tumbling/sliding windows + watermark: state per (window, key) only until
  watermark passes the window end — bounded by (active windows × keys).
* session windows: state per open session per user; the 30-min gap bounds
  lifetime.
* every builder takes the watermark as a parameter so replay tests can
  tighten it; production defaults keep state finite.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trireme_spark.parity import dsum

EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream with the events schema (ts arrives as raw nanos —
    same nanosAsLong story as the batch reader, converted in-plan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.format("parquet")
        .schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(src_dir)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def tumbling_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """t1 — 1-hour tumbling count+sum per event_type."""
    df = events.withWatermark("ts", watermark) if watermark else events
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """t2 — 1-hour windows sliding every 15 minutes (each event lands in 4)."""
    df = events.withWatermark("ts", watermark) if watermark else events
    return (
        df.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n"
        )
    )


def session_windows(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """t3 — per-user session windows with a 30-minute inactivity gap
    (session end = last event + gap, matching the gaps-and-islands oracle)."""
    df = events.withWatermark("ts", watermark) if watermark else events
    return (
        df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(
    sdf: DataFrame, mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the sink as a batch DataFrame."""
    name = name or f"trireme_mem_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
