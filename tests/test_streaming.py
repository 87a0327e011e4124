"""Streaming equivalence harness (SURVEY.md §5.4).

Replays the events fixture through a real file-source stream
(multi-file staging, ``maxFilesPerTrigger=1`` → genuine multi-batch runs,
``trigger(availableNow=True)``) and asserts stream result == batch result
for every shared builder. Plus the t4 watermark test: a two-batch file
sequence where batch 2 carries a row older than the watermark — the late
row must be dropped in append mode.
"""

from __future__ import annotations

import os
import time

import pytest

from tests.conftest import SF_SMOKE
from trireme_spark.sources.io import table
from trireme_spark.streaming import builders as B


def _replay(spark, builder, mode):
    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    stream = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    return B.run_to_memory(builder(stream), mode=mode)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize(
    "builder,mode",
    [
        (B.tumbling_counts, "complete"),
        (B.sliding_counts, "complete"),
        (B.session_windows, "complete"),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_equals_batch_windows(spark, builder, mode):
    batch = builder(table(spark, SF_SMOKE, "events"))
    streamed = _replay(spark, builder, mode)
    assert _canon(streamed) == _canon(batch)


def test_stream_dedup_equals_batch(spark):
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = table(spark, SF_SMOKE, "events").select(*cols)
    batch = B.dedup_by_key(ev.unionByName(ev))

    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    stream = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    # Stream the staged files twice-unioned is not expressible on one source;
    # instead dedup the single stream (ids unique → identity) and separately
    # assert the batch dedup collapses the union. Stream-side state mechanics
    # (dropDuplicatesWithinWatermark) are exercised for real.
    streamed = B.run_to_memory(
        B.dedup_by_key(stream.select(*cols), watermark="1 hour"), mode="append"
    )
    assert _canon(streamed) == _canon(ev)
    assert _canon(batch) == _canon(ev)


def test_stream_stateful_running_counts(spark):
    from pyspark.sql import functions as F

    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    stream = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    updates = B.run_to_memory(B.stateful_user_counts(stream), mode="update")
    final = updates.groupBy("user_id").agg(F.max("n_events").alias("n"))

    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _canon(final) == _canon(batch)
    # Multi-batch reality check: some user must have emitted an intermediate
    # (strictly smaller) running count across the 4 micro-batches.
    assert updates.count() > final.count()


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode with a 10-min watermark: a row arriving after the
    watermark has passed its window must not be counted."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf, schema=B.EVENTS_TS_SCHEMA)
        part = str(tmp_path / ("stage_" + name))
        sdf.coalesce(1).write.mode("overwrite").parquet(part)
        pq = [f for f in os.listdir(part) if f.endswith(".parquet")][0]
        dst = os.path.join(src, name + ".parquet")
        os.rename(os.path.join(part, pq), dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    # Watermark timing (verified empirically on 4.1.2): the watermark that
    # filters batch N is computed from data through batch N-1 and takes
    # effect at batch N+1 — so a late row must arrive TWO batches after its
    # window to be dropped. Hence a three-file sequence.
    # Batch 1: events in hours 10 and 12 → max ts 12:30.
    write_file(
        "b1",
        [
            (1, "2024-01-01 10:05:00", 1, "a", 1.0, "{}"),
            (2, "2024-01-01 10:45:00", 1, "a", 1.0, "{}"),
            (3, "2024-01-01 12:30:00", 2, "a", 1.0, "{}"),
        ],
        now - 90,
    )
    # Batch 2: advances event time to 14:30 (watermark → 12:20 in effect
    # for batch 3; hour-10 window finalizes with n=2).
    write_file(
        "b2",
        [(5, "2024-01-01 14:30:00", 3, "a", 1.0, "{}")],
        now - 60,
    )
    # Batch 3: a LATE row for hour 10 (watermark 14:20 → dropped) plus a
    # fresh row that keeps event time advancing.
    write_file(
        "b3",
        [
            (4, "2024-01-01 10:10:00", 1, "a", 1.0, "{}"),  # late → dropped
            (6, "2024-01-01 16:30:00", 3, "a", 1.0, "{}"),
        ],
        now - 30,
    )

    stream = B.events_stream_staged(spark, src, max_files_per_trigger=1)
    result = B.run_to_memory(
        B.tumbling_counts(stream, watermark="10 minutes"), mode="append"
    )
    counts = {
        r["window_start"].hour: r["n"]
        for r in result.select("window_start", "n").collect()
    }
    # Hour 10 was finalized with 2 rows; the late 10:10 row must NOT appear.
    assert counts.get(10) == 2
    # Hour 12 finalized by the 14:30 row advancing the watermark.
    assert counts.get(12) == 1


def test_stream_stream_join_equals_batch(spark):
    """t8: the click→purchase join replayed as a REAL stream-stream join
    (two watermarked file-source streams over the same staged files,
    multi-batch) must equal the batch join. Inner stream-stream joins
    emit only matched rows, and with availableNow replay every match is
    eventually emitted regardless of batch boundaries."""
    batch = B.click_purchase_join(table(spark, SF_SMOKE, "events"))
    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    s1 = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    streamed = B.run_to_memory(
        B.click_purchase_join(s1, watermark="2 hours"), mode="append"
    )
    assert _canon(streamed) == _canon(batch)


def _tws_available() -> bool:
    """Shared env probe (streaming/builders.tws_available) — also gates
    the conditional stream_transform_with_state registry key."""
    from trireme_spark.streaming.builders import tws_available

    return tws_available()


import pytest as _pytest  # noqa: E402


@_pytest.mark.skipif(
    not _tws_available(),
    reason="protobuf absent in container (import google -> "
    "ModuleNotFoundError; the pure-Python "
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION fallback was probed and "
    "cannot apply to a missing package) — transformWithState state "
    "server cannot start (see builders.tws_available)",
)
def test_transform_with_state_matches_batch(spark):
    from pyspark.sql import functions as F

    from trireme_spark.sources.io import table
    from trireme_spark.streaming.builders import (
        events_stream_staged,
        run_to_memory,
        stage_events_files,
        transform_with_state_user_counts,
    )

    sf = SF_SMOKE
    staged = stage_events_files(spark, sf, n_files=4, tag="tws")
    ev = events_stream_staged(spark, staged, max_files_per_trigger=1)
    updates = run_to_memory(
        transform_with_state_user_counts(ev), mode="update"
    )
    got = (
        updates.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    want = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_restart_resume_exactly_once(spark, tmp_path):
    """Checkpoint restart: a query drains two source files, STOPS, two
    more files land, and a RESTARTED query with the same checkpoint
    processes only the new files — the already-committed offsets never
    replay, so an append (at-least-once-looking) sink still ends up
    exactly-once. This is the recovery contract every production
    stream rests on; the equivalence tests above never stop a query.
    """
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    files = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    assert len(files) == 4
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    schema = spark.read.parquet(staged).schema

    def run_drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

        def write_batch(df, batch_id):
            df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink)

        q = (
            agg.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for f in files[:2]:
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))
    run_drain()
    for f in files[2:]:
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))
    run_drain()

    out = spark.read.parquet(sink)
    # update-mode foreachBatch appends per-batch deltas; the LAST write
    # per key carries the complete running count IF no offsets replayed
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("batch_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("event_type", "n")
    )
    expect = (
        spark.read.parquet(staged)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, expect.collect())
    )
    # replayed offsets would re-emit earlier batch ids after restart:
    # batch ids must be strictly increasing with no duplicates
    bids = [r["batch_id"] for r in out.select("batch_id").distinct().collect()]
    assert len(bids) == len(set(bids))
    assert max(bids) + 1 == len(bids)  # contiguous 0..n-1 across restarts


def test_stream_stream_left_outer_equals_batch(spark):
    """t14: LEFT OUTER stream-stream join replayed as two watermarked
    streams — unmatched clicks' NULL rows emit only after the purchase
    watermark proves no match can arrive; with availableNow every
    deferral resolves, so stream == batch EXACTLY, nulls included (and
    the null rows must actually be present — an inner-join regression
    would pass an equality check on matched rows alone)."""
    batch = B.click_purchase_join(
        table(spark, SF_SMOKE, "events"), how="leftOuter"
    )
    # trailing sentinels of BOTH types (negative user ids): the global
    # watermark is the MIN across both sides' operators, so the final
    # click's null can never emit unless the CLICK side also advances
    # (observed: its own side's watermark stopped exactly at it) — and
    # the extra batches fire the deferred-eviction off-by-one (t13)
    staged = B.stage_events_files_with_sentinels(
        spark, SF_SMOKE, n_files=4,
        sentinel_types=("click", "purchase"), tag="pytest_outer",
    )
    s1 = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    streamed = B.run_to_memory(
        B.click_purchase_join(s1, watermark="1 second", how="leftOuter"),
        mode="append",
    ).where("user_id >= 0")
    assert streamed.where("purchase_ts IS NULL").count() > 0
    assert _canon(streamed) == _canon(batch)


def test_stream_chained_windows_equals_batch(spark):
    """r11 cadence key: two chained stateful window aggregations in one
    real stream (watermark + append — the multiple-stateful-operator
    rule). Staged files are ts-range-disjoint, so nothing arrives late
    and the append output is exactly the batch result restricted to
    hour windows finalized by the FINAL watermark (end <= max ts - 10
    min; hour-aligned ends can't tie the sub-second max ts)."""
    from pyspark.sql import functions as F

    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    stream = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    streamed = B.run_to_memory(
        B.chained_window_peaks(stream, watermark="10 minutes"), mode="append"
    )

    ev = table(spark, SF_SMOKE, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w")
    )
    batch = (
        B.chained_window_peaks(ev)
        .crossJoin(F.broadcast(wm))
        .where(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.col("w"))
        .drop("w")
    )
    got, exp = _canon(streamed), _canon(batch)
    assert got == exp
    assert len(got) > 0


def test_stream_windowed_distinct_users_equals_batch(spark):
    """r11 cadence key: event-time dedup state + count state chained in
    one real stream; append output == batch distinct-count on the
    watermark-finalized hours."""
    from pyspark.sql import functions as F

    staged = B.stage_events_files(spark, SF_SMOKE, n_files=4, tag="pytest")
    stream = B.events_stream_staged(spark, staged, max_files_per_trigger=1)
    streamed = B.run_to_memory(
        B.hourly_distinct_users(stream, watermark="10 minutes"), mode="append"
    )

    ev = table(spark, SF_SMOKE, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w")
    )
    batch = (
        B.hourly_distinct_users(ev)
        .crossJoin(F.broadcast(wm))
        .where(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.col("w"))
        .drop("w")
    )
    got, exp = _canon(streamed), _canon(batch)
    assert got == exp
    assert len(got) > 0
