"""Event-time windowed aggregation (watermarked) + applyInPandasWithState
sessionization — the streaming shapes the round brief names."""

import os
import shutil
import tempfile
import time
from datetime import datetime, timedelta

import pytest

from networkit_spark.streaming.stateful import sessionize_stream
from networkit_spark.streaming.windows import windowed_event_counts

T0 = datetime(2024, 1, 1, 0, 0, 0)
EV_SCHEMA = "ts timestamp, user_id long, event_type string, value double"


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="nk_sw_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, rows):
    # rows: (offset_seconds, user_id, event_type, value)
    return spark.createDataFrame(
        [(T0 + timedelta(seconds=s), u, t, v) for s, u, t, v in rows],
        EV_SCHEMA,
    )


def test_windowed_counts_batch(spark):
    df = _events(
        spark,
        [
            (0, 1, "click", 1.0),
            (1800, 1, "click", 2.0),     # same hour
            (3600, 2, "click", 4.0),     # next hour
            (3601, 2, "view", 8.0),
        ],
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in windowed_event_counts(df, window="1 hour").collect()
    }
    h0, h1 = T0, T0 + timedelta(hours=1)
    assert got == {
        (h0, "click"): (2, 3.0),
        (h1, "click"): (1, 4.0),
        (h1, "view"): (1, 8.0),
    }
    # sliding: 1h window every 30min — the 1800s click lands in two windows
    slid = windowed_event_counts(df, window="1 hour", slide="30 minutes")
    rows = [r for r in slid.collect() if r["event_type"] == "click"]
    n_by_start = {r["win_start"]: r["n"] for r in rows}
    assert n_by_start[T0 + timedelta(minutes=30)] == 2  # 1800s + 3600s clicks
    assert n_by_start[h0] == 2
    assert n_by_start[h1] == 1


def test_windowed_counts_streaming_watermark(spark, tmp):
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    batch = _events(
        spark,
        [(0, 1, "click", 1.0), (1800, 1, "click", 2.0), (3600, 2, "click", 4.0)],
    )
    batch.write.parquet(os.path.join(src, "b0"))
    time.sleep(1.1)
    late = _events(spark, [(7200, 2, "click", 8.0), (7300, 1, "view", 1.0)])
    late.write.parquet(os.path.join(src, "b1"))

    stream = spark.readStream.schema(EV_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(src, "*"))
    agg = windowed_event_counts(
        stream, window="1 hour", watermark="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    full = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in windowed_event_counts(
            batch.unionByName(late), window="1 hour"
        ).collect()
    }
    # append mode only emits FINALIZED windows, and every emitted window
    # must carry the exact full-history aggregate
    assert emitted
    for k, v in emitted.items():
        assert full[k] == v
    # the hour-0 window closed once the watermark passed 01:30
    assert (T0, "click") in emitted


def test_sessionize_stream_state_across_batches(spark, tmp):
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    # coalesce(1): each logical batch must be ONE file so that
    # maxFilesPerTrigger=1 yields exactly the intended micro-batch split
    _events(
        spark,
        [(0, 1, "click", 1.0), (10, 1, "click", 1.0), (0, 2, "view", 1.0)],
    ).coalesce(1).write.parquet(os.path.join(src, "b0"))
    time.sleep(1.1)
    _events(
        spark,
        [(15, 1, "click", 1.0), (10000, 2, "view", 1.0)],
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))

    stream = spark.readStream.schema(EV_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(src, "*"))
    sess = sessionize_stream(stream, gap_seconds=60)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM sessions ORDER BY key, session_start"
    ).collect()
    # last update per (key, session_start) wins
    final = {}
    for r in rows:
        final[(r["key"], r["session_start"])] = (
            r["session_end"], r["n"], r["open"]
        )
    # user 1: ONE session 0..15s spanning both batches (state carried)
    assert final[(1, T0)] == (T0 + timedelta(seconds=15), 3, True)
    # user 2: first session closed by the 10000s event, second open
    assert final[(2, T0)] == (T0, 1, False)
    assert final[(2, T0 + timedelta(seconds=10000))] == (
        T0 + timedelta(seconds=10000), 1, True)
    assert len(final) == 3


def test_sessionize_stream_backward_extension(spark, tmp):
    # an event EARLIER than the carried session's start arriving in a later
    # micro-batch (out-of-order across batches, within gap) must extend the
    # session backwards: session_start = min over merged events
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    _events(spark, [(10, 1, "click", 1.0)]).coalesce(1).write.parquet(
        os.path.join(src, "b0")
    )
    time.sleep(1.1)
    _events(spark, [(0, 1, "click", 1.0)]).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )

    stream = spark.readStream.schema(EV_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(src, "*"))
    sess = sessionize_stream(stream, gap_seconds=60)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_bw")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql(
        "SELECT * FROM sessions_bw ORDER BY key, session_start"
    ).collect():
        final[(r["key"], r["session_start"])] = (
            r["session_end"], r["n"], r["open"]
        )
    # the merged session under its extended (earliest) start
    assert final[(1, T0)] == (T0 + timedelta(seconds=10), 2, True)
