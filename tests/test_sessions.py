"""Sessionization: batch (Catalyst window) vs streaming
(applyInPandasWithState) equivalence — streamed closed sessions must be
exactly the batch sessions minus each user's final (still-open) one."""

import pytest

from elasticsearch_analysis_hashsplitter_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _key(r):
    return (r.user_id, r.session_start, r.session_end, r.n_events)


def test_batch_sessionize_shape(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sess = sessionize_batch(events, gap_minutes=30).collect()
    assert sess
    total = sum(r.n_events for r in sess)
    assert total == events.count()
    for r in sess:
        assert r.session_start <= r.session_end


def test_stream_matches_batch_minus_open(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = sessionize_batch(events, gap_minutes=30).collect()
    # last (open) session per user
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_start > cur.session_start:
            last_per_user[r.user_id] = r
    expected_closed = {
        _key(r) for r in batch if _key(r) != _key(last_per_user[r.user_id])
    }

    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        _key(r) for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == expected_closed


def test_stream_state_across_batches(spark, tmp_path):
    # two files -> two micro-batches; a session spanning both must merge
    from datetime import datetime as dt

    rows1 = [(0, dt(2024, 1, 1, 0, 0), 1, "a", 1.0, ""),
             (1, dt(2024, 1, 1, 0, 10), 1, "a", 2.0, "")]
    rows2 = [(2, dt(2024, 1, 1, 0, 20), 1, "a", 3.0, ""),   # continues
             (3, dt(2024, 1, 1, 5, 0), 1, "a", 4.0, "")]    # closes it
    import time

    src = tmp_path / "src2"
    # one part-file per write: with maxFilesPerTrigger=1 each file is one
    # micro-batch, and distinct mod-times make the batch order match
    # event-time order (the operator assumes in-order micro-batches; true
    # out-of-order ingest needs a watermarked source upstream)
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "f1")
    )
    time.sleep(1.1)
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "f2")
    )

    # maxFilesPerTrigger=1 forces multiple micro-batches within one run:
    # per-user state must carry the open session across them
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # really ran as multiple batches
    got = spark.sql("SELECT * FROM sess2").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_events, r.sum_value) == (3, 6.0)  # merged across batches




def test_stream_timeout_flushes_open_sessions(spark, tmp_path):
    """flush_timeout_seconds: a user's open session is emitted by the
    processing-time timeout after wall-clock inactivity. Timeout mode is
    a continuous-pipeline feature (availableNow never terminates with
    pending timeouts — see sessionize_stream docstring), so this runs a
    continuous trigger and polls the sink."""
    import time
    from datetime import datetime as dt

    rows1 = [(0, dt(2024, 1, 1, 0, 0), 1, "a", 1.0, ""),
             (1, dt(2024, 1, 1, 0, 10), 1, "a", 2.0, "")]

    src = tmp_path / "src_t"
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src / "*"))
    out = sessionize_stream(stream, gap_minutes=30, flush_timeout_seconds=1)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_t"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        got = []
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql(
                "SELECT * FROM sess_t WHERE user_id = 1"
            ).collect()
            if got:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(got) == 1
    r = got[0]
    # the flushed row is exactly what a gap-closing event would emit
    assert (r.n_events, r.sum_value) == (2, 3.0)
    assert r.session_start == dt(2024, 1, 1, 0, 0)
    assert r.session_end == dt(2024, 1, 1, 0, 10)
