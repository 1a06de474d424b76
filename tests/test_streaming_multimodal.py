"""Streaming twins (file source -> memory sink, processAllAvailable)
+ multimodal binary plumbing (binaryFile -> mapInPandas features)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from magictables_spark.operators.multimodal import extract_features, read_media
from magictables_spark.streaming import (
    read_events_stream,
    stream_dedup_latest,
    stream_tumbling_counts,
)


@pytest.fixture
def events_dir(tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01T00:20:00", "user_id": 1, "event_type": "click", "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01T01:10:00", "user_id": 2, "event_type": "view", "value": 3.0},
        {"event_id": 3, "ts": "2024-01-01T01:10:00", "user_id": 2, "event_type": "view", "value": 3.0},
    ]
    d = tmp_path / "stream_in"
    d.mkdir()
    (d / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


def _run_stream(sdf, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_tumbling_counts(spark, events_dir):
    src = read_events_stream(spark, events_dir)
    assert src.isStreaming
    out = stream_tumbling_counts(src)
    q = out.writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["win_start"].isoformat(), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumb").collect()
    }
    assert rows[("2024-01-01T00:00:00", "click")] == 2
    assert rows[("2024-01-01T01:00:00", "view")] == 2


def test_stream_dedup(spark, events_dir):
    src = read_events_stream(spark, events_dir)
    _run_stream(stream_dedup_latest(src), "dedup")
    got = spark.sql("SELECT event_id, user_id FROM dedup").collect()
    assert sorted((r.event_id, r.user_id) for r in got) == [(1, 1), (2, 1), (3, 2)]


def test_stream_dedup_within_watermark(spark, events_dir):
    """The state-bounded dedup drops the in-horizon duplicate and emits
    the same rows as the unbounded-state form on this input."""
    from magictables_spark.streaming import stream_dedup_within_watermark

    src = read_events_stream(spark, events_dir)
    _run_stream(stream_dedup_within_watermark(src), "dedup_wm")
    got = spark.sql("SELECT event_id, user_id FROM dedup_wm").collect()
    assert sorted((r.event_id, r.user_id) for r in got) == [(1, 1), (2, 1), (3, 2)]


def test_streaming_batch_parity(spark, events_dir):
    """The streaming aggregation and the batch twin produce identical
    results on the same data — the same-code-two-runtimes claim."""
    src = read_events_stream(spark, events_dir)
    q = (
        stream_tumbling_counts(src)
        .writeStream.format("memory")
        .queryName("par_s")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # batch twin: the SAME builder applied to a batch frame
    batch = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    ).json(events_dir)
    got_b = {
        (r["win_start"].isoformat(), r["event_type"], r["n_events"], r["sum_value"])
        for r in stream_tumbling_counts(batch).collect()
    }
    got_s = {
        (r["win_start"].isoformat(), r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM par_s").collect()
    }
    assert got_b == got_s


def test_stream_session_counts_batch_parity(spark, events_dir):
    """session_window merges as events arrive; the finalized sessions
    must equal the batch twin on the same data."""
    from magictables_spark.streaming import stream_session_counts

    src = read_events_stream(spark, events_dir)
    q = (
        stream_session_counts(src, gap="15 minutes")
        .writeStream.format("memory")
        .queryName("sess_s")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    ).json(events_dir)
    got_b = {
        (r["user_id"], r["session_start"].isoformat(), r["n_events"])
        for r in stream_session_counts(batch, gap="15 minutes").collect()
    }
    got_s = {
        (r["user_id"], r["session_start"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_s").collect()
    }
    assert got_b == got_s
    # fixture shape: user 1's two clicks 10 min apart merge into ONE
    # session of 2 events; user 2's duplicate views collapse to one window
    by_user = {}
    for u, _start, n in got_s:
        by_user.setdefault(u, []).append(n)
    assert by_user[1] == [2]
    assert by_user[2] == [2]


def test_multimodal_plumbing(spark, tmp_path):
    media_dir = tmp_path / "media"
    media_dir.mkdir()
    (media_dir / "a.png").write_bytes(b"\x89PNG fake image bytes")
    (media_dir / "b.wav").write_bytes(b"RIFF fake audio bytes padded")
    (media_dir / "c.bin").write_bytes(b"\x00\x01")

    media = read_media(spark, str(media_dir))
    got = {r["path"].rsplit("/", 1)[-1]: r["mime"] for r in media.collect()}
    assert got == {"a.png": "image/png", "b.wav": "audio/wav", "c.bin": "application/octet-stream"}

    feats = extract_features(media, dim=8, decode_stub=True)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in feats.collect()}
    assert all(r["ok"] for r in rows.values())
    assert len(rows["a.png"]["feature"]) == 8
    assert rows["a.png"]["n_bytes"] == 21
    # deterministic: same bytes -> same feature
    feats2 = {
        r["path"].rsplit("/", 1)[-1]: r["feature"]
        for r in extract_features(media, decode_stub=True).collect()
    }
    assert feats2["a.png"] == rows["a.png"]["feature"]


def test_multimodal_real_decode_corrupt_is_ok_false(spark, tmp_path):
    """Real decode (the default) must skip corrupt/unsupported bytes
    with ok=False — never fail the task."""
    media_dir = tmp_path / "m2"
    media_dir.mkdir()
    (media_dir / "x.png").write_bytes(b"png")  # not a real PNG
    (media_dir / "y.mp4").write_bytes(b"\x00" * 32)  # needs ffmpeg
    media = read_media(spark, str(media_dir))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in extract_features(media).collect()}
    assert not rows["x.png"]["ok"] and rows["x.png"]["feature"] is None
    assert not rows["y.mp4"]["ok"]


def test_stream_stateful_running_totals(spark, events_dir, tmp_path):
    from magictables_spark.streaming import stream_running_totals

    src = read_events_stream(spark, events_dir)
    q = (
        stream_running_totals(src)
        .writeStream.format("memory")
        .queryName("run_tot")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.user_id: (r.n_events, r.total_value) for r in spark.sql("SELECT * FROM run_tot").collect()}
    assert rows[1] == (2, 3.0)   # two clicks, 1.0 + 2.0
    assert rows[2] == (2, 6.0)   # duplicate view rows both counted (raw state op)


def test_stream_running_totals_state_evicted_after_idle(spark, events_dir, tmp_path):
    """EventTimeTimeout boundedness: a key idle past watermark +
    idle_timeout is dropped from the state store, so when it reappears
    its totals restart from zero instead of accumulating forever."""
    import json as _json

    from magictables_spark.streaming import stream_running_totals

    src = read_events_stream(spark, events_dir)
    q = (
        stream_running_totals(src, watermark="10 minutes", idle_timeout_ms=60_000)
        .writeStream.format("memory")
        .queryName("run_tot_evict")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_evict"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: only user 2, far in the future -> advances the
        # watermark well past user 1's timeout timestamp
        with open(f"{events_dir}/batch2.json", "w") as f:
            f.write(_json.dumps({
                "event_id": 10, "ts": "2024-01-02T00:00:00", "user_id": 2,
                "event_type": "view", "value": 1.0,
            }))
        q.processAllAvailable()
        # batch 3: triggers the timed-out callback (eviction) for user 1
        # and then user 1 reappears -> state restarts at 1 event
        with open(f"{events_dir}/batch3.json", "w") as f:
            f.write(_json.dumps({
                "event_id": 11, "ts": "2024-01-02T00:30:00", "user_id": 1,
                "event_type": "click", "value": 5.0,
            }))
        q.processAllAvailable()
    finally:
        q.stop()
    user1 = {
        (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM run_tot_evict WHERE user_id = 1").collect()
    }
    # batch 1 emitted (2, 3.0); batch 3 must emit a RESET (1, 5.0) —
    # (3, 8.0) would mean the old state survived the idle timeout
    assert (1, 5.0) in user1, f"state for user 1 not evicted: {user1}"
    assert (3, 8.0) not in user1, f"state for user 1 not evicted: {user1}"


def test_embed_texts_deterministic(spark):
    from magictables_spark.operators.embed import embed_texts

    df = spark.createDataFrame([(1, "hello world"), (2, "hello world"), (3, "other")], "id int, text string")
    out = embed_texts(df, "text", dim=16)
    rows = {r.id: r.embedding for r in out.collect()}
    assert len(rows[1]) == 16
    assert rows[1] == rows[2] != rows[3]  # same text -> same vector

    # custom embedder injection + null handling
    def const_embedder(texts):
        return [None if t is None else [1.0, 2.0] for t in texts]

    df2 = spark.createDataFrame([(1, "x"), (2, None)], "id int, text string")
    got = {r.id: r.embedding for r in embed_texts(df2, "text", embedder=const_embedder).collect()}
    assert got[1] == [1.0, 2.0] and got[2] is None


def test_stream_interval_join_and_batch_parity(spark, tmp_path):
    """Stream-stream interval join pairs each click with the same
    user's views in the prior 30 min; the same builder on batch frames
    returns the identical row set."""
    from magictables_spark.streaming import stream_interval_join

    clicks = [
        {"event_id": 10, "ts": "2024-01-01T01:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 11, "ts": "2024-01-01T02:00:00", "user_id": 2, "event_type": "click", "value": 1.0},
    ]
    views = [
        # within 30 min of click 10, same user -> joins
        {"event_id": 20, "ts": "2024-01-01T00:45:00", "user_id": 1, "event_type": "view", "value": 1.0},
        # same user but 75 min before click 10 -> outside interval
        {"event_id": 21, "ts": "2024-01-01T23:45:00", "user_id": 1, "event_type": "view", "value": 1.0},
        # within interval but different user -> no join
        {"event_id": 22, "ts": "2024-01-01T00:50:00", "user_id": 3, "event_type": "view", "value": 1.0},
        # exactly at click 11's ts -> joins (inclusive bound)
        {"event_id": 23, "ts": "2024-01-01T02:00:00", "user_id": 2, "event_type": "view", "value": 1.0},
    ]
    cdir, vdir = tmp_path / "clicks", tmp_path / "views"
    cdir.mkdir(), vdir.mkdir()
    (cdir / "b.json").write_text("\n".join(json.dumps(r) for r in clicks))
    (vdir / "b.json").write_text("\n".join(json.dumps(r) for r in views))

    out = stream_interval_join(
        read_events_stream(spark, str(cdir)), read_events_stream(spark, str(vdir))
    )
    assert out.isStreaming
    _run_stream(out, "ivj")
    got = sorted(
        (r.user_id, r.click_id, r.view_id)
        for r in spark.sql("SELECT * FROM ivj").collect()
    )
    assert got == [(1, 10, 20), (2, 11, 23)]

    from magictables_spark.streaming import EVENTS_SCHEMA

    batch = sorted(
        (r.user_id, r.click_id, r.view_id)
        for r in stream_interval_join(
            spark.read.schema(EVENTS_SCHEMA).json(str(cdir)),
            spark.read.schema(EVENTS_SCHEMA).json(str(vdir)),
        ).collect()
    )
    assert batch == got


def test_stream_late_data_dropped_by_watermark(spark, tmp_path):
    """Append-mode tumbling agg: an event arriving AFTER the watermark
    passed its window must be dropped, so the finalized window keeps
    the on-time count (SURVEY §2.C late-data requirement)."""
    from magictables_spark.streaming import stream_tumbling_counts

    d = tmp_path / "late_in"
    d.mkdir()

    def write_batch(name, rows):
        (d / name).write_text("\n".join(json.dumps(r) for r in rows))

    def ev(i, ts, v=1.0):
        return {"event_id": i, "ts": ts, "user_id": 1, "event_type": "click", "value": v}

    # batch 1: two on-time events in [00:00, 01:00) + one at 02:10 that
    # advances the watermark (30 min lag) to 01:40 > window end
    write_batch("b1.json", [ev(1, "2024-01-01T00:10:00"), ev(2, "2024-01-01T00:20:00"),
                            ev(3, "2024-01-01T02:10:00")])
    src = read_events_stream(spark, str(d), max_files_per_trigger=1)
    out = stream_tumbling_counts(src, watermark="30 minutes")
    q = out.writeStream.format("memory").queryName("late").outputMode("append").start()
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the already-finalized 00:00 window
        # (event time 00:30 << watermark 01:40) + one at 04:00 pushing
        # the watermark past the 02:00 window
        write_batch("b2.json", [ev(4, "2024-01-01T00:30:00"), ev(5, "2024-01-01T04:00:00")])
        q.processAllAvailable()
        # batch 3: advances processing so the 02:00 window finalizes too
        write_batch("b3.json", [ev(6, "2024-01-01T06:00:00")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["win_start"].isoformat(): r["n_events"]
        for r in spark.sql("SELECT * FROM late").collect()
    }
    # the 00:00 window finalized with the 2 on-time events; the late
    # event 4 did NOT resurrect or grow it
    assert rows["2024-01-01T00:00:00"] == 2
    # the 02:10 event's window finalized normally
    assert rows["2024-01-01T02:00:00"] == 1


def test_stream_tumbling_availablenow_reinvokes(spark, sf_dir):
    """The registered streaming query is idempotent across invocations
    in one session (driver runs a query more than once) and matches
    the batch twin exactly."""
    from magictables_spark.plans.queries import REGISTRY

    fn = REGISTRY["stream_tumbling_availablenow"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    batch = sorted(map(tuple, REGISTRY["window_tumbling"].fn(spark, sf_dir).collect()))
    assert a == b == batch and len(a) > 0


def test_stream_session_availablenow_matches_batch_twin(spark, sf_dir):
    """The streaming session-window job (complete mode, AvailableNow)
    must equal the batch session_window plan row-for-row — session
    merge state settles before the sink is read, so the dynamic-extent
    semantics are identical to batch. Column order differs between the
    twins (streaming selects user_id first), so compare as row sets of
    named tuples projected to a common order."""
    from magictables_spark.plans.queries import REGISTRY

    stream = REGISTRY["stream_session_availablenow"].fn(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    a = sorted(map(tuple, stream.select(*cols).collect()))
    batch = (
        REGISTRY["window_session"].fn(spark, sf_dir).select(*cols).collect()
    )
    assert a == sorted(map(tuple, batch)) and len(a) > 0
