"""foreachBatch streaming upsert + small-file compaction tests."""

from __future__ import annotations

import json
import os

import pytest

from magictables_spark.operators.scale import compact_files
from magictables_spark.streaming import (
    read_events_stream,
    read_upsert_snapshot,
    stream_upsert_foreach_batch,
)


@pytest.fixture
def upsert_events_dir(tmp_path):
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1, "event_type": "signup", "value": 0.0},
        {"event_id": 2, "ts": "2024-01-01T00:20:00", "user_id": 2, "event_type": "view", "value": 1.0},
    ]
    batch2 = [
        # user 1 progresses; later (ts, event_id) must win
        {"event_id": 3, "ts": "2024-01-01T01:00:00", "user_id": 1, "event_type": "purchase", "value": 9.0},
        # stale duplicate for user 2 (same ts, lower event_id loses)
        {"event_id": 1, "ts": "2024-01-01T00:20:00", "user_id": 2, "event_type": "error", "value": 0.0},
    ]
    d = tmp_path / "upsert_in"
    d.mkdir()
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (d / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))
    return str(d)


def test_stream_upsert_latest_wins(spark, upsert_events_dir, tmp_path):
    target = str(tmp_path / "table")
    os.makedirs(target)
    src = read_events_stream(spark, upsert_events_dir, max_files_per_trigger=1)
    q = stream_upsert_foreach_batch(
        src, target, str(tmp_path / "ckpt")
    ).start()
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    snap = read_upsert_snapshot(spark, target)
    rows = {r.user_id: r for r in snap.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].event_type == "purchase"  # later ts won
    # same ts: event_id 2 ("view") > event_id 1 ("error") — stale loses
    assert rows[2].event_type == "view"
    # snapshot is one row per key, not event history
    assert snap.count() == 2


def test_stream_upsert_crash_between_write_and_repoint(
    spark, upsert_events_dir, tmp_path, monkeypatch
):
    """Kill the sink after the new snapshot is written but BEFORE the
    manifest repoint: the old manifest must still resolve (readers see
    the previous consistent state), and a checkpoint-replay restart
    must converge to the correct merged result."""
    import magictables_spark.streaming  # noqa: F401 - sink resolves os.replace at call time

    target = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(target)

    # batch 1 lands normally (only b1.json exists yet)
    d2 = tmp_path / "in2"
    d2.mkdir()
    (d2 / "b1.json").write_text(
        json.dumps({"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1,
                    "event_type": "signup", "value": 0.0})
    )
    q = stream_upsert_foreach_batch(read_events_stream(spark, str(d2)), target, ckpt).start()
    q.awaitTermination(120)
    q.stop()
    manifest = os.path.join(target, "LATEST")
    manifest_before = open(manifest).read()
    before = {(r.user_id, r.event_type) for r in read_upsert_snapshot(spark, target).collect()}
    assert before == {(1, "signup")}

    # batch 2 arrives, but the repoint "crashes"
    (d2 / "b2.json").write_text(
        json.dumps({"event_id": 3, "ts": "2024-01-01T01:00:00", "user_id": 1,
                    "event_type": "purchase", "value": 9.0})
    )
    real_replace = os.replace

    def crash_on_repoint(src, dst, *args, **kwargs):
        if os.path.basename(str(dst)) == "LATEST":
            raise OSError("simulated crash between snapshot write and repoint")
        return real_replace(src, dst, *args, **kwargs)

    monkeypatch.setattr(os, "replace", crash_on_repoint)
    q2 = stream_upsert_foreach_batch(read_events_stream(spark, str(d2)), target, ckpt).start()
    with pytest.raises(Exception, match="simulated crash|Query.*terminated"):
        q2.awaitTermination(120)
        q2.processAllAvailable()
    q2.stop()
    monkeypatch.setattr(os, "replace", real_replace)

    # old manifest untouched -> readers still resolve the OLD snapshot
    assert open(manifest).read() == manifest_before
    assert {
        (r.user_id, r.event_type) for r in read_upsert_snapshot(spark, target).collect()
    } == {(1, "signup")}

    # restart: checkpoint replays the failed batch and converges
    q3 = stream_upsert_foreach_batch(read_events_stream(spark, str(d2)), target, ckpt).start()
    q3.awaitTermination(120)
    q3.stop()
    assert {
        (r.user_id, r.event_type) for r in read_upsert_snapshot(spark, target).collect()
    } == {(1, "purchase")}
    assert open(manifest).read() != manifest_before


def test_stream_upsert_is_incremental_across_restarts(spark, upsert_events_dir, tmp_path):
    """availableNow + checkpoint: a second run with no new files must
    not rewrite state; adding a file processes only the delta."""
    target = str(tmp_path / "table")
    os.makedirs(target)
    ckpt = str(tmp_path / "ckpt")
    src = read_events_stream(spark, upsert_events_dir, max_files_per_trigger=1)
    q = stream_upsert_foreach_batch(src, target, ckpt).start()
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    # new late batch: user 2 recovers
    extra = {"event_id": 9, "ts": "2024-01-01T02:00:00", "user_id": 2, "event_type": "purchase", "value": 5.0}
    with open(os.path.join(upsert_events_dir, "b3.json"), "w") as f:
        f.write(json.dumps(extra))
    src2 = read_events_stream(spark, upsert_events_dir, max_files_per_trigger=1)
    q2 = stream_upsert_foreach_batch(src2, target, ckpt).start()
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()
    snap = read_upsert_snapshot(spark, target)
    rows = {r.user_id: r.event_type for r in snap.collect()}
    assert rows == {1: "purchase", 2: "purchase"}


def test_compact_files_reduces_file_count(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(32).write.parquet(frag)
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_in >= 16  # deliberately fragmented

    out = str(tmp_path / "compacted")
    n_out = compact_files(spark, frag, out, target_file_bytes=512 * 1024)
    assert n_out < n_in
    assert spark.read.parquet(out).count() == events.count()


def test_stream_upsert_subsecond_ordering(spark, tmp_path):
    """A later sub-second event with a LOWER event_id must win — the
    version order is full-precision (ts, event_id), not epoch
    seconds (regression: scalar epoch packing truncated to whole
    seconds and let the higher id win the tie it shouldn't see)."""
    rows = [
        {"event_id": 20, "ts": "2024-01-01T00:00:01.100", "user_id": 1, "event_type": "click", "value": 0.0},
        {"event_id": 10, "ts": "2024-01-01T00:00:01.900", "user_id": 1, "event_type": "purchase", "value": 0.0},
    ]
    d = tmp_path / "subsec_in"
    d.mkdir()
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    target = str(tmp_path / "table")
    os.makedirs(target)
    src = read_events_stream(spark, str(d))
    q = stream_upsert_foreach_batch(src, target, str(tmp_path / "ckpt")).start()
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    row = read_upsert_snapshot(spark, target).collect()[0]
    assert row.event_type == "purchase" and row.event_id == 10


def test_registered_query_runs_three_batches_and_reserves_warm(spark):
    """The driver-surface slug splits the fixture into 3 shards and
    must consume them as THREE micro-batches (maxFilesPerTrigger=1);
    a second invocation reuses the checkpoint (no new snapshot)."""
    import hashlib
    import os

    from magictables_spark.plans.events_pack import stream_upsert_foreachbatch
    from magictables_spark.warehouse import corpus_fingerprint, store_root

    sf = "/root/testdata/sf0.001"
    rows1 = sorted(tuple(r) for r in stream_upsert_foreachbatch(spark, sf).collect())
    cfp = corpus_fingerprint(os.path.join(sf, "events.parquet"))
    tag = hashlib.md5(
        f"{os.path.realpath(sf)}:{cfp}".encode()
    ).hexdigest()[:12]
    root = store_root(f"upsert_q_{tag}")
    offsets = sorted(os.listdir(os.path.join(root, "ckpt", "offsets")))
    assert {"0", "1", "2"} <= set(offsets), offsets
    with open(os.path.join(root, "target", "LATEST")) as f:
        snap1 = f.read()
    rows2 = sorted(tuple(r) for r in stream_upsert_foreachbatch(spark, sf).collect())
    assert rows2 == rows1
    with open(os.path.join(root, "target", "LATEST")) as f:
        assert f.read() == snap1  # warm: no re-merge, same snapshot
