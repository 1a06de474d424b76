"""rollup_store_stream: foreachBatch maintenance of the materialized
(day, event_type) rollup via dynamic partition overwrite.

Contracts:
- merged store == from-scratch GROUP BY over the whole table (the
  associative/commutative-partials proof, checked here in-engine; the
  oracle hash-checks it cross-engine);
- UNTOUCHED history partitions are never rewritten by the streaming
  merges: their file mtimes predate the first applied-batch marker
  (dynamic partitionOverwriteMode only replaces touched days);
- re-invocation reuses the checkpoint: zero new batches, identical
  rows, store files untouched, no new applied markers (idempotent
  replay guard).
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"


def _root():
    import hashlib

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "events.parquet"))
    tag = hashlib.md5(
        f"v2:16:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"rollstream_{tag}")


def _store_files(root):
    out = []
    store = os.path.join(root, "store")
    for dirpath, _dirs, files in os.walk(store):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out.append((os.path.relpath(p, store), os.stat(p).st_mtime_ns))
    return sorted(out)


def test_merged_store_equals_full_rollup_and_history_untouched(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.events_pack import VAL_I, rollup_store_stream

    got = {
        (r.day, r.event_type): (r.n_events, r.sum_cents)
        for r in rollup_store_stream(spark, SF).collect()
    }
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    want = {
        (r.day, r.event_type): (r.n_events, r.sum_cents)
        for r in ev.select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
            F.expr(VAL_I).alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents"))
        .collect()
    }
    assert got == want

    root = _root()
    markers = sorted(os.listdir(os.path.join(root, "applied")))
    assert markers == ["batch_0", "batch_1", "batch_2"]
    first_merge_ns = os.stat(os.path.join(root, "applied", "batch_0")).st_mtime_ns
    # every history-day (< 16) partition file predates the first merge:
    # dynamic overwrite replaced only the touched day-partitions
    hist = [
        (rel, ns)
        for rel, ns in _store_files(root)
        if rel.split("=")[1][:10] < "2024-01-16" or "day=" not in rel
    ]
    assert hist, "history partitions must exist"
    for rel, ns in hist:
        assert ns < first_merge_ns, rel


def test_crash_between_store_write_and_marker_recovers_exactly_once(spark):
    """Kill the maintainer in the ADVICE-flagged window — store
    partitions rewritten, applied marker NOT yet on disk — then restart
    from the checkpoint. The replayed batch must not double-merge: the
    per-partition last_batch stamp makes the dynamic overwrite
    idempotent, so the recovered store still equals the from-scratch
    rollup (exactly-once despite at-least-once foreachBatch)."""
    import shutil

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from magictables_spark.plans.events_pack import VAL_I, rollup_store_stream

    shutil.rmtree(_root(), ignore_errors=True)  # force a cold build

    with pytest.raises(StreamingQueryException, match="injected crash"):
        rollup_store_stream(spark, SF, _crash_after_write=frozenset({1}))

    root = _root()
    markers = sorted(os.listdir(os.path.join(root, "applied")))
    assert markers == ["batch_0"], markers  # died inside batch 1

    got = {
        (r.day, r.event_type): (r.n_events, r.sum_cents)
        for r in rollup_store_stream(spark, SF).collect()
    }
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    want = {
        (r.day, r.event_type): (r.n_events, r.sum_cents)
        for r in ev.select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
            F.expr(VAL_I).alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents"))
        .collect()
    }
    assert got == want
    assert sorted(os.listdir(os.path.join(root, "applied"))) == [
        "batch_0",
        "batch_1",
        "batch_2",
    ]


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.events_pack import rollup_store_stream

    r1 = sorted(tuple(r) for r in rollup_store_stream(spark, SF).collect())
    root = _root()
    f1 = _store_files(root)
    m1 = sorted(os.listdir(os.path.join(root, "applied")))
    r2 = sorted(tuple(r) for r in rollup_store_stream(spark, SF).collect())
    assert r1 == r2
    assert _store_files(root) == f1
    assert sorted(os.listdir(os.path.join(root, "applied"))) == m1
