"""Sustained-rate streaming probe (round-6 verdict item 4).

Drives the six stateful Structured Streaming families as a genuinely
MULTI-BATCH stream — the events fixture split into N time-ordered
single-file shards, consumed with ``maxFilesPerTrigger=1`` (the file
source's rate limiter), so every family executes >= N real micro-batches
with the watermark advancing between them — and records per batch:

- ``numInputRows`` and trigger latency (ms) -> rows/s;
- state-store size (``stateOperators[].numRowsTotal`` / memory bytes);
- the event-time watermark.

The point is the STATE-SIZE TRAJECTORY: every family is watermarked (or
key-bounded for the applyInPandasWithState totals), so state must rise
to a plateau and stay there while input keeps flowing — measured
evidence for the "watermarks bound state" claim SCALING.md previously
argued from construction. ``plateau_ratio`` in the summary is
max(state, last quartile of data batches) / max(state, first half):
~1.0 means state plateaued by mid-stream; unbounded state keeps growing
and reads ~2.0 on a linear trajectory.

Usage:
    python tools/stream_probe.py [--sf=/root/testdata/sf0.1]
        [--shards=24] [--families=tumbling,join] [--out=/tmp/...json]

The per-family steady-state table is recorded in SCALING.md; the
bounded-state assertion runs in tests/test_stream_sustained.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_shards(spark, sf_dir: str, n_shards: int) -> str:
    """Split the events fixture into ``n_shards`` time-ordered
    single-file parquet shards (file names AND mtimes ascending with
    event time, so the file source replays them chronologically and the
    watermark advances every batch). Staged once per (corpus, shards);
    content-fingerprinted like every other persisted store."""
    import hashlib

    from pyspark.sql import functions as F

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(
        f"v1:{n_shards}:{os.path.realpath(sf_dir)}:{cfp}".encode()
    ).hexdigest()[:12]
    root = store_root(f"stream_probe_{tag}")
    src = os.path.join(root, "src")
    marker = os.path.join(root, "_READY")
    if os.path.exists(marker):
        return src
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(src)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # TIMESTAMP_NTZ won't cast to double; unix_micros needs ltz — go via
    # an epoch difference, which both timestamp flavors support
    epoch = F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast("double")
    lo, hi = ev.agg(F.min(epoch), F.max(epoch)).first()
    span = max(1e-9, hi - lo)
    ev = ev.withColumn(
        "shard",
        F.least(
            F.floor((epoch - F.lit(lo)) / span * n_shards),
            F.lit(n_shards - 1),
        ).cast("int"),
    )
    now = time.time()
    for i in range(n_shards):
        part_dir = os.path.join(root, f"part{i}")
        ev.filter(F.col("shard") == i).drop("shard").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = next(
            f for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = os.path.join(src, f"shard_{i:03d}.parquet")
        shutil.move(os.path.join(part_dir, part), dst)
        os.utime(dst, (now + i, now + i))  # mtime order == event-time order
        shutil.rmtree(part_dir, ignore_errors=True)
    with open(marker, "w") as f:
        f.write("ok")
    return src


def _source(spark, src_dir: str):
    from pyspark.sql import functions as F

    schema = spark.read.parquet(src_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # the rate limiter: 1 shard/batch
        .parquet(src_dir)
        # fixture ts is TIMESTAMP_NTZ; watermarks require TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _families():
    """name -> (build(stream_df) -> streaming_df, output_mode). All six
    stateful families in their PRODUCTION shapes: watermark + append
    (or update for the explicit-state totals) — never complete mode,
    whose state holds every window forever by design."""
    from pyspark.sql import functions as F

    from magictables_spark.streaming import (
        stream_dedup_within_watermark,
        stream_interval_join,
        stream_running_totals,
        stream_session_counts,
        stream_tumbling_counts,
    )

    def sliding(src):
        return (
            src.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
        )

    def join(src):
        return stream_interval_join(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "view"),
        )

    return {
        "tumbling": (lambda s: stream_tumbling_counts(s), "append"),
        "sliding": (sliding, "append"),
        "session": (lambda s: stream_session_counts(s), "append"),
        "dedup": (lambda s: stream_dedup_within_watermark(s), "append"),
        "totals": (lambda s: stream_running_totals(s), "update"),
        "join": (join, "append"),
    }


def run_family(spark, src_dir: str, name: str, ckpt_root: str) -> dict:
    """Run one family over every shard (availableNow honors
    maxFilesPerTrigger, so this is >= n_shards micro-batches) and return
    its per-batch metrics + steady-state summary."""
    build, mode = _families()[name]
    qname = f"probe_{name}_{int(time.time() * 1000)}"
    ckpt = os.path.join(ckpt_root, name)
    shutil.rmtree(ckpt, ignore_errors=True)
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    # state partitions scoped down: each stateful partition pays a
    # per-batch state-store commit (the round-6 stream-join lesson)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            build(_source(spark, src_dir))
            .writeStream.format("noop")
            .queryName(qname)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    batches = []
    for p in progress:
        ops = p.get("stateOperators") or []
        batches.append(
            {
                "batch_id": p["batchId"],
                "input_rows": p.get("numInputRows", 0),
                "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
                "state_rows": sum(op.get("numRowsTotal", 0) for op in ops),
                "state_bytes": sum(op.get("memoryUsedBytes", 0) for op in ops),
                "rows_dropped_by_watermark": sum(
                    op.get("numRowsDroppedByWatermark", 0) for op in ops
                ),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )
    data = [b for b in batches if b["input_rows"] > 0]
    rates = sorted(
        b["input_rows"] / (b["trigger_ms"] / 1000.0)
        for b in data[3:]  # skip warm-up batches
        if b["trigger_ms"]
    )
    states = [b["state_rows"] for b in data]
    tail = states[-max(1, len(states) // 4):]
    first_half = states[: max(1, len(states) // 2)]
    summary = {
        "family": name,
        "n_batches": len(batches),
        "n_data_batches": len(data),
        "total_rows": sum(b["input_rows"] for b in data),
        "steady_rows_per_s": round(rates[len(rates) // 2], 1) if rates else None,
        "p95_batch_ms": sorted(b["trigger_ms"] for b in data)[
            int(0.95 * (len(data) - 1))
        ]
        if data
        else None,
        "state_rows_max": max(states) if states else 0,
        "state_rows_last": states[-1] if states else 0,
        "state_bytes_max": max(b["state_bytes"] for b in data) if data else 0,
        # max(state, last quartile) / max(state, FIRST HALF): ~1.0 means
        # state plateaued by mid-stream (watermark evicts as fast as new
        # windows open); unbounded state grows with batches and reads
        # ~2.0 on a linear trajectory
        "plateau_ratio": round(max(tail) / max(first_half), 3)
        if states and max(first_half)
        else None,
    }
    return {"summary": summary, "batches": batches}


def stage_doc_shards(spark, sf_dir: str, n_shards: int, split: int) -> str:
    """Split the documents fixture's new-crawl side (doc_id >= split)
    into ``n_shards`` equal doc_id-range files for the store-maintenance
    probes (round-8: the foreachBatch families stream documents/pairs,
    not events)."""
    import hashlib

    from pyspark.sql import functions as F

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    tag = hashlib.md5(
        f"v1:docs:{n_shards}:{split}:{os.path.realpath(sf_dir)}:{cfp}".encode()
    ).hexdigest()[:12]
    root = store_root(f"stream_probe_docs_{tag}")
    src = os.path.join(root, "src")
    marker = os.path.join(root, "_READY")
    if os.path.exists(marker):
        return src
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(src)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        f"doc_id >= {split}"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = max(1, (hi or 0) - (lo or 0) + 1)
    docs = docs.withColumn(
        "shard",
        F.least(
            F.floor((F.col("doc_id") - F.lit(lo)) / span * n_shards),
            F.lit(n_shards - 1),
        ).cast("int"),
    )
    now = time.time()
    for i in range(n_shards):
        part_dir = os.path.join(root, f"part{i}")
        docs.filter(F.col("shard") == i).drop("shard").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = next(
            f for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = os.path.join(src, f"shard_{i:03d}.parquet")
        shutil.move(os.path.join(part_dir, part), dst)
        os.utime(dst, (now + i, now + i))
        shutil.rmtree(part_dir, ignore_errors=True)
    with open(marker, "w") as f:
        f.write("ok")
    return src


def stage_event_shards(spark, sf_dir: str, n_shards: int) -> str:
    """Split the events fixture's day>=16 side into ``n_shards`` files
    by event_id % n_shards (mixes days across shards, so every rollup
    micro-batch genuinely MERGES into already-written day partitions
    instead of appending disjoint keys)."""
    import hashlib

    from pyspark.sql import functions as F

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(
        f"v1:events:{n_shards}:{os.path.realpath(sf_dir)}:{cfp}".encode()
    ).hexdigest()[:12]
    root = store_root(f"stream_probe_ev_{tag}")
    src = os.path.join(root, "src")
    marker = os.path.join(root, "_READY")
    if os.path.exists(marker):
        return src
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(src)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).filter(
        F.dayofmonth(F.col("ts").cast("date")) >= 16
    )
    now = time.time()
    for i in range(n_shards):
        part_dir = os.path.join(root, f"part{i}")
        ev.filter(F.col("event_id") % n_shards == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = next(
            f for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = os.path.join(src, f"shard_{i:03d}.parquet")
        shutil.move(os.path.join(part_dir, part), dst)
        os.utime(dst, (now + i, now + i))
        shutil.rmtree(part_dir, ignore_errors=True)
    with open(marker, "w") as f:
        f.write("ok")
    return src


def run_maintenance(spark, sf_dir: str, name: str, n_shards: int) -> dict:
    """Sustained probe for the foreachBatch STORE-MAINTENANCE families
    (simhash band store / LPA label store). These hold zero
    state-store rows — the external store is the state — so the
    bounded-work evidence is the PER-BATCH TRIGGER TIME trajectory:
    O(batch + touched) maintenance stays flat across n_shards batches
    while the accumulated store grows; O(accumulated-corpus)
    maintenance climbs linearly. ``work_ratio`` = median trigger ms of
    the last third / median of the first third (warm-up excluded):
    ~1.0 = flat, ~2.0+ = cost tracking the accumulated corpus."""
    import hashlib

    from pyspark.sql import functions as F

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    split = 150 if name == "lpa_store" else 250
    if name in ("simhash_store", "minhash_store"):
        src = stage_doc_shards(spark, sf_dir, n_shards, split)
    elif name == "rollup_store":
        src = stage_event_shards(spark, sf_dir, n_shards)
    cfp = corpus_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    tag = hashlib.md5(
        f"probe:{name}:{n_shards}:{os.path.realpath(sf_dir)}:{cfp}:{time.time()}".encode()
    ).hexdigest()[:12]
    root = store_root(f"probe_maint_{tag}")
    os.makedirs(root)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    if name == "simhash_store":
        from magictables_spark.plans.similarity import (
            _simhash_bands,
            _simhash_sig_frame,
        )

        store_dir = os.path.join(root, "store")
        hits_dir = os.path.join(root, "hits")
        _simhash_bands(
            _simhash_sig_frame(docs.filter(F.col("doc_id") < split))
        ).write.mode("overwrite").parquet(store_dir)
        spark.createDataFrame(
            [], "doc_id bigint, dup_of bigint, hamming int"
        ).write.mode("overwrite").parquet(hits_dir)

        def body(batch_df, _bid):
            bands = _simhash_bands(_simhash_sig_frame(batch_df)).localCheckpoint(
                eager=True
            )
            store = batch_df.sparkSession.read.parquet(store_dir).select(
                "band", "key", F.col("doc_id").alias("dup_of"), F.col("s").alias("sa")
            )
            (
                store.join(
                    bands.select("band", "key", "doc_id", F.col("s").alias("sb")),
                    ["band", "key"],
                )
                .select(
                    "doc_id",
                    "dup_of",
                    F.expr("CAST(bit_count(sa ^ sb) AS INT)").alias("hamming"),
                )
                .filter(F.col("hamming") <= 2)
                .distinct()
                .write.mode("append")
                .parquet(hits_dir)
            )
            bands.write.mode("append").parquet(store_dir)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        store_count = lambda: spark.read.parquet(store_dir).count()  # noqa: E731
    elif name == "minhash_store":
        from magictables_spark.plans.similarity import _minhash_tables
        from pyspark.sql.window import Window

        bands_dir = os.path.join(root, "bands")
        hs_dir = os.path.join(root, "hs")
        hits_dir = os.path.join(root, "hits")
        hs_h, bands_h = _minhash_tables(docs.filter(F.col("doc_id") < split))
        bands_h.write.mode("overwrite").parquet(bands_dir)
        hs_h.write.mode("overwrite").parquet(hs_dir)
        spark.createDataFrame(
            [], "doc_id bigint, dup_of bigint, jaccard double"
        ).write.mode("overwrite").parquet(hits_dir)

        def body(batch_df, _bid):
            hs_b, bands_b = _minhash_tables(batch_df)
            hs_b = hs_b.localCheckpoint(eager=True)
            bands_b = bands_b.localCheckpoint(eager=True)
            ss = batch_df.sparkSession
            store_bands = ss.read.parquet(bands_dir).select(
                "band", "bh", F.col("doc_id").alias("dup_of")
            )
            cand = (
                bands_b.join(store_bands, ["band", "bh"])
                .select("doc_id", "dup_of")
                .dropDuplicates(["doc_id", "dup_of"])
            )
            store_hs = ss.read.parquet(hs_dir).select(
                F.col("doc_id").alias("dup_of"), F.col("hs").alias("hh")
            )
            jac = (
                F.size(F.array_intersect("hb", "hh")).cast("double")
                / F.size(F.array_union("hb", "hh")).cast("double")
            )
            w = Window.partitionBy("doc_id").orderBy(
                F.desc("jaccard"), F.asc("dup_of")
            )
            (
                cand.join(hs_b.select("doc_id", F.col("hs").alias("hb")), "doc_id")
                .join(store_hs, "dup_of")
                .withColumn("jaccard", jac)
                .filter(F.col("jaccard") >= 0.5)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("doc_id", "dup_of", "jaccard")
                .write.mode("append")
                .parquet(hits_dir)
            )
            bands_b.write.mode("append").parquet(bands_dir)
            hs_b.write.mode("append").parquet(hs_dir)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        store_count = lambda: spark.read.parquet(bands_dir).count()  # noqa: E731
    elif name == "rollup_store":
        from magictables_spark.plans.events_pack import VAL_I

        store_dir = os.path.join(root, "store")
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

        def _partials(df):
            return (
                df.select(
                    F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                        "day"
                    ),
                    "event_type",
                    F.expr(VAL_I).alias("cents"),
                )
                .groupBy("day", "event_type")
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum("cents").alias("sum_cents"),
                )
            )

        _partials(
            ev.filter(F.dayofmonth(F.col("ts").cast("date")) < 16)
        ).write.partitionBy("day").mode("overwrite").parquet(store_dir)

        def body(batch_df, _bid):
            parts = _partials(batch_df).localCheckpoint(eager=True)
            touched = [r.day for r in parts.select("day").distinct().collect()]
            if not touched:
                return
            ss = batch_df.sparkSession
            cur = ss.read.parquet(store_dir).filter(F.col("day").isin(touched))
            merged = (
                cur.unionByName(parts)
                .groupBy("day", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_cents").alias("sum_cents"),
                )
                .localCheckpoint(eager=True)
            )
            (
                merged.write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("day")
                .mode("overwrite")
                .parquet(store_dir)
            )

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        store_count = lambda: spark.read.parquet(store_dir).count()  # noqa: E731
    else:  # lpa_store: the PAIR-EDGE stream itself is sharded — the
        # fixture's near-dup graph only spans doc_id < 200, so sharding
        # documents would put every edge in one batch; hashing the
        # PAIRS into n_shards gives every micro-batch real maintenance
        # work (closure + touched-component recompute) against a
        # growing store
        from magictables_spark.plans.textops import _lpa3, dedup_ngram_jaccard
        from magictables_spark.streaming import _resolve_snapshot

        pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")

        def _sym(pdf):
            return pdf.unionByName(
                pdf.select(
                    F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
                )
            ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))

        edges_dir = os.path.join(root, "edges")
        delta_dir = os.path.join(root, "delta")
        os.makedirs(delta_dir)
        spark.createDataFrame([], "a bigint, b bigint").write.mode(
            "overwrite"
        ).parquet(edges_dir)
        src = os.path.join(root, "pair_src")
        os.makedirs(src)
        sharded = pairs.withColumn(
            "shard",
            (F.xxhash64("doc_a", "doc_b") % n_shards + n_shards) % n_shards,
        )
        now = time.time()
        for i in range(n_shards):
            part_dir = os.path.join(root, f"ppart{i}")
            sharded.filter(F.col("shard") == i).drop("shard").coalesce(
                1
            ).write.mode("overwrite").parquet(part_dir)
            part = next(
                f for f in os.listdir(part_dir)
                if f.endswith(".parquet") and not f.startswith(".")
            )
            dst = os.path.join(src, f"shard_{i:03d}.parquet")
            shutil.move(os.path.join(part_dir, part), dst)
            os.utime(dst, (now + i, now + i))
            shutil.rmtree(part_dir, ignore_errors=True)

        def body(batch_df, bid):
            sp = batch_df.sparkSession
            new_edges = _sym(batch_df).localCheckpoint(eager=True)
            new_edges.write.mode("append").parquet(edges_dir)
            all_edges = sp.read.parquet(edges_dir).localCheckpoint(eager=True)
            snap = _resolve_snapshot(delta_dir)
            prior = (
                sp.read.parquet(snap)
                if snap is not None
                else sp.createDataFrame([], "v bigint, lab bigint")
            )
            affected = new_edges.select(F.col("a").alias("v")).distinct().localCheckpoint()
            while True:
                grown = (
                    all_edges.join(affected, all_edges.a == affected.v)
                    .select(F.col("b").alias("v"))
                    .distinct()
                    .join(affected, "v", "left_anti")
                    .localCheckpoint()
                )
                if grown.isEmpty():
                    break
                affected = affected.unionByName(grown).distinct().localCheckpoint()
            aff_edges = all_edges.join(
                affected.withColumnRenamed("v", "a"), "a", "left_semi"
            )
            labels = _lpa3(aff_edges, affected.withColumn("lab", F.col("v")))
            new_delta = prior.join(affected, "v", "left_anti").unionByName(labels)
            fresh = os.path.join(delta_dir, f"snapshot_b{bid}")
            new_delta.write.mode("overwrite").parquet(fresh)
            tmp = os.path.join(delta_dir, "LATEST.tmp")
            with open(tmp, "w") as f:
                f.write(os.path.basename(fresh))
            os.replace(tmp, os.path.join(delta_dir, "LATEST"))

        stream = (
            spark.readStream.schema("doc_a bigint, doc_b bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

        def store_count():
            snap = _resolve_snapshot(delta_dir)
            return spark.read.parquet(snap).count() if snap else 0

    qname = f"probe_maint_{name}_{int(time.time() * 1000)}"
    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [json.loads(p.json) for p in q.recentProgress]
    batches = [
        {
            "batch_id": p["batchId"],
            "input_rows": p.get("numInputRows", 0),
            "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
        }
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    times = [b["trigger_ms"] for b in batches[1:] if b["trigger_ms"]]  # skip warm-up
    third = max(1, len(times) // 3)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        "family": name,
        "n_data_batches": len(batches),
        "total_rows": sum(b["input_rows"] for b in batches),
        "first_third_ms": med(times[:third]) if times else None,
        "last_third_ms": med(times[-third:]) if times else None,
        "work_ratio": round(med(times[-third:]) / med(times[:third]), 3)
        if times and med(times[:third])
        else None,
        "store_rows_final": store_count(),
    }
    shutil.rmtree(root, ignore_errors=True)
    return {"summary": summary, "batches": batches}


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    shards = 24
    fams = list(_families())
    out = None
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--shards="):
            shards = int(a.split("=", 1)[1])
        elif a.startswith("--families="):
            fams = a.split("=", 1)[1].split(",")
        elif a == "--maintenance":
            fams = ["simhash_store", "lpa_store", "minhash_store", "rollup_store"]
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]

    from magictables_spark.session import get_spark

    spark = get_spark("stream_probe")
    spark.sparkContext.setLogLevel("ERROR")
    src = stage_shards(spark, sf_dir, shards)
    ckpt_root = os.path.join(
        os.path.dirname(src), f"ckpt_{int(time.time() * 1000)}"
    )
    results = {}
    for name in fams:
        if name in ("simhash_store", "lpa_store", "minhash_store", "rollup_store"):
            r = run_maintenance(spark, sf_dir, name, shards)
            results[name] = r
            s = r["summary"]
            print(
                f"{name}: {s['n_data_batches']} data batches, "
                f"{s['total_rows']} rows, per-batch ms first/last third "
                f"{s['first_third_ms']}/{s['last_third_ms']} "
                f"(work_ratio {s['work_ratio']}), "
                f"store {s['store_rows_final']} rows final"
            )
            continue
        r = run_family(spark, src, name, ckpt_root)
        results[name] = r
        s = r["summary"]
        print(
            f"{name}: {s['n_data_batches']} data batches, "
            f"{s['steady_rows_per_s']} rows/s steady, "
            f"p95 batch {s['p95_batch_ms']} ms, "
            f"state max {s['state_rows_max']} rows "
            f"({s['state_bytes_max']} B), plateau_ratio {s['plateau_ratio']}"
        )
    shutil.rmtree(ckpt_root, ignore_errors=True)
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
