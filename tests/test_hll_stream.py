"""hll_store_stream: foreachBatch maintenance of the persisted HLL
sketch store (the streaming twin of hll_rollup_incremental).

Contracts:
- streamed store estimates are REGISTER-IDENTICAL to a single-pass
  full-scan sketch (HLL union at fixed lgConfigK is associative +
  commutative, so three shard merges ≡ one pass);
- double-merge idempotence: re-merging an already-delivered batch is
  a no-op by algebra (the reason this store needs no applied-marker
  replay guard);
- estimates within 5% of the exact distinct count;
- warm re-invocation runs zero batches and serves identical rows.
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"


def _root():
    import hashlib

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "events.parquet"))
    tag = hashlib.md5(
        f"v2:hlls:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"hllstream_{tag}")


def test_streamed_store_matches_single_pass_sketch(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.features import hll_store_stream

    got = {r.event_type: r.approx_users for r in hll_store_stream(spark, SF).collect()}
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    one_pass = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert got == one_pass  # register-identical, not merely close
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est in got.items():
        assert abs(est - exact[et]) / exact[et] <= 0.05, (et, est, exact[et])


def test_double_merge_is_idempotent(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.features import hll_store_stream

    from magictables_spark.streaming.commit import VersionedStore

    hll_store_stream(spark, SF)  # ensure store exists
    root = _root()
    # round 10: the store is a VersionedStore (atomic CURRENT flips)
    store_dir = VersionedStore(os.path.join(root, "store")).current_path()
    before = {
        r.event_type: r.est
        for r in spark.read.parquet(store_dir)
        .select("event_type", F.hll_sketch_estimate("sk").alias("est"))
        .collect()
    }
    # replay shard 0 by hand: union an already-merged batch back in
    shard0 = spark.read.parquet(os.path.join(root, "src", "shard_0.parquet"))
    remerged = (
        spark.read.parquet(store_dir)
        .unionByName(
            shard0.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
        )
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    after = {r.event_type: r.est for r in remerged.collect()}
    assert after == before


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.features import hll_store_stream

    from magictables_spark.streaming.commit import VersionedStore

    r1 = sorted(tuple(r) for r in hll_store_stream(spark, SF).collect())
    root = _root()
    vs = VersionedStore(os.path.join(root, "store"))

    def snap():
        store = vs.current_path()
        return sorted(
            (f, os.stat(os.path.join(store, f)).st_mtime_ns)
            for f in os.listdir(store)
            if f.endswith(".parquet")
        )

    s1 = snap()
    r2 = sorted(tuple(r) for r in hll_store_stream(spark, SF).collect())
    assert r1 == r2
    assert snap() == s1
