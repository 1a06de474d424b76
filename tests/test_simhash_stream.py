"""simhash_store_stream: foreachBatch maintenance of the persisted
simhash band store (round-7 verdict item 2).

Contracts:
- the store grows by EXACTLY each micro-batch's band rows (the index
  is the state, and it grows by the increment — O(batch) per turn,
  never a recompute of the accumulated corpus);
- re-invocation reuses the checkpoint: zero new batches, identical
  rows, store/results files untouched (warm-serve contract);
- every reported pair is a true Hamming<=2 pair whose dup_of really
  precedes doc_id in stream order (history first, then shards 0..2).
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"
B = 250


def _root(spark):
    import hashlib

    from magictables_spark.plans.similarity import _SH_BANDS, _SH_BITS
    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "documents.parquet"))
    tag = hashlib.md5(
        f"v2:{B}:{_SH_BANDS}x{_SH_BITS}:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"shstream_{tag}")


def test_store_grows_by_exactly_the_increment(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.similarity import (
        _simhash_bands,
        _simhash_sig_frame,
        simhash_store_stream,
    )

    rows = simhash_store_stream(spark, SF).collect()
    root = _root(spark)
    from magictables_spark.streaming.commit import subdir_store_paths

    store_paths = subdir_store_paths(os.path.join(root, "store"))
    assert [os.path.basename(d) for d in store_paths] == ["b0", "b1", "b2", "seed"]
    store_n = spark.read.parquet(*store_paths).count()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    all_bands = _simhash_bands(_simhash_sig_frame(docs)).count()
    # history seed + one append per shard == every doc banded once
    assert store_n == all_bands
    # stream-order correctness: dup_of precedes doc_id (history or an
    # earlier shard), never the same or a later shard
    for r in rows:
        assert r.doc_id >= B
        assert r.dup_of < B or (r.dup_of % 3) < (r.doc_id % 3)
        assert 0 <= r.hamming <= 2


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.similarity import simhash_store_stream

    r1 = sorted(tuple(r) for r in simhash_store_stream(spark, SF).collect())
    root = _root(spark)

    def snap(d):
        p = os.path.join(root, d)
        return sorted(
            (f, os.stat(os.path.join(p, f)).st_mtime_ns)
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    s1, h1 = snap("store"), snap("hits")
    r2 = sorted(tuple(r) for r in simhash_store_stream(spark, SF).collect())
    assert r1 == r2
    # checkpoint saw no new files -> no append happened anywhere
    assert snap("store") == s1 and snap("hits") == h1
