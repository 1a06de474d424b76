"""minhash_store_stream: foreachBatch maintenance of the persisted
MinHash-LSH band + shingle-set store (round-8: completes the
streaming twin family — simhash/LPA/IVF stores got theirs in the
prior commits, this is the fuzzy-Jaccard leg).

Contracts:
- the band store AND the shingle-set store grow by EXACTLY each
  micro-batch's rows (the index is the state, O(batch) per turn —
  never a recompute of the accumulated corpus);
- re-invocation reuses the checkpoint: zero new batches, identical
  rows, store/results files untouched (warm-serve contract);
- every reported match is a true jaccard>=0.5 pair whose dup_of
  really precedes doc_id in stream order (history first, then
  shards 0..2), at most one best-match row per batch doc.
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"
B = 250


def _root(spark):
    import hashlib

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "documents.parquet"))
    tag = hashlib.md5(
        f"v2:{B}:mh16x4:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"mhstream_{tag}")


def test_store_grows_by_exactly_the_increment(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.similarity import (
        _minhash_tables,
        minhash_store_stream,
    )

    rows = minhash_store_stream(spark, SF).collect()
    root = _root(spark)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    hs_all, bands_all = _minhash_tables(docs)
    # history seed + one append per shard == every eligible doc once
    from magictables_spark.streaming.commit import subdir_store_paths

    bands_paths = subdir_store_paths(os.path.join(root, "bands"))
    hs_paths = subdir_store_paths(os.path.join(root, "hs"))
    # history seed + one subdir per batch (round-10 idempotent layout)
    assert [os.path.basename(d) for d in bands_paths] == ["b0", "b1", "b2", "seed"]
    assert spark.read.parquet(*bands_paths).count() == bands_all.count()
    assert spark.read.parquet(*hs_paths).count() == hs_all.count()
    # stream-order correctness + best-match uniqueness
    seen = set()
    for r in rows:
        assert r.doc_id >= B
        assert r.dup_of < B or (r.dup_of % 3) < (r.doc_id % 3)
        assert r.jaccard >= 0.5
        assert r.doc_id not in seen  # rn=1: one best match per doc
        seen.add(r.doc_id)


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.similarity import minhash_store_stream

    r1 = sorted(tuple(r) for r in minhash_store_stream(spark, SF).collect())
    root = _root(spark)

    def snap(d):
        p = os.path.join(root, d)
        return sorted(
            (f, os.stat(os.path.join(p, f)).st_mtime_ns)
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    snaps1 = {d: snap(d) for d in ("bands", "hs", "hits")}
    r2 = sorted(tuple(r) for r in minhash_store_stream(spark, SF).collect())
    assert r1 == r2
    # checkpoint saw no new files -> no append happened anywhere
    for d in ("bands", "hs", "hits"):
        assert snap(d) == snaps1[d]
