"""dedup_store_stream: foreachBatch admission dedup against the
persisted fingerprint store (the streaming twin of
dedup_incremental_store — last leg of the store-maintenance symmetry).

Contracts:
- the store stays a SET and equals the distinct fingerprints of the
  whole corpus after the run (history seed + exactly the admitted
  increment per batch);
- admissions are first-seen-wins in stream order: one doc per fp, and
  no admitted fp appears in the history split;
- re-invocation reuses the checkpoint: zero new batches, identical
  rows, store/admission files untouched.
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"
B = 250


def _root():
    import hashlib

    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "documents.parquet"))
    tag = hashlib.md5(
        f"v2:{B}:fps:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"fpstream_{tag}")


def test_store_is_the_corpus_fingerprint_set(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.textops import dedup_store_stream

    rows = dedup_store_stream(spark, SF).collect()
    root = _root()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    from magictables_spark.streaming.commit import subdir_store_paths

    store = spark.read.parquet(*subdir_store_paths(os.path.join(root, "store")))
    n_all_fps = docs.select(F.md5("text")).distinct().count()
    assert store.count() == n_all_fps  # set, not multiset
    assert store.distinct().count() == n_all_fps

    hist_fps = {
        r.fp
        for r in docs.filter(F.col("doc_id") < B)
        .select(F.md5("text").alias("fp"))
        .distinct()
        .collect()
    }
    seen_fp, seen_doc = set(), set()
    for r in rows:
        assert r.doc_id >= B
        assert r.fp not in hist_fps  # history always wins
        assert r.fp not in seen_fp  # one admission per fingerprint
        seen_fp.add(r.fp)
        seen_doc.add(r.doc_id)
    # store == history + admitted increment, nothing else
    assert len(hist_fps) + len(seen_fp) == n_all_fps


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.textops import dedup_store_stream

    r1 = sorted(tuple(r) for r in dedup_store_stream(spark, SF).collect())
    root = _root()

    def snap(d):
        p = os.path.join(root, d)
        return sorted(
            (f, os.stat(os.path.join(p, f)).st_mtime_ns)
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    s1 = {d: snap(d) for d in ("store", "admitted")}
    r2 = sorted(tuple(r) for r in dedup_store_stream(spark, SF).collect())
    assert r1 == r2
    for d in ("store", "admitted"):
        assert snap(d) == s1[d]
