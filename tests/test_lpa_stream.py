"""lpa_store_stream: foreachBatch community maintenance (round-7
verdict item 8). Contracts:

- result identical to the batch incremental twin AND (by the oracle)
  to the full recompute;
- warm re-invocation replays the checkpoint: zero new batches, same
  rows, delta snapshot untouched;
- per-batch delta stays O(touched): the final delta holds only nodes
  of components that gained a streamed edge, never the whole graph.
"""

from __future__ import annotations

import hashlib
import os

SF = "/root/testdata/sf0.001"


def _root():
    from magictables_spark.plans.textops import _LPA_HIST_SPLIT
    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "documents.parquet"))
    tag = hashlib.md5(
        f"v2:lpastream:{_LPA_HIST_SPLIT}:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"lpastream_{tag}")


def test_stream_equals_batch_incremental_and_delta_is_touched_only(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.textops import (
        _LPA_HIST_SPLIT,
        dedup_ngram_jaccard,
        label_propagation_incremental,
        lpa_store_stream,
    )
    from magictables_spark.streaming import _resolve_snapshot

    streamed = sorted(tuple(r) for r in lpa_store_stream(spark, SF).collect())
    batch = sorted(
        tuple(r) for r in label_propagation_incremental(spark, SF).collect()
    )
    assert streamed == batch and len(streamed) > 0

    # delta holds exactly the closure of the streamed edges' endpoints:
    # every delta node's component gained an edge with an endpoint >= H
    root = _root()
    delta = spark.read.parquet(_resolve_snapshot(os.path.join(root, "delta")))
    n_delta = delta.count()
    pairs = dedup_ngram_jaccard(spark, SF)
    new_endpoints = (
        pairs.filter(
            (F.col("doc_a") >= _LPA_HIST_SPLIT) | (F.col("doc_b") >= _LPA_HIST_SPLIT)
        )
        .selectExpr("doc_a AS v")
        .unionByName(
            pairs.filter(
                (F.col("doc_a") >= _LPA_HIST_SPLIT)
                | (F.col("doc_b") >= _LPA_HIST_SPLIT)
            ).selectExpr("doc_b AS v")
        )
        .distinct()
    )
    n_docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).count()
    assert 0 < n_delta < n_docs  # touched subset, never the whole graph
    # all streamed endpoints are in the delta (closure is a superset)
    missing = new_endpoints.join(delta, "v", "left_anti").count()
    assert missing == 0


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.textops import lpa_store_stream
    from magictables_spark.streaming import _resolve_snapshot

    r1 = sorted(tuple(r) for r in lpa_store_stream(spark, SF).collect())
    root = _root()
    snap1 = _resolve_snapshot(os.path.join(root, "delta"))
    m1 = os.stat(snap1).st_mtime_ns
    edges1 = sorted(os.listdir(os.path.join(root, "edges")))
    r2 = sorted(tuple(r) for r in lpa_store_stream(spark, SF).collect())
    assert r1 == r2
    assert _resolve_snapshot(os.path.join(root, "delta")) == snap1
    assert os.stat(snap1).st_mtime_ns == m1
    assert sorted(os.listdir(os.path.join(root, "edges"))) == edges1
