"""MLlib-variant quality gates: agreement with the exact
expression-based operators they mirror."""

from __future__ import annotations

from pyspark.sql import functions as F

from magictables_spark.plans.queries import REGISTRY


def test_minhash_mllib_agrees_with_exact_jaccard(spark, sf_dir):
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    mllib = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_minhash_mllib"].fn(spark, sf_dir).collect()
    }
    # every high-jaccard exact pair should be recovered (8 hash tables
    # at j>=0.7 — recall ~1); hashed-shingle jaccard may differ slightly
    # from string-shingle jaccard only on hash collisions (2^18 buckets)
    high = {p for p, j in exact.items() if j >= 0.7}
    assert high, "fixture produced no high-jaccard pairs"
    missed = high - set(mllib)
    assert not missed, f"MinHashLSH missed: {missed}"
    for p in set(mllib) & set(exact):
        assert abs(mllib[p] - exact[p]) < 0.02


def test_brp_lsh_recall_vs_exact_cosine(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"]
        .fn(spark, sf_dir)
        .filter(F.col("query_id") < 3)
        .collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_brp_lsh_mllib"].fn(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"BRP-LSH recall too low: {recall:.2f}"


def test_tfidf_mllib_sane(spark, sf_dir):
    out = REGISTRY["tfidf_mllib"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(r.tfidf_sq_norm >= 0 for r in rows)
    # docs exist with repeated vocab -> at least some nonzero vectors
    assert sum(1 for r in rows if r.n_terms > 0) > 400
