"""Quality gates for the pipeline pack's non-oracle pieces.

The oracle-checked slugs are covered by test_oracle_parity; here we
gate the sketch (freqItems must contain every true heavy hitter — the
KSP guarantee) and the determinism property of hash-bucket sampling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from magictables_spark.plans.queries import REGISTRY


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    candidates = {
        r.candidate_user_id
        for r in REGISTRY["freq_items_approx"].fn(spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = events.count()
    true_hot = {
        r.user_id
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 0.02 * total)
        .collect()
    }
    missing = true_hot - candidates
    assert not missing, f"freqItems dropped true heavy hitters: {missing}"


def test_hash_bucket_sample_is_stable_across_runs(spark, sf_dir):
    fn = REGISTRY["sample_hash_bucket"].fn
    a = sorted(r.doc_id for r in fn(spark, sf_dir).collect())
    b = sorted(r.doc_id for r in fn(spark, sf_dir).collect())
    assert a == b and len(a) > 0


def test_train_test_split_partitions_every_doc(spark, sf_dir):
    rows = {r.split: r.n_docs for r in REGISTRY["train_test_split"].fn(spark, sf_dir).collect()}
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows.get("train", 0) + rows.get("test", 0) == total
    # ~25% train with generous tolerance at small SF
    assert 0.10 < rows["train"] / total < 0.45
