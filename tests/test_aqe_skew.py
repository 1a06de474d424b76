"""AQE runtime behaviors: skew-join splitting and partition coalescing.

operators/scale.py covers the *manual* skew arsenal (salting, two-phase
agg); these tests pin down the *automatic* path — AQE is enabled in
session.py, and at 100 TB it is the first line of defense, so the
session settings that make it work are load-bearing and guarded here.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_aqe_coalesces_post_shuffle_partitions(spark, sf_dir):
    """A tiny aggregate must not produce spark.sql.shuffle.partitions
    output partitions — AQE coalesces them to match the data."""
    out = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
    )
    n_parts = out.rdd.getNumPartitions()
    configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n_parts < configured, (n_parts, configured)


def test_skewed_join_matches_plain_join(spark, sf_dir):
    """A 90%-hot-key join must return identical results whether AQE
    splits the skew or not (correctness under the skew optimizer)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        # collapse 90% of rows onto one key to force skew
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
    )
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.when(F.col("o_orderkey") % 10 < 9, F.lit(1))
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
        "o_orderpriority",
    ).groupBy("k").agg(F.min("o_orderpriority").alias("o_orderpriority"))
    joined = li.join(dim, "k").groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum(F.expr("CAST(ROUND(l_quantity*100) AS BIGINT)")).alias("q")
    )
    with_aqe = {tuple(r) for r in joined.collect()}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        without_aqe = {tuple(r) for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert with_aqe == without_aqe
