"""Bucketed join (no-Exchange plan assertion) + salted join
(correctness vs plain join under skew)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magictables_spark.operators.scale import bucketed_join, salted_join, write_bucketed


def test_write_bucketed_survives_orphaned_location(spark):
    """A killed session leaves the table directory in the warehouse with
    no catalog entry; write_bucketed must clean it up instead of dying
    with LOCATION_ALREADY_EXISTS (the one red of round 2)."""
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(warehouse, "b_orphan")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "stale.parquet"), "wb") as f:
        f.write(b"not a real parquet file")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    write_bucketed(df, "b_orphan", ["k"], 4)
    assert spark.table("b_orphan").count() == 2
    spark.sql("DROP TABLE IF EXISTS b_orphan")


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # saveAsTable writes to the session's per-pid tmp warehouse dir
    # (see session.get_spark); tables dropped on teardown
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", ["custkey"], 8)
    write_bucketed(cust.withColumnRenamed("c_custkey", "custkey"), "b_cust", ["custkey"], 8)
    yield "b_orders", "b_cust"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so a shuffle would otherwise appear
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    # skewed left: 90% of rows share key 1
    left = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame([(1, "hot"), (20, "cold"), (999, "x")], "k bigint, rv string")
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", n_salts=8).collect()}
    assert salted == plain
    assert len(plain) > 900  # the hot key actually dominated


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, lv string")
    right = spark.createDataFrame([(1, "r")], "k int, rv string")
    got = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", n_salts=4, how="left").collect()}
    assert got == {(1, "a", "r"), (2, "b", None)}


def test_salted_join_rejects_right_and_full(spark):
    """Right/full outer would duplicate every unmatched right row once
    per salt — the operator must refuse instead of silently multiplying."""
    import pytest

    left = spark.createDataFrame([(1, "a")], "k int, lv string")
    right = spark.createDataFrame([(2, "r")], "k int, rv string")
    for how in ("right", "full", "outer", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(left, right, "k", how=how)


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A filter on the partition column must become PartitionFilters
    (planning-time directory pruning), and the pruned scan must touch
    fewer files than the full dataset."""
    import contextlib
    import io

    from magictables_spark.operators.scale import pruned_scan, write_partitioned

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_orderpriority"], sort_within=["o_orderdate"])

    scan = pruned_scan(spark, path, F.col("o_orderpriority") == "1-URGENT")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    # row parity with a post-hoc filter on the unpartitioned source
    expect = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert scan.count() == expect


def test_connected_components_chain_and_singletons(spark):
    """A 5-node chain (diameter 4) must collapse to one component via
    multi-round propagation; isolated nodes stay singletons."""
    from magictables_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src bigint, dst bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 99]], "id bigint")
    got = {
        r.id: r.component
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert {got[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert got[10] == got[11] == 10
    assert got[99] == 99


def test_connected_components_long_path_converges(spark):
    """Path graph deeper than typical near-dup clusters: a 30-node
    chain (diameter 29) must still fully converge within the default
    bound (min-label moves one hop per round)."""
    from magictables_spark.operators.components import connected_components

    n = 30
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint")
    got = {r.id: r.component for r in connected_components(edges, max_iter=n).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n


def test_star_components_deep_path_and_parity(spark):
    """Star contraction (hash-to-min) must fully resolve a 60-node path
    (diameter 59) in its default log-bounded rounds — the regime where
    min-label propagation needs 59 — and agree with min-label on a
    random graph."""
    import random

    from magictables_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    n = 60
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint")
    got = {r.id: r.component for r in connected_components_star(edges).collect()}
    assert set(got.values()) == {0} and len(got) == n

    random.seed(11)
    redges = [(random.randrange(150), random.randrange(150)) for _ in range(120)]
    rdf = spark.createDataFrame(redges, "src bigint, dst bigint")
    a = {r.id: r.component for r in connected_components_star(rdf).collect()}
    b = {r.id: r.component for r in connected_components(rdf, max_iter=60).collect()}
    assert a == b


def test_connected_components_detects_iteration_bound(spark):
    """Diameter > max_iter must RAISE (strict default), never return
    silently half-merged components; strict=False documents the escape
    hatch and returns the partial labels."""
    import pytest

    from magictables_spark.operators.components import connected_components

    n = 20
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)
    partial = {
        r.id: r.component
        for r in connected_components(edges, max_iter=3, strict=False).collect()
    }
    assert len(set(partial.values())) > 1  # genuinely unconverged


def test_observed_write_metrics(spark, sf_dir, tmp_path):
    from magictables_spark.operators.scale import observed_write

    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    instrumented, obs = observed_write(df)
    instrumented.write.mode("overwrite").parquet(str(tmp_path / "out"))
    metrics = obs.get
    assert metrics["n_rows"] == df.count()
    assert metrics["n_null_first_col"] == 0


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Joining a partitioned fact with a filtered dim must inject a
    dynamicpruning subquery into the fact scan — at 100 TB this is
    the difference between scanning 5 and 5000 partitions."""
    from pyspark.sql import functions as F

    fact_dir = str(tmp_path / "orders_by_status")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.partitionBy("o_orderstatus")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    dim = (
        spark.createDataFrame(
            [("F", "finished"), ("O", "open"), ("P", "pending")],
            "status string, label string",
        )
        .filter(F.col("label") == "finished")
    )
    joined = fact.join(dim, fact.o_orderstatus == dim.status).groupBy("label").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    rows = joined.collect()
    assert rows and rows[0]["count"] > 0
