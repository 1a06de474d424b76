"""Physical-plan assertions for the strategy-control slugs."""

from __future__ import annotations

from magictables_spark.plans.queries import REGISTRY


def _plan(spark, sf_dir, slug: str) -> str:
    return (
        REGISTRY[slug].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_shuffle_hash_hint_takes_effect(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_shuffle_hash")
    assert "ShuffledHashJoin" in plan, plan


def test_hypertable_rollup_is_single_pass(spark, sf_dir):
    plan = _plan(spark, sf_dir, "hypertable_rollup")
    # one scan + one Expand: all three resolutions from a single pass
    assert plan.count("Expand") == 1, plan
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2, plan


def test_funnel_single_data_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "funnel_conversion")
    # one hash-partitioned exchange for the windows + the 1-row final agg
    assert plan.count("Exchange") <= 2, plan


def test_array_hof_no_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "array_hof")
    assert "Exchange" not in plan, plan


def test_chain_payload_join_broadcasts(spark, tmp_path):
    """chain_enrich promises the payload join-back is a broadcast when
    the distinct-URL set is small (operators/chain.py module doc); at
    100 TB the left side never shuffles for the enrichment join."""
    from magictables_spark.operators.chain import fetch_urls, url_expr
    from magictables_spark.warehouse import Warehouse
    from tests.test_chain import MockFetcher

    df = spark.createDataFrame([(i % 7,) for i in range(500)], "user_id int")
    with_url = df.withColumn("__url", url_expr("http://api/user/{user_id}"))
    payloads = fetch_urls(
        spark,
        with_url.select("__url"),
        MockFetcher(str(tmp_path / "calls.log")),
        Warehouse(str(tmp_path / "wh")),
        for_join=True,
    )
    joined = with_url.join(payloads, "__url", "left")
    joined.collect()  # materialize so AQE finalizes join strategies
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_orc_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    """The ORC round-trip's read side must push the shipdate predicate
    into the ORC scan and read only the 4 projected columns — format
    parity with the parquet pushdown guarantees."""
    plan = _plan(spark, sf_dir, "scan_orc_roundtrip")
    assert "Scan orc" in plan or "FileScan orc" in plan, plan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200], plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """The point of bucketed_join_colocated: with broadcast disabled,
    the sort-merge join over the two bucketed tables must consume the
    bucket layout directly — no Exchange feeds the join; the only
    hash exchange in the whole plan is the 5-group mktsegment agg."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "bucketed_join_colocated")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Bucketed: true" in plan, plan


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    """partitioned_prune's filter must bind to the partition column:
    the scan lists only the matching day's directory (PartitionFilters
    carries the predicate; no row-level filter remains for it)."""
    plan = _plan(spark, sf_dir, "partitioned_prune")
    assert "PartitionFilters" in plan, plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "event_date" in pf.group(1), plan


def test_dpp_star_join_prunes_at_runtime(spark, sf_dir):
    """dpp_star_join's fact scan must carry a DYNAMIC pruning
    expression on the partition column (the dim's broadcast feeds a
    runtime IN-subquery), proving the partitioned fact is pruned by
    the join, not by any static literal."""
    plan = _plan(spark, sf_dir, "dpp_star_join")
    assert "dynamicpruningexpression" in plan, plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "month" in pf.group(1) and "dynamicpruning" in pf.group(1), plan
