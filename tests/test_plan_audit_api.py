"""MagicFrame.audit() / audit_plan(): the scale pre-flight must flag
genuinely bad plans and pass the good ones — same checks as the
per-round registry sweep (tools/plan_audit.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from magictables_spark.plans.audit import audit_plan


def test_clean_aggregate_passes(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    res = audit_plan(df)
    assert res.ok, str(res)
    # codegen_spans is informational only: under AQE the pre-execution
    # plan defers WholeStageCodegen wrapping to stage materialization
    assert res.shuffles >= 1


def test_cartesian_flagged(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/nation.parquet")
    b = spark.read.parquet(f"{sf_dir}/region.parquet")
    res = audit_plan(a.crossJoin(b).filter(F.col("n_nationkey") >= 0))
    codes = {f.code for f in res.findings}
    # Catalyst may plan a small cross join as BNLJ; either flag is the
    # right warning for an unkeyed join
    assert codes & {"CARTESIAN", "NESTED_LOOP_JOIN"}, str(res)


def test_row_python_udf_flagged(spark, sf_dir):
    slow = F.udf(lambda s: s.upper(), "string")
    df = spark.read.parquet(f"{sf_dir}/nation.parquet").select(slow("n_name").alias("u"))
    res = audit_plan(df)
    assert any(f.code == "ROW_PYTHON_UDF" and f.severity == "error" for f in res.findings), str(res)


def test_global_window_flagged_but_topk_exempt(spark, sf_dir):
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.orderBy("o_orderkey")  # no PARTITION BY: global sort
    res = audit_plan(o.withColumn("rn", F.row_number().over(w)))
    assert any(f.code == "SINGLE_PARTITION_EXCHANGE" for f in res.findings), str(res)

    topk = o.orderBy(F.desc("o_totalprice")).limit(5)
    assert audit_plan(topk).ok, str(audit_plan(topk))


def test_magicframe_audit_wires_through(spark, sf_dir):
    from magictables_spark.frame import MagicFrame

    mf = MagicFrame(spark.read.parquet(f"{sf_dir}/customer.parquet"), sources=["t"])
    res = mf.audit()
    assert res.ok and "PlanAudit" in str(res)


def test_scalar_agg_exchange_is_exempt():
    """The partial -> Exchange SinglePartition -> final global aggregate
    pattern ships one row per upstream task, not the dataset — it must
    NOT flag; a true global sort/window must."""
    from magictables_spark.plans.audit import _has_unreduced_single_partition_exchange

    scalar_agg = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- *(2) HashAggregate(keys=[], functions=[sum(x)])\n"
        "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=15]\n"
        "      +- *(1) HashAggregate(keys=[], functions=[partial_sum(x)])\n"
        "         +- FileScan parquet\n"
    )
    global_window = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "+- Window [row_number() windowspecdefinition(ts ASC)], [ts ASC]\n"
        "   +- *(1) Sort [ts ASC NULLS FIRST], false, 0\n"
        "      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]\n"
        "         +- FileScan parquet\n"
    )
    assert not _has_unreduced_single_partition_exchange(scalar_agg)
    assert _has_unreduced_single_partition_exchange(global_window)
    # one exempt + one real occurrence in the same plan still flags
    assert _has_unreduced_single_partition_exchange(scalar_agg + global_window)


def test_scalar_agg_exemption_on_live_plan(spark, sf_dir):
    """A real single-row global aggregate audits clean; a real global
    row_number window audits flagged."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from magictables_spark.plans.audit import audit_plan
    from magictables_spark.plans.registry import _t

    scalar = _t(spark, sf_dir, "orders").agg(F.sum("o_totalprice").alias("s"))
    assert "SINGLE_PARTITION_EXCHANGE" not in [f.code for f in audit_plan(scalar).findings]

    w = Window.orderBy("o_orderkey")
    glob = _t(spark, sf_dir, "orders").withColumn("rn", F.row_number().over(w))
    assert "SINGLE_PARTITION_EXCHANGE" in [f.code for f in audit_plan(glob).findings]
