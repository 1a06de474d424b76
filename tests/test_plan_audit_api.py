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
