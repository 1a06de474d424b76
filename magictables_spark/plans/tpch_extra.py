"""TPC-H-shaped deep queries: multi-join, correlated subqueries,
unpivot — the query shapes that stress Catalyst's decorrelation and
join planning (free rewrites the reference has no engine for,
SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import QTY_I, REV_I, _t, q


@q(
    "q5_local_supply",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-table join with a same-nation join predicate "
    "spanning customer and supplier, selective region filter. Catalyst "
    "reorders; nation/region broadcast; the customer-supplier nation "
    "equality rides the supplier join condition (no extra shuffle).",
    tags=("relational", "join", "flagship"),
)
def q5_local_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01'"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.expr(REV_I).alias("_rev_i")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr("CAST(SUM(_rev_i) AS DOUBLE) / 10000.0").alias("revenue"))
    )


_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-06-01'
)
GROUP BY o_orderpriority
"""


@q(
    "exists_subquery",
    oracle=_EXISTS_SQL,
    doc="Correlated EXISTS (TPC-H Q4 shape). Catalyst decorrelates to a "
    "left-semi join automatically — the rewrite class the reference "
    "has no engine for (SURVEY §4.2 'subquery decorrelation: free once "
    "we emit SQL'). Identical SQL text runs on both engines.",
    tags=("relational", "subquery", "sql"),
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_EXISTS_SQL)


@q(
    "scalar_subquery",
    oracle=f"""
    SELECT COUNT(*) AS n_small,
           CAST(SUM({QTY_I}) AS DOUBLE) / 100.0 AS total_small_qty
    FROM lineitem l
    WHERE {QTY_I} * 5 * (SELECT COUNT(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey)
          < (SELECT SUM(CAST(ROUND(i.l_quantity * 100) AS BIGINT))
             FROM lineitem i WHERE i.l_partkey = l.l_partkey)
    """,
    doc="Correlated scalar subquery (TPC-H Q17 shape: rows below 20% of "
    "their part's average quantity). The avg comparison is rearranged "
    "to pure int64 (qty*5*cnt < sum) so both engines compare exact "
    "integers — no float avg. Catalyst decorrelates both subqueries "
    "into one aggregate join on l_partkey.",
    tags=("relational", "subquery"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", F.expr(QTY_I).alias("_qi"))
    per_part = li.groupBy("l_partkey").agg(
        F.count("*").alias("_cnt"), F.sum("_qi").alias("_sum")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("_qi") * 5 * F.col("_cnt") < F.col("_sum"))
        .agg(
            F.count("*").alias("n_small"),
            F.expr("CAST(SUM(_qi) AS DOUBLE) / 100.0").alias("total_small_qty"),
        )
    )


@q(
    "unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_orderkey % 200 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey % 200 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_orderkey % 200 = 0
    """,
    doc="Unpivot/melt (Polars df.melt parity): wide metric columns to "
    "long (metric, val) rows. Spark unpivot expands map-side — no "
    "shuffle, 3x row multiplier before any exchange.",
    tags=("relational", "pivot"),
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "val",
        )
        .withColumn("metric", F.regexp_replace("metric", "^l_", ""))
    )


@q(
    "q10_returned_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM({REV_I}) DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue "
    "(4-table join, date + flag filters, group, top-k). Catalyst pushes "
    "both filters into the scans and broadcasts nation; the top-k is "
    "TakeOrderedAndProject (no global sort shuffle). Tie-break on "
    "c_custkey keeps LIMIT deterministic.",
    tags=("relational", "join", "flagship"),
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", F.expr(REV_I).alias("_rev_i"))
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("_rev_i").alias("_rev_sum"))
        .orderBy(F.desc("_rev_sum"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("_rev_sum").cast("double") / 10000.0).alias("revenue"),
        )
    )


@q(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(big.q AS DOUBLE) / 100.0 AS total_qty
    FROM (
      SELECT l_orderkey, SUM({QTY_I}) AS q
      FROM lineitem GROUP BY l_orderkey HAVING SUM({QTY_I}) > 20000
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape: large-volume orders (groupBy HAVING on the "
    "fact table, then join back to orders/customer). The HAVING "
    "aggregate runs first and shrinks the fact side to the qualifying "
    "orders before any join — the join input is |big orders|, not "
    "|lineitem|.",
    tags=("relational", "join", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.expr(QTY_I)).alias("q"))
        .filter(F.col("q") > 20000)
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            (F.col("q").cast("double") / 100.0).alias("total_qty"),
        )
    )


@q(
    "q14_promo_ratio",
    oracle=f"""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO' THEN {REV_I} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({REV_I}) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-03-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share — conditional aggregation "
    "over a fact-dimension join, single-row output. Both sums stay "
    "exact int64; the percentage is one double division, bit-identical "
    "across engines. part broadcasts; shipdate filter is pushed to the "
    "lineitem scan.",
    tags=("relational", "join", "agg"),
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-03-01").cast("date"))
        )
        .select("l_partkey", F.expr(REV_I).alias("_rev_i"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (
                    100
                    * F.sum(F.when(F.col("p_type") == "PROMO", F.col("_rev_i")).otherwise(0))
                ).cast("double")
                / F.sum("_rev_i").cast("double")
            ).alias("promo_pct")
        )
    )


# --- the three remaining TPC-H shapes: Q1 / Q4 / Q17 -----------------------
# (completing the 22-query suite; Q4/Q17 are ADAPTED to the fixture's
# reduced schema — no l_commitdate/l_receiptdate/p_container — with the
# adaptation pinned in the doc so parity with the spec query is explicit)

from magictables_spark.plans.joins_advanced import (  # noqa: E402
    _dec_dbl_duck,
    _dec_dbl_spark,
)
from magictables_spark.plans.registry import (  # noqa: E402
    CHARGE_I,
    DISC_I,
    PRICE_I,
)

_Q1_CUT = "TIMESTAMP '1997-12-01'"


def _q1_cols(dd) -> list[str]:
    nd = "CAST(n AS DOUBLE)"
    return [
        "l_returnflag",
        "l_linestatus",
        "(CAST(sq AS DOUBLE) / 100.0) AS sum_qty",
        "(CAST(sp AS DOUBLE) / 100.0) AS sum_base_price",
        f"({dd('sr')} / 10000.0) AS sum_disc_price",
        f"({dd('sc')} / 1000000.0) AS sum_charge",
        f"(CAST(sq AS DOUBLE) / 100.0 / {nd}) AS avg_qty",
        f"(CAST(sp AS DOUBLE) / 100.0 / {nd}) AS avg_price",
        f"(CAST(sd AS DOUBLE) / 100.0 / {nd}) AS avg_disc",
        "n AS count_order",
    ]


@q(
    "q1_pricing_summary",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({QTY_I}) AS BIGINT) AS sq,
             CAST(SUM({PRICE_I}) AS BIGINT) AS sp,
             CAST(SUM({DISC_I}) AS BIGINT) AS sd,
             SUM(CAST({REV_I} AS HUGEINT)) AS sr,
             SUM(CAST({CHARGE_I} AS HUGEINT)) AS sc
      FROM lineitem WHERE l_shipdate <= {_Q1_CUT}
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT {', '.join(_q1_cols(_dec_dbl_duck))}
    FROM s ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary (the canonical scan-agg benchmark "
    "query), completing the 22-query suite: per (returnflag, "
    "linestatus), sum/avg of quantity, base price, discounted price "
    "sum(price*(1-disc)) and charge sum(price*(1-disc)*(1+tax)). All "
    "eight aggregates ride ONE map-side-combining keyed agg over "
    "exact scaled integers — qty/price/disc in int64, the 10^4- and "
    "10^6-scaled rev/charge products in DECIMAL(38,0)/HUGEINT (a "
    "charge row is ~1e11, so int64 would overflow near 1e8 rows — "
    "the corr_exact overflow lesson applied up front); averages are "
    "the shared fixed IEEE chain over exact sums. Plan: one shuffle "
    "keyed on the 4-6 group keys, pushed shipdate filter, ~6-row "
    "result at any scale.",
    tags=("tpch", "relational"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "DECIMAL(38, 0)"
    s = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.expr(f"l_shipdate <= {_Q1_CUT}"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr(QTY_I)).cast("long").alias("sq"),
            F.sum(F.expr(PRICE_I)).cast("long").alias("sp"),
            F.sum(F.expr(DISC_I)).cast("long").alias("sd"),
            F.sum(F.expr(f"CAST({REV_I} AS {dec})")).alias("sr"),
            F.sum(F.expr(f"CAST({CHARGE_I} AS {dec})")).alias("sc"),
        )
    )
    return s.selectExpr(*_q1_cols(_dec_dbl_spark)).orderBy(
        "l_returnflag", "l_linestatus"
    )


@q(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 order-priority checking, ADAPTED to the fixture "
    "schema: the spec's late-commit predicate (l_commitdate < "
    "l_receiptdate) uses columns the synthetic lineitem does not "
    "carry, so the late-shipment proxy l_shipdate > o_orderdate + 60 "
    "days keeps the exact query SHAPE — a quarter-window filter on "
    "orders and a correlated EXISTS against the fact table that "
    "Catalyst decorrelates to a LEFT SEMI hash join (only the order "
    "key + dates shuffle, never lineitem payload), then a 5-row "
    "priority count. The semi-join-after-decorrelation plan is the "
    "point of Q4; the filter constant is pinned for the oracle.",
    tags=("tpch", "relational", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1997-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-04-01'"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "q17_small_quantity",
    oracle=f"""
    WITH pl AS (
      SELECT l.l_partkey, {QTY_I} AS qty_i, {PRICE_I} AS price_i
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#13' AND p.p_size <= 10
    ), avgq AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qty_i) AS BIGINT) AS sq
      FROM pl GROUP BY l_partkey
    )
    SELECT (CAST(SUM(price_i) AS DOUBLE) / 100.0 / 7.0) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines
    FROM pl JOIN avgq USING (l_partkey)
    WHERE 5 * qty_i * n < sq
    """,
    doc="TPC-H Q17 small-quantity-order revenue, ADAPTED to the "
    "fixture schema (no p_container; the brand + size<=10 filter "
    "keeps a comparable selectivity): for filtered parts, revenue "
    "from lineitems whose quantity is below 20%% of that part's "
    "average quantity, divided by 7 (the spec's yearly scaling). The "
    "correlated scalar subquery avg(l_quantity)-per-part is "
    "decorrelated into one keyed agg + a self-join on l_partkey, and "
    "the 20%%-of-average predicate is cross-multiplied into EXACT "
    "integers (5*qty*n < sum_qty) — no division, no doubles, no "
    "epsilon. Plan: the part dim filter broadcasts into the fact "
    "scan; the avg frame is per-part (bounded by the filtered part "
    "count) and joins back broadcast; one final 1-row agg.",
    tags=("tpch", "relational", "subquery"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    pl = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .selectExpr("l_partkey", f"{QTY_I} AS qty_i", f"{PRICE_I} AS price_i")
    )
    avgq = pl.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qty_i").cast("long").alias("sq"),
    )
    return (
        pl.join(F.broadcast(avgq), "l_partkey")
        .filter(F.expr("5 * qty_i * n < sq"))
        .agg(
            F.expr("(CAST(SUM(price_i) AS DOUBLE) / 100.0 / 7.0) AS avg_yearly"),
            F.count("*").cast("long").alias("n_small_lines"),
        )
    )
