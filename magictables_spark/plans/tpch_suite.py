"""The remaining TPC-H query shapes (Q2,Q6,Q7,Q8,Q9,Q11,Q12,Q13,Q15,
Q16,Q19,Q20,Q21,Q22), adapted to the fixture schema.

The fixtures have no ``partsupp`` table and drop several classic
columns (l_shipmode, l_commitdate, c_phone, p_container), so each
query keeps its *shape* — the planner-stressing structure: correlated
MIN subqueries, double-nested IN, EXISTS + NOT-EXISTS on the same
fact table, left-join-with-ON-predicate, scalar-aggregate HAVING —
while predicates are remapped onto existing columns. The supply
relation (partsupp) is derived from ``lineitem`` sale events where
needed (q2, q11, q16, q20).

Cross-engine determinism follows registry.py's rules: money stays in
scaled int64 until one final CAST-to-DOUBLE division, thresholds are
integer comparisons (never float averages), and top-k always carries a
unique tie-break.

Scale notes (100 TB): every query filters dimensions *before* the
fact join, broadcasts fixed-cardinality dims (nation/region), lets the
HAVING-style aggregates reduce the fact table before any join-back,
and expresses top-k as ORDER BY + LIMIT so Spark plans
TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import (
    DISC_I,
    PRICE_I,
    QTY_I,
    REV_I,
    _t,
    q,
)

ACCT_I = "CAST(ROUND(c_acctbal * 100) AS BIGINT)"  # customer balance cents
RETAIL_I = "CAST(ROUND(p_retailprice * 100) AS BIGINT)"  # part price cents


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated MIN subquery over a derived supply rel)
# ---------------------------------------------------------------------------


@q(
    "q2_min_supplier",
    oracle=f"""
    WITH eusupply AS (
      SELECT l_partkey, l_suppkey, {PRICE_I} AS price_i
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT DISTINCT p_partkey, p_name, s_name, n_name,
           CAST(e.price_i AS DOUBLE) / 100.0 AS min_price
    FROM part
    JOIN eusupply e ON p_partkey = e.l_partkey
    JOIN supplier   ON e.l_suppkey = s_suppkey
    JOIN nation     ON s_nationkey = n_nationkey
    WHERE p_type = 'LARGE' AND p_size <= 5
      AND e.price_i = (SELECT MIN(i.price_i) FROM eusupply i
                       WHERE i.l_partkey = p_partkey)
    """,
    doc="TPC-H Q2 shape: cheapest EUROPE supplier per qualifying part, "
    "via a correlated MIN scalar subquery over the supply relation "
    "(derived from lineitem sales — no partsupp in fixtures; reference "
    "has no engine for decorrelation, SURVEY §4.2). Spark side "
    "decorrelates by hand: min-per-part aggregate joined back on "
    "equality. The part filter prunes before the join; nation/region "
    "broadcast.",
    tags=("relational", "subquery", "tpch"),
)
def q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    eusupply = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", F.expr(PRICE_I).alias("price_i"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 5))
        .select("p_partkey", "p_name")
    )
    # decorrelated: min price per part among EUROPE suppliers, join back
    min_price = eusupply.groupBy("l_partkey").agg(F.min("price_i").alias("_min_i"))
    return (
        eusupply.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(min_price, ["l_partkey"])
        .filter(F.col("price_i") == F.col("_min_i"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            (F.col("price_i").cast("double") / 100.0).alias("min_price"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure filter + agg, the pushdown showcase)
# ---------------------------------------------------------------------------


@q(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({PRICE_I} * {DISC_I}) AS DOUBLE) / 10000.0 AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND {DISC_I} BETWEEN 5 AND 7 AND {QTY_I} < 2400
    """,
    doc="TPC-H Q6 shape: single-table filter + ungrouped SUM. All three "
    "predicates (date range, discount band, quantity cap) are "
    "scan-level; the aggregate is one map-side partial + 1-row final. "
    "Discount/quantity bounds compare scaled ints, never raw doubles.",
    tags=("relational", "agg", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.expr(f"{DISC_I} BETWEEN 5 AND 7")
            & (F.expr(QTY_I) < 2400)
        )
        .agg(
            F.expr(f"CAST(SUM({PRICE_I} * {DISC_I}) AS DOUBLE) / 10000.0").alias(
                "revenue_delta"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual nation join + year rollup)
# ---------------------------------------------------------------------------


@q(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
    """,
    doc="TPC-H Q7 shape: trade volume between a nation pair, by year. "
    "The nation dim joins twice (supplier side and customer side); both "
    "copies are pre-filtered to the two names and broadcast, so the "
    "disjunctive pair predicate only sees rows that already matched one "
    "of the two nations on each side.",
    tags=("relational", "join", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("cust_nation"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.expr(REV_I).alias("_rev_i"),
            F.year("l_shipdate").alias("l_year"),
        )
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.expr("CAST(SUM(_rev_i) AS DOUBLE) / 10000.0").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share (share-of-total conditional aggregation)
# ---------------------------------------------------------------------------


@q(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_i ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev_i) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {REV_I} AS rev_i, n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
    ) allsales
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of a region's market for a "
    "part type, by year. Numerator and denominator accumulate in the "
    "same exact-int column set; the share is a single double division "
    "of identical integers on both engines. 7-table join with the two "
    "selective dims (part type, region) filtered before the fact join.",
    tags=("relational", "join", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nat = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("_cnkey"))
    )
    supp_nat = nation.select(
        F.col("n_nationkey").alias("_snkey"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", F.expr(REV_I).alias("rev_i")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("_cnkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("_snkey"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("rev_i")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("rev_i").cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (profit = revenue - qty*retail cost proxy)
# ---------------------------------------------------------------------------


@q(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM({REV_I} - {QTY_I} * {RETAIL_I}) AS DOUBLE) / 10000.0 AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and year for parts "
    "matching a name pattern. Cost proxy is qty*p_retailprice (fixtures "
    "have no partsupp.ps_supplycost); both terms are scaled int64 at "
    "the same 1e4 scale so the subtraction stays exact. The LIKE "
    "filter prunes part before the fact join; nation broadcasts.",
    tags=("relational", "join", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", F.expr(RETAIL_I).alias("_retail_i"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        F.expr(REV_I).alias("_rev_i"),
        F.expr(QTY_I).alias("_qty_i"),
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", "o_year")
        .agg(
            F.expr("CAST(SUM(_rev_i - _qty_i * _retail_i) AS DOUBLE) / 10000.0").alias(
                "profit"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (HAVING vs scalar aggregate over the same scope)
# ---------------------------------------------------------------------------


@q(
    "q11_important_parts",
    oracle=f"""
    WITH eu AS (
      SELECT l_partkey, {REV_I} AS rev_i
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT l_partkey, CAST(SUM(rev_i) AS DOUBLE) / 10000.0 AS part_value
    FROM eu
    GROUP BY l_partkey
    HAVING SUM(rev_i) * (SELECT COUNT(DISTINCT l_partkey) FROM eu)
         > 2 * (SELECT SUM(rev_i) FROM eu)
    """,
    doc="TPC-H Q11 shape: parts whose EUROPE sales value exceeds 2x the "
    "average per-part value. The classic fraction threshold scales with "
    "SF, so the cutoff here is relative (value * nparts > 2 * total) — "
    "scale-invariant and integer-exact. Spark computes the 1-row "
    "(total, nparts) aggregate once and broadcast-crosses it into the "
    "HAVING filter.",
    tags=("relational", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    eu = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", F.expr(REV_I).alias("rev_i"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "rev_i")
    )
    per_part = eu.groupBy("l_partkey").agg(F.sum("rev_i").alias("_val_i"))
    totals = eu.agg(
        F.sum("rev_i").alias("_total_i"),
        F.countDistinct("l_partkey").alias("_nparts"),
    )
    return (
        per_part.join(F.broadcast(totals))
        .filter(F.col("_val_i") * F.col("_nparts") > 2 * F.col("_total_i"))
        .select(
            "l_partkey", (F.col("_val_i").cast("double") / 10000.0).alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# Q12 — priority by line status (conditional counts over a fact join)
# ---------------------------------------------------------------------------


@q(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: high/low-priority line counts per line status "
    "(fixtures have no l_shipmode; l_linestatus plays the group key). "
    "Both conditional counts come out of one pass — a single shuffle on "
    "a 2-value key after the orderkey join.",
    tags=("relational", "agg", "tpch"),
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left join with ON-predicate)
# ---------------------------------------------------------------------------


@q(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of per-customer order counts, "
    "with the filter inside the LEFT JOIN's ON clause (a filter in "
    "WHERE would silently drop zero-order customers — the classic Q13 "
    "trap). Two cascaded aggregations; the second groups on a "
    "low-cardinality count value.",
    tags=("relational", "join", "tpch"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    return (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate view + scalar MAX subquery over it)
# ---------------------------------------------------------------------------


@q(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({REV_I}) AS total_rev_i
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev_i AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_i = (SELECT MAX(total_rev_i) FROM revenue)
    """,
    doc="TPC-H Q15 shape: the supplier(s) with maximum quarterly "
    "revenue — an aggregate CTE consumed twice (join input and scalar "
    "MAX). Spark computes the revenue aggregate once; the 1-row MAX "
    "broadcasts into the filter, so ties are kept exactly (no top-1 "
    "LIMIT that would drop tied suppliers).",
    tags=("relational", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    revenue = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.expr(REV_I)).alias("total_rev_i"))
    )
    mx = revenue.agg(F.max("total_rev_i").alias("_max_i"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_rev_i") == F.col("_max_i"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_i").cast("double") / 10000.0).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------


@q(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier counts per part attribute "
    "combo, excluding suppliers from a NOT IN subquery (negative "
    "balance stands in for the complaints pattern; supply relation is "
    "lineitem). Spark plans the NOT IN as a null-aware anti join "
    "against a tiny broadcast list; COUNT DISTINCT expands to a "
    "two-phase distinct aggregate.",
    tags=("relational", "subquery", "tpch"),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive bracket predicates (OR-of-ANDs across a join)
# ---------------------------------------------------------------------------


@q(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND {QTY_I} BETWEEN 100 AND 1100)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND {QTY_I} BETWEEN 1000 AND 2000)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND {QTY_I} BETWEEN 2000 AND 3000)
    """,
    doc="TPC-H Q19 shape: three OR'd brackets, each constraining both "
    "sides of the join (part brand/size x lineitem quantity band). "
    "Catalyst derives the common join key and pushes the per-side "
    "disjunction components (brand IN (...) onto part, quantity range "
    "union onto lineitem) before evaluating the full residual. "
    "Quantity bounds compare scaled ints.",
    tags=("relational", "join", "tpch"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.expr(QTY_I).alias("_qty_i"), F.expr(REV_I).alias("_rev_i")
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("_qty_i").between(100, 1100)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("_qty_i").between(1000, 2000)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("_qty_i").between(2000, 3000)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(F.expr("CAST(SUM(_rev_i) AS DOUBLE) / 10000.0").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — excess suppliers (double-nested IN with aggregate HAVING)
# ---------------------------------------------------------------------------


@q(
    "q20_excess_suppliers",
    oracle=f"""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM({QTY_I}) > 5000
    )
    """,
    doc="TPC-H Q20 shape: suppliers who moved > 50 units of any "
    "'small%' part in a year — IN over a grouped-HAVING subquery that "
    "itself contains an IN over a name-pattern part scan. Spark: part "
    "filter broadcasts into a semi join on lineitem, the (suppkey, "
    "partkey) aggregate shrinks the fact side, then a distinct "
    "semi join picks suppliers.",
    tags=("relational", "subquery", "tpch"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = (
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    qualifying = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .join(
            F.broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.expr(QTY_I)).alias("_q"))
        .filter(F.col("_q") > 5000)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        _t(spark, sf_dir, "supplier")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q21 — sole-blame supplier (EXISTS + NOT EXISTS on the same fact table)
# ---------------------------------------------------------------------------


@q(
    "q21_sole_blame",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for returned "
    "items in multi-supplier finalized orders (returnflag stands in "
    "for the receipt-late predicate; fixtures lack commit/receipt "
    "dates). EXISTS and NOT-EXISTS both correlate on the same fact "
    "table — Spark implements them as orderkey-aggregated flags "
    "(any-other-supplier, any-other-R-supplier) joined once, turning "
    "two correlated scans into one grouped pass.",
    tags=("relational", "subquery", "tpch"),
)
def q21_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    # per-order supplier stats replace both correlated EXISTS scans:
    # >1 distinct supplier <=> EXISTS(other supplier);
    # exactly this supplier in R-set <=> NOT EXISTS(other R supplier)
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_nsupp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_nsupp_r"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # one output row per qualifying R *lineitem* row (classic Q21 counts
    # l1 rows, not distinct (order, supplier) pairs)
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(order_stats, "l_orderkey")
        .filter((F.col("_nsupp") > 1) & (F.col("_nsupp_r") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar AVG subquery + anti join)
# ---------------------------------------------------------------------------


@q(
    "q22_dormant_customers",
    oracle=f"""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM({ACCT_I}) AS DOUBLE) / 100.0 AS totacctbal
    FROM customer c
    WHERE c_acctbal > 0
      AND {ACCT_I} * (SELECT COUNT(*) FROM customer i WHERE i.c_acctbal > 0)
          > (SELECT SUM(CAST(ROUND(i.c_acctbal * 100) AS BIGINT))
             FROM customer i WHERE i.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: customers with above-average balance and no "
    "urgent orders, grouped by country (nationkey stands in for the "
    "phone prefix; every fixture customer has orders, so the anti "
    "condition is 'no URGENT orders'). The average comparison is "
    "rearranged to integer form (bal*count > sum) — no float AVG. "
    "Spark: 1-row aggregate broadcast + anti join on the filtered "
    "orders projection.",
    tags=("relational", "subquery", "tpch"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_nationkey", F.expr(ACCT_I).alias("_bal_i"))
    )
    avg_row = cust.agg(F.count("*").alias("_cnt"), F.sum("_bal_i").alias("_sum_i"))
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_row))
        .filter(F.col("_bal_i") * F.col("_cnt") > F.col("_sum_i"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("_bal_i").cast("double") / 100.0).alias("totacctbal"),
        )
    )
