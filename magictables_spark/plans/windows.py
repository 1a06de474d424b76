"""Window-function + multidimensional-aggregation pack (SURVEY.md §2.B).

Reference surface: Polars ``pl.col().over()`` / generated-pandas
``groupby().transform``/``rank`` (README.md:127 engagement-rate calcs);
cube/rollup/pivot are the "free in Spark" extensions (SURVEY §2.B/2.C).

Scale notes: every window here partitions by a high-cardinality key
(custkey) so the shuffle is even; no global (unpartitioned) windows —
an ORDER BY without PARTITION BY serializes the whole table through
one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magictables_spark.plans.registry import QTY_I, TOTALPRICE_I, _t, q


@q(
    "window_rank",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST({TOTALPRICE_I} AS DOUBLE) / 100.0 AS totalprice,
           rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY {TOTALPRICE_I} DESC, o_orderkey) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
    doc="Top-3 orders per customer by price (pl.col().over() parity). "
    "row_number with a unique tie-break (orderkey) keeps the result "
    "deterministic; one shuffle on the partition key.",
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.expr(TOTALPRICE_I).desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.expr(f"CAST({TOTALPRICE_I} AS DOUBLE) / 100.0").alias("totalprice"),
            "rnk",
        )
    )


@q(
    "window_agg",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           CAST(SUM({TOTALPRICE_I}) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS running_spend
    FROM orders
    """,
    doc="Running per-customer spend (window aggregate; generated-pandas "
    "cumsum parity). Frame is ROWS-based with a unique total order "
    "(orderdate, orderkey) so partial sums are reproducible; summation "
    "in exact int64 cents.",
    tags=("window",),
)
def window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
        (F.sum(F.expr(TOTALPRICE_I)).over(w).cast("double") / 100.0).alias("running_spend"),
    )


@q(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    """,
    doc="lag/lead over a per-customer order timeline: days since the "
    "previous order and the next order's key. Integer day diffs are "
    "engine-exact; deterministic total order per partition.",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@q(
    "rollup",
    oracle=f"""
    SELECT n_name, o_orderpriority,
           CAST(SUM({TOTALPRICE_I}) AS DOUBLE) / 100.0 AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderpriority)
    """,
    doc="Hierarchical subtotals nation -> priority -> grand total "
    "(Spark-free capability the reference lacks, SURVEY §2.C). NULL "
    "group keys mark subtotal rows in both engines.",
    tags=("agg", "cube"),
)
def rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority", F.expr(TOTALPRICE_I).alias("_tp"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.expr("CAST(SUM(_tp) AS DOUBLE) / 100.0").alias("total_spend"),
            F.count("*").alias("n_orders"),
        )
    )


@q(
    "cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({QTY_I}) AS DOUBLE) / 100.0 AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="All 2^2 grouping-set combinations over the two status flags. "
    "Spark expands the cube map-side; output cardinality stays tiny at "
    "any SF.",
    tags=("agg", "cube"),
)
def cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", F.expr(QTY_I).alias("_qi"))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(SUM(_qi) AS DOUBLE) / 100.0").alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


@q(
    "pivot",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {QTY_I} END) AS DOUBLE) / 100.0 AS f_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {QTY_I} END) AS DOUBLE) / 100.0 AS o_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot linestatus into columns (Polars df.pivot parity). Values "
    "are enumerated explicitly — at scale an un-enumerated pivot first "
    "runs a distinct scan; always pass the value list.",
    tags=("agg", "pivot"),
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", F.expr(QTY_I).alias("_qi"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.expr("CAST(SUM(_qi) AS DOUBLE) / 100.0"))
    )
    return out.select(
        "l_returnflag",
        F.col("F").alias("f_qty"),
        F.col("O").alias("o_qty"),
    )


@q(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    doc="Pagination slice (Polars df.slice parity; Spark >= 3.4 offset). "
    "Deterministic via unique tie-break.",
    tags=("relational", "sort"),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )


@q(
    "window_ntile",
    oracle=f"""
    SELECT o_orderpriority, o_orderkey,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY {TOTALPRICE_I} DESC, o_orderkey) AS quartile
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="NTILE quartiles by order value per priority class (Polars qcut "
    "parity). The registered default PARTITIONS the window, so each "
    "priority's quartiling runs partition-parallel — the form to "
    "copy-paste at scale. The un-partitioned global form (one task "
    "sorts everything) is the `window_ntile_global` variant.",
    tags=("window",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.expr(TOTALPRICE_I).desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderpriority", "o_orderkey", F.ntile(4).over(w).alias("quartile"))
    )


@q(
    "window_ntile_global",
    oracle=f"""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY {TOTALPRICE_I} DESC, o_orderkey) AS quartile
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="Corpus-wide NTILE quartiles — the GLOBAL variant, demoted from "
    "the default: an un-partitioned window serializes through one task, "
    "acceptable only on the filtered subset here. At scale use the "
    "keyed `window_ntile` default, or approx quantile cut-points "
    "(`quantiles_cont`) joined back map-side.",
    tags=("window",),
)
def window_ntile_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy(F.expr(TOTALPRICE_I).desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", F.ntile(4).over(w).alias("quartile"))
    )


@q(
    "window_dense_pct",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           DENSE_RANK()   OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST()    OVER w AS cdist
    FROM orders
    WHERE o_custkey % 20 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY {TOTALPRICE_I} DESC, o_orderkey)
    """,
    doc="dense_rank / percent_rank / cume_dist per customer (remaining "
    "Polars rank-variant surface). The ratio outputs are (rank-1)/(n-1) "
    "and k/n from identical integers — engine-exact doubles.",
    tags=("window",),
)
def window_dense_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.expr(TOTALPRICE_I).desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 20 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
        )
    )


@q(
    "window_rolling",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({TOTALPRICE_I}) OVER w AS DOUBLE)
             / CAST(100 * COUNT(*) OVER w AS DOUBLE) AS rolling_avg_4
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling mean over the last 4 orders per customer (Polars "
    "rolling_mean surface): bounded ROWS frame with a unique total "
    "order. Numerator and denominator are exact ints in the same "
    "frame; the mean is one double division — engine-exact.",
    tags=("window", "timeseries"),
)
def window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    cents = F.expr(TOTALPRICE_I)
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            (
                F.sum(cents).over(w).cast("double")
                / (100 * F.count("*").over(w)).cast("double")
            ).alias("rolling_avg_4"),
        )
    )


@q(
    "window_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CUME_DIST() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_custkey) AS cd
    FROM customer
    WHERE c_custkey % 20 = 0
    """,
    doc="Cumulative distribution window: fraction of the partition at "
    "or below each row. Ordered by the unique key, so every rank — "
    "and therefore every cume_dist fraction k/n — is tie-free and "
    "identical across engines (the division is one exact int-ratio "
    "double).",
    tags=("window",),
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 20 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.cume_dist().over(w).alias("cd"),
        )
    )
