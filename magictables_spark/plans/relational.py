"""Relational parity pack (SURVEY.md §2.B) — core DataFrame operators.

Filters, projections, equi/semi/anti/outer/cross joins, grouped
aggregation, distinct/dedup, sort/top-k, and set operations. Reference
surface: the delegated Polars API (magictable.py:451-459) exercised via
README/example; rebuilt as idiomatic Spark DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import (
    CHARGE_I,
    DISC_I,
    PRICE_I,
    QTY_I,
    REV_I,
    _t,
    q,
)

# ===========================================================================
# flagship — TPC-H Q3-style: filter -> join -> join -> agg -> top-k
# ===========================================================================


@q(
    "flagship_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Shipping-priority style query: selective dim filter -> fact joins -> "
    "grouped revenue -> top-k. Catalyst plan: pushed filters on both scans, "
    "broadcast of the filtered customer side under AQE, partial+final hash agg, "
    "TakeOrderedAndProject (no global sort materialization).",
    tags=("relational", "flagship"),
)
def flagship_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01'"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.expr("TIMESTAMP '1997-01-01'"))
        .select("l_orderkey", F.expr(REV_I).alias("_rev_i"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr("CAST(SUM(_rev_i) AS DOUBLE) / 10000.0").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ===========================================================================
# relational parity pack (SURVEY §2.B)
# ===========================================================================


@q(
    "groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({QTY_I}) AS DOUBLE) / 100.0        AS sum_qty,
           CAST(SUM({PRICE_I}) AS DOUBLE) / 100.0      AS sum_base_price,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0      AS sum_disc_price,
           CAST(SUM({CHARGE_I}) AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST(SUM({QTY_I}) AS DOUBLE) / 100.0 / COUNT(*)   AS avg_qty,
           CAST(SUM({PRICE_I}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM({DISC_I}) AS DOUBLE) / 100.0 / COUNT(*)  AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary. Partial (map-side) + final hash "
    "aggregation is automatic; 6 aggregates share one shuffle on a "
    "low-cardinality key — at 100 TB this is scan-bound, the ideal shape. "
    "Money math uses scaled int64 (see fragment note above) so the agg "
    "buffer is compact longs, not boxed BigDecimals.",
    tags=("relational", "agg"),
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    pre = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '2002-09-02'"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr(QTY_I).alias("_qi"),
            F.expr(PRICE_I).alias("_pi"),
            F.expr(DISC_I).alias("_di"),
            F.expr(REV_I).alias("_ri"),
            F.expr(CHARGE_I).alias("_ci"),
        )
    )
    return pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("CAST(SUM(_qi) AS DOUBLE) / 100.0").alias("sum_qty"),
        F.expr("CAST(SUM(_pi) AS DOUBLE) / 100.0").alias("sum_base_price"),
        F.expr("CAST(SUM(_ri) AS DOUBLE) / 10000.0").alias("sum_disc_price"),
        F.expr("CAST(SUM(_ci) AS DOUBLE) / 1000000.0").alias("sum_charge"),
        F.expr("CAST(SUM(_qi) AS DOUBLE) / 100.0 / COUNT(*)").alias("avg_qty"),
        F.expr("CAST(SUM(_pi) AS DOUBLE) / 100.0 / COUNT(*)").alias("avg_price"),
        F.expr("CAST(SUM(_di) AS DOUBLE) / 100.0 / COUNT(*)").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
    doc="Conjunctive equality filter (reference: tablegraph.py:109-118 "
    "query_or_fetch conditions). Predicates reach the parquet scan as "
    "PushedFilters -> row-group skipping.",
    tags=("relational", "filter"),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@q(
    "filter_expr",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000.0 AND 50000.0
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus <> 'F'
    """,
    doc="Compound predicate: range + IN-list + inequality (Polars filter-expr "
    "surface, SURVEY §2.B). All three push to the scan.",
    tags=("relational", "filter"),
)
def filter_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_totalprice").between(1000.0, 50000.0)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "F")
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@q(
    "project",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber AS line_no,
           CAST({REV_I} AS DOUBLE) / 10000.0 AS net_price,
           upper(l_returnflag) AS flag
    FROM lineitem
    """,
    doc="Projection with computed + renamed columns (select/with_columns/"
    "rename surface). ReadSchema prunes to the 4 source columns.",
    tags=("relational", "project"),
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_no"),
        F.expr(f"CAST({REV_I} AS DOUBLE) / 10000.0").alias("net_price"),
        F.upper("l_returnflag").alias("flag"),
    )


@q(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, n_name
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    """,
    doc="Equi inner join chain fact->dim->dim. nation (25 rows) is broadcast "
    "explicitly; customer joins shuffle-hash/sort-merge as AQE decides.",
    tags=("relational", "join"),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "o_totalprice", "c_name", "n_name")
    )


@q(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    """,
    doc="Left outer equi join; unmatched customers survive with null order "
    "columns (Polars how='left' parity).",
    tags=("relational", "join"),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@q(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
    """,
    doc="Left-semi join (Polars how='semi'): customers having at least one "
    "big order. Semi joins shuffle only the key column of the probe side.",
    tags=("relational", "join"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0).select("o_custkey")
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")


@q(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Left-anti join (Polars how='anti'): customers with no orders at all.",
    tags=("relational", "join"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


@q(
    "join_outer",
    oracle="""
    WITH bysupp AS (
      SELECT l_suppkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, n_lines
    FROM supplier
    FULL OUTER JOIN bysupp ON s_suppkey = l_suppkey
    """,
    doc="Full outer equi join between a dim and an aggregate (Polars "
    "how='outer' parity); null-padded on both sides.",
    tags=("relational", "join"),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    bysupp = _t(spark, sf_dir, "lineitem").groupBy("l_suppkey").agg(F.count("*").alias("n_lines"))
    return supp.join(bysupp, supp.s_suppkey == bysupp.l_suppkey, "full_outer").select(
        "s_suppkey", "s_name", "n_lines"
    )


@q(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region
    CROSS JOIN nation
    """,
    doc="Cross join of two tiny dims (Polars how='cross'). Catalyst plans a "
    "broadcast nested-loop join; never do this on two fact tables.",
    tags=("relational", "join"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").select("r_name")
    nation = _t(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(F.broadcast(nation))


@q(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    doc="Top-k (README 'top 5 by vote_average' pattern). orderBy().limit() "
    "compiles to TakeOrderedAndProject — per-partition heaps, no global "
    "sort, no full shuffle. Unique o_orderkey tie-break keeps it "
    "deterministic.",
    tags=("relational", "sort"),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@q(
    "distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="Distinct on a projection (Polars unique()). Hash-aggregate with "
    "map-side partial dedup; output cardinality is tiny regardless of SF.",
    tags=("relational", "dedup"),
)
def distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "dedup_subset",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
    FROM (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    doc="Keyed dedup keeping a deterministic representative (first line per "
    "order). The reference's unique(subset) keeps an arbitrary row; we pin "
    "min-by-ordering semantics so results are reproducible across engines.",
    tags=("relational", "dedup"),
)
def dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@q(
    "union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name, 'supplier' AS kind FROM supplier
    """,
    doc="Bag union with aligned schemas (pl.concat parity). unionByName — "
    "no shuffle, pure partition concatenation.",
    tags=("relational", "setop"),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return cust.unionByName(supp)


@q(
    "intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="Set intersection (nations having both customers and suppliers).",
    tags=("relational", "setop"),
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@q(
    "except_",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="Set difference (nations with customers but no suppliers).",
    tags=("relational", "setop"),
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)  # subtract == EXCEPT DISTINCT (SQL set semantics)


@q(
    "agg_salted_twophase",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM({QTY_I}) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Two-phase salted aggregation over 3 heavy-hitter keys: phase 1 "
    "groups on (key, salt16) so one hot key spreads over 16 reducers, "
    "phase 2 merges the 48 partials. The oracle is the plain GROUP BY — "
    "salting must be observationally invisible. This is the manual "
    "fallback when AQE skew handling can't apply (it only splits "
    "sort-merge JOIN partitions, not aggregations); counts/sums stay "
    "exact ints so the rewrite is value-identical, not just row-stable. "
    "Salt = crc32(unique line id) % 16 — deterministic, no rand().",
    tags=("relational", "agg", "scale", "skew"),
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(QTY_I).alias("_qi"),
        (F.crc32(F.concat_ws("_", "l_orderkey", "l_linenumber")) % 16).alias("_salt"),
    )
    partial = li.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("_n"), F.sum("_qi").alias("_sq")
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("_n").alias("n"), F.sum("_sq").alias("_sq_total"))
        .select(
            "l_returnflag",
            "n",
            (F.col("_sq_total").cast("double") / 100.0).alias("sum_qty"),
        )
    )


@q(
    "join_shuffle_hash",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n_lines,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    doc="Physical join-strategy control: the SHUFFLE_HASH hint forces a "
    "shuffled hash join where Spark would default to sort-merge — the "
    "right call when one side is far smaller than the other but too "
    "big to broadcast (hash-building the small side skips BOTH sort "
    "passes). Same logical result as any equi-join slug; the test "
    "asserts ShuffledHashJoin actually appears in the physical plan.",
    tags=("relational", "join", "physical"),
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.expr(REV_I).alias("_rev_i")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey").hint(
        "SHUFFLE_HASH"
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.expr("CAST(SUM(_rev_i) AS DOUBLE) / 10000.0").alias("revenue"),
        )
    )


_AGG_FILTER_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE {QTY_I} > 2500) AS n_large,
       CAST(SUM({REV_I}) FILTER (WHERE {DISC_I} = 0) AS DOUBLE) / 10000.0
         AS rev_no_discount
FROM lineitem
GROUP BY l_returnflag
"""


@q(
    "agg_filter_clause",
    oracle=_AGG_FILTER_SQL,
    doc="SQL-standard FILTER (WHERE ...) aggregate modifier — several "
    "conditional aggregates from ONE pass without CASE scaffolding. "
    "The identical SQL text runs on both engines via spark.sql "
    "(SQL-entry parity, SURVEY §2.C); Catalyst compiles each FILTER "
    "into the same partial-aggregate pipeline a CASE WHEN would get.",
    tags=("relational", "agg", "sql"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_AGG_FILTER_SQL)


@q(
    "except_all",
    oracle="""
    SELECT l_orderkey % 97 AS k, l_linenumber FROM lineitem
    EXCEPT ALL
    SELECT l_orderkey % 97, l_linenumber FROM lineitem
    WHERE l_returnflag = 'R'
    """,
    doc="Multiset difference (EXCEPT ALL): duplicates subtract by "
    "count, unlike set EXCEPT which collapses them — the correct "
    "semantics for 'remove one occurrence per match' reconciliation. "
    "Spark plans a hash-partitioned count-difference expand, one "
    "shuffle on the row value.",
    tags=("relational", "setops"),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.select((F.col("l_orderkey") % 97).alias("k"), "l_linenumber")
    b = li.filter(F.col("l_returnflag") == "R").select(
        (F.col("l_orderkey") % 97).alias("k"), "l_linenumber"
    )
    return a.exceptAll(b)


@q(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN l_orderkey % 5 = 0 THEN NULL
                  ELSE l_orderkey % 50 END AS k,
             l_linenumber
      FROM lineitem WHERE l_orderkey % 10 < 2
    ), b AS (
      SELECT DISTINCT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                           ELSE o_orderkey % 50 END AS k
      FROM orders WHERE o_orderkey % 10 < 2
    )
    SELECT a.k, COUNT(*) AS n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
    doc="Null-safe equality join: NULL keys MATCH each other (Spark "
    "<=> / SQL IS NOT DISTINCT FROM), where plain equality silently "
    "drops every NULL-keyed row — the semantics dimension tables with "
    "unknown members need. Planned as a regular hash join on the "
    "null-safe key, not a nested loop.",
    tags=("relational", "join", "nulls"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 < 2)
        .select(
            F.when(F.col("l_orderkey") % 5 == 0, None)
            .otherwise(F.col("l_orderkey") % 50)
            .alias("k"),
            "l_linenumber",
        )
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 < 2)
        .select(
            F.when(F.col("o_orderkey") % 5 == 0, None)
            .otherwise(F.col("o_orderkey") % 50)
            .alias("kb")
        )
        .distinct()
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["kb"]))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )
