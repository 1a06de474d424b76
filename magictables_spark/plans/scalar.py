"""Scalar-function packs (SURVEY.md §2.B: string/date/math/list/json fns).

Reference surface: Polars expression namespaces (``pl.col().str.*``,
``.dt.*``, ``.list.*``, arithmetic) reachable by delegation and by
LLM-generated code (README.md:127-128 categorize-by-description,
"days since creation"). All built-in ``pyspark.sql.functions`` — pure
whole-stage-codegen JVM expressions, zero Python in the hot path.

Determinism: only engine-exact operations cross the oracle boundary
(integer math, sqrt/floor/ceil/abs/round, string ops); no transcendental
functions whose libm implementations may differ by ULPs between JVM
and C++.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import QTY_I, _t, q


@q(
    "str_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                              AS brand_u,
           lower(p_type)                               AS type_l,
           length(p_name)                              AS name_len,
           contains(p_name, 'green')                   AS has_green,
           split_part(p_type, ' ', 1)                  AS type_head,
           regexp_extract(p_brand, '([0-9]+)', 1)      AS brand_num,
           substring(p_name, 1, 8)                     AS name_prefix,
           concat(p_brand, ':', p_type)                AS brand_type,
           replace(p_type, ' ', '_')                   AS type_snake,
           trim(p_name)                                AS name_trim
    FROM part
    """,
    doc="String-function pack over part: case, length, contains, split, "
    "regex extract, substring, concat, replace, trim (pl.col().str.* "
    "parity). All JVM built-ins inside one codegen stage.",
    tags=("scalar", "string"),
)
def str_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").contains("green").alias("has_green"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
    )


@q(
    "date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(CAST(o_orderdate AS DATE))       AS INTEGER) AS order_year,
           CAST(month(CAST(o_orderdate AS DATE))      AS INTEGER) AS order_month,
           CAST(day(CAST(o_orderdate AS DATE))        AS INTEGER) AS order_day,
           CAST(dayofweek(CAST(o_orderdate AS DATE))  AS INTEGER) AS order_dow,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m')                   AS order_ym,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS due_date
    FROM orders
    """,
    doc="Date-function pack: year/month/day/dow extraction, day diff from "
    "an epoch, formatting, date arithmetic (pl.col().dt.* parity; "
    "'days since creation' README.md:127). DuckDB dayofweek = Sunday 0; "
    "Spark dayofweek = Sunday 1, so Spark subtracts 1.",
    tags=("scalar", "date"),
)
def date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate").cast("date")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        (F.dayofweek(d) - F.lit(1)).alias("order_dow"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format(d, "yyyy-MM").alias("order_ym"),
        F.date_add(d, 30).cast("string").alias("due_date"),
    )


@q(
    "math_fns",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           abs({QTY_I} - 2500)                       AS qty_dev,
           CAST(floor(l_quantity) AS BIGINT)         AS qty_floor,
           CAST(ceil(l_quantity)  AS BIGINT)         AS qty_ceil,
           round(l_discount * l_tax, 4)              AS disc_tax,
           sqrt(CAST({QTY_I} AS DOUBLE))             AS qty_sqrt,
           {QTY_I} % 7                               AS qty_mod,
           CAST(power(CAST({QTY_I} AS DOUBLE), 2) AS DOUBLE) AS qty_sq
    FROM lineitem
    """,
    doc="Math pack: abs/floor/ceil/round/sqrt/mod/power (expression "
    "arithmetic parity, README.md:127). Only IEEE-exact ops cross the "
    "oracle (sqrt is correctly-rounded per IEEE-754; power with integer "
    "exponent 2 is one rounded multiply) — no log/exp whose libm "
    "rounding differs between engines.",
    tags=("scalar", "math"),
)
def math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = F.expr(QTY_I)
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(qi - 2500).alias("qty_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.round(F.col("l_discount") * F.col("l_tax"), 4).alias("disc_tax"),
        F.sqrt(qi.cast("double")).alias("qty_sqrt"),
        (qi % 7).alias("qty_mod"),
        F.pow(qi.cast("double"), 2).alias("qty_sq"),
    )


@q(
    "json_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
    doc="JSON field extraction from the events.props payload string "
    "(reference json_flatten over API payloads, utils.py:36-80; SURVEY "
    "§2.B map/json fns). get_json_object pushes no scan work to Python.",
    tags=("scalar", "json"),
)
def json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@q(
    "array_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           len(generate_series(1, l_linenumber))                 AS seq_len,
           list_contains(generate_series(1, l_linenumber), 3)    AS has_three,
           generate_series(1, l_linenumber)[1]                   AS first_el,
           CAST(list_sum(generate_series(1, l_linenumber)) AS BIGINT) AS seq_sum,
           list_reverse(generate_series(1, l_linenumber))[1]     AS last_el
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="Array/list pack: size, contains, element_at, higher-order "
    "aggregate sum, reverse (pl.col().list.* parity). Arrays built with "
    "sequence() so both engines see identical int lists; F.aggregate is "
    "the Spark higher-order fold.",
    tags=("scalar", "array"),
)
def array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.size(seq).alias("seq_len"),
            F.array_contains(seq, 3).alias("has_three"),
            F.element_at(seq, 1).alias("first_el"),
            F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("seq_sum"),
            F.element_at(F.reverse(seq), 1).alias("last_el"),
        )
    )


@q(
    "cond_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_bucket,
           coalesce(nullif(o_orderpriority, '1-URGENT'), '<urgent>') AS priority_or_urgent,
           (o_orderstatus = 'F') AS is_finished
    FROM orders
    """,
    doc="Conditional expressions: CASE WHEN bucketing, coalesce/nullif "
    "null handling, boolean projection (generated-code categorize "
    "pattern README.md:127-128).",
    tags=("scalar", "conditional"),
)
def cond_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("<urgent>")).alias(
            "priority_or_urgent"
        ),
        (F.col("o_orderstatus") == "F").alias("is_finished"),
    )


@q(
    "null_handling",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O')                    AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), '<open>') AS status_filled,
           (nullif(o_orderstatus, 'O') IS NULL)          AS is_open,
           CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN o_totalprice END AS closed_price
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    doc="Null-handling pack: nullif/coalesce/isNull/conditional-null "
    "(Polars fill_null/drop_nulls surface — fixtures carry no nulls, so "
    "nullif manufactures them deterministically on both engines).",
    tags=("scalar", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    status_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            status_null.alias("status_or_null"),
            F.coalesce(status_null, F.lit("<open>")).alias("status_filled"),
            status_null.isNull().alias("is_open"),
            F.when(status_null.isNotNull(), F.col("o_totalprice")).alias("closed_price"),
        )
    )


@q(
    "date_arith_months",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_1m,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(CAST(date_trunc('month', o_orderdate) AS DATE)
                    + INTERVAL 1 MONTH - INTERVAL 1 DAY,
                    '%Y-%m-%d') AS month_end
    FROM orders
    WHERE o_orderkey % 40 = 0
    """,
    doc="Calendar month arithmetic: +1/+3 months and end-of-month "
    "derivation. Both engines clamp overflow to the last valid day "
    "(Jan 31 + 1 month = Feb 28/29) — this slug PROVES the clamping "
    "semantics agree rather than assuming it; month_end is the "
    "truncate-advance-subtract idiom that is correct in every "
    "calendar corner (leap years included).",
    tags=("scalar", "date"),
)
def date_arith_months(spark, sf_dir):
    d = F.to_date("o_orderdate")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select(
            "o_orderkey",
            F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_1m"),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
            F.date_format(
                F.date_sub(F.add_months(F.trunc(d, "month"), 1), 1), "yyyy-MM-dd"
            ).alias("month_end"),
        )
    )


@q(
    "try_cast_clean",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(TRY_CAST(string_split(text, ' ')[1] AS BIGINT)) AS n_numeric_lead,
           CAST(COALESCE(SUM(TRY_CAST(string_split(text, ' ')[1] AS BIGINT)), 0)
                AS BIGINT) AS numeric_sum
    FROM documents
    """,
    doc="Dirty-data coercion: TRY_CAST the first token of every "
    "document — NULL on failure instead of a task-killing exception "
    "(plain CAST aborts the whole 100 TB job on one malformed row). "
    "Identical null-on-failure semantics on both engines; COUNT(expr) "
    "skips the nulls, giving the parse-success rate for free.",
    tags=("scalar", "quality"),
)
def try_cast_clean(spark, sf_dir):
    lead = F.element_at(F.split(F.col("text"), " "), 1)
    parsed = F.try_cast(lead, "bigint") if hasattr(F, "try_cast") else F.expr(
        "TRY_CAST(split(text, ' ')[0] AS BIGINT)"
    )
    return _t(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_rows"),
        F.count(parsed).alias("n_numeric_lead"),
        F.coalesce(F.sum(parsed), F.lit(0)).cast("bigint").alias("numeric_sum"),
    )
