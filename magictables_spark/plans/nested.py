"""Nested-data pack (SURVEY.md §2 phase 2): explode / unnest / struct ops.

Reference surface: chain packs API results into a list column, explodes
it, renames struct fields with an ``api_`` prefix, then unnests
(magictable.py:276-298); `json_flatten` normalizes arbitrary JSON
(utils.py:36-80).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import _t, q


@q(
    "explode",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           unnest(generate_series(1, l_linenumber)) AS n
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    doc="Array explode — one output row per element (magictable.py:281 "
    "explode of api_results). Built from sequence() so both engines see "
    "identical arrays. Explode multiplies rows before any shuffle; at "
    "scale always filter/project first.",
    tags=("nested", "explode"),
)
def explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.explode(F.sequence(F.lit(1), F.col("l_linenumber"))).alias("n"),
        )
    )


@q(
    "explode_outer",
    oracle="""
    SELECT o_orderkey,
           unnest(CASE WHEN o_orderstatus = 'O'
                       THEN [NULL]
                       ELSE generate_series(1, 2) END) AS n
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    doc="Outer explode: empty/null arrays keep the parent row with a "
    "null element — the Polars explode semantic the reference relies on "
    "(SURVEY §7.3: Spark plain explode drops them; explode_outer "
    "matches). DuckDB oracle emulates with a [NULL] substitute.",
    tags=("nested", "explode"),
)
def explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    arr = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.lit(2))
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", F.explode_outer(arr).alias("n"))
    )


@q(
    "unnest_prefixed",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus   AS api_status,
           o_totalprice    AS api_total,
           o_orderpriority AS api_priority
    FROM orders
    """,
    doc="Struct unnest with field-prefix renaming — the chain result "
    "projection (magictable.py:291-298: struct.rename_fields api_* then "
    "unnest). Spark: pack a struct, then select struct.* with aliased, "
    "sorted field names (deterministic, unlike the reference's set "
    "union).",
    tags=("nested", "struct"),
)
def unnest_prefixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("api"),
    )
    # unnest with api_ prefix, field names sorted for determinism
    fields = sorted(f.name for f in packed.schema["api"].dataType.fields)
    return packed.select(
        "o_orderkey", *[F.col(f"api.{name}").alias(f"api_{name}") for name in fields]
    ).select("o_orderkey", "api_status", "api_total", "api_priority")


@q(
    "json_flatten",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS "props.k"
    FROM events
    WHERE event_id % 10 = 0
    """,
    doc="The reference's json_flatten (utils.py:36-80) applied to the "
    "events.props JSON payload: parse -> recursive struct flatten with "
    "dotted names. Implementation: operators/flatten.py (schema walk on "
    "the driver, declarative select/explode_outer plan — zero Python at "
    "runtime).",
    tags=("nested", "json"),
)
def json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magictables_spark.operators.flatten import flatten

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 == 0)
        .select("event_id", F.from_json("props", "struct<k:bigint>").alias("props"))
    )
    return flatten(ev)


@q(
    "agg_list_string",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS status_csv,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT o_orderstatus) AS INT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Grouped list / string aggregation (Polars agg-list, SQL "
    "LISTAGG). Spark's collect_set is unordered, so the set is "
    "canonicalized with sort_array; the ordered list surfaces as a "
    "pipe-joined string plus its cardinality rather than a raw array "
    "column, because the driver's pandas sort_values canonicalization "
    "cannot hash list cells (r08 verdict) — the joined form is "
    "position-exact so the check is just as strong.",
    tags=("relational", "agg", "nested"),
)
def agg_list_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    statuses = F.sort_array(F.collect_set("o_orderstatus"))
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(statuses, "|").alias("statuses"),
            F.array_join(statuses, ",").alias("status_csv"),
            F.count("*").alias("n"),
            F.size(statuses).alias("n_statuses"),
        )
    )


@q(
    "map_fns",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_finished,
           COUNT(DISTINCT o_orderstatus) AS map_size
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Map-type surface: per-priority status->count map built with "
    "map_from_entries(collect_list(struct)), probed with element_at. "
    "The oracle computes the same lookups as conditional counts — the "
    "map itself never crosses engines (map layouts aren't comparable), "
    "its observable lookups are.",
    tags=("nested", "map"),
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_status = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )
    mapped = (
        per_status.groupBy("o_orderpriority")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))
            ).alias("m")
        )
    )
    return mapped.select(
        "o_orderpriority",
        F.coalesce(F.element_at("m", "O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.element_at("m", "F"), F.lit(0)).alias("n_finished"),
        F.size("m").cast("bigint").alias("map_size"),
    )


@q(
    "concat_diagonal",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, CAST(NULL AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS VARCHAR) AS status,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 100 = 50
    """,
    doc="Diagonal concat (Polars concat(how='diagonal'), DuckDB UNION "
    "BY NAME): frames with different column sets stack by NAME with "
    "null padding — Spark's unionByName(allowMissingColumns=True). "
    "Pure narrow op: no shuffle, both inputs stream through.",
    tags=("relational", "union"),
)
def concat_diagonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", F.col("o_orderstatus").alias("status")
    )
    b = orders.filter(F.col("o_orderkey") % 100 == 50).select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@q(
    "variant_json_ops",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           COUNT(json_extract_string(props, '$.k')) AS k_present
    FROM events
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT ingestion of the events.props JSON payload: "
    "parse_json once into the binary semi-structured type, then "
    "variant_get path access — no per-query string re-parsing and no "
    "rigid struct schema, the right shape for heterogeneous JSON at "
    "scale (VARIANT columns store shredded binary; path access skips "
    "text parsing entirely). Oracle reads the same paths via DuckDB's "
    "JSON functions.",
    tags=("nested", "json", "spark4"),
)
def variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.expr("CAST(variant_get(v, '$.k') AS BIGINT)")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("k_sum"),
        F.count(k).alias("k_present"),
    )
