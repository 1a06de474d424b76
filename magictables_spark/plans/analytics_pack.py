"""Event-sequence + array-kernel analytics: funnel conversion, exact
heavy hitters, higher-order array functions.

These extend the events/embeddings fixtures beyond the reference's
surface (SURVEY §2.C "capability gaps"): ordered-sequence funnel
analysis is the canonical product-analytics query a Polars user would
hand-loop, and higher-order array functions are the JVM-side
(whole-stage-codegen) alternative to per-row Python UDFs over vector
columns.

Scale notes: the funnel computes all three stages under ONE hash
partitioning on user_id (chained Window specs over the same partition
key → a single Exchange, two Window nodes, then a 1-row global
aggregate). Heavy hitters is a partial-aggregated groupBy +
TakeOrderedAndProject — no global sort. The array kernels are pure
map-side expressions (zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from magictables_spark.plans.registry import _t, q
from magictables_spark.plans.catalog import spread_by
from magictables_spark.plans.similarity import QUANT_DUCK, QUANT_SPARK

# ---------------------------------------------------------------------------
# funnel: view -> click -> purchase, strictly ordered per user
# ---------------------------------------------------------------------------


@q(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
    doc="Ordered funnel: users who viewed, then clicked strictly after "
    "the first view, then purchased strictly after that first click. "
    "The oracle decomposes into three correlated stage CTEs; the Spark "
    "plan instead chains three window aggregates over ONE user_id "
    "partitioning (first-view ts -> first-click-after ts -> "
    "first-purchase-after ts), so the whole funnel costs a single "
    "shuffle regardless of stage count. Fixture timestamps are unique "
    "per user at microsecond grain (verified), so nanos-vs-micros "
    "truncation cannot flip the strict inequalities.",
    tags=("events", "funnel", "analytics"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "_tv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "_tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("_tv")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "_tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("_tc")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    # groupBy(user_id) reuses the Window's hash partitioning (no new
    # Exchange — EnsureRequirements sees the child already partitioned),
    # so the only remaining movement is the 1-row final aggregate.
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("_tv").isNotNull().cast("int")).alias("_v"),
        F.max(F.col("_tc").isNotNull().cast("int")).alias("_c"),
        F.max(F.col("_tp").isNotNull().cast("int")).alias("_p"),
    )
    return per_user.agg(
        F.sum("_v").alias("n_view"),
        F.sum("_c").alias("n_view_click"),
        F.sum("_p").alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# exact heavy hitters (top-k hot keys) — the skew-detection primitive
# ---------------------------------------------------------------------------


@q(
    "heavy_hitters_exact",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    ORDER BY COUNT(*) DESC, user_id, event_type
    LIMIT 25
    """,
    doc="Exact top-25 hottest (user, event_type) keys. This is the "
    "skew-detection primitive behind salted joins (operators/scale.py): "
    "at 100 TB you run exactly this to find the keys worth salting. "
    "Partial map-side counts + TakeOrderedAndProject — no global sort, "
    "driver receives only k rows. Tie-break on the full key keeps "
    "LIMIT deterministic.",
    tags=("events", "analytics", "skew"),
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"), F.asc("event_type"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# higher-order array functions over embedding vectors (zero-shuffle kernels)
# ---------------------------------------------------------------------------


@q(
    "array_hof",
    oracle=f"""
    SELECT vec_id,
           CAST(list_sum({QUANT_DUCK}) AS BIGINT) AS vec_sum,
           CAST(len(list_filter({QUANT_DUCK}, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(list_sum(list_transform({QUANT_DUCK}, x -> x * x)) AS BIGINT)
             AS self_dot
    FROM embeddings
    WHERE vec_id % 7 = 0
    """,
    doc="Higher-order array functions on the embedding column — "
    "transform / filter / aggregate / zip_with staying entirely inside "
    "whole-stage codegen (the JVM-side alternative to a per-row Python "
    "UDF; ~100x at scale). Vectors are int64-quantized first "
    "(registry.py rule 5) so sum/filter/dot are integer-exact on both "
    "engines. Pure map-side: the plan has no Exchange at all.",
    tags=("functions", "array", "embeddings"),
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 7 == 0)
        .withColumn("_q", F.expr(QUANT_SPARK))
        .select(
            "vec_id",
            F.expr("aggregate(_q, 0L, (a, x) -> a + x)").alias("vec_sum"),
            F.expr("CAST(size(filter(_q, x -> x > 0)) AS BIGINT)").alias("n_pos"),
            F.expr("aggregate(zip_with(_q, _q, (a, b) -> a * b), 0L, (a, x) -> a + x)").alias(
                "self_dot"
            ),
        )
    )


# ---------------------------------------------------------------------------
# retention cohorts: signup week -> weekly activity matrix
# ---------------------------------------------------------------------------


@q(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
    )
    SELECT strftime(date_trunc('week', t0), '%Y-%m-%d') AS cohort_week,
           CAST(floor(date_diff('day', t0, e.ts) / 7) AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users bucketed by first-seen week, "
    "counted distinct in each subsequent week offset. First-seen ts "
    "comes from a window MIN over the user_id partitioning instead of "
    "an aggregate-then-self-join (one shuffle replaces three); the "
    "final distinct-count groups on the small (cohort, offset) key. "
    "Week offsets are integer day arithmetic — no float date math.",
    tags=("events", "analytics", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.withColumn("t0", F.min("ts").over(Window.partitionBy("user_id")))
        .select(
            F.date_format(F.date_trunc("week", "t0"), "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("ts"), F.col("t0")) / 7).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@q(
    "kcore_peel_rounds",
    oracle="""
    WITH th AS (
      -- co-occurrence threshold scales with the fixture: the small
      -- corpus is dense (same 200 parts recur), the big ones sparse;
      -- both engines derive it from the same row count
      SELECT CASE WHEN COUNT(*) < 30000 THEN 3 ELSE 2 END AS t FROM lineitem
    ), li AS (SELECT l_orderkey, l_partkey % 2000 AS p FROM lineitem),
    edges0 AS MATERIALIZED (
      SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= (SELECT t FROM th)
    ), deg0 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges0
        UNION ALL SELECT v AS node FROM edges0
      ) GROUP BY node
    ), alive0 AS MATERIALIZED (
      SELECT node FROM deg0 WHERE d >= 3
    ), edges1 AS MATERIALIZED (
      SELECT e.u, e.v FROM edges0 e
      JOIN alive0 a ON e.u = a.node
      JOIN alive0 b ON e.v = b.node
    ), deg1 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges1
        UNION ALL SELECT v AS node FROM edges1
      ) GROUP BY node
    ), alive1 AS MATERIALIZED (
      SELECT node FROM deg1 WHERE d >= 3
    ), edges2 AS MATERIALIZED (
      SELECT e.u, e.v FROM edges1 e
      JOIN alive1 a ON e.u = a.node
      JOIN alive1 b ON e.v = b.node
    ), deg2 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges2
        UNION ALL SELECT v AS node FROM edges2
      ) GROUP BY node
    ), alive2 AS MATERIALIZED (
      SELECT node FROM deg2 WHERE d >= 3
    ), edges3 AS MATERIALIZED (
      SELECT e.u, e.v FROM edges2 e
      JOIN alive2 a ON e.u = a.node
      JOIN alive2 b ON e.v = b.node
    ), deg3 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges3
        UNION ALL SELECT v AS node FROM edges3
      ) GROUP BY node
    ), alive3 AS MATERIALIZED (
      SELECT node FROM deg3 WHERE d >= 3
    ), edges4 AS MATERIALIZED (
      SELECT e.u, e.v FROM edges3 e
      JOIN alive3 a ON e.u = a.node
      JOIN alive3 b ON e.v = b.node
    )
    SELECT node, d AS degree FROM (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges4
        UNION ALL SELECT v AS node FROM edges4
      ) GROUP BY node
    ) WHERE d >= 3
    ORDER BY node
    """,
    doc="k-core decomposition by iterative peeling over the part "
    "co-purchase graph (the cohesion-subgraph primitive next to "
    f"triangle_count): 4 UNROLLED peel rounds, each computing the "
    "degree of the surviving subgraph and dropping nodes below k="
    f"3 together with their incident edges — the declared "
    "fixed-round semantics of the iterative family "
    "(pagerank_fixed_iters precedent), which is what makes the whole "
    "loop expressible as an unrolled CTE chain and value-hash-checked "
    "cross-engine (at this fixture the peel reaches its fixpoint "
    "within the unrolled rounds — asserted in tests/test_kcore.py — "
    "so the output IS the exact 3-core). Plan shape per round: one "
    "degree aggregate + two node-keyed semi-joins, all riding the "
    "same node-hash exchange; rounds are data-independent of corpus "
    "size (peeling depth, not n), so at 100 TB this is R bounded "
    "passes over an edge list that only shrinks — the standard "
    "distributed k-core schedule. localCheckpoint per round stops "
    "Catalyst from re-inlining the whole unrolled lineage (the "
    "simhash_neardup 44s->9s lesson).",
    tags=("graph", "analytics", "scale"),
)
def kcore_peel_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, R = 3, 4
    # parquet-footer count: the co-occurrence threshold scales with the
    # fixture density (see oracle comment), derived identically there
    n_li = _t(spark, sf_dir, "lineitem").count()
    th = 3 if n_li < 30000 else 2
    # cores-proportional hash repartition on the self-join key: both
    # sides then share ONE ReusedExchange and the pair-explosion stage
    # keeps full parallelism instead of running on the scan's split
    # count (the quality_pack._edges fix, applied to the same shape)
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 2000).alias("p"))
        .transform(spread_by("l_orderkey"))
    )
    a = li.select("l_orderkey", F.col("p").alias("u"))
    b = li.select("l_orderkey", F.col("p").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= th)
        .select("u", "v")
        # domain-bounded (<= C(2000,2) int pairs), re-read every peel
        # round: narrow to 4 merged partitions (quality_pack und lesson)
        .coalesce(4)
        .localCheckpoint(eager=True)
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )

    for _ in range(R):
        # NOT broadcast (tried, reverted): hinting the alive set costs a
        # driver collect + broadcast-build job per peel round and
        # measured 4.9 -> 5.9 s at sf1; the SMJ it would replace joins
        # two node-domain-bounded frames (edges <= C(2000,2)), which is
        # not a scale hazard
        alive = degrees(edges).filter(F.col("d") >= K).select("node")
        edges = (
            edges.join(alive.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .coalesce(4)
            .localCheckpoint(eager=True)  # peeled lineage stays flat
        )
    return (
        degrees(edges)
        .filter(F.col("d") >= K)
        .select("node", F.col("d").alias("degree"))
        .orderBy("node")
    )


@q(
    "triangle_count",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey % 400 AS p FROM lineitem),
    edges AS (
      SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*) FROM edges e1
            JOIN edges e2 ON e1.v = e2.u
            JOIN edges e3 ON e2.v = e3.v AND e1.u = e3.u) AS n_triangles
    """,
    doc="Distributed triangle counting over the part co-purchase graph "
    "(parts co-occurring in >= 2 orders). Edges are canonically "
    "ordered (u < v), so each triangle is counted exactly once by the "
    "u<v<w three-way join — the standard shuffle-join formulation "
    "(node-iterator); at real scale you'd pre-partition edges by u "
    "and prune by degree ordering, same plan shape. Complements "
    "dedup_clusters (connectivity) with cohesion analytics.",
    tags=("graph", "analytics"),
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cores-proportional hash repartition on the self-join key (the
    # quality_pack._edges fix): both sides share ONE ReusedExchange and
    # the pair explosion keeps full parallelism
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 400).alias("p"))
        .transform(spread_by("l_orderkey"))
    )
    a = li.select("l_orderkey", F.col("p").alias("u"))
    b = li.select("l_orderkey", F.col("p").alias("v"))
    # materialize once: edges feed 4 consumers (3 triangle sides + the
    # edge count) and are domain-bounded (<= C(400,2) int pairs), so the
    # checkpoint is tiny and stops Catalyst re-planning the corpus-sized
    # pair build per consumer
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("u", "v")
        # domain-bounded, feeds several joins: narrow to 4 merged
        # partitions (quality_pack und lesson)
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    # the checkpointed frame has no stats, so the three-way join planned
    # as SMJ with per-side exchanges; the sides are domain-bounded, so
    # broadcast them (e2/e3 canonicalize identically -> one build)
    tri = e1.join(F.broadcast(e2), "y").join(F.broadcast(e3), ["x", "z"])
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        F.broadcast(n_edges)
    ).select("n_edges", "n_triangles")


@q(
    "pareto_frontier_2d",
    oracle="""
    WITH p AS (
      SELECT p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             p_size
      FROM part
    )
    SELECT a.p_partkey, a.price_cents, a.p_size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
        AND (b.price_cents < a.price_cents OR b.p_size < a.p_size)
    )
    ORDER BY a.p_partkey
    """,
    doc="2-D Pareto frontier (skyline): parts no other part weakly "
    "dominates on (price, size) with a strict improvement in at least "
    "one — the multi-objective shortlist query. The ORACLE states the "
    "semantics as the textbook NOT EXISTS all-pairs (quadratic); the "
    "Spark plan is the SORTED-WINDOW reformulation that makes skyline "
    "linear-after-sort: dominated-by-strictly-cheaper iff the running "
    "MIN(size) over RANGE (-inf, price-1] is <= your size, and "
    "dominated-within-a-price-tie iff a same-price row has strictly "
    "smaller size — two window passes riding ONE price-ordered "
    "exchange replace the n^2 pair join (equal duplicate points "
    "survive together under the strict-in-one rule, which both forms "
    "honor). The global RANGE window is a total-order op by the "
    "problem's definition (the skyline is a global property); at "
    "100 TB you pre-prune with a coarse grid (only cells on the "
    "grid's own staircase can hold frontier points) and run this "
    "window over the ~sqrt-sized residual — the plan shape is "
    "unchanged. Value-hash-checked: window form ≡ quadratic "
    "definition on every fixture.",
    tags=("analytics", "scale"),
)
def pareto_frontier_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias("price_cents"),
        "p_size",
    )
    w_lt = (
        Window.orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_tie = Window.partitionBy("price_cents")
    return (
        p.withColumn("min_size_cheaper", F.min("p_size").over(w_lt))
        .withColumn("min_size_tie", F.min("p_size").over(w_tie))
        .filter(
            (
                F.col("min_size_cheaper").isNull()
                | (F.col("min_size_cheaper") > F.col("p_size"))
            )
            & (F.col("p_size") == F.col("min_size_tie"))
        )
        .select("p_partkey", "price_cents", "p_size")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# customer-value and market-basket analytics
# ---------------------------------------------------------------------------

_RFM_SEG = (
    "CASE WHEN r_score = 4 AND f_score >= 3 THEN 'champion' "
    "WHEN r_score = 4 AND f_score = 1 THEN 'new' "
    "WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk' "
    "WHEN r_score = 1 AND f_score = 1 THEN 'lost' "
    "ELSE 'core' END"
)


@q(
    "rfm_segmentation",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), cuts AS (
      SELECT
        PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY recency_days) AS r1,
        PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY recency_days) AS r2,
        PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY recency_days) AS r3,
        PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY frequency) AS f1,
        PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY frequency) AS f2,
        PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY frequency) AS f3,
        PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY monetary_cents) AS m1,
        PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY monetary_cents) AS m2,
        PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY monetary_cents) AS m3
      FROM cust
    ), scored AS (
      SELECT o_custkey, recency_days, frequency, monetary_cents,
             4 - (CAST(recency_days > r1 AS INT)
                  + CAST(recency_days > r2 AS INT)
                  + CAST(recency_days > r3 AS INT)) AS r_score,
             1 + (CAST(frequency > f1 AS INT)
                  + CAST(frequency > f2 AS INT)
                  + CAST(frequency > f3 AS INT)) AS f_score,
             1 + (CAST(monetary_cents > m1 AS INT)
                  + CAST(monetary_cents > m2 AS INT)
                  + CAST(monetary_cents > m3 AS INT)) AS m_score
      FROM cust, cuts
    )
    SELECT o_custkey AS c_custkey, recency_days, frequency, monetary_cents,
           CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           {_RFM_SEG} AS segment
    FROM scored
    ORDER BY c_custkey
    """,
    doc="RFM (recency / frequency / monetary) customer segmentation — "
    "the canonical CRM scoring query. Each metric is quartile-scored "
    "1..4 by VALUE BREAKPOINTS (exact interpolated percentiles at "
    "0.25/0.5/0.75 — binary fractions, the only quantile positions "
    "where cross-engine double interpolation is bit-exact, per the "
    "quantiles_cont note) rather than NTILE: value-bucketing keeps "
    "ties in one bucket (the statistically honest choice), avoids a "
    "global single-partition rank window entirely, and makes scoring "
    "a MAP-SIDE comparison against a broadcast 1-row cut table. Plan: "
    "one custkey-partitioned aggregate over orders, a 1-row exact "
    "percentile aggregate (partial-merged, same shape at any scale), "
    "broadcast cross join, pure projection scoring — no window, no "
    "second shuffle. r_score inverts (small recency = recently active "
    "= 4). The segment CASE runs the identical text in both engines.",
    tags=("analytics", "stats"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    anchor = orders.agg(F.max("od").alias("anchor"))
    cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("anchor"), F.max("od")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
    )
    cuts = cust.agg(
        F.expr("percentile(recency_days, array(0.25D, 0.5D, 0.75D))").alias("rc"),
        F.expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").alias("fc"),
        F.expr("percentile(monetary_cents, array(0.25D, 0.5D, 0.75D))").alias("mc"),
    )
    scored = cust.crossJoin(F.broadcast(cuts)).select(
        F.col("o_custkey").alias("c_custkey"),
        "recency_days",
        "frequency",
        "monetary_cents",
        F.expr(
            "CAST(4 - (CAST(recency_days > rc[0] AS INT)"
            " + CAST(recency_days > rc[1] AS INT)"
            " + CAST(recency_days > rc[2] AS INT)) AS INT)"
        ).alias("r_score"),
        F.expr(
            "CAST(1 + (CAST(frequency > fc[0] AS INT)"
            " + CAST(frequency > fc[1] AS INT)"
            " + CAST(frequency > fc[2] AS INT)) AS INT)"
        ).alias("f_score"),
        F.expr(
            "CAST(1 + (CAST(monetary_cents > mc[0] AS INT)"
            " + CAST(monetary_cents > mc[1] AS INT)"
            " + CAST(monetary_cents > mc[2] AS INT)) AS INT)"
        ).alias("m_score"),
    )
    return scored.withColumn("segment", F.expr(_RFM_SEG)).orderBy("c_custkey")


@q(
    "basket_pair_lift",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
    ), brand AS (
      SELECT p_brand, COUNT(*) AS n_brand FROM li GROUP BY p_brand
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS n_co
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT brand_a, brand_b, n_co, ba.n_brand AS n_a, bb.n_brand AS n_b,
           CAST(n_co * n_orders AS DOUBLE) / (ba.n_brand * bb.n_brand)
             AS lift,
           CAST(n_co AS DOUBLE) / ba.n_brand AS confidence_ab
    FROM pairs
    JOIN brand ba ON brand_a = ba.p_brand
    JOIN brand bb ON brand_b = bb.p_brand
    CROSS JOIN n
    ORDER BY lift DESC, brand_a, brand_b
    """,
    doc="Market-basket association mining: brand-pair co-occurrence "
    "with support, lift and confidence — the classic 'frequently "
    "bought together' query. Baskets collapse to DISTINCT (order, "
    "brand) FIRST (part dim broadcast into the collapse), so the "
    "pair self-join on l_orderkey is bounded by sum(k_i^2) with k = "
    "per-order distinct brands (~small constant), never |lineitem|^2 "
    "— the same basket-bounded-quadratic argument as "
    "audience_overlap_matrix. Lift computes as an exact integer "
    "product ratio: n_co * N and n_a * n_b are exact int64s, ONE "
    "double division at the end — bit-identical cross-engine, no "
    "float accumulation. The 1-row order count broadcasts; the "
    "support floor (co >= 3) prunes before the count-dim joins. At "
    "100 TB the orderkey shuffle is the only data-sized exchange; "
    "brand marginals broadcast.",
    tags=("analytics", "joins"),
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # one hash exchange on l_orderkey serves the whole query: it spreads
    # the scan-side broadcast join off the fixture's single split, the
    # distinct needs no exchange of its own (HashPartitioning(l_orderkey)
    # already clusters (l_orderkey, p_brand)), and the basket pair
    # self-join below is keyed on l_orderkey so both sides reuse it
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .transform(spread_by("l_orderkey"))
        .distinct()
    )
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    brand = li.groupBy("p_brand").agg(F.count("*").alias("n_brand"))
    a = li.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = li.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= 3)
    )
    ba = brand.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    bb = brand.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_co",
            "n_a",
            "n_b",
            F.expr("CAST(n_co * n_orders AS DOUBLE) / (n_a * n_b)").alias("lift"),
            F.expr("CAST(n_co AS DOUBLE) / n_a").alias("confidence_ab"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
    )


@q(
    "local_clustering_coeff",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey % 400 AS p FROM lineitem),
    edges AS (
      SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ), tri AS (
      SELECT node, COUNT(*) AS triangles FROM (
        SELECT e1.u AS node FROM edges e1
          JOIN edges e2 ON e1.v = e2.u
          JOIN edges e3 ON e2.v = e3.v AND e1.u = e3.u
        UNION ALL
        SELECT e1.v FROM edges e1
          JOIN edges e2 ON e1.v = e2.u
          JOIN edges e3 ON e2.v = e3.v AND e1.u = e3.u
        UNION ALL
        SELECT e2.v FROM edges e1
          JOIN edges e2 ON e1.v = e2.u
          JOIN edges e3 ON e2.v = e3.v AND e1.u = e3.u
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(t.triangles, 0) AS triangles,
           CAST(2 * COALESCE(t.triangles, 0) AS DOUBLE)
             / (d.degree * (d.degree - 1)) AS clustering_coeff
    FROM deg d LEFT JOIN tri t ON d.node = t.node
    WHERE d.degree >= 2
    ORDER BY d.node
    """,
    doc="Per-node LOCAL clustering coefficient over the same part "
    "co-purchase graph as triangle_count (canonical u<v edges, "
    "co-occurrence >= 2): coeff(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) "
    "— the node-level cohesion metric (triangle_count gives only the "
    "global census; LPA gives membership; this gives how CLIQUEY "
    "each node's neighborhood is, the standard feature for spam/bot "
    "detection in engagement graphs). Each u<v<w triangle from the "
    "standard three-way shuffle join credits all THREE corners via "
    "a union — one extra map pass over the triangle stream, no new "
    "join. Degrees and triangle credits aggregate per node and a "
    "left join + COALESCE(0) keeps triangle-free nodes (coeff 0) in "
    "the output; the coefficient is one double division of exact "
    "int64 counts. Scale: identical join graph to triangle_count "
    "(edges pre-reduced by the co-occurrence floor, degree-bounded); "
    "at 100 TB you'd orient edges by degree before the join (the "
    "standard skew guard) — shape unchanged.",
    tags=("graph", "analytics"),
)
def local_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cores-proportional hash repartition on the self-join key (the
    # quality_pack._edges fix): both sides share ONE ReusedExchange and
    # the pair explosion keeps full parallelism
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 400).alias("p"))
        .transform(spread_by("l_orderkey"))
    )
    a = li.select("l_orderkey", F.col("p").alias("u"))
    b = li.select("l_orderkey", F.col("p").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("u", "v")
        .coalesce(4)
        .localCheckpoint(eager=True)  # edges feed 4 downstream joins
    )
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    # broadcast the domain-bounded sides (no stats on the checkpointed
    # frame -> SMJ otherwise), and credit all three corners with ONE
    # explode instead of a 3-branch union: a physical plan is a tree, so
    # the union re-planned the whole triangle join three times
    tri_xyz = e1.join(F.broadcast(e2), "y").join(F.broadcast(e3), ["x", "z"])
    tri = (
        tri_xyz.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.join(tri, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.expr(
                "CAST(2 * COALESCE(triangles, 0) AS DOUBLE)"
                " / (degree * (degree - 1))"
            ).alias("clustering_coeff"),
        )
        .orderBy("node")
    )
