"""Advanced join + grouping pack: as-of join, range join, grouping sets,
approx/statistics (SURVEY §2.B join gaps + §2.C free-in-Spark ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import (
    DISC_I,
    PRICE_I,
    QTY_I,
    TAX_I,
    TOTALPRICE_I,
    _t,
    q,
)


@q(
    "asof_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts, event_id AS signup_event FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'signup'
      ) WHERE rn = 1
    )
    SELECT p.user_id, p.event_id,
           s.signup_event AS signup_event_right,
           date_diff('second', s.ts, p.ts) AS secs_since_signup
    FROM purchases p
    ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join: each purchase gets the user's most recent "
    "at-or-before signup (operators/asof.py — union + one window "
    "shuffle, never a range cross join; DuckDB has native ASOF JOIN as "
    "the oracle). Right side deduped per (user, ts) keeping max "
    "event_id so ties are deterministic in both engines.",
    tags=("join", "asof", "events"),
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from magictables_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("signup_event"))
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", F.col("event_id").alias("signup_event"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    joined = asof_join(purchases, signups, on="ts", by="user_id", direction="backward")
    return joined.select(
        "user_id",
        "event_id",
        "signup_event_right",
        (
            F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("ts_right"))
        ).alias("secs_since_signup"),
    )


@q(
    "range_join",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 200000.0), ('high', 200000.0, 1e18)
    )
    SELECT band, COUNT(*) AS n_orders,
           CAST(SUM({TOTALPRICE_I}) AS DOUBLE) / 100.0 AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    doc="Range (theta) join against a tiny in-line band table. Catalyst "
    "plans BroadcastNestedLoop — correct call when one side is a "
    "handful of rows; never run non-equi joins between two fact tables "
    "(use bucketing or a band-key equi-join instead).",
    tags=("join", "range"),
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("high", 200000.0, 1e18)],
        "band string, lo double, hi double",
    )
    orders = _t(spark, sf_dir, "orders").select("o_totalprice", F.expr(TOTALPRICE_I).alias("_tp"))
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr("CAST(SUM(_tp) AS DOUBLE) / 100.0").alias("total"),
        )
    )


@q(
    "grouping_sets",
    oracle=f"""
    SELECT c_mktsegment, o_orderpriority,
           CAST(SUM({TOTALPRICE_I}) AS DOUBLE) / 100.0 AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (segment-only, priority-only, grand "
    "total) — SQL surface the reference has no access to (SURVEY §2.C); "
    "Spark expands sets map-side like cube/rollup.",
    tags=("agg", "cube", "sql"),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        f"""
        SELECT c_mktsegment, o_orderpriority,
               CAST(SUM({TOTALPRICE_I}) AS DOUBLE) / 100.0 AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        """
    )


@q(
    "ndv_exact",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey)  AS ndv_part,
           COUNT(DISTINCT l_suppkey)  AS ndv_supp,
           COUNT(DISTINCT l_orderkey) AS ndv_order
    FROM lineitem
    """,
    doc="Exact distinct counts (baseline for approx_ndv). Spark expands "
    "multi-distinct into an expand + two-phase aggregate.",
    tags=("agg", "stats"),
)
def ndv_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("ndv_part"),
        F.countDistinct("l_suppkey").alias("ndv_supp"),
        F.countDistinct("l_orderkey").alias("ndv_order"),
    )


@q(
    "approx_ndv",
    oracle=None,
    doc="HyperLogLog++ distinct-count estimates (Polars approx_n_unique "
    "parity). Rows-only: HLL sketches are engine-specific; the estimate "
    "is asserted within 5% of ndv_exact in tests/test_stats_asof.py. At "
    "100 TB this is the ONLY affordable NDV — exact multi-distinct "
    "shuffles every value. rsd is a measured choice: 0.01 cost 4.36 s "
    "at sf0.1 (register count grows 1/rsd^2; the per-row sketch "
    "update dominated the scan) vs 0.83 s at 0.02 with observed error "
    "still <= 1%% on all three keys — precision beyond the quality "
    "gate was pure waste.",
    tags=("agg", "stats", "approx"),
)
def approx_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ndv_part"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("ndv_supp"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ndv_order"),
    )


@q(
    "sample",
    oracle=None,
    doc="Bernoulli sample (Polars df.sample parity), fixed seed for "
    "reproducibility within Spark; rows-only (sampling sequences are "
    "engine-specific). Sample fraction bounds asserted in "
    "tests/test_stats.py.",
    tags=("relational", "sample"),
)
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber"
    )


@q(
    "summary_stats",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           MIN({TOTALPRICE_I}) AS min_price_i,
           MAX({TOTALPRICE_I}) AS max_price_i,
           CAST(SUM({TOTALPRICE_I}) AS DOUBLE) / 100.0 / COUNT(*) AS mean_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
    doc="describe()-style summary in exact integer space (df.describe "
    "emits engine-formatted strings and float stddev — not "
    "hash-comparable; this is the deterministic equivalent).",
    tags=("agg", "stats"),
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tp = F.expr(TOTALPRICE_I)
    return _t(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_rows"),
        F.min(tp).alias("min_price_i"),
        F.max(tp).alias("max_price_i"),
        F.expr(f"CAST(SUM({TOTALPRICE_I}) AS DOUBLE) / 100.0 / COUNT(*)").alias("mean_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@q(
    "corr_exact",
    oracle=f"""
    WITH s AS (
      SELECT COUNT(*) AS n,
             SUM({QTY_I}) AS sx,
             SUM({PRICE_I}) AS sy,
             SUM(CAST({QTY_I} * {QTY_I} AS DECIMAL(38, 0))) AS sxx,
             SUM(CAST({PRICE_I} * {PRICE_I} AS DECIMAL(38, 0))) AS syy,
             SUM(CAST({QTY_I} * {PRICE_I} AS DECIMAL(38, 0))) AS sxy
      FROM lineitem
    )
    SELECT (CAST(n AS DOUBLE) * (CAST(CAST(sxy AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(sxy AS HUGEINT) % 4294967296 AS DOUBLE)) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * (CAST(CAST(sxx AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(sxx AS HUGEINT) % 4294967296 AS DOUBLE)) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * (CAST(CAST(syy AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296.0 + CAST(CAST(syy AS HUGEINT) % 4294967296 AS DOUBLE)) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_price,
        n AS n_rows
    FROM s
    """,
    doc="Pearson correlation of quantity vs price from exact moment "
    "sums (n*Sxy - Sx*Sy over the sqrt product) — engine-native "
    "corr() aggregates in floating point with engine-specific update "
    "order and is NOT hash-comparable; this formulation is. The "
    "second moments accumulate in DECIMAL(38): the per-row products "
    "fit int64 but their SUM passes 2^63 already at sf0.1 (~6e19 — "
    "found by the full-registry sf0.1 sweep; DuckDB hides the bug by "
    "silently promoting to HUGEINT, Spark raises ARITHMETIC_OVERFLOW), "
    "and DECIMAL(38) carries the 100 TB case (~1e23) with room to "
    "spare — same fix summary_stats/feat_zscore already use. Single "
    "scan, partial+final agg of 6 sums.",
    tags=("agg", "stats"),
)
def corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi, pi = F.expr(QTY_I), F.expr(PRICE_I)
    dec = "DECIMAL(38, 0)"
    s = _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n"),
        F.sum(qi).alias("sx"),
        F.sum(pi).alias("sy"),
        F.sum((qi * qi).cast(dec)).alias("sxx"),
        F.sum((pi * pi).cast(dec)).alias("syy"),
        F.sum((qi * pi).cast(dec)).alias("sxy"),
    )
    # moment sums are exact; the combination happens in double with the
    # identical op sequence in the oracle. The DECIMAL sums cross into
    # double via the deterministic 2^32 hi/lo split (_dec_dbl_spark) —
    # DuckDB's direct decimal cast is off by 1 ulp past 2^53, found
    # when corr_matrix landed (corr_exact had the same latent drift at
    # sf0.1, outside the sf0.01 gate)
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.expr(_dec_dbl_spark("sxx")),
        F.expr(_dec_dbl_spark("syy")),
        F.expr(_dec_dbl_spark("sxy")),
    )
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return s.select((num / den).alias("corr_qty_price"), F.col("n").alias("n_rows"))


@q(
    "asof_join_forward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, event_id AS next_purchase FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT c.user_id, c.event_id,
           p.next_purchase AS next_purchase_right,
           date_diff('second', c.ts, p.ts) AS secs_to_purchase
    FROM clicks c
    ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    doc="FORWARD as-of join: each click gets the user's next purchase "
    "at-or-after it (time-to-conversion) — the mirror of asof_join's "
    "backward direction, exercising operators/asof.py's "
    "direction='forward' path (first-non-null over the following "
    "window; left rows sort before right at equal timestamps so exact "
    "matches are included). Same ONE-shuffle union+window plan; "
    "DuckDB's native ASOF with <= is the oracle. Right side deduped "
    "per (user, ts) keeping MIN event_id (forward ties are broken by "
    "the earliest id in both engines).",
    tags=("join", "asof", "events"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W

    from magictables_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    w = _W.partitionBy("user_id", "ts").orderBy(F.asc("next_purchase"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("next_purchase"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    joined = asof_join(clicks, purchases, on="ts", by="user_id", direction="forward")
    return joined.select(
        "user_id",
        "event_id",
        "next_purchase_right",
        (
            F.unix_timestamp(F.col("ts_right").cast("timestamp"))
            - F.unix_timestamp(F.col("ts").cast("timestamp"))
        ).alias("secs_to_purchase"),
    )


@q(
    "asof_join_nearest",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, event_id AS purch FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ), b AS (
      SELECT c.user_id, c.event_id, c.ts, p.ts AS bts, p.purch AS bev
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    ), f AS (
      SELECT c.user_id, c.event_id, p.ts AS fts, p.purch AS fev
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ), merged AS (
      SELECT b.user_id, b.event_id,
             CASE WHEN fts IS NULL OR (bts IS NOT NULL
                        AND date_diff('microsecond', bts, b.ts)
                            <= date_diff('microsecond', b.ts, fts))
                  THEN bev ELSE fev END AS purchase_right,
             CASE WHEN fts IS NULL OR (bts IS NOT NULL
                        AND date_diff('microsecond', bts, b.ts)
                            <= date_diff('microsecond', b.ts, fts))
                  THEN date_diff('microsecond', bts, b.ts)
                  ELSE date_diff('microsecond', b.ts, fts) END AS dist_us
      FROM b JOIN f ON b.event_id = f.event_id
    )
    SELECT user_id, event_id,
           CASE WHEN dist_us <= 7200000000 THEN purchase_right END AS purchase_right,
           CASE WHEN dist_us <= 7200000000 THEN dist_us END AS dist_us
    FROM merged
    """,
    doc="NEAREST as-of join with tolerance — the last delegated-surface "
    "delta vs Polars join_asof(strategy='nearest', tolerance=...): each "
    "click matches the user's CLOSEST purchase in either direction, "
    "nulled when farther than the 7200 s tolerance. Equal distances go "
    "backward (deterministic; mirrored in the oracle's <=). The plan "
    "fills both directions over ONE hash exchange (two in-partition "
    "sorts, no second shuffle); distances compare in exact integer "
    "microseconds so float rounding can never flip the side choice vs "
    "the oracle's date_diff. Right side deduped per (user, ts) keeping "
    "max event_id.",
    tags=("join", "asof", "events"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W

    from magictables_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    w = _W.partitionBy("user_id", "ts").orderBy(F.desc("purch"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("purch"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id", direction="nearest", tolerance=7200.0
    )
    dist = F.abs(
        F.unix_micros(F.col("ts_right").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("purch_right").alias("purchase_right"),
        dist.cast("bigint").alias("dist_us"),
    )


# DECIMAL(38) -> double, deterministically: DuckDB's direct decimal/
# hugeint -> double cast is NOT correctly rounded past 2^53 (measured:
# 22240711483861231690 converts to ...b7fe vs the correct ...b7ff that
# Spark/Java produce), so a straight CAST drifts by 1 ulp at sf0.1+.
# Both engines instead run the IDENTICAL two-step: exact integer split
# at 2^32 (hi fits 2^53 exactly, lo < 2^32 exactly), then
# hi * 2^32 + lo in double — two correctly-rounded IEEE ops in the
# same order, bit-identical by construction at ANY magnitude. DuckDB
# needs the HUGEINT cast first because `//` on DECIMAL performs float
# division (measured: returns 5178319170.107...).
_B32 = 4294967296


def _dec_dbl_spark(c: str) -> str:
    return (
        f"(CAST({c} div {_B32} AS DOUBLE) * {_B32}.0"
        f" + CAST({c} % {_B32} AS DOUBLE))"
    )


def _dec_dbl_duck(c: str) -> str:
    return (
        f"(CAST(CAST({c} AS HUGEINT) // {_B32} AS DOUBLE) * {_B32}.0"
        f" + CAST(CAST({c} AS HUGEINT) % {_B32} AS DOUBLE))"
    )


_CORR_COLS = (("qty", QTY_I), ("price", PRICE_I), ("disc", DISC_I), ("tax", TAX_I))


def _corr_matrix_oracle() -> str:
    sums = ["COUNT(*) AS n"]
    for name, frag in _CORR_COLS:
        sums.append(f"SUM({frag}) AS s_{name}")
        sums.append(f"SUM(CAST({frag} * {frag} AS DECIMAL(38, 0))) AS s_{name}_{name}")
    import itertools

    names = [n for n, _ in _CORR_COLS]
    frags = dict(_CORR_COLS)
    pairs = list(itertools.combinations(names, 2))
    for a, b in pairs:
        sums.append(
            f"SUM(CAST({frags[a]} * {frags[b]} AS DECIMAL(38, 0))) AS s_{a}_{b}"
        )
    selects = []
    for a, b in pairs:
        num = (
            f"CAST(n AS DOUBLE) * {_dec_dbl_duck(f's_{a}_{b}')}"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE)"
        )
        den = (
            f"sqrt(CAST(n AS DOUBLE) * {_dec_dbl_duck(f's_{a}_{a}')}"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * {_dec_dbl_duck(f's_{b}_{b}')}"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, ({num}) / ({den}) AS corr FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY col_a, col_b"
    )


@q(
    "corr_matrix",
    oracle=_corr_matrix_oracle(),
    doc="Full pairwise Pearson correlation matrix over the four "
    "lineitem measures (qty, price, discount, tax) from exact moment "
    "sums: ONE scan accumulates all 15 sums (4 firsts, 4 squares, 6 "
    "cross-products, count) in a single partial+final aggregate, then "
    "the 6 pair rows explode out of the 1-row frame -- no per-pair "
    "rescan, no melt-self-join (which would shuffle n x k rows to "
    "recompute what one agg already holds). Second moments accumulate "
    "in DECIMAL(38) (int64 overflows at sf0.1 already -- see "
    "corr_exact); the double combination is the identical "
    "cast-then-multiply sequence in both engines, so the matrix is "
    "bit-identical cross-engine. The feature-correlation audit every "
    "training pipeline runs before feature selection.",
    tags=("agg", "stats", "scale"),
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import itertools

    dec = "DECIMAL(38, 0)"
    frags = {n: F.expr(f) for n, f in _CORR_COLS}
    names = [n for n, _ in _CORR_COLS]
    aggs = [F.count("*").alias("n")]
    for n in names:
        aggs.append(F.sum(frags[n]).alias(f"s_{n}"))
        aggs.append(F.sum((frags[n] * frags[n]).cast(dec)).alias(f"s_{n}_{n}"))
    pairs = list(itertools.combinations(names, 2))
    for a, b in pairs:
        aggs.append(F.sum((frags[a] * frags[b]).cast(dec)).alias(f"s_{a}_{b}"))
    s = _t(spark, sf_dir, "lineitem").agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        saa = F.expr(_dec_dbl_spark(f"s_{a}_{a}"))
        sbb = F.expr(_dec_dbl_spark(f"s_{b}_{b}"))
        sab = F.expr(_dec_dbl_spark(f"s_{a}_{b}"))
        num = n * sab - sa * sb
        den = F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        return num / den

    structs = [
        F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), corr(a, b).alias("corr")
        )
        for a, b in pairs
    ]
    return (
        s.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.col_a", "r.col_b", "r.corr")
        .orderBy("col_a", "col_b")
    )
