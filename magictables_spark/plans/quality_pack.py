"""Data-quality + graph-analytics pack (round-2 coverage widening).

Operators a production 100 TB pipeline runs between ingest and
training that were not yet first-class in the registry:

- ``bloom_join``      — bloom-filter pre-filtered join (the classic
                        big-side scan pruning trick);
- ``column_profile``  — per-column profiling (nulls/ndv/min/max), the
                        ANALYZE/data-quality primitive;
- ``iqr_outliers``    — robust outlier fencing per group;
- ``degree_distribution`` — graph degree histogram over the part
                        co-purchase graph;
- ``pagerank``        — iterative link analysis (no oracle: iterative;
                        invariant-gated in tests);
- ``decontaminate``   — remove (not just count) train docs leaking
                        held-out 8-gram shingles.

All oracles follow the registry determinism rules (int64 money math,
exact binary quantile fractions, ordered top-k with tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import PRICE_I, REV_I, _t, q
from magictables_spark.plans.catalog import spread, spread_by


@q(
    "bloom_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM({REV_I}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
    doc="Bloom-style pre-filtered join: the filtered orders side is "
    "compressed into a 2^18-bit membership bitmap (bucket = "
    "xxhash64 mod M; 64-bit words built with bit_or aggregation — "
    "~4k rows, kilobytes), BROADCAST, and the lineitem scan drops "
    "non-candidate rows map-side with a word lookup + bit test "
    "BEFORE the join shuffle — at 100 TB this is the difference "
    "between shuffling the whole fact table and shuffling only the "
    "~matching fraction. Hash-collision false positives are removed "
    "by the exact join that follows, so the result equals the plain "
    "join (exactly what the oracle computes). Same mechanism as "
    "Spark's internal runtime row-level bloom filtering "
    "(bloom_filter_agg/might_contain, not SQL-exposed in OSS), built "
    "from public primitives so the pruning is explicit and testable.",
    tags=("join", "scale"),
)
def bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    m_bits = 1 << 18
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1997-01-01")
        )
        .select("o_orderkey", "o_orderpriority")
    )
    words = (
        orders.select(F.expr(f"pmod(xxhash64(o_orderkey), {m_bits})").alias("bkt"))
        .select(
            (F.col("bkt") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(bkt % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.expr(REV_I).alias("rev_i"))
        .withColumn("bkt", F.expr(f"pmod(xxhash64(l_orderkey), {m_bits})"))
        .withColumn("w", (F.col("bkt") / 64).cast("int"))
        # broadcast word-table join + bit test: the inner join drops
        # rows whose word holds no small-side key at all, the bit test
        # drops the rest — all map-side, before the big join exchange
        .join(F.broadcast(words), "w")
        .filter(F.expr("(word & shiftleft(1L, CAST(bkt % 64 AS INT))) != 0"))
        .select("l_orderkey", "rev_i")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum("rev_i").cast("double") / 10000.0).alias("revenue"),
        )
    )


@q(
    "column_profile",
    oracle="""
    SELECT col, n_nulls, n_distinct, min_str, max_str FROM (
      SELECT 'event_type' AS col,
             CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             COUNT(DISTINCT event_type) AS n_distinct,
             CAST(MIN(event_type) AS VARCHAR) AS min_str,
             CAST(MAX(event_type) AS VARCHAR) AS max_str
      FROM events
      UNION ALL
      SELECT 'user_id',
             CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT user_id),
             CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
      FROM events
      UNION ALL
      SELECT 'value',
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT value),
             -- FLOOR first: double->int casts truncate in Spark but
             -- ROUND in DuckDB; floor is defined identically in both
             CAST(CAST(FLOOR(MIN(value)) AS BIGINT) AS VARCHAR),
             CAST(CAST(FLOOR(MAX(value)) AS BIGINT) AS VARCHAR)
      FROM events
    ) ORDER BY col
    """,
    doc="Per-column data-quality profile (null count, exact NDV, "
    "min/max) over events — the ANALYZE/profiling primitive every "
    "pipeline runs on ingest. ONE pass over the data computes all "
    "columns' aggregates simultaneously (a single groupBy().agg with "
    "2k agg buffers), then a driver-side unpivot of the 1-row result "
    "into (col, stats) rows — never one scan per column. Floats are "
    "surfaced as integer-cast strings to keep the cross-engine hash "
    "exact.",
    tags=("quality", "stats"),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    prof = ev.agg(
        F.sum(F.col("event_type").isNull().cast("long")).alias("nn_event_type"),
        F.countDistinct("event_type").alias("nd_event_type"),
        F.min("event_type").cast("string").alias("mn_event_type"),
        F.max("event_type").cast("string").alias("mx_event_type"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("nn_user_id"),
        F.countDistinct("user_id").alias("nd_user_id"),
        F.min("user_id").cast("string").alias("mn_user_id"),
        F.max("user_id").cast("string").alias("mx_user_id"),
        F.sum(F.col("value").isNull().cast("long")).alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
        F.floor(F.min("value")).cast("bigint").cast("string").alias("mn_value"),
        F.floor(F.max("value")).cast("bigint").cast("string").alias("mx_value"),
    )
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_str"),
            F.col(f"mx_{c}").alias("max_str"),
        )
        for c in ("event_type", "user_id", "value")
    ]
    return (
        prof.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.col", "p.n_nulls", "p.n_distinct", "p.min_str", "p.max_str")
        .orderBy("col")
    )


@q(
    "iqr_outliers",
    oracle=f"""
    WITH fences AS (
      SELECT l_returnflag,
             PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY {PRICE_I}) AS q1,
             PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY {PRICE_I}) AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {PRICE_I} < q1 - 1.5*(q3-q1)
                      OR {PRICE_I} > q3 + 1.5*(q3-q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(MIN(q1) AS DOUBLE) AS q1, CAST(MIN(q3) AS DOUBLE) AS q3
    FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
    GROUP BY l.l_returnflag
    """,
    doc="Robust outlier fencing per group: exact Q1/Q3 (0.25/0.75 are "
    "exact binary fractions -> bit-identical interpolation on int64 "
    "inputs, same guarantee as quantiles_cont) over scaled-int price, "
    "1.5*IQR Tukey fences, outlier count per return flag. Spark "
    "shape: the 3-row fence table broadcasts back onto the scan — two "
    "passes total, no per-row window sort. The data-quality screen "
    "that precedes winsorize_clip (which fixes what this one finds).",
    tags=("quality", "stats"),
)
def iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.expr(PRICE_I).alias("price_i")
    )
    # Exact Q1/Q3 by histogram refinement instead of Spark's `percentile`
    # aggregate. The builtin buffers a value->count map PER GROUP whose
    # size is the number of DISTINCT values — near-unique price cents
    # make the partial-agg buffers data-sized (every map task serializes
    # its whole column slice into the exchange; the 3 final tasks each
    # merge+sort a corpus-sized map single-threaded). The histogram path
    # shuffles only bounded aggregates: pass 1 counts rows per (flag,
    # price>>16) bucket — occupied-bucket count is bounded by the price
    # DOMAIN (cents range / 65536), not the corpus; pass 2 counts per
    # exact value inside only the <=4 buckets per flag that contain the
    # quartile order statistics (<=65536 distinct values per bucket).
    # The interpolation reproduces Percentile.getPercentile to the ulp:
    # position = p*(n-1); frac == 0 -> lower value; equal neighbors ->
    # lower value; else (higher-position)*lo + (position-lower)*hi.
    bucket = F.shiftright("price_i", 16).alias("b")
    hist = li.groupBy("l_returnflag", bucket).agg(F.count("*").alias("c"))
    wb = Window.partitionBy("l_returnflag").orderBy("b")
    hist = hist.withColumn("cum_hi", F.sum("c").over(wb)).withColumn(
        "cum_lo", F.col("cum_hi") - F.col("c")
    )
    ntab = hist.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    # the four (at most) global 0-based indices we need per flag:
    # floor/ceil of p*(n-1) for p in {0.25, 0.75}
    targets = (
        ntab.select(
            "l_returnflag",
            "n",
            F.explode(F.array(F.lit(0.25), F.lit(0.75))).alias("p"),
        )
        .withColumn("pos", F.col("p") * (F.col("n") - 1).cast("double"))
        .withColumn("lo_idx", F.floor("pos"))
        .withColumn("hi_idx", F.ceil("pos"))
    )
    need_idx = targets.select(
        "l_returnflag", F.explode(F.array("lo_idx", "hi_idx")).alias("k")
    ).distinct()
    # bucket holding each needed index (hist is domain-bounded — broadcast)
    kb = (
        need_idx.join(F.broadcast(hist), "l_returnflag")
        .filter((F.col("k") >= F.col("cum_lo")) & (F.col("k") < F.col("cum_hi")))
        .select("l_returnflag", "k", "b", "cum_lo")
    )
    needb = (
        kb.select("l_returnflag", "b", "cum_lo")
        .distinct()
        .select(
            F.col("l_returnflag").alias("nb_flag"),
            F.col("b").alias("nb_b"),
            "cum_lo",
        )
    )
    # pass 2: exact per-value counts inside the needed buckets only
    vals = (
        li.join(
            F.broadcast(needb),
            (F.col("l_returnflag") == F.col("nb_flag"))
            & (F.shiftright("price_i", 16) == F.col("nb_b")),
        )
        .select("l_returnflag", "price_i", F.col("nb_b").alias("b"), "cum_lo")
        .groupBy("l_returnflag", "b", "cum_lo", "price_i")
        .agg(F.count("*").alias("vc"))
    )
    wv = Window.partitionBy("l_returnflag", "b").orderBy("price_i")
    vals = vals.withColumn(
        "vcum_hi", F.col("cum_lo") + F.sum("vc").over(wv)
    ).withColumn("vcum_lo", F.col("vcum_hi") - F.col("vc"))
    # value at each needed global index
    kv = (
        kb.select("l_returnflag", "k")
        .join(F.broadcast(vals), "l_returnflag")
        .filter((F.col("k") >= F.col("vcum_lo")) & (F.col("k") < F.col("vcum_hi")))
        .select("l_returnflag", "k", F.col("price_i").alias("v"))
    )
    lo_v = kv.select(
        "l_returnflag", F.col("k").alias("lo_idx"), F.col("v").alias("lo_v")
    )
    hi_v = kv.select(
        "l_returnflag", F.col("k").alias("hi_idx"), F.col("v").alias("hi_v")
    )
    quart = (
        targets.join(lo_v, ["l_returnflag", "lo_idx"])
        .join(hi_v, ["l_returnflag", "hi_idx"])
        .select(
            "l_returnflag",
            "p",
            F.when(
                (F.col("hi_idx") == F.col("lo_idx")) | (F.col("hi_v") == F.col("lo_v")),
                F.col("lo_v").cast("double"),
            )
            .otherwise(
                (F.col("hi_idx").cast("double") - F.col("pos"))
                * F.col("lo_v").cast("double")
                + (F.col("pos") - F.col("lo_idx").cast("double"))
                * F.col("hi_v").cast("double")
            )
            .alias("qv"),
        )
    )
    fences = quart.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("p") == 0.25, F.col("qv"))).alias("q1"),
        F.min(F.when(F.col("p") == 0.75, F.col("qv"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("price_i") < F.col("q1") - 1.5 * iqr) | (
        F.col("price_i") > F.col("q3") + 1.5 * iqr
    )
    return (
        li.join(F.broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.min("q1").cast("double").alias("q1"),
            F.min("q3").cast("double").alias("q3"),
        )
    )


# shared co-purchase edge definition (same graph as triangle_count)
_EDGES_SQL = """
    WITH li AS (SELECT l_orderkey, l_partkey % 400 AS p FROM lineitem),
    edges AS (
      SELECT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit cores-proportional hash repartition on the join key: the
    # self-join's two sides then share ONE ReusedExchange (identical
    # child), and the CPU-heavy pair-explosion stage keeps full
    # parallelism instead of being AQE-coalesced to ~6 byte-sized
    # partitions (the pair blowup is per-ROW work on a byte-tiny
    # shuffle; measured 1.54 s -> 0.83 s at sf0.1/32 cores)
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 400).alias("p"))
        .transform(spread_by("l_orderkey"))
    )
    a = li.select("l_orderkey", F.col("p").alias("u"))
    b = li.select("l_orderkey", F.col("p").alias("v"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("u", "v")
    )


@q(
    "degree_distribution",
    oracle=_EDGES_SQL
    + """
    , und AS (
      SELECT u AS node, v AS nbr FROM edges
      UNION ALL
      SELECT v, u FROM edges
    ), degs AS (
      SELECT node, COUNT(*) AS degree FROM und GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM degs GROUP BY degree ORDER BY degree
    """,
    doc="Degree histogram of the part co-purchase graph (same "
    "canonical u<v edge set as triangle_count): undirect the edges, "
    "count per node, histogram the counts. Two small shuffles on "
    "ID-only rows — the structural profile (hubs/skew) one checks "
    "BEFORE running propagation algorithms, because max degree bounds "
    "their per-round fan-out.",
    tags=("graph", "analytics"),
)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    und = e.select(F.col("u").alias("node")).union(e.select(F.col("v").alias("node")))
    degs = und.groupBy("node").agg(F.count("*").alias("degree"))
    return degs.groupBy("degree").agg(F.count("*").alias("n_nodes")).orderBy("degree")


def _pagerank_ranks(
    spark: SparkSession,
    sf_dir: str,
    d: float = 0.85,
    max_rounds: int = 40,
    tol: float = 1e-3,
):
    """Iterate PageRank until the max per-node rank change drops below
    ``tol`` (or ``max_rounds`` as a hard bound). Returns (ranks_df,
    rounds_used). The delta check is a 1-row aggregate per round — the
    same bounded driver roundtrip as kmeans' centroid collect — and it
    makes the round count track the GRAPH's mixing time instead of a
    constant: the fixture converges in well under 10 rounds, a
    slower-mixing production graph gets up to 40.

    No dangling-node handling is needed: nodes are defined as the
    endpoints of the undirected edge set, so every node has degree >= 1
    by construction and total rank is conserved at |V| (asserted in
    tests/test_quality_graph.py)."""
    e = _edges(spark, sf_dir)
    # materialize the edge set and degrees ONCE: only the per-round
    # rank frame was checkpointed before, so every round's contribs
    # re-executed the co-purchase self-join TWICE (once under `und`,
    # once under `degs`) — ~2 edge builds per round, the entire cost
    # of the loop (same fix pagerank_fixed_iters got)
    # narrow before the checkpoint: the undirected edge frame is
    # domain-bounded (<= 2*C(400,2) rows, ~3 MB at ANY corpus size), and
    # every per-round broadcast-probe job re-reads it — 4 merged
    # partitions cost 4 task launches per round instead of the ~12
    # inherited from the edge build (coalesce: no extra exchange;
    # measured 1.69 -> 1.33 s on the fixed-iters twin at sf0.1)
    und = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).coalesce(4).localCheckpoint(eager=True)
    degs = und.groupBy("u").agg(F.count("*").alias("degree")).localCheckpoint(eager=True)
    nodes = degs.select(F.col("u").alias("node"))

    ranks = nodes.withColumn("rank", F.lit(1.0))
    rounds_used = 0
    for _ in range(max_rounds):
        # rank/degree pre-joined on the domain-bounded vertex frame
        # (|V| <= 400) and BROADCAST along the edges — the edges never
        # shuffle; one exchange per round (the inflow SUM), like
        # pagerank_fixed_iters
        wgt = (
            ranks.join(
                degs.select(F.col("u").alias("du"), "degree"),
                ranks.node == F.col("du"),
            )
            .select(F.col("du").alias("u"), (F.col("rank") / F.col("degree")).alias("c"))
        )
        contribs = (
            und.join(F.broadcast(wgt), "u")
            .select(F.col("v").alias("node"), "c")
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(F.broadcast(contribs), "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            ranks.select("node", F.col("rank").alias("prev"))
            .join(new_ranks, "node")
            .agg(F.max(F.abs(F.col("rank") - F.col("prev"))).alias("m"))
            .collect()[0]
            .m
        )
        ranks = new_ranks
        rounds_used += 1
        if delta is None or delta < tol:  # None = empty graph: converged
            break
    return ranks, rounds_used


@q(
    "pagerank",
    oracle=None,  # iterative double arithmetic; invariant-gated in tests
    doc="PageRank (d=0.85) over the part co-purchase graph, iterated to "
    "convergence: rounds stop when the max per-node rank delta falls "
    "below 1e-3 (hard bound 40), so the round count tracks the graph's "
    "mixing time rather than a constant. Per round ONE shuffle: "
    "contributions flow along edges (rank/degree per neighbor) and sum "
    "per target node; every node has degree >= 1 by construction "
    "(nodes = edge endpoints), so there is no dangling mass and total "
    "rank is conserved at |V| — asserted, with the convergence round "
    "count, in tests/test_quality_graph.py. The rank frame is |V| rows "
    "— tiny next to the corpus — and lineage is truncated per round "
    "with localCheckpoint exactly like connected_components; the "
    "driver only ever sees the 1-row delta aggregate. Rows-only "
    "driver check.",
    tags=("graph", "analytics", "iterative"),
)
def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks, _ = _pagerank_ranks(spark, sf_dir)
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(25)
        .select("node", F.round("rank", 6).alias("rank"))
    )


_PR_SCALE = 1_000_000_000_000  # rank fixed-point: 1.0 == 10^12

_PR_ORACLE = (
    _EDGES_SQL
    + f"""
    , und AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v, u FROM edges
    ), degs AS (
      SELECT src AS node, COUNT(*) AS degree FROM und GROUP BY src
    ), r0 AS (
      SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM degs
    )"""
    + "".join(
        f"""
    , c{i} AS (
      SELECT und.dst AS node, SUM(r{i - 1}.rank // degs.degree) AS inflow
      FROM und
      JOIN r{i - 1} ON und.src = r{i - 1}.node
      JOIN degs ON und.src = degs.node
      GROUP BY und.dst
    ), r{i} AS (
      SELECT d.node,
             {(_PR_SCALE * 15) // 100} + (COALESCE(c{i}.inflow, 0) * 85) // 100 AS rank
      FROM degs d LEFT JOIN c{i} ON d.node = c{i}.node
    )"""
        for i in (1, 2, 3)
    )
    + """
    SELECT node, CAST(rank AS BIGINT) AS rank_scaled
    FROM r3 ORDER BY rank DESC, node LIMIT 25
    """
)


@q(
    "pagerank_fixed_iters",
    oracle=_PR_ORACLE,
    doc="PageRank with 3 unrolled rounds in FIXED-POINT int64 (1.0 = "
    "10^12): contributions are rank DIV degree, the damping step is "
    "(inflow*85) DIV 100 + 0.15*scale — every operation is exact "
    "integer truncating division on positive values, so Spark and "
    "DuckDB produce bit-identical bigint ranks and the iterative "
    "algorithm family gains a full value-hash oracle (the converging "
    "double-arithmetic `pagerank` stays invariant-gated: libm "
    "summation order makes its doubles engine-specific). Per round "
    "ONE shuffle — contributions flow along edges and sum per target "
    "— identical stage geometry to the production `pagerank`. "
    "Reference analog: lineage-graph analytics over "
    "/root/reference/magictables/tablegraph.py:12-17.",
    tags=("graph", "analytics", "iterative"),
)
def pagerank_fixed_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    # materialize the edge set + degrees ONCE (localCheckpoint, same as
    # _pagerank_ranks): without it every unrolled round re-executes the
    # co-purchase self-join — the plan audit counted 66 shuffles, vs 8
    # after truncation
    und = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        # domain-bounded frame, re-read by every round's broadcast job:
        # narrow to 4 merged partitions (see _pagerank_ranks)
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    degs = und.groupBy("src").agg(F.count("*").alias("degree")).localCheckpoint(eager=True)
    # the vertex frame is domain-bounded (|V| <= 400 part-groups by
    # construction), so every per-round vertex-sized frame is broadcast:
    # rank DIV degree is pre-joined on the vertex frame and broadcast
    # along the edges (the edge frame is never shuffled), and the new
    # rank left-join broadcasts the per-node inflow sums — leaving the
    # per-target-node SUM as the only shuffle per round (the doc's "one
    # shuffle per round" now holds in the physical plan too: previously
    # each round SMJ-exchanged edges + ranks + degs, 26 Exchanges total)
    nodes = degs.select(F.col("src").alias("node"))
    ranks = degs.select(
        F.col("src").alias("node"), F.lit(_PR_SCALE).cast("bigint").alias("rank")
    )
    base = F.lit((_PR_SCALE * 15) // 100).cast("bigint")
    for _ in range(3):
        rd = ranks.join(F.broadcast(degs), ranks.node == degs.src).select(
            "node", F.expr("rank DIV degree").alias("c")
        )
        contribs = (
            und.join(F.broadcast(rd), und.src == rd.node)
            .select(F.col("dst").alias("node"), "c")
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(F.broadcast(contribs), "node", "left")
            .select(
                "node",
                (
                    base
                    + F.expr("(COALESCE(inflow, CAST(0 AS BIGINT)) * 85) DIV 100")
                ).alias("rank"),
            )
        )
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(25)
        .select("node", F.col("rank").alias("rank_scaled"))
    )


@q(
    "decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 7, 0) + 1),
               i -> array_to_string(list_slice(t, i, i + 7), ' ')))) AS sh
      FROM toks
    ), bench AS (
      SELECT DISTINCT sh FROM shingled WHERE doc_id % 97 = 0
    ), contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM shingled s JOIN bench b ON s.sh = b.sh
      WHERE s.doc_id % 97 <> 0
    )
    SELECT lang,
           COUNT(*) AS n_clean_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE doc_id % 97 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    GROUP BY lang ORDER BY lang
    """,
    doc="Benchmark decontamination, the REMOVAL step: drop every "
    "training document sharing an 8-token shingle with the held-out "
    "set and report the surviving corpus per language "
    "(contamination_check is the measurement twin). Spark shape: the "
    "held-out shingle set broadcasts into a left-semi probe that "
    "yields the contaminated doc ids (tiny), which broadcast back "
    "into a left-anti join against the train side — the 100 TB train "
    "corpus is scanned twice and shuffled never.",
    tags=("text", "pipeline", "llm", "dedup"),
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magictables_spark.functions import shingles

    # spread the raw scan before the 8-gram shingle assembly (heavy
    # per-row compute; single-split fixture scan) — the three
    # consumers (bench, train explode, train anti-join) reuse one
    # exchanged subtree instead of shingling the corpus serially each
    docs = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select("doc_id", "lang", "n_chars", shingles("text", n=8).alias("sh"))
    )
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("sh").alias("sh"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        train.select("doc_id", F.explode("sh").alias("sh"))
        .join(F.broadcast(bench), "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        train.join(F.broadcast(contaminated), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_clean_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@q(
    "crosstab_counts",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN user_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_0,
           CAST(SUM(CASE WHEN user_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_1,
           CAST(SUM(CASE WHEN user_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_2,
           CAST(SUM(CASE WHEN user_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS cohort_3
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Contingency table (df.stat.crosstab's shape, built "
    "declaratively): event-type by user-cohort counts via pivot on a "
    "bounded category set. Explicit pivot values keep the plan a "
    "single partial-aggregated shuffle — pivot WITHOUT values adds a "
    "distinct-scan job to discover columns, which at 100 TB is a "
    "whole extra pass over the fact table.",
    tags=("stats", "quality"),
)
def crosstab_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", (F.col("user_id") % 4).alias("cohort"))
        .groupBy("event_type")
        .pivot("cohort", [0, 1, 2, 3])
        .agg(F.count(F.lit(1)))
        .select(
            "event_type",
            *[F.coalesce(F.col(str(i)), F.lit(0)).alias(f"cohort_{i}") for i in range(4)],
        )
        .orderBy("event_type")
    )


@q(
    "dq_expectations",
    oracle="""
    WITH o AS (SELECT * FROM orders), l AS (SELECT * FROM lineitem)
    SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(violations AS BIGINT) AS violations,
           violations = 0 AS pass
    FROM (
      SELECT 'orders.o_orderkey unique' AS rule,
             (SELECT COUNT(*) FROM o) AS n_checked,
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM o) AS violations
      UNION ALL
      SELECT 'orders.o_custkey not null',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FILTER (WHERE o_custkey IS NULL) FROM o)
      UNION ALL
      SELECT 'orders.o_totalprice positive',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0) FROM o)
      UNION ALL
      SELECT 'orders.o_orderdate in 1995-2002',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1995-01-01'
                                         OR o_orderdate >= TIMESTAMP '2002-01-01') FROM o)
      UNION ALL
      SELECT 'orders.o_orderpriority in domain',
             (SELECT COUNT(*) FROM o),
             (SELECT COUNT(*) FILTER (WHERE o_orderpriority NOT IN
               ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')) FROM o)
      UNION ALL
      SELECT 'lineitem.l_orderkey references orders',
             (SELECT COUNT(*) FROM l),
             (SELECT COUNT(*) FROM l WHERE NOT EXISTS
               (SELECT 1 FROM o WHERE o.o_orderkey = l.l_orderkey))
    )
    ORDER BY rule
    """,
    doc="Deequ-style data-quality expectation suite as one registered "
    "query: uniqueness (key-cardinality delta), completeness (null "
    "counts), range checks (positive amounts, date window), domain "
    "membership (priority enum), and referential integrity (lineitem "
    "orphans via anti-join) -- each rule one row with its violation "
    "count and pass flag, the gate a production pipeline evaluates "
    "before publishing a batch. Scale shape: the five orders rules "
    "fold into ONE conditional-agg scan (count/count-distinct/"
    "filtered counts share the pass), the referential rule is a "
    "broadcast-or-shuffle LEFT ANTI join counted map-side; nothing "
    "collects more than the 6-row report.",
    tags=("quality", "analytics", "scale"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    prio = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    orders_report = o.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("v_unique"),
        F.count_if(F.col("o_custkey").isNull()).alias("v_null"),
        F.count_if(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("v_price"),
        F.count_if(
            (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp"))
        ).alias("v_date"),
        F.count_if(~F.col("o_orderpriority").isin(*prio)).alias("v_domain"),
    )
    rules = orders_report.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders.o_orderkey unique").alias("rule"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("v_unique").cast("bigint").alias("violations"),
                ),
                F.struct(
                    F.lit("orders.o_custkey not null").alias("rule"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("v_null").cast("bigint").alias("violations"),
                ),
                F.struct(
                    F.lit("orders.o_totalprice positive").alias("rule"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("v_price").cast("bigint").alias("violations"),
                ),
                F.struct(
                    F.lit("orders.o_orderdate in 1995-2002").alias("rule"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("v_date").cast("bigint").alias("violations"),
                ),
                F.struct(
                    F.lit("orders.o_orderpriority in domain").alias("rule"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("v_domain").cast("bigint").alias("violations"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    # one LEFT join + one agg yields total and orphan counts together
    # (an anti-join count would need a second scan or a 1-row cross
    # join for the denominator)
    orphans = (
        li.select("l_orderkey")
        .join(
            o.select(F.col("o_orderkey").alias("__ok")).distinct(),
            F.col("l_orderkey") == F.col("__ok"),
            "left",
        )
        .agg(
            F.count("*").alias("n_checked"),
            F.count_if(F.col("__ok").isNull()).alias("violations"),
        )
        .select(
            F.lit("lineitem.l_orderkey references orders").alias("rule"),
            F.col("n_checked").cast("bigint"),
            F.col("violations").cast("bigint"),
        )
    )
    return (
        rules.unionByName(orphans)
        .withColumn("pass", F.col("violations") == 0)
        .orderBy("rule")
    )
