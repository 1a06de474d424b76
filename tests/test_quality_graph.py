"""Quality + graph pack gates (plans/quality_pack.py): pagerank
invariants (no SQL oracle — iterative), bloom_join pruning mechanics.
The oracle-backed slugs (bloom_join, column_profile, iqr_outliers,
degree_distribution, decontaminate) are covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from magictables_spark.plans.queries import REGISTRY


def test_pagerank_mass_and_determinism(spark, sf_dir):
    """Total rank stays ~= |V| (every node has degree >= 1, so no
    dangling mass and damping conserves the total), ranks are positive,
    and a second run is bit-identical (no RNG anywhere)."""
    from magictables_spark.plans.quality_pack import _pagerank_ranks

    ranks, _ = _pagerank_ranks(spark, sf_dir)
    full = ranks.collect()
    n_nodes = len(full)
    total = sum(r.rank for r in full)
    assert abs(total - n_nodes) < 1e-6 * n_nodes, (total, n_nodes)

    out1 = REGISTRY["pagerank"].fn(spark, sf_dir)
    rows1 = out1.collect()
    assert len(rows1) == 25
    assert all(r.rank > 0 for r in rows1)
    rows2 = REGISTRY["pagerank"].fn(spark, sf_dir).collect()
    assert [(r.node, r.rank) for r in rows1] == [(r.node, r.rank) for r in rows2]


def test_pagerank_early_stop_tracks_graph(spark, sf_dir):
    """Delta-based convergence: the fixture graph must settle in fewer
    rounds than the old fixed-10 schedule, and a tighter tolerance must
    take at least as many rounds (monotone in tol)."""
    from magictables_spark.plans.quality_pack import _pagerank_ranks

    _, rounds_loose = _pagerank_ranks(spark, sf_dir)
    assert rounds_loose < 10, rounds_loose
    _, rounds_tight = _pagerank_ranks(spark, sf_dir, tol=1e-5)
    assert rounds_tight >= rounds_loose


def test_pagerank_favors_high_degree_nodes(spark, sf_dir):
    """Sanity: the top-ranked node should be among the higher-degree
    nodes (PageRank on a near-regular co-purchase graph tracks degree)."""
    from magictables_spark.plans.quality_pack import _edges

    e = _edges(spark, sf_dir)
    und = e.select(F.col("u").alias("node")).union(e.select(F.col("v").alias("node")))
    degs = {r.node: r.degree for r in und.groupBy("node").agg(F.count("*").alias("degree")).collect()}
    top = REGISTRY["pagerank"].fn(spark, sf_dir).first()
    median_deg = sorted(degs.values())[len(degs) // 2]
    assert degs[top.node] >= median_deg


def test_bloom_join_prunes_before_join(spark, sf_dir):
    """The bitmap membership test must appear as a Filter BEFORE the
    final equi-join in the plan (map-side pruning), and the word table
    side must be a broadcast."""
    df = REGISTRY["bloom_join"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "shiftleft" in plan and "& shiftleft" in plan.replace("AND", "&"), plan


def test_bloom_join_bitmap_is_small(spark, sf_dir):
    """The broadcast word table is bounded by M/64 rows regardless of
    data size — kilobytes at any scale."""
    from magictables_spark.plans.registry import _t

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") >= "1997-01-01")
    )
    m_bits = 1 << 18
    n_words = (
        orders.select(F.expr(f"pmod(xxhash64(o_orderkey), {m_bits})").alias("bkt"))
        .select((F.col("bkt") / 64).cast("int").alias("w"))
        .distinct()
        .count()
    )
    assert n_words <= m_bits // 64


def test_decontaminate_consistent_with_contamination_check(spark, sf_dir):
    """The removal op must drop exactly the docs the measurement op
    counts: n_train_docs - n_contaminated == sum(n_clean_docs)."""
    check = REGISTRY["contamination_check"].fn(spark, sf_dir).first()
    clean = REGISTRY["decontaminate"].fn(spark, sf_dir)
    n_clean = clean.agg(F.sum("n_clean_docs")).first()[0]
    assert check.n_train_docs - check.n_contaminated == n_clean

def test_clustering_coeff_corner_credits_match_triangle_census(spark, sf_dir):
    """local_clustering_coeff credits every u<v<w triangle to all THREE
    corners in one explode pass (r11: replaces the 3-branch union that
    re-planned the triangle join per corner). Invariant linking it to
    triangle_count's census over the same %400 co-purchase graph:
    sum over nodes of per-node triangles == 3 * total triangles, and
    every coefficient is 2*tri / (deg*(deg-1)) within [0, 1]."""
    lcc = REGISTRY["local_clustering_coeff"].fn(spark, sf_dir).collect()
    census = REGISTRY["triangle_count"].fn(spark, sf_dir).collect()[0]
    assert sum(r.triangles for r in lcc) == 3 * census.n_triangles
    for r in lcc:
        expect = 2.0 * r.triangles / (r.degree * (r.degree - 1))
        assert abs(r.clustering_coeff - expect) < 1e-12
        assert 0.0 <= r.clustering_coeff <= 1.0
