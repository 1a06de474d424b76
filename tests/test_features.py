"""Quality gates for the rows-only feature/stats operators."""

from __future__ import annotations

from magictables_spark.plans.queries import REGISTRY


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    """percentile_approx at accuracy=1000 must land within 2% of the
    exact PERCENTILE_DISC values for every group/fraction."""
    exact = {
        r.o_orderpriority: (r.p25_cents, r.p50_cents, r.p90_cents)
        for r in REGISTRY["quantiles_disc"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.o_orderpriority: (r.p25_cents, r.p50_cents, r.p90_cents)
        for r in REGISTRY["approx_quantiles"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for grp, ex in exact.items():
        for e, a in zip(ex, approx[grp]):
            assert abs(a - e) <= 0.02 * e, f"{grp}: approx {a} vs exact {e}"


def test_disc_rank_values_matches_builtin_percentile_disc(spark):
    """The histogram-refinement order statistic must equal Spark's own
    percentile_disc on adversarial group sizes: tiny n, heavy
    duplicates, near-unique values, values straddling many >>16
    buckets, negatives, and fractions whose p*n lands exactly on an
    integer."""
    import random

    from pyspark.sql import functions as F

    from magictables_spark.plans.features import _disc_rank_values

    rng = random.Random(11)
    rows = []
    for gid, n in enumerate([1, 2, 3, 4, 5, 7, 10, 16, 19, 20, 100, 101, 400]):
        for _ in range(n):
            mode = gid % 3
            if mode == 0:  # heavy duplicates in one bucket
                val = rng.choice([7, 7, 7, 100, 65535])
            elif mode == 1:  # wide spread incl. negatives
                val = rng.randrange(-3_000_000, 3_000_000)
            else:  # near-unique, multi-bucket
                val = rng.randrange(0, 50_000_000)
            rows.append((gid, val))
    df = spark.createDataFrame(rows, "g int, v long")
    fracs = (0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    mine = {
        (r.g, round(r.p, 6)): r.v
        for r in _disc_rank_values(df, "g", "v", fracs).collect()
    }
    builtin = df.groupBy("g").agg(
        *[
            F.expr(
                f"CAST(percentile_disc({p}) WITHIN GROUP (ORDER BY v) AS BIGINT)"
            ).alias(f"q{i}")
            for i, p in enumerate(fracs)
        ]
    )
    for r in builtin.collect():
        for i, p in enumerate(fracs):
            assert mine[(r.g, round(p, 6))] == r[f"q{i}"], (
                r.g,
                p,
                mine[(r.g, round(p, 6))],
                r[f"q{i}"],
            )
