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
