"""Experiment-analytics walkthrough — the round-5 statistics pack.

The readout an experimentation team runs over an event stream: skew
triage on the shuffle key, distribution screens, both parametric and
rank-based arm comparisons, trend estimation (OLS and robust), a
bootstrap CI, and seasonality diagnostics — every number produced by
a registered query that the correctness gate hash-checks against
DuckDB bit-for-bit.

Run:  python examples/experiment_analytics.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magictables_spark.plans.queries import REGISTRY
from magictables_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("experiment_analytics_example")
    spark.sparkContext.setLogLevel("ERROR")

    def run(slug: str, n: int = 10) -> None:
        print(f"\n=== {slug} ===")
        REGISTRY[slug].fn(spark, sf_dir).show(n, truncate=False)

    # 1. Before anything: is the key we shuffle on skewed enough to
    #    need salting? (gini ~0 = uniform load, ~1 = one hot key)
    run("key_skew_gini")

    # 2. Data-quality screen on the metric column itself.
    run("benford_deviation")

    # 3. The arm comparison, four ways: parametric conversion z-test
    #    (with Wilson intervals per arm), rank-based value comparison,
    #    the distribution-shape KS test, and type-vs-arm independence.
    run("ab_test_zscore")
    run("conversion_wilson_ci")
    run("mannwhitney_u")
    run("ks_test_2sample")
    run("chi2_independence")
    run("effect_size_cohens_d")
    run("diff_in_diff")
    run("anova_oneway")

    # 4. How precise is the headline mean? Deterministic Poisson
    #    bootstrap — rerunnable bit-for-bit on any cluster size.
    run("bootstrap_ci_mean")

    # 5. Trend: least-squares per event type, the outlier-robust
    #    Theil-Sen twin, and the smoothed series.
    run("linreg_by_group")
    run("theilsen_trend")
    run("spearman_corr")
    run("ewma_windowed", 5)

    # 6. Seasonality: is there a daily cycle worth modeling?
    run("acf_volume")
    run("ljung_box_white_noise")
    run("seasonal_strength_hourly")
    run("cusum_drift")

    # 7. The same OLS moments as a REAL streaming job (readStream ->
    #    1-day windows -> AvailableNow), proving the stats survive the
    #    batch/streaming boundary.
    run("stream_linreg_windowed", 5)

    spark.stop()


if __name__ == "__main__":
    main()
