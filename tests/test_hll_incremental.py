"""hll_rollup_incremental invariants (rows-only slug — sketch internals
are engine-specific, so these gates replace the DuckDB hash oracle):

1. EXACT merge equivalence: the store+batch union-merged estimate equals
   a single-pass full-scan sketch estimate bit-for-bit (DataSketches
   HLL union is a register-wise max at fixed lgConfigK with
   deterministic item hashing).
2. Accuracy: every estimate within 5% of the exact distinct count.
3. Warm reuse: a second call serves the same store version.
"""

from __future__ import annotations

import json
import os

SF = "/root/testdata/sf0.001"


def test_incremental_equals_full_scan_and_within_5pct(spark):
    from pyspark.sql import functions as F

    from magictables_spark.plans.features import hll_rollup_incremental
    from magictables_spark.plans.registry import _t

    inc = {
        r["event_type"]: r["approx_users"]
        for r in hll_rollup_incremental(spark, SF).collect()
    }
    ev = _t(spark, SF, "events")
    full = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert inc == full  # merged sketches ≡ single-pass sketch, exactly

    exact = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert set(inc) == set(exact) and len(inc) > 0
    for et, est in inc.items():
        assert abs(est - exact[et]) <= 0.05 * exact[et], (et, est, exact[et])


def test_warm_second_call_reuses_store(spark):
    from magictables_spark.plans.features import hll_rollup_incremental
    from magictables_spark.warehouse import store_root

    from magictables_spark.warehouse import Warehouse

    r1 = sorted(tuple(r) for r in hll_rollup_incremental(spark, SF).collect())
    wh = Warehouse(store_root("hll"))
    v1 = {k: m["version"] for k, m in wh.list_tables().items()}
    r2 = sorted(tuple(r) for r in hll_rollup_incremental(spark, SF).collect())
    v2 = {k: m["version"] for k, m in wh.list_tables().items()}
    assert r1 == r2 and len(r1) > 0
    assert v1 == v2
