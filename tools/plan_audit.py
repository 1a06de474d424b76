"""Plan audit: dump physical plans for every registered query and flag
scale anti-patterns. Usage: python tools/plan_audit.py [slug ...]

Red flags:
  CartesianProduct            unbounded cross join (only tiny dims may)
  BatchEvalPython             row-at-a-time Python UDF in the plan
  Exchange SinglePartition    global serialization point (windows
                              without PARTITION BY, global sorts)
  PushedFilters: []           a filtered scan pushing nothing

Informational counts: Exchange (shuffles), BroadcastExchange,
WholeStageCodegen spans, ArrowEvalPython/MapInPandas (vectorized
Python, expected for the UDF/chain slugs).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.001"

    from magictables_spark.plans.queries import REGISTRY
    from magictables_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    slugs = args or sorted(REGISTRY)
    n_flagged = 0
    for slug in slugs:
        try:
            df = REGISTRY[slug].fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{slug}: PLAN ERROR {type(e).__name__}: {str(e)[:120]}")
            n_flagged += 1
            continue
        from magictables_spark.plans.audit import audit_plan

        res = audit_plan(df)
        flags = [f.code for f in res.findings]
        n_ex, n_bc, n_py = res.shuffles, res.broadcasts, res.arrow_python
        status = "FLAG " + ",".join(flags) if flags else "ok"
        if flags:
            n_flagged += 1
        print(f"{slug}: {status}  shuffles={n_ex} broadcasts={n_bc} arrow_python={n_py}")
    print(f"\n{len(slugs) - n_flagged}/{len(slugs)} clean")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    sys.exit(main())
