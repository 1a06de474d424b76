"""Full-registry timing sweep at sf0.1 — the 10x-scale smoke the
sf0.01 correctness gate cannot provide.

Runs every registered query once (after a JVM/scan warm-up query) with
the noop sink and reports per-slug wall time, the slowest 15, and any
errors. This sweep found round 3's four scale defects (corr_exact
int64 overflow, the missing levenshtein cap, simjoin's string-array
verify, tfidf_mllib's dense 2^16 projection) — run it per round.

Usage: python tools/registry_sweep.py [--sf=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sf = a.split("=", 1)[1]

    from magictables_spark.plans.queries import REGISTRY
    from magictables_spark.session import get_spark

    spark = get_spark("registry_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + scan path so the alphabetically-first slug doesn't
    # absorb ~5 s of one-time cost and read as a regression
    next(iter(REGISTRY.values())).fn(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, object] = {}
    for slug, spec in sorted(REGISTRY.items()):
        t = time.perf_counter()
        try:
            spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
            times[slug] = round(time.perf_counter() - t, 3)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            times[slug] = f"ERR {type(e).__name__}: {str(e)[:90]}"

    print(json.dumps(times))
    errs = {k: v for k, v in times.items() if isinstance(v, str)}
    num = {k: v for k, v in times.items() if not isinstance(v, str)}
    print(f"\nTOTAL {sum(num.values()):.1f}s over {len(num)} queries, {len(errs)} errors")
    for k, v in sorted(num.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{k:35s} {v:7.2f}")
    for k, v in errs.items():
        print("ERR", k, v)
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
