"""Cross-session warehouse quickstart — the reference's headline
"Intelligent Caching ... repeated analyses are instant" behavior
(reference README.md:246-248): the FIRST session fetches from the
(injected, offline) API and persists the result to the warehouse under
its provenance id (md5 of type+identifier+params, reference
sources.py:32-39); ANY LATER SESSION pointed at the same warehouse dir
resolves the identical provenance id and serves the table straight from
parquet — zero fetches, zero LLM calls, no shared process state.

Run it twice with the same directory to watch the second run hit cache:

    python examples/warehouse_sessions.py /tmp/demo_wh
    python examples/warehouse_sessions.py /tmp/demo_wh   # fetches: 0

tests/test_quickstart_example.py runs exactly that — two separate
python processes (two JVMs, two SparkSessions) — and asserts the second
prints ``fetches: 0`` with identical rows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(wh_dir: str) -> dict:
    """One full session: build a SparkSession, ingest through the
    warehouse, report how many API fetches the session performed."""
    from magictables_spark.frame import MagicFrame
    from magictables_spark.session import get_spark
    from magictables_spark.warehouse import Warehouse

    spark = get_spark()
    wh = Warehouse(wh_dir)

    n_fetches = 0

    def counting_api(url: str, params=None) -> dict:
        nonlocal n_fetches
        n_fetches += 1
        return {
            "results": [
                {"movie_id": i, "title": f"Movie {i}", "rating": 5.0 + i}
                for i in range(1, 4)
            ]
        }

    mf = MagicFrame.from_api(
        spark, "http://api.example.com/popular", fetcher=counting_api, warehouse=wh
    )
    rows = sorted((r.asDict() for r in mf.df.collect()), key=repr)
    return {"rows": rows, "fetches": n_fetches, "table": mf.name}


def main() -> None:
    wh_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/magictables_demo_wh"
    out = run(wh_dir)
    print("rows:", out["rows"])
    print("table:", out["table"])
    print("fetches:", out["fetches"])


if __name__ == "__main__":
    main()
