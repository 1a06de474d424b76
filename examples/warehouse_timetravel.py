"""Warehouse version lifecycle walkthrough: write -> supersede ->
time-travel -> pin -> vacuum.

Run:  python examples/warehouse_timetravel.py

Demonstrates the round-7 retention contract on a throwaway warehouse:
every write keeps the superseded version readable (time-travel) until
``vacuum`` removes it; the live and pinned versions survive any
retention; a reader that resolved a version keeps scanning it across a
concurrent swap+vacuum.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magictables_spark.session import get_spark  # noqa: E402
from magictables_spark.warehouse import Warehouse  # noqa: E402


def main() -> None:
    spark = get_spark("warehouse_timetravel_demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mts_timetravel_")
    wh = Warehouse(root)

    # v1: the "daily snapshot"
    wh.write_table(spark.range(0, 100).selectExpr("id", "1 AS batch"), "features")
    v1 = wh.table_meta("features")["version"]

    # a reader resolves v1 (lazily — nothing executed yet)
    reader = wh.read_table(spark, "features", version=v1)

    # v2 supersedes it
    wh.write_table(spark.range(0, 50).selectExpr("id", "2 AS batch"), "features")

    print("history:")
    for v in wh.list_versions("features"):
        print(
            f"  {v['version']}  live={v['live']} pinned={v['pinned']} "
            f"on_disk={v['on_disk']}"
        )

    # the v1 reader still completes — default retention protects it
    print("reader on v1 still sees", reader.count(), "rows (live is",
          wh.read_table(spark, "features").count(), "rows)")

    # pin v1 as a reproducibility anchor; even retention_s=0 keeps it
    wh.pin_version("features", v1)
    removed = wh.vacuum("features", retention_s=0.0)
    print("vacuum(0) removed:", removed, "- v1 pinned, v2 live")
    print("time-travel to v1:", wh.read_table(spark, "features", version=v1).count())

    # unpin -> the next vacuum reclaims it
    wh.unpin_version("features", v1)
    print("after unpin, vacuum(0) removed:", wh.vacuum("features", retention_s=0.0))
    spark.stop()


if __name__ == "__main__":
    main()
