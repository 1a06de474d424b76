"""Pretraining-corpus curation walkthrough — the round-3 pack end to end.

What a data-engineering team runs between "raw crawl landed" and
"tokenizer starts": quality filtering, passage-level dedup, exact and
near-dup similarity joins, mixture sampling, and a pre-flight plan
audit — all on the shipped fixtures, all driven through the same
registered queries the correctness gate hash-checks against DuckDB.

Run:  python examples/pretrain_curation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magictables_spark.frame import MagicFrame
from magictables_spark.plans.queries import REGISTRY
from magictables_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("pretrain_curation_example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. Quality filtering (Gopher repetition rules) ==")
    q = REGISTRY["gopher_quality_filters"].fn(spark, SF_DIR)
    kept = q.filter("keep").count()
    print(f"   {kept}/{q.count()} docs pass the repetition gate")

    print("== 2. Passage-level dedup (corpus-global, first wins) ==")
    p = REGISTRY["passage_dedup"].fn(spark, SF_DIR)
    p.selectExpr(
        "count(*) AS docs",
        "sum(n_passages) AS passages",
        "sum(n_kept) AS unique_passages",
    ).show()

    print("== 3. Exact near-dup pairs (prefix-filtered Jaccard >= 0.9) ==")
    print(f"   {REGISTRY['simjoin_prefix_filter'].fn(spark, SF_DIR).count()} pairs")

    print("== 4. Mixture sampling by source ==")
    REGISTRY["mixture_weighted_sources"].fn(spark, SF_DIR).orderBy("source").show(5)

    print("== 5. The whole funnel in one plan ==")
    REGISTRY["pretrain_corpus_funnel"].fn(spark, SF_DIR).orderBy("source").show(5)

    print("== 6. Pre-flight: audit the funnel's physical plan ==")
    mf = MagicFrame(REGISTRY["pretrain_corpus_funnel"].fn(spark, SF_DIR), sources=["funnel"])
    print(str(mf.audit()))
    print("OK")


if __name__ == "__main__":
    main()
