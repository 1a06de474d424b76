"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"flagship_q3": <sec>, ...}, "sf": 0.1}

Each query is forced with the noop sink (full execution, zero
driver-collect cost) so the number measures the distributed plan, not
pandas conversion.

WHICH NUMBER BINDS (round-6 verdict item 9): the cross-round 2x
performance gate reads ``shared_with_prev_total`` — the sum over the
intersection of this round's and the previous round's headline query
sets — normalized by the ``calibration_sec`` ratio
(``shared_with_prev.normalized_ratio``). The raw ``headline_total``
GROWS whenever queries are added and is NOT comparable across rounds;
it exists only as the per-round inventory of absolute timings.
``calibration_sec`` times a fixed, registry-independent, pure-JVM
synthetic join+agg (identical every round), so a uniform host
slowdown shows up there and divides out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per operator family, weighted toward
# the shapes that dominate at 100 TB (scan-agg, multi-join, window, dedup,
# event-time, text dedup, embedding similarity).
HEADLINE = [
    "flagship_q3",
    "groupby_agg",
    "join_inner",
    "join_left",
    "sort_topk",
    "dedup_subset",
    "window_rank",
    "window_tumbling",
    "asof_join",
    "dedup_exact",
    "dedup_minhash",
    "sim_cosine_topk",
    "q9_product_profit",
    "funnel_conversion",
    "corpus_curation_pipeline",
    # round-2 additions: bitmap-pruned join, bucketized interval join,
    # OHLC rollup — the new scale-path families
    "bloom_join",
    "interval_join_attribution",
    "ohlc_bars",
    # round-3 additions: the re-planned multi-table LSH ANN (canonical
    # pairs + hash dedup + broadcast re-rank) and the fixed-point
    # iterative-graph twin
    "ann_lsh_topk",
    "pagerank_fixed_iters",
    # round-3 pretraining-curation pack: per-doc repetition filters,
    # corpus-global passage dedup + reassembly, salted skew join,
    # Morton-key layout clustering
    "gopher_quality_filters",
    "passage_dedup",
    "skew_salted_join",
    "zorder_cluster_key",
    "pretrain_corpus_funnel",
    # round-3 late additions: integer-exact LM quality buckets, the
    # shard-interleaved reproducible training order, and winnowing-
    # anchored cross-doc substring duplication coverage
    "unigram_surprisal_quality",
    "reproducible_shard_shuffle",
    "substring_dupe_coverage",
    # round-5 additions: clustered semantic dedup (equi-join on
    # centroid_id), DSIR hashed-bigram importance weighting, and the
    # shuffle-free bucketed-layout join
    "semdedup",
    "dsir_importance",
    "bucketed_join_colocated",
    # round-5 late additions: exact-sum grouped OLS and the
    # domain-bounded rank-sum test
    "linreg_by_group",
    "mannwhitney_u",
    # round-6 addition: the build-once/serve-many warehouse-persisted
    # LSH index — the production similarity-serving shape
    "ann_lsh_persisted",
    # round-6 additions: banded simhash near-dup pairs (the fully
    # hash-oracled LSH-join shape), incremental materialized rollup
    # (the warehouse-maintenance shape), point-in-time feature join
    # (the leakage-free feature-store shape)
    "simhash_neardup",
    "rollup_incremental_store",
    "pit_feature_join",
    # round-7 addition: the persisted IVF index — the second ANN family
    # completing the build-once/serve-many lifecycle
    "ann_ivf_persisted",
    # round-8 additions: the Lloyd-trained product-quantization ANN (8
    # bytes/vector + ADC), and the streamed materialized-rollup
    # maintenance (dynamic partition overwrite per micro-batch)
    "ann_pq_rescore",
    "rollup_store_stream",
    # round-8 late additions: the model-evaluation family's headline
    # members (binned rank-sum AUC, positional retrieval quality), the
    # canonical TPC-H scan-agg, and incremental join-view maintenance
    "roc_auc",
    "ndcg_at_k",
    "q1_pricing_summary",
    "join_view_incremental_store",
    # round-11 additions: the multimodal trio (oracled since round 8 but
    # absent from every named always-run set — pinned here so each round
    # exercises the stdlib media decoders at driver scale; all
    # sub-second)
    "multimodal_features",
    "image_phash_neardup",
    "audio_fp_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from magictables_spark.plans.queries import REGISTRY
    from magictables_spark.session import get_spark

    spark = get_spark("magictables_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Scan-split sizing: the sf0.1 fixtures are single ~1-10 MB parquet
    # files, so the 128 MB default gives ONE map task per table and 31
    # idle cores. 2 MB splits engage the whole local[32] pool — the same
    # per-core split geometry a 1000-executor cluster gets for free from
    # a many-file 100 TB table (where the 128 MB default is correct).
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))

    # Warm-up: pay one-time JVM/codegen/broadcast-machinery costs outside
    # the timed region so numbers reflect steady-state throughput.
    from pyspark.sql import functions as F

    from magictables_spark.plans.catalog import TABLES, load_table

    for _name in TABLES:  # footer/schema + file-index caches per table
        load_table(spark, sf_dir, _name).schema

    _li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10000)
    _na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        _li.join(F.broadcast(_na), _li.l_suppkey % 25 == _na.n_nationkey)
        .groupBy("n_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Pinned calibration workload (round-6 verdict item 1): one FIXED,
    # registry-independent, pure-JVM job whose size never changes across
    # rounds — a seeded synthetic join+agg over spark.range. Its median
    # time is recorded as "calibration_sec"; cross-round performance
    # ratios should be quoted as shared_with_prev_total normalized by
    # the calibration ratio, reducing "is the host slower this round?"
    # to one division instead of git-diff + re-timing forensics.
    def _calibration(_s=spark):
        fact = _s.range(0, 4_000_000, 1, 32).selectExpr(
            "id",
            "pmod(hash(id), 100000) AS k",
            "pmod(hash(id + 7), 997) AS v",
        )
        dim = _s.range(0, 100_000, 1, 8).selectExpr(
            "id AS k", "pmod(hash(id * 3), 50) AS grp"
        )
        return (
            fact.join(dim, "k")
            .groupBy("grp")
            .agg(
                F.sum("v").alias("sv"),
                F.count("*").alias("c"),
                F.approx_count_distinct("k").alias("nd"),
            )
        )

    def _time_calibration_3() -> list[float]:
        for _ in range(2):  # same 2-warmup / median-of-3 protocol as queries
            _calibration().write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            _calibration().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - start, 3))
        return runs

    cal_runs = _time_calibration_3()
    calibration_sec = sorted(cal_runs)[1]

    slugs = [s for s in HEADLINE if s in REGISTRY]
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    timings_max: dict[str, float] = {}
    for slug in slugs:
        fn = REGISTRY[slug].fn
        # steady-state methodology: two untimed iterations per query pay
        # plan-specific codegen/broadcast build AND let HotSpot finish
        # tiering the generated code (measured: run1 is still 2x run3);
        # the timed run measures the execution a cluster would repeat
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # median of three timed runs: single-run timings showed +-20-30%
        # jitter on sub-second queries (round-4 verdict) — larger than
        # the per-query deltas the rounds measure; the median is robust
        # to one scheduling hiccup in either direction where min-of-2
        # still tracked the hiccup half the time
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        runs.sort()
        timings[slug] = round(runs[1], 3)
        timings_min[slug] = round(runs[0], 3)
        timings_max[slug] = round(runs[2], 3)

    total = round(sum(timings.values()), 3)

    # Noise self-report (round-10 verdict item 2): one bench invocation
    # must carry its own spread so close-out numbers need no after-the-
    # fact reruns to defend. Every query already runs 3 timed times —
    # surface the min/max envelope of the basket, and re-time the fixed
    # calibration job at the END of the window so host drift across the
    # ~5-minute invocation is measured, not argued.
    cal_runs_end = _time_calibration_3()
    calibration_end_sec = sorted(cal_runs_end)[1]
    spread = {
        "total_min": round(sum(timings_min.values()), 3),
        "total_median": total,
        "total_max": round(sum(timings_max.values()), 3),
        "calibration_runs_start": cal_runs,
        "calibration_runs_end": cal_runs_end,
        "calibration_drift_ratio": round(calibration_end_sec / calibration_sec, 3),
    }

    # Like-for-like round-over-round comparability (round-5 verdict): the
    # headline set grows each round, so headline_total alone reads as a
    # regression whenever queries are ADDED. Emit the sum over the
    # intersection with the most recent BENCH_r{N}.json's query set next
    # to it, so the 2x gate tracks a fixed basket without recomputing
    # intersections by hand.
    shared_total = None
    shared_with = None
    try:
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        prev = sorted(
            (
                (int(m.group(1)), os.path.join(here, f))
                for f in os.listdir(here)
                for m in [re.match(r"BENCH_r(\d+)\.json$", f)]
                if m
            ),
        )
        if prev:
            rnum, path = prev[-1]
            with open(path) as fh:
                prev = json.load(fh)
            # the driver wraps bench stdout under "parsed"
            prev_parsed = prev.get("parsed") or prev
            prev_queries = prev_parsed.get("queries", {})
            shared = sorted(set(prev_queries) & set(timings))
            shared_total = round(sum(timings[s] for s in shared), 3)
            shared_with = {"round": rnum, "n_queries": len(shared)}
            prev_cal = prev_parsed.get("calibration_sec")
            if prev_cal:
                # host-normalized ratio: (this shared total / prev shared
                # total on the same basket) / (this calibration / prev
                # calibration). ~1.0 means "same code speed, host moved".
                prev_shared_on_basket = round(
                    sum(
                        prev_queries[s]
                        for s in shared
                        if isinstance(prev_queries.get(s), (int, float))
                    ),
                    3,
                )
                if prev_shared_on_basket:
                    shared_with["prev_total_same_basket"] = prev_shared_on_basket
                    shared_with["raw_ratio"] = round(
                        shared_total / prev_shared_on_basket, 3
                    )
                    shared_with["calibration_ratio"] = round(
                        calibration_sec / prev_cal, 3
                    )
                    shared_with["normalized_ratio"] = round(
                        (shared_total / prev_shared_on_basket)
                        / (calibration_sec / prev_cal),
                        3,
                    )
                    # envelope of the same ratio over this invocation's
                    # min/max basket totals — quote "median [lo, hi]"
                    shared_with["normalized_ratio_band"] = [
                        round(
                            (sum(timings_min[s] for s in shared) / prev_shared_on_basket)
                            / (calibration_sec / prev_cal),
                            3,
                        ),
                        round(
                            (sum(timings_max[s] for s in shared) / prev_shared_on_basket)
                            / (calibration_sec / prev_cal),
                            3,
                        ),
                    ]
    except Exception:  # comparability aid only — never fail the bench
        pass

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration_sec": calibration_sec,
                "spread": spread,
                "shared_with_prev_total": shared_total,
                "shared_with_prev": shared_with,
            }
        )
    )


if __name__ == "__main__":
    main()
