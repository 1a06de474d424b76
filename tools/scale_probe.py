"""Scale probe: measure how the scale-path operators grow with corpus
size, on synthetic data larger than the shipped fixtures.

Generates documents/embeddings parquet at several multiples of the
sf0.1 fixture size into /tmp, runs the scale-path slugs at each size,
and reports per-size wall time + the fitted power-law exponent
(time ~ n^k). A linear operator shows k ~= 1; a quadratic one k ~= 2.

Corpus (v3): Zipf-head + Heaps-tail vocabulary AND power-law document
lengths (~Pareto, alpha ~ 1.25: median ~75 words, mean ~140, 1-2% of
docs 10-40x the median, capped at 3000) — 100 TB stress is exactly
straggler partitions from skewed docs (minhash band occupancy, LSH
bucket fill, prefix-filter block sizes), which a uniform 40-120-word
corpus never exercises.

Usage: python tools/scale_probe.py [--sizes=5000,20000,80000,320000] [--ops=a,b]
Prints one JSON line per op (per-size times, per-segment exponents,
overall exponent) and a summary table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [f"w{i:03d}" for i in range(800)]

SCALE_OPS = [
    "dedup_exact",
    "dedup_minhash",
    "simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "knn_label_vote",
    "corpus_curation_pipeline",
    "text_quality",
    "contamination_check",
    # round-3 pretraining pack (the head/tail vocab is the realistic
    # regime for the prefix filter, unlike the 31-word fixture where
    # every pair collides)
    "gopher_quality_filters",
    "passage_dedup",
    "unigram_surprisal_quality",
    "reproducible_shard_shuffle",
    "substring_dupe_coverage",
    "curriculum_order",
    "simjoin_prefix_filter",
    # round-5 additions: semdedup's whole claim is that the equi-join
    # on centroid_id stays sub-quadratic where embed_neardup blows up;
    # dsir/doc-entropy/vocab-growth are the linear-scan quality family
    "semdedup",
    "dsir_importance",
    "doc_entropy_filter",
    "vocab_growth_curve",
    # events family (probe corpus gained an events table late round 5):
    # user-keyed windows, event-time windows, sequence analytics
    "window_tumbling",
    "window_session",
    "event_transition_matrix",
    "top_event_paths",
    "funnel_conversion",
    "ab_test_zscore",
    "linreg_by_group",
    "mannwhitney_u",
    "ewma_windowed",
    "chi2_independence",
    "theilsen_trend",
    "key_skew_gini",
    "bootstrap_ci_mean",
    "benford_deviation",
    "acf_volume",
    "ks_test_2sample",
    "anova_oneway",
    "conversion_wilson_ci",
    "spearman_corr",
    "seasonal_strength_hourly",
    "cusum_drift",
    "ljung_box_white_noise",
    "effect_size_cohens_d",
    "diff_in_diff",
    # round-6 additions: the banded simhash near-dup join (candidate
    # volume must track true near-dup density, not corpus-squared),
    # SCD2 history / PIT features / CDC apply (one user-keyed
    # exchange each), purged CV (5x map-side expansion, no shuffle)
    "simhash_neardup",
    "scd2_from_changelog",
    "pit_feature_join",
    "cdc_apply_changelog",
    "purged_timeseries_cv",
    "cluster_balanced_sample",
]


def gen_tables(spark, out_dir: str, n_docs: int) -> None:
    """Deterministic synthetic corpus shaped like the fixtures: ~10% of
    docs are near-duplicates of a smaller base set (dup clusters for the
    dedup paths), 64-dim embeddings for the ANN path.

    Vocabulary models real text (Zipf head + Heaps tail): half of the
    token mass comes from an 800-word head, half from a rare tail whose
    size scales 8x the doc count — so token document-frequency has the
    common-word/rare-word split every corpus-level text algorithm sees
    in production. A fixed uniform vocab (the round-3 first cut) is
    adversarial-and-unrealistic for prefix/rarity-based filters: with
    no rare tokens, simjoin_prefix_filter's candidate set is
    near-quadratic NO MATTER the filter, which measures the corpus, not
    the operator.

    Document LENGTHS are power-law (v3): u uniform in (0, 1],
    words = 40 + min(2960, 20 * u^-0.8) — median ~75, mean ~140, a
    1-2% tail 10-40x the median. Uniform 40-120 (the round-3/4 corpus)
    cannot produce the straggler partitions that dominate 100 TB runs."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "_done")):
        _gen_events(spark, out_dir, n_docs)  # backfill on cached v3 dirs
        return
    os.makedirs(out_dir, exist_ok=True)
    tail_vocab = max(800, 8 * n_docs)
    langs = ["en", "en", "en", "de", "fr", "es", "pt"]
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            # 90% unique text seeded by own id, 10% copy text of id%97
            # (dup clusters); 40-120 words, half head / half tail
            F.when(F.col("id") % 10 == 0, F.col("id") % 97)
            .otherwise(F.col("id"))
            .alias("seed"),
        )
        .select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(1, 40 + LEAST(2960, CAST(20.0 * POW("
                "CAST(1 + abs(xxhash64(seed, 99)) % 9999 AS DOUBLE) / 10000.0, -0.8) AS INT))), "
                "i -> CASE WHEN xxhash64(seed, i, 7) % 2 = 0 "
                f"THEN element_at(array({','.join(repr(w) for w in VOCAB)}), "
                "1 + CAST(abs(xxhash64(seed, i)) % 800 AS INT)) "
                f"ELSE concat('t', CAST(abs(xxhash64(seed, i)) % {tail_vocab} AS STRING)) "
                "END), ' ')"
            ).alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in langs]),
                (F.col("doc_id") % len(langs) + 1).cast("int"),
            ).alias("lang"),
            F.lit("synthetic").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    n_vecs = max(1000, n_docs // 3)
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "CAST(CAST(xxhash64(id % 50, i) % 1000 AS DOUBLE) / 1000.0 "
            "+ CAST(xxhash64(id, i) % 100 AS DOUBLE) / 1000.0 AS FLOAT))"
        ).alias("embedding"),
        (F.col("id") % 7).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    _gen_events(spark, out_dir, n_docs)
    open(os.path.join(out_dir, "_done"), "w").write("ok")


def _gen_events(spark, out_dir: str, n_docs: int) -> None:
    """Events table (added round 5): 5 rows per doc, users scale at
    n/100 (realistic key cardinality for user-keyed exchanges),
    event-time hash-spread over 30 days; all columns xxhash64-derived
    (RNG-free). Generated separately so cached v3 corpora gain it
    without regenerating the expensive documents table."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "events.parquet")):
        return
    n_events = n_docs * 5
    n_users = max(50, n_docs // 100)
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, "
            f"CAST(pmod(xxhash64(id, 1), {30 * 24 * 3600}) AS INT))"
        ).alias("ts"),
        F.expr(f"pmod(xxhash64(id, 2), {n_users})").alias("user_id"),
        F.expr(
            "element_at(array('view','click','purchase','signup','error'), "
            "CAST(pmod(xxhash64(id, 3), 5) AS INT) + 1)"
        ).alias("event_type"),
        F.expr(
            "CAST(CAST(pmod(xxhash64(id, 4), 40000) AS DOUBLE) / 100.0 AS DOUBLE)"
        ).alias("value"),
        F.lit('{}').alias("props"),
    )
    ev.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))


def measure_recall(spark, sf_dir: str, slug: str, n_queries: int = 500) -> dict:
    """Recall of an ANN slug vs EXACT cosine top-10, on a deterministic
    sample of query vectors (round-5 verdict item 9: the hot-bucket
    cap's 'members are interchangeable near-neighbors' argument must be
    a measured number at the sizes where the cap actually engages,
    >50k vectors). Exact ground truth = brute-force sample x corpus
    (n_queries * n_vec int64 dots — bounded by the sample, not n^2)."""
    from pyspark.sql import functions as F

    from magictables_spark.plans.queries import REGISTRY

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vec = emb.count()
    step = max(1, n_vec // n_queries)
    quant = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("q"),
    )
    qs = quant.filter(F.col("vec_id") % step == 0).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    dot = "aggregate(zip_with(qq, q, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)"
    nrm = "aggregate(zip_with({0}, {0}, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)"
    scored = (
        F.broadcast(qs)
        .join(quant, F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cos",
            F.expr(dot).cast("double")
            / (F.sqrt(F.expr(nrm.format("qq")).cast("double")) * F.sqrt(F.expr(nrm.format("q")).cast("double"))),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    approx = REGISTRY[slug].fn(spark, sf_dir).select("query_id", "neighbor_id", "cosine")
    sampled = approx.join(F.broadcast(qs.select("query_id")), "query_id")
    hits = exact.join(sampled, ["query_id", "neighbor_id"]).count()
    total = exact.count()
    # QUALITY ratio: cosine mass of the returned top-10 vs the exact
    # top-10, per query. Under mega-cluster corpora (thousands of
    # near-interchangeable neighbors) exact-ID recall@10 collapses by
    # construction while the returned neighbors are just as near —
    # this ratio is the metric that distinguishes "worse neighbors"
    # from "different but equally-near neighbors".
    a_mass = sampled.groupBy("query_id").agg(F.sum("cosine").alias("am"))
    exact_mass = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy("query_id")
        .agg(F.sum("cos").alias("em"))
    )
    ratio = (
        exact_mass.join(a_mass, "query_id", "left")  # no-candidate queries count as 0
        .select(F.avg(F.coalesce(F.col("am"), F.lit(0.0)) / F.col("em")).alias("r"))
        .collect()[0]["r"]
    )
    return {
        "slug": slug,
        "n_vec": n_vec,
        "n_queries": total // 10 if total else 0,
        "recall": round(hits / total, 4) if total else None,
        "quality_ratio": round(float(ratio), 4) if ratio is not None else None,
    }


def main() -> None:
    sizes = [5000, 20000, 80000, 320000]
    ops = SCALE_OPS
    recall_mode = False
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--ops"):
            ops = a.split("=", 1)[1].split(",")
        elif a == "--recall":
            recall_mode = True

    from magictables_spark.plans.queries import REGISTRY
    from magictables_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for n in sizes:
        d = f"/tmp/mts_scale_v3_{n}"  # v3: power-law doc lengths + Zipf/Heaps vocab
        gen_tables(spark, d, n)
        dirs[n] = d

    if recall_mode:
        for n, d in dirs.items():
            for slug in ops:
                r = measure_recall(spark, d, slug)
                print(json.dumps({"size": n, **r}), flush=True)
        return

    results = {}
    for slug in ops:
        fn = REGISTRY[slug].fn
        per_size = {}
        for n, d in dirs.items():
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(2):
                t = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t)
            per_size[n] = round(best, 3)
        lo, hi = min(sizes), max(sizes)
        if hi == lo:  # single-size smoke run: no exponent to fit
            results[slug] = {"times": per_size, "exponent": None, "segments": []}
            print(json.dumps({"op": slug, **results[slug]}), flush=True)
            continue
        k = math.log(per_size[hi] / per_size[lo]) / math.log(hi / lo)
        # per-segment exponents expose a knee the overall fit averages
        # away (the whole point of the 4th size)
        segs = [
            round(
                math.log(per_size[b] / per_size[a]) / math.log(b / a), 2
            )
            for a, b in zip(sizes, sizes[1:])
        ]
        results[slug] = {"times": per_size, "exponent": round(k, 2), "segments": segs}
        print(json.dumps({"op": slug, **results[slug]}), flush=True)

    print("\nop                          " + "".join(f"{n:>10}" for n in sizes) + "   n^k   segments")
    for slug, r in results.items():
        row = "".join(f"{r['times'][n]:>10.2f}" for n in sizes)
        ek = "  n/a" if r["exponent"] is None else f"{r['exponent']:.2f}"
        print(f"{slug:<28}{row}   {ek}   {r['segments']}")


if __name__ == "__main__":
    main()
