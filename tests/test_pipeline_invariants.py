"""Cross-operator invariants for the pipeline/analytics packs.

The oracle gate proves Spark == DuckDB; these prove both are RIGHT —
conservation, monotonicity, and coverage laws that hold for any input,
checked on the real fixtures (SURVEY §5.2 test strategy).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from magictables_spark.plans.queries import REGISTRY


def _run(spark, sf_dir, slug):
    return REGISTRY[slug].fn(spark, sf_dir)


def test_funnel_is_monotone(spark, sf_dir):
    row = _run(spark, sf_dir, "funnel_conversion").collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_full_funnel >= 0


def test_curation_funnel_stages_shrink(spark, sf_dir):
    counts = {r.stage: r.n_docs for r in _run(spark, sf_dir, "corpus_curation_pipeline").collect()}
    ordered = [counts[k] for k in sorted(counts)]
    assert ordered == sorted(ordered, reverse=True), counts
    assert ordered[-1] > 0  # the pipeline must let something through


def test_chunking_covers_and_overlaps(spark, sf_dir):
    from magictables_spark.plans.llmdata_pack import CHUNK, STRIDE

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 25 == 0)
        .collect()
    }
    chunks = _run(spark, sf_dir, "doc_chunking").collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split(" ")
    for doc_id, toks in docs.items():
        got = by_doc[doc_id]
        # chunk i must be exactly the stride-window slice of the source
        for i, ctoks in got.items():
            assert ctoks == toks[i * STRIDE : i * STRIDE + CHUNK], (doc_id, i)
        # every token position is covered by at least one chunk
        covered = set()
        for i in got:
            covered.update(range(i * STRIDE, min(i * STRIDE + CHUNK, len(toks))))
        assert covered == set(range(len(toks))), doc_id


def test_packing_conserves_tokens(spark, sf_dir):
    bins = _run(spark, sf_dir, "sequence_packing").collect()
    total_binned = sum(r.bin_tokens for r in bins)
    total_actual = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_binned == total_actual
    # bin ids are contiguous from 0
    ids = sorted(r.bin_id for r in bins)
    assert ids == list(range(len(ids)))


def test_contamination_bounded(spark, sf_dir):
    row = _run(spark, sf_dir, "contamination_check").collect()[0]
    assert 0 <= row.n_contaminated <= row.n_train_docs


def test_knn_predicts_observed_labels(spark, sf_dir):
    labels = {
        r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("label").distinct().collect()
    }
    preds = _run(spark, sf_dir, "knn_label_vote").collect()
    assert preds and all(r.predicted_label in labels for r in preds)
    assert all(1 <= r.n_votes <= 5 for r in preds)


def test_interpolation_brackets_and_preserves_observed(spark, sf_dir):
    interp = {
        (r.event_type, r.win_start): r
        for r in _run(spark, sf_dir, "interpolate_linear").collect()
    }
    # observed hours carry their exact sums; gaps lie within bracketing
    # values per key (linear interpolation never overshoots)
    by_key: dict[str, list] = {}
    for (et, ws), r in sorted(interp.items()):
        by_key.setdefault(et, []).append(r)
    for et, rows in by_key.items():
        observed = [r.interp_value for r in rows if r.n_events > 0]
        lo, hi = min(observed), max(observed)
        for r in rows:
            if r.n_events == 0 and r.interp_value is not None:
                assert lo - 1e-9 <= r.interp_value <= hi + 1e-9, (et, r)


def test_streaks_within_activity_span(spark, sf_dir):
    from magictables_spark.plans.catalog import load_table

    streaks = _run(spark, sf_dir, "gaps_islands_streaks").collect()
    spans = {
        r.user_id: (r.lo, r.hi)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi"))
        .collect()
    }
    assert streaks
    for r in streaks:
        lo, hi = spans[r.user_id]
        assert 1 <= r.streak_days <= (hi - lo).days + 1


def test_hll_rollup_close_to_exact(spark, sf_dir):
    from magictables_spark.plans.catalog import load_table

    approx = {
        r.week: r.approx_weekly_users
        for r in _run(spark, sf_dir, "hll_sketch_rollup").collect()
    }
    exact = {
        r.week: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for wk, n in exact.items():
        assert abs(approx[wk] - n) <= max(1, 0.05 * n), (wk, approx[wk], n)


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    rows = _run(spark, sf_dir, "kmeans_lloyd").collect()
    assert len(rows) == 8
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == total
    assert all(r.inertia >= 0 for r in rows)
    # clustering must beat the degenerate single-cluster baseline:
    # total inertia < inertia of everything assigned to one mean is
    # implied by Lloyd monotonicity; spot-check it is finite and the
    # biggest cluster does not swallow everything
    assert max(r.n_members for r in rows) < total


def test_sequence_packing_sharded_parity_and_plan(spark, sf_dir):
    """The sharded packer must (a) conserve tokens and docs vs the
    global packer, (b) never overflow a bin by more than one document,
    and (c) run its window behind a MULTI-partition hash exchange —
    never the single-partition global sort of the exact variant."""
    sharded = _run(spark, sf_dir, "sequence_packing_sharded")
    rows = sharded.collect()
    glob = _run(spark, sf_dir, "sequence_packing").collect()
    assert sum(r.bin_tokens for r in rows) == sum(r.bin_tokens for r in glob)
    assert sum(r.n_docs for r in rows) == sum(r.n_docs for r in glob)
    assert {r.shard for r in rows} == set(range(8))

    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(shard" in plan, plan[:2000]


def test_quadratic_guard_fast_fails(spark, sf_dir):
    """The exact all-pairs baselines refuse oversized inputs with a
    pointer to their linear-scale twin; fixture-size inputs pass."""
    import pytest

    from magictables_spark.plans import registry
    from magictables_spark.plans.registry import QuadraticInputError, guard_quadratic

    big = spark.range(0, 100)
    with pytest.raises(QuadraticInputError, match="ann_lsh_topk"):
        guard_quadratic(big, "embed_neardup", "ann_lsh_topk", limit=10)
    # passing the guard returns the input unchanged
    assert guard_quadratic(big, "x", "y", limit=1000).count() == 100

    # the registered ops consult the module default at call time
    prev = registry.QUADRATIC_GUARD_ROWS
    registry.QUADRATIC_GUARD_ROWS = 3
    try:
        for slug, twin in [
            ("embed_neardup", "ann_lsh_topk"),
            ("dedup_ngram_jaccard", "dedup_minhash"),
            ("dedup_fuzzy_levenshtein", "dedup_minhash"),
        ]:
            with pytest.raises(QuadraticInputError, match=twin):
                _run(spark, sf_dir, slug).collect()
    finally:
        registry.QUADRATIC_GUARD_ROWS = prev
