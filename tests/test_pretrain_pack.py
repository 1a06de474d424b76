"""Pretraining-curation pack gates (plans/pretrain_pack.py) beyond the
oracle parity in test_oracle_parity.py: algebraic invariants the SQL
twin can't express, and the write-side Z-order clustering claim."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from magictables_spark.plans.queries import REGISTRY


def test_gopher_fractions_bounded(spark, sf_dir):
    rows = REGISTRY["gopher_quality_filters"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_2gram_frac < 1.0
        assert 0.0 < r.top_2gram_frac <= 1.0
        # a doc's most frequent 2-gram share can't be below uniform
        assert r.top_2gram_frac >= 1.0 / max(r.n_tokens - 1, 1)
        assert r.mean_word_len > 0


def test_passage_dedup_conservation(spark, sf_dir):
    """Global invariants: every passage survives exactly once corpus-wide
    per distinct text; per-doc kept <= total; total kept == distinct
    passage count of the corpus."""
    out = REGISTRY["passage_dedup"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(0 <= r.n_kept <= r.n_passages for r in rows)
    kept_total = sum(r.n_kept for r in rows)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    distinct_passages = (
        docs.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(0, CAST(ceil(size(split(text, ' ')) / 8.0) AS INT) - 1),"
                    " i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))"
                )
            ).alias("pos", "passage")
        )
        .select("passage")
        .distinct()
        .count()
    )
    assert kept_total == distinct_passages


def test_simjoin_prefix_filter_no_false_negatives(spark, sf_dir):
    """The point of prefix filtering: the candidate prune loses NOTHING.
    Compare against a brute-force exact Jaccard join on the same data."""
    out = {
        (r.id_a, r.id_b): r.jacc
        for r in REGISTRY["simjoin_prefix_filter"].fn(spark, sf_dir).collect()
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.array_sort(F.array_distinct(F.split("text", " "))).alias("ts")
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    brute = {
        (r.id_a, r.id_b): r.jacc
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn(
                "jacc",
                inter.cast("double") / (F.size("ts_a") + F.size("ts_b") - inter),
            )
            .filter(F.col("jacc") >= 0.9)
            .collect()
        )
    }
    assert out == brute


def test_mixture_rates_move_counts(spark, sf_dir):
    """Sampling keeps between 0 and n_docs per source, and the realized
    rate tracks the assigned weight (binomial, n=25 per source: allow a
    wide but informative band)."""
    rows = REGISTRY["mixture_weighted_sources"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_docs
        assert abs(r.n_sampled / r.n_docs - r.weight) < 0.45
    # weights must actually differ across sources (hash-derived)
    assert len({r.weight for r in rows}) > 1


def test_skew_salted_join_plan_spreads_key(spark, sf_dir):
    """The salted plan joins on (custkey, salt) through a SHUFFLED join:
    the join keys in the physical plan must include the salt column, and
    the join must not be a broadcast (a broadcast hash join has no
    reducer for the salt to spread work across)."""
    plan = (
        REGISTRY["skew_salted_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "salt" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_zorder_write_clusters_both_columns(spark, sf_dir, tmp_path):
    """Writing range-partitioned + sorted by zkey gives every output
    file a tighter per-file envelope on BOTH key columns than the
    unclustered layout: the max per-file partkey-range of the z-ordered
    files must be strictly below the full-table range."""
    from magictables_spark.plans.pretrain_pack import _morton_fragment

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        "l_suppkey",
        F.expr(_morton_fragment("(l_partkey % 256)", "(l_suppkey % 256)", "spark")).alias("zkey"),
    )
    dest = str(tmp_path / "zordered")
    li.repartitionByRange(8, "zkey").sortWithinPartitions("zkey").write.parquet(dest)

    per_file = (
        spark.read.parquet(dest)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max(F.col("l_partkey") % 256) - F.min(F.col("l_partkey") % 256)).alias(
                "p_range"
            ),
            (F.max("zkey") - F.min("zkey")).alias("z_range"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    full_z = 256 * 256
    # every file covers a narrow slice of z-space vs the full curve
    assert all(r.z_range < full_z / 2 for r in per_file)
    # ... and that z-slice constrains the FIRST underlying column too:
    # most files must span well under the full 0-255 partkey%256 range
    # (a file straddling a range boundary may be looser, so assert the
    # median, not the max)
    p_ranges = sorted(r.p_range for r in per_file)
    assert p_ranges[len(p_ranges) // 2] < 255


@pytest.mark.parametrize(
    "slug",
    [
        "gopher_quality_filters",
        "passage_dedup",
        "simjoin_prefix_filter",
        "mixture_weighted_sources",
        "skew_salted_join",
        "zorder_cluster_key",
    ],
)
def test_pretrain_pack_no_python_udfs(spark, sf_dir, slug):
    """Hot paths stay JVM-side: no BatchEvalPython / ArrowEvalPython."""
    plan = REGISTRY[slug].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_surprisal_invariants(spark, sf_dir):
    """Surprisal sanity: rare tokens carry more bits than common ones;
    per-doc means live in [0, 60]; buckets are the three labels and the
    middle band contains the corpus mean."""
    out = REGISTRY["unigram_surprisal_quality"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    assert {r.lm_bucket for r in rows} <= {"head", "middle", "tail"}
    for r in rows:
        assert 0.0 <= r.mean_bits <= 60.0
        assert r.n_tokens > 0
    # token-weighted corpus mean must land in the middle bucket band
    tot_bits = sum(r.mean_bits * r.n_tokens for r in rows)
    tot_toks = sum(r.n_tokens for r in rows)
    mean = tot_bits / tot_toks
    mids = [r for r in rows if r.lm_bucket == "middle"]
    assert any(abs(r.mean_bits - mean) <= 1.0 for r in mids)


def test_reproducible_shard_shuffle_is_permutation(spark, sf_dir):
    """global_pos is injective, shards are balanced-ish, and the order
    is stable across invocations (pure hash arithmetic, no RNG)."""
    fn = REGISTRY["reproducible_shard_shuffle"].fn
    a = {r.doc_id: r.global_pos for r in fn(spark, sf_dir).collect()}
    b = {r.doc_id: r.global_pos for r in fn(spark, sf_dir).collect()}
    assert a == b  # restart-stable
    assert len(set(a.values())) == len(a)  # injective: a true ordering
    shards = [r.shard for r in fn(spark, sf_dir).collect()]
    assert 0 <= min(shards) and max(shards) < 64
    # no empty-shard pathology at fixture scale: >= 1/4 of shards hit
    assert len(set(shards)) >= 16


def test_substring_dupe_coverage_semantics(spark, sf_dir, tmp_path):
    """Constructed corpus: doc B embeds a 24-token span of doc A at an
    UNALIGNED offset; doc C is unrelated. A and B must report overlap
    coverage >= the shared-window span, C exactly 0."""
    import os

    # 40 shared tokens; token 's20' hashes to 0 mod 8 (precomputed), so
    # BOTH docs anchor a full window at it wherever the span sits —
    # phase-independence is exactly what content-defined anchoring buys
    shared = " ".join(f"s{i}" for i in range(40))
    rows = [
        (0, "a0 a1 a2 " + shared + " a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 a13"),
        (1, "b0 " + shared + " b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 b13 b14"),
        (2, " ".join(f"c{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn("n_chars", F.length("text"))
    d = os.path.join(tmp_path, "corpus")
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["substring_dupe_coverage"].fn(spark, d).collect()
    }
    assert out[2].dup_tokens == 0 and out[2].dup_frac == 0.0
    # the 24-token shared span contains at least one aligned 16-window
    # pair in both docs regardless of offset (stride 8 < 24 - 16)
    assert out[0].dup_tokens >= 16
    assert out[1].dup_tokens >= 16
    assert 0 < out[0].dup_frac < 1 and 0 < out[1].dup_frac < 1


def test_curriculum_order_total_and_deterministic(spark, sf_dir):
    """(bucket_order, within_pos) is a total order (injective within
    each bucket via the shuffle's injective within_pos), heads precede
    tails, and the order is restart-stable."""
    fn = REGISTRY["curriculum_order"].fn
    rows = fn(spark, sf_dir).collect()
    again = fn(spark, sf_dir).collect()
    key = lambda r: (r.bucket_order, r.within_pos)  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
    assert len({key(r) for r in rows}) == len(rows)  # total order
    by_bucket = {r.lm_bucket: r.bucket_order for r in rows}
    assert by_bucket.get("head", 0) == 0 and by_bucket.get("tail", 2) == 2
    assert {r.lm_bucket for r in rows} <= {"head", "middle", "tail"}


def test_dsir_selected_enriches_target_language(spark, sf_dir, duck):
    """The DSIR acceptance rule (weight_bits > 0) must enrich the
    target distribution: selected docs are majority-English and the
    selected share of English exceeds the selected share of
    non-English — the monotonicity DSIR exists to provide."""
    from magictables_spark.plans.queries import REGISTRY

    out = REGISTRY["dsir_importance"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    joined = out.join(docs, "doc_id").collect()
    en_sel = sum(1 for r in joined if r.lang == "en" and r.selected)
    en_all = sum(1 for r in joined if r.lang == "en")
    other_sel = sum(1 for r in joined if r.lang != "en" and r.selected)
    other_all = sum(1 for r in joined if r.lang != "en")
    assert en_all and other_all
    assert en_sel / en_all > other_sel / other_all, (
        f"selected rate en={en_sel}/{en_all} vs other={other_sel}/{other_all}"
    )


def test_bpe_train_merges_matches_pure_python_reference(spark, sf_dir):
    """Re-derive the six learned merges with a from-scratch Python BPE
    trainer (dict-of-tuples, no Spark, no SQL) over the same
    word-frequency dictionary — the merge table, including counts and
    greedy non-overlapping merge semantics, must agree exactly."""
    import os
    from collections import Counter

    import duckdb

    from magictables_spark.plans.queries import REGISTRY

    got = [tuple(r) for r in REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()]

    con = duckdb.connect()
    wf = con.sql(
        "SELECT word, COUNT(*) c FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS word FROM read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')) "
        "WHERE word <> '' GROUP BY word"
    ).fetchall()
    vocab = {tuple(w): c for w, c in wf}

    def greedy_merge(syms, left, right):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    want = []
    for rank in range(1, 7):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, left, right, left + right, cnt))
        vocab = {greedy_merge(s, left, right): c for s, c in vocab.items()}
        # distinct words can collide after a merge only if sequences
        # equal — they can't (merge is injective on distinct words)
    assert got == want


def test_bpe_greedy_fold_property_random_sequences(spark):
    """The Spark aggregate() greedy-merge fold must equal the
    textbook left-to-right non-overlapping merge on random sequences —
    including the left==right run case ('aaaa' -> [aa, aa], 'aaa' ->
    [aa, a]) where overlapping candidates make naive approaches wrong."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    cases = [
        ["a", "a", "a"],
        ["a", "a", "a", "a"],
        ["a", "b", "a", "b"],
        ["b", "a", "a", "b", "a"],
    ] + [
        [rng.choice("ab") for _ in range(rng.randint(1, 12))] for _ in range(60)
    ]

    def greedy(syms, left, right):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    fold = """
        aggregate(
          syms,
          struct(CAST(array() AS array<string>) AS out,
                 CAST(NULL AS string) AS pend),
          (acc, s) -> CASE
            WHEN acc.pend IS NULL THEN struct(acc.out AS out, s AS pend)
            WHEN acc.pend = _L AND s = _R THEN
              struct(concat(acc.out, array(concat(_L, _R))) AS out,
                     CAST(NULL AS string) AS pend)
            ELSE struct(concat(acc.out, array(acc.pend)) AS out,
                        s AS pend) END,
          acc -> CASE WHEN acc.pend IS NULL THEN acc.out
                      ELSE concat(acc.out, array(acc.pend)) END)
    """
    for left, right in (("a", "a"), ("a", "b"), ("b", "a")):
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cases)], "i int, syms array<string>"
        )
        got = {
            r.i: list(r.merged)
            for r in df.withColumn("_L", F.lit(left))
            .withColumn("_R", F.lit(right))
            .withColumn("merged", F.expr(fold))
            .collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == greedy(c, left, right), (c, left, right)
