"""Pretraining-corpus curation pack (round 3): the document-level
quality / dedup / mixing operators a 100 TB training-data pipeline
runs between raw crawl and tokenizer, each with a full DuckDB oracle.

- ``gopher_quality_filters`` — Gopher-style repetition rules (dup-2gram
  fraction, top-2gram fraction, mean word length) and a keep flag.
- ``passage_dedup``          — corpus-global exact passage dedup with
  first-occurrence wins and per-doc text reassembly (the
  RefinedWeb/CCNet line-dedup shape).
- ``simjoin_prefix_filter``  — EXACT threshold-Jaccard similarity join
  via prefix filtering (PPJoin-style blocking): unlike minhash banding
  this has zero false negatives, at the cost of a wider candidate set.
- ``mixture_weighted_sources`` — deterministic hash-threshold sampling
  with per-source rates (the "data mixture" step that reweights crawl /
  books / code before training).
- ``skew_salted_join``       — the salting pattern as a registered,
  oracle-checked query: fact-side md5 salt + dim-side salt explosion,
  result provably identical to the plain join.
- ``zorder_cluster_key``     — 16-bit two-column Morton (Z-order) key
  in pure integer arithmetic, the layout key behind multi-column
  data-skipping writes.

Reference parity: the reference has no corpus-curation surface at all
(its scope ends at source->Polars handoff, /root/reference/magictables/
sources.py); this pack is part of the mandated large-scale-pipeline
extension (SURVEY.md §2.C).

Determinism: every fraction is CAST(int AS DOUBLE)/int on identical
integers (registry rule 4); every hash is md5-derived via the shared
60-bit fragments, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from magictables_spark.plans.catalog import spread, spread_by
from magictables_spark.plans.registry import _t, q
from magictables_spark.plans.similarity import _h60_duck, _h60_spark


@q(
    "gopher_quality_filters",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             length(text) - (len(string_split(text, ' ')) - 1) AS n_letters
      FROM documents
    ), g AS (
      SELECT doc_id, len(toks) AS n_tokens, n_letters,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM d WHERE len(toks) >= 2
    ), gc AS (
      SELECT doc_id, n_tokens, n_letters, gram, COUNT(*) AS c
      FROM g GROUP BY ALL
    ), per AS (
      SELECT doc_id, n_tokens, n_letters,
             CAST(SUM(c) AS BIGINT) AS total_2grams,
             COUNT(*) AS distinct_2grams,
             MAX(c) AS top_2gram_count
      FROM gc GROUP BY ALL
    )
    SELECT doc_id, n_tokens,
           1.0 - CAST(distinct_2grams AS DOUBLE) / total_2grams AS dup_2gram_frac,
           CAST(top_2gram_count AS DOUBLE) / total_2grams AS top_2gram_frac,
           CAST(n_letters AS DOUBLE) / n_tokens AS mean_word_len,
           (1.0 - CAST(distinct_2grams AS DOUBLE) / total_2grams < 0.6
            AND CAST(top_2gram_count AS DOUBLE) / total_2grams < 0.2
            AND CAST(n_letters AS DOUBLE) / n_tokens BETWEEN 2.0 AND 10.0)
             AS keep
    FROM per
    """,
    doc="Gopher-rule repetition filters per document: duplicate-2gram "
    "fraction, most-frequent-2gram share, mean word length, and the "
    "combined keep flag (Rae et al. 2021 table A1 shape; thresholds "
    "tuned to the synthetic corpus). One explode + two partial-agg "
    "shuffles keyed by doc_id — embarrassingly parallel, no global "
    "state, 100 TB-safe. Fractions are int/int divisions on identical "
    "integers so both engines emit bit-identical doubles.",
    tags=("text", "quality", "pretrain"),
)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-robin spread before the split + 2-gram explode: the fixture
    # corpus arrives as one parquet split, so the whole per-doc map
    # chain would otherwise run on one core (dedup_minhash precedent;
    # at scale the same exchange evens out skewed file layouts)
    d = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
            (F.length("text") - (F.size(F.split(F.col("text"), " ")) - 1)).alias("n_letters"),
        )
    )
    g = (
        d.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            "n_letters",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(toks[i - 1], ' ', toks[i]))"
                )
            ).alias("gram"),
        )
    )
    gc = g.groupBy("doc_id", "n_tokens", "n_letters", "gram").agg(F.count("*").alias("c"))
    per = gc.groupBy("doc_id", "n_tokens", "n_letters").agg(
        F.sum("c").alias("total_2grams"),
        F.count("*").alias("distinct_2grams"),
        F.max("c").alias("top_2gram_count"),
    )
    dup = F.lit(1.0) - F.col("distinct_2grams").cast("double") / F.col("total_2grams")
    top = F.col("top_2gram_count").cast("double") / F.col("total_2grams")
    mwl = F.col("n_letters").cast("double") / F.col("n_tokens")
    return per.select(
        "doc_id",
        "n_tokens",
        dup.alias("dup_2gram_frac"),
        top.alias("top_2gram_frac"),
        mwl.alias("mean_word_len"),
        (
            (dup < 0.6) & (top < 0.2) & (mwl >= 2.0) & (mwl <= 10.0)
        ).alias("keep"),
    )


_PASSAGE = 8  # tokens per passage


@q(
    "passage_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(ceil(len(string_split(text, ' ')) / {_PASSAGE}.0) AS INT) AS np
      FROM documents
    ), p0 AS (
      SELECT doc_id, np AS n_passages,
             unnest(list_transform(range(0, np),
               i -> {{'pos': i,
                      'passage': array_to_string(
                        toks[i * {_PASSAGE} + 1 : i * {_PASSAGE} + {_PASSAGE}], ' ')}}))
               AS s
      FROM d
    ), p AS (
      SELECT doc_id, n_passages, s.pos AS pos, s.passage AS passage FROM p0
    ), kept AS (
      SELECT doc_id, n_passages, pos, passage,
             row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
      FROM p
    ), agg AS (
      SELECT doc_id, any_value(n_passages) AS n_passages,
             COUNT(*) AS n_kept,
             string_agg(passage, ' ' ORDER BY pos) AS dedup_text
      FROM kept WHERE rn = 1 GROUP BY doc_id
    )
    SELECT d.doc_id,
           d.np AS n_passages,
           COALESCE(agg.n_kept, 0) AS n_kept,
           COALESCE(agg.dedup_text, '') AS dedup_text
    FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
    doc=f"Corpus-global exact passage dedup ({_PASSAGE}-token chunks, "
    "first occurrence by (doc_id, pos) wins) with per-doc reassembly — "
    "the line-level dedup step of CCNet/RefinedWeb pipelines, on a "
    "corpus whose text has no newlines. One explode, one "
    "partition-by-passage window (hash shuffle on passage text — "
    "uniformly distributed, no skew key), one doc_id agg. At 100 TB "
    "the passage hash space is the shuffle key; replacing the full "
    "passage string with its md5 before the exchange halves shuffle "
    "bytes (done here: window partitions on the md5, ties impossible "
    "since md5 collisions aren't).",
    tags=("text", "dedup", "pretrain", "scale"),
)
def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
    ).withColumn("np", F.expr(f"CAST(ceil(size(toks) / {_PASSAGE}.0) AS INT)"))
    # NOT spread (tried, reverted): the passage explode only re-slices
    # the token array (no hashing per row) and the md5-keyed window
    # below shuffles its output anyway, so the extra exchange measured
    # a warm-median LOSS at both scales (0.63 -> 1.33 s at sf0.1,
    # 1.65 -> 1.89 s at sf1, zero-steal windows)
    p = d.select(
        "doc_id",
        F.col("np").alias("n_passages"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, np - 1),"
                f" i -> array_join(slice(toks, i * {_PASSAGE} + 1, {_PASSAGE}), ' '))"
            )
        ).alias("pos", "passage"),
    )
    # shuffle on the md5 of the passage, not the passage text itself —
    # same partitioning (md5 is injective in practice), smaller exchange
    w = Window.partitionBy(F.md5("passage")).orderBy("doc_id", "pos")
    kept = p.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, passage))), s -> s.passage)"),
            " ",
        ).alias("dedup_text"),
    )
    return (
        d.select("doc_id", F.col("np").alias("n_passages"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_passages",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


_TAU = 0.9  # Jaccard threshold for the exact similarity join


@q(
    "simjoin_prefix_filter",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_transform(list_sort(list_distinct(string_split(text, ' '))),
                            t -> {_h60_duck('t')}) AS ts
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS jacc
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
            / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= {_TAU}
    """,
    doc=f"EXACT token-set Jaccard >= {_TAU} similarity self-join via "
    "prefix filtering (PPJoin blocking): tokens are globally ranked "
    "rarest-first by document frequency, each doc exposes only its "
    "first m - ceil(tau*m) + 1 ranked tokens, and any qualifying pair "
    "provably shares a prefix token — zero false negatives, unlike "
    "minhash banding. The PPJoin length filter rides in the join "
    "condition (tau <= min(m)/max(m), exact 9/10 integer arithmetic), "
    "pruning size-incompatible pairs before they exist. Candidates "
    "then verify by intersecting md5-derived int64 token sets (8-byte "
    "fixed-width compares; the dedup_minhash trick — measured ~3x "
    "over string-array intersects on the adversarial fixture, "
    "identical result modulo negligible 60-bit collisions, and the "
    "oracle hashes identically). The oracle is the "
    "brute-force all-pairs join: identical result set by the "
    "prefix-filter theorem. The token-rank "
    "dim is vocab-sized (small even at 100 TB corpora), broadcast to "
    "the explode; the candidate join shuffles only (prefix-token, "
    "doc_id) pairs. This synthetic corpus is adversarial for the "
    "filter (31-token vocab, every token common), so the candidate "
    "set is near-quadratic HERE; on Zipf-vocabulary text the prefix "
    "prune is the standard exact-simjoin scale path.",
    tags=("text", "dedup", "similarity", "pretrain", "scale"),
)
def simjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_sort(F.array_distinct(F.split(F.col("text"), " "))).alias("ts")
    )
    tok = docs.select("doc_id", F.explode("ts").alias("token"))
    # global token ranking, rarest first (vocab-sized: window over the
    # token dim, not the corpus)
    df_rank = (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .withColumn("rank", F.row_number().over(Window.orderBy("df", "token")))
        .select("token", "rank")
    )
    ranked = (
        tok.join(F.broadcast(df_rank), "token")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("rank")).alias("ranks"))
        .withColumn("m", F.size("ranks"))
        .withColumn(
            "prefix",
            F.expr(f"slice(ranks, 1, m - CAST(ceil({_TAU} * m) AS INT) + 1)"),
        )
    )
    # PPJoin length filter: jacc >= tau implies |A n B| <= min(m) and
    # |A u B| >= max(m), so tau <= min(m)/max(m) — size-incompatible
    # pairs are pruned INSIDE the join condition (exact arithmetic,
    # tau = 9/10). PPJoin positional filter rides alongside: a pair
    # matching at 1-based prefix positions (pa, pb) can overlap at most
    # 1 + min(ma - pa, mb - pb) tokens, and jacc >= tau needs overlap
    # >= ceil(tau/(1+tau) * (ma+mb)) = ceil(9(ma+mb)/19); integer form
    # 19*(1 + min(..)) >= 9*(ma+mb). Both provably lossless (the
    # brute-force oracle is the proof), both cut the candidate set
    # before it exists — on the adversarial 31-word fixture the
    # positional filter alone halves verify volume.
    # PPJoin+ suffix-style filter (round-7 verdict item 6): an 8-bucket
    # histogram of each doc's token RANKS (rank mod 8) rides next to the
    # prefix rows; for any pair, true overlap <= sum_k min(ha_k, hb_k),
    # so 19 * min-sum < 9 * (ma + mb) disqualifies losslessly — the
    # same overlap-upper-bound idea as PPJoin+'s recursive suffix
    # partition, flattened to a fixed-width sketch the join condition
    # can evaluate codegen-side (8 unrolled least() terms, no HOF).
    # On the adversarial 31-word fixture this bound sees WHICH tokens
    # differ (buckets), not just how many, and kills most same-length
    # candidates the length+positional filters admit.
    # Since round 11 the 8-bucket rank histogram is replaced by a
    # 1024-bit one-hash Bloom bitmap of the rank set (16 int64 words):
    # sum_i bit_count(wa_i & wb_i) >= |A n B| always, and with rank
    # sets far smaller than 1024 bits the bound is collision-free —
    # i.e. EXACT overlap — so the join condition itself reduces the
    # candidate OUTPUT to essentially the qualifying pairs. That
    # matters at sf10: the histogram-filtered join still emitted
    # 4.4e8 candidate rows into dropDuplicates; the bitmap version
    # emits ~the final pair set.
    wmask = F.expr(
        "aggregate(ranks, array_repeat(CAST(0 AS BIGINT), 16), "
        "(acc, x) -> transform(acc, (wd, i) -> "
        "  CASE WHEN CAST(pmod(x, 1024) / 64 AS INT) = i "
        "       THEN wd | shiftleft(CAST(1 AS BIGINT), "
        "                           CAST(pmod(x, 1024) % 64 AS INT)) "
        "       ELSE wd END))"
    ).alias("w")
    pref = ranked.select(
        "doc_id", "m", wmask, F.posexplode("prefix").alias("pos0", "r")
    ).select(
        "doc_id", "m", "w", (F.col("pos0") + 1).alias("pa"), "r"
    )
    andpop = None
    for k in range(16):
        term = F.expr(f"bit_count(element_at(a.w, {k + 1}) & element_at(b.w, {k + 1}))")
        andpop = term if andpop is None else andpop + term
    # Output-quadratic skew guard (round-11 sf10 finding): the join key
    # is the prefix-token RANK, so the key space is vocab-bounded. On
    # this adversarial 31-word fixture that means <= 31 shuffle
    # partitions carry ALL candidate pairs, and AQE's skew-join split
    # never fires — its thresholds look at shuffle INPUT bytes (~38 MB
    # here), not at the quadratic pair OUTPUT a small bucket expands
    # into: at sf10 one rank bucket ran 7/8 of the join on ONE core.
    # When the rank space is too small to spread (vocab < 4x
    # parallelism), salt the join: the left side keeps one
    # deterministic bucket (doc_id % B), the right side replicates B
    # ways, and each rank bucket fans out B-fold — same pair set, same
    # enumeration count, B-way tail parallelism. Measured trade at sf1:
    # ~2x wall from the 33x right-side row inflation, vs an UNBOUNDED
    # serial tail without it (at sf10 one rank bucket ran on one core
    # for 55+ minutes before this guard). A symmetric block-salt
    # (both sides xB, B^2 partitions) measured WORSE here (371 s vs
    # 203 s at sf1), so the simple shape stays. Zipf-vocabulary corpora
    # (vocab >> cores) skip the replication entirely — B stays 1 and
    # the plan is unchanged at 100 TB.
    n_ranks = df_rank.count()  # vocab-sized driver roundtrip (bounded)
    par = spark.sparkContext.defaultParallelism
    B = 32 if n_ranks < 4 * par else 1
    if B > 1:
        # In the vocab-bounded regime the prefix filter cannot block:
        # nearly every doc shares prefix ranks with nearly every other,
        # so the candidate ENUMERATION is Theta(n_docs^2 / n_ranks) no
        # matter how well the pair filters prune the OUTPUT (measured
        # at sf10: ~1e11 enumerated pairs, heap-fatal). That is the
        # exact-baseline's inherent cost on a tiny-vocabulary corpus —
        # refuse past the point a single node can enumerate, naming
        # the linear-scale fuzzy twins. Zipf-vocabulary corpora never
        # enter this branch (B=1) and scale by the prefix theorem.
        # raw-table count -> parquet footer statistics, not the pipeline
        n_docs_est = _t(spark, sf_dir, "documents").count()
        if n_docs_est > 150_000:
            from magictables_spark.plans.registry import QuadraticInputError

            raise QuadraticInputError(
                f"simjoin_prefix_filter: {n_docs_est} docs over a "
                f"{n_ranks}-token vocabulary makes the exact prefix-"
                "filter join enumerate ~n^2/vocab pairs — use "
                "dedup_minhash or simhash_neardup at this scale"
            )
        # pre-partition BOTH sides on the salted key at high fan-out:
        # with the session's 32 shuffle partitions, the 992 (rank,
        # salt) keys hash to 32 sorts of ~2 GB each, all concurrent —
        # that OOMed the heap at sf10. An explicit compatible
        # HashPartitioning(512) is reused by the sort-merge join
        # (no extra exchange) and keeps each sort ~100 MB.
        NPART = 512
        pref_a = pref.withColumn("salt", F.col("doc_id") % B).repartition(
            NPART, "r", "salt"
        )
        pref_b = pref.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(B)]))
        ).repartition(NPART, "r", "salt")
    else:
        pref_a = pref.withColumn("salt", F.lit(0))
        pref_b = pref.withColumn("salt", F.lit(0))
    cand = (
        pref_a.alias("a")
        .join(
            pref_b.alias("b"),
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.m") * 10 >= F.col("a.m") * 9)
            & (F.col("a.m") * 10 >= F.col("b.m") * 9)
            & (
                19 * (1 + F.least(F.col("a.m") - F.col("a.pa"), F.col("b.m") - F.col("b.pa")))
                >= 9 * (F.col("a.m") + F.col("b.m"))
            )
            & (19 * andpop >= 9 * (F.col("a.m") + F.col("b.m"))),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates()
    )
    # verify on 60-bit md5 token hashes: fixed-width int64 intersects
    # beat string-array intersects ~3x on the wide candidate sets this
    # small-vocab fixture produces (oracle applies the same transform)
    sets = docs.select(
        F.col("doc_id"),
        F.expr(f"transform(ts, t -> {_h60_spark('t')})").alias("ts"),
    )
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    union = F.size("ts_a") + F.size("ts_b") - inter
    return (
        cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b")), "id_b")
        .withColumn("jacc", inter.cast("double") / union)
        .filter(F.col("jacc") >= _TAU)
        .select("id_a", "id_b", "jacc")
    )


@q(
    "mixture_weighted_sources",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             (({_h60_duck("source")} % 100) + 1) / 100.0 AS weight,
             ({_h60_duck("CAST(doc_id AS VARCHAR) || ':' || source")} % 1000000)
               / 1000000.0 AS u
      FROM documents
    )
    SELECT source,
           any_value(weight) AS weight,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN u < weight THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM w GROUP BY source
    """,
    doc="Deterministic data-mixture sampling: each source gets a "
    "hash-derived rate in (0, 1], each doc keeps iff its md5-uniform "
    "u(doc_id, source) falls under the rate — the reweighting step "
    "that balances crawl/books/code subsets before training. Pure "
    "map-side predicate plus one partial-agg shuffle on source; "
    "repeatable across engines and runs (no RNG state), so the same "
    "mixture is reproducible on any cluster size. Swap the hash rate "
    "for a config map in production; the mechanics are identical.",
    tags=("pretrain", "sampling"),
)
def mixture_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            f"CAST(({_h60_spark('source')} % 100) + 1 AS DOUBLE) / 100"
        ).alias("weight"),
        F.expr(
            "CAST("
            + _h60_spark("CAST(doc_id AS STRING) || ':' || source")
            + " % 1000000 AS DOUBLE) / 1000000"
        ).alias("u"),
    )
    return d.groupBy("source").agg(
        F.first("weight").alias("weight"),
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("u") < F.col("weight"), 1).otherwise(0)).alias("n_sampled"),
    )


_SALT = 8


@q(
    "skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc=f"The skew-salting pattern as an oracle-checked query: the fact "
    f"side salts each row with md5(o_orderkey) % {_SALT}, the dim side "
    f"explodes into {_SALT} salted replicas, the join key becomes "
    "(custkey, salt) — a single hot customer now spreads across "
    f"{_SALT} reducers instead of one straggler. The dim side carries a "
    "SHUFFLE_HASH hint so the registered plan actually exchanges on the "
    "salted key (a broadcast join has no reducer to spread — the plan "
    "test asserts no BroadcastHashJoin). The oracle is the "
    "PLAIN unsalted join: salting provably does not change the result. "
    "Money sums in scaled int64 (registry rule 1). At 100 TB pair "
    "this with AQE skew detection; explicit salting is the manual "
    "control when the skew key is known a priori.",
    tags=("join", "scale"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("price_i"),
        F.expr(f"{_h60_spark('CAST(o_orderkey AS STRING)')} % {_SALT}").alias("salt"),
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.expr(f"sequence(0, {_SALT - 1})")))
    )
    return (
        orders.join(
            cust.hint("shuffle_hash"),
            (orders.o_custkey == cust.c_custkey) & (orders.salt == cust.salt),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum("price_i").cast("double") / 100).alias("total_price"),
        )
    )


def _morton_fragment(x: str, y: str, engine: str, bits: int = 8) -> str:
    """16-bit Morton (Z-order) interleave of two `bits`-bit ints as a
    pure integer SQL expression. Same arithmetic both engines; only the
    shift syntax differs (Spark: shiftleft/shiftright fns, DuckDB:
    << >> operators)."""
    terms = []
    for i in range(bits):
        if engine == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@q(
    "zorder_cluster_key",
    oracle=f"""
    WITH k AS (
      SELECT l_orderkey, l_linenumber,
             {_morton_fragment('(l_partkey % 256)', '(l_suppkey % 256)', 'duck')} AS zkey
      FROM lineitem
    )
    SELECT zkey // 4096 AS zbucket,
           COUNT(*) AS n_rows,
           MIN(zkey) AS zmin, MAX(zkey) AS zmax
    FROM k GROUP BY zbucket
    """,
    doc="Two-column Morton (Z-order) clustering key over (l_partkey, "
    "l_suppkey) low bytes, in pure integer shift/mask arithmetic — the "
    "layout key behind multi-column data-skipping: writing files "
    "range-partitioned and sorted by zkey gives every file a tight "
    "min/max envelope on BOTH columns, so a predicate on either prunes "
    "~sqrt of the files (vs all-files for the non-leading column of a "
    "lexicographic sort). The query emits per-bucket stats; the "
    "write-side pattern (repartitionByRange(zkey) + "
    "sortWithinPartitions) is asserted in tests/test_pretrain_pack.py. "
    "Map-side only — zero shuffles before the bucket agg.",
    tags=("scale", "layout"),
)
def zorder_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_morton_fragment("(l_partkey % 256)", "(l_suppkey % 256)", "spark")).alias("zkey"),
    )
    return k.groupBy(F.expr("zkey div 4096").alias("zbucket")).agg(
        F.count("*").alias("n_rows"),
        F.min("zkey").alias("zmin"),
        F.max("zkey").alias("zmax"),
    )


_HILBERT_S = [128, 64, 32, 16, 8, 4, 2, 1]  # 8-bit coords, 2^16 cells


def _hilbert_key_frame(df):
    """(l_orderkey, l_linenumber, hkey): 16-bit Hilbert index of the
    (l_partkey%256, l_suppkey%256) cell via the standard xy2d walk,
    unrolled 8 levels — per level: quadrant digit d += s^2*((3*rx)^ry),
    then reflect+swap the frame when ry=0. Pure integer CASE/AND/XOR
    arithmetic, identical in DuckDB (the oracle unrolls the same 8
    steps), so the whole curve is hash-checked against an engine that
    never saw this code."""
    out = df.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_partkey % 256").alias("x"),
        F.expr("l_suppkey % 256").alias("y"),
        F.lit(0).cast("bigint").alias("d"),
    )
    for s in _HILBERT_S:
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        out = out.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                f"CASE WHEN (y & {s}) = 0"
                f" THEN (CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END)"
                f" ELSE x END"
            ).alias("x"),
            F.expr(
                f"CASE WHEN (y & {s}) = 0"
                f" THEN (CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END)"
                f" ELSE y END"
            ).alias("y"),
            F.expr(f"d + {s * s} * ((3 * {rx}) ^ {ry})").alias("d"),
        )
    return out.select(
        "l_orderkey", "l_linenumber", F.col("d").alias("hkey")
    )


@q(
    "hilbert_cluster_key",
    oracle="""
    WITH h0 AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 256 AS x, l_suppkey % 256 AS y,
             CAST(0 AS BIGINT) AS d
      FROM lineitem
    ), h1 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 128) = 0
                  THEN (CASE WHEN (x & 128) > 0 THEN 127 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 128) = 0
                  THEN (CASE WHEN (x & 128) > 0 THEN 127 - x ELSE x END)
                  ELSE y END AS y,
             d + 16384 * xor(3 * (CASE WHEN (x & 128) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 128) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h0
    ), h2 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 64) = 0
                  THEN (CASE WHEN (x & 64) > 0 THEN 63 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 64) = 0
                  THEN (CASE WHEN (x & 64) > 0 THEN 63 - x ELSE x END)
                  ELSE y END AS y,
             d + 4096 * xor(3 * (CASE WHEN (x & 64) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 64) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h1
    ), h3 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 32) = 0
                  THEN (CASE WHEN (x & 32) > 0 THEN 31 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 32) = 0
                  THEN (CASE WHEN (x & 32) > 0 THEN 31 - x ELSE x END)
                  ELSE y END AS y,
             d + 1024 * xor(3 * (CASE WHEN (x & 32) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 32) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h2
    ), h4 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 16) = 0
                  THEN (CASE WHEN (x & 16) > 0 THEN 15 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 16) = 0
                  THEN (CASE WHEN (x & 16) > 0 THEN 15 - x ELSE x END)
                  ELSE y END AS y,
             d + 256 * xor(3 * (CASE WHEN (x & 16) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 16) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h3
    ), h5 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 8) = 0
                  THEN (CASE WHEN (x & 8) > 0 THEN 7 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 8) = 0
                  THEN (CASE WHEN (x & 8) > 0 THEN 7 - x ELSE x END)
                  ELSE y END AS y,
             d + 64 * xor(3 * (CASE WHEN (x & 8) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 8) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h4
    ), h6 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 4) = 0
                  THEN (CASE WHEN (x & 4) > 0 THEN 3 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 4) = 0
                  THEN (CASE WHEN (x & 4) > 0 THEN 3 - x ELSE x END)
                  ELSE y END AS y,
             d + 16 * xor(3 * (CASE WHEN (x & 4) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 4) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h5
    ), h7 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 2) = 0
                  THEN (CASE WHEN (x & 2) > 0 THEN 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 2) = 0
                  THEN (CASE WHEN (x & 2) > 0 THEN 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 4 * xor(3 * (CASE WHEN (x & 2) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 2) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h6
    ), h8 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN (y & 1) = 0
                  THEN (CASE WHEN (x & 1) > 0 THEN 0 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 1) = 0
                  THEN (CASE WHEN (x & 1) > 0 THEN 0 - x ELSE x END)
                  ELSE y END AS y,
             d + 1 * xor(3 * (CASE WHEN (x & 1) > 0 THEN 1 ELSE 0 END),
                                 (CASE WHEN (y & 1) > 0 THEN 1 ELSE 0 END)) AS d
      FROM h7
    )
    SELECT d // 4096 AS hbucket,
           COUNT(*) AS n_rows,
           MIN(d) AS hmin, MAX(d) AS hmax
    FROM h8 GROUP BY hbucket
    """,
    doc="Two-column HILBERT clustering key over the same (l_partkey, "
    "l_suppkey) low bytes as zorder_cluster_key — the better-locality "
    "sibling: the Hilbert curve is CONTINUOUS (consecutive indices "
    "are always grid neighbors, verified against an independent "
    "Python xy2d in tests/test_hilbert.py), so equal-size index "
    "ranges cut tighter bounding boxes than Morton's quadrant jumps — "
    "measurably fewer files touched per 2-D range predicate at the "
    "same file count, the reason modern layout clustering favors "
    "Hilbert over Z-order. Implemented as the "
    "standard xy2d walk unrolled 8 levels in pure integer CASE/AND/"
    "XOR arithmetic (no UDF — the whole key is one codegen'd "
    "projection), with the DuckDB oracle unrolling the identical 8 "
    "steps, so the full curve mapping is value-hash-checked. Same "
    "write-side pattern as zorder: repartitionByRange(hkey) + "
    "sortWithinPartitions; map-side only before the bucket agg.",
    tags=("scale", "layout"),
)
def hilbert_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _hilbert_key_frame(_t(spark, sf_dir, "lineitem"))
    return k.groupBy(F.expr("hkey div 4096").alias("hbucket")).agg(
        F.count("*").alias("n_rows"),
        F.min("hkey").alias("hmin"),
        F.max("hkey").alias("hmax"),
    )


@q(
    "pretrain_corpus_funnel",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             length(text) - (len(string_split(text, ' ')) - 1) AS n_letters
      FROM documents
    ), g AS (
      SELECT doc_id, len(toks) AS n_tokens, n_letters,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM d WHERE len(toks) >= 2
    ), gc AS (
      SELECT doc_id, n_tokens, n_letters, gram, COUNT(*) AS c FROM g GROUP BY ALL
    ), gq AS (
      SELECT doc_id,
             (1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) < 0.6
              AND CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) < 0.2
              AND CAST(n_letters AS DOUBLE) / n_tokens BETWEEN 2.0 AND 10.0) AS q_keep
      FROM gc GROUP BY doc_id, n_tokens, n_letters
    ), qd AS (
      SELECT d.doc_id, d.source, d.toks,
             CAST(ceil(len(d.toks) / {_PASSAGE}.0) AS INT) AS np
      FROM d JOIN gq ON d.doc_id = gq.doc_id WHERE gq.q_keep
    ), p0 AS (
      SELECT doc_id, unnest(list_transform(range(0, np),
        i -> {{'pos': i,
               'passage': array_to_string(
                 toks[i * {_PASSAGE} + 1 : i * {_PASSAGE} + {_PASSAGE}], ' ')}})) AS s
      FROM qd
    ), p AS (
      SELECT doc_id, s.pos AS pos, s.passage AS passage FROM p0
    ), kept AS (
      SELECT doc_id, pos, passage,
             row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
      FROM p
    ), reasm AS (
      SELECT qd.doc_id, qd.source,
             COALESCE(k.dt, '') AS dt
      FROM qd LEFT JOIN (
        SELECT doc_id, string_agg(passage, ' ' ORDER BY pos) AS dt
        FROM kept WHERE rn = 1 GROUP BY doc_id
      ) k ON qd.doc_id = k.doc_id
    ), exact AS (
      SELECT doc_id, source, dt,
             row_number() OVER (PARTITION BY md5(dt) ORDER BY doc_id) = 1 AS e_keep
      FROM reasm
    ), final AS (
      SELECT doc_id, source, dt, e_keep,
             e_keep AND
             (CAST({_h60_duck("CAST(doc_id AS VARCHAR) || ':' || source")} % 1000000
                   AS DOUBLE) / 1000000
              < CAST(({_h60_duck("source")} % 100) + 1 AS DOUBLE) / 100) AS sampled
      FROM exact
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality,
           CAST(SUM(CASE WHEN f.e_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN f.sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN f.sampled AND f.dt <> ''
                         THEN len(string_split(f.dt, ' ')) ELSE 0 END) AS BIGINT)
             AS tokens_out
    FROM d LEFT JOIN final f ON d.doc_id = f.doc_id
    GROUP BY d.source
    """,
    doc="The four curation stages composed into ONE declarative plan — "
    "the per-source funnel report (raw -> quality-kept -> exact-unique "
    "-> mixture-sampled -> surviving tokens) a pretraining run reviews "
    "before launching: Gopher repetition gate, corpus-global passage "
    "dedup with reassembly, exact full-text dedup on the reassembled "
    "text (md5 identity, first doc wins), deterministic mixture "
    "sampling. Catalyst sees the whole pipeline at once: the 2-gram "
    "explode and the passage window shuffle on different keys but "
    "quality filtering prunes the passage stage's input, and the final "
    "agg is a 20-group partial agg. Every stage mirrored in the "
    "oracle's CTE chain.",
    tags=("text", "pretrain", "pipeline", "scale"),
)
def pretrain_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
        (F.length("text") - (F.size(F.split(F.col("text"), " ")) - 1)).alias("n_letters"),
    )
    # `source` rides the gram-quality aggregation keys (functionally
    # dependent on doc_id — same group count) so the quality-kept doc
    # frame `keep` is ONE subtree shared by both consumers below.
    # Previously the passage stage and the funnel tail each re-derived
    # it with different projections, and Catalyst planned the whole
    # explode-every-2-gram pipeline TWICE (no exchange reuse across
    # non-identical subtrees — the most expensive stage of the query,
    # duplicated).
    g = (
        d.filter(F.size("toks") >= 2)
        # spread before the 2-gram explode (single-split fixture
        # corpus; dedup_minhash precedent)
        .transform(spread)
        .select(
            "doc_id",
            "source",
            F.size("toks").alias("n_tokens"),
            "n_letters",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(toks[i - 1], ' ', toks[i]))"
                )
            ).alias("gram"),
        )
    )
    gc = g.groupBy("doc_id", "source", "n_tokens", "n_letters", "gram").agg(
        F.count("*").alias("c")
    )
    gq = (
        gc.groupBy("doc_id", "source", "n_tokens", "n_letters")
        .agg(
            F.sum("c").alias("tot"),
            F.count("*").alias("dst"),
            F.max("c").alias("top"),
        )
        .select(
            "doc_id",
            "source",
            (
                (F.lit(1.0) - F.col("dst").cast("double") / F.col("tot") < 0.6)
                & (F.col("top").cast("double") / F.col("tot") < 0.2)
                & (F.col("n_letters").cast("double") / F.col("n_tokens") >= 2.0)
                & (F.col("n_letters").cast("double") / F.col("n_tokens") <= 10.0)
            ).alias("q_keep"),
        )
    )
    # materialize the quality verdict ONCE: `keep` feeds two consumers
    # (the passage join below and the funnel tail) whose projections
    # differ, so Catalyst re-plans the whole explode-every-2-gram
    # pipeline per consumer (a plan is a tree; exchange reuse needs
    # identical subtrees, and AQE's dynamic broadcast re-plan breaks
    # any carefully arranged match). localCheckpoint pins the
    # doc-count-bounded (doc_id, source) verdict in executor storage —
    # the dominant stage of the query runs exactly once (same pattern
    # as _simhash_sig_frame / kmeans_lloyd)
    keep = gq.filter("q_keep").select("doc_id", "source").localCheckpoint()
    # explicit hash distribution on doc_id: AQE broadcasts the small
    # `keep` side, which would leave the passage explode below running
    # on the single-split scan; the pre-join repartition keeps the join
    # map-side AND spreads the explode
    qd = (
        d.select("doc_id", "toks")
        .transform(spread_by("doc_id"))
        .join(keep.select("doc_id"), "doc_id")
        .select(
            "doc_id",
            "toks",
            F.expr(f"CAST(ceil(size(toks) / {_PASSAGE}.0) AS INT)").alias("np"),
        )
    )
    p = qd.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, np - 1),"
                f" i -> array_join(slice(toks, i * {_PASSAGE} + 1, {_PASSAGE}), ' '))"
            )
        ).alias("pos", "passage"),
    )
    wp = Window.partitionBy(F.md5("passage")).orderBy("doc_id", "pos")
    reasm = (
        p.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, passage))), s -> s.passage)"
                ),
                " ",
            ).alias("dt")
        )
    )
    we = Window.partitionBy(F.md5("dt")).orderBy("doc_id")
    final = (
        keep
        .join(reasm, "doc_id", "left")
        .withColumn("dt", F.coalesce("dt", F.lit("")))
        .withColumn("e_keep", F.row_number().over(we) == 1)
        .withColumn(
            "sampled",
            F.col("e_keep")
            & (
                F.expr(
                    "CAST("
                    + _h60_spark("CAST(doc_id AS STRING) || ':' || source")
                    + " % 1000000 AS DOUBLE) / 1000000"
                )
                < F.expr(f"CAST(({_h60_spark('source')} % 100) + 1 AS DOUBLE) / 100")
            ),
        )
    )
    return (
        d.select("doc_id", "source")
        .join(final.select("doc_id", "dt", "e_keep", "sampled"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("dt").isNotNull(), 1).otherwise(0)).alias("n_quality"),
            F.sum(F.when(F.col("e_keep"), 1).otherwise(0)).alias("n_exact"),
            F.sum(F.when(F.col("sampled"), 1).otherwise(0)).alias("n_sampled"),
            F.sum(
                F.when(
                    F.col("sampled") & (F.col("dt") != ""),
                    F.size(F.split("dt", " ")),
                ).otherwise(0)
            ).alias("tokens_out"),
        )
    )


@q(
    "unigram_surprisal_quality",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), cnt AS (
      SELECT token, COUNT(*) AS c FROM tok GROUP BY token
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
    ), bits AS (
      -- floor(log2(N / c)) computed EXACTLY as binary-digit count of the
      -- integer quotient: no libm, no cross-engine ulp drift (cf. tfidf)
      SELECT token, length(bin(n // c)) - 1 AS surprisal_bits
      FROM cnt CROSS JOIN tot
    ), per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(b.surprisal_bits) AS BIGINT) AS sum_bits
      FROM tok t JOIN bits b USING (token)
      GROUP BY t.doc_id
    ), corpus AS (
      SELECT CAST(SUM(sum_bits) AS BIGINT) AS all_bits,
             CAST(SUM(n_tokens) AS BIGINT) AS all_toks
      FROM per_doc
    )
    SELECT d.doc_id, d.n_tokens,
           CAST(d.sum_bits AS DOUBLE) / d.n_tokens AS mean_bits,
           CASE
             WHEN CAST(d.sum_bits AS DOUBLE) / d.n_tokens
                  < CAST(c.all_bits AS DOUBLE) / c.all_toks - 1.0 THEN 'head'
             WHEN CAST(d.sum_bits AS DOUBLE) / d.n_tokens
                  > CAST(c.all_bits AS DOUBLE) / c.all_toks + 1.0 THEN 'tail'
             ELSE 'middle'
           END AS lm_bucket
    FROM per_doc d CROSS JOIN corpus c
    """,
    doc="CCNet-style unigram-LM quality scoring in exact integer bits: "
    "each token's surprisal is floor(log2(N_tokens / count(token))), "
    "computed as the binary-digit count of the integer quotient "
    "(length(bin(q)) - 1) — no libm log, so unlike tfidf the score is "
    "bit-identical across engines and the WHOLE pipeline is "
    "hash-oracled. Docs bucket head/middle/tail around the corpus mean "
    "surprisal (+-1 bit), the split CCNet uses to keep fluent text and "
    "drop gibberish. Plan shape at 100 TB: the token-count dim is "
    "VOCAB-sized, so it is localCheckpointed once and every corpus "
    "scalar (total tokens, token-weighted mean surprisal) collects "
    "from that tiny dim as a bounded driver roundtrip (the LSH/kmeans "
    "precedent) and re-enters the plan as literals — no scalar-agg "
    "cross join, no single-partition exchange; the main plan is one "
    "explode, a broadcast dim join, and a doc_id partial agg. The "
    "Python-side mean/threshold arithmetic is the same IEEE double op "
    "sequence the oracle runs in SQL, so literals stay bit-identical.",
    tags=("text", "quality", "pretrain", "scale"),
)
def unigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _surprisal_quality(_t(spark, sf_dir, "documents"))


def _surprisal_quality(docs: DataFrame) -> DataFrame:
    """Surprisal-bucket plan over a (doc_id, text, ...) frame — split
    out so curriculum_order can feed a shared checkpointed scan."""
    # NOT spread (tried, reverted): unlike the md5/2-gram chains this
    # explode is a plain token split — cheap per row — and the added
    # exchange measured a warm-median LOSS on both consumers at both
    # scales (unigram_surprisal_quality 0.90 -> 1.39 s at sf0.1 and
    # 1.21 -> 1.75 s at sf1; curriculum_order 0.81 -> 1.40 / 1.14 ->
    # 1.60 s), zero-steal windows, non-overlapping envelopes. The
    # map-side partial agg already shrinks the explode's output before
    # any shuffle, so the single-split cost is bounded by one cheap
    # pass; at real scale scan splits provide the parallelism.
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    # vocab-sized dim, materialized once: both the corpus scalars and
    # the per-token surprisal broadcast derive from it
    cnt = tok.groupBy("token").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
    n_total = cnt.agg(F.sum("c").cast("bigint").alias("n")).collect()[0]["n"] or 1  # empty corpus: keep div well-formed, all frames flow empty
    bits = cnt.select(
        "token",
        "c",
        (F.length(F.bin(F.expr(f"CAST({n_total} AS BIGINT) div c"))) - 1).alias(
            "surprisal_bits"
        ),
    )
    # token-weighted corpus mean == sum over docs of sum_bits / n_tokens
    # totals (every token occurrence contributes once on both routes)
    stats = bits.agg(
        F.sum(F.col("c") * F.col("surprisal_bits")).cast("bigint").alias("all_bits"),
    ).collect()[0]
    corpus_mean = (stats["all_bits"] or 0) / n_total  # exact-int IEEE division
    per_doc = (
        tok.join(F.broadcast(bits.select("token", "surprisal_bits")), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("surprisal_bits").cast("bigint").alias("sum_bits"),
        )
    )
    mean_bits = F.col("sum_bits").cast("double") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        mean_bits.alias("mean_bits"),
        F.when(mean_bits < F.lit(corpus_mean) - 1.0, "head")
        .when(mean_bits > F.lit(corpus_mean) + 1.0, "tail")
        .otherwise("middle")
        .alias("lm_bucket"),
    )


_SHARDS = 64


@q(
    "reproducible_shard_shuffle",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             {_h60_duck("CAST(doc_id AS VARCHAR)")} % {_SHARDS} AS shard,
             {_h60_duck("'ord:' || CAST(doc_id AS VARCHAR)")} AS okey
      FROM documents
    ), r AS (
      SELECT doc_id, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id) - 1
               AS shard_rank
      FROM s
    )
    SELECT doc_id, shard, shard_rank,
           shard_rank * {_SHARDS} + shard AS global_pos
    FROM r
    """,
    doc="Reproducible global training-order shuffle WITHOUT a global "
    f"sort: md5(doc_id) assigns each doc to one of {_SHARDS} shards, an "
    "independent md5 key orders docs WITHIN each shard (per-shard "
    "row_number windows — 64-way parallel, never a single-"
    "partition sort), and global_pos = shard_rank * n_shards + shard "
    "interleaves the shards round-robin into one deterministic "
    "permutation. This is how training pipelines shuffle 100 TB: "
    "shard-then-shuffle-within-shard is reproducible on any cluster "
    "size, restart-stable (pure hash arithmetic, no RNG state), and "
    "every shard streams independently to the data loader. The oracle "
    "reproduces the identical permutation from the same md5 math.",
    tags=("pretrain", "sampling", "scale"),
)
def reproducible_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shard_shuffle(_t(spark, sf_dir, "documents"))


def _shard_shuffle(docs: DataFrame) -> DataFrame:
    """Shard-shuffle plan over a (doc_id, ...) frame — split out so
    curriculum_order can feed a shared checkpointed scan."""
    s = docs.select(
        "doc_id",
        F.expr(f"{_h60_spark('CAST(doc_id AS STRING)')} % {_SHARDS}").alias("shard"),
        F.expr(_h60_spark("'ord:' || CAST(doc_id AS STRING)")).alias("okey"),
    )
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return s.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).alias("shard_rank"),
    ).withColumn("global_pos", F.col("shard_rank") * _SHARDS + F.col("shard"))


_WIN, _STRIDE = 16, 8  # window length; expected anchor spacing (1/8 density)


@q(
    "substring_dupe_coverage",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), w AS (
      -- content-defined anchors (winnowing): a window starts wherever
      -- the TOKEN's hash = 0 mod {_STRIDE}, so identical text anchors at
      -- identical tokens no matter where it sits in the document
      SELECT doc_id, n_tokens, p.s AS s, p.whash AS whash
      FROM d, unnest(list_transform(
               list_filter(range(1, n_tokens - {_WIN} + 2),
                           s -> {_h60_duck('toks[s]')} % {_STRIDE} = 0),
               s -> {{'s': s,
                      'whash': md5(array_to_string(toks[s : s + {_WIN} - 1], ' '))}}))
             AS u(p)
      WHERE n_tokens >= {_WIN}
    ), dup AS (
      SELECT whash FROM w GROUP BY whash HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT w.doc_id, w.n_tokens, w.s
      FROM w SEMI JOIN dup ON w.whash = dup.whash
    ), isl AS (
      SELECT doc_id, n_tokens, s,
             CASE WHEN s > COALESCE(MAX(s + {_WIN} - 1) OVER (
                      PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  THEN 1 ELSE 0 END AS new_isl
      FROM hits
    ), grp AS (
      SELECT doc_id, n_tokens, s,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                                ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    ), cov AS (
      SELECT doc_id, ANY_VALUE(n_tokens) AS n_tokens,
             CAST(SUM(ilen) AS BIGINT) AS dup_tokens
      FROM (
        SELECT doc_id, island, ANY_VALUE(n_tokens) AS n_tokens,
               MAX(s + {_WIN} - 1) - MIN(s) + 1 AS ilen
        FROM grp GROUP BY doc_id, island
      ) GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_tokens,
           COALESCE(c.dup_tokens, 0) AS dup_tokens,
           CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / d.n_tokens AS dup_frac
    FROM d LEFT JOIN cov c ON d.doc_id = c.doc_id
    WHERE d.n_tokens > 0
    """,
    doc=f"Cross-document substring-duplication coverage (the exact-"
    f"substring dedup metric of Lee et al. 2022): {_WIN}-token windows "
    "start at CONTENT-DEFINED anchors — positions whose token hashes to "
    f"0 mod {_STRIDE} (winnowing-style fingerprint selection) — so a "
    "duplicated span anchors at the same tokens in every document it "
    "appears in, independent of its offset; a fixed-stride grid would "
    "only match spans whose phases happen to agree mod stride. Window "
    "hashes in >= 2 distinct docs are duplicated spans; each doc "
    "reports the token count covered by the MERGED union of its "
    "duplicated windows (gaps-islands interval merge) and the "
    "fraction. Catches unaligned duplication that aligned-chunk "
    "passage_dedup structurally cannot. Plan: the anchor scan and "
    "window hashing are ONE array expression per document (no token "
    "explode), ~n/stride (s, whash) rows enter the one whash exchange "
    "for the cross-doc test, then doc-keyed windows merge intervals — "
    "linear, partition-parallel, no global state.",
    tags=("text", "dedup", "pretrain", "scale"),
)
def substring_dupe_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    # anchors + window hashes as one array expression: the (s, whash)
    # pair list is built per row and exploded WITHOUT carrying the
    # token array into the exploded rows
    pair_expr = (
        f"transform("
        f"  filter(sequence(1, n_tokens - {_WIN} + 1),"
        f"         s -> {_h60_spark('element_at(toks, s)')} % {_STRIDE} = 0),"
        f"  s -> struct(s AS s, md5(array_join(slice(toks, s, {_WIN}), ' ')) AS whash))"
    )
    w = (
        d.filter(F.col("n_tokens") >= _WIN)
        # spread before the anchor + window-md5 explode (single-split
        # fixture corpus; dedup_minhash precedent)
        .transform(spread)
        .select("doc_id", "n_tokens", F.explode(F.expr(pair_expr)).alias("p"))
        .select("doc_id", "n_tokens", F.col("p.s").alias("s"), F.col("p.whash").alias("whash"))
    )
    dup = (
        w.groupBy("whash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("whash")
    )
    hits = w.join(dup, "whash", "left_semi").select("doc_id", "n_tokens", "s")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = (
        hits.withColumn(
            "new_isl",
            (
                F.col("s")
                > F.coalesce(F.max(F.col("s") + _WIN - 1).over(w_prev), F.lit(0))
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_isl").over(w_run))
    )
    cov = (
        grp.groupBy("doc_id", "island")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            (F.max(F.col("s") + _WIN - 1) - F.min("s") + 1).alias("ilen"),
        )
        .groupBy("doc_id")
        .agg(F.sum("ilen").cast("bigint").alias("dup_tokens"))
    )
    return (
        d.filter(F.col("n_tokens") > 0)
        .select("doc_id", "n_tokens")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens")).alias(
                "dup_frac"
            ),
        )
    )


@q(
    "curriculum_order",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), cnt AS (
      SELECT token, COUNT(*) AS c FROM tok GROUP BY token
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
    ), bits AS (
      SELECT token, length(bin(n // c)) - 1 AS surprisal_bits
      FROM cnt CROSS JOIN tot
    ), per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(b.surprisal_bits) AS BIGINT) AS sum_bits
      FROM tok t JOIN bits b USING (token)
      GROUP BY t.doc_id
    ), corpus AS (
      SELECT CAST(SUM(sum_bits) AS BIGINT) AS all_bits,
             CAST(SUM(n_tokens) AS BIGINT) AS all_toks
      FROM per_doc
    ), bucketed AS (
      SELECT d.doc_id,
             CASE
               WHEN CAST(d.sum_bits AS DOUBLE) / d.n_tokens
                    < CAST(c.all_bits AS DOUBLE) / c.all_toks - 1.0 THEN 'head'
               WHEN CAST(d.sum_bits AS DOUBLE) / d.n_tokens
                    > CAST(c.all_bits AS DOUBLE) / c.all_toks + 1.0 THEN 'tail'
               ELSE 'middle'
             END AS lm_bucket
      FROM per_doc d CROSS JOIN corpus c
    ), sh AS (
      SELECT doc_id,
             {_h60_duck("CAST(doc_id AS VARCHAR)")} % {_SHARDS} AS shard,
             {_h60_duck("'ord:' || CAST(doc_id AS VARCHAR)")} AS okey
      FROM documents
    ), ranked AS (
      SELECT doc_id, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id) - 1
               AS shard_rank
      FROM sh
    )
    SELECT b.doc_id, b.lm_bucket,
           CASE b.lm_bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1 ELSE 2 END
             AS bucket_order,
           r.shard, r.shard_rank,
           r.shard_rank * {_SHARDS} + r.shard AS within_pos
    FROM bucketed b JOIN ranked r ON b.doc_id = r.doc_id
    """,
    doc="Curriculum data ordering: the LM-surprisal quality buckets "
    "(head = most fluent first) composed with the reproducible shard "
    "shuffle — train order is (bucket_order, within_pos), i.e. easy-"
    "to-hard curriculum with a deterministic, restart-stable shuffle "
    "INSIDE each bucket. Deliberately emits the (bucket, shard, rank) "
    "coordinates instead of one dense global position: dense numbering "
    "needs a per-bucket global window (3 near-single partitions), "
    "while these coordinates stream shard-parallel at any scale and "
    "define the identical total order. Built by composing the two "
    "registered primitives' plans; the oracle composes their CTEs.",
    tags=("pretrain", "sampling", "scale", "pipeline"),
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one checkpointed scan feeds BOTH composed pipelines: the surprisal
    # pass re-reads the tokenized docs twice (vocab dim + per-doc agg)
    # and the shard shuffle once more — materializing (doc_id, text)
    # once replaces three parquet scans with in-memory reads
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    buckets = _surprisal_quality(docs).select("doc_id", "lm_bucket")
    order = _shard_shuffle(docs).select(
        "doc_id", "shard", "shard_rank", F.col("global_pos").alias("within_pos")
    )
    return buckets.join(order, "doc_id").select(
        "doc_id",
        "lm_bucket",
        F.when(F.col("lm_bucket") == "head", 0)
        .when(F.col("lm_bucket") == "middle", 1)
        .otherwise(2)
        .alias("bucket_order"),
        "shard",
        "shard_rank",
        "within_pos",
    )


_DSIR_B = 256  # hashed-feature buckets (the "hashed n-gram" dimension)


@q(
    "dsir_importance",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM d WHERE len(toks) >= 2
    ), b AS (
      SELECT doc_id, {_h60_duck('gram')} % {_DSIR_B} AS bucket,
             (lang = 'en') AS is_tgt
      FROM g
    ), cnt AS (
      SELECT bucket, COUNT(*) AS cr,
             COUNT(*) FILTER (WHERE is_tgt) AS ct
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
      FROM cnt
    ), spine AS (
      SELECT unnest(range(0, {_DSIR_B})) AS bucket
    ), w AS (
      SELECT spine.bucket,
             (length(bin((nr + {_DSIR_B}) // (COALESCE(cr, 0) + 1))) - 1)
           - (length(bin((nt + {_DSIR_B}) // (COALESCE(ct, 0) + 1))) - 1)
               AS w_bits
      FROM spine LEFT JOIN cnt ON spine.bucket = cnt.bucket CROSS JOIN tot
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(w_bits) AS BIGINT) AS weight_bits,
           CAST(SUM(w_bits) AS BIGINT) > 0 AS selected
    FROM b JOIN w ON b.bucket = w.bucket
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    doc="DSIR-style importance weighting (Xie et al. 2023, 'Data "
    "Selection for Language Models via Importance Resampling'): score "
    "every raw document by how target-like its hashed-bigram "
    "distribution is, where the target corpus is the lang='en' slice "
    "and raw is the whole crawl. Features are whitespace bigrams "
    "hashed to 256 buckets via the shared md5-60-bit fragment; the "
    "per-bucket importance weight is the floored-log2 likelihood "
    "ratio bits_raw - bits_target = floor(log2((N_r+B)/(c_r+1))) - "
    "floor(log2((N_t+B)/(c_t+1))) (add-1 smoothing), kept in exact "
    "BIGINT bits like unigram_surprisal_quality so both engines agree "
    "bit-for-bit. A document's weight is the sum over its bigram "
    "occurrences; selected = weight > 0 (more probable under target "
    "than raw), the resampling acceptance rule with a fixed "
    "threshold instead of a Gumbel draw so it stays deterministic "
    "and oracle-able. 100 TB shape: ONE conditional-agg pass builds "
    "both count dims (256 groups, partial-agg shuffle), the 256-row "
    "weight table broadcasts back, and the per-doc score is a "
    "doc_id-keyed partial agg -- no global state beyond two scalar "
    "totals, tokens never shuffle raw text.",
    tags=("pretrain", "sampling", "quality", "scale"),
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _DSIR_B
    docs = (
        # spread before the bigram explode + md5 hashing (single-split
        # fixture corpus; dedup_minhash precedent) — the checkpointed
        # b frame below inherits the parallel layout; width is
        # size-adaptive (catalog.spread_n)
        spread(_t(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    grams = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_tgt"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("gram"),
    )
    # one checkpointed (doc_id, is_tgt, bucket) scan feeds BOTH the
    # count-dim pass (forced by the scalar-totals collect) and the
    # per-doc scoring pass — without it the explode + md5 hashing of
    # every bigram runs twice (measured ~40% of the query at sf0.1)
    b = grams.select(
        "doc_id", "is_tgt", F.expr(f"{_h60_spark('gram')} % {B}").alias("bucket")
    ).localCheckpoint(eager=True)
    cnt = b.groupBy("bucket").agg(
        F.count("*").alias("cr"),
        F.count_if(F.col("is_tgt")).alias("ct"),
    )
    tot = cnt.agg(
        F.sum("cr").cast("bigint").alias("nr"), F.sum("ct").cast("bigint").alias("nt")
    ).collect()[0]
    nr, nt = tot["nr"] or 0, tot["nt"] or 0  # empty corpus: bits exprs stay well-formed
    spine = spark.range(B).select(F.col("id").cast("bigint").alias("bucket"))
    w = spine.join(cnt, "bucket", "left").select(
        "bucket",
        (
            (
                F.length(
                    F.bin(
                        F.expr(
                            f"CAST({nr} + {B} AS BIGINT) div (coalesce(cr, 0) + 1)"
                        )
                    )
                )
                - 1
            )
            - (
                F.length(
                    F.bin(
                        F.expr(
                            f"CAST({nt} + {B} AS BIGINT) div (coalesce(ct, 0) + 1)"
                        )
                    )
                )
                - 1
            )
        ).alias("w_bits"),
    )
    return (
        b.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("w_bits").cast("bigint").alias("weight_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "weight_bits",
            (F.col("weight_bits") > 0).alias("selected"),
        )
    )


@q(
    "vocab_growth_curve",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), mx AS (
      SELECT MAX(doc_id) AS m FROM documents
    ), fs AS (
      SELECT token, MIN(doc_id) AS first_seen FROM t GROUP BY token
    ), vocab_d AS (
      SELECT CAST(LEAST(first_seen * 10 // (m + 1), 9) AS BIGINT) AS decile,
             COUNT(*) AS new_vocab
      FROM fs CROSS JOIN mx GROUP BY 1
    ), tok_d AS (
      SELECT CAST(LEAST(doc_id * 10 // (m + 1), 9) AS BIGINT) AS decile,
             COUNT(*) AS n_tokens
      FROM t CROSS JOIN mx GROUP BY 1
    ), spine AS (
      SELECT unnest(range(0, 10)) AS decile
    )
    SELECT spine.decile,
           CAST(SUM(COALESCE(n_tokens, 0)) OVER (ORDER BY spine.decile) AS BIGINT)
             AS cum_tokens,
           CAST(SUM(COALESCE(new_vocab, 0)) OVER (ORDER BY spine.decile) AS BIGINT)
             AS cum_vocab
    FROM spine
    LEFT JOIN vocab_d ON spine.decile = vocab_d.decile
    LEFT JOIN tok_d ON spine.decile = tok_d.decile
    ORDER BY spine.decile
    """,
    doc="Heaps-law vocabulary-growth curve: cumulative distinct "
    "vocabulary vs cumulative token count at 10 corpus checkpoints "
    "(doc_id deciles). The curve is THE capacity-planning artifact for "
    "tokenizer training and dedup sizing — sublinear growth confirms a "
    "natural-language corpus, linear growth flags ID/hash pollution. "
    "Exact and engine-agnostic: first-occurrence is min(doc_id) per "
    "token (one token-keyed partial-agg shuffle — the only data-sized "
    "exchange), each token/doc maps to its decile map-side, and the "
    "cumulative sums run over a 10-row frame. 100 TB shape: the heavy "
    "aggregation is distributed; only the 10-row decile frame is "
    "single-partition, by construction bounded.",
    tags=("pretrain", "text", "analytics", "scale"),
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    m = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"] or 0  # empty: decile div uses m+1
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    def decile_of(c: str):
        return F.least(
            F.expr(f"CAST({c} * 10 div ({m} + 1) AS BIGINT)"),
            F.lit(9).cast("bigint"),
        )
    fs = tok.groupBy("token").agg(F.min("doc_id").alias("first_seen"))
    vocab_d = fs.groupBy(decile_of("first_seen").alias("decile")).agg(
        F.count("*").alias("new_vocab")
    )
    tok_d = tok.groupBy(decile_of("doc_id").alias("decile")).agg(
        F.count("*").alias("n_tokens")
    )
    spine = spark.range(10).select(F.col("id").cast("bigint").alias("decile"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(vocab_d, "decile", "left")
        .join(tok_d, "decile", "left")
        .select(
            "decile",
            F.sum(F.coalesce(F.col("n_tokens"), F.lit(0))).over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_vocab"), F.lit(0))).over(w).cast("bigint").alias("cum_vocab"),
        )
        .orderBy("decile")
    )


@q(
    "doc_entropy_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), c AS (
      SELECT doc_id, token, COUNT(*) AS ct FROM t GROUP BY doc_id, token
    ), cn AS (
      SELECT doc_id, ct,
             CAST(SUM(ct) OVER (PARTITION BY doc_id) AS BIGINT) AS n_doc
      FROM c
    ), d AS (
      SELECT doc_id, MAX(n_doc) AS n_tokens,
             CAST(SUM(ct * (length(bin(n_doc // ct)) - 1)) AS BIGINT) AS sum_bits
      FROM cn GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, sum_bits,
           CAST(sum_bits AS DOUBLE) / n_tokens AS mean_bits,
           (CAST(sum_bits AS DOUBLE) / n_tokens) >= 2.0 AS keep
    FROM d ORDER BY doc_id
    """,
    doc="Within-document token-distribution entropy in exact integer "
    "bits: each token occurrence contributes floor(log2(n_doc / "
    "c_token)) — the self-surprisal of the doc's own unigram "
    "distribution — and the doc-level mean flags degenerate text "
    "(keyword stuffing, boilerplate loops, single-phrase spam) that "
    "corpus-level surprisal misses because its TOKENS are common even "
    "when their repetition is pathological. keep = mean >= 2 bits. "
    "Complements gopher_quality_filters (2-gram repetition) with a "
    "whole-distribution statistic. 100 TB shape: one groupBy(doc_id, "
    "token) partial agg and one groupBy(doc_id) reduce — "
    "embarrassingly parallel, no global state at all; the only double "
    "is the final int/int division, bit-identical cross-engine.",
    tags=("pretrain", "quality", "text", "scale"),
)
def doc_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the raw scan before the token explode + (doc, token)
    # partial aggregate (single-split fixture scan; the committed
    # text-pack spread pattern). Hash on doc_id — every downstream
    # exchange (the per-doc counts, the doc window) is doc-keyed, so
    # the spread doubles as the join-key exchange at 100 TB.
    tok = (
        _t(spark, sf_dir, "documents")
        .transform(spread_by("doc_id"))
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    c = tok.groupBy("doc_id", "token").agg(F.count("*").alias("ct"))
    wdoc = Window.partitionBy("doc_id")
    per = c.withColumn("n_doc", F.sum("ct").over(wdoc).cast("bigint")).select(
        "doc_id",
        "ct",
        "n_doc",
        (
            F.col("ct")
            * (F.length(F.bin(F.expr("n_doc div ct"))) - 1)
        ).alias("bits"),
    )
    d = per.groupBy("doc_id").agg(
        F.max("n_doc").alias("n_tokens"),
        F.sum("bits").cast("bigint").alias("sum_bits"),
    )
    mean_bits = F.col("sum_bits").cast("double") / F.col("n_tokens")
    return d.select(
        "doc_id",
        "n_tokens",
        "sum_bits",
        mean_bits.alias("mean_bits"),
        (mean_bits >= 2.0).alias("keep"),
    )


@q(
    "bigram_surprisal_quality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS token FROM toks
    ), c1 AS (
      SELECT token, COUNT(*) AS c FROM tok GROUP BY token
    ), n1 AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM c1
    ), pairs AS (
      SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM (
        SELECT doc_id,
               unnest(list_zip(list_slice(t, 1, len(t) - 1),
                               list_slice(t, 2, len(t)))) AS z
        FROM toks WHERE len(t) >= 2
      )
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2
    ), n2 AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM c2
    ), b2 AS (
      SELECT w1, w2, length(bin((SELECT n FROM n2) // c)) - 1 AS bits
      FROM c2 WHERE c >= 2
    ), b1 AS (
      SELECT token, length(bin((SELECT n FROM n1) // c)) - 1 + 2 AS bits
      FROM c1
    ), scored AS (
      SELECT p.doc_id, COALESCE(b2.bits, b1.bits) AS bits
      FROM pairs p
      LEFT JOIN b2 ON p.w1 = b2.w1 AND p.w2 = b2.w2
      JOIN b1 ON p.w2 = b1.token
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_pairs,
             CAST(SUM(bits) AS BIGINT) AS sum_bits
      FROM scored GROUP BY doc_id
    ), corpus AS (
      SELECT CAST(SUM(sum_bits) AS BIGINT) AS all_bits,
             CAST(SUM(n_pairs) AS BIGINT) AS all_pairs
      FROM per_doc
    )
    SELECT d.doc_id, d.n_pairs,
           CAST(d.sum_bits AS DOUBLE) / d.n_pairs AS mean_bits,
           CASE
             WHEN CAST(d.sum_bits AS DOUBLE) / d.n_pairs
                  < CAST(c.all_bits AS DOUBLE) / c.all_pairs - 1.0 THEN 'head'
             WHEN CAST(d.sum_bits AS DOUBLE) / d.n_pairs
                  > CAST(c.all_bits AS DOUBLE) / c.all_pairs + 1.0 THEN 'tail'
             ELSE 'middle'
           END AS lm_bucket
    FROM per_doc d CROSS JOIN corpus c
    """,
    doc="Bigram-LM quality scoring with STUPID BACKOFF (Brants et al. "
    "2007) in exact integer bits — the context-aware tier above "
    "unigram_surprisal_quality: each consecutive token pair scores "
    "floor(log2(N_pairs / c(w1,w2))) when the bigram was seen at "
    "least twice, else it BACKS OFF to the unigram surprisal of w2 "
    "plus a flat 2-bit penalty (the integer stand-in for stupid "
    "backoff's alpha=0.4 discount). Every log2 is the binary-digit "
    "count of an integer quotient (length(bin(q)) - 1 — the "
    "unigram_surprisal trick), so no libm and the WHOLE two-level LM "
    "is bit-identical cross-engine and value-hash-oracled. Docs "
    "bucket head/middle/tail around the pair-weighted corpus mean "
    "(+-1 bit). Plan shape at 100 TB: the bigram dim is bounded by "
    "DISTINCT pairs (not n); seen-once pairs drop out of it (the "
    "backoff route), which is exactly the pruning a production LM "
    "table applies; corpus scalars collect as two bounded driver "
    "roundtrips from pre-aggregated dims and re-enter as literals — "
    "no single-partition exchange; the per-doc side is one explode, "
    "one pair-keyed join, one unigram broadcast, one doc_id agg.",
    tags=("text", "quality", "pretrain", "scale"),
)
def bigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the raw scan once before the two explode consumers (token
    # unigrams, bigram pairs): the single-split fixture scan would run
    # both explode + partial-agg chains on one core each
    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    tok = toks.select("doc_id", F.explode("t").alias("token"))
    c1 = tok.groupBy("token").agg(F.count("*").alias("c")).localCheckpoint(
        eager=True
    )
    n1 = c1.agg(F.sum("c").cast("bigint").alias("n")).collect()[0]["n"] or 1
    pairs = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS w1, t[i+1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c")).localCheckpoint(
        eager=True
    )
    n2 = c2.agg(F.sum("c").cast("bigint").alias("n")).collect()[0]["n"] or 1
    b2 = c2.filter(F.col("c") >= 2).select(
        "w1",
        "w2",
        (F.length(F.bin(F.expr(f"CAST({n2} AS BIGINT) div c"))) - 1).alias("bits2"),
    )
    b1 = c1.select(
        "token",
        (F.length(F.bin(F.expr(f"CAST({n1} AS BIGINT) div c"))) - 1 + 2).alias(
            "bits1"
        ),
    )
    scored = (
        pairs.join(b2, ["w1", "w2"], "left")
        .join(F.broadcast(b1.withColumnRenamed("token", "w2")), "w2")
        .select("doc_id", F.coalesce("bits2", "bits1").alias("bits"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum("bits").cast("bigint").alias("sum_bits"),
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        F.sum("sum_bits").cast("bigint").alias("all_bits"),
        F.sum("n_pairs").cast("bigint").alias("all_pairs"),
    ).collect()[0]
    corpus_mean = (stats["all_bits"] or 0) / (stats["all_pairs"] or 1)
    mean_bits = F.col("sum_bits").cast("double") / F.col("n_pairs")
    return per_doc.select(
        "doc_id",
        "n_pairs",
        mean_bits.alias("mean_bits"),
        F.when(mean_bits < F.lit(corpus_mean) - 1.0, "head")
        .when(mean_bits > F.lit(corpus_mean) + 1.0, "tail")
        .otherwise("middle")
        .alias("lm_bucket"),
    )


_C_TAU = "0.9"  # containment threshold (decimal literal: exact ceil math)


@q(
    "containment_neardup",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             {_h60_duck('s')} AS h
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])) AS s
        FROM documents
      )
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
      FROM sh a JOIN sh b USING (h)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN sa.n <= sb.n THEN da ELSE db END AS doc_small,
           CASE WHEN sa.n <= sb.n THEN db ELSE da END AS doc_big,
           LEAST(sa.n, sb.n) AS n_small, ni AS n_inter,
           CAST(ni AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
    FROM inter
    JOIN sz sa ON da = sa.doc_id
    JOIN sz sb ON db = sb.doc_id
    WHERE 10 * ni >= 9 * LEAST(sa.n, sb.n)
    """,
    doc=f"Shingle-CONTAINMENT near-dup pairs (|A∩B| / |A| >= {_C_TAU} "
    "over 3-token shingle sets, A = the smaller set): the ASYMMETRIC "
    "measure that catches a short document swallowed whole by a "
    "longer one — exactly the pair symmetric Jaccard misses (the "
    "union denominator dilutes subset matches), and the measure "
    "substring-dup screening papers use doc-level. The Spark plan is "
    "the containment PREFIX FILTER: shingles get a canonical global "
    "order by (df, hash) — a map-side SORT KEY, no global rank "
    "window, unlike the Jaccard prefix which this generalizes — and "
    "a qualifying pair must (pigeonhole) match one of the smaller "
    "doc's floor((1-tau)*m)+1 rarest shingles against the bigger "
    "doc's FULL set, so only small-side prefixes explode against "
    "full lists, with the size order (m_a < m_b, doc_id tiebreak) "
    "inside the join condition. NO length filter applies — "
    "containment does not bound the big side, which is the point. "
    "Candidates verify by int64 hash-array intersection (8-byte "
    "compares; oracle hashes identically). The ORACLE is the "
    "brute-force co-shingle join over the same hashed sets — the "
    "prefix theorem's zero-false-negative claim is value-hash-"
    "proven at every gate scale. Scale: the df dim joins "
    "shuffle-side (shingle vocab is NOT broadcastable at 100 TB), "
    "prefixes shrink the exploded probe side 10x, and the verify "
    "join ships fixed-width int64 arrays only for surviving "
    "candidates.",
    tags=("text", "dedup", "similarity", "pretrain", "scale"),
)
def containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magictables_spark.functions import shingles as _shfn

    # spread before the shingle explode: the per-doc 3-gram fan-out
    # otherwise runs on the scan's split count (dedup_minhash
    # precedent; the distinct's exchange only comes AFTER the explode)
    sh = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select("doc_id", F.explode(_shfn("text", n=3)).alias("s"))
        .distinct()
        .select("doc_id", F.expr(_h60_spark("s")).alias("h"))
    )
    df_dim = sh.groupBy("h").agg(F.count("*").alias("df"))
    ranked = (
        sh.join(df_dim, "h")
        .groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(df, h))), x -> x.h)")
            .alias("hs")
        )
        .withColumn("m", F.size("hs"))
        .withColumn(
            "prefix",
            F.expr(f"slice(hs, 1, m - CAST(ceil({_C_TAU} * m) AS INT) + 1)"),
        )
        # 1024-bit one-hash Bloom bitmap of the shingle set, as 16
        # int64 words: every common shingle sets a common bit, so
        # sum_i bit_count(wa_i & wb_i) upper-bounds |A n B| — lossless.
        .withColumn(
            "w",
            F.expr(
                "aggregate(hs, array_repeat(CAST(0 AS BIGINT), 16), "
                "(acc, x) -> transform(acc, (wd, i) -> "
                "  CASE WHEN CAST(pmod(x, 1024) / 64 AS INT) = i "
                "       THEN wd | shiftleft(CAST(1 AS BIGINT), "
                "                           CAST(pmod(x, 1024) % 64 AS INT)) "
                "       ELSE wd END))"
            ),
        )
        .localCheckpoint(eager=True)  # feeds probe, full, and verify sides
    )
    # Candidate-bound hardening (round-11 sf10 finding): at sf10 the
    # bare co-prefix join admitted 2.6e8 DISTINCT pairs, and the verify
    # join then shipped ~390 B of shingle arrays per pair — a 95 GiB
    # exchange that filled the disk spilling. Both lossless PPJoin-
    # style bounds from simjoin_prefix_filter generalize to
    # containment and evaluate INSIDE the candidate join on narrow
    # rows, before any array attaches:
    #   positional — the first shared canonical-order shingle at
    #   (pa, pb) caps the overlap at 1 + min(m_a - pa, m_b - pb), and
    #   containment needs overlap >= ceil(0.9*m_a) (10x integer form);
    #   every qualifying pair still surfaces via its FIRST shared
    #   prefix shingle, so dropDuplicates loses nothing.
    #   bitmap — a 1024-bit one-hash Bloom sketch of each doc's
    #   shingle set bounds |A n B| by the AND-popcount of the two
    #   sketches. Coarse count HISTOGRAMS cannot separate same-size
    #   random sets (sum min(ha_k, hb_k) ~ m when every bucket holds
    #   many shingles — the first round-11 attempt shipped exactly
    #   that and still admitted 2.6e8 pairs); with 1024 bits and
    #   m ~ doc shingle count (bounded by DOC length, not corpus
    #   size), a background pair's bound is ~m^2/1024 + true overlap,
    #   far under the 0.9*m requirement at any corpus scale.
    # The brute-force oracle remains the zero-false-negative proof at
    # every gate scale.
    pref = ranked.select(
        "doc_id", "m", "w", F.posexplode("prefix").alias("pa0", "h")
    ).select("doc_id", "m", "w", (F.col("pa0") + 1).alias("pa"), "h")
    full = ranked.select(
        "doc_id", "m", "w", F.posexplode("hs").alias("pb0", "h")
    ).select("doc_id", "m", "w", (F.col("pb0") + 1).alias("pb"), "h")
    andpop = None
    for k in range(16):
        term = F.expr(f"bit_count(element_at(a.w, {k + 1}) & element_at(b.w, {k + 1}))")
        andpop = term if andpop is None else andpop + term
    cand = (
        pref.alias("a")
        .join(
            full.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (
                (F.col("a.m") < F.col("b.m"))
                | (
                    (F.col("a.m") == F.col("b.m"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (
                10 * (1 + F.least(F.col("a.m") - F.col("a.pa"), F.col("b.m") - F.col("b.pb")))
                >= 9 * F.col("a.m")
            )
            & (10 * andpop >= 9 * F.col("a.m")),
        )
        .select(
            F.col("a.doc_id").alias("doc_small"), F.col("b.doc_id").alias("doc_big")
        )
        .dropDuplicates()
    )
    sa = ranked.select(
        F.col("doc_id").alias("doc_small"),
        F.col("hs").alias("hs_a"),
        F.col("m").alias("n_small"),
    )
    sb = ranked.select(F.col("doc_id").alias("doc_big"), F.col("hs").alias("hs_b"))
    return (
        cand.join(sa, "doc_small")
        .join(sb, "doc_big")
        .withColumn("n_inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .filter(10 * F.col("n_inter") >= 9 * F.col("n_small"))
        .select(
            "doc_small",
            "doc_big",
            "n_small",
            "n_inter",
            (F.col("n_inter").cast("double") / F.col("n_small")).alias("containment"),
        )
    )
