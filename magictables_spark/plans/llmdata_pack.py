"""LLM-training-data preparation: document chunking, sequence packing,
text redaction.

These are the map-side text transforms between a curated corpus and a
tokenizer: split long documents into overlapping context-window
chunks, pack short documents into budget-bounded sequences, scrub
PII-shaped spans. All three are pure expressions (chunking/redaction)
or a single window pass (packing) — no Python UDFs, no driver loops,
so they scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from magictables_spark.plans.registry import _t, q
from magictables_spark.plans.catalog import spread

CHUNK = 50  # tokens per chunk
STRIDE = 40  # tokens advanced per chunk (CHUNK-STRIDE = overlap)


@q(
    "doc_chunking",
    oracle=f"""
    SELECT doc_id, chunk_idx,
           array_to_string(
             list_slice(string_split(text, ' '),
                        chunk_idx * {STRIDE} + 1,
                        chunk_idx * {STRIDE} + {CHUNK}), ' ') AS chunk_text,
           len(list_slice(string_split(text, ' '),
                          chunk_idx * {STRIDE} + 1,
                          chunk_idx * {STRIDE} + {CHUNK})) AS n_tokens
    FROM (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(
               greatest(len(string_split(text, ' ')) - {CHUNK}, 0)
               / {STRIDE}.0) AS BIGINT) + 1)) AS chunk_idx
      FROM documents
      WHERE doc_id % 25 = 0
    ) c
    """,
    doc=f"Sliding-window chunking: {CHUNK}-token chunks advancing "
    f"{STRIDE} tokens ({CHUNK - STRIDE}-token overlap) — the "
    "context-window splitter for embedding/pretraining pipelines. "
    "Chunk count and slices are pure integer arithmetic over the "
    "token array (transform over an index sequence + slice), emitted "
    "via explode: map-side only, no shuffle, no UDF. The final "
    "partial chunk is kept (slice truncates at the array end).",
    tags=("text", "pipeline", "llm"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n_chunks = (
        F.ceil(F.greatest(F.size(toks) - CHUNK, F.lit(0)) / float(STRIDE)).cast("long")
        + 1
    )
    # sequence(0, n-1): n_chunks >= 1 always, so never a descending range
    idx = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.explode(idx).alias("chunk_idx"), F.col("text"))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(
                " ",
                F.slice(
                    F.split(F.col("text"), " "),
                    (F.col("chunk_idx") * STRIDE + 1).cast("int"),
                    CHUNK,
                ),
            ).alias("chunk_text"),
            F.size(
                F.slice(
                    F.split(F.col("text"), " "),
                    (F.col("chunk_idx") * STRIDE + 1).cast("int"),
                    CHUNK,
                )
            ).cast("bigint").alias("n_tokens"),
        )
    )


@q(
    "sequence_packing",
    oracle="""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), placed AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM sized
    )
    SELECT CAST(cum_before // 2048 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM placed
    GROUP BY 1
    """,
    doc="Sequence packing: assign documents (in doc_id order) to "
    "2048-token training bins by integer division of the running "
    "token count — the deterministic streaming-order packer (greedy "
    "best-fit is order-dependent and unparallelizable; this one is a "
    "single window pass and reproducible on any engine). Bins can "
    "overflow by at most one document — the standard concat-then-cut "
    "pretraining tradeoff. The global ORDER BY serializes one window "
    "pass; at 100 TB you partition the window by a shard key "
    "(hash-bucket of doc_id) and pack within shards — same code with "
    "partitionBy added, kept global here for exact oracle parity.",
    tags=("text", "pipeline", "llm"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    sized = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    placed = sized.withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        placed.groupBy(F.expr("cum_before div 2048").alias("bin_id"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens"))
    )


@q(
    "sequence_packing_sharded",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             ascii(md5(CAST(doc_id AS VARCHAR))) % 8 AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), placed AS (
      SELECT shard, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM sized
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(cum_before // 2048 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM placed
    GROUP BY 1, 2
    """,
    doc="The scale-safe twin of sequence_packing: documents are first "
    "hash-bucketed into 8 shards (first md5 hex byte of doc_id — the "
    "same content-hash determinism as the samplers) and the running-sum "
    "window packs WITHIN each shard, so the plan's window exchange is "
    "hashpartitioning(shard), never the single-partition global sort "
    "that made the exact variant a declared scale-killer. Bins are "
    "(shard, bin_id) pairs; each shard packs independently — exactly "
    "how a 100 TB pretraining run shards its packer. The global "
    "variant stays registered as the exact-parity baseline; a plan "
    "assertion in tests/test_pipeline_invariants.py pins the "
    "multi-partition window.",
    tags=("text", "pipeline", "llm", "scale"),
)
def sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    sized = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.ascii(F.md5(F.col("doc_id").cast("string"))) % 8).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sized.withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return placed.groupBy(
        F.col("shard").cast("int").alias("shard"),
        F.expr("cum_before div 2048").alias("bin_id"),
    ).agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens"))


@q(
    "text_redact",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             '[0-9]+', '<NUM>', 'g') AS redacted,
           len(regexp_extract_all(text, '[0-9]+')) AS n_num_spans
    FROM documents
    WHERE doc_id % 25 = 0
    """,
    doc="PII-shaped redaction: email-like spans then digit runs "
    "replaced with typed placeholders, plus a span count for audit. "
    "Plain POSIX character classes so both regex engines agree "
    "(Spark's regexp_replace is global by default; DuckDB takes the "
    "'g' flag). Pure codegen string kernel — the scrub pass before "
    "any text leaves the pipeline.",
    tags=("text", "pipeline", "quality"),
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>"),
        "[0-9]+",
        "<NUM>",
    )
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id",
            redacted.alias("redacted"),
            F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("bigint").alias(
                "n_num_spans"
            ),
        )
    )


@q(
    "contamination_check",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), shingled AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 7, 0) + 1),
               i -> array_to_string(list_slice(t, i, i + 7), ' ')))) AS sh
      FROM toks
    ), bench AS (
      SELECT DISTINCT sh FROM shingled WHERE doc_id % 97 = 0
    ), train AS (
      SELECT doc_id, sh FROM shingled WHERE doc_id % 97 <> 0
    ), hits AS (
      SELECT DISTINCT t.doc_id
      FROM train t JOIN bench b ON t.sh = b.sh
    )
    SELECT (SELECT COUNT(*) FROM hits) AS n_contaminated,
           (SELECT COUNT(DISTINCT doc_id) FROM documents
            WHERE doc_id % 97 <> 0) AS n_train_docs
    """,
    doc="Benchmark decontamination: flag training documents sharing "
    "any 8-token shingle with the held-out set (doc_id % 97 == 0 "
    "stands in for the benchmark corpus) — the leakage scan every "
    "pretraining pipeline runs before training. Spark shape: both "
    "sides shingle map-side (distinct within doc), the held-out "
    "shingle set is tiny and BROADCAST into a left-semi join — the "
    "100 TB train side is never shuffled at all. Counts are exact.",
    tags=("text", "pipeline", "llm", "dedup"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magictables_spark.functions import shingles

    # spread the raw scan before the 8-gram shingle assembly (heavy
    # per-row compute; single-split fixture scan) — the bench/train
    # branches then reuse one exchanged subtree instead of shingling
    # the corpus twice serially
    docs = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select("doc_id", shingles("text", n=8).alias("sh"))
    )
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("sh").alias("sh"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        train.select("doc_id", F.explode("sh").alias("sh"))
        .join(F.broadcast(bench), "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    totals = train.agg(F.countDistinct("doc_id").alias("n_train_docs"))
    return contaminated.agg(F.count("*").alias("n_contaminated")).crossJoin(
        F.broadcast(totals)
    )


@q(
    "stratified_hash_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE WHEN lang = 'en' THEN '2' ELSE '8' END
    GROUP BY lang
    """,
    doc="Stratified rebalancing sample: majority language keeps "
    "~12.5% (hex prefix < '2'), minority languages keep ~50% "
    "(< '8') — the down-sample-the-head / keep-the-tail move that "
    "rebalances a language-skewed corpus. Same content-hash "
    "determinism as sample_hash_bucket (append-stable, "
    "engine-independent), per-stratum thresholds via one CASE in a "
    "scan filter: zero shuffle until the count.",
    tags=("pipeline", "sampling"),
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    threshold = F.when(F.col("lang") == "en", "2").otherwise("8")
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.md5(F.col("doc_id").cast("string")) < threshold)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("sum_chars"))
    )


@q(
    "token_id_encode",
    oracle="""
    WITH tok AS (
      -- (token, 1-based position) pairs; this DuckDB build lacks WITH
      -- ORDINALITY, so the ordinal rides a list_zip against range()
      SELECT doc_id, z[1] AS token, z[2] AS ord FROM (
        SELECT d.doc_id,
               unnest(list_zip(string_split(d.text, ' '),
                 range(1, len(string_split(d.text, ' ')) + 1))) AS z
        FROM documents d
      )
    ), vocab AS (
      SELECT token, ROW_NUMBER() OVER (ORDER BY c DESC, token) - 1 AS id
      FROM (SELECT token, COUNT(*) AS c FROM tok GROUP BY token)
      QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, token) <= 1000
    )
    SELECT tok.doc_id,
           array_to_string(list(COALESCE(v.id, -1) ORDER BY tok.ord), ' ')
             AS ids,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unk
    FROM tok LEFT JOIN vocab v ON tok.token = v.token
    GROUP BY tok.doc_id
    ORDER BY tok.doc_id
    """,
    doc="Token-to-id encoding — the last text-side step before a "
    "training pipeline writes tensors: build the vocabulary (top-1000 "
    "tokens by frequency, ties broken lexically so the id assignment "
    "is deterministic on any engine; ids are dense 0..V-1 in rank "
    "order), then encode every document as its ORDERED id sequence "
    "with out-of-vocabulary tokens mapped to -1 (the unk id) plus "
    "per-doc token/unk counts for coverage monitoring. Plan shape: "
    "the vocab is a VOCAB-sized dim built with one token-count "
    "aggregate and joined back BROADCAST, so the corpus pays one "
    "posexplode + one doc_id exchange to reassemble ordered arrays — "
    "no global sort, no shuffle keyed on the token. At 100 TB the "
    "vocab build runs on a sample or a count-min sketch and the "
    "encode stays the same broadcast join; pairs with "
    "sequence_packing (bins) and reproducible_shard_shuffle (order) "
    "to complete the tensor-prep chain. Fully value-hash-oracled "
    "including the id sequence (surfaced as a space-joined string — "
    "position-exact, and scalar for the driver canon).",
    tags=("text", "pipeline", "llm", "scale"),
)
def token_id_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the raw scan before the posexplode (single-split fixture
    # scan; the vocab agg and the encode join both consume it)
    tok = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "id",
            F.row_number().over(Window.orderBy(F.desc("c"), F.asc("token"))) - 1,
        )
        .filter(F.col("id") < 1000)
        .select("token", "id")
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce("id", F.lit(-1)).alias("id"),
        )
        .groupBy("doc_id")
        .agg(
            # space-joined id string, not array<int>: the driver canon
            # cannot sort list cells (r08 verdict); position-exact
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, id))),"
                " s -> CAST(s.id AS STRING)), ' ')"
            ).alias("ids"),
            F.count("*").alias("n_tokens"),
            F.sum((F.col("id") == -1).cast("bigint")).alias("n_unk"),
        )
    )


@q(
    "feature_hash_vectorize",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 64
               AS bucket,
             CASE WHEN ((CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT)
                         >> 6) & 1) = 1 THEN 1 ELSE -1 END AS sgn
      FROM tok
    ), sums AS (
      SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS s
      FROM hashed GROUP BY doc_id, bucket
    ), dense AS (
      SELECT d.doc_id, b.b AS bucket, COALESCE(s.s, 0) AS v
      FROM (SELECT DISTINCT doc_id FROM sums) d
      CROSS JOIN (FROM range(0, 64) t(b)) b
      LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.bucket = b.b
    )
    SELECT doc_id,
           array_to_string(list(v ORDER BY bucket), ',') AS vec,
           CAST(SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz
    FROM dense
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Feature hashing (Weinberger et al. 2009, the 'hashing trick') "
    "— the vectorizer that scales where a vocabulary dictionary "
    "cannot: each token hashes straight to one of 64 buckets "
    "(md5-derived 60-bit hash % D, so NO vocab build, no dictionary "
    "broadcast, no OOV concept) with a SIGNED contribution (an "
    "independent bit of the same hash -> ±1), which keeps the "
    "hash-collision noise zero-mean — the property that makes hashed "
    "features usable for linear models at any corpus size. Output: "
    "the dense 64-bucket signed-count vector per document + its nnz. "
    "Entirely integer arithmetic on a cross-engine-identical hash, so "
    "the WHOLE vectorization is value-hash-oracled (the dense vector "
    "surfaces comma-joined — position-exact, scalar for the driver "
    "canon). Plan shape: one explode, one (doc, bucket) partial agg, "
    "one doc-keyed map-assembly — zero joins, zero driver state; at "
    "100 TB this is the map-side-combinable shape that replaces "
    "token_id_encode's vocab broadcast when the vocabulary itself "
    "would not fit (the classic trade: ids are invertible, hashes "
    "are not).",
    tags=("text", "pipeline", "llm", "ml", "scale"),
)
def feature_hash_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = "CAST(CONV(SUBSTRING(md5(token), 1, 15), 16, 10) AS BIGINT)"
    # spread the raw scan before the explode + md5 chain (single-split
    # fixture scan; the committed text-pack spread pattern)
    tok = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    )
    hashed = tok.select(
        "doc_id",
        F.expr(f"{h} % 64").alias("bucket"),
        F.expr(f"CASE WHEN (({h} >> 6) & 1) = 1 THEN 1 ELSE -1 END").alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("bucket", "s"))).alias("m")
        )
        .select(
            "doc_id",
            # comma-joined dense vector, not array<bigint>: the driver
            # canon cannot sort list cells (r08 verdict); position-exact
            F.expr(
                "array_join(transform(sequence(0, 63),"
                " i -> CAST(coalesce(element_at(m, CAST(i AS BIGINT)),"
                " CAST(0 AS BIGINT)) AS STRING)), ',')"
            ).alias("vec"),
            F.expr(
                "CAST(aggregate(transform(sequence(0, 63),"
                " i -> CASE WHEN coalesce(element_at(m, CAST(i AS BIGINT)), 0L)"
                " <> 0 THEN 1 ELSE 0 END), 0L, (a, x) -> a + x) AS BIGINT)"
            ).alias("nnz"),
        )
    )


# ---------------------------------------------------------------------------
# bpe_train_merges — iterative byte-pair-encoding vocabulary training
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 6


def _bpe_ctes(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE training as DuckDB CTEs — the kmeans_lloyd trick
    applied to tokenizer training; shared by the train and apply
    oracles. Greedy left-to-right non-overlapping pair merging is
    expressed relationally: merge candidates can only overlap when
    left == right symbol, in which case they form runs of consecutive
    positions; greedy keeps the odd-ranked candidates of each run (the
    parity rule), which is provably what a left-to-right fold does."""
    ctes = [
        """wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ), s0 AS (
      SELECT word, freq, CAST(z[2] AS INT) AS pos, z[1] AS sym FROM (
        SELECT word, freq,
               unnest(list_zip(
                 list_transform(range(1, length(word) + 1),
                                i -> substr(word, CAST(i AS INT), 1)),
                 range(1, length(word) + 1))) AS z
        FROM wf)
    )"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""c{r} AS MATERIALIZED (
      SELECT a.sym AS l, b.sym AS r2, CAST(SUM(a.freq) AS BIGINT) AS c
      FROM s{r} a JOIN s{r} b ON a.word = b.word AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ), b{r} AS MATERIALIZED (
      SELECT l, r2, c FROM c{r} ORDER BY c DESC, l, r2 LIMIT 1
    ), k{r} AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos,
               ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
        FROM (
          SELECT a.word, a.pos,
                 a.pos - ROW_NUMBER() OVER (PARTITION BY a.word
                                            ORDER BY a.pos) AS grp
          FROM s{r} a
          JOIN s{r} b ON a.word = b.word AND b.pos = a.pos + 1
          CROSS JOIN b{r}
          WHERE a.sym = b{r}.l AND b.sym = b{r}.r2
        )
      ) WHERE rn % 2 = 1
    ), s{r + 1} AS MATERIALIZED (
      SELECT word, freq,
             CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS INT)
               AS pos,
             sym
      FROM (
        SELECT s.word, s.freq, s.pos,
               CASE WHEN ks.pos IS NOT NULL THEN s.sym || s.lead_sym
                    ELSE s.sym END AS sym
        FROM (
          SELECT s{r}.*, LEAD(sym) OVER (PARTITION BY word ORDER BY pos)
                   AS lead_sym
          FROM s{r}
        ) s
        LEFT JOIN k{r} ks ON s.word = ks.word AND s.pos = ks.pos
        LEFT JOIN k{r} kd ON s.word = kd.word AND s.pos = kd.pos + 1
        WHERE kd.pos IS NULL
      )
    )"""
        )
    return ", ".join(ctes)


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    unions = "\n      UNION ALL ".join(
        f"SELECT {r + 1} AS rank, l AS left_sym, r2 AS right_sym,"
        f" l || r2 AS merged, c AS pair_count FROM b{r}"
        for r in range(rounds)
    )
    return f"""
    WITH {_bpe_ctes(rounds)}
    SELECT * FROM ({unions}) ORDER BY rank
    """


@q(
    "bpe_train_merges",
    oracle=_bpe_oracle(),
    doc="Byte-pair-encoding TOKENIZER TRAINING (Sennrich et al. 2016 /"
    " the GPT-2 vocabulary recipe) — the step every LLM data pipeline "
    "runs before token_id_encode can exist: starting from characters, "
    "repeatedly count adjacent symbol pairs over the word-frequency "
    "dictionary, merge the most frequent pair (ties to the "
    "lexicographically smallest, so the learned vocabulary is "
    "deterministic on any engine), and emit the ordered merge table "
    "(rank, left, right, merged, pair_count) that defines the "
    "tokenizer. Plan shape per round: pair counts are a vocab-sized "
    "groupBy-sum (the corpus collapses to DISTINCT words x freq up "
    "front, so round cost scales with the vocabulary, not the corpus "
    "- the reason BPE training map-reduces at 100 TB), the argmax is "
    "a 1-row driver collect (the kmeans-centroid roundtrip), and the "
    "merge itself is a map-side aggregate() fold per word - greedy "
    "left-to-right non-overlapping, no shuffle. localCheckpoint per "
    "round keeps lineage flat. The DuckDB oracle replays training "
    "with UNROLLED relational CTEs whose run-parity rule provably "
    "equals the greedy fold (overlapping candidates exist only when "
    "left = right and form position runs; greedy takes the odd ones), "
    "so all six learned merges and their counts are value-hash-"
    "checked cross-engine.",
    tags=("text", "pipeline", "llm", "iterative", "scale"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    seqs = words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    merges = []
    for r in range(_BPE_ROUNDS):
        # size < 2 guard: sequence(0, -1) DESCENDS in Spark, it is not
        # empty — single-symbol words must contribute no pairs
        pairs = seqs.filter(F.expr("size(syms) >= 2")).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS l, syms[i + 1] AS r2))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r2")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), "l", "r2")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r2"], best[0]["c"]
        merges.append((r + 1, left, right, left + right, cnt))
        # greedy left-to-right merge: a map-side fold per word (pend =
        # the symbol awaiting its right neighbor); no shuffle
        seqs = (
            seqs.withColumn("_L", F.lit(left))
            .withColumn("_R", F.lit(right))
            .withColumn(
                "syms",
                F.expr(
                    """
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
                ),
            )
            .drop("_L", "_R")
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        merges,
        "rank int, left_sym string, right_sym string, merged string,"
        " pair_count bigint",
    ).orderBy("rank")


@q(
    "bpe_apply_encode",
    oracle=f"""
    WITH {_bpe_ctes()}, per_word AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(length(word) AS BIGINT) AS n_chars
      FROM s{_BPE_ROUNDS} GROUP BY word
    ), doc_words AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n_w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id % 5 = 0
      ) WHERE word <> '' GROUP BY doc_id, word
    )
    SELECT d.doc_id,
           CAST(SUM(d.n_w * p.n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(d.n_w * p.n_tok) AS BIGINT) AS n_bpe_tokens,
           (CAST(SUM(d.n_w * p.n_chars) AS DOUBLE)
            / NULLIF(CAST(SUM(d.n_w * p.n_tok) AS DOUBLE), 0.0))
             AS chars_per_token
    FROM doc_words d JOIN per_word p USING (word)
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
    doc="Tokenizer APPLICATION — the encode half of the BPE lifecycle "
    "(bpe_train_merges learns the merge table; this slug applies all "
    f"{_BPE_ROUNDS} merges in rank order to every document and "
    "reports per-doc character count, BPE token count and the "
    "chars-per-token compression the tokenizer achieves — the number "
    "a pretraining-budget estimate actually consumes). Plan shape: "
    "merges apply on the DISTINCT-word vocabulary (one aggregate() "
    "fold per merge, vocab-sized), then a BROADCAST join of the "
    "per-word token counts back to the doc-word counts — corpus cost "
    "is one explode + one (doc, word) aggregate regardless of merge "
    "count, the same dictionary-factoring that makes BPE encode "
    "map-reduce at 100 TB. Oracle: the same unrolled training CTEs as "
    "bpe_train_merges with the apply/aggregate tail — the WHOLE "
    "lifecycle train -> encode -> stats is value-hash-checked.",
    tags=("text", "pipeline", "llm", "scale"),
)
def bpe_apply_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    seqs = words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    merge_fold = """
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
    for _r in range(_BPE_ROUNDS):
        pairs = seqs.filter(F.expr("size(syms) >= 2")).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS l, syms[i + 1] AS r2))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r2")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), "l", "r2")
            .limit(1)
            .collect()
        )
        if not best:
            break
        seqs = (
            seqs.withColumn("_L", F.lit(best[0]["l"]))
            .withColumn("_R", F.lit(best[0]["r2"]))
            .withColumn("syms", F.expr(merge_fold))
            .drop("_L", "_R")
            .localCheckpoint(eager=True)
        )
    per_word = seqs.select(
        "word",
        F.size("syms").cast("long").alias("n_tok"),
        F.length("word").cast("long").alias("n_chars"),
    )
    doc_words = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("long").alias("n_w"))
    )
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("n_w * n_chars")).cast("long").alias("n_chars"),
            F.sum(F.expr("n_w * n_tok")).cast("long").alias("n_bpe_tokens"),
        )
        .selectExpr(
            "doc_id",
            "n_chars",
            "n_bpe_tokens",
            "(CAST(n_chars AS DOUBLE) / NULLIF(CAST(n_bpe_tokens AS DOUBLE),"
            " 0.0)) AS chars_per_token",
        )
    )
