"""Pipeline ops pack 2 (round-2 coverage widening, part 2).

More of the operators a training-data pipeline actually runs:

- ``interval_join_attribution`` — event attribution (purchases to the
  same user's clicks in the preceding window), implemented the
  scale-safe way: time-bucketized equi-join, never an inequality-only
  join that degenerates to a broadcast-nested-loop;
- ``clean_text_normalize``     — text normalization (lowercase, strip
  non-alphanumerics, collapse whitespace) with before/after audit;
- ``weighted_sample``          — deterministic importance sampling by
  a per-row weight (multiplicative-hash threshold, no RNG);
- ``cluster_canonical``        — pick the canonical document per
  near-duplicate cluster (the "keep one per group" step after
  dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magictables_spark.plans.registry import _t, q

_WINDOW_MS = 30 * 60 * 1000  # 30-minute attribution window


@q(
    "interval_join_attribution",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           COUNT(c.event_id) AS n_clicks_30m
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND epoch_ms(c.ts) BETWEEN epoch_ms(p.ts) - {_WINDOW_MS} AND epoch_ms(p.ts)
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    doc="Batch interval-join attribution: every purchase counts the "
    "same user's clicks in the preceding 30 minutes (the batch twin "
    "of stream_interval_join). Scale shape: both sides bucket on "
    "floor(ms / 30min) and purchases probe (bucket, bucket-1), so the "
    "join is an EQUI-join on (user_id, bucket) with the exact "
    "interval as a post-filter — a pure inequality join here would "
    "fall back to broadcast-nested-loop and die at 100 TB. Each click "
    "lands in exactly one bucket, so no dedup is needed after the "
    "probe union.",
    tags=("events", "join", "scale"),
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; session tz is UTC, so the cast is a pure
    # reinterpretation and matches DuckDB's epoch_ms on the naive value
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        ms.alias("p_ms"),
        F.floor(ms / _WINDOW_MS).alias("b"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        ms.alias("c_ms"),
        F.floor(ms / _WINDOW_MS).alias("cb"),
    )
    # probe both candidate buckets with one explode — equi-join keys
    probes = purchases.select(
        "purchase_id",
        "user_id",
        "p_ms",
        F.explode(F.array(F.col("b"), F.col("b") - 1)).alias("cb"),
    )
    hits = probes.join(clicks, ["user_id", "cb"], "left").withColumn(
        "hit",
        (
            F.col("c_ms").isNotNull()
            & (F.col("c_ms") >= F.col("p_ms") - _WINDOW_MS)
            & (F.col("c_ms") <= F.col("p_ms"))
        ).cast("long"),
    )
    return hits.groupBy("purchase_id", "user_id").agg(
        F.sum("hit").alias("n_clicks_30m")
    )


@q(
    "clean_text_normalize",
    oracle="""
    WITH cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS clean
      FROM documents WHERE doc_id % 20 = 0
    )
    SELECT c.doc_id,
           length(d.text) AS n_chars_raw,
           length(c.clean) AS n_chars_clean,
           substr(c.clean, 1, 40) AS clean_prefix
    FROM cleaned c JOIN documents d ON c.doc_id = d.doc_id
    ORDER BY c.doc_id
    """,
    doc="Text normalization for training corpora: lowercase, replace "
    "every non-[a-z0-9 ] character with a space, collapse runs, trim "
    "— with a before/after char-count audit (normalization shrinkage "
    "is itself a quality signal). Regex kept in the RE2-safe subset "
    "(explicit character classes, no lookaround) so Spark's Java "
    "regex and DuckDB's RE2 agree byte-for-byte. Pure map-side "
    "codegen, zero shuffle.",
    tags=("text", "pipeline"),
)
def clean_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_chars_raw"),
            F.length(clean).cast("bigint").alias("n_chars_clean"),
            F.substring(clean, 1, 40).alias("clean_prefix"),
        )
        .orderBy("doc_id")
    )


@q(
    "weighted_sample",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    -- explicit FLOOR: DuckDB's / on integers is float division,
    -- Spark's weight is floored — align the threshold exactly
    WHERE (doc_id * 2654435761) % 1000 < least(CAST(FLOOR(n_chars / 4) AS BIGINT), 999)
    GROUP BY lang ORDER BY lang
    """,
    doc="Deterministic importance sampling: keep each document with "
    "probability proportional to its weight (here length/4000, "
    "capped) using a Knuth multiplicative-hash threshold on the id — "
    "pure int64 arithmetic, no RNG, so the sample is append-stable "
    "and identical across engines, retries and partitionings (the "
    "properties rand()-based sampling loses on a cluster). The "
    "up-weight-the-long-docs counterpart to stratified_hash_sample's "
    "per-language rebalancing.",
    tags=("pipeline", "sampling"),
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    keep = (F.col("doc_id") * F.lit(2654435761)) % 1000 < F.least(
        F.floor(F.col("n_chars") / 4), F.lit(999)
    )
    return (
        _t(spark, sf_dir, "documents")
        .filter(keep)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


@q(
    "cluster_canonical",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(range(1, len(string_split(text, ' ')) - 1),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i+1] || ' ' ||
                                   string_split(text, ' ')[i+2])
             )) AS shingle
      FROM documents WHERE doc_id < 200
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    ), clusters AS (
      SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id
    )
    SELECT cluster, canonical_doc, n_docs FROM (
      SELECT c.cluster,
             d.doc_id AS canonical_doc,
             ROW_NUMBER() OVER (PARTITION BY c.cluster
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY c.cluster) AS n_docs
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    ) WHERE rn = 1
    ORDER BY cluster
    """,
    doc="Canonical-document election: after dedup_clusters groups "
    "near-duplicates, keep exactly one representative per cluster — "
    "longest document wins, doc_id breaks ties (fully deterministic). "
    "This is the step that turns dedup analysis into an actual "
    "deduplicated corpus. Spark shape: the |V|-row cluster map joins "
    "the doc metadata and one window per cluster elects the winner; "
    "the documents themselves never shuffle. Oracle extends the "
    "dedup_clusters recursive-CTE closure with the same election "
    "window.",
    tags=("text", "dedup", "pipeline"),
)
def cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magictables_spark.plans.textops import dedup_clusters

    clusters = dedup_clusters(spark, sf_dir)  # (doc_id, cluster)
    meta = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        clusters.join(meta, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(Window.partitionBy("cluster")))
        .filter(F.col("rn") == 1)
        .select(
            "cluster", F.col("doc_id").alias("canonical_doc"), "n_docs"
        )
        .orderBy("cluster")
    )
