"""MLlib-native variants of the dedup/similarity/text operators
(SURVEY §7.4: "dedup/similarity/text — built-in MLlib + small glue").

These sit beside the expression-based implementations (similarity.py,
textops.py): the expression versions are oracle-checkable and often
faster at these shapes; the MLlib versions exercise the battle-tested
library paths (Vector columns, fitted models) users migrating real
pipelines will expect. All rows-only (MLlib hashes/seeds are
engine-specific); cross-checked against the exact operators in
tests/test_mllib.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magictables_spark.plans.registry import _t, q
from magictables_spark.plans.catalog import spread


def _doc_shingle_vectors(spark: SparkSession, sf_dir: str, max_id: int = 200):
    """documents -> (doc_id, features) sparse binary shingle vectors via
    Tokenizer-like split + HashingTF (2^18 buckets)."""
    from pyspark.ml.feature import HashingTF

    toks = F.split(F.col("text"), " ")
    from magictables_spark.functions import shingles as _sh

    shingles = _sh("text", n=3)
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < max_id)
        .select("doc_id", shingles.alias("sh"))
        .filter(F.size("sh") > 0)
    )
    htf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True)
    return htf.transform(docs)


@q(
    "dedup_minhash_mllib",
    oracle=None,
    doc="Fuzzy dedup via MLlib MinHashLSH over hashed shingle vectors: "
    "approxSimilarityJoin at Jaccard distance <= 0.5. Same banding "
    "theory as dedup_minhash but on the library path (Vector columns, "
    "fitted model, built-in join). Rows-only; agreement with the exact "
    "jaccard pairs asserted in tests/test_mllib.py.",
    tags=("text", "dedup", "mllib", "scale"),
)
def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import MinHashLSH

    vecs = _doc_shingle_vectors(spark, sf_dir)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42).fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (1 - F.col("jaccard_dist")).alias("jaccard"),
        )
    )


@q(
    "ann_brp_lsh_mllib",
    oracle=None,
    doc="Approximate nearest neighbors via MLlib BucketedRandomProjection"
    "LSH (Euclidean) on the embeddings table: approxNearestNeighbors "
    "for 3 probe vectors, k=10. On unit-normalized vectors Euclidean "
    "NN order == cosine NN order, so recall vs the exact cosine top-k "
    "is asserted in tests. Rows-only (seeded random projections).",
    tags=("similarity", "ann", "mllib", "scale"),
)
def ann_brp_lsh_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("raw"))
    )
    emb = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(emb).select("vec_id", "features")
    if emb.isEmpty():  # .fit refuses zero rows; so would the probe loop
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, euclidean double"
        )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=6, seed=42
    ).fit(emb)
    probes = emb.filter(F.col("vec_id") < 3).collect()
    if not probes:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, euclidean double"
        )
    out = None
    for p in probes:
        nn = model.approxNearestNeighbors(emb, p.features, 11).filter(
            F.col("vec_id") != p.vec_id
        ).limit(10)
        nn = nn.select(
            F.lit(p.vec_id).alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("distCol").alias("euclidean"),
        )
        out = nn if out is None else out.unionByName(nn)
    return out


@q(
    "tfidf_mllib",
    oracle=None,
    doc="TF-IDF via the MLlib pipeline (HashingTF -> IDF) producing "
    "sparse vectors per document — the feature-extraction path that "
    "feeds MLlib models. Rows-only (hash-bucketed terms aren't "
    "comparable to the exact term_freq table); vector norms sanity-"
    "checked in tests. numFeatures is 2^12: the scalar projection for "
    "the rows-only gate densifies via vector_to_array, so its cost is "
    "rows x numFeatures regardless of sparsity — the sf0.1 sweep "
    "measured the 2^16 config at 36 s of pure HOF element-walking "
    "(5k docs x 65k slots) vs ~2 s at 2^12, and a 31-word fixture "
    "vocabulary doesn't need 65k hash buckets. A model pipeline that "
    "keeps vectors SPARSE end-to-end would use 2^18+ at corpus scale.",
    tags=("text", "tfidf", "mllib"),
)
def tfidf_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import IDF, HashingTF

    # spread before HashingTF + the dense per-slot projection: the
    # rows x numFeatures scalar gate (the dominant cost, see docstring)
    # otherwise runs on the scan's split count (measured 2 tasks /
    # 22.2 s of the 23.4 s wall at sf1 — dedup_minhash precedent)
    docs = (
        _t(spark, sf_dir, "documents")
        .transform(spread)
        .select("doc_id", F.split(F.col("text"), " ").alias("tokens"))
    )
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 12).transform(docs)
    if tf.isEmpty():  # IDF.fit refuses zero rows
        return spark.createDataFrame(
            [], "doc_id bigint, tfidf_sq_norm double, n_terms int"
        )
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    out = idf_model.transform(tf)
    # project to a stable scalar schema for the rows-only gate
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x).alias("tfidf_sq_norm"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_terms"),
    )
