"""Product-quantization slugs (vector_quantize_pq / ann_pq_rescore).

The hash oracles prove cross-engine exactness of election, Lloyd
training, encoding, ADC and rescore; these tests gate the QUALITY
properties the oracle can't see:
- recall of the final top-10 vs the exact sim_cosine_topk;
- the Lloyd rounds actually reduce total distortion vs the raw
  md5-elected codebook (training does something);
- code-space invariants: 16 codes per vector, each in [1, 16] — the
  8-byte storage claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from magictables_spark.plans.queries import REGISTRY


def test_pq_rescore_recall(spark, sf_dir):
    """Trained-codebook ADC at max(100, n/10) candidates must recover
    most of the exact top-10 (measured 0.94-0.96 on the 500-vector
    draws and 0.88 on the 2000-vector sf0.1 draw; gate with margin)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_pq_rescore"].fn(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"PQ-rescore recall {recall:.2f}"


def test_pq_codes_are_8_bytes_of_codespace(spark, sf_dir):
    from magictables_spark.plans.similarity import _PQ_K, _PQ_M

    rows = REGISTRY["vector_quantize_pq"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # codes surface comma-joined (driver-safe scalar since r9)
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == _PQ_M
        assert all(1 <= c <= _PQ_K for c in codes), r.codes
        assert r.recon_l2 >= 0


def test_pq_persisted_serves_identically_and_warm(spark, sf_dir):
    """Store-roundtrip ≡ direct compute (deterministic encode), and a
    second invocation serves from the existing store version (no
    rebuild — the build-once/serve-many contract)."""
    from magictables_spark.plans.similarity import _pq_persisted_index

    direct = sorted(
        tuple(r) for r in REGISTRY["ann_pq_rescore"].fn(spark, sf_dir).collect()
    )
    served = sorted(
        tuple(r) for r in REGISTRY["ann_pq_persisted"].fn(spark, sf_dir).collect()
    )
    assert served == direct

    wh, ck, ek, _tag, _n = _pq_persisted_index(spark, sf_dir)

    def versions():
        return (
            [v["version"] for v in wh.list_versions(ck)],
            [v["version"] for v in wh.list_versions(ek)],
        )

    v1 = versions()
    REGISTRY["ann_pq_persisted"].fn(spark, sf_dir).collect()
    assert versions() == v1


def test_pq_append_store_covers_the_grown_corpus(spark, sf_dir):
    """After the append, the code table holds one row per corpus
    vector (history encode + O(batch) increment), and every vector's
    code row exists exactly once."""
    from magictables_spark.plans.similarity import (
        APPEND_SPLIT,
        _pq_persisted_index,
    )

    REGISTRY["ann_pq_index_append"].fn(spark, sf_dir).collect()
    wh, ck, ek, tag, n_vec = _pq_persisted_index(
        spark, sf_dir, hist_limit=APPEND_SPLIT
    )
    hist = wh.read_table(spark, ek)
    appended = wh.read_table(spark, f"pqA_{tag}")
    assert hist.count() == min(APPEND_SPLIT, n_vec)
    assert appended.count() == n_vec
    assert appended.select("vec_id").distinct().count() == n_vec


def test_pq_store_stream_grows_by_the_increment_and_serves_warm(spark, sf_dir):
    """The streamed code store ends holding one code row per corpus
    vector (history seed + one append per shard), and a warm
    re-invocation replays the checkpoint without touching the store."""
    import hashlib
    import os

    from magictables_spark.plans.similarity import APPEND_SPLIT
    from magictables_spark.warehouse import corpus_fingerprint, store_root

    r1 = sorted(
        tuple(r) for r in REGISTRY["pq_store_stream"].fn(spark, sf_dir).collect()
    )
    cfp = corpus_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    stag = hashlib.md5(
        f"v2:pqstream:{APPEND_SPLIT}:{os.path.realpath(sf_dir)}:{cfp}".encode()
    ).hexdigest()[:12]
    from magictables_spark.streaming.commit import subdir_store_paths

    root = store_root(f"pqstream_{stag}")
    codes_dir = os.path.join(root, "codes")
    n_vec = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    codes = spark.read.parquet(*subdir_store_paths(codes_dir))
    assert codes.count() == n_vec
    assert codes.select("vec_id").distinct().count() == n_vec

    def snap():
        return sorted(
            (os.path.join(d, f), os.stat(os.path.join(d, f)).st_mtime_ns)
            for d in subdir_store_paths(codes_dir)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    s1 = snap()
    r2 = sorted(
        tuple(r) for r in REGISTRY["pq_store_stream"].fn(spark, sf_dir).collect()
    )
    assert r1 == r2
    assert snap() == s1


def test_ivfpq_compression_is_recall_free(spark, sf_dir):
    """IVFPQ's recall must not fall below plain IVF's on the same
    4-probe cell selection: the 8-byte residual codes + exact rescore
    at width max(100, n/10) should recover everything the IVF pruning
    lets through (measured EQUAL — 0.66/0.56/0.48 at
    sf0.001/0.01/0.1, identical to ann_ivf_topk; the probe pruning is
    the only recall loss, the PQ stage costs nothing)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_topk"].fn(spark, sf_dir).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir).collect()
    }
    r_ivf = len(exact & ivf) / len(exact)
    r_ivfpq = len(exact & ivfpq) / len(exact)
    assert r_ivfpq >= r_ivf, f"PQ stage lost recall: {r_ivfpq:.2f} < {r_ivf:.2f}"
    assert r_ivfpq >= 0.4, f"IVFPQ recall {r_ivfpq:.2f}"


def test_lloyd_rounds_reduce_distortion(spark, sf_dir):
    """Total reconstruction error with the trained codebook must beat
    the untrained md5-elected codebook — the property that lifted
    recall 0.38 -> 0.96. Recomputes the untrained encode inline with
    the same arithmetic, zero iterations."""
    import magictables_spark.plans.similarity as S
    from pyspark.sql.window import Window

    trained = (
        REGISTRY["vector_quantize_pq"]
        .fn(spark, sf_dir)
        .agg(F.sum("recon_l2").alias("t"))
        .collect()[0]
        .t
    )

    e = S._quantized(spark, sf_dir)
    ws = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    seeds = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(S._PQ_K)
        .select(F.row_number().over(ws).alias("sid"), F.col("q").alias("sq"))
    )
    ms = spark.range(S._PQ_M).select(F.col("id").cast("int").alias("m"))
    cb0 = seeds.crossJoin(F.broadcast(ms)).select(
        "m", "sid", F.expr(f"slice(sq, {S._PQ_SUB}*m+1, {S._PQ_SUB})").alias("cw")
    )
    subs = (
        e.select(
            "vec_id", "q",
            F.explode(F.sequence(F.lit(0), F.lit(S._PQ_M - 1))).alias("m"),
        )
        .select(
            "vec_id", "m",
            F.expr(f"slice(q, {S._PQ_SUB}*m+1, {S._PQ_SUB})").alias("x"),
        )
    )
    d2 = F.expr(
        " + ".join(
            f"(x[{j}] - cw[{j}]) * (x[{j}] - cw[{j}])" for j in range(S._PQ_SUB)
        )
    ).cast("bigint")
    untrained = (
        subs.join(F.broadcast(cb0), "m")
        .select("vec_id", "m", d2.alias("d2"))
        .groupBy("vec_id", "m")
        .agg(F.min("d2").alias("d2"))
        .agg(F.sum("d2").alias("t"))
        .collect()[0]
        .t
    )
    assert trained < untrained, (trained, untrained)


def test_ivfpq_persisted_serves_identically_and_warm(spark, sf_dir):
    """Store-roundtrip ≡ inline compute for the composed index, and a
    second invocation serves from the existing store versions (no
    rebuild — same contract as the LSH/IVF/PQ persisted tests)."""
    from magictables_spark.plans.similarity import _ivfpq_persisted_index

    direct = sorted(
        tuple(r) for r in REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir).collect()
    )
    served = sorted(
        tuple(r) for r in REGISTRY["ann_ivfpq_persisted"].fn(spark, sf_dir).collect()
    )
    assert served == direct

    wh, ck, bk, ek, _tag, _n = _ivfpq_persisted_index(spark, sf_dir)

    def versions():
        return [
            [v["version"] for v in wh.list_versions(k)] for k in (ck, bk, ek)
        ]

    v1 = versions()
    REGISTRY["ann_ivfpq_persisted"].fn(spark, sf_dir).collect()
    assert versions() == v1
