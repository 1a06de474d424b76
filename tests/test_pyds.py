"""Spark 4 Python DataSource connectors (sources/pyds.py)."""

from __future__ import annotations

import hashlib
import json


def _register(spark, cls):
    try:
        spark.dataSource.register(cls)
    except Exception:
        pass


def test_fixture_source_partitions_and_rows(spark):
    from magictables_spark.sources.pyds import FixtureDataSource

    _register(spark, FixtureDataSource)
    df = (
        spark.read.format("mts_fixture")
        .option("n_rows", 100)
        .option("n_parts", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r.id: (r.payload, r.value) for r in df.collect()}
    assert len(rows) == 100
    assert rows[7] == (hashlib.md5(b"7").hexdigest(), 49)


def test_paged_api_source_fetches_on_executors(spark):
    from magictables_spark.sources.pyds import PagedAPIDataSource

    _register(spark, PagedAPIDataSource)
    df = (
        spark.read.format("mts_api")
        .option("fetcher_module", "magictables_spark.sources.pyds")
        .option("fetcher_attr", "md5_echo_fetcher")
        .option("url_template", "http://api/items?page={page}")
        .option("n_pages", 6)
        .option("pages_per_task", 2)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    got = {r.page: json.loads(r.body) for r in df.collect()}
    assert len(got) == 6
    expect = hashlib.md5(b"http://api/items?page=4").hexdigest()
    assert got[4] == {"url_md5": expect}


def test_fixture_source_pushes_range_filters(spark):
    """id-range predicates narrow the generation range BEFORE
    partitioning: a 100-row slice of a 100k-row source schedules
    partitions covering only the slice, and the rows come back
    exactly (Spark re-applies nothing — the filter was consumed)."""
    from magictables_spark.sources.pyds import FixtureDataSource

    _register(spark, FixtureDataSource)
    base = (
        spark.read.format("mts_fixture")
        .option("n_rows", 100_000)
        .option("n_parts", 8)
        .load()
    )
    sliced = base.filter((base.id >= 90_000) & (base.id < 90_100))
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    rows = sliced.collect()
    assert len(rows) == 100
    assert {r.id for r in rows} == set(range(90_000, 90_100))
    assert hashlib.md5(b"90050").hexdigest() == {r.id: r.payload for r in rows}[90050]
    # pushdown visible: the scan node carries pushed filters and the
    # 100-row slice splits across the configured parallelism instead
    # of scanning 100k rows
    assert "PushedFilters" in plan or sliced.rdd.getNumPartitions() <= 8


def test_fixture_stream_source_exactly_once(spark, tmp_path):
    """The streaming connector delivers every id exactly once across
    micro-batches: readStream over mts_fixture_stream with
    availableNow-style drain (processAllAvailable until the offset
    stops advancing), rows collected through a memory sink."""
    from magictables_spark.sources.pyds import FixtureStreamDataSource

    _register(spark, FixtureStreamDataSource)
    df = (
        spark.readStream.format("mts_fixture_stream")
        .option("n_rows", 100)
        .option("batch_rows", 25)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("mts_pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # drain until the offset stops advancing (the source idles at
    # n_rows); AvailableNow would stop after ONE simple-reader batch
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    rows = spark.table("mts_pyds_stream").collect()
    ids = sorted(r.id for r in rows)
    assert ids == list(range(100)), f"got {len(ids)} rows"
    assert {r.id: r.payload for r in rows}[42] == hashlib.md5(b"42").hexdigest()


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    """format('mts_jsonl') writes per-task staging files and the
    driver-side commit renames them into place atomically: after a
    successful write the target holds only committed .jsonl parts (no
    _staging), and the rows round-trip exactly; a second overwrite
    write replaces the visible files."""
    import os

    from magictables_spark.sources.pyds import JsonLinesDataSource

    _register(spark, JsonLinesDataSource)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(100).selectExpr("id", "CAST(id * 3 AS BIGINT) AS tripled")
    df.repartition(4).write.format("mts_jsonl").option("path", out).mode(
        "append"
    ).save()
    assert not os.path.exists(os.path.join(out, "_staging"))
    parts = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert len(parts) == 4
    back = spark.read.json(out)
    got = {r.id: r.tripled for r in back.collect()}
    assert got == {i: i * 3 for i in range(100)}
    # overwrite replaces visible files
    spark.range(10).selectExpr("id", "CAST(id AS BIGINT) AS tripled").repartition(
        2
    ).write.format("mts_jsonl").option("path", out).mode("overwrite").save()
    assert spark.read.json(out).count() == 10
