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
