"""Hermetic tests: warehouse cache/lineage/TTL, source identity,
from_source round-trip (SURVEY §5.2: cache behavior — second call does
zero fetches; TTL expiry re-fetches)."""

from __future__ import annotations

import time

import pytest

from magictables_spark.frame import MagicFrame
from magictables_spark.identity import source_id
from magictables_spark.sources import APISource, RawSource, WebSource
from magictables_spark.warehouse import ChainRecord, Warehouse


@pytest.fixture
def wh(tmp_path):
    return Warehouse(str(tmp_path / "wh"))


def test_source_id_stability():
    a = APISource("http://x/api/{id}", {"k": 1})
    b = APISource("http://x/api/{id}", {"k": 1})
    c = APISource("http://x/api/{id}", {"k": 2})
    assert a.get_id() == b.get_id()
    assert a.get_id() != c.get_id()
    assert a.get_id() == source_id("api", "http://x/api/{id}", {"k": 1})


def test_raw_source_hashes_data():
    d1 = RawSource([{"a": 1}])
    d2 = RawSource([{"a": 1}])
    d3 = RawSource([{"a": 2}])
    assert d1.get_id() == d2.get_id() != d3.get_id()


def test_from_source_caches(spark, wh):
    calls = []

    def fetcher(url, params):
        calls.append(url)
        return [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}]

    src = APISource("http://mock/items", fetcher=fetcher)
    mf1 = MagicFrame.from_source(spark, src, warehouse=wh)
    assert mf1.df.count() == 2
    assert len(calls) == 1

    mf2 = MagicFrame.from_source(spark, APISource("http://mock/items", fetcher=fetcher), warehouse=wh)
    assert mf2.df.count() == 2
    assert len(calls) == 1  # cache hit: zero fetches
    assert mf2.name == mf1.name


def test_from_source_flattens_nested(spark, wh):
    def fetcher(url, params):
        return {"results": [{"id": 1, "meta": {"lang": "en", "tags": ["a", "b"]}}]}

    mf = MagicFrame.from_source(spark, APISource("http://mock/nested", fetcher=fetcher), warehouse=wh)
    assert set(mf.df.columns) == {"id", "meta.lang", "meta.tags"}
    rows = sorted(tuple(r) for r in mf.df.collect())
    assert rows == [(1, "en", "a"), (1, "en", "b")]


def test_web_source_single_row(spark, wh):
    mf = MagicFrame.from_source(
        spark, WebSource("http://mock/page", fetcher=lambda u, p: "<html>hi</html>"), warehouse=wh
    )
    rows = mf.df.collect()
    assert len(rows) == 1
    assert rows[0]["content"] == "<html>hi</html>"


def test_chain_ttl_expiry(spark, wh, monkeypatch):
    df = spark.createDataFrame([(1,)], "a int")
    wh.write_table(df, "deadbeef", {"type": "api_chain"})
    assert wh.get_cached_chain_result(spark, "deadbeef", ttl_seconds=3600) is not None
    # age the entry past the TTL
    entry = wh.table_meta("deadbeef")
    entry["created_at"] = time.time() - 3601
    wh._entry_save("deadbeef", entry)
    assert wh.get_cached_chain_result(spark, "deadbeef", ttl_seconds=3600) is None
    # infinite-TTL source cache still sees it
    assert wh.has_table("deadbeef")


def test_lineage_roundtrip(wh):
    rec = ChainRecord(
        source_table="s1",
        api_result_table="a1",
        merged_result_table="m1",
        chain_type="api_chain",
        source_key="id",
        target_key="user_id",
    )
    wh.add_chain(rec)
    wh.add_chain(
        ChainRecord(
            source_table="m1", api_result_table="a2", merged_result_table="m2", chain_type="transform"
        )
    )
    assert len(wh.get_chains()) == 2
    hits = wh.get_chains("m1")
    assert len(hits) == 2  # m1 appears as merged in one, source in the other
    only = wh.get_chains("a2")
    assert len(only) == 1 and only[0].chain_type == "transform"


def test_code_cache(wh):
    assert wh.get_code("k") is None
    wh.put_code("k", "SELECT 1")
    assert wh.get_code("k") == "SELECT 1"


def test_lineage_append_is_o1_at_10k_records(wh):
    """Round-10 verdict item 6: 10k chains must not make every
    add_chain O(ledger). The JSONL log appends one record per call, so
    the mean cost of the last 500 appends stays within a small factor
    of the first 500 (the old rewrite-the-array design measured ~40x
    here); and the whole history reads back intact."""
    import time as _t

    def burst(n0, n):
        t0 = _t.perf_counter()
        for i in range(n0, n0 + n):
            wh.add_chain(
                ChainRecord(
                    source_table=f"s{i}",
                    api_result_table=f"a{i}",
                    merged_result_table=f"m{i}",
                    chain_type="transform",
                )
            )
        return _t.perf_counter() - t0

    first = burst(0, 500)
    for k in range(500, 9500, 500):
        burst(k, 500)
    last = burst(9500, 500)
    assert len(wh.get_chains()) == 10_000
    assert len(wh.get_chains("m9999")) == 1
    # generous bound: O(1) measures ~1x with fs jitter; O(n) ~40x
    assert last < max(5.0 * first, first + 0.5), (first, last)


def test_lineage_legacy_array_still_read(wh):
    """A pre-round-11 _lineage.json array merges with new JSONL
    appends — no migration step."""
    import json as _json
    import os as _os

    legacy = [
        {
            "source_table": "old_s",
            "api_result_table": "old_a",
            "merged_result_table": "old_m",
            "chain_type": "api_chain",
            "created_at": 1.0,
        }
    ]
    with open(_os.path.join(wh.root, "_lineage.json"), "w") as f:
        _json.dump(legacy, f)
    wh.add_chain(
        ChainRecord(
            source_table="new_s",
            api_result_table="new_a",
            merged_result_table="new_m",
            chain_type="transform",
        )
    )
    got = wh.get_chains()
    assert [c.chain_type for c in got] == ["api_chain", "transform"]
    # a torn final line (crash mid-append) is skipped, not fatal
    with open(wh._lineage_jsonl, "a") as f:
        f.write('{"source_table": "torn')
    assert len(wh.get_chains()) == 2


def test_code_cache_is_per_key_and_reads_legacy(wh):
    """put_code writes one sharded file per key (O(1) regardless of
    cache size); a legacy _codecache.json dict is still honored, and a
    sharded entry whose stored key mismatches (md5 collision) falls
    back instead of returning the wrong code."""
    import json as _json
    import os as _os

    for i in range(50):
        wh.put_code(f"key{i}", f"SELECT {i}")
    assert wh.get_code("key37") == "SELECT 37"
    shard_dir = _os.path.join(wh.root, "codecache")
    assert len(_os.listdir(shard_dir)) == 50
    with open(_os.path.join(wh.root, "_codecache.json"), "w") as f:
        _json.dump({"legacy_key": "SELECT 'legacy'"}, f)
    assert wh.get_code("legacy_key") == "SELECT 'legacy'"
    # collision-shaped corruption: entry file exists but key mismatches
    path = wh._code_entry_path("key37")
    with open(path, "w") as f:
        _json.dump({"key": "other", "code": "WRONG"}, f)
    assert wh.get_code("key37") is None


def test_convenience_constructors(spark, wh):
    """from_api/from_web/from_raw/from_gen mirror the reference's
    classmethod sugar (magictable.py:69-95): same result and same
    provenance id as building the source explicitly."""

    def fetcher(url, params=None):
        return [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]

    via_sugar = MagicFrame.from_api(spark, "http://mock/items", fetcher=fetcher, warehouse=wh)
    via_source = MagicFrame.from_source(
        spark, APISource("http://mock/items", fetcher=fetcher), warehouse=wh
    )
    assert via_sugar.sources == via_source.sources
    assert via_sugar.df.count() == 2

    web = MagicFrame.from_web(spark, "http://mock/page", fetcher=lambda u, p=None: "<html>x</html>")
    assert "content" in web.df.columns and web.df.count() == 1

    raw = MagicFrame.from_raw(spark, [{"k": 1}, {"k": 2}])
    assert raw.df.count() == 2

    from magictables_spark.llm import MockLLM

    gen = MagicFrame.from_gen(
        spark, "three colors", llm=MockLLM(['```json\n[{"color": "red"}, {"color": "blue"}]\n```'])
    )
    assert gen.df.count() == 2 and "color" in gen.df.columns
