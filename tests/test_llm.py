"""Mocked-LLM determinism tests (SURVEY §5.2.3): nl_transform SQL
generation + validation + caching, key_infer fallback order,
generate_rows contract, fence extraction."""

from __future__ import annotations

import pytest

from magictables_spark.frame import MagicFrame
from magictables_spark.llm import (
    MockLLM,
    extract_fence,
    generate_rows,
    key_infer,
    nl_transform,
    validate_sql,
)
from magictables_spark.sources import GenerativeSource
from magictables_spark.warehouse import Warehouse


@pytest.fixture
def wh(tmp_path):
    return Warehouse(str(tmp_path / "wh"))


def test_extract_fence_variants():
    assert extract_fence("```sql\nSELECT 1\n```", "sql") == "SELECT 1"
    assert extract_fence("text\n```\nSELECT 2\n```\nmore", "sql") == "SELECT 2"
    assert extract_fence("SELECT 3", "sql") == "SELECT 3"


def test_validate_sql_rejects_ddl_and_multi():
    assert validate_sql("  SELECT * FROM df;") == "SELECT * FROM df"
    assert validate_sql("WITH t AS (SELECT 1 AS x) SELECT x FROM t").startswith("WITH")
    for bad in ["DROP TABLE df", "SELECT 1; SELECT 2", "INSERT INTO df VALUES (1)"]:
        with pytest.raises(ValueError):
            validate_sql(bad)


def test_validate_sql_rejects_spark_escape_hatches():
    """SELECT-reachable escapes: JVM reflection, path-table reads,
    CACHE/SET statements (textual layer, no session needed)."""
    for bad in [
        "SELECT java_method('java.lang.System', 'exit', 0)",
        "SELECT reflect('java.lang.Runtime', 'getRuntime')",
        "SELECT * FROM parquet.`/etc/passwd`",
        "SELECT * FROM text.`/root/.ssh/id_rsa`",
        "CACHE TABLE t AS SELECT 1",
        "SET spark.sql.ansi.enabled=false",
        "WITH t AS (SELECT 1) SELECT * FROM t CROSS JOIN csv.`/tmp/x`",
    ]:
        with pytest.raises(ValueError):
            validate_sql(bad)


def test_validate_sql_parse_level_and_allowlist(spark):
    """Parse layer: non-query statements that regex-dodge are rejected;
    relation allowlist confines the query to the registered view."""
    ok = validate_sql("SELECT id FROM df WHERE id > 1", spark=spark, allowed_tables={"df"})
    assert ok.startswith("SELECT")
    # CTE name is not a real relation — must still pass the allowlist
    validate_sql(
        "WITH t AS (SELECT id FROM df) SELECT * FROM t", spark=spark, allowed_tables={"df"}
    )
    with pytest.raises(ValueError, match="does not parse"):
        validate_sql("SELECT (((", spark=spark)
    with pytest.raises(ValueError, match="not in allowed set"):
        validate_sql("SELECT * FROM other_table", spark=spark, allowed_tables={"df"})
    with pytest.raises(ValueError, match="not in allowed set"):
        validate_sql(
            "SELECT * FROM df JOIN secret_view USING (id)", spark=spark, allowed_tables={"df"}
        )


def test_nl_transform_cannot_reach_other_views(spark, wh):
    """Prompt-injected SQL referencing another temp view is rejected."""
    spark.createDataFrame([(42,)], "secret int").createOrReplaceTempView("secrets_view")
    df = spark.createDataFrame([(1,)], "id int")
    llm = MockLLM(["```sql\nSELECT * FROM secrets_view\n```"])
    with pytest.raises(ValueError, match="not in allowed set"):
        nl_transform(df, "exfiltrate", llm=llm, warehouse=wh, table_name="z")


def test_nl_transform_executes_and_caches(spark, wh):
    df = spark.createDataFrame([(1, 5.0), (2, 9.0), (3, 2.0)], "id int, rating double")
    llm = MockLLM(["```sql\nSELECT id, rating FROM df ORDER BY rating DESC LIMIT 2\n```"])
    out = nl_transform(df, "top 2 by rating", llm=llm, warehouse=wh, model="m1", table_name="t")
    assert [r["id"] for r in out.collect()] == [2, 1]
    assert len(llm.prompts) == 1
    # the table summary reaches the prompt (reference magictable.py:155-158)
    assert "rating" in llm.prompts[0]

    # cache hit: no LLM needed at all
    out2 = nl_transform(df, "top 2 by rating", llm=None, warehouse=wh, model="m1", table_name="t")
    assert [r["id"] for r in out2.collect()] == [2, 1]


def test_nl_transform_rejects_malicious_sql(spark, wh):
    df = spark.createDataFrame([(1,)], "id int")
    llm = MockLLM(["```sql\nDROP TABLE df\n```"])
    with pytest.raises(ValueError):
        nl_transform(df, "nuke it", llm=llm, warehouse=wh, table_name="x")
    assert wh.get_code("x_query:nuke it_model:mock") is None  # invalid code never cached


def test_magicframe_transform_renames(spark, wh):
    mf = MagicFrame(spark.createDataFrame([(1,)], "id int"), sources=["abc"])
    llm = MockLLM(["```sql\nSELECT id * 2 AS id2 FROM df\n```"])
    out = mf.transform("double it", llm=llm, warehouse=wh, model="m")
    assert out.df.collect()[0]["id2"] == 2
    assert out.name == "abc_query:double it_model:m"  # magictable.py:180 semantics


def test_key_infer_deterministic_before_llm(spark):
    df = spark.createDataFrame([(1, "a")], "movie_id int, title string")
    # exact match: LLM must not be consulted
    llm = MockLLM([])
    assert key_infer("http://api/movie/{movie_id}", df, llm=llm) == {"movie_id": "movie_id"}

    # no match: LLM consulted with dtypes+samples, mapping honored
    llm2 = MockLLM(['```json\n{"id": "movie_id"}\n```'])
    assert key_infer("http://api/movie/{id}", df, llm=llm2) == {"id": "movie_id"}
    assert "movie_id" in llm2.prompts[0]

    # LLM returns an unknown column -> error (magictable.py:440-447)
    llm3 = MockLLM(['```json\n{"id": "nope"}\n```'])
    with pytest.raises(KeyError):
        key_infer("http://api/movie/{id}", df, llm=llm3)


def test_generative_source(spark, wh):
    llm = MockLLM(['```json\n[{"country": "FR", "pop": 68}, {"country": "DE", "pop": 84}]\n```'])
    mf = MagicFrame.from_source(spark, GenerativeSource("eu populations", llm=llm), warehouse=wh)
    rows = sorted(tuple(r) for r in mf.df.collect())
    assert rows == [("DE", 84), ("FR", 68)]

    # bad contract -> error
    llm_bad = MockLLM(['```json\n{"not": "a list"}\n```'])
    with pytest.raises(ValueError):
        generate_rows(llm_bad, "x")


def test_nl_join_executes_caches_and_validates(spark, wh):
    """join_with_query: NL -> validated join SQL over left_df/right_df
    views, cached by (left, right, query, model); second call needs no
    LLM. The reference facade's version calls a nonexistent API
    (notsomagictable.py:21) — this is the real one."""
    from magictables_spark.llm import nl_join

    left = MagicFrame(
        spark.createDataFrame([(1, "Alpha"), (2, "Beta")], "id int, title string"),
        sources=["lsrc"],
    )
    right = MagicFrame(
        spark.createDataFrame([(1, 8.1), (2, 6.4)], "movie_id int, rating double"),
        sources=["rsrc"],
    )
    sql = "SELECT l.title AS title, r.rating AS rating FROM left_df l JOIN right_df r ON l.id = r.movie_id WHERE r.rating > 7"
    llm = MockLLM([f"```sql\n{sql}\n```"])
    out = left.join_with_query(right, "titles rated above 7", llm=llm, warehouse=wh, model="m")
    assert [tuple(r) for r in out.df.collect()] == [("Alpha", 8.1)]
    assert out.sources == ["lsrc", "rsrc"]
    assert len(llm.prompts) == 1 and "left_df" in llm.prompts[0]

    # cache hit: exhausted MockLLM must not be consulted
    llm2 = MockLLM([])
    again = left.join_with_query(right, "titles rated above 7", llm=llm2, warehouse=wh, model="m")
    assert [tuple(r) for r in again.df.collect()] == [("Alpha", 8.1)]

    # malicious SQL rejected
    llm3 = MockLLM(["```sql\nDROP TABLE left_df\n```"])
    with pytest.raises(ValueError):
        nl_join(left.df, right.df, "nuke it", llm=llm3)


def test_validate_sql_keyword_blocklist_no_false_positives(spark):
    """Statement-form keywords inside string literals or identifiers are
    legal (the prefix + parse layers classify the statement); only real
    DML/DDL verbs stay on the textual blocklist."""
    for ok in [
        "SELECT * FROM df WHERE status = 'set'",
        "SELECT id AS reset_count FROM df",
        "SELECT 'cache me' AS note, id FROM df",
        "SELECT id FROM df WHERE name = 'analyze this call'",
    ]:
        got = validate_sql(ok, spark=spark, allowed_tables={"df"})
        assert got.startswith("SELECT")


def test_validate_sql_allowlist_walks_subqueries(spark):
    """Relations hidden in EXISTS/IN/scalar subqueries are walked
    structurally (not regex-scraped from toString) and rejected."""
    for bad in [
        "SELECT id FROM df WHERE EXISTS (SELECT 1 FROM secret_view)",
        "SELECT id FROM df WHERE id IN (SELECT id FROM secret_view)",
        "SELECT id, (SELECT MAX(id) FROM secret_view) AS m FROM df",
        "WITH t AS (SELECT * FROM secret_view) SELECT * FROM t",
    ]:
        with pytest.raises(ValueError, match="not in allowed set"):
            validate_sql(bad, spark=spark, allowed_tables={"df"})
