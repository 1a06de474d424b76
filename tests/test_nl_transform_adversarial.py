"""Adversarial nl_transform validation (round-5 verdict item 7).

The reference exec()s LLM-generated pandas code unsandboxed
(magictable.py:150-170). The rebuild's contract is: LLM output is
Spark SQL, and `validate_sql` must reject everything that is not a
single SELECT over the allowed view — BEFORE anything executes or is
cached. These tests drive HOSTILE completions through the full
nl_transform path (MockLLM + warehouse) and through the validator
directly, covering the bypass classes the round-5 verdict named:
semicolon chains, CTEs wrapping DML, comment-hidden keywords,
spark_catalog writes, EXPLAIN-bypass — plus reflection escapes, path
tables, allowlist escapes via subqueries/CTE bodies, and a
cache-tampering replay.
"""

from __future__ import annotations

import pytest

from magictables_spark.llm import MockLLM, nl_transform, validate_sql
from magictables_spark.warehouse import Warehouse

# Each entry: (name, hostile SQL completion). All MUST be rejected.
HOSTILE = [
    ("semicolon_chain", "SELECT * FROM df; DROP TABLE users"),
    ("semicolon_after_comment", "SELECT * FROM df -- ok\n; INSERT INTO df VALUES (1)"),
    ("cte_wrapping_dml", "WITH t AS (DELETE FROM df) SELECT * FROM t"),
    ("cte_hiding_other_table", "WITH x AS (SELECT * FROM secret_tbl) SELECT * FROM x"),
    ("spark_catalog_write", "INSERT INTO spark_catalog.default.tgt SELECT * FROM df"),
    ("spark_catalog_read", "SELECT * FROM df UNION ALL SELECT * FROM spark_catalog.default.secrets"),
    ("explain_bypass", "EXPLAIN SELECT * FROM df"),
    ("explain_codegen_bypass", "EXPLAIN CODEGEN SELECT * FROM df"),
    ("path_table", "SELECT * FROM parquet.`/etc/passwd`"),
    ("path_table_spaced", "SELECT * FROM parquet . `/etc/passwd`"),
    ("jvm_reflection", "SELECT java_method('java.lang.System', 'getenv') FROM df"),
    ("jvm_reflect_alias", "SELECT reflect('java.lang.System', 'getProperty', 'user.dir') FROM df"),
    ("other_temp_view", "SELECT * FROM other_view"),
    ("subquery_escape", "SELECT (SELECT MAX(x) FROM hidden_tbl) AS m FROM df"),
    ("exists_subquery_escape", "SELECT * FROM df WHERE EXISTS (SELECT 1 FROM hidden_tbl)"),
    ("join_escape", "SELECT * FROM df JOIN informants ON df.id = informants.id"),
    ("ctas", "CREATE TABLE exfil AS SELECT * FROM df"),
    ("cache_table_form", "CACHE TABLE t AS SELECT * FROM df"),
    ("set_conf", "SET spark.sql.ansi.enabled=false"),
    ("case_obfuscation", "  SeLeCt * FROM df ; dRoP TaBlE x"),
    ("comment_hidden_keyword", "SELECT * FROM df /* drop table x */"),
    ("drop_in_string_still_rejected", "SELECT 'x; drop table y' AS s FROM df WHERE 1=1; DROP TABLE y"),
    ("update_statement", "UPDATE df SET x = 1"),
    ("merge_statement", "MERGE INTO df USING df2 ON df.id = df2.id WHEN MATCHED THEN DELETE"),
]


@pytest.fixture
def frame(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")


@pytest.mark.parametrize("name,sql", HOSTILE, ids=[n for n, _ in HOSTILE])
def test_hostile_completion_rejected_not_cached_not_executed(
    frame, tmp_path, name, sql
):
    """Full-path: the LLM hands back a hostile completion; nl_transform
    must raise, cache NOTHING, and leave no executable artifact."""
    wh = Warehouse(str(tmp_path / "wh"))
    llm = MockLLM([f"```sql\n{sql}\n```"])
    with pytest.raises(ValueError):
        nl_transform(frame, f"hostile {name}", llm=llm, warehouse=wh, model="mock")
    # invalid code must never be stored (validate-before-cache)
    assert wh.get_code(f"df_query:hostile {name}_model:mock") is None


@pytest.mark.parametrize("name,sql", HOSTILE, ids=[n for n, _ in HOSTILE])
def test_hostile_sql_rejected_by_validator_directly(spark, name, sql):
    with pytest.raises(ValueError):
        validate_sql(sql, spark=spark, allowed_tables={"df"})


def test_tampered_cache_entry_rejected_on_replay(frame, tmp_path):
    """A warehouse _codecache.json edited on disk (or written by an old
    buggy version) must be re-validated on READ — tampering cannot
    smuggle DML past the cache."""
    wh = Warehouse(str(tmp_path / "wh"))
    llm = MockLLM(["```sql\nSELECT id FROM df\n```"])
    nl_transform(frame, "ids", llm=llm, warehouse=wh, model="mock").collect()
    key = "df_query:ids_model:mock"
    assert wh.get_code(key) == "SELECT id FROM df"
    wh.put_code(key, "SELECT * FROM df; DROP TABLE users")
    with pytest.raises(ValueError):
        nl_transform(frame, "ids", warehouse=wh, model="mock")


def test_benign_shapes_still_pass(frame, spark):
    """The validator must not be so hostile it rejects the legal
    surface: plain SELECT, WITH ... SELECT, aggregates, window fns,
    self-joins of df, and CTE names shadowing nothing."""
    benign = [
        "SELECT * FROM df",
        "SELECT id, COUNT(*) AS n FROM df GROUP BY id",
        "WITH t AS (SELECT id FROM df) SELECT * FROM t",
        "WITH a AS (SELECT * FROM df), b AS (SELECT * FROM a) SELECT * FROM b",
        "SELECT x.id FROM df x JOIN df y ON x.id = y.id",
        "SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM df",
        "SELECT 'a; b' AS lit FROM df",  # semicolon inside a string... ",
    ]
    for sql in benign[:-1]:
        assert validate_sql(sql, spark=spark, allowed_tables={"df"})
    # known over-rejection, documented: a literal containing ';' trips
    # the single-statement check. Fail-closed is the chosen trade.
    with pytest.raises(ValueError):
        validate_sql(benign[-1], spark=spark, allowed_tables={"df"})


def test_property_semicolon_chains_always_rejected(spark):
    """Property: ANY second statement appended after a legal SELECT is
    rejected, whatever the separator garnish."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # (a bare trailing ';' with NO second statement is legal and
    # stripped — the property is about chained statements)
    tails = st.sampled_from(
        ["DROP TABLE x", "INSERT INTO t VALUES (1)", "SET a=1", "SELECT 2"]
    )
    pads = st.text(alphabet=" \t\n-", max_size=6)

    @given(tail=tails, pad=pads)
    @settings(max_examples=60, deadline=None)
    def check(tail, pad):
        sql = f"SELECT id FROM df{pad};{pad}{tail}"
        with pytest.raises(ValueError):
            validate_sql(sql, spark=spark, allowed_tables={"df"})

    check()


def test_property_forbidden_keywords_any_case(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ["insert", "update", "delete", "drop", "create", "alter", "truncate", "merge", "grant"]

    @given(
        w=st.sampled_from(words),
        caps=st.lists(st.booleans(), min_size=8, max_size=8),
    )
    @settings(max_examples=60, deadline=None)
    def check(w, caps):
        mixed = "".join(c.upper() if u else c for c, u in zip(w, caps))
        sql = f"SELECT * FROM df WHERE {mixed} IS NOT NULL"
        with pytest.raises(ValueError):
            validate_sql(sql, spark=spark, allowed_tables={"df"})

    check()
