"""Property-based tests (hypothesis) for the pure driver-side
contracts: identity hashing, SQL validation, fence extraction, URL
placeholder resolution. No SparkSession — these run in milliseconds
and probe the input space the example-based tests can't."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from magictables_spark.identity import canonical_json, raw_data_id, source_id
from magictables_spark.llm import extract_fence, validate_sql
from magictables_spark.operators.chain import PLACEHOLDER_RE, resolve_keys

json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(), st.text(max_size=40)
)
json_objects = st.dictionaries(st.text(min_size=1, max_size=20), json_scalars, max_size=6)


@given(st.text(max_size=60), st.text(max_size=60), json_objects)
@settings(max_examples=200, deadline=None)
def test_source_id_deterministic_and_param_order_free(t, i, params):
    """Same logical source -> same id, regardless of dict insertion
    order (the reference's cross-session cache-hit guarantee)."""
    a = source_id(t, i, params)
    b = source_id(t, i, dict(reversed(list(params.items()))))
    assert a == b and re.fullmatch(r"[0-9a-f]{32}", a)


@given(json_objects, json_objects)
@settings(max_examples=200, deadline=None)
def test_distinct_payloads_distinct_ids(p1, p2):
    """Different canonical payloads must not collide on id (md5 over
    canonical JSON: injective up to hash collision)."""
    if canonical_json(p1) != canonical_json(p2):
        assert raw_data_id(p1) != raw_data_id(p2)
    else:
        assert raw_data_id(p1) == raw_data_id(p2)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_validate_sql_never_passes_ddl(sql):
    """No accepted string contains a forbidden mutation keyword."""
    try:
        out = validate_sql(sql)
    except ValueError:
        return
    assert re.match(r"^\s*(select|with)\b", out, re.IGNORECASE)
    assert not re.search(
        r"\b(insert|update|delete|drop|create|alter|truncate|merge|grant)\b",
        out,
        re.IGNORECASE,
    )
    assert ";" not in out


@given(st.text(max_size=120).filter(lambda s: "```" not in s))
@settings(max_examples=200, deadline=None)
def test_extract_fence_roundtrip(body):
    """Whatever goes inside a ```sql fence comes back out stripped."""
    assert extract_fence(f"```sql\n{body}\n```", "sql") == body.strip()


_ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(st.lists(_ident, min_size=1, max_size=5, unique=True))
@settings(max_examples=200, deadline=None)
def test_resolve_keys_binds_every_exact_column(cols):
    """A template mentioning exactly the existing columns always binds
    1:1; a template with an unknown placeholder always raises."""
    template = "http://x/" + "/".join("{%s}" % c for c in cols)
    assert resolve_keys(template, cols) == {c: c for c in cols}
    with pytest.raises(KeyError):
        resolve_keys(template + "/{__missing_ph}", cols)


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_placeholder_regex_never_matches_across_braces(s):
    """Every match is a word-charactered name wrapped in single braces
    (the invariant url_expr's splitting logic relies on)."""
    for m in PLACEHOLDER_RE.finditer(s):
        assert re.fullmatch(r"\{\w+\}", m.group(0))
