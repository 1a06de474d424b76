"""Golden unit fixtures for the json_flatten operator (SURVEY §5.2.2).

Covers the reference's flatten_nested_structure semantics
(utils.py:36-80): dict-in-dict dotted names, list-of-dicts explode,
list-of-scalars repeated rows, scalars broadcast onto child rows, and
null/empty-list preservation (Polars-style outer explode).
"""

from __future__ import annotations

from magictables_spark.operators.flatten import flatten, flatten_json_column


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_struct_dotted_names(spark):
    df = spark.createDataFrame(
        [(1, {"b": 2, "c": {"d": 3}})],
        "a int, s struct<b:int, c:struct<d:int>>",
    )
    out = flatten(df)
    assert out.columns == ["a", "s.b", "s.c.d"]
    assert _rows(out) == [(1, 2, 3)]


def test_list_of_scalars_explodes_to_rows(spark):
    df = spark.createDataFrame([(1, [10, 20, 30])], "a int, xs array<int>")
    out = flatten(df)
    assert out.columns == ["a", "xs"]
    assert sorted(_rows(out)) == [(1, 10), (1, 20), (1, 30)]


def test_list_of_structs_explode_then_unnest(spark):
    df = spark.createDataFrame(
        [(1, [{"x": 1}, {"x": 2}])],
        "a int, items array<struct<x:int>>",
    )
    out = flatten(df)
    assert out.columns == ["a", "items.x"]
    assert sorted(_rows(out)) == [(1, 1), (1, 2)]


def test_empty_and_null_arrays_keep_parent_row(spark):
    df = spark.createDataFrame(
        [(1, []), (2, None), (3, [7])],
        "a int, xs array<int>",
    )
    out = flatten(df)
    assert sorted(_rows(out)) == [(1, None), (2, None), (3, 7)]


def test_two_sibling_arrays_union_not_cross_product(spark):
    # reference flatten_nested_structure (utils.py:49-61): one row per
    # element per list, the OTHER list's key absent (-> null here) —
    # never a cross-product of sibling elements
    df = spark.createDataFrame(
        [(1, [1, 2], ["a", "b", "c"])],
        "k int, xs array<int>, ys array<string>",
    )
    out = flatten(df)
    got = sorted(_rows(out), key=str)
    assert len(got) == 5  # 2 + 3, not 2 x 3
    assert sorted(x for _, x, y in got if x is not None) == [1, 2]
    assert sorted(y for _, x, y in got if y is not None) == ["a", "b", "c"]
    assert all((x is None) != (y is None) for _, x, y in got)


def test_scalars_broadcast_to_child_rows(spark):
    df = spark.createDataFrame(
        [("top", {"inner": [1, 2]})],
        "name string, payload struct<inner:array<int>>",
    )
    out = flatten(df)
    assert out.columns == ["name", "payload.inner"]
    assert sorted(_rows(out)) == [("top", 1), ("top", 2)]


def test_flatten_json_column_infers_schema(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 5, "nested": {"b": "x"}}'), (2, '{"a": 6, "nested": {"b": "y"}}')],
        "id int, payload string",
    )
    out = flatten_json_column(df, "payload")
    assert set(out.columns) == {"id", "payload.a", "payload.nested.b"}
    got = {tuple(r) for r in out.collect()}
    assert got == {(1, 5, "x"), (2, 6, "y")}


def test_no_explode_mode_keeps_arrays(spark):
    df = spark.createDataFrame([(1, [1, 2])], "a int, xs array<int>")
    out = flatten(df, explode_arrays=False)
    assert _rows(out) == [(1, [1, 2])]
