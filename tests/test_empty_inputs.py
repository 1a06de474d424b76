"""Empty/degenerate-input robustness: operators must return empty
results (correct schema), never crash, on zero-row inputs."""

from __future__ import annotations

from magictables_spark.operators.asof import asof_join
from magictables_spark.operators.chain import chain_enrich, parse_payload
from magictables_spark.operators.flatten import flatten
from magictables_spark.warehouse import Warehouse


def test_flatten_empty_df(spark):
    df = spark.createDataFrame([], "a int, s struct<b:int>, xs array<int>")
    out = flatten(df)
    assert out.count() == 0
    assert out.columns == ["a", "s.b", "xs"]


def test_asof_empty_sides(spark):
    left = spark.createDataFrame([], "uid int, ts timestamp, tag string")
    right = spark.createDataFrame([(1, None, 5)], "uid int, ts timestamp, val int").filter("uid < 0")
    out = asof_join(left, right, on="ts", by="uid")
    assert out.count() == 0
    assert "val_right" in out.columns

    # empty right: left rows survive with null fills
    left2 = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), "p")], "uid int, ts timestamp, tag string"
    )
    out2 = asof_join(left2, right, on="ts", by="uid")
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["val_right"] is None


def test_chain_empty_frame(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.createDataFrame([], "user_id int")
    out = chain_enrich(
        df, "http://x/{user_id}", fetcher=lambda u, p: {"a": 1}, warehouse=wh, sources=["e"]
    )
    assert out.count() == 0


def test_parse_payload_all_null(spark):
    df = spark.createDataFrame([(1, None)], "id int, __payload string")
    out = parse_payload(df)
    assert out.columns == ["id"]
    assert out.count() == 1


def test_rows_to_df_empty(spark):
    from magictables_spark.frame import rows_to_df

    out = rows_to_df(spark, [])
    assert out.count() == 0


def test_connected_components_empty_edges(spark):
    from magictables_spark.operators.components import connected_components

    edges = spark.createDataFrame([], "src bigint, dst bigint")
    # no nodes at all -> empty result with the right schema
    out = connected_components(edges)
    assert out.count() == 0
    assert set(out.columns) == {"id", "component"}
    # nodes but no edges -> all singletons
    nodes = spark.createDataFrame([(1,), (2,)], "id bigint")
    got = {r.id: r.component for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 2}


def test_salted_join_empty_sides(spark):
    from magictables_spark.operators.scale import salted_join

    left = spark.createDataFrame([], "k int, a int")
    right = spark.createDataFrame([(1, 2)], "k int, b int")
    assert salted_join(left, right, on="k").count() == 0
    assert salted_join(right, left, on="k").count() == 0
