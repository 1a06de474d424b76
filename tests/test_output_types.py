"""The driver-safe output-type gate (round-8 verdict item 2).

The driver canonicalizes sampled results with pandas
``sort_values``-then-hash, which crashes on collection cells and
hash-diverges on Decimal (CORRECTNESS_r08: ``vector_quantize_pq`` err,
``kmeans_lloyd`` hash mismatch).  ``tests.parity.compare`` therefore
rejects driver-unsafe schemas up front, and this file proves the
checker itself catches every unsafe type family — so a registered slug
that regresses to an array/decimal/map/struct output fails CI locally
instead of erring at the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from .parity import DRIVER_SAFE_TYPENAMES, compare, driver_unsafe_columns


def test_safe_scalar_schema_passes(spark):
    df = spark.sql(
        "SELECT 1 AS i, CAST(1 AS BIGINT) AS l, 1.5e0 AS d, 'x' AS s, "
        "true AS b, DATE'2024-01-01' AS dt, TIMESTAMP'2024-01-01' AS ts"
    )
    assert driver_unsafe_columns(df) == []


@pytest.mark.parametrize(
    ("expr", "typename"),
    [
        ("array(1, 2)", "array"),
        ("map('a', 1)", "map"),
        ("named_struct('a', 1)", "struct"),
        ("CAST(1 AS DECIMAL(38,0))", "decimal"),
        ("CAST('x' AS BINARY)", "binary"),
    ],
)
def test_unsafe_type_rejected(spark, expr, typename):
    df = spark.sql(f"SELECT 1 AS k, {expr} AS v")
    bad = driver_unsafe_columns(df)
    assert bad and bad[0][0] == "v"
    assert bad[0][1].startswith(typename)


def test_compare_refuses_unsafe_schema(spark, duck):
    """A deliberately-arrayed result must fail compare() BEFORE any
    value comparison — the local harness may never be more permissive
    than the driver again (the r08 lesson)."""
    sdf = spark.sql("SELECT 1 AS k, array(1, 2) AS v")
    ok, msg = compare(sdf, duck.sql("SELECT 1 AS k, [1, 2] AS v"))
    assert not ok
    assert "driver-unsafe" in msg


def test_decimal_refused_even_when_values_match(spark, duck):
    """kmeans_lloyd's exact r08 failure shape: identical integral
    values, decimal type — locally green pre-gate, driver-red."""
    sdf = spark.range(1).select(
        F.col("id").alias("k"), F.lit(7).cast("decimal(38,0)").alias("v")
    )
    ok, msg = compare(sdf, duck.sql("SELECT 0 AS k, CAST(7 AS DECIMAL(38,0)) AS v"))
    assert not ok
    assert "driver-unsafe" in msg


def test_safe_typename_list_is_scalar_only():
    assert not any(
        t.startswith(("array", "map", "struct", "decimal", "binary"))
        for t in DRIVER_SAFE_TYPENAMES
    )
