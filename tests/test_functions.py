"""Unit checks for the reusable expression builders in
magictables_spark.functions."""

from __future__ import annotations

from magictables_spark.functions import (
    cosine_from_int,
    int_dot,
    money_cents,
    quantize_vector,
    shingles,
    token_count,
)


def test_money_cents_exact(spark):
    df = spark.createDataFrame([(19.99,), (0.01,), (123456.78,)], "m double")
    got = [r[0] for r in df.select(money_cents("m")).collect()]
    assert got == [1999, 1, 12345678]


def test_quantize_and_dot(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>")
    q = df.select(
        quantize_vector("a").alias("qa"), quantize_vector("b").alias("qb")
    ).select(int_dot("qa", "qb").alias("dot"))
    # (1*4 + 2*5 + 3*6) * 1e12 = 32e12
    assert q.first()["dot"] == 32 * 10**12


def test_cosine_identity(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([([3.0, 4.0],)], "a array<float>")
    q = df.select(quantize_vector("a").alias("q")).select(
        cosine_from_int(int_dot("q", "q"), int_dot("q", "q"), int_dot("q", "q")).alias("c")
    )
    assert abs(q.first()["c"] - 1.0) < 1e-12


def test_shingles_and_tokens(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string")
    rows = df.select(shingles("text", 3).alias("sh"), token_count("text").alias("n")).collect()
    assert rows[0]["sh"] == ["a b c", "b c d"] and rows[0]["n"] == 4
    assert rows[1]["sh"] == [] and rows[1]["n"] == 2
