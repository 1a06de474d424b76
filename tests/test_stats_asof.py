"""Quality gates for rows-only stats ops + asof_join operator unit
semantics (edge cases the oracle query can't pin)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from magictables_spark.operators.asof import asof_join
from magictables_spark.plans.queries import REGISTRY


def test_approx_ndv_within_tolerance(spark, sf_dir):
    approx = REGISTRY["approx_ndv"].fn(spark, sf_dir).first()
    exact = REGISTRY["ndv_exact"].fn(spark, sf_dir).first()
    for c in ("ndv_part", "ndv_supp", "ndv_order"):
        rel_err = abs(approx[c] - exact[c]) / max(exact[c], 1)
        assert rel_err < 0.05, f"{c}: approx={approx[c]} exact={exact[c]} err={rel_err:.3f}"


def test_sample_fraction_bounds(spark, sf_dir):
    total = REGISTRY["filter_eq"].fn(spark, sf_dir).sparkSession.read.parquet(
        f"{sf_dir}/lineitem.parquet"
    ).count()
    n = REGISTRY["sample"].fn(spark, sf_dir).count()
    assert 0.05 * total < n < 0.15 * total  # fraction=0.1, loose bounds
    # seeded => reproducible
    assert REGISTRY["sample"].fn(spark, sf_dir).count() == n


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"),
         (1, _ts("2024-01-01T12:00:00"), "p2"),
         (2, _ts("2024-01-01T09:00:00"), "p3")],
        "uid int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100),
         (1, _ts("2024-01-01T11:00:00"), 200),
         (2, _ts("2024-01-01T09:30:00"), 300)],
        "uid int, ts timestamp, val int",
    )
    out = asof_join(left, right, on="ts", by="uid")
    got = {r["tag"]: r["val_right"] for r in out.collect()}
    # exact-timestamp match counts (backward includes equality)
    assert got == {"p1": 100, "p2": 200, "p3": None}

    fwd = asof_join(left, right, on="ts", by="uid", direction="forward")
    got_f = {r["tag"]: r["val_right"] for r in fwd.collect()}
    assert got_f == {"p1": 100, "p2": None, "p3": 300}

    # matched right timestamp rides along
    row = {r["tag"]: r["ts_right"] for r in out.collect()}
    assert row["p2"] == _ts("2024-01-01T11:00:00")


def test_asof_join_nearest_and_tolerance(spark):
    """nearest picks the closer side, ties go backward, tolerance nulls
    far matches, and numeric `on` columns use raw units."""
    from magictables_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10.0), (1, 17.0), (1, 100.0), (2, 5.0)], "k int, t double"
    )
    right = spark.createDataFrame(
        [(1, 8.0, "a"), (1, 20.0, "b"), (1, 24.0, "c")], "k int, t double, v string"
    )
    got = {
        (r.k, r.t): (r.v_right, r.t_right)
        for r in asof_join(left, right, on="t", by="k", direction="nearest").collect()
    }
    assert got[(1, 10.0)] == ("a", 8.0)  # closer backward (2 vs 10)
    assert got[(1, 17.0)] == ("b", 20.0)  # closer forward (9 vs 3)
    assert got[(1, 100.0)] == ("c", 24.0)  # only backward side exists
    assert got[(2, 5.0)] == (None, None)  # no right rows for key

    # exact tie (t=14: dist 6 both ways) goes backward
    tie = spark.createDataFrame([(1, 14.0)], "k int, t double")
    r = asof_join(tie, right, on="t", by="k", direction="nearest").collect()[0]
    assert (r.v_right, r.t_right) == ("a", 8.0)

    # tolerance: t=100 is 76 from its nearest; bound at 10 nulls it
    got_tol = {
        (r.k, r.t): r.v_right
        for r in asof_join(
            left, right, on="t", by="k", direction="nearest", tolerance=10.0
        ).collect()
    }
    assert got_tol[(1, 10.0)] == "a" and got_tol[(1, 17.0)] == "b"
    assert got_tol[(1, 100.0)] is None

    # tolerance on the directional variants too
    got_b = {
        (r.k, r.t): r.v_right
        for r in asof_join(
            left, right, on="t", by="k", direction="backward", tolerance=3.0
        ).collect()
    }
    assert got_b[(1, 10.0)] == "a"  # dist 2 <= 3
    assert got_b[(1, 17.0)] is None  # backward match 8.0 is 9 away
