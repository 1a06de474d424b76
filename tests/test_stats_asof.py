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
