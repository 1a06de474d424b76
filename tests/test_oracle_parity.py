"""Run every registered query against its DuckDB oracle at small SF.

This is the local twin of the driver's correctness gate (t2): if this
file is green, CORRECTNESS_r{N}.json should be green.
"""

from __future__ import annotations

import pytest

from magictables_spark.plans.queries import REGISTRY

from .parity import compare, driver_unsafe_columns

ORACLE_SLUGS = sorted(slug for slug, spec in REGISTRY.items() if spec.oracle is not None)
ROWS_ONLY_SLUGS = sorted(slug for slug, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("slug", ORACLE_SLUGS)
def test_oracle_match(spark, duck, sf_dir, slug):
    spec = REGISTRY[slug]
    sdf = spec.fn(spark, sf_dir)
    rel = duck.sql(spec.oracle)
    ok, msg = compare(sdf, rel)
    assert ok, f"{slug}: {msg}"


@pytest.mark.parametrize("slug", ROWS_ONLY_SLUGS)
def test_rows_only_runs(spark, sf_dir, slug):
    spec = REGISTRY[slug]
    sdf = spec.fn(spark, sf_dir)
    # rows-only slugs still pass through the driver's pandas
    # sort_values canonicalization, which crashes on collection cells
    # (CORRECTNESS_r08) — enforce the same scalar-schema gate compare()
    # applies to oracled slugs, then replay the sort itself.
    assert driver_unsafe_columns(sdf) == [], driver_unsafe_columns(sdf)
    pdf = sdf.toPandas()
    pdf.sort_values(by=sorted(pdf.columns))
    assert len(sdf.schema.fields) > 0
