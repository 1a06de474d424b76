"""Registry-wide zero-row robustness: EVERY registered query must run
(not crash) against a scale-factor directory whose tables all have the
fixture schemas but zero rows — the degenerate input a 100 TB pipeline
hits on an empty partition, a new tenant, or an over-tight filter.

Results may legitimately be empty or constant-shaped (a spine query
returns its spine with zero counts); the contract tested here is
no-exception + a queryable result.
"""

from __future__ import annotations

import glob
import os

import pytest

from magictables_spark.plans.queries import REGISTRY

_EMPTY_DIR = "/tmp/mts_empty_sf"


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_dir):
    import shutil

    os.makedirs(_EMPTY_DIR, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(f)
        target = os.path.join(_EMPTY_DIR, name)
        if os.path.exists(target):
            continue
        tmp = os.path.join(_EMPTY_DIR, "_tmp")
        spark.read.parquet(f).limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, target)
        shutil.rmtree(tmp)
    return _EMPTY_DIR


@pytest.mark.parametrize("slug", sorted(REGISTRY))
def test_runs_on_empty_tables(spark, empty_sf_dir, slug):
    df = REGISTRY[slug].fn(spark, empty_sf_dir)
    assert df is not None, f"{slug} returned None on empty input"
    df.limit(5).collect()  # no exception is the contract
