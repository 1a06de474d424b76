"""join_view_store_stream lifecycle checks: the streamed view equals
the batch twin and the full join, and re-invocation (checkpoint replay
path) serves identical rows — the idempotency the per-batch-subdir
overwrite design claims."""

from __future__ import annotations

import pandas as pd

from magictables_spark.plans.queries import REGISTRY


def _run(spark, sf_dir, slug):
    return REGISTRY[slug].fn(spark, sf_dir).toPandas()


def _canon(df):
    # both twins return the view UNSORTED (the driver canon is
    # order-insensitive; the per-read total sort was dropped in the
    # r11 optimization round) — compare as row sets keyed on the
    # unique o_orderkey
    return df.sort_values("o_orderkey").reset_index(drop=True)


def test_streamed_view_equals_batch_twin_and_full_join(spark, sf_dir):
    streamed = _run(spark, sf_dir, "join_view_store_stream")
    batch = _run(spark, sf_dir, "join_view_incremental_store")
    pd.testing.assert_frame_equal(_canon(streamed), _canon(batch))
    # second invocation: AvailableNow sees no new files; the store
    # serves the same rows (warm path)
    again = _run(spark, sf_dir, "join_view_store_stream")
    pd.testing.assert_frame_equal(_canon(streamed), _canon(again))
    # every order lands exactly once (the seed/batch legs PARTITION the
    # orders rows and c_custkey is unique, so duplicates would mean a
    # replayed batch leaked past the own-subdir overwrite)
    assert streamed["o_orderkey"].is_unique
