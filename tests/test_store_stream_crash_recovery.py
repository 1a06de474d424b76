"""Kill-and-restart-mid-batch recovery for every NON-IDEMPOTENT
streaming store maintainer (round-9 hardening sweep).

Each maintainer dies via its fault-injection hook in the exact window
the round-8 ADVICE flagged — store rewritten, commit record not yet
durable — then restarts from the checkpoint. The replayed batch must
not double-merge: versioned stores (quantile histogram, CMS; also
auc_store_stream, tested in test_mleval_pack.py) skip via the atomic
CURRENT pointer, partitioned stores (LSH index, SCD2 runs; also
rollup_store_stream, tested in test_rollup_stream.py) re-merge only
unstamped partitions. Recovery is verified against the slug's own
DuckDB oracle — the strongest available ground truth.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from magictables_spark.plans.queries import REGISTRY
from magictables_spark.warehouse import store_root

from .parity import compare

CASES = {
    "quantile_hist_store_stream": (
        "magictables_spark.plans.rollup_pack",
        "qhstream_",
    ),
    "cms_store_stream": ("magictables_spark.plans.rollup_pack", "cmsstream_"),
    "lsh_store_stream": ("magictables_spark.plans.similarity", "lshstream_"),
    "scd2_store_stream": ("magictables_spark.plans.events_pack", "scd2stream_"),
}


def _wipe(prefix: str) -> None:
    for d in glob.glob(store_root(prefix) + "*"):
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("slug", sorted(CASES))
def test_crash_mid_batch_then_restart_matches_oracle(spark, duck, sf_dir, slug):
    import importlib

    module_name, prefix = CASES[slug]
    fn = getattr(importlib.import_module(module_name), slug)
    _wipe(prefix)  # force a cold build so batch 1 really runs

    with pytest.raises(StreamingQueryException, match="injected crash"):
        fn(spark, sf_dir, _crash_after_write=frozenset({1}))

    recovered = fn(spark, sf_dir)
    ok, msg = compare(recovered, duck.sql(REGISTRY[slug].oracle))
    assert ok, f"{slug} after crash recovery: {msg}"
