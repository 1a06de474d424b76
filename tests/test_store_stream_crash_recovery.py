"""Kill-and-restart-mid-batch recovery for EVERY streaming store
maintainer (round-9 hardening for the six non-idempotent merges,
extended to the full set of 12 in round 10).

Each maintainer dies via its fault-injection hook in the exact window
the round-8 ADVICE flagged — store rewritten, commit record not yet
durable — then restarts from the checkpoint. The replayed batch must
not double-merge. Three protocols are under test:

- VersionedStore CURRENT-pointer flip (quantile histogram, CMS, AUC,
  and — since round 10 — HLL, whose old in-place overwrite read the
  directory it was rewriting): replay skips via is_applied.
- per-partition last_batch stamps under dynamic partition overwrite
  (LSH index, SCD2 runs, rollup): replay re-merges only unstamped
  partitions.
- per-batch SUBDIR overwrite for append-maintained stores (join view,
  IVF cells, PQ codes, SimHash bands, MinHash bands+shingles, exact-fp
  dedup, LPA edges — all converted from plain appends in round 10,
  with in-batch probes/anti-joins pinned to the store MINUS the
  batch's own subdir so a replay recomputes the same admission set):
  replay rewrites its own subdir instead of appending twice.

Recovery is verified against the slug's own DuckDB oracle — the
strongest available ground truth.
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
    "auc_store_stream": ("magictables_spark.plans.mleval_pack", "aucstream_"),
    "hll_store_stream": ("magictables_spark.plans.features", "hllstream_"),
    "lsh_store_stream": ("magictables_spark.plans.similarity", "lshstream_"),
    "scd2_store_stream": ("magictables_spark.plans.events_pack", "scd2stream_"),
    "rollup_store_stream": (
        "magictables_spark.plans.events_pack",
        "rollstream_",
    ),
    "join_view_store_stream": (
        "magictables_spark.plans.rollup_pack",
        "jvstream_",
    ),
    "ivf_store_stream": ("magictables_spark.plans.similarity", "ivfstream_"),
    "pq_store_stream": ("magictables_spark.plans.similarity", "pqstream_"),
    "simhash_store_stream": ("magictables_spark.plans.similarity", "shstream_"),
    "minhash_store_stream": ("magictables_spark.plans.similarity", "mhstream_"),
    "dedup_store_stream": ("magictables_spark.plans.textops", "fpstream_"),
    "lpa_store_stream": ("magictables_spark.plans.textops", "lpastream_"),
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
    if REGISTRY[slug].oracle is not None:
        ok, msg = compare(recovered, duck.sql(REGISTRY[slug].oracle))
        assert ok, f"{slug} after crash recovery: {msg}"
    else:
        # hll_store_stream is rows-only by construction (HLL sketches
        # have no DuckDB twin): ground truth is a from-scratch rebuild
        # — recovered store == the store a crash-free run produces
        got = sorted(map(tuple, recovered.collect()))
        _wipe(prefix)
        fresh = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert got == fresh, f"{slug}: recovered store != from-scratch rebuild"
