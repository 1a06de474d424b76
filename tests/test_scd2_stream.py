"""scd2_store_stream: foreachBatch SCD2 dimension maintenance over a
bucket-partitioned run store (the version-history leg of the streaming
dimension triangle).

Contracts:
- streamed merge result == scd2_from_changelog full recompute (checked
  in-engine here; the oracle hash-checks it cross-engine);
- three ordered micro-batches ran (applied markers 0..2), and per-user
  version numbers stay contiguous from 1 (the run-replay renumbering
  invariant collapse-of-collapse relies on);
- re-invocation reuses the checkpoint: zero new batches, identical
  rows, store files untouched, no new applied markers.
"""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"


def _root():
    import hashlib

    from magictables_spark.plans.events_pack import _SCD2_SPLIT_TS
    from magictables_spark.warehouse import corpus_fingerprint, store_root

    cfp = corpus_fingerprint(os.path.join(SF, "events.parquet"))
    tag = hashlib.md5(
        f"v2:scd2s:32:{_SCD2_SPLIT_TS}:{os.path.realpath(SF)}:{cfp}".encode()
    ).hexdigest()[:12]
    return store_root(f"scd2stream_{tag}")


def _store_files(root):
    out = []
    store = os.path.join(root, "store")
    for dirpath, _dirs, files in os.walk(store):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out.append((os.path.relpath(p, store), os.stat(p).st_mtime_ns))
    return sorted(out)


def test_streamed_merge_equals_full_recompute(spark):
    from magictables_spark.plans.events_pack import (
        scd2_from_changelog,
        scd2_store_stream,
    )

    got = sorted(tuple(r) for r in scd2_store_stream(spark, SF).collect())
    want = sorted(tuple(r) for r in scd2_from_changelog(spark, SF).collect())
    assert got == want

    root = _root()
    assert sorted(os.listdir(os.path.join(root, "applied"))) == [
        "batch_0", "batch_1", "batch_2",
    ]
    # per-user versions contiguous from 1 (replay renumbering invariant)
    by_user = {}
    for r in got:
        by_user.setdefault(r[0], []).append(r[1])
    for u, vs in by_user.items():
        assert sorted(vs) == list(range(1, len(vs) + 1)), u


def test_warm_reinvocation_runs_zero_batches(spark):
    from magictables_spark.plans.events_pack import scd2_store_stream

    r1 = sorted(tuple(r) for r in scd2_store_stream(spark, SF).collect())
    root = _root()
    f1 = _store_files(root)
    m1 = sorted(os.listdir(os.path.join(root, "applied")))
    r2 = sorted(tuple(r) for r in scd2_store_stream(spark, SF).collect())
    assert r1 == r2
    assert _store_files(root) == f1
    assert sorted(os.listdir(os.path.join(root, "applied"))) == m1
