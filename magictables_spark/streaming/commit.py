"""Crash-safe commit protocol for non-idempotent foreachBatch merges.

foreachBatch is at-least-once: a failure AFTER the store rewrite but
BEFORE the applied-marker write replays the batch against the already-
merged store and double-counts (the round-8 ADVICE defect, first fixed
in auc_store_stream). Two proven patterns, now shared:

- ``VersionedStore`` (this module) for UNPARTITIONED stores: each
  batch merges into a fresh ``store_v{batch_id}`` directory and
  commits by atomically ``os.replace``-ing one CURRENT pointer file
  whose contents are ``"<last_batch_id>\\n<store dir name>"``. The flip
  is the single commit point — a replay either sees its batch_id
  already in CURRENT (crash after flip: skip) or re-merges from the
  untouched pre-merge version (crash before flip: the half-written
  store_v{b} is simply overwritten).

- per-partition ``last_batch`` stamping (inline in the maintainers)
  for PARTITIONED stores rewritten with dynamic partition overwrite:
  every rewritten partition carries the writing batch id, so a replay
  re-merges ONLY the partitions its crash left unstamped
  (rollup_store_stream, lsh_store_stream, scd2_store_stream).

  RESIDUAL WINDOW (stamping protocol only): the guard assumes dynamic
  partition overwrite replaces each partition atomically. Spark's
  job commit deletes the old partition directory and then renames the
  staged one in — on a local filesystem those are two operations, so
  a crash INSIDE job commit (not the post-write/pre-marker window the
  fault-injection tests cover) can leave a partition with its
  pre-merge rows deleted and its merged rows not yet visible. A
  replay then re-merges from the batch alone and loses the store-side
  history for that partition. On an object store or HDFS with an
  atomic-rename committer the window is a single partition rename;
  to eliminate it entirely, route the store through ``VersionedStore``
  (merge into a fresh versioned directory, flip CURRENT once) at the
  cost of rewriting untouched partitions. The stamping maintainers
  accept the window because their stores are rebuildable caches of
  the upstream event log, and the versioned protocol guards every
  store whose history is authoritative (auc/quantile-hist/CMS/...).

Under ``availableNow`` only the most recent batch can replay, so
reclaiming the pre-merge version directory after a successful flip is
safe: a replay of the committed batch short-circuits on CURRENT and
never reads it.
"""

from __future__ import annotations

import os
import shutil

__all__ = ["VersionedStore", "batch_subdir", "subdir_store_paths"]


def batch_subdir(store_dir: str, batch_id) -> str:
    """Per-batch overwrite target for APPEND-maintained stores: a
    replayed batch overwrites its own subdirectory instead of
    appending twice (the join_view_store_stream pattern, now shared).
    The seed lives in ``<store>/seed``."""
    return os.path.join(store_dir, f"b{batch_id}")


def subdir_store_paths(store_dir: str, exclude_batch=None) -> list[str]:
    """All committed subdirectory paths of an append-maintained store,
    optionally excluding one batch's own subdir. In-batch probes MUST
    exclude their own batch: a replay would otherwise see its previous
    partial output and compute a different (empty) admission set."""
    skip = None if exclude_batch is None else f"b{exclude_batch}"
    return sorted(
        os.path.join(store_dir, d)
        for d in os.listdir(store_dir)
        if d != skip
        and not d.startswith(("_", "."))
        and os.path.isdir(os.path.join(store_dir, d))
    )


class VersionedStore:
    """CURRENT-pointer versioned store for non-idempotent merges."""

    SEED_VERSION = "store_vinit"

    def __init__(self, root: str):
        self.root = root
        self._current = os.path.join(root, "CURRENT")

    # -- paths -----------------------------------------------------------
    def seed_path(self) -> str:
        return os.path.join(self.root, self.SEED_VERSION)

    def version_path(self, version: str) -> str:
        return os.path.join(self.root, version)

    def batch_version(self, batch_id: int) -> str:
        return f"store_v{batch_id}"

    # -- pointer ---------------------------------------------------------
    def init(self) -> None:
        """Commit the seed store (call once, after writing seed_path)."""
        self._flip(-1, self.SEED_VERSION)

    def read_current(self) -> tuple[int, str]:
        """(last committed batch id, current store dir name)."""
        with open(self._current) as f:
            batch, version = f.read().splitlines()[:2]
        return int(batch), version

    def current_path(self) -> str:
        return self.version_path(self.read_current()[1])

    def is_applied(self, batch_id: int) -> bool:
        return batch_id <= self.read_current()[0]

    def commit(self, batch_id: int, version: str | None = None) -> None:
        """Atomically flip CURRENT to ``version`` (default: the batch's
        own store_v{batch_id}) and reclaim the pre-merge directory.
        Pass the UNCHANGED current version for a no-op batch commit."""
        _, old_version = self.read_current()
        new_version = version if version is not None else self.batch_version(batch_id)
        self._flip(batch_id, new_version)
        if old_version != new_version:
            shutil.rmtree(self.version_path(old_version), ignore_errors=True)

    def _flip(self, batch_id: int, version: str) -> None:
        tmp = f"{self._current}.tmp{batch_id}"
        with open(tmp, "w") as f:
            f.write(f"{batch_id}\n{version}")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._current)
