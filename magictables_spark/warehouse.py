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

    def _table_dir(self, table_id: str) -> str:
        # table ids are hex digests / digest chains — path-safe by design
        return os.path.join(self.root, "tables", table_id)

    def has_table(self, table_id: str, ttl_seconds: float | None = None) -> bool:
        meta = self._load(self._meta_path, {}).get(table_id)
        if meta is None or not os.path.exists(self._table_dir(table_id)):
            return False
        if ttl_seconds is not None and time.time() - meta["created_at"] >= ttl_seconds:
            return False
        return True

    def read_table(self, spark: SparkSession, table_id: str) -> DataFrame:
        return spark.read.parquet(self._table_dir(table_id))

    def write_table(
        self, df: DataFrame, table_id: str, source_info: dict | None = None
    ) -> None:
        """Materialize + register. Parquet write is the distributed part;
        the metadata update is one small JSON rewrite (driver-side)."""
        df.write.mode("overwrite").parquet(self._table_dir(table_id))
        meta = self._load(self._meta_path, {})
        meta[table_id] = {
            "created_at": time.time(),
            "source_info": source_info or {},
            "columns": df.columns,
        }
        self._save(self._meta_path, meta)

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
