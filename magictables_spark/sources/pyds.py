"""Spark 4 Python DataSource connector: the reference's paged-API
ingestion concept (reference sources.py:60-104 fetches a REST endpoint
into rows) rebuilt on Spark's FIRST-CLASS extension point for Python
connectors — ``pyspark.sql.datasource.DataSource`` — instead of a
driver-side fetch-then-parallelize.

Why this shape matters at 100 TB: the reader declares PARTITIONS (one
per page range), and Spark schedules each partition's ``read`` on an
executor — so a paginated API/export with millions of pages ingests
cluster-parallel with no driver bottleneck and ordinary task retry
semantics, exactly like a parquet scan. The driver never sees a row.

Two sources:

- ``mts_fixture`` — a deterministic arithmetic source (id, md5 payload,
  value) used to verify the connector END TO END against a DuckDB
  oracle computing the same rows from ``range()``: the scan itself is
  value-hash-checked, which a network source can never be.
- ``PagedAPIDataSource`` (format ``mts_api``) — the same reader shape
  over an injectable fetcher (tests use the local fixture server /
  MockFetcher); one partition per page window, rows yielded straight
  from the decoded JSON.

Arrow note: ``read`` may yield plain tuples or pyarrow RecordBatches;
the fixture source yields tuples (the rows are synthesized in Python
either way), a production connector with columnar payloads should
yield RecordBatches to skip per-row pickling.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class FixtureDataSource(DataSource):
    """Deterministic rows: id, md5(id) payload, value = id*id % 9973.

    Options: n_rows (default 1000), n_parts (default 8).
    """

    @classmethod
    def name(cls) -> str:
        return "mts_fixture"

    def schema(self) -> str:
        return "id BIGINT, payload STRING, value BIGINT"

    def reader(self, schema) -> "FixtureReader":
        return FixtureReader(
            int(self.options.get("n_rows", 1000)),
            int(self.options.get("n_parts", 8)),
        )


class FixtureReader(DataSourceReader):
    def __init__(self, n_rows: int, n_parts: int):
        self.n_rows = n_rows
        self.n_parts = n_parts
        self.lo = 0  # id-range bounds, narrowed by pushed filters
        self.hi = n_rows

    def pushFilters(self, filters):
        """Connector-side predicate pushdown (Spark 4.1): range
        comparisons on the monotone ``id`` column narrow the generation
        range BEFORE ``partitions()`` runs, so filtered scans schedule
        fewer partitions and synthesize fewer rows — the Python-
        connector analogue of parquet min/max pruning. Everything else
        is returned for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("id",) and isinstance(getattr(f, "value", None), int):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_RangePartition(lo, lo)]
        step = max(1, (n + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            payload = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, payload, (i * i) % 9973)


class PagedAPIDataSource(DataSource):
    """Paged-API reader: one partition per page window; each executor
    task fetches its own pages through the supplied fetcher module
    (options: fetcher_module + fetcher_attr naming an importable
    zero-arg factory returning ``fetch(url) -> dict``, url_template
    with a ``{page}`` slot, n_pages, pages_per_task). Kept import-based
    so the fetcher resolves ON THE WORKER — no driver-pickled sockets."""

    @classmethod
    def name(cls) -> str:
        return "mts_api"

    def schema(self) -> str:
        return "page INT, body STRING"

    def reader(self, schema) -> "PagedAPIReader":
        return PagedAPIReader(dict(self.options))


class PagedAPIReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        n_pages = int(self.options.get("n_pages", 1))
        per_task = int(self.options.get("pages_per_task", 1))
        return [
            _RangePartition(lo, min(lo + per_task, n_pages))
            for lo in range(0, n_pages, per_task)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import importlib

        mod = importlib.import_module(self.options["fetcher_module"])
        fetch = getattr(mod, self.options["fetcher_attr"])()
        template = self.options["url_template"]
        for page in range(partition.start, partition.end):
            body = fetch(template.format(page=page))
            yield (page, json.dumps(body, sort_keys=True))


def md5_echo_fetcher():
    """Importable zero-arg fetcher factory for tests/demos: 'fetches'
    a URL by answering with its md5 — deterministic, offline, and
    resolvable on any executor (it lives in this installed module)."""

    def fetch(url: str) -> dict:
        return {"url_md5": hashlib.md5(url.encode()).hexdigest()}

    return fetch


class FixtureStreamDataSource(DataSource):
    """Streaming twin of the fixture source: each micro-batch emits the
    next ``batch_rows`` ids (deterministic payloads), up to ``n_rows``
    total, then idles. Offsets are plain dicts ({"next": i}) checkpoint-
    able by Spark; ``readBetweenOffsets`` regenerates any committed
    range exactly, so recovery/replay is deterministic end to end —
    the contract a paged-API poller needs for exactly-once ingestion.

    Options: n_rows (default 100), batch_rows (default 25).
    """

    @classmethod
    def name(cls) -> str:
        return "mts_fixture_stream"

    def schema(self) -> str:
        return "id BIGINT, payload STRING, value BIGINT"

    def simpleStreamReader(self, schema) -> "FixtureStreamReader":
        return FixtureStreamReader(
            int(self.options.get("n_rows", 100)),
            int(self.options.get("batch_rows", 25)),
        )


def _fixture_rows(start: int, end: int) -> Iterator[tuple]:
    for i in range(start, end):
        yield (i, hashlib.md5(str(i).encode()).hexdigest(), (i * i) % 9973)


class FixtureStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, n_rows: int, batch_rows: int):
        self.n_rows = n_rows
        self.batch_rows = batch_rows

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.n_rows)
        # iter(list), not a generator: Spark's runner calls next() on
        # the returned object (so it must be an iterator, not a bare
        # list) and its prefetch cache copy.copy()s it (so it must be
        # copyable — list_iterator pickles, generators do not)
        return iter(list(_fixture_rows(lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_fixture_rows(int(start["next"]), int(end["next"]))))


class JsonLinesDataSource(DataSource):
    """Writable connector (format ``mts_jsonl``): each task writes its
    partition to a staging file named by task id + a random suffix,
    returns the staged path as its commit message, and the DRIVER-side
    ``commit`` atomically renames all staged files into the target
    directory only after every task succeeded (``abort`` deletes the
    strays). This is the two-phase commit contract every distributed
    sink needs: a lost/retried/speculative task leaves only unreferenced
    staging files, never a half-visible result — the same protocol
    parquet's OutputCommitter runs, here in ~40 lines of Python.

    Options: path (required).
    """

    @classmethod
    def name(cls) -> str:
        return "mts_jsonl"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options["path"], [f.name for f in schema], overwrite)


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str):
        self.staged = staged


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list, overwrite: bool):
        self.path = path
        self.columns = columns
        self.overwrite = overwrite

    def write(self, iterator) -> "_StagedFile":
        import os
        import uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(
            staging, f"part-{tc.partitionId():05d}-{uuid.uuid4().hex}.jsonl"
        )
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.columns, row)), sort_keys=True))
                f.write("\n")
        return _StagedFile(staged)

    def commit(self, messages) -> None:
        import os
        import shutil

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            if m is not None:
                os.replace(
                    m.staged, os.path.join(self.path, os.path.basename(m.staged))
                )
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
