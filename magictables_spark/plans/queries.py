"""Aggregator module — importing this registers every query pack.

The driver contract (``__spark_entry__.py``) imports ``REGISTRY`` /
``queries`` / ``oracle_sql`` from here. Each pack module self-registers
its op-slugs into the shared REGISTRY via the ``@q`` decorator at
import time.
"""

from __future__ import annotations

from magictables_spark.plans import (  # noqa: F401  (import = registration)
    analytics_pack,
    curation_pack,
    events_pack,
    features,
    joins_advanced,
    llmdata_pack,
    mleval_pack,
    mllib_pack,
    nested,
    pipeline_ops,
    pipeline_pack,
    pretrain_pack,
    quality_pack,
    regression_pack,
    relational,
    rollup_pack,
    scalar,
    similarity,
    textops,
    timeseries,
    tpch_extra,
    tpch_suite,
    udfs,
    windows,
)
from magictables_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    oracle_sql,
    q,
    queries,
)
