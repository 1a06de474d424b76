"""SparkSession construction tuned for this engine.

Defaults are chosen for correctness parity with the DuckDB oracle and
for scale-readiness (AQE, skew handling, Arrow transfers). On a real
cluster only ``master`` changes; everything else is size-relative.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "magictables_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - UTC session timezone: parquet fixtures carry naive timestamps; the
      DuckDB oracle is timezone-naive, so we pin UTC everywhere.
    - AQE on (coalesce partitions + skew-join splitting): at 100 TB the
      static shuffle-partition count is always wrong somewhere; AQE
      re-plans with runtime statistics.
    - Arrow on: every pandas_udf / toPandas boundary is vectorized.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as raw nanos (bigint) and convert in the
        # catalog (truncation ns->us, documented divergence SURVEY §7.3)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Whole-stage codegen for wide decimal aggregates can exceed the
        # JVM's 8000-bytecode JIT threshold; without this flag HotSpot
        # leaves the generated update loop interpreted (measured 50-100x
        # slowdown on 8-aggregate queries). Harmless when methods are small.
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
