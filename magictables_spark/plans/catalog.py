"""Catalog of the fixture tables (TESTDATA.md) + scan helpers.

Every query path goes through :func:`load_table` so scans stay uniform:
plain ``spark.read.parquet`` — declarative, so Catalyst keeps predicate
pushdown / column pruning / row-group skipping on the scan. At 100 TB
the same call reads a partitioned directory tree and partition pruning
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — their
# cardinality is fixed by the schema (region=5, nation=25), not by SF.
BROADCAST_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning/pushdown happen via Catalyst
    on top of this — callers `select`/`filter` and the parquet reader
    receives PushedFilters + ReadSchema automatically."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Defensive runtime confs: the driver may build its own session
    # without our get_spark defaults. All three are runtime-settable.
    # - naive fixture timestamps must stay NTZ + UTC or formatted
    #   output shifts with the machine timezone (oracle is tz-naive);
    # - events.parquet is TIMESTAMP(NANOS), which the reader rejects
    #   outright unless nanos surface as bigint.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS) parquet, surfaced as nanos-bigint via
    # spark.sql.legacy.parquet.nanosAsLong; convert to a microsecond
    # timestamp here so every downstream operator sees a real timestamp.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
