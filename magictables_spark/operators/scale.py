"""Scale operators: bucketed co-located joins and skew-salted joins —
the two manual shuffle-elimination tools that matter at 100 TB
(everything else is Catalyst/AQE's job).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 32, sort_cols: list[str] | None = None
) -> None:
    """Persist a table bucketed (and optionally sorted) on the join key.
    Two tables bucketed the same way join WITHOUT a shuffle — at 100 TB
    the bucketing write is paid once and every subsequent join on the
    key skips its exchange entirely.

    Crash-resilient: a killed session can leave the table's warehouse
    directory on disk with no catalog entry, which makes a later
    ``saveAsTable`` fail with LOCATION_ALREADY_EXISTS — so drop any
    stale catalog entry AND remove the orphaned location first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    location = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(location):
        shutil.rmtree(location, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed saved tables; the plan should show NO
    Exchange on either side (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy key skew: the (large, skewed) left
    side gets a random salt in [0, n_salts); the (smaller) right side is
    replicated n_salts times; the join key becomes (key, salt), spreading
    a hot key over n_salts tasks.

    AQE's skew-join splitting handles sort-merge skew automatically —
    reach for manual salting only when AQE can't help (aggregations over
    skewed keys, broadcast-ineligible right sides with a few giant
    keys). Correctness: every left row keeps exactly one salt, every
    right row exists under every salt, so MATCHED pairs are preserved
    1:1 — but an UNMATCHED right row would surface once per salt
    (n_salts null-extended duplicates), so only ``inner`` and ``left``
    are salt-safe; other join types raise."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "replicating the right side duplicates its unmatched rows "
            "n_salts times under right/full/semi/anti semantics"
        )
    salted_l = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(salted_r, [on, "__salt"], how)
    return out.drop("__salt")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], sort_within: list[str] | None = None
) -> None:
    """Persist hive-style partitioned parquet (dir per partition value).
    At 100 TB this is the primary pruning lever: a filter on the
    partition column skips whole directories at planning time (zero I/O
    for pruned partitions), before row-group min/max skipping even
    runs. ``sort_within`` clusters rows inside each file so non-
    partition predicates skip row groups via parquet statistics."""
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def pruned_scan(spark: SparkSession, path: str, predicate) -> DataFrame:
    """Read a partitioned dataset with a partition predicate applied
    immediately — Catalyst turns it into PartitionFilters (directory
    pruning), verified in tests/test_scale_ops.py via the explain text."""
    return spark.read.parquet(path).filter(predicate)


def compact_files(
    spark,
    input_dir: str,
    output_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_bytes``. The small-files problem dominates long-run
    table health at 100 TB (every file is a task + a NameNode/listing
    entry + a footer fetch); streaming sinks and over-parallel writers
    produce thousands of KB-size files that make every downstream scan
    pay per-file overhead.

    Sizing reads the actual on-disk bytes (not a row-count guess) and
    coalesce() avoids a shuffle entirely — each output task
    concatenates a set of input splits. Returns the file count written.
    """
    import math
    import os

    df = spark.read.parquet(input_dir)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(input_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df.coalesce(n_files).write.mode("overwrite").parquet(output_dir)
    return len(
        [
            f
            for root, _, files in os.walk(output_dir)
            for f in files
            if f.endswith(".parquet")
        ]
    )


def observed_write(df, observation_name: str = "write_metrics"):
    """Instrument a DataFrame with zero-cost runtime metrics via
    ``df.observe``: row count and null-key count are accumulated ON
    the executors DURING the write — no second counting pass over the
    data (at 100 TB, `df.count(); df.write` reads everything twice;
    this reads once). Returns (instrumented_df, Observation); read
    ``observation.get`` after the action completes.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    first_col = df.columns[0]
    obs = Observation(observation_name)
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(first_col).isNull().cast("long")).alias("n_null_first_col"),
    )
    return instrumented, obs
