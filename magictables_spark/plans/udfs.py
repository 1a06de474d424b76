"""Formal UDF/UDAF/UDTF surface (SURVEY §2.C: the reference's only
"UDF" is exec()ed LLM code on the whole table; the rebuild exposes the
three legitimate Spark shapes).

Rule of thumb encoded here: built-in expressions beat any UDF — these
slugs exist to prove the Arrow path works and to host logic that
genuinely can't be expressed declaratively. All three are
Arrow-batched (pandas in/out); none is a row-at-a-time Python UDF.

Determinism: the Python kernels do integer math on numpy int64 (exact,
same values as the SQL oracle's scaled-int fragments). np.rint ties
never occur because inputs carry exactly 2 decimals.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from magictables_spark.plans.registry import _t, q


def _net_cents_udf():
    """Scalar pandas UDF: revenue in scaled int (price_i * (100-disc_i)).
    Built lazily — a module-level @pandas_udf with a DDL return type
    needs an active SparkContext at import time."""
    from pyspark.sql.types import LongType

    def _net_cents(price: pd.Series, disc: pd.Series) -> pd.Series:
        import numpy as np

        price_i = np.rint(price.to_numpy() * 100).astype("int64")
        disc_i = np.rint(disc.to_numpy() * 100).astype("int64")
        return pd.Series(price_i * (100 - disc_i))

    return pandas_udf(_net_cents, returnType=LongType())


@q(
    "pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0
             AS net_price
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
    doc="Scalar pandas_udf (Arrow-vectorized, ~10-100x over row-at-a-time "
    "Python). The same arithmetic exists as a pure column expression in "
    "`project` — this slug proves the Arrow batch path yields identical "
    "integers. At scale prefer the built-in; use this shape only for "
    "logic Catalyst can't express (model scoring, custom parsing).",
    tags=("udf", "arrow"),
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            (_net_cents_udf()("l_extendedprice", "l_discount").cast("double") / 10000.0).alias(
                "net_price"
            ),
        )
    )


@q(
    "apply_in_pandas_group",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Grouped applyInPandas (UDAF shape): each group becomes ONE "
    "pandas DataFrame in a Python worker. The shuffle is the same as "
    "groupBy; the risk at 100 TB is a skewed group exceeding worker "
    "memory — guard with salting or pre-aggregation when group sizes "
    "are unbounded. (This aggregation is expressible declaratively — "
    "the slug pins the API contract.)",
    tags=("udf", "arrow", "agg"),
)
def apply_in_pandas_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # kernel is a closure, NOT a module-level function: cloudpickle then
    # serializes it BY VALUE, so Python workers need no importable copy
    # of this package (module-level kernels break whenever the driver's
    # cwd isn't the repo root — workers import by module path)
    def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        qty_i = np.rint(pdf["l_quantity"].to_numpy() * 100).astype("int64")
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "sum_qty": [float(qty_i.sum()) / 100.0],
            }
        )

    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(_group_stats, schema="l_returnflag string, n_rows bigint, sum_qty double")
    )


@q(
    "map_in_pandas_stream",
    oracle="""
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
    FROM documents
    """,
    doc="mapInPandas over partition iterators — the UDTF/flat-map shape "
    "(also the chain fetch stage's shape, operators/chain.py). Streams "
    "Arrow batches through Python without materializing a partition; "
    "use for per-partition I/O or models, never for string ops a "
    "built-in covers (text_tokens is the JVM twin of this exact "
    "output).",
    tags=("udf", "arrow", "udtf"),
)
def map_in_pandas_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _tokenize_batches(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            out = pdf[["doc_id"]].copy()
            out["n_tokens"] = toks.map(len)
            yield out

    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(_tokenize_batches, schema="doc_id bigint, n_tokens int")
    )


def _sum_cents_udaf():
    """Grouped-agg pandas UDF (a real UDAF): exact int64 sum of cents.
    Built lazily for the same SparkContext-at-import reason."""
    from pyspark.sql.types import LongType

    from pyspark.sql.functions import PandasUDFType

    def _sum_cents(price: pd.Series) -> int:
        import numpy as np

        return int(np.rint(price.to_numpy() * 100).astype("int64").sum())

    return pandas_udf(_sum_cents, returnType=LongType(), functionType=PandasUDFType.GROUPED_AGG)


@q(
    "pandas_udaf_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_spend
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Grouped-aggregate pandas_udf — the UDAF shape: one Arrow batch "
    "per group per partition, partial results combined by Spark's agg "
    "machinery. Integer math in the kernel makes it oracle-exact. At "
    "scale a built-in SUM is strictly better; this shape is for "
    "aggregations Catalyst lacks (weighted medians, custom sketches).",
    tags=("udf", "arrow", "agg"),
)
def pandas_udaf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    udaf = _sum_cents_udaf()
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(udaf(F.col("o_totalprice")).alias("_cents"))
        .select(
            "o_orderpriority",
            (F.col("_cents").cast("double") / 100.0).alias("total_spend"),
        )
    )


@q(
    "python_udtf",
    oracle="""
    SELECT o_orderkey,
           unnest(['P1', 'P2']) AS phase,
           unnest([CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     - CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2]) AS phase_cents
    FROM orders
    WHERE o_orderkey % 200 = 0
    """,
    doc="Python UDTF (Spark 3.5+ table function): one input row yields "
    "N output rows — here a deterministic 2-phase payment split in "
    "exact cents (floor half + remainder, so the phases sum exactly). "
    "The UDTF shape is for row-expanding logic with state per input "
    "row that explode()-on-an-expression can't build; lateral-joined "
    "per partition, no shuffle.",
    tags=("udf", "udtf"),
)
def python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="phase string, phase_cents bigint", useArrow=True)
    class SplitPayment:
        def eval(self, cents: int):
            half = cents // 2
            yield "P1", half
            yield "P2", cents - half

    spark.udtf.register("split_payment", SplitPayment)
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 200 == 0)
        .select(
            "o_orderkey",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    base.createOrReplaceTempView("udtf_base")
    return spark.sql(
        "SELECT o_orderkey, s.phase, s.phase_cents "
        "FROM udtf_base, LATERAL split_payment(cents) s"
    )


@q(
    "map_in_arrow_stream",
    oracle="""
    SELECT doc_id, length(text) * 2 AS double_chars
    FROM documents
    """,
    doc="mapInArrow surface: the partition-streaming UDF API one rung "
    "below mapInPandas — RecordBatches reach Python with NO pandas "
    "conversion (no index construction, no block consolidation), the "
    "right choice when the kernel is already columnar (numpy/pyarrow "
    "compute). Same Arrow transport, less per-batch overhead; the "
    "kernel here is pure pyarrow.compute so nothing materializes "
    "row-wise anywhere.",
    tags=("udf", "arrow"),
)
def map_in_arrow_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _double_chars(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            out = pa.table(
                {
                    "doc_id": tbl["doc_id"],
                    "double_chars": pc.multiply(
                        pc.utf8_length(tbl.column("text").combine_chunks()), 2
                    ),
                }
            )
            yield from out.to_batches()

    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInArrow(_double_chars, schema="doc_id bigint, double_chars bigint")
    )
