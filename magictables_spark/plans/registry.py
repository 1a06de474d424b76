"""Query registry plumbing — the operator coverage matrix (SURVEY.md §2).

Every op-slug maps to
  - a PySpark implementation ``(spark, sf_dir) -> DataFrame`` and
  - (when SQL-expressible) a DuckDB oracle SQL string computing the
    same result on the same parquet tables.

Determinism rules that make the driver's order-insensitive value-hash
stable across two engines:

1. **Money arithmetic**: double summation is order-dependent, so money
   aggregates are computed in exact scaled int64 (columns carry exactly
   2 decimal digits) and converted to ``DOUBLE`` at the end. The *same
   SQL fragment* is passed to both Spark (``F.expr``) and DuckDB, so
   the exact integers — and the final doubles — are bit-identical.
2. **Timestamps**: emitted as ``CAST(ts AS DATE) -> string`` or
   formatted strings; never raw timestamp objects (ns-vs-µs and tz
   representation differ between engines).
3. **Top-k / limit**: always ordered with a unique tie-break column.
4. **Averages**: ``CAST(SUM(int) AS DOUBLE) / scale / COUNT(*)`` on
   both sides (identical inputs + identical double ops => identical
   results; never engine-native AVG whose internals differ).
5. **Embeddings**: float32 vectors are quantized to int64
   (``ROUND(x * 1e6)``) before any dot product/norm, making similarity
   integer-exact and order-independent; only the final cosine is a
   double derived from identical integers.
6. **Driver-safe output schemas**: every registered query emits ONLY
   scalar columns — int/bigint/float/double/string/boolean/date/
   timestamp (``tests.parity.DRIVER_SAFE_TYPENAMES``).  The driver's
   canonicalization is pandas ``sort_values`` + value hash, which
   crashes on array/map/struct cells and hash-diverges on Decimal
   (both measured in CORRECTNESS_r08).  Ordered collections surface as
   joined strings (``array_join`` / ``array_to_string``), exact decimal
   sums as a final ``CAST(... AS BIGINT)``.  Enforced by
   ``tests/test_output_types.py`` + the schema gate inside
   ``tests.parity.compare`` and replayed by
   ``tools/driver_canon_smoke.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from magictables_spark.plans.catalog import load_table

# ---------------------------------------------------------------------------
# registry plumbing
# ---------------------------------------------------------------------------


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def q(slug: str, oracle: str | None = None, doc: str = "", tags: tuple = ()):  # decorator
    def deco(fn):
        REGISTRY[slug] = QuerySpec(fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {slug: spec.fn for slug, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {slug: spec.oracle for slug, spec in REGISTRY.items() if spec.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Rows above which an intentionally-quadratic exact baseline refuses to
# run: 10k rows is already ~5e7 candidate pairs, and the one un-prefiltered
# caller (embed_neardup) evaluates an interpreted 64-dim HOF dot per pair
# inside a BroadcastNestedLoopJoin — measured ~28 s at 2k rows (2e6
# pairs), i.e. ~45 min at the sf1 probe's 20k rows (2e8 pairs), which the
# round-7 sf1 sweep hit in practice. The guard exists precisely to stop
# that launch when a linear-shuffle twin (LSH banding / bucketed ANN)
# exists; fixture runs (<= 2k vectors) stay far below it.
QUADRATIC_GUARD_ROWS = 10_000


class QuadraticInputError(ValueError):
    """Raised when an exact all-pairs baseline is asked to run on an
    input large enough that only its linear-scale twin makes sense."""


def guard_quadratic(df: DataFrame, slug: str, scale_twin: str, limit: int | None = None) -> DataFrame:
    """Fail fast before an all-pairs join. The count is one bounded job
    (same class of driver roundtrip as the LSH bucket-space sizing);
    passing the guard returns the input unchanged. The registered
    fixture runs stay far below the threshold, so driver/oracle
    behavior is unaffected — this only stops a user pointing the exact
    baseline at a production-size table."""
    if limit is None:
        limit = QUADRATIC_GUARD_ROWS
    n = df.count()
    if n > limit:
        raise QuadraticInputError(
            f"{slug}: input has {n} rows (> {limit}); this exact all-pairs "
            f"baseline is quadratic by design — use {scale_twin} at scale"
        )
    return df


# ---------------------------------------------------------------------------
# shared exact-arithmetic SQL fragments (parsed identically by Spark & DuckDB)
# ---------------------------------------------------------------------------
# All money columns carry exactly 2 decimal digits, so ROUND(x*100) is an
# exact integer in both engines and aggregation proceeds in pure int64 —
# compact UnsafeRow longs on the Spark side (a DECIMAL with precision > 18
# would box a BigInteger per row inside the agg update loop: measured
# 10-40x slower) and HUGEINT on the DuckDB side. The final
# CAST(... AS DOUBLE) / 10^k conversions are IEEE-defined on identical
# integers, so the resulting doubles are bit-identical across engines.

QTY_I = "CAST(ROUND(l_quantity * 100) AS BIGINT)"  # qty*100
PRICE_I = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"  # price cents
DISC_I = "CAST(ROUND(l_discount * 100) AS BIGINT)"  # discount pct-points
TAX_I = "CAST(ROUND(l_tax * 100) AS BIGINT)"  # tax pct-points
REV_I = f"({PRICE_I} * (100 - {DISC_I}))"  # scaled 10^4
CHARGE_I = f"({REV_I} * (100 + {TAX_I}))"  # scaled 10^6

TOTALPRICE_I = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"  # order total cents
