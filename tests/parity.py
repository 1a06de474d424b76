"""Order-insensitive Spark-vs-DuckDB comparison, mirroring the driver gate.

The driver compares row count + schema + value hash with columns sorted
by name. We reproduce that as exactly as we can so a local green run
predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd

# The driver canonicalizes results with pandas ``sort_values`` over all
# columns and hashes the cell values. That makes exactly these Spark
# output types safe; everything else either crashes the sort (arrays,
# maps, structs: unhashable/unorderable python objects) or hashes
# engine-dependently (DECIMAL: Spark Decimal vs DuckDB decimal128
# disagree under the driver's canon even when values match — measured
# in CORRECTNESS_r08). Every registered query MUST emit only these.
DRIVER_SAFE_TYPENAMES = frozenset(
    {
        "byte",
        "short",
        "integer",
        "long",
        "float",
        "double",
        "string",
        "boolean",
        "date",
        "timestamp",
        "timestamp_ntz",
    }
)


def driver_unsafe_columns(spark_df) -> list[tuple[str, str]]:
    """(name, typeName) for every output column the driver cannot
    canonicalize. Empty list == driver-safe schema."""
    return [
        (f.name, f.dataType.typeName())
        for f in spark_df.schema.fields
        if f.dataType.typeName() not in DRIVER_SAFE_TYPENAMES
    ]


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}" if v != v.to_integral_value() else f"f:{int(v)}"
    if isinstance(v, (bool,)):
        return f"b:{v}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, (datetime, date, pd.Timestamp)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(_canon_cell(x) for x in v) + "]"
    return f"s:{v}"


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    bad = driver_unsafe_columns(spark_df)
    if bad:
        return False, f"driver-unsafe output column types: {bad}"
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    if len(spdf) != len(ddf):
        return False, f"row count: spark={len(spdf)} duckdb={len(ddf)}"
    if sorted(map(str.lower, spdf.columns)) != sorted(map(str.lower, ddf.columns)):
        return False, f"columns: spark={sorted(spdf.columns)} duckdb={sorted(ddf.columns)}"
    spdf.columns = [c.lower() for c in spdf.columns]
    ddf.columns = [c.lower() for c in ddf.columns]
    a, b = canonical_rows(spdf), canonical_rows(ddf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch; first diffs: {diffs}"
    return True, "ok"
