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
