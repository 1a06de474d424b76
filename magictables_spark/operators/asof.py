"""As-of join — the time-series join Spark lacks natively (SURVEY §2.B
"joins — as-of/range": Polars exposes join_asof; the reference never
calls it but delegates the surface).

Implementation is the scale-correct union+window construction, not a
range cross join:

    1. tag left rows (probe) and right rows (reference values);
    2. union them on aligned schemas;
    3. one shuffle: partition by the `by` keys, order by (ts, side) —
       right rows sort BEFORE left rows at equal timestamps so
       direction='backward' includes exact matches;
    4. last(right_value, ignorenulls) over the running window gives
       every left row the most recent right row at-or-before it;
    5. keep left rows.

Cost: ONE shuffle on the equi-keys (same as a regular sort-merge join)
regardless of time-range density — a naive range join explodes
quadratically inside each key group. At 100 TB this is the difference
between a working plan and an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on (backward) or earliest with >= (forward),
    matching on the `by` keys. Right value columns get `suffix`."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])

    left_dt = dict(left.dtypes)
    right_dt = dict(right.dtypes)
    left_only = [c for c in left.columns if c != on and c not in by]
    # right's `on` rides along suffixed (callers usually want the matched
    # timestamp), plus every non-key right column
    val_cols = [c for c in right.columns if c not in by]

    l_tag = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right_dt[c]).alias(f"{c}{suffix}") for c in val_cols],
    )
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left_dt[c]).alias(c) for c in left_only],
        *[F.col(c).alias(f"{c}{suffix}") for c in val_cols],
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = unioned.select(
        *[c for c in unioned.columns if not c.endswith(suffix)],
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in val_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
