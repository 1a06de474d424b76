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


def _as_num(col, dtype: str):
    """(numeric column, tolerance scale) for distance arithmetic.
    Timestamps map to EXACT integer epoch-micros (a double keeps ints
    exact to 2^53, far past any epoch), so nearest-side comparisons
    can never flip on float rounding vs an oracle's integer datediff;
    tolerance stays caller-friendly in seconds via the 1e6 scale."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")).cast("double"), 1_000_000.0
    if dtype == "date":
        return F.unix_date(col).cast("double") * 86_400_000_000.0, 1_000_000.0
    return col.cast("double"), 1.0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on (backward), earliest with >= (forward), or the
    closer of the two (nearest; ties go backward — deterministic and
    mirrored in the DuckDB oracle). Right value columns get `suffix`.

    ``tolerance`` (same units as `on`; seconds for timestamps) nulls
    the match when its distance exceeds the bound — Polars
    join_asof(strategy=..., tolerance=...) parity. The nearest variant
    still costs ONE shuffle: both directional fills share the same
    hash partitioning (two in-partition sorts, no second exchange)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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

    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    on_num, tol_scale = _as_num(F.col(on), left_dt[on])

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = unioned.select(
            *[c for c in unioned.columns if not c.endswith(suffix)],
            *[
                F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in val_cols
            ],
        )
        out = filled.filter(F.col("__side") == 1).drop("__side")
        if tolerance is not None:
            matched_num, _ = _as_num(F.col(f"{on}{suffix}"), right_dt[on])
            dist = F.abs(on_num - matched_num)
            out = out.select(
                *[c for c in out.columns if not c.endswith(suffix)],
                *[
                    F.when(
                        dist <= F.lit(float(tolerance) * tol_scale), F.col(f"{c}{suffix}")
                    ).alias(f"{c}{suffix}")
                    for c in val_cols
                ],
            )
        return out

    # nearest: fill BOTH directions over the same partitioning (one
    # exchange, two in-partition sorts), then pick the closer match
    # per row; ties (equal distance) go backward
    filled = unioned.select(
        *[c for c in unioned.columns if not c.endswith(suffix)],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w_back).alias(f"{c}__b")
            for c in val_cols
        ],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w_fwd).alias(f"{c}__f")
            for c in val_cols
        ],
    ).filter(F.col("__side") == 1)
    b_num, _ = _as_num(F.col(f"{on}__b"), right_dt[on])
    f_num, _ = _as_num(F.col(f"{on}__f"), right_dt[on])
    db = on_num - b_num
    df = f_num - on_num
    use_b = F.col(f"{on}__f").isNull() | (F.col(f"{on}__b").isNotNull() & (db <= df))
    dist = F.when(use_b, db).otherwise(df)
    in_tol = (
        F.lit(True) if tolerance is None else (dist <= F.lit(float(tolerance) * tol_scale))
    )
    picked = [
        F.when(in_tol & use_b, F.col(f"{c}__b"))
        .when(in_tol & ~use_b, F.col(f"{c}__f"))
        .alias(f"{c}{suffix}")
        for c in val_cols
    ]
    base = [c for c in filled.columns if not (c.endswith("__b") or c.endswith("__f") or c == "__side")]
    return filled.select(*base, *picked)
