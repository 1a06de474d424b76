"""Time-series resampling pack over the `events` fixture.

The reference delegates Polars' `upsample`/`group_by_dynamic` surface
(SURVEY §2.B time ops); these are the Spark-first equivalents:
regular-grid resampling with gap fill and forward fill (LOCF).

Spark-first shape: the hour grid is generated *distributed* —
``sequence(min, max, interval)`` over a 1-row bounds aggregate
cross-joined to the distinct keys — never a driver-side loop. At
100 TB the grid is |keys| x |hours| (tiny next to the fact table) and
broadcasts into the left join against the aggregated series.

Determinism: grid timestamps emitted as formatted strings; sums in
scaled int64 (value carries 2 decimals); LOCF via last-non-null over
a ROWS window with a total order (h is unique per key on the grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magictables_spark.plans.registry import _t, q

VAL_I = "CAST(ROUND(value * 100) AS BIGINT)"
TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _hourly(spark: SparkSession, sf_dir: str):
    """(per-key hourly agg, full key x hour grid) building blocks."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type",
        F.expr(VAL_I).alias("v"),
    )
    agg = ev.groupBy("event_type", "h").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    bounds = ev.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
        )
    )
    return agg, grid


_GRID_CTE = f"""
    WITH ev AS (
      SELECT date_trunc('hour', ts) AS h, event_type, {VAL_I} AS v FROM events
    ),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
    grid AS (
      SELECT t.event_type, gs.h
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN b, unnest(generate_series(b.lo, b.hi, INTERVAL '1 hour')) AS gs(h)
    ),
    agg AS (SELECT event_type, h, COUNT(*) AS n, SUM(v) AS s FROM ev GROUP BY 1, 2)
"""


@q(
    "resample_gapfill",
    oracle=_GRID_CTE
    + """
    SELECT g.event_type,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS win_start,
           COALESCE(a.n, 0)                   AS n_events,
           CAST(COALESCE(a.s, 0) AS DOUBLE) / 100.0 AS sum_value,
           (a.n IS NULL)                      AS is_gap
    FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.h = a.h
    """,
    doc="Hourly resample with zero-filled gaps per event type (Polars "
    "upsample surface). Grid = distinct keys x sequence(lo, hi, 1h), "
    "generated distributed and broadcast into the left join; the fact "
    "side aggregates map-side first, so the shuffle carries |keys x "
    "hours| rows, not |events|.",
    tags=("events", "timeseries"),
)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg, grid = _hourly(spark, sf_dir)
    return grid.join(agg, ["event_type", "h"], "left").select(
        "event_type",
        F.date_format("h", TS_FMT).alias("win_start"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        (F.coalesce("s", F.lit(0)).cast("double") / 100.0).alias("sum_value"),
        F.col("n").isNull().alias("is_gap"),
    )


@q(
    "locf_fill",
    oracle=_GRID_CTE
    + """
    SELECT event_type, win_start, n_events,
           CAST(COALESCE(filled, 0) AS DOUBLE) / 100.0 AS sum_value_locf
    FROM (
      SELECT g.event_type,
             strftime(g.h, '%Y-%m-%d %H:%M:%S') AS win_start,
             COALESCE(a.n, 0) AS n_events,
             last_value(a.s IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS filled
      FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.h = a.h
    )
    """,
    doc="Forward fill (LOCF) after hourly resample: gap hours inherit "
    "the last observed hourly sum per key (Polars fill_null(strategy="
    "'forward') surface). last(ignorenulls) over a ROWS window; the "
    "window partitions by key, so it shuffles the small grid only.",
    tags=("events", "timeseries", "window"),
)
def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg, grid = _hourly(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("s", ignorenulls=True).over(w).alias("filled"),
        )
        .select(
            "event_type",
            F.date_format("h", TS_FMT).alias("win_start"),
            "n_events",
            (F.coalesce("filled", F.lit(0)).cast("double") / 100.0).alias(
                "sum_value_locf"
            ),
        )
    )


@q(
    "interpolate_linear",
    oracle=_GRID_CTE
    + """
    SELECT event_type, win_start, n_events, interp_value
    FROM (
      SELECT g.event_type,
             strftime(g.h, '%Y-%m-%d %H:%M:%S') AS win_start,
             COALESCE(a.n, 0) AS n_events,
             CASE
               WHEN a.s IS NOT NULL THEN CAST(a.s AS DOUBLE) / 100.0
               ELSE COALESCE((
                 CAST(last_value(a.s IGNORE NULLS) OVER back AS DOUBLE)
                 + CAST((first_value(a.s IGNORE NULLS) OVER fwd
                         - last_value(a.s IGNORE NULLS) OVER back)
                        * (rn - last_value(CASE WHEN a.s IS NOT NULL THEN rn END
                                           IGNORE NULLS) OVER back) AS DOUBLE)
                   / CAST(first_value(CASE WHEN a.s IS NOT NULL THEN rn END
                                      IGNORE NULLS) OVER fwd
                          - last_value(CASE WHEN a.s IS NOT NULL THEN rn END
                                       IGNORE NULLS) OVER back AS DOUBLE)
               ), CAST(last_value(a.s IGNORE NULLS) OVER back AS DOUBLE)
               ) / 100.0
             END AS interp_value
      FROM (
        SELECT g0.*, ROW_NUMBER() OVER (PARTITION BY g0.event_type
                                        ORDER BY g0.h) AS rn
        FROM grid g0
      ) g
      LEFT JOIN agg a ON g.event_type = a.event_type AND g.h = a.h
      WINDOW back AS (PARTITION BY g.event_type ORDER BY g.h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd AS (PARTITION BY g.event_type ORDER BY g.h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    """,
    doc="Linear interpolation over resample gaps (Polars "
    "interpolate()): a missing hour gets prev + (next-prev)*k/n "
    "between its bracketing observations. The arithmetic runs on "
    "exact int64 sums with ONE double division in a fixed order, so "
    "both engines produce bit-identical doubles — integer floor "
    "division would NOT work (DuckDB // floors, Spark div truncates; "
    "they disagree on negative deltas). Leading gaps stay NULL, "
    "trailing gaps fall back to LOCF (next is NULL -> division "
    "yields NULL -> coalesce to prev). Two windows over one grid "
    "shuffle.",
    tags=("events", "timeseries", "window"),
)
def interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg, grid = _hourly(spark, sf_dir)
    w_key = Window.partitionBy("event_type").orderBy("h")
    back = w_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w_key.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    g = grid.withColumn("rn", F.row_number().over(w_key)).join(
        agg, ["event_type", "h"], "left"
    )
    obs_rn = F.when(F.col("s").isNotNull(), F.col("rn"))
    prev_s = F.last("s", ignorenulls=True).over(back)
    next_s = F.first("s", ignorenulls=True).over(fwd)
    prev_rn = F.last(obs_rn, ignorenulls=True).over(back)
    next_rn = F.first(obs_rn, ignorenulls=True).over(fwd)
    interp = (
        prev_s.cast("double")
        + ((next_s - prev_s) * (F.col("rn") - prev_rn)).cast("double")
        / (next_rn - prev_rn).cast("double")
    )
    # trailing gap: next is NULL -> interp NULL -> LOCF to prev
    filled = F.when(F.col("s").isNotNull(), F.col("s").cast("double")).otherwise(
        F.coalesce(interp, prev_s.cast("double"))
    )
    return g.select(
        "event_type",
        F.date_format("h", TS_FMT).alias("win_start"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        (filled / 100.0).alias("interp_value"),
    )
