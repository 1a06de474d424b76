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


@q(
    "ohlc_bars",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             date_trunc('hour', ts) AS h,
             {VAL_I} AS v,
             epoch_ms(ts) * 1000000 + event_id AS k
      FROM events
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS bar_start,
           arg_min(v, k) AS open_i,
           MAX(v) AS high_i,
           MIN(v) AS low_i,
           arg_max(v, k) AS close_i,
           COUNT(*) AS n_ticks
    FROM ev GROUP BY event_type, h
    """,
    doc="OHLC bars (open/high/low/close per key per hour) — the "
    "classic financial/telemetry downsampling rollup Polars users "
    "reach group_by_dynamic for. Open/close are argmin/argmax over a "
    "composed (epoch_ms, event_id) key, so ties in the timestamp "
    "break deterministically and both engines elect the same tick; "
    "values stay scaled int64 throughout. ONE partial-aggregated "
    "shuffle on (key, hour) — the ideal rollup shape at any scale.",
    tags=("events", "timeseries",),
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.expr(VAL_I).alias("v"),
        (F.unix_millis(F.col("ts").cast("timestamp")) * 1000000 + F.col("event_id")).alias("k"),
    )
    return ev.groupBy("event_type", "h").agg(
        F.expr("min_by(v, k)").alias("open_i"),
        F.max("v").alias("high_i"),
        F.min("v").alias("low_i"),
        F.expr("max_by(v, k)").alias("close_i"),
        F.count("*").alias("n_ticks"),
    ).select(
        "event_type",
        F.date_format("h", TS_FMT).alias("bar_start"),
        "open_i", "high_i", "low_i", "close_i", "n_ticks",
    )


@q(
    "time_weighted_avg",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, {VAL_I} AS v,
             epoch_ms(ts) AS ms, event_id
      FROM events
    ), seg AS (
      SELECT event_type, v,
             LEAD(ms) OVER (PARTITION BY event_type ORDER BY ms, event_id) - ms AS dt
      FROM ev
    )
    SELECT event_type,
           CAST(SUM(v * dt) AS BIGINT) AS vt_i,
           CAST(SUM(dt) AS BIGINT) AS t_ms,
           CAST(SUM(v * dt) AS DOUBLE) / SUM(dt) / 100.0 AS twap
    FROM seg WHERE dt IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Time-weighted average (TWAP): each observation's value is "
    "held until the next observation, weighted by its holding "
    "duration — the correct mean for irregularly-sampled series "
    "(plain AVG over-weights bursts). One LEAD window per key + one "
    "aggregation; the v*dt products stay in exact int64 (value "
    "cents x millisecond gaps), only the final ratio is a double — "
    "bit-identical cross-engine per the registry determinism rules.",
    tags=("events", "timeseries", "window"),
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(VAL_I).alias("v"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("ms", "event_id")
    seg = ev.withColumn("dt", F.lead("ms").over(w) - F.col("ms")).filter(
        F.col("dt").isNotNull()
    )
    return (
        seg.groupBy("event_type")
        .agg(
            F.sum(F.col("v") * F.col("dt")).alias("vt_i"),
            F.sum("dt").alias("t_ms"),
            (
                F.sum(F.col("v") * F.col("dt")).cast("double")
                / F.sum("dt")
                / 100.0
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


@q(
    "cumulative_distinct",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ), per_day AS (
      SELECT d, COUNT(*) AS n_new FROM first_seen GROUP BY d
    )
    SELECT CAST(d AS VARCHAR) AS day,
           n_new,
           CAST(SUM(n_new) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM per_day ORDER BY d
    """,
    doc="Cumulative distinct users per day (growth accounting). The "
    "naive form — COUNT(DISTINCT) over an expanding window — "
    "re-scans every prefix (quadratic); the scalable identity is "
    "first-seen-date per user, then a running SUM over the tiny "
    "per-day series. Two aggregations + one window over |days| rows; "
    "the events table is touched once.",
    tags=("events", "timeseries", "analytics"),
)
def cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("d"))
    )
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.col("d").cast("string").alias("day"),
        "n_new",
        F.sum("n_new").over(w).alias("cum_users"),
    ).orderBy("day")


_FC_CUTOFF = "2024-01-24 00:00:00"


@q(
    "seasonal_naive_forecast",
    oracle=f"""
    WITH train AS (
      SELECT isodow(ts) - 1 AS dow, hour(ts) AS hr, {VAL_I} AS v
      FROM events WHERE ts < TIMESTAMP '{_FC_CUTOFF}'
    ), model AS (
      -- integer-cents forecast: floor(sum/n) keeps every later step
      -- exact-integer (a double mean would make the MAE sum order-
      -- dependent across engines)
      SELECT dow, hr,
             CAST(SUM(v) AS BIGINT) // COUNT(*) AS fc_cents,
             COUNT(*) AS n_train
      FROM train GROUP BY dow, hr
    ), test AS (
      SELECT isodow(ts) - 1 AS dow, hour(ts) AS hr, {VAL_I} AS v
      FROM events WHERE ts >= TIMESTAMP '{_FC_CUTOFF}'
    )
    SELECT m.dow, m.hr,
           m.n_train,
           COUNT(t.v) AS n_test,
           CAST(m.fc_cents AS DOUBLE) / 100.0 AS forecast,
           CAST(SUM(abs(t.v - m.fc_cents)) AS BIGINT) AS abs_err_cents,
           CAST(CAST(SUM(abs(t.v - m.fc_cents)) AS BIGINT) AS DOUBLE)
             / 100.0 / COUNT(t.v) AS mae
    FROM model m JOIN test t ON m.dow = t.dow AND m.hr = t.hr
    GROUP BY m.dow, m.hr, m.n_train, m.fc_cents
    """,
    doc="Seasonal-naive forecasting over the event stream: train a "
    "per-(day-of-week, hour) mean on history before a fixed cutoff, "
    "score the held-out tail with per-cell MAE — the baseline every "
    "demand/traffic forecast is measured against. The forecast is "
    "floor(sum/n) in exact integer cents so the error summation stays "
    "order-independent int64 (a double mean would reintroduce "
    "engine-specific summation order); only the final /100/n division "
    "is a double. Day-of-week is ISO Monday=0 on both engines (Spark "
    "weekday(), DuckDB isodow-1). Plan: two scans of the partition-"
    "pruned time ranges, a 168-cell model dim BROADCAST onto the test "
    "side, one (dow, hr) partial agg — at 100 TB the model is "
    "literally a 168-row table.",
    tags=("events", "timeseries", "analytics", "scale"),
)
def seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.weekday("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.expr(VAL_I).alias("v"),
        F.col("ts"),
    )
    cutoff = F.lit(_FC_CUTOFF).cast("timestamp")
    model = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("dow", "hr")
        .agg(
            # floor division in exact int64: Spark `div` truncates toward
            # zero but DuckDB `//` floors, so correct the truncation when
            # the sum is negative (count is always > 0) — keeps the two
            # engines bit-identical even on negative value streams
            F.expr(
                "CAST(SUM(v) AS BIGINT) div COUNT(*) "
                "- CASE WHEN SUM(v) % COUNT(*) != 0 AND SUM(v) < 0 "
                "THEN 1 ELSE 0 END"
            ).alias("fc_cents"),
            F.count("*").alias("n_train"),
        )
    )
    test = ev.filter(F.col("ts") >= cutoff).select("dow", "hr", "v")
    return (
        test.join(F.broadcast(model), ["dow", "hr"])
        .groupBy("dow", "hr", "n_train", "fc_cents")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.abs(F.col("v") - F.col("fc_cents"))).cast("bigint").alias("abs_err_cents"),
        )
        .select(
            "dow",
            "hr",
            "n_train",
            "n_test",
            (F.col("fc_cents").cast("double") / 100.0).alias("forecast"),
            "abs_err_cents",
            (F.col("abs_err_cents").cast("double") / 100.0 / F.col("n_test")).alias("mae"),
        )
    )


@q(
    "seasonal_anomaly_flags",
    oracle=f"""
    WITH train AS (
      SELECT isodow(ts) - 1 AS dow, hour(ts) AS hr, {VAL_I} AS v
      FROM events WHERE ts < TIMESTAMP '{_FC_CUTOFF}'
    ), med AS (
      SELECT dow, hr,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) AS med_cents
      FROM train GROUP BY dow, hr
    ), mad AS (
      SELECT t.dow, t.hr, m.med_cents,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(t.v - m.med_cents))
                  AS BIGINT) AS mad_cents
      FROM train t JOIN med m ON t.dow = m.dow AND t.hr = m.hr
      GROUP BY t.dow, t.hr, m.med_cents
    ), test AS (
      SELECT event_id, isodow(ts) - 1 AS dow, hour(ts) AS hr, {VAL_I} AS v
      FROM events WHERE ts >= TIMESTAMP '{_FC_CUTOFF}'
    )
    SELECT t.event_id,
           t.dow, t.hr,
           CAST(t.v AS DOUBLE) / 100.0 AS value,
           CAST(m.med_cents AS DOUBLE) / 100.0 AS cell_median,
           abs(t.v - m.med_cents) > 3 * m.mad_cents AS is_anomaly
    FROM test t JOIN mad m ON t.dow = m.dow AND t.hr = m.hr
    WHERE abs(t.v - m.med_cents) > 3 * m.mad_cents
    """,
    doc="Seasonal anomaly detection on the event stream: per-(ISO-dow, "
    "hour) robust center (exact PERCENTILE_DISC median in integer "
    "cents) and MAD from history before the cutoff; held-out events "
    "whose |value - median| exceeds 3 x MAD flag as anomalies — the "
    "median/MAD rule that survives the outliers a mean/stddev gate is "
    "blown up by. EVERY comparison is exact int64 (discrete medians "
    "of integer cents), so the flag set is bit-identical across "
    "engines. Plan: two train aggregations over the pruned history "
    "scan, the 168-cell (median, MAD) model dim BROADCASTS onto the "
    "test side — at 100 TB the expensive part is the one history "
    "scan; the decision itself is a map-side predicate.",
    tags=("events", "timeseries", "analytics", "quality", "scale"),
)
def seasonal_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.weekday("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.expr(VAL_I).alias("v"),
        F.col("ts"),
    )
    cutoff = F.lit(_FC_CUTOFF).cast("timestamp")
    train = ev.filter(F.col("ts") < cutoff).select("dow", "hr", "v")
    med = train.groupBy("dow", "hr").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)").alias(
            "med_cents"
        )
    )
    mad = (
        train.join(med, ["dow", "hr"])
        .groupBy("dow", "hr", "med_cents")
        .agg(
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(v - med_cents))"
                " AS BIGINT)"
            ).alias("mad_cents")
        )
    )
    test = ev.filter(F.col("ts") >= cutoff).select("event_id", "dow", "hr", "v")
    return (
        test.join(F.broadcast(mad), ["dow", "hr"])
        .filter(F.abs(F.col("v") - F.col("med_cents")) > 3 * F.col("mad_cents"))
        .select(
            "event_id",
            "dow",
            "hr",
            (F.col("v").cast("double") / 100.0).alias("value"),
            (F.col("med_cents").cast("double") / 100.0).alias("cell_median"),
            (F.abs(F.col("v") - F.col("med_cents")) > 3 * F.col("mad_cents")).alias(
                "is_anomaly"
            ),
        )
    )


@q(
    "ses_forecast_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type, COUNT(*) AS n_days,
             strftime(MAX(day), '%Y-%m-%d') AS last_day,
             list(v ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, last_day,
           list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc)
             AS forecast_cents
    FROM series
    ORDER BY event_type
    """,
    doc="Simple exponential smoothing (alpha=0.3) one-step-ahead "
    "forecast of daily revenue per event type — the recursive "
    "time-series recurrence l_t = a*x_t + (1-a)*l_{t-1} expressed as "
    "an ORDERED LEFT FOLD over the per-key daily array: Spark's "
    "aggregate() and DuckDB's list_reduce() both fold left from the "
    "first element with the IDENTICAL '0.3*x + 0.7*acc' IEEE op "
    "sequence, so even though smoothing is a float recurrence (the "
    "class usually declared rows-only) the whole forecast is "
    "value-hash-checked cross-engine. The daily sums enter the fold "
    "as exact-integer-valued doubles (< 2^53). Plan shape: one "
    "(key, day) aggregate, one key-level ordered collect of a "
    "~31-element array, one map-side fold — recursions over BOUNDED "
    "per-key series belong in an array fold, not a self-join chain "
    "or a Python loop; unbounded series would window into fixed "
    "chunks first (the ewma_windowed variant).",
    tags=("timeseries", "forecast", "stats"),
)
def ses_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
            .cast("double")
            .alias("v")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
        F.expr("transform(array_sort(collect_list(struct(day, v))), s -> s.v)")
        .alias("vals"),
    )
    return series.select(
        "event_type",
        "n_days",
        "last_day",
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
            " (acc, x) -> 0.3 * x + 0.7 * acc)"
        ).alias("forecast_cents"),
    ).orderBy("event_type")


@q(
    "holt_forecast_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type, COUNT(*) AS n_days,
             list(v ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    ), folded AS (
      SELECT event_type, n_days,
             list_reduce(
               list_transform(vals, x -> [x, 0.0]),
               (acc, e) -> [
                 0.3 * e[1] + 0.7 * (acc[1] + acc[2]),
                 0.2 * ((0.3 * e[1] + 0.7 * (acc[1] + acc[2])) - acc[1])
                   + 0.8 * acc[2]
               ]) AS lb
      FROM series
    )
    SELECT event_type, n_days,
           lb[1] AS level_cents, lb[2] AS trend_cents,
           lb[1] + lb[2] AS forecast_cents
    FROM folded
    ORDER BY event_type
    """,
    doc="Holt linear-trend forecast (double exponential smoothing, "
    "alpha=0.3 beta=0.2) — the COUPLED two-state recurrence "
    "(l_t = a*x + (1-a)*(l+b); b_t = B*(l_t-l) + (1-B)*b) that "
    "normally forces row-at-a-time code, expressed as a single "
    "ordered left fold whose accumulator is a 2-ELEMENT ARRAY "
    "[level, trend]: DuckDB's list_reduce requires the accumulator "
    "to share the element type, so values lift to [x, 0] and both "
    "engines fold the identical op sequence (the repeated l_t "
    "subexpression re-evaluates to the same IEEE double in both) — "
    "making even a coupled float recursion value-hash-checked "
    "cross-engine, one structural step beyond ses_forecast_daily's "
    "scalar fold. Same plan shape: keyed daily aggregate, ordered "
    "bounded collect, map-side fold.",
    tags=("timeseries", "forecast", "stats"),
)
def holt_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
            .cast("double")
            .alias("v")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.expr("transform(array_sort(collect_list(struct(day, v))), s -> s.v)")
        .alias("vals"),
    )
    # 0-based element access in Spark (the oracle's duck form is
    # 1-based); same fold, same float op order
    lt = "0.3 * e[0] + 0.7 * (acc[0] + acc[1])"
    folded = series.select(
        "event_type",
        "n_days",
        # init = [x1, 0] (list_reduce's first-element seed), fold the rest
        F.expr(
            "aggregate(transform(slice(vals, 2, size(vals) - 1),"
            " x -> array(x, CAST(0.0 AS DOUBLE))),"
            " array(vals[0], CAST(0.0 AS DOUBLE)),"
            f" (acc, e) -> array({lt},"
            f" 0.2 * (({lt}) - acc[0]) + 0.8 * acc[1]))"
        ).alias("lb"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.expr("lb[0]").alias("level_cents"),
        F.expr("lb[1]").alias("trend_cents"),
        F.expr("lb[0] + lb[1]").alias("forecast_cents"),
    ).orderBy("event_type")


# Holt-Winters additive step (0-based Spark form; the oracle repeats the
# identical arithmetic 1-based). acc = [level, trend, s_now, s_next .. ]:
# acc[2] is the seasonal component applying to the CURRENT step; each
# step shifts the 7-slot seasonal ring left and appends the freshly
# updated seasonal at the end, so acc[2] is always the one due next.
_HW_LT = "0.25 * (e[0] - acc[2]) + 0.75 * (acc[0] + acc[1])"
_HW_BT = f"0.1 * (({_HW_LT}) - acc[0]) + 0.9 * acc[1]"
_HW_ST = f"0.3 * (e[0] - ({_HW_LT})) + 0.7 * acc[2]"

_HW_LT_1 = "0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2])"
_HW_BT_1 = f"0.1 * (({_HW_LT_1}) - acc[1]) + 0.9 * acc[2]"
_HW_ST_1 = f"0.3 * (e[1] - ({_HW_LT_1})) + 0.7 * acc[3]"


@q(
    "hw_forecast_daily",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type, COUNT(*) AS n_days,
             list(v ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    ), folded AS (
      SELECT event_type, n_days,
             list_reduce(
               list_transform(vals, x -> [x, 0.0, 0.0, 0.0, 0.0, 0.0,
                                          0.0, 0.0, 0.0]),
               (acc, e) -> [
                 {_HW_LT_1},
                 {_HW_BT_1},
                 acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
                 {_HW_ST_1}
               ]) AS st
      FROM series
    )
    SELECT event_type, n_days,
           st[1] AS level_cents, st[2] AS trend_cents,
           st[3] AS season_next_cents,
           st[1] + st[2] + st[3] AS forecast_cents
    FROM folded
    ORDER BY event_type
    """,
    doc="Holt-Winters additive triple smoothing (alpha=0.25 beta=0.1 "
    "gamma=0.3, weekly season m=7) one-step forecast of daily revenue "
    "per event type — completes the fold-forecast family "
    "(ses_forecast_daily scalar state -> holt_forecast_daily 2-state "
    "-> here a 9-STATE accumulator [level, trend, 7-slot seasonal "
    "ring]). The seasonal ring rotates inside the fold: acc[2] is "
    "always the seasonal due at the current step, each step shifts "
    "the ring left and appends the gamma-updated seasonal, so the "
    "recurrence never needs a position index. Init is the documented "
    "zero-seasonal variant (l0 = x1, b0 = 0, s = 0): seasonals are "
    "LEARNED through the gamma term over the fixture's ~4 weekly "
    "cycles rather than pre-estimated, which keeps the fold seed a "
    "pure literal and the whole recursion one expression. Spark's "
    "aggregate() folds scalar elements into the array accumulator; "
    "DuckDB's list_reduce needs element type == acc type, so values "
    "lift to 9-element arrays — both engines execute the IDENTICAL "
    "IEEE op sequence (the repeated l_t subexpression re-evaluates "
    "bit-equal), making a coupled 9-state float recursion fully "
    "value-hash-checked cross-engine. Plan shape unchanged from the "
    "siblings: keyed daily int64 aggregate, ordered bounded collect "
    "(~31 elements), map-side fold — per-key bounded series fold, "
    "no self-join chain, no Python.",
    tags=("timeseries", "forecast", "stats"),
)
def hw_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
            .cast("double")
            .alias("v")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.expr("transform(array_sort(collect_list(struct(day, v))), s -> s.v)")
        .alias("vals"),
    )
    zeros = ", ".join(["CAST(0.0 AS DOUBLE)"] * 8)
    folded = series.select(
        "event_type",
        "n_days",
        # seed = [x1, 0, 0x7] (list_reduce's lifted-first-element seed);
        # fold the remaining days with the rotating-ring step
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1),"
            f" array(vals[0], {zeros}),"
            f" (acc, x) -> array({_HW_LT.replace('e[0]', 'x')},"
            f" {_HW_BT.replace('e[0]', 'x')},"
            " acc[3], acc[4], acc[5], acc[6], acc[7], acc[8],"
            f" {_HW_ST.replace('e[0]', 'x')}))"
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.expr("st[0]").alias("level_cents"),
        F.expr("st[1]").alias("trend_cents"),
        F.expr("st[2]").alias("season_next_cents"),
        F.expr("st[0] + st[1] + st[2]").alias("forecast_cents"),
    ).orderBy("event_type")


@q(
    "rolling_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT strftime(dd.d, '%Y-%m-%d') AS day,
           (SELECT COUNT(DISTINCT u.user_id) FROM ud u
            WHERE u.d BETWEEN dd.d - 6 AND dd.d) AS users_7d,
           (SELECT CAST(SUM(x.n) AS BIGINT) FROM daily x
            WHERE x.d BETWEEN dd.d - 6 AND dd.d) AS events_7d
    FROM (SELECT d FROM daily) dd
    ORDER BY 1
    """,
    doc="Trailing 7-day rolling DISTINCT active users (plus rolling "
    "event volume) per day — the WAU curve, and the one rolling "
    "metric a plain window CANNOT express (COUNT(DISTINCT) over a "
    "moving frame is not an associative window aggregate; "
    "cumulative_distinct covers the from-day-one variant, this is "
    "the bounded-window one). Spark-first shape: dedup to (user, "
    "day) FIRST (the heavy, key-partitioned shuffle — bounded by "
    "|users| x |days| regardless of event volume), then each "
    "user-day CONTRIBUTES itself to the 7 calendar days it keeps "
    "the user active in via explode(sequence(day, day+6)) — a "
    "static x7 row multiplier on the already-deduped set — and a "
    "two-phase countDistinct per target day finishes. The rolling "
    "event count rides the same explode over the tiny daily "
    "aggregate. Target days outside the observed domain are "
    "dropped by a semi-join against observed days, so the output "
    "domain matches the oracle's correlated range scan exactly. "
    "At 100 TB the x7 explode happens strictly after both "
    "aggregates, never on raw events; the alternative (range self "
    "-join of days x events) re-scans the fact 7x.",
    tags=("timeseries", "events", "window"),
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    ud = ev.distinct()
    daily = ev.groupBy("d").agg(F.count("*").alias("n"))
    days = daily.select("d")
    users = (
        ud.select(
            "user_id",
            F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("wd"),
        )
        .join(days.withColumnRenamed("d", "wd"), "wd", "left_semi")
        .groupBy("wd")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )
    volume = (
        daily.select(
            "n", F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("wd")
        )
        .join(days.withColumnRenamed("d", "wd"), "wd", "left_semi")
        .groupBy("wd")
        .agg(F.sum("n").alias("events_7d"))
    )
    return (
        users.join(volume, "wd")
        .select(
            F.date_format("wd", "yyyy-MM-dd").alias("day"),
            "users_7d",
            "events_7d",
        )
        .orderBy("day")
    )
