"""Regression, hypothesis-test & resampling pack over `events`.

The reference's Polars surface ends at describe/corr; a real analytics
engine also ships the next tier of statistics every experimentation /
feature pipeline reaches for: grouped OLS regression (trend per key,
batch AND as a streaming job), the Theil-Sen robust trend, EWMA (the
pandas ``ewm`` surface), a rank-based two-sample test (Mann-Whitney
U), the chi-square independence test, a Poisson-bootstrap confidence
interval, and a Gini skew diagnostic for shuffle keys. Every one is
value-hash-checked against DuckDB; tests/test_regression_pack.py
additionally re-derives each statistic from first principles in
numpy/hashlib so a formula error shared by both engines can't hide.

Determinism strategy (the registry.py rules, applied hard):
- every sufficient statistic is an EXACT int64 (value in cents, time
  as an hour index, ranks kept DOUBLED so average-rank ties stay
  integral) accumulated with map-side partial aggregation;
- the final statistics touch doubles only through a FIXED chain of
  correctly-rounded IEEE ops whose expression text is SHARED between
  the Spark plan and the DuckDB oracle (the ``_LR_*`` / ``_MWU_*``
  fragments below), so slopes, R², U and z hash-match bit-for-bit;
- EWMA weights are powers of two written as exact double literals and
  combined in one fixed left-to-right expression, so the only
  rounding is the same rounding in both engines.

Scale notes: `linreg_by_group` and `mannwhitney_u` reduce to one
keyed exchange plus a constant-size frame (5 event types / the
value-domain-bounded distinct-cents frame); `ewma_windowed` is one
keyed window over the hourly grid. No per-row Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magictables_spark.plans.joins_advanced import _dec_dbl_duck, _dec_dbl_spark
from magictables_spark.plans.registry import _t, q
from magictables_spark.plans.similarity import _h60_duck, _h60_spark

VAL_I = "CAST(ROUND(value * 100) AS BIGINT)"  # exact cents

# hour index since the corpus anchor; subtract-then-divide so the
# session-timezone offset cancels before the (exact) integer division
_X_SPARK = (
    "CAST((unix_timestamp(date_trunc('HOUR', ts)) - "
    "unix_timestamp(TIMESTAMP '2024-01-01 00:00:00')) div 3600 AS BIGINT)"
)
_X_DUCK = (
    "CAST((CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - "
    "CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT)) // 3600 AS BIGINT)"
)

# OLS closed form on exact moment sums. First moments (sx, sy) stay
# BIGINT; SECOND moments accumulate in DECIMAL(38,0) — n * syy already
# passes 2^63 at ~300k rows/group (the 320k scale probe caught the
# ANSI ARITHMETIC_OVERFLOW), the corr_exact lesson. Each moment
# crosses into double via the deterministic 2^32 hi/lo split
# (_dec_dbl_*: DuckDB's direct decimal->double cast is 1 ulp off past
# 2^53), then the combination n*Sxy - Sx*Sy etc. runs in doubles with
# the identical op sequence in both engines. NULLIF guards the
# degenerate all-same-x / all-same-y groups.


def _lr_frags(dd) -> tuple[str, str, str]:
    """(slope, intercept, r2) SQL fragments; ``dd`` renders a
    DECIMAL(38,0) column as a deterministically-converted double."""
    n_d, sx_d, sy_d = "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    num = f"({n_d} * {dd('sxy')} - {sx_d} * {sy_d})"
    denx = f"({n_d} * {dd('sxx')} - {sx_d} * {sx_d})"
    deny = f"({n_d} * {dd('syy')} - {sy_d} * {sy_d})"
    slope = f"({num} / NULLIF({denx}, 0.0))"
    intercept = f"(({sy_d} - {slope} * {sx_d}) / {n_d})"
    r2 = f"(({num} * {num}) / NULLIF({denx} * {deny}, 0.0))"
    return slope, intercept, r2


_LR_DUCK = _lr_frags(lambda c: _dec_dbl_duck(c))
_LR_SPARK = _lr_frags(lambda c: _dec_dbl_spark(c))


@q(
    "linreg_by_group",
    oracle=f"""
    WITH b AS (
      SELECT event_type, {_X_DUCK} AS x, {VAL_I} AS y FROM events
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x * x AS DECIMAL(38, 0))) AS sxx,
             SUM(CAST(x * y AS DECIMAL(38, 0))) AS sxy,
             SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy
      FROM b GROUP BY event_type
    )
    SELECT event_type, n, sx, sy,
           {_LR_DUCK[0]} AS slope_cents_per_hour,
           {_LR_DUCK[1]} AS intercept_cents,
           {_LR_DUCK[2]} AS r2
    FROM s ORDER BY event_type
    """,
    doc="Per-group ordinary-least-squares trend (regr_slope / "
    "regr_intercept / regr_r2 surface): value-cents regressed on the "
    "hour index, one line per event_type. The five sufficient sums "
    "(Sx, Sy, Sxx, Sxy, Syy) are exact int64 accumulated in ONE "
    "map-side-combining keyed agg — the same shape regr_* native "
    "aggregates compile to, but exactly reproducible cross-engine "
    "(native regr_* accumulates doubles in partition order, which can "
    "never hash-match). Slope/intercept/R2 come out of the shared "
    "fixed IEEE chain. Scale: one shuffle keyed on the group, 5-row "
    "result; second moments ride DECIMAL(38,0) so the sums never "
    "overflow (n*Syy breaks int64 at ~3e5 rows/group — caught by the "
    "320k scale probe), and each moment enters double once via the "
    "hi/lo split.",
    tags=("events", "stats", "regression"),
)
def linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type", f"{_X_SPARK} AS x", f"{VAL_I} AS y"
    )
    dec = "DECIMAL(38, 0)"
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x").cast(dec)).alias("sxx"),
        F.sum(F.expr("x * y").cast(dec)).alias("sxy"),
        F.sum(F.expr("y * y").cast(dec)).alias("syy"),
    )
    return s.selectExpr(
        "event_type",
        "n",
        "sx",
        "sy",
        f"{_LR_SPARK[0]} AS slope_cents_per_hour",
        f"{_LR_SPARK[1]} AS intercept_cents",
        f"{_LR_SPARK[2]} AS r2",
    ).orderBy("event_type")


# EWMA over the last 8 observed hourly means, weights 2^-j written as
# exact double literals; one shared left-to-right expression so both
# engines perform the identical sequence of IEEE ops.
_EWMA_W = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125]
_EWMA_NUM = " + ".join(
    f"(CASE WHEN m{j} IS NULL THEN 0.0 ELSE m{j} * {w!r} END)"
    for j, w in enumerate(_EWMA_W)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN m{j} IS NULL THEN 0.0 ELSE {w!r} END)" for j, w in enumerate(_EWMA_W)
)
_EWMA = f"(({_EWMA_NUM}) / ({_EWMA_DEN}))"


@q(
    "ewma_windowed",
    oracle=f"""
    WITH hr AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM({VAL_I}) AS BIGINT) AS s
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, h, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m0,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 1) OVER w AS m1,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 2) OVER w AS m2,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 3) OVER w AS m3,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) OVER w AS m4,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 5) OVER w AS m5,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) OVER w AS m6,
             LAG(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 7) OVER w AS m7
      FROM hr WINDOW w AS (PARTITION BY event_type ORDER BY h)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, n,
           m0 AS hourly_mean_cents, {_EWMA} AS ewma_cents
    FROM m ORDER BY event_type, hour
    """,
    doc="Exponentially-weighted moving average of the hourly mean "
    "value per event_type (the pandas ewm / Polars ewm_mean surface), "
    "as a FINITE 8-tap window with half-life-1 weights 2^-j. The "
    "recursive ewm definition accumulates rounding in engine-specific "
    "order; the 8-tap form is the same estimator truncated at weight "
    "1/128 and is exactly reproducible: hourly means are one IEEE "
    "division on exact int64 sums, the tap combination is ONE shared "
    "left-to-right expression with power-of-two double literals. "
    "Scale: one keyed agg + one keyed window, both map-side-friendly; "
    "no unbounded state (8 lags).",
    tags=("events", "stats", "timeseries"),
)
def ewma_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    hr = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").cast("long").alias("n"), F.sum(F.expr(VAL_I)).alias("s"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    mean = (F.col("s").cast("double") / F.col("n").cast("double"))
    m = hr.select(
        "event_type",
        "h",
        "n",
        mean.alias("m0"),
        *[F.lag(mean, j).over(w).alias(f"m{j}") for j in range(1, 8)],
    )
    return m.selectExpr(
        "event_type",
        "date_format(h, 'yyyy-MM-dd HH:mm:ss') AS hour",
        "n",
        "m0 AS hourly_mean_cents",
        f"{_EWMA} AS ewma_cents",
    ).orderBy("event_type", "hour")


# Mann-Whitney U from DOUBLED ranks so average-rank ties stay exact
# integers: doubled avg rank of value v = 2*below(v) + c(v) + 1.
_MWU_U1X2 = "(2 * n1 * n2 + n1 * (n1 + 1) - r1d)"
_MWU_MU = "(CAST(n1 * n2 AS DOUBLE) / 2.0)"
_MWU_SIG = (
    "sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0 * (CAST(n + 1 AS DOUBLE)"
    " - CAST(tie3 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)))"
)
_MWU_Z = f"((CAST({_MWU_U1X2} AS DOUBLE) / 2.0 - {_MWU_MU}) / NULLIF({_MWU_SIG}, 0.0))"


@q(
    "mannwhitney_u",
    oracle=f"""
    WITH s AS (
      SELECT user_id % 2 AS grp, {VAL_I} AS y
      FROM events WHERE event_type = 'purchase'
    ), per_y AS (
      SELECT y,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(COUNT(*) FILTER (WHERE grp = 0) AS BIGINT) AS c1
      FROM s GROUP BY y
    ), w AS (
      SELECT y, c, c1,
             COALESCE(SUM(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM per_y
    ), agg AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n2,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c1 * (2 * below + c + 1)) AS BIGINT) AS r1d,
             CAST(SUM(c * c * c - c) AS BIGINT) AS tie3
      FROM w
    )
    SELECT n1, n2,
           {_MWU_U1X2} AS u1_doubled,
           (2 * n1 * n2 - {_MWU_U1X2}) AS u2_doubled,
           {_MWU_Z} AS z,
           ABS({_MWU_Z}) > 1.959963984540054 AS significant_95
    FROM agg
    """,
    doc="Mann-Whitney U rank-sum test comparing purchase values "
    "between the user_id %% 2 experiment arms — the nonparametric "
    "sibling of ab_test_zscore for metrics with heavy-tailed "
    "distributions. Ranks are never materialized per row: the rank "
    "sum collapses algebraically to a per-distinct-value aggregate "
    "(c, c1, running below-count), so the heavy exchange is keyed on "
    "the cents value and the only ordered frame is bounded by the "
    "VALUE DOMAIN (<= 56k distinct cents), not by n. Doubled ranks "
    "keep average-rank ties integral; U, the tie-corrected normal "
    "z (no continuity correction) and the 5%% verdict come from the "
    "shared fixed IEEE chain.",
    tags=("events", "stats", "hypothesis-test"),
)
def mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr("user_id % 2 AS grp", f"{VAL_I} AS y")
    )
    per_y = s.groupBy("y").agg(
        F.count("*").cast("long").alias("c"),
        F.count_if(F.col("grp") == 0).cast("long").alias("c1"),
    )
    # ordered frame over DISTINCT cents values: bounded by the value
    # domain, not the row count (same pattern as the decile frames)
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    wdf = per_y.withColumn("below", F.coalesce(F.sum("c").over(w), F.lit(0)))
    agg = wdf.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.expr("c - c1")).cast("long").alias("n2"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.expr("c1 * (2 * below + c + 1)")).cast("long").alias("r1d"),
        F.sum(F.expr("c * c * c - c")).cast("long").alias("tie3"),
    )
    return agg.selectExpr(
        "n1",
        "n2",
        f"{_MWU_U1X2} AS u1_doubled",
        f"(2 * n1 * n2 - {_MWU_U1X2}) AS u2_doubled",
        f"{_MWU_Z} AS z",
        f"ABS({_MWU_Z}) > 1.959963984540054 AS significant_95",
    )


# The FIXED event vocabulary (hardcoded literals, same convention as
# the funnel stages) — shared by the ANOVA and chi-square cells.
_CHI_TYPES = ("click", "error", "purchase", "signup", "view")

# One-way ANOVA across the fixed vocabulary: between/within sums of
# squares from exact per-group moments (sums BIGINT, sum-of-squares
# DECIMAL(38)), combined in one fixed-order expression over the 5
# pivoted group columns — same no-engine-ordered-summation discipline
# as chi2_independence.
_ANOVA_K = len(_CHI_TYPES)


def _anova_frags(dd) -> tuple[str, str, str]:
    """(ss_between, ss_within, F) fragments over columns s1..s5,
    n1..n5, syy (total sum of squares accumulator), nn, sy."""
    group_terms = " + ".join(
        f"(CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)"
        f" / NULLIF(CAST(n{i} AS DOUBLE), 0.0))"
        for i in range(1, _ANOVA_K + 1)
    )
    grand = "(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / NULLIF(CAST(nn AS DOUBLE), 0.0))"
    ssb = f"(({group_terms}) - {grand})"
    sst = f"({dd('syy')} - {grand})"
    ssw = f"({sst} - {ssb})"
    f_stat = (
        f"(({ssb} / {float(_ANOVA_K - 1)!r})"
        f" / NULLIF({ssw} / (CAST(nn AS DOUBLE) - {float(_ANOVA_K)!r}), 0.0))"
    )
    return ssb, sst, f_stat


@q(
    "anova_oneway",
    oracle=f"""
    WITH s AS (
      SELECT event_type, {VAL_I} AS y FROM events
    ), cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy,
             {", ".join(
               f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n{i + 1}, "
               f"CAST(SUM(y) FILTER (WHERE event_type = '{t}') AS BIGINT) AS s{i + 1}"
               for i, t in enumerate(_CHI_TYPES)
             )}
      FROM s
    )
    SELECT nn AS n,
           {_anova_frags(_dec_dbl_duck)[0]} AS ss_between,
           {_anova_frags(_dec_dbl_duck)[1]} AS ss_total,
           {_anova_frags(_dec_dbl_duck)[2]} AS f_stat,
           ({_anova_frags(_dec_dbl_duck)[0]} /
             NULLIF({_anova_frags(_dec_dbl_duck)[1]}, 0.0)) AS eta_sq
    FROM cells
    """,
    doc="One-way ANOVA of the cents amounts across the 5 event types: "
    "F statistic and the eta-squared effect size, completing the "
    "classic test battery (z, Wilson, U, KS, chi-square, F). Per-"
    "group first moments pivot into fixed columns via ONE conditional "
    "aggregate (the vocabulary is fixed, so the between-groups sum is "
    "a fixed-order expression, never an engine-ordered SUM over a "
    "group frame); the total sum of squares accumulates in "
    "DECIMAL(38) and crosses to double once via the hi/lo split. No "
    "significance verdict column: the F critical value depends on "
    "the residual df and so on n — the caller thresholds. Scale: one "
    "scan, one 1-row reduce.",
    tags=("events", "stats", "hypothesis-test"),
)
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "DECIMAL(38, 0)"
    s = _t(spark, sf_dir, "events").selectExpr("event_type", f"{VAL_I} AS y")
    aggs = [
        F.count("*").cast("long").alias("nn"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("y * y").cast(dec)).alias("syy"),
    ]
    for i, t in enumerate(_CHI_TYPES):
        aggs.append(F.count_if(F.col("event_type") == t).cast("long").alias(f"n{i + 1}"))
        aggs.append(
            F.sum(F.when(F.col("event_type") == t, F.col("y"))).cast("long").alias(f"s{i + 1}")
        )
    cells = s.agg(*aggs)
    ssb, sst, f_stat = _anova_frags(_dec_dbl_spark)
    return cells.selectExpr(
        "nn AS n",
        f"{ssb} AS ss_between",
        f"{sst} AS ss_total",
        f"{f_stat} AS f_stat",
        f"({ssb} / NULLIF({sst}, 0.0)) AS eta_sq",
    )


# Cohen's d / Hedges' g: standardized mean difference between the
# arms from exact per-arm moments; the pooled SD and the small-sample
# correction are one fixed chain.
_CD_VAR = (
    "(({syy} - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)"
    " / CAST(n{i} AS DOUBLE)) / (CAST(n{i} AS DOUBLE) - 1.0))"
)


def _cd_frags(dd) -> tuple[str, str, str]:
    """(mean_diff, pooled_sd, d) over columns n1,s1,q1,n2,s2,q2."""
    m1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    m2 = "(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    v1 = _CD_VAR.format(syy=dd("q1"), i=1)
    v2 = _CD_VAR.format(syy=dd("q2"), i=2)
    sp = (
        f"sqrt(((CAST(n1 AS DOUBLE) - 1.0) * {v1}"
        f" + (CAST(n2 AS DOUBLE) - 1.0) * {v2})"
        f" / (CAST(n1 + n2 AS DOUBLE) - 2.0))"
    )
    diff = f"({m2} - {m1})"
    d = f"({diff} / NULLIF({sp}, 0.0))"
    return diff, sp, d


@q(
    "effect_size_cohens_d",
    oracle=f"""
    WITH s AS (
      SELECT user_id % 2 AS grp, {VAL_I} AS y
      FROM events WHERE event_type = 'purchase'
    ), cells AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE grp = 0) AS BIGINT) AS n1,
        CAST(SUM(y) FILTER (WHERE grp = 0) AS BIGINT) AS s1,
        SUM(CAST(y * y AS DECIMAL(38, 0))) FILTER (WHERE grp = 0) AS q1,
        CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT) AS n2,
        CAST(SUM(y) FILTER (WHERE grp = 1) AS BIGINT) AS s2,
        SUM(CAST(y * y AS DECIMAL(38, 0))) FILTER (WHERE grp = 1) AS q2
      FROM s
    )
    SELECT n1, n2,
           {_cd_frags(_dec_dbl_duck)[0]} AS mean_diff_cents,
           {_cd_frags(_dec_dbl_duck)[1]} AS pooled_sd_cents,
           {_cd_frags(_dec_dbl_duck)[2]} AS cohens_d,
           {_cd_frags(_dec_dbl_duck)[2]}
             * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0)) AS hedges_g
    FROM cells
    """,
    doc="Standardized effect size of the arm difference in purchase "
    "values: Cohen's d from the pooled SD plus the Hedges' g "
    "small-sample correction — the number that says whether a "
    "'significant' result is actually big enough to act on (the "
    "companion every p-value needs). Per-arm count/sum/sum-of-"
    "squares come from ONE conditional aggregate (second moments in "
    "DECIMAL(38) through the hi/lo split); means, the pooled SD and "
    "both effect sizes are a single fixed IEEE chain. Scale: one "
    "scan, one 1-row reduce.",
    tags=("events", "stats", "experiment"),
)
def effect_size_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "DECIMAL(38, 0)"
    s = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr("user_id % 2 AS grp", f"{VAL_I} AS y")
    )
    cells = s.agg(
        F.count_if(F.col("grp") == 0).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("y"))).cast("long").alias("s1"),
        F.sum(F.when(F.col("grp") == 0, F.expr("y * y").cast(dec))).alias("q1"),
        F.count_if(F.col("grp") == 1).cast("long").alias("n2"),
        F.sum(F.when(F.col("grp") == 1, F.col("y"))).cast("long").alias("s2"),
        F.sum(F.when(F.col("grp") == 1, F.expr("y * y").cast(dec))).alias("q2"),
    )
    diff, sp, d = _cd_frags(_dec_dbl_spark)
    return cells.selectExpr(
        "n1",
        "n2",
        f"{diff} AS mean_diff_cents",
        f"{sp} AS pooled_sd_cents",
        f"{d} AS cohens_d",
        f"{d} * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0)) AS hedges_g",
    )


# Difference-in-differences: the 2x2 (period x arm) design every
# launch retro runs. Four cells of exact moments from one conditional
# aggregate; the DID estimate and its large-sample SE are one fixed
# chain. The period split is the series midpoint in whole hours.
_DID_CELL_VAR = (
    "(({q} - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE))"
    " / (CAST({n} AS DOUBLE) - 1.0))"
)


def _did_frags(dd) -> tuple[str, str]:
    means = {
        c: f"(CAST(s_{c} AS DOUBLE) / CAST(n_{c} AS DOUBLE))"
        for c in ("a1", "a2", "b1", "b2")
    }
    did = f"(({means['b2']} - {means['b1']}) - ({means['a2']} - {means['a1']}))"
    se = (
        "sqrt("
        + " + ".join(
            _DID_CELL_VAR.format(q=dd(f"q_{c}"), s=f"s_{c}", n=f"n_{c}")
            + f" / CAST(n_{c} AS DOUBLE)"
            for c in ("a1", "a2", "b1", "b2")
        )
        + ")"
    )
    return did, se


@q(
    "diff_in_diff",
    oracle=f"""
    WITH b AS (
      SELECT user_id % 2 AS grp, {_X_DUCK} AS hidx, {VAL_I} AS y FROM events
    ), lim AS (
      SELECT (MIN(hidx) + MAX(hidx)) // 2 AS mid FROM b
    ), cells AS (
      SELECT
        {", ".join(
          f"CAST(COUNT(*) FILTER (WHERE grp = {g} AND {cond}) AS BIGINT) AS n_{c}, "
          f"CAST(SUM(y) FILTER (WHERE grp = {g} AND {cond}) AS BIGINT) AS s_{c}, "
          f"SUM(CAST(y * y AS DECIMAL(38, 0))) FILTER (WHERE grp = {g} AND {cond}) AS q_{c}"
          for c, g, cond in (
            ("a1", 0, "hidx <= lim.mid"), ("a2", 0, "hidx > lim.mid"),
            ("b1", 1, "hidx <= lim.mid"), ("b2", 1, "hidx > lim.mid"),
          )
        )}
      FROM b CROSS JOIN lim
    )
    SELECT n_a1, n_a2, n_b1, n_b2,
           {_did_frags(_dec_dbl_duck)[0]} AS did_cents,
           {_did_frags(_dec_dbl_duck)[1]} AS se_cents,
           ({_did_frags(_dec_dbl_duck)[0]}
             / NULLIF({_did_frags(_dec_dbl_duck)[1]}, 0.0)) AS z,
           ABS({_did_frags(_dec_dbl_duck)[0]}
             / NULLIF({_did_frags(_dec_dbl_duck)[1]}, 0.0))
             > 1.959963984540054 AS significant_95
    FROM cells
    """,
    doc="Difference-in-differences over the 2x2 period-by-arm design "
    "(periods split at the series midpoint hour): the launch-retro "
    "estimator that nets out both the arm baseline and the common "
    "time trend. All four cells' count/sum/sum-of-squares come from "
    "ONE conditional aggregate (second moments in DECIMAL(38) via "
    "the hi/lo split); the DID estimate, its large-sample SE "
    "(independent-cells variance sum) and the z verdict are a single "
    "fixed IEEE chain. Scale: one scan, one 1-row reduce; the period "
    "boundary is a 1-row scalar.",
    tags=("events", "stats", "experiment"),
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "DECIMAL(38, 0)"
    b = _t(spark, sf_dir, "events").selectExpr(
        "user_id % 2 AS grp", f"{_X_SPARK} AS hidx", f"{VAL_I} AS y"
    )
    lim = b.agg(F.expr("(MIN(hidx) + MAX(hidx)) div 2").alias("mid"))
    bb = b.crossJoin(F.broadcast(lim))
    aggs = []
    for c, g, cond in (
        ("a1", 0, "hidx <= mid"),
        ("a2", 0, "hidx > mid"),
        ("b1", 1, "hidx <= mid"),
        ("b2", 1, "hidx > mid"),
    ):
        flt = F.expr(f"grp = {g} AND {cond}")
        aggs.append(F.count_if(flt).cast("long").alias(f"n_{c}"))
        aggs.append(F.sum(F.when(flt, F.col("y"))).cast("long").alias(f"s_{c}"))
        aggs.append(F.sum(F.when(flt, F.expr("y * y").cast(dec))).alias(f"q_{c}"))
    cells = bb.agg(*aggs)
    did, se = _did_frags(_dec_dbl_spark)
    return cells.selectExpr(
        "n_a1",
        "n_a2",
        "n_b1",
        "n_b2",
        f"{did} AS did_cents",
        f"{se} AS se_cents",
        f"({did} / NULLIF({se}, 0.0)) AS z",
        f"ABS({did} / NULLIF({se}, 0.0)) > 1.959963984540054 AS significant_95",
    )


# Wilson score interval for a binomial proportion: the CI that stays
# inside [0,1] and behaves at small n / extreme rates where the Wald
# interval collapses. z = Phi^-1(0.975) as a shared double literal;
# everything else is one fixed chain on exact counts.
_WZ = "1.959963984540054"
_W_P = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
_W_DEN = f"(1.0 + {_WZ} * {_WZ} / CAST(n AS DOUBLE))"
_W_CTR = f"(({_W_P} + {_WZ} * {_WZ} / (2.0 * CAST(n AS DOUBLE))) / {_W_DEN})"
_W_HALF = (
    f"({_WZ} * sqrt({_W_P} * (1.0 - {_W_P}) / CAST(n AS DOUBLE)"
    f" + {_WZ} * {_WZ} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    f" / {_W_DEN})"
)


@q(
    "conversion_wilson_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > 95
                 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), s AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS c
      FROM per_user GROUP BY variant
    )
    SELECT variant, n, c,
           {_W_P} AS rate,
           {_W_CTR} - {_W_HALF} AS ci_lo,
           {_W_CTR} + {_W_HALF} AS ci_hi
    FROM s ORDER BY variant
    """,
    doc="Wilson score 95%% interval for each arm's conversion rate — "
    "the CI that stays inside [0,1] and doesn't collapse at small n "
    "or extreme rates the way the naive Wald interval does, i.e. the "
    "one a dashboard should actually show next to ab_test_zscore's "
    "verdict. Counts are exact from the same user-keyed conversion "
    "agg as the z-test; the interval is one fixed IEEE chain with "
    "Phi^-1(0.975) as a shared literal, so the bounds hash-match. "
    "Scale: one user-keyed agg, 2-row result.",
    tags=("events", "stats", "experiment"),
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 95), 1
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    s = per_user.groupBy("variant").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("c"),
    )
    return s.selectExpr(
        "variant",
        "n",
        "c",
        f"{_W_P} AS rate",
        f"{_W_CTR} - {_W_HALF} AS ci_lo",
        f"{_W_CTR} + {_W_HALF} AS ci_hi",
    ).orderBy("variant")


# Two-sample Kolmogorov-Smirnov: D = max_x |F1(x) - F2(x)|. Scaled by
# n1*n2 the deviation |cum1*n2 - cum2*n1| is an exact integer, so the
# max is exact and D is ONE division. The 5% verdict uses the
# asymptotic critical value c(alpha)*sqrt((n1+n2)/(n1*n2)) with
# c(0.05) = sqrt(-ln(0.025)/2) as a double literal.
_KS_C05 = "1.3581015157406195"
_KS_D = "(CAST(dmax AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))"
_KS_CRIT = (
    f"({_KS_C05} * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)))"
)


@q(
    "ks_test_2sample",
    oracle=f"""
    WITH s AS (
      SELECT user_id % 2 AS grp, {VAL_I} AS y
      FROM events WHERE event_type = 'purchase'
    ), per_y AS (
      SELECT y,
             CAST(COUNT(*) FILTER (WHERE grp = 0) AS BIGINT) AS c1,
             CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT) AS c2
      FROM s GROUP BY y
    ), cum AS (
      SELECT y,
             SUM(c1) OVER (ORDER BY y) AS f1,
             SUM(c2) OVER (ORDER BY y) AS f2
      FROM per_y
    ), agg AS (
      SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM per_y) AS n1,
             (SELECT CAST(SUM(c2) AS BIGINT) FROM per_y) AS n2,
             (SELECT CAST(MAX(ABS(f1 * (SELECT SUM(c2) FROM per_y)
                - f2 * (SELECT SUM(c1) FROM per_y))) AS BIGINT) FROM cum) AS dmax
    )
    SELECT n1, n2, dmax AS d_scaled,
           {_KS_D} AS d,
           {_KS_D} > {_KS_CRIT} AS significant_95
    FROM agg
    """,
    doc="Two-sample Kolmogorov-Smirnov test comparing the purchase-"
    "value distributions between the user_id %% 2 arms — sensitive to "
    "ANY distributional difference (shape, spread, location), where "
    "the rank-sum test only sees location. The empirical-CDF "
    "deviation scaled by n1*n2 is an exact integer, so the supremum "
    "is computed exactly and D is one IEEE division; the 5%% verdict "
    "uses the asymptotic critical value as a shared literal. Scale: "
    "the per-row work is one keyed agg on the cents value; the "
    "cumulative frame is bounded by the VALUE DOMAIN (<=56k distinct "
    "cents), the same shape as mannwhitney_u.",
    tags=("events", "stats", "hypothesis-test"),
)
def ks_test_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr("user_id % 2 AS grp", f"{VAL_I} AS y")
    )
    per_y = s.groupBy("y").agg(
        F.count_if(F.col("grp") == 0).cast("long").alias("c1"),
        F.count_if(F.col("grp") == 1).cast("long").alias("c2"),
    )
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_y.select(
        "y",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    tot = per_y.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    dmax = (
        cum.crossJoin(F.broadcast(tot))
        .agg(F.max(F.expr("ABS(f1 * n2 - f2 * n1)")).cast("long").alias("dmax"))
    )
    return dmax.crossJoin(F.broadcast(tot)).selectExpr(
        "n1",
        "n2",
        "dmax AS d_scaled",
        f"{_KS_D} AS d",
        f"{_KS_D} > {_KS_CRIT} AS significant_95",
    )


# Chi-square test of independence over the FIXED event vocabulary
# (hardcoded literals, same convention as the funnel stages): 5x2
# cells as one conditional aggregate, expected counts and the
# statistic in one shared fixed-order expression — a plain SUM over a
# 10-row cell frame would add doubles in engine-specific order.
_CHI_CELLS = [
    (f"c{i}_{j}", t, j) for i, t in enumerate(_CHI_TYPES) for j in (0, 1)
]
_CHI_ROWS = " , ".join(
    f"(c{i}_0 + c{i}_1) AS r{i}" for i in range(len(_CHI_TYPES))
)
_CHI_COLS = " , ".join(
    "(" + " + ".join(f"c{i}_{j}" for i in range(len(_CHI_TYPES))) + f") AS col{j}"
    for j in (0, 1)
)
_CHI_N = "(" + " + ".join(f"r{i}" for i in range(len(_CHI_TYPES))) + ")"


def _chi2_expr() -> str:
    terms = []
    for i in range(len(_CHI_TYPES)):
        for j in (0, 1):
            e = (
                f"(CAST(r{i} AS DOUBLE) * CAST(col{j} AS DOUBLE)"
                f" / NULLIF(CAST(nn AS DOUBLE), 0.0))"
            )
            d = f"(CAST(c{i}_{j} AS DOUBLE) - {e})"
            terms.append(f"({d} * {d} / NULLIF({e}, 0.0))")
    return "(" + " + ".join(terms) + ")"  # fixed left-to-right fold


_CHI2 = _chi2_expr()
# chi2_0.95 critical value at df = (5-1)(2-1) = 4
_CHI2_CRIT = "9.487729036781154"


@q(
    "chi2_independence",
    oracle=f"""
    WITH cells AS (
      SELECT {", ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}' AND user_id % 2 = {j}) AS BIGINT) AS {name}"
        for name, t, j in _CHI_CELLS
      )}
      FROM events
    ), tot AS (
      SELECT *, {_CHI_ROWS}, {_CHI_COLS} FROM cells
    ), s AS (
      SELECT *, {_CHI_N} AS nn FROM tot
    )
    SELECT nn AS n, {_CHI2} AS chi2,
           sqrt({_CHI2} / NULLIF(CAST(nn AS DOUBLE), 0.0)) AS cramers_v,
           {_CHI2} > {_CHI2_CRIT} AS dependent_95
    FROM s
    """,
    doc="Chi-square test of independence between event type and the "
    "user_id %% 2 experiment arm over the fixed 5x2 contingency "
    "table, with Cramer's V effect size (df=4, so V = "
    "sqrt(chi2/n)). All 10 observed cells come from ONE map-side-"
    "combining conditional aggregate; expected counts and the "
    "statistic are a single shared fixed-order expression, because a "
    "SUM over a cell frame would fold doubles in engine-specific "
    "order and never hash-match. The verdict compares against the "
    "double literal of the 0.95 chi-square quantile at df=4. Scale: "
    "one scan, one 1-row reduce — the contingency table is "
    "vocabulary-sized, independent of n.",
    tags=("events", "stats", "hypothesis-test"),
)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _t(spark, sf_dir, "events").agg(
        *[
            F.count_if(
                (F.col("event_type") == t) & (F.col("user_id") % 2 == j)
            ).cast("long").alias(name)
            for name, t, j in _CHI_CELLS
        ]
    )
    s = cells.selectExpr("*", *_CHI_ROWS.split(" , ")).selectExpr(
        "*", *_CHI_COLS.split(" , ")
    ).selectExpr("*", f"{_CHI_N} AS nn")
    return s.selectExpr(
        "nn AS n",
        f"{_CHI2} AS chi2",
        f"sqrt({_CHI2} / NULLIF(CAST(nn AS DOUBLE), 0.0)) AS cramers_v",
        f"{_CHI2} > {_CHI2_CRIT} AS dependent_95",
    )


# Theil-Sen slope from exact rationals: hourly means are (sum, count)
# integer pairs, so the pairwise slope (m2 - m1)/(x2 - x1) =
# (s2*c1 - s1*c2) / (c1*c2*(x2 - x1)) is ONE division of exact int64
# operands; the median picks an actual value (percentile_disc), so
# the estimate is reproducible bit-for-bit.
_TS_SLOPE = (
    "(CAST(s2 * c1 - s1 * c2 AS DOUBLE)"
    " / CAST(c1 * c2 * (x2 - x1) AS DOUBLE))"
)


@q(
    "theilsen_trend",
    oracle=f"""
    WITH b AS (
      SELECT event_type, {_X_DUCK} AS x, {VAL_I} AS y FROM events
    ), hr AS (
      SELECT event_type, x,
             CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             a.s AS s1, a.c AS c1, a.x AS x1,
             b2.s AS s2, b2.c AS c2, b2.x AS x2
      FROM hr a JOIN hr b2
        ON a.event_type = b2.event_type AND a.x < b2.x
    ), sl AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             quantile_disc({_TS_SLOPE}, 0.5) AS med_slope
      FROM pairs GROUP BY event_type
    )
    SELECT sl.event_type, sl.n_pairs, sl.med_slope AS slope_cents_per_hour,
           quantile_disc(
             CAST(hr.s AS DOUBLE) / CAST(hr.c AS DOUBLE)
               - sl.med_slope * CAST(hr.x AS DOUBLE), 0.5
           ) AS intercept_cents
    FROM hr JOIN sl ON hr.event_type = sl.event_type
    GROUP BY sl.event_type, sl.n_pairs, sl.med_slope
    ORDER BY sl.event_type
    """,
    doc="Theil-Sen robust trend per event_type: median of the "
    "pairwise slopes between hourly means, plus the classic median-"
    "residual intercept. The estimator is famously resistant to the "
    "outliers OLS chases (compare against linreg_by_group on the "
    "same series). Hourly means stay exact (sum, count) integer "
    "pairs so each pairwise slope is one IEEE division of exact "
    "int64 operands; medians use PERCENTILE_DISC (an actual value, "
    "not an interpolation). Scale: the pair blow-up is bounded by "
    "the TIME DOMAIN squared (<=720^2/2 pairs per key), never by the "
    "row count — the per-row work is one keyed hourly agg; the "
    "5-row slope frame broadcasts back for the intercept pass.",
    tags=("events", "stats", "regression"),
)
def theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _t(spark, sf_dir, "events").selectExpr(
        "event_type", f"{_X_SPARK} AS x", f"{VAL_I} AS y"
    )
    hr = b.groupBy("event_type", "x").agg(
        F.sum("y").alias("s"), F.count("*").cast("long").alias("c")
    )
    a = hr.alias("a")
    b2 = hr.alias("b2")
    pairs = a.join(
        b2,
        (F.col("a.event_type") == F.col("b2.event_type"))
        & (F.col("a.x") < F.col("b2.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.s").alias("s1"),
        F.col("a.c").alias("c1"),
        F.col("a.x").alias("x1"),
        F.col("b2.s").alias("s2"),
        F.col("b2.c").alias("c2"),
        F.col("b2.x").alias("x2"),
    )
    sl = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr(
            f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {_TS_SLOPE})"
        ).alias("med_slope"),
    )
    return (
        hr.join(F.broadcast(sl), "event_type")
        .groupBy("event_type", "n_pairs", "med_slope")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY "
                "CAST(s AS DOUBLE) / CAST(c AS DOUBLE)"
                " - med_slope * CAST(x AS DOUBLE))"
            ).alias("intercept_cents")
        )
        .selectExpr(
            "event_type",
            "n_pairs",
            "med_slope AS slope_cents_per_hour",
            "intercept_cents",
        )
        .orderBy("event_type")
    )


# Pearson r from exact integer moments (shared by the ACF queries):
# n*Sxy - Sx*Sy over the sqrt product, moments entering double via dd.
def _acf_frag(dd) -> str:
    n_d, sx_d, sy_d = "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    num = f"({n_d} * {dd('sxy')} - {sx_d} * {sy_d})"
    denx = f"({n_d} * {dd('sxx')} - {sx_d} * {sx_d})"
    deny = f"({n_d} * {dd('syy')} - {sy_d} * {sy_d})"
    return f"({num} / NULLIF(sqrt({denx}) * sqrt({deny}), 0.0))"


# Ljung-Box portmanteau test: Q = n(n+2) * sum_k r_k^2/(n-k) over the
# first 8 lags of the densified hourly-volume ACF. The per-lag r_k
# come from exact integer moments (the acf_volume machinery); the
# 8-term combination is one fixed-order expression over lag columns
# pivoted into a single row — never an engine-ordered SUM.
_LB_LAGS = tuple(range(1, 9))
# chi2_0.95 critical value at df = 8 (no fitted parameters)
_LB_CRIT = "15.50731305586545"


def _lb_q_expr() -> str:
    terms = " + ".join(
        f"(r{k} * r{k} / (CAST(nser AS DOUBLE) - {float(k)!r}))" for k in _LB_LAGS
    )
    return (
        f"(CAST(nser AS DOUBLE) * (CAST(nser AS DOUBLE) + 2.0) * ({terms}))"
    )


def _lb_acf_branch_duck(lag: int) -> str:
    return (
        f"SELECT event_type, {lag} AS lag, v AS x, "
        f"LAG(v, {lag}) OVER (PARTITION BY event_type ORDER BY h) AS y "
        f"FROM dense"
    )


@q(
    "ljung_box_white_noise",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
    grid AS (
      SELECT t.event_type, gs.h
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN b, unnest(generate_series(b.lo, b.hi, INTERVAL '1 hour')) AS gs(h)
    ), dense AS (
      SELECT grid.event_type, grid.h, COALESCE(ev.v, 0) AS v
      FROM grid LEFT JOIN ev
        ON grid.event_type = ev.event_type AND grid.h = ev.h
    ), lagged AS (
      {" UNION ALL ".join(_lb_acf_branch_duck(k) for k in _LB_LAGS)}
    ), s AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x * x AS DECIMAL(38, 0))) AS sxx,
             SUM(CAST(x * y AS DECIMAL(38, 0))) AS sxy,
             SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy
      FROM lagged WHERE y IS NOT NULL GROUP BY 1, 2
    ), acf AS (
      SELECT event_type, lag, {_acf_frag(_dec_dbl_duck)} AS r
      FROM s
    ), piv AS (
      SELECT event_type,
             {", ".join(f"MAX(CASE WHEN lag = {k} THEN r END) AS r{k}" for k in _LB_LAGS)}
      FROM acf GROUP BY event_type
    ), nser_t AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nser
      FROM dense GROUP BY event_type
    )
    SELECT piv.event_type, nser_t.nser AS n_hours,
           {_lb_q_expr()} AS q_stat,
           {_lb_q_expr()} > {_LB_CRIT} AS reject_white_noise_95
    FROM piv JOIN nser_t ON piv.event_type = nser_t.event_type
    ORDER BY piv.event_type
    """,
    doc="Ljung-Box portmanteau test on the densified hourly volume "
    "series per event_type: Q = n(n+2) * sum r_k^2/(n-k) over lags "
    "1..8 against the chi-square(8) 5%% critical value — the standard "
    "'is this series white noise, or is there autocorrelation worth "
    "modeling' gate run before fitting any forecast. Each r_k comes "
    "from exact integer moments over the time-domain-bounded dense "
    "grid (the acf_volume machinery); the 8-term combination and the "
    "verdict are one fixed-order expression over lag columns pivoted "
    "into a single row. Scale: one keyed hourly count; the 8 lag "
    "branches and all moments run on the 720-hour-per-key grid.",
    tags=("events", "stats", "timeseries", "hypothesis-test"),
)
def ljung_box_white_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").cast("long").alias("v"))
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
    dense = grid.join(ev, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    branches = [
        dense.select(
            "event_type",
            F.lit(k).cast("int").alias("lag"),
            F.col("v").alias("x"),
            F.lag("v", k).over(w).alias("y"),
        )
        for k in _LB_LAGS
    ]
    lagged = branches[0]
    for b2 in branches[1:]:
        lagged = lagged.unionAll(b2)
    dec = "DECIMAL(38, 0)"
    s = (
        lagged.where(F.col("y").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * x").cast(dec)).alias("sxx"),
            F.sum(F.expr("x * y").cast(dec)).alias("sxy"),
            F.sum(F.expr("y * y").cast(dec)).alias("syy"),
        )
    )
    acf = s.selectExpr("event_type", "lag", f"{_acf_frag(_dec_dbl_spark)} AS r")
    piv = acf.groupBy("event_type").agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("r"))).alias(f"r{k}")
            for k in _LB_LAGS
        ]
    )
    nser_t = dense.groupBy("event_type").agg(F.count("*").cast("long").alias("nser"))
    return (
        piv.join(F.broadcast(nser_t), "event_type")
        .selectExpr(
            "event_type",
            "nser AS n_hours",
            f"{_lb_q_expr()} AS q_stat",
            f"{_lb_q_expr()} > {_LB_CRIT} AS reject_white_noise_95",
        )
        .orderBy("event_type")
    )


# CUSUM drift detection without recursion: the one-sided CUSUM
# S_t = max(0, S_{t-1} + x_t - k) equals C_t - min_{s<=t} C_s for the
# prefix sums C of (x - k) — a cumulative sum plus a running min, both
# plain window functions. Scaling by N (hours) makes the reference
# k = mean exact: C'_t = cumsum(N*x - T) with T = total volume, and
# the alarm threshold H = 4*mean becomes the integer 4*T.
@q(
    "cusum_drift",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, {_X_DUCK} AS hidx, CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(SUM(v) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY event_type
    ), c AS (
      SELECT ev.event_type, ev.hidx, tot.t, tot.n,
             SUM(tot.n * ev.v - tot.t) OVER (
               PARTITION BY ev.event_type ORDER BY ev.hidx) AS cs
      FROM ev JOIN tot ON ev.event_type = tot.event_type
    ), s AS (
      SELECT event_type, hidx, t,
             cs - LEAST(MIN(cs) OVER (
               PARTITION BY event_type ORDER BY hidx), 0) AS cusum
      FROM c
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN cusum > 4 * t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_hours,
           CAST(MIN(CASE WHEN cusum > 4 * t THEN hidx END) AS BIGINT)
             AS first_alarm_hour,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum_scaled,
           CAST(MAX(cusum) AS DOUBLE) / CAST(4 * ANY_VALUE(t) AS DOUBLE)
             AS peak_over_threshold
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="One-sided CUSUM drift detector over the hourly volume per "
    "event_type — the sequential shift test monitoring pipelines run "
    "(Page 1954). The textbook recursion max(0, S+x-k) is not "
    "SQL-expressible, but it equals prefix-sum minus running-min, "
    "two keyed window functions; scaling by the hour count makes "
    "the k = mean reference EXACT integers (N*v - T), and the alarm "
    "threshold H = 4*mean is the integer 4*T — so alarm hours and "
    "the peak statistic hash-match. Scale: one keyed hourly agg; "
    "windows run on the 720-hour-per-key frame. The observed-hours "
    "series (not densified) is the monitored signal by choice: a "
    "missing hour carries no evidence of drift.",
    tags=("events", "stats", "timeseries", "monitoring"),
)
def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .selectExpr("event_type", f"{_X_SPARK} AS hidx")
        .groupBy("event_type", "hidx")
        .agg(F.count("*").cast("long").alias("v"))
    )
    tot = ev.groupBy("event_type").agg(
        F.sum("v").cast("long").alias("t"), F.count("*").cast("long").alias("n")
    )
    wc = Window.partitionBy("event_type").orderBy("hidx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = ev.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hidx",
        "t",
        F.sum(F.expr("n * v - t")).over(wc).alias("cs"),
    )
    # LEAST(min, 0): the running min must include the virtual empty
    # prefix C_0 = 0, or a drift starting at the first hour is absorbed
    s = c.select(
        "event_type",
        "hidx",
        "t",
        (F.col("cs") - F.least(F.min("cs").over(wc), F.lit(0))).alias("cusum"),
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.sum(F.expr("CASE WHEN cusum > 4 * t THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_alarm_hours"),
            F.min(F.when(F.expr("cusum > 4 * t"), F.col("hidx")))
            .cast("long")
            .alias("first_alarm_hour"),
            F.max("cusum").cast("long").alias("max_cusum_scaled"),
            F.expr("CAST(MAX(cusum) AS DOUBLE) / CAST(4 * ANY_VALUE(t) AS DOUBLE)")
            .alias("peak_over_threshold"),
        )
        .orderBy("event_type")
    )


# STL-style seasonal strength with EXACT variance arithmetic: detrend
# by a centered 24-term moving sum (D = 24*v - s24, integer), trim to
# whole days so every hour-of-day has the same count m, remove the
# per-hour-of-day means in the common scale 24m (R' = m*D - sumD_k,
# integer), and compare centered sums of squares from exact moments.
_SEAS_RATIO = (
    "((CAST(nh AS DOUBLE) * {rp2} - CAST(srp AS DOUBLE) * CAST(srp AS DOUBLE))"
    " / NULLIF(CAST(nh AS DOUBLE) * {dm2}"
    " - CAST(sdm AS DOUBLE) * CAST(sdm AS DOUBLE), 0.0))"
)


@q(
    "seasonal_strength_hourly",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, {_X_DUCK} AS hidx, CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT CAST(MIN(hidx) AS BIGINT) AS lo, CAST(MAX(hidx) AS BIGINT) AS hi
      FROM ev
    ), lim AS (
      SELECT lo, hi,
             ((lo + 11 + 23) // 24) AS d_lo,
             ((hi - 12 + 1) // 24) - 1 AS d_hi
      FROM b
    ), grid AS (
      SELECT t.event_type, gs.h AS hidx
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN lim, unnest(generate_series(lim.lo, lim.hi)) AS gs(h)
    ), dense AS (
      SELECT grid.event_type, grid.hidx, COALESCE(ev.v, 0) AS v
      FROM grid LEFT JOIN ev
        ON ev.event_type = grid.event_type AND ev.hidx = grid.hidx
    ), ma AS (
      SELECT event_type, hidx, v,
             SUM(v) OVER (PARTITION BY event_type ORDER BY hidx
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS s24,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY hidx
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS c24
      FROM dense
    ), detr AS (
      SELECT ma.event_type, ma.hidx % 24 AS k,
             24 * ma.v - CAST(ma.s24 AS BIGINT) AS d,
             lim.d_hi - lim.d_lo + 1 AS m
      FROM ma CROSS JOIN lim
      WHERE ma.c24 = 24
        AND ma.hidx >= lim.d_lo * 24 AND ma.hidx <= lim.d_hi * 24 + 23
    ), sk AS (
      SELECT event_type, k, CAST(SUM(d) AS BIGINT) AS sumd
      FROM detr GROUP BY event_type, k
    ), r AS (
      SELECT detr.event_type, detr.m,
             detr.m * detr.d - sk.sumd AS rp,
             detr.m * detr.d AS dm
      FROM detr JOIN sk
        ON detr.event_type = sk.event_type AND detr.k = sk.k
    ), mom AS (
      SELECT event_type, ANY_VALUE(m) AS m,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(rp) AS BIGINT) AS srp,
             CAST(SUM(dm) AS BIGINT) AS sdm,
             SUM(CAST(rp * rp AS DECIMAL(38, 0))) AS rp2,
             SUM(CAST(dm * dm AS DECIMAL(38, 0))) AS dm2
      FROM r GROUP BY event_type
    ), pk AS (
      SELECT event_type, MAX(sumd) AS maxd FROM sk GROUP BY event_type
    ), pkk AS (
      SELECT sk.event_type, pk.maxd, MIN(sk.k) AS peak_hour
      FROM sk JOIN pk ON sk.event_type = pk.event_type AND sk.sumd = pk.maxd
      GROUP BY sk.event_type, pk.maxd
    )
    SELECT mom.event_type, mom.m AS n_days, mom.nh AS n_hours,
           1.0 - {_SEAS_RATIO.format(rp2=_dec_dbl_duck("rp2"), dm2=_dec_dbl_duck("dm2"))}
             AS seasonal_strength,
           pkk.peak_hour,
           CAST(pkk.maxd AS DOUBLE) / CAST(24 * mom.m AS DOUBLE)
             AS peak_seasonal_volume
    FROM mom JOIN pkk ON mom.event_type = pkk.event_type
    ORDER BY mom.event_type
    """,
    doc="STL-style seasonal-strength decomposition of the hourly "
    "volume per event_type: detrend with a centered 24-term moving "
    "sum, remove the hour-of-day means, and report "
    "1 - SS(remainder)/SS(detrended) (the Hyndman seasonal-strength "
    "statistic) plus the peak hour and its seasonal amplitude. The "
    "whole decomposition stays in EXACT integers: D = 24*v - s24 "
    "avoids the MA division, whole-day trimming makes every "
    "hour-of-day count equal so the per-k mean removal is the common "
    "scale factor m (R' = m*D - sum_k D), and both sums of squares "
    "come from DECIMAL(38) moments through the hi/lo split — the "
    "variance RATIO is the only floating-point step. Peak-hour ties "
    "break to the smallest hour deterministically. Scale: keyed "
    "hourly agg is the only data-sized pass; everything after runs "
    "on the 720-hour grid per key.",
    tags=("events", "stats", "timeseries"),
)
def seasonal_strength_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .selectExpr("event_type", f"{_X_SPARK} AS hidx")
        .groupBy("event_type", "hidx")
        .agg(F.count("*").cast("long").alias("v"))
    )
    lim = ev.agg(
        F.min("hidx").cast("long").alias("lo"), F.max("hidx").cast("long").alias("hi")
    ).selectExpr(
        "lo",
        "hi",
        "(lo + 11 + 23) div 24 AS d_lo",
        "((hi - 12 + 1) div 24) - 1 AS d_hi",
    )
    dense = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(lim))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi)")).alias("hidx"),
            "d_lo",
            "d_hi",
        )
        .join(ev, ["event_type", "hidx"], "left")
        .select(
            "event_type",
            "hidx",
            "d_lo",
            "d_hi",
            F.coalesce("v", F.lit(0)).cast("long").alias("v"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(-11, 12)
    )
    ma = dense.select(
        "event_type",
        "hidx",
        "v",
        "d_lo",
        "d_hi",
        F.sum("v").over(w).alias("s24"),
        F.count("*").over(w).alias("c24"),
    )
    detr = ma.where(
        (F.col("c24") == 24)
        & (F.col("hidx") >= F.col("d_lo") * 24)
        & (F.col("hidx") <= F.col("d_hi") * 24 + 23)
    ).selectExpr(
        "event_type",
        "hidx % 24 AS k",
        "24 * v - CAST(s24 AS BIGINT) AS d",
        "d_hi - d_lo + 1 AS m",
    )
    sk = detr.groupBy("event_type", "k").agg(F.sum("d").cast("long").alias("sumd"))
    r = detr.join(F.broadcast(sk), ["event_type", "k"]).selectExpr(
        "event_type", "m", "m * d - sumd AS rp", "m * d AS dm"
    )
    dec = "DECIMAL(38, 0)"
    mom = r.groupBy("event_type").agg(
        F.expr("any_value(m)").alias("m"),
        F.count("*").cast("long").alias("nh"),
        F.sum("rp").cast("long").alias("srp"),
        F.sum("dm").cast("long").alias("sdm"),
        F.sum(F.expr("rp * rp").cast(dec)).alias("rp2"),
        F.sum(F.expr("dm * dm").cast(dec)).alias("dm2"),
    )
    pk = sk.groupBy("event_type").agg(F.max("sumd").alias("maxd"))
    pkk = (
        sk.join(F.broadcast(pk), "event_type")
        .where(F.col("sumd") == F.col("maxd"))
        .groupBy("event_type", "maxd")
        .agg(F.min("k").alias("peak_hour"))
    )
    ratio = _SEAS_RATIO.format(
        rp2=_dec_dbl_spark("rp2"), dm2=_dec_dbl_spark("dm2")
    )
    return (
        mom.join(F.broadcast(pkk), "event_type")
        .selectExpr(
            "event_type",
            "m AS n_days",
            "nh AS n_hours",
            f"1.0 - {ratio} AS seasonal_strength",
            "peak_hour",
            "CAST(maxd AS DOUBLE) / CAST(24 * m AS DOUBLE) AS peak_seasonal_volume",
        )
        .orderBy("event_type")
    )


# Spearman rank correlation without per-row rank windows: the doubled
# average rank of a value is a function of the DISTINCT-value frame
# (2*below + c + 1, as in mannwhitney_u), so each row picks up its
# ranks through two broadcast joins against domain-bounded rank maps,
# and rho is Pearson on exact integer doubled ranks.
_SPEAR = (
    "(CAST(n AS DOUBLE) * {sxy} - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / NULLIF(sqrt(CAST(n AS DOUBLE) * {sxx}"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * sqrt(CAST(n AS DOUBLE) * {syy}"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0)"
)


@q(
    "spearman_corr",
    oracle=f"""
    WITH b AS (
      SELECT event_type, {_X_DUCK} AS x, {VAL_I} AS y FROM events
    ), rx AS (
      SELECT event_type, x,
             2 * COALESCE(SUM(CAST(COUNT(*) AS BIGINT)) OVER (
                    PARTITION BY event_type ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0
                  ) + CAST(COUNT(*) AS BIGINT) + 1 AS r2x
      FROM b GROUP BY event_type, x
    ), ry AS (
      SELECT event_type, y,
             2 * COALESCE(SUM(CAST(COUNT(*) AS BIGINT)) OVER (
                    PARTITION BY event_type ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0
                  ) + CAST(COUNT(*) AS BIGINT) + 1 AS r2y
      FROM b GROUP BY event_type, y
    ), r AS (
      SELECT b.event_type, rx.r2x AS r2x, ry.r2y AS r2y
      FROM b
      JOIN rx ON b.event_type = rx.event_type AND b.x = rx.x
      JOIN ry ON b.event_type = ry.event_type AND b.y = ry.y
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2x) AS BIGINT) AS sx,
             CAST(SUM(r2y) AS BIGINT) AS sy,
             SUM(CAST(r2x * r2x AS DECIMAL(38, 0))) AS sxx,
             SUM(CAST(r2x * r2y AS DECIMAL(38, 0))) AS sxy,
             SUM(CAST(r2y * r2y AS DECIMAL(38, 0))) AS syy
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           {_SPEAR.format(sxy=_dec_dbl_duck("sxy"), sxx=_dec_dbl_duck("sxx"), syy=_dec_dbl_duck("syy"))} AS rho
    FROM s ORDER BY event_type
    """,
    doc="Spearman rank correlation between the hour index and the "
    "cents amount per event_type — the monotonic-association measure "
    "that survives the heavy-tailed values Pearson chokes on. No "
    "per-row rank window: doubled average ranks (exact ints, ties "
    "handled) are computed on the DISTINCT-value frames (bounded by "
    "the 720-hour / 56k-cents domains) and joined back to the rows, "
    "then rho is Pearson on exact integer doubled ranks (the 2x "
    "factor cancels), with second moments in DECIMAL(38) through the "
    "hi/lo split. Scale: two keyed aggs + two joins against "
    "domain-bounded rank maps; the ordered frames never see n rows.",
    tags=("events", "stats", "regression"),
)
def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _t(spark, sf_dir, "events").selectExpr(
        "event_type", f"{_X_SPARK} AS x", f"{VAL_I} AS y"
    )

    def rank_map(col: str, out: str) -> DataFrame:
        per = b.groupBy("event_type", col).agg(F.count("*").cast("long").alias("c"))
        w = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return per.select(
            "event_type",
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(out),
        )

    r = b.join(rank_map("x", "r2x"), ["event_type", "x"]).join(
        rank_map("y", "r2y"), ["event_type", "y"]
    )
    dec = "DECIMAL(38, 0)"
    s = r.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2x").alias("sx"),
        F.sum("r2y").alias("sy"),
        F.sum(F.expr("r2x * r2x").cast(dec)).alias("sxx"),
        F.sum(F.expr("r2x * r2y").cast(dec)).alias("sxy"),
        F.sum(F.expr("r2y * r2y").cast(dec)).alias("syy"),
    )
    rho = _SPEAR.format(
        sxy=_dec_dbl_spark("sxy"), sxx=_dec_dbl_spark("sxx"), syy=_dec_dbl_spark("syy")
    )
    return s.selectExpr("event_type", "n", f"{rho} AS rho").orderBy("event_type")


# Gini over GROUPED load counts: with k_v = number of keys carrying
# exactly v events, G = sum_{v,w} k_v k_w |v - w| / (2 N T) — every
# term exact int64, so the coefficient is ONE division at the end.
_GINI = "(CAST(s_abs AS DOUBLE) / NULLIF(CAST(2 * nk * te AS DOUBLE), 0.0))"


@q(
    "key_skew_gini",
    oracle=f"""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
    ), coc AS (
      SELECT c AS v, CAST(COUNT(*) AS BIGINT) AS k FROM per_key GROUP BY c
    ), pair AS (
      SELECT CAST(SUM(a.k * b.k * ABS(a.v - b.v)) AS BIGINT) AS s_abs
      FROM coc a CROSS JOIN coc b
    ), tot AS (
      SELECT CAST(SUM(k) AS BIGINT) AS nk,
             CAST(SUM(k * v) AS BIGINT) AS te,
             CAST(MAX(v) AS BIGINT) AS max_c,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_loads
      FROM coc
    )
    SELECT nk AS n_keys, te AS n_events, max_c AS max_key_load,
           n_distinct_loads,
           CAST(max_c AS DOUBLE) / CAST(te AS DOUBLE) AS top_key_share,
           {_GINI} AS gini
    FROM pair CROSS JOIN tot
    """,
    doc="Skew diagnostics for the partition key every event pipeline "
    "shuffles on: the Gini coefficient of the per-user load "
    "distribution, plus the single heaviest key's share. This is the "
    "number that says whether a keyed exchange needs salting BEFORE "
    "the job straggles. Computed from the count-of-counts frame: the "
    "per-key counts reduce in one keyed agg, the load DISTRIBUTION "
    "(load value -> #keys) is bounded by the distinct-load domain "
    "(hundreds of rows at any n), and the grouped-data Gini "
    "sum_vw k_v k_w |v-w| / (2*N*T) is an exact-int64 pairwise sum "
    "over that tiny frame — one IEEE division at the end, so the "
    "whole diagnostic hash-matches. Scale: one keyed exchange on "
    "user_id, one on the load value; the cross join is "
    "domain-bounded-squared (~10^4 rows), never n.",
    tags=("events", "stats", "skew"),
)
def key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    coc = per_key.groupBy(F.col("c").alias("v")).agg(
        F.count("*").cast("long").alias("k")
    )
    pair = (
        coc.alias("a")
        .crossJoin(F.broadcast(coc.alias("b")))
        .agg(
            F.sum(F.expr("a.k * b.k * ABS(a.v - b.v)")).cast("long").alias("s_abs")
        )
    )
    tot = coc.agg(
        F.sum("k").cast("long").alias("nk"),
        F.sum(F.expr("k * v")).cast("long").alias("te"),
        F.max("v").cast("long").alias("max_c"),
        F.count("*").cast("long").alias("n_distinct_loads"),
    )
    return pair.crossJoin(tot).selectExpr(
        "nk AS n_keys",
        "te AS n_events",
        "max_c AS max_key_load",
        "n_distinct_loads",
        "CAST(max_c AS DOUBLE) / CAST(te AS DOUBLE) AS top_key_share",
        f"{_GINI} AS gini",
    )


# Poisson bootstrap (Chamandy et al.'s streaming bootstrap): replicate
# b reweights row i by a Poisson(1) draw derived from md5(id:b), so
# the "resample" is a pure column expression — no RNG state, no
# per-replicate shuffle of the data, append-stable. The inverse CDF
# uses 2^60-scaled integer thresholds so both engines compare the
# same integers.
_BOOT_B = 32


def _poisson_thresholds() -> list[int]:
    cum, thresholds, p = 0.0, [], math.exp(-1.0)
    for k in range(6):
        cum += p
        thresholds.append(int(cum * (1 << 60)))
        p /= k + 1
    return thresholds


_BOOT_T = _poisson_thresholds()


def _boot_weight(u: str) -> str:
    """Poisson(1) inverse CDF over a 60-bit uniform hash (exact
    integer thresholds; tail collapsed at 6)."""
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
    )
    return f"(CASE {cases} ELSE 6 END)"


@q(
    "bootstrap_ci_mean",
    oracle=f"""
    WITH s AS (
      SELECT event_id, {VAL_I} AS y FROM events WHERE event_type = 'purchase'
    ), rep AS (
      SELECT b,
             CAST(SUM(w * y) AS BIGINT) AS wy,
             CAST(SUM(w) AS BIGINT) AS wn
      FROM (
        SELECT gs.b,
               {_boot_weight(_h60_duck("event_id || ':' || gs.b"))} AS w,
               y
        FROM s, unnest(generate_series(1, {_BOOT_B})) AS gs(b)
      ) GROUP BY b
    ), means AS (
      SELECT CAST(wy AS DOUBLE) / NULLIF(CAST(wn AS DOUBLE), 0.0) AS m FROM rep
    ), point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM s
    )
    SELECT point.n,
           CAST(point.sy AS DOUBLE) / NULLIF(CAST(point.n AS DOUBLE), 0.0)
             AS mean_cents,
           (SELECT quantile_disc(m, 0.025) FROM means) AS ci_lo_cents,
           (SELECT quantile_disc(m, 0.975) FROM means) AS ci_hi_cents,
           {_BOOT_B} AS n_replicates
    FROM point
    """,
    doc="Bootstrap confidence interval for the mean purchase value via "
    "the POISSON bootstrap (the streaming formulation built for "
    "map-reduce: replicate b reweights each row by a Poisson(1) draw "
    "instead of resampling n rows with replacement, which would need "
    "global coordination). The draw is md5(id:b) through an exact "
    "2^60-integer inverse-CDF table, so replicates are deterministic, "
    "append-stable and hash-identical cross-engine; replicate sums "
    "stay int64 and each mean is one IEEE division. CI bounds are "
    "PERCENTILE_DISC over the B=32 replicate means (2.5%/97.5% at "
    "1/32 granularity — the documented precision/compute trade). "
    "Scale: one scan exploded x32 map-side, partial-aggregated into "
    "a 32-group reduce — no extra exchange of the data, the bootstrap "
    "price is pure compute.",
    tags=("events", "stats", "bootstrap"),
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr("event_id", f"{VAL_I} AS y")
    )
    rep = (
        s.select(
            F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("b"),
            "event_id",
            "y",
        )
        .selectExpr(
            "b",
            _boot_weight(_h60_spark("CONCAT(event_id, ':', b)")) + " AS w",
            "y",
        )
        .groupBy("b")
        .agg(
            F.sum(F.expr("w * y")).cast("long").alias("wy"),
            F.sum("w").cast("long").alias("wn"),
        )
    )
    means = rep.selectExpr(
        "CAST(wy AS DOUBLE) / NULLIF(CAST(wn AS DOUBLE), 0.0) AS m"
    )
    ci = means.agg(
        F.expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY m)").alias(
            "ci_lo_cents"
        ),
        F.expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY m)").alias(
            "ci_hi_cents"
        ),
    )
    point = s.agg(
        F.count("*").cast("long").alias("n"), F.sum("y").cast("long").alias("sy")
    )
    return point.crossJoin(F.broadcast(ci)).selectExpr(
        "n",
        "CAST(sy AS DOUBLE) / NULLIF(CAST(n AS DOUBLE), 0.0) AS mean_cents",
        "ci_lo_cents",
        "ci_hi_cents",
        f"CAST({_BOOT_B} AS BIGINT) AS n_replicates",
    )


# Benford's-law conformity of the leading digit of the cents amounts —
# the classic corruption/fabrication screen for numeric columns. The
# expected probabilities log10(1 + 1/d) are double literals computed
# once in Python (identical text in both engines); the 9 observed
# cells come from one conditional aggregate and the chi-square / MAD
# statistics are fixed-order expressions.
_BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]
_BENFORD_CELLS = " , ".join(
    f"CAST(COUNT(*) FILTER (WHERE d = {d}) AS BIGINT) AS o{d}" for d in range(1, 10)
)
# chi2_0.95 critical value at df = 8
_BENFORD_CRIT = "15.50731305586545"


def _benford_chi2() -> str:
    terms = []
    for d in range(1, 10):
        e = f"(CAST(n AS DOUBLE) * {_BENFORD_P[d - 1]!r})"
        diff = f"(CAST(o{d} AS DOUBLE) - {e})"
        terms.append(f"({diff} * {diff} / NULLIF({e}, 0.0))")
    return "(" + " + ".join(terms) + ")"


def _benford_mad() -> str:
    terms = [
        f"ABS(CAST(o{d} AS DOUBLE) / NULLIF(CAST(n AS DOUBLE), 0.0)"
        f" - {_BENFORD_P[d - 1]!r})"
        for d in range(1, 10)
    ]
    return "((" + " + ".join(terms) + ") / 9.0)"


@q(
    "benford_deviation",
    oracle=f"""
    WITH s AS (
      SELECT CAST(SUBSTRING(CAST({VAL_I} AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM events WHERE {VAL_I} > 0
    ), cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, {_BENFORD_CELLS} FROM s
    )
    SELECT n, {_benford_chi2()} AS chi2,
           {_benford_mad()} AS mad,
           {_benford_chi2()} > {_BENFORD_CRIT} AS nonconforming_95
    FROM cells
    """,
    doc="Benford's-law screen on the leading digit of the cents "
    "amounts: chi-square against log10(1+1/d) plus the MAD "
    "conformity measure auditors actually threshold on — the "
    "standard fabricated-or-corrupted-numbers detector for a numeric "
    "column at ingest. Leading digit via the decimal string (no "
    "leading zeros, identical cross-engine); 9 cells from ONE "
    "conditional aggregate; both statistics are fixed-order "
    "expressions over exact counts with the expected probabilities "
    "as shared double literals. Scale: one scan, one 1-row reduce. "
    "(The fixture's hash-uniform values are deliberately "
    "NON-Benford — uniform distributions fail the screen, which is "
    "exactly what it exists to flag.)",
    tags=("events", "stats", "quality"),
)
def benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "events")
        .where(F.expr(f"{VAL_I} > 0"))
        .selectExpr(f"CAST(SUBSTRING(CAST({VAL_I} AS STRING), 1, 1) AS BIGINT) AS d")
    )
    cells = s.agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.count_if(F.col("d") == d).cast("long").alias(f"o{d}")
            for d in range(1, 10)
        ],
    )
    return cells.selectExpr(
        "n",
        f"{_benford_chi2()} AS chi2",
        f"{_benford_mad()} AS mad",
        f"{_benford_chi2()} > {_BENFORD_CRIT} AS nonconforming_95",
    )


# Pearson ACF over the DENSE hourly volume series (missing hours count
# as zero — an ACF over observed-only rows silently shifts the lag
# structure). Counts are exact ints; second moments ride DECIMAL(38)
# with the hi/lo-split conversion; r = num / (sqrt(denx)*sqrt(deny)).
_ACF_LAGS = (1, 24)


@q(
    "acf_volume",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
    grid AS (
      SELECT t.event_type, gs.h
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN b, unnest(generate_series(b.lo, b.hi, INTERVAL '1 hour')) AS gs(h)
    ), dense AS (
      SELECT grid.event_type, grid.h, COALESCE(ev.v, 0) AS v
      FROM grid LEFT JOIN ev
        ON grid.event_type = ev.event_type AND grid.h = ev.h
    ), lagged AS (
      {" UNION ALL ".join(
        f'''SELECT event_type, {lag} AS lag, v AS x,
               LAG(v, {lag}) OVER (PARTITION BY event_type ORDER BY h) AS y
            FROM dense'''
        for lag in _ACF_LAGS
      )}
    ), s AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x * x AS DECIMAL(38, 0))) AS sxx,
             SUM(CAST(x * y AS DECIMAL(38, 0))) AS sxy,
             SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy
      FROM lagged WHERE y IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, lag, n, {_acf_frag(_dec_dbl_duck)} AS acf
    FROM s ORDER BY event_type, lag
    """,
    doc="Autocorrelation of the hourly event volume at lags 1 and 24 "
    "— the seasonality diagnostic (a daily cycle shows up as high "
    "lag-24 ACF) that decides whether seasonal_naive_forecast is the "
    "right model. The series is DENSIFIED first (missing hours are "
    "true zeros; an observed-rows-only ACF silently shifts the lag "
    "structure). Volume counts are exact ints, the lagged pairing is "
    "a keyed window over the time-domain-bounded grid (720 rows/key), "
    "and Pearson r comes from exact moments through the shared "
    "fixed chain — so even the correlation values hash-match. Scale: "
    "the data-sized work is one keyed hourly count; everything after "
    "runs on the bounded grid.",
    tags=("events", "stats", "timeseries"),
)
def acf_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").cast("long").alias("v"))
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
    dense = grid.join(ev, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    branches = [
        dense.select(
            "event_type",
            F.lit(lag).cast("int").alias("lag"),
            F.col("v").alias("x"),
            F.lag("v", lag).over(w).alias("y"),
        )
        for lag in _ACF_LAGS
    ]
    lagged = branches[0]
    for b2 in branches[1:]:
        lagged = lagged.unionAll(b2)
    dec = "DECIMAL(38, 0)"
    s = (
        lagged.where(F.col("y").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * x").cast(dec)).alias("sxx"),
            F.sum(F.expr("x * y").cast(dec)).alias("sxy"),
            F.sum(F.expr("y * y").cast(dec)).alias("syy"),
        )
    )
    return s.selectExpr(
        "event_type", "lag", "n", f"{_acf_frag(_dec_dbl_spark)} AS acf"
    ).orderBy("event_type", "lag")


@q(
    "stream_linreg_windowed",
    oracle=f"""
    WITH b AS (
      SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
               AS win_start,
             event_type, {_X_DUCK} AS x, {VAL_I} AS y
      FROM events
    ), s AS (
      SELECT win_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x * x AS DECIMAL(38, 0))) AS sxx,
             SUM(CAST(x * y AS DECIMAL(38, 0))) AS sxy,
             SUM(CAST(y * y AS DECIMAL(38, 0))) AS syy
      FROM b GROUP BY 1, 2
    )
    SELECT win_start, event_type, n,
           {_LR_DUCK[0]} AS slope_cents_per_hour,
           {_LR_DUCK[2]} AS r2
    FROM s ORDER BY win_start, event_type
    """,
    doc="Regression OVER A STREAM: per-day windowed OLS slope/R2 per "
    "event_type computed by a real readStream -> window('1 day') "
    "aggregation -> Trigger.AvailableNow job into a complete-mode "
    "memory sink. The six moment sums are all algebraic aggregates, "
    "so they stream with bounded per-window state (this is why the "
    "moment formulation matters: a direct regr_slope over a stream "
    "would need the whole window buffered); the slope projects "
    "statelessly from the sink. Hash-checked against the DuckDB "
    "day-bucket oracle like the other streaming window families. "
    "Scale: state = one 6-number row per (day, type).",
    tags=("events", "stats", "streaming", "regression"),
)
def stream_linreg_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from magictables_spark.plans.events_pack import TS_FMT, _events_stream, _run_available_now

    src = _events_stream(spark, sf_dir)
    dec = "DECIMAL(38, 0)"
    agg = (
        src.selectExpr("ts", "event_type", f"{_X_SPARK} AS x", f"{VAL_I} AS y")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * x").cast(dec)).alias("sxx"),
            F.sum(F.expr("x * y").cast(dec)).alias("sxy"),
            F.sum(F.expr("y * y").cast(dec)).alias("syy"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("win_start"),
            "event_type",
            "n",
            "sx",
            "sy",
            "sxx",
            "sxy",
            "syy",
        )
    )
    sink = _run_available_now(spark, agg, "mts_stream_linreg_sink")
    return sink.selectExpr(
        "win_start",
        "event_type",
        "n",
        f"{_LR_SPARK[0]} AS slope_cents_per_hour",
        f"{_LR_SPARK[2]} AS r2",
    ).orderBy("win_start", "event_type")


@q(
    "bootstrap_ci_median",
    oracle=f"""
    WITH s AS (
      SELECT event_id, {VAL_I} AS y FROM events WHERE event_type = 'purchase'
    ), wpy AS (
      SELECT b, y, CAST(SUM(w) AS BIGINT) AS wsum
      FROM (
        SELECT gs.b,
               {{w_duck}} AS w,
               y
        FROM s, unnest(generate_series(1, {_BOOT_B})) AS gs(b)
      ) GROUP BY b, y
    ), cum AS (
      SELECT b, y,
             CAST(SUM(wsum) OVER (PARTITION BY b ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cw,
             CAST(SUM(wsum) OVER (PARTITION BY b) AS BIGINT) AS tw
      FROM wpy
    ), med AS (
      SELECT b, CAST(MIN(CASE WHEN 2 * cw >= tw THEN y END) AS BIGINT) AS m
      FROM cum GROUP BY b
    ), point AS (
      SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY y
    ), pcum AS (
      SELECT y,
             CAST(SUM(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
             CAST(SUM(c) OVER () AS BIGINT) AS tw
      FROM point
    )
    SELECT (SELECT CAST(MAX(tw) AS BIGINT) FROM pcum) AS n,
           (SELECT CAST(MIN(CASE WHEN 2 * cw >= tw THEN y END) AS BIGINT)
            FROM pcum) AS median_cents,
           (SELECT quantile_disc(m, 0.025) FROM med) AS ci_lo_cents,
           (SELECT quantile_disc(m, 0.975) FROM med) AS ci_hi_cents,
           CAST({_BOOT_B} AS BIGINT) AS n_replicates
    """.format(w_duck=_boot_weight(_h60_duck("event_id || ':' || gs.b"))),
    doc="Bootstrap confidence interval for the MEDIAN purchase value — "
    "the robust-statistic CI bootstrap_ci_mean's closed-form normal "
    "theory cannot give (the median's sampling variance depends on "
    "the unknown density at the median; the bootstrap sidesteps it). "
    "Same deterministic Poisson-reweight replicates (md5(id:b) "
    "through the exact 2^60 inverse-CDF table), but each replicate "
    "computes a WEIGHTED median: cumulative replicate weight over the "
    "distinct-cents frame, median = smallest value with 2*cum >= "
    "total — the entire statistic chain is EXACT INTEGERS end to end "
    "(medians are cents values; the CI bounds are order statistics of "
    "32 integers), the only registry slug with zero doubles anywhere. "
    "Scale: one x32 map-side explode, a (b, cents)-keyed agg, and a "
    "per-replicate window bounded by 32 x the cents domain — "
    "partitioned by b, so no global frame.",
    tags=("events", "stats", "bootstrap"),
)
def bootstrap_ci_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr("event_id", f"{VAL_I} AS y")
    )
    wpy = (
        s.select(
            F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("b"),
            "event_id",
            "y",
        )
        .selectExpr(
            "b",
            _boot_weight(_h60_spark("CONCAT(event_id, ':', b)")) + " AS w",
            "y",
        )
        .groupBy("b", "y")
        .agg(F.sum("w").cast("long").alias("wsum"))
    )
    w_cum = (
        Window.partitionBy("b").orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("b")
    cum = wpy.select(
        "b",
        "y",
        F.sum("wsum").over(w_cum).cast("long").alias("cw"),
        F.sum("wsum").over(w_tot).cast("long").alias("tw"),
    )
    med = cum.groupBy("b").agg(
        F.min(F.when(F.expr("2 * cw >= tw"), F.col("y"))).cast("long").alias("m")
    )
    ci = med.agg(
        F.expr("CAST(percentile_disc(0.025) WITHIN GROUP (ORDER BY m) AS BIGINT)").alias(
            "ci_lo_cents"
        ),
        F.expr("CAST(percentile_disc(0.975) WITHIN GROUP (ORDER BY m) AS BIGINT)").alias(
            "ci_hi_cents"
        ),
    )
    point = s.groupBy("y").agg(F.count("*").cast("long").alias("c"))
    wp_cum = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    wp_tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pcum = point.select(
        "y",
        F.sum("c").over(wp_cum).cast("long").alias("cw"),
        F.sum("c").over(wp_tot).cast("long").alias("tw"),
    )
    pmed = pcum.agg(
        F.max("tw").cast("long").alias("n"),
        F.min(F.when(F.expr("2 * cw >= tw"), F.col("y")))
        .cast("long")
        .alias("median_cents"),
    )
    return pmed.crossJoin(F.broadcast(ci)).selectExpr(
        "n",
        "median_cents",
        "ci_lo_cents",
        "ci_hi_cents",
        f"CAST({_BOOT_B} AS BIGINT) AS n_replicates",
    )


# ---------------------------------------------------------------------------
# kendall_tau_daily — tau-b rank concordance on the daily aggregate frame
# ---------------------------------------------------------------------------

_TAU_B = (
    "(CAST(c - d AS DOUBLE)"
    " / NULLIF(sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE)),"
    " 0.0))"
)


@q(
    "kendall_tau_daily",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM({VAL_I}) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CAST(COUNT(*) FILTER (WHERE (a.x < b.x AND a.y < b.y)
                                      OR (a.x > b.x AND a.y > b.y))
               AS BIGINT) AS c,
             CAST(COUNT(*) FILTER (WHERE (a.x < b.x AND a.y > b.y)
                                      OR (a.x > b.x AND a.y < b.y))
               AS BIGINT) AS d
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    ), ties AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n0,
             CAST((SELECT COALESCE(SUM(cx * (cx - 1) / 2), 0) FROM (
                SELECT COUNT(*) AS cx FROM daily dx
                WHERE dx.event_type = daily.event_type GROUP BY dx.x))
               AS BIGINT) AS n1,
             CAST((SELECT COALESCE(SUM(cy * (cy - 1) / 2), 0) FROM (
                SELECT COUNT(*) AS cy FROM daily dy
                WHERE dy.event_type = daily.event_type GROUP BY dy.y))
               AS BIGINT) AS n2
      FROM daily GROUP BY event_type
    )
    SELECT t.event_type, t.n AS n_days, p.c AS concordant, p.d AS discordant,
           {_TAU_B} AS tau_b
    FROM ties t JOIN pairs p USING (event_type)
    ORDER BY t.event_type
    """,
    doc="Kendall tau-b rank concordance between daily event volume and "
    "daily revenue per event_type — the third classical correlation "
    "(Pearson: corr_exact, Spearman: spearman_corr) and the one whose "
    "pairwise definition survives heavy ties. All-pairs concordant/"
    "discordant counting runs on the DAILY AGGREGATE frame (30 rows "
    "per type at any corpus size — the fixture spans exactly Jan "
    "2024), so the quadratic pair join is bounded by the DATE DOMAIN, "
    "never by n: the corpus pays one (type, day) partial agg and the "
    "30x30 self-join is driver-trivial. Tie corrections n1/n2 come "
    "from exact per-value group counts; tau-b is three exact integers "
    "through one guarded sqrt-product division, identical cross-"
    "engine.",
    tags=("events", "stats", "regression", "timeseries"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(F.expr(VAL_I)).cast("long").alias("y"),
        )
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("d1"),
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("d2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(
            F.count_if(
                F.expr("(x1 < x2 AND y1 < y2) OR (x1 > x2 AND y1 > y2)")
            ).cast("long").alias("c"),
            F.count_if(
                F.expr("(x1 < x2 AND y1 > y2) OR (x1 > x2 AND y1 < y2)")
            ).cast("long").alias("d"),
        )
    )
    n_frame = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT)").alias("n0"),
    )
    tx = (
        daily.groupBy("event_type", "x")
        .agg(F.count("*").alias("cx"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("cx * (cx - 1) / 2")).cast("long").alias("n1"))
    )
    ty = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").alias("cy"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("cy * (cy - 1) / 2")).cast("long").alias("n2"))
    )
    return (
        n_frame.join(pairs, "event_type")
        .join(tx, "event_type")
        .join(ty, "event_type")
        .selectExpr(
            "event_type",
            "n AS n_days",
            "c AS concordant",
            "d AS discordant",
            f"{_TAU_B} AS tau_b",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ols_normal_equations — multivariate OLS via exact-integer Cramer solve
# ---------------------------------------------------------------------------


@q(
    "ols_normal_equations",
    oracle=f"""
    WITH s AS (
      SELECT hour(ts) AS x1, day(ts) AS x2, {VAL_I} AS y
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x1) AS HUGEINT) AS sx1,
             CAST(SUM(x2) AS HUGEINT) AS sx2,
             CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
             CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
             CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
             CAST(SUM(x2 * y) AS HUGEINT) AS s2y
      FROM s
    ), dets AS (
      SELECT n,
             (n * (s11 * s22 - s12 * s12)
              - sx1 * (sx1 * s22 - s12 * sx2)
              + sx2 * (sx1 * s12 - s11 * sx2)) AS det,
             (sy * (s11 * s22 - s12 * s12)
              - sx1 * (s1y * s22 - s12 * s2y)
              + sx2 * (s1y * s12 - s11 * s2y)) AS n0,
             (n * (s1y * s22 - s12 * s2y)
              - sy * (sx1 * s22 - s12 * sx2)
              + sx2 * (sx1 * s2y - s1y * sx2)) AS n1,
             (n * (s11 * s2y - s1y * s12)
              - sx1 * (sx1 * s2y - s1y * sx2)
              + sy * (sx1 * s12 - s11 * sx2)) AS n2
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(det AS VARCHAR) AS det,
           CAST(CASE WHEN n0 = 0 OR det = 0 THEN 0
                     WHEN (n0 > 0) = (det > 0)
                     THEN (ABS(n0) * 1000000) // ABS(det)
                     ELSE -((ABS(n0) * 1000000) // ABS(det)) END AS BIGINT)
             AS b0_micro,
           CAST(CASE WHEN n1 = 0 OR det = 0 THEN 0
                     WHEN (n1 > 0) = (det > 0)
                     THEN (ABS(n1) * 1000000) // ABS(det)
                     ELSE -((ABS(n1) * 1000000) // ABS(det)) END AS BIGINT)
             AS b_hour_micro,
           CAST(CASE WHEN n2 = 0 OR det = 0 THEN 0
                     WHEN (n2 > 0) = (det > 0)
                     THEN (ABS(n2) * 1000000) // ABS(det)
                     ELSE -((ABS(n2) * 1000000) // ABS(det)) END AS BIGINT)
             AS b_day_micro
    FROM dets
    """,
    doc="MULTIVARIATE ordinary least squares — purchase cents regressed "
    "on (hour-of-day, day-of-month) with intercept — solved through "
    "the normal equations with Cramer's rule in EXACT INTEGER "
    "arithmetic: one distributed pass accumulates the nine integer "
    "moments (the map-side-combinable sufficient statistics — the "
    "only thing that crosses the wire at any scale, which is why "
    "normal-equation OLS is THE distributed regression recipe for "
    "small feature counts), then the 3x3 determinants are exact "
    "bignum products (HUGEINT in the oracle, Python arbitrary-"
    "precision on the collected 1-row moments in Spark — the same "
    "bounded scalar roundtrip as kmeans' centroid step; no float "
    "enters until the final reported ratio). Coefficients surface as "
    "exact micro-unit integers (truncated |num|*1e6 div |det| with "
    "explicit sign, identical on both engines) plus the determinant "
    "as a digit string — fully value-hash-oracled where a float "
    "matrix solve never could be. Extends linreg_by_group (single "
    "feature) to the multi-feature case.",
    tags=("events", "stats", "regression", "ml"),
)
def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr("hour(ts) AS x1", "day(ts) AS x2", f"{VAL_I} AS y")
    )
    row = s.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.expr("x1 * x1")).alias("s11"),
        F.sum(F.expr("x1 * x2")).alias("s12"),
        F.sum(F.expr("x2 * x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x1 * y")).alias("s1y"),
        F.sum(F.expr("x2 * y")).alias("s2y"),
    ).collect()[0]
    n, sx1, sx2 = int(row["n"]), int(row["sx1"] or 0), int(row["sx2"] or 0)
    s11, s12, s22 = int(row["s11"] or 0), int(row["s12"] or 0), int(row["s22"] or 0)
    sy, s1y, s2y = int(row["sy"] or 0), int(row["s1y"] or 0), int(row["s2y"] or 0)
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    n0 = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    )
    n1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    )
    n2 = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    )

    def micro(num: int) -> int:
        if num == 0 or det == 0:
            return 0
        mag = (abs(num) * 1_000_000) // abs(det)
        return mag if (num > 0) == (det > 0) else -mag

    return spark.createDataFrame(
        [(n, str(det), micro(n0), micro(n1), micro(n2))],
        "n bigint, det string, b0_micro bigint, b_hour_micro bigint,"
        " b_day_micro bigint",
    )


# ---------------------------------------------------------------------------
# changepoint_binary_seg — exact-integer offline changepoint detection
# ---------------------------------------------------------------------------

# LCM(1..31): multiplying each segment's SSE (a rational A/n with n <=
# 31 days) by L yields A * (L/n) — an exact INTEGER comparable across
# all candidate splits with one shared scale, so the argmin needs no
# floating point and no per-pair cross-multiplication.
_CP_L = 72201776446800


@q(
    "changepoint_binary_seg",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM({VAL_I}) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), pre AS (
      SELECT event_type, day, y,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(y) OVER w AS BIGINT) AS s_l,
             CAST(SUM(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS q_l,
             CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS s_t,
             CAST(SUM(CAST(y AS HUGEINT) * y)
                  OVER (PARTITION BY event_type) AS HUGEINT) AS q_t
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), costs AS (
      SELECT event_type, day AS split_day, i AS n_left, n - i AS n_right,
             s_l, s_t - s_l AS s_r,
             ((i * q_l - CAST(s_l AS HUGEINT) * s_l) * ({_CP_L} // i)
              + ((n - i) * (q_t - q_l)
                 - CAST(s_t - s_l AS HUGEINT) * (s_t - s_l))
                * ({_CP_L} // (n - i))) AS cost_scaled
      FROM pre WHERE i < n
    )
    SELECT event_type, strftime(split_day, '%Y-%m-%d') AS split_day,
           n_left, n_right,
           CAST(cost_scaled AS VARCHAR) AS cost_scaled,
           CAST((s_l * 1000000) // n_left AS BIGINT) AS mean_left_micro,
           CAST((s_r * 1000000) // n_right AS BIGINT) AS mean_right_micro
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY cost_scaled, split_day) AS rk
      FROM costs
    ) WHERE rk = 1
    ORDER BY event_type
    """,
    doc="Offline CHANGEPOINT DETECTION by binary segmentation (the "
    "first split of PELT/BinSeg, Scott & Knott style): for each event "
    "type, find the day splitting the daily-revenue series into two "
    "segments with minimal total within-segment squared error. The "
    "argmin is EXACT: each segment's SSE is the rational (n*Sum(y^2) "
    "- Sum(y)^2)/n, and multiplying by LCM(1..31) turns every "
    "candidate's total cost into one shared-scale INTEGER (HUGEINT / "
    "DECIMAL(38)) — no float enters the comparison, so the chosen "
    "split and its cost digit-string are value-hash-oracled, where a "
    "double SSE argmin could flip on ties. Plan shape: one (type, "
    "day) partial agg collapses the corpus to the DATE-DOMAIN frame "
    "(<= 31 rows per type at any scale), then prefix-sum windows and "
    "a rank over that bounded frame — the cost scan is O(days), never "
    "O(n), the same bounded-frame discipline as kendall_tau_daily. "
    "Segment means surface as exact micro-unit integers.",
    tags=("events", "stats", "timeseries", "regression"),
)
def changepoint_binary_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.expr(VAL_I)).cast("long").alias("y"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    dec = "DECIMAL(38, 0)"
    pre = daily.select(
        "event_type",
        "day",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")
        ).cast("long").alias("i"),
        F.count("*").over(wt).cast("long").alias("n"),
        F.sum("y").over(wc).cast("long").alias("s_l"),
        F.sum(F.expr(f"CAST(y AS {dec}) * y")).over(wc).alias("q_l"),
        F.sum("y").over(wt).cast("long").alias("s_t"),
        F.sum(F.expr(f"CAST(y AS {dec}) * y")).over(wt).alias("q_t"),
    )
    costs = pre.filter(F.col("i") < F.col("n")).selectExpr(
        "event_type",
        "day AS split_day",
        "i AS n_left",
        "n - i AS n_right",
        "s_l",
        "s_t - s_l AS s_r",
        f"((i * q_l - CAST(s_l AS {dec}) * s_l) * CAST({_CP_L} div i AS {dec})"
        f" + ((n - i) * (q_t - q_l)"
        f"    - CAST(s_t - s_l AS {dec}) * (s_t - s_l))"
        f"   * CAST({_CP_L} div (n - i) AS {dec})) AS cost_scaled",
    )
    wr = Window.partitionBy("event_type").orderBy("cost_scaled", "split_day")
    return (
        costs.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "event_type",
            "date_format(split_day, 'yyyy-MM-dd') AS split_day",
            "n_left",
            "n_right",
            "CAST(cost_scaled AS STRING) AS cost_scaled",
            "CAST((s_l * 1000000) div n_left AS BIGINT) AS mean_left_micro",
            "CAST((s_r * 1000000) div n_right AS BIGINT) AS mean_right_micro",
        )
        .orderBy("event_type")
    )
