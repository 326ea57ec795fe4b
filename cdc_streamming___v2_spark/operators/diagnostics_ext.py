"""Econometric residual-diagnostics tier (DRIVER surface) — wave AW.

The engine already audits the daily-revenue trend for serial correlation
(``durbin_watson_trend``), HAC-robust slope uncertainty
(``newey_west_trend_se``) and parameter stability (``chow_break_test``).
This module completes the classic regression-diagnostics battery around
the SAME fitted trend, plus the parametric variance-homogeneity and
median tests the rank tier (levene / kruskal_wallis / mood) implies:

- ``jarque_bera_test``: residual normality from exact whole-dollar
  residual power sums (the fourth power of a CENT-grid residual would
  graze decimal(38,0) at the 10x corpus — the mahalanobis overflow
  lesson applied one power higher).
- ``breusch_pagan_test``: heteroskedasticity — the LM auxiliary
  regression of squared residuals on time, R^2 assembled in DOUBLE from
  exact decimal folds (the centered cross-products exceed decimal(38)
  when squared).
- ``arch_lm_test``: conditional heteroskedasticity — squared residual on
  its own lag, same R^2 machinery over the lagged frame.
- ``dickey_fuller_test``: unit root — Delta x_t on x_{t-1} with
  intercept; the ADF t compares against the -2.86 (5%, with-constant)
  tabulated critical point, inlined because neither engine ships DF
  quantiles.
- ``bartlett_test``: parametric k-group variance homogeneity on event
  values (the moment-based companion of levene_variance_test); per-group
  ln-variance terms are micro-rounded BEFORE the k-term fold (the
  tukey_hsd pico-fold pattern) so the k-row sum is exact integer
  arithmetic.
- ``mood_median_test``: k-group median test on the bounded cent-value
  grid; the grand lower median is an integer-div rank pick (the
  runs_test lesson — float-division rank filters silently empty the
  frame), per-group chi2 cells fold micro-rounded.

Determinism contract (house rules): every cross-row accumulation is an
exact integer in decimal(38,0) (or a micro/pico-rounded grid value cast
to decimal); every float is a SINGLE scalar expression over those exact
folds, written identically for Spark and DuckDB, so the compared doubles
are bit-identical.  Verdicts compare the unrounded double against inlined
critical values (chi2/DF tables via a df CASE — no engine quantile
functions).

Scale: every operator reduces orders/events ONCE to a calendar- or
value-grid-bounded frame before any window runs; scalar fits broadcast as
1-row frames (BNLJ, not CartesianProduct).  Reference parity: the
reference pipeline (src/dataflow-cdc-stream.py) has no analytics surface
— this tier is driver-mandated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DEC = "decimal(38,0)"

# chi-squared 95th-percentile critical values by df (inlined: no engine
# exposes the quantile; df beyond the table yields a NULL verdict rather
# than a wrong one)
_CHI2_95 = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919,
}


def _chi2_crit_spark(df_col):
    expr = F.lit(None).cast("double")
    for df_, crit in sorted(_CHI2_95.items(), reverse=True):
        expr = F.when(df_col == df_, F.lit(crit)).otherwise(expr)
    return expr


def _chi2_crit_sql(df_expr: str) -> str:
    cases = " ".join(
        f"WHEN {df_expr} = {d} THEN {c}" for d, c in sorted(_CHI2_95.items())
    )
    return f"(CASE {cases} ELSE NULL END)"


# --------------------------------------------------------------------------
# shared machinery: daily-revenue OLS trend residuals on the whole-dollar
# grid (durbin_watson_trend's residual convention, one grid coarser so
# fourth powers stay far from decimal(38,0) at replica scale)
# --------------------------------------------------------------------------


def _trend_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, t, xc, e): t = days since 1995-01-01 (long), xc = daily
    revenue cents (long), e = whole-DOLLAR OLS trend residual as
    decimal(38,0).  Slope/intercept are single float expressions of exact
    decimal moments; the residual rounds once to dollars (a ~1e-7
    relative grid here) so downstream power sums are exact integers."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    # materialize the calendar-bounded daily frame once: both the OLS
    # moment aggregate and the residual projection consume it, so
    # un-truncated every _trend_residuals caller re-ran the orders
    # aggregate twice (r11 lineage-cut pass)
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc"))
        .select(
            "day",
            F.datediff(F.col("day"), F.lit("1995-01-01")).cast("long").alias("t"),
            "xc",
        )
        .localCheckpoint(eager=True)
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("t").cast(_DEC)).alias("st"),
        F.sum(F.col("xc").cast(_DEC)).alias("sx"),
        F.sum((F.col("t") * F.col("xc")).cast(_DEC)).alias("stx"),
        F.sum((F.col("t") * F.col("t")).cast(_DEC)).alias("stt"),
    )
    b = (
        (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")).cast("double")
        / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    )
    a = (F.col("sx").cast("double") - b * F.col("st").cast("double")) / F.col(
        "n"
    ).cast("double")
    fit = mom.select(b.alias("b"), a.alias("a"))
    return daily.crossJoin(F.broadcast(fit)).select(
        "day",
        "t",
        "xc",
        F.round(
            (F.col("xc").cast("double") - F.col("a") - F.col("b") * F.col("t"))
            / 100.0
        )
        .cast("long")
        .cast(_DEC)
        .alias("e"),
    )


# the DuckDB twin of _trend_residuals, shared verbatim by the three
# trend-residual oracles
_RESID_CTE = """
    daily AS (
        SELECT o_orderdate AS day,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1, 2
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(t) AS HUGEINT) AS st,
               CAST(sum(xc) AS HUGEINT) AS sx,
               CAST(sum(t * xc) AS HUGEINT) AS stx,
               CAST(sum(t * t) AS HUGEINT) AS stt
        FROM daily
    ),
    fit AS (
        SELECT CAST(n * stx - st * sx AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b,
               (CAST(sx AS DOUBLE)
                - CAST(n * stx - st * sx AS DOUBLE)
                      / CAST(n * stt - st * st AS DOUBLE)
                      * CAST(st AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
        FROM mom
    ),
    res AS (
        SELECT day, t, xc,
               CAST(round((CAST(xc AS DOUBLE) - a - b * t) / 100.0)
                    AS HUGEINT) AS e
        FROM daily CROSS JOIN fit
    )
"""


# --------------------------------------------------------------------------
# jarque_bera_test
# --------------------------------------------------------------------------


def jarque_bera_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of the daily-revenue trend residuals —
    the distributional-shape diagnostic beside durbin_watson_trend
    (serial correlation) and breusch_pagan_test (heteroskedasticity).

    Skewness and excess kurtosis come from the raw whole-dollar residual
    power sums S1..S4 (exact decimal(38,0): |e| ~ 1e6 dollars here, so
    even e^4 folds sit ~1e8 below the decimal ceiling at the 10x replica
    corpus); the central moments m2..m4 and JB = n/6*(g1^2 + g2^2/4) are
    single float expressions of those exact integers.  Verdict vs
    chi2(2, .95) = 5.991 on the unrounded double.

    Scale: one map-side-combined reduce to the calendar-bounded daily
    frame, one 1-row broadcast fit, one aggregate.
    """
    res = _trend_residuals(spark, sf_dir)
    e = F.col("e")
    agg = res.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(e).alias("s1"),
        F.sum(e * e).alias("s2"),
        F.sum(e * e * e).alias("s3"),
        F.sum(e * e * e * e).alias("s4"),
    )
    n = F.col("n").cast("double")
    m = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - m * m
    m3 = r3 - 3.0 * m * r2 + 2.0 * m * m * m
    m4 = r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m
    skew = m3 / F.pow(m2, F.lit(1.5))
    exk = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(skew, 6).alias("skewness"),
        F.round(exk, 6).alias("ex_kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        F.when(jb > 5.991, F.lit("non_normal")).otherwise(F.lit("normal")).alias(
            "verdict"
        ),
    )


ORACLES["jarque_bera_test"] = f"""
    WITH {_RESID_CTE},
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(e) AS s1,
               sum(e * e) AS s2, sum(e * e * e) AS s3,
               sum(e * e * e * e) AS s4
        FROM res
    ),
    fl AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
               CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        FROM agg
    ),
    cm AS (
        SELECT n, r2 - m * m AS m2,
               r3 - 3.0 * m * r2 + 2.0 * m * m * m AS m3,
               r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m AS m4
        FROM fl
    ),
    st AS (
        SELECT n, m3 / pow(m2, 1.5) AS skew, m4 / (m2 * m2) - 3.0 AS exk
        FROM cm
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(skew, 6) AS skewness,
           round(exk, 6) AS ex_kurtosis,
           round(n / 6.0 * (skew * skew + exk * exk / 4.0), 4) AS jb_stat,
           CASE WHEN n / 6.0 * (skew * skew + exk * exk / 4.0) > 5.991
                THEN 'non_normal' ELSE 'normal' END AS verdict
    FROM st
"""
QUERIES["jarque_bera_test"] = jarque_bera_test


# --------------------------------------------------------------------------
# breusch_pagan_test
# --------------------------------------------------------------------------


def breusch_pagan_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan (Koenker studentized form) heteroskedasticity test
    of the daily-revenue trend: LM = n * R^2 of the auxiliary regression
    of squared residuals on time.

    All six auxiliary moments fold exact in decimal(38,0) (g = e^2 is
    ~1e13 in dollar^2 units; n*S_gg ~ 1e34 stays inside decimal(38,0));
    the centered cross-products are then CAST TO DOUBLE before squaring —
    (n*S_tg - S_t*S_g)^2 would overflow any fixed decimal (the
    mahalanobis C-product lesson).  Verdict vs chi2(1, .95) = 3.841.

    Scale: same bounded daily frame + one aggregate.
    """
    res = _trend_residuals(spark, sf_dir)
    g = (F.col("e") * F.col("e")).alias("g")
    frame = res.select(F.col("t").cast(_DEC).alias("td"), g)
    agg = frame.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("td").alias("st"),
        F.sum(F.col("td") * F.col("td")).alias("stt"),
        F.sum("g").alias("sg"),
        F.sum(F.col("td") * F.col("g")).alias("stg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    n = F.col("n").cast("double")
    sxy = (F.col("n") * F.col("stg") - F.col("st") * F.col("sg")).cast("double")
    sxx = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    syy = (F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")).cast("double")
    r2 = sxy * sxy / (sxx * syy)
    lm = n * r2
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(lm, 4).alias("lm_stat"),
        F.when(lm > 3.841, F.lit("heteroskedastic"))
        .otherwise(F.lit("homoskedastic"))
        .alias("verdict"),
    )


ORACLES["breusch_pagan_test"] = f"""
    WITH {_RESID_CTE},
    frame AS (
        SELECT CAST(t AS HUGEINT) AS td, e * e AS g FROM res
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(td) AS st,
               sum(td * td) AS stt, sum(g) AS sg, sum(td * g) AS stg,
               sum(g * g) AS sgg
        FROM frame
    ),
    parts AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(n * stg - st * sg AS DOUBLE) AS sxy,
               CAST(n * stt - st * st AS DOUBLE) AS sxx,
               CAST(n * sgg - sg * sg AS DOUBLE) AS syy
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(sxy * sxy / (sxx * syy), 6) AS r2_aux,
           round(n * sxy * sxy / (sxx * syy), 4) AS lm_stat,
           CASE WHEN n * sxy * sxy / (sxx * syy) > 3.841
                THEN 'heteroskedastic' ELSE 'homoskedastic' END AS verdict
    FROM parts
"""
QUERIES["breusch_pagan_test"] = breusch_pagan_test


# --------------------------------------------------------------------------
# arch_lm_test
# --------------------------------------------------------------------------


def arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle ARCH LM test (one lag) on the daily-revenue trend residuals
    — does today's squared residual predict tomorrow's?  The volatility-
    clustering companion of breusch_pagan_test (which regresses on time).

    g_t = e_t^2 on the whole-dollar grid is exact; one ordered window
    lags it; the auxiliary R^2 of g_t on g_{t-1} uses the same exact-
    decimal-fold / double-assembly split as breusch_pagan_test.
    LM = (n-1) * R^2 vs chi2(1, .95) = 3.841.

    Scale: bounded daily frame, one ordered window, one aggregate.
    """
    res = _trend_residuals(spark, sf_dir)
    wn = Window.partitionBy().orderBy("day")
    frame = (
        res.select("day", (F.col("e") * F.col("e")).alias("g"))
        .withColumn("g1", F.lag("g").over(wn))
        .filter(F.col("g1").isNotNull())
    )
    agg = frame.agg(
        F.count(F.lit(1)).cast(_DEC).alias("m"),
        F.sum("g1").alias("sx"),
        F.sum(F.col("g1") * F.col("g1")).alias("sxx"),
        F.sum("g").alias("sy"),
        F.sum(F.col("g1") * F.col("g")).alias("sxy"),
        F.sum(F.col("g") * F.col("g")).alias("syy"),
    )
    m = F.col("m").cast("double")
    cxy = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cxx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cyy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r2 = cxy * cxy / (cxx * cyy)
    lm = m * r2
    return agg.select(
        F.col("m").cast("long").alias("n_obs"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(lm, 4).alias("lm_stat"),
        F.when(lm > 3.841, F.lit("arch_effects"))
        .otherwise(F.lit("no_arch"))
        .alias("verdict"),
    )


ORACLES["arch_lm_test"] = f"""
    WITH {_RESID_CTE},
    lagged AS (
        SELECT e * e AS g, lag(e * e) OVER (ORDER BY day) AS g1 FROM res
    ),
    frame AS (SELECT g, g1 FROM lagged WHERE g1 IS NOT NULL),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS m, sum(g1) AS sx,
               sum(g1 * g1) AS sxx, sum(g) AS sy, sum(g1 * g) AS sxy,
               sum(g * g) AS syy
        FROM frame
    ),
    parts AS (
        SELECT CAST(m AS DOUBLE) AS m,
               CAST(m * sxy - sx * sy AS DOUBLE) AS cxy,
               CAST(m * sxx - sx * sx AS DOUBLE) AS cxx,
               CAST(m * syy - sy * sy AS DOUBLE) AS cyy
        FROM agg
    )
    SELECT CAST(m AS BIGINT) AS n_obs,
           round(cxy * cxy / (cxx * cyy), 6) AS r2_aux,
           round(m * cxy * cxy / (cxx * cyy), 4) AS lm_stat,
           CASE WHEN m * cxy * cxy / (cxx * cyy) > 3.841
                THEN 'arch_effects' ELSE 'no_arch' END AS verdict
    FROM parts
"""
QUERIES["arch_lm_test"] = arch_lm_test


# --------------------------------------------------------------------------
# dickey_fuller_test
# --------------------------------------------------------------------------


def dickey_fuller_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (with constant, zero augmentation
    lags) on daily revenue: Delta x_t = alpha + rho * x_{t-1} + eps.
    The stationarity gate the forecasting tier (ar2_forecast,
    holt_forecast) implicitly assumes.

    All six regression moments over (x_{t-1}, Delta x_t) fold exact in
    decimal(38,0) on the cent grid; rho, its standard error and the ADF
    t assemble as single float expressions (t = (A/B) * sqrt((m-2)*B /
    (C - A^2/B)) with A, B, C the n-scaled centered moments — every
    division appears identically in both engines).  The -2.86 critical
    point (5%, with-constant DF distribution) is a tabulated literal:
    neither engine has DF quantiles.

    Scale: bounded daily frame, one ordered window, one aggregate.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    wn = Window.partitionBy().orderBy("day")
    frame = (
        daily.withColumn("x1", F.lag("xc").over(wn))
        .filter(F.col("x1").isNotNull())
        .select(
            F.col("x1").cast(_DEC).alias("x1"),
            (F.col("xc") - F.col("x1")).cast(_DEC).alias("d"),
        )
    )
    agg = frame.agg(
        F.count(F.lit(1)).cast(_DEC).alias("m"),
        F.sum("x1").alias("sx"),
        F.sum(F.col("x1") * F.col("x1")).alias("sxx"),
        F.sum("d").alias("sd"),
        F.sum(F.col("x1") * F.col("d")).alias("sxd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    m = F.col("m").cast("double")
    a_ = (F.col("m") * F.col("sxd") - F.col("sx") * F.col("sd")).cast("double")
    b_ = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    c_ = (F.col("m") * F.col("sdd") - F.col("sd") * F.col("sd")).cast("double")
    rho = a_ / b_
    tstat = rho * F.sqrt((m - 2.0) * b_ / (c_ - a_ * a_ / b_))
    return agg.select(
        F.col("m").cast("long").alias("n_obs"),
        F.round(rho, 8).alias("rho_hat"),
        F.round(tstat, 4).alias("adf_t"),
        F.when(tstat < -2.86, F.lit("stationary"))
        .otherwise(F.lit("unit_root"))
        .alias("verdict"),
    )


ORACLES["dickey_fuller_test"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT xc, lag(xc) OVER (ORDER BY day) AS x1 FROM daily
    ),
    frame AS (
        SELECT CAST(x1 AS HUGEINT) AS x1, CAST(xc - x1 AS HUGEINT) AS d
        FROM lagged WHERE x1 IS NOT NULL
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS m, sum(x1) AS sx,
               sum(x1 * x1) AS sxx, sum(d) AS sd, sum(x1 * d) AS sxd,
               sum(d * d) AS sdd
        FROM frame
    ),
    parts AS (
        SELECT CAST(m AS DOUBLE) AS m,
               CAST(m * sxd - sx * sd AS DOUBLE) AS a,
               CAST(m * sxx - sx * sx AS DOUBLE) AS b,
               CAST(m * sdd - sd * sd AS DOUBLE) AS c
        FROM agg
    )
    SELECT CAST(m AS BIGINT) AS n_obs,
           round(a / b, 8) AS rho_hat,
           round(a / b * sqrt((m - 2.0) * b / (c - a * a / b)), 4) AS adf_t,
           CASE WHEN a / b * sqrt((m - 2.0) * b / (c - a * a / b)) < -2.86
                THEN 'stationary' ELSE 'unit_root' END AS verdict
    FROM parts
"""
QUERIES["dickey_fuller_test"] = dickey_fuller_test


# --------------------------------------------------------------------------
# bartlett_test
# --------------------------------------------------------------------------


def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett test of equal variances across event types — the
    moment-based (normality-assuming) companion of levene_variance_test,
    sensitive where Levene is robust.

    Per-type sample variance v_i is ONE float division of exact cent
    moments ((n*q - s^2) / (n*(n-1))); the three k-term folds —
    (n_i-1)*v_i, (n_i-1)*ln(v_i), 1/(n_i-1) — are micro/pico-rounded on
    bit-identical doubles and cast to decimal BEFORE summing (the
    tukey_hsd pooled-variance pattern), so the k-row accumulation order
    cannot perturb the statistic.  B = ((N-k) ln sp^2 - sum dfw ln v) /
    C with the Bartlett small-sample correction C; verdict vs
    chi2(k-1, .95) from the inlined critical table (NULL-df -> NULL
    verdict rather than a wrong one).

    Scale: one map-side-combined reduce of events to the k-row type
    frame; everything after is k-row scalar math.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    per = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("ni"),
            F.sum(F.col("vc").cast(_DEC)).alias("si"),
            F.sum((F.col("vc") * F.col("vc")).cast(_DEC)).alias("qi"),
        )
        .filter(F.col("ni") >= 2)
    )
    vi = (F.col("ni") * F.col("qi") - F.col("si") * F.col("si")).cast(
        "double"
    ) / (F.col("ni") * (F.col("ni") - 1)).cast("double")
    dfw = (F.col("ni") - 1).cast("double")
    terms = per.select(
        "ni",
        F.round(dfw * vi, 6).cast("decimal(38,6)").alias("ssw"),
        F.round(dfw * F.log(vi), 6).cast("decimal(38,6)").alias("lnw"),
        F.round(F.lit(1.0) / dfw, 12).cast("decimal(38,12)").alias("inv"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast(_DEC).alias("nt"),
        F.sum("ssw").alias("sss"),
        F.sum("lnw").alias("sln"),
        F.sum("inv").alias("sinv"),
    )
    k = F.col("k").cast("double")
    nt = F.col("nt").cast("double")
    nk = nt - k
    sp2 = F.col("sss").cast("double") / nk
    bstat = (nk * F.log(sp2) - F.col("sln").cast("double")) / (
        F.lit(1.0)
        + (F.col("sinv").cast("double") - 1.0 / nk) / (3.0 * (k - 1.0))
    )
    crit = _chi2_crit_spark(F.col("k") - 1)
    return agg.select(
        F.col("k").alias("k_groups"),
        F.col("nt").cast("long").alias("n_total"),
        F.round(sp2, 4).alias("pooled_var"),
        F.round(bstat, 4).alias("bartlett_stat"),
        F.when(crit.isNull(), F.lit(None).cast("string"))
        .when(bstat > crit, F.lit("unequal_var"))
        .otherwise(F.lit("equal_var"))
        .alias("verdict"),
    )


ORACLES["bartlett_test"] = f"""
    WITH ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    per AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS ni,
               CAST(sum(vc) AS HUGEINT) AS si,
               CAST(sum(CAST(vc AS HUGEINT) * CAST(vc AS HUGEINT))
                    AS HUGEINT) AS qi
        FROM ev GROUP BY 1
        HAVING count(*) >= 2
    ),
    terms AS (
        SELECT ni,
               CAST(round(CAST(ni - 1 AS DOUBLE)
                          * (CAST(ni * qi - si * si AS DOUBLE)
                             / CAST(ni * (ni - 1) AS DOUBLE)), 6)
                    AS DECIMAL(38,6)) AS ssw,
               CAST(round(CAST(ni - 1 AS DOUBLE)
                          * ln(CAST(ni * qi - si * si AS DOUBLE)
                               / CAST(ni * (ni - 1) AS DOUBLE)), 6)
                    AS DECIMAL(38,6)) AS lnw,
               CAST(round(1.0 / CAST(ni - 1 AS DOUBLE), 12)
                    AS DECIMAL(38,12)) AS inv
        FROM per
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS HUGEINT) AS nt,
               sum(ssw) AS sss, sum(lnw) AS sln, sum(inv) AS sinv
        FROM terms
    ),
    parts AS (
        SELECT k, nt, CAST(k AS DOUBLE) AS kd, CAST(nt AS DOUBLE) AS ntd,
               CAST(sss AS DOUBLE) AS sss, CAST(sln AS DOUBLE) AS sln,
               CAST(sinv AS DOUBLE) AS sinv
        FROM agg
    ),
    st AS (
        SELECT k, nt, ntd - kd AS nk,
               sss / (ntd - kd) AS sp2,
               ((ntd - kd) * ln(sss / (ntd - kd)) - sln)
                   / (1.0 + (sinv - 1.0 / (ntd - kd)) / (3.0 * (kd - 1.0)))
                   AS bstat
        FROM parts
    )
    SELECT k AS k_groups, CAST(nt AS BIGINT) AS n_total,
           round(sp2, 4) AS pooled_var,
           round(bstat, 4) AS bartlett_stat,
           CASE WHEN {_chi2_crit_sql("k - 1")} IS NULL THEN NULL
                WHEN bstat > {_chi2_crit_sql("k - 1")} THEN 'unequal_var'
                ELSE 'equal_var' END AS verdict
    FROM st
"""
QUERIES["bartlett_test"] = bartlett_test


# --------------------------------------------------------------------------
# mood_median_test
# --------------------------------------------------------------------------


def mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types — the coarse, outlier-proof
    k-group location test beside kruskal_wallis (rank-based) and
    anova_f_oneway (moment-based): does each type put the same share of
    its mass above the grand median?

    The grand LOWER median is an integer-div rank pick on the bounded
    cent-value grid (cumulative counts over the ~33k-row distinct-value
    frame — never a row-level sort; rank (N+1) div 2, the runs_test
    division lesson).  The 2xk contingency table is exact integers;
    each type's chi2 cell pair folds micro-rounded from the single
    expression (N*O - r*c)^2 / (N*r*c) on bit-identical doubles.
    Verdict vs chi2(k-1, .95) from the inlined table.

    Scale: one reduce to the (type x cent-value) grid, one ordered
    window on the value grid, one k-row fold.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    # A single-pass restructure (fold both the median and the per-type
    # table from one materialized (event_type x vc) grid) was measured
    # SLOWER solo (r11: 0.729 -> 0.968 s min-of-3, stable canaries): the
    # two passes here are narrow map-side-combined reduces that pipeline
    # off the page cache, while the restructure paid an extra exchange on
    # the wider grid plus an eager round-trip.  Kept the two-pass shape.
    grid = ev.groupBy("vc").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = grid.agg(F.sum("cnt").alias("nn"))
    wv = Window.partitionBy().orderBy("vc")
    med = (
        grid.withColumn("cum", F.sum("cnt").over(wv))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.expr("(nn + 1) div 2"))
        .orderBy("vc")
        .limit(1)
        .select(F.col("vc").alias("med"))
    )
    per = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("vc") > F.col("med"), 1).otherwise(0))
            .cast(_DEC)
            .alias("ai"),
            F.sum(F.when(F.col("vc") <= F.col("med"), 1).otherwise(0))
            .cast(_DEC)
            .alias("bi"),
        )
    )
    marg = per.agg(
        F.sum("ai").alias("ta"),
        F.sum("bi").alias("tb"),
        F.sum(F.col("ai") + F.col("bi")).alias("nn"),
    )
    cell = per.crossJoin(F.broadcast(marg)).select(
        "event_type",
        (
            F.pow(
                (F.col("nn") * F.col("ai")
                 - (F.col("ai") + F.col("bi")) * F.col("ta")).cast("double"),
                F.lit(2.0),
            )
            / (F.col("nn") * (F.col("ai") + F.col("bi")) * F.col("ta")).cast(
                "double"
            )
            + F.pow(
                (F.col("nn") * F.col("bi")
                 - (F.col("ai") + F.col("bi")) * F.col("tb")).cast("double"),
                F.lit(2.0),
            )
            / (F.col("nn") * (F.col("ai") + F.col("bi")) * F.col("tb")).cast(
                "double"
            )
        ).alias("term"),
    )
    folded = cell.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.round(F.col("term"), 6).cast("decimal(38,6)")).alias("chi"),
    )
    chi = F.col("chi").cast("double")
    crit = _chi2_crit_spark(F.col("k") - 1)
    out = folded.crossJoin(F.broadcast(med)).select(
        F.col("k").alias("k_groups"),
        F.round(F.col("med") / 100.0, 2).alias("grand_median"),
        F.round(chi, 4).alias("chi2_stat"),
        F.when(crit.isNull(), F.lit(None).cast("string"))
        .when(chi > crit, F.lit("medians_differ"))
        .otherwise(F.lit("medians_equal"))
        .alias("verdict"),
    )
    return out


ORACLES["mood_median_test"] = f"""
    WITH ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    grid AS (SELECT vc, count(*) AS cnt FROM ev GROUP BY 1),
    tot AS (SELECT sum(cnt) AS nn FROM grid),
    med AS (
        SELECT vc AS med FROM (
            SELECT vc, sum(cnt) OVER (ORDER BY vc) AS cum FROM grid
        ), tot
        WHERE cum >= (nn + 1) // 2
        ORDER BY vc LIMIT 1
    ),
    per AS (
        SELECT event_type,
               CAST(sum(CASE WHEN vc > med THEN 1 ELSE 0 END) AS HUGEINT)
                   AS ai,
               CAST(sum(CASE WHEN vc <= med THEN 1 ELSE 0 END) AS HUGEINT)
                   AS bi
        FROM ev, med GROUP BY 1
    ),
    marg AS (
        SELECT sum(ai) AS ta, sum(bi) AS tb, sum(ai + bi) AS nn FROM per
    ),
    cell AS (
        SELECT event_type,
               pow(CAST(nn * ai - (ai + bi) * ta AS DOUBLE), 2.0)
                   / CAST(nn * (ai + bi) * ta AS DOUBLE)
               + pow(CAST(nn * bi - (ai + bi) * tb AS DOUBLE), 2.0)
                   / CAST(nn * (ai + bi) * tb AS DOUBLE) AS term
        FROM per, marg
    ),
    folded AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               sum(CAST(round(term, 6) AS DECIMAL(38,6))) AS chi
        FROM cell
    )
    SELECT k AS k_groups,
           round(CAST(med AS DOUBLE) / 100.0, 2) AS grand_median,
           round(CAST(chi AS DOUBLE), 4) AS chi2_stat,
           CASE WHEN {_chi2_crit_sql("k - 1")} IS NULL THEN NULL
                WHEN CAST(chi AS DOUBLE) > {_chi2_crit_sql("k - 1")}
                    THEN 'medians_differ'
                ELSE 'medians_equal' END AS verdict
    FROM folded, med
"""
QUERIES["mood_median_test"] = mood_median_test


# --------------------------------------------------------------------------
# wave AX — effect sizes, reliability, partialled association
# --------------------------------------------------------------------------


def cliffs_delta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size for every event-type pair — the
    magnitude companion of mann_whitney_u (which only answers "is there a
    shift?"): delta = (#(x>y) - #(x<y)) / (n1*n2), in [-1, 1].

    Identity used: with doubled midranks over the PAIR's pooled cent
    grid, 2*U1 = R2_1 - n1*(n1+1) is exact, and delta's numerator
    2*U1 - n1*n2 = #gt - #lt needs no tie bookkeeping.  Every rank fold
    is an exact decimal(38,0); delta is ONE float division, and the
    standard magnitude labels (0.147 / 0.33 / 0.474) are decided by
    cross-multiplied integer comparisons (1000*|num| vs 147*n1*n2 ...),
    so no float ever picks a label.

    Scale: one reduce of events to the (type x cent-value) grid; the
    grid joins a k(k-1)/2-row broadcast pair list (types are enum-
    bounded) and ranks within (pair) partitions of the bounded grid.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    grid = ev.groupBy("event_type", "vc").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    types = grid.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .join(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    expanded = grid.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("ta")) | (F.col("event_type") == F.col("tb")),
    )
    cell = expanded.groupBy("ta", "tb", "vc").agg(
        F.sum("cnt").alias("ct"),
        F.sum(F.when(F.col("event_type") == F.col("ta"), F.col("cnt")).otherwise(0)).alias("ca"),
    )
    wp = Window.partitionBy("ta", "tb").orderBy("vc")
    ranked = cell.withColumn("cum", F.sum("ct").over(wp)).select(
        "ta", "tb", "ca", "ct",
        (F.lit(2) * F.col("cum") - F.col("ct") + 1).cast(_DEC).alias("rank2"),
    )
    agg = ranked.groupBy("ta", "tb").agg(
        F.sum(F.col("ca").cast(_DEC) * F.col("rank2")).alias("r2a"),
        F.sum(F.col("ca").cast(_DEC)).alias("n1"),
        F.sum((F.col("ct") - F.col("ca")).cast(_DEC)).alias("n2"),
    )
    num = F.col("r2a") - F.col("n1") * (F.col("n1") + 1) - F.col("n1") * F.col("n2")
    nn = F.col("n1") * F.col("n2")
    anum = F.abs(num)
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.round(num.cast("double") / nn.cast("double"), 6).alias("cliffs_delta"),
        F.when(anum * 1000 < nn * 147, F.lit("negligible"))
        .when(anum * 1000 < nn * 330, F.lit("small"))
        .when(anum * 1000 < nn * 474, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    ).orderBy("type_a", "type_b")


ORACLES["cliffs_delta_pairs"] = """
    WITH ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    grid AS (
        SELECT event_type, vc, count(*) AS cnt FROM ev GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM grid),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM types a, types b WHERE a.event_type < b.event_type
    ),
    cell AS (
        SELECT p.ta, p.tb, g.vc, sum(g.cnt) AS ct,
               sum(CASE WHEN g.event_type = p.ta THEN g.cnt ELSE 0 END) AS ca
        FROM grid g JOIN pairs p
          ON g.event_type = p.ta OR g.event_type = p.tb
        GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT ta, tb, ca, ct,
               CAST(2 * sum(ct) OVER (PARTITION BY ta, tb ORDER BY vc)
                    - ct + 1 AS HUGEINT) AS rank2
        FROM cell
    ),
    agg AS (
        SELECT ta, tb, sum(CAST(ca AS HUGEINT) * rank2) AS r2a,
               CAST(sum(ca) AS HUGEINT) AS n1,
               CAST(sum(ct - ca) AS HUGEINT) AS n2
        FROM ranked GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           round(CAST(r2a - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
                 / CAST(n1 * n2 AS DOUBLE), 6) AS cliffs_delta,
           CASE WHEN abs(r2a - n1 * (n1 + 1) - n1 * n2) * 1000
                     < n1 * n2 * 147 THEN 'negligible'
                WHEN abs(r2a - n1 * (n1 + 1) - n1 * n2) * 1000
                     < n1 * n2 * 330 THEN 'small'
                WHEN abs(r2a - n1 * (n1 + 1) - n1 * n2) * 1000
                     < n1 * n2 * 474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM agg
    ORDER BY 1, 2
"""
QUERIES["cliffs_delta_pairs"] = cliffs_delta_pairs


def effect_size_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d, Hedges' g and Glass's delta for every event-type pair —
    the parametric effect sizes beside cliffs_delta_pairs (ordinal) and
    welch_t_test (significance): HOW BIG is the mean shift in pooled-sd
    units?

    Per-type (n, sum, sumsq) fold exact on the cent grid; each statistic
    is a single float expression of six exact integers (cent units cancel
    in the ratio).  Hedges' small-sample factor 1 - 3/(4N - 9) uses the
    pair's combined N.

    Scale: one reduce of events to the k-row type frame; the pair join is
    a broadcast self-join of that frame.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("vc").cast(_DEC)).alias("s"),
        F.sum((F.col("vc") * F.col("vc")).cast(_DEC)).alias("q"),
    )
    a = per.select(
        F.col("event_type").alias("ta"), F.col("n").alias("n1"),
        F.col("s").alias("s1"), F.col("q").alias("q1"),
    )
    b = per.select(
        F.col("event_type").alias("tb"), F.col("n").alias("n2"),
        F.col("s").alias("s2"), F.col("q").alias("q2"),
    )
    j = a.join(F.broadcast(b), F.col("ta") < F.col("tb"))
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    ss1 = (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")).cast("double") / n1
    ss2 = (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2")).cast("double") / n2
    sp = F.sqrt((ss1 + ss2) / (n1 + n2 - 2.0))
    sd1 = F.sqrt(ss1 / (n1 - 1.0))
    d = (m1 - m2) / sp
    g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
    return j.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.round(d, 6).alias("cohen_d"),
        F.round(g, 6).alias("hedges_g"),
        F.round((m1 - m2) / sd1, 6).alias("glass_delta"),
    ).orderBy("type_a", "type_b")


ORACLES["effect_size_pairs"] = """
    WITH ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    per AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(vc) AS HUGEINT) AS s,
               CAST(sum(CAST(vc AS HUGEINT) * CAST(vc AS HUGEINT))
                    AS HUGEINT) AS q
        FROM ev GROUP BY 1
    ),
    j AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(a.n AS DOUBLE) AS n1, CAST(b.n AS DOUBLE) AS n2,
               CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS m1,
               CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS m2,
               CAST(a.n * a.q - a.s * a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                   AS ss1,
               CAST(b.n * b.q - b.s * b.s AS DOUBLE) / CAST(b.n AS DOUBLE)
                   AS ss2
        FROM per a, per b WHERE a.event_type < b.event_type
    )
    SELECT ta AS type_a, tb AS type_b,
           round((m1 - m2) / sqrt((ss1 + ss2) / (n1 + n2 - 2.0)), 6)
               AS cohen_d,
           round((m1 - m2) / sqrt((ss1 + ss2) / (n1 + n2 - 2.0))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g,
           round((m1 - m2) / sqrt(ss1 / (n1 - 1.0)), 6) AS glass_delta
    FROM j
    ORDER BY 1, 2
"""
QUERIES["effect_size_pairs"] = effect_size_pairs


def partial_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of daily revenue and daily order count with the
    linear time trend partialled out — do busy days pay more than the
    shared growth trend explains?  r_xy.z = (rxy - rxz*ryz) /
    sqrt((1-rxz^2)(1-ryz^2)) over (x=revenue, y=#orders, z=t), with the
    partial-corr t statistic at n-3 df.

    All ten raw moments fold exact in decimal(38,0); each pairwise r and
    the partial r assemble in double (centered products above the decimal
    ceiling stay in double — the mahalanobis rule).

    Scale: one map-side-combined reduce to the calendar-bounded daily
    frame, one aggregate, scalar math.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc"),
            F.count(F.lit(1)).alias("yc"),
        )
        .select(
            F.datediff(F.col("day"), F.lit("1995-01-01")).cast("long").alias("t"),
            "xc",
            "yc",
        )
    )
    agg = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("t").cast(_DEC)).alias("sz"),
        F.sum(F.col("xc").cast(_DEC)).alias("sx"),
        F.sum(F.col("yc").cast(_DEC)).alias("sy"),
        # factors cast BEFORE the multiply: daily cent totals pass 3e9 at
        # 10x sf0.1 and the long square overflows int64 under ANSI mode
        F.sum(F.col("t").cast(_DEC) * F.col("t").cast(_DEC)).alias("szz"),
        F.sum(F.col("xc").cast(_DEC) * F.col("xc").cast(_DEC)).alias("sxx"),
        F.sum(F.col("yc").cast(_DEC) * F.col("yc").cast(_DEC)).alias("syy"),
        F.sum(F.col("t").cast(_DEC) * F.col("xc").cast(_DEC)).alias("szx"),
        F.sum(F.col("t").cast(_DEC) * F.col("yc").cast(_DEC)).alias("szy"),
        F.sum(F.col("xc").cast(_DEC) * F.col("yc").cast(_DEC)).alias("sxy"),
    )
    n = F.col("n")

    def _r(sab, sa, sb, saa, sbb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)).cast("double") / F.sqrt(
            (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
            * (n * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double")
        )

    rxy = _r("sxy", "sx", "sy", "sxx", "syy")
    rxz = _r("szx", "sz", "sx", "szz", "sxx")
    ryz = _r("szy", "sz", "sy", "szz", "syy")
    rp = (rxy - rxz * ryz) / F.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    tp = rp * F.sqrt((n.cast("double") - 3.0) / (1.0 - rp * rp))
    return agg.select(
        n.cast("long").alias("n_days"),
        F.round(rxy, 6).alias("r_xy"),
        F.round(rp, 6).alias("r_partial"),
        F.round(tp, 4).alias("t_partial"),
        F.when(F.abs(tp) > 1.96, F.lit("correlated_beyond_trend"))
        .otherwise(F.lit("trend_explains"))
        .alias("verdict"),
    )


ORACLES["partial_corr_daily"] = """
    WITH daily AS (
        SELECT CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc,
               count(*) AS yc
        FROM orders GROUP BY o_orderdate
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(t) AS HUGEINT) AS sz, CAST(sum(xc) AS HUGEINT) AS sx,
               CAST(sum(yc) AS HUGEINT) AS sy,
               CAST(sum(t * t) AS HUGEINT) AS szz,
               CAST(sum(xc * xc) AS HUGEINT) AS sxx,
               CAST(sum(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT))
                    AS HUGEINT) AS syy,
               CAST(sum(t * xc) AS HUGEINT) AS szx,
               CAST(sum(t * yc) AS HUGEINT) AS szy,
               CAST(sum(xc * yc) AS HUGEINT) AS sxy
        FROM daily
    ),
    rs AS (
        SELECT n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) AS rxy,
               CAST(n * szx - sz * sx AS DOUBLE)
                   / sqrt(CAST(n * szz - sz * sz AS DOUBLE)
                          * CAST(n * sxx - sx * sx AS DOUBLE)) AS rxz,
               CAST(n * szy - sz * sy AS DOUBLE)
                   / sqrt(CAST(n * szz - sz * sz AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) AS ryz
        FROM agg
    ),
    pp AS (
        SELECT n, rxy,
               (rxy - rxz * ryz)
                   / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) AS rp
        FROM rs
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(rxy, 6) AS r_xy,
           round(rp, 6) AS r_partial,
           round(rp * sqrt((CAST(n AS DOUBLE) - 3.0) / (1.0 - rp * rp)), 4)
               AS t_partial,
           CASE WHEN abs(rp * sqrt((CAST(n AS DOUBLE) - 3.0)
                                   / (1.0 - rp * rp))) > 1.96
                THEN 'correlated_beyond_trend'
                ELSE 'trend_explains' END AS verdict
    FROM pp
"""
QUERIES["partial_corr_daily"] = partial_corr_daily


CRONBACH_YEAR = 1997  # pinned full calendar year for the quarterly panel


def cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient treating a
    customer's four 1997 quarterly spends as k=4 repeated "items" — do
    quarterly spends measure one stable trait (spend propensity)?  The
    reliability companion of cohort_ltv (level) and rfm_segmentation
    (segmentation).

    Subjects are customers with >= 1 order in CRONBACH_YEAR; a quarter
    with no orders is a true zero (no imputation).  alpha = k/(k-1) *
    (1 - sum var_i / var_total): with k FIXED at 4 the item-variance sum
    is a single expression of eight exact decimal cent moments — no
    k-row float fold at all.

    Scale: one conditional-sum reduce of orders to the customer panel,
    one aggregate over it.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == CRONBACH_YEAR
    )
    q = F.quarter("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    panel = o.groupBy("o_custkey").agg(
        *[
            F.sum(F.when(q == i, cents).otherwise(0)).cast(_DEC).alias(f"s{i}")
            for i in (1, 2, 3, 4)
        ]
    )
    tot = sum(F.col(f"s{i}") for i in (1, 2, 3, 4))
    agg = panel.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        *[F.sum(F.col(f"s{i}")).alias(f"u{i}") for i in (1, 2, 3, 4)],
        *[
            F.sum(F.col(f"s{i}") * F.col(f"s{i}")).alias(f"v{i}")
            for i in (1, 2, 3, 4)
        ],
        F.sum(tot).alias("ut"),
        F.sum(tot * tot).alias("vt"),
    )
    n = F.col("n")

    def var(u, v):  # n-scaled sample variance numerator, double
        return (n * F.col(v) - F.col(u) * F.col(u)).cast("double")

    item_vars = var("u1", "v1") + var("u2", "v2") + var("u3", "v3") + var(
        "u4", "v4"
    )
    tot_var = var("ut", "vt")
    alpha = (4.0 / 3.0) * (1.0 - item_vars / tot_var)
    denom = (n * (n - 1)).cast("double") * 10000.0  # cents^2 -> dollars^2
    return agg.select(
        n.cast("long").alias("n_subjects"),
        F.lit(4).cast("int").alias("k_items"),
        F.round(alpha, 6).alias("alpha"),
        F.round(item_vars / denom, 2).alias("sum_item_var"),
        F.round(tot_var / denom, 2).alias("total_var"),
    )


ORACLES["cronbach_alpha"] = f"""
    WITH panel AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 1
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s1,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 2
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s2,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 3
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s3,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 4
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s4
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = {CRONBACH_YEAR}
        GROUP BY 1
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(s1) AS u1, sum(s2) AS u2, sum(s3) AS u3, sum(s4) AS u4,
               sum(s1 * s1) AS v1, sum(s2 * s2) AS v2, sum(s3 * s3) AS v3,
               sum(s4 * s4) AS v4,
               sum(s1 + s2 + s3 + s4) AS ut,
               sum((s1 + s2 + s3 + s4) * (s1 + s2 + s3 + s4)) AS vt
        FROM panel
    ),
    parts AS (
        SELECT n,
               CAST(n * v1 - u1 * u1 AS DOUBLE)
               + CAST(n * v2 - u2 * u2 AS DOUBLE)
               + CAST(n * v3 - u3 * u3 AS DOUBLE)
               + CAST(n * v4 - u4 * u4 AS DOUBLE) AS iv,
               CAST(n * vt - ut * ut AS DOUBLE) AS tv
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_subjects, CAST(4 AS INTEGER) AS k_items,
           round((4.0 / 3.0) * (1.0 - iv / tv), 6) AS alpha,
           round(iv / (CAST(n * (n - 1) AS DOUBLE) * 10000.0), 2)
               AS sum_item_var,
           round(tv / (CAST(n * (n - 1) AS DOUBLE) * 10000.0), 2)
               AS total_var
    FROM parts
"""
QUERIES["cronbach_alpha"] = cronbach_alpha


# --------------------------------------------------------------------------
# wave BC — robust trend (Huber IRLS, 2 unrolled steps)
# --------------------------------------------------------------------------

HUBER_K = 1.345  # 95%-efficiency tuning constant
HUBER_MAD_C = 1.4826  # MAD -> sigma consistency factor


def huber_irls_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimate of the daily-revenue trend slope via TWO
    unrolled IRLS steps (the logistic_newton_fit static-DAG precedent) —
    the outlier-resistant companion of trend_fit (OLS, blows up on one
    spike day) and theil_sen_trend (median-based, quadratic in days):
    weights w = min(1, k*s/|e|) with the scale s = 1.4826 * MAD fixed
    from the OLS residuals (fixed-scale IRLS, documented).

    Determinism: the MAD is an exact lower-median rank pick on the
    rounded-cent |residual| grid (integer-div rank); weights micro-round
    to 1e-6 integers so all five weighted moments fold exact in
    decimal(38,0) and each step's slope/intercept is a single float
    expression of them.

    Scale: the calendar-bounded daily frame; each IRLS step is one
    aggregate plus a 1-row broadcast.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    # materialize the calendar-bounded daily frame once: it feeds the OLS
    # moments, the residual/MAD grid, and both IRLS steps (measured r11:
    # 1,665-line / 146-Exchange / 42-SortMergeJoin plan un-truncated)
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc"))
        .select(
            "day",
            F.datediff(F.col("day"), F.lit("1995-01-01")).cast("long").alias("t"),
            "xc",
        )
        .localCheckpoint(eager=True)
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("t").cast(_DEC)).alias("st"),
        F.sum(F.col("xc").cast(_DEC)).alias("sx"),
        F.sum((F.col("t") * F.col("xc")).cast(_DEC)).alias("stx"),
        F.sum((F.col("t") * F.col("t")).cast(_DEC)).alias("stt"),
    )
    b0 = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")).cast(
        "double"
    ) / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    a0 = (F.col("sx").cast("double") - b0 * F.col("st").cast("double")) / F.col(
        "n"
    ).cast("double")
    # 1-row lineage cuts (fit0 / mad / s1 below): each is referenced 2-3
    # times downstream and would re-expand its aggregate tree per
    # reference (plan stayed at 102 Exchanges with only the daily cut)
    fit0 = mom.select(b0.alias("b0"), a0.alias("a0")).localCheckpoint(
        eager=True
    )
    res = daily.crossJoin(F.broadcast(fit0)).withColumn(
        "ae",
        F.round(
            F.abs(F.col("xc").cast("double") - F.col("a0") - F.col("b0") * F.col("t"))
        ).cast("long"),
    )
    grid = res.groupBy("ae").agg(F.count(F.lit(1)).alias("cnt"))
    tot = grid.agg(F.sum("cnt").alias("nn"))
    wv = Window.partitionBy().orderBy("ae")
    mad = (
        grid.withColumn("cum", F.sum("cnt").over(wv))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.expr("(nn + 1) div 2"))
        .orderBy("ae")
        .limit(1)
        .select((F.col("ae").cast("double") * HUBER_MAD_C).alias("s"))
        .localCheckpoint(eager=True)
    )

    def step(frame, a_col, b_col):
        e = F.col("xc").cast("double") - F.col(a_col) - F.col(b_col) * F.col("t")
        w = F.when(
            F.abs(e) <= F.lit(HUBER_K) * F.col("s"), F.lit(1.0)
        ).otherwise(F.lit(HUBER_K) * F.col("s") / F.abs(e))
        wi = F.round(w * 1e6).cast("long")
        wf = frame.withColumn("wi", wi)
        agg = wf.agg(
            F.sum(F.col("wi").cast(_DEC)).alias("sw"),
            F.sum((F.col("wi") * F.col("t")).cast(_DEC)).alias("swt"),
            F.sum((F.col("wi") * F.col("t") * F.col("t")).cast(_DEC)).alias("swtt"),
            F.sum(F.col("wi").cast(_DEC) * F.col("xc").cast(_DEC)).alias("swx"),
            F.sum(
                (F.col("wi") * F.col("t")).cast(_DEC) * F.col("xc").cast(_DEC)
            ).alias("swtx"),
            F.sum(F.when(F.col("wi") < 1000000, 1).otherwise(0))
            .cast("long")
            .alias("n_down"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        bh = (
            F.col("sw") * F.col("swtx") - F.col("swt") * F.col("swx")
        ).cast("double") / (
            F.col("sw") * F.col("swtt") - F.col("swt") * F.col("swt")
        ).cast("double")
        ah = (F.col("swx").cast("double") - bh * F.col("swt").cast("double")) / F.col(
            "sw"
        ).cast("double")
        return agg.select(
            bh.alias("bh"), ah.alias("ah"), "n_down", "n_days"
        )

    base = res.crossJoin(F.broadcast(mad))
    s1 = step(base, "a0", "b0").localCheckpoint(eager=True)
    base2 = (
        daily.crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(s1.select(
            F.col("bh").alias("b1"), F.col("ah").alias("a1"),
            F.col("n_down").alias("nd1"),
        )))
    )
    s2 = step(base2, "a1", "b1")
    out = (
        s2.crossJoin(F.broadcast(fit0))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(s1.select(F.col("n_down").alias("nd1"))))
    )
    return out.select(
        F.col("n_days"),
        F.round(F.col("b0") / 100.0, 6).alias("ols_slope_usd"),
        F.round(F.col("bh") / 100.0, 6).alias("huber_slope_usd"),
        F.round(F.col("s") / 100.0, 2).alias("scale_mad_usd"),
        F.round(
            F.col("nd1").cast("double") / F.col("n_days").cast("double"), 4
        ).alias("frac_downweighted"),
    )


ORACLES["huber_irls_trend"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1, 2
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(t) AS HUGEINT) AS st,
               CAST(sum(xc) AS HUGEINT) AS sx,
               CAST(sum(t * xc) AS HUGEINT) AS stx,
               CAST(sum(t * t) AS HUGEINT) AS stt
        FROM daily
    ),
    fit0 AS (
        SELECT CAST(n * stx - st * sx AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b0,
               (CAST(sx AS DOUBLE)
                - CAST(n * stx - st * sx AS DOUBLE)
                      / CAST(n * stt - st * st AS DOUBLE)
                      * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a0
        FROM mom
    ),
    res AS (
        SELECT day, t, xc,
               CAST(round(abs(CAST(xc AS DOUBLE) - a0 - b0 * t)) AS BIGINT)
                   AS ae
        FROM daily CROSS JOIN fit0
    ),
    grid AS (SELECT ae, count(*) AS cnt FROM res GROUP BY 1),
    tot AS (SELECT sum(cnt) AS nn FROM grid),
    mad AS (
        SELECT CAST(ae AS DOUBLE) * {HUBER_MAD_C} AS s FROM (
            SELECT ae, sum(cnt) OVER (ORDER BY ae) AS cum FROM grid
        ), tot
        WHERE cum >= (nn + 1) // 2
        ORDER BY ae LIMIT 1
    ),
    w1 AS (
        SELECT t, xc,
               CAST(round(1e6 * (CASE WHEN abs(CAST(xc AS DOUBLE) - a0 - b0 * t)
                                           <= {HUBER_K} * s
                                      THEN 1.0
                                      ELSE {HUBER_K} * s
                                           / abs(CAST(xc AS DOUBLE)
                                                 - a0 - b0 * t) END))
                    AS HUGEINT) AS wi
        FROM daily CROSS JOIN fit0 CROSS JOIN mad
    ),
    agg1 AS (
        SELECT sum(wi) AS sw, sum(wi * t) AS swt, sum(wi * t * t) AS swtt,
               sum(wi * xc) AS swx, sum(wi * t * xc) AS swtx,
               CAST(sum(CASE WHEN wi < 1000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down,
               CAST(count(*) AS BIGINT) AS n_days
        FROM w1
    ),
    fit1 AS (
        SELECT CAST(sw * swtx - swt * swx AS DOUBLE)
                   / CAST(sw * swtt - swt * swt AS DOUBLE) AS b1,
               (CAST(swx AS DOUBLE)
                - CAST(sw * swtx - swt * swx AS DOUBLE)
                      / CAST(sw * swtt - swt * swt AS DOUBLE)
                      * CAST(swt AS DOUBLE)) / CAST(sw AS DOUBLE) AS a1,
               n_down, n_days
        FROM agg1
    ),
    w2 AS (
        SELECT t, xc,
               CAST(round(1e6 * (CASE WHEN abs(CAST(xc AS DOUBLE) - a1 - b1 * t)
                                           <= {HUBER_K} * s
                                      THEN 1.0
                                      ELSE {HUBER_K} * s
                                           / abs(CAST(xc AS DOUBLE)
                                                 - a1 - b1 * t) END))
                    AS HUGEINT) AS wi
        FROM daily CROSS JOIN fit1 CROSS JOIN mad
    ),
    agg2 AS (
        SELECT sum(wi) AS sw, sum(wi * t) AS swt, sum(wi * t * t) AS swtt,
               sum(wi * xc) AS swx, sum(wi * t * xc) AS swtx
        FROM w2
    )
    SELECT f1.n_days,
           round(f0.b0 / 100.0, 6) AS ols_slope_usd,
           round(CAST(a2.sw * a2.swtx - a2.swt * a2.swx AS DOUBLE)
                 / CAST(a2.sw * a2.swtt - a2.swt * a2.swt AS DOUBLE)
                 / 100.0, 6) AS huber_slope_usd,
           round(m.s / 100.0, 2) AS scale_mad_usd,
           round(CAST(f1.n_down AS DOUBLE) / CAST(f1.n_days AS DOUBLE), 4)
               AS frac_downweighted
    FROM agg2 a2 CROSS JOIN fit0 f0 CROSS JOIN mad m CROSS JOIN fit1 f1
"""
QUERIES["huber_irls_trend"] = huber_irls_trend


# --------------------------------------------------------------------------
# wave BE — ordinal association + directed information flow
# --------------------------------------------------------------------------

BAND_CENTS = 10_000_000  # 100k-USD order-value bands, capped at band 4


def ordinal_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma, Somers' d (both directions) and Kendall
    tau-b between order PRIORITY (ordinal 1-URGENT..5-LOW) and order
    VALUE BAND (fixed 100k-USD bands) — the ordinal-x-ordinal
    association row the engine lacks (kendall_tau_pairs ranks two
    continuous daily series; this handles tied, banded categories,
    where gamma/Somers/tau-b differ precisely in how they treat ties).

    Everything reduces to the <=25-cell contingency table, and ALL pair
    counts are exact integers computed from cell-count products folded
    in decimal(38,0) (n1*n2 overflows int64 once cells pass ~3e9 rows):
    C (concordant), D (discordant), Tx (tied on priority only), Ty
    (tied on band only).  gamma = (C-D)/(C+D); d_band_given_pr =
    (C-D)/(C+D+Ty); d_pr_given_band = (C-D)/(C+D+Tx); tau_b =
    (C-D)/sqrt((C+D+Tx)(C+D+Ty)).  Four float divisions total.

    Scale: one map-side-combined reduce to 25 cells; the pair pass is a
    broadcast nested-loop over 25x25.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("pr"),
        F.least(
            F.lit(4),
            (F.round(F.col("o_totalprice") * 100).cast("long") / F.lit(BAND_CENTS))
            .cast("long"),
        ).alias("band"),
    )
    cells = o.groupBy("pr", "band").agg(F.count(F.lit(1)).cast(_DEC).alias("n"))
    a = cells.select(
        F.col("pr").alias("p1"), F.col("band").alias("b1"), F.col("n").alias("n1")
    )
    b = cells.select(
        F.col("pr").alias("p2"), F.col("band").alias("b2"), F.col("n").alias("n2")
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(
        (F.col("p2") > F.col("p1"))
        | ((F.col("p2") == F.col("p1")) & (F.col("b2") > F.col("b1")))
    )
    prod = F.col("n1") * F.col("n2")
    agg = pairs.agg(
        F.sum(
            F.when((F.col("p2") > F.col("p1")) & (F.col("b2") > F.col("b1")), prod)
        ).alias("c"),
        F.sum(
            F.when((F.col("p2") > F.col("p1")) & (F.col("b2") < F.col("b1")), prod)
        ).alias("d"),
        F.sum(
            F.when((F.col("p2") == F.col("p1")) & (F.col("b2") > F.col("b1")), prod)
        ).alias("tx"),
        F.sum(
            F.when((F.col("p2") > F.col("p1")) & (F.col("b2") == F.col("b1")), prod)
        ).alias("ty"),
    )
    c = F.col("c").cast("double")
    d = F.col("d").cast("double")
    tx = F.col("tx").cast("double")
    ty = F.col("ty").cast("double")
    return agg.select(
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round((c - d) / (c + d), 6).alias("gk_gamma"),
        F.round((c - d) / (c + d + ty), 6).alias("somers_d_band_given_pr"),
        F.round((c - d) / (c + d + tx), 6).alias("somers_d_pr_given_band"),
        F.round(
            (c - d) / F.sqrt((c + d + tx) * (c + d + ty)), 6
        ).alias("kendall_tau_b"),
    )


ORACLES["ordinal_concordance"] = f"""
    WITH o AS (
        SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS pr,
               least(4, CAST(round(o_totalprice * 100) AS BIGINT)
                        // {BAND_CENTS}) AS band
        FROM orders
    ),
    cells AS (
        SELECT pr, band, CAST(count(*) AS HUGEINT) AS n FROM o GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.pr AS p1, a.band AS b1, a.n AS n1,
               b.pr AS p2, b.band AS b2, b.n AS n2
        FROM cells a, cells b
        WHERE b.pr > a.pr OR (b.pr = a.pr AND b.band > a.band)
    ),
    agg AS (
        SELECT sum(CASE WHEN p2 > p1 AND b2 > b1 THEN n1 * n2 END) AS c,
               sum(CASE WHEN p2 > p1 AND b2 < b1 THEN n1 * n2 END) AS d,
               sum(CASE WHEN p2 = p1 AND b2 > b1 THEN n1 * n2 END) AS tx,
               sum(CASE WHEN p2 > p1 AND b2 = b1 THEN n1 * n2 END) AS ty
        FROM pairs
    )
    SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           round(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 6) AS gk_gamma,
           round(CAST(c - d AS DOUBLE) / CAST(c + d + ty AS DOUBLE), 6)
               AS somers_d_band_given_pr,
           round(CAST(c - d AS DOUBLE) / CAST(c + d + tx AS DOUBLE), 6)
               AS somers_d_pr_given_band,
           round(CAST(c - d AS DOUBLE)
                 / sqrt(CAST(c + d + tx AS DOUBLE)
                        * CAST(c + d + ty AS DOUBLE)), 6) AS kendall_tau_b
    FROM agg
"""
QUERIES["ordinal_concordance"] = ordinal_concordance


TE_SCALE = 1_000_000_000_000  # 1e-12 per-cell term grid


def transfer_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 transfer entropy between the daily ORDER-COUNT series and
    the daily REVENUE series, both quantized to terciles: TE(X->Y) =
    (1/N) sum over (y_t, y_lag, x_lag) cells of
    c3 * ln(c3 * c1(y_lag) / (c2(y_lag,x_lag) * c2(y_t,y_lag))) — the
    DIRECTED companion of mutual_information and granger_leadlag
    (Granger is linear; TE captures any lagged dependence on the
    quantized grid).  Both directions reported; net > 0 means
    order-count leads revenue beyond what revenue's own history gives.

    Determinism: terciles are integer-div rank picks on the total order
    (value, day); every cell/marginal count is an exact integer, each
    of the <=27 per-cell terms is ONE float ln expression of four
    integers rounded to the 1e-12 grid, and the fold sums integers in
    decimal(38,0).

    Scale: one reduce to the calendar-bounded daily frame (~2,400 rows
    at ANY corpus size); ranks/lags on that bounded frame; marginals
    from the 27-cell frame, never a rescan.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc"),
        F.count(F.lit(1)).alias("oc"),
    )
    n = daily.count()  # scalar witness of a bounded frame (calendar days)
    wx = Window.orderBy("xc", "day")
    wo = Window.orderBy("oc", "day")
    wd = Window.orderBy("day")
    q = (
        daily.withColumn(
            "qy", ((F.row_number().over(wx) - 1) * 3 / F.lit(n)).cast("long")
        )
        .withColumn(
            "qx", ((F.row_number().over(wo) - 1) * 3 / F.lit(n)).cast("long")
        )
        .select(
            "day",
            "qx",
            "qy",
            F.lag("qx").over(wd).alias("qxl"),
            F.lag("qy").over(wd).alias("qyl"),
        )
        .filter(F.col("qxl").isNotNull())
        # calendar-bounded; consumed by BOTH transfer directions, whose
        # 27-cell contingency trees each re-expand it ~5x (c3 feeds
        # c1/c2a/c2b/tot/j) — measured r11: 58-Exchange plan un-cut
        .localCheckpoint(eager=True)
    )

    def _te(df, tgt, tgt_lag, src_lag):
        c3 = df.groupBy(
            F.col(tgt).alias("t"),
            F.col(tgt_lag).alias("tl"),
            F.col(src_lag).alias("sl"),
        ).agg(F.count(F.lit(1)).alias("c3"))
        c1 = c3.groupBy("tl").agg(F.sum("c3").alias("c1"))
        c2a = c3.groupBy("tl", "sl").agg(F.sum("c3").alias("c2a"))
        c2b = c3.groupBy("t", "tl").agg(F.sum("c3").alias("c2b"))
        tot = c3.agg(F.sum("c3").alias("nn"))
        j = (
            c3.join(F.broadcast(c1), "tl")
            .join(F.broadcast(c2a), ["tl", "sl"])
            .join(F.broadcast(c2b), ["t", "tl"])
            .crossJoin(F.broadcast(tot))
        )
        term = F.round(
            F.col("c3").cast("double")
            * F.log(
                F.col("c3").cast("double")
                * F.col("c1").cast("double")
                / (F.col("c2a").cast("double") * F.col("c2b").cast("double"))
            )
            * F.lit(TE_SCALE),
        ).cast("long").cast(_DEC)
        return j.agg(
            (F.sum(term).cast("double") / F.lit(TE_SCALE) / F.max("nn")).alias(
                "te"
            ),
            F.max("nn").alias("nn"),
        )
    xy = _te(q, "qy", "qyl", "qxl").select(
        F.col("nn").alias("n_transitions"), F.round("te", 8).alias("te_count_to_revenue")
    )
    yx = _te(q, "qx", "qxl", "qyl").select(F.round("te", 8).alias("te_revenue_to_count"))
    out = xy.crossJoin(F.broadcast(yx))
    return out.select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        "te_count_to_revenue",
        "te_revenue_to_count",
        F.round(
            F.col("te_count_to_revenue") - F.col("te_revenue_to_count"), 8
        ).alias("te_net"),
    )


def _te_oracle() -> str:
    te_cte = """
    c3_{d} AS (
        SELECT {t} AS t, {tl} AS tl, {sl} AS sl, count(*) AS c3
        FROM lagged GROUP BY 1, 2, 3
    ),
    c1_{d} AS (SELECT tl, sum(c3) AS c1 FROM c3_{d} GROUP BY 1),
    c2a_{d} AS (SELECT tl, sl, sum(c3) AS c2a FROM c3_{d} GROUP BY 1, 2),
    c2b_{d} AS (SELECT t, tl, sum(c3) AS c2b FROM c3_{d} GROUP BY 1, 2),
    tot_{d} AS (SELECT sum(c3) AS nn FROM c3_{d}),
    te_{d} AS (
        SELECT CAST(sum(CAST(round(CAST(c3 AS DOUBLE)
                   * ln(CAST(c3 AS DOUBLE) * CAST(c1 AS DOUBLE)
                        / (CAST(c2a AS DOUBLE) * CAST(c2b AS DOUBLE)))
                   * {SCALE} ) AS BIGINT)) AS DOUBLE) / {SCALE}
                   / (SELECT nn FROM tot_{d}) AS te,
               (SELECT nn FROM tot_{d}) AS nn
        FROM c3_{d}
        JOIN c1_{d} USING (tl) JOIN c2a_{d} USING (tl, sl)
        JOIN c2b_{d} USING (t, tl)
    )"""
    return (
        """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc,
               count(*) AS oc
        FROM orders GROUP BY 1
    ),
    n AS (SELECT count(*) AS n FROM daily),
    q AS (
        SELECT day,
               ((row_number() OVER (ORDER BY oc, day) - 1) * 3)
                   // (SELECT n FROM n) AS qx,
               ((row_number() OVER (ORDER BY xc, day) - 1) * 3)
                   // (SELECT n FROM n) AS qy
        FROM daily
    ),
    lagged AS (
        SELECT qx, qy,
               lag(qx) OVER (ORDER BY day) AS qxl,
               lag(qy) OVER (ORDER BY day) AS qyl
        FROM q
        QUALIFY qxl IS NOT NULL
    ),"""
        + te_cte.format(d="xy", t="qy", tl="qyl", sl="qxl", SCALE=TE_SCALE)
        + ","
        + te_cte.format(d="yx", t="qx", tl="qxl", sl="qyl", SCALE=TE_SCALE)
        + """
    SELECT CAST(xy.nn AS BIGINT) AS n_transitions,
           round(xy.te, 8) AS te_count_to_revenue,
           round(yx.te, 8) AS te_revenue_to_count,
           round(round(xy.te, 8) - round(yx.te, 8), 8) AS te_net
    FROM te_xy xy, te_yx yx
"""
    )


ORACLES["transfer_entropy_daily"] = _te_oracle()
QUERIES["transfer_entropy_daily"] = transfer_entropy_daily


def panel_fe_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within (fixed-effects) estimator of the order-value time trend
    with customer fixed effects, beside the pooled OLS slope — the
    panel-data companion of simpson_reversal_detect and cmh_pooled_odds
    (does the trend survive once stable between-customer level
    differences are absorbed?).

    slope_FE = sum_i (n_i*Sxy_i - Sx_i*Sy_i)/n_i
             / sum_i (n_i*Sxx_i - Sx_i^2)/n_i — each customer's two
    numerators are exact decimal(38,0) folds of day-index x cent
    products; the ONE division per customer is pico-rounded (1e-6)
    before the global decimal fold (the tukey_hsd within-SS pattern),
    so both engines sum identical grids.  Pooled OLS comes from the
    same global moments.  Customers with a single order contribute
    exact zeros to both sums (n*Sxy - SxSy = 0), never a null.

    Scale: one groupBy of orders on o_custkey; the global fold is a
    second reduce over the customer frame.  No windows, no joins.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("yc"),
    )
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast(_DEC).alias("ni"),
        F.sum(F.col("t").cast(_DEC)).alias("sx"),
        F.sum(F.col("yc").cast(_DEC)).alias("sy"),
        F.sum((F.col("t") * F.col("yc")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("t") * F.col("t")).cast(_DEC)).alias("sxx"),
    )
    num_i = F.round(
        (F.col("ni") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / F.col("ni").cast("double"),
        6,
    ).cast("decimal(38,6)")
    den_i = F.round(
        (F.col("ni") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        / F.col("ni").cast("double"),
        6,
    ).cast("decimal(38,6)")
    agg = per.agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(num_i).alias("fe_num"),
        F.sum(den_i).alias("fe_den"),
        F.sum("ni").alias("n"),
        F.sum("sx").alias("gsx"),
        F.sum("sy").alias("gsy"),
        F.sum("sxy").alias("gsxy"),
        F.sum("sxx").alias("gsxx"),
    )
    slope_fe = F.col("fe_num").cast("double") / F.col("fe_den").cast("double")
    slope_pooled = (
        F.col("n") * F.col("gsxy") - F.col("gsx") * F.col("gsy")
    ).cast("double") / (
        F.col("n") * F.col("gsxx") - F.col("gsx") * F.col("gsx")
    ).cast("double")
    return agg.select(
        F.col("n_cust").cast("long").alias("n_customers"),
        F.col("n").cast("long").alias("n_orders"),
        # cents/day -> dollars/year for a readable magnitude
        F.round(slope_fe * 365.25 / 100.0, 6).alias("fe_dollars_per_year"),
        F.round(slope_pooled * 365.25 / 100.0, 6).alias(
            "pooled_dollars_per_year"
        ),
        F.round((slope_fe - slope_pooled) * 365.25 / 100.0, 6).alias(
            "fe_minus_pooled"
        ),
    )


ORACLES["panel_fe_trend"] = """
    WITH o AS (
        SELECT o_custkey,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               CAST(round(o_totalprice * 100) AS BIGINT) AS yc
        FROM orders
    ),
    per AS (
        SELECT o_custkey, CAST(count(*) AS HUGEINT) AS ni,
               CAST(sum(t) AS HUGEINT) AS sx,
               CAST(sum(yc) AS HUGEINT) AS sy,
               CAST(sum(CAST(t AS HUGEINT) * yc) AS HUGEINT) AS sxy,
               CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx
        FROM o GROUP BY 1
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cust,
               sum(CAST(round(CAST(ni * sxy - sx * sy AS DOUBLE)
                              / CAST(ni AS DOUBLE), 6)
                        AS DECIMAL(38,6))) AS fe_num,
               sum(CAST(round(CAST(ni * sxx - sx * sx AS DOUBLE)
                              / CAST(ni AS DOUBLE), 6)
                        AS DECIMAL(38,6))) AS fe_den,
               sum(ni) AS n, sum(sx) AS gsx, sum(sy) AS gsy,
               sum(sxy) AS gsxy, sum(sxx) AS gsxx
        FROM per
    )
    SELECT n_cust AS n_customers, CAST(n AS BIGINT) AS n_orders,
           round(CAST(fe_num AS DOUBLE) / CAST(fe_den AS DOUBLE)
                 * 365.25 / 100.0, 6) AS fe_dollars_per_year,
           round(CAST(n * gsxy - gsx * gsy AS DOUBLE)
                 / CAST(n * gsxx - gsx * gsx AS DOUBLE)
                 * 365.25 / 100.0, 6) AS pooled_dollars_per_year,
           round((CAST(fe_num AS DOUBLE) / CAST(fe_den AS DOUBLE)
                  - CAST(n * gsxy - gsx * gsy AS DOUBLE)
                    / CAST(n * gsxx - gsx * gsx AS DOUBLE))
                 * 365.25 / 100.0, 6) AS fe_minus_pooled
    FROM agg
"""
QUERIES["panel_fe_trend"] = panel_fe_trend


def cooks_distance_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's-distance influence screen on the daily-revenue OLS trend —
    the INFLUENCE member of the regression battery (jarque_bera tests
    residual shape, breusch_pagan their variance, durbin_watson their
    correlation, chow their stability; none says WHICH days drive the
    fit).  Top 10 days by D_i with leverage, residual, and the 4/n flag.

    Exact machinery: with Dx = n*Sxx - Sx^2 and Nb = n*Sxy - Sx*Sy, the
    residual numerator E_i = n*Dx*y_i - Dx*Sy + Nb*Sx - n*Nb*x_i and the
    leverage numerator H_i = Dx + (n*x_i - Sx)^2 are EXACT decimal
    integers over the common denominator n*Dx, so e_i / h_ii / s^2 / D_i
    evaluate as identical double expressions of identical integers in
    both engines (E_i^2 would overflow decimal(38) at bench scale — the
    SSE instead folds via the moment identity
    n*sum e^2 = (n*Syy - Sy^2) - Nb^2/Dx with Nb squared in double).

    Scale: one reduce to the calendar-bounded daily frame, one 1-row
    broadcast, one TakeOrderedAndProject top-10.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast(_DEC)
        .alias("y")
    ).withColumn(
        "x",
        F.datediff(F.col("day"), F.lit("1995-01-01")).cast("long").cast(_DEC),
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    j = daily.crossJoin(F.broadcast(mom))
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    nb = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    e_num = (
        F.col("n") * dx * F.col("y")
        - dx * F.col("sy")
        + nb * F.col("sx")
        - F.col("n") * nb * F.col("x")
    ).cast("double")
    h_num = (dx + (F.col("n") * F.col("x") - F.col("sx"))
             * (F.col("n") * F.col("x") - F.col("sx"))).cast("double")
    ndx = (F.col("n") * dx).cast("double")
    nd = F.col("n").cast("double")
    e = e_num / ndx
    h = h_num / ndx
    sse_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    ) - nb.cast("double") * nb.cast("double") / dx.cast("double")
    s2 = sse_n / (nd * (nd - 2.0))
    d = e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
    ranked = j.select(
        "day",
        F.round(e / 100.0, 2).alias("residual_dollars"),
        F.round(h, 6).alias("leverage"),
        F.round(d, 6).alias("cooks_d"),
        (d > 4.0 / nd).alias("influential_4n"),
    )
    return ranked.orderBy(F.col("cooks_d").desc(), "day").limit(10)


ORACLES["cooks_distance_screen"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS y,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM daily
    ),
    j AS (
        SELECT day, x, y, n, sx, sy, sxy, sxx, syy,
               n * sxx - sx * sx AS dx,
               n * sxy - sx * sy AS nb
        FROM daily, mom
    ),
    terms AS (
        SELECT day,
               CAST(n * dx * y - dx * sy + nb * sx - n * nb * x AS DOUBLE)
                   / CAST(n * dx AS DOUBLE) AS e,
               CAST(dx + (n * x - sx) * (n * x - sx) AS DOUBLE)
                   / CAST(n * dx AS DOUBLE) AS h,
               (CAST(n * syy - sy * sy AS DOUBLE)
                - CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                  / CAST(dx AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 2.0)) AS s2,
               CAST(n AS DOUBLE) AS nd
        FROM j
    )
    SELECT day, round(e / 100.0, 2) AS residual_dollars,
           round(h, 6) AS leverage,
           round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
               AS cooks_d,
           e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) > 4.0 / nd
               AS influential_4n
    FROM terms
    ORDER BY round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
             DESC, day
    LIMIT 10
"""
QUERIES["cooks_distance_screen"] = cooks_distance_screen
