"""Financial-risk / actuarial / forecast-accuracy tier (DRIVER surface)
— wave AY.

Treats the daily-revenue series as a P&L stream and the order->ship
pipeline as a claims-development process:

- ``var_cvar_daily``: historical 95% Value-at-Risk and Expected
  Shortfall of day-over-day revenue returns.  Returns live on a pico
  (1e-9) integer grid — the ratio (x_t - x_{t-1}) / x_{t-1} is a single
  float expression of two exact longs, rounded once — so the tail pick
  is an exact-integer rank selection and the tail mean an exact-integer
  division (no float accumulates across rows).
- ``sortino_sharpe_daily``: annualized Sharpe and Sortino (target 0) on
  the same pico-grid returns from exact decimal moments.
- ``chain_ladder_ultimates``: classic chain-ladder loss development on
  the (order-month cohort x ship-lag age) triangle.  Age-to-age factors
  are ratios of exact integer column sums (cohorts censored at the
  as-of diagonal); per-cohort ultimates apply the remaining factors via
  a pico-rounded ln fold (the bartlett_test k-term pattern — never an
  order-sensitive float sum).
- ``theil_u2_forecast``: Theil's U2 of the lag-7 seasonal-naive
  forecast against the lag-1 naive benchmark — the ratio companion of
  seasonal_naive_mase, on exact squared cent differences.
- ``pettitt_changepoint``: rank-based (Mann-Whitney-type) changepoint
  on daily revenue.  Doubled midranks over the value grid keep every
  U_t exact; K = max |U_t| picks its day deterministically and the
  closed-form significance approximation is one float expression.

Scale: every operator reduces facts ONCE to the calendar-bounded daily
frame or the (cohort x age) triangle (months x <=7 ages); windows run on
those bounded frames only.  Reference parity: driver-mandated analytics
surface (the reference pipeline has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DEC = "decimal(38,0)"

# pico-grid daily returns CTE shared by the two risk oracles
_RET_CTE = """
    daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT day, xc, lag(xc) OVER (ORDER BY day) AS x1 FROM daily
    ),
    ret AS (
        SELECT day,
               CAST(round((CAST(xc AS DOUBLE) - CAST(x1 AS DOUBLE))
                          / CAST(x1 AS DOUBLE) * 1e9) AS HUGEINT) AS rp
        FROM lagged WHERE x1 IS NOT NULL AND x1 > 0
    )
"""


def _daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, rp): day-over-day revenue return on the exact pico grid."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    wn = Window.partitionBy().orderBy("day")
    return (
        daily.withColumn("x1", F.lag("xc").over(wn))
        .filter(F.col("x1").isNotNull() & (F.col("x1") > 0))
        .select(
            "day",
            F.round(
                (F.col("xc").cast("double") - F.col("x1").cast("double"))
                / F.col("x1").cast("double")
                * 1e9
            )
            .cast("long")
            .alias("rp"),
        )
    )


def var_cvar_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% VaR and CVaR (Expected Shortfall) of daily revenue
    returns: VaR = -r_(k) with k = max(1, floor(0.05 m)) (the exact
    order-statistic pick, (rp, day)-tiebroken), CVaR = -mean of the k
    worst returns as an exact integer division on the pico grid.

    Scale: one reduce to the bounded daily frame, one ordered window,
    one k-row aggregate.
    """
    ret = _daily_returns(spark, sf_dir)
    tot = ret.agg(F.count(F.lit(1)).alias("m"))
    wr = Window.partitionBy().orderBy("rp", "day")
    ranked = (
        ret.withColumn("rn", F.row_number().over(wr))
        .crossJoin(F.broadcast(tot))
        .withColumn("k", F.greatest(F.lit(1), F.expr("(m * 5) div 100")))
    )
    tail = ranked.filter(F.col("rn") <= F.col("k"))
    agg = tail.agg(
        F.max("m").alias("m"),
        F.max("k").alias("k"),
        F.max("rp").cast(_DEC).alias("rk"),  # the k-th smallest return
        F.sum(F.col("rp").cast(_DEC)).alias("srp"),
    )
    return agg.select(
        F.col("m").cast("long").alias("n_obs"),
        F.col("k").cast("long").alias("k_tail"),
        F.round(-F.col("rk").cast("double") / 1e9, 6).alias("var_95"),
        F.round(
            -F.col("srp").cast("double") / (F.col("k").cast("double") * 1e9), 6
        ).alias("cvar_95"),
    )


ORACLES["var_cvar_daily"] = f"""
    WITH {_RET_CTE},
    tot AS (SELECT count(*) AS m FROM ret),
    ranked AS (
        SELECT rp, row_number() OVER (ORDER BY rp, day) AS rn,
               m, greatest(1, (m * 5) // 100) AS k
        FROM ret, tot
    ),
    tail AS (SELECT * FROM ranked WHERE rn <= k),
    agg AS (
        SELECT max(m) AS m, max(k) AS k,
               CAST(max(rp) AS HUGEINT) AS rk,
               CAST(sum(rp) AS HUGEINT) AS srp
        FROM tail
    )
    SELECT CAST(m AS BIGINT) AS n_obs, CAST(k AS BIGINT) AS k_tail,
           round(-CAST(rk AS DOUBLE) / 1e9, 6) AS var_95,
           round(-CAST(srp AS DOUBLE) / (CAST(k AS DOUBLE) * 1e9), 6)
               AS cvar_95
    FROM agg
"""
QUERIES["var_cvar_daily"] = var_cvar_daily


def sortino_sharpe_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratios of daily revenue returns
    (zero benchmark, 365 periods/year): mean and sample sd from exact
    pico-grid decimal moments; the Sortino denominator is the target-0
    downside root-mean-square over ALL observations (full-sample
    convention).  Single float expressions; sqrt(365.0) evaluates
    identically in both engines.

    Scale: one reduce to the bounded daily frame, one aggregate.
    """
    ret = _daily_returns(spark, sf_dir)
    agg = ret.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("rp").cast(_DEC)).alias("s"),
        F.sum((F.col("rp").cast(_DEC) * F.col("rp").cast(_DEC))).alias("q"),
        F.sum(
            F.when(F.col("rp") < 0, F.col("rp").cast(_DEC) * F.col("rp").cast(_DEC))
            .otherwise(F.lit(0).cast(_DEC))
        ).alias("dq"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s").cast("double") / n
    sd = F.sqrt(
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (n * (n - 1.0))
    )
    dd = F.sqrt(F.col("dq").cast("double") / n)
    ann = F.sqrt(F.lit(365.0))
    return agg.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round(mu / 1e9, 8).alias("mean_daily_ret"),
        F.round(sd / 1e9, 8).alias("sd_daily_ret"),
        F.round(mu / sd * ann, 4).alias("sharpe_annual"),
        F.round(mu / dd * ann, 4).alias("sortino_annual"),
    )


ORACLES["sortino_sharpe_daily"] = f"""
    WITH {_RET_CTE},
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(rp) AS s,
               sum(rp * rp) AS q,
               sum(CASE WHEN rp < 0 THEN rp * rp ELSE 0 END) AS dq
        FROM ret
    ),
    parts AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               sqrt(CAST(n * q - s * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd,
               sqrt(CAST(dq AS DOUBLE) / CAST(n AS DOUBLE)) AS dd
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(mu / 1e9, 8) AS mean_daily_ret,
           round(sd / 1e9, 8) AS sd_daily_ret,
           round(mu / sd * sqrt(365.0), 4) AS sharpe_annual,
           round(mu / dd * sqrt(365.0), 4) AS sortino_annual
    FROM parts
"""
QUERIES["sortino_sharpe_daily"] = sortino_sharpe_daily


CL_MAX_AGE = 6  # ship lag is bounded at ~4 months in this data; 6 is slack


def chain_ladder_ultimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development of shipped value: cohort = order month,
    age = ship-month minus order-month (0..CL_MAX_AGE), cell = shipped
    extendedprice cents.  Age-to-age factors f_a = sum C_{a+1} / sum C_a
    over cohorts whose age a+1 lies on or before the as-of diagonal
    (exact integer column sums, one division per factor); each open
    cohort's ultimate = diagonal cum * exp(sum ln f_a) with the ln terms
    pico-rounded into a decimal fold (order-proof).  Reserve = ultimate
    - paid.  The actuarial completion of receivables_aging (which ages
    balances but never projects them).

    Scale: one orders+lineitem join reduced to the (month x age)
    triangle (months x 7 cells); factor and ultimate math runs on that
    bounded frame.  The dense age axis comes from a 7-row broadcast.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.trunc("o_orderdate", "month").alias("cm"),
        (
            (F.year("l_shipdate") - F.year("o_orderdate")) * 12
            + (F.month("l_shipdate") - F.month("o_orderdate"))
        ).alias("age"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    # materialize the (month x age) triangle once: cohorts, the as-of
    # diagonal, and the dense grid all consume it, each otherwise
    # re-running the fact join (measured r11: 86-Exchange plan)
    tri = (
        j.filter((F.col("age") >= 0) & (F.col("age") <= CL_MAX_AGE))
        .groupBy("cm", "age")
        .agg(F.sum(F.col("cents").cast(_DEC)).alias("inc"))
        .localCheckpoint(eager=True)
    )
    ages = spark.range(CL_MAX_AGE + 1).select(F.col("id").cast("int").alias("a"))
    cohorts = tri.select("cm").distinct()
    asof = tri.agg(
        F.max(F.add_months(F.col("cm"), F.col("age"))).alias("asof")
    )
    dense = (
        cohorts.select(F.col("cm").alias("ccm"))
        .join(F.broadcast(ages))
        .join(
            tri,
            (F.col("ccm") == tri["cm"]) & (F.col("a") == tri["age"]),
            "left",
        )
        .select(
            F.col("ccm").alias("cm"),
            "a",
            F.coalesce(F.col("inc"), F.lit(0).cast(_DEC)).alias("inc"),
        )
    )
    wc = Window.partitionBy("cm").orderBy("a")
    # cum is consumed four times (both adjacent-factor self-join sides,
    # the diagonal groupBy and its join-back) — triangle-bounded frame
    cum = (
        dense.withColumn("c", F.sum("inc").over(wc))
        .crossJoin(F.broadcast(asof))
        .withColumn("observed", F.add_months(F.col("cm"), F.col("a")) <= F.col("asof"))
        .localCheckpoint(eager=True)
    )
    # age-to-age factors from adjacent observed columns with positive base
    adj = (
        cum.alias("x")
        .join(
            cum.alias("y"),
            (F.col("x.cm") == F.col("y.cm")) & (F.col("y.a") == F.col("x.a") + 1),
        )
        .filter(F.col("y.observed") & (F.col("x.c") > 0))
        .groupBy(F.col("x.a").alias("a"))
        .agg(
            F.sum(F.col("x.c")).alias("base"),
            F.sum(F.col("y.c")).alias("next"),
        )
        .select(
            "a",
            (F.col("next").cast("double") / F.col("base").cast("double")).alias("f"),
        )
    )
    diag = (
        cum.filter(F.col("observed"))
        .groupBy("cm")
        .agg(F.max("a").alias("la"))
        .join(cum, ["cm"], "inner")
        .filter(F.col("a") == F.col("la"))
        .select("cm", "la", F.col("c").alias("paid"))
    )
    lnf = (
        diag.join(F.broadcast(adj), F.col("a") >= F.col("la"), "left")
        .groupBy("cm", "la", "paid")
        .agg(
            F.coalesce(
                F.sum(F.round(F.log("f"), 12).cast("decimal(38,12)")),
                F.lit(0).cast("decimal(38,12)"),
            ).alias("slnf")
        )
    )
    ult = F.col("paid").cast("double") * F.exp(F.col("slnf").cast("double"))
    return lnf.select(
        F.date_format("cm", "yyyy-MM").alias("cohort"),
        F.col("la").cast("int").alias("latest_age"),
        F.round(F.col("paid").cast("double") / 100.0, 2).alias("paid"),
        F.round(ult / 100.0, 2).alias("ultimate"),
        F.round((ult - F.col("paid").cast("double")) / 100.0, 2).alias("reserve"),
    ).orderBy("cohort")


ORACLES["chain_ladder_ultimates"] = f"""
    WITH j AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS cm,
               (year(CAST(l_shipdate AS DATE)) - year(CAST(o_orderdate AS DATE)))
                   * 12
               + (month(CAST(l_shipdate AS DATE))
                  - month(CAST(o_orderdate AS DATE))) AS age,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    tri AS (
        SELECT cm, age, CAST(sum(cents) AS HUGEINT) AS inc
        FROM j WHERE age >= 0 AND age <= {CL_MAX_AGE}
        GROUP BY 1, 2
    ),
    ages AS (SELECT unnest(range(0, {CL_MAX_AGE + 1})) AS a),
    cohorts AS (SELECT DISTINCT cm FROM tri),
    cutoff AS (SELECT max(cm + to_months(CAST(age AS INTEGER))) AS aod FROM tri),
    dense AS (
        SELECT c.cm, g.a, coalesce(t.inc, 0) AS inc
        FROM cohorts c CROSS JOIN ages g
        LEFT JOIN tri t ON t.cm = c.cm AND t.age = g.a
    ),
    cum AS (
        SELECT cm, a,
               CAST(sum(inc) OVER (PARTITION BY cm ORDER BY a) AS HUGEINT) AS c,
               cm + to_months(CAST(a AS INTEGER)) <= aod AS observed
        FROM dense, cutoff
    ),
    adj AS (
        SELECT x.a AS a,
               CAST(sum(y.c) AS DOUBLE) / CAST(sum(x.c) AS DOUBLE) AS f
        FROM cum x JOIN cum y ON x.cm = y.cm AND y.a = x.a + 1
        WHERE y.observed AND x.c > 0
        GROUP BY 1
    ),
    diag AS (
        SELECT c.cm, m.la, c.c AS paid
        FROM (SELECT cm, max(a) AS la FROM cum WHERE observed GROUP BY 1) m
        JOIN cum c ON c.cm = m.cm AND c.a = m.la
    ),
    lnf AS (
        SELECT d.cm, d.la, d.paid,
               coalesce(sum(CAST(round(ln(f.f), 12) AS DECIMAL(38,12))),
                        CAST(0 AS DECIMAL(38,12))) AS slnf
        FROM diag d LEFT JOIN adj f ON f.a >= d.la
        GROUP BY 1, 2, 3
    )
    SELECT strftime(cm, '%Y-%m') AS cohort,
           CAST(la AS INTEGER) AS latest_age,
           round(CAST(paid AS DOUBLE) / 100.0, 2) AS paid,
           round(CAST(paid AS DOUBLE) * exp(CAST(slnf AS DOUBLE)) / 100.0, 2)
               AS ultimate,
           round((CAST(paid AS DOUBLE) * exp(CAST(slnf AS DOUBLE))
                  - CAST(paid AS DOUBLE)) / 100.0, 2) AS reserve
    FROM lnf
    ORDER BY 1
"""
QUERIES["chain_ladder_ultimates"] = chain_ladder_ultimates


def theil_u2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U2 of the lag-7 seasonal-naive daily-revenue forecast
    against the lag-1 naive benchmark: U2 = sqrt(sum (x_{t-7} - x_t)^2
    / sum (x_{t-1} - x_t)^2) over days where both lags exist — below 1
    means weekly seasonality genuinely improves on persistence (the
    ratio companion of seasonal_naive_mase's absolute-error scale).

    Both squared-difference folds are exact decimal integers on the cent
    grid; U2 is one float expression.

    Scale: bounded daily frame, one ordered window, one aggregate.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    wn = Window.partitionBy().orderBy("day")
    fr = (
        daily.withColumn("x1", F.lag("xc", 1).over(wn))
        .withColumn("x7", F.lag("xc", 7).over(wn))
        .filter(F.col("x1").isNotNull() & F.col("x7").isNotNull())
    )
    # each factor casts to decimal BEFORE the multiply (the oracle's
    # CAST(... AS HUGEINT) * CAST(... AS HUGEINT) shape): squaring the
    # long cent diffs first overflows int64 once daily totals reach
    # ~1e9.5 cents (hit at 10x sf0.1 under ANSI mode)
    d7 = (F.col("x7") - F.col("xc")).cast(_DEC)
    d1 = (F.col("x1") - F.col("xc")).cast(_DEC)
    agg = fr.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(d7 * d7).alias("num"),
        F.sum(d1 * d1).alias("den"),
    )
    u2 = F.sqrt(F.col("num").cast("double") / F.col("den").cast("double"))
    return agg.select(
        F.col("m").alias("n_obs"),
        F.round(u2, 6).alias("u2_seasonal"),
        F.when(u2 < 1.0, F.lit("beats_naive"))
        .otherwise(F.lit("naive_wins"))
        .alias("verdict"),
    )


ORACLES["theil_u2_forecast"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    fr AS (
        SELECT xc, lag(xc, 1) OVER (ORDER BY day) AS x1,
               lag(xc, 7) OVER (ORDER BY day) AS x7
        FROM daily
    ),
    agg AS (
        SELECT count(*) AS m,
               CAST(sum(CAST(x7 - xc AS HUGEINT)
                        * CAST(x7 - xc AS HUGEINT)) AS HUGEINT) AS num,
               CAST(sum(CAST(x1 - xc AS HUGEINT)
                        * CAST(x1 - xc AS HUGEINT)) AS HUGEINT) AS den
        FROM fr WHERE x1 IS NOT NULL AND x7 IS NOT NULL
    )
    SELECT CAST(m AS BIGINT) AS n_obs,
           round(sqrt(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)), 6)
               AS u2_seasonal,
           CASE WHEN sqrt(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) < 1.0
                THEN 'beats_naive' ELSE 'naive_wins' END AS verdict
    FROM agg
"""
QUERIES["theil_u2_forecast"] = theil_u2_forecast


def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint test on daily revenue — the
    nonparametric single-break companion of cusum_changepoint (mean
    shift on moments) and variance_changepoint: U_t = 2 * sum of ranks
    up to t minus t*(n+1), K = max_t |U_t|.

    Doubled midranks over the cent-value grid keep every U_t an exact
    integer (ties included) via the identity sum_{i<=t} (2R_i - (n+1)) =
    sum_{i<=t, j>t} sgn(x_i - x_j) = U_t — note the doubled ranks yield
    the CLASSIC U_t, not 2*U_t (the driver-side O(n^2) sign-sum twin
    test caught the factor-of-two misread in the first cut).  The break
    day is the earliest |U_t| argmax (deterministic) and the closed-form
    approximation p ~ 2 exp(-6 K^2 / (n^3 + n^2)) is a single float
    expression.

    Scale: one reduce to the daily frame, one value-grid window for
    midranks, one day-ordered window for the cumulative, one
    TakeOrderedAndProject pick.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    grid = daily.groupBy("xc").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.partitionBy().orderBy("xc")
    r2 = grid.withColumn("cum", F.sum("cnt").over(wv)).select(
        "xc", (F.lit(2) * F.col("cum") - F.col("cnt") + 1).alias("rank2")
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy().orderBy("day")
    u = (
        daily.join(r2, "xc")
        .crossJoin(F.broadcast(tot))
        .withColumn("t", F.row_number().over(wd))
        .withColumn("cumr2", F.sum("rank2").over(wd))
        .filter(F.col("t") < F.col("n"))
        .select(
            "day",
            "n",
            (F.col("cumr2") - F.col("t") * (F.col("n") + 1)).alias("u2"),
        )
    )
    top = u.orderBy(F.abs(F.col("u2")).desc(), F.col("day").asc()).limit(1)
    nd = F.col("n").cast("double")
    kk = F.abs(F.col("u2")).cast("double")
    p = 2.0 * F.exp(-6.0 * kk * kk / (nd * nd * nd + nd * nd))
    return top.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("day").alias("change_day"),
        F.abs(F.col("u2")).cast("long").alias("k_stat"),
        F.round(p, 6).alias("p_approx"),
        F.when(p < 0.05, F.lit("changepoint")).otherwise(F.lit("stable")).alias(
            "verdict"
        ),
    )


ORACLES["pettitt_changepoint"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    grid AS (SELECT xc, count(*) AS cnt FROM daily GROUP BY 1),
    r2 AS (
        SELECT xc, 2 * sum(cnt) OVER (ORDER BY xc) - cnt + 1 AS rank2
        FROM grid
    ),
    tot AS (SELECT count(*) AS n FROM daily),
    u AS (
        SELECT day, n,
               sum(rank2) OVER (ORDER BY day)
                   - row_number() OVER (ORDER BY day) * (n + 1) AS u2,
               row_number() OVER (ORDER BY day) AS t
        FROM daily JOIN r2 USING (xc), tot
    ),
    top AS (
        SELECT * FROM u WHERE t < n
        ORDER BY abs(u2) DESC, day ASC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_days, day AS change_day,
           CAST(abs(u2) AS BIGINT) AS k_stat,
           round(2.0 * exp(-6.0 * CAST(abs(u2) AS DOUBLE)
                           * CAST(abs(u2) AS DOUBLE)
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                              * CAST(n AS DOUBLE)
                              + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
               AS p_approx,
           CASE WHEN 2.0 * exp(-6.0 * CAST(abs(u2) AS DOUBLE)
                               * CAST(abs(u2) AS DOUBLE)
                               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                  * CAST(n AS DOUBLE)
                                  + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     < 0.05
                THEN 'changepoint' ELSE 'stable' END AS verdict
    FROM top
"""
QUERIES["pettitt_changepoint"] = pettitt_changepoint


def roll_spread_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll (1984) implied effective spread from the serial covariance
    of daily unit-price changes: spread = 2*sqrt(-Cov(dp_t, dp_{t-1})).
    Bid-ask bounce makes successive price changes negatively
    autocorrelated; a POSITIVE covariance means the model does not
    apply, and the estimator reports that verdict instead of a number
    (the textbook failure mode, surfaced rather than clamped).

    The daily unit price (shipped cents / shipped units) is a single
    float expression of two exact integer sums, micro-rounded once;
    price changes are then exact micro-unit integers and the covariance
    folds in decimal(38,0).

    Scale: one lineitem reduce to the calendar-bounded daily frame, one
    ordered window, one aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_quantity"
    )
    daily = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rc"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    )
    pr = F.round(
        F.col("rc").cast("double") / (F.col("q").cast("double") * 100.0), 6
    )
    wn = Window.partitionBy().orderBy("day")
    px = daily.select("day", F.round(pr * 1e6).cast("long").alias("pm"))
    fr = (
        px.withColumn("p1", F.lag("pm").over(wn))
        .withColumn("p2", F.lag("pm", 2).over(wn))
        .filter(F.col("p2").isNotNull())
        .select(
            (F.col("pm") - F.col("p1")).cast(_DEC).alias("dy"),
            (F.col("p1") - F.col("p2")).cast(_DEC).alias("dx"),
        )
    )
    agg = fr.agg(
        F.count(F.lit(1)).cast(_DEC).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    m = F.col("m").cast("double")
    cov = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (m * (m - 1.0))
    spread = 2.0 * F.sqrt(-cov) / 1e6
    return agg.select(
        F.col("m").cast("long").alias("n_obs"),
        F.round(cov / 1e12, 10).alias("serial_cov"),
        F.when(cov < 0, F.round(spread, 6)).alias("roll_spread"),
        F.when(cov < 0, F.lit("spread_estimated"))
        .otherwise(F.lit("positive_autocov_no_estimate"))
        .alias("verdict"),
    )


ORACLES["roll_spread_estimator"] = """
    WITH daily AS (
        SELECT l_shipdate AS day,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rc,
               sum(CAST(l_quantity AS BIGINT)) AS q
        FROM lineitem GROUP BY 1
    ),
    px AS (
        SELECT day,
               CAST(round(round(CAST(rc AS DOUBLE)
                                / (CAST(q AS DOUBLE) * 100.0), 6) * 1e6)
                    AS BIGINT) AS pm
        FROM daily
    ),
    lagged AS (
        SELECT pm, lag(pm) OVER (ORDER BY day) AS p1,
               lag(pm, 2) OVER (ORDER BY day) AS p2
        FROM px
    ),
    fr AS (
        SELECT CAST(pm - p1 AS HUGEINT) AS dy, CAST(p1 - p2 AS HUGEINT) AS dx
        FROM lagged WHERE p2 IS NOT NULL
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS m, sum(dx) AS sx, sum(dy) AS sy,
               sum(dx * dy) AS sxy
        FROM fr
    ),
    parts AS (
        SELECT m, CAST(m * sxy - sx * sy AS DOUBLE)
                      / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)) AS cov
        FROM agg
    )
    SELECT CAST(m AS BIGINT) AS n_obs,
           round(cov / 1e12, 10) AS serial_cov,
           CASE WHEN cov < 0 THEN round(2.0 * sqrt(-cov) / 1e6, 6) END
               AS roll_spread,
           CASE WHEN cov < 0 THEN 'spread_estimated'
                ELSE 'positive_autocov_no_estimate' END AS verdict
    FROM parts
"""
QUERIES["roll_spread_estimator"] = roll_spread_estimator


def amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amihud (2002) illiquidity per brand: the mean of |daily unit-
    price return| / daily dollar volume, scaled by 1e6 — how much the
    price moves per dollar traded.  The microstructure companion of
    roll_spread_estimator (which prices the bounce, not the depth).

    Per-day terms |r_t| / vol_t are single float expressions of exact
    integers (returns on the micro-rounded unit-price grid, volume in
    exact cents), micro-rounded before the per-brand decimal fold; the
    final mean is one division.

    Scale: one lineitem+part reduce to the (brand x day) grid, one
    brand-partitioned window, one per-brand fold.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rc"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
    )
    pm = F.round(
        F.round(F.col("rc").cast("double") / (F.col("q").cast("double") * 100.0), 6)
        * 1e6
    ).cast("long")
    wb = Window.partitionBy("brand").orderBy("day")
    fr = (
        daily.select("brand", "day", pm.alias("pm"), "rc")
        .withColumn("p1", F.lag("pm").over(wb))
        .filter(F.col("p1").isNotNull() & (F.col("p1") > 0))
    )
    term = (
        F.abs(F.col("pm") - F.col("p1")).cast("double")
        / F.col("p1").cast("double")
    ) / (F.col("rc").cast("double") / 100.0) * 1e6
    agg = fr.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.round(term, 6).cast("decimal(38,6)")).alias("s"),
    )
    return agg.select(
        "brand",
        "n_obs",
        F.round(
            F.col("s").cast("double") / F.col("n_obs").cast("double"), 6
        ).alias("amihud_x1e6"),
    ).orderBy("brand")


ORACLES["amihud_illiquidity"] = """
    WITH daily AS (
        SELECT p_brand AS brand, l_shipdate AS day,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rc,
               sum(CAST(l_quantity AS BIGINT)) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    px AS (
        SELECT brand, day, rc,
               CAST(round(round(CAST(rc AS DOUBLE)
                                / (CAST(q AS DOUBLE) * 100.0), 6) * 1e6)
                    AS BIGINT) AS pm
        FROM daily
    ),
    fr AS (
        SELECT brand, rc, pm,
               lag(pm) OVER (PARTITION BY brand ORDER BY day) AS p1
        FROM px
    ),
    terms AS (
        SELECT brand,
               CAST(round((CAST(abs(pm - p1) AS DOUBLE) / CAST(p1 AS DOUBLE))
                          / (CAST(rc AS DOUBLE) / 100.0) * 1e6, 6)
                    AS DECIMAL(38,6)) AS term
        FROM fr WHERE p1 IS NOT NULL AND p1 > 0
    )
    SELECT brand, CAST(count(*) AS BIGINT) AS n_obs,
           round(CAST(sum(term) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS amihud_x1e6
    FROM terms GROUP BY 1
    ORDER BY 1
"""
QUERIES["amihud_illiquidity"] = amihud_illiquidity


# ---------------------------------------------------------------------------
# round-6 wave BD — extreme-value / tail tier
# ---------------------------------------------------------------------------

import math as _m  # noqa: E402

HILL_K = 100  # tail order statistics entering the Hill estimator
LN_SCALE = 1_000_000_000  # pico... nano grid for per-value ln folds


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over order values:
    alpha_hat = k / sum_{i=1..k} (ln x_(i) - ln x_(k+1)) on the top
    k+1 order statistics — the heavy-tail companion of pareto_frontier
    (which ranks, but never fits a tail) and var_cvar_daily (which
    measures the lower tail of returns; this fits the upper tail of
    order sizes).

    Determinism: the top-(k+1) frame is TakeOrderedAndProject (never a
    full-frame window), and ties at the k-boundary cannot change the
    result because only the VALUES enter the estimator.  Each ln(xc)
    rounds to the 1e-9 grid independently, so the denominator
    sum(ln x_i) - k*ln(x_min) is an exact integer difference; alpha is
    ONE float division.

    Scale: orders reduce via a k+1-row top-k; everything after runs on
    the bounded frame.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("xc")
    )
    top = o.orderBy(F.col("xc").desc()).limit(HILL_K + 1)
    w = Window.orderBy(F.col("xc").desc())
    r = top.withColumn("rk", F.row_number().over(w))
    lnv = F.round(F.log(F.col("xc").cast("double")) * LN_SCALE).cast(
        "long"
    ).cast(_DEC)
    agg = r.select("rk", "xc", lnv.alias("lnv")).agg(
        F.sum(F.when(F.col("rk") <= HILL_K, F.col("lnv"))).alias("sln"),
        F.max(F.when(F.col("rk") == HILL_K + 1, F.col("lnv"))).alias("lnmin"),
        F.max(F.when(F.col("rk") == HILL_K + 1, F.col("xc"))).alias("xmin"),
    )
    denom = (F.col("sln") - F.lit(HILL_K).cast(_DEC) * F.col("lnmin")).cast(
        "double"
    ) / float(LN_SCALE)
    return agg.select(
        F.lit(HILL_K).cast("long").alias("k"),
        F.round(F.col("xmin").cast("double") / 100.0, 2).alias("xmin_usd"),
        F.round(F.lit(float(HILL_K)) / denom, 6).alias("hill_alpha"),
    )


ORACLES["hill_tail_index"] = f"""
    WITH top AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS xc
        FROM orders ORDER BY xc DESC LIMIT {HILL_K + 1}
    ),
    r AS (
        SELECT xc, row_number() OVER (ORDER BY xc DESC) AS rk,
               CAST(round(ln(CAST(xc AS DOUBLE)) * {LN_SCALE}) AS HUGEINT)
                   AS lnv
        FROM top
    ),
    agg AS (
        SELECT sum(CASE WHEN rk <= {HILL_K} THEN lnv END) AS sln,
               max(CASE WHEN rk = {HILL_K + 1} THEN lnv END) AS lnmin,
               max(CASE WHEN rk = {HILL_K + 1} THEN xc END) AS xmin
        FROM r
    )
    SELECT CAST({HILL_K} AS BIGINT) AS k,
           round(CAST(xmin AS DOUBLE) / 100.0, 2) AS xmin_usd,
           round(CAST({HILL_K} AS DOUBLE)
                 / (CAST(sln - {HILL_K} * lnmin AS DOUBLE) / {LN_SCALE}.0), 6)
               AS hill_alpha
    FROM agg
"""
QUERIES["hill_tail_index"] = hill_tail_index


# Gumbel fit constants, Python-precomputed so neither engine evaluates
# pi/sqrt/Euler-gamma (the theta weight-table convention)
GUMBEL_SQRT6_PI = _m.sqrt(6.0) / _m.pi
EULER_GAMMA = 0.5772156649015329
GUMBEL_T = 12  # return period in blocks (months) -> annual return level
GUMBEL_LL_T = _m.log(-_m.log(1.0 - 1.0 / GUMBEL_T))


def gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) fit of MONTHLY maxima of daily revenue by the
    method of moments: beta = s * sqrt(6)/pi, mu = mean - gamma*beta,
    plus the 12-month return level mu - beta*ln(-ln(1 - 1/12)) — the
    extreme-value companion of var_cvar_daily (historical tail pick;
    this EXTRAPOLATES beyond observed maxima).  Blocks are calendar
    months (every month has orders at all SFs; block maxima need
    defined blocks, not complete ones — unlike friedman's ISO weeks).

    Determinism: block maxima are exact cent integers; n, S1, S2 fold
    in decimal(38,0); mean/variance/fit are single float expressions of
    those integers with sqrt(6)/pi, Euler gamma, and ln(-ln(11/12))
    inlined as Python literals (no engine pi/gamma).

    Scale: one reduce to the calendar-bounded daily frame, one reduce
    to ~84 monthly maxima, one 3-column moment fold.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    blocks = daily.groupBy(
        F.date_format(F.col("day"), "yyyy-MM").alias("ym")
    ).agg(F.max("xc").alias("mx"))
    mom = blocks.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("mx").cast(_DEC)).alias("s1"),
        F.sum((F.col("mx").cast(_DEC) * F.col("mx").cast(_DEC))).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / n
    var = (n * s2 - s1 * s1) / (n * (n - 1.0))
    beta = F.sqrt(var) * F.lit(GUMBEL_SQRT6_PI)
    mu = mean - F.lit(EULER_GAMMA) * beta
    rl = mu - beta * F.lit(GUMBEL_LL_T)
    return mom.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.round(mu / 100.0, 2).alias("gumbel_mu_usd"),
        F.round(beta / 100.0, 2).alias("gumbel_beta_usd"),
        F.round(rl / 100.0, 2).alias("return_level_12mo_usd"),
    )


ORACLES["gumbel_block_maxima"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    blocks AS (
        SELECT strftime(CAST(day AS DATE), '%Y-%m') AS ym, max(xc) AS mx
        FROM daily GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(mx) AS HUGEINT) AS s1,
               sum(CAST(mx AS HUGEINT) * CAST(mx AS HUGEINT)) AS s2
        FROM blocks
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                  - {EULER_GAMMA} * sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                    * {GUMBEL_SQRT6_PI!r}) / 100.0, 2) AS gumbel_mu_usd,
           round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 * {GUMBEL_SQRT6_PI!r} / 100.0, 2) AS gumbel_beta_usd,
           round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                  - {EULER_GAMMA} * sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                    * {GUMBEL_SQRT6_PI!r}
                  - sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                    * {GUMBEL_SQRT6_PI!r} * {GUMBEL_LL_T!r}) / 100.0, 2)
               AS return_level_12mo_usd
    FROM mom
"""
QUERIES["gumbel_block_maxima"] = gumbel_block_maxima


def lognormal_fit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal MLE of the order-value distribution via ln-moments
    (the MLE for lognormal IS the mean/variance of ln x): mu, sigma on
    the dollar scale, the implied median exp(mu) and implied mean
    exp(mu + sigma^2/2), and the actual mean beside it — the
    distributional companion of beta_fit_discount (bounded support) and
    weibull_gap_fit (waiting times); order SIZES are the classic
    lognormal candidate, and implied-vs-actual mean is the fit audit.

    Determinism: each ln(xc) rounds to the 1e-9 grid independently and
    folds in decimal(38,0) (squares of the nano-lns stay < 1e21 per
    term, far inside decimal(38)); mu/sigma/implied moments are single
    float expressions; ln(100) (cents -> dollars shift) inlines as a
    Python literal.

    Scale: one map-side-combined 3-column fold over orders; no window,
    no join.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("xc")
    )
    t = F.round(F.log(F.col("xc").cast("double")) * LN_SCALE).cast(
        "long"
    ).cast(_DEC)
    mom = o.select(
        t.alias("t"), F.col("xc").cast(_DEC).alias("x")
    ).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("t").alias("s1"),
        F.sum(F.col("t") * F.col("t")).alias("s2"),
        F.sum("x").alias("sx"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    ln100 = _m.log(100.0)
    mu = s1 / n / LN_SCALE - F.lit(ln100)
    var = (n * s2 - s1 * s1) / (n * (n - 1.0)) / (LN_SCALE * LN_SCALE)
    return mom.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(mu, 6).alias("mu_ln_usd"),
        F.round(F.sqrt(var), 6).alias("sigma_ln"),
        F.round(F.exp(mu), 2).alias("implied_median_usd"),
        F.round(F.exp(mu + var / 2.0), 2).alias("implied_mean_usd"),
        F.round(
            F.col("sx").cast("double") / n / 100.0, 2
        ).alias("actual_mean_usd"),
    )


ORACLES["lognormal_fit_orders"] = f"""
    WITH o AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS xc FROM orders
    ),
    tt AS (
        SELECT xc,
               CAST(round(ln(CAST(xc AS DOUBLE)) * {LN_SCALE}) AS HUGEINT)
                   AS t
        FROM o
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(t) AS s1,
               sum(t * t) AS s2,
               CAST(sum(xc) AS HUGEINT) AS sx
        FROM tt
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / {LN_SCALE}.0
                 - {_m.log(100.0)!r}, 6) AS mu_ln_usd,
           round(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                      / 1e18), 6) AS sigma_ln,
           round(exp(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / {LN_SCALE}.0
                     - {_m.log(100.0)!r}), 2) AS implied_median_usd,
           round(exp(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / {LN_SCALE}.0
                     - {_m.log(100.0)!r}
                     + (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                       / 1e18 / 2.0), 2)
               AS implied_mean_usd,
           round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 2)
               AS actual_mean_usd
    FROM mom
"""
QUERIES["lognormal_fit_orders"] = lognormal_fit_orders
