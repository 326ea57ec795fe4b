"""Causal-inference tier (DRIVER surface).

The analytics platform ships A/B machinery (ab_test_lift, srm_check,
funnel_step_significance) for *randomized* experiments; this module adds
the standard observational-causal estimators a data platform runs when
randomization is unavailable:

- ``did_estimate``: difference-in-differences on the purchase stream —
  treated = even ``user_id``, post = the second half of the observation
  window (a pinned calendar date, identical at every SF).  The estimate is
  the classic 2x2 interaction of cell means; every cell mean is one
  division of an exact decimal(38,0) cent sum by an exact count.
- ``iv_wald_estimate``: instrumental-variable Wald ratio.  Instrument
  Z = even user_id, endogenous exposure D = "user ever signed up",
  outcome Y = total purchase spend.  first stage E[D|Z=1]-E[D|Z=0],
  reduced form E[Y|Z=1]-E[Y|Z=0], Wald = reduced/first (NULL-guarded
  against a zero first stage).  All six inputs are exact integers.
- ``rdd_estimate``: sharp regression-discontinuity at the $5,000
  account-balance cutoff — local LINEAR fits on each side of the cutoff
  within a $2,500 bandwidth (slope/intercept from exact decimal(38,0)
  normal equations, the market_beta_types pattern), jump = difference of
  the two intercepts at the cutoff.
- ``psm_caliper_att``: propensity/score matching ATT.  Treated =
  AUTOMOBILE-segment customers, score = account balance in cents,
  1-nearest-neighbor control WITH replacement inside a $50 caliper,
  deterministic tie-break (distance, then control key).  Matching uses
  caliper-width score buckets: a treated unit probes its own and the two
  adjacent buckets (3-bucket explode, the geo_grid_join blocking shape),
  so every within-caliper control is reachable via an EQUI-join and the
  pair frame is bounded by bucket occupancy — never treated x control.

Float parity: every division has exact-integer (decimal(38,0)) operands
computed identically on both engines; subtraction/division chains mirror
the oracle expression shape token for token, so doubles are bit-identical.

Scale: did/iv are single map-side-combined aggregations to 4/2 cells;
rdd filters to the bandwidth then aggregates to 2 sides; psm's only wide
operations are a dimension-sized equi-join keyed on caliper buckets and a
per-treated-unit rank window.  Reference parity: the reference pipeline
(src/dataflow-cdc-stream.py) has no analytics surface — this tier is
driver-mandated (large-scale training-data pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DEC = "decimal(38,0)"

DID_POST_START = "2024-01-16"  # events span 2024-01-01 .. 2024-01-30 at all SFs
RDD_CUTOFF_CENTS = 500_000  # $5,000.00 account-balance cutoff
RDD_BANDWIDTH_CENTS = 250_000  # local-linear window either side of the cutoff
PSM_CALIPER_CENTS = 5_000  # $50.00 max score distance for a valid match
PSM_TREATED_SEGMENT = "AUTOMOBILE"


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


# --------------------------------------------------------------------------
# did_estimate
# --------------------------------------------------------------------------


def did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 difference-in-differences of mean purchase value: treated = even
    user_id, post = ts >= DID_POST_START.  One groupBy to four cells; the
    interaction is pure scalar arithmetic on exact sums/counts."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cells = (
        e.select(
            (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
            (F.col("ts") >= F.to_timestamp(F.lit(DID_POST_START)))
            .cast("int")
            .alias("post"),
            _cents(F.col("value")).alias("cents"),
        )
        .groupBy("treated", "post")
        .agg(F.sum(F.col("cents").cast(_DEC)).alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "treated",
            "post",
            "n",
            (F.col("s").cast("double") / F.col("n") / F.lit(100.0)).alias("mv"),
        )
    )

    def cell(t: int, p: int, col: str) -> F.Column:
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    did = (cell(1, 1, "mv") - cell(1, 0, "mv")) - (cell(0, 1, "mv") - cell(0, 0, "mv"))
    return cells.groupBy().agg(
        cell(0, 0, "n").alias("n_ctl_pre"),
        cell(0, 1, "n").alias("n_ctl_post"),
        cell(1, 0, "n").alias("n_trt_pre"),
        cell(1, 1, "n").alias("n_trt_post"),
        F.round(cell(0, 0, "mv"), 6).alias("ctl_pre_mean"),
        F.round(cell(0, 1, "mv"), 6).alias("ctl_post_mean"),
        F.round(cell(1, 0, "mv"), 6).alias("trt_pre_mean"),
        F.round(cell(1, 1, "mv"), 6).alias("trt_post_mean"),
        F.round(did, 6).alias("did_dollars"),
    )


QUERIES["did_estimate"] = did_estimate
ORACLES["did_estimate"] = f"""
    WITH p AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN ts >= TIMESTAMP '{DID_POST_START}' THEN 1 ELSE 0 END AS post,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT treated, post, sum(cents) AS s, count(*) AS n
        FROM p GROUP BY 1, 2
    ),
    m AS (SELECT treated, post, n, CAST(s AS DOUBLE) / n / 100.0 AS mv FROM c)
    SELECT
        max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_ctl_pre,
        max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_ctl_post,
        max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_trt_pre,
        max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_trt_post,
        round(max(CASE WHEN treated = 0 AND post = 0 THEN mv END), 6) AS ctl_pre_mean,
        round(max(CASE WHEN treated = 0 AND post = 1 THEN mv END), 6) AS ctl_post_mean,
        round(max(CASE WHEN treated = 1 AND post = 0 THEN mv END), 6) AS trt_pre_mean,
        round(max(CASE WHEN treated = 1 AND post = 1 THEN mv END), 6) AS trt_post_mean,
        round((max(CASE WHEN treated = 1 AND post = 1 THEN mv END)
               - max(CASE WHEN treated = 1 AND post = 0 THEN mv END))
              - (max(CASE WHEN treated = 0 AND post = 1 THEN mv END)
                 - max(CASE WHEN treated = 0 AND post = 0 THEN mv END)),
              6) AS did_dollars
    FROM m
"""


# --------------------------------------------------------------------------
# iv_wald_estimate
# --------------------------------------------------------------------------


def iv_wald_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald IV estimator: instrument = even user_id, exposure = ever signed
    up, outcome = total purchase cents per user.  Two aggregations: per-user
    reduce, then one global conditional agg to the six exact inputs."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("d"),
        F.sum(
            F.when(F.col("event_type") == "purchase", _cents(F.col("value")))
            .otherwise(0)
            .cast(_DEC)
        ).alias("y"),
    )
    u = u.withColumn("z", (F.col("user_id") % 2 == 0).cast("int"))

    def side(z: int, expr, name: str) -> F.Column:
        return F.sum(F.when(F.col("z") == z, expr).otherwise(F.lit(0).cast(_DEC))).alias(
            name
        )

    g = u.groupBy().agg(
        side(1, F.lit(1).cast(_DEC), "n1"),
        side(0, F.lit(1).cast(_DEC), "n0"),
        side(1, F.col("d").cast(_DEC), "d1"),
        side(0, F.col("d").cast(_DEC), "d0"),
        side(1, F.col("y"), "y1"),
        side(0, F.col("y"), "y0"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    take1 = dbl("d1") / dbl("n1")
    take0 = dbl("d0") / dbl("n0")
    first = take1 - take0
    reduced = (dbl("y1") / dbl("n1") - dbl("y0") / dbl("n0")) / F.lit(100.0)
    wald = F.when(first != 0, reduced / first)
    return g.select(
        F.col("n1").cast("long").alias("n_z1"),
        F.col("n0").cast("long").alias("n_z0"),
        F.round(take1, 6).alias("takeup_z1"),
        F.round(take0, 6).alias("takeup_z0"),
        F.round(first, 6).alias("first_stage"),
        F.round(reduced, 6).alias("reduced_form_dollars"),
        F.round(wald, 6).alias("wald_dollars"),
    )


QUERIES["iv_wald_estimate"] = iv_wald_estimate
ORACLES["iv_wald_estimate"] = """
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS d,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS z
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN z = 1 THEN d ELSE 0 END) AS d1,
               sum(CASE WHEN z = 0 THEN d ELSE 0 END) AS d0,
               sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS y1,
               sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS y0
        FROM u
    )
    SELECT CAST(n1 AS BIGINT) AS n_z1, CAST(n0 AS BIGINT) AS n_z0,
           round(CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS takeup_z1,
           round(CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS takeup_z0,
           round(CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS first_stage,
           round((CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0, 6)
               AS reduced_form_dollars,
           round(CASE WHEN CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                           - CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE) <> 0
                      THEN ((CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                             - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0)
                           / (CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                              - CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 END, 6) AS wald_dollars
    FROM g
"""


# --------------------------------------------------------------------------
# rdd_estimate
# --------------------------------------------------------------------------


def _spend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, score cents, y = lifetime order spend cents, segment)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice")).cast(_DEC)).alias("spend"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        _cents(F.col("c_acctbal")).alias("score"),
        F.coalesce(F.col("spend"), F.lit(0).cast(_DEC)).alias("y"),
    )


_SPEND_SQL = """
        SELECT c_custkey AS k, c_mktsegment AS segment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS score,
               COALESCE(o.spend, 0) AS y
        FROM customer LEFT JOIN (
            SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend
            FROM orders GROUP BY 1
        ) o ON c_custkey = o_custkey
"""


def rdd_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp RDD at the $5,000 balance cutoff: per-side local-linear OLS of
    lifetime spend on centered balance within the bandwidth; the causal jump
    is the right intercept minus the left intercept (both at the cutoff).

    Normal equations accumulate in decimal(38,0) (exact at any corpus
    size); slope/intercept are two scalar float ops per side."""
    base = _spend_per_customer(spark, sf_dir)
    lo = RDD_CUTOFF_CENTS - RDD_BANDWIDTH_CENTS
    hi = RDD_CUTOFF_CENTS + RDD_BANDWIDTH_CENTS
    w = base.filter((F.col("score") >= lo) & (F.col("score") < hi)).select(
        (F.col("score") >= RDD_CUTOFF_CENTS).cast("int").alias("r"),
        (F.col("score") - RDD_CUTOFF_CENTS).cast(_DEC).alias("x"),
        F.col("y"),
    )

    def s(r: int, expr, name: str) -> F.Column:
        return F.sum(F.when(F.col("r") == r, expr).otherwise(F.lit(0).cast(_DEC))).alias(
            name
        )

    g = w.groupBy().agg(
        *[
            col
            for r, tag in ((0, "l"), (1, "r"))
            for col in (
                s(r, F.lit(1).cast(_DEC), f"n_{tag}"),
                s(r, F.col("x"), f"sx_{tag}"),
                s(r, F.col("y"), f"sy_{tag}"),
                s(r, F.col("x") * F.col("x"), f"sxx_{tag}"),
                s(r, F.col("x") * F.col("y"), f"sxy_{tag}"),
            )
        ]
    )

    def fit(tag: str):
        n, sx, sy, sxx, sxy = (
            F.col(f"{c}_{tag}") for c in ("n", "sx", "sy", "sxx", "sxy")
        )
        den = (n * sxx - sx * sx).cast("double")
        num = (n * sxy - sx * sy).cast("double")
        slope = F.when(den != 0, num / den)
        intercept = (sy.cast("double") - slope * sx.cast("double")) / n.cast("double")
        return n.cast("long"), slope, intercept

    n_l, sl_l, ic_l = fit("l")
    n_r, sl_r, ic_r = fit("r")
    return g.select(
        n_l.alias("n_left"),
        n_r.alias("n_right"),
        F.round(sl_l, 6).alias("slope_left"),
        F.round(sl_r, 6).alias("slope_right"),
        F.round(ic_l / F.lit(100.0), 6).alias("intercept_left_dollars"),
        F.round(ic_r / F.lit(100.0), 6).alias("intercept_right_dollars"),
        F.round((ic_r - ic_l) / F.lit(100.0), 6).alias("rdd_jump_dollars"),
    )


QUERIES["rdd_estimate"] = rdd_estimate
ORACLES["rdd_estimate"] = f"""
    WITH base AS ({_SPEND_SQL}),
    w AS (
        SELECT CASE WHEN score >= {RDD_CUTOFF_CENTS} THEN 1 ELSE 0 END AS r,
               CAST(score - {RDD_CUTOFF_CENTS} AS HUGEINT) AS x,
               CAST(y AS HUGEINT) AS y
        FROM base
        WHERE score >= {RDD_CUTOFF_CENTS - RDD_BANDWIDTH_CENTS}
          AND score < {RDD_CUTOFF_CENTS + RDD_BANDWIDTH_CENTS}
    ),
    g AS (
        SELECT sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS n_l,
               sum(CASE WHEN r = 0 THEN x ELSE 0 END) AS sx_l,
               sum(CASE WHEN r = 0 THEN y ELSE 0 END) AS sy_l,
               sum(CASE WHEN r = 0 THEN x * x ELSE 0 END) AS sxx_l,
               sum(CASE WHEN r = 0 THEN x * y ELSE 0 END) AS sxy_l,
               sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n_r,
               sum(CASE WHEN r = 1 THEN x ELSE 0 END) AS sx_r,
               sum(CASE WHEN r = 1 THEN y ELSE 0 END) AS sy_r,
               sum(CASE WHEN r = 1 THEN x * x ELSE 0 END) AS sxx_r,
               sum(CASE WHEN r = 1 THEN x * y ELSE 0 END) AS sxy_r
        FROM w
    ),
    f AS (
        SELECT CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
               CASE WHEN n_l * sxx_l - sx_l * sx_l <> 0
                    THEN CAST(n_l * sxy_l - sx_l * sy_l AS DOUBLE)
                         / CAST(n_l * sxx_l - sx_l * sx_l AS DOUBLE) END AS sl_l,
               CASE WHEN n_r * sxx_r - sx_r * sx_r <> 0
                    THEN CAST(n_r * sxy_r - sx_r * sy_r AS DOUBLE)
                         / CAST(n_r * sxx_r - sx_r * sx_r AS DOUBLE) END AS sl_r,
               CAST(sx_l AS DOUBLE) AS sxd_l, CAST(sy_l AS DOUBLE) AS syd_l,
               CAST(n_l AS DOUBLE) AS nd_l,
               CAST(sx_r AS DOUBLE) AS sxd_r, CAST(sy_r AS DOUBLE) AS syd_r,
               CAST(n_r AS DOUBLE) AS nd_r
        FROM g
    )
    SELECT n_left, n_right,
           round(sl_l, 6) AS slope_left, round(sl_r, 6) AS slope_right,
           round((syd_l - sl_l * sxd_l) / nd_l / 100.0, 6)
               AS intercept_left_dollars,
           round((syd_r - sl_r * sxd_r) / nd_r / 100.0, 6)
               AS intercept_right_dollars,
           round(((syd_r - sl_r * sxd_r) / nd_r - (syd_l - sl_l * sxd_l) / nd_l)
                 / 100.0, 6) AS rdd_jump_dollars
    FROM f
"""


# --------------------------------------------------------------------------
# psm_caliper_att
# --------------------------------------------------------------------------


def psm_caliper_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN caliper matching ATT: treated = AUTOMOBILE-segment customers,
    score = balance cents, nearest control (with replacement) within a $50
    caliper via 3-adjacent-bucket blocking; ATT = mean matched spend gap.

    Scale: the candidate join is an equi-join on caliper-width buckets
    (bucket occupancy bounds the pair frame — the geo_grid_join argument);
    the best-match rank window partitions per treated unit."""
    base = _spend_per_customer(spark, sf_dir)
    bucket = F.floor(F.col("score") / F.lit(PSM_CALIPER_CENTS)).cast("long")
    t = base.filter(F.col("segment") == PSM_TREATED_SEGMENT).select(
        F.col("k").alias("tk"),
        F.col("score").alias("ts"),
        F.col("y").alias("ty"),
        bucket.alias("tb"),
    )
    ctl = base.filter(F.col("segment") != PSM_TREATED_SEGMENT).select(
        F.col("k").alias("ck"),
        F.col("score").alias("cs"),
        F.col("y").alias("cy"),
        bucket.alias("cb"),
    )
    cand = (
        t.withColumn("pb", F.explode(F.array(F.col("tb") - 1, F.col("tb"), F.col("tb") + 1)))
        .join(ctl, F.col("pb") == F.col("cb"))
        .withColumn("diff", F.abs(F.col("ts") - F.col("cs")))
        .filter(F.col("diff") <= PSM_CALIPER_CENTS)
    )
    w = Window.partitionBy("tk").orderBy("diff", "ck")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("tk", F.col("cy"), F.col("diff"))
    )
    joined = t.join(best, "tk", "left")
    matched = F.col("cy").isNotNull()
    gap = (F.col("ty") - F.col("cy")).cast(_DEC)
    g = joined.groupBy().agg(
        F.count(F.lit(1)).alias("n_treated"),
        F.sum(matched.cast("int")).alias("n_matched"),
        F.sum(F.when(matched, gap)).alias("gap_sum"),
        F.sum(F.when(matched, F.col("diff").cast(_DEC))).alias("diff_sum"),
    )
    nm = F.col("n_matched").cast("double")
    return g.select(
        "n_treated",
        "n_matched",
        F.round(nm / F.col("n_treated"), 6).alias("match_rate"),
        F.round(F.col("gap_sum").cast("double") / nm / F.lit(100.0), 6).alias(
            "att_dollars"
        ),
        F.round(F.col("diff_sum").cast("double") / nm, 6).alias("avg_score_gap_cents"),
    )


QUERIES["psm_caliper_att"] = psm_caliper_att
ORACLES["psm_caliper_att"] = f"""
    WITH base AS ({_SPEND_SQL}),
    t AS (
        SELECT k AS tk, score AS ts, y AS ty,
               CAST(floor(score / {PSM_CALIPER_CENTS}.0) AS BIGINT) AS tb
        FROM base WHERE segment = '{PSM_TREATED_SEGMENT}'
    ),
    ctl AS (
        SELECT k AS ck, score AS cs, y AS cy,
               CAST(floor(score / {PSM_CALIPER_CENTS}.0) AS BIGINT) AS cb
        FROM base WHERE segment <> '{PSM_TREATED_SEGMENT}'
    ),
    cand AS (
        SELECT t.tk, t.ty, ctl.ck, ctl.cy, abs(t.ts - ctl.cs) AS diff
        FROM t JOIN ctl ON ctl.cb BETWEEN t.tb - 1 AND t.tb + 1
        WHERE abs(t.ts - ctl.cs) <= {PSM_CALIPER_CENTS}
    ),
    best AS (
        SELECT tk, cy, diff,
               row_number() OVER (PARTITION BY tk ORDER BY diff, ck) AS rn
        FROM cand
    ),
    j AS (
        SELECT t.tk, t.ty, b.cy, b.diff
        FROM t LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (tk)
    )
    SELECT count(*) AS n_treated,
           count(cy) AS n_matched,
           round(CAST(count(cy) AS DOUBLE) / count(*), 6) AS match_rate,
           round(CAST(sum(CASE WHEN cy IS NOT NULL THEN ty - cy END) AS DOUBLE)
                 / CAST(count(cy) AS DOUBLE) / 100.0, 6) AS att_dollars,
           round(CAST(sum(CASE WHEN cy IS NOT NULL THEN diff END) AS DOUBLE)
                 / CAST(count(cy) AS DOUBLE), 6) AS avg_score_gap_cents
    FROM j
"""


# --------------------------------------------------------------------------
# psm_strata_ate — propensity-stratification (subclassification) estimator
# --------------------------------------------------------------------------

ATE_STRATA = 10


def psm_strata_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification estimator to pair with psm_caliper_att: slice the
    score range into 10 equal-width strata (integer arithmetic on the
    exact global min/max), keep strata with common support (both arms
    present), and weight within-stratum mean outcome gaps by stratum
    population (ATE) and by treated count (ATT).

    Exactness: stratum assignment is pure integer arithmetic
    (floor((score - mn) * 10 / (mx - mn + 1))); all sums/counts are exact;
    the two weighted folds run ORDER-PINNED over the <= 10-stratum frame.

    Scale: one global min/max aggregate (scalar broadcast), one groupBy to
    (stratum, arm) cells; everything else on the 10-row frame.
    """
    base = _spend_per_customer(spark, sf_dir).select(
        (F.col("segment") == PSM_TREATED_SEGMENT).cast("int").alias("tr"),
        F.col("score"),
        F.col("y"),
    )
    bounds = base.groupBy().agg(
        F.min("score").alias("mn"), F.max("score").alias("mx")
    )
    b = base.crossJoin(F.broadcast(bounds))  # 1-row scalar broadcast
    stratum = F.floor(
        (F.col("score") - F.col("mn")).cast("decimal(38,0)")
        * ATE_STRATA
        / (F.col("mx") - F.col("mn") + 1).cast("decimal(38,0)")
    ).cast("int")
    cells = (
        b.select(stratum.alias("s"), "tr", "y")
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("tr") == 1, 1).otherwise(0)).alias("nt"),
            F.sum(F.when(F.col("tr") == 0, 1).otherwise(0)).alias("nc"),
            F.sum(
                F.when(F.col("tr") == 1, F.col("y")).otherwise(F.lit(0).cast(_DEC))
            ).alias("st"),
            F.sum(
                F.when(F.col("tr") == 0, F.col("y")).otherwise(F.lit(0).cast(_DEC))
            ).alias("sc"),
        )
        .filter((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    gap = (
        F.col("st").cast("double") / F.col("nt").cast("double")
        - F.col("sc").cast("double") / F.col("nc").cast("double")
    )
    wall = Window.partitionBy()
    wcum = wall.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    t = (
        cells.withColumn("n_s", F.col("nt") + F.col("nc"))
        .withColumn("n_all", F.sum(F.col("nt") + F.col("nc")).over(wall))
        .withColumn("t_all", F.sum("nt").over(wall))
    )
    ate_cum = F.sum(
        gap * F.col("n_s").cast("double") / F.col("n_all").cast("double")
    ).over(wcum)
    att_cum = F.sum(
        gap * F.col("nt").cast("double") / F.col("t_all").cast("double")
    ).over(wcum)
    wlast = wall.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    folded = t.withColumn("ate_c", ate_cum).withColumn("att_c", att_cum)
    return folded.groupBy().agg(
        F.count(F.lit(1)).alias("n_strata_used"),
        F.max("n_all").cast("long").alias("n_common_support"),
        F.max("t_all").cast("long").alias("n_treated_kept"),
        F.round(
            F.max_by(F.col("ate_c"), F.col("s")) / F.lit(100.0), 6
        ).alias("ate_dollars"),
        F.round(
            F.max_by(F.col("att_c"), F.col("s")) / F.lit(100.0), 6
        ).alias("att_dollars"),
    )


QUERIES["psm_strata_ate"] = psm_strata_ate
ORACLES["psm_strata_ate"] = f"""
    WITH base AS ({_SPEND_SQL}),
    tagged AS (
        SELECT CASE WHEN segment = '{PSM_TREATED_SEGMENT}' THEN 1 ELSE 0 END
                   AS tr,
               score, y,
               min(score) OVER () AS mn, max(score) OVER () AS mx
        FROM base
    ),
    cells AS (
        SELECT CAST(floor(CAST(score - mn AS HUGEINT) * {ATE_STRATA}
                          / CAST(mx - mn + 1 AS HUGEINT)) AS INT) AS s,
               sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS nt,
               sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS nc,
               sum(CASE WHEN tr = 1 THEN y ELSE 0 END) AS st,
               sum(CASE WHEN tr = 0 THEN y ELSE 0 END) AS sc
        FROM tagged GROUP BY 1
    ),
    kept AS (SELECT * FROM cells WHERE nt > 0 AND nc > 0),
    t AS (
        SELECT s, nt, nc, st, sc, nt + nc AS n_s,
               sum(nt + nc) OVER () AS n_all,
               sum(nt) OVER () AS t_all
        FROM kept
    ),
    folded AS (
        SELECT s, n_all, t_all,
               sum((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
                   * CAST(n_s AS DOUBLE) / CAST(n_all AS DOUBLE))
                   OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ate_c,
               sum((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
                   * CAST(nt AS DOUBLE) / CAST(t_all AS DOUBLE))
                   OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS att_c
        FROM t
    )
    SELECT count(*) AS n_strata_used,
           CAST(max(n_all) AS BIGINT) AS n_common_support,
           CAST(max(t_all) AS BIGINT) AS n_treated_kept,
           round(arg_max(ate_c, s) / 100.0, 6) AS ate_dollars,
           round(arg_max(att_c, s) / 100.0, 6) AS att_dollars
    FROM folded
"""


ES_EVENT = "1997-01-01"  # pinned event date (the did_estimate convention)
ES_SEGMENT = "BUILDING"  # treated segment
ES_WINDOW = 6  # leads/lags in months


def event_study_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study difference-in-differences: per relative month m in
    [-ES_WINDOW, +ES_WINDOW] around ES_EVENT, the treated-vs-control gap
    in average per-customer spend, re-centered on the m = -1 baseline —
    the leads-and-lags picture did_estimate's single coefficient
    collapses, and the standard parallel-trends diagnostic (pre-event
    coefficients should hover near zero).

    Treated = ES_SEGMENT customers; denominators are the FIXED customer-
    dim group sizes, so zero-spender months enter through the count
    (the eoq zero-through-count pattern) and every coefficient is a
    single float expression of exact cent/count integers.

    Scale: one orders reduce to the (group x 13 months) frame joined to
    the fixed dim counts; the baseline is a 1-row broadcast.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_mktsegment") == ES_SEGMENT).alias("tr")
    )
    sizes = c.groupBy("tr").agg(F.count(F.lit(1)).cast(_DEC).alias("n"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    m = (
        (F.year("o_orderdate") - 1997) * 12 + F.month("o_orderdate") - 1
    ).alias("m")
    spend = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("tr", m, F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .filter((F.col("m") >= -ES_WINDOW) & (F.col("m") <= ES_WINDOW))
        .groupBy("tr", "m")
        .agg(F.sum(F.col("cents").cast(_DEC)).alias("s"))
    )
    months = spark.range(-ES_WINDOW, ES_WINDOW + 1).select(
        F.col("id").cast("int").alias("m")
    )
    grid = (
        months.join(F.broadcast(sizes))
        .join(spend, ["tr", "m"], "left")
        .select(
            "m", "tr", "n",
            F.coalesce(F.col("s"), F.lit(0).cast(_DEC)).alias("s"),
        )
    )
    wide = grid.groupBy("m").agg(
        F.max(F.when(F.col("tr"), F.col("s"))).alias("st"),
        F.max(F.when(F.col("tr"), F.col("n"))).alias("nt"),
        F.max(F.when(~F.col("tr"), F.col("s"))).alias("sc"),
        F.max(F.when(~F.col("tr"), F.col("n"))).alias("nc"),
    )
    gap = (
        F.col("st").cast("double") / F.col("nt").cast("double")
        - F.col("sc").cast("double") / F.col("nc").cast("double")
    ) / 100.0
    base = wide.filter(F.col("m") == -1).select(
        (
            F.col("st").cast("double") / F.col("nt").cast("double")
            - F.col("sc").cast("double") / F.col("nc").cast("double")
        ).alias("b")
    )
    return (
        wide.crossJoin(F.broadcast(base))
        .select(
            F.col("m").alias("rel_month"),
            F.round(
                F.col("st").cast("double") / F.col("nt").cast("double") / 100.0,
                4,
            ).alias("avg_treated"),
            F.round(
                F.col("sc").cast("double") / F.col("nc").cast("double") / 100.0,
                4,
            ).alias("avg_control"),
            F.round(gap - F.col("b") / 100.0, 4).alias("did_coef"),
        )
        .orderBy("rel_month")
    )


ORACLES["event_study_did"] = f"""
    WITH c AS (
        SELECT c_custkey, c_mktsegment = '{ES_SEGMENT}' AS tr FROM customer
    ),
    sizes AS (
        SELECT tr, CAST(count(*) AS HUGEINT) AS n FROM c GROUP BY 1
    ),
    spend AS (
        SELECT tr,
               (year(CAST(o_orderdate AS DATE)) - 1997) * 12
                   + month(CAST(o_orderdate AS DATE)) - 1 AS m,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS HUGEINT) AS s
        FROM orders JOIN c ON o_custkey = c_custkey
        WHERE (year(CAST(o_orderdate AS DATE)) - 1997) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1
              BETWEEN -{ES_WINDOW} AND {ES_WINDOW}
        GROUP BY 1, 2
    ),
    months AS (
        SELECT unnest(range(-{ES_WINDOW}, {ES_WINDOW + 1})) AS m
    ),
    grid AS (
        SELECT mo.m, sz.tr, sz.n, coalesce(sp.s, 0) AS s
        FROM months mo CROSS JOIN sizes sz
        LEFT JOIN spend sp ON sp.tr = sz.tr AND sp.m = mo.m
    ),
    wide AS (
        SELECT m,
               max(CASE WHEN tr THEN s END) AS st,
               max(CASE WHEN tr THEN n END) AS nt,
               max(CASE WHEN NOT tr THEN s END) AS sc,
               max(CASE WHEN NOT tr THEN n END) AS nc
        FROM grid GROUP BY 1
    ),
    base AS (
        SELECT CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
               - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS b
        FROM wide WHERE m = -1
    )
    SELECT CAST(m AS INTEGER) AS rel_month,
           round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) / 100.0, 4)
               AS avg_treated,
           round(CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) / 100.0, 4)
               AS avg_control,
           round((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                  - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) / 100.0
                 - b / 100.0, 4) AS did_coef
    FROM wide CROSS JOIN base
    ORDER BY 1
"""
QUERIES["event_study_did"] = event_study_did


def ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE on psm_strata_ate's IDENTICAL
    strata — the weighting member of the adjustment family (matching:
    psm_caliper_att; stratification: psm_strata_ate; weighting: here),
    plus the effective-sample-size diagnostics only weighting exposes
    (ESS collapse is THE standard IPW failure signal).

    With exact bucket propensities p_s = nt/n_s, the per-stratum IPW
    folds are rationals: treated mass st * n_s / nt, control mass
    sc * n_s / nc, and the weight sums telescope to N exactly on both
    arms (so Horvitz-Thompson and Hajek coincide here — documented).
    Each stratum contributes ONE pico-rounded exact division per fold
    (the tukey pattern); ESS_t = N^2 / sum_s(n_s^2 / nt).

    Scale: identical to psm_strata_ate — one scalar min/max broadcast,
    one groupBy to <= 10 strata, folds on the stratum frame.
    """
    base = _spend_per_customer(spark, sf_dir).select(
        (F.col("segment") == PSM_TREATED_SEGMENT).cast("int").alias("tr"),
        F.col("score"),
        F.col("y"),
    )
    bounds = base.groupBy().agg(
        F.min("score").alias("mn"), F.max("score").alias("mx")
    )
    b = base.crossJoin(F.broadcast(bounds))
    stratum = F.floor(
        (F.col("score") - F.col("mn")).cast("decimal(38,0)")
        * ATE_STRATA
        / (F.col("mx") - F.col("mn") + 1).cast("decimal(38,0)")
    ).cast("int")
    cells = (
        b.select(stratum.alias("s"), "tr", "y")
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("tr") == 1, 1).otherwise(0)).alias("nt"),
            F.sum(F.when(F.col("tr") == 0, 1).otherwise(0)).alias("nc"),
            F.sum(
                F.when(F.col("tr") == 1, F.col("y")).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("st"),
            F.sum(
                F.when(F.col("tr") == 0, F.col("y")).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("sc"),
        )
        .filter((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    n_s = (F.col("nt") + F.col("nc")).cast(_DEC)

    def pico(expr):
        return F.round(expr, 6).cast("decimal(38,6)")

    staged = cells.select(
        "s",
        "nt",
        "nc",
        pico(
            (F.col("st") * n_s).cast("double") / F.col("nt").cast("double")
        ).alias("wt_y"),
        pico(
            (F.col("sc") * n_s).cast("double") / F.col("nc").cast("double")
        ).alias("wc_y"),
        pico(
            (n_s * n_s).cast("double") / F.col("nt").cast("double")
        ).alias("wt_sq"),
        pico(
            (n_s * n_s).cast("double") / F.col("nc").cast("double")
        ).alias("wc_sq"),
        n_s.alias("n_s"),
    )
    agg = staged.agg(
        F.count(F.lit(1)).alias("n_strata_used"),
        F.sum("n_s").alias("n"),
        F.sum("wt_y").alias("swt"),
        F.sum("wc_y").alias("swc"),
        F.sum("wt_sq").alias("sqt"),
        F.sum("wc_sq").alias("sqc"),
    )
    nd = F.col("n").cast("double")
    ate = (F.col("swt").cast("double") - F.col("swc").cast("double")) / nd
    return agg.select(
        F.col("n_strata_used").cast("long").alias("n_strata_used"),
        F.col("n").cast("long").alias("n_common_support"),
        F.round(ate / 100.0, 6).alias("ipw_ate_dollars"),
        F.round(nd * nd / F.col("sqt").cast("double"), 2).alias(
            "ess_treated"
        ),
        F.round(nd * nd / F.col("sqc").cast("double"), 2).alias(
            "ess_control"
        ),
    )


ORACLES["ipw_ate"] = f"""
    WITH base AS ({_SPEND_SQL}),
    tagged AS (
        SELECT CASE WHEN segment = '{PSM_TREATED_SEGMENT}' THEN 1 ELSE 0 END
                   AS tr,
               score, y,
               min(score) OVER () AS mn, max(score) OVER () AS mx
        FROM base
    ),
    cells AS (
        SELECT CAST(floor(CAST(score - mn AS HUGEINT) * {ATE_STRATA}
                          / CAST(mx - mn + 1 AS HUGEINT)) AS INT) AS s,
               CAST(sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS nt,
               CAST(sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS nc,
               CAST(sum(CASE WHEN tr = 1 THEN y ELSE 0 END) AS HUGEINT)
                   AS st,
               CAST(sum(CASE WHEN tr = 0 THEN y ELSE 0 END) AS HUGEINT)
                   AS sc
        FROM tagged GROUP BY 1
    ),
    kept AS (SELECT *, nt + nc AS n_s FROM cells WHERE nt > 0 AND nc > 0),
    staged AS (
        SELECT s, n_s,
               CAST(round(CAST(st * n_s AS DOUBLE) / CAST(nt AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS wt_y,
               CAST(round(CAST(sc * n_s AS DOUBLE) / CAST(nc AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS wc_y,
               CAST(round(CAST(n_s * n_s AS DOUBLE) / CAST(nt AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS wt_sq,
               CAST(round(CAST(n_s * n_s AS DOUBLE) / CAST(nc AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS wc_sq
        FROM kept
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
               CAST(sum(n_s) AS HUGEINT) AS n,
               sum(wt_y) AS swt, sum(wc_y) AS swc,
               sum(wt_sq) AS sqt, sum(wc_sq) AS sqc
        FROM staged
    )
    SELECT n_strata_used, CAST(n AS BIGINT) AS n_common_support,
           round((CAST(swt AS DOUBLE) - CAST(swc AS DOUBLE))
                 / CAST(n AS DOUBLE) / 100.0, 6) AS ipw_ate_dollars,
           round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 / CAST(sqt AS DOUBLE), 2) AS ess_treated,
           round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 / CAST(sqc AS DOUBLE), 2) AS ess_control
    FROM agg
"""
QUERIES["ipw_ate"] = ipw_ate
