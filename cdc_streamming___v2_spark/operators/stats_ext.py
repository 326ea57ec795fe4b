"""Nonparametric / distributional statistical-test tier (DRIVER surface).

The engine already ships moment-based tests (welch_t_test, ab_test_lift),
drift monitors (ks_drift, psi_drift, chi2_drift, anderson_darling_drift)
and survival estimation (kaplan_meier).  This module completes the classic
inference toolkit a data platform exposes next to them:

- ``mann_whitney_u``: rank-sum test for every event-type pair.  Ranks are
  computed from the 2-decimal ``value`` grid (range-bounded: the distinct
  cent-value frame is <= ~33k rows AT ANY corpus size, the auc_roc_quality
  argument), with tie-corrected variance.  Rank sums and tie cubes
  accumulate in decimal(38,0), so the statistic is exact past 2^53 rows;
  the z formula is a single scalar expression over exact integers.
- ``kruskal_wallis``: the k-group extension — ONE pooled midrank frame on
  the same bounded value grid, per-group doubled rank sums, tie-corrected
  H.
- ``mann_kendall_trend``: the nonparametric trend test on the daily
  revenue series.  Pairs are day x day on the observation-window frame
  (the theil_sen_trend bound: quadratic in DAYS, never in rows); S and
  the tie-corrected variance are exact integers, z applies the standard
  continuity correction.
- ``log_rank_test``: two-cohort survival comparison (even/odd user_id)
  over the signup -> first-purchase durations of kaplan_meier; risk sets
  come from day-frame cumulative sums, per-day expectation/variance terms
  are folded with an ORDER-PINNED cumulative sum (the kaplan_meier
  determinism pattern) so both engines add in the same sequence.
- ``t_closeness``: the ordinal-EMD privacy audit that completes the
  k_anonymity / l_diversity trio: per QI group, Earth-Mover distance
  between the group's order-priority distribution and the global one,
  with exact integer numerators |cumP*N - cumQ*n_g|.
- ``js_divergence_sources``: pairwise Jensen-Shannon divergence between
  source word distributions — the probabilistic companion of the set-based
  vocab_overlap_sources.  The pair join is word-keyed (vocabulary
  cardinality); one-sided mass is handled in closed form so only the
  shared-word join is materialized.

Scale: every operator reduces the fact table ONCE to a bounded frame
(value grid, day grid, QI x level grid, vocabulary) before any window or
pair join runs; all joins are equi-joins or broadcast of dimension-sized
frames.  Reference parity: the reference pipeline (src/dataflow-cdc-stream
.py) has no analytics surface — this tier is driver-mandated
(large-scale training-data pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DEC = "decimal(38,0)"


# --------------------------------------------------------------------------
# mann_whitney_u
# --------------------------------------------------------------------------


def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test of ``events.value`` between
    every unordered pair of event types: U statistic and tie-corrected
    normal-approximation z.

    Exactness: values land on their integer-cent grid, per-(pair, cent)
    counts are pooled, and the doubled midrank 2r = 2*cum - n_t + 1 keeps
    every rank integral.  U1 and the variance numerator are exact
    decimal(38,0) integers; the only float ops are the final division and
    sqrt (single scalar expression, identical on both engines).

    Scale: one groupBy to the (event_type, cent) grid; the pair explosion
    is a broadcast of a 10-row membership frame; the rank window runs
    per-pair on the range-bounded cent grid (<= ~33k rows each at any SF).
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    ).agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=True)
    types = g.select("event_type").distinct()
    a = types.select(F.col("event_type").alias("ta"))
    b = types.select(F.col("event_type").alias("tb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("ta") < F.col("tb"))
    mem = pairs.select(
        "ta",
        "tb",
        F.explode(
            F.array(
                F.struct(F.col("ta").alias("t"), F.lit("a").alias("side")),
                F.struct(F.col("tb").alias("t"), F.lit("b").alias("side")),
            )
        ).alias("m"),
    ).select("ta", "tb", F.col("m.t").alias("t"), F.col("m.side").alias("side"))
    j = g.join(F.broadcast(mem), g.event_type == mem.t)
    pv = j.groupBy("ta", "tb", "cv").agg(
        F.sum(F.when(F.col("side") == "a", F.col("cnt")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("side") == "b", F.col("cnt")).otherwise(0)).alias("nb"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("ta", "tb").orderBy("cv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    nt = F.col("na") + F.col("nb")
    r = pv.withColumn("nt", nt).withColumn(
        "rank2", F.lit(2) * F.sum("nt").over(w) - F.col("nt") + F.lit(1)
    )
    s = r.groupBy("ta", "tb").agg(
        F.sum("na").alias("n1"),
        F.sum("nb").alias("n2"),
        F.sum(F.col("na").cast(_DEC) * F.col("rank2").cast(_DEC)).alias("r12"),
        F.sum(
            (
                F.col("nt").cast(_DEC) * F.col("nt").cast(_DEC) * F.col("nt").cast(_DEC)
                - F.col("nt").cast(_DEC)
            )
        ).alias("tsum"),
    )
    n1, n2 = F.col("n1").cast(_DEC), F.col("n2").cast(_DEC)
    n = n1 + n2
    # doubled centered statistic: 2*(U1 - n1*n2/2) = r12 - n1*(n1+1) - n1*n2
    num2 = (F.col("r12") - n1 * (n1 + 1) - n1 * n2).cast("double")
    # Var(U) = n1*n2*((N+1)*N*(N-1) - T) / (12*N*(N-1))
    var_num = (n1 * n2).cast("double") * (
        ((n + 1) * n * (n - 1)).cast("double") - F.col("tsum").cast("double")
    )
    var_u = var_num / (F.lit(12.0) * n.cast("double") * (n - 1).cast("double"))
    u1 = (F.col("r12") - n1 * (n1 + 1)).cast("double") / F.lit(2.0)
    return s.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        F.round(u1, 1).alias("u_stat"),
        F.round(num2 / (F.lit(2.0) * F.sqrt(var_u)), 4).alias("z_stat"),
    )


ORACLES["mann_whitney_u"] = """
    WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM g),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM types a, types b WHERE a.event_type < b.event_type
    ),
    mem AS (
        SELECT ta, tb, ta AS t, 'a' AS side FROM pairs
        UNION ALL
        SELECT ta, tb, tb AS t, 'b' AS side FROM pairs
    ),
    pv AS (
        SELECT m.ta, m.tb, g.cv,
               sum(CASE WHEN m.side = 'a' THEN g.cnt ELSE 0 END) AS na,
               sum(CASE WHEN m.side = 'b' THEN g.cnt ELSE 0 END) AS nb
        FROM g JOIN mem m ON g.event_type = m.t
        GROUP BY 1, 2, 3
    ),
    r AS (
        SELECT ta, tb, na, nb, na + nb AS nt,
               2 * sum(na + nb) OVER (PARTITION BY ta, tb ORDER BY cv
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
                 - (na + nb) + 1 AS rank2
        FROM pv
    ),
    s AS (
        SELECT ta, tb, sum(na) AS n1, sum(nb) AS n2,
               sum(na * rank2) AS r12,
               sum(nt * nt * nt - nt) AS tsum
        FROM r GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           round(CAST(r12 - n1 * (n1 + 1) AS DOUBLE) / 2.0, 1) AS u_stat,
           round(CAST(r12 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
                 / (2.0 * sqrt(CAST(n1 * n2 AS DOUBLE)
                     * (CAST((n1 + n2 + 1) * (n1 + n2) * (n1 + n2 - 1)
                             AS DOUBLE) - CAST(tsum AS DOUBLE))
                     / (12.0 * CAST(n1 + n2 AS DOUBLE)
                        * CAST(n1 + n2 - 1 AS DOUBLE)))), 4) AS z_stat
    FROM s
"""
QUERIES["mann_whitney_u"] = mann_whitney_u


# --------------------------------------------------------------------------
# kruskal_wallis
# --------------------------------------------------------------------------


def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does ``events.value`` differ across the five
    event types?  One pooled midrank frame on the cent grid; per-group
    doubled rank sums R2_g stay exact integers, H uses the doubled-rank
    identity H = 3/(N(N+1)) * sum R2_g^2/n_g - 3(N+1), and the tie
    correction divides by 1 - sum(t^3 - t)/(N^3 - N).

    Scale: the pooled rank window runs ONCE on the range-bounded cent grid
    (not per pair); group count is event-type cardinality (5), so the
    final reduction is a 5-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pooled = g.groupBy("cv").agg(F.sum("cnt").alias("nt"))
    w = Window.orderBy("cv").rowsBetween(Window.unboundedPreceding, 0)
    ranked = pooled.withColumn(
        "rank2", F.lit(2) * F.sum("nt").over(w) - F.col("nt") + F.lit(1)
    )
    per_group = (
        g.join(ranked.select("cv", "rank2"), "cv")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("ng"),
            F.sum(F.col("cnt").cast(_DEC) * F.col("rank2").cast(_DEC)).alias("r2g"),
        )
    )
    ties = pooled.agg(
        F.sum(
            F.col("nt").cast(_DEC) * F.col("nt").cast(_DEC) * F.col("nt").cast(_DEC)
            - F.col("nt").cast(_DEC)
        ).alias("tsum")
    )
    # sum over the 5-row group frame; R2_g^2/n_g is a per-row scalar from
    # exact integers, the cross-group sum is order-pinned by the orderBy
    # cumsum (take the last row) so both engines fold identically
    wg = Window.orderBy("event_type").rowsBetween(Window.unboundedPreceding, 0)
    folded = (
        per_group.withColumn(
            "term",
            F.col("r2g").cast("double")
            * F.col("r2g").cast("double")
            / F.col("ng").cast("double"),
        )
        .withColumn("cum_term", F.sum("term").over(wg))
        .withColumn("cum_n", F.sum("ng").over(wg))
        .withColumn("k_seen", F.count(F.lit(1)).over(wg))
    )
    total = folded.orderBy(F.col("k_seen").desc()).limit(1)
    n = F.col("cum_n").cast("double")
    h = F.lit(3.0) * F.col("cum_term") / (n * (n + 1)) - F.lit(3.0) * (n + 1)
    c = F.lit(1.0) - F.col("tsum").cast("double") / (n * n * n - n)
    return total.crossJoin(F.broadcast(ties)).select(
        F.col("cum_n").cast("bigint").alias("n_total"),
        (F.col("k_seen") - 1).cast("int").alias("df"),
        F.round(h, 4).alias("h_stat"),
        F.round(h / c, 4).alias("h_tie_corrected"),
    )


ORACLES["kruskal_wallis"] = """
    WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    pooled AS (SELECT cv, sum(cnt) AS nt FROM g GROUP BY 1),
    ranked AS (
        SELECT cv, nt,
               2 * sum(nt) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) - nt + 1 AS rank2
        FROM pooled
    ),
    pg AS (
        SELECT g.event_type, sum(g.cnt) AS ng, sum(g.cnt * r.rank2) AS r2g
        FROM g JOIN ranked r ON g.cv = r.cv
        GROUP BY 1
    ),
    ties AS (SELECT sum(nt * nt * nt - nt) AS tsum FROM pooled),
    folded AS (
        SELECT sum(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                   / CAST(ng AS DOUBLE))
                 OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_term,
               sum(ng) OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum_n,
               count(*) OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS k_seen
        FROM pg
    ),
    total AS (
        SELECT * FROM folded ORDER BY k_seen DESC LIMIT 1
    )
    SELECT CAST(cum_n AS BIGINT) AS n_total,
           CAST(k_seen - 1 AS INT) AS df,
           round(3.0 * cum_term / (CAST(cum_n AS DOUBLE)
                                   * (CAST(cum_n AS DOUBLE) + 1))
                 - 3.0 * (CAST(cum_n AS DOUBLE) + 1), 4) AS h_stat,
           round((3.0 * cum_term / (CAST(cum_n AS DOUBLE)
                                    * (CAST(cum_n AS DOUBLE) + 1))
                  - 3.0 * (CAST(cum_n AS DOUBLE) + 1))
                 / (1.0 - CAST(tsum AS DOUBLE)
                    / (CAST(cum_n AS DOUBLE) * CAST(cum_n AS DOUBLE)
                       * CAST(cum_n AS DOUBLE) - CAST(cum_n AS DOUBLE))),
                 4) AS h_tie_corrected
    FROM total, ties
"""
QUERIES["kruskal_wallis"] = kruskal_wallis


# --------------------------------------------------------------------------
# mann_kendall_trend
# --------------------------------------------------------------------------


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily revenue series
    (sum of purchase values per day): S = sum of pairwise signs, exact
    tie-corrected variance, z with the standard continuity correction —
    the distribution-free twin of theil_sen_trend's slope.

    Exactness: daily revenue is an exact integer-cent sum; S and Var(S)
    are integer arithmetic; z is one scalar float expression.

    Scale: quadratic in DAYS (observation window), never in events — the
    theil_sen_trend bound.  The day frame is broadcast against itself.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    s = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("da") < F.col("db"))
        .agg(F.sum(F.signum(F.col("rb") - F.col("ra")).cast("long")).alias("s"))
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = daily.groupBy("rev").agg(F.count(F.lit(1)).alias("t")).agg(
        F.sum(
            F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
        ).alias("tcorr")
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (F.lit(2.0) * n + 5) - F.col("tcorr").cast("double")
    ) / F.lit(18.0)
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("s").cast("bigint").alias("s_stat"),
            F.round(var_s, 1).alias("var_s"),
            F.round(z, 4).alias("z_stat"),
            F.when(F.col("s") > 0, F.lit("increasing"))
            .when(F.col("s") < 0, F.lit("decreasing"))
            .otherwise(F.lit("no-trend"))
            .alias("trend"),
        )
    )


ORACLES["mann_kendall_trend"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    s AS (
        SELECT sum(CAST(sign(b.rev - a.rev) AS BIGINT)) AS s
        FROM daily a, daily b WHERE a.day < b.day
    ),
    nd AS (SELECT count(*) AS n FROM daily),
    ties AS (
        SELECT sum(t * (t - 1) * (2 * t + 5)) AS tcorr
        FROM (SELECT count(*) AS t FROM daily GROUP BY rev)
    )
    SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_stat,
           round((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                  * (2.0 * CAST(n AS DOUBLE) + 5)
                  - CAST(tcorr AS DOUBLE)) / 18.0, 1) AS var_s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(
                     (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                      * (2.0 * CAST(n AS DOUBLE) + 5)
                      - CAST(tcorr AS DOUBLE)) / 18.0)
                 WHEN s < 0 THEN (s + 1) / sqrt(
                     (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                      * (2.0 * CAST(n AS DOUBLE) + 5)
                      - CAST(tcorr AS DOUBLE)) / 18.0)
                 ELSE 0.0 END, 4) AS z_stat,
           CASE WHEN s > 0 THEN 'increasing'
                WHEN s < 0 THEN 'decreasing'
                ELSE 'no-trend' END AS trend
    FROM s, nd, ties
"""
QUERIES["mann_kendall_trend"] = mann_kendall_trend


# --------------------------------------------------------------------------
# log_rank_test
# --------------------------------------------------------------------------


def log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing signup -> first-purchase survival between
    the even- and odd-``user_id`` cohorts (the deterministic A/A-style
    split): chi-square = (O1 - E1)^2 / V with hypergeometric per-day
    variance — the standard two-curve comparison over kaplan_meier's
    duration construction.

    Determinism: per-day E/V terms are doubles, folded with an ORDERED
    cumulative sum over the day frame (kaplan_meier pattern) so both
    engines add in the same sequence; O1 and the risk-set counts are exact
    integers.

    Scale: the event log reduces to one row per user (two min-aggregates),
    then to the duration-day frame; every window runs on that bounded
    frame.
    """
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    per_user = (
        signups.join(purchases, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col("user_id") % 2).cast("int").alias("grp"),
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(F.col("p_ts").cast("date"), F.col("s_ts").cast("date")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("s_ts").cast("date")))
            .cast("long")
            .alias("dur"),
            F.col("p_ts").isNotNull().cast("long").alias("observed"),
        )
    )
    # day-cardinality cut (kaplan_meier r11 pattern): day feeds totals AND
    # the risk frame — the events->per_user chain otherwise ran twice.
    day = per_user.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("x0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("grp") == 0, F.col("observed")).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("grp") == 1, F.col("observed")).otherwise(0)).alias("d1"),
    ).localCheckpoint(eager=True)
    totals = day.agg(
        F.sum("x0").alias("t0"), F.sum("x1").alias("t1")
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        day.crossJoin(F.broadcast(totals))
        .withColumn("n0", F.col("t0") - F.coalesce(F.sum("x0").over(w_prev), F.lit(0)))
        .withColumn("n1", F.col("t1") - F.coalesce(F.sum("x1").over(w_prev), F.lit(0)))
        .withColumn("nt", F.col("n0") + F.col("n1"))
        .withColumn("dt", F.col("d0") + F.col("d1"))
        .filter(F.col("dt") > 0)
    )
    ntd, n1d, n0d, dtd = (
        F.col("nt").cast("double"),
        F.col("n1").cast("double"),
        F.col("n0").cast("double"),
        F.col("dt").cast("double"),
    )
    e1 = dtd * n1d / ntd
    v = F.when(
        F.col("nt") > 1,
        dtd * (n1d / ntd) * (n0d / ntd) * (ntd - dtd) / (ntd - 1),
    ).otherwise(F.lit(0.0))
    folded = (
        risk.withColumn("cum_e1", F.sum(e1).over(w_cum))
        .withColumn("cum_v", F.sum(v).over(w_cum))
        .withColumn("cum_o1", F.sum("d1").over(w_cum))
        .withColumn("rows_seen", F.count(F.lit(1)).over(w_cum))
    )
    last = folded.orderBy(F.col("rows_seen").desc()).limit(1)
    chi2 = (
        (F.col("cum_o1").cast("double") - F.col("cum_e1"))
        * (F.col("cum_o1").cast("double") - F.col("cum_e1"))
        / F.col("cum_v")
    )
    return last.select(
        F.col("t0").cast("bigint").alias("n_even"),
        F.col("t1").cast("bigint").alias("n_odd"),
        F.col("cum_o1").cast("bigint").alias("observed_odd"),
        F.round("cum_e1", 4).alias("expected_odd"),
        F.round("cum_v", 4).alias("variance"),
        F.round(chi2, 4).alias("chi2"),
    )


ORACLES["log_rank_test"] = """
    WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    signups AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    purchases AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN signups s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
        GROUP BY 1
    ),
    per_user AS (
        SELECT CAST(s.user_id % 2 AS INT) AS grp,
               CAST(CASE WHEN p.p_ts IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(p.p_ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE), h.h)
               END AS BIGINT) AS dur,
               CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM signups s LEFT JOIN purchases p ON s.user_id = p.user_id
        CROSS JOIN horizon h
    ),
    day AS (
        SELECT dur,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS x0,
               sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS x1,
               sum(CASE WHEN grp = 0 THEN observed ELSE 0 END) AS d0,
               sum(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS d1
        FROM per_user GROUP BY 1
    ),
    totals AS (SELECT sum(x0) AS t0, sum(x1) AS t1 FROM day),
    risk AS (
        SELECT day.*, totals.t0, totals.t1,
               t0 - COALESCE(sum(x0) OVER (ORDER BY dur ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0,
               t1 - COALESCE(sum(x1) OVER (ORDER BY dur ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
        FROM day, totals
    ),
    terms AS (
        SELECT *, n0 + n1 AS nt, d0 + d1 AS dt FROM risk
        WHERE d0 + d1 > 0
    ),
    folded AS (
        SELECT t0, t1,
               sum(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
                   / CAST(nt AS DOUBLE))
                 OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_e1,
               sum(CASE WHEN nt > 1 THEN CAST(dt AS DOUBLE)
                        * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                        * (CAST(n0 AS DOUBLE) / CAST(nt AS DOUBLE))
                        * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                        / (CAST(nt AS DOUBLE) - 1)
                   ELSE 0.0 END)
                 OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_v,
               sum(d1) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_o1,
               count(*) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS rows_seen
        FROM terms
    ),
    last AS (SELECT * FROM folded ORDER BY rows_seen DESC LIMIT 1)
    SELECT CAST(t0 AS BIGINT) AS n_even, CAST(t1 AS BIGINT) AS n_odd,
           CAST(cum_o1 AS BIGINT) AS observed_odd,
           round(cum_e1, 4) AS expected_odd,
           round(cum_v, 4) AS variance,
           round((CAST(cum_o1 AS DOUBLE) - cum_e1)
                 * (CAST(cum_o1 AS DOUBLE) - cum_e1) / cum_v, 4) AS chi2
    FROM last
"""
QUERIES["log_rank_test"] = log_rank_test


# --------------------------------------------------------------------------
# t_closeness
# --------------------------------------------------------------------------

T_CLOSE_THRESHOLD = 0.2


def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the k_anonymity / l_diversity trio:
    for each quasi-identifier group (market segment x nation), the
    Earth-Mover distance between the group's order-priority distribution
    and the global one, over the ordinal priority scale ('1-URGENT' <
    ... < '5-LOW', equal spacing).

    Ordinal EMD = sum_i |cumP_i - cumQ_i| / (m - 1).  Numerators are the
    exact integers |cum_g * N - cum_glob * n_g|; one final division.

    Scale: the fact join reduces to the (QI x priority) grid; the grid is
    completed by a broadcast cross of QI groups x priority levels so empty
    cells participate; every window runs per group on an m-row frame.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    # cell is consumed 5x (groups/levels/glob/n_total/grid join), but a
    # localCheckpoint cut was measured SLOWER solo (r11: 0.625 -> 0.814 s
    # min-of-3, stable canaries): the five consumers share the identical
    # groupBy subtree, so runtime ReusedExchange already dedupes the fact
    # reduce within the one job, and the eager cut only added a blocking
    # round-trip.  Deliberately left lazy.
    cell = j.groupBy("c_mktsegment", "c_nationkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    groups = cell.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum("cnt").alias("n_g")
    )
    levels = cell.select("o_orderpriority").distinct()
    wl = Window.orderBy("o_orderpriority").rowsBetween(Window.unboundedPreceding, 0)
    glob = (
        cell.groupBy("o_orderpriority")
        .agg(F.sum("cnt").alias("n_pr"))
        .withColumn("cum_glob", F.sum("n_pr").over(wl))
    )
    n_total = cell.agg(F.sum("cnt").alias("n_tot"))
    m_levels = levels.agg(F.count(F.lit(1)).alias("m"))
    grid = (
        groups.crossJoin(F.broadcast(levels))
        .join(cell, ["c_mktsegment", "c_nationkey", "o_orderpriority"], "left")
        .withColumn("c", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    wg = (
        Window.partitionBy("c_mktsegment", "c_nationkey")
        .orderBy("o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    emd = (
        grid.withColumn("cum_g", F.sum("c").over(wg))
        .join(F.broadcast(glob.select("o_orderpriority", "cum_glob")),
              "o_orderpriority")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "term",
            F.abs(
                F.col("cum_g").cast(_DEC) * F.col("n_tot").cast(_DEC)
                - F.col("cum_glob").cast(_DEC) * F.col("n_g").cast(_DEC)
            ),
        )
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.first("n_g").alias("n_g"),
            F.first("n_tot").alias("n_tot"),
            F.sum("term").alias("terms"),
        )
    )
    t = F.col("terms").cast("double") / (
        F.col("n_g").cast("double")
        * F.col("n_tot").cast("double")
        * (F.col("m").cast("double") - 1)
    )
    return emd.crossJoin(F.broadcast(m_levels)).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("n_g").cast("bigint").alias("n_orders"),
        F.round(t, 4).alias("t_close"),
        (t > T_CLOSE_THRESHOLD).alias("breach"),
    )


ORACLES["t_closeness"] = f"""
    WITH j AS (
        SELECT c_mktsegment, c_nationkey, o_orderpriority
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    cell AS (
        SELECT c_mktsegment, c_nationkey, o_orderpriority, count(*) AS cnt
        FROM j GROUP BY 1, 2, 3
    ),
    groups AS (
        SELECT c_mktsegment, c_nationkey, sum(cnt) AS n_g
        FROM cell GROUP BY 1, 2
    ),
    levels AS (SELECT DISTINCT o_orderpriority FROM cell),
    gdist AS (
        SELECT o_orderpriority,
               sum(sum(cnt)) OVER (ORDER BY o_orderpriority ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_glob
        FROM cell GROUP BY 1
    ),
    n_total AS (SELECT sum(cnt) AS n_tot FROM cell),
    m_levels AS (SELECT count(*) AS m FROM levels),
    grid AS (
        SELECT g.c_mktsegment, g.c_nationkey, g.n_g, l.o_orderpriority,
               COALESCE(c.cnt, 0) AS c
        FROM groups g CROSS JOIN levels l
        LEFT JOIN cell c ON c.c_mktsegment = g.c_mktsegment
                        AND c.c_nationkey = g.c_nationkey
                        AND c.o_orderpriority = l.o_orderpriority
    ),
    emd AS (
        SELECT c_mktsegment, c_nationkey,
               any_value(n_g) AS n_g, any_value(n_tot) AS n_tot,
               sum(abs(cum_g * n_tot - cum_glob * n_g)) AS terms
        FROM (
            SELECT grid.*, n_total.n_tot, gdist.cum_glob,
                   sum(c) OVER (PARTITION BY grid.c_mktsegment,
                                grid.c_nationkey
                                ORDER BY grid.o_orderpriority
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_g
            FROM grid
            JOIN gdist ON grid.o_orderpriority = gdist.o_orderpriority
            CROSS JOIN n_total
        )
        GROUP BY 1, 2
    )
    SELECT c_mktsegment AS segment,
           CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(n_g AS BIGINT) AS n_orders,
           round(CAST(terms AS DOUBLE)
                 / (CAST(n_g AS DOUBLE) * CAST(n_tot AS DOUBLE)
                    * (CAST(m AS DOUBLE) - 1)), 4) AS t_close,
           CAST(terms AS DOUBLE)
             / (CAST(n_g AS DOUBLE) * CAST(n_tot AS DOUBLE)
                * (CAST(m AS DOUBLE) - 1)) > {T_CLOSE_THRESHOLD} AS breach
    FROM emd, m_levels
"""
QUERIES["t_closeness"] = t_closeness


# --------------------------------------------------------------------------
# js_divergence_sources
# --------------------------------------------------------------------------


def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source word
    distributions — the probabilistic redundancy measure next to the
    set-based vocab_overlap_sources (two sources can share 100% of their
    vocabulary yet have very different usage frequencies).

    Closed-form one-sided mass: only the shared-word join materializes;
    for words present in one source only, sum p*ln(2p/(p+0)) = p*ln 2, so
    JS = 0.5 * [sum_shared terms + (1 - P_shared)*ln 2 +
    (1 - Q_shared)*ln 2].  Per-word probabilities are single exact
    divisions; the per-pair sum is floats rounded to 4 (welch_t_test
    float-parity precedent).

    Scale: word counts reduce to the (source, word) grid once; the pair
    join is word-keyed over the vocabulary; output is one row per source
    pair.
    """
    from ..functions.texts import words

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = wc.groupBy("source").agg(F.sum("c").alias("n"))
    a = wc.join(F.broadcast(tot), "source").select(
        F.col("source").alias("sa"), "w", F.col("c").alias("ca"),
        F.col("n").alias("na"),
    )
    b = wc.join(F.broadcast(tot), "source").select(
        F.col("source").alias("sb"), "w", F.col("c").alias("cb"),
        F.col("n").alias("nb"),
    )
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    shared = (
        a.join(b, "w")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.sum(
                p * F.log(F.lit(2.0) * p / (p + q))
                + q * F.log(F.lit(2.0) * q / (p + q))
            ).alias("ts"),
            F.sum(p).alias("pb"),
            F.sum(q).alias("qb"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
        )
    )
    ta = tot.select(F.col("source").alias("sa"))
    tb = tot.select(F.col("source").alias("sb"))
    pairs = ta.crossJoin(F.broadcast(tb)).filter(F.col("sa") < F.col("sb"))
    full = (
        pairs.join(shared, ["sa", "sb"], "left")
        .withColumn("ts", F.coalesce(F.col("ts"), F.lit(0.0)))
        .withColumn("pb", F.coalesce(F.col("pb"), F.lit(0.0)))
        .withColumn("qb", F.coalesce(F.col("qb"), F.lit(0.0)))
        .withColumn("n_shared", F.coalesce(F.col("n_shared"), F.lit(0)))
    )
    ln2 = 0.6931471805599453
    js = F.lit(0.5) * (
        F.col("ts")
        + (F.lit(1.0) - F.col("pb")) * F.lit(ln2)
        + (F.lit(1.0) - F.col("qb")) * F.lit(ln2)
    )
    return full.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        F.col("n_shared").cast("bigint").alias("n_shared_words"),
        F.round(js, 4).alias("js_divergence"),
        F.round(js / F.lit(ln2), 4).alias("js_normalized"),
    )


_W = "regexp_split_to_array(trim(text), '\\s+')"

ORACLES["js_divergence_sources"] = f"""
    WITH wc AS (
        SELECT source, w, count(*) AS c
        FROM (SELECT source, unnest({_W}) AS w FROM documents)
        GROUP BY 1, 2
    ),
    tot AS (SELECT source, sum(c) AS n FROM wc GROUP BY 1),
    shared AS (
        SELECT a.source AS sa, b.source AS sb,
               sum((CAST(a.c AS DOUBLE) / ta.n)
                   * ln(2.0 * (CAST(a.c AS DOUBLE) / ta.n)
                        / (CAST(a.c AS DOUBLE) / ta.n
                           + CAST(b.c AS DOUBLE) / tb.n))
                 + (CAST(b.c AS DOUBLE) / tb.n)
                   * ln(2.0 * (CAST(b.c AS DOUBLE) / tb.n)
                        / (CAST(a.c AS DOUBLE) / ta.n
                           + CAST(b.c AS DOUBLE) / tb.n))) AS ts,
               sum(CAST(a.c AS DOUBLE) / ta.n) AS pb,
               sum(CAST(b.c AS DOUBLE) / tb.n) AS qb,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM wc a
        JOIN wc b ON a.w = b.w AND a.source < b.source
        JOIN tot ta ON ta.source = a.source
        JOIN tot tb ON tb.source = b.source
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.source AS sa, b.source AS sb
        FROM tot a, tot b WHERE a.source < b.source
    )
    SELECT p.sa AS source_a, p.sb AS source_b,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared_words,
           round(0.5 * (COALESCE(s.ts, 0)
                 + (1.0 - COALESCE(s.pb, 0)) * ln(2.0)
                 + (1.0 - COALESCE(s.qb, 0)) * ln(2.0)), 4) AS js_divergence,
           round(0.5 * (COALESCE(s.ts, 0)
                 + (1.0 - COALESCE(s.pb, 0)) * ln(2.0)
                 + (1.0 - COALESCE(s.qb, 0)) * ln(2.0)) / ln(2.0),
                 4) AS js_normalized
    FROM pairs p LEFT JOIN shared s ON p.sa = s.sa AND p.sb = s.sb
"""
QUERIES["js_divergence_sources"] = js_divergence_sources


# --------------------------------------------------------------------------
# wave I: classic ANOVA-family tests + rate intervals
# --------------------------------------------------------------------------


def anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of order value across the five customer
    market segments — the k-group mean comparison next to welch_t_test's
    pairwise version: F = (SSB/(k-1)) / (SSW/(N-k)), with effect size
    eta^2 = SSB/SST.

    Exactness: group sums / sums of squares are exact integer cents
    (decimal(38,0)); SSB/SSW are scalar expressions over them, folded
    across the 5-row group frame with an ORDER-PINNED cumulative sum.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    g = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_DEC)).alias("s"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).alias("ss"),
    )
    wg = Window.orderBy("c_mktsegment").rowsBetween(Window.unboundedPreceding, 0)
    folded = (
        g.withColumn("k", F.count(F.lit(1)).over(wg))
        .withColumn("tn", F.sum("n").over(wg))
        .withColumn("ts", F.sum("s").over(wg))
        .withColumn("tss", F.sum("ss").over(wg))
        .withColumn(
            "sb",
            F.sum(
                F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n").cast("double")
            ).over(wg),
        )
    )
    last = folded.orderBy(F.col("k").desc()).limit(1)
    tn = F.col("tn").cast("double")
    ts_, tss = F.col("ts").cast("double"), F.col("tss").cast("double")
    ssb = F.col("sb") - ts_ * ts_ / tn
    ssw = tss - F.col("sb")
    sst = tss - ts_ * ts_ / tn
    kd = F.col("k").cast("double")
    f_stat = (ssb / (kd - 1)) / (ssw / (tn - kd))
    return last.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("tn").cast("bigint").alias("n_total"),
        F.round(f_stat, 4).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


ORACLES["anova_f_oneway"] = """
    WITH j AS (
        SELECT c_mktsegment,
               CAST(round(o_totalprice * 100) AS BIGINT) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    g AS (
        SELECT c_mktsegment, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
        FROM j GROUP BY 1
    ),
    folded AS (
        SELECT count(*) OVER wg AS k, sum(n) OVER wg AS tn,
               sum(s) OVER wg AS ts, sum(ss) OVER wg AS tss,
               sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) OVER wg AS sb
        FROM g
        WINDOW wg AS (ORDER BY c_mktsegment ROWS BETWEEN UNBOUNDED
                      PRECEDING AND CURRENT ROW)
    ),
    last AS (SELECT * FROM folded ORDER BY k DESC LIMIT 1)
    SELECT CAST(k AS INT) AS n_groups, CAST(tn AS BIGINT) AS n_total,
           round(((sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
                        / CAST(tn AS DOUBLE)) / (k - 1))
                 / ((CAST(tss AS DOUBLE) - sb) / (CAST(tn AS DOUBLE) - k)),
                 4) AS f_stat,
           round((sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
                       / CAST(tn AS DOUBLE))
                 / (CAST(tss AS DOUBLE) - CAST(ts AS DOUBLE)
                    * CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)), 6)
             AS eta_squared
    FROM last
"""
QUERIES["anova_f_oneway"] = anova_f_oneway


def levene_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test for equal order-value
    variances across market segments: one-way ANOVA F on the absolute
    deviations from each group's median — the robust heteroscedasticity
    gate run before trusting a pooled-variance test.

    Exactness: medians of integer cents are exact half-integers on both
    engines (average of the two middle order statistics); deviations are
    computed in doubled cents |2x - 2*med| so they stay exact integers;
    the ANOVA on deviations then follows the exact-moment pattern.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    med = j.groupBy("c_mktsegment").agg(
        F.percentile(F.col("x"), F.lit(0.5)).alias("med")
    )
    dev = j.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        F.abs(
            F.lit(2) * F.col("x") - F.round(F.lit(2) * F.col("med")).cast("long")
        ).alias("z"),
    )
    g = dev.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("z").cast(_DEC)).alias("s"),
        F.sum(F.col("z").cast(_DEC) * F.col("z").cast(_DEC)).alias("ss"),
    )
    wg = Window.orderBy("c_mktsegment").rowsBetween(Window.unboundedPreceding, 0)
    folded = (
        g.withColumn("k", F.count(F.lit(1)).over(wg))
        .withColumn("tn", F.sum("n").over(wg))
        .withColumn("ts", F.sum("s").over(wg))
        .withColumn("tss", F.sum("ss").over(wg))
        .withColumn(
            "sb",
            F.sum(
                F.col("s").cast("double") * F.col("s").cast("double")
                / F.col("n").cast("double")
            ).over(wg),
        )
    )
    last = folded.orderBy(F.col("k").desc()).limit(1)
    tn = F.col("tn").cast("double")
    ts_, tss = F.col("ts").cast("double"), F.col("tss").cast("double")
    ssb = F.col("sb") - ts_ * ts_ / tn
    ssw = tss - F.col("sb")
    kd = F.col("k").cast("double")
    w_stat = (ssb / (kd - 1)) / (ssw / (tn - kd))
    return last.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("tn").cast("bigint").alias("n_total"),
        F.round(w_stat, 4).alias("levene_w"),
    )


ORACLES["levene_variance_test"] = """
    WITH j AS (
        SELECT c_mktsegment,
               CAST(round(o_totalprice * 100) AS BIGINT) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    med AS (
        SELECT c_mktsegment, median(x) AS med FROM j GROUP BY 1
    ),
    dev AS (
        SELECT j.c_mktsegment,
               abs(2 * j.x - CAST(round(2 * m.med) AS BIGINT)) AS z
        FROM j JOIN med m ON j.c_mktsegment = m.c_mktsegment
    ),
    g AS (
        SELECT c_mktsegment, count(*) AS n, sum(z) AS s, sum(z * z) AS ss
        FROM dev GROUP BY 1
    ),
    folded AS (
        SELECT count(*) OVER wg AS k, sum(n) OVER wg AS tn,
               sum(s) OVER wg AS ts, sum(ss) OVER wg AS tss,
               sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) OVER wg AS sb
        FROM g
        WINDOW wg AS (ORDER BY c_mktsegment ROWS BETWEEN UNBOUNDED
                      PRECEDING AND CURRENT ROW)
    ),
    last AS (SELECT * FROM folded ORDER BY k DESC LIMIT 1)
    SELECT CAST(k AS INT) AS n_groups, CAST(tn AS BIGINT) AS n_total,
           round(((sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
                        / CAST(tn AS DOUBLE)) / (k - 1))
                 / ((CAST(tss AS DOUBLE) - sb) / (CAST(tn AS DOUBLE) - k)),
                 4) AS levene_w
    FROM last
"""
QUERIES["levene_variance_test"] = levene_variance_test


WILSON_Z = 1.96


def wilson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the URGENT-priority order
    rate per market segment — the small-sample-safe proportion interval
    (never escapes [0, 1], unlike the Wald interval) a metrics platform
    should default to.

    Exactness: k and n are exact counts; the Wilson center/halfwidth is
    one scalar expression over them.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("o_orderpriority") == "1-URGENT").cast("long")
            ).alias("k"),
        )
    )
    nd, kd = F.col("n").cast("double"), F.col("k").cast("double")
    z2 = WILSON_Z * WILSON_Z
    p = kd / nd
    denom = 1 + F.lit(z2) / nd
    center = (p + F.lit(z2) / (2 * nd)) / denom
    hw = (
        F.lit(WILSON_Z)
        * F.sqrt(p * (1 - p) / nd + F.lit(z2) / (4 * nd * nd))
        / denom
    )
    return g.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("k").cast("bigint").alias("n_urgent"),
        F.round(p, 4).alias("rate"),
        F.round(center - hw, 4).alias("ci_lo"),
        F.round(center + hw, 4).alias("ci_hi"),
    )


ORACLES["wilson_rate_ci"] = f"""
    WITH g AS (
        SELECT c_mktsegment, count(*) AS n,
               sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                 AS k
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    )
    SELECT c_mktsegment AS segment,
           CAST(n AS BIGINT) AS n_orders, CAST(k AS BIGINT) AS n_urgent,
           round(CAST(k AS DOUBLE) / n, 4) AS rate,
           round(((CAST(k AS DOUBLE) / n + {WILSON_Z * WILSON_Z} / (2.0 * n))
                  / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE)))
                 - ({WILSON_Z} * sqrt((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {WILSON_Z * WILSON_Z} / (4.0 * n * n))
                    / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE))),
                 4) AS ci_lo,
           round(((CAST(k AS DOUBLE) / n + {WILSON_Z * WILSON_Z} / (2.0 * n))
                  / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE)))
                 + ({WILSON_Z} * sqrt((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {WILSON_Z * WILSON_Z} / (4.0 * n * n))
                    / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE))),
                 4) AS ci_hi
    FROM g
"""
QUERIES["wilson_rate_ci"] = wilson_rate_ci


# --------------------------------------------------------------------------
# wave J: categorical association matrix
# --------------------------------------------------------------------------

_CVM_PAIRS = (
    ("segment|priority", "c_mktsegment", "o_orderpriority"),
    ("segment|status", "c_mktsegment", "o_orderstatus"),
    ("priority|status", "o_orderpriority", "o_orderstatus"),
    ("segment|region", "c_mktsegment", "r_name"),
    ("priority|region", "o_orderpriority", "r_name"),
    ("status|region", "o_orderstatus", "r_name"),
)


def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association matrix over the categorical order/customer
    attributes (segment, priority, status, region) — the categorical
    twin of correlation_matrix: V = sqrt(chi2 / (N * (min(R,C) - 1)))
    with chi2 = N * (sum o_ij^2/(r_i c_j) - 1).

    Exactness: contingency cells and margins are exact integers; the
    per-cell terms fold with an ORDER-PINNED cumulative sum per pair
    (cells per pair are level-product bounded).

    Scale: ONE pass over the fact join — each joined row explodes into
    its six (pair, a, b) structs inside the scan stage (a 6-branch union
    of projections of the same base, the previous shape, re-ran the
    orders scan + joins per branch when exchange reuse didn't fire); the
    level-bounded contingency frame is then materialized once, since
    row/column margins, totals, and the term fold all consume it.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(pair).alias("pair"),
                F.col(a).cast("string").alias("av"),
                F.col(b).cast("string").alias("bv"),
            )
            for pair, a, b in _CVM_PAIRS
        ]
    )
    long = base.select(F.explode(pair_structs).alias("p")).select(
        "p.pair", "p.av", "p.bv"
    )
    # r12 audit: the single-explode-pass + this checkpoint already hold
    # (16-Exchange plan, one orders scan); margins/totals/term-fold all
    # consume the materialized cell frame. No further cut available.
    cells = (
        long.groupBy("pair", "av", "bv")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    rtot = cells.groupBy("pair", "av").agg(F.sum("o").alias("rt"))
    ctot = cells.groupBy("pair", "bv").agg(F.sum("o").alias("ct"))
    ntot = cells.groupBy("pair").agg(
        F.sum("o").alias("n"),
        F.countDistinct("av").alias("rl"),
        F.countDistinct("bv").alias("cl"),
    )
    wp = Window.partitionBy("pair").orderBy("av", "bv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    terms = (
        cells.join(rtot, ["pair", "av"])
        .join(ctot, ["pair", "bv"])
        .withColumn(
            "term",
            F.col("o").cast("double")
            * F.col("o").cast("double")
            / (F.col("rt").cast("double") * F.col("ct").cast("double")),
        )
        .withColumn("sterm", F.sum("term").over(wp))
        .withColumn("rs", F.count(F.lit(1)).over(wp))
    )
    wlast = Window.partitionBy("pair").orderBy(F.col("rs").desc())
    last = (
        terms.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("pair", "sterm")
        .join(F.broadcast(ntot), "pair")
    )
    nd = F.col("n").cast("double")
    chi2 = nd * (F.col("sterm") - 1)
    mindim = F.least("rl", "cl").cast("double") - 1
    v = F.sqrt(F.greatest(chi2, F.lit(0.0)) / (nd * mindim))
    return last.select(
        "pair",
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("rl").cast("int").alias("levels_a"),
        F.col("cl").cast("int").alias("levels_b"),
        F.round(chi2, 4).alias("chi2"),
        F.round(v, 4).alias("cramers_v"),
    )


def _cvm_oracle() -> str:
    arms = "\n        UNION ALL\n".join(
        f"""        SELECT '{pair}' AS pair, CAST({a} AS VARCHAR) AS av,
               CAST({b} AS VARCHAR) AS bv FROM base"""
        for pair, a, b in _CVM_PAIRS
    )
    return f"""
    WITH base AS (
        SELECT c_mktsegment, o_orderpriority, o_orderstatus, r_name
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    ),
    long AS (
{arms}
    ),
    cells AS (
        SELECT pair, av, bv, count(*) AS o FROM long GROUP BY 1, 2, 3
    ),
    rtot AS (SELECT pair, av, sum(o) AS rt FROM cells GROUP BY 1, 2),
    ctot AS (SELECT pair, bv, sum(o) AS ct FROM cells GROUP BY 1, 2),
    ntot AS (
        SELECT pair, sum(o) AS n, count(DISTINCT av) AS rl,
               count(DISTINCT bv) AS cl
        FROM cells GROUP BY 1
    ),
    terms AS (
        SELECT c.pair,
               sum(CAST(c.o AS DOUBLE) * CAST(c.o AS DOUBLE)
                   / (CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE)))
                 OVER (PARTITION BY c.pair ORDER BY c.av, c.bv
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sterm,
               count(*) OVER (PARTITION BY c.pair ORDER BY c.av, c.bv
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS rs
        FROM cells c
        JOIN rtot r ON c.pair = r.pair AND c.av = r.av
        JOIN ctot t ON c.pair = t.pair AND c.bv = t.bv
    ),
    last AS (
        SELECT pair, sterm FROM (
            SELECT pair, sterm,
                   row_number() OVER (PARTITION BY pair
                                      ORDER BY rs DESC) AS rn
            FROM terms
        ) WHERE rn = 1
    )
    SELECT l.pair, CAST(n.n AS BIGINT) AS n_rows,
           CAST(n.rl AS INT) AS levels_a, CAST(n.cl AS INT) AS levels_b,
           round(CAST(n.n AS DOUBLE) * (l.sterm - 1), 4) AS chi2,
           round(sqrt(greatest(CAST(n.n AS DOUBLE) * (l.sterm - 1), 0.0)
                      / (CAST(n.n AS DOUBLE)
                         * (least(n.rl, n.cl) - 1))), 4) AS cramers_v
    FROM last l JOIN ntot n ON l.pair = n.pair
"""


ORACLES["cramers_v_matrix"] = _cvm_oracle()
QUERIES["cramers_v_matrix"] = cramers_v_matrix


# --------------------------------------------------------------------------
# wave J: iterative proportional fitting (survey raking)
# --------------------------------------------------------------------------

IPF_ROUNDS = 3


def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking by iterative proportional fitting: re-weight the
    ORDER sample's (segment x region) cells so the weighted counts match
    the CUSTOMER population margins on both axes — the standard
    post-stratification correction when a behavioral sample over-represents
    active segments.

    IPF_ROUNDS alternating row/column scalings; every margin sum folds
    with an ORDER-PINNED cumulative window (cells are level-bounded), so
    the float iteration is bit-identical across engines; the oracle
    unrolls the same six steps as CTEs (the bellman_ford unrolling
    pattern).

    Scale: the fact join reduces to the level-product cell frame ONCE;
    the iteration runs entirely on that bounded frame.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    nt = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cust = (
        c.join(F.broadcast(nt), c.c_nationkey == nt.n_nationkey)
        .join(F.broadcast(r), nt.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_mktsegment", "r_name")
    )
    # the cell frame is level-bounded (25 rows); materialize it once so
    # the iteration's two references per round never recompute the fact
    # join, and re-materialize per round to keep the plan linear
    cells = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "r_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    seg_t = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("t"))
    reg_t = cust.groupBy("r_name").agg(F.count(F.lit(1)).alias("u"))
    w_seg = Window.partitionBy("c_mktsegment").orderBy("r_name").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_seg_last = Window.partitionBy("c_mktsegment").orderBy(
        F.col("rs").desc()
    )
    w_reg = Window.partitionBy("r_name").orderBy("c_mktsegment").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_reg_last = Window.partitionBy("r_name").orderBy(F.col("rs").desc())
    cur = cells
    for _ in range(IPF_ROUNDS):
        srow = (
            cur.withColumn(
                "s", F.sum(F.col("w") * F.col("n").cast("double")).over(w_seg)
            )
            .withColumn("rs", F.count(F.lit(1)).over(w_seg))
            .withColumn("rn", F.row_number().over(w_seg_last))
        )
        row_tot = srow.filter(F.col("rn") == 1).select("c_mktsegment", "s")
        cur = (
            cur.join(F.broadcast(row_tot), "c_mktsegment")
            .join(F.broadcast(seg_t), "c_mktsegment")
            .withColumn(
                "w", F.col("w") * F.col("t").cast("double") / F.col("s")
            )
            .select("c_mktsegment", "r_name", "n", "w")
        )
        scol = (
            cur.withColumn(
                "s", F.sum(F.col("w") * F.col("n").cast("double")).over(w_reg)
            )
            .withColumn("rs", F.count(F.lit(1)).over(w_reg))
            .withColumn("rn", F.row_number().over(w_reg_last))
        )
        col_tot = scol.filter(F.col("rn") == 1).select("r_name", "s")
        cur = (
            cur.join(F.broadcast(col_tot), "r_name")
            .join(F.broadcast(reg_t), "r_name")
            .withColumn(
                "w", F.col("w") * F.col("u").cast("double") / F.col("s")
            )
            .select("c_mktsegment", "r_name", "n", "w")
            .localCheckpoint(eager=True)
        )
    return cur.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("r_name").alias("region"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") * F.col("n").cast("double"), 2).alias(
            "weighted_orders"
        ),
    )


def _ipf_oracle() -> str:
    ctes = [
        """cust AS (
            SELECT c_custkey, c_mktsegment, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        )""",
        """cells0 AS (
            SELECT c_mktsegment, r_name, count(*) AS n, 1.0 AS w
            FROM orders JOIN cust ON o_custkey = c_custkey
            GROUP BY 1, 2
        )""",
        """seg_t AS (SELECT c_mktsegment, count(*) AS t FROM cust
                     GROUP BY 1)""",
        """reg_t AS (SELECT r_name, count(*) AS u FROM cust GROUP BY 1)""",
    ]
    prev = "cells0"
    for i in range(1, IPF_ROUNDS + 1):
        # the running sum is strictly increasing (w*n > 0), so the final
        # fold value is max(s) — no nested-window row_number needed
        ctes.append(f"""rowtot{i} AS (
            SELECT c_mktsegment, max(s) AS s FROM (
                SELECT c_mktsegment,
                       sum(w * CAST(n AS DOUBLE)) OVER (
                           PARTITION BY c_mktsegment ORDER BY r_name
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                           ROW) AS s
                FROM {prev}
            ) GROUP BY 1
        )""")
        ctes.append(f"""rowstep{i} AS (
            SELECT p.c_mktsegment, p.r_name, p.n,
                   p.w * CAST(st.t AS DOUBLE) / rt.s AS w
            FROM {prev} p
            JOIN rowtot{i} rt ON p.c_mktsegment = rt.c_mktsegment
            JOIN seg_t st ON p.c_mktsegment = st.c_mktsegment
        )""")
        ctes.append(f"""coltot{i} AS (
            SELECT r_name, max(s) AS s FROM (
                SELECT r_name,
                       sum(w * CAST(n AS DOUBLE)) OVER (
                           PARTITION BY r_name ORDER BY c_mktsegment
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                           ROW) AS s
                FROM rowstep{i}
            ) GROUP BY 1
        )""")
        ctes.append(f"""cells{i} AS (
            SELECT p.c_mktsegment, p.r_name, p.n,
                   p.w * CAST(ut.u AS DOUBLE) / ct.s AS w
            FROM rowstep{i} p
            JOIN coltot{i} ct ON p.r_name = ct.r_name
            JOIN reg_t ut ON p.r_name = ut.r_name
        )""")
        prev = f"cells{i}"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT c_mktsegment AS segment, r_name AS region,
           CAST(n AS BIGINT) AS n_orders,
           round(w, 6) AS weight,
           round(w * CAST(n AS DOUBLE), 2) AS weighted_orders
    FROM {prev}
"""


ORACLES["ipf_raking"] = _ipf_oracle()
QUERIES["ipf_raking"] = ipf_raking


# --------------------------------------------------------------------------
# wave K: exact 1-D optimal transport
# --------------------------------------------------------------------------


def wasserstein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between the value
    distributions of every event-type pair: W1 = integral |F_a - F_b| =
    sum over the merged cent grid of |cumA/nA - cumB/nB| * gap — the
    metric drift measure that (unlike KS) weighs HOW FAR mass moved, in
    dollars.

    Exactness: the integrand's numerator |cumA*nB - cumB*nA| and the
    grid gaps are exact integers; the sum accumulates in decimal(38,0)
    and the only float op is the final division by nA*nB*100.

    Scale: reuses the mann_whitney_u frame shape — per-pair cumulative
    counts on the range-bounded cent grid; the pair explosion is a
    broadcast 10-row membership frame.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    ).agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=True)
    types = g.select("event_type").distinct()
    a = types.select(F.col("event_type").alias("ta"))
    b = types.select(F.col("event_type").alias("tb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("ta") < F.col("tb"))
    mem = pairs.select(
        "ta",
        "tb",
        F.explode(
            F.array(
                F.struct(F.col("ta").alias("t"), F.lit("a").alias("side")),
                F.struct(F.col("tb").alias("t"), F.lit("b").alias("side")),
            )
        ).alias("m"),
    ).select("ta", "tb", F.col("m.t").alias("t"), F.col("m.side").alias("side"))
    j = g.join(F.broadcast(mem), g.event_type == mem.t)
    pv = j.groupBy("ta", "tb", "cv").agg(
        F.sum(F.when(F.col("side") == "a", F.col("cnt")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("side") == "b", F.col("cnt")).otherwise(0)).alias("nb"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("ta", "tb").orderBy("cv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wlead = Window.partitionBy("ta", "tb").orderBy("cv")
    cum = (
        pv.withColumn("ca", F.sum("na").over(w))
        .withColumn("cb", F.sum("nb").over(w))
        .withColumn("gap", F.lead("cv").over(wlead) - F.col("cv"))
        .filter(F.col("gap").isNotNull())
    )
    tot = pv.groupBy("ta", "tb").agg(
        F.sum("na").alias("tna"), F.sum("nb").alias("tnb")
    )
    s = (
        cum.join(F.broadcast(tot), ["ta", "tb"])
        .withColumn(
            "piece",
            F.abs(
                F.col("ca").cast(_DEC) * F.col("tnb").cast(_DEC)
                - F.col("cb").cast(_DEC) * F.col("tna").cast(_DEC)
            )
            * F.col("gap").cast(_DEC),
        )
        .groupBy("ta", "tb")
        .agg(
            F.sum("piece").alias("num"),
            F.first("tna").alias("tna"),
            F.first("tnb").alias("tnb"),
        )
    )
    w1 = F.col("num").cast("double") / (
        F.col("tna").cast("double") * F.col("tnb").cast("double") * 100.0
    )
    return s.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("tna").cast("bigint").alias("n_a"),
        F.col("tnb").cast("bigint").alias("n_b"),
        F.round(w1, 4).alias("wasserstein_1"),
    )


ORACLES["wasserstein_pairs"] = """
    WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM g),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM types a, types b WHERE a.event_type < b.event_type
    ),
    mem AS (
        SELECT ta, tb, ta AS t, 'a' AS side FROM pairs
        UNION ALL
        SELECT ta, tb, tb AS t, 'b' AS side FROM pairs
    ),
    pv AS (
        SELECT m.ta, m.tb, g.cv,
               sum(CASE WHEN m.side = 'a' THEN g.cnt ELSE 0 END) AS na,
               sum(CASE WHEN m.side = 'b' THEN g.cnt ELSE 0 END) AS nb
        FROM g JOIN mem m ON g.event_type = m.t
        GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT ta, tb, cv,
               sum(na) OVER wc AS ca, sum(nb) OVER wc AS cb,
               lead(cv) OVER (PARTITION BY ta, tb ORDER BY cv) - cv AS gap
        FROM pv
        WINDOW wc AS (PARTITION BY ta, tb ORDER BY cv
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
        SELECT ta, tb, sum(na) AS tna, sum(nb) AS tnb
        FROM pv GROUP BY 1, 2
    ),
    s AS (
        SELECT c.ta, c.tb,
               sum(abs(c.ca * t.tnb - c.cb * t.tna) * c.gap) AS num,
               any_value(t.tna) AS tna, any_value(t.tnb) AS tnb
        FROM cum c JOIN tot t ON c.ta = t.ta AND c.tb = t.tb
        WHERE c.gap IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(tna AS BIGINT) AS n_a, CAST(tnb AS BIGINT) AS n_b,
           round(CAST(num AS DOUBLE)
                 / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE) * 100.0),
                 4) AS wasserstein_1
    FROM s
"""
QUERIES["wasserstein_pairs"] = wasserstein_pairs


# --------------------------------------------------------------------------
# wave L: stratification audits and gains analysis
# --------------------------------------------------------------------------


def simpson_reversal_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: for every market-segment pair, compare
    the URGENT-order-rate difference OVERALL against the difference
    WITHIN each region stratum; a pair where every non-tied stratum
    disagrees with the overall sign is a full reversal — aggregate
    conclusions that flip under stratification.

    Exactness: every sign is the sign of the exact integer cross product
    k_a*n_b - k_b*n_a — no rate division ever happens, so ties and signs
    are exact at any scale.

    Scale: one fact aggregation to the (segment x region) cell frame;
    pair logic runs on level-bounded frames with broadcast joins.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    nt = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nt), c.c_nationkey == nt.n_nationkey)
        .join(F.broadcast(r), nt.n_regionkey == r.r_regionkey)
        .select(
            "c_mktsegment",
            "r_name",
            (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("y"),
        )
    )
    # materialize the (segment x region) cell frame once: seg and both
    # pair sides of strata AND agree consume it — five re-expansions of
    # the fact join+aggregate otherwise (measured r11: 92-Exchange plan)
    cell = base.groupBy("c_mktsegment", "r_name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    ).localCheckpoint(eager=True)
    seg = cell.groupBy("c_mktsegment").agg(
        F.sum("n").alias("n"), F.sum("k").alias("k")
    )
    a = seg.select(
        F.col("c_mktsegment").alias("sa"), F.col("n").alias("na"),
        F.col("k").alias("ka"),
    )
    b = seg.select(
        F.col("c_mktsegment").alias("sb"), F.col("n").alias("nb"),
        F.col("k").alias("kb"),
    )
    overall = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("sa") < F.col("sb"))
        .withColumn(
            "sign_overall",
            F.signum(
                (F.col("ka").cast(_DEC) * F.col("nb").cast(_DEC)
                 - F.col("kb").cast(_DEC) * F.col("na").cast(_DEC))
                .cast("double")
            ).cast("int"),
        )
    )
    ca = cell.select(
        F.col("c_mktsegment").alias("sa"), "r_name",
        F.col("n").alias("sna"), F.col("k").alias("ska"),
    )
    cb = cell.select(
        F.col("c_mktsegment").alias("sb"), "r_name",
        F.col("n").alias("snb"), F.col("k").alias("skb"),
    )
    strata = (
        ca.join(cb, "r_name")
        .filter(F.col("sa") < F.col("sb"))
        .withColumn(
            "sign_stratum",
            F.signum(
                (F.col("ska").cast(_DEC) * F.col("snb").cast(_DEC)
                 - F.col("skb").cast(_DEC) * F.col("sna").cast(_DEC))
                .cast("double")
            ).cast("int"),
        )
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).alias("n_strata"),
            F.sum((F.col("sign_stratum") == 0).cast("int")).alias("n_tied"),
        )
    )
    agree = (
        ca.join(cb, "r_name")
        .filter(F.col("sa") < F.col("sb"))
        .join(
            F.broadcast(overall.select("sa", "sb", "sign_overall")),
            ["sa", "sb"],
        )
        .withColumn(
            "sign_stratum",
            F.signum(
                (F.col("ska").cast(_DEC) * F.col("snb").cast(_DEC)
                 - F.col("skb").cast(_DEC) * F.col("sna").cast(_DEC))
                .cast("double")
            ).cast("int"),
        )
        .groupBy("sa", "sb")
        .agg(
            F.sum(
                (
                    (F.col("sign_stratum") != 0)
                    & (F.col("sign_stratum") == F.col("sign_overall"))
                ).cast("int")
            ).alias("n_agree"),
            F.sum(
                (
                    (F.col("sign_stratum") != 0)
                    & (F.col("sign_stratum") == -F.col("sign_overall"))
                ).cast("int")
            ).alias("n_oppose"),
        )
    )
    return (
        overall.select("sa", "sb", "sign_overall")
        .join(strata, ["sa", "sb"])
        .join(agree, ["sa", "sb"])
        .select(
            F.col("sa").alias("segment_a"),
            F.col("sb").alias("segment_b"),
            "sign_overall",
            F.col("n_strata").cast("int").alias("n_strata"),
            F.col("n_agree").cast("int").alias("n_agree"),
            F.col("n_oppose").cast("int").alias("n_oppose"),
            F.col("n_tied").cast("int").alias("n_tied"),
            (
                (F.col("sign_overall") != 0)
                & (F.col("n_oppose") > 0)
                & (F.col("n_agree") == 0)
            ).alias("full_reversal"),
        )
    )


ORACLES["simpson_reversal_detect"] = """
    WITH base AS (
        SELECT c_mktsegment, r_name,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    ),
    cell AS (
        SELECT c_mktsegment, r_name, count(*) AS n, sum(y) AS k
        FROM base GROUP BY 1, 2
    ),
    seg AS (
        SELECT c_mktsegment, sum(n) AS n, sum(k) AS k FROM cell GROUP BY 1
    ),
    overall AS (
        SELECT a.c_mktsegment AS sa, b.c_mktsegment AS sb,
               CAST(sign(a.k * b.n - b.k * a.n) AS INT) AS sign_overall
        FROM seg a, seg b WHERE a.c_mktsegment < b.c_mktsegment
    ),
    st AS (
        SELECT a.c_mktsegment AS sa, b.c_mktsegment AS sb, a.r_name,
               CAST(sign(a.k * b.n - b.k * a.n) AS INT) AS sign_stratum
        FROM cell a JOIN cell b ON a.r_name = b.r_name
        WHERE a.c_mktsegment < b.c_mktsegment
    ),
    agg AS (
        SELECT st.sa, st.sb,
               count(*) AS n_strata,
               sum(CASE WHEN st.sign_stratum = 0 THEN 1 ELSE 0 END)
                 AS n_tied,
               sum(CASE WHEN st.sign_stratum != 0
                        AND st.sign_stratum = o.sign_overall
                   THEN 1 ELSE 0 END) AS n_agree,
               sum(CASE WHEN st.sign_stratum != 0
                        AND st.sign_stratum = -o.sign_overall
                   THEN 1 ELSE 0 END) AS n_oppose
        FROM st JOIN overall o ON st.sa = o.sa AND st.sb = o.sb
        GROUP BY 1, 2
    )
    SELECT a.sa AS segment_a, a.sb AS segment_b, o.sign_overall,
           CAST(a.n_strata AS INT) AS n_strata,
           CAST(a.n_agree AS INT) AS n_agree,
           CAST(a.n_oppose AS INT) AS n_oppose,
           CAST(a.n_tied AS INT) AS n_tied,
           (o.sign_overall != 0 AND a.n_oppose > 0 AND a.n_agree = 0)
             AS full_reversal
    FROM agg a JOIN overall o ON a.sa = o.sa AND a.sb = o.sb
"""
QUERIES["simpson_reversal_detect"] = simpson_reversal_detect


# --------------------------------------------------------------------------
# wave M: sequence prediction eval, extreme values, elasticity
# --------------------------------------------------------------------------


def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction accuracy of the first-order Markov model:
    transitions TRAIN on even-user_id journeys, the argmax next-state
    rule is EVALUATED on odd-user transitions — the sequence-model
    analogue of the classifier_eval tier (train/test split by the
    deterministic unit hash).

    Exactness: the argmax compares exact transition counts with
    destination tie-break (max_by on the (count, dst) struct); accuracy
    is a ratio of exact counts.

    Scale: one user-keyed lag window builds bigrams; training reduces to
    the state^2 frame; scoring joins test bigrams against the broadcast
    argmax rule.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    bigrams = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            (F.col("user_id") % 2 == 0).alias("is_train"),
            F.col("event_type").alias("src"),
            F.col("nxt").alias("dst"),
        )
    )
    rule = (
        bigrams.filter("is_train")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("src")
        .agg(
            F.max_by(
                F.col("dst"), F.struct(F.col("c"), F.col("dst"))
            ).alias("pred")
        )
    )
    test = bigrams.filter(~F.col("is_train"))
    scored = test.join(F.broadcast(rule), "src", "left")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum((F.col("pred") == F.col("dst")).cast("long"))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum((F.col("pred") == F.col("dst")).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("accuracy"),
    )


ORACLES["markov_next_event_accuracy"] = """
    WITH bigrams AS (
        SELECT user_id % 2 = 0 AS is_train, src, dst FROM (
            SELECT user_id, event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS dst
            FROM events
        ) WHERE dst IS NOT NULL
    ),
    counts AS (
        SELECT src, dst, count(*) AS c FROM bigrams
        WHERE is_train GROUP BY 1, 2
    ),
    rule AS (
        SELECT src, dst AS pred FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY c DESC, dst DESC) AS rn
            FROM counts
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT b.dst, r.pred FROM bigrams b
        LEFT JOIN rule r ON b.src = r.src
        WHERE NOT b.is_train
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN pred = dst THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(CAST(sum(CASE WHEN pred = dst THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS accuracy
    FROM scored
"""
QUERIES["markov_next_event_accuracy"] = markov_next_event_accuracy


EVT_RETURN_DAYS = 365.0
_EULER = 0.5772156649015329
_PI = 3.141592653589793


def extreme_value_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit of the DAILY MAXIMUM event value by the
    method of moments (beta = s * sqrt(6)/pi, mu = xbar - gamma*beta),
    with the EVT_RETURN_DAYS-day return level mu - beta*ln(-ln(1-1/T)) —
    the capacity-planning number ("what daily spike do we see once a
    year") that a plain max() cannot give.

    Exactness: daily maxima are exact data cents; mean/std come from
    exact integer sums; the fit and return level are one scalar
    expression.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.max(F.round(F.col("value") * 100).cast("long")).alias("mx")
    )
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
    ) / (nd - 1)
    beta = F.sqrt(var * 6.0) / _PI
    mu = mean - _EULER * beta
    import math as _math

    t_term = -_math.log(-_math.log(1.0 - 1.0 / EVT_RETURN_DAYS))
    ret = mu + beta * t_term
    return s.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(mean / 100.0, 2).alias("mean_daily_max"),
        F.round(mu / 100.0, 2).alias("gumbel_mu"),
        F.round(beta / 100.0, 2).alias("gumbel_beta"),
        F.round(ret / 100.0, 2).alias("return_level_1y"),
    )


def _evt_oracle() -> str:
    import math as _math

    t_term = -_math.log(-_math.log(1.0 - 1.0 / EVT_RETURN_DAYS))
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               max(CAST(round(value * 100) AS BIGINT)) AS mx
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT count(*) AS n, sum(mx) AS s1, sum(mx * mx) AS s2 FROM daily
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(s1 AS DOUBLE) / n / 100.0, 2) AS mean_daily_max,
           round((CAST(s1 AS DOUBLE) / n
                  - {_EULER} * sqrt(((CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)) * 6.0) / {_PI}) / 100.0, 2) AS gumbel_mu,
           round(sqrt(((CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1)) * 6.0) / {_PI} / 100.0, 2) AS gumbel_beta,
           round(((CAST(s1 AS DOUBLE) / n
                  - {_EULER} * sqrt(((CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)) * 6.0) / {_PI})
                  + sqrt(((CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1)) * 6.0) / {_PI} * {t_term!r})
                 / 100.0, 2) AS return_level_1y
    FROM s
"""


ORACLES["extreme_value_fit"] = _evt_oracle()
QUERIES["extreme_value_fit"] = extreme_value_fit


def price_elasticity_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per part brand: OLS slope of
    ln(quantity) on ln(unit price) over lineitem observations — the
    pricing-analytics read of the order book (elasticity < -1 = elastic).

    Exactness: unit price is the exact rational extendedprice/quantity;
    ln() of identical doubles agrees bit-for-bit; the per-brand OLS sums
    fold over double terms (welch float-parity precedent, outputs
    rounded).

    Scale: one broadcast part join, one brand-keyed moment aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    x = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    y = F.log(F.col("l_quantity").cast("double"))
    g = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return g.select(
        F.col("p_brand").alias("brand"),
        F.col("n").cast("bigint").alias("n_lineitems"),
        F.round(slope, 4).alias("elasticity"),
        (slope < -1.0).alias("elastic"),
    )


ORACLES["price_elasticity_brand"] = """
    WITH j AS (
        SELECT p_brand, ln(l_extendedprice / l_quantity) AS x,
               ln(CAST(l_quantity AS DOUBLE)) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity > 0 AND l_extendedprice > 0
    ),
    g AS (
        SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM j GROUP BY 1
    )
    SELECT p_brand AS brand, CAST(n AS BIGINT) AS n_lineitems,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
             AS elasticity,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) < -1.0 AS elastic
    FROM g
"""
QUERIES["price_elasticity_brand"] = price_elasticity_brand


# --------------------------------------------------------------------------
# wave N: operations-analytics closers
# --------------------------------------------------------------------------

ABC_A_CUT = 0.8
ABC_B_CUT = 0.95


def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification of parts by revenue: parts
    sorted by revenue contribute to the cumulative share; the first 80%
    is class A, to 95% class B, the tail C — the warehouse-ops
    prioritization standard.

    Determinism: revenue is exact integer cents; the cumulative share
    boundary compares exact integer cross products cum*den vs cut*total
    (cuts are exact rationals 4/5 and 19/20), so class assignment can
    never flip on float noise.  Ordering ties break on part id.

    Scale: one part-keyed aggregation; the cumulative window runs over
    the part dimension (dimension-sized, not fact-sized).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    rev = li.groupBy("l_partkey").agg(F.sum(F.col("cents").cast(_DEC)).alias("r"))
    w = Window.orderBy(F.col("r").desc(), F.col("l_partkey").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = rev.agg(F.sum("r").alias("t"))
    cum = rev.crossJoin(F.broadcast(tot)).withColumn(
        "cr", F.sum("r").over(w)
    )
    # class A: cum share <= 0.8  <=>  5*cr <= 4*t (exact integers)
    cls = (
        F.when(F.col("cr") * 5 <= F.col("t") * 4, F.lit("A"))
        .when(F.col("cr") * 20 <= F.col("t") * 19, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    per_part = cum.withColumn("cls", cls)
    return (
        per_part.groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                (F.sum("r") / F.first("t")).cast("double"), 4
            ).alias("revenue_share"),
        )
    )


ORACLES["abc_classification"] = """
    WITH rev AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS r
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(r) AS t FROM rev),
    cum AS (
        SELECT l_partkey, r, t,
               sum(r) OVER (ORDER BY r DESC, l_partkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cr
        FROM rev, tot
    ),
    cls AS (
        SELECT CASE WHEN cr * 5 <= t * 4 THEN 'A'
                    WHEN cr * 20 <= t * 19 THEN 'B'
                    ELSE 'C' END AS cls,
               r, t
        FROM cum
    )
    SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(r) AS DOUBLE) / CAST(any_value(t) AS DOUBLE), 4)
             AS revenue_share
    FROM cls GROUP BY 1
"""
QUERIES["abc_classification"] = abc_classification


def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator for the signup ->
    first-purchase process: H(t) = sum over event days of d_i/n_i — the
    hazard-scale companion of kaplan_meier (exp(-H) approximates S, and
    the increments ARE the day-by-day conversion intensity).

    Exactness: d and n are exact integers from the kaplan_meier duration
    construction; the cumulative sum of exact-ratio doubles folds with
    the ORDERED day window (the kaplan_meier order-pinning pattern).
    """
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    per_user = (
        signups.join(purchases, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(F.col("p_ts").cast("date"), F.col("s_ts").cast("date")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("s_ts").cast("date")))
            .cast("long")
            .alias("dur"),
            F.col("p_ts").isNotNull().cast("long").alias("observed"),
        )
    )
    # day-cardinality cut (kaplan_meier r11 pattern): day feeds tot AND
    # the hazard frame — the events->per_user chain otherwise ran twice.
    day = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).alias("x"), F.sum("observed").alias("d")
    ).localCheckpoint(eager=True)
    tot = day.agg(F.sum("x").alias("n_total"))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return (
        day.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum("x").over(w_prev), F.lit(0)),
        )
        .filter(F.col("d") > 0)
        .withColumn(
            "cum_hazard",
            F.sum(
                F.col("d").cast("double") / F.col("n_risk").cast("double")
            ).over(w_cum),
        )
        .select(
            F.col("dur").alias("t_days"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("d_events"),
            F.round("cum_hazard", 4).alias("cum_hazard"),
            F.round(F.exp(-F.col("cum_hazard")), 4).alias("surv_approx"),
        )
    )


ORACLES["nelson_aalen_hazard"] = """
    WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    signups AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    purchases AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN signups s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
        GROUP BY 1
    ),
    per_user AS (
        SELECT CAST(CASE WHEN p.p_ts IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(p.p_ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE), h.h)
               END AS BIGINT) AS dur,
               CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM signups s LEFT JOIN purchases p ON s.user_id = p.user_id
        CROSS JOIN horizon h
    ),
    day AS (
        SELECT dur, count(*) AS x, sum(observed) AS d
        FROM per_user GROUP BY 1
    ),
    tot AS (SELECT sum(x) AS n_total FROM day),
    risk AS (
        SELECT day.*, tot.n_total,
               n_total - COALESCE(sum(x) OVER (ORDER BY dur ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        FROM day, tot
    )
    SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           round(sum(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS cum_hazard,
           round(exp(-sum(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4)
             AS surv_approx
    FROM risk WHERE d > 0
"""
QUERIES["nelson_aalen_hazard"] = nelson_aalen_hazard


def exponential_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential fit + KS goodness for the per-type interarrival
    process: lambda-hat = 1/mean gap (the exponential MLE), then the KS
    distance between the empirical gap CDF and Exp(lambda-hat) evaluated
    at every distinct gap — "is this stream Poisson?" per event type.

    Exactness: the mean is an exact-integer ratio; the empirical CDF
    steps are exact integer counts on the distinct-gap grid; the KS sup
    runs over that grid with single-expression exp() terms (identical
    doubles both engines).  D evaluates the sup over both step corners
    (before/after each jump), the textbook two-sided form.

    Scale: the interarrival lag runs within (type, DAY) partitions —
    partitioning the lag by the raw low-cardinality event_type alone
    put the whole corpus sort on ~6 tasks (measured 2.9x at the 10x
    corpus; a cliff at 100 TB), while (type, day) gives calendar-many
    partitions.  Day-boundary gaps are stitched exactly from the tiny
    per-(type, day) first/last frame (equal timestamps can never
    straddle a day boundary, so within-day (ts, event_id) order plus
    the previous non-empty day's last event reproduces the global
    order's gaps bit-for-bit).  Gaps then reduce to the
    distinct-(type, gap) frame; the CDF window is per type over that
    bounded grid.
    """
    from ..functions.events import typed_interarrival_gaps

    e = load_table(spark, sf_dir, "events")
    gaps = typed_interarrival_gaps(e)
    grid = gaps.groupBy("event_type", "g").agg(F.count(F.lit(1)).alias("c"))
    stats = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("g").alias("s")
    )
    wc = Window.partitionBy("event_type").orderBy("g").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.withColumn("cc", F.sum("c").over(wc)).join(
        F.broadcast(stats), "event_type"
    )
    lam = F.col("n").cast("double") / F.col("s").cast("double")
    f_exp = F.lit(1.0) - F.exp(-lam * F.col("g").cast("double"))
    emp_hi = F.col("cc").cast("double") / F.col("n").cast("double")
    emp_lo = (F.col("cc") - F.col("c")).cast("double") / F.col("n").cast("double")
    d_at = F.greatest(F.abs(emp_hi - f_exp), F.abs(emp_lo - f_exp))
    return (
        cum.withColumn("d_at", d_at)
        .groupBy("event_type")
        .agg(
            F.first("n").cast("bigint").alias("n_gaps"),
            F.round(
                (F.first("s").cast("double")
                 / F.first("n").cast("double") / 1e6),
                3,
            ).alias("mean_gap_s"),
            F.round(F.max("d_at"), 4).alias("ks_distance"),
        )
    )


ORACLES["exponential_gap_fit"] = """
    WITH gaps AS (
        SELECT event_type, g FROM (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id) AS g
            FROM events
        ) WHERE g IS NOT NULL
    ),
    grid AS (
        SELECT event_type, g, count(*) AS c FROM gaps GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, count(*) AS n, sum(g) AS s FROM gaps GROUP BY 1
    ),
    cum AS (
        SELECT gr.event_type, gr.g, gr.c, st.n, st.s,
               sum(gr.c) OVER (PARTITION BY gr.event_type ORDER BY gr.g
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cc
        FROM grid gr JOIN stats st ON gr.event_type = st.event_type
    )
    SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_gaps,
           round(CAST(any_value(s) AS DOUBLE) / any_value(n) / 1e6, 3)
             AS mean_gap_s,
           round(max(greatest(
               abs(CAST(cc AS DOUBLE) / n
                   - (1.0 - exp(-(CAST(n AS DOUBLE) / s)
                                * CAST(g AS DOUBLE)))),
               abs(CAST(cc - c AS DOUBLE) / n
                   - (1.0 - exp(-(CAST(n AS DOUBLE) / s)
                                * CAST(g AS DOUBLE)))))), 4)
             AS ks_distance
    FROM cum GROUP BY 1
"""
QUERIES["exponential_gap_fit"] = exponential_gap_fit


# --------------------------------------------------------------------------
# ab_power_analysis — two-proportion sample-size calculator per event type
# --------------------------------------------------------------------------

POWER_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
POWER_Z_BETA = 0.8416212335729143  # power = 0.80
POWER_MDE_REL = 1.1  # detect a 10% relative lift


def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-design calculator: for every event type, the baseline
    user-level incidence rate (share of users with >= 1 such event) and
    the per-arm sample size needed to detect a 10% relative lift at
    alpha = 0.05 (two-sided), power = 0.80 — the standard two-proportion
    normal-approximation formula n = (z_a*sqrt(2*pbar*qbar) +
    z_b*sqrt(p1*q1 + p2*q2))^2 / (p1-p2)^2.

    Exactness: the incidence rates are single divisions of exact integer
    user counts; the z constants are pinned literals; both engines
    evaluate the identical closed-form double expression, and the final
    ceil lands on the same integer.

    Scale: one distinct-users scalar plus one per-(type) distinct-user
    aggregate — two map-side-combined reductions, 5-row result.
    """
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy().agg(F.countDistinct("user_id").alias("n_users"))
    per = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_with")
    ).crossJoin(F.broadcast(users))
    p1 = F.col("n_with").cast("double") / F.col("n_users").cast("double")
    p2 = F.least(p1 * F.lit(POWER_MDE_REL), F.lit(1.0))
    pbar = (p1 + p2) / F.lit(2.0)
    num = (
        F.lit(POWER_Z_ALPHA) * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar))
        + F.lit(POWER_Z_BETA)
        * F.sqrt(p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2))
    )
    n_arm = F.when(p2 != p1, F.ceil(num * num / ((p2 - p1) * (p2 - p1))))
    return per.select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(p1, 6).alias("p_baseline"),
        F.round(p2, 6).alias("p_target"),
        n_arm.cast("long").alias("n_per_arm"),
    ).orderBy("event_type")


QUERIES["ab_power_analysis"] = ab_power_analysis
ORACLES["ab_power_analysis"] = f"""
    WITH users AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    per AS (
        SELECT event_type, count(DISTINCT user_id) AS n_with,
               (SELECT n_users FROM users) AS n_users
        FROM events GROUP BY 1
    ),
    rates AS (
        SELECT event_type, n_users,
               CAST(n_with AS DOUBLE) / CAST(n_users AS DOUBLE) AS p1,
               least(CAST(n_with AS DOUBLE) / CAST(n_users AS DOUBLE)
                     * {POWER_MDE_REL}, 1.0) AS p2
        FROM per
    )
    SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
           round(p1, 6) AS p_baseline, round(p2, 6) AS p_target,
           CASE WHEN p2 <> p1 THEN CAST(ceil(
               ({POWER_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2.0)
                                       * (1.0 - (p1 + p2) / 2.0))
                + {POWER_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
               * ({POWER_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2.0)
                                         * (1.0 - (p1 + p2) / 2.0))
                  + {POWER_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
               / ((p2 - p1) * (p2 - p1))) AS BIGINT) END AS n_per_arm
    FROM rates ORDER BY event_type
"""


# --------------------------------------------------------------------------
# page_hinkley_drift — sequential mean-drift detector on daily spend
# --------------------------------------------------------------------------

PH_DELTA_CENTS = 10.0  # magnitude tolerance
PH_LAMBDA_CENTS = 500.0  # alarm threshold


def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift test on the daily mean purchase
    value: PH_t = sum_{i<=t} (x_i - mean_i - delta) with mean_i the
    RUNNING mean (exact prefix-integer ratio), alarm when
    PH_t - min_{i<=t} PH_i > lambda — the online companion of the batch
    cusum_changepoint (which uses the global mean and so cannot run
    one-pass).

    Exactness: prefix sums of cents/counts are exact integers, so every
    x_i and mean_i is one division of exact integers; the PH cumulative
    and prefix-min fold in day order on both engines (order-pinned by
    construction).

    Scale: one groupBy to the day frame; all windows run on days.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long").cast(_DEC)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    wday = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = daily.withColumn("cs", F.sum("s").over(wday)).withColumn(
        "cn", F.sum("n").over(wday)
    )
    x = F.col("s").cast("double") / F.col("n").cast("double")
    mean = F.col("cs").cast("double") / F.col("cn").cast("double")
    term = x - mean - F.lit(PH_DELTA_CENTS)
    t = t.withColumn("ph", F.sum(term).over(wday))
    t = t.withColumn("ph_min", F.min("ph").over(wday))
    return t.select(
        "day",
        F.round(x / F.lit(100.0), 4).alias("daily_mean_dollars"),
        F.round(F.col("ph") / F.lit(100.0), 4).alias("ph_stat_dollars"),
        (F.col("ph") - F.col("ph_min") > F.lit(PH_LAMBDA_CENTS)).alias("drift_alarm"),
    ).orderBy("day")


QUERIES["page_hinkley_drift"] = page_hinkley_drift
ORACLES["page_hinkley_drift"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s,
               count(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    pre AS (
        SELECT day, s, n,
               sum(s) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cs,
               sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cn
        FROM daily
    ),
    ph AS (
        SELECT day, s, n,
               sum(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE)
                   - {PH_DELTA_CENTS})
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ph
        FROM pre
    ),
    mins AS (
        SELECT day, s, n, ph,
               min(ph) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS ph_min
        FROM ph
    )
    SELECT day,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
               AS daily_mean_dollars,
           round(ph / 100.0, 4) AS ph_stat_dollars,
           ph - ph_min > {PH_LAMBDA_CENTS} AS drift_alarm
    FROM mins ORDER BY day
"""


# --------------------------------------------------------------------------
# cox_ph_fit — Cox proportional hazards (binary covariate, Newton steps)
# --------------------------------------------------------------------------

COX_STEPS = 3


def cox_ph_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards fit (Breslow ties) of the signup ->
    first-purchase hazard on the even/odd-user covariate — the smooth-model
    companion of log_rank_test: beta is the log hazard ratio the chi-square
    only tests.  COX_STEPS Newton steps on the partial likelihood,
    expressed as a static DAG (the logistic_newton_fit lineage): with a
    binary covariate every per-day score/information term needs only the
    two risk-set counts and the two event counts, all exact integers from
    the SAME duration frame log_rank builds.

    Determinism: risk sets are exact prefix integers; each step folds the
    per-day score U and information I with ORDER-PINNED cumulative sums
    over the bounded duration frame; exp/division on identical doubles.

    Scale: two min-aggregates per user, one reduce to the duration frame;
    every window runs on that bounded frame; the 1-row parameter state
    rides a broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    per_user = (
        signups.join(purchases, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col("user_id") % 2).cast("int").alias("grp"),
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(F.col("p_ts").cast("date"), F.col("s_ts").cast("date")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("s_ts").cast("date")))
            .cast("long")
            .alias("dur"),
            F.col("p_ts").isNotNull().cast("long").alias("observed"),
        )
    )
    day = per_user.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("x0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("grp") == 0, F.col("observed")).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("grp") == 1, F.col("observed")).otherwise(0)).alias("d1"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = day.select(
        "dur",
        "d0",
        "d1",
        (
            F.sum(F.col("x0")).over(
                Window.orderBy("dur").rowsBetween(
                    Window.currentRow, Window.unboundedFollowing
                )
            )
        ).alias("n0r"),
        (
            F.sum(F.col("x1")).over(
                Window.orderBy("dur").rowsBetween(
                    Window.currentRow, Window.unboundedFollowing
                )
            )
        ).alias("n1r"),
    ).localCheckpoint(eager=True)
    _ = w_prev  # documented: risk sets equal the FROM-current suffix sums
    beta = spark.range(1).select(F.lit(0.0).alias("b"))
    wcum = Window.partitionBy().orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    for _i in range(COX_STEPS):
        j = risk.crossJoin(F.broadcast(beta))
        r = F.exp(F.col("b"))
        den = F.col("n0r").cast("double") + F.col("n1r").cast("double") * r
        dd = (F.col("d0") + F.col("d1")).cast("double")
        u_term = F.col("d1").cast("double") - dd * (
            F.col("n1r").cast("double") * r / den
        )
        i_term = (
            dd
            * (F.col("n1r").cast("double") * r * F.col("n0r").cast("double"))
            / (den * den)
        )
        folded = j.select(
            "dur",
            "b",
            F.sum(u_term).over(wcum).alias("u"),
            F.sum(i_term).over(wcum).alias("inf"),
        )
        s = folded.groupBy("b").agg(
            F.max_by(F.col("u"), F.col("dur")).alias("u"),
            F.max_by(F.col("inf"), F.col("dur")).alias("inf"),
        )
        beta = s.select((F.col("b") + F.col("u") / F.col("inf")).alias("b"))
    tot = per_user.groupBy().agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("observed")).otherwise(0))
        .cast("long")
        .alias("events0"),
        F.sum(F.when(F.col("grp") == 1, F.col("observed")).otherwise(0))
        .cast("long")
        .alias("events1"),
    )
    return beta.crossJoin(F.broadcast(tot)).select(
        "n0",
        "n1",
        "events0",
        "events1",
        (F.round(F.col("b"), 6) + F.lit(0.0)).alias("beta"),
        F.round(F.exp(F.col("b")), 6).alias("hazard_ratio"),
    )


def _cox_oracle() -> str:
    base = """per_user AS (
        SELECT CAST(user_id % 2 AS INT) AS grp,
               CASE WHEN p_ts IS NOT NULL
                    THEN datediff('day', CAST(s_ts AS DATE), CAST(p_ts AS DATE))
                    ELSE datediff('day', CAST(s_ts AS DATE),
                                  (SELECT max(CAST(ts AS DATE)) FROM events))
                 END AS dur,
               CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM (
            SELECT s.user_id, s.s_ts, p.p_ts
            FROM (SELECT user_id, min(ts) AS s_ts FROM events
                  WHERE event_type = 'signup' GROUP BY 1) s
            LEFT JOIN (
                SELECT e.user_id, min(e.ts) AS p_ts
                FROM events e
                JOIN (SELECT user_id, min(ts) AS s_ts FROM events
                      WHERE event_type = 'signup' GROUP BY 1) s2
                  ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.s_ts
                GROUP BY 1
            ) p ON s.user_id = p.user_id
        )
    ),
    day AS (
        SELECT dur,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS x0,
               sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS x1,
               sum(CASE WHEN grp = 0 THEN observed ELSE 0 END) AS d0,
               sum(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS d1
        FROM per_user GROUP BY 1
    ),
    risk AS MATERIALIZED (
        SELECT dur, d0, d1,
               sum(x0) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS n0r,
               sum(x1) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS n1r
        FROM day
    )"""
    ctes = [base, "bb0 AS (SELECT 0.0 AS b)"]
    prev = "bb0"
    for i in range(1, COX_STEPS + 1):
        ctes.append(f"""ff{i} AS (
            SELECT r.dur, b.b,
                   sum(CAST(d1 AS DOUBLE)
                       - CAST(d0 + d1 AS DOUBLE)
                         * (CAST(n1r AS DOUBLE) * exp(b.b)
                            / (CAST(n0r AS DOUBLE)
                               + CAST(n1r AS DOUBLE) * exp(b.b)))) OVER wo AS u,
                   sum(CAST(d0 + d1 AS DOUBLE)
                       * (CAST(n1r AS DOUBLE) * exp(b.b)
                          * CAST(n0r AS DOUBLE))
                       / ((CAST(n0r AS DOUBLE)
                           + CAST(n1r AS DOUBLE) * exp(b.b))
                          * (CAST(n0r AS DOUBLE)
                             + CAST(n1r AS DOUBLE) * exp(b.b)))) OVER wo AS inf
            FROM risk r, {prev} b
            WINDOW wo AS (ORDER BY r.dur ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        )""")
        ctes.append(f"""bb{i} AS (
            SELECT b + arg_max(u, dur) / arg_max(inf, dur) AS b
            FROM ff{i} GROUP BY b
        )""")
        prev = f"bb{i}"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    tot AS (
        SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN grp = 0 THEN observed ELSE 0 END) AS BIGINT)
                   AS events0,
               CAST(sum(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS BIGINT)
                   AS events1
        FROM per_user
    )
    SELECT n0, n1, events0, events1,
           round(b, 6) + 0.0 AS beta,
           round(exp(b), 6) AS hazard_ratio
    FROM {prev}, tot
    """


QUERIES["cox_ph_fit"] = cox_ph_fit
ORACLES["cox_ph_fit"] = _cox_oracle()


# --------------------------------------------------------------------------
# jackknife_ci — delete-one-group jackknife for the mean purchase value
# --------------------------------------------------------------------------

JK_GROUPS = 20


def jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife CI for the mean purchase value: 20
    md5-hash groups, leave-one-out means from the group-sum identity
    (S - S_g)/(N - N_g) — no second scan — jackknife variance
    (G-1)/G * sum (m_g - mbar)^2, and the normal-approximation CI.
    The resampling-based companion of bootstrap_mean_ci that needs only
    ONE pass and G scalar folds.

    Exactness: all sums exact decimal(38,0); the two G-row folds
    (mbar, then squared deviations) are ORDER-PINNED.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    from ..functions.texts import md5_hash_long

    rows = e.select(
        (md5_hash_long(F.col("event_id").cast("string"), "jk") % JK_GROUPS)
        .cast("int")
        .alias("g"),
        F.round(F.col("value") * 100).cast("long").cast(_DEC).alias("cents"),
    )
    per = rows.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("s_g")
    )
    wall = Window.partitionBy()
    t = per.withColumn("n", F.sum("n_g").over(wall)).withColumn(
        "s", F.sum("s_g").over(wall)
    )
    m_g = (F.col("s") - F.col("s_g")).cast("double") / (
        F.col("n") - F.col("n_g")
    ).cast("double")
    wcum = wall.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    t = t.withColumn("m_g", m_g).withColumn(
        "mbar_cum", F.sum(m_g / F.lit(float(JK_GROUPS))).over(wcum)
    )
    wfull = wall.orderBy("g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = t.withColumn("mbar", F.max_by(F.col("mbar_cum"), F.col("g")).over(wfull))
    dev2 = (F.col("m_g") - F.col("mbar")) * (F.col("m_g") - F.col("mbar"))
    t = t.withColumn("ss_cum", F.sum(dev2).over(wcum))
    g = t.groupBy("n", "s").agg(
        F.max_by(F.col("ss_cum"), F.col("g")).alias("ss"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double") / F.lit(100.0)
    se = (
        F.sqrt(
            F.lit(float(JK_GROUPS - 1) / JK_GROUPS) * F.col("ss")
        )
        / F.lit(100.0)
    )
    return g.select(
        F.col("n").cast("long").alias("n_purchases"),
        F.col("n_groups").cast("long").alias("n_groups"),
        F.round(mean, 6).alias("mean_dollars"),
        F.round(se, 6).alias("jackknife_se"),
        F.round(mean - F.lit(1.959963984540054) * se, 6).alias("ci_lo"),
        F.round(mean + F.lit(1.959963984540054) * se, 6).alias("ci_hi"),
    )


QUERIES["jackknife_ci"] = jackknife_ci
ORACLES["jackknife_ci"] = f"""
    WITH rows_ AS (
        SELECT CAST(CAST('0x' || substr(md5('jk' || CAST(event_id AS VARCHAR)),
                                        1, 8) AS BIGINT) % {JK_GROUPS} AS INT)
                   AS g,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    per AS (
        SELECT g, count(*) AS n_g, sum(cents) AS s_g FROM rows_ GROUP BY 1
    ),
    t AS (
        SELECT g, n_g, s_g,
               sum(n_g) OVER () AS n, sum(s_g) OVER () AS s
        FROM per
    ),
    m AS (
        SELECT g, n, s,
               CAST(s - s_g AS DOUBLE) / CAST(n - n_g AS DOUBLE) AS m_g,
               sum((CAST(s - s_g AS DOUBLE) / CAST(n - n_g AS DOUBLE))
                   / {float(JK_GROUPS)})
                   OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS mbar_cum
        FROM t
    ),
    mm AS (
        SELECT g, n, s, m_g, arg_max(mbar_cum, g) OVER () AS mbar FROM m
    ),
    ss AS (
        SELECT g, n, s,
               sum((m_g - mbar) * (m_g - mbar))
                   OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ss_cum
        FROM mm
    ),
    fin AS (
        SELECT n, s, arg_max(ss_cum, g) AS ss, count(*) AS n_groups
        FROM ss GROUP BY n, s
    )
    SELECT CAST(n AS BIGINT) AS n_purchases,
           CAST(n_groups AS BIGINT) AS n_groups,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
               AS mean_dollars,
           round(sqrt({float(JK_GROUPS - 1) / JK_GROUPS} * ss) / 100.0, 6)
               AS jackknife_se,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                 - 1.959963984540054 * sqrt({float(JK_GROUPS - 1) / JK_GROUPS}
                                            * ss) / 100.0, 6) AS ci_lo,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                 + 1.959963984540054 * sqrt({float(JK_GROUPS - 1) / JK_GROUPS}
                                            * ss) / 100.0, 6) AS ci_hi
    FROM fin
"""


# --------------------------------------------------------------------------
# james_stein_shrinkage — empirical-Bayes shrinkage of per-brand means
# --------------------------------------------------------------------------


def james_stein_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """James-Stein / empirical-Bayes shrinkage of the 25 per-brand mean
    lineitem prices toward the grand mean: factor
    c = max(0, 1 - (k-3) * avg_se2 / sum (ybar_b - ybar)^2), shrunk_b =
    ybar + c * (ybar_b - ybar) — the estimator every per-segment
    reporting layer should apply before ranking small groups.

    Exactness: per-brand sums/counts and the pooled within variance are
    exact decimal(38,0); the two 25-row folds (squared deviations,
    mean squared SE) are ORDER-PINNED.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cv")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    per = rows.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum(F.col("cv").cast(_DEC)).alias("s_b"),
        F.sum(F.col("cv").cast(_DEC) * F.col("cv").cast(_DEC)).alias("q_b"),
    )
    wall = Window.partitionBy()
    t = per.withColumn("n", F.sum("n_b").over(wall)).withColumn(
        "s", F.sum("s_b").over(wall)
    ).withColumn("k", F.count(F.lit(1)).over(wall))
    ybar_b = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    ybar = F.col("s").cast("double") / F.col("n").cast("double")
    # within-brand sample variance (exact integer numerator), SE^2 = s2/n_b
    s2_b = (
        (F.col("n_b").cast(_DEC) * F.col("q_b") - F.col("s_b") * F.col("s_b"))
        .cast("double")
    ) / (
        F.col("n_b").cast("double")
        * (F.col("n_b").cast("double") - F.lit(1.0))
    )
    se2_b = s2_b / F.col("n_b").cast("double")
    wcum = wall.orderBy("p_brand").rowsBetween(Window.unboundedPreceding, 0)
    wfull = wall.orderBy("p_brand").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = (
        t.withColumn("dev2_cum", F.sum((ybar_b - ybar) * (ybar_b - ybar)).over(wcum))
        .withColumn("se2_cum", F.sum(se2_b).over(wcum))
    )
    t = t.withColumn(
        "dev2", F.max_by(F.col("dev2_cum"), F.col("p_brand")).over(wfull)
    ).withColumn("se2", F.max_by(F.col("se2_cum"), F.col("p_brand")).over(wfull))
    c = F.greatest(
        F.lit(0.0),
        F.lit(1.0)
        - (F.col("k").cast("double") - F.lit(3.0))
        * (F.col("se2") / F.col("k").cast("double"))
        / F.col("dev2"),
    )
    return t.select(
        "p_brand",
        F.col("n_b").cast("long").alias("n_items"),
        F.round(ybar_b / F.lit(100.0), 4).alias("raw_mean_dollars"),
        F.round((ybar + c * (ybar_b - ybar)) / F.lit(100.0), 4).alias(
            "shrunk_mean_dollars"
        ),
        F.round(c, 6).alias("shrink_factor"),
    ).orderBy("p_brand")


QUERIES["james_stein_shrinkage"] = james_stein_shrinkage
ORACLES["james_stein_shrinkage"] = """
    WITH rows_ AS (
        SELECT p_brand, CAST(round(l_extendedprice * 100) AS BIGINT) AS cv
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    per AS (
        SELECT p_brand, count(*) AS n_b,
               sum(CAST(cv AS HUGEINT)) AS s_b,
               sum(CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT)) AS q_b
        FROM rows_ GROUP BY 1
    ),
    t AS (
        SELECT p_brand, n_b, s_b, q_b,
               sum(n_b) OVER () AS n, sum(s_b) OVER () AS s,
               count(*) OVER () AS k
        FROM per
    ),
    scored AS (
        SELECT p_brand, n_b, n, s, k,
               CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS ybar_b,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
               (CAST(n_b * q_b - s_b * s_b AS DOUBLE)
                / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
               / CAST(n_b AS DOUBLE) AS se2_b
        FROM t
    ),
    folded AS (
        SELECT p_brand, n_b, k, ybar_b, ybar,
               sum((ybar_b - ybar) * (ybar_b - ybar))
                   OVER (ORDER BY p_brand ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS dev2_cum,
               sum(se2_b) OVER (ORDER BY p_brand
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS se2_cum
        FROM scored
    ),
    fin AS (
        SELECT p_brand, n_b, k, ybar_b, ybar,
               arg_max(dev2_cum, p_brand) OVER () AS dev2,
               arg_max(se2_cum, p_brand) OVER () AS se2
        FROM folded
    )
    SELECT p_brand, CAST(n_b AS BIGINT) AS n_items,
           round(ybar_b / 100.0, 4) AS raw_mean_dollars,
           round((ybar + greatest(0.0,
                    1.0 - (CAST(k AS DOUBLE) - 3.0)
                          * (se2 / CAST(k AS DOUBLE)) / dev2)
                  * (ybar_b - ybar)) / 100.0, 4) AS shrunk_mean_dollars,
           round(greatest(0.0,
                    1.0 - (CAST(k AS DOUBLE) - 3.0)
                          * (se2 / CAST(k AS DOUBLE)) / dev2), 6)
               AS shrink_factor
    FROM fin ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AH: distribution fitting beyond the exponential
# ---------------------------------------------------------------------------

WEIB_SCALE = 1_000_000_000_000  # regression terms rounded to pico-units


def weibull_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of the per-type interarrival distribution by
    median-rank regression (the probability-plot method):
    y = ln(-ln(1 - F_hat)) against x = ln(gap) is linear with slope =
    shape k and intercept = -k*ln(lambda); F_hat uses Benard's median
    rank (cc - 0.3)/(n + 0.4) at each distinct gap — the shape
    parameter answers "is this stream bursty (k<1), Poisson (k=1), or
    regular (k>1)?", generalizing exponential_gap_fit.

    Determinism: ranks are exact integer window sums; each grid point's
    (x, y, xy, x^2) regression terms are single float expressions rounded
    to the pico-grid and summed as decimal(38,0) — the distinct-gap grid
    GROWS with data, so a raw float fold would be order-sensitive.

    Scale: gaps reduce to the distinct-(type, gap) grid once; one
    per-type cumulative window on that grid; one integer aggregate.
    """
    from ..functions.events import typed_interarrival_gaps

    e = load_table(spark, sf_dir, "events")
    # day-bucketed exact lag (functions/events.py — the raw per-type
    # window was the 6-task-sort cliff)
    gaps = typed_interarrival_gaps(e).filter(
        F.col("g") > 0  # ln(g) needs positive gaps
    )
    grid = gaps.groupBy("event_type", "g").agg(F.count(F.lit(1)).alias("c"))
    stats = gaps.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("event_type").orderBy("g").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.withColumn("cc", F.sum("c").over(wc)).join(
        F.broadcast(stats), "event_type"
    )
    fhat = (F.col("cc").cast("double") - 0.3) / (F.col("n").cast("double") + 0.4)
    x = F.log(F.col("g").cast("double"))
    y = F.log(-F.log(F.lit(1.0) - fhat))
    dec = "decimal(38,0)"

    def pico(col):
        return F.round(col * WEIB_SCALE).cast("long").cast(dec)

    terms = cum.select(
        "event_type",
        "n",
        pico(x).alias("tx"),
        pico(y).alias("ty"),
        pico(x * y).alias("txy"),
        pico(x * x).alias("txx"),
        pico(y * y).alias("tyy"),
    )
    g2 = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.max("n").alias("n"),
        F.sum("tx").alias("sx"),
        F.sum("ty").alias("sy"),
        F.sum("txy").alias("sxy"),
        F.sum("txx").alias("sxx"),
        F.sum("tyy").alias("syy"),
    )
    m = F.col("m").cast("double")
    sx, sy, sxy, sxx, syy = (
        F.col(c).cast("double") / WEIB_SCALE for c in ("sx", "sy", "sxy", "sxx", "syy")
    )
    k = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    b0 = (sy - k * sx) / m
    lam_us = F.exp(-b0 / k)  # characteristic life in microseconds
    r2num = (m * sxy - sx * sy) * (m * sxy - sx * sy)
    r2den = (m * sxx - sx * sx) * (m * syy - sy * sy)
    return g2.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.col("m").cast("long").alias("n_grid"),
        F.round(k, 4).alias("shape_k"),
        F.round(lam_us / 1e6, 3).alias("scale_s"),
        F.round(r2num / r2den, 4).alias("fit_r2"),
    ).orderBy("event_type")


QUERIES["weibull_gap_fit"] = weibull_gap_fit
ORACLES["weibull_gap_fit"] = f"""
    WITH gaps AS (
        SELECT event_type, g FROM (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id) AS g
            FROM events
        ) WHERE g IS NOT NULL AND g > 0
    ),
    grid AS (
        SELECT event_type, g, count(*) AS c FROM gaps GROUP BY 1, 2
    ),
    stats AS (SELECT event_type, count(*) AS n FROM gaps GROUP BY 1),
    cum AS (
        SELECT gr.event_type, gr.g, st.n,
               sum(gr.c) OVER (PARTITION BY gr.event_type ORDER BY gr.g
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cc
        FROM grid gr JOIN stats st ON gr.event_type = st.event_type
    ),
    terms AS (
        SELECT event_type, n,
               CAST(round(ln(CAST(g AS DOUBLE)) * {WEIB_SCALE}) AS HUGEINT)
                   AS tx,
               CAST(round(ln(-ln(1.0 - (CAST(cc AS DOUBLE) - 0.3)
                                       / (CAST(n AS DOUBLE) + 0.4)))
                          * {WEIB_SCALE}) AS HUGEINT) AS ty,
               CAST(round(ln(CAST(g AS DOUBLE))
                          * ln(-ln(1.0 - (CAST(cc AS DOUBLE) - 0.3)
                                         / (CAST(n AS DOUBLE) + 0.4)))
                          * {WEIB_SCALE}) AS HUGEINT) AS txy,
               CAST(round(ln(CAST(g AS DOUBLE)) * ln(CAST(g AS DOUBLE))
                          * {WEIB_SCALE}) AS HUGEINT) AS txx,
               CAST(round(ln(-ln(1.0 - (CAST(cc AS DOUBLE) - 0.3)
                                       / (CAST(n AS DOUBLE) + 0.4)))
                          * ln(-ln(1.0 - (CAST(cc AS DOUBLE) - 0.3)
                                         / (CAST(n AS DOUBLE) + 0.4)))
                          * {WEIB_SCALE}) AS HUGEINT) AS tyy
        FROM cum
    ),
    g2 AS (
        SELECT event_type, count(*) AS m, max(n) AS n,
               sum(tx) AS sx, sum(ty) AS sy, sum(txy) AS sxy,
               sum(txx) AS sxx, sum(tyy) AS syy
        FROM terms GROUP BY 1
    ),
    s AS (
        SELECT event_type, CAST(m AS DOUBLE) AS m, n,
               CAST(sx AS DOUBLE) / {WEIB_SCALE} AS sx,
               CAST(sy AS DOUBLE) / {WEIB_SCALE} AS sy,
               CAST(sxy AS DOUBLE) / {WEIB_SCALE} AS sxy,
               CAST(sxx AS DOUBLE) / {WEIB_SCALE} AS sxx,
               CAST(syy AS DOUBLE) / {WEIB_SCALE} AS syy
        FROM g2
    ),
    fit AS (
        SELECT event_type, m, n,
               (m * sxy - sx * sy) / (m * sxx - sx * sx) AS k,
               sx, sy, sxy, sxx, syy
        FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(m AS BIGINT) AS n_grid,
           round(k, 4) AS shape_k,
           round(exp(-((sy - k * sx) / m) / k) / 1e6, 3) AS scale_s,
           round((m * sxy - sx * sy) * (m * sxy - sx * sy)
                 / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 4) AS fit_r2
    FROM fit ORDER BY event_type
"""


def beta_fit_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments Beta fit of the discount distribution per brand
    (discounts rescaled from [0, 0.10] to [0, 1]): alpha =
    m*(m(1-m)/v - 1), beta = (1-m)*(m(1-m)/v - 1) — "is discounting
    uniform, U-shaped, or peaked per brand?".  Degenerate brands
    (v = 0 or v >= m(1-m)) report NULL.

    Exactness: moments accumulate as exact basis-point integers; m and v
    are single float expressions of those integers.

    Scale: one map-side-combined aggregate (broadcast part dim) to the
    25-brand frame.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            F.round(F.col("l_discount") * 1000).cast("long")
            .cast("decimal(38,0)")
            .alias("bp"),  # thousandths: 0.10 -> 100 -> u = bp/100
        )
    )
    g = li.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("bp").alias("s"),
        F.sum(F.col("bp") * F.col("bp")).alias("q"),
    )
    n, s, q = (F.col(c).cast("double") for c in ("n", "s", "q"))
    m = s / (100.0 * n)
    v = (n * q - s * s) / (n * n * 10000.0)
    cond = (v > 0) & (v < m * (1 - m))
    common = m * (1 - m) / v - 1
    return g.select(
        "p_brand",
        F.col("n").cast("long").alias("n_items"),
        F.round(m, 6).alias("mean_scaled"),
        F.round(v, 6).alias("var_scaled"),
        F.round(F.when(cond, m * common), 4).alias("beta_alpha"),
        F.round(F.when(cond, (1 - m) * common), 4).alias("beta_beta"),
    ).orderBy("p_brand")


QUERIES["beta_fit_discount"] = beta_fit_discount
ORACLES["beta_fit_discount"] = """
    WITH li AS (
        SELECT p_brand,
               CAST(round(l_discount * 1000) AS HUGEINT) AS bp
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    g AS (
        SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
               sum(bp) AS s, sum(bp * bp) AS q
        FROM li GROUP BY 1
    ),
    s2 AS (
        SELECT p_brand,
               CAST(n AS DOUBLE) AS n, CAST(s AS DOUBLE) AS s,
               CAST(q AS DOUBLE) AS q
        FROM g
    ),
    t AS (
        SELECT p_brand, n,
               s / (100.0 * n) AS m,
               (n * q - s * s) / (n * n * 10000.0) AS v
        FROM s2
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n_items,
           round(m, 6) AS mean_scaled,
           round(v, 6) AS var_scaled,
           round(CASE WHEN v > 0 AND v < m * (1 - m)
                 THEN m * (m * (1 - m) / v - 1) END, 4) AS beta_alpha,
           round(CASE WHEN v > 0 AND v < m * (1 - m)
                 THEN (1 - m) * (m * (1 - m) / v - 1) END, 4) AS beta_beta
    FROM t ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AJ: exact two-sample distances on the cent grid
# (the wasserstein_pairs prefix-sum machinery, extended to the energy and
# Cramer-von Mises functionals)
# ---------------------------------------------------------------------------


def _pair_cum_grid(spark: SparkSession, sf_dir: str):
    """(ta, tb, cv, na, nb, ca, cb, gap, tna, tnb) per event-type pair on
    the merged distinct-cent grid: cumulative counts + forward gap — the
    shared input of the exact distributional-distance family."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    ).agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=True)
    types = g.select("event_type").distinct()
    a = types.select(F.col("event_type").alias("ta"))
    b = types.select(F.col("event_type").alias("tb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("ta") < F.col("tb"))
    mem = pairs.select(
        "ta",
        "tb",
        F.explode(
            F.array(
                F.struct(F.col("ta").alias("t"), F.lit("a").alias("side")),
                F.struct(F.col("tb").alias("t"), F.lit("b").alias("side")),
            )
        ).alias("m"),
    ).select("ta", "tb", F.col("m.t").alias("t"), F.col("m.side").alias("side"))
    j = g.join(F.broadcast(mem), g.event_type == mem.t)
    pv = j.groupBy("ta", "tb", "cv").agg(
        F.sum(F.when(F.col("side") == "a", F.col("cnt")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("side") == "b", F.col("cnt")).otherwise(0)).alias("nb"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("ta", "tb").orderBy("cv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wlead = Window.partitionBy("ta", "tb").orderBy("cv")
    tot = pv.groupBy("ta", "tb").agg(
        F.sum("na").alias("tna"), F.sum("nb").alias("tnb")
    )
    return (
        pv.withColumn("ca", F.sum("na").over(w))
        .withColumn("cb", F.sum("nb").over(w))
        .withColumn("gap", F.lead("cv").over(wlead) - F.col("cv"))
        .join(F.broadcast(tot), ["ta", "tb"])
    )


# SQL twin of _pair_cum_grid (CTE text shared by both oracles)
_PAIR_CUM_SQL = """
    g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM (SELECT DISTINCT event_type FROM g) a
        JOIN (SELECT DISTINCT event_type FROM g) b
          ON a.event_type < b.event_type
    ),
    pv AS (
        SELECT p.ta, p.tb, g.cv,
               sum(CASE WHEN g.event_type = p.ta THEN g.cnt ELSE 0 END) AS na,
               sum(CASE WHEN g.event_type = p.tb THEN g.cnt ELSE 0 END) AS nb
        FROM pairs p JOIN g
          ON g.event_type = p.ta OR g.event_type = p.tb
        GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT ta, tb, sum(na) AS tna, sum(nb) AS tnb FROM pv GROUP BY 1, 2
    ),
    cum AS (
        SELECT pv.*,
               sum(na) OVER (PARTITION BY ta, tb ORDER BY cv
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS ca,
               sum(nb) OVER (PARTITION BY ta, tb ORDER BY cv
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cb,
               lead(cv) OVER (PARTITION BY ta, tb ORDER BY cv) - cv AS gap
        FROM pv
    ),
    cumt AS (
        SELECT c.*, t.tna, t.tnb
        FROM cum c JOIN tot t ON c.ta = t.ta AND c.tb = t.tb
    )
"""


def energy_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample energy distance between the value distributions of
    every event-type pair: D^2 = 2 E|X-Y| - E|X-X'| - E|Y-Y'|, with each
    expectation the exact step integral E|U-V| = sum over the merged cent
    grid of gap * (Fu(1-Fv) + Fv(1-Fu)) — rotation-invariant drift that
    (unlike KS or Wasserstein) powers the standard multivariate energy
    test in its 1-D form.

    Exactness: every integrand numerator (gap * (ca*(tnb-cb) + cb*(tna-ca))
    etc.) is a product of exact integers summed in decimal(38,0); the
    three divisions (by tna*tnb, tna^2, tnb^2) happen ONCE per pair.

    Scale: identical shape to wasserstein_pairs — the reduce is to the
    (pair x distinct-cent) grid, cumulatives are pair-partitioned windows.
    """
    cum = _pair_cum_grid(spark, sf_dir)
    d = _DEC
    gap = F.col("gap").cast(d)
    ca, cb = F.col("ca").cast(d), F.col("cb").cast(d)
    tna, tnb = F.col("tna").cast(d), F.col("tnb").cast(d)
    s = (
        cum.filter(F.col("gap").isNotNull())
        .withColumn("pxy", gap * (ca * (tnb - cb) + cb * (tna - ca)))
        .withColumn("pxx", gap * (ca * (tna - ca)))
        .withColumn("pyy", gap * (cb * (tnb - cb)))
        .groupBy("ta", "tb")
        .agg(
            F.sum("pxy").alias("ixy"),
            F.sum("pxx").alias("ixx"),
            F.sum("pyy").alias("iyy"),
            F.first("tna").alias("tna"),
            F.first("tnb").alias("tnb"),
        )
    )
    na, nb = F.col("tna").cast("double"), F.col("tnb").cast("double")
    exy = F.col("ixy").cast("double") / (na * nb) / 100.0
    exx = 2.0 * F.col("ixx").cast("double") / (na * na) / 100.0
    eyy = 2.0 * F.col("iyy").cast("double") / (nb * nb) / 100.0
    ed2 = 2.0 * exy - exx - eyy
    return s.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("tna").cast("long").alias("n_a"),
        F.col("tnb").cast("long").alias("n_b"),
        F.round(exy, 6).alias("e_cross_dollars"),
        F.round(ed2, 6).alias("energy_dist_sq"),
    ).orderBy("type_a", "type_b")


QUERIES["energy_distance_pairs"] = energy_distance_pairs
ORACLES["energy_distance_pairs"] = f"""
    WITH {_PAIR_CUM_SQL},
    s AS (
        SELECT ta, tb,
               sum(gap * (ca * (tnb - cb) + cb * (tna - ca))) AS ixy,
               sum(gap * (ca * (tna - ca))) AS ixx,
               sum(gap * (cb * (tnb - cb))) AS iyy,
               any_value(tna) AS tna, any_value(tnb) AS tnb
        FROM cumt WHERE gap IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(tna AS BIGINT) AS n_a, CAST(tnb AS BIGINT) AS n_b,
           round(CAST(ixy AS DOUBLE)
                 / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)) / 100.0, 6)
               AS e_cross_dollars,
           round(2.0 * (CAST(ixy AS DOUBLE)
                        / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)) / 100.0)
                 - (2.0 * CAST(ixx AS DOUBLE)
                        / (CAST(tna AS DOUBLE) * CAST(tna AS DOUBLE)) / 100.0)
                 - (2.0 * CAST(iyy AS DOUBLE)
                        / (CAST(tnb AS DOUBLE) * CAST(tnb AS DOUBLE)) / 100.0),
                 6) AS energy_dist_sq
    FROM s ORDER BY type_a, type_b
"""


CVM_SCALE = 1_000_000_000_000  # per-observation terms on the pico grid


def cramer_von_mises_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises statistic per event-type pair:
    T = (nx*ny/(nx+ny)^2) * sum over all observations of (Fx - Fy)^2 —
    the whole-distribution drift test that weighs the CDF gap EVERYWHERE
    (KS takes only the sup; anderson_darling tail-weights it).

    Determinism: Fx - Fy at a grid value is the exact rational
    (ca*tnb - cb*tna)/(tna*tnb); each grid row's term
    (na+nb)*(diff)^2 is ONE float expression rounded to the pico grid and
    summed as decimal(38,0) — exact integer squares would overflow
    decimal(38) on a 100-TB grid, the pico fold cannot.

    Scale: same (pair x distinct-cent) grid as wasserstein/energy.
    """
    cum = _pair_cum_grid(spark, sf_dir)
    diff = (
        F.col("ca").cast("double") * F.col("tnb").cast("double")
        - F.col("cb").cast("double") * F.col("tna").cast("double")
    ) / (F.col("tna").cast("double") * F.col("tnb").cast("double"))
    term = (F.col("na") + F.col("nb")).cast("double") * diff * diff
    t = cum.withColumn(
        "t", F.round(term * CVM_SCALE).cast("long").cast(_DEC)
    )
    s = t.groupBy("ta", "tb").agg(
        F.sum("t").alias("st"),
        F.first("tna").alias("tna"),
        F.first("tnb").alias("tnb"),
    )
    na, nb = F.col("tna").cast("double"), F.col("tnb").cast("double")
    tstat = (
        (na * nb / ((na + nb) * (na + nb)))
        * (F.col("st").cast("double") / CVM_SCALE)
    )
    return s.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("tna").cast("long").alias("n_a"),
        F.col("tnb").cast("long").alias("n_b"),
        F.round(tstat, 6).alias("cvm_t"),
    ).orderBy("type_a", "type_b")


QUERIES["cramer_von_mises_pairs"] = cramer_von_mises_pairs
ORACLES["cramer_von_mises_pairs"] = f"""
    WITH {_PAIR_CUM_SQL},
    t AS (
        SELECT ta, tb, tna, tnb,
               CAST(round(CAST(na + nb AS DOUBLE)
                          * ((CAST(ca AS DOUBLE) * CAST(tnb AS DOUBLE)
                              - CAST(cb AS DOUBLE) * CAST(tna AS DOUBLE))
                             / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)))
                          * ((CAST(ca AS DOUBLE) * CAST(tnb AS DOUBLE)
                              - CAST(cb AS DOUBLE) * CAST(tna AS DOUBLE))
                             / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)))
                          * {CVM_SCALE}) AS HUGEINT) AS t
        FROM cumt
    ),
    s AS (
        SELECT ta, tb, sum(t) AS st,
               any_value(tna) AS tna, any_value(tnb) AS tnb
        FROM t GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(tna AS BIGINT) AS n_a, CAST(tnb AS BIGINT) AS n_b,
           round((CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)
                  / ((CAST(tna AS DOUBLE) + CAST(tnb AS DOUBLE))
                     * (CAST(tna AS DOUBLE) + CAST(tnb AS DOUBLE))))
                 * (CAST(st AS DOUBLE) / {CVM_SCALE}), 6) AS cvm_t
    FROM s ORDER BY type_a, type_b
"""


def stochastic_dominance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order stochastic dominance screen for every event-type value
    pair: A FOSD B iff F_A(t) <= F_B(t) everywhere (A's values are
    larger in the strongest decision-theoretic sense); reports the
    verdict ('a_dominates' / 'b_dominates' / 'crossing') plus how far
    each CDF pokes above the other (sup gaps, both directions) — the
    qualitative companion of wasserstein/energy/CvM on the same grid.

    Exactness: the CDF comparison at every grid value is the integer
    cross-product sign ca*tnb vs cb*tna; the sup gaps divide ONCE per
    pair.

    Scale: the shared (pair x distinct-cent) prefix-sum grid.
    """
    cum = _pair_cum_grid(spark, sf_dir)
    d = _DEC
    diff = F.col("ca").cast(d) * F.col("tnb").cast(d) - F.col("cb").cast(d) * F.col(
        "tna"
    ).cast(d)
    g = cum.groupBy("ta", "tb").agg(
        F.max(diff).alias("max_diff"),
        F.min(diff).alias("min_diff"),
        F.first("tna").alias("tna"),
        F.first("tnb").alias("tnb"),
    )
    nn = F.col("tna").cast("double") * F.col("tnb").cast("double")
    # F_a above F_b means a's mass arrives EARLIER -> B dominates A
    verdict = (
        F.when(F.col("max_diff") <= 0, F.lit("a_dominates"))
        .when(F.col("min_diff") >= 0, F.lit("b_dominates"))
        .otherwise(F.lit("crossing"))
    )
    return g.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        verdict.alias("fosd"),
        F.round(F.greatest(F.col("max_diff").cast("double"), F.lit(0.0)) / nn, 6)
        .alias("sup_a_above_b"),
        F.round(F.greatest(-F.col("min_diff").cast("double"), F.lit(0.0)) / nn, 6)
        .alias("sup_b_above_a"),
    ).orderBy("type_a", "type_b")


QUERIES["stochastic_dominance_pairs"] = stochastic_dominance_pairs
ORACLES["stochastic_dominance_pairs"] = f"""
    WITH {_PAIR_CUM_SQL},
    gg AS (
        SELECT ta, tb,
               max(ca * tnb - cb * tna) AS max_diff,
               min(ca * tnb - cb * tna) AS min_diff,
               any_value(tna) AS tna, any_value(tnb) AS tnb
        FROM cumt GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CASE WHEN max_diff <= 0 THEN 'a_dominates'
                WHEN min_diff >= 0 THEN 'b_dominates'
                ELSE 'crossing' END AS fosd,
           round(greatest(CAST(max_diff AS DOUBLE), 0.0)
                 / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)), 6)
               AS sup_a_above_b,
           round(greatest(-CAST(min_diff AS DOUBLE), 0.0)
                 / (CAST(tna AS DOUBLE) * CAST(tnb AS DOUBLE)), 6)
               AS sup_b_above_a
    FROM gg ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AM: stratified association + decayed engagement
# ---------------------------------------------------------------------------

CMH_SCALE = 1_000_000_000_000  # per-stratum MH terms on the pico grid


def cmh_pooled_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel pooled odds ratio across DAY strata for
    exposure = even user id vs outcome = purchased that day:
    OR_MH = sum_i(a_i*d_i/n_i) / sum_i(b_i*c_i/n_i) — the
    confounder-adjusted association test that simpson_reversal_detect
    motivates (it detects the flip; CMH gives the stratified estimate).

    Determinism: the 2x2 cell counts per day are exact integers; each
    stratum's two MH terms are single float ratios of exact integers
    rounded to the pico grid and summed as decimal(38,0).

    Scale: one reduce of events to the (user, day) grain, one to the
    (day x 2x2) cells, one bounded-day-frame fold.
    """
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.groupBy(F.col("user_id"), F.to_date("ts").alias("d"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("bought")
        )
        .withColumn("exposed", (F.col("user_id") % 2 == 0).cast("int"))
    )
    cells = ud.groupBy("d").agg(
        F.sum(F.when((F.col("exposed") == 1) & (F.col("bought") == 1), 1)
              .otherwise(0)).alias("a"),
        F.sum(F.when((F.col("exposed") == 1) & (F.col("bought") == 0), 1)
              .otherwise(0)).alias("b"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("bought") == 1), 1)
              .otherwise(0)).alias("c"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("bought") == 0), 1)
              .otherwise(0)).alias("dd"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("dd")).cast("double")
    t_num = F.col("a").cast("double") * F.col("dd").cast("double") / n
    t_den = F.col("b").cast("double") * F.col("c").cast("double") / n
    terms = cells.select(
        F.round(t_num * CMH_SCALE).cast("long").cast(_DEC).alias("tn"),
        F.round(t_den * CMH_SCALE).cast("long").cast(_DEC).alias("td"),
    )
    g = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("tn").alias("sn"),
        F.sum("td").alias("sd"),
    )
    return g.select(
        "n_strata",
        F.round(
            F.col("sn").cast("double") / F.col("sd").cast("double"), 6
        ).alias("or_mh"),
    )


QUERIES["cmh_pooled_odds"] = cmh_pooled_odds
ORACLES["cmh_pooled_odds"] = f"""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS bought,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS exposed
        FROM events GROUP BY 1, 2
    ),
    cells AS (
        SELECT d,
               sum(CASE WHEN exposed = 1 AND bought = 1 THEN 1 ELSE 0 END)
                   AS a,
               sum(CASE WHEN exposed = 1 AND bought = 0 THEN 1 ELSE 0 END)
                   AS b,
               sum(CASE WHEN exposed = 0 AND bought = 1 THEN 1 ELSE 0 END)
                   AS c,
               sum(CASE WHEN exposed = 0 AND bought = 0 THEN 1 ELSE 0 END)
                   AS dd
        FROM ud GROUP BY 1
    ),
    terms AS (
        SELECT CAST(round(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
                          / CAST(a + b + c + dd AS DOUBLE)
                          * {CMH_SCALE}) AS HUGEINT) AS tn,
               CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                          / CAST(a + b + c + dd AS DOUBLE)
                          * {CMH_SCALE}) AS HUGEINT) AS td
        FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           round(CAST(sum(tn) AS DOUBLE) / CAST(sum(td) AS DOUBLE), 6)
               AS or_mh
    FROM terms
"""


# --------------------------------------------------------------------------
# round 6, wave AS — structural break, multivariate outliers, demand
# variability classes, multiple-testing control
# --------------------------------------------------------------------------


def chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test on the daily-revenue linear trend at a
    pinned break date (1998-01-01): pooled OLS of daily revenue on the day
    index vs separate pre/post fits, F = ((SSE_p - SSE_1 - SSE_2)/2) /
    ((SSE_1 + SSE_2)/(n - 4)).

    Every moment (n, St, Stt, Sx, Stx, Sxx per segment) is an exact
    integer (cents x day-index grid) folded in decimal(38,0) via
    conditional sums over the calendar-bounded daily frame; the F
    statistic is a single float expression over the exact moments,
    written identically in both engines (the granger_leadlag /
    ols_two_feature shape).  Completes the trend-diagnostics row next to
    durbin_watson_trend / newey_west_trend_se: those audit residual
    autocorrelation, this audits parameter stability.

    Scale: one map-side-combined reduce of orders to the bounded daily
    frame, one 13-column aggregate — no window, no join.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long").cast(_DEC))
        .alias("x")
    )
    d = daily.select(
        F.datediff(F.col("day"), F.to_date(F.lit("1995-01-01")))
        .cast(_DEC)
        .alias("t"),
        "x",
        (F.col("day") < F.lit("1998-01-01")).alias("pre"),
    )

    def seg(flag, name):
        c = F.when(F.col("pre") == flag, F.lit(1)).otherwise(F.lit(0)).cast(_DEC)
        return [
            F.sum(c).alias(f"n{name}"),
            F.sum(c * F.col("t")).alias(f"st{name}"),
            F.sum(c * F.col("t") * F.col("t")).alias(f"stt{name}"),
            F.sum(c * F.col("x")).alias(f"sx{name}"),
            F.sum(c * F.col("t") * F.col("x")).alias(f"stx{name}"),
            F.sum(c * F.col("x") * F.col("x")).alias(f"sxx{name}"),
        ]

    mom = d.agg(*(seg(True, "1") + seg(False, "2")))

    def sse(n, st, stt, sx, stx, sxx):
        ctt = stt - st * st / n
        ctx = stx - st * sx / n
        cxx = sxx - sx * sx / n
        return cxx - ctx * ctx / ctt, ctx / ctt

    c = {k: F.col(k).cast("double") for k in
         ("n1", "st1", "stt1", "sx1", "stx1", "sxx1",
          "n2", "st2", "stt2", "sx2", "stx2", "sxx2")}
    sse1, slope1 = sse(c["n1"], c["st1"], c["stt1"], c["sx1"], c["stx1"],
                       c["sxx1"])
    sse2, slope2 = sse(c["n2"], c["st2"], c["stt2"], c["sx2"], c["stx2"],
                       c["sxx2"])
    ssep, _ = sse(c["n1"] + c["n2"], c["st1"] + c["st2"],
                  c["stt1"] + c["stt2"], c["sx1"] + c["sx2"],
                  c["stx1"] + c["stx2"], c["sxx1"] + c["sxx2"])
    fstat = ((ssep - sse1 - sse2) / 2.0) / (
        (sse1 + sse2) / (c["n1"] + c["n2"] - 4.0)
    )
    return mom.select(
        F.col("n1").cast("long").alias("n_pre"),
        F.col("n2").cast("long").alias("n_post"),
        F.round(slope1 / 100.0, 6).alias("slope_pre_usd_per_day"),
        F.round(slope2 / 100.0, 6).alias("slope_post_usd_per_day"),
        F.round(fstat, 6).alias("f_chow"),
        (fstat > F.lit(4.61)).alias("break_at_99"),
    )


ORACLES["chow_break_test"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT CAST(date_diff('day', DATE '1995-01-01', day) AS HUGEINT)
                   AS t,
               x, day < DATE '1998-01-01' AS pre
        FROM daily
    ),
    mom AS (
        SELECT sum(CASE WHEN pre THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN pre THEN t ELSE 0 END) AS st1,
               sum(CASE WHEN pre THEN t * t ELSE 0 END) AS stt1,
               sum(CASE WHEN pre THEN x ELSE 0 END) AS sx1,
               sum(CASE WHEN pre THEN t * x ELSE 0 END) AS stx1,
               sum(CASE WHEN pre THEN x * x ELSE 0 END) AS sxx1,
               sum(CASE WHEN pre THEN 0 ELSE 1 END) AS n2,
               sum(CASE WHEN pre THEN 0 ELSE t END) AS st2,
               sum(CASE WHEN pre THEN 0 ELSE t * t END) AS stt2,
               sum(CASE WHEN pre THEN 0 ELSE x END) AS sx2,
               sum(CASE WHEN pre THEN 0 ELSE t * x END) AS stx2,
               sum(CASE WHEN pre THEN 0 ELSE x * x END) AS sxx2
        FROM d
    ),
    f AS (
        SELECT CAST(n1 AS DOUBLE) AS n1, CAST(st1 AS DOUBLE) AS st1,
               CAST(stt1 AS DOUBLE) AS stt1, CAST(sx1 AS DOUBLE) AS sx1,
               CAST(stx1 AS DOUBLE) AS stx1, CAST(sxx1 AS DOUBLE) AS sxx1,
               CAST(n2 AS DOUBLE) AS n2, CAST(st2 AS DOUBLE) AS st2,
               CAST(stt2 AS DOUBLE) AS stt2, CAST(sx2 AS DOUBLE) AS sx2,
               CAST(stx2 AS DOUBLE) AS stx2, CAST(sxx2 AS DOUBLE) AS sxx2
        FROM mom
    ),
    s AS (
        SELECT n1, n2,
               ((sxx1 - sx1 * sx1 / n1)
                - (stx1 - st1 * sx1 / n1) * (stx1 - st1 * sx1 / n1)
                  / (stt1 - st1 * st1 / n1)) AS sse1,
               (stx1 - st1 * sx1 / n1) / (stt1 - st1 * st1 / n1) AS slope1,
               ((sxx2 - sx2 * sx2 / n2)
                - (stx2 - st2 * sx2 / n2) * (stx2 - st2 * sx2 / n2)
                  / (stt2 - st2 * st2 / n2)) AS sse2,
               (stx2 - st2 * sx2 / n2) / (stt2 - st2 * st2 / n2) AS slope2,
               (((sxx1 + sxx2) - (sx1 + sx2) * (sx1 + sx2) / (n1 + n2))
                - ((stx1 + stx2) - (st1 + st2) * (sx1 + sx2) / (n1 + n2))
                  * ((stx1 + stx2) - (st1 + st2) * (sx1 + sx2) / (n1 + n2))
                  / ((stt1 + stt2) - (st1 + st2) * (st1 + st2) / (n1 + n2)))
                   AS ssep
        FROM f
    )
    SELECT CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
           round(slope1 / 100.0, 6) AS slope_pre_usd_per_day,
           round(slope2 / 100.0, 6) AS slope_post_usd_per_day,
           round(((ssep - sse1 - sse2) / 2.0)
                 / ((sse1 + sse2) / (n1 + n2 - 4.0)), 6) AS f_chow,
           ((ssep - sse1 - sse2) / 2.0)
               / ((sse1 + sse2) / (n1 + n2 - 4.0)) > 4.61 AS break_at_99
    FROM s
"""
QUERIES["chow_break_test"] = chow_break_test


def mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate outlier screen: per-customer (total spend, order count)
    scored by squared Mahalanobis distance against the global 2x2
    covariance, reported per market segment — the correlation-aware
    companion of mad_outliers (which screens one dimension at a time and
    misses points that are unremarkable marginally but off the joint
    ellipse).

    Exactness: customer features are exact integers (spend cents, order
    count); the five global moments fold in decimal(38,0); the centered
    quantities u = n*x - Sx, v = n*y - Sy and the scatter matrix
    C11 = n*Sxx - Sx^2, C22 = n*Syy - Sy^2, C12 = n*Sxy - Sx*Sy are exact
    decimals (n-scaled so no division happens before the final
    expression).  d^2 = (u^2*C22 - 2uv*C12 + v^2*C11) / (C11*C22 - C12^2)
    — the n-scalings cancel — is ONE float expression over those exact
    integers, written identically in both engines; the chi2(2, 0.999) =
    13.8155 membership test runs on that bit-identical double.  Products
    above C-entry magnitude stay in double (decimal(38,0) would overflow
    at a 10x replica corpus, the cramer_von_mises lesson).

    Scale: one reduce of orders to the customer frame, one 6-cell global
    aggregate broadcast back (scalar cross join), one segment rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast(_DEC)
        .alias("x"),
        F.count(F.lit(1)).cast(_DEC).alias("y"),
    )
    mom = cust.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    j = cust.crossJoin(F.broadcast(mom))
    u = (F.col("n") * F.col("x") - F.col("sx")).cast("double")
    v = (F.col("n") * F.col("y") - F.col("sy")).cast("double")
    c11 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    c22 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    c12 = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    d2 = (u * u * c22 - 2.0 * u * v * c12 + v * v * c11) / (
        c11 * c22 - c12 * c12
    )
    scored = j.select(
        "o_custkey", d2.alias("d2"), (d2 > F.lit(13.8155)).alias("is_out")
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        scored.join(c, scored.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("is_out"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max("d2"), 6).alias("max_d2"),
        )
        .orderBy("c_mktsegment")
    )


ORACLES["mahalanobis_outliers_2d"] = """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x,
               CAST(count(*) AS HUGEINT) AS y
        FROM orders GROUP BY 1
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM cust
    ),
    scored AS (
        SELECT o_custkey,
               (CAST(n * x - sx AS DOUBLE) * CAST(n * x - sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)
                - 2.0 * CAST(n * x - sx AS DOUBLE)
                  * CAST(n * y - sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE)
                + CAST(n * y - sy AS DOUBLE) * CAST(n * y - sy AS DOUBLE)
                  * CAST(n * sxx - sx * sx AS DOUBLE))
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    * CAST(n * sxy - sx * sy AS DOUBLE)) AS d2
        FROM cust, mom
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN d2 > 13.8155 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           round(max(d2), 6) AS max_d2
    FROM scored JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
"""
QUERIES["mahalanobis_outliers_2d"] = mahalanobis_outliers_2d


def xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification per brand — the
    coefficient-of-variation companion of abc_classification (ABC ranks
    by value, XYZ by forecastability; together they drive stocking policy
    with eoq_reorder_policy).

    Per brand, weekly demand over the GLOBAL week calendar W (weeks
    between the corpus min and max ship week; zero-demand weeks enter the
    variance through the pinned count, never materialized — the eoq
    precedent): CV^2 = sigma^2 / mu^2 = (W*Sxx - Sx^2) / Sx^2 with Sx =
    total quantity and Sxx = sum of squared weekly quantities, all exact
    integers.  Class membership is flip-proof cross-multiplied integer
    arithmetic: X iff 4*(W*Sxx - Sx^2) < Sx^2 (CV < 0.5), Y iff
    (W*Sxx - Sx^2) < Sx^2 (CV < 1), else Z — no float ever decides a
    class; CV^2 itself is ONE division of exact integers per brand.

    Scale: lineitem x broadcast part reduces once to the (brand x
    active-week) frame, then to one row per brand; the week count is a
    2-cell global aggregate (scalar cross join).  The output is the
    vocabulary-bounded ~25-row brand frame.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bw = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
            F.round(F.col("l_quantity")).cast("long").alias("q"),
        )
        .groupBy("p_brand", "wk")
        .agg(F.sum("q").cast(_DEC).alias("wq"))
    )
    wspan = li.agg(
        (
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.max("l_shipdate")),
                    F.date_trunc("week", F.min("l_shipdate")),
                )
                / 7
            )
            + 1
        )
        .cast(_DEC)
        .alias("w")
    )
    per_brand = (
        bw.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("active_weeks"),
            F.sum("wq").alias("sx"),
            F.sum(F.col("wq") * F.col("wq")).alias("sxx"),
        )
        .crossJoin(F.broadcast(wspan))
    )
    a = F.col("w") * F.col("sxx") - F.col("sx") * F.col("sx")
    b = F.col("sx") * F.col("sx")
    cls = (
        F.when(a * 4 < b, F.lit("X"))
        .when(a < b, F.lit("Y"))
        .otherwise(F.lit("Z"))
    )
    return per_brand.select(
        "p_brand",
        cls.alias("xyz_class"),
        F.col("active_weeks").cast("long").alias("active_weeks"),
        F.col("sx").cast("long").alias("total_qty"),
        F.round(a.cast("double") / b.cast("double"), 6).alias("cv2"),
    ).orderBy("p_brand")


ORACLES["xyz_classification"] = """
    WITH bw AS (
        SELECT p_brand, date_trunc('week', l_shipdate) AS wk,
               CAST(sum(CAST(round(l_quantity) AS HUGEINT)) AS HUGEINT)
                   AS wq
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    wspan AS (
        SELECT CAST(date_diff('day',
                              date_trunc('week', min(l_shipdate)),
                              date_trunc('week', max(l_shipdate))) // 7
                    + 1 AS HUGEINT) AS w
        FROM lineitem
    ),
    per_brand AS (
        SELECT p_brand, count(*) AS active_weeks,
               sum(wq) AS sx, sum(wq * wq) AS sxx
        FROM bw GROUP BY 1
    )
    SELECT p_brand,
           CASE WHEN (w * sxx - sx * sx) * 4 < sx * sx THEN 'X'
                WHEN (w * sxx - sx * sx) < sx * sx THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           CAST(active_weeks AS BIGINT) AS active_weeks,
           CAST(sx AS BIGINT) AS total_qty,
           round(CAST(w * sxx - sx * sx AS DOUBLE)
                 / CAST(sx * sx AS DOUBLE), 6) AS cv2
    FROM per_brand, wspan
    ORDER BY p_brand
"""
QUERIES["xyz_classification"] = xyz_classification


# BH-FDR permutation family: 30-bit multipliers (32-bit hash x 30-bit a
# + 31-bit c stays < 2^62 + 2^31 — the permutation_test_lift headroom rule).
BH_B = 32
BH_P = 4294967311
BH_Q100 = 10  # q = 0.10
BH_AC = [
    (
        ((48271 * (b + 377) + 12345) % 1073741789) | 1,
        (40692 * (b + 377) + 1234567) % 2147483647,
    )
    for b in range(BH_B)
]
assert all(a * (2**32 - 1) + c < 2**62 + 2**31 for a, c in BH_AC)


def bh_fdr_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over per-brand permutation tests —
    the multiple-testing layer the per-test tier (welch_t_test,
    permutation_test_lift) stops short of: screening all ~25 brands for a
    treatment effect at once inflates false positives unless the p-values
    are jointly controlled.

    Per brand, the same erf-free machinery as permutation_test_lift:
    treatment = even l_orderkey, response = extendedprice cents, B = 32
    label permutations drawn as parity bits of a universal hash family
    over ONE md5 per row (hashed on l_orderkey, so permuted labels stay
    constant within an order — cluster-consistent permutation), p_brand =
    (1 + #{|perm diff| >= |observed diff|}) / (B + 1).

    The BH step is exact integer arithmetic end to end: p-values are
    rationals with denominator B+1, brands rank by (k, brand) — a total
    order, so the cutoff is engine-independent — and the step-up test
    p_(i) <= i*q/m cross-multiplies to (1+k_i)*m*BH_Q100 <= i*(B+1)*100
    with q = 0.10.  reject = rank <= max passing rank: the standard
    step-up closure, computed with one max over the m-row brand frame.

    Scale: ONE pass over lineitem x broadcast part computing 2 + 2B
    integer partial aggregates per brand (no explode, no per-permutation
    shuffle); everything after runs on the m-row (~25) brand frame.
    """
    from ..functions.texts import md5_hash_long

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        (F.col("l_orderkey") % 2 == 0).alias("treat"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        md5_hash_long(F.col("l_orderkey").cast("string")).alias("h"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.when(F.col("treat"), 1).otherwise(0)).alias("n1o"),
        F.sum(F.when(F.col("treat"), F.col("cents")).otherwise(0)).alias(
            "s1o"
        ),
    ]
    for b in range(BH_B):
        a_b, c_b = BH_AC[b]
        bit = ((F.col("h") * a_b + c_b) % BH_P) % 2 == 0
        aggs.append(F.sum(F.when(bit, 1).otherwise(0)).alias(f"n{b}"))
        aggs.append(
            F.sum(F.when(bit, F.col("cents")).otherwise(0)).alias(f"c{b}")
        )
    wide = rows.groupBy("p_brand").agg(*aggs)

    def _diff(s1, n1, s, n):
        m1 = s1.cast("double") / n1.cast("double")
        m0 = (s - s1).cast("double") / (n - n1).cast("double")
        return (m1 - m0) / 100.0

    obs = _diff(F.col("s1o"), F.col("n1o"), F.col("s"), F.col("n"))
    wide = wide.withColumn("obs", obs)
    diffs = [
        _diff(F.col(f"c{b}"), F.col(f"n{b}"), F.col("s"), F.col("n")).alias(
            f"d{b}"
        )
        for b in range(BH_B)
    ]
    wide = wide.select("p_brand", "n", "obs", *diffs)
    stack = ", ".join(f"{b}, d{b}" for b in range(BH_B))
    perms = wide.selectExpr(
        "p_brand", "n", "obs", f"stack({BH_B}, {stack}) AS (b, d)"
    )
    k = perms.groupBy("p_brand", "n", "obs").agg(
        F.sum(F.when(F.abs(F.col("d")) >= F.abs(F.col("obs")), 1).otherwise(0))
        .cast("long")
        .alias("k_exceed")
    )
    m = k.agg(F.count(F.lit(1)).cast("long").alias("m"))
    kb = k.crossJoin(F.broadcast(m))
    wr = Window.partitionBy().orderBy("k_exceed", "p_brand")
    ranked = kb.withColumn("bh_rank", F.row_number().over(wr)).withColumn(
        "passes",
        (F.lit(1) + F.col("k_exceed")) * F.col("m") * F.lit(BH_Q100)
        <= F.col("bh_rank") * F.lit(BH_B + 1) * F.lit(100),
    )
    wall = Window.partitionBy()
    cutoff = F.max(F.when(F.col("passes"), F.col("bh_rank")).otherwise(0)).over(
        wall
    )
    return (
        ranked.withColumn("rejected", F.col("bh_rank") <= cutoff)
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n_rows"),
            "k_exceed",
            F.round((F.lit(1) + F.col("k_exceed")) / F.lit(BH_B + 1), 6)
            .alias("p_perm"),
            "bh_rank",
            "rejected",
        )
        .orderBy("bh_rank", "p_brand")
    )


def _bh_oracle() -> str:
    h = "CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8) AS BIGINT)"
    cols = [
        "p_brand",
        "CAST(count(*) AS BIGINT) AS n",
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s",
        "sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS n1o",
        "sum(CASE WHEN l_orderkey % 2 = 0"
        " THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END)"
        " AS s1o",
    ]
    for b in range(BH_B):
        a_b, c_b = BH_AC[b]
        bit = f"(({h} * {a_b} + {c_b}) % {BH_P}) % 2 = 0"
        cols.append(f"sum(CASE WHEN {bit} THEN 1 ELSE 0 END) AS n{b}")
        cols.append(
            f"sum(CASE WHEN {bit}"
            f" THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END)"
            f" AS c{b}"
        )
    sel = ", ".join(cols)

    def diff(s1, n1):
        return (
            f"(CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE)"
            f" - CAST(s - {s1} AS DOUBLE) / CAST(n - {n1} AS DOUBLE)) / 100.0"
        )

    terms = " + ".join(
        f"CASE WHEN abs({diff(f'c{b}', f'n{b}')})"
        f" >= abs({diff('s1o', 'n1o')}) THEN 1 ELSE 0 END"
        for b in range(BH_B)
    )
    return f"""
    WITH wide AS (
        SELECT {sel}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    ),
    k AS (
        SELECT p_brand, n, ({terms}) AS k_exceed FROM wide
    ),
    m AS (SELECT count(*) AS m FROM k),
    ranked AS (
        SELECT p_brand, n, k_exceed, m,
               row_number() OVER (ORDER BY k_exceed, p_brand) AS bh_rank
        FROM k, m
    ),
    flagged AS (
        SELECT *,
               (1 + k_exceed) * m * {BH_Q100}
                   <= bh_rank * {BH_B + 1} * 100 AS passes
        FROM ranked
    ),
    cut AS (
        SELECT coalesce(max(CASE WHEN passes THEN bh_rank END), 0) AS cutoff
        FROM flagged
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_rows,
           CAST(k_exceed AS BIGINT) AS k_exceed,
           round((1 + k_exceed) / CAST({BH_B + 1} AS DOUBLE), 6) AS p_perm,
           CAST(bh_rank AS BIGINT) AS bh_rank,
           bh_rank <= cutoff AS rejected
    FROM flagged, cut
    ORDER BY bh_rank, p_brand
    """


ORACLES["bh_fdr_brand_lift"] = _bh_oracle()
QUERIES["bh_fdr_brand_lift"] = bh_fdr_brand_lift


# --------------------------------------------------------------------------
# round 6, wave AT — rank-test completions: paired (Wilcoxon signed-rank),
# blocked k-sample (Friedman), and the Kruskal-Wallis post-hoc (Dunn)
# --------------------------------------------------------------------------


def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test — the PAIRED companion of mann_whitney_u:
    did daily revenue shift between 1996 and 1997, pairing each calendar
    (month, day) across the two years?  W+ = sum of |delta| midranks over
    positive deltas, tie-corrected variance, continuity-corrected z.

    Exactness: deltas are exact cent integers; zero deltas drop (the
    standard treatment); doubled midranks 2r = 2*cum - n_t + 1 over the
    |delta| grid keep every rank integral, so W2 = 2*W+ and the centered
    numerator W2 - n(n+1)/2 are exact decimal(38,0) integers.  The only
    float ops are the final division and sqrt (single scalar expression,
    identical both engines).

    Scale: orders reduce once to the calendar-bounded daily frame; the
    pair join and rank window run on <= 366 rows at any corpus size.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    y96 = daily.filter(F.year("day") == 1996).select(
        F.month("day").alias("m"), F.dayofmonth("day").alias("d"),
        F.col("x").alias("xa"),
    )
    y97 = daily.filter(F.year("day") == 1997).select(
        F.month("day").alias("m"), F.dayofmonth("day").alias("d"),
        F.col("x").alias("xb"),
    )
    pairs = (
        y96.join(y97, ["m", "d"])
        .select((F.col("xa") - F.col("xb")).alias("delta"))
        .filter(F.col("delta") != 0)
    )
    g = pairs.groupBy(F.abs(F.col("delta")).alias("ad")).agg(
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("na"),
        F.count(F.lit(1)).alias("nt"),
    )
    w = Window.partitionBy().orderBy("ad").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.withColumn(
        "rank2", F.lit(2) * F.sum("nt").over(w) - F.col("nt") + F.lit(1)
    )
    s = r.agg(
        F.sum("nt").cast(_DEC).alias("n"),
        F.sum(F.col("na").cast(_DEC) * F.col("rank2").cast(_DEC)).alias("w2"),
        F.sum(
            F.col("nt").cast(_DEC) * F.col("nt").cast(_DEC)
            * F.col("nt").cast(_DEC)
            - F.col("nt").cast(_DEC)
        ).alias("tsum"),
    )
    n = F.col("n")
    num2 = F.col("w2") - n * (n + 1) / 2
    var_w = (
        (n * (n + 1) * (2 * n + 1)).cast("double") / F.lit(24.0)
        - F.col("tsum").cast("double") / F.lit(48.0)
    )
    z = (num2.cast("double") - F.signum(num2.cast("double"))) / (
        F.lit(2.0) * F.sqrt(var_w)
    )
    return s.select(
        n.cast("long").alias("n_pairs"),
        F.round(F.col("w2").cast("double") / 2.0, 1).alias("w_plus"),
        F.round(z, 4).alias("z_stat"),
        F.when(num2 > 0, F.lit("1997-lower"))
        .when(num2 < 0, F.lit("1997-higher"))
        .otherwise(F.lit("no-shift"))
        .alias("direction"),
    )


ORACLES["wilcoxon_signed_rank"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT a.x - b.x AS delta
        FROM daily a JOIN daily b
          ON month(a.day) = month(b.day) AND day(a.day) = day(b.day)
        WHERE year(a.day) = 1996 AND year(b.day) = 1997 AND a.x != b.x
    ),
    g AS (
        SELECT abs(delta) AS ad,
               sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS na,
               count(*) AS nt
        FROM pairs GROUP BY 1
    ),
    r AS (
        SELECT na, nt,
               2 * sum(nt) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW)
                 - nt + 1 AS rank2
        FROM g
    ),
    s AS (
        SELECT sum(nt) AS n, sum(na * rank2) AS w2,
               sum(nt * nt * nt - nt) AS tsum
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(CAST(w2 AS DOUBLE) / 2.0, 1) AS w_plus,
           round((CAST(w2 - n * (n + 1) / 2 AS DOUBLE)
                  - sign(CAST(w2 - n * (n + 1) / 2 AS DOUBLE)))
                 / (2.0 * sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE)
                               / 24.0
                               - CAST(tsum AS DOUBLE) / 48.0)), 4)
               AS z_stat,
           CASE WHEN w2 - n * (n + 1) / 2 > 0 THEN '1997-lower'
                WHEN w2 - n * (n + 1) / 2 < 0 THEN '1997-higher'
                ELSE 'no-shift' END AS direction
    FROM s
"""
QUERIES["wilcoxon_signed_rank"] = wilcoxon_signed_rank


def friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test — the BLOCKED k-sample companion of kruskal_wallis:
    does purchase revenue differ by ISO weekday once week-to-week level
    shifts are blocked out?  Blocks = complete ISO weeks (all 7 days
    observed) of the events window, treatments = weekdays 1..7; within
    each week the 7 daily revenues get midranks and the tie-corrected
    statistic is chi2 = (k-1) * sum_j (R_j - n(k+1)/2)^2 / (A - C).

    Exactness: doubled midranks 2r = 2*cum - n_t + 1 (computed per week
    on <= 7-row partitions) keep every cell integral; with doubled ranks
    the statistic collapses to chi2 = (k-1) * S2 / D2 with
    S2 = sum_j (R2_j - n(k+1))^2 and D2 = A2 - n*k*(k+1)^2 both exact
    decimal(38,0) integers — ONE float division total, and the
    significance verdict cross-multiplies (k-1)*S2*1000 > 12592*D2
    (chi2_crit(df=6, .05) = 12.592) so no float decides it.

    Scale: events reduce once to the calendar-bounded daily frame; rank
    windows are 7-row partitions (perfectly parallel); the weekday rollup
    is a 7-row frame.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    d = daily.select(
        F.date_trunc("week", F.col("day")).alias("wk"),
        (F.expr("weekday(day)") + 1).alias("dow"),
        "x",
    )
    wcnt = Window.partitionBy("wk")
    full = d.withColumn("ndays", F.count(F.lit(1)).over(wcnt)).filter(
        F.col("ndays") == 7
    )
    g = full.groupBy("wk", "x").agg(
        F.count(F.lit(1)).alias("nt"),
        F.collect_list("dow").alias("dows"),
    )
    ww = Window.partitionBy("wk").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.withColumn(
        "rank2", F.lit(2) * F.sum("nt").over(ww) - F.col("nt") + F.lit(1)
    ).select("wk", "rank2", "nt", F.explode("dows").alias("dow"))
    per_dow = r.groupBy("dow").agg(
        F.sum(F.col("rank2").cast(_DEC)).alias("r2j"),
        F.sum(
            F.col("rank2").cast(_DEC) * F.col("rank2").cast(_DEC)
        ).alias("a2j"),
        F.count(F.lit(1)).cast(_DEC).alias("nweeks"),
    )
    stat = per_dow.agg(
        F.max("nweeks").alias("n"),
        F.count(F.lit(1)).cast(_DEC).alias("k"),
        F.sum("a2j").alias("a2"),
        F.sum(
            (F.col("r2j") - F.col("nweeks") * 8)
            * (F.col("r2j") - F.col("nweeks") * 8)
        ).alias("s2"),
    )
    n, k = F.col("n"), F.col("k")
    d2 = F.col("a2") - n * k * (k + 1) * (k + 1)
    chi2 = (k - 1).cast("double") * F.col("s2").cast("double") / d2.cast(
        "double"
    )
    return stat.select(
        n.cast("long").alias("n_weeks"),
        k.cast("long").alias("k_treatments"),
        F.round(chi2, 6).alias("chi2"),
        ((k - 1) * F.col("s2") * 1000 > d2 * 12592).alias("significant_05"),
    )


ORACLES["friedman_test"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS (
        SELECT date_trunc('week', day) AS wk, isodow(day) AS dow, x
        FROM daily
    ),
    full_wk AS (
        SELECT * FROM (
            SELECT d.*, count(*) OVER (PARTITION BY wk) AS ndays FROM d
        ) WHERE ndays = 7
    ),
    g AS (
        SELECT wk, x, count(*) AS nt, list(dow) AS dows
        FROM full_wk GROUP BY 1, 2
    ),
    r AS (
        SELECT wk,
               2 * sum(nt) OVER (PARTITION BY wk ORDER BY x
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - nt + 1 AS rank2,
               unnest(dows) AS dow
        FROM g
    ),
    per_dow AS (
        SELECT dow, sum(rank2) AS r2j, sum(rank2 * rank2) AS a2j,
               count(*) AS nweeks
        FROM r GROUP BY 1
    ),
    stat AS (
        SELECT max(nweeks) AS n, count(*) AS k, sum(a2j) AS a2,
               sum((r2j - nweeks * 8) * (r2j - nweeks * 8)) AS s2
        FROM per_dow
    )
    SELECT CAST(n AS BIGINT) AS n_weeks, CAST(k AS BIGINT) AS k_treatments,
           round(CAST((k - 1) * s2 AS DOUBLE)
                 / CAST(a2 - n * k * (k + 1) * (k + 1) AS DOUBLE), 6)
               AS chi2,
           (k - 1) * s2 * 1000
               > (a2 - n * k * (k + 1) * (k + 1)) * 12592 AS significant_05
    FROM stat
"""
QUERIES["friedman_test"] = friedman_test


def dunn_posthoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test — the pairwise follow-up kruskal_wallis stops
    short of: WHICH event-type pairs differ, using the POOLED midranks of
    the omnibus test (not per-pair reranking — that is what distinguishes
    Dunn from running mann_whitney_u ten times) with a Bonferroni-style
    fixed critical value.

    z_ij = (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 - T/(12(N-1))) *
    (1/n_i + 1/n_j)), T = sum(t^3 - t) over pooled tie groups.

    Exactness: one pooled doubled-midrank pass over the range-bounded
    cent grid (the mann_whitney_u bound: <= ~33k rows at any SF); rank
    sums R2_i, tie cubes and group sizes are exact decimal(38,0); z is a
    single float expression over them, identical both engines; the
    significance verdict compares |z| to the Bonferroni critical 2.807
    (alpha = .05, 10 pairs) on that bit-identical double.

    Scale: one groupBy to the (type, cent) grid + one grid-total window;
    everything after runs on the 5-row type frame and its 10-row pair
    frame (broadcast joins).
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cv")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    grid = g.groupBy("cv").agg(F.sum("cnt").alias("nt"))
    w = Window.partitionBy().orderBy("cv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = grid.withColumn(
        "rank2", F.lit(2) * F.sum("nt").over(w) - F.col("nt") + F.lit(1)
    )
    per_type = (
        g.join(ranked.select("cv", "rank2"), "cv")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("cnt").cast(_DEC)).alias("ni"),
            F.sum(F.col("cnt").cast(_DEC) * F.col("rank2").cast(_DEC)).alias(
                "r2i"
            ),
        )
    )
    glob = ranked.agg(
        F.sum(F.col("nt").cast(_DEC)).alias("nn"),
        F.sum(
            F.col("nt").cast(_DEC) * F.col("nt").cast(_DEC)
            * F.col("nt").cast(_DEC)
            - F.col("nt").cast(_DEC)
        ).alias("tsum"),
    )
    a = per_type.select(
        F.col("event_type").alias("ta"),
        F.col("ni").alias("na"),
        F.col("r2i").alias("r2a"),
    )
    b = per_type.select(
        F.col("event_type").alias("tb"),
        F.col("ni").alias("nb"),
        F.col("r2i").alias("r2b"),
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ta") < F.col("tb"))
        .crossJoin(F.broadcast(glob))
    )
    nn = F.col("nn").cast("double")
    mra = F.col("r2a").cast("double") / (2.0 * F.col("na").cast("double"))
    mrb = F.col("r2b").cast("double") / (2.0 * F.col("nb").cast("double"))
    sig2 = (
        nn * (nn + 1.0) / 12.0
        - F.col("tsum").cast("double") / (12.0 * (nn - 1.0))
    )
    z = (mra - mrb) / F.sqrt(
        sig2
        * (
            1.0 / F.col("na").cast("double")
            + 1.0 / F.col("nb").cast("double")
        )
    )
    return pairs.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mra, 4).alias("mean_rank_a"),
        F.round(mrb, 4).alias("mean_rank_b"),
        F.round(z, 4).alias("z_dunn"),
        (F.abs(z) > F.lit(2.807)).alias("significant_05_bonf"),
    ).orderBy("type_a", "type_b")


ORACLES["dunn_posthoc_pairs"] = """
    WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cv,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    grid AS (SELECT cv, sum(cnt) AS nt FROM g GROUP BY 1),
    ranked AS (
        SELECT cv,
               2 * sum(nt) OVER (ORDER BY cv ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) - nt + 1
                   AS rank2,
               nt
        FROM grid
    ),
    per_type AS (
        SELECT event_type, sum(cnt) AS ni, sum(cnt * rank2) AS r2i
        FROM g JOIN ranked USING (cv)
        GROUP BY 1
    ),
    gstats AS (
        SELECT sum(nt) AS nn, sum(nt * nt * nt - nt) AS tsum FROM ranked
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(a.ni AS BIGINT) AS n_a, CAST(b.ni AS BIGINT) AS n_b,
           round(CAST(a.r2i AS DOUBLE) / (2.0 * CAST(a.ni AS DOUBLE)), 4)
               AS mean_rank_a,
           round(CAST(b.r2i AS DOUBLE) / (2.0 * CAST(b.ni AS DOUBLE)), 4)
               AS mean_rank_b,
           round((CAST(a.r2i AS DOUBLE) / (2.0 * CAST(a.ni AS DOUBLE))
                  - CAST(b.r2i AS DOUBLE) / (2.0 * CAST(b.ni AS DOUBLE)))
                 / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                         / 12.0
                         - CAST(tsum AS DOUBLE)
                           / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))
                        * (1.0 / CAST(a.ni AS DOUBLE)
                           + 1.0 / CAST(b.ni AS DOUBLE))), 4) AS z_dunn,
           abs((CAST(a.r2i AS DOUBLE) / (2.0 * CAST(a.ni AS DOUBLE))
                - CAST(b.r2i AS DOUBLE) / (2.0 * CAST(b.ni AS DOUBLE)))
               / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                       / 12.0
                       - CAST(tsum AS DOUBLE)
                         / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))
                      * (1.0 / CAST(a.ni AS DOUBLE)
                         + 1.0 / CAST(b.ni AS DOUBLE)))) > 2.807
               AS significant_05_bonf
    FROM per_type a, per_type b, gstats
    WHERE a.event_type < b.event_type
    ORDER BY type_a, type_b
"""
QUERIES["dunn_posthoc_pairs"] = dunn_posthoc_pairs


# --------------------------------------------------------------------------
# round 6, wave AU — parametric diagnostics: Tukey HSD, Cochran Q,
# Ljung-Box, runs test, Grubbs screen
# --------------------------------------------------------------------------


def tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer HSD — the parametric post-hoc anova_f_oneway stops
    short of (dunn_posthoc_pairs is its rank-based sibling): which
    event-type mean-value pairs differ, using the POOLED within-group
    variance from the omnibus ANOVA, q_ij = |m_i - m_j| /
    sqrt(MSW/2 * (1/n_i + 1/n_j)) against the studentized-range critical
    3.858 (k = 5, df = inf, alpha = .05).

    Exactness: per-type n, sum, sumsq fold as exact decimal(38,0) cent
    integers; MSW's numerator sum_i (ss_i - s_i^2/n_i) is assembled from
    n-scaled exact integers (n_i*ss_i - s_i^2 over n_i, one division per
    type, pico-rounded before the k-term sum so the pooled numerator is
    order-independent); q is a single float expression both engines.

    Scale: one groupBy to the 5-row type frame; the pair frame is 10
    rows, broadcast-joined.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_DEC).alias("ni"),
        F.sum(F.round(F.col("value") * 100).cast("long").cast(_DEC)).alias(
            "si"
        ),
        F.sum(
            F.round(F.col("value") * 100).cast("long").cast(_DEC)
            * F.round(F.col("value") * 100).cast("long").cast(_DEC)
        ).alias("ssi"),
    )
    # within-group SS per type, pico-rounded: (ni*ssi - si^2)/ni is exact
    # rational; one division per type, then an order-independent integer sum
    wss_pico = F.round(
        (F.col("ni") * F.col("ssi") - F.col("si") * F.col("si")).cast(
            "double"
        )
        / F.col("ni").cast("double")
        * 1e6
    ).cast(_DEC)
    pooled = g.select("event_type", "ni", "si", wss_pico.alias("wp")).agg(
        F.sum("ni").alias("nn"),
        F.count(F.lit(1)).cast(_DEC).alias("k"),
        F.sum("wp").alias("wssp"),
    )
    stats = g.crossJoin(F.broadcast(pooled))
    a = stats.select(
        F.col("event_type").alias("ta"), F.col("ni").alias("na"),
        F.col("si").alias("sa"), "nn", "k", "wssp",
    )
    b = g.select(
        F.col("event_type").alias("tb"), F.col("ni").alias("nb"),
        F.col("si").alias("sb"),
    )
    pairs = a.join(F.broadcast(b), F.col("ta") < F.col("tb"))
    ma = F.col("sa").cast("double") / F.col("na").cast("double") / 100.0
    mb = F.col("sb").cast("double") / F.col("nb").cast("double") / 100.0
    msw = (
        F.col("wssp").cast("double")
        / 1e6
        / (F.col("nn") - F.col("k")).cast("double")
        / 10000.0
    )
    q = F.abs(ma - mb) / F.sqrt(
        msw
        / 2.0
        * (
            1.0 / F.col("na").cast("double")
            + 1.0 / F.col("nb").cast("double")
        )
    )
    return pairs.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(q, 4).alias("q_stat"),
        (q > F.lit(3.858)).alias("significant_05"),
    ).orderBy("type_a", "type_b")


ORACLES["tukey_hsd_pairs"] = """
    WITH g AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS ni,
               CAST(sum(CAST(round(value * 100) AS HUGEINT)) AS HUGEINT)
                   AS si,
               CAST(sum(CAST(round(value * 100) AS HUGEINT)
                        * CAST(round(value * 100) AS HUGEINT)) AS HUGEINT)
                   AS ssi
        FROM events GROUP BY 1
    ),
    pooled AS (
        SELECT sum(ni) AS nn, count(*) AS k,
               sum(CAST(round(CAST(ni * ssi - si * si AS DOUBLE)
                              / CAST(ni AS DOUBLE) * 1e6) AS HUGEINT))
                   AS wssp
        FROM g
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round(CAST(a.si AS DOUBLE) / CAST(a.ni AS DOUBLE) / 100.0, 4)
               AS mean_a,
           round(CAST(b.si AS DOUBLE) / CAST(b.ni AS DOUBLE) / 100.0, 4)
               AS mean_b,
           round(abs(CAST(a.si AS DOUBLE) / CAST(a.ni AS DOUBLE) / 100.0
                     - CAST(b.si AS DOUBLE) / CAST(b.ni AS DOUBLE) / 100.0)
                 / sqrt(CAST(wssp AS DOUBLE) / 1e6
                        / CAST(nn - k AS DOUBLE) / 10000.0 / 2.0
                        * (1.0 / CAST(a.ni AS DOUBLE)
                           + 1.0 / CAST(b.ni AS DOUBLE))), 4) AS q_stat,
           abs(CAST(a.si AS DOUBLE) / CAST(a.ni AS DOUBLE) / 100.0
               - CAST(b.si AS DOUBLE) / CAST(b.ni AS DOUBLE) / 100.0)
               / sqrt(CAST(wssp AS DOUBLE) / 1e6
                      / CAST(nn - k AS DOUBLE) / 10000.0 / 2.0
                      * (1.0 / CAST(a.ni AS DOUBLE)
                         + 1.0 / CAST(b.ni AS DOUBLE))) > 3.858
               AS significant_05
    FROM g a, g b, pooled
    WHERE a.event_type < b.event_type
    ORDER BY type_a, type_b
"""
QUERIES["tukey_hsd_pairs"] = tukey_hsd_pairs


def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q — the BINARY repeated-measures member of the k-sample
    family (kruskal_wallis: continuous unpaired; friedman_test:
    continuous blocked; this: dichotomous blocked): does the share of
    users who purchase at all differ across the complete ISO weeks of
    the window?

    Q = (k-1) * (k*sum(C_w^2) - N^2) / (k*N - sum(R_u^2)) with C_w =
    users purchasing in week w, R_u = weeks in which user u purchased,
    N = sum(C) = sum(R).  Users with R_u = 0 contribute zero to every
    term, so the subject universe needs no materialization — the
    identity that makes Q computable from the (user, week) purchase
    frame alone.  All terms are exact integers; the significance verdict
    cross-multiplies (k-1)*(k*SC2 - N*N)*1000 > 7815*(k*N - SR2)
    (chi2_crit(df=3, .05) = 7.815; df = k-1 with k = 4 complete weeks at
    every SF) — no float decides it, and Q itself is ONE division.

    Scale: events reduce to the distinct (user, week) frame (map-side
    combined), then to per-user counts and per-week counts; the final
    statistic is a 4-cell + 1-cell aggregate.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    d = e.select(
        F.col("user_id"),
        F.date_trunc("week", F.to_date("ts")).alias("wk"),
        F.to_date("ts").alias("day"),
    )
    wk_days = d.select("wk", "day").distinct().groupBy("wk").agg(
        F.count(F.lit(1)).alias("ndays")
    ).filter(F.col("ndays") == 7).select("wk")
    uw = (
        d.join(F.broadcast(wk_days), "wk")
        .select("user_id", "wk")
        .distinct()
    )
    per_week = uw.groupBy("wk").agg(F.count(F.lit(1)).cast(_DEC).alias("c"))
    per_user = uw.groupBy("user_id").agg(
        F.count(F.lit(1)).cast(_DEC).alias("r")
    )
    cw = per_week.agg(
        F.count(F.lit(1)).cast(_DEC).alias("k"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    ru = per_user.agg(F.sum(F.col("r") * F.col("r")).alias("sr2"))
    s = cw.crossJoin(F.broadcast(ru))
    k, n, sc2, sr2 = F.col("k"), F.col("n"), F.col("sc2"), F.col("sr2")
    num = (k - 1) * (k * sc2 - n * n)
    den = k * n - sr2
    return s.select(
        k.cast("long").alias("k_weeks"),
        n.cast("long").alias("n_marks"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("q_stat"),
        (num * 1000 > den * 7815).alias("significant_05"),
    )


ORACLES["cochran_q_test"] = """
    WITH d AS (
        SELECT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk,
               CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'purchase'
    ),
    wk_days AS (
        SELECT wk FROM (
            SELECT wk, count(*) AS ndays
            FROM (SELECT DISTINCT wk, day FROM d) GROUP BY 1
        ) WHERE ndays = 7
    ),
    uw AS (
        SELECT DISTINCT user_id, d.wk
        FROM d JOIN wk_days ON d.wk = wk_days.wk
    ),
    per_week AS (
        SELECT wk, CAST(count(*) AS HUGEINT) AS c FROM uw GROUP BY 1
    ),
    per_user AS (
        SELECT user_id, CAST(count(*) AS HUGEINT) AS r FROM uw GROUP BY 1
    ),
    cw AS (
        SELECT CAST(count(*) AS HUGEINT) AS k, sum(c) AS n,
               sum(c * c) AS sc2
        FROM per_week
    ),
    ru AS (SELECT sum(r * r) AS sr2 FROM per_user)
    SELECT CAST(k AS BIGINT) AS k_weeks, CAST(n AS BIGINT) AS n_marks,
           round(CAST((k - 1) * (k * sc2 - n * n) AS DOUBLE)
                 / CAST(k * n - sr2 AS DOUBLE), 6) AS q_stat,
           (k - 1) * (k * sc2 - n * n) * 1000
               > (k * n - sr2) * 7815 AS significant_05
    FROM cw, ru
"""
QUERIES["cochran_q_test"] = cochran_q_test


LB_LAGS = 7


def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test for autocorrelation in daily revenue —
    the omnibus companion of pacf_daily_revenue (which reports individual
    partial lags) and durbin_watson_trend (lag-1 only on trend
    residuals): Q = n(n+2) * sum_{j=1..7} rho_j^2/(n-j) over the mean-
    centered daily series.

    Exactness: autocovariances fold as n-scaled exact integers
    c_j = sum_t (n*x_t - S)(n*x_{t+j} - S) in decimal(38,0) (the n-scaling
    cancels in rho_j = c_j/c_0, so no division precedes the one-expression
    statistic); lag alignment is a single ordered window over the
    calendar-bounded daily frame.

    Scale: orders reduce once to the bounded daily frame; one scalar
    cross join for (n, S); one window pass; one 8-cell aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast(_DEC)
        .alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"), F.sum("x").alias("s")
    )
    d = daily.crossJoin(F.broadcast(tot)).withColumn(
        "u", F.col("n") * F.col("x") - F.col("s")
    )
    wn = Window.partitionBy().orderBy("day")
    lagged = d.select(
        "u",
        *[F.lag("u", j).over(wn).alias(f"u{j}") for j in range(1, LB_LAGS + 1)],
    )
    aggs = [F.sum(F.col("u") * F.col("u")).alias("c0")] + [
        F.sum(F.col("u") * F.col(f"u{j}")).alias(f"c{j}")
        for j in range(1, LB_LAGS + 1)
    ]
    mom = lagged.agg(*aggs).crossJoin(F.broadcast(tot.select("n")))
    n = F.col("n").cast("double")
    q = n * (n + 2.0) * sum(
        (
            (F.col(f"c{j}").cast("double") / F.col("c0").cast("double"))
            * (F.col(f"c{j}").cast("double") / F.col("c0").cast("double"))
            / (n - float(j))
        )
        for j in range(1, LB_LAGS + 1)
    )
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(LB_LAGS).alias("n_lags"),
        F.round(q, 6).alias("q_lb"),
        (q > F.lit(14.067)).alias("significant_05"),
    )


def _lb_oracle() -> str:
    lags = ", ".join(
        f"lag(u, {j}) OVER (ORDER BY day) AS u{j}"
        for j in range(1, LB_LAGS + 1)
    )
    cs = ", ".join(
        f"sum(u * u{j}) AS c{j}" for j in range(1, LB_LAGS + 1)
    )
    qexpr = " + ".join(
        f"(CAST(c{j} AS DOUBLE) / CAST(c0 AS DOUBLE))"
        f" * (CAST(c{j} AS DOUBLE) / CAST(c0 AS DOUBLE))"
        f" / (CAST(n AS DOUBLE) - {float(j)})"
        for j in range(1, LB_LAGS + 1)
    )
    return f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s FROM daily
    ),
    d AS (SELECT day, n * x - s AS u, n FROM daily, tot),
    lagged AS (SELECT u, n, {lags} FROM d),
    mom AS (
        SELECT max(n) AS n, sum(u * u) AS c0, {cs} FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n_days, {LB_LAGS} AS n_lags,
           round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                 * ({qexpr}), 6) AS q_lb,
           CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * ({qexpr})
               > 14.067 AS significant_05
    FROM mom
    """


ORACLES["ljung_box_test"] = _lb_oracle()
QUERIES["ljung_box_test"] = ljung_box_test


def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of daily revenue around
    its median — the sequence-level diagnostic beside ljung_box_test
    (linear autocorrelation) and mann_kendall_trend (monotone trend):
    too FEW runs means persistence, too MANY means oscillation.

    The reference median is the exact lower median of the daily cent
    grid (row_number pick at rank (n+1) div 2 on the calendar-bounded
    frame); days equal to the median drop (standard treatment).  The run
    count folds exact sign-change indicators over one ordered window;
    z = (R - mu)/sigma with mu = 2*n1*n2/(n1+n2) + 1 and sigma^2 =
    2*n1*n2*(2*n1*n2 - n1 - n2) / ((n1+n2)^2 * (n1+n2-1)) is a single
    float expression over the three exact integers (R, n1, n2).

    Scale: one reduce to the bounded daily frame; one ordered window.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    wx = Window.partitionBy().orderBy("x", "day")
    tot = daily.agg(F.count(F.lit(1)).alias("n"))
    med = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("x").alias("med"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select("day", (F.col("x") > F.col("med")).alias("up"))
    )
    wd = Window.partitionBy().orderBy("day")
    runs = signed.withColumn("prev", F.lag("up").over(wd)).agg(
        F.sum(F.when(F.col("up"), 1).otherwise(0)).cast(_DEC).alias("n1"),
        F.sum(F.when(F.col("up"), 0).otherwise(1)).cast(_DEC).alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("prev") != F.col("up")),
                    1,
                ).otherwise(0)
            )
        ).cast(_DEC).alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    nn = (n1 + n2).cast("double")
    p2 = (F.lit(2).cast(_DEC) * n1 * n2).cast("double")
    mu = p2 / nn + 1.0
    sig2 = (
        p2 * (p2 - nn) / (nn * nn * (nn - 1.0))
    )
    z = (r.cast("double") - mu) / F.sqrt(sig2)
    return runs.select(
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        F.round(z, 4).alias("z_stat"),
        F.when(z < -1.96, F.lit("persistent"))
        .when(z > 1.96, F.lit("oscillating"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


ORACLES["runs_test"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT count(*) AS n FROM daily),
    med AS (
        SELECT x AS med FROM (
            SELECT x, row_number() OVER (ORDER BY x, day) AS rn FROM daily
        ), tot
        WHERE rn = (n + 1) // 2
    ),
    signed AS (
        SELECT day, x > med AS up FROM daily, med WHERE x != med
    ),
    lagged AS (
        SELECT up, lag(up) OVER (ORDER BY day) AS prev FROM signed
    ),
    runs AS (
        SELECT CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
               CAST(sum(CASE WHEN up THEN 0 ELSE 1 END) AS HUGEINT) AS n2,
               CAST(1 + sum(CASE WHEN prev IS NOT NULL AND prev != up
                                 THEN 1 ELSE 0 END) AS HUGEINT) AS r
        FROM lagged
    )
    SELECT CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           round((CAST(r AS DOUBLE)
                  - (CAST(2 * n1 * n2 AS DOUBLE)
                     / CAST(n1 + n2 AS DOUBLE) + 1.0))
                 / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                        * (CAST(2 * n1 * n2 AS DOUBLE)
                           - CAST(n1 + n2 AS DOUBLE))
                        / (CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 AS DOUBLE)
                           * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 4)
               AS z_stat,
           CASE WHEN (CAST(r AS DOUBLE)
                      - (CAST(2 * n1 * n2 AS DOUBLE)
                         / CAST(n1 + n2 AS DOUBLE) + 1.0))
                     / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                            * (CAST(2 * n1 * n2 AS DOUBLE)
                               - CAST(n1 + n2 AS DOUBLE))
                            / (CAST(n1 + n2 AS DOUBLE)
                               * CAST(n1 + n2 AS DOUBLE)
                               * (CAST(n1 + n2 AS DOUBLE) - 1.0)))
                     < -1.96 THEN 'persistent'
                WHEN (CAST(r AS DOUBLE)
                      - (CAST(2 * n1 * n2 AS DOUBLE)
                         / CAST(n1 + n2 AS DOUBLE) + 1.0))
                     / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                            * (CAST(2 * n1 * n2 AS DOUBLE)
                               - CAST(n1 + n2 AS DOUBLE))
                            / (CAST(n1 + n2 AS DOUBLE)
                               * CAST(n1 + n2 AS DOUBLE)
                               * (CAST(n1 + n2 AS DOUBLE) - 1.0)))
                     > 1.96 THEN 'oscillating'
                ELSE 'random' END AS verdict
    FROM runs
"""
QUERIES["runs_test"] = runs_test


def grubbs_outlier_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs-style maximum-studentized-deviation screen on daily revenue
    — the single-point parametric companion of mad_outliers (robust,
    per-row) and mahalanobis_outliers_2d (bivariate): WHICH day deviates
    most from the mean, and by how many sample standard deviations.

    G = max_t |x_t - xbar| / s from n-scaled exact integers: the deviation
    grid |n*x_t - S| is exact decimal(38,0) (argmax day recovered with a
    deterministic (dev desc, day) pick, so ties cannot flip between
    engines), and G = (max_dev/n) / sqrt((n*Sxx - S^2)/(n^2*(n-1))) is a
    single float expression.  The fixed screen threshold G > 3.5 is a
    documented operating point (the exact Grubbs critical value needs a
    t-quantile neither engine exposes), compared on the bit-identical
    double.

    Scale: one reduce to the bounded daily frame, one scalar cross join,
    one TakeOrderedAndProject pick.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast(_DEC)
        .alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day", "n", "s", "sxx",
        F.abs(F.col("n") * F.col("x") - F.col("s")).alias("adev"),
        (F.col("n") * F.col("x") - F.col("s") > 0).alias("above"),
    )
    top = dev.orderBy(F.col("adev").desc(), F.col("day").asc()).limit(1)
    n = F.col("n").cast("double")
    # sample sd: s^2 = (n*Sxx - S^2) / (n*(n-1)); adev = n*|x - xbar|
    g = (F.col("adev").cast("double") / n) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("s") * F.col("s")).cast("double")
        / (n * (n - 1.0))
    )
    return top.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("day").alias("peak_day"),
        F.col("above").alias("above_mean"),
        F.round(g, 4).alias("g_stat"),
        (g > F.lit(3.5)).alias("flag_3p5"),
    )


ORACLES["grubbs_outlier_test"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s,
               sum(x * x) AS sxx
        FROM daily
    ),
    dev AS (
        SELECT day, n, s, sxx, abs(n * x - s) AS adev,
               n * x - s > 0 AS above
        FROM daily, tot
    ),
    top AS (
        SELECT * FROM dev ORDER BY adev DESC, day ASC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_days, day AS peak_day,
           above AS above_mean,
           round((CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt(CAST(n * sxx - s * s AS DOUBLE)
                        / (CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) - 1.0))), 4) AS g_stat,
           (CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(CAST(n * sxx - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))) > 3.5 AS flag_3p5
    FROM top
"""
QUERIES["grubbs_outlier_test"] = grubbs_outlier_test


def bass_diffusion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion model of customer adoption — the aggregate-growth
    companion of retention_decay_fit (decay) and holt_forecast (level/
    trend): fit n_t = p*M + (q - p)*N_{t-1} - (q/M)*N_{t-1}^2 by OLS on
    the daily new-adopter series (first order date per customer), then
    invert the quadratic for the innovation rate p, imitation rate q and
    market size M; peak-adoption time ln(q/p)/(p+q) reported beside them.

    Exactness: adopters/day and cumulative adopters are exact integers
    (one ordered window over the calendar-bounded adoption-day frame);
    the regression is the ols_two_feature centered-Cramer shape on
    features (N, N^2) with ALL raw moments folded in decimal(38,0) and
    every centered quantity a single float expression of them (at 100-TB
    customer counts the centered products stay in double — the
    mahalanobis rule).  ln() is engine-native on both sides; outputs
    round at 4-6dp (the theil_inequality precedent for log parity).

    Scale: orders reduce to one row per customer (map-side min), then to
    the bounded adoption-day frame; one window, one 9-cell aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    adopt = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("aday"))
    daily = adopt.groupBy(F.col("aday").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    wn = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = daily.withColumn(
        "cum", F.coalesce(F.sum("y").over(wn), F.lit(0)).cast(_DEC)
    ).select(
        F.col("y").cast(_DEC).alias("y"),
        F.col("cum").alias("z1"),
        (F.col("cum") * F.col("cum")).alias("z2"),
    )
    mom = d.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("z1").alias("s1"),
        F.sum("z2").alias("s2"),
        F.sum(F.col("z1") * F.col("z1")).alias("s11"),
        F.sum(F.col("z2") * F.col("z2")).alias("s22"),
        F.sum(F.col("z1") * F.col("z2")).alias("s12"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("z1")).alias("sy1"),
        F.sum(F.col("y") * F.col("z2")).alias("sy2"),
    )
    c = {k: F.col(k).cast("double")
         for k in ("n", "s1", "s2", "s11", "s22", "s12", "sy", "sy1", "sy2")}
    n = c["n"]
    c11 = c["s11"] - c["s1"] * c["s1"] / n
    c22 = c["s22"] - c["s2"] * c["s2"] / n
    c12 = c["s12"] - c["s1"] * c["s2"] / n
    c1y = c["sy1"] - c["s1"] * c["sy"] / n
    c2y = c["sy2"] - c["s2"] * c["sy"] / n
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    a = (c["sy"] - b1 * c["s1"] - b2 * c["s2"]) / n
    disc = b1 * b1 - 4.0 * b2 * a
    mkt = F.when(
        disc >= 0.0, (-b1 - F.sqrt(disc)) / (2.0 * b2)
    )
    q = -b2 * mkt
    p = a / mkt
    # degenerate fits (negative p or q: the quadratic has no diffusion
    # interpretation) yield NULL peak — and DuckDB's ln() errors on
    # negatives where Spark returns NULL, so the guard is mandatory
    peak = F.when((p > 0.0) & (q > 0.0), F.log(q / p) / (p + q))
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").cast("long").alias("n_adopters"),
        F.round(p, 6).alias("p_innovation"),
        F.round(q, 6).alias("q_imitation"),
        F.round(mkt, 2).alias("market_size"),
        F.round(peak, 4).alias("peak_day"),
    )


ORACLES["bass_diffusion_fit"] = """
    WITH adopt AS (
        SELECT o_custkey, min(o_orderdate) AS aday FROM orders GROUP BY 1
    ),
    daily AS (
        SELECT aday AS day, CAST(count(*) AS HUGEINT) AS y
        FROM adopt GROUP BY 1
    ),
    d AS (
        SELECT y,
               coalesce(sum(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND 1 PRECEDING),
                        0) AS z1
        FROM daily
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(z1) AS s1,
               sum(z1 * z1) AS s2,
               sum(z1 * z1) AS s11x,
               sum(z1 * z1 * z1 * z1) AS s22,
               sum(z1 * z1 * z1) AS s12,
               sum(y) AS sy, sum(y * z1) AS sy1,
               sum(y * z1 * z1) AS sy2
        FROM d
    ),
    f AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
               CAST(s2 AS DOUBLE) AS s2, CAST(s11x AS DOUBLE) AS s11,
               CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
               CAST(sy AS DOUBLE) AS sy, CAST(sy1 AS DOUBLE) AS sy1,
               CAST(sy2 AS DOUBLE) AS sy2,
               CAST(n AS BIGINT) AS n_days, CAST(sy AS BIGINT) AS n_adopters
        FROM mom
    ),
    cr AS (
        SELECT n_days, n_adopters, n, s1, s2, sy,
               (s11 - s1 * s1 / n) AS c11,
               (s22 - s2 * s2 / n) AS c22,
               (s12 - s1 * s2 / n) AS c12,
               (sy1 - s1 * sy / n) AS c1y,
               (sy2 - s2 * sy / n) AS c2y
        FROM f
    ),
    beta AS (
        SELECT n_days, n_adopters, n, s1, s2, sy,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
        FROM cr
    ),
    abc AS (
        SELECT n_days, n_adopters, b1, b2,
               (sy - b1 * s1 - b2 * s2) / n AS a
        FROM beta
    ),
    inv AS (
        SELECT n_days, n_adopters, a, b1, b2,
               CASE WHEN b1 * b1 - 4.0 * b2 * a >= 0.0
                    THEN (-b1 - sqrt(b1 * b1 - 4.0 * b2 * a)) / (2.0 * b2)
               END AS mkt
        FROM abc
    ),
    pq AS (
        SELECT n_days, n_adopters, mkt,
               a / mkt AS p, -b2 * mkt AS q
        FROM inv
    )
    SELECT n_days, n_adopters,
           round(p, 6) AS p_innovation,
           round(q, 6) AS q_imitation,
           round(mkt, 2) AS market_size,
           round(CASE WHEN p > 0.0 AND q > 0.0
                      THEN ln(q / p) / (p + q) END, 4) AS peak_day
    FROM pq
"""
QUERIES["bass_diffusion_fit"] = bass_diffusion_fit


GESD_ROUNDS = 3


def gesd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD screen (Rosner): THREE unrolled test rounds on
    daily revenue, each removing the current argmax studentized
    deviation and DOWNDATING the exact moments (n' = n-1, S' = S-x,
    SSX' = SSX - x^2) instead of rescanning — the multiple-outlier
    completion of grubbs_outlier_test, which masks secondary outliers
    (a second spike inflates s and hides the first).

    Determinism: every argmax is a (|n*x - S| desc, day asc)
    TakeOrderedAndProject pick on exact decimal(38,0) deviations, so
    ties cannot flip between engines; each R_i is a single float
    expression of the round's exact moments.  The fixed screen
    threshold R > 3.5 is the grubbs operating point (exact ESD lambdas
    need t-quantiles neither engine exposes).

    Scale: one reduce to the bounded daily frame; each round is a
    1-row broadcast + one top-1 pick — a static 3-step DAG, no
    iteration in either engine.
    """
    o = load_table(spark, sf_dir, "orders")
    # materialize the calendar-bounded daily frame once: every downdating
    # round references it (directly and through the remaining chain), and
    # each 1-row top pick below is an eager action — without this cut the
    # fact aggregate re-executes per round (measured r11: 90-Exchange plan)
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast(_DEC)
        .alias("x")
    ).localCheckpoint(eager=True)
    t = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    remaining = daily
    tops = []
    for i in range(1, GESD_ROUNDS + 1):
        dev = remaining.crossJoin(F.broadcast(t)).select(
            "day", "x", "n", "s", "sxx",
            F.abs(F.col("n") * F.col("x") - F.col("s")).alias("adev"),
            (F.col("n") * F.col("x") - F.col("s") > 0).alias("above"),
        )
        # 1-row lineage cut: top is referenced three times per round
        # (report row, moment downdate, anti-join), so the un-truncated
        # tree doubles per round over the whole upstream
        top = (
            dev.orderBy(F.col("adev").desc(), F.col("day").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        nd = F.col("n").cast("double")
        r = (F.col("adev").cast("double") / nd) / F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("s") * F.col("s")).cast(
                "double"
            )
            / (nd * (nd - 1.0))
        )
        tops.append(
            top.select(
                F.lit(i).cast("int").alias("round"),
                F.col("day").alias("removed_day"),
                F.col("above").alias("above_mean"),
                F.col("n").cast("long").alias("n_at_test"),
                F.round(r, 4).alias("r_stat"),
                (r > F.lit(3.5)).alias("flag_3p5"),
            )
        )
        # downdate moments and shrink the frame for the next round
        t = top.select(
            (F.col("n") - 1).alias("n"),
            (F.col("s") - F.col("x")).alias("s"),
            (F.col("sxx") - F.col("x") * F.col("x")).alias("sxx"),
        )
        remaining = remaining.join(
            F.broadcast(top.select(F.col("day"))), "day", "left_anti"
        )
    out = tops[0]
    for tdf in tops[1:]:
        out = out.unionAll(tdf)
    return out.orderBy("round")


ORACLES["gesd_outliers"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    t1 AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s,
               sum(x * x) AS sxx
        FROM daily
    ),
    top1 AS (
        SELECT day, x, n, s, sxx, abs(n * x - s) AS adev,
               n * x - s > 0 AS above
        FROM daily, t1
        ORDER BY adev DESC, day ASC LIMIT 1
    ),
    t2 AS (SELECT n - 1 AS n, s - x AS s, sxx - x * x AS sxx FROM top1),
    top2 AS (
        SELECT d.day, d.x, t.n, t.s, t.sxx, abs(t.n * d.x - t.s) AS adev,
               t.n * d.x - t.s > 0 AS above
        FROM daily d, t2 t
        WHERE d.day NOT IN (SELECT day FROM top1)
        ORDER BY adev DESC, d.day ASC LIMIT 1
    ),
    t3 AS (SELECT n - 1 AS n, s - x AS s, sxx - x * x AS sxx FROM top2),
    top3 AS (
        SELECT d.day, d.x, t.n, t.s, t.sxx, abs(t.n * d.x - t.s) AS adev,
               t.n * d.x - t.s > 0 AS above
        FROM daily d, t3 t
        WHERE d.day NOT IN (SELECT day FROM top1)
          AND d.day NOT IN (SELECT day FROM top2)
        ORDER BY adev DESC, d.day ASC LIMIT 1
    ),
    u AS (
        SELECT 1 AS rnd, * FROM top1
        UNION ALL SELECT 2, * FROM top2
        UNION ALL SELECT 3, * FROM top3
    )
    SELECT CAST(rnd AS INTEGER) AS round, day AS removed_day,
           above AS above_mean,
           CAST(n AS BIGINT) AS n_at_test,
           round((CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt(CAST(n * sxx - s * s AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))),
                 4) AS r_stat,
           (CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(CAST(n * sxx - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               > 3.5 AS flag_3p5
    FROM u
    ORDER BY round
"""
QUERIES["gesd_outliers"] = gesd_outliers


def seasonal_esd_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-ESD anomaly detection (the Twitter S-H-ESD shape):
    deseasonalize daily revenue by subtracting each weekday's EXACT
    lower-median level, then run gesd_outliers' three downdating ESD
    rounds on the residuals — a raw-series ESD flags every summer
    Monday instead of true anomalies; removing the weekly component
    first is what makes the screen usable on seasonal operational
    series.

    Exactness: the per-weekday median is an integer-div rank pick on
    each weekday's bounded day frame; residuals r = x - med(dow) are
    exact integers, so each round's argmax is a (|n*r - S| desc, day)
    top-1 pick on exact decimals and R_i a single float expression —
    the gesd machinery verbatim on the deseasonalized grid.

    Scale: one reduce to the calendar-bounded daily frame, 7-way
    partitioned rank windows, then three 1-row-broadcast rounds.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    ).withColumn("dow", F.dayofweek("day"))
    w_rank = Window.partitionBy("dow").orderBy("xc", "day")
    ranked = daily.withColumn("r", F.row_number().over(w_rank)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy("dow"))
    )
    med = ranked.filter(F.col("r") == F.expr("(m + 1) div 2")).select(
        "dow", F.col("xc").alias("med")
    )
    # materialize the calendar-bounded residual frame once (see
    # gesd_outliers: the three eager top-1 rounds below would otherwise
    # re-execute the aggregate + median windows per round — measured r11:
    # 210-Exchange plan)
    resid = daily.join(F.broadcast(med), "dow").select(
        "day", "dow", (F.col("xc") - F.col("med")).cast(_DEC).alias("x")
    ).localCheckpoint(eager=True)
    t = resid.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    remaining = resid
    tops = []
    for i in range(1, GESD_ROUNDS + 1):
        dev = remaining.crossJoin(F.broadcast(t)).select(
            "day", "dow", "x", "n", "s", "sxx",
            F.abs(F.col("n") * F.col("x") - F.col("s")).alias("adev"),
            (F.col("n") * F.col("x") - F.col("s") > 0).alias("above"),
        )
        # 1-row lineage cut per round — see gesd_outliers
        top = (
            dev.orderBy(F.col("adev").desc(), F.col("day").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        nd = F.col("n").cast("double")
        r = (F.col("adev").cast("double") / nd) / F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("s") * F.col("s")).cast(
                "double"
            )
            / (nd * (nd - 1.0))
        )
        tops.append(
            top.select(
                F.lit(i).cast("int").alias("round"),
                F.col("day").alias("anomaly_day"),
                F.col("dow").cast("int").alias("dow"),
                F.round(F.col("x").cast("double") / 100.0, 2).alias(
                    "residual_dollars"
                ),
                F.col("above").alias("above_seasonal"),
                F.round(r, 4).alias("r_stat"),
                (r > F.lit(3.5)).alias("flag_3p5"),
            )
        )
        t = top.select(
            (F.col("n") - 1).alias("n"),
            (F.col("s") - F.col("x")).alias("s"),
            (F.col("sxx") - F.col("x") * F.col("x")).alias("sxx"),
        )
        remaining = remaining.join(
            F.broadcast(top.select(F.col("day"))), "day", "left_anti"
        )
    out = tops[0]
    for tdf in tops[1:]:
        out = out.unionAll(tdf)
    return out.orderBy("round")


ORACLES["seasonal_esd_anomalies"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS xc,
               dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow
        FROM orders GROUP BY 1, 3
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY dow ORDER BY xc, day)
                   AS r,
               count(*) OVER (PARTITION BY dow) AS m
        FROM daily
    ),
    med AS (SELECT dow, xc AS med FROM ranked WHERE r = (m + 1) // 2),
    resid AS (
        SELECT d.day, d.dow, d.xc - m.med AS x
        FROM daily d JOIN med m ON d.dow = m.dow
    ),
    t1 AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s,
               sum(x * x) AS sxx
        FROM resid
    ),
    top1 AS (
        SELECT day, dow, x, n, s, sxx, abs(n * x - s) AS adev,
               n * x - s > 0 AS above
        FROM resid, t1
        ORDER BY adev DESC, day ASC LIMIT 1
    ),
    t2 AS (SELECT n - 1 AS n, s - x AS s, sxx - x * x AS sxx FROM top1),
    top2 AS (
        SELECT d.day, d.dow, d.x, t.n, t.s, t.sxx,
               abs(t.n * d.x - t.s) AS adev, t.n * d.x - t.s > 0 AS above
        FROM resid d, t2 t
        WHERE d.day NOT IN (SELECT day FROM top1)
        ORDER BY adev DESC, d.day ASC LIMIT 1
    ),
    t3 AS (SELECT n - 1 AS n, s - x AS s, sxx - x * x AS sxx FROM top2),
    top3 AS (
        SELECT d.day, d.dow, d.x, t.n, t.s, t.sxx,
               abs(t.n * d.x - t.s) AS adev, t.n * d.x - t.s > 0 AS above
        FROM resid d, t3 t
        WHERE d.day NOT IN (SELECT day FROM top1)
          AND d.day NOT IN (SELECT day FROM top2)
        ORDER BY adev DESC, d.day ASC LIMIT 1
    ),
    u AS (
        SELECT 1 AS rnd, * FROM top1
        UNION ALL SELECT 2, * FROM top2
        UNION ALL SELECT 3, * FROM top3
    )
    SELECT CAST(rnd AS INTEGER) AS round, day AS anomaly_day,
           CAST(dow AS INTEGER) AS dow,
           round(CAST(x AS DOUBLE) / 100.0, 2) AS residual_dollars,
           above AS above_seasonal,
           round((CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt(CAST(n * sxx - s * s AS DOUBLE)
                        / (CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) - 1.0))), 4) AS r_stat,
           (CAST(adev AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(CAST(n * sxx - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               > 3.5 AS flag_3p5
    FROM u
    ORDER BY round
"""
QUERIES["seasonal_esd_anomalies"] = seasonal_esd_anomalies


COPULA_GRID = 10  # decile grid for the empirical copula


def copula_dependence_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schweizer-Wolff sigma between daily order COUNT and daily
    REVENUE via the empirical copula on a decile grid — the
    margin-free dependence measure that stays positive under NON-
    monotone dependence where Pearson/Spearman cancel to zero; sits
    beside spearman_daily (monotone) and transfer_entropy_daily
    (directed) as the third dependence lens.

    sigma ~ 12/G^2 * sum_ij |C(i/G, j/G) - (i/G)(j/G)| with
    C(i/G, j/G) = (1/n) * #{days: rank_u <= i*n/G, rank_v <= j*n/G}.
    Ranks are day-tiebroken row_numbers on the bounded daily frame;
    decile membership is exact integer arithmetic
    ((rank-1)*G div n + 1), the copula counts are a 10x10 bounded-grid
    suffix of a broadcast inequality join, and sigma is one float fold
    of exact integers (|n*G^2*C_cells - i*j*n| style cross products).

    Scale: one reduce to the daily frame; all windows/joins on the
    <= n-day / 100-cell frames.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
    )
    wu = Window.orderBy("cnt", "day")
    wv = Window.orderBy("rev", "day")
    ranked = daily.select(
        "day",
        F.row_number().over(wu).alias("ru"),
        F.row_number().over(wv).alias("rv"),
    )
    n_row = ranked.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            (
                (F.col("ru") - 1) * COPULA_GRID / F.col("n")
            ).cast("long").alias("du"),
            (
                (F.col("rv") - 1) * COPULA_GRID / F.col("n")
            ).cast("long").alias("dv"),
        )
        .groupBy("du", "dv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        spark.range(1, COPULA_GRID + 1)
        .select(F.col("id").cast("long").alias("i"))
        .crossJoin(
            spark.range(1, COPULA_GRID + 1).select(
                F.col("id").cast("long").alias("j")
            )
        )
    )
    cop = (
        grid.join(
            F.broadcast(cells),
            (F.col("du") < F.col("i")) & (F.col("dv") < F.col("j")),
            "left",
        )
        .groupBy("i", "j")
        .agg(F.sum("c").alias("cc"))
        .crossJoin(F.broadcast(n_row))
    )
    g2 = COPULA_GRID * COPULA_GRID
    # |C - uv| with C = cc/n, uv = ij/G^2: exact integer inner term
    # |G^2*cc - i*j*n| over the common denominator n*G^2
    term = F.abs(
        F.lit(g2) * F.coalesce(F.col("cc"), F.lit(0)) - F.col("i") * F.col("j") * F.col("n")
    )
    agg = cop.agg(
        F.sum(term).alias("ts"), F.max("n").alias("n")
    )
    sigma = 12.0 * F.col("ts").cast("double") / (
        F.lit(float(g2)) * F.col("n").cast("double") * F.lit(float(g2))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(COPULA_GRID).cast("int").alias("grid"),
        F.round(sigma, 6).alias("sw_sigma"),
    )


ORACLES["copula_dependence_daily"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day, count(*) AS cnt,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT day,
               row_number() OVER (ORDER BY cnt, day) AS ru,
               row_number() OVER (ORDER BY rev, day) AS rv,
               count(*) OVER () AS n
        FROM daily
    ),
    cells AS (
        -- // not /: DuckDB CAST(double AS BIGINT) ROUNDS where Spark's
        -- long cast truncates (the integer-division class, 8th catch)
        SELECT CAST((ru - 1) * {COPULA_GRID} // n AS BIGINT) AS du,
               CAST((rv - 1) * {COPULA_GRID} // n AS BIGINT) AS dv,
               CAST(count(*) AS BIGINT) AS c, max(n) AS n
        FROM ranked GROUP BY 1, 2
    ),
    grid AS (
        SELECT i, j FROM (SELECT unnest(range(1, {COPULA_GRID + 1})) AS i),
                         (SELECT unnest(range(1, {COPULA_GRID + 1})) AS j)
    ),
    cop AS (
        SELECT g.i, g.j, sum(c.c) AS cc, max(c.n) AS n
        FROM grid g LEFT JOIN cells c ON c.du < g.i AND c.dv < g.j
        GROUP BY 1, 2
    ),
    nn AS (SELECT max(n) AS n FROM cells),
    agg AS (
        SELECT sum(abs({COPULA_GRID * COPULA_GRID} * coalesce(cc, 0)
                       - i * j * nn.n)) AS ts,
               max(nn.n) AS n
        FROM cop, nn
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST({COPULA_GRID} AS INTEGER) AS grid,
           round(12.0 * CAST(ts AS DOUBLE)
                 / ({COPULA_GRID * COPULA_GRID}.0 * CAST(n AS DOUBLE)
                    * {COPULA_GRID * COPULA_GRID}.0), 6) AS sw_sigma
    FROM agg
"""
QUERIES["copula_dependence_daily"] = copula_dependence_daily


def distance_correlation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Szekely distance correlation between daily order count and daily
    revenue — dCor = 0 IFF independent (unlike Pearson), making it the
    definitive dependence screen beside copula_dependence_daily (grid
    approximation) and spearman_daily (monotone only).  Pearson r is
    reported alongside for the linear-vs-any-dependence contrast.

    V-statistic form on exact integers: a_ij = |c_i - c_j|,
    b_ij = |r_i - r_j| over the CALENDAR-BOUNDED day pair grid (a
    broadcast nested-loop pair frame of ~n_days^2 rows — bounded by the
    calendar squared, never by order volume);
    dCov^2 = S1 + abar*bbar - 2*S3 with S1 = mean(ab),
    S3 = (1/n^3) sum_i rowsum_a(i)*rowsum_b(i), and the same formula
    with b=a / a=b gives the dVars.  Every sum folds in decimal(38,0)
    (ab <= ~2e12 per pair); the S's and dCor are float expressions of
    those exact moments.

    Scale: one reduce to the daily frame; ONE bounded pair frame feeds
    both the global and the per-row aggregates.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("r"),
    )
    a = daily.select(
        F.col("day").alias("di"), F.col("c").alias("ci"), F.col("r").alias("ri")
    )
    b = daily.select(
        F.col("day").alias("dj"), F.col("c").alias("cj"), F.col("r").alias("rj")
    )
    pairs = a.join(F.broadcast(b)).select(
        "di",
        F.abs(F.col("ci") - F.col("cj")).cast(_DEC).alias("ad"),
        F.abs(F.col("ri") - F.col("rj")).cast(_DEC).alias("bd"),
    )
    glob = pairs.agg(
        F.sum(F.col("ad") * F.col("bd")).alias("sab"),
        F.sum("ad").alias("sa"),
        F.sum("bd").alias("sb"),
        F.sum(F.col("ad") * F.col("ad")).alias("saa"),
        F.sum(F.col("bd") * F.col("bd")).alias("sbb"),
    )
    rows = pairs.groupBy("di").agg(
        F.sum("ad").alias("ra"), F.sum("bd").alias("rb")
    )
    cross = rows.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("ra") * F.col("rb")).alias("rab"),
        F.sum(F.col("ra") * F.col("ra")).alias("raa"),
        F.sum(F.col("rb") * F.col("rb")).alias("rbb"),
    )
    j = glob.crossJoin(F.broadcast(cross))
    nd = F.col("n").cast("double")
    n2, n3 = nd * nd, nd * nd * nd

    def dcov2(s1, sa, sb, s3):
        return (
            s1.cast("double") / n2
            + (sa.cast("double") / n2) * (sb.cast("double") / n2)
            - 2.0 * s3.cast("double") / n3
        )

    dxy = dcov2(F.col("sab"), F.col("sa"), F.col("sb"), F.col("rab"))
    dxx = dcov2(F.col("saa"), F.col("sa"), F.col("sa"), F.col("raa"))
    dyy = dcov2(F.col("sbb"), F.col("sb"), F.col("sb"), F.col("rbb"))
    dcor = F.sqrt(dxy / F.sqrt(dxx * dyy))
    # Pearson for contrast, from one more exact-moment pass
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("pn"),
        F.sum(F.col("c").cast(_DEC)).alias("sc"),
        F.sum(F.col("r").cast(_DEC)).alias("sr"),
        # factors cast BEFORE the multiply: daily cent totals pass 3e9 at
        # 10x sf0.1 and the long square overflows int64 under ANSI mode
        F.sum(F.col("c").cast(_DEC) * F.col("r").cast(_DEC)).alias("scr"),
        F.sum(F.col("c").cast(_DEC) * F.col("c").cast(_DEC)).alias("scc"),
        F.sum(F.col("r").cast(_DEC) * F.col("r").cast(_DEC)).alias("srr"),
    )
    out = j.crossJoin(F.broadcast(mom))
    pr = (
        (F.col("pn") * F.col("scr") - F.col("sc") * F.col("sr")).cast("double")
        / F.sqrt(
            (F.col("pn") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
                "double"
            )
            * (F.col("pn") * F.col("srr") - F.col("sr") * F.col("sr")).cast(
                "double"
            )
        )
    )
    return out.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.sqrt(dxy), 6).alias("dcov"),
        F.round(dcor, 6).alias("dcor"),
        F.round(pr, 6).alias("pearson_r"),
    )


ORACLES["distance_correlation_daily"] = """
    WITH daily AS (
        SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS c,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT a.day AS di,
               CAST(abs(a.c - b.c) AS HUGEINT) AS ad,
               CAST(abs(a.r - b.r) AS HUGEINT) AS bd
        FROM daily a CROSS JOIN daily b
    ),
    g AS (
        SELECT sum(ad * bd) AS sab, sum(ad) AS sa, sum(bd) AS sb,
               sum(ad * ad) AS saa, sum(bd * bd) AS sbb
        FROM pairs
    ),
    rows_ AS (
        SELECT di, sum(ad) AS ra, sum(bd) AS rb FROM pairs GROUP BY 1
    ),
    cr AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(ra * rb) AS rab, sum(ra * ra) AS raa,
               sum(rb * rb) AS rbb
        FROM rows_
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS pn,
               CAST(sum(c) AS HUGEINT) AS sc, CAST(sum(r) AS HUGEINT) AS sr,
               CAST(sum(CAST(c AS HUGEINT) * r) AS HUGEINT) AS scr,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS scc,
               CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS srr
        FROM daily
    ),
    parts AS (
        SELECT CAST(n AS DOUBLE) AS nd, g.*, cr.*, mom.*
        FROM g, cr, mom
    ),
    fin AS (
        SELECT nd,
               CAST(sab AS DOUBLE) / (nd * nd)
               + (CAST(sa AS DOUBLE) / (nd * nd))
                 * (CAST(sb AS DOUBLE) / (nd * nd))
               - 2.0 * CAST(rab AS DOUBLE) / (nd * nd * nd) AS dxy,
               CAST(saa AS DOUBLE) / (nd * nd)
               + (CAST(sa AS DOUBLE) / (nd * nd))
                 * (CAST(sa AS DOUBLE) / (nd * nd))
               - 2.0 * CAST(raa AS DOUBLE) / (nd * nd * nd) AS dxx,
               CAST(sbb AS DOUBLE) / (nd * nd)
               + (CAST(sb AS DOUBLE) / (nd * nd))
                 * (CAST(sb AS DOUBLE) / (nd * nd))
               - 2.0 * CAST(rbb AS DOUBLE) / (nd * nd * nd) AS dyy,
               CAST(pn * scr - sc * sr AS DOUBLE)
               / sqrt(CAST(pn * scc - sc * sc AS DOUBLE)
                      * CAST(pn * srr - sr * sr AS DOUBLE)) AS pr
        FROM parts
    )
    SELECT CAST(nd AS BIGINT) AS n_days,
           round(sqrt(dxy), 6) AS dcov,
           round(sqrt(dxy / sqrt(dxx * dyy)), 6) AS dcor,
           round(pr, 6) AS pearson_r
    FROM fin
"""
QUERIES["distance_correlation_daily"] = distance_correlation_daily


def seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch-Slack) on daily ORDER revenue with
    weekday seasons: S and the tie-corrected variance accumulate PER
    WEEKDAY (pairs compare only like weekdays), so a strong weekly cycle
    can't masquerade as — or mask — a real monotone trend the way it
    does in the plain test; the trend-testing companion of
    seasonal_esd_anomalies (which deseasonalizes for OUTLIERS, this for
    TREND).

    Exactness: per-weekday pair frames are bounded by (calendar/7)^2;
    S_w and the tie terms are exact integers; total S, Var and the
    continuity-corrected z are single float expressions of their sums.
    Per-weekday S rows are emitted for the homogeneity read (a sign
    flip across weekdays means the 'trend' is really a cycle change).

    Scale: one reduce to the daily frame, 7 bounded equi-keyed pair
    joins in one plan (join ON weekday, never a global cross).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    ).withColumn("w", F.dayofweek("day"))
    a = daily.select(
        F.col("w"), F.col("day").alias("da"), F.col("rev").alias("ra")
    )
    b = daily.select(
        F.col("w"), F.col("day").alias("db"), F.col("rev").alias("rb")
    )
    per_w = (
        a.join(b, "w")
        .filter(F.col("da") < F.col("db"))
        .groupBy("w")
        .agg(
            F.sum(F.signum(F.col("rb") - F.col("ra")).cast("long")).alias(
                "s_w"
            )
        )
    )
    counts = daily.groupBy("w").agg(F.count(F.lit(1)).alias("m"))
    ties = (
        daily.groupBy("w", "rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("w")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
            ).alias("tcorr")
        )
    )
    per = per_w.join(counts, "w").join(ties, "w")
    md = F.col("m").cast("double")
    var_w = (md * (md - 1) * (2.0 * md + 5) - F.col("tcorr").cast("double")) / 18.0
    staged = per.select(
        "w", "s_w", "m", var_w.alias("var_w")
    )
    tot = staged.agg(
        F.sum("s_w").alias("s"),
        F.sum("var_w").alias("var_s"),
        F.sum("m").alias("n_days"),
        F.min(F.signum(F.col("s_w").cast("double"))).alias("min_sign"),
        F.max(F.signum(F.col("s_w").cast("double"))).alias("max_sign"),
    )
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return tot.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("s_total"),
        F.round(F.col("var_s"), 1).alias("var_s"),
        F.round(z, 4).alias("z_stat"),
        F.when(F.col("s") > 0, F.lit("increasing"))
        .when(F.col("s") < 0, F.lit("decreasing"))
        .otherwise(F.lit("no-trend"))
        .alias("trend"),
        ((F.col("min_sign") >= 0) | (F.col("max_sign") <= 0)).alias(
            "homogeneous_sign"
        ),
    )


ORACLES["seasonal_mann_kendall"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev,
               dayofweek(CAST(o_orderdate AS DATE)) + 1 AS w
        FROM orders GROUP BY 1, 3
    ),
    per_w AS (
        SELECT a.w, sum(CAST(sign(b.rev - a.rev) AS BIGINT)) AS s_w
        FROM daily a JOIN daily b ON a.w = b.w AND a.day < b.day
        GROUP BY 1
    ),
    counts AS (SELECT w, count(*) AS m FROM daily GROUP BY 1),
    ties AS (
        SELECT w, sum(t * (t - 1) * (2 * t + 5)) AS tcorr
        FROM (SELECT w, count(*) AS t FROM daily GROUP BY w, rev)
        GROUP BY 1
    ),
    staged AS (
        SELECT p.w, s_w, m,
               (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1)
                * (2.0 * CAST(m AS DOUBLE) + 5)
                - CAST(tcorr AS DOUBLE)) / 18.0 AS var_w
        FROM per_w p JOIN counts USING (w) JOIN ties USING (w)
    ),
    tot AS (
        SELECT sum(s_w) AS s, sum(var_w) AS var_s, sum(m) AS n_days,
               min(sign(s_w)) AS min_sign, max(sign(s_w)) AS max_sign
        FROM staged
    )
    SELECT CAST(n_days AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_total,
           round(var_s, 1) AS var_s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                      WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 4) AS z_stat,
           CASE WHEN s > 0 THEN 'increasing'
                WHEN s < 0 THEN 'decreasing'
                ELSE 'no-trend' END AS trend,
           (min_sign >= 0) OR (max_sign <= 0) AS homogeneous_sign
    FROM tot
"""
QUERIES["seasonal_mann_kendall"] = seasonal_mann_kendall
