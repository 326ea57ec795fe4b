"""Behavioral sequence/affinity operators over the events stream history.

Companions to operators/analytics.py's funnel + retention tier: the
event-transition (Markov) matrix and market-basket affinity — classic
"query the CDC history table" workloads the reference delegates to BigQuery
(README.md:57); here they are first-class.

Scale notes (100 TB events):
- Each operator shuffles the big table on exactly ONE key (user_id or
  l_orderkey); downstream aggregations are on tiny derived frames.
- Basket pairing bounds fan-out by basket size (distinct parts per order,
  max 13 in this corpus): O(k^2) per order after a distinct-prune, never a
  global part x part cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per-user consecutive event bigrams,
    counted and row-normalized into transition probabilities.

    Plan: one window (lag over user_id ordered by ts, event_id tiebreak for
    determinism) -> (src, dst) count -> probability via a window sum over
    src. The only wide shuffle is the lag's partitionBy(user_id); the
    5x5 transition table is driver-trivial from there.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        e.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.sum("n").over(wsrc), 6).alias("prob"),
    )


MARKET_BASKET_TOPN = 100


def market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part affinity: top co-ordered part pairs with support
    and lift, over lineitem baskets (l_orderkey = basket).

    Plan: distinct (order, part) prune first, then a self equi-join on
    l_orderkey with part_a < part_b — fan-out bounded by basket size k
    (O(k^2) per order, k<=13 here), NOT a global part x part cross join.
    Lift denominators come from a per-part order count joined in (part side
    is dimension-sized relative to lineitem -> broadcastable at any SF).
    Deterministic top-N: order by pair count desc, then keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # four consumers (total, per-part counts, both self-join sides) —
    # un-cut, each re-ran the fact scan + distinct (r11: 26-Exchange
    # plan); narrow 2-column frame
    op = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=True
    )
    # scalar total as a broadcast 1-row frame: keeps the whole query one DAG
    # (no driver-side count() action blocking plan reuse)
    tot = op.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    part_cnt = op.groupBy("l_partkey").agg(F.count("*").alias("n_ord"))
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_n"))
    )
    out = (
        pairs.join(
            F.broadcast(part_cnt.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_cnt.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "pair_n",
            F.round(F.col("pair_n") / F.col("n_orders"), 6).alias("support"),
            F.round(
                (F.col("pair_n") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_n").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(MARKET_BASKET_TOPN)
    )
    return out


PATH_GAP_MIN = 30   # session idle gap (matches event_windows.session_agg)
PATH_TOP_N = 20     # most common session paths reported


def session_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths: sessionize each user's stream (30-minute idle
    gap), render every session as its ordered event-type sequence
    ("view>click>purchase"), and report the PATH_TOP_N most common paths
    with session counts and mean session value — the UX-flow view of the
    event log that complements markov_transitions' one-step matrix with
    whole-trajectory frequencies.

    Scale: sessionization is the standard gaps-and-islands pair of
    user-partitioned windows; the path string builds from
    collect_list(struct(ts, event_id, type)) + array_sort + transform —
    deterministic order WITHOUT a per-session sort window. Path cardinality
    is bounded by observed trajectories (paths are data, not users), and
    the final top-N is a count-ranked limit at path cardinality.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_s = PATH_GAP_MIN * 60
    sess = e.withColumn(
        "new_sess",
        F.when(
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path"),
            F.sum("value").alias("sess_value"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.round(F.avg("sess_value"), 4).alias("avg_session_value"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(PATH_TOP_N)
    )


_PATH_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN epoch(ts) - lag(epoch(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC)
                        > {PATH_GAP_MIN * 60} THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sess_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, sess_id,
               string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC)
                   AS path,
               sum(value) AS sess_value
        FROM sess GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(sess_value), 4) AS avg_session_value
    FROM paths GROUP BY 1
    ORDER BY n_sessions DESC, path ASC
    LIMIT {PATH_TOP_N}
"""


_TOUCH_TYPES = ("click", "view", "signup")  # attributable marketing touches


def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch purchase attribution: for every purchase,
    the earliest and the most recent preceding touch event (click / view /
    signup) in the user's history decide which channel gets credit; credit
    and revenue are then rolled up per channel. Purchases with no prior
    touch land in the '(none)' bucket — the direct-traffic line every
    attribution report carries.

    Plan: ONE user-partitioned sort window computes both touches via
    first/last(ignorenulls) over an unbounded-preceding-to-previous-row
    frame (no self-join against the touch history); the two per-channel
    rollups are channel-cardinality-sized and merge with a tiny full-outer
    join. At 100 TB the only wide shuffle is the window's
    partitionBy(user_id) — same key the funnel/markov tier shuffles on.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type"))
    purchases = (
        e.withColumn("first_touch", F.first(touch, ignorenulls=True).over(w))
        .withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
            "value",
        )
    )
    ft = purchases.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("first_touch_purchases"),
        F.round(F.sum("value"), 2).alias("first_touch_revenue"),
    )
    lt = purchases.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("last_touch_purchases"),
        F.round(F.sum("value"), 2).alias("last_touch_revenue"),
    )
    zl = F.lit(0).cast("bigint")
    return ft.join(lt, "channel", "full").select(
        "channel",
        F.coalesce("first_touch_purchases", zl).alias("first_touch_purchases"),
        F.coalesce("first_touch_revenue", F.lit(0.0)).alias("first_touch_revenue"),
        F.coalesce("last_touch_purchases", zl).alias("last_touch_purchases"),
        F.coalesce("last_touch_revenue", F.lit(0.0)).alias("last_touch_revenue"),
    )


_ATTRIBUTION_ORACLE = """
    WITH touched AS (
        SELECT event_type, value,
               first_value(CASE WHEN event_type IN ('click','view','signup')
                                THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS first_touch,
               last_value(CASE WHEN event_type IN ('click','view','signup')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_touch
        FROM events
    ),
    p AS (
        SELECT coalesce(first_touch, '(none)') AS first_touch,
               coalesce(last_touch, '(none)') AS last_touch, value
        FROM touched WHERE event_type = 'purchase'
    ),
    ft AS (
        SELECT first_touch AS channel,
               CAST(count(*) AS BIGINT) AS first_touch_purchases,
               round(sum(value), 2) AS first_touch_revenue
        FROM p GROUP BY 1
    ),
    lt AS (
        SELECT last_touch AS channel,
               CAST(count(*) AS BIGINT) AS last_touch_purchases,
               round(sum(value), 2) AS last_touch_revenue
        FROM p GROUP BY 1
    )
    SELECT coalesce(ft.channel, lt.channel) AS channel,
           coalesce(first_touch_purchases, 0) AS first_touch_purchases,
           coalesce(first_touch_revenue, 0.0) AS first_touch_revenue,
           coalesce(last_touch_purchases, 0) AS last_touch_purchases,
           coalesce(last_touch_revenue, 0.0) AS last_touch_revenue
    FROM ft FULL OUTER JOIN lt ON ft.channel = lt.channel
"""


def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup -> first-purchase time:
    S(t) = prod over event days t_i <= t of (1 - d_i / n_i), with users
    who never purchase right-censored at the end of the observation
    window — the standard time-to-event estimator (churn, activation,
    time-to-convert) that a naive "average days to purchase" gets wrong
    by dropping the censored mass.

    Determinism: the cumulative product is exp of an ORDERED cumulative
    sum of logs — window running sums evaluate in frame order on both
    engines, so the fold order is pinned; ln/exp on identical doubles
    agree (last-ulp differences are absorbed by the 4dp rounding).

    Scale: the raw log reduces to one row per user (two min-aggregates),
    then to one row per distinct duration day; the risk-set cumsum runs
    on that day-cardinality frame (bounded by the observation window,
    ~30 rows) — the same tiny-frame global window the bucket-offset
    pattern uses everywhere else.
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
            F.col("p_ts").isNotNull().cast("int").alias("observed"),
        )
    )
    # localCheckpoint (r11): exits feeds the total aggregate AND the curve,
    # and each reference re-ran the events->per_user fact chain (the join
    # inputs differ, so runtime exchange reuse cannot dedupe); the frame is
    # day-cardinality (observation window, ~30 rows), so the cut is free.
    exits = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.sum("observed").cast("double").alias("d"),
    ).localCheckpoint(eager=True)
    total = exits.agg(F.sum("x").alias("n_total"))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    # day-cardinality frame: the global windows see <= observation-window
    # rows, never the user or event frame
    curve = (
        exits.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk", F.col("n_total") - F.coalesce(F.sum("x").over(w_prev), F.lit(0.0))
        )
        .filter(F.col("d") > 0)
        # when the final risk set fully converts (d == n), survival hits
        # exactly 0; ln(0) is a domain error, so carry a cumulative
        # zero flag and emit 0.0 there (only ever the last event row)
        .withColumn("hit_zero", F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(w_cum))
        .withColumn(
            "surv",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("d") < F.col("n_risk"),
                            F.log(1.0 - F.col("d") / F.col("n_risk")),
                        ).otherwise(F.lit(0.0))
                    ).over(w_cum)
                )
            ),
        )
    )
    return curve.select(
        F.col("dur").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("d_events"),
        F.round("surv", 4).alias("survival"),
    )


AB_VALUE_THRESHOLD = 48.0  # ~median per-user mean purchase value


def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout: users split into arms by user_id
    parity (the deterministic stand-in for an assignment table),
    conversion = the user's mean purchase value exceeds
    AB_VALUE_THRESHOLD (a non-saturated outcome on this corpus — every
    user "ever purchases", so the raw flag would be degenerate);
    reports per-arm rates, absolute and relative lift, and the pooled
    two-proportion z statistic. Degenerate slices (all/none converting)
    yield NULL lift/z via try_divide instead of a runtime error.

    Determinism: rates are exact integer ratios; sqrt is IEEE-exact, so
    the z-score is bit-identical across engines — no tolerance needed.

    Scale: two map-side-combined aggregates over the log (per-user then
    per-arm); the final arithmetic is on a 2-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (F.avg("value") > AB_VALUE_THRESHOLD).cast("int").alias("conv")
        )
    )
    arms = per_user.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("conv").cast("double").alias("c"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("c_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("c_b")
    )
    j = a.crossJoin(F.broadcast(b))
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return j.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("abs_lift"),
        F.round(F.try_divide(p_b, p_a) - 1.0, 6).alias("rel_lift"),
        F.round(F.try_divide(p_b - p_a, se), 4).alias("z_score"),
    )


ORACLES = {
    "session_path_analysis": _PATH_ORACLE,
    "attribution_credit": _ATTRIBUTION_ORACLE,
    "markov_transitions": """
        WITH seq AS (
            SELECT user_id, event_type AS dst,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts ASC, event_id ASC) AS src
            FROM events
        ),
        pairs AS (
            SELECT src, dst, count(*) AS n
            FROM seq WHERE src IS NOT NULL
            GROUP BY src, dst
        )
        SELECT src, dst, n,
               round(n / sum(n) OVER (PARTITION BY src), 6) AS prob
        FROM pairs
    """,
    "market_basket": f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
        part_cnt AS (
            SELECT l_partkey, count(*) AS n_ord FROM op GROUP BY l_partkey
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS pair_n
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT part_a, part_b, pair_n,
               round(pair_n / CAST(tot.n_orders AS DOUBLE), 6) AS support,
               round((pair_n * CAST(tot.n_orders AS DOUBLE))
                     / (ca.n_ord * cb.n_ord), 6) AS lift
        FROM pairs
        CROSS JOIN tot
        JOIN part_cnt ca ON pairs.part_a = ca.l_partkey
        JOIN part_cnt cb ON pairs.part_b = cb.l_partkey
        ORDER BY pair_n DESC, part_a ASC, part_b ASC
        LIMIT {MARKET_BASKET_TOPN}
    """,
}

QUERIES = {
    "markov_transitions": markov_transitions,
    "market_basket": market_basket,
    "attribution_credit": attribution_credit,
    "session_path_analysis": session_path_analysis,
}

ORACLES["kaplan_meier"] = """
    WITH h AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    s AS (SELECT user_id, min(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
          GROUP BY 1),
    per_user AS (
        SELECT CAST(CASE WHEN p.p_ts IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(p.p_ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE),
                                   (SELECT h FROM h)) END AS BIGINT) AS dur,
               CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    ),
    exits AS (
        SELECT dur, CAST(count(*) AS DOUBLE) AS x,
               CAST(sum(observed) AS DOUBLE) AS d
        FROM per_user GROUP BY 1
    ),
    tot AS (SELECT sum(x) AS n_total FROM exits),
    risk AS (
        SELECT dur, x, d,
               t.n_total - coalesce(sum(x) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0.0) AS n_risk
        FROM exits CROSS JOIN tot t
    ),
    curve AS (
        SELECT dur, n_risk, d,
               CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                        OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) = 1
                    THEN 0.0
                    ELSE exp(sum(CASE WHEN d < n_risk
                                      THEN ln(1.0 - d / n_risk)
                                      ELSE 0.0 END)
                             OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW)) END AS surv
        FROM risk WHERE d > 0
    )
    SELECT dur AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           round(surv, 4) AS survival
    FROM curve
"""
QUERIES["kaplan_meier"] = kaplan_meier

ORACLES["ab_test_lift"] = """
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN avg(value) > 48.0 THEN 1 ELSE 0 END AS conv
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    arms AS (
        SELECT CAST(user_id % 2 AS INTEGER) AS arm,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(conv) AS DOUBLE) AS c
        FROM per_user GROUP BY 1
    ),
    j AS (
        SELECT a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b
        FROM (SELECT n, c FROM arms WHERE arm = 0) a
        CROSS JOIN (SELECT n, c FROM arms WHERE arm = 1) b
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(c_a AS BIGINT) AS conv_a,
           CAST(c_b AS BIGINT) AS conv_b,
           round(c_a / n_a, 6) AS rate_a,
           round(c_b / n_b, 6) AS rate_b,
           round(c_b / n_b - c_a / n_a, 6) AS abs_lift,
           round(CASE WHEN c_a > 0
                      THEN (c_b / n_b) / (c_a / n_a) - 1.0 END, 6)
               AS rel_lift,
           round(CASE WHEN (c_a + c_b) > 0 AND (c_a + c_b) < (n_a + n_b)
                      THEN (c_b / n_b - c_a / n_a)
                           / sqrt((c_a + c_b) / (n_a + n_b)
                                  * (1.0 - (c_a + c_b) / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)) END, 4)
               AS z_score
    FROM j
"""
QUERIES["ab_test_lift"] = ab_test_lift

def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by signup week, and
    for each (cohort, weeks-since-signup) the CUMULATIVE purchase revenue
    per cohort member — the retention_cohorts companion that tracks money
    instead of presence (the payback-period readout).

    Scale: one pass to per-user signup weeks, one purchase-side join on
    user_id (broadcastable dictionary at dimension scale, hash join
    otherwise), one shuffle to (cohort x week) cells with exact decimal
    sums; the cumulative window runs per cohort on the tiny cell frame.
    """
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
        .select(
            "user_id",
            F.date_trunc("week", F.col("s_ts")).cast("date").alias("cohort"),
            "s_ts",
        )
    )
    sizes = signups.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    cells = (
        e.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy(
            "cohort",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("s_ts").cast("date"))
                / 7
            ).cast("bigint").alias("week_n"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        )
    )
    w = Window.partitionBy("cohort").orderBy("week_n").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cells.withColumn("cum_rev", F.sum("rev").over(w))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_n",
            "cohort_users",
            "n_purchases",
            F.round(F.col("rev"), 2).cast("double").alias("week_revenue"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("cohort_users"), 4
            ).alias("ltv_per_user"),
        )
    )


ORACLES["cohort_ltv"] = """
    WITH signups AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort,
               min(ts) AS s_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
              FROM signups GROUP BY 1),
    cells AS (
        SELECT s.cohort,
               CAST(date_diff('day', CAST(s.s_ts AS DATE),
                              CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week_n,
               sum(CAST(e.value AS DECIMAL(18,4))) AS rev,
               CAST(count(*) AS BIGINT) AS n_purchases
        FROM events e JOIN signups s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
        GROUP BY 1, 2
    )
    SELECT c.cohort, c.week_n, z.cohort_users, c.n_purchases,
           CAST(round(c.rev, 2) AS DOUBLE) AS week_revenue,
           round(CAST(sum(c.rev) OVER (PARTITION BY c.cohort
                      ORDER BY c.week_n ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS DOUBLE) / z.cohort_users, 4)
               AS ltv_per_user
    FROM cells c JOIN sizes z USING (cohort)
"""
QUERIES["cohort_ltv"] = cohort_ltv


# --- run-length encoding of event sequences ----------------------------------


def event_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length profile of each user's event stream: consecutive
    same-type events collapse into runs (the categorical gaps-and-islands
    twin of interval_coalesce_islands) — the sequence-compression view
    behind "user fired 7 clicks in a row" anomaly rules and session
    pattern mining.

    Construction: run starts where the type differs from the previous
    event (lag); run id = prefix sum of start flags; two aggregations
    reduce runs to a per-(user, type) profile.  One user-keyed shuffle,
    all-integer arithmetic.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = e.withColumn(
        "start",
        F.when(
            F.lag("event_type").over(order).isNull()
            | (F.lag("event_type").over(order) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn("run_id", F.sum("start").over(run))
    runs = flagged.groupBy("user_id", "run_id", "event_type").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("max_run_len"),
        F.sum("run_len").cast("bigint").alias("n_events"),
    )


ORACLES["event_run_lengths"] = """
    WITH flagged AS (
        SELECT user_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS start,
               ts, event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_type,
               sum(start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run_id
        FROM flagged
    ),
    runs AS (
        SELECT user_id, run_id, event_type, count(*) AS run_len
        FROM numbered GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS max_run_len,
           CAST(sum(run_len) AS BIGINT) AS n_events
    FROM runs GROUP BY 1, 2
"""
QUERIES["event_run_lengths"] = event_run_lengths


# --------------------------------------------------------------------------
# round-5 restarted-session: item-item collaborative filtering
# --------------------------------------------------------------------------

ITEM_CF_TOPK = 5
ITEM_CF_MIN_CO = 2  # prune singleton co-occurrences before ranking
# Quadratic guard (VERDICT r7 #3): a pathological giant basket — a spam
# cart, a load-test order — costs O(k^2) pairs with no cap.  Baskets
# above this bound are dropped entirely (standard CF hygiene: such
# baskets carry no preference signal).  Measured distribution on the
# bench corpora: max 17 distinct parts/order, mean 4.07, p99 9 — the
# cap is a pure worst-case fence and provably never fires there, so the
# oracle (which mirrors the same filter) stays hash-identical.
ITEM_CF_MAX_BASKET = 50


def item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering neighbors: for every part, the
    ITEM_CF_TOPK most cosine-similar parts by order co-occurrence
    (cos = n_ij / sqrt(n_i * n_j)) — the normalized "customers who bought
    X also bought Y" ranking that market_basket's raw lift table feeds.

    Determinism: ranking compares round(cos, 6) with neighbor-id
    tie-break; cosine inputs are exact integer counts so the rounded
    doubles are bit-identical across engines.

    Scale: the pair space is the market_basket shape — distinct
    (order, part) first, then an order-keyed self-join bounded by basket
    size k (O(k^2) per order, never part x part), with k itself capped
    at ITEM_CF_MAX_BASKET so a single pathological basket cannot go
    quadratic; per-part order counts broadcast; the rank window
    partitions by the anchor part.  The deduped+capped basket frame is
    localCheckpointed once — it feeds BOTH self-join sides and the
    count frame twice (two broadcast builds), and lazy recompute ran
    the lineitem distinct up to 4x (the ranking_eval_bm25 shape).
    Remaining 10x growth is co-pair densification — 10x orders over a
    FIXED part dim fills in the co-occurrence matrix — i.e. data-bound
    output growth, not plan overhead.
    """
    wb = Window.partitionBy("l_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn("bsz", F.count(F.lit(1)).over(wb))
        .filter(F.col("bsz") <= ITEM_CF_MAX_BASKET)
        .drop("bsz")
        .localCheckpoint(eager=True)
    )
    cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= ITEM_CF_MIN_CO)
    )
    jn = (
        co.join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("pa"),
                                   F.col("n").alias("na"))),
            "pa",
        )
        .join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("pb"),
                                   F.col("n").alias("nb"))),
            "pb",
        )
        .withColumn(
            "cos",
            F.round(
                F.col("n_co").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("pa").orderBy(F.col("cos").desc(), F.col("pb").asc())
    return (
        jn.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ITEM_CF_TOPK)
        .select(
            F.col("pa").cast("bigint").alias("part_id"),
            F.col("pb").cast("bigint").alias("neighbor_id"),
            F.col("n_co").cast("bigint").alias("n_co_orders"),
            F.col("cos").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


ORACLES["item_cf_topk"] = f"""
    WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    li AS MATERIALIZED (
        SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey,
                   count(*) OVER (PARTITION BY l_orderkey) AS bsz
            FROM li0)
        WHERE bsz <= {ITEM_CF_MAX_BASKET}
    ),
    cnt AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
    co AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_co
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey != b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {ITEM_CF_MIN_CO}
    ),
    jn AS (
        SELECT co.pa, co.pb, co.n_co,
               round(CAST(co.n_co AS DOUBLE)
                     / sqrt(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE)),
                     6) AS cos
        FROM co JOIN cnt ca ON co.pa = ca.l_partkey
        JOIN cnt cb ON co.pb = cb.l_partkey
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY pa
                                     ORDER BY cos DESC, pb ASC) AS rank
        FROM jn
    )
    SELECT CAST(pa AS BIGINT) AS part_id, CAST(pb AS BIGINT) AS neighbor_id,
           CAST(n_co AS BIGINT) AS n_co_orders, cos AS cosine,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {ITEM_CF_TOPK}
"""
QUERIES["item_cf_topk"] = item_cf_topk


# --------------------------------------------------------------------------
# round-5 restarted-session: absorbing-chain conversion probability
# --------------------------------------------------------------------------

ABSORB_STATE = "purchase"
ABSORB_ROUNDS = 12
ABSORB_SCALE = 1_000_000_000  # probabilities as integer nano-units


def absorption_conversion_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability of reaching the absorbing ``purchase`` state within
    ABSORB_ROUNDS steps from each event-type state, by value iteration
    over the user-journey transition matrix (markov_transitions' counts)
    — the absorbing-Markov-chain read of "which states convert".

    Exactness (the bellman_ford integer-iteration pattern): transition
    probabilities quantize once to integer nano-units with exact half-up
    rounding q = (2*c*S + n) div (2*n); each round folds
    P' = (q_pur*S + sum q_t*P_t + S/2) div S in pure integer arithmetic —
    products are bounded by S^2 = 1e18 INDEPENDENT of corpus size, so
    longs never overflow and both engines round identically at every
    step.

    Scale: one user-keyed lag window builds the bigram counts; the
    iteration runs on the state-cardinality frame (event types — tiny at
    any corpus size) with broadcast joins.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # the lineage cut belongs HERE, on the state-bounded bigram counts:
    # totals is consumed both by q and by the FINAL report join, so with
    # only q checkpointed (the pre-r11 shape) the final join re-ran the
    # whole user-keyed lag window over events a second time
    bigrams = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .filter(F.col("event_type") != ABSORB_STATE)
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = bigrams.groupBy("src").agg(F.sum("c").alias("n"))
    q = (
        bigrams.join(F.broadcast(totals), "src")
        .withColumn(
            "q",
            F.floor(
                (F.lit(2) * F.col("c") * ABSORB_SCALE + F.col("n"))
                / (F.lit(2) * F.col("n"))
            ).cast("long"),
        )
        .select("src", "dst", "q")
        # ...and q stays materialized too (cheap — one tiny job over the
        # materialized bigrams): the ABSORB_ROUNDS round actions each
        # reference q_trans/q_pur, and with q lazy every round re-built
        # the totals join (measured r11: 2.88 -> 3.61 s with only the
        # bigrams cut; both cuts restore the floor and drop the final
        # join's second window pass)
        .localCheckpoint(eager=True)
    )
    states = q.select(F.col("src").alias("state")).distinct()
    p = states.select("state", F.lit(0).cast("long").alias("p")).localCheckpoint(
        eager=True
    )
    q_pur = q.filter(F.col("dst") == ABSORB_STATE).select(
        F.col("src").alias("state"), F.col("q").alias("qp")
    )
    q_trans = q.filter(F.col("dst") != ABSORB_STATE)
    for _ in range(ABSORB_ROUNDS):
        contrib = (
            q_trans.join(
                p.select(F.col("state").alias("dst"), F.col("p").alias("pd")),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum(F.col("q") * F.col("pd")).alias("s"))
        )
        p = (
            states.join(F.broadcast(q_pur), "state", "left")
            .join(
                F.broadcast(contrib.select(F.col("src").alias("state"), "s")),
                "state",
                "left",
            )
            .select(
                "state",
                F.floor(
                    (
                        F.coalesce("qp", F.lit(0)).cast("long") * ABSORB_SCALE
                        + F.coalesce("s", F.lit(0))
                        + F.lit(ABSORB_SCALE // 2)
                    )
                    / F.lit(ABSORB_SCALE)
                ).cast("long").alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        p.join(F.broadcast(totals.select(F.col("src").alias("state"), "n")),
               "state")
        .select(
            "state",
            F.col("n").cast("bigint").alias("n_transitions"),
            (F.col("p").cast("double") / ABSORB_SCALE).alias("p_convert"),
        )
    )


def _absorb_oracle() -> str:
    s = ABSORB_SCALE
    ctes = [
        f"""bigrams AS MATERIALIZED (
            SELECT src, dst, count(*) AS c FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) AS dst
                FROM events
            )
            WHERE dst IS NOT NULL AND src != '{ABSORB_STATE}'
            GROUP BY 1, 2
        )""",
        "totals AS (SELECT src, sum(c) AS n FROM bigrams GROUP BY 1)",
        f"""q AS (
            SELECT b.src, b.dst,
                   (2 * b.c * {s} + t.n) // (2 * t.n) AS q
            FROM bigrams b JOIN totals t ON b.src = t.src
        )""",
        "states AS (SELECT DISTINCT src AS state FROM q)",
        f"""qpur AS (
            SELECT src AS state, q AS qp FROM q WHERE dst = '{ABSORB_STATE}'
        )""",
        f"""qtrans AS (
            SELECT src, dst, q FROM q WHERE dst != '{ABSORB_STATE}'
        )""",
        "p0 AS (SELECT state, CAST(0 AS BIGINT) AS p FROM states)",
    ]
    for i in range(1, ABSORB_ROUNDS + 1):
        prev = f"p{i - 1}"
        ctes.append(f"""c{i} AS (
            SELECT qt.src, sum(qt.q * pp.p) AS sacc
            FROM qtrans qt JOIN {prev} pp ON qt.dst = pp.state
            GROUP BY 1
        )""")
        ctes.append(f"""p{i} AS (
            SELECT st.state,
                   (COALESCE(qp.qp, 0) * {s} + COALESCE(c.sacc, 0)
                    + {s // 2}) // {s} AS p
            FROM states st
            LEFT JOIN qpur qp ON st.state = qp.state
            LEFT JOIN c{i} c ON st.state = c.src
        )""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT p.state, CAST(t.n AS BIGINT) AS n_transitions,
           CAST(p.p AS DOUBLE) / {s} AS p_convert
    FROM p{ABSORB_ROUNDS} p JOIN totals t ON p.state = t.src
    """


ORACLES["absorption_conversion_prob"] = _absorb_oracle()
QUERIES["absorption_conversion_prob"] = absorption_conversion_prob


# --------------------------------------------------------------------------
# sequential_patterns — top event-type trigrams (length-3 sequence mining)
# --------------------------------------------------------------------------

SEQ_PATTERN_TOPN = 10


def sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N length-3 consecutive event-type patterns across all user
    sequences, with support share — the PrefixSpan-style contiguous
    sequence-mining report (markov_transitions' bigram space extended one
    step).

    Plan: ONE lead window per user (ts, event_id-tiebroken) emits both
    lookaheads; the trigram space is vocabulary-bounded (|types|^3 <= 125
    cells at any corpus size) so the count groupBy is map-side combined
    and the share window + top-k run on that tiny frame.  Top-k is
    orderBy+limit (TakeOrderedAndProject), never a global sort.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    tri = (
        e.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .groupBy(F.col("event_type").alias("t1"), "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    ranked = tri.withColumn("total", F.sum("n").over(wall)).select(
        "t1",
        "t2",
        "t3",
        "n",
        F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
            "support"
        ),
    )
    return ranked.orderBy(
        F.col("n").desc(), F.col("t1"), F.col("t2"), F.col("t3")
    ).limit(SEQ_PATTERN_TOPN)


QUERIES["sequential_patterns"] = sequential_patterns
ORACLES["sequential_patterns"] = f"""
    WITH seq AS (
        SELECT event_type AS t1,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t3
        FROM events
    ),
    tri AS (
        SELECT t1, t2, t3, count(*) AS n FROM seq
        WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT t1, t2, t3, n,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER () AS DOUBLE), 6) AS support
        FROM tri
    )
    SELECT * FROM ranked ORDER BY n DESC, t1, t2, t3 LIMIT {SEQ_PATTERN_TOPN}
"""


# --------------------------------------------------------------------------
# transition_entropy_rate — predictability of the event process
# --------------------------------------------------------------------------


def transition_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy H(next | current) per current state,
    plus the stationary-weighted entropy rate of the whole chain (the
    '__ALL__' row) — the information-theoretic summary of how predictable
    the event stream is (markov_next_event_accuracy's argmax companion).

    Exactness: transition counts are exact integers; each per-state
    entropy folds <= |types| terms with an ORDER-PINNED cumulative sum
    (window ordered by dst), and the rate folds the <= |types| per-state
    contributions the same way — both engines add identical doubles in
    an identical sequence.

    Plan: the markov lag window (partitionBy user_id) is the only wide
    shuffle; everything else runs on the vocabulary-bounded transition
    frame.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        e.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    wcum = wsrc.orderBy("dst").rowsBetween(Window.unboundedPreceding, 0)
    p = F.col("n").cast("double") / F.col("n_src").cast("double")
    terms = pairs.withColumn("n_src", F.sum("n").over(wsrc)).withColumn(
        "cum", F.sum(-p * F.log2(p)).over(wcum)
    )
    per_src = terms.groupBy("src", "n_src").agg(F.max("cum").alias("h_bits"))
    wall = Window.partitionBy()
    wrate = wall.orderBy("src").rowsBetween(Window.unboundedPreceding, 0)
    contrib = per_src.withColumn("n_all", F.sum("n_src").over(wall)).withColumn(
        "rate_cum",
        F.sum(
            F.col("n_src").cast("double") / F.col("n_all").cast("double")
            * F.col("h_bits")
        ).over(wrate),
    )
    per_rows = contrib.select(
        F.col("src").alias("state"),
        F.col("n_src").alias("n_transitions"),
        F.round("h_bits", 6).alias("h_bits"),
    )
    rate_row = contrib.groupBy().agg(
        F.lit("__ALL__").alias("state"),
        F.max("n_all").alias("n_transitions"),
        F.round(F.max("rate_cum"), 6).alias("h_bits"),
    )
    return per_rows.unionByName(rate_row).orderBy("state")


QUERIES["transition_entropy_rate"] = transition_entropy_rate
ORACLES["transition_entropy_rate"] = """
    WITH seq AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS src,
               event_type AS dst
        FROM events
    ),
    pairs AS (
        SELECT src, dst, count(*) AS n FROM seq
        WHERE src IS NOT NULL GROUP BY 1, 2
    ),
    terms AS (
        SELECT src, dst, n,
               sum(n) OVER (PARTITION BY src) AS n_src
        FROM pairs
    ),
    cums AS (
        SELECT src, n_src,
               sum(-(CAST(n AS DOUBLE) / CAST(n_src AS DOUBLE))
                   * log2(CAST(n AS DOUBLE) / CAST(n_src AS DOUBLE)))
                   OVER (PARTITION BY src ORDER BY dst
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM terms
    ),
    per_src AS (
        SELECT src, n_src, max(cum) AS h_bits FROM cums GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n_src) AS n_all FROM per_src),
    contrib AS (
        SELECT src, n_src, h_bits,
               (SELECT n_all FROM tot) AS n_all,
               sum((CAST(n_src AS DOUBLE)
                    / CAST((SELECT n_all FROM tot) AS DOUBLE)) * h_bits)
                   OVER (ORDER BY src
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS rate_cum
        FROM per_src
    )
    SELECT src AS state, CAST(n_src AS BIGINT) AS n_transitions,
           round(h_bits, 6) AS h_bits
    FROM contrib
    UNION ALL
    SELECT '__ALL__' AS state, CAST(max(n_all) AS BIGINT) AS n_transitions,
           round(max(rate_cum), 6) AS h_bits
    FROM contrib
    ORDER BY state
"""


# --------------------------------------------------------------------------
# bandit_replay_greedy — offline policy replay with cumulative regret
# --------------------------------------------------------------------------


def bandit_replay_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline replay of a greedy multi-armed-bandit policy over the daily
    event stream: arms = event types, daily reward = the arm's mean event
    value that day; each day the policy plays the arm with the best
    cumulative PRIOR mean (unexplored arms first — optimistic cold start,
    NULLS-FIRST ordering; ties by arm name), and the report tracks the
    per-day gap to the best-fixed-arm-in-hindsight and its running sum —
    the standard counterfactual evaluation a recommendation platform runs
    before shipping a policy.

    Exactness: prior means are single divisions of exact prefix-integer
    sums; ordering compares identically-computed doubles; the regret fold
    is ORDER-PINNED over days.

    Scale: one groupBy to the (day, arm) grid; every window runs on that
    bounded frame (days x |types|).
    """
    e = load_table(spark, sf_dir, "events")
    grid = e.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type").alias("arm")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)"))
        .alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    warm = Window.partitionBy("arm").orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = grid.withColumn("cs", F.sum("s").over(warm)).withColumn(
        "cn", F.sum("n").over(warm)
    )
    pm = F.when(
        F.col("cn").isNotNull() & (F.col("cn") > 0),
        F.col("cs").cast("double") / F.col("cn").cast("double"),
    )
    t = t.withColumn("pm", pm)
    wday = Window.partitionBy("day").orderBy(
        F.col("pm").desc_nulls_first(), F.col("arm")
    )
    chosen = t.withColumn("rn", F.row_number().over(wday)).filter(F.col("rn") == 1)
    # best fixed arm in hindsight: highest overall mean, arm-name tie-break
    totals = grid.groupBy("arm").agg(
        F.sum("s").alias("ts"), F.sum("n").alias("tn")
    )
    wbest = Window.partitionBy().orderBy(
        (F.col("ts").cast("double") / F.col("tn").cast("double")).desc(),
        F.col("arm"),
    )
    best_arm = (
        totals.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(F.col("arm").alias("best_arm"))
    )
    # means rendered as integer ten-thousandths of a dollar via explicit
    # floor(x + 0.5): the daily mean grid DOES land on exact half-points
    # (38.37875 observed at sf0.001 — the ohlc_bars HALF_UP/HALF_EVEN
    # divergence class), so round() is banned here; the regret fold then
    # sums exact integers
    def r4(s_col, n_col):
        return F.floor(
            s_col.cast("double") * F.lit(100.0) / n_col.cast("double") + F.lit(0.5)
        ).cast("long")

    best_daily = grid.join(F.broadcast(best_arm), grid.arm == F.col("best_arm")).select(
        F.col("day").alias("bday"),
        "best_arm",
        r4(F.col("s"), F.col("n")).alias("best_r4"),
    )
    j = chosen.join(best_daily, chosen.day == F.col("bday")).withColumn(
        "chosen_r4", r4(F.col("s"), F.col("n"))
    )
    wcum = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    j = j.withColumn(
        "regret_r4", F.sum(F.col("best_r4") - F.col("chosen_r4")).over(wcum)
    )
    return j.select(
        "day",
        F.col("arm").alias("chosen_arm"),
        "best_arm",
        (F.col("chosen_r4").cast("double") / F.lit(10000.0)).alias(
            "chosen_mean_dollars"
        ),
        (F.col("best_r4").cast("double") / F.lit(10000.0)).alias("best_mean_dollars"),
        (F.col("regret_r4").cast("double") / F.lit(10000.0)).alias(
            "cum_regret_dollars"
        ),
    ).orderBy("day")


QUERIES["bandit_replay_greedy"] = bandit_replay_greedy
ORACLES["bandit_replay_greedy"] = """
    WITH grid AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS arm,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    warm AS (
        SELECT day, arm, s, n,
               sum(s) OVER (PARTITION BY arm ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS cs,
               sum(n) OVER (PARTITION BY arm ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS cn
        FROM grid
    ),
    scored AS (
        SELECT day, arm, s, n,
               CASE WHEN cn IS NOT NULL AND cn > 0
                    THEN CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) END AS pm
        FROM warm
    ),
    chosen AS (
        SELECT day, arm, s, n FROM (
            SELECT day, arm, s, n,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY pm DESC NULLS FIRST, arm) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    best AS (
        SELECT arm AS best_arm FROM (
            SELECT arm,
                   row_number() OVER (
                       ORDER BY CAST(sum(s) AS DOUBLE)
                                / CAST(sum(n) AS DOUBLE) DESC, arm) AS rk
            FROM grid GROUP BY arm
        ) WHERE rk = 1
    ),
    best_daily AS (
        SELECT g.day AS bday, b.best_arm,
               CAST(floor(CAST(g.s AS DOUBLE) * 100.0 / CAST(g.n AS DOUBLE)
                          + 0.5) AS BIGINT) AS best_r4
        FROM grid g JOIN best b ON g.arm = b.best_arm
    ),
    j AS (
        SELECT c.day, c.arm, bd.best_arm,
               CAST(floor(CAST(c.s AS DOUBLE) * 100.0 / CAST(c.n AS DOUBLE)
                          + 0.5) AS BIGINT) AS chosen_r4,
               bd.best_r4
        FROM chosen c JOIN best_daily bd ON c.day = bd.bday
    )
    SELECT day, arm AS chosen_arm, best_arm,
           CAST(chosen_r4 AS DOUBLE) / 10000.0 AS chosen_mean_dollars,
           CAST(best_r4 AS DOUBLE) / 10000.0 AS best_mean_dollars,
           CAST(sum(best_r4 - chosen_r4)
                    OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS DOUBLE) / 10000.0
               AS cum_regret_dollars
    FROM j ORDER BY day
"""


# --------------------------------------------------------------------------
# shapley_attribution — exact data-driven Shapley over the 3 touch channels
# --------------------------------------------------------------------------

SHAPLEY_CHANNELS = ("click", "view", "signup")


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution over the three touch
    channels (click / view / signup): the characteristic function
    v(S) = conversion rate of users whose observed touch set is S (0 for
    unobserved sets), and each channel's value is the closed-form 3-player
    Shapley sum phi_c = sum_{S not containing c} w(|S|) * (v(S + c) - v(S))
    with w = 1/3, 1/6, 1/3 — the marginal-contribution split
    attribution_credit's first/last-touch heuristics approximate.

    Exactness: v is one division of exact integers per subset; the 12
    (channel, subset) marginal terms join the EIGHT-row subset frame and
    fold order-pinned.

    Scale: one per-user reduce (4 boolean aggregates), one groupBy to the
    2^3-subset frame; everything after runs on <= 12 rows.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "signup").cast("int")).alias("s"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    subs = per_user.groupBy(
        (F.col("c") + F.col("v") * 2 + F.col("s") * 4).alias("sub")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k"))
    # all 8 subsets, v = 0 where unobserved
    allsub = spark.range(8).select(F.col("id").cast("int").alias("sub"))
    vtab = (
        allsub.join(subs, "sub", "left")
        .select(
            "sub",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.when(
                F.col("n").isNotNull() & (F.col("n") > 0),
                F.col("k").cast("double") / F.col("n").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("cv"),
        )
    )
    # 12 marginal terms: channel bit b in {1,2,4}, subset s without b
    chans = spark.range(3).select(
        F.element_at(
            F.array(*[F.lit(c) for c in SHAPLEY_CHANNELS]), F.col("id").cast("int") + 1
        ).alias("channel"),
        F.when(F.col("id") == 0, 1)
        .when(F.col("id") == 1, 2)
        .otherwise(4)
        .alias("bit"),
    )
    pairs = chans.crossJoin(F.broadcast(allsub)).filter(
        (F.col("sub") / F.col("bit")).cast("int") % 2 == 0
    )
    size = (
        F.col("sub") % 2
        + (F.col("sub") / 2).cast("int") % 2
        + (F.col("sub") / 4).cast("int") % 2
    )
    weight = (
        F.when(size == 0, 1.0 / 3.0)
        .when(size == 1, 1.0 / 6.0)
        .otherwise(1.0 / 3.0)
    )
    vw = vtab.select(F.col("sub").alias("sw"), F.col("cv").alias("v_with"))
    vo = vtab.select(F.col("sub").alias("so"), F.col("cv").alias("v_without"))
    terms = (
        pairs.withColumn("w", weight)
        .join(F.broadcast(vo), F.col("sub") == F.col("so"))
        .join(F.broadcast(vw), (F.col("sub") + F.col("bit")) == F.col("sw"))
        .select(
            "channel",
            "sub",
            (F.col("w") * (F.col("v_with") - F.col("v_without"))).alias("term"),
        )
    )
    wch = Window.partitionBy("channel").orderBy("sub").rowsBetween(
        Window.unboundedPreceding, 0
    )
    folded = terms.withColumn("phi_cum", F.sum("term").over(wch))
    return (
        folded.groupBy("channel")
        .agg((F.round(F.max_by(F.col("phi_cum"), F.col("sub")), 6) + F.lit(0.0)).alias("shapley_value"))
        .orderBy("channel")
    )


QUERIES["shapley_attribution"] = shapley_attribution
ORACLES["shapley_attribution"] = """
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ),
    subs AS (
        SELECT c + v * 2 + s * 4 AS sub, count(*) AS n, sum(conv) AS k
        FROM per_user GROUP BY 1
    ),
    allsub AS (SELECT CAST(u.i AS INT) AS sub
               FROM unnest(generate_series(0, 7)) AS u(i)),
    vtab AS (
        SELECT a.sub, coalesce(s.n, 0) AS n,
               CASE WHEN coalesce(s.n, 0) > 0
                    THEN CAST(s.k AS DOUBLE) / CAST(s.n AS DOUBLE)
                    ELSE 0.0 END AS cv
        FROM allsub a LEFT JOIN subs s ON a.sub = s.sub
    ),
    chans AS (
        SELECT 'click' AS channel, 1 AS bit
        UNION ALL SELECT 'view', 2
        UNION ALL SELECT 'signup', 4
    ),
    pairs AS (
        SELECT ch.channel, ch.bit, a.sub
        FROM chans ch, allsub a
        WHERE (a.sub // ch.bit) % 2 = 0
    ),
    terms AS (
        SELECT p.channel, p.sub,
               (CASE (p.sub % 2 + (p.sub // 2) % 2
                      + (p.sub // 4) % 2)
                     WHEN 0 THEN 1.0 / 3.0
                     WHEN 1 THEN 1.0 / 6.0
                     ELSE 1.0 / 3.0 END)
               * (vw.cv - vo.cv) AS term
        FROM pairs p
        JOIN vtab vo ON p.sub = vo.sub
        JOIN vtab vw ON p.sub + p.bit = vw.sub
    ),
    folded AS (
        SELECT channel, sub,
               sum(term) OVER (PARTITION BY channel ORDER BY sub
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS phi_cum
        FROM terms
    )
    SELECT channel,
           round(arg_max(phi_cum, sub), 6) + 0.0 AS shapley_value
    FROM folded GROUP BY channel ORDER BY channel
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AK: Markov removal-effect attribution
# ---------------------------------------------------------------------------

MRA_START = "__START__"
MRA_ROUNDS = 12
MRA_SCALE = 1_000_000_000  # probabilities as integer nano-units


def _mra_counts(spark: SparkSession, sf_dir: str):
    """START->first-event counts unioned with the non-absorbing bigram
    counts — the distributed part of removal attribution (everything
    downstream runs on the state-vocabulary-bounded matrix)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    first = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(MRA_START).alias("src"), "dst", "c")
    )
    bigrams = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .filter(F.col("event_type") != ABSORB_STATE)
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return first.unionAll(bigrams)


def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution over the user-journey
    graph (Anderl et al. 2014): for each non-absorbing channel, drop its
    node from the quantized transition matrix, re-run the
    absorbing-chain value iteration from the synthetic START state, and
    report removal_effect = 1 - P_removed/P_full plus the normalized
    attribution share — the data-driven alternative to last-touch and
    the Markov counterpart of shapley_attribution.

    Exactness: probabilities quantize ONCE to integer nano-units with
    exact half-up integer division ((2cS + n) div 2n — the
    absorption_conversion_prob pattern); every value-iteration fold is
    pure bounded integer arithmetic replicated term-for-term in the
    unrolled-CTE oracle.  The matrix is STATE-VOCABULARY bounded (6x6
    here, fixed at any corpus size), so after the distributed bigram
    reduce the chains run driver-side on exact Python ints — the PCA
    d x d precedent: a bounded-cardinality collect is a scalar witness,
    not a data-path collect.

    Scale: one user-keyed window pass builds first-event + bigram
    counts; everything else is O(V^2 * rounds * channels) scalar math.
    """
    counts = _mra_counts(spark, sf_dir).collect()
    from collections import defaultdict

    c: dict = defaultdict(int)
    n: dict = defaultdict(int)
    for r in counts:
        c[(r["src"], r["dst"])] += int(r["c"])
        n[r["src"]] += int(r["c"])
    S = MRA_SCALE
    q = {
        (s, d): (2 * cv * S + n[s]) // (2 * n[s]) for (s, d), cv in c.items()
    }
    states = sorted(n)  # all non-absorbing states incl. START

    def p_start(removed: str | None) -> int:
        live = [s for s in states if s != removed]
        p = {s: 0 for s in live}
        for _ in range(MRA_ROUNDS):
            nxt = {}
            for s in live:
                acc = q.get((s, ABSORB_STATE), 0) * S
                for t in live:
                    if t == MRA_START or t == removed:
                        continue
                    acc += q.get((s, t), 0) * p.get(t, 0)
                nxt[s] = (acc + S // 2) // S
            p = nxt
        return p[MRA_START]

    p_full = p_start(None)
    channels = sorted(s for s in states if s != MRA_START)
    p_rem = {ch: p_start(ch) for ch in channels}
    # integer deltas keep the shares exact-rational: no float-sum ordering
    tot_delta = sum(p_full - p_rem[ch] for ch in channels)
    rows = [
        (
            ch,
            float(p_full) / S,
            float(p_rem[ch]) / S,
            round(float(p_full - p_rem[ch]) / float(p_full), 6),
            round(float(p_full - p_rem[ch]) / float(tot_delta), 6),
        )
        for ch in channels
    ]
    return spark.createDataFrame(
        rows,
        "channel string, p_full double, p_removed double, "
        "removal_effect double, attribution_share double",
    ).orderBy("channel")


QUERIES["markov_removal_attribution"] = markov_removal_attribution


def _mra_oracle() -> str:
    s = MRA_SCALE
    base = [
        f"""firsts AS MATERIALIZED (
            SELECT '{MRA_START}' AS src, dst, count(*) AS c FROM (
                SELECT event_type AS dst,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) AS rn
                FROM events
            ) WHERE rn = 1 GROUP BY 1, 2
        )""",
        f"""bigrams AS MATERIALIZED (
            SELECT src, dst, count(*) AS c FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) AS dst
                FROM events
            )
            WHERE dst IS NOT NULL AND src != '{ABSORB_STATE}'
            GROUP BY 1, 2
        )""",
        "allc AS MATERIALIZED (SELECT * FROM firsts UNION ALL SELECT * FROM bigrams)",
        "tot AS MATERIALIZED (SELECT src, sum(c) AS n FROM allc GROUP BY 1)",
        f"""q AS MATERIALIZED (
            SELECT a.src, a.dst, (2 * a.c * {s} + t.n) // (2 * t.n) AS q
            FROM allc a JOIN tot t ON a.src = t.src
        )""",
        "states AS MATERIALIZED (SELECT DISTINCT src AS state FROM tot)",
    ]
    chains = []
    # chain 0 = full graph; chains 1..k = one channel removed each
    channel_sel = (
        f"SELECT state FROM states WHERE state != '{MRA_START}' ORDER BY state"
    )
    # enumerate channels STATICALLY is impossible in pure SQL text, so the
    # oracle unrolls per known event vocabulary: the driver data has the
    # fixed five event types; guard with a runtime check in the final SELECT
    evs = ["click", "error", "signup", "view"]
    for ci, removed in enumerate([None] + evs):
        cond = (
            "1=1"
            if removed is None
            else f"src != '{removed}' AND dst != '{removed}'"
        )
        stcond = "1=1" if removed is None else f"state != '{removed}'"
        chains.append(
            f"""p_{ci}_0 AS (
            SELECT state, CAST(0 AS HUGEINT) AS p
            FROM states WHERE {stcond}
        )"""
        )
        for r in range(1, MRA_ROUNDS + 1):
            chains.append(f"""p_{ci}_{r} AS (
            SELECT st.state,
                   (COALESCE(qp.q, 0) * {s}
                    + COALESCE(tr.sacc, 0) + {s // 2}) // {s} AS p
            FROM (SELECT state FROM states WHERE {stcond}) st
            LEFT JOIN (SELECT src AS state, q FROM q
                       WHERE dst = '{ABSORB_STATE}' AND {cond}) qp
                   ON st.state = qp.state
            LEFT JOIN (
                SELECT q.src AS state, sum(q.q * p.p) AS sacc
                FROM q JOIN p_{ci}_{r - 1} p ON q.dst = p.state
                WHERE q.dst != '{ABSORB_STATE}'
                  AND q.dst != '{MRA_START}' AND {cond}
                GROUP BY 1
            ) tr ON st.state = tr.state
        )""")
    finals = ",\n    ".join(
        f"f_{ci} AS (SELECT p FROM p_{ci}_{MRA_ROUNDS} "
        f"WHERE state = '{MRA_START}')"
        for ci in range(len(evs) + 1)
    )
    eff_rows = " UNION ALL ".join(
        f"""SELECT '{ch}' AS channel,
               CAST(f_0.p AS DOUBLE) / {s} AS p_full,
               CAST(f_{ci + 1}.p AS DOUBLE) / {s} AS p_removed,
               f_0.p - f_{ci + 1}.p AS delta,
               f_0.p AS pf
        FROM f_0, f_{ci + 1}"""
        for ci, ch in enumerate(evs)
    )
    joined = ",\n    ".join(base + chains)
    return f"""
    WITH {joined},
    {finals},
    effs AS ({eff_rows}),
    tote AS (SELECT sum(delta) AS td FROM effs)
    SELECT channel, p_full, p_removed,
           round(CAST(delta AS DOUBLE) / CAST(pf AS DOUBLE), 6)
               AS removal_effect,
           round(CAST(delta AS DOUBLE) / CAST(td AS DOUBLE), 6)
               AS attribution_share
    FROM effs, tote
    ORDER BY channel
"""


ORACLES["markov_removal_attribution"] = _mra_oracle()


SLOPE1_SAMPLE_MOD = 97  # deterministic ~1% customer sample for the report


def slope_one_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Slope One rating prediction (Lemire & Maclachlan 2005)
    over the (customer x brand) quantity matrix — the deviation-based
    recommender beside item_cf_topk (similarity ranking): for each
    sampled customer, the top predicted UNRATED brand via
    P(u,j) = sum_i (num_ji + r_ui * c_ji) / sum_i c_ji, where
    num_ji = sum over co-raters of (r_j - r_i) and c_ji the co-rater
    count — the algebraic collapse of (dev_ji + r_ui) * c_ji keeps every
    numerator an EXACT integer; the single division happens once per
    (user, candidate).

    Determinism: the report samples custkey % SLOPE1_SAMPLE_MOD == 0
    (deterministic, scale-proportional); the top-1 pick compares the
    bit-identical prediction double with brand-ascending tie-break.

    Scale: ratings reduce lineitem ONCE per (customer, brand); the
    deviation matrix is a user-keyed self-join bounded by the 25-brand
    enum (<= 625 pairs per user, 600 rows total -> broadcast); the
    candidate frame is sampled-users x 25 brands minus rated.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # materialize the ratings matrix: five consumers (both deviation
    # self-join sides, the sample's three uses) would each re-run the
    # lineitem x orders join+aggregate — measured r11: 52 Exchanges in
    # the unmaterialized plan; (customer x brand) ~25 rows per customer
    r = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("p_brand").alias("b")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("rq"))
        .localCheckpoint(eager=True)
    )
    x = r.select("u", F.col("b").alias("tgt"), F.col("rq").alias("rt"))
    y = r.select("u", F.col("b").alias("src"), F.col("rq").alias("rs"))
    dev = (
        x.join(y, "u")
        .filter(F.col("tgt") != F.col("src"))
        .groupBy("tgt", "src")
        .agg(
            F.sum((F.col("rt") - F.col("rs")).cast("decimal(38,0)")).alias("num"),
            F.count(F.lit(1)).cast("decimal(38,0)").alias("c"),
        )
    )
    sample = r.filter(F.col("u") % SLOPE1_SAMPLE_MOD == 0)
    brands = p.select(F.col("p_brand").alias("b")).distinct()
    cand = (
        sample.select("u").distinct()
        .join(F.broadcast(brands))
        .join(sample.select("u", "b"), ["u", "b"], "left_anti")
    )
    pred = (
        cand.join(F.broadcast(dev), cand["b"] == dev["tgt"])
        .select("u", "tgt", "src", "num", "c")
        .join(
            sample.select(
                F.col("u").alias("su"),
                F.col("b").alias("sb"),
                F.col("rq").alias("ru"),
            ),
            (F.col("u") == F.col("su")) & (F.col("src") == F.col("sb")),
        )
        .groupBy("u", "tgt")
        .agg(
            F.sum(
                F.col("num") + F.col("ru").cast("decimal(38,0)") * F.col("c")
            ).alias("snum"),
            F.sum(F.col("c")).alias("sc"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
    )
    pv = F.col("snum").cast("double") / F.col("sc").cast("double")
    w = Window.partitionBy("u").orderBy(pv.desc(), F.col("tgt").asc())
    return (
        pred.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("u").cast("bigint").alias("custkey"),
            F.col("tgt").alias("rec_brand"),
            F.round(pv, 4).alias("pred_qty"),
            "n_sources",
        )
        .orderBy("custkey")
    )


ORACLES["slope_one_predict"] = f"""
    WITH r AS (
        SELECT o_custkey AS u, p_brand AS b,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS rq
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    dev AS (
        SELECT x.b AS tgt, y.b AS src,
               CAST(sum(x.rq - y.rq) AS HUGEINT) AS num,
               CAST(count(*) AS HUGEINT) AS c
        FROM r x JOIN r y ON x.u = y.u AND x.b != y.b
        GROUP BY 1, 2
    ),
    sample_r AS (SELECT * FROM r WHERE u % {SLOPE1_SAMPLE_MOD} = 0),
    brands AS (SELECT DISTINCT p_brand AS b FROM part),
    cand AS (
        SELECT su.u, br.b
        FROM (SELECT DISTINCT u FROM sample_r) su CROSS JOIN brands br
        WHERE NOT EXISTS (SELECT 1 FROM sample_r s
                          WHERE s.u = su.u AND s.b = br.b)
    ),
    pred AS (
        SELECT cand.u, dev.tgt,
               sum(dev.num + CAST(sr.rq AS HUGEINT) * dev.c) AS snum,
               sum(dev.c) AS sc,
               CAST(count(*) AS BIGINT) AS n_sources
        FROM cand
        JOIN dev ON cand.b = dev.tgt
        JOIN sample_r sr ON sr.u = cand.u AND sr.b = dev.src
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT u, tgt, snum, sc, n_sources,
               row_number() OVER (
                   PARTITION BY u
                   ORDER BY CAST(snum AS DOUBLE) / CAST(sc AS DOUBLE) DESC,
                            tgt ASC) AS rn
        FROM pred
    )
    SELECT CAST(u AS BIGINT) AS custkey, tgt AS rec_brand,
           round(CAST(snum AS DOUBLE) / CAST(sc AS DOUBLE), 4) AS pred_qty,
           n_sources
    FROM ranked WHERE rn = 1
    ORDER BY custkey
"""
QUERIES["slope_one_predict"] = slope_one_predict


RMST_TAU = 14  # restriction horizon (days) for the RMST integral


def rmst_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at tau=14 days over kaplan_meier's
    exact signup -> first-purchase curve — the single-number summary
    clinicians/growth teams quote when median survival is undefined
    (here: "expected purchase-free days in the first two weeks").

    RMST(tau) = integral_0^tau S(t) dt of the step curve: each KM event
    day contributes lag(surv, default 1) * (min(dur, tau) -
    min(prev_dur, tau)), plus the tail surv_last * (tau - last event day
    before tau).  The lag/cumsum run on the same observation-window-
    bounded day frame as kaplan_meier; ln/exp on identical doubles agree
    and 4dp rounding absorbs last-ulp noise.
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
            F.col("p_ts").isNotNull().cast("int").alias("observed"),
        )
    )
    # day-cardinality cut: exits feeds total AND the curve (kaplan_meier
    # r11 pattern) — without it the events->per_user chain ran twice.
    exits = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.sum("observed").cast("double").alias("d"),
    ).localCheckpoint(eager=True)
    total = exits.agg(F.sum("x").alias("n_total"))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        exits.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum("x").over(w_prev), F.lit(0.0)),
        )
        .filter(F.col("d") > 0)
        .withColumn(
            "hit_zero",
            F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(w_cum),
        )
        .withColumn(
            "surv",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("d") < F.col("n_risk"),
                            F.log(1.0 - F.col("d") / F.col("n_risk")),
                        ).otherwise(F.lit(0.0))
                    ).over(w_cum)
                )
            ),
        )
    )
    w_ord = Window.orderBy("dur")
    seg = curve.select(
        "dur",
        "surv",
        F.coalesce(F.lag("surv").over(w_ord), F.lit(1.0)).alias("s_prev"),
        F.coalesce(F.lag("dur").over(w_ord), F.lit(0).cast("long")).alias(
            "d_prev"
        ),
    )
    tau = F.lit(float(RMST_TAU))
    width = F.least(F.col("dur").cast("double"), tau) - F.least(
        F.col("d_prev").cast("double"), tau
    )
    # tail survival = surv at the LAST event day <= tau (struct-max =
    # arg_max; if no event day falls inside tau, S = 1 through tau)
    in_tau = F.col("dur") <= RMST_TAU
    out = seg.agg(
        F.sum(F.col("s_prev") * width).alias("body"),
        F.max(
            F.when(in_tau, F.struct(F.col("dur"), F.col("surv")))
        ).alias("tail"),
        F.sum(in_tau.cast("long")).alias("n_event_days"),
    ).select(
        "body",
        F.coalesce(F.col("tail.surv"), F.lit(1.0)).alias("s_tail"),
        F.coalesce(F.col("tail.dur"), F.lit(0).cast("long")).alias("d_tail"),
        F.coalesce(F.col("n_event_days"), F.lit(0).cast("long")).alias(
            "n_event_days"
        ),
    )
    rmst = F.col("body") + F.col("s_tail") * (
        F.lit(float(RMST_TAU)) - F.col("d_tail").cast("double")
    )
    return out.select(
        F.lit(RMST_TAU).cast("int").alias("tau_days"),
        F.round(rmst, 4).alias("rmst_days"),
        F.round(rmst / RMST_TAU, 4).alias("rmst_share"),
        F.col("n_event_days").cast("long").alias("n_event_days"),
    )


ORACLES["rmst_survival"] = f"""
    WITH h AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    s AS (SELECT user_id, min(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
          GROUP BY 1),
    per_user AS (
        SELECT CAST(CASE WHEN p.p_ts IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(p.p_ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE),
                                   (SELECT h FROM h)) END AS BIGINT) AS dur,
               CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    ),
    exits AS (
        SELECT dur, CAST(count(*) AS DOUBLE) AS x,
               CAST(sum(observed) AS DOUBLE) AS d
        FROM per_user GROUP BY 1
    ),
    tot AS (SELECT sum(x) AS n_total FROM exits),
    risk AS (
        SELECT dur, x, d,
               t.n_total - coalesce(sum(x) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0.0) AS n_risk
        FROM exits CROSS JOIN tot t
    ),
    curve AS (
        SELECT dur, n_risk, d,
               CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                        OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) = 1
                    THEN 0.0
                    ELSE exp(sum(CASE WHEN d < n_risk
                                      THEN ln(1.0 - d / n_risk)
                                      ELSE 0.0 END)
                             OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW)) END AS surv
        FROM risk WHERE d > 0
    ),
    seg AS (
        SELECT dur, surv,
               coalesce(lag(surv) OVER (ORDER BY dur), 1.0) AS s_prev,
               coalesce(lag(dur) OVER (ORDER BY dur), 0) AS d_prev
        FROM curve
    ),
    agg AS (
        SELECT sum(s_prev * (least(CAST(dur AS DOUBLE), {RMST_TAU}.0)
                             - least(CAST(d_prev AS DOUBLE), {RMST_TAU}.0)))
                   AS body,
               coalesce(arg_max(surv, dur)
                        FILTER (WHERE dur <= {RMST_TAU}), 1.0) AS s_tail,
               coalesce(max(dur) FILTER (WHERE dur <= {RMST_TAU}), 0)
                   AS d_tail,
               CAST(count(*) FILTER (WHERE dur <= {RMST_TAU}) AS BIGINT)
                   AS n_event_days
        FROM seg
    )
    SELECT CAST({RMST_TAU} AS INTEGER) AS tau_days,
           round(body + s_tail * ({RMST_TAU}.0 - d_tail), 4) AS rmst_days,
           round((body + s_tail * ({RMST_TAU}.0 - d_tail)) / {RMST_TAU},
                 4) AS rmst_share,
           n_event_days
    FROM agg
"""
QUERIES["rmst_survival"] = rmst_survival


def competing_risks_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions under COMPETING
    risks: after signup, a user's first terminal event is either a
    purchase (cause 1, conversion) or an error (cause 2, failure) —
    whichever strikes first; neither -> right-censored at the horizon.
    1 - KM per cause OVERSTATES both incidences because it treats the
    rival cause as censoring; the CIF decomposition is the correct
    competing-risks answer and satisfies CIF1 + CIF2 + S = 1 exactly
    (test-pinned invariant).

    CIF_k(t) = sum over event days t_i <= t of S(t_i-) * d_ki / n_i,
    with S the ALL-cause KM.  Ties between causes on the same timestamp
    resolve to purchase (struct-min on (ts, priority) — deterministic).
    All windows run on the observation-window-bounded day frame; ln/exp
    on identical doubles agree and 4dp rounding absorbs ulp noise.
    """
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    terminal = (
        e.filter(F.col("event_type").isin("purchase", "error"))
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .select(
            "user_id",
            "s_ts",
            F.struct(
                F.col("ts"),
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(2)
                .alias("cause"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.min("ev").alias("first_ev"), F.min("s_ts").alias("s_ts"))
    )
    per_user = (
        signups.join(
            terminal.select("user_id", "first_ev"), "user_id", "left"
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("first_ev").isNotNull(),
                F.datediff(
                    F.col("first_ev.ts").cast("date"),
                    F.col("s_ts").cast("date"),
                ),
            )
            .otherwise(F.datediff(F.col("h"), F.col("s_ts").cast("date")))
            .cast("long")
            .alias("dur"),
            F.coalesce(F.col("first_ev.cause"), F.lit(0)).alias("cause"),
        )
    )
    # day-cardinality cut (kaplan_meier r11 pattern): exits feeds total
    # AND the risk frame — the events->per_user chain otherwise ran twice.
    exits = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.sum((F.col("cause") == 1).cast("int")).cast("double").alias("d1"),
        F.sum((F.col("cause") == 2).cast("int")).cast("double").alias("d2"),
    ).localCheckpoint(eager=True)
    total = exits.agg(F.sum("x").alias("n_total"))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    d_all = F.col("d1") + F.col("d2")
    risk = (
        exits.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum("x").over(w_prev), F.lit(0.0)),
        )
        .filter(d_all > 0)
    )
    # S(t-): all-cause survival BEFORE the current day's events
    hit_zero_prev = F.coalesce(
        F.max((d_all >= F.col("n_risk")).cast("int")).over(w_prev), F.lit(0)
    )
    s_prev = F.when(hit_zero_prev == 1, F.lit(0.0)).otherwise(
        F.exp(
            F.coalesce(
                F.sum(
                    F.when(
                        d_all < F.col("n_risk"),
                        F.log(1.0 - d_all / F.col("n_risk")),
                    ).otherwise(F.lit(0.0))
                ).over(w_prev),
                F.lit(0.0),
            )
        )
    )
    staged = risk.withColumn("s_prev", s_prev)
    cif1 = F.sum(
        F.col("s_prev") * F.col("d1") / F.col("n_risk")
    ).over(w_cum)
    cif2 = F.sum(
        F.col("s_prev") * F.col("d2") / F.col("n_risk")
    ).over(w_cum)
    return staged.select(
        F.col("dur").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d1").cast("long").alias("d_purchase"),
        F.col("d2").cast("long").alias("d_error"),
        F.round(cif1, 4).alias("cif_purchase"),
        F.round(cif2, 4).alias("cif_error"),
    ).orderBy("t_days")


ORACLES["competing_risks_cif"] = """
    WITH h AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    s AS (SELECT user_id, min(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY 1),
    term AS (
        SELECT e.user_id,
               min(struct_pack(ts := e.ts,
                               cause := CASE WHEN e.event_type = 'purchase'
                                             THEN 1 ELSE 2 END)) AS fe
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type IN ('purchase', 'error') AND e.ts > s.s_ts
        GROUP BY 1
    ),
    per_user AS (
        SELECT CAST(CASE WHEN t.fe IS NOT NULL
                    THEN date_diff('day', CAST(s.s_ts AS DATE),
                                   CAST(t.fe.ts AS DATE))
                    ELSE date_diff('day', CAST(s.s_ts AS DATE),
                                   (SELECT h FROM h)) END AS BIGINT) AS dur,
               coalesce(t.fe.cause, 0) AS cause
        FROM s LEFT JOIN term t ON s.user_id = t.user_id
    ),
    exits AS (
        SELECT dur, CAST(count(*) AS DOUBLE) AS x,
               CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS d1,
               CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS d2
        FROM per_user GROUP BY 1
    ),
    tot AS (SELECT sum(x) AS n_total FROM exits),
    risk0 AS (
        SELECT dur, x, d1, d2,
               t.n_total - coalesce(sum(x) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0.0) AS n_risk
        FROM exits CROSS JOIN tot t
    ),
    risk AS (SELECT * FROM risk0 WHERE d1 + d2 > 0),
    staged AS (
        SELECT dur, n_risk, d1, d2,
               CASE WHEN coalesce(max(CASE WHEN d1 + d2 >= n_risk
                                           THEN 1 ELSE 0 END)
                        OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING), 0) = 1
                    THEN 0.0
                    ELSE exp(coalesce(sum(CASE WHEN d1 + d2 < n_risk
                                      THEN ln(1.0 - (d1 + d2) / n_risk)
                                      ELSE 0.0 END)
                             OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING), 0.0))
                    END AS s_prev
        FROM risk
    )
    SELECT dur AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d1 AS BIGINT) AS d_purchase,
           CAST(d2 AS BIGINT) AS d_error,
           round(sum(s_prev * d1 / n_risk) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS cif_purchase,
           round(sum(s_prev * d2 / n_risk) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS cif_error
    FROM staged
    ORDER BY t_days
"""
QUERIES["competing_risks_cif"] = competing_risks_cif
