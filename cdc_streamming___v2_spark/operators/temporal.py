"""Temporal join operators + statistics tier (SURVEY.md §2.B additions).

Spark has no native AS-OF or interval-range join, so both are built from
shuffle-friendly primitives (the "custom operator as a composition of
DataFrame ops" path):

* **as-of join** — the union+window construction: tag both sides, union,
  one window per key ordered by (ts, side), ``last(..., ignorenulls)``
  carries the most recent right-side row forward. ONE shuffle on the key,
  no range explosion, no skew amplification — this is the plan that holds
  at 100 TB (both sides hash-partition on user_id once; the window sort is
  per-partition).
* **range join** — coarse time-bucketing: each probe row explodes to the
  2 buckets its window can touch, equi-join on (key, bucket), exact range
  predicate as a residual filter. Turns an O(N·M) theta join into an
  equi-join Catalyst can hash — the standard interval-join decomposition
  (same trick Flink's interval join and DuckDB's ASOF planner use).

The reference has no joins at all (SURVEY.md §2.B "Joins: Absent"); these
are [DRIVER]-tier operators over the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

RANGE_BUCKET_S = 600  # 10-minute buckets == the range width (2-bucket probe)


def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF LEFT JOIN: each ``purchase`` event paired with the same user's
    most recent ``view`` event at-or-before it (inclusive, DuckDB ASOF
    semantics).

    Right side is first deduped to one row per (user_id, ts) keeping the
    max event_id, so ties are deterministic in both engines. At equal
    timestamps the view sorts before the purchase (is_left ASC) to honor
    the inclusive bound.
    """
    e = load_table(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
    )
    purchases = e.filter(F.col("event_type") == "purchase")

    left = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        "event_id",
        "value",
        F.lit(None).cast("long").alias("v_id"),
        F.lit(None).cast("double").alias("v_value"),
    )
    right = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("event_id").alias("v_id"),
        F.col("value").alias("v_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        left.unionByName(right)
        .withColumn("view_event_id", F.last("v_id", ignorenulls=True).over(w))
        .withColumn(
            "view_ts",
            F.last(
                F.when(F.col("is_left") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .withColumn("view_value", F.last("v_value", ignorenulls=True).over(w))
    )
    return filled.filter(F.col("is_left") == 1).select(
        "event_id", "user_id", "ts", "value", "view_event_id", "view_ts", "view_value"
    )


def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-range join: per ``error`` event, the count of the same
    user's ``click`` events in the preceding 10 minutes ``[ts-10m, ts)``.

    Probe side explodes to the 2 coarse buckets its window spans; build
    side keeps its single bucket, so the match is a plain equi-join on
    (user_id, bucket) with the exact range as a residual — and no click
    can match twice (one bucket per click). Zero-match errors are kept by
    a final left join against the probe table.
    """
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts")
    )
    b0 = F.floor(F.col("ts").cast("double") / RANGE_BUCKET_S).cast("long")
    probe = errors.withColumn("bucket", F.explode(F.array(b0 - 1, b0)))
    build = clicks.withColumn(
        "bucket", F.floor(F.col("c_ts").cast("double") / RANGE_BUCKET_S).cast("long")
    )
    matched = (
        probe.join(build, ["user_id", "bucket"])
        .filter(
            (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") < F.col("ts"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return errors.join(matched, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks_10m"),
    )


def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate tier per return flag: sample stddev/variance,
    correlation, sample covariance, exact interpolated percentiles
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
    )


SAMPLE_MOD = 20  # 5% systematic sample


def systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-20 systematic sample of orders (key mod 20) with
    a Horvitz-Thompson-style scaled revenue estimate per status.

    Key-mod sampling is reproducible across engines and cluster sizes
    (unlike TABLESAMPLE, whose row selection is partition-dependent);
    the predicate pushes to the parquet scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % SAMPLE_MOD == 0
    )
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 2).alias("sample_revenue"),
        F.round(F.sum("o_totalprice") * SAMPLE_MOD, 2).alias("est_revenue"),
    )


ASOF_TOLERANCE_S = 1800  # max staleness: 30 minutes


def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF LEFT JOIN WITH TOLERANCE (pandas ``merge_asof(tolerance=...)``
    semantics): each purchase pairs with the same user's most recent view
    at-or-before it ONLY if that view is within ASOF_TOLERANCE_S seconds;
    staler matches fall back to NULL, exactly as if no view existed.

    Built on the same union+window construction as
    ``asof_join_purchase_view`` — the tolerance is a pure post-filter on
    the carried-forward columns (NULL-out when too old), so the 100-TB
    plan is identical: one hash shuffle on user_id, per-partition sort,
    no range explosion.
    """
    base = asof_join_purchase_view(spark, sf_dir)
    stale = F.col("ts").cast("double") - F.col("view_ts").cast("double")
    ok = F.col("view_ts").isNotNull() & (stale <= ASOF_TOLERANCE_S)
    return base.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(ok, F.col("view_event_id")).alias("view_event_id"),
        F.when(ok, F.col("view_ts")).alias("view_ts"),
        F.when(ok, F.col("view_value")).alias("view_value"),
        F.when(ok, F.round(stale, 3)).alias("staleness_s"),
    )



IOJ_ERR_US = 10 * 60 * 1_000_000  # error interval length: 10 min in micros
IOJ_BUCKET_US = 10 * 60 * 1_000_000  # time-chunk width for the equi-join


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (the general form of the
    point-in-interval range join above): per user, pair every ``error``
    interval [ts, ts+10m] with every overlapping ``purchase`` interval
    [ts, ts + value minutes], reporting the overlap duration.

    All time arithmetic runs on INTEGER epoch-microseconds (unix_micros /
    epoch_us) — bucket ids, the overlap predicate, and the overlap length
    are integer-exact in both engines; only the final seconds conversion
    divides.

    Scale: each interval explodes to the IOJ_BUCKET_US-wide chunks it
    covers (sequence over floor-div bucket ids — intervals here span <= a
    few chunks), then a plain equi-join on (user_id, bucket).  A pair
    spanning several shared chunks matches once per chunk, so a distinct
    on the id pair dedupes BEFORE the verify predicate.  This is the
    standard shuffle-friendly decomposition of an interval join: chunk
    width trades fan-out (duplicated interval rows) against per-bucket
    join density, and partitioning is (user, time-chunk) — exactly how a
    100-TB session/outage correlation join is laid out.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        us.alias("e_start"),
        (us + F.lit(IOJ_ERR_US)).alias("e_end"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pur_id"),
        "user_id",
        us.alias("p_start"),
        (us + (F.col("value") * 60e6).cast("long")).alias("p_end"),
    )

    def bucketed(df, s, epts):
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / IOJ_BUCKET_US).cast("long"),
                    F.floor(F.col(epts) / IOJ_BUCKET_US).cast("long"),
                )
            ),
        )

    cand = (
        bucketed(errors, "e_start", "e_end")
        .join(bucketed(purchases, "p_start", "p_end"), ["user_id", "bucket"])
        .select("user_id", "err_id", "pur_id", "e_start", "e_end",
                "p_start", "p_end")
        .distinct()
    )
    overlap_us = F.least("e_end", "p_end") - F.greatest("e_start", "p_start")
    return (
        cand.filter(
            (F.col("e_start") < F.col("p_end"))
            & (F.col("p_start") < F.col("e_end"))
        )
        .select(
            "user_id",
            "err_id",
            "pur_id",
            F.round(overlap_us / 1e6, 3).alias("overlap_seconds"),
        )
    )


ISLAND_PAD_US = 5 * 60 * 1_000_000  # each event covers [ts, ts + 5 min)


def interval_coalesce_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (the SQL gaps-and-islands problem): every event
    spans [ts, ts + ISLAND_PAD_US); overlapping or touching spans of the
    same user merge into maximal "islands" of continuous activity.  Output
    per user: island count, events, total covered time, longest island —
    the activity-coverage rollup a sessionizer or SLA monitor computes.

    Construction: per user ordered by (ts, event_id), a span starts a new
    island iff its start exceeds the running max end of ALL previous spans
    (max-end window over UNBOUNDED PRECEDING .. 1 PRECEDING — NOT lag(end),
    which breaks when an earlier long span swallows a later short one);
    the island id is the running sum of start flags.  Two windows and two
    aggregations, all partitioned by user_id — one shuffle at 100 TB, no
    self-join.  All arithmetic on integer epoch-micros: zero float risk.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("s")
    )
    e = e.withColumn("t", F.col("s") + ISLAND_PAD_US)
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = order.rowsBetween(Window.unboundedPreceding, -1)
    flagged = e.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("t").over(prev_max), F.lit(-1)), 1
        ).otherwise(0),
    ).withColumn(
        "island", F.sum("new_island").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"),
        F.max("t").alias("i_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum(F.col("i_end") - F.col("i_start")).cast("bigint").alias(
            "covered_us"
        ),
        F.max(F.col("i_end") - F.col("i_start")).cast("bigint").alias(
            "max_island_us"
        ),
    )


QUERIES = {
    "interval_coalesce_islands": interval_coalesce_islands,
    "interval_overlap_join": interval_overlap_join,
    "asof_join_purchase_view": asof_join_purchase_view,
    "asof_tolerance_join": asof_tolerance_join,
    "range_join_error_clicks": range_join_error_clicks,
    "stats_agg": stats_agg,
    "systematic_sample": systematic_sample,
}

ORACLES = {

    "interval_coalesce_islands": f"""
        WITH spans AS (
            SELECT user_id, event_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {ISLAND_PAD_US} AS t
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, s, t,
                   CASE WHEN s > coalesce(max(t) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS new_island
            FROM spans
        ),
        numbered AS (
            SELECT user_id, s, t,
                   sum(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
            FROM flagged
        ),
        islands AS (
            SELECT user_id, island, min(s) AS i_start, max(t) AS i_end,
                   count(*) AS n_events
            FROM numbered GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_islands,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(sum(i_end - i_start) AS BIGINT) AS covered_us,
               CAST(max(i_end - i_start) AS BIGINT) AS max_island_us
        FROM islands GROUP BY 1
    """,

    "interval_overlap_join": f"""
        WITH e AS (
            SELECT event_id AS err_id, user_id,
                   epoch_us(ts) AS e_start,
                   epoch_us(ts) + {IOJ_ERR_US} AS e_end
            FROM events WHERE event_type = 'error'
        ),
        p AS (
            SELECT event_id AS pur_id, user_id,
                   epoch_us(ts) AS p_start,
                   epoch_us(ts) + CAST(value * 60e6 AS BIGINT) AS p_end
            FROM events WHERE event_type = 'purchase'
        ),
        eb AS (SELECT *, unnest(generate_series(e_start // {IOJ_BUCKET_US},
                                                e_end // {IOJ_BUCKET_US})) AS bucket
               FROM e),
        pb AS (SELECT *, unnest(generate_series(p_start // {IOJ_BUCKET_US},
                                                p_end // {IOJ_BUCKET_US})) AS bucket
               FROM p),
        cand AS (
            SELECT DISTINCT eb.user_id, err_id, pur_id,
                            e_start, e_end, p_start, p_end
            FROM eb JOIN pb ON eb.user_id = pb.user_id
                           AND eb.bucket = pb.bucket
        )
        SELECT user_id, err_id, pur_id,
               round((least(e_end, p_end) - greatest(e_start, p_start))
                     / 1e6, 3) AS overlap_seconds
        FROM cand
        WHERE e_start < p_end AND p_start < e_end
    """,
    "asof_join_purchase_view": """
        WITH v AS (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ),
        vd AS (SELECT user_id, ts, event_id, value FROM v WHERE rn = 1),
        p AS (SELECT event_id, user_id, ts, value
              FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.ts, p.value,
               vd.event_id AS view_event_id,
               vd.ts       AS view_ts,
               vd.value    AS view_value
        FROM p ASOF LEFT JOIN vd
          ON p.user_id = vd.user_id AND p.ts >= vd.ts
    """,
    "asof_tolerance_join": f"""
        WITH v AS (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ),
        vd AS (SELECT user_id, ts, event_id, value FROM v WHERE rn = 1),
        p AS (SELECT event_id, user_id, ts, value
              FROM events WHERE event_type = 'purchase'),
        base AS (
            SELECT p.event_id, p.user_id, p.ts, p.value,
                   vd.event_id AS view_event_id,
                   vd.ts       AS view_ts,
                   vd.value    AS view_value,
                   epoch(p.ts) - epoch(vd.ts) AS stale
            FROM p ASOF LEFT JOIN vd
              ON p.user_id = vd.user_id AND p.ts >= vd.ts
        )
        SELECT event_id, user_id, ts, value,
               CASE WHEN stale <= {ASOF_TOLERANCE_S}
                    THEN view_event_id END AS view_event_id,
               CASE WHEN stale <= {ASOF_TOLERANCE_S}
                    THEN view_ts END AS view_ts,
               CASE WHEN stale <= {ASOF_TOLERANCE_S}
                    THEN view_value END AS view_value,
               CASE WHEN stale <= {ASOF_TOLERANCE_S}
                    THEN round(stale, 3) END AS staleness_s
        FROM base
    """,
    "range_join_error_clicks": """
        WITH a AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'error'),
             b AS (SELECT user_id, ts AS c_ts FROM events
                   WHERE event_type = 'click')
        SELECT a.event_id, a.user_id, a.ts,
               count(b.c_ts) AS n_clicks_10m
        FROM a LEFT JOIN b
          ON a.user_id = b.user_id
         AND b.c_ts >= a.ts - INTERVAL '10 minutes'
         AND b.c_ts <  a.ts
        GROUP BY a.event_id, a.user_id, a.ts
    """,
    "stats_agg": """
        SELECT l_returnflag,
               count(*) AS n_items,
               round(stddev_samp(l_quantity), 4)  AS std_qty,
               round(var_samp(l_quantity), 4)     AS var_qty,
               round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               round(quantile_cont(l_quantity, 0.5), 4)          AS median_qty,
               round(quantile_cont(l_extendedprice, 0.95), 4)    AS p95_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "systematic_sample": f"""
        SELECT o_orderstatus,
               count(*) AS n_sampled,
               round(sum(o_totalprice), 2) AS sample_revenue,
               round(sum(o_totalprice) * {SAMPLE_MOD}, 2) AS est_revenue
        FROM orders
        WHERE o_orderkey % {SAMPLE_MOD} = 0
        GROUP BY o_orderstatus
    """,
}


def asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, NEAREST direction (pandas ``merge_asof
    direction='nearest'`` semantics): each purchase pairs with the same
    user's view event closest in time on EITHER side, ties to the
    backward (at-or-before) candidate.  Completes the as-of family next
    to the backward and tolerance variants.

    Construction: the same union+window trick as the backward as-of, run
    in both directions over ONE user-keyed sort — ``last(ignorenulls)``
    over the preceding frame gives the backward candidate (views sort
    before purchases at equal ts, so equal-ts is inclusive-backward),
    ``first(ignorenulls)`` over the following frame gives the strictly-
    forward candidate; a final projection picks the smaller absolute
    delta.  ONE shuffle on user_id, no range explosion; right side is
    deduped to (user, ts)-unique keeping max event_id so ties are
    deterministic in both engines.  The oracle is the brute-force ranked
    join over the same deduped views — the hash match proves the
    two-window construction loses nothing.
    """
    e = load_table(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
    )
    purchases = e.filter(F.col("event_type") == "purchase")
    left = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        "event_id",
        F.lit(None).cast("long").alias("v_id"),
        F.lit(None).cast("timestamp").alias("v_ts"),
    )
    right = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
    )
    base = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("is_left").asc(), F.col("v_id").asc()
    )
    back = base.rowsBetween(Window.unboundedPreceding, 0)
    fwd = base.rowsBetween(0, Window.unboundedFollowing)
    u = (
        left.unionByName(right)
        .withColumn("b_id", F.last("v_id", ignorenulls=True).over(back))
        .withColumn("b_ts", F.last("v_ts", ignorenulls=True).over(back))
        .withColumn("f_id", F.first("v_id", ignorenulls=True).over(fwd))
        .withColumn("f_ts", F.first("v_ts", ignorenulls=True).over(fwd))
        .filter(F.col("is_left") == 1)
    )
    db = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    df_ = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    take_back = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (db <= df_)
    )
    return u.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(take_back, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "view_id"
        ),
        F.when(take_back, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "view_ts"
        ),
        F.when(take_back, -db).otherwise(df_).cast("long").alias("delta_us"),
    )


QUERIES["asof_nearest_join"] = asof_nearest_join
ORACLES["asof_nearest_join"] = """
    WITH views AS (
        SELECT user_id, ts, max(event_id) AS v_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               v.v_id AS view_id, v.ts AS view_ts,
               epoch_us(v.ts) - epoch_us(p.purchase_ts) AS delta_us,
               row_number() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY abs(epoch_us(v.ts) - epoch_us(p.purchase_ts)),
                            CASE WHEN epoch_us(v.ts)
                                      <= epoch_us(p.purchase_ts)
                                 THEN 0 ELSE 1 END
               ) AS rk
        FROM purchases p JOIN views v ON p.user_id = v.user_id
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts,
           c.view_id, c.view_ts, CAST(c.delta_us AS BIGINT) AS delta_us
    FROM purchases p
    LEFT JOIN cand c ON p.purchase_id = c.purchase_id AND c.rk = 1
"""
