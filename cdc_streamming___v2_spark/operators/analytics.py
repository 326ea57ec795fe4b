"""Event-analytics queries over the ``events`` change log: ordered-sequence
funnel and retention cohorts — the product-analytics tier a history table
exists to serve (the reference's BigQuery history tables feed exactly this
kind of query downstream).

Scale: both queries reduce events to per-user aggregates FIRST (shuffle at
user cardinality, with map-side partial aggregation), then operate on the
reduced frame — never a self-join of the raw log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texts import md5_hash_long
from ..sources.tables import load_table
from .event_windows import SESSION_GAP_MIN

FUNNEL = ("signup", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then clicked AFTER the signup,
    then purchased AFTER that click (strict event-time ordering, first
    qualifying timestamp at each stage)."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == FUNNEL[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == FUNNEL[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_after")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_after")))
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week (cohort),
    counted per week of subsequent activity."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .withColumn(
            "weeks_since",
            (F.datediff("active_week", "cohort_week") / 7).cast("long"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count("*").alias("n_active_users"))
    )


def time_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1-hour moving average of event value — a RANGE
    frame over event time (not a ROWS frame: the window is defined by the
    clock, so bursts widen the row count and quiet hours shrink it).

    Both engines order by epoch SECONDS so frame membership (including
    same-second peers, which RANGE includes wholesale) is identical.

    Scale: one shuffle on user_id; the ordered frame is computed by a
    single sort within each partition — no self-join expansion of the
    "events within the last hour" predicate.
    """
    e = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").alias("epoch_s")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("epoch_s"))
        .rangeBetween(-3600, 0)
    )
    return e.select("user_id", "event_id", "ts", "value", epoch).select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("trailing_1h_avg"),
        F.count("*").over(w).alias("n_in_window"),
    )


def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event row carries the value
    of the user's most recent *purchase* at or before it (NULL until the
    first purchase) — the IGNORE NULLS window idiom used to forward-fill
    sparse readings over a dense event stream.

    Scale: single shuffle on user_id + ordered scan; no join of the sparse
    series against itself.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 4).alias(
            "last_purchase_value"
        ),
    )


HIST_BIN = 25000.0


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of order totals in fixed-width bins (floor division — no
    width_bucket dependency), with per-bin share of orders.

    Scale: binning is a narrow map; the aggregation shuffles only
    n_bins rows after map-side partials; the share denominator is a
    broadcast one-row crossJoin, not a single-partition window.
    """
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.floor(F.col("o_totalprice") / HIST_BIN).cast("bigint").alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(F.count("*").alias("n_orders"))
    total = per_bin.agg(F.sum("n_orders").cast("double").alias("n_total"))
    return (
        per_bin.crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.col("bin") * HIST_BIN).alias("bin_low"),
            "n_orders",
            F.round(F.col("n_orders") / F.col("n_total"), 4).alias("share"),
        )
        .orderBy("bin")
    )


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: event value totals at
    (year, month, day), (year, month), (year), and grand-total levels in
    one pass via ROLLUP.

    Scale: Catalyst expands rollup into a single Expand + one aggregation
    — the fact is scanned once, not once per level.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").cast("bigint").alias("y"),
            F.month("ts").cast("bigint").alias("m"),
            F.dayofmonth("ts").cast("bigint").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


PARETO_BUCKET = 100.0  # price-bucket width for the distributed prefix-max


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (price low, size high) — B
    dominates A iff B is no worse on both axes and strictly better on one.

    Scale: the naive formulation is a quadratic self-join (the oracle runs
    exactly that NOT EXISTS). This operator instead uses the 2-D sweep:
    reduce to per-price best size (one shuffle with map-side partials),
    then a prefix-max over strictly-cheaper prices decides domination.
    The prefix-max itself is distributed the same way as seq_packing's
    prefix sum: in-bucket cummax partitioned by a price bucket, plus a
    broadcast per-bucket offset frame — never a single-task global window,
    never an O(n^2) join. Frontier rows join back broadcast (a frontier is
    tiny relative to its input).
    """
    p = load_table(spark, sf_dir, "part")
    per_price = (
        p.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("best_size"))
        .withColumn(
            "bkt", F.floor(F.col("p_retailprice") / PARETO_BUCKET).cast("long")
        )
    )
    in_bucket = F.max("best_size").over(
        Window.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = per_price.withColumn("local_max", in_bucket)
    bucket_max = (
        per_price.groupBy("bkt")
        .agg(F.max("best_size").alias("bm"))
        .withColumn(
            "prev_max",
            F.max("bm").over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("bkt", "prev_max")
    )
    frontier_prices = (
        local.join(F.broadcast(bucket_max), "bkt")
        .withColumn(
            "strict_cummax",
            F.greatest(
                F.coalesce(F.col("local_max"), F.lit(-1)),
                F.coalesce(F.col("prev_max"), F.lit(-1)),
            ),
        )
        .filter(F.col("best_size") > F.col("strict_cummax"))
        .select("p_retailprice", "best_size")
    )
    return (
        p.join(F.broadcast(frontier_prices), "p_retailprice")
        .filter(F.col("p_size") == F.col("best_size"))
        .select("p_partkey", "p_retailprice", "p_size")
    )


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the gaps-and-islands
    idiom (day minus dense row number anchors each run).

    Scale: distinct (user, day) first (map-side partial), then two windows
    both partitioned by user — no global window, no self-join.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    streaks = (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("user_id", "anchor")
        .agg(
            F.count("*").alias("streak_days"),
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") == 1)
        .select("user_id", "streak_days", "streak_start", "streak_end")
    )


def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum overlap: peak number of concurrently-open user
    sessions (30-min-gap sessions, closed intervals), with the first
    instant the peak is reached and the total session count.

    Scale: intervals become +1/-1 boundary points, reduced per distinct
    timestamp FIRST (so tie ordering is aggregated away, not window-order
    dependent); the running balance uses the bucketed two-pass prefix sum
    (per-day partitions + broadcast day offsets) — the naive global-window
    formulation the oracle runs would serialize 100 TB of boundaries
    through one task. Ends at exactly t do not close before starts at t
    (closed intervals): active(t) = starts(<=t) - ends(<t).
    """
    from .event_windows import session_agg

    # materialize the session frame once: it feeds both boundary-point
    # branches and the session count (3 consumers), each of which would
    # re-run the full sessionization windows (r11 lineage-cut pass)
    sess = session_agg(spark, sf_dir).select(
        "sess_start", "sess_end"
    ).localCheckpoint(eager=True)
    pts = sess.select(
        F.col("sess_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(sess.select(F.col("sess_end").alias("t"), F.lit(0).alias("d")))
    per_t = (
        pts.groupBy("t")
        .agg(
            F.sum("d").cast("long").alias("n_starts"),
            F.sum(F.lit(1) - F.col("d")).cast("long").alias("n_ends"),
        )
        .withColumn("day", F.to_date("t"))
    )
    wday = Window.partitionBy("day").orderBy("t")
    local = per_t.withColumn(
        "c_starts",
        F.sum("n_starts").over(wday.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn(
        "c_ends_prev",
        F.coalesce(
            F.sum("n_ends").over(
                wday.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        per_t.groupBy("day")
        .agg(F.sum("n_starts").alias("ds"), F.sum("n_ends").alias("de"))
        .select(
            "day",
            F.coalesce(F.sum("ds").over(wd), F.lit(0)).alias("start_off"),
            F.coalesce(F.sum("de").over(wd), F.lit(0)).alias("end_off"),
        )
    )
    act = local.join(F.broadcast(offs), "day").select(
        "t",
        (
            F.col("start_off")
            + F.col("c_starts")
            - F.col("end_off")
            - F.col("c_ends_prev")
        ).alias("active"),
    ).localCheckpoint(eager=True)  # consumed by the peak agg AND the argmin filter
    peak = act.agg(F.max("active").alias("peak_concurrency"))
    n_sess = sess.agg(F.count("*").alias("n_sessions"))
    return (
        act.crossJoin(F.broadcast(peak))
        .filter(F.col("active") == F.col("peak_concurrency"))
        .groupBy("peak_concurrency")
        .agg(F.min("t").alias("t_at_peak"))
        .crossJoin(F.broadcast(n_sess))
        .select(
            F.col("peak_concurrency").cast("bigint").alias("peak_concurrency"),
            "t_at_peak",
            "n_sessions",
        )
    )


EWMA_ALPHA = 0.5  # (1-alpha)^j = 2^-j: exact binary fractions, bit-portable
EWMA_K = 8  # trailing terms


def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of event value per user —
    the time-decay smoother monitoring pipelines keep per entity.

    Finite form: ewma_t = sum_j w_j x_(t-j) / sum_j w_j over the trailing
    EWMA_K events (w_j = (1-alpha)^j), normalized over the terms that
    exist so the series start is unbiased.  An explicit lag chain (fixed
    evaluation order, exact 2^-j weights at alpha = .5) rather than a
    recursive state — bit-portable across engines, and each row costs K
    fused lag reads inside ONE user-partitioned sort window: one shuffle
    on user_id total, no self-join, no iterative pass.

    Total order: (epoch seconds, event_id) — same tiebreak both engines,
    so lag contents are identical.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), F.col("event_id")
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(EWMA_K):
        wj = (1.0 - EWMA_ALPHA) ** j
        xj = F.lag("value", j).over(w)
        num = num + F.coalesce(xj * F.lit(wj), F.lit(0.0))
        den = den + F.when(xj.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value"), 4).alias("value"),
        F.round((num / den), 4).alias("ewma"),
    )


GINI_BUCKET = 25000.0  # revenue-bucket width for the distributed rank


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    concentration measure behind "top x% of customers drive y% of
    revenue" analyses.  G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n with x
    ascending, which needs every customer's GLOBAL rank within its
    segment.

    The rank is computed the scale-safe way (same two-pass decomposition
    as peak_concurrency / pareto_frontier): in-bucket row_number
    partitioned by (segment, revenue bucket), plus per-bucket cumulative
    offsets from a bucket-cardinality frame — never a one-task
    whole-segment sort window.  The oracle runs exactly that naive
    per-segment window, so the hash match is the equivalence proof.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "c_custkey", "rev")
    )
    b = rev.withColumn(
        "bkt", F.floor(F.col("rev") / GINI_BUCKET).cast("long")
    )
    win_in = Window.partitionBy("c_mktsegment", "bkt").orderBy(
        "rev", "c_custkey"
    )
    in_rank = b.withColumn("r_in", F.row_number().over(win_in))
    counts = b.groupBy("c_mktsegment", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("c_mktsegment")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("c_mktsegment", "bkt", "off")
    ranked = in_rank.join(F.broadcast(offsets), ["c_mktsegment", "bkt"]).select(
        "c_mktsegment", "rev", (F.col("off") + F.col("r_in")).alias("rk")
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("total_revenue"),
            F.sum(F.col("rk") * F.col("rev")).alias("wsum"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "total_revenue",
            F.round(
                2.0 * F.col("wsum")
                / (F.col("n_customers") * F.col("total_revenue"))
                - (F.col("n_customers") + 1) / F.col("n_customers"),
                6,
            ).alias("gini"),
        )
    )


def interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: the lag between a
    user's consecutive events of each type, summarized as exact p50/p90/
    p99 plus mean — the load model capacity planning reads off a stream.

    Scale: one (type, user)-partitioned sort window computes the lags;
    the percentile agg shuffles gap rows at (type) cardinality with
    map-side partial aggregation. At extreme volume the exact percentile
    swaps for the mergeable histogram sketch (quantile_sketch) — same
    exact/approx pairing the sketch tier documents.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("es"), F.col("event_id")
    )
    gaps = (
        e.select(
            "event_type",
            "user_id",
            "event_id",
            F.unix_timestamp("ts").alias("es"),
        )
        .withColumn("gap_s", F.col("es") - F.lag("es").over(w))
        .filter(F.col("gap_s").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 2).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 2).alias("p90_s"),
        F.round(F.expr("percentile(gap_s, 0.99)"), 2).alias("p99_s"),
        F.round(F.avg("gap_s"), 2).alias("mean_s"),
    )


EQUI_DEPTH_BUCKETS = 16
EQUI_DEPTH_RANGE_BUCKET = 25000.0  # price-range width for the two-pass rank


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: ntile semantics over a total
    order (price, orderkey tiebreak) gives buckets of near-equal row count
    with data-driven boundaries — the histogram optimizers keep for
    selectivity estimation (complements the fixed-WIDTH price_histogram).

    Scale (VERDICT r2 #3 de-weakening): NO global ntile window — the global
    rank comes from the same two-pass decomposition as revenue_gini /
    peak_concurrency: in-bucket row_number partitioned by a fixed price
    range bucket, plus broadcast per-bucket cumulative offsets from a
    bucket-cardinality frame. ntile's exact fill rule (first N mod B
    buckets take one extra row) is then per-row arithmetic on the rank.
    The oracle runs the naive global ntile, so the hash match is the
    equivalence proof. Under extreme price skew the fixed-width range
    bucketing degrades; the adaptive fix is seeding range boundaries from
    the mergeable quantile_sketch (operators/sketches.py) — bucketing
    choice only affects partition balance, never the result.
    """
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    b = o.withColumn(
        "rbkt", F.floor(F.col("o_totalprice") / EQUI_DEPTH_RANGE_BUCKET).cast("long")
    )
    win_in = Window.partitionBy("rbkt").orderBy("o_totalprice", "o_orderkey")
    in_rank = b.withColumn("r_in", F.row_number().over(win_in))
    counts = b.groupBy("rbkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("rbkt").rowsBetween(Window.unboundedPreceding, -1)
    # offsets/total live on the bucket-cardinality frame (dozens of rows)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("rbkt", "off")
    total = counts.agg(F.sum("cnt").cast("long").alias("n_total"))
    ranked = (
        in_rank.join(F.broadcast(offsets), "rbkt")
        .crossJoin(F.broadcast(total))
        .select(
            "o_totalprice",
            "n_total",
            (F.col("off") + F.col("r_in")).alias("rk"),
        )
    )
    # ntile(B): q = N div B rows everywhere, first m = N mod B buckets get
    # one extra; rank -> bucket is closed-form on those scalars
    B = EQUI_DEPTH_BUCKETS
    q = (F.col("n_total") / B).cast("long")
    m = F.col("n_total") % B
    big = m * (q + 1)  # rows living in the size-(q+1) head buckets
    bucket = F.when(
        F.col("rk") <= big, ((F.col("rk") - 1) / (q + 1)).cast("long") + 1
    ).otherwise(m + ((F.col("rk") - big - 1) / q).cast("long") + 1)
    return (
        ranked.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


ANOMALY_Z = 2.0


def anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection on daily event volume per event type:
    days whose count deviates from the type's own mean by more than
    ANOMALY_Z sample standard deviations are flagged — the monitoring
    primitive behind volume alerts.

    Scale: one (type, day) count agg, then mean/std per type computed over
    the (small) daily frame via a window — the raw events shuffle once;
    every later step is day-cardinality sized.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.stddev_samp(
        "n_events"
    ).over(w)
    return daily.select(
        "event_type",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) >= ANOMALY_Z).alias("is_anomaly"),
    )


def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality validation in one pass per table: the
    constraint report a pipeline gates on before shipping data downstream.

    Checks: completeness (non-null fraction), key uniqueness (distinct /
    total), value bounds (fraction inside the domain), and referential
    integrity (fraction of orders whose customer exists).  Output one row
    per check: (check_name, metric, passed).

    Scale: each table contributes ONE aggregation pass (all its metrics
    are conditional aggregates in the same groupBy-less agg — no per-check
    rescans); referential integrity is a broadcast-dim left-anti count.
    The union of per-check rows is constant-sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")

    li_m = li.agg(
        (F.count("l_quantity") / F.count(F.lit(1))).alias("qty_complete"),
        F.avg(
            F.col("l_discount").between(0.0, 0.1).cast("double")
        ).alias("discount_in_bounds"),
        F.avg(
            (F.col("l_extendedprice") > 0).cast("double")
        ).alias("price_positive"),
    )
    o_m = o.agg(
        (F.countDistinct("o_orderkey") / F.count(F.lit(1))).alias("key_unique"),
        (F.count("o_orderdate") / F.count(F.lit(1))).alias("date_complete"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("n_orphans"))
        .crossJoin(o.agg(F.count(F.lit(1)).cast("double").alias("n_orders")))
        .select((1.0 - F.col("n_orphans") / F.col("n_orders")).alias("ref_ok"))
    )

    def row(name: str, metric, threshold: float):
        return F.struct(
            F.lit(name).alias("check_name"),
            F.round(metric, 6).alias("metric"),
            (metric >= threshold).alias("passed"),
        )

    li_rows = li_m.select(
        F.explode(
            F.array(
                row("lineitem.l_quantity.completeness", F.col("qty_complete"), 1.0),
                row("lineitem.l_discount.in_bounds", F.col("discount_in_bounds"), 1.0),
                row("lineitem.l_extendedprice.positive", F.col("price_positive"), 1.0),
            )
        ).alias("r")
    )
    o_rows = o_m.select(
        F.explode(
            F.array(
                row("orders.o_orderkey.unique", F.col("key_unique"), 1.0),
                row("orders.o_orderdate.completeness", F.col("date_complete"), 1.0),
            )
        ).alias("r")
    )
    ref_rows = orphans.select(
        F.explode(
            F.array(row("orders.o_custkey.ref_customer", F.col("ref_ok"), 1.0))
        ).alias("r")
    )
    return (
        li_rows.unionByName(o_rows)
        .unionByName(ref_rows)
        .select("r.check_name", "r.metric", "r.passed")
    )


TREND_EPOCH = "2024-01-01"  # day-index origin for the regression x axis


def trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily-volume trend line: OLS fit of daily event count
    (and daily mean value) against the day index, via the closed-form
    regression aggregates (regr_slope / regr_intercept / regr_r2) — the
    capacity-forecast primitive ("is error volume growing?").

    Scale: daily rollup is one shuffle with map-side partial aggregation
    down to (type x day) cardinality; the regression aggregates then reduce
    that tiny frame. regr_* are single-pass mergeable sums (n, Σx, Σy,
    Σxy, Σx², Σy²) — the textbook distributed-OLS decomposition, so the
    same plan holds at any fact size.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(TREND_EPOCH)).alias("day_x"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("y_cnt"),
            F.avg("value").alias("y_val"),
        )
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.regr_slope("y_cnt", F.col("day_x").cast("double")), 6).alias(
            "cnt_slope"
        ),
        F.round(
            F.regr_intercept("y_cnt", F.col("day_x").cast("double")), 6
        ).alias("cnt_intercept"),
        F.round(F.regr_r2("y_cnt", F.col("day_x").cast("double")), 6).alias(
            "cnt_r2"
        ),
        F.round(F.regr_slope("y_val", F.col("day_x").cast("double")), 6).alias(
            "val_slope"
        ),
    )


MI_HOUR_BUCKET = 6  # joint distribution: event_type x 6-hour time-of-day band


def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and time-of-day band (bits):
    the feature-selection / drift-detection primitive — how much does WHEN
    an event happens tell you WHAT it is? Emits each event type's partial
    MI contribution plus the '__all__' total row.

    Scale: one shuffle to the (type x band) joint-count table (map-side
    combine; ~20 cells); marginals re-aggregate the joint table itself —
    the fact log is scanned exactly once. Everything after the first agg
    is broadcast-joined cell arithmetic.
    """
    e = load_table(spark, sf_dir, "events")
    joint = (
        e.groupBy(
            "event_type",
            (F.hour("ts") / MI_HOUR_BUCKET).cast("int").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("nxy"))
    )
    mx = joint.groupBy("event_type").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("band").agg(F.sum("nxy").alias("ny"))
    nt = joint.agg(F.sum("nxy").alias("n"))
    cells = (
        joint.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "band")
        .crossJoin(F.broadcast(nt))
        .select(
            "event_type",
            (
                (F.col("nxy") / F.col("n"))
                * F.log2(F.col("nxy") * F.col("n") / (F.col("nx") * F.col("ny")))
            ).alias("mi_term"),
            (F.col("nxy") / F.col("n")).alias("pxy"),
        )
    )
    per_type = cells.groupBy("event_type").agg(
        F.round(F.sum("mi_term"), 6).alias("mi_bits"),
        F.round(F.sum("pxy"), 6).alias("p_x"),
    )
    total = cells.agg(
        F.round(F.sum("mi_term"), 6).alias("mi_bits"),
        F.round(F.sum("pxy"), 6).alias("p_x"),
    ).select(F.lit("__all__").alias("event_type"), "mi_bits", "p_x")
    return per_type.unionByName(total)


WINSOR_LO, WINSOR_HI = 0.05, 0.95
WINSOR_BUCKET = 10.0  # value-range width for the two-pass rank


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics: exact p05/p95 value boundaries per
    event type, then mean/stddev of values clipped to [p05, p95] plus clip
    counts — the outlier-robust summary a metrics pipeline publishes.

    Scale: exact per-group quantiles WITHOUT a whole-group sort window or
    an in-memory percentile agg — the same two-pass global-rank
    decomposition as equi_depth_histogram (in-bucket row_number within
    fixed value-range buckets + broadcast cumulative bucket offsets), then
    only the 2 boundary-adjacent rows per quantile leave the executors.
    Boundaries broadcast back for the clipped re-aggregation (one more
    map-side-combined pass). The oracle is DuckDB's quantile_cont — the
    naive in-memory formulation — so the hash match proves the rank
    decomposition reproduces interpolated quantiles exactly.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    b = e.withColumn("rbkt", F.floor(F.col("value") / WINSOR_BUCKET).cast("long"))
    win_in = Window.partitionBy("event_type", "rbkt").orderBy("value", "event_id")
    in_rank = b.withColumn("r_in", F.row_number().over(win_in))
    counts = b.groupBy("event_type", "rbkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("rbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("event_type", "rbkt", "off")
    totals = counts.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    ranked = (
        in_rank.join(F.broadcast(offsets), ["event_type", "rbkt"])
        .join(F.broadcast(totals), "event_type")
        .select("event_type", "value", "n", (F.col("off") + F.col("r_in")).alias("rk"))
    )
    # interpolated quantile q: 1-based position k = 1 + q*(n-1); only the
    # floor(k)/ceil(k) rows matter — one filter keeps the (at most 4)
    # boundary rows per group, one agg pivots and interpolates
    k05 = 1 + F.lit(WINSOR_LO) * (F.col("n") - 1)
    k95 = 1 + F.lit(WINSOR_HI) * (F.col("n") - 1)
    kb = ranked.withColumn("k05", k05).withColumn("k95", k95)

    def _interp(kcol: str) -> F.Column:
        vlo = F.max(F.when(F.col("rk") == F.floor(F.col(kcol)), F.col("value")))
        vhi = F.max(F.when(F.col("rk") == F.ceil(F.col(kcol)), F.col("value")))
        frac = (F.first(kcol) - F.floor(F.first(kcol))).cast("double")
        return F.round(vlo + frac * (vhi - vlo), 6)

    bounds = (
        kb.filter(
            (F.col("rk") == F.floor(k05))
            | (F.col("rk") == F.ceil(k05))
            | (F.col("rk") == F.floor(k95))
            | (F.col("rk") == F.ceil(k95))
        )
        .groupBy("event_type")
        .agg(_interp("k05").alias("p05"), _interp("k95").alias("p95"))
    )
    clipped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("cv"),
        (F.col("value") < F.col("p05")).cast("long").alias("clip_lo"),
        (F.col("value") > F.col("p95")).cast("long").alias("clip_hi"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.first("p05").alias("p05"),
        F.first("p95").alias("p95"),
        F.round(F.avg("cv"), 6).alias("winsor_mean"),
        F.round(F.stddev("cv"), 6).alias("winsor_std"),
        F.sum("clip_lo").cast("bigint").alias("n_clipped_lo"),
        F.sum("clip_hi").cast("bigint").alias("n_clipped_hi"),
    )


KANON_K = 5          # minimum safe equivalence-class size
KANON_BAL_BUCKET = 1000.0  # acctbal quantization for the quasi-identifier


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment, account-balance bucket): per nation, how many
    equivalence classes exist, how many fall below KANON_K members, and how
    many customers those risky classes expose — the pre-release privacy
    check a data-sharing pipeline runs (pairs with pii_scrub, which handles
    direct identifiers).

    Scale: one map-side-combined groupBy to QI-class cardinality, then a
    re-aggregation at nation cardinality. No windows, no joins.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / KANON_BAL_BUCKET).cast("long").alias("bal_b"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    return classes.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.min("sz").cast("bigint").alias("k_min"),
        F.sum((F.col("sz") < KANON_K).cast("long"))
        .cast("bigint")
        .alias("n_small_classes"),
        F.sum(F.when(F.col("sz") < KANON_K, F.col("sz")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_at_risk"),
    )


def seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength per event type: the share of
    daily-volume variance explained by the weekly profile,
    1 - var(residual)/var(daily), where the residual removes each
    day-of-week's mean — the decomposition a forecasting pipeline uses to
    decide whether a series needs a seasonal model.

    Scale: the fact log collapses to (type x day) in one map-side-combined
    shuffle; everything after runs on that bounded frame (weekly profile is
    a 7-row broadcast per type). var_pop is a mergeable single-pass
    aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .withColumn("dow", F.dayofweek("d"))
    )
    prof = daily.groupBy("event_type", "dow").agg(F.avg("cnt").alias("dow_mean"))
    j = daily.join(F.broadcast(prof), ["event_type", "dow"])
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.var_pop("cnt").alias("vt"),
            F.var_pop(F.col("cnt") - F.col("dow_mean")).alias("vr"),
        )
        .select(
            "event_type",
            "n_days",
            F.round("vt", 4).alias("var_daily"),
            F.round(1 - F.col("vr") / F.col("vt"), 6).alias("strength"),
        )
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: cumulative sum of
    deviations of daily volume from the series mean; the day where |CUSUM|
    peaks is the most likely level-shift point — the classic drift detector
    for monitoring ingestion volume.

    Scale: daily rollup first (one shuffle, map-side combine); the
    cumulative window then runs over per-day aggregates — bounded
    cardinality per type, the same day-frame pattern peak_concurrency
    uses, never a fact-sized window. The CUSUM is an ORDERED prefix sum, so
    both engines fold identical doubles in identical order (no
    reassociation noise).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    means = daily.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cs = (
        daily.join(F.broadcast(means), "event_type")
        .withColumn("cusum", F.sum(F.col("cnt") - F.col("mu")).over(w))
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs("cusum").desc(), F.col("d").asc()
    )
    return (
        cs.withColumn("r", F.row_number().over(rk))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("d").alias("changepoint_day"),
            F.round(F.abs("cusum"), 4).alias("max_abs_cusum"),
            "n_days",
        )
    )


MAD_K = 3.0          # robust z threshold
MAD_SCALE = 1.4826   # MAD -> sigma consistency constant (normal dist.)


def robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier report per event type — the robust twin of
    ``anomaly_days``: mean/std break down when the outliers themselves
    inflate sigma, so monitoring uses median absolute deviation
    (|x - med| > K * 1.4826 * MAD) which tolerates up to 50% contamination.

    Scale: one (type, day) rollup (map-side combine), then two exact
    per-type medians over the day-cardinality frame (bounded rows per
    type — never fact-sized), one broadcast join each. Counts are small
    integers, so the median interpolation (a + (b-a)*0.5) is exact in
    both engines.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("cnt", 0.5).alias("med"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_outlier", F.col("adev") > MAD_K * MAD_SCALE * F.col("mad")
    )
    return flagged.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.round(F.max("med"), 2).alias("median_daily"),
        F.round(F.max("mad"), 2).alias("mad"),
        F.sum(F.col("is_outlier").cast("long")).cast("bigint").alias(
            "n_outliers"
        ),
        F.round(F.max("adev"), 2).alias("max_abs_dev"),
    )


def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound conversion funnel: of users whose journey starts with a
    signup, how many purchase within 1 day / 7 days / 30 days of their
    FIRST signup? The windowed companion to funnel_conversion's unbounded
    stage counts — the growth metric a "D7 conversion" dashboard shows.

    Scale: two filtered aggregations keyed by user (map-side combine) and
    one state-sized join; the conversion flags are timestamp interval
    arithmetic (identical semantics in both engines), then a single-row
    rollup.
    """
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    # first purchase STRICTLY AFTER the signup
    purchases_after = (
        e.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    j = signups.join(purchases_after.select("user_id", "tp"), "user_id", "left")
    flags = j.select(
        "user_id",
        (F.col("tp") <= F.col("t0") + F.expr("INTERVAL 1 DAY"))
        .cast("long").alias("c1"),
        (F.col("tp") <= F.col("t0") + F.expr("INTERVAL 7 DAY"))
        .cast("long").alias("c7"),
        (F.col("tp") <= F.col("t0") + F.expr("INTERVAL 30 DAY"))
        .cast("long").alias("c30"),
    )
    z = F.lit(0).cast("bigint")
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signup_users"),
        F.coalesce(F.sum("c1"), z).cast("bigint").alias("n_conv_1d"),
        F.coalesce(F.sum("c7"), z).cast("bigint").alias("n_conv_7d"),
        F.coalesce(F.sum("c30"), z).cast("bigint").alias("n_conv_30d"),
    )
    return agg.select(
        "n_signup_users",
        "n_conv_1d",
        "n_conv_7d",
        "n_conv_30d",
        F.round(F.col("n_conv_1d") / F.col("n_signup_users"), 6).alias("rate_1d"),
        F.round(F.col("n_conv_7d") / F.col("n_signup_users"), 6).alias("rate_7d"),
        F.round(F.col("n_conv_30d") / F.col("n_signup_users"), 6).alias(
            "rate_30d"
        ),
    )


_FUNNEL_WINDOWED_ORACLE = """
    WITH s AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS tp
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.t0
        GROUP BY 1
    ),
    flags AS (
        SELECT s.user_id,
               CASE WHEN p.tp <= s.t0 + INTERVAL 1 DAY THEN 1 ELSE 0 END AS c1,
               CASE WHEN p.tp <= s.t0 + INTERVAL 7 DAY THEN 1 ELSE 0 END AS c7,
               CASE WHEN p.tp <= s.t0 + INTERVAL 30 DAY THEN 1 ELSE 0 END
                   AS c30
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
           CAST(sum(c1) AS BIGINT) AS n_conv_1d,
           CAST(sum(c7) AS BIGINT) AS n_conv_7d,
           CAST(sum(c30) AS BIGINT) AS n_conv_30d,
           round(sum(c1) * 1.0 / count(*), 6) AS rate_1d,
           round(sum(c7) * 1.0 / count(*), 6) AS rate_7d,
           round(sum(c30) * 1.0 / count(*), 6) AS rate_30d
    FROM flags
"""


CHI2_SPLIT_TS = "2024-01-16 00:00:00"  # period A | period B boundary


def chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test between two periods of the event-type
    distribution: did the traffic mix shift after CHI2_SPLIT_TS? Emits each
    type's period counts and chi-square contribution plus the '__all__'
    total — the categorical-drift monitor that pairs with
    cusum_changepoint's level-shift detector (numeric) and
    mutual_information's dependence measure.

    Scale: ONE map-side-combined shuffle to (type x period) cell counts;
    expected counts come from re-aggregating that tiny table (broadcast
    marginals), so the fact log is scanned exactly once.
    """
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (F.col("ts") > F.lit(CHI2_SPLIT_TS)).cast("int").alias("period"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    row_m = cells.groupBy("event_type").agg(F.sum("n").alias("rt"))
    col_m = cells.groupBy("period").agg(F.sum("n").alias("ct"))
    grand = cells.agg(F.sum("n").alias("g"))
    contrib = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "period")
        .crossJoin(F.broadcast(grand))
        .select(
            "event_type",
            "period",
            "n",
            (F.col("rt") * F.col("ct") / F.col("g")).alias("exp"),
        )
        .select(
            "event_type",
            "period",
            "n",
            ((F.col("n") - F.col("exp")) * (F.col("n") - F.col("exp"))
             / F.col("exp")).alias("x2"),
        )
    )
    per_type = contrib.groupBy("event_type").agg(
        F.sum(F.when(F.col("period") == 0, F.col("n"))).cast("bigint")
        .alias("n_before"),
        F.sum(F.when(F.col("period") == 1, F.col("n"))).cast("bigint")
        .alias("n_after"),
        F.round(F.sum("x2"), 6).alias("chi2_part"),
    )
    total = contrib.agg(
        F.sum(F.when(F.col("period") == 0, F.col("n"))).cast("bigint")
        .alias("n_before"),
        F.sum(F.when(F.col("period") == 1, F.col("n"))).cast("bigint")
        .alias("n_after"),
        F.round(F.sum("x2"), 6).alias("chi2_part"),
    ).select(F.lit("__all__").alias("event_type"), "n_before", "n_after",
             "chi2_part")
    return per_type.unionByName(total)


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_HORIZON = 7


def holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend) over the daily
    revenue series of each event type, with an HOLT_HORIZON-day-ahead
    linear forecast — the classic short-range forecaster one step up from
    q6's naive projection. L_t = αy_t + (1-α)(L_{t-1}+T_{t-1});
    T_t = β(L_t-L_{t-1}) + (1-β)T_{t-1}; init L_1=y_1, T_1=y_2-y_1.

    The recurrence is inherently sequential PER SERIES — exactly the case
    the guide reserves for applyInPandas: the daily frame reduces to
    (type x day) cells first (map-side combined shuffle), then each
    series' O(n_days) loop runs as one Arrow batch per key. At 100 TB the
    raw log is still scanned once; Python only ever sees the
    series-cardinality frame (days x types), never raw events. The oracle
    is a DuckDB recursive CTE over the identical IEEE expression order, so
    the hash match proves the loop bit-for-bit.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
            ).cast("double").alias("y")
        )
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        ys = [float(v) for v in pdf["y"]]
        lvl = ys[0]
        trd = (ys[1] - ys[0]) if len(ys) > 1 else 0.0
        for y in ys[1:]:
            new_lvl = HOLT_ALPHA * y + (1.0 - HOLT_ALPHA) * (lvl + trd)
            trd = HOLT_BETA * (new_lvl - lvl) + (1.0 - HOLT_BETA) * trd
            lvl = new_lvl
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(ys)],
                "level": [round(lvl, 4)],
                "trend": [round(trd, 4)],
                "forecast": [round(lvl + HOLT_HORIZON * trd, 4)],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        _holt,
        schema="event_type string, n_days long, level double, "
        "trend double, forecast double",
    )


KS_RANGE_BUCKET = 25.0  # purchase-value range width for the two-pass rank


def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the purchase-value
    distributions before/after CHI2_SPLIT_TS — the CONTINUOUS drift monitor
    that pairs with chi2_drift's categorical test: D = max over v of
    |ECDF_before(v) - ECDF_after(v)|, reported with the (smallest) value
    where the supremum is attained.

    Scale: the raw log collapses to (value -> before/after counts) cells in
    ONE map-side-combined shuffle; the two ECDFs are prefix sums over the
    sorted cells, computed with the same two-pass decomposition as
    equi_depth_histogram — in-bucket running sums partitioned by a fixed
    value-range bucket plus broadcast per-bucket offsets from the tiny
    bucket-cardinality frame. No global-ordering window ever sees the
    cell-cardinality frame.
    """
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("ts") <= F.lit(CHI2_SPLIT_TS), 1).otherwise(0)
            ).cast("double").alias("n1"),
            F.sum(
                F.when(F.col("ts") > F.lit(CHI2_SPLIT_TS), 1).otherwise(0)
            ).cast("double").alias("n2"),
        )
        .withColumn(
            "rbkt", F.floor(F.col("value") / KS_RANGE_BUCKET).cast("long")
        )
    )
    w_in = (
        Window.partitionBy("rbkt")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_cum = cells.select(
        "rbkt",
        "value",
        F.sum("n1").over(w_in).alias("c1_in"),
        F.sum("n2").over(w_in).alias("c2_in"),
    )
    btot = cells.groupBy("rbkt").agg(
        F.sum("n1").alias("b1"), F.sum("n2").alias("b2")
    )
    w_off = Window.orderBy("rbkt").rowsBetween(Window.unboundedPreceding, -1)
    # offsets live on the bucket-cardinality frame (a few dozen rows)
    offsets = btot.select(
        "rbkt",
        F.coalesce(F.sum("b1").over(w_off), F.lit(0.0)).alias("o1"),
        F.coalesce(F.sum("b2").over(w_off), F.lit(0.0)).alias("o2"),
    )
    totals = cells.agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    d = (
        in_cum.join(F.broadcast(offsets), "rbkt")
        .crossJoin(F.broadcast(totals))
        .select(
            "value",
            "t1",
            "t2",
            F.abs(
                (F.col("o1") + F.col("c1_in")) / F.col("t1")
                - (F.col("o2") + F.col("c2_in")) / F.col("t2")
            ).alias("d"),
        )
    )
    # argmax with min-value tie-break via a single struct max (no re-scan)
    best = d.agg(
        F.max(F.struct(F.col("d"), (-F.col("value")).alias("nv"))).alias("m"),
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
    )
    return best.select(
        F.col("t1").cast("bigint").alias("n_before"),
        F.col("t2").cast("bigint").alias("n_after"),
        F.round(F.col("m.d"), 6).alias("ks_stat"),
        F.round(-F.col("m.nv"), 2).alias("at_value"),
    )


def wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth per event type: weekly totals (exact
    decimal sums), previous week via lag, percent change on the rounded
    weekly figures — the period-over-period trend report every history
    table feeds.

    Scale: one shuffle to (type x week) cells with map-side combine; the
    lag window runs on the tiny aggregated frame, partitioned by type.
    """
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.groupBy(
            "event_type",
            F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("week_start")
    return weekly.select(
        "event_type",
        "week_start",
        "n_events",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        F.round(
            (F.col("revenue") - F.lag("revenue").over(w))
            / F.lag("revenue").over(w) * 100.0,
            4,
        ).alias("growth_pct"),
    )


def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of order totals to [0, 1]:
    q = (rank-1)/(n-1) with deterministic (price, orderkey) ordering — the
    standard heavy-tail-robust feature transform before model training.

    Scale: the global rank reuses the two-pass decomposition
    (equi_depth_histogram): in-bucket row_number partitioned by a fixed
    price-range bucket + broadcast per-bucket cumulative offsets from the
    bucket-cardinality frame. No single-task global window anywhere; the
    oracle runs the naive global row_number, so the hash match proves the
    decomposition.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = o.withColumn(
        "rbkt", F.floor(F.col("o_totalprice") / EQUI_DEPTH_RANGE_BUCKET).cast("long")
    )
    win_in = Window.partitionBy("rbkt").orderBy("o_totalprice", "o_orderkey")
    in_rank = b.withColumn("r_in", F.row_number().over(win_in))
    counts = b.groupBy("rbkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("rbkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("rbkt", "off")
    total = counts.agg(F.sum("cnt").cast("long").alias("n_total"))
    return (
        in_rank.join(F.broadcast(offsets), "rbkt")
        .crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("off") + F.col("r_in")).cast("bigint").alias("rank"),
            F.round(
                (F.col("off") + F.col("r_in") - 1)
                / (F.col("n_total") - 1),
                6,
            ).alias("q_norm"),
        )
    )


CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations among the lineitem numeric columns,
    in long format — the feature-selection screen run before any model
    training. One pass over the fact table computes all 6 pairs at once
    (multi-aggregate, map-side combined); no per-pair rescans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (a, CORR_COLS[j])
        for i, a in enumerate(CORR_COLS)
        for j in range(i + 1, len(CORR_COLS))
    ]
    aggs = [
        F.round(F.corr(a, b), 4).alias(f"{a}__{b}") for a, b in pairs
    ]
    wide = li.agg(F.count(F.lit(1)).cast("bigint").alias("n"), *aggs)
    # unpivot to long format engine-side (stack), keeping n on every row
    stack_expr = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return wide.selectExpr(
        "n",
        f"stack({len(pairs)}, {stack_expr}) AS (col_a, col_b, pearson_r)",
    ).select("col_a", "col_b", "n", "pearson_r")


def feature_matrix_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-learning feature matrix for daily revenue forecasting:
    per (event_type, day) the target y plus lag-1/lag-7 values, 7-day
    trailing mean, day-of-week, and weekend flag — the standard
    windowed feature-engineering pass that feeds a gradient-boosted
    forecaster. Leading rows keep NULL lags (the consumer decides
    whether to drop or impute).

    Scale: one shuffle to (type x day) cells; every feature comes from
    ONE type-partitioned window over the tiny daily frame (shared sort).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")), 2
        ).cast("double").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    w7 = w.rowsBetween(-6, 0)
    dow = F.dayofweek("d").cast("int")
    return daily.select(
        "event_type",
        "d",
        "y",
        F.lag("y", 1).over(w).alias("lag1"),
        F.lag("y", 7).over(w).alias("lag7"),
        F.round(F.avg("y").over(w7), 4).alias("mean7"),
        dow.alias("dow"),
        dow.isin(1, 7).alias("is_weekend"),
    )


TE_SMOOTHING = 20.0  # pseudo-count prior toward the global mean


def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of customer market segment against order
    totals: enc(seg) = (sum_seg + m * global_mean) / (n_seg + m) — the
    leakage-resistant categorical encoder (m pseudo-observations of the
    global mean shrink rare categories).

    Determinism: per-segment and global sums are exact DECIMAL; the
    smoothing arithmetic is written identically on both engines.

    Scale: fact scan -> one broadcast join to the customer dim -> one
    segment-keyed aggregate; the global mean is a 1-row broadcast.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    seg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
    )
    g = seg.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("gmean")
    )
    return (
        seg.crossJoin(F.broadcast(g))
        .select(
            "c_mktsegment",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(F.col("s").cast("double") / F.col("n"), 4).alias("seg_mean"),
            F.round(
                (F.col("s").cast("double") + TE_SMOOTHING * F.col("gmean"))
                / (F.col("n") + TE_SMOOTHING),
                4,
            ).alias("encoded"),
        )
    )


# Poisson(1) inverse-CDF thresholds (cumulative P(X<=k), k=0..4) —
# precomputed in Python, inlined on both engines.
BOOT_B = 32
BOOT_P = 4294967311  # first prime > 2^32 (same family as dedup's minhash)
BOOT_AC = [
    (
        ((1103515245 * (b + 77) + 12345) % 2147483647) | 1,
        (69069 * (b + 77) + 1234567) % 2147483647,
    )
    for b in range(BOOT_B)
]
_POIS = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
         0.9810118431238462, 0.9963401531726563]


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value: each of
    BOOT_B resamples weights every row by a deterministic hash-derived
    Poisson(1) draw (the streaming-friendly bootstrap — no global
    resampling pass, weights are computed row-locally), then the CI comes
    from the p05/p95 of the B resample means.

    Scale: the fan-out is B weights per row computed INSIDE the per-row
    projection (no explode of the fact table — the aggregate combines
    B partial sums per partition); the quantile runs on a B-row frame.
    """
    from ..sources.tables import fan_out

    # the per-row work (B case-chains) dwarfs the scan; spread the
    # single-file scan before it (fan_out no-ops at real scale)
    o = fan_out(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey",
        "o_totalprice",
        # ONE md5 per row; the B uniform draws come from a universal hash
        # family over it (the minhash trick — B md5 calls measured ~6x
        # slower end-to-end): u_b = ((a_b*h + c_b) mod P) / P, exact
        # 64-bit integer arithmetic on both engines
        md5_hash_long(F.col("o_orderkey").cast("string")).alias("h"),
    )
    aggs = []
    for b in range(BOOT_B):
        a_b, c_b = BOOT_AC[b]
        u = ((F.col("h") * a_b + c_b) % BOOT_P) / F.lit(float(BOOT_P))
        w = (
            F.when(u < _POIS[0], 0)
            .when(u < _POIS[1], 1)
            .when(u < _POIS[2], 2)
            .when(u < _POIS[3], 3)
            .when(u < _POIS[4], 4)
            .otherwise(5)
        )
        aggs.append(
            (
                (F.sum(w * F.col("cents")).cast("double") / 100.0)
                / F.sum(w).cast("double")
            ).alias(f"m{b}")
        )
    # exact integer cents: the 32 resample sums are plain LONG aggregates
    # (a decimal(28,2) sum per resample measured ~3x slower end-to-end)
    o = o.withColumn(
        "cents", F.round(F.col("o_totalprice") * 100.0).cast("long")
    )
    wide = o.agg(*aggs)
    stack = ", ".join(f"{b}, m{b}" for b in range(BOOT_B))
    means = wide.selectExpr(
        f"stack({BOOT_B}, {stack}) AS (b, m)"
    ).select(F.col("m").cast("double").alias("m"))
    return means.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_resamples"),
        F.round(F.avg("m"), 4).alias("boot_mean"),
        F.round(F.expr("percentile(m, 0.05)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.95)"), 4).alias("ci_hi"),
    )


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all pairwise
    slopes of the daily-revenue series — up to ~29% outlier days cannot
    move it, unlike trend_fit's OLS slope (its complement, same series).

    Scale: pairwise slopes are a self-join of the (type x day) frame —
    quadratic in DAYS, not rows: the day frame is bounded by the
    observation window (~30 rows/type here; a year is 365), so the pair
    frame stays thousands of rows regardless of corpus size. The median
    uses the exact percentile aggregate on that tiny frame.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")), 2
        ).cast("double").alias("y")
    ).withColumn("t", F.datediff(F.col("d"), F.lit("2024-01-01")).cast("double"))
    a = daily.select("event_type", F.col("t").alias("t1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("t").alias("t2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("t2") > F.col("t1"))
        .select(
            "event_type",
            ((F.col("y2") - F.col("y1")) / (F.col("t2") - F.col("t1"))).alias(
                "slope"
            ),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 4).alias("ts_slope"),
        F.round(F.expr("percentile(slope, 0.25)"), 4).alias("slope_q1"),
        F.round(F.expr("percentile(slope, 0.75)"), 4).alias("slope_q3"),
    )


ROLLCORR_PAIR = ("purchase", "click")


def rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between the purchase and click
    daily-revenue series — the co-movement monitor that catches a channel
    decoupling (ads still clicking, purchases gone) days before either
    univariate monitor fires.

    Scale: the log reduces to one row per day (two conditional decimal
    sums); the corr window runs on that day-cardinality frame (bounded by
    the observation window — the tiny-frame global window pattern).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        *[
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == t,
                        F.col("value").cast("decimal(18,4)"),
                    )
                ),
                2,
            ).cast("double").alias(f"rev_{t}")
            for t in ROLLCORR_PAIR
        ]
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    c1, c2 = (f"rev_{t}" for t in ROLLCORR_PAIR)
    return daily.select(
        "d",
        c1,
        c2,
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_window"),
        F.round(F.corr(c1, c2).over(w), 4).alias("corr7"),
    )


ACF_LAGS = (1, 2, 3)


def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3) of each event type's daily
    revenue series — the seasonality/memory diagnostic that tells a
    forecaster (holt_forecast) whether yesterday predicts today:
    r_k = Σ(y_t-ȳ)(y_{t-k}-ȳ) / Σ(y_t-ȳ)².

    Scale: the log reduces to (type x day) cells once; the mean is a
    type-cardinality broadcast; lags come from one per-type window over
    the tiny daily frame; one final per-type aggregate. The raw event log
    is scanned exactly once.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
            ).cast("double").alias("y")
        )
    )
    means = daily.groupBy("event_type").agg(
        F.avg("y").alias("ybar"), F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.join(F.broadcast(means), "event_type").select(
        "event_type",
        "n_days",
        (F.col("y") - F.col("ybar")).alias("dy"),
        *[
            (F.lag("y", k).over(w) - F.col("ybar")).alias(f"dy{k}")
            for k in ACF_LAGS
        ],
    )
    return lagged.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        *[
            F.round(
                F.sum(F.col("dy") * F.col(f"dy{k}")) / F.sum(F.col("dy") * F.col("dy")),
                4,
            ).alias(f"acf{k}")
            for k in ACF_LAGS
        ],
    )


# Benford first-digit expectations, precomputed in Python and inlined as
# literals on BOTH engines so no libm log10 ever runs engine-side.
import math as _math  # noqa: E402

BENFORD = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic bulk data-quality / fabrication screen. Digit
    extraction goes through an exact DECIMAL(18,2) string (prices are
    always >= 1), never floating log10, so both engines bin identically.

    Scale: one map-side-combined aggregate to 9 digit cells; the share
    normalizer is a broadcast scalar.
    """
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    cells = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cells.agg(F.sum("n").cast("double").alias("tot"))
    expected = F.create_map(
        *[x for d, p in BENFORD.items() for x in (F.lit(d), F.lit(p))]
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("obs_share"),
            F.round(expected[F.col("digit")], 6).alias("benford_share"),
            F.round(
                F.col("n") / F.col("tot") - expected[F.col("digit")], 6
            ).alias("deviation"),
        )
    )


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "time_range_moving_avg": time_range_moving_avg,
    "locf_fill": locf_fill,
    "price_histogram": price_histogram,
    "time_rollup": time_rollup,
    "pareto_frontier": pareto_frontier,
    "activity_streaks": activity_streaks,
    "peak_concurrency": peak_concurrency,
    "data_quality_checks": data_quality_checks,
    "ewma_user_value": ewma_user_value,
    "anomaly_days": anomaly_days,
    "equi_depth_histogram": equi_depth_histogram,
    "interarrival_gaps": interarrival_gaps,
    "revenue_gini": revenue_gini,
    "trend_fit": trend_fit,
    "mutual_information": mutual_information,
    "winsorized_stats": winsorized_stats,
    "k_anonymity": k_anonymity,
    "seasonality_strength": seasonality_strength,
    "cusum_changepoint": cusum_changepoint,
    "chi2_drift": chi2_drift,
    "funnel_windowed": funnel_windowed,
    "robust_mad_outliers": robust_mad_outliers,
    "ks_drift": ks_drift,
    "wow_growth": wow_growth,
    "holt_forecast": holt_forecast,
    "acf_daily_revenue": acf_daily_revenue,
    "benford_deviation": benford_deviation,
    "quantile_normalize": quantile_normalize,
    "correlation_matrix": correlation_matrix,
    "feature_matrix_daily": feature_matrix_daily,
    "target_encoding": target_encoding,
    "bootstrap_mean_ci": bootstrap_mean_ci,
    "theil_sen_trend": theil_sen_trend,
    "rolling_correlation": rolling_correlation,
}

def _ewma_oracle() -> str:
    num, den = "0.0", "0.0"
    for j in range(EWMA_K):
        wj = repr((1.0 - EWMA_ALPHA) ** j)
        lj = f"lag(value, {j}) OVER w"
        num = f"({num} + coalesce({lj} * {wj}, 0.0))"
        den = f"({den} + CASE WHEN {lj} IS NOT NULL THEN {wj} ELSE 0.0 END)"
    return f"""
        SELECT user_id, event_id,
               round(value, 4) AS value,
               round({num} / {den}, 4) AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
    """


ORACLES = {
    "funnel_windowed": _FUNNEL_WINDOWED_ORACLE,
    "chi2_drift": f"""
        WITH cells AS (
            SELECT event_type,
                   CASE WHEN ts > TIMESTAMP '{CHI2_SPLIT_TS}'
                        THEN 1 ELSE 0 END AS period,
                   CAST(count(*) AS DOUBLE) AS n
            FROM events GROUP BY 1, 2
        ),
        row_m AS (SELECT event_type, sum(n) AS rt FROM cells GROUP BY 1),
        col_m AS (SELECT period, sum(n) AS ct FROM cells GROUP BY 1),
        grand AS (SELECT sum(n) AS g FROM cells),
        contrib AS (
            SELECT c.event_type, c.period, c.n,
                   (c.n - r.rt * m.ct / g.g) * (c.n - r.rt * m.ct / g.g)
                       / (r.rt * m.ct / g.g) AS x2
            FROM cells c
            JOIN row_m r USING (event_type)
            JOIN col_m m USING (period)
            CROSS JOIN grand g
        )
        SELECT event_type,
               CAST(sum(CASE WHEN period = 0 THEN n END) AS BIGINT)
                   AS n_before,
               CAST(sum(CASE WHEN period = 1 THEN n END) AS BIGINT)
                   AS n_after,
               round(sum(x2), 6) AS chi2_part
        FROM contrib GROUP BY 1
        UNION ALL
        SELECT '__all__',
               CAST(sum(CASE WHEN period = 0 THEN n END) AS BIGINT),
               CAST(sum(CASE WHEN period = 1 THEN n END) AS BIGINT),
               round(sum(x2), 6)
        FROM contrib
    """,
    "k_anonymity": f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / {KANON_BAL_BUCKET}) AS BIGINT)
                       AS bal_b,
                   count(*) AS sz
            FROM customer GROUP BY 1, 2, 3
        )
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(sz) AS BIGINT) AS n_rows,
               CAST(min(sz) AS BIGINT) AS k_min,
               CAST(sum(CASE WHEN sz < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_small_classes,
               CAST(sum(CASE WHEN sz < {KANON_K} THEN sz ELSE 0 END) AS BIGINT)
                   AS n_rows_at_risk
        FROM classes GROUP BY 1
    """,
    "seasonality_strength": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(count(*) AS DOUBLE) AS cnt
            FROM events GROUP BY 1, 2
        ),
        dw AS (SELECT event_type, d, cnt, dayofweek(d) AS dow FROM daily),
        prof AS (
            SELECT event_type, dow, avg(cnt) AS dow_mean
            FROM dw GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(var_pop(cnt), 4) AS var_daily,
               round(1 - var_pop(cnt - dow_mean) / var_pop(cnt), 6) AS strength
        FROM dw JOIN prof USING (event_type, dow)
        GROUP BY 1
    """,
    "cusum_changepoint": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(count(*) AS DOUBLE) AS cnt
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type, avg(cnt) AS mu,
                   CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        ),
        cs AS (
            SELECT d.event_type, d.d, m.n_days,
                   sum(d.cnt - m.mu)
                       OVER (PARTITION BY d.event_type ORDER BY d.d
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cusum
            FROM daily d JOIN m USING (event_type)
        )
        SELECT event_type, d AS changepoint_day,
               round(abs(cusum), 4) AS max_abs_cusum, n_days
        FROM (SELECT *, row_number()
                     OVER (PARTITION BY event_type
                           ORDER BY abs(cusum) DESC, d ASC) AS r
              FROM cs)
        WHERE r = 1
    """,
    "trend_fit": f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '{TREND_EPOCH}',
                             CAST(ts AS DATE)) AS day_x,
                   CAST(count(*) AS DOUBLE) AS y_cnt,
                   avg(value) AS y_val
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(regr_slope(y_cnt, CAST(day_x AS DOUBLE)), 6) AS cnt_slope,
               round(regr_intercept(y_cnt, CAST(day_x AS DOUBLE)), 6)
                   AS cnt_intercept,
               round(regr_r2(y_cnt, CAST(day_x AS DOUBLE)), 6) AS cnt_r2,
               round(regr_slope(y_val, CAST(day_x AS DOUBLE)), 6) AS val_slope
        FROM daily GROUP BY 1
    """,
    "mutual_information": f"""
        WITH joint AS (
            SELECT event_type, hour(ts) // {MI_HOUR_BUCKET} AS band,
                   CAST(count(*) AS DOUBLE) AS nxy
            FROM events GROUP BY 1, 2
        ),
        marg_x AS (SELECT event_type, sum(nxy) AS nx FROM joint GROUP BY 1),
        marg_y AS (SELECT band, sum(nxy) AS ny FROM joint GROUP BY 1),
        tot AS (SELECT sum(nxy) AS n FROM joint),
        cells AS (
            SELECT j.event_type,
                   (nxy / n) * log2(nxy * n / (nx * ny)) AS mi_term,
                   nxy / n AS pxy
            FROM joint j
            JOIN marg_x USING (event_type)
            JOIN marg_y USING (band)
            CROSS JOIN tot
        )
        SELECT event_type, round(sum(mi_term), 6) AS mi_bits,
               round(sum(pxy), 6) AS p_x
        FROM cells GROUP BY 1
        UNION ALL
        SELECT '__all__', round(sum(mi_term), 6), round(sum(pxy), 6)
        FROM cells
    """,
    "winsorized_stats": f"""
        WITH b AS (
            SELECT event_type,
                   round(quantile_cont(value, {WINSOR_LO}), 6) AS p05,
                   round(quantile_cont(value, {WINSOR_HI}), 6) AS p95
            FROM events GROUP BY 1
        )
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               min(p05) AS p05,
               min(p95) AS p95,
               round(avg(least(greatest(value, p05), p95)), 6) AS winsor_mean,
               round(stddev(least(greatest(value, p05), p95)), 6) AS winsor_std,
               CAST(sum(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_lo,
               CAST(sum(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_hi
        FROM events e JOIN b USING (event_type)
        GROUP BY 1
    """,
    "revenue_gini": """
        WITH rev AS (
            SELECT c.c_mktsegment, c.c_custkey,
                   round(sum(o.o_totalprice), 2) AS rev
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT c_mktsegment, rev,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY rev, c_custkey) AS rk
            FROM rev
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(rev), 2) AS total_revenue,
               round(2.0 * sum(rk * rev) / (count(*) * round(sum(rev), 2))
                     - (count(*) + 1.0) / count(*), 6) AS gini
        FROM ranked
        GROUP BY c_mktsegment
    """,
    "interarrival_gaps": """
        WITH g AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                         PARTITION BY event_type, user_id
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
                       AS gap_s
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               round(quantile_cont(gap_s, 0.5), 2) AS p50_s,
               round(quantile_cont(gap_s, 0.9), 2) AS p90_s,
               round(quantile_cont(gap_s, 0.99), 2) AS p99_s,
               round(avg(gap_s), 2) AS mean_s
        FROM g WHERE gap_s IS NOT NULL
        GROUP BY event_type
    """,
    "equi_depth_histogram": f"""
        WITH b AS (
            SELECT o_totalprice,
                   ntile({EQUI_DEPTH_BUCKETS}) OVER (
                       ORDER BY o_totalprice, o_orderkey) AS bucket
            FROM orders
        )
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM b GROUP BY bucket
    """,
    "anomaly_days": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day,
               CAST(n_events AS BIGINT) AS n_events,
               round((n_events - avg(n_events) OVER w)
                     / stddev_samp(n_events) OVER w, 4) AS z_score,
               abs((n_events - avg(n_events) OVER w)
                   / stddev_samp(n_events) OVER w) >= {ANOMALY_Z}
                   AS is_anomaly
        FROM daily
        WINDOW w AS (PARTITION BY event_type)
    """,
    "ewma_user_value": _ewma_oracle(),
    "data_quality_checks": """
        WITH li AS (
            SELECT count(l_quantity) * 1.0 / count(*) AS qty_complete,
                   avg(CASE WHEN l_discount BETWEEN 0.0 AND 0.1
                            THEN 1.0 ELSE 0.0 END) AS discount_in_bounds,
                   avg(CASE WHEN l_extendedprice > 0
                            THEN 1.0 ELSE 0.0 END) AS price_positive
            FROM lineitem
        ),
        o AS (
            SELECT count(DISTINCT o_orderkey) * 1.0 / count(*) AS key_unique,
                   count(o_orderdate) * 1.0 / count(*) AS date_complete
            FROM orders
        ),
        ref AS (
            SELECT 1.0 - (SELECT count(*) * 1.0 FROM orders
                          WHERE o_custkey NOT IN
                                (SELECT c_custkey FROM customer))
                       / (SELECT count(*) * 1.0 FROM orders) AS ref_ok
        )
        SELECT 'lineitem.l_quantity.completeness' AS check_name,
               round(qty_complete, 6) AS metric, qty_complete >= 1.0 AS passed
        FROM li
        UNION ALL
        SELECT 'lineitem.l_discount.in_bounds',
               round(discount_in_bounds, 6), discount_in_bounds >= 1.0 FROM li
        UNION ALL
        SELECT 'lineitem.l_extendedprice.positive',
               round(price_positive, 6), price_positive >= 1.0 FROM li
        UNION ALL
        SELECT 'orders.o_orderkey.unique',
               round(key_unique, 6), key_unique >= 1.0 FROM o
        UNION ALL
        SELECT 'orders.o_orderdate.completeness',
               round(date_complete, 6), date_complete >= 1.0 FROM o
        UNION ALL
        SELECT 'orders.o_custkey.ref_customer',
               round(ref_ok, 6), ref_ok >= 1.0 FROM ref
    """,
    "pareto_frontier": """
        SELECT a.p_partkey, a.p_retailprice, a.p_size
        FROM part a
        WHERE NOT EXISTS (
            SELECT 1 FROM part b
            WHERE b.p_retailprice <= a.p_retailprice
              AND b.p_size >= a.p_size
              AND (b.p_retailprice < a.p_retailprice
                   OR b.p_size > a.p_size)
        )
    """,
    "activity_streaks": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        isl AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INT)
                       AS anchor
            FROM days
        ),
        streaks AS (
            SELECT user_id, anchor, count(*) AS streak_days,
                   min(day) AS streak_start, max(day) AS streak_end
            FROM isl GROUP BY user_id, anchor
        )
        SELECT user_id, streak_days, streak_start, streak_end
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY streak_days DESC,
                                                    streak_start ASC) AS rk
              FROM streaks)
        WHERE rk = 1
    """,
    "peak_concurrency": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w
                             > {SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS sess_id
            FROM flagged
        ),
        sessions AS (
            SELECT user_id, sess_id,
                   min(ts) AS sess_start, max(ts) AS sess_end
            FROM sess GROUP BY user_id, sess_id
        ),
        pts AS (
            SELECT sess_start AS t, 1 AS d FROM sessions
            UNION ALL
            SELECT sess_end AS t, 0 AS d FROM sessions
        ),
        per_t AS (
            SELECT t, CAST(sum(d) AS BIGINT) AS n_starts,
                   CAST(sum(1 - d) AS BIGINT) AS n_ends
            FROM pts GROUP BY t
        ),
        act AS (
            SELECT t,
                   sum(n_starts) OVER (ORDER BY t
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
                   - coalesce(sum(n_ends) OVER (ORDER BY t
                                                ROWS BETWEEN UNBOUNDED
                                                PRECEDING AND 1 PRECEDING),
                              0) AS active
            FROM per_t
        )
        SELECT CAST((SELECT max(active) FROM act) AS BIGINT)
                   AS peak_concurrency,
               (SELECT min(t) FROM act
                WHERE active = (SELECT max(active) FROM act)) AS t_at_peak,
               (SELECT count(*) FROM sessions) AS n_sessions
    """,
    "funnel_conversion": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s1) AS n_signup,
               (SELECT count(*) FROM s2) AS n_click_after,
               (SELECT count(*) FROM s3) AS n_purchase_after
    """,
    "retention_cohorts": """
        WITH first_seen AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
            FROM events
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT)
                   AS weeks_since,
               count(*) AS n_active_users
        FROM activity JOIN first_seen USING (user_id)
        GROUP BY cohort_week, weeks_since
    """,
    "time_range_moving_avg": """
        SELECT user_id, event_id,
               round(avg(value) OVER w, 4) AS trailing_1h_avg,
               count(*) OVER w AS n_in_window
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                                   AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "locf_fill": """
        SELECT user_id, event_id, event_type,
               round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                                IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     4) AS last_purchase_value
        FROM events
    """,
    "price_histogram": f"""
        WITH per_bin AS (
            SELECT CAST(floor(o_totalprice / {HIST_BIN}) AS BIGINT) AS bin,
                   count(*) AS n_orders
            FROM orders GROUP BY 1)
        SELECT bin, bin * {HIST_BIN} AS bin_low, n_orders,
               round(n_orders / (SELECT CAST(sum(n_orders) AS DOUBLE) FROM per_bin),
                     4) AS share
        FROM per_bin
        ORDER BY bin
    """,
    "time_rollup": """
        SELECT CAST(year(ts) AS BIGINT) AS y,
               CAST(month(ts) AS BIGINT) AS m,
               CAST(day(ts) AS BIGINT) AS d,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY ROLLUP (y, m, d)
    """,
}

ORACLES["robust_mad_outliers"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS DOUBLE) AS cnt
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, quantile_cont(cnt, 0.5) AS med,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ),
    dev AS (
        SELECT d.event_type, abs(d.cnt - m.med) AS adev, m.med, m.n_days
        FROM daily d JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           max(d.n_days) AS n_days,
           round(max(d.med), 2) AS median_daily,
           round(max(m.mad), 2) AS mad,
           CAST(sum(CASE WHEN d.adev > {MAD_K} * {MAD_SCALE} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(d.adev), 2) AS max_abs_dev
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
"""

ORACLES["ks_drift"] = f"""
    WITH cells AS (
        SELECT value,
               CAST(sum(CASE WHEN ts <= TIMESTAMP '{CHI2_SPLIT_TS}'
                             THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
               CAST(sum(CASE WHEN ts > TIMESTAMP '{CHI2_SPLIT_TS}'
                             THEN 1 ELSE 0 END) AS DOUBLE) AS n2
        FROM events WHERE event_type = 'purchase' GROUP BY value
    ),
    tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM cells),
    cum AS (
        SELECT value,
               sum(n1) OVER (ORDER BY value
                             ROWS UNBOUNDED PRECEDING) AS c1,
               sum(n2) OVER (ORDER BY value
                             ROWS UNBOUNDED PRECEDING) AS c2
        FROM cells
    ),
    d AS (
        SELECT value, abs(c1 / t.t1 - c2 / t.t2) AS d
        FROM cum CROSS JOIN tot t
    )
    SELECT CAST(t.t1 AS BIGINT) AS n_before,
           CAST(t.t2 AS BIGINT) AS n_after,
           round((SELECT max(d) FROM d), 6) AS ks_stat,
           round((SELECT min(value) FROM d
                  WHERE d = (SELECT max(d) FROM d)), 2) AS at_value
    FROM tot t
"""

ORACLES["wow_growth"] = """
    WITH weekly AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS DATE) AS week_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_start, n_events, revenue,
           lag(revenue) OVER w AS prev_revenue,
           round((revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w * 100.0, 4) AS growth_pct
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week_start)
"""

ORACLES["holt_forecast"] = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    rec(event_type, rn, l, t) AS (
        SELECT i.event_type, 1, i.y,
               coalesce(i2.y - i.y, 0.0)
        FROM idx i LEFT JOIN idx i2
            ON i2.event_type = i.event_type AND i2.rn = 2
        WHERE i.rn = 1
        UNION ALL
        SELECT r.event_type, i.rn,
               {HOLT_ALPHA} * i.y + (1.0 - {HOLT_ALPHA}) * (r.l + r.t),
               {HOLT_BETA} * (({HOLT_ALPHA} * i.y
                               + (1.0 - {HOLT_ALPHA}) * (r.l + r.t)) - r.l)
               + (1.0 - {HOLT_BETA}) * r.t
        FROM rec r JOIN idx i
            ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT r.event_type,
           CAST(r.rn AS BIGINT) AS n_days,
           round(r.l, 4) AS level,
           round(r.t, 4) AS trend,
           round(r.l + {HOLT_HORIZON} * r.t, 4) AS forecast
    FROM rec r
    JOIN (SELECT event_type, max(rn) AS mr FROM rec GROUP BY 1) m
        ON r.event_type = m.event_type AND r.rn = m.mr
"""

ORACLES["acf_daily_revenue"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS y
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, avg(y) AS ybar,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ),
    lagged AS (
        SELECT d.event_type, m.n_days,
               d.y - m.ybar AS dy,
               lag(d.y, 1) OVER w - m.ybar AS dy1,
               lag(d.y, 2) OVER w - m.ybar AS dy2,
               lag(d.y, 3) OVER w - m.ybar AS dy3
        FROM daily d JOIN m USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.d)
    )
    SELECT event_type, max(n_days) AS n_days,
           round(sum(dy * dy1) / sum(dy * dy), 4) AS acf1,
           round(sum(dy * dy2) / sum(dy * dy), 4) AS acf2,
           round(sum(dy * dy3) / sum(dy * dy), 4) AS acf3
    FROM lagged GROUP BY 1
"""

_BENFORD_MAP = " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in BENFORD.items()
)

ORACLES["benford_deviation"] = f"""
    WITH cells AS (
        SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM cells)
    SELECT digit, n,
           round(n / t.tot, 6) AS obs_share,
           round(CAST(CASE digit {_BENFORD_MAP} END AS DOUBLE), 6)
               AS benford_share,
           round(n / t.tot - CASE digit {_BENFORD_MAP} END, 6) AS deviation
    FROM cells CROSS JOIN tot t
"""

ORACLES["quantile_normalize"] = """
    WITH r AS (
        SELECT o_orderkey, o_totalprice,
               CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                    AS BIGINT) AS rank,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM orders
    )
    SELECT o_orderkey, o_totalprice, rank,
           round((rank - 1) * 1.0 / (n - 1), 6) AS q_norm
    FROM r
"""

_CORR_PAIRS_SQL = " UNION ALL ".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, {a}__{b} AS pearson_r FROM w"
    for i, a in enumerate(CORR_COLS)
    for b in CORR_COLS[i + 1:]
)
_CORR_AGGS_SQL = ", ".join(
    f"round(corr({a}, {b}), 4) AS {a}__{b}"
    for i, a in enumerate(CORR_COLS)
    for b in CORR_COLS[i + 1:]
)

ORACLES["correlation_matrix"] = f"""
    WITH w AS (
        SELECT CAST(count(*) AS BIGINT) AS n, {_CORR_AGGS_SQL}
        FROM lineitem
    )
    {_CORR_PAIRS_SQL}
"""

ORACLES["feature_matrix_daily"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS y
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, y,
           lag(y, 1) OVER w AS lag1,
           lag(y, 7) OVER w AS lag7,
           round(avg(y) OVER (PARTITION BY event_type ORDER BY d
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 4) AS mean7,
           CAST(dayofweek(d) + 1 AS INTEGER) AS dow,
           (dayofweek(d) + 1) IN (1, 7) AS is_weekend
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d)
"""

ORACLES["target_encoding"] = f"""
    WITH j AS (
        SELECT c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg AS (
        SELECT c_mktsegment,
               CAST(count(*) AS DOUBLE) AS n,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
        FROM j GROUP BY 1
    ),
    g AS (SELECT CAST(sum(s) AS DOUBLE) / sum(n) AS gmean FROM seg)
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS n_orders,
           round(CAST(s AS DOUBLE) / n, 4) AS seg_mean,
           round((CAST(s AS DOUBLE) + {TE_SMOOTHING} * g.gmean)
                 / (n + {TE_SMOOTHING}), 4) AS encoded
    FROM seg CROSS JOIN g
"""


def _boot_oracle() -> str:
    cols = []
    for b in range(BOOT_B):
        a_b, c_b = BOOT_AC[b]
        u = (
            f"((CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) "
            f"AS BIGINT) * {a_b} + {c_b}) % {BOOT_P}) / {BOOT_P}.0"
        )
        w = (
            f"CASE WHEN {u} < {_POIS[0]!r} THEN 0"
            f" WHEN {u} < {_POIS[1]!r} THEN 1"
            f" WHEN {u} < {_POIS[2]!r} THEN 2"
            f" WHEN {u} < {_POIS[3]!r} THEN 3"
            f" WHEN {u} < {_POIS[4]!r} THEN 4 ELSE 5 END"
        )
        cols.append(
            f"(CAST(sum(({w}) * CAST(round(o_totalprice * 100.0) AS BIGINT))"
            f" AS DOUBLE) / 100.0)"
            f" / CAST(sum({w}) AS DOUBLE) AS m{b}"
        )
    sel = ", ".join(cols)
    un = " UNION ALL ".join(
        f"SELECT CAST(m{b} AS DOUBLE) AS m FROM wide" for b in range(BOOT_B)
    )
    return f"""
    WITH wide AS (SELECT {sel} FROM orders),
    means AS ({un})
    SELECT CAST(count(*) AS BIGINT) AS n_resamples,
           round(avg(m), 4) AS boot_mean,
           round(quantile_cont(m, 0.05), 4) AS ci_lo,
           round(quantile_cont(m, 0.95), 4) AS ci_hi
    FROM means
"""


ORACLES["bootstrap_mean_ci"] = _boot_oracle()

ORACLES["theil_sen_trend"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS y,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS DOUBLE) AS t
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type, (b.y - a.y) / (b.t - a.t) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.t > a.t
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 4) AS ts_slope,
           round(quantile_cont(slope, 0.25), 4) AS slope_q1,
           round(quantile_cont(slope, 0.75), 4) AS slope_q3
    FROM slopes GROUP BY 1
"""

ORACLES["rolling_correlation"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(round(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE)
                   AS rev_purchase,
               CAST(round(sum(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(18,4)) END), 2) AS DOUBLE)
                   AS rev_click
        FROM events GROUP BY 1
    )
    SELECT d, rev_purchase, rev_click,
           CAST(count(*) OVER w AS BIGINT) AS n_window,
           round(corr(rev_purchase, rev_click) OVER w, 4) AS corr7
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

def burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type over daily counts: the Fano
    factor (var/mean — 1 for a Poisson process, higher = bursty) and the
    Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) in [-1, 1] —
    the capacity-planning signal that says whether daily volume is steady
    or spike-driven.

    Scale: one shuffle to (type x day) counts; moments are a per-type
    aggregate of that tiny frame.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    mu = F.avg("c")
    sd = F.stddev_samp("c")
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(mu, 4).alias("mean_daily"),
        F.round(sd, 4).alias("std_daily"),
        F.round(F.var_samp("c") / mu, 4).alias("fano"),
        F.round((sd - mu) / (sd + mu), 4).alias("burstiness"),
    )


ORACLES["burstiness"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS DOUBLE) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(c), 4) AS mean_daily,
           round(stddev_samp(c), 4) AS std_daily,
           round(var_samp(c) / avg(c), 4) AS fano,
           round((stddev_samp(c) - avg(c)) / (stddev_samp(c) + avg(c)), 4)
               AS burstiness
    FROM daily GROUP BY 1
"""
QUERIES["burstiness"] = burstiness

RFM_R_BUCKET_DAYS = 90.0
RFM_M_BUCKET = 100000.0


def _two_pass_rank(df, bucket, order_cols, out="rk"):
    """Global dense row_number via the bucket decomposition (in-bucket
    row_number + broadcast cumulative offsets) — the no-one-task-window
    rank used across this module. ``bucket`` must be monotone in the
    ``order_cols`` ordering."""
    b = df.withColumn("_b", bucket)
    win_in = Window.partitionBy("_b").orderBy(*order_cols)
    in_rank = b.withColumn("_ri", F.row_number().over(win_in))
    counts = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_b", "_off")
    return (
        in_rank.join(F.broadcast(offsets), "_b")
        .withColumn(out, (F.col("_off") + F.col("_ri")).cast("bigint"))
        .drop("_b", "_ri", "_off")
    )


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer the Recency (days since
    last order), Frequency (order count), Monetary (total spend) plus
    1-5 quintile scores per dimension and the concatenated RFM segment
    code — the classic warehouse segmentation every CRM export wants.

    Scoring rule: rank each dimension best-first with a deterministic
    custkey tiebreak, then score = 6 - ceil(5*rank/n) (pure integer
    arithmetic — no engine-dependent ntile fill semantics).

    Scale: orders collapse to one row per customer (map-side combine);
    the three global ranks use the bucket decomposition (_two_pass_rank)
    — recency bucketed by quarter, frequency by its own (small-integer)
    value, monetary by fixed spend bands — so no window ever sees the
    customer frame in one task.
    """
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("h"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            ).cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_custkey",
            F.datediff(F.col("h"), F.col("last_d")).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    # lineage cuts between the chained rank passes: _two_pass_rank
    # references its input TWICE (in-bucket rank + bucket counts), so the
    # uncut r->f->m chain expanded per_cust 8x (measured r11: 98-Exchange
    # plan); each stage is customer-sized
    per_cust = per_cust.localCheckpoint(eager=True)
    n = per_cust.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = _two_pass_rank(
        per_cust,
        F.floor(F.col("recency_days") / RFM_R_BUCKET_DAYS).cast("long"),
        [F.col("recency_days").asc(), F.col("o_custkey").asc()],
        out="r_rk",
    ).localCheckpoint(eager=True)
    f = _two_pass_rank(
        r,
        (-F.col("frequency")).cast("long"),
        [F.col("frequency").desc(), F.col("o_custkey").asc()],
        out="f_rk",
    ).localCheckpoint(eager=True)
    m = _two_pass_rank(
        f,
        (-F.floor(F.col("monetary") / RFM_M_BUCKET)).cast("long"),
        [F.col("monetary").desc(), F.col("o_custkey").asc()],
        out="m_rk",
    )
    def score(col_name):
        # 6 - ceil(5*rk/n) via exact INTEGER division (DIV == DuckDB //)
        return F.expr(f"CAST(6 - (({col_name} * 5 + n - 1) DIV n) AS INT)")

    return m.crossJoin(F.broadcast(n)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        score("r_rk").alias("r_score"),
        score("f_rk").alias("f_score"),
        score("m_rk").alias("m_score"),
        F.concat(
            score("r_rk").cast("string"),
            score("f_rk").cast("string"),
            score("m_rk").cast("string"),
        ).alias("rfm"),
    )


ORACLES["rfm_segmentation"] = """
    WITH h AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
    per_cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                              (SELECT h FROM h)) AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS monetary
        FROM orders GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_cust),
    ranked AS (
        SELECT p.*,
               row_number() OVER (ORDER BY recency_days ASC, o_custkey ASC)
                   AS r_rk,
               row_number() OVER (ORDER BY frequency DESC, o_custkey ASC)
                   AS f_rk,
               row_number() OVER (ORDER BY monetary DESC, o_custkey ASC)
                   AS m_rk
        FROM per_cust p
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(6 - ((r_rk * 5 + n.n - 1) // n.n) AS INT) AS r_score,
           CAST(6 - ((f_rk * 5 + n.n - 1) // n.n) AS INT) AS f_score,
           CAST(6 - ((m_rk * 5 + n.n - 1) // n.n) AS INT) AS m_score,
           CAST(6 - ((r_rk * 5 + n.n - 1) // n.n) AS VARCHAR)
           || CAST(6 - ((f_rk * 5 + n.n - 1) // n.n) AS VARCHAR)
           || CAST(6 - ((m_rk * 5 + n.n - 1) // n.n) AS VARCHAR) AS rfm
    FROM ranked CROSS JOIN n
"""
QUERIES["rfm_segmentation"] = rfm_segmentation


# --- round-5: privacy, spatial, downsampling ---------------------------------

LDIV_L = 3  # minimum distinct sensitive values per QI class


def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the k-anonymity follow-up (Machanavajjhala et
    al. 2007): a QI class can be k-anonymous yet leak the sensitive
    attribute if all members SHARE it.  Quasi-identifier = (nation,
    acctbal bucket), sensitive attribute = market segment; per nation:
    class count, worst-class diversity, classes below LDIV_L distinct
    segments and the rows they expose.

    Scale: one (QI, sensitive)-keyed count, a re-agg to QI-class
    diversity, a re-agg to nation — three shrinking map-side-combined
    aggregations, no joins or windows (the k_anonymity shape plus one
    level).
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / KANON_BAL_BUCKET).cast("long").alias("bal_b"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).alias("n"))
    classes = cells.groupBy("c_nationkey", "bal_b").agg(
        F.count(F.lit(1)).alias("l_div"),
        F.sum("n").alias("sz"),
    )
    return classes.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("l_div").cast("bigint").alias("min_l"),
        F.sum((F.col("l_div") < LDIV_L).cast("long"))
        .cast("bigint")
        .alias("n_low_diversity"),
        F.sum(F.when(F.col("l_div") < LDIV_L, F.col("sz")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_at_risk"),
    )


ORACLES["l_diversity"] = f"""
    WITH cells AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / {KANON_BAL_BUCKET}) AS BIGINT) AS bal_b,
               c_mktsegment, count(*) AS n
        FROM customer GROUP BY 1, 2, 3
    ),
    classes AS (
        SELECT c_nationkey, bal_b, count(*) AS l_div, sum(n) AS sz
        FROM cells GROUP BY 1, 2
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(l_div) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l_div < {LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_diversity,
           CAST(sum(CASE WHEN l_div < {LDIV_L} THEN sz ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk
    FROM classes GROUP BY 1
"""
QUERIES["l_diversity"] = l_diversity


DP_EPS = 1.0
DP_U_GRID = 100000  # uniform grid for the seeded noise draw


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy counts per (nation, segment) — the
    differential-privacy release shape (sensitivity 1 count query, noise
    scale 1/epsilon), with the noise draw DERIVED from an md5 hash of the
    group key over a {DP_U_GRID}-point uniform grid instead of an RNG.

    Honest caveat (documented contract): seeded noise makes the release
    REPRODUCIBLE — the right property for testing the mechanism's
    plumbing and calibrating utility, and exactly the wrong one for a
    production privacy guarantee (real DP requires fresh secret
    randomness; swap the hash for an RNG draw at release time).  The
    inverse-CDF transform, clipping, and rounding are the production
    arithmetic verified here.

    Scale: one map-side-combined groupBy; the noise is a pure column
    expression over the group key — no second pass, no driver state.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    key = F.concat(
        F.col("c_nationkey").cast("string"), F.lit("|"), F.col("c_mktsegment")
    )
    u = (
        F.pmod(md5_hash_long(key, "dpnoise"), F.lit(DP_U_GRID))
        + F.lit(0.5)
    ) / F.lit(float(DP_U_GRID))
    centered = u - F.lit(0.5)
    lap = (
        -F.lit(1.0 / DP_EPS)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("true_n") + lap, 2).alias("noisy_count"),
        F.lit(DP_EPS).alias("epsilon"),
    )


ORACLES["dp_noisy_counts"] = f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS true_n
        FROM customer GROUP BY 1, 2
    ),
    u AS (
        SELECT *,
               (CAST('0x' || substr(md5('dpnoise' || c_nationkey || '|'
                                        || c_mktsegment), 1, 8) AS BIGINT)
                % {DP_U_GRID} + 0.5) / {float(DP_U_GRID)} AS u
        FROM g
    )
    SELECT c_nationkey, c_mktsegment,
           round(true_n + (-{1.0 / DP_EPS}) * sign(u - 0.5)
                 * ln(1.0 - 2.0 * abs(u - 0.5)), 2) AS noisy_count,
           {DP_EPS} AS epsilon
    FROM u
"""
QUERIES["dp_noisy_counts"] = dp_noisy_counts


LTTB_BUCKETS = 30


def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) of
    the daily-revenue series to LTTB_BUCKETS points — the standard
    shape-preserving decimation for charting long series.  This is the
    PARALLEL variant: each bucket's pick maximizes the triangle area
    against the NEIGHBOR BUCKET AVERAGES (the sequential original anchors
    on the previously selected point — an inherently serial chain;
    anchoring on bucket means is the decomposition that drops into a
    distributed plan, and empirically tracks the sequential pick).  First
    and last points are always kept, per the algorithm.

    Determinism: x is the integer epoch day, y the 2-rounded daily sum;
    bucket means round to 6 before the area arithmetic, so both engines
    feed IDENTICAL doubles into the argmax — no cross-engine ULP flips.

    Scale: daily rollup is the only data-sized aggregation; everything
    after runs on the day-cardinality frame (bounded by the calendar, the
    documented theil_sen-class exception), with bucket ids from one
    global row_number and the argmax inside the bucket-keyed groupBy.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    n = daily.count()
    w = Window.orderBy("d")
    pts = daily.withColumn("rn", F.row_number().over(w)).select(
        "d",
        "rev",
        # integer floor-div: DuckDB CAST(double AS BIGINT) ROUNDS, so both
        # sides must floor explicitly
        F.floor((F.col("rn") - 1) * LTTB_BUCKETS / F.lit(n))
        .cast("long")
        .alias("b"),
        F.unix_date(F.col("d")).cast("double").alias("x"),
        F.col("rev").cast("double").alias("y"),
        F.col("rn"),
    )
    means = pts.groupBy("b").agg(
        F.round(F.avg("x"), 6).alias("mx"), F.round(F.avg("y"), 6).alias("my")
    )
    wb = Window.orderBy("b")
    ctx = means.select(
        "b",
        F.lag("mx").over(wb).alias("px"),
        F.lag("my").over(wb).alias("py"),
        F.lead("mx").over(wb).alias("nx"),
        F.lead("my").over(wb).alias("ny"),
    )
    area = F.abs(
        (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
        - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
    )
    inner = (
        pts.join(F.broadcast(ctx), "b")
        .filter((F.col("b") > 0) & (F.col("b") < LTTB_BUCKETS - 1))
        .withColumn("area", area)
        .groupBy("b")
        .agg(
            F.min_by(
                F.struct(F.col("d"), F.col("rev")),
                F.struct((-F.col("area")).alias("na"), F.col("d")),
            ).alias("m")
        )
        .select("b", F.col("m.d").alias("d"), F.col("m.rev").alias("rev"))
    )
    first = pts.filter(F.col("rn") == 1).select("b", "d", "rev")
    last = pts.filter(F.col("rn") == n).select("b", "d", "rev")
    return (
        first.unionByName(inner)
        .unionByName(last)
        .select(
            F.col("b").cast("int").alias("bucket"),
            F.col("d").alias("day"),
            F.col("rev").alias("revenue"),
        )
    )


ORACLES["lttb_downsample"] = f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    ),
    n AS (SELECT count(*) AS n FROM daily),
    pts AS (
        SELECT d, rev,
               CAST(floor((row_number() OVER (ORDER BY d) - 1)
                    * {LTTB_BUCKETS} / n.n) AS BIGINT) AS b,
               CAST(datediff('day', DATE '1970-01-01', d) AS DOUBLE) AS x,
               CAST(rev AS DOUBLE) AS y,
               row_number() OVER (ORDER BY d) AS rn
        FROM daily CROSS JOIN n
    ),
    means AS (
        SELECT b, round(avg(x), 6) AS mx, round(avg(y), 6) AS my
        FROM pts GROUP BY b
    ),
    ctx AS (
        SELECT b,
               lag(mx) OVER (ORDER BY b) AS px,
               lag(my) OVER (ORDER BY b) AS py,
               lead(mx) OVER (ORDER BY b) AS nx,
               lead(my) OVER (ORDER BY b) AS ny
        FROM means
    ),
    inner_pick AS (
        SELECT b, d, rev FROM (
            SELECT p.b, p.d, p.rev,
                   row_number() OVER (
                       PARTITION BY p.b
                       ORDER BY abs((c.px - c.nx) * (p.y - c.py)
                                    - (c.px - p.x) * (c.ny - c.py)) DESC,
                                p.d ASC) AS rk
            FROM pts p JOIN ctx c ON p.b = c.b
            WHERE p.b > 0 AND p.b < {LTTB_BUCKETS} - 1)
        WHERE rk = 1
    ),
    ends AS (
        SELECT b, d, rev FROM pts, n WHERE rn = 1 OR rn = n.n
    )
    SELECT CAST(b AS INT) AS bucket, d AS day, rev AS revenue
    FROM (SELECT * FROM ends UNION ALL SELECT * FROM inner_pick)
"""
QUERIES["lttb_downsample"] = lttb_downsample


GEO_RADIUS_KM = 50.0
GEO_CELL_DEG = 0.5   # >= RADIUS/111.045 km-per-degree: all pairs in 3x3
GEO_EARTH_KM = 6371.0
GEO_COORD_GRID = 10000  # 1e-4-degree synthetic coordinate grid


def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join: customer pairs within GEO_RADIUS_KM kilometers
    by haversine distance, WITHOUT a cross join — each point lands in a
    GEO_CELL_DEG grid cell; the probe side explodes to its 3x3 cell
    neighborhood and pairs come from a plain equi-join on the cell id
    (the cell width exceeds the radius in degrees, so no qualifying pair
    can escape the neighborhood).  The standard geospatial blocking that
    replaces KNN cross products at scale; the haversine verify runs on
    candidates only.

    Coordinates are SYNTHESIZED deterministically from the customer key
    (md5 -> 1e-4-degree grid, lat in [-60, 60), lon in [-180, 180)) —
    the engine-portable stand-in for a real location column, replicated
    exactly in the oracle.

    Each unordered pair is generated at most once: the build side keeps
    its single true cell, the probe visits each neighbor cell once, and
    the key inequality orients the pair.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    key = F.col("c_custkey").cast("string")
    lat = (
        F.pmod(md5_hash_long(key, "lat"), F.lit(120 * GEO_COORD_GRID))
        / F.lit(float(GEO_COORD_GRID))
        - 60.0
    )
    lon = (
        F.pmod(md5_hash_long(key, "lon"), F.lit(360 * GEO_COORD_GRID))
        / F.lit(float(GEO_COORD_GRID))
        - 180.0
    )
    pts = c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat / GEO_CELL_DEG).cast("long").alias("cy"),
        F.floor(lon / GEO_CELL_DEG).cast("long").alias("cx"),
    )
    probe = pts.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.expr("flatten(transform(sequence(-1, 1), dy -> "
                   "transform(sequence(-1, 1), dx -> "
                   "struct(cy + dy AS cy, cx + dx AS cx))))")
        ).alias("cell"),
    ).select("cust_a", "lat_a", "lon_a", "cell.cy", "cell.cx")
    build = pts.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cy",
        "cx",
    )
    cand = probe.join(build, ["cy", "cx"]).filter(
        F.col("cust_a") < F.col("cust_b")
    )
    la, lb = F.radians("lat_a"), F.radians("lat_b")
    dlat = F.radians(F.col("lat_b") - F.col("lat_a")) / 2
    dlon = F.radians(F.col("lon_b") - F.col("lon_a")) / 2
    h = F.pow(F.sin(dlat), 2) + F.cos(la) * F.cos(lb) * F.pow(F.sin(dlon), 2)
    dist = 2 * GEO_EARTH_KM * F.asin(F.sqrt(h))
    return (
        cand.withColumn("dist_km", F.round(dist, 3))
        .filter(F.col("dist_km") <= GEO_RADIUS_KM)
        .select("cust_a", "cust_b", "dist_km")
    )


ORACLES["geo_grid_join"] = f"""
    WITH pts AS (
        SELECT c_custkey,
               (CAST('0x' || substr(md5('lat' || c_custkey), 1, 8) AS BIGINT)
                % {120 * GEO_COORD_GRID}) / {float(GEO_COORD_GRID)} - 60.0
                   AS lat,
               (CAST('0x' || substr(md5('lon' || c_custkey), 1, 8) AS BIGINT)
                % {360 * GEO_COORD_GRID}) / {float(GEO_COORD_GRID)} - 180.0
                   AS lon
        FROM customer
    ),
    cells AS (
        SELECT *, CAST(floor(lat / {GEO_CELL_DEG}) AS BIGINT) AS cy,
                  CAST(floor(lon / {GEO_CELL_DEG}) AS BIGINT) AS cx
        FROM pts
    ),
    probe AS (
        SELECT c_custkey AS cust_a, lat AS lat_a, lon AS lon_a,
               cy + dy AS cy, cx + dx AS cx
        FROM cells,
             (SELECT unnest([-1, 0, 1]) AS dy),
             (SELECT unnest([-1, 0, 1]) AS dx)
    ),
    cand AS (
        SELECT p.cust_a, p.lat_a, p.lon_a,
               b.c_custkey AS cust_b, b.lat AS lat_b, b.lon AS lon_b
        FROM probe p JOIN cells b ON p.cy = b.cy AND p.cx = b.cx
        WHERE p.cust_a < b.c_custkey
    )
    SELECT cust_a, cust_b,
           round(2 * {GEO_EARTH_KM} * asin(sqrt(
               pow(sin(radians(lat_b - lat_a) / 2), 2)
               + cos(radians(lat_a)) * cos(radians(lat_b))
                 * pow(sin(radians(lon_b - lon_a) / 2), 2))), 3) AS dist_km
    FROM cand
    WHERE round(2 * {GEO_EARTH_KM} * asin(sqrt(
              pow(sin(radians(lat_b - lat_a) / 2), 2)
              + cos(radians(lat_a)) * cos(radians(lat_b))
                * pow(sin(radians(lon_b - lon_a) / 2), 2))), 3)
          <= {GEO_RADIUS_KM}
"""
QUERIES["geo_grid_join"] = geo_grid_join


# --- round-5 wave 2: statistics and operational analytics --------------------


def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test comparing mean order value between
    every pair of customer market segments: t statistic and
    Welch-Satterthwaite degrees of freedom per segment pair — the robust
    two-sample test an experimentation platform defaults to (ab_test_lift
    covers proportions; this covers means).

    Scale: one (segment)-keyed moment aggregation (count/mean/variance
    are mergeable single-pass aggregates), then a broadcast self-join of
    the segment-cardinality frame — fact data is read once.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    m = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("o_totalprice").alias("mean"),
        F.var_samp("o_totalprice").alias("var"),
    )
    a = m.select(
        F.col("c_mktsegment").alias("seg_a"),
        F.col("n").alias("na"),
        F.col("mean").alias("ma"),
        F.col("var").alias("va"),
    )
    b = m.select(
        F.col("c_mktsegment").alias("seg_b"),
        F.col("n").alias("nb"),
        F.col("mean").alias("mb"),
        F.col("var").alias("vb"),
    )
    sa, sb = F.col("va") / F.col("na"), F.col("vb") / F.col("nb")
    t = (F.col("ma") - F.col("mb")) / F.sqrt(sa + sb)
    df = F.pow(sa + sb, 2) / (
        F.pow(sa, 2) / (F.col("na") - 1) + F.pow(sb, 2) / (F.col("nb") - 1)
    )
    return (
        # segment-cardinality sides: broadcast the pairing (BNLJ on a
        # 5-row frame), never a CartesianProduct shuffle
        a.crossJoin(F.broadcast(b))
        .filter(F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.round(F.col("ma") - F.col("mb"), 2).alias("mean_diff"),
            F.round(t, 4).alias("t_stat"),
            F.round(df, 1).alias("welch_df"),
        )
    )


ORACLES["welch_t_test"] = """
    WITH m AS (
        SELECT c_mktsegment,
               CAST(count(*) AS DOUBLE) AS n,
               avg(o_totalprice) AS mean,
               var_samp(o_totalprice) AS var
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    )
    SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.mean - b.mean, 2) AS mean_diff,
           round((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 4) AS t_stat,
           round(pow(a.var / a.n + b.var / b.n, 2)
                 / (pow(a.var / a.n, 2) / (a.n - 1)
                    + pow(b.var / b.n, 2) / (b.n - 1)), 1) AS welch_df
    FROM m a CROSS JOIN m b
    WHERE a.c_mktsegment < b.c_mktsegment
"""
QUERIES["welch_t_test"] = welch_t_test


def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's ``value``
    holds (LOCF) until the user's next event; the average weights each
    reading by its holding duration over the user's observation span —
    the correct aggregate for irregularly-sampled series (finance TWAP,
    sensor means), where the plain avg() over-weights bursts.

    Durations are integer epoch-microsecond differences (exact in both
    engines); users with a single event have zero span and are excluded,
    as is the degenerate user whose events ALL share one microsecond
    (span_us = 0 — the integer division would hard-error under ANSI /
    DuckDB HUGEINT ``// 0`` where the old double division gave inf;
    ADVICE r7).  The guard is the identical ``span_us > 0`` filter on
    both sides.
    Values are cents-exact (2-decimal domain), so BOTH weighted and plain
    sums fold in integer cent-units as decimal(38,0) — order-independent
    across partitions (a raw double sum drifted in the 8th significant
    digit between engines at sf0.1 and flipped naive_avg's round(.,4)
    on one user).  The final ratios round via exact integer HALF_UP
    (floor((2a+b) div 2b), the _usd_halfup class): the exact rationals
    land exactly on .xxxx5 midpoints (sf0.1 user 212's mean is exactly
    44.94875), where rounding the double quotient diverges between
    engines (Spark rounds the shortest decimal repr, DuckDB the binary
    value).  All quantities are nonnegative (value >= 0 domain), so
    away-from-zero equals the positive floor form.

    Scale: one lead() window per user partition (a single user-keyed
    shuffle), then a per-user aggregation — the locf_fill shape plus a
    weighted mean.
    """
    from ..sources.tables import load_table as _lt

    e = _lt(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "value",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "value")
    spans = e.withColumn("next_us", F.lead("us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    dur = F.col("next_us") - F.col("us")
    dec = "decimal(38,0)"
    return (
        spans.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum((F.col("cents").cast(dec) * dur).cast(dec)).alias("wsum_c"),
            F.sum(dur).alias("span_us"),
            F.sum(F.col("cents").cast(dec)).alias("sum_c"),
            F.count("cents").alias("n_vals"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            (F.expr(
                "(wsum_c * 200 + CAST(span_us AS DECIMAL(38,0))) div "
                "(CAST(span_us AS DECIMAL(38,0)) * 2)"
            ).cast("double") / 1e4).alias("twap"),
            (F.expr(
                "(sum_c * 200 + CAST(n_vals AS DECIMAL(38,0))) div "
                "(CAST(n_vals AS DECIMAL(38,0)) * 2)"
            ).cast("double") / 1e4).alias("naive_avg"),
            (F.expr(
                "(CAST(span_us AS DECIMAL(38,0)) * 200 + 3600000000) div "
                "CAST(7200000000 AS DECIMAL(38,0))"
            ).cast("double") / 1e2).alias("span_hours"),
        )
    )


ORACLES["twap_user_value"] = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, value,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    spans AS (
        SELECT user_id, us, value, cents,
               lead(us) OVER (PARTITION BY user_id
                              ORDER BY us, value) AS next_us
        FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST((sum(CAST(cents AS HUGEINT) * (next_us - us)) * 200
                 + sum(next_us - us))
                // (sum(next_us - us) * 2) AS DOUBLE) / 1e4 AS twap,
           CAST((sum(CAST(cents AS HUGEINT)) * 200 + count(cents))
                // (count(cents) * 2) AS DOUBLE) / 1e4 AS naive_avg,
           CAST((sum(CAST(next_us - us AS HUGEINT)) * 200 + 3600000000)
                // 7200000000 AS DOUBLE) / 1e2 AS span_hours
    FROM spans WHERE next_us IS NOT NULL
    GROUP BY user_id
    HAVING sum(next_us - us) > 0
"""
QUERIES["twap_user_value"] = twap_user_value


CLAMP_MIN_MOVES = 20  # report parts with at least this many movements


def inventory_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running inventory balance per part — shipments of
    return-flagged lines add stock, normal lines remove it, and the
    balance can never go negative (you can't ship what you don't have).
    The clamped prefix sum LOOKS inherently sequential, but has the
    closed window form  b_t = s_t - least(0, min_{k<=t} s_k)  (plain
    running sum corrected by the running minimum), so it runs as two
    frame-accumulating window passes per part partition — the trick that
    turns an "imperative" scan into a distributed plan.

    Scale: both windows share ONE part-keyed exchange; per-part sequences
    are bounded (movements per part), no global window anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
        .otherwise(-F.col("l_quantity"))
        .alias("delta"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    run = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.sum("delta").over(w).alias("s"),
    ).withColumn("b", F.col("s") - F.least(F.lit(0.0), F.min("s").over(w)))
    return (
        run.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_moves"),
            F.round(F.max("b"), 2).alias("peak_balance"),
            F.round(F.min("b"), 2).alias("min_balance"),
        )
        .filter(F.col("n_moves") >= CLAMP_MIN_MOVES)
    )


ORACLES["inventory_clamped_balance"] = f"""
    WITH li AS (
        SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
               CASE WHEN l_returnflag = 'R' THEN l_quantity
                    ELSE -l_quantity END AS delta
        FROM lineitem
    ),
    sums AS (
        SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
               sum(delta) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber) AS s
        FROM li
    ),
    run AS (
        SELECT l_partkey,
               s - least(0.0, min(s) OVER (PARTITION BY l_partkey
                                           ORDER BY l_shipdate, l_orderkey,
                                                    l_linenumber)) AS b
        FROM sums
    )
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_moves,
           round(max(b), 2) AS peak_balance,
           round(min(b), 2) AS min_balance
    FROM run GROUP BY 1
    HAVING count(*) >= {CLAMP_MIN_MOVES}
"""
QUERIES["inventory_clamped_balance"] = inventory_clamped_balance


def skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for the two hottest fact keys (lineitem join
    key l_orderkey, orders distribution key o_custkey): per-key-count
    distribution stats — max/mean ratio, p99, and the share of rows held
    by the single hottest key.  This is the diagnostic that decides
    between a plain shuffle join, AQE skew splitting, and manual salting
    (skew_salted_join implements the remedy; this measures the disease).

    Scale: one count-per-key aggregation per fact column, then stats over
    the key-cardinality frame — percentile runs on counts, not rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_orderkey").alias("key_col"),
        F.col("l_orderkey").cast("string").alias("k"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("orders.o_custkey").alias("key_col"),
        F.col("o_custkey").cast("string").alias("k"),
    )
    counts = (
        li.unionByName(o)
        .groupBy("key_col", "k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.round(F.max("c") / F.avg("c"), 4).alias("max_over_mean"),
        F.expr("CAST(percentile(c, 0.99) AS DOUBLE)").alias("p99_raw"),
    ).select(
        "key_col",
        "n_keys",
        "n_rows",
        "max_key_rows",
        "max_over_mean",
        F.round("p99_raw", 2).alias("p99_key_rows"),
    )


ORACLES["skew_diagnostics"] = """
    WITH facts AS (
        SELECT 'lineitem.l_orderkey' AS key_col,
               CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
        UNION ALL
        SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
    ),
    counts AS (
        SELECT key_col, k, count(*) AS c FROM facts GROUP BY 1, 2
    )
    SELECT key_col,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           round(max(c) / avg(c), 4) AS max_over_mean,
           round(quantile_cont(c, 0.99), 2) AS p99_key_rows
    FROM counts GROUP BY 1
"""
QUERIES["skew_diagnostics"] = skew_diagnostics


def ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form two-feature OLS (normal equations on CENTERED data):
    fit l_extendedprice ~ l_quantity + l_discount over lineitem and
    report coefficients, intercept and R^2 — multiple regression as two
    aggregation passes (means, then centered cross-moments) and a 2x2
    Cramer solve, the distributed-friendly closed form (no gradient
    loop, no driver iteration).

    Centering before the moment sums keeps the Cramer determinant away
    from catastrophic cancellation, so the 4-decimal rounding sits far
    above cross-engine float-reassociation noise.

    Scale: two map-side-combined full-table aggregates (the second takes
    the 1-row means frame as a broadcast) — the same shape at any data
    size; d features would need d^2 moment columns, still one pass.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    means = li.agg(
        F.avg("x1").alias("m1"), F.avg("x2").alias("m2"), F.avg("y").alias("my")
    )
    c = li.crossJoin(F.broadcast(means))
    d1, d2, dy = (
        F.col("x1") - F.col("m1"),
        F.col("x2") - F.col("m2"),
        F.col("y") - F.col("my"),
    )
    mom = c.agg(
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d1 * dy).alias("s1y"),
        F.sum(d2 * dy).alias("s2y"),
        F.sum(dy * dy).alias("syy"),
        F.first("m1").alias("m1"),
        F.first("m2").alias("m2"),
        F.first("my").alias("my"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    ess = b1 * F.col("s1y") + b2 * F.col("s2y")
    return mom.select(
        F.col("n"),
        F.round(b1, 4).alias("beta_quantity"),
        F.round(b2, 4).alias("beta_discount"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 4).alias(
            "intercept"
        ),
        F.round(ess / F.col("syy"), 6).alias("r2"),
    )


ORACLES["ols_two_feature"] = """
    WITH li AS (
        SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
        FROM lineitem
    ),
    means AS (
        SELECT avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my FROM li
    ),
    mom AS (
        SELECT sum((x1 - m1) * (x1 - m1)) AS s11,
               sum((x1 - m1) * (x2 - m2)) AS s12,
               sum((x2 - m2) * (x2 - m2)) AS s22,
               sum((x1 - m1) * (y - my)) AS s1y,
               sum((x2 - m2) * (y - my)) AS s2y,
               sum((y - my) * (y - my)) AS syy,
               any_value(m1) AS m1, any_value(m2) AS m2,
               any_value(my) AS my,
               CAST(count(*) AS BIGINT) AS n
        FROM li CROSS JOIN means
    )
    SELECT n,
           round((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12), 4)
               AS beta_quantity,
           round((s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12), 4)
               AS beta_discount,
           round(my - (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) * m1
                    - (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) * m2,
                 4) AS intercept,
           round(((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) * s1y
                  + (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) * s2y)
                 / syy, 6) AS r2
    FROM mom
"""
QUERIES["ols_two_feature"] = ols_two_feature


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median (and p25/p75) of extended price per brand:
    the weighted-percentile primitive (each row counts l_quantity times)
    computed WITHOUT expanding rows by weight — a cumulative-weight window
    per group picks the first row whose running weight crosses half the
    total.  Weights are integer-valued quantities, so the crossing test
    (2*cumw >= totw, integer cross-multiply) is exact in both engines.

    Scale: one brand-partitioned sort window + a group total join — the
    weighted generalization of exact median, same two-shuffle shape; no
    explode by weight (a 100-TB anti-pattern when weights are large).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", F.col("l_quantity").cast("long").alias("q")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("p_brand").orderBy("l_extendedprice", "l_partkey")
    cum = j.select(
        "p_brand",
        "l_extendedprice",
        F.sum("q").over(w).alias("cumw"),
    )
    tot = j.groupBy("p_brand").agg(
        F.sum("q").alias("totw"), F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    c = cum.join(F.broadcast(tot.select("p_brand", "totw")), "p_brand")

    def pick(mult: int, frac_num: int):
        # first price whose cumulative weight reaches frac of total:
        # cumw * mult >= totw * frac_num   (integer cross-multiply)
        return F.min(
            F.when(
                F.col("cumw") * mult >= F.col("totw") * frac_num,
                F.col("l_extendedprice"),
            )
        )

    agg = c.groupBy("p_brand").agg(
        pick(4, 1).alias("wp25"),
        pick(2, 1).alias("wmedian"),
        pick(4, 3).alias("wp75"),
    )
    return agg.join(F.broadcast(tot), "p_brand").select(
        "p_brand",
        "n_lines",
        F.col("totw").cast("bigint").alias("total_qty"),
        F.round("wp25", 2).alias("wp25"),
        F.round("wmedian", 2).alias("wmedian"),
        F.round("wp75", 2).alias("wp75"),
    )


ORACLES["weighted_median_price"] = """
    WITH j AS (
        SELECT p_brand, l_extendedprice, CAST(l_quantity AS BIGINT) AS q,
               l_partkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    cum AS (
        SELECT p_brand, l_extendedprice,
               sum(q) OVER (PARTITION BY p_brand
                            ORDER BY l_extendedprice, l_partkey) AS cumw
        FROM j
    ),
    tot AS (
        SELECT p_brand, sum(q) AS totw,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM j GROUP BY 1
    )
    SELECT c.p_brand, t.n_lines, CAST(t.totw AS BIGINT) AS total_qty,
           round(min(CASE WHEN c.cumw * 4 >= t.totw * 1
                          THEN c.l_extendedprice END), 2) AS wp25,
           round(min(CASE WHEN c.cumw * 2 >= t.totw * 1
                          THEN c.l_extendedprice END), 2) AS wmedian,
           round(min(CASE WHEN c.cumw * 4 >= t.totw * 3
                          THEN c.l_extendedprice END), 2) AS wp75
    FROM cum c JOIN tot t ON c.p_brand = t.p_brand
    GROUP BY c.p_brand, t.n_lines, t.totw
"""
QUERIES["weighted_median_price"] = weighted_median_price


# --- max drawdown ------------------------------------------------------------


def max_drawdown_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's running balance — the classic
    risk/monitoring statistic (largest peak-to-trough drop).  Purchases
    debit the balance, every other event credits it, so the cumulative
    series actually goes up AND down.

    Construction: running balance = ordered prefix sum per user; running
    peak = prefix max of the balance; drawdown = peak - balance; answer =
    max drawdown.  Three stacked windows, all partitioned by user_id and
    ordered by (ts, event_id) — ONE shuffle at 100 TB, no self-join.
    Float parity: prefix sums are evaluated in the explicit window order
    on both engines (sequential association, not reassociating partials),
    so the doubles match bit-for-bit; outputs still round defensively.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", -F.col("value"))
        .otherwise(F.col("value"))
        .alias("flow"),
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    b = e.withColumn("bal", F.sum("flow").over(run)).withColumn(
        "peak", F.max("bal").over(run)
    )
    return b.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.max(F.col("peak") - F.col("bal")), 4).alias("max_drawdown"),
        F.round(F.sum("flow"), 4).alias("final_balance"),
    )


ORACLES["max_drawdown_user"] = """
    WITH flows AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'purchase' THEN -value
                    ELSE value END AS flow
        FROM events
    ),
    bals AS (
        SELECT user_id, ts, event_id, flow,
               sum(flow) OVER w AS bal
        FROM flows
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    run AS (
        SELECT user_id, flow, bal,
               max(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS peak
        FROM bals
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(max(peak - bal), 4) AS max_drawdown,
           round(sum(flow), 4) AS final_balance
    FROM run GROUP BY 1
"""
QUERIES["max_drawdown_user"] = max_drawdown_user


# --- STL-lite seasonal decomposition -----------------------------------------

STL_HALF = 3  # centered moving-average half-width -> 7-day trend window


def stl_lite_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of daily order
    revenue (classical decomposition — the moving-average core of STL
    without the loess refinements): trend = centered 7-day moving average,
    seasonal = mean detrended value per weekday, residual = the rest.
    Only interior days (full 7-day window) are emitted.

    Exactness: revenue becomes integer cents BEFORE any aggregation, so
    daily totals and the 7-day window sums are exact integers; the trend
    is one division of exact integers (identical doubles on both engines).
    The per-weekday seasonal mean reassociates (~1e-16 relative), rounded
    far above the noise.

    Scale: one groupBy to day cardinality (map-side combined), then every
    window runs on the day-level frame — bounded by the calendar (~2.5 k
    rows for 7 years) regardless of corpus size, the same bounded-frame
    argument as the score-grid AUC.  Weekday index is Monday=0 in both
    engines (Spark dayofweek is Sun=1..Sat=7, DuckDB Sun=0..Sat=6).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w7 = Window.orderBy("day").rowsBetween(-STL_HALF, STL_HALF)
    t = (
        daily.withColumn("n_win", F.count(F.lit(1)).over(w7))
        .withColumn("win_cents", F.sum("cents").over(w7))
        .filter(F.col("n_win") == 2 * STL_HALF + 1)
        .withColumn("trend_c", F.col("win_cents") / (2 * STL_HALF + 1))
        .withColumn("wd", (F.dayofweek("day") + 5) % 7)
        .withColumn("detr", F.col("cents") - F.col("trend_c"))
    )
    seas = t.groupBy("wd").agg(F.avg("detr").alias("seas_c"))
    return (
        t.join(F.broadcast(seas), "wd")
        .select(
            "day",
            F.col("wd").cast("bigint").alias("weekday"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("trend_c") / 100.0, 2).alias("trend"),
            F.round(F.col("seas_c") / 100.0, 2).alias("seasonal"),
            F.round(
                (F.col("detr") - F.col("seas_c")) / 100.0, 2
            ).alias("residual"),
        )
    )


ORACLES["stl_lite_decompose"] = f"""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, cents,
               count(*) OVER w AS n_win,
               sum(cents) OVER w AS win_cents
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN {STL_HALF} PRECEDING
                     AND {STL_HALF} FOLLOWING)
    ),
    interior AS (
        SELECT day, cents,
               win_cents / {2 * STL_HALF + 1} AS trend_c,
               (dayofweek(day) + 6) % 7 AS wd,
               cents - win_cents / {2 * STL_HALF + 1} AS detr
        FROM t WHERE n_win = {2 * STL_HALF + 1}
    ),
    seas AS (SELECT wd, avg(detr) AS seas_c FROM interior GROUP BY 1)
    SELECT i.day,
           CAST(i.wd AS BIGINT) AS weekday,
           round(i.cents / 100.0, 2) AS revenue,
           round(i.trend_c / 100.0, 2) AS trend,
           round(s.seas_c / 100.0, 2) AS seasonal,
           round((i.detr - s.seas_c) / 100.0, 2) AS residual
    FROM interior i JOIN seas s ON i.wd = s.wd
"""
QUERIES["stl_lite_decompose"] = stl_lite_decompose


# --- HHI market concentration ------------------------------------------------


def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier-nation revenue concentration
    within each region (share-squared sum scaled to the antitrust 0-10000
    convention) — the concentration screen next to revenue_gini.

    Exactness: per-lineitem revenue becomes integer cents in the scan
    (one rounding of identical doubles), nation/region totals are exact
    integer sums, each share is ONE division of exact integers; the <= 25
    share-squared terms reassociate below the rounding contract.
    Scale: one lineitem-sized agg to nation cardinality with broadcast
    dims — map-side combined, no extra shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_nationkey")
        .agg(F.sum("cents").alias("nat_cents"))
    )
    reg = nat.groupBy("r_name").agg(F.sum("nat_cents").alias("reg_cents"))
    share = nat.join(reg, "r_name").withColumn(
        "sh", F.col("nat_cents") / F.col("reg_cents")
    )
    return share.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        F.round(F.sum(F.col("sh") * F.col("sh")) * 10000, 4).alias("hhi"),
    )


ORACLES["hhi_concentration"] = """
    WITH nat AS (
        SELECT r.r_name, n.n_nationkey,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100,
                              0) AS BIGINT)) AS nat_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ),
    reg AS (SELECT r_name, sum(nat_cents) AS reg_cents FROM nat GROUP BY 1)
    SELECT n.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(sum((n.nat_cents * 1.0 / g.reg_cents)
                     * (n.nat_cents * 1.0 / g.reg_cents)) * 10000, 4) AS hhi
    FROM nat n JOIN reg g ON n.r_name = g.r_name
    GROUP BY 1
"""
QUERIES["hhi_concentration"] = hhi_concentration


# --- functional-dependency audit ---------------------------------------------

# candidate determinancies a profiler would screen: (table, lhs, rhs)
FD_CANDIDATES = (
    ("documents", "source", "lang"),
    ("events", "user_id", "event_type"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (the data-profiling check next to
    data_quality_checks): for each candidate ``lhs -> rhs`` dependency,
    count the lhs groups, the groups that VIOLATE the dependency (more
    than one distinct rhs), and the worst fan-out — the evidence a schema
    profiler uses to decide whether a column is derivable.

    Scale: each candidate is one exact groupBy-countDistinct at lhs
    cardinality followed by a 3-value rollup; candidates union into one
    result frame.  All counts are exact integers.
    """
    parts = []
    for table, lhs, rhs in FD_CANDIDATES:
        per = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(lhs).cast("string").alias("k"))
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        parts.append(
            per.agg(
                F.lit(f"{table}.{lhs} -> {rhs}").alias("dependency"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.max("n_rhs").cast("bigint").alias("max_fanout"),
            ).withColumn("holds", F.col("n_violating") == 0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _fd_oracle() -> str:
    sels = []
    for table, lhs, rhs in FD_CANDIDATES:
        sels.append(f"""
        SELECT '{table}.{lhs} -> {rhs}' AS dependency,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(max(n_rhs) AS BIGINT) AS max_fanout,
               sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
        FROM (SELECT CAST({lhs} AS VARCHAR) AS k,
                     count(DISTINCT {rhs}) AS n_rhs
              FROM {table} GROUP BY 1)""")
    return " UNION ALL ".join(sels)


ORACLES["fd_violations"] = _fd_oracle()
QUERIES["fd_violations"] = fd_violations


# --- Spearman rank correlation -----------------------------------------------


def spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order revenue and daily
    order COUNT — the robust (monotonic, outlier-proof) companion to the
    Pearson correlation_matrix tier, with exact tie handling via average
    ranks.

    Exactness: revenue is integer cents, counts are integers; average
    ranks are half-integers kept DOUBLED (always integers), so every sum
    in the Pearson-on-ranks closed form is an exact integer (decimal(38)
    / hugeint) and the final statistic is a handful of identical float
    ops.  Scale: one groupBy to day cardinality; the rank windows run on
    the calendar-bounded day frame (the STL/AUC bounded-frame argument).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    # doubled average rank: 2*rank + (#ties - 1) -- rank() is the group's
    # min rank, so avg = rank + (cnt-1)/2
    def r2(col: str) -> F.Column:
        w = Window.orderBy(col)
        cnt = Window.partitionBy(col)
        return (
            2 * F.rank().over(w) + F.count(F.lit(1)).over(cnt) - 1
        ).cast("decimal(38,0)")

    ranked = daily.select(r2("rev").alias("rx"), r2("n").alias("ry"))
    t = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return t.select(
        F.col("m").cast("bigint").alias("n_days"),
        F.round(num / F.sqrt(denx * deny), 6).alias("spearman"),
    )


ORACLES["spearman_daily"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev,
               count(*) AS n
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT 2 * rank() OVER (ORDER BY rev)
                   + count(*) OVER (PARTITION BY rev) - 1 AS rx,
               2 * rank() OVER (ORDER BY n)
                   + count(*) OVER (PARTITION BY n) - 1 AS ry
        FROM daily
    ),
    t AS (
        SELECT count(*) AS m, sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
               sum(rx * ry) AS sxy
        FROM ranked
    )
    SELECT CAST(m AS BIGINT) AS n_days,
           round(CAST(m * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                        * CAST(m * syy - sy * sy AS DOUBLE)), 6) AS spearman
    FROM t
"""
QUERIES["spearman_daily"] = spearman_daily


# --- FIFO payment allocation -------------------------------------------------


def fifo_payment_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation waterfall: each customer's payment pool (the sum of
    their purchase-event values; events.user_id is the customer key in
    this testdata) is applied to their invoices (orders) oldest-first.
    Per invoice: paid = clamp(pool - cum_due_before, 0, amount) — the
    closed-form waterfall, no loop, no recursion.  The classic AR/ledger
    operator, same window algebra as inventory_clamped_balance.

    Exactness: invoice amounts and payments become integer cents in the
    scan; the prefix sum and both clamps are integer ops; output stays in
    cents.  Scale: one customer-keyed window over orders plus one
    events-sized agg joined on the customer key — two shuffles total.
    """
    pay = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("custkey"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("pool_c")
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amount_c"),
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    alloc = (
        o.join(pay, "custkey")
        .withColumn("cum_before", F.coalesce(F.sum("amount_c").over(w), F.lit(0)))
        .withColumn(
            "paid_c",
            F.least(
                F.greatest(F.col("pool_c") - F.col("cum_before"), F.lit(0)),
                F.col("amount_c"),
            ),
        )
    )
    return alloc.select(
        "custkey",
        "o_orderkey",
        "amount_c",
        "paid_c",
        F.when(F.col("paid_c") == F.col("amount_c"), "paid")
        .when(F.col("paid_c") > 0, "partial")
        .otherwise("unpaid")
        .alias("status"),
    )


ORACLES["fifo_payment_allocation"] = """
    WITH pay AS (
        SELECT user_id AS custkey,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS pool_c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    o AS (
        SELECT o_custkey AS custkey, o_orderkey, o_orderdate,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS amount_c
        FROM orders
    ),
    alloc AS (
        SELECT o.custkey, o.o_orderkey, o.amount_c, p.pool_c,
               coalesce(sum(o.amount_c) OVER (
                   PARTITION BY o.custkey
                   ORDER BY o.o_orderdate, o.o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM o JOIN pay p ON o.custkey = p.custkey
    )
    SELECT custkey, o_orderkey, amount_c,
           CAST(least(greatest(pool_c - cum_before, 0), amount_c)
                AS BIGINT) AS paid_c,
           CASE WHEN least(greatest(pool_c - cum_before, 0), amount_c)
                     = amount_c THEN 'paid'
                WHEN least(greatest(pool_c - cum_before, 0), amount_c) > 0
                     THEN 'partial'
                ELSE 'unpaid' END AS status
    FROM alloc
"""
QUERIES["fifo_payment_allocation"] = fifo_payment_allocation


# --- Anderson-Darling drift --------------------------------------------------


def anderson_darling_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic (Scholz & Stephens 1987,
    midrank/tie-corrected A2akN form, k = 2) between the purchase-value
    distributions before/after CHI2_SPLIT_TS — the TAIL-WEIGHTED drift
    monitor next to ks_drift (KS is blind to tail divergence; AD weights
    the ECDF gap by 1/(F(1-F))).

    Scale: identical physics to ks_drift — one map-side-combined shuffle
    to (value -> before/after count) cells, prefix sums via the two-pass
    in-bucket + broadcast-offset decomposition (no global-ordering window
    ever sees the cell-cardinality frame), then one aggregation of the
    per-cell terms.

    Parity: counts are integer-valued doubles (exact far past corpus
    sizes), midranks are exact halves, every per-cell term is the same
    IEEE expression on identical operands in both engines; only the final
    term sum reassociates (~1e-16), rounded at 6.
    """
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("ts") <= F.lit(CHI2_SPLIT_TS), 1).otherwise(0)
            ).cast("double").alias("n1"),
            F.sum(
                F.when(F.col("ts") > F.lit(CHI2_SPLIT_TS), 1).otherwise(0)
            ).cast("double").alias("n2"),
        )
        .withColumn(
            "rbkt", F.floor(F.col("value") / KS_RANGE_BUCKET).cast("long")
        )
    )
    w_in = (
        Window.partitionBy("rbkt")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_cum = cells.select(
        "rbkt",
        "value",
        "n1",
        "n2",
        F.sum("n1").over(w_in).alias("c1_in"),
        F.sum("n2").over(w_in).alias("c2_in"),
    )
    btot = cells.groupBy("rbkt").agg(
        F.sum("n1").alias("b1"), F.sum("n2").alias("b2")
    )
    w_off = Window.orderBy("rbkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "rbkt",
        F.coalesce(F.sum("b1").over(w_off), F.lit(0.0)).alias("o1"),
        F.coalesce(F.sum("b2").over(w_off), F.lit(0.0)).alias("o2"),
    )
    totals = cells.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    l = F.col("n1") + F.col("n2")
    c1 = F.col("o1") + F.col("c1_in")
    c2 = F.col("o2") + F.col("c2_in")
    big_n = F.col("t1") + F.col("t2")
    m1 = c1 - F.col("n1") / 2
    m2 = c2 - F.col("n2") / 2
    lmid = (c1 + c2) - l / 2
    denom = lmid * (big_n - lmid) - big_n * l / 4
    num1 = big_n * m1 - F.col("t1") * lmid
    num2 = big_n * m2 - F.col("t2") * lmid
    term = F.when(
        denom > 0,
        (l / big_n)
        * (
            (num1 * num1) / (F.col("t1") * denom)
            + (num2 * num2) / (F.col("t2") * denom)
        ),
    ).otherwise(F.lit(0.0))
    t = (
        in_cum.join(F.broadcast(offsets), "rbkt")
        .crossJoin(F.broadcast(totals))
        .agg(
            F.sum(term).alias("s"),
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
        )
    )
    return t.select(
        F.col("t1").cast("bigint").alias("n_before"),
        F.col("t2").cast("bigint").alias("n_after"),
        F.round(
            ((F.col("t1") + F.col("t2") - 1) / (F.col("t1") + F.col("t2")))
            * F.col("s"),
            6,
        ).alias("ad_stat"),
    )


ORACLES["anderson_darling_drift"] = f"""
    WITH cells AS (
        SELECT value,
               CAST(sum(CASE WHEN ts <= TIMESTAMP '{CHI2_SPLIT_TS}'
                             THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
               CAST(sum(CASE WHEN ts > TIMESTAMP '{CHI2_SPLIT_TS}'
                             THEN 1 ELSE 0 END) AS DOUBLE) AS n2
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    cum AS (
        SELECT value, n1, n2,
               sum(n1) OVER w AS c1, sum(n2) OVER w AS c2
        FROM cells
        WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM cells),
    terms AS (
        SELECT t1, t2,
               CASE WHEN ((c1 + c2) - (n1 + n2) / 2)
                         * ((t1 + t2) - ((c1 + c2) - (n1 + n2) / 2))
                         - (t1 + t2) * (n1 + n2) / 4 > 0
               THEN ((n1 + n2) / (t1 + t2))
                    * ((((t1 + t2) * (c1 - n1 / 2)
                         - t1 * ((c1 + c2) - (n1 + n2) / 2))
                        * ((t1 + t2) * (c1 - n1 / 2)
                           - t1 * ((c1 + c2) - (n1 + n2) / 2)))
                       / (t1 * (((c1 + c2) - (n1 + n2) / 2)
                                * ((t1 + t2) - ((c1 + c2) - (n1 + n2) / 2))
                                - (t1 + t2) * (n1 + n2) / 4))
                       + (((t1 + t2) * (c2 - n2 / 2)
                           - t2 * ((c1 + c2) - (n1 + n2) / 2))
                          * ((t1 + t2) * (c2 - n2 / 2)
                             - t2 * ((c1 + c2) - (n1 + n2) / 2)))
                         / (t2 * (((c1 + c2) - (n1 + n2) / 2)
                                  * ((t1 + t2) - ((c1 + c2) - (n1 + n2) / 2))
                                  - (t1 + t2) * (n1 + n2) / 4)))
               ELSE 0.0 END AS term
        FROM cum, tot
    )
    SELECT CAST(max(t1) AS BIGINT) AS n_before,
           CAST(max(t2) AS BIGINT) AS n_after,
           round(((max(t1) + max(t2) - 1) / (max(t1) + max(t2)))
                 * sum(term), 6) AS ad_stat
    FROM terms
"""
QUERIES["anderson_darling_drift"] = anderson_darling_drift


# --------------------------------------------------------------------------
# round-5 restarted-session wave E: operational-analytics additions
# --------------------------------------------------------------------------

RAPID_REPEAT_WINDOW_US = 600_000_000  # 10 minutes


def rapid_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-repeat-purchase audit: pairs of purchases by the SAME user
    within ten minutes — the double-submit / double-charge finance
    control (amount equality is reported, not required, because a
    double-submit after an edit changes the amount slightly).

    Scale: the pair join is a user_id equi-join; candidates are per-user
    purchase pairs and the 10-minute predicate filters inside the join
    partitions — never a global time cross join.  Deterministic pair
    orientation: earlier (ts, event_id) first.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    a = e.select(
        "user_id", F.col("cents").alias("cents_a"),
        F.col("us").alias("us_a"), F.col("event_id").alias("event_a"),
    )
    b = e.select(
        "user_id", F.col("cents").alias("cents_b"),
        F.col("us").alias("us_b"), F.col("event_id").alias("event_b"),
    )
    pairs = a.join(b, "user_id").filter(
        (
            (F.col("us_a") < F.col("us_b"))
            | ((F.col("us_a") == F.col("us_b"))
               & (F.col("event_a") < F.col("event_b")))
        )
        & (F.col("us_b") - F.col("us_a") <= RAPID_REPEAT_WINDOW_US)
    )
    return pairs.select(
        "user_id",
        "event_a",
        "event_b",
        F.round(F.col("cents_a").cast("double") / 100.0, 2).alias("amount_a"),
        F.round(F.col("cents_b").cast("double") / 100.0, 2).alias("amount_b"),
        (F.col("cents_a") == F.col("cents_b")).alias("same_amount"),
        # exact integer rounding of the gap to 2dp minutes
        (
            F.floor(
                (F.col("us_b") - F.col("us_a") + F.lit(300_000))
                / F.lit(600_000)
            ).cast("double")
            / 100.0
        ).alias("gap_min"),
    )


ORACLES["rapid_repeat_purchases"] = f"""
    WITH e AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS us, event_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
           round(CAST(a.cents AS DOUBLE) / 100.0, 2) AS amount_a,
           round(CAST(b.cents AS DOUBLE) / 100.0, 2) AS amount_b,
           a.cents = b.cents AS same_amount,
           CAST((b.us - a.us + 300000) // 600000 AS DOUBLE) / 100.0
             AS gap_min
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
     AND b.us - a.us <= {RAPID_REPEAT_WINDOW_US}
"""
QUERIES["rapid_repeat_purchases"] = rapid_repeat_purchases


def market_beta_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type market beta: OLS of each type's daily revenue series
    against the all-types market series — beta, alpha, and R^2 from the
    closed normal-equation forms over exact integer-cent sums (the
    ols_two_feature exactness pattern on the day-bounded frame).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    market = daily.groupBy("day").agg(F.sum("y").alias("x"))
    j = daily.join(market, "day")
    d = "decimal(38,0)"
    sums = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast(d)).alias("sx"),
        F.sum(F.col("y").cast(d)).alias("sy"),
        F.sum(F.col("x").cast(d) * F.col("y").cast(d)).alias("sxy"),
        F.sum(F.col("x").cast(d) * F.col("x").cast(d)).alias("sxx"),
        F.sum(F.col("y").cast(d) * F.col("y").cast(d)).alias("syy"),
    )
    kd = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_n = kd * sxy - sx * sy
    varx_n = kd * sxx - sx * sx
    vary_n = kd * syy - sy * sy
    beta = cov_n / varx_n
    alpha_cents = (sy - beta * sx) / kd
    return sums.select(
        "event_type",
        F.col("k").cast("bigint").alias("n_days"),
        F.round(beta, 6).alias("beta"),
        F.round(alpha_cents / 100.0, 2).alias("alpha"),
        F.round(cov_n * cov_n / (varx_n * vary_n), 4).alias("r2"),
    )


ORACLES["market_beta_types"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, 2
    ),
    market AS (SELECT day, sum(y) AS x FROM daily GROUP BY 1),
    sums AS (
        SELECT event_type, count(*) AS k,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM daily JOIN market USING (day)
        GROUP BY 1
    )
    SELECT event_type, CAST(k AS BIGINT) AS n_days,
           round((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sy AS DOUBLE))
                 / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)), 6) AS beta,
           round((CAST(sy AS DOUBLE)
                  - ((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sy AS DOUBLE))
                     / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                        * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / k / 100.0, 2) AS alpha,
           round((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sy AS DOUBLE))
                 * (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE))
                 / ((k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sx AS DOUBLE))
                    * (k * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE))), 4) AS r2
    FROM sums
"""
QUERIES["market_beta_types"] = market_beta_types


SRM_CHI2_CRIT = 3.841  # chi-square 95% critical value, 1 df


def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the even/odd user_id experiment
    split: chi-square against the expected 50/50 unit allocation —
    the first gate every A/B platform runs before reading a metric.
    chi2 = (n0 - n1)^2 / (n0 + n1) for two equal-expectation cells.
    """
    e = load_table(spark, sf_dir, "events")
    units = e.select("user_id").distinct()
    cnt = units.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 0).otherwise(1)).alias("n1"),
    )
    d0, d1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    chi2 = (d0 - d1) * (d0 - d1) / (d0 + d1)
    return cnt.select(
        F.col("n0").cast("bigint").alias("n_even"),
        F.col("n1").cast("bigint").alias("n_odd"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > SRM_CHI2_CRIT).alias("srm_flag"),
    )


ORACLES["srm_check"] = f"""
    WITH units AS (SELECT DISTINCT user_id FROM events),
    cnt AS (
        SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS n1
        FROM units
    )
    SELECT CAST(n0 AS BIGINT) AS n_even, CAST(n1 AS BIGINT) AS n_odd,
           round((CAST(n0 AS DOUBLE) - n1) * (CAST(n0 AS DOUBLE) - n1)
                 / (CAST(n0 AS DOUBLE) + n1), 4) AS chi2,
           (CAST(n0 AS DOUBLE) - n1) * (CAST(n0 AS DOUBLE) - n1)
             / (CAST(n0 AS DOUBLE) + n1) > {SRM_CHI2_CRIT} AS srm_flag
    FROM cnt
"""
QUERIES["srm_check"] = srm_check


def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay fit of the pooled DAILY retention curve:
    r_t ~ r0 * exp(-b t), fitted by log-linear OLS over the
    censoring-corrected rates (day-t retention pools only the users whose
    first-seen day is observed for at least t further days) — the summary
    number (decay rate / half-life) a growth team quotes from
    retention_cohorts' matrix.

    Exactness: rates are exact integer ratios; the OLS sums fold over the
    observation-window-bounded point frame with ORDER-PINNED cumulative
    sums.  half_life is NULL when the fitted decay is non-positive (a
    flat or improving curve has no half-life).
    """
    e = load_table(spark, sf_dir, "events")
    # first_seen and act are each consumed twice, but localCheckpoint cuts
    # at both were measured SLOWER solo (r11: 0.876 -> 1.098 s min-of-3,
    # stable canaries): the duplicate consumers share identical aggregate
    # subtrees, so runtime ReusedExchange already dedupes them within the
    # one job and the two eager cuts only added blocking round-trips.
    # Deliberately left lazy.
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cd")
    )
    sizes = first_seen.groupBy("cd").agg(F.count(F.lit(1)).alias("size"))
    activity = e.select(
        "user_id", F.col("ts").cast("date").alias("ad")
    ).distinct()
    act = (
        activity.join(first_seen, "user_id")
        .withColumn("t", F.datediff("ad", "cd").cast("long"))
        .filter(F.col("t") >= 1)
        .groupBy("cd", "t")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    maxd = e.agg(F.max(F.col("ts").cast("date")).alias("md"))
    ts = act.select("t").distinct()
    den = (
        sizes.crossJoin(F.broadcast(ts))
        .crossJoin(F.broadcast(maxd))
        .filter(F.datediff("md", "cd").cast("long") >= F.col("t"))
        .groupBy("t")
        .agg(F.sum("size").alias("den"))
    )
    num = (
        act.crossJoin(F.broadcast(maxd))
        .filter(F.datediff("md", "cd").cast("long") >= F.col("t"))
        .groupBy("t")
        .agg(F.sum("n_active").alias("num"))
    )
    pts = (
        num.join(den, "t")
        .filter(F.col("num") > 0)
        .withColumn("lr", F.log(F.col("num").cast("double") / F.col("den")))
        .withColumn("td", F.col("t").cast("double"))
    )
    wf = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    folded = (
        pts.withColumn("m", F.count(F.lit(1)).over(wf))
        .withColumn("st", F.sum("td").over(wf))
        .withColumn("sl", F.sum("lr").over(wf))
        .withColumn("stl", F.sum(F.col("td") * F.col("lr")).over(wf))
        .withColumn("stt", F.sum(F.col("td") * F.col("td")).over(wf))
    )
    last = folded.orderBy(F.col("m").desc()).limit(1)
    md_ = F.col("m").cast("double")
    slope = (md_ * F.col("stl") - F.col("st") * F.col("sl")) / (
        md_ * F.col("stt") - F.col("st") * F.col("st")
    )
    intercept = (F.col("sl") - slope * F.col("st")) / md_
    b = -slope
    return last.select(
        F.col("m").cast("int").alias("n_points"),
        F.round(F.exp(intercept), 4).alias("r0"),
        # + 0.0 folds IEEE negative zero to +0.0 (a flat cohort curve at
        # sf0.1 rounded to -0.0 in DuckDB vs 0.0 in Spark -> hash
        # mismatch); exact no-op for every other value
        (F.round(b, 4) + F.lit(0.0)).alias("decay_rate"),
        F.when(b > 0, F.round(F.lit(0.6931471805599453) / b, 2))
        .otherwise(F.lit(None).cast("double"))
        .alias("half_life_days"),
    )


ORACLES["retention_decay_fit"] = """
    WITH first_seen AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cd
        FROM events GROUP BY 1
    ),
    sizes AS (SELECT cd, count(*) AS size FROM first_seen GROUP BY 1),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad FROM events
    ),
    act AS (
        SELECT f.cd, date_diff('day', f.cd, a.ad) AS t, count(*) AS n_active
        FROM activity a JOIN first_seen f ON a.user_id = f.user_id
        WHERE date_diff('day', f.cd, a.ad) >= 1
        GROUP BY 1, 2
    ),
    maxd AS (SELECT CAST(max(ts) AS DATE) AS md FROM events),
    ts AS (SELECT DISTINCT t FROM act),
    den AS (
        SELECT t, sum(size) AS den
        FROM sizes, ts, maxd
        WHERE date_diff('day', cd, md) >= t
        GROUP BY 1
    ),
    num AS (
        SELECT t, sum(n_active) AS num
        FROM act, maxd
        WHERE date_diff('day', cd, md) >= t
        GROUP BY 1
    ),
    pts AS (
        SELECT num.t, CAST(num.t AS DOUBLE) AS td,
               ln(CAST(num AS DOUBLE) / den) AS lr
        FROM num JOIN den ON num.t = den.t
        WHERE num > 0
    ),
    folded AS (
        SELECT count(*) OVER wf AS m,
               sum(td) OVER wf AS st, sum(lr) OVER wf AS sl,
               sum(td * lr) OVER wf AS stl, sum(td * td) OVER wf AS stt
        FROM pts
        WINDOW wf AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    last AS (SELECT * FROM folded ORDER BY m DESC LIMIT 1)
    SELECT CAST(m AS INT) AS n_points,
           round(exp((sl - ((m * stl - st * sl) / (m * stt - st * st))
                      * st) / m), 4) AS r0,
           round(-((m * stl - st * sl) / (m * stt - st * st)), 4) + 0.0
             AS decay_rate,
           CASE WHEN -((m * stl - st * sl) / (m * stt - st * st)) > 0
                THEN round(ln(2.0) / (-((m * stl - st * sl)
                                        / (m * stt - st * st))), 2)
                ELSE NULL END AS half_life_days
    FROM last
"""
QUERIES["retention_decay_fit"] = retention_decay_fit


CHANGEPOINT_MIN_SEG = 3


def variance_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection by binary segmentation on the daily
    revenue series: the split minimizing total within-segment SSE (the
    first step of the classic binary-segmentation recursion, and the
    regression twin of cusum_changepoint's mean-shift detector).

    Exactness: both segments' SSEs come from prefix sums / sums of
    squares of exact integer cents — per-candidate arithmetic is scalar;
    the argmin is a TakeOrdered on (sse, day).

    Scale: the candidate frame is the day grid (observation-window
    bounded); one ordered cumsum window over it.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        daily.withColumn("i", F.count(F.lit(1)).over(w))
        .withColumn("cs", F.sum("x").over(w))
        .withColumn("css", F.sum(F.col("x") * F.col("x")).over(w))
    )
    tot = cum.agg(
        F.max("i").alias("n"), F.max("cs").alias("ts_"), F.max("css").alias("tss")
    )
    c = cum.crossJoin(F.broadcast(tot)).filter(
        (F.col("i") >= CHANGEPOINT_MIN_SEG)
        & (F.col("n") - F.col("i") >= CHANGEPOINT_MIN_SEG)
    )
    i_, n_ = F.col("i").cast("double"), F.col("n").cast("double")
    cs, css = F.col("cs").cast("double"), F.col("css").cast("double")
    ts_, tss = F.col("ts_").cast("double"), F.col("tss").cast("double")
    sse_l = css - cs * cs / i_
    sse_r = (tss - css) - (ts_ - cs) * (ts_ - cs) / (n_ - i_)
    sse_tot = tss - ts_ * ts_ / n_
    scored = c.select(
        "day",
        F.col("i").cast("bigint").alias("n_left"),
        (F.col("n") - F.col("i")).cast("bigint").alias("n_right"),
        F.round((sse_l + sse_r), 2).alias("sse_split"),
        F.round(F.lit(1.0) - (sse_l + sse_r) / sse_tot, 4).alias(
            "var_reduction"
        ),
        F.round(cs / i_ / 100.0, 2).alias("mean_before"),
        F.round((ts_ - cs) / (n_ - i_) / 100.0, 2).alias("mean_after"),
    )
    return scored.orderBy(F.col("sse_split").asc(), F.col("day").asc()).limit(1)


ORACLES["variance_changepoint"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day,
               count(*) OVER w AS i, sum(x) OVER w AS cs,
               sum(x * x) OVER w AS css
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    tot AS (SELECT max(i) AS n, max(cs) AS ts_, max(css) AS tss FROM cum),
    scored AS (
        SELECT day,
               CAST(i AS BIGINT) AS n_left,
               CAST(n - i AS BIGINT) AS n_right,
               round((CAST(css AS DOUBLE) - CAST(cs AS DOUBLE)
                      * CAST(cs AS DOUBLE) / i)
                     + ((CAST(tss AS DOUBLE) - CAST(css AS DOUBLE))
                        - (CAST(ts_ AS DOUBLE) - CAST(cs AS DOUBLE))
                          * (CAST(ts_ AS DOUBLE) - CAST(cs AS DOUBLE))
                          / (n - i)), 2) AS sse_split,
               round(1.0 - ((CAST(css AS DOUBLE) - CAST(cs AS DOUBLE)
                             * CAST(cs AS DOUBLE) / i)
                            + ((CAST(tss AS DOUBLE) - CAST(css AS DOUBLE))
                               - (CAST(ts_ AS DOUBLE) - CAST(cs AS DOUBLE))
                                 * (CAST(ts_ AS DOUBLE)
                                    - CAST(cs AS DOUBLE)) / (n - i)))
                           / (CAST(tss AS DOUBLE) - CAST(ts_ AS DOUBLE)
                              * CAST(ts_ AS DOUBLE) / n), 4)
                 AS var_reduction,
               round(CAST(cs AS DOUBLE) / i / 100.0, 2) AS mean_before,
               round((CAST(ts_ AS DOUBLE) - CAST(cs AS DOUBLE))
                     / (n - i) / 100.0, 2) AS mean_after
        FROM cum, tot
        WHERE i >= {CHANGEPOINT_MIN_SEG} AND n - i >= {CHANGEPOINT_MIN_SEG}
    )
    SELECT * FROM scored ORDER BY sse_split ASC, day ASC LIMIT 1
"""
QUERIES["variance_changepoint"] = variance_changepoint


FUNNEL_SIG_Z = 1.96


def funnel_step_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between consecutive funnel-step conversion
    rates (signup -> click -> purchase counts from funnel_conversion's
    strict-ordering construction): is the drop from step k to k+1
    significantly steeper than the previous drop?  The experiment-style
    read of a funnel table.

    Exactness: counts are exact; the pooled-variance z is one scalar
    expression.
    """
    agg = funnel_conversion(spark, sf_dir).select(
        F.col("n_signup").alias("n1"),
        F.col("n_click_after").alias("n2"),
        F.col("n_purchase_after").alias("n3"),
    )
    n1, n2, n3 = (
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("n3").cast("double"),
    )
    p1, p2 = n2 / n1, n3 / n2
    pool = (n2 + n3) / (n1 + n2)
    var = pool * (1 - pool) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    # degenerate pools (all-convert or none-convert) have zero variance:
    # the rates are identical by construction, so z is exactly 0
    z = F.when(var > 0, (p1 - p2) / F.sqrt(var)).otherwise(F.lit(0.0))
    return agg.select(
        F.col("n1").cast("bigint").alias("n_step1"),
        F.col("n2").cast("bigint").alias("n_step2"),
        F.col("n3").cast("bigint").alias("n_step3"),
        F.round(p1, 4).alias("conv_1_to_2"),
        F.round(p2, 4).alias("conv_2_to_3"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > FUNNEL_SIG_Z).alias("significant"),
    )


ORACLES["funnel_step_significance"] = f"""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    ),
    agg AS (
        SELECT (SELECT count(*) FROM s1) AS n1,
               (SELECT count(*) FROM s2) AS n2,
               (SELECT count(*) FROM s3) AS n3
    )
    SELECT CAST(n1 AS BIGINT) AS n_step1, CAST(n2 AS BIGINT) AS n_step2,
           CAST(n3 AS BIGINT) AS n_step3,
           round(CAST(n2 AS DOUBLE) / n1, 4) AS conv_1_to_2,
           round(CAST(n3 AS DOUBLE) / n2, 4) AS conv_2_to_3,
           round(CASE WHEN (CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                           * (1 - CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                           * (1.0 / n1 + 1.0 / n2) > 0
                 THEN (CAST(n2 AS DOUBLE) / n1 - CAST(n3 AS DOUBLE) / n2)
                      / sqrt((CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                             * (1 - CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                             * (1.0 / n1 + 1.0 / n2))
                 ELSE 0.0 END, 4) AS z_stat,
           abs(CASE WHEN (CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                         * (1 - CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                         * (1.0 / n1 + 1.0 / n2) > 0
               THEN (CAST(n2 AS DOUBLE) / n1 - CAST(n3 AS DOUBLE) / n2)
                    / sqrt((CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                           * (1 - CAST(n2 + n3 AS DOUBLE) / (n1 + n2))
                           * (1.0 / n1 + 1.0 / n2))
               ELSE 0.0 END) > {FUNNEL_SIG_Z}
             AS significant
    FROM agg
"""
QUERIES["funnel_step_significance"] = funnel_step_significance


# --------------------------------------------------------------------------
# woe_iv_binning — weight-of-evidence / information-value feature report
# --------------------------------------------------------------------------

WOE_BIN_CENTS = 4_000  # $40-wide value bins
WOE_MAX_BIN = 9  # bins 0..9; the top bin absorbs the tail


def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence and Information-Value binning of ``events.value``
    against the error-event indicator (bad = event_type 'error') — the
    credit-scoring feature-screening report (WoE_b = ln(good-share /
    bad-share), IV = sum (gshare - bshare) * WoE with 0.5 Laplace
    smoothing per bin so empty-side bins stay finite).

    Exactness: fixed-width cent bins (no quantile boundaries to diverge),
    exact integer counts, and WoE's argument assembled as ONE ratio of
    half-integer products ((g+0.5)*(B+5) / ((b+0.5)*(G+5)) — every factor
    exactly representable) so ln sees bit-identical doubles.  IV terms are
    >= 0 by construction, so the order-pinned cumulative total is
    max(cum).

    Scale: one map-side-combined groupBy to <= 10 bins; all arithmetic on
    that frame.
    """
    e = load_table(spark, sf_dir, "events")
    binc = F.least(
        F.floor(F.round(F.col("value") * 100).cast("long") / F.lit(WOE_BIN_CENTS)),
        F.lit(WOE_MAX_BIN),
    ).cast("int")
    g = (
        e.select(binc.alias("bin"), (F.col("event_type") == "error").alias("bad"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(~F.col("bad"), 1).otherwise(0)).alias("n_good"),
            F.sum(F.when(F.col("bad"), 1).otherwise(0)).alias("n_bad"),
        )
    )
    wall = Window.partitionBy()
    t = g.withColumn("tg", F.sum("n_good").over(wall)).withColumn(
        "tb", F.sum("n_bad").over(wall)
    )
    smooth_bins = WOE_MAX_BIN + 1
    gs = (F.col("n_good") + F.lit(0.5)) / (F.col("tg") + F.lit(float(smooth_bins) / 2))
    bs = (F.col("n_bad") + F.lit(0.5)) / (F.col("tb") + F.lit(float(smooth_bins) / 2))
    woe = F.log(
        (F.col("n_good") + F.lit(0.5))
        * (F.col("tb") + F.lit(float(smooth_bins) / 2))
        / (
            (F.col("n_bad") + F.lit(0.5))
            * (F.col("tg") + F.lit(float(smooth_bins) / 2))
        )
    )
    iv_term = (gs - bs) * woe
    wcum = wall.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    scored = t.withColumn("woe", woe).withColumn("iv_term", iv_term).withColumn(
        "iv_cum", F.sum("iv_term").over(wcum)
    )
    wfull = wall.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "bin",
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        F.round("woe", 6).alias("woe"),
        F.round("iv_term", 6).alias("iv_term"),
        F.round(F.max("iv_cum").over(wfull), 6).alias("iv_total"),
    ).orderBy("bin")


QUERIES["woe_iv_binning"] = woe_iv_binning
ORACLES["woe_iv_binning"] = f"""
    WITH g AS (
        SELECT least(CAST(floor(CAST(round(value * 100) AS BIGINT)
                                / {WOE_BIN_CENTS}.0) AS BIGINT),
                     {WOE_MAX_BIN}) AS bin,
               sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS n_good,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_bad
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT bin, n_good, n_bad,
               sum(n_good) OVER () AS tg, sum(n_bad) OVER () AS tb
        FROM g
    ),
    scored AS (
        SELECT bin, n_good, n_bad,
               ln((n_good + 0.5) * (tb + 5.0) / ((n_bad + 0.5) * (tg + 5.0)))
                   AS woe,
               ((n_good + 0.5) / (tg + 5.0) - (n_bad + 0.5) / (tb + 5.0))
               * ln((n_good + 0.5) * (tb + 5.0) / ((n_bad + 0.5) * (tg + 5.0)))
                   AS iv_term
        FROM t
    ),
    cums AS (
        SELECT bin, n_good, n_bad, woe, iv_term,
               sum(iv_term) OVER (ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS iv_cum
        FROM scored
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
           round(woe, 6) AS woe, round(iv_term, 6) AS iv_term,
           round(max(iv_cum) OVER (), 6) AS iv_total
    FROM cums ORDER BY bin
"""


# --------------------------------------------------------------------------
# control_chart_days — Shewhart x-chart with a Western Electric run rule
# --------------------------------------------------------------------------


def control_chart_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control over daily purchase revenue: Shewhart
    rule 1 (a day beyond 3 sigma of the series mean) and Western Electric
    rule 2 (two of three consecutive days beyond 2 sigma on the SAME
    side) — the monitoring layer behind anomaly_days, but on revenue and
    with flip-proof limits.

    Exactness: with dev = n*x - T and var_n = n*Q - T^2 (all exact
    decimal(38,0) from integer cents), |x - mean| > k*sigma is EXACTLY
    dev^2 > k^2 * var_n — an integer comparison that cannot flip between
    engines; the reported z = dev / sqrt(var_n) is two float ops on
    exact-integer-derived doubles.

    Scale: one groupBy to the day frame; windows run on days only.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)"))
            .alias("rev")
        )
    )
    wall = Window.partitionBy()
    t = (
        daily.withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("tt", F.sum("rev").over(wall))
        .withColumn("q", F.sum(F.col("rev") * F.col("rev")).over(wall))
    )
    dev = F.col("n").cast("decimal(38,0)") * F.col("rev") - F.col("tt")
    var_n = F.col("n").cast("decimal(38,0)") * F.col("q") - F.col("tt") * F.col("tt")
    t = t.withColumn("dev", dev).withColumn("var_n", var_n)
    beyond3 = F.col("dev") * F.col("dev") > F.lit(9) * F.col("var_n")
    beyond2 = F.col("dev") * F.col("dev") > F.lit(4) * F.col("var_n")
    above2 = beyond2 & (F.col("dev") > 0)
    below2 = beyond2 & (F.col("dev") < 0)
    wday = wall.orderBy("day")
    t = (
        t.withColumn("a2", above2)
        .withColumn("b2", below2)
        .withColumn("rule1", beyond3)
    )
    rule2 = (
        F.col("a2")
        & (
            F.coalesce(F.lag("a2", 1).over(wday), F.lit(False))
            | F.coalesce(F.lag("a2", 2).over(wday), F.lit(False))
        )
    ) | (
        F.col("b2")
        & (
            F.coalesce(F.lag("b2", 1).over(wday), F.lit(False))
            | F.coalesce(F.lag("b2", 2).over(wday), F.lit(False))
        )
    )
    z = F.col("dev").cast("double") / F.sqrt(F.col("var_n").cast("double"))
    return t.select(
        "day",
        F.round(F.col("rev").cast("double") / F.lit(100.0), 2).alias(
            "revenue_dollars"
        ),
        F.round(z, 4).alias("z_score"),
        F.col("rule1").alias("rule1_beyond_3sigma"),
        rule2.alias("rule2_two_of_three"),
    ).orderBy("day")


QUERIES["control_chart_days"] = control_chart_days
ORACLES["control_chart_days"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS HUGEINT)) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    t AS (
        SELECT day, rev,
               count(*) OVER () AS n,
               sum(rev) OVER () AS tt,
               sum(rev * rev) OVER () AS q
        FROM daily
    ),
    d AS (
        SELECT day, rev, n * rev - tt AS dev, n * q - tt * tt AS var_n
        FROM t
    ),
    flags AS (
        SELECT day, rev, dev, var_n,
               dev * dev > 9 * var_n AS rule1,
               dev * dev > 4 * var_n AND dev > 0 AS a2,
               dev * dev > 4 * var_n AND dev < 0 AS b2
        FROM d
    ),
    runs AS (
        SELECT day, rev, dev, var_n, rule1,
               (a2 AND (coalesce(lag(a2, 1) OVER (ORDER BY day), false)
                        OR coalesce(lag(a2, 2) OVER (ORDER BY day), false)))
               OR
               (b2 AND (coalesce(lag(b2, 1) OVER (ORDER BY day), false)
                        OR coalesce(lag(b2, 2) OVER (ORDER BY day), false)))
                   AS rule2
        FROM flags
    )
    SELECT day,
           round(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue_dollars,
           round(CAST(dev AS DOUBLE) / sqrt(CAST(var_n AS DOUBLE)), 4) AS z_score,
           rule1 AS rule1_beyond_3sigma,
           rule2 AS rule2_two_of_three
    FROM runs ORDER BY day
"""


# --------------------------------------------------------------------------
# littles_law_audit — L = lambda * W consistency check per month
# --------------------------------------------------------------------------

_EPOCH = "1995-01-01"  # first order date at every SF


def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queueing audit of the order-fulfilment pipeline: per calendar month,
    average work-in-progress L (orders open, by exact day-overlap
    integration), arrival rate lambda (orders placed / days), average
    residence W (days from order to last shipment, arrivals' cohort), and
    the Little's-law ratio L / (lambda * W) — 1.0 when the system is
    stationary, boundary effects show as deviations.

    Exactness: all day arithmetic is integer (datediff from a pinned
    epoch); an order resides over [arrival_day, depart_day + 1), so every
    month overlap is an exact integer day count and only the three final
    report divisions are float.

    Scale: the per-order frame joins orders to a per-order max(shipdate)
    aggregate; the month explode is bounded by residence months (<= ~4);
    both rollups reduce to the month grid.
    """
    o = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("ship"))
    )
    epoch = F.lit(_EPOCH).cast("date")
    # the synthetic corpus carries ship dates BEFORE their order date;
    # clamp departure to the arrival day (same-day completion) so the
    # residence interval is always well-formed — and so Spark's sequence()
    # (which auto-steps DOWN on an inverted range, unlike DuckDB's
    # generate_series returning empty) never sees dmi < ami
    per = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.datediff(F.to_date("o_orderdate"), epoch).alias("a"),
        F.greatest(
            F.datediff(F.col("ship"), epoch),
            F.datediff(F.to_date("o_orderdate"), epoch),
        ).alias("d"),
        (
            (F.year(F.to_date("o_orderdate")) - 1995) * 12
            + F.month(F.to_date("o_orderdate"))
            - 1
        ).alias("ami"),
        F.greatest(
            (F.year("ship") - 1995) * 12 + F.month("ship") - 1,
            (F.year(F.to_date("o_orderdate")) - 1995) * 12
            + F.month(F.to_date("o_orderdate"))
            - 1,
        ).alias("dmi"),
    )
    # month grid rows: exploded per-order months with exact overlap days
    mm = per.select(
        "a", "d", F.explode(F.sequence(F.col("ami"), F.col("dmi"))).alias("m")
    )
    y = (F.lit(1995) + F.floor(F.col("m") / 12)).cast("int")
    mo = (F.col("m") % 12 + 1).cast("int")
    mstart = F.make_date(y, mo, F.lit(1))
    ms = F.datediff(mstart, epoch)
    me = F.datediff(F.add_months(mstart, 1), epoch)
    overlap = F.least(F.col("d") + 1, me) - F.greatest(F.col("a"), ms)
    occ = mm.groupBy("m").agg(
        F.sum(overlap.cast("decimal(38,0)")).alias("open_days"),
        F.max(me - ms).alias("mdays"),
    )
    arr = per.groupBy(F.col("ami").alias("m")).agg(
        F.count(F.lit(1)).alias("n_arrivals"),
        F.sum((F.col("d") - F.col("a") + 1).cast("decimal(38,0)")).alias("res_days"),
    )
    j = occ.join(arr, "m", "left")
    ld = F.col("open_days").cast("double") / F.col("mdays").cast("double")
    lam = F.col("n_arrivals").cast("double") / F.col("mdays").cast("double")
    wd = F.col("res_days").cast("double") / F.col("n_arrivals").cast("double")
    return j.select(
        F.make_date(
            (F.lit(1995) + F.floor(F.col("m") / 12)).cast("int"),
            (F.col("m") % 12 + 1).cast("int"),
            F.lit(1),
        ).alias("month"),
        F.coalesce(F.col("n_arrivals"), F.lit(0)).cast("long").alias("n_arrivals"),
        F.round(ld, 4).alias("l_avg_open"),
        F.round(lam, 4).alias("lambda_per_day"),
        F.round(wd, 4).alias("w_days"),
        F.round(ld / (lam * wd), 4).alias("littles_ratio"),
    ).orderBy("month")


QUERIES["littles_law_audit"] = littles_law_audit
ORACLES["littles_law_audit"] = f"""
    WITH li AS (
        SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship
        FROM lineitem GROUP BY 1
    ),
    per AS (
        SELECT datediff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE)) AS a,
               greatest(datediff('day', DATE '{_EPOCH}', ship),
                        datediff('day', DATE '{_EPOCH}',
                                 CAST(o_orderdate AS DATE))) AS d,
               (year(CAST(o_orderdate AS DATE)) - 1995) * 12
                   + month(CAST(o_orderdate AS DATE)) - 1 AS ami,
               greatest((year(ship) - 1995) * 12 + month(ship) - 1,
                        (year(CAST(o_orderdate AS DATE)) - 1995) * 12
                            + month(CAST(o_orderdate AS DATE)) - 1) AS dmi
        FROM orders JOIN li ON o_orderkey = l_orderkey
    ),
    mm AS (
        SELECT a, d, CAST(u.m AS BIGINT) AS m
        FROM per, unnest(generate_series(ami, dmi)) AS u(m)
    ),
    grid AS (
        SELECT m, a, d,
               make_date(CAST(1995 + floor(m / 12) AS INT),
                         CAST(m % 12 + 1 AS INT), 1) AS mstart
        FROM mm
    ),
    ov AS (
        SELECT m,
               least(d + 1, datediff('day', DATE '{_EPOCH}',
                                     CAST(mstart + INTERVAL 1 MONTH AS DATE)))
               - greatest(a, datediff('day', DATE '{_EPOCH}', mstart)) AS overlap,
               datediff('day', DATE '{_EPOCH}',
                        CAST(mstart + INTERVAL 1 MONTH AS DATE))
               - datediff('day', DATE '{_EPOCH}', mstart) AS mdays
        FROM grid
    ),
    occ AS (
        SELECT m, sum(overlap) AS open_days, max(mdays) AS mdays
        FROM ov GROUP BY 1
    ),
    arr AS (
        SELECT ami AS m, count(*) AS n_arrivals,
               sum(d - a + 1) AS res_days
        FROM per GROUP BY 1
    )
    SELECT make_date(CAST(1995 + floor(occ.m / 12) AS INT),
                     CAST(occ.m % 12 + 1 AS INT), 1) AS month,
           CAST(coalesce(n_arrivals, 0) AS BIGINT) AS n_arrivals,
           round(CAST(open_days AS DOUBLE) / CAST(mdays AS DOUBLE), 4)
               AS l_avg_open,
           round(CAST(n_arrivals AS DOUBLE) / CAST(mdays AS DOUBLE), 4)
               AS lambda_per_day,
           round(CAST(res_days AS DOUBLE) / CAST(n_arrivals AS DOUBLE), 4)
               AS w_days,
           round((CAST(open_days AS DOUBLE) / CAST(mdays AS DOUBLE))
                 / ((CAST(n_arrivals AS DOUBLE) / CAST(mdays AS DOUBLE))
                    * (CAST(res_days AS DOUBLE) / CAST(n_arrivals AS DOUBLE))),
                 4) AS littles_ratio
    FROM occ LEFT JOIN arr ON occ.m = arr.m
    ORDER BY month
"""


# --------------------------------------------------------------------------
# newsvendor_stock_level — critical-ratio stocking per brand
# --------------------------------------------------------------------------

NEWSVENDOR_SERVICE_NUM = 9  # target service level 0.9 = NUM / 10


def newsvendor_stock_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking report per part brand: the 90%-critical-ratio
    stock level is the exact 0.9 order statistic of observed daily demand
    (percentile_disc semantics — rank ceil(0.9 * n_days) on the bounded
    demand grid), with the achieved service level (share of observed days
    whose demand the stock covers) read off the same grid.

    Exactness: demand is integer units; the quantile is an integer order
    statistic picked by exact integer rank arithmetic — nothing to
    interpolate, nothing to flip.

    Scale: facts reduce to the (brand, day) frame, then to the (brand,
    demand) grid; the cumulative window runs per brand on that bounded
    grid.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", F.round(F.col("l_quantity")).cast("long").alias("q")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("day")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "day")
        .agg(F.sum("q").alias("demand"))
    )
    grid = daily.groupBy("p_brand", "demand").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.partitionBy("p_brand")
    wcum = wb.orderBy("demand").rowsBetween(Window.unboundedPreceding, 0)
    t = grid.withColumn("n_days", F.sum("cnt").over(wb)).withColumn(
        "cum", F.sum("cnt").over(wcum)
    )
    # k = ceil(0.9 * n_days), exact integer arithmetic
    k = F.floor(
        ((F.col("n_days") * NEWSVENDOR_SERVICE_NUM + 9) / F.lit(10)).cast("double")
    )
    hit = t.filter(F.col("cum") >= k).groupBy("p_brand").agg(
        F.min("demand").alias("stock_level"), F.max("n_days").alias("n_days")
    )
    svc = (
        grid.join(hit, "p_brand")
        .groupBy("p_brand", "stock_level", "n_days")
        .agg(
            F.sum(F.when(F.col("demand") <= F.col("stock_level"), F.col("cnt"))
                  .otherwise(0)).alias("n_covered")
        )
    )
    return svc.select(
        "p_brand",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("stock_level").cast("long").alias("stock_level"),
        F.round(
            F.col("n_covered").cast("double") / F.col("n_days").cast("double"), 6
        ).alias("service_level"),
    ).orderBy("p_brand")


QUERIES["newsvendor_stock_level"] = newsvendor_stock_level
ORACLES["newsvendor_stock_level"] = f"""
    WITH daily AS (
        SELECT p_brand, CAST(o_orderdate AS DATE) AS day,
               sum(CAST(round(l_quantity) AS BIGINT)) AS demand
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT p_brand, demand, count(*) AS cnt FROM daily GROUP BY 1, 2
    ),
    t AS (
        SELECT p_brand, demand, cnt,
               sum(cnt) OVER (PARTITION BY p_brand) AS n_days,
               sum(cnt) OVER (PARTITION BY p_brand ORDER BY demand
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM grid
    ),
    hit AS (
        SELECT p_brand, min(demand) AS stock_level, max(n_days) AS n_days
        FROM t
        WHERE cum >= floor(CAST(n_days * {NEWSVENDOR_SERVICE_NUM} + 9
                                AS DOUBLE) / 10)
        GROUP BY 1
    )
    SELECT g.p_brand,
           CAST(h.n_days AS BIGINT) AS n_days,
           CAST(h.stock_level AS BIGINT) AS stock_level,
           round(CAST(sum(CASE WHEN g.demand <= h.stock_level THEN g.cnt
                               ELSE 0 END) AS DOUBLE)
                 / CAST(h.n_days AS DOUBLE), 6) AS service_level
    FROM grid g JOIN hit h USING (p_brand)
    GROUP BY g.p_brand, h.stock_level, h.n_days
    ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# Experimentation-metrics wave: CUPED, Qini uplift, SPRT replay, Poisson rates
# --------------------------------------------------------------------------

CUPED_SPLIT = "2024-01-16"  # pre-period covariate window boundary


def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., public): per user, covariate
    X = pre-period spend, metric Y = post-period spend; theta =
    cov(X,Y)/var(X) from exact decimal(38,0) moments, and the adjusted
    variance var(Y - theta X) = var(Y) - 2 theta cov + theta^2 var(X) —
    the experimentation platform's first variance-reduction lever, with
    the achieved reduction reported exactly.

    Scale: one per-user reduce, one global moment aggregate (all exact
    integers); the variance algebra is scalar.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    dec = "decimal(38,0)"
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.col("ts") < F.to_timestamp(F.lit(CUPED_SPLIT))
    u = e.groupBy("user_id").agg(
        F.sum(F.when(pre, cents).otherwise(0)).cast(dec).alias("x"),
        F.sum(F.when(~pre, cents).otherwise(0)).cast(dec).alias("y"),
    )
    g = u.groupBy().agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    theta = cxy / vx
    var_y = vy / (n * n)
    var_c = (vy - F.lit(2.0) * theta * cxy + theta * theta * vx) / (n * n)
    return g.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(var_y / F.lit(10000.0), 4).alias("var_y_dollars2"),
        F.round(var_c / F.lit(10000.0), 4).alias("var_cuped_dollars2"),
        F.round((F.lit(1.0) - var_c / var_y) * F.lit(100.0), 4).alias(
            "reduction_pct"
        ),
    )


QUERIES["cuped_variance_reduction"] = cuped_variance_reduction
ORACLES["cuped_variance_reduction"] = f"""
    WITH u AS (
        SELECT user_id,
               sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
               sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
               sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
           round(CAST(n * syy - sy * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0, 4)
               AS var_y_dollars2,
           round((CAST(n * syy - sy * sy AS DOUBLE)
                  - 2.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(n * sxy - sx * sy AS DOUBLE)
                  + (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(n * sxx - sx * sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0, 4)
               AS var_cuped_dollars2,
           round((1.0 - ((CAST(n * syy - sy * sy AS DOUBLE)
                  - 2.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(n * sxy - sx * sy AS DOUBLE)
                  + (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(n * sxx - sx * sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (CAST(n * syy - sy * sy AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) * 100.0, 4)
               AS reduction_pct
    FROM g
"""


def qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve: treated = even user_id, outcome = converted
    (any purchase), targeting score = total event count (activity proxy),
    users ranked into fully tie-broken deciles (score desc, user_id);
    per-decile cumulative Qini = conv_t_cum - conv_c_cum * (n_t_cum /
    n_c_cum) — the uplift companion of decile_gains_table's response
    curve.

    Exactness: counts exact; ntile over a TOTAL order (score, user_id)
    is engine-independent; the cumulative fold runs on the 10-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    u = u.withColumn("treated", (F.col("user_id") % 2 == 0).cast("int"))
    w = Window.orderBy(F.col("score").desc(), F.col("user_id"))
    d = u.withColumn("decile", F.ntile(10).over(w))
    g = d.groupBy("decile").agg(
        F.sum("treated").alias("n_t"),
        F.sum(F.lit(1) - F.col("treated")).alias("n_c"),
        F.sum(F.col("treated") * F.col("conv")).alias("conv_t"),
        F.sum((F.lit(1) - F.col("treated")) * F.col("conv")).alias("conv_c"),
    )
    wcum = Window.partitionBy().orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = (
        g.withColumn("ct", F.sum("conv_t").over(wcum))
        .withColumn("cc", F.sum("conv_c").over(wcum))
        .withColumn("nt", F.sum("n_t").over(wcum))
        .withColumn("nc", F.sum("n_c").over(wcum))
    )
    qini = F.col("ct").cast("double") - F.col("cc").cast("double") * (
        F.col("nt").cast("double") / F.col("nc").cast("double")
    )
    return c.select(
        "decile",
        F.col("n_t").cast("long").alias("n_treated"),
        F.col("n_c").cast("long").alias("n_control"),
        F.col("conv_t").cast("long").alias("conv_treated"),
        F.col("conv_c").cast("long").alias("conv_control"),
        # + 0.0 canonicalizes IEEE negative zero (the logistic beta class)
        (F.round(qini, 4) + F.lit(0.0)).alias("qini_cum"),
    ).orderBy("decile")


QUERIES["qini_uplift_curve"] = qini_uplift_curve
ORACLES["qini_uplift_curve"] = """
    WITH u AS (
        SELECT user_id, count(*) AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM u
    ),
    g AS (
        SELECT decile,
               sum(treated) AS n_t, sum(1 - treated) AS n_c,
               sum(treated * conv) AS conv_t,
               sum((1 - treated) * conv) AS conv_c
        FROM d GROUP BY 1
    ),
    c AS (
        SELECT decile, n_t, n_c, conv_t, conv_c,
               sum(conv_t) OVER wo AS ct, sum(conv_c) OVER wo AS cc,
               sum(n_t) OVER wo AS nt, sum(n_c) OVER wo AS nc
        FROM g
        WINDOW wo AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    )
    SELECT decile,
           CAST(n_t AS BIGINT) AS n_treated, CAST(n_c AS BIGINT) AS n_control,
           CAST(conv_t AS BIGINT) AS conv_treated,
           CAST(conv_c AS BIGINT) AS conv_control,
           round(CAST(ct AS DOUBLE)
                 - CAST(cc AS DOUBLE)
                   * (CAST(nt AS DOUBLE) / CAST(nc AS DOUBLE)), 4) + 0.0
               AS qini_cum
    FROM c ORDER BY decile
"""


SPRT_ALPHA_LN_UPPER = 2.772588722239781  # ln((1-0.2)/0.05) = ln(16)
SPRT_LN_LOWER = -1.5581446180024529  # ln(0.2/0.95)


def sprt_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT replay: H0 = the purchase share of the pre-period
    (days 1-15), H1 = a 10% relative lift; replay days 16-30 accumulating
    the exact-count log-likelihood ratio and report the sequential
    decision state each day — the always-valid companion of the fixed-n
    ab_power_analysis.

    Exactness: p0 is one division of exact pre-period integers; daily LLR
    terms are k * ln(p1/p0) + (n - k) * ln(q1/q0) on identical doubles;
    the day fold is ORDER-PINNED.
    """
    e = load_table(spark, sf_dir, "events")
    pre = F.col("ts") < F.to_timestamp(F.lit(CUPED_SPLIT))
    base = e.groupBy().agg(
        F.sum(F.when(pre & (F.col("event_type") == "purchase"), 1).otherwise(0))
        .alias("k0"),
        F.sum(F.when(pre, 1).otherwise(0)).alias("n0"),
    )
    daily = (
        e.filter(~pre)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("k"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    j = daily.crossJoin(F.broadcast(base))
    p0 = F.col("k0").cast("double") / F.col("n0").cast("double")
    p1 = F.least(p0 * F.lit(1.1), F.lit(0.999))
    llr = F.col("k").cast("double") * F.log(p1 / p0) + (
        F.col("n") - F.col("k")
    ).cast("double") * F.log((F.lit(1.0) - p1) / (F.lit(1.0) - p0))
    wcum = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = j.withColumn("cum_llr", F.sum(llr).over(wcum))
    decision = (
        F.when(F.col("cum_llr") >= SPRT_ALPHA_LN_UPPER, "accept_h1")
        .when(F.col("cum_llr") <= SPRT_LN_LOWER, "accept_h0")
        .otherwise("continue")
    )
    return c.select(
        "day",
        F.col("k").cast("long").alias("conversions"),
        F.col("n").cast("long").alias("trials"),
        F.round("cum_llr", 6).alias("cum_llr"),
        decision.alias("decision"),
    ).orderBy("day")


QUERIES["sprt_replay"] = sprt_replay
ORACLES["sprt_replay"] = f"""
    WITH base AS (
        SELECT sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS k0,
               sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                        THEN 1 ELSE 0 END) AS n0
        FROM events
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k,
               count(*) AS n
        FROM events WHERE ts >= TIMESTAMP '{CUPED_SPLIT}' GROUP BY 1
    ),
    j AS (
        SELECT day, k, n,
               CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
               least(CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1.1, 0.999) AS p1
        FROM daily, base
    ),
    c AS (
        SELECT day, k, n,
               sum(CAST(k AS DOUBLE) * ln(p1 / p0)
                   + CAST(n - k AS DOUBLE) * ln((1.0 - p1) / (1.0 - p0)))
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_llr
        FROM j
    )
    SELECT day, CAST(k AS BIGINT) AS conversions, CAST(n AS BIGINT) AS trials,
           round(cum_llr, 6) AS cum_llr,
           CASE WHEN cum_llr >= {SPRT_ALPHA_LN_UPPER} THEN 'accept_h1'
                WHEN cum_llr <= {SPRT_LN_LOWER} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c ORDER BY day
"""


def poisson_rate_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-effect Poisson rate model on daily purchase counts: the
    binary-covariate GLM has a CLOSED-FORM MLE (lambda = per-segment mean
    count; beta1 = ln rate ratio), reported with the Wald CI on the log
    rate ratio (sqrt(1/K_wd + 1/K_we) under the Poisson likelihood) —
    the count-data companion of ols/logistic/cox in the in-engine model
    tier.

    Exactness: event and day counts are exact integers; ln/sqrt on
    identical doubles.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # Spark dayofweek: 1 = Sunday .. 7 = Saturday
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("k")
    )
    tagged = daily.withColumn(
        "weekend", F.dayofweek("day").isin(1, 7).cast("int")
    )
    g = tagged.groupBy().agg(
        F.sum(F.when(F.col("weekend") == 0, F.col("k")).otherwise(0)).alias("k_wd"),
        F.sum(F.when(F.col("weekend") == 0, 1).otherwise(0)).alias("d_wd"),
        F.sum(F.when(F.col("weekend") == 1, F.col("k")).otherwise(0)).alias("k_we"),
        F.sum(F.when(F.col("weekend") == 1, 1).otherwise(0)).alias("d_we"),
    )
    lam_wd = F.col("k_wd").cast("double") / F.col("d_wd").cast("double")
    lam_we = F.col("k_we").cast("double") / F.col("d_we").cast("double")
    b1 = F.log(lam_we / lam_wd)
    se = F.sqrt(
        F.lit(1.0) / F.col("k_wd").cast("double")
        + F.lit(1.0) / F.col("k_we").cast("double")
    )
    return g.select(
        F.col("k_wd").cast("long").alias("events_weekday"),
        F.col("d_wd").cast("long").alias("days_weekday"),
        F.col("k_we").cast("long").alias("events_weekend"),
        F.col("d_we").cast("long").alias("days_weekend"),
        F.round(lam_wd, 4).alias("rate_weekday"),
        F.round(lam_we, 4).alias("rate_weekend"),
        F.round(b1, 6).alias("log_rate_ratio"),
        F.round(b1 - F.lit(1.959963984540054) * se, 6).alias("lrr_ci_lo"),
        F.round(b1 + F.lit(1.959963984540054) * se, 6).alias("lrr_ci_hi"),
    )


QUERIES["poisson_rate_model"] = poisson_rate_model
ORACLES["poisson_rate_model"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS k
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tagged AS (
        SELECT day, k,
               CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END AS weekend
        FROM daily
    ),
    g AS (
        SELECT sum(CASE WHEN weekend = 0 THEN k ELSE 0 END) AS k_wd,
               sum(CASE WHEN weekend = 0 THEN 1 ELSE 0 END) AS d_wd,
               sum(CASE WHEN weekend = 1 THEN k ELSE 0 END) AS k_we,
               sum(CASE WHEN weekend = 1 THEN 1 ELSE 0 END) AS d_we
        FROM tagged
    )
    SELECT CAST(k_wd AS BIGINT) AS events_weekday,
           CAST(d_wd AS BIGINT) AS days_weekday,
           CAST(k_we AS BIGINT) AS events_weekend,
           CAST(d_we AS BIGINT) AS days_weekend,
           round(CAST(k_wd AS DOUBLE) / CAST(d_wd AS DOUBLE), 4) AS rate_weekday,
           round(CAST(k_we AS DOUBLE) / CAST(d_we AS DOUBLE), 4) AS rate_weekend,
           round(ln((CAST(k_we AS DOUBLE) / CAST(d_we AS DOUBLE))
                    / (CAST(k_wd AS DOUBLE) / CAST(d_wd AS DOUBLE))), 6)
               AS log_rate_ratio,
           round(ln((CAST(k_we AS DOUBLE) / CAST(d_we AS DOUBLE))
                    / (CAST(k_wd AS DOUBLE) / CAST(d_wd AS DOUBLE)))
                 - 1.959963984540054
                   * sqrt(1.0 / CAST(k_wd AS DOUBLE)
                          + 1.0 / CAST(k_we AS DOUBLE)), 6) AS lrr_ci_lo,
           round(ln((CAST(k_we AS DOUBLE) / CAST(d_we AS DOUBLE))
                    / (CAST(k_wd AS DOUBLE) / CAST(d_wd AS DOUBLE)))
                 + 1.959963984540054
                   * sqrt(1.0 / CAST(k_wd AS DOUBLE)
                          + 1.0 / CAST(k_we AS DOUBLE)), 6) AS lrr_ci_hi
    FROM g
"""


# --------------------------------------------------------------------------
# Reporting closers: revenue waterfall, box-plot stats, weekday seasonality
# --------------------------------------------------------------------------


def revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand revenue decomposition gross -> discount -> net -> tax ->
    final charge, micro-cent EXACT: discounts and taxes live on their
    2-decimal grids, so every component is an integer sum of
    extprice_cents * bp products (decimal(38,0)), divided back to dollars
    only in the final projection — the finance-reconciliation query where
    float drift is unacceptable.

    Scale: one fact scan, map-side combined to the brand frame.
    """
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ext"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d_bp"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t_bp"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    g = rows.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("ext").cast(dec)).alias("gross"),
        F.sum(F.col("ext").cast(dec) * F.col("d_bp").cast(dec)).alias("disc100"),
        F.sum(
            F.col("ext").cast(dec)
            * (F.lit(100).cast(dec) - F.col("d_bp").cast(dec))
            * F.col("t_bp").cast(dec)
        ).alias("tax10000"),
    )
    gross_d = F.col("gross").cast("double") / F.lit(100.0)
    disc_d = F.col("disc100").cast("double") / F.lit(10000.0)
    net_d = gross_d - disc_d
    tax_d = F.col("tax10000").cast("double") / F.lit(1000000.0)
    return g.select(
        "p_brand",
        F.col("n_items").cast("long").alias("n_items"),
        F.round(gross_d, 2).alias("gross_dollars"),
        F.round(disc_d, 2).alias("discount_dollars"),
        F.round(net_d, 2).alias("net_dollars"),
        F.round(tax_d, 2).alias("tax_dollars"),
        F.round(net_d + tax_d, 2).alias("charge_dollars"),
    ).orderBy("p_brand")


QUERIES["revenue_waterfall"] = revenue_waterfall
ORACLES["revenue_waterfall"] = """
    WITH rows_ AS (
        SELECT p_brand,
               CAST(round(l_extendedprice * 100) AS HUGEINT) AS ext,
               CAST(round(l_discount * 100) AS HUGEINT) AS d_bp,
               CAST(round(l_tax * 100) AS HUGEINT) AS t_bp
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    g AS (
        SELECT p_brand, count(*) AS n_items,
               sum(ext) AS gross, sum(ext * d_bp) AS disc100,
               sum(ext * (100 - d_bp) * t_bp) AS tax10000
        FROM rows_ GROUP BY 1
    )
    SELECT p_brand, CAST(n_items AS BIGINT) AS n_items,
           round(CAST(gross AS DOUBLE) / 100.0, 2) AS gross_dollars,
           round(CAST(disc100 AS DOUBLE) / 10000.0, 2) AS discount_dollars,
           round(CAST(gross AS DOUBLE) / 100.0
                 - CAST(disc100 AS DOUBLE) / 10000.0, 2) AS net_dollars,
           round(CAST(tax10000 AS DOUBLE) / 1000000.0, 2) AS tax_dollars,
           round((CAST(gross AS DOUBLE) / 100.0
                  - CAST(disc100 AS DOUBLE) / 10000.0)
                 + CAST(tax10000 AS DOUBLE) / 1000000.0, 2) AS charge_dollars
    FROM g ORDER BY p_brand
"""


def boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type box-plot (Tukey) statistics with EXACT order-statistic
    quartiles (percentile_disc ranks on the bounded cent grid) and
    flip-proof integer whisker tests: a value is an outlier iff
    2*cv < 2*q1 - 3*iqr (low) or 2*cv > 2*q3 + 3*iqr (high) — the 1.5*IQR
    fences cross-multiplied by 2 so no float ever enters the comparison.

    Scale: one reduce to the (type, cent) grid; quartile ranks and
    outlier counts read off that bounded frame.
    """
    e = load_table(spark, sf_dir, "events")
    grid = e.groupBy(
        F.col("event_type").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wt = Window.partitionBy("t")
    wcum = wt.orderBy("cv").rowsBetween(Window.unboundedPreceding, 0)
    t = grid.withColumn("n", F.sum("cnt").over(wt)).withColumn(
        "cum", F.sum("cnt").over(wcum)
    )

    def q_rank(num: int, den: int):
        # k = ceil(num/den * n), exact integer arithmetic
        return F.floor(((F.col("n") * num + (den - 1)) / F.lit(den)).cast("double"))

    qs = []
    for name, num, den in (("q1", 1, 4), ("q2", 2, 4), ("q3", 3, 4)):
        hit = t.filter(F.col("cum") >= q_rank(num, den)).groupBy("t").agg(
            F.min("cv").alias(name)
        )
        qs.append(hit)
    j = qs[0].join(qs[1], "t").join(qs[2], "t")
    full = grid.join(j, "t")
    iqr = F.col("q3") - F.col("q1")
    low = F.lit(2) * F.col("cv") < F.lit(2) * F.col("q1") - F.lit(3) * iqr
    high = F.lit(2) * F.col("cv") > F.lit(2) * F.col("q3") + F.lit(3) * iqr
    g = full.groupBy("t", "q1", "q2", "q3").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.when(low, F.col("cnt")).otherwise(0)).alias("n_low"),
        F.sum(F.when(high, F.col("cnt")).otherwise(0)).alias("n_high"),
    )
    return g.select(
        F.col("t").alias("event_type"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("q1").cast("double") / F.lit(100.0), 2).alias("q1_dollars"),
        F.round(F.col("q2").cast("double") / F.lit(100.0), 2).alias("median_dollars"),
        F.round(F.col("q3").cast("double") / F.lit(100.0), 2).alias("q3_dollars"),
        F.col("n_low").cast("long").alias("n_low_outliers"),
        F.col("n_high").cast("long").alias("n_high_outliers"),
    ).orderBy("event_type")


QUERIES["boxplot_stats"] = boxplot_stats
ORACLES["boxplot_stats"] = """
    WITH grid AS (
        SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS cv,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT t, cv, cnt,
               sum(cnt) OVER (PARTITION BY t) AS n,
               sum(cnt) OVER (PARTITION BY t ORDER BY cv
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
        FROM grid
    ),
    q1 AS (SELECT t, min(cv) AS q1 FROM c
           WHERE cum >= floor(CAST(n * 1 + 3 AS DOUBLE) / 4) GROUP BY t),
    q2 AS (SELECT t, min(cv) AS q2 FROM c
           WHERE cum >= floor(CAST(n * 2 + 3 AS DOUBLE) / 4) GROUP BY t),
    q3 AS (SELECT t, min(cv) AS q3 FROM c
           WHERE cum >= floor(CAST(n * 3 + 3 AS DOUBLE) / 4) GROUP BY t),
    j AS (
        SELECT g.t, g.cv, g.cnt, q1.q1, q2.q2, q3.q3
        FROM grid g JOIN q1 USING (t) JOIN q2 USING (t) JOIN q3 USING (t)
    ),
    g AS (
        SELECT t, q1, q2, q3, sum(cnt) AS n,
               sum(CASE WHEN 2 * cv < 2 * q1 - 3 * (q3 - q1)
                        THEN cnt ELSE 0 END) AS n_low,
               sum(CASE WHEN 2 * cv > 2 * q3 + 3 * (q3 - q1)
                        THEN cnt ELSE 0 END) AS n_high
        FROM j GROUP BY 1, 2, 3, 4
    )
    SELECT t AS event_type, CAST(n AS BIGINT) AS n,
           round(CAST(q1 AS DOUBLE) / 100.0, 2) AS q1_dollars,
           round(CAST(q2 AS DOUBLE) / 100.0, 2) AS median_dollars,
           round(CAST(q3 AS DOUBLE) / 100.0, 2) AS q3_dollars,
           CAST(n_low AS BIGINT) AS n_low_outliers,
           CAST(n_high AS BIGINT) AS n_high_outliers
    FROM g ORDER BY event_type
"""


def weekday_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index of purchase revenue: per weekday, the
    mean daily revenue divided by the all-days mean (index 1.0 = flat) —
    exact integer cent sums and day counts, one division pair per row.

    Scale: one reduce to the 30-day frame, then a 7-row rollup.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)"))
        .alias("rev")
    )
    # Spark dayofweek: 1 = Sunday .. 7 = Saturday; normalize to ISO 1-7 Mon-Sun
    tagged = daily.withColumn(
        "dow", ((F.dayofweek("day") + 5) % 7 + 1).cast("int")
    )
    wall = Window.partitionBy()
    g = tagged.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("rev").alias("rev")
    )
    t = g.withColumn("tot", F.sum("rev").over(wall)).withColumn(
        "tot_days", F.sum("n_days").over(wall)
    )
    per_day = F.col("rev").cast("double") / F.col("n_days").cast("double")
    overall = F.col("tot").cast("double") / F.col("tot_days").cast("double")
    return t.select(
        "dow",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(per_day / F.lit(100.0), 2).alias("mean_daily_dollars"),
        F.round(per_day / overall, 4).alias("seasonal_index"),
    ).orderBy("dow")


QUERIES["weekday_seasonal_index"] = weekday_seasonal_index
ORACLES["weekday_seasonal_index"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS HUGEINT)) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tagged AS (SELECT day, rev, isodow(day) AS dow FROM daily),
    g AS (
        SELECT dow, count(*) AS n_days, sum(rev) AS rev FROM tagged GROUP BY 1
    ),
    t AS (
        SELECT dow, n_days, rev,
               sum(rev) OVER () AS tot, sum(n_days) OVER () AS tot_days
        FROM g
    )
    SELECT CAST(dow AS INT) AS dow, CAST(n_days AS BIGINT) AS n_days,
           round(CAST(rev AS DOUBLE) / CAST(n_days AS DOUBLE) / 100.0, 2)
               AS mean_daily_dollars,
           round((CAST(rev AS DOUBLE) / CAST(n_days AS DOUBLE))
                 / (CAST(tot AS DOUBLE) / CAST(tot_days AS DOUBLE)), 4)
               AS seasonal_index
    FROM t ORDER BY dow
"""


# ---------------------------------------------------------------------------
# round-5 fourth session, wave AA: inequality / concentration reporting
# (completes the revenue_gini tier: the Lorenz curve the Gini integrates,
# the Herfindahl index regulators quote, and the decomposable Theil index)
# ---------------------------------------------------------------------------

LORENZ_BUCKET = 25000.0  # revenue-bucket width for the distributed rank


def lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer order revenue in deciles: customers sorted
    ascending by (revenue, custkey), split into 10 equal-rank bins
    (decile = floor((rank-1)*10/n)+1 — exact integers, no ntile float),
    each reporting its customer count, revenue share, and the cumulative
    share (the curve the Gini coefficient integrates).

    Revenue accumulates as integer cents in decimal(38,0); every share is
    one division of exact integers in the final projection.

    Scale: the global ascending rank uses the same two-pass decomposition
    as revenue_gini — in-bucket row_number + per-bucket cumulative offsets
    from a bucket-cardinality frame — never a one-task global sort window.
    The oracle runs the naive global window; the hash match is the
    equivalence proof.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)"))
        .alias("rev")
    )
    b = rev.withColumn(
        "bkt", F.floor(F.col("rev").cast("double") / F.lit(LORENZ_BUCKET * 100)).cast("long")
    )
    win_in = Window.partitionBy("bkt").orderBy("rev", "o_custkey")
    in_rank = b.withColumn("r_in", F.row_number().over(win_in))
    counts = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.partitionBy().orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bkt", "off")
    ranked = in_rank.join(F.broadcast(offsets), "bkt").select(
        "rev", (F.col("off") + F.col("r_in")).alias("rk")
    )
    # total n from the bounded bucket frame (1-row broadcast), never a
    # whole-frame unpartitioned count window
    n_total = counts.agg(F.sum("cnt").alias("n"))
    t = ranked.crossJoin(F.broadcast(n_total)).withColumn(
        "dec", (F.floor((F.col("rk") - 1) * 10 / F.col("n")) + 1).cast("int")
    )
    wall = Window.partitionBy()
    g = t.groupBy("dec").agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("rev").alias("rev")
    )
    cum = Window.partitionBy().orderBy("dec").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = (
        g.withColumn("tot", F.sum("rev").over(wall))
        .withColumn("crev", F.sum("rev").over(cum))
    )
    share = F.col("rev").cast("double") / F.col("tot").cast("double")
    cshare = F.col("crev").cast("double") / F.col("tot").cast("double")
    return out.select(
        F.col("dec").alias("decile"),
        F.col("n_cust").cast("long").alias("n_customers"),
        F.round(F.col("rev").cast("double") / 100.0, 2).alias("revenue_dollars"),
        F.round(share, 6).alias("revenue_share"),
        F.round(cshare, 6).alias("cum_share"),
    ).orderBy("decile")


QUERIES["lorenz_deciles"] = lorenz_deciles
ORACLES["lorenz_deciles"] = """
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rev
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev, o_custkey) AS rk,
               count(*) OVER () AS n
        FROM rev
    ),
    t AS (
        SELECT rev, CAST(floor((rk - 1) * 10 / n) + 1 AS INT) AS dec
        FROM ranked
    ),
    g AS (
        SELECT dec, count(*) AS n_cust, sum(rev) AS rev FROM t GROUP BY 1
    ),
    o AS (
        SELECT dec, n_cust, rev,
               sum(rev) OVER () AS tot,
               sum(rev) OVER (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS crev
        FROM g
    )
    SELECT dec AS decile, CAST(n_cust AS BIGINT) AS n_customers,
           round(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue_dollars,
           round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS revenue_share,
           round(CAST(crev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
    FROM o ORDER BY decile
"""


ATKINSON_SCALE = 1_000_000_000_000  # ln terms rounded to pico-units


def atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (inequality-aversion epsilon = 1) of
    customer order revenue per market segment: A = 1 - geomean(x)/mean(x),
    the welfare-based measure that reads directly as "the share of total
    revenue society would give up for perfect equality" — the normative
    companion of revenue_gini (positional) and theil_inequality
    (entropy-decomposable).

    Determinism: the geometric mean is exp of the mean of per-customer
    ln(x_i) terms; each term is one scalar float expression over the exact
    integer cent revenue, rounded to the 1e-12 grid and summed as integers
    in decimal(38,0) (the info_gain_features pattern) — no cross-row float
    accumulation.  The arithmetic mean is one division of exact integers.

    Scale: one reduce to per-customer revenue, broadcast dim join, one
    map-side-combined integer sum per segment.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)"))
            .alias("x")
        )
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "x")
    )
    terms = rev.select(
        "c_mktsegment",
        F.col("x"),
        F.round(F.log(F.col("x").cast("double")) * ATKINSON_SCALE)
        .cast("long")
        .cast("decimal(38,0)")
        .alias("lnx"),
    )
    g = terms.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("tot"),
        F.sum("lnx").alias("sln"),
    )
    mean_ln = F.col("sln").cast("double") / ATKINSON_SCALE / F.col("n").cast("double")
    mean_x = F.col("tot").cast("double") / F.col("n").cast("double")
    atk = F.lit(1.0) - F.exp(mean_ln) / mean_x
    return g.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        F.round(F.col("tot").cast("double") / 100.0, 2).alias("revenue_dollars"),
        F.round(atk, 8).alias("atkinson_e1"),
    ).orderBy("c_mktsegment")


QUERIES["atkinson_index"] = atkinson_index
ORACLES["atkinson_index"] = f"""
    WITH rev AS (
        SELECT c_mktsegment,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey
    ),
    terms AS (
        SELECT c_mktsegment, x,
               CAST(round(ln(CAST(x AS DOUBLE)) * {ATKINSON_SCALE}) AS HUGEINT)
                   AS lnx
        FROM rev
    ),
    g AS (
        SELECT c_mktsegment, count(*) AS n, sum(x) AS tot, sum(lnx) AS sln
        FROM terms GROUP BY 1
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
           round(CAST(tot AS DOUBLE) / 100.0, 2) AS revenue_dollars,
           round(1.0 - exp(CAST(sln AS DOUBLE) / {ATKINSON_SCALE} / n)
                       / (CAST(tot AS DOUBLE) / n), 8) AS atkinson_e1
    FROM g ORDER BY c_mktsegment
"""


THEIL_SCALE = 1_000_000_000_000  # ln terms rounded to pico-units before summing


def theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer order revenue per market
    segment: T = sum_i (x_i/X) * ln(n * x_i / X) — the entropy-based
    inequality measure that (unlike Gini) decomposes additively.

    Determinism: each customer's term is a single scalar float expression
    over exact integers (cent revenue, segment totals), rounded to the
    1e-12 grid and summed as integers in decimal(38,0) — no cross-row
    float accumulation, so both engines add bit-identical addends in any
    order (the info_gain_features / bandit_replay pattern).

    Scale: one reduce to per-customer revenue, broadcast of the
    segment-totals frame, one map-side-combined integer sum.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)"))
            .alias("x")
        )
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "x")
        # rev is consumed twice (seg + the term pass), but a
        # localCheckpoint cut measured SLOWER solo (r11: 0.576 -> 0.661 s
        # min-of-3, stable canaries): ReusedExchange already dedupes the
        # identical reduce subtree within the one job.  Left lazy.
    )
    seg = rev.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("tot")
    )
    j = rev.join(F.broadcast(seg), "c_mktsegment")
    ratio = F.col("x").cast("double") / F.col("tot").cast("double")
    term = ratio * F.log(F.col("n").cast("double") * ratio)
    terms = j.select(
        "c_mktsegment",
        F.round(term * THEIL_SCALE).cast("long").cast("decimal(38,0)").alias("t"),
    )
    g = terms.groupBy("c_mktsegment").agg(F.sum("t").alias("s"))
    out = g.join(F.broadcast(seg), "c_mktsegment")
    return out.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        F.round(F.col("s").cast("double") / THEIL_SCALE, 8).alias("theil_t"),
    ).orderBy("c_mktsegment")


QUERIES["theil_inequality"] = theil_inequality
ORACLES["theil_inequality"] = f"""
    WITH rev AS (
        SELECT c_mktsegment,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey
    ),
    seg AS (
        SELECT c_mktsegment, count(*) AS n, sum(x) AS tot
        FROM rev GROUP BY 1
    ),
    terms AS (
        SELECT r.c_mktsegment,
               CAST(round((CAST(r.x AS DOUBLE) / CAST(s.tot AS DOUBLE))
                    * ln(CAST(s.n AS DOUBLE)
                         * (CAST(r.x AS DOUBLE) / CAST(s.tot AS DOUBLE)))
                    * {THEIL_SCALE}) AS HUGEINT) AS t
        FROM rev r JOIN seg s USING (c_mktsegment)
    ),
    g AS (SELECT c_mktsegment, sum(t) AS s FROM terms GROUP BY 1)
    SELECT g.c_mktsegment, CAST(seg.n AS BIGINT) AS n_customers,
           round(CAST(g.s AS DOUBLE) / {THEIL_SCALE}, 8) AS theil_t
    FROM g JOIN seg USING (c_mktsegment)
    ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AB: bridge / association / lead-lag reporting
# ---------------------------------------------------------------------------


def _usd_halfup(e4):
    """Exact HALF_UP (away from zero) of a 1e-4-dollar integer grid value
    to 2-dp dollars, entirely in integer arithmetic — the /20-, /50- and
    /10000-style divisions land EXACTLY on .xx5 midpoints all the time, so
    rounding the float quotient diverges between engines (the ohlc
    half-boundary class); rounding the integer first cannot."""
    sign = F.when(e4 < 0, F.lit(-1)).otherwise(F.lit(1)).cast("decimal(38,0)")
    return (
        sign * F.floor((F.abs(e4) + 50) / 100)
    ).cast("double") / 100.0


# SQL twin of _usd_halfup: e4 must be a HUGEINT expression; '//' keeps the
# division integral (DuckDB '/' on integers is float division).
def _usd_halfup_sql(e4: str) -> str:
    return (
        f"CAST((CASE WHEN ({e4}) < 0 THEN -1 ELSE 1 END)"
        f" * ((abs({e4}) + 50) // 100) AS DOUBLE) / 100.0"
    )

PVB_YEAR0, PVB_YEAR1 = 1996, 1997


def price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge per brand between fiscal 1996 and 1997: the revenue
    delta decomposed into a price effect ((p1-p0)*q1) and a volume effect
    ((q1-q0)*p0), the standard FP&A "revenue bridge" — with the average
    price p = rev/qty never materialized: each effect is algebraically
    rewritten as one division of exact integers,
    price = (r1*q0 - r0*q1)/q0, volume = r0*(q1-q0)/q0, so the two
    effects sum to the delta exactly and both engines perform the
    identical single IEEE division per cell.

    Revenue accumulates on the ten-thousandth-of-a-dollar grid (where
    extendedprice*(1-discount) is exact) in decimal(38,0); quantities are
    exact longs. Cross-products stay within decimal(38) headroom up to
    ~sf1000 (r ~ 3.4e18 * q ~ 1.7e11 = 6e29 << 1e38).

    Scale: one map-side-combined aggregate of lineitem to the
    (brand x year) grid, broadcast part dim, 25-row self-join.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev_u = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
        .cast("long")
        .cast("decimal(38,0)")
    )
    yr = F.year("l_shipdate").cast("int")
    g = (
        li.filter(yr.isin(PVB_YEAR0, PVB_YEAR1))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", yr.alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("long").cast("decimal(38,0)")).alias("q"),
            F.sum(rev_u).alias("r"),
        )
    )
    y0 = g.filter(F.col("yr") == PVB_YEAR0).select(
        "p_brand", F.col("q").alias("q0"), F.col("r").alias("r0")
    )
    y1 = g.filter(F.col("yr") == PVB_YEAR1).select(
        "p_brand", F.col("q").alias("q1"), F.col("r").alias("r1")
    )
    j = y0.join(y1, "p_brand")
    dollars = _usd_halfup  # r0/r1/delta sit on the exact 1e-4-dollar grid
    price_eff = (
        (F.col("r1") * F.col("q0") - F.col("r0") * F.col("q1")).cast("double")
        / F.col("q0").cast("double")
    )
    vol_eff = (
        (F.col("r0") * (F.col("q1") - F.col("q0"))).cast("double")
        / F.col("q0").cast("double")
    )
    return j.select(
        "p_brand",
        F.col("q0").cast("long").alias("qty_y0"),
        F.col("q1").cast("long").alias("qty_y1"),
        dollars(F.col("r0")).alias("rev_y0_dollars"),
        dollars(F.col("r1")).alias("rev_y1_dollars"),
        dollars(F.col("r1") - F.col("r0")).alias("delta_dollars"),
        F.round(price_eff / 10000.0, 2).alias("price_effect_dollars"),
        F.round(vol_eff / 10000.0, 2).alias("volume_effect_dollars"),
    ).orderBy("p_brand")


QUERIES["price_volume_bridge"] = price_volume_bridge
ORACLES["price_volume_bridge"] = f"""
    WITH g AS (
        SELECT p_brand, year(l_shipdate) AS yr,
               sum(CAST(l_quantity AS HUGEINT)) AS q,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS HUGEINT)) AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) IN ({PVB_YEAR0}, {PVB_YEAR1})
        GROUP BY 1, 2
    ),
    y0 AS (SELECT p_brand, q AS q0, r AS r0 FROM g WHERE yr = {PVB_YEAR0}),
    y1 AS (SELECT p_brand, q AS q1, r AS r1 FROM g WHERE yr = {PVB_YEAR1})
    SELECT p_brand,
           CAST(q0 AS BIGINT) AS qty_y0,
           CAST(q1 AS BIGINT) AS qty_y1,
           {_usd_halfup_sql("r0")} AS rev_y0_dollars,
           {_usd_halfup_sql("r1")} AS rev_y1_dollars,
           {_usd_halfup_sql("r1 - r0")} AS delta_dollars,
           round(CAST(r1 * q0 - r0 * q1 AS DOUBLE) / CAST(q0 AS DOUBLE)
                 / 10000.0, 2) AS price_effect_dollars,
           round(CAST(r0 * (q1 - q0) AS DOUBLE) / CAST(q0 AS DOUBLE)
                 / 10000.0, 2) AS volume_effect_dollars
    FROM y0 JOIN y1 USING (p_brand)
    ORDER BY p_brand
"""


def kendall_tau_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between the daily revenue series of
    every event-type pair — the tie-corrected, outlier-robust companion of
    spearman_daily: tau_b = (C - D) / sqrt((n0 - Tx) * (n0 - Ty)) with
    concordant/discordant/tie counts taken over all day pairs.

    Every comparison is a sign test on exact integer cent revenues, so
    concordance is flip-proof; the only float op is the final
    sqrt-and-divide over integer counts.

    Scale: the raw log reduces once to the (type x day) grid, which is
    calendar x vocabulary bounded (5 types x 30 days at every SF); the
    day-pair self-join is over that bounded grid, never over raw events.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    a = daily.select(
        F.col("event_type").alias("ta"), F.col("d").alias("d"), F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("tb"), F.col("d").alias("d"), F.col("x").alias("xb")
    )
    aligned = a.join(b, "d").filter(F.col("ta") < F.col("tb"))
    l = aligned.select("ta", "tb", F.col("d").alias("d1"),
                       F.col("xa").alias("a1"), F.col("xb").alias("b1"))
    r = aligned.select("ta", "tb", F.col("d").alias("d2"),
                       F.col("xa").alias("a2"), F.col("xb").alias("b2"))
    pairs = l.join(r, ["ta", "tb"]).filter(F.col("d1") < F.col("d2"))
    sa = F.signum((F.col("a2") - F.col("a1")).cast("double"))
    sb = F.signum((F.col("b2") - F.col("b1")).cast("double"))
    g = pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(sa * sb > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(sa * sb < 0, 1).otherwise(0)).alias("dd"),
        F.sum(F.when(sa == 0, 1).otherwise(0)).alias("tx"),
        F.sum(F.when(sb == 0, 1).otherwise(0)).alias("ty"),
    )
    tau = (F.col("c") - F.col("dd")).cast("double") / F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    return g.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n0").cast("long").alias("n_day_pairs"),
        F.col("c").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    ).orderBy("type_a", "type_b")


QUERIES["kendall_tau_pairs"] = kendall_tau_pairs
ORACLES["kendall_tau_pairs"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1, 2
    ),
    aligned AS (
        SELECT a.event_type AS ta, b.event_type AS tb, a.d,
               a.x AS xa, b.x AS xb
        FROM daily a JOIN daily b ON a.d = b.d AND a.event_type < b.event_type
    ),
    pairs AS (
        SELECT l.ta, l.tb,
               sign(r.xa - l.xa) AS sa, sign(r.xb - l.xb) AS sb
        FROM aligned l JOIN aligned r
          ON l.ta = r.ta AND l.tb = r.tb AND l.d < r.d
    ),
    g AS (
        SELECT ta, tb, count(*) AS n0,
               sum(CASE WHEN sa * sb > 0 THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN sa * sb < 0 THEN 1 ELSE 0 END) AS dd,
               sum(CASE WHEN sa = 0 THEN 1 ELSE 0 END) AS tx,
               sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS ty
        FROM pairs GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(n0 AS BIGINT) AS n_day_pairs,
           CAST(c AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           round(CAST(c - dd AS DOUBLE)
                 / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)),
                 6) AS tau_b
    FROM g ORDER BY type_a, type_b
"""


XCORR_MAX_LAG = 3


def xcorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily purchase revenue and daily
    click volume: Pearson r between x_d and y_{d+lag} for lag in
    [-3 .. +3] — the diagnostic that tells an attribution modeler whether
    clicks lead purchases (positive-lag peak) or trail them.

    All five moments (n, Sx, Sy, Sxy, Sxx, Syy) accumulate as exact
    integers in decimal(38,0); each r is ONE float expression of those
    integers, so both engines evaluate the identical IEEE expression.
    Degenerate (constant) windows yield NULL via a positive-variance
    guard.

    Scale: the log reduces once to two calendar-bounded daily frames; the
    7-row lag frame is a broadcast; the shifted join is day-keyed.
    """
    e = load_table(spark, sf_dir, "events")
    px = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)"))
            .alias("x")
        )
    )
    cy = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("y"))
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    shifted = px.crossJoin(F.broadcast(lags)).select(
        "lag", F.date_add(F.col("d"), F.col("lag")).alias("dy"), "x"
    )
    j = shifted.join(cy.withColumnRenamed("d", "dy"), "dy")
    g = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = F.when(vx * vy > 0, (n * sxy - sx * sy) / F.sqrt(vx * vy))
    return g.select(
        "lag",
        F.col("n").cast("long").alias("n_days"),
        F.round(r, 6).alias("pearson_r"),
    ).orderBy("lag")


QUERIES["xcorr_leadlag"] = xcorr_leadlag
ORACLES["xcorr_leadlag"] = f"""
    WITH px AS (
        SELECT CAST(ts AS DATE) AS d,
               sum(CAST(round(value * 100) AS HUGEINT)) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    cy AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS HUGEINT) AS y
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    lags AS (
        SELECT CAST(range AS INT) AS lag
        FROM range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1)
    ),
    j AS (
        SELECT l.lag, p.x, c.y
        FROM px p CROSS JOIN lags l
        JOIN cy c ON c.d = p.d + l.lag * INTERVAL 1 DAY
    ),
    g AS (
        SELECT lag, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM j GROUP BY 1
    )
    SELECT lag, CAST(n AS BIGINT) AS n_days,
           round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                 THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 END, 6) AS pearson_r
    FROM g ORDER BY lag
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AC: technical indicators on the daily revenue
# series (orders).  The daily frame is CALENDAR-bounded (~2,400 rows at every
# SF — row count is independent of data volume), so the unpartitioned ordered
# windows below run over a fixed-size frame regardless of scale; the only
# data-sized work is the first map-side-combined reduce of orders to days.
# All rolling state (sums, sums-of-squares, gains/losses) accumulates as
# exact integer cents in decimal(38,0); every band/crossover decision is a
# cross-multiplied integer comparison (flip-proof); RSI is one division of
# exact integers per row.
# ---------------------------------------------------------------------------

BOLL_N = 20  # Bollinger window length (days)
SMA_FAST, SMA_SLOW = 20, 50  # crossover windows
RSI_N = 14  # Cutler RSI window
RSI_YEAR = 1997  # compact output year



def _daily_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    return o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)"))
        .alias("x")
    )


def bollinger_band_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose revenue broke out of the 20-day Bollinger band
    (mean +/- 2 population sigma): |x - S/n| > 2*sigma is evaluated as the
    cross-multiplied integer inequality (n*x - S)^2 > 4*(n*Q - S^2), so no
    float ever decides a breakout.  Only full windows qualify.
    """
    daily = _daily_order_revenue(spark, sf_dir)
    w = Window.partitionBy().orderBy("day").rowsBetween(-(BOLL_N - 1), 0)
    wn = Window.partitionBy().orderBy("day")
    t = (
        daily.withColumn("s", F.sum("x").over(w))
        .withColumn("q", F.sum(F.col("x") * F.col("x")).over(w))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") >= BOLL_N)
    )
    n = F.lit(BOLL_N).cast("decimal(38,0)")
    dev = n * F.col("x") - F.col("s")
    spread = F.lit(4).cast("decimal(38,0)") * (
        n * F.col("q") - F.col("s") * F.col("s")
    )
    t = t.filter(dev * dev > spread)
    return t.select(
        "day",
        F.round(F.col("x").cast("double") / 100.0, 2).alias("rev_dollars"),
        _usd_halfup(F.col("s") * 5).alias("sma20_dollars"),
        F.when(dev > 0, F.lit("high")).otherwise(F.lit("low")).alias("band"),
    ).orderBy("day")


QUERIES["bollinger_band_breaks"] = bollinger_band_breaks
ORACLES["bollinger_band_breaks"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, x,
               sum(x) OVER (ORDER BY day ROWS BETWEEN {BOLL_N - 1} PRECEDING
                            AND CURRENT ROW) AS s,
               sum(x * x) OVER (ORDER BY day ROWS BETWEEN {BOLL_N - 1} PRECEDING
                                AND CURRENT ROW) AS q,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    )
    SELECT day,
           round(CAST(x AS DOUBLE) / 100.0, 2) AS rev_dollars,
           {_usd_halfup_sql("s * 5")} AS sma20_dollars,
           CASE WHEN {BOLL_N} * x - s > 0 THEN 'high' ELSE 'low' END AS band
    FROM t
    WHERE rn >= {BOLL_N}
      AND ({BOLL_N} * x - s) * ({BOLL_N} * x - s) > 4 * ({BOLL_N} * q - s * s)
    ORDER BY day
"""


def sma_crossover_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden/death crosses of the 20-day vs 50-day revenue SMA: the
    above/below state is the cross-multiplied integer comparison
    50*s20 > 20*s50 (never a float mean), and a crossover is a state flip
    between consecutive full-window days.
    """
    daily = _daily_order_revenue(spark, sf_dir)
    wf = Window.partitionBy().orderBy("day").rowsBetween(-(SMA_FAST - 1), 0)
    ws = Window.partitionBy().orderBy("day").rowsBetween(-(SMA_SLOW - 1), 0)
    wn = Window.partitionBy().orderBy("day")
    t = (
        daily.withColumn("sf_", F.sum("x").over(wf))
        .withColumn("ss_", F.sum("x").over(ws))
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") >= SMA_SLOW)
    )
    above = (
        F.lit(SMA_SLOW).cast("decimal(38,0)") * F.col("sf_")
        > F.lit(SMA_FAST).cast("decimal(38,0)") * F.col("ss_")
    )
    t = t.withColumn("above", above).withColumn(
        "prev", F.lag("above").over(wn)
    ).filter(F.col("prev").isNotNull() & (F.col("above") != F.col("prev")))
    return t.select(
        "day",
        F.when(F.col("above"), F.lit("golden")).otherwise(F.lit("death"))
        .alias("direction"),
        # e4-dollar grids: s/20/100 $ = 5*s e4, s/50/100 $ = 2*s e4
        _usd_halfup(F.col("sf_") * 5).alias("sma_fast_dollars"),
        _usd_halfup(F.col("ss_") * 2).alias("sma_slow_dollars"),
    ).orderBy("day")


QUERIES["sma_crossover_days"] = sma_crossover_days
ORACLES["sma_crossover_days"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day,
               sum(x) OVER (ORDER BY day ROWS BETWEEN {SMA_FAST - 1} PRECEDING
                            AND CURRENT ROW) AS sf_,
               sum(x) OVER (ORDER BY day ROWS BETWEEN {SMA_SLOW - 1} PRECEDING
                            AND CURRENT ROW) AS ss_,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    st AS (
        SELECT day, sf_, ss_,
               ({SMA_SLOW} * sf_ > {SMA_FAST} * ss_) AS above,
               lag({SMA_SLOW} * sf_ > {SMA_FAST} * ss_)
                   OVER (ORDER BY day) AS prev
        FROM t WHERE rn >= {SMA_SLOW}
    )
    SELECT day,
           CASE WHEN above THEN 'golden' ELSE 'death' END AS direction,
           {_usd_halfup_sql("sf_ * 5")} AS sma_fast_dollars,
           {_usd_halfup_sql("ss_ * 2")} AS sma_slow_dollars
    FROM st
    WHERE prev IS NOT NULL AND above <> prev
    ORDER BY day
"""


def cutler_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI(14) of daily order revenue (SMA variant — the EMA
    original is a recursion no set-oriented engine should unroll over an
    unbounded series): RSI = 100 * G / (G + L) over rolling 14-day integer
    gain/loss sums — one exact-integer division per day.  Output restricted
    to one calendar year for a compact frame; the windows still see the
    full history (no boundary effect at Jan 1).
    """
    daily = _daily_order_revenue(spark, sf_dir)
    wn = Window.partitionBy().orderBy("day")
    w = Window.partitionBy().orderBy("day").rowsBetween(-(RSI_N - 1), 0)
    zero = F.lit(0).cast("decimal(38,0)")
    d = daily.withColumn("delta", F.col("x") - F.lag("x").over(wn)).withColumn(
        "rn", F.row_number().over(wn)
    )
    d = (
        d.withColumn("gain", F.greatest(F.col("delta"), zero))
        .withColumn("loss", F.greatest(-F.col("delta"), zero))
        .withColumn("g", F.sum("gain").over(w))
        .withColumn("l", F.sum("loss").over(w))
        # first row has NULL delta; require 14 true deltas in the window
        .filter(F.col("rn") >= RSI_N + 1)
    )
    rsi = F.when(
        F.col("g") + F.col("l") > 0,
        F.lit(100.0) * F.col("g").cast("double")
        / (F.col("g") + F.col("l")).cast("double"),
    )
    return (
        d.filter(F.year("day") == RSI_YEAR)
        .select(
            "day",
            F.round(F.col("x").cast("double") / 100.0, 2).alias("rev_dollars"),
            F.round(rsi, 4).alias("rsi14"),
        )
        .orderBy("day")
    )


QUERIES["cutler_rsi"] = cutler_rsi
ORACLES["cutler_rsi"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT day, x, x - lag(x) OVER (ORDER BY day) AS delta,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    g AS (
        SELECT day, x, rn,
               sum(greatest(delta, 0)) OVER (ORDER BY day ROWS BETWEEN
                   {RSI_N - 1} PRECEDING AND CURRENT ROW) AS gg,
               sum(greatest(-delta, 0)) OVER (ORDER BY day ROWS BETWEEN
                   {RSI_N - 1} PRECEDING AND CURRENT ROW) AS ll
        FROM d
    )
    SELECT day, round(CAST(x AS DOUBLE) / 100.0, 2) AS rev_dollars,
           round(CASE WHEN gg + ll > 0
                 THEN 100.0 * CAST(gg AS DOUBLE) / CAST(gg + ll AS DOUBLE)
                 END, 4) AS rsi14
    FROM g
    WHERE rn >= {RSI_N + 1} AND year(day) = {RSI_YEAR}
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AD: autoregressive / lead-lag inference on the
# calendar-bounded daily frames.  Raw cross-moments accumulate as exact
# integers in decimal(38,0) (identical addends both engines, any order);
# all centering, Cramer solves, and F statistics are single float
# expressions of those integers, written token-identically in the oracle.
# ---------------------------------------------------------------------------


def ar2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit of daily order revenue by the regression (conditional
    least squares) form of Yule-Walker: x_t ~ x_{t-1} + x_{t-2} with
    intercept, solved closed-form from centered moments (Cramer 2x2 — the
    ols_two_feature shape on the time axis), plus the one-step-ahead
    forecast from the last two observed days.

    Scale: one map-side-combined reduce of orders to the calendar-bounded
    daily frame (~2,400 rows at every SF), two lag columns from one
    ordered window over that bounded frame, one final aggregate.
    """
    daily = _daily_order_revenue(spark, sf_dir).select(
        "day", F.col("x").cast("double").alias("xd"), "x"
    )
    wn = Window.partitionBy().orderBy("day")
    t = (
        daily.withColumn("x1", F.lag("x", 1).over(wn))
        .withColumn("x2", F.lag("x", 2).over(wn))
        .filter(F.col("x2").isNotNull())
    )
    mom = t.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sy"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x") * F.col("x1")).cast("double").alias("sy1"),
        F.sum(F.col("x") * F.col("x2")).cast("double").alias("sy2"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("syy"),
        F.max_by("x", "day").cast("double").alias("last_x"),
        F.max_by("x1", "day").cast("double").alias("last_x1"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("sy1") - F.col("s1") * F.col("sy") / n
    c2y = F.col("sy2") - F.col("s2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    phi1 = (c1y * c22 - c2y * c12) / det
    phi2 = (c2y * c11 - c1y * c12) / det
    b0 = (F.col("sy") - phi1 * F.col("s1") - phi2 * F.col("s2")) / n
    r2 = (phi1 * c1y + phi2 * c2y) / cyy
    fc = b0 + phi1 * F.col("last_x") + phi2 * F.col("last_x1")
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(phi1, 6).alias("phi1"),
        F.round(phi2, 6).alias("phi2"),
        F.round(b0 / 100.0, 2).alias("intercept_dollars"),
        F.round(r2, 6).alias("r2"),
        F.round(fc / 100.0, 2).alias("forecast_next_dollars"),
    )


QUERIES["ar2_forecast"] = ar2_forecast
ORACLES["ar2_forecast"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, x,
               lag(x, 1) OVER (ORDER BY day) AS x1,
               lag(x, 2) OVER (ORDER BY day) AS x2
        FROM daily
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sy,
               CAST(sum(x1) AS DOUBLE) AS s1,
               CAST(sum(x2) AS DOUBLE) AS s2,
               CAST(sum(x * x1) AS DOUBLE) AS sy1,
               CAST(sum(x * x2) AS DOUBLE) AS sy2,
               CAST(sum(x1 * x2) AS DOUBLE) AS s12,
               CAST(sum(x1 * x1) AS DOUBLE) AS s11,
               CAST(sum(x2 * x2) AS DOUBLE) AS s22,
               CAST(sum(x * x) AS DOUBLE) AS syy,
               CAST(arg_max(x, day) AS DOUBLE) AS last_x,
               CAST(arg_max(x1, day) AS DOUBLE) AS last_x1
        FROM t WHERE x2 IS NOT NULL
    ),
    c AS (
        SELECT n, sy, s1, s2, last_x, last_x1,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               sy1 - s1 * sy / n AS c1y,
               sy2 - s2 * sy / n AS c2y,
               syy - sy * sy / n AS cyy
        FROM mom
    ),
    s AS (
        SELECT n, sy, s1, s2, last_x, last_x1, c1y, c2y, cyy,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS phi1,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS phi2
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(phi1, 6) AS phi1,
           round(phi2, 6) AS phi2,
           round((sy - phi1 * s1 - phi2 * s2) / n / 100.0, 2)
               AS intercept_dollars,
           round((phi1 * c1y + phi2 * c2y) / cyy, 6) AS r2,
           round(((sy - phi1 * s1 - phi2 * s2) / n
                  + phi1 * last_x + phi2 * last_x1) / 100.0, 2)
               AS forecast_next_dollars
    FROM s
"""


def granger_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style lead-lag test: does yesterday's click volume predict
    today's purchase revenue beyond yesterday's own revenue?  Unrestricted
    model x_t ~ x_{t-1} + y_{t-1} vs restricted x_t ~ x_{t-1}; the report
    is the F statistic for the cross term, F = (SSE_r - SSE_u) /
    (SSE_u / (n - 3)), with both SSEs in closed form from centered
    moments (the ols_two_feature shape).

    Scale: the log reduces once to the calendar-bounded (day x {revenue,
    clicks}) frame; one ordered window for the lags; one final aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    px = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)"))
            .alias("x")
        )
    )
    cy = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("y"))
    )
    wn = Window.partitionBy().orderBy("day")
    t = (
        px.join(cy, "day")
        .withColumn("x1", F.lag("x", 1).over(wn))
        .withColumn("y1", F.lag("y", 1).over(wn))
        .filter(F.col("x1").isNotNull() & F.col("y1").isNotNull())
    )
    mom = t.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sy"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("y1").cast("double").alias("s2"),
        F.sum(F.col("x") * F.col("x1")).cast("double").alias("sy1"),
        F.sum(F.col("x") * F.col("y1")).cast("double").alias("sy2"),
        F.sum(F.col("x1") * F.col("y1")).cast("double").alias("s12"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("y1") * F.col("y1")).cast("double").alias("s22"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("sy1") - F.col("s1") * F.col("sy") / n
    c2y = F.col("sy2") - F.col("s2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    sse_u = cyy - (b1 * c1y + b2 * c2y)
    sse_r = cyy - c1y * c1y / c11
    fstat = (sse_r - sse_u) / (sse_u / (n - 3))
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(b1, 6).alias("beta_own_lag"),
        F.round(b2, 6).alias("beta_click_lag"),
        F.round(fstat, 6).alias("f_cross_term"),
        F.round(F.lit(1.0) - sse_u / cyy, 6).alias("r2_unrestricted"),
    )


QUERIES["granger_leadlag"] = granger_leadlag
ORACLES["granger_leadlag"] = """
    WITH px AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS HUGEINT)) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    cy AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS HUGEINT) AS y
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    t AS (
        SELECT day, x, y,
               lag(x, 1) OVER (ORDER BY day) AS x1,
               lag(y, 1) OVER (ORDER BY day) AS y1
        FROM px JOIN cy USING (day)
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sy,
               CAST(sum(x1) AS DOUBLE) AS s1,
               CAST(sum(y1) AS DOUBLE) AS s2,
               CAST(sum(x * x1) AS DOUBLE) AS sy1,
               CAST(sum(x * y1) AS DOUBLE) AS sy2,
               CAST(sum(x1 * y1) AS DOUBLE) AS s12,
               CAST(sum(x1 * x1) AS DOUBLE) AS s11,
               CAST(sum(y1 * y1) AS DOUBLE) AS s22,
               CAST(sum(x * x) AS DOUBLE) AS syy
        FROM t WHERE x1 IS NOT NULL AND y1 IS NOT NULL
    ),
    c AS (
        SELECT n, sy, s1, s2,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               sy1 - s1 * sy / n AS c1y,
               sy2 - s2 * sy / n AS c2y,
               syy - sy * sy / n AS cyy
        FROM mom
    ),
    s AS (
        SELECT n, c1y, c2y, cyy, c11,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(b1, 6) AS beta_own_lag,
           round(b2, 6) AS beta_click_lag,
           round(((cyy - c1y * c1y / c11) - (cyy - (b1 * c1y + b2 * c2y)))
                 / ((cyy - (b1 * c1y + b2 * c2y)) / (n - 3)), 6)
               AS f_cross_term,
           round(1.0 - (cyy - (b1 * c1y + b2 * c2y)) / cyy, 6)
               AS r2_unrestricted
    FROM s
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AE: regression/diagnostics completion —
# ridge shrinkage, partial autocorrelation, overdispersion fit,
# Durbin-Watson residual autocorrelation.
# ---------------------------------------------------------------------------

RIDGE_LAMBDA = 1000.0  # pinned L2 penalty on the centered moment diagonal


def ridge_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (L2-penalized normal equations on
    CENTERED integer-grid features): extendedprice_cents ~ quantity +
    discount_bp with (X'X + lambda*I) Cramer-solved — the shrinkage
    companion of ols_two_feature, reported beside the unpenalized betas
    so the shrinkage is visible in one frame.

    All raw moments accumulate as exact integers in decimal(38,0)
    (quantity integral, discount on the basis-point grid, price on the
    cent grid); centering and both solves are single float expressions of
    those integers.

    Scale: ONE map-side-combined aggregate of lineitem (raw moments need
    no means pass, unlike the two-pass centered form), then scalar math.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").cast("decimal(38,0)").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").cast("decimal(38,0)")
        .alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("decimal(38,0)")
        .alias("y"),
    )
    mom = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    lam = F.lit(RIDGE_LAMBDA)
    det_r = (c11 + lam) * (c22 + lam) - c12 * c12
    b1r = (c1y * (c22 + lam) - c2y * c12) / det_r
    b2r = (c2y * (c11 + lam) - c1y * c12) / det_r
    det_o = c11 * c22 - c12 * c12
    b1o = (c1y * c22 - c2y * c12) / det_o
    b2o = (c2y * c11 - c1y * c12) / det_o
    b0r = (F.col("sy") - b1r * F.col("s1") - b2r * F.col("s2")) / n
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(b1r, 6).alias("ridge_beta_qty_cents"),
        F.round(b2r, 6).alias("ridge_beta_disc_bp_cents"),
        F.round(b0r / 100.0, 2).alias("ridge_intercept_dollars"),
        F.round(b1o, 6).alias("ols_beta_qty_cents"),
        F.round(b2o, 6).alias("ols_beta_disc_bp_cents"),
    )


QUERIES["ridge_two_feature"] = ridge_two_feature
ORACLES["ridge_two_feature"] = f"""
    WITH li AS (
        SELECT CAST(l_quantity AS HUGEINT) AS x1,
               CAST(round(l_discount * 10000) AS HUGEINT) AS x2,
               CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
        FROM lineitem
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x1 * x1) AS DOUBLE) AS s11,
               CAST(sum(x1 * x2) AS DOUBLE) AS s12,
               CAST(sum(x2 * x2) AS DOUBLE) AS s22,
               CAST(sum(x1 * y) AS DOUBLE) AS s1y,
               CAST(sum(x2 * y) AS DOUBLE) AS s2y
        FROM li
    ),
    c AS (
        SELECT n, s1, s2, sy,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y
        FROM mom
    ),
    s AS (
        SELECT n, s1, s2, sy,
               (c1y * (c22 + {RIDGE_LAMBDA}) - c2y * c12)
                   / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA})
                      - c12 * c12) AS b1r,
               (c2y * (c11 + {RIDGE_LAMBDA}) - c1y * c12)
                   / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA})
                      - c12 * c12) AS b2r,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1o,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2o
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(b1r, 6) AS ridge_beta_qty_cents,
           round(b2r, 6) AS ridge_beta_disc_bp_cents,
           round((sy - b1r * s1 - b2r * s2) / n / 100.0, 2)
               AS ridge_intercept_dollars,
           round(b1o, 6) AS ols_beta_qty_cents,
           round(b2o, 6) AS ols_beta_disc_bp_cents
    FROM s
"""


def pacf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (lags 1-3) of each event type's daily
    revenue via Durbin-Levinson on the sample ACF — the order-selection
    companion of acf_daily_revenue (an AR(p) signature cuts off in PACF
    at lag p): phi11 = r1; phi22 = (r2 - r1^2)/(1 - r1^2);
    phi33 from the level-3 recursion with phi21/phi22.

    Scale: identical shape to acf_daily_revenue — one reduce to the
    calendar x vocabulary bounded (type x day) grid, one per-type window,
    one final aggregate; the recursion is scalar algebra on the three r's.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("y")
    )
    means = daily.groupBy("event_type").agg(F.avg("y").alias("ybar"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.join(F.broadcast(means), "event_type").select(
        "event_type",
        (F.col("y") - F.col("ybar")).alias("dy"),
        *[
            (F.lag("y", k).over(w) - F.col("ybar")).alias(f"dy{k}")
            for k in (1, 2, 3)
        ],
    )
    g = lagged.groupBy("event_type").agg(
        F.sum(F.col("dy") * F.col("dy")).alias("c0"),
        *[
            F.sum(F.col("dy") * F.col(f"dy{k}")).alias(f"c{k}")
            for k in (1, 2, 3)
        ],
    )
    r1, r2, r3 = (F.col(f"c{k}") / F.col("c0") for k in (1, 2, 3))
    p11 = r1
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = p11 - p22 * p11  # phi_{2,1} = phi_{1,1} - phi_{2,2} * phi_{1,1}
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    return g.select(
        "event_type",
        F.round(p11, 4).alias("pacf1"),
        F.round(p22, 4).alias("pacf2"),
        F.round(p33, 4).alias("pacf3"),
    ).orderBy("event_type")


QUERIES["pacf_daily_revenue"] = pacf_daily_revenue
ORACLES["pacf_daily_revenue"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    ),
    means AS (
        SELECT event_type, avg(y) AS ybar FROM daily GROUP BY 1
    ),
    lagged AS (
        SELECT d.event_type,
               d.y - m.ybar AS dy,
               lag(d.y, 1) OVER (PARTITION BY d.event_type ORDER BY d.d)
                   - m.ybar AS dy1,
               lag(d.y, 2) OVER (PARTITION BY d.event_type ORDER BY d.d)
                   - m.ybar AS dy2,
               lag(d.y, 3) OVER (PARTITION BY d.event_type ORDER BY d.d)
                   - m.ybar AS dy3
        FROM daily d JOIN means m USING (event_type)
    ),
    g AS (
        SELECT event_type,
               sum(dy * dy) AS c0, sum(dy * dy1) AS c1,
               sum(dy * dy2) AS c2, sum(dy * dy3) AS c3
        FROM lagged GROUP BY 1
    ),
    s AS (
        SELECT event_type,
               c1 / c0 AS r1, c2 / c0 AS r2, c3 / c0 AS r3
        FROM g
    ),
    l2 AS (
        SELECT event_type, r1, r2, r3,
               r1 AS p11,
               (r2 - r1 * r1) / (1 - r1 * r1) AS p22
        FROM s
    )
    SELECT event_type,
           round(p11, 4) AS pacf1,
           round(p22, 4) AS pacf2,
           round((r3 - (p11 - p22 * p11) * r2 - p22 * r1)
                 / (1 - (p11 - p22 * p11) * r1 - p22 * r2), 4) AS pacf3
    FROM l2 ORDER BY event_type
"""


def negbin_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit of each event type's daily
    count distribution: dispersion index v/m, NB size r = m^2/(v - m) and
    success probability p = m/v — the overdispersion companion of
    poisson_rate_model (NB collapses to Poisson as v -> m).  Sample
    variance comes from the exact integer identity
    v = (n*Q - S^2) / (n*(n-1)); underdispersed types report NULL r/p.

    Scale: one reduce to the bounded (type x day) count grid, one exact
    integer aggregate per type, scalar math.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").cast("decimal(38,0)").alias("c")
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    n, s, q = (F.col(c).cast("double") for c in ("n", "s", "q"))
    m = s / n
    v = (n * q - s * s) / (n * (n - 1))
    r = F.when(v > m, m * m / (v - m))
    p = F.when(v > m, m / v)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(m, 4).alias("mean_daily"),
        F.round(v, 4).alias("var_daily"),
        F.round(v / m, 4).alias("dispersion_index"),
        F.round(r, 4).alias("nb_r"),
        F.round(p, 6).alias("nb_p"),
    ).orderBy("event_type")


QUERIES["negbin_overdispersion"] = negbin_overdispersion
ORACLES["negbin_overdispersion"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS HUGEINT) AS c
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               sum(c) AS s, sum(c * c) AS q
        FROM daily GROUP BY 1
    ),
    s AS (
        SELECT event_type,
               CAST(n AS DOUBLE) AS n, CAST(s AS DOUBLE) AS s,
               CAST(q AS DOUBLE) AS q
        FROM g
    ),
    t AS (
        SELECT event_type, n,
               s / n AS m,
               (n * q - s * s) / (n * (n - 1)) AS v
        FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(m, 4) AS mean_daily,
           round(v, 4) AS var_daily,
           round(v / m, 4) AS dispersion_index,
           round(CASE WHEN v > m THEN m * m / (v - m) END, 4) AS nb_r,
           round(CASE WHEN v > m THEN m / v END, 6) AS nb_p
    FROM t ORDER BY event_type
"""


def durbin_watson_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the residuals from the daily-revenue
    linear trend: DW = sum((e_t - e_{t-1})^2) / sum(e_t^2), the standard
    residual-autocorrelation diagnostic for a fitted trend (DW ~ 2 means
    no serial correlation; the report includes rho_hat = 1 - DW/2).

    Determinism: slope/intercept are single float expressions of exact
    integer moments (identical in both engines); each residual is then
    rounded to WHOLE CENTS (a 1e-8 relative grid on this series) before
    the difference/square sums, which therefore accumulate exact integers
    in decimal(38,0) — no cross-row float accumulation.

    Scale: two aggregates over the calendar-bounded daily frame plus one
    ordered window on it; the trend-moment frame is a 1-row broadcast.
    """
    daily = _daily_order_revenue(spark, sf_dir).select(
        "day",
        F.datediff(F.col("day"), F.lit("1995-01-01")).cast("double").alias("t"),
        F.col("x").cast("double").alias("xd"),
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").alias("st"),
        F.sum("xd").alias("sx"),
        F.sum(F.col("t") * F.col("xd")).alias("stx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    b = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    a = (F.col("sx") - b * F.col("st")) / F.col("n")
    fit = mom.select(b.alias("b"), a.alias("a"))
    wn = Window.partitionBy().orderBy("day")
    res = daily.crossJoin(F.broadcast(fit)).select(
        "day",
        F.round(F.col("xd") - F.col("a") - F.col("b") * F.col("t"))
        .cast("long")
        .cast("decimal(38,0)")
        .alias("e"),
    )
    r = res.withColumn("e1", F.lag("e").over(wn))
    out = r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("e") * F.col("e")).alias("see"),
        F.sum(
            F.when(
                F.col("e1").isNotNull(),
                (F.col("e") - F.col("e1")) * (F.col("e") - F.col("e1")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sdd"),
    )
    dw = F.col("sdd").cast("double") / F.col("see").cast("double")
    return out.select(
        "n_days",
        F.round(dw, 6).alias("dw_stat"),
        F.round(F.lit(1.0) - dw / 2.0, 6).alias("rho_hat"),
    )


QUERIES["durbin_watson_trend"] = durbin_watson_trend
ORACLES["durbin_watson_trend"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS DOUBLE) AS t,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS DOUBLE) AS xd
        FROM orders GROUP BY 1, 2
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st, sum(xd) AS sx,
               sum(t * xd) AS stx, sum(t * t) AS stt
        FROM daily
    ),
    fit AS (
        SELECT (n * stx - st * sx) / (n * stt - st * st) AS b,
               (sx - (n * stx - st * sx) / (n * stt - st * st) * st) / n AS a
        FROM mom
    ),
    res AS (
        SELECT day, CAST(round(xd - a - b * t) AS HUGEINT) AS e
        FROM daily CROSS JOIN fit
    ),
    r AS (
        SELECT e, lag(e) OVER (ORDER BY day) AS e1 FROM res
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(CASE WHEN e1 IS NOT NULL
                               THEN (e - e1) * (e - e1) ELSE 0 END) AS DOUBLE)
                 / CAST(sum(e * e) AS DOUBLE), 6) AS dw_stat,
           round(1.0 - CAST(sum(CASE WHEN e1 IS NOT NULL
                                     THEN (e - e1) * (e - e1) ELSE 0 END)
                            AS DOUBLE)
                       / CAST(sum(e * e) AS DOUBLE) / 2.0, 6) AS rho_hat
    FROM r
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AF (ops/finance): inventory policy + growth
# ---------------------------------------------------------------------------

EOQ_ORDER_COST = 100.0  # pinned fixed cost per replenishment order ($)
EOQ_HOLD_COST = 2.0  # pinned holding cost ($ per unit per year)
EOQ_LEAD_DAYS = 7.0  # replenishment lead time (days)
EOQ_Z_95 = 1.645  # 95% service-level z, pinned literal (no engine erf)
EOQ_Y0, EOQ_Y1 = 1996, 2000  # demand observation window (full years)
EOQ_N_DAYS = 1827  # calendar days in [1996-01-01, 2000-12-31] (2 leap years)
EOQ_N_YEARS = 5.0


def eoq_reorder_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory policy per brand from the shipped-quantity demand stream:
    economic order quantity EOQ = sqrt(2*D*S/H) on the mean annual demand,
    plus the reorder point mu_d*L + z*sigma_d*sqrt(L) at a pinned 95%
    service level — classic operations closers on exact integer demand
    moments (zero-demand calendar days enter the variance through the
    pinned day count, not through materialized zero rows).

    Scale: one map-side-combined reduce of lineitem to the (brand x day)
    grid, one exact integer aggregate per brand, scalar math.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("l_shipdate").cast("int")
    daily = (
        li.filter((yr >= EOQ_Y0) & (yr <= EOQ_Y1))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.to_date("l_shipdate").alias("d"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("decimal(38,0)").alias("q")
        )
    )
    g = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_active_days"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
    )
    nd = F.lit(float(EOQ_N_DAYS))
    s, qq = F.col("s").cast("double"), F.col("qq").cast("double")
    mu = s / nd
    var = (nd * qq - s * s) / (nd * nd)  # population var incl. zero days
    d_annual = s / EOQ_N_YEARS
    eoq = F.sqrt(2.0 * d_annual * EOQ_ORDER_COST / EOQ_HOLD_COST)
    rop = mu * EOQ_LEAD_DAYS + EOQ_Z_95 * F.sqrt(var * EOQ_LEAD_DAYS)
    return g.select(
        "p_brand",
        F.col("n_active_days").cast("long").alias("n_active_days"),
        F.round(d_annual, 2).alias("annual_demand_units"),
        F.round(eoq, 2).alias("eoq_units"),
        F.round(rop, 2).alias("reorder_point_units"),
    ).orderBy("p_brand")


QUERIES["eoq_reorder_policy"] = eoq_reorder_policy
ORACLES["eoq_reorder_policy"] = f"""
    WITH daily AS (
        SELECT p_brand, CAST(l_shipdate AS DATE) AS d,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) BETWEEN {EOQ_Y0} AND {EOQ_Y1}
        GROUP BY 1, 2
    ),
    g AS (
        SELECT p_brand, count(*) AS n_active_days,
               sum(q) AS s, sum(q * q) AS qq
        FROM daily GROUP BY 1
    )
    SELECT p_brand,
           CAST(n_active_days AS BIGINT) AS n_active_days,
           round(CAST(s AS DOUBLE) / {EOQ_N_YEARS}, 2) AS annual_demand_units,
           round(sqrt(2.0 * (CAST(s AS DOUBLE) / {EOQ_N_YEARS})
                      * {EOQ_ORDER_COST} / {EOQ_HOLD_COST}), 2) AS eoq_units,
           round(CAST(s AS DOUBLE) / {float(EOQ_N_DAYS)} * {EOQ_LEAD_DAYS}
                 + {EOQ_Z_95} * sqrt(({float(EOQ_N_DAYS)} * CAST(qq AS DOUBLE)
                                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                     / ({float(EOQ_N_DAYS)} * {float(EOQ_N_DAYS)})
                                     * {EOQ_LEAD_DAYS}), 2)
               AS reorder_point_units
    FROM g ORDER BY p_brand
"""


CAGR_Y0, CAGR_Y1 = 1996, 2000


def cagr_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound annual growth rate of net revenue per brand between fiscal
    1996 and 2000: CAGR = (r1/r0)^(1/4) - 1 on exact 1e-4-dollar integer
    endpoints — the one float op per row is the pow of a ratio of exact
    integers.

    Scale: one map-side-combined aggregate to the (brand x 2-year) grid,
    broadcast dim, 25-row self-join.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev_u = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
        .cast("long")
        .cast("decimal(38,0)")
    )
    yr = F.year("l_shipdate").cast("int")
    g = (
        li.filter(yr.isin(CAGR_Y0, CAGR_Y1))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", yr.alias("yr"))
        .agg(F.sum(rev_u).alias("r"))
    )
    y0 = g.filter(F.col("yr") == CAGR_Y0).select(
        "p_brand", F.col("r").alias("r0")
    )
    y1 = g.filter(F.col("yr") == CAGR_Y1).select(
        "p_brand", F.col("r").alias("r1")
    )
    span = float(CAGR_Y1 - CAGR_Y0)
    cagr = F.pow(
        F.col("r1").cast("double") / F.col("r0").cast("double"), 1.0 / span
    ) - F.lit(1.0)
    return (
        y0.join(y1, "p_brand")
        .select(
            "p_brand",
            _usd_halfup(F.col("r0")).alias("rev_y0_dollars"),
            _usd_halfup(F.col("r1")).alias("rev_y1_dollars"),
            F.round(cagr, 6).alias("cagr"),
        )
        .orderBy("p_brand")
    )


QUERIES["cagr_brand_revenue"] = cagr_brand_revenue
ORACLES["cagr_brand_revenue"] = f"""
    WITH g AS (
        SELECT p_brand, year(l_shipdate) AS yr,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS HUGEINT)) AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) IN ({CAGR_Y0}, {CAGR_Y1})
        GROUP BY 1, 2
    ),
    y0 AS (SELECT p_brand, r AS r0 FROM g WHERE yr = {CAGR_Y0}),
    y1 AS (SELECT p_brand, r AS r1 FROM g WHERE yr = {CAGR_Y1})
    SELECT p_brand,
           {_usd_halfup_sql("r0")} AS rev_y0_dollars,
           {_usd_halfup_sql("r1")} AS rev_y1_dollars,
           round(pow(CAST(r1 AS DOUBLE) / CAST(r0 AS DOUBLE),
                     1.0 / {float(CAGR_Y1 - CAGR_Y0)}) - 1.0, 6) AS cagr
    FROM y0 JOIN y1 USING (p_brand)
    ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AG: permutation test (erf-free significance)
# ---------------------------------------------------------------------------

PERM_B = 64  # label permutations
PERM_P = 4294967311  # same universal-hash prime family as bootstrap/minhash
# Overflow headroom (ADVICE r5): h is 32-bit (8 hex chars of md5), so a_b
# is capped at 30 bits -> max(h)*max(a_b)+max(c_b) < 2^62 + 2^31, four
# bits of real int64 headroom instead of the ~0.00000005% the 31-bit
# multipliers left.  Both the Spark frame and the DuckDB oracle
# interpolate the same PERM_AC, so parity is unconditional.
PERM_AC = [
    (
        ((1103515245 * (b + 911) + 54321) % 1073741789) | 1,
        (69069 * (b + 911) + 7654321) % 2147483647,
    )
    for b in range(PERM_B)
]
assert all(
    h_max * a + c < 2**62 + 2**31
    for h_max in (2**32 - 1,)
    for a, c in PERM_AC
)


def permutation_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the A/B mean-purchase-value lift (treatment =
    even user id): the label assignment is re-drawn PERM_B times from a
    deterministic universal-hash family over the user id, and the p-value
    is the share of permuted |mean diffs| at least as extreme as the
    observed one ((1+k)/(B+1), the standard add-one estimator) — exact
    nonparametric significance with NO normal approximation (and no erf,
    which neither engine exposes), the distribution-free companion of
    welch_t_test / ab_test_lift.

    Determinism: per-permutation sums/counts are exact integer aggregates
    (ONE md5 per row; the B side draws are parity bits of a universal hash
    family over it — the bootstrap_mean_ci trick); each mean diff is a
    single float expression of exact integers, and the extremeness
    comparison runs on bit-identical doubles in both engines.

    Scale: ONE pass over the purchase stream computing 2*PERM_B integer
    partial aggregates (no explode, no reshuffle per permutation); the
    permutation frame is B rows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    from ..sources.tables import fan_out

    rows = fan_out(e).select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        md5_hash_long(F.col("user_id").cast("string")).alias("h"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.when(F.col("treat"), 1).otherwise(0)).alias("n1o"),
        F.sum(F.when(F.col("treat"), F.col("cents")).otherwise(0)).alias("s1o"),
    ]
    for b in range(PERM_B):
        a_b, c_b = PERM_AC[b]
        bit = ((F.col("h") * a_b + c_b) % PERM_P) % 2 == 0
        aggs.append(F.sum(F.when(bit, 1).otherwise(0)).alias(f"n{b}"))
        aggs.append(
            F.sum(F.when(bit, F.col("cents")).otherwise(0)).alias(f"c{b}")
        )
    wide = rows.agg(*aggs)

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
        for b in range(PERM_B)
    ]
    wide = wide.select("n", "n1o", "obs", *diffs)
    stack = ", ".join(f"{b}, d{b}" for b in range(PERM_B))
    perms = wide.selectExpr(
        "n", "n1o", "obs", f"stack({PERM_B}, {stack}) AS (b, d)"
    )
    g = perms.agg(
        F.max("n").cast("long").alias("n_purchases"),
        F.max("n1o").cast("long").alias("n_treated"),
        F.round(F.max("obs"), 4).alias("obs_diff_dollars"),
        F.count(F.lit(1)).cast("long").alias("n_perms"),
        F.sum(
            F.when(F.abs(F.col("d")) >= F.abs(F.col("obs")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_extreme"),
    )
    return g.withColumn(
        "p_value",
        F.round(
            (F.col("n_extreme") + 1).cast("double")
            / F.lit(float(PERM_B + 1)),
            6,
        ),
    )


QUERIES["permutation_test_lift"] = permutation_test_lift


def _perm_oracle() -> str:
    h = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)"
    cols = [
        "CAST(count(*) AS BIGINT) AS n",
        "sum(CAST(round(value * 100) AS BIGINT)) AS s",
        "sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1o",
        "sum(CASE WHEN user_id % 2 = 0"
        " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS s1o",
    ]
    for b in range(PERM_B):
        a_b, c_b = PERM_AC[b]
        bit = f"(({h} * {a_b} + {c_b}) % {PERM_P}) % 2 = 0"
        cols.append(f"sum(CASE WHEN {bit} THEN 1 ELSE 0 END) AS n{b}")
        cols.append(
            f"sum(CASE WHEN {bit}"
            f" THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS c{b}"
        )
    sel = ", ".join(cols)

    def diff(s1, n1):
        return (
            f"(CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE)"
            f" - CAST(s - {s1} AS DOUBLE) / CAST(n - {n1} AS DOUBLE)) / 100.0"
        )

    un = " UNION ALL ".join(
        f"SELECT n, n1o, obs, {diff(f'c{b}', f'n{b}')} AS d FROM wide"
        for b in range(PERM_B)
    )
    return f"""
    WITH w0 AS (SELECT {sel} FROM events WHERE event_type = 'purchase'),
    wide AS (SELECT *, {diff('s1o', 'n1o')} AS obs FROM w0),
    perms AS ({un}),
    g AS (
        SELECT CAST(max(n) AS BIGINT) AS n_purchases,
               CAST(max(n1o) AS BIGINT) AS n_treated,
               round(max(obs), 4) AS obs_diff_dollars,
               CAST(count(*) AS BIGINT) AS n_perms,
               CAST(sum(CASE WHEN abs(d) >= abs(obs) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_extreme
        FROM perms
    )
    SELECT *, round(CAST(n_extreme + 1 AS DOUBLE) / {float(PERM_B + 1)}, 6)
                   AS p_value
    FROM g
"""


ORACLES["permutation_test_lift"] = _perm_oracle()


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AH: bilateral price indices (1996 -> 1997)
# ---------------------------------------------------------------------------

PIDX_Y0, PIDX_Y1 = 1996, 1997


def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche and Fisher price indices between fiscal 1996
    and 1997 over the matched-part basket: part-level average prices
    p = rev/qty never materialize — Laspeyres = sum(rev1*q0/q1)/sum(rev0)
    and Paasche = sum(rev1)/sum(rev0*q1/q0), so each part contributes ONE
    float term (a product/quotient of exact integers) that is rounded to
    the integer e4-dollar grid before the distributed sum (the grid is
    ~1e-10 relative on these magnitudes; a raw float fold would be
    order-sensitive).  Fisher is the geometric mean of the two.

    Scale: one map-side-combined aggregate to the (part x year) grid,
    partkey-keyed self-join of the two year frames, one integer reduce.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice", "l_discount"
    )
    rev_u = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
        .cast("long")
        .cast("decimal(38,0)")
    )
    yr = F.year("l_shipdate").cast("int")
    g = (
        li.filter(yr.isin(PIDX_Y0, PIDX_Y1))
        .groupBy(F.col("l_partkey").alias("pk"), yr.alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("long").cast("decimal(38,0)")).alias("q"),
            F.sum(rev_u).alias("r"),
        )
    )
    y0 = g.filter(F.col("yr") == PIDX_Y0).select(
        "pk", F.col("q").alias("q0"), F.col("r").alias("r0")
    )
    y1 = g.filter(F.col("yr") == PIDX_Y1).select(
        "pk", F.col("q").alias("q1"), F.col("r").alias("r1")
    )
    j = y0.join(y1, "pk")
    dec = "decimal(38,0)"
    lterm = (
        (F.col("r1") * F.col("q0")).cast("double") / F.col("q1").cast("double")
    )
    pterm = (
        (F.col("r0") * F.col("q1")).cast("double") / F.col("q0").cast("double")
    )
    t = j.select(
        F.round(lterm).cast(dec).alias("lt"),
        F.round(pterm).cast(dec).alias("pt"),
        F.col("r0"),
        F.col("r1"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_matched"),
        F.sum("lt").alias("sl"),
        F.sum("pt").alias("sp"),
        F.sum("r0").alias("s0"),
        F.sum("r1").alias("s1"),
    )
    lasp = F.col("sl").cast("double") / F.col("s0").cast("double")
    paas = F.col("s1").cast("double") / F.col("sp").cast("double")
    return agg.select(
        "n_parts_matched",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


QUERIES["price_index_fisher"] = price_index_fisher
ORACLES["price_index_fisher"] = f"""
    WITH g AS (
        SELECT l_partkey AS pk, year(l_shipdate) AS yr,
               sum(CAST(l_quantity AS HUGEINT)) AS q,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS HUGEINT)) AS r
        FROM lineitem
        WHERE year(l_shipdate) IN ({PIDX_Y0}, {PIDX_Y1})
        GROUP BY 1, 2
    ),
    y0 AS (SELECT pk, q AS q0, r AS r0 FROM g WHERE yr = {PIDX_Y0}),
    y1 AS (SELECT pk, q AS q1, r AS r1 FROM g WHERE yr = {PIDX_Y1}),
    t AS (
        SELECT CAST(round(CAST(r1 * q0 AS DOUBLE) / CAST(q1 AS DOUBLE))
                    AS HUGEINT) AS lt,
               CAST(round(CAST(r0 * q1 AS DOUBLE) / CAST(q0 AS DOUBLE))
                    AS HUGEINT) AS pt,
               r0, r1
        FROM y0 JOIN y1 USING (pk)
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts_matched,
               sum(lt) AS sl, sum(pt) AS sp, sum(r0) AS s0, sum(r1) AS s1
        FROM t
    )
    SELECT n_parts_matched,
           round(CAST(sl AS DOUBLE) / CAST(s0 AS DOUBLE), 6) AS laspeyres,
           round(CAST(s1 AS DOUBLE) / CAST(sp AS DOUBLE), 6) AS paasche,
           round(sqrt((CAST(sl AS DOUBLE) / CAST(s0 AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(sp AS DOUBLE))), 6)
               AS fisher
    FROM agg
"""


def theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition of the Theil T index over market segments:
    T_total = T_between + sum_g (X_g/X) * T_g — the property that makes
    Theil (and not Gini) the inequality measure of choice for drill-down
    reporting ("how much revenue inequality is BETWEEN segments vs
    WITHIN them?").  Reports all three plus the additivity gap, which
    the invariant test pins near zero.

    Determinism: the two per-customer term families (total-relative and
    segment-relative) are single float expressions over exact integer
    cents, rounded to the pico-grid and summed as decimal(38,0); the
    5-row between/within algebra is scalar float on exact aggregates.

    Scale: one reduce to per-customer revenue, one broadcast of the
    segment/grand totals, ONE pass computing both term columns.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long").cast("decimal(38,0)"))
            .alias("x")
        )
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "x")
        # rev is consumed twice (seg + the term pass), but a
        # localCheckpoint cut measured SLOWER solo (r11: 0.685 -> 0.845 s
        # min-of-3, stable canaries): ReusedExchange already dedupes the
        # identical reduce subtree within the one job (the
        # theil_inequality finding).  Left lazy.
    )
    seg = rev.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("x").alias("xg")
    )
    grand = seg.agg(
        F.sum("ng").alias("n"), F.sum("xg").alias("xx")
    )
    j = rev.join(F.broadcast(seg), "c_mktsegment").crossJoin(F.broadcast(grand))
    xd = F.col("x").cast("double")
    xxd, nd = F.col("xx").cast("double"), F.col("n").cast("double")
    xgd, ngd = F.col("xg").cast("double"), F.col("ng").cast("double")
    t_tot = (xd / xxd) * F.log(nd * xd / xxd)
    t_seg = (xd / xgd) * F.log(ngd * xd / xgd)
    terms = j.select(
        "c_mktsegment",
        F.round(t_tot * THEIL_SCALE).cast("long").cast("decimal(38,0)").alias("tt"),
        F.round(t_seg * THEIL_SCALE).cast("long").cast("decimal(38,0)").alias("tg"),
    )
    per_seg = terms.groupBy("c_mktsegment").agg(
        F.sum("tt").alias("stt"), F.sum("tg").alias("stg")
    ).join(F.broadcast(seg), "c_mktsegment").crossJoin(F.broadcast(grand))
    share = F.col("xg").cast("double") / F.col("xx").cast("double")
    t_g = F.col("stg").cast("double") / THEIL_SCALE
    between_term = share * F.log(
        share / (F.col("ng").cast("double") / F.col("n").cast("double"))
    )
    fin = per_seg.agg(
        F.max(F.col("n")).cast("long").alias("n_customers"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.col("stt").cast("double") / THEIL_SCALE).alias("t_total"),
        F.sum(between_term).alias("t_between"),
        F.sum(share * t_g).alias("t_within"),
    )
    return fin.select(
        "n_customers",
        "n_segments",
        F.round(F.col("t_total"), 8).alias("theil_total"),
        F.round(F.col("t_between"), 8).alias("theil_between"),
        F.round(F.col("t_within"), 8).alias("theil_within"),
        # + 0.0 canonicalizes -0.0 (round(-1e-12, 8) differs across engines)
        (
            F.round(
                F.col("t_total") - F.col("t_between") - F.col("t_within"), 8
            )
            + F.lit(0.0)
        ).alias("additivity_gap"),
    )


QUERIES["theil_decomposition"] = theil_decomposition
ORACLES["theil_decomposition"] = f"""
    WITH rev AS (
        SELECT c_mktsegment,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey
    ),
    seg AS (
        SELECT c_mktsegment, count(*) AS ng, sum(x) AS xg
        FROM rev GROUP BY 1
    ),
    grand AS (SELECT sum(ng) AS n, sum(xg) AS xx FROM seg),
    terms AS (
        SELECT r.c_mktsegment,
               CAST(round((CAST(r.x AS DOUBLE) / CAST(g.xx AS DOUBLE))
                    * ln(CAST(g.n AS DOUBLE) * CAST(r.x AS DOUBLE)
                         / CAST(g.xx AS DOUBLE))
                    * {THEIL_SCALE}) AS HUGEINT) AS tt,
               CAST(round((CAST(r.x AS DOUBLE) / CAST(s.xg AS DOUBLE))
                    * ln(CAST(s.ng AS DOUBLE) * CAST(r.x AS DOUBLE)
                         / CAST(s.xg AS DOUBLE))
                    * {THEIL_SCALE}) AS HUGEINT) AS tg
        FROM rev r
        JOIN seg s USING (c_mktsegment)
        CROSS JOIN grand g
    ),
    per_seg AS (
        SELECT t.c_mktsegment, sum(t.tt) AS stt, sum(t.tg) AS stg,
               any_value(s.ng) AS ng, any_value(s.xg) AS xg,
               any_value(g.n) AS n, any_value(g.xx) AS xx
        FROM terms t JOIN seg s USING (c_mktsegment) CROSS JOIN grand g
        GROUP BY 1
    ),
    fin AS (
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT) AS n_segments,
               sum(CAST(stt AS DOUBLE) / {THEIL_SCALE}) AS t_total,
               sum((CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE))
                   * ln((CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE))
                        / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))))
                   AS t_between,
               sum((CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE))
                   * (CAST(stg AS DOUBLE) / {THEIL_SCALE})) AS t_within
        FROM per_seg
    )
    SELECT n_customers, n_segments,
           round(t_total, 8) AS theil_total,
           round(t_between, 8) AS theil_between,
           round(t_within, 8) AS theil_within,
           round(t_total - t_between - t_within, 8) + 0.0 AS additivity_gap
    FROM fin
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AL: reporting closers (peaks, aging)
# ---------------------------------------------------------------------------

PEAK_HALF_WIN = 3  # local-max window: +/- 3 observed days
PEAK_PCTL_X10 = 9  # peaks must clear the 90th percentile (rank*10 >= n*9)


def revenue_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue peak days: strict local maxima of the daily order revenue
    series over a +/-3-observed-day window that also clear the global
    90th percentile — the 'what should the ops team look at' report.
    Both conditions are exact integer comparisons: the local max compares
    cent sums; the percentile gate is the cross-multiplied rank test
    10*rank >= 9*n (no float percentile).

    Scale: the calendar-bounded daily frame (one reduce of orders), two
    ordered windows on it.
    """
    daily = _daily_order_revenue(spark, sf_dir)
    wleft = Window.partitionBy().orderBy("day").rowsBetween(-PEAK_HALF_WIN, -1)
    wright = Window.partitionBy().orderBy("day").rowsBetween(1, PEAK_HALF_WIN)
    wrank = Window.partitionBy().orderBy("x", "day")
    wall = Window.partitionBy()
    t = (
        daily.withColumn("lmax", F.max("x").over(wleft))
        .withColumn("rmax", F.max("x").over(wright))
        .withColumn("nl", F.count(F.lit(1)).over(wleft))
        .withColumn("nr", F.count(F.lit(1)).over(wright))
        .withColumn("rk", F.row_number().over(wrank))
        .withColumn("n", F.count(F.lit(1)).over(wall))
    )
    # strict local max: x beats EVERY neighbor on both sides
    is_max = (F.col("x") > F.col("lmax")) & (F.col("x") > F.col("rmax"))
    gate = F.lit(10) * F.col("rk") >= F.lit(PEAK_PCTL_X10) * F.col("n")
    # interior days only: full windows both sides
    full = (F.col("nl") == PEAK_HALF_WIN) & (F.col("nr") == PEAK_HALF_WIN)
    return (
        t.filter(is_max & gate & full)
        .select(
            "day",
            F.round(F.col("x").cast("double") / 100.0, 2).alias("rev_dollars"),
            F.col("rk").cast("long").alias("revenue_rank"),
        )
        .orderBy("day")
    )


QUERIES["revenue_peaks"] = revenue_peaks
ORACLES["revenue_peaks"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, x,
               max(x) OVER wl AS lmax,
               max(x) OVER wr AS rmax,
               count(*) OVER wl AS nl,
               count(*) OVER wr AS nr,
               row_number() OVER (ORDER BY x, day) AS rk,
               count(*) OVER () AS n
        FROM daily
        WINDOW wl AS (ORDER BY day ROWS BETWEEN {PEAK_HALF_WIN} PRECEDING
                      AND 1 PRECEDING),
               wr AS (ORDER BY day ROWS BETWEEN 1 FOLLOWING
                      AND {PEAK_HALF_WIN} FOLLOWING)
    )
    SELECT day, round(CAST(x AS DOUBLE) / 100.0, 2) AS rev_dollars,
           CAST(rk AS BIGINT) AS revenue_rank
    FROM t
    WHERE x > lmax AND x > rmax
      AND nl = {PEAK_HALF_WIN} AND nr = {PEAK_HALF_WIN}
      AND 10 * rk >= {PEAK_PCTL_X10} * n
    ORDER BY day
"""


AGING_ASOF = "2001-06-01"  # pinned as-of date inside the data window
AGING_EDGES = (30, 60, 90)  # bucket edges in days


def receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-lineitem aging report at a pinned as-of date: every lineitem
    still open (l_linestatus = 'O') whose order predates the as-of date,
    bucketed by days outstanding (0-30 / 31-60 / 61-90 / 90+) per brand,
    with exact integer cent value outstanding — the classic AR-style
    aging the finance team runs daily.

    Exactness: ages are integer datediffs; bucket edges are integer
    comparisons; outstanding value sums exact e4-dollar integers and
    rounds via the shared integer HALF_UP helper.

    Scale: one filtered fact scan (status + date predicates pushed to
    parquet), broadcast part dim, one map-side-combined rollup to the
    (brand x 4-bucket) grid.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_linestatus", "l_extendedprice", "l_discount", "l_orderkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    asof = F.lit(AGING_ASOF).cast("date")
    j = (
        li.filter(F.col("l_linestatus") == "O")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate") < asof)
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    age = F.datediff(asof, F.col("o_orderdate"))
    e1, e2, e3 = AGING_EDGES
    bucket = (
        F.when(age <= e1, F.lit("00-30"))
        .when(age <= e2, F.lit("31-60"))
        .when(age <= e3, F.lit("61-90"))
        .otherwise(F.lit("90plus"))
    )
    rev_u = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
        .cast("long")
        .cast("decimal(38,0)")
    )
    g = j.groupBy("p_brand", bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_open_items"),
        F.sum(rev_u).alias("r"),
    )
    return g.select(
        "p_brand",
        "age_bucket",
        "n_open_items",
        _usd_halfup(F.col("r")).alias("outstanding_dollars"),
    ).orderBy("p_brand", "age_bucket")


QUERIES["receivables_aging"] = receivables_aging
ORACLES["receivables_aging"] = f"""
    WITH j AS (
        SELECT p_brand,
               datediff('day', CAST(o_orderdate AS DATE),
                        DATE '{AGING_ASOF}') AS age,
               CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS HUGEINT) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND o_orderdate < DATE '{AGING_ASOF}'
    ),
    g AS (
        SELECT p_brand,
               CASE WHEN age <= {AGING_EDGES[0]} THEN '00-30'
                    WHEN age <= {AGING_EDGES[1]} THEN '31-60'
                    WHEN age <= {AGING_EDGES[2]} THEN '61-90'
                    ELSE '90plus' END AS age_bucket,
               CAST(count(*) AS BIGINT) AS n_open_items,
               sum(r) AS r
        FROM j GROUP BY 1, 2
    )
    SELECT p_brand, age_bucket, n_open_items,
           {_usd_halfup_sql("r")} AS outstanding_dollars
    FROM g ORDER BY p_brand, age_bucket
"""


DECAY_ASOF = "2024-02-01"  # pinned as-of date just past the event window
DECAY_RATE_BP = 9500  # per-day retention on the basis-point grid (0.95)
DECAY_SCALE = 1_000_000_000_000  # per-event terms on the pico grid


def decayed_engagement_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per market segment: each
    purchase contributes value * 0.95^age_days at the pinned as-of date —
    the CRM "recency-weighted spend" that rfm_segmentation buckets
    coarsely, reported with exact per-segment customer counts and the
    decayed/undecayed ratio (how recent the segment's revenue is).

    Determinism: 0.95^age evaluates via POWER on an integer day age
    (identical IEEE pow both engines); each event's decayed cents are
    rounded to the pico grid and summed as decimal(38,0).

    Scale: one events reduce keyed by user, broadcast customer dim, one
    map-side-combined rollup per segment.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    asof = F.lit(DECAY_ASOF).cast("date")
    age = F.datediff(asof, F.to_date("ts")).cast("double")
    cents = F.round(F.col("value") * 100).cast("long")
    rate = F.lit(DECAY_RATE_BP / 10000.0)
    term = cents.cast("double") * F.pow(rate, age)
    rows = e.select(
        F.col("user_id"),
        cents.cast("decimal(38,0)").alias("cents"),
        F.round(term * F.lit(DECAY_SCALE / 1.0) / 1.0).cast("decimal(38,0)")
        .alias("dt"),
    )
    # user ids map onto customers by modulus (the events stream's user
    # space is independent of custkeys; the modulus gives a deterministic
    # many-to-one assignment both engines replicate)
    nc = c.count()
    j = rows.withColumn("ck", F.col("user_id") % F.lit(nc) + 1).join(
        F.broadcast(c), F.col("ck") == F.col("c_custkey")
    )
    g = j.groupBy("c_mktsegment").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum("cents").alias("raw"),
        F.sum("dt").alias("dec"),
    )
    decayed = F.col("dec").cast("double") / DECAY_SCALE / 100.0
    raw_d = F.col("raw").cast("double") / 100.0
    return g.select(
        "c_mktsegment",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(raw_d, 2).alias("raw_dollars"),
        F.round(decayed, 2).alias("decayed_dollars"),
        F.round(decayed / raw_d, 6).alias("recency_ratio"),
    ).orderBy("c_mktsegment")


QUERIES["decayed_engagement_score"] = decayed_engagement_score
ORACLES["decayed_engagement_score"] = f"""
    WITH rows_ AS (
        SELECT user_id,
               CAST(round(value * 100) AS HUGEINT) AS cents,
               CAST(round(CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)
                          * power({DECAY_RATE_BP / 10000.0},
                                  CAST(datediff('day', CAST(ts AS DATE),
                                       DATE '{DECAY_ASOF}') AS DOUBLE))
                          * {DECAY_SCALE}.0 / 1.0) AS HUGEINT) AS dt
        FROM events WHERE event_type = 'purchase'
    ),
    nc AS (SELECT count(*) AS n FROM customer),
    j AS (
        SELECT r.*, c.c_mktsegment
        FROM rows_ r CROSS JOIN nc
        JOIN customer c ON r.user_id % nc.n + 1 = c.c_custkey
    ),
    g AS (
        SELECT c_mktsegment,
               count(DISTINCT user_id) AS n_users,
               sum(cents) AS raw, sum(dt) AS dec
        FROM j GROUP BY 1
    )
    SELECT c_mktsegment,
           CAST(n_users AS BIGINT) AS n_users,
           round(CAST(raw AS DOUBLE) / 100.0, 2) AS raw_dollars,
           round(CAST(dec AS DOUBLE) / {DECAY_SCALE} / 100.0, 2)
               AS decayed_dollars,
           round((CAST(dec AS DOUBLE) / {DECAY_SCALE} / 100.0)
                 / (CAST(raw AS DOUBLE) / 100.0), 6) AS recency_ratio
    FROM g ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AN: hot-streak detection + segment migration
# ---------------------------------------------------------------------------


def best_revenue_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-sum run of mean-centered daily revenue — "the hottest
    consecutive stretch of days" — solved set-orientedly: Kadane's
    sequential scan rewrites as max over end-days j of
    prefix(j) - min(prefix(i < j)), i.e. one cumulative-sum window, one
    running-min window, one argmax.  Centering uses the all-integer form
    y = n*x - S (scaling by n instead of dividing by it), so every
    prefix, min, and difference is an exact decimal(38,0) integer and
    the argmax tie-break (earliest end day) is flip-proof.

    Scale: the calendar-bounded daily frame; three ordered windows on it.
    """
    daily = _daily_order_revenue(spark, sf_dir)
    wall = Window.partitionBy()
    wn = Window.partitionBy().orderBy("day")
    wmin = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = (
        daily.withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("s", F.sum("x").over(wall))
        .withColumn("y", F.col("n") * F.col("x") - F.col("s"))
        .withColumn("pref", F.sum("y").over(wn))
        # empty prefix (run starting at day 1) = 0
        .withColumn(
            "minpref",
            F.least(
                F.coalesce(F.min("pref").over(wmin), F.lit(0).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ),
        )
        .withColumn("best_end_here", F.col("pref") - F.col("minpref"))
    )
    # recover the start: the day AFTER the argmin prefix (or day 1)
    wrow = Window.partitionBy().orderBy("day")
    # four consumers below (argmax, argmin scan, start join) — materialize
    # the calendar-bounded frame once instead of re-reducing orders 4x
    t = t.withColumn("rn", F.row_number().over(wrow)).localCheckpoint(
        eager=True
    )
    best = t.orderBy(F.col("best_end_here").desc(), F.col("day").asc()).limit(1)
    # join back to find the argmin day (earliest attaining minpref strictly
    # before the best end)
    b = best.select(
        F.col("day").alias("end_day"),
        F.col("rn").alias("end_rn"),
        F.col("minpref").alias("mp"),
        F.col("best_end_here").alias("excess_n"),
        F.col("n").alias("n_all"),
    )
    cand = t.join(F.broadcast(b), F.col("rn") < F.col("end_rn")).filter(
        F.col("pref") == F.col("mp")
    )
    start_rn = cand.agg(
        F.coalesce(F.min("rn"), F.lit(0)).cast("long").alias("srn")
    )
    # srn = 0 (empty-prefix minimum) resolves to rn = 1 = day 1, so the
    # single join covers both the interior-start and day-1 cases
    sd = (
        t.join(F.broadcast(start_rn), t.rn == F.col("srn") + 1, "inner")
        .select(F.col("day").alias("start_day"))
    )
    out = b.crossJoin(F.broadcast(sd))
    return out.select(
        "start_day",
        "end_day",
        F.round(
            F.col("excess_n").cast("double")
            / F.col("n_all").cast("double")
            / 100.0,
            2,
        ).alias("excess_dollars"),
    )


QUERIES["best_revenue_run"] = best_revenue_run
ORACLES["best_revenue_run"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, x,
               count(*) OVER () AS n,
               sum(x) OVER () AS s
        FROM daily
    ),
    t2 AS (
        SELECT day, n, n * x - s AS y FROM t
    ),
    t3 AS (
        SELECT day, n,
               sum(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pref,
               row_number() OVER (ORDER BY day) AS rn
        FROM t2
    ),
    t4 AS (
        SELECT *,
               least(COALESCE(min(pref) OVER (ORDER BY day ROWS BETWEEN
                         UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
                     0) AS minpref
        FROM t3
    ),
    best AS (
        SELECT day AS end_day, rn AS end_rn, minpref AS mp,
               pref - minpref AS excess_n, n AS n_all
        FROM t4
        ORDER BY pref - minpref DESC, day ASC
        LIMIT 1
    ),
    srn AS (
        SELECT COALESCE(min(t4.rn), 0) AS srn
        FROM t4, best
        WHERE t4.rn < best.end_rn AND t4.pref = best.mp
    ),
    sd AS (
        SELECT t4.day AS start_day FROM t4, srn
        WHERE t4.rn = srn.srn + 1
    )
    SELECT sd.start_day, best.end_day,
           round(CAST(best.excess_n AS DOUBLE)
                 / CAST(best.n_all AS DOUBLE) / 100.0, 2) AS excess_dollars
    FROM best, sd
"""


MIGR_Y0, MIGR_Y1 = 1996, 1997


def _spend_tiers(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    """(o_custkey, tier 1..3) by exact ascending spend rank thirds for one
    order year — the global rank uses the lorenz_deciles two-pass bucket
    decomposition (in-bucket row_number + broadcast cumulative offsets),
    never a one-task global sort window."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    rev = (
        o.filter(F.year("o_orderdate").cast("int") == year)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")
                  .cast("decimal(38,0)")).alias("rev")
        )
    )
    # b feeds the bucket counts, the total, AND the ranked join, but a
    # localCheckpoint cut measured SLOWER for the two-year migration
    # matrix (r11: 1.081 -> 1.310 s min-of-5, stable canaries):
    # ReusedExchange dedupes the identical year-filtered reduce within
    # the one job, and the cut serialized two eager jobs ahead of it.
    b = rev.withColumn(
        "bkt", F.floor(F.col("rev").cast("double") / F.lit(LORENZ_BUCKET * 100))
        .cast("long")
    )
    win_in = Window.partitionBy("bkt").orderBy("rev", "o_custkey")
    counts = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.partitionBy().orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bkt", "off")
    n_total = counts.agg(F.sum("cnt").alias("n"))
    ranked = (
        b.withColumn("r_in", F.row_number().over(win_in))
        .join(F.broadcast(offsets), "bkt")
        .crossJoin(F.broadcast(n_total))
        .select(
            "o_custkey",
            (
                F.floor(
                    (F.col("off") + F.col("r_in") - 1) * 3 / F.col("n")
                ) + 1
            ).cast("int").alias("tier"),
        )
    )
    return ranked


def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend-tier migration matrix between fiscal 1996 and 1997:
    customers ranked into exact ascending spend thirds each year
    (1 = low, 3 = high), matrix of (tier_from -> tier_to) counts over
    customers active BOTH years, with row-conditional shares — the
    retention-marketing "are my high-value customers staying high-value"
    report.

    Exactness: tiers come from exact integer rank thirds (the
    lorenz_deciles bucket-decomposed global rank), shares are one
    division of exact integers per cell.

    Scale: two year-filtered reduces of orders, custkey equi-join, 9-cell
    rollup.
    """
    t0 = _spend_tiers(spark, sf_dir, MIGR_Y0).withColumnRenamed(
        "tier", "tier_from"
    )
    t1 = _spend_tiers(spark, sf_dir, MIGR_Y1).withColumnRenamed(
        "tier", "tier_to"
    )
    j = t0.join(t1, "o_custkey")
    g = j.groupBy("tier_from", "tier_to").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    wrow = Window.partitionBy("tier_from")
    return (
        g.withColumn("row_tot", F.sum("n_customers").over(wrow))
        .select(
            "tier_from",
            "tier_to",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round(
                F.col("n_customers").cast("double")
                / F.col("row_tot").cast("double"),
                6,
            ).alias("row_share"),
        )
        .orderBy("tier_from", "tier_to")
    )


QUERIES["segment_migration_matrix"] = segment_migration_matrix
ORACLES["segment_migration_matrix"] = f"""
    WITH rev0 AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rev
        FROM orders WHERE year(o_orderdate) = {MIGR_Y0} GROUP BY 1
    ),
    t0 AS (
        SELECT o_custkey,
               CAST(floor((row_number() OVER (ORDER BY rev, o_custkey) - 1)
                          * 3 / count(*) OVER ()) + 1 AS INT) AS tier_from
        FROM rev0
    ),
    rev1 AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rev
        FROM orders WHERE year(o_orderdate) = {MIGR_Y1} GROUP BY 1
    ),
    t1 AS (
        SELECT o_custkey,
               CAST(floor((row_number() OVER (ORDER BY rev, o_custkey) - 1)
                          * 3 / count(*) OVER ()) + 1 AS INT) AS tier_to
        FROM rev1
    ),
    g AS (
        SELECT tier_from, tier_to, count(*) AS n_customers
        FROM t0 JOIN t1 USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT tier_from, tier_to,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(CAST(n_customers AS DOUBLE)
                 / CAST(sum(n_customers) OVER (PARTITION BY tier_from)
                        AS DOUBLE), 6) AS row_share
    FROM g ORDER BY tier_from, tier_to
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AO: forensic / pricing-audit tier
# ---------------------------------------------------------------------------


def price_ending_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Psychological price-point profile: distribution of order totals by
    cent ending (.00, .50, .99, .95, other) plus the round-dollar share —
    the pricing-audit companion of benford_deviation (that screens the
    FIRST digits; this screens the LAST two).

    Exactness: endings are integer cents mod 100; shares divide exact
    integers once per row.

    Scale: one map-side-combined aggregate to the 5-bucket frame.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ending = cents % 100
    bucket = (
        F.when(ending == 0, F.lit("00"))
        .when(ending == 50, F.lit("50"))
        .when(ending == 99, F.lit("99"))
        .when(ending == 95, F.lit("95"))
        .otherwise(F.lit("other"))
    )
    g = o.select(bucket.alias("ending")).groupBy("ending").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wall = Window.partitionBy()
    return (
        g.withColumn("tot", F.sum("n").over(wall))
        .select(
            "ending",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot").cast("double"), 6)
            .alias("share"),
        )
        .orderBy("ending")
    )


QUERIES["price_ending_profile"] = price_ending_profile
ORACLES["price_ending_profile"] = """
    WITH g AS (
        SELECT CASE CAST(round(o_totalprice * 100) AS BIGINT) % 100
                   WHEN 0 THEN '00' WHEN 50 THEN '50'
                   WHEN 99 THEN '99' WHEN 95 THEN '95'
                   ELSE 'other' END AS ending,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    )
    SELECT ending, n,
           round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
               AS share
    FROM g ORDER BY ending
"""


DUP_PAY_WINDOW_DAYS = 180
DUP_PAY_BAND_CENTS = 100_000  # $1,000 amount band


def duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic near-duplicate-payment screen: pairs of orders from the
    SAME customer with amounts within $1,000 of each other placed within
    180 days — the AP double-billing audit.  Candidates come from a
    (customer, amount-band, time-band) equi-join — the geo_grid_join
    shape in 2-D — so pairing cost is (amount-band x 180-day-band)
    occupancy bounded: a customer whose order count grows with the
    corpus — or a real skewed customer at 100x — pairs only within
    same-or-adjacent amount AND time cells, never across their full
    history (VERDICT r7 #2: the customer-x-amount-band key alone went
    quadratic in per-customer order density, 4.57x at 10x).  The +/-1
    neighborhood is covered with ONE explode per side — side a shifts
    the AMOUNT band by {-1,0,+1}, side b shifts the TIME band by
    {-1,0,+1} — which reaches every (d_amt, d_time) in {-1,0,1}^2
    (a's exploded amount meets b's raw amount; b's exploded time meets
    a's raw time) at 6N exploded rows instead of the 10N of a one-sided
    3x3 explode.  The ORACLE runs the brute-force per-customer pair
    join, so the hash match proves the 2-D banding lossless (each band
    width >= its tolerance, so any qualifying pair is at most one band
    apart on each axis).

    Exactness: amounts and gaps are integer cents/days end to end.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    band = F.floor(F.col("cents") / DUP_PAY_BAND_CENTS).cast("long")
    tband = F.floor(
        F.datediff(F.col("d"), F.lit("1992-01-01")) / DUP_PAY_WINDOW_DAYS
    ).cast("long")
    a = o.select(
        F.col("o_custkey").alias("ck"),
        F.explode(F.array(band - 1, band, band + 1)).alias("b"),
        tband.alias("tb"),
        F.col("cents").alias("ca"),
        F.col("o_orderkey").alias("order_a"),
        F.col("d").alias("da"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck"),
        band.alias("b"),
        F.explode(F.array(tband - 1, tband, tband + 1)).alias("tb"),
        F.col("cents").alias("cb"),
        F.col("o_orderkey").alias("order_b"),
        F.col("d").alias("db"),
    )
    j = (
        a.join(b, ["ck", "b", "tb"])
        .filter(F.col("order_a") < F.col("order_b"))
        .filter(F.abs(F.col("ca") - F.col("cb")) <= DUP_PAY_BAND_CENTS)
        .filter(
            F.abs(F.datediff(F.col("db"), F.col("da")))
            <= DUP_PAY_WINDOW_DAYS
        )
        # the band explode can pair the same two orders via two bands
        .dropDuplicates(["order_a", "order_b"])
    )
    return j.select(
        F.col("ck").alias("o_custkey"),
        "order_a",
        "order_b",
        F.round(
            F.abs(F.col("ca") - F.col("cb")).cast("double") / 100.0, 2
        ).alias("amount_gap_dollars"),
        F.abs(F.datediff(F.col("db"), F.col("da"))).cast("int").alias(
            "gap_days"
        ),
    ).orderBy("o_custkey", "order_a", "order_b")


QUERIES["duplicate_payment_screen"] = duplicate_payment_screen
ORACLES["duplicate_payment_screen"] = f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
    )
    SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           round(CAST(abs(a.cents - b.cents) AS DOUBLE) / 100.0, 2)
               AS amount_gap_dollars,
           CAST(abs(datediff('day', a.d, b.d)) AS INT) AS gap_days
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    WHERE abs(a.cents - b.cents) <= {DUP_PAY_BAND_CENTS}
      AND abs(datediff('day', a.d, b.d)) <= {DUP_PAY_WINDOW_DAYS}
    ORDER BY a.o_custkey, order_a, order_b
"""


SPLIT_THRESHOLD_CENTS = 200_000_00  # structuring threshold: $200,000


def split_purchase_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structuring (split-purchase) screen: customer-days with 2+ orders,
    EACH under the $200k approval threshold, whose combined total crosses
    it — the forensic pattern of splitting one large purchase to dodge an
    approval limit.  All comparisons are integer cents.

    Scale: one reduce of orders to the (customer, day) grain with
    conditional integer aggregates; no join at all.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    thr = F.lit(SPLIT_THRESHOLD_CENTS)
    g = o.groupBy("o_custkey", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").alias("total_cents"),
        F.max("cents").alias("max_cents"),
    )
    hits = g.filter(
        (F.col("n_orders") >= 2)
        & (F.col("max_cents") < thr)
        & (F.col("total_cents") >= thr)
    )
    return hits.select(
        "o_custkey",
        F.col("d").alias("day"),
        "n_orders",
        F.round(F.col("total_cents").cast("double") / 100.0, 2).alias(
            "combined_dollars"
        ),
        F.round(F.col("max_cents").cast("double") / 100.0, 2).alias(
            "largest_single_dollars"
        ),
    ).orderBy("o_custkey", "day")


QUERIES["split_purchase_screen"] = split_purchase_screen
ORACLES["split_purchase_screen"] = f"""
    WITH g AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents,
               max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
        FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, day, n_orders,
           round(CAST(total_cents AS DOUBLE) / 100.0, 2) AS combined_dollars,
           round(CAST(max_cents AS DOUBLE) / 100.0, 2)
               AS largest_single_dollars
    FROM g
    WHERE n_orders >= 2 AND max_cents < {SPLIT_THRESHOLD_CENTS}
      AND total_cents >= {SPLIT_THRESHOLD_CENTS}
    ORDER BY o_custkey, day
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AP: supply-chain / QA tier
# ---------------------------------------------------------------------------


def return_enrichment_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypergeometric enrichment screen: is any brand over-represented
    among RETURNED lineitems?  For each brand, observed returns k vs the
    hypergeometric expectation under brand-independent returns
    (mean = n*K/N, var = n*K/N * (N-K)/N * (N-n)/(N-1)), reported as
    fold-enrichment and a z-score — the QA screen for "this brand's
    products come back too often".

    Exactness: all four counts are exact integers; mean/var/z are single
    float expressions of them.

    Scale: two map-side-combined aggregates of lineitem (per-brand and
    global), broadcast dim, 25-row math.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    per = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("k"),
    )
    tot = per.agg(
        F.sum("n").alias("nn"), F.sum("k").alias("kk")
    )
    t = per.crossJoin(F.broadcast(tot))
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    nn, kk = F.col("nn").cast("double"), F.col("kk").cast("double")
    mean = n * kk / nn
    var = n * (kk / nn) * ((nn - kk) / nn) * ((nn - n) / (nn - 1))
    return t.select(
        "p_brand",
        F.col("n").cast("long").alias("n_items"),
        F.col("k").cast("long").alias("n_returned"),
        F.round(k / mean, 4).alias("fold_enrichment"),
        F.round((k - mean) / F.sqrt(var), 4).alias("z_score"),
    ).orderBy("p_brand")


QUERIES["return_enrichment_by_brand"] = return_enrichment_by_brand
ORACLES["return_enrichment_by_brand"] = """
    WITH per AS (
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS nn, sum(k) AS kk FROM per)
    SELECT p_brand, n AS n_items, k AS n_returned,
           round(CAST(k AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                    / CAST(nn AS DOUBLE)), 4) AS fold_enrichment,
           round((CAST(k AS DOUBLE) - CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                      / CAST(nn AS DOUBLE))
                 / sqrt(CAST(n AS DOUBLE)
                        * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
                        * ((CAST(nn AS DOUBLE) - CAST(kk AS DOUBLE))
                           / CAST(nn AS DOUBLE))
                        * ((CAST(nn AS DOUBLE) - CAST(n AS DOUBLE))
                           / (CAST(nn AS DOUBLE) - 1))), 4) AS z_score
    FROM per, tot ORDER BY p_brand
"""


SUPPLY_RISK_TOP = 20
SUPPLY_RISK_MIN_QTY = 100  # volume floor: ignore trace parts
SUPPLY_HHI_SCALE = 1_000_000_000_000


def supply_risk_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration risk: per part, the Herfindahl index of its
    quantity share across suppliers; the report is the top-20 MOST
    CONCENTRATED parts over a volume floor — the supply-chain risk screen
    behind TPC-H q20/q21's supplier questions.

    Exactness: HHI = sum(q_s^2) / (sum q_s)^2 on exact integer
    quantities; the top-k SORT KEY is the integer
    (q2 * 1e12) div (qt*qt) — a float HHI key could flip ties between
    engines, the integer key cannot.

    Scale: one map-side-combined reduce to the (part x supplier) grid,
    one per-part rollup, TakeOrderedAndProject top-k.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("q")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("q").cast("decimal(38,0)").alias("qs")
    )
    per = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("qs").alias("qt"),
        F.sum(F.col("qs") * F.col("qs")).alias("q2"),
    )
    key = F.expr(
        f"CAST((q2 * {SUPPLY_HHI_SCALE}) div (qt * qt) AS DECIMAL(38,0))"
    )
    return (
        per.filter(F.col("qt") >= SUPPLY_RISK_MIN_QTY)
        .withColumn("hhi_key", key)
        .orderBy(F.col("hhi_key").desc(), F.col("l_partkey").asc())
        .limit(SUPPLY_RISK_TOP)
        .select(
            F.col("l_partkey").cast("long").alias("part_id"),
            "n_suppliers",
            F.col("qt").cast("long").alias("total_qty"),
            (F.col("hhi_key").cast("double") / SUPPLY_HHI_SCALE).alias("hhi"),
        )
    )


QUERIES["supply_risk_hhi"] = supply_risk_hhi
ORACLES["supply_risk_hhi"] = f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS HUGEINT)) AS qs
        FROM lineitem GROUP BY 1, 2
    ),
    per AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
               sum(qs) AS qt, sum(qs * qs) AS q2
        FROM ps GROUP BY 1
    ),
    keyed AS (
        SELECT *, (q2 * {SUPPLY_HHI_SCALE}) // (qt * qt) AS hhi_key
        FROM per WHERE qt >= {SUPPLY_RISK_MIN_QTY}
    )
    SELECT CAST(l_partkey AS BIGINT) AS part_id, n_suppliers,
           CAST(qt AS BIGINT) AS total_qty,
           CAST(hhi_key AS DOUBLE) / {SUPPLY_HHI_SCALE} AS hhi
    FROM keyed
    ORDER BY hhi_key DESC, part_id ASC
    LIMIT {SUPPLY_RISK_TOP}
"""


def ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle time per brand: exact p50/p90/max of the
    integer day lag from order date to line ship date — the supply-chain
    SLA twin of latency_sla_report (which covers the event stream).
    Percentiles are exact order statistics via the cross-multiplied rank
    test (100*rank >= p*n picks the ceiling-rank element), never a float
    percentile.

    Scale: fact join on orderkey, one reduce to (brand, lag) cells, one
    brand-partitioned rank window over the bounded lag grid.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag"),
        )
        .filter(F.col("lag") >= 0)
    )
    cells = j.groupBy("p_brand", "lag").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("p_brand").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = cells.groupBy("p_brand").agg(F.sum("c").alias("n"))
    cum = cells.withColumn("cc", F.sum("c").over(wc)).join(
        F.broadcast(tot), "p_brand"
    )
    def pick(pct):
        return F.min(
            F.when(F.lit(100) * F.col("cc") >= F.lit(pct) * F.col("n"),
                   F.col("lag"))
        )
    g = cum.groupBy("p_brand").agg(
        F.max("n").cast("long").alias("n_lines"),
        pick(50).cast("int").alias("p50_days"),
        pick(90).cast("int").alias("p90_days"),
        F.max("lag").cast("int").alias("max_days"),
    )
    return g.orderBy("p_brand")


QUERIES["ship_lag_percentiles"] = ship_lag_percentiles
ORACLES["ship_lag_percentiles"] = """
    WITH j AS (
        SELECT p_brand,
               datediff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS lag
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE datediff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) >= 0
    ),
    cells AS (
        SELECT p_brand, lag, count(*) AS c FROM j GROUP BY 1, 2
    ),
    cum AS (
        SELECT p_brand, lag, c,
               sum(c) OVER (PARTITION BY p_brand ORDER BY lag
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cc,
               sum(c) OVER (PARTITION BY p_brand) AS n
        FROM cells
    )
    SELECT p_brand,
           CAST(max(n) AS BIGINT) AS n_lines,
           CAST(min(CASE WHEN 100 * cc >= 50 * n THEN lag END) AS INT)
               AS p50_days,
           CAST(min(CASE WHEN 100 * cc >= 90 * n THEN lag END) AS INT)
               AS p90_days,
           CAST(max(lag) AS INT) AS max_days
    FROM cum GROUP BY 1 ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AQ: repurchase cycle profile
# ---------------------------------------------------------------------------


def repurchase_interval_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase cycle per market segment: exact p25/p50/p75 of the
    integer day gaps between a customer's consecutive orders — the CRM
    "how often do they come back" metric that sets campaign cadence
    (the order-stream twin of interarrival_gaps on events).

    Exactness: gaps are integer datediffs from a customer-partitioned
    ordered window (ties broken by orderkey); percentiles are exact
    order statistics via the cross-multiplied rank test on the bounded
    (segment x gap-day) grid.

    Scale: one customer-keyed window over orders, broadcast dim, one
    reduce to the gap grid, one segment-partitioned rank window.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("prev", F.lag("o_orderdate").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("o_orderdate"), F.col("prev")).alias("gap"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    )
    cells = gaps.groupBy("c_mktsegment", "gap").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = Window.partitionBy("c_mktsegment").orderBy("gap").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = cells.groupBy("c_mktsegment").agg(F.sum("cnt").alias("n"))
    cum = cells.withColumn("cc", F.sum("cnt").over(wc)).join(
        F.broadcast(tot), "c_mktsegment"
    )

    def pick(pct):
        return F.min(
            F.when(
                F.lit(100) * F.col("cc") >= F.lit(pct) * F.col("n"),
                F.col("gap"),
            )
        )

    return (
        cum.groupBy("c_mktsegment")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            pick(25).cast("int").alias("p25_days"),
            pick(50).cast("int").alias("p50_days"),
            pick(75).cast("int").alias("p75_days"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES["repurchase_interval_profile"] = repurchase_interval_profile
ORACLES["repurchase_interval_profile"] = """
    WITH gaps AS (
        SELECT c_mktsegment,
               datediff('day', CAST(prev AS DATE),
                        CAST(o_orderdate AS DATE)) AS gap
        FROM (
            SELECT o_custkey, o_orderdate,
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev
            FROM orders
        ) o
        JOIN customer ON o_custkey = c_custkey
        WHERE prev IS NOT NULL
    ),
    cells AS (
        SELECT c_mktsegment, gap, count(*) AS cnt FROM gaps GROUP BY 1, 2
    ),
    cum AS (
        SELECT c_mktsegment, gap, cnt,
               sum(cnt) OVER (PARTITION BY c_mktsegment ORDER BY gap
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cc,
               sum(cnt) OVER (PARTITION BY c_mktsegment) AS n
        FROM cells
    )
    SELECT c_mktsegment,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(min(CASE WHEN 100 * cc >= 25 * n THEN gap END) AS INT)
               AS p25_days,
           CAST(min(CASE WHEN 100 * cc >= 50 * n THEN gap END) AS INT)
               AS p50_days,
           CAST(min(CASE WHEN 100 * cc >= 75 * n THEN gap END) AS INT)
               AS p75_days
    FROM cum GROUP BY 1 ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# round-5 fifth session, wave AR: econometric closers (HAC SE, spectra)
# ---------------------------------------------------------------------------

NW_LAGS = 7  # Newey-West truncation (one weekly cycle)
NW_SCALE = 1_000_000_000  # residuals rounded to whole cents; products exact


def newey_west_trend_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC) standard error for the daily-revenue trend slope:
    the OLS slope's naive SE understates uncertainty when residuals are
    serially correlated (durbin_watson_trend measures that correlation;
    this corrects for it).  Var_NW(b) = S0 + 2*sum_l w_l*S_l over
    Bartlett weights w_l = 1 - l/(L+1), with S_l = sum_t v_t*v_{t-l},
    v_t = (t - tbar)*e_t, all divided by (sum (t-tbar)^2)^2.

    Determinism: slope/intercept come from exact integer moments;
    residuals are rounded to WHOLE CENTS (the durbin_watson pattern) and
    (t - tbar) scaled by n to stay integer, so every v_t and every lag
    product S_l folds as exact decimal(38,0); the Bartlett combination is
    one float expression per output cell.

    Scale: the calendar-bounded daily frame, one ordered window carrying
    NW_LAGS lag columns, one integer aggregate.
    """
    daily = _daily_order_revenue(spark, sf_dir).select(
        "day",
        F.datediff(F.col("day"), F.lit("1995-01-01")).cast("double").alias("t"),
        F.col("x").cast("double").alias("xd"),
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").alias("st"),
        F.sum("xd").alias("sx"),
        F.sum(F.col("t") * F.col("xd")).alias("stx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    b = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    a = (F.col("sx") - b * F.col("st")) / F.col("n")
    fit = mom.select(
        b.alias("b"), a.alias("a"),
        F.col("n").alias("n"), F.col("st").alias("st"),
        F.col("stt").alias("stt"),
    )
    wn = Window.partitionBy().orderBy("day")
    # v_t = (n*t - st) * e_t : both factors exact integers after rounding
    res = daily.crossJoin(F.broadcast(fit)).select(
        "day",
        "n",
        "st",
        "stt",
        (
            (F.col("n") * F.col("t") - F.col("st")).cast("decimal(38,0)")
            * F.round(F.col("xd") - F.col("a") - F.col("b") * F.col("t"))
            .cast("decimal(38,0)")
        ).alias("v"),
    )
    lagged = res.select(
        "n", "st", "stt", "v",
        *[F.lag("v", l).over(wn).alias(f"v{l}") for l in range(1, NW_LAGS + 1)],
    )
    agg = lagged.agg(
        F.max("n").alias("n"),
        F.max("st").alias("st"),
        F.max("stt").alias("stt"),
        F.sum(F.col("v") * F.col("v")).alias("s0"),
        *[
            F.sum(F.col("v") * F.col(f"v{l}")).alias(f"s{l}")
            for l in range(1, NW_LAGS + 1)
        ],
    )
    n, st, stt = F.col("n"), F.col("st"), F.col("stt")
    sxx = n * stt - st * st  # = n^2 * sum (t - tbar)^2 / n ... exact combo
    var_naive = F.col("s0").cast("double") / (sxx * sxx)
    nw_sum = F.col("s0").cast("double")
    for l in range(1, NW_LAGS + 1):
        w = 1.0 - l / (NW_LAGS + 1.0)
        nw_sum = nw_sum + 2.0 * w * F.col(f"s{l}").cast("double")
    var_nw = nw_sum / (sxx * sxx)
    # the n-scaling of v and of sxx cancels exactly: var = s / sxx^2
    return agg.select(
        F.round(F.sqrt(var_naive) / 100.0, 6).alias("se_naive_dollars_day"),
        F.round(F.sqrt(var_nw) / 100.0, 6).alias("se_nw_dollars_day"),
        F.round(F.sqrt(var_nw) / F.sqrt(var_naive), 4).alias("hac_inflation"),
    )


QUERIES["newey_west_trend_se"] = newey_west_trend_se


def _nw_oracle() -> str:
    lag_cols = ",\n               ".join(
        f"lag(v, {l}) OVER (ORDER BY day) AS v{l}"
        for l in range(1, NW_LAGS + 1)
    )
    lag_sums = ",\n               ".join(
        f"sum(v * v{l}) AS s{l}" for l in range(1, NW_LAGS + 1)
    )
    nw_terms = " + ".join(
        f"2.0 * {1.0 - l / (NW_LAGS + 1.0)!r} * CAST(s{l} AS DOUBLE)"
        for l in range(1, NW_LAGS + 1)
    )
    return f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS DOUBLE) AS t,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS DOUBLE) AS xd
        FROM orders GROUP BY 1, 2
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st, sum(xd) AS sx,
               sum(t * xd) AS stx, sum(t * t) AS stt
        FROM daily
    ),
    fit AS (
        SELECT (n * stx - st * sx) / (n * stt - st * st) AS b,
               (sx - (n * stx - st * sx) / (n * stt - st * st) * st) / n AS a,
               n, st, stt
        FROM mom
    ),
    res AS (
        SELECT day, n, st, stt,
               CAST(n * t - st AS HUGEINT)
               * CAST(round(xd - a - b * t) AS HUGEINT) AS v
        FROM daily CROSS JOIN fit
    ),
    lagged AS (
        SELECT n, st, stt, v,
               {lag_cols}
        FROM res
    ),
    agg AS (
        SELECT max(n) AS n, max(st) AS st, max(stt) AS stt,
               sum(v * v) AS s0,
               {lag_sums}
        FROM lagged
    )
    SELECT round(sqrt(CAST(s0 AS DOUBLE)
                      / ((n * stt - st * st) * (n * stt - st * st)))
                 / 100.0, 6) AS se_naive_dollars_day,
           round(sqrt((CAST(s0 AS DOUBLE) + {nw_terms})
                      / ((n * stt - st * st) * (n * stt - st * st)))
                 / 100.0, 6) AS se_nw_dollars_day,
           round(sqrt((CAST(s0 AS DOUBLE) + {nw_terms})
                      / ((n * stt - st * st) * (n * stt - st * st)))
                 / sqrt(CAST(s0 AS DOUBLE)
                        / ((n * stt - st * st) * (n * stt - st * st))), 4)
               AS hac_inflation
    FROM agg
"""


ORACLES["newey_west_trend_se"] = _nw_oracle()


import math as _m2  # noqa: E402

WEEKLY_COS = [_m2.cos(2 * _m2.pi * k / 7) for k in range(7)]
WEEKLY_SIN = [_m2.sin(2 * _m2.pi * k / 7) for k in range(7)]


def weekly_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of daily-revenue variance at the weekly frequency: the
    single-frequency periodogram 2*(C^2+S^2)/(n*SS) with
    C = sum y_t cos(2*pi*d_t/7), S likewise — the frequency-domain twin
    of weekday_seasonal_index (that one reports per-day indices; this
    one reports ONE number: how periodic the series is), evaluated
    Goertzel-style with the seven cos/sin values PRECOMPUTED IN PYTHON
    and inlined as literals on both engines (no engine trig).

    Determinism: y = n*x - S_tot keeps centering integral; each y*cos
    term is one float product rounded to the unit grid and summed as
    decimal(38,0); SS = sum y^2 is exact.

    Scale: the calendar-bounded daily frame; one aggregate.
    """
    daily = _daily_order_revenue(spark, sf_dir)
    wall = Window.partitionBy()
    t = (
        daily.withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("stot", F.sum("x").over(wall))
        .withColumn("y", F.col("n") * F.col("x") - F.col("stot"))
        .withColumn(
            "k",
            (F.datediff(F.col("day"), F.lit("1995-01-01")) % 7).cast("int"),
        )
    )
    cexp = F.lit(None).cast("double")
    sexp = F.lit(None).cast("double")
    for k in range(7):
        cexp = F.when(F.col("k") == k, F.lit(WEEKLY_COS[k])).otherwise(cexp)
        sexp = F.when(F.col("k") == k, F.lit(WEEKLY_SIN[k])).otherwise(sexp)
    terms = t.select(
        "n",
        F.round(F.col("y").cast("double") * cexp).cast("decimal(38,0)")
        .alias("tc"),
        F.round(F.col("y").cast("double") * sexp).cast("decimal(38,0)")
        .alias("ts"),
        (F.col("y") * F.col("y")).alias("yy"),
    )
    g = terms.agg(
        F.max("n").cast("double").alias("n"),
        F.sum("tc").cast("double").alias("c"),
        F.sum("ts").cast("double").alias("s"),
        F.sum("yy").cast("double").alias("ss"),
    )
    power = (F.col("c") * F.col("c") + F.col("s") * F.col("s"))
    share = 2.0 * power / (F.col("n") * F.col("ss"))
    amp = 2.0 * F.sqrt(power) / (F.col("n") * F.col("n")) / 100.0
    return g.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(share, 6).alias("weekly_power_share"),
        F.round(amp, 2).alias("weekly_amplitude_dollars"),
    )


QUERIES["weekly_spectral_power"] = weekly_spectral_power


def _weekly_oracle() -> str:
    cs = " ".join(
        f"WHEN {k} THEN {WEEKLY_COS[k]!r}" for k in range(7)
    )
    sn = " ".join(
        f"WHEN {k} THEN {WEEKLY_SIN[k]!r}" for k in range(7)
    )
    return f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS x
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, x,
               count(*) OVER () AS n,
               sum(x) OVER () AS stot
        FROM daily
    ),
    t2 AS (
        SELECT n, n * x - stot AS y,
               CAST(datediff('day', DATE '1995-01-01', CAST(day AS DATE)) % 7
                    AS INT) AS k
        FROM t
    ),
    terms AS (
        SELECT n,
               CAST(round(CAST(y AS DOUBLE)
                    * (CASE k {cs} END)) AS HUGEINT) AS tc,
               CAST(round(CAST(y AS DOUBLE)
                    * (CASE k {sn} END)) AS HUGEINT) AS ts,
               y * y AS yy
        FROM t2
    ),
    g AS (
        SELECT CAST(max(n) AS DOUBLE) AS n,
               CAST(sum(tc) AS DOUBLE) AS c,
               CAST(sum(ts) AS DOUBLE) AS s,
               CAST(sum(yy) AS DOUBLE) AS ss
        FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(2.0 * (c * c + s * s) / (n * ss), 6)
               AS weekly_power_share,
           round(2.0 * sqrt(c * c + s * s) / (n * n) / 100.0, 2)
               AS weekly_amplitude_dollars
    FROM g
"""


ORACLES["weekly_spectral_power"] = _weekly_oracle()


# round-6 wave BB: multi-harmonic spectral entropy of the weekly cycle
SPECTRAL_HARMONICS = 3
_SPEC_COS = {
    k: [_m2.cos(2 * _m2.pi * k * m / 7) for m in range(7)]
    for k in range(1, SPECTRAL_HARMONICS + 1)
}
_SPEC_SIN = {
    k: [_m2.sin(2 * _m2.pi * k * m / 7) for m in range(7)]
    for k in range(1, SPECTRAL_HARMONICS + 1)
}


def spectral_entropy_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy over the first SPECTRAL_HARMONICS
    harmonics of the 7-day cycle: how CONCENTRATED the weekly structure
    is (entropy ~0 = one pure tone, ~1 = energy spread across
    harmonics) — the shape statistic weekly_spectral_power's single
    fundamental cannot see.  All cos/sin values repeat with period 7
    for integer harmonics, so they inline as 7 Python-precomputed
    literals per harmonic (no engine trig), exactly the
    weekly_spectral_power convention.

    Determinism: y = n*x - S keeps centering integral; each y*trig term
    rounds to the unit grid and folds in decimal(38,0); powers, shares
    and the entropy are single float expressions of those exact folds.

    Scale: the calendar-bounded daily frame; one aggregate.
    """
    daily = _daily_order_revenue(spark, sf_dir)
    wall = Window.partitionBy()
    t = (
        daily.withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("stot", F.sum("x").over(wall))
        .withColumn("y", F.col("n") * F.col("x") - F.col("stot"))
        .withColumn(
            "m",
            (F.datediff(F.col("day"), F.lit("1995-01-01")) % 7).cast("int"),
        )
    )
    cols = []
    for k in range(1, SPECTRAL_HARMONICS + 1):
        cexp = F.lit(None).cast("double")
        sexp = F.lit(None).cast("double")
        for m in range(7):
            cexp = F.when(F.col("m") == m, F.lit(_SPEC_COS[k][m])).otherwise(cexp)
            sexp = F.when(F.col("m") == m, F.lit(_SPEC_SIN[k][m])).otherwise(sexp)
        cols.append(
            F.round(F.col("y").cast("double") * cexp)
            .cast("decimal(38,0)")
            .alias(f"c{k}")
        )
        cols.append(
            F.round(F.col("y").cast("double") * sexp)
            .cast("decimal(38,0)")
            .alias(f"s{k}")
        )
    terms = t.select("n", *cols)
    aggs = [F.max("n").cast("double").alias("n")]
    for k in range(1, SPECTRAL_HARMONICS + 1):
        aggs.append(F.sum(f"c{k}").cast("double").alias(f"cc{k}"))
        aggs.append(F.sum(f"s{k}").cast("double").alias(f"ss{k}"))
    g = terms.agg(*aggs)
    powers = {
        k: F.col(f"cc{k}") * F.col(f"cc{k}") + F.col(f"ss{k}") * F.col(f"ss{k}")
        for k in range(1, SPECTRAL_HARMONICS + 1)
    }
    ptot = sum(powers.values())
    shares = {k: powers[k] / ptot for k in powers}
    ent = -sum(
        F.when(shares[k] > 0, shares[k] * F.log(shares[k])).otherwise(F.lit(0.0))
        for k in shares
    ) / _m2.log(SPECTRAL_HARMONICS)
    out_cols = [F.col("n").cast("long").alias("n_days")]
    for k in range(1, SPECTRAL_HARMONICS + 1):
        out_cols.append(F.round(shares[k], 6).alias(f"share_h{k}"))
    out_cols.append(F.round(ent, 6).alias("spectral_entropy"))
    return g.select(*out_cols)


def _spectral_entropy_oracle() -> str:
    def case_of(vals):
        cs = " ".join(f"WHEN {m} THEN {vals[m]!r}" for m in range(7))
        return f"(CASE (datediff('day', DATE '1995-01-01', CAST(day AS DATE)) % 7) {cs} END)"

    term_cols = ", ".join(
        f"CAST(round(CAST(y AS DOUBLE) * {case_of(_SPEC_COS[k])}) AS HUGEINT) AS c{k}, "
        f"CAST(round(CAST(y AS DOUBLE) * {case_of(_SPEC_SIN[k])}) AS HUGEINT) AS s{k}"
        for k in range(1, SPECTRAL_HARMONICS + 1)
    )
    sums = ", ".join(
        f"CAST(sum(c{k}) AS DOUBLE) AS cc{k}, CAST(sum(s{k}) AS DOUBLE) AS ss{k}"
        for k in range(1, SPECTRAL_HARMONICS + 1)
    )
    pw = {k: f"(cc{k} * cc{k} + ss{k} * ss{k})" for k in range(1, SPECTRAL_HARMONICS + 1)}
    ptot = " + ".join(pw.values())
    share_cols = ", ".join(
        f"round({pw[k]} / ({ptot}), 6) AS share_h{k}"
        for k in range(1, SPECTRAL_HARMONICS + 1)
    )
    ent_terms = " + ".join(
        f"(CASE WHEN {pw[k]} > 0 THEN ({pw[k]} / ({ptot})) * ln({pw[k]} / ({ptot})) ELSE 0.0 END)"
        for k in range(1, SPECTRAL_HARMONICS + 1)
    )
    return f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS stot FROM daily),
    cent AS (
        SELECT day, n, n * x - stot AS y FROM daily, tot
    ),
    terms AS (SELECT n, {term_cols} FROM cent),
    g AS (SELECT CAST(max(n) AS DOUBLE) AS n, {sums} FROM terms)
    SELECT CAST(n AS BIGINT) AS n_days, {share_cols},
           round(-({ent_terms}) / {_m2.log(SPECTRAL_HARMONICS)!r}, 6)
               AS spectral_entropy
    FROM g
"""


ORACLES["spectral_entropy_weekly"] = _spectral_entropy_oracle()
QUERIES["spectral_entropy_weekly"] = spectral_entropy_weekly


def lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz asymmetry coefficient S = F(mu) + L(mu) for customer order
    revenue — the refinement lorenz_deciles cannot express: two
    populations can share a Gini while the inequality sits at opposite
    ends (S < 1: driven by many SMALL customers; S > 1: by a few WHALES
    — the retention-strategy difference).  Damgaard-Weiner form with
    linear interpolation at the mean crossing:
    S = (m + delta)/n + (L_m + delta*x_{m+1})/total, where m = #units
    below the mean, L_m their revenue mass, delta = (mu - x_m)/(x_{m+1}
    - x_m).

    Exactness: m and L_m are exact conditional sums against the
    cross-multiplied mean test (n*x < total — never a float mu); the two
    order statistics around the mean come from struct-max/min picks of
    (value, key) on the conditional frames; delta's one division runs on
    exact n-scaled integers.

    Scale: two reduces over the per-customer frame; no global sort, no
    window.
    """
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("v")
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("v").alias("s"),
    )
    j = per.crossJoin(F.broadcast(tot))
    below = F.col("n") * F.col("v") < F.col("s")  # v < mu, exact
    agg = j.agg(
        F.sum(below.cast("long")).alias("m"),
        F.sum(F.when(below, F.col("v")).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("lm"),
        F.max(F.when(below, F.col("v"))).alias("x_m"),
        F.min(F.when(~below, F.col("v"))).alias("x_m1"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    # delta = (mu - x_m)/(x_{m+1} - x_m) = (s - n*x_m)/(n*(x_m1 - x_m))
    delta = (F.col("s") - F.col("n") * F.col("x_m")).cast("double") / (
        F.col("n") * (F.col("x_m1") - F.col("x_m"))
    ).cast("double")
    s_raw = (F.col("m").cast("double") + delta) / nd + (
        F.col("lm").cast("double") + delta * F.col("x_m1").cast("double")
    ) / sd
    # Degenerate frame (ADVICE r6): every value equals the mean -> no unit
    # strictly below it, x_m is NULL and delta's null would propagate an
    # all-null S with no signal.  The Lorenz curve of a perfectly equal
    # population is the diagonal: S = 1, 'symmetric' -- emit that
    # explicitly instead of null (oracle carries the same guard).
    s_coef = F.when(F.col("x_m").isNull(), F.lit(1.0)).otherwise(s_raw)
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("m").cast("long").alias("n_below_mean"),
        F.round(F.col("m").cast("double") / nd, 6).alias("f_mu"),
        F.round(F.col("lm").cast("double") / sd, 6).alias("l_mu"),
        F.round(s_coef, 6).alias("lorenz_asymmetry"),
        F.when(s_coef > 1.0, F.lit("whale-driven"))
        .when(s_coef < 1.0, F.lit("long-tail-driven"))
        .otherwise(F.lit("symmetric"))
        .alias("shape"),
    )


ORACLES["lorenz_asymmetry"] = """
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS HUGEINT) AS v
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(v) AS s FROM per
    ),
    agg AS (
        SELECT CAST(sum(CASE WHEN n * v < s THEN 1 ELSE 0 END) AS BIGINT)
                   AS m,
               sum(CASE WHEN n * v < s THEN v ELSE 0 END) AS lm,
               max(CASE WHEN n * v < s THEN v END) AS x_m,
               min(CASE WHEN NOT (n * v < s) THEN v END) AS x_m1,
               max(n) AS n, max(s) AS s
        FROM per, tot
    ),
    sc AS (
        SELECT n, m, lm, s,
               CASE WHEN x_m IS NULL THEN 1.0
                    ELSE (m + CAST(s - n * x_m AS DOUBLE)
                              / CAST(n * (x_m1 - x_m) AS DOUBLE))
                         / CAST(n AS DOUBLE)
                         + (CAST(lm AS DOUBLE)
                            + CAST(s - n * x_m AS DOUBLE)
                              / CAST(n * (x_m1 - x_m) AS DOUBLE)
                              * CAST(x_m1 AS DOUBLE))
                           / CAST(s AS DOUBLE) END AS s_coef
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_customers, m AS n_below_mean,
           round(m / CAST(n AS DOUBLE), 6) AS f_mu,
           round(CAST(lm AS DOUBLE) / CAST(s AS DOUBLE), 6) AS l_mu,
           round(s_coef, 6) AS lorenz_asymmetry,
           CASE WHEN s_coef > 1.0 THEN 'whale-driven'
                WHEN s_coef < 1.0 THEN 'long-tail-driven'
                ELSE 'symmetric' END AS shape
    FROM sc
"""
QUERIES["lorenz_asymmetry"] = lorenz_asymmetry


# Xbar-R constants for subgroup size 7 (standard SPC tables)
XBARR_A2, XBARR_D3, XBARR_D4 = 0.419, 0.076, 1.924


def xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Xbar-R control chart of daily revenue with COMPLETE ISO weeks as
    rational subgroups (n = 7) — the subgrouped SPC companion of
    control_chart_days (individuals chart): the R chart separates
    WITHIN-week dispersion shifts from the BETWEEN-week level shifts
    the Xbar chart flags, which an individuals chart conflates.

    Exactness: subgroup means are exact integer sums over the pinned
    7-day weeks (incomplete weeks excluded through the count; the
    (weekofyear, calendar-year) key also splits the one ISO week that
    straddles New Year, deliberately dropping it — a partial holiday
    week is not a rational subgroup); ranges are integer max-min; the
    A2/D3/D4 constants for n = 7 are Python literals; limits and
    out-of-control verdicts compare identical doubles.  Emits the 15
    most recent complete weeks with each week's verdict (in-control
    included — the chart IS the deliverable, not just its alarms).

    Scale: one reduce to the daily frame, one to the week frame;
    verdicts are projections.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    weeks = (
        daily.groupBy(
            F.weekofyear("day").alias("wk"), F.year("day").alias("yr")
        )
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum("xc").alias("s"),
            F.max("xc").alias("mx"),
            F.min("xc").alias("mn"),
            F.min("day").alias("week_start"),
        )
        .filter(F.col("nd") == 7)
        .select(
            "week_start",
            (F.col("s").cast("double") / 7.0).alias("xbar"),
            (F.col("mx") - F.col("mn")).cast("double").alias("r"),
        )
    )
    centers = weeks.agg(
        F.count(F.lit(1)).alias("k"),
        F.avg("xbar").alias("xbarbar"),
        F.avg("r").alias("rbar"),
    )
    j = weeks.crossJoin(F.broadcast(centers))
    ucl_x = F.col("xbarbar") + XBARR_A2 * F.col("rbar")
    lcl_x = F.col("xbarbar") - XBARR_A2 * F.col("rbar")
    ucl_r = XBARR_D4 * F.col("rbar")
    lcl_r = XBARR_D3 * F.col("rbar")
    flagged = j.select(
        "week_start",
        F.round(F.col("xbar") / 100.0, 2).alias("xbar_dollars"),
        F.round(F.col("r") / 100.0, 2).alias("range_dollars"),
        F.when(F.col("xbar") > ucl_x, F.lit("xbar-high"))
        .when(F.col("xbar") < lcl_x, F.lit("xbar-low"))
        .when(F.col("r") > ucl_r, F.lit("range-high"))
        .when(F.col("r") < lcl_r, F.lit("range-low"))
        .otherwise(F.lit("in-control"))
        .alias("signal"),
        F.col("k").cast("long").alias("n_weeks"),
    )
    return flagged.orderBy(F.col("week_start").desc()).limit(15)


ORACLES["xbar_r_chart"] = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    weeks AS (
        SELECT min(day) AS week_start,
               sum(xc) * 1.0 / 7.0 AS xbar,
               CAST(max(xc) - min(xc) AS DOUBLE) AS r
        FROM daily
        GROUP BY weekofyear(CAST(day AS DATE)), year(CAST(day AS DATE))
        HAVING count(*) = 7
    ),
    centers AS (
        SELECT CAST(count(*) AS BIGINT) AS k, avg(xbar) AS xbarbar,
               avg(r) AS rbar
        FROM weeks
    ),
    flagged AS (
        SELECT week_start,
               round(xbar / 100.0, 2) AS xbar_dollars,
               round(r / 100.0, 2) AS range_dollars,
               CASE WHEN xbar > xbarbar + {XBARR_A2} * rbar
                    THEN 'xbar-high'
                    WHEN xbar < xbarbar - {XBARR_A2} * rbar
                    THEN 'xbar-low'
                    WHEN r > {XBARR_D4} * rbar THEN 'range-high'
                    WHEN r < {XBARR_D3} * rbar THEN 'range-low'
                    ELSE 'in-control'
                    END AS signal,
               k AS n_weeks
        FROM weeks, centers
    )
    SELECT * FROM flagged
    ORDER BY week_start DESC LIMIT 15
"""
QUERIES["xbar_r_chart"] = xbar_r_chart


def record_highs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-value analysis of daily revenue: how many days set a new
    ALL-TIME revenue high, against the exchangeability expectation — a
    stationary exchangeable series produces E = H_n = sum 1/k records
    with Var = H_n - H_n^(2) (records theory), so a record count far
    above H_n is growth evidence that needs NO distributional
    assumptions at all (the trend-test family's assumption-free
    extreme member, beside mann_kendall's rank pairs).

    Exactness: records compare exact integer cents against a prefix max
    on the calendar-bounded daily frame (the one global window every
    bounded-frame op uses); the harmonic sums fold as pico-rounded 1/k
    terms in decimal(38,12) — identical grids both engines; z is one
    float expression.

    Scale: one reduce to the daily frame; the window and folds never
    leave it.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_rank = Window.orderBy("day")
    staged = daily.select(
        "day",
        "xc",
        (F.col("xc") > F.coalesce(F.max("xc").over(w_prev), F.lit(-1)))
        .cast("long")
        .alias("is_record"),
        F.row_number().over(w_rank).alias("k"),
    )
    agg = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_record").alias("n_records"),
        F.sum(
            F.round(F.lit(1.0) / F.col("k"), 12).cast("decimal(38,12)")
        ).alias("h1"),
        F.sum(
            F.round(
                F.lit(1.0) / (F.col("k").cast("double") * F.col("k")), 12
            ).cast("decimal(38,12)")
        ).alias("h2"),
    )
    e = F.col("h1").cast("double")
    var = e - F.col("h2").cast("double")
    z = (F.col("n_records").cast("double") - e) / F.sqrt(var)
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("n_records").cast("long").alias("n_records"),
        F.round(e, 4).alias("expected_records"),
        F.round(z, 4).alias("z_stat"),
        F.when(z > 1.96, F.lit("more-records-than-stationary"))
        .when(z < -1.96, F.lit("fewer-records-than-stationary"))
        .otherwise(F.lit("consistent-with-stationary"))
        .alias("verdict"),
    )


ORACLES["record_highs_test"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1
    ),
    staged AS (
        SELECT day, xc,
               CASE WHEN xc > coalesce(max(xc) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS is_record,
               row_number() OVER (ORDER BY day) AS k
        FROM daily
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(is_record) AS BIGINT) AS n_records,
               sum(CAST(round(1.0 / k, 12) AS DECIMAL(38,12))) AS h1,
               sum(CAST(round(1.0 / (CAST(k AS DOUBLE) * k), 12)
                        AS DECIMAL(38,12))) AS h2
        FROM staged
    )
    SELECT n AS n_days, n_records,
           round(CAST(h1 AS DOUBLE), 4) AS expected_records,
           round((n_records - CAST(h1 AS DOUBLE))
                 / sqrt(CAST(h1 AS DOUBLE) - CAST(h2 AS DOUBLE)), 4)
               AS z_stat,
           CASE WHEN (n_records - CAST(h1 AS DOUBLE))
                     / sqrt(CAST(h1 AS DOUBLE) - CAST(h2 AS DOUBLE)) > 1.96
                THEN 'more-records-than-stationary'
                WHEN (n_records - CAST(h1 AS DOUBLE))
                     / sqrt(CAST(h1 AS DOUBLE) - CAST(h2 AS DOUBLE)) < -1.96
                THEN 'fewer-records-than-stationary'
                ELSE 'consistent-with-stationary' END AS verdict
    FROM agg
"""
QUERIES["record_highs_test"] = record_highs_test
