"""Time-series resampling / symbolization / forecast-audit tier (DRIVER
surface).

Completes the series toolkit around holt_forecast / acf_daily_revenue /
stl_lite_decompose / lttb_downsample:

- ``ohlc_bars``: candlestick resampling of the event value stream — per
  (event_type, day): open / high / low / close / volume / vwap.  Open and
  close come from a (ts, event_id)-ordered window WITHIN the (type, day)
  partition (a key-partitioned window, scale-safe); high/low/volume/vwap
  are plain aggregates.  VWAP divides exact integer cents.
- ``sax_symbols``: Symbolic Aggregate approXimation of the daily revenue
  series per event type — PAA over fixed 5-day segments of the exact
  integer-cent daily sums, z-scored against per-type segment moments
  (exact integer sums, one sqrt), then mapped to a 4-letter alphabet at
  the standard Gaussian quartile breakpoints (-0.6745, 0, 0.6745).  The
  z-score is rounded to 6 decimals BEFORE the breakpoint comparison so
  the symbol can never flip on last-ulp noise.
- ``seasonal_naive_mase``: forecast-quality audit — the Mean Absolute
  Scaled Error of the weekly seasonal-naive forecast (x[d-7]) against the
  one-step naive baseline (x[d-1]) on the daily revenue series.  Both
  error sums are exact integer cents; MASE is one final division.

Scale: all three reduce events to the (type, day) or day grid first;
windows then run on observation-window-bounded frames (the
theil_sen_trend / kaplan_meier bound), except ohlc's intraday window
which is partitioned by its (type, day) grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks of ``events.value`` per event type."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        "value",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    withoc = e.withColumn("open_v", F.first("value").over(w)).withColumn(
        "close_v", F.last("value").over(w)
    )
    return (
        withoc.groupBy("event_type", "day")
        .agg(
            F.min("open_v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min("close_v").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
            F.sum("cents").alias("sc"),
        )
        .select(
            "event_type",
            "day",
            "open",
            "high",
            "low",
            "close",
            "volume",
            # exact half-up rounding of the rational sc/(100*volume) to 4
            # decimals via integer arithmetic (the readability_scores
            # boundary-proof pattern): micro = floor((200*sc + v) / (2*v))
            (
                F.floor(
                    (F.lit(200) * F.col("sc") + F.col("volume"))
                    / (F.lit(2) * F.col("volume"))
                ).cast("double")
                / F.lit(10000.0)
            ).alias("vwap"),
        )
    )


ORACLES["ohlc_bars"] = """
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    oc AS (
        SELECT *,
               first_value(value) OVER w AS open_v,
               last_value(value) OVER w AS close_v
        FROM e
        WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           min(open_v) AS open, max(value) AS high, min(value) AS low,
           min(close_v) AS close,
           CAST(count(*) AS BIGINT) AS volume,
           CAST((200 * sum(cents) + count(*)) // (2 * count(*))
                AS DOUBLE) / 10000.0 AS vwap
    FROM oc GROUP BY 1, 2
"""
QUERIES["ohlc_bars"] = ohlc_bars


SAX_SEG_DAYS = 5
# standard Gaussian quartile breakpoints for a 4-symbol alphabet
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)


def sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of the per-type daily revenue series (PAA over
    5-day segments, z-scored per type, 4-letter alphabet)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    day0 = daily.agg(F.min("day").alias("d0"))
    seg = (
        daily.crossJoin(F.broadcast(day0))
        .withColumn(
            "seg",
            (F.datediff(F.col("day"), F.col("d0")) / SAX_SEG_DAYS).cast("int"),
        )
        .groupBy("event_type", "seg")
        .agg(F.sum("cents").alias("sc"))
    )
    stats = seg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("sc").alias("s1"),
        F.sum(F.col("sc") * F.col("sc")).alias("s2"),
    )
    j = seg.join(F.broadcast(stats), "event_type")
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    # sample variance from exact integer sums: (s2 - s1^2/k) / (k - 1)
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / kd
    ) / (kd - 1)
    z = F.round((F.col("sc").cast("double") - mean) / F.sqrt(var), 6)
    sym = (
        F.when(z < _SAX_BREAKS[0], F.lit("a"))
        .when(z < _SAX_BREAKS[1], F.lit("b"))
        .when(z < _SAX_BREAKS[2], F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return j.select(
        "event_type",
        F.col("seg").cast("int").alias("segment"),
        F.round(F.col("sc").cast("double") / 100.0, 2).alias("seg_revenue"),
        F.round(z, 4).alias("z"),
        sym.alias("symbol"),
    )


ORACLES["sax_symbols"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    day0 AS (SELECT min(day) AS d0 FROM daily),
    seg AS (
        SELECT event_type,
               CAST(date_diff('day', d0, day) // {SAX_SEG_DAYS} AS INT)
                 AS seg,
               sum(cents) AS sc
        FROM daily, day0 GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, count(*) AS k, sum(sc) AS s1,
               sum(sc * sc) AS s2
        FROM seg GROUP BY 1
    ),
    z AS (
        SELECT seg.event_type, seg.seg, seg.sc,
               round((CAST(sc AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
                     / sqrt((CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / k)
                            / (k - 1)), 6) AS zv
        FROM seg JOIN stats ON seg.event_type = stats.event_type
    )
    SELECT event_type, CAST(seg AS INT) AS segment,
           round(CAST(sc AS DOUBLE) / 100.0, 2) AS seg_revenue,
           round(zv, 4) AS z,
           CASE WHEN zv < {_SAX_BREAKS[0]} THEN 'a'
                WHEN zv < {_SAX_BREAKS[1]} THEN 'b'
                WHEN zv < {_SAX_BREAKS[2]} THEN 'c'
                ELSE 'd' END AS symbol
    FROM z
"""
QUERIES["sax_symbols"] = sax_symbols


SEASON_LAG = 7


def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the weekly seasonal-naive forecast vs the one-step naive
    baseline on daily total revenue."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.withColumn("l1", F.lag("cents", 1).over(w)).withColumn(
        "l7", F.lag("cents", SEASON_LAG).over(w)
    )
    scored = lagged.filter(F.col("l7").isNotNull())
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.sum(F.abs(F.col("cents") - F.col("l7"))).alias("e7"),
        F.sum(F.abs(F.col("cents") - F.col("l1"))).alias("e1"),
    )
    nd = F.col("n_days_scored").cast("double")
    return agg.select(
        "n_days_scored",
        F.round(F.col("e7").cast("double") / (100.0 * nd), 2).alias(
            "mae_seasonal"
        ),
        F.round(F.col("e1").cast("double") / (100.0 * nd), 2).alias("mae_naive"),
        F.round(F.col("e7").cast("double") / F.col("e1").cast("double"), 4).alias(
            "mase"
        ),
    )


ORACLES["seasonal_naive_mase"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT cents,
               lag(cents, 1) OVER (ORDER BY day) AS l1,
               lag(cents, {SEASON_LAG}) OVER (ORDER BY day) AS l7
        FROM daily
    ),
    agg AS (
        SELECT count(*) AS n, sum(abs(cents - l7)) AS e7,
               sum(abs(cents - l1)) AS e1
        FROM lagged WHERE l7 IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_days_scored,
           round(CAST(e7 AS DOUBLE) / (100.0 * n), 2) AS mae_seasonal,
           round(CAST(e1 AS DOUBLE) / (100.0 * n), 2) AS mae_naive,
           round(CAST(e7 AS DOUBLE) / CAST(e1 AS DOUBLE), 4) AS mase
    FROM agg
"""
QUERIES["seasonal_naive_mase"] = seasonal_naive_mase


HURST_SIZES = (5, 10, 15)


def hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily revenue series by rescaled-range (R/S)
    analysis: for each window size n in HURST_SIZES, the series splits
    into full n-day segments, each scored R/S = (max-min of the
    mean-adjusted cumulative deviation) / population std; the log-log
    slope of mean R/S against n is H — the long-memory diagnostic
    (H ~ 0.5 random walk, > 0.5 trending, < 0.5 mean-reverting).

    Exactness: segment sums and sums-of-squares are exact integer cents;
    means/std/cumdev are single scalar expressions over them; the
    cross-segment mean and the 3-point log-log OLS fold with ORDER-PINNED
    cumulative sums.  Every frame is bounded by the observation window.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    wd = Window.orderBy("day")
    # indexed is consumed twice (segstat + the cumdev window), but a
    # localCheckpoint cut measured SLOWER solo (r11: 0.966 -> 1.219 s
    # min-of-3, stable canaries): ReusedExchange already dedupes the
    # identical daily-aggregate + rank subtree within the one job.  Lazy.
    indexed = daily.withColumn("idx", F.row_number().over(wd) - 1)
    sizes = spark.createDataFrame(
        [(n,) for n in HURST_SIZES], "n int"
    )
    j = (
        indexed.crossJoin(F.broadcast(sizes))
        .withColumn("seg", F.floor(F.col("idx") / F.col("n")).cast("long"))
        .withColumn("pos", (F.col("idx") % F.col("n") + 1).cast("long"))
    )
    segstat = j.groupBy("n", "seg").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    wseg = Window.partitionBy("n", "seg").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = j.withColumn("cum", F.sum("x").over(wseg))
    dev = cum.join(segstat, ["n", "seg"]).filter(
        F.col("cnt") == F.col("n")
    ).withColumn(
        "cumdev",
        F.col("cum").cast("double")
        - F.col("pos").cast("double") * F.col("sx").cast("double")
        / F.col("n").cast("double"),
    )
    rs = (
        dev.groupBy("n", "seg")
        .agg(
            F.max("cumdev").alias("mx"),
            F.min("cumdev").alias("mn"),
            F.first("sx").alias("sx"),
            F.first("sxx").alias("sxx"),
        )
        .withColumn(
            "s_std",
            F.sqrt(
                (
                    F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                    / F.col("n").cast("double")
                )
                / F.col("n").cast("double")
            ),
        )
        .filter(F.col("s_std") > 0)
        .withColumn("rs", (F.col("mx") - F.col("mn")) / F.col("s_std"))
    )
    wn = Window.partitionBy("n").orderBy("seg").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per_n_f = (
        rs.withColumn("k", F.count(F.lit(1)).over(wn))
        .withColumn("srs", F.sum("rs").over(wn))
    )
    wlast = Window.partitionBy("n").orderBy(F.col("k").desc())
    per_n = (
        per_n_f.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select(
            "n",
            (F.col("srs") / F.col("k").cast("double")).alias("avg_rs"),
            F.col("k").cast("int").alias("n_segments"),
        )
        .filter(F.col("avg_rs") > 0)
        .withColumn("lx", F.log(F.col("n").cast("double")))
        .withColumn("ly", F.log("avg_rs"))
    )
    wf = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    folded = (
        per_n.withColumn("m", F.count(F.lit(1)).over(wf))
        .withColumn("slx", F.sum("lx").over(wf))
        .withColumn("sly", F.sum("ly").over(wf))
        .withColumn("slxy", F.sum(F.col("lx") * F.col("ly")).over(wf))
        .withColumn("slxx", F.sum(F.col("lx") * F.col("lx")).over(wf))
    )
    last = folded.orderBy(F.col("m").desc()).limit(1)
    md = F.col("m").cast("double")
    h = (md * F.col("slxy") - F.col("slx") * F.col("sly")) / (
        md * F.col("slxx") - F.col("slx") * F.col("slx")
    )
    return last.select(
        F.col("m").cast("int").alias("n_sizes"),
        F.round(h, 4).alias("hurst_h"),
        F.when(h > 0.55, F.lit("trending"))
        .when(h < 0.45, F.lit("mean-reverting"))
        .otherwise(F.lit("random-walk"))
        .alias("regime"),
    )


ORACLES["hurst_exponent"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS x
        FROM events GROUP BY 1
    ),
    indexed AS (
        SELECT x, row_number() OVER (ORDER BY day) - 1 AS idx FROM daily
    ),
    sizes AS (SELECT unnest([{', '.join(str(n) for n in HURST_SIZES)}]) AS n),
    j AS (
        SELECT i.x, s.n, i.idx // s.n AS seg, i.idx % s.n + 1 AS pos
        FROM indexed i, sizes s
    ),
    segstat AS (
        SELECT n, seg, count(*) AS cnt, sum(x) AS sx, sum(x * x) AS sxx
        FROM j GROUP BY 1, 2
    ),
    cum AS (
        SELECT *, sum(x) OVER (PARTITION BY n, seg ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
        FROM j
    ),
    dev AS (
        SELECT c.n, c.seg, c.pos,
               CAST(c.cum AS DOUBLE)
                 - CAST(c.pos AS DOUBLE) * CAST(s.sx AS DOUBLE)
                   / CAST(c.n AS DOUBLE) AS cumdev,
               s.sx, s.sxx
        FROM cum c JOIN segstat s ON c.n = s.n AND c.seg = s.seg
        WHERE s.cnt = c.n
    ),
    rs AS (
        SELECT n, seg,
               (max(cumdev) - min(cumdev))
                 / sqrt((CAST(any_value(sxx) AS DOUBLE)
                         - CAST(any_value(sx) AS DOUBLE)
                           * CAST(any_value(sx) AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS rs
        FROM dev
        GROUP BY 1, 2
        HAVING sqrt((CAST(any_value(sxx) AS DOUBLE)
                     - CAST(any_value(sx) AS DOUBLE)
                       * CAST(any_value(sx) AS DOUBLE)
                       / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) > 0
    ),
    per_n_f AS (
        SELECT n,
               count(*) OVER wn AS k,
               sum(rs) OVER wn AS srs
        FROM rs
        WINDOW wn AS (PARTITION BY n ORDER BY seg
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    per_n AS (
        SELECT n, srs / k AS avg_rs, CAST(k AS INT) AS n_segments
        FROM (SELECT *, row_number() OVER (PARTITION BY n
                                           ORDER BY k DESC) AS rn
              FROM per_n_f)
        WHERE rn = 1 AND srs / k > 0
    ),
    lpts AS (
        SELECT n, ln(CAST(n AS DOUBLE)) AS lx, ln(avg_rs) AS ly FROM per_n
    ),
    folded AS (
        SELECT count(*) OVER wf AS m,
               sum(lx) OVER wf AS slx, sum(ly) OVER wf AS sly,
               sum(lx * ly) OVER wf AS slxy, sum(lx * lx) OVER wf AS slxx
        FROM lpts
        WINDOW wf AS (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    last AS (SELECT * FROM folded ORDER BY m DESC LIMIT 1)
    SELECT CAST(m AS INT) AS n_sizes,
           round((m * slxy - slx * sly) / (m * slxx - slx * slx), 4)
             AS hurst_h,
           CASE WHEN (m * slxy - slx * sly) / (m * slxx - slx * slx) > 0.55
                THEN 'trending'
                WHEN (m * slxy - slx * sly) / (m * slxx - slx * slx) < 0.45
                THEN 'mean-reverting'
                ELSE 'random-walk' END AS regime
    FROM last
"""
QUERIES["hurst_exponent"] = hurst_exponent


HAAR_LEVELS = 3


def haar_energy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet detail-energy decomposition of daily revenue:
    cascade HAAR_LEVELS times, at each level pairing consecutive samples
    (by dense day rank) into sum and difference; detail energy
    E_l = sum(diff^2) localizes variance by TIME SCALE (level 1 =
    day-to-day chop, level 3 = ~week-scale swings) — the multi-
    resolution companion of weekly_spectral_power's single frequency.

    Exactness: Haar sums/differences of integer cents are exact
    integers at every level (magnitudes double per level — far inside
    decimal(38,0)); incomplete tail pairs drop by an exact pair-count
    filter.  Reported per level: pair count, energy share of the total
    detail energy, and RMS detail amplitude in dollars — scale-free
    floats computed once from exact folds.

    Scale: the calendar-bounded daily frame; each level is one
    (rank div 2) aggregate on a frame that HALVES per level.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("x")
    )
    wn = Window.partitionBy().orderBy("day")
    # each cascade level feeds BOTH the level energy aggregate and the
    # next level's input (776-line un-cut plan), but per-level
    # localCheckpoint cuts measured SLOWER solo (r11: 0.789 -> 1.003 s
    # min-of-3, stable canaries): the duplicated subtrees are identical,
    # so ReusedExchange dedupes them at runtime and the 4 eager cuts only
    # serialized blocking round-trips.  Deliberately left lazy.
    cur = daily.select(
        (F.row_number().over(wn) - 1).alias("i"), F.col("x").alias("s")
    )
    energies = []
    for lvl in range(1, HAAR_LEVELS + 1):
        paired = (
            cur.groupBy((F.col("i") / 2).cast("long").alias("j"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.when(F.col("i") % 2 == 0, F.col("s")).otherwise(0)).alias("a"),
                F.sum(F.when(F.col("i") % 2 == 1, F.col("s")).otherwise(0)).alias("b"),
            )
            .filter(F.col("cnt") == 2)
        )
        lvl_agg = paired.agg(
            F.lit(lvl).alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                (F.col("a") - F.col("b")) * (F.col("a") - F.col("b"))
            ).alias("e"),
        )
        energies.append(lvl_agg)
        cur = paired.select(
            F.col("j").alias("i"), (F.col("a") + F.col("b")).alias("s")
        )
    lv = energies[0]
    for e in energies[1:]:
        lv = lv.unionByName(e)
    tot = lv.agg(F.sum("e").alias("te"))
    return (
        lv.crossJoin(F.broadcast(tot))
        .select(
            F.col("level").cast("int").alias("level"),
            "n_pairs",
            F.round(
                F.col("e").cast("double") / F.col("te").cast("double"), 6
            ).alias("energy_share"),
            F.round(
                F.sqrt(
                    F.col("e").cast("double") / F.col("n_pairs").cast("double")
                )
                / 100.0,
                2,
            ).alias("rms_detail_dollars"),
        )
        .orderBy("level")
    )


ORACLES["haar_energy_levels"] = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ),
    l0 AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS i, x AS s FROM daily
    ),
    p1 AS (
        SELECT i // 2 AS j, count(*) AS cnt,
               sum(CASE WHEN i % 2 = 0 THEN s ELSE 0 END) AS a,
               sum(CASE WHEN i % 2 = 1 THEN s ELSE 0 END) AS b
        FROM l0 GROUP BY 1 HAVING count(*) = 2
    ),
    l1 AS (SELECT j AS i, a + b AS s FROM p1),
    p2 AS (
        SELECT i // 2 AS j, count(*) AS cnt,
               sum(CASE WHEN i % 2 = 0 THEN s ELSE 0 END) AS a,
               sum(CASE WHEN i % 2 = 1 THEN s ELSE 0 END) AS b
        FROM l1 GROUP BY 1 HAVING count(*) = 2
    ),
    l2 AS (SELECT j AS i, a + b AS s FROM p2),
    p3 AS (
        SELECT i // 2 AS j, count(*) AS cnt,
               sum(CASE WHEN i % 2 = 0 THEN s ELSE 0 END) AS a,
               sum(CASE WHEN i % 2 = 1 THEN s ELSE 0 END) AS b
        FROM l2 GROUP BY 1 HAVING count(*) = 2
    ),
    lv AS (
        SELECT 1 AS level, CAST(count(*) AS BIGINT) AS n_pairs,
               sum((a - b) * (a - b)) AS e FROM p1
        UNION ALL
        SELECT 2, CAST(count(*) AS BIGINT), sum((a - b) * (a - b)) FROM p2
        UNION ALL
        SELECT 3, CAST(count(*) AS BIGINT), sum((a - b) * (a - b)) FROM p3
    ),
    tot AS (SELECT sum(e) AS te FROM lv)
    SELECT CAST(level AS INTEGER) AS level, n_pairs,
           round(CAST(e AS DOUBLE) / CAST(te AS DOUBLE), 6) AS energy_share,
           round(sqrt(CAST(e AS DOUBLE) / CAST(n_pairs AS DOUBLE)) / 100.0, 2)
               AS rms_detail_dollars
    FROM lv, tot
    ORDER BY level
"""
QUERIES["haar_energy_levels"] = haar_energy_levels


import math as _m3  # noqa: E402

THETA_ALPHA = 0.3
THETA_H = 7
# (1-alpha)^j literals for j = 0..119, Python-precomputed so NEITHER
# engine evaluates pow() in the fold (pow is not correctly-rounded and a
# 1-ulp divergence could land on a rounding boundary); terms beyond
# j = 119 round to zero on the micro grid at any revenue scale
_THETA_W = [(1.0 - THETA_ALPHA) ** j for j in range(120)]


def theta_method_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method daily-revenue forecast for horizons 1..THETA_H via
    the Hyndman-Billah equivalence: theta(0,2) = simple exponential
    smoothing with drift b/2, fc_h = SES + (b/2)(h - 1 + 1/alpha)
    (the (1-alpha)^n/alpha correction vanishes beyond the weight table).
    Sits beside holt_forecast (level+trend SES) and seasonal_naive_mase
    as the M3-winning baseline.

    SES evaluates CLOSED-FORM: level = alpha * sum_j (1-alpha)^j
    x_{n-j} — an exponentially-weighted sum, not a recursion — with the
    weights inlined as Python literals and each term micro-rounded
    before the decimal fold.  Weights below j=120 cover the level to
    <1e-6 relative at any corpus scale (the calendar always holds >120
    days); the OLS drift comes from exact decimal moments.

    Scale: calendar-bounded daily frame; the SES fold touches the 120
    most recent rows; horizons expand from a 7-row broadcast.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
    )
    wd = Window.partitionBy().orderBy(F.col("day").desc())
    recent = (
        daily.withColumn("j", F.row_number().over(wd) - 1)
        .filter(F.col("j") <= 119)
    )
    warr = F.array(*[F.lit(w) for w in _THETA_W])
    term = F.round(
        F.lit(THETA_ALPHA)
        * F.element_at(warr, F.col("j").cast("int") + 1)
        * F.col("xc").cast("double"),
        6,
    ).cast("decimal(38,6)")
    level = recent.agg(F.sum(term).alias("lv")).select(
        F.col("lv").cast("double").alias("level")
    )
    mom = daily.select(
        F.datediff(F.col("day"), F.lit("1995-01-01")).cast("long").alias("t"),
        "xc",
    ).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("t").cast("decimal(38,0)")).alias("st"),
        F.sum(F.col("xc").cast("decimal(38,0)")).alias("sx"),
        # factors cast BEFORE the multiply (int64 headroom at extreme SF)
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("xc").cast("decimal(38,0)")
        ).alias("stx"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t").cast("decimal(38,0)")
        ).alias("stt"),
        F.max(F.col("t")).alias("tmax"),
    )
    b = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")).cast(
        "double"
    ) / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    a = (F.col("sx").cast("double") - b * F.col("st").cast("double")) / F.col(
        "n"
    ).cast("double")
    fit = mom.select(
        b.alias("b"), a.alias("a"), F.col("tmax").cast("double").alias("tmax")
    )
    hs = spark.range(1, THETA_H + 1).select(F.col("id").cast("int").alias("h"))
    jj = hs.crossJoin(F.broadcast(level)).crossJoin(F.broadcast(fit))
    theta = F.col("level") + F.col("b") / 2.0 * (
        F.col("h") - 1.0 + 1.0 / THETA_ALPHA
    )
    trend = F.col("a") + F.col("b") * (F.col("tmax") + F.col("h"))
    return jj.select(
        "h",
        F.round(F.col("level") / 100.0, 2).alias("ses_level"),
        F.round(theta / 100.0, 2).alias("theta_forecast"),
        F.round(trend / 100.0, 2).alias("trend_forecast"),
    ).orderBy("h")


def _theta_oracle() -> str:
    wlist = ", ".join(repr(w) for w in _THETA_W)
    return f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders GROUP BY 1, 2
    ),
    recent AS (
        SELECT xc, row_number() OVER (ORDER BY day DESC) - 1 AS j FROM daily
        QUALIFY j <= 119
    ),
    lv AS (
        SELECT CAST(sum(CAST(round({THETA_ALPHA} * ([{wlist}])[j + 1]
                                    * CAST(xc AS DOUBLE), 6)
                             AS DECIMAL(38,6))) AS DOUBLE) AS level
        FROM recent
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(t) AS HUGEINT) AS st, CAST(sum(xc) AS HUGEINT) AS sx,
               CAST(sum(t * xc) AS HUGEINT) AS stx,
               CAST(sum(t * t) AS HUGEINT) AS stt,
               CAST(max(t) AS DOUBLE) AS tmax
        FROM daily
    ),
    fit AS (
        SELECT CAST(n * stx - st * sx AS DOUBLE)
                   / CAST(n * stt - st * st AS DOUBLE) AS b,
               (CAST(sx AS DOUBLE)
                - CAST(n * stx - st * sx AS DOUBLE)
                      / CAST(n * stt - st * st AS DOUBLE)
                      * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a,
               tmax
        FROM mom
    ),
    hs AS (SELECT unnest(range(1, {THETA_H + 1})) AS h)
    SELECT CAST(h AS INTEGER) AS h,
           round(level / 100.0, 2) AS ses_level,
           round((level + b / 2.0 * (h - 1.0 + 1.0 / {THETA_ALPHA}))
                 / 100.0, 2) AS theta_forecast,
           round((a + b * (tmax + h)) / 100.0, 2) AS trend_forecast
    FROM hs, lv, fit
    ORDER BY h
"""


ORACLES["theta_method_forecast"] = _theta_oracle()
QUERIES["theta_method_forecast"] = theta_method_forecast


CROSTON_ALPHA = 0.2
CROSTON_MOD = 97  # deterministic part sample
_CROSTON_W = [(1.0 - CROSTON_ALPHA) ** j for j in range(120)]


def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand on a deterministic part
    sample (partkey % CROSTON_MOD == 0): SES over the NON-ZERO demand
    sizes and SES over the inter-demand intervals, forecast rate =
    size / interval — the right estimator where eoq_reorder_policy's
    dense daily moments misread sparse demand as low demand.

    Both SES folds use the closed exponentially-weighted form with
    Python-literal weight tables (the theta convention) INCLUDING the
    (1-alpha)^(m-1) * first-value initialization term (demand chains are
    short, so the init genuinely matters here, unlike the daily series);
    each term micro-rounds before the per-part decimal fold.  Parts with
    fewer than 2 demand days are excluded (an interval SES needs one
    gap), deterministically.

    Scale: one lineitem reduce to the sampled (part x demand-day) frame;
    per-part ordered windows on chains bounded by the part's order
    count.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    dem = (
        li.filter(F.col("l_partkey") % CROSTON_MOD == 0)
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("z"))
    )
    wp = Window.partitionBy("pk").orderBy("day")
    wpd = Window.partitionBy("pk").orderBy(F.col("day").desc())
    base = (
        dem.withColumn("gap", F.datediff(F.col("day"), F.lag("day").over(wp)))
        .withColumn("jd", F.row_number().over(wpd) - 1)
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy("pk")))
        .filter(F.col("m") >= 2)
    )
    warr = F.array(*[F.lit(w) for w in _CROSTON_W])

    def wat(idx):  # weight table lookup, 0 beyond the table
        return F.when(
            idx <= 119, F.element_at(warr, idx.cast("int") + 1)
        ).otherwise(F.lit(0.0))

    # sizes: j = 0 (latest) .. m-1 (first); init term at j = m-1
    z_term = F.round(
        F.when(
            F.col("jd") < F.col("m") - 1,
            F.lit(CROSTON_ALPHA) * wat(F.col("jd")) * F.col("z").cast("double"),
        ).otherwise(wat(F.col("m") - 1) * F.col("z").cast("double")),
        6,
    ).cast("decimal(38,6)")
    # intervals: the m-1 gaps; gap row ranks jd = 0..m-2 (the first demand
    # day has gap NULL and jd = m-1); init term at jd = m-2
    g_term = F.round(
        F.when(
            F.col("jd") < F.col("m") - 2,
            F.lit(CROSTON_ALPHA) * wat(F.col("jd")) * F.col("gap").cast("double"),
        ).otherwise(wat(F.col("m") - 2) * F.col("gap").cast("double")),
        6,
    ).cast("decimal(38,6)")
    agg = base.groupBy("pk").agg(
        F.max("m").alias("m"),
        F.sum(z_term).alias("sz"),
        F.sum(F.when(F.col("gap").isNotNull(), g_term)).alias("sg"),
    )
    ses_z = F.col("sz").cast("double")
    ses_g = F.col("sg").cast("double")
    return agg.select(
        F.col("pk").cast("bigint").alias("partkey"),
        F.col("m").cast("long").alias("n_demands"),
        F.round(ses_z, 4).alias("ses_size"),
        F.round(ses_g, 4).alias("ses_interval_days"),
        F.round(ses_z / ses_g, 6).alias("croston_daily_rate"),
    ).orderBy("partkey")


def _croston_oracle() -> str:
    wlist = ", ".join(repr(w) for w in _CROSTON_W)

    def wat(idx):
        return f"(CASE WHEN {idx} <= 119 THEN ([{wlist}])[{idx} + 1] ELSE 0.0 END)"

    return f"""
    WITH dem AS (
        SELECT l_partkey AS pk, l_shipdate AS day,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS z
        FROM lineitem WHERE l_partkey % {CROSTON_MOD} = 0
        GROUP BY 1, 2
    ),
    base AS (
        SELECT pk, z,
               datediff('day', CAST(lag(day) OVER (PARTITION BY pk ORDER BY day)
                                    AS DATE), CAST(day AS DATE)) AS gap,
               row_number() OVER (PARTITION BY pk ORDER BY day DESC) - 1 AS jd,
               count(*) OVER (PARTITION BY pk) AS m
        FROM dem
        QUALIFY m >= 2
    ),
    terms AS (
        SELECT pk, m, gap,
               CAST(round(CASE WHEN jd < m - 1
                    THEN {CROSTON_ALPHA} * {wat('jd')} * CAST(z AS DOUBLE)
                    ELSE {wat('(m - 1)')} * CAST(z AS DOUBLE) END, 6)
                    AS DECIMAL(38,6)) AS z_term,
               CAST(round(CASE WHEN jd < m - 2
                    THEN {CROSTON_ALPHA} * {wat('jd')} * CAST(gap AS DOUBLE)
                    ELSE {wat('(m - 2)')} * CAST(gap AS DOUBLE) END, 6)
                    AS DECIMAL(38,6)) AS g_term
        FROM base
    ),
    agg AS (
        SELECT pk, max(m) AS m, sum(z_term) AS sz,
               sum(CASE WHEN gap IS NOT NULL THEN g_term END) AS sg
        FROM terms GROUP BY 1
    )
    SELECT CAST(pk AS BIGINT) AS partkey, CAST(m AS BIGINT) AS n_demands,
           round(CAST(sz AS DOUBLE), 4) AS ses_size,
           round(CAST(sg AS DOUBLE), 4) AS ses_interval_days,
           round(CAST(sz AS DOUBLE) / CAST(sg AS DOUBLE), 6)
               AS croston_daily_rate
    FROM agg
    ORDER BY partkey
"""


ORACLES["croston_intermittent_demand"] = _croston_oracle()
QUERIES["croston_intermittent_demand"] = croston_intermittent_demand


# --------------------------------------------------------------------------
# Holt-Winters additive seasonal forecast (closed-form weight tables)
# --------------------------------------------------------------------------

HW_ALPHA, HW_BETA, HW_GAMMA = 0.3, 0.05, 0.2
HW_T = 60  # months 1995-01 .. 1999-12, present at every SF (orders span
#            1995-01 .. 2001-08 with >= 1 order per month)
HW_H = 12  # one full season of forecasts


def _hw_weight_table() -> list[list[float]]:
    """Coefficient of each of the HW_T monthly totals in forecast h,
    obtained by running the (entirely LINEAR) additive Holt-Winters
    recursion on unit vectors in plain Python — the theta/croston
    closed-form pattern extended to the full 14-dimensional seasonal
    state.  Init: l = mean(year 1), b = (mean(year 2) - mean(year 1))/12,
    s_j = y_j - l for the 12 first-year months; recursion runs t=12..T-1;
    fc_h = l_T + h*b_T + s[month (T-1+h) mod 12]."""
    table: list[list[float]] = [[0.0] * HW_T for _ in range(HW_H)]
    for u in range(HW_T):
        y = [0.0] * HW_T
        y[u] = 1.0
        m1 = sum(y[:12]) / 12.0
        m2 = sum(y[12:24]) / 12.0
        lv = m1
        tr = (m2 - m1) / 12.0
        s = [y[j] - m1 for j in range(12)]
        for t in range(12, HW_T):
            prev_l = lv
            lv = HW_ALPHA * (y[t] - s[t % 12]) + (1.0 - HW_ALPHA) * (lv + tr)
            tr = HW_BETA * (lv - prev_l) + (1.0 - HW_BETA) * tr
            s[t % 12] = HW_GAMMA * (y[t] - lv) + (1.0 - HW_GAMMA) * s[t % 12]
        for h in range(1, HW_H + 1):
            table[h - 1][u] = lv + h * tr + s[(HW_T - 1 + h) % 12]
    return table


_HW_W = _hw_weight_table()


def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters forecast of monthly revenue for horizons
    1..12 — the SEASONAL completion of holt_forecast (level+trend) and
    theta_method_forecast (SES+drift), neither of which can carry the
    12-month cycle weekday_seasonal_index shows exists.

    The recursion never runs in either engine: additive HW is linear in
    the observations, so each forecast is a fixed weighted sum of the 60
    pinned monthly totals with the weights inlined as Python literals
    (_hw_weight_table) — both engines fold round(w*cents, 6) terms in
    decimal(38,6), so the result is hash-exact.

    Scale: one groupBy of orders onto the 60-month grid; the weighted
    fold runs on a 60 x 12 broadcast expansion.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    monthly = (
        o.withColumn(
            "t",
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1),
        )
        .filter((F.col("t") >= 0) & (F.col("t") < HW_T))
        .groupBy("t")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("xc")
        )
    )
    warr = F.array(
        *[F.array(*[F.lit(w) for w in row]) for row in _HW_W]
    )
    hs = spark.range(1, HW_H + 1).select(F.col("id").cast("int").alias("h"))
    expanded = monthly.crossJoin(F.broadcast(hs))
    term = F.round(
        F.element_at(F.element_at(warr, F.col("h")), F.col("t").cast("int") + 1)
        * F.col("xc").cast("double"),
        6,
    ).cast("decimal(38,6)")
    return (
        expanded.groupBy("h")
        .agg(F.sum(term).alias("fc"))
        .select(
            "h",
            F.round(F.col("fc").cast("double") / 100.0, 2).alias("hw_forecast"),
        )
        .orderBy("h")
    )


def _hw_oracle() -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(w) for w in row) + "]" for row in _HW_W
    )
    return f"""
    WITH monthly AS (
        SELECT (year(CAST(o_orderdate AS DATE)) - 1995) * 12
               + month(CAST(o_orderdate AS DATE)) - 1 AS t,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS xc
        FROM orders
        WHERE (year(CAST(o_orderdate AS DATE)) - 1995) * 12
              + month(CAST(o_orderdate AS DATE)) - 1 BETWEEN 0 AND {HW_T - 1}
        GROUP BY 1
    ),
    hs AS (SELECT unnest(range(1, {HW_H + 1})) AS h),
    terms AS (
        SELECT h,
               CAST(round([{rows}][h][t + 1] * CAST(xc AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS term
        FROM monthly, hs
    )
    SELECT CAST(h AS INTEGER) AS h,
           round(CAST(sum(term) AS DOUBLE) / 100.0, 2) AS hw_forecast
    FROM terms GROUP BY h ORDER BY h
"""


ORACLES["holt_winters_forecast"] = _hw_oracle()
QUERIES["holt_winters_forecast"] = holt_winters_forecast
