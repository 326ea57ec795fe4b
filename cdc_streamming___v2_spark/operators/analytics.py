"""Event-analytics queries over the ``events`` change log: ordered-sequence
funnel and retention cohorts — the product-analytics tier a history table
exists to serve (the reference's BigQuery history tables feed exactly this
kind of query downstream).

Scale: both queries reduce events to per-user aggregates FIRST (shuffle at
user cardinality, with map-side partial aggregation), then operate on the
reduced frame — never a self-join of the raw log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

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


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
}

ORACLES = {
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
}
