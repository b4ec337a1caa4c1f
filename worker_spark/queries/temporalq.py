"""Temporal-join queries over ``events`` with DuckDB oracles: the as-of
join checked against DuckDB's native ASOF JOIN, and the binned range join
checked against a plain inequality join (exact at oracle scale; the
binned plan is the one that survives 100 TB — operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators.temporal import asof_join, range_join_binned
from worker_spark.queries import register
from worker_spark.sources import load_table


@register(
    "event_asof_attribution",
    """
    WITH clicks AS (
        SELECT user_id, event_id AS click_event_id, ts FROM events
        WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts,
               max(event_id) AS view_event_id,
               round(max(value), 2) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT c.user_id, c.click_event_id, v.view_event_id, v.view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    doc="As-of join: every click is attributed to the user's latest "
    "at-or-before view (NULL when none). Spark side is the single-shuffle "
    "union + carry-forward formulation; the oracle is DuckDB's native "
    "ASOF LEFT JOIN. Views are pre-deduped per (user, ts) so the match "
    "is well-defined in both engines.",
)
def q_event_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_event_id"), "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.round(F.max("value"), 2).alias("view_value"),
        )
    )
    return asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="ts",
        right_value_cols=["view_event_id", "view_value"],
    ).select("user_id", "click_event_id", "view_event_id", "view_value")


@register(
    "event_range_join",
    """
    WITH purchases AS (
        SELECT user_id, event_id AS purchase_id,
               ts - INTERVAL 30 MINUTES AS start_ts, ts AS end_ts
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, event_id AS click_id, ts FROM events
        WHERE event_type = 'click'
    )
    SELECT c.user_id, p.purchase_id, c.click_id
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.start_ts AND c.ts <= p.end_ts
    """,
    doc="Range (interval) join: clicks landing inside the 30-minute "
    "attribution window before each purchase of the same user. Spark side "
    "is the bin-explode equi-join (operators/temporal.py — no "
    "broadcast-nested-loop); the oracle is the direct inequality join.",
)
def q_event_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    return range_join_binned(
        clicks, purchases, key="user_id", point_ts="ts",
        start_col="start_ts", end_col="end_ts", bin_seconds=1800,
    ).select("user_id", "purchase_id", "click_id")
