"""Generic relational operator inventory (SURVEY.md §2.2-§2.7) exercised on
the driver's TPC-H-ish tables, each with a DuckDB oracle.

The domain semantics each query re-expresses is cited as the SURVEY operator
id (J1, A6, ...) with the reference file:line in the docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from worker_spark.operators.diff import classify_list_db_diff
from worker_spark.operators.outbox_drain import drain_with_cap
from worker_spark.queries import register
from worker_spark.sources import load_table


# --------------------------------------------------------------------------
# q01 pricing summary — grouped multi-aggregate scan (A1/A3 analog, TPC-H Q1)
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                AS sum_qty,
           round(sum(l_extendedprice), 2)                           AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)        AS sum_disc_price,
           round(avg(l_quantity), 4)                                AS avg_qty,
           round(avg(l_extendedprice), 4)                           AS avg_price,
           count(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Wide grouped aggregation with filter pushdown (SURVEY A1/A3).",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 top revenue orders — 3-way join + agg + deterministic top-k (J4 shape)
# --------------------------------------------------------------------------
@register(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d')                      AS order_date,
           o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)    AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, order_date, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="Dim-filtered broadcast join chain + grouped agg + total-order top-k "
    "(SURVEY J4 enrichment-join shape; TPC-H Q3).",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q03 revenue by nation — snowflake join chain (J4/J5 broadcast dims)
# --------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*)                                              AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="Snowflake join with broadcast dimensions (SURVEY J4/J5; TPC-H Q5 shape).",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q04 semi-join counts (J12/J13 EXISTS shape)
# --------------------------------------------------------------------------
@register(
    "orders_with_returns",
    """
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    doc="Left-semi join (EXISTS) + grouped count (SURVEY J12 claim join / "
    "J13 existence checks).",
)
def q_orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# q05 anti-join (J2/J3 unfetched-entity discovery)
# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join — the reference's missing-entity discovery "
    "(SURVEY J2/J3, src/sync_service.rs:732-737, src/storage.rs:619-665).",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# q06 conditional status counts (A1 dashboard aggregates)
# --------------------------------------------------------------------------
@register(
    "status_counts",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending,
           count(*)                                    AS n_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="COUNT(*) FILTER dashboard aggregates (SURVEY A1, src/web.rs:638-693).",
)
def q_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.count(F.lit(1)).alias("n_total"),
    )


# --------------------------------------------------------------------------
# q07 global max cursors (A2 snapshot cursor computation)
# --------------------------------------------------------------------------
@register(
    "global_cursors",
    """
    SELECT strftime((SELECT max(o_orderdate) FROM orders),  '%Y-%m-%d %H:%M:%S') AS max_order_date,
           strftime((SELECT max(l_shipdate)  FROM lineitem),'%Y-%m-%d %H:%M:%S') AS max_ship_date,
           strftime(greatest((SELECT max(o_orderdate) FROM orders),
                             (SELECT max(l_shipdate) FROM lineitem)),
                    '%Y-%m-%d %H:%M:%S')                                         AS overall_cursor
    """,
    doc="Cross-table MAX cursor + greatest (SURVEY A2, src/snapshot.rs:412-438).",
)
def q_global_cursors(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").agg(F.max("o_orderdate").alias("mo"))
    li = load_table(spark, sf_dir, "lineitem").agg(F.max("l_shipdate").alias("ml"))
    return o.crossJoin(li).select(
        F.date_format("mo", "yyyy-MM-dd HH:mm:ss").alias("max_order_date"),
        F.date_format("ml", "yyyy-MM-dd HH:mm:ss").alias("max_ship_date"),
        F.date_format(F.greatest("mo", "ml"), "yyyy-MM-dd HH:mm:ss").alias(
            "overall_cursor"
        ),
    )


# --------------------------------------------------------------------------
# q08 grouping-to-sorted-list (A5, batch key grouping)
# --------------------------------------------------------------------------
@register(
    "orders_per_customer_list",
    """
    SELECT o_custkey,
           string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS order_keys,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    doc="groupBy -> sorted id list (SURVEY A5, src/indexing.rs:48-51).",
)
def q_orders_per_customer_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("o_orderkey")), lambda x: x.cast("string")),
            ",",
        ).alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# q09 document-order string concat (A6 — order-sensitive aggregation)
# --------------------------------------------------------------------------
@register(
    "event_journey",
    """
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY event_id) AS journey,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    doc="Order-sensitive text concatenation — the reference's document-order "
    "etymology/definition text join (SURVEY A6, src/meili.rs:214-248). "
    "Order survives the shuffle by sorting (pos, value) structs inside the "
    "aggregation, the §7.5-2 pattern.",
)
def q_event_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("journey"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# q10 boolean OR aggregation (A7 has_split_inf)
# --------------------------------------------------------------------------
@register(
    "customer_any_return",
    """
    SELECT o.o_custkey,
           bool_or(l.l_returnflag = 'R') AS any_return,
           count(*)                      AS n_items
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
    doc="bool_or across group (SURVEY A7, has_split_inf |= ..., "
    "src/extraction.rs:209-212).",
)
def q_customer_any_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.bool_or(F.col("l_returnflag") == "R").alias("any_return"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q11 outbox drain running-sum cap (A8/T3)
# --------------------------------------------------------------------------
@register(
    "outbox_drain_cap",
    """
    WITH outbox AS (
        SELECT event_id AS id, (event_id % 7) + 1 AS n_keys
        FROM events WHERE event_type = 'click'
    ), ranked AS (
        SELECT id, n_keys,
               sum(n_keys) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_keys,
               row_number() OVER (ORDER BY id) AS drain_rank
        FROM outbox
    )
    SELECT id, n_keys, CAST(running_keys AS BIGINT) AS running_keys
    FROM ranked
    WHERE running_keys - n_keys < 5000 OR drain_rank = 1
    """,
    doc="Budgeted FIFO drain with running-sum cap (SURVEY A8/T3, "
    "migrations/20260526010803...sql:19-44, src/outbox.rs:128-133).",
)
def q_outbox_drain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    outbox = e.select(
        F.col("event_id").alias("id"), ((F.col("event_id") % 7) + 1).alias("n_keys")
    )
    return drain_with_cap(outbox, size_col="n_keys", id_col="id", target=5000).select(
        "id", "n_keys", F.col("running_keys").cast("long").alias("running_keys")
    )


# --------------------------------------------------------------------------
# q12 top-k per group (O-topk window)
# --------------------------------------------------------------------------
@register(
    "top3_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, rnk FROM (
        SELECT c.c_mktsegment, o.o_orderkey,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rnk <= 3
    """,
    doc="Top-K per group via ranked window with total-order tie-break.",
)
def q_top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "rnk")
    )


# --------------------------------------------------------------------------
# q13 union + distinct (O5)
# --------------------------------------------------------------------------
@register(
    "active_entity_keys",
    """
    SELECT DISTINCT k FROM (
        SELECT o_custkey AS k FROM orders
        UNION ALL
        SELECT user_id  AS k FROM events
    )
    """,
    doc="UNION + DISTINCT set op (SURVEY O5, dialect ∪ attestation ids).",
)
def q_active_entity_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return o.unionAll(e).distinct()


# --------------------------------------------------------------------------
# q14 full-outer diff classification (J1 — the sync heart)
# --------------------------------------------------------------------------
_DIFF_ORACLE = """
    WITH list AS (
        SELECT o_orderkey AS article_id,
               o_orderkey % 5 AS revision,
               strftime(o_orderdate, '%Y-%m-%d') AS updated_at
        FROM orders WHERE o_orderkey % 97 <> 0
    ), db AS (
        SELECT o_orderkey AS article_id,
               CASE WHEN o_orderkey % 11 = 0 THEN -1 ELSE o_orderkey % 5 END AS revision,
               strftime(o_orderdate, '%Y-%m-%d') AS updated_at,
               CASE WHEN o_orderkey % 13 = 0 THEN 'pending_fetch' ELSE 'idle' END AS sync_status
        FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT coalesce(l.article_id, d.article_id) AS article_id,
           CASE
             WHEN d.article_id IS NULL THEN 'new'
             WHEN l.article_id IS NOT NULL AND l.revision = d.revision
                  AND l.updated_at = d.updated_at THEN 'unchanged'
             WHEN l.article_id IS NOT NULL AND d.sync_status = 'idle' THEN 'changed'
             WHEN l.article_id IS NOT NULL THEN 'skip_inflight'
             WHEN d.sync_status = 'idle' THEN 'missing_recheck'
             ELSE 'missing_inflight'
           END AS classification,
           l.revision AS list_revision,
           d.revision AS db_revision
    FROM list l FULL OUTER JOIN db d USING (article_id)
"""


@register(
    "sync_diff_classify",
    _DIFF_ORACLE,
    doc="J1 list-vs-DB full-outer diff classification — the heart of "
    "incremental sync (src/sync_service.rs:104-163). List/db sides are "
    "derived deterministically from orders to simulate new / changed / "
    "in-flight / deleted rows.",
)
def q_sync_diff_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    lst = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("article_id"),
        (F.col("o_orderkey") % 5).alias("revision"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("updated_at"),
    )
    db = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("article_id"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(-1))
        .otherwise(F.col("o_orderkey") % 5)
        .alias("revision"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("updated_at"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("pending_fetch"))
        .otherwise(F.lit("idle"))
        .alias("sync_status"),
    )
    return classify_list_db_diff(lst, db)


# --------------------------------------------------------------------------
# q15 key compose/parse round-trip (F6/P8)
# --------------------------------------------------------------------------
@register(
    "key_roundtrip",
    """
    WITH keys AS (
        SELECT o_orderstatus || ':' || o_orderkey::VARCHAR AS job_key FROM orders
    ), parsed AS (
        SELECT string_split(job_key, ':')[1] AS dict,
               TRY_CAST(string_split(job_key, ':')[2] AS BIGINT) AS id
        FROM keys
    )
    SELECT dict, count(*) AS n, min(id) AS min_id, max(id) AS max_id
    FROM parsed WHERE id IS NOT NULL
    GROUP BY dict
    """,
    doc="'{dict}:{id}' compose + parse + drop-unparseable (SURVEY F6/P8, "
    "src/storage.rs:708, src/sync_service.rs:271-279).",
)
def q_key_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(
        F.concat_ws(":", F.col("o_orderstatus"), F.col("o_orderkey").cast("string")).alias(
            "job_key"
        )
    )
    parsed = keys.select(
        F.split(F.col("job_key"), ":").getItem(0).alias("dict"),
        F.try_element_at(F.split(F.col("job_key"), ":"), F.lit(2)).cast("long").alias("id"),
    )
    return (
        parsed.filter(F.col("id").isNotNull())
        .groupBy("dict")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )


# --------------------------------------------------------------------------
# q16 positional-array projection with defaults (P1/S1 article-list parse)
# --------------------------------------------------------------------------
@register(
    "positional_list_parse",
    """
    WITH raw AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 < 3
                    THEN [o_orderkey::VARCHAR]
                    ELSE [o_orderkey::VARCHAR, o_orderpriority, (o_orderkey % 5)::VARCHAR]
               END AS arr
        FROM orders
    )
    SELECT TRY_CAST(arr[1] AS BIGINT)                AS article_id,
           coalesce(arr[2], '')                      AS primary_lemma,
           coalesce(TRY_CAST(arr[3] AS BIGINT), 0)   AS revision
    FROM raw
    """,
    doc="Positional JSON-array row parse with defaulted optional tail "
    "(SURVEY P1/S1, src/extraction.rs:160-181).",
)
def q_positional_list_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    full = F.array(
        F.col("o_orderkey").cast("string"),
        F.col("o_orderpriority"),
        (F.col("o_orderkey") % 5).cast("string"),
    )
    raw = o.select(
        F.when(F.col("o_orderkey") % 10 < 3, F.slice(full, 1, 1)).otherwise(full).alias("arr")
    )
    return raw.select(
        F.try_element_at(F.col("arr"), F.lit(1)).cast("long").alias("article_id"),
        F.coalesce(F.try_element_at(F.col("arr"), F.lit(2)), F.lit("")).alias("primary_lemma"),
        F.coalesce(F.try_element_at(F.col("arr"), F.lit(3)).cast("long"), F.lit(0)).alias(
            "revision"
        ),
    )


# --------------------------------------------------------------------------
# q17 staleness window filter (P4 sweep predicates)
# --------------------------------------------------------------------------
@register(
    "recent_event_stats",
    """
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
    GROUP BY event_type
    """,
    doc="Interval staleness predicate relative to data max (SURVEY P4, "
    "now()-'24 hours' at src/storage.rs:84-85) — deterministic via max(ts).",
)
def q_recent_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("max_ts"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# --------------------------------------------------------------------------
# q18 first-id-wins code resolution (J8)
# --------------------------------------------------------------------------
@register(
    "code_first_id_wins",
    """
    SELECT o_orderpriority AS code,
           min(o_orderkey) AS resolved_id,
           count(*)        AS n_claims
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Inline-code -> first-id-wins resolution (SURVEY J8, "
    "src/storage.rs:461-477: ORDER BY id LIMIT-1 per code == min).",
)
def q_code_first_id_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("code")).agg(
        F.min("o_orderkey").alias("resolved_id"), F.count(F.lit(1)).alias("n_claims")
    )


# --------------------------------------------------------------------------
# q19 display-name coalesce + 'M'-suffix candidates (F3/F7/J9)
# --------------------------------------------------------------------------
@register(
    "name_fallback_resolution",
    """
    WITH codes AS (
        SELECT DISTINCT c_name AS code FROM customer WHERE c_custkey % 3 = 0
    ), cands AS (
        SELECT code, code AS cand, 1 AS prio FROM codes
        UNION ALL
        SELECT code, substr(code, 1, length(code) - 1) AS cand, 2 AS prio
        FROM codes WHERE code LIKE '%M'
    ), hits AS (
        SELECT c.code, c.prio, min(cu.c_custkey) AS place_id
        FROM cands c JOIN customer cu ON cu.c_name = c.cand
        GROUP BY c.code, c.prio
    ), best AS (
        SELECT code, place_id,
               row_number() OVER (PARTITION BY code ORDER BY prio, place_id) AS rn
        FROM hits
    )
    SELECT code, place_id FROM best WHERE rn = 1
    """,
    doc="J9 'M'-suffix-stripped name fallback with exact-match priority "
    "(src/storage.rs:479-517): candidates [code, rtrim_M(code)] -> join on "
    "name -> prefer exact over stripped.",
)
def q_name_fallback_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    codes = cu.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_name").alias("code")
    ).distinct()
    exact = codes.select("code", F.col("code").alias("cand"), F.lit(1).alias("prio"))
    stripped = codes.filter(F.col("code").endswith("M")).select(
        "code",
        F.expr("substring(code, 1, length(code) - 1)").alias("cand"),
        F.lit(2).alias("prio"),
    )
    cands = exact.unionAll(stripped)
    hits = (
        cands.join(cu, cands.cand == cu.c_name)
        .groupBy("code", "prio")
        .agg(F.min("c_custkey").alias("place_id"))
    )
    w = Window.partitionBy("code").orderBy("prio", "place_id")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("code", "place_id")
    )


# --------------------------------------------------------------------------
# q20 sessionization — gap-based session windows over the event stream
# --------------------------------------------------------------------------
@register(
    "event_sessions",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTES
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), numbered AS (
        SELECT user_id, event_id, ts, value,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           round(sum(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Sessionization: gap>30min session assignment via lag + running sum "
    "(batch analog of session_window) — standard behavioral-data segmentation.",
)
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# --------------------------------------------------------------------------
# q21 rollup — hierarchical totals (A1 grand-total re-sum, done by the engine)
# --------------------------------------------------------------------------
@register(
    "order_rollup",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy: per (priority, status), per priority, and grand "
    "total in one pass — the reference re-sums dashboard columns in Rust "
    "(src/web.rs:672-693); the engine's grouping sets do it natively.",
)
def q_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------------
# q22 SQL-API formulation — min-cost supplier per part (decorrelation)
# --------------------------------------------------------------------------


@register(
    "cheapest_supplier_per_part",
    """
    WITH best AS (
        SELECT l_partkey, min_by(l_suppkey, l_extendedprice ORDER BY l_extendedprice, l_suppkey) AS best_supp
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand,
           b.best_supp AS cheapest_suppkey,
           round(s.s_acctbal, 2) AS supp_acctbal
    FROM part p
    JOIN best b ON b.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = b.best_supp
    WHERE p.p_size <= 15
    """,
    doc="Min-by-per-group supplier selection (TPC-H Q2 shape) expressed "
    "through the SQL API over registered temp views — demonstrates the "
    "SQL surface produces the same Catalyst plans as the DataFrame API.",
)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.registry import register_views

    register_views(spark, sf_dir, "part", "lineitem", "supplier")
    # deterministic min_by tie-break: pre-rank in SQL
    return spark.sql(
        """
        WITH best AS (
            SELECT l_partkey, l_suppkey AS best_supp FROM (
                SELECT l_partkey, l_suppkey,
                       row_number() OVER (PARTITION BY l_partkey
                                          ORDER BY l_extendedprice, l_suppkey) AS rn
                FROM lineitem
            ) WHERE rn = 1
        )
        SELECT p.p_partkey, p.p_brand,
               b.best_supp AS cheapest_suppkey,
               round(s.s_acctbal, 2) AS supp_acctbal
        FROM part p
        JOIN best b ON b.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = b.best_supp
        WHERE p.p_size <= 15
        """
    )


@register(
    "event_funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
          AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
          AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY 1
    ),
    counts AS (
        SELECT (SELECT count(DISTINCT user_id) FROM events
                WHERE user_id IS NOT NULL) AS n0,
               (SELECT count(*) FROM v) AS n1,
               (SELECT count(*) FROM c) AS n2,
               (SELECT count(*) FROM p) AS n3
    )
    SELECT CAST(step AS INT) AS step, step_name,
           CAST(users AS BIGINT) AS users,
           CASE WHEN prev > 0
                THEN CAST(users AS DOUBLE) / CAST(prev AS DOUBLE) END
               AS conv_from_prev,
           CASE WHEN n0 > 0
                THEN CAST(users AS DOUBLE) / CAST(n0 AS DOUBLE) END
               AS conv_from_start
    FROM counts, (VALUES (1), (2), (3)) s(step),
    LATERAL (
        SELECT CASE step WHEN 1 THEN 'view' WHEN 2 THEN 'click'
                         ELSE 'purchase' END AS step_name,
               CASE step WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS users,
               CASE step WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END AS prev
    ) x
    """,
    doc="Windowed ordered-funnel conversion (view -> click -> purchase, "
    "strict event-time order, each step within 24h of the previous): per "
    "step, users who reached it after completing the previous step "
    "inside the conversion window, with step-over-step and from-start "
    "rates. Sequential dependency as a 3-stage min-timestamp join chain "
    "(each stage joins the previous stage's tiny per-user frame, never "
    "re-sorting events); the 3 output rows come from ONE pass via a "
    "struct explode. Rates are bare single-op divisions of exact counts "
    "(cross-engine stable); zero denominators yield NULL identically.",
)
def q_event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        ev.agg(F.countDistinct("user_id").alias("n0"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n1")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n3")))
    )
    steps = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step"),
                        F.lit(name).alias("step_name"),
                        F.col(u).alias("users"),
                        F.col(prev).alias("prev"),
                        F.col("n0").alias("start"),
                    )
                    for i, name, u, prev in [
                        (1, "view", "n1", "n0"),
                        (2, "click", "n2", "n1"),
                        (3, "purchase", "n3", "n2"),
                    ]
                ]
            )
        ).alias("s")
    ).select("s.*")
    conv = lambda a, b: F.when(  # noqa: E731
        F.col(b) > 0, F.col(a).cast("double") / F.col(b).cast("double")
    )
    return steps.select(
        "step",
        "step_name",
        F.col("users").cast("long").alias("users"),
        conv("users", "prev").alias("conv_from_prev"),
        conv("users", "start").alias("conv_from_start"),
    )


@register(
    "event_retention_cohorts",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        FROM events WHERE user_id IS NOT NULL
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM firsts GROUP BY 1
    ),
    joined AS (
        SELECT f.cohort_week,
               CAST(floor((epoch(a.week) - epoch(f.cohort_week)) / 604800)
                    AS INT) AS week_offset,
               count(DISTINCT a.user_id) AS active_users
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    )
    SELECT strftime(j.cohort_week, '%Y-%m-%d') AS cohort_week,
           j.week_offset,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(j.active_users AS BIGINT) AS active_users,
           CASE WHEN s.cohort_size > 0
                THEN CAST(j.active_users AS DOUBLE)
                     / CAST(s.cohort_size AS DOUBLE) END AS retention
    FROM joined j JOIN sizes s USING (cohort_week)
    """,
    doc="Weekly cohort retention matrix: users grouped by first-event "
    "week, per (cohort, week-offset) distinct active users and the "
    "retention rate. Two map-side-combinable aggregations + one join on "
    "the per-user firsts frame; week arithmetic is exact epoch-seconds "
    "integer division and the rate is a bare exact-count division, so "
    "both engines agree bit-for-bit. Cohort week emitted as a formatted "
    "date string (engine-neutral timestamps, per the registry "
    "conventions).",
)
def q_event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts")
    )
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                (
                    F.unix_timestamp("week")
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    return (
        joined.join(sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("active_users").cast("long").alias("active_users"),
            F.when(
                F.col("cohort_size") > 0,
                F.col("active_users").cast("double")
                / F.col("cohort_size").cast("double"),
            ).alias("retention"),
        )
    )


@register(
    "event_rate_anomalies",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS events
        FROM events GROUP BY 1, 2
    ),
    trailed AS (
        SELECT event_type, day, events,
               CAST(count(*) OVER w AS BIGINT) AS trail_n,
               CAST(sum(events) OVER w AS BIGINT) AS trail_sum,
               CAST(sum(events * events) OVER w AS BIGINT) AS trail_sumsq
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, events,
           trail_sum,
           ((events * 7 - trail_sum) * (events * 7 - trail_sum)) * 6
               > 4 * 7 * (7 * trail_sumsq - trail_sum * trail_sum)
               AS is_anomaly
    FROM trailed WHERE trail_n = 7
    """,
    doc="Event-rate anomaly flags: per (event_type, day), is the day's "
    "count more than 2 trailing standard deviations from the 7-day "
    "trailing mean? The z-score test is cross-multiplied into PURE "
    "INTEGER arithmetic — (x*n - S)^2 * (n-1) > 4 * n * (n*Q - S^2) "
    "with S/Q the trailing sum and sum-of-squares — so no division, "
    "sqrt, or float appears anywhere and both engines agree "
    "bit-for-bit (the monitoring twin of the reference's dashboard "
    "counters, src/web.rs stats). One map-side daily rollup + one "
    "bounded window; days without a full 7-day history are omitted.",
)
def q_event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).alias("events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trailed = daily.select(
        "event_type",
        "day",
        "events",
        F.count(F.lit(1)).over(w).alias("trail_n"),
        F.sum("events").over(w).alias("trail_sum"),
        F.sum(F.col("events") * F.col("events")).over(w).alias("trail_sumsq"),
    )
    x, s, q = F.col("events"), F.col("trail_sum"), F.col("trail_sumsq")
    return trailed.filter(F.col("trail_n") == 7).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "events",
        "trail_sum",
        (
            ((x * 7 - s) * (x * 7 - s)) * 6 > 4 * 7 * (q * 7 - s * s)
        ).alias("is_anomaly"),
    )
