"""Sketch queries: HLL / KMV distinct estimation over ``events``,
Count-Min heavy hitters over ``documents`` tokens.

Spark side: worker_spark.operators.sketches (md5-prefix hashed,
integer-exact register/cell arithmetic, map-side-combinable aggregates).
Oracle side: the identical construction in DuckDB — registers, harmonic
integer sums, grid cells, and the single deterministic double
multiply/divide per estimate are all bit-identical, so even the
"approximate" outputs hash-check across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators import sketches as K
from worker_spark.operators.text import tokens
from worker_spark.queries import register
from worker_spark.sources import load_table

_M, _WB = K.HLL_M, K.HLL_WBITS
_EST_NUM = repr(K.HLL_ALPHA * K.HLL_M * K.HLL_M * (1 << (_WB + 1)))
_KK, _HS = K.KMV_K, repr(K.HASH_SPACE)
_D, _W = K.CMS_DEPTH, K.CMS_WIDTH

_H32 = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)"
_BITLEN = K.bitlen_sql(f"(h // {_M})", _WB)


@register(
    "hll_distinct_users",
    f"""
    WITH vals AS (
        SELECT event_type, {_H32} AS h FROM events
    ),
    ranked AS (
        SELECT event_type, h % {_M} AS bucket,
               CAST({_WB + 1} - {_BITLEN} AS INT) AS rho
        FROM vals
    ),
    sparse AS (
        SELECT event_type, bucket, max(rho) AS max_rho
        FROM ranked GROUP BY 1, 2
    ),
    dense AS (
        SELECT g.event_type, b.bucket, coalesce(s.max_rho, 0) AS max_rho
        FROM (SELECT DISTINCT event_type FROM events) g
        CROSS JOIN (SELECT CAST(r AS BIGINT) AS bucket
                    FROM UNNEST(range({_M})) t(r)) b
        LEFT JOIN sparse s
               ON s.event_type = g.event_type AND s.bucket = b.bucket
    ),
    sk AS (
        SELECT event_type,
               CAST(sum(CAST(1 AS BIGINT) << (27 - max_rho)) AS BIGINT)
                   AS s_int,
               CAST(sum(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_buckets
        FROM dense GROUP BY 1
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY 1
    )
    SELECT sk.event_type,
           round({_EST_NUM} / CAST(s_int AS DOUBLE), 3) AS hll_estimate,
           ex.exact_distinct,
           sk.n_zero_buckets,
           round(abs({_EST_NUM} / CAST(s_int AS DOUBLE)
                     - exact_distinct) / CAST(exact_distinct AS DOUBLE), 4)
               AS rel_error
    FROM sk JOIN ex USING (event_type)
    """,
    doc=f"HyperLogLog distinct users per event type (m={_M} registers, "
    "Flajolet'07): registers are max-mergeable (map-side combine — the "
    "shuffle carries <= m rows/partition at any scale); the harmonic sum "
    "is an exact integer sum of powers of two, so the estimate is "
    "bit-identical across engines. Exact distinct + rel_error beside it "
    "as the small-SF audit.",
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return K.hll_distinct(ev, "user_id", "event_type")


@register(
    "kmv_distinct_users",
    f"""
    WITH h AS (
        -- mirror the Spark side's NULL handling (sketches.kmv_distinct
        -- filters NULL hashes): NULL user_ids contribute no hash, and an
        -- all-NULL group is omitted rather than emitted as a 0/NaN row
        SELECT DISTINCT event_type, {_H32} AS hv FROM events
        WHERE user_id IS NOT NULL
    ),
    r AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h
    ),
    b AS (
        SELECT event_type, max(hv) AS hk, CAST(count(*) AS BIGINT) AS n_kept
        FROM r WHERE rn <= {_KK} GROUP BY 1
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY 1
    )
    SELECT b.event_type,
           round(CASE WHEN n_kept < {_KK} THEN CAST(exact_distinct AS DOUBLE)
                      ELSE {float(_KK - 1)!r} * {_HS} / CAST(hk AS DOUBLE)
                 END, 3) AS kmv_estimate,
           ex.exact_distinct,
           round(abs(CASE WHEN n_kept < {_KK}
                          THEN CAST(exact_distinct AS DOUBLE)
                          ELSE {float(_KK - 1)!r} * {_HS}
                               / CAST(hk AS DOUBLE) END
                     - exact_distinct) / CAST(exact_distinct AS DOUBLE), 4)
               AS rel_error
    FROM b JOIN ex USING (event_type)
    """,
    doc=f"KMV / bottom-k distinct estimate (k={_KK}, Bar-Yossef'02): keep "
    "the k smallest distinct hashes per group; the k-th minimum scales to "
    "a distinct estimate. Merge = k smallest of a union (partial-agg "
    "friendly); deterministic hashes make it oracle-exact.",
)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return K.kmv_distinct(ev, "user_id", "event_type")


@register(
    "token_cms_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents WHERE length(trim(text)) > 0
    ),
    toks2 AS (SELECT token FROM toks WHERE length(token) > 0),
    placed AS (
        SELECT CAST(r AS BIGINT) AS row,
               CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token),
                                    1, 8)) AS BIGINT) % {_W} AS col
        FROM toks2, UNNEST(range({_D})) t(r)
    ),
    cells AS (
        SELECT row, col, CAST(count(*) AS BIGINT) AS cell_count
        FROM placed GROUP BY 1, 2
    ),
    top_tokens AS (
        SELECT token, CAST(count(*) AS BIGINT) AS true_count
        FROM toks2 GROUP BY 1
        ORDER BY true_count DESC, token ASC LIMIT 20
    ),
    probes AS (
        SELECT tt.token, tt.true_count, CAST(r AS BIGINT) AS row,
               CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                                        tt.token), 1, 8)) AS BIGINT) % {_W}
                   AS col
        FROM top_tokens tt, UNNEST(range({_D})) t(r)
    )
    SELECT p.token, p.true_count,
           min(c.cell_count) AS cms_estimate,
           min(c.cell_count) - p.true_count AS overestimate
    FROM probes p JOIN cells c ON c.row = p.row AND c.col = p.col
    GROUP BY p.token, p.true_count
    """,
    doc=f"Count-Min sketch ({_D}x{_W} grid, Cormode'05) over document "
    "tokens, audited on the true top-20: estimate = min over rows, never "
    "underestimates. Cells are plain sums (map-side combine — the grid "
    "is d*w rows per partition no matter the corpus size).",
)
def q_token_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.length("token") > 0)
    return K.cms_heavy_hitters(toks, "token", top_n=20)


_BW, _BPW, _BK = K.BLOOM_WORDS, K.BLOOM_BITS_PER_WORD, K.BLOOM_K
_BM = _BW * _BPW
_BSEEDS = "[" + ",".join(str(s) for s in range(_BK)) + "]"


def _bloom_pos_sql(key_expr: str) -> str:
    """Seeded md5-prefix bit position of ``key_expr`` for seed column s —
    identical to sketches._bloom_positions."""
    return (
        "(CAST(('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || "
        f"{key_expr}), 1, 8)) AS BIGINT) % {_BM})"
    )


@register(
    "bloom_membership_audit",
    f"""
    WITH cpos AS (
        SELECT {_bloom_pos_sql("text")} AS bitpos
        FROM documents, UNNEST({_BSEEDS}) t(s)
    ),
    bloom AS (
        SELECT bitpos // {_BPW} AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(bitpos % {_BPW} AS INT))
                   AS bits
        FROM cpos GROUP BY 1
    ),
    probes AS (
        SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS probe_id,
               'member' AS kind, text AS key
        FROM documents
        UNION ALL
        SELECT 'absent:' || CAST(i AS VARCHAR), 'absent',
               'absent:' || CAST(i AS VARCHAR)
        FROM range(200) t(i)
    ),
    ppos AS (
        SELECT probe_id, kind,
               {_bloom_pos_sql("key")} AS bitpos
        FROM probes, UNNEST({_BSEEDS}) t(s)
    ),
    hits AS (
        SELECT p.probe_id, p.kind,
               (coalesce(b.bits, 0)
                & (CAST(1 AS BIGINT) << CAST(p.bitpos % {_BPW} AS INT)))
                   <> 0 AS hit
        FROM ppos p LEFT JOIN bloom b ON b.word = p.bitpos // {_BPW}
    )
    SELECT probe_id, kind, bool_and(hit) AS maybe_member
    FROM hits GROUP BY probe_id, kind
    """,
    doc=f"Bloom filter (Bloom, CACM 1970; {_BW}x{_BPW}-bit words, "
    f"k={_BK} seeded md5 hashes) built over document texts with a "
    "bit_or aggregation (map-side combinable — the shuffle carries at "
    "most the word count per partition), then audited: every member "
    "probe must hit (no false negatives by construction) and 200 absent "
    "probes measure the deterministic false-positive set. The membership "
    "pre-filter that makes incremental dedup affordable at corpus scale "
    "— probe the tiny broadcast filter first, pay the exact anti-join "
    "only for probable members.",
)
def q_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bloom = K.bloom_build(docs, "text")
    members = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias(
            "probe_id"
        ),
        F.lit("member").alias("kind"),
        F.col("text").alias("key"),
    )
    absent = spark.range(200).select(
        F.concat(F.lit("absent:"), F.col("id").cast("string")).alias(
            "probe_id"
        ),
        F.lit("absent").alias("kind"),
        F.concat(F.lit("absent:"), F.col("id").cast("string")).alias("key"),
    )
    probes = members.unionByName(absent)
    return K.bloom_probe(probes, bloom, "key", ["probe_id", "kind"])


@register(
    "bloom_incremental_dedup",
    f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
    ),
    batch AS (
        SELECT 'new:' || CAST(doc_id AS VARCHAR) AS probe_id, text
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT 'refetch:' || CAST(doc_id AS VARCHAR), text
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 9 = 0
    ),
    cpos AS (
        SELECT {_bloom_pos_sql("text")} AS bitpos
        FROM corpus, UNNEST({_BSEEDS}) t(s)
    ),
    bloom AS (
        SELECT bitpos // {_BPW} AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(bitpos % {_BPW} AS INT))
                   AS bits
        FROM cpos GROUP BY 1
    ),
    ppos AS (
        SELECT probe_id, {_bloom_pos_sql("text")} AS bitpos
        FROM batch, UNNEST({_BSEEDS}) t(s)
    ),
    probed AS (
        SELECT p.probe_id,
               bool_and((coalesce(b.bits, 0)
                   & (CAST(1 AS BIGINT) << CAST(p.bitpos % {_BPW} AS INT)))
                   <> 0) AS maybe_member
        FROM ppos p LEFT JOIN bloom b ON b.word = p.bitpos // {_BPW}
        GROUP BY p.probe_id
    ),
    ck AS (SELECT DISTINCT md5(text) AS kh FROM corpus),
    verdicts AS (
        SELECT pr.probe_id, pr.maybe_member,
               CASE WHEN pr.maybe_member
                    THEN (ck.kh IS NOT NULL) ELSE FALSE END AS exact_dup
        FROM probed pr
        JOIN batch ba USING (probe_id)
        LEFT JOIN ck ON pr.maybe_member AND ck.kh = md5(ba.text)
    )
    SELECT probe_id, maybe_member, exact_dup,
           CASE WHEN NOT maybe_member THEN 'new_skip_join'
                WHEN exact_dup THEN 'dup'
                ELSE 'false_positive' END AS verdict
    FROM verdicts
    """,
    doc="Bloom-ACCELERATED incremental dedup — the sketch composed into "
    "the pipeline it exists for: an incoming batch (novel docs + "
    "refetched corpus content) probes the corpus filter first; probes "
    "the filter rejects are verdicted new WITHOUT touching the exact "
    "join (at 100TB that skips the shuffle for the overwhelming "
    "majority of genuinely-new content), and only probable members pay "
    "the md5 equality check that separates true dups from bloom false "
    "positives.",
)
def q_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.concat(F.lit("new:"), F.col("doc_id").cast("string")).alias(
                "probe_id"
            ),
            F.col("text").alias("key"),
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 9 == 0)
            ).select(
                F.concat(
                    F.lit("refetch:"), F.col("doc_id").cast("string")
                ).alias("probe_id"),
                F.col("text").alias("key"),
            )
        )
    )
    bloom = K.bloom_build(corpus, "text")
    probed = K.bloom_probe(batch, bloom, "key", ["probe_id"])
    corpus_keys = corpus.select(F.md5("text").alias("kh")).distinct()
    maybe = (
        probed.filter(F.col("maybe_member"))
        .join(batch, "probe_id")
        .withColumn("kh", F.md5("key"))
        # corpus_keys is corpus-sized — never broadcast it; the probable-
        # member batch is the small side and AQE picks the right strategy
        .join(corpus_keys.withColumnRenamed("kh", "ck"),
              F.col("kh") == F.col("ck"), "left")
        .select(
            "probe_id",
            "maybe_member",
            F.col("ck").isNotNull().alias("exact_dup"),
        )
    )
    fresh = probed.filter(~F.col("maybe_member")).select(
        "probe_id", "maybe_member", F.lit(False).alias("exact_dup")
    )
    return maybe.unionByName(fresh).select(
        "probe_id",
        "maybe_member",
        "exact_dup",
        F.when(~F.col("maybe_member"), F.lit("new_skip_join"))
        .when(F.col("exact_dup"), F.lit("dup"))
        .otherwise(F.lit("false_positive"))
        .alias("verdict"),
    )


_QK = K.QSK_K


def _quantile_sketch_ctes(table: str, group: str, key: str, value: str) -> str:
    """The shared CTE chain (base sample → bottom-k → nearest-rank
    estimates) both quantile oracles compose: the audited batch row
    appends its exact rank-error pass, the maintained-index row
    (streaming_quantile_index) selects the estimate block verbatim —
    the same one-serving-math-for-both split as
    sketches.rank_estimates on the Spark side."""
    return f"""base AS (
        SELECT {group},
               CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hv,
               CAST({value} AS DOUBLE) AS v
        FROM {table}
        WHERE {value} IS NOT NULL AND NOT isnan(CAST({value} AS DOUBLE))
          AND {key} IS NOT NULL
    ),
    r AS (
        SELECT {group}, hv, v,
               row_number() OVER (PARTITION BY {group}
                                  ORDER BY hv, v) AS rn
        FROM base
    ),
    vs AS (
        SELECT {group}, v,
               row_number() OVER (PARTITION BY {group} ORDER BY v) AS vr,
               count(*) OVER (PARTITION BY {group}) AS m
        FROM r WHERE rn <= {{_QK}}
    ),
    est AS (
        SELECT {group},
               CAST(max(m) AS BIGINT) AS m,
               max(CASE WHEN vr = (m + 1) // 2 THEN v END) AS p50_est,
               max(CASE WHEN vr = (m * 9 + 9) // 10 THEN v END) AS p90_est,
               max(CASE WHEN vr = (m * 99 + 99) // 100 THEN v END) AS p99_est
        FROM vs GROUP BY 1
    )""".replace("{_QK}", str(_QK))


def quantile_sketch_est_oracle(
    table: str, group: str, key: str, value: str
) -> str:
    """The estimate block alone — the maintained quantile index's
    oracle: bottom-k is associative, so the streamed sample over the
    full history IS the batch sample, and the served estimates replay
    through the same CTE chain with no audit pass (the audit needs a
    corpus scan, which the maintained structure exists to avoid)."""
    ctes = _quantile_sketch_ctes(table, group, key, value)
    return f"""
    WITH {ctes}
    SELECT {group}, m, p50_est, p90_est, p99_est FROM est
    """


def quantile_sketch_oracle(
    table: str, group: str, key: str, value: str
) -> str:
    """DuckDB replay of sketches.quantile_sketch_audit over ``table``:
    bottom-k hash-rank sample per ``group`` (ORDER BY (hv, v) under
    row_number — the multiset bottom-k), nearest-rank estimates by
    integer ceiling division, exact rank-error audit. Parameterized so
    every profiling surface (events values, document lengths, ...) uses
    the identical construction."""
    ctes = _quantile_sketch_ctes(table, group, key, value)
    return f"""
    WITH {ctes},
    aud AS (
        SELECT b.{group},
               CAST(count(*) AS BIGINT) AS n,
               sum(CASE WHEN b.v <= e.p50_est THEN 1 ELSE 0 END) AS c50,
               sum(CASE WHEN b.v <= e.p90_est THEN 1 ELSE 0 END) AS c90,
               sum(CASE WHEN b.v <= e.p99_est THEN 1 ELSE 0 END) AS c99
        FROM base b JOIN est e USING ({group}) GROUP BY 1
    )
    SELECT e.{group}, a.n, e.m,
           e.p50_est,
           round(abs(CAST(c50 AS DOUBLE) / n - 0.5), 6) AS p50_rank_err,
           e.p90_est,
           round(abs(CAST(c90 AS DOUBLE) / n - 0.9), 6) AS p90_rank_err,
           e.p99_est,
           round(abs(CAST(c99 AS DOUBLE) / n - 0.99), 6) AS p99_rank_err
    FROM est e JOIN aud a USING ({group})
    """.replace("{_QK}", str(_QK))


@register(
    "event_quantile_sketch",
    quantile_sketch_oracle("events", "event_type", "event_id", "value"),
    doc=f"Deterministic mergeable quantile sketch (k={_QK} bottom-k rank "
    "sampling) per event type, with its own scale-safe accuracy audit: "
    "the 100 TB replacement for exact percentile() (VERDICT r4 item 2). "
    "The sketch is a pure function of the row set — hash-rank sampling "
    "instead of RNG or order-dependent KLL compaction — so Spark's "
    "two-level bounded aggregation and DuckDB's single-threaded window "
    "replay produce bit-identical samples, estimates, and rank errors. "
    "Groups with n <= k are exact; sampled groups carry their realized "
    "rank deviation beside each estimate.",
)
def q_event_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return K.quantile_sketch_audit(e, "value", "event_id", "event_type")


def _theta_overlap_ctes(base_sql: str, k: int) -> str:
    """The shared CTE chain (distinct hashes → bottom-k sketch → pair
    combine → kept-set counts) both theta oracles compose: the audited
    batch rows append the exact self-join pass, the maintained-index
    row (streaming_theta_overlap) prices the estimate columns from
    ``c`` alone — the same one-serving-math-for-both split as the
    quantile pair."""
    return f"""base AS ({base_sql}),
    h AS (
        SELECT DISTINCT g,
               CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hv
        FROM base
    ),
    r AS (
        SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
        FROM h
    ),
    sk AS (
        SELECT g, list(hv ORDER BY hv) AS arr, count(*) AS nk
        FROM r WHERE rn <= {k} GROUP BY g
    ),
    sk2 AS (
        SELECT g, arr,
               CASE WHEN nk >= {k} THEN CAST(arr[{k}] AS DOUBLE)
                    ELSE {_HS} END AS theta
        FROM sk
    ),
    p AS (
        SELECT a.g AS group_a, b.g AS group_b,
               least(a.theta, b.theta) AS th,
               list_filter(a.arr, x -> x < least(a.theta, b.theta)) AS ka,
               list_filter(b.arr, x -> x < least(a.theta, b.theta)) AS kb
        FROM sk2 a JOIN sk2 b ON a.g < b.g
    ),
    c AS (
        SELECT group_a, group_b, th,
               len(ka) AS na,
               len(list_intersect(ka, kb)) AS ni,
               len(list_distinct(list_concat(ka, kb))) AS nu
        FROM p
    )"""


_THETA_EST_COLS = f"""round(ni * ({_HS} / th), 3) AS inter_est,
           round(nu * ({_HS} / th), 3) AS union_est,
           round((na - ni) * ({_HS} / th), 3) AS diff_ab_est,
           round(CASE WHEN nu > 0 THEN CAST(ni AS DOUBLE) / nu
                      ELSE 0.0 END, 6) AS jaccard_est"""


def theta_overlap_est_oracle(base_sql: str, k: int = _KK) -> str:
    """The estimate block alone — the maintained theta index's oracle:
    a distinct bottom-k hash sketch is associative under inserts, so
    the streamed sketch over the full history IS the batch sketch, and
    the served pair estimates replay through the same CTE chain with no
    audit pass (the exact self-join needs the raw corpus, which the
    maintained structure exists to avoid)."""
    ctes = _theta_overlap_ctes(base_sql, k)
    return f"""
    WITH {ctes}
    SELECT group_a, group_b,
           {_THETA_EST_COLS}
    FROM c
    """


def theta_overlap_oracle(base_sql: str, k: int = _KK) -> str:
    """DuckDB mirror of sketches.theta_set_ops over a (g, v) base CTE
    (``base_sql`` must yield non-NULL ``v``). Same bottom-k sketch per
    group, same theta = min rule, same kept-hash estimators, and the
    same exact-audit self-join — shared by every registered overlap
    surface so the estimator logic lives in exactly one SQL body."""
    ctes = _theta_overlap_ctes(base_sql, k)
    return f"""
    WITH {ctes},
    dv AS (SELECT DISTINCT g, v FROM base),
    en AS (SELECT g, count(*) AS n FROM dv GROUP BY g),
    ei AS (
        SELECT x.g AS group_a, y.g AS group_b, count(*) AS exact_inter
        FROM dv x JOIN dv y ON x.v = y.v AND x.g < y.g
        GROUP BY 1, 2
    ),
    ex AS (
        SELECT na.g AS group_a, nb.g AS group_b,
               COALESCE(ei.exact_inter, 0) AS exact_inter,
               na.n + nb.n - COALESCE(ei.exact_inter, 0) AS exact_union
        FROM en na JOIN en nb ON na.g < nb.g
        LEFT JOIN ei ON ei.group_a = na.g AND ei.group_b = nb.g
    )
    SELECT c.group_a, c.group_b,
           {_THETA_EST_COLS},
           exact_inter, exact_union,
           round(CASE WHEN exact_inter > 0
                      THEN abs(round(ni * ({_HS} / th), 3) - exact_inter)
                           / CAST(exact_inter AS DOUBLE) END, 4)
               AS inter_rel_err,
           round(CASE WHEN exact_union > 0
                      THEN abs(round(nu * ({_HS} / th), 3) - exact_union)
                           / CAST(exact_union AS DOUBLE) END, 4)
               AS union_rel_err
    FROM c JOIN ex
      ON c.group_a = ex.group_a AND c.group_b = ex.group_b
    """


@register(
    "event_audience_overlap",
    theta_overlap_oracle(
        "SELECT event_type AS g, user_id AS v FROM events "
        "WHERE user_id IS NOT NULL"
    ),
    doc=f"Theta-sketch set operations (k={_KK}): pairwise audience "
    "intersection / union / difference / Jaccard estimates between event "
    "types from bottom-k hash sketches alone — the segment-overlap "
    "question answered without a distinct-join over the raw data. "
    "theta = min(theta_a, theta_b); kept hashes below theta scale by "
    "2^32/theta (exact when both sketches are under-full). Audit "
    "columns (exact_inter/union + rel errors) are the sf-scale "
    "verification surface; at 100 TB run audit=False.",
)
def q_event_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return K.theta_set_ops(ev, "user_id", "event_type")


@register(
    "lang_shingle_overlap",
    theta_overlap_oracle(
        """
        SELECT d.lang AS g, s.shingle AS v FROM (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents) toks,
                 UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
        ) s JOIN documents d USING (doc_id)
        """,
        k=256,
    ),
    doc="Theta-sketch shingle overlap (k=256) between document "
    "languages: word-3-gram set intersection / union / difference / "
    "Jaccard per language pair from bottom-k sketches — the cross-corpus "
    "contamination/similarity signal read before mixing sources, without "
    "materializing any shingle set. Unlike the audience surface (whose "
    "synthetic users fully overlap), per-language shingle sets overlap "
    "only partially, so this exercises the theta < hash-space estimator "
    "path with non-trivial Jaccard; shares dedup.word_shingles with the "
    "n-gram dedup family and the oracle body with theta_overlap_oracle.",
)
def q_lang_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    sh = D.word_shingles(docs)
    by_lang = sh.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    ).select("lang", "shingle")
    return K.theta_set_ops(by_lang, "shingle", "lang", k=256)
