"""Per-label embedding centroid/cohesion query over ``embeddings``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators.embstats import COS_SCALE, EMB_Q, label_centroid_stats
from worker_spark.queries import register
from worker_spark.sources import load_table


@register(
    "embedding_label_centroids",
    f"""
    WITH comps AS (
        SELECT vec_id AS vid, label, CAST(d AS BIGINT) - 1 AS d,
               CAST(floor(CAST(embedding[CAST(d AS INT)] AS DOUBLE) * {EMB_Q})
                    AS BIGINT) AS y
        FROM embeddings, UNNEST(range(1, 65)) t(d)
    ),
    sums AS (
        SELECT label, d, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM comps GROUP BY 1, 2
    ),
    pm AS (
        SELECT c.vid, c.label,
               CAST(sum(c.y * s.s) AS BIGINT) AS a,
               CAST(sum(c.y * c.y) AS BIGINT) AS b
        FROM comps c JOIN sums s ON s.label = c.label AND s.d = c.d
        GROUP BY 1, 2
    ),
    pl AS (
        SELECT label, CAST(sum(s * s) AS BIGINT) AS c,
               CAST(max(n) AS BIGINT) AS n_members
        FROM sums GROUP BY 1
    ),
    cosd AS (
        SELECT pm.label, pl.n_members, pl.c,
               CAST(floor(CAST(pm.a AS DOUBLE)
                          / sqrt(CAST(pm.b * pl.c AS DOUBLE))
                          * {COS_SCALE}) AS BIGINT) AS cos_micros
        FROM pm JOIN pl USING (label)
    )
    SELECT label, n_members,
           CAST(floor(sqrt(CAST(c AS DOUBLE)) / ({EMB_Q} * n_members)
                      * {COS_SCALE}) AS BIGINT) AS centroid_norm_micros,
           CAST(floor(CAST(sum(cos_micros) AS DOUBLE) / n_members)
                AS BIGINT) AS avg_cos_micros,
           CAST(min(cos_micros) AS BIGINT) AS min_cos_micros
    FROM cosd GROUP BY label, n_members, c
    """,
    doc="Per-class embedding centroids + cohesion: cosine of each member "
    "to its class centroid reduced to cos = A/sqrt(B*C) over exact "
    "BIGINT sums (order-free, partial-aggregatable — no float ever "
    "crosses an aggregation boundary), floored to integer micros. The "
    "class-level quality view (label noise / cluster tightness) of the "
    "embedding column the ANN family searches.",
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroid_stats(emb)
