"""Per-class embedding analytics: centroids and cohesion.

Evaluating a labeled embedding space (cluster quality, label noise,
class drift) needs per-class centroids and each member's cosine to its
centroid. Naive float averaging is ORDER-DEPENDENT — sums change with
partitioning — so nothing would hash-check across engines. The algebra
here keeps every aggregate an integer:

With quantized components y_d = floor(x_d * Q) and per-class sums
S_d = sum(y_d), the cosine of member y to its class centroid c
(c_d = S_d / (Q n)) reduces to

    cos = A / sqrt(B * C),   A = sum_d y_d S_d,
                             B = sum_d y_d^2,  C = sum_d S_d^2

— A, B, C are exact BIGINT sums (order-free, partial-aggregatable),
and the one sqrt/divide is deterministic IEEE on exact inputs. Cosines
are then floored to integer micros, so per-class averages are integer
division. Everything shuffles on (label, dim) or (vec, label) slim
integer rows; no float ever crosses an aggregation boundary.

No reference counterpart file — LLM-pipeline extension (class-level
view of the embedding column the ANN family searches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB_Q = 64  # dyadic quantization (floor(x*64) exact in IEEE 754)
COS_SCALE = 1_000_000


def label_centroid_stats(
    vectors: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid norm and membership cohesion:
    ``(label, n_members, centroid_norm_micros, avg_cos_micros,
    min_cos_micros)`` — cosine of each member to its class centroid in
    integer micros (see module doc for the exact-integer reduction)."""
    comps = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("d", "_x"),
    ).select(
        "vid",
        "label",
        "d",
        F.floor(F.col("_x").cast("double") * EMB_Q).cast("long").alias("y"),
    )
    sums = comps.groupBy("label", "d").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    per_member = (
        comps.join(sums, ["label", "d"])
        .groupBy("vid", "label")
        .agg(
            F.sum(F.col("y") * F.col("s")).alias("a"),
            F.sum(F.col("y") * F.col("y")).alias("b"),
        )
    )
    per_label = sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("c"),
        F.max("n").alias("n_members"),
    )
    cosined = per_member.join(per_label, "label").select(
        "label",
        "n_members",
        "c",
        F.floor(
            F.col("a").cast("double")
            / F.sqrt((F.col("b") * F.col("c")).cast("double"))
            * COS_SCALE
        )
        .cast("long")
        .alias("cos_micros"),
    )
    # floor(double division) rather than integer div: Spark's `div`
    # truncates while DuckDB's `//` floors — they differ on negative
    # sums; floor-of-double is identical in both (exact integer inputs)
    return cosined.groupBy("label", "n_members", "c").agg(
        F.floor(
            F.sum("cos_micros").cast("double") / F.col("n_members")
        )
        .cast("long")
        .alias("avg_cos_micros"),
        F.min("cos_micros").alias("min_cos_micros"),
    ).select(
        "label",
        "n_members",
        F.floor(
            F.sqrt(F.col("c").cast("double"))
            / (F.lit(EMB_Q) * F.col("n_members"))
            * COS_SCALE
        )
        .cast("long")
        .alias("centroid_norm_micros"),
        "avg_cos_micros",
        "min_cos_micros",
    )
