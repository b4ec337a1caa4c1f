"""Per-label embedding centroid/cohesion stats."""

from __future__ import annotations

from worker_spark.operators.embstats import label_centroid_stats


def test_identical_members_have_unit_cohesion(spark):
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    mixed = [1.0, 1.0, 0.0, 0.0]
    rows = [(1, 0, e1), (2, 0, e1), (3, 1, e2), (4, 1, mixed)]
    df = spark.createDataFrame(
        rows, schema="vec_id: bigint, label: int, embedding: array<float>"
    )
    got = {r["label"]: r for r in label_centroid_stats(df).collect()}
    # identical members: cosine to centroid is exactly 1.0
    assert got[0]["avg_cos_micros"] == 1_000_000
    assert got[0]["min_cos_micros"] == 1_000_000
    assert got[0]["n_members"] == 2
    # mixed class: cohesion strictly below 1, above 0.5
    assert 500_000 < got[1]["avg_cos_micros"] < 1_000_000
