"""Transliteration-normalized dedup: accent/orthography variants of the
same content must pair under the normalized shingles while plain shingling
misses them."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.dedup import (
    ngram_jaccard_pairs,
    translit_normalize,
)


def test_accent_variants_pair_only_after_normalization(spark):
    accented = (
        "på vänern drakk vi øl fra ærø hver dag mens vi så på måkene "
        "über die schöne brücke går vi hjem"
    )
    folded = (
        "pa vanern drakk vi ol fra aero hver dag mens vi sa pa makene "
        "uber die schone brucke gar vi hjem"
    )
    # 'ærø' folds to 'aro' (single-char translate), not 'aero' — make the
    # ASCII variant literal-faithful to the fold for a clean equality
    folded = folded.replace("aero", "aro")
    docs = spark.createDataFrame(
        [(1, accented), (2, folded), (3, "completely unrelated text about trains")],
        schema="doc_id: bigint, text: string",
    )

    raw_pairs = ngram_jaccard_pairs(docs, threshold=0.2, shingle_df_cap=None)
    assert raw_pairs.count() == 0  # plain shingles: no match

    norm = docs.select(
        "doc_id", translit_normalize(F.col("text")).alias("text")
    )
    norm_pairs = ngram_jaccard_pairs(norm, threshold=0.2, shingle_df_cap=None)
    got = [(r["id_a"], r["id_b"], r["jaccard"]) for r in norm_pairs.collect()]
    assert len(got) == 1
    assert got[0][0] == 1 and got[0][1] == 2
    assert got[0][2] == 1.0  # identical after folding


def test_normalization_is_idempotent_and_ascii(spark):
    df = spark.createDataFrame(
        [(1, "Œuvre: ÆØÅ äöü ß — 42 œufs!")], schema="doc_id: bigint, text: string"
    )
    once = df.select(translit_normalize(F.col("text")).alias("t"))
    row = once.select(
        "t", translit_normalize(F.col("t")).alias("t2")
    ).first()
    assert row["t"] == row["t2"]  # idempotent
    assert all(c.islower() or c.isdigit() or c == " " for c in row["t"])
