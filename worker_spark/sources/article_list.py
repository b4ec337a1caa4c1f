"""S1/S3-S5 — upstream JSON sources.

* S1 article list: a JSON array of positional rows
  ``[article_id, lemma?, revision?, updated_at?]`` with optional tails
  (/root/reference/src/uib_client.rs:189-198; parse
  src/extraction.rs:160-181). Rows whose first element is not an integer
  are dropped (parse_article_list_entry returns None).
* S4 bibliography lookup responses are arrays — take the first element
  (src/uib_client.rs:236-258).
* S5 place responses arrive enveloped as ``{ "<id>": entry }`` — unwrap
  the single key (src/uib_client.rs:261-307).

All parsing is Catalyst expressions over ``from_json`` — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_article_list(raw: DataFrame, json_col: str = "value", dictionary_col: str = "dictionary") -> DataFrame:
    """Parse positional list rows from a DataFrame of JSON-line strings
    (one array per line). Defaults: lemma '' / revision 0 / updated ''.

    JSON-type parity with parse_article_list_entry (src/extraction.rs:
    160-181): the row is parsed as VARIANT and each field is gated on its
    actual JSON type, because try_variant_get COERCES across types.
    article_id must be a JSON integer ("123" / 1.5 -> row dropped, like
    as_i64); revision must be a JSON integer else 0 ("7" -> 0, not 7);
    lemma/updated_at must be JSON strings else '' (like as_str)."""
    v = F.try_parse_json(F.col(json_col))

    def el(i: int) -> Column:
        return F.try_variant_get(v, f"$[{i}]", "variant")

    def as_i64(c: Column) -> Column:
        return F.when(F.schema_of_variant(c) == "BIGINT", F.try_variant_get(c, "$", "long"))

    def as_str(c: Column) -> Column:
        return F.when(F.schema_of_variant(c) == "STRING", F.try_variant_get(c, "$", "string"))

    parsed = raw.select(
        F.col(dictionary_col).alias("dictionary"),
        as_i64(el(0)).alias("article_id"),
        F.coalesce(as_str(el(1)), F.lit("")).alias("primary_lemma"),
        F.coalesce(as_i64(el(2)), F.lit(0)).alias("revision"),
        F.coalesce(as_str(el(3)), F.lit("")).alias("updated_at"),
    )
    return parsed.filter(F.col("article_id").isNotNull())


def read_article_list_json(
    spark: SparkSession, path: str, dictionary: str
) -> DataFrame:
    """Read a landed article-list file (JSON array-of-arrays, one row per
    line after jq-style splitting, or a single-line array)."""
    raw = spark.read.text(path).withColumn("dictionary", F.lit(dictionary))
    # a single-document file: explode the outer array first
    outer = raw.select(
        "dictionary", F.explode(F.from_json(F.col("value"), "array<string>")).alias("row")
    )
    return parse_article_list(outer.withColumnRenamed("row", "value"), "value")


def first_of_array(col: Column) -> Column:
    """S4: lookup endpoints return arrays; the reference takes .first()."""
    return F.try_element_at(col, F.lit(1))


def unwrap_single_key_envelope(col: Column) -> Column:
    """S5: ``{ "<id>": entry }`` -> entry (map_values[0])."""
    return F.try_element_at(F.map_values(col), F.lit(1))
