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
    (one array per line). Defaults: lemma '' / revision 0 / updated ''."""
    arr = F.from_json(F.col(json_col), "array<string>")
    # try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast on
    # a malformed element would abort the job instead of dropping the row
    parsed = raw.select(
        F.col(dictionary_col).alias("dictionary"),
        F.try_element_at(arr, F.lit(1)).try_cast("long").alias("article_id"),
        F.coalesce(F.try_element_at(arr, F.lit(2)), F.lit("")).alias("primary_lemma"),
        F.coalesce(F.try_element_at(arr, F.lit(3)).try_cast("long"), F.lit(0)).alias(
            "revision"
        ),
        F.coalesce(F.try_element_at(arr, F.lit(4)), F.lit("")).alias("updated_at"),
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
