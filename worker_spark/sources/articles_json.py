"""S2 landing path — raw article JSON -> the typed ARTICLE_DATA schema,
with the one genuinely polymorphic field handled via VariantType.

Upstream, ``body.dialect[].subcats[].forms[].form`` is either a bare
string or ``{"content": ...}`` (/root/reference/src/extraction.rs:392-395:
``f.as_str().or_else(|| f.get("content")...)``). A fixed StructType cannot
express that union, so the ingest schema types the field as VARIANT and
normalization dispatches on ``schema_of_variant``:

* STRING variant           -> the string itself
* OBJECT with content      -> its ``content`` string
* anything else            -> NULL (the reference yields None)

Everything else in the payload is schema-stable and parses PERMISSIVE-ly
straight into the typed shape (missing fields -> NULL, matching the
reference's defensive accessors). The output matches
worker_spark.schemas.ARTICLE_DATA exactly (``form`` carries the
normalized text, ``form_content`` is NULL — the extraction layer
coalesces the two, so typed-parquet and raw-JSON inputs behave
identically).
"""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from worker_spark.schemas import ARTICLE_DATA


def _ingest_schema() -> T.StructType:
    """ARTICLE_DATA with dialect ``form`` widened to VARIANT and the
    normalized-only ``form_content`` dropped."""
    schema: T.StructType = copy.deepcopy(ARTICLE_DATA)
    body = schema["body"].dataType
    dialect_t = body["dialect"].dataType.elementType  # DIALECT struct
    subcat_t = dialect_t["subcats"].dataType.elementType
    form_t: T.StructType = subcat_t["forms"].dataType.elementType
    new_form = T.StructType(
        [
            T.StructField("form", T.VariantType()),
            T.StructField("sources", form_t["sources"].dataType),
        ]
    )
    subcat_t.fields[
        [f.name for f in subcat_t.fields].index("forms")
    ] = T.StructField("forms", T.ArrayType(new_form))
    return schema


_NORMALIZE_DIALECT = """
transform(parsed.body.dialect, d -> named_struct(
  'subcats', transform(d.subcats, sc -> named_struct(
    'forms', transform(sc.forms, f -> named_struct(
      'form', CASE WHEN schema_of_variant(f.form) = 'STRING'
                   THEN try_variant_get(f.form, '$', 'string')
                   ELSE try_variant_get(f.form, '$.content', 'string') END,
      'form_content', CAST(NULL AS STRING),
      'sources', f.sources))))))
"""


def parse_articles_json(
    raw: DataFrame, json_col: str = "data_json"
) -> DataFrame:
    """Replace ``json_col`` (raw article JSON string) with a typed ``data``
    column conforming to ARTICLE_DATA."""
    parsed = raw.withColumn("parsed", F.from_json(F.col(json_col), _ingest_schema()))
    body_fields = []
    for f in ARTICLE_DATA["body"].dataType.fields:
        if f.name == "dialect":
            body_fields.append(F.expr(_NORMALIZE_DIALECT).alias("dialect"))
        else:
            body_fields.append(F.col(f"parsed.body.{f.name}").alias(f.name))
    data = F.when(
        F.col("parsed").isNotNull(),
        F.struct(
            F.col("parsed.lemmas").alias("lemmas"),
            F.col("parsed.suggest").alias("suggest"),
            F.col("parsed.updated").alias("updated"),
            F.when(F.col("parsed.body").isNotNull(), F.struct(*body_fields)).alias(
                "body"
            ),
        ),
    ).alias("data")
    return parsed.withColumn("data", data.cast(ARTICLE_DATA)).drop("parsed", json_col)
