"""StructTypes for every table in the engine (SURVEY.md §1, FIXTURES.md).

The article ``data`` payload is the reference's deeply-nested JSON
(/root/reference: schema inferred from src/extraction.rs and its inline test
fixtures — see SURVEY.md §1.3). ``sub_definitions`` recursion is unrolled to
``MAX_DEF_DEPTH`` levels, matching the fixtures' observed depth (<= 3) with a
guard (worker_spark.extraction.assert_depth_bound) for deeper input.

All fields nullable: upstream JSON is accessed defensively
(src/extraction.rs:161-194 — every accessor tolerates missing fields).
"""

from __future__ import annotations

from pyspark.sql import types as T

MAX_DEF_DEPTH = 4  # definitions + 3 levels of sub_definitions

ITEM = T.StructType(
    [
        T.StructField("type_", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("article_id", T.LongType()),
    ]
)

INFLECTION = T.StructType(
    [
        T.StructField("word_form", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)

PARADIGM = T.StructType(
    [
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("inflection", T.ArrayType(INFLECTION)),
    ]
)

LEMMA = T.StructType(
    [
        T.StructField("lemma", T.StringType()),
        T.StructField("hgno", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("split_inf", T.BooleanType()),
        T.StructField("paradigm_info", T.ArrayType(PARADIGM)),
    ]
)

ETYMOLOGY = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("items", T.ArrayType(ITEM)),
    ]
)

PRONUNCIATION = T.StructType([T.StructField("content", T.StringType())])

DIALECT_SOURCE = T.StructType(
    [
        T.StructField("place_id", T.LongType()),
        T.StructField("place_name", T.StringType()),
        T.StructField("show", T.LongType()),
    ]
)

# ``form`` is polymorphic upstream (bare string OR {content: string},
# src/extraction.rs:392-395). The typed schema carries both readings;
# the JSON ingest path fills form_content for the object shape and the
# extractors coalesce(form, form_content).
DIALECT_FORM = T.StructType(
    [
        T.StructField("form", T.StringType()),
        T.StructField("form_content", T.StringType()),
        T.StructField("sources", T.ArrayType(DIALECT_SOURCE)),
    ]
)

DIALECT = T.StructType(
    [
        T.StructField(
            "subcats",
            T.ArrayType(
                T.StructType([T.StructField("forms", T.ArrayType(DIALECT_FORM))])
            ),
        )
    ]
)

BIBL_SOURCE = T.StructType([T.StructField("bibl_id", T.LongType())])

WRITTEN_FORM = T.StructType(
    [
        T.StructField(
            "forms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("written_form", T.StringType()),
                        T.StructField("sources", T.ArrayType(BIBL_SOURCE)),
                    ]
                )
            ),
        )
    ]
)

PLACE_REF = T.StructType(
    [
        T.StructField("bibl_id", T.LongType()),
        T.StructField("vis", T.LongType()),
        T.StructField(
            "place", T.StructType([T.StructField("place_id", T.LongType())])
        ),
    ]
)

ELEMENT = T.StructType(
    [
        T.StructField("type_", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField(
            "quote",
            T.StructType(
                [
                    T.StructField("content", T.StringType()),
                    T.StructField("items", T.ArrayType(ITEM)),
                ]
            ),
        ),
        T.StructField("article_id", T.LongType()),
        T.StructField("lemmas", T.ArrayType(T.StringType())),
        T.StructField("place_refs", T.ArrayType(PLACE_REF)),
        T.StructField("items", T.ArrayType(ITEM)),
    ]
)


def _definition(depth: int) -> T.StructType:
    fields = [
        T.StructField("type_", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("elements", T.ArrayType(ELEMENT)),
    ]
    if depth > 1:
        fields.append(
            T.StructField("sub_definitions", T.ArrayType(_definition(depth - 1)))
        )
    return T.StructType(fields)


DEFINITION = _definition(MAX_DEF_DEPTH)

BODY = T.StructType(
    [
        T.StructField("etymology", T.ArrayType(ETYMOLOGY)),
        T.StructField("pronunciation", T.ArrayType(PRONUNCIATION)),
        T.StructField("dialect", T.ArrayType(DIALECT)),
        T.StructField("written_form", T.ArrayType(WRITTEN_FORM)),
        T.StructField("older_source", T.ArrayType(BIBL_SOURCE)),
        T.StructField("definitions", T.ArrayType(DEFINITION)),
    ]
)

ARTICLE_DATA = T.StructType(
    [
        T.StructField("lemmas", T.ArrayType(LEMMA)),
        T.StructField("suggest", T.ArrayType(T.StringType())),
        T.StructField("updated", T.StringType()),
        T.StructField("body", BODY),
    ]
)

ARTICLES = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("data", ARTICLE_DATA),
        T.StructField("primary_lemma", T.StringType()),
        T.StructField("revision", T.LongType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("modified_at", T.TimestampType()),
        T.StructField("sync_status", T.StringType()),
        T.StructField("status_changed_at", T.TimestampType()),
    ]
)

BIBLIOGRAPHY = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("code", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("fields", T.ArrayType(T.StringType())),
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("sync_status", T.StringType()),
        T.StructField("status_changed_at", T.TimestampType()),
    ]
)

PLACES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("place_name", T.StringType()),
        T.StructField("place_name_full", T.StringType()),
        T.StructField("place_type", T.StringType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("place_order", T.IntegerType()),
        T.StructField("municipality_nr", T.StringType()),
        T.StructField("weight_threshold", T.IntegerType()),
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("sync_status", T.StringType()),
        T.StructField("status_changed_at", T.TimestampType()),
    ]
)

ARTICLE_BIBLIOGRAPHY = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("article_id", T.LongType(), False),
        T.StructField("bibl_id", T.LongType(), False),
    ]
)

ARTICLE_PLACE = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("article_id", T.LongType(), False),
        T.StructField("place_id", T.LongType(), False),
        T.StructField("context", T.StringType(), False),  # dialect | attestation
    ]
)

INLINE_REF_PARSE = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("article_id", T.LongType(), False),
        T.StructField("quote_content", T.StringType(), False),
        T.StructField("offset_start", T.IntegerType(), False),
        T.StructField("offset_end", T.IntegerType(), False),
        T.StructField("code", T.StringType(), False),
        T.StructField("spec", T.StringType()),
        T.StructField("ref_type", T.StringType()),
        T.StructField("bibl_id", T.LongType()),
        T.StructField("place_id", T.LongType()),
    ]
)

JOB_OUTBOX = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("job_type", T.StringType(), False),
        T.StructField("job_key", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),  # JSON string
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("processed_at", T.TimestampType()),
    ]
)

SYNC_STATE = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)

ARTICLE_LIST = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("article_id", T.LongType(), False),
        T.StructField("primary_lemma", T.StringType()),
        T.StructField("revision", T.LongType()),
        T.StructField("updated_at", T.StringType()),
    ]
)

CONCEPTS = T.StructType(
    [
        T.StructField("dictionary", T.StringType(), False),
        T.StructField("concept_id", T.StringType(), False),
        T.StructField("expansion", T.StringType(), False),
    ]
)
