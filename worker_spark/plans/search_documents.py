"""§3.3 — the full reindex pipeline: articles x bibliography x places x
concepts -> the 45-field article_search_documents table
(/root/reference/src/meili.rs:33-118, build at :187-252; reindex_all at
:466-589).

Spark shape (SURVEY.md §7.2): one declarative plan —

  articles
    |> per-article extraction projections (worker_spark.extraction - map-only)
    |> posexplode(category id arrays) JOIN broadcast(bibliography)  (J4)
    |> posexplode(place id arrays)    JOIN broadcast(places)        (J5)
    |> groupBy(article) order-preserving re-aggregation
    |> final 45-field assembly

The reference loads both dimensions into driver-side HashMaps
(src/meili.rs:484-522) — a driver-memory cap. Here they are broadcast
joins: same physical strategy (hash join against an in-memory table),
executor-side, no cap on the articles side. Order semantics:
category/field lists carry their explode position through the join and are
re-sorted inside the aggregation, so insertion-order dedup survives the
shuffle (SURVEY §7.5-2); the union place list is numerically sorted
(src/extraction.rs:695-696).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from worker_spark import extraction as X

BIB_FIELDS = ("code", "author", "title", "year")
BIB_CATS = ("older_source", "written_form_source", "attestation_source", "bibliography")
PLACE_FIELDS = ("name", "code", "type")
PLACE_CATS = ("dialect_place", "attestation_place", "place")


def concepts_map(concepts: DataFrame) -> DataFrame:
    """(dictionary, concept_id, expansion) -> (dictionary, concepts MAP)."""
    return concepts.groupBy("dictionary").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("concept_id"), F.col("expansion")))
        ).alias("concepts")
    )


def _with_concepts(articles: DataFrame, concepts: DataFrame | None) -> DataFrame:
    if concepts is None:
        return articles.withColumn(
            "concepts", F.create_map().cast("map<string,string>")
        )
    return articles.join(F.broadcast(concepts_map(concepts)), "dictionary", "left").withColumn(
        "concepts", F.coalesce(F.col("concepts"), F.create_map().cast("map<string,string>"))
    )


def extract_article_features(articles: DataFrame, concepts: DataFrame | None = None) -> DataFrame:
    """Map-only extraction projections over (dictionary, id, data).

    Uses the process-memoized shared-subtree column dict
    (extraction.cached_feature_columns) — the per-call Python-side
    construction of ~19 deep HOF trees was the flagship build's dominant
    fixed overhead (VERDICT r3 item 4)."""
    out = _with_concepts(articles, concepts)
    return out.withColumns(X.cached_feature_columns()).drop("concepts")


def _cat_entries(cats: dict[str, Column]) -> Column:
    """Concat per-category (cat, pos, id) structs for a single explode."""
    def entry_fn(cat: str, ids: Column):
        def fn(i: Column) -> Column:
            return F.struct(
                F.lit(cat).alias("cat"), i.alias("pos"), F.get(ids, i).alias("ref_id")
            )

        return fn

    parts = []
    for cat, ids in cats.items():
        idx = F.sequence(F.lit(0), F.size(ids) - 1)
        parts.append(
            F.when(F.size(ids) > 0, F.transform(idx, entry_fn(cat, ids))).otherwise(
                F.array().cast("array<struct<cat:string,pos:int,ref_id:bigint>>")
            )
        )
    return F.concat(*parts)


def _ordered_distinct_nonempty(field: str) -> Column:
    """collect_list (pos, fields...) -> sort by pos -> project field ->
    drop empties -> first-occurrence dedup."""
    return F.array_distinct(
        F.filter(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col(field)))),
                lambda s: s[field],
            ),
            lambda v: v.isNotNull() & (v != ""),
        )
    )


def _category_lookup(
    keyed: DataFrame,
    dim: DataFrame,
    cats: dict[str, Column],
    fields: tuple[str, ...],
    id_col: str,
    out_names: dict[tuple[str, str], str],
) -> DataFrame:
    """Explode category id lists, broadcast-join the dimension, re-aggregate
    order-preserved per (article, category), pivot categories to columns."""
    exploded = keyed.select(
        "dictionary",
        "id",
        F.explode(_cat_entries(cats)).alias("e"),
    ).select(
        "dictionary",
        "id",
        F.col("e.cat").alias("cat"),
        F.col("e.pos").alias("pos"),
        F.col("e.ref_id").alias("ref_id"),
    )
    joined = exploded.join(
        F.broadcast(dim), exploded.ref_id == dim[id_col], "inner"
    )
    per_cat = joined.groupBy("dictionary", "id", "cat").agg(
        *[_ordered_distinct_nonempty(f).alias(f"agg_{f}") for f in fields]
    )
    pivoted = (
        per_cat.groupBy("dictionary", "id")
        .pivot("cat", list(cats.keys()))
        .agg(*[F.first(f"agg_{f}").alias(f"agg_{f}") for f in fields])
    )
    # pivot names: "{cat}_agg_{field}" -> requested output names, in ONE
    # select (a withColumnRenamed per column re-analyzes the whole plan —
    # 16-25 analysis passes over a tree containing the giant extraction
    # projection; part of VERDICT r3 item 4)
    return pivoted.select(
        "dictionary",
        "id",
        *[
            F.col(f"{cat}_agg_{f}" if len(fields) > 1 else cat).alias(
                out_names[(cat, f)]
            )
            for cat in cats
            for f in fields
        ],
    )


def article_bibliography_columns(articles_feat: DataFrame, bibliography: DataFrame) -> DataFrame:
    """J4 — 4 bibliography categories x (codes, authors, titles, years)."""
    cats = {
        "older_source": F.col("older_source_ids"),
        "written_form_source": F.col("written_form_source_ids"),
        "attestation_source": F.col("attestation_source_ids"),
        "bibliography": F.col("bibliography_ids"),
    }
    out_names = {
        (cat, f): f"{cat}_{f}s" for cat in cats for f in BIB_FIELDS
    }
    dim = bibliography.select(
        F.col("id").alias("bib_id"), "code", "author", "title", "year"
    )
    return _category_lookup(
        articles_feat, dim, cats, BIB_FIELDS, "bib_id", out_names
    )


def article_place_columns(
    articles: DataFrame, places: DataFrame, article_place: DataFrame
) -> DataFrame:
    """J5/J6 — place id lists from the link table (pivot by context), then
    3 categories x (names, codes, types). Display name =
    coalesce(nullif(full_name, ''), code-name) (src/extraction.rs:722-727);
    the union category is sorted by id first (src/extraction.rs:695-696)."""
    links = article_place.groupBy("dictionary", "article_id").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("context") == "dialect", F.col("place_id")))
        ).alias("dialect_ids"),
        F.array_sort(
            F.collect_list(F.when(F.col("context") == "attestation", F.col("place_id")))
        ).alias("attestation_ids"),
    )
    arts = articles.select("dictionary", "id")
    keyed = arts.join(
        links,
        (arts["dictionary"] == links["dictionary"]) & (arts["id"] == links["article_id"]),
        "left",
    ).select(
        arts["dictionary"].alias("dictionary"),
        arts["id"].alias("id"),
        F.coalesce(links["dialect_ids"], F.array().cast("array<bigint>")).alias(
            "dialect_ids"
        ),
        F.coalesce(links["attestation_ids"], F.array().cast("array<bigint>")).alias(
            "attestation_ids"
        ),
    )
    keyed = keyed.withColumn(
        "union_ids",
        F.array_sort(F.array_union(F.col("dialect_ids"), F.col("attestation_ids"))),
    )
    cats = {
        "dialect_place": F.col("dialect_ids"),
        "attestation_place": F.col("attestation_ids"),
        "place": F.col("union_ids"),
    }
    out_names = {(cat, f): f"{cat}_{f}s" for cat in cats for f in PLACE_FIELDS}
    dim = places.select(
        F.col("id").alias("p_id"),
        F.coalesce(F.nullif(F.col("place_name_full"), F.lit("")), F.col("place_name")).alias(
            "name"
        ),
        F.col("place_name").alias("code"),
        F.col("place_type").alias("type"),
    )
    return _category_lookup(keyed, dim, cats, PLACE_FIELDS, "p_id", out_names)


_EMPTY_ARR = "array<string>"


def build_search_documents(
    articles: DataFrame,
    bibliography: DataFrame,
    places: DataFrame,
    article_place: DataFrame,
    concepts: DataFrame | None = None,
) -> DataFrame:
    """The 45-field denormalized search-document table."""
    feat = extract_article_features(articles, concepts)
    bib_cols = article_bibliography_columns(feat, bibliography)
    place_cols = article_place_columns(articles, places, article_place)

    doc = (
        feat.join(bib_cols, ["dictionary", "id"], "left")
        .join(place_cols, ["dictionary", "id"], "left")
    )

    def arr(name: str) -> Column:
        return F.coalesce(F.col(name), F.array().cast(_EMPTY_ARR)).alias(name)

    bib_arr_cols = [
        arr(f"{cat}_{f}s") for cat in BIB_CATS for f in BIB_FIELDS
    ]
    place_arr_cols = [
        arr(f"{cat}_{f}s") for cat in PLACE_CATS for f in PLACE_FIELDS
    ]
    return doc.select(
        F.concat_ws("_", F.col("dictionary"), F.col("id")).alias("doc_id"),
        F.col("id").alias("article_id"),
        "dictionary",
        "lemmas",
        "suggest",
        "inflections",
        F.coalesce(F.col("etymology_text"), F.lit("")).alias("etymology_text"),
        F.coalesce(F.col("pronunciation_text"), F.lit("")).alias("pronunciation_text"),
        "dialect_forms",
        "paradigm_tags",
        "inflection_tags",
        F.coalesce(F.col("has_split_inf"), F.lit(False)).alias("has_split_inf"),
        "dialect_places",
        *bib_arr_cols,
        "etymology_languages",
        F.coalesce(F.col("definition_text"), F.lit("")).alias("definition_text"),
        F.coalesce(F.col("example_text"), F.lit("")).alias("example_text"),
        "written_forms",
        "sub_article_lemmas",
        *place_arr_cols,
    )


def bibliography_documents(bibliography: DataFrame) -> DataFrame:
    """The bibliography search index projection (src/meili.rs:125-135)."""
    return bibliography.select("id", "code", "author", "title", "year")


def place_documents(places: DataFrame) -> DataFrame:
    """The places search index projection (src/meili.rs:139-151)."""
    return places.select(
        "id", "place_name", "place_name_full", "place_type", "parent_id", "municipality_nr"
    )
