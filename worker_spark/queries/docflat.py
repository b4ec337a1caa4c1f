"""The flagship §3.3 document build, fully DuckDB-hash-checked.

``search_documents_flat`` runs the real pipeline
(plans.search_documents.build_search_documents) over the committed fixture
parquet and flattens every array field to a comma-joined string in its
TRUE order (insertion-order dedup preserved — nothing is re-sorted for
the comparison). The oracle is generated SQL that replays the entire
build in DuckDB: positional UNNEST emulation (range + list indexing, as
DuckDB lacks WITH ORDINALITY), first-occurrence dedup via min(ordinal),
'$'-template interpolation with the concept map, the depth-unrolled
definition-tree traversal with a composite document-order sort key, and
the category joins against the bibliography/places fixture parquet.

``article_search_documents`` keeps the production 43-column surface with
every array field serialized via ``to_json`` — byte-identical between
Spark's ``to_json(array<string>)`` and DuckDB's ``to_json(list(...))``
(verified: raw UTF-8, ``\"``/``\\``/control escapes, no whitespace,
``[]`` for empty) — so the flagship production schema is itself
hash-checked, not just its CSV-flattened twin. ``doc_build_scale``
replays the same oracle with the corpus replicated (200x at the driver's
sf0.01 gate; 10,000x in the sf0.1 bench) for a full-volume hash check of
the throughput probe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.queries import register
from worker_spark.schemas import MAX_DEF_DEPTH

_FD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixture_data",
)
_ARTS = os.path.join(_FD, "articles_parquet", "*.parquet")
_BIB = os.path.join(_FD, "bibliography_parquet", "*.parquet")
_PLACES = os.path.join(_FD, "places_parquet", "*.parquet")
_AP = os.path.join(_FD, "article_place_parquet", "*.parquet")

# concept map constants shared with worker_spark.fixtures.CONCEPTS
_CONCEPT_CASE = "CASE WHEN {id} = 'norr.' THEN 'norrønt' ELSE {id} END"


# --------------------------------------------------------------------------
# oracle SQL generation
# --------------------------------------------------------------------------


def _def_levels() -> list[tuple[str, str, str]]:
    """(from_clauses, node_path, sort_key_prefix) per unrolled depth."""
    out = []
    for depth in range(1, MAX_DEF_DEPTH + 1):
        frm = ["UNNEST(range(1, len(a.data.body.definitions)+1)) AS t1(i1)"]
        path = "a.data.body.definitions[i1]"
        key = "lpad(i1::VARCHAR, 3, '0')"
        for k in range(2, depth + 1):
            frm.append(f"UNNEST(range(1, len({path}.sub_definitions)+1)) AS t{k}(i{k})")
            path = f"{path}.sub_definitions[i{k}]"
            key += f" || '1' || lpad(i{k}::VARCHAR, 3, '0')"
        out.append((", ".join(frm), path, key))
    return out


def _def_elements_union() -> str:
    """All definition-tree elements with a document-order sort key."""
    parts = []
    for frm, path, key in _def_levels():
        parts.append(
            "SELECT a.dictionary, a.id, "
            f"{key} || '0' || lpad(ei::VARCHAR, 3, '0') AS sk, "
            f"{path}.elements[ei] AS el "
            f"FROM arts a, {frm}, "
            f"UNNEST(range(1, len({path}.elements)+1)) AS te(ei)"
        )
    return "\n        UNION ALL\n        ".join(parts)


def _csv(name: str, rows_sql: str, dedup: bool, sep: str = ",", json: bool = False) -> str:
    """CTE producing (dictionary, id, csv) from rows (dictionary,id,ord,v);
    dedup=True keeps first occurrence per value. json=True serializes the
    ordered list as a JSON array string instead of a separator join —
    byte-identical to Spark's to_json(array<string>) (verified: UTF-8 kept
    raw, quotes escaped, no whitespace)."""
    if dedup:
        agg = (
            "to_json(list(v ORDER BY fo))::VARCHAR" if json
            else f"string_agg(v, '{sep}' ORDER BY fo)"
        )
        return f"""
    {name}_f AS (
        SELECT dictionary, id, v, min(ord) AS fo
        FROM ({rows_sql}) WHERE v IS NOT NULL AND v <> '' GROUP BY 1, 2, 3
    ),
    {name} AS (
        SELECT dictionary, id, {agg} AS csv
        FROM {name}_f GROUP BY 1, 2
    )"""
    agg = (
        "to_json(list(v ORDER BY ord))::VARCHAR" if json
        else f"string_agg(v, '{sep}' ORDER BY ord)"
    )
    return f"""
    {name} AS (
        SELECT dictionary, id, {agg} AS csv
        FROM ({rows_sql}) WHERE v IS NOT NULL AND v <> '' GROUP BY 1, 2
    )"""


def _bib_category_rows(cat: str) -> str:
    """(dictionary, id, ord, bib_id) rows per category, in category order."""
    if cat == "older_source":
        return (
            "SELECT a.dictionary, a.id, oi AS ord, a.data.body.older_source[oi].bibl_id AS bid "
            "FROM arts a, UNNEST(range(1, len(a.data.body.older_source)+1)) AS t(oi) "
            "WHERE a.data.body.older_source[oi].bibl_id IS NOT NULL"
        )
    if cat == "written_form_source":
        return (
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY wi, fi, si) AS ord, "
            "a.data.body.written_form[wi].forms[fi].sources[si].bibl_id AS bid "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.body.written_form)+1)) AS tw(wi), "
            "UNNEST(range(1, len(a.data.body.written_form[wi].forms)+1)) AS tf(fi), "
            "UNNEST(range(1, len(a.data.body.written_form[wi].forms[fi].sources)+1)) AS ts(si) "
            "WHERE a.data.body.written_form[wi].forms[fi].sources[si].bibl_id IS NOT NULL"
        )
    if cat == "attestation_source":
        parts = []
        for frm, path, key in _def_levels():
            parts.append(
                "SELECT a.dictionary, a.id, "
                f"{key} || '0' || lpad(ei::VARCHAR, 3, '0') || lpad(pi::VARCHAR, 3, '0') AS sk, "
                f"{path}.elements[ei].place_refs[pi] AS pr "
                f"FROM arts a, {frm}, "
                f"UNNEST(range(1, len({path}.elements)+1)) AS te(ei), "
                f"UNNEST(range(1, len({path}.elements[ei].place_refs)+1)) AS tp(pi)"
            )
        union = "\n            UNION ALL\n            ".join(parts)
        return (
            "SELECT dictionary, id, "
            "row_number() OVER (PARTITION BY dictionary, id ORDER BY sk) AS ord, "
            "pr.bibl_id AS bid FROM ("
            + union
            + ") WHERE coalesce(pr.vis, 0) = 1 AND pr.bibl_id IS NOT NULL"
        )
    # 'bibliography' (all): sorted distinct ids from every carrier path
    older = _bib_category_rows("older_source")
    written = _bib_category_rows("written_form_source")
    parts = []
    for frm, path, key in _def_levels():
        parts.append(
            "SELECT a.dictionary, a.id, 0 AS ord, "
            f"{path}.elements[ei].place_refs[pi].bibl_id AS bid "
            f"FROM arts a, {frm}, "
            f"UNNEST(range(1, len({path}.elements)+1)) AS te(ei), "
            f"UNNEST(range(1, len({path}.elements[ei].place_refs)+1)) AS tp(pi) "
            f"WHERE {path}.elements[ei].place_refs[pi].bibl_id IS NOT NULL"
        )
    union = "\n            UNION ALL\n            ".join([older, written, *parts])
    return (
        "SELECT dictionary, id, bid AS ord, bid FROM ("
        "SELECT DISTINCT dictionary, id, bid FROM (" + union + "))"
    )


def _bib_ctes(json: bool = False) -> tuple[str, list[str]]:
    """CTEs joining each category's ordered ids against the bibliography
    dimension, emitting per-field first-occurrence-deduped CSVs."""
    ctes, cols = [], []
    for cat in ("older_source", "written_form_source", "attestation_source", "bibliography"):
        rows = _bib_category_rows(cat)
        for field in ("code", "author", "title", "year"):
            name = f"{cat}_{field}s"
            joined = (
                f"SELECT r.dictionary, r.id, r.ord, b.{field} AS v "
                f"FROM ({rows}) r JOIN bib b ON b.bid = r.bid"
            )
            ctes.append(_csv(name, joined, dedup=True, json=json))
            cols.append(name)
    return ",".join(ctes), cols


def _place_ctes(json: bool = False) -> tuple[str, list[str]]:
    """Place categories from the article_place link parquet: ids sorted
    numerically within category (the pipeline's deterministic order; the
    union list is sorted per the reference, src/extraction.rs:695-696)."""
    ctes, cols = [], []
    cat_filter = {
        "dialect_place": "context = 'dialect'",
        "attestation_place": "context = 'attestation'",
        "place": "TRUE",
    }
    for cat, flt in cat_filter.items():
        rows_base = (
            f"SELECT DISTINCT dictionary, article_id AS id, place_id FROM ap WHERE {flt}"
        )
        for field, expr in (
            ("name", "coalesce(nullif(p.place_name_full, ''), p.place_name)"),
            ("code", "p.place_name"),
            ("type", "p.place_type"),
        ):
            name = f"{cat}_{field}s"
            joined = (
                f"SELECT r.dictionary, r.id, r.place_id AS ord, {expr} AS v "
                f"FROM ({rows_base}) r JOIN pl p ON p.pid = r.place_id"
            )
            ctes.append(_csv(name, joined, dedup=True, json=json))
            cols.append(name)
    return ",".join(ctes), cols


def _doc_oracle(json_arrays: bool = False, replicate: int | None = None) -> str:
    """The generated DuckDB replay of the whole document build.

    json_arrays=True serializes every array column as a JSON array string
    (matching the Spark side's to_json canonicalization) instead of a
    separator join; replicate=N replays the doc_build_scale corpus
    replication (id + 1000*rep, rep in [0, N)) inside DuckDB.
    """
    j = json_arrays
    els = _def_elements_union()
    resolve = (
        "CASE WHEN si = 1 THEN '' "
        "WHEN items[si-1] IS NULL THEN '' "
        "WHEN items[si-1].type_ IN ('language','relation','entity') THEN "
        "  CASE WHEN items[si-1].id IS NULL THEN '' ELSE "
        + _CONCEPT_CASE.format(id="items[si-1].id")
        + " END "
        "ELSE coalesce(items[si-1].text, '') END || coalesce(seg, '')"
    )
    simple_ctes = [
        _csv(
            "lemmas_csv",
            "SELECT a.dictionary, a.id, li AS ord, a.data.lemmas[li].lemma AS v "
            "FROM arts a, UNNEST(range(1, len(a.data.lemmas)+1)) AS t(li)",
            dedup=False,
            json=j,
        ),
        _csv(
            "suggest_csv",
            "SELECT a.dictionary, a.id, si AS ord, a.data.suggest[si] AS v "
            "FROM arts a, UNNEST(range(1, len(a.data.suggest)+1)) AS t(si)",
            dedup=False,
            json=j,
        ),
        _csv(
            "inflections_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY li, pi, ii) AS ord, "
            "a.data.lemmas[li].paradigm_info[pi].inflection[ii].word_form AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.lemmas)+1)) AS tl(li), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info)+1)) AS tp(pi), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info[pi].inflection)+1)) AS ti(ii)",
            dedup=True,
            json=j,
        ),
        _csv(
            "paradigm_tags_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY li, pi, gi) AS ord, "
            "a.data.lemmas[li].paradigm_info[pi].tags[gi] AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.lemmas)+1)) AS tl(li), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info)+1)) AS tp(pi), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info[pi].tags)+1)) AS tg(gi)",
            dedup=True,
            json=j,
        ),
        _csv(
            "inflection_tags_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY li, pi, ii, gi) AS ord, "
            "a.data.lemmas[li].paradigm_info[pi].inflection[ii].tags[gi] AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.lemmas)+1)) AS tl(li), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info)+1)) AS tp(pi), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info[pi].inflection)+1)) AS ti(ii), "
            "UNNEST(range(1, len(a.data.lemmas[li].paradigm_info[pi].inflection[ii].tags)+1)) AS tg(gi)",
            dedup=True,
            json=j,
        ),
        _csv(
            "pronunciation_csv",
            "SELECT a.dictionary, a.id, pi AS ord, a.data.body.pronunciation[pi].content AS v "
            "FROM arts a, UNNEST(range(1, len(a.data.body.pronunciation)+1)) AS t(pi)",
            dedup=False,
            sep=" ",
        ),
        _csv(
            "dialect_forms_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY di, si, fi) AS ord, "
            "coalesce(a.data.body.dialect[di].subcats[si].forms[fi].form, "
            "         a.data.body.dialect[di].subcats[si].forms[fi].form_content) AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.body.dialect)+1)) AS td(di), "
            "UNNEST(range(1, len(a.data.body.dialect[di].subcats)+1)) AS tsc(si), "
            "UNNEST(range(1, len(a.data.body.dialect[di].subcats[si].forms)+1)) AS tf(fi)",
            dedup=True,
            json=j,
        ),
        _csv(
            "dialect_places_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY di, si, fi, oi) AS ord, "
            "CASE WHEN a.data.body.dialect[di].subcats[si].forms[fi].sources[oi].show = 1 "
            "THEN a.data.body.dialect[di].subcats[si].forms[fi].sources[oi].place_name END AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.body.dialect)+1)) AS td(di), "
            "UNNEST(range(1, len(a.data.body.dialect[di].subcats)+1)) AS tsc(si), "
            "UNNEST(range(1, len(a.data.body.dialect[di].subcats[si].forms)+1)) AS tf(fi), "
            "UNNEST(range(1, len(a.data.body.dialect[di].subcats[si].forms[fi].sources)+1)) AS to_(oi)",
            dedup=True,
            json=j,
        ),
        _csv(
            "etymology_languages_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY ei, ii) AS ord, "
            "CASE WHEN a.data.body.etymology[ei].items[ii].type_ = 'language' "
            "THEN a.data.body.etymology[ei].items[ii].id END AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.body.etymology)+1)) AS te(ei), "
            "UNNEST(range(1, len(a.data.body.etymology[ei].items)+1)) AS ti(ii)",
            dedup=True,
            json=j,
        ),
        _csv(
            "written_forms_csv",
            "SELECT a.dictionary, a.id, "
            "row_number() OVER (PARTITION BY a.dictionary, a.id ORDER BY wi, fi) AS ord, "
            "a.data.body.written_form[wi].forms[fi].written_form AS v "
            "FROM arts a, "
            "UNNEST(range(1, len(a.data.body.written_form)+1)) AS tw(wi), "
            "UNNEST(range(1, len(a.data.body.written_form[wi].forms)+1)) AS tf(fi)",
            dedup=True,
            json=j,
        ),
        _csv(
            "sub_article_lemmas_csv",
            "SELECT dictionary, id, "
            "row_number() OVER (PARTITION BY dictionary, id ORDER BY sk, gi) AS ord, "
            "el.lemmas[gi] AS v FROM els, "
            "UNNEST(range(1, len(el.lemmas)+1)) AS tg(gi) "
            "WHERE el.type_ = 'sub_article'",
            dedup=True,
            json=j,
        ),
        _csv(
            "definition_csv",
            "SELECT dictionary, id, sk AS ord, "
            "CASE WHEN el.type_ = 'explanation' THEN el.content END AS v FROM els",
            dedup=False,
            sep=" ",
        ),
        _csv(
            "example_csv",
            "SELECT dictionary, id, sk AS ord, "
            "CASE WHEN el.type_ = 'example' THEN el.quote.content END AS v FROM els",
            dedup=False,
            sep=" ",
        ),
    ]
    bib_ctes, bib_cols = _bib_ctes(json=j)
    place_ctes, place_cols = _place_ctes(json=j)

    empty_arr = "'[]'" if j else "''"
    select_cols = [
        "a.dictionary || '_' || a.id::VARCHAR AS doc_id",
        "a.id AS article_id",
        "a.dictionary",
        f"coalesce(lemmas_csv.csv, {empty_arr}) AS lemmas",
        f"coalesce(suggest_csv.csv, {empty_arr}) AS suggest",
        f"coalesce(inflections_csv.csv, {empty_arr}) AS inflections",
        f"coalesce(paradigm_tags_csv.csv, {empty_arr}) AS paradigm_tags",
        f"coalesce(inflection_tags_csv.csv, {empty_arr}) AS inflection_tags",
        "coalesce(hs.v, FALSE) AS has_split_inf",
        "coalesce(etext.csv, '') AS etymology_text",
        "coalesce(pronunciation_csv.csv, '') AS pronunciation_text",
        f"coalesce(dialect_forms_csv.csv, {empty_arr}) AS dialect_forms",
        f"coalesce(dialect_places_csv.csv, {empty_arr}) AS dialect_places",
        f"coalesce(etymology_languages_csv.csv, {empty_arr}) AS etymology_languages",
        "coalesce(definition_csv.csv, '') AS definition_text",
        "coalesce(example_csv.csv, '') AS example_text",
        f"coalesce(written_forms_csv.csv, {empty_arr}) AS written_forms",
        f"coalesce(sub_article_lemmas_csv.csv, {empty_arr}) AS sub_article_lemmas",
    ]
    joins = [
        f"LEFT JOIN {n} ON {n}.dictionary = a.dictionary AND {n}.id = a.id"
        for n in [
            "lemmas_csv", "suggest_csv", "inflections_csv", "paradigm_tags_csv",
            "inflection_tags_csv", "pronunciation_csv", "dialect_forms_csv",
            "dialect_places_csv", "etymology_languages_csv", "written_forms_csv",
            "sub_article_lemmas_csv", "definition_csv", "example_csv", "etext", "hs",
        ]
    ]
    for n in bib_cols + place_cols:
        select_cols.append(f"coalesce({n}.csv, {empty_arr}) AS {n}")
        joins.append(f"LEFT JOIN {n} ON {n}.dictionary = a.dictionary AND {n}.id = a.id")

    if replicate is None:
        arts_cte = f"SELECT dictionary, id, data FROM read_parquet('{_ARTS}')"
        ap_cte = f"SELECT dictionary, article_id, place_id, context FROM read_parquet('{_AP}')"
    else:
        # doc_build_scale replication: id + 1000*rep, rep in [0, replicate)
        arts_cte = (
            f"SELECT dictionary, id + 1000*r AS id, data "
            f"FROM read_parquet('{_ARTS}'), UNNEST(range({replicate})) AS tr(r)"
        )
        ap_cte = (
            f"SELECT dictionary, article_id + 1000*r AS article_id, place_id, context "
            f"FROM read_parquet('{_AP}'), UNNEST(range({replicate})) AS tr(r)"
        )

    return f"""
    WITH arts AS (
        {arts_cte}
    ),
    bib AS (SELECT id AS bid, code, author, title, year FROM read_parquet('{_BIB}')),
    pl AS (SELECT id AS pid, place_name, place_name_full, place_type FROM read_parquet('{_PLACES}')),
    ap AS ({ap_cte}),
    els AS (
        {els}
    ),
    hs AS (
        SELECT a.dictionary, a.id, bool_or(coalesce(a.data.lemmas[li].split_inf, FALSE)) AS v
        FROM arts a, UNNEST(range(1, len(a.data.lemmas)+1)) AS t(li) GROUP BY 1, 2
    ),
    etym_raw AS (
        SELECT a.dictionary, a.id, ei,
               CASE WHEN starts_with(a.data.body.etymology[ei].content, '/>')
                    THEN substr(a.data.body.etymology[ei].content, 3)
                    ELSE a.data.body.etymology[ei].content END AS content,
               a.data.body.etymology[ei].items AS items
        FROM arts a, UNNEST(range(1, len(a.data.body.etymology)+1)) AS te(ei)
        WHERE a.data.body.etymology[ei].content IS NOT NULL
    ),
    etym_segs AS (
        SELECT dictionary, id, ei, si, string_split(content, '$')[si] AS seg, items
        FROM etym_raw, UNNEST(range(1, len(string_split(content, '$'))+1)) AS ts(si)
    ),
    etym_pieces AS (
        SELECT dictionary, id, ei, si, {resolve} AS piece FROM etym_segs
    ),
    etym_parts AS (
        SELECT dictionary, id, ei, trim(string_agg(piece, '' ORDER BY si)) AS t
        FROM etym_pieces GROUP BY 1, 2, 3
    ),
    etext AS (
        SELECT dictionary, id, string_agg(t, ' ' ORDER BY ei) AS csv
        FROM etym_parts WHERE t <> '' GROUP BY 1, 2
    ),{",".join(simple_ctes)},{bib_ctes},{place_ctes}
    SELECT {", ".join(select_cols)}
    FROM arts a
    {" ".join(joins)}
    """


# --------------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------------

# the 35 array<string> columns of the production 43-column document schema
_ARR_COLS = [
    "lemmas", "suggest", "inflections", "paradigm_tags", "inflection_tags",
    "dialect_forms", "dialect_places", "etymology_languages", "written_forms",
    "sub_article_lemmas",
] + [
    f"{cat}_{f}s"
    for cat in ("older_source", "written_form_source", "attestation_source", "bibliography")
    for f in ("code", "author", "title", "year")
] + [
    f"{cat}_{f}s"
    for cat in ("dialect_place", "attestation_place", "place")
    for f in ("name", "code", "type")
]


def _json_canon(docs: DataFrame) -> DataFrame:
    """Serialize every array column as a compact JSON string (driver-
    canonicalization-safe; byte-identical to the oracle's to_json(list))."""
    return docs.withColumns(
        {
            c: F.to_json(F.coalesce(F.col(c), F.array().cast("array<string>")))
            for c in _ARR_COLS
        }
    )


def _fixture_inputs(spark: SparkSession):
    from worker_spark.schemas import CONCEPTS

    arts = spark.read.parquet(os.path.dirname(_ARTS))
    bib = spark.read.parquet(os.path.dirname(_BIB))
    places = spark.read.parquet(os.path.dirname(_PLACES))
    ap = spark.read.parquet(os.path.dirname(_AP))
    concepts = spark.createDataFrame(
        [("no", "norr.", "norrønt"), ("bm", "norr.", "norrønt"), ("nn", "norr.", "norrønt")],
        schema=CONCEPTS,
    )
    return arts, bib, places, ap, concepts


@register(
    "article_search_documents",
    _doc_oracle(json_arrays=True),
    doc="§3.3 reindex flagship: fixture articles x bibliography x places x "
    "concepts -> the production 43-column search-document table "
    "(src/meili.rs:187-252), every array field to_json-serialized so the "
    "production schema itself hash-checks against the generated DuckDB "
    "replay (plus goldens in tests/test_search_documents.py).",
)
def q_article_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.plans.search_documents import build_search_documents

    arts, bib, places, ap, concepts = _fixture_inputs(spark)
    return _json_canon(build_search_documents(arts, bib, places, ap, concepts))


@register(
    "search_documents_flat",
    _doc_oracle(),
    doc="The §3.3 flagship document build, fully hash-checked: the real "
    "pipeline over the committed fixture parquet with every array field "
    "flattened to CSV in its true insertion order; the generated DuckDB "
    "oracle replays extraction, interpolation, ordered dedup, the "
    "definition-tree traversal, and the dimension category joins.",
)
def q_search_documents_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.plans.search_documents import build_search_documents

    arts, bib, places, ap, concepts = _fixture_inputs(spark)
    docs = build_search_documents(arts, bib, places, ap, concepts)
    return docs.withColumns({c: F.array_join(F.col(c), ",") for c in _ARR_COLS})


# the driver replays oracles at sf0.01 — the oracle replication MUST equal
# _scale_copies(".../sf0.01"). 100 copies (700 articles) keeps the
# full-volume hash check while holding the driver's DuckDB replay of the
# ~40-CTE oracle near ~20 s (it had crept to ~45 s at 200 copies under
# duckdb 1.x; 1000x took ~110 s of pure oracle time). The BENCH run at
# sf0.1 still pushes 10k copies for the throughput number.
_SCALE_ORACLE_COPIES = 100


def _scale_copies(sf_dir: str) -> int:
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.01"
    if abs(float(sf) - 0.01) < 1e-9:
        return _SCALE_ORACLE_COPIES
    return max(int(float(sf) * 100_000), 100)  # sf0.1 -> 10_000 copies x 7 arts


@register(
    "doc_build_scale",
    _doc_oracle(json_arrays=True, replicate=_SCALE_ORACLE_COPIES),
    doc="Domain-pipeline throughput probe: the fixture corpus replicated "
    "to ~10k articles/sf-unit (distinct ids, same nested payloads) pushed "
    "through the full extraction + dimension-join document build. The "
    "DuckDB oracle replays the same replication factor "
    "so the full-volume output hash-checks; the BENCH number is "
    "documents/second through the flagship pipeline.",
)
def q_doc_build_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.plans.search_documents import build_search_documents

    copies = _scale_copies(sf_dir)
    arts, bib, places, ap, concepts = _fixture_inputs(spark)
    big = (
        arts.crossJoin(F.broadcast(spark.range(copies).select(F.col("id").alias("_rep"))))
        .withColumn("id", F.col("id") + F.col("_rep") * 1000)
        .drop("_rep")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # links replicated to match the replicated article ids
    ap_big = (
        ap.crossJoin(F.broadcast(spark.range(copies).select(F.col("id").alias("_rep"))))
        .withColumn("article_id", F.col("article_id") + F.col("_rep") * 1000)
        .drop("_rep")
    )
    return _json_canon(build_search_documents(big, bib, places, ap_big, concepts))
