"""Winnowing substring-dedup queries over ``documents``.

Spark side: worker_spark.operators.substrings (map-only fingerprint
selection, one groupBy on the fingerprint hash, per-doc span windows).
Oracle side: the identical winnowing selection replayed in DuckDB —
K-gram polynomial hashes per position (mod-folded over codepoints,
unrolled identically in both engines), rightmost-min-per-window via a
frame min, the same gaps-and-islands span merge. Fingerprints, spans,
and coverage fractions are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators import substrings as S
from worker_spark.queries import register
from worker_spark.sources import load_table

_K, _W, _GAP = S.WIN_K, S.WIN_W, S.WIN_GAP
_PS = S.POS_SHIFT


def _kgram_hash_sql() -> str:
    """The mod-folded polynomial K-gram hash, unrolled exactly like
    substrings._kgram_hash: h = fold_j (h * B + ord(text[p+j])) % M."""
    # every term BIGINT-cast: DuckDB's ord() is INT32 and an INT32 fold
    # overflows at the first multiply
    h = "CAST(ord(substr(text, CAST(p AS INT), 1)) AS BIGINT)"
    for j in range(1, _K):
        h = (
            f"(({h}) * CAST({S.KG_B} AS BIGINT)"
            f" + ord(substr(text, CAST(p + {j} AS INT), 1)))"
            f" % CAST({S.KG_M} AS BIGINT)"
        )
    return h


_SPAN_CTE = f"""
    WITH docs AS (
        SELECT doc_id, text,
               CAST(length(text) - {_K} + 1 AS BIGINT) AS m
        FROM documents WHERE length(text) >= {_K}
    ),
    kg AS (
        -- packed (hash, position): min(v) = min hash, rightmost tie-break
        SELECT doc_id, m, CAST(p AS BIGINT) AS p,
               CAST({_kgram_hash_sql()} AS BIGINT) * {_PS}
                   + ({_PS} - 1 - CAST(p AS BIGINT)) AS v
        FROM docs, UNNEST(range(1, m + 1)) AS t(p)
    ),
    wins AS (
        SELECT doc_id, m, p,
               min(v) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN {_W - 1} PRECEDING AND CURRENT ROW)
                   AS mv
        FROM kg
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               {_PS} - 1 - (mv % {_PS}) AS pos,
               mv // {_PS} AS fhash
        FROM wins WHERE p >= {_W} OR p = m
    ),
    dups AS (SELECT fhash FROM fps GROUP BY fhash HAVING count(*) > 1),
    hits AS (SELECT f.doc_id, f.pos FROM fps f JOIN dups d USING (fhash)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN coalesce(
                        pos - lag(pos) OVER (PARTITION BY doc_id
                                             ORDER BY pos),
                        {_GAP + 1}) > {_GAP}
                    THEN 1 ELSE 0 END AS brk
        FROM hits
    ),
    grp AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS g
        FROM isl
    ),
    spans AS (
        SELECT doc_id,
               min(pos) AS span_start,
               max(pos) + {_K} - 1 AS span_end,
               CAST(count(*) AS BIGINT) AS n_fp
        FROM grp GROUP BY doc_id, g
    )
"""


@register(
    "doc_substring_dup_spans",
    _SPAN_CTE
    + """
    SELECT doc_id, span_start, span_end, n_fp FROM spans
    """,
    doc=f"Exact-substring duplicate spans via winnowing (Schleimer/MOSS, "
    f"SIGMOD'03): K={_K}-gram polynomial hashes, rightmost-min per "
    f"W={_W} window — every verbatim repeat >= {_W + _K - 1} chars is "
    "guaranteed a shared fingerprint. Map-only selection, one groupBy "
    "on the hash (no pair join), per-doc island merge — the distributed "
    "stand-in for suffix-array dedup (Lee et al., ACL'22).",
)
def q_doc_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.substring_dup_spans(docs)


@register(
    "doc_substring_dedup_report",
    _SPAN_CTE
    + """
    , per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_dup_spans,
               CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_chars
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_dup_spans, 0) AS n_dup_spans,
           coalesce(p.dup_chars, 0) AS dup_chars,
           round(coalesce(p.dup_chars, 0) /
                 greatest(CAST(length(d.text) AS BIGINT), 1), 6) AS dup_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Per-document duplicated-substring coverage (zero-filled): span "
    "count, duplicated chars, duplicated fraction — the audit table that "
    "drives substring-cut thresholds before training.",
)
def q_doc_substring_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.substring_dedup_report(docs)


def _report_v2_oracle() -> str:
    """The report oracle re-sourced onto the shared-substring corpus:
    BOTH table references (the span CTE's scan and the zero-fill left
    join) move to the docs2s CTE — count-checked so a drifted fragment
    can never silently half-rewrite — then the corpus fragment is
    spliced in front (it reads FROM documents itself, so order
    matters; the r11 _on_dupes/_resourced pattern)."""
    from worker_spark.sources.synth_corpus import documents_v2_substr_sql

    oracle = _SPAN_CTE + """
    , per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_dup_spans,
               CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_chars
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_dup_spans, 0) AS n_dup_spans,
           coalesce(p.dup_chars, 0) AS dup_chars,
           round(coalesce(p.dup_chars, 0) /
                 greatest(CAST(length(d.text) AS BIGINT), 1), 6) AS dup_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """
    marker = "FROM documents"
    if oracle.count(marker) != 2:
        raise RuntimeError(
            "_report_v2_oracle: expected exactly two table references "
            f"(span scan + zero-fill join), found {oracle.count(marker)}"
        )
    body = oracle.replace(marker, "FROM docs2s")
    cte = documents_v2_substr_sql("docs2s")
    return body.replace("WITH", f"WITH {cte},", 1)


@register(
    "doc_substring_dedup_report_v2",
    _report_v2_oracle(),
    doc="Per-document duplicated-substring coverage over the PLANTED "
    "shared-substring corpus (r11 — the substring family joins the "
    "planted-realism program): each doc embeds one group-shared "
    ">=150-char block between independent prefix/suffix streams, so "
    "winnowing's 27-char guarantee must recover the block region in "
    "EVERY member (dup_frac ~ the planted block share, median 0.45 "
    "measured) — known span structure instead of the v1 fixture's "
    "organic-repetition soup. Same operator, same scale shape.",
)
def q_doc_substring_dedup_report_v2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_substr

    return S.substring_dedup_report(documents_v2_substr(spark, sf_dir))


@register(
    "doc_substring_dedup_cut",
    _SPAN_CTE
    + """
    , sp AS (
        SELECT doc_id, span_start, span_end,
               lag(span_end, 1, 0) OVER (PARTITION BY doc_id
                                         ORDER BY span_start) AS prev_end
        FROM spans
    ),
    segs AS (
        SELECT s.doc_id, s.prev_end + 1 AS pos,
               substr(d.text, CAST(s.prev_end + 1 AS INT),
                      CAST(greatest(s.span_start - s.prev_end - 1, 0)
                           AS INT)) AS seg
        FROM sp s JOIN documents d USING (doc_id)
        UNION ALL
        SELECT m.doc_id, m.last_end + 1 AS pos,
               substr(d.text, CAST(m.last_end + 1 AS INT)) AS seg
        FROM (SELECT doc_id, max(span_end) AS last_end
              FROM spans GROUP BY doc_id) m
        JOIN documents d USING (doc_id)
    ),
    cleanedt AS (
        SELECT doc_id, string_agg(seg, '' ORDER BY pos) AS cleaned
        FROM segs GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(length(d.text) AS BIGINT) AS orig_len,
           CAST(length(coalesce(c.cleaned, d.text)) AS BIGINT)
               AS cleaned_len,
           CAST(length(d.text) - length(coalesce(c.cleaned, d.text))
                AS BIGINT) AS cut_chars,
           md5(coalesce(c.cleaned, d.text)) AS cleaned_md5
    FROM documents d LEFT JOIN cleanedt c USING (doc_id)
    """,
    doc="Substring-dedup ACTION: cut every duplicated span and emit the "
    "cleaned text's length + md5 (the md5 pins the exact reconstruction "
    "cross-engine). Spans are merged non-overlapping islands, so the "
    "cut is one ordered fold over the per-doc span array — map-side "
    "after the span groupBy; untouched documents pass through.",
)
def q_doc_substring_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.substring_dedup_cut(docs)
