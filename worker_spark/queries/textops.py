"""Text-analysis queries over the ``documents`` table (training-data
pipeline surface): token counting, quality scoring, language ID,
fingerprinting. Spark side: worker_spark.operators.text (all JVM-side
expressions); oracle side: equivalent ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators import text as T
from worker_spark.queries import register
from worker_spark.sources import load_table

_EN = ", ".join(f"'{s}'" for s in T.LANG_STOPWORDS["en"])
_ES = ", ".join(f"'{s}'" for s in T.LANG_STOPWORDS["es"])
_FR = ", ".join(f"'{s}'" for s in T.LANG_STOPWORDS["fr"])

# DuckDB token list for a document (empty text -> empty list).
_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(text), '\\s+') END"
)


_TOKEN_STATS_SQL = f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_pieces,
           CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
           round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 / nullif(len({_TOKS}), 0), 6) AS mean_word_len
    FROM documents
    """


def _resourced(oracle: str, cte_sql: str, cte_name: str) -> str:
    """Re-source a documents-table oracle onto a derived-corpus CTE: the
    ONE table reference is rewritten to ``cte_name`` and the corpus
    fragment spliced in front — the exact query semantics, a different
    substrate (the r10 char-entropy/gopher twin pattern). Loud count
    check so a drifted fragment can never silently no-op."""
    marker = "FROM documents"
    if oracle.count(marker) != 1:
        raise RuntimeError(
            f"_resourced: expected exactly one '{marker}' in the oracle, "
            f"found {oracle.count(marker)} — update the source rewrite"
        )
    body = oracle.replace(marker, f"FROM {cte_name}")
    if body.lstrip().startswith("WITH"):
        return body.replace("WITH", f"WITH {cte_sql},", 1)
    return f"WITH {cte_sql}\n{body}"


def _on_v2(oracle: str) -> str:
    """_resourced onto the plain Zipf documents_v2 corpus."""
    from worker_spark.sources.synth_corpus import documents_v2_sql

    return _resourced(oracle, documents_v2_sql("docs2"), "docs2")


@register(
    "doc_token_stats",
    _TOKEN_STATS_SQL,
    doc="Token counting: whitespace tokens + BPE-ish piece count + punct "
    "stats per document (training-data text analysis).",
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.with_text_stats(d).select(
        "doc_id", "n_tokens", "n_chars_calc", "n_pieces", "n_punct", "mean_word_len"
    )


@register(
    "doc_token_stats_v2",
    _on_v2(_TOKEN_STATS_SQL),
    doc="doc_token_stats over the Zipf-ish documents_v2 corpus (r11 v2 "
    "twin, deferred from r10): token/length counts now spread with the "
    "harmonic-decay length model (40-160 tokens/doc) instead of the "
    "fixture's near-constant 31-token soup. v1 KEPT — its corpus still "
    "carries punctuation, so n_punct has signal there and none here.",
)
def q_doc_token_stats_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2

    return T.with_text_stats(documents_v2(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_chars_calc", "n_pieces", "n_punct", "mean_word_len"
    )


# Filterless quality-score SQL, shared verbatim by the doc_quality_filter
# oracle (which adds the >= 0.5 cut) and the doc_curation_decision oracle
# (which needs every document scored) — a string-replace between the two
# would silently no-op the moment either text drifts. Parametrized over
# (source table, language column) in r11 so the documents_v2_lang twin
# composes the IDENTICAL formula instead of a drift-prone copy.
def _quality_scored_sql(src: str = "documents", lang_col: str = "lang") -> str:
    return f"""
    WITH scored AS (
        SELECT doc_id, {lang_col},
               len({_TOKS}) AS n_tokens,
               len(list_filter({_TOKS}, t -> t IN ({_EN}))) AS sw,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               length(text) AS n_chars
        FROM {src}
    ), q AS (
        SELECT doc_id, {lang_col},
               round(coalesce(CAST(sw AS DOUBLE) / nullif(n_tokens, 0), 0), 6) AS stopword_ratio,
               round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                     + (1.0 - least(coalesce(CAST(n_punct AS DOUBLE) / nullif(n_chars, 0), 0) * 10.0, 1.0)) * 0.3
                     + (CASE WHEN coalesce(CAST(sw AS DOUBLE) / nullif(n_tokens, 0), 0)
                              BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.0 END) * 0.3, 6) AS quality_score
        FROM scored
    )
    SELECT doc_id, {lang_col}, stopword_ratio, quality_score
    FROM q
"""


_QUALITY_SCORED_SQL = _quality_scored_sql()


@register(
    "doc_quality_filter",
    _QUALITY_SCORED_SQL + """    WHERE quality_score >= 0.5
    """,
    doc="Heuristic quality scoring (length/punct/stopword bands) + filter — "
    "training-data quality gate.",
)
def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        T.with_quality_score(d)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "lang", "stopword_ratio", "quality_score")
    )


def _quality_v2_oracle() -> str:
    from worker_spark.sources.synth_corpus import documents_v2_lang_sql

    body = _quality_scored_sql("docs2l", "true_lang")
    return (
        body.replace("WITH", f"WITH {documents_v2_lang_sql('docs2l')},", 1)
        + """    WHERE quality_score >= 0.5
    """
    )


@register(
    "doc_quality_filter_v2",
    _quality_v2_oracle(),
    doc="Quality gate over the language-bearing documents_v2_lang corpus "
    "(r11 twin — the NOTES watch-list skip cleared by giving the corpus "
    "REAL function words): the English-stopword band now discriminates "
    "— en docs sit in the 0.05-0.6 band, es/fr docs score near zero on "
    "it and pass only on length+punct — instead of v1's all-or-nothing "
    "fixture artifact. Identical formula (the oracle composes the same "
    "parametrized SQL as v1).",
)
def q_doc_quality_filter_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_lang

    return (
        T.with_quality_score(documents_v2_lang(spark, sf_dir))
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "true_lang", "stopword_ratio", "quality_score")
    )


@register(
    "doc_lang_id",
    f"""
    WITH votes AS (
        SELECT doc_id, lang,
               len(list_filter({_TOKS}, t -> t IN ({_EN}))) AS votes_en,
               len(list_filter({_TOKS}, t -> t IN ({_ES}))) AS votes_es,
               len(list_filter({_TOKS}, t -> t IN ({_FR}))) AS votes_fr
        FROM documents
    )
    SELECT doc_id, lang AS label_lang,
           CAST(votes_en AS BIGINT) AS votes_en,
           CAST(votes_es AS BIGINT) AS votes_es,
           CAST(votes_fr AS BIGINT) AS votes_fr,
           CASE
             WHEN greatest(votes_en, votes_es, votes_fr) <= 0 THEN 'und'
             WHEN votes_en = greatest(votes_en, votes_es, votes_fr) THEN 'en'
             WHEN votes_es = greatest(votes_en, votes_es, votes_fr) THEN 'es'
             ELSE 'fr'
           END AS pred_lang
    FROM votes
    """,
    doc="Stopword-vote language ID with deterministic argmax tie order.",
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.with_lang_id(d).select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        "votes_en",
        "votes_es",
        "votes_fr",
        "pred_lang",
    )


def _lang_id_v2_oracle() -> str:
    from worker_spark.sources.synth_corpus import documents_v2_lang_sql

    return f"""
    WITH {documents_v2_lang_sql("docs2l")},
    votes AS (
        SELECT doc_id, true_lang,
               len(list_filter({_TOKS}, t -> t IN ({_EN}))) AS votes_en,
               len(list_filter({_TOKS}, t -> t IN ({_ES}))) AS votes_es,
               len(list_filter({_TOKS}, t -> t IN ({_FR}))) AS votes_fr
        FROM docs2l
    ),
    pred AS (
        SELECT doc_id, true_lang,
               CAST(votes_en AS BIGINT) AS votes_en,
               CAST(votes_es AS BIGINT) AS votes_es,
               CAST(votes_fr AS BIGINT) AS votes_fr,
               CASE
                 WHEN greatest(votes_en, votes_es, votes_fr) <= 0 THEN 'und'
                 WHEN votes_en = greatest(votes_en, votes_es, votes_fr) THEN 'en'
                 WHEN votes_es = greatest(votes_en, votes_es, votes_fr) THEN 'es'
                 ELSE 'fr'
               END AS pred_lang
        FROM votes
    )
    SELECT doc_id, true_lang, votes_en, votes_es, votes_fr, pred_lang,
           pred_lang = true_lang AS correct
    FROM pred
    """


@register(
    "doc_lang_id_v2",
    _lang_id_v2_oracle(),
    doc="Stopword-vote language ID over the language-bearing "
    "documents_v2_lang corpus (r11 twin — watch-list skip cleared): each "
    "doc's true language is planted via real function-word vocabularies "
    "that genuinely OVERLAP ('de'/'en'/'la' live in several languages), "
    "so the detector earns a measured ~0.9 accuracy against honest "
    "ambiguity rather than the v1 fixture's label passthrough. Emits "
    "per-doc correctness so the accuracy surface itself is hash-pinned.",
)
def q_doc_lang_id_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_lang

    d = documents_v2_lang(spark, sf_dir)
    return T.with_lang_id(d).select(
        "doc_id",
        "true_lang",
        "votes_en",
        "votes_es",
        "votes_fr",
        "pred_lang",
        (F.col("pred_lang") == F.col("true_lang")).alias("correct"),
    )


@register(
    "doc_fingerprint_dupes",
    """
    WITH fp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                       '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           min(doc_id) AS canonical_id,
           count(*)    AS n_docs
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
    doc="Normalized-content fingerprint (casefold/strip-punct/collapse-ws "
    "-> md5) grouped to find duplicate clusters.",
)
def q_doc_fingerprint_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        T.with_fingerprint(d)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "event_value_percentiles",
    """
    SELECT event_type,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90,
           round(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group — the distribution-"
    "profiling aggregate a data-quality pipeline runs per shard. "
    "SMALL-GROUP-ONLY (VERDICT r4): percentile()'s aggregation state "
    "buffers every value of a group on one executor, so this exact form "
    "is for bounded-cardinality shards (<= ~10M values/group), matching "
    "the reference's per-dictionary stats scope. The 100 TB path is "
    "event_quantile_sketch (sketches.quantile_sketch): bottom-k rank "
    "sampling, <= k rows per group per partition on the shuffle, "
    "deterministic and oracle-checked with a per-group rank-error audit.",
)
def q_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


_REPETITION_SQL = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), bigrams AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
    ), bg_counts AS (
        SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY doc_id, bg
    ), bg_stats AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(max(c) AS BIGINT) AS top_bigram_count
        FROM bg_counts GROUP BY doc_id
    ), tok_stats AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
        FROM toks
    )
    SELECT ts.doc_id,
           ts.n_tokens,
           round(CAST(ts.n_distinct AS DOUBLE) / nullif(ts.n_tokens, 0), 6) AS type_token_ratio,
           round(CAST(bs.top_bigram_count AS DOUBLE) / nullif(bs.n_bigrams, 0), 6) AS top_bigram_ratio
    FROM tok_stats ts LEFT JOIN bg_stats bs ON ts.doc_id = bs.doc_id
    """


@register(
    "doc_repetition_scores",
    _REPETITION_SQL,
    doc="Repetition quality signals (Gopher-style): type-token ratio and "
    "most-frequent-bigram mass per document — the repetition gate a "
    "pretraining pipeline applies before dedup.",
)
def q_doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _repetition_frame(load_table(spark, sf_dir, "documents"))


@register(
    "doc_repetition_scores_v2",
    _on_v2(_REPETITION_SQL),
    doc="doc_repetition_scores over the Zipf-ish documents_v2 corpus (r11 "
    "v2 twin, deferred from r10): type-token ratio and top-bigram mass "
    "now spread with the harmonic-decay vocabulary (v1's 31-token pool "
    "forces near-zero TTR and saturated bigram repeats at 100+ tokens). "
    "v1 KEPT — its oracle SQL is composed into doc_curation_decision.",
)
def q_doc_repetition_scores_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2

    return _repetition_frame(documents_v2(spark, sf_dir))


# repetition signals moved to the operators layer (the incremental
# curation index shares them); the alias keeps the three call sites
_repetition_frame = T.repetition_frame


@register(
    "doc_tfidf_topk",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    toks_f AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks_f GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks_f GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    doc="Per-document top-3 characteristic terms by tf-idf "
    "(tf * ln(N/df), 6dp, lexicographic tie-break) — corpus-statistics "
    "text analysis with two bounded-key shuffles; built-ins only.",
)
def q_doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators.text import tfidf_topk

    return tfidf_topk(load_table(spark, sf_dir, "documents"), k=3)


_GRAMS5 = (
    "SELECT DISTINCT doc_id AS id, "
    "t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS shingle "
    "FROM toks5, UNNEST(range(1, greatest(len(t) - 3, 1))) AS u(i)"
)


def _contamination_oracle() -> str:
    # ONE oracle for the batch row AND the maintained-screen row
    # (streaming_contamination reuses it verbatim — the family's
    # one-oracle-for-both pattern, ninth instance)
    return f"""
    WITH toks5 AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    sh_all AS ({_GRAMS5}),
    keep AS (
        SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 1000
    ),
    sh AS (SELECT sh_all.id, sh_all.shingle FROM sh_all JOIN keep USING (shingle)),
    ev AS (SELECT * FROM sh WHERE id % 5 = 0),
    co AS (SELECT * FROM sh WHERE id % 5 <> 0),
    ev_sizes AS (SELECT id AS eval_id, count(*) AS n_eval_grams FROM ev GROUP BY id),
    shared AS (
        SELECT ev.id AS eval_id, co.id AS corpus_id, count(*) AS n_shared
        FROM ev JOIN co ON ev.shingle = co.shingle
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT s.eval_id, s.corpus_id, s.n_shared,
           round(CAST(s.n_shared AS DOUBLE) / z.n_eval_grams, 6) AS contamination_rate
    FROM shared s JOIN ev_sizes z ON z.eval_id = s.eval_id
    """


@register(
    "benchmark_contamination",
    _contamination_oracle(),
    doc="Benchmark decontamination scan: corpus docs sharing >= 2 distinct "
    "word-5-grams with the held-out eval split (id % 5 = 0); stop-shingle "
    "df cap bounds the equi-join fan-out at scale.",
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.benchmark_contamination(docs, eval_mod=5, n=5, min_shared=2)


# In-query synthetic contact block: the parquet corpora are PII-free, so
# both engines derive the SAME contact text from customer rows and the
# redaction operator is exercised against real matches.
_CONTACT_SQL = (
    "c_name || ' <' || lower(replace(c_name, '#', '.')) || '@example.com>'"
    " || ' from 10.' || (c_custkey % 200) || '.' || c_nationkey || '.7'"
    " || ' phone 47-555-' || (100 + c_custkey % 900) || '-' || (1000 + c_custkey % 9000)"
)


@register(
    "pii_redaction",
    f"""
    WITH contact AS (
        SELECT c_custkey, {_CONTACT_SQL} AS text FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\\b\\d{{2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
               '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b', '[IP]', 'g'),
               '\\b\\d{{2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '[PHONE]', 'g')) AS redacted_hash
    FROM contact
    """,
    doc="PII detect-and-redact (email/IPv4/phone) in one map-only pass; "
    "portable Java-regex/RE2 patterns; redacted text verified by hash. "
    "Contact text is derived in-query (the corpora are PII-free).",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    contact = cust.select(
        "c_custkey",
        F.concat(
            F.col("c_name"),
            F.lit(" <"),
            F.lower(F.regexp_replace(F.col("c_name"), r"#", ".")),
            F.lit("@example.com>"),
            F.lit(" from 10."),
            (F.col("c_custkey") % 200).cast("string"),
            F.lit("."),
            F.col("c_nationkey").cast("string"),
            F.lit(".7 phone 47-555-"),
            (F.lit(100) + F.col("c_custkey") % 900).cast("string"),
            F.lit("-"),
            (F.lit(1000) + F.col("c_custkey") % 9000).cast("string"),
        ).alias("text"),
    )
    return (
        T.pii_redact(contact, text_col="text")
        .select(
            "c_custkey",
            "n_emails",
            "n_ipv4",
            "n_phones",
            F.md5(F.col("redacted")).alias("redacted_hash"),
        )
    )


def _char_entropy_v2_oracle() -> str:
    from worker_spark.sources.synth_corpus import documents_v2_sql

    return f"""
    WITH {documents_v2_sql("docs2")},
    chars AS (
        SELECT doc_id, CAST(length(text) AS DOUBLE) AS n,
               substr(text, CAST(i AS INTEGER), 1) AS ch
        FROM docs2, UNNEST(range(1, length(text) + 1)) AS t(i)
    ),
    counts AS (
        SELECT doc_id, n, ch, CAST(count(*) AS DOUBLE) AS c
        FROM chars GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           round(log2(max(n)) - sum(c * log2(c)) / max(n), 6) AS char_entropy
    FROM counts GROUP BY doc_id
    """


@register(
    "doc_char_entropy_v2",
    _char_entropy_v2_oracle(),
    doc="Character-level Shannon entropy per doc (bits/char) — gibberish/"
    "base64/repeated-junk filter; single aggregation pass via "
    "H = log2(n) - sum(c*log2(c))/n. Runs on the Zipf-ish documents_v2 "
    "corpus (the v1 twin retired in r10 — the v2-swap pattern the "
    "retrieval family set in r8/r9): entropy now spreads with the "
    "harmonic-decay token mix instead of the 31-token vocabulary's "
    "near-constant character pool.",
)
def q_doc_char_entropy_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2

    return T.with_char_entropy(documents_v2(spark, sf_dir))


# Corpus-tuned Gopher parameters: the synthetic documents corpus is
# lowercase technical word-soup, so the paper's 8 English required
# stopwords never co-occur; the rule STRUCTURE is what's under test, the
# thresholds are caller-tunable knobs (operators/text.py keeps the
# published defaults).
_GOPHER_SW = ("the", "a")
_GOPHER_MIN_WORDS = 50
_GOPHER_SW_SQL = ", ".join(f"'{s}'" for s in _GOPHER_SW)


@register(
    "doc_gopher_rules",
    f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_words,
               CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                   / nullif(len({_TOKS}), 0) AS mwl,
               CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
                   / nullif(len({_TOKS}), 0) AS symr,
               CAST(len(list_filter({_TOKS}, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                   / nullif(len({_TOKS}), 0) AS alphar,
               CAST(len(list_intersect(
                   list_distinct(list_transform({_TOKS}, x -> lower(x))),
                   [{_GOPHER_SW_SQL}])) AS BIGINT) AS sw_hits,
               CAST(len(list_filter(string_split(text, chr(10)),
                        l -> regexp_matches(l, '^\\s*([-*•]\\s)'))) AS DOUBLE)
                   / nullif(len(string_split(text, chr(10))), 0) AS bulletr,
               CAST(len(list_filter(string_split(text, chr(10)),
                        l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS DOUBLE)
                   / nullif(len(string_split(text, chr(10))), 0) AS ellr
        FROM documents
    )
    SELECT doc_id, n_words,
           round(coalesce(mwl, 0), 6) AS mean_word_len,
           round(coalesce(symr, 0), 6) AS symbol_ratio,
           round(coalesce(alphar, 0), 6) AS alpha_word_ratio,
           sw_hits AS n_req_stopwords,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND 100000 AS rule_word_count,
           coalesce(mwl, 0) BETWEEN 3.0 AND 10.0 AS rule_mean_word_len,
           coalesce(symr, 0) <= 0.1 AS rule_symbol_ratio,
           coalesce(alphar, 0) >= 0.8 AS rule_alpha_words,
           sw_hits >= 2 AS rule_stopwords,
           coalesce(bulletr, 0) <= 0.9 AS rule_bullet_lines,
           coalesce(ellr, 0) <= 0.3 AS rule_ellipsis_lines,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND 100000)
               AND (coalesce(mwl, 0) BETWEEN 3.0 AND 10.0)
               AND (coalesce(symr, 0) <= 0.1)
               AND (coalesce(alphar, 0) >= 0.8)
               AND (sw_hits >= 2)
               AND (coalesce(bulletr, 0) <= 0.9)
               AND (coalesce(ellr, 0) <= 0.3) AS passes_gopher
    FROM stats
    """,
    doc="Gopher-style rule-based quality gate (Rae et al. 2021 App. A): "
    "word-count band, mean-word-length band, symbol ratio, alpha-word "
    "ratio, required-stopword hits, bullet/ellipsis line ratios — all "
    "map-only built-in expressions, per-rule flags + conjunction.",
)
def q_doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.with_gopher_rules(
        d, min_words=_GOPHER_MIN_WORDS, required_stopwords=_GOPHER_SW
    ).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_ratio",
        "n_req_stopwords",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_alpha_words",
        "rule_stopwords",
        "rule_bullet_lines",
        "rule_ellipsis_lines",
        "passes_gopher",
    )


# v2-corpus Gopher knobs: the required-stopword rule is corpus-tuned by
# design (the operator keeps the paper's published defaults; this
# registration exercises the rule STRUCTURE on the Zipf corpus, whose
# function words are the s0..s19 heads — ~25% of tokens, df ~ N, the
# role English stopwords play in real text). s0+s1 required -> ~half
# the corpus passes the stopword rule, a genuinely discriminative gate
# instead of v1's all-fail.
_GOPHER_SW_V2 = ("s0", "s1")
_GOPHER_SW_V2_SQL = ", ".join(f"'{s}'" for s in _GOPHER_SW_V2)


def _gopher_v2_oracle() -> str:
    from worker_spark.sources.synth_corpus import documents_v2_sql

    return f"""
    WITH {documents_v2_sql("docs2")},
    stats AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_words,
               CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                   / nullif(len({_TOKS}), 0) AS mwl,
               CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
                   / nullif(len({_TOKS}), 0) AS symr,
               CAST(len(list_filter({_TOKS}, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                   / nullif(len({_TOKS}), 0) AS alphar,
               CAST(len(list_intersect(
                   list_distinct(list_transform({_TOKS}, x -> lower(x))),
                   [{_GOPHER_SW_V2_SQL}])) AS BIGINT) AS sw_hits,
               CAST(len(list_filter(string_split(text, chr(10)),
                        l -> regexp_matches(l, '^\\s*([-*•]\\s)'))) AS DOUBLE)
                   / nullif(len(string_split(text, chr(10))), 0) AS bulletr,
               CAST(len(list_filter(string_split(text, chr(10)),
                        l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS DOUBLE)
                   / nullif(len(string_split(text, chr(10))), 0) AS ellr
        FROM docs2
    )
    SELECT doc_id, n_words,
           round(coalesce(mwl, 0), 6) AS mean_word_len,
           round(coalesce(symr, 0), 6) AS symbol_ratio,
           round(coalesce(alphar, 0), 6) AS alpha_word_ratio,
           sw_hits AS n_req_stopwords,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND 100000 AS rule_word_count,
           coalesce(mwl, 0) BETWEEN 3.0 AND 10.0 AS rule_mean_word_len,
           coalesce(symr, 0) <= 0.1 AS rule_symbol_ratio,
           coalesce(alphar, 0) >= 0.8 AS rule_alpha_words,
           sw_hits >= 2 AS rule_stopwords,
           coalesce(bulletr, 0) <= 0.9 AS rule_bullet_lines,
           coalesce(ellr, 0) <= 0.3 AS rule_ellipsis_lines,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND 100000)
               AND (coalesce(mwl, 0) BETWEEN 3.0 AND 10.0)
               AND (coalesce(symr, 0) <= 0.1)
               AND (coalesce(alphar, 0) >= 0.8)
               AND (sw_hits >= 2)
               AND (coalesce(bulletr, 0) <= 0.9)
               AND (coalesce(ellr, 0) <= 0.3) AS passes_gopher
    FROM stats
    """


@register(
    "doc_gopher_rules_v2",
    _gopher_v2_oracle(),
    doc="Gopher-style rule-based quality gate over the Zipf-ish "
    "documents_v2 corpus (VERDICT r9 item 6 — the v2-twin pattern "
    "extended to the quality family): word-count band, mean-word-length "
    "band, symbol ratio, alpha-word ratio, required-stopword hits "
    "(tuned to the v2 function-word heads s0/s1 — ~half the corpus "
    "passes, a real gate instead of v1's all-fail), bullet/ellipsis "
    "line ratios — all map-only built-in expressions, per-rule flags + "
    "conjunction. The v1 sibling stays registered: its oracle SQL is "
    "composed into doc_curation_decision.",
)
def q_doc_gopher_rules_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2

    return T.with_gopher_rules(
        documents_v2(spark, sf_dir),
        min_words=_GOPHER_MIN_WORDS,
        required_stopwords=_GOPHER_SW_V2,
    ).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_ratio",
        "n_req_stopwords",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_alpha_words",
        "rule_stopwords",
        "rule_bullet_lines",
        "rule_ellipsis_lines",
        "passes_gopher",
    )


@register(
    "doc_lm_score",
    f"""
    WITH bg AS (
        SELECT doc_id, substr(lower(text), CAST(i AS INT), 2) AS bigram
        FROM documents, UNNEST(range(1, length(text))) AS t(i)
        WHERE length(text) >= 2
    ),
    dbc AS (
        SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS cnt
        FROM bg GROUP BY 1, 2
    ),
    model AS (SELECT bigram, CAST(sum(cnt) AS BIGINT) AS c FROM dbc GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM model),
    logp AS (
        SELECT bigram,
               CAST(round(ln(CAST(c AS DOUBLE) / t) * {T.LM_MICRO}) AS BIGINT)
                   AS lp_micro
        FROM model, tot
    )
    SELECT d.doc_id,
           CAST(sum(d.cnt) AS BIGINT) AS n_bigrams,
           round(CAST(sum(d.cnt * l.lp_micro) AS DOUBLE)
                 / ({float(T.LM_MICRO)} * sum(d.cnt)), 6) AS avg_logp
    FROM dbc d JOIN logp l USING (bigram)
    GROUP BY d.doc_id
    """,
    doc="Char-bigram LM scoring (KenLM-style perplexity filter core): "
    "model trained on the corpus itself via one bounded groupBy, scores "
    "joined back via broadcast; per-bigram ln(p) quantized to integer "
    "micros so per-doc sums are exact under any aggregation order.",
)
def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.bigram_lm_scores(d)


# Curation gate thresholds (fixed constants — a production pipeline tunes
# per corpus; sf-corpus distributions: avg_logp in [-4.76,-4.52], ttr
# median 0.46, tbr max 0.17, so every gate has real pass AND fail sets)
CURATION_MIN_QUALITY = 0.5
CURATION_MIN_TTR = 0.35
CURATION_MAX_TBR = 0.15
CURATION_MIN_LOGP = -4.65


def _curation_oracle() -> str:
    from worker_spark.queries import _REGISTRY

    lang_sql = _REGISTRY["doc_lang_id"].oracle
    qual_sql = _QUALITY_SCORED_SQL
    rep_sql = _REGISTRY["doc_repetition_scores"].oracle
    lm_sql = _REGISTRY["doc_lm_score"].oracle
    gopher_sql = _REGISTRY["doc_gopher_rules"].oracle
    reason = f"""CASE
        WHEN l.pred_lang = 'und' THEN 'lang_und'
        WHEN q.quality_score < {CURATION_MIN_QUALITY} THEN 'low_quality'
        WHEN r.type_token_ratio < {CURATION_MIN_TTR}
             OR r.top_bigram_ratio > {CURATION_MAX_TBR} THEN 'repetitive'
        WHEN m.avg_logp IS NULL THEN 'no_lm_support'
        WHEN m.avg_logp < {CURATION_MIN_LOGP} THEN 'lm_outlier'
        WHEN NOT g.passes_gopher THEN 'gopher_fail'
        ELSE 'kept' END"""
    return f"""
    SELECT d.doc_id, l.pred_lang, q.quality_score,
           r.type_token_ratio, r.top_bigram_ratio, m.avg_logp,
           g.passes_gopher,
           ({reason}) = 'kept' AS keep,
           {reason} AS reject_reason
    FROM documents d
    JOIN ({lang_sql}) l USING (doc_id)
    JOIN ({qual_sql}) q USING (doc_id)
    JOIN ({rep_sql}) r USING (doc_id)
    LEFT JOIN ({lm_sql}) m USING (doc_id)
    JOIN ({gopher_sql}) g USING (doc_id)
    """


@register(
    "doc_curation_decision",
    _curation_oracle(),
    doc="The end-to-end curation decision table — the surface a FineWeb/"
    "RefinedWeb-style pipeline actually materializes: language-ID, "
    "heuristic quality, repetition, LM-score, and Gopher gates composed "
    "per document into keep + first-failing-gate reject_reason. All "
    "five signal layers are the already-oracled operators joined on "
    "doc_id; every join is per-doc equi (shuffle-partitioned by id at "
    "scale), every signal map-only or broadcast-model as before.",
)
def q_doc_curation_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    lang = T.with_lang_id(d).select("doc_id", "pred_lang")
    qual = T.with_quality_score(d).select("doc_id", "quality_score")
    rep = q_doc_repetition_scores(spark, sf_dir).select(
        "doc_id", "type_token_ratio", "top_bigram_ratio"
    )
    lm = T.bigram_lm_scores(d).select("doc_id", "avg_logp")
    gopher = T.with_gopher_rules(
        d, min_words=_GOPHER_MIN_WORDS, required_stopwords=_GOPHER_SW
    ).select("doc_id", "passes_gopher")
    joined = (
        d.select("doc_id")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(rep, "doc_id")
        .join(lm, "doc_id", "left")
        .join(gopher, "doc_id")
    )
    reason = (
        F.when(F.col("pred_lang") == "und", F.lit("lang_und"))
        .when(
            F.col("quality_score") < CURATION_MIN_QUALITY, F.lit("low_quality")
        )
        .when(
            (F.col("type_token_ratio") < CURATION_MIN_TTR)
            | (F.col("top_bigram_ratio") > CURATION_MAX_TBR),
            F.lit("repetitive"),
        )
        .when(F.col("avg_logp").isNull(), F.lit("no_lm_support"))
        .when(F.col("avg_logp") < CURATION_MIN_LOGP, F.lit("lm_outlier"))
        .when(~F.col("passes_gopher"), F.lit("gopher_fail"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "doc_id",
        "pred_lang",
        "quality_score",
        "type_token_ratio",
        "top_bigram_ratio",
        "avg_logp",
        "passes_gopher",
        (reason == "kept").alias("keep"),
        reason.alias("reject_reason"),
    )


# documents_v2_lang-tuned curation thresholds (measured at sf0.01 on the
# pred_lang='en' subset — every gate keeps real pass AND fail sets:
# quality p5/p25 = 0.546/0.700, TTR p5..p95 = 0.821..0.968, top-bigram
# p75/p95 = 0.015/0.023, avg_logp p5/p25 = -4.773/-4.682; Gopher with
# the real ('the','a') required stopwords passes 88/162 en docs).
CURATION2_MIN_QUALITY = 0.6
CURATION2_MIN_TTR = 0.85
CURATION2_MAX_TBR = 0.02
CURATION2_MIN_LOGP = -4.7
CURATION2_TARGET = "en"


def _curation_v2_oracle() -> str:
    """The five signal layers, each re-sourced onto the SAME
    documents_v2_lang corpus (every nested layer carries its own corpus
    CTE — DuckDB accepts WITH inside a joined subquery, the v1
    composition's own precedent), gated in the English-pipeline order:
    a FineWeb-style monolingual pipeline REJECTS off-target languages
    first, then applies the quality/repetition/LM/Gopher chain."""
    from worker_spark.queries import _REGISTRY
    from worker_spark.sources.synth_corpus import documents_v2_lang_sql

    cte = documents_v2_lang_sql("docs2l")
    lang_sql = _lang_id_v2_oracle()
    qual_sql = _quality_scored_sql("docs2l", "true_lang").replace(
        "WITH", f"WITH {cte},", 1
    )
    rep_sql = _resourced(_REPETITION_SQL, cte, "docs2l")
    lm_sql = _resourced(_REGISTRY["doc_lm_score"].oracle, cte, "docs2l")
    gopher_sql = _resourced(_REGISTRY["doc_gopher_rules"].oracle, cte, "docs2l")
    reason = f"""CASE
        WHEN l.pred_lang <> '{CURATION2_TARGET}' THEN 'non_target_lang'
        WHEN q.quality_score < {CURATION2_MIN_QUALITY} THEN 'low_quality'
        WHEN r.type_token_ratio < {CURATION2_MIN_TTR}
             OR r.top_bigram_ratio > {CURATION2_MAX_TBR} THEN 'repetitive'
        WHEN m.avg_logp IS NULL THEN 'no_lm_support'
        WHEN m.avg_logp < {CURATION2_MIN_LOGP} THEN 'lm_outlier'
        WHEN NOT g.passes_gopher THEN 'gopher_fail'
        ELSE 'kept' END"""
    return f"""
    SELECT l.doc_id, l.true_lang, l.pred_lang, q.quality_score,
           r.type_token_ratio, r.top_bigram_ratio, m.avg_logp,
           g.passes_gopher,
           ({reason}) = 'kept' AS keep,
           {reason} AS reject_reason
    FROM ({lang_sql}) l
    JOIN ({qual_sql}) q USING (doc_id)
    JOIN ({rep_sql}) r USING (doc_id)
    LEFT JOIN ({lm_sql}) m USING (doc_id)
    JOIN ({gopher_sql}) g USING (doc_id)
    """


@register(
    "doc_curation_decision_v2",
    _curation_v2_oracle(),
    doc="END-TO-END monolingual curation over the language-bearing "
    "documents_v2_lang corpus (r11): the realistic FineWeb-shaped "
    "decision — reject off-target languages FIRST (the lang gate now "
    "rejects ~2/3 of docs instead of v1's never-firing 'und' check), "
    "then the quality/repetition/LM/Gopher chain with corpus-measured "
    "thresholds so every gate has real pass and fail sets. Same "
    "composition discipline as v1: five already-oracled signal layers "
    "joined per-doc (equi on doc_id, shuffle-partitioned by id at "
    "scale), each layer map-only or broadcast-model.",
)
def q_doc_curation_decision_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_lang

    d = documents_v2_lang(spark, sf_dir)
    lang = T.with_lang_id(d).select("doc_id", "true_lang", "pred_lang")
    qual = T.with_quality_score(d).select("doc_id", "quality_score")
    rep = _repetition_frame(d).select(
        "doc_id", "type_token_ratio", "top_bigram_ratio"
    )
    lm = T.bigram_lm_scores(d).select("doc_id", "avg_logp")
    gopher = T.with_gopher_rules(
        d, min_words=_GOPHER_MIN_WORDS, required_stopwords=_GOPHER_SW
    ).select("doc_id", "passes_gopher")
    joined = (
        lang.join(qual, "doc_id")
        .join(rep, "doc_id")
        .join(lm, "doc_id", "left")
        .join(gopher, "doc_id")
    )
    reason = T.curation_reason(
        CURATION2_TARGET,
        CURATION2_MIN_QUALITY,
        CURATION2_MIN_TTR,
        CURATION2_MAX_TBR,
        CURATION2_MIN_LOGP,
    )
    return joined.select(
        "doc_id",
        "true_lang",
        "pred_lang",
        "quality_score",
        "type_token_ratio",
        "top_bigram_ratio",
        "avg_logp",
        "passes_gopher",
        (reason == "kept").alias("keep"),
        reason.alias("reject_reason"),
    )


def _ngram_novelty_oracle() -> str:
    from worker_spark.sources.synth_corpus import documents_v2_sql

    return f"""
    WITH {documents_v2_sql("docs2")},
    toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM docs2
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id,
               t[i] || ' ' || t[i+1] AS shingle
        FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
    ),
    flagged AS (
        SELECT id, count(*) OVER (PARTITION BY shingle) AS df
        FROM sh
    )
    SELECT id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS n_novel,
           round(CAST(count(*) FILTER (WHERE df = 1) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM flagged
    GROUP BY id
    """


@register(
    "doc_ngram_novelty",
    _ngram_novelty_oracle(),
    doc="Per-document word-BIGRAM novelty over documents_v2: the "
    "fraction of a doc's distinct shingles with corpus df == 1 — a "
    "memorization/boilerplate curation signal (boilerplate scores ~0, "
    "novel text ~1; bigrams are the discriminative width here — see "
    "operators/text.ngram_novelty). All partial-aggregated groupBys — "
    "df+owner per shingle (map-side combinable, Zipf-hot shingles safe), "
    "novel counts from the df==1 owners, totals map-side per doc, "
    "summed by one final doc-id agg; no window, no join, no pairwise "
    "stage, no df cap needed. Runs on the Zipf-ish v2 corpus: the "
    "31-term v1 table has zero df==1 shingles, which would make the "
    "signal degenerate.",
)
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2

    return T.ngram_novelty(documents_v2(spark, sf_dir))


def _tfidf_v2_oracle() -> str:
    from worker_spark.sources.synth_corpus import documents_v2_sql

    return f"""
    WITH {documents_v2_sql("docs2")},
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM docs2 WHERE length(trim(text)) > 0
    ),
    toks_f AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks_f GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks_f GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM docs2),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    """


@register(
    "doc_tfidf_topk_v2",
    _tfidf_v2_oracle(),
    doc="Per-document top-3 characteristic terms by tf-idf over "
    "documents_v2: on the Zipf-ish vocabulary idf actually spreads "
    "(the 31-term v1 corpus had df ~ N for every term, making every "
    "idf ~0 and the ranking near-degenerate). Same formula/rounding/"
    "tie-break as doc_tfidf_topk via operators/text.tfidf_topk.",
)
def q_doc_tfidf_topk_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators.text import tfidf_topk
    from worker_spark.sources.synth_corpus import documents_v2

    return tfidf_topk(documents_v2(spark, sf_dir), k=3)
