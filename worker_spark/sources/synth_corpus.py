"""documents_v2: a deterministic Zipf-ish re-texting of the documents
table (VERDICT r7 item 3 — fixture realism).

The driver-generated ``documents`` fixture has a ~31-token vocabulary,
so df ~ N for every term: BM25 posting lists are degenerate (every
query term matches ~every document), the lexical arm dominates hybrid
retrieval wall time, and shingle-based dedup sees unrealistic organic
collision rates. The testdata itself is read-only, so v2 is DERIVED —
each doc_id's text is regenerated from md5 hashes of (doc_id, position)
in BOTH engines, making every v2 query oracle-checkable with no new
fixture file and no stored corpus that could drift.

Token model (all integer/md5 arithmetic — the repo's engine-exact
idiom: ``conv(substr(md5(x),1,8),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,8))::BIGINT``):

* per doc: n_tokens = 40 + h(doc_id,":len") % 120   (~100 avg);
* per position, one md5 over "doc_id:pos", four independent 8-hex
  slices: gate, stop-pick, U, rank;
* gate % 4 == 0 -> a stopword s0..s19 (~25% of tokens: df ~ N heads,
  like real function words);
* else a content term t<rank> with rank = 1 + h_rank % U where
  U = 1 + h_U % 10000: rank is uniform on [1, U] with U itself uniform
  on [1, V], giving P(rank=r) = (H_V - H_{r-1})/V ~ ln(V/r)/V — a
  harmonic-decay document frequency spread over ~4 orders of magnitude
  (t1 in ~7% of tokens' worth of mass down to singleton tails), the
  Zipf-shaped skew BM25/posting operators are designed around, while
  staying EXACT in int64 in both engines (a pow()-based Zipf sampler
  would hinge term identity on a cross-engine libm ulp).

Scale shape: map-only — one transform over a per-row sequence, no
shuffle, no driver state; the corpus derives at read time wherever the
documents table is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.sources.registry import load_table

V2_VOCAB = 10_000
V2_STOPWORDS = 20
V2_STOP_GATE = 4  # 1 in 4 tokens is a stopword
V2_MIN_TOKENS = 40
V2_LEN_SPREAD = 120


def _hx(h: Column, lo: int) -> Column:
    """8-hex-char slice of an md5 string as a non-negative bigint."""
    return F.conv(F.substring(h, lo, 8), 16, 10).cast("bigint")


def _token_expr(doc_id: Column, pos: Column) -> Column:
    h = F.md5(
        F.concat(doc_id.cast("string"), F.lit(":"), pos.cast("string"))
    )
    gate = _hx(h, 1) % V2_STOP_GATE
    stop = _hx(h, 25) % V2_STOPWORDS
    u = F.lit(1) + (_hx(h, 9) % V2_VOCAB)
    rank = F.lit(1) + (_hx(h, 17) % u)
    return F.when(
        gate == 0, F.concat(F.lit("s"), stop.cast("string"))
    ).otherwise(F.concat(F.lit("t"), rank.cast("string")))


def _stream_text_expr(
    len_salt: str, min_tokens: int, spread: int, pos_offset: int = 0
) -> Column:
    """The ONE token-stream generator expression (over a ``doc_id``
    column in scope): body and title are the same stream with different
    length parameters and a shifted position namespace — a single
    definition so the corpora can never fork (review finding)."""
    hlen = _hx(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(len_salt))
        ),
        1,
    )
    n = (F.lit(min_tokens) + (hlen % spread)).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda p: _token_expr(
                F.col("doc_id"),
                p if pos_offset == 0 else p + F.lit(pos_offset),
            ),
        ),
        " ",
    )


def documents_v2_from(
    doc_ids: DataFrame, materialize: bool = True
) -> DataFrame:
    """(doc_id, text) with the Zipf-ish v2 text generated from an
    arbitrary doc_id frame — the scaling probe feeds replicated id sets
    through the same one generator the registered queries use.

    ``materialize`` (default) localCheckpoints the generated corpus:
    every retrieval/dedup consumer scans its docs frame on several plan
    branches (tf, dl, qterms, ...), and an unmaterialized generator
    would re-pay the token transform per branch (the NOTES.md
    union-recompute trap). In production terms this is the one-time
    materialization of a derived table; there is nothing beneath it
    for Catalyst to push into."""
    spark = doc_ids.sparkSession
    # the documents parquet is 1-2 input splits at test SFs; the token
    # transform is the heavy stage, so spread DOC rows first (the
    # NOTES.md single-split HOF trap) — a tiny id-only shuffle
    docs = doc_ids.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    body = _stream_text_expr(":len", V2_MIN_TOKENS, V2_LEN_SPREAD)
    out = docs.select("doc_id", body.alias("text"))
    return out.localCheckpoint(eager=True) if materialize else out


def documents_v2(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """documents_v2_from over the documents table's own doc_ids (the
    embeddings vec_id contract holds)."""
    return documents_v2_from(
        load_table(spark, sf_dir, "documents"), materialize=materialize
    )


V2_TITLE_MIN_TOKENS = 4
V2_TITLE_SPREAD = 8


def documents_v2_titled(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(doc_id, title, text): the v2 corpus with a second, shorter
    deterministic field — the multi-field document shape the
    reference's search index ranks by attribute priority
    (src/meili.rs:273-433 searchable-attribute order; lemmas before
    definition text). The title stream uses the SAME token model under
    the ':t:' salt, 4-11 tokens, so title terms share the body's Zipf
    vocabulary (as real titles share their document's language) while
    being a distinct token sequence."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    body = _stream_text_expr(":len", V2_MIN_TOKENS, V2_LEN_SPREAD)
    title = _stream_text_expr(
        ":tlen", V2_TITLE_MIN_TOKENS, V2_TITLE_SPREAD, pos_offset=1_000_000
    )
    out = docs.select(
        "doc_id", title.alias("title"), body.alias("text")
    )
    return out.localCheckpoint(eager=True) if materialize else out


def _stream_sql(
    out_col: str,
    len_salt: str,
    min_tokens: int,
    spread: int,
    pos_offset: int = 0,
) -> str:
    """DuckDB twin of _stream_text_expr: a parenthesized subquery
    producing (doc_id, ``out_col``) — the ONE SQL definition both the
    body and title corpus fragments compose."""
    hx = "('0x' || substr({h}, {lo}, 8))::BIGINT"
    hlen = hx.format(h=f"md5(d.doc_id::VARCHAR || '{len_salt}')", lo=1)
    pos = (
        "p::VARCHAR"
        if pos_offset == 0
        else f"({pos_offset} + p)::VARCHAR"
    )
    tok_case = f"""CASE WHEN {hx.format(h="h", lo=1)} % {V2_STOP_GATE} = 0
                        THEN 's' || ({hx.format(h="h", lo=25)} % {V2_STOPWORDS})
                        ELSE 't' || (1 + {hx.format(h="h", lo=17)}
                                     % (1 + {hx.format(h="h", lo=9)} % {V2_VOCAB}))
                   END"""
    return f"""(
        SELECT doc_id,
               string_agg({tok_case}, ' ' ORDER BY p) AS {out_col}
        FROM (
            SELECT doc_id, p,
                   md5(doc_id::VARCHAR || ':' || {pos}) AS h
            FROM (
                SELECT d.doc_id, u.p
                FROM documents d,
                     UNNEST(range(0, {min_tokens} + {hlen} % {spread}))
                         AS u(p)
            )
        )
        GROUP BY doc_id
    )"""


def documents_v2_sql(cte_name: str = "docs2") -> str:
    """The DuckDB twin as a WITH-clause fragment producing
    (doc_id, text) under ``cte_name`` — byte-identical text to
    documents_v2 (md5 of identical strings, identical integer folds,
    string_agg ordered by position == the transform's order)."""
    return (
        f"{cte_name} AS "
        + _stream_sql("text", ":len", V2_MIN_TOKENS, V2_LEN_SPREAD)
    )


def documents_v2_titled_sql(cte_name: str = "docs2f") -> str:
    """DuckDB twin of documents_v2_titled: (doc_id, title, text) —
    composes the same two _stream_sql fragments the Spark builder
    composes from _stream_text_expr."""
    body = _stream_sql("text", ":len", V2_MIN_TOKENS, V2_LEN_SPREAD)
    title = _stream_sql(
        "title",
        ":tlen",
        V2_TITLE_MIN_TOKENS,
        V2_TITLE_SPREAD,
        pos_offset=1_000_000,
    )
    return f"""{cte_name} AS (
        SELECT b.doc_id, t.title, b.text
        FROM {body} b
        JOIN {title} t USING (doc_id)
    )"""


# Planted-group size shared by the dupes and shared-substring corpora
# (groups of consecutive doc_ids; see the derivation comments below).
V2_DUP_GROUP = 5


# Shared-substring corpus (round-11, extending the planted-realism
# program to the SUBSTRING dedup family): each doc is
# unique-prefix + SHARED BLOCK + unique-suffix, where the block is one
# v2 token stream generated from the doc's GROUP HEAD id — so every
# group of V2_DUP_GROUP consecutive ids embeds one identical >=150-char
# run inside otherwise-independent text. Winnowing (K=12, W=16:
# every exact repeat >= 27 chars is guaranteed a shared fingerprint)
# must recover the block region in EVERY member — planted span
# structure instead of the v1 fixture's organic-repetition soup. The
# three streams live in disjoint position namespaces (2M/3M/4M; body=0
# and title=1M are taken) so no stream can alias another.
V2_SUBSTR_PRE = (":pre", 15, 10, 2_000_000)
V2_SUBSTR_BLK = (":blk", 30, 10, 4_000_000)
V2_SUBSTR_SUF = (":suf", 15, 10, 3_000_000)


def documents_v2_substr(
    spark: SparkSession,
    sf_dir: str,
    group: int = V2_DUP_GROUP,
    materialize: bool = True,
) -> DataFrame:
    """(doc_id, text): prefix + group-shared block + suffix — the honest
    substrate for exact-substring (winnowing) dedup."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"(doc_id div {group}) * {group}").alias("src_id"),
    )
    blk = (
        docs.select(F.col("src_id").alias("doc_id"))
        .distinct()
        .select(
            F.col("doc_id").alias("src_id"),
            _stream_text_expr(*V2_SUBSTR_BLK).alias("blk"),
        )
    )
    out = (
        docs.join(blk, "src_id")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                _stream_text_expr(*V2_SUBSTR_PRE),
                F.col("blk"),
                _stream_text_expr(*V2_SUBSTR_SUF),
            ).alias("text"),
        )
    )
    return out.localCheckpoint(eager=True) if materialize else out


def documents_v2_substr_sql(
    cte_name: str = "docs2s", group: int = V2_DUP_GROUP
) -> str:
    """DuckDB twin of documents_v2_substr — byte-identical text (same
    three md5 streams, same group-head derivation, same ' ' joins)."""
    pre = _stream_sql("pre", *V2_SUBSTR_PRE)
    suf = _stream_sql("suf", *V2_SUBSTR_SUF)
    blk = _stream_sql("blk", *V2_SUBSTR_BLK)
    marker = "FROM documents d"
    if blk.count(marker) != 1:
        raise RuntimeError(
            "documents_v2_substr_sql: the shared corpus fragment no "
            f"longer contains exactly one '{marker}' — update the "
            "source rewrite"
        )
    heads = (
        f"(SELECT DISTINCT (doc_id // {group}) * {group} AS doc_id "
        "FROM documents)"
    )
    blk = blk.replace(marker, f"FROM {heads} d")
    return f"""{cte_name} AS (
        SELECT d.doc_id, p.pre || ' ' || g.blk || ' ' || s.suf AS text
        FROM documents d
        JOIN {pre} p ON p.doc_id = d.doc_id
        JOIN {suf} s ON s.doc_id = d.doc_id
        JOIN {blk} g ON g.doc_id = (d.doc_id // {group}) * {group}
    )"""


# Positional-correlation corpus (round-11, NOTES watch-list: honest PMI
# needs a corpus where ADJACENT positions are statistically bound — the
# per-position-independent v2 stream has lift ~ 1 everywhere, so a
# collocation row on it would mine noise). Positions pair up
# (pair_id = p div 2); one md5 draw per PAIR decides whether the pair is
# a bound PHRASE (1 in V2_PHRASE_GATE): if so both positions emit the
# phrase's two halves 'p<k>a' 'p<k>b' (always adjacent, in order — a
# true collocation with lift ~ N/c(phrase) >> 1); otherwise each
# position independently draws from the plain v2 token model (the PMI
# null: cross-pair and non-phrase bigrams combine independently, lift
# ~ 1). Still position-local column math — token(p) is a pure function
# of (doc_id, p div 2, p % 2, p) — so both engines generate it with the
# same UNNEST/transform shape, byte-identical.
V2_N_PHRASES = 50
V2_PHRASE_GATE = 4


def _colloc_token_expr(doc_id: Column, pos: Column) -> Column:
    pair = (pos - (pos % 2)) / F.lit(2)
    hp = F.md5(
        F.concat(
            doc_id.cast("string"),
            F.lit(":"),
            pair.cast("bigint").cast("string"),
            F.lit(":pair"),
        )
    )
    gate = _hx(hp, 1) % V2_PHRASE_GATE
    phrase = _hx(hp, 9) % V2_N_PHRASES
    side = F.when(pos % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
    return F.when(
        gate == 0, F.concat(F.lit("p"), phrase.cast("string"), side)
    ).otherwise(_token_expr(doc_id, pos))


def documents_v2_colloc(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(doc_id, text): the v2 corpus with planted two-token phrases —
    the honest substrate for collocation/PMI mining."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    hlen = _hx(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":len"))), 1
    )
    n = (F.lit(V2_MIN_TOKENS) + (hlen % V2_LEN_SPREAD)).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda p: _colloc_token_expr(F.col("doc_id"), p),
        ),
        " ",
    )
    out = docs.select("doc_id", text.alias("text"))
    return out.localCheckpoint(eager=True) if materialize else out


def documents_v2_colloc_sql(cte_name: str = "docs2c") -> str:
    """DuckDB twin of documents_v2_colloc — byte-identical text (same
    per-pair and per-position md5 streams; p // 2 == Spark's truncating
    div for the non-negative positions)."""
    hx = "('0x' || substr({h}, {lo}, 8))::BIGINT"
    hlen = hx.format(h="md5(d.doc_id::VARCHAR || ':len')", lo=1)
    plain_tok = f"""CASE WHEN {hx.format(h="h", lo=1)} % {V2_STOP_GATE} = 0
                        THEN 's' || ({hx.format(h="h", lo=25)} % {V2_STOPWORDS})
                        ELSE 't' || (1 + {hx.format(h="h", lo=17)}
                                     % (1 + {hx.format(h="h", lo=9)} % {V2_VOCAB}))
                   END"""
    tok_case = f"""CASE WHEN {hx.format(h="hp", lo=1)} % {V2_PHRASE_GATE} = 0
                        THEN 'p' || ({hx.format(h="hp", lo=9)} % {V2_N_PHRASES})
                                 || (CASE WHEN p % 2 = 0 THEN 'a' ELSE 'b' END)
                        ELSE {plain_tok}
                   END"""
    return f"""{cte_name} AS (
        SELECT doc_id,
               string_agg({tok_case}, ' ' ORDER BY p) AS text
        FROM (
            SELECT doc_id, p,
                   md5(doc_id::VARCHAR || ':' || p::VARCHAR) AS h,
                   md5(doc_id::VARCHAR || ':' || (p // 2)::VARCHAR
                       || ':pair') AS hp
            FROM (
                SELECT d.doc_id, u.p
                FROM documents d,
                     UNNEST(range(0, {V2_MIN_TOKENS} + {hlen} % {V2_LEN_SPREAD}))
                         AS u(p)
            )
        )
        GROUP BY doc_id
    )"""


# Planted-duplicate derivation (round-10 groundwork for the r11 lexical
# dedup v2 twins): the plain v2 corpus has no duplicate structure at all
# (every doc_id's text is an independent draw), so dedup rows registered
# on it would be degenerate-empty. Groups of up to V2_DUP_GROUP
# consecutive doc_ids share ONE base text generated from the group head
# (src_id = (doc_id div G) * G — SF-independent, no density assumption);
# exact=True leaves members identical (exact-dup clusters with a known
# canonical min-id), exact=False appends a per-doc marker token
# (' u<doc_id>') so members are NEAR-dups: all base shingles shared,
# only the marker-adjacent shingles differ. Both variants are pure
# integer/md5 column math — oracle-expressible, so the r11 dedup twins
# stay hash-checkable with KNOWN planted structure on the realistic
# Zipf corpus.


# Language-bearing corpus variant (round-11, NOTES watch-list: the
# lang-id / quality v2 twins "stay honest skips unless the corpus gains
# real-language stopwords"). Same token model, same ':len' length
# stream, same Zipf content terms — but each doc draws a TRUE language
# from md5(doc_id ':lang') and its ~25% stopword tokens come from that
# language's REAL function-word vocabulary (20 words each, containing
# the detector's 5-word vote lists, operators/text.LANG_STOPWORDS).
# Overlap between the vocabularies ('de'/'en'/'la' live in more than
# one language, as in real text) is kept, so the stopword-vote detector
# faces genuine cross-language ambiguity instead of a rigged alphabet —
# measured accuracy ~0.9, not 1.0, which is the honest signal the
# watch-list asked for.
V2_LANGS = ("en", "es", "fr")
V2_LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "a", "of", "and", "in", "to", "is", "was", "for", "on",
        "as", "with", "by", "at", "from", "that", "it", "he", "she",
        "they",
    ),
    "es": (
        "el", "la", "de", "y", "en", "los", "las", "un", "una", "que",
        "se", "del", "por", "con", "no", "su", "para", "es", "al", "lo",
    ),
    "fr": (
        "le", "les", "de", "et", "en", "la", "un", "une", "des", "du",
        "que", "qui", "dans", "pour", "sur", "par", "au", "pas", "ne",
        "ce",
    ),
}


def _lang_idx_expr(doc_id: Column) -> Column:
    h = F.md5(F.concat(doc_id.cast("string"), F.lit(":lang")))
    return _hx(h, 1) % len(V2_LANGS)


def _lang_token_expr(doc_id: Column, pos: Column, lang_idx: Column) -> Column:
    """_token_expr with the stopword branch resolved through the doc's
    language vocabulary (same md5 stream, same gate/stop/U/rank slices,
    so content terms and stopword POSITIONS match documents_v2 exactly
    — only the stopword SURFACE differs)."""
    h = F.md5(
        F.concat(doc_id.cast("string"), F.lit(":"), pos.cast("string"))
    )
    gate = _hx(h, 1) % V2_STOP_GATE
    stop = _hx(h, 25) % V2_STOPWORDS
    u = F.lit(1) + (_hx(h, 9) % V2_VOCAB)
    rank = F.lit(1) + (_hx(h, 17) % u)
    stopword = None
    for i, lang in enumerate(V2_LANGS):
        picked = F.element_at(
            F.array(*[F.lit(w) for w in V2_LANG_STOPWORDS[lang]]),
            (stop + 1).cast("int"),
        )
        stopword = (
            F.when(lang_idx == i, picked)
            if stopword is None
            else stopword.when(lang_idx == i, picked)
        )
    return F.when(gate == 0, stopword).otherwise(
        F.concat(F.lit("t"), rank.cast("string"))
    )


def documents_v2_lang(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """(doc_id, true_lang, text): the v2 corpus with per-document REAL
    language function words — the honest substrate for the lang-id and
    quality v2 twins (the detector must EARN its accuracy against
    cross-language stopword overlap)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    lidx = _lang_idx_expr(F.col("doc_id"))
    hlen = _hx(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":len"))), 1
    )
    n = (F.lit(V2_MIN_TOKENS) + (hlen % V2_LEN_SPREAD)).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda p: _lang_token_expr(F.col("doc_id"), p, F.col("_lidx")),
        ),
        " ",
    )
    true_lang = None
    for i, lang in enumerate(V2_LANGS):
        true_lang = (
            F.when(F.col("_lidx") == i, F.lit(lang))
            if true_lang is None
            else true_lang.when(F.col("_lidx") == i, F.lit(lang))
        )
    out = docs.withColumn("_lidx", lidx).select(
        "doc_id", true_lang.alias("true_lang"), text.alias("text")
    )
    return out.localCheckpoint(eager=True) if materialize else out


def documents_v2_lang_sql(cte_name: str = "docs2l") -> str:
    """DuckDB twin of documents_v2_lang — byte-identical text (same md5
    streams; DuckDB 1-based list indexing == Spark element_at)."""
    hx = "('0x' || substr({h}, {lo}, 8))::BIGINT"
    hlen = hx.format(h="md5(d.doc_id::VARCHAR || ':len')", lo=1)
    lidx = hx.format(h="md5(doc_id::VARCHAR || ':lang')", lo=1)
    stop_cases = []
    for i, lang in enumerate(V2_LANGS):
        arr = ", ".join(f"'{w}'" for w in V2_LANG_STOPWORDS[lang])
        stop_cases.append(
            f"WHEN {i} THEN ([{arr}])"
            f"[1 + {hx.format(h='h', lo=25)} % {V2_STOPWORDS}]"
        )
    stop_case = " ".join(stop_cases)
    tok_case = f"""CASE WHEN {hx.format(h="h", lo=1)} % {V2_STOP_GATE} = 0
                        THEN CASE lidx {stop_case} END
                        ELSE 't' || (1 + {hx.format(h="h", lo=17)}
                                     % (1 + {hx.format(h="h", lo=9)} % {V2_VOCAB}))
                   END"""
    langs = ", ".join(f"'{x}'" for x in V2_LANGS)
    return f"""{cte_name} AS (
        SELECT doc_id, ([{langs}])[1 + lidx] AS true_lang,
               string_agg({tok_case}, ' ' ORDER BY p) AS text
        FROM (
            SELECT doc_id, ({lidx}) % {len(V2_LANGS)} AS lidx, p,
                   md5(doc_id::VARCHAR || ':' || p::VARCHAR) AS h
            FROM (
                SELECT d.doc_id, u.p
                FROM documents d,
                     UNNEST(range(0, {V2_MIN_TOKENS} + {hlen} % {V2_LEN_SPREAD}))
                         AS u(p)
            )
        )
        GROUP BY doc_id, lidx
    )"""


def documents_v2_dupes(
    spark: SparkSession,
    sf_dir: str,
    group: int = V2_DUP_GROUP,
    exact: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """(doc_id, text): the v2 token model generated from each GROUP
    HEAD's id, so every group of up to ``group`` doc_ids is a planted
    duplicate cluster — identical texts when ``exact``, else base text
    + a per-doc marker token (near-dups).

    NON-NEGATIVE ids only (the fixture contract): Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors, so a negative
    doc_id would map to DIFFERENT group heads in the two engines — the
    same class of latent divergence as the pow()/round() notes
    elsewhere in this module."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"(doc_id div {group}) * {group}").alias("src_id")
    )
    base = documents_v2_from(
        docs.select(F.col("src_id").alias("doc_id")).distinct(),
        materialize=False,
    ).select(F.col("doc_id").alias("src_id"), F.col("text").alias("base"))
    text = (
        F.col("base")
        if exact
        else F.concat(F.col("base"), F.lit(" u"), F.col("doc_id"))
    )
    out = docs.join(base, "src_id").select("doc_id", text.alias("text"))
    return out.localCheckpoint(eager=True) if materialize else out


def documents_v2_dupes_sql(
    cte_name: str = "docs2d",
    group: int = V2_DUP_GROUP,
    exact: bool = False,
) -> str:
    """DuckDB twin of documents_v2_dupes as a WITH-clause fragment —
    byte-identical text (same md5 streams over the same derived src
    ids, same marker concat)."""
    srcs = (
        f"(SELECT DISTINCT (doc_id // {group}) * {group} AS doc_id "
        "FROM documents)"
    )
    # Rewrite the ONE doc_id source of the shared fragment to the
    # derived group-head ids. A targeted rewrite (not a _stream_sql
    # parameter) on purpose: adding a source parameter would change
    # _stream_sql's hashed source and spuriously flag every
    # out-of-window v2 query as transitively changed for a provably
    # output-identical refactor (rotation policy, tools/query_hashes) —
    # found live in r10. The count check fails loudly if the fragment
    # ever stops matching.
    base = _stream_sql("base", ":len", V2_MIN_TOKENS, V2_LEN_SPREAD)
    marker = "FROM documents d"
    if base.count(marker) != 1:
        raise RuntimeError(
            "documents_v2_dupes_sql: the shared corpus fragment no "
            f"longer contains exactly one '{marker}' — update the "
            "source rewrite"
        )
    base = base.replace(marker, f"FROM {srcs} d")
    text = "g.base" if exact else "g.base || ' u' || d.doc_id"
    return f"""{cte_name} AS (
        SELECT d.doc_id, {text} AS text
        FROM documents d
        JOIN {base} g ON g.doc_id = (d.doc_id // {group}) * {group}
    )"""
