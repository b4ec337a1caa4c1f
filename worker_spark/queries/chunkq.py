"""Content-defined chunking queries over ``documents``.

Spark side: worker_spark.operators.chunking (map-only rolling-hash
boundary detection). Oracle side: the identical exact-integer polynomial
evaluated per position in DuckDB — boundaries are bit-identical across
engines, so chunk starts, lengths, AND content hashes all hash-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators import chunking as C
from worker_spark.queries import register
from worker_spark.sources import load_table

_W, _B, _D = C.CDC_WINDOW, C.CDC_BASE, C.CDC_DIVISOR

_HASH_TERMS = " + ".join(
    f"CAST(ord(substr(text, CAST(i - {j} AS INT), 1)) AS BIGINT) * CAST({_B**j} AS BIGINT)"
    for j in range(_W)
)

_CHUNK_CTE = f"""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS n
        FROM documents WHERE length(text) > 0
    ),
    bounds AS (
        SELECT doc_id, CAST(i AS BIGINT) AS e
        FROM docs, UNNEST(range({_W}, n + 1)) AS t(i)
        WHERE ({_HASH_TERMS}) % {_D} = 0 AND i < n
    ),
    ends AS (
        SELECT doc_id, e FROM bounds
        UNION ALL
        SELECT doc_id, n AS e FROM docs
    ),
    chunks AS (
        SELECT doc_id, e,
               lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS prev_e,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1
                    AS INT) AS chunk_ix
        FROM ends
    ),
    chunk_rows AS (
        SELECT c.doc_id, c.chunk_ix,
               c.prev_e + 1 AS chunk_start,
               c.e - c.prev_e AS chunk_len,
               md5(substr(d.text, CAST(c.prev_e + 1 AS INT),
                          CAST(c.e - c.prev_e AS INT))) AS chunk_hash
        FROM chunks c JOIN docs d ON c.doc_id = d.doc_id
    )
"""


@register(
    "doc_cdc_chunks",
    _CHUNK_CTE
    + """
    SELECT doc_id, chunk_ix, chunk_start, chunk_len, chunk_hash
    FROM chunk_rows
    """,
    doc=f"Content-defined chunking: {_W}-char rolling polynomial hash "
    f"(base {_B}), boundary when hash % {_D} == 0 — map-only, no shuffle, "
    "boundaries shift-invariant under upstream edits (the Rabin/FastCDC "
    "property). Exact-integer hash makes boundaries AND chunk md5s "
    "bit-identical across engines.",
)
def q_doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.cdc_chunks(docs)


@register(
    "doc_cdc_duplicate_chunks",
    _CHUNK_CTE
    + """
    SELECT chunk_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           min(chunk_len) AS chunk_len
    FROM chunk_rows
    GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) > 1
    """,
    doc="Cross-document duplicate CDC chunks (shared boilerplate "
    "detection): one groupBy on chunk hash, counts only — no pair "
    "materialization at any scale.",
)
def q_doc_cdc_duplicate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.cdc_duplicate_chunks(docs)


_MIN, _MAX = C.CDC_MIN_LEN, C.CDC_MAX_LEN

# The clamp walk is order-sensitive (each boundary depends on the last
# accepted one), so the oracle REPLAYS it: a recursive CTE steps through
# the per-document candidate list carrying last_end, a second pass emits
# forced splits (generate_series every MAX chars) and accepted ends, and
# the chunk rows are rebuilt with lag() — same technique as the sequence
# packing oracle (NOTES.md: order-sensitive ops CAN be oracled).
_CLAMP_SQL = f"""
    WITH RECURSIVE docs AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        FROM documents WHERE length(text) > 0
    ),
    rawb AS (
        SELECT doc_id, CAST(i AS BIGINT) AS e
        FROM docs, UNNEST(range({_W}, n + 1)) AS t(i)
        WHERE ({_HASH_TERMS}) % {_D} = 0 AND i < n
    ),
    cand AS (
        SELECT doc_id, e,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY e)
                    AS BIGINT) AS i
        FROM (SELECT doc_id, e FROM rawb
              UNION ALL SELECT doc_id, n FROM docs)
    ),
    walk AS (
        SELECT doc_id, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS last_end
        FROM docs
        UNION ALL
        SELECT w.doc_id, c.i,
               CASE WHEN (c.e - (w.last_end + {_MAX} * ((c.e - w.last_end - 1) // {_MAX})) >= {_MIN})
                         OR c.e = d.n
                    THEN c.e
                    ELSE w.last_end + {_MAX} * ((c.e - w.last_end - 1) // {_MAX})
               END
        FROM walk w
        JOIN cand c ON c.doc_id = w.doc_id AND c.i = w.i + 1
        JOIN docs d ON d.doc_id = w.doc_id
    ),
    steps AS (
        SELECT w.doc_id, c.e, w.last_end,
               (c.e - w.last_end - 1) // {_MAX} AS n_forced,
               w.last_end + {_MAX} * ((c.e - w.last_end - 1) // {_MAX})
                   AS after_forced,
               (c.e = d.n) AS is_final
        FROM walk w
        JOIN cand c ON c.doc_id = w.doc_id AND c.i = w.i + 1
        JOIN docs d ON d.doc_id = w.doc_id
    ),
    forced AS (
        SELECT doc_id, CAST(p AS BIGINT) AS e
        FROM steps,
             UNNEST(generate_series(last_end + {_MAX}, e - 1, {_MAX})) AS t(p)
        WHERE n_forced > 0
    ),
    accepted AS (
        SELECT doc_id, e FROM steps
        WHERE (e - after_forced >= {_MIN}) OR is_final
    ),
    ends2 AS (
        SELECT doc_id, e FROM forced UNION ALL SELECT doc_id, e FROM accepted
    ),
    chunks AS (
        SELECT doc_id, e,
               lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS prev_e,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1
                    AS INT) AS chunk_ix
        FROM ends2
    )
    SELECT c.doc_id, c.chunk_ix,
           c.prev_e + 1 AS chunk_start,
           c.e - c.prev_e AS chunk_len,
           md5(substr(d.text, CAST(c.prev_e + 1 AS INT),
                      CAST(c.e - c.prev_e AS INT))) AS chunk_hash
    FROM chunks c JOIN docs d ON c.doc_id = d.doc_id
"""


@register(
    "doc_cdc_chunks_clamped",
    _CLAMP_SQL,
    doc=f"CDC chunking with FastCDC min/max clamps ({_MIN}/{_MAX} chars): "
    "skip-short candidates, forced splits on overlong gaps — a "
    "per-document left fold (aggregate HOF, still map-only); oracle "
    "replays the walk as a recursive CTE.",
)
def q_doc_cdc_chunks_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.cdc_chunks_clamped(docs)


_RW, _RS = C.RAG_WINDOW, C.RAG_STRIDE


@register(
    "doc_rag_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    sized AS (
        SELECT doc_id, t, len(t) AS n_tok,
               CAST(floor((greatest(len(t) - {_RW}, 0) + {_RS - 1})
                          / {_RS}) AS BIGINT) + 1
                   AS n_chunks
        FROM toks
    ),
    chunks AS (
        SELECT doc_id AS id, CAST(c AS BIGINT) AS chunk_idx,
               CAST(c * {_RS} AS BIGINT) AS start_tok,
               array_slice(t, CAST(c * {_RS} + 1 AS INT),
                           CAST(c * {_RS} + {_RW} AS INT)) AS piece
        FROM sized, UNNEST(range(n_chunks)) u(c)
    )
    SELECT id, chunk_idx, start_tok,
           CAST(len(piece) AS BIGINT) AS n_tokens,
           array_to_string(piece, ' ') AS chunk_text,
           md5(array_to_string(piece, ' ')) AS chunk_hash
    FROM chunks
    """,
    doc=f"Token-window RAG chunking ({_RW}-token windows, stride {_RS}, "
    f"{_RW - _RS}-token overlap): the retrieval-indexing complement to "
    "CDC — overlapping windows so no query-relevant span is split across "
    "a boundary, deterministic geometry so re-indexing reproduces "
    "byte-identical chunk hashes. Map-only (one split + one "
    "sequence-explode per chunk + array slices; no shuffle, no UDF). "
    "Every token covered; only the final chunk may be short.",
)
def q_doc_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return C.token_window_chunks(docs)
