"""Content-defined chunking (CDC) over document text.

Training-data pipelines chunk long documents for dedup granularity and
context packing; FIXED-width chunking shifts every boundary when one byte
is inserted upstream, so near-identical documents chunk completely
differently. CDC places boundaries where a rolling hash of the trailing
``W`` characters hits a divisor condition — boundaries depend only on
LOCAL content, so an edit perturbs at most the chunks it touches (the
Rabin-fingerprint insight behind LBFS/rsync and FastCDC; re-expressed
here, no reference counterpart file — LLM-pipeline extension).

Design for Spark/100 TB:
* The whole operator is per-document column arithmetic: character codes,
  an O(len) rolling-hash evaluation as a HOF over positions, boundary
  filtering, and one posexplode per CHUNK (not per char). No shuffle, no
  UDF; it composes with scan pruning like every other map-only operator.
* The hash is an exact-integer polynomial (codepoint * 31^j summed over
  an 8-char window, < 2^60 — ANSI-overflow-safe), so Spark and DuckDB
  compute bit-identical boundaries: the chunking is oracle-checkable and
  reproducible across engines, which is exactly what makes CDC-based
  dedup auditable.
* ``cdc_chunks`` has no min/max-length clamps: boundary eligibility
  never depends on the previous boundary, keeping the operator
  embarrassingly parallel within a document. ``cdc_chunks_clamped``
  layers FastCDC's size clamps on top as a per-document post-pass
  (a left-fold over the candidate array — still map-side, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CDC_WINDOW = 8  # rolling-hash window (chars)
CDC_BASE = 31  # polynomial base
CDC_DIVISOR = 64  # boundary when hash % divisor == 0 -> ~64-char chunks


def _roll_hash(codes: Column, i: Column) -> Column:
    """Polynomial hash of the W chars ending at 1-based position ``i``:
    sum_j codes[i-j] * BASE^j, exact in BIGINT (codepoint <= 0x10FFFF,
    BASE^(W-1) ~ 2^35 -> each term < 2^56, W terms < 2^60)."""
    terms = [
        F.element_at(codes, (i - j).cast("int")).cast("long")
        * F.lit(CDC_BASE**j).cast("long")
        for j in range(CDC_WINDOW)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def cdc_chunks(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Chunk every document at content-defined boundaries. Output one row
    per chunk: (doc_id, chunk_ix, chunk_start [1-based char], chunk_len,
    chunk_hash md5). Empty documents yield no chunks; documents shorter
    than the window are one chunk."""
    base = docs.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        # bind the char-code array BEFORE the position lambda: HOF lambdas
        # re-evaluate referenced expressions per element
        F.transform(F.split(F.col(text_col), ""), F.ascii).alias("_codes"),
    )
    codes = F.col("_codes")
    n = F.size(codes)
    positions = F.when(
        n >= CDC_WINDOW, F.sequence(F.lit(CDC_WINDOW), n)
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.filter(
        positions,
        lambda i: _roll_hash(codes, i) % CDC_DIVISOR == 0,
    )
    with_bounds = base.withColumn(
        "_ends",
        F.concat(
            F.filter(bounds, lambda b: b < n).cast("array<long>"),
            F.array(n.cast("long")),
        ),
    )
    return _explode_chunks(with_bounds)


def _explode_chunks(with_bounds: DataFrame) -> DataFrame:
    """(doc_id, _t, _ends ascending char offsets ending at len) -> one row
    per chunk with start/len/md5 — one posexplode per CHUNK."""
    ends = F.col("_ends")
    starts = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform(F.slice(ends, 1, F.size(ends) - 1), lambda e: e + 1),
    )
    return (
        with_bounds.select(
            "doc_id",
            "_t",
            F.posexplode(F.arrays_zip(starts.alias("s"), ends.alias("e"))).alias(
                "chunk_ix", "c"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_ix").cast("int").alias("chunk_ix"),
            F.col("c.s").alias("chunk_start"),
            (F.col("c.e") - F.col("c.s") + 1).alias("chunk_len"),
            F.md5(
                F.expr("substr(_t, chunk_start, c.e - chunk_start + 1)")
            ).alias("chunk_hash"),
        )
    )


def cdc_duplicate_chunks(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cross-document duplicate chunk report: chunks whose content hash
    appears in more than one document — the CDC dedup primitive (shared
    boilerplate/quotes survive even when whole-document hashes differ).
    One groupBy on the chunk hash; counts only, no pair blowup."""
    ch = cdc_chunks(docs, id_col=id_col, text_col=text_col)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") > 1)
    )


# FastCDC-style chunk-size clamps (Xia et al., USENIX ATC'16 — public
# paper): suppress the geometric tail of the divisor-test chunk-size
# distribution. MIN skips boundaries that would cut a too-short chunk;
# MAX forces a split when no natural boundary arrives in time.
CDC_MIN_LEN = 32
CDC_MAX_LEN = 128


def cdc_chunks_clamped(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = CDC_MIN_LEN,
    max_len: int = CDC_MAX_LEN,
) -> DataFrame:
    """CDC chunking with FastCDC min/max clamps as a boundary post-pass.

    The candidate boundaries are the same local-content divisor hits as
    ``cdc_chunks`` (still embarrassingly parallel to compute); the clamp
    walk is a single ``aggregate`` HOF over the per-document candidate
    array — left fold, still map-only, no shuffle:
    * a candidate closer than ``min_len`` to the last accepted end is
      SKIPPED (short-chunk suppression);
    * when the gap to the next candidate (or to end-of-doc) exceeds
      ``max_len``, forced splits are inserted every ``max_len`` chars
      (long-chunk cap — bounds worst-case chunk size for downstream
      packers/embedders);
    * the final offset is always an end (the last chunk may be short).

    Unlike unclamped CDC, a clamped boundary depends on its predecessor —
    the walk is sequential PER DOCUMENT, which is exactly the
    parallelism-preserving granularity (documents are the partition
    unit). Exact-integer arithmetic end to end: the same walk replayed as
    a DuckDB recursive CTE reproduces identical chunks, so clamping
    stays oracle-checkable."""
    base = docs.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.transform(F.split(F.col(text_col), ""), F.ascii).alias("_codes"),
    )
    codes = F.col("_codes")
    n = F.size(codes)
    positions = F.when(
        n >= CDC_WINDOW, F.sequence(F.lit(CDC_WINDOW), n)
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.filter(
        positions,
        lambda i: _roll_hash(codes, i) % CDC_DIVISOR == 0,
    )
    cand = F.concat(
        F.filter(bounds, lambda b: b < n).cast("array<long>"),
        F.array(n.cast("long")),
    )
    nlong = n.cast("long")

    def step(acc, e):
        last = F.element_at(acc, -1)
        n_forced = F.floor((e - last - 1) / F.lit(max_len)).cast("long")
        forced = F.when(
            n_forced >= 1,
            F.transform(
                F.sequence(F.lit(1).cast("long"), n_forced),
                lambda k: last + k * F.lit(max_len),
            ),
        ).otherwise(F.array().cast("array<long>"))
        last2 = last + n_forced * F.lit(max_len)
        accept = (e - last2 >= F.lit(min_len)) | (e == nlong)
        return F.concat(
            acc,
            forced,
            F.when(accept, F.array(e)).otherwise(F.array().cast("array<long>")),
        )

    walk = F.aggregate(cand, F.array(F.lit(0).cast("long")), step)
    with_bounds = base.withColumn(
        "_ends", F.slice(walk, 2, F.greatest(F.size(walk) - 1, F.lit(0)))
    )
    return _explode_chunks(with_bounds)


RAG_WINDOW = 64  # tokens per chunk
RAG_STRIDE = 48  # tokens between chunk starts (overlap = WINDOW - STRIDE)


def token_window_chunks(
    docs: DataFrame,
    window: int = RAG_WINDOW,
    stride: int = RAG_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed token-window chunking with overlap — the retrieval-indexing
    complement to CDC: RAG pipelines embed overlapping windows so no
    query-relevant span is split across a chunk boundary, and the
    (window, stride) geometry must be deterministic so re-indexing a
    corpus produces byte-identical chunk ids. (CDC optimizes dedup
    stability under edits; token windows optimize retrieval coverage —
    a pipeline typically uses both, CDC upstream and this downstream.)

    Chunk starts are 0, stride, 2*stride, ...; a document emits
    ceil(max(T - window, 0) / stride) + 1 chunks, so the final chunk is
    the only one that may be short and every token is covered at least
    once (floor would silently drop up to stride-1 trailing tokens
    whenever stride does not divide T - window — a span a RAG query
    could then never retrieve). Per chunk: (id, chunk_idx, start_tok, n_tokens, chunk_text,
    chunk_hash) — the md5 chunk hash is the exact-dedup key at the
    chunk granularity.

    Scale shape: pure per-document column arithmetic — one split, one
    sequence-explode per CHUNK, array slices. No shuffle, no UDF; like
    the CDC operators it composes with scan pruning and parallelizes
    embarrassingly. ``stride`` must be >= 1 and <= ``window`` (gaps
    between chunks would violate the coverage contract)."""
    if not (1 <= stride <= window):
        raise ValueError(
            f"stride must be in [1, window]: stride={stride} window={window}"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = F.size(toks)
    # ceil via integer arithmetic: (max(T-W, 0) + S - 1) div S
    n_chunks = (
        F.floor(
            (F.greatest(t - F.lit(window), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("long")
        + 1
    )
    tokenized = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        t.alias("_t"),
        n_chunks.alias("_n"),
    )
    exploded = tokenized.select(
        "id",
        "_toks",
        "_t",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)
        ).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * stride).cast("int")
    piece = F.slice(F.col("_toks"), start + 1, window)
    return exploded.select(
        "id",
        "chunk_idx",
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_hash"),
    )
