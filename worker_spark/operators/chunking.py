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
* No min/max-length clamps: eligibility of a boundary never depends on
  the previous boundary, keeping the operator embarrassingly parallel
  within a document. (FastCDC's clamps suppress pathological chunk-size
  tails; add them as a post-pass over the boundary array if needed —
  still map-side.)
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
