"""Exact-substring duplicate detection via winnowing fingerprints.

Large-scale training corpora contain long VERBATIM substrings repeated
across documents (licenses, boilerplate, quoted passages) that whole-doc
and near-dup (MinHash/SimHash) dedup both miss when the surrounding text
differs. The suffix-array approach (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022) finds them exactly but
needs a global sorted suffix structure — hostile to a shared-nothing
engine. The public alternative with a worst-case guarantee is
**winnowing** (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the MOSS
fingerprinter): hash every K-gram, slide a window of W consecutive
K-gram hashes, keep the rightmost minimal hash per window. Any exact
match of length >= W + K - 1 is then guaranteed to share at least one
selected fingerprint, at an expected density of 2/(W+1).

Spark-first shape (100 TB story):
* Selection is ONE window-function pass over per-position K-gram rows.
  The rightmost-min-per-window rule needs an argmin with rightmost
  tie-break, which a plain frame min cannot express — so hash and
  position are packed into a single BIGINT, ``v = h * 2^31 +
  (2^31 - 1 - p)``: minimizing ``v`` minimizes the hash and, among
  ties, MAXIMIZES the position. One ``min() OVER (ROWS W-1 PRECEDING)``
  does the whole selection, in both engines.
* The per-position explode multiplies rows by ~len(text); shuffling
  exploded rows would move ~16 bytes per character. The repartition is
  therefore placed on the DOCUMENT rows *before* the explode: the
  window's required clustering (doc_id) is already satisfied map-side,
  so k-gram rows never cross the wire — only the selected fingerprints
  (expected density 2/(W+1)) reach the duplicate-hash groupBy.
* Duplicate detection is a groupBy on the fingerprint hash — never a
  pair join: a fingerprint shared by 1e6 docs contributes 1e6 hit rows
  (linear), not 1e12 pairs.
* Hashes are mod-folded polynomial integers over codepoints (exact
  integer arithmetic, unrolled identically in the DuckDB oracle), so
  Spark and DuckDB select bit-identical fingerprints and the whole
  pipeline — positions, spans, coverage fractions — hash-checks across
  engines. (Originally md5-prefix; the scaling probe showed md5 per
  position dominated the operator's linear slope.)

A previous formulation kept the hash array in-row and selected via
nested array HOFs; Catalyst's project collapse inlined the md5
transform into every lambda element access, re-evaluating the array per
window position (O(len^2) md5 calls per document). The exploded
window-function plan is immune to that class of blowup and is what a
plan audit wants to see at 100x anyway.

No reference counterpart file — LLM-pipeline extension (the reference's
dedup surface is whole-document; see SURVEY.md §2 dedup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WIN_K = 12  # K-gram length (chars)
WIN_W = 16  # winnow window (in K-grams)
# guarantee: every exact repeat of >= WIN_W + WIN_K - 1 = 27 chars is caught
WIN_GAP = WIN_K + WIN_W  # island merge distance between fingerprint hits
# position packing: 31-bit position field. The K-gram hash below is a
# mod-KG_M polynomial with KG_M < 2^31, so the packed value
# h * 2^31 + (2^31-1-p) tops out below (2^31-1)*2^31 + (2^31-1) < 2^62 —
# comfortably inside signed-BIGINT range in both engines (ADVICE r4: the
# old comment derived the ceiling from the retired 32-bit md5 hash; even
# that packing peaked at exactly 2^63-1, so widening the hash back to 32
# bits would still be safe, but anything wider would overflow). The
# position bound is structural, not assumed: a document would need
# >= 2^31 chars to overflow the field, which exceeds the JVM string/array
# limit, so no text Spark can hold corrupts the packing (the previous
# 24-bit field silently corrupted fingerprints past 16.7M chars).
POS_SHIFT = 1 << 31


# Polynomial K-gram hash (replaces the original md5-prefix hash): the
# scaling probe showed winnowing's linear slope was entirely md5 cost —
# one md5 + hex + base-conv per text POSITION. A mod-folded polynomial
# over codepoints is exact-integer, ~an order of magnitude cheaper, and
# replays bit-for-bit in DuckDB as the same unrolled expression. Folding
# keeps every intermediate < KG_M * KG_B + c < 2^48 (ANSI-safe); the
# final hash is < KG_M = 2^31 - 1, which the 31-bit position packing
# already assumed as the hash ceiling's order of magnitude (packed value
# < (2^31-1) * 2^31 + 2^31 < 2^62).
# Engine-parity caveat: character codes come from Spark `ascii` (first
# UTF-16 code unit) vs DuckDB `ord` (codepoint) — identical for all
# Basic-Multilingual-Plane text; supplementary-plane codepoints (rare
# emoji etc.) would hash differently per engine. Winnowing correctness
# (shared-substring guarantee) is unaffected either way.
KG_B = 65599
KG_M = (1 << 31) - 1


def _kgram_hash(codes: Column, p: Column) -> Column:
    """Mod-folded polynomial hash of the K codepoints starting at 1-based
    position ``p`` of the per-document codepoint array ``codes``."""
    h = F.element_at(codes, p.cast("int")).cast("long")
    for j in range(1, WIN_K):
        c = F.element_at(codes, (p + F.lit(j)).cast("int")).cast("long")
        h = (h * F.lit(KG_B) + c) % F.lit(KG_M)
    return h


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Select winnowing fingerprints per document: one row per selected
    K-gram, ``(doc_id, pos [1-based char], fhash)``.

    Selection rule (Schleimer et al. §2): in every window of WIN_W
    consecutive K-gram hashes keep the RIGHTMOST minimal one; documents
    with fewer than WIN_W K-grams keep the rightmost minimum of all
    their K-grams (one window). Duplicate selections across overlapping
    windows collapse via distinct — expected density 2/(W+1).
    """
    m_expr = F.length(F.col(text_col)) - WIN_K + 1
    base = (
        docs.filter(m_expr >= 1)
        .select(
            F.col(id_col).alias("doc_id"),
            # codepoint array computed ONCE per document; each position's
            # hash then reads K array elements instead of re-substringing
            F.transform(
                F.split(F.col(text_col), "(?!^)"), lambda ch: F.ascii(ch)
            ).alias("_codes"),
            m_expr.cast("long").alias("_m"),
        )
        # shuffle the cheap side: document rows, BEFORE the per-position
        # explode — the window below then finds its doc_id clustering
        # already satisfied and no k-gram row crosses the wire
        .repartition("doc_id")
    )
    kg = base.select(
        "doc_id",
        "_m",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("_m"))).alias("p"),
        "_codes",
    ).select(
        "doc_id",
        "_m",
        "p",
        (
            _kgram_hash(F.col("_codes"), F.col("p")) * F.lit(POS_SHIFT)
            + (F.lit(POS_SHIFT - 1) - F.col("p"))
        ).alias("_v"),
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("p").rowsBetween(-(WIN_W - 1), 0)
    )
    wins = kg.select(
        "doc_id",
        "p",
        "_m",
        F.min("_v").over(frame).alias("_mv"),
    ).filter((F.col("p") >= WIN_W) | (F.col("p") == F.col("_m")))
    return wins.select(
        "doc_id",
        (F.lit(POS_SHIFT - 1) - F.col("_mv") % POS_SHIFT).alias("pos"),
        F.expr(f"_mv div {POS_SHIFT}").alias("fhash"),
    ).distinct()


def substring_dup_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Maximal duplicated-substring spans per document.

    A fingerprint is *duplicated* when its hash occurs more than once in
    the corpus (across OR within documents — both are training-data
    redundancy). Hit positions within WIN_GAP chars of each other merge
    into one span (gaps-and-islands). Output: ``(doc_id, span_start,
    span_end, n_fp)`` — char-offset spans a downstream pass can cut or
    down-weight, the distributed stand-in for suffix-array dedup.
    """
    fps = winnow_fingerprints(docs, id_col=id_col, text_col=text_col)
    dup_hashes = (
        fps.groupBy("fhash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("fhash")
    )
    hits = fps.join(dup_hashes, "fhash").select("doc_id", "pos")
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "_brk",
        F.when(
            F.coalesce(
                F.col("pos") - F.lag("pos").over(w_ord), F.lit(WIN_GAP + 1)
            )
            > WIN_GAP,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_grp",
        F.sum("_brk").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy("doc_id", "_grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + WIN_K - 1).alias("span_end"),
        F.count(F.lit(1)).alias("n_fp"),
    ).select("doc_id", "span_start", "span_end", "n_fp")


def substring_dedup_report(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide duplicated-substring coverage: one row per document
    (zero-filled for clean docs): ``(doc_id, n_dup_spans, dup_chars,
    dup_frac)`` — the audit table a pipeline operator reads to decide
    cut thresholds before substring-level dedup."""
    spans = substring_dup_spans(docs, id_col=id_col, text_col=text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_chars"),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.length(F.col(text_col)).cast("long").alias("_len"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias(
                "n_dup_spans"
            ),
            F.coalesce("dup_chars", F.lit(0).cast("long")).alias("dup_chars"),
            F.round(
                F.coalesce("dup_chars", F.lit(0))
                / F.greatest(F.col("_len"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def substring_dedup_cut(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CUT the duplicated spans out of each document — the action the
    coverage report gates. Spans are merged islands (non-overlapping,
    sorted), so the cleaned text is the ordered concatenation of the
    between-span segments: a single fold over the per-doc span array,
    map-side after one groupBy(doc) of the span rows. Every document is
    returned (docs with no duplicated spans pass through unchanged).

    Output: (doc_id, orig_len, cleaned_len, cut_chars, cleaned_md5) —
    the md5 pins the exact reconstruction cross-engine without hauling
    full text through the comparator."""
    spans = substring_dup_spans(docs, id_col=id_col, text_col=text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.length(F.col(text_col)).cast("long").alias("orig_len"),
    ).join(per_doc, "doc_id", "left")
    t = F.col("_t")

    def step(acc: Column, s: Column) -> Column:
        seg = t.substr(
            acc["pos"], F.greatest(s["span_start"] - acc["pos"], F.lit(0))
        )
        return F.struct(
            F.concat(acc["out"], seg).alias("out"),
            (s["span_end"] + 1).alias("pos"),
        )

    init = F.struct(
        F.lit("").alias("out"), F.lit(1).cast("long").alias("pos")
    )
    finish = lambda acc: F.concat(  # noqa: E731
        acc["out"], t.substr(acc["pos"], F.greatest(F.col("orig_len"), F.lit(1)))
    )
    cleaned = F.when(
        F.col("_spans").isNull(), t
    ).otherwise(
        F.aggregate("_spans", init, step, finish)
    )
    return base.select(
        "doc_id",
        "orig_len",
        F.length(cleaned).cast("long").alias("cleaned_len"),
        (F.col("orig_len") - F.length(cleaned)).cast("long").alias("cut_chars"),
        F.md5(cleaned).alias("cleaned_md5"),
    )
