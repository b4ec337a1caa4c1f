"""Distributed BPE tokenizer training (first merge rounds).

Byte-pair encoding (Sennrich et al., ACL 2016) trains a tokenizer by
repeatedly merging the most frequent adjacent symbol pair. The classic
scale observation: after ONE corpus-sized groupBy that builds the
word-frequency table, every training round runs over the VOCABULARY
(weighted by word frequency), not the corpus — so training cost is
independent of corpus size. That is exactly the shape a 100 TB pipeline
needs: corpus touched once, then vocab-bounded iterations.

Spark-first shape:
* word-frequency table: whitespace pre-tokenization + groupBy(word) —
  the single corpus-proportional shuffle (vocab-bounded output).
* pair counting per round: per-word adjacent pairs weighted by freq —
  map + groupBy over vocab rows.
* the winning pair is a 1-row argmax collected to the driver (control
  plane), then applied as a broadcast literal.
* merge application is a greedy left-to-right fold over each word's
  symbol array (aggregate HOF with a (out, carry) struct state —
  map-only, no shuffle): carry the previous symbol; when (carry, s)
  equals the merge pair emit the merged symbol and clear the carry.
  Greedy non-overlapping left-to-right is the reference BPE semantics
  ("aaa" with merge (a,a) -> ["aa", "a"]).

Determinism: ties in pair counts break on (count desc, left asc,
right asc), so the learned merges — and therefore the whole oracle
replay — are engine-exact.

No reference counterpart file — LLM-pipeline extension (SURVEY.md §2
has token counting; this is the training side of that operator).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_ROUNDS = 3


def word_freqs(
    docs: DataFrame, text_col: str = "text", min_len: int = 1
) -> DataFrame:
    """Word-frequency table: lowercase whitespace tokens -> (word, freq).
    The one corpus-proportional step; everything after runs on vocab."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(toks).alias("word"))
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_symbols(words: DataFrame) -> DataFrame:
    """Initial symbol sequences: one char per symbol."""
    # split keeps a trailing "" (the lookahead also matches at the end of
    # the string under limit=-1) — slice to exactly length(word) chars
    return words.select(
        "word",
        "freq",
        F.slice(
            F.split(F.col("word"), "(?!^)"), 1, F.length(F.col("word"))
        ).alias("syms"),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: the BPE merge
    candidate table. Map + groupBy over vocab rows."""
    syms = F.col("syms")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i.cast("int")).alias("left_sym"),
                F.element_at(syms, (i + 1).cast("int")).alias("right_sym"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left_sym:string,right_sym:string>>"))
    return (
        symbols.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left_sym").alias("left_sym"), F.col("p.right_sym").alias("right_sym"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def apply_merge(symbols: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol — a fold over the symbol array, map-only."""
    merged = F.lit(left + right)
    l_lit, r_lit = F.lit(left), F.lit(right)

    def step(acc: Column, s: Column) -> Column:
        carry = acc["carry"]
        return (
            F.when(
                carry.isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                (carry == l_lit) & (s == r_lit),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(carry)).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["carry"].isNull(), acc["out"]
    ).otherwise(F.concat(acc["out"], F.array(acc["carry"])))
    return symbols.select(
        "word", "freq", F.aggregate("syms", init, step, finish).alias("syms")
    )


def train_merges(
    docs: DataFrame, text_col: str = "text", rounds: int = BPE_ROUNDS
) -> list[tuple[int, str, str, int]]:
    """Run ``rounds`` BPE training rounds; returns [(round, left_sym,
    right_sym, pair_count), ...] — each round's winning merge. The
    argmax is a 1-row collect (control plane); ties break (count desc,
    left asc, right asc) for cross-engine determinism."""
    symbols = to_symbols(word_freqs(docs, text_col=text_col))
    out: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        top: Optional[tuple] = (
            pair_counts(symbols)
            .orderBy(
                F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        out.append(
            (r, row["left_sym"], row["right_sym"], int(row["pair_count"]))
        )
        if r < rounds:
            symbols = apply_merge(symbols, row["left_sym"], row["right_sym"])
    return out


def encode_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = BPE_ROUNDS,
) -> DataFrame:
    """Apply the learned merges and audit compression per document.

    Encoding is VOCABULARY-bounded: merges are applied once per DISTINCT
    word (the same fold as training), then joined back onto the per-doc
    word occurrences — the corpus is never re-folded. Output one row per
    non-blank document: (doc_id, n_words, n_chars, n_tokens,
    compression) where compression = n_chars / n_tokens (chars per
    emitted symbol; rises as merges take effect)."""
    merges = train_merges(docs, text_col=text_col, rounds=rounds)
    symbols = to_symbols(word_freqs(docs, text_col=text_col))
    for _, left, right, _n in merges:
        symbols = apply_merge(symbols, left, right)
    vocab = symbols.select(
        "word", F.size("syms").cast("long").alias("_n_sym")
    )
    doc_words = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word"),
        )
        .filter(F.length("word") >= 1)
    )
    return (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("_n_sym").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_tokens",
            F.round(
                F.col("n_chars") / F.col("n_tokens").cast("double"), 6
            ).alias("compression"),
        )
    )
