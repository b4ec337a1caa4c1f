"""BPE tokenizer-training query over ``documents``.

Spark side: worker_spark.operators.bpe — one corpus groupBy builds the
word-frequency table, then every merge round is vocab-bounded (pair
count + 1-row argmax + greedy fold merge). Oracle side: the identical
three rounds replayed in DuckDB — pair counting via UNNEST, the same
(count desc, left asc, right asc) tie-break, and the greedy
left-to-right merge fold replayed as a recursive CTE per word (the
NOTES.md order-sensitive-ops-CAN-be-oracled technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators import bpe as B
from worker_spark.queries import register
from worker_spark.sources import load_table

_WORDS = """
    words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                       AS word
            FROM documents WHERE length(trim(text)) > 0
        ) WHERE length(word) >= 1
        GROUP BY word
    ),
    syms0 AS (
        SELECT word, freq,
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, CAST(i AS INT), 1)) AS syms
        FROM words
    )
"""


def _pair_cte(n: int, src: str) -> str:
    return f"""
    pc{n} AS (
        SELECT syms[CAST(i AS INT)] AS left_sym,
               syms[CAST(i AS INT) + 1] AS right_sym,
               CAST(sum(freq) AS BIGINT) AS pair_count
        FROM {src}, UNNEST(range(1, len(syms))) t(i)
        GROUP BY 1, 2
    ),
    m{n} AS (
        SELECT left_sym, right_sym, pair_count FROM pc{n}
        ORDER BY pair_count DESC, left_sym ASC, right_sym ASC LIMIT 1
    )
"""


def _merge_cte(n: int, src: str) -> str:
    return f"""
    walk{n} AS (
        SELECT s.word, s.freq, s.syms, 0 AS i,
               CAST(NULL AS VARCHAR) AS carry, CAST([] AS VARCHAR[]) AS out
        FROM {src} s
        UNION ALL
        SELECT w.word, w.freq, w.syms, w.i + 1,
               CASE WHEN w.carry IS NULL THEN w.syms[w.i + 1]
                    WHEN w.carry = m.left_sym
                         AND w.syms[w.i + 1] = m.right_sym THEN NULL
                    ELSE w.syms[w.i + 1] END,
               CASE WHEN w.carry IS NULL THEN w.out
                    WHEN w.carry = m.left_sym
                         AND w.syms[w.i + 1] = m.right_sym
                        THEN list_append(w.out, m.left_sym || m.right_sym)
                    ELSE list_append(w.out, w.carry) END
        FROM walk{n} w, m{n} m WHERE w.i < len(w.syms)
    ),
    syms{n} AS (
        SELECT word, freq,
               CASE WHEN carry IS NULL THEN out
                    ELSE list_append(out, carry) END AS syms
        FROM walk{n} WHERE i = len(syms)
    )
"""


_BPE_SQL = (
    "WITH RECURSIVE "
    + _WORDS
    + ","
    + _pair_cte(1, "syms0")
    + ","
    + _merge_cte(1, "syms0")
    + ","
    + _pair_cte(2, "syms1")
    + ","
    + _merge_cte(2, "syms1")
    + ","
    + _pair_cte(3, "syms2")
    + """
    SELECT CAST(1 AS INT) AS round, left_sym, right_sym, pair_count FROM m1
    UNION ALL
    SELECT CAST(2 AS INT), left_sym, right_sym, pair_count FROM m2
    UNION ALL
    SELECT CAST(3 AS INT), left_sym, right_sym, pair_count FROM m3
    """
)


@register(
    "bpe_train_merges",
    _BPE_SQL,
    doc="Distributed BPE tokenizer training, first 3 merge rounds "
    "(Sennrich'16): ONE corpus groupBy builds the word-frequency table, "
    "then each round is vocab-bounded (adjacent-pair count weighted by "
    "word freq, deterministic argmax, greedy left-to-right fold merge "
    "as a map-only aggregate HOF). Oracle replays the fold as a "
    "recursive CTE; ties break (count desc, left, right) so the learned "
    "merges are engine-exact.",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = B.train_merges(docs, rounds=3)
    return spark.createDataFrame(
        merges,
        schema="round: int, left_sym: string, right_sym: string, "
        "pair_count: bigint",
    )


_ENCODE_SQL = (
    "WITH RECURSIVE "
    + _WORDS
    + ","
    + _pair_cte(1, "syms0")
    + ","
    + _merge_cte(1, "syms0")
    + ","
    + _pair_cte(2, "syms1")
    + ","
    + _merge_cte(2, "syms1")
    + ","
    + _pair_cte(3, "syms2")
    + ","
    + _merge_cte(3, "syms2")
    + """,
    vocab AS (
        SELECT word, CAST(len(syms) AS BIGINT) AS n_sym FROM syms3
    ),
    doc_words AS (
        SELECT doc_id, word FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+'))
                       AS word
            FROM documents WHERE length(trim(text)) > 0
        ) WHERE length(word) >= 1
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
           CAST(sum(v.n_sym) AS BIGINT) AS n_tokens,
           round(CAST(sum(length(d.word)) AS BIGINT)
                 / CAST(CAST(sum(v.n_sym) AS BIGINT) AS DOUBLE), 6)
               AS compression
    FROM doc_words d JOIN vocab v USING (word)
    GROUP BY d.doc_id
    """
)


@register(
    "bpe_encode_stats",
    _ENCODE_SQL,
    doc="BPE ENCODE side: apply the 3 learned merges once per DISTINCT "
    "word (vocab-bounded fold), join the symbol counts back onto per-doc "
    "word occurrences, report chars/words/tokens and the compression "
    "ratio per document. Oracle re-derives the merges and replays all "
    "three folds as recursive CTEs.",
)
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return B.encode_stats(docs)
