"""BPE tokenizer-training queries over ``documents`` (batched rounds).

Spark side: worker_spark.operators.bpe — one corpus groupBy builds the
word-frequency table, then every merge round is vocab-bounded: pair
count, a bounded TakeOrdered candidate collect, greedy DISJOINT batch
selection (control plane), and one simultaneous fold merge per round.
Oracle side: the identical rounds replayed in DuckDB — pair counting
via UNNEST, the same (count desc, left asc, right asc) ranking, the
greedy disjoint scan as a recursive CTE over the ranked candidates, and
the batched left-to-right merge fold replayed as a recursive CTE per
word with a LEFT JOIN against the round's selected-pair set (at most
one pair can match a given (carry, next) because selected pairs are
disjoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from worker_spark.operators import bpe as B
from worker_spark.queries import register
from worker_spark.sources import load_table

_R, _BATCH, _CAP = B.BPE_ROUNDS, B.BPE_BATCH, B.BPE_SCAN_CAP

_WORDS = """
    words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                       AS word
            FROM documents WHERE length(trim(text)) > 0
        ) WHERE length(word) >= 1
        GROUP BY word
    ),
    syms0 AS MATERIALIZED (
        SELECT word, freq,
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, CAST(i AS INT), 1)) AS syms
        FROM words
    )
"""


def _pair_cte(n: int, src: str) -> str:
    return f"""
    pc{n} AS MATERIALIZED (
        SELECT syms[CAST(i AS INT)] AS left_sym,
               syms[CAST(i AS INT) + 1] AS right_sym,
               CAST(sum(freq) AS BIGINT) AS pair_count
        FROM {src}, UNNEST(range(1, len(syms))) t(i)
        GROUP BY 1, 2
    )
"""


def _sel_cte(n: int) -> str:
    """Ranked candidates -> recursive greedy disjoint scan -> the round's
    selected merge batch. Mirrors bpe.select_batch exactly: visit
    candidates in (count desc, left, right) order; keep a pair iff none
    of {left, right, left||right} is already used by a kept pair; stop
    at the batch size."""
    selectable = (
        f"(s.n_sel < {_BATCH}"
        " AND NOT list_contains(s.used, c.left_sym)"
        " AND NOT list_contains(s.used, c.right_sym)"
        " AND NOT list_contains(s.used, c.left_sym || c.right_sym))"
    )
    return f"""
    cand{n} AS MATERIALIZED (
        SELECT left_sym, right_sym, pair_count,
               CAST(row_number() OVER (
                   ORDER BY pair_count DESC, left_sym ASC, right_sym ASC
               ) AS BIGINT) AS rk
        FROM pc{n}
        ORDER BY pair_count DESC, left_sym ASC, right_sym ASC
        LIMIT {_CAP}
    ),
    scan{n} AS (
        SELECT CAST(0 AS BIGINT) AS rk, CAST([] AS VARCHAR[]) AS used,
               CAST(NULL AS VARCHAR) AS left_sym,
               CAST(NULL AS VARCHAR) AS right_sym,
               CAST(NULL AS BIGINT) AS pair_count,
               CAST(0 AS BIGINT) AS n_sel
        UNION ALL
        SELECT c.rk,
               CASE WHEN {selectable}
                    THEN list_concat(s.used, [c.left_sym, c.right_sym,
                                              c.left_sym || c.right_sym])
                    ELSE s.used END,
               CASE WHEN {selectable} THEN c.left_sym END,
               CASE WHEN {selectable} THEN c.right_sym END,
               CASE WHEN {selectable} THEN c.pair_count END,
               s.n_sel + CASE WHEN {selectable} THEN 1 ELSE 0 END
        FROM scan{n} s JOIN cand{n} c ON c.rk = s.rk + 1
    ),
    sel{n} AS MATERIALIZED (
        SELECT left_sym, right_sym, pair_count, n_sel AS merge_rank
        FROM scan{n} WHERE left_sym IS NOT NULL
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
                    WHEN m.left_sym IS NOT NULL THEN NULL
                    ELSE w.syms[w.i + 1] END,
               CASE WHEN w.carry IS NULL THEN w.out
                    WHEN m.left_sym IS NOT NULL
                        THEN list_append(w.out, m.left_sym || m.right_sym)
                    ELSE list_append(w.out, w.carry) END
        FROM walk{n} w LEFT JOIN sel{n} m
          ON m.left_sym = w.carry AND m.right_sym = w.syms[w.i + 1]
        WHERE w.i < len(w.syms)
    ),
    syms{n} AS MATERIALIZED (
        SELECT word, freq,
               CASE WHEN carry IS NULL THEN out
                    ELSE list_append(out, carry) END AS syms
        FROM walk{n} WHERE i = len(syms)
    )
"""


def _train_ctes(rounds: int) -> str:
    parts = [_WORDS]
    for n in range(1, rounds + 1):
        parts.append(_pair_cte(n, f"syms{n - 1}"))
        parts.append(_sel_cte(n))
        if n < rounds:
            parts.append(_merge_cte(n, f"syms{n - 1}"))
    return ",".join(parts)


_BPE_SQL = (
    "WITH RECURSIVE "
    + _train_ctes(_R)
    + "\n    UNION ALL\n".join(
        f"""
    SELECT CAST({n} AS INT) AS round, CAST(merge_rank AS INT) AS merge_rank,
           left_sym, right_sym, pair_count
    FROM sel{n}"""
        for n in range(1, _R + 1)
    )
)


@register(
    "bpe_train_merges",
    _BPE_SQL,
    doc=f"Distributed BPE tokenizer training, {_R} BATCHED merge rounds "
    f"(Sennrich'16; up to {_BATCH} disjoint merges per round, "
    f"{_R * _BATCH} total): ONE corpus groupBy builds the word-frequency "
    "table, then each round is vocab-bounded (adjacent-pair count "
    f"weighted by word freq, a {_CAP}-candidate TakeOrdered, greedy "
    "disjoint batch selection, one simultaneous fold merge applied "
    "map-only, localCheckpoint lineage cut). Batching bounds a 32k-merge "
    "vocabulary at ~vocab/batch Spark jobs instead of one job per merge. "
    "Oracle replays ranking, the greedy disjoint scan, and the batched "
    "fold as recursive CTEs; everything deterministic, engine-exact.",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = B.train_merges(docs)
    return spark.createDataFrame(
        merges,
        schema="round: int, merge_rank: int, left_sym: string, "
        "right_sym: string, pair_count: bigint",
    )


def _encode_ctes(rounds: int) -> str:
    parts = [_WORDS]
    for n in range(1, rounds + 1):
        parts.append(_pair_cte(n, f"syms{n - 1}"))
        parts.append(_sel_cte(n))
        parts.append(_merge_cte(n, f"syms{n - 1}"))
    return ",".join(parts)


_ENCODE_SQL = (
    "WITH RECURSIVE "
    + _encode_ctes(_R)
    + f""",
    vocab AS (
        SELECT word, CAST(len(syms) AS BIGINT) AS n_sym FROM syms{_R}
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
    doc=f"BPE ENCODE side: apply the {_R} learned merge BATCHES once per "
    "DISTINCT word (vocab-bounded folds), join the symbol counts back "
    "onto per-doc word occurrences, report chars/words/tokens and the "
    "compression ratio per document. Oracle re-derives the batches and "
    "replays every fold as recursive CTEs.",
)
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return B.encode_stats(docs)
