"""Deduplication queries over ``documents`` with DuckDB oracles.

The oracle SQL for MinHash/SimHash is *generated from the same constants*
as the Spark operators (worker_spark.operators.dedup) so the two engines
compute bit-identical integer hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from worker_spark.operators import dedup as D
from worker_spark.queries import register
from worker_spark.sources import load_table

_P = D.MERSENNE_P

# Shared CTEs: word-3-gram distinct shingles per doc (1-based list indexing).
_SHINGLES_CTE = """
    toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id)
"""


_EXACT_SQL = """
    SELECT md5(text)   AS content_hash,
           min(doc_id) AS canonical_id,
           count(*)    AS n_dupes
    FROM documents
    GROUP BY md5(text)
    """


def _on_dupes(oracle: str, exact: bool) -> str:
    """Re-source a documents-table dedup oracle onto the PLANTED-duplicate
    v2 corpus (groups of V2_DUP_GROUP consecutive ids share one base text;
    ``exact`` => identical members, else per-doc marker near-dups): the
    ONE table reference is rewritten to the docs2d CTE, THEN the corpus
    fragment is spliced in front — order matters, the fragment itself
    reads FROM documents. Loud count check as in _on_v2/r10."""
    from worker_spark.sources.synth_corpus import documents_v2_dupes_sql

    marker = "FROM documents"
    if oracle.count(marker) != 1:
        raise RuntimeError(
            f"_on_dupes: expected exactly one '{marker}' in the oracle, "
            f"found {oracle.count(marker)} — update the source rewrite"
        )
    body = oracle.replace(marker, "FROM docs2d")
    cte = documents_v2_dupes_sql("docs2d", exact=exact)
    stripped = body.lstrip()
    if stripped.startswith("WITH RECURSIVE"):
        # RECURSIVE modifies the whole WITH list; splice AFTER it (a
        # non-recursive corpus CTE is legal inside a RECURSIVE list)
        return body.replace("WITH RECURSIVE", f"WITH RECURSIVE {cte},", 1)
    if stripped.startswith("WITH"):
        return body.replace("WITH", f"WITH {cte},", 1)
    return f"WITH {cte}\n{body}"


@register(
    "dedup_exact",
    _EXACT_SQL,
    doc="Exact dedup: content-hash groupBy with min-id survivor.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact_v2",
    _on_dupes(_EXACT_SQL, exact=True),
    doc="Exact dedup over the PLANTED-duplicate v2 corpus (r11 twin, "
    "deferred from r10): groups of V2_DUP_GROUP consecutive doc_ids "
    "share one Zipf-ish base text, so the content-hash groupBy must "
    "recover exactly the planted clusters (n_dupes == group size, "
    "canonical == group-head id) — KNOWN structure instead of the v1 "
    "fixture's organic collisions. Same operator, same scale shape.",
)
def q_dedup_exact_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_dupes

    return D.exact_dedup(documents_v2_dupes(spark, sf_dir, exact=True))


_NGRAM_DF_CAP = 1000  # stop-shingle document-frequency cap (both engines)


_NGRAM_JACCARD_SQL = f"""
    WITH {_SHINGLES_CTE},
    keep AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {_NGRAM_DF_CAP}
    ),
    shc AS (
        SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)
    ),
    sizes_c AS (SELECT id, count(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_inter,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes_c sa ON sa.id = id_a
    JOIN sizes_c sb ON sb.id = id_b
    WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
    """


@register(
    "dedup_ngram_jaccard",
    _NGRAM_JACCARD_SQL,
    doc="Word-3-gram Jaccard near-dup pairs via shingle equi-join "
    "(no cross join); threshold 0.2. Shingles with document frequency "
    f"> {_NGRAM_DF_CAP} are dropped pre-join in BOTH engines (stop-shingle "
    "cap bounding the O(df^2) equi-join fan-out; jaccard is exact over the "
    "capped shingle universe).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.2,
        shingle_df_cap=_NGRAM_DF_CAP,
    )


@register(
    "dedup_ngram_jaccard_v2",
    _on_dupes(_NGRAM_JACCARD_SQL, exact=False),
    doc="Word-3-gram Jaccard near-dup pairs over the PLANTED near-dup v2 "
    "corpus (r11 twin): group members share every base shingle and "
    "differ only in the shingles touching their per-doc marker token, "
    "so jaccard ~ (n-2)/(n+2) >> 0.2 — the pair set must cover exactly "
    "the intra-group pairs, with KNOWN scores on a realistic Zipf "
    "vocabulary instead of v1's 31-token organic soup.",
)
def q_dedup_ngram_jaccard_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_dupes

    return D.ngram_jaccard_pairs(
        documents_v2_dupes(spark, sf_dir, exact=False),
        threshold=0.2,
        shingle_df_cap=_NGRAM_DF_CAP,
    )


def _cluster_chain() -> str:
    """Shared CTE chain: Jaccard pairs (same chain as dedup_ngram_jaccard)
    -> undirected edges -> recursive reachability -> comp/sized tables."""
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    keep AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {_NGRAM_DF_CAP}
    ),
    shc AS (
        SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)
    ),
    sizes_c AS (SELECT id, count(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes_c sa ON sa.id = id_a
        JOIN sizes_c sb ON sb.id = id_b
        WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
    ),
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach AS (
        SELECT id, id AS comp FROM verts
        UNION
        SELECT e.s AS id, r.comp FROM edges e JOIN reach r ON r.id = e.d
    ),
    comp AS (SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id),
    sized AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)"""


def _cluster_oracle() -> str:
    return (
        _cluster_chain()
        + """
    SELECT c.id AS doc_id, c.cluster_id, s.cluster_size,
           (c.id = c.cluster_id) AS is_survivor
    FROM comp c JOIN sized s USING (cluster_id)
    """
    )


@register(
    "dedup_cluster_components",
    _cluster_oracle(),
    doc="Near-dup CLUSTERS (not just pairs): distributed connected "
    "components (iterative min-label propagation, lineage-checkpointed) "
    "over the word-3-gram Jaccard pair graph; min-id survivor per cluster. "
    "Oracle replays the closure as a recursive CTE.",
)
def q_dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators import components as C

    pairs = D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.2,
        shingle_df_cap=_NGRAM_DF_CAP,
    )
    return C.cluster_assignments(pairs.select("id_a", "id_b"))


@register(
    "dedup_cluster_components_v2",
    _on_dupes(_cluster_oracle(), exact=False),
    doc="Near-dup CLUSTERS over the PLANTED near-dup v2 corpus (r11 "
    "twin, completing the lexical-dedup twin family): the Jaccard pair "
    "graph is exactly the intra-group pairs (planted-structure test), "
    "so min-label propagation must recover each planted group as one "
    "cluster with the group head as survivor — connected components "
    "verified against KNOWN ground truth instead of organic soup. Same "
    "checkpointed-lineage operator, same recursive-CTE oracle replay.",
)
def q_dedup_cluster_components_v2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from worker_spark.operators import components as C
    from worker_spark.sources.synth_corpus import documents_v2_dupes

    pairs = D.ngram_jaccard_pairs(
        documents_v2_dupes(spark, sf_dir, exact=False),
        threshold=0.2,
        shingle_df_cap=_NGRAM_DF_CAP,
    )
    return C.cluster_assignments(pairs.select("id_a", "id_b"))


def _minhash_cands_cte() -> str:
    """Shared WITH-body through LSH candidate pairs (sigs -> bands ->
    cands) — reused by the Jaccard verify and the edit-distance verify."""
    mins = ",\n               ".join(
        f"min(({D.MINHASH_A[i]} * y + {D.MINHASH_B[i]}) % {_P}) AS mh_{i}"
        for i in range(D.N_PERM)
    )
    band_rows = []
    for b in range(D.N_BANDS):
        cols = " || '-' || ".join(
            f"mh_{b * D.ROWS_PER_BAND + r}::VARCHAR" for r in range(D.ROWS_PER_BAND)
        )
        band_rows.append(f"SELECT id, {b} AS band, {cols} AS bucket FROM sigs")
    banded = "\n        UNION ALL\n        ".join(band_rows)
    return f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
        SELECT id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT % {_P} AS y FROM sh
    ),
    sigs AS (
        SELECT id,
               {mins}
        FROM hashed GROUP BY id
    ),
    banded AS (
        {banded}
    ),
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    )"""


def _minhash_oracle() -> str:
    return _minhash_cands_cte() + """,
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS n_inter
        FROM cands c
        JOIN sh sa ON sa.id = c.id_a
        JOIN sh sb ON sb.id = c.id_b AND sa.shingle = sb.shingle
        GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
    """


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    doc="MinHash(16 perms) + LSH(4x4 bands) candidate generation, exact "
    "Jaccard verify >= 0.5. Bucket equi-join only — scales to 100 TB "
    "without a pair cross join.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_dedup_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_minhash_lsh_v2",
    _on_dupes(_minhash_oracle(), exact=False),
    doc="MinHash(16)+LSH(4x4) with exact-Jaccard verify >= 0.5 over the "
    "PLANTED near-dup v2 corpus (r11 twin): intra-group jaccard "
    "~ (n-2)/(n+2) ~ 0.96, far above the banding s-curve's 0.5 "
    "midpoint, so LSH must surface every intra-group pair — planted "
    "recall is checkable, not just oracle-replayable. MinHash is the "
    "method a 100 TB corpus dedups with; this gives its registered row "
    "known ground truth on a realistic vocabulary.",
)
def q_dedup_minhash_lsh_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_dupes

    return D.minhash_lsh_dedup_pairs(
        documents_v2_dupes(spark, sf_dir, exact=False), threshold=0.5
    )


def _simhash_band_union(src: str) -> str:
    return "\n        UNION ALL\n        ".join(
        f"SELECT id, simhash, {k} AS band, "
        f"(simhash >> {D.SIMHASH_BAND_BITS * k}) & {D.SIMHASH_BAND_MASK} AS byte FROM {src}"
        for k in range(4)
    )


def _simhash_fps_chain() -> str:
    """CTE chain computing 48-bit fingerprints for every document — shared
    by the self-join and incremental (new-vs-corpus) oracles."""
    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{j}"
        for j in range(D.SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(D.SIMHASH_BITS)
    )
    return f"""{_SHINGLES_CTE},
    hashed AS (
        SELECT id, ('0x' || substr(md5(shingle), 1, {D.SIMHASH_BITS // 4}))::BIGINT AS x FROM sh
    ),
    sums AS (
        SELECT id,
               {bit_sums}
        FROM hashed GROUP BY id
    ),
    fps AS (
        SELECT id, CAST({fp} AS BIGINT) AS simhash FROM sums
    )"""


def _simhash_oracle() -> str:
    return f"""
    WITH {_simhash_fps_chain()},
    banded AS (
        {_simhash_band_union("fps")}
    ),
    pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.byte = b.byte AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """


@register(
    "dedup_simhash",
    _simhash_oracle(),
    doc="48-bit SimHash near-dup pairs, hamming <= 3, 12-bit-band pigeonhole "
    "candidate generation.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_dup_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "dedup_simhash_v2",
    _on_dupes(_simhash_oracle(), exact=False),
    doc="48-bit SimHash near-dup pairs (hamming <= 3, 12-bit-band "
    "pigeonhole) over the PLANTED near-dup v2 corpus (r11 twin): group "
    "members differ by a handful of marker-adjacent shingles, so their "
    "fingerprints sit within a few bits — the banded candidate path "
    "must recover the planted intra-group pairs on a realistic Zipf "
    "vocabulary.",
)
def q_dedup_simhash_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.sources.synth_corpus import documents_v2_dupes

    return D.simhash_near_dup_pairs(
        documents_v2_dupes(spark, sf_dir, exact=False), max_hamming=3
    )


def _simhash_incremental_oracle() -> str:
    return f"""
    WITH {_simhash_fps_chain()},
    fnew AS (SELECT * FROM fps WHERE id % 10 >= 8),
    fold AS (SELECT * FROM fps WHERE id % 10 < 8),
    bnew AS (
        {_simhash_band_union("fnew")}
    ),
    bold AS (
        {_simhash_band_union("fold")}
    ),
    pairs AS (
        SELECT DISTINCT a.id AS new_id, b.id AS corpus_id,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM bnew a JOIN bold b ON a.band = b.band AND a.byte = b.byte
    )
    SELECT new_id, corpus_id, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """


@register(
    "dedup_incremental",
    _simhash_incremental_oracle(),
    doc="Incremental dedup: SimHash near-dups between the NEW batch "
    "(doc_id % 10 >= 8) and the HISTORICAL corpus only — the per-ingest "
    "screening shape; at scale the corpus side is a banded fingerprint "
    "index table, never re-fingerprinted.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_incremental_pairs(
        docs, is_new=(F.col("doc_id") % 10 >= 8), max_hamming=3
    )


def _best_of_cluster_oracle() -> str:
    # quality formula identical to doc_quality_filter (queries/textops.py)
    from worker_spark.queries.textops import _EN, _TOKS

    return (
        _cluster_chain()
        + f""",
    scored AS (
        SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               len(list_filter({_TOKS}, t -> t IN ({_EN}))) AS sw,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               length(text) AS n_chars
        FROM documents
    ),
    quality AS (
        SELECT doc_id,
               round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                     + (1.0 - least(coalesce(CAST(n_punct AS DOUBLE) / nullif(n_chars, 0), 0) * 10.0, 1.0)) * 0.3
                     + (CASE WHEN coalesce(CAST(sw AS DOUBLE) / nullif(n_tokens, 0), 0)
                              BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.0 END) * 0.3, 6) AS quality_score
        FROM scored
    ),
    ranked AS (
        SELECT c.cluster_id, c.id AS doc_id, q.quality_score, s.cluster_size,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality_score DESC, c.id) AS rk
        FROM comp c
        JOIN sized s USING (cluster_id)
        JOIN quality q ON q.doc_id = c.id
    )
    SELECT cluster_id, doc_id AS best_doc_id, quality_score AS best_quality,
           cluster_size
    FROM ranked WHERE rk = 1
    """
    )


@register(
    "dedup_best_of_cluster",
    _best_of_cluster_oracle(),
    doc="Quality-aware survivor selection: within each near-dup cluster "
    "keep the highest-quality document (deterministic doc_id tie-break) — "
    "clusters from connected components composed with the heuristic "
    "quality scorer.",
)
def q_dedup_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from worker_spark.operators import components as C
    from worker_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=0.2, shingle_df_cap=_NGRAM_DF_CAP
    ).select("id_a", "id_b")
    clusters = C.cluster_assignments(pairs)
    quality = T.with_quality_score(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("best_doc_id"),
            F.col("quality_score").alias("best_quality"),
            "cluster_size",
        )
    )


def _translit_oracle() -> str:
    norm = D.translit_sql("text")
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex({norm}, '\\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    keep AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {_NGRAM_DF_CAP}
    ),
    shc AS (
        SELECT sh.id, sh.shingle FROM sh JOIN keep USING (shingle)
    ),
    sizes_c AS (SELECT id, count(*) AS n_sh FROM shc GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_inter,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard,
           da.lang AS lang_a, db.lang AS lang_b
    FROM inter
    JOIN sizes_c sa ON sa.id = id_a
    JOIN sizes_c sb ON sb.id = id_b
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
    """


@register(
    "dedup_translit_shingles",
    _translit_oracle(),
    doc="Cross-lingual / orthographic near-dup pairs: text is accent-folded "
    "to lowercase ASCII alphanumerics (shared translate map, identical in "
    "both engines) BEFORE shingling, so diacritic and orthography variants "
    "of the same content shingle identically. Same stop-shingle-capped "
    "equi-join shape as dedup_ngram_jaccard; pair langs attached to "
    "surface cross-lingual hits.",
)
def q_dedup_translit_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select("doc_id", D.translit_normalize(F.col("text")).alias("text"))
    pairs = D.ngram_jaccard_pairs(norm, threshold=0.2, shingle_df_cap=_NGRAM_DF_CAP)
    langs = docs.select("doc_id", "lang")
    return (
        pairs.join(
            langs.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")),
            "id_a",
        )
        .join(
            langs.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")),
            "id_b",
        )
        .select("id_a", "id_b", "n_inter", "jaccard", "lang_a", "lang_b")
    )


_SPAN_W = D.SPAN_W


@register(
    "dedup_substring_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    win AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos,
               md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')) AS wkey
        FROM toks, UNNEST(range(1, greatest(len(t) - {_SPAN_W} + 2, 1))) AS u(i)
    ),
    dup AS (SELECT wkey FROM win GROUP BY wkey HAVING count(*) >= 2),
    hits AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (wkey)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         > {_SPAN_W}
                    THEN 1 ELSE 0 END AS brk
        FROM hits
    ),
    grps AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM flagged
    )
    SELECT doc_id,
           CAST(min(pos) AS INT)                     AS span_start,
           CAST(max(pos) + {_SPAN_W - 1} AS INT)     AS span_end,
           CAST(max(pos) + {_SPAN_W} - min(pos) AS INT) AS span_tokens,
           count(*)                                  AS n_windows
    FROM grps GROUP BY doc_id, grp
    """,
    doc=f"Maximal duplicated token spans ({_SPAN_W}-token windows occurring "
    ">=2x corpus-wide, overlapping/adjacent windows merged per document via "
    "a lag/cum-sum island pass). The shuffle-bounded relational form of "
    "exact substring dedup (Lee et al. 2022) — window explode, digest "
    "groupBy, per-document island merge; all-integer, bit-exact oracle.",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.duplicate_substring_spans(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_edit_distance",
    _minhash_cands_cte()
    + f"""
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(substr(da.text, 1, {D.EDIT_VERIFY_MAX_CHARS}),
                            substr(db.text, 1, {D.EDIT_VERIFY_MAX_CHARS}))
                AS BIGINT) AS edit_distance,
           round(CAST(levenshtein(substr(da.text, 1, {D.EDIT_VERIFY_MAX_CHARS}),
                                  substr(db.text, 1, {D.EDIT_VERIFY_MAX_CHARS}))
                      AS DOUBLE)
                 / greatest(length(substr(da.text, 1, {D.EDIT_VERIFY_MAX_CHARS})),
                            length(substr(db.text, 1, {D.EDIT_VERIFY_MAX_CHARS}))),
                 6) AS rel_distance
    FROM cands c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    WHERE levenshtein(substr(da.text, 1, {D.EDIT_VERIFY_MAX_CHARS}),
                      substr(db.text, 1, {D.EDIT_VERIFY_MAX_CHARS})) * 100
          <= {D.EDIT_MAX_REL_PCT}
             * greatest(length(substr(da.text, 1, {D.EDIT_VERIFY_MAX_CHARS})),
                        length(substr(db.text, 1, {D.EDIT_VERIFY_MAX_CHARS})))
    """,
    doc=f"Fuzzy dedup with an edit-distance verify: MinHash/LSH banded "
    "candidates (equi-join, no pair blowup), levenshtein kept at "
    f"<= {D.EDIT_MAX_REL_PCT}% of the longer text. Per-pair cost is "
    f"bounded: texts prefix-truncate to {D.EDIT_VERIFY_MAX_CHARS} chars "
    "and the Spark DP is threshold-banded (cannot change the kept set — "
    "the global threshold dominates every per-pair cut). Sequence-aware "
    "verification that penalizes reordering Jaccard forgives; integer "
    "distance + integer keep predicate = bit-identical across engines.",
)
def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.edit_distance_near_dups(load_table(spark, sf_dir, "documents"))


def _pagerank_oracle() -> str:
    from worker_spark.operators import components as C

    s, it = C.PR_SCALE, C.PR_ITERS
    ctes = [
        _cluster_chain(),  # unreferenced closure CTEs are never evaluated
        f""",
    edges2 AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b AS s, id_a AS d FROM pairs
    ),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS degree FROM edges2 GROUP BY s),
    r0 AS (SELECT s AS node, degree, CAST({s} AS BIGINT) AS rank_int FROM deg)""",
    ]
    for k in range(1, it + 1):
        ctes.append(f""",
    c{k} AS (
        SELECT e.d AS node,
               CAST(sum(r.rank_int // r.degree) AS BIGINT) AS inflow
        FROM edges2 e JOIN r{k - 1} r ON r.node = e.s
        GROUP BY e.d
    ),
    r{k} AS (
        SELECT b.node, b.degree,
               (15 * CAST({s} AS BIGINT)
                + {C.PR_DAMP_NUM} * coalesce(c.inflow, 0))
                   // {C.PR_DAMP_DEN} AS rank_int
        FROM r0 b LEFT JOIN c{k} c USING (node)
    )""")
    ctes.append(f"""
    SELECT node AS doc_id, degree, rank_int FROM r{it}
    """)
    return "".join(ctes)


@register(
    "dedup_pagerank_centrality",
    _pagerank_oracle(),
    doc="Iterative PageRank centrality over the near-dup pair graph in "
    "EXACT integer arithmetic (integer-micros ranks, floor-division "
    "contributions, rational damping) — every iteration replays "
    "bit-identically in the oracle. Highest-rank nodes are the "
    "best-connected duplicates: an alternative canonical-doc criterion "
    "to quality argmax. Same slim equi-join + groupBy shape per round "
    "as connected components; lineage checkpointed per iteration.",
)
def q_dedup_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_spark.operators import components as C

    pairs = D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.2,
        shingle_df_cap=_NGRAM_DF_CAP,
    )
    return C.pagerank_centrality(pairs.select("id_a", "id_b"))
