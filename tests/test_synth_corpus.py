"""Planted-duplicate v2 corpus (sources/synth_corpus.documents_v2_dupes
— round-10 groundwork for the r11 lexical-dedup v2 twins): the derived
corpus must be byte-identical across engines (every future registered
row's hash-checkability rests on that), and the dedup operators must
recover exactly the planted cluster structure."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from worker_spark.sources.synth_corpus import (
    V2_DUP_GROUP,
    documents_v2_dupes,
    documents_v2_dupes_sql,
)


def _duck_rows(sql: str):
    sys.path.insert(0, "tests")
    from tests.oracle_harness import run_oracle

    pdf = run_oracle(sql, SF_ORACLE)
    return sorted(map(tuple, pdf.itertuples(index=False)))


def test_dupes_corpus_is_cross_engine_byte_identical(spark):
    for exact in (False, True):
        got = sorted(
            tuple(r)
            for r in documents_v2_dupes(
                spark, SF_ORACLE, exact=exact
            ).collect()
        )
        want = _duck_rows(
            f"WITH {documents_v2_dupes_sql(exact=exact)} "
            "SELECT doc_id, text FROM docs2d"
        )
        assert got == want, f"exact={exact}: engine texts diverge"


def test_exact_variant_plants_exact_dup_clusters(spark):
    """Group members share ONE text: exact_dedup must find exactly the
    groups with >= 2 members, min-id canonical, correct sizes."""
    from worker_spark.operators.dedup import exact_dedup

    corpus = documents_v2_dupes(spark, SF_ORACLE, exact=True)
    groups = {
        r["g"]: (r["lo"], r["n"])
        for r in corpus.select(
            F.expr(f"(doc_id div {V2_DUP_GROUP}) * {V2_DUP_GROUP}").alias(
                "g"
            ),
            "doc_id",
        )
        .groupBy("g")
        .agg(F.min("doc_id").alias("lo"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        (r["canonical_id"], r["n_dupes"])
        for r in exact_dedup(corpus).filter(F.col("n_dupes") > 1).collect()
    }
    want = {(lo, n) for lo, n in groups.values() if n > 1}
    assert got == want


def test_marker_variant_plants_near_dup_clusters(spark):
    """Members differ only by the trailing marker token: every
    intra-group pair must verify as a MinHash near-dup, and no
    cross-group pair may reach the threshold (v2 base texts are
    independent Zipf draws; organic minhash precision on v2 measured
    1.0 in DEDUP_EVAL)."""
    from worker_spark.operators.dedup import minhash_lsh_dedup_pairs

    corpus = documents_v2_dupes(spark, SF_ORACLE, exact=False)
    ids = [r["doc_id"] for r in corpus.select("doc_id").collect()]
    by_group: dict[int, list[int]] = {}
    for i in ids:
        by_group.setdefault((i // V2_DUP_GROUP) * V2_DUP_GROUP, []).append(i)
    planted = {
        (a, b)
        for members in by_group.values()
        for ai, a in enumerate(sorted(members))
        for b in sorted(members)[ai + 1 :]
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup_pairs(corpus, threshold=0.5).collect()
    }
    # every pair found is a planted intra-group pair...
    assert got <= planted
    # ...and recall over the planted pairs clears the 4x4-banding
    # s-curve floor (members share all base shingles; only the two
    # marker-adjacent shingles differ, so true jaccard is ~0.9+ and the
    # overwhelming majority of pairs must band-collide and verify)
    assert len(got) >= 0.9 * len(planted), (len(got), len(planted))


def test_marker_variant_recovered_by_simhash_and_jaccard(spark):
    """The other two registered lexical near-dup twins (r11) recover the
    planted structure too: the exact shingle equi-join finds EVERY
    intra-group pair (no probabilistic banding to miss one), SimHash's
    pigeonhole banding clears a high recall floor, and neither admits a
    cross-group pair (independent Zipf base texts)."""
    from worker_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )

    corpus = documents_v2_dupes(spark, SF_ORACLE, exact=False)
    ids = [r["doc_id"] for r in corpus.select("doc_id").collect()]
    by_group: dict[int, list[int]] = {}
    for i in ids:
        by_group.setdefault((i // V2_DUP_GROUP) * V2_DUP_GROUP, []).append(i)
    planted = {
        (a, b)
        for members in by_group.values()
        for ai, a in enumerate(sorted(members))
        for b in sorted(members)[ai + 1 :]
    }

    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            corpus, threshold=0.2, shingle_df_cap=1000
        ).collect()
    }
    assert jac == planted, (
        len(jac - planted),
        len(planted - jac),
    )

    sim = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_pairs(corpus, max_hamming=3).collect()
    }
    assert sim <= planted
    # hamming <= 3 on a 48-bit fingerprint is a TIGHTER test than the
    # jaccard threshold: the marker token rewrites 2 shingles, and on
    # short docs that can flip > 3 bits — measured recall 0.852 at
    # sf0.001, so the floor pins "recovers the large majority" without
    # overclaiming what a 48-bit sketch can do
    assert len(sim) >= 0.8 * len(planted), (len(sim), len(planted))

def test_lang_corpus_is_cross_engine_byte_identical_and_learnable(spark):
    """The language-bearing corpus (r11): byte-identical across engines
    (the lang-id/quality twins' hash-checkability rests on it), roughly
    balanced across the three planted languages, and the stopword-vote
    detector must EARN a high-but-imperfect accuracy against the real
    cross-language vocabulary overlap (measured 0.928 at this SF — a
    perfect score would mean the ambiguity was rigged away)."""
    from worker_spark.operators.text import with_lang_id
    from worker_spark.sources.synth_corpus import (
        documents_v2_lang,
        documents_v2_lang_sql,
    )

    corpus = documents_v2_lang(spark, SF_ORACLE)
    got = sorted(tuple(r) for r in corpus.collect())
    want = _duck_rows(
        f"WITH {documents_v2_lang_sql()} "
        "SELECT doc_id, true_lang, text FROM docs2l"
    )
    assert got == want, "engine texts diverge"

    by_lang = {
        r["true_lang"]: r["n"]
        for r in corpus.groupBy("true_lang").agg(F.count("*").alias("n")).collect()
    }
    n = sum(by_lang.values())
    assert set(by_lang) == {"en", "es", "fr"}
    assert all(v > 0.2 * n for v in by_lang.values()), by_lang

    pred = with_lang_id(corpus)
    acc = (
        pred.filter(F.col("pred_lang") == F.col("true_lang")).count() / n
    )
    assert 0.85 <= acc < 1.0, acc


def test_colloc_corpus_plants_recoverable_phrases(spark):
    """The positional-correlation corpus (r11): byte-identical across
    engines, and collocation mining must rank ONLY planted phrase halves
    at the top — lift separates the bound pairs (~450) from the
    independence null (~1) by two orders of magnitude."""
    from worker_spark.operators.retrieval import bigram_collocations
    from worker_spark.sources.synth_corpus import (
        documents_v2_colloc,
        documents_v2_colloc_sql,
    )

    corpus = documents_v2_colloc(spark, SF_ORACLE)
    got = sorted(tuple(r) for r in corpus.collect())
    want = _duck_rows(
        f"WITH {documents_v2_colloc_sql()} SELECT doc_id, text FROM docs2c"
    )
    assert got == want, "engine texts diverge"

    top = bigram_collocations(corpus).collect()
    assert len(top) == 25
    for r in top:
        k = r["left_tok"]
        assert k.startswith("p") and k.endswith("a"), r
        assert r["right_tok"] == k[:-1] + "b", r
        assert r["lift"] > 100, r


def test_marker_variant_clusters_recover_planted_groups(spark):
    """Connected components over the planted pair graph must recover
    each planted group as exactly one cluster with the group head as
    survivor (the registered dedup_cluster_components_v2 contract)."""
    from worker_spark.operators.components import cluster_assignments
    from worker_spark.operators.dedup import ngram_jaccard_pairs

    corpus = documents_v2_dupes(spark, SF_ORACLE, exact=False)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.2, shingle_df_cap=1000)
    got = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_survivor"])
        for r in cluster_assignments(
            pairs.select("id_a", "id_b")
        ).collect()
    }
    ids = [r["doc_id"] for r in corpus.select("doc_id").collect()]
    by_group: dict[int, list[int]] = {}
    for i in ids:
        by_group.setdefault((i // V2_DUP_GROUP) * V2_DUP_GROUP, []).append(i)
    want = {
        (d, min(members), len(members), d == min(members))
        for members in by_group.values()
        if len(members) > 1
        for d in members
    }
    assert got == want


def test_substr_corpus_block_region_is_recovered_in_every_member(spark):
    """The shared-substring corpus (r11): byte-identical across engines,
    and winnowing must cover (at least) the planted block region in
    EVERY group member — the 27-char guarantee means at most the two
    block edges (< 27 chars each) can escape — while total coverage
    stays well below 1.0 (the prefix/suffix streams are independent, so
    the detection is earned, not degenerate)."""
    from worker_spark.operators.substrings import substring_dedup_report
    from worker_spark.sources.synth_corpus import (
        V2_SUBSTR_BLK,
        _stream_text_expr,
        documents_v2_substr,
        documents_v2_substr_sql,
    )

    corpus = documents_v2_substr(spark, SF_ORACLE)
    got = sorted(tuple(r) for r in corpus.collect())
    want = _duck_rows(
        f"WITH {documents_v2_substr_sql()} SELECT doc_id, text FROM docs2s"
    )
    assert got == want, "engine texts diverge"

    heads = (
        corpus.select(
            F.expr(f"(doc_id div {V2_DUP_GROUP}) * {V2_DUP_GROUP}").alias(
                "doc_id"
            )
        )
        .distinct()
        .select("doc_id", _stream_text_expr(*V2_SUBSTR_BLK).alias("blk"))
    )
    blk_len = {r["doc_id"]: len(r["blk"]) for r in heads.collect()}
    rows = substring_dedup_report(corpus).collect()
    for r in rows:
        head = (r["doc_id"] // V2_DUP_GROUP) * V2_DUP_GROUP
        floor = blk_len[head] - 26  # 27-char guarantee at both edges
        assert r["dup_chars"] >= floor, (r["doc_id"], r["dup_chars"], floor)
        assert r["dup_frac"] < 0.9, r  # not degenerate-everything
