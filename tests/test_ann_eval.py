"""ANN recall-vs-cost harness (VERDICT r4 item 5): the numbers users pick
a strategy by, pinned as floors. All measurements are deterministic
(medoid seeds, fixed hyperplanes, hash-rank everything), so these floors
are stable for a fixed testdata generation; they carry slack against the
driver regenerating testdata with a different seed."""

from __future__ import annotations

from tests.conftest import SF_ORACLE
from worker_spark.operators.ann_eval import evaluate_ann, markdown_table


def test_ann_recall_floors_and_cost_shape(spark):
    rows = {r["method"]: r for r in evaluate_ann(spark, SF_ORACLE)}

    # brute force is the 1.0-recall / 1.0-scan anchor by construction
    assert rows["brute_cosine"]["recall_at_k"] == 1.0
    assert rows["brute_cosine"]["scan_frac"] == 1.0

    # IVF: high recall at a bounded probed fraction (sf0.01: 0.98 @ 0.37)
    assert rows["ivf"]["recall_at_k"] >= 0.9
    assert rows["ivf"]["scan_frac"] < 0.5

    # int8 full-scan: cheap integer scoring, near-exact ranking (0.88)
    assert rows["int8_quantized"]["recall_at_k"] >= 0.7
    assert rows["int8_quantized"]["exact_pairs"] == 0

    # multi-probe on the same 8x6 tables must dominate multitable's
    # recall (the no-extra-storage probe lever; sf0.1: 0.325 -> 0.885)
    assert (
        rows["lsh_multiprobe"]["recall_at_k"]
        > rows["lsh_multitable"]["recall_at_k"]
    )
    assert (
        rows["lsh_multiprobe"]["cand_pairs"]
        > rows["lsh_multitable"]["cand_pairs"]
    )

    # binary sign quantization: the 1-bit coarse scan + exact rerank
    # lands between pure-code ranking and the PQ refine ladder; the
    # shortlist is the recall knob (sf0.1: 0.64 @ 5% -> 0.86 @ 15%)
    b100 = rows["binary_hamming_refined_100"]
    b300 = rows["binary_hamming_refined_300"]
    assert b100["recall_at_k"] >= 0.5
    assert b300["recall_at_k"] >= b100["recall_at_k"]
    assert b100["exact_pairs"] < b300["exact_pairs"]

    # IVF-PQ residual: at sf0.1 it beats plain PQ-ADC outright (0.46 vs
    # 0.40) while scoring only probed-cell codes; at this sf0.01 scale
    # (5 cells, nprobe 2 -> 40% of the corpus reachable) the cell
    # restriction costs ~0.02 recall against the residual gain, so the
    # floor here is near-parity AT A FRACTION of the candidates — the
    # cost column is the sf0.01-visible win
    assert (
        rows["ivfpq_residual"]["recall_at_k"]
        >= rows["pq_adc"]["recall_at_k"] - 0.05
    )
    assert rows["ivfpq_residual"]["cand_pairs"] < rows["pq_adc"]["cand_pairs"]
    assert rows["ivfpq_residual"]["exact_pairs"] == 0
    # the refined residual shortlist must dominate the non-residual
    # refine at the same exact depth (sf0.1: 0.955 vs 0.875)
    assert (
        rows["ivfpq_refined_100"]["recall_at_k"]
        >= rows["pq_adc_refined_100"]["recall_at_k"]
    )

    # refine ladder: recall grows with shortlist depth; the 40% shortlist
    # clears the 0.95 production floor (sf0.01: 0.86 @ 20% -> 0.98 @ 40%)
    r100 = rows["pq_adc_refined_100"]
    r200 = rows["pq_adc_refined_200"]
    assert r100["recall_at_k"] >= 0.8
    assert r200["recall_at_k"] >= 0.95
    assert r200["recall_at_k"] >= r100["recall_at_k"]
    assert r100["scan_frac"] < r200["scan_frac"] < 0.5

    # k-means-trained codebooks beat medoid codebooks at equal cost
    assert (
        rows["pq_kmeans"]["recall_at_k"] >= rows["pq_adc"]["recall_at_k"]
    )

    # multi-table LSH recovers what the single 12-bit signature cannot
    assert (
        rows["lsh_multitable"]["recall_at_k"]
        > rows["lsh_single"]["recall_at_k"]
    )
    # LSH candidate volume is a small fraction of the corpus — the point
    assert rows["lsh_multitable"]["scan_frac"] < 0.3

    # graph ANN: high recall at the lowest exact-scan fraction of any
    # exact-scoring method (sf0.01: 0.98 @ 0.14; sf0.1: 0.975 @ 0.051 —
    # per-query cost is corpus-size independent, so the fraction falls
    # further as N grows)
    assert rows["graph_ann"]["recall_at_k"] >= 0.9
    assert rows["graph_ann"]["scan_frac"] < 0.2

    # hybrid RRF: the scale-safe Hamming semantic arm must recover
    # nearly all of the brute-arm fused list (VERDICT r5 item 2) while
    # exact-scoring only the shortlist (at sf0.01 N=500 the 300-deep
    # shortlist is 60% of the corpus; the fraction falls as 1/N)
    hb = rows["hybrid_rrf_brute"]
    hh = rows["hybrid_rrf_hamming_300"]
    assert hb["recall_at_k"] == 1.0  # anchor by construction
    assert hh["recall_at_k"] >= 0.9
    assert hh["exact_pairs"] < hb["exact_pairs"]

    # documents_v2 twin rows (r8): same fused guarantees on the
    # realistic corpus with the stop-pruned lexical arm
    hb2 = rows["hybrid_rrf_v2_brute"]
    hh2 = rows["hybrid_rrf_v2_hamming_300"]
    assert hb2["recall_at_k"] == 1.0
    assert hh2["recall_at_k"] >= 0.9
    assert hh2["exact_pairs"] < hb2["exact_pairs"]

    # contrastive hard negatives (r12, VERDICT r11 item 2): the exact
    # row is the 1.0 anchor; the blocked binary-code scan (the arm the
    # registered v2 row runs) must clear a production recall floor at a
    # bounded exact-scan fraction AND decisively beat the IVF probe arm
    # on this weakly-clustered corpus — the measurement that justified
    # choosing the code scan over the locality arms (at sf0.01 N=500
    # the 300 shortlist is ~60% of the corpus; the fraction falls as
    # 1/N — 15% at sf0.1, see ANN_EVAL.md)
    cex = rows["contrastive_exact"]
    ch3 = rows["contrastive_hamming_300"]
    ch2 = rows["contrastive_hamming_200"]
    civ = rows["contrastive_ivf_nprobe2"]
    assert cex["recall_at_k"] == 1.0 and cex["scan_frac"] == 1.0
    assert ch3["recall_at_k"] >= 0.9
    assert ch3["recall_at_k"] >= ch2["recall_at_k"]
    assert ch2["exact_pairs"] < ch3["exact_pairs"] < cex["exact_pairs"]
    assert ch3["recall_at_k"] > civ["recall_at_k"]

    # the table renders (tools/ann_eval.py commits it as ANN_EVAL.md)
    md = markdown_table(list(rows.values()))
    assert md.count("\n") == len(rows) + 1
