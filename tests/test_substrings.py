"""Winnowing substring dedup: the detection guarantee (every verbatim
repeat >= W+K-1 chars shares a fingerprint), fingerprint shift-invariance,
span assembly, and the zero-filled report."""

from __future__ import annotations

import random
import string

from worker_spark.operators.substrings import (
    WIN_GAP,
    WIN_K,
    WIN_W,
    substring_dedup_report,
    substring_dup_spans,
    winnow_fingerprints,
)

GUARANTEE = WIN_W + WIN_K - 1


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id: bigint, text: string")


def _rand_text(rng, n):
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def test_shared_substring_detected_at_different_offsets(spark):
    rng = random.Random(7)
    shared = "the licensed boilerplate passage that repeats verbatim everywhere"
    assert len(shared) >= GUARANTEE
    a = _rand_text(rng, 80) + shared + _rand_text(rng, 40)
    b = _rand_text(rng, 23) + shared + _rand_text(rng, 95)
    df = _doc_df(spark, [(1, a), (2, b)])
    spans = substring_dup_spans(df).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # both docs report a duplicated span overlapping the planted substring
    for doc_id, start in ((1, 81), (2, 24)):
        end = start + len(shared) - 1
        assert any(
            r["span_start"] <= end and r["span_end"] >= start
            for r in by_doc.get(doc_id, [])
        ), f"doc {doc_id}: planted repeat not covered by {by_doc.get(doc_id)}"


def test_fingerprints_shift_invariant(spark):
    rng = random.Random(11)
    core = _rand_text(rng, 120)
    # same content at offset 0 and offset 37: interior fingerprints match
    df = _doc_df(spark, [(1, core), (2, _rand_text(rng, 37) + core)])
    fps = winnow_fingerprints(df).collect()
    h1 = {r["fhash"] for r in fps if r["doc_id"] == 1}
    h2 = {r["fhash"] for r in fps if r["doc_id"] == 2}
    # everything selected strictly inside doc 1 past the first window must
    # reappear in doc 2 (winnowing selection is locally determined)
    interior = {
        r["fhash"]
        for r in fps
        if r["doc_id"] == 1 and r["pos"] > WIN_W + WIN_K
    }
    assert interior, "no interior fingerprints selected"
    assert interior <= h2, f"missing from shifted doc: {interior - h2}"
    # and the shared-core overlap dominates both fingerprint sets
    assert len(h1 & h2) >= len(interior)


def test_unique_docs_report_zero_coverage(spark):
    rng = random.Random(13)
    # three documents over disjoint alphabets cannot share any K-gram
    rows = [
        (1, "".join(rng.choice("abcdefg") for _ in range(200))),
        (2, "".join(rng.choice("hijklmn") for _ in range(200))),
        (3, "".join(rng.choice("opqrstu") for _ in range(200))),
    ]
    rep = {r["doc_id"]: r for r in substring_dedup_report(_doc_df(spark, rows)).collect()}
    assert set(rep) == {1, 2, 3}
    for r in rep.values():
        assert r["n_dup_spans"] == 0
        assert r["dup_chars"] == 0
        assert r["dup_frac"] == 0.0


def test_within_document_repeat_detected_and_merged(spark):
    rng = random.Random(17)
    chunk = "a long enough repeated sentence inside one single document!"
    assert len(chunk) >= GUARANTEE
    text = chunk + _rand_text(rng, 150) + chunk
    spans = substring_dup_spans(_doc_df(spark, [(1, text)])).collect()
    assert spans, "within-document repeat missed"
    # the two occurrences are > WIN_GAP apart, so they stay separate spans
    assert len(spans) == 2
    starts = sorted(r["span_start"] for r in spans)
    assert starts[1] - starts[0] > WIN_GAP


def test_fingerprint_density_near_expected(spark):
    rng = random.Random(19)
    text = _rand_text(rng, 4000)
    n = winnow_fingerprints(_doc_df(spark, [(1, text)])).count()
    m = len(text) - WIN_K + 1
    expected = 2.0 * m / (WIN_W + 1)
    # winnowing density concentrates tightly around 2/(W+1)
    assert 0.5 * expected <= n <= 1.8 * expected


def test_cut_removes_spans_and_preserves_clean_docs(spark):
    import hashlib
    import random

    from worker_spark.operators.substrings import substring_dedup_cut

    rng = random.Random(23)
    shared = "this exact passage is repeated verbatim across two documents"
    a = _rand_text(rng, 70) + shared + _rand_text(rng, 30)
    b = _rand_text(rng, 15) + shared + _rand_text(rng, 55)
    clean = "".join(rng.choice("0123456789") for _ in range(150))
    df = _doc_df(spark, [(1, a), (2, b), (3, clean)])
    got = {r["doc_id"]: r for r in substring_dedup_cut(df).collect()}
    # duplicated docs lose at least the shared passage's span
    for d, orig in ((1, a), (2, b)):
        assert got[d]["orig_len"] == len(orig)
        assert got[d]["cut_chars"] >= len(shared) - 2 * (WIN_K - 1)
        assert got[d]["cleaned_len"] == len(orig) - got[d]["cut_chars"]
    # the clean doc passes through bit-identically
    assert got[3]["cut_chars"] == 0
    assert got[3]["cleaned_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_polynomial_hash_cross_engine_on_bmp_unicode(spark):
    """Differential parity guard for the polynomial k-gram hash: random
    BMP text (incl. Norwegian å/ø/æ — the reference's domain — accents
    and CJK) must select IDENTICAL winnowing fingerprints in Spark and
    DuckDB. Guards the Spark-ascii-vs-DuckDB-ord equivalence the hash
    depends on (identical for the Basic Multilingual Plane)."""
    import random

    import duckdb
    import pandas as pd

    from worker_spark.operators.substrings import winnow_fingerprints
    from worker_spark.queries.substrq import _SPAN_CTE

    rng = random.Random(4242)
    alphabet = "abc åøæéüß 汉字語 xyz"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(30, 200))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, schema="doc_id: bigint, text: string")
    got = {
        (r["doc_id"], r["pos"], r["fhash"])
        for r in winnow_fingerprints(df).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        tuple(r)
        for r in con.execute(
            _SPAN_CTE + " SELECT doc_id, pos, fhash FROM fps"
        ).fetchall()
    }
    assert got == want
