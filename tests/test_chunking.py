"""Content-defined chunking: tiling invariants, the shift-invariance
property that motivates CDC over fixed-width chunking, and duplicate-chunk
detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_spark.operators.chunking import (
    CDC_MAX_LEN,
    CDC_MIN_LEN,
    CDC_WINDOW,
    cdc_chunks,
    cdc_chunks_clamped,
    cdc_duplicate_chunks,
)


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id: bigint, text: string")


def test_chunks_tile_document_exactly(spark):
    text = "the quick brown fox jumps over the lazy dog " * 30
    df = _doc_df(spark, [(1, text)])
    chunks = cdc_chunks(df).orderBy("chunk_ix").collect()
    assert chunks[0]["chunk_start"] == 1
    pos = 1
    for c in chunks:
        assert c["chunk_start"] == pos
        assert c["chunk_len"] >= 1
        pos += c["chunk_len"]
    assert pos - 1 == len(text)  # chunks cover every char, no gaps/overlap


def test_short_and_empty_documents(spark):
    df = _doc_df(spark, [(1, "tiny"), (2, ""), (3, "x" * (CDC_WINDOW - 1))])
    got = {r["doc_id"]: r for r in cdc_chunks(df).collect()}
    assert set(got) == {1, 3}  # empty doc yields no chunks
    assert got[1]["chunk_len"] == 4 and got[1]["chunk_ix"] == 0
    assert got[3]["chunk_len"] == CDC_WINDOW - 1


def test_boundaries_shift_invariant_under_prefix_edit(spark):
    # THE CDC property: prepending text must not re-chunk the tail.
    # Fixed-width chunking shifts every boundary; content-defined
    # boundaries realign within one window of the edit.
    # varied (non-periodic) text so boundary hits occur at the ~1/64 rate;
    # a purely repeating phrase can dodge the divisor for its whole length
    base = " ".join(f"w{(i * 2654435761) % 9973:x}" for i in range(400))
    edited = "INSERTED PREFIX >>> " + base
    df = _doc_df(spark, [(1, base), (2, edited)])
    hashes = (
        cdc_chunks(df)
        .groupBy("doc_id")
        .agg(F.collect_set("chunk_hash").alias("hs"))
        .collect()
    )
    by_id = {r["doc_id"]: set(r["hs"]) for r in hashes}
    shared = by_id[1] & by_id[2]
    # all but the first chunk or two of the base doc reappear verbatim
    assert len(shared) >= max(2, len(by_id[1]) - 2)


def test_duplicate_chunk_detection(spark):
    boiler = "this boilerplate footer appears in every document of the crawl "
    df = _doc_df(
        spark,
        [
            (1, "unique text alpha alpha alpha " * 5 + boiler * 4),
            (2, "different beta beta content here " * 5 + boiler * 4),
            (3, "entirely unrelated gamma words only"),
        ],
    )
    dupes = cdc_duplicate_chunks(df).collect()
    assert len(dupes) >= 1  # the shared boilerplate surfaces
    assert all(r["n_docs"] >= 2 for r in dupes)


def test_clamped_chunks_respect_min_max_and_tile(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 30),
        (2, "aaaaaaaa" * 60),  # degenerate repeat: hash hits every/no pos
        (3, "zqj"),  # shorter than window
        (4, "mixed 123 content with-punct!? " * 25),
    ]
    df = _doc_df(spark, rows)
    chunks = cdc_chunks_clamped(df).orderBy("doc_id", "chunk_ix").collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    for doc_id, text in rows:
        cs = by_doc[doc_id]
        pos = 1
        for c in cs:
            assert c["chunk_start"] == pos
            pos += c["chunk_len"]
        assert pos - 1 == len(text)  # tiles exactly
        for c in cs:
            assert c["chunk_len"] <= CDC_MAX_LEN  # max clamp is hard
        for c in cs[:-1]:
            assert c["chunk_len"] >= CDC_MIN_LEN  # min clamp (final exempt)


def test_clamped_is_unclamped_where_sizes_already_conform(spark):
    # when every natural chunk already falls inside [MIN, MAX], the clamp
    # walk must be the identity
    text = "the quick brown fox jumps over the lazy dog " * 30
    df = _doc_df(spark, [(1, text)])
    plain = [
        (r["chunk_start"], r["chunk_len"])
        for r in cdc_chunks(df).orderBy("chunk_ix").collect()
    ]
    if all(CDC_MIN_LEN <= ln <= CDC_MAX_LEN for _, ln in plain[:-1]) and (
        plain[-1][1] <= CDC_MAX_LEN
    ):
        clamped = [
            (r["chunk_start"], r["chunk_len"])
            for r in cdc_chunks_clamped(df).orderBy("chunk_ix").collect()
        ]
        assert clamped == plain


def test_token_window_chunks_geometry_and_coverage(spark):
    from worker_spark.operators.chunking import token_window_chunks

    text_40 = " ".join(f"t{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, text_40), (2, "a b c"), (3, "   ")], "doc_id long, text string"
    )
    out = token_window_chunks(docs, window=16, stride=12).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # 40 tokens, window 16, stride 12 -> floor(24/12)+1 = 3 chunks
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in d1] == [0, 12, 24]
    assert [r["n_tokens"] for r in d1] == [16, 16, 16]
    # consecutive chunks overlap by window - stride = 4 tokens
    assert d1[0]["chunk_text"].split()[12:] == d1[1]["chunk_text"].split()[:4]
    # full coverage: the union of [start, start+n) spans 0..40
    covered = set()
    for r in d1:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(40))
    # short doc -> single (short) chunk; blank doc -> no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 3
    assert 3 not in by_doc


def test_token_window_chunks_rejects_gapped_stride(spark):
    import pytest as _pytest

    from worker_spark.operators.chunking import token_window_chunks

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        token_window_chunks(docs, window=8, stride=9)
    with _pytest.raises(ValueError):
        token_window_chunks(docs, window=8, stride=0)


def test_token_window_chunk_hash_is_exact_dedup_key(spark):
    from worker_spark.operators.chunking import token_window_chunks

    # two docs sharing an identical 64-token span aligned to the stride
    # grid produce the same chunk_hash for that window
    span = " ".join(f"s{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(1, span), (2, span + " tail1 tail2")], "doc_id long, text string"
    )
    out = token_window_chunks(docs, window=64, stride=64).collect()
    h1 = [r["chunk_hash"] for r in out if r["id"] == 1]
    h2 = [r["chunk_hash"] for r in out if r["id"] == 2 and r["chunk_idx"] == 0]
    assert h1 == h2


def test_token_window_chunks_cover_ragged_tail(spark):
    # T=120, window=64, stride=48: T-W=56 is NOT a stride multiple.
    # ceil gives 3 chunks (starts 0/48/96, last short); floor gave 2
    # and silently dropped tokens 112..119 (review finding)
    from worker_spark.operators.chunking import token_window_chunks

    text = " ".join(f"t{i}" for i in range(120))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        token_window_chunks(docs).collect(), key=lambda r: r["chunk_idx"]
    )
    assert [r["start_tok"] for r in out] == [0, 48, 96]
    assert [r["n_tokens"] for r in out] == [64, 64, 24]
    covered = set()
    for r in out:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(120))
