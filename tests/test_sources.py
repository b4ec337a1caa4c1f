"""Source-layer tests: S1 positional article-list parsing (goldens from
/root/reference/src/extraction.rs:780-810), S4/S5 envelope unwrapping,
S6 JDBC reader configuration, multimodal media plumbing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from worker_spark.operators.multimodal import (
    decode_stub,
    documents_as_media,
    extract_media_features,
    fake_decode,
)
from worker_spark.sources.article_list import (
    first_of_array,
    parse_article_list,
    read_article_list_json,
    unwrap_single_key_envelope,
)
from worker_spark.sources.jdbc import jdbc_options, jdbc_reader


def test_parse_article_list_goldens(spark):
    rows = [
        ("no", '[58083, "fjordsting", 2, "2026-04-30 14:55:59.171553"]'),
        ("no", "[12345]"),
        ("no", '{"article_id": 1}'),  # not an array -> dropped
        ("no", "[]"),  # empty array -> dropped (no id)
    ]
    df = spark.createDataFrame(rows, schema="dictionary: string, value: string")
    got = {r["article_id"]: r for r in parse_article_list(df).collect()}
    assert set(got) == {58083, 12345}
    full = got[58083]
    assert full["primary_lemma"] == "fjordsting"
    assert full["revision"] == 2
    assert full["updated_at"] == "2026-04-30 14:55:59.171553"
    bare = got[12345]
    assert bare["primary_lemma"] == ""
    assert bare["revision"] == 0
    assert bare["updated_at"] == ""


def test_read_article_list_file(spark, tmp_path):
    path = str(tmp_path / "article.json")
    with open(path, "w") as f:
        json.dump([[58083, "fjordsting", 2, "t"], [12345], "junk", {"a": 1}], f)
    got = read_article_list_json(spark, path, "nn")
    rows = {r["article_id"]: r["dictionary"] for r in got.collect()}
    assert rows == {58083: "nn", 12345: "nn"}


def test_envelope_unwrap(spark):
    df = spark.createDataFrame(
        [('{"42": {"place_name": "Vik"}}',), ('[{"code": "A"}, {"code": "B"}]',)],
        schema="value: string",
    )
    place = df.select(
        unwrap_single_key_envelope(
            F.from_json("value", "map<string, struct<place_name:string>>")
        ).alias("p")
    ).collect()[0]["p"]
    assert place and place["place_name"] == "Vik"
    first = df.select(
        first_of_array(F.from_json("value", "array<struct<code:string>>")).alias("f")
    ).collect()[1]["f"]
    assert first and first["code"] == "A"


def test_jdbc_reader_options(spark):
    opts = jdbc_options(
        url="jdbc:postgresql://db:5432/worker",
        table="articles",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=8,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "8"
    assert opts["fetchsize"] == "10000"
    # reader construction itself works without a database (.load() would need one)
    jdbc_reader(spark, url="jdbc:postgresql://db:5432/worker", table="articles")
    with pytest.raises(ValueError):
        jdbc_options("jdbc:x", "t", partition_column="id")


def test_multimodal_stub_and_fake(spark):
    docs = spark.createDataFrame(
        [(0, "abc", "en", "s", 3), (1, "defg", "en", "s", 4), (2, "hi", "en", "s", 2)],
        schema="doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
    )
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = {r["media_id"]: r for r in extract_media_features(media, fake_decode).collect()}
    assert feats[0]["media_type"] == "image" and feats[0]["width"] == 4  # 3 % 640 + 1
    assert feats[1]["media_type"] == "audio" and feats[1]["width"] is None
    assert feats[2]["media_type"] == "video" and feats[2]["n_frames"] == 3
    assert feats[0]["byte_checksum"] == (97 + 98 + 99) % 1_000_003

    with pytest.raises(NotImplementedError):
        decode_stub(b"x", "image")


def test_parse_article_list_malformed_id_dropped_under_ansi(spark):
    """Regression: a non-numeric id element must DROP the row, not abort
    the job under ANSI mode (try_cast, not cast)."""
    df = spark.createDataFrame(
        [("no", '["abc", "lemma"]'), ("no", '[7, "ok", "not-a-number"]')],
        schema="dictionary: string, value: string",
    )
    got = {r["article_id"]: r for r in parse_article_list(df).collect()}
    assert set(got) == {7}
    assert got[7]["revision"] == 0  # malformed revision defaults, row kept


def test_parse_article_list_json_type_parity(spark):
    """parse_article_list_entry parity (src/extraction.rs:160-181): the id
    must be a JSON *integer* (as_i64 — string "123" and float 1.5 drop the
    row); a string revision coerces to 0, not its numeric value; non-string
    lemma/updated_at become ''."""
    df = spark.createDataFrame(
        [
            ("no", '["123", "lemma"]'),  # string id -> dropped
            ("no", "[1.5]"),  # float id -> dropped
            ("no", '[9, "lem", "7", "t"]'),  # string revision -> 0
            ("no", "[10, 42, 3, 99]"),  # non-string lemma/updated -> ''
        ],
        schema="dictionary: string, value: string",
    )
    got = {r["article_id"]: r for r in parse_article_list(df).collect()}
    assert set(got) == {9, 10}
    assert got[9]["revision"] == 0
    assert got[10]["primary_lemma"] == "" and got[10]["updated_at"] == ""
    assert got[10]["revision"] == 3


def test_parse_articles_json_polymorphic_form(spark):
    """Raw JSON ingest: the string-or-object dialect form normalizes to the
    typed schema and the extraction layer sees identical results for both
    upstream shapes (src/extraction.rs:392-395)."""
    import json as _json

    from worker_spark import extraction as X
    from worker_spark import fixtures as FXX
    from worker_spark.schemas import ARTICLE_DATA
    from worker_spark.sources.articles_json import parse_articles_json

    raw_obj_form = {
        "body": {
            "dialect": [
                {
                    "subcats": [
                        {
                            "forms": [
                                {"form": "bare-form", "sources": [{"show": 1, "place_name": "A", "place_id": 1}]},
                                {"form": {"content": "obj-form"}, "sources": []},
                                {"form": {"weird": 1}, "sources": []},
                            ]
                        }
                    ]
                }
            ]
        }
    }
    rows = [
        ("no", 1, _json.dumps(raw_obj_form)),
        # the raw upstream encoding of the deep article carries the bare-
        # string form ("form": "jupor") instead of the normalized dual field
        ("no", 2, _json.dumps(FXX.DEEP_ARTICLE).replace(
            '"form": null, "form_content": "jupor"', '"form": "jupor"'
        )),
        ("no", 3, "not json at all"),
        ("no", 4, _json.dumps({})),
    ]
    raw = spark.createDataFrame(rows, "dictionary: string, id: bigint, data_json: string")
    typed = parse_articles_json(raw)
    assert typed.schema["data"].dataType == ARTICLE_DATA

    got = {
        r["id"]: r["forms"]
        for r in typed.select(
            "id", X.dialect_form_parts_col(F.col("data")).alias("forms")
        ).collect()
    }
    assert got[1] == ["bare-form", "obj-form"]  # weird-shape form dropped
    assert got[3] == [] and got[4] == []  # unparseable / empty -> defensive empties
    # end-to-end: full extraction over raw-JSON-ingested data matches the
    # typed-fixture golden for the deep article
    deep = typed.filter(F.col("id") == 2).select(
        X.definition_parts_col(F.col("data")).alias("defs"),
        X.all_bibl_ids_col(F.col("data")).alias("bibl"),
        X.dialect_form_parts_col(F.col("data")).alias("dforms"),
    ).collect()[0]
    assert deep["defs"] == ["eit djupt ord", "i overført tyding"]
    assert deep["bibl"] == [100, 200, 300, 301]
    assert deep["dforms"] == ["jupor"]  # bare-string upstream form survives


def test_jdbc_partitioned_read_roundtrip_derby(spark, tmp_path):
    """S6 against a REAL database: embedded Apache Derby (shipped on
    Spark's classpath). A testdata table is written over JDBC, read back
    through the partitioned reader, and must match row-for-row; the scan
    must be split into the requested range partitions with the filter
    pushed into the JDBC source, not applied post-scan."""
    from worker_spark.sources import load_table
    from worker_spark.sources.jdbc import jdbc_reader

    url = f"jdbc:derby:{tmp_path}/derby_db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation = load_table(spark, "/root/testdata/sf0.01", "nation")
    nation.write.jdbc(url, "nation", mode="overwrite", properties=props)

    back = jdbc_reader(
        spark,
        url=url,
        table="nation",
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=24,
        num_partitions=4,
        properties=props,
    ).load()
    assert back.rdd.getNumPartitions() == 4  # parallel range scans, not 1 pull

    src = {tuple(r) for r in nation.select("n_nationkey", "n_name", "n_regionkey").collect()}
    got = {tuple(r) for r in back.select("n_nationkey", "n_name", "n_regionkey").collect()}
    assert got == src

    plan = (
        back.filter(F.col("n_nationkey") < 10)
        .select("n_nationkey", "n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "JDBCRelation" in plan and "PushedFilters" in plan
    assert "LessThan(n_nationkey,10)" in plan.replace("N_NATIONKEY", "n_nationkey")


def test_rfc3986_encode_and_redaction_goldens(spark):
    """F8: the encoder must match the Rust urlencoding crate (RFC 3986
    unreserved set) — not Java's form encoding; F11: redaction keeps the
    reference's first-'@'-after-scheme quirk."""
    from worker_spark.functions.urls import redact_url_credentials_col, rfc3986_encode

    enc_cases = {
        "Fj.Skr III,42": "Fj.Skr%20III%2C42",
        "a*b~c+d": "a%2Ab~c%2Bd",
        "å": "%C3%A5",
        "x/y?z=1&w": "x%2Fy%3Fz%3D1%26w",
        "plain-safe_chars.09": "plain-safe_chars.09",
    }
    df = spark.createDataFrame([(k,) for k in enc_cases], "v: string")
    got = {r["v"]: r["e"] for r in df.select("v", rfc3986_encode("v").alias("e")).collect()}
    assert got == enc_cases

    red_cases = {
        "postgres://user:pw@host:5432/db": "postgres://***@host:5432/db",
        "postgres://host:5432/db": "postgres://host:5432/db",
        "host:5432": "host:5432",
        # reference quirk: first '@' ANYWHERE after the scheme wins
        "http://host/path@frag": "http://***@frag",
    }
    df2 = spark.createDataFrame([(k,) for k in red_cases], "u: string")
    got2 = {
        r["u"]: r["r"]
        for r in df2.select("u", redact_url_credentials_col(F.col("u")).alias("r")).collect()
    }
    assert got2 == red_cases


def test_multimodal_resize_and_frame_sample_stages(spark):
    """The two downstream media stages: resize keeps the aspect-ish
    integer scale math and bounds the longest side; frame sampling fans
    a video out to one DISTINCT binary per sampled frame whose stride
    slices partition the payload bytes exactly."""
    from worker_spark.operators.multimodal import (
        fake_frame_sample,
        fake_resize,
        resize_images,
        sample_frames,
    )

    big = "x" * 200  # image (doc_id 0): width 201, height (checksum%480)+1
    docs = spark.createDataFrame(
        [(0, big, "en", "s", len(big)), (2, "abcdefgh", "en", "s", 8)],
        schema="doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
    )
    media = documents_as_media(docs)

    rz = {
        r["media_id"]: r
        for r in resize_images(
            media, max_dim=64, decoder=fake_decode, resizer=fake_resize
        ).collect()
    }
    assert set(rz) == {0}  # images only
    r = rz[0]
    assert max(r["out_width"], r["out_height"]) <= 64
    assert r["out_width"] == r["width"] * 64 // max(r["width"], r["height"])
    assert r["out_n_bytes"] == min(200, r["out_width"] * r["out_height"])
    assert r["out_checksum"] == sum(big[: r["out_n_bytes"]].encode()) % 1_000_003

    fr = sample_frames(
        media, every_k=3, decoder=fake_decode, sampler=fake_frame_sample
    ).collect()
    assert {x["media_id"] for x in fr} == {2}  # videos only
    # doc 2: n=8 -> n_frames=9 -> sampled indices 0,3,6
    assert sorted(x["frame_index"] for x in fr) == [0, 3, 6]
    payload = b"abcdefgh"
    for x in fr:
        want = payload[x["frame_index"] :: 9]
        assert bytes(x["frame_payload"]) == want
        assert x["n_frame_bytes"] == len(want)
        assert x["frame_checksum"] == sum(want) % 1_000_003
    # every_k=1 partitions the payload bytes exactly across frames:
    # with n_frames=9 > len(payload)=8 each stride holds at most one
    # byte, so concatenating frames in index order reassembles the
    # payload byte-for-byte (content, not just a total byte count —
    # review finding: the count alone can't catch misplaced bytes)
    all_fr = sorted(
        sample_frames(
            media, every_k=1, decoder=fake_decode, sampler=fake_frame_sample
        ).collect(),
        key=lambda x: x["frame_index"],
    )
    assert b"".join(bytes(x["frame_payload"]) for x in all_fr) == payload
    assert sum(x["n_frame_bytes"] for x in all_fr) == len(payload)
    for x in all_fr:
        assert bytes(x["frame_payload"]) == payload[x["frame_index"] :: 9]


def test_documents_as_media_asserts_ascii_invariant(spark):
    """The byte/codepoint coupling between the fake codecs and their
    oracles is enforced at the adapter boundary (r11 advice): non-ASCII
    text must raise when the payload is materialized, not silently
    produce features whose width/checksum diverge from the oracle."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(0, "blåbær", "no", "s", 6)],
        schema="doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
    )
    with _pytest.raises(Exception, match="non-ASCII"):
        documents_as_media(docs).collect()
    # ASCII rows still flow through the guard untouched
    ok = spark.createDataFrame(
        [(0, "plain", "en", "s", 5)],
        schema="doc_id: bigint, text: string, lang: string, source: string, n_chars: bigint",
    )
    (row,) = documents_as_media(ok).collect()
    assert bytes(row["payload"]) == b"plain" and row["n_bytes"] == 5
