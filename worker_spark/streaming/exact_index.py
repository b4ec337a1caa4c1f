"""Incrementally-maintained EXACT dedup index (content-hash): the
fifth maintained index on the shared bucketed-state MERGE core, and
the one a 100 TB pipeline consults FIRST — exact dedup is the cheapest
pass, and production systems keep a content-hash index current rather
than re-hashing the corpus per ingest (the reference's add-or-replace
index sink discipline, src/indexing.rs:61-115 / src/storage.rs:118-167,
applied to a fingerprint table instead of search documents).

Two state tables, same layout contract as the SimHash/MinHash indexes:

* ``hashes`` (content_hash, doc_id) — bucketed by CONTENT_HASH, so a
  screening batch reads only the buckets its own hashes land in, and
  cluster serving groups within buckets (the groupBy key IS the bucket
  key — map-side partials never cross buckets for the heavy column);
* ``fps``    (doc_id, content_hash) — bucketed by DOC_ID; the manifest:
  an updated document's old hash row lives in the bucket of its OLD
  content hash, recoverable only from stored state.

Crash-order invariant (same argument as the other indexes): hashes
swap BEFORE fps, so a torn batch replays against the STALE manifest
and touches a superset of everywhere the document's hash rows can be.

Delete semantics: a batch document with empty/whitespace-only text has
no content — its rows are removed and nothing is re-inserted.

The payoff read side:

* ``dedup_clusters()`` == operators/dedup.exact_dedup over the corpus
  EXACTLY, served from maintained state with the corpus text never
  re-read and never re-hashed — which lets the registered streaming
  row reuse the batch dedup_exact oracle verbatim (one oracle, two
  rows — the family's established pattern, fifth instance);
* ``screen_batch(docs)`` — per-ingest exact-dup lookup: md5 the batch
  (map-only), read only the batch hashes' bucket FILES, one equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from worker_spark.plans.bucketed_state import BucketedParquetStateStore

HASHES_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)
FPS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
    ]
)


def _content_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, content_hash) with NULL hash for contentless docs —
    ONE definition shared by maintenance, screening and the tests
    (hash identical to operators/dedup.exact_dedup's md5(text))."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(
            F.length(F.trim(F.col(text_col))) > 0, F.md5(F.col(text_col))
        ).alias("content_hash"),
    )


class IncrementalExactIndex:
    """Content-hash state with per-batch bucket-scoped MERGE maintenance
    and cluster/screening read sides served without corpus text."""

    HASHES = "hashes"
    FPS = "fps"

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.store = BucketedParquetStateStore(spark, root, n_buckets)

    # --- maintenance ----------------------------------------------------

    def apply_batch(
        self,
        docs: DataFrame,
        batch_id: int | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        pre_reduced: bool = False,
        batch_ids: DataFrame | None = None,
        doc_buckets: list[int] | None = None,
    ) -> None:
        """The foreachBatch body: delete-then-insert the batch documents'
        hash rows (an updated document's content hash changes, so its
        row MOVES between hash buckets; a replayed batch rewrites
        identical rows) and refresh the per-doc manifest. Touched hash
        buckets = old-hash buckets ∪ new-hash buckets — exact and
        bounded, the old side recovered from the stored manifest.

        A batch carrying several versions of one doc_id is reduced to
        one row per key FIRST — last-wins (feed.last_wins); without it
        a document would keep BOTH versions' hash rows and serve as its
        own duplicate cluster.

        ``pre_reduced`` declares the caller already ran last_wins on
        ``docs`` (the composed dedup pipeline does) — the reduction is
        idempotent, so skipping the second pass changes nothing but the
        job count. ``batch_ids`` / ``doc_buckets`` likewise hand over
        the id frame / its bucket ids (same-modulus stores only) a
        composed caller already derived. Checkpoints are LAZY (r15
        job-count discipline): each is materialized by the touched-
        bucket collects below, which run before either table's swap."""
        from worker_spark.streaming.feed import last_wins

        store = self.store
        reduced = docs if pre_reduced else last_wins(docs, [id_col])
        new_fps = _content_hashes(
            reduced, id_col=id_col, text_col=text_col
        ).localCheckpoint(eager=False)
        if batch_ids is None:
            # batch_ids from the RAW batch: the key set is dedup-
            # invariant, and deriving it from the deduped frame would
            # run the agg twice
            batch_ids = (
                docs.select(F.col(id_col).cast("long").alias("doc_id"))
                .distinct()
                .localCheckpoint(eager=False)
            )

        if doc_buckets is None:
            doc_buckets = store.touched_buckets(batch_ids, "doc_id")
        old_fps = store.read(self.FPS, FPS_SCHEMA, buckets=doc_buckets)
        inserts = new_fps.filter(F.col("content_hash").isNotNull())
        old_b = (
            old_fps.join(batch_ids, "doc_id", "left_semi")
            .select(store.bucket_of(F.col("content_hash")).alias("b"))
        )
        new_b = inserts.select(
            store.bucket_of(F.col("content_hash")).alias("b")
        )
        touched_hash_buckets = sorted(
            r["b"] for r in old_b.unionByName(new_b).distinct().collect()
        )
        if not touched_hash_buckets:
            return  # nothing hashed and nothing to delete

        # hashes FIRST (crash-order invariant, module docstring)
        self.store.delete_then_insert(
            self.HASHES,
            delete_keys=batch_ids,
            inserts=inserts.select("content_hash", "doc_id"),
            schema=HASHES_SCHEMA,
            bucket_col="content_hash",
            delete_on="doc_id",
            touched=touched_hash_buckets,
        )
        self.store.delete_then_insert(
            self.FPS,
            delete_keys=batch_ids,
            inserts=inserts.select("doc_id", "content_hash"),
            schema=FPS_SCHEMA,
            bucket_col="doc_id",
            touched=doc_buckets,
            existing=old_fps,  # read above for the manifest; still valid —
            # only HASHES buckets were swapped since
        )

    def fsck(self) -> dict[str, int]:
        """Index-level consistency check (after surgery/migration):
        placement for both tables, then derivation — the hashes table
        must equal the column-swapped manifest EXACTLY (an orphan hash
        row clusters a document that no longer exists; a missing one
        hides a real duplicate). Raises on violation; returns checked
        row counts."""
        counts = {
            self.HASHES: self.store.verify_layout(self.HASHES),
            self.FPS: self.store.verify_layout(self.FPS),
        }
        want = self.fps().select("content_hash", "doc_id")
        got = self.hashes()
        drift = got.exceptAll(want).count() + want.exceptAll(got).count()
        if drift:
            raise RuntimeError(
                f"{self.store.root}: hashes drifted from the stored "
                f"manifest by {drift} rows — reseed or replay"
            )
        return counts

    def clone_rebucketed(
        self, new_root: str, n_buckets: int
    ) -> "IncrementalExactIndex":
        """Resize into a fresh root (blue/green re-shard). No manifest
        transform needed: neither table stores bucket ids in row data —
        the generic clone is already correct under a new modulus."""
        self.store.clone_rebucketed(new_root, n_buckets)
        return IncrementalExactIndex(self.spark, new_root)

    # --- read side --------------------------------------------------------

    def hashes(self, buckets: list[int] | None = None) -> DataFrame:
        return self.store.read(self.HASHES, HASHES_SCHEMA, buckets)

    def fps(self) -> DataFrame:
        return self.store.read(self.FPS, FPS_SCHEMA)

    def dedup_clusters(self) -> DataFrame:
        """Exact-dup clusters from the MAINTAINED state alone —
        (content_hash, canonical_id, n_dupes), min-id survivor — equal
        to operators/dedup.exact_dedup over the corpus, with the corpus
        text never read and never re-hashed. The groupBy key is the
        bucket key, so partials never cross buckets."""
        return self.hashes().groupBy("content_hash").agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )

    def screen_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Screen an ingest batch against the MAINTAINED index: map-only
        batch hashes, one equi-join reading ONLY the batch hashes'
        bucket files. Output (new_id, corpus_id, content_hash) — every
        stored document whose content equals a batch document's."""
        store = self.store
        qfps = (
            _content_hashes(docs, id_col=id_col, text_col=text_col)
            .filter(F.col("content_hash").isNotNull())
            # lazy: materialized by the probe collect just below
            .localCheckpoint(eager=False)
        )
        probe_buckets = store.touched_buckets(qfps, "content_hash")
        idx = self.hashes(buckets=probe_buckets)
        return (
            qfps.alias("a")
            .join(
                idx.alias("b"),
                F.col("a.content_hash") == F.col("b.content_hash"),
            )
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("new_id"),
                F.col("b.doc_id").alias("corpus_id"),
                F.col("a.content_hash").alias("content_hash"),
            )
        )


def exact_maintenance_stream(
    spark: SparkSession,
    docs_dir: str,
    index: IncrementalExactIndex,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
) -> StreamingQuery:
    """Wire a document directory as the change feed — the same
    foreachBatch shape as the other four incremental indexes."""
    from worker_spark.streaming.feed import file_feed_stream

    if schema is None:
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("text", T.StringType(), True),
            ]
        )
    return file_feed_stream(
        spark,
        docs_dir,
        lambda batch, bid: index.apply_batch(batch, batch_id=bid),
        checkpoint_dir,
        schema,
        "xidx",
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )
