"""Incrementally-maintained IVF vector index: the ANN family's
end-to-end incremental path, the exact streaming sibling of the
inverted-index maintenance in streaming/retrieval_index.py.

The reference maintains its search index incrementally from a change
feed (S8 delete-then-insert link replace, src/storage.rs:205-237; S9
batch index sink, src/indexing.rs:61-115); production vector search has
the same shape — centroids are trained offline, and the serving index
is kept current by assigning ARRIVING vectors to cells, never by
rebuilding. This module composes that dataflow from the same parts the
inverted index uses:

* ``cells``   (vec_id, cell_id, embedding) — the IVF lists, one row per
  indexed vector, hash-bucketed by CELL_ID so a query reads only its
  probed cells' bucket files (the postings-by-term trick applied to
  vectors);
* ``vecmap``  (vec_id, cell_bucket) — per-vector manifest of the CELLS
  bucket its row lives in, hash-bucketed by VEC_ID (the batch's natural
  key for replace/delete).

Why the manifest: an UPDATED vector can move to a different cell, so
its old row lives in a bucket that is — by definition — absent from the
new assignment's bucket set; touched = old-manifest ∪ new-assignment
buckets is exact and bounded (the identical argument to the dropped-term
manifest in retrieval_index.py). Crash-order invariant mirrors it too:
cells swap BEFORE vecmap, so a replay after a torn batch still visits a
superset of everywhere the vector's rows can be.

Centroids are PINNED at index creation (stored in the state root):
incremental maintenance can only converge to the batch build if every
batch assigns against the same centroid set — exactly how production
IVF deployments behave (codebooks retrain offline; assignment is
online). With the pinned medoid rule the streamed state provably equals
``similarity.ivf_assign`` over the union corpus, and ``ann_topk``
equals ``similarity.ivf_ann_neighbors`` bit-for-bit (same 6dp cosine
rounding, same tie-breaks) — which is what lets the registered
streaming query reuse the batch IVF oracle.

Scale shape: a micro-batch rewrites O(batch + touched buckets), never
the full index; a query reads ~nprobe/K of the corpus AND only the
probed cells' bucket FILES (inputFiles-level pruning, plan-asserted in
tests). Deletes: a batch row with an empty embedding removes the vector
(its old cell row and manifest row are deleted, nothing re-inserted).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from worker_spark.operators.similarity import _dot, _norm, ivf_assign
from worker_spark.plans.bucketed_state import BucketedParquetStateStore

CELLS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)
VECMAP_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        # manifest: the cells bucket this vector's row occupies
        T.StructField("cell_bucket", T.IntegerType(), False),
    ]
)
CENTROIDS_SCHEMA = T.StructType(
    [
        T.StructField("cent_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


class IncrementalVectorIndex:
    """IVF cell lists + per-vector manifest with per-batch bucket-scoped
    MERGE maintenance, and an ANN scorer over the maintained state."""

    CELLS = "cells"
    VECMAP = "vecmap"
    CENTROIDS = "centroids"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        centroids: DataFrame | None = None,
        n_buckets: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.store = BucketedParquetStateStore(spark, root, n_buckets)
        self.id_col = id_col
        self.vec_col = vec_col
        if self.store.exists(self.CENTROIDS):
            if centroids is not None:
                raise ValueError(
                    f"{root}: centroids are already pinned for this index "
                    "root — incremental assignment only converges against "
                    "ONE centroid set; build a fresh root to retrain"
                )
        else:
            if centroids is None:
                raise ValueError(
                    f"{root}: a new index needs its centroid set (train "
                    "offline / pick medoids, then pin here)"
                )
            self.store.write(
                self.CENTROIDS,
                centroids.select(
                    F.col(id_col).cast("long").alias("cent_id"),
                    F.col(vec_col).alias("embedding"),
                ),
                keys=["cent_id"],
            )

    # --- maintenance ----------------------------------------------------

    def centroids(self) -> DataFrame:
        return self.store.read(self.CENTROIDS, CENTROIDS_SCHEMA)

    def apply_batch(self, vectors: DataFrame, batch_id: int | None = None) -> None:
        """The foreachBatch body: delete-then-insert the batch vectors'
        cell rows (an updated vector replaces its assignment, possibly
        in a different cell; a replayed batch rewrites identical rows —
        replays are no-ops) and refresh the manifest. An empty-embedding
        row is a delete. Only the buckets named by the batch's manifest
        are read or rewritten."""
        store = self.store
        batch = vectors.select(
            F.col(self.id_col).cast("long").alias("vec_id"),
            F.col(self.vec_col).alias("embedding"),
        )
        live = batch.filter(F.size("embedding") > 0)
        cents = self.centroids().select(
            F.col("cent_id").alias("vec_id"), "embedding"
        )
        assign = (
            ivf_assign(live, cents)
            .join(live, "vec_id")
            .select("vec_id", "cell_id", "embedding")
            .localCheckpoint(eager=True)
        )
        batch_ids = (
            batch.select("vec_id").distinct().localCheckpoint(eager=True)
        )

        # touched cells buckets = old manifest (pruned vecmap read by the
        # batch's own vec buckets) UNION the new assignments' buckets
        vec_buckets = store.touched_buckets(batch_ids, "vec_id")
        old_map = store.read(self.VECMAP, VECMAP_SCHEMA, buckets=vec_buckets)
        old_cb = old_map.join(batch_ids, "vec_id", "left_semi").select(
            F.col("cell_bucket").alias("b")
        )
        new_cb = assign.select(store.bucket_of(F.col("cell_id")).alias("b"))
        touched_cell_buckets = sorted(
            r["b"] for r in old_cb.unionByName(new_cb).distinct().collect()
        )
        if not touched_cell_buckets:
            return  # nothing indexed and nothing to delete

        # cells FIRST (crash-order invariant, module docstring)
        store.delete_then_insert(
            self.CELLS,
            delete_keys=batch_ids,
            inserts=assign,
            schema=CELLS_SCHEMA,
            bucket_col="cell_id",
            delete_on="vec_id",
            touched=touched_cell_buckets,
        )
        new_map = assign.select(
            "vec_id",
            store.bucket_of(F.col("cell_id")).cast("int").alias("cell_bucket"),
        )
        store.delete_then_insert(
            self.VECMAP,
            delete_keys=batch_ids,
            inserts=new_map,
            schema=VECMAP_SCHEMA,
            bucket_col="vec_id",
            touched=vec_buckets,
            existing=old_map,  # read above for the manifest; still valid —
            # only CELLS buckets were swapped since
        )

    # --- read side --------------------------------------------------------

    def cells(self, buckets: list[int] | None = None) -> DataFrame:
        return self.store.read(self.CELLS, CELLS_SCHEMA, buckets)

    def ann_topk(
        self,
        queries: DataFrame,
        nprobe: int = 2,
        top_k: int = 5,
    ) -> DataFrame:
        """IVF ANN over the MAINTAINED state: probe each query's nprobe
        nearest pinned centroids, read ONLY the probed cells' bucket
        files, exact cosine inside them — bit-identical semantics to
        similarity.ivf_ann_neighbors against the same centroid set
        (same 6dp rounding, same tie-breaks), which is the equality the
        registered streaming query's oracle relies on."""
        from pyspark.sql import Window

        store = self.store
        c = self.centroids().select(
            "cent_id",
            F.col("embedding").alias("cent_vec"),
            _norm(F.col("embedding")).alias("cent_norm"),
        )
        q = queries.select(
            F.col(self.id_col).cast("long").alias("q_id"),
            F.col(self.vec_col).alias("q_vec"),
            _norm(F.col(self.vec_col)).alias("q_norm"),
        )
        q_scored = q.crossJoin(F.broadcast(c)).select(
            "q_id",
            "cent_id",
            F.round(
                F.try_divide(
                    _dot(F.col("q_vec"), F.col("cent_vec")),
                    F.col("q_norm") * F.col("cent_norm"),
                ),
                6,
            ).alias("_sim"),
        )
        wp = Window.partitionBy("q_id").orderBy(
            F.desc_nulls_last("_sim"), F.asc("cent_id")
        )
        probes = (
            q_scored.withColumn("_rn", F.row_number().over(wp))
            .filter(F.col("_rn") <= nprobe)
            .select("q_id", F.col("cent_id").alias("cell_id"))
            # materialize once: touched_buckets collects over this plan
            # and the candidate join consumes it again — without the
            # checkpoint the q x K probe scoring runs twice (review
            # finding; screen_batch set the pattern)
            .localCheckpoint(eager=True)
        )
        probed_buckets = store.touched_buckets(probes, "cell_id")
        cand = (
            self.cells(buckets=probed_buckets)
            .join(probes, "cell_id")
            .filter(F.col("q_id") != F.col("vec_id"))
            .select(
                "q_id",
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_vec"),
                _norm(F.col("embedding")).alias("c_norm"),
            )
        )
        sims = cand.join(F.broadcast(q), "q_id").select(
            "q_id",
            "c_id",
            F.round(
                F.try_divide(
                    _dot(F.col("q_vec"), F.col("c_vec")),
                    F.col("q_norm") * F.col("c_norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
        wk = Window.partitionBy("q_id").orderBy(
            F.desc_nulls_last("cos_sim"), F.asc("c_id")
        )
        return (
            sims.withColumn("rnk", F.row_number().over(wk))
            .filter(F.col("rnk") <= top_k)
            .select(
                "q_id", "c_id", "cos_sim", F.col("rnk").cast("int").alias("rnk")
            )
        )


def vector_maintenance_stream(
    spark: SparkSession,
    vectors_dir: str,
    index: IncrementalVectorIndex,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
) -> StreamingQuery:
    """Wire a vector directory as the change feed: each new parquet file
    under ``vectors_dir`` is a batch of added/updated/deleted vectors,
    MERGEd into the index by apply_batch (the same foreachBatch shape
    as index_maintenance_stream)."""
    from worker_spark.streaming.feed import file_feed_stream

    if schema is None:
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType(), True),
                T.StructField(
                    "embedding", T.ArrayType(T.FloatType()), True
                ),
            ]
        )
    return file_feed_stream(
        spark,
        vectors_dir,
        lambda batch, bid: index.apply_batch(batch, batch_id=bid),
        checkpoint_dir,
        schema,
        "vidx",
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
    )
