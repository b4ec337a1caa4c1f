"""J1 — the list-vs-DB diff, the heart of incremental sync.

Reference semantics (/root/reference/src/sync_service.rs:104-163): the upstream
article *list* is full-outer-joined against stored state and every id is
classified:

* list-only                                  -> ``new`` (fetch)
* both, (revision, updated_at) differ, idle  -> ``changed`` (fetch)
* both, differ, but sync in flight           -> ``skip_inflight``
* both, (revision, updated_at) equal         -> ``unchanged``
* db-only, idle                              -> ``missing_recheck`` (deletion check)
* db-only, in flight                         -> ``missing_inflight``

``updated_at`` is compared for *equality only* (it stays a string — the
reference never orders on it, src/sync_service.rs:116).

Scale notes: the DB side at production scale is the big side (all stored
articles for a dictionary); the list side is also large. This is a pure
shuffle-on-key full-outer join — Catalyst picks sort-merge with both sides
hash-partitioned on the key; AQE handles skew. No driver-side state (the
reference loads the DB side into a HashMap — src/storage.rs:416-441 — which
caps it at driver memory; the Spark formulation removes that cap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CLASS_NEW = "new"
CLASS_CHANGED = "changed"
CLASS_SKIP_INFLIGHT = "skip_inflight"
CLASS_UNCHANGED = "unchanged"
CLASS_MISSING_RECHECK = "missing_recheck"
CLASS_MISSING_INFLIGHT = "missing_inflight"


def classify_list_db_diff(
    list_df: DataFrame,
    db_df: DataFrame,
    key: str = "article_id",
) -> DataFrame:
    """Full-outer diff classification.

    ``list_df``: (key, revision, updated_at) — upstream listing rows.
    ``db_df``:   (key, revision, updated_at, sync_status) — stored state.

    Returns (key, classification, list_revision, db_revision).
    """
    # explicit presence markers: inferring side-presence from nullable value
    # columns (revision/status) misclassifies rows whose values are NULL
    lst = list_df.select(
        F.col(key).alias("k"),
        F.col("revision").alias("l_rev"),
        F.col("updated_at").alias("l_upd"),
        F.lit(True).alias("l_present"),
    )
    db = db_df.select(
        F.col(key).alias("k"),
        F.col("revision").alias("d_rev"),
        F.col("updated_at").alias("d_upd"),
        F.col("sync_status").alias("d_status"),
        F.lit(True).alias("d_present"),
    )
    joined = lst.join(db, "k", "full_outer")

    in_list = F.col("l_present").isNotNull()
    in_db = F.col("d_present").isNotNull()
    idle = F.coalesce(F.col("d_status") == "idle", F.lit(False))
    # NULL-safe equality: a missing revision on either side is a difference
    # unless missing on both (reference compares Option<i64> == Option<i64>).
    same = F.col("l_rev").eqNullSafe(F.col("d_rev")) & F.col("l_upd").eqNullSafe(
        F.col("d_upd")
    )

    classification = (
        F.when(in_list & ~in_db, F.lit(CLASS_NEW))
        .when(in_list & in_db & same, F.lit(CLASS_UNCHANGED))
        .when(in_list & in_db & ~same & idle, F.lit(CLASS_CHANGED))
        .when(in_list & in_db & ~same & ~idle, F.lit(CLASS_SKIP_INFLIGHT))
        .when(~in_list & in_db & idle, F.lit(CLASS_MISSING_RECHECK))
        .otherwise(F.lit(CLASS_MISSING_INFLIGHT))
    )

    return joined.select(
        F.col("k").alias(key),
        classification.alias("classification"),
        F.col("l_rev").alias("list_revision"),
        F.col("d_rev").alias("db_revision"),
    )


def to_fetch(diff: DataFrame, key: str = "article_id") -> DataFrame:
    """Rows the sync must fetch (new + changed), the reference's
    ``to_fetch`` vector (src/sync_service.rs:165-178)."""
    return diff.filter(F.col("classification").isin(CLASS_NEW, CLASS_CHANGED)).select(
        key, "list_revision"
    )
