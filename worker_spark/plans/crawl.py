"""E7 + §3.2 — recursive entity crawl as an iterative join-until-fixpoint.

Reference semantics: a fetched place's ``child_places`` are enqueued and
fetched recursively (/root/reference/src/sync_service.rs:924-935,
src/extraction.rs:533-538); related articles discovered in a stored
article crawl the same way (src/storage.rs:229-232).

Spark formulation: classic BFS over a DataFrame edge relation —

    frontier_{0} = seed ids
    frontier_{i+1} = children(frontier_i) LEFT ANTI JOIN visited

Each round is one equi-join + anti-join (no driver-side edge state); the
loop terminates when the frontier is empty or ``max_depth`` is reached
(the guard the reference lacks — its recursion is bounded only by the
data). At cluster scale each round shuffles only the frontier, and
``localCheckpoint`` truncates the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def child_place_ids_col(entry: Column) -> Column:
    """E7: child_places[].place_id set from a place API entry
    (src/extraction.rs:533-538)."""
    children = F.coalesce(entry["child_places"], F.array())
    return F.array_distinct(
        F.transform(
            F.filter(children, lambda c: c["place_id"].isNotNull()),
            lambda c: c["place_id"],
        )
    )


def crawl_closure(
    seeds: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    child_col: str = "child_id",
    max_depth: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Transitive closure from ``seeds`` over ``edges``: returns
    (id, depth) — every reachable id with its first-discovery depth.

    ``seeds``: one column ``id_col``. ``edges``: (parent_col, child_col).
    """
    visited = seeds.select(F.col(id_col).alias("id")).distinct().withColumn(
        "depth", F.lit(0)
    )
    frontier = visited.select("id")
    for depth in range(1, max_depth + 1):
        children = (
            frontier.join(edges, frontier["id"] == edges[parent_col], "inner")
            .select(F.col(child_col).alias("id"))
            .distinct()
        )
        new = children.join(visited.select("id"), "id", "left_anti").withColumn(
            "depth", F.lit(depth)
        )
        if new.isEmpty():
            break
        visited = visited.unionByName(new)
        frontier = new.select("id")
        if depth % checkpoint_every == 0:
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    return visited


def place_child_edges(places_raw: DataFrame) -> DataFrame:
    """Edge relation from raw place entries carrying child_places arrays:
    (parent_id, child_id)."""
    return places_raw.select(
        F.col("id").alias("parent_id"),
        F.explode(child_place_ids_col(F.col("entry"))).alias("child_id"),
    ).distinct()
