"""Distributed connected components over near-duplicate pair edges.

The dedup operators (worker_spark.operators.dedup) emit PAIRS; production
corpus cleaning needs per-document CLUSTER ids so one survivor per cluster
can be kept (reference keeps single-survivor semantics per content hash in
its exact path; near-dup clustering is the LLM-data-pipeline extension the
brief asks for — no reference counterpart file).

Algorithm: iterative min-label propagation. Every vertex starts labelled
with its own id; each round replaces a vertex's label with the minimum of
its own and its neighbours' labels; fixpoint = connected components, with
the component id being the minimum doc id in the component (deterministic,
oracle-friendly).

Scale notes (100 TB corpus):
* The vertex/edge set is the DUPLICATE PAIR graph, orders of magnitude
  smaller than the corpus — LSH banding bounds pair counts, so the join
  below shuffles megabytes even when the corpus is 100 TB.
* Each round is one equi-join (edges x labels, shuffle keyed on vertex id)
  plus one groupBy — no cross join, no driver-side adjacency.
* Rounds needed = cluster diameter. Near-dup clusters from LSH/Jaccard
  thresholds are near-cliques (diameter 2-3), so the loop terminates in a
  handful of rounds; the early-exit check stops as soon as a round changes
  nothing. For adversarially chained graphs (diameter O(n)) swap the body
  for alternating large-star/small-star (Kiveris et al., "Connected
  Components in MapReduce and Beyond", 2014) — same join shape per round,
  O(log^2 n) rounds; not needed for dedup graphs.
* ``localCheckpoint`` after every round truncates lineage so the plan does
  not grow with iteration count (the classic iterative-join trap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label each vertex of the undirected ``edges`` graph with the minimum
    vertex id reachable from it. Returns ``(id, component)``.

    Vertices are exactly the ids appearing in ``edges`` — callers decide
    whether singleton documents (no duplicate partner) join the output.
    """
    # materialize the (possibly expensive) upstream pair plan ONCE — the
    # symmetric union below scans its input twice, and each loop round
    # re-scans the edge list
    ed = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint()
    sym = (
        ed.union(ed.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["d"] == labels["id"])
            .groupBy(sym["s"].alias("nid"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = (
            labels.alias("l")
            .join(nbr_min.alias("n"), F.col("l.id") == F.col("n.nid"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("n.nbr_min"), F.col("l.comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("n.nbr_min"), F.col("l.comp")) < F.col("l.comp")
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        converged = stepped.filter(F.col("chg")).limit(1).count() == 0
        labels = stepped.drop("chg")
        if converged:
            break
    return labels.select("id", F.col("comp").alias("component"))


def cluster_assignments(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate clusters from a pair list: per-document cluster id,
    cluster size, and the min-id survivor flag.

    Output: ``(doc_id, cluster_id, cluster_size, is_survivor)`` — one row
    per document that has at least one duplicate partner.
    """
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    sizes = comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count("*").alias("cluster_size")
    )
    return (
        comp.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
        )
        .join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
        )
    )
