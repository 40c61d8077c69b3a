"""Connected components over a near-duplicate pair graph — the
transitive-closure canonicalization step of a dedup pass (SURVEY §2C).

The single-pass canonicalizers (``dedup_embedding_cosine``,
``minhash_dedup``) assign each doc the smallest id it *directly*
duplicates; chains A~B~C where A and C don't match directly leave two
clusters. This operator closes the transitivity gap: every node in a
connected component maps to the component's minimum id — the standard
"cluster then keep one per cluster" semantics of large-scale dedup
(e.g. the MinHash-cluster step in web-scale corpus pipelines).

Algorithm: iterated min-label propagation (the simplified large-star
operation). Each round, every node's label becomes the minimum label in
its closed neighborhood; converges in O(diameter) rounds, and near-dup
graphs are overwhelmingly small-diameter clusters (pairs/triples), so
2-4 rounds close real corpora. Each round is ONE shuffle pair
(join on src + min-aggregate on node); the edge list is persisted once
and reused across rounds; convergence is detected by comparing label
sums — a 1-row action per round, not a collect of labels.

At 100 TB: rounds are bounded (``max_iter``), every step is an
equi-join/agg on (node, label) longs — no driver-side graph, no
cartesian anything. For adversarially-deep chains swap in the
large-star/small-star alternation (same join shapes, provably
O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the pair list, where
    ``component`` is the minimum node id reachable through the pairs.
    Pairs are undirected; self-loops and duplicates are tolerated."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    # start: each node labels itself. Every round ends in an EAGER
    # localCheckpoint: iterative DataFrame algorithms otherwise stack
    # each round's join onto the previous round's plan, and Catalyst
    # analysis cost grows superlinearly with rounds (measured: a 12-round
    # chain took minutes un-truncated, seconds truncated). On a cluster
    # use checkpoint() against the checkpoint dir for fault tolerance.
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iter):
        # propagate: each node takes min(own label, neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        # convergence probe: labels only ever decrease, so an unchanged
        # sum means a fixpoint (1-row action; no label collect)
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels


def dedup_components(
    pairs: DataFrame,
    universe: DataFrame,
    id_col: str,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster-canonical dedup assignment: every id in ``universe`` maps
    to its component minimum (itself when unpaired) plus an
    ``is_duplicate`` flag — the transitive version of the single-pass
    canonicalizers."""
    comp = connected_components(pairs, src, dst, max_iter)
    return (
        universe.select(F.col(id_col))
        .join(comp, universe[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
            (
                F.col("component").isNotNull()
                & (F.col("component") != F.col(id_col))
            ).alias("is_duplicate"),
        )
    )
