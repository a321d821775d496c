"""Distributed graph kernels over edge DataFrames.

Currently: connected components by the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi,
Vassilvitskii — "Connected Components in MapReduce and Beyond"), the
shape that wins when EDGES dominate a round: no per-node label table,
and the edge set provably never grows across operations. Used by the
near-dup clustering suite (suite/llm.py:q_dedup_cc_twostar) and
property-tested against a union-find reference on random graphs
(tests/test_graph_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_star_components(edges: DataFrame, max_iters: int = 12) -> DataFrame:
    """Connected components of an undirected graph given as an edge
    DataFrame with two long columns ``u, v`` (any orientation,
    self-loops/dupes tolerated). Returns ``(node, label)`` for every
    node APPEARING IN AN EDGE, where label = the component's minimum
    node id (isolated nodes are the caller's corpus join).

    Per round: large-star hooks every node's larger neighbors to the
    min of its closed neighborhood, small-star hooks the smaller ones
    (and the node itself) — each a symmetric groupBy-min + equi-join.
    Converges to star graphs in O(log²) rounds; detected by an
    order-free (count, xxhash64-sum) signature of the canonical edge
    set, one tiny driver scalar per round."""
    E = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def edge_sig(e: DataFrame) -> tuple[int, int]:
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.least("u", "v"), F.greatest("u", "v"))
            ).alias("h"),
        ).collect()[0]
        return int(r["n"] or 0), int(r["h"] or 0)

    prev = edge_sig(E)
    converged = False
    for _ in range(max_iters):
        # large-star over the symmetric view
        sym = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        ls = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over (larger → smaller)-oriented edges
        o = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        m2 = o.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            o.join(m2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m2.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = edge_sig(ss)
        E = ss
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # a non-converged edge set is NOT stars: nodes could carry
        # conflicting labels and silently corrupt downstream dedup —
        # fail loudly instead (O(log² n) bounds mean max_iters=12
        # covers any graph this engine will realistically see; raise
        # it explicitly for adversarial diameters)
        raise RuntimeError(
            f"two_star_components did not converge in {max_iters} rounds"
        )
    # at fixpoint E holds (child, root) star edges; roots re-enter as
    # their own label
    return E.select(F.col("u").alias("node"), F.col("v").alias("label")).union(
        E.select("v")
        .distinct()
        .select(F.col("v").alias("node"), F.col("v").alias("label"))
    )
