"""Scale-safety property tests for the blocked embedding near-dup
(suite/llm.py:q_embedding_neardup): the quadratic work inside any one
block must stay bounded no matter how hot a single label is, because
the block key sub-buckets hot labels by an LSH bit-slice.

sf0.001 already exercises the hot path: several labels exceed
NEARDUP_MAX_BLOCK=50 rows and therefore get sub-bucketed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zcode_iceberg_spark.operators import similarity as sim_ops
from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite.llm import (
    EMB_DIM,
    NEARDUP_MAX_BLOCK,
    NEARDUP_SLICE_BITS,
    q_embedding_neardup,
)


def _block_sizes(spark, sf_dir):
    """Recompute the query's block key (via the SAME shared helper the
    queries use) and return per-block row counts."""
    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    blocked = sim_ops.hot_block_slice(
        base, "label", "embedding", EMB_DIM,
        NEARDUP_MAX_BLOCK, NEARDUP_SLICE_BITS, count_col="label_n",
    )
    return blocked.groupBy("label", "sub").agg(
        F.count(F.lit(1)).alias("block_n"), F.max("label_n").alias("label_n")
    )


def test_hot_labels_are_subbucketed(spark, sf_dir):
    sizes = _block_sizes(spark, sf_dir).collect()
    hot = [r for r in sizes if r["label_n"] > NEARDUP_MAX_BLOCK]
    cold = [r for r in sizes if r["label_n"] <= NEARDUP_MAX_BLOCK]
    assert hot, "fixture regression: no hot label left to exercise the split"
    # hot labels never pair as one block: they are split across slices
    assert all(r["sub"] > 0 for r in hot)
    assert all(r["sub"] == 0 for r in cold)
    # every sub-bucket is a strict shrink of its label block, so the n²
    # pair work per task is bounded well below the unsplit block's
    for r in hot:
        assert r["block_n"] < r["label_n"]


def test_pair_count_bounded_by_blocks(spark, sf_dir):
    """Emitted candidate pairs can never exceed Σ block_n·(block_n−1)/2
    — the proof that no unsplit hot-label n² sneaks into the plan."""
    sizes = _block_sizes(spark, sf_dir).collect()
    bound = sum(r["block_n"] * (r["block_n"] - 1) // 2 for r in sizes)
    unsplit = {}
    for r in sizes:
        unsplit[r["label"]] = r["label_n"]
    unsplit_bound = sum(n * (n - 1) // 2 for n in unsplit.values())
    assert bound < unsplit_bound  # the split strictly reduced pair work
    n_pairs = q_embedding_neardup(spark, sf_dir).count()
    assert n_pairs <= bound


def test_block_key_is_equijoin(spark, sf_dir):
    """The physical plan must join on the block key (hash equi-join),
    not degenerate into a nested-loop / cartesian product."""
    plan = q_embedding_neardup(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_hot_clusters_are_subsliced(spark, sf_dir):
    """semantic_dedup reuses the same bounded-block guarantee over
    k-means clusters: any cluster above NEARDUP_MAX_BLOCK rows must be
    split across LSH sub-slices so no block pairs quadratically."""
    from zcode_iceberg_spark.suite.llm import _km_fit_assign

    asgn = _km_fit_assign(spark, sf_dir)
    blocked = sim_ops.hot_block_slice(
        asgn, "cid", "e", EMB_DIM,
        NEARDUP_MAX_BLOCK, NEARDUP_SLICE_BITS, count_col="cn",
    )
    sizes = blocked.groupBy("cid", "sub").agg(
        F.count(F.lit(1)).alias("block_n"), F.max("cn").alias("cn")
    ).collect()
    hot = [r for r in sizes if r["cn"] > NEARDUP_MAX_BLOCK]
    assert hot, "fixture regression: no hot cluster left to exercise the split"
    assert all(r["sub"] > 0 for r in hot)
    for r in hot:
        assert r["block_n"] < r["cn"]


def test_passages_are_a_lossless_partition(spark, sf_dir):
    """Reassembling each doc's passages in pidx order must reproduce
    the original text exactly — the invariant that makes passage-level
    dedup decisions traceable back to exact document spans."""
    from zcode_iceberg_spark.operators.text import passages

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    p = passages(docs, "doc_id", "text", width=8)
    rebuilt = (
        p.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pidx", "ptext"))),
                    lambda s: s.ptext,
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    n_total = joined.count()
    n_match = joined.filter(F.col("text") == F.col("rebuilt")).count()
    assert n_total == n_match > 0


def test_semantic_dedup_keep_rule(spark, sf_dir):
    """SemDeDup keep rule, checked from the OUTPUT side: at least one
    member of every non-empty block survives (is_dup=False), and the
    single farthest-from-centroid member of each block (min vec_id on
    dist ties) can never be flagged — no preceding mate exists for it."""
    from zcode_iceberg_spark.suite.llm import q_semantic_dedup, _km_fit_assign

    out = {r["vec_id"]: r for r in q_semantic_dedup(spark, sf_dir).collect()}
    assert out
    asgn = {r["vec_id"]: r for r in _km_fit_assign(spark, sf_dir).collect()}
    # rebuild block heads driver-side (few hundred rows at test SF)
    import collections

    blocks = collections.defaultdict(list)
    for vid, r in out.items():
        blocks[r["cluster"]].append(vid)
    # per cluster: the farthest member overall precedes everyone in its
    # OWN sub-block, so whichever sub-block it landed in, it is kept
    for cid, vids in blocks.items():
        assert any(not out[v]["is_dup"] for v in vids), cid
        head = max(vids, key=lambda v: (asgn[v]["dist"], -v))
        assert not out[head]["is_dup"], (cid, head)
