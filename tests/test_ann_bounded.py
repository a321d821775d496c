"""Scale-safety properties of the bounded IVF probe
(suite/llm.py:q_ann_ivf_bounded): hot cells are sub-sliced by the SAME
hot_block_slice rule that bounds embedding_neardup / semantic_dedup,
BOTH join sides agree on which cells are hot (the candidate side's
counts drive both), and bounding can only remove candidates — so
per-query recall against the exact baseline is monotone: bounded ≤
plain. The fixture already exercises the hot path (several of the 16
cells exceed ANN_MAX_CELL=32 rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite.llm import (
    ANN_MAX_CELL,
    bounded_cell_blocks,
    q_ann_ivf_bounded_recall,
    q_ann_ivf_recall,
)


def _blocked_cells(spark, sf_dir):
    """Audit frame over the PRODUCTION candidate-side pipeline — the
    exact vb frame q_ann_ivf_bounded joins, not a re-spelling."""
    _ranked, _counts, vb = bounded_cell_blocks(spark, sf_dir)
    return vb.groupBy("cell", "sub").agg(
        F.count(F.lit(1)).alias("block_n"), F.max("cell_n").alias("cell_n")
    )


def test_hot_cells_are_subsliced(spark, sf_dir):
    sizes = _blocked_cells(spark, sf_dir).collect()
    hot = [r for r in sizes if r["cell_n"] > ANN_MAX_CELL]
    cold = [r for r in sizes if r["cell_n"] <= ANN_MAX_CELL]
    assert hot, "fixture regression: no hot cell left to exercise the split"
    assert all(r["sub"] > 0 for r in hot)
    assert all(r["sub"] == 0 for r in cold)
    for r in hot:
        assert r["block_n"] < r["cell_n"]


def test_probe_pair_mass_strictly_reduced(spark, sf_dir):
    """Σ over (cell, sub) blocks of block_n is the per-query candidate
    mass inside a probed cell; sub-slicing must strictly reduce the
    worst cell's contribution vs the unsplit cell."""
    sizes = _blocked_cells(spark, sf_dir).collect()
    worst_block = max(r["block_n"] for r in sizes if r["sub"] > 0)
    worst_cell = max(r["cell_n"] for r in sizes)
    assert worst_block < worst_cell


def test_bounded_probe_plan_shape(spark, sf_dir):
    """The guard must not cost the plan its shape: the probe stays a
    broadcast equi-join on (cell, sub) — no cartesian product, no
    shuffle of the candidate side by anything but its block key."""
    import contextlib
    import io

    from zcode_iceberg_spark.suite.llm import q_ann_ivf_bounded

    df = q_ann_ivf_bounded(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # both the centroid table and the sliced query side arrive by
    # broadcast: the only nested-loop joins are centroid broadcasts
    assert "BroadcastNestedLoopJoin" in p  # the nlist-row cross score


def test_cell_cap_noop_when_blocks_fit(spark, sf_dir):
    """cell_cap at or above the largest block is a no-op — the cap
    only ever bites on blocks it was sized to bound."""
    from zcode_iceberg_spark.suite.llm import q_ann_ivf_bounded

    sizes = _blocked_cells(spark, sf_dir).collect()
    cap = max(r["block_n"] for r in sizes)
    base = sorted(map(str, q_ann_ivf_bounded(spark, sf_dir).collect()))
    capped = sorted(
        map(str, q_ann_ivf_bounded(spark, sf_dir, cell_cap=cap).collect())
    )
    assert capped == base and base


def test_cell_cap_preserves_topk_quality_on_dup_flood(spark, sf_dir, tmp_path):
    """The degenerate-flood guard: on an exact-copy flood (the regime
    hyperplane slicing provably cannot split) the cap bounds pair mass
    while every query's retained top-k scores exactly what the
    uncapped probe scores — any surviving family member is as good a
    neighbor as a dropped one."""
    base = load_table(spark, sf_dir, "embeddings").limit(10)
    copies = (
        base.sparkSession.range(40).select(F.col("id").alias("cp"))
    )
    flood = base.crossJoin(F.broadcast(copies)).select(
        (F.col("cp") * 1000 + F.col("vec_id")).alias("vec_id"),
        "embedding",
        "label",
    )
    corpus = str(tmp_path / "flood")
    flood.write.parquet(f"{corpus}/embeddings.parquet")

    from zcode_iceberg_spark.suite.llm import TOPK, q_ann_ivf_bounded

    full = q_ann_ivf_bounded(spark, corpus).collect()
    capped = q_ann_ivf_bounded(spark, corpus, cell_cap=8).collect()

    def best(rows):
        out = {}
        for r in rows:
            if r["rank"] == 1:
                out[r["qid"]] = r["cos_sim"]
        return out

    fb, cb = best(full), best(capped)
    assert set(fb) == set(cb) and fb
    for qid in fb:
        assert cb[qid] == fb[qid], qid  # top score survives the cap
    # and the cap still yields a full top-k per query (cap >= TOPK)
    per_q = {}
    for r in capped:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    assert all(n == TOPK for n in per_q.values())


def test_bounded_recall_is_monotone_below_plain(spark, sf_dir):
    """Bounding only REMOVES candidates (the bounded candidate set is
    a subset of the plain probe's), so an exact-baseline hit found by
    the bounded probe is always found by the plain probe: per-query
    n_hits(bounded) <= n_hits(plain)."""
    plain = {
        r["qid"]: r["n_hits"]
        for r in q_ann_ivf_recall(spark, sf_dir).collect()
    }
    bounded = {
        r["qid"]: r["n_hits"]
        for r in q_ann_ivf_bounded_recall(spark, sf_dir).collect()
    }
    assert set(plain) == set(bounded)
    assert plain, "empty query panel"
    for qid in plain:
        assert bounded[qid] <= plain[qid], qid
