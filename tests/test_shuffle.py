"""Invariants of the deterministic corpus shuffle
(suite/llm.py:q_corpus_shuffle): a valid sharded permutation, stable
across reruns, and actually re-ordered relative to doc_id order.
"""

from __future__ import annotations

import collections

from zcode_iceberg_spark.suite.llm import N_SHARDS, q_corpus_shuffle


def test_corpus_shuffle_is_a_sharded_permutation(spark, sf_dir):
    rows = q_corpus_shuffle(spark, sf_dir).collect()
    assert rows
    # every doc appears exactly once
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    by_shard = collections.defaultdict(list)
    for r in rows:
        assert 0 <= r["shard"] < N_SHARDS
        by_shard[r["shard"]].append(r["pos"])
    # positions are contiguous 1..n within each shard (a writer can use
    # them directly as in-file record offsets)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # no shard is empty or pathologically skewed at test scale
    sizes = [len(v) for v in by_shard.values()]
    assert len(by_shard) == N_SHARDS
    assert max(sizes) <= 3 * min(sizes)


def test_corpus_shuffle_is_stable_and_scrambled(spark, sf_dir):
    a = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in q_corpus_shuffle(spark, sf_dir).collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in q_corpus_shuffle(spark, sf_dir).collect()
    )
    assert a == b  # same salt -> identical permutation on rerun
    # and it is a real shuffle: within some shard, ascending pos must
    # not follow ascending doc_id order
    per_shard = collections.defaultdict(list)
    for doc_id, shard, pos in a:
        per_shard[shard].append((pos, doc_id))
    scrambled = any(
        [d for _, d in sorted(v)] != sorted(d for _, d in v)
        for v in per_shard.values()
    )
    assert scrambled
