"""Property tests for the two-star connected-components kernel:
agreement with a union-find reference across random graph shapes —
chains, cliques, stars, forests, dupes/self-loops, any orientation.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from zcode_iceberg_spark.operators.graph import two_star_components


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label = component min
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_two_star_matches_union_find_on_random_graphs(spark):
    edge = st.tuples(
        st.integers(0, 25), st.integers(0, 25)
    )

    @settings(max_examples=12, deadline=None)
    @given(edges=st.lists(edge, min_size=1, max_size=40))
    def check(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r["node"]: r["label"]
            for r in two_star_components(df, max_iters=12).collect()
        }
        want = _union_find_labels(
            [(u, v) for u, v in edges if u != v]
        )
        assert got == want

    check()


def test_two_star_known_shapes(spark):
    cases = [
        # chain 0-1-2-3-4: one component rooted at 0
        ([(0, 1), (1, 2), (2, 3), (3, 4)], {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}),
        # two triangles
        (
            [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
            {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10},
        ),
        # star already rooted at min
        ([(0, 5), (0, 6), (0, 7)], {0: 0, 5: 0, 6: 0, 7: 0}),
        # star rooted at MAX (must re-root to min)
        ([(9, 1), (9, 2), (9, 3)], {1: 1, 2: 1, 3: 1, 9: 1}),
        # only self-loops → no edges → empty label set
        ([(4, 4), (7, 7)], {}),
    ]
    for edges, want in cases:
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r["node"]: r["label"]
            for r in two_star_components(df).collect()
        }
        assert got == want, (edges, got, want)
