"""Hypothesis property checks of the structured-curation ORACLE
semantics, run entirely in DuckDB over generated micro-corpora — an
engine-independent validation of the SQL the hash compare treats as
truth. (Spark↔DuckDB agreement is pinned by tests/test_oracle_suite.py;
these pin that the agreed-on semantics are RIGHT for arbitrary
corpora, cheaply — no Spark session per example.)"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from zcode_iceberg_spark.suite import linkage

_WORDS = ["alpha", "beta", "gamma", "delta", "kappa", "sigma"]


def _docs_df(texts: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 2}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    )


def _run(sql: str, docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(sql).df()


texts_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
    min_size=5,
    max_size=25,
)


@settings(max_examples=25, deadline=None)
@given(texts_strategy)
def test_bloom_oracle_no_false_negatives_any_corpus(texts):
    """For EVERY corpus: bloom_candidate ⊇ is_exact_dup row-wise."""
    out = _run(linkage.SQL_DEDUP_BLOOM, _docs_df(texts))
    bad = out[out["is_exact_dup"] & ~out["bloom_candidate"]]
    assert bad.empty, bad


@settings(max_examples=25, deadline=None)
@given(texts_strategy)
def test_token_budget_mix_oracle_invariants_any_corpus(texts):
    """For EVERY corpus and source: budget filled to within one doc,
    unselected docs start at/after the budget, selection deterministic
    in the hash order."""
    import math

    out = _run(linkage.SQL_TOKEN_BUDGET_MIX, _docs_df(texts))
    for src, g in out.groupby("source"):
        total = int(g["n_tokens"].sum())
        budget = math.floor(linkage.MIX_BUDGET_FRAC * total)
        sel = g[g["selected"]]
        assert not sel.empty
        mass = int(sel["n_tokens"].sum())
        assert mass >= budget
        assert mass - int(sel["n_tokens"].max()) < budget
        assert (g.loc[~g["selected"], "cum_before"] >= budget).all()


@settings(max_examples=15, deadline=None)
@given(texts_strategy)
def test_containment_oracle_bounds_any_corpus(texts):
    """For EVERY corpus: containment ∈ [CONT_MIN, 1], pairs ordered,
    intersection positive."""
    out = _run(linkage.SQL_CONTAINMENT_DEDUP, _docs_df(texts))
    if out.empty:
        return
    assert (out["doc_a"] < out["doc_b"]).all()
    assert (out["containment"] >= linkage.CONT_MIN).all()
    assert (out["containment"] <= 1.0 + 1e-9).all()
    assert (out["inter_cnt"] >= 1).all()


@settings(max_examples=25, deadline=None)
@given(texts_strategy)
def test_cms_oracle_never_undercounts_any_corpus(texts):
    out = _run(linkage.SQL_CMS_HEAVY_HITTERS, _docs_df(texts))
    assert (out["cms_est"] >= out["exact_cnt"]).all()
    assert (out["overcount"] == out["cms_est"] - out["exact_cnt"]).all()
