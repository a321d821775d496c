"""Split-invariance property tests for the exact-substring stream
(VERDICT r11 #8): under ARBITRARY file cuts of one append-ordered
corpus, every epoch's rollup must equal the batch persisted probe
(``substring_dedup_against``) run at that ingest point — the
ingest-time contract test_streaming.py pins on the one fixed
INCR_SPLIT_FRAC cut, here generalized to random cuts.

Two layers, the kernel-split-invariance structure:

1. PURE, 3 seeds x 100 examples: the stream's chained ledger fold
   (novel-set accumulation, mirroring ``substring_dedup_step``'s
   algebra) against an independent closed-form recomputation (prior =
   every window of every earlier epoch, the batch probe's definition),
   on randomly generated duplicate-rich corpora and random cuts. Pins
   the ledger-threading algebra: accumulated novels == full-prefix
   window set, and therefore every epoch rollup is cut-invariant given
   its ingest point.
2. SPARK, 3 seeds x 6 examples: the REAL ``substring_dedup_step``
   chained over random cuts of a generated corpus, every epoch's
   parquet rollup compared row-for-row against the same brute-force
   reference — anchoring layer 1's model to the shipped code path
   (real ledger parquet, real epoch filter, real span windows).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, seed, settings, strategies as st

SEED_MATRIX = [0, 1717, 20260816]

seed_matrix = pytest.mark.parametrize("hseed", SEED_MATRIX)


# ------------------------------------------------- brute-force reference


def _windows(text: str, L: int) -> list[tuple[int, str]]:
    """1-based stride-1 length-L windows, the _substr_windows contract
    (docs shorter than L contribute none)."""
    if len(text) < L:
        return []
    return [(i, text[i - 1 : i - 1 + L]) for i in range(1, len(text) - L + 2)]


def _brute_epoch(
    batch: list[tuple[int, str]], prior: set, L: int
) -> tuple[dict, set]:
    """One ingest epoch, computed naively: a position is duplicated iff
    its window is in the prior set OR occurs >=2 times within the
    batch; maximal islands (gap > L breaks) merge to spans. Returns
    ({doc_id: (n_chars, n_spans, dup_chars)}, batch window set)."""
    win = [
        (doc_id, i, w)
        for doc_id, text in batch
        for i, w in _windows(text, L)
    ]
    cnt = Counter(w for _, _, w in win)
    dup_pos: dict[int, list[int]] = {}
    for doc_id, i, w in win:
        if w in prior or cnt[w] > 1:
            dup_pos.setdefault(doc_id, []).append(i)
    out = {}
    for doc_id, text in batch:
        spans: list[list[int]] = []
        for i in sorted(dup_pos.get(doc_id, [])):
            if spans and i - spans[-1][1] <= L:
                spans[-1][1] = i
            else:
                spans.append([i, i])
        dup_chars = sum(e - s + L for s, e in spans)
        out[doc_id] = (len(text), len(spans), dup_chars)
    return out, {w for _, _, w in win}


# ------------------------------------------------------- data generation


@st.composite
def corpus_and_cuts(draw, seg_min: int, seg_max: int, n_docs_max: int = 8):
    """Duplicate-rich random corpus + random epoch cuts: docs are
    concatenations of segments drawn from a 4-element pool over a
    2-letter alphabet, so exact >=L-char repeats occur within and
    across docs with high probability; 0-3 cut points split the
    append order into epochs (empty epochs allowed — a trigger that
    picked up no files)."""
    pool = [
        draw(st.text(alphabet="ab", min_size=seg_min, max_size=seg_max))
        for _ in range(4)
    ]
    n_docs = draw(st.integers(min_value=2, max_value=n_docs_max))
    docs = []
    for d in range(n_docs):
        n_seg = draw(st.integers(min_value=4, max_value=10))
        text = "".join(
            pool[draw(st.integers(min_value=0, max_value=3))]
            for _ in range(n_seg)
        )
        docs.append((d, text))
    k = draw(st.integers(min_value=0, max_value=3))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n_docs),
                min_size=k,
                max_size=k,
            )
        )
    )
    bounds = [0, *cuts, n_docs]
    epochs = [docs[a:b] for a, b in zip(bounds, bounds[1:])]
    return docs, epochs


# ------------------------------------------- layer 1: pure, 3 x 100


@seed_matrix
def test_ledger_fold_equals_closed_form(hseed):
    L = 6

    @seed(hseed)
    @settings(max_examples=100, deadline=None, database=None)
    @given(corpus_and_cuts(seg_min=3, seg_max=5))
    def prop(cc):
        docs, epochs = cc
        # chained: the stream's algebra — seen accumulates per-epoch
        # NOVEL window sets (distinct batch windows minus seen)
        seen: set = set()
        chained = []
        for batch in epochs:
            got, batch_w = _brute_epoch(batch, seen, L)
            chained.append(got)
            seen |= batch_w - seen
        # closed form: the batch probe's definition at each ingest
        # point — prior = every window of every EARLIER epoch's docs
        for k, batch in enumerate(epochs):
            prior = set()
            for earlier in epochs[:k]:
                for _, text in earlier:
                    prior |= {w for _, w in _windows(text, L)}
            want, _ = _brute_epoch(batch, prior, L)
            assert chained[k] == want

    prop()


# ---------------------------------------- layer 2: real Spark step, 3 x 6


@seed_matrix
def test_spark_step_epochs_match_brute(hseed, spark, tmp_path):
    from zcode_iceberg_spark.streaming.pipeline import substring_dedup_step
    from zcode_iceberg_spark.suite.llm import SUBSTR_L

    runs = [0]

    @seed(hseed)
    @settings(max_examples=6, deadline=None, database=None)
    @given(corpus_and_cuts(seg_min=12, seg_max=18, n_docs_max=5))
    def prop(cc):
        docs, epochs = cc
        runs[0] += 1
        led = str(tmp_path / f"led{hseed}_{runs[0]}")
        out = str(tmp_path / f"out{hseed}_{runs[0]}")
        prior: set = set()
        for k, batch in enumerate(epochs):
            bdf = spark.createDataFrame(
                [(d, t, "gen") for d, t in batch],
                "doc_id long, text string, source string",
            )
            substring_dedup_step(bdf, k, led, out)
            want, batch_w = _brute_epoch(batch, prior, SUBSTR_L)
            got = {
                r["doc_id"]: (r["n_chars"], r["n_spans"], r["dup_chars"])
                for r in spark.read.parquet(f"{out}/epoch={k}").collect()
            }
            assert got == want
            prior |= batch_w

    prop()
