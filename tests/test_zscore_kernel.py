"""Property tests for the live pipeline's in-stream z kernel
(streaming/pipeline.py:_zscore_step) — pure pandas, no Spark session:

1. batch-boundary INVARIANCE: splitting one ordered tick stream at
   arbitrary points and chaining the carried state must produce the
   exact z sequence one-shot processing produces (the GroupState
   contract, generalized beyond the fixture's fixed 3-file split);
2. formula equivalence: the kernel's z equals an independent
   recomputation of the batch definition (value-inclusive 600 s
   range-window delta, trailing-50 avg, Welford population sigma,
   min-pop/flat guards) written directly from the spec.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from zcode_iceberg_spark.streaming.pipeline import _zscore_step

WIN_SEC = 600
POP = 50
MIN_POP = 30


def _mk_pdf(rows):
    return pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows], unit="s"),
            "event_id": [r[1] for r in rows],
            "qty": [r[2] for r in rows],
            "is_buy": [r[3] for r in rows],
        }
    )


def _reference_zs(rows):
    """Independent spec recomputation (no shared code with the kernel
    beyond the constants): per row, delta = Σ signed qty over ts in
    [t−600 s, t] (VALUE-inclusive — all same-ts rows count), z over the
    trailing ≤50 deltas with sum/n mean and Welford population sigma."""
    out = []
    deltas = []
    for i, (ts, _eid, qty, buy) in enumerate(rows):
        lo = ts - WIN_SEC
        delta = 0.0
        for ts2, _e2, q2, b2 in rows:
            if lo <= ts2 <= ts:  # value frame: includes later same-ts rows
                delta += q2 if b2 else -q2
        deltas.append(delta)
        ring = deltas[max(0, i + 1 - POP) : i + 1]
        n = len(ring)
        mu = sum(ring) / n
        mean = m2 = 0.0
        for k, v in enumerate(ring, 1):
            d = v - mean
            mean += d / k
            m2 += d * (v - mean)
        sigma = math.sqrt(m2 / n)
        out.append((delta - mu) / sigma if n >= MIN_POP and sigma > 0 else 0.0)
    return out


ticks = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2000),  # seconds (forces ties
        st.integers(min_value=0, max_value=10**6),  # and evictions)
        st.floats(min_value=0.01, max_value=50.0, allow_nan=False),
        st.booleans(),
    ),
    min_size=1,
    max_size=120,
)


def _canon(rows):
    """Event order: (ts, event_id), ids deduped so order is total."""
    rows = sorted(set(rows), key=lambda r: (r[0], r[1]))
    return [(t, e, q, b) for (t, e, q, b) in rows]


@settings(max_examples=60, deadline=None)
@given(ticks, st.data())
def test_batch_split_invariance(raw, data):
    rows = _canon(raw)
    one_shot, _ = _zscore_step(_mk_pdf(rows), ([], [], []))
    n_cuts = data.draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(rows)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(rows)]
    state = ([], [], [])
    chained = []
    for a, b in zip(bounds, bounds[1:]):
        if a == b:
            zs, state = [], state  # empty micro-batch is a no-op
            continue
        zs, state = _zscore_step(_mk_pdf(rows[a:b]), state)
        chained.extend(zs)
    assert chained == one_shot  # bit-exact, not approximate


@settings(max_examples=40, deadline=None)
@given(ticks)
def test_kernel_matches_spec(raw):
    rows = _canon(raw)
    got, _ = _zscore_step(_mk_pdf(rows), ([], [], []))
    want = _reference_zs(rows)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w or abs(g - w) < 1e-12, (g, w)
