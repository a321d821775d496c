"""Generate the committed trend-model weight fixture
(zcode_iceberg_spark/models/trend_lstm_weights.npz).

The blob carries TWO heads over the same normalized length-10 price
sequence input:

- the reference TrendLSTM's exact parameter shapes (input 1 → hidden
  64 × 2 layers → fc 64→3; reference data_manager.py:34-61) — what an
  externally torch-trained model would export; consumed by
  operators/timeseries.py:lstm_trend_scores through the
  broadcast-weights pandas_udf seam;
- a linear probe (w[10], b) whose logistic score is SQL-expressible,
  so the external-weights *plumbing* gets a hash-checked DuckDB
  oracle row (suite query trend_classifier_weights).

Values are seeded-random, rounded to 6 decimals so SQL literals
reproduce the float64s bit-exactly. Deterministic: re-running this
script reproduces the identical file.

Usage (repo root):  python tools/make_weights.py
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

OUT = (
    Path(__file__).resolve().parent.parent
    / "zcode_iceberg_spark" / "models" / "trend_lstm_weights.npz"
)

HIDDEN = 64
SEQ_LEN = 10


def main() -> None:
    rng = np.random.default_rng(20260814)

    def r(*shape):
        return rng.normal(0.0, 0.1, shape).round(6)

    arrays = {
        # torch LSTM layout: rows = [i|f|g|o] gates, 4*hidden each
        "weight_ih_l0": r(4 * HIDDEN, 1),
        "weight_hh_l0": r(4 * HIDDEN, HIDDEN),
        "bias_ih_l0": r(4 * HIDDEN),
        "bias_hh_l0": r(4 * HIDDEN),
        "weight_ih_l1": r(4 * HIDDEN, HIDDEN),
        "weight_hh_l1": r(4 * HIDDEN, HIDDEN),
        "bias_ih_l1": r(4 * HIDDEN),
        "bias_hh_l1": r(4 * HIDDEN),
        "fc_weight": r(3, HIDDEN),
        "fc_bias": r(3),
        # linear probe head (SQL-expressible twin)
        "probe_w": rng.normal(0.0, 0.5, SEQ_LEN).round(6),
        "probe_b": np.array(rng.normal(0.0, 0.1)).round(6),
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
    print("probe_w:", arrays["probe_w"].tolist())
    print("probe_b:", float(arrays["probe_b"]))


if __name__ == "__main__":
    main()
