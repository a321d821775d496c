"""Generate the committed MICRO trend-LSTM fixture
(zcode_iceberg_spark/models/trend_lstm_micro.npz).

VERDICT r8 #4: the 1→64×2 LSTM forward is not economically
SQL-expressible, which left the serving seam
(operators/timeseries.py:lstm_trend_scores — broadcast npz weights,
Arrow batches, torch [i|f|g|o] gate layout, softmax + argmax) without
a hash-checked DuckDB oracle row. A 1→4×2 model IS expressible: the
whole forward unrolls to ~500 lateral-alias scalar expressions, so
the suite query ``lstm_trend_micro`` serves THIS blob through the
IDENTICAL seam and the oracle replays every gate from the same file's
constants. Micro shape, real trained weights: ``train_trend_lstm``
(the gradient-checked BPTT trainer) on a seeded synthetic random-walk
series, so the blob is a genuine training artifact, not noise.

Deterministic: re-running this script reproduces the identical file.

Usage (repo root):  python tools/make_micro_weights.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zcode_iceberg_spark.operators import lstm as L  # noqa: E402

MODELS = Path(__file__).resolve().parent.parent / "zcode_iceberg_spark" / "models"

HIDDEN = 4
SEED = 20260815


def _train(name: str, layers: int, horizon: int, thresh: float, seed: int):
    rng = np.random.default_rng(seed)
    # synthetic price path with real trend structure: random walk with
    # regime-switching drift, so all three labels occur in training
    drift = np.repeat(rng.normal(0.0, 8e-4, 16), 25)
    steps = rng.normal(0.0, 5e-4, 400) + drift
    closes = 100.0 * np.exp(np.cumsum(steps))
    params, mean, std, losses = L.train_trend_lstm(
        closes,
        seq_len=10,
        horizon=horizon,
        up_thresh=thresh,
        down_thresh=thresh,
        hidden=HIDDEN,
        layers=layers,
        epochs=60,
        lr=0.02,
        seed=seed,
    )
    if not losses[-1] < losses[0]:
        raise RuntimeError(f"{name} training diverged: {losses[0]} -> {losses[-1]}")
    out = MODELS / name
    path = L.save_trend_lstm(params, mean, std, str(out))
    print(f"wrote {path} ({Path(path).stat().st_size} bytes)")
    print(f"loss {losses[0]:.6f} -> {losses[-1]:.6f} over {len(losses)} epochs")


def main() -> None:
    # HTF twin of the reference 64x2 shape (data_manager.py:989-998):
    # 2 layers, ±5e-4 label thresholds
    _train("trend_lstm_micro.npz", layers=2, horizon=5, thresh=5e-4, seed=SEED)
    # LTF twin of the reference 32x1 shape (data_manager.py:1092-1102):
    # 1 layer, horizon 5 bars, ±4e-4 label thresholds
    _train(
        "trend_lstm_micro_ltf.npz", layers=1, horizon=5, thresh=4e-4,
        seed=SEED + 1,
    )


if __name__ == "__main__":
    main()
