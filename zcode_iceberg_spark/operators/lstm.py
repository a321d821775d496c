"""Pure-numpy LSTM training: BPTT + full-batch Adam (SURVEY I1's
training half).

Reference capability: data_manager.py:886-929 trains TrendLSTM
(1→hidden×num_layers LSTM + 3-class fc head, data_manager.py:34-61)
with full-batch Adam on CrossEntropyLoss over the z-normalized
close-price dataset of data_manager.py:839-884. torch is absent in
this environment, so the trainer is hand-written numpy BPTT —
gradient-checked against central differences on every parameter
(tests/test_lstm_training.py) — and the trained arrays persist
through the SAME npz seam the serving path broadcasts
(operators/timeseries.py:lstm_trend_scores, torch [i|f|g|o] gate row
layout, so a blob trained here is indistinguishable from a torch
state-dict export at the seam).

Scale note: training is DRIVER-side by design. The reference trains
on a bounded warmup window (≤ ~1000 bars of one symbol's closes), so
the faithful Spark shape is collect-the-bounded-frame → train locally
→ broadcast the blob to every executor for serving; the distributed
full-batch-aggregate shape for unbounded training data is already
proven by train_trend_probe (one Spark job per epoch). Serving stays
fully distributed either way.
"""

from __future__ import annotations

import numpy as np

LSTM_HIDDEN = 64  # reference TrendLSTM hidden_dim (data_manager.py:34)
LSTM_LAYERS = 2  # reference num_layers
LSTM_CLASSES = 3  # UP / DOWN / RANGE (label ids 0 / 1 / 2)


def build_lstm_dataset(
    closes: np.ndarray,
    seq_len: int = 10,
    horizon: int = 5,
    up_thresh: float = 5e-4,
    down_thresh: float = 5e-4,
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """(X, y, mean, std) — the supervised trend dataset of reference
    data_manager.py:839-884: features are ``seq_len`` whole-series
    z-normalized closes; the label compares the mean of the next
    ``horizon`` raw closes against the current close (0=UP when the
    relative move exceeds +up_thresh, 1=DOWN below −down_thresh,
    else 2=RANGE). Vectorized with a window-index matrix instead of
    the reference's per-window Python loop — identical rows."""
    prices = np.asarray(closes, dtype=np.float64)
    n_win = len(prices) - seq_len - horizon
    if n_win <= 0:
        raise ValueError("not enough price history for an LSTM dataset")
    mean = float(prices.mean())
    std = float(prices.std()) or 1.0
    norm = (prices - mean) / std

    idx = np.arange(seq_len)[None, :] + np.arange(n_win)[:, None]
    X = norm[idx]  # (n_win, seq_len)
    cur = prices[seq_len - 1 : seq_len - 1 + n_win]
    csum = np.concatenate(([0.0], np.cumsum(prices)))
    fut = (
        csum[seq_len + horizon : seq_len + horizon + n_win]
        - csum[seq_len : seq_len + n_win]
    ) / horizon
    ret = (fut - cur) / cur
    y = np.where(ret > up_thresh, 0, np.where(ret < -down_thresh, 1, 2))
    return X, y.astype(np.int64), mean, std


def init_lstm_params(
    hidden: int = LSTM_HIDDEN,
    layers: int = LSTM_LAYERS,
    n_classes: int = LSTM_CLASSES,
    input_size: int = 1,
    seed: int = 7,
) -> dict[str, np.ndarray]:
    """Seeded parameter init in the torch naming/shape contract the
    serving seam loads: per layer ``weight_ih_l{k}`` (4h, in),
    ``weight_hh_l{k}`` (4h, h), two bias vectors (4h,), plus
    ``fc_weight`` (classes, h) / ``fc_bias``. The distribution is
    torch's default scheme — U(−k, k), k = 1/√hidden for the LSTM and
    1/√fan_in for the head — drawn from a seeded numpy Generator (the
    determinism contract every trainer in this repo carries)."""
    rng = np.random.default_rng(seed)
    k = 1.0 / np.sqrt(hidden)
    p: dict[str, np.ndarray] = {}
    for layer in range(layers):
        in_dim = input_size if layer == 0 else hidden
        p[f"weight_ih_l{layer}"] = rng.uniform(-k, k, (4 * hidden, in_dim))
        p[f"weight_hh_l{layer}"] = rng.uniform(-k, k, (4 * hidden, hidden))
        p[f"bias_ih_l{layer}"] = rng.uniform(-k, k, 4 * hidden)
        p[f"bias_hh_l{layer}"] = rng.uniform(-k, k, 4 * hidden)
    kf = 1.0 / np.sqrt(hidden)
    p["fc_weight"] = rng.uniform(-kf, kf, (n_classes, hidden))
    p["fc_bias"] = rng.uniform(-kf, kf, n_classes)
    return p


def _sig(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def lstm_forward(
    X: np.ndarray, p: dict[str, np.ndarray], layers: int = LSTM_LAYERS
) -> tuple[np.ndarray, list]:
    """Batch forward pass, (n, T) normalized sequences → (n, classes)
    logits, caching every gate activation for BPTT. Gate math and
    [i|f|g|o] row layout mirror the serving forward in
    operators/timeseries.py:lstm_trend_scores (same seam, so the
    trained blob serves unmodified)."""
    n, T = X.shape
    x = X[:, :, None]
    caches = []
    for layer in range(layers):
        wi = p[f"weight_ih_l{layer}"]
        wh = p[f"weight_hh_l{layer}"]
        b = p[f"bias_ih_l{layer}"] + p[f"bias_hh_l{layer}"]
        hidden = wh.shape[1]
        h = np.zeros((n, hidden))
        c = np.zeros((n, hidden))
        outs = np.empty((n, T, hidden))
        steps = []
        for t in range(T):
            h_prev, c_prev = h, c
            z = x[:, t, :] @ wi.T + h_prev @ wh.T + b
            i_g, f_g, g_g, o_g = np.split(z, 4, axis=1)
            i_g, f_g, o_g = _sig(i_g), _sig(f_g), _sig(o_g)
            g_t = np.tanh(g_g)
            c = f_g * c_prev + i_g * g_t
            tc = np.tanh(c)
            h = o_g * tc
            outs[:, t, :] = h
            steps.append((x[:, t, :], h_prev, c_prev, i_g, f_g, g_t, o_g, tc))
        caches.append((x, steps))
        x = outs
    h_top = x[:, -1, :]
    logits = h_top @ p["fc_weight"].T + p["fc_bias"]
    caches.append(h_top)
    return logits, caches


def lstm_loss_and_grads(
    X: np.ndarray,
    y: np.ndarray,
    p: dict[str, np.ndarray],
    layers: int = LSTM_LAYERS,
) -> tuple[float, dict[str, np.ndarray]]:
    """Mean CrossEntropy loss + exact gradients for every parameter,
    by backprop-through-time. The recurrence is the standard LSTM
    adjoint: dh carries the output gradient plus next-step recurrent
    flow, dc accumulates through the forget gate, and lower layers
    receive dx from the layer above at EVERY timestep (not just the
    last). Verified against numerical central differences to 1e-6
    relative (tests/test_lstm_training.py — the evidence that makes a
    hand-written BPTT trustworthy)."""
    n, T = X.shape
    logits, caches = lstm_forward(X, p, layers)
    h_top = caches[-1]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    loss = float(-np.mean(np.log(probs[np.arange(n), y] + 1e-300)))

    grads = {k: np.zeros_like(v) for k, v in p.items()}
    dlogits = probs.copy()
    dlogits[np.arange(n), y] -= 1.0
    dlogits /= n
    grads["fc_weight"] = dlogits.T @ h_top
    grads["fc_bias"] = dlogits.sum(axis=0)

    hidden = p["weight_hh_l0"].shape[1]
    d_out = np.zeros((n, T, hidden))
    d_out[:, -1, :] = dlogits @ p["fc_weight"]
    for layer in range(layers - 1, -1, -1):
        x_seq, steps = caches[layer]
        wi = p[f"weight_ih_l{layer}"]
        wh = p[f"weight_hh_l{layer}"]
        dwi = grads[f"weight_ih_l{layer}"]
        dwh = grads[f"weight_hh_l{layer}"]
        db = np.zeros(4 * hidden)
        dx = np.empty_like(x_seq)
        dh_next = np.zeros((n, hidden))
        dc_next = np.zeros((n, hidden))
        for t in range(T - 1, -1, -1):
            x_t, h_prev, c_prev, i_g, f_g, g_t, o_g, tc = steps[t]
            dh = d_out[:, t, :] + dh_next
            dc = dh * o_g * (1.0 - tc * tc) + dc_next
            dz = np.concatenate(
                [
                    dc * g_t * i_g * (1.0 - i_g),
                    dc * c_prev * f_g * (1.0 - f_g),
                    dc * i_g * (1.0 - g_t * g_t),
                    dh * tc * o_g * (1.0 - o_g),
                ],
                axis=1,
            )
            dwi += dz.T @ x_t
            dwh += dz.T @ h_prev
            db += dz.sum(axis=0)
            dx[:, t, :] = dz @ wi
            dh_next = dz @ wh
            dc_next = dc * f_g
        # torch keeps two bias vectors whose gradients are identical
        grads[f"bias_ih_l{layer}"] = db
        grads[f"bias_hh_l{layer}"] = db.copy()
        if layer > 0:
            d_out = dx
    return loss, grads


def train_trend_lstm(
    closes: np.ndarray,
    seq_len: int = 10,
    horizon: int = 5,
    up_thresh: float = 5e-4,
    down_thresh: float = 5e-4,
    hidden: int = LSTM_HIDDEN,
    layers: int = LSTM_LAYERS,
    epochs: int = 10,
    lr: float = 0.01,
    seed: int = 7,
) -> tuple[dict[str, np.ndarray], float, float, list[float]]:
    """The reference trainer (data_manager.py:886-929), torch-free:
    full-batch Adam (torch defaults β=(0.9, 0.999), ε=1e-8) on mean
    CrossEntropy, ``epochs`` optimizer steps, seeded init. Returns
    (params, mean, std, per-epoch pre-update losses); params drop
    straight into the lstm_trend_scores serving seam."""
    X, y, mean, std = build_lstm_dataset(
        closes, seq_len, horizon, up_thresh, down_thresh
    )
    p = init_lstm_params(hidden, layers, seed=seed)
    m = {k: np.zeros_like(v) for k, v in p.items()}
    v = {k: np.zeros_like(val) for k, val in p.items()}
    b1, b2, eps = 0.9, 0.999, 1e-8
    losses: list[float] = []
    for step in range(1, epochs + 1):
        loss, g = lstm_loss_and_grads(X, y, p, layers)
        losses.append(loss)
        for key in p:
            m[key] = b1 * m[key] + (1 - b1) * g[key]
            v[key] = b2 * v[key] + (1 - b2) * g[key] * g[key]
            mhat = m[key] / (1 - b1**step)
            vhat = v[key] / (1 - b2**step)
            p[key] = p[key] - lr * mhat / (np.sqrt(vhat) + eps)
    return p, mean, std, losses


def save_trend_lstm(
    params: dict[str, np.ndarray], mean: float, std: float, path: str
) -> str:
    """Persist through the serving seam's npz contract
    (operators/timeseries.py:load_trend_weights) plus the
    normalization constants the reference stores alongside the model
    (data_manager.py:928-929 returns (model, mean, std))."""
    out = path if path.endswith(".npz") else path + ".npz"
    np.savez(
        out,
        norm_mean=np.asarray(mean),
        norm_std=np.asarray(std),
        **{k: np.asarray(a) for k, a in params.items()},
    )
    return out
