"""The I1 model seam: expression classifier ≡ broadcast-weights
pandas_udf classifier. Proves the documented swap point (replace the
dot product with a real forward pass) changes nothing else."""

from __future__ import annotations

from zcode_iceberg_spark.operators import timeseries as ops
from zcode_iceberg_spark.sources.tables import events_ticks


def test_expression_and_udf_classifiers_agree(spark, sf_dir):
    s = ops.sequence_windows(events_ticks(spark, sf_dir), seq_len=10, horizon=5)
    a = ops.trend_classifier(s, seq_len=10)
    b = ops.trend_classifier_udf(s, seq_len=10)
    key = lambda r: (r["user_id"], r["event_id"])
    am = {key(r): (round(r["trend_score"], 9), r["trend_pred"]) for r in a.collect()}
    bm = {key(r): (round(r["trend_score"], 9), r["trend_pred"]) for r in b.collect()}
    assert len(am) == len(bm) > 0
    assert am == bm


def test_external_weights_probe_matches_file(spark, sf_dir):
    """The external-weights path must deliver the FILE's parameters,
    not code defaults: recompute the probe scores driver-side from the
    npz and pin equality."""
    import numpy as np

    w = ops.load_trend_weights()
    pw = np.asarray(w["probe_w"], dtype=np.float64)
    pb = float(w["probe_b"])
    s = ops.sequence_windows(events_ticks(spark, sf_dir), seq_len=10, horizon=5)
    got = {
        (r["user_id"], r["event_id"]): (r["trend_score"], r["norm_seq"])
        for r in ops.trend_classifier_external(s)
        .select("user_id", "event_id", "trend_score", "norm_seq")
        .collect()
    }
    assert got
    for key, (score, norm_seq) in got.items():
        z = 0.0
        for i in range(10):
            z += norm_seq[i] * pw[i]
        z += pb
        want = 1.0 / (1.0 + np.exp(-z))
        assert abs(score - want) < 1e-12, (key, score, want)


def test_lstm_forward_through_seam(spark, sf_dir):
    """The reference-shaped LSTM (1→64×2 + fc 64→3) run through the
    broadcast-weights seam: valid probability rows, deterministic
    across runs, and bit-matching a driver-side numpy recomputation —
    the I/O contract a torch-trained export drops into."""
    import numpy as np

    s = ops.sequence_windows(
        events_ticks(spark, sf_dir), seq_len=10, horizon=5
    ).limit(200)
    out = ops.lstm_trend_scores(s)
    rows = out.select(
        "user_id", "event_id", "p_down", "p_range", "p_up", "trend_pred",
        "norm_seq",
    ).collect()
    assert rows
    w = ops.load_trend_weights()
    # shape contract: the blob really is the reference TrendLSTM's
    assert w["weight_ih_l0"].shape == (256, 1)
    assert w["weight_hh_l1"].shape == (256, 64)
    assert w["fc_weight"].shape == (3, 64)

    def forward(seq):
        x = np.asarray(seq, dtype=np.float64)[None, :, None]
        for layer in (0, 1):
            wi, wh = w[f"weight_ih_l{layer}"], w[f"weight_hh_l{layer}"]
            b = w[f"bias_ih_l{layer}"] + w[f"bias_hh_l{layer}"]
            hid = wh.shape[1]
            h = np.zeros((1, hid))
            c = np.zeros((1, hid))
            outs = np.empty((1, x.shape[1], hid))
            for t in range(x.shape[1]):
                gates = x[:, t, :] @ wi.T + h @ wh.T + b
                i_g, f_g, g_g, o_g = np.split(gates, 4, axis=1)
                i_g = 1 / (1 + np.exp(-i_g))
                f_g = 1 / (1 + np.exp(-f_g))
                o_g = 1 / (1 + np.exp(-o_g))
                c = f_g * c + i_g * np.tanh(g_g)
                h = o_g * np.tanh(c)
                outs[:, t, :] = h
            x = outs
        logits = h @ w["fc_weight"].T + w["fc_bias"]
        e = np.exp(logits - logits.max())
        return (e / e.sum())[0]

    # trained class ids (build_lstm_dataset / reference
    # data_manager.py:839-884): softmax index 0=UP, 1=DOWN, 2=RANGE
    for r in rows[:25]:
        p = forward(r["norm_seq"])
        assert abs(r["p_up"] - p[0]) < 1e-9
        assert abs(r["p_down"] - p[1]) < 1e-9
        assert abs(r["p_range"] - p[2]) < 1e-9
        assert abs(r["p_down"] + r["p_range"] + r["p_up"] - 1.0) < 1e-9

    # determinism across independent runs
    again = {
        (r["user_id"], r["event_id"]): (r["p_down"], r["p_range"], r["p_up"])
        for r in ops.lstm_trend_scores(s).collect()
    }
    first = {
        (r["user_id"], r["event_id"]): (r["p_down"], r["p_range"], r["p_up"])
        for r in rows
    }
    assert first == again


def test_train_once_persist_and_serve(spark, sf_dir, tmp_path):
    """H10 end-to-end: distributed gradient training → npz persistence
    → serving through the external-weights seam. Pins that (a) the
    loss trajectory is strictly decreasing (the gradients really
    descend), (b) training is bit-deterministic across runs (the
    micro-unit quantization claim), (c) the served scores come from
    the TRAINED blob, not defaults."""
    import numpy as np

    s = ops.sequence_windows(events_ticks(spark, sf_dir), seq_len=10, horizon=5)
    w1, b1, hist1 = ops.train_trend_probe(s)
    losses = [h["loss_micro"] for h in hist1]
    assert losses == sorted(losses, reverse=True)
    assert losses[-1] < losses[0]
    w2, b2, hist2 = ops.train_trend_probe(s)
    assert list(w1) == list(w2) and b1 == b2
    assert hist1 == hist2

    path = ops.save_trained_probe(w1, b1, str(tmp_path / "trained"))
    loaded = ops.load_trend_weights(path)
    assert list(loaded["probe_w"]) == list(w1)
    served = ops.trend_classifier_external(s.limit(50), weights_path=path)
    rows = served.select("trend_score", "norm_seq").collect()
    assert rows
    for r in rows:
        z = 0.0
        for i in range(10):
            z += r["norm_seq"][i] * w1[i]
        z += b1
        assert abs(r["trend_score"] - 1.0 / (1.0 + np.exp(-z))) < 1e-12


def test_sql_functions_match_column_api(spark):
    """The SQL-macro registrations must inline the SAME arithmetic as
    the Column builders — exact float equality, not approximate."""
    from pyspark.sql import functions as F

    from zcode_iceberg_spark.functions.scalar import (
        clamp,
        kelly_fraction,
        normal_cdf,
        sigmoid,
    )
    from zcode_iceberg_spark.functions.sqlfuncs import register_sql_functions

    names = register_sql_functions(spark)
    assert set(names) == {"norm_cdf", "sigmoid", "clamp", "kelly"}

    xs = [x / 7.0 for x in range(-30, 31)]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    df.createOrReplaceTempView("probe_v")
    via_sql = spark.sql(
        """
        SELECT x, norm_cdf(x) AS phi, sigmoid(x) AS sig,
               clamp(x, -1.0, 1.0) AS cl,
               kelly(clamp(x, 0.0, 1.0), 3.33, 0.02) AS k
        FROM probe_v
        """
    ).collect()
    via_col = df.select(
        "x",
        normal_cdf(F.col("x")).alias("phi"),
        sigmoid(F.col("x")).alias("sig"),
        clamp(F.col("x"), -1.0, 1.0).alias("cl"),
        kelly_fraction(clamp(F.col("x"), 0.0, 1.0)).alias("k"),
    ).collect()
    a = {r["x"]: (r["phi"], r["sig"], r["cl"], r["k"]) for r in via_sql}
    b = {r["x"]: (r["phi"], r["sig"], r["cl"], r["k"]) for r in via_col}
    assert a == b


def test_classifier_seam_model_contract(spark):
    """Golden I/O contract for the I1 real-model seam: the pandas_udf
    receives fixed-length float sequences and must emit σ(w·x) for the
    documented ramp weights — pinned here against a hand-computed
    value so swapping in a real forward pass that changes shape or
    scaling fails loudly instead of silently drifting."""
    import math

    from pyspark.sql import functions as F

    seq_len = 10
    weights = [(i - (seq_len - 1) / 2.0) / seq_len for i in range(seq_len)]
    seqs = [
        [float(i) for i in range(seq_len)],          # rising ramp → UP-ish
        [float(seq_len - i) for i in range(seq_len)],  # falling → DOWN-ish
        [0.0] * seq_len,                              # flat → exactly 0.5
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], "id long, norm_seq array<double>"
    )
    got = {
        r["id"]: r["trend_score"]
        for r in ops.trend_classifier_udf(df, seq_len=seq_len).collect()
    }
    for i, s in enumerate(seqs):
        z = sum(w * x for w, x in zip(weights, s))
        want = 1.0 / (1.0 + math.exp(-z))
        assert abs(got[i] - want) < 1e-12, (i, got[i], want)
    assert got[2] == 0.5


def test_media_decode_seam_contract(spark, sf_dir):
    """Golden contract for the media decode seam: exact output schema,
    byte-arithmetic values pinned against an independent hashlib
    recomputation, and the real-decoder stub raising at evaluation —
    the three things a PIL/ffmpeg drop-in must preserve."""
    import hashlib

    import pytest as _pytest

    from zcode_iceberg_spark.operators.media import (
        FRAME_SCHEMA,
        MEDIA_SCHEMA,
        decode_media,
        sample_frames,
    )
    from zcode_iceberg_spark.suite.media import with_payload
    from zcode_iceberg_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = with_payload(docs)
    decoded = decode_media(media, use_real_decoder=False)
    assert decoded.schema == MEDIA_SCHEMA

    # independent recomputation of the fake-decode byte arithmetic
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in decoded.collect():
        b = hashlib.md5(texts[r["doc_id"]].encode()).digest()
        assert r["payload_len"] == 16
        assert r["width"] == 64 + b[0] % 192
        assert r["height"] == 64 + b[1] % 192
        assert r["channels"] == 1 + b[2] % 4
        assert abs(r["mean_byte"] - sum(b) / len(b)) < 1e-12

    frames = sample_frames(media, every_n=4)
    assert frames.schema == FRAME_SCHEMA
    by_doc = {}
    for r in frames.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc, "fixture contains no video docs"
    for doc_id, rows in by_doc.items():
        assert doc_id % 3 == 2  # only video docs fan out
        b = hashlib.md5(texts[doc_id].encode()).digest()
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
        for r in rows:
            assert r["frame_byte"] == b[r["frame_idx"] * 4]

    # resize: image-only contraction, exact NN byte arithmetic
    from zcode_iceberg_spark.operators.media import RESIZE_SCHEMA, resize_media

    rz = resize_media(media, out_w=8, out_h=8, use_real_decoder=False)
    assert rz.schema == RESIZE_SCHEMA
    rz_rows = {r["doc_id"]: r for r in rz.collect()}
    assert rz_rows, "fixture contains no image docs"
    assert all(doc_id % 3 == 0 for doc_id in rz_rows)  # images only
    for doc_id, r in rz_rows.items():
        b = hashlib.md5(texts[doc_id].encode()).digest()
        w, h = 64 + b[0] % 192, 64 + b[1] % 192
        total = sum(
            b[(((y * h) // 8) * w + (x * w) // 8) % 16]
            for y in range(8)
            for x in range(8)
        )
        assert r["resized_sum"] == total
        assert abs(r["resized_mean"] - total / 64.0) < 1e-12

    # the real-codec path, parametrized by the environment probe:
    # with PIL installed the auto path decodes a genuine PNG payload;
    # without it, pinning use_real_decoder=True must fail loudly at
    # evaluation time (never silently fall back to the fake)
    from zcode_iceberg_spark.operators.media import _pil_image

    Image = _pil_image()
    if Image is None:
        with _pytest.raises(
            Exception, match="NotImplementedError|real media decoding"
        ):
            decode_media(media, use_real_decoder=True).collect()
        with _pytest.raises(
            Exception, match="NotImplementedError|real image resizing"
        ):
            resize_media(media, use_real_decoder=True).collect()
    else:
        import io

        buf = io.BytesIO()
        Image.new("RGB", (5, 3), color=(10, 20, 30)).save(buf, format="PNG")
        png = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()), "image")],
            "doc_id long, payload binary, media_type string",
        )
        real = decode_media(png, use_real_decoder=True).collect()
        assert (real[0]["width"], real[0]["height"], real[0]["channels"]) == (
            5, 3, 3,
        )
        thumb = resize_media(png, out_w=2, out_h=2, use_real_decoder=True)
        r = thumb.collect()[0]
        assert (r["out_w"], r["out_h"]) == (2, 2)
        assert r["resized_sum"] > 0  # grayscale of a constant-color fill
