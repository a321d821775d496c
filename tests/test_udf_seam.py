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
