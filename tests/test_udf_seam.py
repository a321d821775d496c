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
