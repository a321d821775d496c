from zcode_iceberg_spark.functions.scalar import (  # noqa: F401
    clamp,
    sigmoid,
    normal_cdf,
    weighted_mean_available,
    kelly_fraction,
)
