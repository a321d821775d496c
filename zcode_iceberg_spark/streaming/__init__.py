from zcode_iceberg_spark.streaming.pipeline import (  # noqa: F401
    EVENT_SCHEMA,
    hysteresis_stream,
    iceberg_refill_step,
    iceberg_refill_stream,
    funnel_step,
    funnel_stream,
    run_available_now,
    stream_events,
    stream_events_raw,
    tumbling_ohlc_stream,
    windowed_delta_stream,
)
