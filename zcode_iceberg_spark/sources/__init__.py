from zcode_iceberg_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_all,
    events_ticks,
)
