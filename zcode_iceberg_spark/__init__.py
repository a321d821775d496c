"""zcode_iceberg_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capability surface of
``shivam-dave12/zcode-iceberg`` (a streaming market-microstructure
analytics system — see SURVEY.md), rebuilt Spark-first:

- sliding-window / resampling time-series analytics as DataFrame window
  and aggregate expressions (JVM-side, whole-stage codegen),
- scalar scoring math as Catalyst expressions,
- irreducible kernels (EMA recursion, stateful hysteresis/FSM) as
  bounded-window folds or ``applyInPandas``,
- relational star-schema queries with broadcast/sort-merge joins,
- LLM-data-pipeline operators (dedup, similarity search, text analysis)
  over document/embedding tables,
- Structured Streaming wrappers (watermarks, event-time windows,
  stateful processing) mirroring the batch operators.

Every operator is a pure ``DataFrame -> DataFrame`` function designed to
survive a 1000-executor 100 TB deployment: partition-aware, shuffle-
minimal, filter-pushdown-friendly.
"""

__version__ = "0.1.0"

from zcode_iceberg_spark.session import get_spark  # noqa: F401
