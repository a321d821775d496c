"""Benchmark harness: runs the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via the noop sink (full pipeline
runs, results are materialized and discarded — measures engine time,
not driver collect time). One warm-up query runs first so JVM/codegen
startup is not billed to the first measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zcode_iceberg_spark.session import get_spark
from zcode_iceberg_spark.suite import registry


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="zcode-iceberg-bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry()
    # warm-up: JVM + parquet footer reads + codegen
    reg["delta_zscore"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name, q in sorted(reg.items()):
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        print(f"## {name} {times[name]:.3f}s", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
