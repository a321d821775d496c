"""Same-session warm A/B timing for named suite queries (the PLANS.md
variance protocol): one warm-up query, then N reps per query via the
noop sink, printing each rep and the min. Usage:

    python tools/warm_ab.py [reps] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zcode_iceberg_spark.session import get_spark
from zcode_iceberg_spark.suite import registry


def main() -> None:
    args = sys.argv[1:]
    reps = int(args.pop(0)) if args and args[0].isdigit() else 3
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="warm-ab")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    # warm-up: JVM + parquet footers + codegen
    reg["delta_zscore"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        times = []
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: {times} min={min(times)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
