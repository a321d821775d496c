"""Profile one suite query: run it warm N times, then dump per-stage
wall/CPU/io per rep from the local Spark UI REST API.
Usage: python tools/profile_query.py name [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zcode_iceberg_spark.session import get_spark
from zcode_iceberg_spark.suite import registry


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    reg["delta_zscore"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    marks = [0]
    for i in range(reps):
        t0 = time.time()
        reg[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"rep {i}: {time.time() - t0:.2f}s", flush=True)
        # record the max stage id so far to bucket stages by rep
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages"
        ) as r:
            stages = json.load(r)
        marks.append(max(s["stageId"] for s in stages) + 1)
    done = [s for s in stages if s.get("status") == "COMPLETE"]
    for i in range(reps):
        lo, hi = marks[i], marks[i + 1]
        rep_stages = [s for s in done if lo <= s["stageId"] < hi]
        rep_stages.sort(key=lambda s: s["stageId"])
        print(f"\n== rep {i}: {len(rep_stages)} stages ==")
        print(f"{'stage':>6} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} "
              f"{'in_MB':>7} {'sh_rd_MB':>8} {'sh_wr_MB':>8} {'rows_in':>9}")
        for s in rep_stages:
            if (s.get("executorRunTime") or 0) < 500:
                continue
            print(f"{s['stageId']:>6} {s.get('numCompleteTasks', 0):>5} "
                  f"{(s.get('executorRunTime') or 0)/1e3:>7.2f} "
                  f"{(s.get('executorCpuTime') or 0)/1e9:>7.2f} "
                  f"{(s.get('inputBytes') or 0)/1e6:>7.1f} "
                  f"{(s.get('shuffleReadBytes') or 0)/1e6:>8.1f} "
                  f"{(s.get('shuffleWriteBytes') or 0)/1e6:>8.1f} "
                  f"{(s.get('inputRecords') or 0):>9}")
    spark.stop()


if __name__ == "__main__":
    main()
