"""Interleaved same-session A/B of runtime SQL confs on named queries.

Arm A = session defaults, arm B = the given conf overrides; reps are
interleaved (A,B,A,B,...) so host drift hits both arms equally — the
PLANS.md protocol that made the r12 preferSortMergeJoin verdict
admissible. Usage:

    python tools/ab_conf.py [reps] "key=value;key=value" name [name ...]
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
    confs = dict(
        kv.split("=", 1) for kv in args.pop(0).split(";") if kv.strip()
    )
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    defaults = {k: spark.conf.get(k, None) for k in confs}
    reg["delta_zscore"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name: str) -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        reg[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    for name in names:
        a_times, b_times = [], []
        for _ in range(reps):
            for k, v in defaults.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            a_times.append(run(name))
            for k, v in confs.items():
                spark.conf.set(k, v)
            b_times.append(run(name))
        print(
            f"{name}: A={a_times} min={min(a_times)} | "
            f"B={b_times} min={min(b_times)} | "
            f"B/A={min(b_times) / max(min(a_times), 1e-9):.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
