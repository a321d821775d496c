"""Skew-join demonstration (VERDICT r9 #7): measure the salted and
AQE-skew plans against the naive shuffle join on a deliberately
Zipf-skewed fixture, and pin the salted plan shape.

Fixture: LEFT = N_ROWS fact rows with a ~64-byte payload over N_KEYS
join keys where the hot key holds HOT_FRAC of all rows (≈2000× a
uniform key's share); RIGHT = one dimension row per key, made
non-broadcastable (autoBroadcastJoinThreshold=-1) and MERGE-hinted so
the join runs as the big×big SORT-MERGE join it would be at 100 TB
(a hash join of the dimension side is the local-mode escape hatch —
at cluster scale both sides of a big join shuffle and sort, and the
hot key's partition serializes the stage).

Three arms, identical results (row count + checksum asserted):
  naive  — AQE skew handling OFF: the hot key lands in ONE shuffle
           partition; stage time = that straggler's sort.
  salted — operators/joins.py:salted_join, AQE skew OFF: the hot
           key's rows split across n_salt partitions by a
           deterministic row-hash salt; the right side replicates
           n_salt× (tiny).
  aqe    — plain join with spark.sql.adaptive.skewJoin.enabled=true:
           AQE splits the oversized partition at runtime (no code
           change, but only fires for sort-merge joins past its size
           thresholds; salting is the planner-independent form and
           also covers aggregations via salted_agg).

Each arm runs twice and records the min (JIT/page-cache fairness).
Prints one JSON line; run from the repo root:

    python tools/skew_smoke.py [N_ROWS]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from zcode_iceberg_spark.operators.joins import salted_join
from zcode_iceberg_spark.session import get_spark

N_KEYS = 4096
HOT_FRAC = 0.5  # hot key's share of left rows (≈2048× uniform)
N_SALT = 32


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # the skewed fact: key = 0 (hot) for HOT_FRAC of rows, else uniform;
    # ~64-byte payload so the hot partition's shuffle+sort is real work
    left = (
        spark.range(n_rows)
        .select(
            F.when(
                (F.col("id") % F.lit(int(1 / HOT_FRAC))) == 0, F.lit(0)
            )
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
            F.concat(F.md5(F.col("id").cast("string")),
                     F.md5((F.col("id") + 1).cast("string"))).alias("pay"),
        )
        .persist()
    )
    right = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        .persist()
    )
    left.count()
    right.count()

    def run_once(skew_aqe: bool, salted: bool) -> tuple[float, int, int]:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower()
        )
        # local-mode partitions are far below the cluster-default 256m
        # skew threshold; scale it down so AQE's detector sees the same
        # RELATIVE skew a cluster would (factor-5 default unchanged)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32m",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m"
        )
        t0 = time.time()
        l = left.hint("MERGE")
        j = salted_join(l, right, "k", n_salt=N_SALT) if salted else l.join(
            right, "k"
        )
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("w") + F.length("pay"))
            .cast("bigint")
            .alias("chk"),
        ).collect()[0]
        return round(time.time() - t0, 2), row["n"], row["chk"]

    def run(tag: str, skew_aqe: bool, salted: bool) -> tuple[float, int, int]:
        a = run_once(skew_aqe, salted)
        b = run_once(skew_aqe, salted)
        assert a[1:] == b[1:]
        dt = min(a[0], b[0])
        print(f"## {tag}: {dt}s (runs {a[0]}/{b[0]}) n={a[1]}",
              file=sys.stderr, flush=True)
        return dt, a[1], a[2]

    t_naive, n1, c1 = run("naive (no AQE skew)", skew_aqe=False, salted=False)
    t_salt, n2, c2 = run("salted_join", skew_aqe=False, salted=True)
    t_aqe, n3, c3 = run("AQE skew join", skew_aqe=True, salted=False)
    assert n1 == n2 == n3 and c1 == c2 == c3, (n1, n2, n3, c1, c2, c3)
    print(
        json.dumps(
            {
                "rows": n_rows,
                "hot_frac": HOT_FRAC,
                "n_keys": N_KEYS,
                "n_salt": N_SALT,
                "naive_sec": t_naive,
                "salted_sec": t_salt,
                "aqe_sec": t_aqe,
                "speedup_salted": round(t_naive / t_salt, 2),
                "speedup_aqe": round(t_naive / t_aqe, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
