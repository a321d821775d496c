"""Local mirror of the external driver's t2 correctness gate.

Runs the FIRST ``WINDOW`` registry entries (exactly what the driver
hash-checks) under a PLAIN SparkSession — Spark 4 defaults, none of
``session.get_spark``'s configs, because the real driver doesn't use
them — at the given scale factor, comparing each query against its
DuckDB oracle with the bit-exact harness (tests/harness.py).

Usage (from the repo root):

    python tools/driver_gate.py [sf_dir] [name ...]

Defaults: sf_dir=/root/testdata/sf0.01, names=the driver window
(first WINDOW registry entries). Pass explicit names to spot-check a
subset. Exit code 0 iff every checked query is green.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import SparkSession

    from tests.harness import compare, duck_connection
    from zcode_iceberg_spark.suite import WINDOW, registry
    import __spark_entry__ as entry_mod

    args = sys.argv[1:]
    # classify each arg against the REGISTRY first (a known query name
    # always wins, even if a same-named directory exists in cwd), then
    # as an existing sf_dir; anything else is an error — a mistyped
    # path or query must never silently run the gate against the
    # default corpus
    import os

    reg = registry()
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    for a in args:
        if a in reg:
            names.append(a)
        elif os.path.isdir(a):
            sf_dir = a
        else:
            print(
                f"error: '{a}' is neither a registry query name nor an "
                "existing directory"
            )
            return 2

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("driver-gate-sim")
        .getOrCreate()
    )
    entry_mod._configure(spark)
    if not names:
        names = list(reg)[:WINDOW]
    con = duck_connection(sf_dir)
    failures: list[str] = []
    for i, name in enumerate(names, 1):
        q = reg[name]
        t0 = time.time()
        try:
            if q.oracle is None:
                n = q.fn(spark, sf_dir).count()
                print(f"[{i:2d}/{len(names)}] {name}: rows-only ({n}) "
                      f"{time.time()-t0:.1f}s", flush=True)
                continue
            compare(q.fn(spark, sf_dir), con, q.oracle, name)
            print(f"[{i:2d}/{len(names)}] {name}: OK {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            failures.append(name)
            msg = str(e).splitlines()[0][:300]
            print(f"[{i:2d}/{len(names)}] {name}: FAIL {msg}", flush=True)
            traceback.print_exc(limit=2)
    print(f"\n{len(names) - len(failures)}/{len(names)} green"
          + (f"; FAILURES: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
