"""Capture ``explain("formatted")`` for named suite queries.

Usage:

    python tools/capture_plans.py OUTDIR SUFFIX name [name ...]
    python tools/capture_plans.py --repo /path/to/checkout OUTDIR SUFFIX name ...

Writes ``OUTDIR/<name>_<SUFFIX>.txt`` per query (the judge-facing
plan evidence for optimization rounds: ``plans/rN/<q>_before.txt`` /
``..._after.txt``). ``--repo`` points the registry import at another
checkout (e.g. a worktree of the pre-optimization commit) so "before"
plans are captured from the code that actually produced them.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main() -> None:
    args = sys.argv[1:]
    repo = str(Path(__file__).resolve().parent.parent)
    if args and args[0] == "--repo":
        repo = str(Path(args[1]).resolve())
        args = args[2:]
    outdir, suffix, *names = args
    sys.path.insert(0, repo)

    from zcode_iceberg_spark.session import get_spark
    from zcode_iceberg_spark.suite import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    Path(outdir).mkdir(parents=True, exist_ok=True)
    for name in names:
        if name not in reg:
            print(f"## {name}: not in registry, skipped", file=sys.stderr)
            continue
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = Path(outdir) / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"## wrote {path} ({plan.count(chr(10))} lines)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
