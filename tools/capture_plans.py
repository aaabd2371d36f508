"""Capture .explain('formatted') output for named queries into
plans/r06/<query>_<suffix>.txt (judge-checkable plan evidence).

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
       [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf1.0"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        del argv[i : i + 2]
    suffix, names = argv[0], argv[1:]

    from brink_spark.queries import ALL_QUERIES
    from brink_spark.session import get_spark

    spark = get_spark(
        "local[8]", shuffle_partitions=32,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = ALL_QUERIES[name][0]
        df = fn(spark, sf)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_text(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
