"""Solo per-entry timing harness (optimization rounds).

Usage: python scripts/time_entry.py <name> [<name> ...] [--runs N]

Times each named registry entry exactly like bench.py does (plan →
noop sink on the warm session), printing every run plus the min —
the steady-state number the bench would record. Keeps the bench
contract untouched; this is a measurement-only tool.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from glamira_end_to_end_data_pipeline_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        if i + 1 >= len(args) or not args[i + 1].isdigit():
            sys.exit("usage: time_entry.py <name> [...] [--runs N]")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = queries()
    unknown = [n for n in args if n not in qs]
    if unknown or not args:
        sys.exit(
            f"unknown entries: {unknown or '(none given)'}; available: "
            + ", ".join(sorted(qs))
        )
    spark = get_spark(app_name="time_entry")

    def consume(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmup as bench.py: JVM/codegen + Arrow worker pool
    consume(qs["flagship_daily_events"](spark, sf_dir))
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def __warm(v):
        return v

    consume(
        spark.range(0, 1024, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(__warm((F.col("id") * 1.0).alias("v")).alias("w"))
    )

    for name in args:
        ts = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            consume(qs[name](spark, sf_dir))
            ts.append(round(time.time() - t0, 3))
        print(f"{name}: runs={ts} min={min(ts)}")


if __name__ == "__main__":
    main()
