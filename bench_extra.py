"""Focused per-query benchmark for optimization work (r07).

Unlike the frozen bench.py (driver contract: count() action, full
HEADLINE list), this times an arbitrary subset of queries with the
noop sink (guide §1.4 — computes every column of every row, no
collect/count pruning), min-of-N interleaved trials, at any SF dir.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--trials N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def main() -> None:
    args = sys.argv[1:]
    trials = 3
    if args and args[0] == "--trials":
        trials = int(args[1])
        args = args[2:]
    names = args
    if not names:
        print("usage: bench_extra.py [--trials N] query ...", file=sys.stderr)
        sys.exit(2)

    from bucketizers_spark.entry_queries import QUERIES
    from bucketizers_spark.plans.session import get_spark

    spark = get_spark("bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    from pyspark.sql import functions as F

    def _warm(p):
        import numpy  # noqa: F401

        return p

    spark.range(0, 256, 1, 32).withColumn("g", F.col("id") % 32).groupBy(
        "g"
    ).applyInPandas(_warm, "id long, g long").count()

    timings: dict[str, float] = {}
    for t in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            prev = timings.get(name)
            timings[name] = dt if prev is None else min(prev, dt)
            print(f"# trial {t + 1}: {name} {dt}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "trials": trials,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
