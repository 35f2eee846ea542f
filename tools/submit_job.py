"""Cluster-submittable entry point (north_rule: jobs launched via
``spark-submit --py-files`` on multi-executor clusters at N and 4N
executors).

The driver script deliberately builds NO SparkSession config beyond the
app name: master, executor counts, memory, and shuffle partitions come
from spark-submit flags, exactly as a cluster run would set them:

    python tools/package_pyfiles.py                 # → .scratch/bucketizers_spark.zip
    spark-submit --py-files .scratch/bucketizers_spark.zip \
        --master <cluster-or-local[N]> \
        --conf spark.sql.shuffle.partitions=<4x executors> \
        tools/submit_job.py <input.parquet> <sink_dir> [mode] [page_size]

Runs the flagship streaming-shaped job in its batch-parity form: the
token-prefix trie over the input, writing assignments + relations to the
idempotent sink (batch id 0), printing one JSON line of throughput.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession

    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    inp, sink_dir = sys.argv[1], sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "token"
    page_size = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    spark = SparkSession.builder.appName("bucketizers-submit").getOrCreate()
    from bucketizers_spark.operators.substring import (
        substring_trie,
        token_prefix_trie,
    )
    from bucketizers_spark.sinks.idempotent import IdempotentParquetSink

    df = spark.read.parquet(inp)
    t0 = time.time()
    if mode == "token":
        res = token_prefix_trie(df, "tokens", page_size=page_size, max_depth=6)
    else:
        res = substring_trie(df, "text", page_size=page_size, max_depth=8,
                             seq_col="seq")
    sink = IdempotentParquetSink(sink_dir)
    sink.foreach_batch()(res.assignments, 0)
    rel_sink = IdempotentParquetSink(sink_dir + "/_relations")
    rel_sink.write_batch(res.relations, 0)
    n = sink.read_all(spark).count()
    dt = time.time() - t0
    print(json.dumps({
        "rows": n,
        "secs": round(dt, 2),
        "rows_per_sec": round(n / dt),
        "executors": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
