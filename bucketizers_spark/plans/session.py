"""SparkSession construction tuned for the engine.

Settings rationale (100 TB design, local[N] testing — SURVEY.md §4.2):
- AQE on: runtime partition coalescing + skew-join splitting for the
  relational glue around the stateful operators.
- Arrow on with a bounded batch size: every strategy kernel is a
  vectorized pandas/Arrow UDF (input_hint: no per-row Python); batch
  size bounds Python-worker memory at wide rows (token arrays).
- shuffle.partitions defaults to cores in local mode; a real cluster
  run overrides via spark-submit conf (sized so state+shuffle
  partitions fit executor memory at the target SF).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bucketizers-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cores]`` (e.g. a
    standalone ``spark://host:port`` for the process-isolated scaling
    bench, tools/bench_scaling_procs.py); ``cores`` then only sizes
    shuffle partitions unless the caller caps spark.cores.max itself."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
