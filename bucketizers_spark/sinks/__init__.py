from bucketizers_spark.sinks.idempotent import IdempotentParquetSink  # noqa: F401
