from bucketizers_spark.sources.synthetic import token_stream_pdf  # noqa: F401
