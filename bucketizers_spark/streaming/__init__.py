from bucketizers_spark.streaming.stateful import (  # noqa: F401
    subject_page_stream,
)
