from bucketizers_spark.functions.normalize import (  # noqa: F401
    normalize_subject_col,
    normalize_substring_col,
)
