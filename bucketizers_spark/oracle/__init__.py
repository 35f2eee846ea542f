from bucketizers_spark.oracle.reference import (  # noqa: F401
    BasicOracle,
    BucketizeOutput,
    Relation,
    SubjectPageOracle,
    SubstringOracle,
    normalize_subject,
    normalize_substring,
)
