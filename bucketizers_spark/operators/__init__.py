from bucketizers_spark.operators.core import BucketizeResult  # noqa: F401
from bucketizers_spark.operators.basic import basic_pager, fallback_pager  # noqa: F401
from bucketizers_spark.operators.subject_page import subject_page  # noqa: F401
from bucketizers_spark.operators.substring import substring_trie  # noqa: F401
from bucketizers_spark.operators.time_window import (  # noqa: F401
    session_bucketizer,
    sliding_bucketizer,
    tumbling_bucketizer,
)
from bucketizers_spark.operators.graph import connected_components  # noqa: F401
from bucketizers_spark.operators.lsh import (  # noqa: F401
    lsh_candidate_pairs,
    sign_lsh_buckets,
)
