from bucketizers_spark.sources.synthetic import token_stream_pdf  # noqa: F401
from bucketizers_spark.sources.ntriples import (  # noqa: F401
    member_quads,
    read_ntriples,
)
