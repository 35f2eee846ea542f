from bucketizers_spark.sources.synthetic import token_stream_pdf  # noqa: F401
from bucketizers_spark.sources.ntriples import (  # noqa: F401
    member_quads,
    read_ntriples,
)
from bucketizers_spark.sources.warc import (  # noqa: F401
    http_payload_text,
    parse_warc_bytes,
    read_warc,
)
