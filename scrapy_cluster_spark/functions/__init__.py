"""Vectorized pandas/Arrow UDF layer.

The reference runs arbitrary scalar CPython everywhere; the rebuild
confines custom logic to exactly the points SURVEY.md §2.8 lists, each
as an Arrow-batched pandas UDF (input_hint: no per-row Python UDFs).
Everything else is built-in Spark SQL and stays JVM-side.
"""

from scrapy_cluster_spark.functions.url import (  # noqa: F401
    canonicalize_url,
    canonicalize_url_udf,
    fingerprint_udf,
    parse_cookie_udf,
    request_fingerprint,
)
from scrapy_cluster_spark.functions.domains import (  # noqa: F401
    extract_domain,
    extract_domain_udf,
)
from scrapy_cluster_spark.functions.html import (  # noqa: F401
    extract_links,
    extract_links_udf,
    extract_text,
    extract_text_udf,
)
