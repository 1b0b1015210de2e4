from bingcrawler_spark.functions.canon import (  # noqa: F401
    canon_url_col,
    host_url_col,
    py_canon_url,
    py_host_url,
    py_unescape_entities,
    unescape_entities_col,
)
from bingcrawler_spark.functions.simhash import (  # noqa: F401
    hamming_col,
    py_simhash64,
    py_token_hash,
    simhash64_udf,
)
