"""Vectorized scalar functions (pandas/Arrow UDFs + column helpers)."""

from crawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize_udf,
    canonicalize_url,
    host_of_udf,
    host_of_url,
    url_hash_expr,
    with_canon_host,
)
