"""URL canonicalization and identity hashing.

Reference identity: ``Request.Unique() = hex(md5(Url + Method))`` over
the *raw* URL (reference collect/request.go:95-98 — no canonicalization
anywhere in the Go engine). The north_star spec *adds* canonicalization
before hashing: lowercase host, strip fragment, strip default port,
sort query params. So the engine's seen-set key is
``md5(canonicalize(url) + method)``; ``url_hash_expr`` keeps the md5
JVM-side (whole-stage codegen) and only the canonical form itself is a
pandas UDF (string surgery with urllib — vectorized per Arrow batch,
never per-row Spark UDF).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical form: scheme+host lowercased, default port stripped,
    fragment stripped, query params sorted (stable for equal keys),
    empty path → "/". Invalid URLs pass through unchanged."""
    if not url:
        return url
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if "@" in netloc:
        userinfo, _, hostport = netloc.rpartition("@")
        userinfo += "@"
    else:
        userinfo, hostport = "", netloc
    if ":" in hostport and not hostport.endswith("]"):
        host, _, port = hostport.rpartition(":")
        if port == _DEFAULT_PORTS.get(scheme, None):
            hostport = host
    netloc = userinfo + hostport
    path = parts.path or ("/" if netloc else "")
    query = parts.query
    if query:
        query = "&".join(sorted(query.split("&")))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of_url(url: str) -> str:
    """Lowercased host (no port) — the politeness / partitioning key."""
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    return (parts.hostname or "").lower()


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


@pandas_udf(StringType())
def host_of_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of_url(u) if u is not None else None)


def url_hash_expr(canon_url: Column, method: Column | str = "GET") -> Column:
    """``md5(canonical_url || method)`` — seen-set key.

    Parity with reference collect/request.go:95-98 (md5 of url+method,
    hex-encoded) except the url is canonical per the north_star. Stays
    in the JVM (builtin ``md5``/``concat``) so dedup hashing never
    leaves whole-stage codegen.
    """
    m = F.lit(method) if isinstance(method, str) else method
    return F.md5(F.concat(canon_url, m))


def with_url_identity(df, url_col: str = "url", method_col: str | None = "method"):
    """Add canonical url, host, and url_hash columns to a frontier df."""
    canon = canonicalize_udf(F.col(url_col))
    method = F.col(method_col) if method_col else F.lit("GET")
    return (
        df.withColumn("canon_url", canon)
        .withColumn("host", host_of_udf(F.col(url_col)))
        .withColumn("url_hash", url_hash_expr(F.col("canon_url"), method))
    )
