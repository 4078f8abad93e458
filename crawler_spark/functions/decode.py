"""Charset detection + transcode of raw page bytes.

Reference: BaseFetch peeks 1024 bytes, runs golang.org/x/net/html/
charset.DetermineEncoding, and transcodes the body to UTF-8
(collect/collect.go:85-96). The corpus here is UTF-8 by construction,
but the hook is real: an Arrow-batched pandas UDF over the ``html``
binary column — BOM sniff → utf-8 strict → charset-lib if installed →
latin-1 fallback (never fails, mirroring DetermineEncoding's
certain=false fallback path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # optional, not present in this container
    import charset_normalizer  # type: ignore

    _HAVE_CHARDET = True
except ImportError:
    _HAVE_CHARDET = False


def decode_html_bytes(data: bytes | None) -> str | None:
    if data is None:
        return None
    head = bytes(data[:1024])
    if head.startswith(b"\xef\xbb\xbf"):
        return bytes(data)[3:].decode("utf-8", errors="replace")
    if head.startswith((b"\xff\xfe", b"\xfe\xff")):
        return bytes(data).decode("utf-16", errors="replace")
    try:
        return bytes(data).decode("utf-8")
    except UnicodeDecodeError:
        pass
    if _HAVE_CHARDET:
        best = charset_normalizer.from_bytes(bytes(data)).best()
        if best is not None:
            return str(best)
    return bytes(data).decode("latin-1")


@pandas_udf(StringType())
def decode_html_udf(html: pd.Series) -> pd.Series:
    return html.map(decode_html_bytes)
