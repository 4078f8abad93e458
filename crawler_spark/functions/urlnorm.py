"""URL canonicalization and identity hashing.

Reference identity: ``Request.Unique() = hex(md5(Url + Method))`` over
the *raw* URL (reference collect/request.go:95-98 — no canonicalization
anywhere in the Go engine). The north_star spec *adds* canonicalization
before hashing: lowercase host, strip fragment, strip default port,
sort query params. So the engine's seen-set key is
``md5(canonicalize(url) + method)``, all JVM-side: ``url_hash_expr``
is builtin md5/concat and ``with_canon_host`` derives the canonical
form in whole-stage codegen — a one-regex fast path for
already-shaped URLs plus a staged full urlsplit twin for the rest.
The Python functions below are the executable spec (the oracle calls
them row-wise; the pandas UDFs remain for spec-side use), equivalence
fuzz-pinned by tests/test_urlnorm.py.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, uses_netloc

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


# ---------------------------------------------------------------------------
# JVM (whole-stage-codegen) twins of canonicalize_url / host_of_url.
#
# Child-link canonicalization is the hottest scalar kernel of a crawl
# round (out_degree × batch rows — ~6M/round at the bench shape); as a
# pandas UDF it pays an Arrow round-trip plus a Python urlsplit per
# row, measured ~3× slower than the pure-expression form below. The
# Python functions above remain the executable spec (the oracle calls
# them row-wise); tests/test_urlnorm.py pins expression↔Python
# equivalence over a fuzz grammar incl. userinfo, ports, IPv6/IPvFuture
# brackets, control chars, relative refs, and query multisets.
#
# SHAPE MATTERS: the derivation is emitted as STAGED projections
# (with_canon_host), one named column per multiply-referenced
# intermediate. A single Column tree instead duplicates each subtree
# at every reference site — measured 2.9 MB of optimized plan and
# ~2.8 s of planning PER QUERY (re-paid by AQE at each stage
# boundary, 27 min of driver CPU in one crawl leg). Catalyst's
# CollapseProject keeps non-cheap multi-referenced projections staged
# instead of re-inlining them, so the staged form plans in
# milliseconds and codegens identically.
# ---------------------------------------------------------------------------

# str.strip() whitespace (Python semantics: chars where isspace() is
# true) — generated, not hand-listed, so it tracks the interpreter.
_PYWS_CLASS = "".join(
    f"\\u{c:04X}" for c in range(0x3001) if chr(c).isspace()
)

# hextet / dotted-quad building blocks for the bracket-host validator
# (mirrors ipaddress.IPv6Address: no leading-zero octets in the v4
# tail, ≤4 hex digits per hextet, one '::' compression).
_H = "[0-9A-Fa-f]{1,4}"
_V4O = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_V4 = f"{_V4O}(\\.{_V4O}){{3}}"
_PURE6 = (
    "("
    f"({_H}:){{7}}{_H}"
    f"|({_H}:){{1,7}}:"
    f"|({_H}:){{1,6}}:{_H}"
    f"|({_H}:){{1,5}}(:{_H}){{1,2}}"
    f"|({_H}:){{1,4}}(:{_H}){{1,3}}"
    f"|({_H}:){{1,3}}(:{_H}){{1,4}}"
    f"|({_H}:){{1,2}}(:{_H}){{1,5}}"
    f"|{_H}:(:{_H}){{1,6}}"
    f"|:((:{_H}){{1,7}}|:)"
    ")"
)
# urlsplit's IPvFuture check is re.match(r"\Av[a-fA-F0-9]+\..+\Z", h)
# — note the literal lowercase 'v'; an uppercase 'V' host takes the
# ipaddress branch instead, where it is equally invalid (hex has no
# 'V'), so gating on [vV] here yields identical outcomes.
_VFUTURE = "v[a-fA-F0-9]+\\..+"

# _checknetloc: a non-ASCII netloc raises ValueError when its NFKC
# form introduces one of '/?#@:'. Decomposition is per-codepoint and
# canonical composition never produces ASCII punctuation, so the check
# reduces to membership in this (Unicode-version-stable) set —
# re-derived and pinned by tests/test_urlnorm.py.
_NFKC_UNSAFE = (
    "\u2047\u2048\u2049\u2100\u2101\u2105\u2106\u2A74\uFE13\uFE16\uFE55\uFE56\uFE5F\uFE6B\uFF03\uFF0F\uFF1A\uFF1F\uFF20"
)
_USES_NETLOC = [s for s in uses_netloc if s]


_T = "__cn_"  # temp-column prefix for the staged derivation

# Fast path: one guard regex certifying a URL whose canonical form is
# derivable with cheap slices (2 regexes + substring/lower/concat)
# instead of the full ~18-op urlsplit derivation:
#   - no whitespace/control chars outside the fragment (host/path
#     classes start ≥ 0x21), so strip()/tab-CR-LF removal can only
#     touch bytes the fragment-strip discards anyway;
#   - scheme already lowercase; '//' netloc form;
#   - netloc = HOST[:PORT]: host is ASCII (mixed case OK — lower() is
#     the whole normalization), no '@' (userinfo), no '[' ']'
#     (bracket validation), port all-digits-or-empty ⇒ the only port
#     rule that can fire is the default-port strip;
#   - path present (≥ '/'; the empty-path→'/' rule can't fire) and
#     free of '?' (x3F) ⇒ no query sort; '#' (x23) ends it ⇒ the
#     optional fragment — ANY bytes — is simply cut at the first '#'
#     (urlsplit splits the fragment first, so nothing after it can
#     affect scheme/netloc/path/query);
#   - any other printable ASCII in the path — incl. uppercase and a
#     second '://' — is identity-safe: only scheme+host are
#     normalized.
# A hit skips the whole derivation (the slow chain's first staged
# column is null-gated and every downstream expression is
# null-intolerant, so codegen short-circuits it). This is the
# engine's hottest kernel (out_degree × batch rows/round) and real
# crawl hrefs overwhelmingly take this shape.
# Anchored \A..\z (NOT ^..$: Java '$' accepts a trailing newline).
_FAST_RE = (
    r"\A[a-z][a-z0-9+.\-]*://"
    r"[A-Za-z0-9._~%!$&'()*+,;=\-]+"
    r"(:[0-9]*)?"
    r"/[\x21\x22\x24-\x3E\x40-\x7E]*"
    r"(#[\s\S]*)?\z"
)
# hostport slice for guard-matched rows: ANCHORED at the first '://'
# (a later '://' in the path can't bind — cf. the
# substring_index(-1) robots bug this avoids); '([^/]*)' is exact
# because the guard's host/port classes exclude '/'
_FAST_HOSTPORT_RE = r"^[a-z][a-z0-9+.\-]*://([^/]*)/"


def _hex_ok(base: Column) -> Column:
    """ipaddress hextet grammar over a '%'-stripped bracket body; an
    embedded IPv4 tail (no leading-zero octets) is validated by
    rewriting it to '0:0' and re-checking the pure-hex grammar."""
    as_pure = F.regexp_replace(base, f"{_V4}$", "0:0")
    return F.when(
        base.rlike(f":{_V4}$"), as_pure.rlike(f"^{_PURE6}$")
    ).otherwise(base.rlike(f"^{_PURE6}$"))


def with_canon_host(df, url_col: str = "url"):
    """Add ``canon_url`` and ``host`` as pure JVM expressions — the
    whole-stage-codegen twins of ``canonicalize_url`` /
    ``host_of_url`` and the engine's hot path (children, seeds,
    streaming ingest).

    Follows CPython 3.11 urlsplit semantics step-for-step: strip
    Python-whitespace then C0/space at the edges, remove tab/CR/LF
    everywhere, scheme iff ``[A-Za-z][A-Za-z0-9+.-]*:``, netloc iff
    ``//`` follows, bracket-host validation (mismatched brackets or a
    non-IPv6/IPvFuture bracket body → ValueError → canonical form
    passes the ORIGINAL url through and host is ''), lowercase netloc,
    userinfo split at the LAST '@', default-port strip unless the
    hostport ends with ']', empty-path → '/' only under a (post-strip)
    non-empty netloc, query params sorted codepoint-wise (UTF-8 binary
    array_sort == Python str sort), urlunsplit reassembly quirks
    (netloc-less '//' paths, ``http:///x`` → ``http:/x``) included.

    Emitted as staged projections (one named ``__cn_*`` column per
    multiply-referenced intermediate, dropped at the end) — see the
    module comment for why a single Column tree is a planning-time
    trap.
    """
    t = _T
    c = F.col
    u0 = c(url_col)
    stages = [
        {t + "fast": u0.rlike(_FAST_RE)},
        {
            # Python str.strip() first; then urlsplit's own lstrip of
            # C0/space (urlsplit LSTRIPS ONLY — "some applications
            # rely on preserving trailing space", cpython
            # urllib/parse.py — but str.strip() above already took
            # trailing C0); then tab/CR/LF removed everywhere.
            #
            # Null-gated on the fast flag: a fast row's __cn_u is null,
            # and every downstream stage expression is null-intolerant,
            # so the entire slow derivation short-circuits for it.
            t + "u": F.when(~c(t + "fast"), F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        u0, f"^[{_PYWS_CLASS}]+|[{_PYWS_CLASS}]+$", ""
                    ),
                    "^[\\x00-\\x20]+",
                    "",
                ),
                "[\\t\\n\\r]",
                "",
            )),
            # fast chain (nulls for slow rows, costing only the
            # per-row flag test): fragment cut at the FIRST '#'
            t + "f_pre": F.when(c(t + "fast"), F.substring_index(u0, "#", 1)),
        },
        {
            t + "scheme_raw": F.regexp_extract(
                c(t + "u"), "^([A-Za-z][A-Za-z0-9+.\\-]*):", 1
            ),
            t + "pre_frag": F.substring_index(c(t + "u"), "#", 1),
            t + "f_scheme": F.substring_index(c(t + "f_pre"), "://", 1),
            t + "f_hpr": F.regexp_extract(
                c(t + "f_pre"), _FAST_HOSTPORT_RE, 1
            ),
        },
        {
            t + "has_scheme": c(t + "scheme_raw") != "",
            t + "scheme": F.lower(c(t + "scheme_raw")),
            t + "qraw": F.when(
                c(t + "pre_frag").contains("?"),
                c(t + "pre_frag").substr(
                    F.instr(c(t + "pre_frag"), "?") + 1,
                    F.length(c(t + "pre_frag")),
                ),
            ).otherwise(F.lit("")),
            # guard certifies netloc == HOST[:PORT], so lower() is the
            # entire netloc normalization
            t + "f_hp": F.lower(c(t + "f_hpr")),
            t + "f_path": c(t + "f_pre").substr(
                F.length(c(t + "f_scheme"))
                + F.length(c(t + "f_hpr"))
                + 4,
                F.length(c(t + "f_pre")),
            ),
        },
        {
            # at most ONE ':' (guard), so first/last splits agree
            t + "f_host": F.substring_index(c(t + "f_hp"), ":", 1),
            t + "f_port": F.when(
                c(t + "f_hp").contains(":"),
                F.substring_index(c(t + "f_hp"), ":", -1),
            ),
        },
        {
            # the only port rule that can fire on an all-digit port:
            # strip iff it string-equals the scheme default
            t + "f_netloc": F.when(
                c(t + "f_port")
                == F.when(c(t + "f_scheme").isin("http", "ws"), "80")
                .when(c(t + "f_scheme").isin("https", "wss"), "443")
                .when(c(t + "f_scheme") == "ftp", "21")
                .otherwise(F.lit("\x00")),
                c(t + "f_host"),
            ).otherwise(c(t + "f_hp")),
        },
        {
            t + "rest": F.when(
                c(t + "has_scheme"),
                c(t + "u").substr(
                    F.length(c(t + "scheme_raw")) + 2, F.length(c(t + "u"))
                ),
            ).otherwise(c(t + "u")),
            t + "sorted_q": F.array_join(
                F.array_sort(F.split(c(t + "qraw"), "&", -1)), "&"
            ),
        },
        {
            t + "netloc_raw": F.when(
                c(t + "rest").startswith("//"),
                F.regexp_extract(c(t + "rest"), "^//([^/?#]*)", 1),
            ).otherwise(F.lit("")),
        },
        {
            t + "after": F.when(
                c(t + "rest").startswith("//"),
                c(t + "rest").substr(
                    F.length(c(t + "netloc_raw")) + 3,
                    F.length(c(t + "rest")),
                ),
            ).otherwise(c(t + "rest")),
            t + "netloc_l": F.lower(c(t + "netloc_raw")),
            t + "hostinfo": F.substring_index(c(t + "netloc_raw"), "@", -1),
            t + "has_open": c(t + "netloc_raw").contains("["),
            t + "has_close": c(t + "netloc_raw").contains("]"),
            t + "after_open": F.when(
                c(t + "netloc_raw").contains("["),
                c(t + "netloc_raw").substr(
                    F.instr(c(t + "netloc_raw"), "[") + 1,
                    F.length(c(t + "netloc_raw")),
                ),
            ).otherwise(F.lit("")),
            t + "nfkc_bad": c(t + "netloc_raw").rlike(f"[{_NFKC_UNSAFE}]"),
        },
        {
            t + "bracketed": F.substring_index(c(t + "after_open"), "]", 1),
            t + "hostport": F.substring_index(c(t + "netloc_l"), "@", -1),
            t + "path": F.regexp_extract(c(t + "after"), "^([^?#]*)", 1),
            t + "hn_nb": F.substring_index(c(t + "hostinfo"), ":", 1),
            t + "hn_br": F.substring_index(
                F.when(
                    c(t + "hostinfo").contains("["),
                    c(t + "hostinfo").substr(
                        F.instr(c(t + "hostinfo"), "[") + 1,
                        F.length(c(t + "hostinfo")),
                    ),
                ).otherwise(F.lit("")),
                "]",
                1,
            ),
        },
        {
            t + "base": F.substring_index(c(t + "bracketed"), "%", 1),
            t + "scope": c(t + "bracketed").substr(
                F.instr(c(t + "bracketed"), "%") + 1,
                F.length(c(t + "bracketed")),
            ),
            t + "userinfo": c(t + "netloc_l").substr(
                F.lit(1),
                F.length(c(t + "netloc_l")) - F.length(c(t + "hostport")),
            ),
            t + "port": F.regexp_extract(c(t + "hostport"), ":([^:]*)$", 1),
        },
        {
            # ipaddress %scope rules: non-empty, no second '%'
            t + "scope_ok": F.when(
                c(t + "bracketed").contains("%"),
                (F.length(c(t + "scope")) > 0)
                & ~c(t + "scope").contains("%"),
            ).otherwise(F.lit(True)),
            t + "hostport_f": F.when(
                c(t + "hostport").contains(":")
                & ~c(t + "hostport").endswith("]")
                & (
                    c(t + "port")
                    == F.when(c(t + "scheme").isin("http", "ws"), "80")
                    .when(c(t + "scheme").isin("https", "wss"), "443")
                    .when(c(t + "scheme") == "ftp", "21")
                    .otherwise(F.lit("\x00"))
                ),
                c(t + "hostport").substr(
                    F.lit(1),
                    F.length(c(t + "hostport"))
                    - F.length(c(t + "port"))
                    - 1,
                ),
            ).otherwise(c(t + "hostport")),
            # parts.hostname semantics over the raw-case netloc
            t + "host_raw": F.lower(
                F.when(
                    c(t + "hostinfo").contains("["), c(t + "hn_br")
                ).otherwise(c(t + "hn_nb"))
            ),
        },
        {
            # urlsplit's IPvFuture check is re.match(r"\Av[a-fA-F0-9]+
            # \..+\Z") — literal lowercase 'v'; an uppercase 'V' host
            # takes the ipaddress branch where it is equally invalid
            # (hex has no 'V'), so gating on [vV] yields identical
            # outcomes.
            t + "bracket_ok": F.when(
                c(t + "bracketed").rlike("^[vV]"),
                c(t + "bracketed").rlike(f"^{_VFUTURE}$"),
            ).otherwise(c(t + "scope_ok") & _hex_ok(c(t + "base"))),
            t + "netloc_f": F.concat(c(t + "userinfo"), c(t + "hostport_f")),
        },
        {
            t + "invalid": (
                F.when(
                    c(t + "has_open") & c(t + "has_close"),
                    ~c(t + "bracket_ok"),
                ).otherwise(c(t + "has_open") != c(t + "has_close"))
            )
            | c(t + "nfkc_bad"),
            t + "path_f": F.when(
                (c(t + "path") == "") & (c(t + "netloc_f") != ""), "/"
            ).otherwise(c(t + "path")),
        },
        {
            # urlunsplit (3.11): '//' + netloc iff netloc non-empty OR
            # the scheme conventionally uses one (and the path doesn't
            # already start with '//'); a netloc-less '//x' path is
            # NOT re-slashed — canonicalize('////x') == '//x'
            t + "body0": F.when(
                (c(t + "netloc_f") != "")
                | (
                    c(t + "has_scheme")
                    & c(t + "scheme").isin(_USES_NETLOC)
                    & ~c(t + "path_f").startswith("//")
                ),
                F.concat(
                    F.lit("//"),
                    c(t + "netloc_f"),
                    F.when(
                        (c(t + "path_f") != "")
                        & ~c(t + "path_f").startswith("/"),
                        F.concat(F.lit("/"), c(t + "path_f")),
                    ).otherwise(c(t + "path_f")),
                ),
            ).otherwise(c(t + "path_f")),
        },
    ]
    for st in stages:
        df = df.withColumns(st)
    body1 = F.when(
        c(t + "has_scheme"),
        F.concat(c(t + "scheme"), F.lit(":"), c(t + "body0")),
    ).otherwise(c(t + "body0"))
    out = df.withColumns(
        {
            "canon_url": F.when(
                c(t + "fast"),
                F.concat(
                    c(t + "f_scheme"), F.lit("://"),
                    c(t + "f_netloc"), c(t + "f_path"),
                ),
            )
            .when(u0.isNull(), F.lit(None).cast("string"))
            .when(c(t + "invalid"), u0)
            .otherwise(
                F.when(
                    c(t + "qraw") != "",
                    F.concat(body1, F.lit("?"), c(t + "sorted_q")),
                ).otherwise(body1)
            ),
            "host": F.when(c(t + "fast"), c(t + "f_host"))
            .when(u0.isNull(), F.lit(None).cast("string"))
            .when(c(t + "invalid"), F.lit(""))
            .otherwise(c(t + "host_raw")),
        }
    )
    return out.drop(*[n for n in out.columns if n.startswith(t)])


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
    method = F.col(method_col) if method_col else F.lit("GET")
    return with_canon_host(df, url_col).withColumn(
        "url_hash", url_hash_expr(F.col("canon_url"), method)
    )
