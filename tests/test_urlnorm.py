"""Canonicalization + identity-hash unit tests.

Hash parity target: hex(md5(url+method)) per reference
collect/request.go:95-98, canonicalized first per the north_star.
"""

import hashlib

from crawler_spark.functions.urlnorm import canonicalize_url, host_of_url
from crawler_spark.plans.oracle import url_hash


def test_lowercase_host_and_scheme():
    assert (
        canonicalize_url("HTTPS://Book.Douban.COM/subject/1/")
        == "https://book.douban.com/subject/1/"
    )


def test_strip_fragment():
    assert canonicalize_url("https://a.com/p#frag") == "https://a.com/p"


def test_strip_default_port():
    assert canonicalize_url("https://a.com:443/p") == "https://a.com/p"
    assert canonicalize_url("http://a.com:80/p") == "http://a.com/p"
    assert canonicalize_url("http://a.com:8080/p") == "http://a.com:8080/p"


def test_sort_query_params():
    assert canonicalize_url("https://a.com/p?b=2&a=1") == "https://a.com/p?a=1&b=2"
    assert canonicalize_url("https://a.com/p?a=2&a=1") == "https://a.com/p?a=1&a=2"


def test_empty_path_becomes_slash():
    assert canonicalize_url("https://a.com") == "https://a.com/"


def test_path_case_preserved():
    assert canonicalize_url("https://a.com/PaTh") == "https://a.com/PaTh"


def test_noisy_variants_converge():
    variants = [
        "https://www.site0001.example/p/5",
        "https://www.site0001.example/p/5#frag3",
        "https://WWW.SITE0001.EXAMPLE/p/5",
        "https://www.site0001.example:443/p/5",
    ]
    canons = {canonicalize_url(v) for v in variants}
    assert canons == {"https://www.site0001.example/p/5"}


def test_host_of():
    assert host_of_url("https://A.B.com:8443/x") == "a.b.com"
    assert host_of_url("") == ""


def test_url_hash_md5_parity():
    u = "https://book.douban.com/"
    expected = hashlib.md5((u + "GET").encode()).hexdigest()
    assert url_hash(u) == expected


def test_spark_udfs_match_python(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.urlnorm import with_url_identity

    urls = [
        "https://Book.Douban.COM/tag/x?b=2&a=1#f",
        "http://a.com:80",
        "https://www.site0001.example/p/5#frag3",
    ]
    df = spark.createDataFrame([(u, "GET") for u in urls], "url string, method string")
    rows = with_url_identity(df).orderBy("url").collect()
    for r in rows:
        assert r.canon_url == canonicalize_url(r.url)
        assert r.host == host_of_url(r.url)
        assert r.url_hash == url_hash(canonicalize_url(r.url))

# ---------------------------------------------------------------------------
# JVM-expression twin (with_canon_host) — equivalence with the
# Python spec functions, pinned over a deterministic fuzz grammar.
# ---------------------------------------------------------------------------


def test_nfkc_unsafe_set_is_complete():
    """_NFKC_UNSAFE must equal the derived set: every codepoint whose
    NFKC normalization introduces one of '/?#@:' (what _checknetloc
    rejects). Recomputed here so a Unicode-table change in the
    interpreter fails loudly instead of silently diverging."""
    import unicodedata

    from crawler_spark.functions.urlnorm import _NFKC_UNSAFE

    derived = {
        c
        for c in range(0x80, 0x110000)
        if any(x in unicodedata.normalize("NFKC", chr(c)) for x in "/?#@:")
    }
    assert set(map(ord, _NFKC_UNSAFE)) == derived


def test_ipv6_regex_matches_ipaddress():
    """The bracket-host validator must accept exactly what
    ipaddress.IPv6Address accepts (modulo the IPvFuture branch)."""
    import ipaddress
    import itertools
    import re

    from crawler_spark.functions.urlnorm import _PURE6, _V4

    pure = re.compile(f"^{_PURE6}$")
    v4tail = re.compile(f":{_V4}$")
    v4sub = re.compile(f"{_V4}$")

    def mine(s):
        base, sep, scope = s.partition("%")
        if sep and (not scope or "%" in scope):
            return False
        if v4tail.search(base):
            return bool(pure.match(v4sub.sub("0:0", base)))
        return bool(pure.match(base))

    def theirs(s):
        try:
            return isinstance(ipaddress.ip_address(s), ipaddress.IPv6Address)
        except ValueError:
            return False

    hextets = ["", "0", "1", "12ab", "ffff", "FFFF", "12345", "g1"]
    cases = set()
    for n in (2, 3, 8, 9):
        for combo in itertools.product(hextets, repeat=min(n, 3)):
            cases.add(":".join(combo * (n // len(combo) + 1))[:40])
    cases |= {
        "::", ":::", "::1", "1::", "1::2", "1:2::3:4", "1::2::3",
        "1:2:3:4:5:6:7:8", "1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7",
        "::ffff:1.2.3.4", "::ffff:01.2.3.4", "::ffff:256.1.1.1",
        "1:2:3:4:5:6:1.2.3.4", "1:2:3:4:5:6:7:1.2.3.4", "::1.2.3.4",
        "1::1.2.3.4", "1.2.3.4", "::1%eth0", "::1%", "::1%a%b", "%eth0",
        "fe80::1%25eth0", "::ffff:1.2.3", "::ffff:1.2.3.4.5",
    }
    for s in sorted(cases):
        assert mine(s) == theirs(s), repr(s)


def _fuzz_urls(n=4000, seed=20260819):
    import random

    rnd = random.Random(seed)
    schemes = ["http", "HTTP", "https", "hTtPs", "ftp", "ws", "wss",
               "mailto", "x1+.-", "1bad", "ht!tp", "file", "git+ssh", ""]
    hosts = ["example.com", "EX.COM", "a.b.c.d.e", "h℀.com",
             "h：80", "hé.com", "h⁇.com",
             "[::1]", "[2001:DB8::1]", "[abc]", "[v1.xyz]", "[V1.xyz]",
             "[::1%25eth0]", "[1:2:3:4:5:6:7:8]", "[::ffff:1.2.3.4]",
             "[::ffff:01.2.3.4]", "[1::2::3]", "[1:2:3:4:5:6:1.2.3.4]",
             "[12345::1]", "[::%]", "[fe80::1%]", "[fe80::1%a%b]",
             "[]", "[", "]", "x[::1]y", ""]
    users = ["", "u@", "U:P@", "a@b@", "%40@"]
    ports = ["", ":80", ":443", ":21", ":8080", ":080", ":", ":x", ":80:80"]
    paths = ["", "/", "/a/b", "//dbl", "///tri", "/a b", "a-rel", "/a?not"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?x=2&x=1&a=3", "?a", "?&",
               "?a=1&&b=2", "?a=1&", "?é=1&a=\U0001F600"]
    frags = ["", "#", "#f", "#a?b"]
    wss = ["", " ", "\t", "\n", "\xa0", "\x00", "\x1c", "\x85",
           " \xa0\x00", "\x00 "]
    seps = ["://", ":", ":/", "//", ""]
    urls = []
    for _ in range(n):
        u = (rnd.choice(wss) + rnd.choice(schemes) + rnd.choice(seps)
             + rnd.choice(users) + rnd.choice(hosts) + rnd.choice(ports)
             + rnd.choice(paths) + rnd.choice(queries) + rnd.choice(frags)
             + rnd.choice(wss))
        if rnd.random() < 0.15:
            pos = rnd.randrange(len(u) + 1)
            u = u[:pos] + rnd.choice("\t\r\n") + u[pos:]
        urls.append(u)
    garbage_alphabet = " abc:/?#@[]%&=.\t\n\xa0\x00　\U0001F600é℀："
    for _ in range(n // 5):
        urls.append("".join(rnd.choice(garbage_alphabet)
                            for _ in range(rnd.randrange(0, 25))))
    urls += ["", "http://h.com", "http:///x", "////x", "//rel.com/x",
             "mailto:a@b", "a#b:c", "http://h.com:80", "http://:80/",
             "http://@h.com/", "http://h.com:", "http:", "http:x",
             "file:x", "HTTP:", "git+ssh:rel", "http://℀/"]
    return urls


def test_identity_exprs_match_python_fuzz(spark):
    """with_canon_host (the engine's codegen hot path) must equal
    canonicalize_url/host_of_url (the oracle's spec) on every URL of
    the adversarial grammar: scheme casing/invalidity, userinfo,
    default/odd ports, IPv6 + IPvFuture + invalid bracket hosts,
    NFKC-unsafe netlocs, control/whitespace chars, relative refs,
    duplicate query keys, and pure garbage."""
    from crawler_spark.functions.urlnorm import with_canon_host

    urls = _fuzz_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = with_canon_host(df).collect()
    assert len(rows) == len(urls)
    for r in rows:
        assert r["canon_url"] == canonicalize_url(r["url"]), repr(r["url"])
        assert r["host"] == host_of_url(r["url"]), repr(r["url"])


def test_identity_exprs_null_passthrough(spark):
    from crawler_spark.functions.urlnorm import with_canon_host

    df = spark.createDataFrame([(None,), ("http://A.com",)], "url string")
    rows = {r["url"]: r for r in with_canon_host(df).collect()}
    assert rows[None]["canon_url"] is None and rows[None]["host"] is None
    assert rows["http://A.com"]["canon_url"] == "http://a.com/"
    assert rows["http://A.com"]["host"] == "a.com"


def test_identity_exprs_plan_stays_small(spark):
    """Regression pin for the planning-time trap: emitting the
    canonicalization as one Column tree duplicated every
    multiply-referenced subtree — 2.9 MB of optimized plan, ~2.8 s of
    planning per query, re-paid by AQE at each stage boundary. The
    staged-projection form must keep the optimized plan small and
    plan in well under a second."""
    import time

    from crawler_spark.functions.urlnorm import with_canon_host

    df = spark.createDataFrame([("http://A.com/x?b=2&a=1",)], "url string")
    t0 = time.monotonic()
    out = with_canon_host(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    dt = time.monotonic() - t0
    assert len(plan) < 200_000, f"optimized plan blew up: {len(plan)} chars"
    assert dt < 5.0, f"planning took {dt:.1f}s"
