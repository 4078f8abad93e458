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
