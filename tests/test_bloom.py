"""Bloom filter unit tests: zero false negatives, bounded false
positives, merge, vectorized membership."""

import pandas as pd

from crawler_spark.operators.bloom import BloomFilter


def test_no_false_negatives():
    bf = BloomFilter(capacity=1000, fpp=0.01)
    keys = [f"hash{i}" for i in range(1000)]
    bf.add_many(keys)
    assert all(bf.might_contain(k) for k in keys)


def test_false_positive_rate_bounded():
    bf = BloomFilter(capacity=2000, fpp=0.01)
    bf.add_many(f"in{i}" for i in range(2000))
    fp = sum(bf.might_contain(f"out{i}") for i in range(10000))
    assert fp / 10000 < 0.03  # 3× headroom over nominal 1%


def test_merge_is_union():
    a = BloomFilter(capacity=100, fpp=0.01)
    b = BloomFilter(capacity=100, fpp=0.01)
    a.add("x")
    b.add("y")
    m = a.merge(b)
    assert m.might_contain("x") and m.might_contain("y")


def test_roundtrip_bytes():
    a = BloomFilter(capacity=100, fpp=0.01)
    a.add("x")
    b = BloomFilter.from_bytes(100, 0.01, a.to_bytes())
    assert b.might_contain("x")
    assert not b.might_contain("zzz")


def test_contains_series():
    bf = BloomFilter(capacity=10, fpp=0.01)
    bf.add("a")
    s = bf.contains_series(pd.Series(["a", "b", None]))
    assert list(s) == [True, False, False]
