"""Bloom filter unit tests: zero false negatives, bounded false
positives, merge, vectorized membership — plus the sharded
executor-side store (build / fold / cogroup check)."""

import hashlib

import pandas as pd

from crawler_spark.operators.bloom import BloomFilter, ShardedBloom


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


def _h(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_sharded_build_check_no_false_negatives(spark):
    sb = ShardedBloom(n_shards=4, capacity=1 << 12)
    seen = spark.createDataFrame(
        [(_h(f"u{i}"),) for i in range(500)], "url_hash string"
    )
    shards = sb.build(seen)
    assert shards.count() == 4  # every shard got rows at this volume
    probe = spark.createDataFrame(
        [(_h(f"u{i}"),) for i in range(400, 700)], "url_hash string"
    )
    tagged = {r.url_hash: r._maybe_seen for r in sb.check(probe, "url_hash", shards).collect()}
    assert len(tagged) == 300  # cogroup must not drop or duplicate rows
    # zero false negatives over the seen overlap
    assert all(tagged[_h(f"u{i}")] for i in range(400, 500))
    # false positives bounded (sanity, not exact)
    fp = sum(tagged[_h(f"u{i}")] for i in range(500, 700))
    assert fp < 30


def test_broadcast_tier_matches_cogroup(spark):
    """check_broadcast must return row-for-row identical verdicts to
    the cogroup check — the tier is a physical decision only."""
    sb = ShardedBloom(n_shards=4, capacity=1 << 12)
    seen = spark.createDataFrame(
        [(_h(f"u{i}"),) for i in range(500)], "url_hash string"
    )
    shards = sb.build(seen)
    probe = spark.createDataFrame(
        [(_h(f"u{i}"),) for i in range(400, 700)], "url_hash string"
    )
    via_cogroup = {
        r.url_hash: r._maybe_seen
        for r in sb.check(probe, "url_hash", shards).collect()
    }
    via_bcast = {
        r.url_hash: r._maybe_seen
        for r in sb.check_broadcast(probe, "url_hash", shards).collect()
    }
    assert via_bcast == via_cogroup
    assert sb.store_bytes() == 4 * len(
        bytes(shards.first()["bits"])
    )


def test_sharded_fold_is_union(spark):
    sb = ShardedBloom(n_shards=4, capacity=1 << 12)
    a = spark.createDataFrame([(_h(f"a{i}"),) for i in range(100)], "url_hash string")
    b = spark.createDataFrame([(_h(f"b{i}"),) for i in range(100)], "url_hash string")
    merged = sb.fold(sb.build(a), b)
    probe = a.unionByName(b)
    tagged = sb.check(probe, "url_hash", merged).collect()
    assert len(tagged) == 200 and all(r._maybe_seen for r in tagged)


def test_sharded_empty_shard_is_definitely_new(spark):
    sb = ShardedBloom(n_shards=64, capacity=1 << 12)
    seen = spark.createDataFrame([(_h("only"),)], "url_hash string")
    shards = sb.build(seen)  # 1 shard row; 63 shards have no bits
    probe = spark.createDataFrame(
        [(_h(f"x{i}"),) for i in range(200)] + [(_h("only"),)], "url_hash string"
    )
    got = {r.url_hash: r._maybe_seen for r in sb.check(probe, "url_hash", shards).collect()}
    assert got[_h("only")] is True
    assert len(got) == 201
