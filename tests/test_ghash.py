"""Tabulation-hash parity with the reference (hash.cpp / hash.h / Spider.h)."""

import numpy as np

from open_source_search_engine_spark.functions import ghash


def test_table_check_value():
    # hash.cpp:57 — the reference's own embedded sanity value
    assert int(ghash.hash_table()[0, 0]) == 6720717044602784129


def test_hash64b_empty_and_basic():
    assert ghash.hash64b(b"") == 0
    # single char 'a': XOR of exactly table[0][ord('a')]
    assert ghash.hash64b("a") == int(ghash.hash_table()[0, ord("a")])
    # two chars: table[0][h] ^ table[1][i]
    t = ghash.hash_table()
    assert ghash.hash64b("hi") == int(t[0, ord("h")] ^ t[1, ord("i")])


def test_hash64b_batch_matches_scalar():
    urls = [b"http://www.example.com/", b"", b"a", b"abc" * 200]
    batch = ghash.hash64b_bytes(urls)
    for i, u in enumerate(urls):
        assert int(batch[i]) == ghash.hash64b(u)


def test_position_wraps_at_256():
    # hash.h:62 casts the position to unsigned char: byte 256 uses row 0
    s = b"x" * 257
    t = ghash.hash_table()
    expect = np.uint64(0)
    for i, c in enumerate(s):
        expect ^= t[i & 0xFF, c]
    assert ghash.hash64b(s) == int(expect)


def test_uh48_is_low_48_bits_nonnegative():
    h = ghash.hash64b("http://www.example.com/")
    u = ghash.uh48("http://www.example.com/")
    assert u == h & ((1 << 48) - 1)
    assert 0 <= u < (1 << 48)
    arr = ghash.uh48_bytes([b"http://www.example.com/"])
    assert arr.dtype == np.int64 and int(arr[0]) == u


def test_hash32h_shard_stability():
    # hash.cpp:148-160 + Hostdb.cpp:1752-1757: same firstIp -> same shard
    ips = np.array([0x01020304, 0x7F000001, 0xFFFFFFFF, 12345], dtype=np.uint64)
    s1 = ghash.spider_shard(ips, 64)
    s2 = ghash.spider_shard(ips, 64)
    assert (s1 == s2).all()
    assert ((0 <= s1) & (s1 < 64)).all()
    # hash32h must equal the manual table XOR for one probe
    t = ghash.hash_table()
    h1, h2 = 0x01020304, 0x123456
    expect = np.uint64(0)
    for b in range(4):
        expect ^= t[b, (h1 >> (8 * b)) & 0xFF]
        expect ^= t[4 + b, (h2 >> (8 * b)) & 0xFF]
    expect &= np.uint64(0xFFFFFFFF)
    assert int(ghash.hash32h_arrays(np.array([h1]), h2)[0]) == int(expect)


def test_distribution_over_shards():
    # 100k random ips should spread near-uniformly over 32 shards
    rng = np.random.default_rng(7)
    ips = rng.integers(0, 2**32, size=100_000, dtype=np.uint64)
    shards = ghash.spider_shard(ips, 32)
    counts = np.bincount(shards, minlength=32)
    assert counts.min() > 0.8 * counts.mean()
    assert counts.max() < 1.2 * counts.mean()
