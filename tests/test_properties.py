"""Property-based tests (hypothesis) for the deterministic kernels:
normalization idempotency, hash stability/masking, filter-parser totality,
bloom no-false-negatives."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from open_source_search_engine_spark.functions.ghash import (
    hash64b, uh48, uh48_bytes)
from open_source_search_engine_spark.functions.urlnorm import normalize_url

url_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0, max_size=200)


@settings(max_examples=300, deadline=None)
@given(url_text)
def test_normalize_idempotent(raw):
    p = normalize_url(raw, strip_params=True, strip_common_file=True)
    if p is None:
        return
    p2 = normalize_url(p.url, strip_params=True, strip_common_file=True)
    assert p2 is not None
    assert p2.url == p.url          # canonical form is a fixed point
    assert p2.host == p.host and p2.path == p.path


@settings(max_examples=300, deadline=None)
@given(url_text)
def test_normalize_invariants(raw):
    p = normalize_url(raw)
    if p is None:
        return
    assert p.url.startswith(f"{p.scheme}://")
    assert p.path.startswith("/")
    assert p.host == p.host.lower()
    assert not p.host.endswith(".")


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_uh48_mask_and_batch_consistency(data):
    h = hash64b(data)
    u = uh48(data)
    assert u == h & ((1 << 48) - 1)
    assert 0 <= u < (1 << 48)
    batch = uh48_bytes([data, data, b"x" + data])
    assert batch[0] == batch[1] == u
    if data != b"x" + data:
        pass  # different inputs need not differ, but usually do


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 48) - 1),
                min_size=1, max_size=500, unique=True))
def test_bloom_never_drops_members(keys):
    from open_source_search_engine_spark.pipeline.seen import (
        _build_bitmap, _test_bitmap)
    arr = np.array(keys, dtype=np.int64)
    bitmap, n_bits = _build_bitmap(arr)
    assert _test_bitmap(arr, np.frombuffer(bitmap, dtype=np.uint8),
                        n_bits).all()


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefgh &|!<>=0123456789.^$", max_size=40))
def test_filter_parser_never_crashes_unexpectedly(expr):
    """The parser either returns atoms or raises ValueError — nothing
    else (bad configs fail loud at compile time)."""
    from open_source_search_engine_spark.functions.urlfilters import (
        parse_expression)
    try:
        atoms = parse_expression(expr)
    except ValueError:
        return
    assert isinstance(atoms, list)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz", max_size=30), min_size=1,
                max_size=20))
def test_dsir_bucket_counts_conserve_ngrams(texts):
    """Hashed-bucket counts sum to exactly (unigrams + bigrams) per doc:
    tokens + max(tokens-1, 0) — nothing dropped or double-counted by
    the flat Arrow kernel's boundary masking."""
    from open_source_search_engine_spark.training.dsir import (
        _bucket_batch_kernel)
    import pandas as pd
    batch = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = pd.concat(list(_bucket_batch_kernel(64)(iter([batch]))),
                    ignore_index=True)
    got = out.groupby("doc_id")["cnt"].sum().to_dict()
    for i, t in enumerate(texts):
        n = len(t.split())
        want = n + max(n - 1, 0)
        assert got.get(i, 0) == want, (i, t)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=400),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_shuffle_key_is_total_and_deterministic(n, seed):
    """The shuffle key ranks every doc id deterministically: same seed →
    same order; keys are nonneg int63 (signed order == unsigned)."""
    import numpy as np
    from open_source_search_engine_spark.functions.ghash import (
        hash64b_bytes)
    ids = list(range(n))
    h1 = hash64b_bytes([f"{d}\x1f{seed}".encode() for d in ids])
    h2 = hash64b_bytes([f"{d}\x1f{seed}".encode() for d in ids])
    assert (h1 == h2).all()
    keys = (h1 >> np.uint64(1)).astype(np.int64)
    assert (keys >= 0).all()
