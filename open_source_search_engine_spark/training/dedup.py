"""Near-duplicate detection for training-data pipelines.

Three scale-path families over a text column:

- **exact**: hash-groupBy (see queries.py ``dedup_exact`` — pure SQL)
- **MinHash + LSH**: word-shingle → 64 permutation-free minhashes
  (``(a*h+b) mod p`` universal hashing over one base tabulation hash) →
  banded LSH (16 bands × 4 rows) → bucket join → candidate pairs with
  estimated Jaccard.  Everything NumPy-vectorized inside Arrow batches; the
  pair-join is a Spark groupBy on (band, band_hash) — i.e. the O(n²) pair
  space never materializes, only co-bucketed candidates shuffle.
- **SimHash**: 64-bit sign fingerprint of token-hash vectors; near-dups =
  pairs sharing a 16-bit segment (4-segment pigeonhole for hamming ≤ 3)
  verified by popcount.

At 100 TB the flow is identical: signatures are computed map-side
(mapInPandas), the only shuffles are the band-bucket groupBys whose keys are
uniformly distributed by construction (hash values), so no skew.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ghash import hash64b_bytes

MERSENNE_P = (1 << 61) - 1
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = 4

# deterministic universal-hash parameters (fixed seed, no runtime RNG)
_rs = np.random.RandomState(0x5EED)
_A = (_rs.randint(1, 1 << 31, size=N_HASHES).astype(np.uint64) * 2 + 1)
_B = _rs.randint(0, 1 << 31, size=N_HASHES).astype(np.uint64)


_SH1 = np.uint64(0x9E3779B97F4A7C15)   # shingle-combining odd multipliers
_SH2 = np.uint64(0xC2B2AE3D27D4EB4F)


# ASCII whitespace per str.split() semantics (str.isspace() chars < 0x80):
# \t \n \x0b \x0c \r, \x1c-\x1f, space.  Non-ASCII Unicode whitespace
# (U+0085, U+00A0, U+2000.., U+3000) always starts with one of the UTF-8
# lead bytes below; their presence routes the batch to the exact fallback.
_WS_TABLE = np.zeros(256, dtype=bool)
for _c in b"\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f ":
    _WS_TABLE[_c] = True
_UNICODE_WS_LEADS = np.zeros(256, dtype=bool)
for _c in (0xC2, 0xE1, 0xE2, 0xE3):
    _UNICODE_WS_LEADS[_c] = True


def _token_hashes_slow(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Exact fallback (Unicode whitespace): per-doc str.split()."""
    tokens: list[bytes] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        tokens.extend(tok.encode() for tok in toks)
        offsets[i + 1] = offsets[i] + len(toks)
    th = hash64b_bytes(tokens) if tokens else np.zeros(0, np.uint64)
    return th, offsets


def _token_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a whole Arrow batch and tabulation-hash ALL tokens with no
    per-token Python, return (flat uint64 hashes, per-doc offsets).

    Fast path: byte-level split on ASCII whitespace over the contiguous
    Arrow buffer + one gathered table-XOR reduceat — identical to
    ``hash64b(token)`` per token.  Batches containing possible non-ASCII
    whitespace fall back to the exact str.split() loop."""
    from ..functions.ghash import _arrow_segments, hash_table

    if not isinstance(texts, list):
        texts = list(texts)
    flat, offs = _arrow_segments([t or "" for t in texts])
    if flat.size and _UNICODE_WS_LEADS[flat].any():
        return _token_hashes_slow(texts)
    n_bytes = flat.size
    if n_bytes == 0:
        return np.zeros(0, np.uint64), np.zeros(len(texts) + 1, np.int64)
    nonws = ~_WS_TABLE[flat]
    # token starts: non-ws byte whose predecessor is ws or a doc boundary
    prev_nonws = np.empty(n_bytes, dtype=bool)
    prev_nonws[0] = False
    prev_nonws[1:] = nonws[:-1]
    doc_starts = offs[:-1][offs[:-1] < n_bytes]
    prev_nonws[doc_starts] = False
    tok_starts = np.flatnonzero(nonws & ~prev_nonws)
    # token ends: non-ws byte whose successor is ws or a doc boundary
    next_nonws = np.empty(n_bytes, dtype=bool)
    next_nonws[-1] = False
    next_nonws[:-1] = nonws[1:]
    doc_ends = offs[1:][offs[1:] <= n_bytes] - 1
    next_nonws[doc_ends[doc_ends >= 0]] = False
    tok_ends = np.flatnonzero(nonws & ~next_nonws) + 1
    # per-doc token counts via searchsorted over start positions
    offsets = np.searchsorted(tok_starts, offs).astype(np.int64)
    if len(tok_starts) == 0:
        return np.zeros(0, np.uint64), offsets
    tok_lens = tok_ends - tok_starts
    packed_starts = np.concatenate(([0], np.cumsum(tok_lens)[:-1]))
    total = int(tok_lens.sum())
    ar = np.arange(total, dtype=np.int64)
    rep_packed = np.repeat(packed_starts, tok_lens)
    pos = ar - rep_packed                                # pos within token
    idx = pos + np.repeat(tok_starts, tok_lens)          # global byte index
    vals = hash_table()[(pos & 0xFF).astype(np.uint8), flat[idx]]
    th = np.bitwise_xor.reduceat(vals, packed_starts)
    return th, offsets


_MERSENNE_U = np.uint64(MERSENNE_P)


def _mod_mersenne(v: np.ndarray) -> np.ndarray:
    """Exact ``v % (2^61-1)`` for uint64 via the Mersenne fold (2^61 === 1):
    ~10x faster than NumPy's ``%`` on uint64."""
    r = (v & _MERSENNE_U) + (v >> np.uint64(61))
    return np.where(r >= _MERSENNE_U, r - _MERSENNE_U, r)


def _shingle_hashes_from_tokens(h: np.ndarray, k: int = 3) -> np.ndarray:
    """k-token shingle hashes: position-weighted combine of token hashes
    (odd-multiplier mix keeps order sensitivity, all uint64 wrap-around)."""
    n = len(h)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    if n < k:
        out = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            out = out * _SH1 + h[j]
        return out
    sh = h[: n - k + 1] * _SH1
    for j in range(1, k - 1):
        sh = (sh + h[j: n - k + 1 + j]) * _SH2
    return sh + h[k - 1:]


def _shingle_hashes_flat(th: np.ndarray, offs: np.ndarray,
                         k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for every doc in one flat pass: compute the k-window
    combine over the whole token array, then gather each doc's valid
    windows (windows never cross doc boundaries).  Docs with < k tokens get
    the same single fold value as ``_shingle_hashes_from_tokens``.

    Returns (packed shingle hashes, per-doc offsets); every doc contributes
    >= 1 value, so the offsets are strictly increasing (reduceat-safe)."""
    n_docs = len(offs) - 1
    lens = np.diff(offs)
    counts = np.maximum(lens - (k - 1), 1)
    out_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    out = np.zeros(out_offs[-1], dtype=np.uint64)
    n = len(th)
    if n >= k:
        sh = th[: n - k + 1] * _SH1
        for j in range(1, k - 1):
            sh = (sh + th[j: n - k + 1 + j]) * _SH2
        sh = sh + th[k - 1:]
        big = lens >= k
        if big.any():
            cnt = counts[big]
            packed = out_offs[:-1][big]
            ar = np.arange(int(cnt.sum()), dtype=np.int64)
            rel = ar - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
            src = rel + np.repeat(offs[:-1][big], cnt)
            dst = rel + np.repeat(packed, cnt)
            out[dst] = sh[src]
    small = np.flatnonzero(lens < k)
    for i in small:                       # rare: docs shorter than k tokens
        out[out_offs[i]] = _shingle_hashes_from_tokens(th[offs[i]: offs[i + 1]], k)[0]
    return out, out_offs


def minhash_signature(text: str) -> np.ndarray:
    """64 minhashes: min over shingles of (a_i * h + b_i) mod (2^61-1)."""
    th, _ = _token_hashes_batch([text])
    h = _shingle_hashes_from_tokens(th)
    prod = _mod_mersenne(h[:, None] * _A[None, :] + _B[None, :])
    return prod.min(axis=0)


SIG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sig", T.ArrayType(T.LongType())),
])


def minhash_map_in_pandas(it: Iterator[pd.DataFrame],
                          shingle_k: int = 3) -> Iterator[pd.DataFrame]:
    for batch in it:
        th, offs = _token_hashes_batch(batch["text"])
        flat, sh_offs = _shingle_hashes_flat(th, offs, k=shingle_k)
        prod = _mod_mersenne(flat[:, None] * _A[None, :] + _B[None, :])
        sigs_mat = (np.minimum.reduceat(prod, sh_offs[:-1], axis=0)
                    if len(flat) else np.zeros((0, N_HASHES), np.uint64))
        yield pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "sig": [row.astype(np.int64).tolist()
                                    for row in sigs_mat]})


def _spread_input(docs: DataFrame) -> DataFrame:
    """Small inputs (e.g. one parquet file) would run the whole Arrow kernel
    on one Python worker; round-robin to the session's parallelism.  At
    production scale input partitions >> cores and this is a no-op."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def minhash_signatures(docs: DataFrame, shingle_k: int = 3) -> DataFrame:
    """docs(doc_id, text) → (doc_id, sig array<long>[64]).

    shingle_k=1 minhashes the unigram token SET (duplicates don't move a
    min), i.e. the same similarity space as an exact token-Jaccard verify;
    k=3 (default) is the order-sensitive shingle space for near-dup text."""
    def _fn(it):
        return minhash_map_in_pandas(it, shingle_k=shingle_k)
    return _spread_input(docs.select("doc_id", "text")).mapInPandas(
        _fn, schema=SIG_SCHEMA)


def lsh_candidate_pairs(sigs: DataFrame, threshold: float = 0.5,
                        materialize: bool = True) -> DataFrame:
    """Banded LSH: explode 16 bands, bucket-join, estimate Jaccard as the
    fraction of matching minhashes; keep pairs >= threshold.

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b.

    ``sigs`` is persisted during the run for the same reason
    simhash_near_dups persists its fingerprints: the band self-join
    reads the lineage once per side with no ReusedExchange, and the
    usual lineage ends in the minhash Arrow map over the full corpus
    text — the one stage worth never running twice.  The cached
    relation is (doc_id, N_HASHES=64 minhashes), ~0.25 KB/doc,
    disk-spillable.

    Cache ownership (same contract as semdedup/dsir_select, ADVICE r4):
    with ``materialize=True`` (default) the pairs are computed eagerly
    (``localCheckpoint``), the internal signature persist is RELEASED
    before returning, and the only surviving blocks are the returned
    frame's own — free them with ``memutil.release_local_checkpoint``
    when done.  ``materialize=False`` returns the fully lazy plan with
    nothing persisted anywhere (plan-inspection/test mode).
    """
    if not materialize:
        return _lsh_pairs_plan(sigs, threshold)
    from pyspark import StorageLevel

    from ..memutil import safe_unpersist
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    out = _lsh_pairs_plan(sigs, threshold).localCheckpoint(eager=True)
    safe_unpersist(sigs)
    return out


def _lsh_pairs_plan(sigs: DataFrame, threshold: float) -> DataFrame:
    """The banded-LSH pair plan itself (no caching decisions)."""
    bands = sigs.select(
        "doc_id", "sig",
        F.posexplode(
            F.array(*[
                F.hash(*[F.col("sig")[i]
                         for i in range(b * ROWS_PER_BAND,
                                        (b + 1) * ROWS_PER_BAND)])
                for b in range(N_BANDS)
            ])).alias("band_idx", "band_hash"))
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(right,
                  (F.col("l.band_idx") == F.col("r.band_idx"))
                  & (F.col("l.band_hash") == F.col("r.band_hash"))
                  & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.col("l.sig").alias("sig_a"),
                F.col("r.sig").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b",
                       lambda a, b: F.when(a == b, 1).otherwise(0)),
            F.lit(0), lambda acc, x: acc + x)
        / F.lit(N_HASHES)
    )
    return (cand.withColumn("est_jaccard", F.round(est, 4))
            .filter(F.col("est_jaccard") >= threshold)
            .select("doc_a", "doc_b", "est_jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("simhash", T.LongType()),
])


def _simhash_from_scores(score: np.ndarray) -> int:
    out = np.uint64(0)
    for j in range(64):
        if score[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out.astype(np.int64))


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    h = hash64b_bytes([t.encode() for t in toks])
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    return _simhash_from_scores((2 * bits - 1).sum(axis=0))


def simhash_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    for batch in it:
        th, offs = _token_hashes_batch(batch["text"])
        bits = ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        signed = 2 * bits - 1
        # per-doc bit-score sums in one reduceat over non-empty docs
        n_docs = len(offs) - 1
        lens = np.diff(offs)
        scores = np.zeros((n_docs, 64), dtype=np.int64)
        nonempty = lens > 0
        if nonempty.any() and len(signed):
            scores[nonempty] = np.add.reduceat(
                signed, offs[:-1][nonempty], axis=0)
        sign_bits = (scores > 0).astype(np.uint64)
        fps = (sign_bits << np.arange(64, dtype=np.uint64)[None, :]) \
            .sum(axis=1, dtype=np.uint64)
        fps[~nonempty] = 0
        yield pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "simhash": fps.astype(np.int64)})


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    return _spread_input(docs.select("doc_id", "text")).mapInPandas(
        simhash_map_in_pandas, schema=SIMHASH_SCHEMA)


def _simhash_segments(max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) for h+1 segments covering 64 bits: by pigeonhole any
    pair at hamming <= h leaves at least one segment untouched, so the
    per-segment bucket join has guaranteed recall at the threshold.  Widths
    differ by at most 1 (e.g. h=3 -> four 16-bit segments)."""
    n_segs = max_hamming + 1
    if n_segs > 64:
        raise ValueError("max_hamming must be < 64")
    base, rem = divmod(64, n_segs)
    out, off = [], 0
    for s in range(n_segs):
        w = base + (1 if s < rem else 0)
        out.append((off, w))
        off += w
    return out


def _simhash_block_tables(max_hamming: int,
                          blocks_per_key: int | None = None
                          ) -> tuple[list[tuple[int, int]],
                                     list[tuple[int, ...]]]:
    """Manku/Jain/Das Sarma (WWW'07 §3) generalized block scheme: split the
    64 bits into k = max_hamming + c blocks and bucket on every
    c-combination of blocks.  Pigeonhole: h errors touch <= h blocks, so
    >= c blocks stay untouched and that exact combination matches —
    recall is guaranteed AT max_hamming while each bucket key carries
    c*64/k bits instead of 64/(h+1).  c=1 degenerates to the plain
    pigeonhole.  c is auto-chosen as the largest of {3,2,1} keeping the
    table count C(h+c, c) <= 128 (shuffle volume = tables * rows).

    Wider keys matter on template-correlated corpora: a shared boilerplate
    makes single 9-10-bit segments near-constant across huge doc groups
    (a 234-doc bucket at sf0.01), turning the bucket join ~quadratic; at
    22-bit 3-block keys the same corpus tops out at 29 docs per bucket."""
    from itertools import combinations
    from math import comb

    if blocks_per_key is None:
        blocks_per_key = next(
            c for c in (3, 2, 1) if comb(max_hamming + c, c) <= 128)
    k = max_hamming + blocks_per_key
    if k > 64:
        raise ValueError("max_hamming too large for 64-bit fingerprints")
    base, rem = divmod(64, k)
    blocks, off = [], 0
    for s in range(k):
        w = base + (1 if s < rem else 0)
        blocks.append((off, w))
        off += w
    return blocks, list(combinations(range(k), blocks_per_key))


def simhash_near_dups(fps: DataFrame, max_hamming: int = 3,
                      blocks_per_key: int | None = None,
                      materialize: bool = True) -> DataFrame:
    """Simhash near-dup pairs via c-of-k block LSH (see
    _simhash_block_tables), bucket-join per table key, verify with
    bit_count.  Recall is exact at the threshold; precision comes from the
    popcount verify.  At 100 TB keep max_hamming <= 6 so keys stay >= 20
    bits wide and buckets stay O(cluster size), not O(corpus).

    The signature table is persisted during the run: both join sides
    read the same lineage, and for every real caller that lineage ends
    in an expensive Arrow map stage (text simhash, image decode →
    dHash, audio decode → spectral hash) which would otherwise run once
    PER SIDE (no ReusedExchange fires across the explode).  The cached
    relation is (doc_id, simhash) — 16 bytes/doc, disk-spillable, tiny
    next to the corpus it fingerprints.

    Cache ownership: same contract as :func:`lsh_candidate_pairs` —
    ``materialize=True`` (default) checkpoints the pairs eagerly and
    releases the internal persist before returning (free the result
    with ``memutil.release_local_checkpoint``); ``materialize=False``
    returns the fully lazy plan with nothing persisted."""
    if not materialize:
        return _simhash_pairs_plan(fps, max_hamming, blocks_per_key)
    from pyspark import StorageLevel

    from ..memutil import safe_unpersist
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    out = _simhash_pairs_plan(fps, max_hamming, blocks_per_key) \
        .localCheckpoint(eager=True)
    safe_unpersist(fps)
    return out


def _simhash_pairs_plan(fps: DataFrame, max_hamming: int,
                        blocks_per_key: int | None) -> DataFrame:
    """The c-of-k block-LSH Hamming-join plan itself (no caching)."""
    blocks, tables = _simhash_block_tables(max_hamming, blocks_per_key)
    block_cols = [
        F.shiftrightunsigned("simhash", off).bitwiseAND(F.lit((1 << w) - 1))
        for off, w in blocks]
    # pack c block values (each < 2^16 since k >= 4) + table id into one
    # 64-bit key: tables fit in the bits above 16*c (c <= 3 -> <= 48 used)
    keys = []
    for t, combo in enumerate(tables):
        key = F.lit(t)
        for b in combo:
            key = F.shiftleft(key, 16).bitwiseOR(block_cols[b])
        keys.append(key)
    segs = fps.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("bkey"))
    l, r = segs.alias("l"), segs.alias("r")
    pairs = (
        l.join(r, (F.col("l.bkey") == F.col("r.bkey"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.col("l.simhash").alias("sh_a"),
                F.col("r.simhash").alias("sh_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (rolling hash + window minimum)
# ---------------------------------------------------------------------------

WINNOW_K = 8      # k-gram length (chars)
WINNOW_W = 16     # winnow window

_ROLL_BASE = np.uint64(1_000_003)


def winnow_fingerprints_text(text: str, k: int = WINNOW_K,
                             w: int = WINNOW_W) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): rolling k-gram hashes, keep
    each window's minimum (rightmost on ties) — the standard local
    document fingerprint.  Fully vectorized: the rolling hash is a
    polynomial over byte codes computed with cumulative powers, window
    minima via a strided reshape."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    # rolling hash h[i] = sum b[i+j] * BASE^(k-1-j), computed by sliding
    powers = _ROLL_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    idx = np.arange(n - k + 1)[:, None] + np.arange(k)[None, :]
    grams = b[idx]                      # (n-k+1, k) — fine at doc scale
    h = (grams * powers[None, :]).sum(axis=1)
    if len(h) <= w:
        return np.unique(h.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = sw.min(axis=1)
    return np.unique(mins)


def winnow_similarity(a: str, b: str) -> float:
    """Jaccard over winnow fingerprint sets."""
    fa, fb = winnow_fingerprints_text(a), winnow_fingerprints_text(b)
    if len(fa) == 0 or len(fb) == 0:
        return 0.0
    inter = len(np.intersect1d(fa, fb))
    union = len(np.union1d(fa, fb))
    return inter / union


WINNOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_fingerprints", T.LongType()),
    T.StructField("fp_min", T.LongType()),
    T.StructField("fp_xor", T.LongType()),
])


def winnow_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        n_fp, fmin, fxor = [], [], []
        for t in batch["text"]:
            fp = winnow_fingerprints_text(t or "")
            n_fp.append(len(fp))
            fmin.append(int(fp.min().astype(np.int64)) if len(fp) else 0)
            fxor.append(int(np.bitwise_xor.reduce(fp).astype(np.int64))
                        if len(fp) else 0)
        yield pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "n_fingerprints": pd.Series(n_fp, dtype="int64"),
                            "fp_min": fmin, "fp_xor": fxor})


def winnow_profile(docs: DataFrame) -> DataFrame:
    """Per-doc winnow fingerprint summary (count, min, xor) — the compact
    form stored alongside documents for copy detection at scale."""
    return _spread_input(docs.select("doc_id", "text")).mapInPandas(
        winnow_map_in_pandas, schema=WINNOW_SCHEMA)


# ---------------------------------------------------------------------------
# Exact-verification stage for LSH candidates (the canonical two-phase
# dedup: cheap candidate generation -> exact Jaccard on the short list)
# ---------------------------------------------------------------------------

PAIR_VERIFY_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType()),
    T.StructField("doc_b", T.LongType()),
    T.StructField("exact_jaccard", T.DoubleType()),
])


def _verify_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        out_a, out_b, out_j = [], [], []
        for a, b, ta, tb in zip(batch["doc_a"], batch["doc_b"],
                                batch["text_a"], batch["text_b"]):
            ha = np.unique(_shingle_hashes_from_tokens(
                _token_hashes_batch([ta or ""])[0]))
            hb = np.unique(_shingle_hashes_from_tokens(
                _token_hashes_batch([tb or ""])[0]))
            inter = len(np.intersect1d(ha, hb, assume_unique=True))
            union = len(ha) + len(hb) - inter
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(round(inter / union, 4) if union else 0.0)
        if out_a:
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                                "exact_jaccard": out_j})


def verify_pairs_exact(docs: DataFrame, pairs: DataFrame,
                       threshold: float = 0.0) -> DataFrame:
    """Join candidate pairs back to their texts and compute TRUE shingle
    Jaccard (not the minhash estimate).  The candidate list is tiny
    relative to the corpus, so the two joins broadcast the pairs side and
    the exact kernel touches only co-bucketed survivors — the standard
    generate-then-verify dedup shape at 100 TB."""
    da = docs.select(F.col("doc_id").alias("doc_a"),
                     F.col("text").alias("text_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"),
                     F.col("text").alias("text_b"))
    joined = (pairs.join(da, "doc_a").join(db, "doc_b")
              .select("doc_a", "doc_b", "text_a", "text_b"))
    out = joined.mapInPandas(_verify_batch, schema=PAIR_VERIFY_SCHEMA)
    return out.filter(F.col("exact_jaccard") >= threshold)


def connected_components(pairs: DataFrame, max_iter: int = 12) -> DataFrame:
    """Undirected duplicate-pair edges (doc_a, doc_b) → (doc_id, component)
    where component = min doc_id reachable.  Min-label propagation over the
    edge list; duplicate clusters have tiny diameter so this converges in a
    few rounds (early-stops when a round changes nothing).  At 100 TB-scale
    graphs swap in the alternating large-star/small-star formulation — the
    per-round joins here are already the shuffle-correct shape."""
    edges = pairs.select("doc_a", "doc_b")
    sym = edges.union(edges.select(F.col("doc_b").alias("doc_a"),
                                   F.col("doc_a").alias("doc_b")))
    labels = (sym.groupBy("doc_a").agg(F.min("doc_b").alias("nbr_min"))
              .select(F.col("doc_a").alias("doc_id"),
                      F.least("doc_a", "nbr_min").alias("component")))
    prev_ck = None
    for _ in range(max_iter):
        prop = (sym.join(labels, sym["doc_b"] == labels["doc_id"])
                .groupBy("doc_a").agg(F.min("component").alias("nbr_comp")))
        new_labels = (labels.join(prop, labels["doc_id"] == prop["doc_a"],
                                  "left")
                      .select("doc_id",
                              F.least("component",
                                      F.coalesce("nbr_comp", "component"))
                              .alias("component")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        # the previous round's label checkpoint is superseded once the
        # convergence probe above has read it — release its blocks now
        # rather than leaking one set per round until JVM GC
        from ..memutil import release_local_checkpoint
        if prev_ck is not None:
            release_local_checkpoint(prev_ck)
        prev_ck = new_labels
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keepers(docs: DataFrame, threshold: float = 0.85,
                  materialize: bool = True) -> DataFrame:
    """End-to-end near-dup dedup: MinHash -> LSH candidates -> exact
    verify -> connected components -> keep the lowest doc_id per duplicate
    CLUSTER (not per pair: a chain a~b~c keeps only a, and never drops a
    doc whose only duplicate was itself dropped).  Returns (doc_id, keep).
    ``materialize`` follows the lsh_candidate_pairs cache contract."""
    sigs = minhash_signatures(docs)
    cand = lsh_candidate_pairs(sigs, threshold=threshold * 0.8,
                               materialize=materialize)
    verified = verify_pairs_exact(docs, cand, threshold=threshold)
    comp = connected_components(verified)
    dropped = (comp.filter(F.col("doc_id") != F.col("component"))
               .select("doc_id"))
    return (docs.select("doc_id")
            .join(dropped.withColumn("_drop", F.lit(True)), "doc_id", "left")
            .select("doc_id",
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep")))
