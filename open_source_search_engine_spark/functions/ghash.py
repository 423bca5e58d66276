"""Gigablast's deterministic tabulation ("Zobrist") hash family, vectorized.

The reference builds a 256x256 table of 64-bit values from glibc ``rand()``
seeded with 1945687 (``hash.cpp:21-62``) and hashes strings by XORing
``g_hashtab[position & 0xff][byte]`` (``hash.h:59-65`` ``hash64b``).  The
canonical URL id is ``uh48 = hash64b(url) & 0xffffFFFFffff``
(``Spider.h:729-738``).  Shard assignment uses ``hash32h(firstIp, 0x123456)``
(``hash.cpp:148-160``, ``Hostdb.cpp:1752-1757``).

We regenerate the identical table by reimplementing glibc's TYPE_3 additive
feedback PRNG (degree 31, separation 3) in NumPy and verify the reference's
own check value ``g_hashtab[0][0] == 6720717044602784129`` (``hash.cpp:57``).

All hash functions here are batch-vectorized over NumPy arrays so they can run
inside Arrow-batched ``pandas_udf``s with no per-row Python (north rule).
"""

from __future__ import annotations

import numpy as np

GLIBC_SEED = 1945687
_CHECK_VALUE = 6720717044602784129
UH48_MASK = (1 << 48) - 1

_TABLE: np.ndarray | None = None


def _glibc_rand(seed: int, n: int) -> np.ndarray:
    """First ``n`` outputs of glibc ``rand()`` after ``srand(seed)``.

    glibc uses a TYPE_3 additive-feedback generator: 31 lagged int32 state
    words seeded via a Lehmer LCG (16807, Schrage's trick), taps at lags 31
    and 3, first 310 outputs discarded, each output >> 1.
    """
    total = 344 + n  # 34 seed words + 310 warmup + n outputs
    r = np.empty(total, dtype=np.uint64)
    x = seed & 0x7FFFFFFF or 1
    r[0] = x
    for i in range(1, 31):
        hi, lo = divmod(x, 127773)
        x = 16807 * lo - 2836 * hi
        if x < 0:
            x += 2147483647
        r[i] = x
    r[31:34] = r[0:3]
    # additive feedback: r[i] = r[i-31] + r[i-3]  (mod 2^32)
    mask = np.uint64(0xFFFFFFFF)
    for i in range(34, total):
        r[i] = (r[i - 31] + r[i - 3]) & mask
    return r[344:] >> np.uint64(1)


def hash_table() -> np.ndarray:
    """The 256x256 uint64 tabulation table, identical to ``g_hashtab``.

    Per entry the reference consumes four ``rand()`` calls
    (``hash.cpp:36-48``): hi32 (top bit patched from a second draw), lo32
    (top bit patched from a fourth draw).
    """
    global _TABLE
    if _TABLE is not None:
        return _TABLE
    v = _glibc_rand(GLIBC_SEED, 256 * 256 * 4).reshape(-1, 4)
    half = np.uint64(0x7FFFFFFF // 2)
    hi = v[:, 0] | np.where(v[:, 1] > half, np.uint64(0x80000000), np.uint64(0))
    lo = v[:, 2] | np.where(v[:, 3] > half, np.uint64(0x80000000), np.uint64(0))
    table = ((hi << np.uint64(32)) | lo).reshape(256, 256)
    if int(table[0, 0]) != _CHECK_VALUE:
        raise RuntimeError("tabulation table mismatch vs reference check value")
    _TABLE = table
    return table


def _arrow_segments(data) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 bytes, int64 offsets) for a batch of strings/bytes.

    Accepts a pyarrow (Large)String/(Large)Binary array, a pandas Series, or
    a plain list — pyarrow's variable-width layout already stores the bytes
    contiguously, so this is (near) zero-copy and avoids a per-row Python
    join, which dominates at 10^7+ rows."""
    import pyarrow as pa

    if not isinstance(data, pa.Array):
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        else:
            first = next((x for x in data if x is not None), b"")
            typ = pa.large_binary() if isinstance(first, bytes) else pa.large_string()
            data = pa.array(data, type=typ)
    if pa.types.is_string(data.type) or pa.types.is_binary(data.type):
        data = data.cast(pa.large_binary())
    elif pa.types.is_large_string(data.type):
        data = data.cast(pa.large_binary())
    if data.null_count:
        data = data.fill_null(b"")
    offsets = np.frombuffer(data.buffers()[1], dtype=np.int64)[
        data.offset: data.offset + len(data) + 1
    ]
    dbuf = data.buffers()[2]
    flat = np.frombuffer(dbuf, dtype=np.uint8)[offsets[0]: offsets[-1]] if dbuf is not None else np.empty(0, np.uint8)
    return flat, offsets - offsets[0]


_CHUNK_BYTES = 1 << 22  # 4 MiB of url bytes per inner chunk: buffers stay hot


def hash64b_bytes(data) -> np.ndarray:
    """Vectorized ``hash64b`` over a batch of strings/bytes -> uint64 array.

    Matches ``hash.h:59-65``: XOR of table[pos & 0xff][byte] over all bytes
    (stopping at NUL is irrelevant — callers pass NUL-free URL bytes).
    Accepts list[bytes], pandas Series, or pyarrow array; processes in
    fixed-size chunks with preallocated scratch so peak memory stays flat
    regardless of batch size.
    """
    flat, offsets = _arrow_segments(data)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if n == 0 or flat.size == 0:
        return out
    table = hash_table()
    ramp = np.arange(_CHUNK_BYTES + 1024, dtype=np.int64)  # position template
    row = 0
    while row < n:
        # take rows until the chunk byte budget is filled (>=1 row always)
        hi = int(np.searchsorted(offsets, offsets[row] + _CHUNK_BYTES, side="left"))
        hi = max(hi, row + 1)
        hi = min(hi, n)
        seg_off = offsets[row:hi + 1]
        base = seg_off[0]
        m = int(seg_off[-1] - base)
        lens = np.diff(seg_off)
        if m == 0:
            row = hi
            continue
        # per-byte position within its own string, wrapped to uint8 exactly
        # like the reference's (unsigned char)i cast (hash.h:62)
        if m <= ramp.size:
            pos = ramp[:m] - np.repeat(seg_off[:-1] - base, lens)
        else:  # single giant row
            pos = np.arange(m, dtype=np.int64)
        pos = (pos & 0xFF).astype(np.uint8)
        vals = table[pos, flat[base: base + m]]
        nonempty = lens > 0
        starts_local = (seg_off[:-1] - base)[nonempty]
        out[row:hi][nonempty] = np.bitwise_xor.reduceat(vals, starts_local)
        row = hi
    return out


def hash64b(s: str | bytes) -> int:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int(hash64b_bytes([b])[0])


def _simple_lower(s: str) -> str:
    """Per-codepoint simple lowercase (ucToLower, hash.h:168): Python's
    full case mapping agrees except where one codepoint lowers to
    several (e.g. U+0130) — there the reference's simple mapping is the
    first codepoint."""
    return "".join((c.lower() or c)[0] for c in s)


def hash64_lower_utf8(s: str) -> int:
    """``hash64Lower_utf8`` (hash.h:139-196): the tabulation hash over
    the LOWERCASED UTF-8 bytes — the reference's word/term id.  Same
    g_hashtab and uint8 position wrap as hash64b, so this is exactly
    hash64b of the lowered encoding."""
    return hash64b(_simple_lower(s).encode("utf-8"))


def hash64_lower_batch(words) -> np.ndarray:
    """Vectorized hash64Lower_utf8 over a batch of strings -> uint64."""
    return hash64b_bytes([_simple_lower(w).encode("utf-8") for w in words])


def uh48_bytes(data: list[bytes]) -> np.ndarray:
    """Canonical URL id: ``hash64b(url) & 0xffffFFFFffff`` (Spider.h:729-738).

    Returned as int64 (always non-negative: only 48 bits set) so it round-
    trips through Spark LongType.
    """
    return (hash64b_bytes(data) & np.uint64(UH48_MASK)).astype(np.int64)


def uh48(s: str | bytes) -> int:
    return hash64b(s) & UH48_MASK


def hash32_bytes(data: list[bytes]) -> np.ndarray:
    """Vectorized ``hash32`` (low-32 truncation of table XOR, hash.cpp:93-103
    semantics: h ^= (uint32)g_hashtab[i][c])."""
    return (hash64b_bytes(data) & np.uint64(0xFFFFFFFF)).astype(np.int64)


def hash32h_arrays(h1: np.ndarray, h2: int | np.ndarray) -> np.ndarray:
    """Vectorized ``hash32h(h1, h2)`` (hash.cpp:148-160): XOR of table rows
    0-3 over the little-endian bytes of h1 and rows 4-7 over h2, truncated to
    uint32.  Used for spiderdb shard assignment with h2=0x123456
    (Hostdb.cpp:1752-1757)."""
    table = hash_table()
    h1 = np.asarray(h1, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    h2a = (np.zeros_like(h1) + np.uint64(h2)) if np.isscalar(h2) else np.asarray(h2, dtype=np.uint64)
    h = np.zeros_like(h1)
    for byte_idx in range(4):
        shift = np.uint64(8 * byte_idx)
        h ^= table[byte_idx, (h1 >> shift) & np.uint64(0xFF)]
        h ^= table[4 + byte_idx, (h2a >> shift) & np.uint64(0xFF)]
    return (h & np.uint64(0xFFFFFFFF)).astype(np.int64)


def spider_shard(first_ip: np.ndarray, num_shards: int) -> np.ndarray:
    """Spiderdb shard for a firstIp: ``hash32h(firstIp,0x123456) % shards``
    (Hostdb.cpp:1752-1757 maps through m_map; modulo is the batch analogue —
    what matters is that a firstIp deterministically owns one partition)."""
    return hash32h_arrays(np.asarray(first_ip), 0x123456) % num_shards
