"""F5 at scale: partitioned Bloom + cuckoo URL-seen filters (north rule).

The reference's dup cache (``SpiderColl.cpp:845-904``) suppresses re-added
URLs per shard with a TTL'd hash table, hopCount-aware: a cached hop-h entry
suppresses re-adds at hop >= h.  At 10^10 URLs the batch analogue is:

- **build**: group the frontier's uh48 keys by ``bucket(first_ip)`` and
  build one Bloom bitmap per bucket with vectorized NumPy inside
  ``applyInPandas`` (Arrow batches, no per-row Python).  Bitmaps are data —
  rows of (bucket, bitmap, n_bits) — so they persist in the state dir and
  rebuild incrementally by OR-ing per-round deltas.
- **probe**: new outlinks are bucketed the same way; each partition loads
  only its bucket's bitmap (broadcast dict — mapPartitions-side lookup) and
  tests k positions per key, vectorized.
- **exact fallback**: Bloom positives (possible false positives, and true
  hits needing the hop-aware re-add rule) join the exact seen table;
  negatives are *definitely new* and skip the join entirely.  Drop rule:
  a probed row is dropped only if an existing entry is strictly better on
  the (hop_count, discovery_time) prefix of the F7 keep-rule — provably
  byte-identical output vs the exact path (a strictly-worse row can never
  win the dedup window), with zero false drops.

The cuckoo filter (deletable — the analogue of the reference's 86400 s TTL
expiry) is provided as a second backend: 4-slot buckets, 16-bit
fingerprints, vectorized batch insert with eviction rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BITS_PER_KEY = 12
N_HASHES = 4
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via double hashing (Kirsch-
    Mitzenmacher): pos_i = (h1 + i*h2) mod n_bits, all uint64 vectorized."""
    k = keys.astype(np.uint64)
    h1 = (k * _MIX) ^ (k >> np.uint64(31))
    h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def _build_bitmap(keys: np.ndarray, bits_per_key: int = BITS_PER_KEY,
                  n_hashes: int = N_HASHES) -> tuple[bytes, int]:
    n_bits = max(1024, 1 << int(np.ceil(np.log2(max(1, len(keys)) * bits_per_key))))
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(keys, n_bits, n_hashes).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitmap.tobytes(), n_bits


def _test_bitmap(keys: np.ndarray, bitmap: np.ndarray, n_bits: int,
                 n_hashes: int = N_HASHES) -> np.ndarray:
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(keys, n_bits, n_hashes)
    bits = (bitmap[pos >> 3] >> (pos & 7)) & 1
    return bits.all(axis=1)


BLOOM_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("bitmap", T.BinaryType()),
    T.StructField("n_bits", T.LongType()),
    T.StructField("n_keys", T.LongType()),
])


def build_bloom(df: DataFrame, key_col: str = "uh48",
                bucket_col: str = "first_ip", n_buckets: int = 64) -> DataFrame:
    """One Bloom bitmap per bucket(first_ip) partition of the seen set."""
    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf[key_col].to_numpy(dtype=np.int64)
        bitmap, n_bits = _build_bitmap(np.unique(keys))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "bitmap": [bitmap], "n_bits": [n_bits],
                             "n_keys": [len(keys)]})

    bucketed = df.select(
        key_col,
        (F.abs(F.hash(bucket_col)) % n_buckets).cast("int").alias("bucket"))
    return bucketed.groupBy("bucket").applyInPandas(
        build_group, schema=BLOOM_SCHEMA)


def probe_bloom(new_df: DataFrame, bloom_rows: list, key_col: str = "uh48",
                bucket_col: str = "first_ip", n_buckets: int = 64,
                flag_name: str = "maybe_seen") -> DataFrame:
    """Adds ``maybe_seen``: Bloom membership per row, vectorized.  The
    bitmaps ship once per executor via Spark broadcast (mapPartitions-side
    lookup, not a join against the big side).

    FIXTURE-SCALE ONLY: ``bloom_rows`` is a driver-resident list of
    bitmaps — at 10^10 URLs those bitmaps are tens of GB and must never
    be collected.  The production path is :class:`BloomState` +
    :func:`filter_new_requests_incremental`, whose bitmaps stay a
    distributed (bucket, bitmap) table probed via a per-bucket cogroup.
    Kept for unit tests of the bitmap kernels only."""
    spark = new_df.sparkSession
    table = {int(r["bucket"]): (np.frombuffer(r["bitmap"], dtype=np.uint8),
                                int(r["n_bits"])) for r in bloom_rows}
    bc = spark.sparkContext.broadcast(table)

    @F.pandas_udf(T.BooleanType())
    def probe_udf(keys: pd.Series, buckets: pd.Series) -> pd.Series:
        t = bc.value
        out = np.zeros(len(keys), dtype=bool)
        karr = keys.to_numpy(dtype=np.int64)
        barr = buckets.to_numpy(dtype=np.int64)
        for b in np.unique(barr):
            entry = t.get(int(b))
            if entry is None:
                continue
            m = barr == b
            out[m] = _test_bitmap(karr[m], entry[0], entry[1])
        return pd.Series(out)

    bucket_expr = (F.abs(F.hash(bucket_col)) % n_buckets).cast("int")
    return new_df.withColumn(flag_name,
                             probe_udf(F.col(key_col), bucket_expr))


class BloomState:
    """Incrementally maintained DISTRIBUTED partitioned Bloom filter.

    The filter is a ``(bucket, bitmap, n_bits, n_keys)`` DataFrame — no
    bitmap bytes ever live on the driver.  Each round's update builds one
    delta bitmap per bucket from the new keys (``applyInPandas``,
    vectorized) and OR-combines it with the existing rows per bucket —
    i.e. exactly the ``groupBy(bucket).agg(bit_or(bitmap))`` shape that
    scales to 10^10 keys.  The probe (``probe_bloom_table``) cogroups the
    probe keys with the filter rows per bucket, so each task tests against
    only its own bucket's bitmap — no broadcast of the full filter.

    The merged state is ``localCheckpoint``-ed each update to truncate
    lineage; a production deployment writes it to a state table instead
    (same rows, same update job).

    Correctness note: Bloom state is a performance structure only — the
    exact fallback join in filter_new_requests_incremental guarantees parity
    regardless of FP rate; an overfull bucket degrades speed, never
    results.  ``overfull()`` (a 64-row count collect, no bitmap movement)
    tells the caller when a resized rebuild from the full frontier is
    worthwhile; ``size_bits_per_bucket`` picks the rebuild size from the
    observed key count so a rebuild cannot be immediately overfull again.
    """

    def __init__(self, n_buckets: int = 64, bits_per_bucket: int = 1 << 21,
                 n_hashes: int = N_HASHES):
        self.n_buckets = n_buckets
        self.n_bits = bits_per_bucket
        self.n_hashes = n_hashes
        self.state: DataFrame | None = None

    @staticmethod
    def size_bits_per_bucket(n_keys: int, n_buckets: int = 64,
                            bits_per_key: int = BITS_PER_KEY,
                            headroom: float = 2.0) -> int:
        """Power-of-two bucket size for ``n_keys`` total keys with growth
        headroom (ADVICE: a rebuild sized at the old fixed constant would
        be overfull again immediately once a bucket outgrew it)."""
        per_bucket = max(1, n_keys // n_buckets)
        need = int(per_bucket * bits_per_key * headroom)
        return max(1 << 21, 1 << int(np.ceil(np.log2(max(1, need)))))

    def _delta(self, df: DataFrame, key_col: str,
               bucket_col: str) -> DataFrame:
        n_bits, n_hashes = self.n_bits, self.n_hashes

        def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
            keys = np.unique(pdf["key"].to_numpy(dtype=np.int64))
            bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
            pos = _positions(keys, n_bits, n_hashes).ravel()
            np.bitwise_or.at(bitmap, pos >> 3,
                             (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                                 "bitmap": [bitmap.tobytes()],
                                 "n_bits": [n_bits],
                                 "n_keys": [len(keys)]})

        bucketed = df.select(
            F.col(key_col).alias("key"),
            (F.abs(F.hash(bucket_col)) % self.n_buckets).cast("int")
            .alias("bucket"))
        return bucketed.groupBy("bucket").applyInPandas(
            build_group, schema=BLOOM_SCHEMA)

    @staticmethod
    def _or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.frombuffer(pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bitmap"].iloc[1:]:
            np.bitwise_or(out, np.frombuffer(b, dtype=np.uint8), out=out)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "bitmap": [out.tobytes()],
                             "n_bits": [int(pdf["n_bits"].iloc[0])],
                             # upper bound (re-adds double-count): only the
                             # overfull() heuristic reads this
                             "n_keys": [int(pdf["n_keys"].sum())]})

    def add_df(self, df: DataFrame, key_col: str = "uh48",
               bucket_col: str = "first_ip") -> None:
        from ..memutil import release_local_checkpoint
        delta = self._delta(df, key_col, bucket_col)
        old = self.state
        merged = (delta if old is None
                  else old.unionByName(delta)
                  .groupBy("bucket").applyInPandas(
                      BloomState._or_merge, schema=BLOOM_SCHEMA))
        # eager=True materializes the new state BEFORE the superseded
        # checkpoint's blocks are dropped — without the explicit release
        # every round leaks one full bitmap set until the JVM GC happens
        # to run (the driver heap fills long before that under pytest)
        self.state = merged.localCheckpoint(eager=True)
        release_local_checkpoint(old)

    def release(self) -> None:
        """Free the current state's blocks.  The filter is unusable
        afterwards (call when the crawl is done or before a rebuild)."""
        from ..memutil import release_local_checkpoint
        release_local_checkpoint(self.state)
        self.state = None

    def counts(self) -> dict[int, int]:
        if self.state is None:
            return {}
        return {int(r["bucket"]): int(r["n_keys"])
                for r in self.state.select("bucket", "n_keys").collect()}

    def overfull(self, bits_per_key: int = BITS_PER_KEY) -> bool:
        return any(c * bits_per_key > self.n_bits
                   for c in self.counts().values())


def probe_bloom_table(new_df: DataFrame, state: BloomState,
                      key_col: str = "uh48", bucket_col: str = "first_ip",
                      flag_name: str = "maybe_seen") -> DataFrame:
    """Adds ``maybe_seen`` by cogrouping the distinct probe keys with the
    filter table per bucket: each task reads only its bucket's bitmap —
    the partition-local probe shape that scales past broadcastable filter
    sizes."""
    if state.state is None:
        return new_df.withColumn(flag_name, F.lit(False))
    n_hashes = state.n_hashes
    keys = new_df.select(
        F.col(key_col).alias("_k"),
        (F.abs(F.hash(bucket_col)) % state.n_buckets).cast("int")
        .alias("_bbucket")).distinct()

    probe_schema = T.StructType([
        T.StructField("_k", T.LongType()),
        T.StructField(flag_name, T.BooleanType()),
    ])

    def probe_group(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame({"_k": pd.Series([], dtype="int64"),
                                 flag_name: pd.Series([], dtype=bool)})
        karr = lpdf["_k"].to_numpy(dtype=np.int64)
        if rpdf.empty:
            flags = np.zeros(len(karr), dtype=bool)
        else:
            bm = np.frombuffer(rpdf["bitmap"].iloc[0], dtype=np.uint8)
            flags = _test_bitmap(karr, bm, int(rpdf["n_bits"].iloc[0]),
                                 n_hashes)
        return pd.DataFrame({"_k": karr, flag_name: flags})

    flags = (keys.groupBy("_bbucket")
             .cogroup(state.state.groupBy("bucket"))
             .applyInPandas(probe_group, schema=probe_schema))
    return (new_df.join(flags.withColumnRenamed("_k", key_col),
                        key_col, "left")
            .fillna({flag_name: False}))


def filter_new_requests_incremental(new_req: DataFrame,
                                    seen_requests: DataFrame,
                                    state: BloomState) -> DataFrame:
    """filter_new_requests against a maintained BloomState (no per-round
    rebuild); caller is responsible for state.add_df on appended rows."""
    probed = probe_bloom_table(new_req, state)
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    existing = seen_requests.select(
        "uh48", F.col("hop_count").alias("seen_hop"),
        F.col("discovery_time").alias("seen_disc"))
    kept = (
        probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        .join(existing, "uh48", "left")
        .filter(
            F.col("seen_hop").isNull()
            | (F.col("hop_count") < F.col("seen_hop"))
            | ((F.col("hop_count") == F.col("seen_hop"))
               & (F.col("discovery_time") <= F.col("seen_disc"))))
        .drop("seen_hop", "seen_disc")
    )
    return definite_new.unionByName(kept)


# ---------------------------------------------------------------------------
# Cuckoo filter (deletable membership — TTL-expiry analogue)
# ---------------------------------------------------------------------------

class CuckooFilter:
    """Vectorized cuckoo filter: 4-slot buckets, 16-bit fingerprints.
    Batch insert runs eviction rounds over the whole pending set at once
    (NumPy), so a million inserts are a handful of array passes."""

    SLOTS = 4
    MAX_KICKS = 50

    def __init__(self, capacity: int):
        n = max(1024, 1 << int(np.ceil(np.log2(capacity / 0.8 / self.SLOTS))))
        self.n_buckets = n
        self.table = np.zeros((n, self.SLOTS), dtype=np.uint16)  # 0 = empty

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        f = ((keys.astype(np.uint64) * _MIX) >> np.uint64(48)).astype(np.uint16)
        return np.where(f == 0, np.uint16(1), f)  # reserve 0 for empty

    def _b1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return ((b.astype(np.uint64)
                 ^ (fp.astype(np.uint64) * _MIX))
                % np.uint64(self.n_buckets)).astype(np.int64)

    def insert_batch(self, keys: np.ndarray) -> int:
        """Insert all keys; returns number that failed (table ~full)."""
        fp = self._fp(keys)
        b = self._b1(keys)
        pending_fp, pending_b = fp, b
        for _ in range(self.MAX_KICKS):
            if len(pending_fp) == 0:
                return 0
            next_fp, next_b = [], []
            for f, bb in zip(pending_fp, pending_b):
                row = self.table[bb]
                empty = np.where(row == 0)[0]
                if len(empty):
                    self.table[bb, empty[0]] = f
                    continue
                alt = int(self._alt(np.array([bb]), np.array([f]))[0])
                row2 = self.table[alt]
                empty2 = np.where(row2 == 0)[0]
                if len(empty2):
                    self.table[alt, empty2[0]] = f
                    continue
                # evict a deterministic victim (slot = fp % SLOTS)
                slot = int(f) % self.SLOTS
                victim = self.table[alt, slot]
                self.table[alt, slot] = f
                next_fp.append(victim)
                next_b.append(alt)
            pending_fp = np.array(next_fp, dtype=np.uint16)
            pending_b = np.array(next_b, dtype=np.int64)
        return len(pending_fp)

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        fp = self._fp(keys)
        b1 = self._b1(keys)
        b2 = self._alt(b1, fp)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_batch(self, keys: np.ndarray) -> np.ndarray:
        """Best-effort delete; returns which keys were found+removed."""
        fp = self._fp(keys)
        b1 = self._b1(keys)
        b2 = self._alt(b1, fp)
        removed = np.zeros(len(keys), dtype=bool)
        for i in range(len(keys)):
            for b in (b1[i], b2[i]):
                hit = np.where(self.table[b] == fp[i])[0]
                if len(hit):
                    self.table[b, hit[0]] = 0
                    removed[i] = True
                    break
        return removed
