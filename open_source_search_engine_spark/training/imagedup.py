"""Perceptual-hash image dedup over the interleaved media payloads.

A training-corpus twin of the text near-dup family (training/dedup.py)
for the image side of interleaved documents: the classic dHash/aHash
perceptual fingerprints (Krawetz's average/difference hash — the
standard public recipe: shrink, grayscale, compare) computed with this
repo's REAL pure-NumPy codecs (training/multimodal.py decode_image /
resample_image), then near-dup pairs through the SAME Manku c-of-k
block-LSH Hamming join the text SimHash path uses
(training/dedup.py::simhash_near_dups) — so the 100 TB shape is
identical: one embarrassingly-parallel Arrow-batched decode+hash map
stage, then a bucketed candidate join that is never all-pairs, with
recall guaranteed at the Hamming threshold by pigeonhole.

Integer-exact throughout (integer BT.601 luma, nearest-neighbor
resample, floor mean) so fingerprints are bit-identical across
partitionings and engines.

Reference tie-in: Gigablast stores one thumbnail per doc
(Images.cpp:118-230 selects it; XmlDoc keeps gbhasthumbnail) but has no
image-content dedup — this module is a build-brief addition
(multimodal training-data ops), not a port.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import decode_image, decode_video, encode_ppm, \
    resample_image

# integer BT.601 luma: (77R + 150G + 29B) >> 8 — the fixed-point form of
# the 0.299/0.587/0.114 weights (sums to 256 so the shift is exact)
_LUMA_W = np.array([77, 150, 29], dtype=np.int64)


def _gray(px: np.ndarray) -> np.ndarray:
    return (px.astype(np.int64) @ _LUMA_W) >> 8


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major 64-bit pack, bit i = bits.flat[i]; returned as the
    SIGNED int64 the simhash column convention stores."""
    flat = bits.reshape(-1).astype(np.uint64)
    word = np.uint64(0)
    word = (flat << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    return int(word.astype(np.int64))


def dhash64(px: np.ndarray) -> int:
    """Difference hash: 9x8 grayscale, bit = left pixel < right pixel.
    Invariant to global brightness/contrast shifts and (approximately)
    to rescaling, since everything reduces to the 9x8 grid first."""
    g = _gray(resample_image(px, 9, 8))          # (8 rows, 9 cols)
    return _pack_bits(g[:, :-1] < g[:, 1:])      # 8x8 adjacent compares


def ahash64(px: np.ndarray) -> int:
    """Average hash: 8x8 grayscale, bit = pixel > floor-mean."""
    g = _gray(resample_image(px, 8, 8))
    return _pack_bits(g > (int(g.sum()) // 64))


_HASHERS = {"dhash": dhash64, "ahash": ahash64}

_FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("simhash", T.LongType()),
])


def _make_fp_map(algo: str):
    hasher = _HASHERS[algo]

    def _fp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            ids, fps = [], []
            for mid, kind, payload in zip(batch["media_id"], batch["kind"],
                                          batch["payload"]):
                if kind == "image":
                    px = decode_image(bytes(payload))
                elif kind == "video":
                    # video fingerprints hash the middle frame, like the
                    # thumbnail path (multimodal resize) keys on it
                    frames = decode_video(bytes(payload))
                    px = frames[len(frames) // 2]
                else:
                    continue
                ids.append(int(mid))
                fps.append(hasher(px))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "simhash": pd.Series(fps, dtype="int64")})

    return _fp


def image_fingerprints(media: DataFrame, algo: str = "dhash") -> DataFrame:
    """(doc_id, simhash) perceptual fingerprints for every image/video
    payload — audio rows pass through the batch untouched (skipped).
    Output schema matches training.dedup.SIMHASH_SCHEMA so the text
    SimHash LSH machinery applies verbatim."""
    if algo not in _HASHERS:
        raise ValueError(f"unknown perceptual hash {algo!r}")
    return (media.filter(F.col("kind").isin("image", "video"))
            .select(F.col("media_id").cast("long"), "kind", "payload")
            .mapInPandas(_make_fp_map(algo), schema=_FP_SCHEMA))


def image_neardup_pairs(media: DataFrame, max_hamming: int = 6,
                        algo: str = "dhash",
                        materialize: bool = True) -> DataFrame:
    """(doc_a, doc_b, hamming) image near-dup pairs — decode+hash map
    stage, then the c-of-k blocked Hamming join (never all-pairs; keep
    max_hamming <= 6 at scale, same budget as the text path).
    ``materialize`` follows the simhash_near_dups cache contract."""
    from .dedup import simhash_near_dups
    return simhash_near_dups(image_fingerprints(media, algo),
                             max_hamming=max_hamming,
                             materialize=materialize)


# --------------------------------------------------------------- fixtures

def _plant_twin_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """2x nearest-neighbor upscale re-encoded as PPM — a true near-dup
    under dHash (the 9x8 grid resamples to almost the same cells; a few
    boundary cells may shift, which is exactly the Hamming-tolerant
    case the LSH join must recover)."""
    for batch in it:
        out = {"media_id": [], "kind": [], "payload": [],
               "meta_width": [], "meta_height": []}
        for mid, kind, payload, w, h in zip(
                batch["media_id"], batch["kind"], batch["payload"],
                batch["meta_width"], batch["meta_height"]):
            px = decode_image(bytes(payload))
            up = resample_image(px, 2 * px.shape[1], 2 * px.shape[0])
            # brighten the top-left fifth: a LOCALIZED edit so the twin
            # lands at small-but-nonzero Hamming distance (a uniform
            # full-frame shift would be invisible to dHash)
            ph, pw = max(1, up.shape[0] // 5), max(1, up.shape[1] // 5)
            patch = up[:ph, :pw].astype(np.int64) + 60
            up = up.copy()
            up[:ph, :pw] = np.clip(patch, 0, 255).astype(np.uint8)
            out["media_id"].append(int(mid) + 1_000_000)
            out["kind"].append("image")
            out["payload"].append(encode_ppm(up))
            out["meta_width"].append(2 * int(w))
            out["meta_height"].append(2 * int(h))
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "kind": out["kind"],
            "payload": out["payload"],
            "meta_width": pd.Series(out["meta_width"], dtype="int32"),
            "meta_height": pd.Series(out["meta_height"], dtype="int32")})


def plant_image_twins(media: DataFrame, every: int = 15) -> DataFrame:
    """Append a 2x-upscaled twin (media_id + 1_000_000) for every image
    payload whose media_id % every == 0 — the deterministic near-dup
    planting used by tests and the catalog fixture."""
    from .multimodal import MEDIA_SCHEMA
    bases = (media.filter((F.col("kind") == "image")
                          & (F.col("media_id") % every == 0)))
    twins = bases.mapInPandas(_plant_twin_map, schema=MEDIA_SCHEMA)
    return media.unionByName(twins)
