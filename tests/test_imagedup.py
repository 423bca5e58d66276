"""Perceptual-hash image dedup (training/imagedup.py): integer dHash /
aHash kernels over the real codecs, LSH pair recovery vs a brute-force
popcount twin, and the planted-twin fixture."""

from __future__ import annotations

import numpy as np
import pytest

from open_source_search_engine_spark.training.imagedup import (
    ahash64, dhash64)
from open_source_search_engine_spark.training.multimodal import (
    decode_image, resample_image, synthesize_payload)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dhash_deterministic_and_discriminative():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    other = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    assert dhash64(px) == dhash64(px.copy())
    # independent noise images land near 32 bits apart
    assert _ham(dhash64(px), dhash64(other)) > 16


def test_dhash_brightness_and_scale_invariance():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 200, size=(24, 32, 3), dtype=np.uint8)
    bright = np.clip(px.astype(int) + 30, 0, 255).astype(np.uint8)
    up = resample_image(px, 64, 48)
    assert _ham(dhash64(px), dhash64(bright)) <= 2
    assert _ham(dhash64(px), dhash64(up)) <= 2


def test_ahash_mean_threshold():
    # constant image: no pixel exceeds the mean -> all-zero hash
    flat = np.full((10, 10, 3), 100, dtype=np.uint8)
    assert ahash64(flat) == 0
    # half dark / half light: exactly the light half is set
    half = np.zeros((8, 8, 3), dtype=np.uint8)
    half[:, 4:] = 255
    got = ahash64(half)
    bits = [(got >> i) & 1 for i in range(64)]
    assert sum(bits) == 32


def test_fingerprints_cover_images_and_videos(spark):
    from open_source_search_engine_spark.training.imagedup import (
        image_fingerprints)
    from open_source_search_engine_spark.training.multimodal import (
        media_from_documents)
    docs = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(12)], ["doc_id", "text"])
    media = media_from_documents(docs)
    fps = image_fingerprints(media).collect()
    kinds = {r["doc_id"] % 3 for r in fps}
    # doc_id % 3: 0=image, 2=video get fingerprints; 1=audio skipped
    assert kinds == {0, 2}
    assert len(fps) == 8
    # bit-identical to the local kernel on the same payloads
    for r in media.filter("kind = 'image'").collect():
        want = dhash64(decode_image(bytes(r["payload"])))
        got = [f["simhash"] for f in fps if f["doc_id"] == r["media_id"]]
        assert got == [want]


def test_neardup_pairs_match_bruteforce(spark):
    from open_source_search_engine_spark.training.imagedup import (
        image_fingerprints, image_neardup_pairs, plant_image_twins)
    from open_source_search_engine_spark.training.multimodal import (
        media_from_documents)
    docs = spark.createDataFrame(
        [(i, f"body of document {i}") for i in range(90)],
        ["doc_id", "text"])
    media = plant_image_twins(media_from_documents(docs), every=15)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in image_neardup_pairs(media, max_hamming=6).collect()}
    # brute-force popcount twin over the same fingerprints
    fps = image_fingerprints(media).collect()
    want = {}
    for i, a in enumerate(fps):
        for b in fps[i + 1:]:
            x, y = sorted((a["doc_id"], b["doc_id"]))
            h = _ham(a["simhash"] & 0xFFFFFFFFFFFFFFFF,
                     b["simhash"] & 0xFFFFFFFFFFFFFFFF)
            if h <= 6:
                want[(x, y)] = h
    assert got == want
    # every planted twin is recovered
    planted = {r["media_id"] for r in media.collect()
               if r["media_id"] >= 1_000_000}
    assert planted and all((m - 1_000_000, m) in got for m in planted)


def test_planted_twins_have_small_nonzero_tail():
    # at least some twins land at Hamming >= 1 so the catalog entry
    # exercises the tolerant (not just exact-equal) path
    hams = []
    for doc_id in range(0, 300, 15):
        if doc_id % 3 != 0:
            continue
        _, payload, _, _ = synthesize_payload(doc_id, f"body of doc {doc_id}")
        px = decode_image(payload)
        up = resample_image(px, 2 * px.shape[1], 2 * px.shape[0])
        ph, pw = max(1, up.shape[0] // 5), max(1, up.shape[1] // 5)
        up = up.copy()
        up[:ph, :pw] = np.clip(
            up[:ph, :pw].astype(np.int64) + 60, 0, 255).astype(np.uint8)
        hams.append(_ham(dhash64(px), dhash64(up)))
    assert hams and max(hams) >= 1 and max(hams) <= 6


def test_unknown_algo_rejected(spark):
    from open_source_search_engine_spark.training.imagedup import (
        image_fingerprints)
    docs = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    from open_source_search_engine_spark.training.multimodal import (
        media_from_documents)
    with pytest.raises(ValueError):
        image_fingerprints(media_from_documents(docs), algo="phash99")
