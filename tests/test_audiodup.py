"""Spectral-fingerprint audio dedup (training/audiodup.py): the
Haitsma-Kalker-style 64-bit band-energy hash, LSH pair recovery vs a
brute-force popcount twin, and the planted-twin fixture."""

from __future__ import annotations

import numpy as np
import pytest

from open_source_search_engine_spark.training.audiodup import (
    audio_spectral_grid, audiohash64, N_BANDS, N_FRAMES)
from open_source_search_engine_spark.training.multimodal import (
    decode_wav, encode_wav)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _clip(seed: int, n: int = 4096) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    x = (8000 * np.sin(2 * np.pi * (0.01 + 0.005 * (seed % 7)) * t)
         + 3000 * rng.standard_normal(n))
    return np.clip(x, -32768, 32767).astype(np.int16)


def test_grid_shape_and_determinism():
    g = audio_spectral_grid(_clip(1))
    assert g.shape == (N_FRAMES, N_BANDS)
    assert audiohash64(_clip(1)) == audiohash64(_clip(1).copy())


def test_discriminative_across_clips():
    hams = [_ham(audiohash64(_clip(a)), audiohash64(_clip(b)))
            for a, b in [(1, 2), (2, 3), (3, 4)]]
    assert min(hams) > 6


def test_volume_invariance():
    x = _clip(5)
    half = (x.astype(np.float64) * 0.5).astype(np.int16)
    assert _ham(audiohash64(x), audiohash64(half)) <= 2


def test_localized_edit_small_hamming():
    x = _clip(6).astype(np.float64)
    win = len(x) // N_FRAMES
    t = np.arange(win, dtype=np.float64)
    x[win:2 * win] += 4000 * np.sin(2 * np.pi * 0.3 * t)
    edited = np.clip(x, -32768, 32767).astype(np.int16)
    h = _ham(audiohash64(_clip(6)), audiohash64(edited))
    assert 1 <= h <= 8          # one frame's row of bits at most


def test_short_clip_padding():
    assert isinstance(audiohash64(np.ones(3, dtype=np.int16)), int)


def test_neardup_pairs_match_bruteforce(spark):
    from open_source_search_engine_spark.training.audiodup import (
        audio_fingerprints, audio_neardup_pairs, plant_audio_twins)
    from open_source_search_engine_spark.training.multimodal import (
        media_from_documents)
    docs = spark.createDataFrame(
        [(i, f"spoken document {i}") for i in range(90)],
        ["doc_id", "text"])
    media = plant_audio_twins(media_from_documents(docs), every=15)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in audio_neardup_pairs(media, max_hamming=6).collect()}
    fps = audio_fingerprints(media).collect()
    want = {}
    for i, a in enumerate(fps):
        for b in fps[i + 1:]:
            x, y = sorted((a["doc_id"], b["doc_id"]))
            h = _ham(a["simhash"] & 0xFFFFFFFFFFFFFFFF,
                     b["simhash"] & 0xFFFFFFFFFFFFFFFF)
            if h <= 6:
                want[(x, y)] = h
    assert got == want
    planted = {r["media_id"] for r in media.collect()
               if r["media_id"] >= 1_000_000}
    assert planted and all((m - 1_000_000, m) in got for m in planted)
    # spark fingerprints are bit-identical to the local kernel
    by_id = {r["doc_id"]: r["simhash"] for r in fps}
    for r in media.filter("kind = 'audio'").limit(3).collect():
        _, samples = decode_wav(bytes(r["payload"]))
        assert by_id[r["media_id"]] == audiohash64(samples)
