"""Spectral-fingerprint audio dedup over the interleaved media payloads.

The audio twin of training/imagedup.py, completing the near-dup family
across every payload kind in the interleaved documents (text → MinHash /
SimHash, image/video → dHash, audio → this).  The fingerprint is the
classic Haitsma-Kalker robust-audio-hash recipe (Philips, "A Highly
Robust Audio Fingerprint", ISMIR 2002) collapsed to one 64-bit word per
clip: frame the signal into 8 uniform windows, compute 9 spectral band
energies per window (rFFT magnitude-squared, DC excluded), and set
bit (n, m) = band m energy < band m+1 energy — an 8x8 "spectral dHash"
over the (frame, band) grid, packed exactly like the image path.

Band-ENERGY COMPARISONS make the hash invariant to uniform volume
scaling (all energies scale by c^2) and robust to re-encoding dither;
a localized edit (a tone inserted into one window) flips only that
frame's row of bits — the small-but-nonzero Hamming case the LSH join
recovers.  Near-dup pairs go through the SAME Manku c-of-k block-LSH
Hamming join as text SimHash and image dHash
(training/dedup.py::simhash_near_dups): one Arrow-batched decode+hash
map stage, then a bucketed candidate join that is never all-pairs.

Reference tie-in: Gigablast indexes media refs but has no audio-content
dedup — a build-brief addition (multimodal training-data ops), not a
port.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imagedup import _FP_SCHEMA, _pack_bits
from .multimodal import decode_wav, encode_wav

N_FRAMES = 8
N_BANDS = 9          # 9 bands -> 8 adjacent compares per frame


def audio_spectral_grid(samples: np.ndarray, n_frames: int = N_FRAMES,
                        n_bands: int = N_BANDS) -> np.ndarray:
    """(n_frames, n_bands) band energies: uniform windows over the clip,
    rFFT magnitude-squared summed into contiguous bands (DC excluded).
    Short clips are zero-padded to n_frames windows."""
    x = samples.astype(np.float64)
    if len(x) < n_frames:
        x = np.pad(x, (0, n_frames - len(x)))
    win = len(x) // n_frames
    frames = x[: win * n_frames].reshape(n_frames, win)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    spec = spec[:, 1:]                       # drop DC
    n_bins = spec.shape[1]
    if n_bins < n_bands:
        spec = np.pad(spec, ((0, 0), (0, n_bands - n_bins)))
        n_bins = n_bands
    edges = np.linspace(0, n_bins, n_bands + 1).astype(int)
    return np.stack([spec[:, edges[m]:edges[m + 1]].sum(axis=1)
                     for m in range(n_bands)], axis=1)


def audiohash64(samples: np.ndarray) -> int:
    """64-bit spectral fingerprint: bit = band m energy < band m+1
    energy, row-major over the 8x8 (frame, adjacent-band) grid."""
    grid = audio_spectral_grid(samples)
    return _pack_bits(grid[:, :-1] < grid[:, 1:])


def _fp_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        ids, fps = [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            _, samples = decode_wav(bytes(payload))
            ids.append(int(mid))
            fps.append(audiohash64(samples))
        yield pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "simhash": pd.Series(fps, dtype="int64")})


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(doc_id, simhash) spectral fingerprints for every audio payload;
    schema matches training.dedup.SIMHASH_SCHEMA so the SimHash LSH
    machinery applies verbatim."""
    return (media.filter(F.col("kind") == "audio")
            .select(F.col("media_id").cast("long"), "payload")
            .mapInPandas(_fp_map, schema=_FP_SCHEMA))


def audio_neardup_pairs(media: DataFrame,
                        max_hamming: int = 6,
                        materialize: bool = True) -> DataFrame:
    """(doc_a, doc_b, hamming) audio near-dup pairs — decode+hash map
    stage, then the c-of-k blocked Hamming join (never all-pairs; keep
    max_hamming <= 6 at scale, same budget as the text/image paths).
    ``materialize`` follows the simhash_near_dups cache contract."""
    from .dedup import simhash_near_dups
    return simhash_near_dups(audio_fingerprints(media),
                             max_hamming=max_hamming,
                             materialize=materialize)


# --------------------------------------------------------------- fixtures

def _plant_twin_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Volume-scaled re-encode with a tone burst in ONE window: volume
    alone is hash-invariant (energy ratios survive c^2), the burst flips
    only that frame's bits — a true small-Hamming near-dup."""
    for batch in it:
        out = {"media_id": [], "kind": [], "payload": [],
               "meta_width": [], "meta_height": []}
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            sr, samples = decode_wav(bytes(payload))
            x = samples.astype(np.float64) * 0.8        # volume scale
            win = max(1, len(x) // N_FRAMES)
            t = np.arange(win, dtype=np.float64)
            x[2 * win: 3 * win] += 3000.0 * np.sin(
                2 * np.pi * 0.37 * t[: len(x[2 * win: 3 * win])])
            twin = np.clip(x, -32768, 32767).astype(np.int16)
            out["media_id"].append(int(mid) + 1_000_000)
            out["kind"].append("audio")
            out["payload"].append(encode_wav(twin, sr))
            out["meta_width"].append(0)
            out["meta_height"].append(0)
        yield pd.DataFrame({
            "media_id": pd.Series(out["media_id"], dtype="int64"),
            "kind": out["kind"],
            "payload": out["payload"],
            "meta_width": pd.Series(out["meta_width"], dtype="int32"),
            "meta_height": pd.Series(out["meta_height"], dtype="int32")})


def plant_audio_twins(media: DataFrame, every: int = 15) -> DataFrame:
    """Append a volume-scaled, one-window-perturbed twin (media_id +
    1_000_000) for every audio payload whose media_id % every == 1
    (audio payloads sit at media_id ≡ 1 mod 3 in the synthesized
    fixture, so a ≡0 residue would never select one)."""
    from .multimodal import MEDIA_SCHEMA
    bases = (media.filter((F.col("kind") == "audio")
                          & (F.col("media_id") % every == 1)))
    twins = bases.mapInPandas(_plant_twin_map, schema=MEDIA_SCHEMA)
    return media.unionByName(twins)
