"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, plus REAL decode / feature-extract / resize / frame-sample
kernels over them.

The reference's thumbnail pipeline is literally ``<fmt>topnm | pnmscale
-xysize <w> <h> | ppmtojpeg`` driven from ``Images.cpp:160-178`` (media refs
harvested per page) — i.e. decode-to-PPM then aspect-fit box scale.  This
module implements that natively: a real P6-PPM parser/encoder, a real
RIFF/PCM16 WAV parser/encoder, a raw-frame video container, aspect-fit
resampling, uniform frame sampling, and 8-dim content features — all pure
NumPy inside Arrow-batched ``mapInPandas`` (no per-row Python UDFs, no
image libraries needed).  Formats the container has no codec for (JPEG,
PNG) dispatch to PIL when importable and raise ``NotImplementedError``
otherwise — the DataFrame plan does not change when a real codec lands.

``media_from_documents`` synthesizes GENUINE payloads (valid PPM / WAV /
video bytes, deterministic from each document's content hash) so the whole
path — synthesize → decode → feature/resize/frames — is exercised for real
at every scale, per the fixture-only data rule.

Reference analogues: ``Images.cpp:160-178`` (thumbnail harvest+scale),
``XmlDoc.cpp:15293-15303`` (media refs kept out of the frontier).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # 'image'|'audio'|'video'
    T.StructField("payload", T.BinaryType()),     # real PPM/WAV/RV01 bytes
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # 8-dim
])

FEATURE_DIM = 8
_VIDEO_MAGIC = b"RV01"


# ---------------------------------------------------------------------------
# Codecs (pure NumPy).  Encoders exist so the fixture payloads are REAL
# files of each format; decoders are what production data would hit.
# ---------------------------------------------------------------------------

def encode_ppm(px: np.ndarray) -> bytes:
    """P6 binary PPM from an (H, W, 3) uint8 array."""
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse binary P6 PPM (full grammar: whitespace-separated header
    tokens, ``#`` comments) into an (H, W, 3) uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end-of-line
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        # a '#' glued to a token with no separating whitespace ("13#c\n9")
        # is legal PNM: the comment starts mid-stream, the token ends there
        while (pos < n and not payload[pos:pos + 1].isspace()
               and payload[pos] != 0x23):
            pos += 1
        tokens.append(int(payload[start:pos]))
    if payload[pos:pos + 1] == b"#":     # comment glued to maxval: its
        while pos < n and payload[pos] != 0x0A:   # newline is the single
            pos += 1                               # ws before the raster
    pos += 1                                       # single ws after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def encode_bmp(px: np.ndarray) -> bytes:
    """Uncompressed 24-bit BI_RGB bottom-up BMP from (H, W, 3) uint8."""
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3                   # rows pad to 4 bytes
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)   # BGR, bottom-up
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse uncompressed 24-bit BI_RGB BMP into (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off, = struct.unpack_from("<I", payload, 10)
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    comp, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                         offset=off).reshape(h, row_size)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]       # BGR → RGB
    if h_signed > 0:                                          # bottom-up
        px = px[::-1]
    return px.copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Format-dispatching image decode → (H, W, 3) uint8 RGB.
    PPM and BMP decode natively; JPEG/PNG/GIF use PIL when importable
    (it is not baked into this container) and fail loudly otherwise —
    mirroring the reference's per-format ``*topnm`` dispatch
    (``Images.cpp`` thumbnail exec ladder)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        from io import BytesIO
        from PIL import Image                      # optional, not baked in
        return np.asarray(Image.open(BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "JPEG/PNG decode needs PIL (not in this container); "
            "PPM and BMP decode natively")


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE PCM16 mono from an int16 array."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/WAVE PCM16 mono by walking chunks → (sample_rate, int16)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            audio_fmt, channels = struct.unpack_from("<HH", payload, pos + 8)
            sr, = struct.unpack_from("<I", payload, pos + 12)
            bits, = struct.unpack_from("<H", payload, pos + 22)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                 offset=pos + 8)
        pos += 8 + size + (size & 1)               # chunks pad to even
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, data


def encode_video(frames: np.ndarray) -> bytes:
    """Raw-frame container: ``RV01`` magic + <HHH>(w, h, n) + n raw RGB
    frames.  Stands in for a real container; frame-sampling semantics
    (uniform seek+decode) are identical."""
    n, h, w, _ = frames.shape
    return (_VIDEO_MAGIC + struct.pack("<HHH", w, h, n)
            + frames.astype(np.uint8).tobytes())


def decode_video(payload: bytes) -> np.ndarray:
    """Parse the RV01 container → (n_frames, H, W, 3) uint8."""
    if payload[:4] != _VIDEO_MAGIC:
        raise ValueError("not an RV01 stream")
    w, h, n = struct.unpack_from("<HHH", payload, 4)
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=n * h * w * 3, offset=10)
    return raster.reshape(n, h, w, 3).copy()


# ---------------------------------------------------------------------------
# Feature extraction (real content statistics, 8-dim float32)
# ---------------------------------------------------------------------------

def image_features(px: np.ndarray) -> np.ndarray:
    """[mean_r, mean_g, mean_b, std_luma, edge_energy, w/4096, h/4096, 0]"""
    xf = px.astype(np.float64) / 255.0
    luma = xf @ np.array([0.299, 0.587, 0.114])
    edge = float(np.mean(np.abs(np.diff(luma, axis=1)))) if px.shape[1] > 1 \
        else 0.0
    return np.array([xf[:, :, 0].mean(), xf[:, :, 1].mean(),
                     xf[:, :, 2].mean(), luma.std(), edge,
                     px.shape[1] / 4096.0, px.shape[0] / 4096.0, 0.0],
                    dtype=np.float32)


def audio_features(sr: int, samples: np.ndarray) -> np.ndarray:
    """[rms, zero_cross_rate, peak, mean_abs, band0..band3] — bands are
    rFFT energy fractions over four equal frequency quarters."""
    xf = samples.astype(np.float64) / 32768.0
    if xf.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    zcr = float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1]))) \
        if xf.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(xf)) ** 2
    total = spec.sum() or 1.0
    bands = [float(chunk.sum() / total)
             for chunk in np.array_split(spec, 4)]
    return np.array([np.sqrt(np.mean(xf ** 2)), zcr, np.abs(xf).max(),
                     np.abs(xf).mean(), *bands], dtype=np.float32)


def video_features(frames: np.ndarray) -> np.ndarray:
    """Middle-frame image features with the last slot carrying the frame
    count (n/64) — one fixed-width vector per clip."""
    feat = image_features(frames[len(frames) // 2])
    feat[7] = np.float32(len(frames) / 64.0)
    return feat


def media_features(kind: str, payload: bytes) -> np.ndarray:
    if kind == "image":
        return image_features(decode_image(payload))
    if kind == "audio":
        return audio_features(*decode_wav(payload))
    if kind == "video":
        return video_features(decode_video(payload))
    raise ValueError(f"unknown media kind {kind!r}")


def decode_features_map_in_pandas(
        it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        feats = [media_features(k, p).tolist()
                 for k, p in zip(batch["kind"], batch["payload"])]
        yield pd.DataFrame({
            "media_id": batch["media_id"].astype("int64"),
            "kind": batch["kind"],
            "payload_bytes": batch["payload"].map(
                lambda p: len(p or b"")).astype("int64"),
            "feature": feats,
        })


# ---------------------------------------------------------------------------
# Fixture synthesis: REAL payloads, deterministic from the document text
# ---------------------------------------------------------------------------

def _doc_seed(text: str) -> int:
    return int.from_bytes(
        hashlib.sha256((text or "").encode("utf-8")).digest()[:8], "big")


def synthesize_payload(doc_id: int, text: str) -> tuple[str, bytes, int, int]:
    """(kind, payload, width, height) — a genuine PPM / WAV / RV01 file
    whose bytes derive only from (doc_id, text).  NumPy's seeded PCG64
    stream is version-stable, so goldens stay byte-identical."""
    kind = ("image", "audio", "video")[doc_id % 3]
    rng = np.random.default_rng(np.uint64(_doc_seed(text)) ^ np.uint64(doc_id))
    if kind == "image":
        w, h = 16 + doc_id % 17, 12 + doc_id % 13
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        return kind, encode_ppm(px), w, h
    if kind == "audio":
        n = 256 + (doc_id % 7) * 128
        t = np.arange(n) / 8000.0
        freq = 110.0 * (1 + doc_id % 8)
        sig = (0.6 * np.sin(2 * np.pi * freq * t)
               + 0.1 * rng.standard_normal(n))
        samples = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
        return kind, encode_wav(samples), 0, 0
    w, h, n = 8 + doc_id % 5, 6 + doc_id % 4, 2 + doc_id % 5
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    return kind, encode_video(frames), w, h


def _synthesize_map_in_pandas(
        it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        rows = [synthesize_payload(int(d), t)
                for d, t in zip(batch["doc_id"], batch["text"])]
        yield pd.DataFrame({
            "media_id": batch["doc_id"].astype("int64"),
            "kind": [r[0] for r in rows],
            "payload": [r[1] for r in rows],
            "meta_width": pd.Series([r[2] for r in rows], dtype="int32"),
            "meta_height": pd.Series([r[3] for r in rows], dtype="int32"),
        })


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents fixture: every payload is a
    REAL file of its format (PPM / WAV / RV01), deterministic per doc."""
    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
            .mapInPandas(_synthesize_map_in_pandas, schema=MEDIA_SCHEMA))


# ---------------------------------------------------------------------------
# Resize (aspect-fit box scale — pnmscale -xysize semantics)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
    T.StructField("payload_out_bytes", T.LongType()),
])


def fit_box(w: int, h: int, box_w: int, box_h: int) -> tuple[int, int]:
    """Aspect-preserving fit into (box_w, box_h) — ``pnmscale -xysize``,
    the reference's thumbnail geometry (Images.cpp scale step)."""
    scale = min(box_w / w, box_h / h)
    return max(1, round(w * scale)), max(1, round(h * scale))


def resample_image(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample via center-of-pixel index maps."""
    h, w, _ = px.shape
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h), h - 1).astype(int)
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w), w - 1).astype(int)
    return px[yi][:, xi]


def make_resize_map_in_pandas(box_w: int, box_h: int):
    """Real decode → aspect-fit resample → re-encode.  Images re-encode as
    PPM; videos thumbnail from their middle frame (the reference keeps one
    thumbnail per document)."""
    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = {"media_id": [], "out_width": [], "out_height": [],
                   "payload_out_bytes": []}
            for mid, kind, payload in zip(batch["media_id"], batch["kind"],
                                          batch["payload"]):
                if kind == "image":
                    px = decode_image(payload)
                else:
                    frames = decode_video(payload)
                    px = frames[len(frames) // 2]
                ow, oh = fit_box(px.shape[1], px.shape[0], box_w, box_h)
                thumb = encode_ppm(resample_image(px, ow, oh))
                out["media_id"].append(int(mid))
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["payload_out_bytes"].append(len(thumb))
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "out_width": pd.Series(out["out_width"], dtype="int32"),
                "out_height": pd.Series(out["out_height"], dtype="int32"),
                "payload_out_bytes": pd.Series(out["payload_out_bytes"],
                                               dtype="int64"),
            })
    return _resize


def resize_media(media: DataFrame, w: int = 160, h: int = 120) -> DataFrame:
    """Thumbnail every visual payload (image + video) into a w×h box."""
    return (media.filter(F.col("kind").isin("image", "video"))
            .select("media_id", "kind", "payload")
            .mapInPandas(make_resize_map_in_pandas(w, h),
                         schema=RESIZE_SCHEMA))


# ---------------------------------------------------------------------------
# Frame sampling
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_feature", T.ArrayType(T.FloatType())),
])


def make_frame_sample_map_in_pandas(max_frames: int = 4):
    """Uniform frame sampling from the video container: decode, take up to
    ``max_frames`` evenly spaced frames, one row per frame (the
    explode-shaped output downstream pipelines partition on)."""
    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {"media_id": [], "frame_idx": [], "frame_feature": []}
        for batch in it:
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                frames = decode_video(payload)
                take = np.unique(np.linspace(
                    0, len(frames) - 1,
                    min(max_frames, len(frames))).astype(int))
                for i in take:
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(int(i))
                    rows["frame_feature"].append(
                        image_features(frames[i]).tolist())
        if rows["media_id"]:   # empty partitions yield nothing (Arrow cannot
            yield pd.DataFrame(rows)   # type an empty object column)
    return _frames


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(make_frame_sample_map_in_pandas(max_frames),
                         schema=FRAME_SCHEMA))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary column; at
    scale this is the stage to repartition by payload size so each
    executor's batches stay within memory (payloads are opaque blobs)."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_features_map_in_pandas, schema=FEATURE_SCHEMA)
