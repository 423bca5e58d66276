"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the decode kernels are STUBBED
behind deterministic fakes (clearly marked) — but the Spark-side plumbing is
real and tested: schema, Arrow batch shape, mapInPandas signatures,
partitioning.  Swap ``_fake_decode`` for PIL/torchaudio in production; the
DataFrame plan does not change.

The reference's analogue: media refs harvested for thumbnails
(``Images.cpp:160-178``) and shipped through the same record pipeline as
text (``XmlDoc.cpp:15293-15303`` keeps them out of the frontier).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # 'image'|'audio'|'video'
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # 8-dim stub
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB: deterministic 8-dim 'feature' from a sha256 of the payload.
    Replace with a real decoder (PIL / libav) in production — the UDF
    signature and batch shape are what the pipeline depends on."""
    d = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(d[:8], dtype=np.uint8).astype(np.float32)
            / np.float32(255.0))


def decode_features_map_in_pandas(
        it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        feats = [_fake_decode(p).tolist() for p in batch["payload"]]
        yield pd.DataFrame({
            "media_id": batch["media_id"].astype("int64"),
            "kind": batch["kind"],
            "payload_bytes": batch["payload"].map(
                lambda p: len(p or b"")).astype("int64"),
            "feature": feats,
        })


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents fixture: text bytes stand in
    for the opaque payload; kind cycles deterministically."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 1920).cast("int").alias("meta_width"),
        (F.col("doc_id") % 1080).cast("int").alias("meta_height"),
    )


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
    T.StructField("payload_out_bytes", T.LongType()),
])


def make_resize_map_in_pandas(target_w: int, target_h: int):
    """STUB decode+resize: deterministic byte-count model of a resize
    (real impl: PIL thumbnail; the reference shells out to pnmscale —
    gbconvert.sh / Images.cpp thumbnail path).  Batch shape is real."""
    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            n = batch["payload"].map(lambda p: len(p or b"")).astype("int64")
            yield pd.DataFrame({
                "media_id": batch["media_id"].astype("int64"),
                "out_width": target_w,
                "out_height": target_h,
                # deterministic stand-in for the re-encoded size
                "payload_out_bytes": (n % 10_000) * target_w * target_h // 4096,
            })
    return _resize


def resize_media(media: DataFrame, w: int = 160, h: int = 120) -> DataFrame:
    return media.select("media_id", "payload").mapInPandas(
        make_resize_map_in_pandas(w, h), schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_feature", T.ArrayType(T.FloatType())),
])


def frame_sample_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampling for video payloads: N deterministic 'frames'
    per payload (real impl: libav seek+decode).  Emits one row per frame —
    the explode-shaped output the downstream pipeline partitions on."""
    rows = {"media_id": [], "frame_idx": [], "frame_feature": []}
    for batch in it:
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            n_frames = 1 + (len(payload or b"") % 4)
            for i in range(n_frames):
                rows["media_id"].append(int(mid))
                rows["frame_idx"].append(i)
                rows["frame_feature"].append(
                    _fake_decode((payload or b"") + bytes([i])).tolist())
    if rows["media_id"]:   # empty partitions yield nothing (Arrow cannot
        yield pd.DataFrame(rows)   # type an empty object column)


def sample_frames(media: DataFrame) -> DataFrame:
    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(frame_sample_map_in_pandas, schema=FRAME_SCHEMA))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column; at scale
    this is the stage you'd repartition by size so each executor's batches
    stay within memory (payloads are opaque blobs)."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_features_map_in_pandas, schema=FEATURE_SCHEMA)
