"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real — schemas, partition-friendly mapInPandas
with Arrow batches, deterministic outputs; the actual media decoding is
STUBBED (the runtime has no image/audio libraries): decode_image raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake feature vector is derived from the blob's sha256 — making the full
pipeline (schema, batching, UDF signatures) testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("id long, media_type string, blob binary, width int, "
                "height int")

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
    b"\x00\x00\x00\x18": "video/mp4",
    b"\x00\x00\x00\x20": "video/mp4",
}


def sniff_media_type(blob: bytes) -> str:
    for magic, mt in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


def extract_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap metadata without decoding: size, content hash, magic-based
    type sniffing (JVM-side where possible, Arrow batch for the sniff)."""
    base = df.withColumn("n_bytes", F.octet_length(blob_col)) \
             .withColumn("content_sha", F.sha2(F.col(blob_col), 256))

    def sniff(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["sniffed_type"] = [
                sniff_media_type(bytes(b) if b is not None else b"")
                for b in pdf[blob_col]]
            yield pdf

    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType(list(base.schema.fields) +
                        [StructField("sniffed_type", StringType())])
    return base.mapInPandas(sniff, schema=schema)


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image blob to HxWx3 uint8. STUB: no codec libs in this
    runtime. With fake=True returns a deterministic 4x4x3 array derived
    from sha256(blob) so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library not present in this "
            "runtime; pass fake=True for deterministic test features")
    h = hashlib.sha256(blob).digest()
    arr = np.frombuffer((h * 3)[:48], dtype=np.uint8)
    return arr.reshape(4, 4, 3)


def image_features(df: DataFrame, blob_col: str = "blob",
                   id_col: str = "id", fake: bool = True) -> DataFrame:
    """Decode -> feature-extract as a mapInPandas stage (Arrow batches).
    Feature = per-channel mean of the (stub-)decoded image."""

    id_type = df.schema[id_col].dataType.simpleString()

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, features = [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    # MEDIA_SCHEMA allows null blobs (extract_metadata
                    # tolerates them); a null feature row beats killing
                    # the whole job in bytes(None)
                    ids.append(rid)
                    features.append(None)
                    continue
                img = decode_image(bytes(blob), fake=fake)
                features.append(img.reshape(-1, 3).mean(axis=0).round(4)
                                .tolist())
                ids.append(rid)
            yield pd.DataFrame({id_col: ids, "feature": features})

    return df.mapInPandas(
        feats, schema=f"{id_col} {id_type}, feature array<double>")


def resize_images(df: DataFrame, width: int, height: int,
                  blob_col: str = "blob", id_col: str = "id",
                  fake: bool = True) -> DataFrame:
    """Decode -> resize as a mapInPandas stage. STUB resampling: nearest-
    neighbor index arithmetic over the (stub-)decoded array — the Spark
    plumbing (schema, batch shape, output encoding) is real; swap
    decode_image/fake for a codec library in production."""

    id_type = df.schema[id_col].dataType.simpleString()

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs, ws, hs = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    ids.append(rid)
                    blobs.append(None)
                    ws.append(width)
                    hs.append(height)
                    continue
                img = decode_image(bytes(blob), fake=fake)
                ih, iw = img.shape[:2]
                yy = (np.arange(height) * ih // height)
                xx = (np.arange(width) * iw // width)
                out = img[yy[:, None], xx[None, :]]
                ids.append(rid)
                blobs.append(out.tobytes())
                ws.append(width)
                hs.append(height)
            yield pd.DataFrame({id_col: ids, "blob": blobs,
                                "width": ws, "height": hs})

    return df.mapInPandas(
        resize,
        schema=f"{id_col} {id_type}, blob binary, width int, height int")


def frame_sample(df: DataFrame, blob_col: str = "blob", id_col: str = "id",
                 every_n: int = 2) -> DataFrame:
    """Deterministic frame sampling stub for video blobs: treats each
    16-byte window as a 'frame', keeps every n-th, returns frame hashes
    (real plumbing: explode -> one row per sampled frame)."""

    id_type = df.schema[id_col].dataType.simpleString()

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue  # null blob: no frames, like an empty one
                b = bytes(blob)
                # len(b)//16 full frames; an empty/short blob yields NO
                # frames (max(...,1) fabricated a phantom frame hashing
                # b"" that made all empty blobs frame-dedup together)
                for fi in range(0, len(b) // 16, every_n):
                    ids.append(rid)
                    idxs.append(fi)
                    hashes.append(hashlib.sha256(
                        b[fi * 16:(fi + 1) * 16]).hexdigest()[:16])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_hash": hashes})

    return df.mapInPandas(
        frames,
        schema=f"{id_col} {id_type}, frame_idx int, frame_hash string")
