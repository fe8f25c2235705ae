"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is mapInPandas over Arrow batches (one Python
call per media object, all pixel/sample math numpy). Decoding is REAL
for every format the sniffer recognizes, implemented from the public
specs with stdlib zlib/struct + numpy: PNG, BMP, binary PNM, GIF
(media_codecs), baseline JPEG (jpeg_codec), PCM WAV, FLAC (flac_codec
— real compressed audio, lossless), Y4M, and
Motion-JPEG in AVI (avi_codec — real compressed video: container walk
+ per-frame T.81 decode, with frame sampling that never entropy-decodes
skipped frames). Video codecs needing a motion-compensation stack we
don't ship (H.26x in MP4) stay loudly unsupported via MediaDecodeError
/ the decode_error column in the batch operators. `fake=True` keeps the
legacy deterministic sha256-derived stub for plumbing tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import media_codecs as mc
from .media_codecs import MediaDecodeError

MEDIA_SCHEMA = ("id long, media_type string, blob binary, width int, "
                "height int")

_MAGIC = {
    b"fLaC": "audio/flac",
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"BM": "image/bmp",
    b"P5": "image/x-portable-graymap",
    b"P6": "image/x-portable-pixmap",
    b"YUV4MPEG2": "video/x-yuv4mpeg",
    b"\x00\x00\x00\x18": "video/mp4",
    b"\x00\x00\x00\x20": "video/mp4",
}

def _decode_jpeg(blob: bytes):
    from .jpeg_codec import decode_jpeg
    return decode_jpeg(blob)


# formats decode_image can really decode (media_codecs / jpeg_codec)
_DECODABLE_IMAGES = {
    "image/png": mc.decode_png,
    "image/bmp": mc.decode_bmp,
    "image/gif": mc.decode_gif,
    "image/x-portable-graymap": mc.decode_pnm,
    "image/x-portable-pixmap": mc.decode_pnm,
    "image/jpeg": _decode_jpeg,
}


def sniff_media_type(blob: bytes) -> str:
    if blob[:4] == b"RIFF":
        return "video/avi" if blob[8:12] == b"AVI " else "audio/wav"
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
    """Decode an image blob to HxWx3 uint8 (grayscale replicated, alpha
    dropped). Real decode for every sniffable image format: PNG/BMP/
    PNM/GIF (media_codecs) and baseline JPEG (jpeg_codec). With
    fake=True returns a deterministic 4x4x3 array derived from
    sha256(blob) for plumbing tests."""
    if fake:
        h = hashlib.sha256(blob).digest()
        arr = np.frombuffer((h * 3)[:48], dtype=np.uint8)
        return arr.reshape(4, 4, 3)
    mt = sniff_media_type(blob)
    dec = _DECODABLE_IMAGES.get(mt)
    if dec is None:
        raise MediaDecodeError(f"not a decodable image (sniffed {mt})")
    return mc.to_rgb(dec(blob))


def image_features(df: DataFrame, blob_col: str = "blob",
                   id_col: str = "id", fake: bool = True) -> DataFrame:
    """Decode -> feature-extract as a mapInPandas stage (Arrow batches).
    Feature = per-channel mean of the decoded image (real codecs with
    fake=False; the deterministic sha256 stub with fake=True)."""

    id_type = df.schema[id_col].dataType.simpleString()

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, features = [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                ids.append(rid)
                if blob is None:
                    # MEDIA_SCHEMA allows null blobs (extract_metadata
                    # tolerates them); a null feature row beats killing
                    # the whole job in bytes(None)
                    features.append(None)
                    continue
                try:
                    img = decode_image(bytes(blob), fake=fake)
                except (MediaDecodeError, NotImplementedError):
                    # same null-propagation as null blobs: one corrupt
                    # blob must not abort the batch (use image_stats
                    # for the per-row error string)
                    features.append(None)
                    continue
                features.append(img.reshape(-1, 3).mean(axis=0).round(4)
                                .tolist())
            yield pd.DataFrame({id_col: ids, "feature": features})

    return df.mapInPandas(
        feats, schema=f"{id_col} {id_type}, feature array<double>")


def resize_images(df: DataFrame, width: int, height: int,
                  blob_col: str = "blob", id_col: str = "id",
                  fake: bool = True, method: str = "nearest",
                  encode: str = "raw") -> DataFrame:
    """Decode -> resize as a mapInPandas stage. method: "nearest" or
    "bilinear" (half-pixel centers); encode: "raw" emits packed RGB
    bytes (width/height columns carry the shape), "png" re-encodes
    through the real PNG codec."""

    id_type = df.schema[id_col].dataType.simpleString()
    resample = (mc.resize_bilinear if method == "bilinear"
                else mc.resize_nearest)
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")
    if encode not in ("raw", "png"):
        raise ValueError(f"unknown output encoding {encode!r}")

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs, ws, hs = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                ids.append(rid)
                ws.append(width)
                hs.append(height)
                if blob is None:
                    blobs.append(None)
                    continue
                try:
                    img = decode_image(bytes(blob), fake=fake)
                except (MediaDecodeError, NotImplementedError):
                    blobs.append(None)  # null-propagate corrupt blobs
                    continue
                out = resample(img, width, height)
                blobs.append(mc.encode_png(out) if encode == "png"
                             else out.tobytes())
            yield pd.DataFrame({id_col: ids, "blob": blobs,
                                "width": ws, "height": hs})

    return df.mapInPandas(
        resize,
        schema=f"{id_col} {id_type}, blob binary, width int, height int")


def image_stats(df: DataFrame, blob_col: str = "blob",
                id_col: str = "id") -> DataFrame:
    """Real image decode -> per-image stats over the RGB-normalized
    pixels: shape, integer sum/min/max. Undecodable or null blobs get
    NULL stats plus a decode_error string instead of failing the batch
    (the reference counts malformed docs rather than aborting ingest,
    doc_processor.rs:153-190)."""

    id_type = df.schema[id_col].dataType.simpleString()

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    rows.append((rid, None, None, None, None, None, None,
                                 "null blob"))
                    continue
                try:
                    img = decode_image(bytes(blob))
                except (MediaDecodeError, NotImplementedError) as e:
                    rows.append((rid, None, None, None, None, None, None,
                                 str(e)))
                    continue
                h, w, ch = img.shape
                px = img.reshape(-1).astype(np.int64)
                rows.append((rid, w, h, ch, int(px.sum()), int(px.min()),
                             int(px.max()), None))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "channels", "px_sum",
                "px_min", "px_max", "decode_error"])

    return df.mapInPandas(
        stats,
        schema=(f"{id_col} {id_type}, width int, height int, "
                "channels int, px_sum long, px_min int, px_max int, "
                "decode_error string"))


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio blob to (samples [n, ch], sample_rate): PCM WAV
    via media_codecs, FLAC (compressed, lossless) via flac_codec."""
    mt = sniff_media_type(blob)
    if mt == "audio/wav":
        return mc.decode_wav(blob)
    if mt == "audio/flac":
        from .flac_codec import decode_flac
        return decode_flac(blob)
    raise MediaDecodeError(f"not decodable audio (sniffed {mt})")


def audio_stats(df: DataFrame, blob_col: str = "blob",
                id_col: str = "id") -> DataFrame:
    """Real audio decode (PCM WAV or FLAC) -> per-clip stats:
    frame/channel counts, sample rate, integer sample sum/min/max
    across all channels. Same null/undecodable -> decode_error contract
    as image_stats."""

    id_type = df.schema[id_col].dataType.simpleString()

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    rows.append((rid, None, None, None, None, None, None,
                                 "null blob"))
                    continue
                try:
                    samples, rate = decode_audio(bytes(blob))
                except MediaDecodeError as e:
                    rows.append((rid, None, None, None, None, None, None,
                                 str(e)))
                    continue
                s = samples.astype(np.int64)
                rows.append((rid, samples.shape[0], samples.shape[1],
                             rate, int(s.sum()),
                             int(s.min()) if s.size else None,
                             int(s.max()) if s.size else None, None))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_frames", "n_channels", "sample_rate",
                "s_sum", "s_min", "s_max", "decode_error"])

    return df.mapInPandas(
        stats,
        schema=(f"{id_col} {id_type}, n_frames int, n_channels int, "
                "sample_rate int, s_sum long, s_min int, s_max int, "
                "decode_error string"))


def y4m_frame_stats(df: DataFrame, blob_col: str = "blob",
                    id_col: str = "id", every_n: int = 1,
                    max_frames: int | None = None) -> DataFrame:
    """Real Y4M frame sampling: one output row per sampled luma plane
    (explode), with integer luma sum/min/max per frame. Undecodable
    blobs yield zero rows (sampling is a filter stage; metadata-level
    errors surface through extract_metadata/image_stats instead).
    Delegates to video_frame_stats restricted to Y4M — one
    implementation of the per-blob buffering contract, not two."""
    return video_frame_stats(df, blob_col, id_col, every_n, max_frames,
                             _formats=("video/x-yuv4mpeg",))


def video_frame_stats(df: DataFrame, blob_col: str = "blob",
                      id_col: str = "id", every_n: int = 1,
                      max_frames: int | None = None,
                      _formats: tuple = ("video/x-yuv4mpeg",
                                         "video/avi")) -> DataFrame:
    """Real video frame sampling across container formats: Y4M streams
    yield their luma planes directly; AVI/MJPG containers decode every
    sampled frame through the T.81 JPEG codec (grayscale frames ARE
    luma; RGB frames are reduced with the BT.601 weights the encoder
    uses). One output row per sampled frame with integer luma
    sum/min/max; undecodable or non-video blobs yield zero rows (same
    filter-stage contract as y4m_frame_stats)."""

    id_type = df.schema[id_col].dataType.simpleString()

    def _luma_frames(blob: bytes):
        mt = sniff_media_type(blob)
        if mt not in _formats:
            raise MediaDecodeError(
                f"not a decodable video here (sniffed {mt})")
        if mt == "video/x-yuv4mpeg":
            yield from mc.decode_y4m(blob, every_n, max_frames)
        elif mt == "video/avi":
            from .avi_codec import decode_avi_mjpeg
            for fi, img in decode_avi_mjpeg(blob, every_n, max_frames):
                if img.ndim == 3:
                    img = np.clip(np.round(
                        img[..., 0] * 0.299 + img[..., 1] * 0.587
                        + img[..., 2] * 0.114), 0, 255).astype(np.uint8)
                yield fi, img
        else:
            raise MediaDecodeError(f"not a decodable video (sniffed {mt})")

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                # buffer per blob (same contract as y4m_frame_stats):
                # a mid-stream corruption must yield ZERO rows for the
                # blob, not a valid-looking prefix
                blob_rows = []
                try:
                    for fi, y in _luma_frames(bytes(blob)):
                        p = y.astype(np.int64)
                        blob_rows.append(
                            (rid, fi, y.shape[1], y.shape[0],
                             int(p.sum()), int(p.min()), int(p.max())))
                except MediaDecodeError:
                    continue
                rows.extend(blob_rows)
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_idx", "width", "height", "y_sum",
                "y_min", "y_max"])

    return df.mapInPandas(
        frames,
        schema=(f"{id_col} {id_type}, frame_idx int, width int, "
                "height int, y_sum long, y_min int, y_max int"))


def frame_sample(df: DataFrame, blob_col: str = "blob", id_col: str = "id",
                 every_n: int = 2) -> DataFrame:
    """Frame sampling for dedup: one row per sampled frame with a
    16-hex frame hash. AVI blobs get the REAL path — every n-th
    compressed video chunk is hashed straight out of the container walk
    (length-prefixed arithmetic, no entropy decode: at scale this is
    what makes video dedup cheap). Other blobs keep the deterministic
    16-byte-window stub so plumbing tests on opaque bytes still hold."""

    id_type = df.schema[id_col].dataType.simpleString()

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi_codec import avi_frame_chunks
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue  # null blob: no frames, like an empty one
                b = bytes(blob)
                if sniff_media_type(b) == "video/avi":
                    blob_rows = []
                    try:
                        for fi, payload in avi_frame_chunks(b, every_n):
                            blob_rows.append(
                                (fi, hashlib.sha256(payload)
                                 .hexdigest()[:16]))
                    except MediaDecodeError:
                        continue  # corrupt container: zero rows
                    for fi, hx in blob_rows:
                        ids.append(rid)
                        idxs.append(fi)
                        hashes.append(hx)
                    continue
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
