"""RIFF/AVI container codec with Motion-JPEG frames — dependency-free.

Implements the container from the public Microsoft "AVI RIFF File
Reference" (RIFF 'AVI ' -> LIST hdrl(avih, LIST strl(strh, strf)) ->
LIST movi('NNdc'/'NNdb' chunks, optionally grouped in LIST 'rec ') ->
idx1), with each video payload a baseline JPEG decoded by
jpeg_codec (ITU-T T.81).  Only the MJPG fourcc is supported; H.26x and
other inter-frame-predicted codecs are refused loudly (they need a
motion-compensation stack we don't ship).

Scale story: the movi walk is pure length-prefixed chunk arithmetic, so
frame SAMPLING (``every_n``) and compressed-frame hashing
(:func:`avi_frame_chunks`) never entropy-decode skipped frames — at
100 TB the dominant cost of video dedup/sampling is the JPEG decode,
and this layout skips it entirely for unsampled frames.

Reference parity: the reference treats media blobs as opaque bytes;
this module belongs to the LLM-pipeline multimodal surface (SURVEY §2
LLM ops), not to a reference subsystem.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import MediaDecodeError, _check_dims
from .jpeg_codec import decode_jpeg, encode_jpeg, standard_dht_segment

# fourccs we can actually decode (matched case-insensitively — muxers
# vary the casing; compare against .upper())
_MJPG_FOURCCS = {b"MJPG", b"DMB1", b"AVRN"}


def _u32(data: bytes, off: int, what: str) -> int:
    if off + 4 > len(data):
        raise MediaDecodeError(f"AVI: truncated {what} at {off}")
    return struct.unpack_from("<I", data, off)[0]


def _iter_chunks(data: bytes, start: int, end: int, what: str):
    """Yield (fourcc, payload_off, payload_size) for RIFF subchunks in
    data[start:end); chunks are word-aligned (pad byte after odd sizes)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = _u32(data, pos + 4, f"{what} chunk size")
        body = pos + 8
        if body + size > end:
            raise MediaDecodeError(
                f"AVI: {what} chunk {fourcc!r} at {pos} overruns "
                f"container ({size} bytes past {end})")
        yield fourcc, body, size
        pos = body + size + (size & 1)


class _AviInfo:
    __slots__ = ("width", "height", "fourcc", "frame_spans")

    def __init__(self, width, height, fourcc, frame_spans):
        self.width = width
        self.height = height
        self.fourcc = fourcc
        # (offset, size) of each video-stream data chunk, file order
        self.frame_spans = frame_spans


def _parse_avi(data: bytes) -> _AviInfo:
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaDecodeError("not an AVI: missing RIFF/'AVI ' header")
    riff_size = _u32(data, 4, "RIFF size")
    end = min(len(data), 8 + riff_size)

    width = height = 0
    fourcc = None
    vid_stream = None   # stream number of the first 'vids' stream
    stream_no = 0
    frame_spans: list[tuple[int, int]] = []

    def walk_movi(start: int, stop: int) -> None:
        # iterative: a crafted AVI can nest LIST 'rec ' thousands deep,
        # and recursion would escape as RecursionError (not
        # MediaDecodeError) and kill the whole Spark task
        spans = [(start, stop)]
        while spans:
            lo, hi = spans.pop()
            for tag, off, size in _iter_chunks(data, lo, hi, "movi"):
                if tag == b"LIST" and data[off:off + 4] == b"rec ":
                    spans.append((off + 4, off + size))
                elif (len(tag) == 4 and tag[:2] == vid_tag
                      and tag[2:] in (b"dc", b"db")):
                    frame_spans.append((off, size))
        frame_spans.sort()  # file order regardless of nesting order

    for tag, off, size in _iter_chunks(data, 12, end, "top-level"):
        if tag != b"LIST":
            continue  # idx1 / JUNK: the movi walk is authoritative
        ltype = data[off:off + 4]
        if ltype == b"hdrl":
            for t2, o2, s2 in _iter_chunks(data, off + 4, off + size,
                                           "hdrl"):
                if t2 == b"avih" and s2 >= 40:
                    width = _u32(data, o2 + 32, "avih width")
                    height = _u32(data, o2 + 36, "avih height")
                elif t2 == b"LIST" and data[o2:o2 + 4] == b"strl":
                    is_vids = False
                    for t3, o3, s3 in _iter_chunks(
                            data, o2 + 4, o2 + s2, "strl"):
                        if t3 == b"strh" and s3 >= 8:
                            is_vids = data[o3:o3 + 4] == b"vids"
                            if is_vids and vid_stream is None:
                                vid_stream = stream_no
                                fourcc = data[o3 + 4:o3 + 8]
                        elif (t3 == b"strf" and s3 >= 20 and is_vids
                              and vid_stream == stream_no):
                            # BITMAPINFOHEADER: biWidth/biHeight/
                            # biCompression override avih (the
                            # authoritative stream format). Both are
                            # signed LONGs; a negative biHeight is a
                            # legal top-down DIB, not a huge unsigned
                            bw, bh = struct.unpack_from("<ii", data,
                                                        o3 + 4)
                            if bw and bh:
                                width, height = abs(bw), abs(bh)
                            comp = data[o3 + 16:o3 + 20]
                            if comp.strip(b"\x00"):
                                fourcc = comp
                    stream_no += 1
        elif ltype == b"movi":
            if vid_stream is None:
                raise MediaDecodeError("AVI: movi before any vids stream")
            vid_tag = b"%02d" % vid_stream
            walk_movi(off + 4, off + size)

    if vid_stream is None or fourcc is None:
        raise MediaDecodeError("AVI: no video ('vids') stream")
    _check_dims(width, height, "AVI")
    return _AviInfo(width, height, fourcc, frame_spans)


def avi_frame_chunks(data: bytes, every_n: int = 1,
                     max_frames: int | None = None):
    """Yield (frame_idx, compressed_payload bytes) for every
    ``every_n``-th video frame WITHOUT decoding — the cheap path for
    compressed-frame hashing / dedup / sampling."""
    info = _parse_avi(data)
    emitted = 0
    for idx, (off, size) in enumerate(info.frame_spans):
        if idx % every_n:
            continue
        yield idx, bytes(data[off:off + size])
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


def _ensure_dht(frame: bytes) -> bytes:
    """MJPEG-in-AVI convention: frames commonly OMIT the DHT segment
    and decoders must substitute the T.81 K.3 typical tables. Splice
    them in before SOS when no DHT is present; frames carrying their
    own tables pass through untouched."""
    if len(frame) < 4 or frame[:2] != b"\xff\xd8":
        return frame  # not a JPEG: let decode_jpeg raise its own error
    pos = 2
    while pos + 4 <= len(frame):
        if frame[pos] != 0xFF:
            return frame  # malformed: decode_jpeg will complain
        marker = frame[pos + 1]
        if marker == 0xC4:
            return frame  # has its own tables
        if marker == 0xDA:  # SOS reached with no DHT seen
            return frame[:pos] + standard_dht_segment() + frame[pos:]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers have no length field
            continue
        pos += 2 + struct.unpack_from(">H", frame, pos + 2)[0]
    return frame


def decode_avi_mjpeg(data: bytes, every_n: int = 1,
                     max_frames: int | None = None):
    """Parse an AVI container and decode every ``every_n``-th MJPG
    frame; yields (frame_idx, uint8 HxW or HxWx3).  Skipped frames are
    never entropy-decoded.  Non-MJPG video streams raise
    MediaDecodeError naming the codec."""
    data = bytes(data)
    info = _parse_avi(data)
    if info.fourcc.upper() not in _MJPG_FOURCCS:
        raise MediaDecodeError(
            f"AVI: codec {info.fourcc!r} unsupported (only MJPG; "
            "inter-frame codecs like H.26x need a motion-compensation "
            "stack we don't ship)")
    emitted = 0
    for idx, (off, size) in enumerate(info.frame_spans):
        if idx % every_n:
            continue
        img = decode_jpeg(_ensure_dht(data[off:off + size]))
        h, w = img.shape[:2]
        if (w, h) != (info.width, info.height):
            raise MediaDecodeError(
                f"AVI: frame {idx} is {w}x{h}, container declares "
                f"{info.width}x{info.height}")
        yield idx, img
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (tag + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(frames, fps: int = 25, quality: int = 90,
                     subsampling: str = "444",
                     omit_dht: bool = False) -> bytes:
    """Encode an iterable of uint8 HxW / HxWx3 frames (all one shape)
    as an AVI with one MJPG video stream and an idx1 index.

    omit_dht=True emits the classic MJPEG-in-AVI shape: frames encoded
    with the T.81 K.3 standard tables and their DHT segments stripped
    (decoders substitute the defaults — see _ensure_dht)."""
    payloads = []
    shape = None
    for f in frames:
        a = np.asarray(f)
        if shape is None:
            shape = a.shape
        elif a.shape != shape:
            raise ValueError(
                f"frame shape {a.shape} != first frame {shape}")
        if omit_dht:
            p = encode_jpeg(a, quality=quality, subsampling=subsampling,
                            huffman="standard")
            p = p.replace(standard_dht_segment(), b"", 1)
        else:
            p = encode_jpeg(a, quality=quality, subsampling=subsampling)
        payloads.append(p)
    if shape is None:
        raise ValueError("no frames")
    h, w = shape[:2]
    n = len(payloads)
    maxbuf = max(len(p) for p in payloads)

    # rcFrame is a RECT of SIGNED 16-bit shorts; for dims past 32767
    # write zeros (a common muxer convention — players take the size
    # from strf's BITMAPINFOHEADER, as does our parser)
    rc_w, rc_h = (w, h) if w <= 0x7FFF and h <= 0x7FFF else (0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                 # dwScale / dwRate
        0, n,                   # dwStart / dwLength (frames)
        maxbuf, -1,             # dwSuggestedBufferSize, dwQuality
        0,                      # dwSampleSize
        0, 0, rc_w, rc_h)       # rcFrame
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), 0, 0,
        0x10,                   # AVIF_HASINDEX
        n, 0, 1, maxbuf, w, h, 0, 0, 0, 0)

    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = bytearray()
    idx1 = bytearray()
    for p in payloads:
        # idx1 offsets count from the 'movi' fourcc (offset 4 = first
        # chunk), the convention players expect
        idx1 += struct.pack("<4sIII", b"00dc", 0x10,
                            4 + len(movi_body), len(p))
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", bytes(movi_body))

    body = hdrl + movi + _chunk(b"idx1", bytes(idx1))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
