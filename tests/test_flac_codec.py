"""FLAC codec: lossless round-trips through every predictor and stereo
mode, a hand-built byte fixture assembled from the spec independently
of our BitWriter (with its own longhand CRC implementations), CRC
tamper detection, and hostile-input fuzzing."""

import struct

import numpy as np
import pytest

from quickwit_spark.pipeline.flac_codec import decode_flac, encode_flac
from quickwit_spark.pipeline.media_codecs import MediaDecodeError


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return (np.cumsum(rng.integers(-60, 61, n)) % 30000 - 15000) \
        .astype(np.int32)


def test_mono_roundtrip_compresses():
    x = _signal(10000)
    blob = encode_flac(x, 44100)
    y, rate = decode_flac(blob)
    assert rate == 44100 and y.shape == (10000, 1)
    assert (y[:, 0] == x).all()
    assert len(blob) < 2 * len(x) * 0.9  # really compressed vs 16-bit PCM


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_stereo_modes_lossless(mode):
    x = _signal(5000, seed=3)
    st = np.stack([x, (x * 0.63).astype(np.int32) + 11], axis=1)
    y, rate = decode_flac(encode_flac(st, 48000, stereo=mode))
    assert (y == st).all()


def test_constant_verbatim_and_odd_tail():
    c = np.full(777, -129, np.int32)
    y, _ = decode_flac(encode_flac(c, 8000, block_size=256))
    assert (y[:, 0] == c).all()
    rng = np.random.default_rng(9)
    v = rng.integers(-32768, 32768, 1000).astype(np.int32)  # incompressible
    y, _ = decode_flac(encode_flac(v, 8000))
    assert (y[:, 0] == v).all()


def test_extreme_values_and_bit_depths():
    for bps in (8, 12, 16, 20, 24):
        lim = 1 << (bps - 1)
        x = np.array([lim - 1, -lim, 0, -1, 1, lim - 1, -lim] * 50,
                     np.int64)
        y, _ = decode_flac(encode_flac(x, 16000, bps=bps))
        assert (y[:, 0] == x).all(), bps


def test_eight_channels_and_many_frames():
    x = np.stack([_signal(700, seed=s) // (s + 1) for s in range(8)],
                 axis=1)
    y, _ = decode_flac(encode_flac(x, 32000, block_size=192))
    assert (y == x).all()
    # >127 frames exercises the multi-byte coded frame number
    long = _signal(300 * 160)
    y, _ = decode_flac(encode_flac(long, 8000, block_size=300))
    assert (y[:, 0] == long).all()


def _crc8_longhand(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_longhand(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def test_hand_built_fixture_decodes():
    """A minimal stream assembled byte-by-byte from the spec (mono,
    8-bit, 8 kHz, 4 samples, one verbatim subframe) — independent of
    encode_flac's layout choices."""
    streaminfo = (struct.pack(">HH", 4, 4) + b"\x00" * 6
                  # rate 8000 = 0x1F40 in 20 bits; ch-1=0; bps-1=7
                  + bytes([0x01, 0xF4, 0x00, 0x70])
                  + struct.pack(">I", 4) + b"\x00" * 16)
    head = b"fLaC" + struct.pack(">I", (1 << 31) | 34) + streaminfo
    # frame header: sync/0/0, bs code 6 (8-bit at end), rate from
    # STREAMINFO, 1 channel, 8-bit (code 001), frame 0, bs-1 = 3
    hdr = bytes([0xFF, 0xF8, 0x60, 0x02, 0x00, 0x03])
    hdr += bytes([_crc8_longhand(hdr)])
    # subframe: pad 0, type 000001 (verbatim), no wasted = 0x02,
    # then samples 10, -3, 127, -128 as signed 8-bit
    body = hdr + bytes([0x02, 10, 0xFD, 0x7F, 0x80])
    frame = body + struct.pack(">H", _crc16_longhand(body))
    y, rate = decode_flac(head + frame)
    assert rate == 8000
    assert y[:, 0].tolist() == [10, -3, 127, -128]


def test_crc_tampering_detected():
    x = _signal(2000)
    blob = bytearray(encode_flac(x, 44100))
    # flip one bit in the audio payload (past metadata = 4+4+34)
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(MediaDecodeError):
        decode_flac(bytes(blob))


def test_rejections():
    with pytest.raises(MediaDecodeError, match="magic"):
        decode_flac(b"OggS" + b"\x00" * 40)
    with pytest.raises(MediaDecodeError):
        decode_flac(b"fLaC")  # truncated metadata
    x = _signal(500)
    blob = encode_flac(x, 44100)
    with pytest.raises(MediaDecodeError):
        decode_flac(blob[:len(blob) - 7])  # truncated last frame
    with pytest.raises(ValueError):
        encode_flac(np.array([40000], np.int64), 8000, bps=16)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((5, 3), np.int32), 8000, stereo="mid_side")


def test_corruption_fuzz_never_crashes():
    rng = np.random.default_rng(31)
    blob = bytearray(encode_flac(_signal(3000, seed=2), 22050,
                                 block_size=512))
    ok = bad = 0
    for _ in range(300):
        mut = bytearray(blob)
        for _ in range(rng.integers(1, 4)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            y, r = decode_flac(bytes(mut))
            assert y.dtype == np.int32 and r > 0
            ok += 1
        except MediaDecodeError:
            bad += 1
    assert ok + bad == 300 and bad > 200  # CRCs catch nearly everything
