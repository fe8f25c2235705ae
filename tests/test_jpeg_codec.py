"""Baseline JPEG codec: round-trip error bounds through our encoder,
plus a hand-assembled byte fixture using the spec's Annex K DC Huffman
table (multi-length canonical codes) so the decoder is pinned against
the public wire format independently of our own encoder's tables."""

import struct

import numpy as np
import pytest

from quickwit_spark.pipeline.jpeg_codec import decode_jpeg, encode_jpeg
from quickwit_spark.pipeline.media_codecs import MediaDecodeError


def _grad(h, w):
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([np.clip(y * 4, 0, 255), np.clip(x * 3, 0, 255),
                     np.clip(255 - (y + x) * 2, 0, 255)],
                    axis=2).astype(np.uint8)


def test_flat_color_roundtrip_exact():
    flat = np.full((16, 16, 3), 130, dtype=np.uint8)
    for ss in ("444", "420"):
        out = decode_jpeg(encode_jpeg(flat, quality=90, subsampling=ss))
        assert out.shape == (16, 16, 3)
        assert int(np.abs(out.astype(int) - 130).max()) == 0


def test_gradient_roundtrip_bounds():
    img = _grad(40, 56)
    for ss, q, bound in (("444", 95, 4), ("444", 75, 8),
                         ("420", 95, 10), ("420", 75, 14)):
        out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=ss))
        err = np.abs(out.astype(int) - img.astype(int))
        assert out.shape == img.shape
        assert int(err.max()) <= bound, (ss, q, int(err.max()))
        assert float(err.mean()) < 3.0


def test_grayscale_and_odd_dims():
    y, x = np.meshgrid(np.arange(37), np.arange(29), indexing="ij")
    g = np.clip(y * 5 + x * 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (37, 29)
    assert int(np.abs(out.astype(int) - g.astype(int)).max()) <= 2
    # odd dims survive 4:2:0 padding/crop too
    img = _grad(17, 13)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert out.shape == (17, 13, 3)


def test_restart_markers_roundtrip():
    img = _grad(40, 56)
    blob = encode_jpeg(img, quality=90, subsampling="420",
                       restart_interval=2)
    assert b"\xff\xd0" in blob  # RST0 actually emitted
    out = decode_jpeg(blob)
    err = np.abs(out.astype(int) - img.astype(int))
    assert int(err.max()) <= 10
    # and restart output equals the no-restart decode exactly (the
    # entropy stream differs only in segmentation + DC reset points)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert (out == base).all()


def _annex_k_dc_fixture() -> bytes:
    """8x8 grayscale, one DC-only block (diff=5, quant step 16) encoded
    with the PUBLIC Annex K DC-luminance Huffman table: size symbol 3 is
    the 3-bit code '100', magnitude bits '101', then EOB '0' from a
    1-symbol AC table. Expected reconstruction: 5*16/8 + 128 = 138."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker])
                   + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
    ac_bits = [1] + [0] * 15
    seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out.append(0b10010101)  # '100' '101' '0' + pad '1'
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_decode_annex_k_table_fixture():
    img = decode_jpeg(_annex_k_dc_fixture())
    assert img.shape == (8, 8)
    assert (img == 138).all()


def test_rejections_are_loud():
    img = _grad(16, 16)
    blob = encode_jpeg(img, quality=85)
    with pytest.raises(MediaDecodeError, match="SOI"):
        decode_jpeg(b"\x00" + blob)
    with pytest.raises(MediaDecodeError):
        decode_jpeg(blob[:40])
    # progressive: flip SOF0 -> SOF2
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(MediaDecodeError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(img, subsampling="422")


def test_corruption_fuzz_never_hangs_or_leaks():
    """Flipping any single byte of a valid JPEG either still decodes or
    raises MediaDecodeError — never an unguarded exception type."""
    img = _grad(16, 24)
    blob = bytearray(encode_jpeg(img, quality=85))
    rng = np.random.default_rng(11)
    for _ in range(120):
        i = int(rng.integers(2, len(blob) - 2))
        old = blob[i]
        blob[i] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg(bytes(blob))
            assert out.dtype == np.uint8
        except MediaDecodeError:
            pass
        finally:
            blob[i] = old


def test_encode_matrix_shapes():
    # every sampling x parity combination keeps dimensions
    for h in (8, 9, 16, 23):
        for w in (8, 11, 16):
            img = _grad(h, w)
            for ss in ("444", "420"):
                out = decode_jpeg(encode_jpeg(img, quality=90,
                                              subsampling=ss))
                assert out.shape == (h, w, 3), (h, w, ss)


def _patch_sof_hv(blob: bytes, hv: int) -> bytes:
    at = blob.index(b"\xff\xc0")
    b = bytearray(blob)
    b[at + 11] = hv  # first component's sampling byte
    return bytes(b)


def test_zero_sampling_factor_is_loud():
    g = np.full((16, 16), 80, dtype=np.uint8)
    blob = encode_jpeg(g, quality=90)
    for hv in (0x10, 0x01, 0x00):
        with pytest.raises(MediaDecodeError, match="sampling factor"):
            decode_jpeg(_patch_sof_hv(blob, hv))


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2.3: a one-component scan ignores its sampling factors —
    a grayscale JPEG whose component declares h=v=2 must decode
    identically to the h=v=1 encoding of the same entropy data (the
    old interleaved path silently permuted the blocks)."""
    y, x = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    g = np.clip(y * 6 + x, 0, 255).astype(np.uint8)
    blob = encode_jpeg(g, quality=90)
    base = decode_jpeg(blob)
    patched = decode_jpeg(_patch_sof_hv(blob, 0x22))
    assert (patched == base).all()


def test_fill_bytes_before_markers():
    """0xFF fill bytes before a marker (B.1.1.2) are legal padding."""
    img = _grad(24, 24)
    blob = encode_jpeg(img, quality=90, subsampling="420",
                       restart_interval=2)
    base = decode_jpeg(blob)
    # pad before SOS and before every RST marker
    padded = blob.replace(b"\xff\xda", b"\xff\xff\xff\xda", 1)
    for rst in range(2):
        padded = padded.replace(bytes([0xFF, 0xD0 + rst]),
                                bytes([0xFF, 0xFF, 0xD0 + rst]), 1)
    assert (decode_jpeg(padded) == base).all()


def test_entropy_segment_size_bound():
    from quickwit_spark.pipeline.jpeg_codec import _BitReader
    with pytest.raises(MediaDecodeError, match="exceeds"):
        _BitReader(b"\x00" * (_BitReader.MAX_SEGMENT_BYTES + 1))
