"""Baseline JPEG (ITU-T T.81) codec with no dependencies beyond numpy.

Decoder: baseline sequential DCT, 8-bit, single interleaved scan —
grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, arbitrary
DHT/DQT tables from the stream, restart markers. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise MediaDecodeError loudly.

Encoder: baseline 4:4:4 or 4:2:0, IJG-style quality scaling of the
Annex K quantization tables, and self-built canonical Huffman tables
(every symbol that occurs gets an equal-length code with the all-ones
codeword left unused, as the spec requires) — valid JPEG without
transcribing the Annex K Huffman tables. Entropy coding is per-blob
Python by design: these codecs run one call per media object inside
mapInPandas Arrow batches (multimodal.py), with all block math
(DCT/quant/color) vectorized numpy.

Used by quickwit_spark.pipeline.multimodal.decode_image; tests
round-trip through both directions and pin decode against byte
fixtures, error bounds, and the closed-form DC path.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import MediaDecodeError, _check_dims

__all__ = ["decode_jpeg", "encode_jpeg"]

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------


def _zigzag_pairs() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        out.extend(diag)
    return out


_ZZ = np.array([r * 8 + c for r, c in _zigzag_pairs()], dtype=np.int64)
_INV_ZZ = np.argsort(_ZZ)

# DCT-II orthonormal basis: F = C @ f @ C.T, f = C.T @ F @ C
_C = np.array([[np.sqrt((1 if u == 0 else 2) / 8)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])

# Annex K quantization tables (public spec), natural order
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.float64).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99], dtype=np.float64).reshape(8, 8)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QL, _QC):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _size_cat(v: np.ndarray) -> np.ndarray:
    """Bit-size category: 0 for 0, else floor(log2(|v|)) + 1."""
    a = np.abs(v)
    out = np.zeros_like(a)
    nz = a > 0
    out[nz] = np.floor(np.log2(a[nz])).astype(out.dtype) + 1
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode via a full 16-bit lookahead LUT: every
    16-bit window starting with a codeword maps to (symbol, length), so
    decoding is one array lookup per symbol instead of a per-bit loop
    (codes are at most 16 bits by spec)."""

    def __init__(self, bits: list[int], vals: bytes):
        if sum(bits) != len(vals):
            raise MediaDecodeError("JPEG: DHT count/value mismatch")
        self.lut_len = np.zeros(65536, dtype=np.uint8)
        self.lut_sym = np.zeros(65536, dtype=np.uint8)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                if code >= (1 << ln):
                    raise MediaDecodeError("JPEG: over-subscribed DHT")
                lo = code << (16 - ln)
                hi = lo + (1 << (16 - ln))
                self.lut_len[lo:hi] = ln
                self.lut_sym[lo:hi] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over one unstuffed entropy-coded segment.
    Precomputes the 16-bit window at every bit offset (16 vectorized
    shift-ORs), so both Huffman symbol decode and magnitude-bit reads
    are O(1) integer ops."""

    # the window precompute costs ~18 bytes of transient RAM per input
    # byte; bound it so a hostile blob turns into a loud error instead
    # of a silent executor OOM (a 64 MPx photo's entropy stream is
    # typically well under this)
    MAX_SEGMENT_BYTES = 32 * 1024 * 1024

    def __init__(self, data: bytes):
        if len(data) > self.MAX_SEGMENT_BYTES:
            raise MediaDecodeError(
                f"JPEG: entropy segment {len(data)} bytes exceeds "
                f"{self.MAX_SEGMENT_BYTES}")
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.n = bits.size
        b = np.concatenate([bits, np.zeros(16, np.uint8)]) \
            .astype(np.uint16)
        del bits
        w = np.zeros(self.n, dtype=np.uint16)
        for k in range(16):
            w |= b[k:k + self.n] << (15 - k)
        self.w16 = w
        self.pos = 0

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:
            # n comes from entropy-coded size symbols; valid baseline
            # magnitudes are <= 11 bits (corrupt DHT otherwise)
            raise MediaDecodeError("JPEG: magnitude size too large")
        if self.pos + n > self.n:
            raise MediaDecodeError("JPEG: entropy data truncated")
        v = int(self.w16[self.pos]) >> (16 - n)
        self.pos += n
        return v

    def decode_symbol(self, t: _HuffTable) -> int:
        if self.pos >= self.n:
            raise MediaDecodeError("JPEG: entropy data truncated")
        win = int(self.w16[self.pos])
        ln = int(t.lut_len[win])
        if ln == 0:
            raise MediaDecodeError("JPEG: invalid Huffman code")
        if self.pos + ln > self.n:
            raise MediaDecodeError("JPEG: entropy data truncated")
        self.pos += ln
        return int(t.lut_sym[win])


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1 EXTEND: map `size` raw bits to a signed coefficient
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_ecs(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded data at RST markers, unstuffing
    0xFF00. Returns (segments, position of the terminating marker).
    Bulk-copies the spans between 0xFF bytes (entropy data is mostly
    marker-free, so this is a memcpy, not a per-byte loop)."""
    segs = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        nxt = data.find(b"\xff", pos)
        if nxt < 0:
            cur += data[pos:]
            pos = n
            break
        cur += data[pos:nxt]
        if nxt + 1 >= n:
            raise MediaDecodeError("JPEG: truncated entropy stream")
        m = data[nxt + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos = nxt + 2
        elif m == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos = nxt + 1
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos = nxt + 2
        else:
            pos = nxt
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 HxW (grayscale) or HxWx3 (RGB)."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise MediaDecodeError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOS
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise MediaDecodeError("JPEG: truncated segment")
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise MediaDecodeError("JPEG: 16-bit DQT unsupported")
                tbl = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                if tbl.size != 64:
                    raise MediaDecodeError("JPEG: short DQT")
                q = np.zeros(64)
                q[_ZZ] = tbl  # stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                cnt = sum(bits)
                vals = body[i + 17:i + 17 + cnt]
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            if len(body) < 6:
                raise MediaDecodeError("JPEG: short SOF")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise MediaDecodeError(f"JPEG: {prec}-bit unsupported")
            if len(body) < 6 + 3 * nc:
                raise MediaDecodeError("JPEG: short SOF component list")
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq_id})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                "JPEG: only baseline sequential (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise MediaDecodeError("JPEG: short DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaDecodeError("JPEG: SOS before SOF")
            if not body or len(body) < 1 + 2 * body[0] + 3:
                raise MediaDecodeError("JPEG: short SOS")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c:3 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise MediaDecodeError("JPEG: SOS references unknown "
                                           "component")
                scan.append((comp, tdta >> 4, tdta & 0xF))
            if len(scan) != len(frame["comps"]):
                raise MediaDecodeError(
                    "JPEG: non-interleaved scans unsupported")
            return _decode_scan(data, pos, frame, scan, qt, huff,
                                restart_interval)
        # APPn / COM / others: skipped
    raise MediaDecodeError("JPEG: no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    _check_dims(w, h, "JPEG")
    for c, _, _ in scan:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise MediaDecodeError(
                f"JPEG: sampling factor {c['h']}x{c['v']} unsupported")
    if len(scan) == 1:
        # T.81 A.2.3: a single-component scan is NON-interleaved — one
        # 8x8 block per MCU in raster order of the component's own
        # block grid, regardless of its declared sampling factors
        # (which only matter relative to other components)
        scan[0][0]["h"] = scan[0][0]["v"] = 1
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    segs, _end = _split_ecs(data, pos)

    # zigzag coefficient store per component (block grid row-major);
    # the entropy loop is the only serial part — dequant/IDCT/scatter
    # run vectorized over all blocks afterwards
    grid = [(mcy * c["v"], mcx * c["h"]) for c, _, _ in scan]
    coefs = [np.zeros((gh * gw, 64), dtype=np.float64)
             for gh, gw in grid]
    per_mcu = [(i, by, bx) for i, (c, _, _) in enumerate(scan)
               for by in range(c["v"]) for bx in range(c["h"])]
    tables = []
    for comp, td, ta in scan:
        dc_t = huff.get((0, td))
        ac_t = huff.get((1, ta))
        if dc_t is None or ac_t is None:
            raise MediaDecodeError("JPEG: missing Huffman table")
        if comp["tq"] not in qt:
            raise MediaDecodeError("JPEG: missing DQT")
        tables.append((dc_t.lut_len, dc_t.lut_sym,
                       ac_t.lut_len, ac_t.lut_sym))

    # hot loop: ~100k symbol decodes per megapixel, so the Huffman
    # lookup + magnitude read are INLINED against local aliases (the
    # method-call version measured 2x slower end-to-end)
    total_mcus = mcx * mcy
    mcu_idx = 0
    truncated = MediaDecodeError("JPEG: entropy data truncated")
    for seg_i, seg in enumerate(segs):
        rd = _BitReader(seg)
        w16, nb = rd.w16, rd.n
        pos = 0
        pred = [0] * len(scan)
        seg_mcus = (restart_interval if restart_interval
                    and seg_i < len(segs) - 1
                    else total_mcus - mcu_idx)
        for _ in range(seg_mcus):
            if mcu_idx >= total_mcus:
                raise MediaDecodeError("JPEG: more MCUs than expected")
            my, mx = divmod(mcu_idx, mcx)
            for ci, by, bx in per_mcu:
                dc_len, dc_sym, ac_len, ac_sym = tables[ci]
                comp = scan[ci][0]
                bi = ((my * comp["v"] + by) * grid[ci][1]
                      + mx * comp["h"] + bx)
                row = coefs[ci][bi]
                if pos >= nb:
                    raise truncated
                win = int(w16[pos])
                ln = dc_len[win]
                if ln == 0:
                    raise MediaDecodeError("JPEG: invalid Huffman code")
                pos += ln
                s = int(dc_sym[win])
                if s:
                    if s > 16 or pos + s > nb:
                        raise truncated
                    v = int(w16[pos]) >> (16 - s)
                    pos += s
                    pred[ci] += (v if v >= (1 << (s - 1))
                                 else v - (1 << s) + 1)
                row[0] = pred[ci]
                k = 1
                while k < 64:
                    if pos >= nb:
                        raise truncated
                    win = int(w16[pos])
                    ln = ac_len[win]
                    if ln == 0:
                        raise MediaDecodeError(
                            "JPEG: invalid Huffman code")
                    pos += ln
                    rs = int(ac_sym[win])
                    s = rs & 0xF
                    if s == 0:
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise MediaDecodeError("JPEG: AC index overflow")
                    if pos + s > nb:
                        raise truncated
                    v = int(w16[pos]) >> (16 - s)
                    pos += s
                    row[k] = (v if v >= (1 << (s - 1))
                              else v - (1 << s) + 1)
                    k += 1
            mcu_idx += 1
        if pos > nb:
            raise truncated
    if mcu_idx != total_mcus:
        raise MediaDecodeError(
            f"JPEG: decoded {mcu_idx}/{total_mcus} MCUs")

    # vectorized dequant + IDCT + block scatter per component
    planes = []
    for ci, (c, _, _) in enumerate(scan):
        gh, gw = grid[ci]
        nat = coefs[ci][:, _INV_ZZ] * qt[c["tq"]].reshape(-1)
        f = np.einsum("ux,nuv,vy->nxy", _C, nat.reshape(-1, 8, 8), _C)
        planes.append(f.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3)
                      .reshape(gh * 8, gw * 8) + 128.0)

    # upsample to full resolution and crop
    full = []
    for (c, _, _), p in zip(scan, planes):
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise MediaDecodeError(f"JPEG: {len(full)}-component color "
                               "unsupported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], bytes,
                                                    dict[int, tuple]]:
    """Canonical table giving every occurring symbol the same code
    length L with 2^L > n (strict, so the all-ones code stays unused,
    per the spec's convention)."""
    vals = sorted(symbols) or [0]
    ln = max(1, (len(vals)).bit_length())
    if (1 << ln) <= len(vals):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(vals)
    codes = {v: (i, ln) for i, v in enumerate(vals)}
    return bits, bytes(vals), codes


# ---------------------------------------------------------------------------
# ITU-T T.81 Annex K.3 "typical" Huffman tables. These are the tables
# the MJPEG-in-AVI convention assumes when frames omit DHT segments
# (decoders must substitute them), and what `huffman="standard"`
# encodes with. (bits[l-1] = #codes of length l, vals in code order.)
# ---------------------------------------------------------------------------

_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                bytes(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  bytes(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA]))
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA]))


def _codes_from_spec(bits: list[int], vals: bytes) -> dict[int, tuple]:
    """Canonical Huffman code assignment (T.81 Annex C) for a
    (bits, vals) table spec -> {symbol: (code, length)}."""
    codes: dict[int, tuple] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def standard_dht_segment() -> bytes:
    """The full DHT marker segment carrying all four K.3 tables
    (dc0/ac0 luma, dc1/ac1 chroma) — what a decoder splices into an
    MJPEG frame that omits DHT per the MJPEG-in-AVI convention."""
    body = b""
    for tid, (bits, vals) in ((0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA),
                              (0x01, _STD_DC_CHROMA),
                              (0x11, _STD_AC_CHROMA)):
        body += bytes([tid]) + bytes(bits) + vals
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) -> (n_blocks, 8, 8), row-major block order."""
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _quantize(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """DCT + quantize every 8x8 block; returns (n_blocks, 64) int32 in
    zigzag order."""
    f = _blocks(plane.astype(np.float64) - 128.0)
    coefs = np.einsum("ux,nxy,vy->nuv", _C, f, _C)
    qd = np.rint(coefs / q).astype(np.int32).reshape(-1, 64)
    return qd[:, _ZZ]


def _pad_edge(a: np.ndarray, mult: int) -> np.ndarray:
    ph = (-a.shape[0]) % mult
    pw = (-a.shape[1]) % mult
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    return a


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[int, list]:
    """One block's (dc_symbol, [(sym, value, size), ...]) token list;
    index 0 of the token list is the DC entry."""
    dc_diff = int(zz[0]) - pred
    toks = []
    s = int(_size_cat(np.array([dc_diff]))[0])
    toks.append((s, dc_diff, s))
    run = 0
    last_nz = 0
    ac = zz[1:]
    nz = np.nonzero(ac)[0]
    last_nz = nz[-1] + 1 if nz.size else 0
    for k in range(last_nz):
        v = int(ac[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            toks.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = int(_size_cat(np.array([v]))[0])
        toks.append(((run << 4) | s, v, s))
        run = 0
    if last_nz < 63:
        toks.append((0x00, 0, 0))  # EOB
    return int(zz[0]), toks


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "420",
                restart_interval: int = 0,
                huffman: str = "optimal") -> bytes:
    """Encode uint8 HxW (grayscale) or HxWx3 (RGB) as baseline JPEG.

    huffman="optimal" builds per-image fixed-length tables (smallest
    code for this codec's simple table builder); "standard" uses the
    T.81 Annex K.3 typical tables (luma tables for component 0, chroma
    for the rest) — the convention MJPEG-in-AVI assumes, letting the
    DHT segment be omitted entirely."""
    a = np.ascontiguousarray(arr, dtype=np.uint8).astype(np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    if subsampling not in ("420", "444"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if huffman not in ("optimal", "standard"):
        raise ValueError(f"unsupported huffman mode {huffman!r}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql, qc = _quality_tables(quality)

    if gray:
        comps = [(_pad_edge(a, 8), ql, 1, 1, 0)]
        hmax = vmax = 1
    else:
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = (-0.168736 * a[..., 0] - 0.331264 * a[..., 1]
              + 0.5 * a[..., 2] + 128.0)
        cr = (0.5 * a[..., 0] - 0.418688 * a[..., 1]
              - 0.081312 * a[..., 2] + 128.0)
        if subsampling == "420":
            hmax = vmax = 2
            y = _pad_edge(y, 16)
            # mean-pool chroma 2x2, then pad to the luma MCU grid
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cb2 = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean((1, 3))
            cr2 = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean((1, 3))
            th, tw = y.shape[0] // 2, y.shape[1] // 2
            comps = [(y, ql, 2, 2, 0),
                     (_pad_to(cb2, th, tw), qc, 1, 1, 1),
                     (_pad_to(cr2, th, tw), qc, 1, 1, 1)]
        else:
            hmax = vmax = 1
            comps = [(_pad_edge(y, 8), ql, 1, 1, 0),
                     (_pad_edge(cb, 8), qc, 1, 1, 1),
                     (_pad_edge(cr, 8), qc, 1, 1, 1)]

    quantized = [_quantize(p, q) for p, q, *_ in comps]
    mcx = comps[0][0].shape[1] // (8 * hmax)
    mcy = comps[0][0].shape[0] // (8 * vmax)

    # pass 1: MCU-ordered token stream + symbol alphabets
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    mcu_tokens: list[list] = []
    pred = [0] * len(comps)
    for m in range(mcx * mcy):
        if restart_interval and m and m % restart_interval == 0:
            pred = [0] * len(comps)
        my, mx = divmod(m, mcx)
        toks_here = []
        for ci, (plane, _q, ch, cv, _tq) in enumerate(comps):
            bw = plane.shape[1] // 8
            for by in range(cv):
                for bx in range(ch):
                    bi = (my * cv + by) * bw + (mx * ch + bx)
                    dc_val, toks = _block_symbols(quantized[ci][bi],
                                                  pred[ci])
                    pred[ci] = dc_val
                    # per-block: (table class tq, [DC, AC...])
                    toks_here.append((comps[ci][4], toks))
                    dc_syms.add(toks[0][0])
                    for sym, _v, _s in toks[1:]:
                        ac_syms.add(sym)
        mcu_tokens.append(toks_here)
    if huffman == "standard":
        dc_codes_by = {0: _codes_from_spec(*_STD_DC_LUMA),
                       1: _codes_from_spec(*_STD_DC_CHROMA)}
        ac_codes_by = {0: _codes_from_spec(*_STD_AC_LUMA),
                       1: _codes_from_spec(*_STD_AC_CHROMA)}
    else:
        dc_bits, dc_vals, dc_codes = _fixed_length_table(dc_syms)
        ac_bits, ac_vals, ac_codes = _fixed_length_table(ac_syms)
        dc_codes_by = {0: dc_codes, 1: dc_codes}
        ac_codes_by = {0: ac_codes, 1: ac_codes}

    wr = _BitWriter()
    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(body) + 2) + body)

    def dqt_body(tid: int, q: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(
            int(q.reshape(-1)[zi]) for zi in _ZZ)

    seg(0xDB, dqt_body(0, ql) + (b"" if gray else dqt_body(1, qc)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_p, _q, ch, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, tq])
    seg(0xC0, sof)
    if huffman == "standard":
        out += standard_dht_segment()
    else:
        seg(0xC4, (bytes([0x00]) + bytes(dc_bits) + dc_vals
                   + bytes([0x10]) + bytes(ac_bits) + ac_vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        tq = comps[i][4]
        sos += bytes([i + 1, 0x11 if huffman == "standard" and tq else
                      0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    rst = 0
    for m, blocks in enumerate(mcu_tokens):
        if restart_interval and m and m % restart_interval == 0:
            wr.flush()
            out.extend(wr.out)
            wr.out = bytearray()
            out.extend(b"\xff" + bytes([0xD0 + (rst & 7)]))
            rst += 1
        for tq, toks in blocks:
            for i, (sym, v, s) in enumerate(toks):
                c, ln = (dc_codes_by if i == 0 else ac_codes_by)[tq][sym]
                wr.write(c, ln)
                if s:
                    wr.write(v if v > 0 else v + (1 << s) - 1, s)
    wr.flush()
    out.extend(wr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _pad_to(a: np.ndarray, th: int, tw: int) -> np.ndarray:
    ph, pw = th - a.shape[0], tw - a.shape[1]
    if ph < 0 or pw < 0:
        raise ValueError("plane larger than target")
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    return a
