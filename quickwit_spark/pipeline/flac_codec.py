"""FLAC codec — dependency-free decode + encode from the public spec.

Implements the FLAC bitstream from RFC 9639 / the xiph.org format
document with stdlib struct + numpy only: STREAMINFO metadata, frame
headers (CRC-8 verified), constant / verbatim / fixed / LPC subframes,
wasted bits, Rice-coded residual partitions (both 4- and 5-bit
parameter widths, escape partitions), all four channel assignments
(independent, left/side, right/side, mid/side), and frame CRC-16
verification.  The encoder emits real compressed FLAC: per-subframe
predictor selection (constant / fixed order 0-4 with verbatim
fallback), optimal single-partition Rice parameters, and optional
stereo decorrelation — decode(encode(x)) is bit-lossless, which is
what makes closed-form oracles sound for a compressed audio format.

Scale story: audio stats/dedup over a 100 TB corpus decode inside
mapInPandas Arrow batches (multimodal.audio_stats); nothing here
touches the driver.

Reference parity: the reference treats media blobs as opaque bytes;
this module belongs to the LLM-pipeline multimodal surface (SURVEY §2
LLM ops), not to a reference subsystem.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import MediaDecodeError

# ------------------------------------------------------------------ CRC

def _make_crc8_table() -> np.ndarray:
    tbl = np.zeros(256, np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl[i] = c
    return tbl


def _make_crc16_table() -> np.ndarray:
    tbl = np.zeros(256, np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        tbl[i] = c
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16[((c >> 8) ^ b) & 0xFF])
    return c


# ------------------------------------------------------------- bit I/O

class _BitReader:
    """MSB-first bit reader over bytes, with byte-position tracking so
    frame CRCs can be computed over the exact consumed span."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # byte offset of the NEXT unread byte
        self.bit = 0            # bits already consumed from data[pos]

    def read(self, nbits: int) -> int:
        out = 0
        pos, bit, data = self.pos, self.bit, self.data
        n = len(data)
        while nbits > 0:
            if pos >= n:
                raise MediaDecodeError("FLAC: truncated bitstream")
            avail = 8 - bit
            take = min(avail, nbits)
            cur = data[pos]
            out = (out << take) | ((cur >> (avail - take))
                                   & ((1 << take) - 1))
            bit += take
            nbits -= take
            if bit == 8:
                pos += 1
                bit = 0
        self.pos, self.bit = pos, bit
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 20:
                raise MediaDecodeError("FLAC: runaway unary code")

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


# ------------------------------------------------------------- decode

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}

_BLOCKSIZE_TBL = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# Allocation guard for hostile STREAMINFO/frames: TOTAL channel-samples
# (blocksize x channels summed over frames), so a crafted many-channel
# stream can't amplify a tiny blob into gigabytes — decoded chunks are
# held as int32, capping decode memory at ~256 MiB + one frame.
MAX_SAMPLES = 1 << 26


def _read_utf8_coded(br: _BitReader) -> int:
    """The frame/sample number uses UTF-8-style coding (up to 7 bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise MediaDecodeError("FLAC: bad coded frame number")
    val = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise MediaDecodeError("FLAC: bad coded-number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(br: _BitReader, blocksize: int, order: int
                     ) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise MediaDecodeError(f"FLAC: reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts or (blocksize >> porder) < order:
        raise MediaDecodeError("FLAC: invalid partition order")
    out = np.empty(blocksize - order, np.int64)
    w = 0
    for p in range(nparts):
        cnt = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += cnt
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int
                     ) -> np.ndarray:
    if br.read(1):
        raise MediaDecodeError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
        if bps <= 0:
            raise MediaDecodeError("FLAC: wasted bits exceed sample size")

    if stype == 0:       # constant
        out = np.full(blocksize, br.read_signed(bps), np.int64)
    elif stype == 1:     # verbatim
        out = np.fromiter((br.read_signed(bps) for _ in range(blocksize)),
                          np.int64, blocksize)
    elif 8 <= stype <= 12:   # fixed, order 0-4
        order = stype - 8
        if order > blocksize:
            raise MediaDecodeError("FLAC: fixed order > blocksize")
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        if order == 0:
            out[:] = resid
        else:
            for i in range(order, blocksize):
                acc = resid[i - order]
                for j, c in enumerate(coefs):
                    acc += c * out[i - 1 - j]
                out[i] = acc
    elif stype >= 32:    # LPC, order 1-32
        order = stype - 31
        if order > blocksize:
            raise MediaDecodeError("FLAC: LPC order > blocksize")
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise MediaDecodeError("FLAC: invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise MediaDecodeError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[i - 1 - j])
            out[i] = (acc >> shift) + resid[i - order]
    else:
        raise MediaDecodeError(f"FLAC: reserved subframe type {stype}")
    return out << wasted if wasted else out


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to (samples int32 [n_frames, n_channels],
    sample_rate). Verifies frame-header CRC-8 and frame CRC-16."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise MediaDecodeError("not a FLAC stream: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise MediaDecodeError("FLAC: truncated metadata")
        hdr = struct.unpack(">I", data[pos:pos + 4])[0]
        last, btype, length = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = data[pos + 4:pos + 4 + length]
        if len(body) != length:
            raise MediaDecodeError("FLAC: truncated metadata block")
        if btype == 0:
            if length < 34:
                raise MediaDecodeError("FLAC: short STREAMINFO")
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 0x7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0xF) << 32) | struct.unpack(
                ">I", body[14:18])[0]
            info = (rate, channels, bps, total)
        elif btype == 127:
            raise MediaDecodeError("FLAC: invalid metadata block type 127")
        pos += 4 + length
        if last:
            break
    if info is None:
        raise MediaDecodeError("FLAC: missing STREAMINFO")
    rate, channels, bps, total = info
    if rate == 0 or channels == 0:
        raise MediaDecodeError("FLAC: bad STREAMINFO")
    if total * channels > MAX_SAMPLES:
        raise MediaDecodeError(
            f"FLAC: {total}x{channels}ch samples exceeds "
            f"MAX_SAMPLES={MAX_SAMPLES}")

    chunks = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise MediaDecodeError(f"FLAC: bad frame sync at {frame_start}")
        if br.read(1):
            raise MediaDecodeError("FLAC: reserved frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise MediaDecodeError("FLAC: reserved frame bit set")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise MediaDecodeError("FLAC: reserved blocksize code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TBL[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise MediaDecodeError("FLAC: invalid sample-rate code 15")
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise MediaDecodeError("FLAC: reserved sample-size code 3")
        else:
            fbps = _BPS_TBL[ss_code]
        hdr_end = br.pos  # CRC-8 covers everything before the CRC byte
        crc8 = br.read(8)
        if _crc8(data[frame_start:hdr_end]) != crc8:
            raise MediaDecodeError("FLAC: frame header CRC-8 mismatch")

        # guard BEFORE decoding/allocating the frame: blocksize and
        # channel count are both attacker-controlled header fields
        if (got + blocksize) * channels > MAX_SAMPLES:
            raise MediaDecodeError("FLAC: stream exceeds MAX_SAMPLES")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise MediaDecodeError("FLAC: frame/STREAMINFO channel "
                                       "count mismatch")
            subs = [_decode_subframe(br, blocksize, fbps)
                    for _ in range(nch)]
            frame = np.stack(subs, axis=1)
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise MediaDecodeError("FLAC: stereo decorrelation in a "
                                       "non-stereo stream")
            bps_pair = {8: (fbps, fbps + 1), 9: (fbps + 1, fbps),
                        10: (fbps, fbps + 1)}[ch_code]
            a = _decode_subframe(br, blocksize, bps_pair[0])
            b = _decode_subframe(br, blocksize, bps_pair[1])
            if ch_code == 8:      # left/side
                left, right = a, a - b
            elif ch_code == 9:    # right/side
                left, right = a + b, b
            else:                 # mid/side
                mid = (a << 1) | (b & 1)
                left, right = (mid + b) >> 1, (mid - b) >> 1
            frame = np.stack([left, right], axis=1)
        else:
            raise MediaDecodeError(
                f"FLAC: reserved channel assignment {ch_code}")

        br.align()
        crc_end = br.pos
        crc16 = br.read(16)
        if _crc16(data[frame_start:crc_end]) != crc16:
            raise MediaDecodeError("FLAC: frame CRC-16 mismatch")
        pos = br.pos

        lim = 1 << (fbps - 1)
        if int(frame.max()) >= lim or int(frame.min()) < -lim:
            raise MediaDecodeError("FLAC: decoded sample out of range")
        # int32 is the final dtype; dropping the int64 decode headroom
        # here halves what a maximal stream can pin in memory
        chunks.append(frame.astype(np.int32))
        got += blocksize

    if not chunks:
        raise MediaDecodeError("FLAC: no audio frames")
    out = np.concatenate(chunks, axis=0)
    if total and len(out) > total:
        out = out[:total]  # last block may be padded by encoders
    if total and len(out) < total:
        raise MediaDecodeError("FLAC: stream shorter than STREAMINFO")
    return out.astype(np.int32), rate


# ------------------------------------------------------------- encode

def _write_utf8_coded(bw: "_BitWriter", val: int) -> None:
    """Write a frame/sample number in FLAC's UTF-8-style coding — the
    exact mirror of _read_utf8_coded (1..7 bytes, up to 36 bits), so
    encode stays lossless past frame 65535 (the old inline writer
    silently emitted corrupt 3-byte sequences for fno >= 0x10000)."""
    if val < 0x80:
        bw.write(val, 8)
        return
    for nbytes, cap in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                        (7, 36)):
        if val < (1 << cap):
            break
    else:
        raise ValueError(f"coded number {val} exceeds 36 bits")
    ones = (~((1 << (8 - nbytes)) - 1)) & 0xFF  # nbytes leading 1s
    bw.write(ones | (val >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((val >> (6 * i)) & 0x3F), 8)


def _rice_cost(resid: np.ndarray, param: int) -> int:
    u = (np.abs(resid) << 1) - (resid < 0)
    return int(np.sum(u >> param)) + len(resid) * (1 + param)


def _best_rice_param(resid: np.ndarray) -> int:
    if not len(resid):
        return 0
    best, bestcost = 0, None
    for p in range(15):
        c = _rice_cost(resid, p)
        if bestcost is None or c < bestcost:
            best, bestcost = p, c
    return best


def _write_residual(bw: _BitWriter, resid: np.ndarray) -> None:
    bw.write(0, 2)   # 4-bit rice params
    bw.write(0, 4)   # partition order 0
    param = _best_rice_param(resid)
    bw.write(param, 4)
    for v in resid:
        v = int(v)
        u = (abs(v) << 1) - (1 if v < 0 else 0)
        bw.write_unary(u >> param)
        if param:
            bw.write(u, param)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and (x == x[0]).all():
        bw.write(0, 1 + 6 + 1)     # constant, no wasted bits
        bw.write(int(x[0]), bps)
        return
    # pick the fixed order minimizing the rice-coded size
    best_order, best_resid, best_cost = None, None, None
    for order, coefs in _FIXED_COEFS.items():
        if order > n:
            continue
        r = x.copy()
        for _ in range(order):
            r = np.diff(r)
        # warm-up samples cost bps each; residual rice-coded
        if len(r) and (np.abs(r) >> 62).any():
            continue  # pathological overflow risk: skip this order
        cost = order * bps + _rice_cost(r, _best_rice_param(r)) + 6
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, r, cost
    if best_cost is None or best_cost >= n * bps:
        bw.write(0, 1)             # verbatim: pad, type 000001, no wasted
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(8 + best_order, 6)
    bw.write(0, 1)
    for v in x[:best_order]:
        bw.write(int(v), bps)
    _write_residual(bw, best_resid)


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = 4096, stereo: str = "independent"
                ) -> bytes:
    """Encode int samples [n] or [n, ch] (ch <= 8) as FLAC.  stereo:
    "independent", "left_side", "right_side", or "mid_side" (2-channel
    only).  Lossless: decode_flac(encode_flac(x)) == x."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or not 1 <= a.shape[1] <= 8:
        raise ValueError(f"bad sample shape {samples.shape}")
    if not 4 <= bps <= 24:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    if not 1 <= sample_rate < (1 << 20):
        # STREAMINFO's rate field is 20 bits; silently truncating it
        # would write a wrong-rate or undecodable stream
        raise ValueError(f"sample_rate {sample_rate} outside the 20-bit "
                         "STREAMINFO range")
    a = a.astype(np.int64)
    lim = 1 << (bps - 1)
    if a.size and (a.max() >= lim or a.min() < -lim):
        raise ValueError(f"samples exceed {bps}-bit range")
    n, ch = a.shape
    if stereo != "independent" and ch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    if n == 0:
        raise ValueError("no samples")

    out = bytearray(b"fLaC")
    sinfo = bytearray()
    sinfo += struct.pack(">HH", block_size, block_size)
    sinfo += b"\x00\x00\x00" * 2                      # frame size bounds
    sinfo.append((sample_rate >> 12) & 0xFF)
    sinfo.append((sample_rate >> 4) & 0xFF)
    sinfo.append(((sample_rate & 0xF) << 4)
                 | ((ch - 1) << 1) | ((bps - 1) >> 4))
    sinfo.append((((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF))
    sinfo += struct.pack(">I", n & 0xFFFFFFFF)
    sinfo += b"\x00" * 16                             # MD5 unset
    out += struct.pack(">I", (1 << 31) | len(sinfo)) + sinfo

    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps, 0)
    for fno, start in enumerate(range(0, n, block_size)):
        blk = a[start:start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)           # fixed blocking strategy
        bw.write(7, 4)           # blocksize: 16 bits minus 1, at end
        bw.write(0, 4)           # sample rate: from STREAMINFO
        if stereo == "independent":
            bw.write(ch - 1, 4)
        else:
            bw.write({"left_side": 8, "right_side": 9,
                      "mid_side": 10}[stereo], 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _write_utf8_coded(bw, fno)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw = _BitWriter()
        for b in hdr:
            bw.write(b, 8)
        bw.write(_crc8(hdr), 8)

        if stereo == "independent":
            for c in range(ch):
                _encode_subframe(bw, blk[:, c], bps)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo == "left_side":
                _encode_subframe(bw, left, bps)
                _encode_subframe(bw, side, bps + 1)
            elif stereo == "right_side":
                _encode_subframe(bw, side, bps + 1)
                _encode_subframe(bw, right, bps)
            else:
                mid = (left + right) >> 1
                _encode_subframe(bw, mid, bps)
                _encode_subframe(bw, side, bps + 1)
        bw.align()
        frame = bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
