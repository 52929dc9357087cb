"""Pure-Python FLAC reference: a spec-correct subset ENCODER and a mirror DECODER.

Roles (SURVEY.md §2.10 row 9 — the libsndfile/ffmpeg decode capability):
- `encode_flac` produces real native-FLAC bytes (STREAMINFO + frames with
  CONSTANT/FIXED subframes, Rice partitions, all four stereo decorrelation modes,
  correct CRC8/CRC16) — the golden source for the C++ decoder: FLAC is lossless, so
  decode(encode(x)) must reproduce x exactly.
- `decode_flac_np` is the always-available pure-Python decoder (fallback when g++ is
  unavailable, and an independent cross-check of audio/cpp/flac.cpp).

Format reference: the public FLAC format spec (frame/subframe/residual layout).
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------------------- bit io

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.bitpos = bitpos

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.bitpos >> 3
            off = 7 - (self.bitpos & 7)
            v = (v << 1) | ((self.data[byte] >> off) & 1)
            self.bitpos += 1
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        if v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def unary(self) -> int:
        q = 0
        while True:
            byte = self.bitpos >> 3
            off = 7 - (self.bitpos & 7)
            self.bitpos += 1
            if (self.data[byte] >> off) & 1:
                return q
            q += 1

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    marks = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
             (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5)]
    for limit, lead, extra in marks:
        if n <= limit:
            out.append(lead | (n >> (6 * extra)))
            for i in range(extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError(n)


# ---------------------------------------------------------------------------- encoder

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_param(res: np.ndarray) -> int:
    z = np.where(res >= 0, 2 * res, -2 * res - 1).astype(np.int64)  # zigzag
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int(np.sum(z >> p)) + len(z) * (p + 1)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p


def _write_residual(bw: _BitWriter, res: np.ndarray, blocksize: int, order: int,
                    partition_order: int) -> None:
    assert blocksize % (1 << partition_order) == 0
    bw.write(0, 2)                     # Rice method, 4-bit params
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = res[idx: idx + n]
        idx += n
        param = _rice_param(part)
        bw.write(param, 4)
        z = np.where(part >= 0, 2 * part, -2 * part - 1).astype(np.int64)
        for v in z:
            bw.write_unary(int(v) >> param)
            bw.write(int(v) & ((1 << param) - 1), param)


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                    partition_order: int) -> None:
    bw.write(0, 1)  # pad
    x = x.astype(np.int64)
    if np.all(x == x[0]):
        bw.write(0, 6)                 # CONSTANT
        bw.write(0, 1)                 # no wasted bits
        bw.write_signed(int(x[0]), bps)
        return
    # best fixed order 0..2 by residual magnitude
    best_o, best_cost = 0, None
    for o in range(3):
        if len(x) <= o:
            break
        cost = int(np.abs(_fixed_residual(x, o)).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_cost = o, cost
    o = best_o
    bw.write(8 + o, 6)                 # FIXED order o
    bw.write(0, 1)                     # no wasted bits
    for i in range(o):
        bw.write_signed(int(x[i]), bps)
    _write_residual(bw, _fixed_residual(x, o), len(x), o, partition_order)


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = 4096, stereo_mode: str = "independent",
                partition_order: int = 0) -> bytes:
    """Encode integer samples ([N] mono or [N, C]) into native-FLAC bytes.

    stereo_mode (C == 2 only): independent | left_side | right_side | mid_side.
    """
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    assert bps in (8, 16, 24)
    lim = 1 << (bps - 1)
    assert x.size == 0 or (x.min() >= -lim and x.max() < lim)  # -2^(bps-1) is valid

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ss_code = {8: 1, 16: 4, 24: 6}[bps]
    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start: start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)            # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # fixed-blocksize strategy
        bw.write(0b0111, 4)             # blocksize: 16-bit value follows
        bw.write(0, 4)                  # sample rate: from STREAMINFO
        if channels == 2 and stereo_mode != "independent":
            bw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)                  # reserved
        for b in _utf8_number(fi):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        assert bw.nbits == 0            # header is byte-aligned here by construction
        bw.write(_crc8(bytes(bw.buf)), 8)

        if channels == 2 and stereo_mode != "independent":
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
        else:
            chans = [(blk[:, c], bps) for c in range(channels)]
        for data_c, bps_c in chans:
            po = partition_order if bs % (1 << partition_order) == 0 else 0
            _write_subframe(bw, data_c, bps_c, po)
        bw.align()
        bw.write(_crc16(bytes(bw.buf)), 16)
        out += bw.bytes()
    return bytes(out)


# ---------------------------------------------------------------------------- decoder

def decode_flac_np(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-Python native-FLAC decoder (mirror of audio/cpp/flac.cpp): mono float32 +
    sample rate. Channels averaged, samples scaled by 2^-(bps-1)."""
    assert data[:4] == b"fLaC", "not a FLAC stream"
    br = _BitReader(data, 32)

    sr = channels = bps = 0
    total = 0
    last = False
    while not last:
        last = br.bits(1) == 1
        btype = br.bits(7)
        blen = br.bits(24)
        if btype == 0:
            br.bits(16); br.bits(16); br.bits(24); br.bits(24)
            sr = br.bits(20)
            channels = br.bits(3) + 1
            bps = br.bits(5) + 1
            total = br.bits(36)
            br.bitpos += (blen - 18) * 8  # 18 bytes of fields read; skip md5 etc.
        else:
            br.bitpos += blen * 8

    scale = 1.0 / (1 << (bps - 1))
    mono: list[float] = []

    def read_residual(blocksize, order):
        method = br.bits(2)
        pbits = 4 if method == 0 else 5
        escape = 15 if method == 0 else 31
        porder = br.bits(4)
        nparts = 1 << porder
        res = np.zeros(blocksize, np.int64)
        idx = order
        for p in range(nparts):
            count = blocksize // nparts - (order if p == 0 else 0)
            param = br.bits(pbits)
            if param == escape:
                raw = br.bits(5)
                for _ in range(count):
                    res[idx] = br.sbits(raw) if raw else 0
                    idx += 1
            else:
                for _ in range(count):
                    q = br.unary()
                    v = (q << param) | br.bits(param)
                    res[idx] = (v >> 1) ^ -(v & 1)
                    idx += 1
        return res

    def read_subframe(blocksize, sbps):
        assert br.bits(1) == 0
        stype = br.bits(6)
        wasted = 0
        if br.bits(1) == 1:
            wasted = 1 + br.unary()
        ebps = sbps - wasted
        if stype == 0:
            out = np.full(blocksize, br.sbits(ebps), np.int64)
        elif stype == 1:
            out = np.asarray([br.sbits(ebps) for _ in range(blocksize)], np.int64)
        elif 8 <= stype <= 12:
            order = stype - 8
            out = np.zeros(blocksize, np.int64)
            for i in range(order):
                out[i] = br.sbits(ebps)
            out += read_residual(blocksize, order)
            coefs = _FIXED_COEFS[order]
            for i in range(order, blocksize):
                out[i] += sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
        elif stype >= 32:
            order = stype - 31
            out = np.zeros(blocksize, np.int64)
            for i in range(order):
                out[i] = br.sbits(ebps)
            precision = br.bits(4) + 1
            shift = br.sbits(5)
            coef = [br.sbits(precision) for _ in range(order)]
            out += read_residual(blocksize, order)
            for i in range(order, blocksize):
                out[i] += sum(c * out[i - 1 - j] for j, c in enumerate(coef)) >> shift
        else:
            raise ValueError(f"subframe type {stype}")
        return out << wasted if wasted else out

    while br.bitpos + 32 <= len(data) * 8 and (not total or len(mono) < total):
        if br.bits(14) != 0x3FFE:
            break
        br.bits(2)
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        ss_code = br.bits(3)
        br.bits(1)
        b0 = br.bits(8)  # utf8 coded number
        extra = 0
        for mask, lead, e in ((0x80, 0x00, 0), (0xE0, 0xC0, 1), (0xF0, 0xE0, 2),
                              (0xF8, 0xF0, 3), (0xFC, 0xF8, 4), (0xFE, 0xFC, 5)):
            if (b0 & mask) == lead:
                extra = e
                break
        for _ in range(extra):
            br.bits(8)
        if bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.bits(8) + 1
        elif bs_code == 7:
            bs = br.bits(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        fbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ss_code]
        br.bits(8)  # crc8

        if ch_code <= 7:
            nch, mode = ch_code + 1, 0
        else:
            nch, mode = 2, ch_code - 7   # 1 left/side, 2 right/side, 3 mid/side
        chans = []
        for c in range(nch):
            sbps = fbps
            if (mode == 1 and c == 1) or (mode == 2 and c == 0) or (mode == 3 and c == 1):
                sbps += 1
            chans.append(read_subframe(bs, sbps))
        br.align()
        br.bits(16)  # crc16

        if mode == 0:
            m = np.mean(np.stack(chans, 1), axis=1)
        elif mode == 1:
            left, side = chans
            m = 0.5 * (left + (left - side))
        elif mode == 2:
            side, right = chans
            m = 0.5 * ((right + side) + right)
        else:
            mid, side = chans
            l2 = ((mid << 1) | (side & 1)) + side
            r2 = ((mid << 1) | (side & 1)) - side
            m = 0.25 * (l2 + r2)
        mono.extend((m * scale).tolist())

    if total:
        mono = mono[:total]
    return np.asarray(mono, np.float32), sr
