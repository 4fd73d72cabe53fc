"""Pure stdlib/numpy FLAC codec (RFC 9639 / the public FLAC spec).

Decoder scope — the full lossless core a scraped-audio corpus hits:
- STREAMINFO parse, all other metadata blocks skipped by length;
- fixed and variable blocking strategies, every block-size / sample-rate /
  sample-size header code (8/12/16/20/24-bit), UTF-8-coded frame numbers;
- channel assignments: 1..8 independent channels plus the left-side,
  right-side and mid-side stereo decorrelations;
- subframes: CONSTANT, VERBATIM, FIXED orders 0..4, LPC orders 1..32 with
  signed quantized coefficients and arithmetic shift, and wasted-bits
  (unary-coded trailing-zero stripping);
- residuals: 4-bit and 5-bit Rice parameter methods, multi-partition
  orders, and the escape-to-raw partition form;
- CRC-8 (header) and CRC-16 (frame) verified; the STREAMINFO MD5 of the
  raw PCM is verified when present.

The encoder (16-bit, mono/stereo) exists so round trips are
self-contained in this container (same strategy as the JPEG/GIF/WebP
codecs): per-block best-of fixed orders 0..4 with per-partition Rice
parameters, constant detection, wasted-bits auto-detection, and knobs
forcing VERBATIM, LPC (as an exactly-equivalent quantized predictor),
escape partitions, higher partition orders and each stereo mode — so
bit-exact tests pin every decoder path above without external fixtures.

MP3 / Vorbis / Opus stay honest NotImplementedError seams in
stages/multimodal.py: their spec Huffman/codebook tables genuinely need
the codec libraries absent from this container, while FLAC (like PNG) is
fully derivable from the public spec with stdlib + numpy.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


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


# ---------------------------------------------------------------------------
# MSB-first bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over bytes, tracking byte spans for CRC checks."""

    __slots__ = ("bits", "pos", "_ones", "raw")

    def __init__(self, raw: bytes) -> None:
        self.raw = raw
        self.bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
        self._ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise ValueError("truncated FLAC stream")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        i = np.searchsorted(self._ones, self.pos)
        if i >= self._ones.size:
            raise ValueError("truncated FLAC stream (unary)")
        one = int(self._ones[i])
        count = one - self.pos
        self.pos = one + 1
        return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def bytepos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("out", "cur", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.cur = (self.cur << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.cur >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.cur &= (1 << self.n) - 1

    def write_unary(self, v: int) -> None:
        while v >= 32:
            self.write(0, 32)
            v -= 32
        self.write(1, v + 1)  # v zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def finish(self) -> bytes:
        self.align()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample index; up to 36 bits)
# ---------------------------------------------------------------------------


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if v < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (v >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number too large")


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0  # count of leading ones in b0
    m = 0x80
    while b0 & m:
        nbytes += 1
        m >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8-coded number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8-coded continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
                 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("block size is not divisible into partitions")
    res: list[int] = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("partition shorter than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                res.extend([0] * count)
            else:
                res.extend(br.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                res.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return res


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        out = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif ftype >= 32:  # LPC
        order = (ftype & 31) + 1
        out = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for r in res:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac_int(payload: bytes | np.ndarray) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (int32 samples — (n,) mono or (n, ch), rate, bps).
    Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 when present."""
    raw = payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload)
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(raw):
            raise ValueError("truncated metadata")
        hdr = raw[pos]
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + raw[pos + 1 : pos + 4])
        body = raw[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen < 34:
                raise ValueError("short STREAMINFO")
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 0x7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | struct.unpack(">I", body[14:18])[0]
            md5 = body[18:34]
            info = (sr, channels, bps, total, md5)
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    sr, channels, bps, total, md5 = info
    br = _BitReader(raw[pos:])
    chans: list[list[int]] = [[] for _ in range(channels)]
    while br.bytepos + 2 <= len(br.raw):
        frame_start = br.bytepos
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        if br.read(1):
            raise ValueError("reserved frame bit set")
        _variable = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame bit set")
        _num = _utf8_decode(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            rate = sr
        elif sr_code in _SAMPLE_RATES:
            rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("invalid sample rate code")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if fbps is None:
            raise ValueError("reserved sample size code")
        crc8_calc = _crc8(br.raw[frame_start : br.bytepos])
        if br.read(8) != crc8_calc:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("frame channel count contradicts STREAMINFO")
            sub = [_decode_subframe(br, blocksize, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in a non-stereo stream")
            extra0 = 1 if ch_code == 9 else 0  # side channel gets +1 bit
            extra1 = 1 if ch_code in (8, 10) else 0
            c0 = _decode_subframe(br, blocksize, fbps + extra0)
            c1 = _decode_subframe(br, blocksize, fbps + extra1)
            if ch_code == 8:  # left-side
                sub = [c0, [l - s for l, s in zip(c0, c1)]]
            elif ch_code == 9:  # right-side (side stored first)
                sub = [[s + r for s, r in zip(c0, c1)], c1]
            else:  # mid-side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        crc16_calc = _crc16(br.raw[frame_start : br.bytepos])
        if br.read(16) != crc16_calc:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(sub[c])
        if total and len(chans[0]) >= total:
            break
    out = np.array(chans, dtype=np.int32).T
    if total:
        out = out[:total]
    if md5 != b"\x00" * 16:
        width = (bps + 7) // 8
        dt = {1: "<i1", 2: "<i2", 3: None, 4: "<i4"}[width]
        if dt is not None:
            calc = hashlib.md5(out.astype(dt).tobytes()).digest()
            if calc != md5:
                raise ValueError("decoded PCM fails the STREAMINFO MD5")
    return (out[:, 0] if channels == 1 else out), int(rate), bps


def decode_flac(payload: bytes | np.ndarray) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 samples in [-1, 1), sample_rate) — the same
    contract as decode_wav. Stereo returns shape (n, 2)."""
    samples, rate, bps = decode_flac_int(payload)
    return samples.astype(np.float32) / float(1 << (bps - 1)), rate


# ---------------------------------------------------------------------------
# encoding (16-bit mono/stereo)
# ---------------------------------------------------------------------------


def _rice_param(res: list[int], pbits: int) -> int:
    total = sum((abs(r) << 1) for r in res) or 1
    mean = total / max(len(res), 1)
    k = 0
    while (1 << (k + 1)) < mean and k < (1 << pbits) - 2:
        k += 1
    return k


def _write_residual(
    bw: _BitWriter, res: list[int], order: int, partition_order: int, escape: bool
) -> None:
    bw.write(0, 2)  # 4-bit rice method
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    blocksize = len(res) + order
    start = 0
    for p in range(nparts):
        count = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = res[start : start + count]
        start += count
        if escape:
            rawbits = max((1 + (abs(r) + (r >= 0)).bit_length() for r in part), default=1)
            rawbits = min(max(rawbits, 1), 31)
            bw.write(0xF, 4)
            bw.write(rawbits, 5)
            for r in part:
                bw.write(r & ((1 << rawbits) - 1), rawbits)
            continue
        k = _rice_param(part, 4)
        bw.write(k, 4)
        for r in part:
            u = (abs(r) << 1) - (1 if r < 0 else 0)
            bw.write_unary(u >> k)
            bw.write(u & ((1 << k) - 1), k)


def _residual(x: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(x))
    ]


def _encode_subframe(
    bw: _BitWriter,
    x: list[int],
    bps: int,
    *,
    force: str | None,
    partition_order: int,
    escape: bool,
) -> None:
    bw.write(0, 1)  # padding
    wasted = 0
    if force is None and any(x):
        tz = min((v & -v).bit_length() - 1 for v in x if v)
        wasted = min(tz, bps - 1) if tz > 0 else 0
    eff = bps - wasted
    xs = [v >> wasted for v in x] if wasted else x
    if force == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in xs:
            bw.write(v & ((1 << eff) - 1), eff)
        return
    if force is None and len(set(xs)) == 1:
        bw.write(0, 6)  # CONSTANT
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)
        bw.write(xs[0] & ((1 << eff) - 1), eff)
        return
    if force == "lpc":
        # order-2 quantized predictor equal to FIXED order 2: (64*a1-32*a2)>>5
        order, prec, shift, coefs = 2, 15, 5, [64, -32]
        res = [
            xs[i] - ((coefs[0] * xs[i - 1] + coefs[1] * xs[i - 2]) >> shift)
            for i in range(order, len(xs))
        ]
        bw.write(32 | (order - 1), 6)
        bw.write(0, 1)  # wasted suppressed under force
        for v in xs[:order]:
            bw.write(v & ((1 << eff) - 1), eff)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        _write_residual(bw, res, order, partition_order, escape)
        return
    # best fixed order by residual magnitude
    best_order, best_res, best_cost = 0, _residual(xs, 0), None
    max_order = min(4, len(xs) - 1)
    for order in range(0, max_order + 1):
        res = _residual(xs, order)
        cost = sum(abs(r) for r in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    bw.write(8 | best_order, 6)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    for v in xs[:best_order]:
        bw.write(v & ((1 << eff) - 1), eff)
    _write_residual(bw, best_res, best_order, partition_order, escape)


def encode_flac(
    samples: np.ndarray,
    *,
    sample_rate: int = 16000,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    force_subframe: str | None = None,
    partition_order: int = 0,
    rice_escape: bool = False,
) -> bytes:
    """int16 mono (n,) or stereo (n, 2) samples -> FLAC bytes.

    Knobs pin decoder paths in tests: ``force_subframe`` in
    {"verbatim", "lpc"}, ``stereo_mode`` in {"independent", "left-side",
    "right-side", "mid-side"}, ``partition_order`` > 0 for multi-partition
    Rice residuals, ``rice_escape`` for the escaped raw partition form."""
    header, frames = encode_flac_parts(
        samples,
        sample_rate=sample_rate,
        block_size=block_size,
        stereo_mode=stereo_mode,
        force_subframe=force_subframe,
        partition_order=partition_order,
        rice_escape=rice_escape,
    )
    return header + b"".join(frames)


def encode_flac_parts(
    samples: np.ndarray,
    *,
    sample_rate: int = 16000,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    force_subframe: str | None = None,
    partition_order: int = 0,
    rice_escape: bool = False,
) -> tuple[bytes, list[bytes]]:
    """Same encode, split as (b"fLaC"+STREAMINFO header bytes, [frame bytes])
    — the per-packet granularity the Ogg-FLAC mapping needs (one audio frame
    per Ogg packet, functions/ogg.py)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError("expected (n,) mono or (n, 2) stereo int16")
    if stereo_mode not in ("independent", "left-side", "right-side", "mid-side"):
        raise ValueError(f"unknown stereo mode {stereo_mode!r}")
    n, channels = s.shape
    if n == 0:
        raise ValueError("empty audio")
    bps = 16
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    stream = bytearray(b"fLaC")
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    info += bytes(
        [
            (sample_rate >> 12) & 0xFF,
            (sample_rate >> 4) & 0xFF,
            ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        ]
    )
    info += struct.pack(">I", n & 0xFFFFFFFF)
    info += md5
    stream += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info
    frames: list[bytes] = []
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # 16-bit block size at end
        bw.write(0, 4)  # sample rate from STREAMINFO
        if channels == 1 or stereo_mode == "independent":
            bw.write(channels - 1, 4)
        else:
            bw.write({"left-side": 8, "right-side": 9, "mid-side": 10}[stereo_mode], 4)
        bw.write(4, 3)  # 16 bps
        bw.write(0, 1)
        for b in _utf8_encode(fi):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bytes(bw.out)  # aligned: 14+1+1+4+4+4+3+1 = 32 bits + bytes
        bw.write(_crc8(header), 8)
        left = blk[:, 0].astype(np.int64).tolist()
        kw = dict(force=force_subframe, partition_order=partition_order, escape=rice_escape)
        if channels == 1:
            _encode_subframe(bw, left, bps, **kw)
        elif stereo_mode == "independent":
            _encode_subframe(bw, left, bps, **kw)
            _encode_subframe(bw, blk[:, 1].astype(np.int64).tolist(), bps, **kw)
        else:
            right = blk[:, 1].astype(np.int64).tolist()
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left-side":
                _encode_subframe(bw, left, bps, **kw)
                _encode_subframe(bw, side, bps + 1, **kw)
            elif stereo_mode == "right-side":
                _encode_subframe(bw, side, bps + 1, **kw)
                _encode_subframe(bw, right, bps, **kw)
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _encode_subframe(bw, mid, bps, **kw)
                _encode_subframe(bw, side, bps + 1, **kw)
        bw.align()
        frame = bytes(bw.out)
        bw.write(_crc16(frame), 16)
        frames.append(bw.finish())
    return bytes(stream), frames
