"""Pure-numpy codecs for the UNCOMPRESSED multimodal formats.

BMP (BI_RGB), WAV (PCM) and raw concatenated video frames need no codec
library — they are fixed headers plus raw sample bytes, parseable with
struct/numpy alone. These give the multimodal pipelines a REAL decode path
inside this container; compressed formats (JPEG/PNG/MP3/H.264) remain the
documented NotImplementedError seams in stages/multimodal.py because their
decoders genuinely are absent here.

Layouts implemented (public file-format specs):
- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, BI_RGB only;
  8-bit (palette present but values ARE the gray levels, the common
  grayscale convention) and 24-bit BGR; rows padded to 4 bytes; bottom-up
  (positive height) or top-down (negative height).
- WAV: RIFF/WAVE chunk walk ("fmt " then "data", tolerating extra chunks),
  PCM (format 1) 16-bit or 8-bit, mono.
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0


def encode_bmp_gray8(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 -> 8-bit grayscale BMP bytes (bottom-up, BI_RGB)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("encode_bmp_gray8 expects a (h, w) array")
    h, w = px.shape
    stride = (w + 3) & ~3
    palette = np.zeros((256, 4), dtype=np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256, dtype=np.uint8)
    data_offset = 14 + 40 + 256 * 4
    img_size = stride * h
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = px[::-1]  # bottom-up storage
    header = struct.pack("<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, _BI_RGB, img_size, 2835, 2835, 256, 0)
    return header + info + palette.tobytes() + rows.tobytes()


def decode_bmp(payload: bytes | np.ndarray) -> np.ndarray:
    """BMP bytes -> (h, w) uint8 (8-bit) or (h, w, 3) uint8 RGB (24-bit)."""
    buf = np.frombuffer(payload, dtype=np.uint8) if not isinstance(payload, np.ndarray) else payload
    # only the 54 header bytes are struct-parsed; pixel data slices from buf
    raw = buf[:54].tobytes()
    if len(buf) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", raw, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", raw, 26)
    if hdr_size < 40 or planes != 1 or compression != _BI_RGB:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, comp={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 8:
        stride = (w + 3) & ~3
        rows = buf[data_offset : data_offset + stride * h].reshape(h, stride)[:, :w]
        return rows.copy() if top_down else rows[::-1].copy()
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = buf[data_offset : data_offset + stride * h].reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return img.copy() if top_down else img[::-1].copy()
    raise ValueError(f"unsupported BMP bit depth {bpp}")


def encode_wav_pcm16(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """mono int16 samples -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes | np.ndarray) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (mono float32 samples in [-1, 1), sample_rate).
    Walks the chunk list, so extra chunks (LIST/fact/...) are tolerated."""
    raw = payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload)
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = raw[pos : pos + 4], struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels != 1:
        raise ValueError(f"only PCM mono supported (format={audio_format}, ch={channels})")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    return s, int(sample_rate)


# --- PNG (ISO/IEC 15948) -----------------------------------------------------
# Zero new dependencies: DEFLATE is stdlib zlib, unfiltering is numpy. Scope:
# 8-bit depth, color types 0 (grayscale) and 2 (RGB), interlace 0. All five
# row filters (None/Sub/Up/Average/Paeth) decode; the encoder can apply any
# one of them so round-trip tests exercise every unfilter path. Adam7
# interlace and 16-bit depth stay out of scope (raise, never mis-read).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left), uint8 out."""
    ai, bi, ci = a.astype(np.int32), b.astype(np.int32), c.astype(np.int32)
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa <= pb) & (pa <= pc), ai, np.where(pb <= pc, bi, ci))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB -> PNG bytes. The given
    row filter (0..4) is applied to EVERY row (real encoders pick per row;
    one fixed type keeps the encoder simple while letting round-trip tests
    drive each unfilter path)."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        h, w = px.shape
        raw = px.reshape(h, w)
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
        h, w, _ = px.shape
        raw = px.reshape(h, w * 3)
    else:
        raise ValueError("encode_png expects (h, w) gray or (h, w, 3) RGB uint8")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    bpp = channels  # bytes per pixel at depth 8
    prev = np.zeros(raw.shape[1], dtype=np.uint8)
    out_rows = []
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:
            filt = row - _paeth(left, prev, upleft)
        out_rows.append(bytes([filter_type]) + filt.tobytes())
        prev = row
    idat = zlib.compress(b"".join(out_rows), level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes | np.ndarray) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 grayscale or (h, w, 3) uint8 RGB.

    Full chunk walk with CRC verification; multiple IDAT chunks concatenate;
    all five row filters unfilter. Sub/Average/Paeth reconstruct pixel by
    pixel along the row (the spec's data dependency — each byte needs the
    reconstructed left neighbour); None/Up are fully vectorized and Sub uses
    a cumulative-sum closed form."""
    import zlib

    raw = payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload)
    if len(raw) < len(_PNG_SIG) + 12 or raw[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(raw):
        length = struct.unpack_from(">I", raw, pos)[0]
        ctype = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", raw, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp != 0 or filt_method != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}): scope "
            "is 8-bit gray/RGB"
        )
    if interlace != 0:
        raise ValueError("Adam7 interlace out of scope")
    channels = 1 if color_type == 0 else 3
    bpp = channels
    stride = w * channels
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    data = data.reshape(h, stride + 1)
    ftypes, rows = data[:, 0], data[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, row = int(ftypes[y]), rows[y]
        if ft == 0:
            r = row.copy()
        elif ft == 1:
            # recon[x] = row[x] + recon[x-bpp]: per-channel cumsum mod 256
            r = np.cumsum(row.reshape(-1, bpp), axis=0, dtype=np.int64) % 256
            r = r.astype(np.uint8).reshape(stride)
        elif ft == 2:
            r = row + prev
        elif ft == 3:
            r = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(r[x - bpp]) if x >= bpp else 0
                r[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:
            r = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(r[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        recon[y] = r
        prev = r
    return recon.reshape(h, w) if channels == 1 else recon.reshape(h, w, 3)
