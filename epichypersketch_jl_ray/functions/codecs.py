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
