"""MJPEG-AVI and Y4M video containers: round trips (bit-exact where the
format is lossless, IDCT-rounding tolerance for MJPEG), container error
paths, and the DHT-less MJPEG seam."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from epichypersketch_jl_ray.functions.video import (
    decode_avi_mjpeg,
    decode_y4m,
    encode_avi_mjpeg,
    encode_y4m,
)


def _frames(n=6, h=16, w=16, channels=0, seed=3):
    rng = np.random.default_rng(seed)
    shape = (n, h, w) if channels == 0 else (n, h, w, channels)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_avi_mjpeg_gray_round_trip():
    f = _frames()
    out = decode_avi_mjpeg(encode_avi_mjpeg(f, quality=100))
    assert out.shape == f.shape
    # quality-100 JPEG: loss limited to IDCT rounding
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 3


def test_avi_mjpeg_rgb_round_trip():
    f = _frames(4, 16, 16, 3)
    out = decode_avi_mjpeg(encode_avi_mjpeg(f, quality=100))
    assert out.shape == f.shape
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 4


def test_avi_error_paths():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"nonsense")
    # an AVI whose movi list is empty
    empty = b"RIFF" + struct.pack("<I", 16) + b"AVI LIST" + struct.pack("<I", 4) + b"movi"
    with pytest.raises(ValueError):
        decode_avi_mjpeg(empty)


def test_avi_dht_less_mjpeg_raises():
    f = _frames(1)
    data = bytearray(encode_avi_mjpeg(f))
    # strip the DHT segments out of the embedded JPEG: find 0xFFC4, replace
    # the whole segment with a same-length APP1 comment so offsets survive
    i = bytes(data).find(b"\xff\xc4")
    while i >= 0:
        data[i + 1] = 0xE1  # DHT -> APP1 (kept, ignored by decoders)
        i = bytes(data).find(b"\xff\xc4", i + 2)
    with pytest.raises(NotImplementedError):
        decode_avi_mjpeg(bytes(data))


def test_y4m_mono_bit_exact():
    f = _frames(5, 9, 7)
    data = encode_y4m(f, fps=(30, 1))
    assert data.startswith(b"YUV4MPEG2 W7 H9 F30:1")
    np.testing.assert_array_equal(decode_y4m(data), f)


def test_y4m_444_and_420():
    f = _frames(3, 8, 10, 3)
    out = decode_y4m(encode_y4m(f))  # C444: only RGB<->YCbCr rounding
    assert out.shape == f.shape
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 2
    # C420jpeg: 2x2 chroma subsampling — luma-only content survives exactly
    gray3 = np.repeat(_frames(3, 8, 10)[..., None], 3, axis=3)
    out420 = decode_y4m(encode_y4m(gray3, chroma="420jpeg"))
    assert np.abs(out420.astype(int) - gray3.astype(int)).max() <= 1


def test_y4m_error_paths():
    with pytest.raises(ValueError):
        decode_y4m(b"MPEG4YUV nonsense")
    f = _frames(2, 4, 4)
    data = encode_y4m(f)
    with pytest.raises(ValueError):
        decode_y4m(data[:-5])  # truncated frame
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C411\nFRAME\n" + b"\x00" * 24)
