"""Lossless WebP (VP8L) codec: bit-exact round trips through every decoder
path — literals, LZ77 (both 2D distance-map codes and literal distances),
color cache, meta-prefix image, all 14 predictor modes, color transform,
subtract-green, palette bundling at every width — plus container and
error-path checks. No external fixtures: the built-in encoder emits each
feature on demand (same self-contained strategy as the JPEG/GIF tests)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from epichypersketch_jl_ray.functions.webp import (
    _lz77_code,
    decode_webp,
    encode_webp_lossless,
)


def _rt(px: np.ndarray, **kw) -> bytes:
    data = encode_webp_lossless(px, **kw)
    out = decode_webp(data)
    assert out.dtype == np.uint8
    assert out.shape == px.shape
    np.testing.assert_array_equal(out, px)
    return data


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (9, 1), (13, 17), (8, 8, 3), (6, 7, 4)])
def test_literal_round_trip(shape):
    rng = np.random.default_rng(42)
    _rt(rng.integers(0, 256, shape, dtype=np.uint8))


def test_shape_convention_gray_rgb_rgba():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    assert decode_webp(encode_webp_lossless(gray)).shape == (5, 6)
    rgb = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    rgb[0, 0] = (1, 2, 3)  # guarantee non-gray
    assert decode_webp(encode_webp_lossless(rgb)).shape == (5, 6, 3)
    rgba = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    assert decode_webp(encode_webp_lossless(rgba)).shape == (5, 6, 4)


def test_lz77_runs_and_row_copies():
    rng = np.random.default_rng(7)
    # distance-1 runs (2D map code (1,0)) dominate here
    runny = np.repeat(rng.integers(0, 8, (6, 5), dtype=np.uint8) * 32, 7, axis=1)
    small = _rt(runny, use_lz77=True)
    assert len(small) < len(_rt(runny))  # the backrefs actually engaged
    # distance-w row copies (2D map code (0,1))
    row = rng.integers(0, 256, (1, 40), dtype=np.uint8)
    _rt(np.tile(row, (25, 1)), use_lz77=True)
    # single-column image: both run kinds collapse to distance 1
    _rt(np.repeat(rng.integers(0, 4, (9, 1), dtype=np.uint8) * 60, 3, axis=0), use_lz77=True)


@pytest.mark.parametrize("cache_bits", [1, 4, 8, 11])
def test_color_cache(cache_bits):
    rng = np.random.default_rng(11)
    # few distinct colors -> heavy cache hits
    vals = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    img = vals[rng.integers(0, 6, (12, 14))]
    _rt(img, cache_bits=cache_bits)
    _rt(img, cache_bits=cache_bits, use_lz77=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_all_predictor_modes(mode):
    rng = np.random.default_rng(100 + mode)
    _rt(rng.integers(0, 256, (10, 12, 3), dtype=np.uint8), predictor_mode=mode, transform_bits=2)
    # smooth gradient image (the case predictors exist for)
    y, x = np.mgrid[0:11, 0:13]
    grad = ((x * 9 + y * 17) % 256).astype(np.uint8)
    _rt(np.stack([grad, 255 - grad, grad // 2], -1), predictor_mode=mode, transform_bits=3)


def test_color_transform_deltas():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    for deltas in [(0, 0, 0), (17, -30, 88), (-128, 127, -1), (1, 1, 1)]:
        _rt(rgb, color_transform=deltas, transform_bits=3)


def test_subtract_green_and_combinations():
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    _rt(rgb, subtract_green=True)
    # stacked transforms decode in reverse stream order
    _rt(rgb, subtract_green=True, predictor_mode=11, cache_bits=5, use_lz77=True)
    _rt(rgb, subtract_green=True, color_transform=(9, -9, 40), transform_bits=2)
    _rt(rgb, subtract_green=True, color_transform=(-5, 3, 7), predictor_mode=12,
        cache_bits=3, use_lz77=True, transform_bits=2)


@pytest.mark.parametrize("num_colors", [1, 2, 3, 4, 5, 16, 17, 200, 256])
def test_palette_every_bundling_width(num_colors):
    rng = np.random.default_rng(num_colors)
    vals = rng.integers(0, 256, (num_colors, 3), dtype=np.uint8)
    # widths that do NOT divide the pixels-per-byte evenly stress the padding
    img = vals[rng.integers(0, num_colors, (7, 13))]
    _rt(img, palette=True)
    # palette operates on full ARGB tuples: RGBA works too (91 px <= 256)
    img4 = np.dstack([img, rng.integers(0, 256, (7, 13), dtype=np.uint8)])
    _rt(img4, palette=True)


def test_meta_prefix_image():
    rng = np.random.default_rng(8)
    _rt(rng.integers(0, 256, (20, 24, 3), dtype=np.uint8), meta_bits=2)
    _rt(rng.integers(0, 256, (3, 3), dtype=np.uint8), meta_bits=3)  # single meta cell
    _rt(rng.integers(0, 256, (17, 5), dtype=np.uint8), meta_bits=4, cache_bits=2, use_lz77=True)


def test_container_walks_unknown_chunks_and_rejects_lossy():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    data = encode_webp_lossless(px)
    # splice an unknown chunk before VP8L (as a VP8X container would have)
    vp8l = data[12:]
    junk = b"XTRA" + struct.pack("<I", 3) + b"abc\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(vp8l)) + b"WEBP" + junk + vp8l
    np.testing.assert_array_equal(decode_webp(riff), px)
    # lossy VP8 chunk raises the documented seam
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)


def test_error_paths():
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all----")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    data = bytearray(encode_webp_lossless(np.zeros((2, 2), np.uint8)))
    data[20] ^= 0xFF  # corrupt the bitstream header region
    with pytest.raises((ValueError, IndexError, NotImplementedError)):
        decode_webp(bytes(data))
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((2, 2), np.uint8), palette=True, subtract_green=True)


def test_lz77_code_inverts_value_table():
    # the prefix-value code table must invert exactly over its full range
    for v in list(range(1, 300)) + [4096, 100_000, 786_432 + 1024]:
        code, nbits, extra = _lz77_code(v)
        if code < 4:
            assert v == code + 1 and nbits == 0
        else:
            eb = (code - 2) >> 1
            lo = ((2 + (code & 1)) << eb) + 1
            assert nbits == eb and lo + extra == v


def test_round_trip_fuzz():
    rng = np.random.default_rng(1234)
    for _ in range(40):
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        nd = int(rng.choice([2, 3, 4]))
        px = rng.integers(0, 256, (h, w) if nd == 2 else (h, w, nd), dtype=np.uint8)
        kw = {}
        if rng.random() < 0.4:
            kw["use_lz77"] = True
        if rng.random() < 0.4:
            kw["cache_bits"] = int(rng.integers(1, 9))
        if rng.random() < 0.3:
            kw["subtract_green"] = True
        if rng.random() < 0.3:
            kw["predictor_mode"] = int(rng.integers(0, 14))
            kw["transform_bits"] = int(rng.integers(2, 5))
        if rng.random() < 0.3:
            kw["color_transform"] = tuple(int(v) for v in rng.integers(-128, 128, 3))
            kw["transform_bits"] = int(rng.integers(2, 5))
        if rng.random() < 0.3:
            kw["meta_bits"] = int(rng.integers(2, 5))
        _rt(px, **kw)
