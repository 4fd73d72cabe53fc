"""FLAC codec: bit-exact round trips through every decoder path — fixed
orders 0..4 picked per block, CONSTANT, VERBATIM, LPC with quantized
coefficients and shift, wasted bits, multi-partition Rice residuals, the
escape-to-raw partition form, and all four stereo assignments — plus
CRC/MD5 tamper detection and the WindowAudio stage dispatch. No external
fixtures: the built-in encoder emits each feature on demand."""

from __future__ import annotations

import numpy as np
import pytest

from epichypersketch_jl_ray.functions.flac import (
    decode_flac,
    decode_flac_int,
    encode_flac,
)


def _sig(n: int, seed: int = 17, amp: float = 6000.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 37.0) + rng.normal(0, 80, n)).astype(np.int16)


def _rt(s: np.ndarray, **kw) -> bytes:
    data = encode_flac(s, sample_rate=16000, **kw)
    out, rate, bps = decode_flac_int(data)
    assert rate == 16000 and bps == 16
    np.testing.assert_array_equal(out, np.asarray(s, np.int32))
    return data


def test_mono_fixed_predictors_compress():
    s = _sig(6000)
    data = _rt(s, block_size=1024)
    assert len(data) < s.nbytes * 0.75  # the predictors actually engaged


def test_noise_and_constant_and_wasted_bits():
    rng = np.random.default_rng(3)
    _rt(rng.integers(-32768, 32768, 5000).astype(np.int16))
    _rt(np.full(3000, -1234, np.int16))  # CONSTANT subframes
    _rt(np.zeros(1000, np.int16))
    _rt((_sig(3000) & ~7).astype(np.int16))  # 3 wasted bits per sample


@pytest.mark.parametrize("force", ["verbatim", "lpc"])
def test_forced_subframe_types(force):
    _rt(_sig(2048), force_subframe=force, block_size=1024)


@pytest.mark.parametrize("porder", [1, 2, 3])
def test_rice_partitions(porder):
    _rt(_sig(4096), partition_order=porder, block_size=2048)


def test_escape_partitions():
    _rt(_sig(2048), rice_escape=True, block_size=1024)
    _rt(_sig(4096), partition_order=2, rice_escape=True, block_size=1024)


@pytest.mark.parametrize("mode", ["independent", "left-side", "right-side", "mid-side"])
def test_stereo_modes(mode):
    left = _sig(4000)
    right = (left // 2 + np.random.default_rng(5).integers(-50, 50, 4000)).astype(np.int16)
    st = np.stack([left, right], axis=1)
    _rt(st, stereo_mode=mode, block_size=2048)


def test_block_boundaries_and_tiny_inputs():
    rng = np.random.default_rng(9)
    for n in (1, 2, 5, 4095, 4096, 4097):
        _rt(rng.integers(-2000, 2000, n).astype(np.int16))


def test_float_contract_matches_decode_wav():
    s = _sig(1000)
    f, rate = decode_flac(encode_flac(s))
    assert f.dtype == np.float32 and rate == 16000
    np.testing.assert_allclose(f, s.astype(np.float32) / 32768.0, atol=0)


def test_tamper_detection():
    data = bytearray(encode_flac(_sig(2048), block_size=2048))
    with pytest.raises(ValueError):
        decode_flac_int(b"NOPE" + bytes(data[4:]))
    # flip one bit inside the frame payload: CRC-16 or MD5 must catch it
    corrupt = bytearray(data)
    corrupt[-40] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac_int(bytes(corrupt))


def test_window_audio_stage_mixed_wav_flac():
    from epichypersketch_jl_ray.stages.multimodal import WindowAudio, make_mixed_audio_table

    tbl = make_mixed_audio_table(8, seed=17, samples=2048)
    assert set(tbl["mime"].to_pylist()) == {"audio/wav", "audio/flac"}
    out = WindowAudio(window=512)(tbl)
    assert out.num_rows == 8 * (2048 // 512)
    # regenerate the fixture's ground truth and compare decoded windows
    from epichypersketch_jl_ray.functions.codecs import (
        _g711_decode_table,
        _g711_encode,
        _ima_decode_blocks,
        _ima_encode_blocks,
    )

    rng = np.random.default_rng(17)
    t = np.arange(2048)
    for i in range(8):
        sig = (6000 * np.sin(t / (20 + (i % 7) * 9)) + rng.normal(0, 80, 2048)).astype(np.int16)
        if i % 2 == 0 and (i // 2) % 3 == 2:
            # the fixture's mu-law row: ground truth is the companded levels
            sig = _g711_decode_table("mu")[_g711_encode(sig, "mu")]
        elif i % 2 == 0 and (i // 2) % 3 == 1:
            # the fixture's IMA ADPCM row: ground truth is the quantized
            # reconstruction (lossy codec, pinned separately in test_codecs)
            spb = (256 - 4) * 2 + 1
            n_blocks = (2048 + spb - 1) // spb
            padded = np.full(n_blocks * spb, sig[-1], dtype=np.int16)
            padded[:2048] = sig
            blocks = _ima_encode_blocks(padded.reshape(n_blocks, spb))
            sig = _ima_decode_blocks(blocks, spb).reshape(-1)[:2048]
        want = sig.astype(np.float32) / 32768.0
        rows = [r for r in range(out.num_rows) if out["id"][r].as_py() == i]
        got = np.concatenate([np.asarray(out["pixels"][r].as_py(), np.float32) for r in rows])
        np.testing.assert_allclose(got, want, atol=0)
