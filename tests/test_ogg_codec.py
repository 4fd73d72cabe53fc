"""Ogg container (RFC 3533) + Ogg-FLAC mapping (functions/ogg.py):
bit-exact round trips incl. packets spanning pages, CRC tamper detection,
non-FLAC codec seams, and the WindowAudio stage dispatch. No external
files — the built-in encoder makes every case self-contained."""

from __future__ import annotations

import numpy as np
import pytest

from epichypersketch_jl_ray.functions.ogg import (
    decode_ogg_flac,
    decode_ogg_flac_int,
    encode_ogg_flac,
    ogg_decode_packets,
    ogg_encode_packets,
)


def test_container_roundtrip_lacing_edges():
    # empty packet, exact-255 multiple (needs trailing 0 lacing), spans
    pkts = [b"a" * 10, b"b" * 255, b"c" * 1000, b"", b"d" * 510, b"e" * 3]
    for mps in (255, 4, 1):
        blob = ogg_encode_packets(pkts, granules=list(range(len(pkts))), max_page_segments=mps)
        assert ogg_decode_packets(blob) == pkts, mps


def test_ogg_flac_roundtrip_mono_stereo_small_pages():
    rng = np.random.default_rng(3)
    for shape in [(4000,), (4000, 2)]:
        s = rng.integers(-3000, 3000, shape).astype(np.int16)
        for mps in (255, 3):
            out, rate, bps = decode_ogg_flac_int(
                encode_ogg_flac(s, block_size=512, max_page_segments=mps)
            )
            assert rate == 16000 and bps == 16
            np.testing.assert_array_equal(out, s.astype(np.int32))


def test_ogg_flac_float_matches_native_flac():
    from epichypersketch_jl_ray.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(9)
    s = rng.integers(-8000, 8000, 3000).astype(np.int16)
    f_ogg, r_ogg = decode_ogg_flac(encode_ogg_flac(s, block_size=1024))
    f_nat, r_nat = decode_flac(encode_flac(s, block_size=1024))
    assert r_ogg == r_nat
    np.testing.assert_array_equal(f_ogg, f_nat)


def test_crc_tamper_and_truncation_detected():
    s = np.arange(500, dtype=np.int16)
    blob = bytearray(encode_ogg_flac(s, block_size=128))
    blob[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg_flac_int(bytes(blob))
    with pytest.raises(ValueError):
        ogg_decode_packets(bytes(encode_ogg_flac(s, block_size=128))[:-10])


def test_non_flac_codecs_raise_the_seam():
    vorbis_bos = b"\x01vorbis" + b"\x00" * 23
    with pytest.raises(NotImplementedError, match="Vorbis"):
        decode_ogg_flac_int(ogg_encode_packets([vorbis_bos]))
    opus_bos = b"OpusHead" + b"\x01" * 11
    with pytest.raises(NotImplementedError, match="Opus"):
        decode_ogg_flac_int(ogg_encode_packets([opus_bos]))
    with pytest.raises(ValueError, match="not an Ogg-FLAC"):
        decode_ogg_flac_int(ogg_encode_packets([b"junk junk junk"]))


def test_multiplexed_streams_rejected_but_chained_tail_ignored():
    # interleaved serials BEFORE EOS = multiplexing -> rejected
    a = ogg_encode_packets([b"x" * 300], serial=1, max_page_segments=1)
    b = ogg_encode_packets([b"y" * 10], serial=2)
    first_page_len = 27 + 1 + 255  # header + 1 lacing byte + 255-byte segment
    with pytest.raises(ValueError, match="multiplexed"):
        ogg_decode_packets(a[:first_page_len] + b + a[first_page_len:])
    # a SECOND stream after EOS is a legal chained stream; the decoder
    # returns the first logical stream's packets
    assert ogg_decode_packets(a + b) == [b"x" * 300]


def test_window_audio_stage_decodes_ogg_rows():
    from epichypersketch_jl_ray.functions.flac import decode_flac
    from epichypersketch_jl_ray.stages.multimodal import WindowAudio, make_mixed_audio_table

    tbl = make_mixed_audio_table(12, seed=17, samples=2048)
    mimes = tbl["mime"].to_pylist()
    assert "audio/ogg" in mimes  # row 9: variant 4 of the FLAC branch
    out = WindowAudio(window=512)(tbl)
    assert out.num_rows == 12 * (2048 // 512)
    # the ogg row's decoded windows must equal the signal it encodes
    i = mimes.index("audio/ogg")
    payload = tbl["payload"][i].as_py()
    want, _rate = decode_ogg_flac(payload)
    rows = [r for r in range(out.num_rows) if out["id"][r].as_py() == i]
    got = np.concatenate([np.asarray(out["pixels"][r].as_py(), np.float32) for r in rows])
    np.testing.assert_array_equal(got, want[: len(got)])
