"""Pure-stdlib/numpy Ogg container (RFC 3533) + the Ogg-FLAC mapping.

Everything here derives from the public specs alone: the Ogg page format
(RFC 3533 — capture pattern, lacing-value packet segmentation, 0x04C11DB7
page CRC) and the xiph.org Ogg-FLAC mapping (BOS packet ``0x7F "FLAC"`` +
version + header-packet count + an embedded native ``fLaC`` header; one FLAC
audio frame per packet thereafter). The FLAC frames themselves decode via
functions/flac.py, so ``audio/ogg`` (Ogg-FLAC) is a REAL decode path; Ogg
streams whose codec is Vorbis/Opus still raise the documented codec seam —
their spec codebooks need external libraries.

Built-in encoder exists so round-trip tests are self-contained, with a
``max_page_segments`` knob small enough to force packets that span pages
(255-lacing continuation), the part of the framing real-world readers get
wrong.
"""

from __future__ import annotations

import struct

import numpy as np

from epichypersketch_jl_ray.functions.flac import decode_flac_int, encode_flac_parts

# RFC 3533 page CRC: poly 0x04C11DB7, init 0, no reflection, no final xor.
_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE[_i] = _r & 0xFFFFFFFF


def _ogg_crc(data: bytes) -> int:
    crc = np.uint32(0)
    tab = _CRC_TABLE
    for b in data:
        crc = np.uint32((int(crc) << 8) & 0xFFFFFFFF) ^ tab[(int(crc) >> 24) ^ b]
    return int(crc)


def _page(
    header_type: int, granule: int, serial: int, seq: int, segments: list[bytes]
) -> bytes:
    # segments arrive pre-laced (each entry is one lacing segment <= 255 B)
    lacing = bytes(len(s) for s in segments)
    body = b"".join(segments)
    head = (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<qIII", granule, serial, seq, 0)
        + bytes([len(segments)])
        + lacing
    )
    crc = _ogg_crc(head + body)
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + body


def _lace(packet: bytes) -> list[bytes]:
    """Split one packet into its lacing segments (all 255 B except a final
    short one; an exact multiple of 255 needs a trailing 0-length segment)."""
    segs = [packet[i : i + 255] for i in range(0, len(packet), 255)]
    if not segs or len(segs[-1]) == 255:
        segs.append(b"")
    return segs


def ogg_encode_packets(
    packets: list[bytes],
    *,
    serial: int = 0x464C4143,
    granules: list[int] | None = None,
    max_page_segments: int = 255,
    first_packet_own_page: bool = True,
) -> bytes:
    """Packets -> Ogg stream. ``granules[i]`` is the granule position to stamp
    on the page where packet i ENDS (RFC 3533 §6: granule of the last packet
    completed on the page; -1 when no packet completes)."""
    if not 1 <= max_page_segments <= 255:
        raise ValueError("max_page_segments must be in [1, 255]")
    # build pages as (segments, granule, starts_mid_packet), then stamp
    # BOS on the first and EOS on the last when emitting
    pages: list[tuple[list[bytes], int, bool]] = []
    cur: list[bytes] = []
    cur_granule = -1
    cur_cont = False  # current page starts inside an unfinished packet

    def close_page(next_cont: bool) -> None:
        nonlocal cur, cur_granule, cur_cont
        pages.append((cur, cur_granule, cur_cont))
        cur, cur_granule, cur_cont = [], -1, next_cont

    for pi, packet in enumerate(packets):
        segs = _lace(packet)
        for si, seg in enumerate(segs):
            if len(cur) == max_page_segments:
                close_page(next_cont=si > 0)
            cur.append(seg)
        if granules is not None:
            cur_granule = granules[pi]
        if first_packet_own_page and pi == 0:
            close_page(next_cont=False)
    if cur or not pages:
        close_page(next_cont=False)

    out = bytearray()
    for seq, (segs, granule, cont) in enumerate(pages):
        ht = (0x02 if seq == 0 else 0) | (0x01 if cont else 0)
        if seq == len(pages) - 1:
            ht |= 0x04  # EOS
        out.extend(_page(ht, granule, serial, seq, segs))
    return bytes(out)


def ogg_decode_packets(payload: bytes | np.ndarray) -> list[bytes]:
    """Ogg stream -> packets (single logical stream; CRC-verified pages)."""
    raw = payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload)
    pos = 0
    serial = None
    packets: list[bytes] = []
    partial = bytearray()
    open_packet = False
    while pos < len(raw):
        if raw[pos : pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if raw[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        header_type = raw[pos + 5]
        _granule, page_serial, _seq, crc = struct.unpack("<qIII", raw[pos + 6 : pos + 26])
        n_segs = raw[pos + 26]
        lacing = raw[pos + 27 : pos + 27 + n_segs]
        if len(lacing) != n_segs:
            raise ValueError("truncated Ogg page header")
        body_start = pos + 27 + n_segs
        body_len = sum(lacing)
        body = raw[body_start : body_start + body_len]
        if len(body) != body_len:
            raise ValueError("truncated Ogg page body")
        page = bytearray(raw[pos : body_start + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        if serial is None:
            if not header_type & 0x02:
                raise ValueError("first Ogg page is not BOS")
            serial = page_serial
        elif page_serial != serial:
            raise ValueError("multiplexed Ogg streams are not supported")
        if header_type & 0x01:
            if not open_packet:
                raise ValueError("continuation page without an open packet")
        elif open_packet:
            raise ValueError("packet left open but page is not a continuation")
        off = 0
        for li, lace in enumerate(lacing):
            partial += body[off : off + lace]
            off += lace
            if lace < 255:
                packets.append(bytes(partial))
                partial = bytearray()
                open_packet = False
            else:
                open_packet = True
        pos = body_start + body_len
        if header_type & 0x04:
            break
    if open_packet:
        raise ValueError("Ogg stream ended mid-packet")
    return packets


# --- Ogg-FLAC mapping -------------------------------------------------------


def encode_ogg_flac(
    samples: np.ndarray,
    *,
    sample_rate: int = 16000,
    block_size: int = 4096,
    max_page_segments: int = 255,
    serial: int = 0x464C4143,
    **flac_kwargs,
) -> bytes:
    """int16 samples -> Ogg-FLAC bytes (xiph mapping: BOS packet = 0x7F
    "FLAC" v1.0 + big-endian header count + native fLaC header; one
    VORBIS_COMMENT header packet; one FLAC frame per audio packet)."""
    header, frames = encode_flac_parts(
        samples, sample_rate=sample_rate, block_size=block_size, **flac_kwargs
    )
    # header = b"fLaC" + STREAMINFO block with the last-metadata flag SET;
    # the mapping wants it CLEAR here because a comment packet follows
    streaminfo = bytearray(header[4:])
    streaminfo[0] &= 0x7F
    bos = b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + b"fLaC" + bytes(streaminfo)
    vendor = b"epichypersketch_jl_ray"
    comment_body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    comment = bytes([0x84]) + struct.pack(">I", len(comment_body))[1:] + comment_body
    packets = [bos, comment, *frames]
    n = np.asarray(samples).shape[0]
    granules = [0, 0]
    done = 0
    for f in frames:
        done = min(done + block_size, n)
        granules.append(done)
    return ogg_encode_packets(
        packets, serial=serial, granules=granules, max_page_segments=max_page_segments
    )


def decode_ogg_flac_int(payload: bytes | np.ndarray) -> tuple[np.ndarray, int, int]:
    """Ogg-FLAC bytes -> (int32 samples, rate, bps); CRC/MD5-verified via the
    native FLAC decoder. Raises the codec seam for non-FLAC Ogg streams."""
    packets = ogg_decode_packets(payload)
    if not packets:
        raise ValueError("empty Ogg stream")
    bos = packets[0]
    if len(bos) >= 7 and bos[:1] == b"\x01" and bos[1:7] == b"vorbis":
        raise NotImplementedError(
            "Ogg-Vorbis needs libvorbis (spec codebooks are not reproducible here); "
            "only Ogg-FLAC decodes natively"
        )
    if len(bos) >= 9 and bos[:8] == b"OpusHead":
        raise NotImplementedError("Ogg-Opus needs libopus; only Ogg-FLAC decodes natively")
    if len(bos) < 13 or bos[0] != 0x7F or bos[1:5] != b"FLAC":
        raise ValueError("not an Ogg-FLAC stream")
    if bos[5] != 1:
        raise ValueError(f"unsupported Ogg-FLAC mapping version {bos[5]}.{bos[6]}")
    (n_headers,) = struct.unpack(">H", bos[7:9])
    if bos[9:13] != b"fLaC":
        raise ValueError("Ogg-FLAC BOS packet missing fLaC signature")
    streaminfo = bytearray(bos[13:])
    if not streaminfo:
        raise ValueError("Ogg-FLAC BOS packet missing STREAMINFO")
    # force the last-metadata flag so the native decoder jumps to frames;
    # skip the n_headers metadata packets that follow (0 = unknown count:
    # then skip packets that parse as metadata blocks, i.e. until one starts
    # with the 0x3FFE frame sync)
    streaminfo[0] |= 0x80
    audio_from = 1 + n_headers
    if n_headers == 0:
        audio_from = 1
        while audio_from < len(packets):
            p = packets[audio_from]
            if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xFC) == 0xF8:
                break
            audio_from += 1
    native = b"fLaC" + bytes(streaminfo) + b"".join(packets[audio_from:])
    return decode_flac_int(native)


def decode_ogg_flac(payload: bytes | np.ndarray) -> tuple[np.ndarray, int]:
    """Ogg-FLAC bytes -> (float32 samples in [-1, 1), sample rate)."""
    samples, rate, bps = decode_ogg_flac_int(payload)
    return (samples.astype(np.float32) / float(1 << (bps - 1))), rate
