"""Pure stdlib/numpy video containers: MJPEG-in-AVI and YUV4MPEG2 (Y4M).

- **AVI (RIFF) with MJPG streams**: every frame is a standalone JPEG, so
  the table-driven JPEG codec in functions/codecs.py does the pixel work
  and this module only walks the container (LIST hdrl/strl headers, LIST
  movi frame chunks, idx1 index). Frames must carry their Huffman tables
  (DHT) — which this repo's encoder and most real MJPEG writers emit; the
  minority "DHT-less" MJPEG variant needs the Annex K default tables from
  a codec library and raises NotImplementedError instead of mis-decoding.
- **Y4M**: the plain-text-header raw-YUV interchange format
  (``YUV4MPEG2 W.. H.. F.. C..\\n`` then ``FRAME\\n`` + planar payload).
  Cmono round-trips gray bit-exact; C444/C420jpeg convert through the
  same full-range BT.601 math as the JPEG codec (±1 LSB rounding; C420
  additionally 2x2 chroma subsampling).

H.264/VP9 stay honest NotImplementedError seams in stages/multimodal.py —
an entropy-coded motion-compensated codec genuinely needs pyav/ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np

from epichypersketch_jl_ray.functions.codecs import decode_jpeg, encode_jpeg_baseline


# ---------------------------------------------------------------------------
# AVI / MJPEG
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames: np.ndarray, *, fps: int = 25, quality: int = 95
) -> bytes:
    """uint8 (n, h, w) gray or (n, h, w, 3) RGB frames -> MJPEG AVI bytes."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim not in (3, 4) or (f.ndim == 4 and f.shape[3] != 3):
        raise ValueError("expected (n, h, w) or (n, h, w, 3) uint8 frames")
    n, h, w = f.shape[:3]
    jpegs = [encode_jpeg_baseline(fr, quality=quality) for fr in f]
    bufsize = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<IIIIIIIIII16x",
        1_000_000 // fps, bufsize * fps, 0, 0x10, n, 0, 1, bufsize, w, h,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, bufsize,
        0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_chunks = []
    offsets = []
    pos = 4  # offsets are relative to the 'movi' fourcc
    for j in jpegs:
        offsets.append(pos)
        ck = _chunk(b"00dc", j)
        movi_chunks.append(ck)
        pos += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(j))
            for off, j in zip(offsets, jpegs)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_riff(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi_mjpeg(payload: bytes | np.ndarray) -> np.ndarray:
    """MJPEG AVI bytes -> uint8 (n, h, w) gray or (n, h, w, 3) RGB frame
    stack (gray when every decoded frame is single-channel)."""
    raw = payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload)
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') file")
    frames: list[np.ndarray] = []

    def scan(pos: int, end: int) -> None:
        for fourcc, body, size in _iter_riff(raw, pos, end):
            if fourcc == b"LIST":
                scan(body + 4, body + size)  # recurse past the list type
            elif fourcc[2:4] in (b"dc", b"db"):
                blob = raw[body : body + size]
                if not blob:
                    continue
                sos = blob.find(b"\xff\xda")
                if b"\xff\xc4" not in blob[: sos if sos >= 0 else len(blob)]:
                    raise NotImplementedError(
                        "MJPEG frame without embedded Huffman tables (DHT): the "
                        "Annex K default tables need a codec library"
                    )
                frames.append(decode_jpeg(np.frombuffer(blob, np.uint8)))

    scan(12, len(raw))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    shapes = {fr.shape for fr in frames}
    if len(shapes) != 1:
        raise ValueError(f"inconsistent MJPEG frame shapes {shapes}")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], -1)), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


def encode_y4m(
    frames: np.ndarray, *, fps: tuple[int, int] = (25, 1), chroma: str | None = None
) -> bytes:
    """uint8 (n, h, w) gray -> Cmono Y4M; (n, h, w, 3) RGB -> C444 (default)
    or C420jpeg (2x2-mean chroma subsampling) Y4M."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        cspace = "mono"
    elif f.ndim == 4 and f.shape[3] == 3:
        cspace = chroma or "444"
        if cspace not in ("444", "420jpeg"):
            raise ValueError("chroma must be '444' or '420jpeg'")
    else:
        raise ValueError("expected (n, h, w) or (n, h, w, 3) uint8 frames")
    n, h, w = f.shape[:3]
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cspace}\n".encode())
    for fr in f:
        out += b"FRAME\n"
        if cspace == "mono":
            out += fr.tobytes()
        else:
            ycc = _rgb_to_ycbcr(fr)
            out += ycc[..., 0].tobytes()
            if cspace == "444":
                out += ycc[..., 1].tobytes()
                out += ycc[..., 2].tobytes()
            else:
                for c in (1, 2):
                    plane = ycc[..., c].astype(np.uint16)
                    sub = (
                        plane[0::2, 0::2] + plane[1::2, 0::2]
                        + plane[0::2, 1::2] + plane[1::2, 1::2] + 2
                    ) >> 2
                    out += sub.astype(np.uint8).tobytes()
    return bytes(out)


def decode_y4m(payload: bytes | np.ndarray) -> np.ndarray:
    """Y4M bytes -> uint8 (n, h, w) gray (Cmono) or (n, h, w, 3) RGB
    (C444 / C420jpeg / C420 / C420mpeg2; chroma upsampled nearest)."""
    raw = payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload)
    eol = raw.find(b"\n")
    if eol < 0 or not raw.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    cspace = "420jpeg"  # the format's default when no C tag is present
    for token in raw[10:eol].decode("latin-1").split():
        if token[0] == "W":
            w = int(token[1:])
        elif token[0] == "H":
            h = int(token[1:])
        elif token[0] == "C":
            cspace = token[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cspace == "mono":
        plane_sizes = [(h, w)]
    elif cspace == "444":
        plane_sizes = [(h, w)] * 3
    elif cspace.startswith("420"):
        if h % 2 or w % 2:
            raise ValueError("C420 needs even dimensions")
        plane_sizes = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    else:
        raise NotImplementedError(f"Y4M colorspace C{cspace} not supported")
    frame_bytes = sum(ph * pw for ph, pw in plane_sizes)
    pos = eol + 1
    frames: list[np.ndarray] = []
    while pos < len(raw):
        feol = raw.find(b"\n", pos)
        if feol < 0 or not raw.startswith(b"FRAME", pos):
            raise ValueError("bad Y4M FRAME header")
        pos = feol + 1
        if pos + frame_bytes > len(raw):
            raise ValueError("truncated Y4M frame")
        planes = []
        for ph, pw in plane_sizes:
            planes.append(
                np.frombuffer(raw, np.uint8, ph * pw, pos).reshape(ph, pw)
            )
            pos += ph * pw
        if cspace == "mono":
            frames.append(planes[0])
        else:
            y, cb, cr = planes
            if cspace.startswith("420"):
                cb = cb.repeat(2, 0).repeat(2, 1)
                cr = cr.repeat(2, 0).repeat(2, 1)
            frames.append(_ycbcr_to_rgb(np.stack([y, cb, cr], -1)))
    return np.stack(frames)
