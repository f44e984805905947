"""Pure-NumPy codecs for uncompressed media containers.

The sandbox has no PIL/libjpeg/ffmpeg, but that only rules out *compressed*
codecs. Uncompressed containers — BMP (24-bit), PGM/PPM (binary P5/P6),
WAV (PCM16 RIFF) — are byte-layout specs that NumPy reads directly, so the
decode step of the multimodal pipeline is real for those formats and only
falls back to a declared plug-point for JPEG/PNG/H.264.

Everything here is driver/executor-agnostic pure functions over ``bytes``;
the Spark integration (Arrow batching, schemas, partitioning) lives in
``binary_ops``.

Format references: BMPINFOHEADER layout (Windows GDI docs), Netpbm P5/P6
spec, RIFF/WAVE PCM chunk layout (multimedia programming interface spec).
"""

from __future__ import annotations

import struct

import numpy as np

# -- sniffing ---------------------------------------------------------------


def sniff(payload: bytes) -> str:
    """Identify a payload by magic bytes: 'bmp' | 'pgm' | 'ppm' | 'wav'
    | 'jpeg' | 'png' | 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


# -- BMP (24-bit uncompressed, bottom-up) -----------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects 3 channels")
    row = w * 3
    pad = (4 - row % 4) % 4
    body_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + body_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_size, 2835, 2835, 0, 0)
    # bottom-up rows, BGR order, each padded to a 4-byte boundary
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row + pad), dtype=np.uint8)
    rows[:, :row] = bgr.reshape(h, row)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


# -- Netpbm P5 (gray) / P6 (RGB), binary -----------------------------------


def encode_pnm(img: np.ndarray) -> bytes:
    """(h, w) uint8 → P5, (h, w, 3) uint8 → P6."""
    if img.ndim == 2:
        magic, payload = b"P5", img
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, payload = b"P6", img
    else:
        raise ValueError("encode_pnm expects (h,w) or (h,w,3) uint8")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + payload.tobytes()


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary P5/P6 → (h, w) or (h, w, 3) uint8."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    # header: magic, whitespace/comment-separated width height maxval, then
    # exactly one whitespace byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    c = 3 if magic == b"P6" else 1
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=pos)
    return raw.reshape(h, w, 3) if c == 3 else raw.reshape(h, w)


# -- WAV (RIFF, PCM16) ------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 PCM → RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    body = s.tobytes()  # interleaved frames
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → ((n, channels) int16, sample_rate).
    Walks the chunk list, so extra chunks (LIST/INFO…) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, ch), rate


# -- dispatch ---------------------------------------------------------------


def decode_image_payload(payload: bytes) -> np.ndarray:
    """Decode any supported still-image container → (h, w, c) uint8.
    Compressed formats raise at the declared plug-point."""
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind in ("pgm", "ppm"):
        img = decode_pnm(payload)
        return img[:, :, None] if img.ndim == 2 else img
    raise NotImplementedError(
        f"compressed image codec ({kind}) requires PIL/libjpeg — not in this "
        "container; plug the codec in here"
    )
