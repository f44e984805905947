"""Pure-NumPy codecs for uncompressed media containers.

The sandbox has no PIL/libjpeg/ffmpeg, but that only rules out codecs with
non-trivial entropy coding. Uncompressed containers — BMP (24-bit), PGM/PPM
(binary P5/P6), WAV (PCM16 RIFF) — are byte-layout specs that NumPy reads
directly, PNG is DEFLATE (stdlib ``zlib``) plus a per-scanline byte
filter, and baseline JPEG is an 8×8 DCT plus canonical Huffman coding
(see ``jpeg``), so the decode step of the multimodal pipeline is real for
every common still-image training-corpus format and only falls back to a
declared plug-point for video (H.264) and exotic variants.

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


# -- PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced) -------------
#
# PNG is DEFLATE (stdlib zlib) inside a chunked container plus a per-scanline
# byte filter — no external codec needed. Spec: RFC 2083 / W3C PNG (IHDR
# layout §11.2.2, filter types 0-4 §9, chunk CRC §5.3).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples per pixel
_PNG_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color_type


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, c: int) -> np.ndarray:
    """Forward filter one scanline (encode side). row/prev: (w*c,) uint8."""
    if ftype == 0:
        return row
    left = np.zeros_like(row)
    left[c:] = row[:-c]
    if ftype == 1:
        return row - left
    if ftype == 2:
        return row - prev
    if ftype == 3:
        return row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
    if ftype == 4:
        ul = np.zeros_like(prev)
        ul[c:] = prev[:-c]
        return row - _paeth(left, prev, ul)
    raise ValueError(f"bad PNG filter type {ftype}")


def _paeth(a: np.ndarray, b: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (all uint8 inputs)."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, cc))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filters: list[int] | int = 0) -> bytes:
    """(h, w) or (h, w, c) uint8 (c in 1/2/3/4) → PNG bytes. ``filters``
    picks the per-scanline filter type (int for all rows, or one per row) —
    type 0 everywhere is always valid; other types exist so tests can
    exercise every reconstruction path in :func:`decode_png`."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _PNG_COLOR_TYPE:
        raise ValueError(f"encode_png expects 1/2/3/4 channels, got {c}")
    ftypes = [filters] * h if isinstance(filters, int) else list(filters)
    if len(ftypes) != h:
        raise ValueError("one filter per scanline required")
    flat = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * c)
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for y in range(h):
        lines.append(bytes([ftypes[y]]) + _png_filter_row(ftypes[y], flat[y], prev, c).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_TYPE[c], 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8. Supports the common web/still formats:
    8-bit depth, gray / gray+alpha / RGB / RGBA, non-interlaced. Palette,
    16-bit, and Adam7 interlacing raise (rare in training corpora; plug
    point stays honest)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + data + crc
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = meta
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, interlace={interlace}) — "
            "8-bit non-interlaced only"
        )
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type} (palette?) unsupported")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: uint8 cumulative sum per channel phase (mod 256)
            rec = line.reshape(w, c)
            rec = np.add.accumulate(rec, axis=0, dtype=np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 3:  # Average: left-dependency → per-pixel scan
            rec = line
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                rec[x] = (int(rec[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth: left/upper-left dependency → per-pixel scan
            rec = line
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (int(rec[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = out[y]
    return out.reshape(h, w, c)


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
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        from . import jpeg

        return jpeg.decode_jpeg(payload)
    raise NotImplementedError(
        f"image codec ({kind}) unsupported — BMP/PGM/PPM/PNG/baseline-JPEG "
        "decode natively here; plug exotic codecs in at this point"
    )
