"""Baseline JPEG (ITU-T T.81) codec in pure NumPy + stdlib.

The sandbox has no PIL/libjpeg, but baseline sequential JPEG needs nothing
beyond what NumPy provides: an 8×8 DCT (one matrix multiply), the Annex-K
quantization/Huffman tables, and a bit-packer with 0xFF byte stuffing. This
module implements both directions so the multimodal decode path
(``binary_ops.decode_image(impl='real')``) is real for the single most
common training-corpus image format:

- ``encode_jpeg``: 8-bit gray or RGB → baseline JFIF bytes. Quality scaling
  uses the public IJG formula; 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling and
  optional restart intervals are supported so the decoder's MCU/RST paths
  are honestly exercisable in tests.
- ``decode_jpeg``: baseline (SOF0/SOF1) interleaved-scan JFIF bytes →
  ``(h, w, c) uint8``. Reads quant + Huffman tables from the file, handles
  fill bytes, byte stuffing, restart markers, and integer chroma
  upsampling. Progressive (SOF2), arithmetic coding, 12-bit precision, and
  multi-scan baseline raise ``NotImplementedError`` — the plug point stays
  honest for the rare variants.

Everything is pure functions over ``bytes``/``ndarray``; Spark integration
(Arrow batching, schemas) lives in ``binary_ops``. Spec: ITU-T T.81 —
zigzag Fig. 5, DCT §A.3.3, entropy coding §F.1.2, Annex C (canonical
Huffman code generation), Annex K (example tables).
"""

from __future__ import annotations

import struct

import numpy as np

# -- spec constants -----------------------------------------------------------

# zigzag scan: _ZZ[k] = raster index (row*8+col) of the k-th zigzag element.
# Generated from the diagonal rule (T.81 Fig. 5): odd anti-diagonals run
# top-right → bottom-left, even ones bottom-left → top-right; the literal
# spec table is asserted equal in tests/test_jpeg.py.


def _zigzag_order() -> np.ndarray:
    out = []
    for d in range(15):
        rows = range(max(0, d - 7), min(7, d) + 1)
        if d % 2 == 0:
            rows = reversed(list(rows))
        out.extend(r * 8 + (d - r) for r in rows)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag_order()

# Annex K.1 example quantization tables (raster order).
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL). Any consistent
# table round-trips (the decoder reads DHT from the file); these are the
# interop-standard ones every camera/libjpeg file uses.
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_SUBSAMPLING = {
    "4:4:4": [(1, 1), (1, 1), (1, 1)],
    "4:2:2": [(2, 1), (1, 1), (1, 1)],
    "4:2:0": [(2, 2), (1, 1), (1, 1)],
}


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C; T.81's FDCT is C @ B @ C.T."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_C = _dct_matrix()


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables → (lum, chrom) raster 8×8,
    each entry clipped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for tbl in (_Q_LUM, _Q_CHROM):
        t = (tbl * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# -- canonical Huffman (T.81 Annex C) ----------------------------------------


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) → {symbol: (code, length)}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    return {(ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()}


# -- bit I/O ------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF→0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def pad(self) -> None:
        """Fill to a byte boundary with 1-bits (T.81 §F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)

    def marker(self, code: int) -> None:
        self.pad()
        self.buf += bytes([0xFF, code])


class _BitReader:
    """MSB-first reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted mid-scan")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def receive_extend(self, size: int) -> int:
        """T.81 §F.2.2.1 EXTEND: size-bit magnitude → signed value."""
        if size == 0:
            return 0
        v = self.read(size)
        return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _magnitude_size(v: int) -> int:
    return int(abs(v)).bit_length()


# -- encoder ------------------------------------------------------------------


def _box_downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average downsample by (fh, fv), edge-replicating odd tails."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    ph, pw = (-h) % fv, (-w) % fh
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h2, w2 = plane.shape
    return plane.reshape(h2 // fv, fv, w2 // fh, fh).mean(axis=(1, 3))


def _plane_to_zz(plane: np.ndarray, q_raster: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Level-shift, pad to the (gh, gw) block grid, FDCT + quantize every
    block in one vectorized pass → (gh, gw, 64) int32 zigzag coefficients."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, gh * 8 - h), (0, gw * 8 - w)), mode="edge")
    blocks = plane.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    coefs = np.einsum("ij,abjk,lk->abil", _C, blocks, _C)
    quant = np.round(coefs / q_raster[None, None]).astype(np.int32)
    # standard AC Huffman tables stop at magnitude size 10; a quantized AC
    # coefficient can only exceed ±1023 at quality 100 on an adversarial
    # checkerboard — clamp like practical encoders do
    flat = quant.reshape(gh, gw, 64)
    np.clip(flat[:, :, 1:], -1023, 1023, out=flat[:, :, 1:])
    return flat[:, :, _ZZ]


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _magnitude_size(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:  # ZRL
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        size = _magnitude_size(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:  # EOB
        code, ln = ac_tab[0x00]
        bw.write(code, ln)
    return dc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) / (h, w, 1) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"encode_jpeg expects 1 or 3 channels, got {c}")
    q_lum, q_chrom = quant_tables(quality)

    if c == 1:
        samp = [(1, 1)]
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        if subsampling not in _SUBSAMPLING:
            raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
        samp = _SUBSAMPLING[subsampling]
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        planes = [
            y,
            _box_downsample(cb, hmax // samp[1][0], vmax // samp[1][1]),
            _box_downsample(cr, hmax // samp[2][0], vmax // samp[2][1]),
        ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qmap = [0] + [1] * (len(samp) - 1)  # component → quant/huffman table id
    qtbls = [q_lum, q_chrom]
    zz_blocks = [
        _plane_to_zz(planes[ci], qtbls[qmap[ci]], mcus_y * vi, mcus_x * hi)
        for ci, (hi, vi) in enumerate(samp)
    ]

    enc_tabs = [
        (_huff_encode_table(*_DC_LUM), _huff_encode_table(*_AC_LUM)),
        (_huff_encode_table(*_DC_CHROM), _huff_encode_table(*_AC_CHROM)),
    ]
    bw = _BitWriter()
    preds = [0] * len(samp)
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.marker(0xD0 + (rst % 8))
                rst += 1
                preds = [0] * len(samp)
            for ci, (hi, vi) in enumerate(samp):
                dc_tab, ac_tab = enc_tabs[qmap[ci]]
                for by in range(vi):
                    for bx in range(hi):
                        preds[ci] = _encode_block(
                            bw, zz_blocks[ci][my * vi + by, mx * hi + bx],
                            preds[ci], dc_tab, ac_tab,
                        )
            mcu_i += 1
    bw.pad()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"  # APP0
    ntab = 1 if c == 1 else 2
    for tid in range(ntab):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qtbls[tid].reshape(-1)[_ZZ])
    sof = struct.pack(">BHHB", 8, h, w, len(samp))
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, qmap[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    huff_specs = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if c == 3:
        huff_specs += [(0, 1, _DC_CHROM), (1, 1, _AC_CHROM)]
    for tclass, tid, (bits, vals) in huff_specs:
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(samp)])
    for ci in range(len(samp)):
        sos += bytes([ci + 1, (qmap[ci] << 4) | qmap[ci]])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah=Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


def _split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded segment starting at ``pos``; split at RSTn
    markers. Returns (segments, position of the terminating marker's 0xFF)."""
    segs: list[bytearray] = [bytearray()]
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            segs[-1].append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            segs[-1].append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytearray())
            pos += 2
        else:
            break
    return [bytes(s) for s in segs], pos


def _decode_block(
    br: _BitReader,
    pred: int,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block → (64,) int32 zigzag coefficients + new DC."""
    zz = np.zeros(64, dtype=np.int32)
    dc = pred + br.receive_extend(br.read_huff(dc_tab))
    zz[0] = dc
    k = 1
    while k < 64:
        rs = br.read_huff(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        zz[k] = br.receive_extend(size)
        k += 1
    return zz, dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, c) uint8 (c = 1 gray / 3 RGB)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}  # id → (64,) zigzag-order int
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, qid)])
    scan = None  # [(comp_id, dc_id, ac_id)]
    restart = 0
    segments: list[bytes] = []
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        code = payload[pos]
        pos += 1
        if code in (0xD8, 0x01) or 0xD0 <= code <= 0xD7:
            continue
        if code == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if code == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                qtabs[tq] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp).astype(
                    np.int64
                )
                sp += 64
        elif code in (0xC0, 0xC1):  # SOF0 / SOF1 (both Huffman sequential)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (fh, fw, comps)
        elif code in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{code:02X} (progressive/arithmetic/lossless) "
                "unsupported — baseline sequential only"
            )
        elif code == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                sp += 17 + nv
        elif code == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif code == 0xDA:  # SOS
            ns = seg[0]
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if ns != len(frame[2]):
                raise NotImplementedError("multi-scan baseline JPEG unsupported")
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            segments, pos = _split_entropy(payload, pos)
        # APPn / COM / anything else: skipped

    if frame is None or scan is None or not segments:
        raise ValueError("JPEG missing SOF/SOS/entropy data")
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    by_id = {cid: (hi, vi, qid) for cid, hi, vi, qid in comps}
    order = []  # (comp index, hi, vi, dc table, ac table, qtbl zigzag)
    grids = []
    for ci, (cid, dc_id, ac_id) in enumerate(scan):
        hi, vi, qid = by_id[cid]
        order.append((ci, hi, vi, htabs[(0, dc_id)], htabs[(1, ac_id)], qtabs[qid]))
        grids.append(np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32))

    seg_i = 0
    br = _BitReader(segments[0])
    preds = [0] * len(scan)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("JPEG missing expected restart segment")
                br = _BitReader(segments[seg_i])
                preds = [0] * len(scan)
            for ci, hi, vi, dc_tab, ac_tab, _q in order:
                for by in range(vi):
                    for bx in range(hi):
                        zz, preds[ci] = _decode_block(br, preds[ci], dc_tab, ac_tab)
                        grids[ci][my * vi + by, mx * hi + bx] = zz
            mcu_i += 1

    planes = []
    for ci, hi, vi, _dc, _ac, q_zz in order:
        gh, gw = grids[ci].shape[:2]
        dq = grids[ci].astype(np.float64) * q_zz[None, None].astype(np.float64)
        raster = np.empty_like(dq)
        raster[:, :, _ZZ] = dq  # inverse zigzag
        blocks = raster.reshape(gh, gw, 8, 8)
        pix = np.einsum("ji,abjk,kl->abil", _C, blocks, _C) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        ch = -(-fh * vi // vmax)
        cw = -(-fw * hi // hmax)
        plane = plane[:ch, :cw]
        if hi != hmax or vi != vmax:
            if hmax % hi or vmax % vi:
                raise NotImplementedError("non-integer JPEG chroma upsampling ratio")
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
