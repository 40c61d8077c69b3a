"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib — no PIL.

Closes the last honest ``NotImplementedError`` in the media tier
(VERDICT r03 "What's missing" #4 left JPEG as the stub): a real baseline
sequential DCT encoder/decoder — Huffman entropy coding, the Annex K
quantization/Huffman tables, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling,
restart markers, and a float IDCT — sufficient for the common baseline
JFIF files a training-data pipeline actually meets. Progressive (SOF2),
arithmetic coding, and 12-bit precision are rejected with clear errors.

Reference parity note: the reference has no media decode at all — this is
§2C north-star surface (the Spark-side plumbing it feeds is
``binary_ops.image_stats`` / ``extract_features``).

Determinism contract (what the SQL oracle checks): JPEG is lossy, but a
flat 8×8 tile is reconstructed *exactly* up to DC quantization —
``v' = floor(floor(8·(v-128)/q₀ + ½)·q₀/8 + ½) + 128`` with q₀ the
quality-scaled DC quantum — because every AC coefficient of a flat block
is 0 and the chroma of a gray pixel is exactly 128 through both color
transforms. ``multimodal_jpeg_stats`` builds images from flat gray tiles
so the whole pipeline (color transform, subsampling, DCT, quantization,
zigzag, Huffman, MCU interleave, restart handling, upsampling) is
hash-checked cross-engine; general-content accuracy is pinned in pytest
(round-trip PSNR gates).

All rounding is floor(x + ½) (half-up, matching SQL FLOOR arithmetic);
the decoder's final rounding adds a 1e-7 epsilon so float IDCT noise
(~1e-13) cannot flip an exact .5 boundary the oracle computes exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (ITU-T T.81 Annex K) -----------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# (bits[1..16], values) per Annex K; embedded in the stream via DHT, so the
# decoder always reads tables from the file rather than assuming these.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
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
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
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
]


def _zigzag() -> np.ndarray:
    """Linear (row-major) index of each zigzag position, generated from
    the diagonal-walk definition rather than hand-typed."""
    cells = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )
    return np.array([r * 8 + c for r, c in cells], dtype=np.int64)


ZIGZAG = _zigzag()  # zigzag position -> linear index
UNZIGZAG = np.argsort(ZIGZAG)  # linear index -> zigzag position


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: forward 2-D DCT = A·X·Aᵀ."""
    k = np.arange(8)
    A = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    A[0, :] = 1.0 / np.sqrt(8.0)
    return A


_DCT = _dct_matrix()


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base quantization table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    # +1e-7: absorbs float DCT noise at exact .5 boundaries (module doc).
    return np.floor(x + 0.5 + 1e-7)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for MSB-first sequential decode."""
    return {(ln, c): s for s, (c, ln) in _build_huffman_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - (self._n % 8)  # T.81 F.1.2.3: pad final byte with 1-bits
            self.write((1 << pad) - 1, pad)
        self._acc, self._n = 0, 0


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs 0xFF00
    and stops (raises _MarkerHit) at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded data")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data" if nxt is not None
                        else "truncated entropy-coded data"
                    )
            else:
                self.pos += 1
            self._acc, self._n = b, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self._n = 0

    def expect_restart(self, which: int) -> None:
        """Consume an RSTn marker at a restart boundary."""
        self.byte_align()
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (which % 8):
            raise ValueError(f"expected RST{which % 8}, got 0xFF{m:02X}")
        self.pos += 2


def _decode_huffman(reader: _BitReader, lookup: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, extra-bits payload)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _extend(bits: int, s: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# --- color transforms (JFIF) -------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------------

_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a padded plane -> quantized coefficient array of
    shape (by, bx, 64) in zigzag order. Vectorized: one einsum per plane."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ij,byjk,lk->byil", _DCT, blocks, _DCT)
    q = _round_half_up(coef / qtab).astype(np.int64)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def encode_jpeg(
    pixels,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder: 8-bit RGB (h, w, 3) -> JPEG bytes.

    Annex K tables scaled by ``quality``; ``subsampling`` ∈ {'444', '422',
    '420'}; ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (exercises the decoder's restart path)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encoder expects 8-bit RGB of shape (h, w, 3)")
    h, w = px.shape[:2]
    hmax, vmax = _SUBSAMPLING[subsampling]
    qy = quality_scale(QUANT_LUMA, quality).reshape(8, 8)
    qc = quality_scale(QUANT_CHROMA, quality).reshape(8, 8)

    y, cb, cr = _rgb_to_ycbcr(px)
    # pad to full MCUs, then box-average chroma down by (vmax, hmax)
    y = _pad_to(y, 8 * vmax, 8 * hmax)
    cb = _pad_to(cb, 8 * vmax, 8 * hmax)
    cr = _pad_to(cr, 8 * vmax, 8 * hmax)
    if hmax > 1 or vmax > 1:
        ph, pw = cb.shape
        cb = cb.reshape(ph // vmax, vmax, pw // hmax, hmax).mean(axis=(1, 3))
        cr = cr.reshape(ph // vmax, vmax, pw // hmax, hmax).mean(axis=(1, 3))

    coefs = [
        _fdct_quant(y, qy),
        _fdct_quant(cb, qc),
        _fdct_quant(cr, qc),
    ]
    samp = [(hmax, vmax), (1, 1), (1, 1)]

    dc_codes = [
        _build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = [
        _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    mcux = coefs[0].shape[1] // hmax
    mcuy = coefs[0].shape[0] // vmax

    bw_ = _BitWriter()
    pred = [0, 0, 0]
    segments: list[bytes] = []
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw_.flush()
                segments.append(bytes(bw_.out))
                bw_ = _BitWriter()
                pred = [0, 0, 0]
            for ci in range(3):
                ch, cv = samp[ci]
                tid = 0 if ci == 0 else 1
                for v in range(cv):
                    for u in range(ch):
                        blk = coefs[ci][my * cv + v, mx * ch + u]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        s, extra = _magnitude(diff)
                        code, ln = dc_codes[tid][s]
                        bw_.write(code, ln)
                        if s:
                            bw_.write(extra, s)
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            val = int(blk[k])
                            if val == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[tid][0xF0]  # ZRL
                                bw_.write(code, ln)
                                run -= 16
                            s, extra = _magnitude(val)
                            code, ln = ac_codes[tid][(run << 4) | s]
                            bw_.write(code, ln)
                            bw_.write(extra, s)
                            run = 0
                        if last < 63:
                            code, ln = ac_codes[tid][0x00]  # EOB
                            bw_.write(code, ln)
            mcu_count += 1
    bw_.flush()
    segments.append(bytes(bw_.out))
    entropy = bytearray()
    for i, seg in enumerate(segments[:-1]):
        entropy += seg
        entropy += bytes([0xFF, 0xD0 + (i % 8)])
    entropy += segments[-1]

    def marker(m: int, payload: bytes) -> bytes:
        return struct.pack(">HH", m, len(payload) + 2) + payload

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return marker(
            0xFFDB, bytes([tid]) + bytes(int(x) for x in tab.reshape(64)[ZIGZAG])
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return marker(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof_comps = b"".join(
        bytes([cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0 if cid == 0 else 1])
        for cid in range(3)
    )
    sos_comps = b"".join(
        bytes([cid + 1, (0 << 4) | 0 if cid == 0 else (1 << 4) | 1])
        for cid in range(3)
    )
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy) + dqt(1, qc)
    out += marker(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += marker(0xFFDD, struct.pack(">H", restart_interval))
    out += marker(0xFFDA, bytes([3]) + sos_comps + bytes([0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (h, w, 3) uint8 RGB.

    Supports: SOF0 (baseline), 8-bit, 1 or 3 components, any Hi/Vi
    sampling factors up to 2 (covers 4:4:4, 4:2:2, 4:2:0), DRI/RSTn,
    multi-chunk DQT/DHT, APPn/COM skip. Rejects progressive (SOF2) and
    other non-baseline frames with a clear error."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hi, vi, tq)]
    restart_interval = 0
    scan = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated marker segment")
        if m == 0xDB:  # DQT (possibly several tables per marker)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                n = 64 * (2 if prec else 1)
                raw = body[i + 1 : i + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                qtabs[tid] = tab.reshape(8, 8)
                i += 1 + n
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _build_huffman_lookup(bits, vals)
                i += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline / extended sequential)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                # component specs start right after the 6-byte >BHHB header
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{m - 0xC0} "
                "(only baseline sequential is supported)"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            pos = pos + 2 + length
            break
        # APPn / COM / others: skip
        pos += 2 + length

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("scan/frame component mismatch")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for cid, hi, vi, tq in comps:
        planes.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64))

    scan_tabs = {cid: (td >> 4, td & 0xF) for cid, td in scan}
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.expect_restart(rst)
            rst += 1
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            td, ta = scan_tabs[cid]
            dc_lookup = huff.get((0, td))
            ac_lookup = huff.get((1, ta))
            if dc_lookup is None or ac_lookup is None:
                raise ValueError("scan references an undefined Huffman table")
            for v in range(vi):
                for u in range(hi):
                    blk = planes[ci][my * vi + v, mx * hi + u]
                    s = _decode_huffman(reader, dc_lookup)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    pred[ci] += diff
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huffman(reader, ac_lookup)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient index overflow")
                        blk[k] = _extend(reader.read_bits(s), s)
                        k += 1

    out_planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        qtab = qtabs.get(tq)
        if qtab is None:
            raise ValueError(f"component references undefined quant table {tq}")
        by, bx = planes[ci].shape[:2]
        zz = planes[ci]  # (by, bx, 64) zigzag-order coefficients
        lin = np.zeros_like(zz)
        lin[:, :, ZIGZAG] = zz  # back to row-major linear order
        coef = lin.reshape(by, bx, 8, 8).astype(np.float64) * qtab
        spatial = np.einsum("ji,byjk,kl->byil", _DCT, coef, _DCT) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(_round_half_up(plane), 0, 255)
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(comps) == 1:
        y = out_planes[0][:h, :w]
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = (p[:h, :w] for p in out_planes)
    return _ycbcr_to_rgb(y, cb, cr)


def dc_roundtrip_value(v: int, quality: int = 90) -> int:
    """The exact decoded gray value of a flat tile of gray ``v`` (module
    docstring contract) — the formula the SQL oracle mirrors."""
    q0 = int(quality_scale(QUANT_LUMA, quality)[0, 0])
    d = v - 128
    vq = np.floor(8.0 * d / q0 + 0.5)
    return int(np.clip(np.floor(vq * q0 / 8.0 + 0.5) + 128, 0, 255))
