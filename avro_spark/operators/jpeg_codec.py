"""Baseline JPEG codec in stdlib + numpy (no PIL/libjpeg).

Covers the interchange-format baseline subset (ITU-T T.81 Annex F,
sequential DCT, Huffman):

* decode: SOF0 baseline, 8-bit, grayscale or color with any integer
  sampling-factor layout (4:4:4, 4:2:2, 4:2:0 — nearest-neighbor
  chroma upsampling), arbitrary DHT/DQT from the stream, restart
  intervals (DRI/RSTn). Progressive (SOF2) raises
  ``NotImplementedError`` with a precise reason.
* encode: grayscale or RGB → baseline JFIF (4:4:4, or 4:2:0 with
  ``subsample=True``) with the Annex K example quantization/Huffman
  tables, IJG quality scaling.

The encoder and decoder share nothing but the public byte format, so a
round trip exercises the real bitstream (marker framing, byte stuffing,
DC prediction, magnitude coding) — property-tested for PSNR in
tests/test_media_codecs.py.

JPEG is lossy: round trips are near, not exact (unlike the PNG/BMP/PNM
codecs in media_codecs.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(ZIGZAG)

_QL = np.array([  # Annex K luminance
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_QC = np.array([  # Annex K chrominance
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II orthonormal basis: dct = C @ block @ C.T ; idct = C.T @ b @ C
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
_C = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C[0, :] = np.sqrt(1.0 / 8.0)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _huff_codes(bits, vals):
    """{symbol: (code, length)} per the T.81 canonical construction."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code) of a DC/AC coefficient amplitude."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    # a marker: rewind so the scan loop can see it and
                    # feed zero bits (segment is over)
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        # truncate consumed high bits: without this the accumulator grows
        # into a bigint spanning the whole entropy stream and every
        # shift/mask turns O(stream) — measured quadratic decode time
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def drop(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def align_to_marker(self) -> None:
        """Discard buffered bits and byte-align at self.pos."""
        self.acc = 0
        self.nbits = 0


def _decode_huff_symbol(br: _BitReader, lut: dict) -> int:
    """lut: {(length, code): symbol}; max length 16."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- encode
def _encode_block(bwr, blk, qtab, dc_tab, ac_tab, pred, ci):
    coef = _C @ blk @ _C.T
    q = np.round(coef / qtab).astype(np.int64)
    zz = q.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, code = _magnitude(diff)
    hc, hl = dc_tab[size]
    bwr.write(hc, hl)
    bwr.write(code, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_tab[0xF0]  # ZRL
            bwr.write(hc, hl)
            run -= 16
        size, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | size]
        bwr.write(hc, hl)
        bwr.write(code, size)
        run = 0
    if last_nz < 63:
        hc, hl = ac_tab[0x00]  # EOB
        bwr.write(hc, hl)


def _block_at(plane, by, bx):
    # clamped gather, not slice+pad: a 4:2:0 luma grid can place a block
    # entirely outside a small plane (h or w mod 16 in 1..8), where an
    # empty slice would make np.pad(mode='edge') raise
    ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, plane.shape[0] - 1)
    xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, plane.shape[1] - 1)
    return plane[np.ix_(ys, xs)]


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsample: bool = False,
) -> bytes:
    """Encode H×W (gray) or H×W×3 (RGB) uint8 → baseline JFIF bytes.
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
    (error-resilience framing; also exercises the decoder's restart
    path). ``subsample=True`` emits 4:2:0 (2×2 luma sampling, box-
    filtered chroma) — what camera/web JPEGs actually use; default is
    4:4:4."""
    px = np.asarray(px)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if gray:
        planes = [px.astype(np.float64) - 128.0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    qtabs = [ql] + ([] if gray else [qc, qc])

    dc_l = _huff_codes(_DC_L_BITS, _DC_L_VALS)
    ac_l = _huff_codes(_AC_L_BITS, _AC_L_VALS)
    dc_c = _huff_codes(_DC_C_BITS, _DC_C_VALS)
    ac_c = _huff_codes(_AC_C_BITS, _AC_C_VALS)
    htabs = [(dc_l, ac_l)] + ([] if gray else [(dc_c, ac_c), (dc_c, ac_c)])

    # sampling factors (h_i, v_i) per component; 4:2:0 box-filters chroma
    if gray or not subsample:
        sampling = [(1, 1)] * len(planes)
    else:
        sampling = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):
            p = planes[ci]
            ph = (p.shape[0] + 1) // 2 * 2
            pw = (p.shape[1] + 1) // 2 * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            planes[ci] = (
                p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    entropy = bytearray()
    bwr = _BitWriter()
    pred = [0] * len(planes)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                entropy += bwr.flush()
                entropy += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                )
                bwr = _BitWriter()
                pred = [0] * len(planes)
            mcu += 1
            for ci, plane in enumerate(planes):
                hi, vi = sampling[ci]
                dct_dc, act = htabs[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        blk = _block_at(plane, my * vi + byi, mx * hi + bxi)
                        _encode_block(
                            bwr, blk, qtabs[ci], dct_dc, act, pred, ci
                        )
    entropy += bwr.flush()
    entropy = bytes(entropy)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ([(0, ql)] if gray else [(0, ql), (1, qc)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in q.flatten()[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (sampling[ci][0] << 4) | sampling[ci][1]
        out += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    hdefs = [(0x00, _DC_L_BITS, _DC_L_VALS), (0x10, _AC_L_BITS, _AC_L_VALS)]
    if not gray:
        hdefs += [(0x01, _DC_C_BITS, _DC_C_VALS), (0x11, _AC_C_BITS, _AC_C_VALS)]
    for tc_th, bits, vals in hdefs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes → H×W (gray) or H×W×3 (RGB) uint8.

    Error contract: malformed input raises ``ValueError`` (or
    ``NotImplementedError`` for recognized-but-unsupported modes) —
    internal slice/lookup errors from corrupt streams never leak."""
    try:
        return _decode_jpeg(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, struct.error) as ex:
        raise ValueError(f"bad JPEG: corrupt stream ({type(ex).__name__})") from ex


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 2 > len(data):
            raise ValueError("bad JPEG: truncated stream")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("bad JPEG: truncated stream")
        seglen = struct.unpack(">H", data[pos: pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p: p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p: p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = vals
                qtabs[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17: p + 17 + nv])
                lut = {}
                code = 0
                i = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        lut[(length, code)] = vals[i]
                        code += 1
                        i += 1
                    code <<= 1
                htabs[(tc, th)] = lut
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline-compatible)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad JPEG sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("bad JPEG: SOS before SOF")
            ns = seg[0]
            scomp = []
            for ci in range(ns):
                cs, tdta = seg[1 + 2 * ci: 3 + 2 * ci]
                scomp.append((cs, tdta >> 4, tdta & 0xF))
            h, w, comps = frame
            entropy_start = pos + seglen
            return _decode_scan(
                data, entropy_start, h, w, comps, scomp, qtabs, htabs,
                restart_interval,
            )
        pos += seglen
    raise ValueError("bad JPEG: no SOS marker")


def _decode_block(br, dc_lut, ac_lut, q, pred, ci):
    zz = np.zeros(64, np.int64)
    size = _decode_huff_symbol(br, dc_lut)
    diff = _extend(br.read(size), size)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huff_symbol(br, ac_lut)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("bad JPEG: AC run past block")
        zz[k] = _extend(br.read(size), size)
        k += 1
    coef = np.zeros(64, np.float64)
    coef[ZIGZAG] = zz
    return _C.T @ (coef.reshape(8, 8) * q) @ _C


def _decode_scan(data, pos, h, w, comps, scomp, qtabs, htabs, restart_interval):
    ncomp = len(comps)
    info = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cs, _td, _ta in scomp:
        hi, vi, _tq = info[cs]
        planes.append(np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64))
    br = _BitReader(data[pos:])
    pred = [0] * ncomp
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align and consume the RSTn marker
                br.align_to_marker()
                if (
                    br.pos + 1 < len(br.data)
                    and br.data[br.pos] == 0xFF
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                elif br.pos >= len(br.data) - 1:
                    raise ValueError("bad JPEG: truncated at restart marker")
                pred = [0] * ncomp
            for ci, (cs, td, ta) in enumerate(scomp):
                hi, vi, tq = info[cs]
                dc_lut = htabs[(0, td)]
                ac_lut = htabs[(1, ta)]
                q = qtabs[tq]
                for byi in range(vi):
                    for bxi in range(hi):
                        blk = _decode_block(br, dc_lut, ac_lut, q, pred, ci)
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        planes[ci][y0: y0 + 8, x0: x0 + 8] = blk
            mcu += 1
    # upsample subsampled components to full resolution, crop, unshift
    full = []
    for ci, (cs, _td, _ta) in enumerate(scomp):
        hi, vi, _tq = info[cs]
        p = planes[ci]
        if hi != hmax or vi != vmax:
            if hmax % hi or vmax % vi:
                raise NotImplementedError(
                    f"non-integer chroma upsampling ratio ({hi}x{vi} vs "
                    f"{hmax}x{vmax} max) unsupported"
                )
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w] + 128.0)
    planes = full
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
