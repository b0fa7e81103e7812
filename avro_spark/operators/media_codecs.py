"""Dependency-free media codecs for the multimodal operators.

The container has no PIL/ffmpeg/librosa, but several real formats are
decodable with the standard library + numpy alone, which turns
``decoder='real'`` into an actual codec path for:

* **PNG** (``image/png``) — zlib inflate + per-row unfiltering (public PNG
  spec): 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced. Encode uses
  filter 0 rows.
* **BMP** (``image/bmp``) — uncompressed BI_RGB 24/32-bit bottom-up DIBs.
* **PPM/PGM** (``image/x-portable-pixmap`` / ``-graymap``) — binary P6/P5.
* **WAV** (``audio/wav``) — PCM 8/16-bit via the stdlib ``wave`` module.
* **raw video** (``video/x-raw``) — frame-major H×W×3 byte planes; frame
  geometry from the media struct metadata.
* **JPEG** (``image/jpeg``) — baseline sequential DCT, 8-bit,
  grayscale or color at any integer sampling layout (4:4:4, 4:2:2,
  4:2:0; nearest-neighbor chroma upsampling), restart intervals
  (``jpeg_codec.py``: the full marker/Huffman/DCT pipeline in numpy;
  encode is 4:4:4 or 4:2:0). Progressive streams raise
  ``NotImplementedError`` with the precise reason. JPEG is lossy —
  round trips are near (PSNR-tested), not exact.

Compressed video (mp4/webm) stays behind ``NotImplementedError`` —
it genuinely needs external codecs.

All decoders return numpy arrays: images H×W×C uint8 (C ∈ {1,2,3,4}),
audio (n_samples, n_channels) int16. Encoders are exact inverses for the
supported subsets (round-trip property-tested in tests/test_multimodal.py).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ------------------------------------------------------------------- PNG
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG → H×W×C uint8 (8-bit depth, non-interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = None
    depth = ctype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype} (palette)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        out[y] = _png_unfilter(ftype, line, prev, ch)
        prev = out[y]
    return out.reshape(h, w, ch)


def _png_unfilter(ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """One row of PNG reconstruction (filters 0-4, spec §9)."""
    cur = line.astype(np.int32)
    up = prev.astype(np.int32)
    n = len(cur)
    out = np.empty(n, dtype=np.int32)
    if ftype == 0:
        return line.copy()
    if ftype == 2:  # Up
        return ((cur + up) & 0xFF).astype(np.uint8)
    # Sub/Average/Paeth have a left-dependency → sequential per pixel-group
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0       # left (reconstructed)
        b = up[i]                                  # above
        c = up[i - bpp] if i >= bpp else 0         # upper-left
        if ftype == 1:       # Sub
            pred = a
        elif ftype == 3:     # Average
            pred = (a + b) // 2
        elif ftype == 4:     # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[i] = (cur[i] + pred) & 0xFF
    return out.astype(np.uint8)


def encode_png(px: np.ndarray) -> bytes:
    """H×W(/×C) uint8 → PNG (filter-0 rows)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# ------------------------------------------------------------------- BMP
def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit bottom-up BMP → H×W×3 uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BMP core header")
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    rgb = rows[:, :, 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


def encode_bmp(px: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → 24-bit bottom-up BMP."""
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = px[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + pad
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


# --------------------------------------------------------------- PPM/PGM
def decode_pnm(data: bytes) -> np.ndarray:
    """Binary P5 (gray) / P6 (RGB) → H×W(/×3) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    ch = 3 if data[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise NotImplementedError("PNM maxval != 255")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=i)
    return px.reshape(h, w, ch) if ch == 3 else px.reshape(h, w)


def encode_pnm(px: np.ndarray) -> bytes:
    if px.ndim == 3 and px.shape[2] == 3:
        magic, body = b"P6", px.tobytes()
        h, w = px.shape[:2]
    else:
        if px.ndim == 3:
            px = px[:, :, 0]
        magic, body = b"P5", px.tobytes()
        h, w = px.shape
    return magic + f"\n{w} {h}\n255\n".encode() + body


# ------------------------------------------------------------------- WAV
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → ((n_samples, n_channels) int16, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif sw == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise NotImplementedError(f"WAV sample width {sw}")
    return samples.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) int16 → 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ------------------------------------------------------------- raw video
def decode_raw_video(data: bytes, width: int, height: int) -> np.ndarray:
    """Frame-major H×W×3 planes → (n_frames, H, W, 3) uint8."""
    fsz = width * height * 3
    if fsz == 0 or len(data) % fsz:
        raise ValueError("raw video length not a multiple of frame size")
    n = len(data) // fsz
    return np.frombuffer(data, dtype=np.uint8).reshape(n, height, width, 3)


# ------------------------------------------------------------ dispatcher
from .jpeg_codec import decode_jpeg, encode_jpeg  # noqa: E402

_IMAGE_DECODERS = {
    "image/png": decode_png,
    "image/bmp": decode_bmp,
    "image/x-portable-pixmap": decode_pnm,
    "image/x-portable-graymap": decode_pnm,
    "image/jpeg": decode_jpeg,
}
_IMAGE_ENCODERS = {
    "image/png": encode_png,
    "image/bmp": encode_bmp,
    "image/jpeg": encode_jpeg,
    "image/x-portable-pixmap": encode_pnm,
    "image/x-portable-graymap": encode_pnm,
}


def decode_media(data: bytes, mime: str, width=None, height=None):
    """mime-dispatched decode → numpy tensor (images: H×W×C uint8; audio:
    (n, ch) int16; raw video: (f, H, W, 3) uint8). Raises
    NotImplementedError for formats that need external codecs (jpeg, mp4)."""
    if mime in _IMAGE_DECODERS:
        return _IMAGE_DECODERS[mime](data)
    if mime in ("audio/wav", "audio/x-wav"):
        return decode_wav(data)[0]
    if mime == "video/x-raw":
        if not width or not height:
            raise ValueError("video/x-raw needs width/height metadata")
        return decode_raw_video(data, width, height)
    # pixel decode of compressed video needs external codecs; CONTAINER
    # metadata (duration/dims/codec ids) is covered dependency-free by
    # media_probe.probe_media_bytes (ISO BMFF / EBML walks)
    raise NotImplementedError(
        f"no built-in pixel codec for {mime} (needs ffmpeg); "
        "container metadata: operators.media_probe"
    )


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an H×W(/×C) image."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return px[np.ix_(ys, xs)]


def encode_media(px: np.ndarray, mime: str) -> bytes:
    if mime in _IMAGE_ENCODERS:
        return _IMAGE_ENCODERS[mime](px)
    raise NotImplementedError(f"no built-in encoder for {mime}")
