"""From-scratch snappy block codec (pure Python, stdlib only).

Snappy is the most common real-world Avro OCF block codec; this container
ships no python-snappy, so the format is implemented here directly from
the PUBLIC format description (google/snappy format_description.txt):

- preamble: uncompressed length, little-endian base-128 varint;
- then elements, each led by a tag byte whose low 2 bits select the kind:
  00 literal (upper 6 bits = len-1, or 60..63 = len-1 in the next 1..4
  little-endian bytes), 01 copy/1-byte offset (3-bit len-4, 11-bit
  offset), 10 copy/2-byte offset (6-bit len-1, 16-bit LE offset),
  11 copy/4-byte offset (6-bit len-1, 32-bit LE offset).
- copies may overlap themselves (offset < length repeats bytes, LZ77).

The COMPRESSOR is the standard greedy hash-of-4-bytes matcher with
snappy's skip acceleration on incompressible stretches; any stream it
emits is valid for the reference decoder (2-byte-offset copies only,
64-byte max copy length — both always-legal element shapes). The
DECOMPRESSOR accepts the full format, including 1/2/4-byte offsets and
overlapping copies, with loud bounds checks on every element (corrupt
lengths/offsets must never read or write out of range — same guard
discipline as the Avro skip paths).

Avro's OCF framing (spec "snappy" codec) appends a 4-byte big-endian
CRC32 of the UNCOMPRESSED bytes to each block; that wrapper lives in
avro_ocf._codec_pair / the JVM decompressBlock, not here — this module
is the bare snappy stream.
"""

from __future__ import annotations

from ..errors import AvroSparkError

_MAX_OFFSET = 65535  # compressor emits 2-byte-offset copies only
_MIN_MATCH = 4


def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise AvroSparkError("snappy: truncated length preamble")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 35:
            raise AvroSparkError("snappy: length preamble overflow")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    """One or more literal elements covering data[start:end]."""
    while start < end:
        n = min(end - start, 1 << 16)  # keep per-element length fields small
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0x100:
            out.append(60 << 2)
            out.append(n - 1)
        else:
            out.append(61 << 2)
            out += (n - 1).to_bytes(2, "little")
        out += data[start : start + n]
        start += n


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Copy elements (2-byte offset form, legal for any length 1..64)
    covering `length` bytes; long matches chain 64-byte elements."""
    off = offset.to_bytes(2, "little")
    while length > 64:
        out.append((63 << 2) | 2)  # len 64
        out += off
        length -= 64
    out.append(((length - 1) << 2) | 2)
    out += off


def compress(data: bytes) -> bytes:
    """Greedy snappy compression: hash table over 4-byte prefixes, skip
    acceleration (step grows on long matchless stretches, as in the
    reference algorithm) so incompressible input degrades to ~literal
    copying instead of a per-byte probe."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    _write_varint(out, n)
    if n < _MIN_MATCH:
        if n:
            _emit_literal(out, data, 0, n)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    skip = 32  # probe step = skip >> 5: accelerates on matchless runs
    limit = n - _MIN_MATCH + 1
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _MAX_OFFSET:
            m = _MIN_MATCH
            max_m = n - i
            while m < max_m and data[cand + m] == data[i + m]:
                m += 1
            _emit_literal(out, data, lit_start, i)
            _emit_copy(out, i - cand, m)
            i += m
            lit_start = i
            skip = 32
        else:
            i += skip >> 5
            skip += 1
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Full-format snappy decode with loud bounds checks (a corrupt
    element raises AvroSparkError, never reads/writes out of range)."""
    data = bytes(data)
    ulen, p = _read_varint(data, 0)
    # reject the claimed size BEFORE allocating: the densest legal
    # element is a 3-byte copy emitting 64 bytes (~21.3×), so anything
    # past 32× the remaining input is corrupt — without this cap a
    # 6-byte preamble claiming ~1 TB OOM-killed the executor instead of
    # raising the loud corruption error (mirrors the JVM twin's guard)
    if ulen > max(64, (len(data) - p) * 32):
        raise AvroSparkError(
            f"snappy: preamble claims {ulen} bytes from "
            f"{len(data) - p} input bytes — corrupt"
        )
    out = bytearray(ulen)
    o = 0
    n = len(data)
    view = memoryview(out)
    while p < n:
        tag = data[p]
        p += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:
                nb = length - 59  # 1..4 extra length bytes
                if p + nb > n:
                    raise AvroSparkError("snappy: truncated literal length")
                length = int.from_bytes(data[p : p + nb], "little")
                p += nb
            length += 1
            if p + length > n:
                raise AvroSparkError("snappy: literal runs past input")
            if o + length > ulen:
                raise AvroSparkError("snappy: literal overflows output")
            view[o : o + length] = data[p : p + length]
            p += length
            o += length
            continue
        if kind == 1:
            if p >= n:
                raise AvroSparkError("snappy: truncated copy")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[p]
            p += 1
        elif kind == 2:
            if p + 2 > n:
                raise AvroSparkError("snappy: truncated copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[p : p + 2], "little")
            p += 2
        else:
            if p + 4 > n:
                raise AvroSparkError("snappy: truncated copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[p : p + 4], "little")
            p += 4
        if offset == 0 or offset > o:
            raise AvroSparkError(
                f"snappy: copy offset {offset} outside the {o} bytes produced"
            )
        if o + length > ulen:
            raise AvroSparkError("snappy: copy overflows output")
        if offset >= length:
            view[o : o + length] = view[o - offset : o - offset + length]
            o += length
        else:
            # overlapping copy: repeats the last `offset` bytes (LZ77);
            # double the window instead of a per-byte loop
            src = bytes(view[o - offset : o])
            while len(src) < length:
                src += src
            view[o : o + length] = src[:length]
            o += length
    if o != ulen:
        raise AvroSparkError(
            f"snappy: stream produced {o} bytes, preamble claims {ulen}"
        )
    return bytes(out)
