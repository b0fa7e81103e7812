"""Container-level metadata probes for compressed video (MP4 / WebM).

Full MP4/WebM pixel decode needs external codec libraries and stays a
documented ``NotImplementedError`` (media_codecs.decode_media); but the
metadata a curation pipeline filters on — duration, track dimensions,
codec ids, sample rate — lives in the CONTAINER, whose layout is public
spec: ISO/IEC 14496-12 (ISO Base Media File Format box tree) for MP4 and
the Matroska/WebM EBML element tree. These probes walk those structures
directly with zero dependencies, so the cheap JVM-side length/mime
filters can be followed by a metadata gate BEFORE any (external,
expensive) pixel decode stage.

Builders for minimal-but-structurally-valid fixtures live here too —
``build_mp4`` / ``build_webm`` emit real box/EBML trees (the probes'
round-trip tests and the oracle gate run through them), the same way the
from-scratch PNG/JPEG codecs double as fixture generators.

Reference scope note: tarantool/avro-schema has no multimodal surface at
all — this is BASELINE.json north-star scope ("multimodal columns"), not
reference parity.
"""

from __future__ import annotations

import struct
from typing import Any, Optional

# --------------------------------------------------------------- ISO BMFF
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the sibling boxes in
    data[start:end]. Handles size==1 (64-bit largesize) and size==0
    (box extends to the end of the enclosing scope)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4: box {btype!r} overruns its container")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes) -> Optional[tuple[int, int]]:
    for t, s, e in _walk_boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _mvhd_duration_ms(data: bytes, s: int, e: int) -> Optional[float]:
    version = data[s]
    if version == 1:
        timescale = int.from_bytes(data[s + 20:s + 24], "big")
        duration = int.from_bytes(data[s + 24:s + 32], "big")
    else:
        timescale = int.from_bytes(data[s + 12:s + 16], "big")
        duration = int.from_bytes(data[s + 16:s + 20], "big")
    if not timescale:
        return None
    return duration * 1000.0 / timescale


def _tkhd_dims(data: bytes, s: int, e: int) -> tuple[int, int]:
    # width/height are the LAST two 16.16 fixed-point fields of tkhd
    w = int.from_bytes(data[e - 8:e - 4], "big") >> 16
    h = int.from_bytes(data[e - 4:e], "big") >> 16
    return w, h


def probe_mp4(data: bytes) -> dict[str, Any]:
    """ISO BMFF box walk → container metadata dict:
    brand, duration_ms, width, height, video_codec, audio_codec,
    sample_rate, channels, n_tracks. Missing pieces stay None; malformed
    structure raises ValueError."""
    out: dict[str, Any] = {
        "container": "mp4", "brand": None, "duration_ms": None,
        "width": None, "height": None, "video_codec": None,
        "audio_codec": None, "sample_rate": None, "channels": None,
        "n_tracks": 0,
    }
    moov = None
    for t, s, e in _walk_boxes(data, 0, len(data)):
        if t == b"ftyp":
            out["brand"] = data[s:s + 4].decode("latin-1")
        elif t == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("mp4: no moov box")
    ms, me = moov
    mvhd = _find(data, ms, me, b"mvhd")
    if mvhd:
        out["duration_ms"] = _mvhd_duration_ms(data, *mvhd)
    for t, ts, te in _walk_boxes(data, ms, me):
        if t != b"trak":
            continue
        out["n_tracks"] += 1
        tkhd = _find(data, ts, te, b"tkhd")
        mdia = _find(data, ts, te, b"mdia")
        handler = codec = None
        entry = None
        if mdia:
            hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr:
                handler = data[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1")
            minf = _find(data, mdia[0], mdia[1], b"minf")
            stbl = minf and _find(data, minf[0], minf[1], b"stbl")
            stsd = stbl and _find(data, stbl[0], stbl[1], b"stsd")
            if stsd:
                n_entries = int.from_bytes(data[stsd[0] + 4:stsd[0] + 8], "big")
                if n_entries:
                    es = stsd[0] + 8
                    codec = data[es + 4:es + 8].decode("latin-1")
                    entry = es
        if handler == "vide":
            out["video_codec"] = out["video_codec"] or codec
            if tkhd and out["width"] is None:
                out["width"], out["height"] = _tkhd_dims(data, *tkhd)
        elif handler == "soun":
            out["audio_codec"] = out["audio_codec"] or codec
            if entry is not None and out["sample_rate"] is None:
                # AudioSampleEntry: 8B header, 6B reserved, 2B data_ref,
                # 8B reserved, channelcount(2), samplesize(2),
                # predefined(2), reserved(2), samplerate(16.16)
                out["channels"] = int.from_bytes(data[entry + 24:entry + 26], "big")
                out["sample_rate"] = int.from_bytes(data[entry + 32:entry + 36], "big") >> 16
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    width: int,
    height: int,
    duration_ms: int,
    video_codec: str = "avc1",
    audio: Optional[tuple[str, int, int]] = None,  # (codec, sample_rate, channels)
    brand: str = "isom",
    timescale: int = 1000,
) -> bytes:
    """Minimal structurally-valid ISO BMFF tree: ftyp + moov{mvhd,
    trak{tkhd, mdia{mdhd, hdlr, minf{stbl{stsd}}}}} (+ audio trak).
    Every field the probe reads is real; sample data itself is absent
    (metadata-only fixture, like a faststart header)."""
    ftyp = _box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom")
    duration = duration_ms * timescale // 1000
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x4I", 0, 0, 0, timescale, duration) + b"\x00" * 80,
    )

    def trak(handler: bytes, codec: str, w: int, h: int, entry_tail: bytes) -> bytes:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3x5I", 0, 0, 0, 1, 0, duration)
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _box(b"mdhd", struct.pack(">B3x4I2H", 0, 0, 0, timescale, duration, 0x55C4, 0))
        hdlr = _box(b"hdlr", struct.pack(">B3xI", 0, 0) + handler + b"\x00" * 13)
        entry = struct.pack(">I", 8 + len(entry_tail)) + codec.encode("latin-1") + entry_tail
        stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    # VisualSampleEntry tail: 6B reserved + 2B data_ref + 70B video fields
    traks = trak(b"vide", video_codec, width, height, b"\x00" * 78)
    if audio is not None:
        acodec, rate, ch = audio
        tail = (
            b"\x00" * 8                       # 6B reserved + 2B data_ref
            + b"\x00" * 8                     # reserved
            + struct.pack(">HHHH", ch, 16, 0, 0)
            + struct.pack(">I", rate << 16)
        )
        traks += trak(b"soun", acodec, 0, 0, tail)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov


# ------------------------------------------------------------------- EBML
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_AUDIO = 0xE1
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_SAMPLING = 0xB5
_CHANNELS = 0x9F


def _vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` → (value, next_pos).
    IDs keep the length-marker bit; sizes strip it."""
    if pos >= len(data):
        raise ValueError("ebml: truncated vint")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint leading byte 0")
    length = 8 - first.bit_length()
    n = length + 1
    if pos + n > len(data):
        raise ValueError("ebml: truncated vint body")
    val = first if keep_marker else first & ((1 << (7 - length)) - 1)
    for b in data[pos + 1:pos + n]:
        val = (val << 8) | b
    return val, pos + n


def _walk_ebml(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end). Unknown-size
    elements (all size bits set) extend to the enclosing scope's end."""
    pos = start
    while pos < end:
        eid, p = _vint(data, pos, keep_marker=True)
        size, p2 = _vint(data, p, keep_marker=False)
        size_len = p2 - p
        if size == (1 << (7 * size_len)) - 1:  # unknown size
            e = end
        else:
            e = p2 + size
        if e > end:
            raise ValueError("ebml: element overruns its scope")
        yield eid, p2, e
        pos = e


def _ebml_uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big")


def _ebml_float(data: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", data[s:e])[0]
    if n == 8:
        return struct.unpack(">d", data[s:e])[0]
    raise ValueError(f"ebml: float of width {n}")


def probe_webm(data: bytes) -> dict[str, Any]:
    """EBML element walk (Matroska/WebM) → the same metadata dict shape
    as :func:`probe_mp4` (container field = the EBML DocType)."""
    out: dict[str, Any] = {
        "container": None, "brand": None, "duration_ms": None,
        "width": None, "height": None, "video_codec": None,
        "audio_codec": None, "sample_rate": None, "channels": None,
        "n_tracks": 0,
    }
    segment = None
    for eid, s, e in _walk_ebml(data, 0, len(data)):
        if eid == _EBML:
            for i2, s2, e2 in _walk_ebml(data, s, e):
                if i2 == _DOCTYPE:
                    out["container"] = data[s2:e2].rstrip(b"\x00").decode("latin-1")
        elif eid == _SEGMENT:
            segment = (s, e)
    if out["container"] is None or segment is None:
        raise ValueError("ebml: missing EBML header or Segment")
    tc_scale = 1_000_000  # default: timestamps in ns units of 1ms
    duration_units: Optional[float] = None
    for eid, s, e in _walk_ebml(data, *segment):
        if eid == _INFO:
            for i2, s2, e2 in _walk_ebml(data, s, e):
                if i2 == _TIMECODE_SCALE:
                    tc_scale = _ebml_uint(data, s2, e2)
                elif i2 == _DURATION:
                    duration_units = _ebml_float(data, s2, e2)
        elif eid == _TRACKS:
            for i2, s2, e2 in _walk_ebml(data, s, e):
                if i2 != _TRACK_ENTRY:
                    continue
                out["n_tracks"] += 1
                ttype = None
                codec = None
                video: dict[str, int] = {}
                audio: dict[str, Any] = {}
                for i3, s3, e3 in _walk_ebml(data, s2, e2):
                    if i3 == _TRACK_TYPE:
                        ttype = _ebml_uint(data, s3, e3)
                    elif i3 == _CODEC_ID:
                        codec = data[s3:e3].decode("latin-1")
                    elif i3 == _VIDEO:
                        for i4, s4, e4 in _walk_ebml(data, s3, e3):
                            if i4 == _PIXEL_W:
                                video["w"] = _ebml_uint(data, s4, e4)
                            elif i4 == _PIXEL_H:
                                video["h"] = _ebml_uint(data, s4, e4)
                    elif i3 == _AUDIO:
                        for i4, s4, e4 in _walk_ebml(data, s3, e3):
                            if i4 == _SAMPLING:
                                audio["rate"] = _ebml_float(data, s4, e4)
                            elif i4 == _CHANNELS:
                                audio["ch"] = _ebml_uint(data, s4, e4)
                if ttype == 1:
                    out["video_codec"] = out["video_codec"] or codec
                    if out["width"] is None:
                        out["width"] = video.get("w")
                        out["height"] = video.get("h")
                elif ttype == 2:
                    out["audio_codec"] = out["audio_codec"] or codec
                    if out["sample_rate"] is None and "rate" in audio:
                        out["sample_rate"] = int(audio["rate"])
                        out["channels"] = audio.get("ch")
    if duration_units is not None:
        out["duration_ms"] = duration_units * tc_scale / 1e6
    return out


def _e_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _e_size(n: int) -> bytes:
    # 4-byte size form: plenty for fixtures, unambiguous
    if n >= (1 << 28) - 1:
        raise ValueError("fixture element too large")
    return ((1 << 28) | n).to_bytes(4, "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _e_id(eid) + _e_size(len(payload)) + payload


def _elem_uint(eid: int, v: int) -> bytes:
    n = max((v.bit_length() + 7) // 8, 1)
    return _elem(eid, v.to_bytes(n, "big"))


def build_webm(
    width: int,
    height: int,
    duration_ms: float,
    video_codec: str = "V_VP9",
    audio: Optional[tuple[str, int, int]] = None,
    doctype: str = "webm",
) -> bytes:
    """Minimal structurally-valid EBML tree: EBML{DocType} +
    Segment{Info{TimecodeScale, Duration}, Tracks{TrackEntry...}}."""
    header = _elem(_EBML, _elem(_DOCTYPE, doctype.encode("latin-1")))
    info = _elem(
        _INFO,
        _elem_uint(_TIMECODE_SCALE, 1_000_000)
        + _elem(_DURATION, struct.pack(">d", float(duration_ms))),
    )
    vtrack = _elem(
        _TRACK_ENTRY,
        _elem_uint(_TRACK_TYPE, 1)
        + _elem(_CODEC_ID, video_codec.encode("latin-1"))
        + _elem(_VIDEO, _elem_uint(_PIXEL_W, width) + _elem_uint(_PIXEL_H, height)),
    )
    tracks = vtrack
    if audio is not None:
        acodec, rate, ch = audio
        tracks += _elem(
            _TRACK_ENTRY,
            _elem_uint(_TRACK_TYPE, 2)
            + _elem(_CODEC_ID, acodec.encode("latin-1"))
            + _elem(
                _AUDIO,
                _elem(_SAMPLING, struct.pack(">d", float(rate)))
                + _elem_uint(_CHANNELS, ch),
            ),
        )
    segment = _elem(_SEGMENT, info + _elem(_TRACKS, tracks))
    return header + segment


# --------------------------------------------------------------- dispatch
def probe_media_bytes(data: bytes, mime: Optional[str] = None) -> dict[str, Any]:
    """Sniff-or-dispatch: mp4 via ftyp/moov, webm/matroska via the EBML
    magic; ``mime`` (video/mp4, video/webm, video/x-matroska) overrides
    sniffing."""
    if mime in ("video/mp4", "video/quicktime") or (
        mime is None and len(data) >= 8 and data[4:8] in (b"ftyp", b"moov")
    ):
        return probe_mp4(data)
    if (mime and ("webm" in mime or "matroska" in mime)) or (
        mime is None and data[:4] == _EBML.to_bytes(4, "big")
    ):
        return probe_webm(data)
    raise ValueError(f"probe_media_bytes: unrecognized container (mime={mime!r})")
