"""Multimodal (image/audio/video) column plumbing.

Design (BASELINE.json north star "multimodal columns"): media payloads are
opaque ``binary`` columns travelling next to a typed metadata struct —

    media: struct<
        data:        binary,      -- raw encoded bytes
        mime:        string,      -- 'image/png', 'audio/wav', ...
        width:       int,         -- images/video (nullable)
        height:      int,
        sample_rate: int,         -- audio (nullable)
        n_frames:    int          -- video/audio frames (nullable)
    >

Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages: one Python worker per partition, whole Arrow
batches across the boundary, schema declared up front so Catalyst plans
around them. At 100 TB these are the *only* Python stages in the pipeline
and they are narrow (no shuffle); keep them behind the cheap JVM-side
filters so they see as few rows as possible.

Codec paths:

* ``decoder='fake'`` (default) derives a small deterministic pixel tensor
  from the bytes — exercises the full plumbing (schema, Arrow batching,
  partition flow) with any payload, and is what the oracle-gated driver
  query uses.
* ``decoder='real'`` dispatches on the media struct's mime through
  :mod:`avro_spark.operators.media_codecs` — REAL stdlib+numpy codecs for
  PNG / BMP / PPM / PGM images, PCM WAV audio, and raw-frame video.
  Formats that genuinely need external libraries (MP4/WebM) raise
  ``NotImplementedError`` inside the worker.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FAKE_DIM = 8  # fake decoded images are FAKE_DIM × FAKE_DIM grayscale


def pack_media(
    df: DataFrame,
    data_col: str,
    mime: str,
    out_col: str = "media",
    **meta_cols: str,
) -> DataFrame:
    """Assemble the media struct from a binary column + optional metadata
    column names (width=..., height=..., sample_rate=..., n_frames=...)."""
    allowed = ("width", "height", "sample_rate", "n_frames")
    unknown = set(meta_cols) - set(allowed)
    if unknown:
        # a typo'd keyword would otherwise silently leave the metadata
        # NULL and corrupt every downstream decode decision
        raise TypeError(f"pack_media: unknown metadata keys {sorted(unknown)}")
    fields = [
        F.col(data_col).cast("binary").alias("data"),
        F.lit(mime).alias("mime"),
    ]
    for name in ("width", "height", "sample_rate", "n_frames"):
        src = meta_cols.get(name)
        fields.append(
            (F.col(src) if src else F.lit(None)).cast("int").alias(name)
        )
    return df.withColumn(out_col, F.struct(*fields))


def _fake_pixels(data: bytes) -> np.ndarray:
    """Deterministic FAKE_DIM² uint8 'decode' of arbitrary bytes: sha256
    stretched to the pixel count. Stands in for a real image decoder."""
    need = FAKE_DIM * FAKE_DIM
    out = bytearray()
    counter = 0
    seed = data if data is not None else b""
    while len(out) < need:
        out += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(FAKE_DIM, FAKE_DIM)


def decode_features(
    df: DataFrame,
    media_col: str = "media",
    id_cols: tuple[str, ...] = (),
    decoder: str = "fake",
) -> DataFrame:
    """media struct → per-item feature row
    (id_cols..., n_bytes long, mean double, std double, phash string,
    sha256 string). ``sha256`` is the exact content digest computed
    INSIDE the Python stage — an engine-independent checksum proving the
    bytes crossed the Arrow boundary intact (the correctness gate hashes
    it against DuckDB's sha256 of the same payload).

    ``decoder='real'`` decodes actual payloads via
    :mod:`avro_spark.operators.media_codecs` (PNG/BMP/PNM/WAV/raw video);
    ``mean``/``std``/``phash`` are then computed over the REAL pixel or
    sample tensor. Formats needing external codecs (MP4/WebM) raise
    inside the worker.
    """
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("n_bytes", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("std", T.DoubleType()),
            T.StructField("phash", T.StringType()),
            T.StructField("sha256", T.StringType()),
        ]
    )
    src = df.select(
        *id_cols,
        F.col(media_col).getField("data").alias("_data"),
        F.col(media_col).getField("mime").alias("_mime"),
        F.col(media_col).getField("width").alias("_w"),
        F.col(media_col).getField("height").alias("_h"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codecs

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = row["_data"]
                if decoder == "real":
                    # pandas renders NULL ints as NaN floats, which are
                    # truthy and defeat decode_media's missing-metadata
                    # guard — normalize to None/int first
                    w = None if pd.isna(row["_w"]) else int(row["_w"])
                    h = None if pd.isna(row["_h"]) else int(row["_h"])
                    px = media_codecs.decode_media(
                        bytes(data) if data is not None else b"",
                        row["_mime"], w, h,
                    ).astype(np.float64)
                else:
                    px = _fake_pixels(data).astype(np.float64)
                # perceptual hash: 8×8 nearest-neighbor thumbnail of the
                # first frame / first channel plane, bits = pixel > mean
                plane = px
                if plane.ndim == 4:      # raw video (f, H, W, 3) → frame 0
                    plane = plane[0]
                if plane.ndim == 3:      # image (H, W, C) → channel 0
                    plane = plane[..., 0]
                thumb = media_codecs.resize_nearest(plane, 8, 8) if plane.shape != (8, 8) else plane
                bits = (thumb > thumb.mean()).flatten()
                phash = "".join(
                    f"{int(''.join('1' if b else '0' for b in bits[i:i+8]), 2):02x}"
                    for i in range(0, len(bits), 8)
                )
                rows.append(
                    [row[c] for c in id_cols]
                    + [
                        len(data) if data is not None else 0,
                        float(px.mean()),
                        float(px.std()),
                        phash,
                        hashlib.sha256(data if data is not None else b"").hexdigest(),
                    ]
                )
            yield pd.DataFrame(
                rows,
                columns=list(id_cols)
                + ["n_bytes", "mean", "std", "phash", "sha256"],
            )

    return src.mapInPandas(run, schema=out_schema)


def probe_media(
    df: DataFrame,
    media_col: str = "media",
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Compressed-video media struct → container metadata row
    (id_cols..., container, brand, duration_ms, width, height,
    video_codec, audio_codec, sample_rate, channels, n_tracks) via the
    zero-dependency ISO BMFF / EBML walks in
    :mod:`avro_spark.operators.media_probe`. Arrow-batched
    ``mapInPandas``, narrow — the metadata gate that runs BEFORE any
    external pixel-decode stage. Malformed containers surface as an
    ``error`` column instead of killing the job (bad files are a fact of
    life at 100 TB)."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("container", T.StringType()),
            T.StructField("brand", T.StringType()),
            T.StructField("duration_ms", T.DoubleType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("video_codec", T.StringType()),
            T.StructField("audio_codec", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_tracks", T.IntegerType()),
            T.StructField("error", T.StringType()),
        ]
    )
    src = df.select(
        *id_cols,
        F.col(media_col).getField("data").alias("_data"),
        F.col(media_col).getField("mime").alias("_mime"),
    )
    meta_keys = (
        "container", "brand", "duration_ms", "width", "height",
        "video_codec", "audio_codec", "sample_rate", "channels", "n_tracks",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_probe import probe_media_bytes

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = row["_data"]
                try:
                    m = probe_media_bytes(
                        bytes(data) if data is not None else b"", row["_mime"]
                    )
                    err = None
                except (ValueError, IndexError, NotImplementedError) as ex:
                    m = {k: None for k in meta_keys}
                    err = f"{type(ex).__name__}: {ex}"
                rows.append(
                    [row[c] for c in id_cols]
                    + [m[k] for k in meta_keys]
                    + [err]
                )
            yield pd.DataFrame(
                rows, columns=list(id_cols) + list(meta_keys) + ["error"]
            )

    return src.mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    decoder: str = "fake",
) -> DataFrame:
    """Re-encode every item at (width, height).

    ``decoder='real'``: decode via :mod:`media_codecs`, nearest-neighbor
    resample, re-encode in the SAME container format (PNG→PNG, BMP→BMP,
    PNM→PNM). Fake decoder: tiles/crops the deterministic pixel tensor and
    re-packs its raw bytes."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codecs

        for pdf in batches:
            col = pdf[media_col]
            new = []
            for m in col:
                # NULL media structs / NULL payloads pass through
                # untouched (matching the fake path) instead of dying in
                # dict(None)/bytes(None) TypeErrors on the executor
                if m is None:
                    new.append(None)
                    continue
                d = dict(m.asDict() if hasattr(m, "asDict") else m)
                if d.get("data") is None:
                    new.append(d)
                    continue
                if decoder == "real":
                    px = media_codecs.decode_media(
                        bytes(d["data"]), d["mime"], d.get("width"), d.get("height")
                    )
                    out_px = media_codecs.resize_nearest(px, width, height)
                    d["data"] = media_codecs.encode_media(out_px, d["mime"])
                else:
                    px = _fake_pixels(d["data"])
                    tiled = np.tile(px, (height // FAKE_DIM + 1, width // FAKE_DIM + 1))
                    d["data"] = tiled[:height, :width].tobytes()
                d["width"], d["height"] = width, height
                new.append(d)
            pdf = pdf.copy()
            pdf[media_col] = new
            yield pdf

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    media_col: str = "media",
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Video → one output row per sampled frame index (id_cols..., frame_no
    int, frame binary). Frame count comes from metadata; the payload is
    sliced into n_frames equal chunks and must divide evenly — a
    trailing remainder would otherwise be silently dropped from the
    last frame."""
    if every_n < 1:
        # validate on the DRIVER: every_n=0 would raise a range() error
        # inside every executor task, every_n<0 would silently emit
        # nothing
        raise ValueError(f"sample_frames: every_n must be >= 1, got {every_n}")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    src = df.select(
        *id_cols,
        F.col(media_col).getField("data").alias("_data"),
        F.coalesce(F.col(media_col).getField("n_frames"), F.lit(1)).alias("_nf"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data, nf = row["_data"] or b"", max(int(row["_nf"]), 1)
                if len(data) % nf:
                    raise ValueError(
                        f"sample_frames: payload of {len(data)} bytes is "
                        f"not a multiple of n_frames={nf}"
                    )
                sz = max(len(data) // nf, 1)
                for fi in range(0, nf, every_n):
                    rows.append(
                        [row[c] for c in id_cols] + [fi, data[fi * sz : (fi + 1) * sz]]
                    )
            yield pd.DataFrame(rows, columns=list(id_cols) + ["frame_no", "frame"])

    return src.mapInPandas(run, schema=out_schema)


def _hex64_to_long(h: Column) -> Column:
    """16-hex-char string → the same 64 bits as a (possibly negative)
    long; Java's modular shift makes the high half land on the sign bit
    exactly as 2's complement requires."""
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def media_phash_pairs(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    max_hamming: int = 3,
    decoder: str = "fake",
) -> DataFrame:
    """Near-duplicate media items: (id_a, id_b, hamming) pairs whose
    64-bit perceptual hashes differ in ≤ ``max_hamming`` bits — image
    dedup for a multimodal corpus (re-encoded/resized copies keep their
    8×8 luminance structure, so their phashes stay within a few bits).

    Decode + phash run once per item in the Arrow-batched Python stage
    (:func:`decode_features`); candidate generation is the pigeonhole
    (chunk, value) join of :func:`avro_spark.functions.dedup.
    signature_pairs` — shuffle keys are chunk values, never pixels, and
    never all-pairs. ``decoder='real'`` phashes real PNG/BMP/PNM/JPEG
    pixels; the default fake decoder keeps the plumbing testable without
    image fixtures."""
    from ..functions.dedup import signature_pairs

    feats = decode_features(df, media_col=media_col, id_cols=(id_col,), decoder=decoder)
    # native id type: signature_pairs only needs orderable ids, and a long
    # cast would crash (ANSI) or silently null (legacy) string/UUID ids —
    # same rule as dedup.exact_dedup_groups
    sigs = feats.select(
        F.col(id_col).alias("_id"),
        _hex64_to_long(F.col("phash")).alias("_sig"),
    )
    return signature_pairs(sigs, max_hamming=max_hamming)
