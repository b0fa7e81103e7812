"""Generic Hamming-signature pairing (dedup.signature_pairs) and
perceptual-hash media dedup (multimodal.media_phash_pairs)."""

from __future__ import annotations

import itertools
import random

import numpy as np
from pyspark.sql import functions as F

from avro_spark.functions.dedup import signature_pairs
from avro_spark.operators.multimodal import (
    _hex64_to_long,
    media_phash_pairs,
)


def _brute_pairs(sigs, max_hamming):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sigs, 2):
        if bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming:
            out.add((min(ia, ib), max(ia, ib)))
    return out


def _to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def test_signature_pairs_complete_vs_brute_force(spark):
    rng = random.Random(42)
    base = [rng.getrandbits(64) for _ in range(30)]
    sigs = []
    i = 0
    for b in base:
        sigs.append((i, b)); i += 1
        # a close copy: flip up to 6 random bits
        flipped = b
        for _ in range(rng.randint(0, 6)):
            flipped ^= 1 << rng.randrange(64)
        sigs.append((i, flipped)); i += 1
    df = spark.createDataFrame(
        [(i, _to_signed(s)) for i, s in sigs], "_id long, _sig long"
    )
    for mh in (1, 3, 6):
        got = {
            (r.id_a, r.id_b)
            for r in signature_pairs(df, max_hamming=mh).collect()
        }
        assert got == _brute_pairs(sigs, mh), mh


def test_hex64_to_long_roundtrip(spark):
    vals = [0, 1, 0x7FFFFFFFFFFFFFFF, 0x8000000000000000, 0xFFFFFFFFFFFFFFFF,
            0xDEADBEEFCAFEF00D]
    df = spark.createDataFrame([(f"{v:016x}",) for v in vals], "h string")
    out = [r.s for r in df.select(_hex64_to_long(F.col("h")).alias("s")).collect()]
    assert out == [_to_signed(v) for v in vals]


def _media_df(spark, payloads):
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id long, data binary")
    return df.select(
        "id",
        F.struct(
            F.col("data").alias("data"),
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def test_media_phash_pairs_identical_bytes_pair_up(spark):
    blob = bytes(range(256)) * 4
    other = b"completely different payload bytes" * 20
    df = _media_df(spark, [blob, blob, other])
    pairs = media_phash_pairs(df, "id", max_hamming=0).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {(0, 1, 0)}


def test_media_phash_pairs_string_ids(spark):
    """Non-numeric ids must survive (review catch: a long cast crashed
    ANSI mode on string/UUID ids)."""
    blob = bytes(range(256)) * 4
    rows = [("docA", bytearray(blob)), ("docB", bytearray(blob)),
            ("docC", b"other payload" * 30)]
    df = spark.createDataFrame(rows, "id string, data binary").select(
        "id",
        F.struct(
            F.col("data").alias("data"),
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media"),
    )
    pairs = media_phash_pairs(df, "id", max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("docA", "docB")}


def test_media_phash_pairs_real_decoder_finds_reencoded_copy(spark):
    """The same pixels encoded as PNG and BMP share a phash exactly —
    perceptual dedup across container formats."""
    from avro_spark.operators import media_codecs as mc

    rng = np.random.default_rng(7)
    px = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    other = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(mc.encode_media(px, "image/png")), "image/png"),
        (1, bytearray(mc.encode_media(px, "image/bmp")), "image/bmp"),
        (2, bytearray(mc.encode_media(other, "image/bmp")), "image/bmp"),
    ]
    df = spark.createDataFrame(rows, "id long, data binary, mime string").select(
        "id",
        F.struct(
            F.col("data").alias("data"),
            F.col("mime").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media"),
    )
    pairs = media_phash_pairs(df, "id", max_hamming=0, decoder="real").collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
