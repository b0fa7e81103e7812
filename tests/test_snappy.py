"""From-scratch snappy codec (sources/snappy_codec.py): round-trip fuzz,
full-format decode coverage (1/2/4-byte offsets, overlapping copies,
long literals), corruption guards, and the Avro-framing CRC wrapper.

The JVM twin (AvroCodecUDF.snappyDecompress) is pinned to this module by
the cross-engine OCF tests in test_jvm_ocf.py (write python → read jvm
covers Python-compress / Java-decompress on every zoo shape).
"""

from __future__ import annotations

import os
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from avro_spark.errors import AvroSparkError
from avro_spark.sources.snappy_codec import (
    _write_varint,
    compress,
    decompress,
)


def _varint(v: int) -> bytes:
    out = bytearray()
    _write_varint(out, v)
    return bytes(out)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_random(data):
    assert decompress(compress(data)) == data


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcab ", max_size=4096))
def test_roundtrip_repetitive(text):
    data = text.encode()
    z = compress(data)
    assert decompress(z) == data


def test_roundtrip_structured_corpora():
    words = [os.urandom(9) for _ in range(7)]
    import random

    rng = random.Random(11)
    for n in (0, 1, 3, 4, 63, 64, 65, 255, 256, 4096, 1 << 17):
        for data in (
            bytes(n),  # constant → offset-1 overlapping copies
            os.urandom(n),  # incompressible → literals
            b"".join(rng.choice(words) for _ in range(n // 8)),
        ):
            assert decompress(compress(data)) == data, n


def test_decodes_all_copy_forms():
    """The compressor emits only 2-byte-offset copies; the decoder must
    take all three offset widths (a foreign writer may use any)."""
    base = b"abcdefgh"
    # literal "abcdefgh", then copy len 8 off 8 via each offset width
    lit = bytes([(8 - 1) << 2]) + base
    c1 = bytes([((8 - 4) << 2) | (0 << 5) | 1, 8])  # 1-byte offset, len 8
    c2 = bytes([((8 - 1) << 2) | 2, 8, 0])  # 2-byte offset
    c4 = bytes([((8 - 1) << 2) | 3, 8, 0, 0, 0])  # 4-byte offset
    for copy in (c1, c2, c4):
        stream = _varint(16) + lit + copy
        assert decompress(stream) == base * 2, copy
    # overlapping copy: offset 1, len 7 repeats the last byte
    stream = _varint(15) + lit + bytes([((7 - 1) << 2) | 2, 1, 0])
    assert decompress(stream) == base + b"h" * 7
    # 60..63 long-literal length encodings
    for nb, n in ((1, 100), (2, 300), (3, 70000), (4, 70000)):
        payload = os.urandom(n)
        head = bytes([(59 + nb) << 2]) + (n - 1).to_bytes(nb, "little")
        assert decompress(_varint(n) + head + payload) == payload


@pytest.mark.parametrize(
    "stream, msg",
    [
        (b"", "truncated length preamble"),
        (bytes([0x80] * 6), "length preamble overflow"),
        (_varint(5) + bytes([(9 - 1) << 2]) + b"abc", "literal runs past input"),
        (_varint(2) + bytes([(3 - 1) << 2]) + b"abc", "literal overflows output"),
        (_varint(8) + bytes([(4 - 1) << 2]) + b"abcd"
         + bytes([((4 - 4) << 2) | 1]), "truncated copy"),
        (_varint(8) + bytes([(4 - 1) << 2]) + b"abcd"
         + bytes([((4 - 1) << 2) | 2, 9, 0]), "copy offset 9 outside"),
        (_varint(8) + bytes([(4 - 1) << 2]) + b"abcd"
         + bytes([((4 - 1) << 2) | 2, 0, 0]), "copy offset 0 outside"),
        (_varint(6) + bytes([(4 - 1) << 2]) + b"abcd"
         + bytes([((8 - 1) << 2) | 2, 4, 0]), "copy overflows output"),
        (_varint(9) + bytes([(4 - 1) << 2]) + b"abcd"
         + bytes([((4 - 1) << 2) | 2, 4, 0]), "produced 8 bytes"),
    ],
)
def test_corrupt_streams_raise_loudly(stream, msg):
    with pytest.raises(AvroSparkError, match=msg):
        decompress(stream)


def test_avro_block_wrapper_crc():
    """_codec_pair('snappy') = snappy stream + big-endian CRC32 of the
    UNCOMPRESSED data (Avro spec); a flipped payload bit fails the CRC."""
    from avro_spark.sources.avro_ocf import _codec_pair

    comp, dec = _codec_pair("snappy")
    data = b"snappy is the most common real-world OCF codec " * 40
    blk = comp(data)
    assert blk[-4:] == (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
    assert dec(blk) == data
    bad = bytearray(blk)
    bad[5] ^= 0x40
    with pytest.raises(AvroSparkError, match="CRC mismatch|snappy"):
        dec(bytes(bad))
    with pytest.raises(AvroSparkError, match="shorter than its CRC"):
        dec(b"ab")


def test_compression_is_real():
    """Not an all-literals stub: repetitive input must actually shrink."""
    data = (b"the quick brown fox jumps over the lazy dog. " * 1000)
    assert len(compress(data)) < len(data) // 5


def test_giant_preamble_rejected_before_allocation():
    """Self-review r7: a 6-byte preamble claiming ~1 TB must raise the
    loud corruption error BEFORE bytearray(ulen) OOM-kills the worker —
    the densest legal element emits 64 bytes from 3, so >32× the
    remaining input is provably corrupt."""
    huge = _varint(1 << 40) + b"\x00" * 10
    with pytest.raises(AvroSparkError, match="preamble claims"):
        decompress(huge)
    # legitimate high-expansion streams still decode: 1 MB of zeros
    # compresses to ~50 KB of chained copies (ratio ~21x < 32x cap)
    data = bytes(1 << 20)
    assert decompress(compress(data)) == data


def test_jvm_compressor_byte_parity(spark):
    """r8: the Java snappyCompress mirrors this module's algorithm
    byte-for-byte (same hash-latest-position table, skip acceleration,
    2-byte-offset copies) — identical streams for identical input, so
    cross-engine written files differ only in sync markers. Driven
    through the CompressBlock UDF (codec framing adds the 4-byte CRC,
    stripped here). Also pins deflate: zlib and java.util.zip share the
    same library defaults."""
    import os as _os
    import zlib as _zlib

    from pyspark.sql import functions as F

    from avro_spark import jvm as J

    if J.ensure_jar() is None or not J.jvm_codec_available(spark):
        pytest.skip("no JDK")
    import random

    rng = random.Random(99)
    cases = [
        b"", b"abc", b"a" * 500, rng.randbytes(20000),
        b"hello world " * 3000,
        b"".join(rng.choice([b"alpha", b"beta", b"gamma", b"delta"])
                 for _ in range(10000)),
        bytes(range(256)) * 7,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, body binary")
    got = {
        r["i"]: bytes(r["data"])
        for r in J.compress_blocks_jvm(df, "snappy", None).collect()
    }
    for i, c in enumerate(cases):
        want = compress(c)
        assert got[i][:-4] == want, (i, len(c))
        # and the CRC suffix is the spec's big-endian CRC32 of the input
        assert got[i][-4:] == (_zlib.crc32(c) & 0xFFFFFFFF).to_bytes(4, "big")
    got_d = {
        r["i"]: bytes(r["data"])
        for r in J.compress_blocks_jvm(df, "deflate", None).collect()
    }
    for i, c in enumerate(cases):
        assert got_d[i] == _zlib.compress(c)[2:-4], ("deflate", i)
    # randomized sweep, one DataFrame pass: mixed repetitive/random
    # shapes chosen to exercise literals, short/long/overlapping copies
    # and the skip accelerator
    fuzz = []
    for seed in range(40):
        r = random.Random(seed)
        kind = seed % 4
        if kind == 0:
            fuzz.append(r.randbytes(r.randint(0, 3000)))
        elif kind == 1:
            w = r.randbytes(r.randint(1, 9))
            fuzz.append(w * r.randint(1, 4000))
        elif kind == 2:
            fuzz.append(b"".join(
                r.choice([b"ab", b"abc", r.randbytes(3)])
                for _ in range(r.randint(0, 2000))))
        else:
            fuzz.append(bytes(r.randint(0, 3) for _ in
                              range(r.randint(0, 5000))))
    fdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(fuzz)], "i int, body binary")
    got_f = {
        r["i"]: bytes(r["data"])
        for r in J.compress_blocks_jvm(fdf, "snappy", None).collect()
    }
    for i, c in enumerate(fuzz):
        assert got_f[i][:-4] == compress(c), ("fuzz", i, len(c))
        assert decompress(got_f[i][:-4]) == c, ("fuzz-rt", i)
