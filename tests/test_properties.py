"""Property-based tests (hypothesis) for the pure-Python paths:
Avro binary codec round-trips, int/long boundary semantics
(SURVEY.md §7 hard parts: "property-test the edges"), varint zigzag,
and fingerprint canonicalization invariance."""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import avro_spark as avs
from avro_spark.errors import DataValidationError
from avro_spark.sources.avro_binary import (
    _read_long,
    _write_long,
    decode_record,
    encode_record,
)

I32 = 2**31
I64 = 2**63

EVERYTHING = avs.create(
    {
        "type": "record",
        "name": "Everything",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "opt", "type": ["null", "long"]},
        ],
    }
)


def f32(x: float) -> float:
    """Round-trip a double through float32 (what the codec stores)."""
    import struct

    return struct.unpack("<f", struct.pack("<f", x))[0]


record_strategy = st.fixed_dictionaries(
    {
        "b": st.booleans(),
        "i": st.integers(min_value=-I32, max_value=I32 - 1),
        "l": st.integers(min_value=-I64, max_value=I64 - 1),
        "f": st.floats(width=32, allow_nan=False),
        "d": st.floats(allow_nan=False),
        "s": st.text(max_size=50),
        "by": st.binary(max_size=50),
        "e": st.sampled_from(["A", "B", "C"]),
        "fx": st.binary(min_size=4, max_size=4),
        "arr": st.lists(st.integers(min_value=-I64, max_value=I64 - 1), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
        "opt": st.one_of(st.none(), st.integers(min_value=-I64, max_value=I64 - 1)),
    }
)


class TestCodecProperties:
    @given(rec=record_strategy)
    @settings(max_examples=200, deadline=None)
    def test_binary_roundtrip(self, rec):
        blob = encode_record(EVERYTHING, rec)
        back = decode_record(EVERYTHING, blob)
        assert back["b"] == rec["b"]
        assert back["i"] == rec["i"]
        assert back["l"] == rec["l"]
        assert back["f"] == pytest.approx(f32(rec["f"]), nan_ok=True) or (
            math.isinf(back["f"]) and math.isinf(f32(rec["f"]))
        )
        assert back["d"] == rec["d"]
        assert back["s"] == rec["s"]
        assert back["by"] == rec["by"]
        assert back["e"] == rec["e"]
        assert back["fx"] == rec["fx"]
        assert back["arr"] == rec["arr"]
        assert back["m"] == rec["m"]
        assert back["opt"] == rec["opt"]

    @given(n=st.integers(min_value=-I64, max_value=I64 - 1))
    @settings(max_examples=300, deadline=None)
    def test_zigzag_varint_roundtrip(self, n):
        buf = bytearray()
        _write_long(buf, n)
        got, pos = _read_long(bytes(buf), 0)
        assert got == n and pos == len(buf)


class TestBoundaryProperties:
    INT_SCHEMA = avs.create(
        {"type": "record", "name": "I", "fields": [{"name": "v", "type": "int"}]}
    )
    LONG_SCHEMA = avs.create(
        {"type": "record", "name": "L", "fields": [{"name": "v", "type": "long"}]}
    )

    @given(v=st.integers(min_value=-I32, max_value=I32 - 1))
    @settings(max_examples=100, deadline=None)
    def test_int_in_range_validates(self, v):
        assert avs.validate(self.INT_SCHEMA, {"v": v})["v"] == v

    @given(v=st.one_of(
        st.integers(min_value=I32, max_value=I32 + 10**6),
        st.integers(min_value=-I32 - 10**6, max_value=-I32 - 1),
    ))
    @settings(max_examples=50, deadline=None)
    def test_int_out_of_range_rejected(self, v):
        with pytest.raises(DataValidationError):
            avs.validate(self.INT_SCHEMA, {"v": v})

    def test_exact_edges(self):
        # the int32/int64 fenceposts the reference handles explicitly
        # (frontend.lua:766-796)
        assert avs.validate(self.INT_SCHEMA, {"v": I32 - 1})["v"] == I32 - 1
        assert avs.validate(self.INT_SCHEMA, {"v": -I32})["v"] == -I32
        assert avs.validate(self.LONG_SCHEMA, {"v": I64 - 1})["v"] == I64 - 1
        assert avs.validate(self.LONG_SCHEMA, {"v": -I64})["v"] == -I64
        for bad in (I32, -I32 - 1):
            with pytest.raises(DataValidationError):
                avs.validate(self.INT_SCHEMA, {"v": bad})
        for bad in (I64, -I64 - 1):
            with pytest.raises(DataValidationError):
                avs.validate(self.LONG_SCHEMA, {"v": bad})

    @given(v=st.integers(min_value=-I64, max_value=I64 - 1))
    @settings(max_examples=100, deadline=None)
    def test_long_codec_exact(self, v):
        blob = encode_record(self.LONG_SCHEMA, {"v": v})
        assert decode_record(self.LONG_SCHEMA, blob)["v"] == v


class TestFingerprintProperties:
    @given(perm=st.permutations(["name", "type", "fields"]))
    @settings(max_examples=20, deadline=None)
    def test_attr_order_irrelevant(self, perm):
        base = {
            "name": "R",
            "type": "record",
            "fields": [{"name": "a", "type": "int"}],
        }
        reordered = json.loads(
            json.dumps({k: base[k] for k in perm}, sort_keys=False)
        )
        assert (
            avs.fingerprint(avs.create(base)).hex()
            == avs.fingerprint(avs.create(reordered)).hex()
        )

    @given(ns=st.sampled_from(["x", "x.y", "a.b.c"]))
    @settings(max_examples=10, deadline=None)
    def test_namespace_vs_fullname_equivalent(self, ns):
        inline = avs.create(
            {"type": "record", "name": f"{ns}.R",
             "fields": [{"name": "a", "type": "int"}]}
        )
        split = avs.create(
            {"type": "record", "name": "R", "namespace": ns,
             "fields": [{"name": "a", "type": "int"}]}
        )
        assert avs.fingerprint(inline).hex() == avs.fingerprint(split).hex()


# ------------------------------------------------------------ JPEG codec
class TestJpegProperties:
    """Driver-side fuzz of the pure-numpy JPEG codec: arbitrary shapes,
    qualities, restart intervals, and sampling modes must round-trip
    within the lossy-compression error envelope and never crash."""

    @staticmethod
    def _psnr(a, b):
        import numpy as np

        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)

    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        gray=st.booleans(),
        quality=st.integers(30, 98),
        rst=st.integers(0, 4),
        sub=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_never_crashes_and_bounds_error(
        self, h, w, gray, quality, rst, sub, seed
    ):
        import numpy as np

        from avro_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        # smooth-ish content: random low-res upsampled (JPEG's model)
        base = rng.integers(0, 256, (max(1, h // 4), max(1, w // 4)), dtype=np.uint8)
        plane = np.repeat(np.repeat(base, 4, 0), 4, 1)[:h, :w]
        img = plane if gray else np.stack([plane, 255 - plane, plane // 2], -1)
        enc = encode_jpeg(img, quality=quality, restart_interval=rst,
                          subsample=sub and not gray)
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape
        assert dec.dtype == np.uint8
        # block-flat content must stay recognizable; low quality +
        # quarter-res chroma is legitimately lossy, so the floor is
        # generous — the load-bearing property is no crash / right shape
        assert self._psnr(img, dec) > 14

    @given(data=st.binary(min_size=0, max_size=64))
    @settings(max_examples=150, deadline=None)
    def test_garbage_never_hangs_or_segfaults(self, data):
        from avro_spark.operators.jpeg_codec import decode_jpeg

        try:
            decode_jpeg(b"\xff\xd8" + data)
        except (ValueError, NotImplementedError):
            pass  # the documented error contract — nothing else leaks


# ------------------------------------------------------------- BPE fold
class TestBpeProperties:
    @given(
        docs=st.lists(
            st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(
                " ".join
            ),
            min_size=1,
            max_size=8,
        ),
        merges=st.integers(1, 5),
    )
    @settings(max_examples=40, deadline=None)
    def test_train_matches_pure_python(self, spark, docs, merges):
        from collections import Counter

        from avro_spark.functions.retrieval import bpe_train

        df = spark.createDataFrame([(t,) for t in docs], "text string")
        merges_df, toks_df = bpe_train(df, num_merges=merges)
        # independent reference implementation
        seqs = [t.lower().split() for t in docs]
        want = []
        for step in range(merges):
            counts = Counter()
            for s in seqs:
                for a, b in zip(s, s[1:]):
                    counts[(a, b)] += 1
            if not counts:
                break
            (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            want.append((step, l, r, n))
            out_seqs = []
            for s in seqs:
                out = []
                for x in s:
                    if out and out[-1] == l and x == r:
                        out[-1] = l + r
                    else:
                        out.append(x)
                out_seqs.append(out)
            seqs = out_seqs
        got = [
            (r["step"], r["left"], r["right"], r["n_pairs"])
            for r in merges_df.orderBy("step").collect()
        ]
        assert got == want
        assert sorted(tuple(r["t"]) for r in toks_df.collect()) == sorted(
            tuple(s) for s in seqs
        )
