"""Large-value stress: the Spark analogue of the reference's
buf_grow_test.lua (t/v output-buffer reallocation under values far larger
than any initial capacity). Tungsten manages buffers for us; what must be
shown is that the same *workload shape* — long arrays, megabyte strings,
wide batches of them — flows through flatten/unflatten and the Avro byte
codec without truncation or corruption.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import avro_spark
from avro_spark.sources.avro_binary import (
    decode_record,
    encode_record,
    from_avro_bytes,
    to_avro_bytes,
)

# buf_grow_test.lua's FooBar record: three longs + a long array, streamed
# as an array of records; here one DataFrame row per record
FOOBAR = {
    "type": "record",
    "name": "FooBar",
    "fields": [
        {"name": "A", "type": "long"},
        {"name": "B", "type": "long"},
        {"name": "C", "type": "long"},
        {"name": "D", "type": {"type": "array", "items": "long"}},
    ],
}

BIGSTR = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "body", "type": "string"},
        {"name": "blob", "type": "bytes"},
    ],
}


def test_long_arrays_roundtrip(spark):
    rows = [(i, i * 2, i * 3, list(range(i * 1000))) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "A long, B long, C long, D array<long>")
    cs = avro_spark.compile(avro_spark.create(FOOBAR))
    back = cs.unflatten(cs.flatten(df)).orderBy("A").collect()
    assert [len(r["D"]) for r in back] == [i * 1000 for i in range(1, 9)]
    assert back[7]["D"][:3] == [0, 1, 2] and back[7]["D"][-1] == 7999


def test_long_arrays_avro_codec(spark):
    sch = avro_spark.create(FOOBAR)
    rec = {"A": 1, "B": 2, "C": 3, "D": list(range(200_000))}
    blob = encode_record(sch, rec)
    assert len(blob) > 200_000  # varints, ≥1 byte each
    assert decode_record(sch, blob) == rec


def test_megabyte_strings_through_spark_codec(spark):
    sch = avro_spark.create(BIGSTR)
    rows = [(i, "x" * (1 << 20) + str(i), bytes([i]) * (1 << 19)) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, body string, blob binary")
    out = from_avro_bytes(to_avro_bytes(df, sch, "b"), "b", sch)
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 4
    for i in range(4):
        assert len(got[i]["body"]) == (1 << 20) + len(str(i))
        assert got[i]["body"].endswith(str(i))
        assert bytes(got[i]["blob"]) == bytes([i]) * (1 << 19)


def test_deeply_wide_flatten(spark):
    """128-field record (past the reference's 15-field function-outlining
    threshold, compiler.lua:406-445) flattens and unflattens intact."""
    n = 128
    schema = {
        "type": "record",
        "name": "Wide",
        "fields": [{"name": f"f{i}", "type": "long"} for i in range(n)],
    }
    df = spark.createDataFrame(
        [tuple(range(n))], ", ".join(f"f{i} long" for i in range(n))
    )
    cs = avro_spark.compile(avro_spark.create(schema))
    flat = cs.flatten(df)
    assert len(flat.columns) == n
    row = cs.unflatten(flat).collect()[0]
    assert [row[f"f{i}"] for i in range(n)] == list(range(n))


class TestInt64ExactPrecision:
    """Longs with |v| > 2^53 must survive the PYTHON codec path exactly.

    Regression for the round-3 advisor's high finding: the pandas_udf
    encode path went Arrow→pandas, which renders nullable int64 columns
    (top-level and nested-struct children alike) as float64+NaN whenever
    the batch holds a null — silently rounding 2^53+1 → 2^53. The
    mapInArrow rewrite keeps exact Python ints end to end."""

    BIG = 9_007_199_254_740_993  # 2^53 + 1: not representable in float64

    NESTED = {
        "type": "record",
        "name": "Outer",
        "fields": [
            {"name": "m", "type": {"type": "map", "values": {
                "type": "record", "name": "Inner", "fields": [
                    {"name": "v", "type": ["null", "long"],
                     "default": None},
                ]}}},
        ],
    }

    def test_top_level_nullable_long_exact(self, spark):
        import avro_spark as avs

        sch = avs.create({
            "type": "record", "name": "R",
            "fields": [{"name": "id", "type": "long"},
                       {"name": "v", "type": ["null", "long"],
                        "default": None}],
        })
        # a null in the SAME batch is what flips pandas to float64 —
        # repartition(1) forces them into one batch (under local[N] the
        # 3 rows would otherwise scatter one-per-partition and never
        # exercise the mixed-batch case)
        df = spark.createDataFrame(
            [(1, self.BIG), (2, None), (3, -self.BIG)], "id long, v long"
        ).repartition(1)
        out = from_avro_bytes(
            to_avro_bytes(df, sch, "b", engine="python"), "b", sch,
            engine="python")
        got = {r["id"]: r["v"] for r in out.collect()}
        assert got == {1: self.BIG, 2: None, 3: -self.BIG}

    def test_nested_map_nullable_long_exact_and_jvm_parity(self, spark):
        """The advisor's falsifying shape: map<record{long*}> with a null
        sibling entry. Python bytes must decode exact AND match the JVM
        codec byte-for-byte (map order aside)."""
        import avro_spark as avs
        from avro_spark import jvm as J

        sch = avs.create(self.NESTED)
        row = ({"a0": (None,), "a1": (self.BIG,)},)
        df = spark.createDataFrame([row], sch.to_struct_type())
        bp = bytes(to_avro_bytes(df, sch, "b", engine="python")
                   .collect()[0].b)
        assert decode_record(sch, bp) == {
            "m": {"a0": {"v": None}, "a1": {"v": self.BIG}}}
        if J.ensure_jar() and J.jvm_codec_available(spark):
            bj = bytes(to_avro_bytes(df, sch, "b", engine="jvm")
                       .collect()[0].b)
            assert decode_record(sch, bj) == decode_record(sch, bp)

    def test_write_avro_files_nested_exact(self, spark, tmp_path):
        """The distributed OCF writer shares the same Arrow-native row
        extraction — exact ints through a full file round trip."""
        import avro_spark as avs
        from avro_spark.sources.avro_ocf import (
            read_avro_files,
            write_avro_files,
        )

        sch = avs.create({
            "type": "record", "name": "R",
            "fields": [{"name": "id", "type": "long"},
                       {"name": "v", "type": ["null", "long"],
                        "default": None}],
        })
        # one partition → one OCF block holds both the null and the
        # big long (the decode-corrupting mix)
        df = spark.createDataFrame(
            [(1, self.BIG), (2, None)], "id long, v long").repartition(1)
        path = str(tmp_path / "ocf_exact")
        write_avro_files(df, sch, path)
        got = {r["id"]: r["v"]
               for r in read_avro_files(spark, path, sch).collect()}
        assert got == {1: self.BIG, 2: None}
        # the split-read decode path shares the fix
        from avro_spark.sources.avro_ocf import read_avro_files_split

        got2 = {r["id"]: r["v"]
                for r in read_avro_files_split(
                    spark, path, sch, split_bytes=64).collect()}
        assert got2 == {1: self.BIG, 2: None}
