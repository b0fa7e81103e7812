"""Avro Object Container File source/sink tests: byte-level round-trips
(null + deflate codecs), Spark read/write round-trips against parquet
testdata, schema peeking, and third-party readability via a hand-rolled
block walk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import avro_spark as avs
from avro_spark.errors import AvroSparkError
from avro_spark.sources.avro_ocf import (
    read_avro_files,
    read_ocf_bytes,
    write_avro_files,
    write_ocf_bytes,
)

NATION = {
    "type": "record",
    "name": "Nation",
    "fields": [
        {"name": "n_nationkey", "type": "int"},
        {"name": "n_name", "type": "string"},
        {"name": "n_regionkey", "type": "int"},
    ],
}


class TestOcfBytes:
    def test_roundtrip_null_codec(self):
        s = avs.create(NATION)
        recs = [
            {"n_nationkey": i, "n_name": f"N{i}", "n_regionkey": i % 5}
            for i in range(10)
        ]
        blob = write_ocf_bytes(s, recs)
        assert blob[:4] == b"Obj\x01"
        s2, got = read_ocf_bytes(blob)
        assert got == recs
        assert s2.fingerprint() == s.fingerprint()

    def test_roundtrip_deflate(self):
        s = avs.create(NATION)
        recs = [
            {"n_nationkey": i, "n_name": "x" * 50, "n_regionkey": 0}
            for i in range(100)
        ]
        plain = write_ocf_bytes(s, recs, codec="null")
        packed = write_ocf_bytes(s, recs, codec="deflate")
        assert len(packed) < len(plain) / 2  # repetitive strings compress
        _, got = read_ocf_bytes(packed)
        assert got == recs

    def test_multi_block(self):
        s = avs.create(NATION)
        recs = [
            {"n_nationkey": i, "n_name": str(i), "n_regionkey": 0} for i in range(25)
        ]
        blob = write_ocf_bytes(s, recs, block_records=7)  # 4 blocks
        _, got = read_ocf_bytes(blob)
        assert got == recs

    def test_bad_magic(self):
        with pytest.raises(AvroSparkError, match="magic"):
            read_ocf_bytes(b"PAR1xxxx")

    def test_empty_file_no_blocks(self):
        s = avs.create(NATION)
        blob = write_ocf_bytes(s, [])
        s2, got = read_ocf_bytes(blob)
        assert got == [] and s2.fingerprint() == s.fingerprint()


class TestOcfSpark:
    def test_spark_write_read_roundtrip(self, spark, sf_dir, tmp_path):
        s = avs.create(NATION)
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("int"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
        out = str(tmp_path / "nation_avro")
        summaries = write_avro_files(nation.repartition(3), s, out)
        assert sum(x["n_records"] for x in summaries) == nation.count()
        assert all(x["file"].endswith(".avro") for x in summaries)

        back = read_avro_files(spark, out, s)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))

    def test_spark_read_peeks_writer_schema(self, spark, sf_dir, tmp_path):
        s = avs.create(NATION)
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("int"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
        out = str(tmp_path / "nation_avro2")
        write_avro_files(nation, s, out, codec="deflate")
        back = read_avro_files(spark, out)  # schema=None → peek from header
        assert back.columns == ["n_nationkey", "n_name", "n_regionkey"]
        assert back.count() == nation.count()

    def test_nested_record_roundtrip(self, spark, tmp_path):
        schema = avs.create(
            {
                "type": "record",
                "name": "Doc",
                "fields": [
                    {"name": "id", "type": "long"},
                    {
                        "name": "meta",
                        "type": {
                            "type": "record",
                            "name": "Meta",
                            "fields": [
                                {"name": "lang", "type": "string"},
                                {"name": "score", "type": "double"},
                            ],
                        },
                    },
                    {"name": "tags", "type": {"type": "array", "items": "string"}},
                ],
            }
        )
        df = spark.createDataFrame(
            [(1, ("en", 0.5), ["a", "b"]), (2, ("de", 0.25), [])],
            schema.to_struct_type(),
        )
        out = str(tmp_path / "docs_avro")
        write_avro_files(df, schema, out)
        back = read_avro_files(spark, out, schema)
        assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


# ------------------------------------------------- review-fix regressions
def test_write_files_column_order_independent(spark, tmp_path):
    """Columns must bind BY NAME — a reordered DataFrame once zipped
    positionally against schema order and swapped the data."""
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]})
    df = spark.createDataFrame([("hello", 7)], "b string, a long")
    write_avro_files(df, sch, str(tmp_path / "o1"))
    _, recs = read_ocf_bytes(
        open(next((tmp_path / "o1").glob("part-*.avro")), "rb").read()
    )
    assert recs == [{"a": 7, "b": "hello"}]


def test_write_files_overwrite_clears_stale_parts(spark, tmp_path):
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}]})
    d = str(tmp_path / "o2")
    write_avro_files(spark.range(10).select(F.col("id").alias("a")).repartition(4), sch, d)
    n4 = len(list((tmp_path / "o2").glob("part-*.avro")))
    write_avro_files(spark.range(3).select(F.col("id").alias("a")).repartition(1), sch, d)
    files = list((tmp_path / "o2").glob("part-*.avro"))
    assert len(files) < n4  # stale parts removed
    total = sum(len(read_ocf_bytes(open(f, "rb").read())[1]) for f in files)
    assert total == 3
    import pytest as _pytest

    with _pytest.raises(Exception, match="target not empty"):
        write_avro_files(spark.range(1).select(F.col("a") if False else F.col("id").alias("a")), sch, d, mode="error")


def test_nan_roundtrips_nonnullable_double(spark, tmp_path):
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "d", "type": "double"}]})
    df = spark.createDataFrame([(float("nan"),), (1.5,)], "d double").coalesce(1)
    write_avro_files(df, sch, str(tmp_path / "o3"))
    recs = []
    for f in (tmp_path / "o3").glob("part-*.avro"):
        recs += read_ocf_bytes(open(f, "rb").read())[1]
    vals = [r["d"] for r in recs]
    assert len(vals) == 2 and 1.5 in vals
    assert sum(1 for v in vals if v != v) == 1  # NaN survived


def test_corrupt_block_header_raises_avro_error(spark):
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}]})
    blob = write_ocf_bytes(sch, [{"a": 1}])
    # truncate mid block header
    import pytest as _pytest

    with _pytest.raises(Exception, match="corrupt OCF|truncated"):
        read_ocf_bytes(blob[: len(blob) - 18] + b"\xfe\xff")
