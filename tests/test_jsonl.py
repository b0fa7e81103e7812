"""JSONL source/sink tests: schema-first read, round-trip identity,
corrupt-record capture."""

from __future__ import annotations

import pytest

import avro_spark
from avro_spark.sources.jsonl import read_jsonl, write_jsonl

DOC = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
    ],
}


def test_roundtrip_identity(spark, tmp_path):
    sch = avro_spark.create(DOC)
    rows = [(1, "hello\nworld"), (2, None), (3, 'quo"tes and \\ slashes')]
    df = spark.createDataFrame(rows, sch.to_struct_type())
    out = str(tmp_path / "docs")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, sch)
    # Spark's JSON source marks every read column nullable; names/types
    # must match the contract exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in sch.to_struct_type().fields
    ]
    assert sorted(map(tuple, back.collect())) == rows


def test_schema_first_types(spark, tmp_path):
    # without a schema Spark would infer doc_id as long anyway, but the
    # contract type must hold even when every value is small
    sch = avro_spark.create(DOC)
    out = str(tmp_path / "docs")
    write_jsonl(spark.createDataFrame([(1, "x")], sch.to_struct_type()), out)
    got = read_jsonl(spark, out, sch)
    assert [f.dataType.typeName() for f in got.schema.fields] == ["long", "string"]


def test_corrupt_record_capture(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "part-0.json").write_text('{"doc_id": 1, "text": "ok"}\n{not json\n')
    got = read_jsonl(spark, str(d), avro_spark.create(DOC), corrupt_col="_corrupt")
    rows = got.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] is None


def test_failfast_raises(spark, tmp_path):
    d = tmp_path / "bad2"
    d.mkdir()
    (d / "part-0.json").write_text('{"doc_id": 1}\nnope\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(d), avro_spark.create(DOC), mode="FAILFAST").collect()


def test_non_record_schema_rejected(spark, tmp_path):
    with pytest.raises(Exception, match="record"):
        read_jsonl(spark, str(tmp_path), avro_spark.create("int"))


class TestCsvSource:
    """CSV source/sink: schema-first read, flat-record gate, corrupt capture."""

    def test_roundtrip(self, spark, tmp_path):
        from avro_spark.sources.csv import read_csv, write_csv

        sch = avro_spark.create({"type": "record", "name": "T", "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": ["null", "double"]}]})
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, None), (3, "c,d", -2.0)],
            "id long, name string, score double")
        write_csv(df, str(tmp_path / "out"))
        back = read_csv(spark, str(tmp_path / "out"), sch)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    def test_nested_schema_rejected(self, spark):
        from avro_spark.errors import AvroSparkError
        from avro_spark.sources.csv import read_csv

        sch = avro_spark.create({"type": "record", "name": "T", "fields": [
            {"name": "id", "type": "long"},
            {"name": "tags", "type": {"type": "array", "items": "string"}}]})
        with pytest.raises(AvroSparkError, match="flatten"):
            read_csv(spark, "/nonexistent", sch)

    def test_failfast_on_bad_cell(self, spark, tmp_path):
        from avro_spark.sources.csv import read_csv

        p = tmp_path / "bad"
        p.mkdir()
        (p / "x.csv").write_text("id,name\n1,a\nnotanint,b\n")
        sch = avro_spark.create({"type": "record", "name": "T", "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "name", "type": ["null", "string"]}]})
        with pytest.raises(Exception):
            read_csv(spark, str(p), sch, mode="FAILFAST").collect()
        # PERMISSIVE nulls the bad cell instead
        rows = read_csv(spark, str(p), sch).orderBy("name").collect()
        assert rows[0]["id"] == 1 and rows[1]["id"] is None


def test_read_jsonl_avro_conventions(spark, tmp_path):
    """avro_conventions=True: record-form union values and defaults parse
    into the tagged union struct — shapes Spark's from_json cannot map."""
    import avro_spark as avs

    p = tmp_path / "u.jsonl"
    p.write_text(
        '{"id": 1, "payload": {"int": 42}}\n'
        '{"id": 2, "payload": {"string": "hi"}, "tag": "x"}\n'
        '{"id": 3, "payload": null}\n'
    )
    sch = avs.create({
        "type": "record", "name": "E",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": ["null", "int", "string"]},
            {"name": "tag", "type": "string", "default": "none"},
        ],
    })
    from avro_spark.sources.jsonl import read_jsonl

    out = {r.id: r for r in read_jsonl(
        spark, str(p), sch, avro_conventions=True).collect()}
    assert out[1].payload["$type$"] == 1 and out[1].payload["int"] == 42
    assert out[2].payload["string"] == "hi" and out[2].tag == "x"
    assert out[3].payload["$type$"] == 0 and out[3].tag == "none"


def test_read_jsonl_avro_conventions_corrupt_handling(spark, tmp_path):
    import avro_spark as avs
    from avro_spark.sources.jsonl import read_jsonl

    p = tmp_path / "c.jsonl"
    p.write_text('{"id": 1}\nnot json at all\n{"id": 3}\n')
    sch = avs.create({"type": "record", "name": "R",
                      "fields": [{"name": "id", "type": ["null", "long"]}]})
    rows = read_jsonl(spark, str(p), sch, avro_conventions=True,
                      corrupt_col="_bad").collect()
    bad = [r for r in rows if r._bad is not None]
    assert len(bad) == 1 and bad[0]._bad == "not json at all"
    with pytest.raises(Exception, match="malformed JSON line"):
        read_jsonl(spark, str(p), sch, mode="FAILFAST",
                   avro_conventions=True).collect()
