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


# --------------------------------------------- AVRO-convention sink (r3)
class TestWriteJsonlAvro:
    SCHEMA = {
        "type": "record",
        "name": "Z",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "maybe", "type": ["null", "int"]},
            {"name": "u", "type": ["null", "double", "string"]},
            {"name": "blob", "type": "bytes"},
            {"name": "key4", "type": {"type": "fixed", "name": "K4", "size": 4}},
            {"name": "status", "type": {
                "type": "enum", "name": "St", "symbols": ["A", "B"]}},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "sub", "type": {
                "type": "record", "name": "Sub",
                "fields": [{"name": "x", "type": "int*"}]}},
        ],
    }
    ROWS = [
        (1, 'he said "hi"', 7, (1, 2.5, None), bytearray(b"\xca\xfe"),
         bytearray(b"\x01\x02\x03\x04"), "A", ["a", "b"], {"k": 9}, (5,)),
        (2, "plain", None, (2, None, "s"), bytearray(b""),
         bytearray(b"\xff\x00\xff\x00"), "B", [], {}, (None,)),
        (3, "nullu", None, (0, None, None), bytearray(b"\x00"),
         bytearray(b"\x00\x00\x00\x00"), "A", ["x"], {"m": 1, "n": 2}, (3,)),
    ]

    def _write(self, spark, tmp_path):
        from avro_spark.sources.jsonl import write_jsonl_avro

        sch = avro_spark.create(self.SCHEMA)
        df = spark.createDataFrame(self.ROWS, sch.to_struct_type())
        out = str(tmp_path / "conv")
        write_jsonl_avro(df, sch, out)
        return sch, out

    def test_roundtrip_through_conventions_reader(self, spark, tmp_path):
        from avro_spark.sources.jsonl import read_jsonl

        sch, out = self._write(spark, tmp_path)
        back = read_jsonl(
            spark, out, schema=sch, avro_conventions=True,
            binary_key="$binary", mode="FAILFAST",
        )
        got = {r.id: r for r in back.collect()}
        assert len(got) == 3
        r1 = got[1]
        assert r1.name == 'he said "hi"' and r1.maybe == 7
        assert (r1.u["$type$"], float(r1.u["double"])) == (1, 2.5)
        assert bytes(r1.blob) == b"\xca\xfe" and bytes(r1.key4) == b"\x01\x02\x03\x04"
        assert r1.status == "A" and list(r1.tags) == ["a", "b"]
        assert dict(r1.props) == {"k": 9} and r1.sub.x == 5
        r2 = got[2]
        assert r2.maybe is None and (r2.u["$type$"], r2.u["string"]) == (2, "s")
        assert bytes(r2.blob) == b"" and r2.sub.x is None
        r3 = got[3]
        # parse_json_typed's convention: JSON null for a general union →
        # the null-branch tagged struct (tag 0, all value fields null)
        assert r3.u["$type$"] == 0 and r3.u["double"] is None and r3.u["string"] is None

    def test_line_forms(self, spark, tmp_path):
        """The emitted text uses the reference corpus's exact value
        conventions: single-entry union maps, $binary hex, symbol
        strings."""
        import glob
        import json as _json

        _sch, out = self._write(spark, tmp_path)
        lines = []
        for f in glob.glob(out + "/part-*"):
            with open(f) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
        by_id = {_json.loads(ln)["id"]: _json.loads(ln) for ln in lines}
        assert by_id[1]["u"] == {"double": 2.5}
        assert by_id[1]["maybe"] == {"int": 7}
        assert by_id[1]["blob"] == {"$binary": "CAFE"}
        assert by_id[1]["key4"] == {"$binary": "01020304"}
        assert by_id[1]["status"] == "A"
        assert by_id[2]["u"] == {"string": "s"}
        assert by_id[2]["maybe"] is None
        assert by_id[3]["u"] is None

    def test_default_args_binary_roundtrip(self, spark, tmp_path):
        """binary_key defaults agree between sink and conventions reader:
        write + read with NO binary_key argument must round-trip bytes."""
        from avro_spark.sources.jsonl import read_jsonl, write_jsonl_avro

        sch = avro_spark.create(self.SCHEMA)
        df = spark.createDataFrame(self.ROWS, sch.to_struct_type())
        out = str(tmp_path / "defaults")
        write_jsonl_avro(df, sch, out)
        back = {r.id: r for r in read_jsonl(
            spark, out, schema=sch, avro_conventions=True, mode="FAILFAST",
        ).collect()}
        assert bytes(back[1].blob) == b"\xca\xfe"
        assert bytes(back[1].key4) == b"\x01\x02\x03\x04"

    def test_any_field_roundtrips_as_json(self, spark, tmp_path):
        """'any' columns hold JSON text; the sink inlines (not re-quotes)
        it, so the value is stable across write/read cycles."""
        import glob
        import json as _json

        from avro_spark.sources.jsonl import read_jsonl, write_jsonl_avro

        sch = avro_spark.create({
            "type": "record", "name": "A",
            "fields": [{"name": "id", "type": "long"},
                       {"name": "a", "type": "any"}],
        })
        df = spark.createDataFrame(
            [(1, '{"k": 1, "l": [true, null]}'), (2, '[1,2]'),
             (3, '"str"'), (4, '7')],
            sch.to_struct_type(),
        )
        out = str(tmp_path / "anyv")
        write_jsonl_avro(df, sch, out)
        for f in glob.glob(out + "/part-*"):
            with open(f) as fh:
                for ln in fh.read().splitlines():
                    if not ln:
                        continue
                    obj = _json.loads(ln)
                    if obj["id"] == 1:
                        assert obj["a"] == {"k": 1, "l": [True, None]}
        back = {r.id: r.a for r in read_jsonl(
            spark, out, schema=sch, avro_conventions=True, mode="FAILFAST",
        ).collect()}
        assert _json.loads(back[1]) == {"k": 1, "l": [True, None]}
        assert _json.loads(back[2]) == [1, 2]
        assert _json.loads(back[3]) == "str"
        assert _json.loads(back[4]) == 7
        # write(read(write(x))) == write(x): canonical text is a fixed point
        sch2, out2 = sch, str(tmp_path / "anyv2")
        df2 = spark.createDataFrame(
            [(k, v) for k, v in sorted(back.items())], sch.to_struct_type())
        write_jsonl_avro(df2, sch2, out2)
        back2 = {r.id: r.a for r in read_jsonl(
            spark, out2, schema=sch, avro_conventions=True, mode="FAILFAST",
        ).collect()}
        assert back2 == back

    def test_non_json_any_value_raises(self, spark, tmp_path):
        from avro_spark.sources.jsonl import write_jsonl_avro

        sch = avro_spark.create({
            "type": "record", "name": "A",
            "fields": [{"name": "a", "type": "any"}],
        })
        df = spark.createDataFrame([("not json",)], sch.to_struct_type())
        with pytest.raises(Exception):
            write_jsonl_avro(df, sch, str(tmp_path / "bad"))

    def test_fuzz_conventions_sink_roundtrip(self, spark, tmp_path):
        """Random schemas + conforming values through write_jsonl_avro →
        read_jsonl(avro_conventions): exact struct-form identity. The
        review pass caught two silent-corruption bugs in this sink
        ('any' re-quoting, binary_key default skew) — fuzz the whole
        value space so the next one can't hide."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from avro_spark.sources.jsonl import read_jsonl, write_jsonl_avro
        from ddt_helpers import to_row_value
        from test_fuzz_roundtrip import _Gen, _ddt_form, _deep_eq, _root_record

        counter = [0]

        @given(data=st.data())
        @settings(max_examples=12, deadline=None)
        def run(data):
            gen = _Gen(data.draw)
            schema_dict = _root_record(gen)
            sch = avro_spark.create(schema_dict)
            norm = avro_spark.validate(sch, gen.value(schema_dict))
            row = to_row_value(sch.root, _ddt_form(norm))
            df = spark.createDataFrame([row], sch.to_struct_type())
            counter[0] += 1
            out = str(tmp_path / f"fz{counter[0]}")
            write_jsonl_avro(df, sch, out)
            back = read_jsonl(
                spark, out, schema=sch, avro_conventions=True,
                mode="FAILFAST",
            ).collect()[0]
            assert _deep_eq(row, back), (schema_dict, row, back)

        run()

    def test_null_for_union_without_null_branch_raises(self, spark, tmp_path):
        """A NULL cell of a no-null-branch union must fail the write, not
        emit a JSON null no branch can represent."""
        from avro_spark.sources.jsonl import write_jsonl_avro

        sch = avro_spark.create({
            "type": "record", "name": "N",
            "fields": [{"name": "u", "type": ["double", "string"]}],
        })
        from pyspark.sql import functions as F

        struct = sch.to_struct_type()
        df = spark.range(1).select(
            F.lit(None).cast(struct["u"].dataType).alias("u"))
        with pytest.raises(Exception, match="no\\s*null branch|raise_error|RAISE_ERROR|null value"):
            write_jsonl_avro(df, sch, str(tmp_path / "nn"))
