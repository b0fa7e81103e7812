"""Conformance operator + Avro binary codec tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import avro_spark as avs
from avro_spark.operators.conform import ERRORS_COL, conform
from avro_spark.sources.avro_binary import (
    decode_record,
    encode_record,
    from_avro_bytes,
    to_avro_bytes,
)

from fixture_schemas import PERSON_FLAT


class TestConform:
    def test_defaults_and_casts(self, spark):
        s = avs.create(PERSON_FLAT)
        df = spark.createDataFrame(
            [("John", None, 33, 1, None, None, None)],
            "FirstName string, LastName string, Age bigint, Sex int, "
            "PhoneNumber string, HomeAddress string, Occupation string",
        )
        out = conform(df, s)
        r = out.collect()[0]
        assert r["LastName"] == "" and r["Age"] == 33
        assert out.schema["Age"].dataType.typeName() == "integer"

    def test_missing_column_filled(self, spark):
        s = avs.create(PERSON_FLAT)
        df = spark.createDataFrame([("J", 1, 0)], "FirstName string, Age int, Sex int")
        r = conform(df, s).collect()[0]
        assert r["Occupation"] == ""

    def test_flag_mode_int_range(self, spark):
        s = avs.create(
            {"name": "x", "type": "record", "fields": [{"name": "a", "type": "int"}]}
        )
        df = spark.createDataFrame([(2**31,), (5,)], "a bigint")
        out = conform(df, s, mode="flag").orderBy(F.col("a").asc_nulls_first()).collect()
        bad, good = out
        assert good["a"] == 5 and good[ERRORS_COL] == []
        assert bad["a"] is None and "INT range" in bad[ERRORS_COL][0]

    def test_raise_mode(self, spark):
        s = avs.create(
            {"name": "x", "type": "record", "fields": [{"name": "a", "type": "int"}]}
        )
        df = spark.createDataFrame([(2**31,)], "a bigint")
        with pytest.raises(Exception, match="INT range"):
            conform(df, s).collect()

    def test_missing_mandatory_null(self, spark):
        s = avs.create(
            {"name": "x", "type": "record",
             "fields": [{"name": "a", "type": "string"}]}
        )
        df = spark.createDataFrame([(None,)], "a string")
        out = conform(df, s, mode="flag").collect()[0]
        assert "missing" in out[ERRORS_COL][0]

    def test_enum_membership(self, spark):
        s = avs.create(
            {"name": "x", "type": "record",
             "fields": [{"name": "v", "type": {"type": "enum", "name": "e",
                                               "symbols": ["A", "B"]}}]}
        )
        df = spark.createDataFrame([("A",), ("Z",)], "v string")
        out = {r["v"]: r[ERRORS_COL] for r in conform(df, s, mode="flag").collect()}
        # reference err_value rendering with the field path prefix
        assert out["A"] == [] and out["Z"][0] == 'v: Bad value: "Z"'

    def test_agrees_with_pyvalidate(self, spark):
        """The columnar path must agree with the interpretive oracle."""
        s = avs.create(PERSON_FLAT)
        data = {"FirstName": "John", "Age": 33, "Sex": 1}
        oracle = s.validate(data)
        df = spark.createDataFrame([("John", None, 33, 1, None, None, None)],
                                   "FirstName string, LastName string, Age int, Sex int, "
                                   "PhoneNumber string, HomeAddress string, Occupation string")
        got = conform(df, s).collect()[0].asDict()
        assert got == oracle


AVRO_SCHEMA = {
    "name": "rec", "type": "record",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "y", "type": "bytes"},
        {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["RED", "GREEN"]}},
        {"name": "a", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "u", "type": ["null", "string"]},
        {"name": "x", "type": {"type": "fixed", "name": "f2", "size": 2}},
    ],
}

SAMPLE = {
    "b": True, "i": -3, "l": 2**40, "f": 1.5, "d": -2.25, "s": "héllo",
    "y": b"\x00\x01", "e": "GREEN", "a": [1, 2, 3], "m": {"k": 9},
    "u": "opt", "x": b"zz",
}


class TestAvroBinary:
    def test_spec_bytes_known_values(self):
        """Hand-computed goldens from the public Avro binary spec."""
        s = avs.create({"name": "t", "type": "record",
                        "fields": [{"name": "n", "type": "long"},
                                   {"name": "s", "type": "string"}]})
        # zigzag(1) = 2 ; "ab" → len 2 (zigzag 4), bytes
        assert encode_record(s, {"n": 1, "s": "ab"}) == bytes([0x02, 0x04, 0x61, 0x62])
        assert encode_record(s, {"n": -1, "s": ""}) == bytes([0x01, 0x00])
        big = avs.create({"name": "t", "type": "record",
                          "fields": [{"name": "n", "type": "long"}]})
        # zigzag(64) = 128 → varint 0x80 0x01
        assert encode_record(big, {"n": 64}) == bytes([0x80, 0x01])

    def test_roundtrip_single(self):
        s = avs.create(AVRO_SCHEMA)
        blob = encode_record(s, SAMPLE)
        back = decode_record(s, blob)
        assert back["i"] == -3 and back["l"] == 2**40
        assert back["s"] == "héllo" and back["y"] == b"\x00\x01"
        assert back["e"] == "GREEN" and back["a"] == [1, 2, 3]
        assert back["m"] == {"k": 9} and back["u"] == "opt" and back["x"] == b"zz"
        assert abs(back["f"] - 1.5) < 1e-6 and back["d"] == -2.25

    def test_union_and_null_roundtrip(self):
        s = avs.create({"name": "t", "type": "record",
                        "fields": [{"name": "u", "type": ["null", "string"]},
                                   {"name": "v", "type": "int*"}]})
        assert decode_record(s, encode_record(s, {"u": None, "v": None})) == {
            "u": None, "v": None,
        }
        assert decode_record(s, encode_record(s, {"u": "x", "v": 5})) == {"u": "x", "v": 5}

    def test_general_union_roundtrip(self):
        s = avs.create({"name": "t", "type": "record",
                        "fields": [{"name": "u", "type": ["int", "string"]}]})
        rec = {"u": {"$type$": 1, "int": None, "string": "hi"}}
        back = decode_record(s, encode_record(s, rec))
        assert back["u"]["$type$"] == 1 and back["u"]["string"] == "hi"

    def test_dataframe_roundtrip(self, spark):
        s = avs.create(
            {"name": "nation", "type": "record",
             "fields": [{"name": "n_nationkey", "type": "int"},
                        {"name": "n_name", "type": "string"},
                        {"name": "n_regionkey", "type": "int"}]}
        )
        df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        encoded = to_avro_bytes(df, s)
        assert encoded.columns == ["avro"]
        decoded = from_avro_bytes(encoded, "avro", s)
        assert decoded.columns == ["n_nationkey", "n_name", "n_regionkey"]
        assert sorted(map(tuple, decoded.collect())) == sorted(map(tuple, df.collect()))

    def test_dataframe_complex_roundtrip(self, spark):
        s = avs.create(
            {"name": "t", "type": "record",
             "fields": [
                 {"name": "k", "type": "long"},
                 {"name": "tags", "type": {"type": "array", "items": "string"}},
                 {"name": "props", "type": {"type": "map", "values": "int"}},
                 {"name": "opt", "type": ["null", "double"]},
                 {"name": "sub", "type": {"name": "s", "type": "record",
                                          "fields": [{"name": "a", "type": "int"}]}},
             ]}
        )
        df = spark.createDataFrame(
            [(1, ["a", "b"], {"x": 1}, 2.5, (7,)), (2, [], {}, None, (8,))],
            s.to_struct_type(),
        )
        back = from_avro_bytes(to_avro_bytes(df, s), "avro", s)
        got = sorted((r["k"], r["tags"], dict(r["props"]), r["opt"], r["sub"]["a"])
                     for r in back.collect())
        assert got == [(1, ["a", "b"], {"x": 1}, 2.5, 7), (2, [], {}, None, 8)]


# ------------------------------------------------- review-fix regressions
def test_nullable_union_record_accepts_null(spark):
    """union[null, record] must accept null (oracle: pyvalidate returns
    None) — the unwrapped branch's not-null complaint once flagged it."""
    import avro_spark
    from avro_spark.operators.conform import ERRORS_COL, conform

    sch = avro_spark.create({
        "type": "record", "name": "T", "fields": [
            {"name": "a", "type": ["null", {
                "type": "record", "name": "R",
                "fields": [{"name": "x", "type": "int"}]}]},
        ],
    })
    df = spark.createDataFrame([(None,), ((5,),)], "a struct<x:int>")
    got = {str(r["a"]): r[ERRORS_COL] for r in conform(df, sch, mode="flag").collect()}
    assert got["None"] == []
    assert got["Row(x=5)"] == []


def test_namespaced_union_tag_variant_path(spark):
    """Dotted union branch tags (com.example.Rec) are ONE object key —
    the variant path must bracket-quote, not traverse."""
    import avro_spark
    from avro_spark.operators.conform import parse_json_typed

    sch = avro_spark.create({
        "type": "record", "name": "T", "fields": [
            {"name": "u", "type": ["null", {
                "type": "record", "name": "Rec", "namespace": "com.example",
                "fields": [{"name": "x", "type": "int"}]}]},
        ],
    })
    df = spark.createDataFrame(
        [('{"u": {"com.example.Rec": {"x": 7}}}',), ('{"u": null}',)],
        "j string",
    )
    got = [r["u"] for r in parse_json_typed(df, "j", sch).collect()]
    assert (7,) in [tuple(g) if g else g for g in got]


def test_null_element_in_nonnullable_array_flagged(spark):
    import avro_spark
    from avro_spark.operators.conform import ERRORS_COL, conform

    sch = avro_spark.create({
        "type": "record", "name": "T", "fields": [
            {"name": "xs", "type": {"type": "array", "items": "int"}},
        ],
    })
    df = spark.createDataFrame([([1, None, 3],), ([1, 2],)], "xs array<int>")
    got = [r[ERRORS_COL] for r in conform(df, sch, mode="flag").collect()]
    assert sorted(map(len, got)) == [0, 1]


def test_general_union_active_branch_validated(spark):
    """A bad enum symbol inside the ACTIVE union branch must flag — the
    old check validated only the tag range."""
    import avro_spark
    from avro_spark.operators.conform import ERRORS_COL, conform

    sch = avro_spark.create({
        "type": "record", "name": "T", "fields": [
            {"name": "u", "type": [
                "int",
                {"type": "enum", "name": "E", "symbols": ["A", "B"]},
            ]},
        ],
    })
    df = spark.createDataFrame(
        [((1, None, "Z"),), ((1, None, "A"),), ((0, 5, None),)],
        "u struct<`$type$`:int, `int`:int, E:string>",
    )
    got = [r[ERRORS_COL] for r in conform(df, sch, mode="flag").collect()]
    assert sorted(map(len, got)) == [0, 0, 1]
    flagged = [e for e in got if e]
    assert 'Bad value: "Z"' in flagged[0][0]


def test_general_union_inactive_branch_ignored(spark):
    """Garbage in the INACTIVE branch must not flag (only the active
    branch validates, per the oracle's _copy_union)."""
    import avro_spark
    from avro_spark.operators.conform import ERRORS_COL, conform

    sch = avro_spark.create({
        "type": "record", "name": "T", "fields": [
            {"name": "u", "type": [
                "int", {"type": "enum", "name": "E", "symbols": ["A", "B"]},
            ]},
        ],
    })
    df = spark.createDataFrame(
        [((0, 5, "ZZZ"),)],  # active branch int; enum slot garbage
        "u struct<`$type$`:int, `int`:int, E:string>",
    )
    got = conform(df, sch, mode="flag").collect()[0][ERRORS_COL]
    assert got == []
