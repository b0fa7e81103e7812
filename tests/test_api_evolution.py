"""Port of the reference's schema-evolution API tests
(test/api_tests/evolution.lua): record/union/nullable-record defaults during
unflatten, nullable transitions in both directions, and the
nullable→non-nullable rejection matrix.
"""

from __future__ import annotations

import json

import pytest

import avro_spark as avs
from avro_spark.errors import CompatibilityError


def _pair(writer, reader):
    return avs.compile(
        avs.create(json.loads(json.dumps(writer))),
        avs.create(json.loads(json.dumps(reader))),
    )


FROB_V1 = {"type": "record", "name": "Frob",
           "fields": [{"name": "bar", "type": "string"}]}


class TestDefaultsOnEvolution:
    # evolution.lua:13-43: added record field with a record default
    def test_record_default(self, spark):
        v2 = {"type": "record", "name": "Frob", "fields": [
            {"name": "foo", "type": {
                "type": "record", "name": "default_record", "fields": [
                    {"name": "f1", "type": "int"},
                    {"name": "f2", "type": "int"}]},
             "default": {"f1": 1, "f2": 2}},
            {"name": "foo_nullable", "type": "default_record",
             "default": {"f1": 1, "f2": 2}},
            {"name": "bar", "type": "string"}]}
        c = _pair(FROB_V1, v2)
        df = spark.createDataFrame([("asd",)], "bar string")
        row = c.unflatten(df).collect()[0].asDict(recursive=True)
        assert row == {"foo": {"f1": 1, "f2": 2},
                       "foo_nullable": {"f1": 1, "f2": 2}, "bar": "asd"}

    # evolution.lua:45-77: added nullable record whose fields are unions,
    # partial default {"f1": {"int": 1}} → f2 fills null
    def test_union_default(self, spark):
        v2 = {"type": "record", "name": "Frob", "fields": [
            {"name": "foo", "type": {
                "type": "record*", "name": "default_record", "fields": [
                    {"name": "f1", "type": ["int", "null"]},
                    {"name": "f2", "type": ["null", "int"]}]},
             "default": {"f1": {"int": 1}}},
            {"name": "bar", "type": "string"}]}
        c = _pair(FROB_V1, v2)
        df = spark.createDataFrame([("asd",)], "bar string")
        row = c.unflatten(df).collect()[0].asDict(recursive=True)
        assert row["bar"] == "asd"
        foo = row["foo"]
        # simple [T,null]/[null,T] unions are plain nullable columns in our
        # record form: f1 carries 1, f2 the null branch
        assert foo == {"f1": 1, "f2": None}

    # evolution.lua:80-112: added nullable record with full default
    def test_add_nullable_record(self, spark):
        v2 = {"type": "record", "name": "Frob", "fields": [
            {"name": "foo", "type": {
                "type": "record*", "name": "default_record", "fields": [
                    {"name": "f1", "type": "int"},
                    {"name": "f2", "type": "int"}]},
             "default": {"f1": 1, "f2": 2}},
            {"name": "bar", "type": "string"}]}
        c = _pair(FROB_V1, v2)
        df = spark.createDataFrame([("asd",)], "bar string")
        # flatten: nullable record = one VLO cell holding the default
        flat = c.flatten(df).collect()[0]
        assert flat["bar"] == "asd"
        assert tuple(flat["foo"]) == (1, 2) or flat["foo"] == {"f1": 1, "f2": 2}
        row = c.unflatten(df.select(df.bar)).collect()[0].asDict(recursive=True)
        assert row == {"foo": {"f1": 1, "f2": 2}, "bar": "asd"}


class TestNullabilityTransitions:
    V_NONNULL = {"type": "record", "name": "Frob", "fields": [
        {"name": "foo", "type": {
            "type": "record", "name": "default_record", "fields": [
                {"name": "f1", "type": "int"},
                {"name": "f2", "type": "int"}]},
         "default": {"f1": 1, "f2": 2}},
        {"name": "bar", "type": "string"}]}

    # evolution.lua:114-155: record → record*
    def test_record_becomes_nullable(self, spark):
        v2 = json.loads(json.dumps(self.V_NONNULL))
        v2["fields"][0]["type"]["type"] = "record*"
        c = _pair(self.V_NONNULL, v2)
        # writer flat form: two inline cells [f1, f2, bar]
        df = spark.createDataFrame([(1, 2, "asd")],
                                   "f1 int, f2 int, bar string")
        row = c.unflatten(df).collect()[0].asDict(recursive=True)
        assert row == {"foo": {"f1": 1, "f2": 2}, "bar": "asd"}
        nested = spark.createDataFrame(
            [(((1, 2)), "asd")], "foo struct<f1:int,f2:int>, bar string")
        flat = c.flatten(nested).collect()[0]
        assert tuple(flat["foo"]) == (1, 2) and flat["bar"] == "asd"

    # evolution.lua:157-197: int/array/map become nullable (and their
    # elements), data passes through unchanged
    def test_non_record_becomes_nullable(self, spark):
        v1 = {"type": "record", "name": "X", "fields": [
            {"type": "int", "name": "f1"},
            {"type": {"type": "array", "items": "int"}, "name": "f2"},
            {"type": {"type": "map", "values": "string"}, "name": "f3"}]}
        v2 = {"type": "record", "name": "X", "fields": [
            {"type": "int*", "name": "f1"},
            {"type": {"type": "array*", "items": "int*"}, "name": "f2"},
            {"type": {"type": "map*", "values": "string*"}, "name": "f3"}]}
        c = _pair(v1, v2)
        df = spark.createDataFrame(
            [(1, [2, 3], {"a": "4"})],
            "f1 int, f2 array<int>, f3 map<string,string>")
        row = c.unflatten(df).collect()[0].asDict(recursive=True)
        assert row == {"f1": 1, "f2": [2, 3], "f3": {"a": "4"}}
        nested = spark.createDataFrame(
            [(1, [2, 3], {"a": "4"})], c.writer.to_struct_type())
        flat = c.flatten(nested).collect()[0]
        assert flat["f1"] == 1 and flat["f2"] == [2, 3] and flat["f3"] == {"a": "4"}

    # evolution.lua:199-232: nullable → non-nullable is rejected at compile
    @pytest.mark.parametrize("w,r", [
        ("int*", "int"),
        ("string*", "string"),
        ({"type": "array*", "items": "int"}, {"type": "array", "items": "int"}),
        ({"type": "array", "items": "int*"}, {"type": "array", "items": "int"}),
        ({"type": "map*", "values": "int"}, {"type": "map", "values": "int"}),
        ({"type": "map", "values": "int*"}, {"type": "map", "values": "int"}),
        ({"type": "fixed*", "size": 4, "name": "f2"},
         {"type": "fixed", "size": 4, "name": "f2"}),
        ({"type": "enum*", "symbols": ["a", "b"], "name": "f2"},
         {"type": "enum", "symbols": ["a", "b"], "name": "f2"}),
        ({"type": "record*", "name": "Y",
          "fields": [{"name": "f1", "type": "int"}]},
         {"type": "record", "name": "Y",
          "fields": [{"name": "f1", "type": "int"}]}),
    ])
    def test_nullable_to_nonnullable_rejected(self, w, r):
        v1 = {"type": "record", "name": "X",
              "fields": [{"name": "f1", "type": w}]}
        v2 = {"type": "record", "name": "X",
              "fields": [{"name": "f1", "type": r}]}
        with pytest.raises(CompatibilityError):
            _pair(v1, v2)
        assert avs.are_compatible(
            avs.create(json.loads(json.dumps(v1))),
            avs.create(json.loads(json.dumps(v2)))) is False
