"""Port of the reference's auxiliary API tests (test/api_tests/var.lua).

Covers the `ok, err`-style behaviors around the public API: compatibility
as an answer (not an exception), alias/downgrade asymmetry, the ANY compile
gate, self-referencing schema declarations, flat names/types for the mixed
nullable schema, large strings, and the nullable-record xflatten gate.
Message-text parity is relaxed per SURVEY.md §7 (category+path, not exact
wording).
"""

from __future__ import annotations

import json

import pytest

import avro_spark as avs
from avro_spark.errors import CompileError, SchemaError


FOOBAR = {
    "name": "FooBar", "type": "record",
    "fields": [
        {"name": "A", "type": {
            "name": "nested", "type": "record",
            "fields": [{"name": "X", "type": "double"},
                       {"name": "Y", "type": "double"}]}},
        {"name": "B", "type": "nested"},
        {"name": "C", "type": ["null", "int"]},
        {"name": "D", "type": "string"},
    ],
}


def _barfoo():
    d = json.loads(json.dumps(FOOBAR))
    d["name"] = "BarFoo"
    d["aliases"] = ["FooBar"]
    return d


class TestCompatibility:
    # var.lua:127-130
    def test_alias_asymmetry(self):
        foobar = avs.create(FOOBAR)
        barfoo = avs.create(_barfoo())
        assert avs.are_compatible(foobar, barfoo) is True
        assert avs.are_compatible(barfoo, foobar) is False
        assert avs.are_compatible(barfoo, foobar, "downgrade") is True

    # var.lua:10 create() with garbage
    def test_create_garbage(self):
        with pytest.raises(SchemaError):
            avs.create(None)
        with pytest.raises(SchemaError):
            avs.create(42)


class TestAnyGate:
    # var.lua:216-227: `any` creates but never compiles
    def test_any_creates_but_not_compiles(self):
        s = avs.create({"name": "foo", "type": "record",
                        "fields": [{"name": "X", "type": "any"}]})
        with pytest.raises(CompileError, match="ANY"):
            avs.compile(s)

    def test_any_nested_not_compiles(self):
        s = avs.create({"name": "foo", "type": "record",
                        "fields": [{"name": "X", "type": {
                            "type": "array", "items": "any"}}]})
        with pytest.raises(CompileError, match="ANY"):
            avs.compile(s)

    def test_any_validates(self):
        s = avs.create({"name": "foo", "type": "record",
                        "fields": [{"name": "X", "type": "any"}]})
        out = avs.validate(s, {"X": {"whatever": [1, "two"]}})
        assert out["X"] == {"whatever": [1, "two"]}


class TestSelfReferencingDecl:
    # var.lua:133-146: a schema declaration that contains itself must be
    # rejected at create (the reference says "Infinite loop detected in the
    # data"; we reject via duplicate type definition on re-entry)
    def test_infinite_union_decl(self):
        d = ["null"]
        d.append({"type": "record", "name": "infinite_union",
                  "fields": [{"name": "f1", "type": d}]})
        with pytest.raises(SchemaError):
            avs.create(d)


class TestUnionDefaults:
    # var.lua:39-74: union default must match the FIRST branch
    def test_non_null_first_branch_default_rejected(self):
        with pytest.raises(SchemaError):
            avs.create({"type": "record", "name": "test", "fields": [
                {"name": "foo", "type": ["int", "null"], "default": None}]})

    def test_null_first_branch_default(self):
        h = avs.create({"type": "record", "name": "test", "fields": [
            {"name": "bar", "type": "null", "default": None},
            {"name": "foo", "type": ["null", "int"], "default": None}]})
        out = avs.validate(h, {})
        assert out == {"bar": None, "foo": None}
        out = avs.validate(h, {"foo": {"int": 5}})
        assert out["bar"] is None and out["foo"] == {"int": 5}


class TestGetNamesTypes:
    SCHEMA = json.loads("""
     {"type": "record", "name": "X", "fields":[
        {"name": "x1", "type":"string*"},
        {"name": "x2", "type": {
            "type":"record", "name": "Y", "fields": [
                {"name":"y1", "type": "string"},
                {"name":"y2", "type": "long"}]}},
        {"name": "x3", "type": {
            "type":"record*","name": "Z", "fields": [
                {"name":"z1", "type": "string*"},
                {"name":"z2", "type": "long*"}]}},
        {"name": "x4", "type": ["int", "string*" ]},
        {"name": "x5", "type": {"type": "array*", "items": "int*"}},
        {"name": "x6", "type": {"type": "map", "values": "float"}},
        {"name": "x7", "type": {"type": "fixed*", "name":"W", "size":5}}
     ]}""")

    # var.lua:341-385
    def test_get_names(self):
        h = avs.create(self.SCHEMA)
        assert avs.get_names(h) == [
            "x1", "x2.y1", "x2.y2", "x3", "x4.$type$", "x4", "x5", "x6", "x7"]
        assert avs.get_names(h, ("string", "int")) == [
            "$service_field$", "$service_field$",
            "x1", "x2.y1", "x2.y2", "x3", "x4.$type$", "x4", "x5", "x6", "x7"]

    def test_get_types(self):
        h = avs.create(self.SCHEMA)
        assert avs.get_types(h) == [
            "string*", "string", "long", "record*", "union_type",
            "union_value", "array*", "map", "fixed*"]
        assert avs.get_types(h, ("string", "int")) == [
            "string", "int", "string*", "string", "long", "record*",
            "union_type", "union_value", "array*", "map", "fixed*"]

    # var.lua:177-186: non-record top level
    def test_non_record_top_level_rejected(self):
        h = avs.create("int")
        with pytest.raises(Exception, match="top level"):
            avs.get_names(h)
        with pytest.raises(Exception, match="top level"):
            avs.get_types(h)

    def test_foobar_names_types(self):
        h = avs.create(FOOBAR)
        assert avs.get_names(h) == [
            "A.X", "A.Y", "B.X", "B.Y", "C.$type$", "C", "D"]
        assert avs.get_types(h) == [
            "double", "double", "double", "double",
            "union_type", "union_value", "string"]


class TestLargeStrings:
    # var.lua:204-209
    def test_large_strings_roundtrip(self, spark):
        h = avs.create({"name": "r", "type": "record",
                        "fields": [{"name": "s", "type": "string"}]})
        c = avs.compile(h)
        s260, s65400 = "@" * 260, "@" * 65400
        df = spark.createDataFrame([(s260,), (s65400,)], h.to_struct_type())
        vals = sorted(r[0] for r in c.unflatten(c.flatten(df)).collect())
        assert vals == [s260, s65400]


class TestNullableRecordXflattenGate:
    # var.lua:325-339 (gh-85): xflatten of a nested nullable record is
    # alpha-gated in the reference — mirror the gate, don't invent semantics
    def test_nested_nullable_record_xflatten_rejected(self, spark):
        h = avs.create({"type": "record", "name": "X", "fields": [
            {"name": "y", "type": {
                "name": "Y", "type": "record*",
                "fields": [{"name": "f1", "type": "string"}]}}]})
        c = avs.compile(h)
        df = spark.createDataFrame(
            [((("a",)),)],
            "y struct<f1:string>")
        with pytest.raises(CompileError, match="developement stage"):
            c.xflatten_typed(df).collect()
        # with the alpha option the update op is produced (record.lua:689-692)
        c2 = avs.compile(h, alpha_nullable_record_xflatten=True)
        out = c2.xflatten(df).collect()[0]["ops"]
        assert [(o["op"], o["field_no"]) for o in out] == [("=", 1)]


class TestValidateCycle:
    # var.lua:190-199: validate detects cyclic data
    def test_cyclic_data_rejected(self):
        h = avs.create(FOOBAR)
        data = {"A": {"X": 1.0, "Y": 2.0}, "C": {"int": 42}, "D": "hi"}
        data["B"] = data  # wrong type AND cyclic; must not hang
        with pytest.raises(Exception):
            avs.validate(h, data)


class TestModuleReload:
    """Port of test/api_tests/reload.lua: unload every engine module and
    re-import; the fresh module works and handles made by the old module
    instance still function."""

    def test_reload(self):
        import importlib
        import sys

        old_handle = avs.create({"type": "record", "name": "R", "fields": [
            {"name": "f", "type": "long"}]})
        saved = {
            k: v for k, v in list(sys.modules.items())
            if k == "avro_spark" or k.startswith("avro_spark.")
        }
        for k in saved:
            del sys.modules[k]
        try:
            fresh = importlib.import_module("avro_spark")
            h = fresh.create({"type": "record", "name": "R", "fields": [
                {"name": "f", "type": "long"}]})
            assert fresh.is_schema(h)
            assert fresh.fingerprint(h) == fresh.fingerprint(old_handle)
            # the old module instance's handle still validates
            assert avs.validate(old_handle, {"f": 1}) == {"f": 1}
        finally:
            # restore the original module objects so later tests share the
            # same class identities as fixtures created before this test
            sys.modules.update(saved)
