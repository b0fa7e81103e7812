"""Port of the reference's export/fingerprint API tests
(test/api_tests/export.lua): export round-trips, scalar normalization,
the four Avro-spec fingerprint constants, preserve_in_ast /
preserve_in_fingerprint, and the avro_json renderer.
"""

from __future__ import annotations

import json

import pytest

import avro_spark as avs
from avro_spark.errors import SchemaError
from avro_spark.schema.fingerprint import avro_json


def _roundtrip(decl, options=None):
    return avs.export(avs.create(json.loads(json.dumps(decl)), options))


def _canon(x):
    if isinstance(x, dict):
        return {k: _canon(v) for k, v in sorted(x.items())}
    if isinstance(x, list):
        return [_canon(v) for v in x]
    return x


class TestExportRoundtrip:
    # export.lua:11-29
    def test_foobar(self):
        decl = {
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
        assert _canon(_roundtrip(decl)) == _canon(decl)

    # export.lua:31-48: {"type": t} normalizes to the bare name, nullable too
    @pytest.mark.parametrize("t", [
        "int", "string", "null", "boolean", "long", "float", "double", "bytes"])
    def test_scalar_normalization(self, t):
        assert _roundtrip({"type": t}) == t
        assert _roundtrip({"type": t + "*"}) == t + "*"

    # export.lua:272-290: nullable records and references round-trip
    def test_nullable_export(self):
        decl = json.loads("""{
            "name": "outer", "type": "record", "fields":
            [{"name": "r1", "type":
                {"name": "tr1", "type": "record", "fields":
                    [{"name": "v1", "type": "int"},
                     {"name": "v2", "type": "string*"}]}},
             {"name": "r2", "type": "tr1*"},
             {"name": "dummy", "type": {"type": "array", "items": "int"}},
             {"name": "r3", "type": {
                "name": "tr2", "type": "record*", "fields": [
                    {"name": "v1", "type": "string"},
                    {"name": "v2", "type": "int*"}]}},
             {"name": "r4", "type": "tr2"}]}""")
        assert _canon(_roundtrip(decl)) == _canon(decl)

    # export.lua:294-316: a nullable re-reference exports as "name*", not a
    # second definition
    def test_nullable_reference(self):
        decl = {
            "name": "X", "type": "record",
            "fields": [
                {"name": "first", "type": {
                    "name": "first", "type": "fixed", "size": 16}},
                {"name": "second", "type": "first*"},
            ],
        }
        assert _canon(_roundtrip(decl)) == _canon(decl)


class TestFingerprintConstants:
    # export.lua:51-122: SHA-256 of Parsing Canonical Form, Avro-spec cases
    CASES = [
        ({"name": "Pet", "type": "record",
          "fields": [{"name": "kind", "type": {
              "name": "Kind", "type": "enum", "symbols": ["CAT", "DOG"]}},
              {"name": "name", "type": "string"}]},
         "42620f01b34833f1e70cf2a9567fc4d3b9cf8b74afba64af0e9dce9a148b1e90"),
        ({"type": "fixed", "name": "Id", "size": 4},
         "ecd9e5c6039fe40543f95176d664e1b9b56dddf1e8b1e3a6d87a6402b12e305d"),
        (json.loads("""{
            "type": "record",
            "name": "HandshakeResponse", "namespace": "org.apache.avro.ipc",
            "fields": [
              {"name": "match",
               "type": {"type": "enum", "name": "HandshakeMatch",
                        "symbols": ["BOTH", "CLIENT", "NONE"]}},
              {"name": "serverProtocol", "type": ["null", "string"]},
              {"name": "serverHash", "type":
                  ["null", {"type": "fixed", "name": "MD5", "size": 16}]},
              {"name": "meta", "type":
                  ["null", {"type": "map", "values": "bytes"}]}]}"""),
         "a303cbbfe13958f880605d70c521a4b7be34d9265ac5a848f25916a67b11d889"),
        (json.loads("""{
            "type": "record",
            "name": "HandshakeRequest", "namespace": "org.apache.avro.ipc",
            "fields": [
              {"name": "clientHash",
               "type": {"type": "fixed", "name": "MD5", "size": 16}},
              {"name": "clientProtocol", "type": ["null", "string"]},
              {"name": "serverHash", "type": "MD5"},
              {"name": "meta", "type":
                  ["null", {"type": "map", "values": "bytes"}]}]}"""),
         "2b2f7a9b22991fe0df9134cb6b5ff7355343e797aaea337e0150e20f3a35800e"),
    ]

    @pytest.mark.parametrize("decl,want", CASES)
    def test_spec_fingerprints(self, decl, want):
        h = avs.create(decl)
        assert avs.fingerprint(h, "sha256", 32).hex() == want


EXTRA_RECORD = {
    "type": "record", "name": "test", "extra_field": "extra_field",
    "fields": [
        {"name": "bar", "type": "null", "default": None,
         "extra_field": "extra"},
        {"name": "foo", "type": ["null", "int"], "default": None},
    ],
}


class TestPreserve:
    # export.lua:124-205
    def test_preserve_in_ast_roundtrips(self):
        assert _roundtrip({"type": "int", "extra_field": "extra_field"}) == "int"
        assert _roundtrip(
            {"type": "int", "extra_field": "extra_field"},
            {"preserve_in_ast": ["extra_field"]},
        ) == {"type": "int", "extra_field": "extra_field"}
        # nested extra values survive verbatim
        assert _roundtrip(
            {"type": "int", "extra_field": {"extra_field": ["extra_field"]}},
            {"preserve_in_ast": ["extra_field"]},
        ) == {"type": "int", "extra_field": {"extra_field": ["extra_field"]}}

    def test_preserve_different_types(self):
        decl = {
            "type": "record", "name": "X", "extra_field": "X",
            "fields": [
                {"name": "f1", "type": "int", "extra_field": "f1"},
                {"name": "f2", "type": {"type": "array", "extra_field": "f2",
                                        "items": "int"}},
                {"name": "f3", "type": {"type": "map", "extra_field": "f3",
                                        "values": "int"}},
                {"name": "f4", "type": {"type": "fixed", "extra_field": "f4",
                                        "size": 4, "name": "f4"}},
            ],
        }
        got = _roundtrip(decl, {"preserve_in_ast": ["extra_field"]})
        assert _canon(got) == _canon(decl)

    # export.lua:212-218
    def test_fingerprint_fields_must_be_in_ast(self):
        with pytest.raises(SchemaError, match="only fields from AST"):
            avs.create("int", {"preserve_in_ast": [],
                               "preserve_in_fingerprint": ["extra_field"]})

    # export.lua:220-252: exact hashes with and without preserved extras
    def test_fingerprint_extra_fields(self):
        h1 = avs.create(json.loads(json.dumps(EXTRA_RECORD)))
        assert avs.fingerprint(h1, "sha256", 32).hex() == (
            "a64098ee437e9020923c6005db88f37a234ed60daae23b26e33d8ae1bf643356")
        h2 = avs.create(
            json.loads(json.dumps(EXTRA_RECORD)),
            {"preserve_in_ast": ["extra_field"],
             "preserve_in_fingerprint": ["extra_field"]},
        )
        assert avs.fingerprint(h2, "sha256", 32).hex() == (
            "ed1e8b275fe8c436839bdb2962f7595bbef6bc364dfdcd47d3d1334888350711")

    # export.lua:254-260
    def test_primitive_collapse_prevented(self):
        got = _roundtrip({"type": "int", "extra_field": "extra_field"},
                         {"preserve_in_ast": ["extra_field"]})
        assert got == {"type": "int", "extra_field": "extra_field"}


class TestAvroJson:
    # export.lua:262-268: unknown keys are dropped unless listed
    def test_avro_json(self):
        assert avro_json({"field1": "1"}) == "{}"
        assert avro_json({"field1": "1"}, ("field1",)) == '{"field1":"1"}'
        assert avro_json(
            {"field2": "1", "field1": "1"}, ("field2", "field1")
        ) == '{"field1":"1","field2":"1"}'
