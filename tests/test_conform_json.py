"""conform_json: schema-first validation of raw JSON strings (dynamic
ingest) with the reference MsgPack runtime's exact error renderings
(runtime.lua:263-336). All JVM-side via VariantType — the plan must stay a
narrow codegen'd projection with no Python stage."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import avro_spark as avs
from avro_spark.operators.conform import ERRORS_COL, conform_json

PERSON = {
    "type": "record", "name": "Person",
    "fields": [
        {"name": "FirstName", "type": "string"},
        {"name": "Age", "type": "int"},
        {"name": "Tags", "type": {"type": "array", "items": "string"}, "default": []},
        {"name": "Extra", "type": ["null", "string"], "default": None},
    ],
}


def _errs(spark, schema_raw, payloads):
    s = avs.create(schema_raw)
    df = spark.createDataFrame([(json.dumps(p) if not isinstance(p, str) else p,)
                                for p in payloads], "j string")
    out = conform_json(df, "j", s, mode="flag")
    return [r[ERRORS_COL] for r in out.collect()]


class TestConformJson:
    def test_valid_rows_clean(self, spark):
        errs = _errs(spark, PERSON, [
            {"FirstName": "a", "Age": 3},
            # union values use the reference's single-entry-map record form
            {"FirstName": "b", "Age": 4, "Tags": ["x"], "Extra": {"string": "y"}},
            {"FirstName": "c", "Age": 5, "Extra": None},
        ])
        assert errs == [[], [], []]

    def test_reference_runtime_renderings(self, spark):
        errs = _errs(spark, PERSON, [
            {"FirstName": 42, "Age": 3},
            {"FirstName": "a"},
            {"FirstName": "a", "Age": 3.14},
            {"FirstName": "a", "Age": 2147483648},
            {"FirstName": "a", "Age": 3, "zz": 1},
            {"FirstName": "a", "Age": 3, "Tags": ["ok", 7]},
            {"FirstName": "a", "Age": 3, "Extra": {"bogus": 1}},
            "[1, 2]",
            "not json at all",
        ])
        assert errs[0] == ["FirstName: Expecting STR, encountered LONG"]
        assert errs[1] == ['Key missing: "Age"']
        assert errs[2] == ["Age: Expecting INT, encountered DOUBLE"]
        assert errs[3] == ["Age: Value exceeds INT range: 2147483648LL"]
        assert errs[4] == ['Unknown key: "zz"']
        assert errs[5] == ["Tags/2: Expecting STR, encountered LONG"]
        assert errs[6] == ['Extra/Unknown key: "bogus"'] or errs[6] == ['Extra: Unknown key: "bogus"']
        assert errs[7] == ["Expecting MAP, encountered ARRAY"]
        assert errs[8] == ["invalid JSON"]

    def test_enum_fixed_map_union(self, spark):
        sch = {
            "type": "record", "name": "R",
            "fields": [
                {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
                {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
                {"name": "m", "type": {"type": "map", "values": "int"}},
                {"name": "u", "type": ["null", "int", "string"]},
            ],
        }
        ok = {"e": "A", "fx": "abcd", "m": {"k": 1}, "u": {"int": 5}}
        errs = _errs(spark, sch, [
            ok,
            {**ok, "e": "Z"},
            {**ok, "fx": "ab"},
            {**ok, "m": {"k": "str"}},
            {**ok, "u": {"double": 1.0}},
            {**ok, "u": "plain"},
            {**ok, "u": None},
        ])
        assert errs[0] == []
        assert errs[1] == ['e: Bad value: "Z"']
        assert errs[2] == ["fx: Expecting BIN of length 4. Encountered BIN of length 2."]
        assert errs[3] == ["m/k: Expecting INT, encountered STR"]
        assert errs[4] == ['u: Unknown key: "double"']
        assert errs[5] == ["u: Expecting NIL or MAP, encountered STR"]
        assert errs[6] == []  # null branch

    def test_nested_record_paths(self, spark):
        sch = {
            "type": "record", "name": "Outer",
            "fields": [{"name": "inner", "type": {
                "type": "record", "name": "Inner",
                "fields": [{"name": "x", "type": "long"}],
            }}],
        }
        errs = _errs(spark, sch, [
            {"inner": {"x": 1}},
            {"inner": {"x": "bad"}},
            {"inner": 7},
            {"inner": {}},
        ])
        assert errs[0] == []
        assert errs[1] == ["inner/x: Expecting LONG, encountered STR"]
        assert errs[2] == ["inner: Expecting MAP, encountered LONG"]
        assert errs[3] == ['inner: Key missing: "x"']

    def test_agrees_with_pyvalidate_on_corpus(self, spark):
        """Random-ish payloads: conform_json flags a row iff the
        interpretive validator rejects the same JSON value (modulo the
        bytes-as-string ingestion difference, absent here)."""
        s = avs.create(PERSON)
        payloads = [
            {"FirstName": "a", "Age": 1},
            {"FirstName": "a", "Age": 1, "Tags": []},
            {"FirstName": None, "Age": 1},
            {"FirstName": "a", "Age": True},
            {"FirstName": "a", "Age": 1, "Tags": [None]},
            {"FirstName": "a", "Age": -2147483649},
        ]
        spark_errs = _errs(spark, PERSON, payloads)
        for p, got in zip(payloads, spark_errs):
            try:
                avs.validate(s, p)
                ok = True
            except Exception:
                ok = False
            assert ok == (got == []), (p, got, ok)

    def test_plan_is_narrow_jvm(self, spark):
        s = avs.create(PERSON)
        df = spark.createDataFrame([('{"FirstName":"a","Age":1}',)], "j string")
        plan = conform_json(df, "j", s, mode="flag")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    def test_raise_mode(self, spark):
        s = avs.create(PERSON)
        df = spark.createDataFrame([('{"FirstName":"a"}',)], "j string")
        with pytest.raises(Exception, match='Key missing: "Age"'):
            conform_json(df, "j", s, mode="raise").collect()


class TestBinaryConvention:
    """binary_key='$binary': the reference corpus's JSON↔MsgPack binary
    convention — single-key {"$binary": hex} objects are BIN values."""

    SCH = {
        "type": "record", "name": "B",
        "fields": [
            {"name": "raw", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 8}},
        ],
    }

    def _errs(self, spark, payloads):
        import avro_spark as avs
        s = avs.create(self.SCH)
        df = spark.createDataFrame([(json.dumps(p),) for p in payloads], "j string")
        out = conform_json(df, "j", s, mode="flag", binary_key="$binary")
        return [r[ERRORS_COL] for r in out.collect()]

    def test_binary_convention(self, spark):
        ok = {"raw": {"$binary": "FF00"}, "fx": {"$binary": "FF00FF00FF00FF00"}}
        errs = self._errs(spark, [
            ok,
            {**ok, "raw": "plain string"},
            {**ok, "fx": {"$binary": "FFFF"}},
            {**ok, "raw": 42},
        ])
        assert errs[0] == []
        assert errs[1] == ["raw: Expecting BIN, encountered STR"]
        assert errs[2] == ["fx: Expecting BIN of length 8. Encountered BIN of length 2."]
        assert errs[3] == ["raw: Expecting BIN, encountered LONG"]


def test_nested_dynamic_paths(spark):
    """Dynamic element locations compose with '/' like the reference
    (array.lua:156 '1/1: Expecting STR, encountered LONG')."""
    sch = {"type": "array", "items": {"type": "array", "items": "string"}}
    s = avs.create(sch)
    df = spark.createDataFrame([('[[42]]',), ('[["ok"], ["a", 7]]',)], "j string")
    out = [r[ERRORS_COL] for r in conform_json(df, "j", s, mode="flag").collect()]
    assert out[0] == ["1/1: Expecting STR, encountered LONG"]
    assert out[1] == ["2/2: Expecting STR, encountered LONG"]


class TestConformJsonTuple:
    """Flat-array (tuple) validation against a compiled layout — the
    unflatten-direction ingest contract with reference cell locations."""

    def _errs(self, spark, schema_raw, payloads, service=()):
        s = avs.create(schema_raw)
        c = avs.compile(s, service_fields=service)
        from avro_spark.operators.conform import conform_json_tuple
        df = spark.createDataFrame([(p,) for p in payloads], "j string")
        out = conform_json_tuple(df, "j", c, mode="flag", binary_key="$binary")
        return [r[ERRORS_COL] for r in out.collect()]

    def test_length_and_cell_errors(self, spark):
        sch = {"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "string"},
            {"name": "b", "type": "int"},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["X", "Y", "Z"]}},
        ]}
        errs = self._errs(spark, sch, [
            '["s", 1, 0]',
            '["s", 1]',
            '["s", 1, 0, 9]',
            '["s", 3.14, 0]',
            '["s", 1, 4]',
            '["s", 1, -1]',
            '42',
        ])
        assert errs[0] == []
        assert errs[1] == ["Expecting ARRAY of length 3. Encountered ARRAY of length 2."]
        assert errs[2] == ["Expecting ARRAY of length 3. Encountered ARRAY of length 4."]
        assert errs[3] == ["2: Expecting INT, encountered DOUBLE"]
        assert errs[4] == ["3: Bad value: 4"]
        assert errs[5] == ["3: Bad value: -1"]
        assert errs[6] == ["Expecting ARRAY, encountered LONG"]

    def test_union_cells_and_service(self, spark):
        sch = {"type": "record", "name": "U", "fields": [
            {"name": "u", "type": ["int", "string"]},
        ]}
        errs = self._errs(spark, sch, [
            '["svc", 0, 5]',
            '["svc", 3, 5]',
            '["svc", 1, 5]',
            '[42, 0, 5]',
        ], service=("string",))
        assert errs[0] == []
        assert errs[1] == ["2: Bad value: 3"]
        assert errs[2] == ["3: Expecting STR, encountered LONG"]
        assert errs[3] == ["1: Expecting STR, encountered LONG"]


class TestParseJsonTyped:
    """parse_json_typed: JSON → typed rows honoring the Avro value
    conventions from_json cannot express (record-form unions, defaults,
    $binary)."""

    def test_unions_defaults_binary(self, spark):
        from avro_spark.operators.conform import parse_json_typed

        sch = avs.create({
            "type": "record", "name": "R",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "u", "type": ["null", "int", "string"]},
                {"name": "tag", "type": "string", "default": "none"},
                {"name": "raw", "type": "bytes"},
            ],
        })
        rows = [
            ('{"id": 1, "u": {"int": 42}, "raw": {"$binary": "FF00"}}',),
            ('{"id": 2, "u": {"string": "hi"}, "tag": "x", "raw": {"$binary": ""}}',),
            ('{"id": 3, "u": null, "raw": {"$binary": "AA"}}',),
        ]
        df = spark.createDataFrame(rows, "j string")
        out = parse_json_typed(df, "j", sch, binary_key="$binary").collect()
        r1, r2, r3 = sorted(out, key=lambda r: r.id)
        assert (r1.u["$type$"], r1.u["int"], r1.u["string"]) == (1, 42, None)
        assert r1.tag == "none" and bytes(r1.raw) == b"\xff\x00"
        assert (r2.u["$type$"], r2.u["string"]) == (2, "hi") and r2.tag == "x"
        assert r3.u["$type$"] == 0  # null branch selected
        # the parsed frame round-trips through the compiled flatten
        c = avs.compile(sch)
        flat = c.flatten(parse_json_typed(df, "j", sch, binary_key="$binary"))
        assert flat.count() == 3

    def test_nested_and_mismatch_nulls(self, spark):
        from avro_spark.operators.conform import parse_json_typed

        sch = avs.create({
            "type": "record", "name": "N",
            "fields": [
                {"name": "inner", "type": {
                    "type": "record", "name": "I",
                    "fields": [{"name": "xs", "type": {"type": "array", "items": "int"}}],
                }},
            ],
        })
        df = spark.createDataFrame(
            [('{"inner": {"xs": [1, 2, 3]}}',), ('{"inner": {"xs": "bad"}}',)],
            "j string",
        )
        out = parse_json_typed(df, "j", sch).collect()
        assert list(out[0].inner.xs) == [1, 2, 3]
        assert out[1].inner.xs is None  # best-effort: mismatch nulls out
