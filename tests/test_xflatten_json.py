"""xflatten's dynamic JSON face (operators/conform.xflatten_json):
per-ROW partial records — the form the reference consumes
(test/ddt_suite/record.lua:355-362) — validated and turned into
update-op arrays JVM-side."""

from __future__ import annotations

import json

import pytest

import avro_spark
from avro_spark.errors import AvroSparkError
from avro_spark.operators.conform import ERRORS_COL, xflatten_json
from ddt_helpers import partial_row_and_type

NESTED = {
    "type": "record",
    "name": "X",
    "fields": [
        {"name": "f1", "type": "int"},
        {"name": "f2", "type": {
            "type": "record", "name": "Y", "fields": [
                {"name": "g1", "type": "string"},
                {"name": "g2", "type": "long"}]}},
        {"name": "f3", "type": "double"},
    ],
}

UNION = {
    "type": "record",
    "name": "U",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "u", "type": ["null", "int", "string"]},
    ],
}


def _ops(spark, schema_dict, payloads, **kw):
    cs = avro_spark.compile(avro_spark.create(schema_dict), **kw)
    df = spark.createDataFrame([(json.dumps(p) if isinstance(p, dict) else p,)
                                for p in payloads], "j string")
    rows = xflatten_json(df, "j", cs, keep=()).collect()
    return [
        (None if r.ops is None else [(o.op, o.field_no, o.value) for o in r.ops],
         list(r[ERRORS_COL]))
        for r in rows
    ]


def test_partial_per_row_presence(spark):
    """Different rows update DIFFERENT fields — the per-row presence the
    typed path cannot express."""
    out = _ops(spark, NESTED, [
        {"f1": 7},
        {"f3": 2.5},
        {"f1": 1, "f3": 0.5},
    ])
    assert out[0] == ([("=", 1, "7")], [])
    assert out[1] == ([("=", 4, "2.5")], [])
    assert out[2] == ([("=", 1, "1"), ("=", 4, "0.5")], [])


def test_nested_partial_subrecord(spark):
    """Inlined (non-nullable) sub-record: only present subfields update,
    at their own flat cells (record_nested.lua:59-70 semantics)."""
    out = _ops(spark, NESTED, [{"f2": {"g2": 9}}, {"f2": {"g1": "a", "g2": 3}}])
    assert out[0] == ([("=", 3, "9")], [])
    assert out[1] == ([("=", 2, "a"), ("=", 3, "3")], [])


def test_input_order_is_op_order(spark):
    """Ops follow the input's own key order at every level
    (record_version.lua:108-143), not schema order."""
    df_rows = ['{"f3": 1.5, "f1": 2}', '{"f1": 2, "f3": 1.5}']
    out = _ops(spark, NESTED, df_rows)
    assert out[0][0] == [("=", 4, "1.5"), ("=", 1, "2")]
    assert out[1][0] == [("=", 1, "2"), ("=", 4, "1.5")]


def test_union_double_cell(spark):
    """Union fields update BOTH cells: [tag, value]
    (compiler.lua:1002-1013); JSON null selects the null branch."""
    out = _ops(spark, UNION, [
        {"u": {"int": 42}},
        {"u": {"string": "hi"}},
        {"u": None},
        {"k": 5},
    ])
    # reference tags are BRANCH indices: [null, int, string] → 0/1/2
    assert out[0] == ([("=", 2, "1"), ("=", 3, "42")], [])
    assert out[1] == ([("=", 2, "2"), ("=", 3, "hi")], [])
    assert out[2] == ([("=", 2, "0"), ("=", 3, None)], [])
    assert out[3] == ([("=", 1, "5")], [])


def test_unknown_key_and_bad_value_flag(spark):
    out = _ops(spark, NESTED, [
        {"zz": 1},
        {"f1": "not-an-int"},
        {"f2": {"zz": 1}},
    ])
    assert out[0][0] is None and out[0][1] == ['Unknown key: "zz"']
    assert out[1][0] is None and "Expecting INT" in out[1][1][0]
    assert out[2][0] is None and out[2][1] == ['f2: Unknown key: "zz"']


def test_invalid_json_flag(spark):
    out = _ops(spark, NESTED, ["{not json"])
    assert out[0][0] is None and out[0][1] == ["invalid JSON"]


def test_raise_mode(spark):
    cs = avro_spark.compile(avro_spark.create(NESTED))
    df = spark.createDataFrame([('{"zz": 1}',)], "j string")
    with pytest.raises(Exception, match='Unknown key'):
        xflatten_json(df, "j", cs, mode="raise").collect()


def test_matches_typed_xflatten(spark):
    """Same update through the typed path and the JSON path → same
    (field_no, value) set."""
    cs = avro_spark.compile(avro_spark.create(NESTED))
    tdf = spark.createDataFrame([(7, 1.25)], "f1 int, f3 double")
    typed = cs.xflatten(tdf).collect()[0].ops
    jdf = spark.createDataFrame([('{"f1": 7, "f3": 1.25}',)], "j string")
    js = xflatten_json(jdf, "j", cs).collect()[0].ops
    assert [(o.op, o.field_no, o.value) for o in typed] == \
        [(o.op, o.field_no, o.value) for o in js]


def test_nullable_record_alpha_gate(spark):
    sch = {
        "type": "record", "name": "N",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "r", "type": {
                "type": "record*", "name": "RR",
                "fields": [{"name": "x", "type": "int"}]}},
        ],
    }
    cs = avro_spark.compile(avro_spark.create(sch))
    df = spark.createDataFrame([('{"a": 1}',)], "j string")
    with pytest.raises(AvroSparkError, match="developement stage"):
        xflatten_json(df, "j", cs)
    cs2 = avro_spark.compile(
        avro_spark.create(sch), alpha_nullable_record_xflatten=True
    )
    out = xflatten_json(df, "j", cs2).collect()[0]
    assert [(o.op, o.field_no, o.value) for o in out.ops] == [("=", 1, "1")]
    # complete nullable-record value updates its single VLO cell as JSON
    df2 = spark.createDataFrame([('{"r": {"x": 5}}',)], "j string")
    out2 = xflatten_json(df2, "j", cs2).collect()[0]
    assert [(o.op, o.field_no) for o in out2.ops] == [("=", 2)]
    # INCOMPLETE nullable-record value flags (whole-cell semantics)
    sch3 = {
        "type": "record", "name": "N3",
        "fields": [{"name": "r", "type": {
            "type": "record*", "name": "R3",
            "fields": [{"name": "x", "type": "int"},
                       {"name": "y", "type": "int"}]}}],
    }
    cs3 = avro_spark.compile(
        avro_spark.create(sch3), alpha_nullable_record_xflatten=True
    )
    df3 = spark.createDataFrame([('{"r": {"x": 5}}',)], "j string")
    r3 = xflatten_json(df3, "j", cs3).collect()[0]
    assert r3.ops is None and 'Key missing: "y"' in r3[ERRORS_COL][0]


def test_service_field_offsets(spark):
    """Service cells shift every op index (init.lua:356-360)."""
    cs = avro_spark.compile(
        avro_spark.create(NESTED), service_fields=("string", "int")
    )
    df = spark.createDataFrame([('{"f1": 3}',)], "j string")
    out = xflatten_json(df, "j", cs).collect()[0]
    assert [(o.field_no, o.value) for o in out.ops] == [(3, "3")]


def test_reused_named_record_union_cells(spark):
    """A named record containing a union, referenced TWICE: both
    occurrences' union cells must emit ops (the cells share one
    UnionNode object — dedup must be positional, not by node id)."""
    sch = {
        "type": "record", "name": "Root",
        "fields": [
            {"name": "a", "type": {
                "type": "record", "name": "R",
                "fields": [{"name": "u", "type": ["int", "string"]}]}},
            {"name": "b", "type": "R"},
        ],
    }
    cs = avro_spark.compile(avro_spark.create(sch))
    df = spark.createDataFrame(
        [('{"a": {"u": {"int": 1}}, "b": {"u": {"int": 2}}}',)], "j string"
    )
    out = xflatten_json(df, "j", cs).collect()[0]
    assert out[ERRORS_COL] == []
    assert [(o.op, o.field_no, o.value) for o in out.ops] == [
        ("=", 1, "0"), ("=", 2, "1"), ("=", 3, "0"), ("=", 4, "2"),
    ]


def test_whole_number_double_matches_typed(spark):
    """2.0 must stringify as '2.0' on BOTH A7 faces (the raw variant
    lexical form would drop the fraction)."""
    cs = avro_spark.compile(avro_spark.create(NESTED))
    tdf = spark.createDataFrame([(2.0,)], "f3 double")
    typed = cs.xflatten(tdf).collect()[0].ops
    jdf = spark.createDataFrame([('{"f3": 2.0}',)], "j string")
    js = xflatten_json(jdf, "j", cs).collect()[0].ops
    assert [(o.field_no, o.value) for o in typed] == \
        [(o.field_no, o.value) for o in js] == [(4, "2.0")]


# ------------------------------------------------------------- fuzz parity
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PRIMS = ["int", "long", "string", "boolean", "double"]


def _gen_schema(draw, depth=2, counter=[0]):
    fields = []
    n = draw(st.integers(1, 4))
    for i in range(n):
        if depth > 0 and draw(st.booleans()):
            counter[0] += 1
            ftype = {
                "type": "record",
                "name": f"FZ{counter[0]}",
                "fields": _gen_schema(draw, depth - 1, counter)["fields"],
            }
        else:
            ftype = draw(st.sampled_from(_PRIMS))
        fields.append({"name": f"f{i}", "type": ftype})
    counter[0] += 1
    return {"type": "record", "name": f"FZ{counter[0]}", "fields": fields}


def _gen_partial(draw, schema_dict):
    """Random non-empty subset of fields, recursing into sub-records."""
    out = {}
    for f in schema_dict["fields"]:
        if not draw(st.booleans()):
            continue
        t = f["type"]
        if isinstance(t, dict):
            sub = _gen_partial(draw, t)
            if sub:
                out[f["name"]] = sub
        elif t == "int":
            out[f["name"]] = draw(st.integers(-2**31, 2**31 - 1))
        elif t == "long":
            out[f["name"]] = draw(st.integers(-2**63, 2**63 - 1))
        elif t == "string":
            out[f["name"]] = draw(st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                       exclude_characters='"\\'),
                max_size=8))
        elif t == "boolean":
            out[f["name"]] = draw(st.booleans())
        else:  # double
            v = draw(st.floats(allow_nan=False, allow_infinity=False, width=64))
            # Spark's Variant stores small JSON decimals as DECIMAL,
            # which has no signed zero — -0.0 is unrepresentable through
            # the JSON face (documented in _xj_render)
            out[f["name"]] = 0.0 if v == 0.0 else v
    return out


@given(data=st.data())
@settings(max_examples=20, deadline=None)
def test_fuzz_json_vs_typed_xflatten(data, spark):
    """Random partial records through BOTH A7 faces: identical
    (op, field_no, value) sequences."""
    schema_dict = _gen_schema(data.draw)
    partial = _gen_partial(data.draw, schema_dict)
    if not partial:
        return
    cs = avro_spark.compile(avro_spark.create(schema_dict))
    row, st_type = partial_row_and_type(cs.writer.root, partial)
    tdf = spark.createDataFrame([row], st_type)
    typed = cs.xflatten(tdf).collect()[0].ops
    jdf = spark.createDataFrame([(json.dumps(partial),)], "j string")
    out = xflatten_json(jdf, "j", cs).collect()[0]
    assert out[ERRORS_COL] == [], (schema_dict, partial, out[ERRORS_COL])
    got = [(o.op, o.field_no, o.value) for o in out.ops]
    want = [(o.op, o.field_no, o.value) for o in typed]
    assert got == want, (schema_dict, partial)
