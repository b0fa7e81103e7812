"""Error-message parity gate over the DDT corpus (create/validate stages).

The full sweep (all stages incl. Spark-executed runtime errors) is
``tools/error_text_sweep.py --update`` → ERRORS.md. This test pins the
pure-Python stages, which need no Spark session and run in seconds:

* every extractable ``create_error`` / ``validate_error`` case must raise,
* and the rendered message must CONTAIN the reference's expected string
  verbatim (path prefix + wording) — frontend.lua:550-610 / 941-962 parity.

A small allowlist covers cases whose Lua-specific value rendering cannot be
reproduced from JSON input (documented in ERRORS.md).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

import avro_spark as avs
from ddt_extract import extract_file
from ddt_helpers import parse_payload

DDT_DIR = "/root/reference/test/ddt_suite"

# cases where the reference interpolates a Lua-runtime rendering our JSON
# replay cannot reproduce (e.g. cdata ctype names); they must still RAISE,
# only the wording is exempt
WORDING_EXEMPT: set[str] = {
    # tostring(ctype) / cdata-specific renderings would go here
}


def _cases(keys):
    out = []
    for fname in sorted(os.listdir(DDT_DIR)):
        if not fname.endswith(".lua"):
            continue
        for c in extract_file(os.path.join(DDT_DIR, fname)).cases:
            if any(k in c.fields for k in keys):
                out.append(pytest.param(c, id=f"{fname}:{c.line}"))
    return out


def _schemas(fields):
    return [fields[k] for k in ("schema", "schema1", "schema2") if k in fields]


def _create(raw):
    return avs.create(json.loads(raw) if isinstance(raw, str) else raw)


@pytest.mark.parametrize("case", _cases(("create_error",)))
def test_create_error_text(case):
    f = case.fields
    exp = f["create_error"]
    cid = f"{os.path.basename(case.file)}:{case.line}"
    with pytest.raises(Exception) as ei:
        for r in _schemas(f):
            _create(r)
    if cid not in WORDING_EXEMPT:
        assert exp in str(ei.value), (exp, str(ei.value))


@pytest.mark.parametrize("case", _cases(("validate_error",)))
def test_validate_error_text(case):
    f = case.fields
    exp = f["validate_error"]
    cid = f"{os.path.basename(case.file)}:{case.line}"
    schemas = [_create(r) for r in _schemas(f)]
    data, _ = parse_payload(f["validate"])
    with pytest.raises(Exception) as ei:
        avs.validate(schemas[0], data)
    if cid not in WORDING_EXEMPT:
        assert exp in str(ei.value), (exp, str(ei.value))


# ---------------------------------------------------------------- round 3:
# the 13 cases formerly classified 'accept' (typed-boundary) now render the
# reference message through genuine engine paths — pin each family.

def _compile(raw, raw2=None, **kw):
    return avs.compile(
        _create(raw), _create(raw2) if raw2 is not None else None, **kw
    )


@pytest.mark.parametrize(
    "schema,tag",
    [
        ('"int"', "INT"),
        ('"long"', "LONG"),
        ('"boolean"', "BOOL"),
        ('"string"', "STR"),
        ('"bytes"', "BIN"),
        ('"null"', "NIL"),
        ('{"type":"array","items":"int"}', "ARRAY"),
        ('{"type":"map","values":"int"}', "MAP"),
        ('{"type":"fixed","name":"F4","size":4}', "BIN"),
    ],
)
def test_float_column_bind_errors(spark, schema, tag):
    """A FloatType input column (the only Spark carrier of MsgPack f32)
    bound to a non-floating schema renders the reference's runtime
    message at plan-bind time (array.lua:95 etc.)."""
    from pyspark.sql.types import FloatType, StructField, StructType

    df = spark.createDataFrame(
        [(42.0,)], StructType([StructField("v", FloatType())])
    )
    c = _compile(schema)
    with pytest.raises(Exception, match=f"Expecting {tag}, encountered FLOAT"):
        c.flatten(df)


def test_float_column_accepted_for_floating(spark):
    from pyspark.sql.types import FloatType, StructField, StructType

    df = spark.createDataFrame(
        [(99.25,)], StructType([StructField("v", FloatType())])
    )
    assert _compile('"float"').flatten(df).collect()[0][0] == 99.25
    assert _compile('"double"').flatten(df).collect()[0][0] == 99.25


def test_union_versioning_flatten_tag(spark):
    """Writer branch with no reader mapping rejects on the TAG, before any
    value checking (union_versions.lua:25)."""
    from types import SimpleNamespace

    from avro_spark.operators.conform import ERRORS_COL, conform_json

    c = _compile('["null","int","double"]', '["null","string","int"]')
    # scalar-rooted compile wraps the root: validate against the inner
    # union node (same object the resolution plan references)
    sch = SimpleNamespace(root=c.writer.root.fields[0].type)
    jdf = spark.createDataFrame([('{"double": "42"}',), ('{"int": 7}',)], "j string")
    errs = [
        r[ERRORS_COL]
        for r in conform_json(
            jdf, "j", sch, mode="flag", resolution=c.plan
        ).collect()
    ]
    assert errs[0] == ['Unknown key: "double" (schema versioning)']
    assert errs[1] == []


def test_union_versioning_unflatten_tag(spark):
    """Flat [tag, value] whose tag is unmapped in the reader rejects on
    the tag CELL with the versioning rendering (union_versions.lua:102)."""
    from avro_spark.operators.conform import ERRORS_COL, conform_json_tuple

    c = _compile('["null","string","int"]', '["null","int","double"]')
    jdf = spark.createDataFrame([("[1, 42]",), ("[2, 42]",)], "j string")
    errs = [
        r[ERRORS_COL]
        for r in conform_json_tuple(jdf, "j", c, mode="flag").collect()
    ]
    assert errs[0] == ["1: Bad value: 1 (schema versioning)"]
    assert errs[1] == []


NULLABLE_REC = json.dumps({
    "type": "record", "name": "X", "fields": [
        {"name": "f1", "type": "int"},
        {"name": "f2", "type": {
            "type": "record*", "name": "Y", "fields": [
                {"name": "f3", "type": "int"},
                {"name": "f4", "type": "int"}]}}]})

UNION_REC = json.dumps({
    "type": "record", "name": "X", "fields": [
        {"name": "f1", "type": "int*"},
        {"name": "f2", "type": {"type": "array*", "items": "string*"}},
        {"name": "f3", "type": ["int", "X*"]},
        {"name": "f4", "type": {"type": "map*", "values": "int*"}}]})


def test_xflatten_nullable_record_incomplete(spark):
    """A nullable-record VALUE is one cell updated wholesale: a partial
    struct missing a required field raises 'f2: Key missing: "f4"'
    (record.lua:680)."""
    from pyspark.sql import types as T

    c = _compile(NULLABLE_REC, alpha_nullable_record_xflatten=True)
    st = T.StructType([T.StructField(
        "f2", T.StructType([T.StructField("f3", T.IntegerType())]))])
    df = spark.createDataFrame([((3,),)], st)
    with pytest.raises(Exception, match='f2: Key missing: "f4"'):
        c.xflatten_typed(df)


def test_xflatten_union_record_branch_incomplete(spark):
    """A record-branch VALUE inside a union update must be complete:
    'f3/X: Key missing: "f3"' (record.lua:633)."""
    from pyspark.sql import types as T

    from avro_spark.schema.spark_types import UNION_TAG

    c = _compile(UNION_REC, alpha_nullable_record_xflatten=True)
    st = T.StructType([T.StructField("f3", T.StructType([
        T.StructField(UNION_TAG, T.IntegerType()),
        T.StructField("int", T.IntegerType()),
        T.StructField("X", T.StructType([T.StructField("f1", T.IntegerType())])),
    ]))])
    df = spark.createDataFrame([((1, None, (1,)),)], st)
    with pytest.raises(Exception, match='f3/X: Key missing: "f3"'):
        c.xflatten_typed(df)
