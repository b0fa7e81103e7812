"""Spark StructType → Avro schema inference (the reverse of
``to_spark_type``), so existing DataFrames can onboard without
hand-writing Avro JSON.

Mapping (inverse of spark_types.py §1.5 table):

| Spark                    | Avro (reference conventions)               |
|--------------------------|--------------------------------------------|
| BooleanType              | boolean                                    |
| ByteType/ShortType/Int   | int                                        |
| LongType                 | long                                       |
| FloatType                | float                                      |
| DoubleType               | double                                     |
| StringType / char/varchar| string                                     |
| BinaryType               | bytes                                      |
| StructType               | record (named after the field path)        |
| ArrayType                | array                                      |
| MapType(string, V)       | map                                        |
| nullable field/element   | ``*`` nullability extension                |
| DateType                 | int  (days since epoch)    [coerce=True]   |
| Timestamp/NTZ            | long (epoch microseconds)  [coerce=True]   |
| DecimalType              | double (lossy)             [coerce=True]   |

Lossy/representation-changing mappings (date, timestamp, decimal) are
refused unless ``coerce=True`` — the reference type system has no
logical types (frontend.lua:47-51), so these cannot round-trip typed.

The inferred schema is built as a plain Avro-JSON dict and run through
``create()``, so it gets the full reference-grade validation (name
rules, nested-record naming, defaults) for free, and
``to_struct_type(infer_schema(st).root)`` round-trips the Spark type
(modulo the int-width widening above).
"""

from __future__ import annotations

import re
from typing import Any, Union

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..errors import SchemaError
from . import Schema, create

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_ATOMIC = {
    T.BooleanType: "boolean",
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.VarcharType: "string",
    T.CharType: "string",
    T.BinaryType: "bytes",
    T.NullType: "null",
}

_COERCED = {
    T.DateType: "int",
    T.TimestampType: "long",
    T.TimestampNTZType: "long",
}


def _record_name(path: str, taken: set[str]) -> str:
    """Unique Avro-legal record name derived from the field path."""
    base = "".join(p.capitalize() for p in re.split(r"[^A-Za-z0-9]+", path) if p)
    if not base or not _NAME_RE.match(base):
        base = "Nested"
    name, i = base, 1
    while name in taken:
        i += 1
        name = f"{base}{i}"
    taken.add(name)
    return name


def _nullable_suffix(t, nullable: bool):
    """Apply the reference's ``*`` extension to a built Avro type."""
    if not nullable:
        return t
    if isinstance(t, str):
        if t == "null":
            return t
        return t + "*"
    out = dict(t)
    out["type"] = out["type"] + "*"
    return out


def _node(dt: T.DataType, nullable: bool, path: str, taken: set[str], coerce: bool):
    for cls, avro in _ATOMIC.items():
        if isinstance(dt, cls):
            return _nullable_suffix(avro, nullable)
    for cls, avro in _COERCED.items():
        if isinstance(dt, cls):
            if not coerce:
                raise SchemaError(
                    f"{path}: {dt.simpleString()} has no Avro equivalent "
                    "(reference has no logical types); pass coerce=True to "
                    f"map it to '{avro}'"
                )
            return _nullable_suffix(avro, nullable)
    if isinstance(dt, T.DecimalType):
        if not coerce:
            raise SchemaError(
                f"{path}: decimal has no Avro equivalent; pass coerce=True "
                "to map it (lossily) to 'double'"
            )
        return _nullable_suffix("double", nullable)
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            if not _NAME_RE.match(f.name):
                raise SchemaError(
                    f"{path}.{f.name}: not an Avro-legal field name"
                )
            fields.append(
                {
                    "name": f.name,
                    "type": _node(
                        f.dataType, f.nullable, f"{path}.{f.name}", taken, coerce
                    ),
                }
            )
        rec = {"type": "record", "name": _record_name(path, taken), "fields": fields}
        return _nullable_suffix(rec, nullable)
    if isinstance(dt, T.ArrayType):
        return _nullable_suffix(
            {
                "type": "array",
                "items": _node(
                    dt.elementType, dt.containsNull, f"{path}[]", taken, coerce
                ),
            },
            nullable,
        )
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, (T.StringType, T.VarcharType, T.CharType)):
            raise SchemaError(
                f"{path}: Avro maps require string keys, got "
                f"{dt.keyType.simpleString()}"
            )
        return _nullable_suffix(
            {
                "type": "map",
                "values": _node(
                    dt.valueType, dt.valueContainsNull, f"{path}{{}}", taken, coerce
                ),
            },
            nullable,
        )
    raise SchemaError(f"{path}: cannot infer Avro type for {dt.simpleString()}")


def infer_schema(
    source: Union[DataFrame, T.StructType],
    name: str = "Record",
    coerce: bool = False,
) -> Schema:
    """Build a validated :class:`Schema` from a DataFrame (its schema) or
    a bare ``StructType``. Top-level field nullability maps to the
    reference's ``*`` extension; nested structs become named records
    (names derived from field paths, uniquified)."""
    st = source.schema if isinstance(source, DataFrame) else source
    if not isinstance(st, T.StructType):
        raise SchemaError(f"expected StructType, got {type(st).__name__}")
    if not _NAME_RE.match(name):
        raise SchemaError(f"not an Avro-legal record name: {name}")
    taken = {name}
    fields: list[dict[str, Any]] = []
    for f in st.fields:
        if not _NAME_RE.match(f.name):
            raise SchemaError(f"{f.name}: not an Avro-legal field name")
        fields.append(
            {
                "name": f.name,
                "type": _node(f.dataType, f.nullable, f.name, taken, coerce),
            }
        )
    return create({"type": "record", "name": name, "fields": fields})
