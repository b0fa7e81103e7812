"""Pure-Python data validation against a schema AST.

Re-implements the semantics of the reference's interpretive ``validate`` path
(avro_schema/frontend.lua:740-972 ``copy_data``/``validate_data``):

* primitives type- and range-checked, including exact int32/int64 boundaries
  (frontend.lua:766-796)
* records: unknown fields rejected, missing fields filled from defaults, or
  ``null`` for nullable / null-union fields (frontend.lua:846-881)
* unions accept ``null`` or a single-entry map ``{tag: value}``
  (frontend.lua:899-919)
* returns a normalized deep copy; never mutates the input
* errors are :class:`DataValidationError` with a slash-joined path prefix
* reference cycles in the input are detected (frontend.lua:839-844)

This module is the *semantic oracle* for the DataFrame conformance operator in
:mod:`avro_spark.operators.conform`; the compiled (columnar) path must agree
with it.
"""

from __future__ import annotations

import math
from typing import Any, Optional

from ..errors import DataValidationError
from .nodes import (
    INT32_MAX,
    INT32_MIN,
    INT64_MAX,
    INT64_MIN,
    NO_DEFAULT,
    Array,
    Enum,
    Field,
    Fixed,
    Map,
    Primitive,
    Record,
    SchemaNode,
    UnionNode,
)


def _err(msg: str, path: tuple) -> DataValidationError:
    return DataValidationError(msg, path)


def _type_name(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "int/long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, dict):
        return "map"
    if isinstance(v, (list, tuple)):
        return "array"
    return type(v).__name__


def validate(schema: SchemaNode, data: Any) -> Any:
    """Check ``data`` against ``schema``; return a normalized copy with
    defaults filled. Raises :class:`DataValidationError` on mismatch."""
    return _copy(schema, data, (), set())


def _copy(schema: SchemaNode, data: Any, path: tuple, visited: set[int]) -> Any:
    if schema.nullable and data is None:
        return None
    if isinstance(schema, Primitive):
        return _copy_primitive(schema.type, data, path)
    if isinstance(schema, Enum):
        if not isinstance(data, str) or data not in schema.symbol_index():
            raise _err(f"Bad value: {data!r} (enum {schema.name})", path)
        return data
    if isinstance(schema, Fixed):
        if not isinstance(data, (bytes, bytearray, str)):
            raise _err(f"Expecting bytes, encountered {_type_name(data)}", path)
        raw = data.encode("latin-1") if isinstance(data, str) else bytes(data)
        if len(raw) != schema.size:
            raise _err(f"Bad value: {data!r} (fixed size {schema.size})", path)
        return raw
    if isinstance(schema, Record):
        return _copy_record(schema, data, path, visited)
    if isinstance(schema, Array):
        if not isinstance(data, (list, tuple)):
            raise _err(f"Expecting ARRAY, encountered {_type_name(data)}", path)
        return _guarded(visited, data, lambda: [
            _copy(schema.items, v, path + (i + 1,), visited) for i, v in enumerate(data)
        ])
    if isinstance(schema, Map):
        if not isinstance(data, dict):
            raise _err(f"Expecting MAP, encountered {_type_name(data)}", path)
        for k in data:
            if not isinstance(k, str):
                raise _err(f"Non-string key in map: {k!r}", path)
        return _guarded(visited, data, lambda: {
            k: _copy(schema.values, v, path + (k,), visited) for k, v in data.items()
        })
    if isinstance(schema, UnionNode):
        return _copy_union(schema, data, path, visited)
    raise _err(f"Unsupported schema node {schema!r}", path)


def _guarded(visited: set[int], container: Any, fn):
    """Cycle detection on input containers (frontend.lua:839-844)."""
    if id(container) in visited:
        raise DataValidationError("Infinite loop detected in the data", ())
    visited.add(id(container))
    try:
        return fn()
    finally:
        visited.discard(id(container))


def _copy_primitive(t: str, data: Any, path: tuple) -> Any:
    if t == "null":
        if data is not None:
            raise _err(f"Expecting NIL, encountered {_type_name(data)}", path)
        return None
    if t == "boolean":
        if not isinstance(data, bool):
            raise _err(f"Expecting BOOL, encountered {_type_name(data)}", path)
        return data
    if t == "int":
        if isinstance(data, bool) or not isinstance(data, int):
            raise _err(f"Expecting INT, encountered {_type_name(data)}", path)
        if not (INT32_MIN <= data <= INT32_MAX):
            raise _err(f"Value exceeds INT range: {data}", path)
        return data
    if t == "long":
        if isinstance(data, bool) or not isinstance(data, int):
            raise _err(f"Expecting LONG, encountered {_type_name(data)}", path)
        if not (INT64_MIN <= data <= INT64_MAX):
            raise _err(f"Value exceeds LONG range: {data}", path)
        return data
    if t in ("float", "double"):
        if isinstance(data, bool) or not isinstance(data, (int, float)):
            raise _err(f"Expecting DOUBLE, encountered {_type_name(data)}", path)
        v = float(data)
        if t == "float" and math.isfinite(v) and abs(v) > 3.4028234663852886e38:
            raise _err(f"Value exceeds FLOAT range: {data}", path)
        return v
    if t == "string":
        if not isinstance(data, str):
            raise _err(f"Expecting STR, encountered {_type_name(data)}", path)
        return data
    if t == "bytes":
        if not isinstance(data, (bytes, bytearray, str)):
            raise _err(f"Expecting BIN, encountered {_type_name(data)}", path)
        return data.encode("latin-1") if isinstance(data, str) else bytes(data)
    if t == "any":
        return data
    raise _err(f"Unknown primitive {t}", path)


def _copy_record(schema: Record, data: Any, path: tuple, visited: set[int]) -> dict:
    if not isinstance(data, dict):
        raise _err(f"Expecting MAP, encountered {_type_name(data)}", path)
    index = schema.field_index()
    for k in data:
        if k not in index:
            raise _err(f"Unknown field {k!r}", path)

    def build() -> dict:
        out: dict[str, Any] = {}
        for f in schema.fields:
            present = f.name if f.name in data else next((a for a in f.aliases if a in data), None)
            if present is not None:
                out[f.name] = _copy(f.type, data[present], path + (f.name,), visited)
            elif f.has_default:
                out[f.name] = _copy_default(f)
            elif f.type.nullable or _is_null_union_ok(f.type):
                # missing nullable / null-union field → null (frontend.lua:866-881)
                out[f.name] = None
            else:
                raise _err(f"Field {f.name} missing", path)
        return out

    return _guarded(visited, data, build)


def _is_null_union_ok(node: SchemaNode) -> bool:
    return (
        isinstance(node, UnionNode)
        and any(isinstance(b, Primitive) and b.type == "null" for b in node.branches)
    ) or (isinstance(node, Primitive) and node.type == "null")


def _copy_default(f: Field) -> Any:
    # defaults were validated+normalized at create time; deep-copy containers
    import copy as _c

    return _c.deepcopy(f.default)


def _copy_union(schema: UnionNode, data: Any, path: tuple, visited: set[int]) -> Any:
    has_null = any(isinstance(b, Primitive) and b.type == "null" for b in schema.branches)
    if data is None:
        if has_null:
            return None
        raise _err("Unexpected type in union: null", path)
    if not isinstance(data, dict) or len(data) != 1:
        raise _err(
            f"Unexpected key in union: expected single-entry map, got {_type_name(data)}", path
        )
    ((tag, value),) = data.items()
    idx = schema.tag_index().get(tag)
    if idx is None:
        raise _err(f"Unexpected key in union: {tag}", path)
    branch = schema.branches[idx]
    return {schema.branch_tag(idx): _copy(branch, value, path + (tag,), visited)}


def validate_default(schema: SchemaNode, default: Any, path: tuple) -> Any:
    """Validate a field default at schema-create time (frontend.lua:974-987).
    Union defaults are written as the *bare value* of the first branch
    (Avro spec) and normalized to the {tag: value} internal form."""
    if default is NO_DEFAULT:
        return NO_DEFAULT
    # Lua/MsgPack can't distinguish an empty map from an empty array, so the
    # reference accepts [] as an empty-map default (record.lua:417-421)
    if isinstance(schema, Map) and default == []:
        default = {}
    try:
        if isinstance(schema, UnionNode):
            first = schema.branches[0]
            if isinstance(first, Primitive) and first.type == "null":
                if default is not None:
                    raise _err("Default value for a null-first union must be null", path)
                return None
            v = _copy(first, default, path, set())
            return {schema.branch_tag(0): v}
        return _copy(schema, default, path, set())
    except DataValidationError as e:
        from ..errors import SchemaError

        raise SchemaError(f"Default value is invalid: {e.msg}", path) from e
