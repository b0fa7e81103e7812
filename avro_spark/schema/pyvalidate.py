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
* errors are :class:`DataValidationError` with a slash-joined path prefix and
  the reference's exact message rendering (copy_data_eh,
  frontend.lua:941-962): ``Not a <tag>: <value>`` for type failures (tag =
  type name, or the NAME of a named type, or ``union``; value via Lua
  ``tostring``), and the ``@``-category messages ``Unknown field``,
  ``Field X missing``, ``Unexpected key in union``, ``Unexpected type in
  union: null``, ``Non-number array key``, ``Non-string map key``,
  ``Infinite loop detected in the data`` verbatim.
* reference cycles in the input are detected (frontend.lua:839-844)

This module is the *semantic oracle* for the DataFrame conformance operator in
:mod:`avro_spark.operators.conform`; the compiled (columnar) path must agree
with it.
"""

from __future__ import annotations

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
    NamedNode,
    Primitive,
    Record,
    SchemaNode,
    UnionNode,
)


def _err(msg: str, path: tuple) -> DataValidationError:
    return DataValidationError(msg, path)


def _tag(schema: SchemaNode) -> str:
    """copy_data_eh's tag: ``schema.name or schema.type or 'union'``."""
    if isinstance(schema, NamedNode):
        return schema.fullname
    if isinstance(schema, UnionNode):
        return "union"
    return schema.type


def _lua(v: Any) -> str:
    """Lua ``tostring`` of a JSON value — what the reference interpolates
    into ``Not a X: <v>`` (format %s). Strings are raw (unquoted), numbers
    use Lua's %.14g, nil/true/false spelled the Lua way."""
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return f"{v:.14g}"
    if isinstance(v, int) and abs(v) >= 10**14:
        # Lua numbers are doubles rendered with %.14g, which switches to
        # scientific notation at 14 significant digits — 10^15 prints
        # '1e+15', not '1000000000000000' ('Not a long:
        # 9.2233720368548e+18', validate.lua:151)
        return f"{float(v):.14g}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("latin-1")
    if isinstance(v, dict):
        return "table: 0x0"
    if isinstance(v, (list, tuple)):
        return "table: 0x0"
    return str(v)


def _not_a(schema: SchemaNode, data: Any, path: tuple) -> DataValidationError:
    return _err(f"Not a {_tag(schema)}: {_lua(data)}", path)


def validate(schema: SchemaNode, data: Any) -> Any:
    """Check ``data`` against ``schema``; return a normalized copy with
    defaults filled. Raises :class:`DataValidationError` on mismatch."""
    return _copy(schema, data, (), set())


def _copy(schema: SchemaNode, data: Any, path: tuple, visited: set[int]) -> Any:
    if schema.nullable and data is None:
        return None
    if isinstance(schema, Primitive):
        return _copy_primitive(schema, data, path)
    if isinstance(schema, Enum):
        if not isinstance(data, str) or data not in schema.symbol_index():
            # enum failures render the enum's NAME (frontend.lua:823-827 +
            # copy_data_eh tag), e.g. 'Not a foo: X'
            raise _not_a(schema, data, path)
        return data
    if isinstance(schema, Fixed):
        # reference: type(data) == 'string' and #data == size
        # (frontend.lua:829-834); tag is the fixed's name ('Not a fixed16: 42')
        if not isinstance(data, (bytes, bytearray, str)):
            raise _not_a(schema, data, path)
        if isinstance(data, str):
            try:
                raw = data.encode("latin-1")
            except UnicodeEncodeError:
                # not representable as a byte string at all — stay inside
                # the DataValidationError contract
                raise _not_a(schema, data, path) from None
        else:
            raw = bytes(data)
        if len(raw) != schema.size:
            raise _not_a(schema, data, path)
        return raw
    if isinstance(schema, Record):
        return _copy_record(schema, data, path, visited)
    if isinstance(schema, Array):
        if isinstance(data, dict):
            # Lua pairs() over the table (frontend.lua:883-890): every
            # present entry is copied at its own numeric key — 0,
            # negative, and float keys included (Lua type 'number');
            # holes are never visited; non-number keys error with the
            # key on the path. A dense 1..n result is the ordinary
            # array spelling and comes back as a list; anything else
            # stays keyed, like Lua's sparse table result.
            def _convert():
                out: dict = {}
                for k, v in data.items():
                    if isinstance(k, bool) or not isinstance(k, (int, float)):
                        raise _err("Non-number array key", path + (k,))
                    out[k] = _copy(schema.items, v, path + (k,), visited)
                n = len(out)
                if set(out) == set(range(1, n + 1)):
                    return [out[i + 1] for i in range(n)]
                return out

            return _guarded(visited, data, path, _convert)
        if not isinstance(data, (list, tuple)):
            raise _not_a(schema, data, path)
        return _guarded(visited, data, path, lambda: [
            _copy(schema.items, v, path + (i + 1,), visited) for i, v in enumerate(data)
        ])
    if isinstance(schema, Map):
        if not isinstance(data, dict):
            raise _not_a(schema, data, path)
        for k in data:
            if not isinstance(k, str):
                raise _err("Non-string map key", path + (k,))
        return _guarded(visited, data, path, lambda: {
            k: _copy(schema.values, v, path + (k,), visited) for k, v in data.items()
        })
    if isinstance(schema, UnionNode):
        return _copy_union(schema, data, path, visited)
    raise _err(f"Unsupported schema node {schema!r}", path)


def _guarded(visited: set[int], container: Any, path: tuple, fn):
    """Cycle detection on input containers (frontend.lua:839-844)."""
    if id(container) in visited:
        raise DataValidationError("Infinite loop detected in the data", path)
    visited.add(id(container))
    try:
        return fn()
    finally:
        visited.discard(id(container))


def _copy_primitive(schema: Primitive, data: Any, path: tuple) -> Any:
    t = schema.type
    if t == "null":
        if data is not None:
            raise _not_a(schema, data, path)
        return None
    if t == "boolean":
        if not isinstance(data, bool):
            raise _not_a(schema, data, path)
        return data
    if t in ("int", "long"):
        # reference accepts any Lua number with no fractional part inside
        # the range (frontend.lua:766-796): floats like 42.0 pass, 42.1 and
        # out-of-range values render 'Not a int: 42.1'
        if isinstance(data, bool):
            raise _not_a(schema, data, path)
        if isinstance(data, float):
            if not data.is_integer():
                raise _not_a(schema, data, path)
            n: Any = data
        elif isinstance(data, int):
            n = data
        else:
            raise _not_a(schema, data, path)
        lo, hi = (INT32_MIN, INT32_MAX) if t == "int" else (INT64_MIN, INT64_MAX)
        if not (lo <= n <= hi):
            raise _not_a(schema, data, path)
        return int(n)
    if t in ("float", "double"):
        if isinstance(data, bool) or not isinstance(data, (int, float)):
            raise _not_a(schema, data, path)
        return float(data)
    if t == "string":
        if not isinstance(data, str):
            raise _not_a(schema, data, path)
        return data
    if t == "bytes":
        if not isinstance(data, (bytes, bytearray, str)):
            raise _not_a(schema, data, path)
        if isinstance(data, str):
            try:
                return data.encode("latin-1")
            except UnicodeEncodeError:
                raise _not_a(schema, data, path) from None
        return bytes(data)
    if t == "any":
        return data
    raise _err(f"Unknown primitive {t}", path)


def _copy_record(schema: Record, data: Any, path: tuple, visited: set[int]) -> dict:
    if not isinstance(data, dict):
        raise _not_a(schema, data, path)
    names = schema.__dict__.setdefault(
        "_field_name_set", {f.name for f in schema.fields}
    )
    for k in data:
        # the reference REJECTS alias keys in validate: the fieldmap hit is
        # checked against the canonical name (frontend.lua:848-856
        # ``field.name ~= k`` → '@Unknown field' with the key in the path)
        if k not in names:
            raise _err("Unknown field", path + (k,))

    def build() -> dict:
        out: dict[str, Any] = {}
        for f in schema.fields:
            if f.name in data:
                out[f.name] = _copy(f.type, data[f.name], path + (f.name,), visited)
            elif f.has_default:
                out[f.name] = _copy_default(f)
            elif f.type.nullable or _is_null_union_ok(f.type):
                # missing nullable / null-union field → null (frontend.lua:866-881)
                out[f.name] = None
            else:
                raise _err(f"Field {f.name} missing", path)
        return out

    return _guarded(visited, data, path, build)


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
    if not isinstance(data, dict):
        # Lua next(data) raises on a non-table → 'Not a union: 42'
        raise _not_a(schema, data, path)
    if len(data) != 1:
        # extra key after the first (frontend.lua:914-918); the offending
        # (second) key lands in the path
        keys = list(data)
        extra = keys[1] if len(keys) > 1 else None
        raise _err("Unexpected key in union",
                   path + ((extra,) if extra is not None else ()))
    ((tag, value),) = data.items()
    idx = schema.tag_index().get(tag)
    if idx is None:
        raise _err("Unexpected key in union", path + (tag,))
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

        # reference wording: 'Default value not valid (%s)'
        # (frontend.lua:396-398)
        raise SchemaError(f"Default value not valid ({e.msg})", path) from e
