"""Schema export: AST → plain Avro-JSON-able form.

Re-implements ``export`` (reference: avro_schema/init.lua:512-514 →
frontend.lua:1300-1379 ``export_helper``):

* nullability is packed back into the type name as a ``*`` suffix
* repeated occurrences of a named type become a name reference string
* a ``{"type": "int"}`` wrapper with no other attributes canonizes to ``"int"``
"""

from __future__ import annotations

from typing import Any, Optional

from .nodes import (
    NO_DEFAULT,
    Array,
    Enum,
    Fixed,
    Map,
    NamedNode,
    Primitive,
    Record,
    SchemaNode,
    UnionNode,
)


def export(node: SchemaNode, _built: Optional[set[str]] = None) -> Any:
    if _built is None:
        _built = set()
    if isinstance(node, Primitive):
        if node.extras:
            # preserved attrs prevent primitive collapse
            # (api_tests/export.lua "Prevent primitive type collapse")
            return {"type": node.type_name(), **node.extras}
        return node.type_name()
    if isinstance(node, UnionNode):
        return [export(b, _built) for b in node.branches]
    if isinstance(node, NamedNode):
        if node.fullname in _built:
            return node.type_name()  # name reference, '*'-suffixed if nullable
        _built.add(node.fullname)
        out: dict[str, Any] = {"type": node.type + ("*" if node.nullable else ""), "name": node.name}
        if node.namespace:
            out["namespace"] = node.namespace
        if node.aliases:
            out["aliases"] = list(node.aliases)
        if isinstance(node, Record):
            fields = []
            for f in node.fields:
                xf: dict[str, Any] = {"name": f.name, "type": export(f.type, _built)}
                if f.default is not NO_DEFAULT:
                    xf["default"] = _export_default(f.type, f.default)
                if f.aliases:
                    xf["aliases"] = list(f.aliases)
                if f.hidden:
                    xf["hidden"] = True
                xf.update(f.extras)
                fields.append(xf)
            out["fields"] = fields
        elif isinstance(node, Enum):
            out["symbols"] = list(node.symbols)
        elif isinstance(node, Fixed):
            out["size"] = node.size
        out.update(node.extras)
        return out
    if isinstance(node, Array):
        out = {"type": "array" + ("*" if node.nullable else ""), "items": export(node.items, _built)}
        out.update(node.extras)
        return out
    if isinstance(node, Map):
        out = {"type": "map" + ("*" if node.nullable else ""), "values": export(node.values, _built)}
        out.update(node.extras)
        return out
    raise TypeError(f"cannot export {node!r}")


def _export_default(node: SchemaNode, value: Any) -> Any:
    """Union defaults are stored internally as {tag: value} but exported as
    the bare first-branch value (Avro spec JSON form). Bytes decode to
    latin-1 strings RECURSIVELY — a bytes value nested inside a union,
    record, array, or map default is just as unserializable to JSON as a
    top-level one."""
    if isinstance(node, UnionNode) and isinstance(value, dict) and len(value) == 1:
        value = next(iter(value.values()))
    return _jsonable(value)


def _jsonable(value: Any) -> Any:
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).decode("latin-1")
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    return value
