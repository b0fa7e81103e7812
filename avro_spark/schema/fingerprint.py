"""Schema fingerprinting via Avro Parsing Canonical Form.

Re-implements ``fingerprint`` (reference: avro_schema/init.lua:516-522 →
fingerprint.lua:26-86): the schema is rendered to Parsing Canonical Form —
fullnames, attribute order ``name, type, fields, symbols, items, values,
size`` (fingerprint.lua:36-43), no whitespace — then hashed; the first
``size`` bytes of the digest are returned.

Deviations from strict Avro PCF, matching the reference:
* the ``*`` nullability extension is preserved in the type name
* attributes listed in the ``preserve_in_fingerprint`` create-option are
  rendered after the canonical attributes, sorted (fingerprint.lua:40-43,
  57-61); all other attributes — including preserved-in-AST-only ones,
  defaults, aliases — are dropped, exactly like the reference's
  ``avro_json`` which renders only the canonical order + extra fields.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Optional

from .nodes import (
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

_CANONICAL_ORDER = ("name", "type", "fields", "symbols", "items", "values", "size")


def canonical_form(node: SchemaNode, preserved: tuple[str, ...] = ()) -> str:
    """Parsing Canonical Form JSON string. ``preserved`` lists the attrs
    (from ``preserve_in_fingerprint``) rendered in addition to the canonical
    set."""
    return avro_json(_canon(node, set()), preserved)


def avro_json(data: Any, extra_fields: tuple[str, ...] = ()) -> str:
    """The reference's ``avro_json`` (fingerprint.lua:57-75): JSON with only
    the canonical attributes plus sorted ``extra_fields`` rendered, applied
    recursively — unknown keys are dropped at every level."""
    if isinstance(data, bool):
        return "true" if data else "false"
    if isinstance(data, (str, int, float)):
        return json.dumps(data, ensure_ascii=False)
    if isinstance(data, list):
        return "[" + ",".join(avro_json(x, extra_fields) for x in data) + "]"
    if isinstance(data, dict):
        order = list(_CANONICAL_ORDER) + sorted(extra_fields)
        parts = [
            f"{json.dumps(k)}:{avro_json(data[k], extra_fields)}"
            for k in order
            if data.get(k) is not None
        ]
        return "{" + ",".join(parts) + "}"
    raise TypeError(f"avro_json: data type is not supported: {type(data).__name__}")


def _canon(node: SchemaNode, built: set[str]) -> Any:
    if isinstance(node, Primitive):
        if node.extras:
            return {"type": node.type_name(), **node.extras}
        return node.type_name()
    if isinstance(node, UnionNode):
        return [_canon(b, built) for b in node.branches]
    if isinstance(node, NamedNode):
        if node.fullname in built:
            return node.fullname + ("*" if node.nullable else "")
        built.add(node.fullname)
        out: dict[str, Any] = {
            "name": node.fullname,
            "type": node.type + ("*" if node.nullable else ""),
        }
        if isinstance(node, Record):
            out["fields"] = [
                {"name": f.name, "type": _canon(f.type, built), **f.extras}
                for f in node.fields
            ]
        elif isinstance(node, Enum):
            out["symbols"] = list(node.symbols)
        elif isinstance(node, Fixed):
            out["size"] = node.size
        out.update(node.extras)
        return out
    if isinstance(node, Array):
        return {"type": "array" + ("*" if node.nullable else ""),
                "items": _canon(node.items, built), **node.extras}
    if isinstance(node, Map):
        return {"type": "map" + ("*" if node.nullable else ""),
                "values": _canon(node.values, built), **node.extras}
    raise TypeError(f"cannot canonicalize {node!r}")


def fingerprint(
    node: SchemaNode, algo: str = "sha256", size: int = 8,
    preserved: tuple[str, ...] = (),
) -> bytes:
    """First ``size`` bytes of ``algo``'s digest over the canonical form."""
    cf = canonical_form(node, preserved).encode("utf-8")
    h = hashlib.new(algo)
    h.update(cf)
    digest = h.digest()
    if size > len(digest):
        raise ValueError(f"fingerprint size {size} exceeds {algo} digest length {len(digest)}")
    return digest[:size]
