"""Schema fingerprinting via Avro Parsing Canonical Form.

Re-implements ``fingerprint`` (reference: avro_schema/init.lua:516-522 →
fingerprint.lua:26-86): the schema is rendered to Parsing Canonical Form —
fullnames, attribute order ``name, type, fields, symbols, items, values,
size`` (fingerprint.lua:36-43), no whitespace — then hashed; the first
``size`` bytes of the digest are returned.

Deviations from strict Avro PCF, matching the reference:
* the ``*`` nullability extension is preserved in the type name
* attributes listed in the ``preserve_in_ast`` create-option are appended
  after the canonical attributes (reference keeps user-preserved fields).
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
    """Parsing Canonical Form JSON string."""
    return _render(_canon(node, set()))


def _canon(node: SchemaNode, built: set[str]) -> Any:
    if isinstance(node, Primitive):
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
                {"name": f.name, "type": _canon(f.type, built)} for f in node.fields
            ]
        elif isinstance(node, Enum):
            out["symbols"] = list(node.symbols)
        elif isinstance(node, Fixed):
            out["size"] = node.size
        return out
    if isinstance(node, Array):
        return {"type": "array" + ("*" if node.nullable else ""), "items": _canon(node.items, built)}
    if isinstance(node, Map):
        return {"type": "map" + ("*" if node.nullable else ""), "values": _canon(node.values, built)}
    raise TypeError(f"cannot canonicalize {node!r}")


def _render(obj: Any) -> str:
    """JSON with canonical attribute order and no whitespace."""
    if isinstance(obj, str):
        return json.dumps(obj, ensure_ascii=False)
    if isinstance(obj, list):
        return "[" + ",".join(_render(x) for x in obj) + "]"
    if isinstance(obj, dict):
        keys = [k for k in _CANONICAL_ORDER if k in obj]
        keys += sorted(k for k in obj if k not in _CANONICAL_ORDER)
        return "{" + ",".join(f"{json.dumps(k)}:{_render(obj[k])}" for k in keys) + "}"
    return json.dumps(obj)


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
