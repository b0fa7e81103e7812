"""Avro schema parser / normalizer.

Re-implements, from the public Avro specification plus observed reference
behavior, the ``create`` front end of tarantool/avro-schema
(avro_schema/frontend.lua:254-671 and init.lua:123-171):

* normalization: ``{"type": "int"}`` → ``"int"`` (frontend.lua:308-316)
* the ``*`` nullability suffix extension on any type name (frontend.lua:81-88)
* named types (record/enum/fixed) in a namespace-qualified scope, referencable
  by name after first definition (frontend.lua:116-162); the
  ``forward_reference`` option allows use-before-define (frontend.lua:154-161)
* aliases on named types and record fields (frontend.lua:194-221, 412-436)
* union branch uniqueness / no immediate nesting (frontend.lua:273-283)
* direct-containment recursion rejection (frontend.lua:369-389)
* per-field defaults validated against the field type; union defaults use the
  first branch (frontend.lua:974-987); ``defaults='auto'`` synthesizes
  zero-values (init.lua:77-121)
* ``hidden=true`` record fields (frontend.lua:437)
* ``utf8_enums`` relaxed symbol naming (frontend.lua:466-469)

All errors are :class:`SchemaError` with a slash-joined path prefix.
"""

from __future__ import annotations

import copy
import json
import re
from typing import Any, Optional

from ..errors import SchemaError
from .nodes import (
    NO_DEFAULT,
    PRIMITIVE_TYPES,
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

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_NAMED_KINDS = ("record", "enum", "fixed")


def _is_valid_name(s: str) -> bool:
    return bool(_NAME_RE.match(s))


def _is_valid_fullname(s: str) -> bool:
    return all(_is_valid_name(part) for part in s.split("."))


class _Scope:
    """Named-type scope: fullname → node (non-nullable variant)."""

    def __init__(self) -> None:
        self.types: dict[str, NamedNode] = {}
        # fullname → list of (setter, path) awaiting definition
        self.forward: dict[str, list] = {}


def _nullable_twin(node: SchemaNode) -> SchemaNode:
    """Return the nullable variant of ``node``; named-type twins share their
    definition internals so both variants stay consistent
    (reference: frontend.lua:116-162, 618-630)."""
    if node.nullable:
        return node
    if isinstance(node, Primitive):
        return Primitive(node.type, nullable=True)
    if isinstance(node, NamedNode):
        if node.twin is not None:
            return node.twin
        twin: NamedNode
        if isinstance(node, Record):
            twin = Record.__new__(Record)
            twin.name, twin.namespace, twin.aliases = node.name, node.namespace, node.aliases
            twin.fields = node.fields  # shared list: forward-filled fields propagate
            twin.nullable = True
            twin._field_index = None
        elif isinstance(node, Enum):
            twin = Enum.__new__(Enum)
            twin.name, twin.namespace, twin.aliases = node.name, node.namespace, node.aliases
            twin.symbols = node.symbols
            twin.nullable = True
            twin._symbol_index = None
        else:
            assert isinstance(node, Fixed)
            twin = Fixed(node.name, node.size, node.namespace, node.aliases, nullable=True)
        twin.twin = node
        node.twin = twin
        return twin
    if isinstance(node, Array):
        return Array(node.items, nullable=True)
    if isinstance(node, Map):
        return Map(node.values, nullable=True)
    raise SchemaError(f"'{node.type_name()}' cannot be nullable")


class SchemaParser:
    def __init__(
        self,
        forward_reference: bool = False,
        utf8_enums: bool = False,
        preserve_in_ast: tuple[str, ...] = (),
    ):
        self.forward_reference = forward_reference
        self.utf8_enums = utf8_enums
        self.preserve_in_ast = tuple(preserve_in_ast)
        self.scope = _Scope()
        # deferred default validations: (field, field_type, path)
        self._pending_defaults: list[tuple[Field, tuple[str, ...]]] = []

    # ------------------------------------------------------------------ API
    def parse(self, raw: Any) -> SchemaNode:
        if isinstance(raw, str) and raw.lstrip()[:1] in ("{", "[", '"'):
            try:
                raw = json.loads(raw)
            except ValueError:
                pass  # bare type-name string like "int"
        node = self._parse(raw, path=(), enclosing_ns=None, enclosing_records=())
        if self.scope.forward:
            missing = sorted(self.scope.forward)
            first_path = self.scope.forward[missing[0]][0][1]
            raise SchemaError(f"Unknown Avro type: {missing[0]}", first_path)
        self._validate_pending_defaults()
        return node

    # ------------------------------------------------------------- internal
    def _err(self, msg: str, path: tuple[str, ...]) -> SchemaError:
        return SchemaError(msg, path)

    def _parse(
        self,
        raw: Any,
        path: tuple[str, ...],
        enclosing_ns: Optional[str],
        enclosing_records: tuple[int, ...],
        setter=None,
    ) -> SchemaNode:
        """Parse one schema position. ``setter(node)`` is how a forward
        reference gets patched in later; ``enclosing_records`` carries ids of
        records on the containment path for recursion rejection."""
        if isinstance(raw, str):
            return self._parse_ref(raw, path, enclosing_ns, enclosing_records, setter)
        if isinstance(raw, list):
            return self._parse_union(raw, path, enclosing_ns, enclosing_records)
        if isinstance(raw, dict):
            t = raw.get("type")
            if t is None:
                raise self._err("Must have a 'type'", path)
            if isinstance(t, (list, dict)) and len(raw) == 1:
                # {"type": <complex>} wrapper → unwrap
                return self._parse(t, path, enclosing_ns, enclosing_records, setter)
            if not isinstance(t, str):
                raise self._err("Invalid Avro schema", path)
            nullable = t.endswith("*")
            base_t = t[:-1] if nullable else t
            if base_t in PRIMITIVE_TYPES or base_t == "any":
                # normalization: {"type":"int"} → "int" (frontend.lua:308-316)
                node: SchemaNode = Primitive(base_t)
            elif base_t == "record":
                node = self._parse_record(raw, path, enclosing_ns, enclosing_records)
            elif base_t == "enum":
                node = self._parse_enum(raw, path, enclosing_ns)
            elif base_t == "fixed":
                node = self._parse_fixed(raw, path, enclosing_ns)
            elif base_t == "array":
                if "items" not in raw:
                    raise self._err("array: must have 'items'", path)
                arr = Array(Primitive("null"))
                arr.items = self._parse(
                    raw["items"], path + ("items",), enclosing_ns, (),
                    setter=lambda n, a=arr: setattr(a, "items", n),
                )
                node = arr
            elif base_t == "map":
                if "values" not in raw:
                    raise self._err("map: must have 'values'", path)
                mp = Map(Primitive("null"))
                mp.values = self._parse(
                    raw["values"], path + ("values",), enclosing_ns, (),
                    setter=lambda n, m=mp: setattr(m, "values", n),
                )
                node = mp
            else:
                # named-type reference spelled as {"type": "Name"}
                return self._parse_ref(t, path, enclosing_ns, enclosing_records, setter)
            if nullable:
                node = _nullable_twin(node)
            if self.preserve_in_ast:
                extras = {
                    k: copy.deepcopy(raw[k]) for k in self.preserve_in_ast if k in raw
                }
                if extras:
                    node.extras = extras
                    if isinstance(node, NamedNode) and node.twin is not None:
                        node.twin.extras = extras
            return node
        raise self._err(f"Invalid Avro schema: {raw!r}", path)

    def _parse_ref(
        self,
        name: str,
        path: tuple[str, ...],
        enclosing_ns: Optional[str],
        enclosing_records: tuple[int, ...],
        setter,
    ) -> SchemaNode:
        nullable = name.endswith("*")
        base = name[:-1] if nullable else name
        if base in PRIMITIVE_TYPES:
            return Primitive(base, nullable=nullable)
        if base == "any":
            # "any*" is legal and validate-only, like "any" itself
            # (validate.lua: {"name":"X","type":"any*"} accepts missing field)
            return Primitive("any", nullable=nullable)
        if not _is_valid_fullname(base):
            raise self._err(f"Bad type name: {base}", path)
        fullname = base if "." in base else (f"{enclosing_ns}.{base}" if enclosing_ns else base)
        found = self.scope.types.get(fullname) or self.scope.types.get(base)
        if found is not None:
            if id(found) in enclosing_records:
                # direct containment cycle (frontend.lua:369-389)
                raise self._err(
                    f"Record {found.fullname} contains itself via {path[-1] if path else '?'}",
                    path,
                )
            return _nullable_twin(found) if nullable else found
        if not self.forward_reference:
            raise self._err(f"Unknown Avro type: {base}", path)
        # forward reference: placeholder patched when the definition appears
        placeholder = Record(base + "!fwd", [])
        if setter is None:
            raise self._err(f"Unknown Avro type: {base}", path)
        self.scope.forward.setdefault(fullname, []).append(
            ((lambda n: setter(_nullable_twin(n) if nullable else n)), path)
        )
        return placeholder

    def _register_named(self, node: NamedNode, path: tuple[str, ...]) -> None:
        fn = node.fullname
        if fn in self.scope.types:
            raise self._err(f"Type name already defined: {fn}", path)
        self.scope.types[fn] = node
        for alias in node.aliases:
            fa = alias if "." in alias else (f"{node.namespace}.{alias}" if node.namespace else alias)
            if fa in self.scope.types:
                # includes an alias equal to the type's own name
                # (frontend.lua:194-221; invalid.lua "Alias type name
                # already defined")
                raise self._err(
                    f"Alias type name already defined: {alias}", path + (node.name,)
                )
            self.scope.types[fa] = node
        waiting = self.scope.forward.pop(fn, []) + (
            self.scope.forward.pop(node.name, []) if "." in fn else []
        )
        for patch, _p in waiting:
            patch(node)

    def _parse_name_ns(
        self, raw: dict, path: tuple[str, ...], enclosing_ns: Optional[str]
    ) -> tuple[str, Optional[str], tuple[str, ...]]:
        name = raw.get("name")
        if not isinstance(name, str) or not name:
            raise self._err("Must have a 'name'", path)
        ns = raw.get("namespace", None)
        if "." in name:
            ns, name = name.rsplit(".", 1)
        elif ns is None:
            ns = enclosing_ns
        if not _is_valid_name(name) or (ns is not None and not _is_valid_fullname(ns)):
            raise self._err(f"Bad type name: {name}", path)
        aliases = raw.get("aliases", [])
        if not isinstance(aliases, list) or not all(isinstance(a, str) for a in aliases):
            raise self._err("Property 'aliases' must be a list of strings", path)
        for a in aliases:
            if not _is_valid_fullname(a):
                raise self._err(f"Bad type name: {a}", path)
        return name, ns, tuple(aliases)

    def _parse_record(
        self,
        raw: dict,
        path: tuple[str, ...],
        enclosing_ns: Optional[str],
        enclosing_records: tuple[int, ...],
    ) -> Record:
        name, ns, aliases = self._parse_name_ns(raw, path, enclosing_ns)
        rec = Record(name, [], namespace=ns, aliases=aliases)
        self._register_named(rec, path)
        fields_raw = raw.get("fields")
        if not isinstance(fields_raw, list):
            raise self._err("Record type must have 'fields'", path + (rec.name,))
        if not fields_raw:
            raise self._err("Record type must have at least one field", path + (rec.name,))
        seen: set[str] = set()
        inner = enclosing_records + (id(rec),)
        for fr in fields_raw:
            fpath = path + (rec.name,)
            if not isinstance(fr, dict):
                raise self._err("Record field must be a map", fpath)
            fname = fr.get("name")
            if not isinstance(fname, str):
                raise self._err("Record field must have a 'name'", fpath)
            if not _is_valid_name(fname):
                raise self._err(f"Bad record field name: {fname}", fpath)
            if fname in seen:
                # field names and earlier field aliases share one namespace
                # (frontend.lua:412-436; invalid.lua "Record contains field
                # B twice" for a field named like a prior alias)
                raise self._err(f"Record contains field {fname} twice", fpath)
            seen.add(fname)
            if "type" not in fr:
                raise self._err("Record field must have a 'type'", fpath + (fname,))
            faliases = tuple(fr.get("aliases", []))
            for a in faliases:
                if not isinstance(a, str) or not _is_valid_name(a):
                    raise self._err(f"Bad field alias name: {a}", fpath + (fname,))
                if a in seen:
                    raise self._err(
                        f"Alias field name already defined: {a}", fpath + (fname,)
                    )
                seen.add(a)
            field = Field(
                fname,
                Primitive("null"),
                default=fr["default"] if "default" in fr else NO_DEFAULT,
                aliases=faliases,
                hidden=bool(fr.get("hidden", False)),
                extras={
                    k: copy.deepcopy(fr[k]) for k in self.preserve_in_ast if k in fr
                },
            )
            field.type = self._parse(
                fr["type"], fpath + (fname,), ns, inner,
                setter=lambda n, f=field: setattr(f, "type", n),
            )
            if field.has_default:
                self._pending_defaults.append((field, fpath + (fname,)))
            rec.fields.append(field)
        return rec

    def _parse_enum(self, raw: dict, path: tuple[str, ...], enclosing_ns) -> Enum:
        name, ns, aliases = self._parse_name_ns(raw, path, enclosing_ns)
        symbols = raw.get("symbols")
        if not isinstance(symbols, list) or not symbols:
            raise self._err("Enum type must have 'symbols'", path + (name,))
        seen: set[str] = set()
        for s in symbols:
            if not isinstance(s, str):
                raise self._err(f"Bad enum symbol: {s!r}", path + (name,))
            if not self.utf8_enums and not _is_valid_name(s):
                raise self._err(f"Bad enum symbol name: {s}", path + (name,))
            if s in seen:
                raise self._err(f"Enum contains symbol {s} twice", path + (name,))
            seen.add(s)
        enum = Enum(name, list(symbols), namespace=ns, aliases=aliases)
        self._register_named(enum, path)
        return enum

    def _parse_fixed(self, raw: dict, path: tuple[str, ...], enclosing_ns) -> Fixed:
        name, ns, aliases = self._parse_name_ns(raw, path, enclosing_ns)
        size = raw.get("size")
        if not isinstance(size, int) or isinstance(size, bool) or size <= 0:
            raise self._err("Fixed type must have a positive 'size'", path + (name,))
        fx = Fixed(name, size, namespace=ns, aliases=aliases)
        self._register_named(fx, path)
        return fx

    def _parse_union(
        self,
        raw: list,
        path: tuple[str, ...],
        enclosing_ns: Optional[str],
        enclosing_records: tuple[int, ...],
    ) -> UnionNode:
        if not raw:
            raise self._err("Union type must have at least one branch", path)
        union = UnionNode([])
        tags: set[str] = set()
        for i, braw in enumerate(raw):
            bpath = path + (f"<branch-{i + 1}>",)
            if isinstance(braw, list):
                # no immediate union nesting (frontend.lua:273-283)
                raise self._err("Union may not immediately contain other unions", bpath)
            # union indirection breaks the direct-containment chain
            # (recursion via union/array is legal, frontend.lua:369-389)
            branch = self._parse(
                braw, bpath, enclosing_ns, (),
                setter=lambda n, u=union, j=i: u.branches.__setitem__(j, n),
            )
            # nullable branches are legal (e.g. ["int", "X*"],
            # record.lua nullable_xflatten; only immediate unions and
            # duplicate tags are rejected, frontend.lua:273-283)
            union.branches.append(branch)
            tag = union.branch_tag(i)
            if tag in tags:
                raise self._err(f"Union contains {tag} twice", bpath)
            tags.add(tag)
        return union

    # ------------------------------------------------------------- defaults
    def _validate_pending_defaults(self) -> None:
        from .pyvalidate import validate_default  # lazy: avoid import cycle

        for field, path in self._pending_defaults:
            field.default = validate_default(field.type, field.default, path)


def auto_default(node: SchemaNode) -> Any:
    """Zero-value synthesis for ``defaults='auto'`` (reference:
    init.lua:77-121)."""
    if node.nullable:
        return None
    if isinstance(node, Primitive):
        return {
            "null": None, "boolean": False, "int": 0, "long": 0,
            "float": 0.0, "double": 0.0, "string": "", "bytes": b"", "any": None,
        }[node.type]
    if isinstance(node, Enum):
        return node.symbols[0]
    if isinstance(node, Fixed):
        return b"\x00" * node.size
    if isinstance(node, Array):
        return []
    if isinstance(node, Map):
        return {}
    if isinstance(node, Record):
        return {f.name: (f.default if f.has_default else auto_default(f.type)) for f in node.fields}
    if isinstance(node, UnionNode):
        first = node.branches[0]
        if isinstance(first, Primitive) and first.type == "null":
            return None
        return {node.branch_tag(0): auto_default(first)}
    raise SchemaError(f"cannot synthesize default for {node.type_name()}")


def apply_auto_defaults(node: SchemaNode, _seen: Optional[set[int]] = None) -> None:
    """Fill every defaultless record field with its zero value."""
    if _seen is None:
        _seen = set()
    if id(node) in _seen:
        return
    _seen.add(id(node))
    if isinstance(node, Record):
        for f in node.fields:
            apply_auto_defaults(f.type, _seen)
            if not f.has_default:
                f.default = auto_default(f.type)
    elif isinstance(node, Array):
        apply_auto_defaults(node.items, _seen)
    elif isinstance(node, Map):
        apply_auto_defaults(node.values, _seen)
    elif isinstance(node, UnionNode):
        for b in node.branches:
            apply_auto_defaults(b, _seen)
