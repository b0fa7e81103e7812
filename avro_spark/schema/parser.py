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


def lua_str(v: Any) -> str:
    """Render a JSON scalar the way Lua ``tostring`` does — the reference
    interpolates raw user values into error messages via tostring
    (frontend.lua copy_schema_error call sites), so exact message parity
    needs the same rendering: ``true``/``false``/``nil``, integral floats
    without the trailing ``.0``."""
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() and abs(v) < 1e15 else repr(v)
    return str(v)


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
                # frontend.lua:296 'Must have a "type"'
                raise self._err('Must have a "type"', path)
            if isinstance(t, (list, dict)) and len(raw) == 1:
                # {"type": <complex>} wrapper → unwrap
                return self._parse(t, path, enclosing_ns, enclosing_records, setter)
            if not isinstance(t, str):
                # reference tostrings the type then falls through to the
                # unknown-type error (frontend.lua:298, 531-533)
                raise self._err(f"Unknown Avro type: {lua_str(t)}", path)
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
                # the in-progress unnamed node renders as '<array>' in error
                # paths (frontend.lua:586-589 copy_schema_location_info)
                apath = path + ("<array>",)
                if "items" not in raw:
                    raise self._err('Array type must have "items"', apath)
                arr = Array(Primitive("null"))
                arr.items = self._parse(
                    raw["items"], apath, enclosing_ns, (),
                    setter=lambda n, a=arr: setattr(a, "items", n),
                )
                node = arr
            elif base_t == "map":
                mpath = path + ("<map>",)
                if "values" not in raw:
                    raise self._err('Map type must have "values"', mpath)
                mp = Map(Primitive("null"))
                mp.values = self._parse(
                    raw["values"], mpath, enclosing_ns, (),
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
        # non-string, non-table schema position (number, boolean, null):
        # frontend.lua:531-533 'Unknown Avro type: %s' via tostring
        raise self._err(f"Unknown Avro type: {lua_str(raw)}", path)

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
        # reference resolves the reference against the enclosing namespace
        # BEFORE the scope lookup, and renders the qualified name in the
        # unknown-type error (frontend.lua:545-546 fullname + :155)
        fullname = base if "." in base else (f"{enclosing_ns}.{base}" if enclosing_ns else base)
        if not _is_valid_fullname(base):
            # an invalid name can never be in scope; reference reports it as
            # an unknown type (names are only *validated* at definition
            # sites, frontend.lua checkname)
            raise self._err(f"Unknown Avro type: {fullname}", path)
        found = self.scope.types.get(fullname) or self.scope.types.get(base)
        if found is not None:
            rec_ids = [rid for rid, _fn in enclosing_records]
            if id(found) in rec_ids:
                # direct containment cycle (frontend.lua:369-389): rendered
                # with the current-field chain of ALL open records, no path
                # prefix ('Record FooBar contains itself via B/X/Y')
                chain = "/".join(fn for _rid, fn in enclosing_records)
                raise SchemaError(
                    f"Record {found.fullname} contains itself via {chain}"
                )
            return _nullable_twin(found) if nullable else found
        if not self.forward_reference:
            raise self._err(f"Unknown Avro type: {fullname}", path)
        # forward reference: placeholder patched when the definition appears
        placeholder = Record(base + "!fwd", [])
        if setter is None:
            raise self._err(f"Unknown Avro type: {fullname}", path)
        self.scope.forward.setdefault(fullname, []).append(
            ((lambda n: setter(_nullable_twin(n) if nullable else n)), path)
        )
        return placeholder

    def _register_named(self, node: NamedNode, npath: tuple[str, ...],
                        raw: dict) -> None:
        """Register the type name, then parse + register aliases — the
        reference's ordering (checkname → scope_add_type → checkaliases,
        frontend.lua:163-221), so alias errors carry the name in the path."""
        fn = node.fullname
        if fn in self.scope.types:
            raise self._err(f"Type name already defined: {fn}", npath)
        self.scope.types[fn] = node
        node.aliases = self._parse_aliases(raw, npath)
        for alias in node.aliases:
            fa = alias if "." in alias else (f"{node.namespace}.{alias}" if node.namespace else alias)
            if fa in self.scope.types:
                # includes an alias equal to the type's own name
                # (frontend.lua:194-221; invalid.lua "Alias type name
                # already defined")
                raise self._err(
                    f"Alias type name already defined: {alias}", npath
                )
            self.scope.types[fa] = node
        waiting = self.scope.forward.pop(fn, []) + (
            self.scope.forward.pop(node.name, []) if "." in fn else []
        )
        # forward refs may also resolve via an ALIAS, exactly like a
        # backward lookup through scope.types does
        for alias in node.aliases:
            fa = alias if "." in alias else (
                f"{node.namespace}.{alias}" if node.namespace else alias
            )
            waiting += self.scope.forward.pop(fa, [])
            waiting += self.scope.forward.pop(alias, [])
        for patch, _p in waiting:
            patch(node)

    def _parse_name_ns(
        self, raw: dict, path: tuple[str, ...], enclosing_ns: Optional[str],
        kind: str,
    ) -> tuple[str, Optional[str]]:
        """Name/namespace extraction (frontend.lua checkname). Errors before
        the name is known render the in-progress node as ``<kind>``
        (copy_schema_location_info: unnamed node → '<%s>' % type)."""
        kpath = path + (f"<{kind}>",)
        name = raw.get("name")
        if name is None:
            raise self._err('Must have a "name"', kpath)
        name = lua_str(name)
        ns = raw.get("namespace", None)
        if "." in name:
            ns, name = name.rsplit(".", 1)
        elif ns is None:
            ns = enclosing_ns
        if not _is_valid_name(name) or (ns is not None and not _is_valid_fullname(ns)):
            raise self._err(f"Bad type name: {name}", kpath)
        if name in PRIMITIVE_TYPES:
            raise self._err(f"Redefining primitive type name: {name}", kpath)
        return name, ns

    def _parse_aliases(
        self, raw: dict, path: tuple[str, ...]
    ) -> tuple[str, ...]:
        """Type aliases, validated AFTER the name is known (reference calls
        checkaliases once the node is named, so the path shows the name)."""
        aliases = raw.get("aliases")
        if aliases is None:
            return ()
        if not isinstance(aliases, list):
            raise self._err('Property "aliases" must be a list', path)
        out = []
        for a in aliases:
            a = lua_str(a)
            if not _is_valid_fullname(a):
                raise self._err(f"Bad type name: {a}", path)
            out.append(a)
        return tuple(out)

    def _parse_record(
        self,
        raw: dict,
        path: tuple[str, ...],
        enclosing_ns: Optional[str],
        enclosing_records: tuple,
    ) -> Record:
        name, ns = self._parse_name_ns(raw, path, enclosing_ns, "record")
        rec = Record(name, [], namespace=ns, aliases=())
        npath = path + (rec.fullname,)
        self._register_named(rec, npath, raw)
        fields_raw = raw.get("fields")
        if fields_raw is None:
            raise self._err('Record type must have "fields"', npath)
        if not isinstance(fields_raw, list):
            raise self._err('Record "fields" must be a list', npath)
        if not fields_raw:
            raise self._err("Record type must have at least one field", npath)
        seen: set[str] = set()
        for fieldno, fr in enumerate(fields_raw, start=1):
            # until the field's name is known, the path shows '<field-N>'
            # (copy_schema_location_info, frontend.lua:577-583)
            fmarker = npath + (f"<field-{fieldno}>",)
            if not isinstance(fr, dict):
                # reference wording (frontend.lua:344): field "must be a list"
                raise self._err("Record field must be a list", fmarker)
            fname = fr.get("name")
            if fname is None:
                raise self._err('Record field must have a "name"', fmarker)
            fname = lua_str(fname)
            if not _is_valid_name(fname):
                raise self._err(f"Bad record field name: {fname}", fmarker)
            if fname in seen:
                # field names and earlier field aliases share one namespace
                # (frontend.lua:412-436; invalid.lua "Record contains field
                # B twice" for a field named like a prior alias)
                raise self._err(f"Record contains field {fname} twice", fmarker)
            seen.add(fname)
            fpath = npath + (fname,)
            if "type" not in fr:
                raise self._err('Record field must have a "type"', fpath)
            fals = fr.get("aliases")
            faliases: tuple[str, ...] = ()
            if fals is not None:
                if not isinstance(fals, list):
                    raise self._err('Property "aliases" must be a list', fpath)
                acc = []
                for a in fals:
                    a = lua_str(a)
                    if not _is_valid_name(a):
                        raise self._err(f"Bad field alias name: {a}", fpath)
                    if a in seen:
                        raise self._err(
                            f"Alias field name already defined: {a}", fpath
                        )
                    seen.add(a)
                    acc.append(a)
                faliases = tuple(acc)
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
            # the containment chain carries (record id, current field name)
            # so a direct-recursion error can render the reference's
            # 'contains itself via B/X/Y' field chain (frontend.lua:369-389)
            inner = enclosing_records + ((id(rec), fname),)
            field.type = self._parse(
                fr["type"], fpath, ns, inner,
                setter=lambda n, f=field: setattr(f, "type", n),
            )
            if field.has_default:
                self._pending_defaults.append((field, fpath))
            rec.fields.append(field)
        return rec

    def _parse_enum(self, raw: dict, path: tuple[str, ...], enclosing_ns) -> Enum:
        name, ns = self._parse_name_ns(raw, path, enclosing_ns, "enum")
        enum = Enum(name, [], namespace=ns, aliases=())
        npath = path + (enum.fullname,)
        self._register_named(enum, npath, raw)
        symbols = raw.get("symbols")
        if symbols is None:
            raise self._err('Enum type must have "symbols"', npath)
        if not isinstance(symbols, list):
            raise self._err('Enum "symbols" must be a list', npath)
        if not symbols:
            raise self._err("Enum type must contain at least one symbol", npath)
        seen: set[str] = set()
        out = []
        for s in symbols:
            s = lua_str(s)
            if not self.utf8_enums and not _is_valid_name(s):
                raise self._err(f"Bad enum symbol name: {s}", npath)
            if s in seen:
                raise self._err(f"Enum contains symbol {s} twice", npath)
            seen.add(s)
            out.append(s)
        enum.symbols = out
        return enum

    def _parse_fixed(self, raw: dict, path: tuple[str, ...], enclosing_ns) -> Fixed:
        name, ns = self._parse_name_ns(raw, path, enclosing_ns, "fixed")
        fx = Fixed(name, 0, namespace=ns, aliases=())
        npath = path + (fx.fullname,)
        self._register_named(fx, npath, raw)
        size = raw.get("size")
        if size is None:
            raise self._err('Fixed type must have "size"', npath)
        if isinstance(size, float) and size.is_integer() and size >= 1:
            size = int(size)  # reference accepts integral Lua numbers
        if not isinstance(size, int) or isinstance(size, bool) or size < 1:
            raise self._err(f"Bad fixed type size: {lua_str(size)}", npath)
        fx.size = size
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
        upath = path + ("<union>",)
        for i, braw in enumerate(raw):
            # branch-level errors render '<union>/<branch-N>'; errors inside
            # a NAMED branch node suppress the branch marker (reference
            # copy_schema_location_info, frontend.lua:556-570)
            bpath = upath + (f"<branch-{i + 1}>",)
            if isinstance(braw, list):
                # no immediate union nesting (frontend.lua:273-283)
                raise self._err("Union may not immediately contain other unions", bpath)
            # union indirection breaks the direct-containment chain
            # (recursion via union/array is legal, frontend.lua:369-389)
            try:
                branch = self._parse(
                    braw, upath, enclosing_ns, (),
                    setter=lambda n, u=union, j=i: u.branches.__setitem__(j, n),
                )
            except SchemaError as e:
                rest = e.path[len(upath):] if e.path[:len(upath)] == upath else None
                if rest is not None and (not rest or rest[0].startswith("<")):
                    # nothing named was entered → insert the branch marker
                    raise SchemaError(e.msg, bpath + tuple(rest)) from None
                raise
            # nullable branches are legal (e.g. ["int", "X*"],
            # record.lua nullable_xflatten; only immediate unions and
            # duplicate tags are rejected, frontend.lua:273-283)
            union.branches.append(branch)
            tag = union.branch_tag(i)
            if tag.endswith("!fwd"):
                # a forward-reference placeholder carries an internal
                # suffix; dedupe against the REAL name or the later
                # definition of the same type slips in twice
                tag = tag[: -len("!fwd")]
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
