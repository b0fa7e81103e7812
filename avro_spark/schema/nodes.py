"""Schema AST node types.

Mirrors the reference's normalized schema AST (avro_schema/frontend.lua:254-548)
as plain Python objects. The AST is "encoded precisely as defined by the Avro
spec" (frontend.lua:12-17) with the reference's extensions:

* nullable types via a ``*`` suffix on any type name (frontend.lua:81-88)
* ``hidden=true`` record fields (frontend.lua:437)
* per-field ``default`` values, validated at create time

Named types (record/enum/fixed) may be referenced by name after first
definition, producing a potentially cyclic graph (frontend.lua:22-23); cycles
are only legal through a union or array indirection (frontend.lua:369-389).

Flat-width calculus (reference: compiler.lua:99-155 ``schema_width``):
primitives / enum / fixed / array / map occupy 1 tuple cell, unions occupy 2
(``[branch_no, value]``), non-nullable records inline to the sum of their
field widths, nullable records collapse to a single (variable) cell.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Union as TUnion

PRIMITIVE_TYPES = ("null", "boolean", "int", "long", "float", "double", "bytes", "string")

# Widening promotions allowed during schema evolution
# (reference: frontend.lua:54-60).
PROMOTIONS: dict[str, tuple[str, ...]] = {
    "int": ("long", "float", "double"),
    "long": ("float", "double"),
    "float": ("double",),
    "string": ("bytes",),
    "bytes": ("string",),
}

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


class _NoDefault:
    """Sentinel: field has no default value."""

    _instance: Optional["_NoDefault"] = None

    def __new__(cls) -> "_NoDefault":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "<no default>"

    def __bool__(self) -> bool:
        return False


NO_DEFAULT = _NoDefault()


class SchemaNode:
    """Base class for all schema AST nodes."""

    type: str = "?"
    nullable: bool = False
    # attributes kept from the raw declaration via the ``preserve_in_ast``
    # create-option (reference: init.lua:123-151, api_tests/export.lua).
    # Class-level default; the parser assigns a per-node dict when non-empty.
    extras: dict = {}

    def type_name(self) -> str:
        """The Avro type name, with the ``*`` nullability suffix."""
        return self.type + ("*" if self.nullable else "")

    # --- flat-width calculus (compiler.lua:99-155) -------------------------
    def width(self) -> int:
        """Number of flat tuple cells this type occupies."""
        return 1

    def is_vlo(self) -> bool:
        """Variable-length object: content size depends on the datum."""
        return False


class Primitive(SchemaNode):
    __slots__ = ("type", "nullable")

    def __init__(self, type: str, nullable: bool = False):
        assert type in PRIMITIVE_TYPES or type == "any", type
        self.type = type
        self.nullable = nullable

    def __repr__(self) -> str:
        return f"Primitive({self.type_name()})"


class NamedNode(SchemaNode):
    """record / enum / fixed: carries a namespace-qualified name + aliases.

    ``twin`` links the nullable and non-nullable variants of the same
    definition (reference: frontend.lua:116-162, 618-630).
    """

    name: str
    namespace: Optional[str]
    aliases: tuple[str, ...]
    twin: Optional["NamedNode"]

    @property
    def fullname(self) -> str:
        return f"{self.namespace}.{self.name}" if self.namespace else self.name

    def type_name(self) -> str:
        return self.fullname + ("*" if self.nullable else "")


class Field:
    __slots__ = ("name", "type", "default", "aliases", "hidden", "extras")

    def __init__(
        self,
        name: str,
        type: SchemaNode,
        default: Any = NO_DEFAULT,
        aliases: tuple[str, ...] = (),
        hidden: bool = False,
        extras: Optional[dict] = None,
    ):
        self.name = name
        self.type = type
        self.default = default
        self.aliases = aliases
        self.hidden = hidden
        self.extras = extras or {}

    @property
    def has_default(self) -> bool:
        return self.default is not NO_DEFAULT

    def __repr__(self) -> str:
        return f"Field({self.name}: {self.type!r})"


class Record(NamedNode):
    type = "record"
    __slots__ = ("name", "namespace", "aliases", "fields", "nullable", "twin", "_field_index")

    def __init__(
        self,
        name: str,
        fields: Optional[list[Field]] = None,
        namespace: Optional[str] = None,
        aliases: tuple[str, ...] = (),
        nullable: bool = False,
    ):
        self.name = name
        self.namespace = namespace
        self.aliases = aliases
        self.fields: list[Field] = fields if fields is not None else []
        self.nullable = nullable
        self.twin = None
        self._field_index: Optional[dict[str, int]] = None

    def field_index(self) -> dict[str, int]:
        """name/alias → 0-based field position (reference dcache,
        frontend.lua:230-235, 673-715). Aliases included."""
        if self._field_index is None:
            idx: dict[str, int] = {}
            for i, f in enumerate(self.fields):
                idx[f.name] = i
                for a in f.aliases:
                    idx.setdefault(a, i)
            self._field_index = idx
        return self._field_index

    def width(self) -> int:
        if self.nullable:
            return 1  # VLO cell (compiler.lua:130-140)
        return sum(f.type.width() for f in self.fields)

    def is_vlo(self) -> bool:
        return self.nullable

    def __repr__(self) -> str:
        return f"Record({self.type_name()}, {len(self.fields)} fields)"


class Enum(NamedNode):
    type = "enum"
    __slots__ = ("name", "namespace", "aliases", "symbols", "nullable", "twin", "_symbol_index")

    def __init__(
        self,
        name: str,
        symbols: list[str],
        namespace: Optional[str] = None,
        aliases: tuple[str, ...] = (),
        nullable: bool = False,
    ):
        self.name = name
        self.namespace = namespace
        self.aliases = aliases
        self.symbols = list(symbols)
        self.nullable = nullable
        self.twin = None
        self._symbol_index: Optional[dict[str, int]] = None

    def symbol_index(self) -> dict[str, int]:
        if self._symbol_index is None:
            self._symbol_index = {s: i for i, s in enumerate(self.symbols)}
        return self._symbol_index

    def __repr__(self) -> str:
        return f"Enum({self.type_name()}, {self.symbols})"


class Fixed(NamedNode):
    type = "fixed"
    __slots__ = ("name", "namespace", "aliases", "size", "nullable", "twin")

    def __init__(
        self,
        name: str,
        size: int,
        namespace: Optional[str] = None,
        aliases: tuple[str, ...] = (),
        nullable: bool = False,
    ):
        self.name = name
        self.namespace = namespace
        self.aliases = aliases
        self.size = size
        self.nullable = nullable
        self.twin = None

    def __repr__(self) -> str:
        return f"Fixed({self.type_name()}, {self.size})"


class Array(SchemaNode):
    type = "array"
    __slots__ = ("items", "nullable")

    def __init__(self, items: SchemaNode, nullable: bool = False):
        self.items = items
        self.nullable = nullable

    def is_vlo(self) -> bool:
        return True

    def __repr__(self) -> str:
        return f"Array({self.items!r})"


class Map(SchemaNode):
    type = "map"
    __slots__ = ("values", "nullable")

    def __init__(self, values: SchemaNode, nullable: bool = False):
        self.values = values
        self.nullable = nullable

    def is_vlo(self) -> bool:
        return True

    def __repr__(self) -> str:
        return f"Map({self.values!r})"


class UnionNode(SchemaNode):
    """Avro union. Flat form = 2 cells [branch_no, value]
    (reference: compiler.lua:141-147); branch_no is 0-based."""

    type = "union"
    __slots__ = ("branches", "nullable")

    def __init__(self, branches: list[SchemaNode], nullable: bool = False):
        self.branches = branches
        self.nullable = nullable

    def width(self) -> int:
        return 2

    def is_vlo(self) -> bool:
        return True

    def branch_tag(self, i: int) -> str:
        """The union tag string naming branch i (type name, or full name
        for named types) — the key in the {tag: value} wire form."""
        b = self.branches[i]
        if isinstance(b, NamedNode):
            return b.fullname
        return b.type

    def tag_index(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for i, b in enumerate(self.branches):
            out[self.branch_tag(i)] = i
            # unqualified name also accepted for named branches
            if isinstance(b, NamedNode):
                out.setdefault(b.name, i)
        return out

    def __repr__(self) -> str:
        return f"Union({[b.type_name() for b in self.branches]})"


AnyNode = TUnion[Primitive, Record, Enum, Fixed, Array, Map, UnionNode]


def walk(node: SchemaNode, _seen: Optional[set[int]] = None) -> Iterator[SchemaNode]:
    """Preorder walk over the (possibly cyclic) schema graph; each named node
    visited once."""
    if _seen is None:
        _seen = set()
    if id(node) in _seen:
        return
    _seen.add(id(node))
    yield node
    if isinstance(node, Record):
        for f in node.fields:
            yield from walk(f.type, _seen)
    elif isinstance(node, Array):
        yield from walk(node.items, _seen)
    elif isinstance(node, Map):
        yield from walk(node.values, _seen)
    elif isinstance(node, UnionNode):
        for b in node.branches:
            yield from walk(b, _seen)
