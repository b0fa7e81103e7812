"""Flat tuple layout: which cells a schema flattens to.

Re-implements the reference's flat-width calculus and flat-name enumeration
(avro_schema/compiler.lua:99-155 ``schema_width``; frontend.lua:1381-1432
``get_names_helper`` / ``get_types_helper``; init.lua:483-510 service-field
prefixing):

* record fields enumerate in schema order; non-nullable nested records inline
* a union contributes two cells: ``<path>.$type$`` (branch no) and ``<path>``
* everything else (primitives, enum, fixed, array, map, nullable record)
  contributes one cell named by its dotted path
* service fields prepend cells named ``$service_field$`` typed by the given
  type string

Cell indices are 0-based here; the xflatten update-op format uses 1-based
indices (reference: test/ddt_suite/record.lua:355-362) — the +1 happens at op
emission.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..errors import CompileError
from ..schema.nodes import (
    Array,
    Enum,
    Fixed,
    Map,
    Primitive,
    Record,
    SchemaNode,
    UnionNode,
)

SERVICE_FIELD_NAME = "$service_field$"

#: cell kinds
SCALAR = "scalar"          # one column holds the (possibly complex) value
UNION_TAG = "union_tag"    # int branch number column
UNION_VALUE = "union_value"
SERVICE = "service"


@dataclass(frozen=True)
class FlatCell:
    index: int                      # 0-based flat position
    name: str                       # dotted display name (get_names)
    type_label: str                 # get_types label
    kind: str                       # SCALAR / UNION_TAG / UNION_VALUE / SERVICE
    path: tuple[str, ...]           # record-field path from the root
    node: Optional[SchemaNode] = field(default=None, compare=False)


def _type_label(node: SchemaNode) -> str:
    """get_types label for a single-cell type (frontend.lua get_types_helper):
    primitives keep their name; complex types use their kind; ``*`` marks
    nullability."""
    if isinstance(node, Primitive):
        return node.type_name()
    label = node.type  # 'record', 'enum', 'fixed', 'array', 'map'
    return label + ("*" if node.nullable else "")


def build_layout(
    root: Record, service_fields: tuple[str, ...] = ()
) -> list[FlatCell]:
    """Enumerate the flat cells of a top-level non-nullable record."""
    if not isinstance(root, Record) or root.nullable:
        raise CompileError("expected non-nullable record at the top level")
    cells: list[FlatCell] = []
    for sf in service_fields:
        cells.append(
            FlatCell(len(cells), SERVICE_FIELD_NAME, sf, SERVICE, (f"${len(cells)}",))
        )
    _walk_record(root, (), cells)
    return cells


def _walk_record(rec: Record, prefix: tuple[str, ...], cells: list[FlatCell]) -> None:
    for f in rec.fields:
        path = prefix + (f.name,)
        dotted = ".".join(path)
        node = f.type
        if isinstance(node, Record) and not node.nullable:
            _walk_record(node, path, cells)
        elif isinstance(node, UnionNode):
            cells.append(
                FlatCell(len(cells), dotted + ".$type$", "union_type", UNION_TAG, path, node)
            )
            cells.append(
                FlatCell(len(cells), dotted, "union_value", UNION_VALUE, path, node)
            )
        else:
            cells.append(FlatCell(len(cells), dotted, _type_label(node), SCALAR, path, node))


def flat_width(node: SchemaNode) -> int:
    """Cells occupied when flattened (compiler.lua:99-155)."""
    return node.width()


def get_names(root: Record, service_fields: tuple[str, ...] = ()) -> list[str]:
    return [c.name for c in build_layout(root, service_fields)]


def get_types(root: Record, service_fields: tuple[str, ...] = ()) -> list[str]:
    return [c.type_label for c in build_layout(root, service_fields)]
