"""Schema-directed converters between the reference DDT corpus's JSON value
conventions (test/README.md:118-135) and our DataFrame shapes.

Conventions handled:
* ``{"$binary": "AABB"}`` — bytes/fixed values as hex
* union values — ``null`` or single-entry map ``{branch_tag: value}``
  (frontend.lua:899-919)
* ``!`` prefix on a JSON payload — float32 encoding marker (compare with
  float32 tolerance)
* enum — symbol string in record form, integer code in flat form
"""

from __future__ import annotations

import json
import math
from typing import Any, Optional

from avro_spark.schema.nodes import (
    Array,
    Enum,
    Fixed,
    Map,
    Primitive,
    Record,
    SchemaNode,
    UnionNode,
)
from avro_spark.schema.spark_types import UNION_TAG, union_null_and_one
from avro_spark.plans.layout import (
    SCALAR,
    SERVICE,
    UNION_VALUE,
    UNION_TAG as CELL_UNION_TAG,
    FlatCell,
)


def parse_payload(s: Any) -> tuple[Any, bool]:
    """DDT JSON string → (python value, float32_marker)."""
    if not isinstance(s, str):
        return s, False
    txt = s.strip()
    f32 = txt.startswith("!")
    if f32:
        txt = txt[1:].strip()
    return json.loads(txt), f32


def _is_binary_map(v: Any) -> bool:
    return isinstance(v, dict) and set(v.keys()) == {"$binary"}


def _to_bytes(v: Any) -> bytes:
    if _is_binary_map(v):
        hexs = v["$binary"].replace(" ", "")
        return bytes.fromhex(hexs)
    if isinstance(v, str):
        return v.encode("utf-8")
    raise ValueError(f"not a bytes value: {v!r}")


class Unconvertible(Exception):
    """Input value cannot be represented in the typed column (the typed
    boundary itself rejects it — equivalent to a reference type error)."""


def to_row_value(node: SchemaNode, v: Any, flat: bool = False) -> Any:
    """DDT JSON value → python value matching ``to_spark_type(node)``.

    ``flat``: the value uses the reference's flat-content rendering
    (VLO contents, compiler.lua:697-750): records are positional arrays,
    unions are ``[tag, value]`` pairs, enums are integer codes."""
    if isinstance(node, UnionNode):
        simple = union_null_and_one(node)
        if simple is not None:
            if flat and isinstance(v, list) and len(v) == 2:
                # flat rendering keeps the [tag, value] pair even for
                # [null, T] unions; our record-form collapses to nullable T
                v = v[1]
            elif v is not None:
                # record form is a single-entry {tag: value} map even for
                # [null, T] (frontend.lua:899-919)
                if not (isinstance(v, dict) and len(v) == 1):
                    raise Unconvertible(f"union value not a single-entry map: {v!r}")
                (tagname, val), = v.items()
                want = next(
                    node.branch_tag(i) for i, b in enumerate(node.branches)
                    if not (isinstance(b, Primitive) and b.type == "null")
                )
                if tagname != want:
                    raise Unconvertible(f"unknown union tag {tagname!r}")
                v = val
            return None if v is None else to_row_value(simple, v, flat)
        branch_names = [node.branch_tag(i) for i in range(len(node.branches))]
        non_null = [
            (i, b) for i, b in enumerate(node.branches)
            if not (isinstance(b, Primitive) and b.type == "null")
        ]
        if flat:
            if not (isinstance(v, list) and len(v) == 2):
                raise Unconvertible(f"flat union value not [tag, value]: {v!r}")
            tag, val = v
            if isinstance(tag, bool) or not isinstance(tag, int) or not (
                0 <= tag < len(node.branches)
            ):
                raise Unconvertible(f"bad union tag {tag!r}")
            branch = node.branches[tag]
            if isinstance(branch, Primitive) and branch.type == "null":
                if val is not None:
                    raise Unconvertible("non-null for null branch")
                return tuple([tag] + [None] * len(non_null))
            vals = [
                to_row_value(b, val, flat) if i == tag else None
                for i, b in non_null
            ]
            return tuple([tag] + vals)
        if v is None:
            nulls = [i for i, b in enumerate(node.branches)
                     if isinstance(b, Primitive) and b.type == "null"]
            if not nulls:
                raise Unconvertible("null for union without null branch")
            tag = nulls[0]
            return tuple([tag] + [None] * len(non_null))
        if not (isinstance(v, dict) and len(v) == 1):
            raise Unconvertible(f"union value not a single-entry map: {v!r}")
        (tagname, val), = v.items()
        matches = [i for i, _b in non_null if branch_names[i] == tagname]
        if not matches:
            raise Unconvertible(f"unknown union tag {tagname!r}")
        tag = matches[0]
        vals = [
            to_row_value(b, val, flat) if i == tag else None for i, b in non_null
        ]
        return tuple([tag] + vals)
    if node.nullable and v is None:
        return None
    if isinstance(node, Primitive):
        t = node.type
        if t == "null":
            if v is not None:
                raise Unconvertible("non-null for null type")
            return None
        if t == "boolean":
            if not isinstance(v, bool):
                raise Unconvertible("not a bool")
            return v
        if t in ("int", "long"):
            if isinstance(v, bool) or not isinstance(v, int):
                raise Unconvertible("not an int")
            return v
        if t in ("float", "double"):
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise Unconvertible("not numeric")
            return float(v)
        if t == "string":
            if not isinstance(v, str):
                raise Unconvertible("not a string")
            return v
        if t == "bytes":
            # data payloads come via the JSON↔MsgPack convention where STR
            # and BIN are distinct; only {"$binary": hex} is BIN
            # (test/README.md:118-135, bytes.lua "Expecting BIN,
            # encountered STR")
            if not _is_binary_map(v):
                raise Unconvertible(f"not a bytes value: {v!r}")
            try:
                return bytearray(_to_bytes(v))
            except ValueError as e:
                raise Unconvertible(str(e))
        if t == "any":
            return v
        raise Unconvertible(f"primitive {t}")
    if isinstance(node, Enum):
        if flat and isinstance(v, int) and not isinstance(v, bool):
            if not 0 <= v < len(node.symbols):
                raise Unconvertible(f"enum code {v} out of range")
            return node.symbols[v]
        if not isinstance(v, str):
            raise Unconvertible("enum value not a string")
        return v
    if isinstance(node, Fixed):
        if not _is_binary_map(v):
            raise Unconvertible(f"not a fixed/bytes value: {v!r}")
        try:
            return bytearray(_to_bytes(v))
        except ValueError as e:
            raise Unconvertible(str(e))
    if isinstance(node, Record):
        if flat and isinstance(v, list):
            parts = split_flat_record(node, v)
            return tuple(
                to_row_value(f.type, x, flat) for f, x in zip(node.fields, parts)
            )
        if not isinstance(v, dict):
            raise Unconvertible("record value not a map")
        unknown = set(v) - {f.name for f in node.fields}
        if unknown:
            raise Unconvertible(f"unknown record fields {unknown}")
        out = []
        for f in node.fields:
            if f.name in v:
                out.append(to_row_value(f.type, v[f.name]))
            elif f.has_default:
                out.append(to_row_value(f.type, f.default))
            elif _field_optional(f.type):
                out.append(to_row_value(f.type, None))
            else:
                raise Unconvertible(f"missing field {f.name}")
        return tuple(out)
    if isinstance(node, Array):
        if not isinstance(v, list):
            raise Unconvertible("array value not a list")
        return [to_row_value(node.items, x, flat) for x in v]
    if isinstance(node, Map):
        if not isinstance(v, dict):
            raise Unconvertible("map value not a map")
        return {k: to_row_value(node.values, x, flat) for k, x in v.items()}
    raise Unconvertible(f"node {node!r}")


def _field_optional(node: SchemaNode) -> bool:
    if node.nullable:
        return True
    if isinstance(node, Primitive) and node.type == "null":
        return True
    return isinstance(node, UnionNode) and any(
        isinstance(b, Primitive) and b.type == "null" for b in node.branches
    )


def split_flat_record(rec: Record, lst: list) -> list[Any]:
    """Positional flat rendering of a record (compiler.lua flatten: inlined
    non-nullable sub-records, 2-cell unions) → one entry per field: unions
    re-paired to ``[tag, value]``, inlined sub-records to their own
    sublist."""
    out: list[Any] = []
    i = 0
    for f in rec.fields:
        node = f.type
        if isinstance(node, Record) and not node.nullable:
            w = node.width()
            if i + w > len(lst):
                raise Unconvertible("flat record too short")
            out.append(lst[i:i + w])
            i += w
        elif isinstance(node, UnionNode):
            if i + 2 > len(lst):
                raise Unconvertible("flat record too short")
            out.append([lst[i], lst[i + 1]])
            i += 2
        else:
            if i >= len(lst):
                raise Unconvertible("flat record too short")
            out.append(lst[i])
            i += 1
    if i != len(lst):
        raise Unconvertible(f"flat record width {len(lst)} != {i}")
    return out


# --------------------------------------------------------------- comparison
def values_equal(node: Optional[SchemaNode], expected: Any, actual: Any,
                 f32: bool, flat: bool) -> bool:
    """Expected DDT JSON value vs collected Spark value, schema-directed.

    ``flat``: the value uses the reference's flat-content rendering —
    enums are codes, records are positional arrays, unions are
    ``[tag, value]`` pairs (top-level tag/value cells were already split
    by the caller)."""
    if isinstance(node, UnionNode):
        simple = union_null_and_one(node)
        if simple is not None:
            if flat and isinstance(expected, list) and len(expected) == 2:
                expected = expected[1]
            elif isinstance(expected, dict) and len(expected) == 1:
                (tagname, val), = expected.items()
                want = next(
                    node.branch_tag(i) for i, b in enumerate(node.branches)
                    if not (isinstance(b, Primitive) and b.type == "null")
                )
                if tagname == want:
                    expected = val
            return values_equal(simple, expected, actual, f32, flat)
        if flat and isinstance(expected, list) and len(expected) == 2:
            tag, val = expected
            if not isinstance(tag, int) or isinstance(tag, bool):
                return False
            if not 0 <= tag < len(node.branches):
                return False
            got_tag = actual[UNION_TAG] if actual is not None else None
            branch = node.branches[tag]
            if isinstance(branch, Primitive) and branch.type == "null":
                if val is not None:
                    return False
                return actual is None or got_tag in (tag, None)
            if actual is None or got_tag != tag:
                return False
            tagname = node.branch_tag(tag)
            return values_equal(branch, val, actual[tagname], f32, flat)
    if isinstance(node, UnionNode) and expected is None:
        # record-form null: our typed rendering is a struct whose tag selects
        # a null branch with every branch value null
        if actual is None:
            return True
        tag = actual[UNION_TAG] if not isinstance(actual, dict) else actual.get(UNION_TAG)
        if not isinstance(tag, int) or not 0 <= tag < len(node.branches):
            return False
        b = node.branches[tag]
        return isinstance(b, Primitive) and b.type == "null"
    if expected is None or actual is None:
        return expected is None and actual is None
    if isinstance(node, UnionNode):
        # nested (record-form) union value: single-entry map
        if not (isinstance(expected, dict) and len(expected) == 1):
            return False
        (tagname, val), = expected.items()
        names = [node.branch_tag(i) for i in range(len(node.branches))]
        try:
            tag = names.index(tagname)
        except ValueError:
            return False
        got_tag = actual[UNION_TAG] if not isinstance(actual, dict) else actual.get(UNION_TAG)
        if got_tag != tag:
            return False
        branch_val = actual[tagname] if not isinstance(actual, dict) else actual.get(tagname)
        return values_equal(node.branches[tag], val, branch_val, f32, flat)
    if isinstance(node, Enum):
        if isinstance(expected, int) and not isinstance(expected, bool):
            if not 0 <= expected < len(node.symbols):
                return False
            return actual == expected or actual == node.symbols[expected]
        return expected == actual
    if isinstance(node, (Fixed,)) or (
        isinstance(node, Primitive) and node.type == "bytes"
    ):
        try:
            return _to_bytes(expected) == bytes(actual)
        except ValueError:
            return False
    if isinstance(node, Record):
        if flat and isinstance(expected, list):
            try:
                parts = split_flat_record(node, expected)
            except Unconvertible:
                return False
            return all(
                values_equal(f.type, e, actual[f.name], f32, flat=True)
                for f, e in zip(node.fields, parts)
            )
        if not isinstance(expected, dict):
            return False
        for f in node.fields:
            if f.hidden:
                # hidden fields are omitted from unflatten output
                # (compiler.lua:783-789)
                continue
            if f.name in expected:
                exp_f = expected[f.name]
            elif f.has_default:
                exp_f = f.default
            else:
                exp_f = None
            act_f = actual[f.name]
            if not values_equal(f.type, exp_f, act_f, f32, flat=False):
                return False
        return True
    if isinstance(node, Array):
        if not isinstance(expected, list) or len(expected) != len(actual):
            return False
        return all(
            values_equal(node.items, e, a, f32, flat=flat)
            for e, a in zip(expected, list(actual))
        )
    if isinstance(node, Map):
        actual_d = dict(actual)
        if not isinstance(expected, dict) or set(expected) != set(actual_d):
            return False
        return all(
            values_equal(node.values, v, actual_d[k], f32, flat=flat)
            for k, v in expected.items()
        )
    # primitives
    if isinstance(expected, bool) or isinstance(actual, bool):
        return bool(expected) == bool(actual)
    if isinstance(expected, (int, float)) and isinstance(actual, (int, float)):
        if isinstance(node, Primitive) and node.type in ("float", "double"):
            e, a = float(expected), float(actual)
            if math.isnan(e) or math.isnan(a):
                return math.isnan(e) and math.isnan(a)
            tol = 1e-6 if (f32 or (node.type == "float")) else 1e-12
            return abs(e - a) <= tol * max(1.0, abs(e), abs(a))
        return int(expected) == int(actual) and isinstance(expected, int)
    return expected == actual


def flat_cell_expected_and_actual(
    cells: list[FlatCell], expected_tuple: list, row, f32: bool
) -> list[tuple[bool, str]]:
    """Compare one flattened row against the expected flat JSON array.
    Returns [(ok, description_per_cell)]."""
    out = []
    if len(expected_tuple) != len(cells):
        return [(False, f"width {len(expected_tuple)} != {len(cells)}")]
    for cell, exp in zip(cells, expected_tuple):
        act = row[cell.index]
        if cell.kind == SERVICE:
            ok = _service_equal(cell.type_label, exp, act)
        elif cell.kind == CELL_UNION_TAG:
            ok = isinstance(exp, int) and exp == act
        elif cell.kind == UNION_VALUE:
            union: UnionNode = cell.node  # type: ignore[assignment]
            tag_cell_val = row[cell.index - 1]
            simple = union_null_and_one(union)
            branch = union.branches[tag_cell_val] if (
                isinstance(tag_cell_val, int) and 0 <= tag_cell_val < len(union.branches)
            ) else None
            if branch is None:
                ok = False
            elif isinstance(branch, Primitive) and branch.type == "null":
                ok = exp is None and (
                    act is None or simple is not None
                    or all(x is None for x in act)
                )
            elif simple is not None:
                ok = values_equal(branch, exp, act, f32, flat=True)
            else:
                tagname = union.branch_tag(tag_cell_val)
                act_branch = act[tagname] if act is not None else None
                ok = values_equal(branch, exp, act_branch, f32, flat=True)
        else:
            ok = values_equal(cell.node, exp, act, f32, flat=True)
        out.append((ok, f"cell {cell.index} ({cell.name}): {exp!r} vs {act!r}"))
    return out


def partial_row_and_type(rec: Record, d: dict):
    """xflatten input: a partial record dict → (row tuple, StructType) with
    only the present fields, in input order; non-nullable sub-records
    recurse so nested presence is structural."""
    from pyspark.sql import types as T

    from avro_spark.schema.spark_types import to_spark_type

    idx = {f.name: f for f in rec.fields}
    vals: list[Any] = []
    fields: list[Any] = []
    for name, v in d.items():
        f = idx.get(name)
        if f is None:
            raise Unconvertible(f"unknown field {name}")
        ft = f.type
        if isinstance(ft, Record) and not ft.nullable and isinstance(v, dict):
            sv, stp = partial_row_and_type(ft, v)
            vals.append(sv)
            fields.append(T.StructField(name, stp, True))
            continue
        try:
            vals.append(to_row_value(ft, v))
            fields.append(T.StructField(name, to_spark_type(ft), True))
        except Unconvertible:
            # a nullable-record / union-record VALUE that is itself
            # incomplete: representable only as a partial struct type —
            # the engine's completeness check owns the error rendering
            if isinstance(ft, Record) and isinstance(v, dict):
                sv, stp = partial_row_and_type(ft, v)
                vals.append(sv)
                fields.append(T.StructField(name, stp, True))
            elif (
                isinstance(ft, UnionNode)
                and isinstance(v, dict) and len(v) == 1
            ):
                sv, stp = _partial_union_value(ft, v)
                vals.append(sv)
                fields.append(T.StructField(name, stp, True))
            else:
                raise
    return tuple(vals), T.StructType(fields)


def _partial_union_value(node: UnionNode, v: dict):
    """Tagged-struct union value whose record branch payload is a PARTIAL
    struct (missing required fields) — buildable only with a bespoke
    struct type; the engine's xflatten completeness check rejects it."""
    from pyspark.sql import types as T

    from avro_spark.schema.spark_types import UNION_TAG, to_spark_type

    (tagname, val), = v.items()
    tag_i = next(
        (i for i in range(len(node.branches)) if node.branch_tag(i) == tagname),
        None,
    )
    if tag_i is None:
        raise Unconvertible(f"unknown union tag {tagname!r}")
    vals: list[Any] = [tag_i]
    fields = [T.StructField(UNION_TAG, T.IntegerType(), True)]
    for i, b in enumerate(node.branches):
        if isinstance(b, Primitive) and b.type == "null":
            continue
        t = node.branch_tag(i)
        if t == tagname and isinstance(b, Record) and isinstance(val, dict):
            sv, stp = partial_row_and_type(b, val)
            vals.append(sv)
            fields.append(T.StructField(t, stp, True))
        else:
            vals.append(None)
            fields.append(T.StructField(t, to_spark_type(b), True))
    return tuple(vals), T.StructType(fields)


def compare_op_value(cell: FlatCell, exp: Any, act: Any, tag_exp: Any,
                     f32: bool) -> bool:
    """Compare one xflatten op value against its expected flat-cell value.
    ``tag_exp``: the expected value of the preceding tag cell (for
    union-value cells)."""
    if cell.kind == SERVICE:
        return _service_equal(cell.type_label, exp, act)
    if cell.kind == CELL_UNION_TAG:
        return isinstance(exp, int) and exp == act
    if cell.kind == UNION_VALUE:
        union: UnionNode = cell.node  # type: ignore[assignment]
        simple = union_null_and_one(union)
        if not (isinstance(tag_exp, int) and 0 <= tag_exp < len(union.branches)):
            return False
        branch = union.branches[tag_exp]
        if isinstance(branch, Primitive) and branch.type == "null":
            return exp is None and (
                act is None or simple is not None
                or all(x is None for x in act)
            )
        if simple is not None:
            return values_equal(branch, exp, act, f32, flat=True)
        return values_equal(branch, exp, act[union.branch_tag(tag_exp)], f32, flat=True)
    return values_equal(cell.node, exp, act, f32, flat=True)


def _service_equal(type_label: str, exp: Any, act: Any) -> bool:
    if type_label == "bytes":
        try:
            return _to_bytes(exp) == bytes(act)
        except ValueError:
            return False
    if type_label in ("float", "double"):
        return abs(float(exp) - float(act)) <= 1e-6 * max(1.0, abs(float(exp)))
    return exp == act


def flat_input_row(cells: list[FlatCell], tup: list) -> tuple:
    """Expected-format flat JSON array → python row for the flat DataFrame
    (writer layout)."""
    if len(tup) != len(cells):
        raise Unconvertible(f"width {len(tup)} != {len(cells)}")
    out = []
    for cell, v in zip(cells, tup):
        if cell.kind == SERVICE:
            out.append(_service_to_py(cell.type_label, v))
        elif cell.kind == CELL_UNION_TAG:
            if isinstance(v, bool) or not isinstance(v, int):
                raise Unconvertible("union tag not int")
            out.append(v)
        elif cell.kind == UNION_VALUE:
            union: UnionNode = cell.node  # type: ignore[assignment]
            # the tag cell immediately precedes the value cell in the layout
            tag = tup[cell.index - 1]
            simple = union_null_and_one(union)
            valid_tag = (
                isinstance(tag, int) and not isinstance(tag, bool)
                and 0 <= tag < len(union.branches)
            )
            if valid_tag:
                branch = union.branches[tag]
                if isinstance(branch, Primitive) and branch.type == "null":
                    if v is not None:
                        # value cell must be NIL when the tag selects the
                        # null branch (union.lua "Expecting NIL,
                        # encountered LONG")
                        raise Unconvertible("non-null value under null tag")
                elif v is None and not branch.nullable:
                    raise Unconvertible("null value under non-null tag")
            if simple is not None:
                out.append(None if v is None else to_row_value(simple, v, flat=True))
                continue
            non_null = [
                (i, b) for i, b in enumerate(union.branches)
                if not (isinstance(b, Primitive) and b.type == "null")
            ]
            vals = []
            for i, b in non_null:
                if valid_tag and i == tag and v is not None:
                    vals.append(to_row_value(b, v, flat=True))
                else:
                    vals.append(None)
            out.append(tuple(vals))
        elif isinstance(cell.node, Enum):
            # top-level enum cells carry the int code (flat form)
            if v is None and cell.node.nullable:
                out.append(None)
            else:
                if isinstance(v, bool) or not isinstance(v, int):
                    raise Unconvertible("enum cell not an int code")
                if not 0 <= v < len(cell.node.symbols):
                    raise Unconvertible(f"enum code {v} out of range")
                out.append(v)
        else:
            out.append(to_row_value(cell.node, v, flat=True))
    return tuple(out)


def _service_to_py(type_label: str, v: Any):
    if type_label == "bytes":
        try:
            return bytearray(_to_bytes(v))
        except ValueError as e:
            raise Unconvertible(str(e))
    if type_label in ("float", "double"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise Unconvertible("service float")
        return float(v)
    if type_label in ("int", "long"):
        if isinstance(v, bool) or not isinstance(v, int):
            raise Unconvertible("service int")
        return v
    if type_label == "boolean":
        if not isinstance(v, bool):
            raise Unconvertible("service bool")
        return v
    if type_label == "string":
        if not isinstance(v, str):
            raise Unconvertible("service string")
        return v
    raise Unconvertible(f"service type {type_label}")


def flat_struct_type(cells: list[FlatCell]):
    """Spark StructType for a flat (writer-layout) DataFrame."""
    from pyspark.sql import types as T

    from avro_spark.schema.spark_types import to_spark_type

    name_count: dict[str, int] = {}
    fields = []
    for cell in cells:
        base = cell.name
        n = name_count.get(base, 0)
        name_count[base] = n + 1
        name = base if n == 0 else f"{base}#{n}"
        if cell.kind == SERVICE:
            t = {
                "boolean": T.BooleanType(), "int": T.IntegerType(),
                "long": T.LongType(), "float": T.FloatType(),
                "double": T.DoubleType(), "string": T.StringType(),
                "bytes": T.BinaryType(),
            }[cell.type_label]
        elif cell.kind == CELL_UNION_TAG:
            t = T.IntegerType()
        elif cell.kind == UNION_VALUE:
            union: UnionNode = cell.node  # type: ignore[assignment]
            simple = union_null_and_one(union)
            if simple is not None:
                t = to_spark_type(simple)
            else:
                full = to_spark_type(union)
                t = T.StructType([f for f in full.fields if f.name != UNION_TAG])
        elif isinstance(cell.node, Enum):
            t = T.IntegerType()  # flat enum cell = int code
        else:
            t = to_spark_type(cell.node)
        fields.append(T.StructField(name, t, True))
    return T.StructType(fields)
