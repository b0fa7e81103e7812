"""DataFrame conformance operator — the columnar ``validate`` (A2).

Re-expresses the reference's interpretive validator
(avro_schema/frontend.lua:740-972) as native column expressions over a whole
DataFrame: every column is cast/verified against the schema, defaults fill
null/missing values, and violations either raise (``mode='raise'``) or land
in an ``_errors`` array column (``mode='flag'``) with path-prefixed messages
mirroring the reference's ``path: message`` rendering (frontend.lua:941-962).

The semantic oracle is :func:`avro_spark.schema.pyvalidate.validate`; this
operator must agree with it row-wise. Everything here is a narrow projection
(no shuffle, whole-stage codegen) — per-row validation parallelizes
embarrassingly at 100 TB.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import CompileError
from ..schema import Schema
from ..schema.nodes import (
    INT32_MAX,
    INT32_MIN,
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
from ..schema.spark_types import to_spark_type, union_null_and_one
from ..plans.flatten import lit_for

ERRORS_COL = "_errors"


def conform(
    df: DataFrame,
    schema: Schema,
    mode: str = "raise",
) -> DataFrame:
    """Conform ``df`` to ``schema``.

    mode='raise': any violation fails the job (reference behavior — the
    validate call errors). mode='flag': adds an ``_errors`` array<string>
    column; rows with violations keep their original values and can be
    routed to a dead-letter sink.
    """
    if mode not in ("raise", "flag"):
        raise CompileError(f"bad mode: {mode}")
    root = schema.root
    if not isinstance(root, Record):
        raise CompileError("conform requires a record schema")
    cols: list[Column] = []
    errs: list[Column] = []
    present = set(df.columns)
    for f in root.fields:
        if f.name in present:
            src = F.col(f.name)
        elif f.has_default or _nullable_ok(f.type):
            src = None
        else:
            raise CompileError(f"column {f.name} is missing and has no default")
        value, err = _conform_value(f, src, (f.name,))
        cols.append(value.alias(f.name))
        if err is not None:
            errs.append(err)
    errors = F.array_compact(F.array(*errs)) if errs else F.array().cast("array<string>")
    if mode == "flag":
        return df.select(*cols, errors.alias(ERRORS_COL))
    # raise mode: plan the guard against the *input* columns, fused into the
    # same projection (coalesce(assert, value): the guard is NULL unless it
    # raises, so the value passes through)
    guard = F.assert_true(
        F.size(errors) == 0,
        F.concat(F.lit("validation failed: "), F.array_join(errors, "; ")),
    )
    name0 = root.fields[0].name
    guarded0 = F.coalesce(guard.cast(to_spark_type(root.fields[0].type)), cols[0]).alias(name0)
    return df.select(guarded0, *cols[1:])


def _nullable_ok(node: SchemaNode) -> bool:
    if node.nullable:
        return True
    if isinstance(node, Primitive) and node.type == "null":
        return True
    return isinstance(node, UnionNode) and any(
        isinstance(b, Primitive) and b.type == "null" for b in node.branches
    )


def _conform_value(
    f: Field, src: Optional[Column], path: tuple[str, ...]
) -> tuple[Column, Optional[Column]]:
    """(value, error-or-null) for one field."""
    node = f.type
    loc = "/".join(path)
    if src is None:
        if f.has_default:
            return lit_for(node, f.default), None
        return F.lit(None).cast(to_spark_type(node)), None
    value, err = _check_node(node, src, loc)
    if f.has_default:
        value = F.coalesce(value, lit_for(node, f.default))
    elif not _nullable_ok(node):
        # reference rendering: a nil value is indistinguishable from a
        # missing key in Lua, so both render 'Field a missing' at the
        # PARENT path (frontend.lua:879-881 + copy_data_eh)
        parent = "/".join(path[:-1])
        msg = (f"{parent}: " if parent else "") + f"Field {f.name} missing"
        missing = F.when(src.isNull(), F.lit(msg))
        err = F.coalesce(err, missing) if err is not None else missing
    return value, err


def _check_node(node: SchemaNode, src: Column, loc: str) -> tuple[Column, Optional[Column]]:
    target = to_spark_type(node)
    if isinstance(node, Primitive):
        return _check_primitive(node.type, src, loc)
    if isinstance(node, Enum):
        # reference err_value rendering: '{path}: Bad value: "X"'
        # (runtime.lua:319-336; string data is %q-quoted)
        bad = src.isNotNull() & ~src.isin(*node.symbols)
        return src, F.when(
            bad, F.concat(F.lit(f'{loc}: Bad value: "'), src, F.lit('"'))
        )
    if isinstance(node, Fixed):
        # reference err_length rendering (runtime.lua:298-305)
        v = src.cast(T.BinaryType())
        bad = v.isNotNull() & (F.length(v) != node.size)
        return v, F.when(
            bad,
            F.concat(
                F.lit(f"{loc}: Expecting BIN of length {node.size}. "
                      "Encountered BIN of length "),
                F.length(v).cast("string"), F.lit("."),
            ),
        )
    if isinstance(node, Record):
        sub_errs: list[Column] = []
        parts: list[Column] = []
        for f in node.fields:
            v, e = _conform_value(f, src.getField(f.name), (loc, f.name))
            parts.append(v.alias(f.name))
            if e is not None:
                sub_errs.append(e)
        value = F.when(src.isNull(), F.lit(None).cast(target)).otherwise(F.struct(*parts))
        err = F.coalesce(*sub_errs) if sub_errs else None
        if err is not None:
            err = F.when(src.isNotNull(), err)
        if not node.nullable:
            # nil where a record is required: 'Not a <name>: nil'
            # (copy_data pairs(nil) failure + copy_data_eh tag rendering)
            missing = F.when(src.isNull(), F.lit(f"{loc}: Not a {node.fullname}: nil"))
            err = F.coalesce(err, missing) if err is not None else missing
        return value, err
    if isinstance(node, Array):
        item_t = to_spark_type(node.items)
        elem_err = _element_error(node.items, loc + "[]")
        err = (
            F.when(src.isNotNull() & F.exists(src, elem_err), F.lit(f"{loc}: bad array element"))
            if elem_err is not None
            else None
        )
        return src.cast(T.ArrayType(item_t)), err
    if isinstance(node, Map):
        val_t = to_spark_type(node.values)
        elem_err = _element_error(node.values, loc + "{}")
        err = (
            F.when(
                src.isNotNull() & F.exists(F.map_values(src), elem_err),
                F.lit(f"{loc}: bad map value"),
            )
            if elem_err is not None
            else None
        )
        return src.cast(T.MapType(T.StringType(), val_t)), err
    if isinstance(node, UnionNode):
        simple = union_null_and_one(node)
        if simple is not None:
            return _check_node(simple, src, loc)
        # general union struct: tag must be in range; active branch consistent
        tag = src.getField("$type$")
        bad = src.isNotNull() & (tag.isNull() | (tag < 0) | (tag >= len(node.branches)))
        return src, F.when(
            bad,
            F.concat(F.lit(f"{loc}: Bad value: "),
                     F.coalesce(tag.cast("string"), F.lit("nil"))),
        )
    raise CompileError(f"conform: unsupported node {node!r}")


def _element_error(node: SchemaNode, loc: str):
    """Per-element validity predicate for arrays/maps (returns a lambda for
    F.exists), or None when elements can't be invalid."""
    if isinstance(node, Enum):
        return lambda x: x.isNotNull() & ~x.isin(*node.symbols)
    if isinstance(node, Fixed):
        return lambda x: x.isNotNull() & (F.length(x) != node.size)
    if isinstance(node, Primitive) and node.type == "int":
        return lambda x: x.isNotNull() & ((x < INT32_MIN) | (x > INT32_MAX))
    if not node.nullable and not isinstance(node, (Array, Map, Record, UnionNode)):
        return lambda x: x.isNull()
    return None


def _check_primitive(t: str, src: Column, loc: str) -> tuple[Column, Optional[Column]]:
    if t == "int":
        # exact int32 boundary semantics (frontend.lua:766-796)
        wide = src.cast("bigint")
        bad = wide.isNotNull() & ((wide < INT32_MIN) | (wide > INT32_MAX))
        return (
            F.when(bad, F.lit(None)).otherwise(src.cast("int")),
            # reference wording (runtime.lua:287-289)
            F.when(bad, F.concat(F.lit(f"{loc}: Value exceeds INT range: "), wide)),
        )
    if t == "long":
        return src.cast("bigint"), None
    if t == "float":
        return src.cast("float"), None
    if t == "double":
        return src.cast("double"), None
    if t == "boolean":
        return src.cast("boolean"), None
    if t == "string":
        return src.cast("string"), None
    if t == "bytes":
        return src.cast("binary"), None
    if t == "null":
        return F.lit(None), F.when(
            src.isNotNull(),
            F.concat(F.lit(f"{loc}: Not a null: "), src.cast("string")),
        )
    if t == "any":
        return src, None
    raise CompileError(f"unknown primitive {t}")
