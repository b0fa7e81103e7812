"""Interop with spark-avro's union representation.

Our engine encodes a general Avro union as a tagged struct
``{$type$: int, <branch_tag_i>: T_i, ...}`` (schema/spark_types.py), the
column form of the reference's two-cell ``[branch_no, value]`` flat encoding
(compiler.lua:141-147). The Apache spark-avro connector instead converts a
complex union to ``struct<member0: T0, member1: T1, ...>`` where the
members number the **non-null** branches in union order and at most one is
non-null per row (public SchemaConverters behavior). These converters
normalize between the two shapes so data read with spark-avro (when the jar
exists) drops straight into our flatten/unflatten/evolution plans, and our
output can be handed back to spark-avro sinks.

Both directions are narrow per-row expressions — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import CompileError
from ..schema.nodes import Array, Map, Primitive, Record, UnionNode
from ..schema.spark_types import (
    UNION_TAG,
    is_null_branch,
    to_spark_type,
    union_null_and_one,
)


def _non_null_branches(union: UnionNode) -> list[tuple[int, object]]:
    """(branch_index, node) for non-null branches, in union order."""
    return [(i, b) for i, b in enumerate(union.branches) if not is_null_branch(b)]


def _null_branch_index(union: UnionNode) -> int | None:
    for i, b in enumerate(union.branches):
        if is_null_branch(b):
            return i
    return None


_NUMERIC_COLLAPSES = ({"int", "long"}, {"float", "double"})


def _guard_convertible(union: UnionNode, _seen: tuple = ()) -> None:
    """Reject union shapes spark-avro does NOT read as a memberN struct:
    [int,long]→LongType, [float,double]→DoubleType, a single non-null
    branch unwrapping to the bare type, and general unions NESTED inside
    a branch (their inner memberN shape would defeat the final struct
    cast). A loud CompileError here beats an AnalysisException (or
    silent mis-read) deep in the plan."""
    if id(union) in _seen:
        return
    _seen = _seen + (id(union),)
    nn = _non_null_branches(union)
    if len(nn) == 1:
        raise CompileError(
            "spark-avro unwraps a single-non-null-branch union to the bare "
            "type — no memberN struct to convert"
        )
    prim_types = {
        b.type for _, b in nn if isinstance(b, Primitive)
    }
    if len(prim_types) == len(nn) and prim_types in _NUMERIC_COLLAPSES:
        raise CompileError(
            f"spark-avro collapses {sorted(prim_types)} unions to one "
            "numeric column — no memberN struct to convert"
        )

    def walk(node, seen):
        if id(node) in seen:
            return
        seen = seen + (id(node),)
        if isinstance(node, UnionNode):
            if union_null_and_one(node) is None:
                raise CompileError(
                    "general union nested inside a union branch is not "
                    "supported by the memberN interop shim — convert the "
                    "inner column separately"
                )
            walk(union_null_and_one(node), seen)
        elif isinstance(node, Record):
            for f in node.fields:
                walk(f.type, seen)
        elif isinstance(node, Array):
            walk(node.items, seen)
        elif isinstance(node, Map):
            walk(node.values, seen)

    for _, b in nn:
        walk(b, _seen)


def from_member_union(col: Column, union: UnionNode) -> Column:
    """spark-avro ``memberN`` struct → our ``$type$``-tagged union struct.

    The tag is the union branch index of the first non-null member (at
    most one is set by construction); a row with every member null maps
    to the union's null branch, or a null struct when the union has no
    null branch (such a row is invalid for that union and flags in
    validation, matching the reference's versioning error surface).
    """
    if union_null_and_one(union) is not None:
        raise CompileError("simple [null, T] unions are plain nullable columns")
    _guard_convertible(union)
    branches = _non_null_branches(union)
    members = [col.getField(f"member{j}") for j in range(len(branches))]
    tag: Column = F.lit(None).cast("int")
    for (branch_idx, _), member in reversed(list(zip(branches, members))):
        tag = F.when(member.isNotNull(), F.lit(branch_idx)).otherwise(tag)
    nb = _null_branch_index(union)
    if nb is not None:
        tag = F.coalesce(tag, F.lit(nb))
    parts = [tag.alias(UNION_TAG)]
    for (branch_idx, _), member in zip(branches, members):
        parts.append(member.alias(union.branch_tag(branch_idx)))
    out = F.struct(*parts)
    if nb is None:
        out = F.when(col.isNotNull(), out)
    else:
        out = F.when(col.isNull(), F.struct(*[
            F.lit(nb).alias(UNION_TAG),
            *[
                F.lit(None).cast(to_spark_type(b)).alias(union.branch_tag(i))
                for i, b in branches
            ],
        ])).otherwise(out)
    return out.cast(to_spark_type(union))


def to_member_union(col: Column, union: UnionNode) -> Column:
    """Our ``$type$``-tagged union struct → spark-avro ``memberN`` struct.

    The null branch becomes a null struct (spark-avro's nullable-union
    convention); every other branch sets exactly its member field.
    """
    if union_null_and_one(union) is not None:
        raise CompileError("simple [null, T] unions are plain nullable columns")
    _guard_convertible(union)
    branches = _non_null_branches(union)
    tag = col.getField(UNION_TAG)
    parts = []
    for j, (branch_idx, _) in enumerate(branches):
        parts.append(
            F.when(tag == branch_idx, col.getField(union.branch_tag(branch_idx)))
            .alias(f"member{j}")
        )
    out = F.struct(*parts)
    nb = _null_branch_index(union)
    null_cond = col.isNull() if nb is None else (col.isNull() | (tag == nb))
    return F.when(null_cond, F.lit(None)).otherwise(out)
