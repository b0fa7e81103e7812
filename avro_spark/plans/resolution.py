"""Writer→reader schema resolution planning (schema evolution).

Re-implements the reference's ``build_ir`` resolution (avro_schema/
frontend.lua:1042-1235) as a pure-Python plan tree — the §2B micro-operator
inventory in SURVEY.md. The plan is later lowered to Spark Column expressions
by :mod:`avro_spark.plans.flatten`; Catalyst plays the role of the reference's
IL optimizer + LuaJIT backend.

Matching rules:

* primitives: identity, or a widening promotion ``int→long/float/double``,
  ``long→float/double``, ``float→double``, ``string↔bytes``
  (frontend.lua:54-60, 1090-1092)
* fixed: same name (or alias) + same size (frontend.lua:1134-1142)
* array/map: element-wise recursion (frontend.lua:1116-1133)
* enum: symbol remap by name; writer symbols absent from the reader raise a
  runtime "schema versioning" error on occurrence (frontend.lua:1199-1229)
* record: field mapping by name including aliases; a reader field with no
  writer source needs a default (or is nullable → null); writer-only fields
  are dropped (frontend.lua:1143-1198, 989-996)
* union: branch matching by tag / promotion; non-union→union picks the first
  compatible reader branch; union→non-union resolves each writer branch,
  unmatched branches raise at runtime (frontend.lua:1046-1083)
* ``downgrade`` mode reverses alias matching: aliases of the *writer* (the
  newer schema) match reader names (imatch, frontend.lua:718-735, 1150-1153)
* nullability: writer nullable → reader must tolerate null (nullable reader
  or null-accepting union)

Plans are cached per (writer, reader, downgrade) — the analogue of the
reference's IR cache (init.lua:41-63).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..errors import CompatibilityError
from ..schema import Schema
from ..schema.nodes import (
    PROMOTIONS,
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


@dataclass
class Resolved:
    """A node of the resolution plan: how to read writer-shaped data as
    reader-shaped data."""

    kind: str                      # copy|promote|enum|fixed|record|array|map|union|from_union|to_union|default
    writer: Optional[SchemaNode]
    reader: SchemaNode
    # kind-specific payloads:
    children: dict = field(default_factory=dict)

    @property
    def nullable(self) -> bool:
        w_null = self.writer.nullable if self.writer is not None else False
        return w_null or self.reader.nullable


@dataclass
class FieldSource:
    """Where a reader record field comes from."""

    reader_field: Field
    writer_field: Optional[Field]      # None → synthesized from default/null
    writer_index: Optional[int]
    plan: Optional[Resolved]           # None when synthesized


def _err(msg: str, path: tuple) -> CompatibilityError:
    loc = "/".join(str(p) for p in path)
    return CompatibilityError(f"{loc}: {msg}" if loc else msg)


def _qname(n: SchemaNode) -> str:
    """Qualified representative name for incompatibility messages
    (frontend.lua:94-100 qname): type name, named types by name, with the
    ``*`` nullability suffix."""
    if isinstance(n, NamedNode):
        base = n.fullname
    elif isinstance(n, UnionNode):
        base = "union"
    else:
        base = n.type
    return base + ("*" if n.nullable else "")


def _pair_frame(writer: SchemaNode, reader: SchemaNode) -> str:
    """Error-path component for a writer/reader node pair — the reference's
    build_ir_error stack rendering (frontend.lua:1239-1269): ``<union>``,
    ``<array>``/``<map>`` for unnamed complex nodes, the name (or
    ``(from aka to)`` when they differ) for named types."""
    if isinstance(writer, UnionNode) or isinstance(reader, UnionNode):
        return "<union>"
    if isinstance(writer, NamedNode) and isinstance(reader, NamedNode):
        if writer.fullname != reader.fullname:
            return f"({writer.fullname} aka {reader.fullname})"
        return writer.fullname
    return f"<{writer.type}>"


def _names_match(writer: NamedNode, reader: NamedNode, downgrade: bool) -> bool:
    """Named types match on equal (unqualified) name, or via aliases — reader
    aliases in normal mode, writer aliases in downgrade mode
    (frontend.lua:718-735)."""
    if writer.name == reader.name or writer.fullname == reader.fullname:
        return True
    aliased, target = (writer, reader) if downgrade else (reader, writer)
    return target.name in aliased.aliases or target.fullname in aliased.aliases


def _is_null(n: SchemaNode) -> bool:
    return isinstance(n, Primitive) and n.type == "null"


def _is_complex(n: SchemaNode) -> bool:
    """Complex (table-typed in the reference) nodes: a failed resolution of a
    complex branch pair carries its own rendered error, which the union
    propagates instead of the generic 'No common types'
    (frontend.lua:1068-1080)."""
    return not isinstance(n, Primitive)


def resolve(
    writer: SchemaNode,
    reader: SchemaNode,
    downgrade: bool = False,
    path: tuple = (),
    _memo: Optional[dict] = None,
) -> Resolved:
    """Build the resolution plan, or raise :class:`CompatibilityError`.

    Recursive schemas (cyclic AST graphs, frontend.lua:369-389) are handled
    by memoizing record plans per (writer, reader) node pair — the plan
    itself becomes cyclic and the expression lowering unrolls it to a
    bounded depth (see plans.flatten.MAX_UNROLL)."""
    if _memo is None:
        _memo = {}
    memo_key = (id(writer), id(reader))
    if memo_key in _memo:
        return _memo[memo_key]
    # nullability wrapper: writer-null must be representable in the reader
    # (reference: complex_types_may_match rejects nullable→non-nullable,
    # frontend.lua:718-721, rendered as a type incompatibility)
    if writer.nullable and not (
        reader.nullable
        or (isinstance(reader, UnionNode) and any(_is_null(b) for b in reader.branches))
    ):
        raise _err(
            f"Types incompatible: {_qname(writer)} and {_qname(reader)}", path,
        )

    if isinstance(writer, UnionNode) or isinstance(reader, UnionNode):
        return _resolve_union(writer, reader, downgrade, path, _memo)

    if isinstance(writer, Primitive) and isinstance(reader, Primitive):
        if writer.type == reader.type:
            return Resolved("copy", writer, reader)
        if reader.type in PROMOTIONS.get(writer.type, ()):
            return Resolved("promote", writer, reader)
        # 'Types incompatible' errors exclude the mismatching pair itself
        # from the path (build_ir_error offset=1, frontend.lua:1094-1102)
        raise _err(f"Types incompatible: {_qname(writer)} and {_qname(reader)}", path)

    if isinstance(writer, Enum) and isinstance(reader, Enum):
        if not _names_match(writer, reader, downgrade):
            raise _err(f"Types incompatible: {_qname(writer)} and {_qname(reader)}", path)
        reader_idx = reader.symbol_index()
        i2o = [reader_idx.get(sym) for sym in writer.symbols]  # None → versioning error
        if all(x is None for x in i2o):
            # compile-time error, not a per-row versioning error
            # (incompatible_enum.lua: "No common symbols")
            raise _err("No common symbols", path + (_pair_frame(writer, reader),))
        return Resolved("enum", writer, reader, {"i2o": i2o})

    if isinstance(writer, Fixed) and isinstance(reader, Fixed):
        if not _names_match(writer, reader, downgrade):
            raise _err(f"Types incompatible: {_qname(writer)} and {_qname(reader)}", path)
        if writer.size != reader.size:
            raise _err(
                f"Size mismatch: {writer.size} vs {reader.size}",
                path + (_pair_frame(writer, reader),),
            )
        return Resolved("fixed", writer, reader)

    if isinstance(writer, Array) and isinstance(reader, Array):
        return Resolved(
            "array", writer, reader,
            {"items": resolve(writer.items, reader.items, downgrade, path + ("<array>",), _memo)},
        )

    if isinstance(writer, Map) and isinstance(reader, Map):
        return Resolved(
            "map", writer, reader,
            {"values": resolve(writer.values, reader.values, downgrade, path + ("<map>",), _memo)},
        )

    if isinstance(writer, Record) and isinstance(reader, Record):
        return _resolve_record(writer, reader, downgrade, path, _memo)

    raise _err(f"Types incompatible: {_qname(writer)} and {_qname(reader)}", path)


def _field_matches(wf: Field, rf: Field, downgrade: bool) -> bool:
    """Record fields match by name; reader-field aliases match writer names
    (writer aliases in downgrade mode) — frontend.lua:412-436, 1150-1153."""
    if wf.name == rf.name:
        return True
    aliased, target = (wf, rf) if downgrade else (rf, wf)
    return target.name in aliased.aliases


def _resolve_record(writer: Record, reader: Record, downgrade: bool, path: tuple,
                    _memo: dict) -> Resolved:
    if not _names_match(writer, reader, downgrade):
        raise _err(f"Types incompatible: {_qname(writer)} and {_qname(reader)}", path)
    # register before recursing so cyclic references resolve to this plan
    out = Resolved("record", writer, reader, {"sources": []})
    _memo[(id(writer), id(reader))] = out
    before = set(_memo)
    sources: list[FieldSource] = out.children["sources"]
    try:
        _fill_record_sources(writer, reader, downgrade, path, _memo, sources)
    except Exception:
        # roll back EVERY entry this attempt added, not just our own:
        # nested entries memoized mid-attempt reference the aborted,
        # incomplete plan, and a later resolution against a different
        # reader branch would silently reuse them
        for k in (set(_memo) - before) | {(id(writer), id(reader))}:
            _memo.pop(k, None)
        raise
    return out


def _fill_record_sources(writer: Record, reader: Record, downgrade: bool,
                         path: tuple, _memo: dict,
                         sources: list) -> None:
    rec_frame = _pair_frame(writer, reader)
    for rf in reader.fields:
        wi = next(
            (i for i, wf in enumerate(writer.fields) if _field_matches(wf, rf, downgrade)),
            None,
        )
        if wi is not None:
            wf = writer.fields[wi]
            # record frames append the current field name — or
            # '(from aka to)' when an alias matched (frontend.lua:1255-1263)
            field_frame = rf.name if wf.name == rf.name else f"({wf.name} aka {rf.name})"
            plan = resolve(wf.type, rf.type, downgrade,
                           path + (rec_frame, field_frame), _memo)
            sources.append(FieldSource(rf, wf, wi, plan))
        elif rf.has_default:
            sources.append(FieldSource(rf, None, None, None))
        elif rf.type.nullable or (
            isinstance(rf.type, UnionNode) and any(_is_null(b) for b in rf.type.branches)
        ):
            sources.append(FieldSource(rf, None, None, None))  # → null
        else:
            raise _err(
                f"Field {rf.name} is missing in source schema, "
                "and no default value was provided",
                path + (rec_frame,),
            )


def _resolve_union(writer: SchemaNode, reader: SchemaNode, downgrade: bool,
                   path: tuple, _memo: Optional[dict] = None) -> Resolved:
    if _memo is None:
        _memo = {}
    upath = path + ("<union>",)
    if isinstance(writer, UnionNode) and isinstance(reader, UnionNode):
        # per writer branch: the first reader branch it resolves to
        branch_plans: list[Optional[tuple[int, Resolved]]] = []
        inner_err: Optional[CompatibilityError] = None
        for i, wb in enumerate(writer.branches):
            hit: Optional[tuple[int, Resolved]] = None
            # exact-tag match first, then promotion (frontend.lua:1046-1083)
            for exact in (True, False):
                for j, rb in enumerate(reader.branches):
                    try:
                        p = resolve(wb, rb, downgrade, upath, _memo)
                    except CompatibilityError as e:
                        if _is_complex(wb):
                            inner_err = e
                        continue
                    if exact and p.kind not in ("copy", "record", "enum", "fixed", "array", "map"):
                        continue
                    hit = (j, p)
                    break
                if hit:
                    break
            branch_plans.append(hit)  # None → runtime versioning error
        if all(p is None for p in branch_plans):
            # propagate a complex branch pair's own error if one was built,
            # else the union-level verdict (frontend.lua:1078-1080)
            raise inner_err or _err("No common types", upath)
        return Resolved("union", writer, reader, {"branches": branch_plans})

    if isinstance(writer, UnionNode):
        # union → non-union: each writer branch read as the reader type;
        # unmatched branches raise at runtime
        branch_plans = []
        inner_err = None
        for i, wb in enumerate(writer.branches):
            if _is_null(wb) and (reader.nullable or _is_null(reader)):
                # the writer's null branch IS representable in a nullable
                # reader — without this the branch maps to None and valid
                # null data raises a runtime versioning error
                branch_plans.append((0, Resolved("copy", wb, reader)))
                continue
            try:
                branch_plans.append((0, resolve(wb, reader, downgrade, upath, _memo)))
            except CompatibilityError as e:
                if _is_complex(wb):
                    inner_err = e
                branch_plans.append(None)
        if all(p is None for p in branch_plans):
            raise inner_err or _err("No common types", upath)
        return Resolved("from_union", writer, reader, {"branches": branch_plans})

    assert isinstance(reader, UnionNode)
    # non-union → union: first compatible reader branch gets a constant tag
    # (compiler.lua:628-633). A NULLABLE writer is admitted by the top
    # guard when the union carries a null branch (nulls route there at
    # runtime), but each non-null branch would re-reject writer
    # nullability — resolve the de-nulled writer against the branches.
    # The de-nulled copy is cached per writer node (and the in-progress
    # to_union plan memoized like _resolve_record's) so a RECURSIVE
    # writer revisiting this pair resolves to the in-progress plan
    # instead of recursing forever on a fresh-id copy.
    w_eff = writer
    if writer.nullable and any(_is_null(b) for b in reader.branches):
        import copy as _copy

        w_eff = _memo.get(("denull", id(writer)))
        if w_eff is None:
            w_eff = _copy.copy(writer)
            w_eff.nullable = False
            _memo[("denull", id(writer))] = w_eff
    out = Resolved("to_union", writer, reader, {"branch": None})
    _memo[(id(writer), id(reader))] = out
    before = set(_memo)
    inner_err = None
    for j, rb in enumerate(reader.branches):
        try:
            p = resolve(w_eff, rb, downgrade, upath, _memo)
        except CompatibilityError as e:
            if _is_complex(writer) and _is_complex(rb):
                inner_err = e
            continue
        out.children["branch"] = (j, p)
        return out
    # no branch matched: retract this pair's memo entries so a later,
    # differently-pathed visit re-resolves rather than seeing a husk
    for k in (set(_memo) - before) | {(id(writer), id(reader))}:
        _memo.pop(k, None)
    raise inner_err or _err("No common types", upath)


def unmapped_union_branches(plan: Resolved) -> dict[int, list[int]]:
    """{id(writer union node): [unmapped branch indices]} over a resolution
    plan — the branches whose data triggers the runtime "(schema
    versioning)" error (frontend.lua:1046-1083 leaves them nil; the
    generated code raises on contact, runtime.lua:319-336). Walks the
    (possibly cyclic) plan graph once."""
    out: dict[int, list[int]] = {}
    seen: set[int] = set()

    def walk(p: Optional[Resolved]) -> None:
        if p is None or id(p) in seen:
            return
        seen.add(id(p))
        if p.kind in ("union", "from_union"):
            missing = [
                i for i, bp in enumerate(p.children.get("branches", []))
                if bp is None
            ]
            if missing:
                out[id(p.writer)] = missing
            for bp in p.children.get("branches", []):
                if bp is not None:
                    walk(bp[1] if isinstance(bp, tuple) else bp)
        elif p.kind == "to_union":
            b = p.children.get("branch")
            if b is not None:
                walk(b[1])
        elif p.kind == "record":
            for s in p.children.get("sources", []):
                walk(s.plan)
        elif p.kind == "array":
            walk(p.children.get("items"))
        elif p.kind == "map":
            walk(p.children.get("values"))

    walk(plan)
    return out


# ------------------------------------------------------------------ caching
def resolve_cached(writer: Schema, reader: Schema, downgrade: bool = False) -> Resolved:
    """Plan cache per (writer, reader, downgrade) — the reference IR cache
    (init.lua:41-63). Stored on the writer handle and keyed by the reader
    handle itself (identity hash), so entries can never alias a dead
    schema's id."""
    cache = writer.__dict__.setdefault("_resolution_cache", {})
    key = (reader, downgrade)
    plan = cache.get(key)
    if plan is None:
        plan = resolve(writer.root, reader.root, downgrade)
        cache[key] = plan
    return plan


def check_compatible(writer: Schema, reader: Schema, downgrade: bool = False) -> bool:
    """A3 ``are_compatible``: True, or raises CompatibilityError."""
    resolve_cached(writer, reader, downgrade)
    return True
