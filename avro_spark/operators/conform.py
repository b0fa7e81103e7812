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
    column so bad rows can be routed to a dead-letter sink. Output
    columns are the CONFORMED values: a violating value becomes null
    (or the field default), exactly like the reference's copy — recover
    the original offending value from the source row via the join key,
    not from this output.
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


_CONFORM_DEPTH_LIMIT = 24


def _depth_limit(node) -> int:
    """Validation walk depth for a subtree: the full limit for acyclic or
    chain recursion; for BRANCHING recursion (SCC multiplicity >= 2) the
    walk's node count grows as multiplicity^(depth/2), so it shrinks to
    keep the expression build bounded — aligned with the reduced unroll
    the data's own to_spark_type used (every cyclic node shares the SCC,
    so the same reduced limit applies at every level)."""
    from ..schema.spark_types import cycle_multiplicity

    mult = cycle_multiplicity(node)
    if mult >= 2:
        from ..plans.flatten import unroll_budget_for

        return 2 * unroll_budget_for(node)
    return _CONFORM_DEPTH_LIMIT


def _conform_value(
    f: Field, src: Optional[Column], path: tuple[str, ...], _depth: int = 0
) -> tuple[Column, Optional[Column]]:
    """(value, error-or-null) for one field."""
    node = f.type
    loc = "/".join(path)
    if src is None:
        if f.has_default:
            return lit_for(node, f.default), None
        return F.lit(None).cast(to_spark_type(node)), None
    value, err = _check_node(node, src, loc, _depth)
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


def _check_node(
    node: SchemaNode, src: Column, loc: str, _depth: int = 0
) -> tuple[Column, Optional[Column]]:
    if _depth > _depth_limit(node):
        # bounded validation: past the cut the value passes through
        # UNCHANGED (documented; deeper levels are unvalidated). No cast —
        # src's actual type (the data's own unroll) and the schema's
        # unrolled type have different depths for recursive schemas, and
        # a struct cast between them fails analysis (round-4 catch).
        # (checked BEFORE building the target type: for branching
        # recursion the walk visits exponentially many nodes, and eagerly
        # materializing a type per visit multiplied that cost)
        return src, None
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
            v, e = _conform_value(f, src.getField(f.name), (loc, f.name), _depth + 1)
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
            value, err = _check_node(simple, src, loc, _depth + 1)
            # a [null, T] union legally accepts null (oracle: pyvalidate
            # returns None) — suppress the branch's own not-null
            # complaint, which would flag every legal null of the most
            # common Avro pattern
            if err is not None:
                err = F.when(src.isNotNull(), err)
            return value, err
        # general union struct: the tag must be in range AND the active
        # branch's value must itself validate (the oracle's _copy_union
        # validates the branch deeply — a bad enum symbol or nil record
        # inside a union branch must not pass)
        tag = src.getField("$type$")
        bad = src.isNotNull() & (tag.isNull() | (tag < 0) | (tag >= len(node.branches)))
        tag_err = F.when(
            bad,
            F.concat(F.lit(f"{loc}: Bad value: "),
                     F.coalesce(tag.cast("string"), F.lit("nil"))),
        )
        branch_errs = []
        for i, br in enumerate(node.branches):
            if isinstance(br, Primitive) and br.type == "null":
                continue
            _bv, be = _check_node(
                br, src.getField(node.branch_tag(i)), loc, _depth + 1
            )
            if be is not None:
                branch_errs.append(F.when(src.isNotNull() & (tag == i), be))
        if branch_errs:
            return src, F.coalesce(tag_err, *branch_errs)
        return src, tag_err
    raise CompileError(f"conform: unsupported node {node!r}")


def _element_error(node: SchemaNode, loc: str):
    """Per-element validity predicate for arrays/maps (returns a lambda for
    F.exists), or None when elements can't be invalid.

    Depth: value checks (enum symbol, fixed length, int range) apply at
    this level only — nested container/record ELEMENT internals are not
    re-validated here (the oracle is the row-wise record walk). A null
    element where the element type is non-nullable is invalid for every
    kind, matching pyvalidate's 'Not a X: nil'."""
    null_bad = (lambda x: x.isNull()) if not node.nullable else None

    def with_null(pred):
        if null_bad is None:
            return pred
        return lambda x: null_bad(x) | pred(x)

    if isinstance(node, Enum):
        return with_null(lambda x: x.isNotNull() & ~x.isin(*node.symbols))
    if isinstance(node, Fixed):
        return with_null(lambda x: x.isNotNull() & (F.length(x) != node.size))
    if isinstance(node, Primitive) and node.type == "int":
        return with_null(
            lambda x: x.isNotNull() & ((x < INT32_MIN) | (x > INT32_MAX))
        )
    if isinstance(node, Primitive) and node.type == "null":
        return None  # null type: null IS the value
    return null_bad


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


# ------------------------------------------------------- JSON ingest (C2/C3)
# reference runtime type names (runtime.lua:270-274 etype2typename +
# typenames): what "encountered X" renders for each variant type
_VARIANT_DEPTH_LIMIT = 8


def _variant_depth_limit(node) -> int:
    """Same branching-aware reduction as _depth_limit: the variant walk
    visits multiplicity^depth nodes for branching-recursive schemas."""
    from ..schema.spark_types import cycle_multiplicity

    if cycle_multiplicity(node) >= 2:
        from ..plans.flatten import unroll_budget_for

        return min(_VARIANT_DEPTH_LIMIT, 2 * unroll_budget_for(node))
    return _VARIANT_DEPTH_LIMIT

# messages never begin with a path component — used to decide whether a
# dynamically-composed element error already carries a relative path
_VJ_MSG_STARTS = (
    "Expecting ", "Bad value", "Unknown key", "Key missing",
    "Value exceeds", "invalid JSON", "Infinite loop",
)


def _vj_is_bin(vcol: Column, bk: Optional[str]) -> Column:
    """With a binary convention key (e.g. '$binary'), a single-key object
    {bk: "<hex>"} IS a BIN value (the reference test corpus's JSON↔MsgPack
    convention, test/README.md:118-135)."""
    if bk is None:
        return F.lit(False)
    keys = F.json_object_keys(F.to_json(vcol))
    inner = F.variant_get(vcol, _vpath(bk), "variant")
    return (
        F.schema_of_variant(vcol).startswith("OBJECT")
        & (F.size(keys) == 1)
        & (F.try_element_at(keys, F.lit(1)) == bk)
        & (F.schema_of_variant(inner) == "STRING")
    )


def _vj_bin_len(vcol: Column, bk: str) -> Column:
    """Decoded byte length of a {bk: "<hex>"} value (spaces ignored)."""
    hexs = F.regexp_replace(F.variant_get(vcol, _vpath(bk), "string"), " ", "")
    return (F.length(hexs) / 2).cast("int")


def _vj_encountered(vcol: Column, bk: Optional[str]) -> Column:
    """schema_of_variant → the reference's encountered-type name. JSON has
    no FLOAT distinction: integers are LONG, fractional numbers DOUBLE,
    booleans render TRUE/FALSE like the reference's per-value typenames;
    binary-convention objects render BIN."""
    s = F.schema_of_variant(vcol)
    out = (
        F.when(s == "BOOLEAN",
               F.when(F.variant_get(vcol, "$", "boolean"), F.lit("TRUE"))
               .otherwise(F.lit("FALSE")))
        .when(s == "BIGINT", F.lit("LONG"))
        .when(s.startswith("DECIMAL") | (s == "DOUBLE") | (s == "FLOAT"), F.lit("DOUBLE"))
        .when(s == "STRING", F.lit("STR"))
        .when(s.startswith("ARRAY"), F.lit("ARRAY"))
        .when(s.startswith("OBJECT"), F.lit("MAP"))
        .when(s == "VOID", F.lit("NIL"))
        .otherwise(s)
    )
    if bk is not None:
        out = F.when(_vj_is_bin(vcol, bk), F.lit("BIN")).otherwise(out)
    return out


def _vj_loc(path: tuple[str, ...]) -> str:
    return ("/".join(path) + ": ") if path else ""


def _vj_expecting(vcol: Column, path: tuple[str, ...], expected: str,
                  bk: Optional[str]) -> Column:
    return F.concat(
        F.lit(f"{_vj_loc(path)}Expecting {expected}, encountered "),
        _vj_encountered(vcol, bk),
    )


def _vj_join_elem(prefix: str, key_col: Column, inner: Column) -> Column:
    """Compose a dynamic element location with the element's own error:
    'a/' + '1' + (': Expecting ...' | '/b: Expecting ...') — a '/' join
    when the inner error already carries a relative path, ': ' otherwise.
    ``inner`` is bound once (let): the startswith chain would otherwise
    copy its expression tree per keyword."""
    from ..functions.text import let as _let

    def body(iv: Column) -> Column:
        no_path = F.lit(False)
        for kw in _VJ_MSG_STARTS:
            no_path = no_path | iv.startswith(kw)
        return F.concat(
            F.lit(prefix), key_col,
            F.when(no_path, F.lit(": ")).otherwise(F.lit("/")),
            iv,
        )

    return _let(inner, body)


def conform_json(
    df: DataFrame,
    json_col: str,
    schema: Schema,
    mode: str = "flag",
    binary_key: Optional[str] = None,
    resolution=None,
) -> DataFrame:
    """Schema-first validation of raw JSON strings — the dynamic-ingest
    twin of :func:`conform`, mirroring the reference's MsgPack runtime
    checks (runtime.lua:263-336, pipeline.c:902-965) with the same error
    renderings: ``Expecting INT, encountered DOUBLE``, ``Key missing:
    "Age"``, ``Unknown key: "zz"``, ``Bad value: "X"``, ``Value exceeds
    INT range: N``, all path-prefixed.

    Everything runs JVM-side on Spark's VariantType (``parse_json`` +
    ``variant_get``/``schema_of_variant`` + higher-order functions over
    ``array<variant>`` / ``map<string, variant>``) — no Python workers, so
    at 100 TB this is a narrow scan-speed projection, the right shape for
    validating a Kafka/JSONL firehose before the typed boundary.

    ``binary_key``: JSON has no binary type; with e.g.
    ``binary_key='$binary'`` a single-key object ``{"$binary": "<hex>"}``
    counts as a BIN value (the reference corpus's JSON↔MsgPack
    convention) — bytes/fixed fields then require that form, and fixed
    length-checks the decoded byte count. Without it, bytes/fixed accept
    plain JSON strings.

    mode='flag' appends an ``_errors`` array<string> column — one error
    per top-level field (reference first-error semantics within each
    subtree; record-level problems like unknown keys suppress the field
    checks). mode='raise' fails the job on the first invalid row.
    Limitations: map keys containing ``"`` or control characters are not
    addressable; malformed JSON itself reports ``invalid JSON``; RECURSIVE
    schemas validate to depth 8 only (the flatten MAX_UNROLL deviation,
    SURVEY.md §7) — deeper data passes unchecked.
    """
    if mode not in ("raise", "flag"):
        raise CompileError(f"bad mode: {mode}")
    # any root works: records validate structurally, scalar/array/union
    # roots validate the whole JSON value against that node (the reference
    # compiles scalar-rooted schemas the same way)
    root = schema.root
    # ``resolution``: a writer→reader Resolved plan (CompiledSchema.plan)
    # — enables the "(schema versioning)" renderings for union branches
    # the reader cannot receive
    umap = None
    if resolution is not None:
        from ..plans.resolution import unmapped_union_branches

        umap = unmapped_union_branches(resolution)
        # umap keys are id()s of the PLAN's writer nodes. When the
        # caller's root is identity-present in that tree (the normal
        # compiled.writer case, incl. subtree validation), lookups just
        # work. An equal-but-DISTINCT schema object would make every
        # lookup silently miss and the "(schema versioning)" renderings
        # never fire — re-anchor on the structurally-equal node of the
        # plan's own writer tree instead, or fail loudly.
        if resolution.writer is not None:
            from ..schema.export import export as _export_node
            from ..schema.nodes import walk as _walk_nodes

            plan_nodes = list(_walk_nodes(resolution.writer))
            if id(root) not in {id(n) for n in plan_nodes}:
                want = _export_node(root)
                # cheap type filter first, full export compare second —
                # avoids an O(nodes × subtree) export sweep on wide trees
                matches = [
                    n for n in plan_nodes
                    if n.type == root.type and n.nullable == root.nullable
                    and _export_node(n) == want
                ]
                if not matches:
                    raise CompileError(
                        "conform_json: schema does not occur in the "
                        "resolution plan's writer schema — pass the "
                        "compiled writer (or one of its subtrees)"
                    )
                # two structurally-equal subtrees can resolve DIFFERENTLY
                # (the reader drops a branch under one field but not the
                # other) — anchoring on the wrong one silently skips the
                # versioning errors, so require an unambiguous footprint
                foot = {
                    tuple(
                        tuple(umap.get(id(n), ())) for n in _walk_nodes(m)
                    )
                    for m in matches
                }
                if len(foot) > 1:
                    raise CompileError(
                        "conform_json: schema matches several writer "
                        "subtrees whose reader resolutions differ — "
                        "pass the exact subtree node of the compiled "
                        "writer (compiled.writer.root...)"
                    )
                root = matches[0]
    raw = F.col(json_col)
    # Materialize the parsed variant ONCE in its own projection. Variant
    # expressions are CodegenFallback in Spark 4.1 — the whole validator
    # runs interpreted, where a repeated try_parse_json subtree really
    # re-parses the JSON at EVERY reference (no codegen CSE). The
    # validation tree references the variant dozens of times per row;
    # CollapseProject keeps the alias because a non-cheap expression
    # referenced more than once is never re-inlined. Measured 13.3 s →
    # 1.7 s on the 150k-row conform_json gate (sf0.1, local[32]).
    vtmp = f"_avsp_variant_{json_col}$"
    dfv = df.withColumn(vtmp, F.try_parse_json(raw))
    v = F.col(vtmp)
    bad_json = F.when(raw.isNotNull() & v.isNull(), F.lit("invalid JSON"))
    if isinstance(root, Record):
        # one error PER TOP-LEVEL FIELD in flag mode (like conform);
        # record-level problems (bad json / not an object / unknown key)
        # suppress the per-field checks, which would misfire on non-objects
        from ..functions.text import let as _let

        s = F.schema_of_variant(v)
        head, field_errs = _vj_record_parts(root, v, (), 0, s, binary_key, umap)
        head = F.coalesce(bad_json, head)
        # let-bind head: it embeds the record-level checks (incl. the
        # expensive unknown-key scan) and every field slot references it
        # — inlined per field, interpreted mode re-ran all of it N times
        errors = _let(
            head,
            lambda h: F.array_compact(F.array(
                h, *[F.when(h.isNull(), e) for e in field_errs]
            )),
        )
    else:
        err = F.coalesce(bad_json, _vj_node(root, v, (), 0, binary_key, umap))
        errors = F.array_compact(F.array(err))
    if mode == "flag":
        return dfv.withColumn(ERRORS_COL, errors).drop(vtmp)
    guard = F.assert_true(
        F.size(errors) == 0,
        F.concat(F.lit("validation failed: "), F.array_join(errors, "; ")),
    )
    # the guard is NULL unless it raises; coalesce keeps the filter a no-op
    return dfv.where(F.coalesce(guard.cast("boolean"), F.lit(True))).drop(vtmp)



def _vpath(key: str) -> str:
    """Variant path for a LITERAL object key: bracket-quoted, because
    the dotted form ($.a.b) traverses nested objects — a namespaced
    union branch tag like com.example.Rec is one key, not three."""
    return "$['" + key.replace("\\", "\\\\").replace("'", "\\'") + "']"

def _vj_node(node: SchemaNode, vcol: Column, path: tuple[str, ...],
             depth: int, bk: Optional[str],
             umap: Optional[dict] = None) -> Column:
    """First validation error (string Column, NULL when valid) for a
    variant value against a schema node. ``vcol`` NULL means the value was
    absent — handled by the enclosing record/union."""
    if depth > _variant_depth_limit(node):
        return F.lit(None).cast("string")
    # nodes that validate nothing must stay a plain NULL literal, not a
    # wrapped transform. Structural check — _vj_node_strict returns None
    # ONLY for the 'any' primitive (every composite emits a shape check
    # regardless of its children); building and discarding the whole
    # strict subtree as a probe doubled plan-build work per nesting level
    # (2^depth on recursive schemas).
    if isinstance(node, Primitive) and node.type == "any":
        return F.lit(None).cast("string")
    from ..functions.text import let as _let

    def _with_s(s: Column) -> Column:
        err = _vj_node_strict(node, vcol, path, depth, s, bk, umap)
        if node.nullable:
            # nullable wrapper: JSON null short-circuits
            # (frontend.lua:749-751)
            return F.when(
                vcol.isNull() | (s == "VOID"), F.lit(None).cast("string")
            ).otherwise(err)
        return err

    # let-bind schema_of_variant: the strict checks reference it up to
    # four times per node, and interpreted eval recomputes every one
    return _let(F.schema_of_variant(vcol), _with_s)


def _vj_node_strict(node: SchemaNode, vcol: Column, path: tuple[str, ...],
                    depth: int, s: Column, bk: Optional[str],
                    umap: Optional[dict] = None):
    loc = _vj_loc(path)
    if isinstance(node, Primitive):
        t = node.type
        if t == "any":
            return None
        if t == "null":
            return F.when(s != "VOID", _vj_expecting(vcol, path, "NIL", bk))
        if t == "boolean":
            return F.when(s != "BOOLEAN", _vj_expecting(vcol, path, "BOOL", bk))
        if t in ("int", "long"):
            label = "INT" if t == "int" else "LONG"
            type_err = F.when(s != "BIGINT", _vj_expecting(vcol, path, label, bk))
            if t == "long":
                return type_err
            n = F.variant_get(vcol, "$", "bigint")
            range_err = F.when(
                (n < INT32_MIN) | (n > INT32_MAX),
                # msgpack runtime renders the int64 cdata with the LL
                # suffix (int.lua:87 'Value exceeds INT range: 2147483648LL')
                F.concat(F.lit(f"{loc}Value exceeds INT range: "),
                         n.cast("string"), F.lit("LL")),
            )
            return F.coalesce(type_err, range_err)
        if t in ("float", "double"):
            label = "FLOAT" if t == "float" else "DOUBLE"
            ok = (s == "BIGINT") | (s == "DOUBLE") | s.startswith("DECIMAL")
            return F.when(~ok, _vj_expecting(vcol, path, label, bk))
        if t == "string":
            return F.when(s != "STRING", _vj_expecting(vcol, path, "STR", bk))
        if t == "bytes":
            if bk is not None:
                return F.when(~_vj_is_bin(vcol, bk),
                              _vj_expecting(vcol, path, "BIN", bk))
            return F.when(s != "STRING", _vj_expecting(vcol, path, "BIN", bk))
        raise CompileError(f"conform_json: primitive {t}")
    if isinstance(node, Enum):
        type_err = F.when(s != "STRING", _vj_expecting(vcol, path, "STR", bk))
        sym = F.variant_get(vcol, "$", "string")
        bad = F.when(
            ~sym.isin(*node.symbols),
            F.concat(F.lit(f'{loc}Bad value: "'), sym, F.lit('"')),
        )
        return F.coalesce(type_err, bad)
    if isinstance(node, Fixed):
        if bk is not None:
            type_err = F.when(~_vj_is_bin(vcol, bk),
                              _vj_expecting(vcol, path, "BIN", bk))
            ln = _vj_bin_len(vcol, bk)
        else:
            type_err = F.when(s != "STRING", _vj_expecting(vcol, path, "BIN", bk))
            ln = F.length(F.variant_get(vcol, "$", "string"))
        bad = F.when(
            ln != node.size,
            F.concat(
                F.lit(f"{loc}Expecting BIN of length {node.size}. "
                      "Encountered BIN of length "),
                ln.cast("string"), F.lit("."),
            ),
        )
        return F.coalesce(type_err, bad)
    is_bin = _vj_is_bin(vcol, bk)
    if isinstance(node, Record):
        head, field_errs = _vj_record_parts(node, vcol, path, depth, s, bk, umap)
        return F.coalesce(head, *field_errs)
    if isinstance(node, Array):
        type_err = F.when(~s.startswith("ARRAY"),
                          _vj_expecting(vcol, path, "ARRAY", bk))
        arr = F.variant_get(vcol, "$", "array<variant>")
        # bind the first-bad-element struct ONCE (let): referencing the
        # aggregate at each of _vj_join_elem's startswith sites would copy
        # the whole inner tree ~9× per nesting level — exponential plan
        # size (a depth-3 array schema produced a 2.3 MB plan / task OOM)
        from ..functions.text import let as _let

        # guard the index sequence on non-empty input: sequence(1, 0)
        # DESCENDS to [1, 0], and zip_with would null-pad a phantom element
        # whose NULL variant then fails required-field checks on a valid
        # empty array
        elem_err = F.when(
            F.size(arr) > 0,
            F.aggregate(
                F.zip_with(
                    arr,
                    F.transform(F.sequence(F.lit(1), F.greatest(F.size(arr), F.lit(1))), lambda i: i),
                    lambda x, i: F.struct(
                        _vj_elem(node.items, x, depth, bk, umap).alias("e"),
                        i.alias("i"),
                    ),
                ),
                F.lit(None).cast("struct<e:string,i:int>"),
                lambda acc, p: F.coalesce(acc, F.when(p.getField("e").isNotNull(), p)),
            ),
        )
        # reference location: slash-joined path + 1-based element index,
        # 'Tags/2: Expecting STR, ...'
        prefix = ("/".join(path) + "/") if path else ""
        bad_elem = _let(
            elem_err,
            lambda ee: F.when(
                ee.isNotNull(),
                _vj_join_elem(prefix, ee.getField("i").cast("string"),
                              ee.getField("e")),
            ),
        )
        return F.coalesce(type_err, bad_elem)
    if isinstance(node, Map):
        type_err = F.when(~s.startswith("OBJECT") | is_bin,
                          _vj_expecting(vcol, path, "MAP", bk))
        m = F.variant_get(vcol, "$", "map<string, variant>")
        # build the per-value error tree ONCE (transform_values), then
        # filter — duplicating it in a map_filter predicate AND the message
        # expression doubles the tree per nesting level (exponential plan
        # size: a map-of-map schema OOMed the driver during analysis)
        from ..functions.text import let as _let

        errs_m = F.map_filter(
            F.transform_values(m, lambda k, val: _vj_elem(node.values, val, depth, bk, umap)),
            lambda k, e: e.isNotNull(),
        )
        prefix = ("/".join(path) + "/") if path else ""
        # bind the filtered error map once — its tree contains the whole
        # inner validation expression
        val_err = _let(
            errs_m,
            lambda em: F.when(
                F.size(F.map_keys(em)) > 0,
                _vj_join_elem(prefix,
                              F.try_element_at(F.map_keys(em), F.lit(1)),
                              F.try_element_at(F.map_values(em), F.lit(1))),
            ),
        )
        return F.coalesce(type_err, val_err)
    if isinstance(node, UnionNode):
        has_null = any(isinstance(b, Primitive) and b.type == "null" for b in node.branches)
        type_err = F.when(
            (~s.startswith("OBJECT") | is_bin) & ~((s == "VOID") & F.lit(has_null)),
            _vj_expecting(vcol, path, "NIL or MAP" if has_null else "MAP", bk),
        )
        keys = F.json_object_keys(F.to_json(vcol))
        tags = [node.branch_tag(i) for i, b in enumerate(node.branches)
                if not (isinstance(b, Primitive) and b.type == "null")]
        tag = F.try_element_at(keys, F.lit(1))
        unknown_err = F.when(
            (F.size(keys) != 1) | ~tag.isin(*tags) if tags else F.lit(True),
            F.concat(F.lit(f'{loc}Unknown key: "'), F.coalesce(tag, F.lit("")), F.lit('"')),
        )
        # evolution: a branch valid in the writer but unmapped in the
        # reader rejects on the TAG, before any value checking — the
        # generated switch has no arm for it (runtime.lua:319-336)
        vers_tags = [
            node.branch_tag(i) for i in (umap or {}).get(id(node), ())
        ]
        if vers_tags:
            unknown_err = F.coalesce(
                unknown_err,
                F.when(
                    tag.isin(*vers_tags),
                    F.concat(F.lit(f'{loc}Unknown key: "'), tag,
                             F.lit('" (schema versioning)')),
                ),
            )
        branch_err = F.lit(None).cast("string")
        for i, b in enumerate(node.branches):
            if isinstance(b, Primitive) and b.type == "null":
                continue
            t = node.branch_tag(i)
            e = _vj_node(b, F.variant_get(vcol, _vpath(t), "variant"),
                         path + (t,), depth + 1, bk, umap)
            branch_err = F.when(tag == t, e).otherwise(branch_err)
        obj_err = F.coalesce(unknown_err, branch_err)
        if has_null:
            obj_err = F.when(s != "VOID", obj_err)
        return F.coalesce(type_err, obj_err)
    raise CompileError(f"conform_json: unsupported node {node!r}")


def _vj_record_parts(node: Record, vcol: Column, path: tuple[str, ...],
                     depth: int, s: Column, bk: Optional[str],
                     umap: Optional[dict] = None):
    """(record-level error, [per-field first-errors]) for a record node —
    shared by the nested Record branch (coalesced to one error) and the
    conform_json root (kept separate so mode='flag' reports one error per
    top-level field)."""
    loc = _vj_loc(path)
    type_err = F.when(~s.startswith("OBJECT") | _vj_is_bin(vcol, bk),
                      _vj_expecting(vcol, path, "MAP", bk))
    known = [f.name for f in node.fields]
    keys = F.json_object_keys(F.to_json(vcol))
    from ..functions.text import let as _let

    # let-bind the unknown-key array: to_json re-renders the WHOLE
    # variant and json_object_keys re-parses it — the most expensive
    # node in the validator — and the size + element_at references would
    # otherwise evaluate it twice per row (interpreted, no codegen CSE)
    unknown_err = _let(
        F.array_except(keys, F.array(*[F.lit(k) for k in known])),
        lambda u: F.when(
            F.size(u) > 0,
            F.concat(F.lit(f'{loc}Unknown key: "'),
                     F.try_element_at(u, F.lit(1)), F.lit('"')),
        ),
    )
    from ..functions.text import let as _let

    field_errs: list[Column] = []

    # let-bind each field's variant: interpreted mode (all Variant exprs
    # are CodegenFallback) re-navigates variant_get at every reference,
    # and each field check references it several times. NB the body must
    # be a ONE-argument callable — pyspark reads the arity to decide
    # between (element) and (element, index) transform lambdas.
    def _field_err_fn(f):
        def body(c: Column) -> Column:
            fpath = path + (f.name,)
            present_err = _vj_node(f.type, c, fpath, depth + 1, bk, umap)
            if f.has_default or _nullable_ok(f.type):
                return F.when(c.isNotNull(), present_err)
            return F.when(
                c.isNull(),
                F.lit(f'{loc}Key missing: "{f.name}"'),
            ).otherwise(present_err)

        return body

    for f in node.fields:
        field_errs.append(
            _let(
                F.variant_get(vcol, _vpath(f.name), "variant"),
                _field_err_fn(f),
            )
        )
    return F.coalesce(type_err, unknown_err), field_errs


def _vj_elem(node: SchemaNode, vcol: Column, depth: int,
             bk: Optional[str], umap: Optional[dict] = None) -> Column:
    """Element-level error WITHOUT an absolute path prefix (the caller
    composes the dynamic index/key location)."""
    return _vj_node(node, vcol, (), depth + 1, bk, umap)


def conform_json_tuple(
    df: DataFrame,
    json_col: str,
    compiled,
    mode: str = "flag",
    binary_key: Optional[str] = None,
) -> DataFrame:
    """Validate raw JSON ARRAYS against a compiled schema's FLAT layout —
    the unflatten-direction ingest contract (tuples from storage), with
    the reference runtime's cell-located renderings: ``Expecting ARRAY of
    length 3. Encountered ARRAY of length 4.``, ``1: Expecting INT,
    encountered DOUBLE``, ``2: Bad value: 4`` for enum codes / union tags
    out of range (runtime.lua err_length/err_type/err_value over tuple
    positions; 1-based indices count service cells).

    Like :func:`conform_json`, a single JVM-side VariantType projection.
    """
    from ..plans.layout import SCALAR, SERVICE, UNION_TAG, UNION_VALUE, build_layout

    if mode not in ("raise", "flag"):
        raise CompileError(f"bad mode: {mode}")
    from ..plans.resolution import unmapped_union_branches

    cells = build_layout(compiled.writer.root, compiled.service_fields)
    umap = unmapped_union_branches(compiled.plan)
    raw = F.col(json_col)
    # parse ONCE in a dedicated projection — same CodegenFallback
    # re-evaluation hazard as conform_json (every cell references v)
    vtmp = f"_avsp_variant_{json_col}$"
    dfv = df.withColumn(vtmp, F.try_parse_json(raw))
    v = F.col(vtmp)
    s = F.schema_of_variant(v)
    bad_json = F.when(raw.isNotNull() & v.isNull(), F.lit("invalid JSON"))
    type_err = F.when(~s.startswith("ARRAY"),
                      _vj_expecting(v, (), "ARRAY", binary_key))
    arr = F.variant_get(v, "$", "array<variant>")
    n = len(cells)
    len_err = F.when(
        F.size(arr) != n,
        F.concat(
            F.lit(f"Expecting ARRAY of length {n}. Encountered ARRAY of length "),
            F.size(arr).cast("string"), F.lit("."),
        ),
    )
    cell_errs: list[Column] = []
    for cell in cells:
        i = cell.index + 1  # reference tuple locations are 1-based
        el = F.variant_get(v, f"$[{cell.index}]", "variant")
        es = F.schema_of_variant(el)
        loc = (str(i),)
        if cell.kind == SERVICE:
            node: SchemaNode = Primitive(cell.type_label)
            cell_errs.append(_vj_node(node, el, loc, 0, binary_key))
        elif cell.kind == UNION_TAG:
            union: UnionNode = cells[cell.index + 1].node  # type: ignore[assignment]
            nb = len(union.branches)
            tag_n = F.variant_get(el, "$", "bigint")
            checks = [
                F.when(es != "BIGINT", _vj_expecting(el, loc, "INT", binary_key)),
                F.when(
                    ~tag_n.between(0, nb - 1),
                    F.concat(F.lit(f"{i}: Bad value: "), tag_n.cast("string")),
                ),
            ]
            # evolution: an in-range tag whose branch is unmapped in the
            # reader rejects on the TAG cell, before the value cell is
            # examined — '1: Bad value: 1 (schema versioning)'
            # (union_versions.lua:99-107, runtime.lua:319-336)
            missing = umap.get(id(union), ())
            if missing:
                checks.append(
                    F.when(
                        tag_n.isin(*[int(j) for j in missing]),
                        F.concat(F.lit(f"{i}: Bad value: "), tag_n.cast("string"),
                                 F.lit(" (schema versioning)")),
                    )
                )
            cell_errs.append(F.coalesce(*checks))
        elif cell.kind == UNION_VALUE:
            union = cell.node  # type: ignore[assignment]
            tag = F.variant_get(F.variant_get(v, f"$[{cell.index - 1}]", "variant"),
                                "$", "bigint")
            e = F.lit(None).cast("string")
            for j, b in enumerate(union.branches):
                if isinstance(b, Primitive) and b.type == "null":
                    be = F.when(es != "VOID", _vj_expecting(el, loc, "NIL", binary_key))
                else:
                    be = _vj_node(b, el, loc, 0, binary_key)
                e = F.when(tag == j, be).otherwise(e)
            cell_errs.append(e)
        elif isinstance(cell.node, Enum):
            # flat enum cells carry the int code; out-of-range codes render
            # '1: Bad value: 4' (enum.lua:77-89)
            enum: Enum = cell.node
            code = F.variant_get(el, "$", "bigint")
            nil_ok = enum.nullable
            e = F.coalesce(
                F.when(es != "BIGINT", _vj_expecting(el, loc, "INT", binary_key)),
                F.when(
                    ~code.between(0, len(enum.symbols) - 1),
                    F.concat(F.lit(f"{i}: Bad value: "), code.cast("string")),
                ),
            )
            if nil_ok:
                e = F.when(es != "VOID", e)
            cell_errs.append(e)
        else:
            assert cell.kind == SCALAR
            cell_errs.append(_vj_node(cell.node, el, loc, 0, binary_key))
    err = F.coalesce(bad_json, type_err, len_err, *cell_errs)
    errors = F.array_compact(F.array(err))
    if mode == "flag":
        return dfv.withColumn(ERRORS_COL, errors).drop(vtmp)
    guard = F.assert_true(
        F.size(errors) == 0,
        F.concat(F.lit("validation failed: "), F.array_join(errors, "; ")),
    )
    return dfv.where(F.coalesce(guard.cast("boolean"), F.lit(True))).drop(vtmp)


# ------------------------------------------------- typed JSON parse (A2/C1)
def parse_json_typed(
    df: DataFrame,
    json_col: str,
    schema: Schema,
    binary_key: Optional[str] = None,
    keep: tuple = (),
) -> DataFrame:
    """Raw JSON strings → typed record columns honoring the AVRO value
    conventions Spark's ``from_json`` cannot express: union values as
    single-entry maps ``{"int": 42}`` (frontend.lua:899-919) become the
    engine's tagged union structs, field defaults fill missing keys, and
    (with ``binary_key``) ``{"$binary": hex}`` objects decode to binary.

    Best-effort typing (``try_variant_get`` semantics): mismatched values
    null out rather than erroring — pair with :func:`conform_json` for the
    validation verdicts. One JVM-side VariantType projection, no Python.
    """
    root = schema.root
    if not isinstance(root, Record):
        raise CompileError("parse_json_typed requires a record schema")
    # parse ONCE in a dedicated projection: Variant exprs are
    # CodegenFallback, and each field's extraction would otherwise
    # re-parse the JSON per reference (same fix as conform_json)
    vtmp = f"_avsp_variant_{json_col}$"
    dfv = df.withColumn(vtmp, F.try_parse_json(F.col(json_col)))
    v = F.col(vtmp)
    from ..functions.text import let as _let

    cols = []
    for f in root.fields:
        def _value_fn(f):
            def body(child: Column) -> Column:
                value = _pj_node(f.type, child, 0, binary_key)
                if f.has_default:
                    value = F.coalesce(value, lit_for(f.type, f.default))
                return value

            return body

        cols.append(
            _let(
                F.variant_get(v, _vpath(f.name), "variant"), _value_fn(f)
            ).alias(f.name)
        )
    return dfv.select(*cols, *[F.col(k) for k in keep])


def _pj_node(node: SchemaNode, vcol: Column, depth: int,
             bk: Optional[str]) -> Column:
    """Typed value Column for a variant against a schema node (best-effort;
    nulls on mismatch)."""
    target = to_spark_type(node)
    if depth > _variant_depth_limit(node):
        return F.lit(None).cast(target)
    if isinstance(node, Primitive):
        t = node.type
        if t == "null":
            return F.lit(None).cast("void")
        if t == "bytes" or t == "any":
            if t == "bytes" and bk is not None:
                hexs = F.regexp_replace(
                    F.try_variant_get(vcol, _vpath(bk), "string"), " ", "")
                return F.unhex(hexs)
            return F.try_variant_get(vcol, "$", "string").cast("binary") \
                if t == "bytes" else F.to_json(vcol)
        sql_t = {"boolean": "boolean", "int": "int", "long": "bigint",
                 "float": "float", "double": "double", "string": "string"}[t]
        return F.try_variant_get(vcol, "$", sql_t)
    if isinstance(node, Enum):
        return F.try_variant_get(vcol, "$", "string")
    if isinstance(node, Fixed):
        if bk is not None:
            hexs = F.regexp_replace(
                F.try_variant_get(vcol, _vpath(bk), "string"), " ", "")
            return F.unhex(hexs)
        return F.try_variant_get(vcol, "$", "string").cast("binary")
    if isinstance(node, Record):
        parts = []
        for f in node.fields:
            child = F.variant_get(vcol, _vpath(f.name), "variant")
            val = _pj_node(f.type, child, depth + 1, bk)
            if f.has_default:
                val = F.coalesce(val, lit_for(f.type, f.default))
            parts.append(val.alias(f.name))
        return F.when(
            vcol.isNull() | (F.schema_of_variant(vcol) == "VOID"),
            F.lit(None).cast(target),
        ).otherwise(F.struct(*parts))
    if isinstance(node, Array):
        arr = F.try_variant_get(vcol, "$", "array<variant>")
        return F.transform(arr, lambda x: _pj_node(node.items, x, depth + 1, bk))
    if isinstance(node, Map):
        m = F.try_variant_get(vcol, "$", "map<string, variant>")
        return F.transform_values(m, lambda k, x: _pj_node(node.values, x, depth + 1, bk))
    if isinstance(node, UnionNode):
        simple = union_null_and_one(node)
        if simple is not None:
            # [null, T]: record form is still {tag: value} or null
            tag = next(node.branch_tag(i) for i, b in enumerate(node.branches)
                       if not (isinstance(b, Primitive) and b.type == "null"))
            return _pj_node(simple, F.variant_get(vcol, _vpath(tag), "variant"),
                            depth + 1, bk)
        keys = F.json_object_keys(F.to_json(vcol))
        tag_name = F.try_element_at(keys, F.lit(1))
        tag_expr: Column = F.lit(None).cast("int")
        fields = []
        for i, b in enumerate(node.branches):
            t = node.branch_tag(i)
            if isinstance(b, Primitive) and b.type == "null":
                tag_expr = F.when(
                    F.is_variant_null(vcol) | vcol.isNull(), F.lit(i)
                ).otherwise(tag_expr)
                continue
            tag_expr = F.when(tag_name == t, F.lit(i)).otherwise(tag_expr)
            fields.append(
                F.when(
                    tag_name == t,
                    _pj_node(b, F.variant_get(vcol, _vpath(t), "variant"),
                             depth + 1, bk),
                ).alias(t)
            )
        return F.when(tag_expr.isNull(), F.lit(None).cast(target)).otherwise(
            F.struct(tag_expr.alias("$type$"), *fields)
        )
    raise CompileError(f"parse_json_typed: unsupported node {node!r}")


# ------------------------------------------------------- JSON xflatten (A7)
def _xj_keys(vcol: Column) -> Column:
    return F.json_object_keys(F.to_json(vcol))


def _xj_render(node: SchemaNode, vcol: Column) -> Column:
    """Update-op VALUE rendering for one flat cell, as a string (the
    heterogeneous-cell convention shared with ``xflatten(stringify=True)``):
    scalars as their lexical form, containers/records as their JSON
    text, enums as the integer code."""
    if isinstance(node, Enum):
        code = F.element_at(
            F.create_map(*[
                x for i, s in enumerate(node.symbols)
                for x in (F.lit(s), F.lit(i))
            ]),
            F.variant_get(vcol, "$", "string"),
        )
        return code.cast("string")
    if isinstance(node, Primitive) and node.type in ("float", "double"):
        # match the typed path's stringification (2.0 -> '2.0'; the
        # variant's lexical form would drop the fraction: '2'). Known
        # deviation: Spark's Variant stores small JSON decimals as
        # DECIMAL, which has no signed zero, so -0.0 arrives as 0.0.
        return F.variant_get(vcol, "$", "double").cast("string")
    if isinstance(node, Primitive) and node.type in (
        "int", "long", "boolean", "string",
    ):
        return F.variant_get(vcol, "$", "string")
    # bytes/fixed/array/map/record (and VLO nullables): JSON text
    return F.when(vcol.isNotNull(), F.to_json(vcol))


def _xj_union_ops(node: UnionNode, vcol: Column, present: Column,
                  sort_key: Column, pos: int, n_service: int):
    """The two ops of a union cell pair: tag (branch index from the
    single-entry map key, or the null branch for JSON null) and value."""
    null_idx = next(
        (i for i, b in enumerate(node.branches)
         if isinstance(b, Primitive) and b.type == "null"), None,
    )
    tag_name = F.try_element_at(_xj_keys(vcol), F.lit(1))
    tag_map = F.create_map(*[
        x for i in range(len(node.branches))
        for x in (F.lit(node.branch_tag(i)), F.lit(i))
        if not (isinstance(node.branches[i], Primitive)
                and node.branches[i].type == "null")
    ])
    # JSON null parses to a VOID variant, not a SQL NULL
    is_null_v = vcol.isNull() | (F.schema_of_variant(vcol) == "VOID")
    tag = F.when(
        is_null_v, F.lit(null_idx).cast("int")
    ).otherwise(F.element_at(tag_map, tag_name).cast("int"))
    val = F.lit(None).cast("string")
    for i, b in enumerate(node.branches):
        if isinstance(b, Primitive) and b.type == "null":
            continue
        t = node.branch_tag(i)
        val = F.when(
            ~is_null_v & (tag_name == t),
            _xj_render(b, F.variant_get(vcol, _vpath(t), "variant")),
        ).otherwise(val)
    mk = lambda idx, v: F.when(present, F.struct(  # noqa: E731
        sort_key.alias("k"),
        F.struct(
            F.lit("=").alias("op"),
            F.lit(idx + n_service).alias("field_no"),
            v.alias("value"),
        ).alias("o"),
    ))
    return [mk(pos, tag.cast("string")), mk(pos + 1, val)]


def xflatten_json(
    df: DataFrame,
    json_col: str,
    compiled,
    mode: str = "flag",
    binary_key: Optional[str] = None,
    keep: tuple = (),
) -> DataFrame:
    """A7's dynamic face: raw JSON PARTIAL records → update-op arrays,
    with per-ROW field presence — the form the reference's xflatten
    actually consumes (one partial record per call,
    test/ddt_suite/record.lua:355-362), which typed columns cannot
    express (a column is present for every row or none).

    Output: ``keep`` columns + ``ops`` (array of
    ``struct<op:string, field_no:int, value:string>``, 1-based flat
    indices offset by the service-field count, ops ordered by the
    input's own key order at every nesting level — the reference's op
    order, record_version.lua:108-143) + ``_errors`` (mode='flag').
    Validation mirrors xflatten semantics: any field may be ABSENT at
    any inlined-record level; PRESENT values validate strictly
    (nullable-record / union-branch VALUES are whole cells and must be
    complete — same contract as the typed path's completeness check);
    unknown keys error. All JVM-side VariantType expressions — no
    Python stage, narrow, scan-speed at 100 TB like conform_json.
    """
    from ..plans.layout import (
        SCALAR, SERVICE, UNION_TAG, UNION_VALUE, build_layout,
    )
    from ..schema.nodes import Record as _Record

    if mode not in ("raise", "flag"):
        raise CompileError(f"bad mode: {mode}")
    writer = compiled.writer
    root = writer.root
    if compiled.wrapped_root or not isinstance(root, _Record):
        raise CompileError("xflatten_json requires a record root")
    n_service = len(compiled.service_fields)
    cells = build_layout(root, compiled.service_fields)
    raw = F.col(json_col)

    # ---- helper-column stage: every record LEVEL's key array (from the
    # RAW text — get_json_object slices preserve document order, while
    # VariantType normalizes objects to sorted keys) and variant slice
    # are computed ONCE as named columns, so per-cell expressions stay
    # O(1)-deep instead of re-deriving their whole presence chain —
    # keeping runtime tree growth linear in cells at any nesting depth.
    # (Plan BUILD is still a per-schema driver-side constant — ~10 s at
    # 150 cells, dominated by column construction — amortized over the
    # data like every compiled plan here.)
    prefixes: list[tuple[str, ...]] = []
    seen_prefix: set[tuple[str, ...]] = set()
    for cell in cells:
        if cell.kind == SERVICE:
            continue
        for i in range(len(cell.path)):
            p = cell.path[:i]
            if p not in seen_prefix:
                seen_prefix.add(p)
                prefixes.append(p)
    kcol = {p: f"__xj_k{i}" for i, p in enumerate(prefixes)}
    vcol_name = {p: f"__xj_v{i}" for i, p in enumerate(prefixes)}
    # prefixes are ordered parents-first, so each variant helper can
    # reference its parent's column — chained selects, which Catalyst's
    # CollapseProject folds back into one projection
    work = df
    for p in prefixes:
        raw_obj = raw
        for name in p:
            raw_obj = F.get_json_object(
                raw_obj, "$['" + name.replace("'", "\\'") + "']"
            )
        vexpr = F.try_parse_json(raw) if not p else F.variant_get(
            F.col(vcol_name[p[:-1]]), _vpath(p[-1]), "variant"
        )
        work = work.select(
            "*",
            F.json_object_keys(raw_obj).alias(kcol[p]),
            vexpr.alias(vcol_name[p]),
        )
    v = F.col(vcol_name[()])

    def keys_at(p: tuple) -> Column:
        return F.col(kcol[p])

    def variant_at(p: tuple) -> Column:
        return F.col(vcol_name[p])

    # ---- errors: xflatten-mode validation (absence allowed per level)
    def rec_errors(node: _Record, path: tuple, depth: int) -> list[Column]:
        loc = _vj_loc(path)
        vc = variant_at(path)
        s = F.schema_of_variant(vc)
        type_err = F.when(~s.startswith("OBJECT") | _vj_is_bin(vc, binary_key),
                          _vj_expecting(vc, path, "MAP", binary_key))
        known = [f.name for f in node.fields]
        keys = keys_at(path)
        unknown = F.array_except(keys, F.array(*[F.lit(k) for k in known]))
        unknown_err = F.when(
            F.size(unknown) > 0,
            F.concat(F.lit(f'{loc}Unknown key: "'),
                     F.try_element_at(unknown, F.lit(1)), F.lit('"')),
        )
        errs = [F.coalesce(type_err, unknown_err)]
        for f in node.fields:
            present = F.array_contains(keys, f.name)
            fpath = path + (f.name,)
            ft = f.type
            if isinstance(ft, _Record) and not ft.nullable:
                # inlined sub-record: absence allowed per subfield too
                sub = rec_errors(ft, fpath, depth + 1)
                errs.append(F.when(present, F.coalesce(*sub)))
            else:
                child = F.variant_get(vc, _vpath(f.name), "variant")
                errs.append(F.when(
                    present, _vj_node(ft, child, fpath, depth + 1, binary_key)
                ))
        return errs

    bad_json = F.when(raw.isNotNull() & v.isNull(), F.lit("invalid JSON"))
    err = F.coalesce(bad_json, *rec_errors(root, (), 0))
    errors = F.array_compact(F.array(err))

    # ---- ops: per flat cell, gated on the full presence chain, sorted
    # by the input's own key positions at every nesting level
    op_structs: list[Column] = []
    for cell in cells:
        if cell.kind == SERVICE or cell.kind == UNION_VALUE:
            # a union is handled once, at its TAG cell (the VALUE cell is
            # always the immediately following cell); keying the skip on
            # node identity instead would DROP the second occurrence of a
            # union inside a named record referenced twice
            continue
        # presence chain + per-level input-order sort key, all from the
        # shared helper columns
        present = F.lit(True)
        sort_parts: list[Column] = []
        for i, name in enumerate(cell.path):
            keys_here = keys_at(cell.path[:i])
            present = present & F.array_contains(
                F.coalesce(keys_here, F.array().cast("array<string>")), name
            )
            sort_parts.append(F.coalesce(
                F.array_position(keys_here, name).cast("int"), F.lit(0)))
        parent = F.variant_get(
            variant_at(cell.path[:-1]), _vpath(cell.path[-1]), "variant"
        )
        sort_key = F.array(*sort_parts)
        node = cell.node
        pos = cell.index + 1  # 1-based; service cells already counted
        if cell.kind == UNION_TAG:
            union: UnionNode = cells[cell.index + 1].node  # type: ignore
            op_structs.extend(
                _xj_union_ops(union, parent, present, sort_key, pos, 0)
            )
            continue
        assert cell.kind == SCALAR
        if isinstance(node, _Record) and node.nullable \
                and not compiled.alpha_nullable_record_xflatten:
            raise CompileError(
                "xflatten for nullable record is on developement stage. "
                "Use alpha_nullable_record_xflatten option if you "
                "understand what you do."
            )
        op_structs.append(F.when(present, F.struct(
            sort_key.alias("k"),
            F.struct(
                F.lit("=").alias("op"),
                F.lit(pos).alias("field_no"),
                _xj_render(node, parent).alias("value"),
            ).alias("o"),
        )))
    ops = F.transform(
        F.array_sort(F.array_compact(F.array(*op_structs))),
        lambda x: x.getField("o"),
    )
    out_cols = [F.col(k) for k in keep] + [
        F.when(F.size(errors) == 0, ops).alias("ops")
    ]
    if mode == "flag":
        return work.select(*out_cols, errors.alias(ERRORS_COL))
    guard = F.assert_true(
        F.size(errors) == 0,
        F.concat(F.lit("xflatten_json failed: "), F.array_join(errors, "; ")),
    )
    return work.where(F.coalesce(guard.cast("boolean"), F.lit(True))).select(*out_cols)
