"""AST → Spark SQL type mapping (SURVEY.md §1.5).

| Avro (reference)      | Spark                                             |
|-----------------------|---------------------------------------------------|
| null                  | NullType (only inside unions in practice)         |
| boolean               | BooleanType                                       |
| int                   | IntegerType                                       |
| long                  | LongType                                          |
| float                 | FloatType                                         |
| double                | DoubleType                                        |
| bytes / fixed         | BinaryType (+ size constraint metadata)           |
| string                | StringType                                        |
| enum                  | StringType + symbol list in metadata              |
| record                | StructType                                        |
| array / map           | ArrayType / MapType(string, V)                    |
| union [null, T]       | T with nullable=True                              |
| union (general)       | StructType(one nullable field per branch tag)     |
| ``*`` nullable ext    | nullable=True on the StructField                  |

Recursive schemas are unrolled to ``max_depth`` (Spark types are finite);
deeper data is a runtime error — documented deviation (SURVEY.md §7).
"""

from __future__ import annotations

from collections import OrderedDict
from pyspark.sql import types as T

from ..errors import SchemaError
from .nodes import (
    Array,
    Enum,
    Fixed,
    Map,
    Primitive,
    Record,
    SchemaNode,
    UnionNode,
)

#: Field name used for the branch-tag column of a general union.
UNION_TAG = "$type$"

_PRIM = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def is_null_branch(node: SchemaNode) -> bool:
    return isinstance(node, Primitive) and node.type == "null"


def union_null_and_one(node: UnionNode) -> SchemaNode | None:
    """If the union is [null, T] / [T, null] with T itself NON-nullable,
    return T, else None. Such "simple" unions collapse to a plain
    nullable column. A nullable T (``[null, "int*"]``) must NOT collapse:
    the null branch and a null payload on the T* branch are distinct
    values (the reference's flat form keeps the [tag, value] pair,
    compiler.lua:697-750), and a collapsed column cannot tell them
    apart — round-tripping would silently re-tag {int: null} as the
    null branch. Those stay general (tagged-struct) unions."""
    non_null = [b for b in node.branches if not is_null_branch(b)]
    if len(non_null) == 1 and len(node.branches) == 2 and not non_null[0].nullable:
        return non_null[0]
    return None


#: Arrow IPC refuses batches nested deeper than 64 levels
#: (``max_recursion_depth`` in the C++ reader), and Python-engine codec
#: stages ship rows over Arrow IPC — a deeper unrolled type would build a
#: fine plan and then kill the worker mid-job (``ArrowInvalid: Max
#: recursion depth reached``). 60 leaves headroom for the wrapper levels
#: the transport itself adds.
ARROW_MAX_NESTING = 60


def spark_type_depth(dtype: T.DataType) -> int:
    """Nesting depth of a Spark type as Arrow IPC counts it: struct and
    list are one level each; map is two (Arrow renders map<K,V> as
    list<struct<key,value>>)."""
    if isinstance(dtype, T.StructType):
        return 1 + max(
            (spark_type_depth(f.dataType) for f in dtype.fields), default=0
        )
    if isinstance(dtype, T.ArrayType):
        return 1 + spark_type_depth(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return 2 + max(
            spark_type_depth(dtype.keyType), spark_type_depth(dtype.valueType)
        )
    return 0


def check_arrow_nesting(dtype: T.DataType, context: str) -> None:
    """Raise loudly at PLAN-BUILD time when an unrolled Spark type is too
    deep to cross an Arrow IPC boundary — the engine's rule is "reject
    loudly, never die in a worker" (round-3 recursion hardening, applied
    here to the Arrow transport limit)."""
    depth = spark_type_depth(dtype)
    if depth > ARROW_MAX_NESTING:
        raise SchemaError(
            f"{context}: the unrolled Spark type is {depth} levels deep, "
            f"past Arrow IPC's recursion limit ({ARROW_MAX_NESTING} after "
            "transport headroom) — the Python engine cannot ship these rows. "
            "Lower the unroll depth (Schema.to_spark_type(max_depth=...)), "
            "restructure the recursive schema, or use the JVM engine "
            "(engine='jvm'), which does not cross Arrow."
        )


#: Subtree-copy budget for schemas with BRANCHING recursion: the unroll
#: depth is chosen so (multiplicity)^depth stays at or under this many
#: copies of the cycle. Chains (multiplicity 1) keep full depth.
UNROLL_WIDTH_TARGET = 64

# id(node) -> (node ref pinning the id, multiplicity): computing the SCC
# decomposition per outermost call would make plan builds quadratic.
# BOUNDED (LRU): an unbounded memo pins every schema root a long-lived
# driver ever compiles — a slow leak. 1024 roots is far more live schemas
# than any driver holds at once; eviction only costs a recompute.
_MULT_CACHE: "OrderedDict" = OrderedDict()
_MULT_CACHE_MAX = 1024


def _node_children(n: SchemaNode) -> list:
    if isinstance(n, Record):
        return [f.type for f in n.fields]
    if isinstance(n, Array):
        return [n.items]
    if isinstance(n, Map):
        return [n.values]
    if isinstance(n, UnionNode):
        return list(n.branches)
    return []


def cycle_multiplicity(node: SchemaNode) -> int:
    """How many independent cycles the schema graph's worst strongly-
    connected component carries: 0 = acyclic, 1 = chain recursion (every
    cyclic SCC is one simple cycle — linear unroll), >= 2 = branching
    recursion (unroll width grows as multiplicity^depth).

    An SCC with N nodes and E internal edge SITES (a record with two
    fields of the same type contributes two edges) is a single simple
    cycle iff E == N; its cyclomatic number E - N + 1 counts the
    independent cycles. This catches both multiple back-edge sites AND
    diamond-amplified cycles (P -> Q twice, Q -> P: E=3, N=2), which a
    naive back-edge count misses."""
    hit = _MULT_CACHE.get(id(node))
    if hit is not None and hit[0] is node:
        _MULT_CACHE.move_to_end(id(node))
        return hit[1]
    # iterative Tarjan SCC over the id graph
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    sccs: list = []
    objs: dict = {id(node): node}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            n, pi = work[-1]
            nid = id(n)
            if pi == 0:
                index[nid] = low[nid] = counter[0]
                counter[0] += 1
                stack.append(nid)
                on_stack.add(nid)
            kids = _node_children(n)
            advanced = False
            for i in range(pi, len(kids)):
                c = kids[i]
                cid = id(c)
                objs[cid] = c
                if cid not in index:
                    work[-1] = (n, i + 1)
                    work.append((c, 0))
                    advanced = True
                    break
                if cid in on_stack:
                    low[nid] = min(low[nid], index[cid])
            if advanced:
                continue
            work.pop()
            if work:
                pid = id(work[-1][0])
                low[pid] = min(low[pid], low[nid])
            if low[nid] == index[nid]:
                comp = set()
                while True:
                    m = stack.pop()
                    on_stack.discard(m)
                    comp.add(m)
                    if m == nid:
                        break
                sccs.append(comp)

    strongconnect(node)
    worst = 0
    for comp in sccs:
        edges = 0
        cyclic = len(comp) > 1
        for nid in comp:
            for c in _node_children(objs[nid]):
                if id(c) in comp:
                    edges += 1
                    if id(c) == nid:
                        cyclic = True
        if cyclic and len(comp) >= 1 and edges >= len(comp):
            worst = max(worst, edges - len(comp) + 1)
    _MULT_CACHE[id(node)] = (node, worst)
    while len(_MULT_CACHE) > _MULT_CACHE_MAX:
        _MULT_CACHE.popitem(last=False)
    return worst


def effective_unroll_depth(node: SchemaNode, max_depth: int) -> int:
    """max_depth for acyclic or chain recursion (multiplicity <= 1);
    for branching recursion, the largest depth keeping
    multiplicity^depth <= UNROLL_WIDTH_TARGET (>= 2)."""
    import math

    mult = cycle_multiplicity(node)
    if mult <= 1:
        return max_depth
    return min(max_depth, max(2, int(math.log(UNROLL_WIDTH_TARGET, mult))))


def to_spark_type(node: SchemaNode, max_depth: int = 16, _seen: tuple = ()) -> T.DataType:
    """Spark type for a schema node. Recursive schemas (cyclic AST graphs)
    are unrolled: a node revisited ``max_depth`` times on one path is cut to
    ``NullType`` — data deeper than the unroll cannot cross the typed
    DataFrame boundary (documented deviation, SURVEY.md §7). For schemas
    with branching recursion the depth drops to BRANCHING_TYPE_DEPTH.

    NOTE: the cut is strictly per-path (never a global width budget) so
    the type is a deterministic function of (node, max_depth) — the plan
    lowering in plans/flatten.py relies on the type covering every field
    its own smaller-budget expression can reference; a traversal-order-
    dependent cut here would break that containment."""
    if not _seen:
        max_depth = effective_unroll_depth(node, max_depth)
    if _seen.count(id(node)) >= max_depth:
        return T.NullType()
    _seen = _seen + (id(node),)
    if isinstance(node, Primitive):
        if node.type == "any":
            return T.StringType()  # 'any' not compilable in reference either
        return _PRIM[node.type]
    if isinstance(node, Enum):
        return T.StringType()
    if isinstance(node, Fixed):
        return T.BinaryType()
    if isinstance(node, Array):
        return T.ArrayType(to_spark_type(node.items, max_depth, _seen), True)
    if isinstance(node, Map):
        return T.MapType(T.StringType(), to_spark_type(node.values, max_depth, _seen), True)
    if isinstance(node, Record):
        return T.StructType([
            T.StructField(
                f.name,
                to_spark_type(f.type, max_depth, _seen),
                nullable=_field_nullable(f.type),
                metadata=_field_metadata(f.type),
            )
            for f in node.fields
        ])
    if isinstance(node, UnionNode):
        t = union_null_and_one(node)
        if t is not None:
            return to_spark_type(t, max_depth, _seen)
        fields = [T.StructField(UNION_TAG, T.IntegerType(), True)]
        for i, b in enumerate(node.branches):
            if is_null_branch(b):
                continue
            fields.append(
                T.StructField(
                    node.branch_tag(i), to_spark_type(b, max_depth, _seen), True
                )
            )
        return T.StructType(fields)
    raise SchemaError(f"no Spark mapping for {node!r}")


def _field_nullable(node: SchemaNode) -> bool:
    if node.nullable:
        return True
    if isinstance(node, UnionNode):
        return any(is_null_branch(b) for b in node.branches)
    if is_null_branch(node):
        return True
    return False


def _field_metadata(node: SchemaNode) -> dict:
    md: dict = {}
    if isinstance(node, UnionNode):
        simple = union_null_and_one(node)
        if simple is not None:
            # [null, enum]/[null, fixed] columns carry the branch's
            # metadata — the same schema spelled enum* would
            node = simple
    if isinstance(node, Enum):
        md["avro.enum.symbols"] = list(node.symbols)
        md["avro.enum.name"] = node.fullname
    elif isinstance(node, Fixed):
        md["avro.fixed.size"] = node.size
        md["avro.fixed.name"] = node.fullname
    elif isinstance(node, UnionNode) and union_null_and_one(node) is None:
        md["avro.union.tags"] = [node.branch_tag(i) for i in range(len(node.branches))]
    return md
