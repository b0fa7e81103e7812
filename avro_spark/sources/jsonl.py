"""JSON-Lines source/sink with Avro-schema-directed reading.

Training-data pipelines overwhelmingly ingest/emit JSONL; this wraps
Spark's native distributed JSON reader/writer (JVM-side parsing, splittable
when uncompressed, one task per file/split at 100 TB) with our Avro
``Schema`` as the column contract:

* ``read_jsonl`` — schema-first read: the Avro schema's ``StructType``
  is handed to the reader, so Spark never runs its sample-based schema
  inference pass (an extra full scan at scale) and the column types are
  exactly the contract, not a guess.
* ``write_jsonl`` — one JSON object per line, one file per partition
  (size via ``df.repartition(n)`` upstream, same discipline as the
  Avro OCF sink in :mod:`avro_spark.sources.avro_ocf`).

Malformed lines follow Spark's standard JSON-source modes: default
PERMISSIVE nulls the row (capture with ``columnNameOfCorruptRecord``),
``mode='FAILFAST'`` raises — the streaming analogue of the conform
operator's flag/raise modes (reference validate, frontend.lua:740-972).
"""

from __future__ import annotations

import threading
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..errors import AvroSparkError
from ..schema import Schema
from ..schema.nodes import Record


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Optional[Schema] = None,
    mode: str = "PERMISSIVE",
    corrupt_col: Optional[str] = None,
    avro_conventions: bool = False,
    binary_key: Optional[str] = "$binary",
) -> DataFrame:
    """Directory/glob of JSONL files → record-shaped DataFrame.

    With ``schema`` the read is schema-first (no inference scan); without
    it Spark infers (fine for exploration, avoid at scale).

    ``avro_conventions=True`` parses each line with
    :func:`avro_spark.operators.conform.parse_json_typed` instead of
    Spark's struct-shaped JSON reader — required when the data uses the
    AVRO value conventions: union values as single-entry maps
    ``{"int": 42}`` (which from_json cannot map onto the tagged union
    struct), field defaults for missing keys, and ``{"$binary": hex}``
    binary values (``binary_key`` defaults to ``"$binary"``, matching
    :func:`write_jsonl_avro`, so the default-args round trip is exact;
    pass ``binary_key=None`` to treat bytes/fixed values as plain JSON
    strings instead). Still a JVM-side narrow read (text source +
    VariantType projection, splittable when uncompressed).

    .. note:: BREAKING (round 3): ``binary_key`` previously defaulted to
       ``None``. Corpora whose bytes/fixed values are plain JSON strings
       must now pass ``binary_key=None`` explicitly; the new default
       requires the ``{"$binary": "<hex>"}`` form for bytes/fixed.
    """
    if avro_conventions:
        if schema is None:
            raise AvroSparkError("avro_conventions requires a schema")
        from pyspark.sql import functions as F

        from ..operators.conform import parse_json_typed

        lines = spark.read.text(path).withColumnRenamed("value", "_line")
        # the native JSON source skips whitespace-only lines — match it
        # (tab/CR included; trim() strips only spaces), or FAILFAST
        # aborts on them and corrupt_col fabricates phantom all-null rows
        lines = lines.where(~F.col("_line").rlike(r"^\s*$"))
        raw = F.col("_line")
        corrupt = raw.isNotNull() & F.try_parse_json(raw).isNull()
        if mode == "FAILFAST":
            # honor FAILFAST like the native JSON source: any malformed
            # line aborts the job
            guard = F.assert_true(
                ~corrupt, F.concat(F.lit("malformed JSON line: "), raw)
            )
            lines = lines.where(F.coalesce(guard.cast("boolean"), F.lit(True)))
        if corrupt_col is not None:
            lines = lines.withColumn(corrupt_col, F.when(corrupt, raw))
            return parse_json_typed(
                lines, "_line", schema, binary_key=binary_key,
                keep=(corrupt_col,),
            )
        return parse_json_typed(lines, "_line", schema, binary_key=binary_key)
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        if not isinstance(schema.root, Record):
            raise AvroSparkError("read_jsonl requires a record schema")
        struct = schema.to_struct_type()
        if corrupt_col is not None:
            from pyspark.sql import types as T

            struct = T.StructType(
                list(struct.fields) + [T.StructField(corrupt_col, T.StringType())]
            )
        reader = reader.schema(struct)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: Optional[str] = None) -> None:
    """Record-shaped DataFrame → one JSONL file per partition under ``path``."""
    writer = df.write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


# ------------------------------------------------- AVRO-convention JSON sink
# THREAD-LOCAL in-flight render budget: multi-threaded drivers can build
# two sinks concurrently, and a module slot would leak one build's reduced
# branching-recursion budget into the other (same fix as plans.flatten).
_RENDER_TLS = threading.local()  # .budget: int | None


def _render_depth_limit() -> int:
    """Recursion unroll bound for the sink. Inside a render build the
    budget comes from the ROOT schema via the SAME rule as the flatten
    plans (plans.flatten.unroll_budget_for: 2 levels inside the data
    type's own effective unroll, branching-aware); outside one it falls
    back to MAX_UNROLL, so raising that raises both."""
    b = getattr(_RENDER_TLS, "budget", None)
    if b is not None:
        return b
    from ..plans.flatten import MAX_UNROLL

    return MAX_UNROLL

def _j_frag(col) -> "Column":
    """Any scalar column → its JSON fragment text: wrap in a 1-element
    array, to_json, strip the brackets. Handles escaping, numbers and
    null uniformly (``["a\\"b"]`` → ``"a\\"b"``).

    Deviation (like -0.0 in conform._pj_node): non-finite doubles render
    as Spark's quoted strings ``"NaN"``/``"Infinity"`` — plain JSON has
    no token for them. The conventions reader coerces them back; strict
    Avro JSON tooling will see a string where a double is expected."""
    from pyspark.sql import functions as F

    s = F.to_json(F.array(col))
    return F.substring(s, 2, F.length(s) - 2)


def render_json_avro(node, col, binary_key: str = "$binary",
                     _seen: tuple = ()) -> "Column":
    """Schema-directed JSON TEXT rendering of one value column using the
    AVRO value conventions (the reference corpus's JSON↔MsgPack form,
    test/msgpack_helper.py): union values as ``null`` or the single-entry
    map ``{"<tag>": value}`` (frontend.lua:899-919 — BOTH simple [null,T]
    and general unions), bytes/fixed as ``{"$binary": "<HEX>"}``, enums as
    their symbol string. Pure column expressions — composes into
    :func:`write_jsonl_avro`'s whole-row renderer."""
    if not _seen and getattr(_RENDER_TLS, "budget", None) is None:
        # outermost: open the per-build depth budget (branching-aware —
        # same rule as plans.flatten._build_scope)
        from ..plans.flatten import unroll_budget_for

        _RENDER_TLS.budget = unroll_budget_for(node)
        try:
            return render_json_avro(node, col, binary_key, _seen)
        finally:
            _RENDER_TLS.budget = None
    from pyspark.sql import functions as F

    from ..schema.nodes import (
        Array, Enum, Fixed, Map, Primitive, Record, UnionNode,
    )
    from ..schema.spark_types import UNION_TAG, union_null_and_one

    if _seen.count(id(node)) >= _render_depth_limit():
        # recursive schemas unroll boundedly (per-node repetitions, NOT
        # total nesting, so deep non-recursive schemas are unaffected).
        # A value actually reaching the cut would be silently dropped —
        # fail the write loudly instead (sink contract)
        return F.when(col.isNull(), F.lit("null")).otherwise(
            F.raise_error(F.lit(
                "write_jsonl_avro: recursive data deeper than the unroll "
                f"bound ({_render_depth_limit()})"
            )).cast("string")
        )
    _seen = _seen + (id(node),)
    if isinstance(node, Primitive) or isinstance(node, Enum):
        if isinstance(node, Primitive) and node.type == "any":
            # 'any' columns hold JSON text (spark_types: StringType; the
            # conventions reader stores to_json(variant)) — inline it,
            # don't re-quote it as a string. parse_json both validates
            # (raises on non-JSON text, like the sink's other loud
            # failures) and canonicalizes.
            return F.when(col.isNull(), F.lit("null")).otherwise(
                F.to_json(F.parse_json(col))
            )
        if isinstance(node, Primitive) and node.type == "bytes":
            return F.when(
                col.isNull(), F.lit("null")
            ).otherwise(
                F.concat(F.lit('{"' + binary_key + '": "'),
                         F.upper(F.hex(col)), F.lit('"}'))
            )
        return _j_frag(col)
    if isinstance(node, Fixed):
        return F.when(col.isNull(), F.lit("null")).otherwise(
            F.concat(F.lit('{"' + binary_key + '": "'),
                     F.upper(F.hex(col)), F.lit('"}'))
        )
    if isinstance(node, Record):
        parts = [
            F.concat(
                F.lit(('' if i == 0 else ',') + _j_key(f.name) + ': '),
                render_json_avro(f.type, col.getField(f.name), binary_key, _seen),
            )
            for i, f in enumerate(node.fields)
        ]
        body = F.concat(F.lit("{"), *parts, F.lit("}"))
        return F.when(col.isNull(), F.lit("null")).otherwise(body)
    if isinstance(node, Array):
        inner = F.array_join(
            F.transform(col, lambda x: render_json_avro(node.items, x, binary_key, _seen)),
            ",",
        )
        return F.when(col.isNull(), F.lit("null")).otherwise(
            F.concat(F.lit("["), inner, F.lit("]"))
        )
    if isinstance(node, Map):
        entries = F.array_join(
            F.transform(
                F.map_entries(col),
                lambda e: F.concat(
                    _j_frag(e.getField("key")), F.lit(": "),
                    render_json_avro(node.values, e.getField("value"), binary_key, _seen),
                ),
            ),
            ",",
        )
        return F.when(col.isNull(), F.lit("null")).otherwise(
            F.concat(F.lit("{"), entries, F.lit("}"))
        )
    if isinstance(node, UnionNode):
        simple = union_null_and_one(node)
        if simple is not None:
            tag = next(
                node.branch_tag(i) for i, b in enumerate(node.branches)
                if not (isinstance(b, Primitive) and b.type == "null")
            )
            return F.when(col.isNull(), F.lit("null")).otherwise(
                F.concat(F.lit("{" + _j_key(tag) + ": "),
                         render_json_avro(simple, col, binary_key, _seen), F.lit("}"))
            )
        tag_c = col.getField(UNION_TAG)
        has_null = any(
            isinstance(b, Primitive) and b.type == "null"
            for b in node.branches
        )
        if has_null:
            out = F.lit("null")  # null branch / null cell
        else:
            # no branch of this union can represent null — fail loudly
            # instead of writing a line the schema can't read back
            out = F.when(
                col.isNull(),
                F.raise_error(F.lit(
                    "write_jsonl_avro: null value for union with no "
                    "null branch"
                )).cast("string"),
            ).otherwise(F.lit("null"))
        for i, b in enumerate(node.branches):
            if isinstance(b, Primitive) and b.type == "null":
                continue
            t = node.branch_tag(i)
            out = F.when(
                col.isNotNull() & (tag_c == i),
                F.concat(F.lit("{" + _j_key(t) + ": "),
                         render_json_avro(b, col.getField(t), binary_key, _seen),
                         F.lit("}")),
            ).otherwise(out)
        return out
    raise AvroSparkError(f"render_json_avro: unsupported node {node!r}")


def _j_key(name: str) -> str:
    import json as _json

    return _json.dumps(name)


def write_jsonl_avro(
    df: DataFrame,
    schema: Schema,
    path: str,
    binary_key: str = "$binary",
    compression: Optional[str] = None,
) -> None:
    """Record-shaped DataFrame → JSONL files in the AVRO value-convention
    form — the sink twin of ``read_jsonl(avro_conventions=True)``, so
    unions round-trip as ``{"<tag>": value}`` and bytes/fixed as
    ``{"$binary": hex}`` (forms Spark's native JSON writer cannot emit).
    Rendering is one narrow string-building projection; the write is the
    native distributed text sink."""
    from pyspark.sql import functions as F

    root = schema.root
    if not isinstance(root, Record):
        raise AvroSparkError("write_jsonl_avro requires a record schema")
    missing = [f.name for f in root.fields if f.name not in df.columns]
    if missing:
        raise AvroSparkError(f"write_jsonl_avro: missing columns {missing}")
    # open the render budget from the ROOT record: a branching-recursive
    # root reduces every field's unroll, matching the reduced depth the
    # root's to_struct_type gave the data columns
    from ..plans.flatten import unroll_budget_for

    _RENDER_TLS.budget = unroll_budget_for(root)
    try:
        parts = _render_parts(root, binary_key)
    finally:
        _RENDER_TLS.budget = None
    line = F.concat(F.lit("{"), *parts, F.lit("}"))
    writer = df.select(line.alias("value")).write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.text(path)


def _render_parts(root, binary_key):
    from pyspark.sql import functions as F

    return [
        F.concat(
            F.lit(('' if i == 0 else ',') + _j_key(f.name) + ': '),
            render_json_avro(f.type, F.col(f.name), binary_key),
        )
        for i, f in enumerate(root.fields)
    ]
