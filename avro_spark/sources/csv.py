"""CSV source/sink with Avro-schema-directed reading.

Same contract shape as :mod:`avro_spark.sources.jsonl`: the Avro
``Schema``'s ``StructType`` is the column contract handed to Spark's
native distributed CSV reader — no sample-based inference scan, exact
types. CSV carries no nesting, so only flat record schemas (primitive /
nullable-primitive fields) are accepted; flatten nested data first
(``CompiledSchema.flatten``) — that ordering IS the reference's
record→tuple direction, so "flatten, then CSV" is the natural export
path for tuple-shaped interchange.

Malformed rows follow Spark's CSV modes: PERMISSIVE (default) nulls bad
cells, ``mode='FAILFAST'`` raises, ``corrupt_col`` captures raw lines —
mirroring the conform operator's flag/raise error surface.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..errors import AvroSparkError
from ..schema import Schema
from ..schema.nodes import Enum, Primitive, Record


def _require_flat_record(schema: Schema) -> None:
    root = schema.root
    if not isinstance(root, Record):
        raise AvroSparkError("CSV source requires a record schema")
    for f in root.fields:
        node = f.type
        from ..schema.nodes import UnionNode
        from ..schema.spark_types import union_null_and_one

        if isinstance(node, UnionNode):
            simple = union_null_and_one(node)
            if simple is None:
                raise AvroSparkError(
                    f"CSV cannot carry general union field {f.name!r}; "
                    "flatten to tuple columns first"
                )
            node = simple
        if isinstance(node, Enum):
            continue  # enums are string-typed — CSV carries them fine
        if not isinstance(node, Primitive):
            raise AvroSparkError(
                f"CSV cannot carry {type(node).__name__.lower()} field "
                f"{f.name!r} — no flat text form; flatten first"
            )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Schema,
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: Optional[str] = None,
    **options: str,
) -> DataFrame:
    """Directory/glob of CSV files → flat record DataFrame, schema-first
    (no inference scan; splittable when uncompressed — scales like any
    file scan)."""
    _require_flat_record(schema)
    reader = (
        spark.read.option("header", str(header).lower()).option("mode", mode)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    struct = schema.to_struct_type()
    if corrupt_col is not None:
        from pyspark.sql import types as T

        struct = T.StructType(
            list(struct.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(struct).csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, **options: str
) -> None:
    """Flat DataFrame → one CSV file per partition under ``path`` (size
    files via ``df.repartition(n)`` upstream)."""
    writer = df.write.option("header", str(header).lower()).mode("overwrite")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)
