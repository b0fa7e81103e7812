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
    binary_key: Optional[str] = None,
) -> DataFrame:
    """Directory/glob of JSONL files → record-shaped DataFrame.

    With ``schema`` the read is schema-first (no inference scan); without
    it Spark infers (fine for exploration, avoid at scale).

    ``avro_conventions=True`` parses each line with
    :func:`avro_spark.operators.conform.parse_json_typed` instead of
    Spark's struct-shaped JSON reader — required when the data uses the
    AVRO value conventions: union values as single-entry maps
    ``{"int": 42}`` (which from_json cannot map onto the tagged union
    struct), field defaults for missing keys, and (with ``binary_key``)
    ``{"$binary": hex}`` binary values. Still a JVM-side narrow read
    (text source + VariantType projection, splittable when uncompressed).
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
