"""avro_spark — a PySpark-native schema-transformation and analytics engine.

Re-expresses, Spark-first, the capabilities of tarantool/avro-schema v2.2.1
(schema parse/validate, data validation with default filling, schema
evolution, flatten/unflatten/xflatten record⇄tuple transforms, Avro binary
codec), plus large-scale LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Public API surface (reference: avro_schema/init.lua:524-534):

=================  =====================================================
``create``         parse/validate/normalize an Avro schema → Schema (A1)
``validate``       data conformance + default fill, pure Python (A2)
``are_compatible`` writer/reader evolution check (A3)
``compile``        build flatten/unflatten/xflatten DataFrame plans (A4)
``get_names``      flat column names (A8)
``get_types``      flat column type labels (A8)
``export``         AST → plain Avro JSON form (A9)
``fingerprint``    Parsing-Canonical-Form digest (A10)
``is_schema``      handle predicate (A11)
=================  =====================================================

DataFrame-level operators live on the :class:`CompiledSchema` returned by
``compile`` and in :mod:`avro_spark.operators` / :mod:`avro_spark.functions`.
"""

from __future__ import annotations

from typing import Any, Optional

from .errors import (
    AvroSparkError,
    CompatibilityError,
    CompileError,
    DataValidationError,
    SchemaError,
)
from .schema import Schema, create, is_schema

__version__ = "0.1.0"

__all__ = [
    "AvroSparkError",
    "CompatibilityError",
    "CompileError",
    "DataValidationError",
    "Schema",
    "SchemaError",
    "are_compatible",
    "compile",
    "create",
    "export",
    "fingerprint",
    "get_names",
    "get_types",
    "infer_schema",
    "is_schema",
    "validate",
]


def validate(schema: Schema, data: Any) -> Any:
    """Check ``data`` against ``schema``; return normalized copy with
    defaults filled (A2)."""
    return schema.validate(data)


def infer_schema(source, name: str = "Record", coerce: bool = False) -> Schema:
    """Build a validated Schema from a DataFrame or StructType (the
    reverse of the §1.5 type mapping; beyond-reference convenience —
    the reference is schema-first with no inference). See
    :mod:`avro_spark.schema.infer` for the mapping and ``coerce``."""
    from .schema.infer import infer_schema as _infer

    return _infer(source, name=name, coerce=coerce)


def export(schema: Schema) -> Any:
    return schema.export()


def fingerprint(schema: Schema, algo: str = "sha256", size: int = 8) -> bytes:
    return schema.fingerprint(algo, size)


def get_names(schema: Schema, service_fields: tuple[str, ...] = ()) -> list[str]:
    return schema.get_names(service_fields)


def get_types(schema: Schema, service_fields: tuple[str, ...] = ()) -> list[str]:
    return schema.get_types(service_fields)


def are_compatible(writer: Schema, reader: Schema, opts: Optional[str] = None) -> bool:
    """Writer→reader evolution compatibility (A3). ``opts='downgrade'``
    reverses alias matching (init.lua:177-185).

    Returns a bool like the reference's ``ok[, err]`` — incompatibility is
    an answer, not an exception. The error detail is available by calling
    :func:`compile`, which raises :class:`CompatibilityError`."""
    from .plans.resolution import check_compatible

    try:
        return check_compatible(writer, reader, downgrade=(opts == "downgrade"))
    except CompatibilityError:
        return False


def compile(
    writer: Schema,
    reader: Optional[Schema] = None,
    downgrade: bool = False,
    service_fields: tuple[str, ...] = (),
    alpha_nullable_record_xflatten: bool = False,
):
    """Build the flatten/unflatten/xflatten DataFrame transform plans (A4).

    ``alpha_nullable_record_xflatten`` mirrors the reference's gate
    (init.lua:415, compiler.lua:978-994): xflatten of a nullable record is
    alpha-stage and errors unless the option is set."""
    from .plans.compiled import CompiledSchema

    return CompiledSchema(
        writer, reader, downgrade=downgrade, service_fields=tuple(service_fields),
        alpha_nullable_record_xflatten=alpha_nullable_record_xflatten,
    )
