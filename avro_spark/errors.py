"""Error model for avro_spark.

The reference engine (tarantool/avro-schema) renders every schema and data
error as ``<path>: <message>`` where path is the slash-joined location inside
the schema or datum (reference: avro_schema/frontend.lua:550-610 for schema
errors, frontend.lua:941-962 for data errors, runtime.lua:263-336 for the
runtime error categories). We reproduce the *category + path* semantics; exact
wording may differ (documented deviation, SURVEY.md §7).
"""

from __future__ import annotations


class AvroSparkError(Exception):
    """Base class for all engine errors."""


class SchemaError(AvroSparkError):
    """Schema parse/validation error (reference: frontend.lua copy_schema_error_*)."""

    def __init__(self, msg: str, path: tuple[str, ...] = ()):
        self.path = tuple(path)
        self.msg = msg
        super().__init__(f"{'/'.join(self.path)}: {msg}" if self.path else msg)


class DataValidationError(AvroSparkError):
    """Data does not conform to schema (reference: frontend.lua:941-962)."""

    def __init__(self, msg: str, path: tuple[str, ...] = ()):
        self.path = tuple(str(p) for p in path)
        self.msg = msg
        super().__init__(f"{'/'.join(self.path)}: {msg}" if self.path else msg)


class CompatibilityError(AvroSparkError):
    """Writer and reader schemas cannot be resolved (reference: frontend.lua:1042-1280)."""


class CompileError(AvroSparkError):
    """Transform plan construction failed (reference: compiler.lua)."""
