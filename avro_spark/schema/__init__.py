"""Schema front end: parse/validate/export/fingerprint + Spark type mapping.

The :class:`Schema` handle is the analogue of the reference's opaque schema
handle (avro_schema/init.lua:24-34, 153-171): it owns the normalized AST plus
the create-options, and memoizes derived artifacts (Spark StructType, flat
layout, canonical form) the way the reference's dcache does
(frontend.lua:230-235).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import types as T

from ..errors import SchemaError
from . import fingerprint as _fp
from .export import export as _export
from .nodes import Record, SchemaNode
from .parser import SchemaParser, apply_auto_defaults
from .pyvalidate import validate as _validate

_VALID_OPTIONS = {
    "preserve_in_ast", "preserve_in_fingerprint", "forward_reference",
    "utf8_enums", "defaults",
}


class Schema:
    """Opaque schema handle: normalized AST + options + derived caches."""

    def __init__(self, root: SchemaNode, options: dict[str, Any]):
        self.root = root
        self.options = options
        self._spark_type: Optional[T.DataType] = None
        self._canonical: Optional[str] = None

    # ------------------------------------------------------------- derived
    def export(self) -> Any:
        """Plain Avro-JSON-able schema (A9)."""
        return _export(self.root)

    def export_json(self) -> str:
        return json.dumps(self.export())

    def canonical_form(self) -> str:
        if self._canonical is None:
            self._canonical = _fp.canonical_form(
                self.root, tuple(self.options.get("preserve_in_fingerprint", ()))
            )
        return self._canonical

    def fingerprint(self, algo: str = "sha256", size: int = 8) -> bytes:
        """Digest-prefix fingerprint over Parsing Canonical Form (A10).
        Attrs listed in the ``preserve_in_fingerprint`` create-option are
        included in the hashed form (fingerprint.lua:78-86)."""
        return _fp.fingerprint(
            self.root, algo, size,
            tuple(self.options.get("preserve_in_fingerprint", ())),
        )

    def to_spark_type(self, max_depth: int = 16) -> T.DataType:
        from .spark_types import to_spark_type

        if self._spark_type is None:
            self._spark_type = to_spark_type(self.root, max_depth=max_depth)
        return self._spark_type

    def to_struct_type(self, max_depth: int = 16) -> T.StructType:
        st = self.to_spark_type(max_depth)
        if not isinstance(st, T.StructType):
            raise SchemaError("top-level schema is not a record")
        return st

    # ----------------------------------------------------------- operators
    def validate(self, data: Any) -> Any:
        """Pure-Python data validation with default fill (A2, interpretive
        path — frontend.lua:740-972)."""
        return _validate(self.root, data)

    def get_names(self, service_fields: tuple[str, ...] = ()) -> list[str]:
        from ..plans.layout import get_names

        if not isinstance(self.root, Record):
            raise SchemaError("expected non-nullable record at the top level")
        return get_names(self.root, tuple(service_fields))

    def get_types(self, service_fields: tuple[str, ...] = ()) -> list[str]:
        from ..plans.layout import get_types

        if not isinstance(self.root, Record):
            raise SchemaError("expected non-nullable record at the top level")
        return get_types(self.root, tuple(service_fields))

    def __repr__(self) -> str:
        return f"Schema({self.root!r})"


def create(raw: Any, options: Optional[dict[str, Any]] = None) -> Schema:
    """Parse + validate + normalize an Avro schema (A1).

    Pythonic deviation: raises :class:`SchemaError` instead of the
    reference's ``ok, err`` pair (init.lua:153-171).
    """
    options = dict(options or {})
    unknown = set(options) - _VALID_OPTIONS
    if unknown:
        raise SchemaError(f"unknown options: {sorted(unknown)}")
    fp_extra = set(options.get("preserve_in_fingerprint", ()))
    if fp_extra - set(options.get("preserve_in_ast", ())):
        # fingerprint extras must already be kept in the AST
        # (api_tests/export.lua:212-218)
        raise SchemaError("fingerprint should contain only fields from AST")
    parser = SchemaParser(
        forward_reference=bool(options.get("forward_reference", False)),
        utf8_enums=bool(options.get("utf8_enums", False)),
        preserve_in_ast=tuple(options.get("preserve_in_ast", ())),
    )
    root = parser.parse(raw)
    if options.get("defaults") == "auto":
        apply_auto_defaults(root)
    return Schema(root, options)


def is_schema(x: Any) -> bool:
    """Schema-handle predicate (A11)."""
    return isinstance(x, Schema)
