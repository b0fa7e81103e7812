"""Error-message parity gate over the DDT corpus (create/validate stages).

The full sweep (all stages incl. Spark-executed runtime errors) is
``tools/error_text_sweep.py --update`` → ERRORS.md. This test pins the
pure-Python stages, which need no Spark session and run in seconds:

* every extractable ``create_error`` / ``validate_error`` case must raise,
* and the rendered message must CONTAIN the reference's expected string
  verbatim (path prefix + wording) — frontend.lua:550-610 / 941-962 parity.

A small allowlist covers cases whose Lua-specific value rendering cannot be
reproduced from JSON input (documented in ERRORS.md).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

import avro_spark as avs
from ddt_extract import extract_file
from ddt_helpers import parse_payload

DDT_DIR = "/root/reference/test/ddt_suite"

# cases where the reference interpolates a Lua-runtime rendering our JSON
# replay cannot reproduce (e.g. cdata ctype names); they must still RAISE,
# only the wording is exempt
WORDING_EXEMPT: set[str] = {
    # tostring(ctype) / cdata-specific renderings would go here
}


def _cases(keys):
    out = []
    for fname in sorted(os.listdir(DDT_DIR)):
        if not fname.endswith(".lua"):
            continue
        for c in extract_file(os.path.join(DDT_DIR, fname)).cases:
            if any(k in c.fields for k in keys):
                out.append(pytest.param(c, id=f"{fname}:{c.line}"))
    return out


def _schemas(fields):
    return [fields[k] for k in ("schema", "schema1", "schema2") if k in fields]


def _create(raw):
    return avs.create(json.loads(raw) if isinstance(raw, str) else raw)


@pytest.mark.parametrize("case", _cases(("create_error",)))
def test_create_error_text(case):
    f = case.fields
    exp = f["create_error"]
    cid = f"{os.path.basename(case.file)}:{case.line}"
    with pytest.raises(Exception) as ei:
        for r in _schemas(f):
            _create(r)
    if cid not in WORDING_EXEMPT:
        assert exp in str(ei.value), (exp, str(ei.value))


@pytest.mark.parametrize("case", _cases(("validate_error",)))
def test_validate_error_text(case):
    f = case.fields
    exp = f["validate_error"]
    cid = f"{os.path.basename(case.file)}:{case.line}"
    schemas = [_create(r) for r in _schemas(f)]
    data, _ = parse_payload(f["validate"])
    with pytest.raises(Exception) as ei:
        avs.validate(schemas[0], data)
    if cid not in WORDING_EXEMPT:
        assert exp in str(ei.value), (exp, str(ei.value))
