"""Sweep every DDT error expectation against this engine's rendering.

For each extractable ``t{...}`` case in the reference corpus that expects an
error (``create_error`` / ``validate_error`` / ``compile_error`` / runtime
``error``), run the corresponding stage here, capture the actual exception
text, and classify:

* ``exact``    — our message string-equals the reference's expected string
* ``category`` — we reject with the same error *category* + path info but
                 different wording (documented deviation, SURVEY.md §7)
* ``accept``   — case expects an error and we raise one, but the mapping is
                 at the typed-boundary (Unconvertible) rather than a rendered
                 engine message
* ``MISS``     — we do NOT raise where the reference does (a real divergence)

Usage: python tools/error_text_sweep.py [--update]
  --update rewrites ERRORS.md with the full mapping table.

Reference error renderers: frontend.lua:550-610 (schema), 941-962 (data),
runtime.lua:263-336 + pipeline.c:902-965 (runtime categories).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import avro_spark as avs
from ddt_extract import extract_file

DDT_DIR = "/root/reference/test/ddt_suite"

ERROR_KEYS = ("create_error", "validate_error", "compile_error", "error")


def _schemas(fields):
    return [fields[k] for k in ("schema", "schema1", "schema2") if k in fields]


def _create(raw):
    return avs.create(json.loads(raw) if isinstance(raw, str) else raw)


def classify(case, spark):
    """Return (kind, expected, actual) for one error-expecting case."""
    sys.path.insert(0, "/root/repo/tests")
    from ddt_helpers import (
        Unconvertible, parse_payload, to_row_value, flat_input_row,
        flat_struct_type, partial_row_and_type,
    )
    from avro_spark.plans.layout import build_layout
    from avro_spark.schema.nodes import Record

    f = case.fields
    raws = _schemas(f)
    if not raws:
        return ("skip", None, None)

    if "create_error" in f:
        exp = f["create_error"]
        try:
            for r in raws:
                _create(r)
        except Exception as e:
            return ("ok", exp, str(e))
        return ("MISS", exp, "<no error raised>")

    try:
        schemas = [_create(r) for r in raws]
    except Exception as e:
        return ("MISS", f.get(next(k for k in ERROR_KEYS if k in f)),
                f"create unexpectedly failed: {e}")

    if "validate_error" in f:
        exp = f["validate_error"]
        data, _ = parse_payload(f["validate"])
        try:
            avs.validate(schemas[0], data)
        except Exception as e:
            return ("ok", exp, str(e))
        return ("MISS", exp, "<no error raised>")

    service = tuple(f.get("service_fields", ()))
    downgrade = bool(f.get("compile_downgrade", False))

    if "compile_error" in f:
        exp = f["compile_error"]
        try:
            c = avs.compile(
                schemas[0], schemas[1] if len(schemas) > 1 else None,
                downgrade=downgrade, service_fields=service,
                alpha_nullable_record_xflatten=True,
            )
            df = spark.createDataFrame([], c.writer.to_struct_type())
            c.flatten(df, service_values=[None] * len(c.service_fields)).collect()
        except Exception as e:
            return ("ok", exp, str(e))
        return ("MISS", exp, "<no error raised>")

    if "error" not in f or "func" not in f:
        return ("skip", None, None)
    exp = f["error"]
    func = f["func"]
    inputs = f["input"] if isinstance(f["input"], list) else [f["input"]]
    try:
        c = avs.compile(
            schemas[0], schemas[1] if len(schemas) > 1 else None,
            downgrade=downgrade, service_fields=service,
            alpha_nullable_record_xflatten=True,
        )
    except Exception as e:
        return ("ok", exp, f"(at compile) {e}")
    data, f32 = parse_payload(inputs[0])
    if func == "flatten" and f32 and isinstance(data, float) and c.wrapped_root:
        # `! x.y` = a float32-encoded MsgPack scalar; in Spark that value
        # exists only as a typed FloatType column — bind it as one and
        # let the engine's bind-time check render the type error
        from pyspark.sql.types import FloatType, StructField, StructType

        try:
            df = spark.createDataFrame(
                [(data,)], StructType([StructField("v", FloatType())])
            )
            c.flatten(df).collect()
        except Exception as e:
            return ("ok", exp, str(e))
        return ("MISS", exp, "<no error raised>")
    try:
        if func == "flatten":
            root = c.writer.root
            row = (to_row_value(root.fields[0].type, data),) if c.wrapped_root \
                else to_row_value(root, data)
            try:
                df = spark.createDataFrame([row], c.writer.to_struct_type())
            except Exception as e:
                # the typed column itself rejected the value (e.g. int32
                # overflow at createDataFrame); the dynamic JSON-ingest
                # path may still render the reference message exactly
                alt = _try_conform_json(spark, c, func, inputs[0], service)
                if alt is not None and exp in alt:
                    return ("ok", exp, alt)
                return ("boundary", exp, f"typed boundary: {e}")
            sv = []
            for t, v in zip(service, list(inputs[1:])):
                if t == "bytes" and isinstance(v, str):
                    sv.append(v.encode("utf-8"))
                elif isinstance(v, str) and t != "string":
                    sv.append(parse_payload(v)[0])
                else:
                    sv.append(v)
            c.flatten(df, service_values=sv).collect()
        elif func == "unflatten":
            cells = build_layout(c.writer.root, service)
            row = flat_input_row(cells, data)
            df = spark.createDataFrame([row], flat_struct_type(cells))
            c.unflatten(df).collect()
        elif func == "xflatten":
            root = c.writer.root
            if c.wrapped_root:
                root = root.fields[0].type
            if not isinstance(root, Record) or not isinstance(data, dict):
                return ("boundary", exp, "<shape rejected>")
            row, st = partial_row_and_type(root, data)
            df = spark.createDataFrame([row], st)
            c.xflatten_typed(df).collect()
        else:
            return ("skip", None, None)
    except Unconvertible as e:
        alt = _try_conform_json(spark, c, func, inputs[0], service)
        if alt is not None and exp in alt:
            # the engine's dynamic JSON-ingest path renders this case's
            # reference message exactly; report that path's behavior
            return ("ok", exp, alt)
        return ("boundary", exp, f"Unconvertible: {e}"
                + (f" | conform_json: {alt}" if alt else ""))
    except Exception as e:
        return ("ok", exp, str(e))
    return ("MISS", exp, "<no error raised>")


def _try_conform_json(spark, c, func, raw_input, service):
    """Replay a boundary-rejected input through the engine's dynamic
    JSON-ingest validators — conform_json (record form, flatten) or
    conform_json_tuple (flat-array form, unflatten) — the paths a real
    user takes for data that cannot enter typed columns. Returns the
    first rendered error, or None."""
    from avro_spark.operators.conform import (
        ERRORS_COL, conform_json, conform_json_tuple,
    )

    if func == "unflatten":
        raw = raw_input if isinstance(raw_input, str) else json.dumps(raw_input)
        raw = raw.strip()
        if raw.startswith("!"):
            raw = raw[1:].strip()
        try:
            jdf = spark.createDataFrame([(raw,)], "j string")
            errs = conform_json_tuple(
                jdf, "j", c, mode="flag", binary_key="$binary"
            ).collect()[0][ERRORS_COL]
            return errs[0] if errs else None
        except Exception as e:
            if "stopped SparkContext" in str(e):
                raise
            print(f"tuple replay failed: {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            return None
    if func != "flatten" or service:
        return None

    raw = raw_input if isinstance(raw_input, str) else json.dumps(raw_input)
    raw = raw.strip()
    if raw.startswith("!"):
        raw = raw[1:].strip()  # float32 marker, not part of the JSON
    from types import SimpleNamespace

    sch = c.writer
    if c.wrapped_root:
        # scalar-rooted schema: validate the bare value against the root
        # node (conform_json only reads .root)
        sch = SimpleNamespace(root=c.writer.root.fields[0].type)
    try:
        jdf = spark.createDataFrame([(raw,)], "j string")
        errs = conform_json(jdf, "j", sch, mode="flag",
                            binary_key="$binary",
                            resolution=c.plan).collect()[0][ERRORS_COL]
        return errs[0] if errs else None
    except Exception as e:
        if "stopped SparkContext" in str(e):
            raise
        print(f"json replay failed: {type(e).__name__}: {str(e)[:160]}",
              file=sys.stderr)
        return None


def grade(kind, exp, act):
    if kind in ("skip",):
        return kind
    if kind == "MISS":
        return "MISS"
    if act is None:
        return kind
    if exp == act or (exp and exp in act):
        return "exact"
    if kind == "boundary":
        return "accept"
    return "category"


def _new_session(old=None):
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    if old is not None:
        # getOrCreate() can hand back a session bound to a stopped context;
        # clear the singletons so a genuinely fresh context is built
        try:
            old.stop()
        except Exception:
            pass
        SparkContext._active_spark_context = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
    return (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("error-sweep").getOrCreate()
    )


def main():
    update = "--update" in sys.argv
    spark = _new_session()
    rows = []
    done = 0
    for fname in sorted(os.listdir(DDT_DIR)):
        if not fname.endswith(".lua"):
            continue
        res = extract_file(os.path.join(DDT_DIR, fname))
        for c in res.cases:
            if not any(k in c.fields for k in ERROR_KEYS):
                continue
            # a long sweep accumulates thousands of codegen'd plans in one
            # JVM; recycle the session periodically and on a dead context
            if done and done % 60 == 0:
                spark = _new_session(old=spark)
            try:
                kind, exp, act = classify(c, spark)
                if isinstance(act, str) and "stopped SparkContext" in act:
                    raise RuntimeError(act)
            except Exception as e:
                if "stopped SparkContext" in str(e):
                    spark = _new_session(old=spark)
                    try:
                        kind, exp, act = classify(c, spark)
                    except Exception as e2:
                        kind, exp, act = ("HARNESS", "?", f"{type(e2).__name__}: {e2}")
                else:  # harness bug, surface loudly
                    kind, exp, act = ("HARNESS", "?", f"{type(e).__name__}: {e}")
            done += 1
            if kind == "skip":
                continue
            key = next(k for k in ERROR_KEYS if k in c.fields)
            rows.append((fname, c.line, key, grade(kind, exp, act), exp, act))

    counts = Counter(r[3] for r in rows)
    total = len(rows)
    print(f"{total} error cases: {dict(counts)}")
    for fname, line, key, g, exp, act in rows:
        if g in ("MISS", "HARNESS"):
            print(f"  {g} {fname}:{line} [{key}]")
            print(f"    expected: {exp!r}")
            print(f"    actual:   {act!r}")

    if update:
        with open("/root/repo/ERRORS.md", "w") as fh:
            fh.write(_render_md(rows, counts, total))
        print("wrote ERRORS.md")
    return 1 if counts.get("MISS") or counts.get("HARNESS") else 0


def _render_md(rows, counts, total):
    lines = [
        "# ERRORS — reference error-message mapping (DDT sweep)",
        "",
        "Generated by `python tools/error_text_sweep.py --update`. Every",
        "declaratively-extractable DDT case with an error expectation is",
        "replayed through this engine and classified:",
        "",
        "* **exact** — our message contains the reference's expected string",
        "  verbatim.",
        "* **category** — we reject the same input at the same stage with the",
        "  same path info, different wording (documented deviation per",
        "  SURVEY.md §7 'error-message parity').",
        "* **accept** — rejected at the typed boundary (the value cannot be",
        "  represented in the typed column at all — equivalent to the",
        "  reference's type error, no message to compare).",
        "",
        f"Totals: {total} cases — "
        + ", ".join(f"{k}: {v}" for k, v in sorted(counts.items())),
        "",
        "No silent divergences: a case where we fail to error at all would be",
        "listed as MISS and fails `tests/test_error_sweep.py`.",
        "",
        "| bundle:line | stage | class | reference message | our message |",
        "|---|---|---|---|---|",
    ]
    def esc(s):
        s = str(s).replace("|", "\\|").replace("\n", " ")
        return s if len(s) <= 110 else s[:107] + "..."
    for fname, line, key, g, exp, act in rows:
        lines.append(f"| {fname}:{line} | {key} | {g} | {esc(exp)} | {esc(act)} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    sys.exit(main())
