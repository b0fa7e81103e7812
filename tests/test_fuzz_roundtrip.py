"""Schema-driven roundtrip fuzzing — the DDT corpus generalized.

Random schemas (records over primitives/enums/fixed/arrays/maps/unions,
nullable variants, nesting ≤ 3) with random conforming data, asserting
the engine's core invariants:

* ``validate`` accepts conforming data and is idempotent
* Avro binary codec: encode∘decode∘encode is byte-identical
* Spark ``flatten`` ∘ ``unflatten`` = identity on the validated value

Float values are pre-rounded through float32 so fidelity comparisons are
exact (SURVEY §7 "Float32 fidelity"); NaN/Inf excluded here (covered by
targeted tests).
"""

from __future__ import annotations

import struct as _struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import avro_spark as avs
from avro_spark.sources.avro_binary import decode_record, encode_record
from ddt_helpers import to_row_value


def _deep_eq(a, b) -> bool:
    """Native-value deep equality: bytes-like normalized, Rows compared
    positionally as tuples, floats exact (values are pre-f32-rounded)."""
    from pyspark.sql import Row

    if isinstance(a, (bytes, bytearray, memoryview)) or isinstance(
        b, (bytes, bytearray, memoryview)
    ):
        return (
            isinstance(a, (bytes, bytearray, memoryview))
            and isinstance(b, (bytes, bytearray, memoryview))
            and bytes(a) == bytes(b)
        )
    if isinstance(a, Row) or isinstance(b, Row):
        ta = tuple(a) if isinstance(a, Row) else a
        tb = tuple(b) if isinstance(b, Row) else b
        return _deep_eq(ta, tb)
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_deep_eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b

_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA0), max_size=12
)


def _f32(x: float) -> float:
    return _struct.unpack("<f", _struct.pack("<f", x))[0]


def _ddt_form(v):
    """Native value → the DDT JSON convention to_row_value expects
    (bytes rendered as {"$binary": hex})."""
    if isinstance(v, (bytes, bytearray, memoryview)):
        return {"$binary": bytes(v).hex()}
    if isinstance(v, dict):
        return {k: _ddt_form(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_ddt_form(x) for x in v]
    return v


class _Gen:
    """Coupled (schema, value-strategy) generator with a depth budget.

    ``recursion=True`` additionally emits back-references to enclosing
    record names, always under terminable indirection (``[null, R]``
    unions or ``array``-of-R items — frontend.lua:369-389's legal
    recursion forms); value generation spends ``rec_budget`` levels
    before every cycle terminates (null branch / empty array)."""

    def __init__(self, draw, recursion: bool = False):
        self.draw = draw
        self.n_named = 0
        self.recursion = recursion
        self.rec_names: list = []   # enclosing (in-construction) records
        self.rec_defs: dict = {}    # name -> completed schema dict
        self.rec_budget = 3

    def name(self, prefix: str) -> str:
        self.n_named += 1
        return f"{prefix}{self.n_named}"

    def schema(self, depth: int):
        kinds = ["int", "long", "boolean", "string", "double", "float", "bytes",
                 "enum", "fixed"]
        if depth > 0:
            kinds += ["array", "map", "union", "record"]
        if self.recursion and self.rec_names:
            kinds += ["recur", "recur"]  # weighted: back-edges are the point
        kind = self.draw(st.sampled_from(kinds))
        if kind == "recur":
            ref = self.draw(st.sampled_from(self.rec_names))
            if self.draw(st.booleans()):
                return ["null", ref]          # linked-list shape
            return {"type": "array", "items": ref}  # tree shape
        nullable = self.draw(st.booleans())
        if kind in ("int", "long", "boolean", "string", "double", "float", "bytes"):
            return f"{kind}*" if nullable else kind
        if kind == "enum":
            n = self.draw(st.integers(1, 4))
            return {
                "type": "enum*" if nullable else "enum",
                "name": self.name("E"),
                "symbols": [f"S{i}" for i in range(n)],
            }
        if kind == "fixed":
            return {
                "type": "fixed*" if nullable else "fixed",
                "name": self.name("X"),
                "size": self.draw(st.integers(1, 5)),
            }
        if kind == "array":
            return {
                "type": "array*" if nullable else "array",
                "items": self.schema(depth - 1),
            }
        if kind == "map":
            return {
                "type": "map*" if nullable else "map",
                "values": self.schema(depth - 1),
            }
        if kind == "union":
            # unions: unique-by-tag branches, no immediate nesting, not
            # nullable themselves; optional null branch first. Branches
            # may be NULLABLE ("int*") — the round-4 JVM-codec scope —
            # tag uniqueness holds because the base names are unique.
            branches = []
            if self.draw(st.booleans()):
                branches.append("null")
            prim = self.draw(
                st.lists(
                    st.sampled_from(["int", "string", "double", "boolean", "bytes"]),
                    min_size=1, max_size=3, unique=True,
                )
            )
            branches.extend(
                f"{p}*" if self.draw(st.booleans()) else p for p in prim
            )
            return branches
        n_fields = self.draw(st.integers(1, 4))
        rname = self.name("R")
        self.rec_names.append(rname)
        try:
            rec = {
                "type": "record*" if nullable else "record",
                "name": rname,
                "fields": [
                    {"name": f"f{i}", "type": self.schema(depth - 1)}
                    for i in range(n_fields)
                ],
            }
        finally:
            self.rec_names.pop()
        self.rec_defs[rname] = rec
        return rec

    def rec_value(self, name: str):
        """Value for a bare back-edge reference: always the NON-nullable
        record variant (the ref name carries no '*'), even when the
        definition site was spelled 'record*'."""
        node = self.rec_defs[name]
        return {f["name"]: self.value(f["type"]) for f in node["fields"]}

    # ---- conforming values --------------------------------------------
    def value(self, node):
        """Value for a schema dict/str as written (pre-create form)."""
        if isinstance(node, str):
            base = node.rstrip("*")
            if node.endswith("*") and self.draw(st.booleans()):
                return None
            return self.prim(base)
        if isinstance(node, list):  # union
            branch = self.draw(st.sampled_from(node))
            if isinstance(branch, str) and branch in self.rec_defs:
                # recursion back-edge: spend budget or take the null
                # co-branch (the grammar always pairs refs with null)
                if self.rec_budget <= 0:
                    return None
                self.rec_budget -= 1
                return {branch: self.rec_value(branch)}
            if branch == "null":
                return None
            base = branch.rstrip("*")
            if branch.endswith("*") and self.draw(st.booleans()):
                return {base: None}  # null payload on a nullable branch
            return {base: self.prim(base)}
        t = node["type"]
        base = t.rstrip("*")
        if t.endswith("*") and self.draw(st.booleans()):
            return None
        if base == "enum":
            return self.draw(st.sampled_from(node["symbols"]))
        if base == "fixed":
            return bytes(
                self.draw(
                    st.lists(st.integers(0, 255), min_size=node["size"],
                             max_size=node["size"])
                )
            )
        if base == "array":
            items = node["items"]
            if isinstance(items, str) and items in self.rec_defs:
                # recursion back-edge (tree shape): each element costs a
                # budget level; exhausted budget terminates with []
                out = []
                for _ in range(self.draw(st.integers(0, 2))):
                    if self.rec_budget <= 0:
                        break
                    self.rec_budget -= 1
                    out.append(self.rec_value(items))
                return out
            n = self.draw(st.integers(0, 3))
            return [self.value(items) for _ in range(n)]
        if base == "map":
            n = self.draw(st.integers(0, 3))
            return {
                self.draw(_IDENT) + str(i): self.value(node["values"])
                for i, _ in enumerate(range(n))
            }
        if base == "record":
            return {f["name"]: self.value(f["type"]) for f in node["fields"]}
        raise AssertionError(base)

    def prim(self, base: str):
        if base == "null":
            return None
        if base == "boolean":
            return self.draw(st.booleans())
        if base == "int":
            return self.draw(st.integers(-(2**31), 2**31 - 1))
        if base == "long":
            return self.draw(st.integers(-(2**63), 2**63 - 1))
        if base == "float":
            return _f32(
                self.draw(
                    st.floats(allow_nan=False, allow_infinity=False, width=32)
                )
            )
        if base == "double":
            return self.draw(st.floats(allow_nan=False, allow_infinity=False))
        if base == "string":
            return self.draw(_TEXT)
        if base == "bytes":
            return bytes(self.draw(st.lists(st.integers(0, 255), max_size=8)))
        raise AssertionError(base)


def _root_record(gen: _Gen):
    n_fields = gen.draw(st.integers(1, 4))
    return {
        "type": "record",
        "name": "Root",
        "fields": [
            {"name": f"f{i}", "type": gen.schema(2)} for i in range(n_fields)
        ],
    }


class TestFuzzRoundtrips:
    @given(data=st.data())
    @settings(max_examples=60, deadline=None)
    def test_validate_and_codec(self, data):
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        value = gen.value(schema_dict)
        norm = avs.validate(sch, value)
        norm2 = avs.validate(sch, norm)
        assert _deep_eq(norm, norm2), (norm, norm2)
        blob = encode_record(sch, norm)
        rt = encode_record(sch, decode_record(sch, blob))
        assert blob == rt

    @given(data=st.data())
    @settings(max_examples=15, deadline=None)
    def test_spark_flatten_unflatten_identity(self, data, spark):
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        cs = avs.compile(sch)
        value = gen.value(schema_dict)
        norm = avs.validate(sch, value)
        row = to_row_value(sch.root, _ddt_form(norm))
        df = spark.createDataFrame([row], sch.to_struct_type())
        back = cs.unflatten(cs.flatten(df)).collect()[0]
        # the input row IS the struct-form comparand (unions are tagged
        # structs there, matching unflatten's output shape)
        assert _deep_eq(row, back), (row, back)


class TestEvolutionFuzz:
    """Random writer → mutated reader (field reorder + drop + add-with-
    default + primitive promotions) through compile(writer, reader):
    flatten∘unflatten must equal the mechanically-projected expected
    value — an expectation computed independently of the resolution
    planner."""

    @given(data=st.data())
    @settings(max_examples=15, deadline=None)
    def test_evolution_projection(self, data, spark):
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        writer = avs.create(schema_dict)
        value = gen.value(schema_dict)
        norm = avs.validate(writer, value)

        # ---- mutate into a reader + compute the expected projection
        fields = list(schema_dict["fields"])
        rng = gen.draw
        fields = rng(st.permutations(fields))
        expected = {}
        reader_fields = []
        for pos, f in enumerate(fields):
            # the first (post-shuffle) field is always kept so the reader
            # never ends up empty; any other may drop
            if pos > 0 and rng(st.booleans()):
                continue  # drop this writer field (reader omits it)
            t, v = f["type"], norm[f["name"]]
            if t == "int" and rng(st.booleans()):
                t = "long"
            elif t == "float" and rng(st.booleans()):
                t = "double"
            elif t == "string" and rng(st.booleans()):
                t, v = "bytes", (None if v is None else v.encode("utf-8"))
            reader_fields.append({"name": f["name"], "type": t})
            expected[f["name"]] = v
        if rng(st.booleans()):
            reader_fields.append({"name": "added", "type": "int", "default": 42})
            expected["added"] = 42
        reader_dict = {"type": "record", "name": "Root", "fields": reader_fields}
        reader = avs.create(reader_dict)

        # Directionality per the reference (record_version.lua):
        # flatten(writer-record) → READER-layout tuple;
        # unflatten(WRITER-layout tuple) → reader-record.
        cs = avs.compile(writer, reader)
        row = to_row_value(writer.root, _ddt_form(norm))
        df = spark.createDataFrame([row], writer.to_struct_type())

        # flatten: must equal the identity-flatten of the expected
        # reader-form value
        expected_row = to_row_value(reader.root, _ddt_form(expected))
        expected_df = spark.createDataFrame(
            [expected_row], reader.to_struct_type()
        )
        got_flat = cs.flatten(df).collect()[0]
        want_flat = avs.compile(reader).flatten(expected_df).collect()[0]
        assert _deep_eq(want_flat, got_flat), (want_flat, got_flat)

        # unflatten: writer-layout tuple (identity-flattened writer data)
        # → the expected reader-form record
        writer_flat = avs.compile(writer).flatten(df)
        back = cs.unflatten(writer_flat).collect()[0]
        assert _deep_eq(expected_row, back), (expected_row, back)


class TestXflattenFuzz:
    """xflatten offset arithmetic fuzz: random schemas where leading
    fields contribute mixed flat widths (union 2, record Σ, array/map 1),
    then a random subset of primitive fields updates — each op's
    1-based field_no must equal the mechanically-summed width prefix."""

    @staticmethod
    def _width(node_dict):
        if isinstance(node_dict, str):
            return 1
        if isinstance(node_dict, list):
            return 2  # union = [tag, value]
        base = node_dict["type"].rstrip("*")
        if base == "record":
            if node_dict["type"].endswith("*"):
                return 1  # nullable record = single VLO cell
            return sum(
                TestXflattenFuzz._width(f["type"]) for f in node_dict["fields"]
            )
        return 1  # enum/fixed/array/map occupy one cell

    @given(data=st.data())
    @settings(max_examples=15, deadline=None)
    def test_xflatten_offsets(self, data, spark):
        gen = _Gen(data.draw)
        # leading ballast fields of varied width + trailing primitive
        # update targets
        n_ballast = gen.draw(st.integers(0, 3))
        ballast = [
            {"name": f"b{i}", "type": gen.schema(1)} for i in range(n_ballast)
        ]
        n_prims = gen.draw(st.integers(1, 3))
        prims = [
            {
                "name": f"p{i}",
                "type": gen.draw(st.sampled_from(["int", "long", "boolean", "string"])),
            }
            for i in range(n_prims)
        ]
        fields = ballast + prims
        schema_dict = {"type": "record", "name": "Root", "fields": fields}
        sch = avs.create(schema_dict)
        cs = avs.compile(sch)

        # expected 1-based offsets per field name
        offsets, acc = {}, 1
        for f in fields:
            offsets[f["name"]] = acc
            acc += self._width(f["type"])

        present = [p for p in prims if gen.draw(st.booleans())] or [prims[0]]
        values = {p["name"]: gen.prim(p["type"]) for p in present}
        row_fields = ", ".join(
            f"{p['name']} {'bigint' if p['type']=='long' else p['type']}"
            for p in present
        )
        df = spark.createDataFrame(
            [tuple(values[p["name"]] for p in present)], row_fields
        )
        ops = cs.xflatten(df).collect()[0]["ops"]
        got = {o["field_no"]: (o["op"], o["value"]) for o in ops}
        assert set(got) == {offsets[p["name"]] for p in present}, (got, offsets)
        for p in present:
            op, val = got[offsets[p["name"]]]
            assert op == "="
            v = values[p["name"]]
            expect = str(v).lower() if isinstance(v, bool) else str(v)
            assert val == expect, (p, val, expect)


class TestFuzzConformJson:
    """Property: the dynamic JSON-ingest validator accepts every
    schema-conforming value (no false positives), and flags targeted
    corruptions (unknown root key; wrong-typed first field)."""

    @given(data=st.data())
    @settings(max_examples=40, deadline=None)
    def test_no_false_positives_and_detects_corruption(self, data, spark):
        import json as _json

        from avro_spark.operators.conform import ERRORS_COL, conform_json

        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        value = gen.value(schema_dict)
        norm = avs.validate(sch, value)  # defaults filled, canonical form
        good = _json.dumps(_ddt_form(value))
        bad_key = _json.dumps({**_ddt_form(value), "zz_unknown": 1})
        df = spark.createDataFrame([(good,), (bad_key,)], "j string")
        out = [r[ERRORS_COL] for r in
               conform_json(df, "j", sch, mode="flag",
                            binary_key="$binary").collect()]
        assert out[0] == [], (schema_dict, value, out[0])
        assert out[1] == ['Unknown key: "zz_unknown"'], out[1]
        del norm


class TestFuzzJvmParity:
    """Route the fuzz corpus through BOTH codec engines: the compiled JVM
    codec must emit byte-identical Avro binary to the Python codec for
    every schema in its scope — general multi-branch unions included
    (round-3 extension)."""

    @given(data=st.data())
    @settings(max_examples=25, deadline=None)
    def test_fuzz_byte_parity_both_engines(self, data, spark):
        from avro_spark import jvm as J
        from avro_spark.sources.avro_binary import to_avro_bytes
        from ddt_helpers import Unconvertible, to_row_value

        if not (J.ensure_jar() and J.jvm_codec_available(spark)):
            pytest.skip("no JDK")
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        # the fuzz grammar emits no nullable-branch unions and no 'any',
        # so everything it generates must be inside JVM scope
        assert J.jvm_codec_supported(sch), schema_dict
        norm = avs.validate(sch, gen.value(schema_dict))
        try:
            row = to_row_value(sch.root, norm)
        except Unconvertible:
            return  # value shape not representable in typed columns
        df = spark.createDataFrame([row], sch.to_struct_type())
        enc_j = to_avro_bytes(df, sch, "b", engine="jvm")
        bj = enc_j.collect()[0].b
        bp = to_avro_bytes(df, sch, "b", engine="python").collect()[0].b
        if bytes(bj) != bytes(bp):
            # the ONE documented byte divergence: map entry iteration
            # order (Python dict vs the Scala map Spark hands the UDF).
            # Anything else is a real parity break.
            assert "map" in str(schema_dict), (schema_dict, norm)
            from avro_spark.sources.avro_binary import decode_record

            assert decode_record(sch, bytes(bj)) == decode_record(sch, bytes(bp)), (
                schema_dict, norm)


class TestRecursiveFuzz:
    """Recursive schemas (SURVEY §7 hard part #1): random record graphs
    with back-edges via [null, R] unions and array-of-R items, exercised
    through validate, the Python codec (which build-looped on cycles
    before the round-4 memo fix), the JVM codec, and the Spark
    flatten/unflatten unroll."""

    @given(data=st.data())
    @settings(max_examples=40, deadline=None)
    def test_validate_and_codec_recursive(self, data):
        gen = _Gen(data.draw, recursion=True)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        value = gen.value(schema_dict)
        norm = avs.validate(sch, value)
        norm2 = avs.validate(sch, norm)
        assert _deep_eq(norm, norm2), (norm, norm2)
        blob = encode_record(sch, norm)
        rt = encode_record(sch, decode_record(sch, blob))
        assert blob == rt

    @given(data=st.data())
    @settings(max_examples=10, deadline=None)
    def test_spark_flatten_unflatten_identity_recursive(self, data, spark):
        from ddt_helpers import Unconvertible, to_row_value

        gen = _Gen(data.draw, recursion=True)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        cs = avs.compile(sch)
        value = gen.value(schema_dict)
        norm = avs.validate(sch, value)
        try:
            row = to_row_value(sch.root, _ddt_form(norm))
        except Unconvertible:
            return
        df = spark.createDataFrame([row], sch.to_struct_type())
        back = cs.unflatten(cs.flatten(df)).collect()[0]
        assert _deep_eq(row, back), (row, back)

    @given(data=st.data())
    @settings(max_examples=10, deadline=None)
    def test_byte_parity_recursive(self, data, spark):
        from avro_spark import jvm as J
        from avro_spark.sources.avro_binary import to_avro_bytes
        from ddt_helpers import Unconvertible, to_row_value

        if not (J.ensure_jar() and J.jvm_codec_available(spark)):
            pytest.skip("no JDK")
        gen = _Gen(data.draw, recursion=True)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        if not J.jvm_codec_supported(sch):
            return  # recursion scope gap would route to Python anyway
        norm = avs.validate(sch, gen.value(schema_dict))
        try:
            row = to_row_value(sch.root, norm)
        except Unconvertible:
            return
        df = spark.createDataFrame([row], sch.to_struct_type())
        bj = to_avro_bytes(df, sch, "b", engine="jvm").collect()[0].b
        try:
            bp_df = to_avro_bytes(df, sch, "b", engine="python")
        except avs.errors.SchemaError as e:
            # branching-recursive unrolls past Arrow IPC's nesting limit
            # must be rejected LOUDLY at plan build (never die in a
            # worker); the JVM engine above already handled the schema
            assert "Arrow IPC" in str(e), e
            return
        bp = bp_df.collect()[0].b
        if bytes(bj) != bytes(bp):
            from avro_spark.sources.avro_binary import decode_record

            assert "map" in str(schema_dict), (schema_dict, norm)
            assert decode_record(sch, bytes(bj)) == decode_record(sch, bytes(bp)), (
                schema_dict, norm)


class TestUnrollRejection:
    """Data deeper than the recursion unroll must RAISE, not silently
    truncate (SCALE.md §7 contract; the reference handles unbounded
    recursive data natively, so quiet nulling would be a wrong answer)."""

    SCHEMA = {
        "type": "record", "name": "node",
        "fields": [{"name": "value", "type": "int"},
                   {"name": "next", "type": ["null", "node"]}],
    }

    @staticmethod
    def _chain_df(spark, sch, n):
        import json as _json

        rec: dict = {"value": n, "next": None}
        for i in range(n - 1, 0, -1):
            rec = {"value": i, "next": rec}
        df = spark.createDataFrame([(_json.dumps(rec),)], "j string")
        from pyspark.sql import functions as F

        return df.select(
            F.from_json("j", sch.to_struct_type()).alias("r")
        ).select("r.*")

    def test_within_bound_roundtrips(self, spark):
        """MAX_UNROLL (8) recursion LEVELS are guaranteed — the round-4
        review caught the guard triple-counting plan ids and firing on
        legal depth-5 data; this pins the full guaranteed range."""
        sch = avs.create(self.SCHEMA)
        cs = avs.compile(sch)
        for depth in (4, 5, 8):
            typed = self._chain_df(spark, sch, depth)
            back = cs.unflatten(cs.flatten(typed)).collect()[0].asDict(
                recursive=True
            )
            d, cur = 1, back
            while cur.get("next") is not None:
                cur = cur["next"]; d += 1
            assert d == depth and cur["value"] == depth

    def test_past_bound_raises(self, spark):
        sch = avs.create(self.SCHEMA)
        cs = avs.compile(sch)
        for depth in (10, 12):
            typed = self._chain_df(spark, sch, depth)
            with pytest.raises(Exception, match="unroll bound"):
                cs.flatten(typed).collect()

    def test_arrow_nesting_depth_helper(self):
        from pyspark.sql import types as T

        from avro_spark.schema.spark_types import spark_type_depth

        t = T.StructType([
            T.StructField(
                "x", T.ArrayType(T.MapType(T.StringType(), T.IntegerType()))
            )
        ])
        # struct(1) + array(1) + map(2: Arrow's list<struct<key,value>>)
        assert spark_type_depth(t) == 4
        assert spark_type_depth(T.LongType()) == 0

    def test_arrow_nesting_guard_rejects_at_plan_time(self, spark):
        """A recursive schema whose unroll exceeds Arrow IPC's 64-level
        recursion limit must raise a LOUD plan-build error on the Python
        engine (round-5 fuzz found the worker dying mid-job with
        ArrowInvalid instead)."""
        from avro_spark.sources.avro_binary import from_avro_bytes, to_avro_bytes

        # chain recursion (full 16-level unroll), 4 Arrow levels per
        # cycle: struct + 3 arrays → 64 > the 60-level guard
        sch = avs.create({
            "type": "record", "name": "deep",
            "fields": [{
                "name": "a",
                "type": {"type": "array", "items": {
                    "type": "array", "items": {
                        "type": "array", "items": ["null", "deep"]}}},
            }],
        })
        df = spark.createDataFrame([], sch.to_struct_type())
        with pytest.raises(avs.errors.SchemaError, match="Arrow IPC"):
            to_avro_bytes(df, sch, engine="python")
        bin_df = spark.createDataFrame([], "b binary")
        with pytest.raises(avs.errors.SchemaError, match="Arrow IPC"):
            from_avro_bytes(bin_df, "b", sch, engine="python")

    def test_jsonl_sink_past_bound_raises(self, spark, tmp_path):
        from avro_spark.sources.jsonl import write_jsonl_avro

        sch = avs.create(self.SCHEMA)
        typed = self._chain_df(spark, sch, 12)
        with pytest.raises(Exception, match="unroll bound"):
            write_jsonl_avro(typed, sch, str(tmp_path / "deep"))

    def test_recursive_evolution_default_fill_and_reorder(self, spark):
        """Evolution through the cycle: the reader reorders node's fields
        and adds a defaulted one — the default must materialize at EVERY
        recursion level, and reordering must not disturb values."""
        writer = avs.create(self.SCHEMA)
        reader = avs.create({
            "type": "record", "name": "node",
            "fields": [
                {"name": "next", "type": ["null", "node"]},
                {"name": "extra", "type": "string", "default": "x"},
                {"name": "value", "type": "int"},
            ],
        })
        cs = avs.compile(writer, reader)
        typed = self._chain_df(spark, writer, 3)
        # unflatten consumes the WRITER-layout tuple (reference contract)
        wtuple = avs.compile(writer).flatten(typed)
        out = cs.unflatten(wtuple).collect()[0].asDict(recursive=True)
        assert out == {
            "next": {
                "next": {"next": None, "extra": "x", "value": 3},
                "extra": "x", "value": 2,
            },
            "extra": "x", "value": 1,
        }

    def test_recursive_evolution_alias_rename(self, spark):
        """The reader renames the recursive record via alias; the cyclic
        reference re-binds through the alias at every level."""
        writer = avs.create(self.SCHEMA)
        reader = avs.create({
            "type": "record", "name": "linked", "aliases": ["node"],
            "fields": [
                {"name": "value", "type": "int"},
                {"name": "next", "type": ["null", "linked"]},
            ],
        })
        cs = avs.compile(writer, reader)
        typed = self._chain_df(spark, writer, 3)
        out = cs.unflatten(cs.flatten(typed)).collect()[0].asDict(recursive=True)
        assert out == {"value": 1, "next": {"value": 2, "next": {"value": 3, "next": None}}}

    def test_recursive_evolution_downgrade(self, spark):
        """Downgrade mode: new-schema data (extra defaulted field) written
        back to the old shape drops the field at every level."""
        new = avs.create({
            "type": "record", "name": "node",
            "fields": [
                {"name": "value", "type": "int"},
                {"name": "extra", "type": "string", "default": "x"},
                {"name": "next", "type": ["null", "node"]},
            ],
        })
        old = avs.create(self.SCHEMA)
        cs = avs.compile(new, old)
        import json as _json

        from pyspark.sql import functions as F

        rec = {"value": 1, "extra": "a",
               "next": {"value": 2, "extra": "b", "next": None}}
        df = spark.createDataFrame([(_json.dumps(rec),)], "j string")
        typed = df.select(
            F.from_json("j", new.to_struct_type()).alias("r")
        ).select("r.*")
        wtuple = avs.compile(new).flatten(typed)
        out = cs.unflatten(wtuple).collect()[0].asDict(recursive=True)
        assert out == {"value": 1, "next": {"value": 2, "next": None}}

    def test_branching_recursion_bounded_and_roundtrips(self, spark):
        """A record with TWO back-edges (map<array<R1>> and [null, R1])
        unrolls exponentially wide; pre-fix the full-depth unroll built a
        24 MB type and a plan whose execution killed the JVM (hypothesis
        find). The reduced branching budgets must keep the type small and
        round-trip flatten/unflatten + the JSONL sink exactly."""
        import json as _json

        from avro_spark.schema.spark_types import cycle_multiplicity
        from ddt_helpers import to_row_value

        R1 = {
            "type": "record", "name": "R1",
            "fields": [
                {"name": "f0", "type": {"type": "map*",
                                        "values": {"type": "array", "items": "R1"}}},
                {"name": "f1", "type": {"type": "enum", "name": "E1",
                                        "symbols": ["S0"]}},
                {"name": "f2", "type": ["null", "R1"]},
            ],
        }
        root = {"type": "record", "name": "Root",
                "fields": [{"name": "f0", "type": R1}]}
        sch = avs.create(root)
        assert cycle_multiplicity(sch.root) >= 2
        st = sch.to_struct_type()
        assert len(st.json()) < 200_000  # pre-fix: ~24 MB
        cs = avs.compile(sch)
        inner = {"f0": None, "f1": "S0", "f2": None}
        val = {"f0": {"f0": {"k0": [inner]}, "f1": "S0", "f2": None}}
        norm = avs.validate(sch, val)
        row = to_row_value(sch.root, norm)
        df = spark.createDataFrame([row], st)
        back = cs.unflatten(cs.flatten(df)).collect()[0]
        assert _deep_eq(row, back), (row, back)
        # the AVRO-convention sink renders and reads it back too
        import tempfile

        from avro_spark.sources.jsonl import read_jsonl, write_jsonl_avro

        with tempfile.TemporaryDirectory() as d:
            write_jsonl_avro(df, sch, d)
            got = read_jsonl(spark, d, schema=sch, avro_conventions=True)
            assert _deep_eq(row, got.collect()[0])

    def test_chain_recursion_budget_unchanged_by_branching_rule(self, spark):
        """Single back-edge chains keep the full MAX_UNROLL depth (the
        branching reduction must not regress them): depth 8 still
        round-trips — same bound the depth tests pin."""
        from avro_spark.schema.spark_types import cycle_multiplicity

        sch = avs.create(self.SCHEMA)
        assert cycle_multiplicity(sch.root) == 1
        cs = avs.compile(sch)
        typed = self._chain_df(spark, sch, 8)
        back = cs.unflatten(cs.flatten(typed)).collect()[0].asDict(recursive=True)
        d, cur = 1, back
        while cur.get("next") is not None:
            cur = cur["next"]; d += 1
        assert d == 8

    def test_shared_named_type_many_sites_no_guard(self, spark):
        """70 use sites of one NON-recursive named type must flatten and
        sink normally (review catch: a runtime width counter misread
        legitimate sharing as recursion and raised on valid data)."""
        import tempfile

        from avro_spark.schema.spark_types import cycle_multiplicity
        from avro_spark.sources.jsonl import read_jsonl, write_jsonl_avro

        shared = {"type": "record", "name": "Pt",
                  "fields": [{"name": "x", "type": "int"}]}
        root = {"type": "record", "name": "Wide",
                "fields": [{"name": f"f{i}", "type": "Pt" if i else shared}
                           for i in range(70)]}
        sch = avs.create(root)
        assert cycle_multiplicity(sch.root) == 0
        cs = avs.compile(sch)
        row = tuple((i,) for i in range(70))
        df = spark.createDataFrame([row], sch.to_struct_type())
        back = cs.unflatten(cs.flatten(df)).collect()[0]
        assert tuple(tuple(s) for s in back) == row
        with tempfile.TemporaryDirectory() as d:
            write_jsonl_avro(df, sch, d)
            got = read_jsonl(spark, d, schema=sch, avro_conventions=True).collect()[0]
            assert tuple(tuple(s) for s in got) == row

    def test_diamond_amplified_cycle_detected_and_bounded(self, spark):
        """P holds Q twice and Q points back to P: one back-edge SITE but
        two independent cycles (SCC E=3 > N=2) — a site count misses it
        and the type explodes to ~20 MB (review catch); cycle_multiplicity
        must flag it and keep the type small, and shallow data must
        round-trip."""
        from ddt_helpers import to_row_value

        from avro_spark.schema.spark_types import cycle_multiplicity

        Q = {"type": "record", "name": "Q",
             "fields": [{"name": "q", "type": ["null", "P"]}]}
        P = {"type": "record", "name": "P",
             "fields": [{"name": "p1", "type": Q}, {"name": "p2", "type": "Q"},
                        {"name": "v", "type": "int"}]}
        sch = avs.create(P)
        assert cycle_multiplicity(sch.root) >= 2
        st = sch.to_struct_type()
        assert len(st.json()) < 300_000  # pre-fix: ~20 MB
        pv = {"p1": {"q": None},
              "p2": {"q": {"P": {"p1": {"q": None}, "p2": {"q": None}, "v": 2}}},
              "v": 1}
        row = to_row_value(sch.root, avs.validate(sch, pv))
        df = spark.createDataFrame([row], st)
        cs = avs.compile(sch)
        back = cs.unflatten(cs.flatten(df)).collect()[0]
        assert _deep_eq(row, back)

    def test_two_independent_chains_keep_full_depth(self, spark):
        """Two unrelated single-cycle chains are NOT branching recursion
        (each SCC is a simple cycle): depth-8 data must still round-trip
        (review catch: a global back-edge count conflated them)."""
        from ddt_helpers import to_row_value

        from avro_spark.schema.spark_types import cycle_multiplicity

        L1 = {"type": "record", "name": "L1", "fields": [
            {"name": "v", "type": "int"}, {"name": "n", "type": ["null", "L1"]}]}
        L2 = {"type": "record", "name": "L2", "fields": [
            {"name": "v", "type": "int"}, {"name": "n", "type": ["null", "L2"]}]}
        sch = avs.create({"type": "record", "name": "Two", "fields": [
            {"name": "a", "type": L1}, {"name": "b", "type": L2}]})
        assert cycle_multiplicity(sch.root) == 1

        def chain(n, tag):
            rec: dict = {"v": n, "n": None}
            for i in range(n - 1, 0, -1):
                rec = {"v": i, "n": {tag: rec}}
            return rec

        val = {"a": chain(8, "L1"), "b": chain(6, "L2")}
        row = to_row_value(sch.root, avs.validate(sch, val))
        df = spark.createDataFrame([row], sch.to_struct_type())
        cs = avs.compile(sch)
        back = cs.unflatten(cs.flatten(df)).collect()[0]
        assert _deep_eq(row, back)

    def test_conform_branching_schema_bounded(self, spark):
        """conform on a 3-back-edge schema must finish quickly (the walk
        previously expanded ~3^12 nodes, each eagerly building a full
        unrolled type) and still validate the shallow levels."""
        import json as _json
        import time as _time

        from avro_spark.operators.conform import conform
        from pyspark.sql import functions as F

        R1 = {"type": "record", "name": "R1", "fields": [
            {"name": "a", "type": ["null", "R1"]},
            {"name": "b", "type": ["null", "R1"]},
            {"name": "c", "type": ["null", "R1"]},
            {"name": "v", "type": "int"}]}
        sch = avs.create({"type": "record", "name": "B",
                          "fields": [{"name": "r", "type": R1}]})
        df = spark.createDataFrame(
            [(_json.dumps({"r": {"a": None, "b": None, "c": None, "v": 1}}),)],
            "j string",
        ).select(F.from_json("j", sch.to_struct_type()).alias("x")).select("x.*")
        t0 = _time.time()
        out = conform(df, sch, mode="flag").collect()
        assert _time.time() - t0 < 60
        assert out[0]["_errors"] == []

    def test_recursive_conform_and_conform_json(self, spark):
        """DataFrame validation on recursive schemas (round-4 catch: the
        depth cut cast src to the full unrolled type and failed
        analysis); bad leaves render reference-style errors."""
        import json as _json

        from avro_spark.operators.conform import conform, conform_json
        from pyspark.sql import functions as F

        sch = avs.create(self.SCHEMA)
        good = self._chain_df(spark, sch, 3)
        rows = conform(good, sch, mode="flag").collect()
        assert all(r["_errors"] == [] for r in rows)
        bad = spark.createDataFrame(
            [(_json.dumps({"value": "x", "next": None}),)], "j string"
        )
        (r,) = conform_json(bad, "j", sch).collect()
        assert r["_errors"] == ["value: Expecting INT, encountered STR"]

    def test_recursive_ocf_and_wire_roundtrip(self, spark, tmp_path):
        import json as _json

        from avro_spark.sources.avro_ocf import read_avro_files, write_avro_files
        from avro_spark.sources.wire import from_wire, schema_registry_id, to_wire

        sch = avs.create(self.SCHEMA)
        typed = self._chain_df(spark, sch, 3).unionByName(
            self._chain_df(spark, sch, 1)
        )
        orig = sorted(
            _json.dumps(r.asDict(recursive=True), sort_keys=True)
            for r in typed.collect()
        )
        d = str(tmp_path / "ocf")
        write_avro_files(typed, sch, d)
        for kw in ({}, {"split_bytes": 1024}):
            back = read_avro_files(spark, d, sch, **kw)
            got = sorted(
                _json.dumps(r.asDict(recursive=True), sort_keys=True)
                for r in back.collect()
            )
            assert got == orig, kw
        w = to_wire(typed, sch)
        back = from_wire(w, "wire", {schema_registry_id(sch): sch})
        got = sorted(
            _json.dumps(r.asDict(recursive=True), sort_keys=True)
            for r in back.select(typed.columns).collect()
        )
        assert got == orig

    def test_record_codecs_have_no_bound(self, spark):
        from avro_spark.sources.avro_binary import decode_record, encode_record

        sch = avs.create(self.SCHEMA)
        rec: dict = {"value": 40, "next": None}
        plain: dict = {"value": 40, "next": None}
        for i in range(39, 0, -1):
            rec = {"value": i, "next": {"node": rec}}      # tagged input form
            plain = {"value": i, "next": plain}            # decode's plain form
        assert decode_record(sch, encode_record(sch, rec)) == plain


class TestDeepEvolutionFuzz:
    """Evolution fuzz across the axes TestEvolutionFuzz doesn't reach —
    B5 enum remap (reader drops unused symbols / appends new ones), B7
    union branch permutation + branch append + in-union promotion, field
    alias renames, and nested-record default adds (frontend.lua:1042-1235
    resolution semantics). The expected reader-form value is projected
    mechanically alongside the reader schema, independent of the
    resolution planner, then checked through flatten AND unflatten."""

    PROMO = {"int": ["long", "double"], "float": ["double"]}

    def _mut_prim(self, gen, base: str, v, nullable: bool, extras=()):
        """Primitive promotion choice → (reader_base, expected_value).
        ``extras`` = sibling values (other elements of a containing
        array/map) that will be projected through the SAME writer→reader
        pair — a bytes→string promotion must be utf8-safe for them too."""
        choices = [base] + self.PROMO.get(base, [])
        if base == "string":
            choices.append("bytes")
        elif base == "bytes":
            choices.append("string")
        pick = gen.draw(st.sampled_from(choices))
        if pick == "string" and base == "bytes":
            try:
                for e in extras:
                    if e is not None:
                        bytes(e).decode("utf-8")
                if v is not None:
                    return pick, bytes(v).decode("utf-8")
            except UnicodeDecodeError:
                return base, v  # not utf8-decodable: skip this promotion
        if v is None:
            return pick, None
        if pick in ("long",) and base == "int":
            return pick, v
        if pick == "double" and base in ("int", "float"):
            return pick, float(v)
        if pick == "bytes" and base == "string":
            return pick, v.encode("utf-8")
        return pick, v

    def mutate(self, gen, node, v, extras=()):
        """(writer node, conforming value) → (reader node, expected value).

        ``extras`` carries the SIBLING values that share this node's
        schema (the other elements of an enclosing array/map): a chosen
        mutation must stay valid for them too — an enum may only drop
        symbols NO element uses, a bytes→string promotion must be
        utf8-safe for every element — because ``_project`` later pushes
        the siblings through the same writer→reader pair and the engine
        (correctly, frontend.lua:1042-1235) raises '(schema versioning)'
        for a value the reader cannot represent."""
        if isinstance(node, str):
            base, nullable = node.rstrip("*"), node.endswith("*")
            nb, nv = self._mut_prim(gen, base, v, nullable, extras)
            return (nb + "*" if nullable else nb), nv
        if isinstance(node, list):  # union
            branches = list(node)
            perm = list(gen.draw(st.permutations(branches)))
            # maybe append a fresh primitive branch (new tag) — tag
            # uniqueness by BASE name ("long" and "long*" share a tag)
            bases = {b.rstrip("*") for b in perm}
            pool = [p for p in ("long", "float", "fixed_no", "boolean")
                    if p in ("long", "float", "boolean") and p not in bases]
            if pool and gen.draw(st.booleans()):
                added = gen.draw(st.sampled_from(pool))
                perm.append(added)
                bases.add(added)
            # maybe promote ONE non-null branch in place (tag change):
            # int->long/double, string->bytes (value re-tags accordingly)
            promo_from = None
            if v is not None:
                (tag, bv), = v.items()
            for i, b in enumerate(perm):
                if b in ("int", "string") and gen.draw(st.booleans()):
                    tgt = {"int": gen.draw(st.sampled_from(["long", "double"])),
                           "string": "bytes"}[b]
                    if tgt not in bases:  # keep tags unique (base-wise)
                        perm[i] = tgt
                        promo_from = (b, tgt)
                    break
            if v is None:
                return perm, None
            return perm, self._union_expected(tag, bv, perm)
        t = node["type"]
        base, nullable = t.rstrip("*"), t.endswith("*")
        if base == "enum":
            syms = list(node["symbols"])
            used = {v} | set(extras)
            used.discard(None)
            keep = [s for s in syms if s in used or gen.draw(st.booleans())]
            if not keep:
                keep = [syms[0]]
            for u in (s for s in syms if s in used):
                if u not in keep:
                    keep.append(u)
            extra = [f"Z{i}" for i in range(gen.draw(st.integers(0, 2)))]
            out = dict(node)
            out["symbols"] = list(gen.draw(st.permutations(keep + extra)))
            return out, v
        if base == "fixed":
            return node, v
        if base == "array":
            # sibling elements from ANY array value sharing this schema
            sib = [x for e in extras if e for x in e]
            if not v:
                items, _ = self.mutate(gen, node["items"], None,
                                       tuple(sib))
                return {**node, "items": items}, v
            # mutate the ITEM SCHEMA once (same reader for all elements):
            # project each element through the same primitive conversion
            items, first = self.mutate(gen, node["items"], v[0],
                                       tuple(v[1:]) + tuple(sib))
            ev = [first]
            for x in v[1:]:
                ev.append(self._project(node["items"], items, x))
            return {**node, "items": items}, ev
        if base == "map":
            sib = [x for e in extras if e for x in e.values()]
            if not v:
                values, _ = self.mutate(gen, node["values"], None,
                                        tuple(sib))
                return {**node, "values": values}, v
            ks = sorted(v)
            values, first = self.mutate(
                gen, node["values"], v[ks[0]],
                tuple(v[k] for k in ks[1:]) + tuple(sib))
            ev = {ks[0]: first}
            for k in ks[1:]:
                ev[k] = self._project(node["values"], values, v[k])
            return {**node, "values": values}, ev
        if base == "record":
            out_fields, ev = [], ({} if v is not None else None)
            for f in node["fields"]:
                fext = tuple(e[f["name"]] for e in extras
                             if e is not None)
                ft, fv = self.mutate(gen, f["type"],
                                     None if v is None else v[f["name"]],
                                     fext)
                nf = {"name": f["name"], "type": ft}
                if gen.draw(st.booleans()):  # alias rename
                    nf = {"name": f["name"] + "_r", "type": ft,
                          "aliases": [f["name"]]}
                out_fields.append(nf)
                if ev is not None:
                    ev[nf["name"]] = fv
            if gen.draw(st.booleans()):  # reader-side default add
                out_fields.append({"name": "added_d", "type": "int",
                                   "default": 7})
                if ev is not None:
                    ev["added_d"] = 7
            return {**node, "fields": out_fields}, ev
        raise AssertionError(base)

    @staticmethod
    def _union_expected(tag, bv, rbranches):
        """Expected reader-form union value per the PUBLIC resolution
        rule (frontend.lua:1046-1083): exact tag match first (any
        position), else the FIRST promotable reader branch in reader
        order — NOT necessarily the branch a promotion mutation created
        (writer int with reader [double, long] lands on double). A None
        payload (nullable branch) keeps its tag unconverted."""
        promo = {
            "int": ("long", "float", "double"),
            "long": ("float", "double"),
            "float": ("double",),
            "string": ("bytes",),
            "bytes": ("string",),
        }
        bases = [b.rstrip("*") if isinstance(b, str) else b.get("name")
                 for b in rbranches]
        if tag in bases:
            return {tag: bv}
        for rb in bases:
            if rb in promo.get(tag, ()):
                nv = bv
                if nv is not None:
                    if rb in ("float", "double"):
                        nv = float(bv)
                    elif rb == "long":
                        nv = int(bv)
                    elif rb == "bytes":
                        nv = bv.encode("utf-8")
                    elif rb == "string":
                        # unreachable today: mutations never drop an
                        # exact 'bytes' branch — loud if that changes
                        nv = bv.decode("utf-8")
                return {rb: nv}
        raise AssertionError(f"unreadable union: {tag!r} vs {rbranches}")

    def _project(self, wnode, rnode, x):
        """Project value x through the ALREADY-CHOSEN writer→reader pair
        (no further random draws) — for array/map siblings."""
        if x is None:
            return None
        if isinstance(wnode, str):
            wb = wnode.rstrip("*")
            rb = rnode.rstrip("*") if isinstance(rnode, str) else rnode
            if wb == rb:
                return x
            if rb == "double":
                return float(x)
            if rb == "bytes" and wb == "string":
                return x.encode("utf-8")
            if rb == "string" and wb == "bytes":
                return bytes(x).decode("utf-8")
            return x
        if isinstance(wnode, list):
            (tag, bv), = x.items()
            return self._union_expected(tag, bv, rnode)
        wb = wnode["type"].rstrip("*")
        if wb == "array":
            return [self._project(wnode["items"], rnode["items"], e) for e in x]
        if wb == "map":
            return {k: self._project(wnode["values"], rnode["values"], e)
                    for k, e in x.items()}
        if wb == "record":
            out = {}
            rmap = {}
            for rf in rnode["fields"]:
                src = (rf.get("aliases") or [rf["name"]])[0]
                rmap[rf["name"]] = (src, rf)
            for rname, (src, rf) in rmap.items():
                if src in x:
                    wf = next(f for f in wnode["fields"] if f["name"] == src)
                    out[rname] = self._project(wf["type"], rf["type"], x[src])
                else:
                    out[rname] = rf.get("default")
            return out
        return x

    @given(data=st.data())
    @settings(max_examples=25, deadline=None)
    def test_deep_evolution(self, data, spark):
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        writer = avs.create(schema_dict)
        norm = avs.validate(writer, gen.value(schema_dict))

        reader_dict, expected = self.mutate(gen, schema_dict, dict(norm))
        reader = avs.create(reader_dict)
        res = avs.are_compatible(writer, reader)
        ok = res[0] if isinstance(res, tuple) else res
        assert ok, (schema_dict, reader_dict, res)

        from ddt_helpers import to_row_value

        row = to_row_value(writer.root, _ddt_form(norm))
        df = spark.createDataFrame([row], writer.to_struct_type())
        expected_row = to_row_value(reader.root, _ddt_form(expected))
        expected_df = spark.createDataFrame(
            [expected_row], reader.to_struct_type())

        cs = avs.compile(writer, reader)
        got_flat = cs.flatten(df).collect()[0]
        want_flat = avs.compile(reader).flatten(expected_df).collect()[0]
        assert _deep_eq(want_flat, got_flat), (
            schema_dict, reader_dict, norm, want_flat, got_flat)

        writer_flat = avs.compile(writer).flatten(df)
        back = cs.unflatten(writer_flat).collect()[0]
        assert _deep_eq(expected_row, back), (
            schema_dict, reader_dict, norm, expected_row, back)


class TestNegativeEvolutionFuzz:
    """The rejection surface, fuzzed: breaking schema mutations must be
    REFUSED (are_compatible falsy + compile raises), and dropped-but-used
    enum symbols / union branches must raise the runtime '(schema
    versioning)' error — never silently mis-project (frontend.lua:
    1042-1235 compile-time vs runtime error split)."""

    _BREAK_PRIM = {"int": "string", "long": "boolean", "float": "string",
                   "double": "boolean", "boolean": "int", "string": "int",
                   "bytes": "int"}

    @given(data=st.data())
    @settings(max_examples=30, deadline=None)
    def test_breaking_mutation_rejected(self, data):
        from avro_spark.errors import AvroSparkError

        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        # find fields eligible for a guaranteed-incompatible break
        eligible = []
        for i, f in enumerate(schema_dict["fields"]):
            t = f["type"]
            if isinstance(t, str) and t.rstrip("*") in self._BREAK_PRIM:
                eligible.append((i, "prim"))
            elif isinstance(t, dict):
                base = t["type"].rstrip("*")
                if base == "fixed":
                    eligible.append((i, "fixed_size"))
                elif base == "enum":
                    eligible.append((i, "rename"))
                elif base == "record":
                    eligible.append((i, "add_mandatory"))
                elif base in ("array", "map"):
                    key = "items" if base == "array" else "values"
                    if isinstance(t[key], str) and \
                            t[key].rstrip("*") in self._BREAK_PRIM:
                        eligible.append((i, "container_elem"))
        if not eligible:
            return
        idx, kind = gen.draw(st.sampled_from(eligible))
        fields = [dict(f) for f in schema_dict["fields"]]
        f = fields[idx]
        t = f["type"]
        if kind == "prim":
            star = "*" if t.endswith("*") else ""
            f["type"] = self._BREAK_PRIM[t.rstrip("*")] + star
        elif kind == "fixed_size":
            f["type"] = {**t, "size": t["size"] + 1}
        elif kind == "rename":
            f["type"] = {**t, "name": t["name"] + "_x"}
        elif kind == "add_mandatory":
            f["type"] = {**t, "fields": list(t["fields"]) + [
                {"name": "zz_mand", "type": "int"}]}
        else:  # container_elem
            key = "items" if t["type"].rstrip("*") == "array" else "values"
            et = t[key]
            star = "*" if et.endswith("*") else ""
            f["type"] = {**t, key: self._BREAK_PRIM[et.rstrip("*")] + star}
        reader_dict = {**schema_dict, "fields": fields}
        writer = avs.create(schema_dict)
        reader = avs.create(reader_dict)
        assert not avs.are_compatible(writer, reader), (
            schema_dict, reader_dict)
        with pytest.raises(AvroSparkError):
            avs.compile(writer, reader)

    _PROMO_PARTNERS = {"int": {"long", "float", "double"},
                       "long": {"float", "double"}, "float": {"double"},
                       "string": {"bytes"}, "bytes": {"string"}}

    @given(data=st.data())
    @settings(max_examples=20, deadline=None)
    def test_dropped_symbol_or_branch_raises_versioning(self, data, spark):
        from ddt_helpers import to_row_value

        gen = _Gen(data.draw)
        which = gen.draw(st.sampled_from(["enum", "union"]))
        if which == "enum":
            syms = [f"S{i}" for i in range(gen.draw(st.integers(2, 5)))]
            used = gen.draw(st.sampled_from(syms))
            wt = {"type": "enum", "name": "E", "symbols": syms}
            keep = [s for s in syms if s != used] + \
                [f"Z{i}" for i in range(gen.draw(st.integers(0, 2)))]
            rt = {"type": "enum", "name": "E",
                  "symbols": list(gen.draw(st.permutations(keep)))}
            value = used
        else:
            prims = gen.draw(st.lists(
                st.sampled_from(["int", "string", "double", "boolean"]),
                min_size=2, max_size=4, unique=True))
            has_null = gen.draw(st.booleans())
            wt = (["null"] if has_null else []) + prims
            used = gen.draw(st.sampled_from(prims))
            # drop the used branch AND every promotion partner of it, so
            # nothing in the reader can absorb the value
            partners = self._PROMO_PARTNERS.get(used, set())
            keep = [b for b in wt if b != used and b not in partners]
            if not [b for b in keep if b != "null"]:
                keep.append("boolean" if used != "boolean" else "int")
            rt = list(gen.draw(st.permutations(keep)))
            value = {used: gen.prim(used)}
        wrec = avs.create({"type": "record", "name": "T",
                           "fields": [{"name": "v", "type": wt}]})
        rrec = avs.create({"type": "record", "name": "T",
                           "fields": [{"name": "v", "type": rt}]})
        if which == "union":
            # when NO writer branch is readable at all, the reference
            # fails at COMPILE time ("No common types",
            # frontend.lua:1078-1080), not with a runtime versioning
            # error — e.g. writer [double,int] (used=int drops double as
            # a promotion partner) vs the fallback reader [boolean]
            def maps(b):
                if b == "null":
                    return "null" in rt
                targets = {b} | self._PROMO_PARTNERS.get(b, set())
                return bool(targets & set(rt))
            if not any(maps(b) for b in wt):
                with pytest.raises(Exception, match="No common types"):
                    avs.compile(wrec, rrec)
                return
        cs = avs.compile(wrec, rrec)
        row = to_row_value(wrec.root, _ddt_form({"v": value}))
        df = spark.createDataFrame([row], wrec.to_struct_type())
        with pytest.raises(Exception, match="versioning|Bad value|Unknown key"):
            cs.flatten(df).collect()


class TestFuzzOcfCrossEngine:
    """Round-5 OCF container path: the fuzz corpus through BOTH engines
    end-to-end at the FILE level — write with one engine, read with the
    other, all four combinations agree; block payloads are byte-equal
    between writers for map-free schemas (maps carry the one documented
    entry-order divergence)."""

    @given(data=st.data())
    @settings(max_examples=10, deadline=None)
    def test_fuzz_file_level_cross_engine(self, data, spark, tmp_path_factory):
        import json as _json

        from avro_spark import jvm as J
        from avro_spark.sources.avro_ocf import (
            read_avro_files, write_avro_files,
        )
        from ddt_helpers import Unconvertible, to_row_value

        if not (J.ensure_jar() and J.jvm_codec_available(spark)):
            pytest.skip("no JDK")
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        rows = []
        for _ in range(gen.draw(st.integers(1, 4))):
            norm = avs.validate(sch, gen.value(schema_dict))
            try:
                rows.append(to_row_value(sch.root, norm))
            except Unconvertible:
                return
        df = spark.createDataFrame(rows, sch.to_struct_type()).coalesce(1)
        want = sorted(
            _json.dumps(r.asDict(recursive=True), sort_keys=True, default=repr)
            for r in df.collect()
        )
        base = tmp_path_factory.mktemp("ocf_fuzz")
        codec = gen.draw(st.sampled_from(
            ["null", "deflate", "snappy", "zstandard"]))
        for weng in ("python", "jvm"):
            d = str(base / weng)
            write_avro_files(df, sch, d, codec=codec, block_records=2,
                             engine=weng)
            for reng in ("python", "jvm"):
                back = read_avro_files(spark, d, sch, engine=reng)
                got = sorted(
                    _json.dumps(r.asDict(recursive=True), sort_keys=True,
                                default=repr)
                    for r in back.collect()
                )
                assert got == want, (weng, reng, schema_dict)


class TestFuzzProjection:
    """Projected decode == full decode + select, over random schemas on
    both engines (OCF and wire surfaces): the skipper must advance the
    cursor EXACTLY as the decoder does for every type shape, or the
    fields after a skipped one decode garbage/trailing-byte errors."""

    @given(data=st.data())
    @settings(max_examples=10, deadline=None)
    def test_fuzz_projected_reads(self, data, spark, tmp_path_factory):
        import json as _json

        from avro_spark import jvm as J
        from avro_spark.sources.avro_binary import (
            from_avro_bytes, to_avro_bytes,
        )
        from avro_spark.sources.avro_ocf import (
            read_avro_files, write_avro_files,
        )
        from ddt_helpers import Unconvertible, to_row_value

        if not (J.ensure_jar() and J.jvm_codec_available(spark)):
            pytest.skip("no JDK")
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        rows = []
        for _ in range(gen.draw(st.integers(1, 3))):
            norm = avs.validate(sch, gen.value(schema_dict))
            try:
                rows.append(to_row_value(sch.root, norm))
            except Unconvertible:
                return
        df = spark.createDataFrame(rows, sch.to_struct_type()).coalesce(1)
        names = [f.name for f in sch.root.fields]
        n_keep = gen.draw(st.integers(1, len(names)))
        cols = gen.draw(
            st.permutations(names).map(lambda p: sorted(p[:n_keep]))
        )

        def canon(frame):
            return sorted(
                _json.dumps(r.asDict(recursive=True), sort_keys=True,
                            default=repr)
                for r in frame.collect()
            )

        d = str(tmp_path_factory.mktemp("proj_fuzz") / "ocf")
        write_avro_files(df, sch, d, block_records=2)
        keep_schema_order = [n for n in names if n in set(cols)]
        for eng in ("python", "jvm"):
            want = canon(
                read_avro_files(spark, d, sch, engine=eng)
                .select(*keep_schema_order))
            got = canon(
                read_avro_files(spark, d, sch, engine=eng, columns=cols))
            assert got == want, ("ocf", eng, cols, schema_dict)
            enc = to_avro_bytes(df, sch, "b", engine=eng)
            want_w = canon(
                from_avro_bytes(enc, "b", sch, engine=eng)
                .select(*keep_schema_order))
            got_w = canon(
                from_avro_bytes(enc, "b", sch, engine=eng, columns=cols))
            assert got_w == want_w, ("wire", eng, cols, schema_dict)

        # r7: NESTED one-level projection — dotted requests on record
        # fields must equal the full decode + a struct-rebuild select
        # (null structs stay null), on both engines and both surfaces
        from pyspark.sql import functions as F

        from avro_spark.sources.avro_binary import _projectable_record

        nested_cols, exprs = [], []
        for n in keep_schema_order:
            fld = next(f for f in sch.root.fields if f.name == n)
            rec = _projectable_record(fld.type)
            sub = None
            if rec is not None and rec.fields and gen.draw(st.booleans()):
                k = gen.draw(st.integers(1, len(rec.fields)))
                sub = gen.draw(st.permutations(
                    [sf.name for sf in rec.fields]).map(
                        lambda p, k=k: sorted(p[:k])))
            if sub is None:
                nested_cols.append(n)
                exprs.append(F.col(n))
            else:
                nested_cols += [f"{n}.{s}" for s in sub]
                sub_order = [sf.name for sf in rec.fields
                             if sf.name in set(sub)]
                st_expr = F.struct(
                    *[F.col(n)[s].alias(s) for s in sub_order])
                if fld.type.nullable:
                    st_expr = F.when(F.col(n).isNotNull(), st_expr)
                exprs.append(st_expr.alias(n))
        if nested_cols == keep_schema_order:
            return  # no record field drew a dotted request this example
        for eng in ("python", "jvm"):
            want_n = canon(
                read_avro_files(spark, d, sch, engine=eng).select(*exprs))
            got_n = canon(read_avro_files(
                spark, d, sch, engine=eng, columns=nested_cols))
            assert got_n == want_n, ("ocf-nested", eng, nested_cols,
                                     schema_dict)
            enc = to_avro_bytes(df, sch, "b", engine=eng)
            want_wn = canon(
                from_avro_bytes(enc, "b", sch, engine=eng).select(*exprs))
            got_wn = canon(from_avro_bytes(
                enc, "b", sch, engine=eng, columns=nested_cols))
            assert got_wn == want_wn, ("wire-nested", eng, nested_cols,
                                       schema_dict)


class TestFuzzOcfEvolvedRead:
    """Evolution at the FILE boundary: random writer schema → random
    reader mutation (reorder + drop + primitive promotion + defaulted
    add), data written as OCF on both engines, read back with
    read_avro_files_evolved on both engines — the result must equal the
    mechanically-projected reader-form records (computed independently
    of the resolution planner)."""

    @given(data=st.data())
    @settings(max_examples=8, deadline=None)
    def test_fuzz_evolved_read_cross_engine(self, data, spark, tmp_path_factory):
        import json as _json

        from avro_spark import jvm as J
        from avro_spark.sources.avro_ocf import (
            read_avro_files_evolved, write_avro_files,
        )
        from ddt_helpers import Unconvertible, to_row_value

        if not (J.ensure_jar() and J.jvm_codec_available(spark)):
            pytest.skip("no JDK")
        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        writer = avs.create(schema_dict)
        norms = []
        for _ in range(gen.draw(st.integers(1, 3))):
            norms.append(avs.validate(writer, gen.value(schema_dict)))

        # reader mutation + independent expected projection (the same
        # rules as TestEvolutionFuzz, over every record)
        rng = gen.draw
        fields = rng(st.permutations(list(schema_dict["fields"])))
        reader_fields = []
        projections = []  # (name, transform) in reader order
        for pos, f in enumerate(fields):
            if pos > 0 and rng(st.booleans()):
                continue  # reader drops this writer field
            t = f["type"]
            tx = lambda v: v
            if t == "int" and rng(st.booleans()):
                t = "long"
            elif t == "float" and rng(st.booleans()):
                t = "double"
            elif t == "string" and rng(st.booleans()):
                t = "bytes"
                tx = lambda v: None if v is None else v.encode("utf-8")
            reader_fields.append({"name": f["name"], "type": t})
            projections.append((f["name"], tx))
        if rng(st.booleans()):
            reader_fields.append({"name": "added", "type": "int", "default": 42})
            projections.append(("added", None))
        reader = avs.create({
            "type": "record", "name": "Root", "fields": reader_fields})
        expected = [
            {name: (42 if tx is None else tx(n[name]))
             for name, tx in projections}
            for n in norms
        ]
        try:
            rows = [to_row_value(writer.root, _ddt_form(n)) for n in norms]
            want_rows = [to_row_value(reader.root, _ddt_form(e)) for e in expected]
        except Unconvertible:
            return
        df = spark.createDataFrame(rows, writer.to_struct_type()).coalesce(1)
        want = sorted(
            _json.dumps(r.asDict(recursive=True), sort_keys=True, default=repr)
            for r in spark.createDataFrame(
                want_rows, reader.to_struct_type()).collect()
        )
        # r7: projection composes with evolution — a random subset of
        # READER fields must equal the full evolved read then .select()
        keep = [f["name"] for f in reader_fields
                if rng(st.booleans())] or [reader_fields[0]["name"]]
        keep_set = set(keep)
        want_proj = sorted(
            _json.dumps({k: v for k, v in _json.loads(row).items()
                         if k in keep_set}, sort_keys=True)
            for row in want
        )
        base = tmp_path_factory.mktemp("ocf_evo_fuzz")
        for weng in ("python", "jvm"):
            d = str(base / weng)
            write_avro_files(df, writer, d, block_records=2, engine=weng)
            for reng in ("python", "jvm"):
                back = read_avro_files_evolved(spark, d, reader, engine=reng)
                got = sorted(
                    _json.dumps(r.asDict(recursive=True), sort_keys=True,
                                default=repr)
                    for r in back.collect()
                )
                assert got == want, (weng, reng, schema_dict, reader_fields)
                proj = read_avro_files_evolved(
                    spark, d, reader, engine=reng, columns=keep)
                got_p = sorted(
                    _json.dumps(r.asDict(recursive=True), sort_keys=True,
                                default=repr)
                    for r in proj.collect()
                )
                assert got_p == want_proj, (
                    weng, reng, keep, schema_dict, reader_fields)
