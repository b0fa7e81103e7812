"""Schema-registry wire format (sources/wire.py): framing, round-trip,
multi-version consumption with writer→reader evolution, unknown-id
handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import avro_spark as avs
from avro_spark.sources.wire import (
    from_wire,
    schema_registry_id,
    to_wire,
    wire_schema_id,
)

V1 = {
    "type": "record", "name": "User",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
    ],
}
V2 = {
    "type": "record", "name": "User",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "full_name", "type": "string", "aliases": ["name"]},
        {"name": "plan", "type": "string", "default": "free"},
    ],
}


class TestWire:
    def test_framing_and_roundtrip(self, spark):
        s = avs.create(V1)
        df = spark.createDataFrame([(1, "ann"), (2, "bo")], "id long, name string")
        wired = to_wire(df, s, schema_id=7)
        row = wired.collect()[0]
        blob = bytes(row.wire)
        assert blob[0] == 0 and int.from_bytes(blob[1:5], "big") == 7
        assert wired.select(wire_schema_id("wire")).collect()[0][0] == 7
        back = from_wire(wired, "wire", {7: s})
        assert sorted((r.id, r.name) for r in back.collect()) == [(1, "ann"), (2, "bo")]

    def test_fingerprint_ids_are_stable_and_distinct(self):
        s1, s2 = avs.create(V1), avs.create(V2)
        assert schema_registry_id(s1) == schema_registry_id(avs.create(V1))
        assert schema_registry_id(s1) != schema_registry_id(s2)

    def test_multi_version_consumer_evolves_to_reader(self, spark):
        """v1 and v2 producers on one topic; the consumer reads everything
        as v2: alias-renamed field mapped, added field default-filled."""
        s1, s2 = avs.create(V1), avs.create(V2)
        old = spark.createDataFrame([(1, "ann")], "id long, name string")
        new = spark.createDataFrame(
            [(2, "bo bob", "pro")], "id long, full_name string, plan string"
        )
        topic = to_wire(old, s1, 1).unionByName(to_wire(new, s2, 2))
        got = {r.id: (r.full_name, r.plan)
               for r in from_wire(topic, "wire", {1: s1, 2: s2}, reader=s2).collect()}
        assert got == {1: ("ann", "free"), 2: ("bo bob", "pro")}

    def test_unknown_id_error_and_skip(self, spark):
        s = avs.create(V1)
        df = spark.createDataFrame([(1, "ann")], "id long, name string")
        wired = to_wire(df, s, 7)
        bogus = wired.select(
            F.concat(F.lit(b"\x00\x00\x00\x00\x63"), F.expr(
                "substring(wire, 6, length(wire) - 5)")).alias("wire")
        )
        topic = wired.unionByName(bogus)
        with pytest.raises(Exception, match="unknown wire message"):
            from_wire(topic, "wire", {7: s}, on_unknown="error").collect()
        kept = from_wire(topic, "wire", {7: s}, on_unknown="skip").collect()
        assert [(r.id, r.name) for r in kept] == [(1, "ann")]

    def test_no_shuffle_plan(self, spark):
        s1, s2 = avs.create(V1), avs.create(V2)
        df = spark.createDataFrame([(1, "ann")], "id long, name string")
        topic = to_wire(df, s1, 1)
        plan = from_wire(topic, "wire", {1: s1, 2: s2}, reader=s2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


def test_multi_version_registry_requires_explicit_reader(spark):
    s1, s2 = avs.create(V1), avs.create(V2)
    df = spark.createDataFrame([(1, "ann")], "id long, name string")
    topic = to_wire(df, s1, 1)
    with pytest.raises(Exception, match="explicit reader"):
        from_wire(topic, "wire", {1: s1, 2: s2})


def test_truncated_frame_skipped(spark):
    """A frame shorter than magic+id must be dropped under
    on_unknown='skip' even when its short-read id collides with a
    registered id (review regression)."""
    from avro_spark.sources import wire as W

    sch = avs.create(
        {"type": "record", "name": "R", "fields": [{"name": "x", "type": "int"}]}
    )
    good = spark.createDataFrame([(2,)], "x int")
    framed = W.to_wire(good, sch, schema_id=1)
    trunc = spark.createDataFrame(
        [(bytearray(b"\x00\x00\x00\x01"),)], framed.schema
    )
    both = framed.unionByName(trunc)
    out = W.from_wire(both, "wire", {1: sch}, on_unknown="skip")
    assert [r["x"] for r in out.collect()] == [2]


class TestWireMultiVersionFuzz:
    """Property fuzz for the schema-registry wire format: random
    primitive record schemas where writer v1 lacks a random subset of
    v2's defaulted fields (and writes fields in a shuffled order);
    messages framed under both versions, consumed with reader=v2 —
    every row must surface with v1's gaps filled from defaults and the
    embedded ids must resolve per-row."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    PRIMS = [
        ("int", 7), ("long", 2**40), ("string", "d"), ("boolean", True),
        ("double", 1.5),
    ]

    @given(data=st.data())
    @settings(max_examples=10, deadline=None)
    def test_two_version_consume(self, data, spark):
        import avro_spark as avs
        from hypothesis import strategies as st

        from avro_spark.sources.wire import (
            from_wire,
            schema_registry_id,
            to_wire,
        )

        n_fields = data.draw(st.integers(2, 5))
        fields = []
        for i in range(n_fields):
            t, dflt = data.draw(st.sampled_from(self.PRIMS))
            fields.append(
                {"name": f"f{i}", "type": t, "default": dflt})
        v2_dict = {"type": "record", "name": "M", "fields": fields}
        # v1: drop a random non-empty proper subset, shuffle the rest
        keep = [f for f in fields
                if data.draw(st.booleans())] or [fields[0]]
        if len(keep) == len(fields):
            keep = keep[:-1] or [fields[0]]
        keep = data.draw(st.permutations(keep))
        v1_dict = {"type": "record", "name": "M", "fields": list(keep)}
        v1, v2 = avs.create(v1_dict), avs.create(v2_dict)
        id1, id2 = schema_registry_id(v1), schema_registry_id(v2)
        if id1 == id2:
            return  # degenerate permutation-only difference is fine
        gen_val = {"int": lambda r: r, "long": lambda r: r * (2**33),
                   "string": lambda r: f"s{r}", "boolean": lambda r: r % 2 == 0,
                   "double": lambda r: r / 4.0}
        def row_for(sch_fields, rid):
            return tuple(gen_val[f["type"]](rid) for f in sch_fields)
        rows1 = [row_for(keep, r) for r in range(3)]
        rows2 = [row_for(fields, r) for r in range(3, 6)]
        df1 = spark.createDataFrame(rows1, v1.to_struct_type())
        df2 = spark.createDataFrame(rows2, v2.to_struct_type())
        wire = to_wire(df1, v1, schema_id=id1).unionByName(
            to_wire(df2, v2, schema_id=id2))
        out = from_wire(wire, "wire", {id1: v1, id2: v2}, reader=v2)
        got = sorted(map(str, out.collect()))
        # expected: v2 rows as-is; v1 rows = defaults overlaid with kept
        want_rows = []
        kept_names = {f["name"] for f in keep}
        for r in range(3):
            vals = []
            for f in fields:
                if f["name"] in kept_names:
                    vals.append(gen_val[f["type"]](r))
                else:
                    vals.append(f["default"])
            want_rows.append(tuple(vals))
        want_rows += rows2
        want_df = spark.createDataFrame(want_rows, v2.to_struct_type())
        want = sorted(map(str, want_df.collect()))
        assert got == want, (v1_dict, v2_dict)
