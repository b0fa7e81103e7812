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
