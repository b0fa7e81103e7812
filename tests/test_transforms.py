"""flatten / unflatten / xflatten DataFrame transform tests.

Goldens follow the reference DDT corpus: record.lua (F1), benchmark.lua (F2),
record_version.lua (F5), service_fields.lua (F6), union.lua (F4),
enum_versions.lua (F8), *_promo.lua (F7).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import avro_spark as avs
from avro_spark.errors import CompatibilityError, CompileError

from fixture_schemas import PERSON_BENCH, PERSON_FLAT


def rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


@pytest.fixture(scope="module")
def person_df(spark):
    s = avs.create(PERSON_BENCH)
    data = [
        (
            "John", "Doe", "Warrior", 33, "MALE",
            Row(Strength=10, Perception=8, Endurance=7, Charisma=6,
                Intelligence=5, Agility=9, Luck=4),
            ["day one", "day two"],
        ),
        (
            "Jane", "Roe", "Mage", 28, "FEMALE",
            Row(Strength=3, Perception=9, Endurance=5, Charisma=8,
                Intelligence=10, Agility=6, Luck=7),
            [],
        ),
    ]
    return spark.createDataFrame(data, schema=s.to_struct_type())


class TestFlatten:
    def test_flatten_names_and_values(self, person_df):
        s = avs.create(PERSON_BENCH)
        c = avs.compile(s)
        flat = c.flatten(person_df)
        assert flat.columns == [
            "FirstName", "LastName", "Class", "Age", "Sex",
            "Stats.Strength", "Stats.Perception", "Stats.Endurance",
            "Stats.Charisma", "Stats.Intelligence", "Stats.Agility",
            "Stats.Luck", "Journal",
        ]
        got = flat.orderBy("FirstName").collect()
        jane, john = got
        assert john["Sex"] == 1 and jane["Sex"] == 0  # enum → int code
        assert john["Stats.Strength"] == 10
        assert jane["Journal"] == []

    def test_roundtrip_identity(self, person_df):
        s = avs.create(PERSON_BENCH)
        c = avs.compile(s)
        back = c.unflatten(c.flatten(person_df))
        assert sorted(rows(back), key=lambda r: r["FirstName"]) == sorted(
            rows(person_df), key=lambda r: r["FirstName"]
        )

    def test_default_fill_on_null(self, spark):
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s)
        df = spark.createDataFrame(
            [("John", None, 33, 1, None, None, None)],
            "FirstName string, LastName string, Age int, Sex int, "
            "PhoneNumber string, HomeAddress string, Occupation string",
        )
        flat = c.flatten(df)
        r = flat.collect()[0]
        assert r["LastName"] == "" and r["PhoneNumber"] == ""

    def test_missing_column_with_default_synthesized(self, spark):
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s)
        df = spark.createDataFrame([("John", 33, 1)], "FirstName string, Age int, Sex int")
        r = c.flatten(df).collect()[0]
        assert r["FirstName"] == "John" and r["LastName"] == "" and r["Occupation"] == ""

    def test_missing_mandatory_column_rejected(self, spark):
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s)
        df = spark.createDataFrame([("John",)], "FirstName string")
        with pytest.raises(CompileError, match="missing"):
            c.flatten(df)


class TestServiceFields:
    def test_flatten_with_service_prefix(self, spark):
        # FIXTURES F6 / service_fields.lua: ({}, true) → [true, "Simple ", 1234]
        s = avs.create(
            {
                "name": "simple", "type": "record",
                "fields": [
                    {"name": "A", "type": "string", "default": "Simple "},
                    {"name": "B", "type": "int", "default": 1234},
                ],
            }
        )
        c = avs.compile(s, service_fields=("boolean",))
        df = spark.createDataFrame([(None, None)], "A string, B int")
        flat = c.flatten(df, service_values=(True,))
        assert flat.columns == ["$service_field$", "A", "B"]
        assert flat.collect()[0][:] == (True, "Simple ", 1234)
        back = c.unflatten(flat)
        assert rows(back) == [{"A": "Simple ", "B": 1234}]

    def test_unflatten_width_check(self, spark):
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s, service_fields=("boolean",))
        df = spark.range(1).select(*[F.lit(1).alias(f"c{i}") for i in range(7)])
        with pytest.raises(CompileError, match="expected 8 columns"):
            c.unflatten(df)


class TestEvolution:
    FOO_A = {
        "name": "foo", "type": "record",
        "fields": [
            {"name": "A", "type": "int", "default": 1001},
            {"name": "B", "type": "int", "default": 1002},
            {"name": "C", "type": "int", "default": 1003},
            {"name": "D", "type": "int", "default": 1004},
        ],
    }
    FOO_B = {
        "name": "foo", "type": "record",
        "fields": [
            {"name": "D", "type": "int", "default": 1005},
            {"name": "C", "type": "int", "default": 1006},
            {"name": "B", "type": "int", "default": 1007},
            {"name": "A", "type": "int", "default": 1008},
        ],
    }
    FOO_C = {
        "name": "foo", "type": "record",
        "fields": [
            {"name": "A", "type": "int", "default": 1001},
            {"name": "B", "type": "int", "default": 1002},
        ],
    }

    def test_reorder(self, spark):
        # record_version.lua:32-45: A→B flatten {A:1,B:2,C:3,D:4} → [4,3,2,1]
        a, b = avs.create(self.FOO_A), avs.create(self.FOO_B)
        c = avs.compile(a, b)
        df = spark.createDataFrame([(1, 2, 3, 4)], a.to_struct_type())
        assert c.flatten(df).collect()[0][:] == (4, 3, 2, 1)

    def test_added_fields_defaulted(self, spark):
        # C→A flatten {A:1,B:2} → [1,2,1003,1004]
        cs, a = avs.create(self.FOO_C), avs.create(self.FOO_A)
        comp = avs.compile(cs, a)
        df = spark.createDataFrame([(1, 2)], cs.to_struct_type())
        assert comp.flatten(df).collect()[0][:] == (1, 2, 1003, 1004)

    def test_dropped_fields(self, spark):
        # A→C drops C,D
        a, cs = avs.create(self.FOO_A), avs.create(self.FOO_C)
        comp = avs.compile(a, cs)
        df = spark.createDataFrame([(1, 2, 3, 4)], a.to_struct_type())
        assert comp.flatten(df).collect()[0][:] == (1, 2)

    def test_unflatten_reorder(self, spark):
        # B→A unflatten [4,3,2,1] → {A:1,B:2,C:3,D:4}... (B layout D,C,B,A)
        b, a = avs.create(self.FOO_B), avs.create(self.FOO_A)
        comp = avs.compile(b, a)
        df = spark.createDataFrame([(4, 3, 2, 1)], "D int, C int, B int, A int")
        assert rows(comp.unflatten(df)) == [{"A": 1, "B": 2, "C": 3, "D": 4}]

    def test_alias_rename(self, spark):
        w = avs.create(
            {"name": "r", "type": "record",
             "fields": [{"name": "old_name", "type": "int"}]}
        )
        r = avs.create(
            {"name": "r", "type": "record",
             "fields": [{"name": "new_name", "type": "int", "aliases": ["old_name"]}]}
        )
        comp = avs.compile(w, r)
        df = spark.createDataFrame([(7,)], w.to_struct_type())
        flat = comp.flatten(df)
        assert flat.columns == ["new_name"] and flat.collect()[0][0] == 7

    def test_promotions(self, spark):
        w = avs.create(
            {"name": "p", "type": "record",
             "fields": [{"name": "i", "type": "int"}, {"name": "f", "type": "float"},
                        {"name": "s", "type": "string"}]}
        )
        r = avs.create(
            {"name": "p", "type": "record",
             "fields": [{"name": "i", "type": "long"}, {"name": "f", "type": "double"},
                        {"name": "s", "type": "bytes"}]}
        )
        comp = avs.compile(w, r)
        df = spark.createDataFrame([(2**31 - 1, 1.5, "xyz")], w.to_struct_type())
        got = comp.flatten(df).collect()[0]
        assert got[0] == 2**31 - 1 and abs(got[1] - 1.5) < 1e-9 and bytes(got[2]) == b"xyz"
        sch = comp.flatten(df).schema
        assert sch["i"].dataType.typeName() == "long"
        assert sch["f"].dataType.typeName() == "double"
        assert sch["s"].dataType.typeName() == "binary"

    def test_map_and_array_value_promotion(self, spark):
        # B4: element-wise recursion through array items and map values
        # (frontend.lua:1116-1133) — transform / transform_values path
        w = avs.create(
            {"name": "c", "type": "record",
             "fields": [{"name": "xs", "type": {"type": "array", "items": "int"}},
                        {"name": "m", "type": {"type": "map", "values": "int"}}]}
        )
        r = avs.create(
            {"name": "c", "type": "record",
             "fields": [{"name": "xs", "type": {"type": "array", "items": "long"}},
                        {"name": "m", "type": {"type": "map", "values": "double"}}]}
        )
        comp = avs.compile(w, r)
        df = spark.createDataFrame([([1, 2], {"a": 3})], w.to_struct_type())
        got = comp.flatten(df).collect()[0]
        assert got["xs"] == [1, 2] and got["m"] == {"a": 3.0}
        sch = comp.flatten(df).schema
        assert sch["xs"].dataType.elementType.typeName() == "long"
        assert sch["m"].dataType.valueType.typeName() == "double"
        back = comp.unflatten(comp.flatten(df)).collect()[0]
        assert back["xs"] == [1, 2] and back["m"] == {"a": 3.0}

    def test_illegal_promotion_rejected(self):
        w = avs.create({"name": "p", "type": "record", "fields": [{"name": "x", "type": "double"}]})
        r = avs.create({"name": "p", "type": "record", "fields": [{"name": "x", "type": "int"}]})
        assert avs.are_compatible(w, r) is False
        with pytest.raises(CompatibilityError):
            avs.compile(w, r)

    def test_missing_field_no_default_rejected(self):
        w = avs.create({"name": "p", "type": "record", "fields": [{"name": "x", "type": "int"}]})
        r = avs.create(
            {"name": "p", "type": "record",
             "fields": [{"name": "x", "type": "int"}, {"name": "y", "type": "int"}]}
        )
        assert avs.are_compatible(w, r) is False
        with pytest.raises(CompatibilityError, match="y"):
            avs.compile(w, r)

    def test_enum_remap(self, spark):
        # FIXTURES F8: TRUCK code 3 → 2; TRICYCLE → versioning error
        w = avs.create({"type": "enum", "name": "vehicle",
                        "symbols": ["CAR", "BUS", "TRICYCLE", "TRUCK"]})
        r = avs.create({"type": "enum", "name": "vehicle",
                        "symbols": ["CAR", "BUS", "TRUCK", "SCOOTER"]})
        wrec = avs.create(
            {"name": "t", "type": "record",
             "fields": [{"name": "v", "type": w.export()}]}
        )
        rrec = avs.create(
            {"name": "t", "type": "record",
             "fields": [{"name": "v", "type": r.export()}]}
        )
        comp = avs.compile(wrec, rrec)
        df = spark.createDataFrame([("TRUCK",), ("CAR",)], wrec.to_struct_type())
        # flatten emits reader codes: TRUCK 3→2, CAR 0→0
        assert sorted(r["v"] for r in comp.flatten(df).collect()) == [0, 2]
        bad = spark.createDataFrame([("TRICYCLE",)], wrec.to_struct_type())
        with pytest.raises(Exception, match="versioning"):
            comp.flatten(bad).collect()

    def test_downgrade_mode(self, spark):
        # newer schema carries the alias; downgrade matches it back
        newer = avs.create(
            {"name": "r", "type": "record",
             "fields": [{"name": "new_name", "type": "int", "aliases": ["old_name"]}]}
        )
        older = avs.create(
            {"name": "r", "type": "record",
             "fields": [{"name": "old_name", "type": "int"}]}
        )
        assert avs.are_compatible(newer, older) is False
        assert avs.are_compatible(newer, older, "downgrade")
        comp = avs.compile(newer, older, downgrade=True)
        df = spark.createDataFrame([(5,)], newer.to_struct_type())
        flat = comp.flatten(df)
        assert flat.columns == ["old_name"] and flat.collect()[0][0] == 5


class TestUnions:
    def test_simple_null_union_cells(self, spark):
        s = avs.create(
            {"name": "e", "type": "record",
             "fields": [{"name": "k", "type": "long"},
                        {"name": "payload", "type": ["null", "double"]}]}
        )
        c = avs.compile(s)
        df = spark.createDataFrame([(1, 2.5), (2, None)], s.to_struct_type())
        flat = c.flatten(df)
        assert flat.columns == ["k", "payload.$type$", "payload"]
        got = {r["k"]: (r["payload.$type$"], r["payload"]) for r in flat.collect()}
        assert got == {1: (1, 2.5), 2: (0, None)}
        back = c.unflatten(flat)
        assert {r["k"]: r["payload"] for r in back.collect()} == {1: 2.5, 2: None}

    def test_general_union_cells(self, spark):
        # FIXTURES F4: {"int":42} → [0,42]; {"string":"s"} → [1,"s"]
        s = avs.create(
            {"name": "u", "type": "record",
             "fields": [{"name": "x", "type": ["int", "string", "double"]}]}
        )
        c = avs.compile(s)
        st = s.to_struct_type()
        df = spark.createDataFrame(
            [Row(x=Row(**{"$type$": 0, "int": 42, "string": None, "double": None})),
             Row(x=Row(**{"$type$": 1, "int": None, "string": "Hello, world!", "double": None}))],
            st,
        )
        flat = c.flatten(df)
        assert flat.columns == ["x.$type$", "x"]
        got = sorted(
            (r["x.$type$"], r["x"].asDict() if r["x"] is not None else None)
            for r in flat.collect()
        )
        assert got[0][0] == 0 and got[0][1]["int"] == 42
        assert got[1][0] == 1 and got[1][1]["string"] == "Hello, world!"
        back = c.unflatten(flat)
        vals = sorted(
            (r["x"]["$type$"], r["x"]["int"], r["x"]["string"]) for r in back.collect()
        )
        assert vals == [(0, 42, None), (1, None, "Hello, world!")]


class TestXflatten:
    def test_single_field_ops(self, spark):
        # record.lua:355-395: {"Age":33} → [["=",3,33]]
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s)
        df = spark.createDataFrame([(33,)], "Age int")
        got = c.xflatten(df, stringify=False).collect()[0]["ops"]
        assert [(o["op"], o["field_no"], o["value"]) for o in got] == [("=", 3, 33)]

    def test_multi_field_ops(self, spark):
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s)
        df = spark.createDataFrame([("John", "Doe", 33)], "FirstName string, LastName string, Age int")
        got = c.xflatten(df).collect()[0]["ops"]
        assert [(o["op"], o["field_no"], o["value"]) for o in got] == [
            ("=", 1, "John"), ("=", 2, "Doe"), ("=", 3, "33"),
        ]

    def test_service_field_offset(self, spark):
        # indices account for service fields (init.lua:356-360)
        s = avs.create(PERSON_FLAT)
        c = avs.compile(s, service_fields=("boolean",))
        df = spark.createDataFrame([(33,)], "Age int")
        got = c.xflatten(df, stringify=False).collect()[0]["ops"]
        assert [(o["op"], o["field_no"], o["value"]) for o in got] == [("=", 4, 33)]

    def test_union_double_cell(self, spark):
        s = avs.create(
            {"name": "e", "type": "record",
             "fields": [{"name": "k", "type": "long"},
                        {"name": "payload", "type": ["null", "double"]}]}
        )
        c = avs.compile(s)
        df = spark.createDataFrame([(2.5,)], "payload double")
        got = c.xflatten(df).collect()[0]["ops"]
        assert [(o["op"], o["field_no"], o["value"]) for o in got] == [
            ("=", 2, "1"), ("=", 3, "2.5"),
        ]

    def test_nested_record_ops(self, spark):
        s = avs.create(PERSON_BENCH)
        c = avs.compile(s)
        df = spark.createDataFrame(
            [Row(Stats=Row(Strength=1, Perception=2, Endurance=3, Charisma=4,
                           Intelligence=5, Agility=6, Luck=7))]
        )
        got = c.xflatten(df, stringify=False).collect()[0]["ops"]
        assert [(o["field_no"], o["value"]) for o in got] == [
            (6, 1), (7, 2), (8, 3), (9, 4), (10, 5), (11, 6), (12, 7),
        ]


class TestNullableRecord:
    def test_nullable_record_single_cell(self, spark):
        # FIXTURES F3: nullable record = one (VLO) cell
        s = avs.create(
            {"name": "outer", "type": "record",
             "fields": [
                 {"name": "r1", "type": {"name": "tr1", "type": "record",
                                         "fields": [{"name": "v1", "type": "int"},
                                                    {"name": "v2", "type": "string"}]}},
                 {"name": "r2", "type": "tr1*"},
             ]}
        )
        c = avs.compile(s)
        df = spark.createDataFrame(
            [Row(r1=Row(v1=1, v2="a"), r2=None),
             Row(r1=Row(v1=2, v2="b"), r2=Row(v1=3, v2="c"))],
            s.to_struct_type(),
        )
        flat = c.flatten(df)
        assert flat.columns == ["r1.v1", "r1.v2", "r2"]
        got = sorted(rows(flat), key=lambda r: r["r1.v1"])
        assert got[0]["r2"] is None and got[1]["r2"] == {"v1": 3, "v2": "c"}
        back = c.unflatten(flat)
        assert sorted(rows(back), key=lambda r: r["r1"]["v1"]) == sorted(
            rows(df), key=lambda r: r["r1"]["v1"]
        )


class TestDumpPlan:
    """A4 debug surface: dump_plan renders the resolution IR and, with a
    frame, the Catalyst plans (≙ compile{debug/dump_il/dump_src})."""

    def test_dump_plan_renders_ir_and_spark_plans(self, spark):
        writer = avs.create({"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "int"},
            {"name": "tags", "type": {"type": "array", "items": "string"}}]})
        reader = avs.create({"type": "record", "name": "R", "fields": [
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "a", "type": "long"},
            {"name": "b", "type": "int", "default": 9}]})
        cs = avs.compile(writer, reader)
        ir_only = cs.dump_plan()
        assert "Resolution plan" in ir_only
        assert "field b ← default/null" in ir_only
        assert "promote" in ir_only
        assert "Spark plan" not in ir_only
        df = spark.createDataFrame([(1, ["x"])], "a int, tags array<string>")
        full = cs.dump_plan(df)
        assert "== Spark plan for flatten ==" in full
        assert "Physical Plan" in full


# ------------------------------------------------- review-fix regressions
def test_unflatten_writer_enum_to_reader_union(spark):
    """Writer enum flat cell (int code) → reader [null, enum]: the code
    must decode to the SYMBOL before union wrapping (was emitting raw
    codes)."""
    import avro_spark

    w = avro_spark.create({"type": "record", "name": "T", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}}]})
    r = avro_spark.create({"type": "record", "name": "T", "fields": [
        {"name": "e", "type": ["null", {"type": "enum", "name": "E", "symbols": ["A", "B"]}]}]})
    flat = avro_spark.compile(w).flatten(
        spark.createDataFrame([("A",), ("B",)], "e string")
    )
    got = sorted(x[0] for x in avro_spark.compile(w, r).unflatten(flat).collect())
    assert got == ["A", "B"]


def test_flatten_writer_union_to_reader_record(spark):
    """Writer union[RecA] → reader non-nullable RecA must inline through
    an identity plan (was an AssertionError at build time)."""
    import avro_spark

    w = avro_spark.create({"type": "record", "name": "T2", "fields": [
        {"name": "a", "type": [{"type": "record", "name": "RecA",
                                "fields": [{"name": "x", "type": "int"}]}]}]})
    r = avro_spark.create({"type": "record", "name": "T2", "fields": [
        {"name": "a", "type": {"type": "record", "name": "RecA",
                               "fields": [{"name": "x", "type": "int"}]}}]})
    df = spark.createDataFrame([((0, (5,)),)], "a struct<`$type$`:int, RecA struct<x:int>>")
    out = avro_spark.compile(w, r).flatten(df)
    assert out.columns == ["a.x"]
    assert out.collect()[0][0] == 5


def test_unflatten_simple_union_tag_is_load_bearing(spark):
    """[null, int] flat cells: a null-branch tag yields null regardless
    of the value cell, and an out-of-range tag errors (union.lua:160) —
    the tag cell was previously dead input."""
    import avro_spark
    from avro_spark.errors import AvroSparkError

    s = avro_spark.create({"type": "record", "name": "U", "fields": [
        {"name": "v", "type": ["null", "int"]}]})
    cs = avro_spark.compile(s)
    names = cs.flat_names()
    df = spark.createDataFrame([(0, 42), (1, 42)], f"`{names[0]}` int, `{names[1]}` int")
    got = sorted((r[0] is None, r[0]) for r in cs.unflatten(df).collect())
    assert [g[1] for g in got] == [42, None]
    bad = spark.createDataFrame([(7, 42)], f"`{names[0]}` int, `{names[1]}` int")
    with pytest.raises(Exception, match="Bad value"):
        cs.unflatten(bad).collect()


def test_compile_writer_record_reader_nullable_record(spark):
    """Compiling record → nullable-record once succeeded but every
    flatten/flat_names crashed; the wrap decision now considers the
    READER root too (single-VLO-cell layout, struct-column input)."""
    import avro_spark

    w = avro_spark.create({"type": "record", "name": "R",
                           "fields": [{"name": "x", "type": "int"}]})
    r = avro_spark.create({"type": "record*", "name": "R",
                           "fields": [{"name": "x", "type": "int"}]})
    c = avro_spark.compile(w, r)
    assert c.flat_names() == ["value"]
    df = spark.createDataFrame([((5,),)], "v struct<x:int>")
    assert c.flatten(df).collect()[0][0] == (5,)


def test_nullable_root_named_root_compiles(spark):
    import avro_spark

    s = avro_spark.create({"type": "record*", "name": "_root_",
                           "fields": [{"name": "x", "type": "int"}]})
    assert avro_spark.compile(s).flat_names() == ["value"]


def test_wrapped_root_service_fields_single_column(spark):
    import avro_spark

    c = avro_spark.compile(avro_spark.create('"int"'), service_fields=("boolean",))
    one = spark.createDataFrame([(7,)], "v int")
    got = c.flatten(one, service_values=(True,)).collect()[0]
    assert tuple(got) == (True, 7)


def test_dump_plan_renders_union_branches(spark):
    import avro_spark

    c = avro_spark.compile(avro_spark.create({"type": "record", "name": "T",
        "fields": [{"name": "u", "type": ["int", "string"]}]}))
    d = c.dump_plan()
    assert "branches[0]" in d and "Resolved(" not in d
