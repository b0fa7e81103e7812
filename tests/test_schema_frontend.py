"""Schema front-end tests (no Spark session needed).

Case shapes follow the reference's DDT corpus (test/ddt_suite/*.lua,
test/api_tests/*.lua); fixtures per FIXTURES.md F1-F11. Goldens asserted here
are category+path, not exact reference wording (SURVEY.md §7).
"""

from __future__ import annotations

import pytest

import avro_spark as avs
from avro_spark.errors import DataValidationError, SchemaError

from fixture_schemas import PERSON_BENCH, PERSON_FLAT


class TestCreate:
    def test_primitive_normalization(self):
        # {"type":"int"} normalizes to "int" (frontend.lua:308-316)
        s = avs.create({"type": "int"})
        assert s.export() == "int"
        assert avs.create("int").export() == "int"

    def test_bad_type(self):
        with pytest.raises(SchemaError):
            avs.create("integer")

    def test_record_requires_fields(self):
        with pytest.raises(SchemaError):
            avs.create({"type": "record", "name": "x", "fields": []})

    def test_duplicate_field(self):
        with pytest.raises(SchemaError, match="twice"):
            avs.create(
                {
                    "type": "record",
                    "name": "x",
                    "fields": [{"name": "a", "type": "int"}, {"name": "a", "type": "int"}],
                }
            )

    def test_union_dup_branch(self):
        with pytest.raises(SchemaError, match="twice"):
            avs.create(["int", "int"])

    def test_union_no_nested_union(self):
        with pytest.raises(SchemaError):
            avs.create(["int", ["string"]])

    def test_named_reference_reuse(self):
        s = avs.create(
            {
                "type": "record",
                "name": "outer",
                "fields": [
                    {
                        "name": "r1",
                        "type": {
                            "name": "tr1",
                            "type": "record",
                            "fields": [
                                {"name": "v1", "type": "int"},
                                {"name": "v2", "type": "string"},
                            ],
                        },
                    },
                    {"name": "r2", "type": "tr1*"},
                ],
            }
        )
        r1 = s.root.fields[0].type
        r2 = s.root.fields[1].type
        assert not r1.nullable and r2.nullable
        assert r2.twin is r1 and r1.fields is r2.fields

    def test_direct_recursion_rejected(self):
        with pytest.raises(SchemaError):
            avs.create(
                {
                    "type": "record",
                    "name": "node",
                    "fields": [{"name": "next", "type": "node"}],
                }
            )

    def test_recursion_via_union_ok(self):
        s = avs.create(
            {
                "type": "record",
                "name": "node",
                "fields": [
                    {"name": "value", "type": "int"},
                    {"name": "next", "type": ["null", "node"]},
                ],
            }
        )
        assert s.root.fields[1].type.branches[1] is s.root

    def test_forward_reference_option(self):
        raw = {
            "type": "record",
            "name": "outer",
            "fields": [
                {"name": "a", "type": "later"},
                {
                    "name": "b",
                    "type": {"type": "record", "name": "later", "fields": [{"name": "x", "type": "int"}]},
                },
            ],
        }
        with pytest.raises(SchemaError):
            avs.create(raw)
        s = avs.create(raw, {"forward_reference": True})
        assert s.root.fields[0].type is s.root.fields[1].type

    def test_namespace_fullname(self):
        s = avs.create(PERSON_BENCH)
        assert s.root.fullname == "Person.Person"
        assert s.root.fields[4].type.fullname == "Person.Sex"

    def test_enum_bad_symbol(self):
        with pytest.raises(SchemaError):
            avs.create({"type": "enum", "name": "e", "symbols": ["ok", "not ok"]})
        s = avs.create(
            {"type": "enum", "name": "e", "symbols": ["ok", "not ok"]}, {"utf8_enums": True}
        )
        assert s.root.symbols == ["ok", "not ok"]

    def test_default_validated(self):
        with pytest.raises(SchemaError, match="[Dd]efault"):
            avs.create(
                {
                    "type": "record",
                    "name": "x",
                    "fields": [{"name": "a", "type": "int", "default": "oops"}],
                }
            )

    def test_defaults_auto(self):
        s = avs.create(PERSON_BENCH, {"defaults": "auto"})
        v = s.validate({"FirstName": "a", "LastName": "b", "Class": "c", "Age": 1,
                        "Sex": "MALE", "Stats": {n: 0 for n in
                        ["Strength", "Perception", "Endurance", "Charisma",
                         "Intelligence", "Agility", "Luck"]}})
        assert v["Journal"] == []

    def test_nullable_suffix_on_primitive(self):
        s = avs.create(
            {"type": "record", "name": "x", "fields": [{"name": "a", "type": "int*"}]}
        )
        assert s.root.fields[0].type.nullable
        assert s.validate({"a": None}) == {"a": None}


class TestValidate:
    def test_defaults_fill(self):
        s = avs.create(PERSON_FLAT)
        out = s.validate({"FirstName": "John", "Age": 33, "Sex": 1})
        assert out == {
            "FirstName": "John", "LastName": "", "Age": 33, "Sex": 1,
            "PhoneNumber": "", "HomeAddress": "", "Occupation": "",
        }

    def test_missing_mandatory(self):
        s = avs.create(PERSON_FLAT)
        with pytest.raises(DataValidationError, match="Age"):
            s.validate({"FirstName": "John", "Sex": 1})

    def test_unknown_field(self):
        s = avs.create(PERSON_FLAT)
        with pytest.raises(DataValidationError, match="[Uu]nknown"):
            s.validate({"FirstName": "J", "Age": 1, "Sex": 0, "Extra": 1})

    def test_int_range(self):
        s = avs.create({"type": "record", "name": "x", "fields": [{"name": "a", "type": "int"}]})
        assert s.validate({"a": 2**31 - 1}) == {"a": 2**31 - 1}
        # reference wording: range failures render 'Not a int: <v>'
        # (frontend.lua:766-770 + copy_data_eh)
        with pytest.raises(DataValidationError, match="Not a int: 2147483648"):
            s.validate({"a": 2**31})
        with pytest.raises(DataValidationError):
            s.validate({"a": -(2**31) - 1})

    def test_long_range(self):
        s = avs.create({"type": "record", "name": "x", "fields": [{"name": "a", "type": "long"}]})
        assert s.validate({"a": -(2**63)}) == {"a": -(2**63)}
        # ints beyond 2^53 render the Lua-double way (validate.lua:151)
        with pytest.raises(DataValidationError, match=r"Not a long: 9\.2233720368548e\+18"):
            s.validate({"a": 2**63})

    def test_union_forms(self):
        s = avs.create(["int", "string", "double"])
        assert s.validate({"int": 42}) == {"int": 42}
        assert s.validate({"string": "Hello, world!"}) == {"string": "Hello, world!"}
        with pytest.raises(DataValidationError):
            s.validate(None)  # no null branch
        with pytest.raises(DataValidationError, match="union"):
            s.validate({"bogus": 1})
        s4 = avs.create(["int", "string", "double", "null"])
        assert s4.validate(None) is None

    def test_missing_null_union_field_fills_null(self):
        s = avs.create(
            {
                "type": "record",
                "name": "x",
                "fields": [
                    {"name": "a", "type": "string"},
                    {"name": "b", "type": ["null", "int"]},
                ],
            }
        )
        assert s.validate({"a": "v"}) == {"a": "v", "b": None}

    def test_error_path(self):
        s = avs.create(PERSON_BENCH)
        with pytest.raises(DataValidationError) as ei:
            s.validate(
                {
                    "FirstName": "a", "LastName": "b", "Class": "c", "Age": 1,
                    "Sex": "MALE",
                    "Stats": {"Strength": "not a long", **{n: 1 for n in
                              ["Perception", "Endurance", "Charisma",
                               "Intelligence", "Agility", "Luck"]}},
                    "Journal": [],
                }
            )
        assert "Stats/Strength" in str(ei.value)

    def test_enum_validation(self):
        s = avs.create({"type": "enum", "name": "Sex", "symbols": ["FEMALE", "MALE"]})
        assert s.validate("MALE") == "MALE"
        with pytest.raises(DataValidationError):
            s.validate("OTHER")

    def test_fixed_length(self):
        s = avs.create({"type": "fixed", "name": "f4", "size": 4})
        assert s.validate(b"abcd") == b"abcd"
        with pytest.raises(DataValidationError):
            s.validate(b"abc")

    def test_map_and_array(self):
        s = avs.create({"type": "map", "values": "int"})
        assert s.validate({"a": 1}) == {"a": 1}
        with pytest.raises(DataValidationError):
            s.validate({"a": "x"})
        s = avs.create({"type": "array", "items": "string"})
        assert s.validate(["x"]) == ["x"]
        with pytest.raises(DataValidationError):
            s.validate([1])

    def test_cycle_detection(self):
        s = avs.create({"type": "map", "values": {"type": "map", "values": "int"}})
        d: dict = {}
        d["self"] = d
        with pytest.raises(DataValidationError, match="[Ii]nfinite"):
            s.validate(d)


class TestExportFingerprint:
    def test_export_roundtrip(self):
        s = avs.create(PERSON_BENCH)
        exported = s.export()
        s2 = avs.create(exported)
        assert s2.export() == exported
        assert s2.fingerprint() == s.fingerprint()

    def test_export_named_ref(self):
        s = avs.create(
            {
                "type": "record",
                "name": "outer",
                "fields": [
                    {"name": "r1", "type": {"name": "tr1", "type": "record",
                                            "fields": [{"name": "v1", "type": "int"}]}},
                    {"name": "r2", "type": "tr1*"},
                ],
            }
        )
        e = s.export()
        assert e["fields"][1]["type"] == "tr1*"

    def test_nullable_export(self):
        s = avs.create({"type": "record", "name": "x",
                        "fields": [{"name": "a", "type": "int*"}]})
        assert s.export()["fields"][0]["type"] == "int*"

    def test_canonical_form_attr_order(self):
        s = avs.create(PERSON_FLAT)
        cf = s.canonical_form()
        assert cf.startswith('{"name":"person","type":"record","fields":[')
        assert " " not in cf.split('"HomeAddress"')[0].replace('"Long Street"', "")

    def test_fingerprint_stable(self):
        s = avs.create(PERSON_FLAT)
        fp = s.fingerprint()
        assert len(fp) == 8
        assert fp == avs.create(PERSON_FLAT).fingerprint()
        assert fp != avs.create(PERSON_BENCH).fingerprint()
        assert len(s.fingerprint("md5", 16)) == 16


class TestLayout:
    def test_person_bench_width_13(self):
        # FIXTURES F2: 4 scalars + 1 enum + 7 inlined Stats + 1 array = 13
        s = avs.create(PERSON_BENCH)
        names = s.get_names()
        assert len(names) == 13
        assert names[:5] == ["FirstName", "LastName", "Class", "Age", "Sex"]
        assert names[5] == "Stats.Strength" and names[11] == "Stats.Luck"
        assert names[12] == "Journal"
        types = s.get_types()
        assert types[4] == "enum" and types[12] == "array" and types[3] == "long"

    def test_union_contributes_two_cells(self):
        s = avs.create(
            {
                "type": "record",
                "name": "x",
                "fields": [
                    {"name": "a", "type": "int"},
                    {"name": "u", "type": ["null", "string", "long"]},
                    {"name": "z", "type": "double"},
                ],
            }
        )
        assert s.get_names() == ["a", "u.$type$", "u", "z"]
        assert s.get_types() == ["int", "union_type", "union_value", "double"]

    def test_service_fields(self):
        s = avs.create(PERSON_FLAT)
        names = s.get_names(("boolean",))
        assert names[0] == "$service_field$" and len(names) == 8
        assert s.get_types(("boolean",))[0] == "boolean"

    def test_width_calculus(self):
        s = avs.create(PERSON_BENCH)
        assert s.root.width() == 13

    def test_spark_struct_type(self):
        s = avs.create(PERSON_BENCH)
        st = s.to_struct_type()
        assert [f.name for f in st.fields][:3] == ["FirstName", "LastName", "Class"]
        assert st["Age"].dataType.typeName() == "long"
        assert st["Sex"].dataType.typeName() == "string"
        assert st["Stats"].dataType.typeName() == "struct"
        assert st["Journal"].dataType.typeName() == "array"

    def test_recursive_unroll_capped(self):
        s = avs.create(
            {
                "type": "record",
                "name": "node",
                "fields": [
                    {"name": "value", "type": "int"},
                    {"name": "next", "type": ["null", "node"]},
                ],
            }
        )
        st = s.to_struct_type(max_depth=4)
        # the cycle is cut to NullType after 4 unrolls of `node`
        t, depth = st, 0
        while t.typeName() == "struct":
            t = t["next"].dataType  # [null, node] collapses to nullable node
            depth += 1
        assert t.typeName() == "void" and depth == 4


class TestErrorCategoryParity:
    """C3: the reference's error categories surface with the same key
    phrases and path prefixes (runtime.lua:263-336; exact wording parity
    is documented as a deviation, categories are not)."""

    def test_validate_path_prefix(self):
        sch = avs.create({"type": "record", "name": "R", "fields": [
            {"name": "a", "type": {"type": "record", "name": "S", "fields": [
                {"name": "b", "type": "int"}]}}]})
        with pytest.raises(Exception, match=r"a/b"):
            avs.validate(sch, {"a": {"b": "notanint"}})

    def test_validate_missing_field(self):
        sch = avs.create({"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "int"}]})
        with pytest.raises(Exception, match=r"[Mm]issing"):
            avs.validate(sch, {})

    def test_validate_unknown_field(self):
        sch = avs.create({"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "int"}]})
        with pytest.raises(Exception, match=r"[Uu]nknown|[Uu]nexpected"):
            avs.validate(sch, {"a": 1, "zz": 2})

    def test_enum_versioning_phrase_in_plan(self, spark):
        """Writer enum symbol absent from the reader must fail with the
        reference's '(schema versioning)' category at execution."""
        w = avs.create({"type": "enum", "name": "E", "symbols": ["A", "B"]})
        r = avs.create({"type": "enum", "name": "E", "symbols": ["A"]})
        cs = avs.compile(w, r)
        df = spark.createDataFrame([("B",)], "value string")
        with pytest.raises(Exception, match="schema versioning"):
            cs.flatten(df).collect()

    def test_bad_enum_symbol_phrase(self, spark):
        # exact reference rendering: 'Bad value: "Z"' (enum.lua:65,
        # runtime.lua err_value %q-quoting)
        sch = avs.create({"type": "enum", "name": "E", "symbols": ["A"]})
        cs = avs.compile(sch)
        df = spark.createDataFrame([("Z",)], "value string")
        with pytest.raises(Exception, match=r'Bad value: "Z"'):
            cs.flatten(df).collect()


# ------------------------------------------------- review-fix regressions
class TestReviewFixes:
    def test_union_dup_tag_through_forward_ref(self):
        with pytest.raises(SchemaError, match="twice"):
            avs.create(
                ["Foo", {"type": "record", "name": "Foo",
                         "fields": [{"name": "x", "type": "int"}]}],
                {"forward_reference": True},
            )

    def test_forward_ref_resolves_via_alias(self):
        s = avs.create(
            {"type": "record", "name": "R3", "fields": [
                {"name": "a", "type": "Old"},
                {"name": "b", "type": {"type": "record", "name": "New",
                                       "aliases": ["Old"],
                                       "fields": [{"name": "x", "type": "int"}]}},
            ]},
            {"forward_reference": True},
        )
        assert s.root.fields[0].type.name == "New"

    def test_export_nested_bytes_default(self):
        import json

        s = avs.create({"type": "record", "name": "B", "fields": [
            {"name": "f", "type": ["bytes", "int"], "default": "abc"}]})
        out = json.loads(s.export_json())  # must not raise TypeError
        assert out["fields"][0]["default"] == "abc"

    def test_nullable_writer_to_null_union_reader(self):
        from avro_spark.plans.resolution import resolve

        p = resolve(avs.create('"int*"').root, avs.create(["null", "int"]).root)
        assert p.kind == "to_union"

    def test_union_null_branch_to_nullable_reader(self):
        from avro_spark.plans.resolution import resolve

        p = resolve(
            avs.create(["null", "int", "string"]).root, avs.create('"int*"').root
        )
        branches = p.children["branches"]
        assert branches[0] is not None  # null branch maps, not a runtime error
        assert branches[2] is None  # string still unmapped

    def test_failed_branch_rolls_back_nested_memo(self):
        """A failed record resolution must purge every memo entry it
        added — a later branch once reused a corrupt nested plan."""
        from avro_spark.plans.resolution import resolve

        w = avs.create({"type": "record", "name": "R", "aliases": ["R1", "R2"],
                        "fields": [
            {"name": "b", "type": {"type": "record", "name": "B",
                                   "aliases": ["B1"],
                                   "fields": [{"name": "y", "type": "int"}]}},
            {"name": "x", "type": "int"}]})
        r = avs.create([
            {"type": "record", "name": "R1", "fields": [
                {"name": "b", "type": {"type": "record", "name": "B1",
                                       "fields": [{"name": "y", "type": "int"}]}},
                {"name": "x", "type": "string"}]},
            {"type": "record", "name": "R2", "fields": [
                {"name": "b", "type": "B1"},
                {"name": "x", "type": "int"}]},
        ])
        j, bp = resolve(w.root, r.root, downgrade=True).children["branch"]
        assert j == 1
        assert [s_.reader_field.name for s_ in bp.children["sources"]] == ["b", "x"]
