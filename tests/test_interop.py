"""spark-avro memberN-union interop: round-trips between the connector's
member struct shape and our $type$-tagged struct, and integration with the
compiled flatten."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import avro_spark
from avro_spark.operators.interop import from_member_union, to_member_union

UREC = {
    "type": "record",
    "name": "U",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "u", "type": ["null", "string", "double"]},
    ],
}

MEMBER_T = T.StructType(
    [
        T.StructField("member0", T.StringType()),
        T.StructField("member1", T.DoubleType()),
    ]
)


def _union_node():
    sch = avro_spark.create(UREC)
    return sch.root.fields[1].type


@pytest.fixture(scope="module")
def member_df(spark):
    rows = [
        (1, ("s", None)),   # string branch (tag 1)
        (2, (None, 2.5)),   # double branch (tag 2)
        (3, None),          # null branch (tag 0)
    ]
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("id", T.LongType()),
                            T.StructField("u", MEMBER_T)])
    )


def test_from_member_tags(spark, member_df):
    u = _union_node()
    got = member_df.select("id", from_member_union(F.col("u"), u).alias("u")).collect()
    by_id = {r["id"]: r["u"] for r in got}
    assert by_id[1]["$type$"] == 1 and by_id[1][u.branch_tag(1)] == "s"
    assert by_id[2]["$type$"] == 2 and by_id[2][u.branch_tag(2)] == 2.5
    assert by_id[3]["$type$"] == 0


def test_member_roundtrip(spark, member_df):
    u = _union_node()
    back = member_df.select(
        "id",
        to_member_union(from_member_union(F.col("u"), u), u).alias("u"),
    ).collect()
    orig = {r["id"]: r["u"] for r in member_df.collect()}
    got = {r["id"]: r["u"] for r in back}
    # null branch normalizes to a null struct either way
    assert got[1] == orig[1] and got[2] == orig[2] and got[3] is None


def test_member_input_flattens(spark, member_df):
    """member-struct input → normalize → compiled flatten = [tag, value]."""
    sch = avro_spark.create(UREC)
    u = _union_node()
    normalized = member_df.select(
        "id", from_member_union(F.col("u"), u).alias("u")
    )
    cs = avro_spark.compile(sch)
    flat = cs.flatten(normalized).toDF("id", "u_type", "u_value")
    rows = {r["id"]: (r["u_type"], r["u_value"]) for r in flat.collect()}
    assert rows[1][0] == 1 and rows[2][0] == 2 and rows[3][0] == 0


def test_simple_union_rejected(spark):
    sch = avro_spark.create(
        {"type": "record", "name": "S",
         "fields": [{"name": "x", "type": ["null", "long"]}]}
    )
    with pytest.raises(Exception, match="nullable"):
        from_member_union(F.col("x"), sch.root.fields[0].type)


# ------------------------------------------------- review-fix regressions
class TestConvertibilityGuards:
    def _u(self, branches):
        import avro_spark as avs

        sch = avs.create({"type": "record", "name": "T",
                          "fields": [{"name": "u", "type": branches}]})
        return sch.root.fields[0].type

    def test_numeric_collapse_rejected(self):
        from avro_spark.errors import CompileError
        from avro_spark.operators.interop import from_member_union
        from pyspark.sql import functions as F

        with pytest.raises(CompileError, match="collapses"):
            from_member_union(F.col("u"), self._u(["null", "int", "long"]))

    def test_single_non_null_branch_rejected(self):
        from avro_spark.errors import CompileError
        from avro_spark.operators.interop import from_member_union
        from pyspark.sql import functions as F

        with pytest.raises(CompileError, match="bare"):
            # two non-null branches needed for a memberN struct; a
            # null-less single branch union is just the type
            from_member_union(F.col("u"), self._u([{"type": "record",
                "name": "Only", "fields": [{"name": "x", "type": "int"}]}]))

    def test_nested_general_union_rejected(self):
        from avro_spark.errors import CompileError
        from avro_spark.operators.interop import to_member_union
        from pyspark.sql import functions as F

        inner_rec = {"type": "record", "name": "R", "fields": [
            {"name": "g", "type": ["int", "string"]}]}
        with pytest.raises(CompileError, match="nested"):
            to_member_union(F.col("u"), self._u([inner_rec, "boolean"]))
