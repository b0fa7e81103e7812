"""StructType → Avro schema inference (schema/infer.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import avro_spark
from avro_spark.errors import SchemaError
from avro_spark.schema.spark_types import to_spark_type


def rt(st: T.StructType, **kw) -> T.StructType:
    """infer → back to Spark type."""
    sch = avro_spark.infer_schema(st, **kw)
    out = to_spark_type(sch.root)
    assert isinstance(out, T.StructType)
    return out


def test_flat_scalars_round_trip():
    st = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.DoubleType(), False),
            T.StructField("d", T.BooleanType(), True),
            T.StructField("e", T.BinaryType(), False),
            T.StructField("f", T.FloatType(), True),
            T.StructField("g", T.IntegerType(), False),
        ]
    )
    assert rt(st) == st


def test_nullability_maps_to_star_extension():
    st = T.StructType([T.StructField("x", T.LongType(), True)])
    sch = avro_spark.infer_schema(st)
    exported = avro_spark.export(sch)
    assert exported["fields"][0]["type"] == "long*"


def test_nested_struct_becomes_named_record():
    st = T.StructType(
        [
            T.StructField(
                "profile",
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("score", T.DoubleType(), True),
                    ]
                ),
                False,
            )
        ]
    )
    assert rt(st) == st
    exported = avro_spark.export(avro_spark.infer_schema(st))
    assert exported["fields"][0]["type"]["name"] == "Profile"


def test_duplicate_nested_names_uniquified():
    inner = T.StructType([T.StructField("v", T.LongType(), False)])
    st = T.StructType(
        [
            T.StructField("item", inner, False),
            T.StructField("Item", inner, False),
        ]
    )
    exported = avro_spark.export(avro_spark.infer_schema(st))
    names = [f["type"]["name"] for f in exported["fields"]]
    assert len(set(names)) == 2


def test_array_and_map_round_trip():
    # to_spark_type is conservative about container-element nullability
    # (containsNull=True regardless), so compare against that convention;
    # the Avro side still records exact element nullability (see export)
    st = T.StructType(
        [
            T.StructField("xs", T.ArrayType(T.LongType(), False), False),
            T.StructField(
                "m", T.MapType(T.StringType(), T.DoubleType(), True), False
            ),
        ]
    )
    out = rt(st)
    assert out.fields[0].dataType == T.ArrayType(T.LongType(), True)
    assert out.fields[1].dataType == T.MapType(T.StringType(), T.DoubleType(), True)
    exported = avro_spark.export(avro_spark.infer_schema(st))
    assert exported["fields"][0]["type"]["items"] == "long"
    assert exported["fields"][1]["type"]["values"] == "double*"


def test_narrow_ints_widen_to_int():
    st = T.StructType(
        [
            T.StructField("b", T.ByteType(), False),
            T.StructField("s", T.ShortType(), False),
        ]
    )
    out = rt(st)
    assert [f.dataType for f in out.fields] == [T.IntegerType(), T.IntegerType()]


def test_timestamp_requires_coerce():
    st = T.StructType([T.StructField("ts", T.TimestampType(), False)])
    with pytest.raises(SchemaError, match="coerce"):
        avro_spark.infer_schema(st)
    out = rt(st, coerce=True)
    assert out.fields[0].dataType == T.LongType()


def test_decimal_requires_coerce():
    st = T.StructType([T.StructField("d", T.DecimalType(10, 2), False)])
    with pytest.raises(SchemaError, match="coerce"):
        avro_spark.infer_schema(st)
    assert rt(st, coerce=True).fields[0].dataType == T.DoubleType()


def test_non_string_map_keys_rejected():
    st = T.StructType(
        [T.StructField("m", T.MapType(T.LongType(), T.LongType()), False)]
    )
    with pytest.raises(SchemaError, match="string keys"):
        avro_spark.infer_schema(st)


def test_illegal_field_name_rejected():
    st = T.StructType([T.StructField("bad-name", T.LongType(), False)])
    with pytest.raises(SchemaError, match="field name"):
        avro_spark.infer_schema(st)


def test_inferred_schema_drives_compile(spark, sf_dir):
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    sch = avro_spark.infer_schema(nat, name="Nation")
    cs = avro_spark.compile(sch)
    flat = cs.flatten(nat)
    assert flat.count() == nat.count()


def test_dataframe_source_equivalent_to_its_schema(spark, sf_dir):
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    a = avro_spark.export(avro_spark.infer_schema(nat, name="N"))
    b = avro_spark.export(avro_spark.infer_schema(nat.schema, name="N"))
    assert a == b
